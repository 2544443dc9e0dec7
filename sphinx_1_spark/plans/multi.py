"""Multi-index union with kill-lists.

Sphinx serves `idx1,idx2,...` by querying each index and letting each
later index's kill-list suppress matching docids from earlier indexes
(main+delta freshness pattern; RunSubset killlist chaining
src/searchd.cpp:4191-4193, .spk write src/sphinx.cpp:9673-9687).

Spark mapping: kill-lists are anti-joins applied to earlier segments
before the union — exactly the segment-merge semantics of
CSphIndex_VLN::Merge (src/sphinx.cpp:9976) without rewriting any
postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_killlists(
    segments: list[DataFrame],
    killlists: list[DataFrame | None],
    docid_col: str = "docid",
) -> DataFrame:
    """Union segment row-sets (same schema) with later segments'
    kill-lists suppressing earlier segments' docids.

    killlists[i] is the kill-list OF segment i (docids it supersedes
    in all EARLIER segments); killlists[0] is ignored by construction.
    """
    if len(segments) != len(killlists):
        raise ValueError("one killlist entry per segment (None allowed)")
    out = None
    for i, seg in enumerate(segments):
        cur = seg
        # later kill-lists suppress this segment's docids
        for later in killlists[i + 1 :]:
            if later is not None:
                cur = cur.join(
                    F.broadcast(later.select(F.col(docid_col))),
                    docid_col,
                    "left_anti",
                )
        out = cur if out is None else out.unionByName(cur)
    return out
