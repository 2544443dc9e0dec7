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

from sphinx_1_spark.functions.wordid import word_id
from sphinx_1_spark.plans.parser import collect_words


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
        # later kill-lists suppress this segment's docids; no forced
        # broadcast — a main+delta kill-list can be arbitrarily large,
        # and AQE broadcasts small lists while falling back to a
        # shuffled anti-join past driver-buildable size (the same
        # policy as api._normalize_kills / engine.merge)
        for later in killlists[i + 1 :]:
            if later is not None:
                cur = cur.join(
                    later.select(F.col(docid_col)),
                    docid_col,
                    "left_anti",
                )
        out = cur if out is None else out.unionByName(cur)
    return out


def minimize_results(
    results: list[DataFrame],
    limit: int = 1000,
    docid_col: str = "docid",
) -> DataFrame:
    """MinimizeAggrResult (src/searchd.cpp:3628-3820): when one query
    spans several indexes, the per-index result sets are reduced to
    their common attribute schema (intersection by column name, in
    the first set's order), tagged with the index ordinal, unioned,
    deduplicated per docid (the reference sorts merged matches by
    (docid asc, tag DESC) — searchd.cpp:2515 comparator — and keeps
    the first copy, i.e. the HIGHEST tag / last-listed index wins,
    which is what makes `main, delta` serve fresh delta rows), and
    re-sorted through a fresh queue (weight desc, docid asc —
    sphinxsort.cpp:1159 comparator)."""
    from pyspark.sql import Window

    if not results:
        raise ValueError("no result sets")
    common = [
        c
        for c in results[0].columns
        if all(c in r.columns for r in results[1:])
    ]
    if docid_col not in common or "weight" not in common:
        raise ValueError("result sets must share docid and weight")
    out = None
    for tag, r in enumerate(results):
        cur = r.select(*common).withColumn("tag", F.lit(tag))
        out = cur if out is None else out.unionByName(cur)
    # last-listed copy per docid wins (highest tag); shuffle keyed on
    # docid — no skew (docids unique per index), a plain hash agg
    w = Window.partitionBy(docid_col).orderBy(F.col("tag").desc())
    out = (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    from sphinx_1_spark.plans.attrs import docid_ord

    return out.orderBy(
        F.col("weight").desc(), docid_ord(docid_col).asc()
    ).limit(limit)


def batch_search(
    index,
    queries: list[tuple[str, str, dict]],
    persist: bool = True,
) -> DataFrame:
    """Multi-query batch (AddQuery/RunQueries, src/searchd.cpp:3869-
    3918; api/sphinxapi.py:487-725): run several queries against ONE
    shared posting scan.

    All queries' terms are collected first; the postings relation is
    filtered once to the union of their wordids and cached, so each
    per-query plan reads the narrow in-memory slice instead of
    re-scanning the store — the Spark analog of searchd batching
    same-index queries to share I/O.  At 100 TB this is the difference
    between Q full dictionary-pruned scans and one.

    `queries` entries are (tag, match_string, search_kwargs).  Returns
    one DataFrame (query, docid, weight): each query's top-k rows
    tagged with its name.
    """
    words: set[str] = set()
    for _tag, match, kw in queries:
        tree = index.parse(match, kw.get("mode", "extended2"))
        words.update(w.word for w in collect_words(tree))
    wids = [word_id(w, index.settings.wordid) for w in words]
    shared = index.postings.where(F.col("wordid").isin(wids))
    if persist:
        shared = shared.persist()
    # a view-index sharing dictionary/docinfo/stats but scanning only
    # the batch's posting slice
    view = type(index)(
        index.spark,
        index.settings,
        shared,
        index.dictionary,
        index.docinfo,
        index.n_docs,
    )
    out = None
    for tag, match, kw in queries:
        res = view.search(match, **kw).select(
            F.lit(tag).alias("query"), "docid", "weight"
        )
        out = res if out is None else out.unionByName(res)
    return out
