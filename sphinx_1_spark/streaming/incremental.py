"""Incremental indexing: Structured Streaming -> delta segments.

The reference has no streaming engine — freshness is the main+delta
pattern: periodic delta index builds, kill-lists suppressing
superseded docids, and occasional merges (indexer --merge
src/indexer.cpp:1029; killlist application src/searchd.cpp:4191;
CSphIndex_VLN::Merge src/sphinx.cpp:9976).  This module is that
pattern on Spark:

  * each micro-batch of pages becomes an immutable *delta segment*
    (same layout as plans/segment_index.write_segment) plus a
    `killlist/` table: the batch's docids, which supersede earlier
    segments' rows (re-crawled urls hash to the same docid);
  * `attach(stream_df)` wires it as a foreachBatch sink; batch
    replays are idempotent (segment dir keyed by batch id, manifest
    written last);
  * `open_view()` serves the union with kill-lists applied — exactly
    searchd's multi-index semantics where later indexes' kill-lists
    filter earlier ones;
  * `compact()` merges all segments into one and clears kill-lists —
    the `indexer --merge` analog (re-encode via union + dictionary
    re-aggregation).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sphinx_1_spark.functions.tokenizer import TokenizerSettings
from sphinx_1_spark.operators.hits import build_runs_fused
from sphinx_1_spark.operators.segments import (
    build_checkpoints,
    build_dictionary_from_blocks,
    encode_blocks_from_runs,
)
from sphinx_1_spark.plans.pipeline import assign_docids
from sphinx_1_spark.plans.segment_index import (
    MANIFEST,
    SegmentSet,
    read_manifest,
    segment_complete,
    write_segment,
)


class IncrementalIndexer:
    def __init__(
        self,
        out_dir: str,
        tokenizer: TokenizerSettings | None = None,
        with_positions: bool = True,
    ):
        self.out_dir = out_dir
        self.tok = tokenizer or TokenizerSettings(ngram_chars="U+4E00..U+9FBF")
        self.with_positions = with_positions
        os.makedirs(out_dir, exist_ok=True)

    # ------------------------------------------------------------------
    def _seg_path(self, batch_id: int) -> str:
        return os.path.join(self.out_dir, f"delta={batch_id:010d}")

    def process_batch(self, pages: DataFrame, batch_id: int) -> None:
        """foreachBatch body: pages micro-batch -> delta segment.

        Idempotent: a replayed batch id with a complete manifest is
        skipped (exactly-once segment publication)."""
        path = self._seg_path(batch_id)
        if segment_complete(path):
            return
        spark = pages.sparkSession
        t0 = time.perf_counter()
        docs = assign_docids(pages, "fingerprint")
        # same map-side run combine as the batch build (the per-row
        # JVM<->Python crossing is the wall at ingest scale too)
        n_groups = max(1, docs.rdd.getNumPartitions() // 64)
        runs = build_runs_fused(docs, "docid", "html", self.tok, n_groups=n_groups)
        docinfo = docs.select("docid", "url", "warc_ts", "lang")
        blocks = encode_blocks_from_runs(runs, with_positions=self.with_positions)
        lineage = {
            "batch_id": batch_id,
            "mode": "streaming-delta",
            "build_wall_s": None,
        }
        # kill-list FIRST: the manifest write inside write_segment is
        # the segment's completion marker, so everything the marker
        # covers must exist before it.  (Writing the kill-list after
        # write_segment left a window where a killed job published a
        # complete manifest with no kill-list — the replay then
        # skipped the batch and superseded copies from earlier
        # segments were never suppressed.)
        docs.select("docid").write.mode("overwrite").parquet(
            os.path.join(path, "killlist")
        )
        m = write_segment(
            spark, path, blocks, docinfo, lineage, self.with_positions
        )
        m["lineage"]["build_wall_s"] = round(time.perf_counter() - t0, 3)
        # atomic rewrite: a kill mid-dump must not truncate the marker
        tmp = os.path.join(path, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2)
        os.replace(tmp, os.path.join(path, MANIFEST))

    def attach(self, stream_df: DataFrame, **trigger_kwargs):
        """Wire as a writeStream foreachBatch sink; caller starts it.

        stream_df must carry the pages schema (url, warc_ts, html,
        text, lang).  trigger_kwargs (e.g. processingTime="30 seconds",
        availableNow=True) forward to DataStreamWriter.trigger."""
        w = (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option(
                "checkpointLocation", os.path.join(self.out_dir, "_checkpoint")
            )
        )
        if trigger_kwargs:
            w = w.trigger(**trigger_kwargs)
        return w

    # ------------------------------------------------------------------
    def compact(self, spark: SparkSession, dest_dir: str) -> str:
        """Merge all live rows into ONE fresh segment (the
        `indexer --merge` main+delta compaction, src/indexer.cpp:1029 /
        CSphIndex_VLN::Merge src/sphinx.cpp:9976): decode every
        segment's blocks, drop kill-listed docids, re-encode, write a
        new segment with an empty kill-list.  Returns the new root dir
        (usable as a fresh IncrementalIndexer out_dir)."""
        from sphinx_1_spark.operators.segments import decode_blocks, encode_blocks

        view = self.open_view(spark)
        live = view.docinfo()
        # decode per segment and apply ITS kill filter before the
        # union: a re-crawled url keeps its docid, so a docid-level
        # filter after the union would keep both copies' postings
        parts = None
        for i, p in enumerate(view.paths):
            blocks_i = spark.read.parquet(os.path.join(p, "postings_blocks"))
            post_i = decode_blocks(blocks_i, with_positions=self.with_positions)
            kl = view._killed_for(i)
            if kl is not None:
                # no broadcast hint: kill-lists are unbounded, AQE picks
                post_i = post_i.join(kl, "docid", "left_anti")
            parts = post_i if parts is None else parts.unionByName(post_i)
        blocks = encode_blocks(parts, with_positions=self.with_positions)
        os.makedirs(dest_dir, exist_ok=True)
        # "compacted=" sorts BEFORE "delta=" so the merged main is the
        # EARLIEST segment in kill-list order, and — unlike the old
        # delta=0000000000 name — can never collide with a fresh
        # stream's batch_id 0: that collision made process_batch skip
        # the first real micro-batch as already-complete (data loss)
        path = os.path.join(dest_dir, f"compacted={0:010d}")
        lineage = {
            "mode": "compacted",
            "merged_segments": [os.path.basename(p) for p in view.paths],
        }
        # empty kill-list first (a compacted main supersedes nothing);
        # write_segment's manifest is the atomic completion marker and
        # everything it covers must exist before it
        live.select("docid").limit(0).write.mode("overwrite").parquet(
            os.path.join(path, "killlist")
        )
        write_segment(spark, path, blocks, live, lineage, self.with_positions)
        return dest_dir

    def segment_paths(self) -> list[str]:
        # sorted() puts "compacted=" before "delta=NNN": the merged
        # main serves as the earliest segment in the kill-list chain
        return sorted(
            os.path.join(self.out_dir, d)
            for d in os.listdir(self.out_dir)
            if d.startswith(("delta=", "compacted="))
        )

    def open_view(self, spark: SparkSession) -> "IncrementalView":
        return IncrementalView(spark, self.segment_paths())


class IncrementalView:
    """Multi-segment view with kill-lists applied: a doc row from
    segment i is suppressed if any LATER segment's kill-list holds its
    docid (searchd killlist chaining, src/searchd.cpp:4191-4193)."""

    def __init__(self, spark: SparkSession, paths: list[str]):
        self.spark = spark
        self.paths = [p for p in paths if segment_complete(p)]
        if not self.paths:
            raise ValueError("no complete delta segments")
        self.segments = SegmentSet(spark, self.paths)

    def _killed_for(self, i: int) -> DataFrame | None:
        later = self.paths[i + 1 :]
        if not later:
            return None
        # a full-build shard segment has no killlist table (disjoint
        # docid spaces by shard hashing — nothing to supersede); treat
        # it as an empty kill-list so promoted full builds serve too
        dfs = [
            self.spark.read.parquet(os.path.join(p, "killlist"))
            for p in later
            if os.path.isdir(os.path.join(p, "killlist"))
        ]
        if not dfs:
            return None
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out.distinct()

    def docinfo(self) -> DataFrame:
        """Live docinfo: superseded rows removed."""
        out = None
        for i, p in enumerate(self.paths):
            df = self.spark.read.parquet(os.path.join(p, "docinfo"))
            kl = self._killed_for(i)
            if kl is not None:
                df = df.join(kl, "docid", "left_anti")
            out = df if out is None else out.unionByName(df)
        return out

    def search_topk(self, words: list[str], k: int = 10, mode: str = "and"):
        """Kill-list-aware BM25 top-k, searchd-style: each segment is
        searched SEPARATELY with its own collection stats (per-index
        IDF, exactly like multi-index RunSubset src/searchd.cpp:3950),
        its kill-listed rows excluded INSIDE the per-segment WAND plan
        (wand_topk's `exclude` — before the top-k cut and the OR theta
        seed), then results merge through one final queue.

        Exclusion sets are the suffix unions of later kill-lists,
        built lazily right-to-left: ZERO driver-side count() jobs,
        each kill-list parquet referenced once per query (not O(S^2)),
        and no k+n_killed over-fetch — after heavy re-crawling the old
        over-fetch approached a full-corpus top-k per segment, exactly
        the WAND-pruning collapse this serving path exists to avoid."""
        kills: list[DataFrame | None] = [None] * len(self.paths)
        acc = None
        for i in range(len(self.paths) - 1, 0, -1):
            kl_path = os.path.join(self.paths[i], "killlist")
            if os.path.isdir(kl_path):
                # full-build shard= segments carry no killlist table
                # (disjoint docid spaces) — skip, don't crash
                kl = self.spark.read.parquet(kl_path)
                acc = kl if acc is None else acc.unionByName(kl)
            kills[i - 1] = acc
        merged = None
        for i, p in enumerate(self.paths):
            seg = SegmentSet(self.spark, [p])
            res = seg.wand_topk(words, k, mode, exclude=kills[i])
            merged = res if merged is None else merged.unionByName(res)
        from sphinx_1_spark.plans.attrs import docid_ord

        return merged.orderBy(
            F.col("weight").desc(), docid_ord().asc()
        ).limit(k)


# ---------------------------------------------------------------------------
# Index rotation: atomic generation swap (the batch analog of searchd's
# SIGHUP rotation, src/searchd.cpp:924 CheckRotate / RotateIndexGreedy —
# .new.sp* files rename into place so a reader sees the OLD index or the
# NEW index, never a mix).  Here a generation is an immutable directory
# of delta segments; `CURRENT` is a one-line JSON pointer file swapped
# with os.replace (atomic on POSIX), so a crash mid-promote leaves the
# old pointer intact and a reader that already resolved the pointer
# keeps serving the old (still-on-disk) generation.
# ---------------------------------------------------------------------------

CURRENT_POINTER = "CURRENT"


def read_current(root: str) -> dict | None:
    """The active generation pointer, or None before first promote."""
    p = os.path.join(root, CURRENT_POINTER)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def promote(root: str, generation: str, meta: dict | None = None) -> dict:
    """Atomically point `root` at `generation` (a directory under root
    holding a complete segment set — incremental `delta=` segments or
    a full build's `shard=` segments, the `indexer --rotate` analog).
    Write-temp-then-rename: readers resolve either the old pointer or
    the new one — a kill between the temp write and the rename leaves
    the old generation live.

    The superseded generation's files are NOT touched (a reader may
    still be serving them); reclaim with vacuum()."""
    gen_dir = os.path.join(root, generation)
    segs = [
        os.path.join(gen_dir, d)
        for d in sorted(os.listdir(gen_dir))
        if d.startswith(("delta=", "shard="))
    ]
    if not segs or not all(segment_complete(s) for s in segs):
        raise ValueError(
            f"refusing to promote {generation!r}: incomplete segment set"
        )
    prev = read_current(root)
    # record the superseded lineage: vacuum may remove ONLY these —
    # never an unlisted directory, which could be a NEWER generation
    # still being built by a writer
    superseded = list(prev.get("superseded", [])) if prev else []
    if prev and prev["generation"] != generation:
        superseded.append(prev["generation"])
    ptr = {
        "generation": generation,
        "epoch": (prev["epoch"] + 1) if prev else 0,
        "segments": [os.path.basename(s) for s in segs],
        "promoted_at": time.time(),
        "superseded": superseded,
        **(meta or {}),
    }
    tmp = os.path.join(root, CURRENT_POINTER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(ptr, f, indent=2)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, CURRENT_POINTER))  # the atomic swap
    return ptr


def open_current_view(spark: SparkSession, root: str) -> "IncrementalView":
    """Open the ACTIVE generation.  Resolves the pointer once; the
    returned view keeps serving that generation's immutable segments
    even if a promote lands afterwards (exactly the reference's
    serve-old-while-rotating semantics)."""
    ptr = read_current(root)
    if ptr is None:
        raise ValueError(f"no {CURRENT_POINTER} pointer in {root}")
    gen_dir = os.path.join(root, ptr["generation"])
    return IncrementalView(
        spark,
        [os.path.join(gen_dir, s) for s in ptr["segments"]],
    )


def vacuum(root: str) -> list[str]:
    """Remove generations the pointer lineage records as SUPERSEDED.
    Returns the removed generation names.  Only directories listed in
    CURRENT's `superseded` chain are touched — an unlisted directory
    may be a newer generation a writer is still building, so it is
    never removed.  Call only when no reader can still hold a
    pre-promote pointer (the reference's analog is unlinking the
    .old.sp* files after rotation completes)."""
    import shutil

    ptr = read_current(root)
    if ptr is None:
        return []
    removed = []
    for d in ptr.get("superseded", []):
        full = os.path.join(root, d)
        if d != ptr["generation"] and os.path.isdir(full):
            shutil.rmtree(full)
            removed.append(d)
    if removed:
        # Rewrite the pointer without the reclaimed names (same
        # write-temp-then-rename protocol as promote) — but RE-READ
        # CURRENT first: a promote() landing after our snapshot would
        # otherwise be clobbered by the stale pointer, reverting the
        # live generation (lost update).  Stripping `removed` from the
        # FRESH pointer is always safe: those directories are gone
        # regardless of which generation is now current.  (The
        # remaining reread->replace window is not closed — vacuum and
        # promote must not run concurrently; single-writer is the
        # rotation contract, same as the reference's seamless_rotate.)
        ptr = read_current(root) or ptr
        ptr["superseded"] = [
            d for d in ptr.get("superseded", []) if d not in removed
        ]
        tmp = os.path.join(root, CURRENT_POINTER + ".tmp")
        with open(tmp, "w") as f:
            json.dump(ptr, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(root, CURRENT_POINTER))
    return removed
