#!/usr/bin/env python
"""Micro-bench: dedupe_recrawls state-fn throughput (VERDICT r3 #1).

Drives one availableNow Structured-Streaming pass of N synthetic crawl
rows (distinct urls + 50% re-crawls) through dedupe_recrawls and
reports rows/sec, twice: the shipped VECTORIZED state fn vs the old
per-row `iterrows` implementation (reconstructed here solely for the
comparison).  Usage:

    python scripts/bench_stateful.py [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sphinx_1_spark.streaming.stateful import (  # noqa: E402
    FRESH_SCHEMA,
    _STATE_SCHEMA,
    dedupe_recrawls,
)


def _old_iterrows_dedupe(pages_stream):
    """The pre-round-4 per-row implementation, kept ONLY as the
    micro-bench baseline."""

    def fn(key, pdfs, state):
        prev = state.get[0] if state.exists else -1
        best = None
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                ts_us = int(row["warc_ts"].value // 1_000)
                if ts_us > prev and (best is None or ts_us > best[0]):
                    best = (ts_us, row)
        if best is None:
            yield pd.DataFrame(
                {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            )
            return
        state.update((best[0],))
        row = best[1]
        yield pd.DataFrame(
            {
                "url": [row["url"]],
                "warc_ts": [row["warc_ts"]],
                "html": [row["html"]],
                "text": [row["text"]],
                "lang": [row["lang"]],
            }
        )

    return (
        pages_stream.select("url", "warc_ts", "html", "text", "lang")
        .groupBy("url")
        .applyInPandasWithState(
            fn,
            outputStructType=FRESH_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def _run(spark, src: str, transform, n_expected: int) -> float:
    chk = tempfile.mkdtemp(prefix="bench_dedupe_chk_")
    out: list[int] = []

    def sink(df, _bid):
        out.append(df.count())

    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, "
            "text string, lang string"
        ).parquet(src + "/*")
    )
    t0 = time.perf_counter()
    q = (
        transform(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    shutil.rmtree(chk, ignore_errors=True)
    assert sum(out) == n_expected, (sum(out), n_expected)
    return wall


def _write_corpus(spark, src: str, n: int, rows_per_url: int) -> int:
    """n rows over n/rows_per_url urls; returns the distinct url count
    (= expected emitted rows: one newest crawl per url)."""
    n_urls = n // rows_per_url
    rows = (
        spark.range(n)
        .select(
            F.concat(F.lit("https://h"), (F.col("id") % n_urls).cast("string"))
            .alias("url"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id"))
            .alias("warc_ts"),
            F.encode(F.concat(F.lit("<p>"), F.col("id").cast("string")), "utf-8")
            .alias("html"),
            F.col("id").cast("string").alias("text"),
            F.lit("en").alias("lang"),
        )
    )
    rows.repartition(8).write.mode("overwrite").parquet(src + "/batch0")
    return n_urls


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from sphinx_1_spark.session import get_spark

    spark = get_spark(app_name="bench-stateful", cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup drain: JIT + Python-worker spin-up must not land
    # inside whichever implementation happens to run first
    warm = tempfile.mkdtemp(prefix="bench_dedupe_warm_")
    nw = _write_corpus(spark, warm, 5_000, 2)
    _run(spark, warm, dedupe_recrawls, nw)
    shutil.rmtree(warm, ignore_errors=True)

    # two batch shapes: 2 rows/url (typical feed: a page and one
    # re-crawl per micro-batch — per-KEY call overhead dominates) and
    # 50 rows/url (hot urls / backfill batches — per-ROW cost
    # dominates, the shape the iterrows ban is about)
    results: dict = {"n_rows": n}
    for rows_per_url in (2, 50):
        src = tempfile.mkdtemp(prefix="bench_dedupe_src_")
        n_urls = _write_corpus(spark, src, n, rows_per_url)
        shape: dict = {}
        for name, tf in (
            ("vectorized", dedupe_recrawls),
            ("iterrows_old", _old_iterrows_dedupe),
        ):
            wall = min(_run(spark, src, tf, n_urls) for _ in range(2))
            shape[name] = {
                "wall_s": round(wall, 2),
                "rows_per_sec": round(n / wall, 1),
            }
        shape["speedup"] = round(
            shape["iterrows_old"]["wall_s"] / shape["vectorized"]["wall_s"], 2
        )
        results[f"rows_per_url={rows_per_url}"] = shape
        shutil.rmtree(src, ignore_errors=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
