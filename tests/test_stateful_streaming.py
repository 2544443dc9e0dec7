"""Continuous-ingestion operators (streaming/stateful.py): the
applyInPandasWithState re-crawl deduper and the watermarked windowed
crawl stats, both driven by REAL Structured Streaming runs over a
parquet file source with per-file micro-batches."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F


def _page(url, ts, text, lang="en"):
    return (url, dt.datetime.fromisoformat(ts), text.encode(), text, lang)


PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


@pytest.fixture()
def stream_dirs(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "chk")


def _run_stream(spark, src, chk, transform, out_table, out_dir=None):
    stream = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    writer = transform(stream).writeStream
    if out_dir:
        # foreachBatch parquet sink: supports checkpoint RECOVERY
        # (the memory sink does not), needed for sequential drains
        def sink(df, _bid):
            df.write.mode("append").parquet(out_dir)

        writer = writer.foreachBatch(sink)
    else:
        writer = writer.format("memory").queryName(out_table)
    q = (
        writer.outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_dedupe_recrawls_state_across_batches(spark, stream_dirs):
    """Per-url state survives micro-batches: batch 2's older re-crawl
    drops, its newer re-crawl passes; within-batch duplicates forward
    only the newest copy."""
    from sphinx_1_spark.streaming.stateful import dedupe_recrawls

    src, chk = stream_dirs
    os.makedirs(src)
    # batch 1 (file 1): first crawls; url-b appears TWICE in the batch
    b1 = [
        _page("http://a.example/p", "2024-01-01T10:00:00", "a v1"),
        _page("http://b.example/p", "2024-01-01T10:00:00", "b v1"),
        _page("http://b.example/p", "2024-01-01T11:00:00", "b v2"),
    ]
    # batch 2 (file 2): one older (drop), one newer (pass), one new url
    b2 = [
        _page("http://a.example/p", "2024-01-01T09:00:00", "a STALE"),
        _page("http://b.example/p", "2024-01-01T12:00:00", "b v3"),
        _page("http://c.example/p", "2024-01-01T10:30:00", "c v1"),
    ]
    spark.createDataFrame(b1, PAGES_DDL).coalesce(1).write.parquet(
        src + "/f1.parquet"
    )
    spark.createDataFrame(b2, PAGES_DDL).coalesce(1).write.parquet(
        src + "/f2.parquet"
    )

    _run_stream(spark, src, chk, dedupe_recrawls, "fresh")
    got = {
        (r.url, r.text)
        for r in spark.sql("SELECT * FROM fresh").collect()
    }
    assert got == {
        ("http://a.example/p", "a v1"),
        ("http://b.example/p", "b v2"),  # within-batch dup collapsed
        ("http://b.example/p", "b v3"),  # newer re-crawl passes
        ("http://c.example/p", "c v1"),
    }
    # html round-trips through the state operator
    row = (
        spark.sql("SELECT html FROM fresh WHERE text = 'b v3'").first()
    )
    assert bytes(row.html) == b"b v3"


def test_windowed_crawl_stats_watermark(spark, stream_dirs):
    """Watermarked tumbling windows: on-time pages aggregate per
    (window, lang); a page arriving behind the watermark is dropped
    from its (already closable) window."""
    from sphinx_1_spark.streaming.stateful import windowed_crawl_stats

    src, chk = stream_dirs
    os.makedirs(src)
    b1 = [
        _page("http://a.example/1", "2024-01-01T10:05:00", "xxxx"),
        _page("http://a.example/2", "2024-01-01T10:20:00", "yyyyyy"),
        _page("http://b.example/1", "2024-01-01T10:40:00", "zz", "zh"),
        # advances the watermark far past the 10:00 window + lateness
        _page("http://a.example/3", "2024-01-01T20:00:00", "late-mover"),
    ]
    # arrives in batch 2 with event time behind the watermark -> dropped
    b2 = [_page("http://a.example/9", "2024-01-01T10:50:00", "TOO LATE")]
    # two sequential availableNow drains over ONE checkpoint: the
    # watermark persists in the checkpoint, so b2's late row meets the
    # post-b1 watermark (18:00) deterministically
    xform = lambda s: windowed_crawl_stats(  # noqa: E731
        s, window="1 hour", lateness="2 hours"
    )
    out_dir = chk + "_out"
    spark.createDataFrame(b1, PAGES_DDL).coalesce(1).write.parquet(
        src + "/f1.parquet"
    )
    _run_stream(spark, src, chk, xform, "crawlstats", out_dir=out_dir)
    spark.createDataFrame(b2, PAGES_DDL).coalesce(1).write.parquet(
        src + "/f2.parquet"
    )
    _run_stream(spark, src, chk, xform, "crawlstats", out_dir=out_dir)
    rows = {
        (str(r.win_start), r.lang): (r.n_pages, r.n_bytes)
        for r in spark.read.parquet(out_dir).collect()
    }
    # the 10:00 window closed with b1's on-time pages only
    assert rows[("2024-01-01 10:00:00", "en")] == (2, 10)  # 4 + 6 bytes
    assert rows[("2024-01-01 10:00:00", "zh")] == (1, 2)
    # the TOO LATE page did not reopen or bump the closed window
    assert all(
        n_pages <= 2 for (_w, _l), (n_pages, _b) in rows.items()
    )


def test_continuous_ingestion_end_to_end(spark, tmp_path):
    """The full continuous-ingestion chain in one run: crawl feed
    (readStream, one file per micro-batch) -> dedupe_recrawls
    (stateful supersede-on-the-stream) -> IncrementalIndexer
    (foreachBatch delta segments + kill-lists) -> promote (atomic
    CURRENT pointer) -> open_current_view -> WAND top-k.

    Pins the whole supersede story: the re-crawled url keeps ONE live
    row (the newest text), the stale duplicate never reaches a
    segment, and the superseded copy's terms stop matching because
    the later segment's kill-list suppresses its docid."""
    from sphinx_1_spark.streaming.incremental import (
        IncrementalIndexer,
        open_current_view,
        promote,
    )
    from sphinx_1_spark.streaming.stateful import dedupe_recrawls

    src = str(tmp_path / "feed")
    root = str(tmp_path / "idx")
    gen = "gen=0000"
    os.makedirs(src)

    # batch 0: first crawls
    b0 = [
        _page("https://a", "2025-01-01T00:10:00", "alpha common"),
        _page("https://b", "2025-01-01T00:11:00", "beta common"),
    ]
    # batch 1: a NEWER re-crawl of url a, a STALE duplicate of it
    # (older than batch 0's crawl), and a fresh url c
    b1 = [
        _page("https://a", "2025-01-01T02:00:00", "gamma common"),
        _page("https://a", "2025-01-01T00:05:00", "stale common"),
        _page("https://c", "2025-01-01T02:01:00", "delta common"),
    ]
    for i, rows in enumerate((b0, b1)):
        spark.createDataFrame(rows, PAGES_DDL).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )

    indexer = IncrementalIndexer(os.path.join(root, gen))
    stream = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        indexer.attach(dedupe_recrawls(stream))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    ptr = promote(root, gen)
    assert len(ptr["segments"]) == 2  # one delta per micro-batch
    view = open_current_view(spark, root)

    live = {
        (r["url"], r["warc_ts"].isoformat())
        for r in view.docinfo().collect()
    }
    assert live == {
        ("https://a", "2025-01-01T02:00:00"),
        ("https://b", "2025-01-01T00:11:00"),
        ("https://c", "2025-01-01T02:01:00"),
    }

    def hit_urls(word):
        docids = {
            r["docid"] for r in view.search_topk([word], k=10).collect()
        }
        return {
            r["url"]
            for r in view.docinfo().collect()
            if r["docid"] in docids
        }

    # every live row matches the shared term
    assert hit_urls("common") == {"https://a", "https://b", "https://c"}
    # the re-crawl's text is live ...
    assert hit_urls("gamma") == {"https://a"}
    # ... the superseded copy's terms are kill-listed out, and the
    # stale duplicate was dropped on the stream (never indexed)
    assert hit_urls("alpha") == set()
    assert hit_urls("stale") == set()
