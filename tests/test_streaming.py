"""Incremental (main+delta) indexing: foreachBatch delta segments,
kill-lists, idempotent replay, and a real Structured Streaming run
over a parquet file source."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def two_batches(spark, tmp_path_factory):
    """Batch 0: pages 0..199. Batch 1: pages 100..299 (100..199 are
    re-crawls with CHANGED content -> must supersede batch 0)."""
    from sphinx_1_spark.sources.pages import generate_pages

    b0 = generate_pages(spark, 200, seed=1, partitions=2)
    # re-crawl: rows 100..299 with content from a different seed but
    # identical urls (deterministic from the row id)
    b1 = generate_pages(spark, 300, seed=2, partitions=2).where(
        F.regexp_extract("url", r"doc(\d+)$", 1).cast("long").between(100, 299)
    )
    return b0, b1


def test_delta_segments_and_killlists(spark, two_batches, tmp_path):
    from sphinx_1_spark.streaming.incremental import IncrementalIndexer

    b0, b1 = two_batches
    out = str(tmp_path / "inc")
    ix = IncrementalIndexer(out)
    ix.process_batch(b0, 0)
    ix.process_batch(b1, 1)
    assert len(ix.segment_paths()) == 2

    view = ix.open_view(spark)
    live = view.docinfo()
    # 0..99 from batch 0, 100..299 from batch 1 = 300 live docs; the
    # 100 re-crawled urls must appear exactly once (batch-0 copies
    # suppressed by batch-1's kill-list)
    assert live.count() == 300
    assert live.select("url").distinct().count() == 300
    overlap = live.where(
        F.regexp_extract("url", r"doc(\d+)$", 1).cast("long").between(100, 199)
    )
    assert overlap.count() == 100


def test_replay_idempotent(spark, two_batches, tmp_path):
    from sphinx_1_spark.streaming.incremental import IncrementalIndexer

    b0, _ = two_batches
    out = str(tmp_path / "inc2")
    ix = IncrementalIndexer(out)
    ix.process_batch(b0, 0)
    m1 = os.path.getmtime(os.path.join(ix.segment_paths()[0], "_MANIFEST.json"))
    ix.process_batch(b0, 0)  # replay
    m2 = os.path.getmtime(os.path.join(ix.segment_paths()[0], "_MANIFEST.json"))
    assert m1 == m2  # untouched


def test_search_respects_killlist(spark, two_batches, tmp_path):
    from sphinx_1_spark.streaming.incremental import IncrementalIndexer

    b0, b1 = two_batches
    out = str(tmp_path / "inc3")
    ix = IncrementalIndexer(out)
    ix.process_batch(b0, 0)
    ix.process_batch(b1, 1)
    view = ix.open_view(spark)
    top = view.search_topk(["the"], k=20, mode="or").collect()
    assert top
    live_ids = {r["docid"] for r in view.docinfo().select("docid").collect()}
    assert all(r["docid"] in live_ids for r in top)


def test_structured_streaming_file_source(spark, tmp_path):
    """Real readStream run: two parquet files arrive, availableNow
    trigger drains them through foreachBatch into delta segments."""
    from sphinx_1_spark.sources.pages import PAGES_SCHEMA, generate_pages
    from sphinx_1_spark.streaming.incremental import IncrementalIndexer

    src = str(tmp_path / "src")
    allp = generate_pages(spark, 100, seed=3, partitions=1)
    idx_col = F.regexp_extract("url", r"doc(\d+)$", 1).cast("long")
    allp.where(idx_col < 50).write.parquet(src + "/f1.parquet")
    allp.where(idx_col >= 50).write.parquet(src + "/f2.parquet")
    out = str(tmp_path / "incs")
    ix = IncrementalIndexer(out)
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = ix.attach(stream).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert len(ix.segment_paths()) >= 1
    view = ix.open_view(spark)
    assert view.docinfo().count() == 100


def test_compact_preserves_results(spark, two_batches, tmp_path):
    """Compaction == indexer --merge: the merged segment carries
    exactly the live rows, and its search results equal those of a
    FRESH single-segment build over the equivalent live corpus."""
    from sphinx_1_spark.plans.segment_index import SegmentSet, build_segments
    from sphinx_1_spark.streaming.incremental import IncrementalIndexer

    b0, b1 = two_batches
    out = str(tmp_path / "inc4")
    ix = IncrementalIndexer(out)
    ix.process_batch(b0, 0)
    ix.process_batch(b1, 1)
    view = ix.open_view(spark)
    before_docs = sorted(
        r["docid"] for r in view.docinfo().select("docid").collect()
    )
    # multi-segment search returns only live docs
    top = view.search_topk(["the"], k=15, mode="or").collect()
    assert len(top) == 15
    assert set(r["docid"] for r in top) <= set(before_docs)

    merged_root = ix.compact(spark, str(tmp_path / "main4"))
    ix2 = IncrementalIndexer(merged_root)
    assert len(ix2.segment_paths()) == 1
    view2 = ix2.open_view(spark)
    after_docs = sorted(
        r["docid"] for r in view2.docinfo().select("docid").collect()
    )
    assert after_docs == before_docs

    # equivalence with a fresh build over the live corpus
    idx_col = F.regexp_extract("url", r"doc(\d+)$", 1).cast("long")
    live_pages = b0.where(idx_col < 100).unionByName(b1)
    fresh_dir = str(tmp_path / "fresh4")
    fresh = SegmentSet(spark, build_segments(live_pages, fresh_dir, n_shards=1))
    want = [
        (r["docid"], r["weight"])
        for r in fresh.wand_topk(["the"], 15, "or").collect()
    ]
    got = [
        (r["docid"], r["weight"])
        for r in view2.search_topk(["the"], k=15, mode="or").collect()
    ]
    assert got == want


def test_kill_mid_batch_resume(spark, two_batches, tmp_path, monkeypatch):
    """Kill-the-writer test for the delta path (the segment builder
    has one — scripts/build_index_job resume; the delta/kill-list
    writer did not): a job killed before the manifest publish leaves
    an incomplete segment, the replayed batch rebuilds it, and the
    resumed view answers identically to a never-killed run.  Also
    pins the ordering invariant: a published manifest implies the
    kill-list exists (kill-list is written BEFORE the marker)."""
    import os as _os

    from sphinx_1_spark.plans import segment_index as si
    from sphinx_1_spark.streaming.incremental import IncrementalIndexer

    b0, b1 = two_batches
    clean = IncrementalIndexer(str(tmp_path / "clean"))
    clean.process_batch(b0, 0)
    clean.process_batch(b1, 1)
    cview = clean.open_view(spark)
    want_urls = sorted(r["url"] for r in cview.docinfo().collect())
    want_top = [
        (r["docid"], r["weight"])
        for r in cview.search_topk(["the"], k=20, mode="or").collect()
    ]

    out = str(tmp_path / "killed")
    ix = IncrementalIndexer(out)
    ix.process_batch(b0, 0)
    real_replace = _os.replace

    def boom(src, dst, *a, **k):
        if str(dst).endswith(si.MANIFEST) and "delta=0000000001" in str(dst):
            raise RuntimeError("kill -9")
        return real_replace(src, dst, *a, **k)

    monkeypatch.setattr(si.os, "replace", boom)
    with pytest.raises(RuntimeError):
        ix.process_batch(b1, 1)
    monkeypatch.setattr(si.os, "replace", real_replace)

    # the killed batch must NOT look complete; batch 0 must
    assert not si.segment_complete(os.path.join(out, "delta=0000000001"))
    assert si.segment_complete(os.path.join(out, "delta=0000000000"))

    # replay (what the streaming checkpoint does on restart)
    ix2 = IncrementalIndexer(out)
    ix2.process_batch(b1, 1)
    for p in ix2.segment_paths():  # marker => kill-list ordering
        assert os.path.exists(os.path.join(p, "killlist"))
    view = ix2.open_view(spark)
    assert sorted(r["url"] for r in view.docinfo().collect()) == want_urls
    got_top = [
        (r["docid"], r["weight"])
        for r in view.search_topk(["the"], k=20, mode="or").collect()
    ]
    assert got_top == want_top


def test_rotation_atomic_promote(spark, two_batches, tmp_path):
    """Index rotation as an atomic generation swap (the batch analog of
    searchd's SIGHUP rotation, src/searchd.cpp:924): a reader resolves
    the CURRENT pointer to OLD or NEW, never a mix; a kill between the
    pointer's temp write and the rename leaves the old generation
    live; vacuum reclaims only superseded generations."""
    import json
    import os

    from sphinx_1_spark.streaming.incremental import (
        CURRENT_POINTER,
        IncrementalIndexer,
        open_current_view,
        promote,
        read_current,
        vacuum,
    )

    b0, b1 = two_batches
    root = str(tmp_path / "rot")
    os.makedirs(root)

    # generation 0: batch 0 only
    g0 = os.path.join(root, "gen=0000")
    IncrementalIndexer(g0).process_batch(b0, 0)
    ptr0 = promote(root, "gen=0000")
    assert ptr0["epoch"] == 0

    v_old = open_current_view(spark, root)
    docs_old = {r["docid"] for r in v_old.docinfo().select("docid").collect()}
    assert len(docs_old) == 200

    # generation 1: both batches (desired post-rotate state)
    g1 = os.path.join(root, "gen=0001")
    ix1 = IncrementalIndexer(g1)
    ix1.process_batch(b0, 0)
    ix1.process_batch(b1, 1)

    # simulate a crash MID-promote: the temp pointer exists but the
    # rename never happened -> readers still resolve gen=0000
    with open(os.path.join(root, CURRENT_POINTER + ".tmp"), "w") as f:
        json.dump({"generation": "gen=0001", "torn": True}, f)
    assert read_current(root)["generation"] == "gen=0000"
    mid = open_current_view(spark, root)
    assert {
        r["docid"] for r in mid.docinfo().select("docid").collect()
    } == docs_old

    # complete the promote: atomic rename lands the new pointer
    ptr1 = promote(root, "gen=0001")
    assert ptr1["epoch"] == 1
    v_new = open_current_view(spark, root)
    docs_new = {r["docid"] for r in v_new.docinfo().select("docid").collect()}
    assert len(docs_new) == 300  # 0..99 live from b0 + 100..299 from b1

    # a reader that resolved the pointer BEFORE the swap keeps serving
    # the old immutable generation (serve-old-while-rotating)
    assert {
        r["docid"] for r in v_old.docinfo().select("docid").collect()
    } == docs_old

    # vacuum removes only the superseded generation
    removed = vacuum(root)
    assert removed == ["gen=0000"]
    assert not os.path.exists(g0)
    assert {
        r["docid"] for r in open_current_view(spark, root).docinfo()
        .select("docid").collect()
    } == docs_new


def test_rotation_refuses_incomplete_generation(spark, two_batches, tmp_path):
    """promote() must reject a generation whose segment set has no
    completion marker — the half-written .new.sp* case searchd's
    rotation check rejects."""
    import os

    import pytest as _pytest

    from sphinx_1_spark.streaming.incremental import (
        IncrementalIndexer,
        promote,
    )
    from sphinx_1_spark.plans.segment_index import MANIFEST

    b0, _b1 = two_batches
    root = str(tmp_path / "rot2")
    g0 = os.path.join(root, "gen=0000")
    IncrementalIndexer(g0).process_batch(b0, 0)
    seg = next(
        os.path.join(g0, d) for d in os.listdir(g0) if d.startswith("delta=")
    )
    os.rename(
        os.path.join(seg, MANIFEST), os.path.join(seg, MANIFEST + ".hidden")
    )
    with _pytest.raises(ValueError, match="incomplete"):
        promote(root, "gen=0000")


def test_vacuum_spares_inflight_generation(spark, two_batches, tmp_path):
    """vacuum must reclaim ONLY generations the pointer lineage
    records as superseded — an unlisted directory may be a NEWER
    generation a writer is still building mid-promote."""
    import os

    from sphinx_1_spark.streaming.incremental import (
        IncrementalIndexer,
        open_current_view,
        promote,
        vacuum,
    )

    b0, b1 = two_batches
    root = str(tmp_path / "rot3")
    os.makedirs(root)
    IncrementalIndexer(os.path.join(root, "gen=0000")).process_batch(b0, 0)
    promote(root, "gen=0000")

    # a writer starts building the NEXT generation (not yet promoted)
    g1 = os.path.join(root, "gen=0001")
    IncrementalIndexer(g1).process_batch(b0, 0)

    assert vacuum(root) == []        # nothing superseded yet
    assert os.path.isdir(g1)         # the in-flight build SURVIVES

    # finish and promote gen=0001; now gen=0000 is superseded
    IncrementalIndexer(g1).process_batch(b1, 1)
    promote(root, "gen=0001")
    assert vacuum(root) == ["gen=0000"]
    assert not os.path.exists(os.path.join(root, "gen=0000"))
    assert open_current_view(spark, root).docinfo().count() == 300
    # idempotent: a second vacuum has nothing left to reclaim
    assert vacuum(root) == []


def test_rotate_full_build_cli(spark, tmp_path):
    """indexer --rotate analog (scripts/build_index_job.py --rotate):
    a full build lands in a fresh generation under the serving root
    and is atomically promoted; a second rotate build supersedes the
    first; vacuum reclaims it; open_current_view serves shard=
    segments (empty kill-lists by construction)."""
    import json
    import subprocess
    import sys

    from sphinx_1_spark.streaming.incremental import (
        open_current_view,
        read_current,
        vacuum,
    )

    root = str(tmp_path / "serving")

    def run_build(n_docs):
        proc = subprocess.run(
            [
                sys.executable,
                "scripts/build_index_job.py",
                "--synthetic",
                str(n_docs),
                "--shards",
                "2",
                "--output",
                root,
                "--rotate",
            ],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return json.loads(proc.stdout.strip().splitlines()[-1])

    stat = run_build(250)
    assert stat["rotated"] == "gen-0000000000" and stat["epoch"] == 0
    ptr = read_current(root)
    assert ptr["generation"] == "gen-0000000000"
    assert ptr["segments"] == ["shard=00000", "shard=00001"]
    assert ptr["superseded"] == []
    view = open_current_view(spark, root)
    assert view.docinfo().count() == 250
    # BM25 serving over the promoted generation works end to end
    assert view.search_topk(["the"], k=5).count() == 5

    # second build: new generation, old one superseded then vacuumed
    stat2 = run_build(300)
    assert stat2["rotated"] == "gen-0000000001" and stat2["epoch"] == 1
    ptr2 = read_current(root)
    assert ptr2["generation"] == "gen-0000000001"
    assert ptr2["superseded"] == ["gen-0000000000"]
    # the old reader's segments are untouched until vacuum
    assert view.docinfo().count() == 250
    assert vacuum(root) == ["gen-0000000000"]
    assert not os.path.exists(os.path.join(root, "gen-0000000000"))
    assert open_current_view(spark, root).docinfo().count() == 300
