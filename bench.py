#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline engine paths at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Noise protocol (VERDICT r3 #4: round-over-round comparison was
unreadable under co-tenant noise): every entry runs --repeat N times
(default 2, also $SPARK_GRAFT_BENCH_REPEAT) and "queries" maps each
name to [min, median] seconds.  Compare MINS across rounds — the min
is the machine-capability number; the median carries the noise.  The
gate indexes are memoized (_INDEX_CACHE), so a query's min is its
warm-index latency while its first run still pays that variant's
build.  "value" is the sum of mins.

Headline metric: end-to-end index build + BM25 top-k query wall time
over the documents corpus. Individual query timings include the
MATCH-operator suite (term/AND/OR/NOT/phrase/quorum/proximity) plus
the index-build phase itself ("build_index", with docs/sec derived
from it in the "extra" field).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    if "--repeat" in sys.argv:
        try:
            repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
        except (IndexError, ValueError):
            raise SystemExit("usage: bench.py [--repeat N]  (N integer >= 1)")
    repeat = max(repeat, 1)

    # The production session factory: the same config block we'd ship
    # to a cluster (AQE + skew join, Arrow batch size, shuffle scratch
    # on local NVMe / tmpfs, pinned UTC). Benchmarking the engine under
    # its shipping config, not a bare default session.
    from sphinx_1_spark.session import get_spark

    spark = get_spark(app_name="sphinx_1_spark-bench", cores=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    # name -> list of per-run seconds; reported as [min, median]
    runs: dict[str, list[float]] = {}
    extra: dict = {}

    # --- north-star metric: pages index build throughput -------------
    # strip (byte-identical automaton) -> tokenize (charset fold +
    # CJK 1-grams) -> postings/dictionary aggregation, end to end.
    from sphinx_1_spark.plans.pipeline import build_pages_index
    from sphinx_1_spark.sources.pages import generate_pages

    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "400000"))
    pages = generate_pages(spark, n_pages, seed=42, partitions=128).cache()
    pages.count()  # materialize corpus outside the timed window

    # production job: sharded segment build (strip -> tokenize ->
    # sort-shuffle -> VLB block encode -> parquet + manifest)
    import shutil
    import tempfile

    from sphinx_1_spark.plans.segment_index import build_segments

    # untimed warmup: a small segment build at the SAME partition
    # shape (128 input partitions -> full worker pool) JIT-compiles
    # the codegen stages and spins up every Python worker, so the
    # timed runs measure steady-state throughput (what a long-running
    # cluster job sees), not one-time JVM/JIT/worker startup (~15 s
    # here; a tiny 32-partition warmup left the first full run ~10 s
    # over steady state).
    warm_pages = generate_pages(spark, 20000, seed=7, partitions=128)
    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        build_segments(warm_pages, warm_dir, n_shards=1)
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)

    # best-of-N: this sandbox VM's throughput swings ~2x with
    # co-tenant load (identical runs measured 16.6-48 s); the min is
    # the machine-capability number, every run is recorded
    seg_runs = []
    for _ in range(max(repeat, 2)):
        seg_dir = tempfile.mkdtemp(prefix="bench_segs_")
        try:
            t0 = time.perf_counter()
            build_segments(pages, seg_dir, n_shards=1)
            seg_runs.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(seg_dir, ignore_errors=True)
    seg_s = min(seg_runs)
    runs["build_segment"] = seg_runs
    extra["segment_runs_s"] = [round(s, 2) for s in seg_runs]
    extra["segment_docs_per_sec"] = round(n_pages / seg_s, 2)

    # --- MMSEG dictionary-segmentation build (sphinx-for-chinese
    # flagship path): same corpus, same segment pipeline, but the
    # tokenizer runs dictionary-based Chinese segmentation (prefix
    # search + MMSEG rule cascade) instead of CJK 1-grams. Reported
    # as a ratio vs the ngram build: the scalar-Python worst case
    # VERDICT r1 flagged, now vectorized (functions/mmseg.py).
    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.sources.pages import write_mmseg_bench_dict

    mmseg_dict = write_mmseg_bench_dict(
        os.path.join(tempfile.gettempdir(), "mmseg_bench_dict.txt")
    )
    mmseg_tok = TokenizerSettings(mmseg_dict_path=mmseg_dict)
    # untimed mmseg warmup: the per-worker dictionary load + mmseg
    # module import is a fixed cost that otherwise lands entirely in
    # run 1, skewing the recorded median (the min was already warm)
    warm_dir = tempfile.mkdtemp(prefix="bench_mmseg_warm_")
    try:
        build_segments(
            generate_pages(spark, 20000, seed=7, partitions=128),
            warm_dir,
            n_shards=1,
            tokenizer=mmseg_tok,
        )
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)
    mmseg_runs = []
    for _ in range(max(repeat, 2)):
        seg_dir = tempfile.mkdtemp(prefix="bench_mmseg_")
        try:
            t0 = time.perf_counter()
            build_segments(pages, seg_dir, n_shards=1, tokenizer=mmseg_tok)
            mmseg_runs.append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(seg_dir, ignore_errors=True)
    mmseg_s = min(mmseg_runs)
    runs["build_segment_mmseg"] = mmseg_runs
    extra["mmseg_runs_s"] = [round(s, 2) for s in mmseg_runs]
    extra["mmseg_docs_per_sec"] = round(n_pages / mmseg_s, 2)
    extra["mmseg_vs_ngram_ratio"] = round(mmseg_s / seg_s, 3)

    pages_runs = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        pidx = build_pages_index(pages, docid_mode="fingerprint")
        pidx.postings.count()
        pidx.dictionary.count()
        pages_runs.append(time.perf_counter() - t0)
    runs["build_pages_index"] = pages_runs
    extra["pages_docs_per_sec"] = round(n_pages / min(pages_runs), 2)
    extra["n_pages"] = n_pages
    pages.unpersist()

    # --- documents index build (driver gate corpus) ------------------
    # single COLD measurement: _docs_index memoizes + persists, so a
    # second run would time the cache, not the build
    t0 = time.perf_counter()
    idx = entry_mod._docs_index(spark, sf_dir)
    idx.persist()
    build_s = time.perf_counter() - t0
    runs["build_index"] = [build_s]
    extra["build_docs_per_sec"] = round(idx.n_docs / build_s, 2)
    extra["n_docs"] = idx.n_docs

    # --- query suite -------------------------------------------------
    qs = entry_mod.queries()
    for name, fn in qs.items():
        samples = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = len(df.collect())
            samples.append(time.perf_counter() - t0)
        runs[name] = samples
        extra.setdefault("rows", {})[name] = n  # type: ignore[union-attr]

    total = round(sum(min(v) for v in runs.values()), 4)
    # the throughput/row diagnostics go on their own line — the
    # driver's stdout tail window is 2000 chars, so the contract line
    # below must stay short enough to survive it intact
    def contract_line(pairs: bool) -> str:
        return json.dumps(
            {
                "metric": "index_build_plus_query_suite_wall",
                "value": total,
                "unit": "sec",
                # per query: [min, median] over --repeat runs (or the
                # min alone if the pair form would overflow the
                # driver's stdout window — see below)
                "queries": {
                    k: (
                        [round(min(v), 2), round(statistics.median(v), 2)]
                        if pairs
                        else round(min(v), 2)
                    )
                    for k, v in runs.items()
                },
                "sf": sf_dir,
                "cpus": int(cpus),
                "repeat": repeat,
                "docs_per_sec": extra.get("segment_docs_per_sec"),
            },
            separators=(",", ":"),
        )

    extra["medians"] = {
        k: round(statistics.median(v), 2) for k, v in runs.items()
    }
    print("# extra: " + json.dumps(extra))
    line = contract_line(pairs=True)
    if len(line) > 1800:
        # the driver records only the LAST 2000 chars of stdout and
        # parses the final line as the bench contract — an oversized
        # line parses as null and voids the round's bench evidence
        # (it happened in round 1 at 2.8k chars).  Degrade to min-only
        # values; the medians stay on the diagnostics line above.
        line = contract_line(pairs=False)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
