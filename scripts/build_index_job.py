#!/usr/bin/env python
"""spark-submit entry point: build a sharded inverted-index segment set
from a pages table.

Usage (cluster):
    python scripts/package.py                  # -> dist/sphinx_1_spark.zip
    spark-submit --py-files dist/sphinx_1_spark.zip \\
        scripts/build_index_job.py \\
        --input /path/to/pages_parquet_or_iceberg_table \\
        --output /path/to/segments --shards 64

Usage (local smoke, synthetic corpus):
    python scripts/build_index_job.py --synthetic 50000 \\
        --output /tmp/segs --shards 4

Atomic rotation (indexer --rotate analog): --output becomes the
serving ROOT; the build lands in ROOT/gen-<epoch>/ and is promoted
via the CURRENT pointer only when complete:
    python scripts/build_index_job.py --synthetic 50000 \\
        --output /srv/index --shards 64 --rotate

The job is resumable: rerunning with the same arguments skips shards
whose _MANIFEST.json exists (kill -9 mid-build, rerun, identical
output — see tests/test_segments.py::test_manifest_and_resume).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages table path (parquet dir or iceberg)")
    ap.add_argument("--synthetic", type=int, default=0, help="generate N pages")
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--docid-mode", default="fingerprint")
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--mmseg-dict", default=None)
    ap.add_argument(
        "--config",
        default=None,
        metavar="SPHINX_CONF",
        help="sphinx.conf to read tokenizer/dictionary/index settings "
        "from (CSphConfigParser grammar incl. inheritance; "
        "sphinx_1_spark/sources/config.py); use with --index",
    )
    ap.add_argument(
        "--index",
        default=None,
        metavar="NAME",
        help="index section name inside --config (indexer <NAME>)",
    )
    ap.add_argument(
        "--rotate",
        action="store_true",
        help="atomic rotation (indexer --rotate, src/indexer.cpp:1160+ "
        "sending SIGHUP after the .new build): treat --output as the "
        "serving ROOT, build into a fresh generation directory under "
        "it, then atomically promote the generation via the CURRENT "
        "pointer — readers on open_current_view() never see a partial "
        "index, and a killed run resumes the same unpromoted "
        "generation",
    )
    ap.add_argument(
        "--buildstops",
        nargs=2,
        metavar=("OUTPUT", "N"),
        help="build a candidate-stopwords list instead of indexing "
        "(indexer --buildstops <output.txt> <N>, src/indexer.cpp:911)",
    )
    ap.add_argument(
        "--buildfreqs",
        action="store_true",
        help="store word frequencies to the output (with --buildstops only)",
    )
    args = ap.parse_args()
    if args.buildfreqs and not args.buildstops:
        ap.error("--buildfreqs is used with --buildstops only")
    if bool(args.config) != bool(args.index):
        ap.error("--config and --index are used together")
    if args.config and args.mmseg_dict:
        ap.error("--mmseg-dict conflicts with --config (set "
                 "chinese_dictionary in the config instead)")

    from pyspark.sql import SparkSession

    from sphinx_1_spark.session import apply_engine_conf

    # master/executors come from spark-submit; the engine ships its
    # own session conf (AQE, Arrow batches, UTC, broadcast threshold)
    spark = apply_engine_conf(
        SparkSession.builder.appName("sphinx_1_spark-build")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.plans.segment_index import build_segments, read_manifest

    if args.synthetic:
        from sphinx_1_spark.sources.pages import generate_pages

        pages = generate_pages(spark, args.synthetic, seed=42)
    elif args.input:
        pages = (
            # iceberg:<catalog.db.table or path> — strip the scheme
            # before load(); needs the iceberg-spark-runtime jar on the
            # cluster (not shipped in this sandbox)
            spark.read.format("iceberg").load(args.input[len("iceberg:"):])
            if args.input.startswith("iceberg:")
            else spark.read.parquet(args.input)
        )
    else:
        ap.error("need --input or --synthetic")

    if args.config:
        # sphLoadConfig analog (sphinxutils.cpp:863-905)
        from sphinx_1_spark.sources.config import index_config, parse_config

        from sphinx_1_spark.sources.config import ConfigError

        print(f"using config file '{args.config}'...")
        try:
            conf = parse_config(args.config)
            if "index" not in conf.sections:
                raise ConfigError(
                    f"no indexes found in config file '{args.config}'"
                )
            icfg = index_config(conf, args.index)
        except (ConfigError, OSError) as e:
            print(f"FATAL: {e}")
            sys.exit(1)
        for w in conf.warnings:
            print(w)
        tok = icfg.tokenizer
    else:
        tok = TokenizerSettings(
            ngram_chars="" if args.mmseg_dict else "U+4E00..U+9FBF",
            mmseg_dict_path=args.mmseg_dict,
        )
    if args.buildstops:
        # like the reference, --buildstops replaces indexing entirely
        # (DoIndex returns after tDict.Save, src/indexer.cpp:911-934)
        from sphinx_1_spark.plans.segment_index import (
            build_stopwords,
            save_stopwords,
        )

        out_path, top_n = args.buildstops[0], int(args.buildstops[1])
        t0 = time.perf_counter()
        top = build_stopwords(pages, tok, top_n=top_n)
        n = save_stopwords(top, out_path, with_freqs=args.buildfreqs)
        print(
            json.dumps(
                {
                    "buildstops": out_path,
                    "words": n,
                    "freqs": bool(args.buildfreqs),
                    "wall_s": round(time.perf_counter() - t0, 2),
                }
            )
        )
        spark.stop()
        return

    from sphinx_1_spark.plans.segment_index import segment_complete

    out_dir = args.output
    generation = None
    if args.rotate:
        from sphinx_1_spark.streaming.incremental import read_current

        ptr = read_current(args.output)
        # deterministic name: the NEXT epoch — a killed, unpromoted
        # run recomputes the same name and resumes its own shards
        generation = f"gen-{(ptr['epoch'] + 1) if ptr else 0:010d}"
        out_dir = os.path.join(args.output, generation)

    pre_complete = {
        os.path.join(out_dir, d)
        for d in (os.listdir(out_dir) if os.path.isdir(out_dir) else [])
        if segment_complete(os.path.join(out_dir, d))
    }
    t0 = time.perf_counter()
    paths = build_segments(
        pages,
        out_dir,
        n_shards=args.shards,
        tokenizer=tok,
        with_positions=not args.no_positions,
        docid_mode=args.docid_mode,
    )
    wall = time.perf_counter() - t0
    total = {"docs": 0, "hits": 0, "blocks": 0}
    built_docs = 0  # docs indexed by THIS run (resume skips shards)
    for p in paths:
        m = read_manifest(p)
        total["docs"] += m["n_docs"]
        total["hits"] += m["n_hits"]
        total["blocks"] += m["n_blocks"]
        if p not in pre_complete:
            built_docs += m["n_docs"]
    rotation = {}
    if args.rotate:
        from sphinx_1_spark.streaming.incremental import promote

        ptr = promote(
            args.output, generation, meta={"built_docs": built_docs}
        )
        rotation = {"rotated": generation, "epoch": ptr["epoch"]}
    print(
        json.dumps(
            {
                **rotation,
                "segments": len(paths),
                "resumed_segments": len(pre_complete),
                "wall_s": round(wall, 2),
                # throughput over the shards this run actually built —
                # dividing ALL shards' docs by a resume-only wall
                # inflated the evidence line ~Nx on an N-1/N resume
                "docs_per_sec": round(built_docs / wall, 2) if wall else None,
                **total,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
