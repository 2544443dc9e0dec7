#!/usr/bin/env python
"""Segment describe/dump utility — the `indextool` equivalent
(src/indextool.cpp:19-157: header dump + dictionary stats, re-expressed
over the parquet segment store).

Usage:
  python scripts/segment_tool.py describe <segment_dir ...>
  python scripts/segment_tool.py dictionary <segment_dir ...> [--top N]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from sphinx_1_spark.session import get_spark

    # cores=None honors SPARK_GRAFT_CPUS / cpu_count like every other
    # entry point (a hardcoded 8 underuses the bench box and
    # oversubscribes small ones)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def describe(paths: list[str]) -> None:
    """Header dump (CSphIndex_VLN::LoadHeader analog): manifest
    settings, stats, and lineage/metrics per segment."""
    from sphinx_1_spark.plans.segment_index import read_manifest

    for p in paths:
        m = read_manifest(p)
        print(f"segment: {p}")
        for key in sorted(m):
            val = m[key]
            if isinstance(val, (dict, list)):
                val = json.dumps(val, sort_keys=True)
            print(f"  {key}: {val}")


def dictionary(paths: list[str], top: int) -> None:
    """Top-df dictionary entries across segments (indextool --dumpdict
    analog)."""
    from pyspark.sql import functions as F

    from sphinx_1_spark.plans.segment_index import SegmentSet

    spark = _spark()
    ss = SegmentSet(spark, paths)
    # ss.dictionary is the ONE merged-dictionary definition (already
    # summed per (wordid, word) across segments) — don't re-derive it
    d = (
        ss.dictionary.groupBy("word")
        .agg(F.sum("docs").alias("docs"), F.sum("hits").alias("hits"))
        .orderBy(F.col("docs").desc(), F.col("word").asc())
        .limit(top)
    )
    for r in d.collect():
        print(f"{r['word']}\t{r['docs']}\t{r['hits']}")


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 1
    cmd = argv[1]
    top = 50
    args = []
    it = iter(argv[2:])
    for a in it:
        if a == "--top":
            operand = next(it, None)
            if operand is None or not operand.isdigit():
                print("usage: --top N (positive integer)")
                return 1
            top = int(operand)
        else:
            args.append(a)
    if cmd == "describe":
        describe(args)
    elif cmd == "dictionary":
        dictionary(args, top)
    else:
        print(f"unknown command {cmd!r}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
