"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB over the same parquet views, compare row count, column names,
and order-insensitive values.

Usage: python scripts/check_gate.py [sf_dir] [query ...]
       python scripts/check_gate.py --scaled [query ...]

--scaled builds (once) the deterministic 10x corpus derived from
sf0.1 (scripts/bench_sf_scale.build_scaled), flattens the Spark
parquet directories to single files for the DuckDB views, and runs
the gate there — the one-command reproduction of the "values hold at
10x" evidence in BENCH.md.  q_excerpts' sf0.01 oracle is a literal
golden table, so at 10x its expectation is derived CORPUS-
INDEPENDENTLY instead: the compiled reference's snipdump harness
(scripts/build_reference.sh) re-computes every excerpt over the
scaled corpus and the md5s must match ours row by row — the same
derivation the live snipdump differential uses on arbitrary text.
If the reference build is absent the entry records a printed SKIP.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SCALED_DIR = "/tmp/sf_scaled"
SCALED_FLAT = "/tmp/sf_flat"


def _prepare_scaled(spark) -> str:
    """Build + flatten the 10x corpus; idempotent."""
    import duckdb

    from bench_sf_scale import build_scaled

    build_scaled(spark, SCALED_DIR, 10)
    os.makedirs(SCALED_FLAT, exist_ok=True)
    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        dst = f"{SCALED_FLAT}/{t}.parquet"
        if not os.path.exists(dst):
            # write-temp-then-rename: an interrupted COPY must not
            # leave a truncated file the skip-if-exists would reuse
            tmp = dst + ".tmp"
            con.execute(
                f"COPY (SELECT * FROM '{SCALED_DIR}/{t}.parquet/*.parquet') "
                f"TO '{tmp}' (FORMAT PARQUET)"
            )
            os.replace(tmp, dst)
    for t in "region nation customer supplier part orders lineitem".split():
        dst = f"{SCALED_FLAT}/{t}.parquet"
        # lexists, not exists: a dangling symlink (testdata moved or
        # re-provisioned) returns exists()==False but still makes
        # os.symlink raise FileExistsError — re-point it instead
        if os.path.islink(dst) and not os.path.exists(dst):
            os.unlink(dst)
        if not os.path.lexists(dst):
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
    return SCALED_FLAT


_SNIPDUMP = "/tmp/refbuild/src/snipdump"


def _excerpts_scaled_oracle(sf_dir: str):
    """(doc_id, excerpt_md5) rows for q_excerpts over ANY corpus,
    derived from the COMPILED REFERENCE's excerpt builder (the
    snipdump differential harness) — corpus-independent, unlike the
    sf0.01 literal-golden SQL.  Mirrors q_excerpts exactly: first 50
    docs by doc_id, words "table scan", limit=64, around=3, default
    markers.  Returns None when the reference build is absent."""
    import hashlib
    import subprocess

    import duckdb

    if not os.path.exists(_SNIPDUMP):
        return None
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id LIMIT 50"
    ).fetchall()
    out = []
    for doc_id, text in rows:
        r = subprocess.run(
            [_SNIPDUMP, "table scan", "<b>", "</b>", " ... ",
             "64", "3", "none"],
            input=text.encode("utf-8"),
            capture_output=True,
            cwd="/tmp",
            check=True,
        )
        out.append((doc_id, hashlib.md5(r.stdout).hexdigest()))
    return out


def compare_frames(spark_cols, spark_rows, duck_cols, duck_rows):
    """The gate compare: returns a list of mismatch lines, [] if the
    two results agree on column names (order-insensitive), row count,
    and column-name-sorted tuple values (order-insensitive).  Python
    tuple equality intentionally treats 2 == 2.0 — numeric-type-only
    drift between Spark and DuckDB is not a value difference."""
    errs = []
    if sorted(spark_cols) != sorted(duck_cols):
        errs.append(f"COLUMN MISMATCH spark={spark_cols} duck={duck_cols}")
        return errs
    if len(spark_rows) != len(duck_rows):
        errs.append(
            f"ROWCOUNT MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}"
        )
        return errs
    s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_ix = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_vals = sorted(tuple(r[i] for i in s_ix) for r in spark_rows)
    d_vals = sorted(tuple(r[i] for i in d_ix) for r in duck_rows)
    if s_vals != d_vals:
        errs.append("VALUE MISMATCH")
        for a, b in zip(s_vals, d_vals):
            if a != b:
                errs.append(f"   spark={a}  duck={b}")
    return errs


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from sphinx_1_spark.session import get_spark

    args = sys.argv[1:]
    scaled = "--scaled" in args
    if scaled:
        args.remove("--scaled")
    sf_dir = args[0] if args and not args[0].startswith("q_") else None
    only = set(a for a in args if a.startswith("q_"))
    if scaled and sf_dir is not None:
        raise SystemExit(
            "--scaled builds its own corpus; drop the sf_dir argument "
            f"(got both --scaled and {sf_dir!r})"
        )

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    if scaled:
        sf_dir = _prepare_scaled(spark)
    elif sf_dir is None:
        sf_dir = "/root/testdata/sf0.01"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if scaled and name == "q_excerpts":
            # corpus-independent oracle: the COMPILED REFERENCE
            # recomputes every excerpt over the scaled corpus
            want = _excerpts_scaled_oracle(sf_dir)
            if want is None:
                print(
                    "q_excerpts: SKIP at 10x (reference snipdump "
                    "harness absent — run scripts/build_reference.sh)"
                )
                continue
            sdf = fn(spark, sf_dir)
            got = [tuple(r) for r in sdf.collect()]
            errs = compare_frames(
                sdf.columns, got, ["doc_id", "excerpt_md5"], want
            )
            if errs:
                print(f"{name}: {errs[0]} (vs reference snipdump)")
                for line in errs[1:]:
                    print(line)
                failures += 1
            else:
                print(
                    f"{name}: OK ({len(got)} rows, oracle = compiled "
                    "reference snipdump over the scaled corpus)"
                )
            continue
        sdf = fn(spark, sf_dir)
        spark_rows = [tuple(r) for r in sdf.collect()]
        spark_cols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows={len(spark_rows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = [tuple(r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        errs = compare_frames(spark_cols, spark_rows, duck_cols, duck_rows)
        if errs:
            head, tail = errs[0], errs[1:]
            print(f"{name}: {head}")
            for line in tail:
                print(line)
            failures += 1
        else:
            print(f"{name}: OK ({len(spark_rows)} rows)")
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
