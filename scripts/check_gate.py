"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB over the same parquet views, compare row count, column names,
and order-insensitive values.

Usage: python scripts/check_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from sphinx_1_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")

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
        ok = True
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"{name}: COLUMN MISMATCH spark={spark_cols} duck={duck_cols}")
            ok = False
        if len(spark_rows) != len(duck_rows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}")
            ok = False
        if ok:
            # order-insensitive compare on column-name-sorted tuples
            s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
            d_ix = [duck_cols.index(c) for c in sorted(duck_cols)]
            s_vals = sorted(tuple(r[i] for i in s_ix) for r in spark_rows)
            d_vals = sorted(tuple(r[i] for i in d_ix) for r in duck_rows)
            if s_vals != d_vals:
                print(f"{name}: VALUE MISMATCH")
                for a, b in zip(s_vals, d_vals):
                    if a != b:
                        print(f"   spark={a}  duck={b}")
                ok = False
        if ok:
            print(f"{name}: OK ({len(spark_rows)} rows)")
        else:
            failures += 1
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
