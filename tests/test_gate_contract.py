"""Driver-contract guard (VERDICT r2 item 8): every gate the driver
will run must satisfy the canonicalizer's structural constraints
BEFORE submit — the round-2 red (q_mva_filter's array<long> column)
was exactly a violation this test would have caught.

Checks, per __spark_entry__ queries()/oracle_sql() entry at sf0.001:
  * <= 50 gate entries (the driver's window);
  * result schema has NO array/map/struct column (the driver's pandas
    canonicalizer factorizes cells — unhashable cells raise);
  * column names are unique (the compare sorts by name);
  * Spark column names == oracle column names (set equality, the
    driver's precondition for the value hash);
  * every oracle actually parses and runs on DuckDB.
"""

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def gate_dfs(spark):
    """Construct every gate DataFrame once (builds indexes as a side
    effect) keyed by name."""
    return {name: fn(spark, SF_DIR) for name, fn in entry.queries().items()}


@pytest.fixture(scope="module")
def oracle_cols(duck):
    out = {}
    for name, sql in entry.oracle_sql().items():
        res = duck.execute(sql)
        out[name] = [d[0] for d in res.description]
        res.fetchall()
    return out


def test_gate_count_within_driver_window():
    assert 0 < len(entry.queries()) <= 50


def test_every_oracle_key_has_a_query():
    assert set(entry.oracle_sql()) <= set(entry.queries())


def test_every_query_is_fully_value_checked():
    """Every gate currently ships an oracle, so the driver records the
    strong rows+schema+hash check for all of them.  A queries() entry
    without an oracle silently downgrades to the weaker rows-only
    check — adding one must be a conscious decision made here."""
    missing = set(entry.queries()) - set(entry.oracle_sql())
    assert not missing, (
        f"gates without oracles get only the rows-only check: {missing}"
    )


def test_no_unhashable_result_columns(gate_dfs):
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {
        name: [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        for name, df in gate_dfs.items()
    }
    bad = {k: v for k, v in bad.items() if v}
    assert not bad, (
        f"array/map/struct result columns break the driver's pandas "
        f"canonicalizer — project to scalars: {bad}"
    )


def test_unique_column_names(gate_dfs):
    dup = {
        name: df.columns
        for name, df in gate_dfs.items()
        if len(df.columns) != len(set(df.columns))
    }
    assert not dup


def test_columns_match_oracle(gate_dfs, oracle_cols):
    mismatch = {}
    for name, cols in oracle_cols.items():
        if sorted(gate_dfs[name].columns) != sorted(cols):
            mismatch[name] = (gate_dfs[name].columns, cols)
    assert not mismatch, f"spark vs oracle column mismatch: {mismatch}"
