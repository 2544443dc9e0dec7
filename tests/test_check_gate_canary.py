"""Diff-injection canaries for the gate-replica comparator.

scripts/check_gate.py is the local replica of the driver's
CORRECTNESS gate; its "50/50 OK" evidence is only meaningful if
compare_frames actually compares.  Each test injects one perturbation
— column set, row count, a single value, row order used as a mask —
and asserts it is reported, plus that identical and merely-reordered
results still pass (the compare is order-insensitive by contract).
Pure Python, no Spark or DuckDB.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "check_gate",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "check_gate.py"),
)
check_gate = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_gate)

compare_frames = check_gate.compare_frames

COLS = ["doc_id", "weight"]
ROWS = [(1, 1500), (3, 2500), (2, 1500)]


def test_identical_passes():
    assert compare_frames(COLS, ROWS, COLS, ROWS) == []


def test_row_and_column_order_insensitive():
    # oracle rows in a different order, columns in a different order
    duck_cols = ["weight", "doc_id"]
    duck_rows = [(2500, 3), (1500, 1), (1500, 2)]
    assert compare_frames(COLS, ROWS, duck_cols, duck_rows) == []


def test_column_set_mismatch_flagged():
    errs = compare_frames(COLS, ROWS, ["doc_id", "w8"], ROWS)
    assert errs and "COLUMN MISMATCH" in errs[0]


def test_rowcount_mismatch_flagged():
    errs = compare_frames(COLS, ROWS, COLS, ROWS[:2])
    assert errs and "ROWCOUNT MISMATCH" in errs[0]


def test_single_value_diff_flagged():
    duck_rows = [(1, 1500), (3, 2501), (2, 1500)]
    errs = compare_frames(COLS, ROWS, COLS, duck_rows)
    assert errs and errs[0] == "VALUE MISMATCH"
    assert any("2501" in e for e in errs[1:])


def test_swapped_values_across_rows_flagged():
    # same multiset per column but different row pairings must fail
    duck_rows = [(1, 2500), (3, 1500), (2, 1500)]
    errs = compare_frames(COLS, ROWS, COLS, duck_rows)
    assert errs and errs[0] == "VALUE MISMATCH"


def test_numeric_type_drift_tolerated():
    # int vs float of equal value is not a mismatch (Python tuple
    # equality), matching the documented contract
    duck_rows = [(1.0, 1500.0), (3.0, 2500.0), (2.0, 1500.0)]
    assert compare_frames(COLS, ROWS, COLS, duck_rows) == []


def test_none_vs_zero_flagged():
    duck_rows = [(1, 1500), (3, None), (2, 1500)]
    errs = compare_frames(COLS, ROWS, COLS, duck_rows)
    assert errs and errs[0] == "VALUE MISMATCH"
