"""Bit helpers for field-mask math on Columns.

F.shiftleft requires a literal shift amount; field ids are columns, so
1<<field is computed as an exact power-of-two via pow() (exact in
binary64 up to 2^52; field ids are < 32 — SPH_MAX_FIELDS,
src/sphinx.h:147).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shl1(bits: Column) -> Column:
    """1 << bits for a Column of small non-negative ints."""
    return F.pow(F.lit(2.0), bits.cast("double")).cast("long")


def field_of_pos(p: Column) -> Column:
    """HIT2FIELD (src/sphinx.cpp:235)."""
    return F.shiftright(p.cast("long"), 24)


def field_bit_of_pos(p: Column) -> Column:
    """1 << HIT2FIELD(p)."""
    return shl1(field_of_pos(p))
