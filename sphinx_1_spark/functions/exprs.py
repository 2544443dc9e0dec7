"""Sphinx expression-engine functions as Catalyst columns.

Maps the interpreted expression tree of src/sphinxexpr.cpp (function
table :325-353) onto native Spark SQL expressions — everything stays
in whole-stage codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GEO_R = 6384000.0  # reference earth radius, src/sphinxexpr.cpp:1156


def geodist(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """GEODIST(): haversine over radian inputs with Sphinx's constants
    (CalcGeodist, src/sphinxexpr.cpp:1154-1162): R=6384000,
    c = 2*asin(min(1, sqrt(a))).  Double math (the reference narrows
    in/out to float32; parity tests cover that separately)."""
    dlat = lat1 - lat2
    dlon = lon1 - lon2
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(lat1) * F.cos(lat2) * F.pow(
        F.sin(dlon / 2), 2
    )
    c = 2 * F.asin(F.least(F.lit(1.0), F.sqrt(a)))
    return F.lit(GEO_R) * c


def interval(x: Column, *points) -> Column:
    """INTERVAL(x, p1..pn) -> index of the FIRST point > x (linear
    scan, Expr_Interval src/sphinxexpr.cpp:1030-1053) — first-match,
    so an unsorted point list answers like the reference."""
    chain = None
    for i, p in enumerate(points):
        cond = x < F.lit(p)
        chain = (
            F.when(cond, F.lit(i))
            if chain is None
            else chain.when(cond, F.lit(i))
        )
    return chain.otherwise(F.lit(len(points)))


def if_(cond: Column, then, else_) -> Column:
    """IF(c,t,f): nonzero test like the reference (numeric c)."""
    return F.when(cond, then).otherwise(else_)


def idiv(a: Column, b: Column) -> Column:
    """IDIV: integer division truncating toward zero (C semantics);
    double-divide + long cast truncates toward zero in Spark."""
    return F.when(b != 0, (a / b).cast("long"))


def madd(a: Column, b: Column, c: Column) -> Column:
    return a * b + c


def mul3(a: Column, b: Column, c: Column) -> Column:
    return a * b * c


def now(epoch: int | None = None) -> Column:
    """NOW() (Expr_GetTimestamp / SPH_EXPR_NOW row of the function
    table, src/sphinxexpr.cpp:325-353): the reference caches the query
    start time once at expression-setup, so every row of one query
    sees the SAME integer epoch.  Pinned at plan-construction time
    here for the same reason (a per-row current_timestamp() would
    diverge across executors mid-query); pass `epoch` to pin it
    explicitly (tests / oracle parity)."""
    if epoch is None:
        import time

        epoch = int(time.time())
    return F.lit(int(epoch)).cast("long")
