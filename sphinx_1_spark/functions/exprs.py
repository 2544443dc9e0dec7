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
    (CalcGeodist, src/sphinxexpr.cpp:1154-1162; ExprGeodist_t::Eval,
    src/sphinxsort.cpp:1745-1756): R=6384000, c = 2*asin(min(1,
    sqrt(a))).  Compiled-binary float semantics, pinned by the live
    daemon differential (bit-exact on every @geodist it serves):

    * inputs are FLOAT32 and the deltas subtract float-by-float
      (`double dlat = fLat - fAnchorLat` rounds to float32 first);
    * `cos(fLat)` resolves to the C++ float overload — the binary
      calls COSF and multiplies the two cosines in FLOAT32 (mulss;
      verified in the disassembly of Expr_GeodistAttrConst_c::Eval)
      before widening the product to double;
    * the two `sin` calls take double args (dlat/2) and stay double;
    * the result narrows to float32 (callers cast).

    Without the cosf/mulss step the result drifts one float32 ulp on
    ~20% of inputs — the live binary-API differential caught it."""
    lat1 = lat1.cast("float")
    lat2 = lat2.cast("float")
    dlat = (lat1 - lat2).cast("float")
    dlon = (lon1.cast("float") - lon2.cast("float")).cast("float")
    coscos = (
        F.cos(lat1).cast("float") * F.cos(lat2).cast("float")
    ).cast("float")
    a = F.pow(F.sin(dlat / 2), 2) + coscos * F.pow(F.sin(dlon / 2), 2)
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
