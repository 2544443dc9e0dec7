"""Attribute-query layer: fullscan, filters, grouping, sorting —
the non-MATCH half of Sphinx's query surface.

Covers (SURVEY.md §2.6/§2.7):
  * fullscan matching (MatchFullScan, src/sphinx.cpp:14722): no text
    query, attribute filters only — zone-map block rejects are
    Parquet row-group stats (free);
  * Filter_Values / Filter_Range / Filter_FloatRange
    (src/sphinxfilter.cpp:151-218) as isin/between columns;
  * GROUP BY attr / day / week / month / year (GroupBy funcs,
    src/sphinxsort.cpp:234-268 — reference uses localtime; we pin the
    session timezone, deterministic) with @count, aggregates, and
    COUNT(DISTINCT attr) (CSphUniqounter, src/sphinxsort.cpp:446);
  * WITHIN GROUP ORDER BY: representative row per group via a
    row_number window (SetGroupState, src/sphinxsort.cpp:979-990);
  * multi-key sort modes (extended sort clause ≤5 keys,
    sphParseSortClause src/sphinxsort.cpp:1496) and expression sort.

Spark's exact groupBy is a documented semantic upgrade over the
reference's 4x-buffered approximate k-buffer group sorter
(CSphKBufferGroupSorter, src/sphinxsort.cpp:717-1086).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

GROUPBY_FUNCS = ("day", "week", "month", "year", "attr")


def group_key(col: Column, func: str = "attr") -> Column:
    """GROUPBY_DAY/WEEK/MONTH/YEAR/ATTR (src/sphinxsort.cpp:234-268).

    Week buckets follow the reference's struct-tm math: the bucket is
    the date of the preceding Sunday (tm_wday=0 start of week)."""
    if func == "attr":
        return col
    if func == "day":
        return F.date_trunc("day", col).cast("date")
    if func == "week":
        # Sunday-start week like localtime tm_wday arithmetic
        return F.date_sub(col.cast("date"), F.dayofweek(col) - 1)
    if func == "month":
        return F.date_trunc("month", col).cast("date")
    if func == "year":
        return F.date_trunc("year", col).cast("date")
    raise ValueError(f"unknown group func {func!r}")


def time_segment(ts: Column, now_epoch: int) -> Column:
    """SPH_SORT_TIME_SEGMENTS bucket (GetSegment,
    src/sphinxsort.cpp:1252-1261): 0=last hour, 1=day, 2=week,
    3=month, 4=3 months, 5=older.  Sort order is (segment asc,
    weight desc, stamp desc, docid asc)."""
    stamp = F.unix_timestamp(ts)
    return (
        F.when(stamp >= now_epoch - 3600, 0)
        .when(stamp >= now_epoch - 24 * 3600, 1)
        .when(stamp >= now_epoch - 7 * 24 * 3600, 2)
        .when(stamp >= now_epoch - 30 * 24 * 3600, 3)
        .when(stamp >= now_epoch - 90 * 24 * 3600, 4)
        .otherwise(5)
    )


def fullscan(
    df: DataFrame,
    filters: list[Column] | None = None,
    order_by: list[Column] | None = None,
    limit: int = 20,
    offset: int = 0,
    select: list[Column] | None = None,
) -> DataFrame:
    """Fullscan query: filters -> sort -> paging, no text match."""
    out = df
    for flt in filters or []:
        out = out.where(flt)
    if select:
        out = out.select(*select)
    if order_by:
        out = out.orderBy(*order_by)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def group_query(
    df: DataFrame,
    group_col: str,
    group_func: str = "attr",
    aggs: list[Column] | None = None,
    within_group_order: list[Column] | None = None,
    having: Column | None = None,
    order_by: list[Column] | None = None,
    limit: int = 20,
) -> DataFrame:
    """GROUP BY with @count, aggregates, and optionally the
    representative "best row" id per group (WITHIN GROUP ORDER BY)."""
    key = group_key(F.col(group_col), group_func).alias("groupkey")
    agg_list = [F.count(F.lit(1)).alias("at_count")] + list(aggs or [])
    grouped = df.select(key, "*").groupBy("groupkey").agg(*agg_list)
    if within_group_order:
        w = Window.partitionBy("groupkey").orderBy(*within_group_order)
        best = (
            df.select(key, "*")
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        keep = [c for c in best.columns if c != "groupkey"]
        best = best.select(
            "groupkey", *[F.col(c).alias(f"best_{c}") for c in keep]
        )
        grouped = grouped.join(best, "groupkey")
    if having is not None:
        grouped = grouped.where(having)
    if order_by:
        grouped = grouped.orderBy(*order_by)
    return grouped.limit(limit)


def update_attributes(
    docinfo: DataFrame,
    updates: DataFrame,
    attrs: list[str],
    docid_col: str = "docid",
) -> DataFrame:
    """UpdateAttributes (src/sphinx.cpp:7135-7290): poke new values
    for the named attrs into matching docid rows.

    The reference mutates the in-RAM .spa pool in place (binary-search
    by docid, then widens the 128-row block min/max).  Tables here are
    immutable, so this is copy-on-write: a broadcast left join +
    coalesce produces the updated docinfo relation — semantically the
    MERGE INTO of the batch world.  Docids absent from docinfo are
    ignored (the reference returns the count of rows actually hit);
    attrs not listed keep their old values.  Only scalar attrs are
    updatable, as in 0.9.9 (no MVA/string update)."""
    upd = updates.select(
        F.col(docid_col),
        *[F.col(a).alias(f"_new_{a}") for a in attrs],
    )
    out = docinfo.join(F.broadcast(upd), docid_col, "left")
    for a in attrs:
        out = out.withColumn(a, F.coalesce(F.col(f"_new_{a}"), F.col(a)))
    return out.drop(*[f"_new_{a}" for a in attrs])
