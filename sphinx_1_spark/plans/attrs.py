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

import re

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
    weight desc, stamp desc, docid asc).

    The reference's SPH_ATTR_TIMESTAMP is a plain uint32 of epoch
    seconds; the cast-through-timestamp makes this accept either a
    Spark TIMESTAMP column or its numeric epoch-seconds analog
    (bigint seconds -> timestamp is Spark's documented cast)."""
    stamp = F.unix_timestamp(ts.cast("timestamp"))
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


# ----------------------------------------------------------------------
# SphinxAPI sort/group layer: SetSortMode / SetGroupBy semantics
# ----------------------------------------------------------------------

# sphinxcustomsort.inl: the compiled-in "@custom" ranking formula
# weight + group_id*0.3 - log ( NOW() - date_added ), descending
_CUSTOM_SORT_ATTRS = ("group_id", "date_added")


class SortClauseError(ValueError):
    pass


def docid_ord(docid_col: str = "docid") -> Column:
    """UNSIGNED 64-bit docid order key: SphDocID_t is a DWORD64
    (src/sphinx.h, --enable-id64), so every reference comparator
    orders docids unsigned; uint64 values above 2^63-1 arrive here
    wrapped into negative longs, and xor with the sign bit is the
    monotone unsigned->signed bijection — '.asc()' over this key is
    docid-asc in the reference's unsigned order.  THE one docid
    tie-break definition: engine/api/sphinxql/group/minimize/WAND all
    order through it so the same query gives the same tie order on
    every path (test_47 id64 parity)."""
    return F.col(docid_col).bitwiseXOR(F.lit(-(1 << 63)))


def parse_sort_clause(
    clause: str, attr_names: set[str]
) -> str | list[tuple[str, bool]]:
    """sphParseSortClause (src/sphinxsort.cpp:1496-1600).

    Returns 'random' / 'custom' for the two specials, else a list of
    (key, desc) pairs where key is '@weight', '@id', '@groupby',
    '@count', '@distinct' or an attribute name.  A single-key clause
    gets the implicit trailing ('@id', False) — id ASC (:1590).  The
    mini-tokenizer folds to [0-9a-z_@] (:1505), so punctuation splits
    tokens and order words are case-insensitive."""
    toks = re.findall(r"[0-9a-z_@]+", clause.lower())
    keys: list[tuple[str, bool]] = []
    expect_field = True
    for i, tok in enumerate(toks):
        if i == 0 and tok == "@random":
            return "random"
        if i == 0 and tok == "@custom":
            # order token after @custom is never parsed (:1525-1528)
            return "custom"
        if expect_field:
            if len(keys) == 5:
                raise SortClauseError(
                    "too much sort-by fields; maximum count is 5"
                )
            if tok in ("@relevance", "@rank", "@weight"):
                keys.append(("@weight", False))
            elif tok == "@id":
                keys.append(("@id", False))
            else:
                if tok == "@group":
                    tok = "@groupby"
                if tok not in attr_names and tok not in (
                    "@groupby", "@count", "@distinct",
                ):
                    raise SortClauseError(
                        f"sort-by attribute '{tok}' not found"
                    )
                keys.append((tok, False))
        else:
            if tok not in ("asc", "desc"):
                raise SortClauseError(f"invalid sorting order '{tok}'")
            if tok == "desc":
                keys[-1] = (keys[-1][0], True)
        expect_field = not expect_field
    if not keys:
        raise SortClauseError("no sort order defined")
    if len(keys) == 1:
        keys.append(("@id", False))
    return keys


def sort_clause_columns(
    keys: list[tuple[str, bool]],
    attr_types: dict[str, str] | None = None,
    docid_col: str = "docid",
    weight_col: str = "weight",
) -> list[Column]:
    """Comparator columns for a parsed extended-sort clause
    (SPH_TEST_KEYPART, src/sphinxsort.cpp:1290-1302): weight and ints
    compare natively, float attrs as float32."""
    attr_types = attr_types or {}
    out = []
    for key, desc in keys:
        if key == "@weight":
            c = F.col(weight_col)
        elif key == "@id":
            # SphDocID_t compares as a DWORD64 — unsigned order
            c = docid_ord(docid_col)
        else:
            c = F.col(key)
            if attr_types.get(key) == "float":
                c = c.cast("float")
        out.append(c.desc() if desc else c.asc())
    return out


def custom_sort_column(now_epoch: int) -> Column:
    """The "@custom" comparator value (sphinxcustomsort.inl):
    weight + group_id*0.3 - log(NOW() - date_added), float32 chain,
    descending, NO docid tiebreak (heap order on exact ties)."""
    w = F.col("weight").cast("float").cast("double")
    g = F.col("group_id").cast("float").cast("double")
    d = F.col("date_added").cast("float").cast("double")
    val = (
        (w + (g * F.lit(0.3).cast("float").cast("double")).cast("float"))
        .cast("float")
        .cast("double")
        - F.log(F.lit(float(now_epoch)) - d)
    )
    return val.cast("float")


def api_group_key(col: Column, func: str = "attr") -> Column:
    """SetGroupBy key in the reference's INTEGER forms
    (CSphGrouperDay/Week/Month/Year, src/sphinxsort.cpp:239-267):
    day=YYYYMMDD, month=YYYYMM, year=YYYY, week=YYYY*1000 + day-of-
    year of the preceding Sunday (base 1, year-boundary rollback with
    the leap adjustment).  The reference uses server localtime; the
    session timezone (pinned UTC) stands in deterministically."""
    if func == "attr":
        return col.cast("long")
    ts = F.to_timestamp(col.cast("long"))
    year = F.year(ts)
    if func == "day":
        return (year * 10000 + F.month(ts) * 100 + F.dayofmonth(ts)).cast("long")
    if func == "month":
        return (year * 100 + F.month(ts)).cast("long")
    if func == "year":
        return year.cast("long")
    if func == "week":
        # prev Sunday day-of-year, base 1; tm_wday: Sunday=0
        prev_sunday = F.dayofyear(ts) - (F.dayofweek(ts) - 1)
        prev_year = year - 1
        leap = (prev_year % 4 == 0) & (
            (prev_year % 100 != 0) | (prev_year % 400 == 0)
        )
        rolled = prev_sunday + F.when(leap, 366).otherwise(365)
        return (
            F.when(prev_sunday <= 0, prev_year * 1000 + rolled)
            .otherwise(year * 1000 + prev_sunday)
            .cast("long")
        )
    raise ValueError(f"unknown group func {func!r}")


def api_group_query(
    matches: DataFrame,
    group_attr: str,
    group_func: str = "attr",
    groupsort: str = "@group desc",
    attr_types: dict[str, str] | None = None,
    distinct_attr: str | None = None,
    mva: bool = False,
    docid_col: str = "docid",
    limit: int = 20,
    max_matches: int = 1000,
) -> DataFrame:
    """SetGroupBy over a ranked match relation (CSphKBufferGroupSorter,
    src/sphinxsort.cpp:717-1086, exact-grouping upgrade): one output
    row per group — the best match by the inner relevance comparator
    (weight desc, docid asc) — carrying @groupby (integer key),
    @count, optionally @distinct (CSphUniqounter COUNT(DISTINCT)),
    ordered by the groupsort clause.  MVA grouping explodes the value
    list so a doc lands in every value's group (:1141)."""
    attr_types = attr_types or {}
    if mva:
        keyed = matches.withColumn("_gval", F.explode(F.col(group_attr)))
        keyed = keyed.withColumn(
            "@groupby", api_group_key(F.col("_gval"), group_func)
        ).drop("_gval")
    else:
        keyed = matches.withColumn(
            "@groupby", api_group_key(F.col(group_attr), group_func)
        )
    w = Window.partitionBy("@groupby").orderBy(
        F.col("weight").desc(), docid_ord(docid_col).asc()
    )
    best = (
        keyed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    aggs = [F.count(F.lit(1)).alias("@count")]
    if distinct_attr:
        aggs.append(F.countDistinct(F.col(distinct_attr)).alias("@distinct"))
    counts = keyed.groupBy("@groupby").agg(*aggs)
    out = best.join(counts, "@groupby")
    keys = parse_sort_clause(
        groupsort,
        set(attr_types) | {c for c in matches.columns},
    )
    if isinstance(keys, str):
        raise SortClauseError(f"groups can not be sorted by @{keys}")
    out = out.orderBy(
        *sort_clause_columns(keys, attr_types, docid_col=docid_col)
    )
    if not limit:
        # limit=0: caller defers the cut (multi-index groupdistinct
        # must re-aggregate + re-sort before applying max_matches)
        return out
    return out.limit(min(limit, max_matches))


def group_cutoff(
    base: DataFrame,
    group_col: Column,
    cutoff: int,
    docid_col: str = "docid",
    key_frame: DataFrame | None = None,
) -> DataFrame:
    """SetLimits cutoff under GROUPING: the reference's match loop
    decrements iCutoff only on bNewMatch — and a group sorter's Push
    returns true only when a NEW GROUP is created (SPH_SUBMIT_MATCH,
    src/sphinx.cpp:11119-11138) — so matching stops right after the
    match that creates the cutoff-th distinct group, dropping every
    later match even of already-seen groups.  Pinned live against the
    daemon (test_random_select_compositions: gid sequence 2,3,1,2...
    with cutoff=3 keeps docids 1,2,4 only — all three groups at
    @count=1).

    Batch form: the cut position is the cutoff-th DISTINCT
    first-occurrence docid across groups; keep matches at or before
    it.  The distinct matters for MVA group keys (`key_frame` = the
    exploded values): one match can introduce several value-groups
    but decrements the daemon's counter ONCE (bNewMatch is a single
    bool per match); for scalar keys first-occurrence docids are
    unique per group, so distinct is a no-op.  The collect is bounded
    by cutoff rows.  With fewer introducing matches than the
    cutoff, it never fires and the match set is untouched — but when
    the count EQUALS the cutoff it still cuts at the last introducing
    match (`--iCutoff==0` breaks the loop there, dropping later
    members of already-seen groups; live-verified).

    key_frame: optional (docid, values) relation to derive group
    first-occurrences from when the key is not a plain column of
    `base` (the exploded MVA case); the cut still filters `base`."""
    from pyspark.sql import functions as F

    ord_col = docid_ord(docid_col)
    src = key_frame if key_frame is not None else base
    firsts = (
        src.groupBy(group_col.alias("_gkey"))
        .agg(F.min(ord_col).alias("_first"))
        .select("_first")
        .distinct()
        .orderBy("_first")
        .limit(cutoff)
        .collect()
    )
    if len(firsts) < cutoff:
        return base
    cut = firsts[cutoff - 1]["_first"]
    return base.where(ord_col <= F.lit(cut))


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
    attrs not listed keep their old values.

    The reference restricts updates to bool/int/timestamp/MVA attrs
    ("attribute '%s' can not be updated (must be boolean, integer,
    timestamp, or MVA)", src/sphinx.cpp:7152-7160) and MVA updates
    additionally need the searchd mva_updates_pool arena; the
    coalesce here has no storage-pool constraint, so array (MVA)
    columns update through the same path (pinned live against the
    daemon's MVA update in test_ref_searchd_api_differential) and
    float/bigint updates — which the reference REJECTS — succeed as
    a documented extension."""
    upd = updates.select(
        F.col(docid_col),
        *[F.col(a).alias(f"_new_{a}") for a in attrs],
    )
    out = docinfo.join(F.broadcast(upd), docid_col, "left")
    for a in attrs:
        out = out.withColumn(a, F.coalesce(F.col(f"_new_{a}"), F.col(a)))
    return out.drop(*[f"_new_{a}" for a in attrs])
