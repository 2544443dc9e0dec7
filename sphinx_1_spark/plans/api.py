"""SphinxAPI serving layer: the Query() call surface of searchd.

Implements the client-visible semantics of HandleCommandSearch
(src/searchd.cpp:4100-4500) over one or more SphinxIndex objects:

* SetSortMode: relevance / extended clause / expr / attr asc-desc /
  time segments (sphCreateQueue, src/sphinxsort.cpp:1961-2121);
  SPH_SORT_EXPR computes the float32 @expr virtual attr and orders
  (@expr desc, id asc) (MatchExpr_fn, :1265);
* SetGroupBy (+SetGroupDistinct): exact grouping with the reference's
  integer group keys, @count/@distinct virtual attrs, groupsort
  ordering; total_found counts groups (CSphKBufferGroupSorter::PushEx
  m_iTotal, src/sphinxsort.cpp:226);
* multi-index unions: later indexes' kill-lists become exclusion
  filters on earlier indexes (searchd.cpp:4185-4196), per-index
  total_found sums then dupes subtract (:3818), dupes resolve to the
  HIGHEST tag — last-listed index wins (the dupes sweep sorts docid
  asc, tag desc: searchd.cpp:2515,3803) — or to weighted-rank sums
  under SetIndexWeights (:3775-3800); per-word stats SUM across local
  indexes (one shared CSphQueryResult accumulates through the local
  loop, sphinx.cpp:14673-14685; searchd.cpp:4221 copies the
  accumulated struct);
* SetLimits cutoff: matching stops after N matches in processing
  (docid) order;
* SetIDRange, offset/limit paging, max_matches bounding;
* SetOverride: per-query attribute value substitution before filters
  (EarlyCalc override, src/sphinx.cpp:11083-11088), as a copy-on-write
  docinfo patch — the original index is untouched.

The heavy lifting (match tree -> ranked relation) stays in
SphinxIndex._ranked; this layer only adds the sorting/grouping/merge
plan on top, all in native Spark expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sphinx_1_spark.functions.exprparse import parse_expression
from sphinx_1_spark.plans.attrs import (
    api_group_query,
    custom_sort_column,
    parse_sort_clause,
    sort_clause_columns,
    time_segment,
)


@dataclass
class ApiQuery:
    """One SphinxClient::Query() worth of state."""

    query: str
    mode: str = "all"
    ranker: str | None = None
    sortmode: str = "relevance"  # relevance|extended|expr|attr_asc|attr_desc|time_segments
    sortby: str = ""
    groupattr: str | None = None
    groupfunc: str = "attr"
    groupsort: str = "@group desc"
    groupdistinct: str | None = None
    filters: list[Column] | None = None
    id_range: tuple[int, int] | None = None
    cutoff: int = 0
    offset: int = 0
    limit: int = 20
    max_matches: int = 1000
    index_weights: dict[str, int] | None = None
    # SetWeights/SetFieldWeights: per-field ranking weights in schema
    # order (BindWeights floors each at 1, src/sphinx.cpp:14574-14595)
    field_weights: list[int] | None = None
    select: list[tuple[str, str]] = dc_field(default_factory=list)
    # extra virtual attrs: [(alias, expression)] (SetSelect subset)
    now_epoch: int = 0
    score_mode: str = "exact32"
    # SetGeoAnchor(attrlat, attrlong, lat, long): adds the '@geodist'
    # virtual attr = haversine distance from the anchor point
    # (SetGeoAnchor -> CalcGeodist, src/sphinx.cpp:14931-14950)
    geoanchor: tuple[str, str, float, float] | None = None
    # filters over virtual attrs (@geodist/@expr) evaluated AFTER the
    # virtual columns exist — the reference's late filter list
    late_filters: list[Column] = dc_field(default_factory=list)
    # SetOverride(attr, type, {docid: value}): per-QUERY attribute
    # value overrides, applied to each match BEFORE filters/sorting
    # (EarlyCalc binary-search substitution, src/sphinx.cpp:11083-11088;
    # setup/validation :16389-16410).  {attr: {docid: value}}.
    overrides: dict[str, dict[int, float]] | None = None
    # SetMaxQueryTime (api/sphinxapi.py:285): permanent N/A — see
    # _base_ranked's rejection for the contract and reasoning.
    max_query_time: int = 0


class ApiQueryError(ValueError):
    pass


# EscapeString's char set (api/sphinxapi.py:967-968, php:1467-1473 —
# identical sets; the python regex lists '=' twice, a no-op).  These
# are the query-syntax specials a client must backslash before
# embedding user input in a MATCH string; the scanner's escaped mode
# (Special2Simple, src/sphinx.cpp:3565-3576) then demotes them back
# to plain chars.
_ESCAPE_CHARS = '\\()|-!@~"&/^$='


def escape_string(s: str) -> str:
    """SphinxClient::EscapeString: backslash every query-syntax
    special so arbitrary user input is safe inside a MATCH query.
    Backslash itself escapes first (it is first in _ESCAPE_CHARS), so
    the output never re-escapes its own escapes."""
    for ch in _ESCAPE_CHARS:
        s = s.replace(ch, "\\" + ch)
    return s


def _attr_types(idx) -> dict[str, str]:
    """Lowercased attr name -> 'int'|'bigint'|'float'|'mva' from the
    docinfo schema."""
    out = {}
    for f in idx.docinfo.schema.fields:
        t = f.dataType.simpleString()
        if t in ("float", "double"):
            out[f.name.lower()] = "float"
        elif t == "bigint":
            out[f.name.lower()] = "bigint"
        elif t.startswith("array"):
            out[f.name.lower()] = "mva"
        else:
            out[f.name.lower()] = "int"
    return out


def _docid_ord() -> Column:
    """Unsigned docid order key — the shared definition lives in
    attrs.docid_ord (one tie-break for every serving path)."""
    from sphinx_1_spark.plans.attrs import docid_ord

    return docid_ord()


def _sort_columns(q: ApiQuery, attr_types: dict[str, str]) -> list[Column]:
    """Final ordering per sortmode (sphCreateQueue dispatch)."""
    if q.sortmode == "relevance":
        return [F.col("weight").desc(), _docid_ord().asc()]
    if q.sortmode == "extended":
        keys = parse_sort_clause(q.sortby, set(attr_types))
        if keys == "random":
            # deterministic stand-in documented in SURVEY (md5 order)
            return [F.md5(F.col("docid").cast("string")).asc()]
        if keys == "custom":
            return [
                custom_sort_column(q.now_epoch).desc(),
                _docid_ord().asc(),
            ]
        return sort_clause_columns(keys, attr_types)
    if q.sortmode == "expr":
        return [F.col("@expr").desc(), _docid_ord().asc()]
    if q.sortmode == "attr_asc":
        # MatchAttrGt_fn (src/sphinxsort.cpp:1202-1221): attr, then
        # WEIGHT DESC, then id asc — the weight tie-break was missing
        # until the live daemon differential caught it
        return [
            F.col(q.sortby).asc(), F.col("weight").desc(),
            _docid_ord().asc(),
        ]
    if q.sortmode == "attr_desc":
        # MatchAttrLt_fn (src/sphinxsort.cpp:1178-1197)
        return [
            F.col(q.sortby).desc(), F.col("weight").desc(),
            _docid_ord().asc(),
        ]
    if q.sortmode == "time_segments":
        return [
            F.col("@timeseg").asc(),
            F.col("weight").desc(),
            F.col(q.sortby).desc(),
            _docid_ord().asc(),
        ]
    raise ApiQueryError(f"unknown sorting mode {q.sortmode!r}")


def _with_overrides(idx, overrides: dict[str, dict[int, float]]):
    """Per-query attribute overrides (SetOverride): a shallow index
    copy whose docinfo carries the substituted values — the Spark
    analog of CopyDocinfo's per-match binary-search substitution
    (src/sphinx.cpp:11083-11088).  Copy-on-write: the original index
    is untouched, so the overrides last exactly one Query() like the
    reference's.

    Filter interaction, verified against the LIVE daemon
    (tests/test_ref_searchd_api_differential.py): at ROW level the
    reference substitutes before the filter evaluates (EarlyReject
    calls CopyDocinfo first) — we match that exactly.  But the
    reference's BLOCK-level pruning (the in-RAM 128-row min/max
    index + whole-index reject, src/sphinx.cpp:16362-16371) is built
    at preread from ORIGINAL values, so a filter whose range lies
    outside them matches NOTHING even when an override satisfies it
    (gid IN (99) with override gid->99 answers empty, live).  Our
    zone maps are parquet row-group stats over this PATCHED docinfo,
    so the overridden match IS found — a documented deviation (the
    override is real for filtering), pinned with the daemon's
    behavior in test_override_zone_map_pruning_divergence."""
    import copy

    from sphinx_1_spark.plans.attrs import update_attributes

    docinfo = idx.docinfo
    spark = docinfo.sparkSession
    types = _attr_types(idx)
    # resolve each override name to the docinfo column's EXACT case
    # (validation is case-insensitive like the reference's
    # GetAttrIndex, but the patch must reuse the existing column name
    # or withColumn would silently rename it)
    by_lower = {f.name.lower(): f.name for f in docinfo.schema.fields}
    _PY_T = {"int": int, "bigint": int, "float": float}

    # _attr_types buckets every non-float/bigint/array column into
    # 'int' (fine for sorting), but an override must only target a
    # genuinely numeric column — int()-coercing a string/boolean/
    # timestamp docinfo column would escape as a raw ValueError or an
    # AnalysisException from update_attributes' coalesce instead of
    # the reference-style clean validation error
    _NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    actual_t = {
        f.name.lower(): f.dataType.simpleString()
        for f in docinfo.schema.fields
    }

    resolved: dict[str, dict[int, float]] = {}
    for attr, mapping in overrides.items():
        t = types.get(attr.lower())
        if t is None:
            # "attribute override: unknown attribute name '%s'"
            # (src/sphinx.cpp:16395)
            raise ApiQueryError(
                f"attribute override: unknown attribute name '{attr}'"
            )
        if t == "mva":
            # DELIBERATE deviation: the reference's SetOverride
            # validation (src/sphinx.cpp:16389-16410) checks only
            # name+type, so a type-matched MVA override would clobber
            # the .spm pool OFFSET with a raw value — corrupting every
            # later MVA read of that row.  Rejecting is strictly safer
            # than reproducing that footgun.
            raise ApiQueryError(
                f"attribute override: MVA attribute '{attr}' not "
                "supported (a value override would clobber the MVA "
                "pool offset, src/sphinx.cpp:16389-16410)"
            )
        if actual_t.get(attr.lower()) not in _NUMERIC:
            raise ApiQueryError(
                f"attribute override: unsupported attribute type "
                f"'{actual_t.get(attr.lower())}' for '{attr}' "
                "(src/sphinx.cpp:16389-16410 allows numeric attrs only)"
            )
        col = by_lower[attr.lower()]
        py_t = _PY_T[t]
        # docid keys and override values fail separately so the error
        # names the actual culprit
        try:
            keyed = {int(d): v for d, v in mapping.items()}
        except (TypeError, ValueError) as exc:
            raise ApiQueryError(
                f"attribute override: invalid docid for '{attr}': {exc}"
            ) from None
        try:
            resolved[col] = {
                # uint64 docids above 2^63-1 wrap into negative longs,
                # the same sign-bit bijection docinfo keys use (id64)
                (d - (1 << 64)) if d >= (1 << 63) else d: py_t(v)
                for d, v in keyed.items()
            }
        except (TypeError, ValueError) as exc:
            raise ApiQueryError(
                f"attribute override: cannot coerce value for "
                f"'{attr}' to {t}: {exc}"
            ) from None

    # ONE combined update: a single per-docid row with nullable
    # per-attr columns (update_attributes' coalesce keeps the original
    # where a docid has no value for that attr) -> one broadcast join
    # regardless of how many attrs are overridden
    all_ids = sorted({d for m in resolved.values() for d in m})
    spark_t = {"int": "int", "bigint": "long", "float": "float"}
    ddl = "docid long, " + ", ".join(
        f"`{col}` {spark_t[types[col.lower()]]}" for col in resolved
    )
    rows = [
        tuple([d] + [resolved[col].get(d) for col in resolved])
        for d in all_ids
    ]
    upd = spark.createDataFrame(rows, ddl)
    patched = copy.copy(idx)
    patched.docinfo = update_attributes(docinfo, upd, list(resolved))
    return patched


def _base_ranked(idx, q: ApiQuery, extra_filters=None, kill_df=None):
    """The SHAREABLE part of query evaluation: filters -> match tree ->
    ranked relation -> kill-list exclusion.  Everything up to (but not
    including) per-query virtual attrs, late filters, and cutoff —
    i.e. exactly what the reference's multi-queue path computes once
    and feeds to every batched query's sorter (MultiQuery with N
    sorters, src/searchd.cpp:4150-4199).

    kill_df: optional single-column DataFrame of docids to exclude
    (later indexes' kill-lists, searchd.cpp:4185-4196).  Applied as a
    left_anti join with NO forced broadcast hint: AQE broadcasts a
    small kill-list (the common case) and falls back to a shuffled
    anti-join when the list is too large to build driver-side — a
    mandatory F.broadcast would crash exactly at the 100M-entry scale
    this path exists for."""
    if q.max_query_time:
        # Permanent N/A, declared like libstemmer (morphology.py): the
        # reference's max_query_time is a soft budget checked inside
        # the term-chunk loop (m_iMaxTimer, src/sphinx.cpp:11841-11847
        # via :16326) that silently truncates to whatever PARTIAL match
        # set the elapsed wall clock allowed — a timing-dependent,
        # nondeterministic result no declarative batch plan can
        # reproduce (Catalyst owns the iteration; there is no
        # mid-match abort point).  Rejecting beats silently ignoring a
        # resource-control knob: a caller who relied on it must decide
        # between a full run and a driver-side job timeout
        # (spark.sparkContext.cancelJobGroup), which errors instead of
        # returning partial rows and so is NOT the same contract.
        raise ApiQueryError(
            "max_query_time is a documented permanent N/A: the "
            "reference truncates to a timing-dependent partial match "
            "set (src/sphinx.cpp:11841-11847), which a declarative "
            "batch plan cannot reproduce; bound job wall-clock with "
            "spark.sparkContext.cancelJobGroup instead"
        )
    if q.overrides:
        idx = _with_overrides(idx, q.overrides)
    filters = list(q.filters or [])
    if q.id_range:
        # unsigned range compare via the same sign-bit bijection
        lo, hi = ((v - (1 << 64)) if v >= (1 << 63) else v for v in q.id_range)
        filters.append(
            F.col("docid").bitwiseXOR(F.lit(-(1 << 63))).between(
                F.lit(lo ^ -(1 << 63)), F.lit(hi ^ -(1 << 63))
            )
        )
    for flt in extra_filters or []:
        filters.append(flt)
    if not q.query.strip():
        # empty query = fullscan over docinfo, weight 1 per match
        # (MatchFullScan, src/sphinx.cpp:14722)
        ranked = idx.docinfo.withColumn("weight", F.lit(1).cast("int"))
        for flt in filters:
            ranked = ranked.where(flt)
        meta = {"stats": {}}
    else:
        ranked, meta = idx._ranked(
            q.query,
            mode=q.mode,
            ranker=q.ranker,
            filters=filters,
            field_weights=q.field_weights,
            score_mode=q.score_mode,
            with_attrs=True,
        )
    if kill_df is not None:
        ranked = ranked.join(kill_df, "docid", "left_anti")
    return ranked, meta


def _ranked_with_attrs(
    idx, q: ApiQuery, extra_filters=None, kill_df=None, base=None
):
    """Ranked match relation joined with docinfo + virtual attrs.

    base: optional precomputed (ranked, meta) from _base_ranked —
    the multi-queue path passes the SAME cached base to every batched
    query so the scan/rank work happens once."""
    if base is None:
        ranked, meta = _base_ranked(idx, q, extra_filters, kill_df)
    else:
        ranked, meta = base
    attr_types = _attr_types(idx)
    if q.geoanchor:
        from sphinx_1_spark.functions.exprs import geodist

        import numpy as _np

        alat, alng, lat, lng = q.geoanchor
        # anchor coords and attr values are float32 (m_fGeoAnchorLat /
        # GetAttrFloat), widened to double inside the haversine
        # (ExprGeodist_t::Eval, src/sphinxsort.cpp:1745-1762)
        ranked = ranked.withColumn(
            "@geodist",
            geodist(
                F.col(alat).cast("float").cast("double"),
                F.col(alng).cast("float").cast("double"),
                F.lit(float(_np.float32(lat))),
                F.lit(float(_np.float32(lng))),
            ).cast("float"),
        )
        attr_types["@geodist"] = "float"
    for alias, expr in q.select:
        col, t = parse_expression(
            expr, attr_types, now_epoch=q.now_epoch,
            id64=idx.settings.wordid != "crc32",
        )
        ranked = ranked.withColumn(alias, col)
        attr_types[alias.lower()] = t
    # late filters run once every virtual attr (geodist + SetSelect
    # aliases) exists — the reference's post-calc filter list
    for flt in q.late_filters:
        ranked = ranked.where(flt)
    if q.sortmode == "expr":
        col, _t = parse_expression(
            q.sortby, attr_types, now_epoch=q.now_epoch,
            id64=idx.settings.wordid != "crc32",
        )
        ranked = ranked.withColumn("@expr", col.cast("float"))
        attr_types["@expr"] = "float"
    if q.sortmode == "time_segments":
        ranked = ranked.withColumn(
            "@timeseg", time_segment(F.col(q.sortby), q.now_epoch)
        )
    if q.cutoff:
        # SetLimits cutoff: the match loop stops after N accepted
        # PUSHES; single-index processing order is docid asc.  Under
        # SetGroupBy only a NEW group counts as a push (the group
        # sorter's bNewMatch, SPH_SUBMIT_MATCH src/sphinx.cpp:
        # 11119-11138), so the cut lands after the cutoff-th distinct
        # group key — group_cutoff replicates the live daemon.  For an
        # MVA group attr the counter still decrements ONCE per match
        # (bNewMatch is a single bool even when several values spawn
        # groups), which the distinct-first-docids form models via
        # the exploded key_frame.
        from sphinx_1_spark.plans.attrs import api_group_key, group_cutoff

        if q.groupattr and attr_types.get(q.groupattr.lower()) == "mva":
            kf = ranked.select(
                "docid", F.explode(F.col(q.groupattr)).alias("_gv")
            )
            ranked = group_cutoff(
                ranked,
                api_group_key(F.col("_gv"), q.groupfunc),
                q.cutoff,
                key_frame=kf,
            )
        elif q.groupattr:
            ranked = group_cutoff(
                ranked,
                api_group_key(F.col(q.groupattr), q.groupfunc),
                q.cutoff,
            )
        else:
            ranked = (
                ranked.orderBy(_docid_ord().asc()).limit(q.cutoff)
            )
    return ranked, meta, attr_types


def _collect_sorted(
    matches: DataFrame,
    q: ApiQuery,
    attr_types: dict[str, str],
    n_total: int,
):
    if q.groupattr:
        mva = attr_types.get(q.groupattr.lower()) == "mva"
        grouped = api_group_query(
            matches,
            q.groupattr,
            q.groupfunc,
            q.groupsort,
            attr_types,
            distinct_attr=q.groupdistinct,
            mva=mva,
            limit=q.max_matches,
            max_matches=q.max_matches,
        )
        # page via limit(offset+limit) — never collect the whole group
        # set (group cardinality is unbounded at scale; the reference
        # bounds its k-buffer at 4*max_matches, src/sphinxsort.cpp:745)
        page = min(q.offset + q.limit, q.max_matches)
        rows = grouped.limit(page).collect()[q.offset :]
        total_found = n_total  # caller passes the group count
        return rows, min(total_found, q.max_matches), total_found
    out = matches.orderBy(*_sort_columns(q, attr_types))
    # the reference's bounded queue holds max_matches rows: a page
    # reaching past it truncates to ranks [offset, max_matches), it
    # never returns rank > max_matches (offset < max_matches is
    # CheckQuery-validated upstream)
    page_end = min(q.offset + q.limit, q.max_matches)
    if q.offset:
        out = out.offset(q.offset)
    rows = out.limit(page_end - q.offset).collect()
    return rows, min(n_total, q.max_matches), n_total


def _normalize_kills(indexes):
    """Normalize each kill-list ONCE (the harness passes literal Python
    lists; the engine passes DataFrames).  Literal lists stay isin()
    filters; DataFrame kill-lists stay DISTRIBUTED and apply as a
    left_anti join with no forced hint — AQE broadcasts a small list
    and falls back to a shuffled anti-join past driver-buildable size.
    Never .collect()ed, so a large delta kill-list neither lands on
    the driver nor inflates the plan."""
    kill_lits: list[list | None] = []
    kill_dfs: list[DataFrame | None] = []
    for _n, _i, kill in indexes:
        if kill is None:
            kill_lits.append(None)
            kill_dfs.append(None)
        elif isinstance(kill, (list, tuple)):
            kill_lits.append(list(kill))
            kill_dfs.append(None)
        else:
            kill_lits.append(None)
            kill_dfs.append(
                kill.select(
                    F.col(kill.columns[0]).alias("docid")
                ).distinct()
            )
    return kill_lits, kill_dfs


def _kill_for(i, indexes, kill_lits, kill_dfs):
    """Exclusion filters + kill DataFrame for index i: later indexes'
    kill-lists filter this index's matches (searchd.cpp:4185-4196) —
    they affect total_found too."""
    extra = []
    kill_df = None
    for j in range(i + 1, len(indexes)):
        if kill_lits[j]:
            extra.append(~F.col("docid").isin(kill_lits[j]))
        if kill_dfs[j] is not None:
            kill_df = (
                kill_dfs[j]
                if kill_df is None
                else kill_df.unionByName(kill_dfs[j]).distinct()
            )
    return extra, kill_df


def api_query(
    indexes: list[tuple[str, object, DataFrame | None]],
    q: ApiQuery,
    shared_bases: list | None = None,
) -> tuple[list, dict]:
    """Run one API query over [(name, index, killlist_or_None)] in
    config order.  Returns (rows, meta): meta has total, total_found,
    words — per-word (docs, hits) SUMMED across local indexes: the
    reference passes ONE shared CSphQueryResult through the local
    loop and SetupQueryWords accumulates into it (m_iDocs += when the
    word slot is already filled, sphinx.cpp:14673-14685); the
    searchd.cpp:4221 assignment then copies that accumulated struct
    per batched query — it does not reset between indexes.

    shared_bases: per-index (ranked, meta) pairs precomputed by
    run_queries' multi-queue path — the batch's one shared match
    relation per index."""
    if not indexes:
        raise ApiQueryError("no indexes")
    # CheckQuery bounds (src/searchd.cpp:2988-3007): the reference's
    # match queue holds max_matches rows, so an offset past it is a
    # client error — and offset+limit past it TRUNCATES to the queue
    # (enforced in _collect_sorted), it does not read beyond it
    if q.max_matches < 1:
        raise ApiQueryError(
            f"per-query max_matches={q.max_matches} out of bounds"
        )
    if q.offset < 0 or q.offset >= q.max_matches:
        raise ApiQueryError(
            f"offset out of bounds (offset={q.offset}, "
            f"max_matches={q.max_matches})"
        )
    if q.limit < 0:
        raise ApiQueryError(f"limit out of bounds (limit={q.limit})")

    kill_lits, kill_dfs = _normalize_kills(indexes)

    per_index = []
    words_acc: dict[str, list[int]] = {}
    for i, (name, idx, _kill) in enumerate(indexes):
        extra, kill_df = _kill_for(i, indexes, kill_lits, kill_dfs)
        ranked, meta, attr_types = _ranked_with_attrs(
            idx, q, extra, kill_df=kill_df,
            base=shared_bases[i] if shared_bases else None,
        )
        per_index.append((name, ranked, attr_types))
        # per-word stats accumulate across local indexes: QueryEx gets
        # the shared AggrResult (searchd.cpp:4288) and the index adds
        # its counts in place (sphinx.cpp:14677 m_iDocs +=)
        for w, (d, h) in meta["stats"].items():
            acc = words_acc.setdefault(w, [0, 0])
            acc[0] += d
            acc[1] += h

    meta_words = {
        w: {"docs": d, "hits": h} for w, (d, h) in words_acc.items()
    }

    if len(per_index) == 1:
        _name, ranked, attr_types = per_index[0]
        ranked = ranked.cache()
        try:
            if q.groupattr:
                mva = attr_types.get(q.groupattr.lower()) == "mva"
                from sphinx_1_spark.plans.attrs import api_group_key

                vals = (
                    ranked.select(
                        F.explode(F.col(q.groupattr)).alias("_gval")
                    )
                    if mva
                    else ranked.select(F.col(q.groupattr).alias("_gval"))
                )
                n_total = (
                    vals.select(
                        api_group_key(F.col("_gval"), q.groupfunc).alias("k")
                    )
                    .distinct()
                    .count()
                )
            else:
                n_total = ranked.count()
            rows, total, total_found = _collect_sorted(
                ranked, q, attr_types, n_total
            )
        finally:
            ranked.unpersist()
        return rows, {
            "total": total,
            "total_found": total_found,
            "words": meta_words,
        }

    # ---------------- multi-index merge ----------------
    attr_types = per_index[0][2]
    common = None
    for _n, r, _t in per_index:
        # MinimizeSchema intersects on the full column definition —
        # name AND type (CSphColumnInfo operator==, sphinx.h:849); a
        # same-named attr with a different type drops out
        cols = {(f.name, f.dataType.simpleString()) for f in r.schema.fields}
        common = cols if common is None else (common & cols)
    base_cols = [
        f.name
        for f in per_index[0][1].schema.fields
        if (f.name, f.dataType.simpleString()) in common
    ]

    tagged = None
    cached_parts = []
    for tag, (name, r, _t) in enumerate(per_index):
        cur = r.select(*base_cols).withColumn("_tag", F.lit(tag)).cache()
        cached_parts.append(cur)
        tagged = cur if tagged is None else tagged.unionByName(cur)
    try:
        return _multi_index_collect(tagged, per_index, q, attr_types,
                                    meta_words)
    finally:
        for cur in cached_parts:
            cur.unpersist()


def _multi_index_collect(tagged, per_index, q, attr_types, meta_words):
    if q.groupattr:
        from sphinx_1_spark.plans.attrs import api_group_key

        # group sorter handles dupes "automagically" (searchd.cpp:
        # 3760-3767): per-key merge sums @count/@distinct across
        # indexes (0.9.9 sums distinct counts, it does not re-unique)
        mva = attr_types.get(q.groupattr.lower()) == "mva"
        # with a groupdistinct the max_matches cut must wait until the
        # summed @distinct is recomputed and the groups re-sorted:
        # cutting first (under the uniqued @distinct ordering) could
        # keep the wrong top-N when groupsort orders by @distinct
        grouped = api_group_query(
            tagged,
            q.groupattr,
            q.groupfunc,
            q.groupsort,
            attr_types,
            distinct_attr=q.groupdistinct,
            mva=mva,
            limit=0 if q.groupdistinct else q.max_matches,
            max_matches=q.max_matches,
        )
        # NOTE: api_group_query over the union already merges groups
        # exactly; but 0.9.9 SUMS per-index @distinct instead of
        # uniquing across indexes — recompute @distinct that way
        if q.groupdistinct:
            from sphinx_1_spark.plans.attrs import api_group_key

            if mva:
                keyed_src = tagged.withColumn(
                    "_gval", F.explode(F.col(q.groupattr))
                )
            else:
                keyed_src = tagged.withColumn(
                    "_gval", F.col(q.groupattr)
                )
            per_tag = (
                keyed_src.withColumn(
                    "@groupby",
                    api_group_key(F.col("_gval"), q.groupfunc),
                )
                .groupBy("@groupby", "_tag")
                .agg(
                    F.countDistinct(F.col(q.groupdistinct)).alias("_d")
                )
                .groupBy("@groupby")
                .agg(F.sum("_d").cast("long").alias("_dist_sum"))
            )
            grouped = (
                grouped.drop("@distinct")
                .join(per_tag, "@groupby")
                .withColumnRenamed("_dist_sum", "@distinct")
            )
            keys = parse_sort_clause(
                q.groupsort, set(attr_types) | set(tagged.columns)
            )
            grouped = grouped.orderBy(
                *sort_clause_columns(keys, attr_types)
            ).limit(q.max_matches)  # the deferred max_matches cut
        # total_found counts ALL groups over the merged relation (the
        # single-index path's semantics) — counting the limited
        # `grouped` would cap it at max_matches, so merging indexes
        # would silently change the reported group count
        if mva:
            vals = tagged.select(
                F.explode(F.col(q.groupattr)).alias("_gval")
            )
        else:
            vals = tagged.select(F.col(q.groupattr).alias("_gval"))
        n_groups = (
            vals.select(
                api_group_key(F.col("_gval"), q.groupfunc).alias("k")
            )
            .distinct()
            .count()
        )
        # page via limit — no whole-result-set collect on the driver
        page = min(q.offset + q.limit, q.max_matches)
        rows = grouped.limit(page).collect()[q.offset :]
        return rows, {
            "total": min(n_groups, q.max_matches),
            "total_found": n_groups,
            "words": meta_words,
        }

    # plain sorter: dedupe by (docid, first tag) or weighted-rank sum
    from pyspark.sql import Window

    if q.index_weights:
        wmap = {
            name: q.index_weights.get(name, 1)
            for name, _r, _t in per_index
        }
        warr = F.array(
            *[F.lit(wmap[name]) for name, _r, _t in per_index]
        )
        weighted = tagged.withColumn(
            "weight", F.col("weight") * F.element_at(warr, F.col("_tag") + 1)
        )
        # weighted-rank sum across dupes (searchd.cpp:3775-3800); the
        # surviving row (attrs, tag) is the dupes-sweep winner
        wdoc = Window.partitionBy("docid")
        merged = (
            weighted.withColumn(
                "_sumw", F.sum("weight").over(wdoc).cast("int")
            )
            .withColumn(
                "_rn",
                F.row_number().over(wdoc.orderBy(F.col("_tag").desc())),
            )
            .where(F.col("_rn") == 1)
            .withColumn("weight", F.col("_sumw"))
            .drop("_rn", "_sumw")
        )
    else:
        # dupes sweep comparator (docid asc, tag desc): the LAST
        # listed index's copy survives (searchd.cpp:2515,3803)
        w = Window.partitionBy("docid").orderBy(F.col("_tag").desc())
        merged = (
            tagged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    # total_found = sum(per-index counts) - dupes, which is exactly
    # the merged cardinality — ONE count job instead of one per index
    # plus the merged one; paging shares _collect_sorted's non-group
    # path (one definition of the max_matches window)
    total_found = merged.count()
    rows, total, total_found = _collect_sorted(
        merged, q, attr_types, total_found
    )
    return rows, {
        "total": total,
        "total_found": total_found,
        "words": meta_words,
    }


# markers of a Column whose string form is NOT a clean semantic
# rendering: Python UDFs print as '<lambda>(columnnodeexpression(...
# Origin(...@objhash...)))' — the form can both collide across
# genuinely different filters (older Sparks render bare '<lambda>(col)')
# and differ across identical ones (the Origin object hash is
# per-construction), so it is unusable as an equality key either way.
# '<lambda>' (not the bare word) so a filter over a column literally
# named 'lambda_rate' isn't falsely disqualified.
_OPAQUE_MARKERS = ("<lambda>", "columnnodeexpression", "java.lang")


def _filter_forms(cols) -> list[str] | None:
    """Comparable string forms for a filter list, or None when any
    filter's form is opaque — an opaque filter DISQUALIFIES the batch
    from sharing one match relation (sharing on a collided string
    would silently return the first query's rows for the second)."""
    out = []
    for c in cols or []:
        s = str(c)
        low = s.lower()
        if not s.isprintable() or any(m in low for m in _OPAQUE_MARKERS):
            return None
        out.append(s)
    return out


def _multiqueue_eligible(queries: list[ApiQuery]) -> bool:
    """The reference's single-query multi-queue check (RunSubset,
    src/searchd.cpp:3972-4019): batched queries share one match loop
    iff everything that AFFECTS MATCHING is identical — query string,
    mode/ranker, id range, filters, select items, cutoff, geo anchor
    (and expr-sort strings when both queries sort by expr).  Sort and
    group settings may differ freely: each query keeps its own sorter.

    Filters compare by their Column string form, which is only sound
    when that form is a clean semantic rendering — any opaque filter
    (Python UDF / lambda) disqualifies the batch (see _filter_forms).
    """
    if len(queries) < 2:
        return False
    q0 = queries[0]

    def _key(q: ApiQuery):
        flt = _filter_forms(q.filters)
        late = _filter_forms(q.late_filters)
        if flt is None or late is None:
            return None
        return (
            q.query,
            q.mode,
            q.ranker,
            q.id_range,
            flt,
            late,
            list(q.select),
            q.cutoff,
            q.geoanchor,
            q.index_weights,
            q.field_weights,  # the reference compares m_pWeights too
            q.score_mode,
            q.overrides,  # substituted values feed filters/attrs
            # max_query_time is a declared permanent N/A that RAISES in
            # _base_ranked; keying on it keeps a nonzero value from
            # riding a shared base past its own rejection (and a zero
            # from being poisoned by a batchmate's nonzero)
            q.max_query_time,
        )

    k0 = _key(q0)
    if k0 is None:
        return False
    for q in queries[1:]:
        k = _key(q)
        if k is None or k != k0:
            return False
        # sort expressions must match only when BOTH are expr-sorted
        # (searchd.cpp:3990)
        if (
            q.sortmode == "expr"
            and q0.sortmode == "expr"
            and q.sortby != q0.sortby
        ):
            return False
    return True


def run_queries(
    indexes: list[tuple[str, object, DataFrame | None]],
    queries: list[ApiQuery],
) -> list[tuple[list, dict]]:
    """AddQuery/RunQueries batch (SearchHandler_c::RunQueries +
    RunSubset, src/searchd.cpp:3869-3918, 3960-4199): run several API
    queries against the same index chain.

    When the multi-queue check passes (identical matching parameters,
    searchd.cpp:3972-4019) the match relation is computed ONCE per
    index, cached, and every query's own sort/group plan runs over the
    shared relation — the reference feeds one MultiQuery match loop
    into N per-query sorters; the Spark analog is one cached ranked
    DataFrame and N cheap sort/limit jobs on top.  At scale this is
    the difference between Q full index scans and one.

    Unlike the reference's multi-queue (whose shared loop computes
    virtual attrs from SORTER 0's schema only, sphinx.cpp:16287
    SetupCalc — the source of historical cross-query ordering
    artifacts), each query here applies its own virtual attrs on top
    of the shared base, so batched results are always value-identical
    to one-by-one execution.

    Returns [(rows, meta)] in query order.
    """
    if not _multiqueue_eligible(queries):
        return [api_query(indexes, q) for q in queries]

    kill_lits, kill_dfs = _normalize_kills(indexes)
    bases = []
    for i, (_name, idx, _kill) in enumerate(indexes):
        extra, kill_df = _kill_for(i, indexes, kill_lits, kill_dfs)
        ranked, meta = _base_ranked(idx, queries[0], extra, kill_df)
        bases.append((ranked.cache(), meta))
    try:
        return [api_query(indexes, q, shared_bases=bases) for q in queries]
    finally:
        for ranked, _meta in bases:
            ranked.unpersist()
