"""SphinxQL SELECT translator.

Implements the SELECT statement subset of the reference's SphinxQL
grammar (src/sphinxql.y:87-120; searchd only accepts SELECT/SHOW,
src/searchd.cpp:4621-4625):

    SELECT select_list FROM index
    [WHERE {MATCH('query') | attr_cond} [AND ...]]
    [GROUP BY attr]
    [WITHIN GROUP ORDER BY attr {ASC|DESC}]
    [ORDER BY attr {ASC|DESC} [, ...]]
    [LIMIT [offset,] count]

select_list: columns, `*`, COUNT(*), COUNT(DISTINCT attr),
AVG/MIN/MAX/SUM(expr), @weight/@id/@count pseudo-columns, `expr AS
alias`.  attr_cond: =, !=/<>, <, >, <=, >=, IN (...), BETWEEN a AND b.

The translator compiles onto the engine: MATCH goes through the
MATCH-syntax parser/compiler (plans/parser.py), attribute conditions
become DataFrame filters, grouping/sorting map to plans/attrs.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


class SphinxQLError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^'\\]|\\.)*')
      | (?P<num>-?\d+(?:\.\d+)?)
      | (?P<op><=|>=|!=|<>|[=<>(),*])
      | (?P<word>[@a-zA-Z_][a-zA-Z0-9_.]*)
    )""",
    re.VERBOSE,
)


def _tokenize(sql: str) -> list[str]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            if sql[pos:].strip() == "":
                break
            raise SphinxQLError(f"bad token at: {sql[pos:pos+20]!r}")
        out.append(m.group(m.lastgroup))
        pos = m.end()
    return out


@dataclass
class SelectStmt:
    select: list[tuple[str, str | None]]  # (expr, alias)
    index: str = ""
    match: str | None = None
    conds: list[tuple[str, str, object]] = field(default_factory=list)
    group_by: str | None = None
    within_order: list[tuple[str, bool]] = field(default_factory=list)
    order_by: list[tuple[str, bool]] = field(default_factory=list)
    offset: int = 0
    limit: int = 20
    # OPTION name=value pairs (sphinxql.y:310-327): ranker and
    # max_matches are honored; others are carried for inspection
    options: dict = field(default_factory=dict)


# AddOption's closed sets (src/searchd.cpp:4700-4750).  max_query_time
# parses like the reference's but raises the declared permanent N/A at
# execute when nonzero (same contract as ApiQuery.max_query_time);
# retry_count/retry_delay are agent knobs the reference ignores for
# local indexes — parsed and carried, not acted on.
_RANKERS = frozenset(
    ("proximity_bm25", "bm25", "none", "wordcount", "proximity",
     "matchany", "fieldmask")
)
_OPTIONS = frozenset(
    ("ranker", "max_matches", "cutoff", "max_query_time",
     "retry_count", "retry_delay")
)


class Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise SphinxQLError("unexpected end of statement")
        self.i += 1
        return t

    def expect(self, word: str) -> str:
        t = self.next()
        if t.upper() != word.upper():
            raise SphinxQLError(f"expected {word}, got {t!r}")
        return t

    def accept(self, word: str) -> bool:
        if (self.peek() or "").upper() == word.upper():
            self.i += 1
            return True
        return False

    # ------------------------------------------------------------------
    def parse(self) -> SelectStmt:
        self.expect("SELECT")
        stmt = SelectStmt(select=self._select_list())
        self.expect("FROM")
        stmt.index = self.next()
        if self.accept("WHERE"):
            self._where(stmt)
        if self.accept("GROUP"):
            self.expect("BY")
            stmt.group_by = self.next()
        if self.accept("WITHIN"):
            self.expect("GROUP")
            self.expect("ORDER")
            self.expect("BY")
            stmt.within_order = self._order_list()
        if self.accept("ORDER"):
            self.expect("BY")
            stmt.order_by = self._order_list()
        if self.accept("LIMIT"):
            a = int(self.next())
            if self.accept(","):
                stmt.offset, stmt.limit = a, int(self.next())
            else:
                stmt.limit = a
        if self.accept("OPTION"):
            while True:
                name = self.next().lower()
                self.expect("=")
                val = self.next()
                # SqlParser_t::AddOption (src/searchd.cpp:4700-4750):
                # name and value are lowercased, the option-name set is
                # closed, and ranker values are validated at parse time
                if name == "ranker":
                    v = val.lower()
                    if v not in _RANKERS:
                        raise SphinxQLError(f"unknown ranker '{v}'")
                    stmt.options[name] = v
                elif name in _OPTIONS:
                    # numeric options take TOK_CONST_INT's m_iValue;
                    # an ident value leaves it 0 (C default — the
                    # daemon then rejects max_matches=foo with the
                    # out-of-bounds error, pinned live)
                    try:
                        stmt.options[name] = int(val)
                    except ValueError:
                        stmt.options[name] = 0
                else:
                    raise SphinxQLError(f"unknown option '{name}'")
                if not self.accept(","):
                    break
        if self.peek() is not None:
            raise SphinxQLError(f"trailing tokens: {self.toks[self.i:]}")
        return stmt

    def _select_list(self) -> list[tuple[str, str | None]]:
        items: list[tuple[str, str | None]] = []
        while True:
            expr = self._select_expr()
            alias = None
            if self.accept("AS"):
                alias = self.next()
            items.append((expr, alias))
            if not self.accept(","):
                return items

    def _select_expr(self) -> str:
        t = self.next()
        up = t.upper()
        if up in ("COUNT", "AVG", "MIN", "MAX", "SUM"):
            self.expect("(")
            if up == "COUNT" and self.accept("*"):
                self.expect(")")
                return "COUNT(*)"
            if up == "COUNT" and self.accept("DISTINCT"):
                col = self.next()
                self.expect(")")
                return f"COUNT(DISTINCT {col})"
            col = self.next()
            self.expect(")")
            return f"{up}({col})"
        return t

    def _where(self, stmt: SelectStmt) -> None:
        while True:
            t = self.next()
            if t.upper() == "MATCH":
                if stmt.match is not None:
                    # reference text, sphinxql.y where_item MATCH rule
                    raise SphinxQLError("too many MATCH() clauses")
                self.expect("(")
                q = self.next()
                if not (q.startswith("'") and q.endswith("'")):
                    raise SphinxQLError("MATCH() needs a quoted string")
                stmt.match = q[1:-1].replace("\\'", "'")
                self.expect(")")
            else:
                op = self.next()
                if op.upper() in ("IN", "NOT"):
                    neg = op.upper() == "NOT"
                    if neg:
                        self.expect("IN")
                    self.expect("(")
                    vals = [self._value(self.next())]
                    while self.accept(","):
                        vals.append(self._value(self.next()))
                    self.expect(")")
                    # deliberate deviation: the reference's NOT IN rule
                    # copies the values from the wrong bison slot ($4 is
                    # the '(' token, src/sphinxql.y:189-196), producing
                    # an EMPTY exclude filter that matches NOTHING (live
                    # differential pins the daemon bug); we serve the
                    # correct complement
                    stmt.conds.append((t, "not_in" if neg else "in", vals))
                elif op.upper() == "BETWEEN":
                    lo = self._value(self.next())
                    self.expect("AND")
                    hi = self._value(self.next())
                    stmt.conds.append((t, "between", (lo, hi)))
                elif op in ("=", "!=", "<>", "<", ">", "<=", ">="):
                    stmt.conds.append((t, op, self._value(self.next())))
                else:
                    raise SphinxQLError(f"bad condition operator {op!r}")
            if not self.accept("AND"):
                return

    @staticmethod
    def _value(tok: str):
        if tok.startswith("'"):
            return tok[1:-1].replace("\\'", "'")
        return float(tok) if "." in tok else int(tok)

    def _order_list(self) -> list[tuple[str, bool]]:
        out = []
        while True:
            col = self.next()
            asc = True
            if self.accept("DESC"):
                asc = False
            else:
                self.accept("ASC")
            out.append((col, asc))
            if not self.accept(","):
                return out


def parse_select(sql: str) -> SelectStmt:
    # MySQL-wire clients terminate every statement with ';' — strip
    # one trailing terminator (the SHOW paths already did; a bare
    # SELECT used to die in _tokenize on it)
    sql = sql.strip()
    if sql.endswith(";"):
        sql = sql[:-1]
    return Parser(_tokenize(sql)).parse()


# ----------------------------------------------------------------------
_AGG_RE = re.compile(r"^(COUNT|AVG|MIN|MAX|SUM)\((.*)\)$", re.IGNORECASE)


def _cond_col(name: str, docid_col: str) -> Column:
    if name == "@id":
        return F.col(docid_col)
    if name == "@weight":
        return F.col("weight")
    return F.col(name)


def _order_col(name: str, docid_col: str) -> Column:
    """Like _cond_col but for ORDER/WITHIN GROUP ORDER keys: @id
    orders UNSIGNED (SphDocID_t is a DWORD64)."""
    if name == "@id":
        from sphinx_1_spark.plans.attrs import docid_ord

        return docid_ord(docid_col)
    return _cond_col(name, docid_col)


def _filtered_base(
    stmt: SelectStmt,
    df: DataFrame | None,
    index,
    docid_col: str = "docid",
) -> DataFrame:
    """Matched (or scanned) relation with the statement's WHERE
    conditions applied — the match set that feeds the bounded queue,
    and the set SHOW META's total_found counts (m_iTotalMatches
    counts matches that PASSED m_dFilters)."""
    if stmt.match is not None:
        if index is None:
            raise SphinxQLError("MATCH() requires an index")
        ranked = index.search(
            stmt.match,
            ranker=stmt.options.get("ranker"),
            limit=1 << 30,
            max_matches=1 << 30,
            sorted_output=False,
        )
        base = ranked if df is None else ranked.join(df, docid_col, "inner")
    else:
        if df is None:
            raise SphinxQLError("no source")
        base = df

    for name, op, val in stmt.conds:
        c = _cond_col(name, docid_col)
        if op == "in":
            base = base.where(c.isin(val))
        elif op == "not_in":
            base = base.where(~c.isin(val))
        elif op == "between":
            base = base.where(c.between(val[0], val[1]))
        elif op == "=":
            base = base.where(c == val)
        elif op in ("!=", "<>"):
            base = base.where(c != val)
        elif op == "<":
            base = base.where(c < val)
        elif op == ">":
            base = base.where(c > val)
        elif op == "<=":
            base = base.where(c <= val)
        elif op == ">=":
            base = base.where(c >= val)
    cutoff = int(stmt.options.get("cutoff", 0) or 0)
    if cutoff > 0:
        # OPTION cutoff (AddOption src/searchd.cpp:4727-4729 ->
        # SetLimits cutoff): matching stops after N ACCEPTED pushes in
        # docid processing order.  Under GROUP BY a push counts only
        # when it creates a NEW group (the sorter's bNewMatch), so the
        # cut lands after the cutoff-th distinct group instead —
        # group_cutoff pins the live daemon's exact behavior.
        from pyspark.sql.types import ArrayType

        from sphinx_1_spark.plans.attrs import docid_ord, group_cutoff

        if stmt.group_by:
            fld = next(
                (
                    f
                    for f in base.schema.fields
                    if f.name.lower() == stmt.group_by.lower()
                ),
                None,
            )
            if fld is not None and isinstance(fld.dataType, ArrayType):
                # MVA group key: one match introducing several
                # value-groups decrements the daemon's counter ONCE —
                # derive first-occurrences from the exploded values
                # (same shape as the ApiQuery path, plans/api.py)
                kf = base.select(
                    docid_col,
                    F.explode(F.col(fld.name)).alias("_gv"),
                )
                base = group_cutoff(
                    base, F.col("_gv"), cutoff, docid_col, key_frame=kf
                )
            else:
                base = group_cutoff(
                    base, _cond_col(stmt.group_by, docid_col), cutoff,
                    docid_col,
                )
        else:
            base = base.orderBy(docid_ord(docid_col).asc()).limit(cutoff)
    return base


def execute(
    stmt: SelectStmt,
    df: DataFrame | None = None,
    index=None,
    docid_col: str = "docid",
    base: DataFrame | None = None,
) -> DataFrame:
    """Run a parsed SELECT against an attribute DataFrame and/or a
    SphinxIndex (for MATCH); mirrors the searchd flow: match ->
    filters -> group/sort (the max_matches-bounded queue) -> page
    (src/searchd.cpp:4657-4850).

    Filters run BEFORE the max_matches bound: the reference's match
    queue is fed by filtered matches (early reject,
    src/sphinxfilter.h), its comparator is the statement's own sort
    spec, and ranks past max_matches (default 1000, like searchd) do
    not exist — truncating the unfiltered top-N first and filtering
    after would silently drop filtered matches that belong in the
    queue."""
    from sphinx_1_spark.plans.attrs import docid_ord

    if int(stmt.options.get("max_query_time", 0) or 0):
        # parses like the reference (AddOption src/searchd.cpp:4731)
        # but serving it is the documented permanent N/A — same
        # contract and reasoning as ApiQuery.max_query_time
        # (plans/api.py:293): the reference truncates to a
        # timing-dependent partial match set no declarative plan can
        # reproduce
        raise SphinxQLError(
            "max_query_time is a documented permanent N/A: the "
            "reference truncates to a timing-dependent partial match "
            "set (src/sphinx.cpp:11841-11847), which a declarative "
            "batch plan cannot reproduce; bound job wall-clock with "
            "spark.sparkContext.cancelJobGroup instead"
        )
    if base is None:
        base = _filtered_base(stmt, df, index, docid_col)
    max_matches = int(stmt.options.get("max_matches", 1000))
    if not 1 <= max_matches <= 1000:
        # CheckQuery (src/searchd.cpp:2988-2993): per-query
        # max_matches must be 1..g_iMaxMatches (server default 1000)
        raise SphinxQLError(
            f"per-query max_matches={max_matches} out of bounds "
            "(per-server max_matches=1000)"
        )
    if stmt.offset >= max_matches:
        # CheckQuery (src/searchd.cpp:2994)
        raise SphinxQLError(
            f"offset out of bounds (offset={stmt.offset}, "
            f"max_matches={max_matches})"
        )

    def sel_col(expr: str, alias: str | None) -> Column:
        m = _AGG_RE.match(expr)
        if m:
            fn, arg = m.group(1).upper(), m.group(2)
            if fn == "COUNT" and arg == "*":
                c = F.count(F.lit(1))
            elif fn == "COUNT" and arg.upper().startswith("DISTINCT"):
                c = F.countDistinct(arg.split()[-1])
            else:
                c = getattr(F, fn.lower())(arg)
            return c.alias(alias or expr.lower().replace(" ", "_"))
        if expr == "@id":
            return F.col(docid_col).alias(alias or "id")
        if expr == "@weight":
            return F.col("weight").alias(alias or "weight")
        if expr == "@count":
            return F.count(F.lit(1)).alias(alias or "count")
        return F.col(expr).alias(alias) if alias else F.col(expr)

    if stmt.match is not None and not stmt.group_by and not stmt.order_by:
        # searchd default sort mode: relevance (weight desc, id asc —
        # docids compare unsigned, SphDocID_t is a DWORD64)
        base = base.orderBy(
            F.col("weight").desc(), docid_ord(docid_col).asc()
        )

    if stmt.group_by:
        aggs = [
            sel_col(e, a)
            for e, a in stmt.select
            if _AGG_RE.match(e) or e == "@count"
        ]
        if not aggs:
            # Sphinx adds @count to every grouped result implicitly
            # (and GroupedData.agg() rejects an empty expression list)
            aggs = [F.count(F.lit(1)).alias("@count")]
        plain = [
            e for e, _ in stmt.select
            if not _AGG_RE.match(e) and e not in ("@count", stmt.group_by, "*")
        ]
        grouped = base.groupBy(stmt.group_by).agg(*aggs)
        if stmt.within_order or plain:
            # representative-row default: the group sorter keeps the
            # BEST match per group (weight desc, docid asc — the
            # api_group_query comparator) when ranked; plain scans
            # fall back to lowest docid
            default_order = (
                [("@weight", False), ("@id", True)]
                if stmt.match is not None
                else [(docid_col, True)]
            )
            order = [
                _order_col(c, docid_col).asc()
                if asc
                else _order_col(c, docid_col).desc()
                for c, asc in (stmt.within_order or default_order)
            ]
            w = Window.partitionBy(stmt.group_by).orderBy(*order)
            plain_cols = []
            for e in plain:
                if e == "@id":
                    plain_cols.append(F.col(docid_col).alias("id"))
                elif e == "@weight":
                    plain_cols.append(F.col("weight"))
                else:
                    plain_cols.append(F.col(e))
            best = (
                base.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select(stmt.group_by, *plain_cols)
            )
            grouped = grouped.join(best, stmt.group_by)
        out = grouped
    else:
        if stmt.select == [("*", None)]:
            out = base
        else:
            out = base.select(*[sel_col(e, a) for e, a in stmt.select])

    if stmt.order_by:
        out = out.orderBy(
            *[
                (
                    _order_col(c, docid_col).asc()
                    if asc
                    else _order_col(c, docid_col).desc()
                )
                for c, asc in stmt.order_by
            ]
        )
    # bounded-queue page window: ranks past max_matches do not exist
    page_end = min(stmt.offset + stmt.limit, max_matches)
    if stmt.offset:
        out = out.offset(stmt.offset)
    return out.limit(page_end - stmt.offset)


def sphinxql(
    sql: str, df: DataFrame | None = None, index=None, docid_col: str = "docid"
) -> DataFrame:
    return execute(parse_select(sql), df, index, docid_col)


class SphinxQLSession:
    """Stateful SphinxQL endpoint: SELECT statements update last-query
    stats which SHOW META / SHOW WARNINGS then read — the MySQL-wire
    session semantics of searchd (SHOW META handler
    src/searchd.cpp:5736+; stats filled from CSphQueryResult,
    src/sphinx.h:1752-1792)."""

    def __init__(
        self, df: DataFrame | None = None, index=None, docid_col: str = "docid"
    ):
        import time as _time

        self.df = df
        self.index = index
        self.docid_col = docid_col
        self._meta: list[tuple[str, str]] = []
        self._warnings: list[str] = []
        self._started = _time.time()
        self._n_queries = 0  # g_pStats->m_iQueries analog
        self._query_wall = 0.0  # m_iQueryTime analog, seconds
        self._spark = (
            df.sparkSession if df is not None
            else index.spark if index is not None
            else None
        )

    @staticmethod
    def _fmt_msec(seconds: float) -> str:
        # FormatMsec (src/searchd.cpp:5291-5294): "%d.%03d" over usec
        us = int(seconds * 1_000_000)
        return f"{us // 1_000_000}.{(us % 1_000_000) // 1000:03d}"

    def status(self) -> list[tuple[str, str]]:
        """SHOW STATUS counters — the reference's BuildStatus name set
        and order (src/searchd.cpp:5297-5365), batch-session values
        where daemon ones don't apply: this in-process endpoint is one
        connection with no agents, CPU/IO stats default OFF exactly
        like an unconfigured searchd (g_bCpuStats / g_bIOStats), and
        command_status counts the binary-API STATUS command, which the
        SphinxQL path never issues (the reference's mysql41 SHOW
        STATUS doesn't bump it either, searchd.cpp:5891-5896).

        query_wall fidelity caveat: execute() returns a LAZY
        DataFrame, so the accumulated wall covers plan construction
        plus the in-execute materializations (the SHOW META
        total_found count for MATCH queries) — not the caller's later
        .collect().  The daemon's m_iQueryTime covers the full
        serve; here the serve completes outside the session's
        control, so the counter is a lower bound for plain attribute
        SELECTs."""
        import time as _time

        nq = self._n_queries
        div = max(nq, 1)
        off = "OFF"
        zero = self._fmt_msec(0.0)
        return [
            ("uptime", str(int(_time.time() - self._started))),
            ("connections", "1"),
            ("maxed_out", "0"),
            ("command_search", str(nq)),
            ("command_excerpt", "0"),
            ("command_update", "0"),
            ("command_keywords", "0"),
            ("command_persist", "0"),
            ("command_status", "0"),
            ("agent_connect", "0"),
            ("agent_retry", "0"),
            ("queries", str(nq)),
            ("dist_queries", "0"),
            ("query_wall", self._fmt_msec(self._query_wall)),
            ("query_cpu", off),
            ("dist_wall", zero),
            ("dist_local", zero),
            ("dist_wait", zero),
            ("query_reads", off),
            ("query_readkb", off),
            ("query_readtime", off),
            ("avg_query_wall", self._fmt_msec(self._query_wall / div)),
            ("avg_query_cpu", off),
            ("avg_dist_wall", zero),
            ("avg_dist_local", zero),
            ("avg_dist_wait", zero),
            ("avg_query_reads", off),
            ("avg_query_readkb", off),
            ("avg_query_readtime", off),
        ]

    def execute(self, sql: str) -> DataFrame:
        import time as _time

        up = sql.strip().upper().rstrip(";")
        if up == "SHOW META":
            rows = self._meta or [("total", "0")]
            return self._spark.createDataFrame(
                rows, "variable_name string, value string"
            )
        if up == "SHOW WARNINGS":
            return self._spark.createDataFrame(
                [(i + 1, w) for i, w in enumerate(self._warnings)] or [],
                "level int, message string",
            )
        if up == "SHOW STATUS":
            # STMT_SHOW_STATUS (src/sphinxql.y:373-374) -> BuildStatus
            # (src/searchd.cpp:5297), same two-string-column result
            # set as SHOW META (Variable_name, Value — :5906-5908)
            return self._spark.createDataFrame(
                self.status(), "variable_name string, value string"
            )
        if up.startswith("SHOW"):
            raise SphinxQLError(f"unsupported SHOW statement: {sql!r}")

        t0 = _time.perf_counter()
        stmt = parse_select(sql)
        # compute the filtered match set ONCE and share it between the
        # result plan and the SHOW META totals below (with OPTION
        # cutoff this also runs group_cutoff's eager collect a single
        # time per query); skipped when execute() will reject the
        # statement anyway (max_query_time) or META has no use for it
        fb = None
        if (
            stmt.match is not None
            and self.index is not None
            and (stmt.group_by or stmt.conds or stmt.options.get("cutoff"))
            and not int(stmt.options.get("max_query_time", 0) or 0)
        ):
            fb = _filtered_base(stmt, self.df, self.index, self.docid_col)
        out = execute(stmt, self.df, self.index, self.docid_col, base=fb)
        meta: list[tuple[str, str]] = []
        self._warnings = []
        if stmt.match is not None and self.index is not None:
            warn = self.index.check_query_words(stmt.match)
            if warn:
                self._warnings = [warn]
        if stmt.match is not None and self.index is not None:
            plan, m = self.index.match(stmt.match)
            if stmt.group_by:
                # grouped queries report GROUP counts: the group
                # sorter's total is the number of distinct groups the
                # filtered matches produced, not the match count
                # (CSphKBufferGroupSorter push accounting; pinned live
                # in test_random_select_compositions — the daemon's
                # SHOW META said total=4 groups where we said 10
                # matches)
                total_found = (
                    fb
                    .select(_cond_col(stmt.group_by, self.docid_col))
                    .distinct()
                    .count()
                )
            elif stmt.conds or stmt.options.get("cutoff"):
                # m_iTotalMatches counts matches that PASSED the attr
                # filters (they are part of matching, not decoration)
                # and stops at cutoff (matching stopped there, so the
                # daemon reports total == total_found == cutoff — live
                # differential test_option_cutoff)
                total_found = fb.count()
            else:
                # plan is one row per matched docid (compile_node
                # merges AND/OR per doc), so a plain count IS the
                # distinct count — no extra shuffle over the match set
                total_found = plan.select("docid").count()
            # 'total' = m_dMatches.GetLength() (searchd.cpp:5756):
            # bounded by max_matches (OPTION or the 1000 default),
            # NEVER by LIMIT — LIMIT only affects rows returned
            max_matches = int(stmt.options.get("max_matches", 1000))
            meta.append(("total", str(min(total_found, max_matches))))
            meta.append(("total_found", str(total_found)))
            meta.append(
                ("time", f"{_time.perf_counter() - t0:.3f}")
            )
            for i, (w, (docs, hits)) in enumerate(m["stats"].items()):
                meta.append((f"keyword[{i}]", w))
                meta.append((f"docs[{i}]", str(docs)))
                meta.append((f"hits[{i}]", str(hits)))
        self._meta = meta
        self._n_queries += 1
        self._query_wall += _time.perf_counter() - t0
        return out
