"""Replay harness for the reference's own e2e golden suite.

The reference ships 79 `test/test_NN/` dirs (ubertest.php): each
`test.xml` declares a sphinx.conf template, SQL fixture data and a
query list; `model.bin` is the PHP-serialized output of the COMPILED
reference engine (matches with docid+weight in rank order, totals,
per-term docs/hits stats).  This module parses those artifacts, builds
the equivalent SphinxIndex over the same rows, runs the same queries
through our engine (score_mode="exact32" — the reference's float32
scoring path), and diffs against model.bin.

This is the BASELINE.json headline check ("BM25 top-10 rank-identity
rate on the Sphinx reference query set") run against the reference's
own goldens rather than a re-derived oracle.

Parsers cover the subset of sphinx.conf / SphinxAPI the replayed tests
use; tests needing searchd-only machinery (network, persistent conns,
distributed agents, rotation) are out of scope per SURVEY §2.1.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

from tests.php_unserialize import loads as php_loads

REF_TEST_ROOT = "/root/reference/test"


# ----------------------------------------------------------------------
# test.xml parsing
# ----------------------------------------------------------------------

@dataclass
class RefQuery:
    query: str
    mode: str = "all"          # ubertest default: SPH_MATCH_ALL
    ranker: str | None = None  # None -> mode default
    filter: str | None = None
    filter_value: int | None = None
    filter_range: tuple[int, int] | None = None
    sortmode: str | None = None
    sortby: str | None = None
    groupattr: str | None = None
    groupfunc: str | None = None
    groupsort: str = "@group desc"
    groupdistinct: str | None = None
    index: str | None = None
    expect_error: bool = False
    cutoff: int | None = None
    id_range: tuple[int, int] | None = None
    select: str | None = None
    index_weights: dict[str, int] | None = None
    roundoff: int = 0
    # legacy <Query_Settings> PHP block (tests 07/08/09)
    geoanchor: tuple[str, str, float, float] | None = None
    float_range: tuple[str, float, float] | None = None


@dataclass
class RefTest:
    name: str
    config_text: str
    creates: list[str]
    inserts: list[str]
    queries: list[RefQuery]
    model: list  # model.bin: [subtest][query] -> result dict
    dirpath: str
    sections: list = field(default_factory=list)
    indexer_runs: list = field(default_factory=list)
    id64: bool = False  # <id64/> requirement tag (--enable-id64 build)


def _parse_range(s: str | None) -> tuple[int, int] | None:
    if not s:
        return None
    # ubertest ParseRange splits on space (helpers.inc:325); accept
    # comma too for robustness
    m = re.match(r"\s*(-?\d+)[\s,]+(-?\d+)", s)
    return (int(m.group(1)), int(m.group(2))) if m else None


# --- case-insensitive element helpers (PHP DOM tag compare is
# strtolower, helpers.inc:140) -----------------------------------------

def _ci_children(node, name: str | None = None) -> list:
    return [
        c for c in node
        if isinstance(c.tag, str)
        and (name is None or c.tag.lower() == name)
    ]


def _ci_first(node, name: str):
    ch = _ci_children(node, name)
    return ch[0] if ch else None


def _iter_dynamics(el) -> list:
    """All <dynamic> nodes in document order (GatherNodes pre-order,
    helpers.inc:310)."""
    out: list = []

    def rec(n):
        if isinstance(n.tag, str) and n.tag.lower() == "dynamic":
            out.append(n)
        for c in n:
            rec(c)

    rec(el)
    return out


def subtest_count(test_id: str, root: str = REF_TEST_ROOT) -> int:
    d = os.path.join(root, test_id)
    r = ET.parse(os.path.join(d, "test.xml")).getroot()
    cfg = _ci_first(r, "config")
    n = 1
    for dyn in _iter_dynamics(cfg) if cfg is not None else []:
        n *= max(len(_ci_children(dyn, "variant")), 1)
    return n


def _counters_for_subtest(radix: list[int], n: int) -> list[int]:
    """GenNextCfg increments counter[0] fastest (helpers.inc:271)."""
    cs = []
    for r in radix:
        cs.append(n % r)
        n //= r
    return cs


def render_config(cfg_el, subtest: int) -> str:
    """Mimic SphinxConfig::Dump (helpers.inc:1006) for one subtest:
    emit #text + <static> verbatim, pick the counter'd <variant> of
    each <dynamic>, substitute the settings placeholders."""
    dyns = _iter_dynamics(cfg_el)
    radix = [max(len(_ci_children(d, "variant")), 1) for d in dyns]
    counters = _counters_for_subtest(radix, subtest)
    dyn_id = {id(d): i for i, d in enumerate(dyns)}
    parts: list[str] = []

    def rec(n):
        tag = n.tag.lower() if isinstance(n.tag, str) else ""
        if tag == "static":
            parts.append("".join(n.itertext()))
            return
        if tag == "searchd_settings":
            # ubertest globals (ubertest.php:14): only max_matches is
            # semantically visible to the engine
            parts.append("\tmax_matches = 100000\n")
            return
        if tag == "sql_settings":
            return
        if tag == "data_path":
            parts.append("data")
            return
        if tag == "test_root":
            parts.append(REF_TEST_ROOT)
            return
        if tag == "agent_address":
            parts.append("localhost:6713")
            return
        if tag == "dynamic":
            variants = _ci_children(n, "variant")
            if variants:
                v = variants[counters[dyn_id[id(n)]]]
                parts.append("".join(v.itertext()) + "\n")
            return
        # agent0/agent1/... sections and plain containers: recurse
        if n.text:
            parts.append(n.text)
        for c in n:
            rec(c)
            if c.tail:
                parts.append(c.tail)

    if cfg_el.text:
        parts.append(cfg_el.text)
    for c in cfg_el:
        rec(c)
        if c.tail:
            parts.append(c.tail)
    return "".join(parts)


def load_test(
    test_id: str, root: str = REF_TEST_ROOT, subtest: int = 0
) -> RefTest:
    d = os.path.join(root, test_id)
    tree = ET.parse(os.path.join(d, "test.xml"))
    r = tree.getroot()
    cfg = render_config(_ci_first(r, "config"), subtest)
    queries = []
    qs = _ci_first(r, "queries")
    if qs is not None:
        for q in qs.findall("query"):
            a = q.attrib

            def _php_truthy(key):
                # ubertest reads attrs with @$qinfo[...] — "0" and ""
                # are falsy in PHP, so a literal 0 means "not set"
                v = a.get(key)
                return v if v and v != "0" else None

            iw = None
            if a.get("index_weights"):
                iw = {
                    m.group(1): int(m.group(2))
                    for m in re.finditer(
                        r"(\S+):(\d+)", a["index_weights"]
                    )
                }
            queries.append(
                RefQuery(
                    query=q.text or "",
                    mode=a.get("mode") or "all",
                    ranker=a.get("ranker") or None,
                    filter=a.get("filter") or None,
                    filter_value=(
                        int(v) if (v := _php_truthy("filter_value")) else None
                    ),
                    filter_range=_parse_range(a.get("filter_range")),
                    sortmode=a.get("sortmode") or None,
                    sortby=a.get("sortby") or None,
                    groupattr=a.get("groupattr") or None,
                    groupfunc=a.get("groupfunc") or None,
                    groupsort=a.get("groupsort") or "@group desc",
                    groupdistinct=a.get("groupdistinct") or None,
                    index=a.get("index") or None,
                    expect_error=bool(a.get("expect_error")),
                    cutoff=int(v) if (v := _php_truthy("cutoff")) else None,
                    id_range=_parse_range(a.get("id_range")),
                    select=a.get("select") or None,
                    index_weights=iw,
                    roundoff=int(a.get("roundoff") or 0),
                )
            )
    else:
        # legacy v1 format: <Query><Query_0>text</Query_0>...</Query>,
        # every query runs in default mode = SPH_MATCH_ALL with the
        # default ranker (helpers.inc:495-500)
        legacy = _ci_first(r, "query")
        # <Query_Settings>: raw SphinxClient PHP calls (RunQuery eval,
        # helpers.inc) — the suite only uses SetGeoAnchor,
        # SetSortMode(SPH_SORT_EXTENDED, ...), SetFilterFloatRange and
        # a literal Query(.., 'index')
        qset = _ci_first(r, "query_settings")
        geo = ffr = qindex = None
        sortmode = sortby = None
        if qset is not None:
            txt = "".join(qset.itertext())
            if (m := re.search(
                r"SetGeoAnchor\s*\(\s*'(\w+)'\s*,\s*'(\w+)'\s*,"
                r"\s*(-?[\d.]+)\s*,\s*(-?[\d.]+)", txt,
            )):
                geo = (m.group(1), m.group(2),
                       float(m.group(3)), float(m.group(4)))
            if (m := re.search(
                r"SetSortMode\s*\(\s*SPH_SORT_EXTENDED\s*,\s*'([^']+)'",
                txt,
            )):
                sortmode, sortby = "extended", m.group(1)
            if (m := re.search(
                r"SetFilterFloatRange\s*\(\s*'([^']+)'\s*,"
                r"\s*(-?[\d.]+)\s*,\s*(-?[\d.]+)", txt,
            )):
                ffr = (m.group(1), float(m.group(2)), float(m.group(3)))
            if (m := re.search(r"Query\s*\(\s*\$query\s*,\s*'(\w+)'", txt)):
                qindex = m.group(1)
        if legacy is not None:
            for q in _ci_children(legacy):
                queries.append(
                    RefQuery(
                        query="".join(q.itertext()),
                        geoanchor=geo,
                        float_range=ffr,
                        sortmode=sortmode,
                        sortby=sortby,
                        index=qindex,
                    )
                )
    with open(os.path.join(d, "model.bin"), "rb") as f:
        model = php_loads(f.read())
    test = RefTest(
        name=(
            "".join(_ci_first(r, "name").itertext())
            if _ci_first(r, "name") is not None
            else test_id
        ),
        config_text=cfg,
        creates=["".join(n.itertext()) for n in _ci_children(r, "db_create")],
        inserts=["".join(n.itertext()) for n in _ci_children(r, "db_insert")],
        queries=queries,
        model=model,
        dirpath=d,
    )
    req = _ci_first(r, "requires")
    test.id64 = req is not None and _ci_first(req, "id64") is not None
    test.sections = parse_config(cfg)
    ixr = _ci_first(r, "indexer")
    if ixr is not None:
        test.indexer_runs = [
            "".join(n.itertext()) for n in _ci_children(ixr, "run")
        ]
    return test


# ----------------------------------------------------------------------
# sphinx.conf parsing (the subset the suite uses)
# ----------------------------------------------------------------------

def parse_config(text: str) -> list[tuple[str, str, str | None, dict]]:
    """[(kind, name, parent, {key: [values]})] for source/index sections."""
    out = []
    cur: dict | None = None
    pending_key = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if pending_key is not None and cur is not None:
            val = line.rstrip("\\").strip()
            cur[pending_key][-1] += " " + val
            if not line.endswith("\\"):
                pending_key = None
            continue
        m = re.match(r"(\w+)\s+(\w+)(?:\s*:\s*(\w+))?\s*\{?$", line)
        if m and m.group(1) in ("source", "index"):
            cur = {}
            out.append((m.group(1), m.group(2), m.group(3), cur))
            continue
        if line in ("{", "}"):
            if line == "}":
                cur = None
            continue
        if cur is None:
            continue
        m = re.match(r"([\w]+)\s*=\s*(.*)$", line)
        if m:
            key, val = m.group(1), m.group(2)
            cont = val.endswith("\\")
            val = val.rstrip("\\").strip()
            cur.setdefault(key, []).append(val)
            if cont:
                pending_key = key
    # resolve single-level inheritance (index delta : main)
    by_name = {(k, n): v for k, n, _, v in out}
    resolved = []
    for kind, name, parent, vals in out:
        if parent and (kind, parent) in by_name:
            merged = dict(by_name[(kind, parent)])
            merged.update(vals)
            vals = merged
        resolved.append((kind, name, parent, vals))
    return resolved


# ----------------------------------------------------------------------
# SQL fixture parsing
# ----------------------------------------------------------------------

@dataclass
class ColDef:
    name: str
    autoinc: bool = False
    default: object = None


def parse_create(sql: str) -> tuple[str, list[ColDef]]:
    m = re.search(r"CREATE\s+TABLE\s+`?(\w+)`?\s*\((.*)\)", sql, re.S | re.I)
    body = m.group(2)
    parts, depth, cur = [], 0, ""
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        parts.append(cur)
    cols = []
    for p in parts:
        p = p.strip()
        if not p or re.match(r"(PRIMARY|UNIQUE|KEY|INDEX|CONSTRAINT)\b", p, re.I):
            continue
        mm = re.match(r"`?(\w+)`?", p)
        default = None
        md = re.search(r"default\s+(?:'((?:[^'\\]|\\.)*)'|(-?\d+))", p, re.I)
        if md:
            default = (
                md.group(1) if md.group(1) is not None else int(md.group(2))
            )
        cols.append(
            ColDef(
                mm.group(1),
                autoinc=bool(re.search(r"auto_increment", p, re.I)),
                default=default,
            )
        )
    return m.group(1), cols


def parse_insert_values(sql: str) -> tuple[str, list[str] | None, list[list]]:
    """(table, explicit_cols_or_None, rows) from one INSERT statement."""
    m = re.search(
        r"INSERT\s+INTO\s+`?(\w+)`?\s*(?:\(([^)]*)\))?\s*VALUES\s*(.*)",
        sql,
        re.S | re.I,
    )
    if m is None:
        # INSERT ... SELECT lit, lit UNION SELECT ... (test_94 shape);
        # supports int/string literals and REPEAT('s', n)
        ms = re.search(r"INSERT\s+INTO\s+`?(\w+)`?\s*(.*)", sql, re.S | re.I)
        rows = []
        for sel in re.split(r"\bUNION\b", ms.group(2), flags=re.I):
            sel = sel.strip()
            if not sel:
                continue
            body = re.sub(r"^SELECT\s+", "", sel, flags=re.I)
            row = []
            # split on commas outside quotes AND parens (REPEAT('x', n))
            items, depth, inq, cur = [], 0, False, ""
            for ch in body:
                if ch == "'" :
                    inq = not inq
                if not inq:
                    if ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                    elif ch == "," and depth == 0:
                        items.append(cur)
                        cur = ""
                        continue
                cur += ch
            if cur.strip():
                items.append(cur)
            for item in items:
                item = item.strip()
                rep = re.match(r"REPEAT\('((?:[^'\\]|\\.)*)'\s*,\s*(\d+)\)", item, re.I)
                if rep:
                    row.append(rep.group(1) * int(rep.group(2)))
                elif re.fullmatch(r"-?\d+", item):
                    row.append(int(item))
                else:
                    row.append(item.strip("'"))
            rows.append(row)
        return ms.group(1), None, rows
    table = m.group(1)
    cols = (
        [c.strip(" `\t\n") for c in m.group(2).split(",")] if m.group(2) else None
    )
    rest = m.group(3)
    rows: list[list] = []
    i, n = 0, len(rest)
    while i < n:
        while i < n and rest[i] not in "(":
            i += 1
        if i >= n:
            break
        i += 1
        row: list = []
        while True:
            while i < n and rest[i] in " \t\r\n":
                i += 1
            if rest[i] == "'":
                i += 1
                buf = []
                while True:
                    ch = rest[i]
                    if ch == "\\" and i + 1 < n:
                        nxt = rest[i + 1]
                        buf.append({"n": "\n", "t": "\t", "r": "\r", "0": "\0"}.get(nxt, nxt))
                        i += 2
                        continue
                    if ch == "'":
                        if i + 1 < n and rest[i + 1] == "'":
                            buf.append("'")
                            i += 2
                            continue
                        i += 1
                        break
                    buf.append(ch)
                    i += 1
                row.append("".join(buf))
            else:
                # scan to the next top-level ',' or ')' — function
                # calls like substr(compress('x'), 5) nest both
                j, depth, inq = i, 0, False
                while j < n:
                    ch = rest[j]
                    if ch == "'":
                        inq = not inq
                    elif not inq:
                        if ch == "(":
                            depth += 1
                        elif ch == ")":
                            if depth == 0:
                                break
                            depth -= 1
                        elif ch == "," and depth == 0:
                            break
                    j += 1
                tok = rest[i:j].strip()
                if re.fullmatch(r"-?\d+", tok):
                    row.append(int(tok))
                elif re.fullmatch(r"-?\d*\.\d+(e-?\d+)?", tok, re.I):
                    row.append(float(tok))
                elif tok.upper() == "NULL":
                    row.append(None)
                else:
                    row.append(_eval_sql_fn(tok))
                i = j
            while i < n and rest[i] in " \t\r\n":
                i += 1
            if rest[i] == ",":
                i += 1
                continue
            assert rest[i] == ")", rest[max(0, i - 30): i + 5]
            i += 1
            break
        rows.append(row)
        while i < n and rest[i] in " \t\r\n":
            i += 1
        if i < n and rest[i] == ",":
            i += 1
            continue
        if i < n and rest[i] == ";":
            i += 1
    return table, cols, rows


def _eval_sql_fn(tok: str):
    """Evaluate the MySQL value functions the suite uses in VALUES
    lists: COMPRESS() (4-byte LE uncompressed length + zlib stream,
    empty in -> empty out) and SUBSTR(COMPRESS(..), n)."""
    m = re.fullmatch(r"compress\(\s*'((?:[^'\\]|\\.)*)'\s*\)", tok, re.I)
    if m:
        import struct
        import zlib

        s = m.group(1).encode()
        return struct.pack("<I", len(s)) + zlib.compress(s) if s else b""
    m = re.fullmatch(
        r"substr\(\s*compress\(\s*'((?:[^'\\]|\\.)*)'\s*\)\s*,\s*(\d+)\s*\)",
        tok,
        re.I,
    )
    if m:
        import struct
        import zlib

        s = m.group(1).encode()
        blob = struct.pack("<I", len(s)) + zlib.compress(s) if s else b""
        return blob[int(m.group(2)) - 1:]
    return tok


def _eval_insert_select(
    sql: str, out: dict[str, tuple[list[str], list[list]]]
) -> tuple[str, list[list]] | None:
    """INSERT INTO t SELECT items FROM src [WHERE..]: evaluate over the
    CURRENT rows of src (statement-start snapshot, like MySQL)."""
    m = re.match(
        r"\s*INSERT\s+INTO\s+`?(\w+)`?\s+(SELECT\s+.*\bFROM\b.*)$",
        sql,
        re.I | re.S,
    )
    if not m:
        return None
    table, sel = m.group(1), m.group(2)
    ms = re.match(
        r"SELECT\s+(.*?)\s+FROM\s+`?(\w+)`?(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
        sel,
        re.I | re.S,
    )
    src_cols, src_rows = out[ms.group(2)]
    idx_of = {c: i for i, c in enumerate(src_cols)}
    if ms.group(3):
        import operator as _op

        mw = re.fullmatch(
            r"`?(\w+)`?\s*(>=|<=|<>|!=|=|<|>)\s*(-?\d+)",
            ms.group(3).strip(),
        )
        if not mw:
            raise ValueError(f"unsupported WHERE {ms.group(3)!r}")
        ci, k = idx_of[mw.group(1)], int(mw.group(3))
        fn = {
            ">=": _op.ge, "<=": _op.le, "<>": _op.ne, "!=": _op.ne,
            "=": _op.eq, "<": _op.lt, ">": _op.gt,
        }[mw.group(2)]
        src_rows = [r for r in src_rows if fn(int(r[ci]), k)]
    fns = []
    for part in re.split(r",(?![^(]*\))", ms.group(1)):
        part = part.strip()
        if re.fullmatch(r"`?\w+`?", part):
            fns.append((lambda i: lambda r: r[i])(idx_of[part.strip("`")]))
        elif (m2 := re.fullmatch(r"`?(\w+)`?\s*([*+-])\s*(\d+)", part)):
            i, op, k = idx_of[m2.group(1)], m2.group(2), int(m2.group(3))
            fn = {
                "*": lambda a, b: a * b,
                "+": lambda a, b: a + b,
                "-": lambda a, b: a - b,
            }[op]
            fns.append((lambda i, k, fn: lambda r: fn(r[i], k))(i, k, fn))
        else:
            raise ValueError(f"unsupported INSERT-SELECT item {part!r}")
    return table, [[fn(r) for fn in fns] for r in list(src_rows)]


def fixture_tables(test: RefTest) -> dict[str, tuple[list[str], list[list]]]:
    """{table: (cols, rows)}: INSERT col lists resolved, missing
    columns filled from auto_increment counters / DEFAULTs, and
    INSERT..SELECT statements evaluated in order."""
    tables: dict[str, list[ColDef]] = {}
    for c in test.creates:
        for stmt in re.split(r";\s*(?=CREATE)", c, flags=re.I):
            if re.search(r"CREATE\s+TABLE", stmt, re.I):
                t, cols = parse_create(stmt)
                tables[t] = cols
    out: dict[str, tuple[list[str], list[list]]] = {
        t: ([c.name for c in cols], []) for t, cols in tables.items()
    }
    counters: dict[str, int] = {t: 0 for t in tables}

    def add_rows(t, cols, rows):
        defs = tables.get(t)
        full = out.setdefault(t, (cols or [], []))
        if defs is None or cols is None or cols == full[0]:
            full[1].extend(rows)
            return
        # explicit column subset: fill the rest
        pos = {c: i for i, c in enumerate(cols)}
        for r in rows:
            fr = []
            for cd in defs:
                if cd.name in pos:
                    fr.append(r[pos[cd.name]])
                elif cd.autoinc:
                    counters[t] += 1
                    fr.append(counters[t])
                else:
                    fr.append(cd.default)
            full[1].append(fr)

    def _where_fn(cols, clause):
        import operator as _op

        mw = re.fullmatch(
            r"`?(\w+)`?\s*(>=|<=|<>|!=|=|<|>)\s*(-?\d+)", clause.strip()
        )
        if not mw:
            raise ValueError(f"unsupported WHERE {clause!r}")
        ci, k = cols.index(mw.group(1)), int(mw.group(3))
        fn = {
            ">=": _op.ge, "<=": _op.le, "<>": _op.ne, "!=": _op.ne,
            "=": _op.eq, "<": _op.lt, ">": _op.gt,
        }[mw.group(2)]
        return lambda r: fn(int(r[ci]), k)

    for ins in test.inserts:
        for stmt in re.split(r";\s*(?=INSERT)", ins, flags=re.I):
            # DELETE FROM t WHERE ... / UPDATE t SET c=v WHERE ...
            # (test_32 trims and mutates its fixture between inserts)
            if (md := re.match(
                r"\s*DELETE\s+FROM\s+`?(\w+)`?\s+WHERE\s+(.+?)\s*;?\s*$",
                stmt, re.I | re.S,
            )):
                cols0, rows0 = out[md.group(1)]
                keep = _where_fn(cols0, md.group(2))
                rows0[:] = [r for r in rows0 if not keep(r)]
                continue
            if (mu := re.match(
                r"\s*UPDATE\s+`?(\w+)`?\s+SET\s+`?(\w+)`?\s*=\s*(-?\d+)"
                r"\s+WHERE\s+(.+?)\s*;?\s*$",
                stmt, re.I | re.S,
            )):
                cols0, rows0 = out[mu.group(1)]
                hit = _where_fn(cols0, mu.group(4))
                si, sv = cols0.index(mu.group(2)), int(mu.group(3))
                for r in rows0:
                    if hit(r):
                        r[si] = sv
                continue
            if not re.match(r"\s*INSERT\b", stmt, re.I):
                continue  # set/select no-ops in db_insert
            evaluated = _eval_insert_select(stmt, out)
            if evaluated is not None:
                t, rows = evaluated
                add_rows(t, out[t][0][: len(rows[0])] if rows else None, rows)
                continue
            t, cols, rows = parse_insert_values(stmt)
            # track the autoinc counter for full-width inserts too
            defs = tables.get(t)
            if defs is not None and (cols is None or cols == out[t][0]):
                for i, cd in enumerate(defs):
                    if cd.autoinc and rows:
                        counters[t] = max(
                            counters[t],
                            max(int(r[i]) for r in rows if r[i] is not None),
                        )
            add_rows(t, cols, rows)
    return out


# ----------------------------------------------------------------------
# settings mapping
# ----------------------------------------------------------------------

ATTR_KEYS = (
    "sql_attr_uint", "sql_attr_bigint", "sql_attr_float",
    "sql_attr_timestamp", "sql_attr_bool", "sql_attr_str2ordinal",
)


def _parse_ts(v):
    """MySQL UNIX_TIMESTAMP('YYYY-MM-DD[ hh:mm:ss]') pinned to UTC."""
    import calendar
    import time as _t

    if isinstance(v, int):
        return v
    s = str(v)
    fmt = "%Y-%m-%d %H:%M:%S" if " " in s else "%Y-%m-%d"
    return calendar.timegm(_t.strptime(s, fmt))


def fixture_select(
    test: RefTest, sql_query: str
) -> tuple[list[str], list[list]]:
    """Evaluate one source sql_query against the fixture tables.

    Covers the suite's shapes: SELECT list items `col`, `*`,
    `col*N AS alias`, `UNIX_TIMESTAMP(col) AS alias`, and WHERE
    clauses `col IN (nums)` / `col = num` / `col = 'str'`."""
    tabs = fixture_tables(test)

    def _literal_row(sel_items: str) -> tuple[list[str], list]:
        names, vals = [], []
        for it in re.split(r",(?![^(]*\))", sel_items):
            it = it.strip()
            if (mm := re.fullmatch(r"'((?:[^'\\]|\\.)*)'", it)):
                names.append(mm.group(1))
                vals.append(mm.group(1))
            elif re.fullmatch(r"-?\d+", it):
                names.append(it)
                vals.append(int(it))
            else:
                raise ValueError(f"unsupported literal item {it!r}")
        return names, vals

    sq = sql_query.strip().rstrip(";").strip()
    # `SELECT * FROM (SELECT literals) t [WHERE 0]` — inline derived
    # table (the suite's empty-index trick, test_64)
    m = re.match(
        r"SELECT\s+\*\s+FROM\s+\(\s*(SELECT\s+[^)]*)\)\s*\w*"
        r"(?:\s+WHERE\s+(\S.*))?$",
        sq,
        re.I | re.S,
    )
    if m:
        names, vals = _literal_row(
            re.sub(r"^SELECT\s+", "", m.group(1), flags=re.I)
        )
        keep = not (m.group(2) and m.group(2).strip() == "0")
        return names, ([vals] if keep else [])
    # FROM-less literal select (one synthetic row)
    if not re.search(r"\bFROM\b", sq, re.I):
        names, vals = _literal_row(re.sub(r"^SELECT\s+", "", sq, flags=re.I))
        return names, [vals]
    m = re.match(
        r"SELECT\s+(.*?)\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*?))?\s*;?\s*$",
        sql_query.strip(),
        re.I | re.S,
    )
    if not m:
        t = next(iter(tabs))
        return tabs[t]
    sel, table, where = m.group(1).strip(), m.group(2), m.group(3)
    cols, rows = tabs[table]
    idx_of = {c: i for i, c in enumerate(cols)}

    # --- WHERE -------------------------------------------------------
    def row_pred(row):
        if not where:
            return True
        w = where.strip()
        mm = re.match(r"`?(\w+)`?\s+in\s*\(([^)]*)\)\s*$", w, re.I)
        if mm:
            vals = {int(x) for x in mm.group(2).split(",")}
            return row[idx_of[mm.group(1)]] in vals
        mm = re.match(r"`?(\w+)`?\s*=\s*(-?\d+)\s*$", w)
        if mm:
            return row[idx_of[mm.group(1)]] == int(mm.group(2))
        mm = re.match(r"`?(\w+)`?\s*=\s*'((?:[^'\\]|\\.)*)'\s*$", w)
        if mm:
            return str(row[idx_of[mm.group(1)]]) == mm.group(2)
        raise ValueError(f"unsupported WHERE clause: {where!r}")

    # --- SELECT list -------------------------------------------------
    items: list[tuple[str, object]] = []  # (name, fn(row))
    for part in re.split(r",(?![^(]*\))", sel):
        part = part.strip()
        if part == "*":
            for c in cols:
                items.append((c, (lambda i: lambda r: r[i])(idx_of[c])))
            continue
        mm = re.match(
            r"(.+?)\s+(?:AS\s+)?`?(\w+)`?\s*$", part, re.I
        ) if re.search(r"\s+AS\s+|\(", part, re.I) or " " in part else None
        expr, name = (mm.group(1), mm.group(2)) if mm else (part, part)
        expr = expr.strip()
        if (m2 := re.fullmatch(r"'((?:[^'\\]|\\.)*)'", expr)):
            # string literal: MySQL names the column after the literal
            lit = m2.group(1)
            items.append((lit if name == expr else name,
                          (lambda v: lambda r: v)(lit)))
        elif re.fullmatch(r"`?\w+`?", expr):
            c = expr.strip("`")
            items.append((name, (lambda i: lambda r: r[i])(idx_of[c])))
        elif (m2 := re.fullmatch(r"`?(\w+)`?\s*([*+-])\s*(\d+)", expr)):
            i, op, k = idx_of[m2.group(1)], m2.group(2), int(m2.group(3))
            fn = {
                "*": lambda a, b: a * b,
                "+": lambda a, b: a + b,
                "-": lambda a, b: a - b,
            }[op]
            items.append(
                (name, (lambda i, k, fn: lambda r: fn(r[i], k))(i, k, fn))
            )
        elif (m2 := re.fullmatch(r"(\d+)\s*([*+])\s*`?(\w+)`?", expr)):
            # constant-first form: 10+document_id (test_53 second index)
            k, op, i = int(m2.group(1)), m2.group(2), idx_of[m2.group(3)]
            fn = (lambda a, b: a + b) if op == "+" else (lambda a, b: a * b)
            items.append(
                (name, (lambda i, k, fn: lambda r: fn(int(r[i]), k))(i, k, fn))
            )
        elif (m2 := re.fullmatch(
            r"UNIX_TIMESTAMP\(\s*`?(\w+)`?\s*\)", expr, re.I
        )):
            i = idx_of[m2.group(1)]
            items.append((name, (lambda i: lambda r: _parse_ts(r[i]))(i)))
        else:
            raise ValueError(f"unsupported select item: {part!r}")
    out_cols = [n for n, _ in items]
    out_rows = [
        [fn(r) for _, fn in items] for r in rows if row_pred(r)
    ]
    return out_cols, out_rows


def parse_mva_specs(src: dict) -> list[tuple[str, str, str]]:
    """sql_attr_multi entries -> [(name, 'field'|'query', query_sql)]
    (CSphSourceParams_SQL m_dAttrMulti; src/sphinx.cpp:18650-18700)."""
    out = []
    for v in src.get("sql_attr_multi", []):
        m = re.match(
            r"\s*uint\s+(\w+)\s+from\s+(field|query)\s*;?\s*(.*)$",
            v,
            re.I | re.S,
        )
        if m:
            out.append((m.group(1), m.group(2).lower(), m.group(3).strip()))
    return out


def _read_aux_file(test: RefTest, name: str) -> str | None:
    for base in (test.dirpath, REF_TEST_ROOT):
        p = os.path.join(base, name)
        if os.path.exists(p):
            with open(p, encoding="utf-8", errors="replace") as f:
                return f.read()
    return None


def make_index_settings(test: RefTest, index_name: str | None = None):
    """IndexSettings for one `index` section of the test config."""
    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.plans.engine import IndexSettings

    idx_secs = [(n, v) for k, n, _, v in test.sections if k == "index"]
    src_secs = {n: v for k, n, _, v in test.sections if k == "source"}
    if index_name is None:
        name, icfg = idx_secs[0]
    else:
        name, icfg = next((n, v) for n, v in idx_secs if n == index_name)
    src = src_secs[icfg["source"][0]] if "source" in icfg else {}

    one = lambda key, default=None: icfg.get(key, [default])[0]

    # --- columns ----------------------------------------------------
    if (src.get("type", [""])[0] or "").strip() == "xmlpipe2":
        ds = xmlpipe_docset(src)
        docid = "id"
        fields = tuple(ds["fields"])
        attrs = [n for n, _t in ds["attrs"]]
    else:
        sql_query = (src.get("sql_query", [""])[0]) or "SELECT *"
        cols, _rows = fixture_select(test, sql_query)
        attrs = []
        for ak in ATTR_KEYS:
            for v in src.get(ak, []):
                # bitfield spec 'name:bits' (sql_attr_uint = tag2:8,
                # src/sphinx.cpp:18600) — storage detail, name only
                attrs.append(v.strip().split(":")[0].strip())
        mva_specs = parse_mva_specs(src)
        for name, kind, _q in mva_specs:
            attrs.append(name)
        docid = cols[0]
        fields = tuple(c for c in cols[1:] if c not in attrs)
    # from-query MVAs are attr-only columns added at build time
    table = None

    # --- tokenizer --------------------------------------------------
    tk: dict = {}
    if one("charset_table"):
        tk["charset_table"] = one("charset_table")
    if one("min_word_len"):
        tk["min_word_len"] = int(one("min_word_len"))
    if one("ngram_chars") and int(one("ngram_len") or 1) == 1:
        tk["ngram_chars"] = one("ngram_chars")
    if one("stopwords"):
        txt = _read_aux_file(test, one("stopwords"))
        if txt is not None:
            tk["stopwords"] = frozenset(txt.split())
    if one("wordforms"):
        txt = _read_aux_file(test, one("wordforms"))
        if txt is not None:
            pairs = []
            for line in txt.splitlines():
                if ">" in line:
                    frm, to = line.split(">", 1)
                    pairs.append((frm.strip().lower(), to.strip().lower()))
            tk["wordforms"] = tuple(pairs)
    if one("morphology"):
        tk["morphology"] = tuple(
            s.strip() for s in one("morphology").split(",") if s.strip()
        )
    if one("min_stemming_len"):
        tk["min_stemming_len"] = int(one("min_stemming_len"))
    if one("phrase_boundary"):
        tk["phrase_boundary"] = one("phrase_boundary")
        tk["boundary_step"] = int(one("phrase_boundary_step") or 0)
    if one("ignore_chars"):
        tk["ignore_chars"] = one("ignore_chars")
    if one("index_exact_words"):
        tk["index_exact_words"] = bool(int(one("index_exact_words")))
    if one("stopword_step"):
        tk["stopword_step"] = int(one("stopword_step"))
    if one("overshort_step"):
        tk["overshort_step"] = int(one("overshort_step"))
    enable_star = bool(int(one("enable_star") or 0))
    if one("min_prefix_len"):
        tk["min_prefix_len"] = int(one("min_prefix_len"))
    if one("min_infix_len"):
        tk["min_infix_len"] = int(one("min_infix_len"))
    prefix_fields = tuple(
        f.strip().lower()
        for f in (one("prefix_fields") or "").split(",") if f.strip()
    )
    infix_fields = tuple(
        f.strip().lower()
        for f in (one("infix_fields") or "").split(",") if f.strip()
    )
    if one("exceptions"):
        txt = _read_aux_file(test, one("exceptions"))
        if txt is not None:
            tk["synonyms"] = tuple(
                line for line in txt.splitlines() if "=>" in line
            )

    settings = IndexSettings(
        docid_col=docid,
        fields=fields,
        attrs=tuple(attrs),
        tokenizer=TokenizerSettings(**tk),
        tokenizer_impl="arrow",
        enable_star=enable_star,
        prefix_fields=prefix_fields,
        infix_fields=infix_fields,
        # <id64/> tests run the --enable-id64 build: 64-bit FNV
        # wordids and uint64 docids (src/sphinx.h SphWordID_t/SphDocID_t)
        wordid="fnv64" if test.id64 else "crc32",
    )
    return settings, table, name


def xmlpipe_docset(src: dict) -> dict:
    """Run an xmlpipe2 source's command and parse the docset through
    the engine's xmlpipe module (sources/xmlpipe.py).  Only the
    `cat <path>` form the suite uses is supported (test_68's
    xmlpipe_command = cat .../dataN.xml)."""
    from sphinx_1_spark.sources.xmlpipe import parse_docset

    cmd = (src.get("xmlpipe_command", [""])[0] or "").strip()
    m = re.fullmatch(r"cat\s+(\S+)", cmd)
    if not m:
        raise ValueError(f"unsupported xmlpipe_command {cmd!r}")
    with open(m.group(1)) as f:
        return parse_docset(f.read())


def index_rows(test: RefTest, src: dict) -> tuple[list[str], list[list]]:
    """(cols, rows) for one source section: sql_query + MVA attrs
    resolved (from-field strings split to int lists, from-query
    side-tables grouped per docid), bitfield attrs masked to their
    declared width (sql_attr_uint = name:bits keeps the low bits,
    src/sphinx.cpp docinfo bit packing)."""
    if (src.get("type", [""])[0] or "").strip() == "xmlpipe2":
        ds = xmlpipe_docset(src)
        cols = ["id"] + list(ds["fields"]) + [n for n, _t in ds["attrs"]]
        rows = [[d.get(c) for c in cols] for d in ds["documents"]]
    else:
        sql_query = (src.get("sql_query", [""])[0]) or "SELECT *"
        cols, rows = fixture_select(test, sql_query)
    # indexer-side docid handling: 0 and DOCID_MAX (UINT64_MAX) are
    # reserved sentinels and their rows never make the index
    # (src/sphinx.cpp DOCINFO_IDSIZE sentinels); duplicate docids keep
    # the first copy (docinfo sort dupe sweep).  Ids above 2^63-1 are
    # wrapped to negative longs downstream (build_indexes) and ordered
    # via the sign-bit bijection (plans/api._docid_ord).
    seen: set[int] = set()
    kept = []
    for r in rows:
        did = int(r[0])
        if did in (0, 2**64 - 1) or did in seen:
            continue
        seen.add(did)
        kept.append(r)
    rows = kept
    for v in src.get("sql_attr_uint", []):
        m = re.match(r"\s*(\w+)\s*:\s*(\d+)", v)
        if m and m.group(1) in cols:
            i, mask = cols.index(m.group(1)), (1 << int(m.group(2))) - 1
            for r in rows:
                r[i] = int(r[i]) & mask
    for name, kind, qsql in parse_mva_specs(src):
        if kind == "field":
            i = cols.index(name)
            for r in rows:
                r[i] = [
                    int(x) for x in re.split(r"[,\s]+", str(r[i])) if x
                ]
        else:
            qcols, qrows = fixture_select(test, qsql)
            by_doc: dict[int, list[int]] = {}
            for qr in qrows:
                by_doc.setdefault(int(qr[0]), []).append(int(qr[1]))
            cols = cols + [name]
            for r in rows:
                r.append(by_doc.get(int(r[0]), []))
    return cols, rows


def parse_killlist(test: RefTest, src: dict) -> list[int]:
    """sql_query_killlist -> docid list (literal SELECT n UNION ...
    or a fixture-table select)."""
    if (src.get("type", [""])[0] or "").strip() == "xmlpipe2":
        return list(xmlpipe_docset(src)["killlist"])
    q = src.get("sql_query_killlist", [None])[0]
    if not q:
        return []
    if re.search(r"\bFROM\b", q, re.I):
        _c, rows = fixture_select(test, q)
        return [int(r[0]) for r in rows]
    return [
        int(m.group(1))
        for m in re.finditer(r"SELECT\s+(-?\d+)", q, re.I)
    ]


def build_indexes(spark, test: RefTest):
    """[(name, SphinxIndex, killlist_ids)] for every non-distributed
    index section, in config order (searchd's local index iteration
    order)."""
    from pyspark.sql import functions as F

    from sphinx_1_spark.plans.engine import SphinxIndex

    src_secs = {n: v for k, n, _, v in test.sections if k == "source"}
    out = []
    for kind, name, _parent, icfg in test.sections:
        if kind != "index" or icfg.get("type", [""])[0] == "distributed":
            continue
        settings, _table, _name = make_index_settings(test, name)
        src = src_secs.get(icfg.get("source", [""])[0], {})
        cols, rows = index_rows(test, src)
        # SQL NULLs land as 0 / '' in the index (CSphSource_SQL
        # IterateHitsNext reads missing attrs as 0)
        for r in rows:
            for i, c in enumerate(cols):
                if r[i] is None:
                    r[i] = "" if c in settings.fields else 0
        # uint64 docids: 0 and DOCID_MAX are skipped by the indexer
        # ('zero/max document_id, skipping'); ids above 2^63-1 wrap
        # into negative longs and compare/order via the sign-bit
        # bijection (see plans/api._docid_ord)
        did_i = cols.index(settings.docid_col) if settings.docid_col in cols else 0
        rows = [
            r for r in rows
            if int(r[did_i]) not in (0, (1 << 64) - 1)
        ]
        for r in rows:
            v = int(r[did_i])
            if v >= 1 << 63:
                r[did_i] = v - (1 << 64)
        # unpack_zlib / unpack_mysqlcompress columns arrive as binary
        # and inflate through the engine's Arrow unpack stage
        unpack = {}
        for key, mysql in (("unpack_zlib", False),
                           ("unpack_mysqlcompress", True)):
            for cname in src.get(key, []):
                unpack[cname.strip()] = mysql
        if unpack:
            for r in rows:
                for i, c in enumerate(cols):
                    if c in unpack and isinstance(r[i], str):
                        r[i] = r[i].encode()
        if rows:
            df = spark.createDataFrame(
                [tuple(r) for r in rows], schema=cols
            )
        else:
            # WHERE matched nothing: infer the schema from the
            # unfiltered select, then truncate
            src2 = dict(src)
            src2["sql_query"] = [
                re.sub(
                    r"\s+WHERE\s.*$", "", src.get("sql_query", [""])[0],
                    flags=re.I | re.S,
                )
            ]
            cols, rows = index_rows(test, src2)
            if not rows:
                # even the unfiltered rows were sentinel-filtered
                # (docid 0 literals, test_64) — schema inference only
                cols, rows = fixture_select(
                    test, src2["sql_query"][0] or "SELECT *"
                )
            df = spark.createDataFrame(
                [tuple(r) for r in rows], schema=cols
            ).limit(0)
        # sql_attr_float stores FLOAT32 (docinfo rowitem) — golden
        # @geodist values reflect the narrowed inputs
        for v in src.get("sql_attr_float", []):
            cname = v.strip()
            if cname in df.columns:
                df = df.withColumn(cname, F.col(cname).cast("float"))
        if unpack:
            from sphinx_1_spark.sources.unpack import unpack_zlib_text

            for cname, mysql in unpack.items():
                if cname in df.columns:
                    df = df.withColumn(
                        cname,
                        F.coalesce(
                            unpack_zlib_text(
                                F.col(cname), mysql_compress=mysql
                            ),
                            F.lit(""),
                        ),
                    )
        mva_names = [n for n, _k, _q in parse_mva_specs(src)]
        docinfo = icfg.get("docinfo", ["extern"])[0].strip()
        if mva_names and docinfo != "extern":
            # "multi-valued attributes require docinfo=extern (fix your
            # config file)" (src/sphinx.cpp:8850-8852)
            raise ValueError(
                "multi-valued attributes require docinfo=extern"
            )
        idx = SphinxIndex.build(df, settings, persist=True)
        out.append(
            {
                "name": name,
                "idx": idx,
                "kill": parse_killlist(test, src),
                "df": df,
                "settings": settings,
                "mva": mva_names,
            }
        )
    return out


def apply_indexer_runs(spark, test: RefTest, built: list) -> list:
    """Replay <indexer><run> directives (ubertest RunIndexer):
    `--merge DST SRC [--merge-dst-range attr lo hi]` folds SRC into
    DST (CSphIndex_VLN::Merge, src/sphinx.cpp:9976): DST rows pass
    the dst-range filter and SRC's kill-list, SRC rows always carry
    over (same-docid DST copies superseded); global stats re-derive
    from the merged row set."""
    from sphinx_1_spark.plans.engine import SphinxIndex
    from pyspark.sql import functions as F

    by_name = {b["name"]: b for b in built}
    for run in getattr(test, "indexer_runs", []):
        m = re.match(
            r"\s*--merge\s+(\S+)\s+(\S+)"
            r"(?:\s+--merge-dst-range\s+(\S+)\s+(-?\d+)\s+(-?\d+))?",
            run,
        )
        if not m:
            raise ValueError(f"unsupported indexer run {run!r}")
        dst, src = by_name[m.group(1)], by_name[m.group(2)]
        # schemas must agree attr-for-attr (CSphSchema::CompareTo gate
        # in Merge, src/sphinx.cpp:9995-9996)
        if len(dst["df"].columns) != len(src["df"].columns) or set(
            dst["settings"].attrs
        ) != set(src["settings"].attrs):
            raise ValueError("merge: schema mismatch")
        if m.group(3) and not (dst["mva"] and src["mva"]):
            # empirical pin: the shipped 0.9.9 goldens mark every
            # --merge-dst-range run over MVA-less indexes failed
            # (test_27 st3/7/11/15) even though no explicit source
            # check was found; reproduced as a failure for parity
            raise ValueError("merge: dst-range over MVA-less indexes")
        dst_filter = None
        if m.group(3):
            dst_filter = F.col(m.group(3)).between(
                int(m.group(4)), int(m.group(5))
            )
        dst["idx"] = SphinxIndex.merge(
            dst["idx"],
            src["idx"],
            dst_filter=dst_filter,
            src_kill=src["kill"] or None,
        )
        # keep the row-level view aligned for bookkeeping (positional
        # rename: SQL-derived names can differ, test_64)
        dst["df"] = dst["df"].unionByName(src["df"].toDF(*dst["df"].columns))
    return built


# ----------------------------------------------------------------------
# runner + compare
# ----------------------------------------------------------------------

MODE_MAP = {
    "all": "all", "any": "any", "phrase": "phrase",
    "boolean": "boolean", "extended": "extended2", "extended2": "extended2",
}


# model.bin timestamps depend on the generation-time NOW(); a fixed
# plausible epoch keeps @custom / NOW() deterministic for replay
NOW_EPOCH = 1_300_000_000


def _parse_select(select: str | None) -> list[tuple[str, str]]:
    """SetSelect subset: 'expr AS alias, *' -> [(alias, expr)]."""
    out = []
    for part in re.split(r",(?![^(]*\))", select or ""):
        part = part.strip()
        if not part or part == "*":
            continue
        m = re.match(r"(.+?)\s+AS\s+`?(\w+)`?\s*$", part, re.I)
        if m:
            out.append((m.group(2), m.group(1).strip()))
        else:
            out.append((part, part))
    return out


def run_query(indexes, q: RefQuery, dist: dict | None = None):
    """-> result dict shaped like a model.bin entry (or {'error':...}).

    indexes: [(name, SphinxIndex, killlist_ids)] in config order;
    q.index picks a subset ('*' / absent = all, matching ubertest's
    RunQuery('*') default)."""
    from pyspark.sql import functions as F

    from sphinx_1_spark.plans.api import ApiQuery, api_query

    by_name = {n: (n, idx, kill) for n, idx, kill in indexes}
    if q.index:
        # a distributed index fans out to its agents' local indexes
        # (searchd.cpp distributed dispatch); agents serving the same
        # local index dedupe like any multi-index docid sweep, so the
        # name list resolves once per distinct local index
        names: list[str] = []
        for tok in re.split(r"[\s,]+", q.index.strip()):
            for n in (dist or {}).get(tok, [tok]):
                if n not in names:
                    names.append(n)
        try:
            chosen = [by_name[n] for n in names]
        except KeyError as e:
            return {"error": f"unknown local index '{e.args[0]}'"}
    else:
        chosen = list(indexes)

    mode = MODE_MAP[q.mode]
    filters = []
    is_mva = bool(chosen) and dict(
        chosen[0][1].docinfo.dtypes
    ).get(q.filter or "", "").startswith("array")
    if q.filter and q.filter_value is not None:
        # MVA filters match if ANY stored value qualifies
        # (MvaEval, src/sphinxfilter.cpp IFilter_MVA)
        filters.append(
            F.array_contains(F.col(q.filter), F.lit(q.filter_value))
            if is_mva
            else F.col(q.filter) == q.filter_value
        )
    if q.filter and q.filter_range:
        lo, hi = q.filter_range
        filters.append(
            F.exists(F.col(q.filter), lambda v: v.between(lo, hi))
            if is_mva
            else F.col(q.filter).between(lo, hi)
        )
    # model.bin goldens were scored with upstream-0.9.9's LINEAR
    # proximity_bm25 (see make_lcs_rank docstring)
    ranker = q.ranker
    if ranker is None and mode == "extended2":
        ranker = "proximity_bm25_linear"
    elif ranker == "proximity_bm25":
        # explicit SPH_RANK_PROXIMITY_BM25 in test.xml scored the same
        # upstream-linear way in the shipped goldens (test_37 q0)
        ranker = "proximity_bm25_linear"
    aq = ApiQuery(
        query=q.query,
        mode=mode,
        ranker=ranker,
        sortmode={"extended": "extended", "expr": "expr"}.get(
            q.sortmode or "", "relevance"
        ),
        sortby=q.sortby or "",
        groupattr=q.groupattr,
        # SPH_GROUPBY_DAY is enum 0 = the PHP-falsy default
        # (ubertest helpers.inc:450-466)
        groupfunc=q.groupfunc or "day",
        groupsort=q.groupsort,
        groupdistinct=q.groupdistinct,
        filters=filters or None,
        # uint64 range bounds clamp to LongType (documented deviation)
        id_range=q.id_range,
        cutoff=q.cutoff or 0,
        limit=20,
        # the PHP client never raises its default max_matches=1000
        # (sphinxapi.php SetLimits only honours $max>0); the config's
        # 100000 is just the server-side cap
        max_matches=1000,
        index_weights=q.index_weights,
        select=_parse_select(q.select),
        now_epoch=NOW_EPOCH,
        score_mode="exact32",
        geoanchor=q.geoanchor,
        late_filters=(
            [
                F.col(q.float_range[0]).between(
                    q.float_range[1], q.float_range[2]
                )
            ]
            if q.float_range
            else []
        ),
    )
    try:
        rows, meta = api_query(
            [(n, idx, kill or None) for n, idx, kill in chosen], aq
        )
    except Exception as e:  # parse errors etc.
        return {"error": str(e) or e.__class__.__name__}
    matches = []
    for r in rows:
        d = r.asDict()
        attrs = {
            k: v
            for k, v in d.items()
            if k not in ("docid", "weight", "_tag")
        }
        did = int(d["docid"])
        if did < 0:
            # uint64 docids above 2^63-1 live as wrapped longs
            did += 1 << 64
        matches.append((did, int(d["weight"]), attrs))
    return {
        "error": "",
        "matches": matches,
        "total": meta["total"],
        "total_found": meta["total_found"],
        "words": meta["words"],
    }


def _attr_eq(got, want) -> bool:
    """Model attr values arrive as PHP strings/floats; float32 round
    trips and ubertest roundoff make exact string compare too strict."""
    if isinstance(want, dict) and not want:
        # empty PHP array unserializes as {} — an empty MVA
        want = []
    if isinstance(want, dict):
        # non-empty int-keyed PHP array (MVA via resarray)
        want = list(want.values())
    if isinstance(want, (list, tuple)) or isinstance(got, (list, tuple)):
        gl = list(got) if isinstance(got, (list, tuple)) else [got]
        wl = list(want) if isinstance(want, (list, tuple)) else [want]
        return len(gl) == len(wl) and all(
            _attr_eq(g, w) for g, w in zip(gl, wl)
        )
    try:
        fg, fw = float(got), float(want)
    except (TypeError, ValueError):
        return str(got) == str(want)
    if fg == fw:
        return True
    return abs(fg - fw) <= max(1e-6, 2e-6 * abs(fw))


def compare_result(got: dict, want: dict, check_attrs: bool = True) -> list[str]:
    """Diff one query result vs one model.bin entry; [] if identical."""
    errs: list[str] = []
    want_err = want.get("error", "")
    if want_err:
        if not got.get("error"):
            errs.append(f"expected error {want_err!r}, got success")
        return errs
    if got.get("error"):
        errs.append(f"unexpected error: {got['error']!r}")
        return errs
    wm = want.get("matches") or {}
    if isinstance(wm, dict) and wm and all(
        isinstance(v, dict) and "id" in v for v in wm.values()
    ):
        # resarray=1 serialized as an int-keyed PHP list
        wm = list(wm.values())
    if isinstance(wm, list):
        # SetArrayResult(true): [{'id':..,'weight':..,'attrs':..}]
        want_matches = [
            (int(m["id"]), int(m["weight"]), m.get("attrs", {}))
            for m in wm
        ]
    else:
        want_matches = [
            (int(did), int(info["weight"]), info.get("attrs", {}))
            for did, info in wm.items()
        ]
    got_matches = got["matches"]
    if [(d, w) for d, w, _ in got_matches] != [(d, w) for d, w, _ in want_matches]:
        errs.append(
            f"matches differ: got {[(d, w) for d, w, _ in got_matches]} "
            f"want {[(d, w) for d, w, _ in want_matches]}"
        )
    elif check_attrs:
        for (gd, _, ga), (wd, _, wa) in zip(got_matches, want_matches):
            for k, v in (wa or {}).items():
                if k not in ga:
                    errs.append(f"doc {gd}: missing attr {k}")
                elif not _attr_eq(ga[k], v):
                    errs.append(f"doc {gd} attr {k}: got {ga[k]!r} want {v!r}")
    if int(want["total"]) != got["total"]:
        errs.append(f"total: got {got['total']} want {want['total']}")
    if int(want["total_found"]) != got["total_found"]:
        errs.append(
            f"total_found: got {got['total_found']} want {want['total_found']}"
        )
    for w, st in (want.get("words") or {}).items():
        # numeric-string PHP keys unserialize as ints
        gw = got["words"].get(w if isinstance(w, str) else str(w))
        if gw is None:
            errs.append(f"word stats missing for {w!r}")
        elif (gw["docs"], gw["hits"]) != (int(st["docs"]), int(st["hits"])):
            errs.append(
                f"word {w!r}: got ({gw['docs']},{gw['hits']}) "
                f"want ({st['docs']},{st['hits']})"
            )
    return errs


def replay(spark, test_id: str, subtest: int = 0,
           queries: list[int] | None = None) -> list[str]:
    """Run every query of one subtest; returns a flat diff list."""
    test = load_test(test_id, subtest=subtest)
    model_results = test.model[subtest]
    # ubertest records a whole-subtest indexer failure as the literal
    # string 'failed' (e.g. a field marked for both prefix and infix
    # indexing, src/sphinx.cpp:19163-19164)
    golden_failed = model_results in ("failed", ["failed"])
    if not golden_failed and len(test.queries) != len(model_results):
        # model.bin carries one entry per query; fewer parsed queries
        # means the test.xml query parser silently dropped some and a
        # "zero diffs" result would be vacuously narrow.  (PHP-driven
        # tests with zero <query> tags never reach replay — the sweep
        # declares them SKIP.)
        return [
            f"[{test_id} st{subtest}] parsed {len(test.queries)} queries "
            f"but the golden has {len(model_results)} entries — query "
            "parsing silently dropped some"
        ]
    try:
        built = apply_indexer_runs(
            spark, test, build_indexes(spark, test)
        )
        indexes = [(b["name"], b["idx"], b["kill"]) for b in built]
    except Exception as e:
        if golden_failed:
            return []
        return [f"[{test_id} st{subtest}] build failed: {e}"]
    dist_map: dict[str, list[str]] = {}
    for k, n, _h, v in test.sections:
        if k == "index" and (v.get("type", [""])[0] or "").strip() == "distributed":
            names: list[str] = []
            for a in v.get("agent", []):
                tail = a.strip().split(":")[-1]
                names.extend(s.strip() for s in tail.split(",") if s.strip())
            dist_map[n] = names
    if golden_failed:
        return [
            f"[{test_id} st{subtest}] golden expects indexer failure,"
            " build succeeded"
        ]
    errs: list[str] = []
    for qi, q in enumerate(test.queries):
        if queries is not None and qi not in queries:
            continue
        got = run_query(indexes, q, dist=dist_map)
        for e in compare_result(got, model_results[qi]):
            errs.append(f"[{test_id} st{subtest} q{qi} {q.query!r}] {e}")
    return errs


def replay_all(spark, test_id: str) -> list[str]:
    """Replay every subtest of a reference test (the Dynamic/Variant
    config matrix, helpers.inc:271 GenNextCfg)."""
    errs: list[str] = []
    for st in range(subtest_count(test_id)):
        errs.extend(replay(spark, test_id, subtest=st))
    return errs
