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
    index: str | None = None
    expect_error: bool = False
    cutoff: int | None = None
    id_range: tuple[int, int] | None = None


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
            queries.append(
                RefQuery(
                    query=q.text or "",
                    mode=a.get("mode") or "all",
                    ranker=a.get("ranker") or None,
                    filter=a.get("filter") or None,
                    filter_value=int(a["filter_value"]) if a.get("filter_value") else None,
                    filter_range=_parse_range(a.get("filter_range")),
                    sortmode=a.get("sortmode") or None,
                    sortby=a.get("sortby") or None,
                    groupattr=a.get("groupattr") or None,
                    groupfunc=a.get("groupfunc") or None,
                    groupsort=a.get("groupsort") or "@group desc",
                    index=a.get("index") or None,
                    expect_error=bool(a.get("expect_error")),
                    cutoff=int(a["cutoff"]) if a.get("cutoff") else None,
                    id_range=_parse_range(a.get("id_range")),
                )
            )
    else:
        # legacy v1 format: <Query><Query_0>text</Query_0>...</Query>,
        # every query runs in default mode = SPH_MATCH_ALL with the
        # default ranker (helpers.inc:495-500)
        legacy = _ci_first(r, "query")
        if legacy is not None:
            for q in _ci_children(legacy):
                queries.append(RefQuery(query="".join(q.itertext())))
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
    test.sections = parse_config(cfg)
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

def parse_create(sql: str) -> tuple[str, list[str]]:
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
        cols.append(mm.group(1))
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
            for item in re.split(r",(?=(?:[^']*'[^']*')*[^']*$)", body):
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
                j = i
                while j < n and rest[j] not in ",)":
                    j += 1
                tok = rest[i:j].strip()
                if re.fullmatch(r"-?\d+", tok):
                    row.append(int(tok))
                elif re.fullmatch(r"-?\d*\.\d+(e-?\d+)?", tok, re.I):
                    row.append(float(tok))
                elif tok.upper() == "NULL":
                    row.append(None)
                else:
                    row.append(tok)
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


def fixture_tables(test: RefTest) -> dict[str, tuple[list[str], list[list]]]:
    """{table: (cols, rows)} with INSERT col lists resolved."""
    tables: dict[str, list[str]] = {}
    for c in test.creates:
        for stmt in re.split(r";\s*(?=CREATE)", c, flags=re.I):
            if re.search(r"CREATE\s+TABLE", stmt, re.I):
                t, cols = parse_create(stmt)
                tables[t] = cols
    out: dict[str, tuple[list[str], list[list]]] = {}
    for ins in test.inserts:
        t, cols, rows = parse_insert_values(ins)
        cols = cols or tables[t]
        if t in out:
            assert out[t][0] == cols
            out[t][1].extend(rows)
        else:
            out[t] = (cols, list(rows))
    return out


# ----------------------------------------------------------------------
# settings mapping
# ----------------------------------------------------------------------

ATTR_KEYS = (
    "sql_attr_uint", "sql_attr_bigint", "sql_attr_float",
    "sql_attr_timestamp", "sql_attr_bool", "sql_attr_str2ordinal",
)


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
    sql_query = (src.get("sql_query", [""])[0]) or "SELECT *"
    tabs = fixture_tables(test)
    mm = re.match(r"SELECT\s+(.*?)\s+FROM\s+(\w+)", sql_query, re.I | re.S)
    table = mm.group(2) if mm else next(iter(tabs))
    sel = mm.group(1).strip() if mm else "*"
    all_cols = tabs[table][0]
    if sel == "*":
        cols = list(all_cols)
    else:
        cols = [re.sub(r".*\s+AS\s+`?(\w+)`?$", r"\1", c.strip(), flags=re.I)
                for c in sel.split(",")]
        cols = [re.sub(r"`", "", c).strip() for c in cols]
    attrs = []
    for ak in ATTR_KEYS:
        for v in src.get(ak, []):
            attrs.append(v.strip())
    docid = cols[0]
    fields = tuple(c for c in cols[1:] if c not in attrs)

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
    )
    return settings, table, name


# ----------------------------------------------------------------------
# runner + compare
# ----------------------------------------------------------------------

MODE_MAP = {
    "all": "all", "any": "any", "phrase": "phrase",
    "boolean": "boolean", "extended": "extended2", "extended2": "extended2",
}


def build_index(spark, test: RefTest, index_name: str | None = None):
    from sphinx_1_spark.plans.engine import SphinxIndex

    settings, table, _ = make_index_settings(test, index_name)
    cols, rows = fixture_tables(test)[table]
    df = spark.createDataFrame([tuple(r) for r in rows], schema=cols)
    return SphinxIndex.build(df, settings, persist=True)


def run_query(idx, q: RefQuery):
    """-> result dict shaped like a model.bin entry (or {'error': ...})."""
    from pyspark.sql import functions as F

    mode = MODE_MAP[q.mode]
    filters = []
    if q.filter and q.filter_value is not None:
        filters.append(F.col(q.filter) == q.filter_value)
    if q.filter and q.filter_range:
        filters.append(F.col(q.filter).between(*q.filter_range))
    if q.id_range:
        filters.append(F.col("docid").between(*q.id_range))
    try:
        # model.bin goldens were scored with upstream-0.9.9's LINEAR
        # proximity_bm25 (see make_lcs_rank docstring)
        ranker = q.ranker
        if ranker is None and mode == "extended2":
            ranker = "proximity_bm25_linear"
        rows, meta = idx.search_with_meta(
            q.query,
            mode=mode,
            ranker=ranker,
            limit=20,
            # ubertest.php runs searchd with max_matches=100000
            max_matches=100000,
            score_mode="exact32",
            filters=filters or None,
            with_attrs=bool(idx.settings.attrs),
        )
    except Exception as e:  # parse errors etc.
        return {"error": str(e) or e.__class__.__name__}
    matches = []
    for r in rows:
        attrs = {a: r[a] for a in idx.settings.attrs}
        matches.append((int(r["docid"]), int(r["weight"]), attrs))
    return {
        "error": "",
        "matches": matches,
        "total": meta["total"],
        "total_found": meta["total_found"],
        "words": meta["words"],
    }


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
    want_matches = [(int(did), int(info["weight"]), info.get("attrs", {}))
                    for did, info in wm.items()]
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
                elif str(ga[k]) != str(v):
                    errs.append(f"doc {gd} attr {k}: got {ga[k]!r} want {v!r}")
    if int(want["total"]) != got["total"]:
        errs.append(f"total: got {got['total']} want {want['total']}")
    if int(want["total_found"]) != got["total_found"]:
        errs.append(
            f"total_found: got {got['total_found']} want {want['total_found']}"
        )
    for w, st in (want.get("words") or {}).items():
        gw = got["words"].get(w)
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
    try:
        idx = build_index(spark, test)
    except Exception as e:
        if golden_failed:
            return []
        return [f"[{test_id} st{subtest}] build failed: {e}"]
    if golden_failed:
        return [
            f"[{test_id} st{subtest}] golden expects indexer failure,"
            " build succeeded"
        ]
    errs: list[str] = []
    for qi, q in enumerate(test.queries):
        if queries is not None and qi not in queries:
            continue
        got = run_query(idx, q)
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
