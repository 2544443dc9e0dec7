"""Generative fuzz of the SphinxQL SELECT translator's clause wiring.

The translator (plans/sphinxql.py) is pinned by fixed gate queries and
the statement-soup robustness fuzz; nothing exercises *random
composition* of its clauses — WHERE condition stacks, GROUP BY with
aggregate lists, the WITHIN GROUP ORDER BY representative row, multi-
key ORDER BY, and the bounded-queue page window
(min(offset+limit, max_matches), src/searchd.cpp:4657-4850) — all at
once.

Here: 130 randomly generated SELECT statements over a 300-row
attribute relation are rendered to SQL, run through
`sphinxql(sql, df)`, and compared row-for-row against an independent
pure-Python oracle that re-implements the documented semantics
directly over the same rows (filter -> group/aggregate +
representative row -> order -> page).  Every ORDER BY ends in a
unique key (docid) so pages are deterministic on both sides.

MATCH() composition is fuzzed elsewhere (test_query_fuzz,
test_wand_fuzz, test_group_sorter_fuzz); this family targets the
plain-attribute statement surface.
"""

from __future__ import annotations

import math
import random

import pytest

from sphinx_1_spark.plans.sphinxql import SphinxQLError, sphinxql

N_ROWS = 300
COLS = ("docid", "grp", "tag", "price", "flag")


def _rows():
    rng = random.Random(20260819)
    rows = []
    for i in range(1, N_ROWS + 1):
        rows.append(
            {
                "docid": i,
                "grp": rng.randint(0, 9),
                "tag": rng.randint(-20, 20),
                "price": rng.randint(-400, 400) / 4.0,  # exact in f32
                "flag": rng.randint(0, 1),
            }
        )
    return rows


@pytest.fixture(scope="module")
def ql_df(spark):
    df = spark.createDataFrame(
        [tuple(r[c] for c in COLS) for r in _rows()],
        "docid long, grp int, tag int, price float, flag int",
    )
    return df.cache()


# ------------------------------------------------------------- generator
_AGGS = (
    ("COUNT(*)", "c"),
    ("SUM(tag)", "s"),
    ("MIN(tag)", "mn"),
    ("MAX(price)", "mx"),
    ("AVG(price)", "av"),
    ("COUNT(DISTINCT flag)", "cd"),
)


def gen_stmt(rng):
    """One random statement as a dict spec (rendered + evaluated from
    the same spec, so renderer and oracle cannot drift apart)."""
    conds = []
    for _ in range(rng.randint(0, 3)):
        col = rng.choice(("grp", "tag", "price", "flag", "docid"))
        kind = rng.random()
        if kind < 0.15:
            conds.append((col, "in", sorted(rng.sample(range(-20, 21), rng.randint(1, 4)))))
        elif kind < 0.3:
            lo = rng.randint(-15, 10)
            conds.append((col, "between", (lo, lo + rng.randint(0, 20))))
        else:
            op = rng.choice(("=", "!=", "<", ">", "<=", ">="))
            val = (
                rng.randint(0, 9) if col == "grp"
                else rng.randint(0, 1) if col == "flag"
                else rng.randint(1, N_ROWS) if col == "docid"
                else rng.randint(-20, 20)
            )
            conds.append((col, op, val))
    grouped = rng.random() < 0.45
    spec = {
        "conds": conds,
        "group": None,
        "aggs": [],
        "plain": [],
        "within": [],
        "order": [],
        "offset": rng.choice((0, 0, 0, 2, 5)),
        "limit": rng.choice((3, 7, 20, 50)),
        "max_matches": rng.choice((1000, 1000, 8, 25)),
    }
    if grouped:
        spec["group"] = "grp"
        spec["aggs"] = rng.sample(_AGGS, rng.randint(1, 3))
        if rng.random() < 0.5:
            # plain column -> representative-row path
            spec["plain"] = rng.sample(("tag", "price", "docid"), rng.randint(1, 2))
            spec["within"] = [
                (rng.choice(("tag", "price")), rng.random() < 0.5),
                ("docid", True),  # unique tiebreak
            ] if rng.random() < 0.7 else []
        order_keys = ["grp"] + [a for _e, a in spec["aggs"]]
        spec["order"] = [
            (rng.choice(order_keys), rng.random() < 0.5),
            ("grp", True),
        ]
    else:
        spec["plain"] = list(
            rng.sample(("docid", "grp", "tag", "price", "flag"), rng.randint(2, 4))
        )
        if "docid" not in spec["plain"]:
            spec["plain"].append("docid")
        spec["order"] = [
            (rng.choice(("tag", "price", "grp")), rng.random() < 0.5),
            ("docid", True),
        ]
    return spec


def render(spec):
    sel = []
    if spec["group"]:
        sel.append(spec["group"])
        sel += [f"{e} AS {a}" for e, a in spec["aggs"]]
        sel += [p for p in spec["plain"] if p != spec["group"]]
    else:
        sel += spec["plain"]
    sql = f"SELECT {', '.join(sel)} FROM t"
    parts = []
    for col, op, val in spec["conds"]:
        if op == "in":
            parts.append(f"{col} IN ({','.join(map(str, val))})")
        elif op == "between":
            parts.append(f"{col} BETWEEN {val[0]} AND {val[1]}")
        else:
            parts.append(f"{col} {op} {val}")
    if parts:
        sql += " WHERE " + " AND ".join(parts)
    if spec["group"]:
        sql += f" GROUP BY {spec['group']}"
        if spec["within"]:
            wo = ", ".join(
                f"{c} {'ASC' if asc else 'DESC'}" for c, asc in spec["within"]
            )
            sql += f" WITHIN GROUP ORDER BY {wo}"
    ob = ", ".join(f"{c} {'ASC' if asc else 'DESC'}" for c, asc in spec["order"])
    sql += f" ORDER BY {ob} LIMIT {spec['offset']},{spec['limit']}"
    if spec["max_matches"] != 1000:
        sql += f" OPTION max_matches={spec['max_matches']}"
    return sql


# ------------------------------------------------------------- oracle
def _pass(row, conds):
    for col, op, val in conds:
        v = row[col]
        ok = (
            v in val if op == "in"
            else val[0] <= v <= val[1] if op == "between"
            else v == val if op == "="
            else v != val if op == "!="
            else v < val if op == "<"
            else v > val if op == ">"
            else v <= val if op == "<="
            else v >= val
        )
        if not ok:
            return False
    return True


def _agg(expr, rows):
    if expr == "COUNT(*)":
        return len(rows)
    fn, col = expr.rstrip(")").split("(")
    if fn == "COUNT":  # COUNT(DISTINCT col)
        return len({r[col.split()[-1]] for r in rows})
    vals = [r[col] for r in rows]
    if fn == "SUM":
        return sum(vals)
    if fn == "MIN":
        return min(vals)
    if fn == "MAX":
        return max(vals)
    return sum(vals) / len(vals)  # AVG


def oracle(spec, rows):
    kept = [r for r in rows if _pass(r, spec["conds"])]
    if spec["group"]:
        groups: dict[int, list[dict]] = {}
        for r in kept:
            groups.setdefault(r[spec["group"]], []).append(r)
        out = []
        for g, members in groups.items():
            rec = {spec["group"]: g}
            for e, a in spec["aggs"]:
                rec[a] = _agg(e, members)
            if spec["plain"]:
                within = spec["within"] or [("docid", True)]
                best = min(
                    members,
                    key=lambda r: tuple(
                        (r[c] if asc else -r[c]) for c, asc in within
                    ),
                )
                for p in spec["plain"]:
                    if p != spec["group"]:
                        rec[p] = best[p]
            out.append(rec)
    else:
        # ORDER BY keys may reference non-selected attrs (the engine
        # sorts the match set, projection only shapes output — Spark's
        # ResolveMissingReferences mirrors the reference here): sort on
        # the full row, project after
        kept.sort(
            key=lambda r: tuple(
                (r[c] if asc else -r[c]) for c, asc in spec["order"]
            )
        )
        out = [{c: r[c] for c in spec["plain"]} for r in kept]
        page_end = min(spec["offset"] + spec["limit"], spec["max_matches"])
        return out[spec["offset"]:page_end]
    out.sort(
        key=lambda rec: tuple(
            (rec[c] if asc else -rec[c]) for c, asc in spec["order"]
        )
    )
    page_end = min(spec["offset"] + spec["limit"], spec["max_matches"])
    return out[spec["offset"]:page_end]


def _cmp(a, b):
    if isinstance(a, float) or isinstance(b, float):
        return math.isclose(float(a), float(b), rel_tol=1e-6, abs_tol=1e-6)
    return a == b


def test_random_selects_match_python_oracle(spark, ql_df):
    rng = random.Random(8642)
    rows = _rows()
    n_grouped = n_within = n_cut = n_filtered = 0
    for i in range(130):
        spec = gen_stmt(rng)
        sql = render(spec)
        want = oracle(spec, rows)
        got_rows = sphinxql(sql, ql_df).collect()
        got = [r.asDict() for r in got_rows]
        assert len(got) == len(want), (
            f"stmt {i}: {sql}\nrows {len(got)} != oracle {len(want)}"
        )
        for j, (g, w) in enumerate(zip(got, want)):
            assert set(g) == set(w), (sql, g, w)
            for k in w:
                assert _cmp(g[k], w[k]), (
                    f"stmt {i}: {sql}\nrow {j} col {k}: engine {g[k]!r}"
                    f" != oracle {w[k]!r}\n{g} vs {w}"
                )
        n_grouped += bool(spec["group"])
        n_within += bool(spec["within"])
        kept = sum(_pass(r, spec["conds"]) for r in rows)
        n_filtered += kept < N_ROWS
        full = (
            len({r[spec["group"]] for r in rows if _pass(r, spec["conds"])})
            if spec["group"] else kept
        )
        n_cut += full > min(
            spec["offset"] + spec["limit"], spec["max_matches"]
        )
    assert n_grouped >= 35 and n_within >= 12, (n_grouped, n_within)
    assert n_cut >= 40 and n_filtered >= 60, (n_cut, n_filtered)


def test_offset_past_max_matches_is_the_reference_error(ql_df):
    # CheckQuery (src/searchd.cpp:2994)
    with pytest.raises(SphinxQLError, match="offset out of bounds"):
        sphinxql(
            "SELECT docid FROM t ORDER BY docid ASC "
            "LIMIT 30,5 OPTION max_matches=25",
            ql_df,
        )
