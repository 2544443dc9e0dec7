"""Differential fuzz of the sphinxexpr THREE-TYPE evaluation model.

`parse_expression` ports the reference's typed expression engine
(src/sphinxexpr.cpp:1444-1660 type deducer + the Eval chains) onto
Catalyst columns.  The existing pins are replay queries and fixed
gate expressions; none exercises *random* composition of the
promotion rules (int/int32 vs bigint vs float32), the float32
narrowing at node boundaries, C-style wraparound, or the operator
precedence ladder all at once.

Here: 150 randomly generated expression ASTs are

* rendered to strings using ONLY the documented precedence ladder
  (AND/OR < NOT < =/<> < rel < +/- < mul-div < unary minus,
  src/sphinxexpr.y) — so a precedence bug in either the renderer's
  assumptions or the parser shows up as a value diff;
* evaluated by an INDEPENDENT recursive oracle over the same rows,
  re-implementing the documented model with numpy float32 rounding,
  exact double intermediates and Java-style int32/int64 wraparound
  (spark.sql.ansi.enabled=false, see session.py);
* run through parse_expression -> Catalyst over a 64-row DataFrame.

Int/bigint results must match EXACTLY; float32 results to <=1 ulp
(binary32 +,-,* round identically through double; '/' carries the
documented 2^-29-rare double-rounding).  Expressions whose oracle
evaluation hits a poison case (non-finite float, IDIV by zero ->
NULL, out-of-int32 float casts) are regenerated — those semantics
are pinned separately, NaN/NULL ordering is Spark-specific.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from sphinx_1_spark.functions.exprparse import parse_expression

ATTRS = {"ai": "int", "bi": "int", "cb": "bigint", "df": "float"}

N_ROWS = 64


def _rows():
    rng = random.Random(20260819)
    rows = []
    for i in range(N_ROWS):
        rows.append(
            (
                i + 1,  # docid
                rng.randint(-50, 50),  # ai
                rng.choice((0, 1, 2, rng.randint(-9, 9))),  # bi: small, 0-heavy
                rng.choice(
                    (rng.randint(-50, 50), 3_000_000_000 + i, -3_000_000_000)
                ),  # cb: crosses int32
                rng.randint(-320, 320) / 8.0,  # df: exact in float32
            )
        )
    return rows


@pytest.fixture(scope="module")
def expr_df(spark):
    df = spark.createDataFrame(
        _rows(), "docid long, ai int, bi int, cb long, df float"
    )
    return df.cache()


# ------------------------------------------------------------------ AST
# nodes: ("num", text, type) ("attr", name, type) ("neg", x)
#        ("bin", op, l, r) ("cmp", op, l, r) ("andor", kw, l, r)
#        ("not", x) ("func", name, [args])

_INT_FUNCS = ("abs", "min", "max", "idiv", "if", "madd", "mul3")


def _widest(*ts):
    if all(t in ("int", "bigint") for t in ts):
        return "int" if all(t == "int" for t in ts) else "bigint"
    return "float"


def node_type(n):
    k = n[0]
    if k in ("num", "attr"):
        return n[2]
    if k == "neg":
        return node_type(n[1])
    if k == "bin":
        if n[1] == "/":
            return "float"
        return _widest(node_type(n[2]), node_type(n[3]))
    if k in ("cmp", "andor", "not"):
        return "int"
    if k == "func":
        name, args = n[1], n[2]
        argt = _widest(*(node_type(a) for a in args))
        if name in ("ceil", "floor"):
            return "float"
        if name == "bigint":
            return argt if argt == "float" else "bigint"
        if name in ("interval", "in"):
            return "int"
        return argt  # abs/min/max/idiv/if/madd/mul3
    raise AssertionError(k)


def gen(rng, depth=0, int_only=False):
    """Random typed AST; int_only restricts to int/bigint-typed nodes
    (AND/OR/NOT argument rule, sphinxexpr.cpp:1527,1546)."""
    r = rng.random()
    if depth >= 3 or r < 0.32:
        a = rng.random()
        if a < 0.45:
            name = rng.choice(("ai", "bi", "cb") if int_only else tuple(ATTRS))
            return ("attr", name, ATTRS[name])
        if a < 0.8 or int_only:
            v = rng.choice((0, 1, 2, 3, 7, rng.randint(-30, 30)))
            if rng.random() < 0.1:
                v = 3_000_000_000  # bigint literal (GetIntType)
            return ("num", str(v) if v >= 0 else f"({v})", "int" if -(2**31) <= v < 2**31 else "bigint")
        v = rng.randint(-160, 160) / 8.0
        return ("num", repr(abs(v)) if v >= 0 else f"({-abs(v)!r})", "float")
    if r < 0.55:
        op = rng.choice("+-*/" if not int_only else "+-*")
        return ("bin", op, gen(rng, depth + 1, int_only), gen(rng, depth + 1, int_only))
    if r < 0.68:
        op = rng.choice(("=", "<>", "<", ">", "<=", ">="))
        return ("cmp", op, gen(rng, depth + 1), gen(rng, depth + 1))
    if r < 0.74:
        kw = rng.choice(("and", "or"))
        return ("andor", kw, gen(rng, depth + 1, True), gen(rng, depth + 1, True))
    if r < 0.78:
        return ("not", gen(rng, depth + 1, True))
    if r < 0.84:
        return ("neg", gen(rng, depth + 1, int_only))
    name = rng.choice(_INT_FUNCS if int_only else _INT_FUNCS + (
        "ceil", "floor", "bigint", "interval", "in"))
    nargs = {"abs": 1, "ceil": 1, "floor": 1, "bigint": 1, "min": 2,
             "max": 2, "idiv": 2, "if": 3, "madd": 3, "mul3": 3}.get(name)
    if name == "interval":
        args = [gen(rng, depth + 1, int_only)] + [
            gen(rng, depth + 1, int_only) for _ in range(rng.randint(1, 3))
        ]
    elif name == "in":
        # IN()'s list is a constlist: each member must be a BARE
        # unsigned numeric literal (sphinxexpr.y:83-88 — attrs,
        # parens, even '-3' are syntax errors)
        def const(rng):
            if rng.random() < 0.25:
                return ("num", repr(rng.randint(0, 1280) / 8.0), "float")
            v = rng.choice(
                (0, 1, 2, 3, 7, rng.randint(0, 30), 3_000_000_000)
            )
            return (
                "num", str(v), "int" if v < 2**31 else "bigint"
            )

        # ...and the first arg is a BARE attr (sphinxexpr.y:93:
        # TOK_FUNC_IN '(' attr ',' constlist ')')
        first = rng.choice(tuple(ATTRS))
        args = [("attr", first, ATTRS[first])] + [
            const(rng) for _ in range(rng.randint(1, 3))
        ]
    else:
        args = [gen(rng, depth + 1, int_only) for _ in range(nargs)]
    n = ("func", name, args)
    if int_only and node_type(n) == "float":
        return ("attr", "ai", "int")  # fall back, keep int contract
    return n


# ------------------------------------------------------- string renderer
# precedence levels per the sphinxexpr.y ladder the parser documents
_LVL = {"andor": 1, "not": 2, "cmp_eq": 3, "cmp_rel": 4, "add": 5, "mul": 6,
        "neg": 7, "atom": 8}


def _lvl(n):
    k = n[0]
    if k in ("num", "attr", "func"):
        return _LVL["atom"]
    if k == "neg":
        return _LVL["neg"]
    if k == "bin":
        return _LVL["mul"] if n[1] in "*/" else _LVL["add"]
    if k == "cmp":
        return _LVL["cmp_eq"] if n[1] in ("=", "<>") else _LVL["cmp_rel"]
    if k == "andor":
        return _LVL["andor"]
    return _LVL["not"]


def render(n):
    k = n[0]
    if k == "num":
        return n[1]
    if k == "attr":
        return n[1]
    if k == "neg":
        x = render(n[1])
        if _lvl(n[1]) < _LVL["neg"]:
            x = f"({x})"
        return f"-{x}"
    if k in ("bin", "cmp", "andor"):
        op = {"andor": n[1].upper()}.get(k, n[1])
        my = _lvl(n)
        l, r = n[2], n[3]
        ls = render(l)
        if _lvl(l) < my:
            ls = f"({ls})"
        rs = render(r)
        # left-assoc: right operand at the same level needs parens
        if _lvl(r) <= my:
            rs = f"({rs})"
        return f"{ls} {op} {rs}" if k == "andor" else f"{ls}{op}{rs}"
    if k == "not":
        x = render(n[1])
        if _lvl(n[1]) < _LVL["not"]:
            x = f"({x})"
        return f"NOT {x}"
    if k == "func":
        return f"{n[1].upper()}({','.join(render(a) for a in n[2])})"
    raise AssertionError(k)


# ------------------------------------------------------------- oracle
I32, I64 = 1 << 31, 1 << 63


def _wrap(v, t):
    m = I32 if t == "int" else I64
    return ((int(v) + m) % (2 * m)) - m


def f32(x):
    return float(np.float32(x))


class Poison(Exception):
    pass


def _ck(x):
    if not math.isfinite(x):
        raise Poison
    return x


def ev(n, row):
    """Independent evaluator: (value, type) per the documented model."""
    k = n[0]
    if k == "num":
        t = n[2]
        return (float(n[1].strip("()")) if t == "float" else int(n[1].strip("()"))), t
    if k == "attr":
        return row[n[1]], n[2]
    if k == "neg":
        v, t = ev(n[1], row)
        return (_ck(f32(-v)), t) if t == "float" else (_wrap(-v, t), t)
    if k == "bin":
        (lv, lt), (rv, rt) = ev(n[2], row), ev(n[3], row)
        op = n[1]
        if op == "/":
            if f32(rv) == 0.0:
                raise Poison
            return _ck(f32(float(f32(lv)) / float(f32(rv)))), "float"
        t = _widest(lt, rt)
        if t == "float":
            a, b = float(f32(lv)), float(f32(rv))
            r = a + b if op == "+" else a - b if op == "-" else a * b
            return _ck(f32(r)), "float"
        r = lv + rv if op == "+" else lv - rv if op == "-" else lv * rv
        return _wrap(r, t), t
    if k == "cmp":
        (lv, lt), (rv, rt) = ev(n[2], row), ev(n[3], row)
        op = n[1]
        if _widest(lt, rt) == "float":
            a, b = f32(lv), f32(rv)
            if op == "=":
                c = abs(f32(float(a) - float(b))) <= 1e-6
            elif op == "<>":
                c = abs(f32(float(a) - float(b))) > 1e-6
            else:
                c = {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b}[op]
        else:
            c = {"=": lv == rv, "<>": lv != rv, "<": lv < rv,
                 ">": lv > rv, "<=": lv <= rv, ">=": lv >= rv}[op]
        return (1 if c else 0), "int"
    if k == "andor":
        (lv, _), (rv, _) = ev(n[2], row), ev(n[3], row)
        c = (lv != 0 and rv != 0) if n[1] == "and" else (lv != 0 or rv != 0)
        return (1 if c else 0), "int"
    if k == "not":
        v, _ = ev(n[1], row)
        return (1 if v == 0 else 0), "int"
    if k == "func":
        name, args = n[1], n[2]
        vals = [ev(a, row) for a in args]
        argt = _widest(*(t for _, t in vals))
        if name in ("ceil", "floor"):
            x = float(f32(vals[0][0]))
            r = math.ceil(x) if name == "ceil" else math.floor(x)
            return _ck(f32(float(r))), "float"
        if name == "abs":
            if argt == "float":
                return f32(abs(f32(vals[0][0]))), "float"
            return _wrap(abs(vals[0][0]), argt), argt
        if name == "bigint":
            return vals[0] if argt == "float" else (int(vals[0][0]), "bigint")
        if name in ("min", "max"):
            fn = min if name == "min" else max
            if argt == "float":
                return f32(fn(f32(v) for v, _ in vals)), "float"
            return fn(int(v) for v, _ in vals), argt
        if name == "idiv":
            if argt == "float":
                a, b = f32(vals[0][0]), f32(vals[1][0])
                if not (-I32 <= a < I32 and -I32 <= b < I32):
                    raise Poison  # float->int cast saturation territory
                a, b = int(a), int(b)
                if b == 0:
                    raise Poison  # engine yields NULL
                q = abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1)
                return f32(float(q)), "float"
            a, b = int(vals[0][0]), int(vals[1][0])
            if b == 0:
                raise Poison
            q = abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1)
            return _wrap(q, argt), argt
        if name == "if":
            cond = f32(vals[0][0]) if argt == "float" else int(vals[0][0])
            pick = vals[1][0] if cond != 0 else vals[2][0]
            return (f32(pick), "float") if argt == "float" else (
                _wrap(pick, argt), argt)
        if name in ("madd", "mul3"):
            if argt == "float":
                a, b, c = (float(f32(v)) for v, _ in vals)
                t1 = float(f32(a * b))
                r = t1 + c if name == "madd" else t1 * c
                return _ck(f32(r)), "float"
            a, b, c = (int(v) for v, _ in vals)
            r = a * b + c if name == "madd" else a * b * c
            return _wrap(r, argt), argt
        if name == "interval":
            if argt == "float":
                x = f32(vals[0][0])
                pts = [f32(v) for v, _ in vals[1:]]
            else:
                x = int(vals[0][0])
                pts = [int(v) for v, _ in vals[1:]]
            for i, p in enumerate(pts):
                if x < p:
                    return i, "int"
            return len(pts), "int"
        if name == "in":
            # comparison domain = the CONSTLIST's type (Expr_In_c<T>
            # on pConst->m_uRetType, sphinxexpr.cpp:1353-1359): float
            # member -> float (sticky), else GetIntType of the LAST
            # int member (ConstList_c::Add overwrites per member)
            member_ts = [t for _, t in vals[1:]]
            list_t = "float" if "float" in member_ts else member_ts[-1]
            if list_t == "float":
                x = f32(vals[0][0])
                cands = [f32(v) for v, _ in vals[1:]]
            else:
                lim = I32 if list_t == "int" else I64

                def toi(v, t):
                    if t == "float":
                        fv = f32(v)
                        if not (-lim <= fv < lim):
                            raise Poison  # C cast overflow is UB
                        return _wrap(int(fv), list_t)
                    return _wrap(int(v), list_t)

                x = toi(*vals[0])
                cands = [toi(v, t) for v, t in vals[1:]]
            return (1 if x in cands else 0), "int"
    raise AssertionError(n)


# ------------------------------------------------------------- the fuzz
def test_random_expressions_match_typed_oracle(spark, expr_df):
    rng = random.Random(4242)
    rows = [
        dict(zip(("docid", "ai", "bi", "cb", "df"), r)) for r in _rows()
    ]
    batch: list[tuple[str, str, list]] = []
    n_checked = 0
    seen_kinds: set[str] = set()

    def flush():
        nonlocal n_checked
        if not batch:
            return
        cols = []
        for j, (s, t, _exp) in enumerate(batch):
            col, got_t = parse_expression(s, ATTRS, docid_col="docid")
            assert got_t == t, f"type deducer: {s!r} -> {got_t}, oracle {t}"
            cols.append(col.alias(f"v{j}"))
        out = expr_df.orderBy("docid").select(*cols).collect()
        for j, (s, t, exp) in enumerate(batch):
            got = [r[f"v{j}"] for r in out]
            for rowi, (g, e) in enumerate(zip(got, exp)):
                if t == "float":
                    # <=1 ulp: '/' may double-round vs the oracle
                    ok = g == pytest.approx(e, abs=0.0) or (
                        abs(np.float32(g) - np.float32(e))
                        <= abs(np.spacing(np.float32(e)))
                    )
                else:
                    ok = g == e
                assert ok, (
                    f"{s!r} (type {t}) row {rowi}: engine {g!r} != oracle {e!r}"
                )
            n_checked += 1
        batch.clear()

    # crafted seeds guarantee every required kind appears regardless of
    # generator luck; they run through the same oracle + engine check
    _ai, _bi, _cb, _df = (("attr", n, ATTRS[n]) for n in ("ai", "bi", "cb", "df"))
    seeds = [
        ("func", "bigint", [("bin", "*", _ai, _bi)]),
        ("func", "bigint", [_df]),  # float passthrough (cpp:1615)
        # IN list members are bare numeric constants (constlist)
        ("func", "in", [_ai, ("num", "3", "int"), ("num", "1.5", "float")]),
        ("func", "in", [_df, ("num", "3000000000", "bigint"),
                        ("num", "1.5", "float")]),
        # the last-int-wins quirk: big const then small -> INT list
        ("func", "in", [_cb, ("num", "3000000000", "bigint"),
                        ("num", "5", "int")]),
        ("func", "interval", [_df, ("num", "3", "int"), ("num", "0", "int")]),
        ("func", "interval", [_ai, ("num", "3.5", "float")]),
        ("func", "idiv", [_cb, _ai]),
        ("func", "idiv", [_df, ("num", "2.5", "float")]),
        ("func", "madd", [_df, _ai, _cb]),
        ("func", "if", [("cmp", "<", _ai, _bi), _df, _cb]),
        ("func", "min", [_cb, ("neg", _ai)]),
        ("not", ("andor", "and", ("cmp", "=", _df, _df), _bi)),
    ]

    target = 150
    made = 0
    attempts = 0
    pending = list(seeds)
    while made < target and attempts < target * 30:
        attempts += 1
        ast = pending.pop(0) if pending else gen(rng)
        s = render(ast)
        try:
            exp = [ev(ast, row)[0] for row in rows]
        except Poison:
            continue
        def kinds(n):
            yield n[0] if n[0] != "func" else f"func:{n[1]}"
            for c in (n[2] if n[0] == "func" else n[1:]):
                if isinstance(c, tuple):
                    yield from kinds(c)
        seen_kinds.update(kinds(ast))
        batch.append((s, node_type(ast), exp))
        made += 1
        if len(batch) >= 15:
            flush()
    flush()
    assert n_checked >= 120, f"only {n_checked} clean expressions"
    # the generator exercised the whole surface under test
    for need in ("bin", "cmp", "andor", "not", "neg", "func:idiv",
                 "func:if", "func:interval", "func:in", "func:min",
                 "func:madd", "func:bigint"):
        assert need in seen_kinds, f"generator never produced {need}"
