"""Sphinx expression-string parser -> typed Catalyst columns.

Port of the reference's expression engine FRONT END (ExprParser_t,
src/sphinxexpr.y grammar + src/sphinxexpr.cpp:1444-1660 type deducer):
the string forms accepted by SetSortMode(SPH_SORT_EXPR), SetSelect()
and SphinxQL arithmetic.  The BACK END is Catalyst: every node
compiles to a native Spark SQL Column (whole-stage codegen, no UDFs),
with the reference's three-type evaluation model reproduced exactly:

* every node carries a return type - 'int' (int32), 'bigint' (int64)
  or 'float' (float32) - per GetWidestRet (sphinxexpr.cpp:1444):
  int-ish args compute in the widest int type, anything else floats;
* '/' always computes in float (Expr_Div_c, :241); IDIV is the
  integer division (:242, float args narrowed through int32 first);
* float comparisons use the 1e-6 epsilon for =/<> (Expr_Eq/Ne :248);
  comparisons and AND/OR/NOT return int 1/0, AND/OR/NOT demand
  integer args (parse error otherwise, :1527,1546);
* functions return float by default; NOW/INTERVAL/IN return int;
  MIN/MAX/MADD/MUL3/ABS/IDIV return their arg type; BIGINT() is the
  int64 type-enforcer that silently ignores floats; IF returns its
  (widest) arg type (:1602-1620);
* float math narrows to float32 at every node boundary, matching the
  reference's float Eval() chain - int attrs entering a float op go
  through (float) first, exactly like Expr_GetInt_c::Eval (:42);
* LOG2/LOG10 are log(x)*M_LOG2E / *M_LOG10E like the reference
  (:200-201), not the correctly-rounded log2/log10.

Schema comes in as {attr_name: 'int'|'bigint'|'float'|'mva'};
@id / @weight pseudo-attrs follow AddNodeID/AddNodeWeight
(:1490-1506): @id is bigint on id64 builds else int, @weight int.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from sphinx_1_spark.functions.exprs import geodist

_SPARK_T = {"int": "int", "bigint": "long", "float": "float"}

M_LOG2E = math.log2(math.e)
M_LOG10E = math.log10(math.e)


class ExprParseError(ValueError):
    pass


def _widest(*types: str) -> str:
    """GetWidestRet (src/sphinxexpr.cpp:1444-1459)."""
    if all(t in ("int", "bigint") for t in types):
        return "int" if all(t == "int" for t in types) else "bigint"
    return "float"


_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+)
    | (?P<ident>[@a-zA-Z_][a-zA-Z0-9_]*)
    | (?P<op><=|>=|<>|[-+*/(),<>=])
    )""",
    re.X,
)

# g_dFuncs (src/sphinxexpr.cpp:325-353): name -> arg count
# (negative = "at least n")
_FUNCS = {
    "now": 0, "abs": 1, "ceil": 1, "floor": 1, "sin": 1, "cos": 1,
    "ln": 1, "log2": 1, "log10": 1, "exp": 1, "sqrt": 1, "bigint": 1,
    "min": 2, "max": 2, "pow": 2, "idiv": 2, "if": 3, "madd": 3,
    "mul3": 3, "interval": -2, "in": -1, "geodist": 4,
}


def _lex(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None:
            if s[pos:].strip():
                raise ExprParseError(f"lex error near {s[pos:pos+10]!r}")
            break
        pos = m.end()
        if m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("ident") is not None:
            out.append(("ident", m.group("ident").lower()))
        else:
            out.append(("op", m.group("op")))
    return out


class _P:
    """Recursive-descent over the sphinxexpr.y precedence ladder:
    AND/OR < NOT < =/<> < rel < +/- < */ < unary minus."""

    def __init__(self, toks, attr_types, docid_col, weight_col,
                 now_epoch, id64):
        self.toks = toks
        self.i = 0
        self.attrs = attr_types
        self.docid_col = docid_col
        self.weight_col = weight_col
        self.now_epoch = now_epoch
        self.id64 = id64

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def accept_op(self, *ops):
        k, v = self.peek()
        if k == "op" and v in ops:
            self.i += 1
            return v
        return None

    def accept_kw(self, *kws):
        k, v = self.peek()
        if k == "ident" and v in kws:
            self.i += 1
            return v
        return None

    # -- typed-column helpers ------------------------------------------

    @staticmethod
    def _cast(node, t):
        col, nt = node
        # MVA attrs are legal ONLY as IN()'s first argument (which
        # never routes through _cast) — everywhere else the reference
        # rejects them at parse time (sphinxexpr.y attr rule), so fail
        # with the parser's message instead of a KeyError/cast error
        if nt == "mva" or t == "mva":
            raise ExprParseError(
                "MVA attribute is only legal as the first IN() argument"
            )
        if nt == t:
            return col
        return col.cast(_SPARK_T[t])

    def _float_op(self, l, r, fn):
        """Float binary op: float32 operands, double math, float32
        result (the reference's divss/addss chain; double-rounding is
        exact for +,-,* over binary32 and 2^-29-rare for /)."""
        lc = self._cast(l, "float").cast("double")
        rc = self._cast(r, "float").cast("double")
        return fn(lc, rc).cast("float")

    # -- grammar -------------------------------------------------------

    def parse(self):
        node = self.expr_andor()
        if self.peek() != (None, None):
            raise ExprParseError(f"trailing input at {self.peek()!r}")
        return node

    def expr_andor(self):
        l = self.expr_not()
        while True:
            kw = self.accept_kw("and", "or")
            if not kw:
                return l
            r = self.expr_not()
            t = _widest(l[1], r[1])
            if t == "float":
                raise ExprParseError(
                    f"{kw.upper()} arguments must be integer"
                )
            lc, rc = self._cast(l, t), self._cast(r, t)
            cond = (
                (lc != 0) & (rc != 0) if kw == "and"
                else (lc != 0) | (rc != 0)
            )
            l = (F.when(cond, 1).otherwise(0).cast("int"), "int")

    def expr_not(self):
        if self.accept_kw("not"):
            arg = self.expr_not()
            if arg[1] == "float":
                raise ExprParseError("NOT argument must be integer")
            c = self._cast(arg, arg[1])
            return (F.when(c == 0, 1).otherwise(0).cast("int"), "int")
        return self.expr_eq()

    def _cmp(self, l, r, op):
        t = _widest(l[1], r[1])
        if t == "float":
            lc, rc = self._cast(l, "float"), self._cast(r, "float")
            if op == "=":
                cond = F.abs(lc - rc) <= 1e-6
            elif op == "<>":
                cond = F.abs(lc - rc) > 1e-6
            else:
                cond = {
                    "<": lc < rc, ">": lc > rc,
                    "<=": lc <= rc, ">=": lc >= rc,
                }[op]
        else:
            lc, rc = self._cast(l, t), self._cast(r, t)
            cond = {
                "=": lc == rc, "<>": lc != rc, "<": lc < rc,
                ">": lc > rc, "<=": lc <= rc, ">=": lc >= rc,
            }[op]
        return (F.when(cond, 1).otherwise(0).cast("int"), "int")

    def expr_eq(self):
        l = self.expr_rel()
        while True:
            op = self.accept_op("=", "<>")
            if not op:
                return l
            l = self._cmp(l, self.expr_rel(), op)

    def expr_rel(self):
        l = self.expr_add()
        while True:
            op = self.accept_op("<", ">", "<=", ">=")
            if not op:
                return l
            l = self._cmp(l, self.expr_add(), op)

    def _arith(self, l, r, op):
        t = _widest(l[1], r[1])
        fn = {
            "+": lambda a, b: a + b,
            "-": lambda a, b: a - b,
            "*": lambda a, b: a * b,
        }[op]
        if t == "float":
            return (self._float_op(l, r, fn), "float")
        return (fn(self._cast(l, t), self._cast(r, t)).cast(_SPARK_T[t]), t)

    def expr_add(self):
        l = self.expr_mul()
        while True:
            op = self.accept_op("+", "-")
            if not op:
                return l
            l = self._arith(l, self.expr_mul(), op)

    def expr_mul(self):
        l = self.expr_unary()
        while True:
            op = self.accept_op("*", "/")
            if not op:
                return l
            r = self.expr_unary()
            if op == "*":
                l = self._arith(l, r, op)
            else:
                # Expr_Div_c (src/sphinxexpr.cpp:241): always float
                l = (self._float_op(l, r, lambda a, b: a / b), "float")

    def expr_unary(self):
        if self.accept_op("-"):
            col, t = self.expr_unary()
            if t == "mva":
                raise ExprParseError(
                    "MVA attribute is only legal as the first IN() argument"
                )
            return ((-col).cast(_SPARK_T[t]), t)
        return self.primary()

    def primary(self):
        k, v = self.next()
        if k == "num":
            if re.fullmatch(r"\d+", v):
                i = int(v)
                # GetIntType (src/sphinxexpr.cpp:361)
                t = "int" if -(2**31) <= i < 2**31 else "bigint"
                return (F.lit(i).cast(_SPARK_T[t]), t)
            return (F.lit(float(v)).cast("float"), "float")
        if k == "op" and v == "(":
            node = self.expr_andor()
            if not self.accept_op(")"):
                raise ExprParseError("expected ')'")
            return node
        if k == "ident":
            if v in _FUNCS and self.accept_op("("):
                return self.func(v)
            return self.attr(v)
        raise ExprParseError(f"unexpected token {v!r}")

    def attr(self, name):
        if name == "@id":
            t = "bigint" if self.id64 else "int"
            return (F.col(self.docid_col).cast(_SPARK_T[t]), t)
        if name in ("@weight", "@relevance", "@rank"):
            return (F.col(self.weight_col).cast("int"), "int")
        t = self.attrs.get(name)
        if t is None:
            raise ExprParseError(f"unknown identifier '{name}'")
        if t == "mva":
            raise ExprParseError(
                f"attribute '{name}' is MVA, only IN() supports it"
            )
        if t in ("bool", "timestamp"):
            t = "int"
        return (F.col(name).cast(_SPARK_T[t]), t)

    def func(self, name):
        args = []
        if not self.accept_op(")"):
            if name == "in":
                # the grammar's IN first arg is a BARE attr / @id /
                # MVA attr, never a general expression or constant
                # (sphinxexpr.y:93-105: TOK_FUNC_IN '(' attr ...)
                k, v = self.peek()
                if k != "ident" or v in _FUNCS:
                    raise ExprParseError(
                        "syntax error in IN(): first argument must be "
                        f"an attribute (got {v!r})"
                    )
                self.next()
                args.append(self.attr(v))
            else:
                args.append(self.expr_andor())
            while self.accept_op(","):
                if name == "in":
                    # IN()'s list is a constlist in the reference
                    # grammar: each member must be a BARE unsigned
                    # numeric literal — attrs, parens, even '-3' are
                    # syntax errors (sphinxexpr.y:83-88,93-105:
                    # "expecting TOK_CONST_INT or TOK_CONST_FLOAT")
                    k, v = self.peek()
                    if k != "num":
                        raise ExprParseError(
                            "syntax error, expecting TOK_CONST_INT or "
                            f"TOK_CONST_FLOAT near {v!r} (IN() list "
                            "members must be numeric constants)"
                        )
                args.append(self.expr_andor())
            if not self.accept_op(")"):
                raise ExprParseError(f"expected ')' after {name}()")
        want = _FUNCS[name]
        if want >= 0 and len(args) != want:
            raise ExprParseError(
                f"{name}() called with {len(args)} args, {want} expected"
            )
        if want < 0 and len(args) < -want:
            raise ExprParseError(
                f"{name}() called with {len(args)} args,"
                f" at least {-want} expected"
            )
        argt = _widest(*[a[1] for a in args]) if args else "int"

        if name == "now":
            if self.now_epoch is None:
                raise ExprParseError("NOW() needs a pinned epoch")
            return (F.lit(int(self.now_epoch)).cast("int"), "int")
        if name in ("ceil", "floor", "sin", "cos", "ln", "log2",
                    "log10", "exp", "sqrt"):
            x = self._cast(args[0], "float").cast("double")
            col = {
                "ceil": lambda: F.ceil(x).cast("double"),
                "floor": lambda: F.floor(x).cast("double"),
                "sin": lambda: F.sin(x),
                "cos": lambda: F.cos(x),
                "ln": lambda: F.log(x),
                "log2": lambda: F.log(x) * M_LOG2E,
                "log10": lambda: F.log(x) * M_LOG10E,
                "exp": lambda: F.exp(x),
                "sqrt": lambda: F.sqrt(x),
            }[name]()
            return (col.cast("float"), "float")
        if name == "abs":
            if argt == "float":
                return (F.abs(self._cast(args[0], "float")), "float")
            return (F.abs(self._cast(args[0], argt)), argt)
        if name == "bigint":
            # type-enforcer; silently ignores floats (sphinxexpr.cpp:1615)
            if argt == "float":
                return args[0]
            return (self._cast(args[0], "bigint"), "bigint")
        if name in ("min", "max"):
            fn = F.least if name == "min" else F.greatest
            if argt == "float":
                return (
                    fn(*(self._cast(a, "float") for a in args)), "float"
                )
            return (fn(*(self._cast(a, argt) for a in args)), argt)
        if name == "pow":
            return (
                self._float_op(args[0], args[1], lambda a, b: F.pow(a, b)),
                "float",
            )
        if name == "idiv":
            # Spark's integral `div` truncates toward zero like C++
            # int64 division — routing through double lost exactness
            # above 2^53 (IDIV(9007199254740993, 1) came back off by
            # one); reference is INT64FIRST / INT64SECOND exact
            # (sphinxexpr.cpp:242)
            if argt == "float":
                # (float)(int(FIRST)/int(SECOND)) (sphinxexpr.cpp:242)
                a = self._cast(args[0], "float").cast("int")
                b = self._cast(args[1], "float").cast("int")
                q = F.when(b != 0, F.call_function("div", a, b))
                return (q.cast("float"), "float")
            a, b = self._cast(args[0], argt), self._cast(args[1], argt)
            q = F.when(b != 0, F.call_function("div", a, b))
            return (q.cast(_SPARK_T[argt]), argt)
        if name == "if":
            cond = self._cast(args[0], argt)
            b, c = self._cast(args[1], argt), self._cast(args[2], argt)
            return (
                F.when(cond != 0, b).otherwise(c).cast(_SPARK_T[argt]),
                argt,
            )
        if name in ("madd", "mul3"):
            a, b, c = (self._cast(x, argt) for x in args)
            col = a * b + c if name == "madd" else a * b * c
            if argt == "float":
                # float path evaluates in float32 chain
                a, b, c = (
                    self._cast(x, "float").cast("double") for x in args
                )
                col = (
                    (a * b).cast("float").cast("double") + c if name == "madd"
                    else ((a * b).cast("float").cast("double") * c)
                )
                return (col.cast("float"), "float")
            return (col.cast(_SPARK_T[argt]), argt)
        if name == "interval":
            # Expr_Interval (src/sphinxexpr.cpp:1030-1053, dispatch
            # :1308-1330): compares in the COMBINED (widest) arg type
            # — INTERVAL(int_attr, 3.5) evaluates 3 < 3.5 as floats —
            # and the linear scan returns the FIRST i with
            # val < point_i (else N), so an unsorted point list keeps
            # the reference's first-match answer
            x = self._cast(args[0], argt)
            chain = None
            for i, p in enumerate(args[1:]):
                cond = x < self._cast(p, argt)
                chain = (
                    F.when(cond, F.lit(i))
                    if chain is None
                    else chain.when(cond, F.lit(i))
                )
            out = chain.otherwise(F.lit(len(args) - 1))
            return (out.cast("int"), "int")
        if name == "in":
            t0 = args[0][1]
            if t0 == "mva":
                vals = F.array(*[self._cast(a, "bigint") for a in args[1:]])
                cond = F.arrays_overlap(args[0][0], vals)
            else:
                # the comparison domain is the CONSTLIST's type, not
                # the arg's (Expr_In_c<T> dispatches on
                # pConst->m_uRetType, src/sphinxexpr.cpp:1353-1359):
                # any float member makes it float (sticky,
                # ConstList_c::Add :389-399); otherwise the int type
                # is GetIntType of the LAST int added (:378-381
                # overwrites per member — '3000000000, 5' is an INT
                # list that wraps the big const, '5, 3000000000' is
                # BIGINT).  The arg then evaluates in that domain
                # (IntEval truncates floats / wraps int64, C casts).
                member_ts = [a[1] for a in args[1:]]
                list_t = (
                    "float" if "float" in member_ts else member_ts[-1]
                )
                cond = self._cast(args[0], list_t).isin(
                    *[self._cast(a, list_t) for a in args[1:]]
                )
            return (F.when(cond, 1).otherwise(0).cast("int"), "int")
        if name == "geodist":
            a, b, c, d = (self._cast(x, "float").cast("double") for x in args)
            return (geodist(a, b, c, d).cast("float"), "float")
        raise ExprParseError(f"unknown function {name!r}")


def parse_expression(
    s: str,
    attr_types: dict[str, str],
    docid_col: str = "docid",
    weight_col: str = "weight",
    now_epoch: int | None = None,
    id64: bool = False,
) -> tuple[Column, str]:
    """Parse a Sphinx expression -> (Column, 'int'|'bigint'|'float').

    attr_types maps lowercase attr names to 'int'/'bigint'/'float'/
    'mva' ('bool'/'timestamp' accepted as int aliases).
    """
    # IN(attr, ...) / INTERVAL(attr, ...) keep MVA args legal only in
    # IN; _P.attr raises for bare MVA refs, so pre-wrap: the parser
    # handles it inside func() via the node type.
    p = _P(
        _lex(s),
        {k.lower(): v for k, v in attr_types.items()},
        docid_col,
        weight_col,
        now_epoch,
        id64,
    )
    # special-case bare MVA first arg of IN(): patch attr() behaviour
    orig_attr = p.attr

    def attr_with_mva(name):
        t = p.attrs.get(name)
        if t == "mva":
            return (F.col(name), "mva")
        return orig_attr(name)

    p.attr = attr_with_mva
    col, t = p.parse()
    if t == "mva":
        raise ExprParseError("expression cannot return MVA")
    return col, t
