"""Generative robustness fuzz of both parsers.

Random token soup must either parse or raise the parser's OWN error
class, within a bounded time: never hang (the round-4 MATCH-parser
class of bug — a no-progress loop on a stray $ / ~ / / in atom
position spun forever before the yacc-style guard), and never leak an
internal exception type (KeyError/IndexError/TypeError) in place of
the reference's syntax error.  The generators bias toward the
operator/special characters both grammars treat specially.
"""

from __future__ import annotations

import random
import signal

import pytest


class _Deadline:
    """SIGALRM-based per-input hang guard (tests run on the main
    thread, so a real interpreter-level hang is interruptible)."""

    def __init__(self, seconds: float):
        self.seconds = seconds

    def __enter__(self):
        def _fire(signum, frame):
            raise TimeoutError("parser exceeded the per-input deadline")

        self._old = signal.signal(signal.SIGALRM, _fire)
        signal.setitimer(signal.ITIMER_REAL, self.seconds)
        return self

    def __exit__(self, *exc):
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, self._old)
        return False


_MATCH_FRAGMENTS = (
    list("abcz019_") + ["hello", "zz9", "field"]
    + list('()|"~/-!^$=@<*?.,:;[]')
    + ["<<", "@@relaxed", "@title", "@(title,body)", "@missing", "@*",
       '"/2', "~3", "/2", "[5]", "=word", "-", "--", '""', "@title[3]"]
)


def _gen_match_soup(rng: random.Random) -> str:
    n = rng.randint(1, 12)
    parts = [rng.choice(_MATCH_FRAGMENTS) for _ in range(n)]
    return "".join(
        p + (" " if rng.random() < 0.5 else "") for p in parts
    )


def test_match_parser_never_hangs_or_leaks(spark):
    from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings
    from sphinx_1_spark.plans.parser import QueryParseError, QueryParser

    parser = QueryParser(
        Tokenizer(TokenizerSettings()), ["title", "body"]
    )
    rng = random.Random(20260819)
    parsed = errored = 0
    for i in range(400):
        q = _gen_match_soup(rng)
        with _Deadline(10.0):
            try:
                parser.parse(q)
                parsed += 1
            except QueryParseError:
                errored += 1
            # anything else (TimeoutError, KeyError, IndexError, ...)
            # propagates and fails the test with the offending input
            except Exception as e:  # pragma: no cover - failure path
                pytest.fail(f"input {i} {q!r}: leaked {type(e).__name__}: {e}")
    # the generator produced both outcomes (soup is hostile but not
    # uniformly invalid)
    assert parsed > 20 and errored > 20, (parsed, errored)


_EXPR_FRAGMENTS = (
    ["1", "2", "42", "0", "3.5", ".5", "1e3", "a", "b", "c", "m", "@id",
     "@weight", "id"]
    + list("+-*/%(),<>=!&|^~?")
    + ["<=", ">=", "<>", "!=", "==", "&&", "||",
       "if(", "min(", "max(", "abs(", "idiv(", "interval(", "in(",
       "bigint(", "pow(", "sqrt(", "geodist(", "now()", ")", ",",
       "$", "#", "'str'", "madd(", "mul3("]
)


def _gen_valid_expr(rng: random.Random, depth: int = 0) -> str:
    """Well-formed arithmetic so the fuzz also walks the SUCCESS paths
    deep inside precedence climbing, not just early rejections."""
    if depth >= 3 or rng.random() < 0.4:
        return rng.choice(("1", "42", "3.5", "a", "b", "c", "@id", "@weight"))
    r = rng.random()
    x = _gen_valid_expr(rng, depth + 1)
    y = _gen_valid_expr(rng, depth + 1)
    if r < 0.5:
        op = rng.choice(("+", "-", "*", "/", "<", ">", "<=", ">=", "=", "<>", "&", "|"))
        return f"({x} {op} {y})"
    if r < 0.7:
        return f"{rng.choice(('min', 'max', 'pow', 'idiv'))}({x}, {y})"
    if r < 0.85:
        return f"if({x}, {y}, {_gen_valid_expr(rng, depth + 1)})"
    return f"{rng.choice(('abs', 'sqrt', 'bigint'))}({x})"


def _gen_expr_soup(rng: random.Random) -> str:
    if rng.random() < 0.4:
        return _gen_valid_expr(rng)
    n = rng.randint(1, 10)
    return " ".join(rng.choice(_EXPR_FRAGMENTS) for _ in range(n))


_SQL_FRAGMENTS = (
    ["SELECT", "FROM", "WHERE", "MATCH", "ORDER", "BY", "GROUP",
     "WITHIN", "LIMIT", "OPTION", "ASC", "DESC", "AND", "BETWEEN",
     "IN", "AS", "SHOW", "META", "STATUS", "WARNINGS",
     "documents", "idx", "@id", "@weight", "@count", "*", "a", "b",
     "1", "10", "3.5", "'table scan'", "'unterminated", "ranker=bm25",
     "max_matches=50", "count(*)", "sum(a)", "min(", ")"]
    + list(",()=<>!;")
)


def _gen_sql_soup(rng: random.Random) -> str:
    if rng.random() < 0.35:
        # well-formed skeleton with randomized pieces
        sel = rng.choice(("*", "@id, @weight", "a, count(*)"))
        tail = rng.choice(
            (
                "",
                " ORDER BY @weight DESC, @id ASC",
                " GROUP BY a",
                " LIMIT 5",
                " LIMIT 2, 8",
                " OPTION ranker=bm25",
            )
        )
        where = rng.choice(
            ("", " WHERE MATCH('table')", " WHERE a > 3", " WHERE a IN (1,2)")
        )
        return f"SELECT {sel} FROM documents{where}{tail}"
    n = rng.randint(1, 10)
    return " ".join(rng.choice(_SQL_FRAGMENTS) for _ in range(n))


def test_sphinxql_parser_never_hangs_or_leaks():
    from sphinx_1_spark.plans.sphinxql import SphinxQLError, parse_select

    rng = random.Random(31337)
    parsed = errored = 0
    for i in range(400):
        sql = _gen_sql_soup(rng)
        with _Deadline(10.0):
            try:
                parse_select(sql)
                parsed += 1
            except SphinxQLError:
                errored += 1
            except Exception as e:  # pragma: no cover - failure path
                pytest.fail(f"input {i} {sql!r}: leaked {type(e).__name__}: {e}")
    assert parsed > 20 and errored > 20, (parsed, errored)


_XML_FRAGMENTS = (
    ['<?xml version="1.0"?>', "<sphinx:docset>", "</sphinx:docset>",
     "<sphinx:schema>", "</sphinx:schema>",
     '<sphinx:field name="title"/>', "<sphinx:field/>",
     '<sphinx:attr name="ts" type="timestamp"/>',
     '<sphinx:attr type="int"/>', '<sphinx:attr name="x" type="nope"/>',
     '<sphinx:document id="7">', '<sphinx:document id="abc">',
     "<sphinx:document>", "</sphinx:document>",
     "<title>hello</title>", "<title>a<b>nested</b>c</title>",
     "<sphinx:killlist>", "</sphinx:killlist>", "<id>4</id>",
     "<nope>5</nope>", "&", "<", ">", "plain text", "<!-- c -->",
     '<sphinx:document id="18446744073709551615"></sphinx:document>']
)


def _gen_xml_soup(rng: random.Random) -> str:
    if rng.random() < 0.3:
        # well-formed docset with randomized schema/doc pieces
        return (
            "<sphinx:docset><sphinx:schema>"
            '<sphinx:field name="title"/>'
            '<sphinx:attr name="ts" type="timestamp"/>'
            "</sphinx:schema>"
            f'<sphinx:document id="{rng.randint(0, 2**64)}">'
            f"<title>doc {rng.randint(0, 99)}</title><ts>{rng.randint(-5, 10**12)}</ts>"
            "</sphinx:document>"
            "<sphinx:killlist><id>4</id></sphinx:killlist>"
            "</sphinx:docset>"
        )
    n = rng.randint(1, 10)
    return "".join(rng.choice(_XML_FRAGMENTS) for _ in range(n))


def test_xmlpipe_parser_never_hangs_or_leaks():
    from sphinx_1_spark.sources.xmlpipe import XmlPipeError, parse_docset

    rng = random.Random(808)
    parsed = errored = 0
    for i in range(400):
        xml = _gen_xml_soup(rng)
        with _Deadline(10.0):
            try:
                parse_docset(xml)
                parsed += 1
            except XmlPipeError:
                errored += 1
            except Exception as e:  # pragma: no cover - failure path
                pytest.fail(f"input {i} {xml!r}: leaked {type(e).__name__}: {e}")
    assert parsed > 20 and errored > 20, (parsed, errored)


def test_expr_parser_never_hangs_or_leaks(spark):
    from sphinx_1_spark.functions.exprparse import (
        ExprParseError,
        parse_expression,
    )

    attrs = {"a": "int", "b": "bigint", "c": "float", "m": "mva"}
    rng = random.Random(77)
    parsed = errored = 0
    for i in range(400):
        s = _gen_expr_soup(rng)
        with _Deadline(10.0):
            try:
                parse_expression(s, attrs)
                parsed += 1
            except ExprParseError:
                errored += 1
            except Exception as e:  # pragma: no cover - failure path
                pytest.fail(f"input {i} {s!r}: leaked {type(e).__name__}: {e}")
    assert parsed > 20 and errored > 20, (parsed, errored)
