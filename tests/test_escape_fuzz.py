"""Randomized EscapeString round-trip fuzz.

EscapeString's contract (api/sphinxapi.py:967-968): arbitrary user
input, once escaped, parses as an OPERATOR-FREE extended query —
every special in the 14-char escape set is demoted per Special2Simple
(src/sphinx.cpp:3565-3576): word-part chars stay inside the word,
everything else acts as whitespace.  The deterministic tests in
test_query_escaping.py pin each special individually; this fuzz pins
the contract over 200 random compositions, against an oracle that
never touches the query parser: plain tokenization of the demoted
text.

Known reference quirk pinned here too: EscapeString does NOT escape
'<' or '*', so '<<' (BEFORE) and stars stay live through escaping —
the fuzz alphabet excludes them because the roundtrip contract simply
does not cover them in the reference either.
"""

from __future__ import annotations

import random

import pytest

from sphinx_1_spark.functions.charset import SPHINX_DEFAULT_UTF8_TABLE
from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings
from sphinx_1_spark.plans.api import escape_string
from sphinx_1_spark.plans.parser import QueryParser

# the exact char set of api/sphinxapi.py:968 (doubled '=' dropped)
ESCAPE_SET = list('=()|-!@~"&/\\^$')

WORDS = ["alpha", "beta", "gamma", "run", "ning", "x1", "42", "中文", "测试"]


def _flat_words(node, acc):
    if node is None:
        return acc
    for w in node.words or []:
        acc.append((w.word, w.querypos))
    for c in node.children:
        _flat_words(c, acc)
    return acc


def _ops(node, acc):
    if node is None:
        return acc
    acc.add(node.op)
    for c in node.children:
        _ops(c, acc)
    return acc


def _gen_input(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 12)):
        r = rng.random()
        if r < 0.45:
            parts.append(rng.choice(WORDS))
        elif r < 0.75:
            parts.append(rng.choice(ESCAPE_SET))
        elif r < 0.9:
            # glue a special INSIDE a word (aaa!bbb, run-ning, a"b)
            parts.append(
                rng.choice(WORDS)
                + rng.choice(ESCAPE_SET)
                + rng.choice(WORDS)
            )
        else:
            parts.append(rng.choice([" ", "  ", "\t"]))
    # random joiner: sometimes no space, so specials touch words
    out = []
    for p in parts:
        out.append(p)
        if rng.random() < 0.7:
            out.append(" ")
    return "".join(out)


def _demote(s: str, word_chars: set[str]) -> str:
    """The Special2Simple oracle: escape-set chars that are word
    chars stay; all other escape-set chars become whitespace."""
    return "".join(
        (c if c in word_chars else " ") if c in ESCAPE_SET else c
        for c in s
    )


def _run_roundtrip(tok: Tokenizer, fields, word_chars: set[str], seed: int):
    parser = QueryParser(tok, fields)
    rng = random.Random(seed)
    for i in range(200):
        raw = _gen_input(rng)
        expected = [
            w for w, _ in tok.tokenize_with_positions(_demote(raw, word_chars))
        ]
        try:
            tree = parser.parse(escape_string(raw))
        except Exception as e:  # noqa: BLE001 - report the failing input
            raise AssertionError(f"case {i}: parse failed on {raw!r}: {e}")
        got = _flat_words(tree, [])
        # operator-free: only implicit AND over plain terms survives
        # (an all-specials input legitimately parses to the empty node)
        allowed = {"and", "term", None} | ({"empty"} if not expected else set())
        assert _ops(tree, set()) <= allowed, (raw, tree.op)
        assert [w for w, _ in got] == expected, (
            f"case {i}: {raw!r} -> {got} != {expected}"
        )
        # queryposes are the plain sequential 1..n of a flat AND
        assert [p for _, p in got] == list(range(1, len(got) + 1)), (raw, got)


def test_escape_roundtrip_fuzz_default_charset():
    # default charset: NO escape-set char is a word char, so every
    # escaped special acts as whitespace
    _run_roundtrip(
        Tokenizer(TokenizerSettings()),
        ["title", "body"],
        word_chars=set(),
        seed=20260820,
    )


def test_escape_roundtrip_fuzz_dash_wordchar():
    # '-' in the charset: '\-' keeps the dash INSIDE the word (the
    # Special2Simple dual branch) while every other escaped special
    # still demotes to whitespace
    ts = TokenizerSettings(charset_table=SPHINX_DEFAULT_UTF8_TABLE + ", -")
    _run_roundtrip(
        Tokenizer(ts),
        ["title", "body"],
        word_chars={"-"},
        seed=20260821,
    )


def test_escape_set_is_exactly_the_reference_set():
    # canary: if escape_string's char set drifts from the fuzz's
    # ESCAPE_SET, the oracle above silently weakens — pin them equal
    for ch in ESCAPE_SET:
        assert escape_string(ch) == "\\" + ch, ch
    for ch in "<>*abz019 \t中":
        assert escape_string(ch) == ch, ch
