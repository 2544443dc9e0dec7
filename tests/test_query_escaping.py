"""Query-string escaping: EscapeString (api/sphinxapi.py:967-968,
api/sphinxapi.php:1467-1473) and the escaped query tokenizer.

The reference parses EVERY extended query through an escaped
tokenizer clone (Clone(true), src/sphinxquery.cpp:710): a backslash
consumes itself and demotes the following codepoint per
Special2Simple (src/sphinx.cpp:3565-3576, escape prefix of GetToken
:4280-4292) — word-part chars stay in the word, everything else
becomes whitespace.  Before round 4 the lexer treated '\\' as a word
char and still honored the UNescaped special ('a \\-b' parsed as
a AND NOT b; reference: a AND b)."""

import re

import pytest

from sphinx_1_spark import IndexSettings, SphinxIndex
from sphinx_1_spark.functions.charset import SPHINX_DEFAULT_UTF8_TABLE
from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings
from sphinx_1_spark.plans.api import escape_string
from sphinx_1_spark.plans.parser import QueryParser


# ---------------------------------------------------------- EscapeString


def _reference_escape(s: str) -> str:
    # verbatim regex from api/sphinxapi.py:968 (the char class lists
    # '=' twice — a no-op the set form drops)
    return re.sub(r"([=\(\)|\-!@~\"&/\\\^\$\=])", r"\\\1", s)


@pytest.mark.parametrize(
    "raw",
    [
        "plain words only",
        'all specials = ( ) | - ! @ ~ " & / \\ ^ $',
        "mixed a-b c|d (e) @field ~2 \"quoted\" 50/50 a\\b x^2 $1 a=b",
        "doubled \\\\ and --- and |||",
        "",
        "中文 mixed -测试",
    ],
)
def test_escape_string_matches_reference(raw):
    assert escape_string(raw) == _reference_escape(raw)


def test_escape_string_php_set_is_same():
    # the PHP list (api/sphinxapi.php:1468-1470) escapes exactly the
    # same 14 chars the python regex does
    php_from = ["\\", "(", ")", "|", "-", "!", "@", "~", '"', "&", "/", "^", "$", "="]
    torture = "".join(php_from) + "word"
    out = escape_string(torture)
    for ch in php_from:
        assert "\\" + ch in out
    assert out.endswith("word")


# ---------------------------------------------- escaped-query parse trees


@pytest.fixture(scope="module")
def parser():
    return QueryParser(Tokenizer(), ["title", "body"])


def _shape(node):
    ws = tuple(w.word for w in (node.words or []))
    return (node.op, ws, tuple(_shape(c) for c in node.children))


def test_escaped_not_is_inert(parser):
    # 'a \-b' must be a plain AND of a and b, not a ANDNOT b
    assert _shape(parser.parse("a \\-b")) == _shape(parser.parse("a b"))
    # the unescaped form still negates
    assert parser.parse("a -b").op == "andnot"


def test_escaped_specials_act_as_whitespace(parser):
    # default charset: none of the escape-set chars are word chars,
    # so each escaped special splits words exactly like a space
    for q in ["aaa\\!bbb", "aaa\\|bbb", "aaa\\(bbb", "aaa\\)bbb",
              "aaa\\~bbb", "aaa\\/bbb", "aaa\\^bbb", "aaa\\$bbb",
              "aaa\\=bbb", "aaa\\\\bbb"]:
        assert _shape(parser.parse(q)) == _shape(parser.parse("aaa bbb")), q


def test_escaped_field_operator_is_plain_word(parser):
    # '\@world' must NOT be parsed as a field limit (and must not
    # raise "no field 'world'")
    assert _shape(parser.parse("hello \\@world")) == _shape(
        parser.parse("hello world")
    )


def test_escaped_quotes_do_not_open_phrase(parser):
    t = parser.parse('\\"hello world\\"')
    assert t.op == "and"  # not a phrase
    assert _shape(t) == _shape(parser.parse("hello world"))


def test_escaped_positions_match_whitespace(parser):
    t = parser.parse("a \\-b c")
    assert [(w.word, w.querypos) for c in t.children for w in c.words] == [
        ("a", 1), ("b", 2), ("c", 3)
    ]
    ph = parser.parse('"hello \\- world"')
    assert [(w.word, w.querypos) for w in ph.words] == [
        ("hello", 1), ("world", 2)
    ]


def test_dangling_backslash_is_noop(parser):
    assert _shape(parser.parse("trailing\\")) == _shape(
        parser.parse("trailing")
    )


def test_escaped_wordchar_keeps_char():
    # '-' IN the charset: '\-' is Special2Simple'd to a simple
    # codepoint and stays inside the word (dual branch,
    # src/sphinx.cpp:3567-3571)
    ts = TokenizerSettings(charset_table=SPHINX_DEFAULT_UTF8_TABLE + ", -")
    p = QueryParser(Tokenizer(ts), ["title", "body"])
    t = p.parse("run\\-ning")
    assert t.op == "term" and t.words[0].word == "run-ning"
    # while the unescaped '-' still lexes as the NOT operator
    assert p.parse("running -extra").op == "andnot"


def test_escape_string_roundtrip_parses_as_plain_words(parser):
    # EscapeString's contract: arbitrary user input becomes operator-
    # free query text.  Every keyword of the parsed tree must be a
    # plain term and the word set must equal the tokenized input.
    user = 'find (this) -or | !that ~2 "exactly" a/b @title x=y'
    t = parser.parse(escape_string(user))

    def words(n, acc):
        for w in n.words or []:
            acc.append(w.word)
        for c in n.children:
            words(c, acc)
        return acc

    def ops(n, acc):
        acc.add(n.op)
        for c in n.children:
            ops(c, acc)
        return acc

    assert ops(t, set()) <= {"and", "term"}
    assert words(t, []) == [
        "find", "this", "or", "that", "2", "exactly", "a", "b", "title",
        "x", "y",
    ]


# -------------------------------------------------------- end-to-end


def test_escaped_query_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, "foo bar baz"), (2, "foo only here")],
        "docid long, text string",
    )
    idx = SphinxIndex.build(df, IndexSettings(docid_col="docid"))
    # unescaped NOT: only doc 2
    got = sorted(
        r.docid for r in idx.search("foo -bar", ranker="none", limit=10).collect()
    )
    assert got == [2]
    # escaped NOT is inert: both docs match (query = foo AND bar?
    # no — escaped '-' is whitespace, so query is foo AND bar -> doc 1
    # only... the reference tokenizes 'foo \-bar' as 'foo','bar')
    got = sorted(
        r.docid
        for r in idx.search("foo \\-bar", ranker="none", limit=10).collect()
    )
    assert got == [1]
    # escaped OR is inert too: 'foo \| bar' = foo AND bar -> doc 1;
    # unescaped matches both
    got_esc = sorted(
        r.docid
        for r in idx.search("foo \\| bar", ranker="none", limit=10).collect()
    )
    got_or = sorted(
        r.docid
        for r in idx.search("foo | bar", ranker="none", limit=10).collect()
    )
    assert got_esc == [1] and got_or == [1, 2]
