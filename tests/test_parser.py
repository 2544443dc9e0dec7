"""Query parser: precedence per src/sphinxquery.y, NOT fixup per
FixupNots (src/sphinxquery.cpp:612-706)."""

import pytest

from sphinx_1_spark.functions.tokenizer import Tokenizer
from sphinx_1_spark.plans.parser import QueryParseError, QueryParser


@pytest.fixture
def parser():
    return QueryParser(Tokenizer(), ["title", "body"])


def test_implicit_and(parser):
    t = parser.parse("hello world")
    assert t.op == "and"
    assert [c.words[0].word for c in t.children] == ["hello", "world"]
    assert [c.words[0].querypos for c in t.children] == [1, 2]


def test_or_binds_tighter_than_and(parser):
    t = parser.parse("a b | c")
    assert t.op == "and"
    assert t.children[0].op == "term"
    assert t.children[1].op == "or"


def test_not_fixup(parser):
    t = parser.parse("a -b")
    assert t.op == "andnot"
    assert t.children[0].words[0].word == "a"
    assert t.children[1].words[0].word == "b"


def test_multiple_nots_collect_to_or(parser):
    t = parser.parse("a -b -c")
    assert t.op == "andnot"
    assert t.children[1].op == "or"


def test_top_level_not_rejected(parser):
    with pytest.raises(QueryParseError):
        parser.parse("-hello")


def test_phrase_and_modifiers(parser):
    t = parser.parse('"exact phrase"')
    assert t.op == "phrase" and len(t.words) == 2
    t = parser.parse('"w1 w2"~3')
    assert t.op == "proximity" and t.max_distance == 3
    t = parser.parse('"w1 w2 w3"/2')
    assert t.op == "quorum" and t.max_distance == 2


def test_field_limit(parser):
    t = parser.parse("@title hello")
    assert t.op == "term" and t.fields_mask == 1
    t = parser.parse("@(title,body) hello")
    assert t.fields_mask == 3
    t = parser.parse("@body[5] hello")
    assert t.fields_mask == 2 and t.max_field_pos == 5
    with pytest.raises(QueryParseError):
        parser.parse("@nosuch hello")


def test_anchors(parser):
    t = parser.parse("^start")
    assert t.words[0].field_start
    t = parser.parse("end$")
    assert t.words[0].field_end
    t = parser.parse("^both$")
    assert t.words[0].field_start and t.words[0].field_end


def test_before(parser):
    t = parser.parse("a << b")
    assert t.op == "before"


def test_parens_grouping(parser):
    t = parser.parse("(a | b) c")
    assert t.op == "and"
    assert t.children[0].op == "or"


def test_dash_inside_word_is_not(parser):
    # '-' is a special everywhere outside quotes: i-phone => i AND NOT phone
    t = parser.parse("i-phone")
    assert t.op == "andnot"


def test_querypos_skips_operators(parser):
    t = parser.parse('a "b c" d')
    # a=1, b=2, c=3, d=4
    from sphinx_1_spark.plans.parser import collect_words

    assert [(w.word, w.querypos) for w in collect_words(t)] == [
        ("a", 1),
        ("b", 2),
        ("c", 3),
        ("d", 4),
    ]


def test_relaxed_unknown_field(parser):
    # @@relaxed (src/sphinxquery.cpp:715-760): recognized only as a
    # whole-query prefix; unknown-field nodes are DELETED from the
    # tree (DeleteNodesWOFields) so their keywords leave the
    # query-word count entirely
    with pytest.raises(QueryParseError):
        parser.parse("@nosuch a")
    # mid-query @@relaxed is a syntax error (strncmp prefix only)
    with pytest.raises(QueryParseError):
        parser.parse("b | @@relaxed @nosuch a")
    t = parser.parse("@@relaxed @nosuch a | b")
    assert t.op == "term" and t.words[0].word == "b"
    from sphinx_1_spark.plans.parser import collect_words

    assert [w.word for w in collect_words(t)] == ["b"]
    # all branches unknown -> empty tree (NOT an error: the reference
    # answers zero matches, with dict stats for the deleted words)
    t_empty = parser.parse("@@relaxed @nosuch a")
    assert t_empty.op == "empty"
    assert [w.word for w in t_empty.stats_words] == ["a"]
    # known field after the flag still resolves
    t2 = parser.parse("@@relaxed @title a")
    assert t2.fields_mask == 1


def test_field_maxpos(parser):
    t = parser.parse("@title[7] a")
    assert t.fields_mask == 1
    assert t.max_field_pos == 7


def test_zero_count_suffix_is_plain_phrase(parser):
    """maxdist 0 means phrase: the reference branches on
    m_iMaxDistance==0 BEFORE consulting m_bQuorum
    (src/sphinx.cpp:11757-11759), so '"a b"/0' and '"a b"~0' are both
    exact phrases.  A quorum/0 kept as quorum would clamp to
    threshold 1 == any-word-present, silently widening the match set."""
    for q in ('"alpha beta"/0', '"alpha beta"~0'):
        t = parser.parse(q)
        assert t.op == "phrase", q
        assert [w.word for w in t.words] == ["alpha", "beta"]
    assert parser.parse('"alpha beta"/1').op == "quorum"
    assert parser.parse('"alpha beta"~1').op == "proximity"


def test_oversize_quorum_degrades_to_and(parser):
    """The reference's quorum tracks children in a DWORD mask, so >32
    words can't be a quorum node: it degrades to the AND of the word
    list (src/sphinx.cpp:11769-11783).  A 33-word quorum/2 therefore
    requires ALL words, not any 2 — keeping it a wide quorum would
    silently widen the match set vs the reference."""
    words = [f"w{i:02d}" for i in range(33)]
    t = parser.parse('"' + " ".join(words) + '"/2')
    assert t.op == "and"
    assert len(t.children) == 33
    assert all(c.op == "term" for c in t.children)
    # 32 words is still a real quorum
    t32 = parser.parse('"' + " ".join(words[:32]) + '"/2')
    assert t32.op == "quorum"
