"""Index-time prefix/infix expansion (src/sphinx.cpp:18596-18663) and
star-query compilation against the "*"-marked namespace
(CSphDictStarV8 dispatch, src/sphinx.cpp:10700-10770)."""

import pytest

from sphinx_1_spark import IndexSettings, SphinxIndex
from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings

DOCS = [
    (1, "the running runner runs fast"),
    (2, "run forest run"),
    (3, "nothing to see here"),
    (4, "prefix print printing printer"),
]


@pytest.fixture(scope="module")
def prefix_idx(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return SphinxIndex.build(
        docs,
        IndexSettings(
            docid_col="doc_id",
            fields=("text",),
            tokenizer=TokenizerSettings(min_prefix_len=3),
        ),
    )


def test_tokenizer_prefix_expansion():
    tok = Tokenizer(TokenizerSettings(min_prefix_len=3))
    hits = tok.hits_for_doc(["running"])
    words = sorted(w for w, _ in hits)
    # plain form + prefixes of length 3..7
    assert words == [
        "*run", "*runn", "*runni", "*runnin", "*running", "running"
    ]
    # expanded hits share the source hit's packed position
    assert len({wp for _, wp in hits}) == 1


def test_tokenizer_infix_expansion():
    tok = Tokenizer(TokenizerSettings(min_infix_len=4))
    words = {w for w, _ in tok.hits_for_doc(["abcde"])}
    assert words == {"abcde", "*abcd", "*abcde", "*bcde"}


def test_exact_form_not_expanded():
    tok = Tokenizer(
        TokenizerSettings(min_prefix_len=3, index_exact_words=True)
    )
    words = [w for w, _ in tok.hits_for_doc(["cats"])]
    # =cats indexed once, never "*=cat..."
    assert "=cats" in words
    assert not any(w.startswith("*=") for w in words)


def test_prefix_search_single_lookup(prefix_idx):
    rows = prefix_idx.search("run*", ranker="bm25", limit=10).collect()
    assert [r["docid"] for r in rows] == [1, 2]
    # dictionary stats: "*run" df=2 (docs 1,2), tf totals 3+2
    d = prefix_idx.dictionary.where("word = '*run'").collect()[0]
    assert (d["docs"], d["hits"]) == (2, 5)


def test_prefix_native_equals_arrow(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    st = IndexSettings(
        docid_col="doc_id",
        fields=("text",),
        tokenizer=TokenizerSettings(min_prefix_len=3),
    )
    nat = SphinxIndex.build(docs, st)
    arw = SphinxIndex.build(
        docs, IndexSettings(**{**st.__dict__, "tokenizer_impl": "arrow"})
    )
    get = lambda idx: sorted(
        (r["docid"], r["weight"])
        for r in idx.search("print*", ranker="bm25").collect()
    )
    assert get(nat) == get(arw)
    # whole hit relation identical
    n = nat.postings.select("wordid", "docid").distinct().count()
    a = arw.postings.select("wordid", "docid").distinct().count()
    assert n == a


def test_infix_contains(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = SphinxIndex.build(
        docs,
        IndexSettings(
            docid_col="doc_id",
            fields=("text",),
            tokenizer=TokenizerSettings(min_infix_len=3),
        ),
    )
    rows = idx.search("*unn*", ranker="bm25").collect()
    assert [r["docid"] for r in rows] == [1]
    rows = idx.search("*ores*", ranker="bm25").collect()
    assert [r["docid"] for r in rows] == [2]
    # prefix-shaped pattern on an infix index is NOT served by the
    # marker namespace: falls back to dictionary LIKE expansion and
    # still answers correctly (plain forms remain indexed)
    rows = idx.search("runn*", ranker="bm25").collect()
    assert [r["docid"] for r in rows] == [1]


def test_starred_phrase_positional(prefix_idx):
    rows = prefix_idx.search('"run* fast"', ranker="bm25").collect()
    assert [r["docid"] for r in rows] == [1]
    assert prefix_idx.search('"fast run*"', ranker="bm25").collect() == []


def test_unmatched_star(prefix_idx):
    assert prefix_idx.search("zzz*", ranker="bm25").collect() == []


def test_short_core_falls_back(prefix_idx):
    # core shorter than min_prefix_len is not in the namespace;
    # dictionary expansion answers it ("ru*" -> run/running/...)
    rows = prefix_idx.search("ru*", ranker="bm25", limit=10).collect()
    assert {r["docid"] for r in rows} == {1, 2}
