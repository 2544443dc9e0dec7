"""Index-time prefix/infix expansion (src/sphinx.cpp:18534-18663) and
star-query compilation against the mangled dictionary entries
(CSphDictStarV8 dispatch, src/sphinx.cpp:10680-10767).

Namespaces (see Tokenizer.hits_for_doc): bare substring expansions
share the PLAIN word space (reference CRC behavior — what makes
enable_star=0 implicit matching work); "^*w$" is the both-anchored
full-word entry every non-starred query resolves to on a star index;
"^*s" / "s$" are the infix-mode word-start / word-end anchors."""

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
    # markers entry + bare prefixes of length 3..7 (the full word is
    # the full-length prefix; no separate plain entry)
    assert words == [
        "^*running$", "run", "runn", "runni", "runnin", "running"
    ]
    # expanded hits share the source hit's packed position
    assert len({wp for _, wp in hits}) == 1


def test_tokenizer_infix_expansion():
    tok = Tokenizer(TokenizerSettings(min_infix_len=4))
    words = {w for w, _ in tok.hits_for_doc(["abcde"])}
    # bare substrings + word-start (^*) and word-end ($) anchors
    # (src/sphinx.cpp:18631-18658) + the both-anchored full word
    assert words == {
        "^*abcde$",
        "abcd", "abcde", "bcde",
        "^*abcd", "^*abcde",
        "abcde$", "bcde$",
    }


def test_tokenizer_short_word_not_expanded():
    tok = Tokenizer(TokenizerSettings(min_prefix_len=4))
    words = sorted(w for w, _ in tok.hits_for_doc(["run"]))
    # too short to expand: markers entry + plain word
    # (src/sphinx.cpp:18595-18607)
    assert words == ["^*run$", "run"]


def test_exact_form_not_expanded():
    tok = Tokenizer(
        TokenizerSettings(
            min_prefix_len=3,
            index_exact_words=True,
            morphology=("stem_en",),
        )
    )
    words = [w for w, _ in tok.hits_for_doc(["cats"])]
    # =cats indexed once with the raw form, never expanded
    assert words.count("=cats") == 1
    assert [w for w in words if w.startswith("=")] == ["=cats"]


def test_exact_words_ignored_without_morphology():
    # "no morphology, index_exact_words=1 has no effect, ignoring"
    # (src/indexer.cpp:960-964)
    tok = Tokenizer(
        TokenizerSettings(min_prefix_len=3, index_exact_words=True)
    )
    words = [w for w, _ in tok.hits_for_doc(["cats"])]
    assert [w for w in words if w.startswith("=")] == []


def test_prefix_search_single_lookup(prefix_idx):
    rows = prefix_idx.search("run*", ranker="bm25", limit=10).collect()
    assert [r["docid"] for r in rows] == [1, 2]
    # dictionary stats of the bare prefix entry: df=2 (docs 1,2),
    # hits = running/runner/runs (doc 1) + run x2 (doc 2)
    d = prefix_idx.dictionary.where("word = 'run'").collect()[0]
    assert (d["docs"], d["hits"]) == (2, 5)


def test_plain_word_exact_on_star_index(prefix_idx):
    # non-starred query word on a star index resolves to the
    # both-anchored full-word entry: 'run' matches doc 2 only, NOT
    # the 'running/runner/runs' prefixes in doc 1
    rows = prefix_idx.search("run", ranker="bm25").collect()
    assert [r["docid"] for r in rows] == [2]


def test_enable_star_off_implicit_prefix(spark):
    # enable_star=0: plain query words match indexed substrings
    # IMPLICITLY (expansions share the plain CRC namespace) and '*'
    # folds away as a separator (legacy behavior, SetupStarDict
    # gating src/sphinx.cpp:16030-16035)
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = SphinxIndex.build(
        docs,
        IndexSettings(
            docid_col="doc_id",
            fields=("text",),
            tokenizer=TokenizerSettings(min_prefix_len=3),
            enable_star=False,
        ),
    )
    rows = idx.search("run", ranker="bm25", limit=10).collect()
    assert [r["docid"] for r in rows] == [1, 2]
    # star folds away -> same matches
    rows2 = idx.search("run*", ranker="bm25", limit=10).collect()
    assert [(r["docid"], r["weight"]) for r in rows] == [
        (r["docid"], r["weight"]) for r in rows2
    ]


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


def test_infix_native_equals_arrow(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    st = IndexSettings(
        docid_col="doc_id",
        fields=("text",),
        tokenizer=TokenizerSettings(min_infix_len=3),
    )
    nat = SphinxIndex.build(docs, st)
    arw = SphinxIndex.build(
        docs, IndexSettings(**{**st.__dict__, "tokenizer_impl": "arrow"})
    )
    n = sorted(
        tuple(r) for r in nat.postings.select("wordid", "docid").collect()
    )
    a = sorted(
        tuple(r) for r in arw.postings.select("wordid", "docid").collect()
    )
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
    # prefix-shaped pattern on an infix index: single lookup against
    # the word-start anchored namespace (MAGIC_WORD_HEAD,
    # src/sphinx.cpp:10713-10721)
    rows = idx.search("runn*", ranker="bm25").collect()
    assert [r["docid"] for r in rows] == [1]
    # suffix-shaped pattern: word-end anchored (MAGIC_WORD_TAIL)
    rows = idx.search("*ast", ranker="bm25").collect()
    assert [r["docid"] for r in rows] == [1]
    rows = idx.search("*unn", ranker="bm25").collect()
    assert rows == []


def test_starred_phrase_positional(prefix_idx):
    rows = prefix_idx.search('"run* fast"', ranker="bm25").collect()
    assert [r["docid"] for r in rows] == [1]
    assert prefix_idx.search('"fast run*"', ranker="bm25").collect() == []


def test_unmatched_star(prefix_idx):
    assert prefix_idx.search("zzz*", ranker="bm25").collect() == []


def test_short_core_single_lookup(prefix_idx):
    # core shorter than min_prefix_len: the reference still mangles
    # and looks it up (no expansion entry of length 2 exists ->
    # zero matches) and sets the min-length warning
    # (CheckQueryWord, src/sphinx.cpp:14790-14807)
    assert prefix_idx.search("ru*", ranker="bm25", limit=10).collect() == []
    assert prefix_idx.check_query_words("ru*") == (
        "Query word length is less than min prefix length. word: 'ru*' "
    )


def test_prefix_fields_wordparts(spark):
    # prefix_fields limits expansion to the listed fields; other
    # fields still emit the markers entry (bGlobalPartialMatch,
    # src/sphinx.cpp:18685-18700) so exact matches work everywhere
    docs = spark.createDataFrame(
        [(1, "tables", "chairs")], ["doc_id", "title", "body"]
    )
    st = IndexSettings(
        docid_col="doc_id",
        fields=("title", "body"),
        tokenizer=TokenizerSettings(min_prefix_len=3),
        prefix_fields=("title",),
    )
    assert st.wordparts() == ["prefix", "whole"]
    idx = SphinxIndex.build(docs, st)
    assert [r["docid"] for r in idx.search("tab*").collect()] == [1]
    assert idx.search("cha*").collect() == []  # body not expanded
    assert [r["docid"] for r in idx.search("chairs").collect()] == [1]
