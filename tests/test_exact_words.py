"""index_exact_words / =word exact-form terms and phrase_boundary
position stepping (reference test_41 and test_59 semantics)."""

import pytest

from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings
from sphinx_1_spark.plans.engine import IndexSettings, SphinxIndex


@pytest.fixture(scope="module")
def exact_index(spark):
    docs = spark.createDataFrame(
        [
            (1, "running shoes for runners"),
            (2, "he runs daily"),
            (3, "a run in the park"),
            (4, "running"),
        ],
        ["doc_id", "text"],
    )
    return SphinxIndex.build(
        docs,
        IndexSettings(
            docid_col="doc_id",
            fields=("text",),
            tokenizer_impl="arrow",
            tokenizer=TokenizerSettings(
                morphology=("stem_en",), index_exact_words=True
            ),
        ),
    )


def test_stemmed_term_matches_all_forms(exact_index):
    got = sorted(
        r.docid for r in exact_index.search("running", limit=10).collect()
    )
    # stem_en: running/runs/run -> run; runners -> runner
    assert got == [1, 2, 3, 4]


def test_exact_term_matches_literal_only(exact_index):
    got = sorted(
        r.docid for r in exact_index.search("=running", limit=10).collect()
    )
    assert got == [1, 4]


def test_exact_term_in_boolean_combo(exact_index):
    got = sorted(
        r.docid
        for r in exact_index.search("=running -shoes", limit=10).collect()
    )
    assert got == [4]


def test_exact_hits_share_positions(spark):
    """Exact hits are emitted at the SAME position as the plain hit
    (src/sphinx.cpp:18700-18727)."""
    tk = Tokenizer(
        TokenizerSettings(morphology=("stem_en",), index_exact_words=True)
    )
    hits = tk.hits_for_doc(["running daily"])
    toks = [(t, p & 0x7FFFFF) for t, p in hits]
    assert toks == [
        ("=running", 1), ("run", 1), ("=daily", 2), ("daili", 2),
    ]


def test_phrase_boundary_positions():
    """phrase_boundary chars bump the next token's position by
    boundary_step (src/sphinx.cpp:18528-18531) so phrases don't match
    across sentence ends."""
    tk = Tokenizer(
        TokenizerSettings(phrase_boundary="., !, ?", boundary_step=100)
    )
    tps = tk.tokenize_with_positions("hello world. next sentence")
    assert tps == [
        ("hello", 1), ("world", 2), ("next", 103), ("sentence", 104),
    ]


def test_phrase_does_not_match_across_boundary(spark):
    docs = spark.createDataFrame(
        [(1, "the end. new start here"), (2, "the end new start here")],
        ["doc_id", "text"],
    )
    idx = SphinxIndex.build(
        docs,
        IndexSettings(
            docid_col="doc_id",
            fields=("text",),
            tokenizer_impl="arrow",
            tokenizer=TokenizerSettings(
                phrase_boundary=".", boundary_step=100
            ),
        ),
    )
    got = sorted(r.docid for r in idx.search('"end new"', limit=10).collect())
    assert got == [2]
    # plain AND still matches both
    got = sorted(r.docid for r in idx.search("end new", limit=10).collect())
    assert got == [1, 2]


# ------------------------------------------------------------------
# the keyword rule INSIDE phrases (phrasetoken -> keyword,
# src/sphinxquery.y:52-66): '=' exact form reaches the dict as one
# token because the reference folds '=' into the query charset when
# index_exact_words=1 (SetupExactDict, src/sphinx.cpp:16062), and
# ^word / word$ anchors attach to individual phrase words.  A stopword
# exact term is wordid 0 at parse time (GetWordIDNonStemmed
# stop-checks the RAW form, src/sphinx.cpp:17047-17053) — a null node
# in keyword position, a position gap inside a phrase.


@pytest.fixture(scope="module")
def phrase_exact_index(spark):
    docs = spark.createDataFrame(
        [
            (1, "running shoes now"),
            (2, "runs shoes later"),
            (3, "run shoes"),
            (4, "buy running shoes"),
            (5, "the quick fox jumps"),
            (6, "foo bar"),
        ],
        ["doc_id", "text"],
    )
    return SphinxIndex.build(
        docs,
        IndexSettings(
            docid_col="doc_id",
            fields=("text",),
            tokenizer=TokenizerSettings(
                morphology=("stem_en",),
                index_exact_words=True,
                stopwords=frozenset({"the"}),
            ),
        ),
    )


def _ids(idx, q):
    return sorted(r.docid for r in idx.search(q, limit=10).collect())


def test_exact_form_inside_phrase(phrase_exact_index):
    idx = phrase_exact_index
    # stemmed phrase matches every surface form; exact pins one
    assert _ids(idx, '"running shoes"') == [1, 2, 3, 4]
    assert _ids(idx, '"=running shoes"') == [1, 4]
    assert _ids(idx, '"=runs shoes"') == [2]


def test_anchors_inside_phrase(phrase_exact_index):
    idx = phrase_exact_index
    # ^: phrase must start the field; $: last word must end it
    assert _ids(idx, '"^running shoes"') == [1, 2, 3]
    assert _ids(idx, '"run shoes$"') == [3, 4]


def test_exact_stopword_sweeps_to_null(phrase_exact_index):
    idx = phrase_exact_index
    # 'foo =the' degrades to 'foo' (parse-time null node), NOT to
    # match-nothing; an all-stopword query matches nothing
    assert _ids(idx, "foo =the") == _ids(idx, "foo") == [6]
    assert _ids(idx, "=the") == []


def test_exact_stopword_keeps_phrase_gap(phrase_exact_index):
    idx = phrase_exact_index
    # '=the' occupies position 1; quick@2 fox@3 must align after it
    assert _ids(idx, '"=the quick fox"') == [5]
    # the gap is real: without it the phrase would start at quick
    assert _ids(idx, '"quick fox jumps"') == [5]
