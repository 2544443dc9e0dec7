"""Phrase matching across stopwords (reference tests 15/17): stopword
keywords become null query nodes that still occupy their atom position
(XQParser m_iAtomPos, src/sphinxquery.cpp:393,434-443), and stopword
document tokens consume a hit position (stopword_step=1) — so phrase
gaps must line up on both sides."""

import pytest

from sphinx_1_spark.functions.tokenizer import TokenizerSettings
from sphinx_1_spark.plans.engine import IndexSettings, SphinxIndex


@pytest.fixture(scope="module")
def stop_index(spark):
    docs = spark.createDataFrame(
        [
            (1, "big the cat sleeps"),
            (2, "big cat sleeps"),
            (3, "big red cat sleeps"),
        ],
        ["doc_id", "text"],
    )
    return SphinxIndex.build(
        docs,
        IndexSettings(
            docid_col="doc_id",
            fields=("text",),
            tokenizer_impl="arrow",
            tokenizer=TokenizerSettings(stopwords=frozenset({"the"})),
        ),
    )


def _ids(idx, q):
    return sorted(r.docid for r in idx.search(q, limit=10).collect())


def test_phrase_gap_must_match(stop_index):
    # query stopword occupies qpos 2 -> needs a 1-position gap in docs;
    # doc 1's "the" consumes hit pos 2, so big@1 cat@3 matches; doc 3
    # has "red" at pos 2 -> gap also matches (reference semantics:
    # the stopword slot is an unconstrained gap)
    assert _ids(stop_index, '"big the cat"') == [1, 3]


def test_adjacent_phrase_rejects_gap(stop_index):
    # "big cat" = adjacent positions; doc 1's stopword consumed a
    # position so big@1 cat@3 does NOT match; doc 2 does
    assert _ids(stop_index, '"big cat"') == [2]


def test_querypos_gap_in_parser(stop_index):
    tree = stop_index.parse('"big the cat"')
    assert tree.op == "phrase"
    assert [(w.word, w.querypos) for w in tree.words] == [
        ("big", 1), ("cat", 3),
    ]
