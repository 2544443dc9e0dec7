"""Excerpt (snippet) generator vs the reference's own golden outputs.

The reference e2e harness (test/test_18 "excerpts") ships model.bin —
the PHP-serialized output of the COMPILED reference across a 16-way
config cross-product (charset x min_word_len x stopwords x synonyms).
We replay the exact same docs/words/options through our port and
require byte-identical excerpts on every variant our tokenizer
supports (the 8 non-synonym ones; synonyms = multiforms are a
tokenizer feature tracked separately).

Variant index decoding (ubertest.php cross-product, first Dynamic in
document order = high bit): idx = syn*8 + stop*4 + mwl*2 + charset,
bit 0 = the first <Variant> listed (syn=on, stop=on, mwl=1, utf8).
"""

from __future__ import annotations

import pytest

from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings
from sphinx_1_spark.operators.excerpts import (
    ExcerptOptions,
    build_excerpt,
)
from tests.php_unserialize import loads

MODEL = "/root/reference/test/test_18/model.bin"

DOCS = [
    "ab ab ab ab ab ab ab ab ab ab ab MS",
    "   this,   is .    MS windows....?",
    "this  ,  is a MS but not Windows",
    "this is the Microsoft  Windows , ,",
    "proﬁts, lost savings",
]
WORDS = "MS Windows"
STOPWORDS = frozenset({"a", "the", "and", "of"})  # test/stopwords.txt


SYNONYMS = (  # test/synonyms.txt
    "MS Windows => Windows",
    "Microsoft Windows => Windows",
    "Windows => Windows",
)


def _variants():
    model = loads(open(MODEL, "rb").read())
    out = []
    for syn_bit, syns in ((0, SYNONYMS), (1, ())):
        for stop_bit, stops in ((0, STOPWORDS), (1, frozenset())):
            for mwl_bit, mwl in ((0, 1), (1, 3)):
                vi = syn_bit * 8 + stop_bit * 4 + mwl_bit * 2  # charset=utf8
                out.append((vi, mwl, stops, syns, model[vi][0]))
    return out


@pytest.mark.parametrize(
    "vi,mwl,stops,syns,runs",
    _variants(),
    ids=lambda v: str(v) if isinstance(v, int) else None,
)
def test_excerpts_golden_test18(vi, mwl, stops, syns, runs):
    tk = Tokenizer(
        TokenizerSettings(min_word_len=mwl, stopwords=stops, synonyms=syns)
    )
    # runs = [opts, excerpts, opts, excerpts, opts, excerpts]
    for i in range(0, len(runs), 2):
        o = runs[i]
        expected = runs[i + 1]
        opts = ExcerptOptions(
            before_match=o["before_match"],
            after_match=o["after_match"],
            chunk_separator=o["chunk_separator"],
            limit=o["limit"],
            around=o["around"],
        )
        for doc, want in zip(DOCS, expected):
            got = build_excerpt(doc, WORDS, opts, tk)
            assert got == want, (
                f"variant {vi} limit={o['limit']} doc={doc!r}\n"
                f"  want: {want!r}\n  got:  {got!r}"
            )


def test_excerpts_star_and_phrase():
    """Star wildcard + exact_phrase paths (no reference golden for
    these options in test_18; assert the behavioral contract)."""
    tk = Tokenizer(TokenizerSettings())
    # trailing star: prefix match
    out = build_excerpt(
        "winter wind windmill dow", "wind*", ExcerptOptions(limit=0), tk
    )
    assert out == "winter <b>wind</b> <b>windmill</b> dow"
    # exact_phrase highlights only adjacent sequence
    out = build_excerpt(
        "ms office and ms windows here",
        "ms windows",
        ExcerptOptions(limit=0, exact_phrase=True),
        tk,
    )
    assert out == "ms office and <b>ms windows</b> here"


def test_excerpts_no_match_leading_tokens():
    tk = Tokenizer(TokenizerSettings())
    out = build_excerpt(
        "alpha beta gamma delta epsilon zeta eta theta",
        "missing",
        ExcerptOptions(limit=12),
        tk,
    )
    assert out.endswith(" ... ")
    assert out.startswith("alpha beta")


def test_excerpts_dataframe_op(spark):
    from sphinx_1_spark.operators.excerpts import excerpts

    df = spark.createDataFrame(
        [(1, "hello world of search engines"), (2, "no matches here")],
        ["id", "body"],
    )
    rows = {
        r["id"]: r["excerpt"]
        for r in excerpts(df, "body", "search", ExcerptOptions(limit=0)).collect()
    }
    assert rows[1] == "hello world of <b>search</b> engines"
    assert rows[2] == "no matches here"
