"""Multi-word wordforms (CSphTokenizer_Filter + CSphMultiformContainer,
src/sphinx.cpp:4954-5092): sequence replacement on the token stream,
with the reference's exact buffering quirks."""

import pytest

from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings

MF = (
    "core 2 duo > c2d",
    "gnu linux > gnulinux",
    "core two duo > c2d",
)


def _tok(**kw):
    return Tokenizer(TokenizerSettings(multiforms=MF, **kw))


def test_basic_replacement():
    tk = _tok()
    assert tk.tokenize("i love my core 2 duo laptop") == [
        "i", "love", "my", "c2d", "laptop",
    ]


def test_two_forms_same_key():
    tk = _tok()
    assert tk.tokenize("core two duo and core 2 duo") == ["c2d", "and", "c2d"]


def test_partial_sequence_passes_through():
    tk = _tok()
    assert tk.tokenize("core 2 trio") == ["core", "2", "trio"]
    # eof underflow: fewer tokens than the shortest form -> head emitted
    assert tk.tokenize("core 2") == ["core", "2"]
    assert tk.tokenize("core") == ["core"]


def test_replacement_consumes_one_position():
    tk = _tok()
    assert tk.tokenize_with_positions("a core 2 duo b") == [
        ("a", 1), ("c2d", 2), ("b", 3),
    ]


def test_chained_occurrences():
    tk = _tok()
    assert tk.tokenize("gnu linux gnu linux gnu") == [
        "gnulinux", "gnulinux", "gnu",
    ]


def test_normal_form_feeds_wordforms_and_stopwords():
    # emitted normal form still passes GetWordID: wordforms remap,
    # then the stopword filter
    tk = _tok(wordforms=(("c2d", "cpu"),))
    assert tk.tokenize("core 2 duo") == ["cpu"]
    tk2 = _tok(stopwords=frozenset({"c2d"}))
    assert tk2.tokenize("fast core 2 duo box") == ["fast", "box"]


def test_spans_cover_merged_source():
    tk = _tok()
    sc = tk.make_scanner()
    sc.set_buffer("xx core 2 duo yy")
    toks = []
    while True:
        t = sc.get_token()
        if t is None:
            break
        toks.append((t, sc.token_start, sc.token_end))
    assert toks == [("xx", 0, 2), ("c2d", 3, 13), ("yy", 14, 16)]


def test_single_word_lines_rejected():
    with pytest.raises(ValueError):
        Tokenizer(TokenizerSettings(multiforms=("folded > wrapped",))).tokenize("x")
