"""Tokenizer golden cases in the spirit of the reference C++ unit
tests (src/tests.cpp:86-130): folding, positions, overshort/stopword
steps, field-end marking, CJK n-gram splitting."""

from sphinx_1_spark.functions.charset import (
    SPHINX_DEFAULT_UTF8_TABLE,
    build_fold_table,
)
from sphinx_1_spark.functions.tokenizer import (
    HIT_FIELD_END,
    Tokenizer,
    TokenizerSettings,
)


def test_default_fold_table():
    t = build_fold_table(SPHINX_DEFAULT_UTF8_TABLE)
    assert t[ord("A")] == ord("a")
    assert t[ord("z")] == ord("z")
    assert t[ord("5")] == ord("5")
    assert t[ord("_")] == ord("_")
    assert t[ord(" ")] == 0
    assert t[ord("-")] == 0
    assert t[0x410] == 0x430  # А -> а
    assert t[0x44F] == 0x44F  # я stays


def test_basic_tokens_and_positions():
    tok = Tokenizer()
    assert tok.tokenize("This is MY rifle") == ["this", "is", "my", "rifle"]
    assert tok.tokenize_with_positions("Hello, World!") == [
        ("hello", 1),
        ("world", 2),
    ]
    # separators do not advance positions
    assert tok.tokenize_with_positions("..a..b..") == [("a", 1), ("b", 2)]


def test_min_word_len_overshort_step():
    # min_word_len=3: short tokens dropped but step position
    # (src/sphinx.cpp:18528: iPos += iLastStep + overshort*step)
    tok = Tokenizer(TokenizerSettings(min_word_len=3))
    assert tok.tokenize_with_positions("aa bbb c dddd") == [
        ("bbb", 2),
        ("dddd", 4),
    ]


def test_stopword_step():
    tok = Tokenizer(TokenizerSettings(stopwords=frozenset({"the"})))
    assert tok.tokenize_with_positions("the quick the fox") == [
        ("quick", 2),
        ("fox", 4),
    ]


def test_cyrillic_folding():
    tok = Tokenizer()
    assert tok.tokenize("ПРИВЕТ мир") == ["привет", "мир"]


def test_max_word_len_truncated():
    tok = Tokenizer()
    long = "x" * 100
    toks = tok.tokenize(long)
    assert toks == ["x" * 64]


def test_hits_field_packing():
    tok = Tokenizer()
    hits = tok.hits_for_doc(["a b", "c"])
    # field 0: a@1, b@2(last, FIELD_END); field 1: c@1(last, FIELD_END)
    assert hits == [
        ("a", 1),
        ("b", 2 | HIT_FIELD_END),
        ("c", (1 << 24) | 1 | HIT_FIELD_END),
    ]


def test_ngram_chars_cjk():
    tok = Tokenizer(TokenizerSettings(ngram_chars="U+4E00..U+9FBF"))
    assert tok.tokenize("中文abc测试") == ["中", "文", "abc", "测", "试"]


def test_empty_and_none_fields():
    tok = Tokenizer()
    assert tok.hits_for_doc([None, "", "x"]) == [
        ("x", (2 << 24) | 1 | HIT_FIELD_END)
    ]


def test_native_matches_arrow_on_ascii(spark):
    """The pure-Catalyst tokenizer and the pandas-UDF tokenizer must
    produce identical hits on ASCII text."""
    from sphinx_1_spark.operators.hits import build_hits_arrow, build_hits_native

    rows = [
        (1, "Hello, World! foo_bar BAZ"),
        (2, "...leading seps 123 mixed-Case..."),
        (3, None),
        (4, ""),
        (5, "one"),
    ]
    df = spark.createDataFrame(rows, "docid long, text string")
    nat = sorted(
        tuple(r) for r in build_hits_native(df, "docid", ["text"]).collect()
    )
    arr = sorted(
        tuple(r)
        for r in build_hits_arrow(df, "docid", ["text"], TokenizerSettings()).collect()
    )
    assert nat == arr


def test_wordforms_applied_before_stopwords():
    from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings

    tok = Tokenizer(
        TokenizerSettings(
            wordforms=(("walks", "walk"), ("running", "run")),
            stopwords=frozenset({"run"}),
        )
    )
    # wordform remap, then the mapped form hits the stopword filter
    assert tok.tokenize("walks running walked") == ["walk", "walked"]
    # positions: stopword consumed a position step
    assert tok.tokenize_with_positions("walks running walked") == [
        ("walk", 1),
        ("walked", 3),
    ]
