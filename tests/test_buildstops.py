"""indexer --buildstops / --buildfreqs (src/indexer.cpp:911-934).

The reference swaps the index dict for CSphStopwordBuilderDict
(:173-211): every token the source pipeline emits is counted AS-IS —
LoadStopwords/LoadWordforms/SetMorphology are no-ops and
GetMultiWordforms returns NULL, so dict-level transforms are off while
tokenizer-level behavior (folding, min_word_len, synonyms, CJK) stays
the index's own.  Save (:213-245) writes the top-N by count, one word
per line ("word count" with --buildfreqs).  Tie order: the reference
sorts by count only (Word_t operator<, :167-170) and ties come out in
hash-iteration order — unspecified; this port's deterministic
deviation is word ASC within a count.
"""

import collections
import re

import pytest

from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings
from sphinx_1_spark.plans.segment_index import (
    build_stopwords,
    save_stopwords,
    stopword_builder_settings,
)


def _texts_df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_counts_match_naive_oracle(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the dog sleeps",
        "quick quick brown",
        "",
    ]
    got = build_stopwords(
        _texts_df(spark, texts), TokenizerSettings(), top_n=100, text_col="text"
    ).collect()
    want = collections.Counter()
    for t in texts:
        want.update(re.findall(r"[a-z0-9_]+", t.lower()))
    assert {(r.word, r.freq) for r in got} == set(want.items())
    # ordering: freq desc, word asc
    assert [(r.word, r.freq) for r in got] == sorted(
        want.items(), key=lambda kv: (-kv[1], kv[0])
    )


def test_dict_level_features_are_not_applied(spark):
    """Stopwords, morphology and wordforms are dict-level: the builder
    counts the raw tokenized forms (CSphStopwordBuilderDict's no-op
    LoadStopwords/SetMorphology/LoadWordforms)."""
    settings = TokenizerSettings(
        stopwords=frozenset({"the"}),
        morphology=("stem_en",),
        wordforms=(("cats", "feline"),),
    )
    texts = ["the cats running the cats"]
    got = {
        (r.word, r.freq)
        for r in build_stopwords(
            _texts_df(spark, texts), settings, top_n=10, text_col="text"
        ).collect()
    }
    # raw forms, unstemmed, unmapped, stopword kept
    assert got == {("the", 2), ("cats", 2), ("running", 1)}


def test_tokenizer_level_features_are_applied(spark):
    """min_word_len and charset folding live in the tokenizer, so the
    builder honors them (the builder dict only replaces the DICT)."""
    settings = TokenizerSettings(min_word_len=3)
    texts = ["AB abc ABC xy z"]
    got = {
        (r.word, r.freq)
        for r in build_stopwords(
            _texts_df(spark, texts), settings, top_n=10, text_col="text"
        ).collect()
    }
    assert got == {("abc", 2)}


def test_top_n_and_tie_order(spark):
    texts = ["b b a a c"]
    rows = build_stopwords(
        _texts_df(spark, texts), TokenizerSettings(), top_n=2, text_col="text"
    ).collect()
    # a and b tie at 2; word asc breaks the tie, c (freq 1) is cut
    assert [(r.word, r.freq) for r in rows] == [("a", 2), ("b", 2)]


def test_html_input_is_stripped(spark):
    html = [
        b"<html><script>var ignored = 1;</script><p>kept words</p></html>",
        b"<b>kept</b>",
    ]
    df = spark.createDataFrame([(h,) for h in html], "html binary")
    got = {
        (r.word, r.freq)
        for r in build_stopwords(df, TokenizerSettings(), top_n=10).collect()
    }
    assert got == {("kept", 2), ("words", 1)}


def test_with_docs_document_frequency(spark):
    texts = ["a a b", "a c", "c"]
    got = {
        (r.word, r.freq, r.docs)
        for r in build_stopwords(
            _texts_df(spark, texts),
            TokenizerSettings(),
            top_n=10,
            text_col="text",
            with_docs=True,
        ).collect()
    }
    assert got == {("a", 3, 2), ("b", 1, 1), ("c", 2, 2)}


@pytest.mark.parametrize("with_freqs", [False, True])
def test_save_file_format(spark, tmp_path, with_freqs):
    texts = ["x x y"]
    top = build_stopwords(
        _texts_df(spark, texts), TokenizerSettings(), top_n=10, text_col="text"
    )
    out = tmp_path / "stops.txt"
    n = save_stopwords(top, str(out), with_freqs=with_freqs)
    assert n == 2
    lines = out.read_text().splitlines()
    assert lines == (["x 2", "y 1"] if with_freqs else ["x", "y"])


def test_builder_settings_strip_only_dict_features():
    s = TokenizerSettings(
        min_word_len=4,
        stopwords=frozenset({"a"}),
        wordforms=(("b", "c"),),
        morphology=("stem_en",),
        multiforms=("w1 w2 > n",),
        index_exact_words=True,
        synonyms=("from => to",),
        ngram_chars="U+4E00..U+9FBF",
    )
    b = stopword_builder_settings(s)
    assert not b.stopwords and not b.wordforms and not b.morphology
    assert not b.multiforms and not b.index_exact_words
    # tokenizer-level settings survive
    assert b.min_word_len == 4
    assert b.synonyms == s.synonyms
    assert b.ngram_chars == s.ngram_chars


def test_cjk_tokens_counted_per_ngram(spark):
    """ngram_chars segmentation is tokenizer-level: CJK codepoints
    count one-per-character, exactly as they would be indexed."""
    texts = ["中文 hello 中"]
    got = {
        (r.word, r.freq)
        for r in build_stopwords(
            _texts_df(spark, texts),
            TokenizerSettings(ngram_chars="U+4E00..U+9FBF"),
            top_n=10,
            text_col="text",
        ).collect()
    }
    assert got == {("中", 2), ("文", 1), ("hello", 1)}


def test_cli_buildstops(tmp_path):
    """--buildstops replaces indexing (DoIndex returns after
    tDict.Save); --buildfreqs adds counts.  Runs the job script in a
    subprocess because its main() owns (and stops) a SparkSession."""
    import json
    import subprocess
    import sys

    out = tmp_path / "stops.txt"
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/build_index_job.py",
            "--synthetic",
            "300",
            "--output",
            str(tmp_path / "unused"),
            "--buildstops",
            str(out),
            "5",
            "--buildfreqs",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stat = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stat["buildstops"] == str(out) and stat["words"] == 5
    lines = out.read_text().splitlines()
    assert len(lines) == 5
    freqs = [int(l.split()[1]) for l in lines]
    assert freqs == sorted(freqs, reverse=True) and freqs[0] >= freqs[-1]
    # the synthetic corpus' deliberate head term must surface first
    assert lines[0].split()[0] == "the"


def test_buildfreqs_requires_buildstops():
    import subprocess
    import sys

    proc = subprocess.run(
        [
            sys.executable,
            "scripts/build_index_job.py",
            "--synthetic",
            "10",
            "--output",
            "/tmp/x",
            "--buildfreqs",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert proc.returncode != 0
    assert "--buildstops" in proc.stderr
