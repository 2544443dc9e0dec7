"""MMSEG Chinese tokenizer token-identity tests.

Goldens in tests/goldens/mmseg_goldens.jsonl were produced by driving
the reference CSphTokenizer_UTF8Chinese (src/sphinx.cpp:4412-4912)
compiled from /root/reference, with a darts dictionary built by the
reference's own mkdict from tests/goldens/mmseg_testdict.txt (3,121
synthetic word\\tfreq entries over U+4E00..U+4FFF).  Inputs that
overflow the reference's 64-chunk buffer (its segfault bug,
src/sphinx.cpp:4434) are excluded — see functions/mmseg.py docstring.
"""

import json
import os

import pytest

from sphinx_1_spark.functions.charset import build_fold_table
from sphinx_1_spark.functions.mmseg import ChineseTokenizer, MMSegDict
from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings

HERE = os.path.dirname(__file__)
DICT = os.path.join(HERE, "goldens", "mmseg_testdict.txt")
GOLDENS = os.path.join(HERE, "goldens", "mmseg_goldens.jsonl")


@pytest.fixture(scope="module")
def ztok():
    return ChineseTokenizer(MMSegDict.load(DICT), build_fold_table())


def test_goldens_token_identical(ztok):
    with open(GOLDENS) as f:
        cases = [json.loads(line) for line in f]
    assert len(cases) >= 200
    bad = []
    for c in cases:
        got = [t for t, _ in ztok.tokenize(c["text"].encode("utf-8"))]
        if got != c["tokens"]:
            bad.append((c["text"], c["tokens"], got))
    assert not bad, f"{len(bad)} mismatches; first: {bad[0]!r}"


def test_dict_word_segmentation(ztok):
    d = ztok.dict
    # pick two multi-char dict words and concatenate them
    words = [w for w in d.freq if len(w) >= 6][:2]
    text = b"".join(words)
    toks = [t for t, _ in ztok.tokenize(text)]
    assert "".join(toks) == text.decode("utf-8")


def test_latin_fallback_and_folding(ztok):
    toks = [t for t, _ in ztok.tokenize(b"Hello WORLD_9")]
    assert toks == ["hello", "world_9"]


def test_non_dict_cjk_dropped(ztok):
    # codepoint far outside the dictionary range and not a word char
    toks = [t for t, _ in ztok.tokenize("abc龻def".encode())]
    assert toks == ["abc", "def"]


def test_tokenizer_integration_positions():
    tok = Tokenizer(TokenizerSettings(mmseg_dict_path=DICT))
    d = MMSegDict.load(DICT)
    w = next(w for w in d.freq if len(w) >= 6).decode("utf-8")
    toks = tok.tokenize_with_positions(f"alpha {w} beta")
    words = [t for t, _ in toks]
    poss = [p for _, p in toks]
    assert words[0] == "alpha" and words[-1] == "beta"
    assert poss == list(range(1, len(words) + 1))


def test_mmseg_rule_filters(ztok):
    """Rules prefer longer total chunks / fewer words: a run that is
    fully covered by multi-char dict words segments into them, not
    into single chars."""
    d = ztok.dict
    w3 = next(w for w in d.freq if len(w) == 9)  # 3-char word
    toks = [t for t, _ in ztok.tokenize(w3)]
    assert toks == [w3.decode("utf-8")]


def test_fast_path_equals_scalar_fuzz(ztok):
    """The vectorized tokenize pre-pass (_tokenize_fast) must be
    token-stream-identical to the reference-shaped scalar loop on
    mixed ASCII/CJK buffers, including dict-word rewinds, overshorts,
    >64-cp runs, NULs and partial dict-word prefixes."""
    import random

    words = [w.decode("utf-8", "replace") for w in ztok.dict.freq]
    rng = random.Random(0x5EED)

    def mkdoc():
        parts = []
        for _ in range(rng.randint(0, 40)):
            roll = rng.random()
            if roll < 0.45:
                parts.append(rng.choice(words))
            elif roll < 0.62:
                parts.append(
                    "w%04d" % rng.randrange(5000) + rng.choice([" ", "", ". "])
                )
            elif roll < 0.72:
                parts.append(
                    "".join(
                        chr(0x4E00 + rng.randrange(0x200))
                        for _ in range(rng.randint(1, 5))
                    )
                )
            elif roll < 0.80:
                parts.append(
                    rng.choice([" ", "\n", "\t", "-", "x", "a" * 70, "字" * 70])
                )
            elif roll < 0.90:
                w = rng.choice(words)
                parts.append(w[: max(1, len(w) - 1)])
            else:
                parts.append(chr(rng.randrange(0x20, 0x3000)))
        return "".join(parts)

    from sphinx_1_spark.functions.mmseg import ChineseTokenizer

    for mwl in (1, 2):
        tok = ChineseTokenizer(ztok.dict, ztok.fold, mwl)
        for _ in range(400):
            doc = mkdoc().encode("utf-8")
            if rng.random() < 0.05:
                doc += b"\0tail"
            assert tok.tokenize(doc) == tok._tokenize_scalar(doc), doc[:120]


def test_invalid_utf8_falls_back_to_scalar(ztok):
    bad = "中文 test".encode() + b"\xe4\x80" + b" tail \xff\xfe"
    assert ztok.tokenize(bad) == ztok._tokenize_scalar(bad)
