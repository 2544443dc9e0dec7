"""Scalar scanner (specials/duals/synonyms/escaping) vs the reference
C++ unit-test goldens.

Cases ported verbatim from TestTokenizer (src/tests.cpp:86-190):
run 1 = specials only, run 2 = + synonyms file, run 3 = + escaping.
Tokenizer config is CreateTestTokenizer (src/tests.cpp:85-97):
charset "-, 0..9, A..Z->a..z, _, a..z, U+80..U+FF", min_word_len=2,
specials "!-", synonyms from CreateSynonymsFile (src/tests.cpp:27-52).
"""

from __future__ import annotations

import pytest

from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings

CHARSET = "-, 0..9, A..Z->a..z, _, a..z, U+80..U+FF"
MAGIC = "тесттт"  # тесттт (valid UTF-8 magic)

SYN_LINES = (
    "AT&T      => AT&T",
    "   AT & T => AT & T  ",
    "standarten fuehrer => Standartenfuehrer",
    "standarten fuhrer  => Standartenfuehrer",
    "OS/2 => OS/2",
    "Ms-Dos => MS-DOS",
    "MS DOS => MS-DOS",
    "feat. => featuring",
    "U.S. => US",
    "U.S.A. => USA",
    "U.S.B. => USB",
    "U.S.D. => USD",
    "U.S.P. => USP",
    "U.S.A.F. => USAF",
    f"{MAGIC} => test",
)

# (min_run, text, expected tokens)
CASES = [
    (1, "", []),
    (1, "this is my rifle", ["this", "is", "my", "rifle"]),
    (1, "This is MY rifle", ["this", "is", "my", "rifle"]),
    (1, "i-phone", ["i-phone"]),
    (1, "i phone", ["phone"]),
    (1, "this is m", ["this", "is"]),
    (1, "the -phone", ["the", "-", "phone"]),
    (1, "the!phone", ["the", "!", "phone"]),
    (1, "i!phone", ["!", "phone"]),
    (1, "/-hi", ["-", "hi"]),
    (2, "AT&T", ["AT&T"]),
    (2, "AT & T", ["AT & T"]),
    (2, "AT    &  T", ["AT & T"]),
    (2, "-AT&T", ["-", "AT&T"]),
    (2, "AT&", ["at"]),
    (2, "AT&tee.yo", ["at", "tee", "yo"]),
    (2, "standarten fuehrer", ["Standartenfuehrer"]),
    (2, "standarten fuhrer", ["Standartenfuehrer"]),
    (2, "standarten fuehrerr", ["standarten", "fuehrerr"]),
    (2, "standarten fuehrer Stirlitz", ["Standartenfuehrer", "stirlitz"]),
    (2, "OS/2 vs OS/360 vs Ms-Dos", ["OS/2", "vs", "os", "360", "vs", "MS-DOS"]),
    (2, "AT ", ["at"]),
    (2, "AT&T&TT", ["AT&T", "tt"]),
    (2, "http://OS/2", ["http", "OS/2"]),
    (2, "AT*&*T", ["at"]),
    (2, "# OS/2's system install", ["OS/2", "system", "install"]),
    (2, "IBM-s/OS/2/Merlin", ["ibm-s", "OS/2", "merlin"]),
    (2, "U.S.A", ["US"]),
    (2, "AT&T!", ["AT&T", "!"]),
    (2, "AT&T!!!", ["AT&T", "!", "!", "!"]),
    (2, "U.S.A.!", ["USA", "!"]),
    (
        2,
        "MS DOSS feat.Deskview.MS DOS",
        ["ms", "doss", "featuring", "deskview", "MS-DOS"],
    ),
    (2, MAGIC, ["test"]),
    (2, "U.S. U.S.A. U.S.A.F.", ["US", "USA", "USAF"]),
    (
        2,
        "U.S.AB U.S.A. U.S.B.U.S.D.U.S.U.S.A.F.",
        ["US", "ab", "USA", "USB", "USD", "US", "USAF"],
    ),
    (3, "phon\\e", ["phone"]),
    (3, "\\thephone", ["thephone"]),
    (3, "the\\!phone", ["the", "phone"]),
    (3, "\\!phone", ["phone"]),
    (3, "\\\\phone", ["phone"]),
    (3, "pho\\\\ne", ["pho", "ne"]),
    (3, "phon\\\\e", ["phon"]),
]


def _tok(run: int) -> Tokenizer:
    return Tokenizer(
        TokenizerSettings(
            charset_table=CHARSET,
            min_word_len=2,
            specials="!-",
            synonyms=SYN_LINES if run >= 2 else (),
            escaped=run == 3,
        )
    )


@pytest.mark.parametrize("run", [1, 2, 3])
def test_tokenizer_goldens(run):
    tk = _tok(run)
    for min_run, text, expected in CASES:
        if min_run > run:
            continue
        got = tk.tokenize(text)
        assert got == expected, f"run={run} text={text!r}: {got} != {expected}"


@pytest.mark.parametrize("run", [1, 2, 3])
def test_high_codepoint_word_chars(run):
    # dTests2 UTF-8 case: U+80..U+FF are word chars
    tk = _tok(run)
    assert tk.tokenize("\x80\x81\x82") == ["\x80\x81\x82"]


@pytest.mark.parametrize("run", [1, 2, 3])
def test_uberlong_token(run):
    # 4096 'a' -> one 64-char token (SPH_MAX_WORD_LEN), nothing after
    tk = _tok(run)
    assert tk.tokenize("a" * 4096) == ["a" * 64]
