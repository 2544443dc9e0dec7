"""Differential fuzz: vectorized tokenizer fast path vs the scalar
scanner on identical plain configs.

The engine keeps TWO independent implementations of the reference
UTF-8 tokenizer: the numpy fast path (functions/tokenizer.py `_runs`/
`_emit`, used when no specials/synonyms/boundaries are configured)
and the faithful scalar state-machine port (functions/scanner.py,
`GetToken` src/sphinx.cpp:4238-4368) that excerpts and advanced
configs use.  They also parse the charset_table spec through two
different code paths (build_fold_table vs Lowercaser).  On any
config BOTH can serve, their full token streams — (raw, normalized,
position) including overshort/stopword position stepping and the
64-codepoint SPH_MAX_WORD_LEN truncation — must be identical; the
goldens pin each side separately against the reference, this fuzz
pins them against each other across randomized text x settings.

The CJK n-gram variant is included: the fast path's `_tokenize_cjk`
run-classifier vs the scanner's FLAG_NGRAM specials
(SetNgramChars, src/sphinx.cpp:4927-4947) must agree too.
"""

from __future__ import annotations

import random

import pytest

from sphinx_1_spark.functions.charset import SPHINX_DEFAULT_UTF8_TABLE
from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings

TABLES = (
    SPHINX_DEFAULT_UTF8_TABLE,
    SPHINX_DEFAULT_UTF8_TABLE + ", U+27",  # apostrophe as word char
    "0..9, a..z, A..Z->a..z",  # no underscore, Cyrillic separates
)

_ASCII = ("table", "scan", "the", "a", "of", "merge", "bm25", "ok",
          "x1", "q", "zz", "index42", "_lead", "tail_", "mid_dle")
_CYR = ("привет", "МИР", "Це", "ёж", "да")
_CJK = ("中文", "分词", "你好世界", "搜")
_SEP = (" ", "  ", "\t", "\n", ", ", ". ", "!", "--", "(", ")", "'",
        "©", "\N{GREEK SMALL LETTER ALPHA}", "\U0001F600", "/")


def _mktext(rng: random.Random, with_cjk: bool) -> str:
    parts = []
    for _ in range(rng.randint(0, 30)):
        r = rng.random()
        if r < 0.45:
            parts.append(rng.choice(_ASCII))
        elif r < 0.6:
            parts.append(rng.choice(_CYR))
        elif r < 0.68 and with_cjk:
            parts.append(rng.choice(_CJK))
        elif r < 0.75:
            parts.append(str(rng.randint(0, 99999)))
        elif r < 0.8:  # uberlong run (SPH_MAX_WORD_LEN truncation)
            parts.append("q" * rng.randint(60, 80))
        else:
            parts.append(rng.choice(_SEP))
        if rng.random() < 0.7:
            parts.append(rng.choice(_SEP))
    return "".join(parts)


def _mksettings(rng: random.Random, with_cjk: bool) -> TokenizerSettings:
    stop = set()
    if rng.random() < 0.5:
        stop = set(rng.sample(("the", "a", "of", "да", "scan"), rng.randint(1, 3)))
    wf = {}
    if rng.random() < 0.4:
        wf = {"bm25": "okapi", "привет": "hi"}
    return TokenizerSettings(
        charset_table=rng.choice(TABLES),
        min_word_len=rng.choice((1, 1, 2, 3, 5)),
        overshort_step=rng.choice((0, 1, 1, 2)),
        stopword_step=rng.choice((0, 1, 1)),
        stopwords=frozenset(stop),
        wordforms=tuple(wf.items()),
        ngram_chars="U+4E00..U+9FFF" if with_cjk else "",
    )


def test_random_charset_specs_parse_identically():
    """The charset_table spec grammar is implemented twice:
    build_fold_table compiles entries directly into the fold map,
    the Lowercaser goes through parse_charset_ranges + the
    CSphLowercaser AddRemaps merge (src/sphinx.cpp:2504-2583).  On
    any plain spec (no flag remaps) both must produce the same
    codepoint fold — random specs over every entry form: X, X..Y,
    X->Y, X..Y->A..B, X..Y/2."""
    import numpy as np

    from sphinx_1_spark.functions.charset import (
        MASK_CODEPOINT,
        Lowercaser,
        build_fold_table,
    )

    rng = random.Random(31337)
    forms = ("single", "range", "remap", "range_remap", "checker")
    for case in range(300):
        entries = []
        for _ in range(rng.randint(1, 8)):
            form = rng.choice(forms)
            lo = rng.randint(0x21, 0x2F00)
            span = rng.randint(0, 40)
            as_u = lambda cp: (
                f"U+{cp:X}" if rng.random() < 0.7 or not (0x21 <= cp < 0x7F)
                or chr(cp) in ",.-/>" else chr(cp)
            )
            if form == "single":
                entries.append(as_u(lo))
            elif form == "range":
                entries.append(f"{as_u(lo)}..{as_u(lo + span)}")
            elif form == "remap":
                entries.append(f"{as_u(lo)}->{as_u(rng.randint(0x21, 0x2F00))}")
            elif form == "range_remap":
                dlo = rng.randint(0x21, 0x2F00)
                entries.append(
                    f"{as_u(lo)}..{as_u(lo + span)}->{as_u(dlo)}..{as_u(dlo + span)}"
                )
            else:
                hi = lo + 2 * rng.randint(0, 20) + 1  # odd-length pairs
                entries.append(f"{as_u(lo)}..{as_u(hi)}/2")
        spec = ", ".join(entries)
        build_fold_table.cache_clear()  # random specs would thrash it
        ft = build_fold_table(spec)
        lc = Lowercaser(spec).table & np.uint32(MASK_CODEPOINT)
        if not np.array_equal(ft, lc):
            bad = np.flatnonzero(ft != lc)[:10]
            raise AssertionError(
                f"case {case}: spec={spec!r}\n"
                f"diff cps {[hex(b) for b in bad]}: "
                f"fold={ft[bad].tolist()} lowercaser={lc[bad].tolist()}"
            )


@pytest.mark.parametrize("with_cjk", (False, True), ids=("plain", "ngram"))
def test_fast_path_stream_equals_scanner_stream(with_cjk):
    rng = random.Random(5150 + with_cjk)
    n_nonempty = n_trunc = n_stop = 0
    for i in range(400):
        s = _mksettings(rng, with_cjk)
        tok = Tokenizer(s)
        assert not tok._advanced  # both paths legal for this config
        text = _mktext(rng, with_cjk)
        fast = tok._full_stream(text)
        slow = tok._emit_scanner(text)
        assert fast == slow, (
            f"case {i}: settings={s}\ntext={text!r}\n"
            f"fast[:8]={fast[:8]}\nslow[:8]={slow[:8]}"
        )
        n_nonempty += bool(fast)
        n_trunc += any(len(raw) == 64 for raw, _n, _p in fast)
        n_stop += any(n is None for _r, n, _p in fast)
    assert n_nonempty >= 300 and n_trunc >= 30 and n_stop >= 40, (
        n_nonempty, n_trunc, n_stop
    )
