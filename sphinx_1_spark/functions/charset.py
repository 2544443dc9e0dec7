"""charset_table parsing and codepoint folding.

Semantic parity: Sphinx builds a codepoint->codepoint remap from spec
strings like ``0..9, A..Z->a..z, _, a..z, U+410..U+42F->U+430..U+44F``
(CSphCharsetDefinitionParser, reference src/sphinx.cpp:2609+; default
UTF-8 table at src/sphinx.cpp:167). Codepoints absent from the table
fold to 0 and act as token separators.

We compile the spec once into a numpy uint32 lookup table over the
full Unicode range; folding a document is then a single fancy-index —
the vectorized heart of the tokenizer UDF.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

SPHINX_DEFAULT_UTF8_TABLE = (
    "0..9, A..Z->a..z, _, a..z, U+410..U+42F->U+430..U+44F, U+430..U+44F"
)

_MAX_CP = 0x110000


def _parse_char(tok: str) -> int:
    tok = tok.strip()
    if tok.upper().startswith("U+"):
        return int(tok[2:], 16)
    if len(tok) != 1:
        raise ValueError(f"bad charset_table char spec: {tok!r}")
    return ord(tok)


@lru_cache(maxsize=16)
def build_fold_table(spec: str = SPHINX_DEFAULT_UTF8_TABLE) -> np.ndarray:
    """Compile a charset_table spec into a uint32[0x110000] fold map.

    Supported entry forms (same grammar as the reference parser):
      X            keep codepoint as-is
      X..Y         keep range
      X->Y         remap single
      X..Y->A..B   remap range (lengths must match)
      X..Y/2       checkerboard: pairs (X,X+1)->X+1, (X+2,X+3)->X+3, ...
    """
    table = np.zeros(_MAX_CP, dtype=np.uint32)
    for raw in spec.split(","):
        entry = raw.strip()
        if not entry:
            continue
        if entry.endswith("/2"):
            lo, hi = (_parse_char(p) for p in entry[:-2].split(".."))
            for a in range(lo, hi + 1, 2):
                table[a] = a + 1
                table[a + 1] = a + 1
            continue
        if "->" in entry:
            src, dst = entry.split("->")
            if ".." in src:
                s_lo, s_hi = (_parse_char(p) for p in src.split(".."))
                d_lo, d_hi = (_parse_char(p) for p in dst.split(".."))
                if s_hi - s_lo != d_hi - d_lo:
                    raise ValueError(f"range length mismatch: {entry!r}")
                table[s_lo : s_hi + 1] = np.arange(d_lo, d_hi + 1, dtype=np.uint32)
            else:
                table[_parse_char(src)] = _parse_char(dst)
            continue
        if ".." in entry:
            lo, hi = (_parse_char(p) for p in entry.split(".."))
            table[lo : hi + 1] = np.arange(lo, hi + 1, dtype=np.uint32)
            continue
        cp = _parse_char(entry)
        table[cp] = cp
    return table


def text_to_codepoints(text: str) -> np.ndarray:
    """Decode a python str to a uint32 codepoint array (vectorized)."""
    if not text:
        return np.empty(0, dtype=np.uint32)
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def fold_codepoints(cps: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Apply the fold map; 0 = separator."""
    if cps.size == 0:
        return cps
    return table[cps]


def codepoints_to_text(cps: np.ndarray) -> str:
    return cps.astype("<u4").tobytes().decode("utf-32-le")
