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
                   (reference loops `i < iEnd` — an even-span range
                   leaves Y itself unmapped, src/sphinx.cpp:2800-2807)
    """
    table = np.zeros(_MAX_CP, dtype=np.uint32)
    for raw in spec.split(","):
        entry = raw.strip()
        if not entry:
            continue
        if entry.endswith("/2"):
            lo, hi = (_parse_char(p) for p in entry[:-2].split(".."))
            for a in range(lo, hi, 2):
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


def parse_charset_ranges(spec: str) -> list[tuple[int, int, int]]:
    """Charset spec -> (start, end, remap_start) triples, the exact
    output shape of CSphCharsetDefinitionParser (src/sphinx.cpp:2609+);
    /2 checkerboards expand into per-pair triples."""
    out: list[tuple[int, int, int]] = []
    for raw in spec.split(","):
        entry = raw.strip()
        if not entry:
            continue
        if entry.endswith("/2"):
            # TWO single-cp triples per pair, both folding to the odd
            # member — one (a, a+1, a+1) triple would remap a+1 to a+2
            # (src/sphinx.cpp:2800-2807; caught by the charset-spec
            # differential fuzz)
            lo, hi = (_parse_char(p) for p in entry[:-2].split(".."))
            for a in range(lo, hi, 2):
                out.append((a, a, a + 1))
                out.append((a + 1, a + 1, a + 1))
            continue
        if "->" in entry:
            src, dst = entry.split("->")
            if ".." in src:
                s_lo, s_hi = (_parse_char(p) for p in src.split(".."))
                d_lo, d_hi = (_parse_char(p) for p in dst.split(".."))
                if s_hi - s_lo != d_hi - d_lo:
                    raise ValueError(f"range length mismatch: {entry!r}")
                out.append((s_lo, s_hi, d_lo))
            else:
                out.append((_parse_char(src), _parse_char(src), _parse_char(dst)))
            continue
        if ".." in entry:
            lo, hi = (_parse_char(p) for p in entry.split(".."))
            out.append((lo, hi, lo))
            continue
        cp = _parse_char(entry)
        out.append((cp, cp, cp))
    return out


# Codepoint flag bits (enum at src/sphinx.cpp:2452-2462); the folded
# value of a codepoint is `folded_cp | flags`, flags in the top byte.
MASK_CODEPOINT = 0x00FFFFFF
MASK_FLAGS = 0xFF000000
FLAG_SPECIAL = 0x01000000
FLAG_DUAL = 0x02000000
FLAG_NGRAM = 0x04000000
FLAG_SYNONYM = 0x08000000
FLAG_BOUNDARY = 0x10000000
FLAG_IGNORE = 0x20000000


class Lowercaser:
    """CSphLowercaser (src/sphinx.cpp:2504-2583): a flat
    codepoint -> (folded | flags) map with the reference's exact
    add-remap merge rules.  The plain `build_fold_table` map equals
    `table & MASK_CODEPOINT` of a Lowercaser with no flag remaps."""

    def __init__(self, charset_spec: str | None = None):
        self.table = np.zeros(_MAX_CP, dtype=np.uint32)
        if charset_spec:
            self.add_remaps(parse_charset_ranges(charset_spec), 0, 0)

    def add_remaps(
        self,
        ranges: list[tuple[int, int, int]],
        flags: int,
        flags_if_exists: int,
    ) -> None:
        """AddRemaps merge (src/sphinx.cpp:2570-2581): IGNOREd
        codepoints are overwritten wholesale; existing word-part
        codepoints (mask set, not synonym-only) get `flags_if_exists`,
        everything else `flags`; old flags are preserved, the mask is
        replaced by the remap target."""
        t = self.table
        for start, end, remap_start in ranges:
            idx = np.arange(start, end + 1, dtype=np.int64)
            remapped = np.arange(
                remap_start, remap_start + (end - start) + 1, dtype=np.uint32
            )
            old = t[idx]
            word_part = ((old & MASK_CODEPOINT) != 0) & ((old & FLAG_SYNONYM) == 0)
            add = np.where(
                word_part, np.uint32(flags_if_exists), np.uint32(flags)
            )
            merged = add | (old & np.uint32(MASK_FLAGS)) | remapped
            t[idx] = np.where(
                (old & FLAG_IGNORE) != 0, remapped | np.uint32(flags), merged
            )

    def add_specials(self, specials: str) -> None:
        """AddSpecials (src/sphinx.cpp:2585): word-part chars become
        DUAL specials, everything else plain specials."""
        self.add_remaps(
            [(ord(c), ord(c), ord(c)) for c in specials],
            FLAG_SPECIAL,
            FLAG_SPECIAL | FLAG_DUAL,
        )

    def add_flagged(self, spec: str, flag: int, must_be_new: bool, what: str) -> None:
        """SetIgnoreChars / SetBoundary shared shape
        (src/sphinx.cpp:3937-3999): chars must not be remapped nor
        already referenced."""
        ranges = parse_charset_ranges(spec)
        for start, end, remap in ranges:
            if start != remap:
                raise ValueError(f"{what} characters must not be remapped")
            if must_be_new:
                for j in range(start, end + 1):
                    if self.table[j]:
                        raise ValueError(
                            f"{what} characters must not be referenced "
                            f"anywhere else (code=U+{j:x})"
                        )
        self.add_remaps(ranges, flag, 0)

    # CSphLowercaser chunk map covers [0, 0x30000); codes outside pass
    # through UNCHANGED, negatives included (src/sphinx.h:311-319).
    MAX_CODE = 0x30000

    def tolower(self, cp: int) -> int:
        if cp < 0 or cp >= self.MAX_CODE:
            return cp
        return int(self.table[cp])


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
