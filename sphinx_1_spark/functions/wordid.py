"""Word-id hashing: Sphinx wordids are CRC32 (32-bit builds) or
FNV-1a-64 (--enable-id64 builds).

Semantic parity points: sphCRC32 (reference src/sphinx.cpp:16637-16654)
is the standard reflected CRC-32 (poly 0xEDB88320, init/final ~0) —
i.e. exactly zlib.crc32 / Spark's F.crc32. sphFNV64
(src/sphinx.cpp:16658-16671) is textbook FNV-1a 64.

Dictionary order (and therefore global posting sort order) is by this
hashed id, NOT lexicographic — src/sphinx.cpp:7546 writes .spi entries
in wordid order.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

FNV64_INIT = 0xCBF29CE484222325
FNV64_PRIME = 0x100000001B3
_U64_MASK = 0xFFFFFFFFFFFFFFFF


def crc32_word(word: str | bytes) -> int:
    """sphCRC32-compatible wordid of a single token."""
    if isinstance(word, str):
        word = word.encode("utf-8")
    return zlib.crc32(word) & 0xFFFFFFFF


def fnv64_word(word: str | bytes) -> int:
    """sphFNV64-compatible (FNV-1a 64) wordid of a single token."""
    if isinstance(word, str):
        word = word.encode("utf-8")
    h = FNV64_INIT
    for b in word:
        h ^= b
        h = (h * FNV64_PRIME) & _U64_MASK
    return h


def crc32_col(col: Column) -> Column:
    """JVM-side (whole-stage-codegen'd) wordid column: F.crc32 is
    zlib-CRC over the UTF-8 bytes, matching sphCRC32 bit-for-bit."""
    return F.crc32(col.cast("binary")).cast("long")


def fnv64_col(col: Column) -> Column:
    """Arrow-batched FNV-1a 64 wordid column (--enable-id64 parity,
    sphFNV64 src/sphinx.cpp:16658-16671).  No Catalyst builtin exists
    for FNV, so this is a vectorized pandas UDF — id64 is the one
    place the wordid leaves whole-stage codegen."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _fnv64(words: pd.Series) -> pd.Series:
        return fnv64_np(words)

    return _fnv64(col)


def word_id(word: str | bytes, impl: str = "crc32") -> int:
    """Dispatch a single-token wordid by dictionary impl; fnv64 ids are
    viewed as signed int64 to match the LongType column."""
    if impl == "fnv64":
        h = fnv64_word(word)
        return h - (1 << 64) if h >= (1 << 63) else h
    return crc32_word(word)


def fnv64_np(words: pd.Series) -> pd.Series:
    """Vectorized-ish FNV-1a 64 for pandas UDF use (signed int64 view,
    since Spark LongType is signed; ids compare consistently either way
    as long as both sides use the same view)."""
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        out[i] = fnv64_word(w)
    return pd.Series(out.view(np.int64))
