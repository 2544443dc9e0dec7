"""Wordid hash parity: sphCRC32 == zlib crc32 (reference
src/sphinx.cpp:16637 uses the standard reflected table) and sphFNV64 ==
FNV-1a 64 (src/sphinx.cpp:16658)."""

import zlib

from sphinx_1_spark.functions.wordid import crc32_word, fnv64_word


def test_crc32_matches_zlib():
    for w in ["hello", "table", "测试", "_", "a" * 42]:
        assert crc32_word(w) == zlib.crc32(w.encode()) & 0xFFFFFFFF


def test_crc32_known_values():
    # standard CRC-32 test vector
    assert crc32_word("123456789") == 0xCBF43926


def test_fnv64_known_values():
    # FNV-1a 64 reference vectors (public test vectors)
    assert fnv64_word("") == 0xCBF29CE484222325
    assert fnv64_word("a") == 0xAF63DC4C8601EC8C
    assert fnv64_word("foobar") == 0x85944171F73967E8


def test_crc32_col_matches(spark):
    from pyspark.sql import functions as F
    from sphinx_1_spark.functions.wordid import crc32_col

    words = ["hello", "table", "scan", "测试"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: r["wid"] for r in df.select("word", crc32_col(F.col("word")).alias("wid")).collect()}
    for w in words:
        assert got[w] == crc32_word(w)
