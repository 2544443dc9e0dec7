"""unpack_zlib / unpack_mysqlcompress source-column decompression
(src/sphinx.h:797-802, src/sphinx.cpp:19197-19290)."""

import struct
import zlib

from pyspark.sql import functions as F

from sphinx_1_spark.sources.unpack import unpack_zlib, with_unpacked


def _mysql_compress(b: bytes) -> bytes:
    return struct.pack("<I", len(b)) + zlib.compress(b)


def test_unpack_roundtrip(spark):
    texts = ["hello zlib world", "second document body", ""]
    rows = [(i, zlib.compress(t.encode())) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, blob binary")
    out = {
        r["id"]: r["t"]
        for r in with_unpacked(df, {"blob": "t"}).collect()
    }
    assert out == dict(enumerate(texts))


def test_unpack_mysql_header(spark):
    texts = ["compressed via COMPRESS()", "another"]
    rows = [(i, _mysql_compress(t.encode())) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, blob binary")
    out = {
        r["id"]: r["t"]
        for r in with_unpacked(df, {"blob": "t"}, mysql_compress=True).collect()
    }
    assert out == dict(enumerate(texts))


def test_unpack_bad_data_is_null(spark):
    df = spark.createDataFrame(
        [(1, b"not zlib at all"), (2, zlib.compress(b"ok"))],
        "id long, blob binary",
    )
    rows = {
        r["id"]: r["u"]
        for r in df.select("id", unpack_zlib(F.col("blob")).alias("u")).collect()
    }
    assert rows[1] is None
    assert bytes(rows[2]) == b"ok"
