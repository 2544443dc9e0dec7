"""Compressed source-column unpack (test_43 parity).

The reference SQL source can decompress columns while fetching
(`unpack_zlib` / `unpack_mysqlcompress`, src/sphinx.h:797-802,
src/sphinx.cpp:19197-19290): zlib inflate, with the MySQL COMPRESS()
variant carrying a 4-byte little-endian uncompressed-length header.
Spark-first shape: an Arrow-batched pandas UDF over the binary
column, applied before the strip/tokenize stages.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType


def _inflate(raw: bytes | None, mysql_header: bool) -> bytes | None:
    import zlib

    if raw is None:
        return None
    data = bytes(raw)
    if not data:
        # NULL/empty columns pass through untouched
        # (SqlUnpackColumn: pData==NULL || pData[0]==0 -> return pData)
        return data
    if mysql_header:
        if len(data) <= 4:
            # a nonempty blob shorter than the 4-byte length header is
            # not a valid COMPRESS() product (COMPRESS('') == '' was
            # already handled by the empty-input passthrough above)
            return None
        data = data[4:]
    try:
        return zlib.decompress(data)
    except zlib.error:
        return None  # sqlUnpackData failure -> row skipped upstream


def unpack_zlib(col: Column, mysql_compress: bool = False) -> Column:
    """Binary column -> inflated binary; rows that fail to inflate
    become NULL (the reference logs and skips them)."""

    @F.pandas_udf(BinaryType())
    def _un(s: pd.Series) -> pd.Series:
        return s.map(lambda b: _inflate(b, mysql_compress))

    return _un(col)


def unpack_zlib_text(col: Column, mysql_compress: bool = False) -> Column:
    """Inflate + UTF-8 decode convenience for text fields."""

    @F.pandas_udf(StringType())
    def _un(s: pd.Series) -> pd.Series:
        def go(b):
            out = _inflate(b, mysql_compress)
            return None if out is None else out.decode("utf-8", "replace")

        return s.map(go)

    return _un(col)


def with_unpacked(
    df: DataFrame,
    columns: dict[str, str],
    mysql_compress: bool = False,
) -> DataFrame:
    """Apply unpack to `columns` ({src_col: out_col}); the source-side
    analog of `unpack_zlib = field` config lines."""
    for src, out in columns.items():
        df = df.withColumn(out, unpack_zlib_text(F.col(src), mysql_compress))
    return df
