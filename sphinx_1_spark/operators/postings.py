"""Postings + dictionary construction from the hit relation.

Sphinx's index build is an external sort of hits by (wordid, docid,
pos) followed by a streaming encode (Build, reference
src/sphinx.cpp:8788-9907; sort comparator SPH_CMPHIT_LESS
src/sphinx.cpp:7421). In Spark the sort-shuffle *is* that external
sort: we aggregate hits by (word, docid) with map-side partial
aggregation (tf, fieldmask) — positions are collected only when the
index must answer phrase/proximity queries.

Outputs:
  postings:   (wordid, docid, tf, fieldmask[, positions])
  vocab:      (wordid, word)              — tiny, broadcastable
  dictionary: (wordid, docs, hits)        — .spi equivalent
              (src/sphinx.cpp:7515-7516 stores per-word docs/hits)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sphinx_1_spark.functions.bits import field_bit_of_pos
from sphinx_1_spark.functions.wordid import crc32_col, fnv64_col
from sphinx_1_spark.functions.tokenizer import HIT_FIELD_END, POS_MASK


def build_postings(
    hits: DataFrame, with_positions: bool = True, wordid_impl: str = "crc32"
) -> DataFrame:
    """Aggregate hits into per-(word, doc) postings.

    fieldmask: bit i set iff the word occurs in field i
    (doclist field mask, doc/internals-index-format.txt:152-158).
    positions: packed wordpos values sorted ascending (field-major,
    .spp hitlist order, src/sphinx.cpp:7619-7635) with the
    HIT_FIELD_END bit retained (bit 23).
    """
    field_bit = field_bit_of_pos(F.col("wordpos"))
    aggs = [
        F.count(F.lit(1)).cast("int").alias("tf"),
        F.bit_or(field_bit).cast("int").alias("fieldmask"),
    ]
    if with_positions:
        aggs.append(F.sort_array(F.collect_list(F.col("wordpos"))).alias("positions"))
    hash_col = fnv64_col if wordid_impl == "fnv64" else crc32_col
    return (
        hits.groupBy("word", "docid")
        .agg(*aggs)
        .withColumn("wordid", hash_col(F.col("word")))
    )


def build_vocab(postings: DataFrame) -> DataFrame:
    return postings.select("wordid", "word").distinct()


def build_dictionary(postings: DataFrame) -> DataFrame:
    """Per-word document frequency + collection frequency —
    the .spi dictionary payload (docs, hits) at src/sphinx.cpp:7515."""
    return (
        postings.groupBy("wordid", "word")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("tf").alias("hits"),
        )
    )


def strip_field_end(pos_col):
    """Drop bit 23 to get field<<24|pos for position math (HIT2LCS
    keeps it — src/sphinx.cpp:238 masks 0xff7fffff; plain position
    comparisons use HIT2POS/HIT2FIELD)."""
    return F.bit_and(pos_col, F.lit(~HIT_FIELD_END & 0xFFFFFFFF))


def pos_in_field(pos_col):
    return F.bit_and(pos_col, F.lit(POS_MASK))


def field_of(pos_col):
    return F.shiftright(pos_col, 24)
