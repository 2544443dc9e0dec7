"""Web-pages indexing pipeline: (url, warc_ts, html, text, lang) -> index.

Mirrors the reference indexer flow (DoIndex, src/indexer.cpp:701:
source -> strip -> tokenize -> hits -> sort/encode) as declarative
Spark stages:

    pages --strip_pages()--> +text (byte-identical per url)
          --assign_docids()--> +docid
          --SphinxIndex.build--> postings/dictionary/docinfo

Scale notes (the 10^12-doc path):
  * docid_mode="fingerprint" derives docid = xxhash64(url) & MAX>>1 —
    stable, collision-checked, **no global sort**; "rank" mode (dense
    1-based rank over url, FIXTURES.md §1) needs a global sort and is
    meant for small oracle-parity fixtures only.
  * stripping + tokenization are per-row Arrow-batched UDF stages:
    linear scaling, no shuffle; the only shuffles in the whole build
    are the postings/dictionary aggregations, handled with map-side
    partial aggregation and AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sphinx_1_spark.functions.stripper import make_strip_udf
from sphinx_1_spark.functions.tokenizer import TokenizerSettings
from sphinx_1_spark.plans.engine import IndexSettings, SphinxIndex

CJK_NGRAM_RANGE = "U+4E00..U+9FBF"


def strip_pages(
    pages: DataFrame,
    remove_elements: str = "script, style",
    index_attrs: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Replace `text` with the reference-stripped html (per-row
    invariant: byte-identical extracted text per url)."""
    strip = make_strip_udf(remove_elements, index_attrs or {"img": ["alt"]})
    return pages.withColumn("text", strip(F.col("html")))


def assign_docids(pages: DataFrame, mode: str = "fingerprint") -> DataFrame:
    """Attach a positive non-zero docid per url (0 is the reserved
    end-marker, src/sphinx.h:1024-1027)."""
    if mode == "rank":
        # dense sequential ids for small fixtures ONLY: the global
        # window is single-task. Production path is "fingerprint"
        # (pure per-row hash, no shuffle, stable under re-crawls).
        w = Window.orderBy("url")
        return pages.withColumn("docid", F.dense_rank().over(w).cast("long"))
    if mode == "fingerprint":
        # 63-bit positive hash; docid 0 remapped (reserved), and <= 0
        # rather than == 0 because abs(Long.MIN_VALUE) is still
        # MIN_VALUE under non-ANSI wrap semantics — a 2^-64 per-url
        # case, but a negative docid would break the sign-bijection
        # contract everywhere downstream
        h = F.abs(F.xxhash64(F.col("url")))
        return pages.withColumn(
            "docid", F.when(h <= 0, F.lit(1)).otherwise(h).cast("long")
        )
    raise ValueError(f"unknown docid mode {mode!r}")


def build_pages_index(
    pages: DataFrame,
    docid_mode: str = "fingerprint",
    remove_elements: str = "script, style",
    index_attrs: dict[str, list[str]] | None = None,
    tokenizer: TokenizerSettings | None = None,
    with_positions: bool = True,
) -> SphinxIndex:
    """End-to-end: strip -> docids -> inverted index.

    Default tokenizer folds with the reference charset_table and
    indexes CJK codepoints as 1-grams (ngram_chars, test_14 parity);
    pass TokenizerSettings(mmseg_dict_path=...) for dictionary
    segmentation.
    """
    from sphinx_1_spark.operators.hits import build_hits_fused

    tok = tokenizer or TokenizerSettings(ngram_chars=CJK_NGRAM_RANGE)
    settings = IndexSettings(
        docid_col="docid",
        fields=("text",),
        attrs=("url", "warc_ts", "lang"),
        tokenizer=tok,
        tokenizer_impl="arrow",
        with_positions=with_positions,
    )
    docs = assign_docids(pages, docid_mode)
    hits = build_hits_fused(
        docs, "docid", "html", tok, remove_elements, index_attrs or {"img": ["alt"]}
    )
    docinfo = docs.select("docid", "url", "warc_ts", "lang")
    return SphinxIndex.from_hits(hits, docinfo, settings, persist=True)
