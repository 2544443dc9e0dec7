"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Every operator is pure Catalyst column math (whole-stage codegen, no
Python) with an exact ANSI-SQL oracle; thresholds/weights are fixed
constants so results are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SEP = "[^0-9a-z_]+"
# BPE-ish subword chunker: letter runs, digit runs, or single
# punctuation marks (a cheap stand-in for byte-pair merges)
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

EN_STOPWORDS = (
    "the of and to in a is it for on with as at by an be this that from or",
)


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), TOKEN_SEP), lambda t: t != "")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens): whitespace tokens and
    BPE-ish regex chunks."""
    ws = F.size(F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != ""))
    bpe = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_RE), F.lit(0))
    )
    return docs.select(
        "doc_id",
        ws.cast("int").alias("n_ws_tokens"),
        bpe.cast("int").alias("n_bpe_tokens"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred): n-gram-free heuristic —
    CJK-char ratio > 0.15 -> 'zh'; English stopword ratio >= 0.08 ->
    'en'; else 'other'.  Deterministic and SQL-expressible."""
    text = F.col(text_col)
    # materialize the token array once per row (multi-referenced
    # non-cheap alias -> CollapseProject keeps the projection)
    proj = docs.select("doc_id", text.alias("_text"), _tokens(text).alias("_toks"))
    text = F.col("_text")
    toks = F.col("_toks")
    n_chars = F.length(text)
    cjk = F.length(F.regexp_replace(text, "[^\\x{4E00}-\\x{9FFF}]", ""))
    stop_list = EN_STOPWORDS[0].split()
    n_stop = F.size(F.filter(toks, lambda t: t.isin(stop_list)))
    n_toks = F.size(toks)
    pred = (
        F.when((n_chars > 0) & (cjk / n_chars > 0.15), "zh")
        .when((n_toks > 0) & (n_stop / n_toks >= 0.08), "en")
        .otherwise("other")
    )
    return proj.select("doc_id", pred.alias("lang_pred"))


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, quality): 0..1 composite of length, punctuation ratio,
    stopword ratio, and mean word length — the classic web-text
    quality heuristics, fixed weights."""
    text = F.col(text_col)
    proj = docs.select("doc_id", text.alias("_text"), _tokens(text).alias("_toks"))
    text = F.col("_text")
    toks = F.col("_toks")
    n_chars = F.length(text)
    n_toks = F.size(toks)
    stop_list = EN_STOPWORDS[0].split()
    n_stop = F.size(F.filter(toks, lambda t: t.isin(stop_list)))
    n_punct = F.length(F.regexp_replace(text, "[^!-/:-@\\[-`{-~]", ""))
    mean_wl = F.when(
        n_toks > 0,
        F.aggregate(
            toks, F.lit(0.0).cast("double"), lambda acc, t: acc + F.length(t)
        )
        / n_toks,
    ).otherwise(0.0)
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_score = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.when(n_chars > 0, n_punct / n_chars).otherwise(1.0) * 5
    )
    stop_score = F.least(
        F.when(n_toks > 0, n_stop / n_toks).otherwise(0.0) * 5, F.lit(1.0)
    )
    wl_score = F.when((mean_wl >= 3) & (mean_wl <= 10), 1.0).otherwise(0.5)
    quality = F.round(
        0.3 * len_score + 0.2 * punct_score + 0.3 * stop_score + 0.2 * wl_score, 6
    )
    return proj.select("doc_id", quality.alias("quality"))


def fingerprints(docs: DataFrame, k: int = 5, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): min-hash document fingerprint = lexical
    min of md5 over character k-grams (rolling-hash winnowing with
    window = whole doc); identical docs share fingerprints, near-
    identical usually do."""
    # materialize lower(text) first: referenced inside the per-gram
    # lambda, and Catalyst does not hoist CSE out of lambda functions
    # (an inline lower() would re-run per gram, O(chars^2) per doc)
    proj = docs.select("doc_id", F.lower(F.col(text_col)).alias("_ltext"))
    text = F.col("_ltext")
    n = F.length(text)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1), lambda i: F.substr(text, i, F.lit(k))
        ),
    ).otherwise(F.array(text))
    fp = F.array_min(F.transform(grams, lambda g: F.md5(g)))
    return proj.select("doc_id", fp.alias("fingerprint"))
