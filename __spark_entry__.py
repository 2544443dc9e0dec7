"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship BM25 top-k over sf0.001 documents.
`queries()` — one callable per implemented operator (SURVEY.md §2).
`oracle_sql()` — DuckDB-equivalent SQL per query key.

Both sides tokenize identically (lowercase, split on [^0-9a-z_]+ —
the Sphinx default charset_table restricted to ASCII) and compute the
Sphinx scoring pipeline in float64:
  idf = ln((N-df+1)/df) / (2*q*ln(1+N))      (src/sphinx.cpp:14662)
  tfidf per term = tf/(tf+1.2) * idf          (src/sphinx.cpp:11867)
  bm25part = floor((sum_tfidf + 0.5) * 1000)  (src/sphinx.cpp:13972)
  ranker bm25: weight = bm25part + 1000 * #matched_fields
The engine's float32 Sphinx-parity mode (score_mode='exact32') is
exercised by the pytest oracle suite instead, where bit-exact float32
accumulation is reproducible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_INDEX_CACHE: dict = {}


def _docs_index(spark: SparkSession, sf_dir: str):
    """Build (and memoize) the inverted index over the documents table."""
    from sphinx_1_spark import IndexSettings, SphinxIndex

    key = ("documents", sf_dir)
    if key not in _INDEX_CACHE:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        idx = SphinxIndex.build(
            docs,
            IndexSettings(docid_col="doc_id", fields=("text",), tokenizer_impl="native"),
        )
        _INDEX_CACHE[key] = idx
    return _INDEX_CACHE[key]


def _topk(idx, match: str, ranker: str = "bm25", k: int = 10) -> DataFrame:
    out = idx.search(match, ranker=ranker, limit=k)
    return out.select(F.col("docid").alias("doc_id"), F.col("weight"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for a two-term AND over sf0.001 docs."""
    idx = _docs_index(spark, "/root/testdata/sf0.001")
    return _topk(idx, "table scan", ranker="bm25", k=10)


# ----------------------------------------------------------------------
# gate queries


def q_term_bm25(spark, sf_dir):
    return _topk(_docs_index(spark, sf_dir), "window", "bm25")


def q_and_bm25(spark, sf_dir):
    return _topk(_docs_index(spark, sf_dir), "table scan", "bm25")


def q_or_bm25(spark, sf_dir):
    return _topk(_docs_index(spark, sf_dir), "table | scan", "bm25")


def q_andnot_bm25(spark, sf_dir):
    return _topk(_docs_index(spark, sf_dir), "table -scan", "bm25")


def q_phrase_bm25(spark, sf_dir):
    return _topk(_docs_index(spark, sf_dir), '"table scan"', "bm25")


def q_quorum_bm25(spark, sf_dir):
    return _topk(_docs_index(spark, sf_dir), '"table scan value"/2', "bm25")


def q_proximity_bm25r(spark, sf_dir):
    return _topk(_docs_index(spark, sf_dir), '"table scan"~3', "bm25")


def q_wordcount(spark, sf_dir):
    return _topk(_docs_index(spark, sf_dir), "table scan", "wordcount")


def q_dictionary(spark, sf_dir):
    idx = _docs_index(spark, sf_dir)
    return (
        idx.dictionary.select("word", "docs", "hits")
        .orderBy(F.col("docs").desc(), F.col("word").asc())
        .limit(20)
    )


def q_match_count(spark, sf_dir):
    """total_found semantics (CSphQueryResult.m_iTotalMatches)."""
    idx = _docs_index(spark, sf_dir)
    plan, _ = idx.match("table | scan")
    return plan.agg(F.count(F.lit(1)).alias("total_found"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_term_bm25": q_term_bm25,
        "q_and_bm25": q_and_bm25,
        "q_or_bm25": q_or_bm25,
        "q_andnot_bm25": q_andnot_bm25,
        "q_phrase_bm25": q_phrase_bm25,
        "q_quorum_bm25": q_quorum_bm25,
        "q_proximity_bm25r": q_proximity_bm25r,
        "q_wordcount": q_wordcount,
        "q_dictionary": q_dictionary,
        "q_match_count": q_match_count,
    }


# ----------------------------------------------------------------------
# DuckDB oracles
#
# Shared CTE prelude: tokenize documents.text exactly like the engine's
# native tokenizer (lower, split on [^0-9a-z_]+, 1-based positions over
# non-empty tokens), then tf/df/idf per the Sphinx formulas in float64.

_HITS_CTE = """
WITH tok AS (
  SELECT doc_id,
         string_split_regex(lower(text), '[^0-9a-z_]+') AS arr
  FROM documents
), hits0 AS (
  SELECT doc_id, t.w AS word, t.i AS i
  FROM tok, LATERAL (
    SELECT unnest(arr) AS w, unnest(generate_series(1, len(arr))) AS i
  ) t
), hits AS (
  SELECT doc_id, word,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS pos
  FROM hits0 WHERE word <> ''
), ndocs AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
)
"""


def _idf_cte(words: list[str], name: str = "idf") -> str:
    """Per-term df + idf CTE; q = #distinct terms in the query."""
    q = len(dict.fromkeys(words))
    inlist = ", ".join(f"'{w}'" for w in dict.fromkeys(words))
    return f"""
, stats AS (
  SELECT word, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
  FROM hits WHERE word IN ({inlist}) GROUP BY word
), {name} AS (
  SELECT word, df, ln((n.n - df + 1)/df) / (2*{q}*ln(1+n.n)) AS idf
  FROM stats, ndocs n
)
, tf AS (
  SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf
  FROM hits WHERE word IN ({inlist}) GROUP BY doc_id, word
)
"""


def _term_tfidf(alias: str, word: str) -> str:
    return (
        f"(SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='{word}'), 0) AS tfidf\n"
        f"   FROM tf WHERE word='{word}') {alias}"
    )


_W = "CAST(floor((tfidf + 0.5) * 1000) AS INT) + 1000"


def _topk_sql(body: str, k: int = 10) -> str:
    return (
        body
        + f"\nSELECT doc_id, {_W} AS weight FROM matched"
        + "\nORDER BY weight DESC, doc_id ASC LIMIT "
        + str(k)
    )


def oracle_sql() -> dict[str, str]:
    t = _HITS_CTE

    term = t + _idf_cte(["window"]) + """
, matched AS (SELECT doc_id, tfidf FROM """ + _term_tfidf("a", "window") + ")"

    and2 = t + _idf_cte(["table", "scan"]) + """
, ta AS (SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='table'), 0) AS tfidf FROM tf WHERE word='table')
, tb AS (SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='scan'), 0) AS tfidf FROM tf WHERE word='scan')
, matched AS (
  SELECT ta.doc_id, ta.tfidf + tb.tfidf AS tfidf
  FROM ta JOIN tb ON ta.doc_id = tb.doc_id
)"""

    or2 = t + _idf_cte(["table", "scan"]) + """
, ta AS (SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='table'), 0) AS tfidf FROM tf WHERE word='table')
, tb AS (SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='scan'), 0) AS tfidf FROM tf WHERE word='scan')
, matched AS (
  SELECT coalesce(ta.doc_id, tb.doc_id) AS doc_id,
         coalesce(ta.tfidf, 0) + coalesce(tb.tfidf, 0) AS tfidf
  FROM ta FULL OUTER JOIN tb ON ta.doc_id = tb.doc_id
)"""

    andnot = t + _idf_cte(["table", "scan"]) + """
, ta AS (SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='table'), 0) AS tfidf FROM tf WHERE word='table')
, matched AS (
  SELECT doc_id, tfidf FROM ta
  WHERE doc_id NOT IN (SELECT doc_id FROM tf WHERE word='scan')
)"""

    phrase = t + _idf_cte(["table", "scan"]) + """
, ta AS (SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='table'), 0) AS tfidf FROM tf WHERE word='table')
, tb AS (SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='scan'), 0) AS tfidf FROM tf WHERE word='scan')
, matched AS (
  SELECT ta.doc_id, ta.tfidf + tb.tfidf AS tfidf
  FROM ta JOIN tb ON ta.doc_id = tb.doc_id
  WHERE EXISTS (
    SELECT 1 FROM hits h1 JOIN hits h2
      ON h1.doc_id = h2.doc_id AND h2.pos = h1.pos + 1
    WHERE h1.doc_id = ta.doc_id AND h1.word = 'table' AND h2.word = 'scan')
)"""

    quorum = t + _idf_cte(["table", "scan", "value"]) + """
, ta AS (SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='table'), 0) AS tfidf FROM tf WHERE word='table')
, tb AS (SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='scan'), 0) AS tfidf FROM tf WHERE word='scan')
, tc AS (SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='value'), 0) AS tfidf FROM tf WHERE word='value')
, matched AS (
  SELECT coalesce(ta.doc_id, tb.doc_id, tc.doc_id) AS doc_id,
         coalesce(ta.tfidf, 0) + coalesce(tb.tfidf, 0) + coalesce(tc.tfidf, 0) AS tfidf
  FROM ta
  FULL OUTER JOIN tb ON ta.doc_id = tb.doc_id
  FULL OUTER JOIN tc ON coalesce(ta.doc_id, tb.doc_id) = tc.doc_id
  WHERE (CASE WHEN ta.doc_id IS NULL THEN 0 ELSE 1 END
       + CASE WHEN tb.doc_id IS NULL THEN 0 ELSE 1 END
       + CASE WHEN tc.doc_id IS NULL THEN 0 ELSE 1 END) >= 2
)"""

    prox = t + _idf_cte(["table", "scan"]) + """
, ta AS (SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='table'), 0) AS tfidf FROM tf WHERE word='table')
, tb AS (SELECT doc_id, tf/(tf+1.2) * coalesce((SELECT idf FROM idf WHERE word='scan'), 0) AS tfidf FROM tf WHERE word='scan')
, matched AS (
  SELECT ta.doc_id, ta.tfidf + tb.tfidf AS tfidf
  FROM ta JOIN tb ON ta.doc_id = tb.doc_id
  WHERE EXISTS (
    SELECT 1 FROM hits h1 JOIN hits h2
      ON h1.doc_id = h2.doc_id AND abs(h2.pos - h1.pos) <= 4
    WHERE h1.doc_id = ta.doc_id AND h1.word = 'table' AND h2.word = 'scan')
)"""

    wordcount = t + """
SELECT doc_id, CAST(sum(cnt) AS INT) AS weight FROM (
  SELECT doc_id, count(*) AS cnt FROM hits
  WHERE word IN ('table', 'scan') GROUP BY doc_id, word
) GROUP BY doc_id
HAVING count(*) = 2
ORDER BY weight DESC, doc_id ASC LIMIT 10"""

    dictionary = t + """
SELECT word, count(DISTINCT doc_id) AS docs, count(*) AS hits
FROM hits GROUP BY word
ORDER BY docs DESC, word ASC LIMIT 20"""

    match_count = t + """
SELECT count(*) AS total_found FROM (
  SELECT DISTINCT doc_id FROM hits WHERE word IN ('table', 'scan'))"""

    return {
        "q_term_bm25": _topk_sql(term),
        "q_and_bm25": _topk_sql(and2),
        "q_or_bm25": _topk_sql(or2),
        "q_andnot_bm25": _topk_sql(andnot),
        "q_phrase_bm25": _topk_sql(phrase),
        "q_quorum_bm25": _topk_sql(quorum),
        "q_proximity_bm25r": _topk_sql(prox),
        "q_wordcount": wordcount,
        "q_dictionary": dictionary,
        "q_match_count": match_count,
    }
