"""End-to-end engine checks against DuckDB on sf0.001 documents."""

from pyspark.sql import functions as F


def _duck_topk(duck, sql):
    return duck.execute(sql).fetchall()


def test_term_search_matches_duckdb(docs_index, duck):
    got = [
        (r.docid, r.weight)
        for r in docs_index.search("window", ranker="bm25", limit=10).collect()
    ]
    n = docs_index.n_docs
    exp = _duck_topk(
        duck,
        f"""
WITH hits AS (
  SELECT doc_id, t.w AS word
  FROM (SELECT doc_id, string_split_regex(lower(text), '[^0-9a-z_]+') AS arr FROM documents),
  LATERAL (SELECT unnest(arr) AS w) t WHERE t.w <> ''
), s AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM hits WHERE word='window'),
tf AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf FROM hits WHERE word='window' GROUP BY doc_id)
SELECT doc_id,
  CAST(floor((tf/(tf+1.2) * (ln(({n} - s.df + 1)/s.df)/(2*1*ln(1+{n}))) + 0.5)*1000) AS INT) + 1000 AS w
FROM tf, s ORDER BY w DESC, doc_id ASC LIMIT 10
""",
    )
    assert got == [(d, w) for d, w in exp]


def test_total_found_and_stats(docs_index, duck):
    plan, meta = docs_index.match("window table")
    total = plan.count()
    exp = duck.execute(
        """
WITH hits AS (
  SELECT doc_id, t.w AS word
  FROM (SELECT doc_id, string_split_regex(lower(text), '[^0-9a-z_]+') AS arr FROM documents),
  LATERAL (SELECT unnest(arr) AS w) t WHERE t.w <> ''
)
SELECT count(*) FROM (
  SELECT doc_id FROM hits WHERE word IN ('window','table')
  GROUP BY doc_id HAVING count(DISTINCT word) = 2)
"""
    ).fetchone()[0]
    assert total == exp
    # per-term stats (docs, hits) are part of the observable API
    # (CSphQueryResult, src/sphinx.h:1752-1792)
    stats = meta["stats"]
    dd = duck.execute(
        """
WITH hits AS (
  SELECT doc_id, t.w AS word
  FROM (SELECT doc_id, string_split_regex(lower(text), '[^0-9a-z_]+') AS arr FROM documents),
  LATERAL (SELECT unnest(arr) AS w) t WHERE t.w <> ''
)
SELECT word, count(DISTINCT doc_id), count(*) FROM hits
WHERE word IN ('window','table') GROUP BY word
"""
    ).fetchall()
    for word, docs, hits in dd:
        assert stats[word] == (docs, hits)


def test_phrase_is_subset_of_and(docs_index):
    and_docs = {
        r.docid for r in docs_index.search("fast scan", ranker="none", limit=1000).collect()
    }
    phrase_docs = {
        r.docid
        for r in docs_index.search('"fast scan"', ranker="none", limit=1000).collect()
    }
    prox_docs = {
        r.docid
        for r in docs_index.search('"fast scan"~2', ranker="none", limit=1000).collect()
    }
    assert phrase_docs <= prox_docs <= and_docs
    assert phrase_docs  # corpus is dense enough that some phrase matches exist


def test_proximity_bm25_beats_bm25_for_adjacent(docs_index):
    """Docs with the exact phrase should get LCS=2 -> +4000 over LCS=1."""
    rows = docs_index.search("fast scan", ranker="proximity_bm25", limit=1000).collect()
    weights = {r.docid: r.weight for r in rows}
    phrase_docs = {
        r.docid
        for r in docs_index.search('"fast scan"', ranker="none", limit=1000).collect()
    }
    for d, w in weights.items():
        if d in phrase_docs:
            assert w >= 4000
        else:
            assert 1000 <= w < 4000 + 1000


def test_andnot(docs_index, duck):
    got = {r.docid for r in docs_index.search("table -scan", ranker="none", limit=1000).collect()}
    exp = {
        r[0]
        for r in duck.execute(
            """
WITH hits AS (
  SELECT doc_id, t.w AS word
  FROM (SELECT doc_id, string_split_regex(lower(text), '[^0-9a-z_]+') AS arr FROM documents),
  LATERAL (SELECT unnest(arr) AS w) t WHERE t.w <> ''
)
SELECT DISTINCT doc_id FROM hits WHERE word='table'
AND doc_id NOT IN (SELECT doc_id FROM hits WHERE word='scan')
"""
        ).fetchall()
    }
    assert got == exp


def test_offset_paging(docs_index):
    full = [(r.docid, r.weight) for r in docs_index.search("table", ranker="bm25", limit=20).collect()]
    page2 = [(r.docid, r.weight) for r in docs_index.search("table", ranker="bm25", limit=10, offset=10).collect()]
    assert page2 == full[10:20]


def test_exact32_rank_matches_fast64(docs_index):
    """Both score modes must produce the same ranking (weights may
    differ in the last ulp only)."""
    fast = [r.docid for r in docs_index.search("table scan", ranker="bm25", limit=50).collect()]
    exact = [
        r.docid
        for r in docs_index.search(
            "table scan", ranker="bm25", limit=50, score_mode="exact32"
        ).collect()
    ]
    assert fast == exact


def test_search_with_meta(docs_index, duck):
    rows, meta = docs_index.search_with_meta("table | scan", limit=10, ranker="bm25")
    assert len(rows) == 10
    # total = min(total_found, max_matches), NOT the LIMIT
    # (m_dMatches.GetLength(), searchd.cpp:5756)
    assert meta["total"] == min(meta["total_found"], 1000)
    want_found = duck.execute(
        """SELECT count(DISTINCT doc_id) FROM (
             SELECT doc_id, unnest(string_split_regex(lower(text), '[^0-9a-z_]+')) AS w
             FROM documents) WHERE w IN ('table','scan')"""
    ).fetchone()[0]
    assert meta["total_found"] == want_found
    assert set(meta["words"]) == {"table", "scan"}
    for w in ("table", "scan"):
        d = duck.execute(
            f"""SELECT count(DISTINCT doc_id), count(*) FROM (
                 SELECT doc_id, unnest(string_split_regex(lower(text), '[^0-9a-z_]+')) AS w
                 FROM documents) WHERE w = '{w}'"""
        ).fetchone()
        assert (meta["words"][w]["docs"], meta["words"][w]["hits"]) == d
    assert meta["time"] > 0


def test_fnv64_index_matches_crc32(spark):
    """--enable-id64 parity: an FNV-1a-64 build answers identically
    to the CRC32 build (wordid scheme is invisible in results), and
    its dictionary ids are genuinely 64-bit."""
    from pyspark.sql import functions as F

    from sphinx_1_spark import IndexSettings, SphinxIndex

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx32 = SphinxIndex.build(
        docs,
        IndexSettings(docid_col="doc_id", fields=("text",)),
    )
    idx64 = SphinxIndex.build(
        docs,
        IndexSettings(docid_col="doc_id", fields=("text",), wordid="fnv64"),
    )
    for match in ("window", "table scan", '"table scan"', "val* -scan"):
        r32 = [tuple(r) for r in idx32.search(match, ranker="bm25", limit=10).collect()]
        r64 = [tuple(r) for r in idx64.search(match, ranker="bm25", limit=10).collect()]
        assert r32 == r64, match
    wide = idx64.dictionary.where(
        (F.col("wordid") > F.lit(1 << 32)) | (F.col("wordid") < 0)
    ).count()
    assert wide > 0  # ids occupy the 64-bit space, not CRC32's 32


def test_too_many_fields_rejected():
    # SPH_MAX_FIELDS=32 (src/sphinx.h:147): the reference's source
    # setup errors (src/sphinx.cpp:19238-19240); field ids >= 32 would
    # silently escape the 32-bit query field mask and the field<<24
    # hit packing, so the schema must fail at construction
    import pytest

    from sphinx_1_spark import IndexSettings

    IndexSettings(fields=tuple(f"f{i}" for i in range(32)))  # at cap: ok
    with pytest.raises(ValueError, match=r"too many fields \(fields=33, max=32\)"):
        IndexSettings(fields=tuple(f"f{i}" for i in range(33)))
