"""Multi-query batch (RunQueries, src/searchd.cpp:3869-3918), result
minimize/merge (MinimizeAggrResult, src/searchd.cpp:3628-3820), and
attribute update (UpdateAttributes, src/sphinx.cpp:7135)."""

from pyspark.sql import functions as F

from sphinx_1_spark.plans.attrs import update_attributes
from sphinx_1_spark.plans.multi import batch_search, minimize_results


def test_batch_equals_individual(spark, docs_index):
    queries = [
        ("q_and", "table scan", {"ranker": "bm25", "limit": 10}),
        ("q_term", "window", {"ranker": "bm25", "limit": 10}),
        ("q_or", "table | value", {"ranker": "bm25", "limit": 5}),
    ]
    batched = batch_search(docs_index, queries)
    got = {
        tag: sorted(
            (r["docid"], r["weight"])
            for r in batched.where(batched.query == tag).collect()
        )
        for tag, _, _ in queries
    }
    for tag, match, kw in queries:
        solo = sorted(
            (r["docid"], r["weight"])
            for r in docs_index.search(match, **kw).collect()
        )
        assert got[tag] == solo, tag


def test_minimize_results(spark, docs_index):
    # two "index" result sets with different extra attrs: only the
    # common schema survives, union re-sorted by weight desc, docid asc
    r1 = docs_index.search("table", ranker="bm25", limit=5).withColumn(
        "extra1", F.lit(1)
    )
    r2 = docs_index.search("window", ranker="bm25", limit=5).withColumn(
        "extra2", F.lit(2)
    )
    merged = minimize_results([r1, r2], limit=10)
    assert set(merged.columns) == {"docid", "weight", "tag"}
    rows = merged.collect()
    keys = [(-r["weight"], r["docid"]) for r in rows]
    assert keys == sorted(keys)
    # dupes sweep: one copy per docid; the (docid asc, tag desc) sort
    # (searchd.cpp:2515) keeps the HIGHEST tag — last-listed index
    # wins, proven by reference test_49 goldens (q 'a a2' serving a2's
    # attrs)
    docids = [r["docid"] for r in rows]
    assert len(docids) == len(set(docids))
    r2_ids = {r["docid"] for r in r2.collect()}
    for r in rows:
        assert r["tag"] == (1 if r["docid"] in r2_ids else 0)


def test_update_attributes(spark):
    ev = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["docid", "value"]
    )
    upd = spark.createDataFrame([(2, 99.0), (7, 1.0)], ["docid", "value"])
    out = {
        r["docid"]: r["value"]
        for r in update_attributes(ev, upd, ["value"]).collect()
    }
    # docid 2 updated, 7 ignored (absent from docinfo), others kept
    assert out == {1: 10.0, 2: 99.0, 3: 30.0}
