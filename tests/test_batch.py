"""Multi-query batch: shared posting scan (RunQueries,
src/searchd.cpp:3869-3918)."""

from sphinx_1_spark.plans.multi import batch_search


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
