"""Connected-components / cluster-dedup tests
(operators/dedup.py connected_components + neardup_dedup).

Oracle: a pure-Python union-find over the same pairs — components and
min-id canonical labels must match exactly.  The chain case pins the
O(log n)-round claim (label propagation would need n rounds).
"""

import random

import pytest
from pyspark.sql import functions as F

from sphinx_1_spark.operators.dedup import (
    connected_components,
    neardup_dedup,
    ngram_jaccard_pairs,
)


def uf_components(pairs):
    """Union-find oracle: {node: min_node_of_component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def spark_components(spark, pairs, **kw):
    if pairs:
        df = spark.createDataFrame(pairs, "a long, b long")
    else:
        df = spark.createDataFrame([], "a long, b long")
    rows = connected_components(df, **kw).collect()
    got = {r["node"]: r["component"] for r in rows}
    assert len(rows) == len(got), "duplicate node rows"
    return got


def test_two_components_and_min_root(spark):
    pairs = [(5, 3), (3, 9), (20, 21), (21, 20), (9, 9)]
    got = spark_components(spark, pairs)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_empty_pairs(spark):
    assert spark_components(spark, []) == {}


def test_chain_converges_logarithmically(spark):
    """A 64-node chain is the worst case for plain label propagation
    (63 rounds); large-star/small-star must finish in <= 12 — the
    max_iter pin IS the O(log n) claim."""
    pairs = [(i, i + 1) for i in range(1, 64)]
    got = spark_components(spark, pairs, max_iter=12)
    assert got == {i: 1 for i in range(1, 65)}


def test_star_and_hub(spark):
    # high-degree hub: one groupBy min per round, no blowup
    pairs = [(100, i) for i in range(1, 40)]
    got = spark_components(spark, pairs)
    assert got == {**{i: 1 for i in range(1, 40)}, 100: 1}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 200
    pairs = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randrange(50, 260))
    ]
    want = uf_components([p for p in pairs if p[0] != p[1]])
    got = spark_components(spark, pairs)
    assert got == want


def test_custom_column_names(spark):
    df = (
        connected_components(
            _pairs_df(spark, [(2, 1)], "x", "y"), a_col="x", b_col="y"
        )
        .orderBy("node")
        .collect()
    )
    assert [(r["node"], r["component"]) for r in df] == [(1, 1), (2, 1)]


def _pairs_df(spark, pairs, a="a", b="b"):
    return spark.createDataFrame(pairs, f"{a} long, {b} long")


def test_nonconvergence_guard(spark):
    with pytest.raises(RuntimeError, match="did not converge in 1"):
        connected_components(
            _pairs_df(spark, [(i, i + 1) for i in range(1, 40)]),
            max_iter=1,
        )


def test_neardup_dedup_keeps_canonical_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 11)], "doc_id long, text string"
    )
    # components {1,2,3} and {7,9}; 4,5,6,8,10 untouched
    pairs = _pairs_df(spark, [(2, 1), (2, 3), (9, 7)])
    kept = sorted(
        r["doc_id"] for r in neardup_dedup(docs, pairs).collect()
    )
    assert kept == [1, 4, 5, 6, 7, 8, 10]


def test_end_to_end_jaccard_clusters(spark):
    """Transitive closure over a real pair finder: A~B and B~C above
    tau without A~C still collapse to one survivor."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),  # near-dup of 1
            (3, base + " extra tail"),  # near-dup of 2 (maybe not of 1)
            (10, "completely different text about spark shuffles at scale"),
        ],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, k=3, tau=0.6)
    got = {
        (r["a"], r["b"]) for r in pairs.select("a", "b").collect()
    }
    # sanity: the chain exists
    assert (1, 2) in got and (2, 3) in got
    kept = sorted(
        r["doc_id"] for r in neardup_dedup(docs, pairs).collect()
    )
    assert kept == [1, 10]
