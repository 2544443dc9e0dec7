"""test_31 hand-port (geodist/expressions vs multiquery) + the
RunQueries multi-queue batch semantics.

test_31 is a custom-PHP test (AddQuery x3 -> RunQueries) the generic
harness skips: q0 'one' relevance-sorted, q1 adds SetGeoAnchor +
extended sort '@geodist ASC', q2 keeps the anchor and sorts
SPH_SORT_EXPR '@id'.  Its model.bin pins all three result sets —
matches, weights, float32 lat/long/@geodist/@expr attrs, totals and
word stats — which this port asserts verbatim.

KNOWN GOLDEN ARTIFACT (documented deviation): the golden's q1 match
order is (1,4,2,3,5), which contradicts the golden's OWN @geodist
values sorted ascending (doc5 = 112049.203125 < doc3 = 127679.875, so
value order is 1,4,2,5,3).  No code path in the shipped fork can
produce the golden order: sphParseSortClause binds '@geodist asc, @id
asc' (src/sphinxsort.cpp:1399-1502), the SPH_VATTR_FLOAT comparator
compares true floats (:1294), EarlyCalc computes @geodist before every
sorter push (src/sphinx.cpp:10881), and the CSphMatchQueue binary heap
(:105-205) is exact for distinct keys — simulating push order 1..5
through that code yields 1,4,2,5,3.  The multi-queue batching path
cannot apply either: its eligibility check rejects the batch because
q0 carries no geo anchor (searchd.cpp:3991).  The golden therefore
encodes an ordering quirk of the historical binary that generated it
(same category as test_94's upstream proximity artifact).  This port
pins the VALUE-CORRECT order for q1 and the golden's order everywhere
the fork's own code reproduces it (q0, q2, and q1's first three).
"""

from __future__ import annotations

import pytest

from tests.reference_harness import build_indexes, load_test
from sphinx_1_spark.plans.api import (
    ApiQuery,
    _multiqueue_eligible,
    api_query,
    run_queries,
)


@pytest.fixture(scope="module")
def chain(spark):
    built = build_indexes(spark, load_test("test_31"))
    return [(b["name"], b["idx"], b["kill"] or None) for b in built]


def _queries():
    anchor = ("lat", "long", 0.5, 0.5)
    return [
        ApiQuery(query="one", mode="all"),
        ApiQuery(
            query="one", mode="all", geoanchor=anchor,
            sortmode="extended", sortby="@geodist ASC",
        ),
        ApiQuery(
            query="one", mode="all", geoanchor=anchor,
            sortmode="expr", sortby="@id",
        ),
    ]


# model.bin values (test/test_31/model.bin): float32 lat/long per doc
# and the exact @geodist each query result carries
LATLONG = {
    1: (0.5, 0.5),
    2: (0.5099999904632568, 0.5),
    3: (0.5199999809265137, 0.5),
    4: (0.5, 0.5099999904632568),
    5: (0.5, 0.5199999809265137),
}
GEODIST = {
    1: 0.0,
    2: 63839.9375,
    3: 127679.875,
    4: 56024.76171875,
    5: 112049.203125,
}


def test_31_multiquery_golden(chain):
    results = run_queries(chain, _queries())
    assert len(results) == 3

    for rows, meta in results:
        # totals + word stats identical across all three (model.bin)
        assert meta["total"] == 5 and meta["total_found"] == 5
        assert meta["words"] == {"one": {"docs": 5, "hits": 5}}
        for r in rows:
            assert r["weight"] == 1
            assert (r["lat"], r["long"]) == LATLONG[r["docid"]]

    r0, r1, r2 = (rows for rows, _m in results)

    # q0: relevance sort, all weights 1 -> docid asc (golden 1,2,3,4,5)
    assert [r["docid"] for r in r0] == [1, 2, 3, 4, 5]
    assert "@geodist" not in r0[0].asDict()  # no anchor on q0

    # q1: '@geodist ASC' — exact float32 geodist values per the golden;
    # order is the VALUE order (golden's 3/5 tail swap is the
    # documented generating-binary artifact, see module docstring)
    for r in r1:
        assert r["@geodist"] == GEODIST[r["docid"]]
    assert [r["docid"] for r in r1] == [1, 4, 2, 5, 3]
    assert [r["docid"] for r in r1][:3] == [1, 4, 2]  # golden prefix

    # q2: SPH_SORT_EXPR '@id' -> @expr desc, id asc (golden 5,4,3,2,1);
    # carries BOTH @geodist (anchor persisted) and @expr = float(docid)
    assert [r["docid"] for r in r2] == [5, 4, 3, 2, 1]
    for r in r2:
        assert r["@expr"] == float(r["docid"])
        assert r["@geodist"] == GEODIST[r["docid"]]


def test_31_batch_not_multiqueue_eligible(chain):
    # q0 has no geo anchor while q1/q2 do -> the reference's
    # multi-queue check rejects the batch (searchd.cpp:3991) and the
    # queries run one by one
    assert not _multiqueue_eligible(_queries())


def test_multiqueue_shares_one_match_relation(chain, monkeypatch):
    """When matching params ARE identical (searchd.cpp:3972-4019),
    run_queries computes the ranked relation once per index and each
    query's sorter runs over the shared cached base — results must be
    value-identical to one-by-one execution."""
    anchor = ("lat", "long", 0.5, 0.5)
    batch = [
        ApiQuery(query="one", mode="all", geoanchor=anchor),
        ApiQuery(
            query="one", mode="all", geoanchor=anchor,
            sortmode="extended", sortby="@geodist ASC",
        ),
        ApiQuery(
            query="one", mode="all", geoanchor=anchor,
            sortmode="expr", sortby="@id",
        ),
    ]
    assert _multiqueue_eligible(batch)

    # count match-tree evaluations: the shared path ranks once
    idx = chain[0][1]
    orig = type(idx)._ranked
    calls = []

    def spy(self, *a, **kw):
        calls.append(a[0] if a else kw.get("query"))
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(idx), "_ranked", spy)
    batched = run_queries(chain, batch)
    assert len(calls) == 1, "multi-queue batch must rank exactly once"

    monkeypatch.setattr(type(idx), "_ranked", orig)
    solo = [api_query(chain, q) for q in batch]

    for (brows, bmeta), (srows, smeta) in zip(batched, solo):
        assert [tuple(r) for r in brows] == [tuple(r) for r in srows]
        assert bmeta == smeta


# ---------------------------------------------------- SetOverride


def test_set_override_per_query(spark, chain):
    """SetOverride (src/sphinx.cpp:11083-11088, :16389-16410): the
    overridden value substitutes BEFORE filters and lands in the
    output attrs, for ONE query only — the next query sees the
    original docinfo."""
    from pyspark.sql import functions as F

    from sphinx_1_spark.plans.api import ApiQueryError

    # baseline: doc 3 has lat 0.52 (test_31 fixture)
    rows, _ = api_query(chain, ApiQuery(query="one", mode="all"))
    base = {r["docid"]: r["lat"] for r in rows}
    assert base[3] == pytest.approx(0.52, abs=1e-6)

    # override doc 3's lat to 9.0: filter sees the substituted value
    q = ApiQuery(
        query="one",
        mode="all",
        overrides={"lat": {3: 9.0}},
        filters=[F.col("lat") > F.lit(1.0)],
    )
    rows, meta = api_query(chain, q)
    assert [r["docid"] for r in rows] == [3]
    assert rows[0]["lat"] == 9.0  # substituted value in the output
    assert meta["total_found"] == 1

    # per-query: a plain query afterwards sees the original value
    rows, _ = api_query(chain, ApiQuery(query="one", mode="all"))
    assert {r["docid"]: r["lat"] for r in rows} == base

    # unknown attr -> the reference's error message
    with pytest.raises(ApiQueryError, match="unknown attribute name"):
        api_query(
            chain,
            ApiQuery(query="one", overrides={"nosuch": {1: 1.0}}),
        )


def test_override_breaks_multiqueue_eligibility(chain):
    """Differing overrides change matching inputs, so the batch must
    not share one match relation."""
    a = ApiQuery(query="one", mode="all")
    b = ApiQuery(query="one", mode="all", overrides={"lat": {3: 9.0}})
    assert not _multiqueue_eligible([a, b])
    assert _multiqueue_eligible([b, b])


def test_field_weights_through_api(spark):
    """SetWeights/SetFieldWeights reach the ranker through ApiQuery
    (BindWeights floors at 1, src/sphinx.cpp:14574-14595): a term
    matching only field 2 scores bm25 + 1000*w2."""
    from sphinx_1_spark import IndexSettings, SphinxIndex

    df = spark.createDataFrame(
        [(1, "alpha beta", "gamma"), (2, "gamma", "alpha")],
        "docid long, title string, body string",
    )
    idx = SphinxIndex.build(
        df, IndexSettings(docid_col="docid", fields=("title", "body"))
    )
    # legacy ALL mode: weight = sum over matched fields of
    # field_weight * per-field LCS (one word -> LCS 1)
    base, _ = api_query(
        [("i", idx, None)], ApiQuery(query="gamma", mode="all")
    )
    weighted, _ = api_query(
        [("i", idx, None)],
        ApiQuery(query="gamma", mode="all", field_weights=[10, 2]),
    )
    b = {r["docid"]: r["weight"] for r in base}
    w = {r["docid"]: r["weight"] for r in weighted}
    # doc1 matches 'gamma' in body only, doc2 in title only
    assert (b[1], b[2]) == (1, 1)
    assert (w[1], w[2]) == (2, 10)

    # extended2/bm25: weight = bm25part + 1000 * sum of matched-field
    # weights — the field part scales, the bm25 part is untouched
    base2, _ = api_query(
        [("i", idx, None)], ApiQuery(query="gamma", mode="extended2")
    )
    weighted2, _ = api_query(
        [("i", idx, None)],
        ApiQuery(
            query="gamma", mode="extended2", field_weights=[10, 2]
        ),
    )
    b2 = {r["docid"]: r["weight"] for r in base2}
    w2 = {r["docid"]: r["weight"] for r in weighted2}
    assert w2[2] - b2[2] == 9 * 1000   # title weight 1 -> 10
    assert w2[1] - b2[1] == 1 * 1000   # body weight 1 -> 2
    # identical field_weights stay multiqueue-eligible; differing break
    a = ApiQuery(query="gamma", mode="all", field_weights=[10, 2])
    assert _multiqueue_eligible([a, a])
    assert not _multiqueue_eligible(
        [a, ApiQuery(query="gamma", mode="all")]
    )


def test_override_coercion_case_and_multi_attr(spark, chain):
    """Review-fix pins: int values coerce into float attrs (and vice
    versa), mixed-case attr names patch the EXISTING column without
    renaming it, and multi-attr overrides land in one combined
    update."""
    # int literal into a float attr + mixed-case name, two attrs at once
    q = ApiQuery(
        query="one",
        mode="all",
        overrides={"LAT": {3: 9}, "long": {3: 8}},
    )
    rows, _ = api_query(chain, q)
    by_id = {r["docid"]: r for r in rows}
    assert by_id[3]["lat"] == 9.0       # original column name kept
    assert by_id[3]["long"] == 8.0
    assert "LAT" not in rows[0].asDict()
    assert by_id[1]["lat"] == 0.5       # other docs untouched


def test_short_field_weights_pad_to_one(spark):
    """BindWeights (src/sphinx.cpp:14574-14595): a SHORT weights list
    leaves the remaining fields at weight 1, never 0; extras ignored."""
    from sphinx_1_spark import IndexSettings, SphinxIndex

    df = spark.createDataFrame(
        [(1, "alpha", "gamma"), (2, "gamma", "beta")],
        "docid long, title string, body string",
    )
    idx = SphinxIndex.build(
        df, IndexSettings(docid_col="docid", fields=("title", "body"))
    )
    # one weight for two fields: body defaults to 1 -> doc1 (body-only
    # match) still ranks 1 in legacy ALL mode, never 0/dropped
    rows, _ = api_query(
        [("i", idx, None)],
        ApiQuery(query="gamma", mode="all", field_weights=[10]),
    )
    w = {r["docid"]: r["weight"] for r in rows}
    assert w == {1: 1, 2: 10}
    # an over-long list is truncated, not an error
    rows, _ = api_query(
        [("i", idx, None)],
        ApiQuery(query="gamma", mode="all", field_weights=[10, 2, 7, 9]),
    )
    assert {r["docid"]: r["weight"] for r in rows} == {1: 2, 2: 10}
