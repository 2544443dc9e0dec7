"""Hand-ported replays of the reference's custom-PHP e2e tests that
the generic harness skips (no <queries> section).

test_46 'mva filtering' is self-checking PHP: each SetFilter /
SetFilterRange over the MVA attr asserts an expected match count (and
that a single match is doc 4).  test_60 'select expressions' pins a
10,002-argument IN(@id, ...) SetSelect expression filtered on its own
alias against its model.bin result.  Both run through the same
SphinxAPI layer the generic harness uses.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.reference_harness import (
    build_indexes,
    load_test,
    run_query,
    RefQuery,
)
from sphinx_1_spark.plans.api import ApiQuery, api_query


@pytest.fixture(scope="module")
def spark():
    from sphinx_1_spark.session import get_spark

    s = get_spark(cores=8)
    s.sparkContext.setLogLevel("ERROR")
    return s


def _indexes(spark, test_id):
    built = build_indexes(spark, load_test(test_id))
    return [(b["name"], b["idx"], b["kill"]) for b in built]


def test_46_mva_value_filters(spark):
    indexes = _indexes(spark, "test_46")
    # (values..., expected_count) — a single match must be doc 4
    # (test/test_46/test.xml custom_test VALUES block)
    cases = [
        ((0,), 0), ((7,), 0), ((15,), 0), ((21,), 0),
        ((3, 8, 16), 0), ((7, 18, 21), 0),
        ((6,), 1), ((12,), 1), ((20,), 1),
        ((5, 12), 1), ((7, 17), 1), ((15, 20), 1),
    ]
    for values, expect in cases:
        # multi-value MVA filter: any stored value in the set
        flt = F.arrays_overlap(
            F.col("mva"), F.array(*[F.lit(v) for v in values])
        )
        rows, _meta = api_query(
            [(n, idx, kill or None) for n, idx, kill in indexes],
            ApiQuery(query="", filters=[flt]),
        )
        assert len(rows) == expect, (values, expect, rows)
        if expect == 1:
            assert rows[0]["docid"] == 4


def test_46_mva_range_filters(spark):
    indexes = _indexes(spark, "test_46")
    cases = [
        ((1, 4), 0), ((1, 5), 0), ((1, 6), 1), ((1, 7), 1),
        ((1, 12), 1), ((1, 15), 1),
        ((6, 9), 1), ((7, 9), 0), ((8, 10), 0), ((9, 12), 1),
        ((9, 15), 1), ((9, 21), 1), ((16, 21), 1), ((17, 21), 1),
        ((18, 19), 0), ((18, 25), 1), ((19, 25), 1), ((20, 25), 1),
        ((21, 25), 0),
    ]
    for (lo, hi), expect in cases:
        got = run_query(
            indexes,
            RefQuery(
                query="", filter="mva", filter_range=(lo, hi)
            ),
        )
        assert got["total_found"] == expect, ((lo, hi), expect, got)
        if expect == 1:
            assert got["matches"][0][0] == 4


def test_45_killlist_chain_with_id_filters(spark):
    """test_45 'killlist, part 2/2': main(1-5) + three one-doc deltas
    (6,7,8) whose kill-lists kill 1,2,3; three batched queries over
    the four-index chain with @id filters (model.bin: {4}, {5,6,7,8},
    then all five sorted @id DESC)."""
    indexes = _indexes(spark, "test_45")
    chain = [(n, idx, kill or None) for n, idx, kill in indexes]

    rows, meta = api_query(
        chain, ApiQuery(query="test", filters=[F.col("docid").isin([1, 2, 3, 4])])
    )
    assert sorted(r["docid"] for r in rows) == [4]
    assert meta["total_found"] == 1

    rows, meta = api_query(
        chain, ApiQuery(query="test", filters=[F.col("docid").isin([5, 6, 7, 8])])
    )
    assert sorted(r["docid"] for r in rows) == [5, 6, 7, 8]

    rows, meta = api_query(
        chain,
        ApiQuery(
            query="test",
            filters=[F.col("docid").isin(list(range(1, 9)))],
            sortmode="extended",
            sortby="@id DESC",
        ),
    )
    assert [r["docid"] for r in rows] == [8, 7, 6, 5, 4]
    assert meta["total_found"] == 5


def test_32_fullscan_reject_update_ranges(spark):
    """test_32 'fullscan early-reject blocks vs cutoff/updates/
    ranges': 200-doc fixture (post fixture DELETE/UPDATE), then the
    custom flow — tag=150 fullscan, UpdateAttributes(137 -> 1137),
    re-find by the new value, and two range scans (model.bin: doc 150;
    1 row updated; doc 137; docs 1,198,199,200; docs 127,128)."""
    from sphinx_1_spark.plans.attrs import update_attributes

    name, idx, kill = _indexes(spark, "test_32")[0]
    chain = [(name, idx, kill or None)]

    rows, meta = api_query(
        chain, ApiQuery(query="", filters=[F.col("tag") == 150])
    )
    assert [(r["docid"], r["tag"]) for r in rows] == [(150, 150)]

    # UpdateAttributes: doc 137 tag -> 1137 (copy-on-write docinfo)
    upd = spark.createDataFrame([(137, 1137)], "docid long, tag int")
    idx.docinfo = update_attributes(idx.docinfo, upd, ["tag"])

    rows, _ = api_query(
        chain, ApiQuery(query="", filters=[F.col("tag") == 1137])
    )
    assert [(r["docid"], r["tag"]) for r in rows] == [(137, 1137)]

    rows, _ = api_query(
        chain, ApiQuery(query="", filters=[F.col("tag").between(198, 1100)])
    )
    assert sorted((r["docid"], r["tag"]) for r in rows) == [
        (1, 200), (198, 198), (199, 199), (200, 200)
    ]

    rows, _ = api_query(
        chain, ApiQuery(query="", filters=[F.col("tag").between(127, 128)])
    )
    assert sorted(r["docid"] for r in rows) == [127, 128]


def test_39_distributed_updates(spark):
    """test_39 'distributed updates': a distributed index dist =
    local block1 (ids 1-4) + agent block2 (ids 11-14); the custom
    PHP flow is Query('') over dist, UpdateAttributes('dist',
    ['group_id'], {11: [123]}) — searchd forwards the update to the
    local part and every agent and sums the per-part updated counts
    (src/searchd.cpp UpdateAttributes handler) — then Query('')
    again.  model.bin: 8 matches at weight 1; 1 row updated; doc 11's
    group_id now 123.  Our batch analog fans dist out to its local
    indexes and applies the copy-on-write docinfo patch to each."""
    from sphinx_1_spark.plans.attrs import update_attributes

    built = {b["name"]: b for b in build_indexes(spark, load_test("test_39"))}
    # dist resolves to its parts, agent listed after local
    parts = [built["block1"], built["block2"]]
    chain = [(b["name"], b["idx"], b["kill"] or None) for b in parts]

    def snapshot():
        rows, meta = api_query(chain, ApiQuery(query=""))
        return (
            sorted((r["docid"], r["weight"], r["group_id"]) for r in rows),
            meta["total_found"],
        )

    got, total = snapshot()
    assert total == 8
    assert got == [
        (1, 1, 1), (2, 1, 1), (3, 1, 2), (4, 1, 2),
        (11, 1, 1), (12, 1, 1), (13, 1, 2), (14, 1, 2),
    ]

    # UpdateAttributes(dist, [group_id], {11: [123]}): broadcast to
    # every part; updated count = sum of per-part matched docids
    upd = spark.createDataFrame([(11, 123)], "docid long, group_id int")
    n_updated = 0
    for b in parts:
        idx = b["idx"]
        n_updated += idx.docinfo.join(upd, "docid", "left_semi").count()
        idx.docinfo = update_attributes(idx.docinfo, upd, ["group_id"])
    assert n_updated == 1

    got, total = snapshot()
    assert total == 8
    assert got == [
        (1, 1, 1), (2, 1, 1), (3, 1, 2), (4, 1, 2),
        (11, 1, 123), (12, 1, 1), (13, 1, 2), (14, 1, 2),
    ]


def test_60_wide_in_select(spark):
    indexes = _indexes(spark, "test_60")
    idlist = ",".join(str(i) for i in range(10000, 20000))
    aq = ApiQuery(
        query="",
        select=[("q", f"IN(@id,1,{idlist},3)")],
        late_filters=[F.col("q") == 1],
    )
    rows, meta = api_query(
        [(n, idx, kill or None) for n, idx, kill in indexes], aq
    )
    got = sorted((r["docid"], r["tag"], r["q"]) for r in rows)
    # model.bin: docs 1 and 3 match, q=1, tag mirrors the id
    assert got == [(1, 1, 1), (3, 3, 1)]
