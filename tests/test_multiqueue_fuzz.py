"""Invariance fuzz of the RunQueries multi-queue: a batched run must
be value-identical to one-by-one execution, whatever mix of sorters
rides the shared match relation.

`run_queries` (plans/api.py) implements the reference's multi-queue
(RunSubset eligibility, src/searchd.cpp:3972-4019): when everything
that affects MATCHING is identical across the batch, the match
relation is computed once and cached, and each query's own
sort/group/page plan runs on top.  The eligibility matrix is pinned
in test_multiquery.py; this fuzz drives the WHOLE path with random
batches — eligible ones (same query/filters, wildly different
sorters, group-bys, pages and max_matches cuts) and ineligible ones
(diverging query strings, filters, select lists) — and asserts
rows+meta equality against plain api_query per member, plus that the
eligibility decision itself matches the batch's design.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sphinx_1_spark import IndexSettings, SphinxIndex
from sphinx_1_spark.plans.api import (
    ApiQuery,
    _multiqueue_eligible,
    api_query,
    run_queries,
)

VOCAB = "red green blue cyan teal plum gold jade rust sage".split()


@pytest.fixture(scope="module")
def mq_index(spark):
    rng = random.Random(777)
    weights = [1.0 / (i + 1) for i in range(len(VOCAB))]
    rows = [
        (
            did,
            " ".join(rng.choices(VOCAB, weights=weights, k=rng.randint(3, 9))),
            rng.randint(-20, 20),
            rng.randint(0, 5),
            rng.randint(-400, 400) / 4.0,
        )
        for did in range(1, 121)
    ]
    df = spark.createDataFrame(
        rows, "docid long, text string, tag int, grp int, price float"
    )
    idx = SphinxIndex.build(
        df, IndexSettings(docid_col="docid", attrs=("tag", "grp", "price"))
    )
    return idx.persist()


def _rand_sorter(rng, q: ApiQuery) -> ApiQuery:
    """Randomize everything the multi-queue allows to differ."""
    r = rng.random()
    if r < 0.3:
        q.sortmode, q.sortby = "extended", rng.choice(
            ("tag ASC, @id DESC", "grp DESC, @weight DESC, @id ASC",
             "price ASC, @id ASC", "@weight DESC, @id ASC")
        )
    elif r < 0.45:
        q.sortmode = rng.choice(("attr_asc", "attr_desc"))
        q.sortby = rng.choice(("tag", "grp", "docid"))
    if rng.random() < 0.4:
        q.groupattr = "grp"
        q.groupsort = rng.choice(
            ("@group desc", "@group asc", "@count desc", "@count asc")
        )
        if rng.random() < 0.4:
            q.groupdistinct = "tag"
    q.offset = rng.choice((0, 0, 2, 5))
    q.limit = rng.choice((3, 5, 10, 30))
    q.max_matches = rng.choice((1000, 1000, 6, 15))
    return q


def _base_query(rng) -> ApiQuery:
    qs = rng.choice(
        ("red", "green | blue", "teal -plum", '"red green"', "gold | rust | sage")
    )
    q = ApiQuery(query=qs, mode="extended2")
    if rng.random() < 0.5:
        q.filters = [F.col("tag") > rng.randint(-10, 5)]
    if rng.random() < 0.25:
        q.field_weights = [rng.randint(1, 4)]
    return q


def test_random_batches_equal_one_by_one(mq_index):
    rng = random.Random(13579)
    chain = [("main", mq_index, None)]
    n_eligible = n_ineligible = n_grouped = n_cut = 0
    for i in range(24):
        base = _base_query(rng)
        size = rng.randint(2, 4)
        make_eligible = rng.random() < 0.6
        batch = []
        for j in range(size):
            import copy

            q = copy.copy(base)
            q.select = list(base.select)
            if not make_eligible and j > 0:
                # diverge something that affects matching
                kind = rng.random()
                if kind < 0.4:
                    q.query = "cyan | jade"
                elif kind < 0.7:
                    q.filters = [F.col("tag") > 99 - j]
                else:
                    q.select = [("x", "tag*2")]
            batch.append(_rand_sorter(rng, q))
        assert _multiqueue_eligible(batch) == (make_eligible and size >= 2), (
            i, make_eligible, size
        )
        got = run_queries(chain, batch)
        want = [api_query(chain, q) for q in batch]
        for j, ((g_rows, g_meta), (w_rows, w_meta)) in enumerate(zip(got, want)):
            assert g_rows == w_rows, (
                f"batch {i} query {j} ({batch[j].query!r}, "
                f"sort={batch[j].sortmode}/{batch[j].sortby!r}, "
                f"group={batch[j].groupattr}): rows diverge\n"
                f"batched[:4]={g_rows[:4]}\nsingle[:4]={w_rows[:4]}"
            )
            assert g_meta == w_meta, (f"batch {i} query {j}", g_meta, w_meta)
        n_eligible += make_eligible
        n_ineligible += not make_eligible
        n_grouped += any(q.groupattr for q in batch)
        n_cut += any(
            m["total_found"] > q.max_matches for (_r, m), q in zip(want, batch)
        )
    assert n_eligible >= 10 and n_ineligible >= 5, (n_eligible, n_ineligible)
    assert n_grouped >= 10 and n_cut >= 3, (n_grouped, n_cut)
