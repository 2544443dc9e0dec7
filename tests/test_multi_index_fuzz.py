"""Multi-index serving fuzz: random queries over three overlapping
indexes with randomized kill-lists and index weights, through the
full api_query merge path vs a pure-Python oracle of the searchd
rules:

  kills    index i's rows are suppressed by the kill-lists of all
           LATER indexes (RunSubset killlist chaining,
           src/searchd.cpp:4185-4196); an index's own list never
           applies to itself
  dupes    merged matches sort by (docid asc, tag desc) — the
           CSphMatch comparator at src/searchd.cpp:2515 — and the
           first copy survives, i.e. the LAST-listed index's row
           (what makes 'main, delta' serve fresh rows)
  weights  with SetIndexWeights, every copy's weight is multiplied by
           its index's weight (missing names default 1) and dupes'
           weighted ranks SUM into the surviving row
           (src/searchd.cpp:3775-3800)
  order    the fresh queue re-sort (weight desc, docid asc) and the
           bounded max_matches page window
  totals   total_found = sum(per-index matches) - dupes = merged
           cardinality; total = min(total_found, max_matches)

Per-index weights come from the same engine queries run single-index
(the scoring model is pinned by test_ranker_weight_fuzz), so a
mismatch here is a merge-layer bug."""

from __future__ import annotations

import random

import pytest

from sphinx_1_spark import IndexSettings, SphinxIndex
from sphinx_1_spark.plans.api import ApiQuery, api_query

VOCAB = "red green blue cyan teal plum gold jade rust sage".split()


def _mkdocs(spark, rng, lo, hi):
    weights = [1.0 / (i + 1) for i in range(len(VOCAB))]
    rows = [
        (did, " ".join(rng.choices(VOCAB, weights=weights, k=rng.randint(2, 7))))
        for did in range(lo, hi + 1)
    ]
    return spark.createDataFrame(rows, "docid long, text string")


@pytest.fixture(scope="module")
def three_indexes(spark):
    rng = random.Random(424242)
    s = IndexSettings(docid_col="docid")
    specs = [("a", 1, 40), ("b", 20, 60), ("c", 45, 80)]
    out = []
    for name, lo, hi in specs:
        idx = SphinxIndex.build(_mkdocs(spark, rng, lo, hi), s).persist()
        out.append((name, idx, lo, hi))
    return out


def _merge_oracle(per_index, kills, index_weights, cfg):
    """per_index: [(name, [(docid, weight)])] in listing order;
    kills: [set(docid)] — kill-list OF each index."""
    tagged = []
    for tag, (_name, rows) in enumerate(per_index):
        later = set().union(*kills[tag + 1 :]) if tag + 1 < len(kills) else set()
        for docid, weight in rows:
            if docid in later:
                continue
            tagged.append((docid, tag, weight))
    # (docid asc, tag desc): first copy per docid survives
    tagged.sort(key=lambda t: (t[0], -t[1]))
    merged = []
    i = 0
    while i < len(tagged):
        docid, tag, weight = tagged[i]
        if index_weights:
            iw = lambda t: index_weights.get(per_index[t][0], 1)
            total = weight * iw(tag)
            j = i + 1
            while j < len(tagged) and tagged[j][0] == docid:
                total += tagged[j][2] * iw(tagged[j][1])
                j += 1
            merged.append((total, docid))
            i = j
        else:
            merged.append((weight, docid))
            i += 1
            while i < len(tagged) and tagged[i][0] == docid:
                i += 1
    merged.sort(key=lambda t: (-t[0], t[1]))
    total_found = len(merged)
    page = merged[: min(cfg["offset"] + cfg["limit"], cfg["max_matches"])]
    page = page[cfg["offset"] :]
    return page, min(total_found, cfg["max_matches"]), total_found


def test_random_multi_index_queries_match_merge_oracle(three_indexes, spark):
    rng = random.Random(97531)
    names = [n for n, _i, _lo, _hi in three_indexes]
    queries = [
        rng.choice(VOCAB)
        if rng.random() < 0.6
        else f"{rng.choice(VOCAB)} | {rng.choice(VOCAB)}"
        for _ in range(8)
    ]
    # per (query, index): the single-index engine result = the
    # oracle's input weights
    plain: dict[tuple[str, str], list[tuple[int, int]]] = {}
    for qs in queries:
        for name, idx, _lo, _hi in three_indexes:
            rows, _meta = api_query(
                [(name, idx, None)],
                ApiQuery(query=qs, mode="extended2", limit=1000, max_matches=1000),
            )
            plain[(qs, name)] = [(r["docid"], r["weight"]) for r in rows]

    n_dupes_seen = n_weighted = n_killed = n_cut = 0
    for i in range(30):
        qs = rng.choice(queries)
        # kill-list OF b kills docids in a; OF c kills docids in a/b
        kills = [set()]
        for _name, _idx, lo, hi in three_indexes[1:]:
            kills.append(
                {d for d in range(1, hi) if rng.random() < 0.1}
                if rng.random() < 0.6
                else set()
            )
        index_weights = (
            {n: rng.randint(1, 4) for n in rng.sample(names, rng.randint(1, 3))}
            if rng.random() < 0.5
            else None
        )
        cfg = {
            "offset": rng.choice((0, 0, 2)),
            "limit": rng.choice((3, 5, 20)),
            "max_matches": rng.choice((4, 8, 1000)),
        }
        kill_dfs = [
            spark.createDataFrame([(d,) for d in sorted(ks)], "docid long")
            if ks
            else None
            for ks in kills
        ]
        rows, meta = api_query(
            [
                (name, idx, kill_dfs[t])
                for t, (name, idx, _lo, _hi) in enumerate(three_indexes)
            ],
            ApiQuery(
                query=qs,
                mode="extended2",
                index_weights=index_weights,
                offset=cfg["offset"],
                limit=cfg["limit"],
                max_matches=cfg["max_matches"],
            ),
        )
        got = [(r["weight"], r["docid"]) for r in rows]
        per_index = [(n, plain[(qs, n)]) for n in names]
        want, total, total_found = _merge_oracle(
            per_index, kills, index_weights, cfg
        )
        assert got == want, (
            f"query {i}: {qs!r} iw={index_weights} kills="
            f"{[len(k) for k in kills]} cfg={cfg}\n"
            f"got[:6]: {got[:6]}\nwant[:6]: {want[:6]}"
        )
        assert meta["total"] == total and meta["total_found"] == total_found, (
            f"query {i}: meta={meta} want {total}/{total_found}"
        )
        # coverage bookkeeping
        alive = [
            (d, t)
            for t, (_n, rows_) in enumerate(per_index)
            for d, _w in rows_
            if d not in set().union(*kills[t + 1 :])
        ]
        n_dupes_seen += len(alive) != len({d for d, _t in alive})
        n_weighted += bool(index_weights)
        n_killed += any(kills)
        n_cut += total_found > cfg["max_matches"]
    assert (
        n_dupes_seen >= 15 and n_weighted >= 8 and n_killed >= 10 and n_cut >= 5
    ), (n_dupes_seen, n_weighted, n_killed, n_cut)
