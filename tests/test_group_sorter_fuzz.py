"""Group-sorter differential fuzz: random SetGroupBy queries through
the full api_query path vs a pure-Python oracle implementing the
documented exact-grouping contract.

What it pins (the layer above the scoring model, which
test_ranker_weight_fuzz pins separately):

  key      the reference's INTEGER group keys (CSphGrouperDay/Week/
           Month/Year, src/sphinxsort.cpp:239-267): day=YYYYMMDD,
           month=YYYYMM, year=YYYY, week=YYYY*1000 + day-of-year of
           the preceding Sunday (base 1) with the year-boundary leap
           rollback; attr = the raw integer
  rep row  best match per group by (weight desc, docid asc) — the
           group sorter's inner relevance comparator
  @count   group size; @distinct = COUNT(DISTINCT attr) per group
           (CSphUniqounter, src/sphinxsort.cpp:549-607)
  order    the groupsort clause (sphParseSortClause key set: @group/
           @count/@distinct/@weight/@id + plain attrs, implicit
           trailing @id asc on single-key clauses)
  paging   groups sorted, cut to max_matches, paged [offset:offset+
           limit); total = min(n_groups, max_matches), total_found =
           n_groups

Per-doc weights come from the SAME engine query un-grouped, so a
mismatch here is a grouping-layer bug, not a scoring one."""

from __future__ import annotations

import random
from datetime import datetime, timezone

import pytest

from sphinx_1_spark import IndexSettings, SphinxIndex
from sphinx_1_spark.plans.api import ApiQuery, api_query

VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi"
).split()

N_DOCS = 70
# epochs spanning two year boundaries so the week key's prev_sunday<=0
# rollback (and its leap adjustment) actually fires
TS_LO = int(datetime(2008, 12, 20, tzinfo=timezone.utc).timestamp())
TS_HI = int(datetime(2010, 2, 5, tzinfo=timezone.utc).timestamp())


@pytest.fixture(scope="module")
def group_corpus(spark):
    rng = random.Random(20260819)
    weights = [1.0 / (i + 1) for i in range(len(VOCAB))]
    rows = []
    for did in range(1, N_DOCS + 1):
        text = " ".join(rng.choices(VOCAB, weights=weights, k=rng.randint(3, 8)))
        rows.append(
            (
                did,
                text,
                rng.randint(1, 6),
                rng.randint(TS_LO, TS_HI),
                rng.randint(1, 8),
            )
        )
    docs = spark.createDataFrame(
        rows, "docid long, text string, group_id int, ts long, tag int"
    )
    idx = SphinxIndex.build(
        docs,
        IndexSettings(docid_col="docid", attrs=("group_id", "ts", "tag")),
    ).persist()
    attrs = {r[0]: {"group_id": r[2], "ts": r[3], "tag": r[4]} for r in rows}
    return idx, attrs


# ---------------------------------------------------------------- oracle


def _gkey(attrs, groupattr, func):
    v = attrs[groupattr]
    if func == "attr":
        return v
    dt = datetime.fromtimestamp(v, tz=timezone.utc)
    if func == "day":
        return dt.year * 10000 + dt.month * 100 + dt.day
    if func == "month":
        return dt.year * 100 + dt.month
    if func == "year":
        return dt.year
    # week: day-of-year of the preceding Sunday, base 1; a Sunday on
    # or before Jan 1 rolls back into the previous year with its
    # day count (365/366)
    doy = dt.timetuple().tm_yday
    wday = (dt.weekday() + 1) % 7  # Sunday=0 like tm_wday
    prev_sunday = doy - wday
    if prev_sunday <= 0:
        py = dt.year - 1
        leap = py % 4 == 0 and (py % 100 != 0 or py % 400 == 0)
        return py * 1000 + prev_sunday + (366 if leap else 365)
    return dt.year * 1000 + prev_sunday


def _sort_value(g, key, attrs):
    """g: dict with groupby/count/distinct/weight/docid."""
    if key == "@group":
        return g["groupby"]
    if key == "@count":
        return g["count"]
    if key == "@distinct":
        return g["distinct"]
    if key == "@weight":
        return g["weight"]
    if key == "@id":
        return g["docid"]
    return attrs[g["docid"]][key]


def _group_oracle(matches, attrs, cfg):
    """matches: [(docid, weight)] from the ungrouped engine run."""
    groups: dict[int, list[tuple[int, int]]] = {}
    for docid, weight in matches:
        groups.setdefault(
            _gkey(attrs[docid], cfg["groupattr"], cfg["groupfunc"]), []
        ).append((docid, weight))
    out = []
    for key, members in groups.items():
        # rep = best by (weight desc, docid asc)
        rep_docid, rep_weight = min(members, key=lambda m: (-m[1], m[0]))
        g = {
            "groupby": key,
            "count": len(members),
            "weight": rep_weight,
            "docid": rep_docid,
        }
        if cfg["groupdistinct"]:
            g["distinct"] = len(
                {attrs[d][cfg["groupdistinct"]] for d, _ in members}
            )
        out.append(g)
    for key, desc in reversed(cfg["sortkeys"]):
        out.sort(key=lambda g: _sort_value(g, key, attrs), reverse=desc)
    n_groups = len(out)
    page = out[: min(cfg["offset"] + cfg["limit"], cfg["max_matches"])]
    page = page[cfg["offset"] :]
    return page, min(n_groups, cfg["max_matches"]), n_groups


# ---------------------------------------------------------------- the fuzz


def _gen_cfg(rng):
    groupattr, groupfunc = rng.choice(
        (
            ("group_id", "attr"),
            ("ts", "day"),
            ("ts", "week"),
            ("ts", "month"),
            ("ts", "year"),
        )
    )
    groupdistinct = rng.choice((None, None, "tag"))
    # clause keys: optional non-unique first key + a unique last key
    # (@group / @id are unique per group row), so both engine and
    # oracle orders are total and comparable list-for-list
    first_pool = ["@count", "@weight", "group_id", "tag"]
    if groupdistinct:
        first_pool.append("@distinct")
    sortkeys = []
    if rng.random() < 0.7:
        sortkeys.append((rng.choice(first_pool), rng.random() < 0.5))
    sortkeys.append((rng.choice(("@group", "@id")), rng.random() < 0.5))
    clause = ", ".join(
        f"{k} {'desc' if d else 'asc'}" for k, d in sortkeys
    )
    return {
        "groupattr": groupattr,
        "groupfunc": groupfunc,
        "groupdistinct": groupdistinct,
        "sortkeys": sortkeys,
        "clause": clause,
        "offset": rng.choice((0, 0, 0, 1, 2)),
        "limit": rng.choice((1, 2, 3, 20)),
        "max_matches": rng.choice((2, 3, 5, 1000)),
    }


def test_random_group_queries_match_grouping_oracle(group_corpus):
    idx, attrs = group_corpus
    rng = random.Random(1357)
    queries = [
        rng.choice(VOCAB)
        if rng.random() < 0.5
        else (
            f"{rng.choice(VOCAB)} | {rng.choice(VOCAB)}"
            if rng.random() < 0.5
            else f"{rng.choice(VOCAB)} {rng.choice(VOCAB)}"
        )
        for _ in range(10)
    ]
    # per distinct query: the ungrouped engine result = the oracle's
    # input weights (one big page, far above corpus size)
    plain: dict[str, list[tuple[int, int]]] = {}
    for qs in queries:
        rows, _meta = api_query(
            [("i", idx, None)],
            ApiQuery(query=qs, mode="extended2", limit=1000, max_matches=1000),
        )
        plain[qs] = [(r["docid"], r["weight"]) for r in rows]

    n_checked = n_nonempty = n_week = n_distinct = n_cut = 0
    for i in range(60):
        qs = rng.choice(queries)
        cfg = _gen_cfg(rng)
        rows, meta = api_query(
            [("i", idx, None)],
            ApiQuery(
                query=qs,
                mode="extended2",
                groupattr=cfg["groupattr"],
                groupfunc=cfg["groupfunc"],
                groupsort=cfg["clause"],
                groupdistinct=cfg["groupdistinct"],
                offset=cfg["offset"],
                limit=cfg["limit"],
                max_matches=cfg["max_matches"],
            ),
        )
        got = [
            (
                r["@groupby"],
                r["@count"],
                r["@distinct"] if cfg["groupdistinct"] else None,
                r["docid"],
                r["weight"],
            )
            for r in rows
        ]
        page, total, total_found = _group_oracle(plain[qs], attrs, cfg)
        want = [
            (
                g["groupby"],
                g["count"],
                g.get("distinct"),
                g["docid"],
                g["weight"],
            )
            for g in page
        ]
        assert got == want, (
            f"query {i}: {qs!r} cfg={cfg}\ngot[:5]: {got[:5]}\n"
            f"want[:5]: {want[:5]}"
        )
        assert meta["total"] == total and meta["total_found"] == total_found, (
            f"query {i}: {qs!r} cfg={cfg} meta={meta} "
            f"want total={total} total_found={total_found}"
        )
        n_checked += 1
        n_nonempty += bool(want)
        n_week += cfg["groupfunc"] == "week"
        n_distinct += bool(cfg["groupdistinct"])
        n_cut += total_found > cfg["max_matches"]
    assert n_checked == 60
    # the generator must actually exercise what it claims to
    assert (
        n_nonempty >= 40 and n_week >= 6 and n_distinct >= 12 and n_cut >= 8
    ), (n_nonempty, n_week, n_distinct, n_cut)
