"""Main+delta serving invariance fuzz.

Property (searchd kill-list chaining, src/searchd.cpp:4185-4196): a
query served over N delta segments with kill-lists applied must return
exactly the docs the SAME query returns over one fresh index built
from only the newest crawl of every url.  The fixed streaming tests
pin this on one hand-built two-batch fixture; this fuzz randomizes the
re-crawl topology (1-3 crawls per url with independently random
content, split across three delta batches) and the queries.

Compared three ways per query:
  engine  — IncrementalView.search_topk over the 3 segments (per-
            segment WAND + suffix kill-list unions + merge queue)
  control — SegmentSet.wand_topk over a single segment built from the
            newest-per-url rows (same builder, no kill machinery)
  oracle  — token-level AND/OR evaluation over the newest text per url

Sets must agree docid-for-docid (weights legitimately differ between
engine and control only in IDF when a term's df changes with killed
copies still counted per segment — set equality is the reference
contract, and k >= corpus size makes the top-k cut vacuous)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest

from sphinx_1_spark.plans.segment_index import SegmentSet
from sphinx_1_spark.streaming.incremental import (
    IncrementalIndexer,
    IncrementalView,
)

VOCAB = (
    "crawl index page query spark merge token stream block delta "
    "shard fetch parse rank store batch queue flush probe sketch"
).split()

N_URLS = 25
N_BATCHES = 3


def _mk_crawls(rng):
    """[(url, batch, ts, text)] — each url crawled 1..3 times, crawl c
    lands in batch c, strictly newer ts per crawl."""
    crawls = []
    for j in range(N_URLS):
        url = f"http://h{j}.example/page"
        for c in range(rng.randint(1, N_BATCHES)):
            text = " ".join(
                rng.choices(VOCAB, k=rng.randint(4, 12))
            )
            ts = datetime(2026, 1, 1) + timedelta(days=10 * c, hours=j)
            crawls.append((url, c, ts, text))
    return crawls


def _pages_df(spark, rows):
    data = [
        (u, ts, f"<html><body>{t}</body></html>".encode(), t, "en")
        for u, _c, ts, t in rows
    ]
    return spark.createDataFrame(
        data,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


@pytest.fixture(scope="module")
def recrawl_fixture(spark, tmp_path_factory):
    rng = random.Random(20260823)
    crawls = _mk_crawls(rng)
    root = tmp_path_factory.mktemp("recrawl_fuzz")

    ix = IncrementalIndexer(str(root / "stream"))
    for b in range(N_BATCHES):
        batch = [r for r in crawls if r[1] == b]
        ix.process_batch(_pages_df(spark, batch), b)
    view = IncrementalView(spark, ix.segment_paths())

    newest = {}
    for u, c, ts, t in crawls:
        if u not in newest or c > newest[u][0]:
            newest[u] = (c, ts, t)
    fresh_rows = [(u, c, ts, t) for u, (c, ts, t) in newest.items()]
    ox = IncrementalIndexer(str(root / "fresh"))
    ox.process_batch(_pages_df(spark, fresh_rows), 0)
    control = SegmentSet(spark, ox.segment_paths())

    url_by_docid = {
        r["docid"]: r["url"]
        for r in spark.read.parquet(
            ox.segment_paths()[0] + "/docinfo"
        ).collect()
    }
    tokens_by_url = {u: set(t.split()) for u, (_c, _ts, t) in newest.items()}
    return view, control, url_by_docid, tokens_by_url


def test_live_docinfo_is_newest_per_url(recrawl_fixture):
    view, _control, url_by_docid, tokens_by_url = recrawl_fixture
    live = {(r["url"], r["warc_ts"]) for r in view.docinfo().collect()}
    assert len(live) == N_URLS
    assert {u for u, _ in live} == set(tokens_by_url)


def test_random_queries_match_fresh_index_and_token_oracle(recrawl_fixture):
    view, control, url_by_docid, tokens_by_url = recrawl_fixture
    rng = random.Random(1357)
    n_multi = n_nonempty = 0
    for i in range(20):
        words = rng.sample(VOCAB, rng.randint(1, 3))
        mode = rng.choice(("and", "or"))

        got = {
            r["docid"]
            for r in view.search_topk(words, k=500, mode=mode).collect()
        }
        ctl = {
            r["docid"]
            for r in control.wand_topk(words, k=500, mode=mode).collect()
        }
        pred = all if mode == "and" else any
        want_urls = {
            u
            for u, toks in tokens_by_url.items()
            if pred(w in toks for w in words)
        }
        got_urls = {url_by_docid[d] for d in got}

        assert got == ctl, (
            f"query {i}: {words} {mode}\n"
            f"multi-segment-only: {sorted(got - ctl)[:5]}\n"
            f"fresh-only: {sorted(ctl - got)[:5]}"
        )
        assert got_urls == want_urls, (
            f"query {i}: {words} {mode}\n"
            f"engine-only: {sorted(got_urls - want_urls)[:5]}\n"
            f"oracle-only: {sorted(want_urls - got_urls)[:5]}"
        )
        if len(words) > 1:
            n_multi += 1
        if want_urls:
            n_nonempty += 1
    assert n_multi >= 8 and n_nonempty >= 12
