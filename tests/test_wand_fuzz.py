"""WAND top-k differential fuzz: randomized queries through
SegmentSet.wand_topk (block-max pruning over compressed blocks) vs a
brute-force Python BM25 oracle over the fully-decoded postings.

The fixed tests in test_segments.py pin six word/mode combos against
the engine's own _score_blocks (pruning == no-pruning); this fuzz
adds an INDEPENDENT scorer — idf = log((N-df+1)/df)/(2*q*log(1+N)),
tfidf = tf/(tf+1.2)*idf summed over matching terms, weight =
floor((tfidf+0.5)*1000) + 1000, ties docid asc — and randomizes what
the pruning logic actually depends on: term df mix (head terms with
df > N/2 flip idf negative and must disable OR pruning), k vs
candidate-set size (theta seeding), AND-mode rare-term block overlap,
duplicate query words (idf q-divisor counts DISTINCT), absent words,
and kill-list excludes (applied before the top-k cut AND the theta
seed).  A pruning bug shows up as a missing/extra/reordered row."""

from __future__ import annotations

import math
import random

import pytest


@pytest.fixture(scope="module")
def wand_corpus(spark, tmp_path_factory):
    from sphinx_1_spark.operators.segments import decode_blocks
    from sphinx_1_spark.plans.segment_index import SegmentSet, build_segments
    from sphinx_1_spark.sources.pages import generate_pages

    out = str(tmp_path_factory.mktemp("wandfuzz"))
    pages = generate_pages(spark, 600, seed=77, partitions=4)
    paths = build_segments(pages, out, n_shards=2)
    segs = SegmentSet(spark, paths)
    postings: dict[str, dict[int, int]] = {}
    for r in decode_blocks(segs.blocks).collect():
        postings.setdefault(r["word"], {})[r["docid"]] = int(r["tf"])
    return segs, postings, segs.n_docs


def _brute_topk(postings, n_docs, words, k, mode, excluded=frozenset()):
    terms = list(dict.fromkeys(words))
    q = len(terms)
    idf = {}
    for w in terms:
        dfw = len(postings.get(w, {}))
        idf[w] = (
            0.0
            if dfw == 0
            else math.log((n_docs - dfw + 1) / dfw) / (2 * q * math.log(1 + n_docs))
        )
    per_term = [set(postings.get(w, {})) for w in terms]
    if mode == "and":
        if any(not s for s in per_term):
            return []
        docs = set.intersection(*per_term)
    else:
        docs = set.union(*per_term)
    out = []
    for d in docs:
        if d in excluded:
            continue
        tfidf = 0.0
        for w in terms:
            tf = postings.get(w, {}).get(d)
            if tf:
                tfidf += tf / (tf + 1.2) * idf[w]
        out.append((math.floor((tfidf + 0.5) * 1000) + 1000, d))
    out.sort(key=lambda t: (-t[0], t[1]))
    return out[:k]


def test_random_wand_queries_match_bruteforce_oracle(wand_corpus):
    segs, postings, n_docs = wand_corpus
    rng = random.Random(8642)
    # word pool stratified by df so head/mid/tail terms all appear
    by_df = sorted(postings, key=lambda w: -len(postings[w]))
    head = by_df[:3]           # df may exceed N/2 -> negative idf
    mid = by_df[3 : len(by_df) // 3]
    tail = by_df[len(by_df) // 3 :]
    n_neg_idf = n_and = n_excl = n_dup = n_small_k = 0
    spark = segs.spark
    for i in range(36):
        nw = rng.randint(1, 4)
        words = []
        for _ in range(nw):
            r = rng.random()
            if r < 0.3:
                words.append(rng.choice(head))
            elif r < 0.7:
                words.append(rng.choice(mid))
            elif r < 0.95:
                words.append(rng.choice(tail))
            else:
                words.append("nosuchword")
        if rng.random() < 0.2 and len(words) > 1:
            words[-1] = words[0]  # duplicate query word
        mode = rng.choice(("and", "or"))
        k = rng.choice((1, 3, 10, 50))
        excluded = frozenset()
        exclude_df = None
        if rng.random() < 0.3:
            # kill ~15% of the matchable docs
            cand = sorted(
                {d for w in set(words) for d in postings.get(w, {})}
            )
            excluded = frozenset(
                d for d in cand if rng.random() < 0.15
            )
            if excluded:
                exclude_df = spark.createDataFrame(
                    [(d,) for d in sorted(excluded)], "docid long"
                )
        got = [
            (r["weight"], r["docid"])
            for r in segs.wand_topk(
                words, k, mode, exclude=exclude_df
            ).collect()
        ]
        want = _brute_topk(postings, n_docs, words, k, mode, excluded)
        assert got == want, (
            f"query {i}: words={words} mode={mode} k={k} "
            f"n_excl={len(excluded)}\ngot[:6]: {got[:6]}\n"
            f"want[:6]: {want[:6]}"
        )
        terms = list(dict.fromkeys(words))
        dfs = {w: len(postings.get(w, {})) for w in terms}
        n_neg_idf += any(
            dfw and math.log((n_docs - dfw + 1) / dfw) < 0
            for dfw in dfs.values()
        )
        n_and += mode == "and"
        n_excl += bool(excluded)
        n_dup += len(terms) != len(words)
        n_small_k += k < len(want) + 1 and len(want) == k
    # the generator must exercise what the pruning logic branches on
    assert (
        n_neg_idf >= 6 and n_and >= 10 and n_excl >= 5 and n_dup >= 3
        and n_small_k >= 8
    ), (n_neg_idf, n_and, n_excl, n_dup, n_small_k)
