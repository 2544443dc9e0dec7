"""PROXIMITY_BM25 (default ranker) rank-identity vs a pure-Python
oracle that ports the reference scoring loop directly:

  ExtRanker_ProximityBM25_c::GetMatches (src/sphinx.cpp:14046-14095):
    delta = lcspos - querypos
    curlcs = (delta == expdelta) ? curlcs + weight : weight
    lcs[field] = max(lcs[field], curlcs); expdelta = delta + spanlen - 1
    weight = int((sum_tfidf + 0.5)*1000) + 1000 * sum_f lcs_f^2 * w_f
  idf: src/sphinx.cpp:14662; tfidf: :11867; tie-break docid asc
  (queue comparator src/sphinxsort.cpp:1159).
"""

import math
import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


def tokenize(text):
    return [t for t in re.split(r"[^0-9a-z_]+", text.lower()) if t]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    return {r["doc_id"]: tokenize(r["text"]) for r in rows}


def oracle_proximity_bm25(corpus, words, mode="and"):
    """Full ranked list [(weight, docid)] for an AND/OR of words."""
    n = len(corpus)
    distinct = list(dict.fromkeys(words))
    q = len(distinct)
    df = {
        w: sum(1 for toks in corpus.values() if w in toks) for w in distinct
    }
    idf = {
        w: (
            0.0
            if df[w] == 0
            else math.log((n - df[w] + 1) / df[w]) / (2 * q * math.log(1 + n))
        )
        for w in distinct
    }
    out = []
    for docid, toks in corpus.items():
        pos = {w: [i + 1 for i, t in enumerate(toks) if t == w] for w in distinct}
        present = [w for w in distinct if pos[w]]
        if mode == "and" and len(present) != q:
            continue
        if not present:
            continue
        tfidf = sum(
            len(pos[w]) / (len(pos[w]) + 1.2) * idf[w] for w in present
        )
        bm25part = int((tfidf + 0.5) * 1000)
        # merged hit stream: (lcspos, querypos), field 0 only
        hits = sorted(
            (p, qp)
            for qp, w in enumerate(distinct, start=1)
            for p in pos[w]
        )
        lcs = 0
        curlcs = 0
        expdelta = None
        for lcspos, querypos in hits:
            delta = lcspos - querypos
            if delta == expdelta:
                curlcs += 1
            else:
                curlcs = 1
            lcs = max(lcs, curlcs)
            expdelta = delta  # + spanlen(1) - 1
        weight = bm25part + 1000 * lcs * lcs  # field weight 1, 1 field
        out.append((weight, docid))
    out.sort(key=lambda t: (-t[0], t[1]))
    return out


@pytest.mark.parametrize(
    "match,words,mode",
    [
        ("table scan", ["table", "scan"], "and"),
        ("fast key", ["fast", "key"], "and"),
        ("table | scan", ["table", "scan"], "or"),
        ("merge join order", ["merge", "join", "order"], "and"),
        ("window", ["window"], "and"),
    ],
)
def test_proximity_bm25_rank_identity(docs_index, corpus, match, words, mode):
    got = [
        (r["weight"], r["docid"])
        for r in docs_index.search(
            match, ranker="proximity_bm25", limit=1000
        ).collect()
    ]
    want = oracle_proximity_bm25(corpus, words, mode)[:1000]
    assert got == want


def oracle_matchany(corpus, words):
    """MATCHANY rank (ExtRanker_MatchAny_c, src/sphinx.cpp:14356):
    legacy ANY mode = quorum/1 over the words; 1 field, weight 1."""
    distinct = list(dict.fromkeys(words))
    nq = len(distinct)
    phrase_k = 1 * nq  # sum_f w_f * n_qwords, single field w=1
    out = []
    for docid, toks in corpus.items():
        pos = {w: [i + 1 for i, t in enumerate(toks) if t == w] for w in distinct}
        if not any(pos.values()):
            continue
        hits = sorted(
            (p, qp) for qp, w in enumerate(distinct, start=1) for p in pos[w]
        )
        lcs = 0
        mask = 0
        curlcs = 0
        expdelta = None
        for lcspos, qpos in hits:
            delta = lcspos - qpos
            curlcs = curlcs + 1 if delta == expdelta else 1
            lcs = max(lcs, curlcs)
            mask |= (1 << (qpos - 1)) & 0xFF
            expdelta = delta
        rank = (bin(mask).count("1") + (lcs - 1) * phrase_k) * 1 if mask else 0
        out.append((rank, docid))
    out.sort(key=lambda t: (-t[0], t[1]))
    return out


def test_matchany_rank_identity(docs_index, corpus):
    got = [
        (r["weight"], r["docid"])
        for r in docs_index.search("table scan", mode="any", limit=1000).collect()
    ]
    want = oracle_matchany(corpus, ["table", "scan"])[:1000]
    assert got == want
