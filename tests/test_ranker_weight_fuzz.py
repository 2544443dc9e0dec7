"""Weight-differential fuzz: random boolean queries over a random
two-field corpus, engine weights vs a pure-Python oracle porting the
reference scoring model directly.

The fixed-query LCS oracle (test_lcs_oracle.py) pins the scoring loop
on five single-field queries; the match fuzzes pin SETS only.  Nothing
fuzzes WEIGHTS compositionally — across nested AND/OR, negation,
multiple fields, and non-default field weights (the BindWeights
padding rule, src/sphinx.cpp:14574-14595, regressed once already).

Oracle model (all reference-cited):
  idf      = log((N-df+1)/df) / (2*q*log(1+N)), q = #distinct query
             words INCLUDING negated ones (GetQwords walks the whole
             tree), 0 when df == 0           (src/sphinx.cpp:14662)
  term     tfidf = tf/(tf+1.2)*idf, tf summed across fields; hits at
             lcspos = field<<24 | pos (FIELD_END bit dropped, HIT2LCS
             src/sphinx.cpp:238), spanlen = weight = 1
  and/or   tfidf summed over MATCHING children (ExtAnd :12410 /
             ExtOr :12572), hit streams merged by (lcspos, querypos),
             fieldmask OR'd; andnot takes the left side (:12721)
  bm25part = int((tfidf + 0.5) * 1000)        (src/sphinx.cpp:13972)
  proximity_bm25: + 1000 * sum_f lcs_f^2 * w_f over the per-field
             delta-chain LCS (GetMatches loop, src/sphinx.cpp:14084)
  bm25:    + 1000 * sum_f matched_f * w_f     (src/sphinx.cpp:14106)
  proximity: sum_f lcs_f * w_f, no bm25 part  (src/sphinx.cpp:14295)
  wordcount: sum over emitted hits of w_field (src/sphinx.cpp:14161)
  matchany: per-field (bitcount(qpos byte mask) + (lcs-1)*phraseK)*w
             (src/sphinx.cpp:14356-14476)
  none = 1; fieldmask = matched-fields mask    (:14150, :14477)
  order    weight desc, docid asc (MatchRelevanceLt,
             src/sphinxsort.cpp:1159)
"""

from __future__ import annotations

import itertools
import math
import random

import pytest

from sphinx_1_spark import IndexSettings, SphinxIndex

VOCAB = (
    "spark index query table merge sort scan shuffle join filter "
    "token stream batch block delta crawl page host rank score "
    "cache disk "
).split()

N_DOCS = 80
N_FIELDS = 2


def _make_docs(rng):
    # Zipf-ish: early vocab words are common, tail words rare — gives
    # the idf spread and repeated-term tf>1 cases real corpora have
    weights = [1.0 / (i + 1) for i in range(len(VOCAB))]
    rows = []
    for did in range(1, N_DOCS + 1):
        fields = tuple(
            " ".join(
                rng.choices(VOCAB, weights=weights, k=rng.randint(2, 9))
            )
            for _ in range(N_FIELDS)
        )
        rows.append((did, *fields))
    return rows


@pytest.fixture(scope="module")
def weight_corpus(spark):
    rng = random.Random(20260819)
    rows = _make_docs(rng)
    docs = spark.createDataFrame(
        rows, "doc_id long, title string, body string"
    )
    idx = SphinxIndex.build(
        docs,
        IndexSettings(docid_col="doc_id", fields=("title", "body")),
    ).persist()
    # token positions: per doc, per word -> [(field, pos1based), ...]
    positions = {}
    for did, *fields in rows:
        occ: dict[str, list[int]] = {}
        for f, text in enumerate(fields):
            for p, tok in enumerate(text.split(), start=1):
                occ.setdefault(tok, []).append((f << 24) | p)
        positions[did] = occ
    return idx, positions


# ---------------------------------------------------------------- query gen
# tree: ("term", word) | ("and"|"or", [children]) | ("andnot", tree, word)
#     | ("quorum", [words, possibly with dups], thresh)
#     | ("phrase", [words]) | ("proximity", [words], maxdist)
#     | ("before", [atom children])
#     | ("field", "@spec", mask, atom)  — field limit on one atom


def _gen_phrase(rng, pool):
    """Exact-phrase atom; ~40% duplicate a word ('a a b') so the
    delta-chain requires consecutive positions of the SAME word and
    the dup instance's idf-0 contribution is pinned."""
    k = min(rng.randint(2, 3), len(pool))
    ws = [pool.pop() for _ in range(k)]
    if rng.random() < 0.4:
        ws.insert(rng.randint(0, len(ws)), rng.choice(ws))
    return ("phrase", ws)


def _gen_proximity(rng, pool):
    """Proximity atom '"a b"~N'; ~30% duplicate a word so the window
    loop's per-INSTANCE dProx entries (one per querypos, not per
    distinct word) are exercised."""
    k = min(rng.randint(2, 3), len(pool))
    ws = [pool.pop() for _ in range(k)]
    if rng.random() < 0.3:
        ws.insert(rng.randint(0, len(ws)), rng.choice(ws))
    return ("proximity", ws, rng.randint(1, 4))


_FIELD_SPECS = (("@title", 1), ("@body", 2), ("@(title,body)", 3))


def _maybe_field(rng, atom):
    """~30% wrap an atom in a field limit — the spec binds to exactly
    the next atom (grammar TOK_FIELDLIMIT orlist), so no parens
    needed."""
    if rng.random() < 0.3:
        spec, mask = rng.choice(_FIELD_SPECS)
        return ("field", spec, mask, atom)
    return atom


def _gen_before(rng, pool):
    """BEFORE ('a << b << c') over 2-3 atom children (terms, with
    some phrases/proximities so child hits carry spanlen > 1)."""
    kids = []
    for _ in range(rng.randint(2, 3)):
        if not pool:
            break
        r = rng.random()
        if len(pool) >= 2 and r < 0.25:
            kids.append(_maybe_field(rng, _gen_phrase(rng, pool)))
        elif len(pool) >= 2 and r < 0.4:
            kids.append(_maybe_field(rng, _gen_proximity(rng, pool)))
        else:
            kids.append(_maybe_field(rng, ("term", pool.pop())))
    if len(kids) < 2:
        return kids[0]
    return ("before", kids)


def _gen_quorum(rng, pool):
    """Quorum atom; ~60% carry a duplicated word — the reference masks
    dups out of the THRESHOLD only (ExtQuorum ctor,
    src/sphinx.cpp:13380-13392) while every child still emits hits
    under its own querypos and its own per-instance idf (0 beyond the
    first instance).  thresh == len(words) exercises the
    quorum-threshold-too-high degradation to AND of the ORIGINAL
    (dup-included) word list (src/sphinx.cpp:11762-11768)."""
    k = min(rng.randint(2, 3), len(pool))
    ws = [pool.pop() for _ in range(k)]
    if rng.random() < 0.6:
        ws.insert(rng.randint(0, len(ws)), rng.choice(ws))
    thresh = rng.randint(1, len(ws))
    return ("quorum", ws, thresh)


def _gen_tree(rng, pool, depth=0):
    if depth >= 2 or rng.random() < 0.4 or len(pool) < 2:
        r = rng.random()
        if len(pool) >= 2 and r < 0.3:
            return _maybe_field(rng, _gen_quorum(rng, pool))
        if len(pool) >= 2 and r < 0.55:
            return _maybe_field(rng, _gen_phrase(rng, pool))
        if len(pool) >= 2 and r < 0.75:
            return _maybe_field(rng, _gen_proximity(rng, pool))
        if len(pool) >= 2 and r < 0.9:
            return _gen_before(rng, pool)
        return _maybe_field(rng, ("term", pool.pop()))
    n = rng.randint(2, min(3, len(pool)))
    kids = []
    for _ in range(n):
        if not pool:
            break
        kids.append(_gen_tree(rng, pool, depth + 1))
    if len(kids) == 1:
        return kids[0]
    return (rng.choice(("and", "or")), kids)


def _gen_query(rng):
    """-> (tree, has_cross_node_dup)."""
    pool = rng.sample(VOCAB, rng.randint(2, 6))
    tree = _gen_tree(rng, pool)
    if pool and rng.random() < 0.3:
        tree = ("andnot", tree, pool.pop())
    # cross-node duplicate: AND the tree with a word it already uses,
    # so the per-instance idf rule (first instance in whole-tree
    # querypos order carries the idf, later ones 0) is exercised
    # OUTSIDE quorum nodes too — 'a b a' style queries
    crossdup = rng.random() < 0.25
    if crossdup:
        used = _words_in_order(tree, [])
        tree = ("and", [tree, ("term", rng.choice(used))])
    return tree, crossdup


def _to_str(tree):
    op = tree[0]
    if op == "term":
        return tree[1]
    if op == "phrase":
        return '"' + " ".join(tree[1]) + '"'
    if op == "proximity":
        return '"' + " ".join(tree[1]) + '"~' + str(tree[2])
    if op == "quorum":
        return '"' + " ".join(tree[1]) + '"/' + str(tree[2])
    if op == "andnot":
        return f"{_to_str(tree[1])} -{tree[2]}"
    if op == "before":
        # children are atoms, so their strings are unambiguous operands
        return " << ".join(_to_str(c) for c in tree[1])
    if op == "field":
        return f"{tree[1]} {_to_str(tree[3])}"
    # parenthesize composite children so the string parse is exactly
    # this tree regardless of the grammar's AND/OR precedence
    # (term and quorum strings are already atomic)
    parts = [
        p
        if c[0] in ("term", "quorum", "phrase", "proximity")
        else f"({p})"
        for c, p in ((c, _to_str(c)) for c in tree[1])
    ]
    return " ".join(parts) if op == "and" else "(" + " | ".join(parts) + ")"


def _words_in_order(tree, out):
    op = tree[0]
    if op == "term":
        out.append(tree[1])
    elif op in ("quorum", "phrase", "proximity"):
        out.extend(tree[1])
    elif op == "field":
        _words_in_order(tree[3], out)
    elif op == "andnot":
        _words_in_order(tree[1], out)
        out.append(tree[2])
    else:
        for c in tree[1]:
            _words_in_order(c, out)
    return out


# ---------------------------------------------------------------- oracle


def _qpos_walk(tree, counter, first_qpos):
    """Dry-run of _eval's querypos consumption: assigns each word
    instance its atom position (quorum counts occupy one of their own)
    and records the FIRST position of each distinct word."""
    op = tree[0]
    if op == "term":
        first_qpos.setdefault(tree[1], next(counter))
    elif op == "phrase":
        for w in tree[1]:
            first_qpos.setdefault(w, next(counter))
    elif op in ("quorum", "proximity"):
        for w in tree[1]:
            first_qpos.setdefault(w, next(counter))
        next(counter)  # the count token's atom position
    elif op == "field":
        _qpos_walk(tree[3], counter, first_qpos)
    elif op == "andnot":
        _qpos_walk(tree[1], counter, first_qpos)
        first_qpos.setdefault(tree[2], next(counter))
    else:
        for c in tree[1]:
            _qpos_walk(c, counter, first_qpos)


def _eval(tree, occ, qpos_iter, idf, first_qpos, fmask=(1 << N_FIELDS) - 1):
    """-> (matched, tfidf, hits[(lcspos, qpos)], fieldmask).

    idf is PER-INSTANCE: only the first occurrence of a word in
    whole-tree querypos order carries the word's idf; later instances
    carry 0 (GetQwords hash-exists early-out, the engine's
    dup-querypos rule) — first_qpos maps word -> its first querypos.

    fmask is the atom's field limit: hit emission and doc matching
    filter to allowed fields (ExtTerm_c::GetHitsChunk skips
    disallowed-field hits, GetDocsChunk gates on the doclist mask &
    m_uFields, src/sphinx.cpp:11846/11958) but tf in tfidf stays
    m_uMatchHits — the WHOLE-DOC hit count (:11867)."""
    op = tree[0]
    if op == "field":
        return _eval(tree[3], occ, qpos_iter, idf, first_qpos, tree[2])

    def _qual(w):
        return [p for p in occ.get(w, []) if fmask >> (p >> 24) & 1]

    if op == "term":
        w = tree[1]
        qp = next(qpos_iter)
        pos = _qual(w)
        if not pos:
            return False, 0.0, [], 0
        tf = len(occ[w])  # whole-doc m_uMatchHits, not the qualified subset
        tfidf = tf / (tf + 1.2) * (idf[w] if qp == first_qpos[w] else 0.0)
        mask = 0
        for lp in pos:
            mask |= 1 << (lp >> 24)
        return True, tfidf, [(lp, qp, 1, 1) for lp in pos], mask
    if op == "phrase":
        # all words present + a delta chain at the querypos offsets;
        # tfidf is the whole-doc per-instance term sum (ExtPhrase
        # accumulates children like AND); ONE hit per match start:
        # (start, first qpos, spanlen = qpos span, weight = nwords),
        # fieldmask = the FIRST match's field bit only
        # (src/sphinx.cpp:12903-12909, replay-pinned)
        ws = tree[1]
        qps = [next(qpos_iter) for _ in ws]
        if any(not _qual(w) for w in ws):
            return False, 0.0, [], 0
        tfidf = sum(
            len(occ[w])
            / (len(occ[w]) + 1.2)
            * (idf[w] if qp == first_qpos[w] else 0.0)
            for w, qp in zip(ws, qps)
        )
        posmap = {w: set(_qual(w)) for w in set(ws)}
        q0 = qps[0]
        starts = sorted(
            p
            for p in posmap[ws[0]]
            if all(
                (p + qp - q0) in posmap[w]
                for w, qp in zip(ws[1:], qps[1:])
            )
        )
        if not starts:
            return False, 0.0, [], 0
        span = qps[-1] - q0 + 1
        hits = [(p, q0, span, len(ws)) for p in starts]
        return True, tfidf, hits, 1 << (starts[0] >> 24)
    if op == "proximity":
        # port of the ExtProximity_c::GetDocsChunk window loop
        # (src/sphinx.cpp:13178-13341): per incoming (pos, entry) hit
        # in (lcspos, querypos) order, the per-INSTANCE position table
        # dProx evicts entries at pos <= cur - qspan - maxdist (strict
        # window); whenever all entries are filled one node hit is
        # emitted at the window min with spanlen = max-min+1 and
        # weight = the trailing equal-run of the sorted (pos - entry)
        # deltas, then the min entry is evicted so overlapping windows
        # emit again.  tfidf is the underlying AND node's (m_fTFIDF is
        # copied from pDoc, :13290); the doc's fieldmask is the FIRST
        # completing hit's field alone (:13287).
        ws, maxdist = tree[1], tree[2]
        qps = [next(qpos_iter) for _ in ws]
        next(qpos_iter)  # the ~N count token's atom position
        if any(not _qual(w) for w in ws):
            return False, 0.0, [], 0
        tfidf = sum(
            len(occ[w])
            / (len(occ[w]) + 1.2)
            * (idf[w] if qp == first_qpos[w] else 0.0)
            for w, qp in zip(ws, qps)
        )
        n = len(ws)
        qspan = qps[-1] - qps[0]
        merged = sorted(
            (p, e) for e, w in enumerate(ws) for p in _qual(w)
        )
        INF = 1 << 62
        dprox = [INF] * n
        minentry, words, exp_pos = -1, 0, None
        hits = []
        for pos, entry in merged:
            if not (exp_pos is not None and pos < exp_pos) or (
                entry == minentry
            ):
                if exp_pos is None:
                    dprox = [INF] * n
                    dprox[entry] = pos
                    minentry, words = entry, 1
                else:
                    if dprox[entry] == INF:
                        words += 1
                    dprox[entry] = pos
                    minentry = entry
                    min_pos = pos - qspan - maxdist
                    umin = pos
                    for i, v in enumerate(dprox):
                        if v == INF:
                            continue
                        if v <= min_pos:
                            dprox[i] = INF
                            words -= 1
                            continue
                        if v < umin:
                            minentry, umin = i, v
                exp_pos = dprox[minentry] + qspan + maxdist
            else:
                if dprox[entry] == INF:
                    words += 1
                dprox[entry] = pos
            if words == n:
                deltas = sorted(dprox[i] - i for i in range(n))
                weight, last = 0, None
                for d in deltas:
                    weight = weight + 1 if d == last else 1
                    last = d
                start = dprox[minentry]
                hits.append(
                    (start, qps[0], max(dprox) - start + 1, weight)
                )
                dprox[minentry] = INF
                minentry = -1
                words -= 1
                exp_pos = 0
        if not hits:
            return False, 0.0, [], 0
        return True, tfidf, hits, 1 << (hits[0][0] >> 24)
    if op == "quorum":
        # matched = #distinct words present >= thresh (dup instances
        # masked out of the COUNT only, ExtQuorum ctor
        # src/sphinx.cpp:13380-13392); tfidf sums over ALL matching
        # children (:13474 — dups contribute 0 via per-instance idf);
        # every matching child emits its positions under its own
        # querypos (GetHitsChunk :13524-13560, ties in child order ==
        # ascending querypos == the engine's array_sort order).
        # thresh >= len(words) is the creation-time degradation to AND
        # of the ORIGINAL word list (src/sphinx.cpp:11762-11768).
        ws, thresh = tree[1], tree[2]
        qps = [next(qpos_iter) for _ in ws]
        # the count number occupies an atom position of its own when
        # it tokenizes (digit pre-scan m_iAtomPos++,
        # src/sphinxquery.cpp:340-382) — single digits always do here
        next(qpos_iter)
        tfidf, hits, mask, present = 0.0, [], 0, set()
        for w, qp in zip(ws, qps):
            pos = _qual(w)
            if not pos:
                continue
            present.add(w)
            tf = len(occ[w])  # whole-doc, like the term branch
            tfidf += tf / (tf + 1.2) * (
                idf[w] if qp == first_qpos[w] else 0.0
            )
            for lp in pos:
                hits.append((lp, qp, 1, 1))
                mask |= 1 << (lp >> 24)
        ok = (
            len(present) >= thresh
            if thresh < len(ws)
            else len(present) == len(set(ws))
        )
        if not ok:
            return False, 0.0, [], 0
        return True, tfidf, sorted(hits), mask
    if op == "andnot":
        m, t, h, fm = _eval(tree[1], occ, qpos_iter, idf, first_qpos)
        neg = tree[2]
        next(qpos_iter)  # negated word consumes its querypos
        if occ.get(neg):
            return False, 0.0, [], 0
        return m, t, h, fm
    if op == "before":
        # port of the ExtOrder_c longest/recent dual tracker
        # (GetMatchingHits, src/sphinx.cpp:13650-13745): children's
        # hits merge in (hitpos, child) order; a hit extends the
        # longest tracker only when it is the NEXT child in order at
        # pos >= prev pos + prev spanlen; a child-0 hit that doesn't
        # fit restarts the recent tracker, which swaps in when it
        # catches up.  Both trackers reset on a field change, and the
        # tracked field only re-seeds from a child-0 hit.  A full
        # subsequence flushes the CHILD hits verbatim; the matched doc
        # is a copy of child 0's ExtDoc (CopyExtDoc of *m_pDocs[0],
        # :13826), so tfidf/fieldmask are the first child's alone.
        results = [_eval(c, occ, qpos_iter, idf, first_qpos) for c in tree[1]]
        if not all(r[0] for r in results):
            return False, 0.0, [], 0
        merged = sorted(
            (h[0], ci, h) for ci, r in enumerate(results) for h in r[2]
        )
        nch = len(results)
        acc_l, acc_r = [], []
        pos_l = pos_r = 0
        field = -1
        flushed = []
        for full, ci, h in merged:
            fld, p = full >> 24, full & 0x7FFFFF
            span = h[2]
            if fld != field:
                acc_l, acc_r = [], []
                if ci == 0:
                    acc_l = [h]
                    pos_l = p + span
                    field = fld
            elif ci == len(acc_l) and p >= pos_l:
                acc_l.append(h)
                pos_l = p + span
                if len(acc_l) == nch:
                    flushed.extend(acc_l)
                    acc_l, acc_r = [], []
                    pos_r = pos_l
            elif ci == 0:
                acc_r = [h]
                pos_r = p + span
            elif ci == len(acc_r) and p >= pos_r:
                acc_r.append(h)
                pos_r = p + span
                if len(acc_r) == len(acc_l):
                    acc_l, acc_r = acc_r, []
                    pos_l = pos_r
        if not flushed:
            return False, 0.0, [], 0
        return True, results[0][1], flushed, results[0][3]
    results = [_eval(c, occ, qpos_iter, idf, first_qpos) for c in tree[1]]
    if op == "and":
        ok = all(r[0] for r in results)
    else:
        ok = any(r[0] for r in results)
    if not ok:
        return False, 0.0, [], 0
    tfidf = sum(r[1] for r in results)
    hits = sorted(h for r in results for h in r[2])
    mask = 0
    for r in results:
        mask |= r[3]
    return True, tfidf, hits, mask


def _lcs_fields(hits, nf):
    """GetMatches LCS loop (src/sphinx.cpp:14084-14097): delta-chain
    with per-hit weight increments and spanlen-adjusted expected
    delta — a phrase hit bumps curlcs by nwords and expects the next
    chained hit spanlen further along.  Returns per-field LCS (the
    BYTE accumulator wraps mod 256)."""
    lcs = [0] * nf
    curlcs = 0
    expdelta = None
    for lcspos, qpos, spanlen, weight in hits:
        delta = lcspos - qpos
        curlcs = (curlcs + weight) if delta == expdelta else weight
        curlcs &= 0xFF  # BYTE(m_uWeight) accumulator
        f = lcspos >> 24
        if curlcs > lcs[f]:
            lcs[f] = curlcs
        expdelta = delta + spanlen - 1
    return lcs


def _matchany_weight(hits, wts, n_uwords):
    """ExtRanker_MatchAny_c::GetMatches (src/sphinx.cpp:14356-14476):
    the LCS delta-chain plus a per-field BYTE match mask of
    1<<(querypos-1) bits (querypos > 8 wraps out of the byte and
    contributes nothing); rank = sum over fields WITH a nonzero mask
    of (bitcount(mask_f) + (lcs_f - 1) * phraseK) * w_f, where
    phraseK = sum(w) * #UNIQUE query words (m_uQWords is the qwords
    hash length, :13989)."""
    nf = len(wts)
    lcs = [0] * nf
    maskb = [0] * nf
    curlcs = 0
    expdelta = None
    phrase_k = sum(wts) * n_uwords
    for lcspos, qpos, spanlen, weight in hits:
        delta = lcspos - qpos
        curlcs = (curlcs + weight) if delta == expdelta else weight
        curlcs &= 0xFF  # BYTE uCurLCS (:14366)
        f = lcspos >> 24
        if curlcs > lcs[f]:
            lcs[f] = curlcs
        maskb[f] = (maskb[f] | (1 << (qpos - 1))) & 0xFF
        expdelta = delta + spanlen - 1
    return sum(
        (bin(maskb[f]).count("1") + (lcs[f] - 1) * phrase_k) * wts[f]
        for f in range(nf)
        if maskb[f]
    )


def _oracle(tree, positions, ranker, wts):
    words = _words_in_order(tree, [])
    distinct = list(dict.fromkeys(words))
    q = len(distinct)
    n = N_DOCS
    df = {
        w: sum(1 for occ in positions.values() if occ.get(w))
        for w in distinct
    }
    idf = {
        w: (
            0.0
            if df[w] == 0
            else math.log((n - df[w] + 1) / df[w]) / (2 * q * math.log(1 + n))
        )
        for w in distinct
    }
    first_qpos = {}
    _qpos_walk(tree, itertools.count(1), first_qpos)
    out = []
    for did, occ in positions.items():
        matched, tfidf, hits, mask = _eval(
            tree, occ, itertools.count(1), idf, first_qpos
        )
        if not matched:
            continue
        bm25part = int((tfidf + 0.5) * 1000)
        if ranker == "proximity_bm25":
            lcs = _lcs_fields(sorted(hits), len(wts))
            weight = bm25part + 1000 * sum(
                l * l * w for l, w in zip(lcs, wts)
            )
        elif ranker == "bm25":
            weight = bm25part + 1000 * sum(
                w for f, w in enumerate(wts) if mask >> f & 1
            )
        elif ranker == "proximity":
            # linear LCS sum, UNSCALED, no bm25 part
            # (ExtRanker_Proximity_c, src/sphinx.cpp:14295-14305)
            lcs = _lcs_fields(sorted(hits), len(wts))
            weight = sum(l * w for l, w in zip(lcs, wts))
        elif ranker == "wordcount":
            # w[field] summed per emitted hit
            # (ExtRanker_Wordcount_c, src/sphinx.cpp:14161-14245)
            weight = sum(wts[h[0] >> 24] for h in hits)
        elif ranker == "matchany":
            weight = _matchany_weight(sorted(hits), wts, q)
        elif ranker == "none":
            weight = 1  # src/sphinx.cpp:14150
        else:  # fieldmask
            weight = mask  # src/sphinx.cpp:14477
        out.append((weight, did))
    out.sort(key=lambda t: (-t[0], t[1]))
    return out


# ---------------------------------------------------------------- the fuzz


def test_random_query_weights_match_scoring_oracle(weight_corpus):
    idx, positions = weight_corpus
    rng = random.Random(2468)
    n_nontrivial = 0
    n_quorum = n_dup_quorum = n_degraded = n_crossdup = 0
    n_phrase = n_dup_phrase = n_prox = n_dup_prox = n_prox_matched = 0
    n_before = n_before_matched = n_field = n_field_matched = 0
    for i in range(80):
        tree, crossdup = _gen_query(rng)
        n_crossdup += crossdup
        qstr = _to_str(tree)
        ranker = rng.choice((
            "proximity_bm25", "proximity_bm25", "proximity_bm25",
            "bm25", "bm25", "matchany", "matchany",
            "wordcount", "proximity", "fieldmask", "none",
        ))
        # None exercises the BindWeights default; short lists exercise
        # the pad-to-1 rule; full lists the plain path
        wts_arg = rng.choice((None, [rng.randint(1, 5)],
                              [rng.randint(1, 5), rng.randint(1, 5)]))
        wts = list(wts_arg or [])[:N_FIELDS]
        wts += [1] * (N_FIELDS - len(wts))
        wts = [max(1, w) for w in wts]

        want = _oracle(tree, positions, ranker, wts)
        got = [
            (r["weight"], r["docid"])
            for r in idx.search(
                qstr, ranker=ranker, limit=1000, field_weights=wts_arg
            ).collect()
        ]
        assert got == want, (
            f"query {i}: {qstr!r} ranker={ranker} wts={wts_arg}\n"
            f"engine[:6]: {got[:6]}\noracle[:6]: {want[:6]}"
        )
        if len(want) > 2:
            n_nontrivial += 1
        has_prox = has_before = has_field = False
        stack = [tree]
        while stack:
            node = stack.pop()
            if node[0] == "quorum":
                n_quorum += 1
                n_dup_quorum += len(node[1]) != len(set(node[1]))
                n_degraded += node[2] >= len(node[1])
            elif node[0] == "phrase":
                n_phrase += 1
                n_dup_phrase += len(node[1]) != len(set(node[1]))
            elif node[0] == "proximity":
                n_prox += 1
                n_dup_prox += len(node[1]) != len(set(node[1]))
                has_prox = True
            elif node[0] == "before":
                n_before += 1
                has_before = True
                stack.extend(node[1])
            elif node[0] == "field":
                n_field += 1
                has_field = True
                stack.append(node[3])
            elif node[0] == "andnot":
                stack.append(node[1])
            elif node[0] in ("and", "or"):
                stack.extend(node[1])
        n_prox_matched += has_prox and len(want) > 0
        n_before_matched += has_before and len(want) > 0
        n_field_matched += has_field and len(want) > 0
    # the generator must actually produce discriminating result lists
    # and actually exercise the quorum shapes it claims to
    assert n_nontrivial >= 30
    assert (
        n_quorum >= 8
        and n_dup_quorum >= 4
        and n_degraded >= 3
        and n_crossdup >= 10
        and n_phrase >= 8
        and n_dup_phrase >= 3
        and n_prox >= 8
        and n_dup_prox >= 2
        and n_prox_matched >= 5
        and n_before >= 6
        and n_before_matched >= 3
        and n_field >= 8
        and n_field_matched >= 4
    ), (n_quorum, n_dup_quorum, n_degraded, n_crossdup,
        n_phrase, n_dup_phrase, n_prox, n_dup_prox, n_prox_matched,
        n_before, n_before_matched, n_field, n_field_matched)
