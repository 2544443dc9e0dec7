"""Differential fuzz of star expansion and exact-form matching.

Star dictionaries (CSphDictStarV8, src/sphinx.cpp:10693-10757) and
the exact-form dict (CSphDictExact, src/sphinx.cpp:10780-10800) are
pinned by fixed replay tests; nothing exercises *random* star cores /
surface forms composed with the boolean operators.

Star semantics being pinned (measured against the engine and mirrored
from the reference's dictionaries — keys per QueryParser._star lexing):

* prefix mode (min_prefix_len=P): `core*` matches tokens with
  token.startswith(core), EXCEPT cores shorter than P only match the
  full word itself (prefixes of length < P are not indexed, but every
  full word also lands in the bare prefix namespace); any head star
  without a tail star degrades to exact full-word match (the prefix
  dict only supports trailing stars).
* infix mode (min_infix_len=I): `*core*` -> contains, `core*` ->
  startswith, `*core` -> endswith; anchored cores shorter than I match
  NOTHING (those namespaces hold only substrings of length >= I), but
  a short BARE core (`*c*`) still matches the short full word itself —
  words under the min length emit just markers + the bare word
  (src/sphinx.cpp:18595-18607); plain words exact.
* exact-form (index_exact_words + stem_en): `=word` matches the raw
  (pre-morphology) token, plain words match by stem; both compose
  inside phrases positionally.
"""

from __future__ import annotations

import random

import pytest

from sphinx_1_spark import IndexSettings, SphinxIndex
from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings

STAR_WORDS = (
    "alpha alpine alpaca albatross beta betray betrothal gamma gambit "
    "game gateway delta dealt dealer echo echoes hotel hostel hosting "
    "india indigo indeed kilo kilogram lima limit limber mike mikado "
    "a al go"
).split()


def _star_docs(rng):
    return [
        (
            did,
            " ".join(rng.choice(STAR_WORDS) for _ in range(rng.randint(3, 10))),
        )
        for did in range(1, 81)
    ]


@pytest.fixture(scope="module", params=["prefix", "infix"])
def star_corpus(request, spark):
    mode = request.param
    tk = (
        TokenizerSettings(min_prefix_len=2)
        if mode == "prefix"
        else TokenizerSettings(min_infix_len=2)
    )
    rng = random.Random(20260819 if mode == "prefix" else 20260820)
    rows = _star_docs(rng)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = SphinxIndex.build(
        docs, IndexSettings(docid_col="doc_id", fields=("text",), tokenizer=tk)
    ).persist()
    t = Tokenizer(TokenizerSettings())
    toksets = {did: {w for w, _ in t.tokenize_with_positions(text)} for did, text in rows}
    return mode, idx, toksets


def _key_pred(key: str, mode: str, minlen: int):
    """Token predicate for a term node's dictionary key (the parser's
    star-lexing forms: '^*w$' exact, bare = prefix/substring ns,
    '^*c' = starts-with ns, 'c$' = ends-with ns)."""
    astart, aend = key.startswith("^*"), key.endswith("$")
    core = key[2:] if astart else key
    core = core[:-1] if aend else core
    if astart and aend:
        return lambda tok: tok == core
    if mode == "prefix":
        # bare key only (tail star); words SHORTER than minlen emit
        # just the bare word (src/sphinx.cpp:18595-18607), so a short
        # core still matches exactly that short full word
        return lambda tok: tok.startswith(core) and (
            len(core) >= minlen or tok == core
        )
    # infix: anchored namespaces hold only substrings of len >= minlen
    if astart:
        if len(core) < minlen:
            return lambda tok: False
        return lambda tok: tok.startswith(core)
    if aend:
        if len(core) < minlen:
            return lambda tok: False
        return lambda tok: tok.endswith(core)
    if len(core) >= minlen:
        return lambda tok: core in tok
    # bare namespace keeps short FULL words (same 18595-18607 rule)
    return lambda tok: tok == core


def _gen_star_atom(rng):
    w = rng.choice(STAR_WORDS)
    r = rng.random()
    if r < 0.1:
        return w  # plain word: exact full-word in star mode
    k = rng.randint(1, min(4, len(w)))
    if r < 0.45:
        return w[:k] + "*"
    if r < 0.7:
        return "*" + w[-k:]
    i = rng.randint(0, len(w) - k)
    return "*" + w[i : i + k] + "*"


def _gen_star_query(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.5:
        return _gen_star_atom(rng)
    if r < 0.72:
        return f"{_gen_star_query(rng, depth + 1)} {_gen_star_query(rng, depth + 1)}"
    if r < 0.9:
        return f"{_gen_star_query(rng, depth + 1)} | {_gen_star_query(rng, depth + 1)}"
    return f"{_gen_star_query(rng, depth + 1)} -{_gen_star_atom(rng)}"


def _eval_star(node, toks, mode, minlen):
    op = node.op
    if op == "term":
        pred = _key_pred(node.words[0].word, mode, minlen)
        return any(pred(t) for t in toks)
    if op == "and":
        return all(_eval_star(c, toks, mode, minlen) for c in node.children)
    if op == "or":
        return any(_eval_star(c, toks, mode, minlen) for c in node.children)
    if op == "andnot":
        return _eval_star(node.children[0], toks, mode, minlen) and not _eval_star(
            node.children[1], toks, mode, minlen
        )
    if op == "empty":
        return False
    raise AssertionError(f"star fuzz produced unexpected op {op!r}")


def test_random_star_queries_match_token_oracle(star_corpus):
    mode, idx, toksets = star_corpus
    rng = random.Random(555)
    saw_short = saw_tail = saw_head = saw_both = False
    for i in range(100):
        q = _gen_star_query(rng)
        tree = idx.parse(q, "extended2")

        def walk(n):
            nonlocal saw_short, saw_tail, saw_head, saw_both
            for w in n.words:
                astart, aend = w.word.startswith("^*"), w.word.endswith("$")
                core = w.word[2 if astart else 0 : -1 if aend else None]
                if len(core) < 2:
                    saw_short = True
                if not astart and not aend:
                    saw_tail = saw_both = True  # bare namespace
                elif astart and not aend:
                    saw_tail = True
                elif aend and not astart:
                    saw_head = True
            for c in n.children:
                walk(c)

        walk(tree)
        expected = {
            d for d, toks in toksets.items() if _eval_star(tree, toks, mode, 2)
        }
        plan, _meta = idx.match(q)
        got = {r.docid for r in plan.select("docid").collect()}
        assert got == expected, (
            f"[{mode}] query {i}: {q!r}\n"
            f"engine-only: {sorted(got - expected)[:5]}\n"
            f"naive-only: {sorted(expected - got)[:5]}"
        )
    # prefix mode has no ends-with namespace: '*word' degrades to the
    # exact full-word key, so a head-anchored key only exists in infix
    assert saw_short and saw_tail and (saw_head or mode == "prefix")


# ------------------------------------------------------------------
# exact-form (=word) under stem_en: random boolean/phrase compositions
# where each keyword is independently exact or stemmed.  Oracle works
# off the tokenizer's own (raw, norm, pos) stream — raw equality for
# '='-keys, normalized equality otherwise, positional chaining for
# phrases (CSphDictExact: nonstemmed wordids share positions with the
# stemmed hits, src/sphinx.cpp:18700-18727).

SURFACES = (
    "run runs running runner walk walks walking walked jump jumps "
    "jumping jumped quick quickly quicker happy happier happiness "
    "play plays playing played code codes coding coded"
).split()


@pytest.fixture(scope="module")
def exact_fuzz_corpus(spark):
    rng = random.Random(20260821)
    rows = [
        (
            did,
            " ".join(rng.choice(SURFACES) for _ in range(rng.randint(3, 10))),
        )
        for did in range(1, 81)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tk = TokenizerSettings(morphology=("stem_en",), index_exact_words=True)
    idx = SphinxIndex.build(
        docs, IndexSettings(docid_col="doc_id", fields=("text",), tokenizer=tk)
    ).persist()
    t = Tokenizer(tk)
    streams = {did: t._full_stream(text) for did, text in rows}
    return idx, streams


def _gen_exact_query(rng, depth=0):
    r = rng.random()
    if depth >= 2 or r < 0.5:
        a = rng.random()
        if a < 0.45:
            eq = "=" if rng.random() < 0.5 else ""
            return eq + rng.choice(SURFACES)
        if a < 0.85:
            ws = [
                ("=" if rng.random() < 0.4 else "") + rng.choice(SURFACES)
                for _ in range(rng.randint(2, 3))
            ]
            return '"' + " ".join(ws) + '"'
        return rng.choice(SURFACES)
    if r < 0.72:
        return f"{_gen_exact_query(rng, depth + 1)} {_gen_exact_query(rng, depth + 1)}"
    if r < 0.9:
        return f"{_gen_exact_query(rng, depth + 1)} | {_gen_exact_query(rng, depth + 1)}"
    return f"{_gen_exact_query(rng, depth + 1)} -{rng.choice(SURFACES)}"


def _qw_matches(qw, raw, norm):
    if qw.word.startswith("="):
        return raw == qw.word[1:]
    return norm == qw.word


def _eval_exact(node, stream):
    op = node.op
    if op == "term":
        qw = node.words[0]
        return any(_qw_matches(qw, raw, norm) for raw, norm, _p in stream)
    if op == "phrase":
        bypos = {p: (raw, norm) for raw, norm, p in stream}
        qws = node.words
        base = qws[0].querypos
        return any(
            _qw_matches(qws[0], raw0, norm0)
            and all(
                (lambda rn: rn is not None and _qw_matches(qw, rn[0], rn[1]))(
                    bypos.get(p0 + qw.querypos - base)
                )
                for qw in qws[1:]
            )
            for p0, (raw0, norm0) in bypos.items()
        )
    if op == "and":
        return all(_eval_exact(c, stream) for c in node.children)
    if op == "or":
        return any(_eval_exact(c, stream) for c in node.children)
    if op == "andnot":
        return _eval_exact(node.children[0], stream) and not _eval_exact(
            node.children[1], stream
        )
    if op == "empty":
        return False
    raise AssertionError(f"exact fuzz produced unexpected op {op!r}")


def test_random_exact_form_queries_match_stream_oracle(exact_fuzz_corpus):
    idx, streams = exact_fuzz_corpus
    rng = random.Random(808)
    saw_exact_term = saw_exact_in_phrase = False
    for i in range(100):
        q = _gen_exact_query(rng)
        tree = idx.parse(q, "extended2")

        def walk(n):
            nonlocal saw_exact_term, saw_exact_in_phrase
            for w in n.words:
                if w.word.startswith("="):
                    if n.op == "phrase":
                        saw_exact_in_phrase = True
                    else:
                        saw_exact_term = True
            for c in n.children:
                walk(c)

        walk(tree)
        expected = {d for d, s in streams.items() if _eval_exact(tree, s)}
        plan, _meta = idx.match(q)
        got = {r.docid for r in plan.select("docid").collect()}
        assert got == expected, (
            f"query {i}: {q!r}\n"
            f"engine-only: {sorted(got - expected)[:5]}\n"
            f"naive-only: {sorted(expected - got)[:5]}"
        )
    assert saw_exact_term and saw_exact_in_phrase
