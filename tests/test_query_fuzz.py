"""Differential fuzz of MATCH-operator COMPOSITION.

The reference replay pins thousands of real query patterns, but none
of it exercises *random* nesting of the boolean/positional operators.
Here: 120 randomly generated queries over term / exact-phrase / quorum
atoms composed with implicit AND, |, and -negation (2 levels deep) run
through the full engine (parse -> compile -> execute) and through a
20-line naive set-semantics evaluator over the same tokenized corpus —
the match SETS must agree exactly.  Weights are out of scope here (the
replay harness pins them against the compiled reference's model.bin);
proximity/BEFORE/quorum-dup subtleties are replay-pinned too, so the
grammar sticks to operators whose document-set semantics are
unambiguous (src/sphinxquery.cpp operator definitions).
"""

from __future__ import annotations

import itertools
import random

import pytest

from sphinx_1_spark import IndexSettings, SphinxIndex
from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings

VOCAB = (
    "alpha beta gamma delta echo foxtrot golf hotel india juliet kilo lima"
).split()


@pytest.fixture(scope="module")
def fuzz_corpus(spark):
    rng = random.Random(20240817)
    rows = [
        (did, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 12))))
        for did in range(1, 81)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = SphinxIndex.build(
        docs, IndexSettings(docid_col="doc_id", fields=("text",))
    ).persist()
    tok = Tokenizer(TokenizerSettings())
    toks = {did: tok.tokenize_with_positions(text) for did, text in rows}
    return idx, toks


def _gen_query(rng: random.Random, depth: int = 0) -> str:
    r = rng.random()
    if depth >= 2 or r < 0.45:
        a = rng.random()
        if a < 0.5:
            return rng.choice(VOCAB)
        if a < 0.8:
            k = rng.randint(2, 3)
            return '"' + " ".join(rng.choice(VOCAB) for _ in range(k)) + '"'
        # quorum over distinct words (duplicate-word quorum counting
        # is a replay-pinned reference quirk, not re-derived here)
        return '"' + " ".join(rng.sample(VOCAB, 3)) + '"/2'
    if r < 0.65:
        return f"{_gen_query(rng, depth + 1)} {_gen_query(rng, depth + 1)}"
    if r < 0.85:
        return f"{_gen_query(rng, depth + 1)} | {_gen_query(rng, depth + 1)}"
    # negation stays beside a positive sibling: only-negative queries
    # are a parse error by design (FixupNots)
    return f"{_gen_query(rng, depth + 1)} -{rng.choice(VOCAB)}"


def _eval(node, toks) -> bool:
    op = node.op
    if op == "term":
        w = node.words[0].word
        return any(t == w for t, _ in toks)
    if op == "phrase":
        posmap: dict[str, set[int]] = {}
        for t, p in toks:
            posmap.setdefault(t, set()).add(p)
        qws = node.words
        base = qws[0].querypos
        return any(
            all(
                (p + qw.querypos - base) in posmap.get(qw.word, ())
                for qw in qws[1:]
            )
            for p in posmap.get(qws[0].word, ())
        )
    if op == "quorum":
        present = {t for t, _ in toks}
        return (
            sum(1 for qw in node.words if qw.word in present)
            >= node.max_distance
        )
    if op == "proximity":
        # brute-force existence: one position per query word with
        # window span <= qspan + maxdist (the ExtProximity eviction
        # rule `v <= pos - qspan - maxdist` keeps exactly the hits at
        # pos - v <= qspan + maxdist - 1, i.e. max-min <= k+N-2 for k
        # consecutive query positions — the documented "span of less
        # than k+N words").  The engine's sliding last-hit-per-word
        # tracker is existence-complete (any valid assignment is seen
        # when its max-position hit arrives), so set semantics must
        # agree exactly.
        posmap: dict[str, list[int]] = {}
        for t, p in toks:
            posmap.setdefault(t, []).append(p)
        qws = node.words
        lists = [posmap.get(qw.word) for qw in qws]
        if any(lst is None for lst in lists):
            return False
        lim = (qws[-1].querypos - qws[0].querypos) + node.max_distance - 1
        return any(max(c) - min(c) <= lim for c in itertools.product(*lists))
    if op == "and":
        return all(_eval(c, toks) for c in node.children)
    if op == "or":
        return any(_eval(c, toks) for c in node.children)
    if op == "andnot":
        return _eval(node.children[0], toks) and not _eval(
            node.children[1], toks
        )
    if op == "empty":
        return False
    raise AssertionError(f"fuzz grammar produced unexpected op {op!r}")


def test_random_query_composition_matches_naive_eval(fuzz_corpus):
    idx, toks = fuzz_corpus
    rng = random.Random(99)
    seen_ops = set()
    for i in range(120):
        q = _gen_query(rng)
        tree = idx.parse(q, "extended2")

        def ops(n):
            seen_ops.add(n.op)
            for c in n.children:
                ops(c)

        ops(tree)
        expected = {d for d, tt in toks.items() if _eval(tree, tt)}
        plan, _meta = idx.match(q)
        got = {r.docid for r in plan.select("docid").collect()}
        assert got == expected, (
            f"query {i}: {q!r}\n"
            f"engine-only: {sorted(got - expected)[:5]}\n"
            f"naive-only: {sorted(expected - got)[:5]}"
        )
    # the generator actually exercised every operator in the grammar
    assert {"term", "phrase", "quorum", "and", "or", "andnot"} <= seen_ops


# ------------------------------------------------------------------
# field-operator composition: @field / @(f1,f2) / @field[N] limits plus
# ^start / end$ anchors over a TWO-field corpus, composed with the same
# boolean operators.  The oracle evaluates the parse tree over the
# exact indexed hit stream (Tokenizer.hits_for_doc), qualifying hits at
# LEAF nodes with the leaf's own (fields_mask, max_field_pos) — the
# reference shape: ExtTermPos_c per-hit checks (src/sphinx.cpp:
# 12115-12143, pos<=N inclusive), with parent specs pushed into
# spec-less children at parse time (XQNode_t::SetFieldSpec).

FIELDS = ("title", "body")


@pytest.fixture(scope="module")
def field_fuzz_corpus(spark):
    from sphinx_1_spark.functions.tokenizer import (
        HIT_FIELD_END,
        POS_MASK,
        Tokenizer,
        TokenizerSettings,
    )

    rng = random.Random(20260819)
    rows = [
        (
            did,
            " ".join(rng.choice(VOCAB) for _ in range(rng.randint(2, 5))),
            " ".join(rng.choice(VOCAB) for _ in range(rng.randint(3, 10))),
        )
        for did in range(1, 81)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, title string, body string")
    idx = SphinxIndex.build(
        docs, IndexSettings(docid_col="doc_id", fields=FIELDS)
    ).persist()
    tok = Tokenizer(TokenizerSettings())
    # (word, field, in_field_pos, at_field_end) per hit — decoded from
    # the same packed stream the index stores
    hits = {
        did: [
            (w, p >> 24, p & POS_MASK, bool(p & HIT_FIELD_END))
            for w, p in tok.hits_for_doc([title, body])
        ]
        for did, title, body in rows
    }
    return idx, hits


def _gen_field_query(rng: random.Random, depth: int = 0) -> str:
    r = rng.random()
    if depth >= 2 or r < 0.5:
        a = rng.random()
        w = rng.choice(VOCAB)
        if a < 0.30:
            spec = rng.choice(("@title", "@body", "@(title,body)"))
            return f"{spec} {w}"
        if a < 0.42:
            spec = rng.choice(("@title", "@body"))
            return f"{spec}[{rng.randint(1, 6)}] {w}"
        if a < 0.55:
            return rng.choice((f"^{w}", f"{w}$"))
        if a < 0.75:
            k = rng.randint(2, 3)
            ws = [rng.choice(VOCAB) for _ in range(k)]
            # anchors attach to individual phrase words too
            # (phrasetoken -> keyword, src/sphinxquery.y:52-66)
            anchor = rng.random()
            if anchor < 0.2:
                ws[0] = "^" + ws[0]
            elif anchor < 0.4:
                ws[-1] = ws[-1] + "$"
            pre = rng.choice(("", "@title ", "@body "))
            return f'{pre}"{" ".join(ws)}"'
        pre = rng.choice(("", "@(title,body) "))
        return pre + '"' + " ".join(rng.sample(VOCAB, 3)) + '"/2'
    if r < 0.7:
        return f"{_gen_field_query(rng, depth + 1)} {_gen_field_query(rng, depth + 1)}"
    if r < 0.88:
        return f"{_gen_field_query(rng, depth + 1)} | {_gen_field_query(rng, depth + 1)}"
    return f"{_gen_field_query(rng, depth + 1)} -{rng.choice(VOCAB)}"


def _leaf_hits(node, hits):
    mask, maxp = node.fields_mask, node.max_field_pos
    return [
        h
        for h in hits
        if ((mask >> h[1]) & 1) and (maxp == 0 or h[2] <= maxp)
    ]


def _eval_fields(node, hits) -> bool:
    op = node.op
    if op == "term":
        qw = node.words[0]
        return any(
            t == qw.word
            and (not qw.field_start or p == 1)
            and (not qw.field_end or at_end)
            for t, _f, p, at_end in _leaf_hits(node, hits)
        )
    if op == "phrase":
        posmap: dict[str, set[tuple[int, int]]] = {}
        endset: dict[str, set[tuple[int, int]]] = {}
        for t, f, p, e in _leaf_hits(node, hits):
            posmap.setdefault(t, set()).add((f, p))
            if e:
                endset.setdefault(t, set()).add((f, p))
        qws = node.words
        base = qws[0].querypos

        def ok(qw, f, p):
            if (f, p) not in posmap.get(qw.word, ()):
                return False
            if qw.field_start and p != 1:
                return False
            if qw.field_end and (f, p) not in endset.get(qw.word, ()):
                return False
            return True

        return any(
            ok(qws[0], f, p)
            and all(ok(qw, f, p + qw.querypos - base) for qw in qws[1:])
            for f, p in posmap.get(qws[0].word, ())
        )
    if op == "quorum":
        present = {t for t, _f, _p, _e in _leaf_hits(node, hits)}
        return (
            sum(1 for qw in node.words if qw.word in present)
            >= node.max_distance
        )
    if op == "and":
        return all(_eval_fields(c, hits) for c in node.children)
    if op == "or":
        return any(_eval_fields(c, hits) for c in node.children)
    if op == "andnot":
        return _eval_fields(node.children[0], hits) and not _eval_fields(
            node.children[1], hits
        )
    if op == "empty":
        return False
    raise AssertionError(f"field-fuzz grammar produced unexpected op {op!r}")


def test_random_field_ops_match_naive_eval(field_fuzz_corpus):
    from sphinx_1_spark.plans.parser import ALL_FIELDS

    idx, hits = field_fuzz_corpus
    rng = random.Random(4242)
    saw_mask = saw_limit = saw_anchor = False
    for i in range(120):
        q = _gen_field_query(rng)
        tree = idx.parse(q, "extended2")

        def walk(n):
            nonlocal saw_mask, saw_limit, saw_anchor
            if n.fields_mask != ALL_FIELDS:
                saw_mask = True
            if n.max_field_pos:
                saw_limit = True
            if any(w.field_start or w.field_end for w in n.words):
                saw_anchor = True
            for c in n.children:
                walk(c)

        walk(tree)
        expected = {d for d, hh in hits.items() if _eval_fields(tree, hh)}
        plan, _meta = idx.match(q)
        got = {r.docid for r in plan.select("docid").collect()}
        assert got == expected, (
            f"query {i}: {q!r}\n"
            f"engine-only: {sorted(got - expected)[:5]}\n"
            f"naive-only: {sorted(expected - got)[:5]}"
        )
    assert saw_mask and saw_limit and saw_anchor


# ------------------------------------------------------------------
# proximity composition: "w1 w2 [w3]"~N atoms (distinct words — the
# duplicate-word ring behavior is a replay-pinned reference quirk)
# composed with the boolean operators over the single-field corpus.
# This is the first non-replay pin of the ExtProximity strict-window
# port (plans/compiler.py _compile_proximity, src/sphinx.cpp:
# 13222-13341) against an INDEPENDENT brute-force oracle.


def _gen_prox_query(rng: random.Random, depth: int = 0) -> str:
    r = rng.random()
    if depth >= 2 or r < 0.5:
        a = rng.random()
        if a < 0.55:
            k = rng.randint(2, 3)
            n = rng.randint(1, 6)
            return '"' + " ".join(rng.sample(VOCAB, k)) + f'"~{n}'
        if a < 0.8:
            return rng.choice(VOCAB)
        k = rng.randint(2, 3)
        return '"' + " ".join(rng.choice(VOCAB) for _ in range(k)) + '"'
    if r < 0.7:
        return f"{_gen_prox_query(rng, depth + 1)} {_gen_prox_query(rng, depth + 1)}"
    if r < 0.88:
        return f"{_gen_prox_query(rng, depth + 1)} | {_gen_prox_query(rng, depth + 1)}"
    return f"{_gen_prox_query(rng, depth + 1)} -{rng.choice(VOCAB)}"


def test_random_proximity_composition_matches_naive_eval(fuzz_corpus):
    idx, toks = fuzz_corpus
    rng = random.Random(777)
    seen_ops = set()
    for i in range(120):
        q = _gen_prox_query(rng)
        tree = idx.parse(q, "extended2")

        def ops(n):
            seen_ops.add(n.op)
            for c in n.children:
                ops(c)

        ops(tree)
        expected = {d for d, tt in toks.items() if _eval(tree, tt)}
        plan, _meta = idx.match(q)
        got = {r.docid for r in plan.select("docid").collect()}
        assert got == expected, (
            f"query {i}: {q!r}\n"
            f"engine-only: {sorted(got - expected)[:5]}\n"
            f"naive-only: {sorted(expected - got)[:5]}"
        )
    assert "proximity" in seen_ops and {"and", "or", "andnot"} <= seen_ops


# ------------------------------------------------------------------
# BEFORE (<<) chains: ordered non-overlapping occurrence within ONE
# field (ExtOrder_c::GetMatchingHits, src/sphinx.cpp:13650-13745).
# Children are terms / phrases (every hit of such a child carries one
# constant spanlen: 1 / phrase width), optionally field-qualified or
# anchored, over the two-field corpus; chains are composed with the
# boolean operators and field-qualified proximity atoms.  Oracle:
# per-child occurrence sets (field, start, span) from the exact
# indexed hit stream, then greedy earliest-feasible chaining per field
# (optimal because each child's span is constant, so the earliest
# start also minimizes start+span).


def _occurrences(node, hits):
    """{field: (sorted starts, span)} for a term/phrase BEFORE child."""
    if node.op == "term":
        qw = node.words[0]
        byf: dict[int, list[int]] = {}
        for t, f, p, at_end in _leaf_hits(node, hits):
            if (
                t == qw.word
                and (not qw.field_start or p == 1)
                and (not qw.field_end or at_end)
            ):
                byf.setdefault(f, []).append(p)
        return {f: (sorted(ps), 1) for f, ps in byf.items()}
    if node.op == "phrase":
        posmap: dict[str, set[tuple[int, int]]] = {}
        for t, f, p, _e in _leaf_hits(node, hits):
            posmap.setdefault(t, set()).add((f, p))
        qws = node.words
        base = qws[0].querypos
        span = qws[-1].querypos - base + 1
        byf = {}
        for f, p in posmap.get(qws[0].word, ()):
            if all(
                (f, p + qw.querypos - base) in posmap.get(qw.word, ())
                for qw in qws[1:]
            ):
                byf.setdefault(f, []).append(p)
        return {f: (sorted(ps), span) for f, ps in byf.items()}
    raise AssertionError(f"unexpected BEFORE child op {node.op!r}")


def _eval_before(node, hits) -> bool:
    occs = [_occurrences(c, hits) for c in node.children]
    for f in occs[0]:
        pos = 0
        for o in occs:
            got = o.get(f)
            if got is None:
                break
            starts, span = got
            nxt = next((s for s in starts if s >= pos), None)
            if nxt is None:
                break
            pos = nxt + span
        else:
            return True
    return False


def _eval_fields_ext(node, hits) -> bool:
    """_eval_fields extended with before / proximity ops."""
    op = node.op
    if op == "before":
        return _eval_before(node, hits)
    if op == "proximity":
        byfield: dict[int, dict[str, list[int]]] = {}
        for t, f, p, _e in _leaf_hits(node, hits):
            byfield.setdefault(f, {}).setdefault(t, []).append(p)
        qws = node.words
        lim = (qws[-1].querypos - qws[0].querypos) + node.max_distance - 1
        for posmap in byfield.values():
            lists = [posmap.get(qw.word) for qw in qws]
            if any(lst is None for lst in lists):
                continue
            if any(
                max(c) - min(c) <= lim for c in itertools.product(*lists)
            ):
                return True
        return False
    if op == "and":
        return all(_eval_fields_ext(c, hits) for c in node.children)
    if op == "or":
        return any(_eval_fields_ext(c, hits) for c in node.children)
    if op == "andnot":
        return _eval_fields_ext(node.children[0], hits) and not _eval_fields_ext(
            node.children[1], hits
        )
    return _eval_fields(node, hits)


def _gen_before_child(rng: random.Random) -> str:
    a = rng.random()
    w = rng.choice(VOCAB)
    pre = rng.choice(("", "", "@title ", "@body ", "@(title,body) "))
    if a < 0.45:
        return f"{pre}{w}"
    if a < 0.6:
        return rng.choice((f"^{w}", f"{w}$"))
    k = rng.randint(2, 3)
    words = " ".join(rng.choice(VOCAB) for _ in range(k))
    return f'{pre}"{words}"'


def _gen_before_query(rng: random.Random) -> str:
    chain = " << ".join(
        _gen_before_child(rng) for _ in range(rng.randint(2, 3))
    )
    r = rng.random()
    if r < 0.5:
        return chain
    if r < 0.68:
        return f"{chain} -{rng.choice(VOCAB)}"
    if r < 0.86:
        # parenthesized: a bare `chain | w` would make the OR node the
        # chain's LAST CHILD (<< binds looser than |, _beforelist takes
        # _orlistf operands) — mixed-span OR children follow the
        # reference's dual tracker, whose equivalence to the oracle's
        # earliest-first greedy is only proven for constant-span
        # (term/phrase) children
        return f"({chain}) | {rng.choice(VOCAB)}"
    spec = rng.choice(("", "@title ", "@body "))
    prox = f'{spec}"' + " ".join(rng.sample(VOCAB, 2)) + f'"~{rng.randint(1, 4)}'
    return f"{chain} {prox}"


def test_random_before_chains_match_naive_eval(field_fuzz_corpus):
    idx, hits = field_fuzz_corpus
    rng = random.Random(31337)
    saw_before = saw_phrase_child = saw_three = False
    for i in range(120):
        q = _gen_before_query(rng)
        tree = idx.parse(q, "extended2")

        def walk(n):
            nonlocal saw_before, saw_phrase_child, saw_three
            if n.op == "before":
                saw_before = True
                if len(n.children) >= 3:
                    saw_three = True
                if any(c.op == "phrase" for c in n.children):
                    saw_phrase_child = True
            for c in n.children:
                walk(c)

        walk(tree)
        expected = {d for d, hh in hits.items() if _eval_fields_ext(tree, hh)}
        plan, _meta = idx.match(q)
        got = {r.docid for r in plan.select("docid").collect()}
        assert got == expected, (
            f"query {i}: {q!r}\n"
            f"engine-only: {sorted(got - expected)[:5]}\n"
            f"naive-only: {sorted(expected - got)[:5]}"
        )
    assert saw_before and saw_phrase_child and saw_three
