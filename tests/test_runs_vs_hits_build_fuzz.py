"""Randomized differential fuzz: combine='runs' vs combine='hits'.

The map-side run combine (operators/hits.py build_runs_fused +
operators/segments.py encode_blocks_from_runs) is the default build
path; its contract is that decoded postings, positions, dictionary
stats, and manifest counters are IDENTICAL to the raw-hit
sort-shuffle path for any corpus layout and tokenizer config — only
block cuts may differ (runs blocks are docid-contiguous per
(word, grp), hit-path blocks hash-spread).

The fixed tests pin one corpus/config pair
(test_segments.py::test_runs_path_equivalent_to_hits_path); this
fuzz randomizes corpus size/seed/partitioning, shard count, encode
partitioning, and the tokenizer config — deliberately covering BOTH
map-side branches of build_runs_fused (the vectorized
hits_arrays_single_field fast path AND the general hits_for_doc path
that star-expanding configs force, Tokenizer.fast_array_path_ok).
"""

import random

import pytest

from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings
from sphinx_1_spark.operators.segments import decode_blocks
from sphinx_1_spark.plans.segment_index import (
    SegmentSet,
    build_segments,
    read_manifest,
)
from sphinx_1_spark.sources.pages import generate_pages

# config pool: each entry must exercise a distinct tokenizer shape.
# (expected_fast, settings) — expected_fast pins which map-side
# branch the runs builder takes, so a silently-widened fast-path
# guard can't shrink this fuzz's coverage of the general branch.
_CONFIGS = [
    # CJK n-grams, vectorized fast path (the production default)
    (True, TokenizerSettings(ngram_chars="U+4E00..U+9FBF")),
    # stopwords with zero step + min_word_len: position arithmetic
    # (stopwords/min_word_len>1 disqualify the fast path — general
    # branch, Tokenizer._fast_path_ok)
    (
        False,
        TokenizerSettings(
            min_word_len=3,
            stopwords=frozenset({"the", "and", "of", "zh"}),
            stopword_step=0,
        ),
    ),
    # morphology + exact-form dual emission ("=raw" namespace)
    (
        False,
        TokenizerSettings(morphology=("stem_en",), index_exact_words=True),
    ),
    # star-prefix expansion — forces the general hits_for_doc branch
    (
        False,
        TokenizerSettings(min_prefix_len=2, ngram_chars="U+4E00..U+9FBF"),
    ),
    # star-infix expansion (anchored ^*s / s$ namespaces)
    (False, TokenizerSettings(min_infix_len=2)),
    # multiforms token filter (multi-word contraction changes the
    # position stream — CSphTokenizer_Filter)
    (
        False,
        TokenizerSettings(
            multiforms=("lorem ipsum > li", "dolor sit amet > dsa")
        ),
    ),
    # synonyms scanner path (advanced scanner engages, _advanced)
    (
        False,
        TokenizerSettings(synonyms=("lorem ipsum => loremipsum",)),
    ),
]


def _canon(spark, paths):
    segs = SegmentSet(spark, paths)
    rows = decode_blocks(segs.blocks, with_positions=True).collect()
    postings = sorted(
        (
            r["wordid"],
            r["word"],
            r["docid"],
            r["tf"],
            r["fieldmask"],
            tuple(r["positions"]),
        )
        for r in rows
    )
    dct = {
        (r["wordid"], r["word"]): (r["docs"], r["hits"])
        for r in segs.dictionary.collect()
    }
    return postings, dct


@pytest.mark.parametrize("trial", range(7))
def test_runs_and_hits_paths_agree(spark, tmp_path, trial):
    rng = random.Random(0xC0FFEE + trial)
    n_docs = rng.randrange(80, 300)
    corpus_seed = rng.randrange(1, 10_000)
    partitions = rng.randrange(1, 8)
    n_shards = rng.randrange(1, 4)
    encode_partitions = rng.choice([None, 1, rng.randrange(2, 6)])
    expected_fast, tok = _CONFIGS[trial % len(_CONFIGS)]
    assert Tokenizer(tok).fast_array_path_ok is expected_fast

    pages = generate_pages(
        spark, n_docs, seed=corpus_seed, partitions=partitions
    )
    paths = {}
    for mode in ("runs", "hits"):
        out = str(tmp_path / mode)
        paths[mode] = build_segments(
            pages,
            out,
            n_shards=n_shards,
            tokenizer=tok,
            encode_partitions=encode_partitions,
            combine=mode,
        )

    # decoded postings + positions + dictionary identical per shard
    # (shard split is url-hashed, mode-independent)
    for p_runs, p_hits in zip(paths["runs"], paths["hits"]):
        post_r, dict_r = _canon(spark, [p_runs])
        post_h, dict_h = _canon(spark, [p_hits])
        assert post_r == post_h, (
            f"trial {trial}: postings diverge (n_docs={n_docs}, "
            f"seed={corpus_seed}, partitions={partitions}, "
            f"n_shards={n_shards}, encode={encode_partitions})"
        )
        assert dict_r == dict_h
        # manifest counters (n_docs/n_postings/n_hits/n_words) are
        # lineage evidence — they must agree too; n_blocks may differ
        m_r, m_h = read_manifest(p_runs), read_manifest(p_hits)
        for key in ("n_docs", "n_words", "n_postings", "n_hits"):
            assert m_r[key] == m_h[key], (trial, key)
        assert m_r["lineage"]["combine"] == "runs"
        assert m_h["lineage"]["combine"] == "hits"
