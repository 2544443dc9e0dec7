"""Dedup cache pin lifecycle (round-5 VERDICT de-footgun ask).

The pair finders persist() intermediate relations (shingles,
signatures, fingerprints) that must outlive their call because the
returned DataFrames are lazy.  Round 4 accumulated one pin per CALL
in a module list, so a long-lived session running periodic dedup
passes grew executor storage without bound unless it remembered to
call release_dedup_caches().  Pins are now keyed by call site and a
repeated call auto-unpersists its predecessor — this test pins that
executor storage does NOT grow across N repeated passes, that old
results still work afterwards (Spark recomputes), and that
release_dedup_caches() still empties everything.
"""

from pyspark.sql import functions as F

from sphinx_1_spark.operators import dedup
from sphinx_1_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    release_dedup_caches,
    simhash_neardup_pairs,
)


def _docs(spark, seed=0):
    rows = [
        (i, f"alpha beta gamma delta epsilon doc{seed} v{i % 7} "
            f"zeta eta theta {i}")
        for i in range(60)
    ]
    # a couple of true near-dup pairs so the finders do real work
    rows += [(100 + seed, rows[0][1]), (200 + seed, rows[1][1] + " tail")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _n_cached_rdds(spark):
    jsc = spark.sparkContext._jsc.sc()
    return jsc.getPersistentRDDs().size()


def test_repeated_passes_do_not_grow_storage(spark):
    release_dedup_caches()
    spark.sparkContext._jsc.sc()  # warm
    baseline = _n_cached_rdds(spark)

    counts = []
    for i in range(4):
        docs = _docs(spark, seed=i)
        ngram_jaccard_pairs(docs, k=3, tau=0.3).count()
        minhash_lsh_pairs(docs, k=3, bands=4, rows_per_band=2, tau=0.3).count()
        simhash_neardup_pairs(docs, max_hamming=3).count()
        counts.append(_n_cached_rdds(spark))

    # pass 1 establishes the per-site pins; passes 2..N must replace,
    # not accumulate (the round-4 behavior grew by ~4 RDDs per pass)
    assert counts[1] == counts[2] == counts[3], counts
    assert counts[3] <= baseline + 5, (baseline, counts)
    # the module dict holds at most one entry per pin SITE
    assert len(dedup._CACHED) <= 4, list(dedup._CACHED)

    # a PREVIOUS pass's lazy result still evaluates after its pins
    # were superseded (Spark recomputes the unpersisted relation)
    old = ngram_jaccard_pairs(_docs(spark, seed=0), k=3, tau=0.3)
    ngram_jaccard_pairs(_docs(spark, seed=1), k=3, tau=0.3).count()
    assert old.count() >= 1

    released = release_dedup_caches()
    assert released >= 1
    assert len(dedup._CACHED) == 0
    assert _n_cached_rdds(spark) <= baseline + 1
