"""Training-data pipeline operators: dedup / similarity / text stats /
multimodal plumbing.  (Cross-engine value identity is enforced by the
DuckDB gate — scripts/check_gate.py; these tests pin semantics.)"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup
        (3, "the quick brown fox jumps over a lazy dog", "en"),  # near dup
        (4, "completely different content about spark engines", "en"),
        (5, "", "en"),
        (6, "中文内容测试 with some english", "zh-mix"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(spark, docs):
    from sphinx_1_spark.operators.dedup import exact_dedup, exact_duplicate_groups

    groups = exact_duplicate_groups(docs).collect()
    assert len(groups) == 1 and groups[0]["cnt"] == 2 and groups[0]["keeper"] == 1
    kept = exact_dedup(docs).select("doc_id").collect()
    ids = {r["doc_id"] for r in kept}
    assert 1 in ids and 2 not in ids and len(ids) == 5


def test_jaccard_and_minhash_agree_on_strong_pairs(spark, docs):
    from sphinx_1_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    jac = {(r["a"], r["b"]) for r in ngram_jaccard_pairs(docs, k=3, tau=0.5).collect()}
    assert (1, 2) in jac  # identical docs have jaccard 1.0
    mh = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs, k=3, tau=0.5).collect()}
    assert (1, 2) in mh
    assert mh <= jac  # LSH candidates are verified with the same tau


def test_simhash_identical_docs_zero_distance(spark, docs):
    from sphinx_1_spark.operators.dedup import simhash64, simhash_neardup_pairs

    fps = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert fps[1] == fps[2]
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0


def test_cosine_topk_and_ivf(spark):
    from sphinx_1_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [0.1] * 64
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    assert len(exact) == 5
    # full-probe IVF degrades to exact
    approx = [
        r["vec_id"]
        for r in ivf_topk(emb, q, k=5, nbits=4, probe_hamming=2).collect()
    ]
    assert len(approx) == 5
    assert len(set(exact) & set(approx)) >= 3  # high recall with wide probe


def test_textstats(spark, docs):
    from sphinx_1_spark.operators.textstats import (
        fingerprints,
        language_id,
        quality_score,
        token_counts,
    )

    tc = {r["doc_id"]: r["n_ws_tokens"] for r in token_counts(docs).collect()}
    assert tc[1] == 9 and tc[5] == 0
    lang = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert lang[1] == "en" and lang[6] == "zh"
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert 0.0 <= min(q.values()) and max(q.values()) <= 1.0
    assert q[1] > q[5]  # real text beats empty text
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs).collect()}
    assert fp[1] == fp[2] and fp[1] != fp[4]


def test_multimodal_plumbing(spark, docs):
    from sphinx_1_spark.operators.multimodal import (
        FEATURE_DIM,
        attach_payload,
        decode_image_metadata,
        extract_features,
        frame_sample,
    )

    df = attach_payload(docs)
    assert dict(df.dtypes)["payload"] == "binary"
    meta = decode_image_metadata(df).collect()
    assert len(meta) == 6
    m = {r["doc_id"]: r for r in meta}
    assert m[1]["width"] == m[2]["width"]  # deterministic in payload
    assert all(64 <= r["width"] < 2049 for r in meta)
    assert m[1]["n_bytes"] == len(m and "the quick brown fox jumps over the lazy dog")
    feats = extract_features(df).collect()
    assert all(len(r["features"]) == FEATURE_DIM for r in feats)
    fr = frame_sample(df, n_frames=4).collect()
    assert len(fr) == 24  # 6 docs x 4 frames
    with pytest.raises(NotImplementedError):
        decode_image_metadata(df, decoder="pil").collect()


def test_embedding_bucketed_matches_broadcast_within_buckets(spark):
    """The LSH-bucketed scale path returns exactly the broadcast
    all-pairs result restricted to equal-bucket pairs (same planes)."""
    from pyspark.sql import functions as F

    from sphinx_1_spark.operators.dedup import (
        embedding_neardup_bucketed,
        embedding_neardup_pairs,
    )
    from sphinx_1_spark.operators.similarity import (
        deterministic_planes,
        lsh_bucket,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    nbits, seed, tau = 3, 42, 0.4
    bucketed = {
        (r["a"], r["b"]): r["cos"]
        for r in embedding_neardup_bucketed(
            emb, tau=tau, nbits=nbits, seed=seed
        ).collect()
    }
    planes = deterministic_planes(64, nbits, seed)
    buckets = {
        r["vec_id"]: r["bucket"]
        for r in emb.select(
            "vec_id",
            lsh_bucket(
                F.col("embedding").cast("array<double>"), planes
            ).alias("bucket"),
        ).collect()
    }
    exact = {
        (r["a"], r["b"]): r["cos"]
        for r in embedding_neardup_pairs(emb, tau=tau).collect()
    }
    expected = {
        pair: cos
        for pair, cos in exact.items()
        if buckets[pair[0]] == buckets[pair[1]]
    }
    assert bucketed == expected
    assert len(bucketed) > 0


def test_embedding_neardup_autoswitches_above_broadcast_bound(spark):
    """Above max_broadcast_rows the exact path must hand off to the
    bucketed plan instead of raising (no collect cliff)."""
    from sphinx_1_spark.operators.dedup import embedding_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = embedding_neardup_pairs(emb, tau=0.4, max_broadcast_rows=10)
    rows = out.collect()  # must run, not raise
    assert {tuple(r) for r in rows}  # non-empty at tau=0.4 on sf0.001
