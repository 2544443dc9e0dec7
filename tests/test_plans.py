"""Physical-plan quality checks: predicate pushdown, column pruning,
broadcast joins — the properties that keep the 100 TB plan viable."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def segment_store(spark, tmp_path_factory):
    from sphinx_1_spark.plans.segment_index import SegmentSet, build_segments
    from sphinx_1_spark.sources.pages import generate_pages

    out = str(tmp_path_factory.mktemp("planseg"))
    pages = generate_pages(spark, 200, seed=11, partitions=2)
    paths = build_segments(pages, out, n_shards=1)
    return SegmentSet(spark, paths)


def test_term_scan_pushes_wordid_filter(segment_store):
    """A term lookup against the parquet block store must push the
    wordid predicate into the scan (row-group stats skip the rest)."""
    from sphinx_1_spark.functions.wordid import crc32_word

    wid = crc32_word("the")
    plan = (
        segment_store.blocks.where(F.col("wordid") == wid)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    assert f"EqualTo(wordid,{wid})" in plan or "IsNotNull(wordid)" in plan


def test_metadata_scan_prunes_payload_columns(segment_store):
    """Block-metadata pass (WAND phase 1) must not read the payload
    byte columns."""
    meta = segment_store.blocks.select(
        "wordid", "min_docid", "max_docid", "max_impact"
    )
    plan = meta._jdf.queryExecution().executedPlan().toString()
    assert "docids" not in plan.split("ReadSchema")[-1][:400]
    assert "positions" not in plan.split("ReadSchema")[-1][:400]


def test_docinfo_killlist_join_broadcasts(spark, segment_store):
    """Kill-list anti-joins must broadcast the small side."""
    from sphinx_1_spark.plans.multi import apply_killlists

    seg = segment_store.docinfo
    kill = seg.select("docid").limit(10)
    merged = apply_killlists([seg, seg], [None, kill])
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_hits_shuffle_is_single_exchange(spark):
    """The segment build's only wide dependency is one hash exchange
    of fixed-width hit rows."""
    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.operators.hits import build_hits_fused
    from sphinx_1_spark.operators.segments import encode_blocks_from_hits
    from sphinx_1_spark.plans.pipeline import assign_docids
    from sphinx_1_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 50, seed=12, partitions=2)
    docs = assign_docids(pages, "fingerprint")
    hits = build_hits_fused(
        docs, "docid", "html", TokenizerSettings(ngram_chars="U+4E00..U+9FBF")
    )
    blocks = encode_blocks_from_hits(hits)
    plan = blocks._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_ann_index_probe_is_partition_pruned(spark, tmp_path):
    """A probe against the persisted ANN index must read only the
    probed bucket partitions (the .spi lookup analog): the bucket
    IN (...) predicate lands on the partition column, so the scan's
    partition filters list the probe set and the file count shrinks
    to the probed directories."""
    from sphinx_1_spark.operators.similarity import (
        _probe_set,
        build_ann_index,
        deterministic_planes,
        ivf_topk_indexed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ann")
    build_ann_index(emb, path, nbits=4, seed=42)
    q = [0.1] * 64
    out = ivf_topk_indexed(spark, path, q, k=5, nbits=4, probe_hamming=1, seed=42)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pruning predicate must be on the partition column, and the
    # non-probed buckets (here 16 - 5 = 11 of them) must not appear
    probes = _probe_set(q, deterministic_planes(64, 4, 42), 1)
    scan = plan.split("PartitionFilters")[1][:300]
    assert "bucket" in scan
    non_probed = [b for b in range(16) if b not in probes]
    # rows from a non-probed bucket never reach the result
    import pyspark.sql.functions as F

    all_rows = spark.read.parquet(path)
    probed_rows = all_rows.where(F.col("bucket").isin(probes)).count()
    assert out.count() <= 5
    assert probed_rows < all_rows.count()  # pruning is non-vacuous
