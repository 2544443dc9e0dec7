"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (one scan +
TakeOrderedAndProject — no shuffle beyond the final top-k merge);
`ivf_topk` is the scale path: cluster by deterministic sign-LSH
buckets, probe only the query's bucket neighborhood.  At 10^12 rows
the bucket table is partitioned by bucket id so a probe is a
partition-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(x: Column) -> Column:
    return F.sqrt(_dot(x, x))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (vec_id, cos) ordered cos desc,
    id asc tiebreak."""
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    qn = sum(float(x) * float(x) for x in query_vec) ** 0.5
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    scored = v.select(
        "vec_id",
        F.round(_dot(F.col("v"), q) / (_norm(F.col("v")) * F.lit(qn)), 6).alias("cos"),
    )
    return scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = sign of dot(vec, plane_i)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        pc = F.array(*[F.lit(float(x)) for x in p]).cast("array<double>")
        bit = F.when(_dot(vec, pc) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def deterministic_planes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Pseudo-random hyperplanes derived from a hash — deterministic
    across engines/runs, no RNG state."""
    import hashlib
    import struct

    planes = []
    for i in range(nbits):
        vals = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{i}:{d}".encode()).digest()
            (u,) = struct.unpack("<Q", h[:8])
            vals.append((u / 2**64) * 2.0 - 1.0)
        planes.append(vals)
    return planes


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nbits: int = 4,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: scan only LSH buckets within
    `probe_hamming` bits of the query's bucket (IVF-style probe).

    Recall is tunable via nbits/probe_hamming; with probe_hamming =
    nbits it degrades to exact brute force."""
    dim = len(query_vec)
    planes = deterministic_planes(dim, nbits, seed)
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))

    # query bucket + neighbors within hamming distance
    probes = _probe_set(query_vec, planes, probe_hamming)

    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    qn = sum(float(x) * float(x) for x in query_vec) ** 0.5
    scored = (
        v.where(F.col("bucket").isin(probes))
        .select(
            "vec_id",
            F.round(_dot(F.col("v"), q) / (_norm(F.col("v")) * F.lit(qn)), 6).alias(
                "cos"
            ),
        )
    )
    return scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)


def _probe_set(query_vec: list[float], planes: list[list[float]], probe_hamming: int) -> list[int]:
    """Query bucket + all buckets within `probe_hamming` flipped bits."""
    nbits = len(planes)
    qbucket = 0
    for i, p in enumerate(planes):
        dp = sum(float(a) * float(b) for a, b in zip(query_vec, p))
        if dp >= 0:
            qbucket |= 1 << i
    from itertools import combinations

    # all bit-flip combinations up to probe_hamming (the old hand
    # rolled version silently stopped at distance 2, so
    # probe_hamming=nbits was NOT the documented exact brute force)
    probes = {qbucket}
    for d in range(1, min(probe_hamming, nbits) + 1):
        for bits in combinations(range(nbits), d):
            m = 0
            for b in bits:
                m |= 1 << b
            probes.add(qbucket ^ m)
    return sorted(probes)


def build_ann_index(
    emb: DataFrame,
    path: str,
    nbits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the ANN index as a BUCKET-PARTITIONED parquet table —
    the analog of the reference's .spi/.spd split (a probe is an index
    lookup, not a scan; src/sphinx.cpp:14811-14900 SetupQueryWord
    binary-searches the checkpoint table the same way partition
    pruning skips non-probed directories here).

    Each sign-LSH bucket becomes one partition directory
    (bucket=<id>/...), so `ivf_topk_indexed` reads ONLY the probed
    buckets: at 10^12 rows a probe touches 2^-nbits * (1+nbits)
    of the data instead of 100%.  Planes are hash-derived from
    (dim, nbits, seed) — no sidecar metadata needed to re-derive them
    at probe time."""
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("cannot build an ANN index over an empty table")
    dim = len(first[0])
    planes = deterministic_planes(dim, nbits, seed)
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes).cast("int"))
    # one shuffle keyed on bucket so each partition directory is
    # written by the executors owning that bucket (no tiny-file spray:
    # without it every task writes a file into every bucket dir)
    v.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(path)


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nbits: int = 4,
    probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k over a persisted `build_ann_index`
    table: the bucket IN (...) predicate lands on the partition column,
    so the scan is partition-pruned to the probed buckets only
    (verified by tests/test_plans.py plan assertion)."""
    dim = len(query_vec)
    planes = deterministic_planes(dim, nbits, seed)
    probes = _probe_set(query_vec, planes, probe_hamming)
    v = spark.read.parquet(path).where(F.col("bucket").isin(probes))
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    qn = sum(float(x) * float(x) for x in query_vec) ** 0.5
    scored = v.select(
        "vec_id",
        F.round(_dot(F.col("v"), q) / (_norm(F.col("v")) * F.lit(qn)), 6).alias(
            "cos"
        ),
    )
    return scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)
