"""Deduplication operators for large-scale training-data pipelines.

All hashing is md5-based so every operator has an exactly-matching
ANSI-SQL oracle (DuckDB `md5` == Spark `F.md5`); the production scale
path swaps `xxhash64` in via the `hash_expr` hook without changing
plan shapes.

Scale notes:
  * exact dedup = one hash-shuffle groupBy — map-side partial agg,
    AQE-handled skew;
  * MinHash/LSH: banding turns all-pairs O(n^2) into a per-bucket
    self-join; bucket sizes are bounded by band width choice, and the
    candidate verify joins on doc pairs only;
  * n-gram Jaccard: inverted shingle->doc join; head shingles (stop
    phrases) should be frequency-capped at 10^12 scale (df cap filter
    included);
  * SimHash: 15-bit chunk LSH is exact for hamming radius <= 3 over
    60-bit fingerprints (pigeonhole: 4 chunks, <=3 differing bits hit
    at most 3 chunks).  60 bits, not 64: the fingerprint is built from
    the first 15 hex chars of md5 so the value stays inside a SIGNED
    long for the SQL oracle's conv() — documented here so an external
    consumer does not derive an incompatible 64-bit variant.
"""

from __future__ import annotations

# Relations persist()ed by the pair-finders below (shingle tables,
# signatures, fingerprints) — they must outlive the call because the
# returned DataFrames are lazy, so the functions cannot unpersist
# internally.  Pins are keyed by call SITE: a repeated call of the
# same operator auto-unpersists its previous call's relation (safe
# even if the old call's lazy result is still referenced — Spark just
# recomputes), so a long-lived session running periodic dedup passes
# holds at most one pinned relation per pin site, not one per call.
# release_dedup_caches() stays for manual/teardown control.
_CACHED: dict[str, "DataFrame"] = {}


def _pin(tag: str, df):
    old = _CACHED.pop(tag, None)
    if old is not None:
        try:
            old.unpersist()
        except Exception:
            pass
    _CACHED[tag] = df
    return df


def release_dedup_caches() -> int:
    """Unpersist every relation cached by prior dedup calls (safe while
    results are still referenced — Spark just recomputes); returns the
    number released."""
    n = 0
    for tag in list(_CACHED):
        try:
            _CACHED.pop(tag).unpersist()
            n += 1
        except Exception:
            pass
    return n

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SEP = "[^0-9a-z_]+"


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), TOKEN_SEP), lambda t: t != "")


# ----------------------------------------------------------------------
# exact dedup


def exact_duplicate_groups(
    docs: DataFrame, text_col: str = "text", min_count: int = 2
) -> DataFrame:
    """(text_hash, cnt, keeper): identical-text groups with the lowest
    doc_id as the canonical keeper; min_count=2 lists only true dups."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("keeper"))
        .where(F.col("cnt") >= min_count)
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the lowest doc_id per identical text."""
    keep = (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col("doc_id"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return docs.join(keep, "doc_id", "left_semi")


# ----------------------------------------------------------------------
# shingling


def shingle_df(docs: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle): distinct k-token shingles per doc.

    The token array is materialized in its own projection first:
    Catalyst does not hoist common subexpressions out of lambda
    functions, so an inline split expression would re-run per shingle
    index (O(tokens^2) per document)."""
    proj = docs.select("doc_id", _tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    shingles = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array())
    return (
        proj.select("doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))
    )


# ----------------------------------------------------------------------
# n-gram Jaccard


def ngram_jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    tau: float = 0.5,
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """(a, b, jaccard) for doc pairs with k-shingle Jaccard >= tau,
    a < b; via the inverted shingle index (no all-pairs).

    `max_shingle_df` drops shingles appearing in more than that many
    docs BEFORE the self-join — the guard that keeps the candidate
    join bounded at web scale (a boilerplate shingle shared by 10^6
    docs would otherwise emit 10^12 candidate rows).  It is ON by
    default; pass None only for corpora known to be boilerplate-free.
    Capped shingles also leave the per-doc size, so the jaccard is
    exact over the capped shingle sets."""
    sh = shingle_df(docs, k, text_col)
    if max_shingle_df:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_shingle_df)
        )
        sh = sh.join(keep.select("shingle"), "shingle", "left_semi")
    # the shingle relation feeds three plan branches (two join sides +
    # sizes); persist so tokenization runs once
    sh = _pin("jaccard:shingles", sh.persist())
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    pairs = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")), 6
            ),
        )
        .where(F.col("jaccard") >= tau)
        .select("a", "b", "jaccard")
    )
    return out


# ----------------------------------------------------------------------
# MinHash + LSH


MINHASH_P = (1 << 61) - 1  # Mersenne prime for Carter-Wegman hashing


def minhash_signatures(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 16,
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, h0..h{n-1}): Carter-Wegman minhash —
    two md5-derived 56-bit values (a, b) per shingle, then
    h_i = min over shingles of (a + i*b) mod p (p = 2^61-1).
    Exactly reproducible in SQL, and 8x fewer md5 calls than
    hashing per function."""
    sh = shingles if shingles is not None else shingle_df(docs, k, text_col)
    # 56-bit values: a + 15*b stays far below 2^63 (no overflow in
    # either engine's BIGINT arithmetic)
    a = F.conv(F.substring(F.md5(F.col("shingle")), 1, 14), 16, 10).cast("long")
    b = F.conv(
        F.substring(F.md5(F.concat(F.lit("b:"), F.col("shingle"))), 1, 14), 16, 10
    ).cast("long")
    hs = sh.select("doc_id", a.alias("a"), b.alias("b"))
    minhashes = [
        F.min(
            F.pmod(F.col("a") + F.lit(i) * F.col("b"), F.lit(MINHASH_P))
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return hs.groupBy("doc_id").agg(*minhashes)


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 3,
    bands: int = 4,
    rows_per_band: int = 4,
    tau: float = 0.5,
    text_col: str = "text",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Candidate pairs from LSH banding, verified with exact Jaccard.

    Two docs collide if any band's rows_per_band minhashes all match;
    P(collide) = 1-(1-j^r)^b — the classic S-curve around tau.

    max_bucket_size caps the banding self-join's hot buckets: a bucket
    holding B docs yields B^2/2 candidate pairs, and web-scale corpora
    have degenerate clusters (boilerplate, empty pages) whose buckets
    grow linearly with the corpus — the same quadratic cliff the
    shingle path caps with max_shingle_df.  Buckets above the cap are
    dropped; 0 disables.

    Measured recall trade (pinned in test_round4_fixes.py
    test_minhash_bucket_cap_recall): pairs whose distinguishing
    content contributes minhash minima keep pairing through their
    small buckets — recall 1.0 on planted near-dups beside a 2,000-doc
    boilerplate cluster.  Pairs INSIDE an over-cap degenerate cluster
    (near-copies of the boilerplate itself) are dropped with their
    buckets: two near-copies only ever share the mega-bucket's band
    hashes, so there is no other band to pair through.  That content
    is what upstream exact/simhash dedup removes, and what this cap
    exists to not pay B^2 for."""
    num_hashes = bands * rows_per_band
    # one persisted shingle relation feeds both the signature build
    # and the verify joins; persist sig too (self-joined for banding)
    sh = _pin("minhash:shingles", shingle_df(docs, k, text_col).persist())
    sig = _pin(
        "minhash:signatures",
        minhash_signatures(
            docs, k, num_hashes, text_col, shingles=sh
        ).persist()
    )
    band_arr = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"h{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select(
        "doc_id", F.posexplode(band_arr).alias("band", "bucket")
    )
    if max_bucket_size:
        # shuffle-partitioned on the same (band, bucket) key as the
        # self-join below — the count join reuses that partitioning
        bc = (
            buckets.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= max_bucket_size)
            .drop("_n")
        )
        buckets = buckets.join(bc, ["band", "bucket"])
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "bucket"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    # verify candidates with exact jaccard (reuses the persisted sh)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sh_a = sh.select(F.col("doc_id").alias("a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("b"), "shingle")
    common = (
        cand.join(sh_a, "a")
        .join(sh_b, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common") / (F.col("sza") + F.col("szb") - F.col("common")), 6
            ),
        )
        .where(F.col("jaccard") >= tau)
        .select("a", "b", "jaccard")
    )
    return out


# ----------------------------------------------------------------------
# SimHash


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash over distinct tokens.

    Token hash = first 15 hex chars of md5 (a 60-bit value — one hex
    digit under 64 keeps conv() inside a signed long in BOTH engines);
    bit i of the fingerprint is 1 iff sum over tokens of (+1 if hash
    bit i else -1) > 0.  Pure relational form (explode bits) so the SQL
    oracle is exact; the scale path replaces the bit explode with a
    vectorized pandas UDF of identical definition."""
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("tok")
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    toks = toks.select("doc_id", h.alias("h"))
    # one hash-aggregate with 60 per-bit vote sums (map-side partial
    # combine, single doc_id shuffle) instead of exploding 60 rows per
    # token; identical votes/fingerprint definition
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(60)
    ]
    per_doc = toks.groupBy("doc_id").agg(*votes)
    acc = F.lit(0).cast("long")
    for i in range(60):
        acc = acc + F.when(
            F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return per_doc.select("doc_id", acc.alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """(a, b, hamming): pairs within hamming distance via 15-bit-chunk
    LSH (4 chunks over 60 bits; exact for max_hamming <= 3)."""
    # persist the fingerprints: the relation feeds both join sides
    # (and previously 4 union branches), which would otherwise re-run
    # the aggregation lineage per branch
    fp = _pin("simhash:fingerprints", simhash64(docs, text_col).persist())
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 15)
                        .bitwiseAND(0x7FFF)
                        .alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.key").alias("key"))
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk", "key"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
    )
    # hamming filter BEFORE the dedup of multi-chunk matches: bit_count
    # is codegen-cheap, and it shrinks the distinct's shuffle to the
    # near-dup survivors
    return (
        cand.where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
    )


# ----------------------------------------------------------------------
# embedding cosine near-dup


def embedding_neardup_pairs(
    emb: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_broadcast_rows: int = 2_000_000,
) -> DataFrame:
    """(a, b, cos) for pairs with cosine similarity >= tau.

    Broadcast-matmul: the (normalized) matrix is broadcast to
    executors and each partition multiplies its slice against it with
    one numpy matmul — exact all-pairs, no quadratic join.  Beyond
    `max_broadcast_rows` the matrix no longer fits an executor and
    this auto-switches to `embedding_neardup_bucketed` (sign-LSH
    bucket → per-bucket matmul via applyInPandas): each bucket's
    matrix is bounded, nothing is collected to the driver, and the
    trade is the usual LSH recall (cross-bucket pairs are missed —
    grow nbits to shrink buckets, shrink nbits to raise recall)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    n_rows = emb.count()
    if n_rows > max_broadcast_rows:
        # ~4 expected splits per doubling beyond the bound; buckets
        # are uneven so overshoot by 2 bits
        import math
        import warnings

        nbits = max(4, math.ceil(math.log2(n_rows / max_broadcast_rows)) + 2)
        # make the exactness downgrade visible: cross-bucket pairs are
        # missed, so callers relying on the exact all-pairs contract
        # must either raise max_broadcast_rows or accept LSH recall
        warnings.warn(
            f"embedding_neardup_pairs: {n_rows} rows exceed "
            f"max_broadcast_rows={max_broadcast_rows}; switching to the "
            f"APPROXIMATE sign-LSH bucketed path (nbits={nbits}) — "
            "cross-bucket near-dup pairs will be missed. Call "
            "embedding_neardup_bucketed directly to tune recall, or "
            "raise max_broadcast_rows for exact results.",
            RuntimeWarning,
            stacklevel=2,
        )
        return embedding_neardup_bucketed(
            emb, tau=tau, nbits=nbits, id_col=id_col, vec_col=vec_col
        )
    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    spark = emb.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def gen(batches):
        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            my_ids = pdf[id_col].to_numpy(dtype=np.int64)
            my_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            my_norms = np.sqrt((my_mat * my_mat).sum(axis=1))
            sims = (my_mat @ all_mat.T) / np.outer(my_norms, all_norms)
            sims = np.round(sims, 6)
            cand = np.argwhere(
                (sims >= tau) & (my_ids[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "a": my_ids[cand[:, 0]],
                    "b": all_ids[cand[:, 1]],
                    "cos": sims[cand[:, 0], cand[:, 1]],
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(gen, schema)


def embedding_neardup_bucketed(
    emb: DataFrame,
    tau: float = 0.95,
    nbits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cos) near-dup pairs WITHIN each sign-LSH bucket — the
    10^12-row scale path of `embedding_neardup_pairs`.

    One hash shuffle on the bucket id, then an in-bucket exact numpy
    matmul per group (Arrow applyInPandas) — no driver collect, no
    global broadcast, no quadratic join.  The planes are hash-derived
    (similarity.deterministic_planes), so bucket membership is a pure
    function of the vector: results are deterministic and the
    equivalent bucket predicate can be stated in SQL (gate oracle).
    Near-identical vectors (cos >= ~0.95) land in the same bucket
    unless a plane separates them; recall rises as nbits falls.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from sphinx_1_spark.operators.similarity import (
        deterministic_planes,
        lsh_bucket,
    )

    first = emb.select(vec_col).first()
    if first is None:
        # empty input: no pairs (a .first()[0] here raised TypeError)
        return emb.sparkSession.createDataFrame(
            [], "a long, b long, cos double"
        )
    dim = len(first[0])
    planes = deterministic_planes(dim, nbits, seed)
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes).cast("int"))

    schema = StructType(
        [
            StructField("bucket", IntegerType()),
            StructField("a", LongType()),
            StructField("b", LongType()),
            StructField("cos", DoubleType()),
        ]
    )

    def per_bucket(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["v"]), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        sims = np.round((mat @ mat.T) / np.outer(norms, norms), 6)
        cand = np.argwhere((sims >= tau) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {
                "bucket": np.full(len(cand), key[0], dtype=np.int32),
                "a": ids[cand[:, 0]],
                "b": ids[cand[:, 1]],
                "cos": sims[cand[:, 0], cand[:, 1]],
            }
        )

    return (
        v.groupBy("bucket")
        .applyInPandas(per_bucket, schema)
        .select("a", "b", "cos")
    )


# ----------------------------------------------------------------------
# connected components / cluster-level dedup
#
# The pair finders above answer "which docs are near-duplicates of
# each other"; a training pipeline needs the transitive answer: the
# CLUSTER each doc belongs to and one canonical survivor per cluster
# (A~B and B~C must collapse to one kept doc even when A~C was never
# emitted).  Alternating large-star / small-star (Kiveris et al.,
# "Connected Components in MapReduce and Beyond", SoCC'14) is the
# standard shuffle-parallel algorithm: O(log n) rounds, each round two
# groupBy shuffles over the edge set, no driver-side graph state —
# the shape that survives 10^12 edges where label propagation would
# need diameter rounds (a re-crawl chain u1~u2~...~uk is exactly the
# worst case) and GraphX/driver union-find would not fit at all.


def _sym(edges: DataFrame) -> DataFrame:
    """Both directions of every edge: (u,v) + (v,u)."""
    return edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _edges_signature(edges: DataFrame) -> tuple:
    """Cheap convergence fingerprint: (count, sum of row hashes).
    Driver-side scalars only — never the edge set itself."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("u", "v").cast("long")).alias("h"),
    ).collect()[0]
    return int(row["n"] or 0), int(row["h"] or 0)


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`, where
    `component` is the smallest node id in its connected component
    (so the component id doubles as the canonical-survivor id).

    Alternating large-star/small-star over the undirected edge set:

      large-star: every node links its LARGER neighbors to
        min(N(u) + {u});
      small-star: every node links its smaller-or-equal neighbors
        (and itself) to their minimum.

    Each round is two groupBy("u") shuffles; the edge set only
    shrinks toward a star forest rooted at component minima, reached
    in O(log n) rounds.  Per round the edge lineage is truncated with
    localCheckpoint (on a cluster with a checkpoint dir configured,
    `df.checkpoint()` is the durable equivalent) — without it the
    plan doubles every iteration and the optimizer, not the shuffle,
    becomes the bottleneck.  Skewed hub nodes are safe: a hub's
    neighbor list reduces to ONE min per groupBy (partial agg
    map-side), never a cross product.

    Self-loops are dropped, duplicate/reversed pairs collapse via
    distinct.  Nodes with no surviving pair (singletons) are not in
    the output — callers keep them via left_anti (see neardup_dedup).
    Raises RuntimeError if max_iter rounds do not converge (cannot
    happen for max_iter >= ~2*log2(n); the guard exists so a bug
    surfaces as an error, not an infinite job)."""
    edges = (
        pairs.select(
            F.col(a_col).cast("long").alias("u"),
            F.col(b_col).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    prev_sig = None
    for _ in range(max_iter):
        # ---- large-star
        und = _sym(edges)
        mins = und.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        edges = (
            und.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star: for each u, its strictly-smaller neighbors
        # v (m = their min, <= every v < u) — link each v != m and u
        # itself to m
        smaller = _sym(edges).where(F.col("v") < F.col("u"))
        mins2 = smaller.groupBy("u").agg(F.min("v").alias("m"))
        via_nbr = (
            smaller.join(mins2, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        via_self = mins2.select(F.col("u"), F.col("m").alias("v"))
        edges = via_nbr.union(via_self).distinct().localCheckpoint(eager=True)
        sig = _edges_signature(edges)
        if sig == prev_sig:
            # star forest reached: edges are (child, root), root = min
            roots = edges.select(F.col("v")).distinct()
            return edges.select(
                F.col("u").alias("node"), F.col("v").alias("component")
            ).union(
                roots.select(
                    F.col("v").alias("node"), F.col("v").alias("component")
                )
            )
        prev_sig = sig
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def neardup_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Keep one canonical doc (the smallest id) per near-duplicate
    component, plus every doc not in any pair.  The transitive closure
    of any pair finder above: pass it ngram_jaccard_pairs /
    minhash_lsh_pairs / simhash_neardup_pairs / embedding pairs output.

    One anti-join against the non-canonical members — the same
    kill-list shape the serving layer uses, so AQE picks broadcast vs
    shuffle by the loser set's actual size."""
    comp = connected_components(pairs, a_col, b_col)
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
