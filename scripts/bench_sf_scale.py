"""Per-query scaling bench: run the gate suite at sf0.1 and at a
synthetically scaled corpus (default 10x = "sf1"), print per-query
seconds + ratios so PLAN COSTS are visible above the Spark job-latency
floor (VERDICT r2 item 6).

The scaled corpus derives deterministically from sf0.1 (TESTDATA's own
tables — no external data):
  * documents: factor-1 extra replicas per row, doc_id offset by
    10M per replica, words SHUFFLED with a per-(doc,replica) seeded RNG
    — term/BM25 statistics scale realistically (same vocabulary, df
    and tf scale with the corpus) while word-order shingles break, so
    near-dup pair counts don't explode quadratically with replication;
  * events: event_id/user_id offsets, timestamps unchanged;
  * embeddings: fresh deterministic unit vectors per scaled vec_id
    (near-orthogonal in high dim -> ANN/dedup bucket costs scale with
    rows, not with artificial duplicate clusters).

Usage:
  python3 scripts/bench_sf_scale.py [--factor 10] [--out DIR]
      [--queries q_a q_b ...]
Prints one JSON line: {"factor": F, "base": {...}, "scaled": {...},
"ratio": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
OFFSET = 10_000_000


def build_scaled(spark, out_dir: str, factor: int) -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    marker = os.path.join(out_dir, f"_SCALED_x{factor}")
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)

    # ---- documents: replicate with seeded word shuffle ----
    docs = spark.read.parquet(f"{BASE}/documents.parquet")

    def shuffle_words(batches):
        for pdf in batches:
            texts = []
            for did, rep, text in zip(pdf["doc_id"], pdf["_rep"], pdf["text"]):
                if rep == 0:
                    texts.append(text)
                    continue
                words = (text or "").split()
                rng = np.random.default_rng(int(did) * 131 + int(rep))
                rng.shuffle(words)
                texts.append(" ".join(words))
            out = pdf.copy()
            out["text"] = texts
            out["doc_id"] = pdf["doc_id"] + pdf["_rep"] * OFFSET
            out["n_chars"] = [len(t or "") for t in texts]
            yield out.drop(columns=["_rep"])

    reps = spark.range(factor).select(F.col("id").cast("int").alias("_rep"))
    scaled_docs = docs.crossJoin(F.broadcast(reps)).mapInPandas(
        shuffle_words, docs.schema
    )
    scaled_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    # ---- events: id offsets only ----
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    scaled_ev = (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") + F.col("_rep") * OFFSET)
        .withColumn("user_id", F.col("user_id") + F.col("_rep") * OFFSET)
        .drop("_rep")
    )
    scaled_ev.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )

    # ---- embeddings: fresh deterministic unit vectors for replicas ----
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    n_labels = emb.agg(F.max("label")).first()[0] + 1

    def fresh_vectors(batches):
        for pdf in batches:
            vecs, labels, ids = [], [], []
            for vid, rep, vec, lab in zip(
                pdf["vec_id"], pdf["_rep"], pdf["embedding"], pdf["label"]
            ):
                if rep == 0:
                    ids.append(int(vid))
                    vecs.append(vec)
                    labels.append(int(lab))
                    continue
                nid = int(vid) + int(rep) * OFFSET
                rng = np.random.default_rng(nid)
                v = rng.standard_normal(dim).astype(np.float32)
                v /= np.linalg.norm(v)
                ids.append(nid)
                vecs.append(v.tolist())
                labels.append(int(rng.integers(0, n_labels)))
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": vecs, "label": labels}
            )

    scaled_emb = emb.crossJoin(F.broadcast(reps)).mapInPandas(
        fresh_vectors, emb.schema
    )
    scaled_emb.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )

    # the remaining gate tables are not documents/events/embeddings
    # derived — symlink them unscaled so every oracle view resolves
    for t in (
        "region nation customer supplier part orders lineitem"
    ).split():
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    with open(marker, "w") as f:
        f.write("ok\n")


def _reset_caches(entry_mod) -> None:
    """Unpersist + clear the gate module's per-sf index memos so every
    pass pays its own builds — otherwise the second pass compares a
    cold-built scaled corpus against warm cached base indexes."""
    cache = getattr(entry_mod, "_INDEX_CACHE", {})
    for v in cache.values():
        for attr in ("postings", "dictionary", "docinfo"):
            df = getattr(v, attr, None)
            if df is not None:
                try:
                    df.unpersist()
                except Exception:  # noqa: BLE001 - tuple cache entries
                    pass
    cache.clear()


def run_suite(spark, entry_mod, sf_dir: str, only: set[str]) -> dict:
    _reset_caches(entry_mod)
    out = {}
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = len(df.collect())
        out[name] = {"s": round(time.perf_counter() - t0, 3), "rows": n}
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sf_scaled")
    ap.add_argument("--queries", nargs="*", default=[])
    args = ap.parse_args()

    from sphinx_1_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench-sf-scale", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    out_dir = f"{args.out}_x{args.factor}"
    build_scaled(spark, out_dir, args.factor)
    only = set(args.queries)

    # untimed warmup at sf0.001: JVM JIT + python worker pool spin-up,
    # so both timed passes measure steady state
    run_suite(spark, entry_mod, "/root/testdata/sf0.001", only)

    base = run_suite(spark, entry_mod, BASE, only)
    scaled = run_suite(spark, entry_mod, out_dir, only)
    ratio = {
        k: round(scaled[k]["s"] / base[k]["s"], 2)
        for k in base
        if k in scaled and base[k]["s"] > 0
    }
    print(
        json.dumps(
            {
                "factor": args.factor,
                "cpus": cpus,
                "base_s": {k: v["s"] for k, v in base.items()},
                "scaled_s": {k: v["s"] for k, v in scaled.items()},
                "ratio": ratio,
                "scaled_rows": {k: v["rows"] for k, v in scaled.items()},
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
