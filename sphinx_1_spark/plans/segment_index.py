"""Segment store: persisted compressed index + resumable sharded build
+ block-max WAND top-k serving.

A *segment* is the Spark analog of one immutable Sphinx index
(CSphIndex_VLN, src/sphinx.cpp:1539): parquet tables
`postings_blocks/`, `dictionary/`, `checkpoints/`, `docinfo/` plus a
`_MANIFEST.json` written last (atomic completion marker).  A *sharded
build* partitions the corpus by url hash into independent segments —
the unit of failure recovery: a killed build reruns only shards whose
manifest is missing (indexer main+delta / merge lifecycle,
src/indexer.cpp:701, reimagined as idempotent shard jobs).

Manifest carries lineage (input description, settings, seed), phase
metrics (docs, hits, blocks, wall seconds per phase) and the
docs/hits totals the dictionary needs for IDF (index stats in the
.sph header, src/sphinx.cpp:7673).

Query path: `SegmentSet` unions shards (docid spaces are disjoint by
construction) and serves:
  * full-fidelity MATCH queries by decoding postings into the
    standard compile pipeline (plans/compiler.py);
  * `wand_topk` — BM25 top-k with two-phase block-max pruning:
      phase 1: rank blocks by idf-weighted max_impact, decode a seed
               set, score exactly -> threshold theta = k-th score;
      phase 2: decode only blocks whose upper bound could beat theta
               (for AND: sum of per-term bounds; conservative and
               exact).
    Both phases touch block *metadata* via Parquet column pruning —
    the payload bytes of pruned blocks are never read.
"""

from __future__ import annotations

import json
import math
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sphinx_1_spark.plans.attrs import docid_ord

from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings
from sphinx_1_spark.functions.wordid import crc32_word
from sphinx_1_spark.operators.segments import (
    BLOCK_SIZE,
    build_checkpoints,
    build_dictionary_from_blocks,
    decode_blocks,
    encode_blocks,
)
from sphinx_1_spark.plans.engine import IndexSettings, SphinxIndex

MANIFEST = "_MANIFEST.json"


def _minus(df: DataFrame, exclude: DataFrame | None) -> DataFrame:
    """Anti-join an optional docid exclusion set — no broadcast hint:
    kill-list chains are unbounded, AQE picks broadcast vs shuffle."""
    if exclude is None:
        return df
    return df.join(exclude.select("docid"), "docid", "left_anti")


# ----------------------------------------------------------------------
def write_segment(
    spark: SparkSession,
    path: str,
    blocks: DataFrame,
    docinfo: DataFrame,
    lineage: dict,
    with_positions: bool = True,
) -> dict:
    """Write one segment; manifest last (completion marker)."""
    t0 = time.perf_counter()
    blocks.write.mode("overwrite").parquet(os.path.join(path, "postings_blocks"))
    t_blocks = time.perf_counter() - t0

    blocks_r = spark.read.parquet(os.path.join(path, "postings_blocks"))
    t0 = time.perf_counter()
    dictionary = build_dictionary_from_blocks(blocks_r)
    # wordid-sorted (the .spi layout): serving filters the dictionary
    # by wordid (wand_topk term lookup), so row-group min/max skip
    dictionary = dictionary.sort("wordid", "word")
    dictionary.write.mode("overwrite").parquet(os.path.join(path, "dictionary"))
    dict_r = spark.read.parquet(os.path.join(path, "dictionary"))
    build_checkpoints(dict_r).write.mode("overwrite").parquet(
        os.path.join(path, "checkpoints")
    )
    t_dict = time.perf_counter() - t0

    t0 = time.perf_counter()
    # docid-sorted, like the reference's docinfo external sort
    # (src/sphinx.cpp:9374-9658): parquet row-group min/max stats then
    # skip row groups on docid point-lookups and killlist probes — the
    # FindDocinfo binary search / 128-row zone map analog for free
    docinfo.sort("docid").write.mode("overwrite").parquet(
        os.path.join(path, "docinfo")
    )
    t_docinfo = time.perf_counter() - t0

    stats = spark.read.parquet(os.path.join(path, "docinfo")).count()
    agg = dict_r.agg(
        F.count(F.lit(1)).alias("words"),
        F.sum("docs").alias("postings"),
        F.sum("hits").alias("hits"),
        F.sum("nblocks").alias("blocks"),
    ).collect()[0]
    manifest = {
        "version": 1,
        "status": "complete",
        "with_positions": with_positions,
        "n_docs": stats,
        "n_words": int(agg["words"] or 0),
        "n_postings": int(agg["postings"] or 0),
        "n_hits": int(agg["hits"] or 0),
        "n_blocks": int(agg["blocks"] or 0),
        "metrics": {
            "encode_write_s": round(t_blocks, 3),
            "dictionary_s": round(t_dict, 3),
            "docinfo_s": round(t_docinfo, 3),
        },
        "lineage": lineage,
    }
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return manifest


def segment_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, MANIFEST))


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


# ----------------------------------------------------------------------
def build_segments(
    pages: DataFrame,
    out_dir: str,
    n_shards: int = 4,
    tokenizer: TokenizerSettings | None = None,
    with_positions: bool = True,
    docid_mode: str = "fingerprint",
    lineage_extra: dict | None = None,
    encode_partitions: int | None = None,
    combine: str = "runs",
) -> list[str]:
    """Resumable sharded build: shard i <- urls with xxhash64(url)%n == i.

    Already-complete shards (manifest present) are skipped, so a killed
    job resumes mid-build by re-invoking with the same arguments.

    combine="runs" (default): map-side run combine — the tokenizer
    stage emits packed per-(batch, word) entry runs and the reduce
    merges them into blocks (~40x fewer rows over the JVM<->Python
    Arrow boundary, which profiling showed IS the build wall; also
    the reference's own sort-chunks-then-merge shape,
    src/sphinx.cpp:9210).  combine="hits" keeps the raw-hit
    sort-shuffle whose block stream is byte-deterministic given
    encode_partitions alone (the runs path is deterministic given the
    input split layout — same-session rebuild/resume identical)."""
    from sphinx_1_spark.plans.pipeline import assign_docids

    if combine not in ("runs", "hits"):
        # a typo must not silently select the legacy hits build AND
        # record the bogus mode in lineage (the evidence trail would
        # then claim a combine that never executed)
        raise ValueError(
            f"combine must be 'runs' or 'hits', got {combine!r}"
        )
    spark = pages.sparkSession
    tok = tokenizer or TokenizerSettings(ngram_chars="U+4E00..U+9FBF")
    paths = []
    shard_col = F.pmod(F.xxhash64(F.col("url")), F.lit(n_shards))
    for shard in range(n_shards):
        path = os.path.join(out_dir, f"shard={shard:05d}")
        paths.append(path)
        if segment_complete(path):
            continue
        t0 = time.perf_counter()
        sub = pages.where(shard_col == shard)
        docs = assign_docids(sub, docid_mode)
        docinfo = docs.select("docid", "url", "warc_ts", "lang")
        # encode_partitions: pass an explicit value (sized from data
        # volume, e.g. hits_bytes/128MB) to make the emitted block
        # stream byte-identical regardless of cluster size; None
        # derives it from the session's parallelism
        if combine == "runs":
            from sphinx_1_spark.operators.hits import build_runs_fused
            from sphinx_1_spark.operators.segments import (
                encode_blocks_from_runs,
            )

            # each (word, grp) reduce key merges <=~64 map runs: head
            # terms spread over n_groups keys, tail words pay at most
            # n_groups extra blocks
            n_in = docs.rdd.getNumPartitions()
            n_groups = max(1, n_in // 64)
            runs = build_runs_fused(
                docs, "docid", "html", tok, n_groups=n_groups
            )
            blocks = encode_blocks_from_runs(
                runs,
                with_positions=with_positions,
                num_partitions=encode_partitions,
            )
        else:
            from sphinx_1_spark.operators.hits import build_hits_fused
            from sphinx_1_spark.operators.segments import (
                encode_blocks_from_hits,
            )

            hits = build_hits_fused(docs, "docid", "html", tok)
            blocks = encode_blocks_from_hits(
                hits,
                with_positions=with_positions,
                num_partitions=encode_partitions,
            )
        lineage = {
            "shard": shard,
            "n_shards": n_shards,
            "docid_mode": docid_mode,
            "combine": combine,
            "tokenizer": {
                "ngram_chars": tok.ngram_chars,
                "mmseg_dict": tok.mmseg_dict_path,
            },
            "build_wall_s": None,
            **(lineage_extra or {}),
        }
        m = write_segment(spark, path, blocks, docinfo, lineage, with_positions)
        m["lineage"]["build_wall_s"] = round(time.perf_counter() - t0, 3)
        # same temp+rename protocol as write_segment: a kill between
        # truncate and dump must not leave a corrupt completion marker
        # that resume would trust forever
        tmp = os.path.join(path, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2)
        os.replace(tmp, os.path.join(path, MANIFEST))
    return paths


def stopword_builder_settings(settings: TokenizerSettings) -> TokenizerSettings:
    """The --buildstops tokenization contract: the reference swaps the
    index dict for CSphStopwordBuilderDict (src/indexer.cpp:173-211,
    wired at :923-932), whose LoadStopwords/LoadWordforms/SetMorphology
    are no-ops and GetMultiWordforms returns NULL — so every DICT-level
    transform is off while TOKENIZER-level behavior (charset folding,
    min_word_len, synonyms, CJK segmentation, ignore_chars, boundaries)
    stays the index's own.  index_exact_words is dict-level too (the
    "=raw" twin hits come from GetWordIDNonStemmed): off."""
    import dataclasses

    return dataclasses.replace(
        settings,
        stopwords=frozenset(),
        wordforms=(),
        morphology=(),
        multiforms=(),
        index_exact_words=False,
    )


def build_stopwords(
    pages: DataFrame,
    settings: TokenizerSettings | None = None,
    *,
    top_n: int = 100,
    text_col: str | None = None,
    html_col: str = "html",
    with_docs: bool = False,
    remove_elements: str = "script, style",
    index_attrs: dict[str, list[str]] | None = None,
) -> DataFrame:
    """indexer --buildstops <out> <N> (src/indexer.cpp:911-932): run
    the source pipeline, count every token the dict would see, return
    the N most frequent as candidate stopwords.

    Counts are over RAW tokenized words — stopwords/wordforms/
    morphology/multiforms deliberately NOT applied (the builder dict's
    no-op overrides, see stopword_builder_settings).  Returns
    (word, freq[, docs]) ordered freq DESC, word ASC.  The reference
    sorts by count only (Word_t operator<, src/indexer.cpp:167-170) and
    breaks ties in hash-iteration order — unspecified; the word ASC
    tie-break is this port's documented deterministic deviation.
    `docs` (document frequency) is optional extra observability this
    port adds for ranking diagnostics; the file writer never emits it.

    Scale shape: one Arrow map stage emits per-batch PARTIAL counts
    (map-side combine in numpy — the shuffle carries one row per
    distinct word per batch, not per occurrence), one groupBy("word")
    sum-shuffle, then TakeOrdered(top_n).  At 10^12 docs the shuffle
    volume is bounded by batches x vocabulary, and the head term's
    partials spread across all map tasks — no skewed reduce key ever
    sees more than one row per map batch."""
    tok_settings = stopword_builder_settings(
        settings or TokenizerSettings(ngram_chars="U+4E00..U+9FBF")
    )
    if text_col is not None:
        proj = pages.select(F.col(text_col).alias("payload"))
        is_html = False
    else:
        proj = pages.select(F.col(html_col).alias("payload"))
        is_html = True
    attrs_cfg = index_attrs if index_attrs is not None else {"img": ["alt"]}
    cfg = (remove_elements, tuple(sorted((k, tuple(v)) for k, v in attrs_cfg.items())))

    out_schema = (
        "word string, freq long, docs long" if with_docs else "word string, freq long"
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        from sphinx_1_spark.functions.tokenizer import Tokenizer

        stripper = None
        if is_html:
            from sphinx_1_spark.functions.stripper import HtmlStripper

            stripper = HtmlStripper(cfg[0], {k: list(v) for k, v in cfg[1]})
        tok = Tokenizer(tok_settings)
        for pdf in batches:
            words: list[str] = []
            ndoc: list[int] = []  # tokens per doc (with_docs segmenting)
            for payload in pdf["payload"].tolist():
                if payload is None:
                    continue
                text = (
                    stripper.strip(bytes(payload)).decode("utf-8", "replace")
                    if stripper is not None
                    else payload
                )
                toks = tok.tokenize(text)
                if toks:
                    words.extend(toks)
                    ndoc.append(len(toks))
            if not words:
                continue
            w = np.asarray(words, dtype=object)
            uw, winv = np.unique(w, return_inverse=True)
            freq = np.bincount(winv, minlength=uw.size)
            cols = {"word": uw, "freq": freq.astype(np.int64)}
            if with_docs:
                # distinct (doc, word) pairs inside the batch: docs are
                # whole rows, so per-batch doc counts sum globally
                did = np.repeat(np.arange(len(ndoc), dtype=np.int64), ndoc)
                pair = did * uw.size + winv
                uniq_words = np.unique(pair) % uw.size
                cols["docs"] = np.bincount(
                    uniq_words, minlength=uw.size
                ).astype(np.int64)
            yield pd.DataFrame(cols)

    partials = proj.mapInPandas(gen, schema=out_schema)
    aggs = [F.sum("freq").alias("freq")]
    if with_docs:
        aggs.append(F.sum("docs").alias("docs"))
    return (
        partials.groupBy("word")
        .agg(*aggs)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(int(top_n))
    )


def save_stopwords(df: DataFrame, path: str, with_freqs: bool = False) -> int:
    """CSphStopwordBuilderDict::Save (src/indexer.cpp:213-245): write
    the top words one per line; with --buildfreqs each line is
    "word count".  The input is the (already top_n-limited) frame from
    build_stopwords — a bounded driver-side collect by construction.
    Returns the number of lines written.  Same temp+rename protocol as
    the segment manifest so a kill can't leave a truncated file."""
    rows = df.select("word", "freq").collect()
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(f"{r['word']} {r['freq']}\n" if with_freqs else f"{r['word']}\n")
    os.replace(tmp, path)
    return len(rows)


# ----------------------------------------------------------------------
class SegmentSet:
    """Union of complete segments served as one logical index
    (multi-index union semantics, searchd RunSubset
    src/searchd.cpp:3950; docid spaces disjoint by shard hashing)."""

    def __init__(self, spark: SparkSession, paths: list[str]):
        self.spark = spark
        self.paths = [p for p in paths if segment_complete(p)]
        if not self.paths:
            raise ValueError("no complete segments")
        self.manifests = [read_manifest(p) for p in self.paths]
        self.with_positions = self.manifests[0]["with_positions"]
        self.blocks = self._union("postings_blocks")
        self.dictionary = (
            self._union("dictionary")
            .groupBy("wordid", "word")
            .agg(
                F.sum("docs").alias("docs"),
                F.sum("hits").alias("hits"),
                F.sum("nblocks").cast("int").alias("nblocks"),
            )
        )
        self.docinfo = self._union("docinfo")
        self.n_docs = sum(m["n_docs"] for m in self.manifests)

    @classmethod
    def open(cls, spark: SparkSession, out_dir: str) -> "SegmentSet":
        shards = sorted(
            os.path.join(out_dir, d)
            for d in os.listdir(out_dir)
            if d.startswith("shard=")
        )
        return cls(spark, shards)

    def _union(self, table: str) -> DataFrame:
        dfs = [self.spark.read.parquet(os.path.join(p, table)) for p in self.paths]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    # ------------------------------------------------------------------
    def sphinx_index(
        self,
        tokenizer: TokenizerSettings | None = None,
        with_attrs: bool = False,
    ) -> SphinxIndex:
        """Full-fidelity engine over decoded postings: every MATCH
        operator / ranker works against the compressed store.

        with_attrs=True carries the segment docinfo's attribute
        columns (url, warc_ts, lang) into the served index so API
        filters / attr sorts / grouping can reference them — the
        search-CLI path (src/search.cpp binds the full .spa row).
        Default False keeps the lean docid-only docinfo for the
        MATCH/WAND serving paths that never touch attrs."""
        tok = tokenizer or TokenizerSettings(ngram_chars="U+4E00..U+9FBF")
        docinfo = (
            self.docinfo
            if with_attrs
            else self.docinfo.select(F.col("docid"))
        )
        settings = IndexSettings(
            docid_col="docid",
            fields=("text",),
            attrs=tuple(c for c in docinfo.columns if c != "docid"),
            tokenizer=tok,
            tokenizer_impl="arrow",
            with_positions=self.with_positions,
        )
        postings = decode_blocks(self.blocks, with_positions=self.with_positions)
        dictionary = self.dictionary.select("wordid", "word", "docs", "hits")
        return SphinxIndex(
            self.spark,
            settings,
            postings,
            dictionary,
            docinfo,
            self.n_docs,
        )

    # ------------------------------------------------------------------
    def _idf(self, words: list[str]) -> dict[str, tuple[float, int]]:
        distinct = list(dict.fromkeys(words))
        q = len(distinct)
        wids = [crc32_word(w) for w in distinct]
        rows = (
            self.dictionary.where(F.col("wordid").isin(wids))
            .select("word", "docs")
            .collect()
        )
        df_by_word = {r["word"]: int(r["docs"]) for r in rows}
        n = self.n_docs
        out = {}
        for w in distinct:
            dfw = df_by_word.get(w, 0)
            idf = (
                0.0
                if dfw == 0 or n == 0
                else math.log((n - dfw + 1) / dfw) / (2 * q * math.log(1 + n))
            )
            out[w] = (idf, dfw)
        return out

    def wand_topk(
        self,
        words: list[str],
        k: int = 10,
        mode: str = "and",
        exclude: DataFrame | None = None,
    ) -> DataFrame:
        """BM25 top-k over compressed blocks, decoding as little as
        possible.  Exact: never misses a true top-k doc; ties broken
        docid asc (queue comparator, src/sphinxsort.cpp:1159-1175).

        `exclude`: optional docid relation (e.g. a kill-list chain)
        anti-joined INSIDE the plan — before the top-k cut AND before
        the OR-mode theta seed, so the threshold is computed over live
        docs only (a theta seeded from excluded docs would over-prune
        blocks holding viable lower-scoring candidates).  This is what
        keeps kill-list-aware serving exact without over-fetching
        k + n_killed rows per segment.
        Scoring matches ranker="bm25" with one matched field:
        weight = int((sum_tfidf + 0.5)*1000) + 1000.

        AND — posting-list intersection with block skipping: the
        rarest term's blocks are decoded in full (it bounds the
        candidate set); every other term decodes only blocks whose
        [min_docid, max_docid] overlaps a rare-term block range — the
        block min/max plays the role of Sphinx's skip data (the .spi
        checkpoint + doclist zipper, ExtAnd_c src/sphinx.cpp:12365).

        OR — two-phase block-max pruning: seed theta with the exact
        scores from the highest-impact blocks, drop blocks whose
        idf-weighted upper bound (plus the other terms' global bounds)
        cannot beat theta, then *complete* surviving candidates'
        scores by decoding any pruned block whose range overlaps a
        candidate.  When any query-term IDF is negative (df > N/2 —
        upper bounds no longer monotone) pruning is disabled and the
        full lists are scored: still exact, never wrong.
        """
        idf = self._idf(words)
        terms = list(dict.fromkeys(words))
        wids = {w: crc32_word(w) for w in terms}
        allwids = list(wids.values())
        term_blocks = self.blocks.where(F.col("wordid").isin(allwids))

        if mode == "and":
            missing = [w for w in terms if idf[w][1] == 0]
            if missing:
                return self.spark.createDataFrame([], "docid long, weight int")
            rare = min(terms, key=lambda w: idf[w][1])
            rare_blocks = term_blocks.where(F.col("wordid") == wids[rare])
            # the rare term's block ranges stay a DataFrame (no driver
            # collect — df_rare/128 ranges could still be millions at
            # web scale); broadcast feeds the overlap semi-join
            ranges_df = rare_blocks.select(
                F.col("min_docid").alias("lo"), F.col("max_docid").alias("hi")
            )
            others = term_blocks.where(F.col("wordid") != wids[rare])
            overlapping = others.join(
                F.broadcast(ranges_df),
                (F.col("max_docid") >= F.col("lo"))
                & (F.col("min_docid") <= F.col("hi")),
                "left_semi",
            )
            survivors = rare_blocks.unionByName(overlapping)
            scored = self._score_blocks(
                survivors, terms, wids, idf, require_all=True
            )
            scored = _minus(scored, exclude)
            return (
                scored.orderBy(F.col("weight").desc(), docid_ord().asc())
                .limit(k)
            )

        # ---- OR ----
        if any(idf[w][0] < 0 for w in terms):
            scored = self._score_blocks(
                term_blocks, terms, wids, idf, require_all=False
            )
            scored = _minus(scored, exclude)
            return (
                scored.orderBy(F.col("weight").desc(), docid_ord().asc())
                .limit(k)
            )
        # phase 1: theta from highest-impact seed blocks (partial scores
        # of fully-decoded-nowhere docs are lower bounds since idfs >= 0)
        nseed = max(4, (k + BLOCK_SIZE - 1) // BLOCK_SIZE + 2)
        seed = term_blocks.orderBy(F.col("max_impact").desc()).limit(nseed)
        seeded = (
            _minus(
                self._score_blocks(seed, terms, wids, idf, require_all=False),
                exclude,
            )
            .orderBy(F.col("weight").desc())
            .limit(k)
            .collect()
        )
        if len(seeded) < k:
            theta = float("-inf")
        else:
            theta = (seeded[-1]["weight"] - 1000 - 1) / 1000.0 - 0.5

        # one aggregate for every term's global max impact (was one
        # Spark job per term)
        _gm = {
            r["wordid"]: r["m"]
            for r in term_blocks.groupBy("wordid")
            .agg(F.max("max_impact").alias("m"))
            .collect()
        }
        gmax = {w: float(_gm.get(wids[w]) or 0.0) for w in terms}
        sum_others = {
            w: sum(idf[o][0] * gmax[o] for o in terms if o != w) for w in terms
        }
        others_map = F.create_map(
            *[x for w in terms for x in (F.lit(wids[w]), F.lit(sum_others[w]))]
        )
        idf_map = F.create_map(
            *[x for w in terms for x in (F.lit(wids[w]), F.lit(idf[w][0]))]
        )
        meta = term_blocks.select(
            "wordid", "min_docid", "max_docid", "max_impact"
        ).withColumn(
            "ub", F.col("max_impact") * idf_map[F.col("wordid")]
        )
        live = meta.where(F.col("ub") + others_map[F.col("wordid")] >= F.lit(theta))
        live_keys = live.select("wordid", "min_docid")
        survivors = term_blocks.join(
            F.broadcast(live_keys), ["wordid", "min_docid"], "left_semi"
        )
        # completion: pruned blocks overlapping any surviving block's
        # docid range may still hold candidates' missing contributions
        pruned = term_blocks.join(
            F.broadcast(live_keys), ["wordid", "min_docid"], "left_anti"
        )
        live_ranges = (
            live.select(F.col("min_docid").alias("lo"), F.col("max_docid").alias("hi"))
            .distinct()
        )
        completing = pruned.join(
            F.broadcast(live_ranges),
            (F.col("max_docid") >= F.col("lo")) & (F.col("min_docid") <= F.col("hi")),
            "left_semi",
        )
        full = survivors.unionByName(completing)
        scored = _minus(
            self._score_blocks(full, terms, wids, idf, require_all=False),
            exclude,
        )
        return (
            scored
            .where(F.col("weight") >= F.lit(int((theta + 0.5) * 1000) + 1000)
                   if theta != float("-inf") else F.lit(True))
            .orderBy(F.col("weight").desc(), docid_ord().asc())
            .limit(k)
        )

    def _score_blocks(
        self, blocks, terms, wids, idf, require_all: bool
    ) -> DataFrame:
        decoded = decode_blocks(blocks, with_positions=False)
        idf_map = F.create_map(
            *[x for w in terms for x in (F.lit(wids[w]), F.lit(idf[w][0]))]
        )
        scored = decoded.withColumn("idf", idf_map[F.col("wordid")]).withColumn(
            "tfidf", F.col("tf") / (F.col("tf") + F.lit(1.2)) * F.col("idf")
        )
        agg = scored.groupBy("docid").agg(
            F.sum("tfidf").alias("tfidf"),
            F.countDistinct("wordid").alias("nterms"),
        )
        if require_all:
            agg = agg.where(F.col("nterms") == len(terms))
        weight = (
            F.floor((F.col("tfidf") + F.lit(0.5)) * F.lit(1000)).cast("int")
            + F.lit(1000)
        )
        return agg.select("docid", weight.alias("weight"))
