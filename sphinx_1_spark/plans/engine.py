"""SphinxIndex — the engine facade: build an inverted index from a
DataFrame of documents, serve BM25 top-k MATCH queries.

Maps the reference lifecycle (indexer DoIndex src/indexer.cpp:701 ->
CSphIndex_VLN::Build src/sphinx.cpp:8788; searchd MultiQuery
src/sphinx.cpp:16262) onto declarative Spark plans:
  build: docs -> hits (tokenizer) -> postings/dictionary/docinfo
         (sort-shuffle aggregation = Sphinx's external hit sort)
  search: parse MATCH -> compile DataFrame plan -> rank -> attribute
          filters -> ORDER BY weight DESC, docid ASC LIMIT k
          (TakeOrderedAndProject = Sphinx's bounded match queue,
          src/sphinxsort.cpp:105-203, tiebreak :1159-1175)
"""

from __future__ import annotations

import dataclasses
import math
import re
from dataclasses import dataclass, field as dc_field

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings
from sphinx_1_spark.functions.wordid import crc32_col, fnv64_col, word_id
from sphinx_1_spark.operators.hits import build_hits_arrow, build_hits_native
from sphinx_1_spark.operators.postings import (
    build_dictionary,
    build_postings,
    build_vocab,
)
from sphinx_1_spark.operators.ranker import apply_ranker
from sphinx_1_spark.plans.compiler import CompileContext, compile_node
from sphinx_1_spark.plans.parser import QueryParser, XQNode, collect_words

MAX_MATCHES_DEFAULT = 1000  # src/sphinx.h:1693


@dataclass
class IndexSettings:
    docid_col: str = "docid"
    fields: tuple[str, ...] = ("text",)
    attrs: tuple[str, ...] = ()
    tokenizer: TokenizerSettings = dc_field(default_factory=TokenizerSettings)
    # "native" = pure-Catalyst ASCII tokenizer (fast path, equivalent to
    # the default charset_table on ASCII text); "arrow" = full-fidelity
    # pandas-UDF tokenizer (charset folding, CJK, stopwords).
    tokenizer_impl: str = "native"
    with_positions: bool = True
    # "crc32" = 32-bit wordids (default build); "fnv64" = FNV-1a 64
    # wordids (--enable-id64 parity, src/sphinx.cpp:16658-16671) --
    # needed when the dictionary is big enough for CRC32 collisions.
    wordid: str = "crc32"
    # enable_star: star-syntax dict at query time (SetupStarDict,
    # src/sphinx.cpp:16026-16052).  With prefix/infix indexing and
    # enable_star=False, query words match indexed substrings
    # IMPLICITLY (the legacy behavior: expansions share the plain
    # CRC namespace) and '*' folds away as a separator.  sphinx.conf
    # defaults this to 0; our API defaults to True since star syntax
    # is the common case -- the config-driven build maps an absent
    # enable_star to 0.
    enable_star: bool = True
    # prefix_fields / infix_fields: per-field wordpart lists
    # (src/sphinx.cpp:19158-19171); empty tuple = all fields
    # (IsFieldInStr with an empty list matches everything).
    prefix_fields: tuple[str, ...] = ()
    infix_fields: tuple[str, ...] = ()

    def __post_init__(self):
        # SPH_MAX_FIELDS=32 (src/sphinx.h:147), enforced like the
        # reference's source setup (src/sphinx.cpp:19238-19240) — the
        # packed hit format (field<<24) and the 32-bit query field
        # mask (ALL_FIELDS=0xFFFFFFFF) both assume field ids < 32, so
        # a larger schema must fail loudly, not corrupt masks.
        if len(self.fields) > 32:
            raise ValueError(
                f"too many fields (fields={len(self.fields)}, max=32)"
            )

    def wordparts(self) -> list[str]:
        """Per-field expansion kind (SPH_WORDPART, src/sphinx.h:
        789-792): prefix/infix iff the matching min len is set AND the
        field is listed (or the list is empty)."""
        tk = self.tokenizer
        out = []
        for f in self.fields:
            pref = tk.min_prefix_len > 0 and (
                not self.prefix_fields or f in self.prefix_fields
            )
            inf = tk.min_infix_len > 0 and (
                not self.infix_fields or f in self.infix_fields
            )
            if pref and inf:
                raise ValueError(
                    f"field '{f}' is marked for both infix and prefix"
                    " indexing"
                )
            out.append("infix" if inf else "prefix" if pref else "whole")
        return out


class SphinxIndex:
    def __init__(
        self,
        spark: SparkSession,
        settings: IndexSettings,
        postings: DataFrame,
        dictionary: DataFrame,
        docinfo: DataFrame,
        n_docs: int,
    ):
        self.spark = spark
        self.settings = settings
        self.postings = postings
        self.dictionary = dictionary
        self.docinfo = docinfo
        self.n_docs = n_docs
        self._tokenizer = Tokenizer(settings.tokenizer)
        tk = settings.tokenizer
        # V8 star dict dispatch checks infixes FIRST (m_bInfixes,
        # src/sphinx.cpp:10705); installed only when enable_star
        # (SetupStarDict, src/sphinx.cpp:16030-16035)
        star_mode = "none"
        if settings.enable_star:
            if tk.min_infix_len:
                star_mode = "infix"
            elif tk.min_prefix_len:
                star_mode = "prefix"
        self._parser = QueryParser(
            self._tokenizer, list(settings.fields), star_mode=star_mode
        )

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls, df: DataFrame, settings: IndexSettings, persist: bool = False
    ) -> "SphinxIndex":
        """persist=True caches the hit relation so postings/dictionary
        aggregations (and subsequent query-time term scans) reuse one
        strip+tokenize pass instead of recomputing the lineage — the
        in-memory analog of the segment store's write-then-read.  The
        narrow fixed-width hits rows cache ~6x faster than the
        array-typed postings rows."""
        spark = df.sparkSession
        tk0 = settings.tokenizer
        if (
            (tk0.min_prefix_len > 0 or tk0.min_infix_len > 0)
            and not settings.enable_star
            and any(m and m != "none" for m in tk0.morphology)
        ):
            # "ERROR: index '%s': infixes and morphology are enabled,
            # enable_star=0" (src/indexer.cpp:727-736): without star
            # syntax, morphed full words and raw substrings share one
            # namespace and queries can't tell them apart
            raise ValueError(
                "infixes and morphology are enabled, enable_star=0"
            )
        # Tokenize parallelism must not be bound by the source file
        # layout: a small parquet (or one huge row-group) arrives as a
        # handful of partitions and would serialize the whole
        # strip+tokenize+aggregate chain onto as many cores.  Fan out
        # to the cluster's parallelism when the scan is narrower; wide
        # scans (big data) keep their natural splits — no extra pass.
        parallelism = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < parallelism:
            df = df.repartition(parallelism)
        # prefix/infix expansion is handled natively (a second narrow
        # explode), so it does not disqualify the Catalyst fast path —
        # but per-field wordpart mixes and mixed prefix+infix configs
        # fall back to the arrow tokenizer
        tk = settings.tokenizer
        wordparts = settings.wordparts()
        native_ok = (
            dataclasses.replace(tk, min_prefix_len=0, min_infix_len=0)
            == TokenizerSettings()
            and len(set(wordparts)) == 1
            and not (tk.min_prefix_len and tk.min_infix_len)
        )
        if settings.tokenizer_impl == "native" and native_ok:
            hits = build_hits_native(
                df,
                settings.docid_col,
                list(settings.fields),
                min_prefix_len=tk.min_prefix_len,
                min_infix_len=tk.min_infix_len,
                wordpart=wordparts[0] if wordparts else "whole",
            )
        else:
            hits = build_hits_arrow(
                df,
                settings.docid_col,
                list(settings.fields),
                settings.tokenizer,
                wordparts=wordparts,
            )
        # MVA values are stored sorted ascending per doc in unsigned-
        # DWORD order (BuildMVA's (docid, attr, value) external sort,
        # MvaEntry_t::operator< src/sphinx.cpp:8119-8124) — filters
        # binary-search the sorted list and results echo that order
        dtypes = dict(df.dtypes)
        def _attr_col(a: str):
            c = F.col(a)
            if dtypes.get(a, "").startswith("array"):
                u = lambda x: x.cast("long").bitwiseAND(0xFFFFFFFF)
                c = F.array_sort(
                    c,
                    lambda x, y: F.when(u(x) < u(y), -1)
                    .when(u(x) > u(y), 1)
                    .otherwise(0),
                )
            return c.alias(a)
        docinfo = df.select(
            F.col(settings.docid_col).cast("long").alias("docid"),
            *[_attr_col(a) for a in settings.attrs],
        )
        return cls.from_hits(hits, docinfo, settings, persist=persist)

    @classmethod
    def from_hits(
        cls,
        hits: DataFrame,
        docinfo: DataFrame,
        settings: IndexSettings,
        persist: bool = False,
    ) -> "SphinxIndex":
        """Assemble an index from a prebuilt hit relation (e.g. the
        fused strip+tokenize pages path, build_hits_fused)."""
        spark = hits.sparkSession
        if persist:
            hits = hits.persist()
        postings = build_postings(
            hits,
            with_positions=settings.with_positions,
            wordid_impl=settings.wordid,
        )
        dictionary = build_dictionary(postings)
        n_docs = docinfo.count()
        return cls(spark, settings, postings, dictionary, docinfo, n_docs)

    @classmethod
    def merge(
        cls,
        dst: "SphinxIndex",
        src: "SphinxIndex",
        dst_filter=None,
        src_kill: list[int] | None = None,
    ) -> "SphinxIndex":
        """indexer --merge DST SRC (CSphIndex_VLN::Merge,
        src/sphinx.cpp:9976): DST rows pass the optional
        --merge-dst-range filter and SRC's kill-list; SRC rows always
        carry over.  A docid present in BOTH doclists keeps BOTH hit
        streams, merge-sorted per word — the reference's doclist merge
        concatenates same-docid entries so their positions interleave
        ('merge vs hit mixing', test/test_78: 'aaa' ends with docs=1
        hits=3 after merging two one-doc indexes sharing the docid).
        Header totals sum the surviving row counts (both same-docid
        rows are written by the spa merge loop), while the dictionary
        re-derives docs/hits from the merged postings."""
        dst_info = dst.docinfo
        if dst_filter is not None:
            dst_info = dst_info.where(dst_filter)
        if src_kill:
            dst_info = dst_info.where(~F.col("docid").isin(src_kill))
        keep = dst_info.select("docid").distinct()
        # no forced broadcast: `keep` is the ENTIRE surviving dst docid
        # set — at a 100M-doc dst a mandatory hint would materialize it
        # on the driver (the exact cliff the kill-list anti-join
        # documents avoiding); AQE broadcasts it while small and falls
        # back to a shuffled semi-join past driver-buildable size
        dst_post = dst.postings.join(keep, "docid", "left_semi")
        merged = dst_post.unionByName(src.postings)
        aggs = [
            F.sum("tf").cast("int").alias("tf"),
            F.bit_or("fieldmask").cast("int").alias("fieldmask"),
        ]
        if "positions" in merged.columns:
            # identical hit entries from both sides collapse — the
            # merged doclist never double-decodes one (word, docid,
            # pos) ('no double-delta decoding', test/test_61: the
            # shared doc keeps weight 1, while distinct positions
            # interleave, test/test_78)
            aggs.append(
                F.array_sort(
                    F.array_distinct(
                        F.flatten(F.collect_list("positions"))
                    )
                ).alias("positions")
            )
        postings = (
            merged.groupBy("word", "docid")
            .agg(*aggs)
            .withColumn(
                "wordid",
                (fnv64_col if dst.settings.wordid == "fnv64" else crc32_col)(
                    F.col("word")
                ),
            )
        )
        if "positions" in merged.columns:
            postings = postings.withColumn("tf", F.size("positions"))
        dictionary = build_dictionary(postings)
        # src attrs win for duplicated docids (delta supersedes), but
        # the document total counts both surviving rows
        n_docs = dst_info.count() + src.docinfo.count()
        docinfo = (
            src.docinfo.withColumn("_prio", F.lit(0))
            .unionByName(dst_info.withColumn("_prio", F.lit(1)))
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("docid").orderBy("_prio")
                ),
            )
            .where(F.col("_rn") == 1)
            .drop("_prio", "_rn")
        )
        return cls(
            dst.spark, dst.settings, postings, dictionary, docinfo, n_docs
        )

    def persist(self) -> "SphinxIndex":
        """Cache index tables for repeated serving (Sphinx preread,
        src/sphinx.cpp:15534 — here just Spark storage-level caching)."""
        self.postings = self.postings.persist()
        self.dictionary = self.dictionary.persist()
        self.docinfo = self.docinfo.persist()
        self.postings.count()
        return self

    # ------------------------------------------------------------------
    def _compute_idf(
        self, words: list[str], float32: bool
    ) -> tuple[dict[str, float], dict[str, tuple[int, int]]]:
        """Per-query-term IDF + (docs, hits) stats.

        idf = log((N-df+1)/df) / (2*q*log(1+N)), q = #distinct terms,
        zero when df == 0 (src/sphinx.cpp:14662-14670; float32 there).
        """
        distinct = list(dict.fromkeys(words))
        q = len(distinct)
        wids = [word_id(w, self.settings.wordid) for w in distinct]
        rows = (
            self.dictionary.where(F.col("wordid").isin(wids))
            .select("word", "docs", "hits")
            .collect()
        )
        stats = {r["word"]: (int(r["docs"]), int(r["hits"])) for r in rows}
        n = self.n_docs
        idf: dict[str, float] = {}
        for w in distinct:
            df_, _ = stats.get(w, (0, 0))
            if df_ == 0 or n == 0:
                idf[w] = 0.0
            elif float32:
                log_total = np.float32(np.log(np.float32(1 + n)))
                num = np.float32(np.log(np.float32(n - df_ + 1) / np.float32(df_)))
                idf[w] = float(np.float32(num / np.float32(2 * q * log_total)))
            else:
                idf[w] = math.log((n - df_ + 1) / df_) / (2 * q * math.log(1 + n))
        return idf, {w: stats.get(w, (0, 0)) for w in distinct}

    # ------------------------------------------------------------------
    def check_query_words(self, match: str) -> str | None:
        """CheckQueryWord (src/sphinx.cpp:14790-14807): on a
        prefix/infix-enabled index, a starred query word whose core is
        shorter than the configured minimum sets the result warning
        (infix checked before prefix; later words overwrite —
        SetSprintf semantics). The query still runs."""
        tk = self.settings.tokenizer
        if not (tk.min_prefix_len or tk.min_infix_len):
            return None
        warning = None
        for m in re.finditer(r"\*?[0-9a-zA-Z_]+\*?", match):
            w = m.group(0)
            head, tail = w.startswith("*"), w.endswith("*")
            if not (head or tail):
                continue
            core_len = len(w) - (1 if head else 0) - (1 if tail else 0)
            if tk.min_infix_len and core_len < tk.min_infix_len:
                warning = (
                    "Query word length is less than min infix length."
                    f" word: '{w}' "
                )
            elif tk.min_prefix_len and core_len < tk.min_prefix_len:
                warning = (
                    "Query word length is less than min prefix length."
                    f" word: '{w}' "
                )
        return warning

    def parse(self, match: str, mode: str = "extended2") -> XQNode:
        """Legacy match modes are rewritten to extended syntax
        (PrepareQueryEmulation, src/sphinx.cpp:16179-16213).

        '*' handling is reference-faithful: on a star-enabled
        prefix/infix index the parser compiles each star shape to one
        mangled-entry lookup; everywhere else the tokenizer folds '*'
        away as a separator (no star dict installed — SetupStarDict,
        src/sphinx.cpp:16030-16035)."""
        if mode in ("extended", "extended2"):
            return self._parser.parse(match)
        if mode == "all":
            return self._parser.parse(self._escape(match))
        if mode == "phrase":
            return self._parser.parse('"' + self._escape(match) + '"')
        if mode == "boolean":
            return self._parser.parse(match)
        if mode == "any":
            # '"<escaped>"/1' — the reference ALWAYS wraps, even for
            # one word or an empty query (the quorum of one degrades
            # to the plain term, the empty phrase to match-nothing)
            return self._parser.parse('"' + self._escape(match) + '"/1')
        raise ValueError(f"unknown match mode {mode!r}")

    @staticmethod
    def _escape(q: str) -> str:
        r"""PrepareQueryEmulation's escape (src/sphinx.cpp:16196-16204):
        a BACKSLASH before each of ()|-!@~"&/<\ — the escaped-query
        tokenizer then demotes each per Special2Simple, so a word-part
        char stays IN the word ('run-ning' remains one token when '-'
        is in the charset; a space-replacement would split it).  The
        set deliberately EXCLUDES ^, $ and = — field-start/end anchors
        and exact-form markers stay LIVE operators in emulated legacy
        queries ('^fast' in ALL mode anchors, verified against the
        compiled reference), and also excludes '*' so star expansion
        stays live on star dicts."""
        out = []
        for c in q:
            if c in '()|-!@~"&/<\\':
                out.append("\\")
            out.append(c)
        return "".join(out)

    @staticmethod
    def default_ranker(mode: str, ranker: str | None) -> str:
        # EVERY legacy mode FORCES its ranker, even over an explicit
        # SetRankingMode: PrepareQueryEmulation overwrites m_eRanker
        # unconditionally (boolean -> NONE at src/sphinx.cpp:
        # 16180-16181; ALL -> PROXIMITY, ANY -> MATCHANY, PHRASE ->
        # PROXIMITY in the mode switch at :16205-16210).  Only
        # extended2/fullscan honor the client's ranker — a random
        # live-API differential caught us honoring it in ALL mode.
        if mode == "boolean":
            return "none"
        if mode in ("all", "phrase"):
            return "proximity"
        if mode == "any":
            return "matchany"
        if ranker:
            return ranker
        return "proximity_bm25"

    # ------------------------------------------------------------------
    def match(
        self,
        match: str,
        mode: str = "extended2",
        need_hits: bool = False,
        score_mode: str = "fast64",
    ) -> tuple[DataFrame, dict]:
        """Match documents without ranking: returns the compiled plan
        DataFrame (docid, tfidf, fieldmask, tfs[, hits]) + query meta."""
        tree = self.parse(match, mode)
        words = collect_words(tree)
        seen_words: set[str] = set()
        for w in words:
            w.dup = w.word in seen_words
            seen_words.add(w.word)
        idf, raw_stats = self._compute_idf(
            [w.word for w in words], float32=(score_mode == "exact32")
        )
        # word-stats keys are the DISPLAY form (m_sDictWord — stemmed,
        # stars as typed, no magic markers; src/sphinx.cpp:11628-11631,
        # 14674-14686); lookups/IDF stay keyed by the mangled entry
        stats = {}
        for w in words:
            stats.setdefault(
                w.display or w.word, raw_stats.get(w.word, (0, 0))
            )
        if getattr(tree, "stats_words", None):
            # relaxed-deleted terms: dictionary stats still reported,
            # but no IDF contribution and no match (see XQNode)
            _, extra = self._compute_idf(
                [w.word for w in tree.stats_words], float32=False
            )
            for w in tree.stats_words:
                stats.setdefault(
                    w.display or w.word, extra.get(w.word, (0, 0))
                )
        ctx = CompileContext(
            self.postings,
            idf,
            need_hits=need_hits,
            n_fields=len(self.settings.fields),
            wordid_impl=self.settings.wordid,
        )
        plan = compile_node(tree, ctx)
        idf_by_qpos = {
            w.querypos: (0.0 if w.dup else idf.get(w.word, 0.0))
            for w in words
        }
        meta = {
            "idf": idf,
            "stats": stats,
            "idf_by_qpos": idf_by_qpos,
            # unique query words (the reference's m_uQWords hash size)
            "n_uwords": len({w.word for w in words}),
        }
        return plan, meta

    def search(
        self,
        match: str,
        mode: str = "extended2",
        ranker: str | None = None,
        limit: int = 20,
        offset: int = 0,
        filters: list[Column] | None = None,
        late_filters: list[Column] | None = None,
        field_weights: list[int] | None = None,
        score_mode: str = "fast64",
        with_attrs: bool = False,
        max_matches: int = MAX_MATCHES_DEFAULT,
        sorted_output: bool = True,
    ) -> DataFrame:
        """Top-k search: (docid, weight) ordered by weight desc, docid
        asc (queue comparator MatchRelevanceLt, sphinxsort.cpp:1159).

        sorted_output=False skips the final ORDER BY + LIMIT — for
        callers (SphinxQL, grouping) that re-sort downstream anyway:
        an unbounded TakeOrderedAndProject over every match is a
        cluster-scale anti-pattern when the caller's own sort
        supersedes it."""
        out, _ = self._ranked(
            match, mode, ranker, filters, late_filters, field_weights,
            score_mode, with_attrs,
        )
        if not sorted_output:
            return out
        out = out.orderBy(F.col("weight").desc(),
                F.col("docid").bitwiseXOR(F.lit(-(1 << 63))).asc())
        # the bounded-queue window: ranks past max_matches do not
        # exist (searchd CheckQuery rejects offset>=max_matches; here
        # the page just truncates to the queue)
        k = max(0, min(offset + limit, max_matches) - offset)
        if offset:
            out = out.offset(offset)
        return out.limit(k)

    # ------------------------------------------------------------------
    def _ranked(
        self,
        match: str,
        mode: str = "extended2",
        ranker: str | None = None,
        filters: list[Column] | None = None,
        late_filters: list[Column] | None = None,
        field_weights: list[int] | None = None,
        score_mode: str = "fast64",
        with_attrs: bool = False,
    ) -> tuple[DataFrame, dict]:
        """Compiled + ranked + filtered (but unsorted) match relation,
        plus the query meta (per-term stats / IDF)."""
        ranker = self.default_ranker(mode, ranker)
        need_hits = ranker in (
            "proximity_bm25", "proximity_bm25_linear", "proximity",
            "wordcount", "matchany",
        )
        plan, meta = self.match(match, mode, need_hits, score_mode)
        # BindWeights (src/sphinx.cpp:14574-14595): every field
        # defaults to 1, then Min(nfields, provided) entries are
        # copied and floored at 1 — a SHORT list leaves the remaining
        # fields at 1 (not 0), extras are ignored
        n_fields = len(self.settings.fields)
        weights = list(field_weights or [])[:n_fields]
        weights += [1] * (n_fields - len(weights))
        weights = [max(1, w) for w in weights]
        ranked = apply_ranker(
            plan, ranker, weights, score_mode, meta["idf_by_qpos"],
            n_uwords=meta.get("n_uwords"),
        )
        if filters or with_attrs or self.settings.attrs:
            ranked = ranked.join(self.docinfo, "docid", "inner")
            for flt in filters or []:
                ranked = ranked.where(flt)
        for flt in late_filters or []:
            ranked = ranked.where(flt)
        cols = ["docid", "weight"] + (
            list(self.settings.attrs) if with_attrs else []
        )
        return ranked.select(*cols), meta

    def search_with_meta(
        self,
        match: str,
        limit: int = 20,
        offset: int = 0,
        max_matches: int = MAX_MATCHES_DEFAULT,
        **kwargs,
    ) -> tuple[list, dict]:
        """Query + SHOW META-style result stats (CSphQueryResult,
        src/sphinx.h:1752-1792: matches, total, total_found, time,
        per-term (docs, hits) stats).

        total = min(total_found, max_matches): the match queue length
        (m_dMatches.GetLength(), searchd.cpp:5756) — limit/offset bound
        only the returned rows, never `total`.  total_found counts the
        full filtered match set (m_iTotalMatches)."""
        import time as _time

        t0 = _time.perf_counter()
        ranked, meta = self._ranked(match, **kwargs)
        ranked = ranked.cache()
        try:
            total_found = ranked.count()
            out = ranked.orderBy(
                F.col("weight").desc(),
                F.col("docid").bitwiseXOR(F.lit(-(1 << 63))).asc()
            )
            if offset:
                out = out.offset(offset)
            # truncate the page to the bounded-queue window (see search)
            k = max(0, min(offset + limit, max_matches) - offset)
            rows = out.limit(k).collect()
        finally:
            ranked.unpersist()
        elapsed = _time.perf_counter() - t0
        return rows, {
            "total": min(total_found, max_matches),
            "total_found": total_found,
            "time": round(elapsed, 3),
            "words": {
                w: {"docs": d, "hits": h}
                for w, (d, h) in meta["stats"].items()
            },
        }

    def keywords(self, query: str) -> DataFrame:
        """BuildKeywords equivalent (GetKeywords src/sphinx.cpp:16110):
        per-term (word, docs, hits) stats."""
        toks = self._tokenizer.tokenize(query)
        wids = [word_id(t, self.settings.wordid) for t in toks]
        return self.dictionary.where(F.col("wordid").isin(wids)).select(
            "word", "docs", "hits"
        )

    def build_keywords(self, query: str, stats: bool = True) -> list:
        """Full GetKeywords shape (src/sphinx.cpp:16110-16163), in
        query-token order: one {'tokenized', 'normalized', 'docs',
        'hits'} per kept token.  tokenized is the folded token BEFORE
        the dictionary (m_sTokenized is captured pre-GetWordID);
        normalized is after the morphology chain (GetWordID mutates
        the buffer in place); stopwords are SKIPPED (GetWordID
        returns 0 -> no entry); words absent from the index still
        emit with docs=hits=0; without stats both counters are 0
        (the daemon's bGetStats branch).  Pinned live against the
        real daemon's BuildKeywords command in
        tests/test_ref_searchd_api_differential.py."""
        entries = [
            (raw, norm)
            for raw, norm, _ in self._tokenizer._full_stream(query)
            if norm is not None
        ]
        out = [
            {"tokenized": raw, "normalized": norm, "docs": 0, "hits": 0}
            for raw, norm in entries
        ]
        if stats and entries:
            wids = [
                word_id(norm, self.settings.wordid) for _, norm in entries
            ]
            found = {
                r["wordid"]: (r["docs"], r["hits"])
                for r in self.dictionary.where(
                    F.col("wordid").isin(wids)
                ).collect()
            }
            for row, wid in zip(out, wids):
                row["docs"], row["hits"] = found.get(wid, (0, 0))
        return out
