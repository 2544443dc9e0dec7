"""Compile an XQNode AST into a declarative DataFrame plan.

Relational mapping of the reference's ExtNode streaming operators
(src/sphinx.cpp:11208-13745):
  term    -> filtered scan of the postings relation (ExtTerm_c)
  and     -> inner join on docid, tfidf summed (ExtAnd_c :12365,12410)
  or      -> full outer join, tfidf summed where present (ExtOr_c :12516)
  andnot  -> left anti join (ExtAndNot_c :12677)
  phrase  -> per-doc position-delta chain over HIT2LCS positions
             (ExtPhrase_c :12805; higher-order array exprs, JVM-side)
  proximity -> minimal-window check: span(chosen positions) <=
             (maxqpos-minqpos)+N in one field (ExtProximity_c :13178)
  quorum  -> >=N distinct terms present (ExtQuorum_c :13414)
  before  -> greedy ascending selection by querypos (ExtOrder_c :13745)

Every node's DataFrame carries:
  docid      long
  tfidf      double   — fast64 score accumulator (query order)
  fieldmask  int      — matched-fields bits (for bm25/fieldmask ranks)
  tfs        array<struct<querypos int, tf int>>  — for exact32 scoring
  hits       array<struct<lcspos long, querypos int, spanlen int,
                          weight int>> — node's emitted hit stream,
             present only when compile(need_hits=True); lcspos keeps
             field<<24 but drops the FIELD_END bit (HIT2LCS,
             src/sphinx.cpp:238).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, LongType

from sphinx_1_spark.functions.bits import field_bit_of_pos
from sphinx_1_spark.functions.tokenizer import HIT_FIELD_END, POS_MASK
from sphinx_1_spark.functions.wordid import word_id
from sphinx_1_spark.plans.parser import ALL_FIELDS, QWord, XQNode

SPH_BM25_K1 = 1.2  # src/sphinx.cpp:11146
LCS_MASK = 0xFF7FFFFF  # HIT2LCS, src/sphinx.cpp:238

_HIT_STRUCT = "array<struct<lcspos:bigint,querypos:int,spanlen:int,weight:int>>"
_TFS_STRUCT = "array<struct<querypos:int,tf:int>>"


@dataclass
class CompileContext:
    postings: DataFrame  # (wordid, word, docid, tf, fieldmask[, positions])
    idf: dict[str, float]  # word -> idf (query-scope, driver-computed)
    need_hits: bool = False
    n_fields: int = 1
    wordid_impl: str = "crc32"

    def term_scan(self, word: str) -> DataFrame:
        wid = word_id(word, self.wordid_impl)
        return self.postings.where(F.col("wordid") == F.lit(wid))


def _empty(ctx: CompileContext) -> DataFrame:
    spark = ctx.postings.sparkSession
    cols = "docid bigint, tfidf double, fieldmask int, " f"tfs {_TFS_STRUCT}"
    if ctx.need_hits:
        cols += f", hits {_HIT_STRUCT}"
    return spark.createDataFrame([], cols)


def compile_node(node: XQNode, ctx: CompileContext) -> DataFrame:
    fn = _COMPILERS[node.op]
    return fn(node, ctx)


# ----------------------------------------------------------------------
# term


def _pos_predicates(node: XQNode, w: QWord):
    """Per-hit qualification predicates (ExtTermPos_c,
    src/sphinx.cpp:12115-12143): field mask, max field pos, anchors."""
    preds = []
    if node.fields_mask != ALL_FIELDS:
        mask = node.fields_mask
        preds.append(lambda p: field_bit_of_pos(p).bitwiseAND(F.lit(mask)) != 0)
    if node.max_field_pos:
        mp = node.max_field_pos
        preds.append(lambda p: p.bitwiseAND(F.lit(POS_MASK)) <= F.lit(mp))
    if w.field_start:
        preds.append(lambda p: p.bitwiseAND(F.lit(POS_MASK)) == 1)
    if w.field_end:
        preds.append(lambda p: p.bitwiseAND(F.lit(HIT_FIELD_END)) != 0)
    return preds


def _compile_term(node: XQNode, ctx: CompileContext) -> DataFrame:
    w = node.words[0]
    df = ctx.term_scan(w.word)
    preds = _pos_predicates(node, w)
    if preds and "positions" not in df.columns:
        # field-limited / anchor / exact operators need hit positions;
        # fail with validation, not an unresolved-column analysis error
        raise ValueError(
            "query needs hit positions (field limit / anchor / "
            "phrase operators) but the index was built with "
            "with_positions=False"
        )
    if preds:
        qual = F.filter(
            F.col("positions"), lambda p: _and_all(pred(p) for pred in preds)
        )
        df = df.withColumn("_qual", qual).where(F.size("_qual") > 0)
        pos_src = F.col("_qual")
    else:
        pos_src = F.col("positions") if "positions" in df.columns else None
    # the emitted ExtDoc always carries the RAW term's stats: tfidf is
    # m_uMatchHits — ALL doc hits, not the position-qualified subset
    # (ExtTerm_c::GetDocsChunk src/sphinx.cpp:11867; ExtTermPos copies
    # the raw doc wholesale, CopyExtDoc src/sphinx.cpp:12238) — and
    # fieldmask is qword fields masked by the query field spec only
    tf = F.col("tf")
    fieldmask = F.col("fieldmask")
    if node.fields_mask != ALL_FIELDS:
        fieldmask = fieldmask.bitwiseAND(F.lit(node.fields_mask)).cast("int")

    # duplicate query words keep m_fIDF = 0 (GetQwords hash-exists
    # early-out, src/sphinx.cpp:11977-11981)
    idf = 0.0 if w.dup else float(ctx.idf.get(w.word, 0.0))
    # ExtTerm_c: tfidf = tf/(tf+k1) * idf (src/sphinx.cpp:11867)
    tfidf = (tf.cast("double") / (tf.cast("double") + F.lit(SPH_BM25_K1))) * F.lit(idf)
    out = [
        F.col("docid"),
        tfidf.alias("tfidf"),
        fieldmask.alias("fieldmask"),
        F.array(
            F.struct(
                F.lit(w.querypos).cast("int").alias("querypos"),
                tf.cast("int").alias("tf"),
            )
        ).cast(_TFS_STRUCT).alias("tfs"),
    ]
    if ctx.need_hits:
        if pos_src is None:
            raise ValueError("index built without positions; ranker needs them")
        hits = F.transform(
            pos_src,
            lambda p: F.struct(
                p.bitwiseAND(F.lit(LCS_MASK)).cast("bigint").alias("lcspos"),
                F.lit(w.querypos).cast("int").alias("querypos"),
                F.lit(1).cast("int").alias("spanlen"),
                F.lit(1).cast("int").alias("weight"),
            ),
        )
        out.append(hits.alias("hits"))
    return df.select(*out)


def _and_all(preds) -> Column:
    it = iter(preds)
    acc = next(it)
    for p in it:
        acc = acc & p
    return acc


# ----------------------------------------------------------------------
# boolean combinators


def _suffix(df: DataFrame, s: str) -> DataFrame:
    return df.select([F.col(c).alias(c + s) for c in df.columns])


def _compile_and(node: XQNode, ctx: CompileContext) -> DataFrame:
    left = compile_node(node.children[0], ctx)
    for child in node.children[1:]:
        right = _suffix(compile_node(child, ctx), "_r")
        j = left.join(right, left["docid"] == right["docid_r"], "inner")
        left = _merge_both(j, ctx)
    return left


def _compile_or(node: XQNode, ctx: CompileContext) -> DataFrame:
    left = compile_node(node.children[0], ctx)
    for child in node.children[1:]:
        right = _suffix(compile_node(child, ctx), "_r")
        j = left.join(right, left["docid"] == right["docid_r"], "full_outer")
        left = _merge_both(j, ctx, outer=True)
    return left


def _merge_both(j: DataFrame, ctx: CompileContext, outer: bool = False) -> DataFrame:
    """Combine left + right columns after a join: tfidf summed in query
    order (ExtAnd :12410 / ExtOr :12572), fieldmask OR'd, tfs/hits
    concatenated (hits re-sorted by (lcspos, querypos) = the zipper
    merge order of GetHitsChunk)."""
    docid = F.coalesce(F.col("docid"), F.col("docid_r")) if outer else F.col("docid")
    z = F.lit(0.0)
    tfidf = F.coalesce(F.col("tfidf"), z) + F.coalesce(F.col("tfidf_r"), z)
    zi = F.lit(0)
    fieldmask = F.coalesce(F.col("fieldmask"), zi).bitwiseOR(
        F.coalesce(F.col("fieldmask_r"), zi)
    )
    tfs = F.concat(
        F.coalesce(F.col("tfs"), F.array().cast(_TFS_STRUCT)),
        F.coalesce(F.col("tfs_r"), F.array().cast(_TFS_STRUCT)),
    )
    cols = [
        docid.alias("docid"),
        tfidf.alias("tfidf"),
        fieldmask.cast("int").alias("fieldmask"),
        tfs.alias("tfs"),
    ]
    if ctx.need_hits:
        hits = F.array_sort(
            F.concat(
                F.coalesce(F.col("hits"), F.array().cast(_HIT_STRUCT)),
                F.coalesce(F.col("hits_r"), F.array().cast(_HIT_STRUCT)),
            )
        )
        cols.append(hits.alias("hits"))
    return j.select(*cols)


def _compile_andnot(node: XQNode, ctx: CompileContext) -> DataFrame:
    left = compile_node(node.children[0], ctx)
    right = compile_node(node.children[1], ctx).select("docid")
    return left.join(right, "docid", "left_anti")


# ----------------------------------------------------------------------
# positional nodes (phrase / proximity / quorum / before)


def _word_term_frames(node: XQNode, ctx: CompileContext) -> list[DataFrame]:
    """Per-word term scans with qualifying LCS position arrays."""
    frames = []
    for w in node.words:
        tnode = XQNode(
            "term",
            words=[w],
            fields_mask=node.fields_mask,
            max_field_pos=node.max_field_pos,
        )
        sub_ctx = CompileContext(ctx.postings, ctx.idf, True, ctx.n_fields, ctx.wordid_impl)
        df = _compile_term(tnode, sub_ctx)
        # reduce hits to bare lcspos array for the positional predicate
        df = df.withColumn("lcs", F.transform(F.col("hits"), lambda h: h["lcspos"]))
        if not ctx.need_hits:
            df = df.drop("hits")
        frames.append(df)
    return frames


def _join_all(frames: list[DataFrame], how: str) -> DataFrame:
    """Join per-word frames on docid with positional suffixes _0.._n.

    The running join key is kept in `_docid` (coalesced across outer
    joins) so each frame's own docid_i stays NULL-testable for
    presence counting."""
    acc = frames[0].select(
        [F.col(c).alias(f"{c}_0") for c in frames[0].columns]
    ).withColumn("_docid", F.col("docid_0"))
    for i, f in enumerate(frames[1:], start=1):
        fi = f.select([F.col(c).alias(f"{c}_{i}") for c in f.columns])
        acc = acc.join(fi, F.col("_docid") == F.col(f"docid_{i}"), how)
        if how == "full_outer":
            acc = acc.withColumn(
                "_docid", F.coalesce(F.col("_docid"), F.col(f"docid_{i}"))
            )
    return acc


def _sum_cols(cols: list[Column]) -> Column:
    acc = cols[0]
    for c in cols[1:]:
        acc = acc + c
    return acc


def _or_cols(cols: list[Column]) -> Column:
    acc = cols[0]
    for c in cols[1:]:
        acc = acc.bitwiseOR(c)
    return acc


def _concat_tfs(n: int) -> Column:
    parts = [
        F.coalesce(F.col(f"tfs_{i}"), F.array().cast(_TFS_STRUCT)) for i in range(n)
    ]
    return F.concat(*parts)


def _compile_phrase(node: XQNode, ctx: CompileContext) -> DataFrame:
    """Docs where words appear at exact querypos deltas in one field.

    Anchored on the first word: match-start positions are
    { p in lcs_0 : forall i>0, (p + qpos_i - qpos_0) in lcs_i }.
    HIT2LCS keeps field<<24, so the delta chain can never cross a
    field boundary (ExtPhrase_c :12805 matches on HIT2LCS equality).
    """
    frames = _word_term_frames(node, ctx)
    j = _join_all(frames, "inner")
    q0 = node.words[0].querypos
    deltas = [w.querypos - q0 for w in node.words]

    def _contains(i: int, d: int, p: Column) -> Column:
        def pred(q: Column) -> Column:
            return q == p + F.lit(d)

        return F.exists(F.col(f"lcs_{i}"), pred)

    def _match_chain(p: Column) -> Column:
        conds = [
            _contains(i, d, p) for i, d in enumerate(deltas) if d != 0 or i > 0
        ]
        return _and_all(conds) if conds else F.lit(True)

    starts = F.filter(F.col("lcs_0"), _match_chain)
    j = j.withColumn("_starts", starts).where(F.size("_starts") > 0)
    n = len(frames)
    span = node.words[-1].querypos - q0 + 1
    cols = [
        F.col("_docid").alias("docid"),
        _sum_cols([F.col(f"tfidf_{i}") for i in range(n)]).alias("tfidf"),
        # doc fields = field of the first match (ExtPhrase emits
        # 1<<HIT2FIELD of the concluding hit of the first match)
        field_bit_of_pos(F.array_min("_starts")).cast("int").alias("fieldmask"),
        _concat_tfs(n).alias("tfs"),
    ]
    if ctx.need_hits:
        # phrase emits one hit per match: start pos, min qpos,
        # spanlen = nwords-span, weight = nwords (src/sphinx.cpp:12903-12909)
        cols.append(
            F.transform(
                F.col("_starts"),
                lambda p: F.struct(
                    p.cast("bigint").alias("lcspos"),
                    F.lit(q0).cast("int").alias("querypos"),
                    F.lit(span).cast("int").alias("spanlen"),
                    F.lit(n).cast("int").alias("weight"),
                ),
            ).alias("hits")
        )
    return j.select(*cols)


def _compile_quorum(node: XQNode, ctx: CompileContext) -> DataFrame:
    """>= threshold distinct words present (duplicate query words count
    once: ExtQuorum ctor masks dup wordids out of the THRESHOLD only,
    src/sphinx.cpp:13395-13407).  Duplicate children still exist in the
    reference and still emit their hits (GetHitsChunk walks ALL
    children, :13524) with their own querypos — '"a a b"/2' on doc
    'a b' chains (1,q2)->(2,q3) to LCS 2, which a full word dedup would
    lose (and their tfidf, which is 0 anyway: dup terms carry idf 0,
    src/sphinx.cpp:11977-11981).  So: one term frame per DISTINCT word
    for counting/tfidf, one hits projection per ORIGINAL word."""
    seen: dict[str, int] = {}
    words = []
    dup_map: list[tuple[int, int]] = []  # (frame index, querypos)
    for w in node.words:
        if w.word not in seen:
            seen[w.word] = len(words)
            words.append(w)
        dup_map.append((seen[w.word], w.querypos))
    sub = XQNode(
        "quorum",
        words=words,
        fields_mask=node.fields_mask,
        max_field_pos=node.max_field_pos,
    )
    frames = _word_term_frames(sub, ctx)
    n = len(frames)
    thresh = max(1, node.max_distance)
    j = _join_all(frames, "full_outer")
    present = [F.col(f"docid_{i}").isNotNull().cast("int") for i in range(n)]
    j = j.where(_sum_cols(present) >= F.lit(thresh))
    z = F.lit(0.0)
    zi = F.lit(0)
    cols = [
        F.col("_docid").alias("docid"),
        _sum_cols([F.coalesce(F.col(f"tfidf_{i}"), z) for i in range(n)]).alias(
            "tfidf"
        ),
        _or_cols([F.coalesce(F.col(f"fieldmask_{i}"), zi) for i in range(n)])
        .cast("int")
        .alias("fieldmask"),
        _concat_tfs(n).alias("tfs"),
    ]
    if ctx.need_hits:
        # per ORIGINAL query word: the distinct frame's positions with
        # the original word's own querypos (a dup child is the same
        # term scan, so only querypos differs)
        def _with_qpos(qp):
            # single-arg lambda only: a second parameter would make
            # F.transform pass the ARRAY INDEX into it
            return lambda h: F.struct(
                h["lcspos"].alias("lcspos"),
                F.lit(qp).cast("int").alias("querypos"),
                h["spanlen"].alias("spanlen"),
                h["weight"].alias("weight"),
            )

        parts = [
            F.transform(
                F.coalesce(F.col(f"hits_{i}"), F.array().cast(_HIT_STRUCT)),
                _with_qpos(qp),
            )
            for i, qp in dup_map
        ]
        cols.append(F.array_sort(F.concat(*parts)).alias("hits"))
    return j.select(*cols)


def _compile_proximity(node: XQNode, ctx: CompileContext) -> DataFrame:
    """Verbatim port of the ExtProximity_c window loop
    (src/sphinx.cpp:13222-13341): per incoming hit, the per-queryword
    position table dProx evicts entries at pos <= cur - qspan -
    maxdist (STRICT window — a word exactly maxdist+qspan back does
    not qualify), and each time all words are present one node hit is
    emitted at the window minimum with spanlen = max-min+1 and weight
    = the trailing equal-delta run of the sorted (pos - entry) deltas;
    the min entry is then evicted so overlapping windows emit again."""
    frames = _word_term_frames(node, ctx)
    n = len(frames)
    j = _join_all(frames, "inner")
    minqpos = node.words[0].querypos
    qspan = node.words[-1].querypos - minqpos
    maxdist = node.max_distance
    UINT_MAX = 1 << 62

    @F.pandas_udf(f"{_HIT_STRUCT}")
    def prox_hits(arrs: pd.Series) -> pd.Series:
        out = []
        for lists in arrs:
            merged = sorted(
                (int(p), i) for i, lst in enumerate(lists) for p in lst
            )
            dprox = [UINT_MAX] * n
            minentry = -1
            words = 0
            exp_pos = None  # None = new document (m_uExpID mismatch)
            hits = []
            for pos, entry in merged:
                if not (exp_pos is not None and pos < exp_pos) or (
                    entry == minentry
                ):
                    if exp_pos is None:
                        dprox = [UINT_MAX] * n
                        dprox[entry] = pos
                        minentry = entry
                        words = 1
                    else:
                        if dprox[entry] == UINT_MAX:
                            words += 1
                        dprox[entry] = pos
                        minentry = entry
                        min_pos = pos - qspan - maxdist
                        umin = pos
                        for i, v in enumerate(dprox):
                            if v == UINT_MAX:
                                continue
                            if v <= min_pos:
                                dprox[i] = UINT_MAX
                                words -= 1
                                continue
                            if v < umin:
                                minentry = i
                                umin = v
                    exp_pos = dprox[minentry] + qspan + maxdist
                else:
                    if dprox[entry] == UINT_MAX:
                        words += 1
                    dprox[entry] = pos
                if words == n:
                    deltas = sorted(dprox[i] - i for i in range(n))
                    umax = max(dprox)
                    weight = 0
                    last = None
                    for d in deltas:
                        weight = weight + 1 if d == last else 1
                        last = d
                    hits.append(
                        {
                            "lcspos": dprox[minentry],
                            "querypos": minqpos,
                            "spanlen": umax - dprox[minentry] + 1,
                            "weight": weight,
                        }
                    )
                    dprox[minentry] = UINT_MAX
                    minentry = -1
                    words -= 1
                    exp_pos = 0
            out.append(hits if hits else None)
        return pd.Series(out)

    allpos = F.array(*[F.col(f"lcs_{i}") for i in range(n)])
    j = j.withColumn("_mh", prox_hits(allpos)).where(F.col("_mh").isNotNull())
    cols = [
        F.col("_docid").alias("docid"),
        _sum_cols([F.col(f"tfidf_{i}") for i in range(n)]).alias("tfidf"),
        # the emitted doc's field mask is the COMPLETING hit's field
        # alone (m_uFields = 1<<HIT2FIELD, src/sphinx.cpp:13297)
        F.expr(
            "CAST(shiftleft(1, CAST(shiftright(element_at(_mh, 1).lcspos,"
            " 24) AS INT)) AS INT)"
        ).alias("fieldmask"),
        _concat_tfs(n).alias("tfs"),
    ]
    if ctx.need_hits:
        cols.append(F.col("_mh").alias("hits"))
    return j.select(*cols)


def _compile_before(node: XQNode, ctx: CompileContext) -> DataFrame:
    """a << b: an ordered, non-overlapping occurrence of the children
    WITHIN ONE FIELD (ExtOrder_c::GetMatchingHits, src/sphinx.cpp:
    13650-13745: the trackers reset whenever HIT2FIELD changes, and a
    child extends the subsequence only at iHitPos >= prev pos +
    spanlen).  lcspos keeps the field in its high byte, so grouping by
    lcspos>>24 reproduces the per-field reset; greedy earliest-first
    per child is equivalent to the longest/recent dual tracker because
    every hit of a child carries the same spanlen."""
    children = [compile_node(c, _with_hits(ctx)) for c in node.children]
    n = len(children)

    # pack each hit into one int64 the UDF can unpack cheaply:
    # lcspos(29b) << 34 | querypos(12b) << 22 | spanlen(14b) << 8 | weight(8b).
    # lcspos = field<<24 | pos (23-bit position + HIT_FIELD_END flag
    # at bit 23, see POS_MASK) and the reference caps fields at 32
    # (fieldmask is a DWORD, src/sphinx.h CSphMatch::m_uFields), so 29
    # bits hold it; 14-bit spanlen covers a proximity child's window
    # (qspan+maxdist, e.g. '"a b"~600 << c' → spanlen up to ~602, which
    # the old 9-bit field silently overflowed into querypos).  Any value
    # out of range raises instead of corrupting the packed hit.
    def _pack(h):
        in_range = (
            (h["lcspos"] >= 0)
            & (h["lcspos"] < F.lit(1 << 29))
            & (h["querypos"].cast("bigint").between(0, (1 << 12) - 1))
            & (h["spanlen"].cast("bigint").between(0, (1 << 14) - 1))
            & (h["weight"].cast("bigint").between(0, (1 << 8) - 1))
        )
        packed = (
            h["lcspos"] * F.lit(1 << 34)
            + h["querypos"].cast("bigint") * F.lit(1 << 22)
            + h["spanlen"].cast("bigint") * F.lit(1 << 8)
            + h["weight"].cast("bigint")
        )
        # The guard's branches must DIFFER: an earlier
        # when(assert_true(c).isNull(), v).otherwise(v) had identical
        # branches, so SimplifyConditionals deleted the conditional —
        # and the assert with it — letting out-of-range spanlen corrupt
        # querypos bits silently.  raise_error in the else branch
        # cannot be folded away.
        return F.when(in_range, packed).otherwise(
            F.raise_error(
                F.lit(
                    "BEFORE hit packing overflow: need lcspos<2^29, "
                    "querypos<4096, spanlen<16384, weight<256"
                )
            ).cast("bigint")
        )

    j = _join_all(
        [
            c.withColumn("lcs", F.transform("hits", _pack))
            for c in children
        ],
        "inner",
    )

    @F.pandas_udf(ArrayType(LongType()))
    def before_hits(arrs: pd.Series) -> pd.Series:
        out = []
        for lists in arrs:
            merged: list[tuple[int, int, int]] = []  # (lcspos, child, packed)
            for ci, lst in enumerate(lists):
                for v in lst:
                    v = int(v)
                    merged.append((v >> 34, ci, v))
            merged.sort(key=lambda t: (t[0], t[1]))
            # longest/recent dual tracker (GetMatchingHits,
            # src/sphinx.cpp:13650-13745): only fully matched
            # subsequences are flushed, and the tracker resets whenever
            # the hit field (lcspos high byte) changes
            acc_l: list[int] = []
            acc_r: list[int] = []
            pos_l = pos_r = 0
            field = -1
            flushed: list[int] = []
            for full, ci, packed in merged:
                fld, p = full >> 24, full & 0x7FFFFF
                span = (packed >> 8) & 0x3FFF
                if fld != field:
                    acc_l = []
                    acc_r = []
                    if ci == 0:
                        acc_l = [packed]
                        pos_l = p + span
                        field = fld
                elif ci == len(acc_l) and p >= pos_l:
                    acc_l.append(packed)
                    pos_l = p + span
                    if len(acc_l) == len(lists):
                        flushed.extend(acc_l)
                        acc_l = []
                        acc_r = []
                        pos_r = pos_l
                elif ci == 0:
                    acc_r = [packed]
                    pos_r = p + span
                elif ci == len(acc_r) and p >= pos_r:
                    acc_r.append(packed)
                    pos_r = p + span
                    if len(acc_r) == len(acc_l):
                        acc_l, acc_r = acc_r, []
                        pos_l = pos_r
            out.append(flushed if flushed else None)
        return pd.Series(out)

    allpos = F.array(*[F.col(f"lcs_{i}") for i in range(n)])
    j = j.withColumn("_mh", before_hits(allpos)).where(F.col("_mh").isNotNull())
    matched = F.transform(
        F.col("_mh"),
        lambda x: F.struct(
            F.shiftright(x, 34).cast("bigint").alias("lcspos"),
            F.shiftright(x, 22).bitwiseAND(F.lit((1 << 12) - 1))
            .cast("int").alias("querypos"),
            F.shiftright(x, 8).bitwiseAND(F.lit((1 << 14) - 1))
            .cast("int").alias("spanlen"),
            x.bitwiseAND(F.lit((1 << 8) - 1)).cast("int").alias("weight"),
        ),
    )
    cols = [
        F.col("_docid").alias("docid"),
        # the matched doc is a copy of CHILD 0's ExtDoc (CopyExtDoc of
        # *m_pDocs[0], src/sphinx.cpp:13826) — tfidf/fieldmask are the
        # first child's alone, not an aggregate
        F.col("tfidf_0").alias("tfidf"),
        F.col("fieldmask_0").cast("int").alias("fieldmask"),
        F.col("tfs_0").alias("tfs"),
    ]
    if ctx.need_hits:
        cols.append(F.array_sort(matched).alias("hits"))
    return j.select(*cols)


def _with_hits(ctx: CompileContext) -> CompileContext:
    return CompileContext(ctx.postings, ctx.idf, True, ctx.n_fields, ctx.wordid_impl)


_COMPILERS = {
    "empty": lambda node, ctx: _empty(ctx),
    "term": _compile_term,
    "and": _compile_and,
    "or": _compile_or,
    "andnot": _compile_andnot,
    "phrase": _compile_phrase,
    "proximity": _compile_proximity,
    "quorum": _compile_quorum,
    "before": _compile_before,
}
