"""Rankers: matched docs -> integer weight column.

Weight model (reference):
  bm25part = int((sum_tfidf + 0.5) * 1000)        src/sphinx.cpp:13972
  proximity_bm25: bm25part + 1000 * sum_f lcs_f^2 * w_f
                                                  src/sphinx.cpp:14046-14056
  bm25:           bm25part + 1000 * sum_f matched_f * w_f
                                                  src/sphinx.cpp:14106-14132
  none:           1                               src/sphinx.cpp:14136
  wordcount:      sum over emitted hits of w_field src/sphinx.cpp:14161
  fieldmask:      matched-fields bitmask          src/sphinx.cpp:14477

Two score modes:
  fast64   — float64 Catalyst expressions (JVM, codegen; the scale path)
  exact32  — float32 numpy accumulation in querypos order, bit-matching
             the reference's float math (used for rank-identity tests)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

SPH_BM25_K1 = 1.2
SPH_BM25_SCALE = 1000


def bm25_part_fast(tfidf: Column) -> Column:
    """int((tfidf + 0.5) * 1000), positive -> floor == C int() trunc."""
    return F.floor((tfidf + F.lit(0.5)) * F.lit(SPH_BM25_SCALE)).cast("int")


def make_bm25_part_exact32(idf_by_qpos: dict[int, float]):
    """Pandas UDF: float32 accumulation over tfs=[(querypos, tf)...] in
    querypos order, reproducing ExtTerm/ExtAnd float math bit-for-bit
    (tf/(tf+1.2f)*idf summed, then int((x+0.5f)*1000))."""
    idf32 = {int(k): np.float32(v) for k, v in idf_by_qpos.items()}
    k1 = np.float32(SPH_BM25_K1)
    half = np.float32(0.5)
    scale = np.float32(SPH_BM25_SCALE)

    @F.pandas_udf(IntegerType())
    def bm25_exact(tfs: pd.Series) -> pd.Series:
        out = np.empty(len(tfs), dtype=np.int32)
        for i, lst in enumerate(tfs):
            acc = np.float32(0.0)
            entries = sorted(lst, key=lambda e: e["querypos"])
            for e in entries:
                tf = np.float32(e["tf"])
                acc = np.float32(acc + np.float32(tf / np.float32(tf + k1)) * idf32.get(int(e["querypos"]), np.float32(0.0)))
            out[i] = np.int32(np.float32((acc + half) * scale))
        return pd.Series(out)

    return bm25_exact


def field_rank_bm25(fieldmask: Column, field_weights: list[int]) -> Column:
    """sum_f ((mask>>f)&1) * w_f (ExtRanker_BM25_c::GetMatches)."""
    terms = [
        F.shiftright(fieldmask, f).bitwiseAND(F.lit(1)) * F.lit(w)
        for f, w in enumerate(field_weights)
    ]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def make_lcs_rank(field_weights: list[int], squared: bool = True):
    """Pandas UDF computing uRank from a node's emitted hit stream,
    the exact loop of ExtRanker_ProximityBM25_c::GetMatches
    (src/sphinx.cpp:14084-14095):

      delta = lcspos - querypos
      curlcs = (delta == expdelta) ? curlcs + weight : weight
      lcs[field] = max(lcs[field], curlcs)
      expdelta = delta + spanlen - 1

    squared=True: uRank = sum_f lcs_f^2 * w_f — the chinese-099 fork's
    ProximityBM25 formula (src/sphinx.cpp:14048).
    squared=False: uRank = sum_f lcs_f * w_f — ExtRanker_Proximity_c
    (legacy MATCH_ALL, src/sphinx.cpp:14298) AND the formula upstream
    0.9.9 used for ProximityBM25, which is what every shipped
    test/test_NN/model.bin golden was generated with (the fork squared
    the term without regenerating its e2e goldens; the replay harness
    in tests/reference_harness.py therefore scores with squared=False).
    """
    w = np.asarray(field_weights, dtype=np.int64)

    @F.pandas_udf(IntegerType())
    def lcs_rank(hits: pd.Series) -> pd.Series:
        out = np.zeros(len(hits), dtype=np.int64)
        for i, lst in enumerate(hits):
            lcs = np.zeros(len(w), dtype=np.int64)
            curlcs = 0
            expdelta = None
            for h in lst:  # already sorted by (lcspos, querypos)
                lcspos = int(h["lcspos"])
                delta = lcspos - int(h["querypos"])
                # BYTE uCurLCS / BYTE uLCS[] (src/sphinx.cpp:14002-14006)
                # wrap mod 256 — a long chain's stored maximum is the
                # largest wrapped value seen (test_94 pins 255)
                if delta == expdelta:
                    curlcs = (curlcs + int(h["weight"])) & 0xFF
                else:
                    curlcs = int(h["weight"]) & 0xFF
                fld = lcspos >> 24
                if fld < len(lcs) and curlcs > lcs[fld]:
                    lcs[fld] = curlcs
                expdelta = delta + int(h["spanlen"]) - 1
            if squared:
                out[i] = int((lcs * lcs * w).sum())
            else:
                out[i] = int((lcs * w).sum())
        return pd.Series(out.astype(np.int32))

    return lcs_rank


def make_matchany_rank(field_weights: list[int], n_qwords: int):
    """Legacy MATCHANY rank (ExtRanker_MatchAny_c::GetMatches,
    src/sphinx.cpp:14356-14476):

      phraseK = sum_f w_f * n_qwords
      per field with any match:
        rank += (bitcount(matchmask_f) + (lcs_f - 1)*phraseK) * w_f
      matchmask_f is a BYTE of 1<<(querypos-1) bits — querypos > 8
      wraps out of the byte (reference quirk, reproduced via & 0xFF).
    """
    w = np.asarray(field_weights, dtype=np.int64)
    phrase_k = int(w.sum()) * n_qwords

    @F.pandas_udf(IntegerType())
    def matchany_rank(hits: pd.Series) -> pd.Series:
        out = np.zeros(len(hits), dtype=np.int64)
        for i, lst in enumerate(hits):
            lcs = np.zeros(len(w), dtype=np.int64)
            mask = np.zeros(len(w), dtype=np.int64)
            curlcs = 0
            expdelta = None
            for h in lst:  # sorted by (lcspos, querypos)
                lcspos = int(h["lcspos"])
                qpos = int(h["querypos"])
                delta = lcspos - qpos
                # uCurLCS is a BYTE (src/sphinx.cpp:14366) — the
                # accumulator wraps mod 256 exactly like the
                # proximity ranker's
                if delta == expdelta:
                    curlcs = (curlcs + int(h["weight"])) & 0xFF
                else:
                    curlcs = int(h["weight"]) & 0xFF
                fld = lcspos >> 24
                if fld < len(w):
                    if curlcs > lcs[fld]:
                        lcs[fld] = curlcs
                    mask[fld] |= (1 << (qpos - 1)) & 0xFF
                expdelta = delta + int(h["spanlen"]) - 1
            rank = 0
            for f in range(len(w)):
                if mask[f]:
                    rank += (
                        int(bin(int(mask[f])).count("1"))
                        + (int(lcs[f]) - 1) * phrase_k
                    ) * int(w[f])
            out[i] = rank
        return pd.Series(out.astype(np.int32))

    return matchany_rank


def make_wordcount_rank(field_weights: list[int]):
    """sum over emitted hits of field weight (ExtRanker_Weight loop,
    src/sphinx.cpp:14161-14245)."""
    w = np.asarray(field_weights, dtype=np.int64)

    @F.pandas_udf(IntegerType())
    def wc_rank(hits: pd.Series) -> pd.Series:
        out = np.zeros(len(hits), dtype=np.int64)
        for i, lst in enumerate(hits):
            s = 0
            for h in lst:
                fld = int(h["lcspos"]) >> 24
                if fld < len(w):
                    s += int(w[fld])
            out[i] = s
        return pd.Series(out.astype(np.int32))

    return wc_rank


def apply_ranker(
    matched: DataFrame,
    ranker: str,
    field_weights: list[int],
    score_mode: str = "fast64",
    idf_by_qpos: dict[int, float] | None = None,
    n_uwords: int | None = None,
) -> DataFrame:
    """Add an int `weight` column per the ranker; drops plan columns."""
    if ranker in (
        "proximity_bm25", "proximity_bm25_linear", "proximity",
        "matchany", "wordcount",
    ) or score_mode == "exact32":
        # Optimization barrier for the Python rank UDFs: their `hits`
        # (or `tfs`) argument is an aliased higher-order-function
        # expression from the match compiler, and Spark 4.1 fails to
        # extract a scalar pandas UDF over a nested-lambda HOF argument
        # into ArrowEvalPython when an ORDER BY sits above and a
        # MapInPandas below (the raw PythonUDF then hits
        # InterpretedUnsafeProjection -> "Cannot evaluate expression").
        # A docid hash exchange materializes the argument columns so
        # the UDF sees plain attributes, which always extracts.  The
        # matched relation at this point is the narrow candidate set
        # (docid, tfidf, fieldmask, tfs[, hits]), so the extra
        # exchange is small and keyed the same way downstream
        # attribute joins want it.
        matched = matched.repartition(F.col("docid"))
    if score_mode == "exact32":
        bm25part = make_bm25_part_exact32(idf_by_qpos or {})(F.col("tfs"))
    else:
        bm25part = bm25_part_fast(F.col("tfidf"))

    if ranker == "proximity_bm25":
        urank = make_lcs_rank(field_weights)(F.col("hits"))
        weight = bm25part + urank * F.lit(SPH_BM25_SCALE)
    elif ranker == "proximity_bm25_linear":
        # upstream-0.9.9 ProximityBM25 (linear LCS) — the formula the
        # reference's shipped model.bin e2e goldens were scored with;
        # see make_lcs_rank docstring
        urank = make_lcs_rank(field_weights, squared=False)(F.col("hits"))
        weight = bm25part + urank * F.lit(SPH_BM25_SCALE)
    elif ranker == "proximity":
        # legacy MATCH_ALL/PHRASE emulation: linear LCS sum, UNSCALED —
        # ExtRanker_Proximity_c::GetMatches flushes
        # m_iWeight = sum_f lcs_f * w_f with no BM25 part and no
        # SPH_BM25_SCALE (src/sphinx.cpp:14295-14305)
        weight = make_lcs_rank(field_weights, squared=False)(F.col("hits"))
    elif ranker == "bm25":
        weight = bm25part + field_rank_bm25(
            F.col("fieldmask"), field_weights
        ) * F.lit(SPH_BM25_SCALE)
    elif ranker == "none":
        weight = F.lit(1)
    elif ranker == "matchany":
        # m_uQWords = hQwords.GetLength() (src/sphinx.cpp:13989): the
        # qwords HASH collapses duplicate query words, so phraseK
        # scales with UNIQUE words — len(idf_by_qpos) is keyed by
        # querypos and would count 'zee lord of zee rings' as 5
        n_qwords = (
            n_uwords
            if n_uwords is not None
            else len(idf_by_qpos or {})
        ) or 1
        weight = make_matchany_rank(field_weights, n_qwords)(F.col("hits"))
    elif ranker == "wordcount":
        weight = make_wordcount_rank(field_weights)(F.col("hits"))
    elif ranker == "fieldmask":
        weight = F.col("fieldmask")
    else:
        raise ValueError(f"unknown ranker {ranker!r}")

    return matched.select(
        F.col("docid"), weight.cast("int").alias("weight"), F.col("fieldmask")
    )
