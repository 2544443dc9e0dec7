"""Round-4 serving/storage review fixes: SphinxQL queue semantics
(filters before the max_matches bound, shared 1000 default, offset
bounds), grouped-SELECT edge cases, trailing semicolons, SHOW META
filtered totals, atomic manifest rewrite, and the one unsigned docid
tie-break shared by every serving path."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sphinx_1_spark import IndexSettings, SphinxIndex
from sphinx_1_spark.plans.sphinxql import (
    SphinxQLError,
    SphinxQLSession,
    sphinxql,
)


@pytest.fixture(scope="module")
def ql_setup(spark):
    # 30 docs match 'common'; doc 1..30, weight ties broken by docid.
    # price=5 only on the LAST 10 docids, so an unfiltered top-10
    # relevance cut would drop every price=5 row.
    rows = [
        (i, "common text", 5 if i > 20 else 1, i % 3)
        for i in range(1, 31)
    ]
    df = spark.createDataFrame(
        rows, "docid long, text string, price int, grp int"
    )
    idx = SphinxIndex.build(df, IndexSettings(docid_col="docid"))
    attrs = df.select("docid", "price", "grp")
    return idx, attrs


def test_filters_run_before_max_matches_bound(ql_setup):
    """searchd's match queue is fed by FILTERED matches (early
    reject): WHERE price=5 OPTION max_matches=10 must return price=5
    rows even though they rank outside the unfiltered top-10."""
    idx, attrs = ql_setup
    out = sphinxql(
        "SELECT @id, price FROM t WHERE MATCH('common') AND price=5 "
        "ORDER BY @id ASC LIMIT 20 OPTION max_matches=10",
        df=attrs,
        index=idx,
    ).collect()
    assert [r.id for r in out] == list(range(21, 31))


def test_sphinxql_offset_past_queue_rejected(ql_setup):
    idx, attrs = ql_setup
    with pytest.raises(SphinxQLError, match="offset out of bounds"):
        sphinxql(
            "SELECT @id FROM t WHERE MATCH('common') "
            "LIMIT 10, 5 OPTION max_matches=10",
            df=attrs,
            index=idx,
        )


def test_sphinxql_page_truncates_to_queue(ql_setup):
    """Ranks past max_matches do not exist: offset 8, limit 5 against
    a 10-row queue returns 2 rows."""
    idx, attrs = ql_setup
    out = sphinxql(
        "SELECT @id FROM t WHERE MATCH('common') "
        "ORDER BY @id ASC LIMIT 8, 5 OPTION max_matches=10",
        df=attrs,
        index=idx,
    ).collect()
    assert [r.id for r in out] == [9, 10]


def test_trailing_semicolon_accepted(ql_setup):
    idx, attrs = ql_setup
    out = sphinxql(
        "SELECT @id FROM t WHERE MATCH('common') ORDER BY @id ASC "
        "LIMIT 3;",
        df=attrs,
        index=idx,
    ).collect()
    assert [r.id for r in out] == [1, 2, 3]


def test_grouped_select_without_aggregates(ql_setup):
    """SELECT * ... GROUP BY grp used to crash in GroupedData.agg();
    Sphinx adds @count to every grouped result implicitly."""
    idx, attrs = ql_setup
    out = sphinxql(
        "SELECT * FROM t WHERE MATCH('common') GROUP BY grp "
        "ORDER BY grp ASC LIMIT 10",
        df=attrs,
        index=idx,
    )
    rows = out.collect()
    assert [r.grp for r in rows] == [0, 1, 2]
    assert {r["@count"] for r in rows} == {10}


def test_grouped_select_with_pseudo_columns(ql_setup):
    """@id in a grouped select used to throw an unresolved-column
    error; the representative row is the group's BEST match (weight
    desc, docid asc), here the lowest docid per group."""
    idx, attrs = ql_setup
    rows = sphinxql(
        "SELECT @id, COUNT(*) AS cnt FROM t WHERE MATCH('common') "
        "GROUP BY grp ORDER BY grp ASC LIMIT 10",
        df=attrs,
        index=idx,
    ).collect()
    assert [r.cnt for r in rows] == [10, 10, 10]
    # grp 0 -> docids 3,6,..,30 best 3; grp 1 -> 1,4,.. best 1; grp 2 -> 2
    assert [r.id for r in rows] == [3, 1, 2]


def test_show_meta_counts_filtered_matches(ql_setup):
    """m_iTotalMatches counts matches that passed the attr filters —
    20 price=1 docs must not inflate a price=5 query's totals."""
    idx, attrs = ql_setup
    sess = SphinxQLSession(index=idx, df=attrs)
    sess.execute(
        "SELECT @id FROM t WHERE MATCH('common') AND price=5 LIMIT 3"
    ).collect()
    meta = {r.variable_name: r.value for r in sess.execute("SHOW META").collect()}
    assert meta["total_found"] == "10"
    assert meta["total"] == "10"


def test_unsigned_docid_tiebreak_everywhere(spark):
    """SphDocID_t compares as DWORD64: a negative long (= uint64 above
    2^63) orders AFTER every positive docid on ties, on every path."""
    df = spark.createDataFrame(
        [(-7, "same words here"), (5, "same words here")],
        "docid long, text string",
    )
    idx = SphinxIndex.build(df, IndexSettings(docid_col="docid"))
    # engine relevance path
    got = [r.docid for r in idx.search("same", limit=10).collect()]
    assert got == [5, -7]
    # sphinxql ORDER BY @id ASC
    got = [
        r.id
        for r in sphinxql(
            "SELECT @id FROM t WHERE MATCH('same') ORDER BY @id ASC "
            "LIMIT 10",
            index=idx,
        ).collect()
    ]
    assert got == [5, -7]
    # sort-clause path (SPH_SORT_EXTENDED '@id asc')
    from sphinx_1_spark.plans.api import ApiQuery, api_query

    rows, _ = api_query(
        [("i", idx, None)],
        ApiQuery(query="same", sortmode="extended", sortby="@id asc"),
    )
    assert [r.docid for r in rows] == [5, -7]


def test_manifest_rewrite_is_atomic(spark, tmp_path, monkeypatch):
    """A kill between truncate and dump during the build_wall_s
    manifest rewrite must not corrupt the completion marker resume
    trusts (both writes go through .tmp + os.replace)."""
    from sphinx_1_spark.plans import segment_index as si
    from sphinx_1_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 200, seed=3, partitions=4)
    out = str(tmp_path / "segs")

    real_dump = json.dump
    calls = {"n": 0}

    def dying_dump(obj, f, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # the build_wall_s rewrite
            f.write("{\"trunc")  # partial bytes into the TEMP file
            raise RuntimeError("killed mid-dump")
        return real_dump(obj, f, **kw)

    monkeypatch.setattr(si.json, "dump", dying_dump)
    with pytest.raises(RuntimeError, match="killed mid-dump"):
        si.build_segments(pages, out, n_shards=1)
    monkeypatch.setattr(si.json, "dump", real_dump)

    shard = os.path.join(out, "shard=00000")
    # the completion marker is the FIRST (complete) manifest, intact
    assert si.segment_complete(shard)
    m = si.read_manifest(shard)
    assert m["status"] == "complete"
    # resume skips the complete shard and leaves it parsable
    si.build_segments(pages, out, n_shards=1)
    assert si.read_manifest(shard)["status"] == "complete"


# ------------------------------------------ streaming/pipeline review fixes


def test_compact_dir_serves_as_fresh_stream_root(spark, tmp_path):
    """compact() used to name its output delta=0000000000 — colliding
    with a fresh stream's batch_id 0, whose first micro-batch was then
    silently skipped as 'already complete' (data loss)."""
    from sphinx_1_spark.sources.pages import generate_pages
    from sphinx_1_spark.streaming.incremental import IncrementalIndexer

    root = str(tmp_path / "root")
    ix = IncrementalIndexer(root)
    ix.process_batch(generate_pages(spark, 60, seed=1, partitions=2), 0)
    ix.process_batch(generate_pages(spark, 60, seed=2, partitions=2), 1)

    dest = str(tmp_path / "compacted")
    ix.compact(spark, dest)

    ix2 = IncrementalIndexer(dest)
    fresh = generate_pages(spark, 40, seed=3, partitions=2)
    ix2.process_batch(fresh, 0)  # must NOT be skipped
    view = ix2.open_view(spark)
    assert len(view.paths) == 2  # compacted= + delta=0000000000
    from sphinx_1_spark.plans.segment_index import read_manifest

    delta = [p for p in view.paths if "delta=" in os.path.basename(p)]
    assert len(delta) == 1
    # the first micro-batch actually indexed its 40 pages (the old
    # delta=0000000000 collision skipped it as already-complete)
    assert read_manifest(delta[0])["n_docs"] == 40
    # and the chain serves: re-crawled urls resolve to the newest copy
    assert view.docinfo().count() == 60  # 60 compacted, 40 re-crawled


def test_probe_set_enumerates_all_distances():
    """probe_hamming used to silently truncate at distance 2; at
    probe_hamming=nbits it must enumerate every bucket (the documented
    exact-brute-force degradation)."""
    from sphinx_1_spark.operators.similarity import (
        _probe_set,
        deterministic_planes,
    )

    planes = deterministic_planes(8, 4, seed=7)
    assert len(_probe_set([1.0] * 8, planes, probe_hamming=4)) == 16
    assert len(_probe_set([1.0] * 8, planes, probe_hamming=3)) == 15


def test_attach_forwards_trigger_kwargs(spark, tmp_path):
    """attach(**trigger_kwargs) used to swallow the kwargs; with
    availableNow=True forwarded, the query drains and TERMINATES."""
    from sphinx_1_spark.sources.pages import generate_pages
    from sphinx_1_spark.streaming.incremental import IncrementalIndexer

    src = str(tmp_path / "src")
    generate_pages(spark, 30, seed=5, partitions=1).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    ix = IncrementalIndexer(str(tmp_path / "out"))
    q = ix.attach(stream, availableNow=True).start()
    q.awaitTermination(120)
    assert not q.isActive  # availableNow drained and stopped
    assert ix.open_view(spark).docinfo().count() == 30


def test_wand_exclude_is_exact(spark, tmp_path):
    """wand_topk(exclude=...) must equal 'rank everything, drop the
    excluded, cut top-k' — including the OR path, whose theta seed
    must ignore excluded docs (a theta from killed docs over-prunes)."""
    import tempfile

    from sphinx_1_spark.plans.segment_index import (
        SegmentSet,
        build_segments,
    )
    from sphinx_1_spark.sources.pages import generate_pages

    out = str(tmp_path / "segs")
    pages = generate_pages(spark, 1500, seed=9, partitions=4)
    build_segments(pages, out, n_shards=1)
    seg = SegmentSet(spark, [f"{out}/shard=00000"])
    words = ["the", "data"]
    for mode in ("and", "or"):
        allrows = seg.wand_topk(words, k=100000, mode=mode).collect()
        # exclude ~1/3 of the matched docids deterministically
        excl = [r.docid for r in allrows if r.docid % 3 == 0]
        excl_df = spark.createDataFrame(
            [(d,) for d in excl], "docid long"
        )
        expected = [
            (r.docid, r.weight)
            for r in allrows
            if r.docid % 3 != 0
        ][:10]
        # reference order: weight desc, docid unsigned asc
        expected = sorted(
            [
                (r.docid, r.weight)
                for r in allrows
                if r.docid % 3 != 0
            ],
            key=lambda t: (-t[1], t[0] ^ -(1 << 63)),
        )[:10]
        got = [
            (r.docid, r.weight)
            for r in seg.wand_topk(
                words, k=10, mode=mode, exclude=excl_df
            ).collect()
        ]
        assert got == expected, mode


def test_dedup_cache_registry_releases(spark):
    from sphinx_1_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i % 5}") for i in range(30)],
        "doc_id long, text string",
    )
    dedup.release_dedup_caches()  # start clean
    dedup.ngram_jaccard_pairs(docs, k=3, tau=0.5).collect()
    assert dedup._CACHED
    assert dedup.release_dedup_caches() >= 1
    assert not dedup._CACHED


def test_embedding_ops_on_empty_input(spark):
    from sphinx_1_spark.operators.dedup import embedding_neardup_bucketed
    from sphinx_1_spark.operators.similarity import build_ann_index

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    assert embedding_neardup_bucketed(empty).count() == 0
    with pytest.raises(ValueError, match="empty"):
        build_ann_index(empty, "/tmp/never_written_ann")


# -------------------------------------- parser/ranker/expr review fixes


def test_stray_operator_tokens_raise_not_hang():
    """'foo/bar' (and any stray $/~// in atom position) used to spin
    the parser forever — the reference's yacc parser fails with a
    syntax error, and so must we."""
    from sphinx_1_spark.functions.tokenizer import (
        Tokenizer,
        TokenizerSettings,
    )
    from sphinx_1_spark.plans.parser import QueryParseError, QueryParser

    p = QueryParser(Tokenizer(TokenizerSettings()), ["text"])
    for q in ["foo/bar", "$100", "hello~", "$", "~", "/", "a | /",
              "a << /"]:
        with pytest.raises(QueryParseError, match="syntax error"):
            p.parse(q)
    # legitimate operator syntax still parses
    assert p.parse('"a b"~3').op == "proximity"
    assert p.parse('"a b c"/2').op == "quorum"


def test_matchany_counts_unique_qwords(spark):
    """m_uQWords = hQwords.GetLength() (src/sphinx.cpp:13989): the
    qwords hash collapses duplicates, so 'zee lord of zee rings'
    contributes 4 to phraseK, not 5."""
    import sphinx_1_spark.plans.engine as eng
    from sphinx_1_spark.operators import ranker as rk

    df = spark.createDataFrame(
        [(1, "zee lord of zee rings")], "docid long, text string"
    )
    idx = SphinxIndex.build(df, IndexSettings(docid_col="docid"))
    _plan, meta = idx.match("zee lord of zee rings")
    assert meta["n_uwords"] == 4
    assert len(meta["idf_by_qpos"]) == 5

    seen = {}
    orig = rk.make_matchany_rank

    def spy(field_weights, n_qwords):
        seen["n"] = n_qwords
        return orig(field_weights, n_qwords)

    rk.make_matchany_rank, saved = spy, rk.make_matchany_rank
    try:
        idx.search("zee lord of zee rings", ranker="matchany").collect()
    finally:
        rk.make_matchany_rank = saved
    assert seen["n"] == 4


def test_idiv_exact_above_2_53(spark):
    """IDIV divides int64 exactly (sphinxexpr.cpp:242); the old
    double route rounded 2^53+1 down before dividing."""
    from sphinx_1_spark.functions.exprparse import parse_expression

    big = (1 << 53) + 1
    df = spark.createDataFrame([(1, big)], "docid long, v long")
    col, t = parse_expression("IDIV(v, 1)", {"v": "bigint"})
    assert t == "bigint"
    assert df.select(col.alias("q")).first().q == big
    # truncation toward zero like C++ (not floor)
    df2 = spark.createDataFrame([(1, -7)], "docid long, v long")
    col2, _ = parse_expression("IDIV(v, 2)", {"v": "bigint"})
    assert df2.select(col2.alias("q")).first().q == -3


def test_interval_reference_semantics(spark):
    """INTERVAL compares in the WIDEST arg type and returns the FIRST
    point exceeding the value (sphinxexpr.cpp:1030-1053, type dispatch
    :1308-1330)."""
    from sphinx_1_spark.functions.exprparse import parse_expression

    df = spark.createDataFrame([(1, 3)], "docid long, v int")
    # int attr vs float point: reference compares as float -> 3.0 < 3.5
    col, _ = parse_expression("INTERVAL(v, 3.5)", {"v": "int"})
    assert df.select(col.alias("q")).first().q == 0
    # unsorted points: first-match (5 < 10 -> index 0), not last-match
    col2, _ = parse_expression("INTERVAL(v, 10, 3)", {"v": "int"})
    df5 = spark.createDataFrame([(1, 5)], "docid long, v int")
    assert df5.select(col2.alias("q")).first().q == 0
    # sorted points unchanged
    col3, _ = parse_expression("INTERVAL(v, 2, 4, 9)", {"v": "int"})
    assert df5.select(col3.alias("q")).first().q == 2


def test_excerpt_zero_length_junk_between_adjacent_tokens():
    """The reference's AddJunk appends a zero-length TOK_SPACE between
    ADJACENT tokens (src/sphinxexcerpt.cpp:260-264 always calls it,
    :185-191 always appends) — CJK ngram chars are adjacent tokens, so
    the token stream must interleave the zero-length separators."""
    from sphinx_1_spark.functions.tokenizer import (
        Tokenizer,
        TokenizerSettings,
    )
    from sphinx_1_spark.operators.excerpts import (
        _parse_keywords,
        _scan_tokens,
    )

    tk = Tokenizer(TokenizerSettings(ngram_chars="U+4E00..U+9FBF"))
    kws = _parse_keywords("中", tk)
    toks = _scan_tokens("中文分", tk, kws)
    # WORD(1) SPACE(0) WORD(1) SPACE(0) WORD(1) NONE — the reference
    # token stream for three adjacent ngram chars
    assert [(t.type, t.length) for t in toks] == [
        (1, 1), (2, 0), (1, 1), (2, 0), (1, 1), (0, 0),
    ]
