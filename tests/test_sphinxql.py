"""SphinxQL SELECT translator tests (grammar src/sphinxql.y:87-120)."""

import pytest

from sphinx_1_spark.plans.sphinxql import SphinxQLError, parse_select, sphinxql


def test_parse_full_statement():
    s = parse_select(
        "SELECT event_type, COUNT(*) AS cnt, AVG(value) AS av FROM events "
        "WHERE MATCH('hello world') AND value > 5 AND event_type IN ('a', 'b') "
        "GROUP BY event_type WITHIN GROUP ORDER BY value DESC "
        "ORDER BY cnt DESC, event_type ASC LIMIT 5, 10"
    )
    assert s.match == "hello world"
    assert ("value", ">", 5) in s.conds
    assert ("event_type", "in", ["a", "b"]) in s.conds
    assert s.group_by == "event_type"
    assert s.within_order == [("value", False)]
    assert s.order_by == [("cnt", False), ("event_type", True)]
    assert (s.offset, s.limit) == (5, 10)


def test_parse_errors():
    with pytest.raises(SphinxQLError):
        parse_select("DELETE FROM x")
    with pytest.raises(SphinxQLError):
        parse_select("SELECT a FROM t WHERE MATCH(unquoted)")
    with pytest.raises(SphinxQLError):
        parse_select("SELECT a FROM t garbage trailing")


def test_execute_fullscan(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = sphinxql(
        "SELECT event_id, value FROM events WHERE value BETWEEN 5 AND 10 "
        "ORDER BY value DESC, event_id ASC LIMIT 5",
        df=ev,
        docid_col="event_id",
    ).collect()
    assert len(rows) == 5
    vals = [r["value"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(5 <= v <= 10 for v in vals)


def test_execute_group(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    rows = sphinxql(
        "SELECT event_type, COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS uu "
        "FROM events GROUP BY event_type ORDER BY event_type ASC LIMIT 10",
        df=ev,
        docid_col="event_id",
    ).collect()
    assert len(rows) >= 3
    want = (
        ev.groupBy("event_type").count().orderBy("event_type").collect()
    )
    assert [(r["event_type"], r["cnt"]) for r in rows] == [
        (r["event_type"], r["count"]) for r in want
    ]


def test_execute_match(spark, docs_index):
    rows = sphinxql(
        "SELECT @id, @weight FROM documents WHERE MATCH('table scan') "
        "ORDER BY @weight DESC, @id ASC LIMIT 10",
        index=docs_index,
    ).collect()
    assert rows
    ws = [(r["weight"], r["id"]) for r in rows]
    assert ws == sorted(ws, key=lambda t: (-t[0], t[1]))


def test_option_clause(spark, docs_index):
    from sphinx_1_spark.plans.sphinxql import parse_select

    s = parse_select(
        "SELECT @id FROM documents WHERE MATCH('table') "
        "LIMIT 5 OPTION ranker=bm25, max_matches=100"
    )
    assert s.options == {"ranker": "bm25", "max_matches": 100}
    rows = sphinxql(
        "SELECT @id, @weight FROM documents WHERE MATCH('table scan') "
        "ORDER BY @weight DESC, @id ASC LIMIT 5 OPTION ranker=none",
        index=docs_index,
    ).collect()
    # ranker NONE: every match weighs 1
    assert rows and all(r["weight"] == 1 for r in rows)


def test_show_meta_session(spark, docs_index):
    from sphinx_1_spark.plans.sphinxql import SphinxQLSession

    sess = SphinxQLSession(index=docs_index)
    rows = sess.execute(
        "SELECT @id FROM documents WHERE MATCH('table scan') "
        "ORDER BY @weight DESC, @id ASC LIMIT 5 OPTION ranker=bm25"
    ).collect()
    meta = {r["variable_name"]: r["value"] for r in sess.execute("SHOW META").collect()}
    # 'total' = min(total_found, max_matches default 1000), NOT LIMIT
    # (searchd.cpp:5756 m_dMatches.GetLength())
    assert meta["total"] == str(min(int(meta["total_found"]), 1000))
    assert meta["keyword[0]"] == "table" and meta["keyword[1]"] == "scan"
    assert int(meta["docs[0]"]) > 0 and int(meta["hits[0]"]) >= int(meta["docs[0]"])
    assert len(rows) == min(int(meta["total_found"]), 5)
    # warnings: empty result set, not an error
    assert sess.execute("SHOW WARNINGS").collect() == []
