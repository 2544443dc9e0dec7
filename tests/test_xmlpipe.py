"""xmlpipe2 source (CSphSource_XMLPipe2, src/sphinx.cpp:20481+,
element grammar :21352-21560)."""

import pytest

from sphinx_1_spark.sources.xmlpipe import (
    XmlPipeError,
    parse_docset,
    read_xmlpipe2,
    read_xmlpipe2_killlist,
)

DOCSET = """<?xml version="1.0" encoding="utf-8"?>
<sphinx:docset>
<sphinx:schema>
<sphinx:field name="title"/>
<sphinx:field name="content"/>
<sphinx:attr name="published" type="timestamp"/>
<sphinx:attr name="score" type="float"/>
</sphinx:schema>
<sphinx:document id="1">
<title>hello &amp; goodbye</title>
<content>first &lt;document&gt; body</content>
<published>1283729963</published>
<score>1.25</score>
</sphinx:document>
<sphinx:document id="2">
<title>second</title>
<content></content>
<published>1283729964</published>
</sphinx:document>
<sphinx:killlist><id>7</id><id>9</id></sphinx:killlist>
</sphinx:docset>"""


def test_parse_docset():
    p = parse_docset(DOCSET)
    assert p["fields"] == ["title", "content"]
    assert p["attrs"] == [("published", "timestamp"), ("score", "float")]
    d1, d2 = p["documents"]
    # XML entities decode (the reference's expat does the same)
    assert d1 == {
        "id": 1,
        "title": "hello & goodbye",
        "content": "first <document> body",
        "published": 1283729963,
        "score": 1.25,
    }
    assert d2["content"] == ""  # empty element -> empty field
    assert d2["score"] is None  # missing attr -> NULL
    assert p["killlist"] == [7, 9]


def test_parse_errors():
    with pytest.raises(XmlPipeError):
        parse_docset("<notdocset/>")
    with pytest.raises(XmlPipeError):
        parse_docset(
            "<sphinx:docset><sphinx:document>"
            "<t>x</t></sphinx:document></sphinx:docset>"
        )  # id required, src/sphinx.cpp:21478
    with pytest.raises(XmlPipeError):
        parse_docset(
            "<sphinx:docset><sphinx:killlist><x>1</x>"
            "</sphinx:killlist></sphinx:docset>"
        )  # only 'id' allowed, src/sphinx.cpp:21501


def test_read_xmlpipe2_spark(spark):
    xml_df = spark.createDataFrame([(DOCSET,)], ["xml"])
    df = read_xmlpipe2(
        xml_df,
        fields=("title", "content"),
        attrs=(("published", "timestamp"), ("score", "float")),
    )
    rows = {r["docid"]: r for r in df.collect()}
    assert rows[1]["title"] == "hello & goodbye"
    assert rows[1]["published"] == 1283729963
    assert rows[2]["score"] is None
    kl = read_xmlpipe2_killlist(xml_df).collect()
    assert sorted(r["docid"] for r in kl) == [7, 9]


def test_schema_mismatch_raises(spark):
    xml_df = spark.createDataFrame([(DOCSET,)], ["xml"])
    df = read_xmlpipe2(xml_df, fields=("title",), attrs=())
    with pytest.raises(Exception, match="schema mismatch"):
        df.collect()


def test_index_from_xmlpipe(spark):
    """Parsed docs feed SphinxIndex.build directly."""
    from sphinx_1_spark import IndexSettings, SphinxIndex

    xml_df = spark.createDataFrame([(DOCSET,)], ["xml"])
    docs = read_xmlpipe2(
        xml_df,
        fields=("title", "content"),
        attrs=(("published", "timestamp"), ("score", "float")),
    )
    idx = SphinxIndex.build(
        docs, IndexSettings(docid_col="docid", fields=("title", "content"))
    )
    rows = idx.search("hello", ranker="bm25").collect()
    assert [r["docid"] for r in rows] == [1]
