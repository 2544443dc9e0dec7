"""HTML stripper byte-identity tests.

Goldens in tests/goldens/strip_goldens.jsonl were produced by driving
the reference implementation (CSphHTMLStripper::Strip,
src/sphinx.cpp:18075-18360) compiled from /root/reference over a fuzz
corpus covering the automaton's branch space: entities (named,
numeric, malformed), comments/PIs, inline vs unknown vs remove tags,
index_attrs extraction, quote handling, and raw byte garbage.  The
engine's output must be byte-identical for every case.
"""

import base64
import json
import os

import pytest

from sphinx_1_spark.functions.stripper import ENTITIES, HtmlStripper

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "strip_goldens.jsonl")


def load_cases():
    with open(GOLDENS) as f:
        return [json.loads(line) for line in f]


def parse_attrs(spec: str) -> dict:
    out = {}
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        tag, attrs = part.split("=", 1)
        out[tag.strip()] = [a.strip() for a in attrs.split(",")]
    return out


def test_goldens_byte_identical():
    cases = load_cases()
    assert len(cases) > 500
    strippers = {}
    bad = []
    for c in cases:
        key = (c["remove"], c["attrs"])
        if key not in strippers:
            strippers[key] = HtmlStripper(c["remove"], parse_attrs(c["attrs"]))
        html = base64.b64decode(c["html"])
        want = base64.b64decode(c["text"])
        got = strippers[key].strip(html)
        if got != want:
            bad.append((html, want, got))
    assert not bad, f"{len(bad)} mismatches; first: {bad[0]!r}"


def test_entity_quirks():
    s = HtmlStripper()
    # nbsp folds to plain space; apos is known (reference wordlist quirks)
    assert s.strip(b"a&nbsp;b") == b"a b"
    assert s.strip(b"&apos;") == b"'"
    # unknown entity passes '&' through and rescans
    assert s.strip(b"&unknown;") == b"&unknown;"
    # unterminated numeric entity drops the consumed "&#digits"
    assert s.strip(b"x&#123y") == b"xy"
    assert s.strip(b"x&#0;y") == b"x;y"


def test_entity_table_is_html401_plus_quirks():
    import html.entities

    assert ENTITIES[b"apos"] == 39
    assert ENTITIES[b"nbsp"] == 32
    for name, code in html.entities.name2codepoint.items():
        if name != "nbsp":
            assert ENTITIES[name.encode()] == code


def test_remove_element_swallows_content():
    s = HtmlStripper("script, style")
    assert s.strip(b"a<script>var x;</script>b") == b"a b"
    # EOF during the close scan still appends the non-inline space
    assert s.strip(b"a<script>no close") == b"a "
    assert s.strip(b"a<SCRIPT>x</ScRiPt>b") == b"a b"
    # short form skips no content and appends no space (src/sphinx.cpp:18335)
    assert s.strip(b"a<script/>b") == b"ab"


def test_index_attrs_extraction():
    s = HtmlStripper("", {"img": ["alt"]})
    assert s.strip(b'<img src="u" alt="kitten pic">t') == b"kitten pic t"
    assert s.strip(b"<img alt=bare>t") == b"bare t"


@pytest.mark.spark
def test_strip_udf_in_spark(spark):
    from pyspark.sql import functions as F

    from sphinx_1_spark.functions.stripper import make_strip_udf

    df = spark.createDataFrame(
        [(1, b"<b>hello</b> &amp; <div>world</div>"), (2, None)],
        "id long, html binary",
    )
    out = df.select("id", make_strip_udf()(F.col("html")).alias("text")).collect()
    vals = {r["id"]: r["text"] for r in out}
    assert vals[1] == "hello &  world "
    assert vals[2] is None
