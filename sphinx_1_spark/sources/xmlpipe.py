"""xmlpipe2 data source.

Parses the reference's xmlpipe2 document stream format
(CSphSource_XMLPipe2, src/sphinx.cpp:20481+; element grammar
src/sphinx.cpp:21352-21560; doc/sphinx.txt §3.9):

    <?xml version="1.0" encoding="utf-8"?>
    <sphinx:docset>
      <sphinx:schema>
        <sphinx:field name="title"/>
        <sphinx:field name="content"/>
        <sphinx:attr name="published" type="timestamp"/>
      </sphinx:schema>
      <sphinx:document id="123">
        <title>...</title>
        <content>...</content>
        <published>1234567</published>
      </sphinx:document>
      <sphinx:killlist><id>4</id><id>5</id></sphinx:killlist>
    </sphinx:docset>

The reference reads the stream from an indexer-spawned pipe
(sphDetectXMLPipe, src/sphinx.h:1476) one process at a time; here
each DataFrame row carries one docset string and parsing fans out as
an Arrow-batched mapInPandas stage — a pipe per partition, which is
exactly how one shards xmlpipe feeds at cluster scale.

The reference's expat runs without namespace processing, so the
`sphinx:` prefix needs no xmlns declaration (src/sphinx.cpp:21352
matches on the literal tag name).  Python's ElementTree enforces
declared prefixes, so an xmlns fixup is injected before parsing —
semantics are unchanged.

Attr types (src/sphinx.cpp:21391-21445): int, timestamp, bigint,
bool, float, str2ordinal (kept as string here; ordinalize at build,
see plans/attrs.py ordinals).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_NS_FIXUP = re.compile(r"<sphinx:docset(\s|>)")
_NS_DECL = '<sphinx:docset xmlns:sphinx="sphinx"\\1'
_SPH = "{sphinx}"

_INT_PREFIX = re.compile(r"^\s*[+-]?\d+")
_FLOAT_PREFIX = re.compile(r"^\s*[+-]?(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?")


def _strtoll(v) -> int:
    """C strtol semantics: parse the leading integer, 0 on garbage —
    the reference's attr casters (sphToDword/sphToInt64) never throw,
    and repeated attr elements ('5 5' via CharactersBuffer concat)
    resolve to the leading value exactly as strtol stops at the
    space."""
    m = _INT_PREFIX.match(v or "")
    return int(m.group()) if m else 0


def _strtod(v) -> float:
    m = _FLOAT_PREFIX.match(v or "")
    return float(m.group()) if m else 0.0


def _to_docid(v) -> int:
    """sphToDocid: unsigned 64-bit parse wrapped through the same
    uint64->int64 sign bijection every other docid entry point uses
    (ids above 2^63-1 must not overflow LongType/Arrow)."""
    u = _strtoll(v) & 0xFFFFFFFFFFFFFFFF
    return u - (1 << 64) if u >= (1 << 63) else u


# xmlpipe2 attr type -> (python caster, Spark type); str2ordinal stays
# a string (ordinalization is an index-build step, not a parse step)
_ATTR_TYPES = {
    "int": (_strtoll, LongType()),
    "timestamp": (_strtoll, LongType()),
    "bigint": (_strtoll, LongType()),
    "bool": (lambda v: bool(_strtoll(v)), BooleanType()),
    "float": (_strtod, DoubleType()),
    "str2ordinal": (str, StringType()),
    "string": (str, StringType()),
}


class XmlPipeError(ValueError):
    pass


def parse_docset(xml_text: str) -> dict:
    """One docset string -> {"fields": [...], "attrs": [(name, type)],
    "documents": [{"id": int, <field/attr values>}], "killlist": [ids]}.

    Documents missing a declared field/attr get "" / None (the
    reference warns and substitutes defaults); unknown elements inside
    a document are ignored like the reference's unexpected-element
    warning path (src/sphinx.cpp:21647)."""
    # inject a namespace decl ONLY when the feed declares none — a
    # namespace-proper feed already carries xmlns:sphinx and a second
    # declaration would be an expat duplicate-attribute error
    if "xmlns:sphinx" in xml_text:
        fixed = xml_text
    else:
        fixed = _NS_FIXUP.sub(_NS_DECL, xml_text, count=1)
    try:
        root = ET.fromstring(fixed)
    except ET.ParseError as e:  # pragma: no cover - message passthrough
        raise XmlPipeError(f"malformed xmlpipe2 source: {e}") from e
    m = re.fullmatch(r"(\{[^}]*\})?docset", root.tag)
    if m is None:
        raise XmlPipeError("root element must be <sphinx:docset>")
    # the reference ignores the namespace URI entirely; honor whatever
    # URI the feed bound to the sphinx prefix
    sph = m.group(1) or ""

    fields: list[str] = []
    attrs: list[tuple[str, str]] = []
    defaults: dict[str, object] = {}
    docs: list[dict] = []
    kill: list[int] = []

    schema = root.find(f"{sph}schema")
    if schema is not None:
        for el in schema:
            if el.tag == f"{sph}field":
                if "name" not in el.attrib:
                    # the reference's schema parse errors on a missing
                    # name (src/sphinx.cpp:21391+); keep the module's
                    # typed-error contract instead of a KeyError
                    raise XmlPipeError("<sphinx:field> requires a 'name'")
                fields.append(el.attrib["name"])
            elif el.tag == f"{sph}attr":
                typ = el.attrib.get("type", "int")
                if typ not in _ATTR_TYPES:
                    raise XmlPipeError(f"unknown attr type {typ!r}")
                if "name" not in el.attrib:
                    raise XmlPipeError("<sphinx:attr> requires a 'name'")
                attrs.append((el.attrib["name"], typ))
                if "default" in el.attrib:
                    # schema-declared default for absent attr elements
                    # (ConfigureAttrs default parse, src/sphinx.cpp)
                    defaults[el.attrib["name"]] = _ATTR_TYPES[typ][0](
                        el.attrib["default"]
                    )

    for el in root:
        if el.tag == f"{sph}document":
            if "id" not in el.attrib:
                # src/sphinx.cpp:21478
                raise XmlPipeError("attribute 'id' required in <sphinx:document>")
            did = _to_docid(el.attrib["id"])
            if did == 0:
                # sphToDocid of garbage/zero -> the reference warns
                # "skipped, docid is 0" and drops the document
                continue
            doc: dict = {"id": did}
            # the reference's expat handler accumulates ALL character
            # data of an element (markup-bearing content keeps its
            # text), and repeated field elements concatenate rather
            # than last-one-wins (src/sphinx.cpp:21560 CharactersBuffer)
            by_name: dict = {}
            for c in el:
                content = "".join(c.itertext())
                if c.tag in by_name:
                    by_name[c.tag] += " " + content
                else:
                    by_name[c.tag] = content
            for f in fields:
                doc[f] = by_name.get(f, "")
            for name, typ in attrs:
                raw = by_name.get(name)
                caster = _ATTR_TYPES[typ][0]
                doc[name] = (
                    caster(raw)
                    if raw not in (None, "")
                    else defaults.get(name)
                )
            docs.append(doc)
        elif el.tag == f"{sph}killlist":
            for idel in el:
                if idel.tag != "id":
                    # src/sphinx.cpp:21501
                    raise XmlPipeError(
                        "only 'id' is allowed inside <sphinx:killlist>"
                    )
                kill.append(_to_docid(idel.text or "0"))

    return {"fields": fields, "attrs": attrs, "documents": docs, "killlist": kill}


def xmlpipe_schema(
    fields: tuple[str, ...], attrs: tuple[tuple[str, str], ...] = ()
) -> StructType:
    """Spark schema for a declared xmlpipe2 layout: docid + one string
    column per field + typed attr columns."""
    cols = [StructField("docid", LongType(), False)]
    cols += [StructField(f, StringType(), True) for f in fields]
    cols += [StructField(n, _ATTR_TYPES[t][1], True) for n, t in attrs]
    return StructType(cols)


def read_xmlpipe2(
    xml_df: DataFrame,
    xml_col: str = "xml",
    fields: tuple[str, ...] = ("title", "content"),
    attrs: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """DataFrame of docset strings -> DataFrame(docid, fields...,
    attrs...).  The declared layout must match each docset's
    <sphinx:schema> (schemas are checked for exact match across
    sources in the reference, src/sphinx.h:856-901); killlist entries
    are exposed via read_xmlpipe2_killlist."""
    schema = xmlpipe_schema(fields, attrs)
    names = [f.name for f in schema.fields]

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows: list[list] = []
            for txt in pdf[xml_col]:
                if txt is None:
                    continue
                parsed = parse_docset(txt)
                if tuple(parsed["fields"]) != tuple(fields) or tuple(
                    parsed["attrs"]
                ) != tuple(attrs):
                    raise XmlPipeError(
                        "docset schema mismatch: got "
                        f"{parsed['fields']}/{parsed['attrs']}, "
                        f"declared {list(fields)}/{list(attrs)}"
                    )
                for d in parsed["documents"]:
                    rows.append(
                        [d["id"]] + [d[f] for f in fields]
                        + [d[n] for n, _ in attrs]
                    )
            yield pd.DataFrame(rows, columns=names)

    return xml_df.mapInPandas(gen, schema=schema)


def read_xmlpipe2_killlist(xml_df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """All <sphinx:killlist> ids across the docset stream (applied as
    an anti-join between segments, .spk semantics
    src/sphinx.cpp:9673-9687)."""
    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids: list[int] = []
            for txt in pdf[xml_col]:
                if txt is not None:
                    ids.extend(parse_docset(txt)["killlist"])
            yield pd.DataFrame({"docid": pd.Series(ids, dtype="int64")})

    return xml_df.mapInPandas(
        gen, schema=StructType([StructField("docid", LongType(), False)])
    )
