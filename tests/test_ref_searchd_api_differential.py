"""LIVE binary-SphinxAPI differential: the REAL searchd vs api_query.

The reference's native client protocol (SEARCHD_COMMAND_SEARCH
v.1.22/0x116) reaches daemon surfaces the `search` CLI and SphinxQL
can't: multi-query RunQueries batches, SetOverride, SetGeoAnchor,
SetWeights/SetFieldWeights, SPH_SORT_* modes including TIME_SEGMENTS
and EXPR, exclude filters, group-by with DAY/WEEK/MONTH/YEAR
functions, COUNT(DISTINCT), and SetSelect expressions.  This module
launches the compiled searchd on a plain (binary) listener, speaks
the protocol with a hand-rolled client written from the daemon-side
reader (ParseSearchQuery, src/searchd.cpp:3023-3290; SendResult
:3482-3600), and requires our ApiQuery/api_query/run_queries to
reproduce the daemon's full response: per-query status, field-name
list, attr schema (names + type ids, pinned per case), every match's
(docid, weight, every attr value including MVAs and the virtual
@groupby/@count/@distinct/@geodist/@expr), total, total_found, and
per-word stats.

Wire layout implemented from the daemon source, not copied from the
bundled client: request = [command:H][version:H][bodylen:L] + body,
big-endian throughout; a search body is [nqueries:L] + per-query
blobs in ParseSearchQuery field order; the response is parsed in
SendResult emit order.

Skipped automatically when the reference build is unavailable.
"""

from __future__ import annotations

import os
import random
import socket
import struct
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(__file__))

from test_ref_differential import _ensure_build, ref_bin  # noqa: E402

pytestmark = pytest.mark.skipif(
    not _ensure_build(),
    reason="reference build unavailable (no /root/reference or no g++)",
)

CHARSET = "0..9, A..Z->a..z, _, a..z"
VOCAB = [f"w{i}" for i in range(14)]

# protocol ids (sphinx.h / searchd.cpp)
MATCH_ALL, MATCH_ANY, MATCH_PHRASE, MATCH_BOOLEAN = 0, 1, 2, 3
MATCH_EXTENDED, MATCH_FULLSCAN, MATCH_EXTENDED2 = 4, 5, 6
RANK_IDS = {"proximity_bm25": 0, "bm25": 1, "none": 2, "wordcount": 3,
            "proximity": 4, "matchany": 5, "fieldmask": 6}
SORT_RELEVANCE, SORT_ATTR_DESC, SORT_ATTR_ASC = 0, 1, 2
SORT_TIME_SEGMENTS, SORT_EXTENDED, SORT_EXPR = 3, 4, 5
GROUPBY_DAY, GROUPBY_WEEK, GROUPBY_MONTH, GROUPBY_YEAR, GROUPBY_ATTR = (
    0, 1, 2, 3, 4)
FILTER_VALUES, FILTER_RANGE, FILTER_FLOATRANGE = 0, 1, 2
ATTR_INTEGER, ATTR_TIMESTAMP, ATTR_ORDINAL, ATTR_BOOL = 1, 2, 3, 4
ATTR_FLOAT, ATTR_BIGINT = 5, 6
ATTR_MULTI = 0x40000000
SEARCHD_OK, SEARCHD_ERROR, SEARCHD_RETRY, SEARCHD_WARNING = 0, 1, 2, 3

MODE_NAMES = {MATCH_ALL: "all", MATCH_ANY: "any", MATCH_PHRASE: "phrase",
              MATCH_BOOLEAN: "boolean", MATCH_EXTENDED: "extended2",
              MATCH_EXTENDED2: "extended2"}


def _make_docs():
    """80 docs: int/timestamp/float/MVA attrs plus geo radians."""
    rng = random.Random(4242)
    docs = []
    for did in range(1, 81):
        gid = (did % 5) + 1
        ts = 946684800 + did * 86400 * 3  # 2000-01-01 + 3-day steps
        pr = ((did * 13) % 70) / 10.0
        cat = did % 3
        tag = [] if did % 7 == 0 else sorted({did % 4 + 1, 20 + did % 5})
        lat = 0.8 + (did % 10) * 0.01
        lon = -1.2 + (did % 7) * 0.015
        title = " ".join(rng.choices(VOCAB, k=rng.randint(1, 3)))
        content = " ".join(rng.choices(VOCAB, k=rng.randint(4, 22)))
        docs.append((did, gid, ts, pr, cat, tag, lat, lon, title, content))
    return docs


# ---------------------------------------------------------------------
# hand-rolled binary API client (daemon-side reader order)
# ---------------------------------------------------------------------
def _s(x: str) -> bytes:
    b = x.encode()
    return struct.pack(">L", len(b)) + b


class ApiWire:
    """One searchd binary-API connection (fresh TCP per command, like
    the reference client without SetConnectTimeout persist)."""

    def __init__(self, port: int):
        self.port = port

    def _roundtrip(self, command: int, version: int, body: bytes):
        sock = socket.create_connection(("127.0.0.1", self.port), 15)
        sock.settimeout(15)
        try:
            assert struct.unpack(">L", self._recv(sock, 4))[0] >= 1
            sock.sendall(struct.pack(">L", 1))  # client proto version
            sock.sendall(
                struct.pack(">HHL", command, version, len(body)) + body
            )
            status, ver, length = struct.unpack(
                ">HHL", self._recv(sock, 8)
            )
            payload = self._recv(sock, length)
            return status, ver, payload
        finally:
            sock.close()

    @staticmethod
    def _recv(sock, n):
        out = b""
        while len(out) < n:
            chunk = sock.recv(n - len(out))
            if not chunk:
                raise ConnectionError("daemon closed the connection")
            out += chunk
        return out

    # -- request ------------------------------------------------------
    @staticmethod
    def query_blob(
        query: str,
        mode: int = MATCH_EXTENDED2,
        ranker: int = 0,
        sort: int = SORT_RELEVANCE,
        sortby: str = "",
        weights: tuple = (),
        index: str = "main",
        id_range: tuple = (0, 0),
        filters: tuple = (),
        groupfunc: int = GROUPBY_DAY,
        groupby: str = "",
        maxmatches: int = 1000,
        groupsort: str = "@group desc",
        cutoff: int = 0,
        distinct: str = "",
        geo: tuple | None = None,
        fieldweights: tuple = (),
        overrides: tuple = (),
        select: str = "*",
        offset: int = 0,
        limit: int = 20,
    ) -> bytes:
        """One query in ParseSearchQuery read order (iVer=0x116)."""
        req = [struct.pack(">5L", offset, limit, mode, ranker, sort)]
        req.append(_s(sortby))
        req.append(_s(query))
        req.append(struct.pack(">L", len(weights)))
        for w in weights:
            req.append(struct.pack(">L", w))
        req.append(_s(index))
        req.append(struct.pack(">L", 1))  # id64 range marker
        req.append(struct.pack(">QQ", *id_range))
        req.append(struct.pack(">L", len(filters)))
        for f in filters:
            req.append(_s(f["attr"]))
            req.append(struct.pack(">L", f["type"]))
            if f["type"] == FILTER_VALUES:
                req.append(struct.pack(">L", len(f["values"])))
                for v in f["values"]:
                    req.append(struct.pack(">q", v))
            elif f["type"] == FILTER_RANGE:
                req.append(struct.pack(">qq", f["min"], f["max"]))
            else:
                req.append(struct.pack(">ff", f["min"], f["max"]))
            req.append(struct.pack(">L", 1 if f.get("exclude") else 0))
        req.append(struct.pack(">L", groupfunc))
        req.append(_s(groupby))
        req.append(struct.pack(">L", maxmatches))
        req.append(_s(groupsort))
        req.append(struct.pack(">3L", cutoff, 0, 0))  # retries
        req.append(_s(distinct))
        if geo:
            lat_attr, lon_attr, lat, lon = geo
            req.append(struct.pack(">L", 1))
            req.append(_s(lat_attr))
            req.append(_s(lon_attr))
            req.append(struct.pack(">ff", lat, lon))
        else:
            req.append(struct.pack(">L", 0))
        req.append(struct.pack(">L", 0))  # index weights
        req.append(struct.pack(">L", 0))  # max query time
        req.append(struct.pack(">L", len(fieldweights)))
        for name, w in fieldweights:
            req.append(_s(name))
            req.append(struct.pack(">L", w))
        req.append(_s(""))  # comment
        req.append(struct.pack(">L", len(overrides)))
        for attr, atype, values in overrides:
            req.append(_s(attr))
            req.append(struct.pack(">LL", atype, len(values)))
            for docid, val in values.items():
                req.append(struct.pack(">Q", docid))
                if atype == ATTR_FLOAT:
                    req.append(struct.pack(">f", val))
                elif atype == ATTR_BIGINT:
                    req.append(struct.pack(">q", val))
                else:
                    req.append(struct.pack(">L", val))
        req.append(_s(select))
        return b"".join(req)

    def update(self, index: str, attrs: list[str],
               rows: dict[int, tuple]) -> int:
        """SEARCHD_COMMAND_UPDATE v.1.2 (HandleCommandUpdate,
        src/searchd.cpp:5000-5080): int attr updates — a per-attr MVA
        flag switches the value encoding to count + DWORDs.  A value
        given as a list/tuple marks that attr MVA; scalars stay
        plain.  Returns the daemon's updated-row count."""
        first = next(iter(rows.values()))
        mva = [isinstance(v, (list, tuple)) for v in first]
        body = _s(index)
        body += struct.pack(">L", len(attrs))
        for a, m in zip(attrs, mva):
            body += _s(a) + struct.pack(">L", 1 if m else 0)
        body += struct.pack(">L", len(rows))
        for docid, vals in rows.items():
            body += struct.pack(">Q", docid)
            for v, m in zip(vals, mva):
                if m:
                    body += struct.pack(">L", len(v))
                    for x in v:
                        body += struct.pack(">L", x)
                else:
                    body += struct.pack(">L", v)
        status, _, p = self._roundtrip(2, 0x102, body)
        if status != SEARCHD_OK:
            raise RuntimeError(p[4:].rstrip(b"\x00").decode())
        return struct.unpack(">L", p[:4])[0]

    def keywords(self, query: str, index: str = "main",
                 stats: bool = True) -> list[dict]:
        """SEARCHD_COMMAND_KEYWORDS (HandleCommandKeywords,
        src/searchd.cpp:4960-5010): per-token tokenized/normalized
        (+docs/hits when stats)."""
        body = _s(query) + _s(index) + struct.pack(">L", 1 if stats else 0)
        status, _, p = self._roundtrip(3, 0x100, body)
        if status != SEARCHD_OK:
            raise RuntimeError(p[4:].rstrip(b"\x00").decode())
        pos = 0

        def L():
            nonlocal pos
            v = struct.unpack_from(">L", p, pos)[0]
            pos += 4
            return v

        def S():
            nonlocal pos
            n = L()
            v = p[pos : pos + n].decode()
            pos += n
            return v

        out = []
        for _ in range(L()):
            kw = {"tokenized": S(), "normalized": S()}
            if stats:
                kw["docs"] = L()
                kw["hits"] = L()
            out.append(kw)
        assert pos == len(p)
        return out

    def search(self, blobs: list[bytes]) -> list[dict]:
        """RunQueries: one request, N result sets (SendResult order)."""
        body = struct.pack(">L", len(blobs)) + b"".join(blobs)
        status, ver, p = self._roundtrip(0, 0x116, body)  # SEARCH
        if status == SEARCHD_ERROR:
            raise RuntimeError(p[4:].decode())
        results = []
        pos = 0
        for _ in range(blobs and len(blobs) or 0):
            res, pos = self._parse_result(p, pos)
            results.append(res)
        assert pos == len(p), (pos, len(p))
        return results

    @staticmethod
    def _parse_result(p: bytes, pos: int):
        def L():
            nonlocal pos
            v = struct.unpack_from(">L", p, pos)[0]
            pos += 4
            return v

        def Q():
            nonlocal pos
            v = struct.unpack_from(">Q", p, pos)[0]
            pos += 8
            return v

        def F():
            nonlocal pos
            v = struct.unpack_from(">f", p, pos)[0]
            pos += 4
            return v

        def S():
            nonlocal pos
            n = L()
            v = p[pos : pos + n].decode()
            pos += n
            return v

        res: dict = {"status": L()}
        if res["status"] == SEARCHD_ERROR:
            res["error"] = S()
            return res, pos
        if res["status"] == SEARCHD_WARNING:
            res["warning"] = S()
        res["fields"] = [S() for _ in range(L())]
        res["attrs"] = [(S(), L()) for _ in range(L())]
        count = L()
        id64 = L()
        matches = []
        for _ in range(count):
            docid = Q() if id64 else L()
            weight = L()
            vals = []
            for name, atype in res["attrs"]:
                if atype & ATTR_MULTI:
                    vals.append(tuple(L() for _ in range(L())))
                elif atype == ATTR_FLOAT:
                    vals.append(round(F(), 4))
                elif atype == ATTR_BIGINT:
                    vals.append(Q())
                else:
                    vals.append(L())
            matches.append((docid, weight, tuple(vals)))
        res["matches"] = matches
        res["total"] = L()
        res["total_found"] = L()
        res["time_msec"] = L()
        res["words"] = [(S(), L(), L()) for _ in range(L())]
        return res, pos


# ---------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------
def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def daemon(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("searchd_api")
    docs = _make_docs()
    xml = [
        '<?xml version="1.0" encoding="utf-8"?>',
        "<sphinx:docset>",
        "<sphinx:schema>",
        '<sphinx:field name="title"/>',
        '<sphinx:field name="content"/>',
        '<sphinx:attr name="gid" type="int" bits="32"/>',
        '<sphinx:attr name="ts" type="timestamp"/>',
        '<sphinx:attr name="pr" type="float"/>',
        '<sphinx:attr name="cat" type="int" bits="32"/>',
        '<sphinx:attr name="tag" type="multi"/>',
        '<sphinx:attr name="lat" type="float"/>',
        '<sphinx:attr name="lon" type="float"/>',
        "</sphinx:schema>",
    ]
    for did, gid, ts, pr, cat, tag, lat, lon, title, content in docs:
        xml.append(
            f'<sphinx:document id="{did}"><title>{title}</title>'
            f"<content>{content}</content><gid>{gid}</gid><ts>{ts}</ts>"
            f"<pr>{pr}</pr><cat>{cat}</cat>"
            f'<tag>{",".join(map(str, tag))}</tag>'
            f"<lat>{lat!r}</lat><lon>{lon!r}</lon></sphinx:document>"
        )
    xml.append("</sphinx:docset>")
    (tmp / "docs.xml").write_text("\n".join(xml), encoding="utf-8")
    port = _free_port()
    (tmp / "sphinx.conf").write_text(
        f"""
source src1 {{
    type = xmlpipe2
    xmlpipe_command = cat {tmp}/docs.xml
}}
index main {{
    source = src1
    path = {tmp}/idx
    charset_type = utf-8
    charset_table = {CHARSET}
}}
index morph {{
    source = src1
    path = {tmp}/idx_morph
    charset_type = utf-8
    charset_table = {CHARSET}
    morphology = stem_en
}}
searchd {{
    listen = 127.0.0.1:{port}
    log = {tmp}/searchd.log
    pid_file = {tmp}/searchd.pid
}}
"""
    )
    r = subprocess.run(
        [ref_bin("indexer"), "--config", str(tmp / "sphinx.conf"), "--all"],
        capture_output=True,
        cwd=tmp,
        timeout=120,
    )
    assert r.returncode == 0, r.stdout.decode()[-1500:]
    proc = subprocess.Popen(
        [ref_bin("searchd"), "--config", str(tmp / "sphinx.conf"), "--console"],
        stdout=open(tmp / "console.log", "w"),
        stderr=subprocess.STDOUT,
        cwd=tmp,
    )
    try:
        deadline = time.time() + 15
        while True:
            try:
                socket.create_connection(("127.0.0.1", port), 1).close()
                break
            except OSError:
                if time.time() > deadline:
                    raise
                time.sleep(0.1)
        yield {"port": port, "docs": docs, "cli": ApiWire(port)}
    finally:
        proc.terminate()
        try:
            proc.wait(10)
        except subprocess.TimeoutExpired:
            proc.kill()


@pytest.fixture(scope="module")
def ours(spark, daemon):
    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.plans.engine import IndexSettings, SphinxIndex

    df = spark.createDataFrame(
        [
            (did, gid, ts, float(pr), cat, tag, float(lat), float(lon),
             title, content)
            for did, gid, ts, pr, cat, tag, lat, lon, title, content
            in daemon["docs"]
        ],
        "docid long, gid int, ts long, pr float, cat int, tag array<int>,"
        " lat float, lon float, title string, content string",
    )
    idx = SphinxIndex.build(
        df,
        IndexSettings(
            docid_col="docid",
            fields=("title", "content"),
            attrs=("gid", "ts", "pr", "cat", "tag", "lat", "lon"),
            tokenizer=TokenizerSettings(charset_table=CHARSET),
            tokenizer_impl="arrow",
            enable_star=False,
        ),
        persist=True,
    )
    return {"idx": idx}


# the daemon's index-attr schema for `SELECT *` (pinned; virtual attrs
# append per query shape)
BASE_ATTRS = [
    ("gid", ATTR_INTEGER), ("ts", ATTR_TIMESTAMP), ("pr", ATTR_FLOAT),
    ("cat", ATTR_INTEGER), ("tag", ATTR_MULTI | ATTR_INTEGER),
    ("lat", ATTR_FLOAT), ("lon", ATTR_FLOAT),
]
ATTR_NAMES = [n for n, _ in BASE_ATTRS]


def _ours_query(ours, aq, attr_names=ATTR_NAMES, extra=()):
    """api_query -> daemon-shaped (matches, total, total_found, words):
    matches = [(docid, weight, (attr values...))]."""
    from sphinx_1_spark.plans.api import api_query

    rows, meta = api_query([("main", ours["idx"], None)], aq)
    matches = []
    for r in rows:
        vals = []
        for name in list(attr_names) + list(extra):
            v = r[name]
            if isinstance(v, float):
                v = round(v, 4)
            elif isinstance(v, list):
                v = tuple(v)
            elif v is None:
                v = ()
            vals.append(v)
        matches.append((r["docid"], r["weight"], tuple(vals)))
    words = [(w, st["docs"], st["hits"]) for w, st in meta["words"].items()]
    return matches, meta["total"], meta["total_found"], words


def _norm_daemon(res):
    return (res["matches"], res["total"], res["total_found"], res["words"])


def _assert_result_equal(dres, ores, check_words=True):
    dmatches, dtotal, dfound, dwords = dres
    omatches, ototal, ofound, owords = ores
    assert dtotal == ototal, (dtotal, ototal)
    assert dfound == ofound, (dfound, ofound)
    assert len(dmatches) == len(omatches)
    for i, (d, o) in enumerate(zip(dmatches, omatches)):
        assert d == o, (i, d, o)
    if check_words:
        assert dwords == owords, (dwords, owords)


# ---------------------------------------------------------------------
# the battery
# ---------------------------------------------------------------------
def _F():
    from pyspark.sql import functions as F

    return F


def _aq(**kw):
    from sphinx_1_spark.plans.api import ApiQuery

    kw.setdefault("mode", "extended2")
    kw.setdefault("score_mode", "exact32")
    return ApiQuery(**kw)


MATCH_CASES = [
    ("w3", MATCH_EXTENDED2), ("w1 w5", MATCH_EXTENDED2),
    ('"w1 w2"', MATCH_EXTENDED2), ("@title w4", MATCH_EXTENDED2),
    ("w0 -w13", MATCH_EXTENDED2), ("w2 | w9", MATCH_EXTENDED2),
    ("w3 w5", MATCH_ALL), ("w3 w5 w7", MATCH_ANY),
    ("w1 w2", MATCH_PHRASE), ("w3 -w5", MATCH_BOOLEAN),
    ("w2 | w9", MATCH_EXTENDED),
]


@pytest.mark.parametrize("query,mode", MATCH_CASES)
def test_match_modes(daemon, ours, query, mode):
    """Every match mode: docid+weight+every attr value (incl. MVA),
    totals and per-word stats identical to the daemon."""
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(query, mode=mode, limit=60)]
    )[0]
    assert dres["status"] == SEARCHD_OK
    assert dres["fields"] == ["title", "content"]
    assert dres["attrs"] == BASE_ATTRS
    ores = _ours_query(
        ours, _aq(query=query, mode=MODE_NAMES[mode], limit=60)
    )
    _assert_result_equal(_norm_daemon(dres), ores)


SORT_CASES = [
    (SORT_ATTR_DESC, "ts", "attr_desc"),
    (SORT_ATTR_ASC, "gid", "attr_asc"),
    (SORT_EXTENDED, "@weight desc, pr asc, @id desc", "extended"),
    (SORT_EXTENDED, "gid asc, ts desc", "extended"),
]


@pytest.mark.parametrize("sort,sortby,our_sort", SORT_CASES)
def test_sort_modes(daemon, ours, sort, sortby, our_sort):
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob("w3", sort=sort, sortby=sortby, limit=60)]
    )[0]
    ores = _ours_query(
        ours, _aq(query="w3", sortmode=our_sort, sortby=sortby, limit=60)
    )
    _assert_result_equal(_norm_daemon(dres), ores)


def test_sort_time_segments(daemon, ours):
    """SPH_SORT_TIME_SEGMENTS buckets ts against the server's NOW();
    every doc is in the 'older' segment (corpus ts = year 2000), so
    the segment boundary cannot flake across the two clocks."""
    import time as _time

    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(
            "w3", sort=SORT_TIME_SEGMENTS, sortby="ts", limit=60)]
    )[0]
    ores = _ours_query(
        ours,
        _aq(query="w3", sortmode="time_segments", sortby="ts",
            now_epoch=int(_time.time()), limit=60),
    )
    _assert_result_equal(_norm_daemon(dres), ores)


def test_sort_expr(daemon, ours):
    """SPH_SORT_EXPR: float32 @expr virtual attr, (@expr desc, id asc)."""
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(
            "w3", sort=SORT_EXPR, sortby="gid*2+pr", limit=60)]
    )[0]
    assert dres["attrs"] == BASE_ATTRS + [("@expr", ATTR_FLOAT)]
    ores = _ours_query(
        ours,
        _aq(query="w3", sortmode="expr", sortby="gid*2+pr", limit=60),
        extra=("@expr",),
    )
    _assert_result_equal(_norm_daemon(dres), ores)


def test_geoanchor(daemon, ours):
    """SetGeoAnchor: @geodist float appended; the engine replicates
    the compiled binary's float32 haversine semantics (f32 inputs, f32
    deltas, f32 cosf product — see functions/exprs.py geodist, derived
    from this differential + the Eval disassembly).  Comparison allows
    ONE float32 ulp on @geodist only: glibc's cosf is not correctly
    rounded for every input (e.g. cosf(0.85f) is 1 ulp above the
    correctly-rounded value the JVM path produces), so bit-exactness
    there would pin a libm artifact, not the reference's semantics.
    Everything else — match order, weights, attrs — is exact."""
    import numpy as np

    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(
            "w3", sort=SORT_EXTENDED, sortby="@geodist asc, @id asc",
            geo=("lat", "lon", 0.85, -1.15), limit=60)]
    )[0]
    assert dres["attrs"] == BASE_ATTRS + [("@geodist", ATTR_FLOAT)]
    from sphinx_1_spark.plans.api import api_query

    rows, meta = api_query(
        [("main", ours["idx"], None)],
        _aq(query="w3", sortmode="extended", sortby="@geodist asc, @id asc",
            geoanchor=("lat", "lon", 0.85, -1.15), limit=60),
    )
    assert meta["total"] == dres["total"]
    assert meta["total_found"] == dres["total_found"]
    assert len(rows) == len(dres["matches"])
    n_exact = 0
    for r, (ddid, dweight, dvals) in zip(rows, dres["matches"]):
        assert r["docid"] == ddid and r["weight"] == dweight
        for name, dv in zip(ATTR_NAMES, dvals):
            ov = r[name]
            ov = tuple(ov) if isinstance(ov, list) else (
                round(ov, 4) if isinstance(ov, float) else
                () if ov is None else ov)
            assert ov == dv, (ddid, name, ov, dv)
        # @geodist arrives 4dp-rounded from _parse_result; allow one
        # f32 ulp (plus the 4dp rounding slack) around our raw value
        # cosf applies twice (point AND anchor cosine), so its 1-ulp
        # rounding can compound to 2 f32 ulps in the product
        ogd = np.float32(r["@geodist"])
        dgd = float(dvals[-1])
        assert abs(float(ogd) - dgd) <= 2 * float(np.spacing(ogd)) + 1e-4, (
            ddid, float(ogd), dgd)
        n_exact += round(float(ogd), 4) == dgd
    # the structural f32 semantics must make a solid share bit-equal
    # (the pure-double formula matched 0 of the drifted values)
    assert n_exact >= len(rows) // 2, (n_exact, len(rows))


def _filters_ours(spec):
    F = _F()
    out = []
    for f in spec:
        c = F.col(f["attr"])
        if f["type"] == FILTER_VALUES:
            cond = c.isin(f["values"])
        elif f["type"] == FILTER_RANGE:
            cond = c.between(f["min"], f["max"])
        else:
            cond = c.between(f["min"], f["max"])
        out.append(~cond if f.get("exclude") else cond)
    return out


FILTER_CASES = [
    ({"attr": "gid", "type": FILTER_VALUES, "values": [2, 4]},),
    ({"attr": "gid", "type": FILTER_VALUES, "values": [3], "exclude": 1},),
    ({"attr": "gid", "type": FILTER_RANGE, "min": 2, "max": 4},),
    ({"attr": "gid", "type": FILTER_RANGE, "min": 2, "max": 4,
      "exclude": 1},),
    ({"attr": "pr", "type": FILTER_FLOATRANGE, "min": 1.0, "max": 4.0},),
    ({"attr": "pr", "type": FILTER_FLOATRANGE, "min": 1.0, "max": 4.0,
      "exclude": 1},),
    ({"attr": "tag", "type": FILTER_VALUES, "values": [3, 22]},),
    ({"attr": "gid", "type": FILTER_VALUES, "values": [2, 4]},
     {"attr": "pr", "type": FILTER_FLOATRANGE, "min": 0.5, "max": 5.0}),
]


@pytest.mark.parametrize("spec", FILTER_CASES)
def test_filters(daemon, ours, spec):
    """Values/range/floatrange filters, include and EXCLUDE (the API
    exclude works, unlike SphinxQL NOT IN's $4 bug) — and the MVA
    values filter matches if ANY stored value qualifies."""
    F = _F()
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob("w3", filters=spec, limit=60)]
    )[0]
    filters = []
    for f in spec:
        if f["attr"] == "tag":  # MVA: any-value-qualifies
            cond = F.arrays_overlap(
                F.col("tag"), F.array(*[F.lit(v) for v in f["values"]])
            )
            filters.append(~cond if f.get("exclude") else cond)
        else:
            filters.extend(_filters_ours([f]))
    ores = _ours_query(ours, _aq(query="w3", filters=filters, limit=60))
    assert dres["matches"], spec
    _assert_result_equal(_norm_daemon(dres), ores)


def test_id_range(daemon, ours):
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob("w3", id_range=(20, 60), limit=60)]
    )[0]
    ores = _ours_query(
        ours, _aq(query="w3", id_range=(20, 60), limit=60)
    )
    assert dres["matches"]
    _assert_result_equal(_norm_daemon(dres), ores)


GROUP_CASES = [
    (GROUPBY_ATTR, "gid", "@group desc", "attr"),
    (GROUPBY_ATTR, "cat", "@count desc", "attr"),
    (GROUPBY_DAY, "ts", "@group desc", "day"),
    (GROUPBY_WEEK, "ts", "@group desc", "week"),
    (GROUPBY_MONTH, "ts", "@group asc", "month"),
    (GROUPBY_YEAR, "ts", "@group desc", "year"),
]


@pytest.mark.parametrize("gfunc,gattr,gsort,our_gfunc", GROUP_CASES)
def test_group_by(daemon, ours, gfunc, gattr, gsort, our_gfunc):
    """GROUPBY_ATTR/DAY/WEEK/MONTH/YEAR with COUNT(DISTINCT cat):
    @groupby/@count/@distinct virtual attrs value-identical."""
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(
            "w3", groupfunc=gfunc, groupby=gattr, groupsort=gsort,
            distinct="cat", limit=60)]
    )[0]
    assert dres["attrs"] == BASE_ATTRS + [
        ("@groupby", ATTR_INTEGER), ("@count", ATTR_INTEGER),
        ("@distinct", ATTR_INTEGER),
    ]
    ores = _ours_query(
        ours,
        _aq(query="w3", groupattr=gattr, groupfunc=our_gfunc,
            groupsort=gsort, groupdistinct="cat", limit=60),
        extra=("@groupby", "@count", "@distinct"),
    )
    _assert_result_equal(_norm_daemon(dres), ores)


def test_select_expression(daemon, ours):
    """SetSelect works on the API path (unlike SphinxQL, whose select
    list is parsed-but-dropped): computed attrs append to the schema."""
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(
            "w3", select="*, gid*2+pr as g2", limit=60)]
    )[0]
    assert dres["attrs"] == BASE_ATTRS + [("g2", ATTR_FLOAT)]
    ores = _ours_query(
        ours,
        _aq(query="w3", select=[("g2", "gid*2+pr")], limit=60),
        extra=("g2",),
    )
    _assert_result_equal(_norm_daemon(dres), ores)


def test_field_weights(daemon, ours):
    """SetFieldWeights through the daemon (BindWeights, src/sphinx.cpp:
    14574-14595) in legacy ALL mode ranking."""
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(
            "w3 w5", mode=MATCH_ALL,
            fieldweights=(("title", 10), ("content", 3)), limit=60)]
    )[0]
    ores = _ours_query(
        ours,
        _aq(query="w3 w5", mode="all", field_weights=[10, 3], limit=60),
    )
    _assert_result_equal(_norm_daemon(dres), ores)


def test_legacy_weights_list(daemon, ours):
    """SetWeights (positional legacy list) rides the same BindWeights
    path; a short list pads remaining fields to 1."""
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(
            "w3 w5", mode=MATCH_ALL, weights=(7,), limit=60)]
    )[0]
    ores = _ours_query(
        ours, _aq(query="w3 w5", mode="all", field_weights=[7], limit=60)
    )
    _assert_result_equal(_norm_daemon(dres), ores)


@pytest.mark.parametrize("ranker", sorted(RANK_IDS))
def test_rankers(daemon, ours, ranker):
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(
            "w3 w5", ranker=RANK_IDS[ranker], limit=60)]
    )[0]
    ores = _ours_query(
        ours, _aq(query="w3 w5", ranker=ranker, limit=60)
    )
    _assert_result_equal(_norm_daemon(dres), ores)


def test_cutoff_and_max_matches(daemon, ours):
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob("w3", cutoff=7, limit=60),
         daemon["cli"].query_blob("w3", maxmatches=5, limit=60)]
    )
    o1 = _ours_query(ours, _aq(query="w3", cutoff=7, limit=60))
    o2 = _ours_query(
        ours, _aq(query="w3", max_matches=5, limit=60)
    )
    _assert_result_equal(_norm_daemon(dres[0]), o1)
    _assert_result_equal(_norm_daemon(dres[1]), o2)


def test_offset_paging(daemon, ours):
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob("w3", offset=5, limit=10)]
    )[0]
    ores = _ours_query(ours, _aq(query="w3", offset=5, limit=10))
    assert len(dres["matches"]) == 10
    _assert_result_equal(_norm_daemon(dres), ores)


def test_fullscan_empty_query(daemon, ours):
    """Empty query = fullscan, weight 1 per match."""
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(
            "", mode=MATCH_ALL, sort=SORT_ATTR_ASC, sortby="ts",
            filters=({"attr": "gid", "type": FILTER_VALUES,
                      "values": [2]},), limit=60)]
    )[0]
    F = _F()
    ores = _ours_query(
        ours,
        _aq(query="", mode="all", sortmode="attr_asc", sortby="ts",
            filters=[F.col("gid").isin([2])], limit=60),
    )
    assert dres["matches"] and all(m[1] == 1 for m in dres["matches"])
    _assert_result_equal(_norm_daemon(dres), ores, check_words=False)


def test_multi_query_batch(daemon, ours):
    """RunQueries: one request, N independent result sets — including
    a multi-queue-eligible pair (identical match relation, different
    sorters) and an ineligible third; elementwise identical to our
    run_queries batch."""
    from sphinx_1_spark.plans.api import run_queries

    blobs = [
        daemon["cli"].query_blob("w3", limit=60),
        daemon["cli"].query_blob(
            "w3", sort=SORT_ATTR_ASC, sortby="gid", limit=60),
        daemon["cli"].query_blob("w5", limit=60),
    ]
    dres = daemon["cli"].search(blobs)
    aqs = [
        _aq(query="w3", limit=60),
        _aq(query="w3", sortmode="attr_asc", sortby="gid", limit=60),
        _aq(query="w5", limit=60),
    ]
    batch = run_queries([("main", ours["idx"], None)], aqs)
    for d, (rows, meta) in zip(dres, batch):
        matches = []
        for r in rows:
            vals = []
            for name in ATTR_NAMES:
                v = r[name]
                if isinstance(v, float):
                    v = round(v, 4)
                elif isinstance(v, list):
                    v = tuple(v)
                elif v is None:
                    v = ()
                vals.append(v)
            matches.append((r["docid"], r["weight"], tuple(vals)))
        words = [(w, st["docs"], st["hits"])
                 for w, st in meta["words"].items()]
        _assert_result_equal(
            _norm_daemon(d),
            (matches, meta["total"], meta["total_found"], words),
        )


def test_query_error_text(daemon, ours):
    """A malformed MATCH query: the daemon answers a per-query
    SEARCHD_ERROR with bison's %error-verbose framing ("index main:
    syntax error, unexpected $end near ''"); our hand-written parser
    rejects the same input with its own message (documented wording
    deviation — bison's near-token framing is generator-specific)."""
    from sphinx_1_spark.plans.api import api_query
    from sphinx_1_spark.plans.parser import QueryParseError

    dres = daemon["cli"].search(
        [daemon["cli"].query_blob("(unclosed", limit=10)]
    )[0]
    assert dres["status"] == SEARCHD_ERROR
    assert dres["error"] == (
        "index main: syntax error, unexpected $end near ''"
    )
    with pytest.raises(QueryParseError):
        api_query(
            [("main", ours["idx"], None)], _aq(query="(unclosed", limit=10)
        )


# ---------------------------------------------------------------------
# overrides: row-level substitution vs zone-map pruning
# ---------------------------------------------------------------------
def test_override_substitution_and_sort(daemon, ours):
    """SetOverride: results and sorting see the overridden value."""
    ov = (("gid", ATTR_INTEGER, {8: 99, 19: 98}),)
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(
            "w3", sort=SORT_ATTR_DESC, sortby="gid",
            overrides=ov, limit=60)]
    )[0]
    assert [m[0] for m in dres["matches"][:2]] == [8, 19]
    assert dres["matches"][0][2][0] == 99  # gid column substituted
    ores = _ours_query(
        ours,
        _aq(query="w3", sortmode="attr_desc", sortby="gid",
            overrides={"gid": {8: 99, 19: 98}}, limit=60),
    )
    _assert_result_equal(_norm_daemon(dres), ores)


def test_override_filter_row_level(daemon, ours):
    """Row-level filtering sees the OVERRIDDEN value: doc 8 (original
    gid 4, overridden 99) fails gid IN (4) and passes gid IN (1,4,99)
    — identical both sides (the filter set stays inside the index's
    original value range, so no zone-map pruning interferes)."""
    F = _F()
    ov = (("gid", ATTR_INTEGER, {8: 99}),)
    for values in ([4], [1, 4, 99]):
        dres = daemon["cli"].search(
            [daemon["cli"].query_blob(
                "w3", overrides=ov,
                filters=({"attr": "gid", "type": FILTER_VALUES,
                          "values": values},), limit=60)]
        )[0]
        ores = _ours_query(
            ours,
            _aq(query="w3", overrides={"gid": {8: 99}},
                filters=[F.col("gid").isin(values)], limit=60),
        )
        has8 = 8 in [m[0] for m in dres["matches"]]
        assert has8 == (99 in values)
        _assert_result_equal(_norm_daemon(dres), ores)


def test_override_zone_map_pruning_divergence(daemon, ours):
    """PINNED reference emergent behavior: the daemon's docinfo block
    index (128-row min/max, built at preread over ORIGINAL values,
    src/sphinx.cpp:15608-15700) EvalBlock-prunes before the row-level
    filter ever sees overridden values (CopyDocinfo patches,
    :11083-11088; whole-index reject :16362-16371).  A filter whose
    range lies outside the original value range therefore matches
    NOTHING even when an override would satisfy it: gid IN (99) -> []
    live.  Our zone maps are parquet row-group stats over the PATCHED
    docinfo, so the overridden match IS found — a documented
    deviation (the override is real for filtering)."""
    F = _F()
    ov = (("gid", ATTR_INTEGER, {8: 99}),)
    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(
            "w3", overrides=ov,
            filters=({"attr": "gid", "type": FILTER_VALUES,
                      "values": [99]},), limit=60)]
    )[0]
    assert dres["matches"] == []  # the daemon's zone-map prune, live
    ores = _ours_query(
        ours,
        _aq(query="w3", overrides={"gid": {8: 99}},
            filters=[F.col("gid").isin([99])], limit=60),
    )
    assert [m[0] for m in ores[0]] == [8]  # ours finds the override


def test_override_type_mismatch_error(daemon, ours):
    """Type-mismatched override: the daemon's exact error text."""
    from sphinx_1_spark.plans.api import ApiQueryError, api_query

    dres = daemon["cli"].search(
        [daemon["cli"].query_blob(
            "w3", overrides=(("gid", ATTR_FLOAT, {8: 1.5}),), limit=10)]
    )[0]
    assert dres["status"] == SEARCHD_ERROR
    assert dres["error"] == (
        "index main: attribute override: attribute 'gid' type mismatch"
        " (index=1, query=5)"
    )
    # ours rejects coercion mismatches through its own validation
    with pytest.raises(ApiQueryError):
        api_query(
            [("main", ours["idx"], None)],
            _aq(query="w3",
                overrides={"nosuchattr": {8: 1}}, limit=10),
        )


# ---------------------------------------------------------------------
# BuildKeywords + UpdateAttributes commands
# ---------------------------------------------------------------------
@pytest.mark.parametrize("stats", [True, False])
def test_build_keywords_live(daemon, ours, stats):
    """BuildKeywords vs our build_keywords: token order, tokenized/
    normalized forms, docs/hits (0 for unknown words; 0/0 without
    stats — the daemon's bGetStats branch)."""
    q = "w3 w5 nosuchword w3"
    dres = daemon["cli"].keywords(q, "main", stats=stats)
    ores = ours["idx"].build_keywords(q, stats=stats)
    assert len(dres) == len(ores) == 4
    for d, o in zip(dres, ores):
        assert d["tokenized"] == o["tokenized"]
        assert d["normalized"] == o["normalized"]
        if stats:
            assert d["docs"] == o["docs"] and d["hits"] == o["hits"], (d, o)


def test_build_keywords_morphology_live(spark, daemon):
    """BuildKeywords on a stem_en index: normalized carries the
    stemmed form while tokenized keeps the folded raw token."""
    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.plans.engine import IndexSettings, SphinxIndex

    df = spark.createDataFrame(
        [
            (did, title, content)
            for did, _, _, _, _, _, _, _, title, content in daemon["docs"]
        ],
        "docid long, title string, content string",
    )
    idx = SphinxIndex.build(
        df,
        IndexSettings(
            docid_col="docid",
            fields=("title", "content"),
            tokenizer=TokenizerSettings(
                charset_table=CHARSET, morphology=("stem_en",)
            ),
            tokenizer_impl="arrow",
            enable_star=False,
        ),
        persist=True,
    )
    q = "running books w3 connection"
    dres = daemon["cli"].keywords(q, "morph", stats=True)
    ores = idx.build_keywords(q, stats=True)
    assert [d["tokenized"] for d in dres] == ["running", "books", "w3",
                                              "connection"]
    assert [d["normalized"] for d in dres] == ["run", "book", "w3",
                                               "connect"]
    assert len(ores) == len(dres)
    for d, o in zip(dres, ores):
        assert d == o, (d, o)


def test_update_attributes_live(daemon, ours):
    """UpdateAttributes through the daemon: scalar pokes apply to
    subsequent queries, missing docids are not counted; our
    copy-on-write update_attributes answers identically.  Restores
    the original values afterward (module-scoped daemon)."""
    import copy

    from sphinx_1_spark.plans.attrs import update_attributes

    cli = daemon["cli"]
    orig = {d[0]: (d[1], d[4]) for d in daemon["docs"]}  # gid, cat
    changed = {3: (77, 1), 9: (78, 2)}
    try:
        n = cli.update("main", ["gid", "cat"],
                       {**changed, 999999: (1, 1)})
        assert n == 2  # the missing docid is not counted

        dres = cli.search([cli.query_blob(
            "w3", filters=({"attr": "gid", "type": FILTER_VALUES,
                            "values": [77, 78]},), limit=60)])[0]
        F = _F()
        patched = copy.copy(ours["idx"])
        upd = patched.docinfo.sparkSession.createDataFrame(
            [(did, g, c) for did, (g, c) in changed.items()],
            "docid long, gid int, cat int",
        )
        patched.docinfo = update_attributes(
            patched.docinfo, upd, ["gid", "cat"]
        )
        from sphinx_1_spark.plans.api import api_query

        rows, meta = api_query(
            [("main", patched, None)],
            _aq(query="w3", filters=[F.col("gid").isin([77, 78])],
                limit=60),
        )
        # doc 3 matches w3 in this corpus; doc 9 may or may not — the
        # daemon is the oracle for the exact match set
        assert [m[0] for m in dres["matches"]] == [r["docid"] for r in rows]
        assert dres["matches"], "update must be observable via filter"
        for m, r in zip(dres["matches"], rows):
            assert m[1] == r["weight"]
            assert m[2][0] == r["gid"] and m[2][3] == r["cat"]
        assert dres["total_found"] == meta["total_found"]
    finally:
        cli.update("main", ["gid", "cat"],
                   {did: orig[did] for did in changed})


def test_update_attributes_unknown_index_error(daemon):
    """The daemon's exact unknown-index error text."""
    with pytest.raises(RuntimeError) as e:
        daemon["cli"].update("nosuch", ["gid"], {1: (1,)})
    assert str(e.value) == "unknown index 'nosuch' in update request"


def test_update_attributes_mva_live(daemon, ours):
    """MVA UpdateAttributes: this fork DOES update MVA attrs (the
    HandleCommandUpdate v.1.2 MVA flag -> UpdateAttributes' MVA
    branch via the mva_updates_pool arena, src/sphinx.cpp:7152-7290)
    — new tag values observable through re-query and MVA filters;
    our copy-on-write update_attributes answers identically through
    the same coalesce path as scalars.  Restores values after."""
    import copy

    from sphinx_1_spark.plans.api import api_query
    from sphinx_1_spark.plans.attrs import update_attributes

    cli = daemon["cli"]
    orig = {d[0]: tuple(d[5]) for d in daemon["docs"]}
    changed = {8: ([91, 92, 93],), 19: ([94],)}
    try:
        n = cli.update("main", ["tag"], changed)
        assert n == 2
        dres = cli.search([cli.query_blob(
            "w3", filters=({"attr": "tag", "type": FILTER_VALUES,
                            "values": [91, 94]},), limit=60)])[0]
        F = _F()
        patched = copy.copy(ours["idx"])
        upd = patched.docinfo.sparkSession.createDataFrame(
            [(did, list(v[0])) for did, v in changed.items()],
            "docid long, tag array<int>",
        )
        patched.docinfo = update_attributes(patched.docinfo, upd, ["tag"])
        rows, meta = api_query(
            [("main", patched, None)],
            _aq(query="w3",
                filters=[F.arrays_overlap(
                    F.col("tag"), F.array(F.lit(91), F.lit(94)))],
                limit=60),
        )
        assert dres["matches"], "MVA update must be filter-observable"
        assert [m[0] for m in dres["matches"]] == [r["docid"] for r in rows]
        for m, r in zip(dres["matches"], rows):
            # tag is attr index 4 in BASE_ATTRS
            assert m[2][4] == tuple(r["tag"]), (m, r)
        assert dres["total_found"] == meta["total_found"]
    finally:
        cli.update("main", ["tag"],
                   {did: (list(orig[did]),) for did in changed})


def test_update_attributes_float_rejected_live(daemon):
    """The reference REJECTS float-attr updates with its exact error
    (src/sphinx.cpp:7152-7160); ours allows them as a documented
    extension (plans/attrs.py update_attributes docstring)."""
    with pytest.raises(RuntimeError) as e:
        daemon["cli"].update("main", ["pr"], {1: (5,)})
    assert (
        "attribute 'pr' can not be updated "
        "(must be boolean, integer, timestamp, or MVA)"
    ) in str(e.value)


@pytest.mark.parametrize("gattr,gfunc,our_gfunc", [
    ("gid", GROUPBY_ATTR, "attr"),
    ("cat", GROUPBY_ATTR, "attr"),
    ("ts", GROUPBY_DAY, "day"),
    ("tag", GROUPBY_ATTR, "attr"),  # MVA group + cutoff
])
def test_cutoff_under_group_by(daemon, ours, gattr, gfunc, our_gfunc):
    """Cutoff under SetGroupBy: the daemon's match loop decrements
    iCutoff only on bNewMatch, and a group sorter pushes true only
    for NEW groups (one bool per match even when an MVA spawns
    several) — matching stops after the cutoff-th introducing match.
    group_cutoff must reproduce the daemon's group rows and counts
    exactly for scalar, derived (day), and MVA keys."""
    for cutoff in (1, 2, 3, 5):
        dres = daemon["cli"].search(
            [daemon["cli"].query_blob(
                "w3", groupfunc=gfunc, groupby=gattr,
                groupsort="@group asc", cutoff=cutoff, limit=60)]
        )[0]
        assert dres["status"] == SEARCHD_OK
        ores = _ours_query(
            ours,
            _aq(query="w3", groupattr=gattr, groupfunc=our_gfunc,
                groupsort="@group asc", cutoff=cutoff, limit=60),
            extra=("@groupby", "@count"),
        )
        _assert_result_equal(_norm_daemon(dres), ores)


# ---------------------------------------------------------------------
# randomized query compositions vs the live daemon (binary API)
# ---------------------------------------------------------------------
def _rand_api_case(rng):
    """One random (wire kwargs, ApiQuery kwargs) pair both sides
    serve with identical semantics.  Avoids the known-divergent
    constructs (zone-map-pruned overrides, @geodist's cosf ulp) and
    non-deterministic orderings (every extended clause ends with an
    @id tiebreak; groups order by their unique key)."""
    F = _F()
    q = rng.choice(["w3", "w1 w5", "w2 | w9", '"w1 w2"', "@title w4",
                    "w0 -w13", "w7", "w5 | w1 w3"])
    mode_w, mode_o = rng.choice([
        (MATCH_EXTENDED2, "extended2"), (MATCH_ALL, "all"),
        (MATCH_ANY, "any"), (MATCH_BOOLEAN, "boolean"),
    ])
    if mode_w == MATCH_BOOLEAN:
        q = q.replace('"', "").replace("@title ", "")
    if mode_w in (MATCH_ALL, MATCH_ANY):
        q = q.replace('"', "").replace("@title ", "").replace("|", " ")
    wire: dict = {"mode": mode_w, "limit": rng.randint(5, 60)}
    ours: dict = {"mode": mode_o, "limit": wire["limit"]}
    if rng.random() < 0.4:
        wire["offset"] = ours["offset"] = rng.randint(0, 8)

    # filters
    wf, of = [], []
    for _ in range(rng.randint(0, 2)):
        kind = rng.randint(0, 4)
        exc = rng.random() < 0.3
        if kind == 0:
            vals = sorted(rng.sample(range(1, 6), rng.randint(1, 3)))
            wf.append({"attr": "gid", "type": FILTER_VALUES,
                       "values": vals, "exclude": exc})
            c = F.col("gid").isin(vals)
        elif kind == 1:
            lo = rng.randint(1, 3)
            hi = rng.randint(lo, 5)
            wf.append({"attr": "gid", "type": FILTER_RANGE,
                       "min": lo, "max": hi, "exclude": exc})
            c = F.col("gid").between(lo, hi)
        elif kind == 2:
            lo = rng.randint(0, 3) + 0.5
            hi = lo + rng.randint(1, 4)
            wf.append({"attr": "pr", "type": FILTER_FLOATRANGE,
                       "min": lo, "max": hi, "exclude": exc})
            c = F.col("pr").between(lo, hi)
        elif kind == 3:
            vals = sorted(rng.sample([1, 2, 3, 4, 20, 21, 22, 23, 24],
                                     rng.randint(1, 3)))
            wf.append({"attr": "tag", "type": FILTER_VALUES,
                       "values": vals, "exclude": exc})
            c = F.arrays_overlap(
                F.col("tag"), F.array(*[F.lit(v) for v in vals]))
        else:
            lo = 946684800 + rng.randint(0, 40) * 86400 * 3
            hi = lo + rng.randint(5, 40) * 86400 * 3
            wf.append({"attr": "ts", "type": FILTER_RANGE,
                       "min": lo, "max": hi, "exclude": exc})
            c = F.col("ts").between(lo, hi)
        of.append(~c if exc else c)
    if wf:
        wire["filters"] = tuple(wf)
        ours["filters"] = of

    # sort / group
    roll = rng.random()
    if roll < 0.3:
        gattr, gfunc, ofunc = rng.choice([
            ("gid", GROUPBY_ATTR, "attr"), ("cat", GROUPBY_ATTR, "attr"),
            ("ts", GROUPBY_DAY, "day"), ("ts", GROUPBY_WEEK, "week"),
            ("ts", GROUPBY_MONTH, "month"), ("tag", GROUPBY_ATTR, "attr"),
        ])
        gsort = rng.choice(["@group asc", "@group desc"])
        wire.update(groupfunc=gfunc, groupby=gattr, groupsort=gsort)
        ours.update(groupattr=gattr, groupfunc=ofunc, groupsort=gsort)
        if rng.random() < 0.4:
            wire["distinct"] = ours["groupdistinct"] = "cat"
        extra = ("@groupby", "@count") + (
            ("@distinct",) if "distinct" in wire else ())
    elif roll < 0.55:
        attr = rng.choice(["gid", "ts", "pr", "cat"])
        s, so = rng.choice([(SORT_ATTR_ASC, "attr_asc"),
                            (SORT_ATTR_DESC, "attr_desc")])
        wire.update(sort=s, sortby=attr)
        ours.update(sortmode=so, sortby=attr)
        extra = ()
    elif roll < 0.75:
        clause = rng.choice([
            "@weight desc, @id asc", "gid asc, ts desc",
            "pr desc, @id asc", "cat asc, @weight desc, @id desc",
            "ts asc",
        ])
        wire.update(sort=SORT_EXTENDED, sortby=clause)
        ours.update(sortmode="extended", sortby=clause)
        extra = ()
    else:
        extra = ()  # relevance

    # options
    if rng.random() < 0.25:
        r = rng.choice(list(RANK_IDS))
        wire["ranker"] = RANK_IDS[r]
        ours["ranker"] = r
    if rng.random() < 0.2:
        wire["maxmatches"] = ours["max_matches"] = rng.randint(5, 40)
    if rng.random() < 0.2:
        wire["cutoff"] = ours["cutoff"] = rng.randint(2, 25)
    if rng.random() < 0.2:
        fw = tuple((f, rng.randint(1, 9))
                   for f in ("title", "content"))
        wire["fieldweights"] = fw
        ours["field_weights"] = [w for _, w in fw]
    if rng.random() < 0.2:
        lo = rng.randint(1, 30)
        wire["id_range"] = ours["id_range"] = (lo, lo + rng.randint(10, 50))
    return q, wire, ours, extra


@pytest.mark.parametrize("seed", range(3))
def test_random_api_compositions(daemon, ours, seed):
    """30 random binary-API query compositions per seed: full result
    equality (matches with every attr + virtuals, totals, word
    stats)."""
    rng = random.Random(990000 + seed)
    for trial in range(30):
        q, wire, okw, extra = _rand_api_case(rng)
        dres = daemon["cli"].search(
            [daemon["cli"].query_blob(q, **wire)]
        )[0]
        assert dres["status"] == SEARCHD_OK, (trial, q, wire, dres)
        ores = _ours_query(ours, _aq(query=q, **okw), extra=extra)
        try:
            _assert_result_equal(_norm_daemon(dres), ores)
        except AssertionError as e:
            raise AssertionError((trial, q, wire)) from e
