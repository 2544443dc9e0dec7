"""LIVE SphinxQL differential: the REAL searchd daemon vs our endpoint.

The reference serves SphinxQL over the MySQL 4.1 wire protocol
(HandleClientMySQL, src/searchd.cpp:5655-5946).  This module builds an
index with the compiled reference indexer, launches the compiled
searchd in --console mode on a mysql41 listener, speaks the wire
protocol with a minimal hand-rolled client (handshake -> ignored auth
-> COM_QUERY -> resultset of length-coded strings), and requires our
in-process SphinxQL endpoint (plans/sphinxql.py) to answer every
statement in the battery identically: same match rows in the same
order (id, weight, every attr including the MVA), same SHOW META
counters and word stats, same SHOW STATUS counter-name sequence, same
OK-packet behavior for empty SHOW WARNINGS, and the same parse-error
texts for the closed OPTION sets.

Reference-quirks this differential PINS live:

* the SELECT item list is parsed but DROPPED (SqlParser_t::AddItem
  builds a local CSphQueryItem and never stores it, src/searchd.cpp:
  4752-4760), so the daemon always returns id, weight, then ALL index
  attrs; our endpoint honors the select list (documented extension) —
  the battery therefore writes the daemon's implicit column set
  explicitly on our side;
* `attr NOT IN (...)` matches NOTHING in the daemon: the grammar rule
  copies the value list from the wrong bison slot ($4 is the '('
  token, src/sphinxql.y:189-196), creating an empty exclude filter —
  pinned here as the daemon's live behavior, while our endpoint
  serves the correct complement (documented fixed-bug deviation);
* keywords ARE case-insensitive at the wire (the shipped flex scanner
  llsphinxql.c was generated case-insensitively even though the .l
  spells uppercase literals) — so our case-insensitive parser is
  parity, not a deviation;
* OPTION cutoff stops matching after N accepted matches in docid
  order (SHOW META then reports total == total_found == N);
  OPTION max_matches bounds the pool (total == max_matches while
  total_found keeps the true count).

Skipped automatically when the reference build is unavailable.
"""

from __future__ import annotations

import os
import random
import socket
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
ATTR_COLS = ["gid", "ts", "pr", "cat", "tag"]
# what `SELECT *` means to the daemon (select list is dropped):
OUR_STAR = "@id, @weight, gid, ts, pr, cat, tag"


def _make_docs():
    """Deterministic corpus: int/timestamp/float/MVA attrs, repeated
    weights (tie-order coverage), empty MVAs, low-cardinality cat for
    COUNT(DISTINCT)."""
    rng = random.Random(77)
    docs = []
    for did in range(1, 61):
        gid = (did % 4) + 1
        ts = 100000 + did * 37
        pr = ((did * 7) % 50) / 10.0
        cat = did % 3
        tag = [] if did % 5 == 0 else sorted({did % 3 + 1, 10 + did % 4})
        title = " ".join(rng.choices(VOCAB, k=rng.randint(1, 3)))
        content = " ".join(rng.choices(VOCAB, k=rng.randint(4, 20)))
        docs.append((did, gid, ts, pr, cat, tag, title, content))
    return docs


# ---------------------------------------------------------------------
# minimal MySQL 4.1 client (exactly the subset the daemon speaks)
# ---------------------------------------------------------------------
class DaemonError(Exception):
    def __init__(self, code: int, message: str):
        super().__init__(f"[{code}] {message}")
        self.code = code
        self.message = message


class Mysql41:
    def __init__(self, port: int, timeout: float = 15.0):
        deadline = time.time() + timeout
        while True:
            try:
                self.sock = socket.create_connection(("127.0.0.1", port), 1)
                break
            except OSError:
                if time.time() > deadline:
                    raise
                time.sleep(0.1)
        self.sock.settimeout(timeout)
        self.buf = b""
        self._read_packet()  # server handshake
        self._send(1, b"\x00" * 8)  # auth payload is ignored
        ok = self._read_packet()[1]
        assert ok[:1] == b"\x00", ok

    def close(self):
        self.sock.close()

    def _recv(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("daemon closed the connection")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def _read_packet(self) -> tuple[int, bytes]:
        h = self._recv(4)
        return h[3], self._recv(h[0] | h[1] << 8 | h[2] << 16)

    def _send(self, seq: int, payload: bytes) -> None:
        n = len(payload)
        self.sock.sendall(
            bytes((n & 0xFF, (n >> 8) & 0xFF, (n >> 16) & 0xFF, seq))
            + payload
        )

    @staticmethod
    def _lcs(p: bytes, pos: int):
        """length-coded string (the daemon emits 1-byte and 253
        3-byte-length forms; 251 is NULL)."""
        b = p[pos]
        if b < 251:
            return p[pos + 1 : pos + 1 + b], pos + 1 + b
        if b == 251:
            return None, pos + 1
        if b == 252:
            ln = int.from_bytes(p[pos + 1 : pos + 3], "little")
            return p[pos + 3 : pos + 3 + ln], pos + 3 + ln
        if b == 253:
            ln = int.from_bytes(p[pos + 1 : pos + 4], "little")
            return p[pos + 4 : pos + 4 + ln], pos + 4 + ln
        ln = int.from_bytes(p[pos + 1 : pos + 9], "little")
        return p[pos + 9 : pos + 9 + ln], pos + 9 + ln

    def query(self, sql: str):
        """-> ("ok",) for OK packets, ("rows", cols, rows) for result
        sets; raises DaemonError for error packets."""
        self._send(0, b"\x03" + sql.encode())
        _, p = self._read_packet()
        if p[:1] == b"\xff":
            # 0xff, code LE16, '#' + 5-byte sqlstate, message + NUL
            raise DaemonError(
                int.from_bytes(p[1:3], "little"),
                p[9:].rstrip(b"\x00").decode(),
            )
        if p[:1] == b"\x00":
            return ("ok",)
        nfields = p[0]
        cols = []
        for _ in range(nfields):
            _, fp = self._read_packet()
            pos, vals = 0, []
            for _ in range(6):  # catalog, db, table, org_table, name, org_name
                v, pos = self._lcs(fp, pos)
                vals.append(v)
            cols.append(vals[4].decode())
        assert self._read_packet()[1][:1] == b"\xfe"  # EOF after fields
        rows = []
        while True:
            _, p = self._read_packet()
            if p[:1] == b"\xfe" and len(p) <= 9:
                break  # EOF (a data cell's length byte is never 0xfe)
            pos, row = 0, []
            while pos < len(p):
                v, pos = self._lcs(p, pos)
                row.append(None if v is None else v.decode())
            rows.append(row)
        return ("rows", cols, rows)


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
    tmp = tmp_path_factory.mktemp("searchd_live")
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
        "</sphinx:schema>",
    ]
    for did, gid, ts, pr, cat, tag, title, content in docs:
        xml.append(
            f'<sphinx:document id="{did}"><title>{title}</title>'
            f"<content>{content}</content><gid>{gid}</gid><ts>{ts}</ts>"
            f"<pr>{pr}</pr><cat>{cat}</cat>"
            f'<tag>{",".join(map(str, tag))}</tag></sphinx:document>'
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
index pfx {{
    source = src1
    path = {tmp}/idx_pfx
    charset_type = utf-8
    charset_table = {CHARSET}
    min_prefix_len = 2
    enable_star = 1
}}
searchd {{
    listen = 127.0.0.1:{port}:mysql41
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
        cli = Mysql41(port)  # wait until it serves
        cli.close()
        yield {"port": port, "docs": docs}
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
            (did, gid, ts, float(pr), cat, tag, title, content)
            for did, gid, ts, pr, cat, tag, title, content in daemon["docs"]
        ],
        "docid long, gid int, ts long, pr float, cat int,"
        " tag array<int>, title string, content string",
    )
    idx = SphinxIndex.build(
        df,
        IndexSettings(
            docid_col="docid",
            fields=("title", "content"),
            attrs=("gid", "ts", "pr", "cat", "tag"),
            tokenizer=TokenizerSettings(charset_table=CHARSET),
            tokenizer_impl="arrow",
            enable_star=False,
        ),
        persist=True,
    )
    attrs_df = df.select("docid", "gid", "ts", "pr", "cat", "tag")
    return {"idx": idx, "df": attrs_df}


def _session(ours):
    from sphinx_1_spark.plans.sphinxql import SphinxQLSession

    return SphinxQLSession(df=ours["df"], index=ours["idx"])


# ---------------------------------------------------------------------
# normalization + comparison
# ---------------------------------------------------------------------
_INT_COLS = {"id", "weight", "gid", "ts", "cat", "@groupby", "@count",
             "@distinct", "count", "dts", "level"}


def _norm_cell(col: str, v):
    if col == "pr":
        return round(float(v), 4)
    if col == "tag":
        if v is None:
            return ()
        if isinstance(v, str):
            return tuple(int(x) for x in v.split(",")) if v else ()
        return tuple(int(x) for x in v)  # our array<int>
    if col in _INT_COLS:
        return int(v)
    return v


def _daemon_rows(res, rename=()):
    kind, cols, rows = res
    assert kind == "rows"
    ren = dict(rename)
    cols = [ren.get(c, c) for c in cols]
    return cols, [
        {c: _norm_cell(c, v) for c, v in zip(cols, r)} for r in rows
    ]


def _our_rows(df, rename=()):
    ren = dict(rename)
    cols = [ren.get(c, c) for c in df.columns]
    return cols, [
        {c: _norm_cell(c, v) for c, v in zip(cols, row)}
        for row in df.collect()
    ]


def _both(daemon, ours, tail, our_cols=OUR_STAR, d_select="*"):
    """Run `SELECT <d_select> FROM main <tail>` on the daemon and
    `SELECT <our_cols> FROM main <tail>` on our endpoint; return
    (daemon_cols, daemon_rows, our_cols, our_rows, session)."""
    cli = Mysql41(daemon["port"])
    try:
        dres = cli.query(f"SELECT {d_select} FROM main {tail}".strip())
        dcols, drows = _daemon_rows(dres)
    finally:
        cli.close()
    sess = _session(ours)
    odf = sess.execute(f"SELECT {our_cols} FROM main {tail}".strip())
    ocols, orows = _our_rows(odf)
    return dcols, drows, ocols, orows, sess


def _assert_same_rows(drows, orows, cols):
    assert len(drows) == len(orows), (len(drows), len(orows), drows, orows)
    for i, (d, o) in enumerate(zip(drows, orows)):
        for c in cols:
            assert d[c] == o[c], (i, c, d, o)


# ---------------------------------------------------------------------
# the battery
# ---------------------------------------------------------------------
BASE_COLS = ["id", "weight", "gid", "ts", "pr", "cat", "tag"]

MATCH_TAILS = [
    "WHERE MATCH('w3') ORDER BY @weight DESC, @id ASC LIMIT 20",
    "WHERE MATCH('w1 w5') ORDER BY @weight DESC, @id ASC LIMIT 20",
    "WHERE MATCH('w2 | w9') ORDER BY @weight DESC, @id ASC LIMIT 20",
    "WHERE MATCH('\"w1 w2\"') ORDER BY @weight DESC, @id ASC LIMIT 20",
    "WHERE MATCH('@title w4') ORDER BY @weight DESC, @id ASC LIMIT 20",
    "WHERE MATCH('w0 -w13') ORDER BY @weight DESC, @id ASC LIMIT 20",
    "WHERE MATCH('w3') ORDER BY @weight DESC, @id ASC",  # default LIMIT 20
    "WHERE MATCH('w3')",  # default order: @weight desc (ties id-asc)
]


@pytest.mark.parametrize("tail", MATCH_TAILS)
def test_match_battery(daemon, ours, tail):
    """The daemon's `SELECT *` rows (id, weight, every attr incl. the
    MVA wire encoding) equal ours, in order."""
    dcols, drows, ocols, orows, _ = _both(daemon, ours, tail)
    assert dcols == BASE_COLS
    assert ocols == BASE_COLS
    _assert_same_rows(drows, orows, BASE_COLS)


FILTER_TAILS = [
    "WHERE MATCH('w3') AND gid = 2 ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND gid != 1 ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND gid IN (1, 3) ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND gid BETWEEN 2 AND 3 ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND gid > 2 ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND gid < 3 ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND gid >= 3 ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND gid <= 2 ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND ts BETWEEN 100500 AND 101500 "
    "ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND pr >= 2.5 ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND pr <= 1.5 ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND pr BETWEEN 1.0 AND 3.0 ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND @id > 30 ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND @id <= 40 AND gid = 2 ORDER BY @id ASC LIMIT 20",
    "WHERE MATCH('w3') AND @weight > 2000 ORDER BY @id ASC LIMIT 20",
]


@pytest.mark.parametrize("tail", FILTER_TAILS)
def test_filter_battery(daemon, ours, tail):
    _, drows, _, orows, _ = _both(daemon, ours, tail)
    assert drows, tail  # every filter case must actually select rows
    _assert_same_rows(drows, orows, BASE_COLS)


ORDER_TAILS = [
    "WHERE MATCH('w1') ORDER BY gid ASC, @id DESC LIMIT 20",
    "WHERE MATCH('w1') ORDER BY ts DESC LIMIT 20",
    "WHERE MATCH('w1') ORDER BY pr ASC, @id ASC LIMIT 20",
    "WHERE MATCH('w1') ORDER BY gid DESC, @weight DESC, @id ASC LIMIT 20",
    "WHERE MATCH('w1') ORDER BY @id DESC LIMIT 5",
    "WHERE MATCH('w1') ORDER BY @weight DESC, @id ASC LIMIT 3, 4",
    "WHERE MATCH('w1') ORDER BY @weight DESC, @id ASC LIMIT 5, 50",
]


@pytest.mark.parametrize("tail", ORDER_TAILS)
def test_order_and_paging(daemon, ours, tail):
    _, drows, _, orows, _ = _both(daemon, ours, tail)
    assert drows, tail
    _assert_same_rows(drows, orows, BASE_COLS)


def test_fullscan(daemon, ours):
    """No MATCH: the daemon fullscans with weight=1 per match; our df
    path has no weight column, so compare attrs and pin the daemon's
    constant weight."""
    tail = "WHERE gid = 2 ORDER BY ts ASC LIMIT 30"
    dcols, drows, ocols, orows, _ = _both(
        daemon, ours, tail, our_cols="@id, gid, ts, pr, cat, tag"
    )
    assert all(d["weight"] == 1 for d in drows)
    assert len(drows) == len(orows) > 0
    for d, o in zip(drows, orows):
        for c in ("id", "gid", "ts", "pr", "cat", "tag"):
            assert d[c] == o[c], (c, d, o)


def test_fullscan_not_in_reference_bug(daemon, ours):
    """`attr NOT IN (...)` live: the daemon's grammar copies the value
    list from the '(' token ($4 instead of $5, src/sphinxql.y:189-196)
    so the exclude filter is EMPTY and matches nothing — while our
    endpoint serves the correct complement (documented deviation)."""
    tail = "WHERE gid NOT IN (1, 2) ORDER BY @id ASC LIMIT 60"
    dcols, drows, ocols, orows, _ = _both(
        daemon, ours, tail, our_cols="@id, gid, ts, pr, cat, tag"
    )
    assert drows == []  # the reference bug, pinned live
    expect = [did for did, gid, *_ in daemon["docs"] if gid not in (1, 2)]
    assert [o["id"] for o in orows] == expect
    assert all(o["gid"] in (3, 4) for o in orows)


GROUP_TAILS = [
    "WHERE MATCH('w1') GROUP BY gid ORDER BY gid ASC LIMIT 20",
    "WHERE MATCH('w1') GROUP BY gid WITHIN GROUP ORDER BY ts DESC "
    "ORDER BY gid ASC LIMIT 20",
    "WHERE MATCH('w1') GROUP BY gid WITHIN GROUP ORDER BY @id ASC "
    "ORDER BY gid DESC LIMIT 20",
    "WHERE MATCH('w1') GROUP BY cat ORDER BY cat ASC LIMIT 20",
]


@pytest.mark.parametrize("tail", GROUP_TAILS)
def test_group_by(daemon, ours, tail):
    """Grouped results: the daemon appends @groupby/@count virtual
    attrs and keeps the group's best row (within-group order,
    default @weight desc / earliest on ties) as the representative."""
    grp = "cat" if "GROUP BY cat" in tail else "gid"
    dcols, drows, ocols, orows, _ = _both(
        daemon, ours, tail, our_cols=f"{OUR_STAR}, @count"
    )
    assert dcols == BASE_COLS + ["@groupby", "@count"]
    assert drows, tail
    for d in drows:
        assert d["@groupby"] == d[grp]
    _assert_same_rows(
        [{**d, "count": d["@count"]} for d in drows],
        orows,
        BASE_COLS + ["count"],
    )


def test_group_by_count_distinct(daemon, ours):
    """COUNT(DISTINCT attr) appends the @distinct virtual attr."""
    tail = "WHERE MATCH('w1') GROUP BY gid ORDER BY gid ASC LIMIT 20"
    cli = Mysql41(daemon["port"])
    try:
        dcols, drows = _daemon_rows(
            cli.query(f"SELECT *, COUNT(DISTINCT cat) FROM main {tail}")
        )
    finally:
        cli.close()
    assert dcols == BASE_COLS + ["@groupby", "@count", "@distinct"]
    sess = _session(ours)
    ocols, orows = _our_rows(
        sess.execute(
            f"SELECT {OUR_STAR}, @count, COUNT(DISTINCT cat) AS dts "
            f"FROM main {tail}"
        )
    )
    assert len(drows) == len(orows) > 0
    for d, o in zip(drows, orows):
        for c in BASE_COLS:
            assert d[c] == o[c], (c, d, o)
        assert d["@count"] == o["count"]
        assert d["@distinct"] == o["dts"]


RANKERS = ["proximity_bm25", "bm25", "none", "wordcount", "proximity",
           "matchany", "fieldmask"]


@pytest.mark.parametrize("ranker", RANKERS)
def test_rankers_live(daemon, ours, ranker):
    """Every OPTION ranker mode: weight-identical to the daemon."""
    tail = (
        "WHERE MATCH('w3 w5') ORDER BY @id ASC LIMIT 60 "
        f"OPTION ranker={ranker}"
    )
    _, drows, _, orows, _ = _both(daemon, ours, tail)
    assert drows
    _assert_same_rows(drows, orows, BASE_COLS)


def test_option_max_matches(daemon, ours):
    """OPTION max_matches bounds the pool: rows truncate to it and
    SHOW META reports total == max_matches, total_found == true."""
    tail = ("WHERE MATCH('w3') ORDER BY @weight DESC, @id ASC LIMIT 20 "
            "OPTION max_matches=7")
    cli = Mysql41(daemon["port"])
    try:
        _, drows = _daemon_rows(cli.query(f"SELECT * FROM main {tail}"))
        _, dmeta = _daemon_rows(cli.query("SHOW META"))
    finally:
        cli.close()
    sess = _session(ours)
    _, orows = _our_rows(sess.execute(f"SELECT {OUR_STAR} FROM main {tail}"))
    _, ometa = _our_rows(sess.execute("SHOW META"))
    assert len(drows) == len(orows) == 7
    _assert_same_rows(drows, orows, BASE_COLS)
    _assert_meta_equal(dmeta, ometa)


def test_option_cutoff(daemon, ours):
    """OPTION cutoff stops matching after N accepted matches in docid
    order; SHOW META reports total == total_found == N."""
    tail = ("WHERE MATCH('w3') ORDER BY @id ASC LIMIT 20 "
            "OPTION cutoff=5")
    cli = Mysql41(daemon["port"])
    try:
        _, drows = _daemon_rows(cli.query(f"SELECT * FROM main {tail}"))
        _, dmeta = _daemon_rows(cli.query("SHOW META"))
    finally:
        cli.close()
    sess = _session(ours)
    _, orows = _our_rows(sess.execute(f"SELECT {OUR_STAR} FROM main {tail}"))
    _, ometa = _our_rows(sess.execute("SHOW META"))
    assert len(drows) == len(orows) == 5
    _assert_same_rows(drows, orows, BASE_COLS)
    _assert_meta_equal(dmeta, ometa)


# ---------------------------------------------------------------------
# SHOW statements
# ---------------------------------------------------------------------
def _meta_pairs(rows):
    return [(r["variable_name"], r["value"]) for r in rows]


def _assert_meta_equal(dmeta, ometa):
    """SHOW META rows equal except the timing row's value."""
    dpairs = _meta_pairs(
        [{"variable_name": r["Variable_name"], "value": r["Value"]}
         if "Variable_name" in r else r for r in dmeta]
    )
    opairs = _meta_pairs(ometa)
    assert [n for n, _ in dpairs] == [n for n, _ in opairs]
    for (dn, dv), (on, ov) in zip(dpairs, opairs):
        if dn == "time":
            continue
        assert dv == ov, (dn, dv, ov)


@pytest.mark.parametrize(
    "tail",
    [
        "WHERE MATCH('w3') ORDER BY @weight DESC, @id ASC LIMIT 5",
        "WHERE MATCH('w1 w5') ORDER BY @weight DESC, @id ASC LIMIT 3",
        "WHERE MATCH('w3') AND gid = 2 ORDER BY @id ASC LIMIT 20",
        "WHERE MATCH('nosuchword') LIMIT 20",
    ],
)
def test_show_meta(daemon, ours, tail):
    """total / total_found / keyword[i] / docs[i] / hits[i] identical
    (time skipped — it is wall-clock)."""
    cli = Mysql41(daemon["port"])
    try:
        cli.query(f"SELECT * FROM main {tail}")
        _, dmeta = _daemon_rows(cli.query("SHOW META"))
    finally:
        cli.close()
    sess = _session(ours)
    sess.execute(f"SELECT {OUR_STAR} FROM main {tail}").collect()
    _, ometa = _our_rows(sess.execute("SHOW META"))
    _assert_meta_equal(dmeta, ometa)


def test_show_status_names(daemon, ours):
    """SHOW STATUS: the counter-name sequence equals BuildStatus's
    (src/searchd.cpp:5297-5365) — live pin of our status() order —
    and the OFF/zero-formatted values agree where deterministic."""
    cli = Mysql41(daemon["port"])
    try:
        _, drows = _daemon_rows(cli.query("SHOW STATUS"))
    finally:
        cli.close()
    sess = _session(ours)
    _, orows = _our_rows(sess.execute("SHOW STATUS"))
    dnames = [r["Variable_name"] for r in drows]
    onames = [r["variable_name"] for r in orows]
    assert dnames == onames
    dvals = {r["Variable_name"]: r["Value"] for r in drows}
    ovals = {r["variable_name"]: r["value"] for r in orows}
    for name in ("query_cpu", "avg_query_cpu", "query_reads",
                 "query_readkb", "query_readtime", "avg_query_reads",
                 "avg_query_readkb", "avg_query_readtime"):
        assert dvals[name] == ovals[name] == "OFF"
    for name in ("dist_wall", "dist_local", "dist_wait", "avg_dist_wall",
                 "avg_dist_local", "avg_dist_wait"):
        assert dvals[name] == ovals[name] == "0.000"
    assert dvals["maxed_out"] == ovals["maxed_out"] == "0"
    assert dvals["dist_queries"] == ovals["dist_queries"] == "0"


def test_show_warnings_empty_is_ok_packet(daemon, ours):
    """No warnings -> the daemon answers a bare OK packet (no result
    set, src/searchd.cpp:5715-5719); ours answers zero rows."""
    cli = Mysql41(daemon["port"])
    try:
        cli.query("SELECT * FROM main WHERE MATCH('w3') LIMIT 1")
        res = cli.query("SHOW WARNINGS")
    finally:
        cli.close()
    assert res == ("ok",)
    sess = _session(ours)
    sess.execute(f"SELECT {OUR_STAR} FROM main WHERE MATCH('w3') LIMIT 1")
    assert sess.execute("SHOW WARNINGS").collect() == []


# ---------------------------------------------------------------------
# errors
# ---------------------------------------------------------------------
def test_parse_errors_live(daemon, ours):
    """Error texts: the AddOption messages are EXACT matches both
    sides; bison-path errors match on the reference's message core
    (ours does not reproduce flex/bison's near-token framing)."""
    from sphinx_1_spark.plans.sphinxql import SphinxQLError

    sess = _session(ours)
    cli = Mysql41(daemon["port"])
    try:
        # exact: AddOption writes these verbatim (src/searchd.cpp:4718,4745)
        for sql, exact in [
            ("SELECT * FROM main WHERE MATCH('w1') OPTION ranker=bogus",
             "unknown ranker 'bogus'"),
            ("SELECT * FROM main WHERE MATCH('w1') OPTION foo=1",
             "unknown option 'foo'"),
        ]:
            with pytest.raises(DaemonError) as de:
                cli.query(sql)
            assert de.value.message == exact
            with pytest.raises(SphinxQLError) as oe:
                sess.execute(sql.replace("*", "@id, @weight"))
            assert str(oe.value) == exact

        # message-core: yyerror appends " near '<tail>'"
        sql = "SELECT * FROM main WHERE MATCH('a') AND MATCH('b')"
        with pytest.raises(DaemonError) as de:
            cli.query(sql)
        assert de.value.message.startswith("too many MATCH() clauses")
        with pytest.raises(SphinxQLError) as oe:
            sess.execute(sql.replace("*", "@id, @weight"))
        assert str(oe.value) == "too many MATCH() clauses"

        # ident-valued numeric option: C m_iValue stays 0 and
        # CheckQuery rejects with the bounds error (exact both sides)
        for sql in (
            "SELECT * FROM main WHERE MATCH('w1') OPTION max_matches=foo",
            "SELECT * FROM main WHERE MATCH('w1') LIMIT 5 "
            "OPTION max_matches=0",
        ):
            with pytest.raises(DaemonError) as de:
                cli.query(sql)
            expect = ("per-query max_matches=0 out of bounds "
                      "(per-server max_matches=1000)")
            assert de.value.message == expect
            with pytest.raises(SphinxQLError) as oe:
                sess.execute(sql.replace("*", "@id, @weight"))
            assert str(oe.value) == expect

        # plain syntax error: both sides must refuse
        with pytest.raises(DaemonError):
            cli.query("SELECT FROM main")
        with pytest.raises(SphinxQLError):
            sess.execute("SELECT FROM main")
    finally:
        cli.close()


def test_keyword_case_insensitive_live(daemon, ours):
    """The shipped scanner (llsphinxql.c) is case-insensitive even
    though sphinxql.l spells uppercase literals — lowercase keywords
    serve identically; our parser's case-insensitivity is parity."""
    tail = "where match('w3') order by @weight desc, @id asc limit 5"
    dcols, drows, ocols, orows, _ = _both(
        daemon, ours, f"{tail}", our_cols=OUR_STAR, d_select="*"
    )
    assert drows
    _assert_same_rows(drows, orows, BASE_COLS)


def test_show_warnings_with_warning_live(spark, daemon, ours):
    """A star query whose core is shorter than min_prefix_len: the
    daemon's SHOW WARNINGS returns one (Level='warning', Code=1000,
    Message=CheckQueryWord's exact text incl. its trailing space,
    src/sphinx.cpp:14790-14807; code hard-wired at searchd.cpp:5729)
    — our session produces the identical message."""
    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.plans.engine import IndexSettings, SphinxIndex
    from sphinx_1_spark.plans.sphinxql import SphinxQLSession

    cli = Mysql41(daemon["port"])
    try:
        kind, cols, rows = cli.query(
            "SELECT * FROM pfx WHERE MATCH('w* w3') LIMIT 5"
        )
        assert kind == "rows"
        wkind, wcols, wrows = cli.query("SHOW WARNINGS")
    finally:
        cli.close()
    assert wcols == ["Level", "Code", "Message"]
    assert len(wrows) == 1
    assert wrows[0][0] == "warning" and wrows[0][1] == "1000"
    expect = "Query word length is less than min prefix length. word: 'w*' "
    assert wrows[0][2] == expect

    df = spark.createDataFrame(
        [(d[0], d[6], d[7]) for d in daemon["docs"]],
        "docid long, title string, content string",
    )
    idx = SphinxIndex.build(
        df,
        IndexSettings(
            docid_col="docid",
            fields=("title", "content"),
            tokenizer=TokenizerSettings(
                charset_table=CHARSET, min_prefix_len=2
            ),
            tokenizer_impl="arrow",
            enable_star=True,
        ),
        persist=True,
    )
    sess = SphinxQLSession(index=idx)
    sess.execute(
        "SELECT @id, @weight FROM pfx WHERE MATCH('w* w3') LIMIT 5"
    ).collect()
    ws = sess.execute("SHOW WARNINGS").collect()
    assert len(ws) == 1
    assert ws[0]["message"] == expect


# ---------------------------------------------------------------------
# LIVE rotation: indexer --rotate + SIGHUP vs our promote() analog
# ---------------------------------------------------------------------
def _rot_corpus(version: int):
    """Deterministic single-field corpus; v2 rewrites contents and
    grows the doc set, so which version SERVES is query-observable."""
    rng = random.Random(31337 + version)
    n = 40 if version == 1 else 50
    return [
        (did, " ".join(rng.choices(VOCAB, k=rng.randint(4, 16))))
        for did in range(1, n + 1)
    ]


def _rot_xml(docs):
    out = ['<?xml version="1.0" encoding="utf-8"?>', "<sphinx:docset>",
           "<sphinx:schema>", '<sphinx:field name="content"/>',
           "</sphinx:schema>"]
    for did, content in docs:
        out.append(
            f'<sphinx:document id="{did}">'
            f"<content>{content}</content></sphinx:document>"
        )
    out.append("</sphinx:docset>")
    return "\n".join(out)


def _rot_select(cli_port, query):
    cli = Mysql41(cli_port)
    try:
        kind, cols, rows = cli.query(
            f"SELECT * FROM main WHERE MATCH('{query}') "
            "ORDER BY @weight DESC, @id ASC LIMIT 60"
        )
        assert kind == "rows" and cols == ["id", "weight"]
        return [(int(r[0]), int(r[1])) for r in rows]
    finally:
        cli.close()


def _our_rot_results(spark, root, query):
    from sphinx_1_spark.plans.api import ApiQuery, api_query
    from sphinx_1_spark.streaming.incremental import open_current_view

    view = open_current_view(spark, root)
    idx = view.segments.sphinx_index()
    rows, _ = api_query(
        [("main", idx, None)],
        ApiQuery(query=query, mode="extended2", limit=60),
    )
    return [(r["docid"], r["weight"]) for r in rows]


def _our_rot_build(spark, root, gen, docs):
    import datetime

    import pandas as pd

    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.plans.segment_index import build_segments

    pdf = pd.DataFrame(
        {
            "url": [f"u{did:04d}" for did, _ in docs],
            "warc_ts": [datetime.datetime(2020, 1, 1)] * len(docs),
            "html": [c.encode() for _, c in docs],
            "text": [""] * len(docs),
            "lang": ["en"] * len(docs),
        }
    )
    pages = spark.createDataFrame(pdf)
    build_segments(
        pages,
        os.path.join(root, gen),
        n_shards=1,
        tokenizer=TokenizerSettings(charset_table=CHARSET),
        docid_mode="rank",  # urls sort as u0001.. -> docid == did
    )


def test_live_rotation(spark, tmp_path):
    """Index rotation, live: searchd serves v1; `indexer --rotate`
    builds .new files and SIGHUPs the daemon (read from pid_file),
    which swaps and serves v2 — our CURRENT-pointer analog
    (build generation -> promote -> open_current_view) must produce
    the SAME (docid, weight) results as the daemon BEFORE and AFTER
    its rotation, and a view opened before our promote must keep
    serving v1 (the reference's serve-old-while-rotating
    semantics)."""
    v1, v2 = _rot_corpus(1), _rot_corpus(2)
    (tmp_path / "docs.xml").write_text(_rot_xml(v1), encoding="utf-8")
    port = _free_port()
    (tmp_path / "sphinx.conf").write_text(
        f"""
source src1 {{
    type = xmlpipe2
    xmlpipe_command = cat {tmp_path}/docs.xml
}}
index main {{
    source = src1
    path = {tmp_path}/idx
    charset_type = utf-8
    charset_table = {CHARSET}
}}
searchd {{
    listen = 127.0.0.1:{port}:mysql41
    log = {tmp_path}/searchd.log
    pid_file = {tmp_path}/searchd.pid
    seamless_rotate = 0
}}
"""
    )
    r = subprocess.run(
        [ref_bin("indexer"), "--config", str(tmp_path / "sphinx.conf"),
         "--all"],
        capture_output=True, cwd=tmp_path, timeout=120,
    )
    assert r.returncode == 0, r.stdout.decode()[-1000:]
    proc = subprocess.Popen(
        [ref_bin("searchd"), "--config", str(tmp_path / "sphinx.conf"),
         "--console"],
        stdout=open(tmp_path / "console.log", "w"),
        stderr=subprocess.STDOUT, cwd=tmp_path,
    )
    try:
        # our v1 generation + promote
        from sphinx_1_spark.streaming.incremental import (
            open_current_view, promote,
        )

        root = str(tmp_path / "store")
        os.makedirs(root)
        _our_rot_build(spark, root, "gen-000", v1)
        promote(root, "gen-000")

        before_d = _rot_select(port, "w3")
        before_o = _our_rot_results(spark, root, "w3")
        assert before_d == before_o, (before_d, before_o)

        # a reader opened NOW must survive the upcoming promote
        old_view = open_current_view(spark, root)

        # rotate the daemon to v2: rewrite the source, build .new,
        # SIGHUP (indexer --rotate does both; pid_file names the
        # target, src/indexer.cpp:1160+)
        (tmp_path / "docs.xml").write_text(_rot_xml(v2), encoding="utf-8")
        r = subprocess.run(
            [ref_bin("indexer"), "--config", str(tmp_path / "sphinx.conf"),
             "--rotate", "--all"],
            capture_output=True, cwd=tmp_path, timeout=120,
        )
        assert r.returncode == 0, r.stdout.decode()[-1000:]
        # a --console daemon writes no pid file, so the indexer's
        # SIGHUP had no target — deliver the signal it would have
        # sent (the rotate flag + CheckRotate in the serve loop,
        # src/searchd.cpp:924-927, :8396; seamless_rotate=0 takes the
        # simple in-loop rename+reload path)
        import signal as _signal

        proc.send_signal(_signal.SIGHUP)
        _our_rot_build(spark, root, "gen-001", v2)
        promote(root, "gen-001")

        # the daemon swaps on its serve loop; poll until v2 answers
        deadline = time.time() + 30
        after_d = None
        while time.time() < deadline:
            after_d = _rot_select(port, "w3")
            if after_d != before_d:
                break
            time.sleep(0.5)
        after_o = _our_rot_results(spark, root, "w3")
        assert after_d == after_o, (after_d, after_o)
        assert after_d != before_d  # the rotation is query-observable

        # the pre-promote reader still serves v1 (immutable segments)
        from sphinx_1_spark.plans.api import ApiQuery, api_query

        idx_old = old_view.segments.sphinx_index()
        rows, _ = api_query(
            [("main", idx_old, None)],
            ApiQuery(query="w3", mode="extended2", limit=60),
        )
        assert [(r_["docid"], r_["weight"]) for r_ in rows] == before_d
    finally:
        proc.terminate()
        try:
            proc.wait(10)
        except subprocess.TimeoutExpired:
            proc.kill()


# ---------------------------------------------------------------------
# randomized SELECT compositions vs the live daemon
# ---------------------------------------------------------------------
def _rand_select_tail(rng):
    """One random SELECT tail both dialects accept with identical
    semantics.  Deliberately avoids the known-divergent constructs:
    NOT IN (reference $4 bug), explicit select lists (dropped by the
    daemon), and non-deterministic orderings (every ORDER BY ends
    with an @id tiebreak; groups order by their unique key)."""
    match = rng.choice([
        "w3", "w1 w5", "w2 | w9", '"w1 w2"', "@title w4", "w0 -w13",
        "w5 | w1 w3", "w7",
    ])
    conds = []
    for _ in range(rng.randint(0, 2)):
        conds.append(rng.choice([
            f"gid = {rng.randint(1, 4)}",
            f"gid != {rng.randint(1, 4)}",
            f"gid IN ({rng.randint(1, 2)}, {rng.randint(3, 4)})",
            f"gid BETWEEN {rng.randint(1, 2)} AND {rng.randint(3, 4)}",
            f"ts BETWEEN {100000 + rng.randint(0, 800)} "
            f"AND {100000 + rng.randint(1200, 2300)}",
            f"pr >= {rng.randint(0, 3)}.5",
            f"pr <= {rng.randint(2, 4)}.5",
            f"cat = {rng.randint(0, 2)}",
            f"@id > {rng.randint(5, 40)}",
            f"@id <= {rng.randint(20, 55)}",
        ]))
    where = " AND ".join([f"MATCH('{match}')"] + conds)
    group = rng.random() < 0.3
    tail = f"WHERE {where}"
    if group:
        key = rng.choice(["gid", "cat"])
        tail += f" GROUP BY {key}"
        if rng.random() < 0.5:
            wkey = rng.choice(["ts DESC", "ts ASC", "@id ASC", "pr DESC"])
            tail += f" WITHIN GROUP ORDER BY {wkey}"
        tail += f" ORDER BY {key} ASC"
    else:
        order = rng.choice([
            "@weight DESC, @id ASC",
            "gid ASC, @id DESC",
            "ts DESC",  # unique per doc
            "pr ASC, @id ASC",
            "@id DESC",
            "cat DESC, @weight DESC, @id ASC",
        ])
        tail += f" ORDER BY {order}"
    if rng.random() < 0.5:
        off = rng.randint(0, 6)
        tail += f" LIMIT {off}, {rng.randint(1, 30)}" if off \
            else f" LIMIT {rng.randint(1, 30)}"
    opts = []
    if rng.random() < 0.3:
        opts.append("ranker=" + rng.choice(
            ["proximity_bm25", "bm25", "wordcount", "none"]))
    if rng.random() < 0.2:
        opts.append(f"max_matches={rng.randint(5, 50)}")
    if rng.random() < 0.15:
        opts.append(f"cutoff={rng.randint(3, 30)}")
    if opts:
        tail += " OPTION " + ", ".join(opts)
    return tail, group


# 10 pinned seeds (round-5 VERDICT ask: this net caught two real bugs
# late in round 4 — grouped SHOW META totals and grouped cutoff — so
# it runs at full strength in the default suite)
@pytest.mark.parametrize("seed", range(10))
def test_random_select_compositions(daemon, ours, seed):
    """40 random SELECT compositions per seed (filters x order x
    paging x group x options interactions): rows AND SHOW META must
    equal the daemon's."""
    rng = random.Random(880000 + seed)
    cli = Mysql41(daemon["port"])
    sess = _session(ours)
    try:
        for trial in range(40):
            tail, group = _rand_select_tail(rng)
            dsql = f"SELECT * FROM main {tail}"
            our_cols = OUR_STAR + (", @count" if group else "")
            osql = f"SELECT {our_cols} FROM main {tail}"
            dcols, drows = _daemon_rows(cli.query(dsql))
            _, dmeta = _daemon_rows(cli.query("SHOW META"))
            ocols, orows = _our_rows(sess.execute(osql))
            _, ometa = _our_rows(sess.execute("SHOW META"))
            assert len(drows) == len(orows), (tail, len(drows), len(orows))
            for i, (d, o) in enumerate(zip(drows, orows)):
                for c in BASE_COLS:
                    assert d[c] == o[c], (tail, i, c, d, o)
                if group:
                    assert d["@count"] == o["count"], (tail, i, d, o)
            _assert_meta_equal(dmeta, ometa)
    finally:
        cli.close()
