"""test_42 / test_86 persistent-connection contract, LIVE (round 5).

The last two searchd-machinery replay skips (REPLAY_SWEEP.log) were
`test_42` (persistent connections: Open -> Query, sleep, Query ->
Close under client_timeout variants) and `test_86` (index rotation vs
pconns: a connection opened BEFORE `indexer --rotate` + SIGHUP must
serve the NEW index after the swap).  Round 4's live harness already
drives the real daemon over the binary SphinxAPI with a fresh TCP
connection per command; this module adds the persistent framing the
reference client uses (api/sphinxapi.py:945-958 Open(): one socket,
SEARCHD_COMMAND_PERSIST=4 ver 0 body [1:L], then every command over
the same socket) and pins, per query in each test's sequence, the
daemon's results identical to our in-process session over the same
corpus:

* test_42 sequence (client_timeout=5 variant): both queries succeed
  over one pconn across a 2 s idle gap and answer exactly like our
  engine — the model's variant-1 rows.
* test_42 client_timeout=1 variant: the daemon CLOSES the idle pconn
  after the timeout (the model's failed-query entry); the connection
  drop is a transport behavior with no in-process analog (our session
  has no socket to drop), so the live assertion is the daemon-side
  contract itself plus a fresh connection still answering
  identically.
* test_86 sequence: res1 over a pconn, `indexer --rotate` + SIGHUP,
  res2 over the SAME pconn sees the new index — both value-identical
  to our CURRENT-pointer analog (build gen -> promote) before and
  after.

Skipped automatically when the reference build is unavailable.
"""

from __future__ import annotations

import os
import random
import signal
import socket
import struct
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_ref_differential import _ensure_build, ref_bin  # noqa: E402
from test_ref_searchd_api_differential import (  # noqa: E402
    MATCH_ALL,
    ApiWire,
)

pytestmark = pytest.mark.skipif(
    not _ensure_build(),
    reason="reference build unavailable (no /root/reference or no g++)",
)

CHARSET = "0..9, A..Z->a..z, _, a..z"
VOCAB = [f"w{i}" for i in range(14)]
SEARCHD_COMMAND_PERSIST = 4  # api/sphinxapi.py:28


class PersistentApiWire(ApiWire):
    """ApiWire over ONE long-lived socket with the reference client's
    FULL persistent contract: Open() framing (handshake once, then
    the persist command, then every request/response on the same
    connection) plus the force-reopen of a peer-closed socket that
    api/sphinxapi.php `_Connect` (:553-561, the feof liveness probe)
    performs before each request — which is what makes the model's
    test_42 variant-2 second query and test_86's post-rotation query
    SUCCEED even though the daemon dropped the idle/pre-rotation
    connection (HandleClient's persist loop breaks on SIGHUP /
    client_timeout, src/searchd.cpp:5472-5478, 5543)."""

    def __init__(self, port: int):
        super().__init__(port)
        self.reconnects = -1  # first _connect is the Open(), not a drop
        self._connect()

    def _connect(self):
        self.reconnects += 1
        self.sock = socket.create_connection(("127.0.0.1", self.port), 15)
        self.sock.settimeout(15)
        assert struct.unpack(">L", self._recv(self.sock, 4))[0] >= 1
        self.sock.sendall(struct.pack(">L", 1))  # client proto version
        # command, command version = 0, body length = 4, body = 1
        # (SphinxClient::Open, api/sphinxapi.py:955)
        self.sock.sendall(
            struct.pack(">hhII", SEARCHD_COMMAND_PERSIST, 0, 4, 1)
        )

    def _alive(self) -> bool:
        """The php client's `!feof($socket)` probe: a readable socket
        whose peek returns no data is closed by the peer."""
        import select

        r, _, _ = select.select([self.sock], [], [], 0)
        if not r:
            return True
        try:
            return bool(self.sock.recv(1, socket.MSG_PEEK))
        except OSError:
            return False

    def _roundtrip(self, command: int, version: int, body: bytes):
        if not self._alive():
            self.sock.close()
            self._connect()  # force reopen (sphinxapi.php:560-561)
        self.sock.sendall(
            struct.pack(">HHL", command, version, len(body)) + body
        )
        status, ver, length = struct.unpack(
            ">HHL", self._recv(self.sock, 8)
        )
        return status, ver, self._recv(self.sock, length)

    def close(self):
        self.sock.close()


# ---------------------------------------------------------------------
# shared daemon/corpus plumbing
# ---------------------------------------------------------------------
def _xml(docs):
    out = ['<?xml version="1.0" encoding="utf-8"?>', "<sphinx:docset>",
           "<sphinx:schema>", '<sphinx:field name="body"/>',
           "</sphinx:schema>"]
    for did, content in docs:
        out.append(
            f'<sphinx:document id="{did}">'
            f"<body>{content}</body></sphinx:document>"
        )
    out.append("</sphinx:docset>")
    return "\n".join(out)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_conf(tmp, port: int, extra_searchd: str = "") -> None:
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
searchd {{
    listen = 127.0.0.1:{port}
    log = {tmp}/searchd.log
    pid_file = {tmp}/searchd.pid
    seamless_rotate = 0
{extra_searchd}
}}
"""
    )


def _start_daemon(tmp, port: int):
    r = subprocess.run(
        [ref_bin("indexer"), "--config", str(tmp / "sphinx.conf"), "--all"],
        capture_output=True, cwd=tmp, timeout=120,
    )
    assert r.returncode == 0, r.stdout.decode()[-1000:]
    proc = subprocess.Popen(
        [ref_bin("searchd"), "--config", str(tmp / "sphinx.conf"),
         "--console"],
        stdout=open(tmp / "console.log", "w"),
        stderr=subprocess.STDOUT, cwd=tmp,
    )
    deadline = time.time() + 15
    while True:
        try:
            socket.create_connection(("127.0.0.1", port), 1).close()
            break
        except OSError:
            if time.time() > deadline:
                proc.terminate()
                raise
            time.sleep(0.1)
    return proc


def _stop_daemon(proc):
    proc.terminate()
    try:
        proc.wait(10)
    except subprocess.TimeoutExpired:
        proc.kill()


def _our_build(spark, root, gen, docs):
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


def _our_results(spark, root, query, mode="extended2", limit=20):
    from sphinx_1_spark.plans.api import ApiQuery, api_query
    from sphinx_1_spark.streaming.incremental import open_current_view

    view = open_current_view(spark, root)
    idx = view.segments.sphinx_index()
    rows, meta = api_query(
        [("main", idx, None)],
        ApiQuery(query=query, mode=mode, limit=limit),
    )
    return [(r["docid"], r["weight"]) for r in rows], meta


def _norm(res):
    return (
        [(d, w) for d, w, _ in res["matches"]],
        res["total"],
        res["total_found"],
    )


# ---------------------------------------------------------------------
# test_42: persistent connections
# ---------------------------------------------------------------------
def test_42_pconn_idle_survives_client_timeout_5(spark, tmp_path):
    """test_42 variant 1 (client_timeout=5): Open -> Query('test') ->
    sleep(2) -> Query('test') -> Close over ONE connection; both
    queries answer identically, and identically to our engine."""
    docs = [(1, "test")]  # the reference fixture: one row, body='test'
    (tmp_path / "docs.xml").write_text(_xml(docs), encoding="utf-8")
    port = _free_port()
    _write_conf(tmp_path, port, "    client_timeout = 5")
    proc = _start_daemon(tmp_path, port)
    try:
        pc = PersistentApiWire(port)
        try:
            blob = pc.query_blob("test", mode=MATCH_ALL)
            r1 = pc.search([blob])[0]
            time.sleep(2)  # the test's idle gap, < client_timeout
            r2 = pc.search([blob])[0]
            # the connection SURVIVED the idle gap (variant-1 pin)
            assert pc.reconnects == 0
        finally:
            pc.close()
        assert _norm(r1) == _norm(r2)

        root = str(tmp_path / "store")
        os.makedirs(root)
        from sphinx_1_spark.streaming.incremental import promote

        _our_build(spark, root, "gen-000", docs)
        promote(root, "gen-000")
        ours, meta = _our_results(spark, root, "test", mode="all")
        assert _norm(r1)[0] == ours
        assert _norm(r1)[1:] == (meta["total"], meta["total_found"])
        assert [(w, d, h) for w, d, h in r1["words"]] == [
            (w, st["docs"], st["hits"])
            for w, st in meta["words"].items()
        ]
    finally:
        _stop_daemon(proc)


def test_42_pconn_dropped_after_client_timeout_1(spark, tmp_path):
    """test_42 variant 2 (client_timeout=1): after an idle gap past
    the timeout the daemon CLOSES the idle pconn, and the client's
    force-reopen makes the second query SUCCEED with the identical
    result — exactly the model's variant-2 sequence (both queries
    good, empty errors).  The live pins: the drop actually happened
    (a reconnect was needed), and both results equal our engine's."""
    docs = [(1, "test")]
    (tmp_path / "docs.xml").write_text(_xml(docs), encoding="utf-8")
    port = _free_port()
    _write_conf(tmp_path, port, "    client_timeout = 1")
    proc = _start_daemon(tmp_path, port)
    try:
        pc = PersistentApiWire(port)
        try:
            blob = pc.query_blob("test", mode=MATCH_ALL)
            r1 = pc.search([blob])[0]
            assert [(d, w) for d, w, _ in r1["matches"]]
            time.sleep(2.5)  # > client_timeout: the daemon hangs up
            r2 = pc.search([blob])[0]
            # the daemon really dropped the idle socket (otherwise
            # this pins nothing client_timeout-specific)
            assert pc.reconnects >= 1
        finally:
            pc.close()
        assert _norm(r2) == _norm(r1)

        root = str(tmp_path / "store")
        os.makedirs(root)
        from sphinx_1_spark.streaming.incremental import promote

        _our_build(spark, root, "gen-000", docs)
        promote(root, "gen-000")
        ours, _ = _our_results(spark, root, "test", mode="all")
        assert _norm(r1)[0] == ours
    finally:
        _stop_daemon(proc)


# ---------------------------------------------------------------------
# test_86: index rotation vs pconns
# ---------------------------------------------------------------------
def _corpus(version: int):
    rng = random.Random(86_000 + version)
    n = 40 if version == 1 else 50
    return [
        (did, " ".join(rng.choices(VOCAB, k=rng.randint(4, 16))))
        for did in range(1, n + 1)
    ]


def test_86_rotation_vs_pconn(spark, tmp_path):
    """test_86: a pconn opened BEFORE `indexer --rotate` + SIGHUP
    serves the NEW index after the swap without reconnecting — and
    both the before and after results are value-identical to our
    CURRENT-pointer analog (build generation -> promote)."""
    v1, v2 = _corpus(1), _corpus(2)
    (tmp_path / "docs.xml").write_text(_xml(v1), encoding="utf-8")
    port = _free_port()
    _write_conf(tmp_path, port)
    proc = _start_daemon(tmp_path, port)
    try:
        from sphinx_1_spark.streaming.incremental import promote

        root = str(tmp_path / "store")
        os.makedirs(root)
        _our_build(spark, root, "gen-000", v1)
        promote(root, "gen-000")

        pc = PersistentApiWire(port)
        try:
            blob = pc.query_blob("w3", limit=60)
            before_d = _norm(pc.search([blob])[0])
            before_o, _ = _our_results(spark, root, "w3", limit=60)
            assert before_d[0] == before_o

            # rotate the daemon to v2 (build .new + SIGHUP; --console
            # writes no pid file, so deliver the signal ourselves —
            # CheckRotate, src/searchd.cpp:924-927, :8396)
            (tmp_path / "docs.xml").write_text(
                _xml(v2), encoding="utf-8"
            )
            r = subprocess.run(
                [ref_bin("indexer"), "--config",
                 str(tmp_path / "sphinx.conf"), "--rotate", "--all"],
                capture_output=True, cwd=tmp_path, timeout=120,
            )
            assert r.returncode == 0, r.stdout.decode()[-1000:]
            proc.send_signal(signal.SIGHUP)

            _our_build(spark, root, "gen-001", v2)
            promote(root, "gen-001")

            # SAME connection: poll until the swap is observable
            deadline = time.time() + 30
            after_d = None
            while time.time() < deadline:
                after_d = _norm(pc.search([blob])[0])
                if after_d != before_d:
                    break
                time.sleep(0.5)
        finally:
            pc.close()
        after_o, _ = _our_results(spark, root, "w3", limit=60)
        assert after_d[0] == after_o
        assert after_d != before_d  # rotation is query-observable
    finally:
        _stop_daemon(proc)
