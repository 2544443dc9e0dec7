"""LIVE end-to-end differential: the REAL indexer + search binaries
vs our engine, on RANDOM corpora and queries.

The reference-replay harness (tests/test_reference_replay.py) proves
value-parity on the reference's own canned test suite via model.bin
goldens; this module goes further — it generates fresh random corpora,
indexes them with the compiled reference indexer (xmlpipe2 source),
queries them through the compiled `search` CLI, and requires our
SphinxIndex + api_query to produce the SAME totals, the SAME
(docid, weight, gid) match lists in the SAME order, and the SAME
per-word docs/hits statistics, across the five match modes.

Skipped automatically when the reference build is unavailable
(scripts/build_reference.sh builds it on demand).
"""

import os
import random
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(__file__))

from test_ref_differential import _ensure_build, ref_bin, run_ref  # noqa: E402

pytestmark = pytest.mark.skipif(
    not _ensure_build(),
    reason="reference build unavailable (no /root/reference or no g++)",
)

# both sides use this spec EXPLICITLY so neither depends on its
# built-in default table
CHARSET = "0..9, A..Z->a..z, _, a..z, U+410..U+42F->U+430..U+44F, U+430..U+44F"


def _xml_escape(s):
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _write_setup(tmp_path, docs):
    """xmlpipe2 corpus + sphinx.conf for the real indexer/search."""
    xml = [
        '<?xml version="1.0" encoding="utf-8"?>',
        "<sphinx:docset>",
        "<sphinx:schema>",
        '<sphinx:field name="title"/>',
        '<sphinx:field name="content"/>',
        '<sphinx:attr name="gid" type="int" bits="32"/>',
        "</sphinx:schema>",
    ]
    for did, gid, title, content in docs:
        xml.append(f'<sphinx:document id="{did}">')
        xml.append(f"<title>{_xml_escape(title)}</title>")
        xml.append(f"<content>{_xml_escape(content)}</content>")
        xml.append(f"<gid>{gid}</gid>")
        xml.append("</sphinx:document>")
    xml.append("</sphinx:docset>")
    (tmp_path / "docs.xml").write_text("\n".join(xml), encoding="utf-8")
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
"""
    )
    r = run_ref(
        [ref_bin("indexer"), "--config", str(tmp_path / "sphinx.conf"), "--all"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stdout.decode()[-1500:]


_MATCH_RE = re.compile(
    r"^\d+\. document=(\d+), weight=(\d+), gid=(\d+)", re.M
)
_HEADER_RE = re.compile(r"returned (\d+) matches of (\d+) total")
_WORD_RE = re.compile(r"^\d+\. '(.+?)': (\d+) documents, (\d+) hits", re.M)


def _real_search(tmp_path, words, flags=()):
    # the query goes as ONE argument: the CLI's option loop treats any
    # '-'-prefixed arg as an option, so a boolean '-word' term must
    # ride inside a concatenated query string (search.cpp:135-141)
    r = run_ref(
        [
            ref_bin("search"),
            "--config",
            str(tmp_path / "sphinx.conf"),
            *flags,
            " ".join(words),
        ],
        str(tmp_path),
    )
    out = r.stdout.decode()
    assert r.returncode == 0, out[-1500:]
    hm = _HEADER_RE.search(out)
    assert hm, out[-1500:]
    matches = [
        (int(d), int(w), int(g)) for d, w, g in _MATCH_RE.findall(out)
    ]
    stats = {w: (int(d), int(h)) for w, d, h in _WORD_RE.findall(out)}
    return int(hm.group(1)), int(hm.group(2)), matches, stats


def _our_index(spark, docs):
    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.plans.engine import IndexSettings, SphinxIndex

    df = spark.createDataFrame(
        [tuple(d) for d in docs], "docid long, gid long, title string, content string"
    )
    return SphinxIndex.build(
        df,
        IndexSettings(
            docid_col="docid",
            fields=("title", "content"),
            attrs=("gid",),
            tokenizer=TokenizerSettings(charset_table=CHARSET),
            tokenizer_impl="arrow",
            enable_star=False,  # sphinx.conf defaults enable_star=0
        ),
        persist=True,
    )


def _our_search(idx, query, mode):
    from sphinx_1_spark.plans.api import ApiQuery, api_query

    rows, meta = api_query(
        [("main", idx, None)], ApiQuery(query=query, mode=mode)
    )
    matches = [
        (r["docid"], r["weight"], r["gid"]) for r in rows
    ]
    stats = {
        w: (st["docs"], st["hits"]) for w, st in meta["words"].items()
    }
    # the CLI's header 'returned N' is the FULL match pool
    # (m_dMatches.GetLength(), search.cpp:320) == API 'total';
    # it PRINTS only rows iStart..iStart+iLimit == our paged rows
    return meta["total"], meta["total_found"], matches, stats


VOCAB = [f"w{i}" for i in range(14)]
MODE_FLAGS = {
    "all": (),
    "any": ("-a",),
    "boolean": ("-b",),
    "phrase": ("-p",),
    "extended2": ("-e2",),
}


def _rand_docs(rng, n):
    docs = []
    for did in range(1, n + 1):
        title = " ".join(rng.choices(VOCAB, k=rng.randint(1, 4)))
        content = " ".join(
            rng.choices(VOCAB, k=rng.randint(4, 25))
        )
        docs.append((did, rng.randint(1, 4), title, content))
    return docs


def _rand_queries(rng):
    qs = []
    w = lambda: rng.choice(VOCAB)  # noqa: E731
    qs.append(("all", [w()]))
    qs.append(("all", [w(), w()]))
    qs.append(("any", [w(), w(), w()]))
    qs.append(("phrase", [w(), w()]))
    qs.append(("boolean", [w(), f"-{w()}"]))
    qs.append(("boolean", [w(), "|", w()]))
    qs.append(("extended2", [w(), "|", w()]))
    qs.append(("extended2", [f'"{w()} {w()}"']))
    qs.append(("extended2", [f"@title {w()}"]))
    qs.append(("all", ["nosuchword"]))
    return qs


@pytest.mark.parametrize("seed", range(4))
def test_live_e2e_random_corpus(spark, tmp_path, seed):
    rng = random.Random(5000 + seed)
    docs = _rand_docs(rng, rng.randint(25, 60))
    _write_setup(tmp_path, docs)
    idx = _our_index(spark, docs)

    for mode, words in _rand_queries(rng):
        got = _our_search(idx, " ".join(words), mode)
        want = _real_search(tmp_path, words, MODE_FLAGS[mode])
        assert got == want, (
            f"mode={mode} query={words!r}\nours: {got}\nref:  {want}"
        )


def test_live_e2e_filter_and_paging(spark, tmp_path):
    """-f gid filtering and -o/-l paging against the real CLI."""
    from sphinx_1_spark.plans.api import ApiQuery, api_query
    from pyspark.sql import functions as F

    rng = random.Random(99)
    docs = _rand_docs(rng, 40)
    _write_setup(tmp_path, docs)
    idx = _our_index(spark, docs)

    n, total, matches, _ = _real_search(
        tmp_path, ["w1"], ("-f", "gid", "2")
    )
    rows, meta = api_query(
        [("main", idx, None)],
        ApiQuery(query="w1", mode="all", filters=[F.col("gid") == 2]),
    )
    assert [(r["docid"], r["weight"], r["gid"]) for r in rows] == matches
    assert (meta["total"], meta["total_found"]) == (n, total)

    n2, total2, matches2, _ = _real_search(
        tmp_path, ["w2"], ("-o", "3", "-l", "4")
    )
    rows2, meta2 = api_query(
        [("main", idx, None)],
        ApiQuery(query="w2", mode="all", offset=3, limit=4),
    )
    assert [(r["docid"], r["weight"], r["gid"]) for r in rows2] == matches2
    assert (meta2["total"], meta2["total_found"]) == (n2, total2)


# ------------------------------------------------ sort / group modes
def _write_setup_ts(tmp_path, docs):
    """Corpus variant with a timestamp attr for the date-sort modes."""
    xml = [
        '<?xml version="1.0" encoding="utf-8"?>',
        "<sphinx:docset>",
        "<sphinx:schema>",
        '<sphinx:field name="title"/>',
        '<sphinx:field name="content"/>',
        '<sphinx:attr name="gid" type="int" bits="32"/>',
        '<sphinx:attr name="ts" type="timestamp"/>',
        "</sphinx:schema>",
    ]
    for did, gid, ts, title, content in docs:
        xml.append(f'<sphinx:document id="{did}">')
        xml.append(f"<title>{_xml_escape(title)}</title>")
        xml.append(f"<content>{_xml_escape(content)}</content>")
        xml.append(f"<gid>{gid}</gid><ts>{ts}</ts>")
        xml.append("</sphinx:document>")
    xml.append("</sphinx:docset>")
    (tmp_path / "docs.xml").write_text("\n".join(xml), encoding="utf-8")
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
"""
    )
    r = run_ref(
        [ref_bin("indexer"), "--config", str(tmp_path / "sphinx.conf"), "--all"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stdout.decode()[-1500:]


def test_live_e2e_sort_and_group(spark, tmp_path):
    """--sort=date / --rsort=date / -s sort_extended / -g group-by
    against the real CLI (search.cpp:230-312 option handling)."""
    from pyspark.sql import functions as F  # noqa: F401

    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.plans.api import ApiQuery, api_query
    from sphinx_1_spark.plans.engine import IndexSettings, SphinxIndex

    rng = random.Random(77)
    docs = []
    for did in range(1, 41):
        docs.append(
            (
                did,
                rng.randint(1, 4),
                1_500_000_000 + rng.randrange(10_000_000),
                " ".join(rng.choices(VOCAB, k=rng.randint(1, 4))),
                " ".join(rng.choices(VOCAB, k=rng.randint(4, 20))),
            )
        )
    _write_setup_ts(tmp_path, docs)
    df = spark.createDataFrame(
        [tuple(d) for d in docs],
        "docid long, gid long, ts long, title string, content string",
    )
    idx = SphinxIndex.build(
        df.withColumn("ts", F.timestamp_seconds(F.col("ts"))),
        IndexSettings(
            docid_col="docid",
            fields=("title", "content"),
            attrs=("gid", "ts"),
            tokenizer=TokenizerSettings(charset_table=CHARSET),
            tokenizer_impl="arrow",
            enable_star=False,
        ),
        persist=True,
    )

    def ours(**kw):
        rows, meta = api_query(
            [("main", idx, None)], ApiQuery(query="w1", mode="all", **kw)
        )
        return (
            meta["total"],
            meta["total_found"],
            [(r["docid"], r["weight"], r["gid"]) for r in rows],
        )

    for flags, kw in [
        (("--sort=date",), dict(sortmode="attr_desc", sortby="ts")),
        (("--rsort=date",), dict(sortmode="attr_asc", sortby="ts")),
        (
            ("-s", "gid ASC, @id DESC"),
            dict(sortmode="extended", sortby="gid ASC, @id DESC"),
        ),
        (
            ("-g", "gid"),
            dict(groupattr="gid", groupfunc="attr"),
        ),
    ]:
        n, total, matches, _ = _real_search(tmp_path, ["w1"], flags)
        got = ours(**kw)
        assert got == (n, total, matches), f"flags={flags}\n{got}\nvs\n{(n, total, matches)}"


# ------------------------------------------- morphology + exact form
EN_VOCAB = [
    "running", "runs", "jumped", "jumping", "quickly", "foxes",
    "fox", "dogs", "lazy", "make", "making", "cats",
]


def test_live_e2e_morphology_exact(spark, tmp_path):
    """morphology=stem_en + index_exact_words through the REAL
    indexer: stemmed matching, =exact-form queries, phrases, and
    proximity/quorum/BEFORE operators must answer identically."""
    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.plans.engine import IndexSettings, SphinxIndex

    rng = random.Random(42)
    docs = []
    for did in range(1, 41):
        docs.append(
            (
                did,
                rng.randint(1, 3),
                " ".join(rng.choices(EN_VOCAB, k=rng.randint(1, 3))),
                " ".join(rng.choices(EN_VOCAB, k=rng.randint(4, 18))),
            )
        )
    # same xml writer, but a conf with morphology + exact words
    _write_setup(tmp_path, docs)
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
    morphology = stem_en
    index_exact_words = 1
}}
"""
    )
    r = run_ref(
        [ref_bin("indexer"), "--config", str(tmp_path / "sphinx.conf"), "--all"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stdout.decode()[-1500:]

    df = spark.createDataFrame(
        [tuple(d) for d in docs],
        "docid long, gid long, title string, content string",
    )
    idx = SphinxIndex.build(
        df,
        IndexSettings(
            docid_col="docid",
            fields=("title", "content"),
            attrs=("gid",),
            tokenizer=TokenizerSettings(
                charset_table=CHARSET,
                morphology=("stem_en",),
                index_exact_words=True,
            ),
            tokenizer_impl="arrow",
            enable_star=False,
        ),
        persist=True,
    )

    queries = [
        ("all", "running"),  # stems to run: matches runs/running
        ("all", "fox"),  # also matches foxes (stem fox)
        ("extended2", "=running"),  # exact form only
        ("extended2", "=fox"),
        ("extended2", '"lazy dogs"'),
        ("extended2", '"running quickly"~3'),
        ("extended2", '"fox dogs lazy"/2'),
        ("extended2", "making << cats"),
        ("extended2", "running -jumping"),
        ("any", "foxes jumping"),
    ]
    for mode, q in queries:
        got = _our_search(idx, q, mode)
        want = _real_search(tmp_path, [q], MODE_FLAGS[mode])
        assert got == want, f"mode={mode} q={q!r}\nours: {got}\nref:  {want}"


# -------------------------------------------- indextool dumphitlist
def test_live_dumphitlist_differential(spark, tmp_path):
    """The REAL indextool --dumphitlist stream (wordid + packed hit
    DWORDs, DebugDumpHitlist src/sphinx.cpp:15233) must equal our
    postings' packed positions for the same corpus — direct live
    validation of crc32 wordids and (field<<24 | pos | FIELD_END)
    hit packing."""
    from sphinx_1_spark.functions.wordid import crc32_word

    rng = random.Random(11)
    docs = _rand_docs(rng, 30)
    _write_setup(tmp_path, docs)
    idx = _our_index(spark, docs)

    for word in ("w1", "w5", "w9"):
        r = run_ref(
            [
                ref_bin("indextool"),
                "--config",
                str(tmp_path / "sphinx.conf"),
                "--dumphitlist",
                "main",
                word,
            ],
            str(tmp_path),
        )
        out = r.stdout.decode()
        assert r.returncode == 0, out[-800:]
        m = re.search(r"keyword=(\S+), tok=(\S+), wordid=(\d+)", out)
        assert m and m.group(3) == str(crc32_word(word)), out[:400]
        ref_hits = re.findall(r"doc=(\d+), hit=0x([0-9a-f]{8})", out)

        ours = []
        for row in (
            idx.postings.where(F.col("word") == word)
            .orderBy("docid")
            .collect()
        ):
            for pos in row["positions"]:
                ours.append((str(row["docid"]), f"{pos:08x}"))
            ours.append((str(row["docid"]), "00000000"))  # do/while sentinel
        assert ref_hits == ours, f"word={word}"


from pyspark.sql import functions as F  # noqa: E402


# ---------------------------------------------- indexer --buildstops
def test_live_buildstops_differential(spark, tmp_path):
    """REAL indexer --buildstops --buildfreqs vs our build_stopwords
    on the same corpus: identical (word, freq) sets.  N covers the
    whole vocabulary because the reference breaks count ties in
    hash-iteration order (our port's documented deviation is word-ASC
    ties) — the SET must still agree exactly."""
    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.plans.segment_index import build_stopwords

    rng = random.Random(13)
    docs = _rand_docs(rng, 35)
    _write_setup(tmp_path, docs)

    r = run_ref(
        [
            ref_bin("indexer"),
            "--config",
            str(tmp_path / "sphinx.conf"),
            "--buildstops",
            str(tmp_path / "stops.txt"),
            "500",
            "--buildfreqs",
            "main",
        ],
        str(tmp_path),
    )
    # --buildstops replaces indexing, so the indexer's "did I index
    # anything" exit status is nonzero — the artifact is the file
    assert (tmp_path / "stops.txt").exists(), r.stdout.decode()[-1200:]
    ref_pairs = set()
    for ln in (tmp_path / "stops.txt").read_text().splitlines():
        w, f = ln.split()
        ref_pairs.add((w, int(f)))

    df = spark.createDataFrame(
        [(d, f"{t} {c}") for d, _g, t, c in docs], "docid long, text string"
    )
    top = build_stopwords(
        df,
        TokenizerSettings(charset_table=CHARSET),
        top_n=500,
        text_col="text",
    )
    our_pairs = {(r["word"], r["freq"]) for r in top.collect()}
    assert our_pairs == ref_pairs


def test_live_e2e_legacy_emulation_quirks(spark, tmp_path):
    """PrepareQueryEmulation parity (src/sphinx.cpp:16196-16209),
    verified against the real binary: with '-' as a charset word
    char, legacy ALL/ANY/PHRASE on 'run-ning' must match ONLY the
    dashed-token doc (the emulation BACKSLASH-escapes, so the dash
    stays in the word — a space-split would match the two-token doc);
    and ^/$/= are NOT in the escape set, so field anchors and
    exact-form markers stay live operators in emulated queries."""
    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.plans.engine import IndexSettings, SphinxIndex

    charset = "0..9, A..Z->a..z, _, a..z, -"
    docs = [
        (1, 1, "intro", "run-ning fast"),
        (2, 1, "intro", "run ning slow"),
        (3, 1, "intro", "running other"),
        (4, 1, "tail fast", "x y"),
    ]
    _write_setup(tmp_path, docs)
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
    charset_table = {charset}
}}
"""
    )
    r = run_ref(
        [ref_bin("indexer"), "--config", str(tmp_path / "sphinx.conf"), "--all"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stdout.decode()[-1200:]

    df = spark.createDataFrame(
        [tuple(d) for d in docs],
        "docid long, gid long, title string, content string",
    )
    idx = SphinxIndex.build(
        df,
        IndexSettings(
            docid_col="docid",
            fields=("title", "content"),
            attrs=("gid",),
            tokenizer=TokenizerSettings(charset_table=charset),
            tokenizer_impl="arrow",
            enable_star=False,
        ),
        persist=True,
    )

    for mode, q in [
        ("all", "run-ning"),  # dash stays in the word via the escape
        ("any", "run-ning"),
        ("phrase", "run-ning"),
        ("all", "run-ning fast"),
        ("any", "run ning"),
        ("all", "^fast"),  # '^' is LIVE in the emulation (not escaped)
        ("all", "^running"),
        ("all", "=running"),  # '=' too
        ("any", "^tail"),
        ("all", "(fast"),  # '(' IS escaped: acts as a plain separator
    ]:
        got = _our_search(idx, q, mode)
        want = _real_search(tmp_path, [q], MODE_FLAGS[mode])
        assert got == want, f"mode={mode} q={q!r}\nours: {got}\nref:  {want}"


# ------------------------------------------------ LIVE indexer --merge
def _write_merge_setup(tmp_path, main_docs, delta_docs, kill,
                       merge_flags=()):
    """Two-index conf; build both with the real indexer, then merge
    delta INTO main with `indexer --merge` (CSphIndex_VLN::Merge,
    src/sphinx.cpp:9976): DST rows pass SRC's kill-list (and the
    optional --merge-dst-range), SRC rows always carry over."""
    def xml(docs, klist=None):
        out = [
            '<?xml version="1.0" encoding="utf-8"?>',
            "<sphinx:docset>",
            "<sphinx:schema>",
            '<sphinx:field name="title"/>',
            '<sphinx:field name="content"/>',
            '<sphinx:attr name="gid" type="int" bits="32"/>',
            "</sphinx:schema>",
        ]
        for did, gid, title, content in docs:
            out.append(
                f'<sphinx:document id="{did}">'
                f"<title>{_xml_escape(title)}</title>"
                f"<content>{_xml_escape(content)}</content>"
                f"<gid>{gid}</gid></sphinx:document>"
            )
        if klist:
            out.append(
                "<sphinx:killlist>"
                + "".join(f"<id>{k}</id>" for k in klist)
                + "</sphinx:killlist>"
            )
        out.append("</sphinx:docset>")
        return "\n".join(out)

    (tmp_path / "main.xml").write_text(xml(main_docs), encoding="utf-8")
    (tmp_path / "delta.xml").write_text(
        xml(delta_docs, kill), encoding="utf-8"
    )
    (tmp_path / "sphinx.conf").write_text(
        f"""
source smain {{
    type = xmlpipe2
    xmlpipe_command = cat {tmp_path}/main.xml
}}
source sdelta {{
    type = xmlpipe2
    xmlpipe_command = cat {tmp_path}/delta.xml
}}
index main {{
    source = smain
    path = {tmp_path}/idx_main
    charset_type = utf-8
    charset_table = {CHARSET}
}}
index delta {{
    source = sdelta
    path = {tmp_path}/idx_delta
    charset_type = utf-8
    charset_table = {CHARSET}
}}
"""
    )
    r = run_ref(
        [ref_bin("indexer"), "--config", str(tmp_path / "sphinx.conf"),
         "--all"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stdout.decode()[-1500:]
    r = run_ref(
        [ref_bin("indexer"), "--config", str(tmp_path / "sphinx.conf"),
         "--merge", "main", "delta", *merge_flags],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stdout.decode()[-1500:]


def _rand_merge_docs(rng, lo, hi):
    return [
        (
            did,
            rng.randint(1, 4),
            " ".join(rng.choices(VOCAB, k=rng.randint(1, 3))),
            " ".join(rng.choices(VOCAB, k=rng.randint(4, 15))),
        )
        for did in range(lo, hi + 1)
    ]


def _our_merged(spark, main_docs, delta_docs, kill, dst_filter=None):
    from sphinx_1_spark.plans.engine import SphinxIndex

    dst = _our_index(spark, main_docs)
    src = _our_index(spark, delta_docs)
    return SphinxIndex.merge(
        dst, src, dst_filter=dst_filter, src_kill=list(kill)
    )


@pytest.mark.parametrize("seed", range(3))
def test_live_merge_random_corpus(spark, tmp_path, seed):
    """Random main+delta with overlap + kill-list, merged by the REAL
    indexer --merge, queried through the REAL search CLI — our
    SphinxIndex.merge must answer identically (totals, ranked
    (docid, weight, gid) lists, per-word docs/hits) across match
    modes.  Extends the canned merge replays (tests 23/26/27/36/61/
    64/78/93/95) to fresh random data through the live binaries.

    The corpus appends an ALL-VOCAB sentinel doc with the highest
    docid, unkilled, so every word's dst doclist TAIL survives the
    kill filter — keeping clear of the reference's tail-leak merge
    bug (pinned separately in test_live_merge_tail_leak_bug)."""
    rng = random.Random(7700 + seed)
    main_docs = _rand_merge_docs(rng, 1, rng.randint(30, 45))
    overlap_lo = len(main_docs) - rng.randint(3, 8)
    delta_docs = _rand_merge_docs(
        rng, overlap_lo, overlap_lo + rng.randint(8, 18)
    )
    # kill-list: the delta supersedes its overlap + kills a few
    # main-only docs outright
    kill = sorted(
        {d[0] for d in delta_docs if d[0] <= len(main_docs)}
        | {rng.randint(1, overlap_lo - 1) for _ in range(3)}
    )
    sentinel = max(d[0] for d in delta_docs) + 50
    main_docs.append(
        (sentinel, 1, " ".join(VOCAB[:3]), " ".join(VOCAB))
    )
    _write_merge_setup(tmp_path, main_docs, delta_docs, kill)
    merged = _our_merged(spark, main_docs, delta_docs, kill)

    for mode, words in _rand_queries(rng):
        got = _our_search(merged, " ".join(words), mode)
        want = _real_search(tmp_path, words, (*MODE_FLAGS[mode], "-i", "main"))
        assert got == want, (
            f"mode={mode} query={words!r}\nours: {got}\nref:  {want}"
        )


def test_live_merge_dst_range(spark, tmp_path):
    """--merge-dst-range gid: DST rows outside the range drop during
    the merge (src/indexer.cpp merge options), SRC rows keep."""
    from pyspark.sql import functions as F

    rng = random.Random(7777)
    main_docs = _rand_merge_docs(rng, 1, 40)
    delta_docs = _rand_merge_docs(rng, 36, 50)
    kill = [d[0] for d in delta_docs if d[0] <= 40]
    # all-vocab sentinel (gid inside the dst-range) — see
    # test_live_merge_random_corpus / test_live_merge_tail_leak_bug
    main_docs.append((100, 2, " ".join(VOCAB[:3]), " ".join(VOCAB)))
    _write_merge_setup(
        tmp_path, main_docs, delta_docs, kill,
        merge_flags=("--merge-dst-range", "gid", "1", "2"),
    )
    merged = _our_merged(
        spark, main_docs, delta_docs, kill,
        dst_filter=F.col("gid").between(1, 2),
    )
    for mode, words in [("all", ["w1"]), ("any", ["w2", "w5"]),
                        ("extended2", ["w3", "|", "w7"])]:
        got = _our_search(merged, " ".join(words), mode)
        want = _real_search(tmp_path, words, (*MODE_FLAGS[mode], "-i", "main"))
        assert got == want, (mode, words, got, want)


def test_live_merge_tail_leak_bug(spark, tmp_path):
    """PINNED reference merge bug, root-caused in source: when the
    LAST doc of a dst doclist is rejected by the merge filter
    (kill-list or --merge-dst-range), GetNextFilteredDoc returns
    false but leaves the REJECTED docid in m_tLastDoc
    (src/sphinx.cpp:22203-22247 — m_iDocID is only zeroed on entry,
    and the filtered while-loop exits with the rejected doc still
    loaded), and MergeWordData's docid references then treat it as
    live and write its ENTIRE hit chain (:10495-10580).  The leak
    needs the word in BOTH dictionaries — the dst-only copy branch
    checks the return value and drops the doc correctly.

    Live consequences pinned here: the killed doc's postings survive
    ('aa' keeps doc 2) while dst-only words drop it ('cc' empties),
    docinfo correctly loses the row, and a search that matches via
    the phantom hits returns the killed docid with GARBAGE attributes
    (FindDocinfo misses -> out-of-bounds read; gid prints as a random
    DWORD).  Our SphinxIndex.merge has no such leak: doc 2 is fully
    gone, attrs are sane — a documented fixed-bug deviation."""
    def xml(docs, kill=None):
        out = [
            '<?xml version="1.0" encoding="utf-8"?>',
            "<sphinx:docset>",
            "<sphinx:schema>",
            '<sphinx:field name="title"/>',
            '<sphinx:field name="content"/>',
            '<sphinx:attr name="gid" type="int" bits="32"/>',
            "</sphinx:schema>",
        ]
        for did, gid, title, content in docs:
            out.append(
                f'<sphinx:document id="{did}"><title>{title}</title>'
                f"<content>{content}</content><gid>{gid}</gid>"
                "</sphinx:document>"
            )
        if kill:
            out.append(
                "<sphinx:killlist>"
                + "".join(f"<id>{k}</id>" for k in kill)
                + "</sphinx:killlist>"
            )
        out.append("</sphinx:docset>")
        return "\n".join(out)

    main_docs = [(1, 10, "aa", "bb"), (2, 20, "aa", "cc")]
    delta_docs = [(3, 30, "aa", "dd")]
    kill = [2]
    (tmp_path / "main.xml").write_text(xml(main_docs), encoding="utf-8")
    (tmp_path / "delta.xml").write_text(
        xml(delta_docs, kill), encoding="utf-8"
    )
    (tmp_path / "sphinx.conf").write_text(
        f"""
source smain {{
    type = xmlpipe2
    xmlpipe_command = cat {tmp_path}/main.xml
}}
source sdelta {{
    type = xmlpipe2
    xmlpipe_command = cat {tmp_path}/delta.xml
}}
index main {{
    source = smain
    path = {tmp_path}/idx_main
    charset_type = utf-8
    charset_table = {CHARSET}
}}
index delta {{
    source = sdelta
    path = {tmp_path}/idx_delta
    charset_type = utf-8
    charset_table = {CHARSET}
}}
"""
    )
    for args in (("--all",), ("--merge", "main", "delta")):
        r = run_ref(
            [ref_bin("indexer"), "--config", str(tmp_path / "sphinx.conf"),
             *args],
            str(tmp_path),
        )
        assert r.returncode == 0, r.stdout.decode()[-1500:]

    # the phantom posting, live: 'aa' keeps killed doc 2...
    r = run_ref(
        [ref_bin("indextool"), "--config", str(tmp_path / "sphinx.conf"),
         "--dumphitlist", "main", "aa"],
        str(tmp_path),
    )
    aa_docs = set(
        int(m) for m in re.findall(r"doc=(\d+),", r.stdout.decode())
    )
    assert aa_docs == {1, 2, 3}  # 2 is the leak
    # ...while the dst-only word drops it (the copy branch is correct)
    r = run_ref(
        [ref_bin("indextool"), "--config", str(tmp_path / "sphinx.conf"),
         "--dumphitlist", "main", "cc"],
        str(tmp_path),
    )
    assert not re.findall(r"doc=(\d+),", r.stdout.decode())
    # docinfo correctly lost the row
    r = run_ref(
        [ref_bin("indextool"), "--config", str(tmp_path / "sphinx.conf"),
         "--dumpdocids", "main"],
        str(tmp_path),
    )
    ids = [int(m) for m in re.findall(r"id=(\d+)", r.stdout.decode())]
    assert ids == [1, 3]
    # the phantom MATCHES, with garbage attrs (gid != any real value)
    n, total, matches, _ = _real_search(tmp_path, ["aa"], ("-a", "-i", "main"))
    assert [m[0] for m in matches] == [1, 2, 3]
    assert matches[1][2] not in (10, 20, 30)  # out-of-bounds gid read

    # ours: clean merge — doc 2 fully gone, sane attrs
    from sphinx_1_spark.plans.engine import SphinxIndex

    merged = SphinxIndex.merge(
        _our_index(spark, main_docs), _our_index(spark, delta_docs),
        src_kill=kill,
    )
    got = _our_search(merged, "aa", "any")
    assert [m[0] for m in got[2]] == [1, 3]
    assert [m[2] for m in got[2]] == [10, 30]
