"""Physical index tests: VLB blocks roundtrip, sharded build + resume,
block-max WAND top-k == exhaustive scoring."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from sphinx_1_spark.functions.vlb import (
    delta_decode,
    delta_encode,
    vlb_decode,
    vlb_encode,
)


def test_vlb_spec_examples():
    # doc/internals-index-format.txt:53-63 worked examples
    assert vlb_encode(np.array([0x37])) == bytes([0x37])
    assert vlb_encode(np.array([0x12345])) == bytes([0x84, 0xC6, 0x45])


def test_vlb_roundtrip_fuzz():
    rng = np.random.default_rng(7)
    for _ in range(30):
        v = rng.integers(0, 2**63, size=int(rng.integers(0, 400))).astype(np.uint64)
        assert (vlb_decode(vlb_encode(v), len(v)) == v).all()
        sv = np.unique(v)
        assert (delta_decode(delta_encode(sv, 0), 0) == sv).all()


@pytest.fixture(scope="module")
def built_segments(spark, tmp_path_factory):
    from sphinx_1_spark.plans.segment_index import SegmentSet, build_segments
    from sphinx_1_spark.sources.pages import generate_pages

    out = str(tmp_path_factory.mktemp("segments"))
    pages = generate_pages(spark, 400, seed=42, partitions=4)
    paths = build_segments(pages, out, n_shards=3)
    return SegmentSet(spark, paths), out, pages


def test_blocks_roundtrip(spark, built_segments):
    segs, _, pages = built_segments
    from sphinx_1_spark.operators.segments import decode_blocks
    from sphinx_1_spark.plans.pipeline import assign_docids, strip_pages
    from sphinx_1_spark.plans.engine import IndexSettings, SphinxIndex
    from sphinx_1_spark.functions.tokenizer import TokenizerSettings

    docs = assign_docids(strip_pages(pages), "fingerprint")
    idx = SphinxIndex.build(
        docs,
        IndexSettings(
            docid_col="docid",
            fields=("text",),
            tokenizer=TokenizerSettings(ngram_chars="U+4E00..U+9FBF"),
            tokenizer_impl="arrow",
        ),
    )
    want = {
        (r["word"], r["docid"]): (r["tf"], r["fieldmask"], tuple(r["positions"]))
        for r in idx.postings.collect()
    }
    got = {
        (r["word"], r["docid"]): (r["tf"], r["fieldmask"], tuple(r["positions"]))
        for r in decode_blocks(segs.blocks, with_positions=True).collect()
    }
    assert got == want


def test_block_invariants(built_segments):
    segs, _, _ = built_segments
    rows = segs.blocks.select("n", "min_docid", "max_docid").collect()
    assert rows and all(1 <= r["n"] <= 128 for r in rows)
    assert all(r["min_docid"] <= r["max_docid"] for r in rows)


def test_dictionary_and_checkpoints(spark, built_segments):
    segs, out, _ = built_segments
    d = segs.dictionary
    the = d.where(F.col("word") == "the").collect()
    assert the and the[0]["docs"] > 150
    ck = spark.read.parquet(os.path.join(segs.paths[0], "checkpoints"))
    assert ck.count() >= 1
    assert ck.where(F.col("ckpt_id") == 0).count() == 1


def test_checkpoints_id64_full_range(spark):
    # FNV64 wordids span the full SIGNED int64 range; the checkpoint
    # bucketing must adapt to the observed range (a fixed bit-shift
    # clamps every id64 wordid into the two edge buckets, funneling
    # the whole rank into two tasks) and still reproduce the exact
    # every-1024th-entry-in-(wordid, word)-order contract.
    from sphinx_1_spark.functions.wordid import fnv64_word
    from sphinx_1_spark.operators.segments import (
        WORDLIST_CHECKPOINT,
        build_checkpoints,
    )

    words = [f"w{i:05d}" for i in range(2600)]
    rows = [(fnv64_word(w) - (1 << 64) if fnv64_word(w) >= (1 << 63) else fnv64_word(w), w) for w in words]
    d = spark.createDataFrame(rows, "wordid long, word string")
    got = sorted(
        (r["ckpt_id"], r["wordid"], r["word"])
        for r in build_checkpoints(d).collect()
    )
    ordered = sorted(rows)
    want = [
        (i // WORDLIST_CHECKPOINT, wid, w)
        for i, (wid, w) in enumerate(ordered)
        if i % WORDLIST_CHECKPOINT == 0
    ]
    assert got == want
    # ids really do cover both sign halves (the degenerate clamp would
    # still pass the parity check above on a single-task plan)
    assert min(r[0] for r in rows) < 0 < max(r[0] for r in rows)


def test_manifest_and_resume(spark, built_segments, tmp_path):
    segs, _, _ = built_segments
    from sphinx_1_spark.plans.segment_index import (
        SegmentSet,
        build_segments,
        read_manifest,
    )
    from sphinx_1_spark.sources.pages import generate_pages

    m = read_manifest(segs.paths[0])
    assert m["status"] == "complete" and m["n_docs"] > 0
    assert "metrics" in m and "lineage" in m

    # isolated build for the kill/resume cycle
    out = str(tmp_path / "resume_segs")
    pages = generate_pages(spark, 150, seed=9, partitions=3)
    paths = build_segments(pages, out, n_shards=2)
    s1 = SegmentSet(spark, paths)
    a = sorted(
        (r["wordid"], r["min_docid"], bytes(r["docids"]))
        for r in s1.blocks.collect()
    )
    before = {p: read_manifest(p)["n_docs"] for p in paths}
    # simulate kill: nuke one shard's manifest, resume
    os.remove(os.path.join(paths[1], "_MANIFEST.json"))
    paths2 = build_segments(pages, out, n_shards=2)
    after = {p: read_manifest(p)["n_docs"] for p in paths2}
    assert after == before
    s2 = SegmentSet(spark, paths2)
    b = sorted(
        (r["wordid"], r["min_docid"], bytes(r["docids"]))
        for r in s2.blocks.collect()
    )
    assert a == b


def _exact_topk(segs, words, k, mode):
    from sphinx_1_spark.operators.segments import decode_blocks
    from sphinx_1_spark.functions.wordid import crc32_word

    idf = segs._idf(words)
    wids = {w: crc32_word(w) for w in words}
    blocks = segs.blocks.where(F.col("wordid").isin(list(wids.values())))
    return (
        segs._score_blocks(blocks, words, wids, idf, require_all=(mode == "and"))
        .orderBy(F.col("weight").desc(), F.col("docid").asc())
        .limit(k)
        .collect()
    )


@pytest.mark.parametrize(
    "words,mode",
    [
        (["the"], "or"),
        (["the", "w0001"], "and"),
        (["w0001", "w0002"], "or"),
        (["the", "w0000"], "or"),  # head term: idf may go negative
        (["w0003", "nosuchword"], "and"),
        (["w0003", "nosuchword"], "or"),
    ],
)
def test_wand_equals_exact(built_segments, words, mode):
    segs, _, _ = built_segments
    got = [(r["docid"], r["weight"]) for r in segs.wand_topk(words, 10, mode).collect()]
    want = [(r["docid"], r["weight"]) for r in _exact_topk(segs, words, 10, mode)]
    assert got == want


# ----------------------------------------------------------------------
# Map-side run combine (build_runs_fused + encode_blocks_from_runs):
# the production build path since round 4 — the raw-hit shuffle's
# JVM<->Python crossing was the measured build wall (a NOOP
# mapInPandas over the hit rows cost the same as the full encode).
def test_runs_path_equivalent_to_hits_path(spark, tmp_path):
    """Same corpus through both combine modes: decoded postings,
    positions, and dictionary stats must be identical (block CUTS may
    differ — runs blocks are docid-contiguous per (word, grp), the
    hit path's are hash-spread)."""
    from sphinx_1_spark.operators.segments import decode_blocks
    from sphinx_1_spark.plans.segment_index import SegmentSet, build_segments
    from sphinx_1_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 600, seed=23, partitions=5)
    sets = {}
    for mode in ("hits", "runs"):
        out = str(tmp_path / mode)
        paths = build_segments(pages, out, n_shards=2, combine=mode)
        sets[mode] = SegmentSet(spark, paths)

    def canon(segs):
        rows = decode_blocks(segs.blocks, with_positions=True).collect()
        return sorted(
            (r["wordid"], r["word"], r["docid"], r["tf"], r["fieldmask"],
             tuple(r["positions"]))
            for r in rows
        )

    assert canon(sets["hits"]) == canon(sets["runs"])
    d_h = {(r["wordid"], r["word"]): (r["docs"], r["hits"])
           for r in sets["hits"].dictionary.collect()}
    d_r = {(r["wordid"], r["word"]): (r["docs"], r["hits"])
           for r in sets["runs"].dictionary.collect()}
    assert d_h == d_r
    # runs-path manifests record their combine mode for lineage
    assert sets["runs"].manifests[0]["lineage"]["combine"] == "runs"


def test_runs_multi_group_and_block_invariants(spark):
    """n_groups > 1 (the head-term skew spread): every word's entries
    split across grp keys, blocks stay <= BLOCK_SIZE, internally
    docid-sorted, and the union of decoded postings is exactly the
    single-group set."""
    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.operators.hits import build_runs_fused
    from sphinx_1_spark.operators.segments import (
        BLOCK_SIZE,
        decode_blocks,
        encode_blocks_from_runs,
    )
    from sphinx_1_spark.plans.pipeline import assign_docids
    from sphinx_1_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 500, seed=31, partitions=6)
    docs = assign_docids(pages, "fingerprint")
    tok = TokenizerSettings(ngram_chars="U+4E00..U+9FBF")

    def postings(n_groups, num_partitions):
        runs = build_runs_fused(docs, "docid", "html", tok, n_groups=n_groups)
        blocks = encode_blocks_from_runs(
            runs, with_positions=True, num_partitions=num_partitions
        )
        rows = blocks.collect()
        assert all(r["n"] <= BLOCK_SIZE for r in rows)
        for r in rows:
            assert r["min_docid"] <= r["max_docid"]
        dec = decode_blocks(
            spark.createDataFrame(rows, blocks.schema), with_positions=True
        ).collect()
        return sorted(
            (r["wordid"], r["docid"], r["tf"], tuple(r["positions"]))
            for r in dec
        )

    base = postings(1, 8)
    spread = postings(4, 3)  # more groups, different reduce parallelism
    assert base == spread


def test_runs_reduce_carry_across_batches(spark):
    """A (word, grp) key split across reduce Arrow batches must merge
    into one docid-contiguous run, not two: force 1-row batches via a
    tiny maxRecordsPerBatch and check the heavy word's blocks."""
    import pandas as pd

    from sphinx_1_spark.operators.segments import (
        decode_blocks,
        encode_blocks_from_runs,
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        import numpy as np

        rows = []
        # one word, 7 runs of 3 entries each, interleaved docid ranges
        for r in range(7):
            d = np.array([r + 10 * k for k in range(3)], dtype=np.int64)
            rows.append(
                {
                    "word": "hot",
                    "grp": 0,
                    "n": 3,
                    "docids": d.tobytes(),
                    "tfs": np.array([1, 1, 1], dtype=np.int32).tobytes(),
                    "fieldmasks": np.array([1, 1, 1], dtype=np.int64).tobytes(),
                    "positions": np.array([1, 1, 1], dtype=np.int32).tobytes(),
                }
            )
        from sphinx_1_spark.operators.hits import RUNS_SCHEMA

        runs = spark.createDataFrame(pd.DataFrame(rows), RUNS_SCHEMA)
        blocks = encode_blocks_from_runs(
            runs, with_positions=True, num_partitions=1
        )
        out = blocks.collect()
        # 21 entries, one key -> one block, globally docid-sorted
        assert len(out) == 1 and out[0]["n"] == 21
        dec = decode_blocks(
            spark.createDataFrame(out, blocks.schema), with_positions=True
        ).collect()
        docids = [r["docid"] for r in sorted(dec, key=lambda r: r["docid"])]
        assert docids == sorted(r + 10 * k for r in range(7) for k in range(3))
        assert docids == [r["docid"] for r in dec]  # stream order == sorted
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_segment_tool_cli(built_segments, capsys):
    """indextool analog (scripts/segment_tool.py, indextool.cpp:19-157):
    `describe` prints every segment's manifest header (lineage +
    metrics), `dictionary` prints top-df entries that must agree with
    SegmentSet.dictionary — the CLI shares its definition, this pins
    the wiring."""
    import pathlib
    import sys as _sys

    ss, out, _pages = built_segments
    paths = sorted(
        str(p) for p in pathlib.Path(out).iterdir() if p.is_dir()
    )
    assert len(paths) == 3
    _sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    import segment_tool

    assert segment_tool.main(["segment_tool", "describe", *paths]) == 0
    text = capsys.readouterr().out
    assert text.count("segment:") == len(paths)
    for key in ("n_docs", "n_hits", "lineage", "metrics"):
        assert text.count(f"  {key}:") == len(paths), key

    assert (
        segment_tool.main(
            ["segment_tool", "dictionary", *paths, "--top", "5"]
        )
        == 0
    )
    lines = [
        ln for ln in capsys.readouterr().out.strip().splitlines() if ln
    ]
    assert len(lines) == 5
    top = (
        ss.dictionary.groupBy("word")
        .agg(F.sum("docs").alias("docs"), F.sum("hits").alias("hits"))
        .orderBy(F.col("docs").desc(), F.col("word").asc())
        .limit(5)
        .collect()
    )
    assert [ln.split("\t") for ln in lines] == [
        [r["word"], str(r["docs"]), str(r["hits"])] for r in top
    ]

    # unknown command / missing args fail cleanly
    assert segment_tool.main(["segment_tool", "frobnicate", "x"]) == 1
    assert segment_tool.main(["segment_tool"]) == 1


def test_segment_tool_dumpdocids(built_segments, capsys):
    """indextool --dumpdocids analog (DebugDumpDocids,
    src/sphinx.cpp:15209-15231): three header lines then `N. id=<docid>`
    per docinfo row, docid-ascending, numbering from 1 — checked
    against the docinfo table itself."""
    import pathlib
    import sys as _sys

    ss, out, _ = built_segments
    paths = sorted(str(p) for p in pathlib.Path(out).iterdir() if p.is_dir())
    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import segment_tool

    assert segment_tool.main(["segment_tool", "dumpdocids", *paths]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0].startswith("docinfo-bytes: ")
    assert int(lines[0].split(": ")[1]) > 0
    assert lines[1] == f"docinfo-stride: {len(ss.docinfo.columns)}"
    want_ids = sorted(r["docid"] for r in ss.docinfo.select("docid").collect())
    assert lines[2] == f"docinfo-rows: {len(want_ids)}"
    assert lines[3:] == [
        f"{n}. id={d}" for n, d in enumerate(want_ids, 1)
    ]


def test_segment_tool_dumphitlist(built_segments, capsys):
    """indextool --dumphitlist analog (DebugDumpHitlist,
    src/sphinx.cpp:15233-15288): header `keyword=, tok=, wordid=`, then
    `doc=, hit=0x%08x` per packed hit in (docid, hitpos) stream order,
    each doc closed by the reference do/while's `hit=0x00000000`
    sentinel line.  Values checked against decode_blocks directly."""
    import pathlib
    import re
    import sys as _sys

    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.operators.segments import decode_blocks

    ss, out, _ = built_segments
    paths = sorted(str(p) for p in pathlib.Path(out).iterdir() if p.is_dir())
    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import segment_tool

    # pick the highest-df dictionary word so the dump spans many docs
    word_row = (
        ss.dictionary.orderBy(F.col("docs").desc(), F.col("word").asc())
        .limit(1)
        .collect()[0]
    )
    word, wordid = word_row["word"], int(word_row["wordid"])

    assert segment_tool.main(["segment_tool", "dumphitlist", *paths, word]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == f"keyword={word}, tok={word}, wordid={wordid}"

    postings = sorted(
        (
            (r["docid"], list(r["positions"]))
            for r in decode_blocks(
                ss.blocks.filter(F.col("wordid") == wordid), with_positions=True
            ).collect()
        ),
    )
    want = []
    for docid, positions in postings:
        want += [f"doc={docid}, hit=0x{p:08x}" for p in positions]
        want.append(f"doc={docid}, hit=0x00000000")  # do/while sentinel
    assert lines[1:] == want
    # every non-sentinel hit is a packed (field<<24 | pos) DWORD
    for ln in lines[1:]:
        m = re.fullmatch(r"doc=\d+, hit=0x([0-9a-f]{8})", ln)
        assert m, ln

    # absent word: header with the dict-computed crc32 id, no hits
    from sphinx_1_spark.functions.wordid import crc32_word

    assert (
        segment_tool.main(
            ["segment_tool", "dumphitlist", *paths, "zzzunindexedzzz"]
        )
        == 0
    )
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines == [
        "keyword=zzzunindexedzzz, tok=zzzunindexedzzz, "
        f"wordid={crc32_word('zzzunindexedzzz')}"
    ]

    # sphDie analogs: no token (specials only) / stopword -> wordid 0
    assert segment_tool.main(["segment_tool", "dumphitlist", *paths, "!!"]) == 1
    assert (
        capsys.readouterr().out.strip()
        == "FATAL: keyword=!!, no token (too short?)"
    )
    assert (
        segment_tool.dumphitlist(
            paths, "the", settings=TokenizerSettings(stopwords=frozenset({"the"}))
        )
        == 1
    )
    assert (
        capsys.readouterr().out.strip()
        == "FATAL: keyword=the, tok=the, no wordid (stopped?)"
    )
    # missing keyword arg
    assert segment_tool.main(["segment_tool", "dumphitlist", paths[0]]) == 1


def test_segment_tool_search_cli(built_segments, capsys):
    """search CLI analog (scripts/segment_tool.py search,
    src/search.cpp:41-441): query the segment store from the command
    line, print matches in the reference's `N. document=, weight=`
    format plus per-word stats; --sort=date resolves the first
    timestamp attr (search.cpp:286-301); a string group attr is
    rejected like the sorter's setup error."""
    import pathlib
    import re as _re
    import sys as _sys

    ss, out, _pages = built_segments
    paths = sorted(str(p) for p in pathlib.Path(out).iterdir() if p.is_dir())
    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import segment_tool

    # any-mode over the head term: header counts + word stats must
    # agree with the merged dictionary
    rc = segment_tool.main(
        ["segment_tool", "search", *paths, "-a", "-l", "3", "the"]
    )
    assert rc == 0
    text = capsys.readouterr().out
    df_the = (
        ss.dictionary.where(F.col("word") == "the")
        .groupBy("word")
        .agg(F.sum("docs").alias("docs"), F.sum("hits").alias("hits"))
        .collect()[0]
    )
    m = _re.search(r"returned (\d+) matches of (\d+) total", text)
    assert m and int(m.group(1)) == 3 and int(m.group(2)) == df_the["docs"]
    assert (
        f"1. '{'the'}': {df_the['docs']} documents, {df_the['hits']} hits"
        in text
    )
    body = [ln for ln in text.splitlines() if _re.match(r"\d+\. document=", ln)]
    assert len(body) == 3
    assert all(", weight=" in ln and ", url=" in ln for ln in body)

    # --sort=date: warc_ts strictly non-increasing down the page
    rc = segment_tool.main(
        ["segment_tool", "search", *paths, "-a", "--sort=date", "-l", "5", "the"]
    )
    assert rc == 0
    stamps = _re.findall(
        r"warc_ts=([0-9: -]+),", capsys.readouterr().out
    )
    assert len(stamps) == 5 and stamps == sorted(stamps, reverse=True)
    # --rsort=date ascends
    rc = segment_tool.main(
        ["segment_tool", "search", *paths, "-a", "--rsort=date", "-l", "5", "the"]
    )
    assert rc == 0
    up = _re.findall(r"warc_ts=([0-9: -]+),", capsys.readouterr().out)
    assert len(up) == 5 and up == sorted(up)

    # -f on a string attr compares in the string domain: no lang == '5'
    rc = segment_tool.main(
        ["segment_tool", "search", *paths, "-a", "-f", "lang", "5", "the"]
    )
    assert rc == 0
    assert "returned 0 matches of 0 total" in capsys.readouterr().out

    # string group attr -> reference-style setup error
    rc = segment_tool.main(
        ["segment_tool", "search", *paths, "-a", "-g", "lang", "the"]
    )
    assert rc == 1
    assert "not found or invalid type" in capsys.readouterr().out

    # unknown option -> reference-style malformed-option error
    rc = segment_tool.main(
        ["segment_tool", "search", *paths, "--frobnicate", "the"]
    )
    assert rc == 1
    assert "malformed or unknown option" in capsys.readouterr().out

    # no segment dirs -> usage
    assert segment_tool.main(["segment_tool", "search", "-a", "the"]) == 1


def test_segment_tool_search_config_option(built_segments, capsys, tmp_path):
    """search -c sphinx.conf [-i NAME] (search.cpp:80): query-side
    tokenizer settings come from the config's index section; a config
    equivalent to the build defaults answers identically, and a bad
    config dies with FATAL."""
    import pathlib
    import sys as _sys

    _, out, _ = built_segments
    paths = sorted(str(p) for p in pathlib.Path(out).iterdir() if p.is_dir())
    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import segment_tool

    conf = tmp_path / "s.conf"
    conf.write_text(
        "index other {\n    charset_type = utf-8\n"
        "    min_word_len = 100\n}\n"  # absurd: would drop every word
        "index web {\n    charset_type = utf-8\n"
        "    ngram_chars = U+4E00..U+9FBF\n}\n"
    )

    assert segment_tool.main(["segment_tool", "search", *paths, "the"]) == 0
    base = capsys.readouterr().out
    assert (
        segment_tool.main(
            [
                "segment_tool", "search", *paths,
                "-c", str(conf), "-i", "web", "the",
            ]
        )
        == 0
    )
    with_conf = capsys.readouterr().out
    # identical matches/stats modulo the query-time line
    strip = lambda t: [  # noqa: E731
        ln for ln in t.splitlines() if not ln.startswith("index 'segments'")
    ]
    assert strip(with_conf) == strip(base)

    # -i defaulting to the FIRST index section picks 'other', whose
    # min_word_len=100 drops the query word entirely -> zero matches
    assert (
        segment_tool.main(
            ["segment_tool", "search", *paths, "-c", str(conf), "the"]
        )
        == 0
    )
    first = capsys.readouterr().out
    assert "returned 0 matches of 0 total" in first

    # bad config file -> FATAL, exit 1
    assert (
        segment_tool.main(
            [
                "segment_tool", "search", *paths,
                "-c", str(tmp_path / "nope.conf"), "the",
            ]
        )
        == 1
    )
    assert "FATAL:" in capsys.readouterr().out
