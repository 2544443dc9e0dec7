"""Sphinx-shaped physical index: delta+VLB posting blocks, block-max
impact scores, checkpointed dictionary, per-shard manifests.

Physical layout (the .spi/.spd/.spp analog, semantically equivalent to
doc/internals-index-format.txt:12-22 with the north-star's block-max
addition):

  postings_blocks(wordid, word, n, min_docid, max_docid,
                  docids, tfs, fieldmasks[, positions],
                  max_impact, min_impact)
      one row per <=128-entry block (BLOCK_SIZE = 128, mirroring
      DOCINFO_INDEX_FREQ src/sphinx.cpp:1648); docids delta+VLB
      encoded from infinum = min_docid-1 (ZipInt semantics
      src/sphinx.cpp:5622-5637, deltas-from-infinum
      src/sphinx.cpp:9767-9772); positions per doc are delta+VLB
      packed wordpos streams, tf entries each (hitlist format
      src/sphinx.cpp:7619-7635); max/min_impact = extrema of
      tf/(tf+k1) over the block — multiplied by query-time IDF they
      bound any entry's BM25 contribution (block-max WAND).

  dictionary(wordid, word, docs, hits, nblocks)
      the .spi payload (docs/hits per word, src/sphinx.cpp:7515-7516).

  checkpoints(ckpt_id, wordid, word)
      every 1024th dictionary entry in wordid order
      (WORDLIST_CHECKPOINT src/sphinx.cpp:1592) — with Parquet/Iceberg
      the same binary-search role is played by row-group stats, so this
      table is primarily a compatibility/debug artifact.

Scale design — two build paths, one block format:

  * encode_blocks_from_runs (PRODUCTION, round 4): map-side run
    combine.  The tokenizer stage groups each Arrow batch's hits into
    per-word docid-sorted runs and ships them as packed numpy buffers
    — one row per (batch, word) instead of one per occurrence.
    Profiling showed Spark's per-row JVM<->Python Arrow crossing was
    the whole build wall (a NOOP mapInPandas over the raw hit rows
    cost the same ~12 s as the full encode at 400k docs; the numpy
    encode itself <1 s), so crossing ~40x fewer rows is the lever.
    The reduce merges each (word, grp) key's runs with one lexsort
    and cuts blocks — the reference's own sort-chunks/spill/merge
    build (Build, src/sphinx.cpp:9210).  Head-term skew: `grp`
    spreads one word's runs over n_groups deterministic reduce keys,
    so "the" with 10^11 postings at web scale merges in ~n_groups
    independent tasks, each bounded to ~64 runs; tail words pay at
    most n_groups extra blocks.

  * encode_blocks_from_hits (kept: streaming deltas, replay tests):
    one hash sort-shuffle over raw hits; a word's postings spread by
    docid hash, every partition emits independent block runs.  Byte-
    deterministic given num_partitions alone (the runs path is
    deterministic given the input split layout — rebuild/resume in
    the same layout is identical; across layouts the decoded postings
    are identical while block cuts differ, which serving tolerates).

No executor ever materializes a full head-term posting list in either
path.  Per-shard manifests carry lineage + phase metrics; a killed
sharded build resumes by skipping shards whose manifest exists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sphinx_1_spark.functions.vlb import (
    delta_decode,
    delta_encode,
    vlb_decode,
    vlb_encode,
)

BLOCK_SIZE = 128
WORDLIST_CHECKPOINT = 1024  # src/sphinx.cpp:1592
SPH_BM25_K1 = 1.2


def _blocks_schema(with_positions: bool) -> StructType:
    fields = [
        StructField("wordid", LongType(), False),
        StructField("word", StringType(), False),
        StructField("n", IntegerType(), False),
        StructField("min_docid", LongType(), False),
        StructField("max_docid", LongType(), False),
        StructField("docids", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField("fieldmasks", BinaryType(), False),
        StructField("max_impact", DoubleType(), False),
        StructField("min_impact", DoubleType(), False),
        StructField("sum_tf", LongType(), False),
    ]
    if with_positions:
        fields.insert(8, StructField("positions", BinaryType(), True))
    return StructType(fields)


def _encode_word_run(
    word: str,
    wordid: int,
    docids: np.ndarray,
    tfs: np.ndarray,
    fieldmasks: np.ndarray,
    positions: list | None,
    out: dict,
) -> None:
    """Emit <=128-entry blocks for one word's docid-sorted run."""
    nrows = docids.size
    for s in range(0, nrows, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, nrows)
        d = docids[s:e]
        t = tfs[s:e]
        fm = fieldmasks[s:e]
        imp = t / (t + SPH_BM25_K1)
        out["wordid"].append(wordid)
        out["word"].append(word)
        out["n"].append(e - s)
        out["min_docid"].append(int(d[0]))
        out["max_docid"].append(int(d[-1]))
        out["docids"].append(vlb_encode(delta_encode(d, int(d[0]) - 1)))
        out["tfs"].append(vlb_encode(t.astype(np.uint64)))
        out["fieldmasks"].append(vlb_encode(fm.astype(np.uint64)))
        out["max_impact"].append(float(imp.max()))
        out["min_impact"].append(float(imp.min()))
        out["sum_tf"].append(int(t.sum()))
        if positions is not None:
            # per entry: delta+VLB of its tf packed wordpos values —
            # vectorized: flatten the block's positions, delta with a
            # reset at each entry boundary, one VLB call per block
            # (byte-identical to per-entry encoding)
            chunk = positions[s:e]
            flat = np.concatenate([np.asarray(x, dtype=np.uint64) for x in chunk])
            if flat.size:
                deltas = np.empty_like(flat)
                deltas[0] = flat[0]
                np.subtract(flat[1:], flat[:-1], out=deltas[1:])
                lens = np.fromiter(
                    (len(x) for x in chunk), dtype=np.int64, count=len(chunk)
                )
                starts = np.cumsum(lens) - lens
                nz = starts[lens > 0]
                deltas[nz] = flat[nz]  # entry-boundary reset (infinum 0)
                out["positions"].append(vlb_encode(deltas))
            else:
                out["positions"].append(b"")


def encode_blocks(
    postings: DataFrame, with_positions: bool = True, num_partitions: int | None = None
) -> DataFrame:
    """postings (word, docid, tf, fieldmask[, positions], wordid) ->
    blocked+compressed postings_blocks.

    Streaming: repartitionByRange(wordid, docid) + sortWithinPartitions
    gives globally-ordered runs per word; the encoder buffers only the
    current word's tail rows across Arrow batches (bounded by batch
    size, not by posting-list length).
    """
    cols = ["wordid", "word", "docid", "tf", "fieldmask"]
    if with_positions:
        cols.append("positions")
    # hash partitioning on (wordid, docid): one shuffle, no range-
    # sampling pre-pass (repartitionByRange would execute the upstream
    # strip+tokenize twice), and head-term skew spreads by docid hash.
    # A word's block runs then span partitions with overlapping docid
    # ranges — fine: blocks are independent (min/max carried per
    # block) and the dictionary agg merges runs.
    # The partition count is pinned explicitly: AQE would coalesce
    # this exchange to ~64MB partitions, strangling the Python encode
    # stage's parallelism (CPU-bound, not byte-bound).
    if num_partitions is None:
        sc = postings.sparkSession.sparkContext
        num_partitions = max(sc.defaultParallelism * 3, 24)
    sorted_p = (
        postings.select(*cols)
        .repartition(num_partitions, "wordid", "docid")
        .sortWithinPartitions("wordid", "docid")
    )
    schema = _blocks_schema(with_positions)

    def enc(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the trailing (possibly incomplete) word run
            last_wid = pdf["wordid"].iloc[-1]
            cut = int(np.searchsorted(pdf["wordid"].to_numpy(), last_wid))
            carry = pdf.iloc[cut:]
            body = pdf.iloc[:cut]
            if len(body):
                yield _encode_frame(body, with_positions, schema)
        if carry is not None and len(carry):
            yield _encode_frame(carry, with_positions, schema)

    def _encode_frame(pdf: pd.DataFrame, with_pos: bool, schema) -> pd.DataFrame:
        out: dict[str, list] = {f.name: [] for f in schema.fields}
        wids = pdf["wordid"].to_numpy()
        bounds = np.flatnonzero(np.concatenate(([True], wids[1:] != wids[:-1])))
        bounds = np.concatenate((bounds, [len(pdf)]))
        docid_a = pdf["docid"].to_numpy(dtype=np.int64).astype(np.uint64)
        tf_a = pdf["tf"].to_numpy(dtype=np.float64)
        fm_a = pdf["fieldmask"].to_numpy(dtype=np.int64).astype(np.uint64)
        pos_a = pdf["positions"].to_numpy() if with_pos else None
        words = pdf["word"].to_numpy()
        for gi in range(len(bounds) - 1):
            s, e = int(bounds[gi]), int(bounds[gi + 1])
            _encode_word_run(
                str(words[s]),
                int(wids[s]),
                docid_a[s:e],
                tf_a[s:e],
                fm_a[s:e],
                list(pos_a[s:e]) if pos_a is not None else None,
                out,
            )
        return pd.DataFrame(out)

    return sorted_p.mapInPandas(enc, schema=schema)


def encode_blocks_from_hits(
    hits: DataFrame,
    with_positions: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Raw hits -> compressed blocks in ONE shuffle, all-numpy encode.

    This is Sphinx's own build shape (sort hits by (word, docid, pos),
    stream-encode: Build src/sphinx.cpp:9210 + cidxHit :7490) and the
    scale path: it skips the (word,docid) pre-aggregation entirely —
    no collect_list object aggregation, no array-typed shuffle rows.
    tf/fieldmask/positions fall out of run-length boundaries over the
    sorted hit stream via np.reduceat; VLB streams are encoded once
    per Arrow batch and sliced at block boundaries using per-value
    byte counts."""
    if num_partitions is None:
        sc = hits.sparkSession.sparkContext
        num_partitions = max(sc.defaultParallelism * 2, 16)
    sorted_h = (
        hits.select("word", "docid", "wordpos")
        .repartition(num_partitions, "word", "docid")
        .sortWithinPartitions("word", "docid", "wordpos")
    )
    schema = _blocks_schema(with_positions)

    def enc(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            words = pdf["word"].to_numpy()
            last_word = words[-1]
            cut = int(np.searchsorted(words, last_word))
            if cut == 0:
                carry = pdf
                continue
            carry = pdf.iloc[cut:]
            yield _encode_hit_frame(pdf.iloc[:cut], with_positions, schema)
        if carry is not None and len(carry):
            yield _encode_hit_frame(carry, with_positions, schema)

    return sorted_h.mapInPandas(enc, schema=schema)


def entries_from_sorted_hits(
    wchg: np.ndarray, d: np.ndarray, p: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Group a word-major, docid-sorted flat hit stream into
    (word, docid) entries.  `wchg` marks word changes per row (the
    caller derives it from strings or dense ordinals).  Returns
    (entry_starts row-index, entry_tf, entry_docid, entry_fieldmask,
    entry_new_word).  The ONE definition of the hit->entry boundary
    math — shared by the reduce-side encoder (_encode_hit_frame) and
    the map-side run combine (hits.build_runs_fused) so the two build
    paths cannot drift apart (their byte-equivalence is also
    fuzz-pinned in tests/test_segments.py)."""
    echg = wchg | np.concatenate(([True], d[1:] != d[:-1]))
    entry_starts = np.flatnonzero(echg)  # row index of each entry
    entry_tf = np.diff(np.concatenate((entry_starts, [d.size])))
    entry_docid = d[entry_starts]
    # per-entry fieldmask: OR of 1<<field over the entry's rows
    fbits = np.int64(1) << ((p >> 24) & 0xFF)
    entry_fm = np.bitwise_or.reduceat(fbits, entry_starts)
    return entry_starts, entry_tf, entry_docid, entry_fm, wchg[entry_starts]


def _encode_hit_frame(
    pdf: pd.DataFrame, with_positions: bool, schema
) -> pd.DataFrame:
    w = pdf["word"].to_numpy()
    d = pdf["docid"].to_numpy(dtype=np.int64)
    p = pdf["wordpos"].to_numpy(dtype=np.int64)

    wchg = np.concatenate(([True], w[1:] != w[:-1]))
    entry_starts, entry_rows, entry_docid, entry_fm, e_new_word = (
        entries_from_sorted_hits(wchg, d, p)
    )

    # positions are already flat in row order, contiguous per entry
    return _blocks_from_entries(
        w[entry_starts],
        entry_docid,
        entry_rows,
        entry_fm,
        e_new_word,
        p if with_positions else None,
        schema,
    )


def _block_layout(
    entry_docid: np.ndarray,
    entry_tf: np.ndarray,
    entry_fm: np.ndarray,
    entry_is_new_word: np.ndarray,
    pos_flat: np.ndarray | None,
) -> dict:
    """The numeric core of the block encoder: block cuts, delta+VLB
    streams, per-block BYTE offsets into those streams, block-max
    impacts.  Entries must be word-grouped and docid-sorted within
    each word run; `pos_flat` (when positions are kept) is the flat
    wordpos stream, contiguous per entry in entry order, entry k
    owning entry_tf[k] values.  One definition shared by the pandas
    (hits-path) and Arrow (runs-path) frame builders so the block
    BYTES cannot drift between them."""
    from sphinx_1_spark.functions.vlb import vlb_encode_with_sizes

    n_entries = entry_docid.size

    # block splits every BLOCK_SIZE entries within a word run
    run_id = np.cumsum(entry_is_new_word) - 1
    run_first_entry = np.flatnonzero(entry_is_new_word)
    within = np.arange(n_entries) - run_first_entry[run_id]
    bchg = entry_is_new_word | (within % BLOCK_SIZE == 0)
    blk_starts_e = np.flatnonzero(bchg)  # entry index of each block
    blk_n = np.diff(np.concatenate((blk_starts_e, [n_entries])))
    blk_ends_e = blk_starts_e + blk_n

    # --- VLB streams + per-block byte offsets ------------------------
    # docid deltas: reset to 1 at block starts (infinum = min_docid-1)
    ddelta = np.empty(n_entries, dtype=np.uint64)
    if n_entries:
        ddelta[0] = 1
        np.subtract(entry_docid[1:], entry_docid[:-1], out=ddelta[1:].view(np.int64))
        ddelta[blk_starts_e] = 1
    dbuf, dsz = vlb_encode_with_sizes(ddelta)
    tbuf, tsz = vlb_encode_with_sizes(entry_tf.astype(np.uint64))
    fbuf, fsz = vlb_encode_with_sizes(entry_fm.astype(np.uint64))

    def _byte_starts(sizes: np.ndarray) -> np.ndarray:
        offs = np.concatenate(([0], np.cumsum(sizes)))
        return offs[blk_starts_e]

    tf_f = entry_tf.astype(np.float64)
    imp = tf_f / (tf_f + SPH_BM25_K1)
    out = {
        "blk_starts_e": blk_starts_e,
        "blk_ends_e": blk_ends_e,
        "n": blk_n.astype(np.int32),
        "min_docid": entry_docid[blk_starts_e],
        "max_docid": entry_docid[blk_ends_e - 1],
        "dbuf": dbuf,
        "d_starts": _byte_starts(dsz),
        "tbuf": tbuf,
        "t_starts": _byte_starts(tsz),
        "fbuf": fbuf,
        "f_starts": _byte_starts(fsz),
        "max_impact": np.maximum.reduceat(imp, blk_starts_e)
        if n_entries
        else np.zeros(0),
        "min_impact": np.minimum.reduceat(imp, blk_starts_e)
        if n_entries
        else np.zeros(0),
        "sum_tf": (
            np.add.reduceat(entry_tf, blk_starts_e).astype(np.int64)
            if n_entries
            else np.zeros(0, dtype=np.int64)
        ),
    }

    if pos_flat is not None:
        # per-value position deltas with reset at entry starts (infinum 0)
        nh = pos_flat.size
        entry_pos_starts = np.concatenate(([0], np.cumsum(entry_tf)))[:-1]
        pu = pos_flat.astype(np.uint64)
        pdelta = np.empty(nh, dtype=np.uint64)
        if nh:
            pdelta[0] = pu[0]
            np.subtract(pu[1:], pu[:-1], out=pdelta[1:])
            pdelta[entry_pos_starts] = pu[entry_pos_starts]
        pbuf, psz = vlb_encode_with_sizes(pdelta)
        poffs = np.concatenate(([0], np.cumsum(psz)))
        val_starts = entry_pos_starts[blk_starts_e]
        out["pbuf"] = pbuf
        out["p_starts"] = poffs[val_starts]
    return out


def _blocks_from_entries(
    entry_word: np.ndarray,
    entry_docid: np.ndarray,
    entry_tf: np.ndarray,
    entry_fm: np.ndarray,
    entry_is_new_word: np.ndarray,
    pos_flat: np.ndarray | None,
    schema,
) -> pd.DataFrame:
    """Entry-level arrays -> <=BLOCK_SIZE-entry compressed block rows
    (pandas frame — the hits-path encoder)."""
    import zlib

    lay = _block_layout(
        entry_docid, entry_tf, entry_fm, entry_is_new_word, pos_flat
    )
    blk_starts_e = lay["blk_starts_e"]

    def _slices(buf: bytes, starts: np.ndarray) -> list[bytes]:
        ends = np.concatenate((starts[1:], [len(buf)]))
        return [buf[int(s) : int(e)] for s, e in zip(starts, ends)]

    blk_word = entry_word[blk_starts_e]
    out: dict[str, list] = {}
    out["wordid"] = [zlib.crc32(x.encode("utf-8")) for x in blk_word]
    out["word"] = list(blk_word)
    out["n"] = lay["n"]
    out["min_docid"] = lay["min_docid"]
    out["max_docid"] = lay["max_docid"]
    out["docids"] = _slices(lay["dbuf"], lay["d_starts"])
    out["tfs"] = _slices(lay["tbuf"], lay["t_starts"])
    out["fieldmasks"] = _slices(lay["fbuf"], lay["f_starts"])
    out["max_impact"] = lay["max_impact"]
    out["min_impact"] = lay["min_impact"]
    out["sum_tf"] = lay["sum_tf"]
    if pos_flat is not None:
        out["positions"] = _slices(lay["pbuf"], lay["p_starts"])
    return pd.DataFrame(out, columns=[f.name for f in schema.fields])


def encode_blocks_from_runs(
    runs: DataFrame,
    with_positions: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Packed per-(batch, word) runs (build_runs_fused) -> compressed
    blocks: shuffle ~40x fewer rows than the raw-hit path, merge each
    (word, grp) key's runs with one batch-wide lexsort, cut via the
    shared entry-level block encoder.

    The reduce is the k-way merge of the reference build
    (src/sphinx.cpp:9210): runs arrive docid-sorted, the key's entries
    are re-sorted by docid (docids are globally unique, so the merge
    order is total and deterministic), and blocks come out
    docid-contiguous per (word, grp) — better packed than the raw-hit
    path's hash-spread runs."""
    if num_partitions is None:
        sc = runs.sparkSession.sparkContext
        num_partitions = max(sc.defaultParallelism * 2, 16)
    sorted_r = (
        runs.repartition(num_partitions, "word", "grp")
        .sortWithinPartitions("word", "grp")
    )
    schema = _blocks_schema(with_positions)

    def enc(batches):
        piece: dict | None = None  # carried tail (one incomplete key)
        for rb in batches:
            new = _runs_piece(rb, with_positions)
            if new is None:
                continue
            piece = new if piece is None else _concat_pieces(piece, new)
            # hold back the trailing (possibly incomplete) key
            words, grps = piece["words"], piece["grps"]
            tail = (words == words[-1]) & (grps == grps[-1])
            cut = int(np.argmax(tail))  # first row of the last key
            if cut == 0 and bool(tail[0]):
                continue
            head = _slice_piece(piece, 0, cut)
            piece = _slice_piece(piece, cut, words.size)
            yield _encode_run_piece(head, with_positions)
        if piece is not None and piece["words"].size:
            yield _encode_run_piece(piece, with_positions)

    return sorted_r.mapInArrow(enc, schema=schema)


def _np_binary_stream(col, dtype) -> tuple[np.ndarray, np.ndarray]:
    """A pa.BinaryArray of packed fixed-width values -> (flat numpy
    stream, per-row item offsets).  The whole column decodes as TWO
    frombuffer views (values + offsets) — no per-row work; this is
    the reduce-side mirror of the map side's _binary_from_slices."""
    obuf = col.buffers()[1]
    vbuf = col.buffers()[2]
    offs = np.frombuffer(obuf, dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ]
    isz = np.dtype(dtype).itemsize
    base, end = int(offs[0]), int(offs[-1])
    seg = np.frombuffer(vbuf, dtype=np.uint8)[base:end]
    if base % isz:
        seg = seg.copy()  # realign (sliced arrays only; IPC buffers are aligned)
    return seg.view(dtype), (offs.astype(np.int64) - base) // isz


def _runs_piece(rb, with_positions: bool) -> dict | None:
    """One shuffled Arrow batch of packed runs -> numpy piece arrays
    (words/grps/n per run; flat entry + hit streams; per-run hit
    counts for slicing)."""
    if rb.num_rows == 0:
        return None
    words = rb.column(0).to_numpy(zero_copy_only=False)
    grps = rb.column(1).to_numpy(zero_copy_only=False)
    n = rb.column(2).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_all, _ = _np_binary_stream(rb.column(3), np.int64)
    tf_all, _ = _np_binary_stream(rb.column(4), np.int32)
    fm_all, _ = _np_binary_stream(rb.column(5), np.int64)
    piece = {
        "words": words,
        "grps": grps,
        "n": n,
        "doc_all": doc_all,
        "tf_all": tf_all,
        "fm_all": fm_all,
    }
    if with_positions:
        pos_all, p_offs = _np_binary_stream(rb.column(6), np.int32)
        piece["pos_all"] = pos_all
        piece["hits_n"] = np.diff(p_offs)
    return piece


def _concat_pieces(a: dict, b: dict) -> dict:
    return {k: np.concatenate((a[k], b[k])) for k in a}


def _slice_piece(p: dict, lo: int, hi: int) -> dict:
    """Slice a runs piece at RUN boundaries [lo, hi) — entry and hit
    streams cut at the matching cumulative offsets (views, no copy)."""
    e_lo = int(p["n"][:lo].sum())
    e_hi = int(p["n"][:hi].sum())
    out = {
        "words": p["words"][lo:hi],
        "grps": p["grps"][lo:hi],
        "n": p["n"][lo:hi],
        "doc_all": p["doc_all"][e_lo:e_hi],
        "tf_all": p["tf_all"][e_lo:e_hi],
        "fm_all": p["fm_all"][e_lo:e_hi],
    }
    if "pos_all" in p:
        h_lo = int(p["hits_n"][:lo].sum())
        h_hi = int(p["hits_n"][:hi].sum())
        out["pos_all"] = p["pos_all"][h_lo:h_hi]
        out["hits_n"] = p["hits_n"][lo:hi]
    return out


def _encode_run_piece(p: dict, with_positions: bool):
    """Merge one frame of (word, grp)-complete runs and emit the
    block RecordBatch — Arrow twin of the hits-path pandas encoder,
    sharing _block_layout so the block bytes are identical."""
    import zlib

    import pyarrow as pa

    words = p["words"]
    grps = p["grps"]
    n_per_run = p["n"]
    doc_all = p["doc_all"]
    tf_all = p["tf_all"].astype(np.int64)
    fm_all = p["fm_all"]

    # key ordinal per entry; merge = one lexsort (docids are unique
    # within a key — each doc lives in exactly one source batch)
    kchg = np.concatenate(
        ([True], (words[1:] != words[:-1]) | (grps[1:] != grps[:-1]))
    )
    kid_run = np.cumsum(kchg) - 1
    key_all = np.repeat(kid_run, n_per_run)
    order = np.lexsort((doc_all, key_all))

    entry_docid = doc_all[order]
    entry_tf = tf_all[order]
    entry_fm = fm_all[order]
    key_sorted = key_all[order]
    entry_is_new_word = np.concatenate(
        ([True], key_sorted[1:] != key_sorted[:-1])
    )
    # run ordinal per entry (word strings touched only per block)
    entry_run = np.repeat(
        np.arange(words.size, dtype=np.int64), n_per_run
    )[order]

    pos_flat = None
    if with_positions:
        pos_all = p["pos_all"].astype(np.int64)
        # permute per-entry variable-length chunks into merged order
        src_off = np.concatenate(([0], np.cumsum(tf_all)))[:-1]
        new_lens = entry_tf
        new_src = src_off[order]
        total = int(new_lens.sum())
        out_off = np.concatenate(([0], np.cumsum(new_lens)))[:-1]
        gather = (
            np.repeat(new_src - out_off, new_lens)
            + np.arange(total, dtype=np.int64)
        )
        pos_flat = pos_all[gather]

    lay = _block_layout(
        entry_docid, entry_tf, entry_fm, entry_is_new_word, pos_flat
    )
    blk_starts_e = lay["blk_starts_e"]
    nblocks = blk_starts_e.size

    blk_run = entry_run[blk_starts_e]
    blk_words = words[blk_run]
    # crc32 once per RUN (blocks of one word share it)
    run_crc = np.fromiter(
        (zlib.crc32(w.encode("utf-8")) for w in words),
        dtype=np.int64,
        count=words.size,
    )

    def _bin(buf: bytes, starts: np.ndarray):
        if len(buf) > 0x7FFFFFF0:
            # pa.binary() carries int32 offsets; a reduce frame's VLB
            # stream past 2 GB would wrap silently. One frame holds
            # the (word, grp)-complete runs of one shuffled batch —
            # hitting this means encode partitions are far too coarse
            # for the corpus; raise them (or n_groups) instead.
            raise ValueError(
                f"block frame VLB stream {len(buf)} B exceeds the "
                "int32 Arrow binary offset limit; raise "
                "encode_partitions/n_groups so each reduce frame "
                "holds fewer entries"
            )
        offsets = np.empty(nblocks + 1, dtype=np.int32)
        offsets[:-1] = starts
        offsets[-1] = len(buf)
        return pa.Array.from_buffers(
            pa.binary(),
            nblocks,
            [None, pa.py_buffer(offsets), pa.py_buffer(buf)],
        )

    arrays = [
        pa.array(run_crc[blk_run]),
        pa.array(blk_words.tolist(), type=pa.string()),
        pa.array(lay["n"]),
        pa.array(lay["min_docid"]),
        pa.array(lay["max_docid"]),
        _bin(lay["dbuf"], lay["d_starts"]),
        _bin(lay["tbuf"], lay["t_starts"]),
        _bin(lay["fbuf"], lay["f_starts"]),
    ]
    names = [
        "wordid", "word", "n", "min_docid", "max_docid",
        "docids", "tfs", "fieldmasks",
    ]
    if with_positions:
        arrays.append(_bin(lay["pbuf"], lay["p_starts"]))
        names.append("positions")
    arrays += [
        pa.array(lay["max_impact"]),
        pa.array(lay["min_impact"]),
        pa.array(lay["sum_tf"]),
    ]
    names += ["max_impact", "min_impact", "sum_tf"]
    return pa.RecordBatch.from_arrays(arrays, names=names)


def decode_blocks(blocks: DataFrame, with_positions: bool = False) -> DataFrame:
    """Inverse of encode_blocks: explode block rows back to
    (wordid, word, docid, tf, fieldmask[, positions])."""
    fields = [
        StructField("wordid", LongType(), False),
        StructField("word", StringType(), False),
        StructField("docid", LongType(), False),
        StructField("tf", IntegerType(), False),
        StructField("fieldmask", IntegerType(), False),
    ]
    if with_positions:
        from pyspark.sql.types import ArrayType

        fields.append(StructField("positions", ArrayType(IntegerType()), True))
    schema = StructType(fields)

    def dec(batches):
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in schema.fields}
            for row in pdf.itertuples(index=False):
                n = int(row.n)
                d = delta_decode(vlb_decode(bytes(row.docids), n), row.min_docid - 1)
                t = vlb_decode(bytes(row.tfs), n).astype(np.int64)
                fm = vlb_decode(bytes(row.fieldmasks), n).astype(np.int64)
                out["wordid"].extend([int(row.wordid)] * n)
                out["word"].extend([row.word] * n)
                out["docid"].extend(d.astype(np.int64).tolist())
                out["tf"].extend(t.tolist())
                out["fieldmask"].extend(fm.tolist())
                if with_positions:
                    allpos = vlb_decode(bytes(row.positions))
                    idx = 0
                    for k in range(n):
                        cnt = int(t[k])
                        out["positions"].append(
                            delta_decode(allpos[idx : idx + cnt])
                            .astype(np.int64)
                            .tolist()
                        )
                        idx += cnt
            yield pd.DataFrame(out)

    return blocks.mapInPandas(dec, schema=schema)


def build_dictionary_from_blocks(blocks: DataFrame) -> DataFrame:
    """dictionary(wordid, word, docs, hits, nblocks) — merges multiple
    block runs per word (partition/batch cuts, segment merges)."""
    return blocks.groupBy("wordid", "word").agg(
        F.sum("n").cast("long").alias("docs"),
        F.sum("sum_tf").cast("long").alias("hits"),
        F.count(F.lit(1)).cast("int").alias("nblocks"),
    )


def build_checkpoints(dictionary: DataFrame) -> DataFrame:
    """Every 1024th entry in (wordid, word) order
    (src/sphinx.cpp:7546-7568).

    Scale shape: a bare Window.orderBy would funnel the entire
    dictionary (∝ distinct terms — easily 10^8+ at web scale) through
    ONE task. Instead entries are bucketed by an order-preserving
    pure function of wordid — equal-width cuts over the OBSERVED
    [min, max] wordid range (one tiny agg), which adapts to both
    32-bit crc32 ids and full-signed-range FNV id64 ids (a fixed
    bit-shift would clamp every id64 wordid into the two edge buckets,
    funneling the rank back into two giant tasks).  Entries are ranked
    in parallel within buckets and each bucket's local ranks are
    shifted by the prefix sum of bucket counts (one tiny collect).
    Bucket membership is a pure expression of the row given the
    min/max literals, so the count pass and the rank pass agree
    without persisting.  double(long) is monotonic, so the bucket id
    is non-decreasing in wordid even where the cast rounds."""
    import math

    from pyspark.sql import Window

    n_buckets = 64
    mm = dictionary.agg(
        F.min("wordid").alias("lo"), F.max("wordid").alias("hi")
    ).first()
    if mm is None or mm["lo"] is None:
        return dictionary.select(
            F.lit(0).cast("int").alias("ckpt_id"), "wordid", "word"
        ).limit(0)
    lo_f = float(mm["lo"])
    # strictly-greater upper bound so the max wordid lands inside the
    # last bucket (width_bucket's range is half-open [min, max))
    hi_f = math.nextafter(max(float(mm["hi"]), lo_f), math.inf)
    bucket = (
        F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                (
                    F.width_bucket(
                        F.col("wordid").cast("double"),
                        F.lit(lo_f),
                        F.lit(hi_f),
                        F.lit(n_buckets),
                    )
                    - 1
                ).cast("int"),
            ),
        )
    ).cast("int")
    d = dictionary.select("wordid", "word").withColumn("_b", bucket)
    counts = {
        r["_b"]: r["c"]
        for r in d.groupBy("_b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off = F.create_map(
        *[F.lit(x).cast("long") for kv in sorted(offsets.items()) for x in kv]
    )
    w = Window.partitionBy("_b").orderBy("wordid", "word")
    rn = F.row_number().over(w).cast("long") - 1 + off[F.col("_b").cast("long")]
    return (
        d.withColumn("rn", rn)
        .where(F.col("rn") % WORDLIST_CHECKPOINT == 0)
        .select(
            (F.col("rn") / WORDLIST_CHECKPOINT).cast("int").alias("ckpt_id"),
            "wordid",
            "word",
        )
    )
