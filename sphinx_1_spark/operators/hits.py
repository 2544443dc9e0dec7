"""Hit extraction: documents -> (docid, word, wordpos) relation.

The hit relation is Sphinx's central intermediate (CSphWordHit,
reference src/sphinx.h:597-602): one row per keyword occurrence with
wordpos = field<<24 | is_field_end<<23 | in_field_position
(src/sphinx.cpp:229-241).

Two implementations:
  * native: pure Catalyst (lower/regexp/split/posexplode) — whole-stage
    codegen, zero Python. Exactly equivalent to the charset_table
    default on ASCII text; this is the hot path for the English web
    corpus and what the benchmark uses.
  * arrow: mapInPandas + the full Tokenizer (charset folding, CJK
    MMSEG/ngram, stopwords, overshort steps) — Arrow-batched, numpy
    inner loops, needed only where native semantics diverge.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from sphinx_1_spark.functions.tokenizer import HIT_FIELD_END, TokenizerSettings

# Separator class equivalent to SPHINX_DEFAULT_UTF8_TABLE on ASCII text
# (0..9, a..z, _ are word chars; A..Z fold via lower()).
_ASCII_SEP_RE = "[^0-9a-z_]+"

HITS_SCHEMA = StructType(
    [
        StructField("docid", LongType(), False),
        StructField("word", StringType(), False),
        StructField("wordpos", IntegerType(), False),
    ]
)


def _tokens_native(text: Column) -> Column:
    """Lower + trim separators + split, equivalent to the default
    charset_table on ASCII text."""
    toks = F.split(
        F.regexp_replace(F.lower(text), f"^{_ASCII_SEP_RE}|{_ASCII_SEP_RE}$", ""),
        _ASCII_SEP_RE,
    )
    return F.when(text.isNull() | (F.trim(text) == ""), F.array()).otherwise(toks)


def _field_hits_native(docid: Column, toks: Column, field_id: int) -> "Column":
    """Array of hit structs for one field over a MATERIALIZED token
    array attribute.

    Position arithmetic parity: first token at pos 1, +1 per token
    (src/sphinx.cpp:18677-18682 with default steps and min_word_len=1);
    every hit at the last position gets HIT_FIELD_END
    (src/sphinx.cpp:18666-18672).

    `toks` must be a plain column attribute, not the split expression:
    F.size(toks) is referenced inside the per-element lambda, and
    Catalyst does not hoist common subexpressions out of lambda
    functions — an inline split would re-run per token, turning
    tokenization O(tokens^2) per document.
    """
    n = F.size(toks)
    base = F.lit(field_id << 24)
    return F.filter(
        F.transform(
            toks,
            lambda w, i: F.struct(
                docid.alias("docid"),
                w.alias("word"),
                (
                    base
                    + (i + 1)
                    + F.when(i == n - 1, F.lit(HIT_FIELD_END)).otherwise(F.lit(0))
                ).cast("int").alias("wordpos"),
            ),
        ),
        lambda s: s["word"] != "",
    )


_EMPTY_STR_ARRAY = "array<string>"


def _star_entries(word: Column, minp: int, mini: int) -> Column:
    """Array of all star-index dictionary entries for one token
    (index-time prefix/infix expansion, src/sphinx.cpp:18534-18663).
    Namespaces are UNIFIED with the plain-word space exactly as the
    reference CRCs them (see Tokenizer.hits_for_doc):

      "^*w$"  full word, both magic markers — always emitted
      "s"     bare substring/prefix expansions (shared namespace)
      "^*s"   word-start anchored   (infix mode only)
      "s$"    word-end anchored     (infix mode only)

    Words shorter than the min length emit just the markers entry +
    the bare word (src/sphinx.cpp:18595-18607).  The native path has
    no morphology, so stem==raw and no separate stem entry exists.
    sequence() bounds are clamped then filtered so Spark never sees a
    descending sequence(start > stop)."""
    n = F.length(word)
    markers = F.array(F.concat(F.lit("^*"), word, F.lit("$")))
    minlen = minp or mini
    if minp:
        lens = F.filter(
            F.sequence(F.lit(minp), F.greatest(n, F.lit(minp))),
            lambda ln: ln <= n,
        )
        exp = F.transform(lens, lambda ln: word.substr(F.lit(1), ln))
    else:
        starts = F.filter(
            F.sequence(F.lit(1), F.greatest(n - mini + 1, F.lit(1))),
            lambda i: i <= n - mini + 1,
        )
        empty = F.array().cast(_EMPTY_STR_ARRAY)
        exp = F.flatten(
            F.transform(
                starts,
                lambda i: F.flatten(
                    F.transform(
                        F.filter(
                            F.sequence(F.lit(mini), F.greatest(n, F.lit(mini))),
                            lambda ln: i + ln - 1 <= n,
                        ),
                        lambda ln: F.concat(
                            F.array(word.substr(i, ln)),
                            F.when(
                                i == 1,
                                F.array(
                                    F.concat(F.lit("^*"), word.substr(i, ln))
                                ),
                            ).otherwise(empty),
                            F.when(
                                i + ln - 1 == n,
                                F.array(
                                    F.concat(word.substr(i, ln), F.lit("$"))
                                ),
                            ).otherwise(empty),
                        ),
                    )
                ),
            )
        )
    return F.concat(
        markers,
        F.when(n < minlen, F.array(word)).otherwise(exp),
    )


def build_hits_native(
    df: DataFrame,
    docid_col: str,
    fields: list[str],
    min_prefix_len: int = 0,
    min_infix_len: int = 0,
    wordpart: str | None = None,
) -> DataFrame:
    """Catalyst-only hit extraction for ASCII text fields.

    Token arrays are projected first so each field's split runs once
    per row; the multi-reference non-cheap aliases keep CollapseProject
    from inlining them back into the hit-struct lambdas."""
    proj = df.select(
        F.col(docid_col).cast("long").alias("_docid"),
        *[
            _tokens_native(F.col(f)).alias(f"_toks{fid}")
            for fid, f in enumerate(fields)
        ],
    )
    arrays = [
        _field_hits_native(F.col("_docid"), F.col(f"_toks{fid}"), fid)
        for fid in range(len(fields))
    ]
    allhits = F.concat(*arrays) if len(arrays) > 1 else arrays[0]
    hits = (
        proj.select(F.explode(allhits).alias("h"))
        .select("h.docid", "h.word", "h.wordpos")
    )
    if min_prefix_len or min_infix_len:
        # second narrow explode (same codegen stage, no shuffle): each
        # hit fans out into its star-index dictionary entries at the
        # same packed position.  wordpart="whole" on a star index
        # still emits the markers entry + plain word
        # (bGlobalPartialMatch, src/sphinx.cpp:18685-18700).
        w = F.col("word")
        if wordpart == "whole":
            entries = F.array(F.concat(F.lit("^*"), w, F.lit("$")), w)
        else:
            entries = _star_entries(w, min_prefix_len, min_infix_len)
        hits = hits.select(
            "docid",
            F.explode(entries).alias("word"),
            "wordpos",
        )
    return hits


def build_hits_fused(
    docs: DataFrame,
    docid_col: str,
    html_col: str,
    settings: TokenizerSettings,
    remove_elements: str = "script, style",
    index_attrs: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Fused strip+tokenize: html binary -> hits in ONE Arrow stage.

    The production path for the web-pages pipeline: docids are
    computed JVM-side (xxhash64 column) before the UDF, the UDF input
    is just (docid, html), and stripping + tokenization + position
    packing happen in a single Python crossing — half the Arrow
    serialization of the chained strip->tokenize plan.  Output feeds
    the postings sort-shuffle directly; no intermediate text column is
    materialized (at 100TB that column never exists on disk)."""
    proj = docs.select(F.col(docid_col).alias("docid"), F.col(html_col).alias("html"))
    attrs_cfg = index_attrs if index_attrs is not None else {"img": ["alt"]}
    cfg = (remove_elements, tuple(sorted((k, tuple(v)) for k, v in attrs_cfg.items())))

    def gen(batches):
        import pandas as pd

        from sphinx_1_spark.functions.stripper import HtmlStripper
        from sphinx_1_spark.functions.tokenizer import Tokenizer

        stripper = HtmlStripper(cfg[0], {k: list(v) for k, v in cfg[1]})
        tok = Tokenizer(settings)
        for pdf in batches:
            docids: list[int] = []
            words: list[str] = []
            poss: list[int] = []
            for did, html in zip(pdf["docid"], pdf["html"]):
                if html is None:
                    continue
                text = stripper.strip(bytes(html)).decode("utf-8", "replace")
                hits = tok.hits_for_doc([text])
                if hits:
                    did = int(did)
                    docids.extend([did] * len(hits))
                    words.extend(h[0] for h in hits)
                    poss.extend(h[1] for h in hits)
            yield pd.DataFrame(
                {
                    "docid": pd.Series(docids, dtype="int64"),
                    "word": pd.Series(words, dtype="object"),
                    "wordpos": pd.Series(poss, dtype="int32"),
                }
            )

    return proj.mapInPandas(gen, schema=HITS_SCHEMA)


RUNS_SCHEMA = StructType(
    [
        StructField("word", StringType(), False),
        StructField("grp", IntegerType(), False),
        StructField("n", IntegerType(), False),
        StructField("docids", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField("fieldmasks", BinaryType(), False),
        StructField("positions", BinaryType(), False),
    ]
)


def _binary_from_slices(values: "np.ndarray", item_starts: "np.ndarray", total_items: int):
    """Zero-copy pa.BinaryArray over CONSECUTIVE slices of one numpy
    buffer: run k spans items [item_starts[k], item_starts[k+1]) with
    the final run ending at total_items.  No per-run Python bytes
    objects — the Arrow offsets vector IS the slicing (the map-side
    combine emits ~one run per unique word per batch; at 10k-doc
    Arrow batches the per-frame value buffer is far below the int32
    offset limit, and reduce frames are bounded by the (word, grp)
    key spread)."""
    import pyarrow as pa

    isz = values.dtype.itemsize
    total_bytes = total_items * isz
    if total_bytes > 0x7FFFFFF0:
        # pa.binary() carries int32 offsets; a silent wrap would emit
        # corrupt runs. Map-side frames are one Arrow batch (~10k
        # docs), so hitting this means maxRecordsPerBatch was raised
        # past what a 2 GB value buffer can hold.
        raise ValueError(
            f"runs frame value buffer {total_bytes} B exceeds the "
            "int32 Arrow binary offset limit; lower "
            "spark.sql.execution.arrow.maxRecordsPerBatch"
        )
    offsets = np.empty(item_starts.size + 1, dtype=np.int32)
    np.multiply(item_starts, isz, out=offsets[:-1], casting="unsafe")
    offsets[-1] = total_bytes
    return pa.Array.from_buffers(
        pa.binary(),
        item_starts.size,
        [None, pa.py_buffer(offsets), pa.py_buffer(np.ascontiguousarray(values))],
    )


def build_runs_fused(
    docs: DataFrame,
    docid_col: str,
    html_col: str,
    settings: TokenizerSettings,
    remove_elements: str = "script, style",
    index_attrs: dict[str, list[str]] | None = None,
    n_groups: int = 1,
) -> DataFrame:
    """Fused strip+tokenize with MAP-SIDE RUN COMBINE: html -> one row
    per (Arrow batch, word) carrying that word's docid-sorted entries
    as packed numpy buffers (docids int64[n], tfs int32[n],
    fieldmasks int64[n], positions int32[sum tf] — raw little-endian,
    not VLB: the shuffle is transient and lz4-compressed, and
    frombuffer decodes for free on the reduce side).

    Why: Spark's per-row JVM<->Python crossing is the segment build's
    real wall — a NOOP mapInPandas over the 27M raw hit rows of a
    400k-doc corpus costs the same ~12 s as the full encode, while the
    numpy encode itself is <1 s of it.  Grouping hits into per-word
    runs BEFORE they leave Python cuts the crossing ~40x (one row per
    word per batch instead of one per occurrence).  This is also the
    reference's own build shape: sort hit chunks locally, spill sorted
    runs, merge (Build src/sphinx.cpp:9210) — here the "spill" is the
    runs shuffle and the k-way merge is encode_blocks_from_runs.

    `grp` spreads one word's runs over n_groups reduce keys —
    deterministic in (input partition id, batch ordinal), so a head
    term's 10^6 runs at web scale never funnel into a single reduce
    task; tail words fragment into at most n_groups extra blocks.
    Size it ~ n_input_partitions / 64 (each key then merges <=64
    runs).  Blocks are deterministic given the input split layout and
    n_groups (the resume/rebuild contract); across DIFFERENT layouts
    the decoded postings are identical while block cuts may differ —
    serving tolerates arbitrary run fragmentation by design."""
    proj = docs.select(
        F.col(docid_col).alias("docid"),
        F.col(html_col).alias("html"),
        F.spark_partition_id().alias("_pid"),
    )
    attrs_cfg = index_attrs if index_attrs is not None else {"img": ["alt"]}
    cfg = (remove_elements, tuple(sorted((k, tuple(v)) for k, v in attrs_cfg.items())))
    n_groups = max(int(n_groups), 1)

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        from sphinx_1_spark.functions.stripper import HtmlStripper
        from sphinx_1_spark.functions.tokenizer import Tokenizer
        from sphinx_1_spark.operators.segments import (
            entries_from_sorted_hits,
        )

        stripper = HtmlStripper(cfg[0], {k: list(v) for k, v in cfg[1]})
        tok = Tokenizer(settings)
        use_batch = tok.fast_batch_path_ok
        batch_idx = 0
        for rb in batches:
            uw = None
            words: list[str] = []
            docid_np = rb.column(0).to_numpy(zero_copy_only=False)
            html_col = rb.column(1).to_pylist()
            if use_batch:
                # whole-batch vectorized path: ONE fold/run-detect
                # pass over the batch's concatenated text, identical
                # tokens grouped by a memcmp sort of fixed-width
                # codepoint keys — no per-token Python strings, no
                # object-array unique (hit-identical to the general
                # path below — fast_batch_path_ok contract)
                doc_l: list[int] = []
                texts: list[str] = []
                for did, html in zip(docid_np.tolist(), html_col):
                    if html is None:
                        continue
                    texts.append(
                        stripper.strip(html).decode("utf-8", "replace")
                    )
                    doc_l.append(did)
                mat, tlens, tcounts, p32 = tok.batch_token_arrays(texts)
                ntok = p32.size
                if ntok:
                    d = np.repeat(
                        np.asarray(doc_l, dtype=np.int64), tcounts
                    )
                    # group equal tokens: stable memcmp argsort of the
                    # void keys — within a word, hits stay in stream
                    # (doc-major, position-ascending) order, which is
                    # all entries_from_sorted_hits needs (the reduce
                    # re-sorts every key's entries by docid anyway)
                    voids = np.ascontiguousarray(mat).view(
                        f"V{mat.shape[1] * 4}"
                    ).ravel()
                    order = np.argsort(voids, kind="stable")
                    vs = voids[order]
                    wchg = np.concatenate(([True], vs[1:] != vs[:-1]))
                    ds = d[order]
                    ps32 = p32[order]
            else:
                docids: list[int] = []
                poss: list[int] = []
                for did, html in zip(docid_np.tolist(), html_col):
                    if html is None:
                        continue
                    text = stripper.strip(html).decode(
                        "utf-8", "replace"
                    )
                    hits = tok.hits_for_doc([text])
                    if hits:
                        did = int(did)
                        docids.extend([did] * len(hits))
                        words.extend(h[0] for h in hits)
                        poss.extend(h[1] for h in hits)
                ntok = len(words)
                if ntok:
                    d = np.asarray(docids, dtype=np.int64)
                    p = np.asarray(poss, dtype=np.int64)
                    # fixed-width numpy unicode, NOT object: np.unique
                    # then compares by memcmp instead of per-pair
                    # Python string calls (~5x on the mmseg build);
                    # stable argsort by word ordinal keeps hits in
                    # stream (doc-major, position-ascending) order
                    # within each word, which is all the entry math
                    # needs — same argument as the fast batch path
                    w = np.asarray(words)
                    uw, winv = np.unique(w, return_inverse=True)
                    order = np.argsort(winv, kind="stable")
                    wi = winv[order]
                    wchg = np.concatenate(([True], wi[1:] != wi[:-1]))
                    ds = d[order]
                    ps32 = p[order].astype(np.int32)
            if not ntok:
                batch_idx += 1
                continue
            grp = (int(rb.column(2)[0].as_py()) * 1000003 + batch_idx) % n_groups
            batch_idx += 1

            # entry = (word, docid); run = word — boundary math shared
            # with the reduce-side encoder (one definition, no drift)
            estarts, etf, edoc, efm, e_new_word = entries_from_sorted_hits(
                wchg, ds, ps32.astype(np.int64)
            )
            rstarts_e = np.flatnonzero(e_new_word)  # entry idx per run
            rends_e = np.concatenate((rstarts_e[1:], [estarts.size]))
            rstarts_h = estarts[rstarts_e]  # hit idx per run
            rends_h = np.concatenate((rstarts_h[1:], [ds.size]))

            if uw is None:
                # batch path: one word string per RUN (== unique word)
                run_words = tok.decode_token_rows(
                    mat, tlens, order[rstarts_h]
                )
            else:
                run_words = uw[wi[rstarts_h]].tolist()
            n_entries = estarts.size
            # Arrow-native frame: every binary column is ONE numpy
            # buffer + an offsets vector (no per-run bytes objects,
            # no pandas->Arrow object-column conversion)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(run_words, type=pa.string()),
                    pa.array(
                        np.full(rstarts_e.size, grp, dtype=np.int32)
                    ),
                    pa.array((rends_e - rstarts_e).astype(np.int32)),
                    _binary_from_slices(edoc, rstarts_e, n_entries),
                    _binary_from_slices(
                        etf.astype(np.int32), rstarts_e, n_entries
                    ),
                    _binary_from_slices(efm, rstarts_e, n_entries),
                    _binary_from_slices(ps32, rstarts_h, ds.size),
                ],
                names=[
                    "word", "grp", "n",
                    "docids", "tfs", "fieldmasks", "positions",
                ],
            )

    return proj.mapInArrow(gen, schema=RUNS_SCHEMA)


def build_hits_arrow(
    df: DataFrame,
    docid_col: str,
    fields: list[str],
    settings: TokenizerSettings,
    wordparts: list[str] | None = None,
) -> DataFrame:
    """Full-fidelity hit extraction via Arrow-batched mapInPandas."""
    cols = [docid_col] + fields
    proj = df.select(*cols)

    def gen(batches):
        # tokenizer built once per task; fold table lru-cached per process
        from sphinx_1_spark.functions.tokenizer import Tokenizer
        import pandas as pd

        tok = Tokenizer(settings)
        for pdf in batches:
            docids: list[int] = []
            words: list[str] = []
            poss: list[int] = []
            id_arr = pdf[docid_col].values
            field_arrs = [pdf[f].values for f in fields]
            for i in range(len(pdf)):
                did = int(id_arr[i])
                row_fields = [
                    (field_arrs[j][i] if field_arrs[j][i] is not None else "")
                    for j in range(len(fields))
                ]
                for w, wp in tok.hits_for_doc(row_fields, wordparts):
                    docids.append(did)
                    words.append(w)
                    poss.append(wp)
            yield pd.DataFrame(
                {"docid": pd.Series(docids, dtype="int64"),
                 "word": pd.Series(words, dtype="object"),
                 "wordpos": pd.Series(poss, dtype="int32")}
            )

    return proj.mapInPandas(gen, schema=HITS_SCHEMA)
