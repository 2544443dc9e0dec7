"""Deterministic synthetic Common-Crawl-style pages corpus.

Input-table shape per BASELINE.json input_hint:
    (url: string, warc_ts: timestamp, html: binary, text: string,
     lang: string)

`text` is empty at generation time — producing it (byte-identical
HTML strip) is the engine's job.  Generation is fully deterministic
per row id (seeded per-id RNG), so any partitioning of `spark.range`
yields the same corpus: the generator is embarrassingly parallel and
scales linearly with executors (the 10^12-row path is the same code
over a bigger range).

Content model (FIXTURES.md §1):
  - Zipf-ish vocabulary of English stems; a deliberate head term
    ("the") in ~60% of docs to exercise head-term skew salting;
  - ~1/3 rows carry CJK runs (codepoints in U+4E00..U+9FBF),
    concatenated without spaces to exercise segmentation;
  - two fields via <title> and <body> (field ids 0/1);
  - HTML exercises the stripper branch space: comments, PIs,
    entities (named/numeric/unknown), inline/unknown tags,
    script/style removable elements, img alt= extractable attrs,
    malformed markup;
  - duplicate body text occurs (docid-asc tie-break tests);
    some docs have empty bodies.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

VOCAB_SIZE = 5000
HEAD_TERM = "the"
EPOCH = datetime(2020, 1, 1, tzinfo=timezone.utc)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

_LANG_CYCLE = ("en", "en", "zh", "en", "zh-mix", "en")

_ENTITY_SNIPPETS = (
    "&amp;", "&lt;", "&gt;", "&nbsp;", "&auml;", "&copy;", "&foo;", "&#228;", "&#8364;",
)
_NOISE_TAGS = (
    "<!-- hidden comment -->", "<?php noop(); ?>", "<br>", "<hr/>",
    '<a href="/x?a=1&amp;b=2">', "</a>", "<em>", "</em>", "<span class='k'>",
    "</span>", "<div>", "</div>", "<p>", "</p>",
)


def _word(rng: random.Random) -> str:
    """Zipf-ish rank sample over a synthetic stem vocabulary."""
    # inverse-CDF-ish: rank ~ floor(u^alpha * V) biases to low ranks
    r = int((rng.random() ** 2.2) * VOCAB_SIZE)
    return f"w{r:04d}"


def _cjk_run(rng: random.Random, nwords: int) -> str:
    """Concatenated CJK 'words' (1-3 chars each) without separators."""
    out = []
    for _ in range(nwords):
        ln = rng.choice((1, 2, 2, 3))
        out.append("".join(chr(0x4E00 + rng.randrange(0x200)) for _ in range(ln)))
    return "".join(out)


def _body_text(rng: random.Random, lang: str) -> str:
    n = rng.randint(0, 120)
    parts = []
    if rng.random() < 0.6:
        parts.append(HEAD_TERM)
    for _ in range(n):
        parts.append(_word(rng))
        if rng.random() < 0.05:
            parts.append(HEAD_TERM)
    text = " ".join(parts)
    if lang in ("zh", "zh-mix"):
        chunks = [text] if lang == "zh-mix" else []
        chunks.append(_cjk_run(rng, rng.randint(3, 40)))
        text = " ".join(chunks)
    return text


def _html_for(i: int, seed: int) -> tuple[str, str]:
    rng = random.Random((seed << 32) ^ i)
    lang = _LANG_CYCLE[i % len(_LANG_CYCLE)]
    title = " ".join(_word(rng) for _ in range(rng.randint(1, 6)))
    body = _body_text(rng, lang)
    if rng.random() < 0.02:
        body = ""  # empty-body docs
    if rng.random() < 0.05:
        # force duplicate body text across docs (ties -> docid asc)
        dup_rng = random.Random((seed << 32) ^ 0xD0B)
        body = _body_text(dup_rng, "en")

    pieces = [f"<html><head><title>{title}</title>"]
    if rng.random() < 0.4:
        pieces.append("<style>body { color: red; }</style>")
    pieces.append("</head><body>")
    if rng.random() < 0.4:
        pieces.append('<script type="text/javascript">var hidden = "gone";</script>')
    words = body.split(" ") if body else []
    out = []
    for w in words:
        out.append(w)
        roll = rng.random()
        if roll < 0.06:
            out.append(rng.choice(_NOISE_TAGS))
        elif roll < 0.09:
            out.append(rng.choice(_ENTITY_SNIPPETS))
        elif roll < 0.10:
            out.append(f'<img src="p{i}.png" alt="{_word(rng)} {_word(rng)}">')
        elif roll < 0.105:
            out.append("<1tag </>")  # malformed passthrough
    pieces.append(" ".join(out))
    pieces.append("</body></html>")
    return "".join(pieces), lang


def write_mmseg_bench_dict(path: str, seed: int = 42) -> str:
    """Deterministic mkdict-format ("word\\tfreq") segmentation
    dictionary over the corpus's CJK char space (U+4E00..U+4FFF).

    Shaped like a real Chinese dict: every single char is a word (real
    dicts carry all common hanzi), plus 2-char and 3-char samples, so
    most positions have >=2 prefix matches and the MMSEG rule cascade
    actually runs — the benchmark exercises the same code paths a
    production dict would.
    """
    rng = random.Random(seed ^ 0xD1C7)
    base = 0x4E00
    lines: list[str] = []
    for c in range(0x200):
        lines.append(f"{chr(base + c)}\t{rng.randint(100, 500000)}")
    seen: set[str] = set()
    for _ in range(30000):
        w = "".join(chr(base + rng.randrange(0x200)) for _ in range(2))
        f = rng.randint(10, 100000)
        if w not in seen:
            seen.add(w)
            lines.append(f"{w}\t{f}")
    for _ in range(8000):
        w = "".join(chr(base + rng.randrange(0x200)) for _ in range(3))
        f = rng.randint(5, 20000)
        if w not in seen:
            seen.add(w)
            lines.append(f"{w}\t{f}")
    # temp + rename: the fixed shared path must never hold a torn
    # half-written dictionary (a concurrent bench or a kill mid-write
    # would otherwise silently change segmentation)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, path)
    return path


def _row_for(i: int, seed: int) -> tuple:
    """One deterministic corpus row (url, warc_ts, html, text, lang).

    warc_ts wraps i at 10^9 so the timestamp stays inside datetime's
    year-9999 range at ANY row id (137 * 10^9 s lands around year
    6360) — without the wrap, ids past ~1.8e9 overflow datetime and
    the '10^12-row path is the same code' claim would be false.  Ids
    below 10^9 (every shipped corpus) are unchanged by the mod, so
    existing goldens and bench corpora are byte-identical.
    """
    html, lang = _html_for(i, seed)
    return (
        f"http://site{i % 1000}.example/{lang}/doc{i}",
        EPOCH + timedelta(seconds=137 * (i % 1_000_000_000)),
        html.encode("utf-8"),
        "",
        lang,
    )


def generate_pages(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic pages table (url, warc_ts, html, text, lang)."""
    rng_free = spark.range(n_docs, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = [_row_for(int(i), seed) for i in ids]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return rng_free.mapInPandas(gen, PAGES_SCHEMA)
