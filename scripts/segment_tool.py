#!/usr/bin/env python
"""Segment describe/dump/query utility — the `indextool` + `search`
CLI equivalent (src/indextool.cpp:19-157: header dump + dictionary
stats; src/search.cpp:41-441: the daemon-less query tool), re-expressed
over the parquet segment store.

Usage:
  python scripts/segment_tool.py describe <segment_dir ...>
  python scripts/segment_tool.py dictionary <segment_dir ...> [--top N]
  python scripts/segment_tool.py dumpdocids <segment_dir ...>
  python scripts/segment_tool.py dumphitlist <segment_dir ...> <keyword>
  python scripts/segment_tool.py search <segment_dir ...> [OPTIONS] <word ...>

search options (src/search.cpp:46-68):
  -a|--any  -b|--boolean  -p|--phrase  -e|--ext  -e2|--ext2   match mode
  -f|--filter <attr> <v>     only match if attr == v (like the
                             reference, each -f RESETS the list — only
                             the last -f is in effect, search.cpp:124)
  -s|--sortby <CLAUSE>       sort_extended clause
  -S|--sortexpr <EXPR>       sort_expr, EXPR DESC
  --sort=date | --rsort=date sort by the first timestamp attr
  --sort=ts                  time-segments sort on that attr
  -g|--group <attr>          group by attr    -gs|--groupsort <expr>
  -o|--offset N  -l|--limit N  (defaults 0 / 20)
  --stdin                    read the query from stdin
  -c|--config <sphinx.conf>  query-side tokenizer settings from the
                             config's index section (search.cpp:80)
  -i|--index <NAME>          which index section inside -c (defaults
                             to the first one)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from sphinx_1_spark.session import get_spark

    # cores=None honors SPARK_GRAFT_CPUS / cpu_count like every other
    # entry point (a hardcoded 8 underuses the bench box and
    # oversubscribes small ones)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def describe(paths: list[str]) -> None:
    """Header dump (CSphIndex_VLN::LoadHeader analog): manifest
    settings, stats, and lineage/metrics per segment."""
    from sphinx_1_spark.plans.segment_index import read_manifest

    for p in paths:
        m = read_manifest(p)
        print(f"segment: {p}")
        for key in sorted(m):
            val = m[key]
            if isinstance(val, (dict, list)):
                val = json.dumps(val, sort_keys=True)
            print(f"  {key}: {val}")


def dictionary(paths: list[str], top: int) -> None:
    """Top-df dictionary entries across segments (indextool --dumpdict
    analog)."""
    from pyspark.sql import functions as F

    from sphinx_1_spark.plans.segment_index import SegmentSet

    spark = _spark()
    ss = SegmentSet(spark, paths)
    # ss.dictionary is the ONE merged-dictionary definition (already
    # summed per (wordid, word) across segments) — don't re-derive it
    d = (
        ss.dictionary.groupBy("word")
        .agg(F.sum("docs").alias("docs"), F.sum("hits").alias("hits"))
        .orderBy(F.col("docs").desc(), F.col("word").asc())
        .limit(top)
    )
    for r in d.collect():
        print(f"{r['word']}\t{r['docs']}\t{r['hits']}")


def dumpdocids(paths: list[str]) -> int:
    """indextool --dumpdocids (indextool.cpp:67 → DebugDumpDocids,
    src/sphinx.cpp:15209-15231): a three-line docinfo header, then one
    `N. id=<docid>` line per docinfo row in docid order.

    The reference reads fixed-stride DWORD rows off the mmapped .spa;
    our docinfo is columnar parquet, so the header's analogs are the
    on-disk parquet byte size and the column count.  Rows stream to
    the driver via toLocalIterator — one partition in flight, never
    the whole corpus (the reference's loop is likewise a single scan)."""
    from sphinx_1_spark.plans.segment_index import SegmentSet

    spark = _spark()
    ss = SegmentSet(spark, paths)
    nbytes = 0
    for p in paths:
        d = os.path.join(p, "docinfo")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                nbytes += os.path.getsize(os.path.join(d, f))
    print(f"docinfo-bytes: {nbytes}")
    print(f"docinfo-stride: {len(ss.docinfo.columns)}")
    print(f"docinfo-rows: {ss.n_docs}")
    n = 0
    for r in ss.docinfo.select("docid").sort("docid").toLocalIterator():
        n += 1
        print(f"{n}. id={r['docid']}")
    return 0


def dumphitlist(paths: list[str], keyword: str, settings=None) -> int:
    """indextool --dumphitlist (indextool.cpp:70 → DebugDumpHitlist,
    src/sphinx.cpp:15233-15288): tokenize the keyword through the
    index tokenizer, resolve its wordid through the dictionary, then
    print every hit as `doc=<docid>, hit=0x%08x` — including, per doc,
    the terminating `hit=0x00000000` entry (the reference's do/while
    prints the sentinel GetHitlistEntry before breaking).

    Hits print in (docid, packed-hitpos) order — the .spd/.spp stream
    order.  The decode touches only the keyword's blocks (wordid
    pushdown onto the wordid-sorted parquet) and streams them through
    toLocalIterator, so the tool is usable on a web-scale store.
    Error texts mirror sphDie's: `FATAL: keyword=.., no token (too
    short?)` / `no wordid (stopped?)`."""
    from pyspark.sql import functions as F

    from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings
    from sphinx_1_spark.functions.wordid import crc32_word
    from sphinx_1_spark.operators.segments import decode_blocks
    from sphinx_1_spark.plans.segment_index import SegmentSet

    settings = settings or TokenizerSettings(ngram_chars="U+4E00..U+9FBF")
    stream = Tokenizer(settings).tokenize_with_raw(keyword)
    if not stream:
        print(f"FATAL: keyword={keyword}, no token (too short?)")
        return 1
    # the reference prints the raw GetToken output; the wordid is the
    # dict's (normalized = wordforms/morphology applied, None for a
    # stopword — GetWordID returning 0, src/sphinx.cpp:17023-17027)
    norm, raw = stream[0]
    if norm is None:
        print(f"FATAL: keyword={keyword}, tok={raw}, no wordid (stopped?)")
        return 1

    spark = _spark()
    ss = SegmentSet(spark, paths)
    hit = ss.dictionary.filter(F.col("word") == norm).select("wordid").collect()
    # absent words still print the header with the dict-computed id
    # (crc32, the segment build's GetWordID) and dump nothing — the
    # reference only dies when the wordlist *setup* fails, not when
    # the doclist is empty
    wordid = int(hit[0]["wordid"]) if hit else crc32_word(norm)
    print(f"keyword={keyword}, tok={raw}, wordid={wordid}")

    decoded = decode_blocks(
        ss.blocks.filter(F.col("wordid") == wordid),
        with_positions=ss.with_positions,
    ).sort("docid")
    for r in decoded.toLocalIterator():
        doc = r["docid"]
        if ss.with_positions:
            for pos in r["positions"]:
                print(f"doc={doc}, hit=0x{pos & 0xFFFFFFFF:08x}")
        # the zero sentinel the reference's do/while emits per doc
        print(f"doc={doc}, hit=0x00000000")
    return 0


def search(paths: list[str], opts: list[str]) -> int:
    """The `search` CLI (src/search.cpp:41-441): run one query against
    the segment store and print matches in the reference's format —
    `N. document=<id>, weight=<w>, attr=<v>...` then per-word stats.
    Options parse like the reference's hand-rolled loop: non-option
    args concatenate into the query string (search.cpp:135-141)."""
    import time as _time

    from pyspark.sql import functions as F

    from sphinx_1_spark.functions.tokenizer import TokenizerSettings
    from sphinx_1_spark.plans.api import ApiQuery, ApiQueryError, api_query
    from sphinx_1_spark.plans.segment_index import SegmentSet

    def _atoi(s: str) -> int:
        """C atoi/strtoul semantics (search.cpp:112-124): parse the
        leading [sign+]digits, 0 on junk — never a traceback."""
        import re as _re

        m = _re.match(r"\s*([+-]?\d+)", s)
        return int(m.group(1)) if m else 0

    mode = "all"
    sortmode, sortby = "relevance", ""
    want_date_sort = None  # None | "attr_desc" | "attr_asc" | "time_segments"
    groupattr = None
    groupsort = "@group desc"
    offset, limit = 0, 20
    filt: tuple[str, int] | None = None
    use_stdin = False
    config_path: str | None = None  # -c (search.cpp:80): sphinx.conf
    index_name: str | None = None  # -i: index section inside -c
    words: list[str] = []

    i = 0
    while i < len(opts):
        a = opts[i]
        if a in ("-a", "--any"):
            mode = "any"
        elif a in ("-b", "--boolean"):
            mode = "boolean"
        elif a in ("-p", "--phrase"):
            mode = "phrase"
        elif a in ("-e", "--ext"):
            mode = "extended"
        elif a in ("-e2", "--ext2"):
            mode = "extended2"
        elif a == "--sort=date":
            want_date_sort = "attr_desc"
        elif a == "--rsort=date":
            want_date_sort = "attr_asc"
        elif a == "--sort=ts":
            want_date_sort = "time_segments"
        elif a == "--stdin":
            use_stdin = True
        elif a in ("-c", "--config") and i + 1 < len(opts):
            config_path = opts[i + 1]
            i += 1
        elif a in ("-i", "--index") and i + 1 < len(opts):
            index_name = opts[i + 1]
            i += 1
        elif a in ("-o", "--offset", "-l", "--limit", "-s", "--sortby",
                   "-S", "--sortexpr", "-g", "--group", "-gs", "--groupsort"):
            if i + 1 >= len(opts):
                print(f"ERROR: malformed or unknown option near '{a}'.")
                return 1
            v = opts[i + 1]
            i += 1
            if a in ("-o", "--offset"):
                offset = max(_atoi(v), 0)
            elif a in ("-l", "--limit"):
                limit = max(_atoi(v), 0)
            elif a in ("-s", "--sortby"):
                sortmode, sortby = "extended", v
            elif a in ("-S", "--sortexpr"):
                sortmode, sortby = "expr", v
            elif a in ("-g", "--group"):
                groupattr = v
            else:
                groupsort = v
        elif a in ("-f", "--filter"):
            if i + 2 >= len(opts):
                print(f"ERROR: malformed or unknown option near '{a}'.")
                return 1
            # reference quirk kept: m_dFilters.Reset() per -f
            # (search.cpp:124) — only the LAST -f survives
            filt = (opts[i + 1], _atoi(opts[i + 2]))
            i += 2
        elif a.startswith("-"):
            print(f"ERROR: malformed or unknown option near '{a}'.")
            return 1
        else:
            words.append(a)
        i += 1

    query = " ".join(words) + (" " if words else "")
    if use_stdin:
        query = sys.stdin.read()

    # -c sphinx.conf: query-side tokenizer settings come from the
    # named index section (the reference binds the config's tokenizer
    # to the loaded index, search.cpp via sphFixupIndexSettings);
    # without -c, the build job's default CJK settings apply
    tok_settings = TokenizerSettings(ngram_chars="U+4E00..U+9FBF")
    if config_path is not None:
        from sphinx_1_spark.sources.config import (
            ConfigError,
            index_config,
            parse_config,
        )

        try:
            conf = parse_config(config_path)
            name = index_name or next(
                iter(conf.sections.get("index", {})), None
            )
            if name is None:
                raise ConfigError(
                    f"no indexes found in config file '{config_path}'"
                )
            tok_settings = index_config(conf, name).tokenizer
        except (ConfigError, OSError) as e:
            print(f"FATAL: {e}")
            return 1

    spark = _spark()
    ss = SegmentSet(spark, paths)
    idx = ss.sphinx_index(tok_settings, with_attrs=True)

    if want_date_sort is not None:
        # "lookup first timestamp if needed" (search.cpp:286-301):
        # first timestamp-typed attr; none -> relevance + warning
        ts_attr = next(
            (
                f.name
                for f in idx.docinfo.schema.fields
                if f.dataType.simpleString() == "timestamp"
            ),
            None,
        )
        if ts_attr is None:
            print("no timestamp attributes found, sorting by relevance.")
        else:
            sortmode, sortby = (
                ("time_segments", ts_attr)
                if want_date_sort == "time_segments"
                else (want_date_sort, ts_attr)
            )

    if groupattr is not None:
        # the reference's group sorter only takes numeric attr keys
        # (CSphGrouperAttr reads an integer locator,
        # src/sphinxsort.cpp:239); a string attr would group by
        # CAST(NULL) — reject like FindGroupByAttr's setup error
        gt = dict(idx.docinfo.dtypes).get(groupattr)
        if gt is None or gt == "string":
            print(
                f"index 'segments': search error: group-by attribute "
                f"'{groupattr}' not found or invalid type."
            )
            return 1

    filters = None
    if filt is not None:
        attr, val = filt
        dtypes = dict(idx.docinfo.dtypes)
        if attr not in dtypes:
            print(f"search error: no such filter attribute '{attr}'.")
            return 1
        col = F.col(attr)
        # the reference's -f parses an unsigned int (strtoul); attrs
        # here may be string/timestamp — compare in the column's own
        # domain (timestamp via epoch seconds)
        cond = (
            col.cast("long") == val
            if dtypes[attr].startswith("timestamp")
            else col == (str(val) if dtypes[attr] == "string" else val)
        )
        filters = [cond]

    q = ApiQuery(
        query=query.strip(),
        mode=mode,
        sortmode=sortmode,
        sortby=sortby,
        groupattr=groupattr,
        groupsort=groupsort,
        filters=filters,
        offset=offset,
        limit=limit,
        max_matches=max(1000, offset + limit),
    )
    t0 = _time.perf_counter()
    try:
        rows, meta = api_query([("segments", idx, None)], q)
    except ApiQueryError as e:
        print(f"index 'segments': search error: {e}.")
        return 1
    ms = int((_time.perf_counter() - t0) * 1000)
    print(
        f"index 'segments': query '{query}': returned {len(rows)} matches "
        f"of {meta['total_found']} total in {ms // 1000}.{ms % 1000:03d} sec"
    )
    if rows:
        print("\ndisplaying matches:")
        attr_names = [k for k in rows[0].asDict() if k not in ("docid", "weight")]
        for n, r in enumerate(rows, 1 + offset):
            d = r.asDict()
            extras = "".join(f", {k}={d[k]}" for k in attr_names)
            print(f"{n}. document={d['docid']}, weight={d['weight']}{extras}")
    print("\nwords:")
    for n, (w, st) in enumerate(meta["words"].items(), 1):
        print(f"{n}. '{w}': {st['docs']} documents, {st['hits']} hits")
    return 0


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 1
    cmd = argv[1]
    top = 50
    args = []
    it = iter(argv[2:])
    for a in it:
        if a == "--top":
            operand = next(it, None)
            if operand is None or not operand.isdigit():
                print("usage: --top N (positive integer)")
                return 1
            top = int(operand)
        else:
            args.append(a)
    if cmd == "describe":
        describe(args)
    elif cmd == "dictionary":
        dictionary(args, top)
    elif cmd == "dumpdocids":
        return dumpdocids(args)
    elif cmd == "dumphitlist":
        # last arg is the keyword, everything before it segment dirs
        # (indextool takes <INDEXNAME> <KEYWORD>, indextool.cpp:70)
        if len(args) < 2:
            print("usage: dumphitlist <segment_dir ...> <keyword>")
            return 1
        return dumphitlist(args[:-1], args[-1])
    elif cmd == "search":
        # leading args that are segment dirs, then options + query
        # words (the reference takes indexes from sphinx.conf; the
        # segment store paths play that role here)
        raw = argv[2:]
        paths = []
        while raw and os.path.isdir(raw[0]):
            paths.append(raw.pop(0))
        if not paths:
            print("usage: search <segment_dir ...> [OPTIONS] <word ...>")
            return 1
        return search(paths, raw)
    else:
        print(f"unknown command {cmd!r}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
