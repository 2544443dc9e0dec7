"""sphinx.conf parser + settings mapping — the reference's config
front end (CSphConfigParser, src/sphinxutils.cpp:256-741;
sphConfTokenizer/sphConfDictionary/sphConfIndex :744-825), so a user
can point this engine at the SAME config file their reference
deployment uses.

Grammar (ported from the character-level FSM, sphinxutils.cpp:476-741):

* plain sections ``indexer/searchd/search { ... }`` (name == type) and
  named sections ``source NAME { }`` / ``index NAME [: PARENT] { }``;
* inheritance copies the parent section and marks every inherited
  value "to be overridden": the FIRST re-assignment of an inherited
  key REPLACES the whole inherited list, later assignments chain
  multi-values again (AddKey, sphinxutils.cpp:298-329);
* ``#`` comments anywhere; ``\\`` at end of a value line continues it
  on the next line; ``\\#`` inside a value escapes the comment char;
* keys are validated against the reference's per-section key tables —
  an unknown key is a hard error ("unknown key name ..."), deprecated
  keys and re-assigned non-list keys produce the reference's
  warnings (the extra value is stored at the tail; scalar reads take
  the head, so it is ignored exactly like the warning says);
* a ``#!interpreter`` first line executes the interpreter with the
  config path and parses its stdout (TryToExec,
  sphinxutils.cpp:379-467) — config-as-script;
* identifier chars are sphIsAlpha = [0-9a-zA-Z_-]
  (src/sphinxutils.h:25); key tokens cap at 64 chars, lines at 8191
  ("token too long" / "line too long", L_TOKEN/L_BUFFER :493-494).

Settings mapping (``index_config``) mirrors sphConfTokenizer /
sphConfDictionary / sphConfIndex, including the quirks: the
phrase_boundary string only takes effect when phrase_boundary_step is
non-zero; overshort_step/stopword_step clamp into 0..1;
charset_type defaults to sbcs — which here raises the SURVEY-declared
N/A instead of silently mis-tokenizing (the byte-space charset
emulation covers SBCS goldens; real deployments on this engine are
utf-8).  chinese_dictionary selects the MMSEG tokenizer, else
ngram_chars the CJK n-gram one, else plain UTF-8
(sphinxutils.cpp:755).  stopword/wordforms/exceptions FILES are
loaded relative to the config file's directory; single-word wordform
lines become ``wordforms`` pairs and multi-word ones ``multiforms``
lines, the same split CSphDict::LoadWordforms makes.
"""

from __future__ import annotations

import re
import subprocess

L_TOKEN = 64
L_BUFFER = 8192

KEY_DEPRECATED = 1
KEY_LIST = 2

# the reference's per-section key tables (sphinxutils.cpp:112-254):
# {key: (flags, replacement-hint)}
KEYS_SOURCE = {
    "type": 0, "strip_html": KEY_DEPRECATED, "index_html_attrs": KEY_DEPRECATED,
    "sql_host": 0, "sql_user": 0, "sql_pass": 0, "sql_db": 0, "sql_port": 0,
    "sql_sock": 0, "mysql_connect_flags": 0, "mysql_ssl_key": 0,
    "mysql_ssl_cert": 0, "mysql_ssl_ca": 0, "mssql_winauth": 0,
    "mssql_unicode": 0, "sql_query_pre": KEY_LIST, "sql_query": 0,
    "sql_query_range": 0, "sql_range_step": 0, "sql_query_killlist": 0,
    "sql_attr_uint": KEY_LIST, "sql_attr_bool": KEY_LIST,
    "sql_attr_timestamp": KEY_LIST, "sql_attr_str2ordinal": KEY_LIST,
    "sql_attr_float": KEY_LIST, "sql_attr_bigint": KEY_LIST,
    "sql_attr_multi": KEY_LIST, "sql_query_post": KEY_LIST,
    "sql_query_post_index": KEY_LIST, "sql_ranged_throttle": 0,
    "sql_query_info": 0, "xmlpipe_command": 0, "xmlpipe_field": KEY_LIST,
    "xmlpipe_attr_uint": KEY_LIST, "xmlpipe_attr_timestamp": KEY_LIST,
    "xmlpipe_attr_str2ordinal": KEY_LIST, "xmlpipe_attr_bool": KEY_LIST,
    "xmlpipe_attr_float": KEY_LIST, "xmlpipe_attr_multi": KEY_LIST,
    "xmlpipe_fixup_utf8": 0,
    "sql_group_column": KEY_LIST | KEY_DEPRECATED,
    "sql_date_column": KEY_LIST | KEY_DEPRECATED,
    "sql_str2ordinal_column": KEY_LIST | KEY_DEPRECATED,
    "unpack_zlib": KEY_LIST, "unpack_mysqlcompress": KEY_LIST,
    "unpack_mysqlcompress_maxsize": 0, "odbc_dsn": 0,
}
KEYS_INDEX = {
    "source": KEY_LIST, "path": 0, "docinfo": 0, "mlock": 0, "morphology": 0,
    "stopwords": 0, "synonyms": KEY_DEPRECATED, "exceptions": 0,
    "wordforms": 0, "min_word_len": 0, "charset_type": 0,
    "chinese_dictionary": 0, "charset_table": 0, "ignore_chars": 0,
    "min_prefix_len": 0, "min_infix_len": 0, "prefix_fields": 0,
    "infix_fields": 0, "enable_star": 0, "ngram_len": 0, "ngram_chars": 0,
    "phrase_boundary": 0, "phrase_boundary_step": 0, "ondisk_dict": 0,
    "type": 0, "local": KEY_LIST, "agent": KEY_LIST,
    "agent_blackhole": KEY_LIST, "agent_connect_timeout": 0,
    "agent_query_timeout": 0, "html_strip": 0, "html_index_attrs": 0,
    "html_remove_elements": 0, "preopen": 0, "inplace_enable": 0,
    "inplace_hit_gap": 0, "inplace_docinfo_gap": 0,
    "inplace_reloc_factor": 0, "inplace_write_factor": 0,
    "index_exact_words": 0, "min_stemming_len": 0, "overshort_step": 0,
    "stopword_step": 0,
}
KEYS_INDEXER = {
    "mem_limit": 0, "max_iops": 0, "max_iosize": 0, "max_xmlpipe2_field": 0,
    "write_buffer": 0,
}
KEYS_SEARCHD = {
    "address": KEY_DEPRECATED, "port": 0, "listen": KEY_LIST, "log": 0,
    "query_log": 0, "read_timeout": 0, "client_timeout": 0,
    "max_children": 0, "pid_file": 0, "max_matches": 0, "seamless_rotate": 0,
    "preopen_indexes": 0, "unlink_old": 0, "ondisk_dict_default": 0,
    "attr_flush_period": 0, "max_packet_size": 0, "mva_updates_pool": 0,
    "crash_log_path": 0, "max_filters": 0, "max_filter_values": 0,
    "listen_backlog": 0, "read_buffer": 0, "read_unhinted": 0,
}
_DEPRECATED_HINT = {
    "strip_html": "html_strip (per-index)",
    "index_html_attrs": "html_index_attrs (per-index)",
    "sql_group_column": "sql_attr_uint",
    "sql_date_column": "sql_attr_timestamp",
    "sql_str2ordinal_column": "sql_attr_str2ordinal",
    "synonyms": "exceptions",
    "address": "listen",
}
_KEY_TABLES = {
    "source": KEYS_SOURCE,
    "index": KEYS_INDEX,
    "indexer": KEYS_INDEXER,
    "searchd": KEYS_SEARCHD,
    # the `search` plain section validates against... nothing in the
    # reference (no g_dKeysSearch table -> ValidateKey errors with
    # "unknown section type 'search'" on its FIRST key; empty
    # `search {}` parses fine).  Modeled with None.
    "search": None,
}

PLAIN_SECTIONS = ("indexer", "searchd", "search")
NAMED_SECTIONS = ("source", "index")


_CSPACE = " \t\n\v\f\r"  # C isspace(), not Python's Unicode one


def sph_is_alpha(c: str) -> bool:
    return c.isascii() and (c.isalnum() or c in "-_")


class ConfigError(ValueError):
    pass


class Section:
    """One config section: ordered multi-value keys + inheritance
    override tags (CSphConfigSection of tagged CSphVariant chains)."""

    def __init__(self):
        self.values: dict[str, list[str]] = {}
        self.tags: set[str] = set()

    def get_str(self, key: str, default: str = "") -> str:
        # scalar reads take the HEAD of the chain (CSphVariant)
        v = self.values.get(key)
        return v[0] if v else default

    def get_int(self, key: str, default: int = 0) -> int:
        v = self.values.get(key)
        if not v:
            return default
        m = re.match(r"\s*[+-]?\d+", v[0])
        return int(m.group(0)) if m else 0  # atoi semantics

    def get_list(self, key: str) -> list[str]:
        return list(self.values.get(key, []))

    def __contains__(self, key: str) -> bool:
        return key in self.values


class SphinxConfig:
    """{section_type: {section_name: Section}} + collected warnings."""

    def __init__(self):
        self.sections: dict[str, dict[str, Section]] = {}
        self.warnings: list[str] = []

    def __contains__(self, t: str) -> bool:
        return t in self.sections

    def __getitem__(self, t: str) -> dict[str, Section]:
        return self.sections[t]


class SphinxConfigParser:
    """Port of the CSphConfigParser FSM (sphinxutils.cpp:476-741)."""

    def __init__(self):
        self.conf = SphinxConfig()
        self._file = ""
        self._line = 0

    # -------------------------------------------------------- helpers
    def _err(self, msg: str, col: int) -> ConfigError:
        return ConfigError(
            f"{msg} in {self._file} line {self._line} col {col}."
        )

    def _add_section(self, stype: str, name: str, col: int):
        types = self.conf.sections.setdefault(stype, {})
        if name in types:
            raise self._err(
                f"section '{name}' (type='{stype}') already exists", col
            )
        types[name] = Section()
        return types[name]

    def _validate_key(self, key: str, sec: Section, stype: str, col: int):
        table = _KEY_TABLES.get(stype)
        if table is None:
            raise self._err(f"unknown section type '{stype}'", col)
        hit = next((k for k in table if k.lower() == key.lower()), None)
        if hit is None:
            raise self._err(f"unknown key name '{key}'", col)
        flags = table[hit]
        if flags & KEY_DEPRECATED:
            self.conf.warnings.append(
                f"WARNING: key '{key}' is deprecated in {self._file} line "
                f"{self._line}; use '{_DEPRECATED_HINT[hit]}' instead."
            )
        if not (flags & KEY_LIST):
            if key in sec.values and key not in sec.tags:
                self.conf.warnings.append(
                    f"WARNING: key '{key}' is not multi-value; value in "
                    f"{self._file} line {self._line} will be ignored."
                )

    @staticmethod
    def _add_key(sec: Section, key: str, value: str):
        value = value.strip(_CSPACE)  # the reference's trim() is C isspace
        if key in sec.values:
            if key in sec.tags:
                # first override of an inherited value replaces the
                # whole inherited chain (sphinxutils.cpp:305-311)
                sec.values[key] = [value]
                sec.tags.discard(key)
            else:
                sec.values[key].append(value)
        else:
            sec.values[key] = [value]

    # -------------------------------------------------------- parsing
    def parse(self, path: str, buffer: str | None = None) -> SphinxConfig:
        """Parse a config file (or an in-memory buffer standing in for
        it, like the TryToExec recursion does)."""
        if buffer is None:
            with open(path, "r") as f:
                text = f.read()
        else:
            text = buffer
        self._file = path
        self._line = 0

        # shebang: execute and parse stdout (sphinxutils.cpp:565-576)
        if buffer is None and text.startswith("#!"):
            first = text.split("\n", 1)[0][2:].strip()
            parts = first.split(None, 1)
            cmd = [parts[0]] + ([parts[1].strip()] if len(parts) > 1 else [])
            proc = subprocess.run(
                cmd + [path], capture_output=True, text=True
            )
            if proc.returncode:
                raise ConfigError(f"error executing '{parts[0]}'")
            return self.parse(path, buffer=proc.stdout)

        # fgets-style lines, keeping the terminator
        raw_lines = text.splitlines(keepends=True)

        # FSM state
        S_TOP, S_SKIP2NL, S_TOK, S_TYPE, S_SEC, S_CHR, S_VALUE, S_SECNAME, \
            S_SECBASE, S_KEY = range(10)
        state = S_TOP
        stack: list[int] = []
        token = ""
        value = ""
        ich = ""
        stype = ""
        sname = ""
        cur: Section | None = None

        def push(new):
            nonlocal state
            stack.append(state)
            state = new

        def pop():
            nonlocal state
            state = stack.pop()

        for raw in raw_lines:
            self._line += 1
            if len(raw.rstrip("\n")) >= L_BUFFER - 1:
                raise self._err("line too long", 1)
            line = raw if raw.endswith("\n") else raw + "\n"
            i = 0
            while i < len(line):
                p = line[i]
                col = i + 1
                if state == S_TOP:
                    if p in _CSPACE:
                        i += 1
                        continue
                    if p == "#":
                        push(S_SKIP2NL)
                        i += 1
                        continue
                    if not sph_is_alpha(p):
                        raise self._err("invalid token", col)
                    token = ""
                    push(S_TYPE)
                    push(S_TOK)
                    continue  # LOC_BACK: reprocess same char
                if state == S_SKIP2NL:
                    pop()
                    i = len(line)
                    continue
                if state == S_TOK:
                    if not token and not sph_is_alpha(p):
                        raise self._err(
                            "internal error (non-alpha in S_TOK pos 0)", col
                        )
                    if len(token) == L_TOKEN:
                        raise self._err("token too long", col)
                    if not sph_is_alpha(p):
                        pop()
                        continue  # LOC_BACK
                    token += p
                    i += 1
                    continue
                if state == S_TYPE:
                    if p in _CSPACE:
                        i += 1
                        continue
                    if p == "#":
                        push(S_SKIP2NL)
                        i += 1
                        continue
                    if not token:
                        raise self._err(
                            "internal error (empty token in S_TYPE)", col
                        )
                    low = token.lower()
                    if low in PLAIN_SECTIONS:
                        stype = sname = token
                        cur = self._add_section(token, token, col)
                        token = ""
                        pop()
                        push(S_SEC)
                        push(S_CHR)
                        ich = "{"
                        continue  # LOC_BACK
                    if low in NAMED_SECTIONS:
                        stype = token
                        token = ""
                        pop()
                        push(S_SECNAME)
                        continue  # LOC_BACK
                    raise self._err(
                        f"invalid section type '{token}'", col
                    )
                if state == S_CHR:
                    if p in _CSPACE:
                        i += 1
                        continue
                    if p == "#":
                        push(S_SKIP2NL)
                        i += 1
                        continue
                    if p != ich:
                        raise self._err(
                            f"expected '{ich}', got '{p}'", col
                        )
                    pop()
                    i += 1
                    continue
                if state == S_SEC:
                    if p in _CSPACE:
                        i += 1
                        continue
                    if p == "#":
                        push(S_SKIP2NL)
                        i += 1
                        continue
                    if p == "}":
                        pop()
                        i += 1
                        continue
                    if sph_is_alpha(p):
                        push(S_KEY)
                        push(S_TOK)
                        token = ""
                        value = ""
                        continue  # LOC_BACK
                    raise self._err(
                        f"section contents: expected token, got '{p}'", col
                    )
                if state == S_KEY:
                    self._validate_key(token, cur, stype, col)
                    pop()
                    push(S_VALUE)
                    push(S_CHR)
                    ich = "="
                    continue  # LOC_BACK
                if state == S_VALUE:
                    if p == "\n":
                        self._add_key(cur, token, value)
                        value = ""
                        pop()
                        i += 1
                        continue
                    if p == "#":
                        self._add_key(cur, token, value)
                        value = ""
                        pop()
                        push(S_SKIP2NL)
                        i += 1
                        continue
                    if p == "\\":
                        nxt = line[i + 1] if i + 1 < len(line) else ""
                        if nxt in ("\r", "\n"):
                            # continuation: swallow to end of line
                            push(S_SKIP2NL)
                            i += 1
                            continue
                        if nxt == "#":
                            # escaped comment char: emit the '#'
                            i += 1
                            p = "#"
                    if len(value) < 65535:
                        value += p
                    i += 1
                    continue
                if state == S_SECNAME:
                    if p in _CSPACE:
                        i += 1
                        continue
                    if not token and not sph_is_alpha(p):
                        raise self._err(
                            f"named section: expected name, got '{p}'", col
                        )
                    if not token:
                        push(S_TOK)
                        continue  # LOC_BACK (token already cleared)
                    sname = token
                    cur = self._add_section(stype, sname, col)
                    token = ""
                    if p == ":":
                        state = S_SECBASE
                        i += 1
                        continue
                    if p == "{":
                        state = S_SEC
                        i += 1
                        continue
                    raise self._err(
                        f"named section: expected ':' or '{{', got '{p}'",
                        col,
                    )
                if state == S_SECBASE:
                    if p in _CSPACE:
                        i += 1
                        continue
                    if not token and not sph_is_alpha(p):
                        raise self._err(
                            f"named section: expected parent name, got "
                            f"'{p}'",
                            col,
                        )
                    if not token:
                        push(S_TOK)
                        continue  # LOC_BACK
                    # copy the parent section, tag every value as
                    # "to be overridden" (sphinxutils.cpp:686-703)
                    parents = self.conf.sections.get(stype, {})
                    if token not in parents:
                        raise self._err(
                            f"inherited section '{sname}': parent doesn't "
                            f"exist (parent name='{token}', "
                            f"type='{stype}')",
                            col,
                        )
                    src = parents[token]
                    cur.values = {k: list(v) for k, v in src.values.items()}
                    cur.tags = set(cur.values)
                    token = ""
                    state = S_SEC
                    push(S_CHR)
                    ich = "{"
                    continue  # LOC_BACK
                raise AssertionError(f"unhandled state {state}")

        # the reference performs NO state check at EOF: an unclosed
        # section parses silently (the for(;;) just breaks on fgets
        # EOF, sphinxutils.cpp:536-708) — preserved.  One deliberate
        # deviation: a final `key = value` line with no trailing
        # newline is DROPPED by the reference (S_VALUE only commits on
        # '\n'); we normalize the last line with a newline so the key
        # is kept instead of silently lost.
        return self.conf


def parse_config(path: str) -> SphinxConfig:
    return SphinxConfigParser().parse(path)


# ----------------------------------------------------------------------
# settings mapping (sphConfTokenizer/sphConfDictionary/sphConfIndex)


class IndexConfig:
    """Resolved per-index build settings: `tokenizer` is a ready
    TokenizerSettings; the rest mirror CSphIndexSettings."""

    def __init__(self, tokenizer, html_strip, html_index_attrs,
                 html_remove_elements, docinfo, enable_star, path, sources):
        self.tokenizer = tokenizer
        self.html_strip = html_strip
        self.html_index_attrs = html_index_attrs
        self.html_remove_elements = html_remove_elements
        self.docinfo = docinfo
        self.enable_star = enable_star
        self.path = path
        self.sources = sources


def _load_lines(path: str) -> list[str]:
    with open(path, "r", encoding="utf-8") as f:
        return [ln.rstrip("\r\n") for ln in f]


def index_config(
    conf: SphinxConfig, name: str, warnings: list[str] | None = None
) -> IndexConfig:
    """Resolve one index section into engine settings.  File-valued
    keys (stopwords/wordforms/exceptions/chinese_dictionary) resolve
    relative to the current working directory, like the reference's
    fopen of the raw config value."""
    from sphinx_1_spark.functions.tokenizer import (
        Tokenizer,
        TokenizerSettings,
    )

    if "index" not in conf.sections or name not in conf.sections["index"]:
        raise ConfigError(f"index '{name}': no such index in config")
    h = conf.sections["index"][name]
    warn = warnings if warnings is not None else conf.warnings

    # ---- sphConfTokenizer (sphinxutils.cpp:744-787)
    charset_type = h.get_str("charset_type")
    if not charset_type or charset_type == "sbcs":
        # the reference DEFAULTS to the SBCS tokenizer; SBCS is the
        # SURVEY-declared N/A here (byte-space charset emulation
        # covers its goldens) — demand an explicit utf-8
        raise ConfigError(
            f"index '{name}': charset_type="
            f"{charset_type or 'sbcs (default)'} — the SBCS tokenizer "
            "is a documented N/A (SURVEY 2.2); set charset_type = utf-8"
        )
    if charset_type != "utf-8":
        raise ConfigError(f"unknown charset type '{charset_type}'")

    ngram_len = max(h.get_int("ngram_len"), 0)
    if "ngram_chars" in h and ngram_len > 1:
        # the reference n-gram tokenizer only implements 1-char
        # n-grams (CSphTokenizer_UTF8Ngram asserts m_iNgramLen==1,
        # src/sphinx.cpp:4936-4946; the ctor defaults to 1, so an
        # absent ngram_len behaves as 1 in release builds)
        raise ConfigError(
            f"index '{name}': ngram_len={ngram_len} is not supported "
            "(the reference n-gram tokenizer handles ngram_len = 1 only)"
        )

    # phrase boundary only takes effect when the step is nonzero
    # (sphinxutils.cpp:781-784)
    boundary_step = max(h.get_int("phrase_boundary_step"), -1)
    boundary = h.get_str("phrase_boundary") if boundary_step != 0 else ""

    # ---- sphConfDictionary (:790-796)
    morphology = tuple(
        m for m in re.split(r"[\s,]+", h.get_str("morphology")) if m
    )

    settings = TokenizerSettings(
        charset_table=h.get_str("charset_table")
        or TokenizerSettings().charset_table,
        min_word_len=max(h.get_int("min_word_len"), 1),
        ngram_chars=h.get_str("ngram_chars"),
        mmseg_dict_path=h.get_str("chinese_dictionary") or None,
        ignore_chars=h.get_str("ignore_chars"),
        phrase_boundary=boundary,
        boundary_step=boundary_step,
        morphology=morphology,
        min_stemming_len=h.get_int("min_stemming_len", 1),
        index_exact_words=h.get_int("index_exact_words") != 0,
        # clamped into 0..1 like sphConfIndex (:806-807)
        overshort_step=min(max(h.get_int("overshort_step", 1), 0), 1),
        stopword_step=min(max(h.get_int("stopword_step", 1), 0), 1),
        min_prefix_len=max(h.get_int("min_prefix_len"), 0),
        min_infix_len=max(h.get_int("min_infix_len"), 0),
    )

    # exceptions (synonyms is the deprecated spelling; the new name
    # wins when both are set, sphinxutils.cpp:766-768)
    syn_file = h.get_str("exceptions") or h.get_str("synonyms")
    if syn_file:
        import dataclasses as _dc

        settings = _dc.replace(
            settings, synonyms=tuple(_load_lines(syn_file))
        )

    # stopword files: space-separated list, each tokenized through
    # the index's own tokenizer (CSphDict::LoadStopwords)
    stop_spec = h.get_str("stopwords")
    if stop_spec:
        import dataclasses as _dc

        words: set[str] = set()
        tok = Tokenizer(settings)
        for path in stop_spec.split():
            try:
                text = open(path, "r", encoding="utf-8").read()
            except OSError:
                warn.append(
                    f"WARNING: failed to load stopwords from '{path}'"
                )
                continue
            words.update(tok.tokenize(text))
        settings = _dc.replace(settings, stopwords=frozenset(words))

    # wordforms: single-word sources -> wordforms pairs, multi-word
    # sources -> multiforms lines (LoadWordforms' split)
    wf_file = h.get_str("wordforms")
    if wf_file:
        import dataclasses as _dc

        singles: list[tuple[str, str]] = []
        multis: list[str] = []
        for ln in _load_lines(wf_file):
            if ">" not in ln:
                continue
            frm, _, to = ln.partition(">")
            frm, to = frm.strip(), to.strip()
            if not frm or not to:
                continue
            if len(frm.split()) > 1:
                multis.append(ln)
            else:
                singles.append((frm, to))
        settings = _dc.replace(
            settings,
            wordforms=tuple(singles),
            multiforms=tuple(multis),
        )

    # ---- sphConfIndex (:799-825)
    html_strip = h.get_int("html_strip") != 0 if "html_strip" in h else False
    docinfo = "extern"
    if "docinfo" in h:
        d = h.get_str("docinfo")
        if d in ("none", "inline", "extern"):
            docinfo = d
        else:
            warn.append(
                f"WARNING: unknown docinfo={d}, defaulting to extern"
            )

    return IndexConfig(
        tokenizer=settings,
        html_strip=html_strip,
        html_index_attrs=h.get_str("html_index_attrs"),
        html_remove_elements=h.get_str("html_remove_elements"),
        docinfo=docinfo,
        enable_star=h.get_int("enable_star") != 0,
        path=h.get_str("path"),
        sources=h.get_list("source"),
    )
