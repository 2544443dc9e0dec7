"""sphinx.conf parser + settings-mapping tests
(sphinx_1_spark/sources/config.py vs CSphConfigParser
src/sphinxutils.cpp:256-741 and sphConf* :744-825)."""

import os
import subprocess
import sys

import pytest

from sphinx_1_spark.sources.config import (
    ConfigError,
    SphinxConfigParser,
    index_config,
    parse_config,
)


def parse_text(tmp_path, text, name="sphinx.conf"):
    p = tmp_path / name
    p.write_text(text)
    return parse_config(str(p))


# ------------------------------------------------------------- grammar
def test_sections_keys_comments_trim(tmp_path):
    conf = parse_text(
        tmp_path,
        """
# leading comment
searchd {
    max_matches = 2000   # trailing comment
    listen   =   9312
}
source src1 {
    sql_query = SELECT id, title FROM docs
}
index main {
    path = /var/idx/main
    charset_type = utf-8
}
""",
    )
    assert conf.sections["searchd"]["searchd"].get_str("max_matches") == "2000"
    assert conf.sections["searchd"]["searchd"].get_int("max_matches") == 2000
    assert (
        conf.sections["source"]["src1"].get_str("sql_query")
        == "SELECT id, title FROM docs"
    )
    assert conf.sections["index"]["main"].get_str("path") == "/var/idx/main"
    assert conf.warnings == []


def test_multivalue_chain_and_scalar_head(tmp_path):
    conf = parse_text(
        tmp_path,
        """
source s {
    sql_query_pre = SET NAMES utf8
    sql_query_pre = SET SESSION query_cache_type=OFF
}
""",
    )
    s = conf.sections["source"]["s"]
    assert s.get_list("sql_query_pre") == [
        "SET NAMES utf8",
        "SET SESSION query_cache_type=OFF",
    ]
    assert s.get_str("sql_query_pre") == "SET NAMES utf8"  # head


def test_inheritance_override_replaces_then_chains(tmp_path):
    """AddKey on a tagged (inherited) key REPLACES the inherited chain;
    later assignments chain again (sphinxutils.cpp:298-329)."""
    conf = parse_text(
        tmp_path,
        """
source base {
    sql_query_pre = A
    sql_query_pre = B
    sql_host = localhost
}
source child : base {
    sql_query_pre = C
    sql_query_pre = D
}
""",
    )
    child = conf.sections["source"]["child"]
    assert child.get_list("sql_query_pre") == ["C", "D"]
    assert child.get_str("sql_host") == "localhost"  # inherited untouched
    base = conf.sections["source"]["base"]
    assert base.get_list("sql_query_pre") == ["A", "B"]  # parent unchanged


def test_inheritance_missing_parent(tmp_path):
    with pytest.raises(ConfigError, match="parent doesn't exist"):
        parse_text(tmp_path, "index a : nope {\n  path = x\n}\n")


def test_duplicate_section_and_bad_type(tmp_path):
    with pytest.raises(ConfigError, match="already exists"):
        parse_text(tmp_path, "searchd {\n}\nsearchd {\n}\n")
    with pytest.raises(ConfigError, match="invalid section type 'bogus'"):
        parse_text(tmp_path, "bogus {\n}\n")


def test_unknown_key_reports_line(tmp_path):
    with pytest.raises(ConfigError, match=r"unknown key name 'frob' .* line 3"):
        parse_text(tmp_path, "searchd\n{\n    frob = 1\n}\n")


def test_expected_char_and_token_errors(tmp_path):
    with pytest.raises(ConfigError, match=r"expected '=', got ':'"):
        parse_text(tmp_path, "searchd {\n    port : 1\n}\n")
    with pytest.raises(
        ConfigError, match=r"section contents: expected token, got '\+'"
    ):
        parse_text(tmp_path, "searchd {\n    + = 1\n}\n")
    with pytest.raises(ConfigError, match="token too long"):
        parse_text(tmp_path, f"searchd {{\n    {'a' * 65} = 1\n}}\n")


def test_value_continuation_and_comment_escape(tmp_path):
    conf = parse_text(
        tmp_path,
        "source s {\n"
        "    sql_query = SELECT id \\\n"
        "        FROM docs\n"
        "    sql_query_info = color \\# eeeeee\n"
        "}\n",
    )
    s = conf.sections["source"]["s"]
    # continuation joins without a separator (the backslash and the
    # newline are both swallowed, sphinxutils.cpp:653-656)
    assert s.get_str("sql_query") == "SELECT id         FROM docs"
    assert s.get_str("sql_query_info") == "color # eeeeee"


def test_deprecated_and_not_multivalue_warnings(tmp_path):
    conf = parse_text(
        tmp_path,
        """
searchd {
    address = 1.2.3.4
    port = 9312
    port = 9313
}
""",
    )
    w = "\n".join(conf.warnings)
    assert "key 'address' is deprecated" in w and "use 'listen'" in w
    assert "key 'port' is not multi-value" in w
    # the warned-about value chains at the tail; scalar head read
    # ignores it, exactly like the warning text says
    assert conf.sections["searchd"]["searchd"].get_str("port") == "9312"


def test_search_section_quirk(tmp_path):
    """The reference has no key table for the `search` plain section:
    empty parses, the first key dies with 'unknown section type'."""
    conf = parse_text(tmp_path, "search {\n}\n")
    assert "search" in conf.sections
    with pytest.raises(ConfigError, match="unknown section type 'search'"):
        parse_text(tmp_path, "search {\n    anything = 1\n}\n")


def test_section_type_case_quirk(tmp_path):
    """IsNamedSection is case-insensitive but ValidateKey compares the
    literal token, so `INDEX foo` accepts the section and dies on its
    first key (sphinxutils.cpp:271-277 vs :336-340)."""
    with pytest.raises(ConfigError, match="unknown section type 'INDEX'"):
        parse_text(tmp_path, "INDEX foo {\n    path = x\n}\n")


def test_unclosed_section_parses_silently(tmp_path):
    """No EOF state check in the reference (the read loop just breaks)
    — an unclosed section is accepted."""
    conf = parse_text(tmp_path, "searchd {\n    port = 9312\n")
    assert conf.sections["searchd"]["searchd"].get_str("port") == "9312"


def test_shebang_exec(tmp_path):
    """#!interpreter configs execute and parse stdout (TryToExec,
    sphinxutils.cpp:379-467).  /bin/cat echoes the file, whose
    shebang line then reads as a plain comment in buffer mode."""
    conf = parse_text(
        tmp_path, "#!/bin/cat\nsearchd {\n    port = 9312\n}\n"
    )
    assert conf.sections["searchd"]["searchd"].get_int("port") == 9312


# ------------------------------------------------------- settings map
BASE = """
index main {{
    charset_type = utf-8
    path = /var/idx/main
    source = src1
    source = src2
    {extra}
}}
"""


def _icfg(tmp_path, extra=""):
    conf = parse_text(tmp_path, BASE.format(extra=extra), name="m.conf")
    return conf, index_config(conf, "main")


def test_index_config_basics(tmp_path):
    conf, ic = _icfg(
        tmp_path,
        """
    min_word_len = 3
    morphology = stem_en, soundex
    index_exact_words = 1
    min_prefix_len = 2
    overshort_step = 5
    stopword_step = 0
    phrase_boundary = U+2E
    phrase_boundary_step = 100
""",
    )
    t = ic.tokenizer
    assert t.min_word_len == 3
    assert t.morphology == ("stem_en", "soundex")
    assert t.index_exact_words is True
    assert t.min_prefix_len == 2
    assert t.overshort_step == 1  # clamped into 0..1 (sphConfIndex)
    assert t.stopword_step == 0
    assert t.phrase_boundary == "U+2E" and t.boundary_step == 100
    assert ic.path == "/var/idx/main"
    assert ic.sources == ["src1", "src2"]
    assert ic.docinfo == "extern"


def test_phrase_boundary_needs_nonzero_step(tmp_path):
    """sphConfTokenizer only reads phrase_boundary when the step is
    nonzero (sphinxutils.cpp:781-784)."""
    _, ic = _icfg(tmp_path, "phrase_boundary = U+2E")
    assert ic.tokenizer.phrase_boundary == ""


def test_sbcs_default_rejected_and_unknown_charset(tmp_path):
    conf = parse_text(
        tmp_path, "index main {\n    path = x\n}\n", name="s.conf"
    )
    with pytest.raises(ConfigError, match="charset_type=sbcs \\(default\\)"):
        index_config(conf, "main")
    conf2 = parse_text(
        tmp_path,
        "index main {\n    charset_type = koi8\n}\n",
        name="s2.conf",
    )
    with pytest.raises(ConfigError, match="unknown charset type 'koi8'"):
        index_config(conf2, "main")


def test_ngram_len_must_be_one(tmp_path):
    with pytest.raises(ConfigError, match="ngram_len=2 is not supported"):
        _icfg(tmp_path, "ngram_chars = U+4E00..U+9FBF\n    ngram_len = 2")
    _, ic = _icfg(tmp_path, "ngram_chars = U+4E00..U+9FBF\n    ngram_len = 1")
    assert ic.tokenizer.ngram_chars == "U+4E00..U+9FBF"


def test_chinese_dictionary_selects_mmseg(tmp_path):
    _, ic = _icfg(tmp_path, "chinese_dictionary = /data/zh.lib")
    assert ic.tokenizer.mmseg_dict_path == "/data/zh.lib"


def test_stopwords_loaded_through_tokenizer(tmp_path):
    sw = tmp_path / "stops.txt"
    sw.write_text("The\nAND\nof\n")
    _, ic = _icfg(tmp_path, f"stopwords = {sw}")
    # folded through the index tokenizer (CSphDict::LoadStopwords)
    assert ic.tokenizer.stopwords == frozenset({"the", "and", "of"})


def test_wordforms_split_single_vs_multi(tmp_path):
    wf = tmp_path / "wf.txt"
    wf.write_text("walks > walk\nruns>run\ncore 2 duo > c2d\nbad line\n")
    _, ic = _icfg(tmp_path, f"wordforms = {wf}")
    assert ic.tokenizer.wordforms == (("walks", "walk"), ("runs", "run"))
    assert ic.tokenizer.multiforms == ("core 2 duo > c2d",)


def test_exceptions_wins_over_synonyms(tmp_path):
    exc = tmp_path / "exc.txt"
    exc.write_text("AT&T => AT_T\n")
    syn = tmp_path / "syn.txt"
    syn.write_text("C++ => cplusplus\n")
    conf, ic = _icfg(
        tmp_path, f"exceptions = {exc}\n    synonyms = {syn}"
    )
    assert ic.tokenizer.synonyms == ("AT&T => AT_T",)
    assert any("deprecated" in w for w in conf.warnings)  # synonyms key


def test_docinfo_unknown_warns(tmp_path):
    conf, ic = _icfg(tmp_path, "docinfo = weird")
    assert ic.docinfo == "extern"
    assert any("unknown docinfo=weird" in w for w in conf.warnings)


def test_missing_index_name(tmp_path):
    conf = parse_text(tmp_path, "index main {\n}\n", name="x.conf")
    with pytest.raises(
        ConfigError, match="index 'other': no such index in config"
    ):
        index_config(conf, "other")


# ------------------------------------------------------------- e2e CLI
def test_build_job_with_config(tmp_path):
    """indexer -c sphinx.conf <index> analog: the job reads tokenizer
    settings from the config and builds a servable segment set."""
    sw = tmp_path / "stops.txt"
    # the synthetic corpus' deliberate head term: its absence from the
    # built dictionary proves the config's stopwords took effect
    sw.write_text("The\n")
    (tmp_path / "web.conf").write_text(
        f"""
index web {{
    charset_type = utf-8
    ngram_chars = U+4E00..U+9FBF
    morphology = stem_en
    stopwords = {sw}
    path = unused
}}
"""
    )
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/build_index_job.py",
            "--synthetic",
            "200",
            "--shards",
            "2",
            "--output",
            str(tmp_path / "segs"),
            "--config",
            str(tmp_path / "web.conf"),
            "--index",
            "web",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "using config file" in proc.stdout
    import json

    stat = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stat["segments"] == 2 and stat["docs"] == 200
    # morphology applied at build: the dictionary holds stemmed forms
    out = subprocess.run(
        [
            sys.executable,
            "scripts/segment_tool.py",
            "dictionary",
            *sorted(
                str(p)
                for p in (tmp_path / "segs").iterdir()
                if p.is_dir()
            ),
            "--top",
            "500",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    words = {ln.split("\t")[0] for ln in out.stdout.splitlines() if ln}
    # the head term is stopped (folded "The" -> "the" through the
    # index tokenizer at load, CSphDict::LoadStopwords) while the
    # synthetic vocab terms survive; stem_en leaves wNNNN tokens
    # unchanged, so morphology wiring is pinned by the unit tests
    assert "the" not in words
    assert any(w.startswith("w0") for w in words)


def test_build_job_config_errors(tmp_path):
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/build_index_job.py",
            "--synthetic",
            "10",
            "--output",
            str(tmp_path / "s"),
            "--config",
            str(tmp_path / "nope.conf"),
            "--index",
            "web",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc.returncode == 1 and "FATAL:" in proc.stdout
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/build_index_job.py",
            "--synthetic",
            "10",
            "--output",
            str(tmp_path / "s"),
            "--config",
            str(tmp_path / "nope.conf"),
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc.returncode != 0
    assert "--config and --index are used together" in proc.stderr
