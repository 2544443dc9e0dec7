"""spelldump tests (scripts/spelldump.py vs src/spelldump.cpp:1-1190).

Pins the set/escape grammar (GetWordchar/IsInSet incl. the
inverted-range fallthrough), affix-rule application for both
directions (incl. the CheckPrefix set-stall quirk), ISpell and MySpell
loaders, cross-product expansion, the four output modes, and the
round trip of the emitted file into the tokenizer's wordforms.
"""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(__file__)
SCRIPTS = os.path.join(HERE, "..", "scripts")
sys.path.insert(0, SCRIPTS)

import spelldump  # noqa: E402
from spelldump import (  # noqa: E402
    RULE_PREFIXES,
    RULE_SUFFIXES,
    Affix,
    AffixRule,
    expand,
    fgets_lines,
    get_set_min_max,
    get_wordchar,
    is_in_set,
    load_dict,
    write_result,
)


# ------------------------------------------------------------ low level
def test_get_wordchar_escapes():
    """GetWordchar (spelldump.cpp:14-35): '\\?HH' is 4 chars — the
    char after the backslash is IGNORED, the next two must be hex."""
    assert get_wordchar(b"a", 0) == (ord("a"), 1)
    assert get_wordchar(b"\\x41z", 0) == (0x41, 4)
    assert get_wordchar(b"\\QFFz", 0) == (0xFF, 4)  # 'Q' ignored
    assert get_wordchar(b"\\x4", 0) == (0, 0)  # too short
    assert get_wordchar(b"\\x4G", 0) == (0, 0)  # non-hex second digit
    assert get_wordchar(b"", 0) == (0, 0)


def test_is_in_set_basics_and_invert():
    assert is_in_set(ord("b"), b"abc")
    assert not is_in_set(ord("z"), b"abc")
    assert is_in_set(ord("z"), b"^abc")
    assert not is_in_set(ord("a"), b"^abc")
    # range form uses the FIRST '-' as separator
    assert is_in_set(ord("m"), b"a-z")
    assert not is_in_set(ord("0"), b"a-z")
    # reversed bounds still work (Min/Max at compare time)
    assert is_in_set(ord("m"), b"z-a")
    # escaped range
    assert is_in_set(0x42, b"\\x41-\\x43")


def test_is_in_set_inverted_range_quirk():
    """spelldump.cpp:50-75: with '^' and a '-', only an IN-range
    letter answers (!invert) — out-of-range letters fall through to
    `return false` even though the set is inverted."""
    assert not is_in_set(ord("m"), b"^a-z")  # in range: !invert = False
    assert not is_in_set(ord("0"), b"^a-z")  # quirk: NOT True


def test_get_set_min_max():
    assert get_set_min_max(b"ace") == (ord("a"), ord("e"))
    assert get_set_min_max(b"a-e") == (ord("a"), ord("e"))  # '-' skipped
    assert get_set_min_max(b"") is None
    # the first char seeds min/max even if it is '-'
    assert get_set_min_max(b"-z") == (ord("-"), ord("z"))


def test_fgets_chunking():
    """MAX_STR_LENGTH fgets splits long lines (spelldump.cpp:10)."""
    long = b"a" * 700 + b"\n" + b"bb\n"
    chunks = list(fgets_lines(long))
    assert chunks[0] == b"a" * 511
    assert chunks[1] == b"a" * 189 + b"\n"
    assert chunks[2] == b"bb\n"


# ------------------------------------------------------------ rules
def test_suffix_rule_apply():
    # E>ING: "make" -> strip 'e', append 'ing'
    r = AffixRule(RULE_SUFFIXES, ord("G"), True, b"e", b"e", b"ing")
    assert r.apply(b"make") == b"making"
    assert r.apply(b"run") is None  # condition 'e' unmatched
    # [^e]>ING with no strip
    r2 = AffixRule(RULE_SUFFIXES, ord("G"), True, b"[^e]", b"", b"ing")
    assert r2.apply(b"run") == b"runing"  # no consonant doubling here
    assert r2.apply(b"make") is None
    # '.' condition applies everywhere
    r3 = AffixRule(RULE_SUFFIXES, ord("S"), True, b".", b"", b"s")
    assert r3.apply(b"cat") == b"cats"
    # empty condition: Apply returns the word UNCHANGED
    # (spelldump.cpp:247-250 returns before strip/append)
    r4 = AffixRule(RULE_SUFFIXES, ord("X"), False, b"", b"x", b"yz")
    assert r4.apply(b"word") == b"word"
    # strip must match the word's tail
    r5 = AffixRule(RULE_SUFFIXES, ord("D"), False, b".", b"y", b"ies")
    assert r5.apply(b"fly") == b"flies"
    assert r5.apply(b"cat") is None


def test_suffix_condition_multichar_and_sets():
    # two literal chars + a set, matched right to left
    r = AffixRule(RULE_SUFFIXES, ord("S"), False, b"[ae]ty", b"", b"!")
    assert r.apply(b"meaty") == b"meaty!"  # a-t-y tail, 'a' in [ae]
    assert r.apply(b"party") is None  # 'r' not in [ae]
    assert r.apply(b"ty") == b"ty!"  # word shorter than cond: ok


def test_prefix_rule_apply_and_set_stall():
    r = AffixRule(RULE_PREFIXES, ord("R"), True, b".", b"", b"re")
    assert r.apply(b"run") == b"rerun"
    # strip anchored at position 0
    r2 = AffixRule(RULE_PREFIXES, ord("U"), False, b".", b"un", b"")
    assert r2.apply(b"undo") == b"do"
    assert r2.apply(b"redo") is None
    # CheckPrefix stall (spelldump.cpp:341-372): the cursor never
    # advances past '[...]', so EVERY word char must be in the set and
    # condition text after the set is unreachable
    r3 = AffixRule(RULE_PREFIXES, ord("Z"), False, b"[ab]x", b"", b"q")
    assert r3.apply(b"abba") == b"qabba"  # all chars in [ab]; 'x' never checked
    assert r3.apply(b"axb") is None  # 'x' not in [ab]


def test_prefix_literal_condition():
    r = AffixRule(RULE_PREFIXES, ord("P"), False, b"un", b"", b"non")
    assert r.apply(b"unfit") == b"nonunfit"
    assert r.apply(b"fit") is None


# ------------------------------------------------------------ loaders
def test_detect_format_and_ispell_load(tmp_path, capsys):
    aff = tmp_path / "en.aff"
    aff.write_bytes(
        b"# comment header\n"
        b"suffixes\n"
        b"flag *S:\n"
        b"    . > S      # plural\n"
        b"flag G:\n"
        b"    E > -E, ING    # strip e add ing\n"
        b"prefixes\n"
        b"flag *R:\n"
        b"    . > RE\n"
    )
    a = Affix()
    assert a.load(str(aff))
    out = capsys.readouterr().out
    assert "Using ISpell affix file format" in out
    assert len(a.rules) == 3
    s, g, r = a.rules
    # conditions/strip/append are Strip()ed: spaces+hyphens dropped,
    # lowercased (spelldump.cpp:658-666)
    assert (s.rule_type, chr(s.flag), s.cross) == (RULE_SUFFIXES, "S", True)
    assert (s.condition, s.strip, s.append) == (b".", b"", b"s")
    assert (g.rule_type, chr(g.flag), g.cross) == (RULE_SUFFIXES, "G", False)
    assert (g.condition, g.strip, g.append) == (b"e", b"e", b"ing")
    assert (r.rule_type, chr(r.flag), r.cross) == (RULE_PREFIXES, "R", True)
    assert (r.condition, r.strip, r.append) == (b".", b"", b"re")
    assert a.check_crosses  # cross prefix AND cross suffix present


def test_ispell_two_field_rule_is_append(tmp_path):
    """nFields==2 (no comma): the second field is the APPEND and the
    strip is empty (spelldump.cpp:662-668 case 2)."""
    aff = tmp_path / "x.aff"
    aff.write_bytes(b"suffixes\nflag T:\n. > XY\n")
    a = Affix()
    assert a.load(str(aff))
    assert (a.rules[0].strip, a.rules[0].append) == (b"", b"xy")


def test_myspell_load(tmp_path, capsys):
    aff = tmp_path / "en.aff"
    aff.write_bytes(
        b"SET ISO8859-1\n"
        b"SFX S Y 2\n"
        b"SFX S 0 s [^sxzh]\n"
        b"SFX S y ies [^aeiou]y\n"
        b"PFX R Y 1\n"
        b"PFX R 0 re .\n"
    )
    a = Affix()
    assert a.load(str(aff))
    assert "Using MySpell affix file format" in capsys.readouterr().out
    assert len(a.rules) == 3
    s1, s2, p = a.rules
    # '0' fields become empty; MySpell fields are NOT lowercased
    assert (s1.condition, s1.strip, s1.append) == (b"[^sxzh]", b"", b"s")
    assert (s2.condition, s2.strip, s2.append) == (b"[^aeiou]y", b"y", b"ies")
    assert s1.cross and s2.cross
    assert p.is_prefix() and (p.strip, p.append) == (b"", b"re")
    assert a.check_crosses


def test_myspell_flag_mismatch_and_malformed_warns(tmp_path, capsys):
    aff = tmp_path / "w.aff"
    aff.write_bytes(
        b"SFX S Y 2\n"
        b"SFX T 0 s .\n"  # flag mismatch (still added under S header's flag char check)
        b"SFX S bad\n"  # malformed rule
    )
    a = Affix()
    assert a.load(str(aff))
    out = capsys.readouterr().out
    assert "Flag character mismatch" in out
    assert "Malformed suffix rule" in out


def test_load_dict(tmp_path):
    d = tmp_path / "en.dict"
    d.write_bytes(
        b"3\n"  # aspell count line becomes a flagless entry (quirk)
        b"cat/S\n"
        b"make/G   \n"
        b"dog\n"
        b"fish/SG extra\n"
        b"  leading\n"  # leading space: word scan stops at once -> empty
    )
    entries = load_dict(str(d))
    assert entries == [
        (b"3", b""),
        (b"cat", b"S"),
        (b"make", b"G"),
        (b"dog", b""),
        (b"fish", b"SG"),
        (b"", b""),
    ]


# ------------------------------------------------------------ expansion
@pytest.fixture()
def en_affix(tmp_path):
    aff = tmp_path / "en.aff"
    aff.write_bytes(
        b"suffixes\n"
        b"flag *S:\n"
        b"    . > S\n"
        b"flag G:\n"
        b"    E > -E, ING\n"
        b"prefixes\n"
        b"flag *R:\n"
        b"    . > RE\n"
    )
    a = Affix()
    assert a.load(str(aff))
    return a


def test_expand_and_cross_products(en_affix):
    entries = [(b"run", b"RS"), (b"make", b"G")]
    wm = expand(entries, en_affix)
    # every word maps to itself
    assert (b"run", b"") in wm[b"run"]
    assert (b"make", b"") in wm[b"make"]
    # single-rule forms
    assert wm[b"rerun"] == [(b"run", b"R")]
    assert wm[b"runs"] == [(b"run", b"S")]
    assert wm[b"making"] == [(b"make", b"G")]
    # cross product: R (prefix, cross) then S (suffix, cross), flag
    # order R before S in "RS" -> reruns emitted with both flags
    assert wm[b"reruns"] == [(b"run", b"RS")]
    # no cross for 'make': G is not cross-product
    assert b"remake" not in wm


def test_expand_cross_needs_later_flag(en_affix):
    """iFlag2 starts at iFlag1+1 (spelldump.cpp:1113): with flags
    'SR' the suffix S runs first and R is a PREFIX cross — pairs
    (S,R) still emit because rule2 only needs the OPPOSITE direction;
    but with a single flag no cross can happen."""
    wm = expand([(b"run", b"SR")], en_affix)
    # S applied -> runs; cross with R -> reruns (append re to "runs")
    assert wm[b"reruns"] == [(b"run", b"SR")]
    wm_single = expand([(b"run", b"R")], en_affix)
    assert b"reruns" not in wm_single


def test_output_modes(tmp_path):
    wm = {
        b"b": [(b"b", b"")],
        b"a": [(b"x", b"S"), (b"a", b""), (b"longest", b"G")],
        b"c": [(b"first", b"S"), (b"second", b"R")],
    }
    out = tmp_path / "r.txt"

    # default: exact self-mapping wins; else longest
    write_result(wm, str(out), spelldump.M_EXACT_OR_LONGEST)
    assert out.read_bytes() == b"a > a\nb > b\nc > second\n"

    write_result(wm, str(out), spelldump.M_LAST)
    assert out.read_bytes() == b"a > longest\nb > b\nc > second\n"

    write_result(wm, str(out), spelldump.M_DEBUG)
    assert out.read_bytes() == (
        b"a > x S/3\na > a /3\na > longest G/3\n"
        b"b > b /1\n"
        b"c > first S/2\nc > second R/2\n"
    )

    write_result(wm, str(out), spelldump.M_DUPLICATES)
    assert out.read_bytes() == (
        b"a > x S/3\na > a /3\na > longest G/3\n"
        b"c > first S/2\nc > second R/2\n"
    )


def test_exact_or_longest_prefers_first_longest(tmp_path):
    wm = {b"k": [(b"aaa", b"S"), (b"bbb", b"R"), (b"c", b"G")]}
    out = tmp_path / "r.txt"
    write_result(wm, str(out), spelldump.M_EXACT_OR_LONGEST)
    # aaa and bbb tie at length 3: the FIRST strictly-longest wins
    assert out.read_bytes() == b"k > aaa\n"


# ------------------------------------------------------------ wordchars
def test_wordchars_single_pair_and_sets(tmp_path):
    aff = tmp_path / "ru.aff"
    aff.write_bytes(
        b"wordchars \\xE1 \\xC1\n"  # lower E1 <- upper C1
        b"wordchars [a-c] [A-C]\n"
        b"suffixes\n"
        b"flag S:\n"
        b"    A > Z\n"  # condition 'A' lowercases to 'a' via charset
    )
    a = Affix()
    assert a.load(str(aff))
    assert a.charset[0xC1] == 0xE1
    assert a.charset[ord("A")] == ord("a")
    assert a.charset[ord("B")] == ord("b")
    assert a.charset[ord("C")] == ord("c")
    # dictionary conversion now drives Strip()'s lowercasing: only
    # DECLARED wordchars fold (ToLowerCase returns the char unchanged
    # when m_dCharset has no pair, spelldump.cpp:860-862) — so 'A'
    # folds but 'Z' stays uppercase
    assert a.rules[0].condition == b"a"
    assert a.rules[0].append == b"Z"


# ------------------------------------------------------------ CLI + e2e
def _run(args, cwd):
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "spelldump.py"), *args],
        capture_output=True,
        text=True,
        cwd=cwd,
    )


def test_cli_end_to_end_wordforms_roundtrip(tmp_path):
    (tmp_path / "en.dict").write_bytes(b"2\ncat/S\nmake/G\n")
    (tmp_path / "en.aff").write_bytes(
        b"suffixes\nflag *S:\n    . > S\nflag G:\n    E > -E, ING\n"
    )
    r = _run(["en.dict", "en.aff", "out.txt"], str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "spelldump, an ispell dictionary dumper" in r.stdout
    assert "Dictionary words processed: 3" in r.stdout
    text = (tmp_path / "out.txt").read_bytes()
    assert b"cats > cat\n" in text
    assert b"making > make\n" in text
    assert b"cat > cat\n" in text

    # the emitted file is a valid wordforms file for the tokenizer
    from sphinx_1_spark.functions.tokenizer import (
        Tokenizer,
        TokenizerSettings,
    )

    pairs = []
    for line in text.decode().splitlines():
        frm, _, to = line.partition(" > ")
        if frm and to:
            pairs.append((frm, to))
    tok = Tokenizer(TokenizerSettings(wordforms=tuple(pairs)))
    assert tok.tokenize("making cats") == ["make", "cat"]


def test_cli_usage_bad_mode_and_missing_files(tmp_path):
    r = _run([], str(tmp_path))
    assert r.returncode == 1 and "Usage: spelldump" in r.stdout
    r = _run(["-m", "bogus", "a", "b"], str(tmp_path))
    assert r.returncode == 1 and "Unrecognized mode: bogus" in r.stdout
    r = _run(["nope.dict", "nope.aff"], str(tmp_path))
    assert r.returncode == 1
    assert "Error loading dictionary file 'nope.dict'" in r.stdout
    (tmp_path / "d.dict").write_bytes(b"cat/S\n")
    r = _run(["d.dict", "nope.aff"], str(tmp_path))
    assert r.returncode == 1
    assert "Error loading affix file 'nope.aff'" in r.stdout
    # affix file with no recognizable markers
    (tmp_path / "bad.aff").write_bytes(b"nothing here\n")
    r = _run(["d.dict", "bad.aff"], str(tmp_path))
    assert r.returncode == 1
    assert "Failed to detect affix file format" in r.stdout


def test_cli_mode_last_and_result_default(tmp_path):
    (tmp_path / "d.dict").write_bytes(b"cat/S\n")
    (tmp_path / "a.aff").write_bytes(b"suffixes\nflag S:\n. > S\n")
    r = _run(["-m", "last", "d.dict", "a.aff"], str(tmp_path))
    assert r.returncode == 0
    assert "Output mode: last" in r.stdout
    # default result file name (spelldump.cpp main: sResult="result.txt")
    assert (tmp_path / "result.txt").exists()
