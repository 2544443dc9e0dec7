"""mkdict tool tests (scripts/mkdict.py vs src/mkdict.cpp:1-154).

The reference compiles a ``word\\tfreq`` wordsfile into a darts
double-array; ours emits the normalized byte-sorted text form MMSegDict
loads.  These tests pin the input grammar quirks (strtol base 0, the
no-tab npos+1 wraparound, first-occurrence-wins dedupe, byte-sorted
output, blank-line build failure) and the round trip into the MMSEG
tokenizer's own dictionary loader.
"""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(__file__)
SCRIPTS = os.path.join(HERE, "..", "scripts")
sys.path.insert(0, SCRIPTS)

import mkdict  # noqa: E402

REFDICT = os.path.join(HERE, "goldens", "mmseg_testdict.txt")


@pytest.mark.parametrize(
    "raw,want",
    [
        (b"42", 42),
        (b"  42", 42),
        (b"+7", 7),
        (b"-5", -5),
        (b"0x1f", 31),
        (b"0X1F", 31),
        (b"017", 15),  # leading 0 -> octal
        (b"08", 0),  # '8' invalid in octal: parses the "0"
        (b"0x", 0),  # no hex digit: parses the "0"
        (b"0xG", 0),
        (b"9abc", 9),  # junk tail ignored
        (b"", 0),
        (b"abc", 0),
        (b"-0x10", -16),
        (b"0", 0),
    ],
)
def test_strtol0(raw, want):
    """C strtol(s, NULL, 0) semantics (mkdict.cpp:59 uses base 0)."""
    assert mkdict.strtol0(raw) == want


def test_parse_line_tab_and_quirk():
    # tabbed: key before first tab, value after it
    assert mkdict.parse_line(b"\xe4\xb8\x80\t15") == (b"\xe4\xb8\x80", 15)
    # only the FIRST tab splits (substr up to find('\t'))
    assert mkdict.parse_line(b"w\t3\t9") == (b"w", 3)
    # no tab: find()==npos, npos+1 wraps to 0, so the value is strtol
    # over the line minus its last character (mkdict.cpp:59)
    assert mkdict.parse_line(b"123abc") == (b"123abc", 123)
    assert mkdict.parse_line(b"word") == (b"word", 0)
    assert mkdict.parse_line(b"a") == (b"a", 0)


def test_compile_sort_dedupe_and_roundtrip(tmp_path, capsys):
    src = tmp_path / "words.txt"
    out = tmp_path / "dict.txt"
    # unsorted, duplicated (first wins), mixed bases
    src.write_bytes(
        b"\xe4\xb8\x8b\t0x10\n"  # U+4E0B freq 16
        b"\xe4\xb8\x80\t7\n"  # U+4E00 freq 7
        b"\xe4\xb8\x80\t999\n"  # duplicate: first occurrence kept
        b"ascii\t017\n"  # octal 15
        b"zz\n"  # no tab -> freq strtol("z") = 0
    )
    assert mkdict.main(["mkdict", str(src), str(out)]) == 0
    text = capsys.readouterr().out
    assert "Preparing..." in text
    assert "Total words:\t\t\t4" in text
    assert "Chinese dictionary was successfully created!" in text
    assert f"File size:\t\t\t{out.stat().st_size} bytes" in text

    lines = out.read_bytes().splitlines()
    # byte-sorted keys (the darts build order, mkdict.cpp:42-47)
    assert lines == [
        b"ascii\t15",
        b"zz\t0",
        b"\xe4\xb8\x80\t7",
        b"\xe4\xb8\x8b\t16",
    ]

    from sphinx_1_spark.functions.mmseg import MMSegDict

    d = MMSegDict.load(str(out))
    assert d.freq == {
        b"ascii": 15,
        b"zz": 0,
        b"\xe4\xb8\x80": 7,
        b"\xe4\xb8\x8b": 16,
    }


def test_compile_reference_testdict_is_fixpoint(tmp_path):
    """Compiling the mmseg golden dict must preserve every entry, and
    recompiling the compiled output must be byte-identical (the
    canonical form is a fixpoint)."""
    from sphinx_1_spark.functions.mmseg import MMSegDict

    out1 = tmp_path / "d1.txt"
    out2 = tmp_path / "d2.txt"
    assert mkdict.main(["mkdict", REFDICT, str(out1)]) == 0
    assert MMSegDict.load(str(out1)).freq == MMSegDict.load(REFDICT).freq
    assert mkdict.main(["mkdict", str(out1), str(out2)]) == 0
    assert out1.read_bytes() == out2.read_bytes()


def test_blank_line_fails_build(tmp_path, capsys):
    """darts rejects the empty key; the reference dies with 'cannot
    build Chinese dictionary' when a blank line reaches the build."""
    src = tmp_path / "words.txt"
    src.write_bytes(b"ok\t1\n\nalso\t2\n")
    out = tmp_path / "dict.txt"
    assert mkdict.main(["mkdict", str(src), str(out)]) == 1
    assert (
        "Error: cannot build Chinese dictionary"
        in capsys.readouterr().err
    )
    assert not out.exists()


def test_cli_usage_open_error_and_stdin(tmp_path):
    out = tmp_path / "dict.txt"
    # wrong argc -> usage, exit 1 (mkdict.cpp:133-137)
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "mkdict.py")],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 1 and "Usage:" in r.stderr
    # unopenable wordsfile (mkdict.cpp:148-152)
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(SCRIPTS, "mkdict.py"),
            str(tmp_path / "nope.txt"),
            str(out),
        ],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 1 and "Error: cannot open:" in r.stderr
    # "-" reads the wordsfile from stdin (mkdict.cpp:145-146)
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "mkdict.py"), "-", str(out)],
        input=b"b\t2\na\t1\n",
        capture_output=True,
    )
    assert r.returncode == 0
    assert out.read_bytes() == b"a\t1\nb\t2\n"
