"""LIVE differential tests against the compiled reference binaries.

`scripts/build_reference.sh` builds the reference out-of-tree (the
2009 source needs -std=gnu++98 under a modern g++); these tests then
run the REAL spelldump / mkdict / wordseg side by side with our ports
and compare outputs byte-for-byte (or token-for-token for wordseg,
whose dictionary format differs).  Skipped automatically when the
reference tree or a compiler is unavailable.
"""

import os
import random
import shutil
import string
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
BUILD = os.environ.get("SPHINX_REF_BUILD", "/tmp/refbuild")


def _ensure_build():
    if all(
        os.access(os.path.join(BUILD, "src", b), os.X_OK)
        for b in (
            "spelldump",
            "mkdict",
            "wordseg",
            "confdump",
            "tokdump",
            "stripdump",
            "snipdump",
            "stemdump",
            "exprdump",
        )
    ):
        return True
    if not os.path.isdir(REF) or shutil.which("g++") is None:
        return False
    r = subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "build_reference.sh"), REF, BUILD],
        capture_output=True,
        timeout=900,
    )
    return r.returncode == 0


pytestmark = pytest.mark.skipif(
    not _ensure_build(),
    reason="reference build unavailable (no /root/reference or no g++)",
)


def ref_bin(name):
    return os.path.join(BUILD, "src", name)


def run_ref(args, cwd, input=None):
    return subprocess.run(
        args,
        capture_output=True,
        cwd=cwd,
        input=input,
        timeout=300,
        env={**os.environ, "LC_ALL": "C"},
    )


# ---------------------------------------------------------- spelldump
MODES = ["default", "last", "debug", "duplicates"]


def _spelldump_both(tmp_path, dict_text, aff_text, mode="default"):
    (tmp_path / "d.dict").write_text(dict_text)
    (tmp_path / "a.aff").write_text(aff_text)
    r = run_ref(
        [ref_bin("spelldump"), "-m", mode, "d.dict", "a.aff", "ref.txt"],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stdout.decode()[-1000:]
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "spelldump.py"),
            "-m",
            mode,
            "d.dict",
            "a.aff",
            "py.txt",
        ],
        capture_output=True,
        cwd=str(tmp_path),
        timeout=300,
    )
    assert p.returncode == 0, p.stdout.decode()[-1000:]
    return (tmp_path / "ref.txt").read_bytes(), (tmp_path / "py.txt").read_bytes()


ISPELL_FIXED = [
    # the session's worked example: cross products, 2-field rules
    (
        "2\ncat/S\nmake/G\nrun/RS\n",
        "suffixes\nflag *S:\n    . > S\nflag G:\n    E > -E, ING\n"
        "prefixes\nflag *R:\n    . > RE\n",
    ),
    # sets, inverted sets, dot conditions, strips
    (
        "fly/D\ncry/D\nplay/D\nbus/Z\n",
        "suffixes\nflag D:\n    [^AEIOU]Y > -Y, IES\n    [AEIOU]Y > S\n"
        "flag Z:\n    S > SES\n",
    ),
    # wordchars single pair + set pair drive field lowercasing
    (
        "abc/T\n",
        "wordchars a A\nwordchars [b-c] [B-C]\nsuffixes\nflag T:\n"
        "    C > XY\n",
    ),
    # comments, blank-ish lines, unknown flags in dict, empty flags
    (
        "word/\nplain\nthing/QS\n",
        "# header\nsuffixes\nflag *S:\n    . > ER   # agentive\n",
    ),
    # condition with a set AND literals (right-to-left suffix match)
    (
        "meaty/W\nparty/W\nty/W\n",
        "suffixes\nflag W:\n    [AE]TY > !\n",
    ),
]


@pytest.mark.parametrize("case", range(len(ISPELL_FIXED)))
@pytest.mark.parametrize("mode", MODES)
def test_spelldump_ispell_fixed(tmp_path, case, mode):
    d, a = ISPELL_FIXED[case]
    ref, py = _spelldump_both(tmp_path, d, a, mode)
    assert ref == py


MYSPELL_FIXED = [
    (
        "3\ncat/S\nbus/S\nfly/S\nredo/R\n",
        "SET ISO8859-1\nSFX S Y 3\nSFX S 0 s [^sxzh]\n"
        "SFX S 0 es [sxzh]\nSFX S y ies [^aeiou]y\n"
        "PFX R Y 1\nPFX R 0 un .\n",
    ),
    # malformed entries + flag mismatch: warnings on both sides,
    # surviving rule sets must agree
    (
        "cat/S\n",
        "SFX S Y 3\nSFX T 0 s .\nSFX S bad\nSFX S 0 z .\n",
    ),
]


@pytest.mark.parametrize("case", range(len(MYSPELL_FIXED)))
@pytest.mark.parametrize("mode", MODES)
def test_spelldump_myspell_fixed(tmp_path, case, mode):
    d, a = MYSPELL_FIXED[case]
    ref, py = _spelldump_both(tmp_path, d, a, mode)
    assert ref == py


def _rand_condition(rng):
    parts = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.random()
        if kind < 0.4:
            parts.append(rng.choice(string.ascii_uppercase))
        elif kind < 0.6:
            parts.append(".")
        elif kind < 0.8:
            inner = "".join(
                rng.sample(string.ascii_uppercase, rng.randint(1, 3))
            )
            parts.append(f"[{inner}]")
        else:
            inner = "".join(
                rng.sample(string.ascii_uppercase, rng.randint(1, 3))
            )
            parts.append(f"[^{inner}]")
    return "".join(parts)


def _rand_ispell(rng):
    flags = rng.sample(string.ascii_uppercase, rng.randint(2, 4))
    aff = []
    half = max(1, len(flags) // 2)
    for section, sec_flags in (
        ("suffixes", flags[:half]),
        ("prefixes", flags[half:]),
    ):
        if not sec_flags:
            continue
        aff.append(section)
        for f in sec_flags:
            star = "*" if rng.random() < 0.6 else ""
            aff.append(f"flag {star}{f}:")
            for _ in range(rng.randint(1, 3)):
                cond = _rand_condition(rng)
                app = "".join(
                    rng.choices(string.ascii_uppercase, k=rng.randint(1, 3))
                )
                if rng.random() < 0.4:
                    strip = "".join(
                        rng.choices(
                            string.ascii_uppercase, k=rng.randint(1, 2)
                        )
                    )
                    aff.append(f"    {cond} > -{strip}, {app}")
                else:
                    aff.append(f"    {cond} > {app}")
    words = []
    for _ in range(rng.randint(3, 8)):
        w = "".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 7)))
        fl = "".join(
            rng.sample(flags, rng.randint(0, len(flags)))
        )
        words.append(f"{w}/{fl}" if fl else w)
    return "\n".join(words) + "\n", "\n".join(aff) + "\n"


def _rand_myspell(rng):
    flags = rng.sample(string.ascii_uppercase, rng.randint(2, 3))
    aff = ["SET ISO8859-1"]
    for f in flags:
        kind = rng.choice(["SFX", "PFX"])
        combine = rng.choice(["Y", "N"])
        n = rng.randint(1, 3)
        aff.append(f"{kind} {f} {combine} {n}")
        for _ in range(n):
            strip = (
                "0"
                if rng.random() < 0.6
                else "".join(
                    rng.choices(string.ascii_lowercase, k=rng.randint(1, 2))
                )
            )
            app = (
                "0"
                if rng.random() < 0.15
                else "".join(
                    rng.choices(string.ascii_lowercase, k=rng.randint(1, 3))
                )
            )
            cond = _rand_condition(rng).lower() or "."
            aff.append(f"{kind} {f} {strip} {app} {cond}")
    words = []
    for _ in range(rng.randint(3, 8)):
        w = "".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 7)))
        fl = "".join(rng.sample(flags, rng.randint(0, len(flags))))
        words.append(f"{w}/{fl}" if fl else w)
    return "\n".join(words) + "\n", "\n".join(aff) + "\n"


@pytest.mark.parametrize("seed", range(20))
def test_spelldump_random_ispell(tmp_path, seed):
    rng = random.Random(1000 + seed)
    d, a = _rand_ispell(rng)
    for mode in ("default", "debug"):
        ref, py = _spelldump_both(tmp_path, d, a, mode)
        assert ref == py, f"mode={mode}\ndict:\n{d}\naff:\n{a}"


@pytest.mark.parametrize("seed", range(20))
def test_spelldump_random_myspell(tmp_path, seed):
    rng = random.Random(2000 + seed)
    d, a = _rand_myspell(rng)
    for mode in ("default", "debug"):
        ref, py = _spelldump_both(tmp_path, d, a, mode)
        assert ref == py, f"mode={mode}\ndict:\n{d}\naff:\n{a}"


# ------------------------------------------------------------- mkdict
def test_mkdict_differential(tmp_path):
    """The reference emits a darts binary, ours the canonical text —
    compare the REPORTED entry count (dedupe/parse agreement) and that
    the reference accepts our compiled text as input to build the
    same-size darts (fixpoint through the real tool)."""
    words = (
        "\xe4\xb8\x80\t0x10\n"
        "\xe4\xb8\x8b\t7\n"
        "\xe4\xb8\x80\t999\n"  # dup: first wins on both sides
        "ascii\t017\n"
        "zz9x\n"  # tab-less wraparound line
    )
    src = tmp_path / "words.txt"
    src.write_text(words)
    r = run_ref(
        [ref_bin("mkdict"), str(src), str(tmp_path / "ref.lib")],
        str(tmp_path),
    )
    assert r.returncode == 0, r.stdout.decode()
    ref_total = [
        ln
        for ln in r.stdout.decode().splitlines()
        if ln.startswith("Total words:")
    ][0]

    import mkdict  # scripts/ on sys.path via conftest-less insert

    out = tmp_path / "py.txt"
    rc = mkdict.main(["mkdict", str(src), str(out)])
    assert rc == 0
    n_py = len(out.read_bytes().splitlines())
    assert ref_total.split()[-1] == str(n_py)

    # fixpoint through the REAL tool: our canonical text recompiled by
    # the reference yields the same word count and an identical darts
    r2 = run_ref(
        [ref_bin("mkdict"), str(out), str(tmp_path / "ref2.lib")],
        str(tmp_path),
    )
    assert r2.returncode == 0
    assert (tmp_path / "ref.lib").read_bytes() == (
        tmp_path / "ref2.lib"
    ).read_bytes()


sys.path.insert(0, os.path.join(REPO, "scripts"))
import mkdict  # noqa: E402  (used in test_mkdict_differential)


# ---------------------------------------------------- wordseg / MMSEG
def _wordseg_tokens(dict_lib, text):
    """Run the real wordseg (raw UTF8Chinese tokenizer over a darts
    dict, default charset — wordseg.cpp:1-35) and parse its stderr
    'Word: <tok>' lines."""
    r = run_ref([ref_bin("wordseg"), dict_lib, text], os.path.dirname(dict_lib))
    assert r.returncode == 0, r.stderr.decode("utf-8", "replace")[:500]
    return [
        ln[len("Word: ") :]
        for ln in r.stderr.decode("utf-8").splitlines()
        if ln.startswith("Word: ")
    ]


@pytest.mark.parametrize("seed", range(15))
def test_mmseg_live_differential(tmp_path, seed):
    """End-to-end MMSEG differential with a RANDOM dictionary: a random
    word/freq list compiled by the REAL mkdict into darts, driven
    through the REAL wordseg — token stream must equal our
    ChineseTokenizer over our mkdict's canonical text form of the same
    list.  (Texts keep CJK runs short: the reference's fixed
    float[64][10] chunk buffer, src/sphinx.cpp:4434, overflows on long
    ambiguous runs — the documented exclusion.)"""
    from sphinx_1_spark.functions.charset import build_fold_table
    from sphinx_1_spark.functions.mmseg import ChineseTokenizer, MMSegDict

    rng = random.Random(3000 + seed)
    cjk = [chr(0x4E00 + i) for i in range(64)]
    dict_words = set()
    for _ in range(rng.randint(10, 40)):
        w = "".join(rng.choices(cjk, k=rng.randint(1, 3)))
        dict_words.add(w)
    lines = "".join(
        f"{w}\t{rng.randint(1, 60000)}\n" for w in sorted(dict_words)
    )
    src = tmp_path / "words.txt"
    src.write_text(lines, encoding="utf-8")

    # real toolchain: mkdict -> darts -> wordseg
    r = run_ref(
        [ref_bin("mkdict"), str(src), str(tmp_path / "d.lib")], str(tmp_path)
    )
    assert r.returncode == 0, r.stdout.decode()

    # our toolchain: scripts/mkdict.py -> canonical text -> MMSegDict
    out = tmp_path / "d.txt"
    assert mkdict.main(["mkdict", str(src), str(out)]) == 0
    ztok = ChineseTokenizer(MMSegDict.load(str(out)), build_fold_table())

    for t in range(12):
        parts = []
        for _ in range(rng.randint(1, 5)):
            kind = rng.random()
            if kind < 0.5:
                parts.append(
                    "".join(
                        rng.choices(
                            sorted(dict_words), k=rng.randint(1, 3)
                        )
                    )
                )
            elif kind < 0.7:
                parts.append("".join(rng.choices(cjk, k=rng.randint(1, 6))))
            elif kind < 0.9:
                parts.append(
                    "".join(
                        rng.choices(string.ascii_letters, k=rng.randint(2, 6))
                    )
                )
            else:
                parts.append(str(rng.randint(0, 999)))
        text = " ".join(parts)
        want = _wordseg_tokens(str(tmp_path / "d.lib"), text)
        got = [tok for tok, _ in ztok.tokenize(text.encode("utf-8"))]
        assert got == want, f"text={text!r}\ndict:\n{lines}"


# ------------------------------------------------- config parser diff
def _ref_conf(tmp_path, text):
    """(ok, set_of_section_tuples, set_of_key_tuples, stdout) from the
    REAL CSphConfigParser via the confdump harness."""
    p = tmp_path / "r.conf"
    p.write_text(text)
    r = run_ref([ref_bin("confdump"), str(p)], str(tmp_path))
    secs, keys = set(), set()
    for ln in r.stdout.decode().splitlines():
        f = ln.split("\x1f")
        if f[0] == "SECTION":
            secs.add(tuple(f[1:]))
        elif f[0] == "KEY":
            keys.add(tuple(f[1:]))
    return r.returncode == 0, secs, keys, r.stdout.decode()


def _our_conf(tmp_path, text):
    from sphinx_1_spark.sources.config import ConfigError, parse_config

    p = tmp_path / "o.conf"
    p.write_text(text)
    try:
        conf = parse_config(str(p))
    except ConfigError as e:
        return False, set(), set(), str(e), []
    secs, keys = set(), set()
    for stype, names in conf.sections.items():
        for name, sec in names.items():
            secs.add((stype, name))
            for key, chain in sec.values.items():
                for i, v in enumerate(chain):
                    keys.add((stype, name, key, str(i), v))
    return True, secs, keys, "", conf.warnings


def _assert_conf_agree(tmp_path, text):
    ok_r, secs_r, keys_r, out_r = _ref_conf(tmp_path, text)
    ok_o, secs_o, keys_o, err_o, warns_o = _our_conf(tmp_path, text)
    assert ok_r == ok_o, (
        f"parse outcome differs (ref={ok_r} ours={ok_o})\n"
        f"config:\n{text}\nref stdout:\n{out_r}\nour error: {err_o}"
    )
    if ok_r:
        assert secs_r == secs_o, f"config:\n{text}"
        assert keys_r == keys_o, f"config:\n{text}"
        # warning PARITY by kind: same deprecated/not-multi-value hits
        ref_warns = sorted(
            ln.split(" in ")[0]
            for ln in out_r.splitlines()
            if ln.startswith("WARNING:")
        )
        our_warns = sorted(
            w.split(" in ")[0]
            for w in warns_o
            if w.startswith("WARNING: key")
        )
        assert ref_warns == our_warns, f"config:\n{text}"
    else:
        # message parity: the reference prints 'ERROR: <msg> in <file>
        # line <N> col <C>.'; ours raises '<msg> in <file> line <N>
        # col <C>.' — compare msg + line (file paths differ)
        ref_err = next(
            (ln for ln in out_r.splitlines() if ln.startswith("ERROR: ")),
            "",
        )[len("ERROR: ") :]

        def norm(e):
            msg, _, tail = e.partition(" in ")
            line = ""
            if " line " in tail:
                line = tail.split(" line ")[1].split(" col ")[0]
            return msg, line

        assert norm(ref_err) == norm(err_o), (
            f"config:\n{text}\nref: {ref_err}\nours: {err_o}"
        )


CONF_FIXED = [
    # full inheritance override semantics
    """source base {
    sql_query_pre = A
    sql_query_pre = B
    sql_host = localhost
}
source child : base {
    sql_query_pre = C
    sql_query_pre = D
}
""",
    # comments, continuation, escaped '#', trim
    """source s {
    sql_query = SELECT id \\
        FROM docs   # trailing
    sql_query_info = color \\# eeeeee
}
""",
    # deprecated + not-multi-value warnings
    "searchd {\n    address = x\n    port = 1\n    port = 2\n}\n",
    # empty search section ok; plain sections
    "search {\n}\nindexer {\n    mem_limit = 32M\n}\n",
    # errors: unknown key / bad type / dup section / missing parent /
    # expected char / search-section first key / case quirk
    "searchd {\n    frob = 1\n}\n",
    "bogus {\n}\n",
    "searchd {\n}\nsearchd {\n}\n",
    "index a : nope {\n}\n",
    "searchd {\n    port : 1\n}\n",
    "search {\n    anything = 1\n}\n",
    "INDEX foo {\n    path = x\n}\n",
    # unclosed section parses silently (no EOF check)
    "searchd {\n    port = 9312\n",
    # token too long
    "searchd {\n    " + "a" * 65 + " = 1\n}\n",
]


@pytest.mark.parametrize("case", range(len(CONF_FIXED)))
def test_config_fixed_differential(tmp_path, case):
    _assert_conf_agree(tmp_path, CONF_FIXED[case])


_SRC_KEYS = ["sql_query_pre", "sql_query", "sql_host", "sql_attr_uint"]
_IDX_KEYS = ["path", "docinfo", "morphology", "min_word_len", "source"]
_SEARCHD_KEYS = ["port", "listen", "max_matches", "log"]


def _rand_config(rng):
    lines = []
    named = []  # (type, name) created so far
    for _ in range(rng.randint(1, 5)):
        kind = rng.random()
        if kind < 0.25:
            stype = rng.choice(["searchd", "indexer"])
            lines.append(stype + " {")
            keys = _SEARCHD_KEYS if stype == "searchd" else ["mem_limit"]
            for _ in range(rng.randint(0, 4)):
                k = rng.choice(keys)
                v = rng.choice(["1", "9312", "hello world", "x=y", ""])
                lines.append(f"    {k} = {v}")
                if rng.random() < 0.2:
                    lines[-1] += "   # comment"
            lines.append("}")
        else:
            stype = rng.choice(["source", "index"])
            name = "s" + str(rng.randint(0, 5))
            parents = [n for t, n in named if t == stype]
            inherit = (
                f" : {rng.choice(parents)}"
                if parents and rng.random() < 0.4
                else ""
            )
            lines.append(f"{stype} {name}{inherit} {{")
            keys = _SRC_KEYS if stype == "source" else _IDX_KEYS
            for _ in range(rng.randint(0, 5)):
                k = rng.choice(keys)
                v = rng.choice(
                    [
                        "A",
                        "B B",
                        "SELECT 1",
                        "0x10",
                        "val\\# tail",
                        "multi \\",
                    ]
                )
                lines.append(f"    {k} = {v}")
                if v.endswith("\\"):
                    lines.append("        continued")
            lines.append("}")
            named.append((stype, name))
    return "\n".join(lines) + "\n"


@pytest.mark.parametrize("seed", range(25))
def test_config_random_differential(tmp_path, seed):
    rng = random.Random(4000 + seed)
    _assert_conf_agree(tmp_path, _rand_config(rng))


# -------------------------------------------------- tokenizer (live)
def _tokdump(spec, text, min_word_len=1, ngram=None):
    """Tokenize through the REAL ISphTokenizer (tokdump harness)."""
    r = run_ref(
        [
            ref_bin("tokdump"),
            spec or "-",
            str(min_word_len),
            ngram or "-",
        ],
        "/tmp",
        input=text.encode("utf-8"),
    )
    out = r.stdout.decode("utf-8")
    assert r.returncode == 0, out[:400]
    return [ln for ln in out.splitlines() if ln]


def _our_tokens(spec, text, min_word_len=1, ngram=None):
    from sphinx_1_spark.functions.tokenizer import (
        Tokenizer,
        TokenizerSettings,
    )
    import dataclasses as dc

    kw = dict(min_word_len=min_word_len, ngram_chars=ngram or "")
    if spec:
        kw["charset_table"] = spec
    return Tokenizer(TokenizerSettings(**kw)).tokenize(text)


_TEXT_POOL = [
    "Hello WORLD", "a ab abc abcd abcde", "MiXeD-case_words 123 x2",
    "Привет МИР да", "  spaced\tout\n lines ", "!!!", "",
    "word" * 40,  # 160 chars: the 64-codepoint truncation path
    "a.b,c;d:e", "under_score-dash", "0x1f 017 9 99 999",
]


def test_tokenizer_live_default_table():
    """Our SPHINX_DEFAULT_UTF8_TABLE must BE the reference's built-in
    UTF-8 default: token streams equal with no charset_table set."""
    for text in _TEXT_POOL:
        assert _our_tokens(None, text) == _tokdump(None, text), text


@pytest.mark.parametrize("mwl", [1, 2, 3, 5])
def test_tokenizer_live_min_word_len(mwl):
    for text in _TEXT_POOL:
        assert _our_tokens(None, text, mwl) == _tokdump(None, text, mwl), (
            text,
            mwl,
        )


def test_tokenizer_live_ngram():
    ng = "U+4E00..U+9FBF"
    for text in ("abc中文def", "中 文 漢字test", "漢" * 70):
        assert _our_tokens(None, text, 1, ng) == _tokdump(None, text, 1, ng)


def _rand_spec(rng):
    """Random charset_table over DISJOINT slots (overlap resolution
    is AddRemaps merge order — deliberately out of scope here)."""
    entries = []
    slots = list(range(0x21, 0x2FF0, 0x60))
    rng.shuffle(slots)
    for slot in slots[: rng.randint(2, 6)]:
        span = rng.randint(0, 30)
        form = rng.random()
        if form < 0.3:
            entries.append(f"U+{slot:X}..U+{slot + span:X}")
        elif form < 0.6:
            dst = slots.pop() if slots else slot + 0x3000
            entries.append(
                f"U+{slot:X}..U+{slot + span:X}->U+{dst:X}..U+{dst + span:X}"
            )
        elif form < 0.8:
            entries.append(f"U+{slot:X}")
        else:
            hi = slot + 2 * rng.randint(0, 10) + 1
            entries.append(f"U+{slot:X}..U+{hi:X}/2")
    return ", ".join(entries)


@pytest.mark.parametrize("seed", range(20))
def test_tokenizer_live_random_charsets(seed):
    """Random charset_table specs (all entry forms incl. the /2
    checkerboard) + random texts: the REAL tokenizer and ours must
    emit identical token streams — live validation of the spec
    parser, the fold table, and the UTF-8 scanner together."""
    rng = random.Random(6000 + seed)
    spec = _rand_spec(rng)
    # texts biased to codepoints the spec touches (else all separators)
    cps = []
    for m in re.finditer(r"U\+([0-9A-F]+)", spec):
        base = int(m.group(1), 16)
        cps.extend(base + d for d in (0, 1, 2, 7, 15))
    cps = [c for c in cps if 0x20 < c < 0x10000]
    for _ in range(10):
        text = "".join(
            rng.choice(
                [chr(rng.choice(cps)), " ", "a", "Z", "\t", chr(rng.randrange(0x21, 0x2000))]
            )
            for _ in range(rng.randint(0, 60))
        )
        got = _our_tokens(spec, text)
        want = _tokdump(spec, text)
        assert got == want, f"spec={spec!r}\ntext={text!r}"


import re  # noqa: E402


# ------------------------------------------------- HTML stripper live
_STRIP_CONFIGS = [
    ("-", "-"),
    ("-", "script, style"),
    ("a=title", "script"),
    ("img=alt,title; a=title", "style, div"),
]


def _strip_both(html, attrs, remove):
    from sphinx_1_spark.functions.stripper import HtmlStripper

    r = run_ref([ref_bin("stripdump"), attrs, remove], "/tmp",
                input=html.encode("utf-8"))
    assert r.returncode == 0, r.stdout.decode()[:300]
    attrs_d = {}
    if attrs != "-":
        for part in attrs.split(";"):
            tag, a = part.split("=", 1)
            attrs_d[tag.strip()] = [x.strip() for x in a.split(",")]
    ours = HtmlStripper(
        remove_elements="" if remove == "-" else remove,
        index_attrs=attrs_d,
    ).strip(html.encode("utf-8"))
    return r.stdout, ours


_TAGS = ["p", "b", "a", "div", "span", "img", "script", "style", "em", "custom"]
_ENTS = ["&amp;", "&lt;", "&gt;", "&nbsp;", "&#228;", "&#x1F600;", "&bogus;", "&", "&#", "&#zz;"]


def _rand_html(rng):
    parts = []
    for _ in range(rng.randint(3, 25)):
        k = rng.random()
        if k < 0.35:
            parts.append(
                " ".join(
                    rng.choices(
                        ["hello", "World", "x1", "foo.bar", "a,b"], 
                        k=rng.randint(1, 4),
                    )
                )
            )
        elif k < 0.6:
            t = rng.choice(_TAGS)
            attrs = ""
            if rng.random() < 0.5:
                val = rng.choice(
                    ['"Link Title"', "'single'", "bare", '"with &amp; ent"']
                )
                attrs = f' {rng.choice(["title", "alt", "href", "x"])}={val}'
            parts.append(f"<{t}{attrs}>")
        elif k < 0.75:
            parts.append(f"</{rng.choice(_TAGS)}>")
        elif k < 0.85:
            parts.append(rng.choice(_ENTS))
        else:
            parts.append(
                rng.choice(
                    [
                        "<!-- comment -->",
                        "<!-- unterminated",
                        "<?php x ?>",
                        "<",
                        ">",
                        "< notatag",
                        "<br/>",
                        "<a",
                    ]
                )
            )
    return " ".join(parts)


@pytest.mark.parametrize("seed", range(6))
def test_stripper_live_quote_soup(seed):
    """Adversarial quote/bracket soup aimed at the whole-tag regex
    fast path (round 5): quotes containing '>', unterminated quotes,
    doubled '>' after known tags, names that prefix known tags, tags
    truncated at EOF — all byte-identical to the real stripper."""
    pieces = [
        '<b title="a>b">x', "<b title='a>b'>y", '<a href="x>', "<b>>",
        '<b q="1" r=\'2\'>t', "<bold>", "<basefont>", "<b.x>", "<b",
        '<em a="unterminated', "</b>>", '<span x=">">',
        '<a href="q" Q>', "<B TITLE='Z>'>w", "<a/>", "<a />",
        '<img alt="keep>this">', "<script>junk</script x>",
        '<style a=">">s</style>', "text&amp;<b>more",
    ]
    rng = random.Random(8100 + seed)
    for _ in range(10):
        html = " ".join(rng.choices(pieces, k=rng.randint(2, 12)))
        attrs, remove = rng.choice(_STRIP_CONFIGS)
        ref, ours = _strip_both(html, attrs, remove)
        assert ref == ours, f"attrs={attrs!r} remove={remove!r}\nhtml={html!r}"


@pytest.mark.parametrize("seed", range(15))
def test_stripper_live_random_html(seed):
    """Random (and deliberately broken) HTML through the REAL
    CSphHTMLStripper vs ours — byte-identical output across
    remove_elements / html_index_attrs configs.  Extends the 500+
    canned goldens to adversarial markup."""
    rng = random.Random(7000 + seed)
    for _ in range(8):
        html = _rand_html(rng)
        attrs, remove = rng.choice(_STRIP_CONFIGS)
        ref, ours = _strip_both(html, attrs, remove)
        assert ref == ours, f"attrs={attrs!r} remove={remove!r}\nhtml={html!r}"


# ---------------------------------------------------- excerpts (live)
def _snip_both(text, words, opts):
    from sphinx_1_spark.operators.excerpts import (
        ExcerptOptions,
        build_excerpt,
    )

    flags = ",".join(
        [f for f in ("exact", "single", "weight", "spaces") if opts.get(f)]
    ) or "none"
    r = run_ref(
        [
            ref_bin("snipdump"),
            words,
            opts.get("before", "<b>"),
            opts.get("after", "</b>"),
            opts.get("sep", " ... "),
            str(opts.get("limit", 256)),
            str(opts.get("around", 5)),
            flags,
        ],
        "/tmp",
        input=text.encode("utf-8"),
    )
    assert r.returncode == 0, r.stdout.decode()[:300]
    ours = build_excerpt(
        text,
        words,
        ExcerptOptions(
            before_match=opts.get("before", "<b>"),
            after_match=opts.get("after", "</b>"),
            chunk_separator=opts.get("sep", " ... "),
            limit=opts.get("limit", 256),
            around=opts.get("around", 5),
            exact_phrase=bool(opts.get("exact")),
            single_passage=bool(opts.get("single")),
            weight_order=bool(opts.get("weight")),
        ),
    )
    return r.stdout.decode("utf-8"), ours


_SNIP_VOCAB = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "and", "then", "some", "more", "words", "here", "again", "sphinx",
    "search", "engine", "index", "query",
]


@pytest.mark.parametrize("seed", range(15))
def test_excerpts_live_random(seed):
    """Random source texts + query words + option mixes through the
    REAL sphBuildExcerpt vs our generator — byte-identical excerpts.
    Extends the canned byte-goldens (test_excerpts.py) to random
    passages/limits/weight-order/exact-phrase combinations."""
    rng = random.Random(8000 + seed)
    for _ in range(6):
        text = " ".join(
            rng.choices(_SNIP_VOCAB, k=rng.randint(10, 120))
        ) + rng.choice(["", ".", "! done"])
        nw = rng.randint(1, 3)
        words = " ".join(rng.sample(_SNIP_VOCAB, nw))
        opts = {
            "limit": rng.choice([0, 20, 40, 64, 120, 256]),
            "around": rng.randint(1, 5),
            "exact": rng.random() < 0.3 and nw > 1,
            "single": rng.random() < 0.3,
            "weight": rng.random() < 0.3,
            "before": rng.choice(["<b>", "[", "**"]),
            "after": rng.choice(["</b>", "]", "**"]),
            "sep": rng.choice([" ... ", " | "]),
        }
        ref, ours = _snip_both(text, words, opts)
        assert ref == ours, f"words={words!r} opts={opts}\ntext={text!r}"


# -------------------------------------------------- morphology (live)
_MORPHS = [
    ("stem_en", 1),
    ("stem_en", 4),
    ("stem_ru", 1),
    ("stem_cz", 1),
    ("soundex", 1),
    ("metaphone", 1),
    ("stem_enru", 1),
    ("none", 1),
    ("stem_en, soundex", 1),
]

_EN_SUFFIXED = [
    "running", "foxes", "cats", "making", "happily", "nationalization",
    "flies", "dogs", "caresses", "ponies", "ties", "agreed", "plastered",
    "motoring", "sing", "conflated", "troubling", "sized", "hopping",
    "tanned", "falling", "hissing", "fizzed", "failing", "filing",
]
_RU_WORDS = ["привет", "бегущий", "книгами", "красивая", "стол", "окно"]


def _stem_both(morph, min_len, words):
    from sphinx_1_spark.functions.morphology import (
        apply_morphology,
        resolve_chain,
    )

    r = run_ref(
        [ref_bin("stemdump"), morph, str(min_len)],
        "/tmp",
        input=("\n".join(words) + "\n").encode("utf-8"),
    )
    assert r.returncode == 0, r.stdout.decode()[:300]
    ref = r.stdout.decode("utf-8").splitlines()
    chain = resolve_chain(
        [m for m in re.split(r"[\s,]+", morph) if m]
    )
    ours = [apply_morphology(w, chain, min_len) for w in words]
    return ref, ours


@pytest.mark.parametrize("morph,min_len", _MORPHS)
def test_morphology_live_fixed(morph, min_len):
    words = _EN_SUFFIXED + _RU_WORDS + ["a", "ab", "x1y2", "12345"]
    ref, ours = _stem_both(morph, min_len, words)
    assert ref == ours, morph


@pytest.mark.parametrize("seed", range(10))
def test_morphology_live_random(seed):
    """Random lowercase words (with suffix-ish tails biased in)
    through the REAL dict morphology vs our ports — supplements the
    9.5k offline golden pairs with live random coverage, incl. the
    min_stemming_len guard and chained processors."""
    rng = random.Random(9000 + seed)
    suffixes = ["ing", "ed", "es", "s", "ies", "ly", "ational", "izer",
                "fulness", "iveness", "ement", "ion", ""]
    words = []
    for _ in range(60):
        stem = "".join(
            rng.choices(string.ascii_lowercase, k=rng.randint(1, 9))
        )
        words.append(stem + rng.choice(suffixes))
    for morph, min_len in (("stem_en", 1), ("stem_en", 3),
                           ("soundex", 1), ("metaphone", 1),
                           ("stem_cz", 1), ("stem_en, soundex", 1)):
        ref, ours = _stem_both(morph, min_len, words)
        assert ref == ours, f"morph={morph} min={min_len}"


# ------------------------------------------------- expressions (live)
def test_expressions_live_random(spark):
    """Random typed expressions through the REAL sphinxexpr engine
    (exprdump harness, fixed ai/bi/cb/df schema) vs our
    parse_expression -> Catalyst evaluation: result TYPE identical,
    int/bigint values exact, floats within 1 ulp of float32.  Reuses
    test_expr_fuzz's generator and its pure-Python oracle as the
    Poison filter (zero-div / saturation cases would SIGFPE or
    diverge per C UB — same exclusions as the offline fuzz)."""
    import numpy as np

    import test_expr_fuzz as EF
    from sphinx_1_spark.functions.exprparse import parse_expression

    # int attrs stay NON-NEGATIVE here: SPH_ATTR_INTEGER is an
    # unsigned DWORD (SURVEY 1.2; a real source can't store -6, and
    # the reference promotes the raw DWORD — Int64Eval of "-6" would
    # be 4294967290).  Values 0..2^31-1 are identical under both
    # conventions; signed int attrs are this engine's documented
    # extension, covered by the offline fuzz.
    rng0 = random.Random(777)
    rows = []
    for i in range(48):
        rows.append(
            (
                i + 1,
                rng0.randint(0, 50),  # ai
                rng0.choice((0, 1, 2, rng0.randint(0, 9))),  # bi
                rng0.choice(
                    (rng0.randint(-50, 50), 3_000_000_000 + i, -3_000_000_000)
                ),  # cb: bigint IS signed in the reference (test_50)
                rng0.randint(-320, 320) / 8.0,  # df
            )
        )
    df = spark.createDataFrame(
        rows, "docid long, ai int, bi int, cb long, df float"
    ).cache()
    row_dicts = [
        dict(zip(("docid", "ai", "bi", "cb", "df"), r)) for r in rows
    ]
    stdin_rows = "".join(
        f"{r[0]} 0 {r[1]} {r[2]} {r[3]} {r[4]!r}\n" for r in rows
    ).encode()

    rng = random.Random(314159)
    cases = []
    attempts = 0
    while len(cases) < 40 and attempts < 1200:
        attempts += 1
        ast = EF.gen(rng)
        s = EF.render(ast)
        try:
            for rd in row_dicts:
                EF.ev(ast, rd)
        except EF.Poison:
            continue
        cases.append((s, EF.node_type(ast)))
    assert len(cases) >= 35

    # our side: one batched Spark evaluation
    cols = []
    for j, (s, t) in enumerate(cases):
        col, got_t = parse_expression(s, EF.ATTRS, docid_col="docid")
        assert got_t == t, (s, got_t, t)
        cols.append(col.alias(f"v{j}"))
    out = df.orderBy("docid").select(*cols).collect()

    for j, (s, t) in enumerate(cases):
        r = run_ref([ref_bin("exprdump"), s], "/tmp", input=stdin_rows)
        ref_out = r.stdout.decode().splitlines()
        assert r.returncode == 0, f"{s!r}: {ref_out[:2]}"
        assert ref_out[0].split()[1] == t, (s, ref_out[0], t)
        vals = ref_out[1:]
        assert len(vals) == len(rows), s
        for rowi, (line, spark_row) in enumerate(zip(vals, out)):
            g = spark_row[f"v{j}"]
            if t == "float":
                e = float(line)
                ok = (
                    g == e
                    or abs(np.float32(g) - np.float32(e))
                    <= abs(np.spacing(np.float32(e)))
                )
            else:
                ok = int(line) == g
            assert ok, f"{s!r} (type {t}) row {rowi}: ref {line} ours {g!r}"
