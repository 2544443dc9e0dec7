#!/usr/bin/env python
"""spelldump — expand an ispell/MySpell dictionary + affix file into
the ``form > lemma`` wordforms file the indexer consumes (the
reference tool, src/spelldump.cpp:1-1190).

Semantic port of the reference's expansion, byte-for-byte on its own
grammar quirks (all cited inline):

* affix format auto-detect (SFX/PFX/REP -> MySpell, case-insensitive
  prefixes/suffixes/flag -> ISpell, spelldump.cpp:475-495);
* ISpell conditions/strip/append are space-and-hyphen-stripped and
  lowercased; MySpell fields are taken verbatim (Strip is only called
  on the ISpell path, spelldump.cpp:664-666 vs :725-737);
* the ``\\?HH`` 4-char escape in character sets (one ignored char +
  exactly two hex digits, GetWordchar spelldump.cpp:14-35);
* IsInSet's inverted RANGE quirk: ``^a-z`` returns false for letters
  outside the range too — only an in-range letter answers, everything
  else falls through to the final ``return false``
  (spelldump.cpp:38-75);
* CheckPrefix's set-condition stall: the condition cursor is never
  advanced past a ``[...]`` set, so every remaining word character is
  checked against that same set and any condition text after it is
  unreachable (spelldump.cpp:341-372 — the ``else`` branch has no
  ``iCondI = iRangeEnd + 1``);
* a rule whose condition stripped down to empty applies WITHOUT
  strip/append — Apply returns true before touching the word
  (spelldump.cpp:247-250);
* cross-products pair a cross prefix rule with a cross suffix rule
  only for flag positions AFTER the first flag (iFlag2 = iFlag1+1,
  spelldump.cpp:1113), applied on top of rule1's output, and only
  when the affix file has BOTH cross prefixes and cross suffixes
  (CheckCrosses, spelldump.cpp:536-546);
* fgets(512) line chunking: input lines longer than 511 bytes split
  into multiple parse units exactly like the reference's buffer
  (MAX_STR_LENGTH, spelldump.cpp:10);
* output modes default (exact-or-longest), last, debug, duplicates
  (spelldump.cpp:1135-1180), keys sorted bytewise (strcoll in the
  untouched "C" locale == strcmp).

Case conversion: ``wordchars`` pairs from the affix file take
priority (dictionary-defined charset, spelldump.cpp:855-877); a ``-c
charset_file`` parses a sphinx charset_table spec through our own
parser (the reference calls sphParseCharset, spelldump.cpp:885-895);
the setlocale() code-page path is represented by plain ASCII tolower
plus the reference's warning — byte-exact C locale tables are not
reproducible portably and the reference itself warns when the locale
adds nothing (spelldump.cpp:915-940).

Usage: spelldump [options] <dictionary> <affix> [result] [locale-name]
Options: -c <file>  case conversion charset file
         -m <mode>  default | last | debug | duplicates
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_STR_LENGTH = 512  # spelldump.cpp:10 — fgets buffer, minus one for NUL

HEX = b"0123456789abcdefABCDEF"
C_SPACE = b" \t\n\v\f\r"  # C isspace() — NOT Python's (no U+00A0 etc.)


def fgets_lines(data: bytes, n: int = MAX_STR_LENGTH):
    """Iterate like repeated fgets(buf, n): up to n-1 bytes or through
    the first newline — long lines split into multiple units."""
    i = 0
    while i < len(data):
        nl = data.find(b"\n", i, i + n - 1)
        j = (nl + 1) if nl >= 0 else min(i + n - 1, len(data))
        yield data[i:j]
        i = j


def get_wordchar(s: bytes, i: int) -> tuple[int, int]:
    """GetWordchar (spelldump.cpp:14-35): one set character, decoding
    the 4-byte ``\\?HH`` escape (char after the backslash is ignored,
    the next two must both be hex, value <= 255).  Returns (0, i) at
    end of string or on a malformed escape."""
    if i >= len(s):
        return 0, i
    if s[i] == ord("\\"):
        if i + 3 >= len(s):
            return 0, i
        h = s[i + 2 : i + 4]
        if h[0:1] not in HEX or h[1:2] not in HEX:
            return 0, i
        return int(h, 16), i + 4
    return s[i], i + 1


def is_in_set(letter: int, s: bytes) -> bool:
    """IsInSet (spelldump.cpp:38-75).  Keeps the inverted-range quirk:
    with '^' and a '-' present, only an IN-range letter answers
    (!invert); everything else returns false."""
    if s is None:
        return False
    invert = s.startswith(b"^")
    if invert:
        s = s[1:]
    sep = s.find(b"-")
    if sep >= 0:
        r1, _ = get_wordchar(s, 0)
        r2, _ = get_wordchar(s, sep + 1)
        if min(r1, r2) <= letter <= max(r1, r2):
            return not invert
        return False  # the reference's fallthrough — even when inverted
    i = 0
    while True:
        ch, i = get_wordchar(s, i)
        if ch == 0:
            return invert
        if ch == letter:
            return not invert


def get_set_min_max(s: bytes) -> tuple[int, int] | None:
    """GetSetMinMax (spelldump.cpp:79-99): min/max over the decoded
    set, skipping '-' except in first position (the reference seeds
    min/max from the first char unconditionally)."""
    if not s:
        return None
    mn, i = get_wordchar(s, 0)
    mx = mn
    while True:
        ch, i = get_wordchar(s, i)
        if ch == 0:
            break
        if ch != ord("-"):
            mn, mx = min(mn, ch), max(mx, ch)
    if mn == 0 or mx == 0:
        return None
    return mn, mx


RULE_PREFIXES = 1
RULE_SUFFIXES = 2


class AffixRule:
    """CISpellAffixRule (spelldump.cpp:203-414)."""

    def __init__(self, rule_type, flag, cross, condition, strip, append):
        self.rule_type = rule_type
        self.flag = flag  # one byte
        self.cross = cross
        self.condition = condition
        self.strip = strip
        self.append = append

    def is_prefix(self) -> bool:
        return self.rule_type == RULE_PREFIXES

    def apply(self, word: bytes) -> bytes | None:
        """Apply (spelldump.cpp:246-278): None = rule doesn't fit.
        An empty condition succeeds WITHOUT transforming the word."""
        if not self.condition:
            return word
        if not word:
            return None
        dot = self.condition == b"."
        if self.rule_type == RULE_SUFFIXES:
            if not dot and not self._check_suffix(word):
                return None
            return self._strip_append_suffix(word)
        if not dot and not self._check_prefix(word):
            return None
        return self._strip_append_prefix(word)

    def _check_suffix(self, word: bytes) -> bool:
        """CheckSuffix (spelldump.cpp:281-313): right-to-left, ']'
        closes a set whose '[' is found scanning backwards."""
        cond = self.condition
        ci = len(cond) - 1
        i = len(word) - 1
        while ci >= 0 and i >= 0:
            if cond[ci] != ord("]"):
                if cond[ci] != word[i]:
                    return False
                ci -= 1
            else:
                start = cond.rfind(b"[", 0, ci)
                if start < 0:
                    return False
                if not is_in_set(word[i], cond[start + 1 : ci]):
                    return False
                ci = start - 1
            i -= 1
        return True

    def _strip_append_suffix(self, word: bytes) -> bytes | None:
        """StripAppendSuffix (spelldump.cpp:316-338)."""
        if self.strip:
            if len(word) < len(self.strip) or not word.endswith(self.strip):
                return None
        return word[: len(word) - len(self.strip)] + self.append

    def _check_prefix(self, word: bytes) -> bool:
        """CheckPrefix (spelldump.cpp:341-372).  Faithfully keeps the
        reference's stall: the condition cursor never moves past a
        '[' set, so every remaining word char tests against that set
        and any later condition text is unreachable."""
        cond = self.condition
        ci = 0
        for i in range(len(word)):
            if ci >= len(cond):
                break
            if cond[ci] != ord("["):
                if cond[ci] != word[i]:
                    return False
                ci += 1
            else:
                end = cond.find(b"]", ci)
                if end < 0:
                    return False
                if not is_in_set(word[i], cond[ci + 1 : end]):
                    return False
                # NO ci advance — the reference never moves past the set
        return True

    def _strip_append_prefix(self, word: bytes) -> bytes | None:
        """StripAppendPrefix (spelldump.cpp:375-397): strip must occur
        at position 0 (strstr anchored compare)."""
        if self.strip and not word.startswith(self.strip):
            return None
        return self.append + word[len(self.strip) :]


class Affix:
    """CISpellAffix (spelldump.cpp:430-941): format detect, the two
    loaders, wordchars charset, and the case-conversion resolution
    order (dictionary charset > -c charset file > locale > warning)."""

    def __init__(self, locale: str = "", charset_file: str = ""):
        self.rules: list[AffixRule] = []
        self.charset = [0] * 256  # m_dCharset: upper byte -> lower byte
        self.locale = locale
        self.charset_file = charset_file
        self.use_dict_conversion = False
        self._lowercaser = None
        self._first_case_conv = True
        self.check_crosses = False
        self.messages: list[str] = []  # the reference's printf stream

    # -------------------------------------------------------- loading
    def load(self, path: str) -> bool:
        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError:
            return False
        fmt = self._detect_format(data)
        if fmt is None:
            self._say("Failed to detect affix file format")
            ok = False
        else:
            self._say(f"Using {fmt} affix file format")
            ok = (
                self._load_myspell(data)
                if fmt == "MySpell"
                else self._load_ispell(data)
            )
        have_cross_prefix = any(
            r.is_prefix() and r.cross for r in self.rules
        )
        have_cross_suffix = any(
            not r.is_prefix() and r.cross for r in self.rules
        )
        self.check_crosses = have_cross_prefix and have_cross_suffix
        return ok

    def _say(self, msg: str) -> None:
        self.messages.append(msg)
        print(msg)

    def _detect_format(self, data: bytes) -> str | None:
        """DetectFormat (spelldump.cpp:475-495): first marker wins."""
        for line in fgets_lines(data):
            if line.startswith((b"SFX", b"PFX", b"REP")):
                return "MySpell"
            low = line[:9].lower()
            if low.startswith((b"prefixes", b"suffixes", b"flag")):
                return "ISpell"
        return None

    def _load_ispell(self, data: bytes) -> bool:
        """LoadISpell (spelldump.cpp:549-673)."""
        rule_type = 0
        flag = 0
        cross = False
        for n, raw in enumerate(fgets_lines(data), 1):
            line = raw
            low = line.lower()
            if low.startswith(b"prefixes"):
                rule_type = RULE_PREFIXES
                continue
            if low.startswith(b"suffixes"):
                rule_type = RULE_SUFFIXES
                continue
            if low.startswith(b"wordchars"):
                rest = line[9:].strip(b" \t\r\n")
                parts = rest.split(None, 1)
                if len(parts) < 2:
                    self._say(
                        f"WARNING: Line {n}: invalid 'wordchars' statement"
                    )
                    continue
                lo, up = parts[0], parts[1].split(None, 1)[0]
                if not self._add_to_charset(lo, up):
                    self._say(
                        f"WARNING: Line {n}: cannot add to charset: "
                        f"'{lo.decode('latin1')}' '{up.decode('latin1')}'"
                    )
                continue
            if low.startswith(b"flag"):
                if rule_type == 0:
                    self._say(
                        f"WARNING: Line {n}: 'flag' appears before "
                        "preffixes or suffixes"
                    )
                    continue
                rest = line[4:].lstrip(C_SPACE)
                cross = rest.startswith(b"*")
                pick = rest[1:2] if cross else rest[0:1]
                flag = pick[0] if pick else 0
                continue
            if rule_type == 0:
                continue
            hash_pos = line.find(b"#")
            if hash_pos >= 0:
                line = line[:hash_pos]
            if not line.rstrip(b"\r\n"):
                continue
            fields = self._scan_rule(line)
            if fields is None:
                continue
            condition, strip, append = (self._strip_field(x) for x in fields)
            self.rules.append(
                AffixRule(rule_type, flag, cross, condition, strip, append)
            )
        return True

    @staticmethod
    def _scan_rule(line: bytes) -> tuple[bytes, bytes, bytes] | None:
        """sscanf("%[^>\\n]>%[^,\\n],%[^\\n]") (spelldump.cpp:655):
        2 fields means no strip-string — the second field is the
        append."""
        line = line.split(b"\n", 1)[0]
        gt = line.find(b">")
        if gt <= 0:  # %[^>\n] must match at least one char
            return None
        condition = line[:gt]
        rest = line[gt + 1 :]
        comma = rest.find(b",")
        if comma < 0:
            if not rest:
                return None
            return condition, b"", rest  # nFields==2: strip="", append
        if comma == 0:
            # "%[^,\n]" matches nothing -> sscanf stops at 1 field
            return None
        if not rest[comma + 1 :]:
            # trailing comma: "%[^\n]" after ',' matches nothing ->
            # nFields==2, the middle field becomes the append
            return condition, b"", rest[:comma]
        return condition, rest[:comma], rest[comma + 1 :]

    def _strip_field(self, text: bytes) -> bytes:
        """Strip (spelldump.cpp:824-846): drop spaces and '-', then
        lowercase every byte through the active conversion."""
        kept = bytes(
            b for b in text if b not in C_SPACE and b != ord("-")
        )
        return bytes(self._to_lower(b) for b in kept)

    def _load_myspell(self, data: bytes) -> bool:
        """LoadMySpell (spelldump.cpp:676-745): headers carry
        (flag, combine, count); '0' fields mean empty; fields are NOT
        stripped or lowercased."""
        rule_type = 0
        flag = 0
        count = 0
        self._combine = False  # cCombine starts 0 (spelldump.cpp:685)
        for n, raw in enumerate(fgets_lines(data), 1):
            new_rule = 0
            if raw.startswith(b"PFX"):
                new_rule, mode = RULE_PREFIXES, "prefix"
            elif raw.startswith(b"SFX"):
                new_rule, mode = RULE_SUFFIXES, "suffix"
            if not new_rule:
                continue
            rest = raw[3:].strip(b" \t\r\n")
            if new_rule != rule_type:
                if count:
                    self._say(
                        f"WARNING: Line {n}: Premature end of entries."
                    )
                parts = rest.split()
                # sscanf("%c %c %d"): two single-char tokens then an
                # integer (leading digits, like %d)
                digits = (
                    re.match(rb"[+-]?\d+", parts[2])
                    if len(parts) >= 3
                    else None
                )
                if (
                    digits
                    and len(parts[0]) == 1
                    and len(parts[1]) == 1
                ):
                    flag, combine, count = (
                        parts[0][0],
                        parts[1],
                        int(digits.group(0)),
                    )
                    self._combine = combine == b"Y"
                else:
                    self._say(
                        f"WARNING; Line {n}: Malformed {mode} header"
                    )
                rule_type = new_rule
            else:
                parts = rest.split()
                if len(parts) >= 4:
                    new_flag, remove, append, condition = parts[:4]
                    if new_flag[0] != flag:
                        self._say(
                            f"WARNING: Line {n}: Flag character mismatch"
                        )
                    if remove == b"0":
                        remove = b""
                    if append == b"0":
                        append = b""
                    self.rules.append(
                        AffixRule(
                            rule_type,
                            flag,
                            self._combine,
                            condition,
                            remove,
                            append,
                        )
                    )
                else:
                    self._say(f"WARNING: Line {n}: Malformed {mode} rule")
                count -= 1
                if count == 0:
                    rule_type = 0
        return True

    # ---------------------------------------------------- case tables
    def _add_to_charset(self, lo: bytes, up: bytes) -> bool:
        """AddToCharset (spelldump.cpp:766-815): both args either
        [sets] (paired by offset from each set's min) or single
        (possibly escaped) characters."""
        set_l = lo.startswith(b"[") and lo.endswith(b"]")
        set_u = up.startswith(b"[") and up.endswith(b"]")
        if set_l != set_u:
            return False
        if set_l:
            lo, up = lo[1:-1], up[1:-1]
            mm_l = get_set_min_max(lo)
            mm_u = get_set_min_max(up)
            if mm_l is None or mm_u is None:
                return False
            (min_l, max_l), (min_u, max_u) = mm_l, mm_u
            if max_u - min_u != max_l - min_l:
                return False
            for i in range(max_l - min_l + 1):
                if is_in_set(min_l + i, lo) and is_in_set(min_u + i, up):
                    self.charset[min_u + i] = min_l + i
        else:
            if len(lo) > 4 or len(up) > 4:
                return False
            self.charset[get_wordchar(up, 0)[0]] = get_wordchar(lo, 0)[0]
        self.use_dict_conversion = True
        return True

    def _to_lower(self, b: int) -> int:
        """ToLowerCase (spelldump.cpp:849-876): dictionary charset >
        -c charset file > locale/plain tolower."""
        if self._first_case_conv:
            self._load_locale()
            self._first_case_conv = False
        if self.use_dict_conversion:
            return self.charset[b] or b
        if self._lowercaser is not None:
            return self._lowercaser.get(b, 0) or b
        return ord(chr(b).lower()) if b < 128 else b

    def _load_locale(self) -> None:
        """LoadLocale (spelldump.cpp:879-941).  The -c path parses a
        sphinx charset_table spec with our own parser (the reference
        calls sphParseCharset); the setlocale code-page path prints
        the reference's warning and keeps ASCII tolower — C locale
        tables for single-byte code pages aren't portably
        reproducible in-process."""
        if self.use_dict_conversion:
            self._say("Using dictionary-defined character set")
            return
        if self.charset_file:
            try:
                with open(self.charset_file, "r") as f:
                    spec = f.readline()
            except OSError:
                self._say(f"Failed to open '{self.charset_file}'")
                return
            self._say(f"Using charater set from '{self.charset_file}'")
            try:
                from sphinx_1_spark.functions.charset import (
                    build_fold_table,
                )

                table = build_fold_table(spec)
                self._lowercaser = {
                    cp: int(table[cp])
                    for cp in range(256)
                    if cp < len(table) and table[cp]
                }
            except Exception:
                self._say(
                    f"Failed to parse charset from '{self.charset_file}'"
                )
            return
        if self.locale:
            self._say(
                "WARNING: user-defined locale provides the same case "
                'conversion as the default "C" locale'
            )
            return
        self._say("WARNING: no character set specified")


def load_dict(path: str) -> list[tuple[bytes, bytes]]:
    """CISpellDict::Load (spelldump.cpp:120-175): per line, word up to
    '/' (or first whitespace), flags after '/' up to whitespace.
    Returns [(word, flags)] in file order — the count line at the top
    of real ispell dicts becomes an entry too, like the reference."""
    with open(path, "rb") as f:
        data = f.read()
    # C loop: advance from the start until the first C-isspace byte —
    # a leading-space line therefore yields an EMPTY word
    lead = re.compile(b"[^" + re.escape(C_SPACE) + b"]*")
    out = []
    for raw in fgets_lines(data):
        line = raw
        # trailing isspace() strip (spelldump.cpp:140-142)
        while line and line[-1:] in (b" ", b"\t", b"\n", b"\v", b"\f", b"\r"):
            line = line[:-1]
        slash = line.find(b"/")
        if slash < 0:
            out.append((lead.match(line).group(0), b""))
        else:
            out.append(
                (line[:slash], lead.match(line[slash + 1 :]).group(0))
            )
    return out


# ------------------------------------------------------------- modes
M_DEBUG, M_DUPLICATES, M_LAST, M_EXACT_OR_LONGEST = range(4)
M_DEFAULT = M_EXACT_OR_LONGEST
MODE_NAMES = {M_DEBUG: "debug", M_DUPLICATES: "duplicates", M_LAST: "last"}


def expand(
    entries: list[tuple[bytes, bytes]], affix: Affix
) -> dict[bytes, list[tuple[bytes, bytes]]]:
    """The main expansion loop (spelldump.cpp:1076-1129): every word
    maps to itself; every flag-selected rule that applies emits
    (form -> word, rule flag); cross-product pairs (prefix x suffix,
    both cross, later flag positions only) apply rule2 on rule1's
    output.  Returns {form: [(lemma, rules_str)] in emit order}."""
    word_map: dict[bytes, list[tuple[bytes, bytes]]] = {}

    def emit(frm: bytes, to: bytes, ra: int = 0, rb: int = 0) -> None:
        rules = bytes(x for x in (ra, rb) if x)
        word_map.setdefault(frm, []).append((to, rules))

    for word, flags in entries:
        emit(word, word)
        if not flags:
            continue
        for i1 in range(len(flags)):
            for rule1 in affix.rules:
                if rule1.flag != flags[i1]:
                    continue
                w1 = rule1.apply(word)
                if w1 is None:
                    continue
                emit(w1, word, rule1.flag)
                if not affix.check_crosses or not rule1.cross:
                    continue
                for i2 in range(i1 + 1, len(flags)):
                    for rule2 in affix.rules:
                        if (
                            not rule2.cross
                            or rule2.flag != flags[i2]
                            or rule2.is_prefix() == rule1.is_prefix()
                        ):
                            continue
                        w2 = rule2.apply(w1)
                        if w2 is not None:
                            emit(w2, word, rule1.flag, rule2.flag)
    return word_map


def write_result(
    word_map: dict[bytes, list[tuple[bytes, bytes]]],
    out_path: str,
    mode: int = M_DEFAULT,
) -> None:
    """Output (spelldump.cpp:1133-1181): keys bytewise-sorted (strcoll
    in the untouched C locale), conflict resolution per mode."""
    with open(out_path, "wb") as f:
        for key in sorted(word_map):
            words = word_map[key]
            if mode == M_LAST:
                f.write(key + b" > " + words[-1][0] + b"\n")
            elif mode == M_EXACT_OR_LONGEST:
                match, length = 0, 0
                for i, (to, _r) in enumerate(words):
                    if to == key:
                        match = i
                        break
                    if len(to) > length:
                        length = len(to)
                        match = i
                f.write(key + b" > " + words[match][0] + b"\n")
            else:  # debug / duplicates share the dump format
                if mode == M_DUPLICATES and len(words) == 1:
                    continue
                for to, rules in words:
                    f.write(
                        key
                        + b" > "
                        + to
                        + b" "
                        + rules
                        + b"/"
                        + str(len(words)).encode()
                        + b"\n"
                    )


def main(argv: list[str]) -> int:
    mode = M_DEFAULT
    charset_file = ""
    use_custom_charset = False
    print("spelldump, an ispell dictionary dumper\n")
    i = 1
    while i < len(argv):
        if argv[i] == "-c":
            i += 1
            if i == len(argv):
                break
            use_custom_charset = True
            charset_file = argv[i]
        elif argv[i] == "-m":
            i += 1
            if i == len(argv):
                break
            name = argv[i]
            lookup = {
                "debug": M_DEBUG,
                "duplicates": M_DUPLICATES,
                "last": M_LAST,
                "default": M_DEFAULT,
            }
            if name not in lookup:
                print(f"Unrecognized mode: {name}")
                return 1
            mode = lookup[name]
        else:
            break
        i += 1

    rest = argv[i:]
    locale = ""
    result = "result.txt"
    if len(rest) < 2 or len(rest) > 4:
        print(
            "Usage: spelldump [options] <dictionary> <affix> [result] "
            "[locale-name]\n\n"
            "Options:\n"
            "-c <file>\tuse case convertion defined in <file>\n"
            "-m <mode>\toutput (conflict resolution) mode:\n"
            "\t\tdefault - try to guess the best way to resolve a "
            "conflict\n"
            "\t\tlast - choose last entry\n"
            "\t\tdebug - dump all mappings (with rules)\n"
            "\t\tduplicates - dump duplicate mappings only (with rules)"
        )
        return 1
    dict_path, affix_path = rest[0], rest[1]
    if len(rest) >= 3:
        result = rest[2]
    if len(rest) == 4:
        locale = rest[3]

    print("Loading dictionary...")
    try:
        entries = load_dict(dict_path)
    except OSError:
        print(f"FATAL: Error loading dictionary file '{dict_path}'")
        return 1
    print("Loading affix file...")
    affix = Affix(locale, charset_file if use_custom_charset else "")
    if not affix.load(affix_path):
        print(f"FATAL: Error loading affix file '{affix_path}'")
        return 1
    if mode != M_DEFAULT:
        print(f"Output mode: {MODE_NAMES[mode]}")
    word_map = expand(entries, affix)
    print(f"Dictionary words processed: {len(entries)}")
    try:
        write_result(word_map, result, mode)
    except OSError:
        print(f"FATAL: Unable to open '{result}' for writing")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
