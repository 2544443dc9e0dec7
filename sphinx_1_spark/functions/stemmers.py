"""Russian / Czech / Double-Metaphone morphology processors.

Behavioral ports of the reference processors, golden-pinned against
the compiled reference over systematic suffix matrices + fuzz
(tests/fixtures/golden_{ru,cz,metaphone}.tsv):

  * stem_ru_utf8   — src/sphinxstemru.cpp:74-127 + sphinxstemru.inl
                     (the UTF-8 build: the word is an array of 16-bit
                     units = little-endian UTF-8 byte PAIRS; ASCII
                     tails misalign exactly like the reference)
  * stem_cz        — src/sphinxstemcz.cpp:28-203 (byte-level suffix
                     clamp + palatalize rules)
  * stem_dmetaphone— src/sphinxmetaphone.cpp:160-705 (Sphinx's Double
                     Metaphone: primary code only, non-Latin words
                     pass through untouched)

All three operate on the token's UTF-8 bytes; str wrappers round-trip
via surrogateescape so byte-truncation quirks survive.
"""

from __future__ import annotations


def _u(ch: str) -> int:
    """Cyrillic char -> 16-bit LE UTF-8 unit (RussianAlphabetUTF8_t)."""
    b = ch.encode("utf-8")
    assert len(b) == 2
    return b[0] | (b[1] << 8)


A, B, V, G, D, E = _u("а"), _u("б"), _u("в"), _u("г"), _u("д"), _u("е")
YO, ZH, Z, I, IY, K = _u("ё"), _u("ж"), _u("з"), _u("и"), _u("й"), _u("к")
L, M, N, O, P, R = _u("л"), _u("м"), _u("н"), _u("о"), _u("п"), _u("р")
S, T, U, F, H, TS = _u("с"), _u("т"), _u("у"), _u("ф"), _u("х"), _u("ц")
CH, SH, SCH, TVY = _u("ч"), _u("ш"), _u("щ"), _u("ъ")
Y, MYA, EE, YU, YA = _u("ы"), _u("ь"), _u("э"), _u("ю"), _u("я")

_RU_VOWELS = frozenset((A, E, YO, I, O, U, Y, EE, YU, YA))

# (index table, entry table) pairs; the index groups entries by the
# suffix's LAST unit; a group match that returns remove=0 still stops
# the scan (the TS3(A,E,M)-style blocker entries rely on this).
_RU_ADJ_I = ((E, 4), (I, 2), (IY, 4), (M, 7), (O, 2), (U, 2), (H, 2), (YU, 4), (YA, 4))
_RU_ADJ = (
    ((E, E), 2), ((I, E), 2), ((Y, E), 2), ((O, E), 2),
    ((I, M, I), 3), ((Y, M, I), 3),
    ((E, IY), 2), ((I, IY), 2), ((Y, IY), 2), ((O, IY), 2),
    ((A, E, M), 0), ((U, E, M), 0), ((YA, E, M), 0),
    ((E, M), 2), ((I, M), 2), ((Y, M), 2), ((O, M), 2),
    ((E, G, O), 3), ((O, G, O), 3),
    ((E, M, U), 3), ((O, M, U), 3),
    ((I, H), 2), ((Y, H), 2),
    ((E, YU), 2), ((O, YU), 2), ((U, YU), 2), ((YU, YU), 2),
    ((A, YA), 2), ((YA, YA), 2),
)

_RU_PART_I = ((A, 3), (M, 1), (N, 3), (O, 3), (Y, 3), (SH, 4), (SCH, 5))
_RU_PART = (
    ((A, N, N, A), 2), ((E, N, N, A), 2), ((YA, N, N, A), 2),
    ((YA, E, M), 2),
    ((A, N, N), 1), ((E, N, N), 1), ((YA, N, N), 1),
    ((A, N, N, O), 2), ((E, N, N, O), 2), ((YA, N, N, O), 2),
    ((A, N, N, Y), 2), ((E, N, N, Y), 2), ((YA, N, N, Y), 2),
    ((A, V, SH), 2), ((I, V, SH), 3), ((Y, V, SH), 3), ((YA, V, SH), 2),
    ((A, YU, SCH), 2), ((A, SCH), 1), ((YA, YU, SCH), 2), ((YA, SCH), 1),
    ((U, YU, SCH), 3),
)

_RU_VERB_I = (
    (A, 7), (E, 9), (I, 4), (IY, 4), (L, 4), (M, 5), (O, 7), (T, 9),
    (Y, 3), (MYA, 10), (YU, 4), (YA, 1),
)
_RU_VERB = (
    ((A, L, A), 3), ((A, N, A), 3), ((YA, L, A), 3), ((YA, N, A), 3),
    ((I, L, A), 3), ((Y, L, A), 3), ((E, N, A), 3),
    ((A, E, T, E), 4), ((A, IY, T, E), 4), ((MYA, T, E), 3),
    ((U, E, T, E), 4), ((YA, E, T, E), 4), ((YA, IY, T, E), 4),
    ((E, IY, T, E), 4), ((U, IY, T, E), 4), ((I, T, E), 3),
    ((A, L, I), 3), ((YA, L, I), 3), ((I, L, I), 3), ((Y, L, I), 3),
    ((A, IY), 2), ((YA, IY), 2), ((E, IY), 2), ((U, IY), 2),
    ((A, L), 2), ((YA, L), 2), ((I, L), 2), ((Y, L), 2),
    ((A, E, M), 3), ((YA, E, M), 3), ((U, E, M), 3), ((I, M), 2), ((Y, M), 2),
    ((A, L, O), 3), ((A, N, O), 3), ((YA, L, O), 3), ((YA, N, O), 3),
    ((I, L, O), 3), ((Y, L, O), 3), ((E, N, O), 3),
    ((A, E, T), 3), ((A, YU, T), 3), ((YA, E, T), 3), ((YA, YU, T), 3),
    ((YA, T), 2), ((U, E, T), 3), ((U, YU, T), 3), ((I, T), 2), ((Y, T), 2),
    ((A, N, Y), 3), ((YA, N, Y), 3), ((E, N, Y), 3),
    ((A, E, SH, MYA), 4), ((U, E, SH, MYA), 4), ((YA, E, SH, MYA), 4),
    ((A, T, MYA), 3), ((E, T, MYA), 3), ((I, T, MYA), 3), ((U, T, MYA), 3),
    ((Y, T, MYA), 3), ((I, SH, MYA), 3), ((YA, T, MYA), 3),
    ((A, YU), 2), ((U, YU), 2), ((YA, YU), 2), ((YU,), 1),
    ((U, YA), 2),
)

_RU_DEAR_I = (
    (K, 3), (A, 2), (V, 2), (E, 2), (I, 4), (IY, 2), (M, 4), (O, 2),
    (U, 2), (H, 2), (YU, 2),
)
_RU_DEAR = (
    ((CH, E, K), 3), ((CH, O, K), 3), ((N, O, K), 3),
    ((CH, K, A), 3), ((N, K, A), 3),
    ((CH, K, O, V), 4), ((N, K, O, V), 4),
    ((CH, K, E), 3), ((N, K, E), 3),
    ((CH, K, I), 3), ((N, K, I), 3),
    ((CH, K, A, M, I), 5), ((N, K, A, M, I), 5),
    ((CH, K, O, IY), 4), ((N, K, O, IY), 4),
    ((CH, K, A, M), 4), ((N, K, A, M), 4),
    ((CH, K, O, M), 4), ((N, K, O, M), 4),
    ((CH, K, O), 3), ((N, K, O), 3),
    ((CH, K, U), 3), ((N, K, U), 3),
    ((CH, K, A, H), 4), ((N, K, A, H), 4),
    ((CH, K, O, YU), 4), ((N, K, O, YU), 4),
)

_RU_NOUN_I = (
    (A, 1), (V, 2), (E, 3), (I, 6), (IY, 4), (M, 5), (O, 1), (U, 1),
    (H, 3), (Y, 1), (MYA, 1), (YU, 3), (YA, 3),
)
_RU_NOUN = (
    ((A,), 1),
    ((E, V), 2), ((O, V), 2),
    ((I, E), 2), ((MYA, E), 2), ((E,), 1),
    ((I, YA, M, I), 4), ((YA, M, I), 3), ((A, M, I), 3),
    ((E, I), 2), ((I, I), 2), ((I,), 1),
    ((I, E, IY), 3), ((E, IY), 2), ((O, IY), 2), ((I, IY), 2),
    ((I, YA, M), 3), ((YA, M), 2), ((I, E, M), 3), ((A, M), 2), ((O, M), 2),
    ((O,), 1),
    ((U,), 1),
    ((A, H), 2), ((I, YA, H), 3), ((YA, H), 2),
    ((Y,), 1),
    ((MYA,), 1),
    ((I, YU), 2), ((MYA, YU), 2), ((YU,), 1),
    ((I, YA), 2), ((MYA, YA), 2), ((YA,), 1),
)


def _ru_table_i(word, length, table, itable) -> int:
    """stem_ru_table_i (sphinxstemru.inl:363-393): indexed scan by the
    suffix's last unit; first full match in the group wins, returning
    its remove count (possibly 0 — still terminal)."""
    length -= 1
    last = word(length)
    j = 0
    for first, count in itable:
        if last == first:
            # NB: the reference's ru_adj YA index count (4) overruns
            # the 2 real YA entries and scans adjacent static memory;
            # those reinterpreted bytes never match a real suffix, so
            # clamping at the table end is behavior-equivalent.
            for e in range(min(count, len(table) - j)):
                suffix, remove = table[j + e]
                sj = len(suffix) - 1
                k = length
                if sj > k:
                    continue
                while sj >= 0:
                    if word(k) != suffix[sj]:
                        break
                    k -= 1
                    sj -= 1
                if sj >= 0:
                    continue
                return remove
            return 0
        j += count
    return 0


def stem_ru_utf8_bytes(raw: bytes) -> bytes:
    """stem_ru_utf8 (sphinxstemru.inl:430-527) over the UTF-8 bytes."""
    pad = raw + b"\x00" * 64
    n_units = (len(raw) // 2) + 16

    def unit(i: int) -> int:
        o = 2 * i
        return pad[o] | (pad[o + 1] << 8)

    def eow(i: int) -> bool:
        return pad[2 * i] == 0

    iv = _RU_VOWELS.__contains__

    # skip to (and past) the first vowel
    off = 0
    while not eow(off):
        if iv(unit(off)):
            break
        off += 1
    if eow(off):
        return raw
    off += 1

    length = 0
    while not eow(off + length):
        length += 1

    def word(i: int) -> int:
        return unit(off + i)

    r1 = r2 = length
    for i in range(-1, length - 1):
        if iv(word(i)) and not iv(word(i + 1)):
            r1 = i + 2
            break
    for i in range(r1, length - 1):
        if iv(word(i)) and not iv(word(i + 1)):
            r2 = i + 2
            break

    def c(p: int) -> int:
        return word(length - p)

    # the single-pass suffix clamp chain (break at first hit)
    while True:
        i = _ru_table_i(word, length, _RU_DEAR, _RU_DEAR_I)
        if i:
            length -= i
            break

        if c(1) == V and length >= 2:
            if c(2) in (I, Y, YA):
                length -= 2
                break
            if c(2) == A:
                if c(3) == V and c(4) == A:
                    length -= 4
                else:
                    length -= 2
                break

        if (
            length >= 3
            and c(1) == I and c(2) == SH and c(3) == V
            and c(4) in (A, I, Y, YA)
        ):
            length -= 4
            break

        if (
            length >= 5
            and c(1) == MYA and c(2) == S and c(3) == I and c(4) == SH
            and c(5) == V
            and c(6) in (A, I, Y, YA)
        ):
            length -= 6
            break

        def adjectival(ln: int) -> int:
            i = _ru_table_i(word, ln, _RU_ADJ, _RU_ADJ_I)
            if i:
                i += _ru_table_i(word, ln - i, _RU_PART, _RU_PART_I)
            return i

        def verb_ov(ln: int) -> int:
            i = _ru_table_i(word, ln, _RU_VERB, _RU_VERB_I)
            if i and ln >= i + 2 and word(ln - i - 2) == O and word(ln - i - 1) == V:
                return i + 2
            return i

        i = adjectival(length)
        if i:
            length -= i
            break

        if length >= 2 and c(2) == S and c(1) in (MYA, YA):
            length -= 2
            i = adjectival(length)
            if i:
                length -= i
                break
            i = verb_ov(length)
            if i:
                length -= i
                break
        else:
            i = verb_ov(length)
            if i:
                length -= i
                break

        i = _ru_table_i(word, length, _RU_NOUN, _RU_NOUN_I)
        if i:
            length -= i
            break
        break

    if length and c(1) in (IY, I):
        length -= 1

    if length - r2 >= 3 and c(1) == T and c(2) == S and c(3) == O:
        length -= 3
    elif (
        length - r2 >= 4
        and c(1) == MYA and c(2) == T and c(3) == S and c(4) == O
    ):
        length -= 4

    if length >= 3 and c(1) == SH and c(2) == IY and c(3) == E:
        length -= 3
    elif (
        length >= 4
        and c(1) == E and c(2) == SH and c(3) == IY and c(4) == E
    ):
        length -= 4

    if length >= 2 and c(1) == N and c(2) == N:
        length -= 1

    if length and c(1) == MYA:
        length -= 1

    cut = 2 * (off + length)
    if cut >= len(raw):
        return raw
    return raw[:cut]


def stem_ru(token: str) -> str:
    b = token.encode("utf-8", "surrogateescape")
    out = stem_ru_utf8_bytes(b)
    if out == b:
        return token
    return out.decode("utf-8", "surrogateescape")


# ----------------------------------------------------------------------
# Czech (src/sphinxstemcz.cpp) — byte-level clamp + palatalize rules.
# Suffix bytes are the win-1250-ish codes from the reference tables
# (the '!' separators are already removed, as stem_cz_init does).

# (min_length, suffix, check_length, remove, palatalize)
_CZ_CASE = (
    (7, b"atech", 5, 5, False),
    (6, b"\xectem", 4, 3, True),
    (6, b"at\xf9m", 4, 4, False),
    (5, b"ech", 3, 2, True),
    (5, b"ich", 3, 2, True),
    (5, b"\xedch", 3, 2, True),
    (5, b"\xe9ho", 3, 2, True),
    (5, b"\xecmi", 3, 2, True),
    (5, b"emi", 3, 2, True),
    (5, b"\xe9mu", 3, 2, True),
    (5, b"\xecte", 3, 2, True),
    (5, b"\xecti", 3, 2, True),
    (5, b"iho", 3, 2, True),
    (5, b"\xedho", 3, 2, True),
    (5, b"\xedmi", 3, 2, True),
    (5, b"imu", 3, 2, True),
    (5, b"\xe1ch", 3, 3, False),
    (5, b"ata", 3, 3, False),
    (5, b"aty", 3, 3, False),
    (5, b"\xfdch", 3, 3, False),
    (5, b"ama", 3, 3, False),
    (5, b"ami", 3, 3, False),
    (5, b"ov\xe9", 3, 3, False),
    (5, b"ovi", 3, 3, False),
    (5, b"\xfdmi", 3, 3, False),
    (4, b"em", 2, 1, True),
    (4, b"es", 2, 2, True),
    (4, b"\xe9m", 2, 2, True),
    (4, b"\xedm", 2, 2, True),
    (4, b"\xf9fm", 2, 2, False),
    (4, b"at", 2, 2, False),
    (4, b"\xe1m", 2, 2, False),
    (4, b"os", 2, 2, False),
    (4, b"us", 2, 2, False),
    (4, b"\xfdm", 2, 2, False),
    (4, b"mi", 2, 2, False),
    (4, b"ou", 2, 2, False),
    (3, b"e", 1, 0, True),
    (3, b"i", 1, 0, True),
    (3, b"\xed", 1, 0, True),
    (3, b"\xec", 1, 0, True),
    (3, b"u", 1, 1, False),
    (3, b"y", 1, 1, False),
    (3, b"\xf9", 1, 1, False),
    (3, b"a", 1, 1, False),
    (3, b"o", 1, 1, False),
    (3, b"\xe1", 1, 1, False),
    (3, b"\xe9", 1, 1, False),
    (3, b"\xfd", 1, 1, False),
)

_CZ_POSSESSIVE = (
    (5, b"ov", 2, 2, False),
    (5, b"\xf9v", 2, 2, False),
    (5, b"in", 2, 1, True),
)

# (suffix, remove_length, append)
_CZ_PALATALIZE = (
    (b"ci", 2, b"k"),
    (b"ce", 2, b"k"),
    (b"\xe8i", 2, b"k"),
    (b"\xe8e", 2, b"k"),
    (b"zi", 2, b"h"),
    (b"ze", 2, b"h"),
    (b"\x9ei", 2, b"h"),
    (b"\x9ee", 2, b"h"),
    (b"\xe8t\xec", 3, b"ck"),
    (b"\xe8ti", 3, b"ck"),
    (b"\xe8t\xed", 3, b"ck"),
    (b"\x9at\xec", 3, b"sk"),
    (b"\x9ati", 3, b"sk"),
    (b"\x9at\xed", 3, b"sk"),
)


def _cz_palatalize(word: bytes) -> bytes:
    """Palatalize (src/sphinxstemcz.cpp:119): first replace-rule hit
    wins; NO hit chops the last byte."""
    n = len(word)
    for suffix, remove, append in _CZ_PALATALIZE:
        if n >= remove and word[n - remove:] == suffix[:remove]:
            return word[: n - remove] + append
    if n > 0:
        return word[: n - 1]
    return word


def _cz_apply(word: bytes, rules) -> bytes:
    """ApplyRules (src/sphinxstemcz.cpp:142): first-match-wins clamp;
    the effective suffix is the rule's first `check` bytes (the
    \\xf9fm rule's 2-byte compare is a faithful reference quirk).
    NB the reference calls Palatalize() on EVERY rule hit — the
    m_bPalatalize table column is dead data — so a non-palatalizing
    hit still chops one extra byte when no replace-rule matches."""
    n = len(word)
    for min_len, suffix, check, remove, _palatalize_unused in rules:
        if n > min_len and word[n - check:] == suffix[:check]:
            return _cz_palatalize(word[: n - remove])
    return word


def stem_cz_bytes(word: bytes) -> bytes:
    """stem_cz (src/sphinxstemcz.cpp:198): case rules then possessive
    rules, each first-match-wins with optional palatalization."""
    word = _cz_apply(word, _CZ_CASE)
    word = _cz_apply(word, _CZ_POSSESSIVE)
    return word


def stem_cz(token: str) -> str:
    b = token.encode("utf-8", "surrogateescape")
    out = stem_cz_bytes(b)
    if out == b:
        return token
    return out.decode("utf-8", "surrogateescape")


# ----------------------------------------------------------------------
# Double Metaphone (src/sphinxmetaphone.cpp).  Primary code only; in
# UTF-8 mode any codepoint above 128 other than Ç/ç/Ñ/ñ makes the
# whole word pass through unchanged.

_MVOWELS = frozenset(b"AEIOUY")


def _is_vowel(b: int) -> bool:
    return b in _MVOWELS


def _slavo_germanic(word: bytes) -> bool:
    return (
        b"W" in word or b"K" in word or b"CZ" in word or b"WITZ" in word
    )


def _utf8_decode(buf: bytes, i: int) -> tuple[int, int]:
    """The reference's lenient sphUTF8Decode copy
    (src/sphinxmetaphone.cpp:17-57): returns (code, next_index);
    code 0 = eof, -1 = invalid."""
    if i >= len(buf):
        return 0, i
    v = buf[i]
    if not v:
        return 0, i
    i += 1
    if v < 128:
        return v, i
    nbytes = 0
    while v & 0x80:
        nbytes += 1
        v = (v << 1) & 0xFF
    if nbytes < 2 or nbytes > 4:
        return -1, i
    code = v >> nbytes
    nbytes -= 1
    while nbytes:
        if i >= len(buf) or not buf[i]:
            return 0, i
        if (buf[i] & 0xC0) != 0x80:
            return -1, i
        code = (code << 6) + (buf[i] & 0x3F)
        nbytes -= 1
        i += 1
    return code, i


class _MetaWord:
    __slots__ = ("word", "length", "length_padded")

    def __init__(self, word: bytes, length: int):
        self.word = word
        self.length = length
        self.length_padded = len(word.rstrip(b"\x00"))


def _str_at(w: _MetaWord, start: int, length: int, *strs: bytes) -> bool:
    if start < 0 or start >= w.length_padded:
        return False
    seg = w.word[start:start + length]
    return any(seg == s[:length] for s in strs)


def _process_code(code: int, icur: int, w: _MetaWord, out: list) -> int:
    """ProcessCode (src/sphinxmetaphone.cpp:160-621): primary code
    appended to `out`; returns codepoints to advance."""
    word = w.word
    last = w.length - 1

    def at(i: int) -> int:
        return word[i] if 0 <= i < len(word) else 0

    S = _str_at

    if code in (0x41, 0x45, 0x49, 0x4F, 0x55, 0x59):  # AEIOUY
        if not icur:
            out.append(b"A")
        return 1

    if code == 0x42:  # B
        out.append(b"P")
        return 2 if at(icur + 1) == 0x42 else 1

    if code in (0xC7, 0xE7):  # Ç ç
        out.append(b"S")
        return 1

    if code == 0x43:  # C
        if (
            icur > 1
            and not _is_vowel(at(icur - 2))
            and S(w, icur - 1, 3, b"ACH")
            and (
                at(icur + 2) != 0x49
                and (
                    at(icur + 2) != 0x45
                    or S(w, icur - 2, 6, b"BACHER", b"MACHER")
                )
            )
        ):
            out.append(b"K")
            return 2
        if icur == 0 and S(w, 0, 6, b"CAESAR"):
            out.append(b"S")
            return 2
        if S(w, icur, 4, b"CHIA"):
            out.append(b"K")
            return 2
        if S(w, icur, 2, b"CH"):
            if icur > 0 and S(w, icur, 4, b"CHAE"):
                out.append(b"K")
                return 2
            if (
                icur == 0
                and (
                    S(w, icur + 1, 5, b"HARAC", b"HARIS")
                    or S(w, icur + 1, 3, b"HOR", b"HYM", b"HIA", b"HEM")
                )
                and not S(w, 0, 5, b"CHORE")
            ):
                out.append(b"K")
                return 2
            if (
                (S(w, 0, 4, b"VAN ", b"VON ") or S(w, 0, 3, b"SCH"))
                or S(w, icur - 2, 6, b"ORCHES", b"ARCHIT", b"ORCHID")
                or S(w, icur + 2, 1, b"T", b"S")
                or (
                    (S(w, icur - 1, 1, b"A", b"O", b"U", b"E") or icur == 0)
                    and (
                        S(w, icur + 2, 1, b"L", b"R", b"N", b"M")
                        or S(w, icur + 2, 1, b"B", b"H", b"F", b"V")
                        or S(w, icur + 2, 1, b"W", b" ")
                    )
                )
            ):
                out.append(b"K")
            else:
                if icur > 0:
                    if S(w, 0, 2, b"MC"):
                        out.append(b"K")
                    else:
                        out.append(b"X")
                else:
                    out.append(b"X")
            return 2
        if S(w, icur, 2, b"CZ") and not S(w, icur - 2, 4, b"WICZ"):
            out.append(b"S")
            return 2
        if S(w, icur + 1, 3, b"CIA"):
            out.append(b"X")
            return 3
        if S(w, icur, 2, b"CC") and not (icur == 1 and word[0] == 0x4D):
            if S(w, icur + 2, 1, b"I", b"E", b"H") and not S(
                w, icur + 2, 2, b"HU"
            ):
                if (icur == 1 and at(icur - 1) == 0x41) or S(
                    w, icur - 1, 5, b"UCCEE", b"UCCES"
                ):
                    out.append(b"KS")
                else:
                    out.append(b"X")
                return 2
            out.append(b"K")
            return 2
        if S(w, icur, 2, b"CK", b"CG", b"CQ"):
            out.append(b"K")
            return 2
        if S(w, icur, 2, b"CI", b"CE", b"CY"):
            if S(w, icur, 3, b"CIO", b"CIE", b"CIA"):
                out.append(b"S")
            else:
                out.append(b"S")
            return 2
        out.append(b"K")
        if S(w, icur + 1, 2, b" C", b" Q", b" G"):
            return 3
        if S(w, icur + 1, 1, b"C", b"K", b"Q") and not S(
            w, icur + 1, 2, b"CE", b"CI"
        ):
            return 2
        return 1

    if code == 0x44:  # D
        if S(w, icur, 2, b"DG"):
            if S(w, icur + 2, 1, b"I", b"E", b"Y"):
                out.append(b"J")
                return 3
            out.append(b"TK")
            return 2
        if S(w, icur, 2, b"DT", b"DD"):
            out.append(b"T")
            return 2
        out.append(b"T")
        return 1

    if code == 0x46:  # F
        out.append(b"F")
        return 2 if at(icur + 1) == 0x46 else 1

    if code == 0x47:  # G
        if at(icur + 1) == 0x48:  # GH
            if icur > 0 and not _is_vowel(at(icur - 1)):
                out.append(b"K")
                return 2
            if icur < 3:
                if icur == 0:
                    if at(icur + 2) == 0x49:
                        out.append(b"J")
                    else:
                        out.append(b"K")
                    return 2
            if (
                (icur > 1 and S(w, icur - 2, 1, b"B", b"H", b"D"))
                or (icur > 2 and S(w, icur - 3, 1, b"B", b"H", b"D"))
                or (icur > 3 and S(w, icur - 4, 1, b"B", b"H"))
            ):
                return 2
            if (
                icur > 2
                and at(icur - 1) == 0x55
                and S(w, icur - 3, 1, b"C", b"G", b"L", b"R", b"T")
            ):
                out.append(b"F")
            elif icur > 0 and at(icur - 1) != 0x49:
                out.append(b"K")
            return 2
        if at(icur + 1) == 0x4E:  # GN
            if icur == 1 and _is_vowel(word[0]) and not _slavo_germanic(word):
                out.append(b"KN")
            elif (
                not S(w, icur + 2, 2, b"EY")
                and at(icur + 1) != 0x59
                and not _slavo_germanic(word)
            ):
                out.append(b"N")
            else:
                out.append(b"KN")
            return 2
        if S(w, icur + 1, 2, b"LI") and not _slavo_germanic(word):
            out.append(b"KL")
            return 2
        if icur == 0 and (
            at(icur + 1) == 0x59
            or S(w, icur + 1, 2, b"ES", b"EP", b"EB", b"EL")
            or S(w, icur + 1, 2, b"EY", b"IB", b"IL", b"IN")
            or S(w, icur + 1, 2, b"IE", b"EI", b"ER")
        ):
            out.append(b"K")
            return 2
        if (
            (S(w, icur + 1, 2, b"ER") or at(icur + 1) == 0x59)
            and not S(w, 0, 6, b"DANGER", b"RANGER", b"MANGER")
            and not S(w, icur - 1, 1, b"E", b"I")
            and not S(w, icur - 1, 3, b"RGY", b"OGY")
        ):
            out.append(b"K")
            return 2
        if S(w, icur + 1, 1, b"E", b"I", b"Y") or S(
            w, icur - 1, 4, b"AGGI", b"OGGI"
        ):
            if (
                S(w, 0, 4, b"VAN ", b"VON ")
                or S(w, 0, 3, b"SCH")
                or S(w, icur + 1, 2, b"ET")
            ):
                out.append(b"K")
            else:
                out.append(b"J")
            return 2
        out.append(b"K")
        return 2 if at(icur + 1) == 0x47 else 1

    if code == 0x48:  # H
        if (icur == 0 or _is_vowel(at(icur - 1))) and _is_vowel(at(icur + 1)):
            out.append(b"H")
            return 2
        return 1

    if code == 0x4A:  # J
        if S(w, icur, 4, b"JOSE") or S(w, 0, 4, b"SAN "):
            if (icur == 0 and at(icur + 4) == 0x20) or S(w, 0, 4, b"SAN "):
                out.append(b"H")
            else:
                out.append(b"J")
            return 1
        if icur == 0 and not S(w, icur, 4, b"JOSE"):
            out.append(b"J")
        else:
            if (
                icur > 0
                and _is_vowel(at(icur - 1))
                and not _slavo_germanic(word)
                and (at(icur + 1) == 0x41 or at(icur + 1) == 0x4F)
            ):
                out.append(b"J")
            else:
                if icur == last:
                    out.append(b"J")
                elif not S(
                    w, icur + 1, 1, b"L", b"T", b"K", b"S"
                ) and not S(
                    w, icur + 1, 1, b"N", b"M", b"B", b"Z"
                ) and not S(w, icur - 1, 1, b"S", b"K", b"L"):
                    out.append(b"J")
        if at(icur + 1) == 0x4A:
            return 2
        return 1

    if code == 0x4B:  # K
        out.append(b"K")
        return 2 if at(icur + 1) == 0x4B else 1

    if code == 0x4C:  # L
        adv = 1
        if at(icur + 1) == 0x4C:
            if (
                icur == last - 2
                and S(w, icur - 1, 4, b"ILLO", b"ILLA", b"ALLE")
            ) or (
                (S(w, last - 1, 2, b"AS", b"OS") or S(w, last, 1, b"A", b"O"))
                and S(w, icur - 1, 4, b"ALLE")
            ):
                out.append(b"L")
                return 2
            adv = 2
        out.append(b"L")
        return adv

    if code == 0x4D:  # M
        out.append(b"M")
        if (
            S(w, icur - 1, 3, b"UMB")
            and (icur + 1 == last or S(w, icur + 2, 2, b"ER"))
        ) or at(icur + 1) == 0x4D:
            return 2
        return 1

    if code == 0x4E:  # N
        out.append(b"N")
        return 2 if at(icur + 1) == 0x4E else 1

    if code in (0xD1, 0xF1):  # Ñ ñ
        out.append(b"N")
        return 1

    if code == 0x50:  # P
        if at(icur + 1) == 0x48:
            out.append(b"F")
            return 2
        out.append(b"P")
        return 2 if S(w, icur + 1, 1, b"P", b"B") else 1

    if code == 0x51:  # Q
        out.append(b"K")
        return 2 if at(icur + 1) == 0x51 else 1

    if code == 0x52:  # R
        if (
            icur == last
            and not _slavo_germanic(word)
            and S(w, icur - 2, 2, b"IE")
            and not S(w, icur - 4, 2, b"ME", b"MA")
        ):
            pass  # primary adds nothing
        else:
            out.append(b"R")
        return 2 if at(icur + 1) == 0x52 else 1

    if code == 0x53:  # S
        if S(w, icur - 1, 3, b"ISL", b"YSL"):
            return 1
        if icur == 0 and S(w, icur, 5, b"SUGAR"):
            out.append(b"X")
            return 1
        if S(w, icur, 2, b"SH"):
            if S(w, icur + 1, 4, b"HEIM", b"HOEK", b"HOLM", b"HOLZ"):
                out.append(b"S")
            else:
                out.append(b"X")
            return 2
        if S(w, icur, 3, b"SIO", b"SIA") or S(w, icur, 4, b"SIAN"):
            out.append(b"S")
            return 3
        if (icur == 0 and S(w, icur + 1, 1, b"M", b"N", b"L", b"W")) or S(
            w, icur + 1, 1, b"Z"
        ):
            out.append(b"S")
            return 2 if S(w, icur + 1, 1, b"Z") else 1
        if S(w, icur, 2, b"SC"):
            if at(icur + 2) == 0x48:
                if S(w, icur + 3, 2, b"OO", b"ER", b"EN", b"UY") or S(
                    w, icur + 3, 2, b"ED", b"EM"
                ):
                    if S(w, icur + 3, 2, b"ER", b"EN"):
                        out.append(b"X")
                    else:
                        out.append(b"SK")
                    return 3
                if icur == 0 and not _is_vowel(at(3)) and at(3) != 0x57:
                    out.append(b"X")
                else:
                    out.append(b"X")
                return 3
            if S(w, icur + 2, 1, b"I", b"E", b"Y"):
                out.append(b"S")
                return 3
            out.append(b"SK")
            return 3
        if icur == last and S(w, icur - 2, 2, b"AI", b"OI"):
            pass  # primary adds nothing
        else:
            out.append(b"S")
        return 2 if S(w, icur + 1, 1, b"S", b"Z") else 1

    if code == 0x54:  # T
        if S(w, icur, 4, b"TION"):
            out.append(b"X")
            return 3
        if S(w, icur, 3, b"TIA", b"TCH"):
            out.append(b"X")
            return 3
        if S(w, icur, 2, b"TH") or S(w, icur, 3, b"TTH"):
            if (
                S(w, icur + 2, 2, b"OM", b"AM")
                or S(w, 0, 4, b"VAN ", b"VON ")
                or S(w, 0, 3, b"SCH")
            ):
                out.append(b"T")
            else:
                out.append(b"0")  # yes, zero
            return 2
        out.append(b"T")
        return 2 if S(w, icur + 1, 1, b"T", b"D") else 1

    if code == 0x56:  # V
        out.append(b"F")
        return 2 if at(icur + 1) == 0x56 else 1

    if code == 0x57:  # W
        if S(w, icur, 2, b"WR"):
            out.append(b"R")
            return 2
        if icur == 0 and (_is_vowel(at(icur + 1)) or S(w, icur, 2, b"WH")):
            out.append(b"A")
        if (
            (icur == last and icur > 0 and _is_vowel(at(icur - 1)))
            or S(w, icur - 1, 5, b"EWSKI", b"EWSKY", b"OWSKI", b"OWSKY")
            or S(w, 0, 3, b"SCH")
        ):
            return 1
        if S(w, icur, 4, b"WICZ", b"WITZ"):
            out.append(b"TS")
            return 4
        return 1

    if code == 0x58:  # X
        if not (
            icur == last
            and (
                S(w, icur - 3, 3, b"IAU", b"EAU")
                or S(w, icur - 2, 2, b"AU", b"OU")
            )
        ):
            out.append(b"KS")
        return 2 if at(icur + 1) in (0x43, 0x58) else 1

    if code == 0x5A:  # Z
        if at(icur + 1) == 0x48:
            out.append(b"J")
            return 2
        out.append(b"S")
        return 2 if at(icur + 1) == 0x5A else 1

    return 1


def stem_dmetaphone_bytes(raw: bytes, utf8: bool = True) -> bytes:
    """stem_dmetaphone (src/sphinxmetaphone.cpp:623-705), primary
    code only (secondary is computed but discarded there too)."""
    length = len(raw)
    original = bytes(
        b - 32 if 0x61 <= b <= 0x7A else b for b in raw
    ) + b"          "
    out: list = []

    w = _MetaWord(original, length)

    advance = 0
    if _str_at(w, 0, 2, b"GN", b"KN", b"PN", b"WR", b"PS"):
        advance = 1
    if original[:1] == b"X":
        out.append(b"S")
        advance = 1

    p_ptr = 0
    p_last = 0
    code = -1
    if utf8:
        code, p_ptr = _utf8_decode(original, p_ptr)

    while code != 0:
        icur = p_last if utf8 else p_ptr
        if icur >= length:
            break
        if utf8:
            for _ in range(advance):
                p_last = p_ptr
                code, p_ptr = _utf8_decode(original, p_ptr)
        else:
            p_ptr += advance
            code = original[p_ptr] if p_ptr < len(original) else 0
        if code <= 0:
            break
        if utf8 and code > 128 and code not in (0xC7, 0xE7, 0xD1, 0xF1):
            return raw  # unknown code: word passes through
        advance = _process_code(code, p_last if utf8 else p_ptr, w, out)

    primary = b"".join(out)
    if not raw or primary:
        return primary
    return raw


def stem_metaphone(token: str) -> str:
    b = token.encode("utf-8", "surrogateescape")
    out = stem_dmetaphone_bytes(b, utf8=True)
    if out == b:
        return token
    return out.decode("utf-8", "surrogateescape")
