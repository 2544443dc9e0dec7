"""Scalar tokenizer state machine: specials, duals, synonyms,
phrase boundaries, ignored chars, escaping.

Faithful port of the reference UTF-8 tokenizer:
  * GetToken        — src/sphinx.cpp:4238-4368 (CSphTokenizer_UTF8)
  * GetTokenSyn     — src/sphinx.cpp:3578-3936 (CSphTokenizerTraits)
  * SynCheckPrefix  — src/sphinx.cpp:3500-3541
  * LoadSynonyms    — src/sphinx.cpp:3310-3469
  * Special2Simple  — src/sphinx.cpp:3565-3576

The scanner operates on Python codepoint indices where the reference
uses byte pointers; synonym candidate refinement runs on the packed
UTF-8 byte keys exactly as the reference does (map-from words are
matched RAW — unfolded, case-sensitive — joined by the magic
\\x01 whitespace byte, sorted bytewise).

This is the slow exact path: the vectorized tokenizer fast path stays
in charge whenever none of these features are configured.
"""

from __future__ import annotations

from sphinx_1_spark.functions.charset import (
    FLAG_BOUNDARY,
    FLAG_DUAL,
    FLAG_IGNORE,
    FLAG_NGRAM,
    FLAG_SPECIAL,
    FLAG_SYNONYM,
    MASK_CODEPOINT,
    MASK_FLAGS,
    Lowercaser,
)

MAX_WORD_LEN = 64  # SPH_MAX_WORD_LEN, src/sphinx.h:145
MAGIC_SYNONYM_WHITESPACE = 1  # src/sphinx.cpp:172
MAX_SYNONYM_LEN = 1024  # src/sphinx.h:150 (MAX_SYNONYM_LEN)

# SynCheck_e (src/sphinx.cpp:3492-3498)
_SYN_LESS, _SYN_PARTIAL, _SYN_EXACT, _SYN_GREATER = 0, 1, 2, 3


def _sph_is_space(cp: int) -> bool:
    return cp in (32, 9, 10, 13)  # sphIsSpace, src/sphinxutils.h:30


class Synonym:
    """One map-from -> map-to entry, packed like CSphSynonym: the
    map-from token list joined with \\x01 after each token, plus the
    terminating NUL so prefix checks can index one past the end."""

    __slots__ = ("packed", "to", "to_len")

    def __init__(self, from_words: list[str], to: str):
        self.packed = (
            b"".join(w.encode("utf-8") + b"\x01" for w in from_words) + b"\x00"
        )
        self.to = to
        self.to_len = len(to)


def parse_synonyms(lines) -> list[Synonym]:
    """LoadSynonyms line parsing (src/sphinx.cpp:3333-3427): split on
    `=>`, whitespace-tokenize map-from, trim map-to, length checks."""
    out: list[Synonym] = []
    for no, line in enumerate(lines, 1):
        if not line.strip():
            continue
        if "=>" not in line:
            raise ValueError(f"synonyms line {no}: mapping token (=>) not found")
        from_part, to_part = line.split("=>", 1)
        from_words = from_part.split()
        if not from_words:
            raise ValueError(f"synonyms line {no}: empty map-from part")
        to = to_part.strip()
        if not to:
            raise ValueError(f"synonyms line {no}: empty map-to part")
        for w in from_words:
            if len(w) > MAX_WORD_LEN:
                raise ValueError(f"synonyms line {no}: map-from token too long")
        if len(to) > MAX_WORD_LEN:
            raise ValueError(f"synonyms line {no}: map-to token too long")
        syn = Synonym(from_words, to)
        if len(syn.packed) > MAX_SYNONYM_LEN:
            raise ValueError(f"synonyms line {no}: map-from part too long")
        out.append(syn)
    out.sort(key=lambda s: s.packed)
    return out


def register_synonym_codepoints(syns: list[Synonym], lc: Lowercaser) -> None:
    """Track synonym-only codepoints: chars used in map-from parts
    that are neither whitespace nor charset word-parts become
    FLAG_SYNONYM remaps of themselves (src/sphinx.cpp:3422-3467)."""
    only: set[int] = set()
    for syn in syns:
        for ch in syn.packed.decode("utf-8", "surrogatepass"):
            cp = ord(ch)
            if cp in (0, MAGIC_SYNONYM_WHITESPACE):
                continue
            if cp > 0 and not _sph_is_space(cp) and not lc.tolower(cp):
                only.add(cp)
    if only:
        lc.add_remaps([(cp, cp, cp) for cp in sorted(only)], FLAG_SYNONYM, 0)


def _syn_first_byte_index(syns: list[Synonym]) -> tuple[list[int], list[int]]:
    start = [2**31] * 256
    end = [-(2**31)] * 256
    for i, s in enumerate(syns):
        b = s.packed[0]
        start[b] = min(start[b], i)
        end[b] = max(end[b], i)
    return start, end


def _syn_check_prefix(
    cand: Synonym, off: int, test: bytes, maybe_separator: bool
) -> int:
    """SynCheckPrefix (src/sphinx.cpp:3500-3541)."""
    p = cand.packed
    n = len(p)
    for b in test:
        cb = p[off] if off < n else 0
        if cb != b:
            # incoming synonym-only char vs. ending sequence
            if (
                maybe_separator
                and cb == MAGIC_SYNONYM_WHITESPACE
                and (p[off + 1] if off + 1 < n else 0) == 0
            ):
                return _SYN_EXACT
            return _SYN_LESS if cb < b else _SYN_GREATER
        off += 1
    cb = p[off] if off < n else 0
    if cb == 0:
        return _SYN_EXACT
    if (
        maybe_separator
        and cb == MAGIC_SYNONYM_WHITESPACE
        and (p[off + 1] if off + 1 < n else 0) == 0
    ):
        return _SYN_EXACT
    return _SYN_PARTIAL


def _is_separator(folded: int, first: bool) -> bool:
    """IsSeparator (src/sphinx.cpp:3543-3559)."""
    if folded < 0 or (folded & MASK_CODEPOINT) == 0:
        return True
    if not (folded & MASK_FLAGS):
        return False
    if not (folded & FLAG_DUAL):
        return True
    return first


def _special2simple(folded: int) -> tuple[bool, int]:
    """Special2Simple (src/sphinx.cpp:3565-3576): escaped specials not
    in the charset become plain codepoints (True) or whitespace
    (False)."""
    if (folded & FLAG_DUAL) or not (folded & FLAG_SPECIAL):
        return True, folded & ~(FLAG_SPECIAL | FLAG_DUAL)
    return False, folded


class MultiformContainer:
    """Multi-word wordforms (CSphMultiformContainer, built by
    LoadWordformContainer src/sphinx.cpp: lines `w1 w2 ... > normal`
    with two or more source words; single-word lines belong in the
    plain wordforms map).  Lines must already be in folded (lowercase)
    form — the reference folds them through the index tokenizer."""

    def __init__(self, lines):
        # key (first source token) -> list of (continuation_tokens, normal)
        self.by_key: dict[str, list[tuple[tuple[str, ...], str]]] = {}
        for no, line in enumerate(lines, 1):
            if ">" not in line:
                raise ValueError(f"multiforms line {no}: '>' not found")
            left, right = line.split(">", 1)
            src = left.split()
            dst = right.split()
            if len(src) < 2 or not dst:
                raise ValueError(
                    f"multiforms line {no}: need `w1 w2 ... > normal` "
                    "(single-word mappings go in wordforms)"
                )
            self.by_key.setdefault(src[0], []).append((tuple(src[1:]), dst[0]))
        self.max_tokens = max(
            (len(c) + 1 for forms in self.by_key.values() for c, _ in forms),
            default=0,
        )

    def key_min_max(self, key: str) -> tuple[int, int]:
        forms = self.by_key[key]
        lens = [len(c) for c, _ in forms]
        return min(lens), max(lens)


class _Stored:
    __slots__ = (
        "token", "start", "end", "overshorts", "boundary",
        "boundary_offset", "was_special",
    )

    def __init__(self, sc: "Scanner", token: str):
        self.token = token
        self.start = sc.token_start
        self.end = sc.token_end
        self.overshorts = sc.overshort_count
        self.boundary = sc.token_boundary
        self.boundary_offset = sc.boundary_offset
        self.was_special = sc.was_special


class MultiformScanner:
    """CSphTokenizer_Filter::GetToken (src/sphinx.cpp:4981-5092):
    buffers tokens keyed by a multiform's first word, replaces matched
    sequences with the normal form (span = first token start .. last
    token end, overshorts from the first token, boundary cleared);
    near-eof underflow emits the buffered head token unchanged."""

    def __init__(self, scanner: "Scanner", container: MultiformContainer):
        self.sc = scanner
        self.mf = container
        self._stored: list[_Stored] = []

    def set_buffer(self, text: str) -> None:
        self.sc.set_buffer(text)
        self._stored = []
        self.token_start = 0
        self.token_end = 0
        self.overshort_count = 0
        self.token_boundary = False
        self.boundary_offset = -1
        self.was_special = False

    def _next_stored(self):
        tok = self.sc.get_token()
        if tok is None:
            return None
        return _Stored(self.sc, tok)

    def _expose(self, rec: _Stored) -> str:
        self.token_start = rec.start
        self.token_end = rec.end
        self.overshort_count = rec.overshorts
        self.token_boundary = rec.boundary
        self.boundary_offset = rec.boundary_offset
        self.was_special = rec.was_special
        return rec.token

    def get_token(self) -> str | None:
        stored = self._stored
        if stored:
            head = stored[0]
        else:
            head = self._next_stored()
            if head is None:
                self.token_start = self.token_end = 0
                self.overshort_count = 0
                self.token_boundary = self.was_special = False
                return None
        forms = self.mf.by_key.get(head.token)
        if forms is None:
            if stored:
                stored.pop(0)
            return self._expose(head)

        if not stored:
            stored.append(head)
        kmin, kmax = self.mf.key_min_max(head.token)
        needed = (kmax + 1) - len(stored)
        for _ in range(needed):
            nxt = self._next_stored()
            if nxt is None:
                break
            stored.append(nxt)

        if len(stored) <= kmin:
            return self._expose(stored.pop(0))

        for cont, normal in forms:
            if len(stored) <= len(cont):
                continue
            if all(
                stored[j + 1].token == cont[j] for j in range(len(cont))
            ):
                per = 1 + len(cont)
                self.token_start = stored[0].start
                self.token_end = stored[per - 1].end
                self.overshort_count = stored[0].overshorts
                self.token_boundary = False
                self.was_special = False
                del stored[:per]
                return normal

        return self._expose(stored.pop(0))


class Scanner:
    """Streaming GetToken over one text buffer.

    After each `get_token()` (None = eof):
      token_start/token_end — codepoint span of the returned token
      was_special           — token was a standalone special char
      overshort_count       — dropped-short-token count for this call
      token_boundary        — a phrase boundary preceded this token
      boundary_offset       — codepoint offset of that boundary
    """

    def __init__(
        self,
        lc: Lowercaser,
        synonyms: list[Synonym] | None = None,
        min_word_len: int = 1,
        escaped: bool = False,
    ):
        self.lc = lc
        self.syns = synonyms or []
        self.syn_start, self.syn_end = _syn_first_byte_index(self.syns)
        self.min_word_len = min_word_len
        self.escaped = escaped
        self.set_buffer("")

    def set_buffer(self, text: str) -> None:
        self.text = text
        self.n = len(text)
        self.i = 0
        self._accum: list[str] = []
        self._token = ""
        self.last_token_len = 0
        self._bound = False  # m_bBoundary persists across calls
        self.token_start = 0
        self.token_end = 0
        self.was_special = False
        self.overshort_count = 0
        self.token_boundary = False
        self.boundary_offset = -1

    # -- primitives ----------------------------------------------------
    def _next(self) -> int:
        """GetCodepoint: -1 on eof, else advance one codepoint."""
        if self.i >= self.n:
            return -1
        cp = ord(self.text[self.i])
        self.i += 1
        return cp

    def _accum_cp(self, cp: int) -> None:
        if len(self._accum) < MAX_WORD_LEN:
            self._accum.append(chr(cp))

    def _flush(self) -> None:
        """FlushAccum (src/sphinx.cpp:4377)."""
        self.last_token_len = len(self._accum)
        self._token = "".join(self._accum)
        self._accum = []

    # -- main dispatch -------------------------------------------------
    def get_token(self) -> str | None:
        self.was_special = False
        self.overshort_count = 0
        if self.syns:
            return self._get_token_syn()

        escaped = self.escaped
        last_cp = 0
        self.token_boundary = False
        while True:
            pcur = self.i
            code = self._next()
            folded = self.lc.tolower(code)

            if folded < 0:  # eof
                self._flush()
                if self.last_token_len < self.min_word_len:
                    self.last_token_len = 0
                    return None
                self.token_end = self.i
                return self._token

            if folded & FLAG_IGNORE:
                continue

            if escaped:
                if code == 0x5C and last_cp != 0x5C:  # backslash
                    last_cp = code
                    continue
                if last_cp == 0x5C:
                    ok, folded = _special2simple(folded)
                    if not ok:
                        folded = 0
                last_cp = code

            # whitespace / phrase boundary
            if self._bound and folded == 0:
                self.token_boundary = True
                self.boundary_offset = pcur - 1
            self._bound = (folded & FLAG_BOUNDARY) != 0
            if folded == 0 or self._bound:
                self._flush()
                if self.last_token_len < self.min_word_len:
                    if self.last_token_len:
                        self.overshort_count += 1
                    continue
                self.token_end = pcur
                return self._token

            # specials (duals mid-word are plain codepoints)
            special = (folded & FLAG_SPECIAL) and not (
                (folded & FLAG_DUAL) and self._accum
            )
            if special:
                # skip short words preceding specials
                if len(self._accum) < self.min_word_len:
                    if self._accum:
                        self.overshort_count += 1
                    self._flush()
                if self._accum:
                    # flush current accum, redo special on next call
                    self.i = pcur
                    self.token_end = pcur
                else:
                    self.was_special = not (folded & FLAG_NGRAM)
                    self.token_start = pcur
                    self.token_end = self.i
                    self._accum_cp(folded & MASK_CODEPOINT)
                self._flush()
                return self._token

            if not self._accum:
                self.token_start = pcur
            self._accum_cp(folded & MASK_CODEPOINT)

    # -- synonym-aware path --------------------------------------------
    def _get_token_syn(self) -> str | None:
        escaped = self.escaped
        self.token_boundary = False
        while True:
            first_sep = None
            self._accum = []
            lo, hi = 0, len(self.syns) - 1
            off = 0
            last_cp = 0
            last_folded = 0
            rescan = None
            exact_idx = -1
            exact_pos = 0

            while True:
                pcur = self.i
                code = self._next()

                if code < 0:
                    # eof at token start -> done; eof after whitespace
                    # -> candidate was already checked last time
                    if off == 0:
                        return None
                    if last_folded == 0:
                        break

                folded = self.lc.tolower(code)

                # boundaries
                if self._bound and folded == 0:
                    self.token_boundary = True
                    self.boundary_offset = pcur - 1
                self._bound = folded >= 0 and (folded & FLAG_BOUNDARY) != 0

                # skip continuous whitespace
                if last_folded == 0 and folded == 0:
                    continue

                if escaped and code >= 0:
                    if code == 0x5C and last_cp != 0x5C:
                        last_cp = code
                        continue
                    if last_cp == 0x5C:
                        ok, folded2 = _special2simple(folded)
                        if ok:
                            folded = folded2
                        else:
                            last_cp = 0
                            continue
                    last_cp = code

                last_folded = folded

                # specials at the very word start
                if folded >= 0 and (folded & FLAG_SPECIAL) and not self._accum:
                    self.was_special = not (folded & FLAG_NGRAM)
                    self._accum_cp(folded & MASK_CODEPOINT)
                    self.last_token_len = 1
                    self.token_start = pcur
                    self.token_end = self.i
                    self._flush_keep()
                    return self._token

                just_special = (
                    folded >= 0
                    and (folded & FLAG_SPECIAL)
                    and not (folded & FLAG_DUAL)
                    and not (folded & FLAG_SYNONYM)
                )

                # if the candidate starts with something special and
                # turns out not to be a synonym, rescan from here
                if off == 0:
                    rescan = self.i if _is_separator(folded, True) else None

                # accumulate folded token
                if first_sep is None:
                    if _is_separator(folded, not self._accum):
                        if self._accum:
                            first_sep = pcur
                    else:
                        if not self._accum:
                            self.token_start = pcur
                        self._accum_cp(folded & MASK_CODEPOINT)

                # build raw test symbol(s); non-whitespace separators
                # also emit the NUL terminator so only complete
                # synonyms can match across them ("MS*DOS" != "MS DOS")
                masked = code & MASK_CODEPOINT if code >= 0 else 0
                if folded <= 0 or just_special:
                    test = bytes([MAGIC_SYNONYM_WHITESPACE])
                    if masked not in (0x20, 0x09):
                        test += b"\x00"
                else:
                    test = chr(masked).encode("utf-8")

                maybe_separator = (
                    folded < 0 or (folded & FLAG_SYNONYM) != 0
                )

                ret = self._refine(
                    lo, hi, off, test, maybe_separator, pcur, just_special
                )
                if ret is None:
                    break  # initial-range miss (off==0, no exact yet)
                kind = ret[0]
                if kind == "return":
                    return ret[1]
                nlo, nhi, ei, ep = ret[1], ret[2], ret[3], ret[4]
                if ei >= 0:  # exacts persist across refinement symbols
                    exact_idx, exact_pos = ei, ep
                if kind == "break":
                    if exact_idx >= 0:
                        # LOC_REFINE_BREAK: rewind and emit the exact
                        self.i = exact_pos
                        return self._return_synonym(exact_idx, exact_pos, False)
                    break
                lo, hi = nlo, nhi

                if code < 0:
                    break
                off += len(test)

            if rescan is not None:
                self.i = rescan
                continue

            # not a synonym; find the proper separator
            if first_sep is None:
                last = 0
                while True:
                    pcur = self.i
                    code = self._next()
                    folded = self.lc.tolower(code)
                    if folded < 0:
                        break
                    if escaped:
                        if code == 0x5C and last != 0x5C:
                            last = code
                            continue
                        if last == 0x5C:
                            ok, folded = _special2simple(folded)
                            if not ok:
                                break
                        last = code
                    if _is_separator(folded, False):
                        if folded != 0:
                            self.i = pcur  # force rescan
                        break
                    self._accum_cp(folded & MASK_CODEPOINT)
            else:
                self.i = first_sep
                pcur = first_sep

            if len(self._accum) < self.min_word_len:
                if self._accum:
                    self.overshort_count += 1
                self._accum = []
                continue

            self.last_token_len = len(self._accum)
            self.token_end = pcur
            self._flush_keep()
            return self._token

    def _flush_keep(self) -> None:
        self._token = "".join(self._accum)
        self._accum = []

    def _return_synonym(self, idx: int, pcur: int, just_special: bool) -> str:
        """LOC_RETURN_SYNONYM (src/sphinx.cpp:3723-3730)."""
        self.token_end = pcur
        if just_special:
            self.i = pcur
        syn = self.syns[idx]
        self.last_token_len = syn.to_len
        self._accum = []
        self._token = syn.to
        return self._token

    def _refine(
        self,
        lo: int,
        hi: int,
        off: int,
        test: bytes,
        maybe_separator: bool,
        pcur: int,
        just_special: bool,
    ):
        """The synonym range-refinement step of GetTokenSyn
        (src/sphinx.cpp:3740-3847).  Returns:
          ("return", token)            — synonym returned
          ("break", lo, hi, ei, ep)    — LOC_REFINE_BREAK (caller
                                          returns exact if ei>=0)
          ("cont", lo, hi, ei, ep)     — continue refining
          None                         — initial-range miss (break,
                                          no exact possible)
        """
        exact_idx = -1
        exact_pos = 0

        if off == 0:
            lo = self.syn_start[test[0]]
            hi = self.syn_end[test[0]]
            if lo > hi:
                return None

        e_start = _syn_check_prefix(self.syns[lo], off, test, maybe_separator)
        if e_start == _SYN_EXACT:
            if lo == hi:
                return ("return", self._return_synonym(lo, pcur, just_special))
            exact_idx, exact_pos = lo, pcur
        if e_start == _SYN_GREATER or (lo == hi and e_start != _SYN_PARTIAL):
            return ("break", lo, hi, exact_idx, exact_pos)

        e_end = _syn_check_prefix(self.syns[hi], off, test, maybe_separator)
        if e_end == _SYN_LESS:
            return ("break", lo, hi, exact_idx, exact_pos)
        if e_end == _SYN_EXACT:
            exact_idx, exact_pos = hi, pcur

        # refine left boundary
        if e_start not in (_SYN_PARTIAL, _SYN_EXACT):
            il, ir = lo, hi
            while ir - il > 1:
                im = il + (ir - il) // 2
                e_mid = _syn_check_prefix(
                    self.syns[im], off, test, maybe_separator
                )
                if e_mid == _SYN_LESS:
                    il = im
                else:
                    ir = im
            e_r = _syn_check_prefix(self.syns[ir], off, test, maybe_separator)
            if e_r == _SYN_GREATER:
                return ("break", lo, hi, exact_idx, exact_pos)
            if e_r == _SYN_EXACT and ir == hi:
                return ("return", self._return_synonym(ir, pcur, just_special))
            lo = ir
            e_start = e_r

        # refine right boundary
        if e_end not in (_SYN_PARTIAL, _SYN_EXACT):
            il, ir = lo, hi
            while ir - il > 1:
                im = il + (ir - il) // 2
                e_mid = _syn_check_prefix(
                    self.syns[im], off, test, maybe_separator
                )
                if e_mid == _SYN_GREATER:
                    ir = im
                else:
                    il = im
            e_l = _syn_check_prefix(self.syns[il], off, test, maybe_separator)
            if e_l == _SYN_LESS:
                return ("break", lo, hi, exact_idx, exact_pos)
            if e_l == _SYN_EXACT and il == lo:
                return ("return", self._return_synonym(il, pcur, just_special))
            hi = il

        return ("cont", lo, hi, exact_idx, exact_pos)
