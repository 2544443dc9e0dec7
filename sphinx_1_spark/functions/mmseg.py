"""MMSEG Chinese tokenizer — port of CSphTokenizer_UTF8Chinese
(reference src/sphinx.cpp:4412-4912), token-identical.

The dictionary is the plain-text "word\\tfreq" list (the darts
double-array binary the reference mmaps is just an index over the same
pairs, built by mkdict.cpp); `commonPrefixSearch` is reproduced as
byte-prefix lookups bucketed by word byte-length, returning matches in
increasing length order like darts-clone.

GetToken (src/sphinx.cpp:4700-4877) semantics reproduced exactly:
  * at each position, dictionary prefix search over raw bytes;
    1 match -> take it; >1 -> MMSEG "complex" chunk selection
    (`getBestWordLength` src/sphinx.cpp:4418-4627); dict words are
    emitted as raw bytes (no case folding) and bypass min_word_len;
  * 0 matches -> inline UTF-8 scanner with charset folding; when a
    separator ends a token, the position REWINDS to the separator if a
    dictionary word starts there (src/sphinx.cpp:4787-4790) — with
    the reference's window quirk: the search window is measured from
    *past* the separator (m_pBufferMax - m_pCur), so a dict word at
    the separator that extends beyond that window is not matched;
  * overshort tokens (len < min_word_len) are dropped and counted;
    hit positions advance by 1 + overshorts*overshort_step
    (src/sphinx.cpp:18528).

getBestWordLength's four filter rules use float32 arrays in the
reference; all comparisons here reproduce that math bit-for-bit
(np.float32 accumulation, double log/sqrt results truncated back to
float32), including the rule-4 quirk that when every chunk's SDMF is
below the 0-initialized running max, the rule-3 survivor list is used
unchanged (src/sphinx.cpp:4605-4626).

Documented deviation: the reference's chunk buffer is a fixed
float[64][10] (src/sphinx.cpp:4434) while the A*B*C enumeration can
produce up to 64^3 chunks; inputs yielding >64 chunks smash the
reference's stack (segfault — verified empirically).  This port
enumerates without the overflow, so on such inputs it returns the
well-defined MMSEG answer where the reference has none.
"""

from __future__ import annotations

import math

import numpy as np

from sphinx_1_spark.functions.charset import codepoints_to_text

_DICT_CACHE: dict[str, "MMSegDict"] = {}


def _charcount(b: bytes) -> int:
    """Leading (non-continuation) UTF-8 bytes — the reference counts
    bytes with UTF8CharLenTable[b] < 0x08 (src/sphinx.cpp:4476)."""
    return sum(1 for x in b if not 0x80 <= x <= 0xBF)


class MMSegDict:
    """word->freq dictionary with darts-like commonPrefixSearch."""

    def __init__(self, freq: dict[bytes, int]):
        # darts cannot hold the empty key; mkdict never emits one
        self.freq = {w: f for w, f in freq.items() if w}
        freq = self.freq
        self.lengths = sorted({len(w) for w in freq})
        self.max_len = self.lengths[-1] if self.lengths else 0
        # First-byte dispatch: a prefix match requires byte equality at
        # position 0, so only lengths of words sharing that first byte
        # are candidates — exact, and skips the hash probes entirely on
        # bytes that start no dictionary word (most of ASCII).
        by_first: dict[int, set[int]] = {}
        start_cps: set[int] = set()
        self.valid_utf8_words = True
        for w in freq:
            by_first.setdefault(w[0], set()).add(len(w))
            try:
                start_cps.add(ord(w.decode("utf-8")[0]))
            except (UnicodeDecodeError, IndexError):
                # a word that is not valid UTF-8 defeats the
                # first-codepoint gate; the tokenizer falls back to
                # the scalar byte scanner for exactness
                self.valid_utf8_words = False
        self.lengths_by_first = {b: sorted(s) for b, s in by_first.items()}
        # First-CODEPOINT gate for the vectorized tokenize pre-pass:
        # in valid UTF-8, byte-prefix equality of two complete-char
        # sequences starting at the same offset forces first-char
        # equality (UTF-8 leading bytes are self-terminating), so a
        # position whose codepoint starts no dict word cannot match.
        if start_cps and self.valid_utf8_words:
            mx = max(start_cps)
            gate = np.zeros(mx + 1, dtype=bool)
            gate[list(start_cps)] = True
            self.start_gate: np.ndarray | None = gate
        else:
            self.start_gate = None

    @classmethod
    def load_cached(cls, path: str) -> "MMSegDict":
        """Per-process cache: Spark reuses Python workers across tasks,
        so the dict file (100k+ lines for a real Chinese dict) is
        parsed once per worker instead of once per task."""
        hit = _DICT_CACHE.get(path)
        if hit is None:
            hit = _DICT_CACHE[path] = cls.load(path)
        return hit

    @classmethod
    def load(cls, path: str) -> "MMSegDict":
        freq: dict[bytes, int] = {}
        with open(path, "rb") as f:
            for line in f:
                line = line.rstrip(b"\r\n")
                if not line:
                    continue
                word, _, val = line.partition(b"\t")
                if word:
                    # mkdict uses strtol base-0 (src/mkdict.cpp:59)
                    try:
                        freq[word] = int(val.strip() or b"0", 0)
                    except ValueError:
                        freq[word] = 0
        return cls(freq)

    def prefix_search(
        self, data: bytes, pos: int, limit: int, maxlen: int | None = None
    ) -> list[tuple[int, int]]:
        """[(byte_len, freq)] of dict words prefixing data[pos:pos+maxlen],
        ascending byte length (darts result order).

        maxlen 0 means "to end of buffer": darts commonPrefixSearch
        falls back to strlen when passed length 0
        (darts-clone.h:1282-1287), and the NUL-free buffer ends at the
        caller's terminator."""
        if pos >= len(data):
            return []
        lengths = self.lengths_by_first.get(data[pos])
        if lengths is None:
            return []
        window = len(data) - pos if not maxlen else maxlen
        out = []
        for ln in lengths:
            if ln > window:
                break
            f = self.freq.get(data[pos : pos + ln])
            if f is not None:
                out.append((ln, f))
                if len(out) >= limit:
                    break
        return out


class ChineseTokenizer:
    """Stateful port of CSphTokenizer_UTF8Chinese over one buffer."""

    MAX_ACCUM_CP = 64  # SPH_MAX_WORD_LEN, src/sphinx.h:145

    def __init__(self, dict_: MMSegDict, fold: np.ndarray, min_word_len: int = 1):
        self.dict = dict_
        self.fold = fold
        self.min_word_len = min_word_len
        # Memo for the complex-chunk rule cascade: the decision depends
        # only on the bytes in the A+B+C search window (3 * longest
        # dict word), and buffer truncation is encoded in the key slice
        # length, so equal keys give equal answers. Natural text is
        # Zipfian, so the hit rate is high. Stored on the (per-process
        # cached) dict so it survives across tasks.
        self._bwl_cache: dict[bytes, int] = getattr(dict_, "_bwl_cache", None) or {}
        dict_._bwl_cache = self._bwl_cache
        self._bwl_window = 3 * dict_.max_len

    # ------------------------------------------------------------------
    def _best_word_length(self, data: bytes, pos: int) -> int:
        key = data[pos : pos + self._bwl_window]
        hit = self._bwl_cache.get(key)
        if hit is not None:
            return hit
        if len(self._bwl_cache) >= (1 << 17):
            self._bwl_cache.clear()
        res = self._best_word_length_impl(data, pos)
        self._bwl_cache[key] = res
        return res

    def _best_word_length_impl(self, data: bytes, pos: int) -> int:
        """MMSEG complex: 3-word chunk enumeration + 4 filter rules
        (getBestWordLength, src/sphinx.cpp:4418-4627)."""
        f32 = np.float32
        d = self.dict
        A = d.prefix_search(data, pos, 64)
        chunks: list[tuple[int, tuple, tuple, tuple]] = []  # (nwords, lens, freqs, chars)
        for la, fa in A:
            ca = _charcount(data[pos : pos + la])
            pb = pos + la
            B = d.prefix_search(data, pb, 64)
            if B:
                for lb, fb in B:
                    cb = _charcount(data[pb : pb + lb])
                    pc = pb + lb
                    C = d.prefix_search(data, pc, 64)
                    if C:
                        for lc, fc in C:
                            cc = _charcount(data[pc : pc + lc])
                            chunks.append((3, (la, lb, lc), (fa, fb, fc), (ca, cb, cc)))
                    else:
                        chunks.append((2, (la, lb, 0), (fa, fb, 0), (ca, cb, 0)))
            else:
                chunks.append((1, (la, 0, 0), (fa, 0, 0), (ca, 0, 0)))

        # rule 1: max total char count (float32 adds of small ints: exact)
        lengths = [f32(f32(f32(c[3][0]) + f32(c[3][1])) + f32(c[3][2])) for c in chunks]
        mx = max(lengths)
        best = [i for i, v in enumerate(lengths) if v == mx]
        if len(best) < 2:
            return chunks[best[0]][1][0]

        # rule 2: min word count
        counts = {i: f32(chunks[i][0]) for i in best}
        mn = min(counts[i] for i in best)
        best = [i for i in best if counts[i] == mn]
        if len(best) < 2:
            return chunks[best[0]][1][0]

        # rule 3: min stddev of word char counts (float32 accumulation,
        # double sqrt truncated to float32)
        variances = {}
        for i in best:
            nw, _, _, chars = chunks[i]
            total = f32(f32(f32(chars[0]) + f32(chars[1])) + f32(chars[2]))
            avg = f32(total / f32(nw))
            var = f32(0.0)
            for t in range(nw):
                dt = f32(avg - f32(chars[t]))
                var = f32(var + f32(dt * dt))
            variances[i] = f32(math.sqrt(float(f32(var / f32(nw)))))
        mnv = min(variances[i] for i in best)
        best = [i for i in best if variances[i] == mnv]
        if len(best) < 2:
            return chunks[best[0]][1][0]

        # rule 4: max SDMF (sum of double log(freq) of 1-char words,
        # accumulated into float32); running max starts at 0.0 — if no
        # SDMF reaches it, the rule-3 survivors stand (reference quirk)
        sdmfs = {}
        for i in best:
            nw, _, freqs, chars = chunks[i]
            s = f32(0.0)
            for t in range(nw):
                if f32(chars[t]) == f32(1.0):
                    lf = math.log(float(f32(freqs[t]))) if freqs[t] > 0 else float("-inf")
                    s = f32(s + lf)
            sdmfs[i] = s
        mxs = f32(0.0)
        for i in best:
            if sdmfs[i] > mxs:
                mxs = sdmfs[i]
        winners = [i for i in best if sdmfs[i] == mxs]
        if winners:
            best = winners
        return chunks[best[0]][1][0]

    # ------------------------------------------------------------------
    def tokenize(self, data: bytes) -> list[tuple[str, int]]:
        """[(token, overshorts_before_token)] for one buffer.

        NULs are replaced with spaces first (SetBuffer,
        src/sphinx.cpp:4693-4696).

        Dispatches to a vectorized pre-pass (numpy fold + token-run
        boundaries + first-codepoint dict gate) when the buffer and
        every dict word are valid UTF-8 — token-stream-identical to the
        scalar loop (equivalence pinned by tests/test_mmseg.py); falls
        back to the scalar byte scanner otherwise (the reference's
        invalid-byte recovery is inherently sequential).
        """
        if b"\0" in data:
            data = data.replace(b"\0", b" ")
        if self.dict.start_gate is not None:
            try:
                text = data.decode("utf-8")
            except UnicodeDecodeError:
                return self._tokenize_scalar(data)
            return self._tokenize_fast(data, text)
        return self._tokenize_scalar(data)

    def _tokenize_fast(self, data: bytes, text: str) -> list[tuple[str, int]]:
        """Vectorized main loop: one numpy pass computes per-codepoint
        folds, byte offsets, token-run ends and the dict-start gate;
        the Python loop then does O(1) work per *token* (the scalar
        loop does O(1) per *codepoint* and a hash probe per position).

        Exactness argument per step is inline; the scalar loop in
        `_tokenize_scalar` stays the source of truth under test.
        """
        cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        ncp = cps.size
        if ncp == 0:
            return []
        d = self.dict
        n = len(data)
        # byte length per codepoint -> byte offset of each codepoint
        blen = np.ones(ncp, dtype=np.int64)
        blen[cps >= 0x80] = 2
        blen[cps >= 0x800] = 3
        blen[cps >= 0x10000] = 4
        byte_off = np.zeros(ncp + 1, dtype=np.int64)
        np.cumsum(blen, out=byte_off[1:])
        # byte position -> codepoint index (dict words are whole
        # chars, so advance always lands on a char boundary)
        cp_at = np.empty(n + 1, dtype=np.int64)
        cp_at[:n] = np.repeat(np.arange(ncp, dtype=np.int64), blen)
        cp_at[n] = ncp
        folded = self.fold[cps]
        sep = folded == 0
        # next separator index at-or-after each position
        idx = np.arange(ncp, dtype=np.int64)
        nxt = np.where(sep, idx, ncp)
        next_sep = np.minimum.accumulate(nxt[::-1])[::-1]
        # first-codepoint gate: False => no dict word starts here
        gate = d.start_gate
        gn = len(gate)
        maybe = np.zeros(ncp, dtype=bool)
        in_range = cps < gn
        if in_range.any():
            maybe[in_range] = gate[cps[in_range]]

        # one whole-doc decode; per-token text is then a str slice
        # (folded values are fold-table outputs or 0, all valid
        # codepoints — identical bytes to the old per-token
        # codepoints_to_text, ~4x fewer numpy round trips)
        ftext = folded.astype("<u4", copy=False).tobytes().decode("utf-32-le")
        # plain-list views: the loop below reads one scalar per
        # iteration, and list indexing beats numpy scalar indexing ~5x
        sep_l = sep.tolist()
        maybe_l = maybe.tolist()
        next_sep_l = next_sep.tolist()
        byte_off_l = byte_off.tolist()
        cp_at_l = cp_at.tolist()
        out: list[tuple[str, int]] = []
        i = 0
        overshort = 0
        mwl = self.min_word_len
        cap = self.MAX_ACCUM_CP
        prefix_search = d.prefix_search
        # whole word decision memo: the chosen word length depends
        # only on the bytes in the full A+B+C search window (same
        # argument as _best_word_length's cache, which this subsumes
        # for the fast path — it also caches the common single-match
        # and no-match outcomes, cutting prefix_search to cache
        # misses only; 0 = no dict word starts here)
        wcache = self._bwl_cache
        wwin = self._bwl_window
        wcache_get = wcache.get
        while i < ncp:
            if maybe_l[i]:
                b = byte_off_l[i]
                key = data[b : b + wwin]
                wl = wcache_get(key)
                if wl is None:
                    m = prefix_search(data, b, 256)
                    if not m:
                        wl = 0
                    elif len(m) == 1:
                        wl = m[0][0]
                    else:
                        wl = self._best_word_length_impl(data, b)
                    if len(wcache) >= (1 << 17):
                        wcache.clear()
                    wcache[key] = wl
                if wl:
                    # dict word: raw bytes, bypasses min_word_len
                    out.append(
                        (data[b : b + wl].decode("utf-8", errors="replace"), overshort)
                    )
                    overshort = 0
                    i = cp_at_l[b + wl]
                    continue
            if sep_l[i]:
                # leading separator: scalar breaks back to dict search
                # at the next position
                i += 1
                continue
            # word-char run [i, e); scalar accumulates at most cap cps
            # then keeps consuming to the separator
            e = next_sep_l[i]
            naccum = e - i
            if naccum > cap:
                naccum = cap
            if naccum < mwl:
                if e >= ncp:
                    # EOF overshort is discarded, no token (scalar
                    # `ended` path increments nothing)
                    break
                overshort += 1
                i = e + 1
                continue
            out.append((ftext[i : i + naccum], overshort))
            overshort = 0
            if e >= ncp:
                break
            # rewind-to-separator quirk: window measured from PAST the
            # separator (m_pBufferMax - m_pCur); gate soundly skips the
            # search when no dict word can start at the separator
            if maybe_l[e] and prefix_search(
                data, byte_off_l[e], 256, n - byte_off_l[e + 1]
            ):
                i = e
            else:
                i = e + 1
        return out

    def _tokenize_scalar(self, data: bytes) -> list[tuple[str, int]]:
        """Reference-shaped sequential scanner (the exactness source of
        truth; serves invalid-UTF-8 buffers and non-UTF-8 dicts)."""
        if b"\0" in data:
            data = data.replace(b"\0", b" ")
        out: list[tuple[str, int]] = []
        n = len(data)
        cur = 0
        fold = self.fold
        fold_n = len(fold)
        while True:
            overshort = 0
            accum: list[int] = []
            naccum = 0  # codepoints accepted (cap 64); naccum tracks len
            word_len = 0
            tok: str | None = None
            ended = False
            while word_len == 0:
                matches = self.dict.prefix_search(data, cur, 256)
                if not matches:
                    # inline UTF-8 scanner (src/sphinx.cpp:4726-4855)
                    while True:
                        pcur = cur
                        if cur >= n:
                            code = -1
                        else:
                            code, cur = _decode_cp(data, cur)
                        if code < 0:
                            if naccum < self.min_word_len:
                                ended = True
                                break
                            tok = _encode_cps(accum)
                            ended = True
                            break
                        folded = int(fold[code]) if code < fold_n else 0
                        if folded == 0:
                            if naccum < self.min_word_len:
                                if naccum:
                                    overshort += 1
                                accum = []
                                naccum = 0
                                break  # back to dict search at cur
                            tok = _encode_cps(accum)
                            # rewind-to-separator quirk: window measured
                            # from past the separator (m_pBufferMax-m_pCur)
                            if self.dict.prefix_search(data, pcur, 256, n - cur):
                                cur = pcur
                            break
                        if naccum < self.MAX_ACCUM_CP:
                            accum.append(folded)
                            naccum += 1
                    if tok is not None or ended:
                        break
                    continue
                if len(matches) == 1:
                    word_len = matches[0][0]
                else:
                    word_len = self._best_word_length(data, cur)
            if tok is None and word_len:
                tok = data[cur : cur + word_len].decode("utf-8", errors="replace")
                cur += word_len
            if tok is not None:
                out.append((tok, overshort))
                if ended:
                    return out
                continue
            if ended:
                return out


def _decode_cp(data: bytes, pos: int) -> tuple[int, int]:
    """Decode one UTF-8 codepoint; invalid bytes yield their value
    (the reference scanner's recovery keeps scanning byte-wise)."""
    b0 = data[pos]
    if b0 < 0x80:
        return b0, pos + 1
    if b0 < 0xC0:
        return b0, pos + 1  # stray continuation
    if b0 < 0xE0:
        ln = 2
    elif b0 < 0xF0:
        ln = 3
    else:
        ln = 4
    chunk = data[pos : pos + ln]
    try:
        return ord(chunk.decode("utf-8")), pos + ln
    except (UnicodeDecodeError, TypeError):
        return b0, pos + 1


def _encode_cps(cps: list[int]) -> str:
    return "".join(chr(c) for c in cps)
