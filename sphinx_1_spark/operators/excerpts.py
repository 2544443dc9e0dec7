"""Excerpts (snippets): passage extraction + keyword highlighting.

Behavioral port of the reference excerpt generator
(ExcerptGen_c::BuildExcerpt, src/sphinxexcerpt.cpp:197-383; options
struct src/sphinxexcerpt.h:21-51):

  * the document is re-scanned into an alternating WORD / SPACE token
    stream that covers every source byte (junk between word tokens is
    split at whitespace boundaries, AddJunk src/sphinxexcerpt.cpp:159);
  * query words get a bit each; every document word token carries the
    mask of query words it matches — exact wordid equality or star
    wildcard substring forms (src/sphinxexcerpt.cpp:283-313);
  * if limit==0 or the document fits, highlight in place
    (HighlightAll :422); otherwise slide a window of at most
    2*around+1 word tokens / `limit` codepoints to enumerate candidate
    passages (ExtractPassages :537), score them by
    (wordcount, sum-of-word-weights * maxLCS, min-gap)
    (CalcPassageWeight :481, GetWeight :77), and greedily show the
    best ones under the codepoint budget via the reference's exact
    heap + shown-word-discount loop (HighlightBestPassages :698);
  * no matches -> leading tokens + chunk separator (HighlightStart :447).

Deviations (documented):
  * star/exact comparisons use the case-folded, morphology-normalized
    token string; the reference compares in-place-stemmed byte buffers
    against raw source-span lengths, which only diverges when
    morphology changes token length;
  * use_boundaries/phrase passages take an explicit `boundary_chars`
    set instead of tokenizer phrase_boundary state;
  * query word masks cap at 32 words (reference DWORD mask wraps
    silently past 32).

Spark surface: `excerpts(df, text_col, words, ...)` runs the
generator as a vectorized pandas UDF — one Arrow batch per call,
tokenizer built once per executor process.
"""

from __future__ import annotations

from functools import lru_cache

from dataclasses import dataclass, replace
from dataclasses import replace as replace_settings

import pandas as pd

from sphinx_1_spark.functions.tokenizer import (
    MAX_WORD_LEN,
    Tokenizer,
    TokenizerSettings,
)

TOK_NONE, TOK_WORD, TOK_SPACE, TOK_BREAK = 0, 1, 2, 3
_SPACE_CHARS = " \t\n\r"
MAX_HIGHLIGHT_WORDS = 32


@dataclass
class ExcerptOptions:
    """ExcerptQuery_t defaults (src/sphinxexcerpt.h:36-50)."""

    before_match: str = "<b>"
    after_match: str = "</b>"
    chunk_separator: str = " ... "
    limit: int = 256
    around: int = 5
    exact_phrase: bool = False
    single_passage: bool = False
    use_boundaries: bool = False
    weight_order: bool = False
    boundary_chars: str = ""


@dataclass
class _Tok:
    type: int
    start: int
    length: int  # source chars (codepoints == Python chars)
    words: int  # query-word bit mask
    show: int = 0  # reused as "owning passage" mark while growing


@dataclass
class _Passage:
    start: int = 0  # first token index
    tokens: int = 0
    codes: int = 0
    words: int = 0
    words_weight: int = 0
    word_count: int = 0
    max_lcs: int = 0
    min_gap: int = 0

    def weight(self) -> int:
        return self.word_count + self.words_weight * self.max_lcs + self.min_gap

    def less(self, other: "_Passage") -> bool:
        """Passage operator< (src/sphinxexcerpt.cpp:136): heap-top is
        the max weight, ties broken toward the LONGER passage."""
        a, b = self.weight(), other.weight()
        if a == b:
            return self.codes > other.codes
        return a > b


class _Keyword:
    __slots__ = ("text", "star_front", "star_back", "weight")

    def __init__(self, text: str, star_front: bool, star_back: bool):
        self.text = text
        self.star_front = star_front
        self.star_back = star_back
        self.weight = len(text)  # m_iWeight = m_iLengthCP


@lru_cache(maxsize=8)
def _cached_tokenizer(stg: TokenizerSettings) -> Tokenizer:
    """Per-worker tokenizer cache for the Arrow excerpt UDF."""
    return Tokenizer(stg)


def _parse_keywords(words: str, tokenizer: Tokenizer) -> list[_Keyword]:
    """Query tokenize + star detection (src/sphinxexcerpt.cpp:213-248):
    a star adjacent to the token in the raw string sets front/back."""
    out: list[_Keyword] = []
    raw = words
    pos = 0
    for tok in tokenizer.tokenize(words):
        # locate the raw occurrence to sniff adjacent stars; folding is
        # lowercasing here so a case-insensitive find is enough
        core = tok
        idx = raw.lower().find(core, pos)
        if idx < 0:  # morphology changed the token; no star detection
            out.append(_Keyword(tok, False, False))
            continue
        end = idx + len(core)
        front = idx > 0 and raw[idx - 1] == "*"
        back = end < len(raw) and raw[end] == "*"
        pos = end
        out.append(_Keyword(tok, front, back))
        if len(out) == MAX_HIGHLIGHT_WORDS:
            break
    return out


def _match_mask(tok: str, keywords: list[_Keyword]) -> int:
    mask = 0
    for i, kw in enumerate(keywords):
        star = (kw.star_front, kw.star_back)
        if star == (False, False):
            hit = tok == kw.text
        elif star == (True, False):
            hit = tok.endswith(kw.text)
        elif star == (False, True):
            hit = tok.startswith(kw.text)
        else:
            hit = kw.text in tok
        if hit:
            mask |= 1 << i
    return mask


def _scan_tokens(
    text: str,
    tokenizer: Tokenizer,
    keywords: list[_Keyword],
) -> list[_Tok]:
    """Source scan -> covering token stream (BuildExcerpt doc loop,
    src/sphinxexcerpt.cpp:250-330), driven by the real scalar scanner
    so specials/duals/synonyms/phrase boundaries behave exactly like
    indexing does.  Junk between tokens splits at whitespace flips
    with TOK_BREAK inserted at the tokenizer's phrase-boundary offset
    (AddJunk, src/sphinxexcerpt.cpp:159-194); stopword hits become
    SPACE tokens (wordid 0) keeping their source span."""
    s = tokenizer.settings
    toks: list[_Tok] = []

    def add_junk(start: int, length: int, boundary: int) -> None:
        # NO length<=0 early-out: the reference's AddJunk always
        # appends its final (possibly ZERO-length) TOK_SPACE
        # (src/sphinxexcerpt.cpp:185-191), so adjacent tokens — CJK
        # ngram specials, duals — are separated by a zero-length
        # space token that shifts every later token index; skipping
        # it diverged passage chunk arithmetic on such documents
        chunk = start
        saved = 0
        for i in range(start + 1, start + length):
            if (text[i] in _SPACE_CHARS) != (text[chunk] in _SPACE_CHARS):
                toks.append(_Tok(TOK_SPACE, chunk, i - chunk, 0))
                saved += i - chunk
                chunk = i
                if boundary != -1 and saved > boundary - start:
                    toks.append(_Tok(TOK_BREAK, 0, 0, 0))
                    boundary = -1
        toks.append(_Tok(TOK_SPACE, chunk, start + length - chunk, 0))
        if boundary != -1:
            toks.append(_Tok(TOK_BREAK, 0, 0, 0))

    sc = tokenizer.make_scanner()
    sc.set_buffer(text)
    last_end = 0
    while True:
        tok = sc.get_token()
        if tok is None:
            break
        start, end = sc.token_start, sc.token_end
        if start != 0:
            # the reference calls AddJunk for every token not at the
            # very buffer start (pTokenStart != pStartPtr,
            # src/sphinxexcerpt.cpp:260-264), INCLUDING zero-length
            # gaps between adjacent tokens
            add_junk(
                last_end,
                start - last_end,
                sc.boundary_offset if sc.token_boundary else -1,
            )
        norm = tokenizer._normalize(tok)
        if norm in s.stopwords:
            toks.append(_Tok(TOK_SPACE, start, end - start, 0))
        else:
            toks.append(
                _Tok(TOK_WORD, start, end - start, _match_mask(norm, keywords))
            )
        last_end = end
    if last_end != len(text):
        # "last space if any" (src/sphinxexcerpt.cpp:315-320): the
        # tail AddJunk runs only for a NONZERO gap
        add_junk(
            last_end,
            len(text) - last_end,
            sc.boundary_offset if sc.token_boundary else -1,
        )
    toks.append(_Tok(TOK_NONE, 0, 0, 0))
    return toks


def _calc_weight(
    word_idx: list[int],
    toks: list[_Tok],
    p: _Passage,
    keywords: list[_Keyword],
    max_words: int,
    word_count_coeff: int,
) -> None:
    """CalcPassageWeight (src/sphinxexcerpt.cpp:481-535)."""
    last = 0
    lcs = 1
    p.max_lcs = 1
    p.words = 0
    p.min_gap = max_words - 1
    for i, ti in enumerate(word_idx):
        uw = toks[ti].words
        p.words |= uw
        last = uw & (last << 1)
        if last:
            lcs += 1
            p.max_lcs = max(lcs, p.max_lcs)
        else:
            lcs = 1
            last = uw
        if uw:
            p.min_gap = min(p.min_gap, i, len(word_idx) - 1 - i)
    p.words_weight = 0
    p.word_count = 0
    for w in range(len(keywords)):
        if p.words & (1 << w):
            p.words_weight += keywords[w].weight
            p.word_count += 1
    p.max_lcs *= max_words
    p.word_count *= word_count_coeff


class _Generator:
    def __init__(
        self,
        text: str,
        toks: list[_Tok],
        keywords: list[_Keyword],
        q: ExcerptOptions,
    ):
        self.text = text
        self.toks = toks
        self.kw = keywords
        self.q = q
        self.exact_phrase = q.exact_phrase and len(keywords) > 1
        self.out: list[str] = []
        self.out_len = 0  # codepoints emitted (m_iResultLen)

    # -- emit ----------------------------------------------------------
    def emit_str(self, s: str) -> None:
        self.out.append(s)
        self.out_len += len(s)

    def emit_tok(self, t: _Tok) -> None:
        piece = self.text[t.start:t.start + t.length]
        self.out.append(piece)
        self.out_len += len(piece)

    # -- highlighting paths -------------------------------------------
    def highlight_all(self) -> None:
        """HighlightAll (src/sphinxexcerpt.cpp:422-445)."""
        q = self.q
        n = len(self.toks) - 1  # skip trailing TOK_NONE
        if self.exact_phrase:
            self.highlight_phrase(0, n - 1)
            return
        open_ = False
        for i in range(n):
            if (self.toks[i].words != 0) ^ open_:
                self.emit_str(q.after_match if open_ else q.before_match)
                open_ = not open_
            self.emit_tok(self.toks[i])
        if open_:
            self.emit_str(q.after_match)

    def highlight_phrase(self, tok: int, end: int) -> None:
        """HighlightPhrase (src/sphinxexcerpt.cpp:383-420): greedy
        scan for word tokens carrying bits 1,2,3,... in sequence with
        spaces allowed between."""
        toks, q = self.toks, self.q
        while tok <= end:
            while tok <= end and not toks[tok].words:
                self.emit_tok(toks[tok])
                tok += 1
            if tok > end:
                break
            start = tok
            match = True
            w = 0
            while w < len(self.kw):
                if tok > end or not (
                    toks[tok].type == TOK_SPACE or toks[tok].words == (1 << w)
                ):
                    match = False
                    break
                if toks[tok].type != TOK_SPACE:
                    w += 1
                tok += 1
            if not match:
                self.emit_tok(toks[start])
                tok = start + 1
                continue
            self.emit_str(q.before_match)
            for i in range(start, tok):
                self.emit_tok(toks[i])
            self.emit_str(q.after_match)

    def highlight_start(self) -> None:
        """HighlightStart (src/sphinxexcerpt.cpp:447-458)."""
        i = 0
        while self.out_len + self.toks[i].length < self.q.limit:
            self.emit_tok(self.toks[i])
            i += 1
            if i >= len(self.toks):
                break
        self.emit_str(self.q.chunk_separator)

    # -- passage extraction -------------------------------------------
    def extract_passages(self) -> list[_Passage]:
        """ExtractPassages (src/sphinxexcerpt.cpp:537-632): sliding
        window over the token stream capped by both 2*around+1 words
        and `limit` codepoints."""
        q = self.q
        if q.use_boundaries:
            return self.extract_phrases()
        toks = self.toks
        passages: list[_Passage] = []
        dpass: list[int] = []
        p = _Passage()
        max_words = 2 * q.around + 1
        lcs_thresh = len(self.kw) * max_words if self.exact_phrase else 0

        for i, t in enumerate(toks):
            if p.tokens == 0 and t.type != TOK_WORD:
                p.start += 1
                continue
            if p.codes + t.length > q.limit or len(dpass) == max_words:
                break
            p.tokens += 1
            p.codes += t.length
            if t.type == TOK_WORD:
                dpass.append(i)
                p.words |= t.words

        count = len(toks)
        while True:
            _calc_weight(dpass, toks, p, self.kw, max_words, 0)
            if p.words and p.max_lcs >= lcs_thresh:
                if not passages:
                    passages.append(replace(p))
                else:
                    last = passages[-1]
                    if (
                        last.words != p.words
                        or last.start + last.tokens - 1 < p.start
                    ):
                        passages.append(replace(p))
                    elif last.weight() < p.weight():
                        passages[-1] = replace(p)

            tok = p.start + p.tokens
            if tok == count:
                break
            while tok < count:
                p.tokens += 1
                p.codes += toks[tok].length
                if toks[tok].type == TOK_WORD:
                    dpass.append(tok)
                    break
                tok += 1
            if tok == count:
                continue
            while (p.codes > q.limit or len(dpass) > max_words) and p.tokens != 1:
                if toks[p.start].type == TOK_WORD:
                    dpass.pop(0)
                p.codes -= toks[p.start].length
                p.tokens -= 1
                p.start += 1
        return passages

    def extract_phrases(self) -> list[_Passage]:
        """ExtractPhrases (src/sphinxexcerpt.cpp:635-686): passages
        are the TOK_BREAK-delimited spans."""
        toks = self.toks
        max_words = 100
        lcs_thresh = len(self.kw) * max_words if self.exact_phrase else 0
        passages: list[_Passage] = []
        start = 0
        words = 0
        for i, t in enumerate(toks):
            if t.type in (TOK_BREAK, TOK_NONE):
                end = i - 1
                if start < end and words:
                    p = _Passage(start=start, tokens=end - start + 1)
                    dpass = []
                    for j in range(start, end + 1):
                        p.codes += toks[j].length
                        if toks[j].type == TOK_WORD:
                            dpass.append(j)
                    _calc_weight(dpass, toks, p, self.kw, max_words, 10000)
                    if p.max_lcs >= lcs_thresh:
                        passages.append(p)
                if t.type == TOK_NONE:
                    break
                start = i + 1
                words = 0
            if t.type == TOK_WORD:
                words |= t.words
        return passages

    # -- best-passage show --------------------------------------------
    def highlight_best(self, passages: list[_Passage]) -> bool:
        """HighlightBestPassages (src/sphinxexcerpt.cpp:698-904) with
        the reference's exact heap ops so equal-weight tie-breaks and
        the shown-word discount order are preserved."""
        q = self.q
        toks = self.toks
        show: list[_Passage] = []
        left = q.limit

        if (q.use_boundaries or left > 0) and passages:
            h = passages  # heapify in place, reference sift-up loop
            for i in range(1, len(h)):
                j = i
                while j != 0 and h[j].less(h[j >> 1]):
                    h[j >> 1], h[j] = h[j], h[j >> 1]
                    j >>= 1
            not_shown = 1 << (len(self.kw) - 1)
            while h:
                top = h[0]
                shown_words = 0
                if top.codes <= left or q.use_boundaries:
                    show.append(top)
                    left -= top.codes
                    shown_words = top.words
                    if q.single_passage:
                        break
                # RemoveFast(0) + sift down
                h[0] = h[-1]
                h.pop()
                entry = 0
                while True:
                    child = (entry << 1) + 1
                    if child >= len(h):
                        break
                    if child + 1 < len(h) and h[child + 1].less(h[child]):
                        child += 1
                    if not h[child].less(h[entry]):
                        break
                    h[child], h[entry] = h[entry], h[child]
                    entry = child
                if not_shown:
                    for i in range(len(h)):
                        if h[i].words & shown_words:
                            uw = shown_words
                            w = 0
                            while uw:
                                if (uw & 1) and (h[i].words & (1 << w)):
                                    h[i].words_weight -= self.kw[w].weight
                                w += 1
                                uw >>= 1
                            h[i].words &= ~shown_words
                        j = i
                        while j != 0 and h[j].less(h[j >> 1]):
                            h[j >> 1], h[j] = h[j], h[j >> 1]
                            j >>= 1
                not_shown &= ~shown_words

        if not show:
            return False

        if not q.weight_order:
            show.sort(key=lambda p: p.start)

        # grow passages up to the limit (src/sphinxexcerpt.cpp:831-886)
        last = -1
        length = 0
        for p in show:
            end = p.start + p.tokens - 1
            for t in range(p.start, end + 1):
                if t > last:
                    length += toks[t].length
            last = end
        if length < q.limit and not q.use_boundaries:
            # Reference quirk (src/sphinxexcerpt.cpp:814-821): token
            # ownership is marked by reusing m_iWordID with sentinel 0,
            # and the owning mark for passage 0 is ALSO 0 — so passage
            # 0's tokens read as unclaimed and remain re-grabbable by
            # any passage's grow step. Preserved verbatim.
            for t in toks:
                t.show = 0
            for i, p in enumerate(show):
                for t in range(p.start, p.start + p.tokens):
                    if toks[t].show == 0:
                        toks[t].show = i
            left = q.limit - length
            last_left = 0
            while left > 0 and left != last_left:
                last_left = left
                for i, p in enumerate(show):
                    if left <= 0:
                        break
                    t = p.start - 1
                    if t >= 0 and toks[t].show == 0 and left >= toks[t].length:
                        left -= toks[t].length
                        toks[t].show = i
                        p.start -= 1
                        p.tokens += 1
                    t = p.start + p.tokens
                    if (
                        t < len(toks)
                        and toks[t].show == 0
                        and left >= toks[t].length
                    ):
                        left -= toks[t].length
                        toks[t].show = i
                        p.tokens += 1

        # show (src/sphinxexcerpt.cpp:888-903)
        last = -1
        for p in show:
            tok = p.start
            end = tok + p.tokens - 1
            if tok > 1 + last or q.weight_order:
                self.emit_str(q.chunk_separator)
            if self.exact_phrase:
                self.highlight_phrase(tok, end)
            else:
                while tok <= end:
                    if tok > last or q.weight_order:
                        if toks[tok].words:
                            self.emit_str(q.before_match)
                            self.emit_tok(toks[tok])
                            self.emit_str(q.after_match)
                        else:
                            self.emit_tok(toks[tok])
                    tok += 1
            last = end
        if last != len(toks) - 1:
            self.emit_str(q.chunk_separator)
        return True


def _excerpt_tokenizer(q: "ExcerptOptions", tk: Tokenizer) -> Tokenizer:
    """Boundary-aware tokenizer upgrade (shared by the one-doc API and
    the Arrow UDF so both paths parse keywords with the same tk)."""
    if (
        q.use_boundaries
        and q.boundary_chars
        and not tk.settings.phrase_boundary
    ):
        # convenience: explicit boundary chars build a boundary-aware
        # tokenizer when the index settings carry none
        spec = ", ".join(f"U+{ord(c):04X}" for c in q.boundary_chars)
        return Tokenizer(replace_settings(tk.settings, phrase_boundary=spec))
    return tk


def build_excerpt(
    text: str,
    words: str,
    options: ExcerptOptions | None = None,
    tokenizer: Tokenizer | TokenizerSettings | None = None,
    keywords: "list[_Keyword] | None" = None,
) -> str:
    """sphBuildExcerpt (src/sphinxexcerpt.cpp:907) for one document.

    `keywords`: pre-parsed keyword list (from _parse_keywords with
    THIS tokenizer) — the query string is invariant across documents,
    so batch callers parse once instead of once per row."""
    q = options or ExcerptOptions()
    if isinstance(tokenizer, Tokenizer):
        tk = tokenizer
    else:
        tk = Tokenizer(tokenizer)
    tk = _excerpt_tokenizer(q, tk)
    if keywords is None:
        keywords = _parse_keywords(words, tk)
    toks = _scan_tokens(text, tk, keywords)
    source_codes = sum(t.length for t in toks)

    gen = _Generator(text, toks, keywords, q)
    if q.limit <= 0 or q.limit > source_codes:
        gen.highlight_all()
    else:
        passages = gen.extract_passages()
        if not (passages and gen.highlight_best(passages)):
            gen.highlight_start()
    return "".join(gen.out)


# ----------------------------------------------------------------------
def excerpts(
    df,
    text_col: str,
    words: str,
    options: ExcerptOptions | None = None,
    settings: TokenizerSettings | None = None,
    out_col: str = "excerpt",
):
    """DataFrame-level BuildExcerpts: adds `out_col` with the
    highlighted snippet of `text_col`.  Arrow-batched; the tokenizer
    is cached per worker (TokenizerSettings is hashable — an MMSEG
    config loads its dictionary once, not once per batch) and the
    keyword list is parsed once per batch, not once per row."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    opts = options or ExcerptOptions()
    stg = settings or TokenizerSettings()

    @F.pandas_udf(StringType())
    def _excerpt(texts: pd.Series) -> pd.Series:
        tk = _excerpt_tokenizer(opts, _cached_tokenizer(stg))
        kws = _parse_keywords(words, tk)
        return texts.map(
            lambda t: build_excerpt(t or "", words, opts, tk, keywords=kws)
        )

    return df.withColumn(out_col, _excerpt(F.col(text_col)))
