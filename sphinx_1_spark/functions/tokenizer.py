"""UTF-8 tokenizer with Sphinx position arithmetic.

Semantic parity points (reference):
  - token = maximal run of codepoints whose charset_table fold is
    nonzero (CSphTokenizer_UTF8::GetToken, src/sphinx.cpp:4238-4410);
  - min_word_len drops short tokens but still advances position by
    overshort_step (src/sphinx.cpp:18528-18531, default step 1);
  - per-field position counter starts at HIT_PACK(field, 0) and steps
    +1 per emitted-or-overshort token, so the first token of a field
    sits at in-field position 1 (src/sphinx.cpp:18513-18531);
  - wordpos packing: field<<24 | pos&0x7fffff, with bit 0x800000
    (HIT_FIELD_END) set on all hits sharing the last position of the
    field (src/sphinx.cpp:229-241, 18666-18672);
  - max token length 64 codepoints (SPH_MAX_WORD_LEN,
    src/sphinx.h:145; AccumCodepoint src/sphinx.cpp:2231-2247):
    longer runs are truncated to their first 64 codepoints (tail
    codepoints are consumed, no extra token).

Everything is numpy-vectorized per document: UTF-32 view -> fold map
fancy-index -> run-length boundaries. No per-codepoint Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np

from sphinx_1_spark.functions.charset import (
    SPHINX_DEFAULT_UTF8_TABLE,
    build_fold_table,
    codepoints_to_text,
    fold_codepoints,
    text_to_codepoints,
)

MAX_WORD_LEN = 64  # SPH_MAX_WORD_LEN, src/sphinx.h:145
HIT_FIELD_END = 0x800000  # src/sphinx.cpp:241
POS_MASK = 0x7FFFFF
_EMPTY_POS = np.zeros(0, dtype=np.int32)


def hit_pack(field_id: int, pos: int) -> int:
    """HIT_PACK (src/sphinx.cpp:229)."""
    return (field_id << 24) | (pos & POS_MASK)


@dataclass(frozen=True)
class TokenizerSettings:
    charset_table: str = SPHINX_DEFAULT_UTF8_TABLE
    min_word_len: int = 1
    overshort_step: int = 1
    stopwords: frozenset[str] = dc_field(default_factory=frozenset)
    stopword_step: int = 1
    # wordforms: token -> normal form, applied BEFORE the stopword
    # check (CSphDictCRC::GetWordID order: ApplyWordforms then
    # FilterStopword, src/sphinx.cpp:16999-17040); tuple-of-pairs so
    # the settings object stays hashable
    wordforms: tuple = ()
    # morphology chain (ApplyStemmers, src/sphinx.cpp:17005-17020):
    # processor names from functions/morphology.py, applied in order
    # until one changes the token; skipped entirely on a wordforms hit
    # or when len(token) < min_stemming_len (guard only active > 1)
    morphology: tuple = ()
    min_stemming_len: int = 1
    # CJK extensions (see mmseg.py): codepoints segmented 1-per-token
    ngram_chars: str = ""  # spec string like "U+4E00..U+9FBF"
    mmseg_dict_path: str | None = None
    # --- advanced scanner features (functions/scanner.py port) ------
    # specials: 1-char standalone tokens; charset chars become duals
    # (AddSpecials, src/sphinx.cpp:2585)
    specials: str = ""
    # synonyms: raw "from words => to" lines (LoadSynonyms,
    # src/sphinx.cpp:3310); multi-word map-from merges token spans
    synonyms: tuple = ()
    # ignore_chars / phrase_boundary: charset-spec strings
    ignore_chars: str = ""
    phrase_boundary: str = ""
    boundary_step: int = 0
    # escaped: backslash-escaping query-parser clone mode
    escaped: bool = False
    # multiforms: multi-word wordforms, raw "w1 w2 ... > normal"
    # lines in folded form (CSphMultiformContainer + the token filter
    # CSphTokenizer_Filter, src/sphinx.cpp:4954-5092)
    multiforms: tuple = ()
    # index_exact_words: additionally index the raw (pre-morphology)
    # form of every token as "=<raw>", enabling =word exact-form
    # queries (src/sphinx.cpp:18700-18716; MAGIC_WORD_HEAD_NONSTEMMED
    # is spelled "=" here — '=' can never occur inside a token)
    index_exact_words: bool = False
    # index-time substring expansion (src/sphinx.cpp:18596-18663,
    # MAGIC_WORD_HEAD spelled "*" — '*' never occurs inside a token):
    #   min_prefix_len > 0: every token additionally indexed as
    #     "*<prefix>" for each prefix of length >= min_prefix_len
    #     (including the full word), so `word*` queries are a single
    #     O(1) dictionary lookup instead of a dictionary scan.
    #   min_infix_len > 0: every substring of length >= min_infix_len
    #     indexed as "*<substring>", serving `*word*` contains
    #     queries the same way (O(len^2) index blowup, as in the
    #     reference).  Mutually exclusive, prefix wins if both set.
    # Expanded hits share the source token's position (field-end bit
    # included), so phrases over starred terms stay positional.
    min_prefix_len: int = 0
    min_infix_len: int = 0


class Tokenizer:
    """Deterministic, driver/executor-shareable tokenizer.

    Construct once per partition (cheap: fold table is lru_cached per
    process) inside pandas UDFs; also used directly by the pure-Python
    oracle so engine and oracle share one tokenization definition.
    """

    def __init__(self, settings: TokenizerSettings | None = None):
        self.settings = settings or TokenizerSettings()
        if self.settings.index_exact_words and not any(
            m and m != "none" for m in self.settings.morphology
        ):
            # indexer resets exact words when there is no morphology
            # ("no morphology, index_exact_words=1 has no effect,
            # ignoring", src/indexer.cpp:960-964) — plain and exact
            # forms would be identical entries
            import dataclasses as _dc

            self.settings = _dc.replace(
                self.settings, index_exact_words=False
            )
        self.fold = build_fold_table(self.settings.charset_table)
        self._wordforms = dict(self.settings.wordforms)
        self._morph: list = []
        self._morph_cache: dict[str, str] = {}
        if self.settings.morphology:
            from sphinx_1_spark.functions.morphology import resolve_chain

            self._morph = resolve_chain(self.settings.morphology)
        self._ngram_mask = None
        if self.settings.ngram_chars:
            # ngram_chars carries its own remaps (SetNgramChars feeds
            # AddRemaps into the shared lowercaser, src/sphinx.cpp:
            # 4927-4939) — e.g. test_14 folds U+410..U+42F->U+430..
            ng = build_fold_table(self.settings.ngram_chars)
            self._ngram_mask = ng != 0
            self._ngram_fold = ng
        self._mmseg = None
        if self.settings.mmseg_dict_path:
            from sphinx_1_spark.functions.mmseg import ChineseTokenizer, MMSegDict

            self._mmseg = ChineseTokenizer(
                MMSegDict.load_cached(self.settings.mmseg_dict_path),
                self.fold,
                self.settings.min_word_len,
            )
        # advanced scanner: specials/synonyms/ignore/boundary/escaped
        # (ISphTokenizer::Create setup order, src/sphinx.cpp:3215-3273,
        # with specials applied pre-synonyms as the callers do)
        s = self.settings
        self._advanced = bool(
            s.specials or s.synonyms or s.ignore_chars or s.phrase_boundary
            or s.escaped or s.multiforms
        )
        self._lc = None
        self._syns: list = []
        self._multiforms = None

    def _build_lc(self):
        """Flagged lowercaser + synonyms for the scalar scanner
        (ISphTokenizer::Create setup order, src/sphinx.cpp:3215-3273,
        specials applied pre-synonyms as the callers do)."""
        from sphinx_1_spark.functions.charset import (
            FLAG_BOUNDARY,
            FLAG_IGNORE,
            FLAG_NGRAM,
            FLAG_SPECIAL,
            Lowercaser,
            parse_charset_ranges,
        )
        from sphinx_1_spark.functions.scanner import (
            parse_synonyms,
            register_synonym_codepoints,
        )

        s = self.settings
        lc = Lowercaser(s.charset_table)
        if s.specials:
            lc.add_specials(s.specials)
        if s.synonyms:
            self._syns = parse_synonyms(s.synonyms)
            register_synonym_codepoints(self._syns, lc)
        if s.phrase_boundary:
            lc.add_flagged(
                s.phrase_boundary, FLAG_BOUNDARY, True, "phrase boundary"
            )
        if s.ignore_chars:
            lc.add_flagged(s.ignore_chars, FLAG_IGNORE, True, "ignored")
        if s.ngram_chars:
            lc.add_remaps(
                parse_charset_ranges(s.ngram_chars),
                FLAG_NGRAM | FLAG_SPECIAL,
                FLAG_NGRAM | FLAG_SPECIAL,
            )
        if s.escaped:
            # escaped clones add backslash as a special so the
            # escape handler sees it (CloneBase, src/sphinx.cpp:3582)
            lc.add_specials("\\")
        self._lc = lc

    def make_scanner(self):
        """A fresh streaming Scanner over this tokenizer's lowercaser
        (excerpts + the advanced-config emit path)."""
        from sphinx_1_spark.functions.scanner import Scanner

        if self._lc is None:
            self._build_lc()
        sc = Scanner(
            self._lc,
            self._syns,
            self.settings.min_word_len,
            self.settings.escaped,
        )
        if self.settings.multiforms:
            from sphinx_1_spark.functions.scanner import (
                MultiformContainer,
                MultiformScanner,
            )

            if self._multiforms is None:
                self._multiforms = MultiformContainer(self.settings.multiforms)
            return MultiformScanner(sc, self._multiforms)
        return sc

    # ------------------------------------------------------------------
    def _normalize(self, tok: str) -> str:
        """ApplyStemmers (src/sphinx.cpp:17005): a wordforms hit is
        terminal; otherwise the morphology chain runs.  The caller
        applies the stopword filter to the RESULT (GetWordID order,
        src/sphinx.cpp:17023-17027)."""
        nf = self._wordforms.get(tok)
        if nf is not None:
            return nf
        if self._morph:
            from sphinx_1_spark.functions.morphology import apply_morphology

            return apply_morphology(
                tok,
                self._morph,
                self.settings.min_stemming_len,
                self._morph_cache,
            )
        return tok

    # ------------------------------------------------------------------
    def tokenize(self, text: str) -> list[str]:
        """Plain token list (no positions) — fold, split on zero-folds."""
        return [t for t, _ in self.tokenize_with_positions(text)]

    def tokenize_with_positions(self, text: str) -> list[tuple[str, int]]:
        """Returns [(token, in_field_pos)] with Sphinx stepping.

        Positions are 1-based; dropped overshort tokens advance the
        counter by overshort_step; stopwords advance by stopword_step
        but emit nothing.
        """
        return [(n, p) for _, n, p in self._full_stream(text) if n is not None]

    def _full_stream(self, text: str) -> list[tuple[str, str | None, int]]:
        """[(raw_folded, normalized_or_None, pos)] for every token the
        scanner keeps; normalized is None for stopword hits (wordid 0
        — they still consume a position, which index_exact_words hits
        reuse, src/sphinx.cpp:18700-18727)."""
        if self._mmseg is not None:
            return self._emit_mmseg(self._mmseg.tokenize(text.encode("utf-8")))
        if self._advanced:
            return self._emit_scanner(text)
        cps = text_to_codepoints(text)
        folded = fold_codepoints(cps, self.fold)
        if self._ngram_mask is not None:
            return self._tokenize_cjk(cps, folded)
        return self._emit(self._runs(folded))

    def _emit_scanner(self, text: str) -> list[tuple[str, str | None, int]]:
        """Position stepping over the full scalar scanner (BuildHits
        loop, src/sphinx.cpp:18528-18531): pos += last_step +
        overshorts*overshort_step, then the phrase-boundary bump
        max(pos+boundary_step, 1)."""
        s = self.settings
        sc = self.make_scanner()
        sc.set_buffer(text)
        out: list[tuple[str, str | None, int]] = []
        pos = 0
        step = 1
        while True:
            raw = sc.get_token()
            if raw is None:
                break
            pos += step + sc.overshort_count * s.overshort_step
            if sc.token_boundary:
                pos = max(pos + s.boundary_step, 1)
            step = 1
            tok = self._normalize(raw)
            if tok in s.stopwords:
                step = s.stopword_step
                out.append((raw, None, pos))
                continue
            out.append((raw, tok, pos))
        return out

    def _emit_mmseg(self, toks: list[tuple[str, int]]) -> list[tuple[str, int]]:
        """Position stepping over ChineseTokenizer output: each token
        advances by 1 + overshorts_in_call*overshort_step
        (src/sphinx.cpp:18528); stopwords still step by stopword_step.
        min_word_len was already applied inside GetToken (dict words
        bypass it, matching the reference)."""
        s = self.settings
        if not self._wordforms and not self._morph and not s.stopwords:
            # raw==normalized and step is always 1: pure position
            # arithmetic, no _normalize/stopword probe per token
            out_f: list[tuple[str, str | None, int]] = []
            pos = 0
            ostep = s.overshort_step
            for raw, overshorts in toks:
                pos += 1 + overshorts * ostep
                out_f.append((raw, raw, pos))
            return out_f
        out: list[tuple[str, str | None, int]] = []
        pos = 0
        step = 1
        for raw, overshorts in toks:
            pos += step + overshorts * s.overshort_step
            step = 1
            tok = self._normalize(raw)
            if tok in s.stopwords:
                step = s.stopword_step
                out.append((raw, None, pos))
                continue
            out.append((raw, tok, pos))
        return out

    # ------------------------------------------------------------------
    def _runs(self, folded: np.ndarray) -> list[np.ndarray]:
        """Maximal nonzero runs of the folded codepoint array."""
        if folded.size == 0:
            return []
        nz = folded != 0
        # boundaries where nz flips
        diff = np.diff(nz.astype(np.int8))
        starts = np.flatnonzero(diff == 1) + 1
        ends = np.flatnonzero(diff == -1) + 1
        if nz[0]:
            starts = np.concatenate(([0], starts))
        if nz[-1]:
            ends = np.concatenate((ends, [folded.size]))
        return [folded[s:e] for s, e in zip(starts, ends)]

    def _emit(
        self, runs: list[np.ndarray], exempt: list[bool] | None = None
    ) -> list[tuple[str, int]]:
        s = self.settings
        out: list[tuple[str, str | None, int]] = []
        pos = 0
        step = 1
        for ri, run in enumerate(runs):
            if (exempt is None or not exempt[ri]) and run.size < s.min_word_len:
                # overshort: dropped, position advances extra
                step += s.overshort_step
                continue
            pos += step
            step = 1
            raw = codepoints_to_text(run[:MAX_WORD_LEN])
            tok = self._normalize(raw)
            if tok in s.stopwords:
                # stopword: no plain hit; next token's step includes
                # stopword_step (Sphinx: wordid==0 -> iLastStep =
                # stopword_step, src/sphinx.cpp:18725-18727)
                step = s.stopword_step
                out.append((raw, None, pos))
                continue
            out.append((raw, tok, pos))
        return out

    # ------------------------------------------------------------------
    def _tokenize_cjk(self, cps: np.ndarray, folded: np.ndarray) -> list[tuple[str, int]]:
        """N-gram CJK path: ngram_chars codepoints become 1-char tokens
        (CSphTokenizer_UTF8Ngram, src/sphinx.cpp:4943-4947).  The MMSEG
        dictionary path is handled wholesale by functions/mmseg.py."""
        # Build a per-codepoint class: 0 = separator, 1 = word char, 2 = CJK
        cls = (folded != 0).astype(np.int8)
        if self._ngram_mask is not None and cps.size:
            cjk = self._ngram_mask[cps]
            cls[cjk] = 2
            # CJK chars fold through the ngram table's own remaps
            folded = np.where(cjk, self._ngram_fold[cps], folded)
        # runs of equal nonzero class — boundary detection vectorized
        # (the old per-codepoint while loop scanned every char in
        # Python; this is O(runs))
        pieces: list[tuple[int, np.ndarray]] = []  # (cls, folded_run)
        n = cps.size
        if n:
            starts = np.flatnonzero(
                np.concatenate(([True], cls[1:] != cls[:-1]))
            )
            ends = np.concatenate((starts[1:], [n]))
            for s, e in zip(starts.tolist(), ends.tolist()):
                c = cls[s]
                if c != 0:
                    pieces.append((int(c), folded[s:e]))
        # expand CJK runs into 1-char tokens; ngram chars are
        # FLAG_CODEPOINT_SPECIAL (SetNgramChars, src/sphinx.cpp:4927-4929)
        # and a special is returned as a standalone token with NO
        # min_word_len check (GetToken handles the special before the
        # overshort test, src/sphinx.cpp:4327-4360) — only the
        # accumulated word preceding it is overshort-filtered
        runs: list[np.ndarray] = []
        exempt: list[bool] = []
        for c, run in pieces:
            if c == 1:
                runs.append(run)
                exempt.append(False)
            else:
                runs.extend(run[k : k + 1] for k in range(run.size))
                exempt.extend([True] * run.size)
        return self._emit(runs, exempt)

    # ------------------------------------------------------------------
    @property
    def _fast_path_ok(self) -> bool:
        """The vectorized tokenize path is exact when there are no
        overshort/stopword steps to track (min_word_len<=1, no
        stopwords), no MMSEG dictionary, and the fold table maps no
        codepoint into the whitespace class str.split() uses."""
        s = self.settings
        if (
            s.min_word_len > 1
            or s.stopwords
            or s.wordforms
            or s.morphology
            or self._mmseg is not None
            or self._advanced
            or s.index_exact_words
        ):
            return False
        if not hasattr(self, "_fold_ws_free"):
            targets = np.unique(self.fold[self.fold != 0])
            ws = np.array(
                [c for c in range(0x3001) if chr(c).isspace()], dtype=np.uint32
            )
            self._fold_ws_free = not np.isin(targets, ws).any()
        return self._fold_ws_free

    def _fast_tokens(self, text: str) -> list[str]:
        """Vectorized tokenize: fold via one fancy-index, separators
        become spaces, CJK ngram chars get space-injected boundaries,
        then one C-speed str.split().  Token-stream-identical to the
        scalar path (equivalence pinned by tests)."""
        cps = text_to_codepoints(text)
        if cps.size == 0:
            return []
        folded = self.fold[cps]
        if self._ngram_mask is not None:
            cjk = self._ngram_mask[cps]
            if cjk.any():
                folded = np.where(cjk, self._ngram_fold[cps], folded)
                # space before every CJK char and after each CJK run
                prev_cjk = np.concatenate(([False], cjk[:-1]))
                idx = np.flatnonzero(cjk | prev_cjk)
                folded = np.insert(folded, idx, np.uint32(32))
        np.place(folded, folded == 0, 32)
        toks = codepoints_to_text(folded).split()
        # 64-codepoint truncation: over-long tokens are rare, so probe
        # with one C-speed max(map(len, ...)) pass before paying the
        # per-token conditional rebuild
        if toks and max(map(len, toks)) > MAX_WORD_LEN:
            return [
                t if len(t) <= MAX_WORD_LEN else t[:MAX_WORD_LEN]
                for t in toks
            ]
        return toks

    @property
    def fast_batch_path_ok(self) -> bool:
        """batch_token_arrays is token/position-identical to calling
        hits_arrays_single_field per doc: the per-doc fast path must
        apply (fast_array_path_ok) and the fold table must keep
        U+0000 a separator (it always is in practice — charset specs
        cannot express NUL — but the batch splitter's zero-padding
        trick depends on it, so it is gated, not assumed)."""
        return self.fast_array_path_ok and int(self.fold[0]) == 0

    def batch_token_arrays(
        self, texts: list[str]
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Whole-batch vectorized tokenization (the 100 TB hot path).

        One fold + run-detection pass over the CONCATENATION of all
        docs in the Arrow batch — zero per-doc numpy calls, zero
        per-token Python strings.  Returns
          (mat, lens, counts, pos):
          mat    uint32[(ntok, width)] — folded codepoints per token,
                 zero-padded; width = longest token in batch (<= 64).
                 Viewing rows as fixed-width void keys groups equal
                 tokens by memcmp — the caller sorts/uniques those
                 keys instead of Python strings (token text contains
                 no U+0000, so padding never collides with content).
          lens   int64[ntok] token codepoint lengths (post 64-cap)
          counts int64[len(texts)] tokens per doc
          pos    int32[ntok] packed in-field positions, 1-based, with
                 HIT_FIELD_END on each doc's trailing token
                 (src/sphinx.cpp:18666-18672; positions unique here)

        Semantics are exactly the scalar path's (maximal nonzero-fold
        runs; ngram CJK chars standalone; 64-cp truncation consumes
        the tail, src/sphinx.cpp:2231-2247) — doc boundaries are
        enforced mask-wise, so no separator codepoint is ever
        injected and adjacent docs can never merge a token.
        Equivalence with the per-doc path is fuzz-pinned in tests.
        """
        ndocs = len(texts)
        tlens = np.fromiter(
            (len(t) for t in texts), dtype=np.int64, count=ndocs
        )
        off = np.concatenate(([0], np.cumsum(tlens)))
        big = "".join(texts)
        n = len(big)
        if n == 0:
            return (
                np.zeros((0, 1), dtype=np.uint32),
                np.zeros(0, dtype=np.int64),
                np.zeros(ndocs, dtype=np.int64),
                _EMPTY_POS,
            )
        cps = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
        folded = self.fold[cps]
        doc_start = np.zeros(n, dtype=bool)
        starts_lt_n = off[:-1][off[:-1] < n]
        doc_start[starts_lt_n] = True

        # CJK overlay FIRST: ngram chars fold through the ngram
        # table's own remaps and are word chars (standalone tokens),
        # so the nonzero mask below must already see them
        cjk = None
        if self._ngram_mask is not None:
            cjk = self._ngram_mask[cps]
            if cjk.any():
                folded = np.where(cjk, self._ngram_fold[cps], folded)
            else:
                cjk = None

        nz = folded != 0
        prev_nz = np.empty(n, dtype=bool)
        prev_nz[0] = False
        prev_nz[1:] = nz[:-1]
        next_nz = np.empty(n, dtype=bool)
        next_nz[-1] = False
        next_nz[:-1] = nz[1:]
        next_doc_start = np.empty(n, dtype=bool)
        next_doc_start[-1] = True
        next_doc_start[:-1] = doc_start[1:]

        if cjk is not None:
            prev_cjk = np.empty(n, dtype=bool)
            prev_cjk[0] = False
            prev_cjk[1:] = cjk[:-1]
            next_cjk = np.empty(n, dtype=bool)
            next_cjk[-1] = False
            next_cjk[:-1] = cjk[1:]
            starts_mask = nz & (~prev_nz | doc_start | cjk | prev_cjk)
            ends_mask = nz & (~next_nz | next_doc_start | cjk | next_cjk)
        else:
            starts_mask = nz & (~prev_nz | doc_start)
            ends_mask = nz & (~next_nz | next_doc_start)

        starts = np.flatnonzero(starts_mask)
        ends = np.flatnonzero(ends_mask) + 1
        lens = np.minimum(ends - starts, MAX_WORD_LEN)
        ntok = starts.size
        if ntok == 0:
            return (
                np.zeros((0, 1), dtype=np.uint32),
                lens,
                np.zeros(ndocs, dtype=np.int64),
                _EMPTY_POS,
            )

        doc_idx = np.searchsorted(off, starts, side="right") - 1
        counts = np.bincount(doc_idx, minlength=ndocs)
        first_tok = np.concatenate(([0], np.cumsum(counts)))[:-1]
        pos = (
            np.arange(ntok, dtype=np.int32)
            - np.repeat(first_tok, counts).astype(np.int32)
            + 1
        )
        last_tok = np.cumsum(counts) - 1
        pos[last_tok[counts > 0]] |= HIT_FIELD_END

        width = int(lens.max())
        col = np.arange(width)
        idx = starts[:, None] + col[None, :]
        mat = folded[np.minimum(idx, n - 1)]
        mat[col[None, :] >= lens[:, None]] = 0
        return np.ascontiguousarray(mat), lens, counts, pos

    @staticmethod
    def decode_token_rows(
        mat: np.ndarray, lens: np.ndarray, rows: np.ndarray
    ) -> list[str]:
        """Materialize Python strings for selected batch_token_arrays
        rows (one utf-32 decode for all of them, then cheap slicing —
        called once per UNIQUE word per batch, not per token)."""
        sub = mat[rows]
        sel_lens = lens[rows]
        keep = np.arange(mat.shape[1])[None, :] < sel_lens[:, None]
        text = (
            sub[keep].astype("<u4").tobytes().decode("utf-32-le")
        )
        offs = np.concatenate(([0], np.cumsum(sel_lens)))
        return [
            text[offs[k] : offs[k + 1]] for k in range(rows.size)
        ]

    @property
    def fast_array_path_ok(self) -> bool:
        """hits_arrays_single_field is hit-identical to
        hits_for_doc([text]): the vectorized token fast path applies
        AND there are no star expansions (min_prefix/infix_len unset),
        so every kept token emits exactly one (token, packed_pos)."""
        s = self.settings
        return (
            self._fast_path_ok
            and not s.min_prefix_len
            and not s.min_infix_len
        )

    def hits_arrays_single_field(self, text: str) -> tuple[list[str], "np.ndarray"]:
        """(tokens, packed positions int32[n]) for ONE whole field.

        Columnar twin of hits_for_doc([text]) under fast_array_path_ok
        (equivalence fuzz-pinned in tests): the fused segment builders
        consume hits as parallel arrays, so building a per-hit tuple
        list only to tear it apart again costs ~2 allocations + 2
        iterations per hit — at ~34 hits/page that is a measurable
        slice of the build's per-doc Python.  Positions are 1-based
        ordinals (fast path: no overshort/stopword steps) with
        HIT_FIELD_END on the trailing hit (src/sphinx.cpp:18666-18672;
        positions are unique here so only the last hit carries it)."""
        toks = self._fast_tokens(text)
        n = len(toks)
        if not n:
            return toks, _EMPTY_POS
        wp = np.arange(1, n + 1, dtype=np.int32)
        wp[n - 1] |= HIT_FIELD_END
        return toks, wp

    def hits_for_doc(
        self,
        fields: list[str | None],
        wordparts: list[str] | None = None,
    ) -> list[tuple[str, int]]:
        """All (token, packed_wordpos) hits for one document.

        Field ids are the list ordinals (SPH_MAX_FIELDS=32 cap,
        src/sphinx.h:147); trailing hits of each field carry
        HIT_FIELD_END (src/sphinx.cpp:18666-18672).

        `wordparts` gives each field's expansion kind ("whole" /
        "prefix" / "infix" — SPH_WORDPART, src/sphinx.h:789-792,
        prefix_fields/infix_fields config).  Default: every field is
        prefix (min_prefix_len set), infix (min_infix_len set), or
        whole.

        Star-index dictionary namespaces mirror the reference's magic
        markers, UNIFIED with the plain-word space exactly as the
        reference CRCs them (src/sphinx.cpp:18534-18663):
          "^*s$"  stemmed full word, both anchors  (\\1stem\\1 via
                  GetWordIDWithMarkers — what a non-starred query
                  word resolves to when enable_star=1)
          "s"     bare substring/prefix expansions over the RAW
                  (pre-morphology) word — the SAME namespace as plain
                  words, which is what makes enable_star=0 implicit
                  substring matching work
          "^*s"   word-start anchored infix  (MAGIC_WORD_HEAD + s)
          "s$"    word-end anchored infix    (s + MAGIC_WORD_TAIL)
        Anchored forms are emitted only when min_infix_len>0
        (bInfixMode, src/sphinx.cpp:18517).  The bare stemmed form is
        additionally emitted when stemming changed the word
        (src/sphinx.cpp:18578-18588) and for words too short to expand
        (src/sphinx.cpp:18595-18607) — both reference quirks kept for
        df/tf parity (a short stemmed-differently word emits its stem
        twice).  Stopword tokens are never expanded
        (GetWordIDWithMarkers returns 0 -> continue,
        src/sphinx.cpp:17034-17042).
        """
        s = self.settings
        mp, mi = s.min_prefix_len, s.min_infix_len
        star = bool(mp or mi)
        if wordparts is None:
            default_wp = "prefix" if mp else ("infix" if mi else "whole")
            wordparts = [default_wp] * len(fields)
        infix_mode = mi > 0
        fast = self._fast_path_ok
        exact = s.index_exact_words
        stops = s.stopwords
        out: list[tuple[str, int]] = []
        for fid, text in enumerate(fields):
            if not text:
                continue
            base = fid << 24
            kind = wordparts[fid] if fid < len(wordparts) else "whole"
            if fast:
                # fast path: no morphology/stopwords/exact -> raw==norm
                tps: list[tuple[str, str | None, int]] = [
                    (t, t, i + 1)
                    for i, t in enumerate(self._fast_tokens(text))
                ]
            else:
                tps = self._full_stream(text)
            if not tps:
                continue
            last_pos = tps[-1][2]
            for raw, norm, pos in tps:
                wp = base | pos
                if pos == last_pos:
                    # ALL hits at the trailing position carry the flag
                    # (mark-trailing-hits sweep, src/sphinx.cpp:
                    # 18666-18672) — including exact/expansion entries
                    wp |= HIT_FIELD_END
                # exact-form hit: raw word, NONSTEMMED marker; its
                # stopword check runs on the RAW form
                # (GetWordIDNonStemmed, src/sphinx.cpp:17047-17053)
                if exact and raw not in stops:
                    out.append(("=" + raw, wp))
                if norm is None:
                    continue
                if not star:
                    out.append((norm, wp))
                    continue
                # full stemmed word with both magic markers — emitted
                # for EVERY kept token on a star index, whole fields
                # included (bGlobalPartialMatch, src/sphinx.cpp:
                # 18685-18700)
                out.append(("^*" + norm + "$", wp))
                if kind == "whole":
                    out.append((norm, wp))
                    continue
                if norm != raw:
                    # stemmed word w/o markers, only when stemming
                    # changed it (src/sphinx.cpp:18578-18588)
                    out.append((norm, wp))
                n = len(raw)
                minlen = mp if kind == "prefix" else mi
                if minlen > n:
                    # too short to expand: plain stemmed word
                    # (src/sphinx.cpp:18595-18607)
                    out.append((norm, wp))
                    continue
                max_start = 0 if kind == "prefix" else n - minlen
                for i in range(max_start + 1):
                    for j in range(i + minlen, n + 1):
                        sub = raw[i:j]
                        out.append((sub, wp))
                        if infix_mode and i == 0:
                            out.append(("^*" + sub, wp))
                        if infix_mode and j == n:
                            out.append((sub + "$", wp))
        return out

    def tokenize_with_raw(self, text: str) -> list[tuple[str | None, str]]:
        """[(normalized_or_None, raw_folded)] — the query-parser path
        for =exact terms (CSphDictExact, src/sphinx.cpp:10780)."""
        return [(n, r) for r, n, _ in self._full_stream(text)]
