"""Extended MATCH query syntax -> XQNode AST.

Hand-written recursive-descent parser with the same precedence as the
reference bison grammar (src/sphinxquery.y:42-120), tightest first:
  anchors (^word, word$) > phrase/"..."~N,"/N" > @field limit >
  '|' OR > prefix '-'/'!' NOT > '<<' BEFORE > implicit AND.

Tree canonicalization mirrors XQParser_t: null sweep (SweepNulls,
src/sphinxquery.cpp:559) and NOT -> ANDNOT rewriting under AND with
top-level NOT rejected as non-computable (FixupNots,
src/sphinxquery.cpp:612-706).

Query keywords are run through the same Tokenizer as documents, so
query-side folding matches index-side folding (the reference shares
one ISphTokenizer instance between XQParser_t and the index).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from sphinx_1_spark.functions.tokenizer import Tokenizer

ALL_FIELDS = 0xFFFFFFFF


@dataclass
class QWord:
    word: str  # dictionary lookup key (post dict mangling)
    querypos: int
    field_start: bool = False  # ^word
    field_end: bool = False  # word$
    exact: bool = False  # =word (index_exact_words)
    # word stats / SHOW META form: the query word as typed (stars
    # kept, magic markers absent) — m_sDictWord semantics,
    # src/sphinx.cpp:11628-11631
    display: str = ""
    # repeated query word: only the FIRST term of a word carries IDF;
    # later ExtTerms of the same word keep m_fIDF = 0 (GetQwords
    # hash-exists early-out, src/sphinx.cpp:11977-11981), so '"zee
    # lord of zee rings"' scores zee once in BM25
    dup: bool = False


@dataclass
class XQNode:
    op: str  # term|phrase|proximity|quorum|and|or|not|andnot|before|empty
    words: list[QWord] = dc_field(default_factory=list)
    children: list["XQNode"] = dc_field(default_factory=list)
    max_distance: int = 0  # ~N / quorum threshold
    fields_mask: int = ALL_FIELDS
    max_field_pos: int = 0  # @field[N], 0 = unlimited
    # op="empty" only: words parsed before DeleteNodesWOFields pruned
    # them — they still get dictionary stats in the result (the
    # reference's term setup collects stats before matching), but do
    # not count toward the IDF q divisor or match anything
    stats_words: list[QWord] = dc_field(default_factory=list)

    def set_field_spec(self, mask: int, max_pos: int) -> None:
        """SetFieldSpec propagates into children that have no own spec
        (XQNode_t::SetFieldSpec semantics)."""
        self.fields_mask = mask
        self.max_field_pos = max_pos
        for c in self.children:
            if c.fields_mask == ALL_FIELDS and c.max_field_pos == 0:
                c.set_field_spec(mask, max_pos)


class QueryParseError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<before><<)
  | (?P<num>\d+)(?=$|\s|[()|"~/\-!^$=@<])
  | (?P<op>[()|"~/\-!^$=])
  | (?P<field>@(?:@relaxed|\*|\(\s*[\w,\s]+\s*\)|\w+)(?:\[\d+\])?)
  | (?P<word>(?:[^\s()|"~/\-!^$=@\\]|\\.)+)
  | (?P<esc>\\)
  | (?P<ws>\s+)
""",
    re.VERBOSE,
)


def _escaped_variant(tokenizer: Tokenizer) -> Tokenizer:
    """Escaped-mode clone for word chunks containing backslashes.

    The reference parses EVERY query through an escaped tokenizer
    clone (Clone(true), src/sphinxquery.cpp:710), whose GetToken
    consumes a backslash and demotes the following codepoint per
    Special2Simple (src/sphinx.cpp:3565-3576, 4280-4292): word-part
    chars stay in the word ('run\\-ning' -> 'run-ning' when '-' is in
    the charset), everything else becomes whitespace ('aaa\\!bbb' ->
    'aaa', 'bbb').  Here the clone serves only chunks that actually
    contain a backslash, so the backslash-free hot path keeps the
    vectorized tokenizer (whose equivalence to the scanner path is
    fuzz-pinned in test_tokenizer_scanner_fuzz)."""
    var = getattr(tokenizer, "_esc_variant", None)
    if var is None:
        import dataclasses

        var = tokenizer._esc_variant = Tokenizer(
            dataclasses.replace(tokenizer.settings, escaped=True)
        )
    return var


def _star_core_stream(tokenizer: Tokenizer, core: str, n_stars: int):
    """Token stream for a starred keyword's core.  Query parsing
    enables the short-token filter (EnableQueryParserMode,
    src/sphinx.h:430): any token that starts or ends with '*'
    BYPASSES the min_word_len overshort drop entirely
    (ShortTokenFilter, src/sphinx.cpp:3080-3083) — 'i*' is a live
    keyword even on a min_word_len=3 index.  Emulated by folding the
    bare core through a variant tokenizer with min_word_len=1."""
    if "\\" in core:
        tokenizer = _escaped_variant(tokenizer)
    s = tokenizer.settings
    if s.min_word_len <= 1 or n_stars == 0:
        return tokenizer._full_stream(core)
    var = getattr(tokenizer, "_star_variant", None)
    if var is None:
        import dataclasses

        var = tokenizer._star_variant = Tokenizer(
            dataclasses.replace(s, min_word_len=1)
        )
    return var._full_stream(core)


def _query_stream(tokenizer: Tokenizer, chunk: str):
    """Token stream for a plain (unstarred) query word chunk.  The
    reference lexes the WHOLE query through one tokenizer buffer, so a
    word dropped as overshort becomes a pending null emitted as an
    AddKeyword(NULL) placeholder before the next token — it still
    occupies an atom position (m_iPendingNulls,
    src/sphinxquery.cpp:392-393,455-460), which is what keeps
    '"hello me world"' on a min_word_len=3 index matching hello@p,
    world@p+2.  Emulated by folding through a min_word_len=1 variant
    and nulling out tokens shorter than the real min_word_len (query-
    side nulls always step 1; overshort_step is index-only)."""
    if "\\" in chunk:
        tokenizer = _escaped_variant(tokenizer)
    s = tokenizer.settings
    if s.min_word_len <= 1 or tokenizer._mmseg is not None:
        # MMSEG dictionary words bypass min_word_len inside GetToken —
        # a length test here would wrongly null them
        return tokenizer._full_stream(chunk)
    var = getattr(tokenizer, "_star_variant", None)
    if var is None:
        import dataclasses

        var = tokenizer._star_variant = Tokenizer(
            dataclasses.replace(s, min_word_len=1)
        )
    ngram = getattr(tokenizer, "_ngram_mask", None)

    def _short(raw: str) -> bool:
        if len(raw) >= s.min_word_len:
            return False
        # ngram chars are specials returned BEFORE the overshort test
        # (GetToken special handling, src/sphinx.cpp:4327-4360)
        if ngram is not None and raw and ngram[ord(raw[0])]:
            return False
        return True

    return [
        (raw, None if _short(raw) else norm, pos)
        for raw, norm, pos in var._full_stream(chunk)
    ]


class _Lexer:
    def __init__(
        self,
        text: str,
        tokenizer: Tokenizer,
        field_names: list[str],
        star_mode: str = "none",
        relaxed: bool = False,
    ):
        self.toks: list[tuple[str, object]] = []
        self.field_names = [f.lower() for f in field_names]
        self.star_mode = star_mode
        self.relaxed = relaxed
        self._atom_base = 0
        pos = 0
        for m in _TOKEN_RE.finditer(text):
            if m.start() != pos:
                raise QueryParseError(f"cannot lex query at {text[pos:]!r}")
            pos = m.end()
            if m.lastgroup == "ws":
                continue
            if m.lastgroup == "esc":
                # dangling backslash (nothing to escape): the escaped
                # tokenizer consumes it and hits EOF/whitespace — a
                # no-op, not a lex error
                continue
            if m.lastgroup == "num":
                # numbers are lexed RAW before the tokenizer sees them
                # (XQParser_t::GetToken digit pre-scan,
                # src/sphinxquery.cpp:340-382): '~3' parses even when
                # 0-9 are outside charset_table or min_word_len drops
                # single digits.  The number doubles as a keyword when
                # the tokenizer keeps it (TOK_INT iStrIndex).
                digits = m.group("num")
                entries = tokenizer._full_stream(digits)
                kw = None
                if entries:
                    raw, norm, _apos = entries[0]
                    self._atom_base += 1  # m_iAtomPos++ iff token kept
                    kw = (self._plain_key(norm), raw, self._atom_base, norm)
                self.toks.append(("NUM", (int(digits), kw)))
                continue
            if m.lastgroup == "before":
                self.toks.append(("BEFORE", None))
            elif m.lastgroup == "op":
                self.toks.append((m.group("op"), None))
            elif m.lastgroup == "field":
                self.toks.append(("FIELD", self._parse_field(m.group("field"))))
            elif (
                self.star_mode != "none"
                and ("*" in m.group("word"))
                and "*" not in m.group("word").strip("*")
                and m.group("word").strip("*")
            ):
                # starred keyword on a star-enabled prefix/infix index:
                # a SINGLE dictionary lookup against the mangled entry
                # (CSphDictStarV8::GetWordID, src/sphinx.cpp:
                # 10680-10767).  Morphology and the stopword check are
                # skipped when any star is present; the raw folded core
                # is mangled per mode:
                #   infix:   word* -> ^*word   *word -> word$
                #            *word* -> word
                #   prefix:  head star ignored; word* -> word (bare
                #            prefix entry), *word/word -> ^*word$
                #            (exact full-word match)
                # The display form (word stats / SHOW META) keeps the
                # stars as typed (m_sDictWord is the unmangled buffer,
                # src/sphinx.cpp:11628-11631).
                word = m.group("word")
                h, t = word.startswith("*"), word.endswith("*")
                entries = _star_core_stream(
                    tokenizer, word.strip("*"), int(h) + int(t)
                )
                if len(entries) == 1:
                    raw, _norm, apos = entries[0]
                    if self.star_mode == "infix":
                        key = ("" if h else "^*") + raw + ("" if t else "$")
                    else:
                        key = raw if t else "^*" + raw + "$"
                    display = ("*" if h else "") + raw + ("*" if t else "")
                    self.toks.append(
                        ("WORD", (key, raw, self._atom_base + apos, display))
                    )
                    self._atom_base += apos
                else:
                    # multi-keyword core (e.g. "ab.cd*"): stars fold
                    # as separators, keywords pass through plain
                    for raw, norm, apos in entries:
                        self.toks.append(
                            ("WORD", (
                                self._plain_key(norm), raw,
                                self._atom_base + apos, norm,
                            ))
                        )
                    if entries:
                        self._atom_base += entries[-1][2]
            else:
                # fold through the document tokenizer; a "word" chunk may
                # split into several keywords (e.g. "i-phone" won't reach
                # here since '-' lexes as NOT, but "ab.cd" does).  The
                # payload is (lookup_key_or_None, raw_folded, atom_pos,
                # display): =exact terms use the raw form (CSphDictExact
                # semantics); stopword keywords carry None but still
                # occupy their atom position, so phrases keep gaps
                # (XQParser m_iAtomPos, src/sphinxquery.cpp:393,434-443)
                entries = _query_stream(tokenizer, m.group("word"))
                for raw, norm, apos in entries:
                    self.toks.append(
                        ("WORD", (
                            self._plain_key(norm), raw,
                            self._atom_base + apos, norm,
                        ))
                    )
                if entries:
                    self._atom_base += entries[-1][2]
        self.i = 0

    def _plain_key(self, norm: str | None) -> str | None:
        """Dictionary lookup key for a non-starred keyword.  On a
        star-enabled index every plain word resolves to the stemmed
        full-word entry with both magic markers (\\1stem\\1 — the
        !bHeadStar && !bTailStar branch of CSphDictStarV8::GetWordID,
        src/sphinx.cpp:10693-10728 infix / 10747-10757 prefix)."""
        if norm is None or self.star_mode == "none":
            return norm
        return "^*" + norm + "$"

    def _parse_field(self, spec: str) -> tuple[int, int]:
        """@field / @(f1,f2) / @* / @@relaxed [+ optional [N] max-pos]
        (ParseFields, src/sphinxquery.cpp:201-331)."""
        max_pos = 0
        mm = re.search(r"\[(\d+)\]$", spec)
        if mm:
            max_pos = int(mm.group(1))
            spec = spec[: mm.start()]
        body = spec[1:]
        if body == "@relaxed":
            # the reference recognizes @@relaxed only as a strncmp
            # prefix of the whole query (src/sphinxquery.cpp:715-723),
            # stripped before lexing; mid-query it is a syntax error
            raise QueryParseError("@@relaxed is only valid at query start")
        if body == "*":
            return (ALL_FIELDS, max_pos)
        if body.startswith("("):
            names = [n.strip().lower() for n in body[1:-1].split(",") if n.strip()]
        else:
            names = [body.lower()]
        mask = 0
        for n in names:
            if n not in self.field_names:
                if self.relaxed:
                    continue  # zero bits -> term matches nothing
                raise QueryParseError(f"no field '{n}' in index")
            mask |= 1 << self.field_names.index(n)
        return (mask, max_pos)

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t


class QueryParser:
    def __init__(
        self,
        tokenizer: Tokenizer,
        field_names: list[str],
        star_mode: str = "none",
    ):
        self.tokenizer = tokenizer
        self.field_names = field_names
        self.star_mode = star_mode

    # ------------------------------------------------------------------
    def parse(self, query: str) -> XQNode:
        # @@relaxed is a whole-query prefix flag (strncmp before lexing,
        # src/sphinxquery.cpp:715-723): unknown-field references are
        # tolerated, and after parsing every node that ended up with an
        # empty field mask is DELETED (DeleteNodesWOFields) so its
        # keywords drop out of the query-word count / IDF q divisor.
        relaxed = False
        stripped = query.lstrip()
        if stripped.lower().startswith("@@relaxed"):
            relaxed = True
            query = stripped[len("@@relaxed"):]
        self._lex = _Lexer(
            query, self.tokenizer, self.field_names, self.star_mode,
            relaxed=relaxed,
        )
        self._qpos = 0
        node = self._expr()
        kind, _ = self._lex.peek()
        if kind is not None:
            raise QueryParseError(f"unexpected token {kind!r}")
        if node is None:
            # a query whose every keyword was dropped (stopword,
            # overshort, empty phrase) is NOT an error: the reference
            # returns success with zero matches and no per-word stats
            # (XQParser m_bEmpty, NULL root -> ranker matches nothing)
            return XQNode("empty")
        if relaxed:
            pre = collect_words(node)
            node = self._delete_no_field_nodes(node)
            if node is None:
                # all terms referenced unknown fields: zero matches,
                # but the parsed words still carry dictionary stats
                # (upstream keeps the zero-mask terms; stats were
                # collected at term setup before matching)
                return XQNode("empty", stats_words=pre)
        node = self._fixup_nots(node)
        if node.op == "not":
            raise QueryParseError("query is non-computable (top-level NOT)")
        return node

    @classmethod
    def _delete_no_field_nodes(cls, node: XQNode) -> XQNode | None:
        """DeleteNodesWOFields (src/sphinxquery.cpp:728-760): drop
        subtrees whose field mask is empty; AND/OR keep surviving
        siblings, a unary/binary node missing an operand drops whole."""
        if node.words:
            return None if node.fields_mask == 0 else node
        kept = [
            c for c in (cls._delete_no_field_nodes(ch) for ch in node.children)
            if c is not None
        ]
        if node.op in ("and", "or"):
            if not kept:
                return None
            if len(kept) == 1:
                return kept[0]
            node.children = kept
            return node
        # not / before (pre-FixupNots tree): all operands required
        if len(kept) != len(node.children):
            return None
        node.children = kept
        return node

    def _next_qpos(self) -> int:
        self._qpos += 1
        return self._qpos

    # --- grammar, loosest binding first -------------------------------
    def _expr(self):
        left = self._beforelist()
        while True:
            kind, _ = self._lex.peek()
            if kind in (None, ")", "|"):
                return left
            pos = self._lex.i
            right = self._beforelist()
            if right is None and self._lex.i == pos:
                # stray operator in atom position ('foo/bar', '$x',
                # 'hello ~2'): the reference's yacc parser fails with
                # a syntax error (sphinxquery.cpp yyparse) — and
                # without consuming anything this loop would never
                # terminate
                raise QueryParseError(
                    f"syntax error near {self._lex.peek()[0]!r}"
                )
            if left is None:
                left = right
            elif right is not None:
                left = XQNode("and", children=[left, right])

    def _beforelist(self):
        left = self._orlistf()
        while self._lex.peek()[0] == "BEFORE":
            self._lex.next()
            right = self._orlistf()
            if left is None or right is None:
                left = left or right
            elif left.op == "before":
                # chains flatten into ONE multi-child order node
                # (AddOp: pLeft->m_eOp==eOp appends pRight,
                # src/sphinxquery.cpp:533-537) — ExtOrder_c tracks the
                # whole chain in a single longest/recent pass
                left.children.append(right)
            else:
                left = XQNode("before", children=[left, right])
        return left

    def _orlistf(self):
        kind, val = self._lex.peek()
        fieldspec = None
        if kind == "FIELD":
            # lookahead: FIELD '-' orlist (grammar: TOK_FIELDLIMIT '-' orlist)
            save = self._lex.i
            self._lex.next()
            if self._lex.peek()[0] in ("-", "!"):
                fieldspec = val
            else:
                self._lex.i = save
        if self._lex.peek()[0] in ("-", "!"):
            self._lex.next()
            inner = self._orlist()
            if inner is None:
                return None
            node = XQNode("not", children=[inner])
            if fieldspec:
                node.set_field_spec(*fieldspec)
            return node
        return self._orlist()

    def _orlist(self):
        left = self._atomf()
        while self._lex.peek()[0] == "|":
            self._lex.next()
            right = self._atomf()
            if left is None:
                left = right
            elif right is not None:
                left = XQNode("or", children=[left, right])
        return left

    def _atomf(self):
        # consecutive field specs (e.g. "@@relaxed @field word"): the
        # last one wins — @@relaxed itself is a lexer flag and resets
        # the spec to all-fields (XQParser ParseFields chain).
        val = None
        while self._lex.peek()[0] == "FIELD":
            _, val = self._lex.next()
        if val is not None:
            atom = self._atom()
            if atom is not None:
                atom.set_field_spec(*val)
            return atom
        return self._atom()

    def _atom(self):
        kind, val = self._lex.peek()
        if kind == "(":
            self._lex.next()
            node = self._expr()
            if self._lex.peek()[0] != ")":
                raise QueryParseError("expected ')'")
            self._lex.next()
            return node
        if kind == '"':
            return self._phrase()
        return self._keyword()

    def _keyword(self):
        kind, val = self._lex.peek()
        exact = False
        field_start = False
        if kind == "=":
            self._lex.next()
            # '=' is only a live marker when the index was built with
            # index_exact_words: SetupExactDict folds '=' into the
            # charset iff the setting is on (src/sphinx.cpp:16056-16062)
            # — otherwise it's a plain separator and '=work' degrades
            # to the (morphology-processed) bare keyword
            exact = bool(self.tokenizer.settings.index_exact_words)
            kind, val = self._lex.peek()
        if kind == "^":
            self._lex.next()
            field_start = True
            kind, val = self._lex.peek()
        if kind == "NUM":
            # TOK_INT as keyword (XQParser tInt.iStrIndex): the number
            # participates as a keyword iff the tokenizer kept it
            self._lex.next()
            _n, kw = val
            if kw is None:
                return None
            norm, raw, pos, display = kw
        elif kind != "WORD":
            if exact or field_start:
                raise QueryParseError("expected keyword after '='/'^'")
            return None
        else:
            self._lex.next()
            norm, raw, pos, display = val
        if exact:
            # exact-form term: raw (pre-morphology) word id with the
            # nonstemmed marker (CSphDictExact, src/sphinx.cpp:10780).
            # The stopword filter runs on the RAW form, not the
            # normalized one (GetWordIDNonStemmed checks CRC(raw)
            # against the stop list, src/sphinx.cpp:17047-17053,
            # returning wordid 0) — so a stopword exact term sweeps to
            # a null node at parse time exactly like a plain stopword
            # ('foo =the' degrades to 'foo', not to match-nothing)
            if raw in self.tokenizer.settings.stopwords:
                return None
            word = display = "=" + raw
        elif norm is None:
            return None  # stopword keyword -> null node (SweepNulls)
        else:
            word = norm
            if self.tokenizer.settings.index_exact_words:
                # with CSphDictExact installed, GetWordID stems its own
                # COPY of the word (src/sphinx.cpp:10797-10798), so
                # m_sDictWord — the word-stats key — stays the raw
                # pre-morphology form (test_41 st3: 'worked', not
                # 'work', even under stem_en)
                display = raw
        w = QWord(
            word, pos, field_start=field_start, exact=exact,
            display=display or word,
        )
        if self._lex.peek()[0] == "$":
            self._lex.next()
            w.field_end = True
        return XQNode("term", words=[w])

    def _phrase(self):
        self._lex.next()  # consume opening quote
        words: list[QWord] = []
        stops = self.tokenizer.settings.stopwords
        exact_ok = self.tokenizer.settings.index_exact_words
        while True:
            kind, val = self._lex.peek()
            if kind is None:
                raise QueryParseError("unterminated phrase")
            if kind == '"':
                self._lex.next()
                break
            # the full keyword rule applies INSIDE phrases (phrasetoken
            # -> keyword, src/sphinxquery.y:59-60): ^word / word$
            # anchors attach to individual phrase words, and '=' exact
            # form works because the reference folds '=' into the query
            # charset when index_exact_words=1 (SetupExactDict,
            # src/sphinx.cpp:16062) so '=word' reaches CSphDictExact as
            # one keyword token wherever it appears
            exact = False
            field_start = False
            if kind == "=":
                self._lex.next()
                exact = exact_ok
                kind, val = self._lex.peek()
            if kind == "^":
                self._lex.next()
                field_start = True
                kind, val = self._lex.peek()
            if kind == "WORD":
                self._lex.next()
                norm, raw, pos, display = val
            elif kind == "NUM":
                self._lex.next()
                _n, kw = val
                if kw is None:
                    continue
                norm, raw, pos, display = kw
            else:
                # phrasetoken rules: remaining operators inside quotes
                # are ignored (src/sphinxquery.y:61-66); a dangling
                # '='/'^' before one drops with it
                self._lex.next()
                continue
            if exact:
                # stop check on the RAW form (GetWordIDNonStemmed,
                # src/sphinx.cpp:17047-17053): a stopword exact term is
                # wordid 0 — a position gap, like any stopword
                if raw in stops:
                    w = None
                else:
                    w = QWord("=" + raw, pos, exact=True, display="=" + raw)
            elif norm is not None:
                if exact_ok:
                    # CSphDictExact stems a copy; stats key stays the
                    # raw form (see _keyword)
                    display = raw
                w = QWord(norm, pos, display=display or norm)
            else:
                w = None  # stopword keyword -> position gap
            if w is not None:
                w.field_start = field_start
                if self._lex.peek()[0] == "$":
                    self._lex.next()
                    w.field_end = True
                words.append(w)
            elif self._lex.peek()[0] == "$":
                # '$' trailing a swept stopword: consumed, attaches
                # nowhere (the reference's grammar attaches it to the
                # NULL keyword node, which SweepNulls then drops)
                self._lex.next()
        # optional ~N (proximity) or /N (quorum); the count is lexed
        # raw (digit pre-scan), never through the tokenizer
        kind, _ = self._lex.peek()
        n = 0
        op = "phrase"
        if kind in ("~", "/"):
            self._lex.next()
            k2, v2 = self._lex.next()
            if k2 == "NUM":
                num = v2[0]
            elif k2 == "WORD" and str(v2[1]).isdigit():
                num = v2[1]
            else:
                raise QueryParseError(f"expected integer after {kind!r}")
            n = int(num)
            # maxdist 0 is a plain phrase in the reference — the op
            # distinction is made at ExtNode creation, AFTER the
            # ==0 check (src/sphinx.cpp:11757-11759), so '"a b"~0'
            # and '"a b"/0' both mean exact phrase (quorum/0 would
            # otherwise clamp to threshold 1 == any-word)
            if n > 0:
                op = "proximity" if kind == "~" else "quorum"
        if not words:
            return None
        if len(words) == 1:
            return XQNode("term", words=words)
        if op == "quorum":
            if n >= len(words) or len(words) > 32:
                # threshold too high (src/sphinx.cpp:11762-11768) or
                # more words than the reference's DWORD mask can track
                # (:11769-11774): both degrade to the AND of the
                # ORIGINAL (dup-included) word list
                return XQNode("and", children=[XQNode("term", words=[w]) for w in words])
        return XQNode(op, words=words, max_distance=n)

    # --- canonicalization ---------------------------------------------
    def _fixup_nots(self, node: XQNode) -> XQNode:
        """NOT is only computable under AND: AND(a, NOT(b), c, NOT(d))
        -> ANDNOT(AND(a,c), OR(b,d)) (FixupNots src/sphinxquery.cpp:612)."""
        if node.op != "and":
            node.children = [self._fixup_nots(c) for c in node.children]
            if any(c.op == "not" for c in node.children):
                raise QueryParseError("query is non-computable (NOT under non-AND)")
            return node
        # flatten the raw nested-AND chain first, THEN partition by NOT
        flat: list[XQNode] = []
        stack = list(node.children)
        while stack:
            c = stack.pop(0)
            if c.op == "and":
                stack = list(c.children) + stack
            else:
                flat.append(c)
        positives = [self._fixup_nots(c) for c in flat if c.op != "not"]
        negatives = [
            self._fixup_nots(c.children[0]) for c in flat if c.op == "not"
        ]
        if not negatives:
            node.children = positives
            return node
        if not positives:
            return XQNode("not", children=[self._or_of(negatives)])
        pos = positives[0] if len(positives) == 1 else XQNode("and", children=positives)
        return XQNode("andnot", children=[pos, self._or_of(negatives)])

    @staticmethod
    def _or_of(nodes: list[XQNode]) -> XQNode:
        return nodes[0] if len(nodes) == 1 else XQNode("or", children=nodes)


def collect_words(node: XQNode) -> list[QWord]:
    """All query words in querypos order (for IDF + stats)."""
    out = list(node.words)
    for c in node.children:
        out.extend(collect_words(c))
    out.sort(key=lambda w: w.querypos)
    return out
