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
    word: str
    querypos: int
    field_start: bool = False  # ^word
    field_end: bool = False  # word$
    exact: bool = False  # =word (index_exact_words)


@dataclass
class XQNode:
    op: str  # term|phrase|proximity|quorum|and|or|not|andnot|before
    words: list[QWord] = dc_field(default_factory=list)
    children: list["XQNode"] = dc_field(default_factory=list)
    max_distance: int = 0  # ~N / quorum threshold
    fields_mask: int = ALL_FIELDS
    max_field_pos: int = 0  # @field[N], 0 = unlimited

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
  | (?P<op>[()|"~/\-!^$=])
  | (?P<field>@(?:@relaxed|\*|\(\s*[\w,\s]+\s*\)|\w+)(?:\[\d+\])?)
  | (?P<word>[^\s()|"~/\-!^$=@]+)
  | (?P<ws>\s+)
""",
    re.VERBOSE,
)


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
            if m.lastgroup == "before":
                self.toks.append(("BEFORE", None))
            elif m.lastgroup == "op":
                self.toks.append((m.group("op"), None))
            elif m.lastgroup == "field":
                self.toks.append(("FIELD", self._parse_field(m.group("field"))))
            elif (
                self.star_mode != "none"
                and m.group("word").endswith("*")
                and "*" not in m.group("word").strip("*")
                and m.group("word").strip("*")
            ):
                # starred keyword on a prefix/infix-expanded index:
                # compile to the "*"-marked term — a single dictionary
                # lookup against the index-time expansion namespace
                # (CSphDictStarV8, src/sphinx.cpp:10700-10770).  The
                # raw folded (pre-morphology) core is used, as the
                # reference's star dicts bypass morphology.
                entries = tokenizer._full_stream(m.group("word").strip("*"))
                if len(entries) == 1:
                    raw, _norm, apos = entries[0]
                    self.toks.append(
                        ("WORD", ("*" + raw, "*" + raw, self._atom_base + apos))
                    )
                    self._atom_base += apos
                else:
                    # multi-keyword core (e.g. "ab.cd*"): stars fold
                    # as separators, keywords pass through plain
                    for raw, norm, apos in entries:
                        self.toks.append(
                            ("WORD", (norm, raw, self._atom_base + apos))
                        )
                    if entries:
                        self._atom_base += entries[-1][2]
            else:
                # fold through the document tokenizer; a "word" chunk may
                # split into several keywords (e.g. "i-phone" won't reach
                # here since '-' lexes as NOT, but "ab.cd" does).  The
                # payload is (normalized_or_None, raw_folded, atom_pos):
                # =exact terms use the raw form (CSphDictExact
                # semantics); stopword keywords carry None but still
                # occupy their atom position, so phrases keep gaps
                # (XQParser m_iAtomPos, src/sphinxquery.cpp:393,434-443)
                entries = tokenizer._full_stream(m.group("word"))
                for raw, norm, apos in entries:
                    self.toks.append(
                        ("WORD", (norm, raw, self._atom_base + apos))
                    )
                if entries:
                    self._atom_base += entries[-1][2]
        self.i = 0

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
            raise QueryParseError("empty query")
        if relaxed:
            node = self._delete_no_field_nodes(node)
            if node is None:
                raise QueryParseError(
                    "query is empty (all terms reference unknown fields)"
                )
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
            right = self._beforelist()
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
            exact = True
            kind, val = self._lex.peek()
        if kind == "^":
            self._lex.next()
            field_start = True
            kind, val = self._lex.peek()
        if kind != "WORD":
            if exact or field_start:
                raise QueryParseError("expected keyword after '='/'^'")
            return None
        self._lex.next()
        norm, raw, pos = val
        if exact:
            # exact-form term: raw (pre-morphology) word id with the
            # nonstemmed marker (CSphDictExact, src/sphinx.cpp:10780);
            # no stopword filter on the normalized form here
            word = "=" + raw
        elif norm is None:
            return None  # stopword keyword -> null node (SweepNulls)
        else:
            word = norm
        w = QWord(word, pos, field_start=field_start, exact=exact)
        if self._lex.peek()[0] == "$":
            self._lex.next()
            w.field_end = True
        return XQNode("term", words=[w])

    def _phrase(self):
        self._lex.next()  # consume opening quote
        words: list[QWord] = []
        while True:
            kind, val = self._lex.peek()
            if kind is None:
                raise QueryParseError("unterminated phrase")
            if kind == '"':
                self._lex.next()
                break
            if kind == "WORD":
                self._lex.next()
                norm, _raw, pos = val
                if norm is not None:
                    words.append(QWord(norm, pos))
            else:
                # phrasetoken rules: operators inside quotes are ignored
                self._lex.next()
        # optional ~N (proximity) or /N (quorum)
        kind, _ = self._lex.peek()
        n = 0
        op = "phrase"
        if kind in ("~", "/"):
            self._lex.next()
            k2, v2 = self._lex.next()
            num = v2[1] if k2 == "WORD" else None
            if num is None or not str(num).isdigit():
                raise QueryParseError(f"expected integer after {kind!r}")
            n = int(num)
            op = "proximity" if kind == "~" else "quorum"
        if not words:
            return None
        if len(words) == 1:
            return XQNode("term", words=words)
        if op == "quorum":
            if n >= len(words):
                op, n = "phrase", 0  # ref asserts thresh < nwords; AND-equiv
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
