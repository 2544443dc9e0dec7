"""Sphinx-compatible HTML stripper.

Reimplements the semantics of `CSphHTMLStripper::Strip`
(reference src/sphinx.cpp:18075-18360) as a pure-bytes automaton,
exposed as an Arrow-batched pandas UDF (`strip_html_udf`).  The
extracted text is **byte-identical** to the reference for any input —
including its quirks on malformed markup, which are load-bearing for
the per-url text invariant:

* plain text is copied verbatim until '<' or '&'
  (src/sphinx.cpp:18081-18083);
* `&#NNN;` decimal entities decode to UTF-8; when the digits are not
  terminated by ';' (or NNN == 0) the consumed "&#digits" bytes are
  silently DROPPED and scanning resumes at the unconsumed tail
  (src/sphinx.cpp:18090-18098);
* named entities are looked up only when 2..8 chars long and
  ';'-terminated, against the HTML 4.01 table with two Sphinx quirks:
  `apos` is known (code 39) and `nbsp` maps to 32, an ASCII space
  (entity wordlist src/sphinx.cpp:17703-18073); unknown entities pass
  the '&' through and rescan (src/sphinx.cpp:18126-18131);
* codepoints are encoded by a 3-byte-max UTF-8 encoder — codes above
  0xFFFF wrap by bit masking exactly like `sphUTF8Encode`
  (src/sphinx.cpp:2944-2964);
* `<!--...-->` comments and `<?...?>` PIs are removed; unterminated
  ones swallow the rest of the document (src/sphinx.cpp:18152-18184);
* `<!x`, `</>`, `<1tag` are malformed: one leading byte is emitted
  and scanning resumes (src/sphinx.cpp:18140-18190);
* known inline tags (a b i s u basefont big em font img label small
  span strike strong sub sup tt — ctor src/sphinx.cpp:17437-17446)
  vanish; any other well-formed tag is replaced by one space;
  attribute lists are skipped with quote awareness (`SkipQuoted`
  src/sphinx.cpp:17628-17636);
* `html_index_attrs`-configured attributes (e.g. img=alt) have their
  values emitted followed by a space (src/sphinx.cpp:18253-18316);
* `html_remove_elements`-configured tags swallow content up to their
  case-insensitive closing tag (src/sphinx.cpp:18330-18356).
"""

from __future__ import annotations

import html.entities
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# HTML 4.01 entity set with the two reference quirks.
ENTITIES: dict[bytes, int] = {
    name.encode(): code for name, code in html.entities.name2codepoint.items()
}
ENTITIES[b"apos"] = 39
ENTITIES[b"nbsp"] = 32  # reference maps nbsp to plain space

MAX_ENTITY_LEN = 8

DEFAULT_INLINE_TAGS = (
    "a", "b", "i", "s", "u", "basefont", "big", "em", "font", "img",
    "label", "small", "span", "strike", "strong", "sub", "sup", "tt",
)

_DIGITS = frozenset(b"0123456789")
_SPACE = frozenset(b" \t\n\r\v\f")
# sphIsTag = sphIsAlpha (0-9 a-z A-Z - _) or '.' or ':'
_TAGCHAR = frozenset(
    b"0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ-_.:"
)
_ALPHA = frozenset(b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
# GetCharIndex accepts a-z A-Z _ : as a first tag-name byte
_TAGSTART = frozenset(b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_:")

# next '>' or quote, for the attribute-list skip: one C-level regex
# scan instead of a per-byte Python loop (semantics identical to
# "advance until '>', entering SkipQuoted at any quote")
_GT_OR_QUOTE = re.compile(rb"[>'\"]")

# whole-tag fast path: an entire well-formed tag in ONE C-level match
# — name (TAGSTART then TAGCHARs, so the char after the name is a
# non-tag char exactly like the candidate scan requires), then the
# attribute region with SkipQuoted semantics as an unrolled (linear,
# backtracking-safe) quoted-string alternation, then the closing '>'.
# No match (malformed / unterminated quote / eof / comment / PI)
# falls back to the byte automaton, which remains the one source of
# truth for every edge case.
_WHOLE_TAG = re.compile(
    rb"<(/?)([a-zA-Z_:][0-9a-zA-Z\-_.:]*)"
    rb"(?:[^>'\"]*(?:(?:'[^']*'|\"[^\"]*\")[^>'\"]*)*)>"
)


def _utf8_encode_sphinx(code: int) -> bytes:
    """3-byte-max UTF-8 with Sphinx's masking for out-of-range codes
    (signed compares + bit masks, src/sphinx.cpp:2944-2964)."""
    if code < 0x80:
        return bytes((code & 0x7F,))
    if code < 0x800:
        return bytes(((code >> 6 & 0x1F) | 0xC0, (code & 0x3F) | 0x80))
    return bytes(
        ((code >> 12 & 0x0F) | 0xE0, (code >> 6 & 0x3F) | 0x80, (code & 0x3F) | 0x80)
    )


class Tag:
    __slots__ = ("name", "inline", "remove", "index_attrs", "attrs")

    def __init__(self, name: str, inline=False, remove=False, attrs=None):
        self.name = name.lower().encode()
        self.inline = inline
        self.remove = remove
        self.attrs = [a.lower().encode() for a in (attrs or [])]
        self.index_attrs = bool(self.attrs)


class HtmlStripper:
    """Configured stripper; mirrors SetIndexedAttrs/SetRemovedElements
    (src/sphinx.cpp:17496-17626) with a tag dict keyed by lowercase name."""

    def __init__(
        self,
        remove_elements: str = "",
        index_attrs: dict[str, list[str]] | None = None,
    ):
        self._tags: dict[bytes, Tag] = {
            t.encode(): Tag(t, inline=True) for t in DEFAULT_INLINE_TAGS
        }
        for name in remove_elements.replace(",", " ").split():
            key = name.lower().encode()
            if key in self._tags:
                self._tags[key].remove = True
            else:
                self._tags[key] = Tag(name, remove=True)
        for name, attrs in (index_attrs or {}).items():
            key = name.lower().encode()
            if key in self._tags:
                t = self._tags[key]
                t.attrs = [a.lower().encode() for a in attrs]
                t.index_attrs = True
            else:
                self._tags[key] = Tag(name, attrs=attrs)
        # longest-match over a sorted list, like the reference's sorted
        # m_dTags scan (src/sphinx.cpp:18205-18225): candidates sharing a
        # first char are tried in ascending order; the first tag whose name
        # is a prefix with a non-tag char following wins.  Bucketed by
        # first byte: tags in other buckets can never match, and intra-
        # bucket order is preserved, so the scan result is identical
        # while _match_tag (called once per '<' in the corpus) touches
        # ~1-3 candidates instead of all ~20.
        self._sorted = sorted(self._tags.values(), key=lambda t: t.name)
        # bucketed under BOTH cases of the first byte so _match_tag
        # needs no .lower() on the probe byte (names are lowercase;
        # candidate order within a bucket is unchanged either way)
        self._by_first: dict[bytes, list[Tag]] = {}
        for tag in self._sorted:
            lo = tag.name[:1]
            self._by_first.setdefault(lo, []).append(tag)
            up = lo.upper()
            if up != lo:
                self._by_first.setdefault(up, []).append(tag)

    # ------------------------------------------------------------------
    def _match_tag(self, data: bytes, i: int) -> tuple[Tag | None, int]:
        """Find a known tag whose name prefixes data[i:] with a non-tag
        char following (sorted candidate scan, src/sphinx.cpp:18205-18225);
        returns (tag, end-of-name index) or (None, i)."""
        for tag in self._by_first.get(data[i : i + 1], ()):
            n = len(tag.name)
            if data[i : i + n].lower() != tag.name:
                continue
            nxt = data[i + n : i + n + 1]
            if nxt == b"" or nxt[0] not in _TAGCHAR:
                return tag, i + n
        return None, i

    @staticmethod
    def _skip_quoted(data: bytes, i: int) -> int:
        """SkipQuoted (src/sphinx.cpp:17628): skip to matching quote."""
        q = data[i]
        j = data.find(q, i + 1)
        return len(data) if j < 0 else j + 1

    # ------------------------------------------------------------------
    def strip(self, data: bytes) -> bytes:
        out = bytearray()
        s, n = 0, len(data)
        # NUL terminates the reference scan; honor embedded NULs
        nul = data.find(b"\0")
        if nul >= 0:
            data, n = data[:nul], nul

        # memoized next-'<'/'&' positions: a find() result stays valid
        # while the cursor has not passed it, so handling a tag never
        # re-scans the whole tail for a distant '&' (and vice versa)
        lt = amp = -1
        tags_dict = self._tags
        whole_tag = _WHOLE_TAG.match
        while True:
            # copy until eof, '<', or '&'
            if lt < s:
                lt = data.find(b"<", s)
                if lt < 0:
                    lt = n
            if amp < s:
                amp = data.find(b"&", s)
                if amp < 0:
                    amp = n
            stop = lt if lt < amp else amp
            out += data[s:stop]
            s = stop
            if s >= n:
                break

            if data[s] == 0x26:  # '&'
                if data[s + 1 : s + 2] == b"#":
                    code = 0
                    s += 2
                    while s < n and data[s] in _DIGITS:
                        # C int wraparound on absurd inputs, like the ref
                        code = (code * 10 + data[s] - 48) & 0xFFFFFFFF
                        s += 1
                    if code >= 0x80000000:
                        code -= 0x100000000  # signed view, matches C int
                    if code == 0 or data[s : s + 1] != b";":
                        continue  # quirk: drop consumed "&#digits"
                    out += _utf8_encode_sphinx(code)
                    s += 1
                else:
                    if data[s + 1 : s + 2] and data[s + 1] in _ALPHA:
                        start = s + 1
                        j = start
                        while j < n and data[j] != 0x3B and j - start <= MAX_ENTITY_LEN:
                            j += 1
                        if j < n and data[j] == 0x3B:
                            code = ENTITIES.get(data[start:j], 0)
                            if code > 0 and 2 <= j - start <= MAX_ENTITY_LEN:
                                out += _utf8_encode_sphinx(code)
                                s = j + 1
                                continue
                    out.append(data[s])  # pass '&', rescan after it
                    s += 1
                continue

            # '<' — whole-tag fast path first: one C-level match
            # consumes name + quote-aware attribute region + '>'.
            # Indexed-attr and remove-element tags still take the
            # automaton (attr extraction / content skip), as does
            # anything the strict pattern rejects.
            m = whole_tag(data, s)
            if m is not None:
                tag = tags_dict.get(m.group(2).lower())
                if tag is None:
                    out += b" "  # unknown tags are not inline
                    s = m.end()
                    continue
                if not tag.index_attrs and not tag.remove:
                    s = m.end()
                    # unconditional in the ref (src/sphinx.cpp:18318)
                    # — a second '>' right after a consumed one is
                    # eaten too (e.g. "<b>>")
                    if data[s : s + 1] == b">":
                        s += 1
                    if not tag.inline:
                        out += b" "
                    continue

            nxt = data[s + 1 : s + 2]
            if not nxt or nxt[0] not in _TAGSTART:
                if nxt == b"/":
                    third = data[s + 2 : s + 3]
                    if not third or third[0] not in _TAGSTART:
                        out.append(data[s])
                        s += 1
                        continue
                    # fall through to closing-tag handling below
                elif nxt == b"!":
                    if data[s + 2 : s + 4] != b"--":
                        out.append(data[s])
                        s += 1
                        continue
                    end = data.find(b"-->", s + 4)
                    if end < 0:
                        break  # unterminated comment swallows the tail
                    s = end + 3
                    continue
                elif nxt == b"?":
                    end = data.find(b"?>", s + 2)
                    if end < 0:
                        break
                    s = end + 2
                    continue
                else:
                    out.append(data[s])
                    s += 1
                    continue
            s += 1  # skip '<'

            name_at = s + 1 if data[s : s + 1] == b"/" else s
            tag, after = self._match_tag(data, name_at)
            if tag is not None:
                s = after

            if tag is None or not tag.index_attrs:
                # scan to '>' with quote awareness — one regex hop per
                # '>' / quote instead of a per-byte loop
                while True:
                    m = _GT_OR_QUOTE.search(data, s)
                    if m is None:
                        s = n
                        break
                    s = m.start()
                    if data[s] == 0x3E:
                        break
                    s = self._skip_quoted(data, s)
                if s < n:
                    s += 1
                if tag is None:
                    out += b" "  # unknown tags are not inline
                    continue

            if tag.index_attrs:
                s = self._index_attrs(data, s, tag, out)
            # unconditional in the ref (src/sphinx.cpp:18318) — a second
            # '>' right after a consumed one is eaten too (e.g. "<b>>")
            if data[s : s + 1] == b">":
                s += 1

            if not tag.remove:
                if not tag.inline:
                    out += b" "
                continue

            if s >= n:
                break  # sudden eof after remove-tag open

            if data[s - 2 : s - 1] == b"/":  # short form <script/>
                continue

            # skip content until the matching close tag
            tl = len(tag.name)
            while True:
                j = data.find(b"</", s)
                if j < 0:
                    s = n
                    break
                s = j + 2
                if data[s : s + tl].lower() != tag.name:
                    continue
                if s + tl >= n or data[s + tl] not in _TAGCHAR:
                    s += tl
                    if data[s : s + 1] == b">":
                        s += 1
                    break
            if not tag.inline:
                out += b" "

        return bytes(out)

    # ------------------------------------------------------------------
    def _index_attrs(self, data: bytes, s: int, tag: Tag, out: bytearray) -> int:
        """html_index_attrs value extraction (src/sphinx.cpp:18253-18316)."""
        n = len(data)
        while s < n and data[s] != 0x3E:
            # skip non-tag chars (quote-aware)
            while s < n and data[s] != 0x3E:
                if data[s] in (0x27, 0x22):
                    s = self._skip_quoted(data, s)
                    while s < n and data[s] in _SPACE:
                        s += 1
                if s < n and data[s] in _TAGCHAR:
                    break
                s += 1
            if s >= n or data[s] not in _TAGCHAR:
                if s < n:
                    s += 1
                break

            # match attribute name
            matched = None
            for attr in tag.attrs:
                al = len(attr)
                if data[s : s + al].lower() == attr and (
                    data[s + al : s + al + 1] == b"="
                    or (s + al < n and data[s + al] in _SPACE)
                ):
                    s += al
                    matched = attr
                    break
            if matched is None:
                while s < n and data[s] in _TAGCHAR:
                    s += 1
                continue

            while s < n and data[s] in _SPACE:
                s += 1
            if s >= n:
                break
            if data[s] != 0x3D:  # '='
                s += 1
                break
            s += 1
            while s < n and data[s] in _SPACE:
                s += 1

            if s < n and data[s] in (0x27, 0x22):
                q = data[s]
                s += 1
                j = data.find(bytes((q,)), s)
                j = n if j < 0 else j
                out += data[s:j]
                out += b" "
                s = j + 1 if j < n else n
                continue
            start = s
            while s < n and data[s] not in _SPACE and data[s] != 0x3E:
                s += 1
            out += data[start:s]
            out += b" "
        return s


# ----------------------------------------------------------------------
def make_strip_udf(
    remove_elements: str = "script, style",
    index_attrs: dict[str, list[str]] | None = None,
):
    """Arrow-batched pandas UDF: html binary/string -> stripped text.

    The automaton state never crosses rows, so each Arrow batch is
    processed independently on executors; throughput scales with
    partition count (the 100TB path: one batch per parquet row-group).
    """
    config = (remove_elements, tuple(sorted((index_attrs or {}).items())))

    @F.pandas_udf(StringType())
    def strip_html(col: pd.Series) -> pd.Series:
        stripper = HtmlStripper(config[0], dict((k, list(v)) for k, v in config[1]))
        vals = []
        for v in col:
            if v is None:
                vals.append(None)
                continue
            b = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
            vals.append(stripper.strip(bytes(b)).decode("utf-8", errors="replace"))
        return pd.Series(vals, dtype="object")

    return strip_html
