"""Morphology processors: Sphinx's English stemmer and Soundex.

Re-implements the *behavior* of the reference processors
(`stem_en`, src/sphinxstemen.cpp:186-338; `stem_soundex`,
src/sphinxsoundex.cpp:16-41) as pure Python functions over str.
The English stemmer is Sphinx's hand-rolled Porter variant — NOT
snowball Porter2: it carries a fixed exception table, a `gener`
R1 special case, a simplified step-1a plural rule (final `s`
dropped whenever not preceded by `u`/`s`, no vowel condition), and
step 3 runs against R1 where Porter2 uses R2 for `ative`.  Golden
parity with the compiled reference is pinned by
tests/test_morphology.py (3k+ word pairs).

Chain semantics (CSphDictCRC::ApplyStemmers, src/sphinx.cpp:17005):
a wordforms hit skips stemming entirely; otherwise words shorter
than `min_stemming_len` pass through; otherwise processors apply in
order until the first one that CHANGES the word (StemById,
src/sphinx.cpp:17341-17400 returns changed?).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")  # stem_en_vowels; marked 'Y' is a consonant
_VWXY = frozenset("aeiouywxY")  # stem_en_vwxy
_DOUBLES = frozenset("bdfgmnprt")  # stem_en_doubles
_LI_ENDERS = frozenset("bcdeghkmnrt")  # stem_en_li

# en_except (src/sphinxstemen.cpp:23-47): exact-match rewrites applied
# before anything else; identity rows pin irregular words.
_EXCEPTIONS = {
    "skies": "sky", "dying": "die", "lying": "lie", "tying": "tie",
    "innings": "inning", "outings": "outing", "cannings": "canning",
    "idly": "idl", "gently": "gentl", "ugly": "ugli", "early": "earli",
    "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "inning": "inning",
    "outing": "outing", "canning": "canning", "proceed": "proceed",
    "exceed": "exceed", "succeed": "succeed",
}

# (suffix, n_remove, replacement) — en_step2/3/4 tables. A suffix that
# matches but fails its region test still ends the scan (reference
# returns "handled" without rewriting).
_STEP2 = (
    ("enci", 1, "e"), ("anci", 1, "e"), ("abli", 1, "e"), ("bli", 1, "e"),
    ("entli", 2, ""), ("aliti", 3, ""), ("ousli", 2, ""), ("iviti", 3, "e"),
    ("biliti", 5, "le"), ("fulli", 2, ""), ("lessli", 2, ""),
    ("ational", 5, "e"), ("tional", 2, ""), ("alism", 3, ""),
    ("ization", 5, "e"), ("ation", 3, "e"), ("izer", 1, ""), ("ator", 2, "e"),
    ("fulness", 4, ""), ("ousness", 4, ""), ("iveness", 4, ""),
)
_STEP3 = (
    ("alize", 3, ""), ("icate", 3, ""), ("ative", 5, ""), ("iciti", 3, ""),
    ("ical", 2, ""), ("ful", 3, ""), ("ness", 4, ""),
)
_STEP4 = (
    ("ic", 2, ""), ("ance", 4, ""), ("ence", 4, ""), ("able", 4, ""),
    ("ible", 4, ""), ("ate", 3, ""), ("ive", 3, ""), ("ize", 3, ""),
    ("iti", 3, ""), ("al", 2, ""), ("ism", 3, ""), ("er", 2, ""),
    ("ous", 3, ""), ("ement", 5, ""), ("ment", 4, ""), ("ant", 3, ""),
    ("ent", 3, ""),
)


def _apply_table(w: list, n: int, r: int, table) -> tuple[int, bool]:
    """First suffix match wins; region failure still stops the scan."""
    for suffix, nremove, add in table:
        sl = len(suffix)
        if sl > n or "".join(w[n - sl:n]) != suffix:
            continue
        if n - sl < r:
            return n, True
        n -= nremove
        for ch in add:
            if n < len(w):
                w[n] = ch
            else:
                w.append(ch)
            n += 1
        return n, True
    return n, False


def stem_en(word: str) -> str:
    """Sphinx English stemmer (stem_en, src/sphinxstemen.cpp:186)."""
    if len(word) <= 2:
        return word
    exc = _EXCEPTIONS.get(word)
    if exc is not None:
        return exc

    w = list(word)
    n = len(w)

    # consonant-y marking: initial y, and y after a vowel
    if w[0] == "y":
        w[0] = "Y"
    for i in range(1, n):
        if w[i] == "y" and w[i - 1] in _VOWELS:
            w[i] = "Y"

    # R1/R2 (gener- special case)
    r1 = r2 = n
    if "".join(w[:5]) == "gener":
        r1 = 5
    else:
        for i in range(n - 1):
            if w[i] in _VOWELS and w[i + 1] not in _VOWELS:
                r1 = i + 2
                break
    for i in range(r1, n - 1):
        if w[i] in _VOWELS and w[i + 1] not in _VOWELS:
            r2 = i + 2
            break

    def suff(s: str) -> bool:
        return n >= len(s) and "".join(w[n - len(s):n]) == s

    def emit(ch: str) -> None:
        nonlocal n
        if n < len(w):
            w[n] = ch
        else:
            w.append(ch)
        n += 1

    # step 1a: sses; ied/ies (keep final char for 4-letter words);
    # bare s unless preceded by u/s (no vowel condition — quirk)
    if suff("sses"):
        n -= 2
    if n >= 3 and w[n - 3] == "i" and w[n - 2] == "e" and w[n - 1] in "ds":
        n -= 1 if n == 4 else 2
    if n >= 2 and w[n - 1] == "s" and w[n - 2] not in "us":
        n -= 1

    # step 1b
    strip = 0
    if suff("eed"):
        if n - 3 >= r1:
            n -= 1
    elif suff("eedly"):
        if n - 5 >= r1:
            n -= 3
    elif suff("ed"):
        strip = 2
    elif suff("ing"):
        strip = 3
    elif suff("edly"):
        strip = 4
    elif suff("ingly"):
        strip = 5
    if strip and any(w[j] in _VOWELS for j in range(n - strip)):
        n -= strip
        if suff("at") or suff("bl") or suff("iz"):
            emit("e")
        elif n >= 2 and w[n - 1] == w[n - 2] and w[n - 1] in _DOUBLES:
            n -= 1
        elif (n == 2 and w[0] in _VOWELS and w[1] not in _VOWELS) or (
            n == r1
            and n >= 3
            and w[n - 3] not in _VOWELS
            and w[n - 2] in _VOWELS
            and w[n - 1] not in _VWXY
        ):
            emit("e")

    # step 1c: terminal y/Y after a consonant -> i
    if n > 2 and w[n - 1] in "yY" and w[n - 2] not in _VOWELS:
        w[n - 1] = "i"

    # step 2 (+ the ogi / li / al->ation special tail)
    n, handled = _apply_table(w, n, r1, _STEP2)
    if not handled:
        if n - 3 >= r1 and suff("ogi"):
            n -= 1
        elif n - 2 >= r1 and suff("li"):
            n -= 2
            if n - 2 >= r1 and suff("al"):
                n -= 2
                if n - 5 >= r1 and suff("ation"):
                    n -= 3
                    emit("e")
                elif not suff("tion"):
                    n += 2  # restore "al"
            elif w[n - 1] not in _LI_ENDERS:
                n += 2  # restore "li"

    # step 3
    n, _ = _apply_table(w, n, r1, _STEP3)

    # step 4 (+ t/s + ion)
    n, handled = _apply_table(w, n, r2, _STEP4)
    if (
        not handled
        and n - 3 >= r2
        and suff("ion")
        and n >= 4
        and w[n - 4] in "ts"
    ):
        n -= 3

    # step 5a: drop terminal e
    if n >= 1 and w[n - 1] == "e":
        if n > r2:
            n -= 1
        elif n <= r1:
            pass
        elif (
            n > 3
            and w[n - 4] not in _VOWELS
            and w[n - 3] in _VOWELS
            and w[n - 2] not in _VWXY
        ):
            pass
        elif n == 3 and w[0] in _VOWELS and w[1] not in _VOWELS:
            pass
        else:
            n -= 1

    # step 5b: double l
    if n > r2 and n >= 2 and w[n - 1] == "l" and w[n - 2] == "l":
        n -= 1

    return "".join(w[:n]).replace("Y", "y")


_SOUNDEX_CODES = "01230120022455012623010202"  # dLetter2Code


def stem_soundex(word: str) -> str:
    """Sphinx Soundex (stem_soundex, src/sphinxsoundex.cpp:16): only
    all-[a-z] words are encoded; first letter kept, consonant codes
    appended with adjacent-duplicate suppression, zero-padded to 4
    but never beyond the original length."""
    if not word:
        return word
    for c in word:
        if not ("a" <= c <= "z"):
            return word
    out = [word[0]]
    for c in word[1:]:
        code = _SOUNDEX_CODES[ord(c) - 97]
        if code != "0" and out[-1] != code:
            out.append(code)
    while len(out) < 4 and len(out) < len(word):
        out.append("0")
    return "".join(out)


def _lazy_stemmer(name):
    def proc(token: str) -> str:
        from sphinx_1_spark.functions import stemmers

        return getattr(stemmers, name)(token)

    proc.__name__ = name
    return proc


_PROCESSORS = {
    "stem_en": stem_en,
    "soundex": stem_soundex,
    # ports in functions/stemmers.py (golden-pinned vs the compiled
    # reference processors)
    "stem_ru": _lazy_stemmer("stem_ru"),
    "stem_cz": _lazy_stemmer("stem_cz"),
    "metaphone": _lazy_stemmer("stem_metaphone"),
}


def resolve_chain(names) -> list:
    """Morphology spec -> processor list (SPH_MORPH_* ids resolved in
    ParseMorphology, src/sphinx.cpp:16890-16935).  `stem_enru` is the
    reference's combined EN+RU chain entry; `none` is a no-op."""
    out = []
    for nm in names:
        if nm == "none":
            continue
        if nm == "stem_enru":
            out.append(_PROCESSORS["stem_en"])
            out.append(_PROCESSORS["stem_ru"])
            continue
        if nm.startswith("libstemmer_"):
            # Permanent N/A, matching the reference's SHIPPED build:
            # libstemmer is behind USE_LIBSTEMMER which defaults to 0
            # (src/sphinx.h:26), the bundled libstemmer_c/ tree ships
            # no sources, and no reference e2e test uses a
            # libstemmer_* keyword — so the compiled reference rejects
            # these exactly like we do (ParseMorphology falls through
            # to 'unknown stemmer', src/sphinx.cpp:16978).  The built-in
            # en/ru/cz/soundex/metaphone chains are golden-pinned.
            raise ValueError(
                f"morphology {nm!r}: libstemmer is not compiled into the "
                "reference's shipped build (USE_LIBSTEMMER=0, "
                "src/sphinx.h:26) and is a documented permanent N/A "
                "here; use stem_en/stem_ru/stem_cz/stem_enru/soundex/"
                "metaphone"
            )
        try:
            out.append(_PROCESSORS[nm])
        except KeyError:
            raise ValueError(
                f"unknown morphology {nm!r}; known: "
                f"{sorted(_PROCESSORS) + ['stem_enru', 'none']}"
            ) from None
    return out


def apply_morphology(
    token: str, chain: list, min_stemming_len: int = 1, cache: dict | None = None
) -> str:
    """ApplyStemmers minus the wordforms branch (handled by caller):
    first processor that changes the token wins."""
    if min_stemming_len > 1 and len(token) < min_stemming_len:
        return token
    if cache is not None:
        hit = cache.get(token)
        if hit is not None:
            return hit
    out = token
    for proc in chain:
        stemmed = proc(out)
        if stemmed != out:
            out = stemmed
            break
    if cache is not None:
        cache[token] = out
    return out
