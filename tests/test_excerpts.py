"""Excerpt (snippet) generator vs the reference's own golden outputs.

The reference e2e harness (test/test_18 "excerpts") ships model.bin —
the PHP-serialized output of the COMPILED reference across a 16-way
config cross-product (charset x min_word_len x stopwords x synonyms).
We replay the exact same docs/words/options through our port and
require byte-identical excerpts on every variant our tokenizer
supports (the 8 non-synonym ones; synonyms = multiforms are a
tokenizer feature tracked separately).

Variant index decoding (ubertest.php cross-product, first Dynamic in
document order = high bit): idx = syn*8 + stop*4 + mwl*2 + charset,
bit 0 = the first <Variant> listed (syn=on, stop=on, mwl=1, utf8).
"""

from __future__ import annotations

import pytest

from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings
from sphinx_1_spark.operators.excerpts import (
    ExcerptOptions,
    build_excerpt,
)
from tests.php_unserialize import loads

MODEL = "/root/reference/test/test_18/model.bin"

DOCS = [
    "ab ab ab ab ab ab ab ab ab ab ab MS",
    "   this,   is .    MS windows....?",
    "this  ,  is a MS but not Windows",
    "this is the Microsoft  Windows , ,",
    "proﬁts, lost savings",
]
WORDS = "MS Windows"
STOPWORDS = frozenset({"a", "the", "and", "of"})  # test/stopwords.txt


SYNONYMS = (  # test/synonyms.txt
    "MS Windows => Windows",
    "Microsoft Windows => Windows",
    "Windows => Windows",
)


def _variants():
    model = loads(open(MODEL, "rb").read())
    out = []
    for syn_bit, syns in ((0, SYNONYMS), (1, ())):
        for stop_bit, stops in ((0, STOPWORDS), (1, frozenset())):
            for mwl_bit, mwl in ((0, 1), (1, 3)):
                vi = syn_bit * 8 + stop_bit * 4 + mwl_bit * 2  # charset=utf8
                out.append((vi, mwl, stops, syns, model[vi][0]))
    return out


@pytest.mark.parametrize(
    "vi,mwl,stops,syns,runs",
    _variants(),
    ids=lambda v: str(v) if isinstance(v, int) else None,
)
def test_excerpts_golden_test18(vi, mwl, stops, syns, runs):
    tk = Tokenizer(
        TokenizerSettings(min_word_len=mwl, stopwords=stops, synonyms=syns)
    )
    # runs = [opts, excerpts, opts, excerpts, opts, excerpts]
    for i in range(0, len(runs), 2):
        o = runs[i]
        expected = runs[i + 1]
        opts = ExcerptOptions(
            before_match=o["before_match"],
            after_match=o["after_match"],
            chunk_separator=o["chunk_separator"],
            limit=o["limit"],
            around=o["around"],
        )
        for doc, want in zip(DOCS, expected):
            got = build_excerpt(doc, WORDS, opts, tk)
            assert got == want, (
                f"variant {vi} limit={o['limit']} doc={doc!r}\n"
                f"  want: {want!r}\n  got:  {got!r}"
            )


def test_excerpts_golden_test40_wildcards():
    """test_40 'excerpts - wildcard matches': star keywords (prefix /
    suffix / infix) over ASCII and Cyrillic docs, single config
    (default utf-8 charset, min_word_len=1)."""
    model = loads(open("/root/reference/test/test_40/model.bin", "rb").read())
    flat = model[0][0]
    docs = [
        "He caught fish in deep pools with invisible fingers and ate them raw.",
        "Невидимыми пальцами ловил он рыбу в глубоких омутах и ел её сырой.",
    ]
    tk = Tokenizer(TokenizerSettings())
    opts = ExcerptOptions(
        before_match="[B]", after_match="[A]", chunk_separator=" ... ",
        limit=100, around=2,
    )
    # flat = [q, [excerpt], q, [excerpt], ...]; first 5 queries run on
    # docs[0], the next 5 on docs[1]
    for i in range(0, len(flat), 2):
        q, want = flat[i], flat[i + 1][0]
        doc = docs[0] if i < 10 else docs[1]
        got = build_excerpt(doc, q, opts, tk)
        assert got == want, f"query {q!r}\n  want {want!r}\n  got  {got!r}"


def test_excerpts_golden_test56_boundaries():
    """test_56 'excerpts & boundaries' (utf-8): use_boundaries passages
    from phrase_boundary='.' with exact_phrase / weight_order combos,
    morphology=stem_enru, min_word_len=3."""
    model = loads(open("/root/reference/test/test_56/model.bin", "rb").read())
    runs = model[0][0]
    tk = Tokenizer(
        TokenizerSettings(
            min_word_len=3,
            morphology=("stem_enru",),
            phrase_boundary=".",
            boundary_step=100,
        )
    )
    d0 = (
        "С другом в саду я сидел. Мокрый склонился бамбук. "
        "Я шел по склону Фудзи. Старую женщину я."
    )
    d1 = "Я шел по склону Фудзи. Старую женщину я."
    d2 = (
        "С другом в саду я сидел. Мокрый склонился бамбук. "
        "Я шел по склону Фудзи. Старую женщину я.  Шел не зная куда. "
    )

    def opts(weight_order, exact_phrase):
        return ExcerptOptions(
            chunk_separator="###",
            limit=20,
            use_boundaries=True,
            weight_order=weight_order,
            exact_phrase=exact_phrase,
        )

    cases = [
        ([d0, d1], "шел", opts(False, False), runs[0]),
        ([d2], "шел по склону", opts(False, True), runs[1]),
        ([d2], "шел по склону", opts(True, True), runs[2]),
        ([d2], "шел по склону", opts(True, False), runs[3]),
    ]
    for docs, words, o, want in cases:
        for doc, exp in zip(docs, want):
            got = build_excerpt(doc, words, o, tk)
            assert got == exp, (
                f"words={words!r} opts={o}\n  want {exp!r}\n  got  {got!r}"
            )


def test_excerpts_golden_test51_exact_phrase():
    """test_51 'snippets vs exact_phrase': default options + exact
    phrase passages over a multi-line document."""
    model = loads(open("/root/reference/test/test_51/model.bin", "rb").read())
    runs = model[0][0]  # [q1, [excerpt1], q2, [excerpt2]]
    text = (
        "\tone perfusate chubby profound chubby multiplicity promontory\n"
        "\tchubby pilotfish pilotfish chubby bisect pilotfish perfusate\n"
        "\tmultiplicity whichsoever pilotfish INVALID CAJUPUT reedbuck\n"
        "\twhichsoever disposition felspar pilotfish reedbuck pilotfish\n"
        "\tdetestable\n"
        "\n"
        "\ttwo bisect reedbuck whichsoever profound comforter detestable\n"
        "\tbisect comforter CAJUPUT felspar INVALID humanism profound multiplicity\n"
        "\tpromontory profound reedbuck perfusate promontory felspar\n"
        "\tmultiplicity reedbuck profound profound whirligig detestable\n"
        "\twhirligig INVALID\n"
        "\n"
        "\tthree pilotfish promontory CAJUPUT INVALID CAJUPUT INVALID EXPOSITOR\n"
        "\twhirligig felspar disposition pilotfish chubby promontory\n"
        "\tpilotfish INVALID CAJUPUT detestable INVALID felspar whichsoever profound\n"
        "\twhichsoever comforter humanism detestable promontory comforter\n"
        "\tchubby CAJUPUT INVALID humanism CAJUPUT"
    )
    tk = Tokenizer(TokenizerSettings())
    for i in range(0, len(runs), 2):
        q, want = runs[i], runs[i + 1][0]
        got = build_excerpt(text, q, ExcerptOptions(exact_phrase=True), tk)
        assert got == want, f"query {q!r}\n  want {want!r}\n  got  {got!r}"


def test_excerpts_star_and_phrase():
    """Star wildcard + exact_phrase paths (no reference golden for
    these options in test_18; assert the behavioral contract)."""
    tk = Tokenizer(TokenizerSettings())
    # trailing star: prefix match
    out = build_excerpt(
        "winter wind windmill dow", "wind*", ExcerptOptions(limit=0), tk
    )
    assert out == "winter <b>wind</b> <b>windmill</b> dow"
    # exact_phrase highlights only adjacent sequence
    out = build_excerpt(
        "ms office and ms windows here",
        "ms windows",
        ExcerptOptions(limit=0, exact_phrase=True),
        tk,
    )
    assert out == "ms office and <b>ms windows</b> here"


def test_excerpts_no_match_leading_tokens():
    tk = Tokenizer(TokenizerSettings())
    out = build_excerpt(
        "alpha beta gamma delta epsilon zeta eta theta",
        "missing",
        ExcerptOptions(limit=12),
        tk,
    )
    assert out.endswith(" ... ")
    assert out.startswith("alpha beta")


def test_excerpts_dataframe_op(spark):
    from sphinx_1_spark.operators.excerpts import excerpts

    df = spark.createDataFrame(
        [(1, "hello world of search engines"), (2, "no matches here")],
        ["id", "body"],
    )
    rows = {
        r["id"]: r["excerpt"]
        for r in excerpts(df, "body", "search", ExcerptOptions(limit=0)).collect()
    }
    assert rows[1] == "hello world of <b>search</b> engines"
    assert rows[2] == "no matches here"


# ----------------------------------------------------------------------
# test/test_57 "snippets - boundaries, windows-1251": use_boundaries
# over phrase_boundary='.', exact_phrase x weight_order interactions,
# stem_enru morphology, min_word_len=3, SBCS cp1251 charset (decoded
# to unicode; the default sbcs charset_table mapped to its unicode
# codepoints).

RU_SBCS_TABLE = (
    "0..9, A..Z->a..z, _, a..z, U+0401->U+0451, U+0451, "
    "U+0410..U+042F->U+0430..U+044F, U+0430..U+044F"
)

_T57_D1 = (
    "С другом в саду я сидел. Мокрый склонился бамбук. "
    "Я шел по склону Фудзи. Старую женщину я."
)
_T57_D2 = "Я шел по склону Фудзи. Старую женщину я."
_T57_D3 = (
    "С другом в саду я сидел. Мокрый склонился бамбук. "
    "Я шел по склону Фудзи. Старую женщину я.  Шел не зная куда. "
)

_T57_CASES = [
    ([_T57_D1, _T57_D2], "шел", dict(weight_order=False, exact_phrase=False)),
    ([_T57_D3], "шел по склону", dict(weight_order=False, exact_phrase=True)),
    ([_T57_D3], "шел по склону", dict(weight_order=True, exact_phrase=True)),
    ([_T57_D3], "шел по склону", dict(weight_order=True, exact_phrase=False)),
]


def _t57_model():
    raw = loads(open("/root/reference/test/test_57/model.bin", "rb").read())

    def fix(x):
        if isinstance(x, str):
            return x.encode("latin-1").decode("cp1251")
        return [fix(i) for i in x]

    return fix(raw)[0][0]


@pytest.mark.parametrize("case_i", range(4))
def test_57_boundary_excerpts_byte_exact(case_i):
    """Byte-identity vs the compiled reference's model.bin for every
    test_57 BuildExcerpts call (boundaries + exact_phrase/weight_order
    cross, Russian stemming active: 'склону' must also light up
    'склонился' when the phrase constraint is off)."""
    docs, words, opts = _T57_CASES[case_i]
    golden = _t57_model()[case_i]
    tk = Tokenizer(
        TokenizerSettings(
            charset_table=RU_SBCS_TABLE,
            min_word_len=3,
            morphology=("stem_enru",),
            phrase_boundary="U+002E",
            boundary_step=100,
        )
    )
    q = ExcerptOptions(
        use_boundaries=True,
        single_passage=False,
        chunk_separator="###",
        limit=20,
        **opts,
    )
    got = [build_excerpt(d, words, q, tk) for d in docs]
    assert got == golden


# ----------------------------------------------------------------------
# test_18 SBCS (charset bit = 1) variants: the reference's sbcs
# tokenizer consumes the document BYTE stream with the default sbcs
# charset_table.  Emulated exactly by mapping every byte to the
# codepoint of the same value (latin-1 view) and running the same
# table in U+00xx space — completes test_18 to all 16 variants.

SBCS_TABLE = (
    "0..9, A..Z->a..z, _, a..z, U+00A8->U+00B8, U+00B8, "
    "U+00C0..U+00DF->U+00E0..U+00FF, U+00E0..U+00FF"
)


def _sbcs_variants():
    model = loads(open(MODEL, "rb").read())
    out = []
    for syn_bit, syns in ((0, SYNONYMS), (1, ())):
        for stop_bit, stops in ((0, STOPWORDS), (1, frozenset())):
            for mwl_bit, mwl in ((0, 1), (1, 3)):
                vi = syn_bit * 8 + stop_bit * 4 + mwl_bit * 2 + 1
                out.append((vi, mwl, stops, syns, model[vi][0]))
    return out


@pytest.mark.parametrize(
    "vi,mwl,stops,syns,runs",
    _sbcs_variants(),
    ids=lambda v: str(v) if isinstance(v, int) else None,
)
def test_excerpts_golden_test18_sbcs(vi, mwl, stops, syns, runs):
    def sb(s: str) -> str:  # unicode -> byte-space (latin-1 view)
        return s.encode("utf-8").decode("latin-1")

    tk = Tokenizer(
        TokenizerSettings(
            charset_table=SBCS_TABLE,
            min_word_len=mwl,
            stopwords=frozenset(sb(w) for w in stops),
            synonyms=tuple(sb(s) for s in syns),
        )
    )
    for i in range(0, len(runs), 2):
        o, expected = runs[i], runs[i + 1]
        opts = ExcerptOptions(
            before_match=o["before_match"],
            after_match=o["after_match"],
            chunk_separator=o["chunk_separator"],
            limit=o["limit"],
            around=o["around"],
        )
        for doc, want in zip(DOCS, expected):
            got = build_excerpt(sb(doc), sb(WORDS), opts, tk)
            assert got == sb(want), (
                f"variant {vi} limit={o['limit']} doc={doc!r}\n"
                f"  want: {want!r}\n  got:  {got!r}"
            )
