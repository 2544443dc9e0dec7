"""Generative robustness fuzz of the excerpts generator.

The snippet goldens (tests/test_excerpts.py) pin byte-exact outputs
for the reference's own fixtures; nothing exercises *hostile* inputs
— degenerate limits, boundary-char soup, CJK runs mid-passage,
markers longer than the limit, 30+ keywords at the 32-word mask cap,
star patterns, empty/whitespace documents.  Here: 400 randomized
(text, words, options) triples through `build_excerpt`
(sphBuildExcerpt, src/sphinxexcerpt.cpp:907) must each

* return a str within a SIGALRM deadline (no hangs — the passage
  extraction loop and the highlight emitters walk index math that a
  no-progress bug would spin on),
* never leak an internal exception type, and
* emit BALANCED highlight markers (every before_match has its
  after_match) — checked with sentinel markers that cannot occur in
  the generated text.

Driver-side only (build_excerpt is plain Python; the Spark wrapper
just Arrow-batches it), so the fuzz is fast.
"""

from __future__ import annotations

import random
import signal

from sphinx_1_spark.operators.excerpts import ExcerptOptions, build_excerpt
from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings


class _Deadline:
    def __init__(self, seconds: float):
        self.seconds = seconds

    def __enter__(self):
        def _fire(signum, frame):
            raise TimeoutError("build_excerpt exceeded the deadline")

        self._old = signal.signal(signal.SIGALRM, _fire)
        signal.setitimer(signal.ITIMER_REAL, self.seconds)
        return self

    def __exit__(self, *exc):
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, self._old)
        return False


VOCAB = (
    "alpha beta gamma delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa"
).split()

_JUNK = list(".,;:!?-_()[]{}'\"<>&/\\|@#$%^*+=~`é中文の")


def _rand_text(rng: random.Random) -> str:
    n = rng.randint(0, 120)
    parts = []
    for _ in range(n):
        r = rng.random()
        if r < 0.55:
            parts.append(rng.choice(VOCAB))
        elif r < 0.7:
            parts.append(rng.choice(_JUNK) * rng.randint(1, 3))
        elif r < 0.8:
            parts.append(
                "".join(rng.choice("abcdefghij") for _ in range(rng.randint(1, 60)))
            )
        elif r < 0.9:
            parts.append("中文分词" * rng.randint(1, 4))
        else:
            parts.append(rng.choice(("", " ", "\t", "\n", "  ")))
        parts.append(rng.choice((" ", " ", " ", "", "\n", ". ")))
    return "".join(parts)


def _rand_words(rng: random.Random) -> str:
    k = rng.randint(1, 36)  # crosses the 32-word DWORD mask cap
    out = []
    for _ in range(k):
        w = rng.choice(VOCAB)
        r = rng.random()
        if r < 0.15:
            w = w[:3] + "*"
        elif r < 0.22:
            w = "*" + w[2:]
        elif r < 0.27:
            w = rng.choice(_JUNK)
        out.append(w)
    return " ".join(out)


def _rand_options(rng: random.Random) -> ExcerptOptions:
    return ExcerptOptions(
        before_match="\x01[",
        after_match="\x01]",
        chunk_separator=rng.choice((" ... ", "", "|")),
        limit=rng.choice((0, 1, 8, 40, 256, 100000)),
        around=rng.choice((0, 1, 5, 50)),
        exact_phrase=rng.random() < 0.2,
        single_passage=rng.random() < 0.2,
        use_boundaries=rng.random() < 0.2,
        weight_order=rng.random() < 0.3,
        boundary_chars=rng.choice(("", ".!?", ",")),
    )


def test_excerpt_soup_never_hangs_and_balances_markers():
    rng = random.Random(20260819)
    tk = Tokenizer(TokenizerSettings())
    n_nonempty = 0
    for i in range(400):
        text = _rand_text(rng)
        words = _rand_words(rng)
        opts = _rand_options(rng)
        try:
            with _Deadline(10.0):
                out = build_excerpt(text, words, opts, tk)
        except TimeoutError:
            raise AssertionError(
                f"case {i}: HANG on text={text[:80]!r} words={words!r} "
                f"opts={opts}"
            )
        except Exception as e:  # noqa: BLE001 — diagnose the leak class
            raise AssertionError(
                f"case {i}: leaked {type(e).__name__}: {e} on "
                f"text={text[:80]!r} words={words!r} opts={opts}"
            )
        assert isinstance(out, str)
        assert out.count("\x01[") == out.count("\x01]"), (
            f"case {i}: unbalanced markers in {out[:200]!r} "
            f"(text={text[:80]!r} words={words!r} opts={opts})"
        )
        if out.count("\x01["):
            n_nonempty += 1
    # the fuzz actually highlighted something, often
    assert n_nonempty >= 100, f"only {n_nonempty} cases highlighted"
