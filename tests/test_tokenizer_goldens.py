"""Tokenizer token-identity goldens.

Produced by driving the reference tokenizers
(CSphTokenizer_UTF8::GetToken src/sphinx.cpp:4238-4410 and
CSphTokenizer_UTF8Ngram src/sphinx.cpp:4918-4947) compiled from
/root/reference, with the default charset_table
(src/sphinx.cpp:167).  Every doc's token stream must match exactly,
including the 64-codepoint SPH_MAX_WORD_LEN truncation
(src/sphinx.h:145, AccumCodepoint src/sphinx.cpp:2231-2247).
"""

import json
import os

from sphinx_1_spark.functions.tokenizer import Tokenizer, TokenizerSettings

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "tokenize_goldens.jsonl")


def test_tokenize_goldens():
    with open(GOLDENS) as f:
        cases = [json.loads(line) for line in f]
    assert len(cases) >= 200
    toks = {}
    bad = []
    for c in cases:
        key = (c["type"], c["ngram"])
        if key not in toks:
            toks[key] = Tokenizer(TokenizerSettings(ngram_chars=c["ngram"]))
        got = toks[key].tokenize(c["text"])
        if got != c["tokens"]:
            bad.append((c["text"], c["tokens"], got))
    assert not bad, f"{len(bad)} mismatches; first: {bad[0]!r}"
