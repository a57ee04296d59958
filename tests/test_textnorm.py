"""Tokenizer spec tests — tricky Unicode, stopwords, prefix truncation, dedup.

Expected values are hand-derived from the reference semantics
(Tools.scala:44-76, NGramAnalyzer.scala:29-37, NGramFilter.scala:92-111).
"""
from __future__ import annotations

from similardocs_spark import textnorm as tn
from similardocs_spark.stopwords import ALL, ENGLISH, PORTUGUESE, SPANISH


def test_uniform_string_basics():
    assert tn.uniform_string("  Café — Ção!  ") == "cafe   cao "
    assert tn.uniform_string("AçãO") == "acao"
    assert tn.uniform_string("hyphen-word_under") == "hyphen-word_under"
    assert tn.uniform_string("ñandú") == "nandu"
    # non-ASCII letters without decomposition are dropped (Java \w is ASCII)
    assert tn.uniform_string("straße") == "stra e"
    # combining marks outside U+0300-036F survive the strip but die at \w
    assert tn.uniform_string("àb") == "ab"


def test_stopword_quirks():
    assert "don t" in ENGLISH  # "don't" normalized
    assert " ll" in ENGLISH  # "'ll" keeps its leading space
    assert "keep  keeps" in ENGLISH and "keep" not in ENGLISH and "keeps" not in ENGLISH
    assert "the" in ENGLISH and "para" in PORTUGUESE and "donde" in SPANISH
    assert len(ALL) > 1500


def test_analyze_prefix_and_dedup():
    # len<3 dropped; prefix 6; dedup keeps first occurrence order
    assert tn.analyze("ab abc abcdefgh abcdefZZ xyz") == ["abc", "abcdef", "xyz"]
    # stopwords removed as whole tokens
    assert tn.analyze("the cat and the dog") == ["cat", "dog"]
    # stopword check happens BEFORE the inner whitespace re-split:
    # "the(cat" uniformizes to "the cat" (not a stopword) → "the" survives
    assert tn.analyze("the(cat") == ["the", "cat"]
    # ... but with pre_uniform (rerank path) "the" is stop-filtered
    assert tn.analyze("the(cat", pre_uniform=True) == ["cat"]


def test_analyze_unicode_and_hyphen():
    assert tn.analyze("Febre-Amarela É grave") == ["febre-", "grave"]
    assert tn.analyze("mortalidade infantil") == ["mortal", "infant"]
    assert tn.analyze("açaí Açaí ACAI") == ["acai"]
    # NBSP is NOT Java whitespace: token "a b" uniformizes to "a b" → both < 3 dropped
    assert tn.analyze("a b") == []
    assert tn.analyze("cat dog") == ["cat", "dog"]  # via inner re-split


def test_analyze_max_token_len_chunking():
    long = "x" * 600
    # 600 chars → chunks of 255/255/90 → prefix "xxxxxx" dedup'd to one token
    assert tn.analyze(long) == ["xxxxxx"]
    mixed = "a" * 255 + "b" * 3
    # one whitespace token of 258 chars → chunks "a"*255, "bbb"
    assert tn.analyze(mixed) == ["aaaaaa", "bbb"]


def test_analyze_empty_and_whitespace():
    assert tn.analyze("") == []
    assert tn.analyze("   \t\n ") == []
    assert tn.analyze("!!! ... ???") == []


def test_uniform_text_query_prep():
    # dedup, stopword removal, len>=3, first-occurrence order
    assert tn.uniform_text("Zika dengue ZIKA the a xy") == ["zika", "dengue"]
    cap = tn.uniform_text(" ".join(f"word{i:04d}" for i in range(150)))
    assert len(cap) == 100 and cap[0] == "word0000"


def test_query_terms_weights():
    # two words sharing a 6-char prefix → weight 2
    w = tn.query_terms("abcdefgh abcdefZZ dengue")
    assert w == {"abcdef": 2, "dengue": 1}


def test_query_rerank_tokens():
    assert tn.query_rerank_tokens("zika dengue zika") == ["zika", "dengue"]


def test_max_tokens_cap():
    text = " ".join(f"tk{i:04d}" for i in range(200))
    toks = tn.analyze(text, max_tokens=100)
    assert len(toks) == 100 and toks[-1] == "tk0099"
