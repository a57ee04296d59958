"""Text normalization + tokenization — the executable spec (pure Python).

Re-derives, from scratch, the token semantics of the reference analyzer chain
(NGramAnalyzer = WhitespaceTokenizer → UniformFilter → StopFilter →
WhitespaceFilter → NGramFilter; see reference NGramAnalyzer.scala:29-37,
UniformFilter.scala:42-49, WhitespaceFilter.scala:87-90, NGramFilter.scala:92-111,
Tools.scala:44-76, NGSize.scala:17-18). This module is the parity oracle for the
vectorized Spark UDFs AND the driver-side query preparation (queries are tiny).

Pinned deviations from the reference (documented per SURVEY.md §7 watch list):
- Scala `Set` iteration order is hash-based/nondeterministic where the reference
  builds query word sets (SimDocsSearch.scala:369-376 `.toSet.take(maxWords)`);
  we pin FIRST-OCCURRENCE order (the order produced by the LinkedHashSet in
  Tools.strongUniformString before `.toSet` discards it). Scores are unaffected;
  only which words survive the >100-word cap can differ.
"""
from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

MIN_NGRAM = 3  # reference NGSize.scala:17
MAX_NGRAM = 6  # reference NGSize.scala:18
MAX_WORDS = 100  # reference SimDocsSearch.scala:38
MAX_TOKEN_LEN = 255  # Lucene WhitespaceTokenizer default maxTokenLen

# Java Character.isWhitespace: Unicode space separators (Zs/Zl/Zp) EXCEPT the
# non-breaking ones (U+00A0, U+2007, U+202F), plus \t \n \x0b \f \r, U+001C-1F.
# Python's str.split() WOULD split on NBSP — hence this explicit class.
_JAVA_WS = "".join(
    chr(c)
    for c in (
        [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20, 0x1680]
        + list(range(0x2000, 0x200B))
        + [0x2028, 0x2029, 0x205F, 0x3000]
    )
    if c != 0x2007
)
JAVA_WS_RE = re.compile(f"[{re.escape(_JAVA_WS)}]+")

# Unicode block "Combining Diacritical Marks" = U+0300..U+036F exactly
# (Java \p{InCombiningDiacriticalMarks}); NOT the full Mn category.
_COMBINING_RE = re.compile("[\u0300-\u036f]")
# Java \w is ASCII-only: [a-zA-Z0-9_]. Input is lowercased first.
_NONWORD_RE = re.compile(r"[^a-zA-Z0-9_\-]")
_MULTISPACE_RE = re.compile(" +")

# Java String.trim() strips chars <= U+0020.
_JAVA_TRIM = "".join(chr(c) for c in range(0x21))


def java_trim(s: str) -> str:
    return s.strip(_JAVA_TRIM)


def uniform_string(s: str) -> str:
    """trim → lowercase → NFD → strip U+0300-036F → non-[a-z0-9_-] → space."""
    s1 = unicodedata.normalize("NFD", java_trim(s).lower())
    s2 = _COMBINING_RE.sub("", s1)
    return _NONWORD_RE.sub(" ", s2)


def strong_uniform_string(s: str, sort: bool = False) -> str:
    """uniform (no trim-first) → split → len>=3 → ordered/sorted dedup → join."""
    s1 = unicodedata.normalize("NFD", s.lower())
    s2 = _COMBINING_RE.sub("", s1)
    parts = [t for t in _MULTISPACE_RE.split(java_trim(_NONWORD_RE.sub(" ", s2))) if len(t) >= 3]
    seen: dict[str, None] = {}
    for t in parts:
        seen.setdefault(t)
    words = sorted(seen) if sort else list(seen)
    return " ".join(words)


def _ws_tokenize(text: str) -> list[str]:
    """Whitespace tokens, each chunked at MAX_TOKEN_LEN chars (Lucene behavior:
    the tokenizer flushes a token when its buffer reaches maxTokenLen and
    continues with the remainder as the next token)."""
    out: list[str] = []
    for w in JAVA_WS_RE.split(text):
        if not w:
            continue
        if len(w) <= MAX_TOKEN_LEN:
            out.append(w)
        else:
            out.extend(w[i : i + MAX_TOKEN_LEN] for i in range(0, len(w), MAX_TOKEN_LEN))
    return out


@lru_cache(maxsize=1)
def _stop_set() -> frozenset[str]:
    from .stopwords import ALL

    return ALL


def analyze(
    text: str,
    pre_uniform: bool = False,
    max_tokens: int | None = None,
    min_size: int = MIN_NGRAM,
    max_size: int = MAX_NGRAM,
) -> list[str]:
    """Full analyzer chain → ordered list of DISTINCT prefix tokens.

    pre_uniform=True models the rerank path (getCommonNGrams /getNGrams calls
    pass Tools.uniformString(text) into the analyzer: SimDocsSearch.scala:519-521),
    which changes stopword-check granularity: normalization happens BEFORE
    whitespace tokenization, so the stop filter sees space-free words. With
    pre_uniform=False (index path), a raw token like "the(cat" uniformizes to
    "the cat" which is NOT a stopword, so "the" survives into the index.
    """
    stop = _stop_set()
    if pre_uniform:
        text = uniform_string(text)
    tokens: list[str] = []
    seen: set[str] = set()
    for raw in _ws_tokenize(text):
        u = uniform_string(raw)
        if u in stop:  # StopFilter runs on the whole uniformized token
            continue
        for part in _MULTISPACE_RE.split(java_trim(u)):
            if len(part) < min_size:
                continue
            ng = part[: min(max_size, len(part))]
            if ng not in seen:
                seen.add(ng)
                tokens.append(ng)
                if max_tokens is not None and len(tokens) >= max_tokens:
                    return tokens
    return tokens


def uniform_text(text: str, max_words: int = MAX_WORDS) -> list[str]:
    """Query word prep (reference SimDocsSearch.scala:369-376): strong-uniform,
    split, len >= max(3, min_size), de-stopword, dedup (first-occurrence order
    pinned — see module docstring), cap at max_words."""
    stop = _stop_set()
    words: list[str] = []
    seen: set[str] = set()
    for w in strong_uniform_string(text).split(" "):
        if len(w) >= max(3, MIN_NGRAM) and w not in stop and w not in seen:
            seen.add(w)
            words.append(w)
            if len(words) >= max_words:
                break
    return words


def query_terms(text: str, max_words: int = MAX_WORDS) -> dict[str, int]:
    """Query term multiset: each surviving word is analyzed independently
    (Lucene QueryParser whitespace-splits, then analyzes each word with its own
    token stream: SimDocsSearch.scala:395-402), so two distinct words sharing a
    6-char prefix yield DUPLICATE term clauses; Lucene's BooleanQuery rewrite
    merges duplicate SHOULD clauses by summing boosts → term weight = count."""
    weights: dict[str, int] = {}
    for w in uniform_text(text, max_words):
        for t in analyze(w):
            weights[t] = weights.get(t, 0) + 1
    return weights


def query_rerank_tokens(text: str, max_tokens: int = MAX_WORDS) -> list[str]:
    """Query-side token set used for the overlap rerank (getDocMeta:
    SimDocsSearch.scala:299 calls getNGrams on the joined uniformized words)."""
    joined = " ".join(uniform_text(text))
    return analyze(java_trim(joined), pre_uniform=True, max_tokens=max_tokens)
