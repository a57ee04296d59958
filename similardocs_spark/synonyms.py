"""DeCS-style one-word synonym expansion (reference OneWordDecs.scala:121-161).

The reference looks up descriptors found in the (already normalized) query
text against a thesaurus index and appends their one-word synonyms to the
query string before parsing — so synonyms add BM25 term clauses but do NOT
enter the rerank token set (getDocMeta computes rerank ngrams from the
pre-expansion text: SimDocsSearch.scala:299 vs :398).

An empty dictionary makes expansion the identity, matching a deployment
without a DeCS index. Duplicate appended words stack query-term weights
exactly like duplicate SHOULD clauses do in Lucene.
"""
from __future__ import annotations

from .textnorm import analyze, uniform_string


class SynonymDict:
    """descriptor (will be normalized) → list of one-word synonyms."""

    def __init__(self, mapping: dict[str, list[str]] | None = None):
        self._map: dict[str, list[str]] = {}
        for descr, syns in (mapping or {}).items():
            key = uniform_string(descr).strip()
            if key:
                self._map[key] = [s for s in syns if s and " " not in s.strip()]

    @classmethod
    def from_df(cls, df) -> "SynonymDict":
        """Build from a synonyms DataFrame (descriptor, synonyms array) — the
        thesaurus-index equivalent (reference OneWordDecs.createIndex,
        OneWordDecs.scala:37-58); small dimension table, collected + broadcast
        driver-side."""
        return cls({r["descriptor"]: list(r["synonyms"]) for r in df.collect()})

    def __bool__(self) -> bool:
        return bool(self._map)

    def expand_words(self, normalized_text: str) -> list[str]:
        """Synonym words for every descriptor that appears as a whole-word
        sequence in the normalized query text."""
        if not self._map:
            return []
        padded = f" {normalized_text} "
        out: list[str] = []
        for descr, syns in sorted(self._map.items()):
            if f" {descr} " in padded:
                out.extend(syns)
        return out


def expanded_query_terms(text2: str, synonyms: SynonymDict | None) -> dict[str, int]:
    """Query-term multiset over the normalized word text + appended synonym
    words (each word analyzed with its own stream, duplicate prefixes stack)."""
    words = text2.split(" ") if text2 else []
    if synonyms:
        words = words + synonyms.expand_words(text2)
    weights: dict[str, int] = {}
    for w in words:
        for t in analyze(w):
            weights[t] = weights.get(t, 0) + 1
    return weights
