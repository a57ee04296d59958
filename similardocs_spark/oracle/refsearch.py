"""Pure-Python reference search engine — the golden-test oracle.

Implements the complete SimilarDocs query lifecycle (reference
SimDocsSearch.scala:122-347) over an in-memory corpus, using the pinned spec
from textnorm.py + bm25.py. The Spark engine must reproduce this oracle's
output exactly (rank + score) on every fixture corpus; this module is therefore
the stand-in for the Scala/Lucene reference, which cannot run in this sandbox.

Semantics covered:
- doc = one conversation: catenation of per-turn texts (each truncated to
  10,000 chars — LuceneIndexAkka.scala:282-283) in (conv_id, turn_idx) order
- BM25 candidates: top 150*k by (score desc, docID asc) — SimDocsSearch.scala:301
- MUST-clause score constants (date range +1.0; db/instance keyword scores)
- overlap rerank: common prefix-tokens (both sides capped at 100) vs adaptive
  threshold, sort by (n_common desc, update_date desc) — :294-331,339-347
- time-bucket ladder recursion with shrinking k — :185-211,263-282
"""
from __future__ import annotations

from bisect import insort
from dataclasses import dataclass, field
from datetime import date, timedelta

import numpy as np

from .. import bm25
from ..synonyms import SynonymDict, expanded_query_terms
from ..textnorm import analyze, query_rerank_tokens, uniform_text

TRUNCATE_CHARS = 10_000  # LuceneIndexAkka.scala:282-283
CANDIDATE_FACTOR = 150  # SimDocsSearch.scala:301
DEFAULT_MAX_DOCS = 10  # Conf.scala:16
DEFAULT_MIN_NGRAMS = 2  # Conf.scala:14
MAX_LOWER_LIMIT = 18250  # 50 years — SimDocsSearch.scala:163

# the day-bucket ladder (lo, hi) — SimDocsSearch.scala:267-280
DAY_BUCKETS: tuple[tuple[int, int], ...] = (
    (0, 10), (11, 40), (41, 70), (71, 100), (101, 160), (161, 220),
    (221, 280), (281, 460), (461, 820), (821, 1180), (1181, 18250),
)


def assemble_doc_text(turn_texts: list[str]) -> str:
    """Catenated doc text: each turn truncated to 10k chars, space-joined."""
    return " ".join(t[:TRUNCATE_CHARS] for t in turn_texts)


def rerank_source_text(turn_texts: list[str]) -> str:
    """Stored-field values, deduplicated (Scala Set), first-occurrence order
    pinned, space-joined (getCommonNGrams docSet: SimDocsSearch.scala:513-518)."""
    seen: dict[str, None] = {}
    for t in turn_texts:
        seen.setdefault(t[:TRUNCATE_CHARS])
    return " ".join(seen)


def get_min_ngrams(min_ngrams: int, n_query_tokens: int) -> int:
    """Adaptive overlap threshold — SimDocsSearch.scala:339-347."""
    n = n_query_tokens
    if n <= 2:
        return max(1, min(n, min_ngrams))
    if n <= 5:
        return max(2, min(n, min_ngrams))
    if n <= 19:
        return max(3, min(n, min_ngrams))
    return max(4, min(n, min_ngrams))


def get_day_range(cur_day: int, lower: int, upper: int) -> tuple[int, int] | None:
    """Bucket subrange — SimDocsSearch.scala:263-282."""
    if cur_day > lower or cur_day < 0:
        return None
    for lo, hi in DAY_BUCKETS:
        if lo <= cur_day <= hi:
            return min(hi, lower), max(lo, upper)
    return None


def days_ago_str(today: date, days: int) -> str:
    """yyyyMMdd of `days` days ago — getDaysAgoCalendar semantics
    (SimDocsSearch.scala:353-362): 0 → today; N>0 → today - (N-1) days."""
    d = today if days == 0 else today - timedelta(days=days - 1)
    return d.strftime("%Y%m%d")


@dataclass
class OracleDoc:
    doc_id: int
    conv_id: str
    turn_texts: list[str]
    db: str | None = None
    instance: str | None = None
    update_date: str = ""  # yyyyMMdd

    @property
    def text(self) -> str:
        return assemble_doc_text(self.turn_texts)


@dataclass
class OracleIndex:
    docs: list[OracleDoc]
    postings: dict[str, list[int]] = field(default_factory=dict)
    dl: dict[int, int] = field(default_factory=dict)
    dlq: dict[int, int] = field(default_factory=dict)
    rerank_tokens: dict[int, frozenset[str]] = field(default_factory=dict)
    by_id: dict[int, OracleDoc] = field(default_factory=dict)
    n_docs: int = 0
    avgdl: float = 0.0
    db_df: dict[str, int] = field(default_factory=dict)
    instance_df: dict[str, int] = field(default_factory=dict)

    @classmethod
    def build(cls, docs: list[OracleDoc]) -> "OracleIndex":
        idx = cls(docs=docs)
        total = 0
        for d in docs:
            toks = analyze(d.text)
            idx.dl[d.doc_id] = len(toks)
            idx.dlq[d.doc_id] = bm25.quantize_dl(len(toks))
            total += len(toks)
            for t in toks:
                insort(idx.postings.setdefault(t, []), d.doc_id)
            idx.rerank_tokens[d.doc_id] = frozenset(
                analyze(rerank_source_text(d.turn_texts), pre_uniform=True, max_tokens=100)
            )
            idx.by_id[d.doc_id] = d
            if d.db:
                idx.db_df[d.db] = idx.db_df.get(d.db, 0) + 1
            if d.instance:
                idx.instance_df[d.instance] = idx.instance_df.get(d.instance, 0) + 1
        idx.n_docs = len(docs)
        idx.avgdl = total / max(1, len(docs))
        return idx

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))


@dataclass
class Hit:
    doc_id: int
    conv_id: str
    score: float  # float32 value
    n_common: int
    update_date: str


class OracleSearch:
    """Reference query engine over an OracleIndex."""

    def __init__(
        self,
        index: OracleIndex,
        today: date,
        end_days_ago: int = 7,
        synonyms: SynonymDict | None = None,
    ):
        self.idx = index
        self.today = today
        self.end_days_ago = end_days_ago  # reference: days since iahx lastModified + excludeDays
        self.synonyms = synonyms

    # ---------------------------------------------------------------- scoring

    def _bm25_candidates(
        self,
        weights: dict[str, int],
        sources: set[str] | None,
        instances: set[str] | None,
        from_str: str,
        to_str: str,
        pool: int,
    ) -> list[tuple[int, np.float32]]:
        idx = self.idx
        matched: dict[int, list[np.float32]] = {}
        for t in sorted(weights):
            plist = idx.postings.get(t)
            if not plist:
                continue
            w_idf = np.float32(np.float32(weights[t]) * bm25.idf(idx.df(t), idx.n_docs))
            for doc_id in plist:
                d = idx.by_id[doc_id]
                if not (from_str <= d.update_date <= to_str):
                    continue
                if sources is not None and d.db not in sources:
                    continue
                if instances is not None and d.instance not in instances:
                    continue
                matched.setdefault(doc_id, []).append(w_idf)
        out: list[tuple[int, np.float32]] = []
        for doc_id, widfs in matched.items():
            d = idx.by_id[doc_id]
            const = float(bm25.DATE_RANGE_CONST)
            if sources is not None:
                const += float(bm25.keyword_clause_score(idx.db_df[d.db], idx.n_docs))
            if instances is not None:
                const += float(
                    bm25.keyword_clause_score(idx.instance_df[d.instance], idx.n_docs)
                )
            tf_n = bm25.tfnorm(idx.dlq[doc_id], idx.avgdl)
            out.append((doc_id, bm25.doc_score(widfs, tf_n, const=const)))
        out.sort(key=lambda p: (-float(p[1]), p[0]))  # score desc, docID asc
        return out[:pool]

    # ------------------------------------------------------------- one bucket

    def _get_doc_meta(
        self,
        weights: dict[str, int],
        q_rerank: frozenset[str],
        min_ngrams: int,
        max_docs: int,
        sources: set[str] | None,
        instances: set[str] | None,
        from_str: str,
        to_str: str,
    ) -> list[Hit]:
        min2 = get_min_ngrams(min_ngrams, len(q_rerank))
        cands = self._bm25_candidates(
            weights, sources, instances, from_str, to_str, CANDIDATE_FACTOR * max_docs
        )
        enriched: list[Hit] = []
        for doc_id, score in cands:
            d = self.idx.by_id[doc_id]
            n_common = len(q_rerank & self.idx.rerank_tokens[doc_id])
            if n_common >= min2:
                enriched.append(Hit(doc_id, d.conv_id, float(score), n_common, d.update_date))
        # stable sort on (n_common desc, update_date desc); ties keep candidate
        # (score desc, docID asc) order — pinned (reference sortWith is
        # technically unstable on equal elements; SimDocsSearch.scala:309-331)
        enriched.sort(key=lambda h: h.update_date, reverse=True)
        enriched.sort(key=lambda h: -h.n_common)
        return enriched[:max_docs]

    # ------------------------------------------------------------ entry point

    def search(
        self,
        text: str,
        max_docs: int = DEFAULT_MAX_DOCS,
        min_ngrams: int = DEFAULT_MIN_NGRAMS,
        sources: set[str] | None = None,
        instances: set[str] | None = None,
        last_days: int | None = None,
        split_time: bool = False,
    ) -> list[Hit]:
        words = uniform_text(text)
        if not words:
            return []
        text2 = " ".join(words)
        weights = expanded_query_terms(text2, self.synonyms)
        q_rerank = frozenset(query_rerank_tokens(text2))
        lower = last_days if last_days else MAX_LOWER_LIMIT
        assert lower >= self.end_days_ago
        upper = self.end_days_ago

        if not split_time:
            return self._get_doc_meta(
                weights, q_rerank, min_ngrams, max_docs, sources, instances,
                days_ago_str(self.today, lower), days_ago_str(self.today, upper),
            )

        # bucket-ladder recursion (iterative form) — SimDocsSearch.scala:185-211
        hits: list[Hit] = []
        cur_day = self.end_days_ago
        remaining = max_docs
        while remaining > 0:
            rng = get_day_range(cur_day, lower, upper)
            if rng is None:
                break
            begin, end = rng
            got = self._get_doc_meta(
                weights, q_rerank, min_ngrams, remaining, sources, instances,
                days_ago_str(self.today, begin), days_ago_str(self.today, end),
            )
            hits.extend(got)
            remaining -= len(got)
            cur_day = begin + 1
        return hits
