"""BM25 top-k query engine over the segmented index.

Two scoring paths with identical results:
- `score_bucket(..., use_wand=False)` — declarative DataFrame plan: broadcast
  the (tiny) query-term table against the postings scan (term pruned via
  parquet min/max row-group stats thanks to the term-sorted layout), decode
  blobs with a vectorized UDF, aggregate per docID, join doc stats for
  filters + tfnorm, distributed top-(150·k) via orderBy+limit
  (TakeOrderedAndProject — no global sort).
- `use_wand=True` — per-segment DAAT traversal with block-max WAND pruning and
  bounded per-partition heaps merged via treeReduce (query/wand.py). This is
  the 100-TB path: per-executor work is one segment's postings for the query
  terms only, score accumulation never leaves the executor, and only
  ≤ heap_size rows per segment cross the wire.

Query lifecycle (reference SimDocsSearch.scala:122-347): text → word prep →
term weights (duplicate-prefix boosts) → per-day-bucket retrieval (optional
ladder recursion with shrinking k) → MUST-clause score constants → candidate
pool 150·k by (score desc, docID asc) → overlap rerank vs adaptive threshold →
(n_common desc, update_date desc) → take k.
"""
from __future__ import annotations

from dataclasses import dataclass
from datetime import date

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import bm25
from ..index.build import IndexPaths
from ..index import codec
from ..oracle.refsearch import (
    CANDIDATE_FACTOR,
    DEFAULT_MAX_DOCS,
    DEFAULT_MIN_NGRAMS,
    MAX_LOWER_LIMIT,
    days_ago_str,
    get_day_range,
    get_min_ngrams,
)
from ..synonyms import SynonymDict, expanded_query_terms
from ..textnorm import query_rerank_tokens, uniform_text

# Auto path selection: below this many estimated postings the decode-join
# plan costs the same as the kernel; above it, WAND's skip-before-decode wins
# and the decode-join plan's posting explosion becomes the scale-killer.
WAND_AUTO_MIN_POSTINGS = 8192


@pandas_udf(T.ArrayType(T.LongType()))
def _decode_udf(blobs: pd.Series) -> pd.Series:
    # per-BLOB loop (variable-length codec; one iteration per posting list,
    # not per doc) returning int64 ndarrays directly — Arrow consumes them
    # without the per-element tolist() boxing round-trip
    return pd.Series(
        [codec.decode_docids(bytes(b)) for b in blobs], index=blobs.index
    )


@dataclass
class SearchEngine:
    """Loaded index handle + pinned clock (the reference derives its date
    anchor from the Solr server's lastModified at startup; we pin it —
    SimDocsSearch.scala:52-58)."""

    spark: SparkSession
    paths: IndexPaths
    today: date
    end_days_ago: int = 7
    synonyms: SynonymDict | None = None
    cache: bool = False  # persist doc stats in executor memory (serving mode)
    preload_terms_max: int = 2_000_000  # term dict ≤ this many rows → preload
    # byte-aware guard: estimated on-disk size of the terms table above which
    # the driver-side preload is skipped regardless of row count (driver heap
    # protection — parquet bytes are a conservative proxy for dict memory)
    preload_terms_max_bytes: int = 256 * 1024 * 1024

    def __post_init__(self) -> None:
        # all index reads go through the substrate the index was COMMITTED
        # with (recorded in its lineage journal) — on an Iceberg deployment
        # the index lives as catalog tables, not raw parquet paths
        from ..index.catalog import get_io_for_index

        io = get_io_for_index(self.spark, self.paths)
        self._io = io
        row = io.read(self.spark, self.paths.stats).collect()[0]
        self.n_docs: int = row["n_docs"]
        self.avgdl: float = row["avgdl"]
        self.seg_size: int = row["seg_size"]
        self.meta_df: dict[tuple[str, str], int] = {
            (r["field"], r["value"]): r["df"]
            for r in io.read(self.spark, self.paths.meta_stats).collect()
        }
        # tfnorm derived at query time from LIVE avgdl (survives incremental
        # updates; Lucene likewise computes avgdl from index stats per search)
        self._docs = io.read(self.spark, self.paths.docs).withColumn(
            "seg", F.col("seg").cast("long")
        ).withColumn(
            "tfnorm",
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.lit(bm25.K1)
                    * (
                        F.lit(1.0 - bm25.B)
                        + F.lit(bm25.B) * F.col("dlq") / F.lit(self.avgdl)
                    )
                )
            ).cast("float"),
        )
        self._postings = io.read(self.spark, self.paths.postings).withColumn(
            "seg", F.col("seg").cast("long")
        )
        self._terms = io.read(self.spark, self.paths.terms)
        self._term_df: dict[str, int] | None = None
        if (
            self._terms_bytes_estimate() <= self.preload_terms_max_bytes
            and self._terms.count() <= self.preload_terms_max
        ):
            # small term dictionary → one collect at init kills a Spark job
            # per query (prefix-6 tokens bound the dictionary hard: ≤ ~37^6).
            # Beyond either guard the engine runs WITHOUT the preload: prepare()
            # falls back to a per-query isin() lookup against the terms table
            # and _wand_auto defaults to WAND (see those methods).
            self._term_df = {
                r["term"]: r["df"] for r in self._terms.collect()
            }
        if self.cache:
            # serving mode: cache docs PRE-PARTITIONED on doc_id so candidate
            # joins (batch rerank enrichment) reuse the cached partitioning —
            # only the bounded candidate side shuffles; the docs side never
            # moves and, unlike a broadcast build, no per-executor hash
            # relation of the full candidate set is built (measured: the
            # broadcast variant cost ~4.5 s per executor JVM at 8 executors)
            n_part = int(
                self.spark.conf.get("spark.sql.shuffle.partitions", "64")
            )
            self._docs = self._docs.repartition(n_part, "doc_id").persist()
            self._postings = self._postings.persist()

    def _terms_bytes_estimate(self) -> int:
        """On-disk byte size of the terms table (cheap driver-side walk for
        the parquet substrate; 0 = unknown → the row-count guard decides).
        Collecting a dict whose parquet footprint is hundreds of MB would
        multiply into driver-heap GBs — the byte guard catches that before
        the count() ever materializes the rows."""
        import os

        path = self.paths.terms
        if not os.path.isdir(path):
            return 0
        total = 0
        for dirpath, _, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    pass
        return total

    # ------------------------------------------------------------ query prep

    def prepare(self, text: str) -> tuple[dict[str, float], list[str]] | None:
        """→ (term → float32 weight·idf, query rerank tokens) or None if the
        normalized query is empty."""
        words = uniform_text(text)
        if not words:
            return None
        text2 = " ".join(words)
        weights = expanded_query_terms(text2, self.synonyms)
        if self._term_df is not None:
            dfs = {t: self._term_df[t] for t in weights if t in self._term_df}
        else:
            dfs = {
                r["term"]: r["df"]
                for r in self._terms.filter(F.col("term").isin(list(weights))).collect()
            }
        w_idf = {
            t: float(np.float32(np.float32(w) * bm25.idf(dfs[t], self.n_docs)))
            for t, w in weights.items()
            if t in dfs
        }
        return w_idf, query_rerank_tokens(text2)

    def _wand_auto(self, w_idf: dict[str, float]) -> bool:
        """True when the query's estimated postings volume (Σ df over terms)
        is big enough that skip-before-decode beats decode-and-explode.
        Unknown sizes (no preloaded term dict) default to WAND — wrong-by-slow
        is acceptable for tiny queries; wrong-by-explosion at scale is not."""
        if self._term_df is None:
            return True
        est = sum(self._term_df.get(t, 0) for t in w_idf)
        return est >= WAND_AUTO_MIN_POSTINGS

    def _const_for(self, sources: set[str] | None, instances: set[str] | None):
        """MUST-clause constant score pieces: date range always +1.0; keyword
        filters add a per-value constant → returned as a Column expression."""
        const = F.lit(float(bm25.DATE_RANGE_CONST)).cast("double")
        for fld, values, col in (
            ("db", sources, "db"),
            ("instance", instances, "instance"),
        ):
            if values is not None:
                mapping = F.lit(0.0)
                for v in sorted(values):
                    df = self.meta_df.get((fld, v), 0)
                    c = float(bm25.keyword_clause_score(df, self.n_docs)) if df else 0.0
                    mapping = F.when(F.col(col) == v, F.lit(c)).otherwise(mapping)
                const = const + mapping.cast("double")
        return const

    # -------------------------------------------------------- bucket scoring

    def score_bucket(
        self,
        w_idf: dict[str, float],
        from_str: str,
        to_str: str,
        pool: int,
        sources: set[str] | None,
        instances: set[str] | None,
        use_wand: bool | None = None,
    ) -> DataFrame:
        """Top-`pool` candidates (doc_id, score f32) within a date bucket.

        `use_wand=None` (default) auto-selects: WAND whenever the estimated
        postings volume for the query terms exceeds WAND_AUTO_MIN_POSTINGS
        (or whenever it is unknown) — the 100-TB-safe default; the
        decode-join plan is kept only for provably tiny postings sets."""
        if use_wand is None:
            use_wand = self._wand_auto(w_idf)
        if use_wand:
            from .wand import wand_score_bucket

            return wand_score_bucket(
                self, w_idf, from_str, to_str, pool, sources, instances
            )

        spark = self.spark
        from ..util import local_df

        qterms = F.broadcast(
            local_df(
                spark,
                [(t, w) for t, w in sorted(w_idf.items())], "term string, w_idf double",
            )
        )
        # explicit isin BEFORE the join: the In(term, ...) predicate reaches the
        # parquet scan (row-group min/max pruning on the term-sorted files);
        # a bare join would scan every postings row
        matched = (
            self._postings.filter(F.col("term").isin(sorted(w_idf)))
            .join(qterms, "term")
            .select("w_idf", F.explode(_decode_udf(F.col("blob"))).alias("doc_id"))
        )
        docs = self._docs.filter(F.col("update_date").between(from_str, to_str))
        if sources is not None:
            docs = docs.filter(F.col("db").isin(sorted(sources)))
        if instances is not None:
            docs = docs.filter(F.col("instance").isin(sorted(instances)))
        # per-term float32 product, float64 sum, + consts, final float32 (spec)
        scored = (
            matched.join(docs.select("doc_id", "tfnorm", "db", "instance"), "doc_id")
            .withColumn(
                "term_score",
                (F.col("w_idf").cast("float") * F.col("tfnorm")).cast("float"),
            )
            .groupBy("doc_id", "db", "instance")
            .agg(F.sum(F.col("term_score").cast("double")).alias("sum_scores"))
            .withColumn(
                "score", (F.col("sum_scores") + self._const_for(sources, instances)).cast("float")
            )
            .select("doc_id", "score")
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(pool)

    # ------------------------------------------------------------ one bucket

    def _bucket_hits(
        self,
        w_idf: dict[str, float],
        q_rerank: list[str],
        min_ngrams: int,
        max_docs: int,
        sources: set[str] | None,
        instances: set[str] | None,
        from_str: str,
        to_str: str,
        use_wand: bool | None,
        explain: bool = False,
    ) -> DataFrame:
        min2 = get_min_ngrams(min_ngrams, len(q_rerank))
        pool = CANDIDATE_FACTOR * max_docs
        cands = self.score_bucket(
            w_idf, from_str, to_str, pool, sources, instances, use_wand
        )
        enriched = (
            F.broadcast(cands)
            .join(
                self._docs.select("doc_id", "conv_id", "update_date", "rerank_tokens"),
                "doc_id",
            )
            .withColumn(
                "n_common",
                F.size(
                    F.array_intersect(
                        F.col("rerank_tokens"),
                        F.array(*[F.lit(t) for t in q_rerank]),
                    )
                ),
            )
            .filter(F.col("n_common") >= min2)
        )
        cols = ["doc_id", "conv_id", "score", "n_common", "update_date"]
        if explain:
            cols.append("rerank_tokens")
        return (
            enriched.orderBy(
                F.desc("n_common"), F.desc("update_date"), F.desc("score"), F.asc("doc_id")
            )
            .limit(max_docs)
            .select(*cols)
        )

    # ------------------------------------------------------------ entrypoint

    def search_batch(self, queries: dict[str, str], **kwargs) -> dict[str, list]:
        """N queries in one DataFrame plan — see query/batch.py."""
        from .batch import search_batch

        return search_batch(self, queries, **kwargs)

    def search_batch_mixed(
        self, queries: dict[str, str], per_query: dict[str, dict], **shared
    ) -> dict[str, list]:
        """Batch with per-query filter overrides (grouped into one plan per
        distinct filter set) — see query/batch.py."""
        from .batch import search_batch_mixed

        return search_batch_mixed(self, queries, per_query, **shared)

    def search(
        self,
        text: str,
        max_docs: int = DEFAULT_MAX_DOCS,
        min_ngrams: int = DEFAULT_MIN_NGRAMS,
        sources: set[str] | None = None,
        instances: set[str] | None = None,
        last_days: int | None = None,
        split_time: bool = False,
        use_wand: bool | None = None,
        explain: bool = False,
        parse_syntax: bool = False,
    ) -> list:
        """Full reference search; returns collected rows (driver-side result,
        like the reference servlet). Each row: doc_id, conv_id, score,
        n_common, update_date; with explain=True each result also carries
        `.ngrams` = (original, similar, common) token lists (the reference's
        `explain` servlet parameter — SimDocsSearch.scala:98-106).

        parse_syntax=True first runs query/parse.sanitize_query (the Lucene
        QueryParser edge: paren strip, boolean-marker drop, field:value →
        db/instance filters — SimDocsSearch.scala:395-403); explicit
        sources/instances arguments take precedence over parsed ones."""
        if parse_syntax:
            from .parse import sanitize_query

            text, p_sources, p_instances = sanitize_query(text)
            sources = sources if sources is not None else p_sources
            instances = instances if instances is not None else p_instances
        prep = self.prepare(text)
        if prep is None:
            return []
        w_idf, q_rerank = prep
        if not w_idf:
            return []
        lower = last_days if last_days else MAX_LOWER_LIMIT
        assert lower >= self.end_days_ago
        upper = self.end_days_ago

        if not split_time:
            rows = self._bucket_hits(
                w_idf, q_rerank, min_ngrams, max_docs, sources, instances,
                days_ago_str(self.today, lower), days_ago_str(self.today, upper),
                use_wand, explain,
            ).collect()
            return _maybe_explain(rows, q_rerank, explain)

        hits: list = []
        cur_day = self.end_days_ago
        remaining = max_docs
        while remaining > 0:
            rng = get_day_range(cur_day, lower, upper)
            if rng is None:
                break
            begin, end = rng
            got = self._bucket_hits(
                w_idf, q_rerank, min_ngrams, remaining, sources, instances,
                days_ago_str(self.today, begin), days_ago_str(self.today, end),
                use_wand, explain,
            ).collect()
            hits.extend(_maybe_explain(got, q_rerank, explain))
            remaining -= len(got)
            cur_day = begin + 1
        return hits


class ExplainedHit:
    """Hit + (original, similar, common) ngram triple (explain mode)."""

    __slots__ = ("doc_id", "conv_id", "score", "n_common", "update_date", "ngrams")

    def __init__(self, row, q_rerank: list[str]):
        self.doc_id = row["doc_id"]
        self.conv_id = row["conv_id"]
        self.score = row["score"]
        self.n_common = row["n_common"]
        self.update_date = row["update_date"]
        similar = list(row["rerank_tokens"])
        sim_set = set(similar)
        common = [t for t in q_rerank if t in sim_set]
        self.ngrams = (list(q_rerank), similar, common)


def _maybe_explain(rows: list, q_rerank: list[str], explain: bool) -> list:
    if not explain:
        return rows
    return [ExplainedHit(r, q_rerank) for r in rows]
