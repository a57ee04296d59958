"""Block-max WAND scoring kernel — the 100-TB query path.

Executes per SEGMENT (doc-range shard; all of a query's terms for that doc
range are co-located by the index layout), via `cogroup(...).applyInPandas`:
postings rows (term, blob, block_last, block_max) cogrouped with the segment's
filtered doc stats (doc_id, tfnorm, const). Only ≤ pool rows per segment leave
the executor; the global top-k is merged with an RDD `treeReduce` of bounded
heaps (north_rule), never a global sort.

Design note — why window-granular DAAT: classic per-document WAND pivoting is
pointer-chasing, which is pessimal in a vectorized (Arrow/numpy) runtime: the
Python-level per-doc loop costs far more than it saves. The property that
makes block-max WAND scale — SKIPPING whole index blocks whose best possible
score cannot beat the current k-th score — is preserved by evaluating
document-at-a-time at the granularity of fixed docID windows:

  1. per term, codec blocks carry (last docID, max tfnorm) metadata
  2. map each block to the docID windows it overlaps → per-window upper bound
     UB(w) = Σ_t w_idf_t · max_blockmax_t(w) + max const(w)
  3. visit windows in UB-descending order (MaxScore-style ordering — result-
     identical to ascending-docID WAND since scoring is exact per window),
     maintaining a bounded top-k heap with threshold θ
  4. stop at the first window with UB ≤ θ once the heap is full — every
     remaining window is provably incapable of producing a top-k doc; its
     blocks are never DECODED (the skip saves decode + scoring work)
  5. inside a surviving window: decode only overlapping blocks, scatter-add
     float32 per-term contributions into a float64 accumulator (exactly the
     pinned scoring spec in bm25.py)
"""
from __future__ import annotations

import heapq
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index import codec

WINDOW = 8192  # docIDs per scoring window


def _block_offsets(blob: bytes, n: int) -> list[tuple[int, int]]:
    """(byte offset, gap count) of each codec block — header scan only."""
    out = []
    pos = 4
    left = n
    while left > 0:
        k = min(codec.BLOCK, left)
        out.append((pos, k))
        pos += 1 + blob[pos] * k
        left -= k
    return out


def _decode_block(blob: bytes, offset: int, k: int, prev_last: int) -> np.ndarray:
    width = blob[offset]
    gaps = np.frombuffer(blob, dtype=codec._DTYPES[width], count=k, offset=offset + 1)
    return np.cumsum(gaps.astype(np.int64)) + prev_last


def wand_kernel(
    key,
    postings: pd.DataFrame,
    docs: pd.DataFrame,
    w_idf: dict[str, float],
    seg_size: int,
    pool: int,
    avgdl: float,
) -> pd.DataFrame:
    if len(docs) == 0 or len(postings) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float32")})
    seg = int(key[0])
    base = seg * seg_size

    # dense per-segment doc arrays (docIDs are dense by construction)
    local = docs["doc_id"].to_numpy() - base
    n_local = int(local.max()) + 1
    tfnorm = np.full(n_local, np.nan, dtype=np.float32)
    tfnorm[local] = docs["tfnorm"].to_numpy(dtype=np.float32)
    const = np.zeros(n_local, dtype=np.float64)
    const[local] = docs["const"].to_numpy(dtype=np.float64)
    allowed = np.zeros(n_local, dtype=bool)
    allowed[local] = True

    n_windows = (n_local + WINDOW - 1) // WINDOW
    ub = np.zeros(n_windows, dtype=np.float64)
    # max admissible const per window (disallowed docs contribute nothing)
    const_w = np.full(n_windows, -np.inf)
    np.maximum.at(const_w, local // WINDOW, const[local])

    # term → (blob, per-block [offset, count, first_win, last_win, maxtf])
    terms = []
    for row in postings.itertuples(index=False):
        w = w_idf.get(row.term)
        if w is None:
            continue
        blob = bytes(row.blob)
        n = int(np.frombuffer(blob, dtype=np.uint32, count=1)[0])
        offs = _block_offsets(blob, n)
        lasts = np.asarray(row.block_last, dtype=np.int64) - base
        # block upper bound: tfnorm is monotone-decreasing in dlq
        from .. import bm25 as _bm25

        maxes = _bm25.tfnorm_np(np.asarray(row.block_min_dlq, dtype=np.int64), avgdl)
        firsts = np.empty_like(lasts)
        firsts[0] = 0  # conservative: block may start anywhere after prev block
        firsts[1:] = lasts[:-1] + 1
        blocks = []
        for i, (off, k) in enumerate(offs):
            w0 = int(firsts[i]) // WINDOW
            w1 = int(lasts[i]) // WINDOW
            blocks.append((off, k, w0, w1, float(maxes[i])))
            contrib = np.float32(w) * maxes[i]
            ub[w0 : w1 + 1] += float(contrib)
        terms.append((np.float32(w), blob, blocks, lasts))
    if not terms:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float32")})

    ub = ub + np.where(np.isfinite(const_w), const_w, -np.inf)

    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-pool

    def theta() -> float:
        return heap[0][0] if len(heap) >= pool else -np.inf

    order = np.argsort(-ub, kind="stable")
    acc = np.zeros(WINDOW, dtype=np.float64)
    matched = np.zeros(WINDOW, dtype=bool)
    for win in order:
        if ub[win] == -np.inf:
            break
        if len(heap) >= pool and ub[win] < theta():
            break  # block-max skip: nothing below can enter the top-k
            # (strict <: a doc scoring exactly theta with a smaller docID
            # would still outrank on the (score desc, docID asc) tiebreak)
        lo, hi = win * WINDOW, min((win + 1) * WINDOW, n_local)
        acc[:] = 0.0
        matched[:] = False
        for w, blob, blocks, lasts in terms:
            prev_last = -1 - base
            for i, (off, k, w0, w1, _mx) in enumerate(blocks):
                if w0 <= win <= w1:
                    ids = _decode_block(blob, off, k, prev_last if i == 0 else int(lasts[i - 1]))
                    ids = ids[(ids >= lo) & (ids < hi)]
                    if len(ids):
                        rel = ids - lo
                        contrib = (w * tfnorm[ids]).astype(np.float32)
                        acc[rel] += contrib.astype(np.float64)
                        matched[rel] = True
        rel_ids = np.nonzero(matched[: hi - lo] & allowed[lo:hi])[0]
        if len(rel_ids) == 0:
            continue
        scores = (acc[rel_ids] + const[lo + rel_ids]).astype(np.float32)
        for s, d in zip(scores.tolist(), (lo + rel_ids + base).tolist()):
            item = (s, -d)
            if len(heap) < pool:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)

    out = sorted(heap, key=lambda t: (-t[0], -t[1]))
    return pd.DataFrame(
        {"doc_id": np.array([-d for _, d in out], dtype=np.int64),
         "score": np.array([s for s, _ in out], dtype=np.float32)}
    )


def topk_treereduce(df: DataFrame, k: int) -> list:
    """Global top-k via per-partition bounded heaps merged with treeReduce
    (north_rule); rows ordered (score desc, doc_id asc)."""

    def part_heap(rows: Iterable) -> list[tuple[float, int]]:
        heap: list[tuple[float, int]] = []
        for r in rows:
            item = (float(r["score"]), -int(r["doc_id"]))
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
        return heap

    def merge(a: list[tuple[float, int]], b: list[tuple[float, int]]) -> list:
        for item in b:
            if len(a) < k:
                heapq.heappush(a, item)
            elif item > a[0]:
                heapq.heapreplace(a, item)
        return a

    rdd = df.rdd.mapPartitions(lambda it: [part_heap(it)])
    if rdd.isEmpty():
        return []
    merged = rdd.treeReduce(merge)
    return sorted(((s, -d) for s, d in merged), key=lambda t: (-t[0], t[1]))


def batch_score_kernel(
    key,
    postings: pd.DataFrame,
    docs: pd.DataFrame,
    by_slice: dict[int, dict[str, dict[str, float]]],
    seg_size: int,
    pools: dict[str, int],
) -> pd.DataFrame:
    """Per-(segment, query-slice) batched scoring: decode every needed
    posting list ONCE, then scatter-add each query's term contributions into
    a dense per-segment accumulator (term-at-a-time exhaustive evaluation —
    for a BATCH the shared decode dominates, so per-query block skipping
    buys less than decode sharing). Float discipline identical to the
    single-query kernel: f32 per-term product, f64 accumulate + const,
    final f32. Emits ≤ pool rows per (segment, query)."""
    empty = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="object"),
            "doc_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float32"),
        }
    )
    queries = by_slice.get(int(key[1]), {})
    if len(docs) == 0 or len(postings) == 0 or not queries:
        return empty
    seg = int(key[0])
    base = seg * seg_size

    local = docs["doc_id"].to_numpy() - base
    n_local = int(local.max()) + 1
    tfnorm = np.full(n_local, np.nan, dtype=np.float32)
    tfnorm[local] = docs["tfnorm"].to_numpy(dtype=np.float32)
    const = np.zeros(n_local, dtype=np.float64)
    const[local] = docs["const"].to_numpy(dtype=np.float64)
    allowed = np.zeros(n_local, dtype=bool)
    allowed[local] = True

    decoded: dict[str, np.ndarray] = {}
    for row in postings.itertuples(index=False):
        if row.term not in decoded:
            ids = codec.decode_docids(bytes(row.blob)) - base
            # docs outside the filtered window were never materialized in
            # the dense arrays; clip before indexing (NaN tfnorm + allowed
            # mask handles in-range disallowed docs)
            decoded[row.term] = ids[(ids >= 0) & (ids < n_local)]

    frames: list[pd.DataFrame] = []
    acc = np.zeros(n_local, dtype=np.float64)
    matched = np.zeros(n_local, dtype=bool)
    for qid, w_idf in queries.items():
        terms = [t for t in w_idf if t in decoded]
        if not terms:
            continue
        acc[:] = 0.0
        matched[:] = False
        for t in terms:
            ids = decoded[t]
            contrib = (np.float32(w_idf[t]) * tfnorm[ids]).astype(np.float32)
            acc[ids] += contrib.astype(np.float64)
            matched[ids] = True
        idxs = np.nonzero(matched & allowed)[0]
        if idxs.size == 0:
            continue
        scores = (acc[idxs] + const[idxs]).astype(np.float32)
        # exact (score desc, doc_id asc) order; n_local ≤ seg_size so a full
        # lexsort is micro-cheap and tiebreak-correct at the pool boundary
        order = np.lexsort((idxs, -scores))[: pools.get(qid, 0)]
        frames.append(
            pd.DataFrame(
                {
                    "query_id": qid,
                    "doc_id": (idxs[order] + base).astype(np.int64),
                    "score": scores[order],
                }
            )
        )
    return pd.concat(frames, ignore_index=True) if frames else empty


def wand_score_batch(
    engine,
    w_idf_by_qid: dict[str, dict[str, float]],
    pools: dict[str, int],
    from_str: str,
    to_str: str,
    sources: set[str] | None,
    instances: set[str] | None,
) -> DataFrame:
    """Per-segment top-`pool` candidates for EVERY query in one cogrouped
    pass → DataFrame(query_id, doc_id, score f32). Parallelism axis is
    (segment × query-slice): with few segments (small corpora) the queries
    are hash-sliced so the kernel still fans out across all executor slots;
    postings rows are replicated only to the slices whose queries need that
    term (bounded decode duplication, factor ≤ n_slices)."""
    import math
    import zlib

    spark = engine.spark
    n_segs = max(1, math.ceil(engine.n_docs / engine.seg_size))
    par = spark.sparkContext.defaultParallelism
    n_slices = max(1, min(8, math.ceil(par / n_segs)))

    def slice_of(qid: str) -> int:
        return zlib.crc32(qid.encode()) % n_slices

    by_slice: dict[int, dict[str, dict[str, float]]] = {}
    term_slices: set[tuple[str, int]] = set()
    for qid, w_idf in w_idf_by_qid.items():
        s = slice_of(qid)
        by_slice.setdefault(s, {})[qid] = w_idf
        term_slices.update((t, s) for t in w_idf)
    all_terms = sorted({t for t, _ in term_slices})

    from ..util import filter_terms

    postings = filter_terms(engine._postings, all_terms).select(
        "seg", "term", "blob"
    )
    docs = engine._docs.filter(F.col("update_date").between(from_str, to_str))
    if sources is not None:
        docs = docs.filter(F.col("db").isin(sorted(sources)))
    if instances is not None:
        docs = docs.filter(F.col("instance").isin(sorted(instances)))
    docs = docs.select(
        "seg",
        "doc_id",
        "tfnorm",
        engine._const_for(sources, instances).alias("const"),
    )
    if n_slices == 1:
        # no query slicing needed (enough segments for full fan-out):
        # skip the term→slice join and the docs replication entirely
        postings = postings.withColumn("slice", F.lit(0))
        docs = docs.withColumn("slice", F.lit(0))
    else:
        from ..util import local_df

        ts_df = F.broadcast(
            local_df(spark, sorted(term_slices), "term string, slice int")
        )
        postings = postings.join(ts_df, "term")
        slices_df = F.broadcast(
            local_df(spark, [(s,) for s in range(n_slices)], "slice int")
        )
        docs = docs.crossJoin(slices_df)

    seg_size = engine.seg_size

    def kernel(key, p, d):
        return batch_score_kernel(key, p, d, by_slice, seg_size, pools)

    return (
        postings.groupBy("seg", "slice")
        .cogroup(docs.groupBy("seg", "slice"))
        .applyInPandas(kernel, schema="query_id string, doc_id long, score float")
    )


def wand_score_bucket(
    engine,
    w_idf: dict[str, float],
    from_str: str,
    to_str: str,
    pool: int,
    sources: set[str] | None,
    instances: set[str] | None,
) -> DataFrame:
    """DataFrame of top-`pool` (doc_id, score f32) via the per-segment kernel +
    treeReduce heap merge."""
    spark = engine.spark
    postings = engine._postings.filter(F.col("term").isin(sorted(w_idf))).select(
        "seg", "term", "blob", "block_last", "block_min_dlq"
    )
    docs = engine._docs.filter(F.col("update_date").between(from_str, to_str))
    if sources is not None:
        docs = docs.filter(F.col("db").isin(sorted(sources)))
    if instances is not None:
        docs = docs.filter(F.col("instance").isin(sorted(instances)))
    docs = docs.select(
        "seg",
        "doc_id",
        "tfnorm",
        engine._const_for(sources, instances).alias("const"),
    )
    seg_size = engine.seg_size

    avgdl = engine.avgdl

    def kernel(key, p, d):
        return wand_kernel(key, p, d, w_idf, seg_size, pool, avgdl)

    per_seg = (
        postings.groupBy("seg")
        .cogroup(docs.groupBy("seg"))
        .applyInPandas(kernel, schema="doc_id long, score float")
    )
    from ..util import kernel_exec_conf

    with kernel_exec_conf(spark):
        top = topk_treereduce(per_seg, pool)
    from ..index.build import small_df

    return small_df(
        spark, [(int(d), float(s)) for s, d in top], "doc_id long, score float"
    )
