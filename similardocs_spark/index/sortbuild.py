"""Sort-based posting construction — the scalable build strategy.

The hash-aggregation path (groupBy(seg, term) + collect_list) materializes
every posting as JVM objects inside the aggregation hash map; at 32 local
threads the allocation/GC pressure makes it ANTI-scale. This module replaces
it with the classic sort-based index build (what Lucene's segment flush and
every serious indexer does):

    explode(tokens) → repartitionByRange(seg, term)      [one shuffle]
      → sortWithinPartitions(seg, term, doc_id)          [spillable sort]
      → mapInPandas stream-encoder                       [Arrow, zero JVM agg]

The encoder walks each partition's sorted run once, slicing contiguous
(seg, term) groups into numpy arrays and emitting one encoded posting row per
group, carrying partial groups across Arrow batch boundaries. Range
partitioning guarantees a (seg, term) group never spans partitions; the sort
spills to disk instead of growing a hash map, so executor memory stays flat
regardless of posting-list length.
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import codec

POSTINGS_SCHEMA = (
    "seg long, term string, df_seg long, blob binary, "
    "block_last array<long>, block_min_dlq array<long>"
)


def _encode_groups(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stream-encode sorted (seg, term, doc_id, dlq) rows into posting rows."""
    carry_key: tuple[int, str] | None = None
    carry_ids: list[np.ndarray] = []
    carry_dlq: list[np.ndarray] = []
    out: list[tuple] = []

    def flush(seg: int, term: str) -> None:
        ids = np.concatenate(carry_ids) if len(carry_ids) > 1 else carry_ids[0]
        dlq = np.concatenate(carry_dlq) if len(carry_dlq) > 1 else carry_dlq[0]
        blob = codec.encode_docids(ids)
        bl, bm = codec.block_metadata(ids, dlq)
        out.append((seg, term, len(ids), blob, bl, bm))

    for pdf in batches:
        if not len(pdf):
            continue
        seg = pdf["seg"].to_numpy(dtype=np.int64)
        dlq = pdf["dlq"].to_numpy(dtype=np.int64)
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        term = pdf["term"].to_numpy(dtype=object)
        # boundaries of contiguous (seg, term) runs
        change = np.empty(len(pdf), dtype=bool)
        change[0] = True
        change[1:] = (seg[1:] != seg[:-1]) | (term[1:] != term[:-1])
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(pdf))
        for s, e in zip(starts, ends):
            key = (int(seg[s]), term[s])
            if carry_key is not None and key != carry_key:
                flush(*carry_key)
                carry_ids, carry_dlq = [], []
            carry_key = key
            carry_ids.append(ids[s:e])
            carry_dlq.append(dlq[s:e])
        if out:
            yield pd.DataFrame(
                out, columns=["seg", "term", "df_seg", "blob", "block_last", "block_min_dlq"]
            )
            out = []
    if carry_key is not None:
        flush(*carry_key)
    if out:
        yield pd.DataFrame(
            out, columns=["seg", "term", "df_seg", "blob", "block_last", "block_min_dlq"]
        )


def build_postings_sorted(docs: DataFrame, partitions: int | None = None) -> DataFrame:
    """docs(seg, doc_id, dlq, tokens) → encoded postings DataFrame."""
    spark = docs.sparkSession
    n_part = partitions or spark.sparkContext.defaultParallelism
    exploded = docs.select("seg", "doc_id", "dlq", F.explode("tokens").alias("term"))
    sorted_run = exploded.repartitionByRange(n_part, "seg", "term").sortWithinPartitions(
        "seg", "term", "doc_id"
    )
    return sorted_run.mapInPandas(_encode_groups, schema=POSTINGS_SCHEMA)
