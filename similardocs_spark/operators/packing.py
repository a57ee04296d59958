"""Sequence packing: assign documents to fixed-length training sequences.

The last step of a training-data pipeline: the token streams of all
documents are concatenated in a deterministic order (doc_id) and cut
every `seq_len` tokens; each document needs to know its global start
offset and which sequence(s) it lands in (for packing manifests, loss
masking across document boundaries, and resumable sharding).

The core is a GLOBAL RUNNING SUM over a total order — the textbook
"window over ORDER BY with no PARTITION BY" trap: Spark executes that as
a single task holding the whole corpus. This module does the distributed
two-level prefix sum instead (the exact classic):

  1. range-repartition by doc_id (Spark's range partitioner keeps the
     total order ACROSS partitions: every row of partition i sorts before
     every row of partition i+1),
  2. per-partition running sum — a window PARTITIONED by
     spark_partition_id() and ordered by doc_id, so every partition scans
     locally in parallel,
  3. per-partition totals (one row per partition — a bounded,
     model-sized collect, same contract as a centroid fetch) become
     exclusive prefix offsets broadcast back, and the global offset is
     local_cumsum + partition_offset.

Shuffle cost: ONE range exchange of (doc_id, n_tokens) rows — the
narrowest possible row — plus a num_partitions-row driver action. At
100 TB of documents that is a few GB of longs, not the corpus.

Reference parity: the reference engine stops at retrieval and has no
training-data packing; this operator is part of the pipeline surface
this graft adds beyond the reference (COVERAGE.md), with semantics per
the standard concat-then-chunk recipe (GPT-style pretraining batches).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["pack_sequences"]


def pack_sequences(
    token_counts: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global packing offsets for (id, token_count) rows.

    Returns one row per input doc, ordered semantics (not sorted output):
      start_tok  — the doc's first token's global offset in the
                   concatenated stream (docs concatenated by ascending
                   `id_col`),
      seq_first  — index of the seq_len-sized sequence containing
                   start_tok,
      seq_last   — index of the sequence containing the doc's LAST token
                   (== seq_first unless the doc straddles a boundary;
                   zero-token docs get seq_last = seq_first),
      n_seqs     — seq_last - seq_first + 1.

    Deterministic for a given (id → tokens) mapping regardless of input
    partitioning. `num_partitions` defaults to the session's shuffle
    partitioning.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    spark = token_counts.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    src = token_counts.select(
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).cast("long").alias("_t"),
    )
    ranged = src.repartitionByRange(n_part, "doc_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    # step 2: local (per-range-partition) inclusive running sum
    w = Window.partitionBy("_pid").orderBy("doc_id")
    local = ranged.withColumn("_cum", F.sum("_t").over(w))
    # keep ONE lineage for both the totals probe and the final projection —
    # the range shuffle must not run twice with a sampled partitioner
    local = local.localCheckpoint(eager=True)
    # step 3: bounded collect of per-partition totals -> exclusive offsets
    totals = {
        r["_pid"]: r["_tot"]
        for r in local.groupBy("_pid").agg(F.max("_cum").alias("_tot")).collect()
    }
    running = 0
    offsets = {}
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid]
    from ..util import local_df

    off_df = F.broadcast(
        local_df(
            spark,
            [(pid, off) for pid, off in offsets.items()],
            "_pid int, _off long",
        )
    )
    # `div` (integer division), not `/`: float division of longs loses
    # exactness past 2^53 global tokens; offsets stay integer-exact at any
    # corpus size. All offsets are non-negative, so div == floor-div.
    return (
        local.join(off_df, "_pid")
        .withColumn("start_tok", F.col("_off") + F.col("_cum") - F.col("_t"))
        .withColumn("_end", F.col("_off") + F.col("_cum") - 1)
        .withColumn("seq_first", F.expr(f"start_tok div {int(seq_len)}"))
        .withColumn(
            "seq_last",
            F.when(
                F.col("_t") > 0, F.expr(f"_end div {int(seq_len)}")
            ).otherwise(F.col("seq_first")),
        )
        .select(
            F.col("doc_id").alias(id_col),
            "start_tok",
            "seq_first",
            "seq_last",
            (F.col("seq_last") - F.col("seq_first") + 1).alias("n_seqs"),
        )
    )
