"""Continuous dedup ingestion: a landing-directory stream of candidate
documents drained through `operators/dedup_incremental.accept_batch`.

Pattern-matches incremental_stream.py (the reference's scheduled-batch
semantics — SURVEY.md §2.9): file-source stream, `Trigger.AvailableNow`,
one adjudication per micro-batch. State is two append-only parquet
tables the caller owns:

  corpus_dir — accepted documents (what a training pipeline reads);
  state_dir  — their MinHash signatures (what new batches are checked
               against; the corpus texts are never re-shingled).

Exactly-once story: the stream checkpoint makes batch REDELIVERY
at-least-once, and the batch handler makes re-processing idempotent by
anti-joining arriving doc_ids against the signature state — a doc whose
signature was appended before a crash is "already adjudicated" and is
skipped on replay (same existence-gate idea as index/incremental.py's
MERGE); a previously REJECTED doc has no state row, so a replay
re-adjudicates it against the identical state and re-rejects it
deterministically — either way replays append nothing. Appends are
materialized (localCheckpoint) BEFORE either write starts, so neither
write scans the directory it appends to.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import N_BANDS, N_HASHES
from ..operators.dedup_incremental import accept_batch

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def _sig_schema(n_hashes: int) -> T.StructType:
    return T.StructType(
        [T.StructField("doc_id", T.LongType())]
        + [T.StructField(f"mh{i}", T.StringType()) for i in range(n_hashes)]
    )


def _read_state(
    spark: SparkSession, state_dir: str, n_hashes: int
) -> DataFrame:
    if os.path.isdir(state_dir) and any(
        f.endswith(".parquet") for f in os.listdir(state_dir)
    ):
        return spark.read.parquet(state_dir)
    return spark.createDataFrame([], _sig_schema(n_hashes))


def run_dedup_ingest(
    spark: SparkSession,
    landing_dir: str,
    corpus_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    min_jaccard: float | None = None,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> list[dict]:
    """Drain the landing directory; per batch: adjudicate against the
    signature state, append accepted docs + their signatures. Returns
    per-batch counters (arrived / replayed / accepted / rejected)."""
    results: list[dict] = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state = _read_state(spark, state_dir, n_hashes)
        fresh = batch_df.join(state.select("doc_id"), "doc_id", "left_anti")
        accepted, _pairs, _state_rows = accept_batch(
            fresh,
            state,
            min_jaccard=min_jaccard,
            n_hashes=n_hashes,
            n_bands=n_bands,
        )
        # ONE compute of the adjudication (before any append touches the
        # directories the plan reads); the state rows are then re-derived
        # from the checkpointed accepted docs — batch-only lineage, no
        # second pass over the corpus band rows (accepted texts are
        # distinct by construction, so signatures_for is row-for-row the
        # survivor subset of accept_batch's state output)
        accepted = accepted.localCheckpoint(eager=True)
        from ..operators.dedup_incremental import signatures_for

        new_state = signatures_for(accepted, n_hashes=n_hashes)
        n_arrived = batch_df.count()
        n_fresh = fresh.count()
        n_accepted = accepted.count()
        accepted.write.mode("append").parquet(corpus_dir)
        new_state.write.mode("append").parquet(state_dir)
        results.append(
            {
                "batch_id": batch_id,
                "n_arrived": n_arrived,
                "n_replayed": n_arrived - n_fresh,
                "n_accepted": n_accepted,
                "n_rejected": n_fresh - n_accepted,
            }
        )

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .parquet(landing_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    return results
