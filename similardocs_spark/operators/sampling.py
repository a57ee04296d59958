"""Deterministic, rerun-stable sampling — the mix-execution step of a
training-data pipeline (apply the rates you derived from
`mixture_summary` and get the SAME sample on every rerun, resume, or
backfill).

`df.sample()` is none of those things: it is partitioning-dependent and
re-draws on every action. These operators decide membership from a hash
of the ROW KEY alone — `uniform32(md5(seed|key)) < rate·2³²` — so the
decision is a row-local projection + filter (zero shuffle, rides the
scan), independent of partitioning, cluster size, and execution order,
and REPEATABLE: the same key is in or out forever for a given (seed,
rate), and raising the rate only ever ADDS rows (nested samples for
scaling-law ladders: the 1% sample is a subset of the 10% sample).

md5, not xxhash64: md5 is the engine-portable hash this repo's oracle
convention is built on (DuckDB reproduces it digit-by-digit), so the
sample membership itself is oracle-checked.

Reference parity: the reference has no sampling surface; part of the
beyond-reference pipeline ops (COVERAGE.md).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sample_hash", "sample_stratified", "shuffle_order", "uniform32_col"]


def uniform32_col(key_col, seed: int = 42):
    """32-bit uniform from the first 8 hex chars of md5(seed|key)."""
    h = F.md5(F.concat(F.lit(f"{seed}|"), key_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def sample_hash(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Keep each row iff uniform32(md5(seed|key)) < rate·2³². Row-local,
    zero-shuffle, repeatable, nested across rates."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(
        uniform32_col(F.col(key_col), seed) < int(round(rate * 2**32))
    )


def sample_stratified(
    df: DataFrame,
    rates: dict[str, float],
    by: str = "source",
    default_rate: float = 0.0,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-stratum rates (e.g. straight from a mixture re-weighting):
    rows whose `by` value has no entry get `default_rate`. Still one
    row-local projection + filter — the rate lookup folds into a CASE
    expression (no join, no shuffle; a rates MAP too large for a literal
    CASE belongs in a broadcast join, at which point it is a dimension
    table, not a config)."""
    for v, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {v!r} must be in [0, 1], got {r}")
    cut = None
    for v, r in rates.items():
        branch = F.when(F.col(by) == v, int(round(r * 2**32)))
        cut = branch if cut is None else cut.when(F.col(by) == v, int(round(r * 2**32)))
    cut = (
        cut.otherwise(int(round(default_rate * 2**32)))
        if cut is not None
        else F.lit(int(round(default_rate * 2**32)))
    )
    return df.filter(uniform32_col(F.col(key_col), seed) < cut)


def shuffle_order(
    df: DataFrame,
    seed: int = 42,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global SHUFFLE ordinal per row — the reproducible
    training-order step between sampling and `pack_sequences` (every
    pretraining pipeline shuffles document order; the order must be
    stable across reruns/resumes and changeable per epoch by seed).

    ord = dense 0-based rank of (uniform32(md5(seed|id)), id) — the md5
    convention of this module, so the permutation is partitioning- and
    execution-order-independent and the DuckDB oracle replays it. The
    id tie-break makes the order total even when two keys collide in
    the 32-bit hash (expected ~n²/2³³ collisions: real at corpus scale).

    A `row_number() OVER (ORDER BY hash)` would single-task the corpus;
    this is the same distributed two-level prefix sum as
    operators/packing.pack_sequences (its docstring has the recipe):
    one range exchange of (id, hash) rows + a partition-count-sized
    driver action, scanning each range partition in parallel.

    Returns (id_col, ord). Compose: `shuffle_order` → join ordinals →
    `pack_sequences(..., id_col="ord")` packs the shuffled stream.
    New epoch = new seed.
    """
    from pyspark.sql.window import Window

    from ..util import local_df

    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    src = df.select(
        F.col(id_col), uniform32_col(F.col(id_col), seed).alias("_u")
    )
    ranged = src.repartitionByRange(n_part, "_u", id_col).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy("_u", id_col)
    local = ranged.withColumn("_rn", F.row_number().over(w))
    # one lineage for the totals probe and the projection (the range
    # shuffle's sampled partitioner must not run twice)
    local = local.localCheckpoint(eager=True)
    counts = {
        r["_pid"]: r["_n"]
        for r in local.groupBy("_pid").agg(F.max("_rn").alias("_n")).collect()
    }
    running = 0
    offsets = []
    for pid in sorted(counts):
        offsets.append((pid, running))
        running += counts[pid]
    off_df = F.broadcast(local_df(spark, offsets, "_pid int, _off long"))
    return local.join(off_df, "_pid").select(
        id_col, (F.col("_off") + F.col("_rn") - 1).alias("ord")
    )
