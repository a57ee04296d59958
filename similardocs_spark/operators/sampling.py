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

__all__ = ["sample_hash", "sample_stratified", "uniform32_col"]


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
