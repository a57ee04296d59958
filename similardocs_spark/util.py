"""Small shared utilities for driver-side tables and kernel execution conf."""
from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


def _schema_columns(schema: str) -> list[str]:
    """Column names from a DDL schema string, respecting <> nesting
    ("a string, b array<string>" → ["a", "b"])."""
    cols, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            cols.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    cols.append("".join(cur))
    return [c.strip().split()[0] for c in cols if c.strip()]


def local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Tiny driver-side table as an Arrow-backed LocalRelation.

    A plain createDataFrame(list) goes through the RDD path: the data is
    pickled into defaultParallelism slices and EVERY materialization (e.g.
    a broadcast exchange) runs a full Python-task stage — measured ~1.2 s
    per tiny broadcast table at local-cluster[4,8], ~3.6 s of pure overhead
    per query batch. Routing through pandas + Arrow produces a LocalRelation
    the JVM holds directly: zero jobs, zero Python tasks at materialization."""
    import pandas as pd

    if not rows:
        # empty pandas frames fall back to the RDD path; one explicit slice
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), schema
        )
    pdf = pd.DataFrame(rows, columns=_schema_columns(schema))
    return spark.createDataFrame(pdf, schema=schema)


ISIN_MAX_LITERALS = 128


def filter_terms(df: DataFrame, terms, col: str = "term") -> DataFrame:
    """`df` restricted to rows whose `col` ∈ terms.

    Small sets use a literal In() — it reaches the parquet scan as a pushed
    filter (row-group min/max pruning on term-sorted files). Large sets use
    a broadcast LEFT SEMI join against an Arrow LocalRelation instead:
    PySpark's Column.isin makes a py4j round-trip PER LITERAL (~12 s of
    driver time measured for a 1152-query batch's ~2.6k distinct terms),
    and a thousands-element In() defeats row-group pruning anyway (every
    row group matches some term)."""
    terms = sorted(terms)
    from pyspark.sql import functions as F

    if len(terms) <= ISIN_MAX_LITERALS:
        return df.filter(F.col(col).isin(terms))
    tdf = F.broadcast(
        local_df(df.sparkSession, [(t,) for t in terms], f"{col} string")
    )
    return df.join(tdf, col, "left_semi")


_KERNEL_CONF_LOCK = threading.RLock()
_KERNEL_CONF_DEPTH = 0  # protected by the lock
_KERNEL_CONF_SAVED = [None]  # value to restore when depth returns to 0


@contextmanager
def kernel_exec_conf(spark: SparkSession):
    """Execution-conf scope for plans whose hot stage is a CPU-bound Python
    kernel over a SMALL shuffle input (cogroup+applyInPandas scoring).

    AQE's partition coalescing merges post-shuffle partitions by BYTE size
    (minPartitionSize, default 1 MB); a kernel stage reading ~8 MB of
    postings+stats collapses to ~8 tasks regardless of cores — measured 7
    tasks / 4.1 s wall on 32 cores for a stage with 22 s of executor CPU.
    Lowering minPartitionSize inside the scope keeps the configured task
    count for compute-bound stages; AQE (incl. skew splitting) stays on.

    The conf is session-global; concurrent scopes on the same session
    (multi-threaded serving) all set the SAME value, so overlap is
    compatible — what must not interleave is the save/restore bookkeeping.
    A depth counter under a process-wide lock guards it: only the first
    scope to enter saves the prior value, only the last to exit restores
    it, and the lock is NOT held across the body (queries stay concurrent).
    Residual caveat, by design: an unrelated query planned while any kernel
    scope is open sees the 16k value — harmless for non-kernel plans (AQE
    coalescing merely coalesces less)."""
    global _KERNEL_CONF_DEPTH
    key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    with _KERNEL_CONF_LOCK:
        if _KERNEL_CONF_DEPTH == 0:
            try:
                _KERNEL_CONF_SAVED[0] = spark.conf.get(key)
            except Exception:
                _KERNEL_CONF_SAVED[0] = None
            spark.conf.set(key, "16k")
        _KERNEL_CONF_DEPTH += 1
    try:
        yield
    finally:
        with _KERNEL_CONF_LOCK:
            _KERNEL_CONF_DEPTH -= 1
            if _KERNEL_CONF_DEPTH == 0:
                old = _KERNEL_CONF_SAVED[0]
                if old is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, old)
