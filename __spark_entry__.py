"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in similardocs_spark.entry_queries (Spark plans) and
similardocs_spark.oracle.sqlgen (DuckDB SQL mirrors).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

_shipped: set[int] = set()


def _ensure_workers(spark: SparkSession) -> None:
    """Executor Python workers inherit neither this process's sys.path nor
    its cwd — ship the package as a zip so UDFs resolve `similardocs_spark`
    regardless of where the harness launched Spark from."""
    key = id(spark.sparkContext)
    if key in _shipped:
        return
    import shutil
    import tempfile

    # Rebuild unconditionally into a per-process name: reusing a cached zip
    # after a source edit would make executors import STALE package code
    # while the driver runs the new code (silent UDF divergence), and a
    # shared fixed name races across concurrent harness processes.
    zip_base = os.path.join(
        tempfile.gettempdir(), f"similardocs_spark_pkg_{os.getpid()}"
    )
    zip_path = shutil.make_archive(
        zip_base, "zip", root_dir=_REPO, base_dir="similardocs_spark"
    )
    spark.sparkContext.addPyFile(zip_path)
    _shipped.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full similar-documents search (BM25 candidates → overlap
    rerank → top-k) over the sf0.001 documents corpus."""
    _ensure_workers(spark)
    from similardocs_spark.entry_queries import q_adhoc_search

    return q_adhoc_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see COVERAGE.md)."""
    from similardocs_spark.entry_queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_workers(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names/types)."""
    from similardocs_spark.entry_queries import SQL

    return dict(SQL)
