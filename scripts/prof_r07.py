"""Round-7 profiling probe: time individual declared queries with a noop
sink, optionally with a post-read repartition, and dump explain output.

Usage: python scripts/prof_r07.py <query> [<query> ...] [--explain-dir DIR]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    explain_dir = None
    if "--explain-dir" in args:
        i = args.index("--explain-dir")
        explain_dir = args[i + 1]
        del args[i : i + 2]
        os.makedirs(explain_dir, exist_ok=True)
    names = [a for a in args if not a.startswith("--")]
    reps = int(os.environ.get("PROF_REPS", "2"))

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("similardocs-prof-r07")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"prof:{name}")
        for r in range(reps):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.collect()
            dt = time.time() - t0
            print(f"{name} rep{r}: {dt:.3f}s", flush=True)
        if explain_dir:
            df = fn(spark, SF_DIR)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()


if __name__ == "__main__":
    main()
