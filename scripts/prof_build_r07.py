"""Round-7 index_build phase profile: replicates bench.py's build exactly."""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
os.environ.setdefault("SIMDOCS_BUILD_TIMING", "1")


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("similardocs-prof-build")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import synth_transcripts
    from similardocs_spark.index.build import build_index

    reps = int(os.environ.get("PROF_REPS", "2"))
    for r in range(reps):
        tdf = synth_transcripts(spark, SF_DIR)
        with tempfile.TemporaryDirectory() as idx_root:
            t0 = time.time()
            build_index(spark, tdf, idx_root, seg_size=1 << 14)
            print(f"index_build rep{r}: {time.time() - t0:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
