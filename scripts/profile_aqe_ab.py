"""Interleaved A/B: AQE on vs off for the batched query path.

Motivation (round 4): pair-A query scaling is capped by a ~3.9 s fixed
per-batch cost (t = F + W/cores fit of BENCH_SCALING.json: 23.7 s at 2
cores, 8.8 s at 8). AQE re-plans in the driver at every shuffle-stage
boundary — the batch plan has 5+ of them — and the plan is already
hand-partitioned (fixed 64, kernel_exec_conf guards coalescing), so for
THIS path AQE may be pure driver latency. Skew risk is structurally
bounded (segment-keyed kernel, capped pools), so disabling it for the
batch scope is semantically safe.

Toggles spark.sql.adaptive.enabled between interleaved reps in one
session at one config. Run at 1x2 and 4x2 to see both ends of pair A.

Usage: python scripts/profile_aqe_ab.py --execs 4 --cores 2 [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--execs", type=int, default=4)
    p.add_argument("--cores", type=int, default=2)
    p.add_argument("--mem-mb", type=int, default=4096)
    p.add_argument("--convs", type=int, default=300000)
    p.add_argument("--queries", type=int, default=1152)
    p.add_argument("--segsize", type=int, default=1 << 14)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default="PROFILE_AQE_AB.json")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local-cluster[{args.execs},{args.cores},{args.mem_mb}]"
        )
        .appName("aqe-ab")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.default.parallelism", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", f"{args.mem_mb}m")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    zb = os.path.join(tempfile.gettempdir(), f"sdspark_aqe_{os.getpid()}")
    spark.sparkContext.addPyFile(
        shutil.make_archive(zb, "zip", root_dir=REPO, base_dir="similardocs_spark")
    )

    from datetime import date

    from bench import synth_transcripts_zipf
    from similardocs_spark.index.build import build_index
    from similardocs_spark.query.engine import SearchEngine

    tdf = synth_transcripts_zipf(spark, n_convs=args.convs)
    root = tempfile.mkdtemp(prefix="aqe_idx_")
    try:
        paths = build_index(
            spark, tdf, root, seg_size=args.segsize,
            doc_id_expr="cast(substring(conv_id, 5, 9) as bigint)",
            lineage_counts=False,
        )
        engine = SearchEngine(
            spark, paths, today=date(2028, 1, 1), end_days_ago=7, cache=True
        )
        engine.search_batch({"warm": "w0 w1"})
        import random

        rng = random.Random(42)
        batch = {
            f"q{i}": " ".join(
                f"w{int(50000 * rng.random() ** 2)}" for _ in range(4)
            )
            for i in range(args.queries)
        }
        walls: dict[str, list[float]] = {"aqe_on": [], "aqe_off": []}
        n_rows: dict[str, int] = {}
        for mode in ("aqe_on", "aqe_off"):
            spark.conf.set("spark.sql.adaptive.enabled", mode == "aqe_on")
            n_rows[mode] = sum(len(v) for v in engine.search_batch(batch).values())
        assert n_rows["aqe_on"] == n_rows["aqe_off"], n_rows
        for _ in range(args.reps):
            for mode in ("aqe_on", "aqe_off"):
                spark.conf.set("spark.sql.adaptive.enabled", mode == "aqe_on")
                t0 = time.time()
                res = engine.search_batch(batch)
                walls[mode].append(round(time.time() - t0, 3))
                assert sum(len(v) for v in res.values()) == n_rows[mode]
        out = {
            "config": f"local-cluster[{args.execs},{args.cores},{args.mem_mb}]",
            "n_convs": args.convs,
            "n_queries": len(batch),
            "walls_sec": walls,
            "best": {k: min(v) for k, v in walls.items()},
            "result_rows": n_rows["aqe_on"],
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out, indent=1))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
