"""Interleaved A/B: fused vs pre-cut post-kernel batch plan, one session.

HISTORICAL RECORD (round 4): the fused plan (join docs first, pool-cut +
rank in ONE query_id exchange) traded one fewer exchange for carrying
per-SEGMENT pools (n_segs×) through the rerank join and the exchange. It
LOST in both regimes — 4x4 (data-bound): 11.3 s vs 8.0 s warm
(PROFILE_4X4_FUSED.json vs PROFILE_4X4.json); 8x2 (stage-constant-bound):
13.4 s vs 6.9 s best-of-3 interleaved (PROFILE_FUSED_AB_8X2.json) — so
the fused branch was removed from query/batch.py. This script is kept as
the measurement method record; re-running it requires re-adding a
`_use_fused` switch to similardocs_spark.query.batch (it exits with this
explanation otherwise). Host steal is bursty (2× swings within a run), so
the two plans were interleaved best-of-N in ONE session.

Usage: python scripts/profile_fused_ab.py [--execs 8 --cores 2] [--reps 3]
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
    p.add_argument("--execs", type=int, default=8)
    p.add_argument("--cores", type=int, default=2)
    p.add_argument("--mem-mb", type=int, default=4096)
    p.add_argument("--convs", type=int, default=300000)
    p.add_argument("--queries", type=int, default=1152)
    p.add_argument("--segsize", type=int, default=1 << 14)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", default="PROFILE_FUSED_AB.json")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local-cluster[{args.execs},{args.cores},{args.mem_mb}]"
        )
        .appName("fused-ab")
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
    zb = os.path.join(tempfile.gettempdir(), f"sdspark_ab_{os.getpid()}")
    spark.sparkContext.addPyFile(
        shutil.make_archive(zb, "zip", root_dir=REPO, base_dir="similardocs_spark")
    )

    from datetime import date

    from bench import synth_transcripts_zipf
    from similardocs_spark.index.build import build_index
    from similardocs_spark.query.engine import SearchEngine
    from similardocs_spark.query import batch as B

    if not hasattr(B, "_use_fused"):
        sys.exit(
            "The fused batch plan was removed after losing this A/B in both "
            "configs (see module docstring + PROFILE_FUSED_AB_8X2.json); "
            "re-add a _use_fused switch to query/batch.py to re-measure."
        )
    tdf = synth_transcripts_zipf(spark, n_convs=args.convs)
    root = tempfile.mkdtemp(prefix="ab_idx_")
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

        orig = B._use_fused
        walls: dict[str, list[float]] = {"fused": [], "precut": []}
        n_rows: dict[str, int] = {}
        # one un-timed warm pass per plan, then interleaved timed reps
        for plan in ("precut", "fused"):
            B._use_fused = (lambda e, w: True) if plan == "fused" else (
                lambda e, w: False
            )
            res = engine.search_batch(batch)
            n_rows[plan] = sum(len(v) for v in res.values())
        for _ in range(args.reps):
            for plan in ("precut", "fused"):
                B._use_fused = (lambda e, w: True) if plan == "fused" else (
                    lambda e, w: False
                )
                t0 = time.time()
                res = engine.search_batch(batch)
                walls[plan].append(round(time.time() - t0, 3))
                assert sum(len(v) for v in res.values()) == n_rows[plan]
        B._use_fused = orig
        assert n_rows["fused"] == n_rows["precut"], n_rows

        out = {
            "config": f"local-cluster[{args.execs},{args.cores},{args.mem_mb}]",
            "n_convs": args.convs,
            "n_queries": len(batch),
            "reps": args.reps,
            "walls_sec": walls,
            "best": {k: min(v) for k, v in walls.items()},
            "result_rows": n_rows["fused"],
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out, indent=1))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
