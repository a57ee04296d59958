"""Profile WHERE the per-batch time goes (VERDICT r2 item 1).

Reproduces the scaling harness's batch workload (Zipf corpus, 1152-query
batch) under local-cluster[E,C] with the Spark UI enabled, then pulls the
per-stage breakdown from the REST API for the batch window: stage name,
wall duration, task count, executor run/deserialize time, Python worker
time, shuffle read/write bytes. Driver-side phases (prepare, createDataFrame,
collect) are timed directly.

Usage: python scripts/profile_batch.py [--execs 4] [--cores 8]
       [--convs 300000] [--queries 1152] [--out PROFILE_BATCH.json]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UI_PORT = 4057


def stages_snapshot() -> list[dict]:
    url = f"http://localhost:{UI_PORT}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(url, timeout=10))
    app_id = apps[0]["id"]
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    return json.load(urllib.request.urlopen(url, timeout=30))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--execs", type=int, default=4)
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--mem-mb", type=int, default=4096)
    p.add_argument("--convs", type=int, default=300000)
    p.add_argument("--queries", type=int, default=1152)
    p.add_argument("--segsize", type=int, default=1 << 14)
    p.add_argument("--hot-term", default=None,
                   help="prepend this term to EVERY query (skew experiment: "
                        "a stopword-ish hot term shared by the whole batch)")
    p.add_argument("--out", default="PROFILE_BATCH.json")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local-cluster[{args.execs},{args.cores},{args.mem_mb}]"
        )
        .appName("profile-batch")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.default.parallelism", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.executor.memory", f"{args.mem_mb}m")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    zb = os.path.join(tempfile.gettempdir(), f"sdspark_prof_{os.getpid()}")
    spark.sparkContext.addPyFile(
        shutil.make_archive(zb, "zip", root_dir=REPO, base_dir="similardocs_spark")
    )

    from datetime import date

    from bench import synth_transcripts_zipf
    from similardocs_spark.index.build import build_index
    from similardocs_spark.query.engine import SearchEngine

    tdf = synth_transcripts_zipf(spark, n_convs=args.convs)
    spark.range(1000).selectExpr("sum(id)").collect()

    root = tempfile.mkdtemp(prefix="prof_idx_")
    try:
        t0 = time.time()
        paths = build_index(
            spark, tdf, root, seg_size=args.segsize,
            doc_id_expr="cast(substring(conv_id, 5, 9) as bigint)",
            lineage_counts=False,
        )
        build_sec = time.time() - t0
        engine = SearchEngine(
            spark, paths, today=date(2028, 1, 1), end_days_ago=7, cache=True
        )
        engine.search_batch({"warm": "w0 w1"})
        # distinct Zipf-drawn queries (see scaling_cluster.py rationale)
        import random

        rng = random.Random(42)
        batch = {
            f"q{i}": " ".join(
                f"w{int(50000 * rng.random() ** 2)}" for _ in range(4)
            )
            for i in range(args.queries)
        }
        if args.hot_term:
            batch = {qid: f"{args.hot_term} {text}" for qid, text in batch.items()}

        # --- instrumented run: driver-side phase timers ------------------
        from similardocs_spark.query import batch as B

        driver_phases: dict[str, float] = {}

        orig_prepare = B._prepare_batch
        orig_bucket = B._batch_bucket

        def timed_prepare(engine_, queries_):
            t = time.time()
            out = orig_prepare(engine_, queries_)
            driver_phases["prepare_batch"] = driver_phases.get("prepare_batch", 0) + time.time() - t
            return out

        def timed_bucket(*a, **k):
            t = time.time()
            out = orig_bucket(*a, **k)  # plan construction only (lazy)
            driver_phases["bucket_plan_build"] = driver_phases.get("bucket_plan_build", 0) + time.time() - t
            return out

        B._prepare_batch = timed_prepare
        B._batch_bucket = timed_bucket

        pre_stage_ids = {s["stageId"] for s in stages_snapshot()}
        results = []
        for rep in range(2):
            t0 = time.time()
            res = engine.search_batch(batch)
            wall = time.time() - t0
            results.append(wall)
            n_rows = sum(len(v) for v in res.values())
        B._prepare_batch = orig_prepare
        B._batch_bucket = orig_bucket

        # --- per-stage breakdown over the batch window -------------------
        stages = [
            s for s in stages_snapshot() if s["stageId"] not in pre_stage_ids
        ]
        stage_rows = []
        for s in sorted(stages, key=lambda s: s["stageId"]):
            dur = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                t1 = datetime.strptime(s["firstTaskLaunchedTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                t2 = datetime.strptime(s["completionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                dur = round((t2 - t1).total_seconds(), 3)
            stage_rows.append(
                {
                    "stageId": s["stageId"],
                    "name": s["name"].split("\n")[0][:120],
                    "wall_sec": dur,
                    "numTasks": s["numTasks"],
                    "executorRunTime_sec": round(s.get("executorRunTime", 0) / 1000, 2),
                    "executorDeserializeTime_sec": round(
                        s.get("executorDeserializeTime", 0) / 1000, 2
                    ),
                    "shuffleReadMB": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                    "shuffleWriteMB": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                    "inputMB": round(s.get("inputBytes", 0) / 1e6, 2),
                    "outputMB": round(s.get("outputBytes", 0) / 1e6, 2),
                }
            )

        out = {
            "config": f"local-cluster[{args.execs},{args.cores},{args.mem_mb}]",
            "n_convs": args.convs,
            "n_queries": len(batch),
            "build_sec": round(build_sec, 2),
            "batch_walls_sec": [round(w, 3) for w in results],
            "batch_qps_best": round(len(batch) / min(results), 2),
            "result_rows": n_rows,
            "driver_phases_sec": {k: round(v, 3) for k, v in driver_phases.items()},
            "stages": stage_rows,
        }
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps({k: v for k, v in out.items() if k != "stages"}, indent=2))
        for r in stage_rows:
            print(r)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
