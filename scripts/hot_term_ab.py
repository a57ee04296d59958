"""Hot-term skew A/B (VERDICT r2 item 8), steal-robust protocol.

One session, one index build; then ALTERNATE baseline batches and hot-term
batches (every query additionally contains the corpus's hottest indexable
term) for `--reps` rounds, reporting per-round times and best-of mins. The
interleaving makes the comparison immune to the sandbox's bursty CPU steal
(identical runs vary up to 2x across windows).

Usage: python scripts/hot_term_ab.py [--execs 4] [--cores 8]
       [--convs 300000] [--queries 1152] [--reps 3] [--hot w10]
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
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--mem-mb", type=int, default=4096)
    p.add_argument("--convs", type=int, default=300000)
    p.add_argument("--queries", type=int, default=1152)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--hot", default="w10")
    p.add_argument("--out", default="HOT_TERM_AB.json")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local-cluster[{args.execs},{args.cores},{args.mem_mb}]"
        )
        .appName("hot-term-ab")
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

    import random
    from datetime import date

    from bench import synth_transcripts_zipf
    from similardocs_spark.index.build import build_index
    from similardocs_spark.query.engine import SearchEngine

    tdf = synth_transcripts_zipf(spark, n_convs=args.convs)
    root = tempfile.mkdtemp(prefix="ab_idx_")
    try:
        build_index(
            spark, tdf, root, seg_size=1 << 14,
            doc_id_expr="cast(substring(conv_id, 5, 9) as bigint)",
            lineage_counts=False,
        )
        engine = SearchEngine(
            spark, root_paths(root), today=date(2028, 1, 1), end_days_ago=7,
            cache=True,
        )
        rng = random.Random(42)
        base = {
            f"q{i}": " ".join(
                f"w{int(50000 * rng.random() ** 2)}" for _ in range(4)
            )
            for i in range(args.queries)
        }
        hot = {qid: f"{args.hot} {t}" for qid, t in base.items()}
        hot_df = engine._term_df.get(args.hot) if engine._term_df else None
        engine.search_batch({"warm": "w10 w11"})

        base_times, hot_times = [], []
        for _ in range(args.reps):
            t0 = time.time()
            engine.search_batch(base)
            base_times.append(round(time.time() - t0, 3))
            t0 = time.time()
            engine.search_batch(hot)
            hot_times.append(round(time.time() - t0, 3))
        out = {
            "config": f"local-cluster[{args.execs},{args.cores},{args.mem_mb}]",
            "n_convs": args.convs,
            "n_queries": args.queries,
            "hot_term": args.hot,
            "hot_term_df": hot_df,
            "n_docs": engine.n_docs,
            "base_times": base_times,
            "hot_times": hot_times,
            "base_best": min(base_times),
            "hot_best": min(hot_times),
            "hot_overhead_pct": round(
                100 * (min(hot_times) / min(base_times) - 1), 1
            ),
        }
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


def root_paths(root: str):
    from similardocs_spark.index.build import IndexPaths

    return IndexPaths(root)


if __name__ == "__main__":
    main()
