"""Decontamination at corpus scale: broadcast-gram vs shuffle-join cost.

Protocol: the 309k-doc seeded corpus (same generator as ops_scale), a
benchmark of ~2k prompts — 12+13-token excerpts of every 300th corpus doc
(planted contamination with known sources) plus 1,000 synthetic
never-matching prompts — pushed through `decontaminate(n=13)` twice:

  broadcast — the default: benchmark gram hashes broadcast, document side
              streams map-side (shuffle should be O(per-doc counts), NOT
              O(doc grams))
  shuffle   — broadcast=False fallback: doc-gram rows shuffle for the join

Per measure: wall + stage-windowed shuffle bytes (UI REST), flagged-doc
count vs planted sources. Writes DECONTAM_SCALE.json.

Usage: python scripts/decontam_scale.py --cores 32 --n 300000
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ops_scale import UI_PORT, make_docs, stages_snapshot  # noqa: E402

N_GRAM = 13
PLANT_EVERY = 300
N_FAKE = 1000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--out", default="DECONTAM_SCALE.json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"decontam-scale-{args.cores}")
        .config("spark.sql.shuffle.partitions", str(max(32, 2 * args.cores)))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedStages", "3000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from similardocs_spark.operators.decontam import decontaminate

    import tempfile

    droot = tempfile.mkdtemp(prefix="decontam_scale_")
    docs_dir = droot + "/docs"
    make_docs(spark, args.n).write.mode("overwrite").parquet(docs_dir)
    docs = spark.read.parquet(docs_dir)
    n_docs = docs.count()

    # benchmark: 12+N_GRAM-token excerpts of every PLANT_EVERY-th BASE doc
    # (long enough to carry several n-grams), plus never-matching fakes
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), "[ \n]+"),
        lambda x: F.length(x) > 0,
    )
    planted = (
        docs.filter((F.col("doc_id") % PLANT_EVERY == 0) & (F.col("doc_id") < args.n))
        .select(
            F.col("doc_id").alias("src_doc_id"),
            F.concat_ws(" ", F.slice(toks, 3, N_GRAM + 12)).alias("text"),
        )
    )
    fakes = spark.range(N_FAKE).select(
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(N_GRAM + 11)),
                lambda i: F.concat(
                    F.lit("nvr"), F.col("id").cast("string"), F.lit("x"), i
                ),
            ),
        ).alias("text")
    )
    bench_dir = droot + "/bench"
    planted.select("text").unionByName(fakes).write.mode("overwrite").parquet(
        bench_dir
    )
    bench = spark.read.parquet(bench_dir)
    n_planted = planted.count()
    planted_ids = {r[0] for r in planted.select("src_doc_id").collect()}

    out: dict = {
        "protocol": "309k seeded corpus; 1k-row benchmark (half corpus "
        "excerpts, half never-matching); wall + stage-windowed shuffle per "
        "join strategy",
        "cores": args.cores,
        "n_docs": n_docs,
        "n_bench": bench.count(),
        "n_planted_sources": n_planted,
        "n_gram": N_GRAM,
    }

    def measured(name: str, broadcast: bool):
        spark.catalog.clearCache()
        pre = {s["stageId"] for s in stages_snapshot()}
        t = time.time()
        res = decontaminate(docs, bench, n=N_GRAM, broadcast=broadcast)
        flagged = [
            r[0] for r in res.filter("contaminated").select("doc_id").collect()
        ]
        wall = round(time.time() - t, 2)
        stages = [s for s in stages_snapshot() if s["stageId"] not in pre]
        hit_sources = len(planted_ids & set(flagged))
        out[name] = {
            "wall_sec": wall,
            "n_stages": len(stages),
            "shuffleReadMB": round(
                sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1
            ),
            "shuffleWriteMB": round(
                sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
            ),
            "n_flagged": len(flagged),
            "planted_sources_flagged": f"{hit_sources}/{n_planted}",
        }
        print(json.dumps({name: out[name]}), flush=True)

    measured("broadcast_gram_join", broadcast=True)
    measured("shuffle_gram_join", broadcast=False)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
