"""Process-isolated scaling evidence (BASELINE.json north_rule: throughput
scaling efficiency ≥ 0.8 from N to 4N executors, evidenced in-sandbox by
running the identical job on the identical input at two parallelism levels).

Protocol (what VERDICT r1 asked for, plus the sandbox-physics control):

1. HOST CEILING PROBE — pure-Python multiprocessing CPU burn at p and 4p
   processes, best-of-3. No Spark, no I/O, embarrassingly parallel: its
   efficiency is the PHYSICAL maximum any software can reach on this host at
   that core range (the 32 "vCPUs" of this Firecracker guest deliver ~23-24
   effective cores when all are busy — measured, not assumed).
2. ENGINE PAIRS under local-cluster[E,C,M] — real executor JVMs with their
   own shuffle servers and Python worker pools, fixed 64-partition plan:
     pair A: 1x2 -> 4x2  (N=1 executor/2 cores -> 4N executors, host-linear
             core range: the ceiling probe shows ~0.9+ here)
     pair B: 2x4 -> 8x4  (8 -> 32 cores, the range where the host itself
             caps at ~0.74 — reported raw AND ceiling-normalized)
   Each pair interleaved best-of-`rounds`.

Writes BENCH_SCALING.json. Usage:
  python scripts/scaling_cluster.py [--rounds 2] [--convs 300000]
  [--queries 1152] [--pairs 1x2:4x2,2x4:8x4] [--mem-mb 4096]
"""
from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

execs, cores, mem_mb = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
spark = (
    SparkSession.builder.master(f"local-cluster[{{execs}},{{cores}},{{mem_mb}}]")
    .appName(f"scaling-{{execs}}x{{cores}}")
    # FIXED task count across parallelism levels (cluster-scaling protocol:
    # same plan, same partitioning, different executor slots). 64, not 128:
    # measured -31%% on the batch path (128 tiny tasks per shuffle were
    # scheduling-dominated at this corpus scale)
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.default.parallelism", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "8g")
    .config("spark.executor.memory", f"{{mem_mb}}m")
    .config("spark.python.worker.reuse", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
# executors are separate JVMs spawning their own Python workers: ship the pkg
zb = os.path.join(tempfile.gettempdir(), f"sdspark_scaling_{{os.getpid()}}")
spark.sparkContext.addPyFile(shutil.make_archive(zb, "zip", root_dir={repo!r}, base_dir="similardocs_spark"))

from bench import synth_transcripts_zipf
from similardocs_spark.index.build import build_index
from similardocs_spark.query.engine import SearchEngine
from datetime import date

N_CONVS = int(os.environ.get("SIMDOCS_SCALING_CONVS", "300000"))
N_QUERIES = int(os.environ.get("SIMDOCS_SCALING_QUERIES", "576"))
SEG_SIZE = int(os.environ.get("SIMDOCS_SCALING_SEGSIZE", str(1 << 14)))
tdf = synth_transcripts_zipf(spark, n_convs=N_CONVS)
spark.range(1000).selectExpr("sum(id)").collect()  # executor warm-up
with tempfile.TemporaryDirectory() as root:
    t0 = time.time()
    paths = build_index(
        spark, tdf, root, seg_size=SEG_SIZE,
        doc_id_expr="cast(substring(conv_id, 5, 9) as bigint)",
        lineage_counts=False,
    )
    build_sec = time.time() - t0
    engine = SearchEngine(spark, paths, today=date(2028, 1, 1), end_days_ago=7, cache=True)
    engine.search_batch({{"warm": "w0 w1"}})  # cache + python-worker warm-up
    # DISTINCT queries drawn from the corpus's own Zipf term distribution
    # (rank = floor(vocab·u²), matching synth_transcripts_zipf): round 2 used
    # 9 texts repeated ~128x, which the engine now canonically dedups — the
    # scaling workload must pay real per-query kernel compute to be honest
    import random
    rng = random.Random(42)
    batch = {{
        f"q{{i}}": " ".join(f"w{{int(50000 * rng.random() ** 2)}}" for _ in range(4))
        for i in range(N_QUERIES)
    }}
    def _burn_probe():
        # single-thread CPU canary (~1-2 s): the sandbox host has bursty CPU
        # steal that varies identical runs up to 2x; recording a probe around
        # each measurement lets a reader see WHICH runs hit a steal window
        t0 = time.time()
        x = 0
        for i in range(20_000_000):
            x += i * i % 7
        return round(time.time() - t0, 3)

    probe_pre = _burn_probe()
    times = []
    for _ in range(3):
        t0 = time.time()
        res = engine.search_batch(batch)
        times.append(round(time.time() - t0, 3))
    probe_post = _burn_probe()
    batch_sec = min(times)
    n_q = len(batch)
print(json.dumps({{"execs": execs, "cores": cores, "total_cores": execs * cores,
                   "n_convs": N_CONVS,
                   "build_sec": round(build_sec, 3),
                   "batch_sec": round(batch_sec, 3), "batch_times": times,
                   "burn_probe_pre_sec": probe_pre,
                   "burn_probe_post_sec": probe_post,
                   "n_queries": n_q,
                   "qps": round(n_q / batch_sec, 3)}}))
spark.stop()
"""


def run(execs: int, cores: int, mem_mb: int) -> dict:
    script = WORKER.format(repo=REPO)
    env = dict(os.environ)
    env["SIMDOCS_BUILD_TIMING"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", script, str(execs), str(cores), str(mem_mb)],
        capture_output=True, text=True, timeout=3600, cwd=REPO, env=env,
    )
    if out.returncode != 0:
        raise SystemExit(f"worker {execs}x{cores} failed:\n{out.stderr[-4000:]}")
    lines = out.stdout.strip().splitlines()
    res = json.loads(lines[-1])
    res["phases"] = {
        m.group(1): float(m.group(2))
        for line in lines
        if (m := re.match(r"\[build\] (.+): ([0-9.]+)s", line))
    }
    return res


def _burn(_: int) -> int:
    x = 0
    for i in range(4_000_000):
        x += i * i % 7
    return x


def host_ceiling(pairs: list[tuple[int, int]], reps: int = 3) -> dict:
    """Best-of-`reps` pure-CPU multiprocessing throughput at each proc count
    in `pairs` — the physical scaling ceiling of this host."""
    counts = sorted({p for pair in pairs for p in pair})
    best: dict[int, float] = {}
    for _ in range(reps):
        for p in counts:  # interleave
            with mp.Pool(p) as pool:
                t0 = time.time()
                pool.map(_burn, [0] * p * 4)
                thr = p * 4 / (time.time() - t0)
            best[p] = max(best.get(p, 0.0), thr)
    out = {"throughput_per_procs": {str(p): round(t, 2) for p, t in best.items()}}
    for lo, hi in pairs:
        out[f"efficiency_{lo}to{hi}"] = round((best[hi] / best[lo]) / (hi / lo), 3)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mem-mb", type=int, default=4096)
    p.add_argument("--rounds", type=int, default=2,
                   help="interleaved A/B repetitions; min per config kept "
                        "(the sandbox host has bursty CPU steal)")
    p.add_argument("--convs", type=int, default=300000)
    p.add_argument("--queries", type=int, default=1152)
    p.add_argument("--pairs", default="1x2:4x2,2x4:8x4",
                   help="comma list of ExC:ExC local-cluster pairs")
    p.add_argument("--out", default="BENCH_SCALING.json")
    args = p.parse_args()
    os.environ["SIMDOCS_SCALING_CONVS"] = str(args.convs)
    os.environ["SIMDOCS_SCALING_QUERIES"] = str(args.queries)

    def parse(cfg: str) -> tuple[int, int]:
        e, c = cfg.split("x")
        return int(e), int(c)

    pairs = [tuple(parse(x) for x in pair.split(":")) for pair in args.pairs.split(",")]
    core_pairs = [(e1 * c1, e2 * c2) for (e1, c1), (e2, c2) in pairs]
    ceiling = host_ceiling(core_pairs)

    result = {
        "protocol": (
            "local-cluster process isolation (real executor JVMs), fixed "
            "64-partition plan, interleaved best-of-{} rounds; host CPU "
            "ceiling measured via pure multiprocessing burn (no Spark)".format(
                args.rounds
            )
        ),
        "corpus": f"zipf synthetic transcripts, {args.convs} convs, "
                  f"{args.queries}-query batches",
        "host_ceiling": ceiling,
        "pairs": [],
    }
    for (lo_cfg, hi_cfg), (lo_cores, hi_cores) in zip(pairs, core_pairs):
        los, his = [], []
        for _ in range(args.rounds):  # interleave to spread host noise fairly
            los.append(run(*lo_cfg, args.mem_mb))
            his.append(run(*hi_cfg, args.mem_mb))
        lo = min(los, key=lambda r: r["batch_sec"])
        lo["build_sec"] = min(r["build_sec"] for r in los)
        hi = min(his, key=lambda r: r["batch_sec"])
        hi["build_sec"] = min(r["build_sec"] for r in his)
        factor = hi_cores / lo_cores
        eff_q = (hi["qps"] / lo["qps"]) / factor
        eff_b = (lo["build_sec"] / hi["build_sec"]) / factor
        ceil_eff = ceiling.get(f"efficiency_{lo_cores}to{hi_cores}")
        entry = {
            "config": f"{lo_cfg[0]}x{lo_cfg[1]} -> {hi_cfg[0]}x{hi_cfg[1]} "
                      f"({lo_cores} -> {hi_cores} cores)",
            "N": lo,
            "4N": hi,
            "all_N": los,
            "all_4N": his,
            "query_scaling_efficiency": round(eff_q, 3),
            "build_scaling_efficiency": round(eff_b, 3),
            "host_ceiling_efficiency": ceil_eff,
        }
        if ceil_eff:
            entry["query_eff_normalized_to_host"] = round(eff_q / ceil_eff, 3)
            entry["build_eff_normalized_to_host"] = round(eff_b / ceil_eff, 3)
        result["pairs"].append(entry)
        print(json.dumps(entry, indent=2))

    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"host_ceiling": ceiling}, indent=2))


if __name__ == "__main__":
    main()
