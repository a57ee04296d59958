"""Process-isolated scaling evidence (the protocol VERDICT r1 asked for):
run the identical job on the identical input under local-cluster[E,C,M] —
real executor JVMs with their own memory, shuffle clients and Python worker
pools — at N and 4N executors, and report throughput at both plus
efficiency = (thr_4N / thr_N) / 4.

Defaults: N = local-cluster[2,4,4096] (8 cores), 4N = local-cluster[8,4,4096]
(32 cores) — quadrupling EXECUTORS at fixed cores-per-executor, which is the
north_rule's "N -> 4N executors" axis. Partitioning is FIXED across levels
(same plan, same shuffle.partitions) so only the resource count varies.

Writes BENCH_SCALING.json and prints per-phase timings for the build
(tokenize+docs write, postings sort+encode, terms) to locate any
non-scaling phase instead of guessing.

Usage: python scripts/scaling_cluster.py [--execs 2] [--cores 4]
       [--rounds 2] [--convs 150000] [--mem-mb 4096]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

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
    # same plan, same partitioning, different executor slots)
    .config("spark.sql.shuffle.partitions", "128")
    .config("spark.default.parallelism", "128")
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

N_CONVS = int(os.environ.get("SIMDOCS_SCALING_CONVS", "150000"))
tdf = synth_transcripts_zipf(spark, n_convs=N_CONVS)
spark.range(1000).selectExpr("sum(id)").collect()  # executor warm-up
with tempfile.TemporaryDirectory() as root:
    t0 = time.time()
    paths = build_index(
        spark, tdf, root, seg_size=1 << 14,
        doc_id_expr="cast(substring(conv_id, 5, 9) as bigint)",
        lineage_counts=False,
    )
    build_sec = time.time() - t0
    engine = SearchEngine(spark, paths, today=date(2028, 1, 1), end_days_ago=7, cache=True)
    QUERIES = {{
        "z1": "w0 w1 w17 w123", "z2": "w2 w5 w999 w4321", "z3": "w1 w3 w4 w55",
        "z4": "w7 w88 w1500 w23000", "z5": "w10 w20 w30", "z6": "w0 w41000 w600",
        "z7": "w6 w66 w666 w6666", "z8": "w9 w99 w999", "z9": "w11 w111 w1111",
    }}
    engine.search_batch({{"warm": "w0 w1"}})
    batch = {{f"{{name}}_{{i}}": text for i in range(16) for name, text in QUERIES.items()}}
    times = []
    for _ in range(2):
        t0 = time.time()
        res = engine.search_batch(batch)
        times.append(time.time() - t0)
    batch_sec = min(times)
    n_q = len(batch)
print(json.dumps({{"execs": execs, "cores": cores, "total_cores": execs * cores,
                   "n_convs": N_CONVS,
                   "build_sec": round(build_sec, 3),
                   "batch_sec": round(batch_sec, 3), "n_queries": n_q,
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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--execs", type=int, default=2, help="N executor count")
    p.add_argument("--cores", type=int, default=4, help="cores per executor")
    p.add_argument("--mem-mb", type=int, default=4096)
    p.add_argument("--rounds", type=int, default=2,
                   help="interleaved A/B repetitions; min per config kept "
                        "(the sandbox host has bursty CPU steal)")
    p.add_argument("--convs", type=int, default=None)
    args = p.parse_args()
    if args.convs:
        os.environ["SIMDOCS_SCALING_CONVS"] = str(args.convs)

    los, his = [], []
    for _ in range(args.rounds):  # interleave to spread host noise fairly
        los.append(run(args.execs, args.cores, args.mem_mb))
        his.append(run(args.execs * 4, args.cores, args.mem_mb))
    lo = min(los, key=lambda r: r["batch_sec"])
    lo["build_sec"] = min(r["build_sec"] for r in los)
    hi = min(his, key=lambda r: r["batch_sec"])
    hi["build_sec"] = min(r["build_sec"] for r in his)
    eff_q = (hi["qps"] / lo["qps"]) / 4
    eff_b = (lo["build_sec"] / hi["build_sec"]) / 4
    result = {
        "protocol": (
            "local-cluster process isolation: N={}x{} vs 4N={}x{} executor "
            "JVMs, {} MB each; fixed 128-partition plan; interleaved "
            "best-of-{} rounds (bursty-steal host)".format(
                args.execs, args.cores, args.execs * 4, args.cores,
                args.mem_mb, args.rounds,
            )
        ),
        "corpus": "zipf synthetic transcripts (realistic vocabulary)",
        "N": lo,
        "4N": hi,
        "all_N": los,
        "all_4N": his,
        "query_scaling_efficiency": round(eff_q, 3),
        "build_scaling_efficiency": round(eff_b, 3),
    }
    print(json.dumps(result, indent=2))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
