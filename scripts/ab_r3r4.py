"""Interleaved r3-tag vs r4-HEAD bench A/B (round-4 verdict item 1).

BENCH_r04.json read uniformly ~15-30% slower than BENCH_r03.json (index_build
17.7->23.6 s, search -22%) while the builder's same-day interleaved snapshot
showed parity — the delta pattern (every query slower, including paths the
round-4 diff never touched) points at the host's documented steal bursts, but
the official record needs an interleaved A/B to retire or confirm it.

Protocol: two git worktrees (.ab/r3 = f457733, .ab/r4 = 0d5f0cf), ONE session
of alternated full runs (3 per variant, starting variant alternates per round
to cancel drift), each run a fresh process/JVM at local[32] over the SAME
sf0.1 corpus, a single-thread CPU burn probe before and after every run to
expose steal windows. Best-of-3 per metric per variant is the comparison (the
host's 2x steal bursts make min, not mean, the honest estimator — see
BASELINE.md scaling notes).

Usage:
  python scripts/ab_r3r4.py                 # orchestrate, write PROFILE_R3R4_AB.json
  python scripts/ab_r3r4.py --worker --repo /root/repo/.ab/r3   # one run
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

MAIN_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def burn_probe() -> float:
    t0 = time.time()
    x = 0
    for i in range(20_000_000):
        x += i * i % 7
    return round(time.time() - t0, 3)


def worker(repo: str) -> None:
    sys.path.insert(0, repo)
    probe_pre = burn_probe()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab-r3r4")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import random
    import tempfile
    from datetime import date

    import bench  # the WORKTREE's bench.py (same synth + query set per tag)
    from similardocs_spark.index.build import build_index
    from similardocs_spark.query.engine import SearchEngine

    out: dict = {"repo": os.path.basename(repo), "probe_pre": probe_pre}
    tdf = bench.synth_transcripts(spark, SF_DIR)
    with tempfile.TemporaryDirectory() as idx_root:
        t0 = time.time()
        paths = build_index(spark, tdf, idx_root, seg_size=1 << 14)
        out["index_build"] = round(time.time() - t0, 3)

        engine = SearchEngine(
            spark, paths, today=date(2028, 1, 1), end_days_ago=7, cache=True
        )
        engine.search_batch({"warm": "key value"})
        _pool = sorted({w for t in bench.SEARCH_QUERIES.values() for w in t.split()})
        _rng = random.Random(7)
        big_batch = {f"b{i}": " ".join(_rng.sample(_pool, 5)) for i in range(72)}
        t0 = time.time()
        engine.search_batch(big_batch)
        out["batch_set"] = round(time.time() - t0, 3)

        for tag, use_wand in (("search_set", False), ("wand_set", True)):
            t0 = time.time()
            for qtext in bench.SEARCH_QUERIES.values():
                engine.search(qtext, use_wand=use_wand)
            out[tag] = round(time.time() - t0, 3)
    spark.stop()
    out["probe_post"] = burn_probe()
    print("ABRESULT " + json.dumps(out), flush=True)


def orchestrate(rounds: int) -> None:
    variants = {
        "r3": os.path.join(MAIN_REPO, ".ab", "r3"),
        "r4": os.path.join(MAIN_REPO, ".ab", "r4"),
    }
    runs: list[dict] = []
    t_session = time.time()
    for rnd in range(rounds):
        order = ["r3", "r4"] if rnd % 2 == 0 else ["r4", "r3"]
        for name in order:
            cmd = [sys.executable, os.path.abspath(__file__), "--worker",
                   "--repo", variants[name]]
            res = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1800,
                cwd=variants[name],
            )
            line = next(
                (l for l in res.stdout.splitlines() if l.startswith("ABRESULT ")),
                None,
            )
            if line is None:
                raise SystemExit(
                    f"{name} round {rnd} failed:\n{res.stderr[-3000:]}"
                )
            rec = json.loads(line[len("ABRESULT "):])
            rec.update({"variant": name, "round": rnd})
            runs.append(rec)
            print(json.dumps(rec), flush=True)

    metrics = ["index_build", "batch_set", "search_set", "wand_set"]
    best = {
        v: {
            m: min(r[m] for r in runs if r["variant"] == v) for m in metrics
        }
        for v in variants
    }
    summary = {
        m: {
            "r3_best": best["r3"][m],
            "r4_best": best["r4"][m],
            "r4_over_r3": round(best["r4"][m] / best["r3"][m], 3),
        }
        for m in metrics
    }
    out = {
        "protocol": (
            "one session, alternated runs (start variant flips per round), "
            f"{rounds} runs/variant, fresh process+JVM per run, local[{CPUS}] "
            f"sf={SF_DIR}, burn probe pre/post each run; best-of-N per metric"
        ),
        "commits": {"r3": "f457733", "r4": "0d5f0cf"},
        "wall_sec": round(time.time() - t_session, 1),
        "summary": summary,
        "runs": runs,
    }
    path = os.path.join(MAIN_REPO, "PROFILE_R3R4_AB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE", path, flush=True)
    print(json.dumps(summary, indent=1))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--repo")
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()
    if args.worker:
        worker(args.repo)
    else:
        orchestrate(args.rounds)


if __name__ == "__main__":
    main()
