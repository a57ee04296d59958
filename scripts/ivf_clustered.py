"""IVF recall on a CLUSTERED corpus — the round-6 verdict-#3 evidence.

The committed isotropic recall@10 (0.6/0.8 at np16/np64, BENCH_OPS_SCALING
`cosine_full_scan_baseline`) is IVF's worst case: random gaussian vectors
have no cluster structure, so true neighbors scatter uniformly over the
inverted lists. Real embedding corpora are clustered. This campaign:

  1. generates a mixture-of-Gaussians corpus (K_TRUE centers, per-id
     deterministic noise — same per-row rng discipline as
     ops_scale.make_embeddings, so partitioning never changes the data),
  2. builds the MATERIALIZED IVF index through the library path
     (`ivf_build` → cid-partitioned lists; `ivf_probe_topk` →
     partition-pruned probe) — i.e. the verdict-#2 "campaign re-run
     through the library function",
  3. measures recall@K vs brute-force ground truth at the SAME probe
     fractions as the isotropic run (n_probe/n_centroids = 16/256 and
     64/256), for hash-sampled centroids AND the opt-in
     `ivf_centroids_kmeans` Lloyd refinement,
  4. records probe wall vs the full-scan baseline on the same session.

Usage:
  python scripts/ivf_clustered.py --cores 32 --n 3060000 \
      --out IVF_CLUSTERED.json [--merge BENCH_OPS_SCALING.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 96
K_TRUE = 256  # true mixture components
SIGMA = 0.1  # per-dim noise; ‖noise‖ ≈ 0.98 vs ~√2 inter-center distance
N_CENTROIDS = 256
K = 10
N_PROBES_EVAL = 10  # query vectors per recall figure


def centers() -> np.ndarray:
    c = np.random.default_rng(7).standard_normal((K_TRUE, DIM))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def make_clustered(spark, n: int):
    """(vec_id, embedding): vec(i) = center[i % K_TRUE] + SIGMA·noise(i),
    noise deterministic per id (partitioning-independent)."""
    import pandas as pd

    C = centers()

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), DIM), dtype=np.float64)
            for j, i in enumerate(ids):
                out[j] = C[int(i) % K_TRUE] + SIGMA * np.random.default_rng(
                    int(i)
                ).standard_normal(DIM)
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": [r.astype(np.float32) for r in out],
                }
            )

    return (
        spark.range(n)
        .repartition(int(spark.sparkContext.defaultParallelism))
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
    )


def probe_vecs() -> list[list[float]]:
    """Held-out queries from the same mixture (NOT corpus members)."""
    C = centers()
    out = []
    for p in range(N_PROBES_EVAL):
        v = C[(p * 13) % K_TRUE] + SIGMA * np.random.default_rng(
            10**9 + p
        ).standard_normal(DIM)
        out.append([float(x) for x in v])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--n", type=int, default=3_060_000)
    ap.add_argument("--out", default="IVF_CLUSTERED.json")
    ap.add_argument("--merge", default=None,
                    help="merge results as key 'ivf_clustered' into this json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"ivf-clustered-{args.cores}")
        .config("spark.sql.shuffle.partitions", str(max(32, 2 * args.cores)))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from similardocs_spark.operators import ann

    droot = tempfile.mkdtemp(prefix="ivf_clustered_")
    t0 = time.time()
    make_clustered(spark, args.n).write.mode("overwrite").parquet(
        droot + "/emb"
    )
    emb = spark.read.parquet(droot + "/emb")
    gen_sec = round(time.time() - t0, 1)
    probes = probe_vecs()

    # ground truth: brute-force top-K per probe (also the full-scan
    # latency baseline, median over the eval probes)
    exact: dict[int, list[int]] = {}
    scan_walls = []
    for pi, pv in enumerate(probes):
        t = time.time()
        exact[pi] = [
            r["vec_id"] for r in ann.cosine_topk(emb, pv, k=K).collect()
        ]
        scan_walls.append(time.time() - t)

    out: dict = {
        "protocol": (
            f"mixture of {K_TRUE} gaussians, dim {DIM}, sigma {SIGMA}; "
            f"{N_PROBES_EVAL} held-out probes; recall@{K} vs brute force; "
            f"library path ivf_build -> ivf_probe_topk (partition-pruned)"
        ),
        "cores": args.cores,
        "n_vectors": args.n,
        "n_centroids": N_CENTROIDS,
        "gen_sec": gen_sec,
        "full_scan_wall_sec_median": round(float(np.median(scan_walls)), 2),
        "isotropic_floor_note": (
            "same probe fractions on isotropic vectors measured 0.6/0.8 "
            "at np16/np64 (BENCH_OPS_SCALING cosine_full_scan_baseline)"
        ),
        "configs": {},
    }

    def eval_config(name: str, cents: np.ndarray, extra: dict) -> None:
        idx = f"{droot}/ivf_{name}"
        t = time.time()
        ann.ivf_build(emb, idx, n_centroids=N_CENTROIDS, cents=cents)
        build_sec = round(time.time() - t, 1)
        cfg: dict = {"build_sec": build_sec, **extra}
        for n_probe in (16, 64):
            recalls, walls = [], []
            for pi, pv in enumerate(probes):
                t = time.time()
                ids = [
                    r["vec_id"]
                    for r in ann.ivf_probe_topk(
                        spark, idx, pv, k=K, n_probe=n_probe, cents=cents
                    ).collect()
                ]
                walls.append(time.time() - t)
                recalls.append(len(set(ids) & set(exact[pi])) / K)
            cfg[f"recall_at_{K}_np{n_probe}"] = round(
                float(np.mean(recalls)), 3
            )
            cfg[f"probe_wall_sec_median_np{n_probe}"] = round(
                float(np.median(walls)), 2
            )
        out["configs"][name] = cfg
        print(json.dumps({name: cfg}), flush=True)

    t = time.time()
    hash_cents = ann.ivf_centroids(emb, N_CENTROIDS)
    hash_sec = round(time.time() - t, 1)
    eval_config("hash_sampled", hash_cents, {"centroid_sec": hash_sec})

    t = time.time()
    km_cents = ann.ivf_centroids_kmeans(
        emb, N_CENTROIDS, n_iter=5, init=hash_cents
    )
    km_sec = round(time.time() - t, 1)
    eval_config(
        "kmeans_refined", km_cents, {"centroid_sec": km_sec, "n_iter": 5}
    )

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    if args.merge and os.path.exists(args.merge):
        with open(args.merge) as f:
            merged = json.load(f)
        merged["ivf_clustered"] = out
        with open(args.merge, "w") as f:
            json.dump(merged, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "protocol"}))
    spark.stop()


if __name__ == "__main__":
    main()
