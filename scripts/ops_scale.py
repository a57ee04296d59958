"""Run the dedup/ANN operators at corpus scale (round-3 verdict item 2).

The search path's scaling evidence runs on a 300k-conversation Zipf corpus;
the LLM-pipeline operators had only ever executed on ≤5k docs. This harness
pushes them through the same-scale corpus with SEEDED near-duplicate
injections (so the pair sets are non-trivial) and records per-operator wall
time, shuffle read/write bytes (UI REST, stage-windowed), result sizes, the
oversized-bucket audits, and the label-propagation iteration count.

Corpus: one document per conversation (turns concatenated; same Zipf word
law as the scaling corpus), plus
  - 1% exact duplicates (verbatim copies of base docs)
  - 2% near duplicates (every 40th token of a base doc replaced)
Embeddings: dim 96 (exercises the vectorized matmul bucket path, > the
64-dim literal-plan threshold) deterministic per-id vectors, with 2%
planted near-dup vectors (base + small noise).

Scaling pairs: run once per parallelism level (separate processes — one
SparkSession per JVM), then --merge combines levels into
BENCH_OPS_SCALING.json with per-op efficiency.

Usage:
  python scripts/ops_scale.py --cores 8  --convs 300000 --out ops8.json
  python scripts/ops_scale.py --cores 32 --convs 300000 --out ops32.json
  python scripts/ops_scale.py --merge ops8.json ops32.json \
      --out BENCH_OPS_SCALING.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UI_PORT = 4059
DIM = 96


def stages_snapshot() -> list[dict]:
    url = f"http://localhost:{UI_PORT}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(url, timeout=10))
    app_id = apps[0]["id"]
    url = (
        f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    return json.load(urllib.request.urlopen(url, timeout=30))


def make_docs(spark, n_base: int):
    """(doc_id, text) with seeded exact + near duplicate injections."""
    from pyspark.sql import functions as F

    from bench import synth_transcripts_zipf

    tdf = synth_transcripts_zipf(spark, n_convs=n_base)
    base = (
        tdf.groupBy("conv_id")
        .agg(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("turn_idx", "text"))).getField("text")
            ).alias("text")
        )
        .select(
            F.substring("conv_id", 5, 9).cast("long").alias("doc_id"), "text"
        )
    )
    n_exact = n_base // 100
    n_near = n_base // 50
    exact = base.filter(F.col("doc_id") < n_exact).select(
        (F.col("doc_id") + n_base).alias("doc_id"), "text"
    )
    near = (
        base.filter(F.col("doc_id") < n_near)
        .select((F.col("doc_id") + n_base + n_exact).alias("doc_id"), "text")
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.transform(
                    F.split("text", " "),
                    lambda tok, i: F.when(
                        i % 40 == 7,
                        F.concat(F.lit("zzedit"), F.col("doc_id").cast("string")),
                    ).otherwise(tok),
                ),
            ).alias("text"),
        )
    )
    return base.unionByName(exact).unionByName(near)


def make_embeddings(spark, n_base: int):
    """(vec_id, embedding float[DIM]): deterministic per-id vectors + 2%
    planted near-dups (vec(base) + 0.03·noise)."""
    import numpy as np
    import pandas as pd

    n_near = n_base // 50

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), DIM), dtype=np.float64)
            for j, i in enumerate(ids):
                if i >= n_base:
                    b = int(i - n_base)
                    rng = np.random.default_rng(b)
                    v = rng.standard_normal(DIM)
                    v = v + np.random.default_rng(10**9 + int(i)).standard_normal(DIM) * 0.03
                else:
                    v = np.random.default_rng(int(i)).standard_normal(DIM)
                out[j] = v
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [r.astype(np.float32) for r in out]}
            )

    return (
        spark.range(n_base + n_near)
        .repartition(int(spark.sparkContext.defaultParallelism))
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
    )


def run_level(args) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"ops-scale-{args.cores}")
        .config("spark.sql.shuffle.partitions", str(max(32, 2 * args.cores)))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedStages", "3000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from similardocs_spark.operators import ann, dedup

    results: dict[str, dict] = {}
    only = set(args.ops.split(",")) if args.ops else None

    _DOC_OPS = {
        "exact_dedup_stats", "minhash_lsh_pairs", "minhash_oversized_audit",
        "deduplicate", "simhash_pairs", "simhash_oversized_audit",
        "simhash64_pairs", "simhash64_oversized_audit", "repetition_stats",
        "bigram_lm_scores", "top_ngrams_approx",
    }
    need_docs = only is None or bool(only & _DOC_OPS)
    need_emb = only is None or bool(only - _DOC_OPS)

    t0 = time.time()
    # materialize to parquet: every operator reads the same committed input
    # (and the Zipf generator lineage is not re-run per operator)
    import tempfile

    droot = tempfile.mkdtemp(prefix="ops_docs_")
    docs = n_docs = None
    if need_docs:
        docs = make_docs(spark, args.convs)
        docs.write.mode("overwrite").parquet(droot + "/docs")
        docs = spark.read.parquet(droot + "/docs")
        n_docs = docs.count()
    emb = n_emb = None
    if need_emb:
        emb = make_embeddings(spark, args.vecs or args.convs)
        emb.write.mode("overwrite").parquet(droot + "/emb")
        emb = spark.read.parquet(droot + "/emb")
        n_emb = emb.count()
    gen_sec = round(time.time() - t0, 1)

    def measured(name: str, fn):
        if only is not None and name not in only:
            return
        # per-op isolation: a prior op's persisted signature table would be
        # silently substituted by the CacheManager into any later op with
        # the same sub-plan (measured: deduplicate 140 s → 11 s when it
        # rides the minhash step's cache) — real pipelines get that reuse
        # for free, but the campaign records STANDALONE op cost
        spark.catalog.clearCache()
        pre = {s["stageId"] for s in stages_snapshot()}
        t = time.time()
        out = fn()
        wall = round(time.time() - t, 2)
        stages = [s for s in stages_snapshot() if s["stageId"] not in pre]
        results[name] = {
            "wall_sec": wall,
            "n_stages": len(stages),
            "shuffleReadMB": round(
                sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1
            ),
            "shuffleWriteMB": round(
                sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
            ),
            **out,
        }
        print(f"[{args.cores}c] {name}: {json.dumps(results[name])}", flush=True)

    measured(
        "exact_dedup_stats",
        lambda: dedup.exact_dedup_stats(docs).collect()[0].asDict(),
    )
    # planted near-dup pair ids: (doc_b - offset, doc_b) — see make_docs
    n_exact, n_near = args.convs // 100, args.convs // 50
    offset = args.convs + n_exact

    def run_minhash():
        pairs = dedup.minhash_lsh_pairs(docs, estimate_jaccard=True)
        planted = (F.col("doc_b") >= offset) & (
            F.col("doc_a") == F.col("doc_b") - offset
        )
        row = pairs.agg(
            F.count("*").alias("n_pairs"),
            F.sum(planted.cast("int")).alias("planted_found"),
            F.round(F.avg(F.when(planted, F.col("jaccard_est"))), 4).alias(
                "planted_mean_jaccard_est"
            ),
            F.round(
                F.avg(F.when(~planted, F.col("jaccard_est"))), 4
            ).alias("nonplanted_mean_jaccard_est"),
            F.sum((F.col("jaccard_est") < 0.5).cast("int")).alias(
                "n_pairs_below_est_0_5"
            ),
        ).collect()[0]
        d = row.asDict()
        d["planted_total"] = n_near
        d["recall"] = round((d["planted_found"] or 0) / n_near, 4)
        return d

    measured("minhash_lsh_pairs", run_minhash)
    measured(
        "minhash_oversized_audit",
        lambda: {
            "n_oversized_buckets": dedup.lsh_oversized_buckets(docs).count()
        },
    )

    def run_dedup():
        stats: dict = {}
        n_kept = dedup.deduplicate(docs, stats=stats).count()
        return {"n_kept": n_kept, "n_dropped": n_docs - n_kept, **stats}

    measured("deduplicate", run_dedup)

    def run_simhash():
        pairs = dedup.simhash_near_dup_pairs(docs, max_hamming=3, bits=32)
        n = pairs.count()
        return {"n_pairs": n}

    measured("simhash_pairs", run_simhash)
    measured(
        "simhash_oversized_audit",
        lambda: {
            "n_oversized_buckets": dedup.simhash_oversized_buckets(
                docs, max_hamming=3, bits=32
            ).count()
        },
    )
    # 64-bit variant: 16-bit band keys instead of 8-bit — the fix for the
    # 32-bit bucket saturation the run above surfaces at this corpus size
    measured(
        "simhash64_pairs",
        lambda: {
            "n_pairs": dedup.simhash_near_dup_pairs(
                docs, max_hamming=3, bits=64
            ).count()
        },
    )
    measured(
        "simhash64_oversized_audit",
        lambda: {
            "n_oversized_buckets": dedup.simhash_oversized_buckets(
                docs, max_hamming=3, bits=64
            ).count()
        },
    )

    def run_embed():
        pairs = ann.embedding_near_dup_pairs(
            emb, threshold=0.9, bits=14, tables=2, dim=DIM
        )
        return {"n_pairs": pairs.count()}

    measured("embedding_near_dup_pairs", run_embed)

    # ---- repetition signals over the full corpus (summary agg — the
    # per-doc frame is the product; the agg bounds the collect)
    from similardocs_spark.operators import textstats

    def run_repetition():
        row = (
            textstats.repetition_stats(docs)
            .agg(
                F.count("*").alias("n_docs"),
                F.round(F.avg("top_2gram_frac_e6")).cast("long").alias(
                    "mean_top_2gram_frac_e6"
                ),
                F.round(F.avg("top_word_frac_e6")).cast("long").alias(
                    "mean_top_word_frac_e6"
                ),
                F.max("n_lines").alias("max_n_lines"),
            )
            .collect()[0]
        )
        return row.asDict()

    measured("repetition_stats", run_repetition)

    def run_bigram_lm():
        from similardocs_spark.operators.lm import bigram_lm_scores

        row = (
            bigram_lm_scores(docs)
            .agg(
                F.count("*").alias("n_docs_scored"),
                F.sum("n_bigrams").alias("total_bigrams"),
                F.median("xent_e6").alias("median_xent_e6"),
            )
            .collect()[0]
        )
        d = row.asDict()
        d["median_xent_e6"] = int(d["median_xent_e6"])
        return d

    measured("bigram_lm_scores", run_bigram_lm)

    def run_top_approx():
        from similardocs_spark.operators.textstats import top_ngrams_approx

        rows = top_ngrams_approx(docs, n=3, k=20, p=0.05).collect()
        return {"n_rows": len(rows), "top_cnt": rows[0]["cnt"]}

    measured("top_ngrams_approx", run_top_approx)

    # ---- IVF ANN: materialize the inverted-list table partitioned by cid
    # (the 100-TB serving shape: each probe prunes to n_probe partitions at
    # scan time), then compare probe latency + recall vs the brute-force
    # full scan on the same session
    IVF_NC, IVF_NPROBE, IVF_K = 256, 16, 10
    ivf_state: dict = {}

    def run_ivf_build():
        cents = ann.ivf_centroids(emb, n_centroids=IVF_NC)
        ivf_state["cents"] = cents
        assigned = emb.withColumn(
            "cid", ann.ivf_assign_col(F.col("embedding"), cents)
        )
        assigned.write.mode("overwrite").partitionBy("cid").parquet(
            droot + "/ivf"
        )
        return {"n_centroids": IVF_NC, "n_lists_written": IVF_NC}

    measured("ivf_assign_build", run_ivf_build)

    def _probe_vec():
        # identical to make_embeddings' vector 0: the probe is a corpus
        # member whose planted near-dup (vec_id = n_base) also exists —
        # both must surface in any sane probe
        import numpy as np

        return [float(x) for x in np.random.default_rng(0).standard_normal(DIM)]

    def _ivf_lists(n_probe: int):
        import numpy as np

        cents = ivf_state["cents"]
        p = np.asarray(_probe_vec(), dtype=np.float64)
        cos = cents @ (p / np.linalg.norm(p))
        probes = sorted(range(len(cos)), key=lambda j: (-cos[j], j))[:n_probe]
        return spark.read.parquet(droot + "/ivf").filter(
            F.col("cid").isin(probes)
        )

    def make_ivf_probe(n_probe: int):
        def run():
            hits = ann.cosine_topk(
                _ivf_lists(n_probe), _probe_vec(), k=IVF_K
            ).collect()
            ivf_state[f"ids_{n_probe}"] = [r["vec_id"] for r in hits]
            return {"n_probe": n_probe, "top1": ivf_state[f"ids_{n_probe}"][0]}

        return run

    for np_level in (IVF_NPROBE, 4 * IVF_NPROBE):
        name = f"ivf_probe_topk_np{np_level}"
        measured(name, make_ivf_probe(np_level))
        if name in results:  # candidate count OUTSIDE the timed window
            results[name]["n_candidates"] = _ivf_lists(np_level).count()

    def run_full_scan():
        hits = ann.cosine_topk(emb, _probe_vec(), k=IVF_K).collect()
        exact_ids = [r["vec_id"] for r in hits]
        out = {"top1": exact_ids[0]}
        for np_level in (IVF_NPROBE, 4 * IVF_NPROBE):
            ids = ivf_state.get(f"ids_{np_level}")
            if ids is not None:
                out[f"ivf_recall_at_{IVF_K}_np{np_level}"] = round(
                    len(set(exact_ids) & set(ids)) / IVF_K, 2
                )
        # isotropic random vectors are IVF's WORST case (no cluster
        # structure: true neighbors scatter uniformly over lists) — the
        # recall numbers here are a floor, not the clustered-data figure;
        # the self vector and its planted near-dup must always be found
        assert exact_ids[0] == 0
        return out

    measured("cosine_full_scan_baseline", run_full_scan)

    out = {
        "cores": args.cores,
        "n_docs": n_docs,
        "n_embeddings": n_emb,
        "gen_sec": gen_sec,
        "ops": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE", args.out, flush=True)
    import shutil

    shutil.rmtree(droot, ignore_errors=True)
    spark.stop()


def minhash_sweep(args) -> None:
    """Band-config sweep on the seeded corpus (round-4 verdict item 2): the
    12-hash/2-band default measured 70% planted-pair recall at the 1-in-40
    edit distance. For each (n_hashes, n_bands) config record wall time,
    shuffle bytes, total pairs, planted-pair recall (the 6000 seeded
    near-dup pairs are (base_id, base_id + n_base + n_exact)), and the
    oversized-bucket audit — the recall/shuffle trade-off table that picks
    the shipped default."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"minhash-sweep-{args.cores}")
        .config("spark.sql.shuffle.partitions", str(max(32, 2 * args.cores)))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedStages", "3000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from similardocs_spark.operators import dedup

    n_base = args.convs
    n_exact, n_near = n_base // 100, n_base // 50
    offset = n_base + n_exact  # planted pair: (doc_b - offset, doc_b)

    import tempfile

    droot = tempfile.mkdtemp(prefix="mh_sweep_")
    docs = make_docs(spark, n_base)
    docs.write.mode("overwrite").parquet(droot + "/docs")
    docs = spark.read.parquet(droot + "/docs")
    n_docs = docs.count()

    configs = [tuple(int(x) for x in c.split("/")) for c in args.configs.split(",")]
    results = []
    for n_hashes, n_bands in configs:
        pre = {s["stageId"] for s in stages_snapshot()}
        t0 = time.time()
        pairs = dedup.minhash_lsh_pairs(
            docs, n_hashes=n_hashes, n_bands=n_bands
        )
        agg = pairs.agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.when(
                    (F.col("doc_b") >= offset)
                    & (F.col("doc_a") == F.col("doc_b") - offset),
                    1,
                ).otherwise(0)
            ).alias("planted_found"),
        ).collect()[0]
        wall = round(time.time() - t0, 2)
        stages = [s for s in stages_snapshot() if s["stageId"] not in pre]
        n_over = dedup.lsh_oversized_buckets(
            docs, n_hashes=n_hashes, n_bands=n_bands
        ).count()
        rec = {
            "n_hashes": n_hashes,
            "n_bands": n_bands,
            "rows_per_band": n_hashes // n_bands,
            "wall_sec": wall,
            "shuffleWriteMB": round(
                sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
            ),
            "n_pairs": int(agg["n_pairs"]),
            "planted_found": int(agg["planted_found"] or 0),
            "planted_total": n_near,
            "recall": round((agg["planted_found"] or 0) / n_near, 4),
            "extra_pairs": int(agg["n_pairs"]) - int(agg["planted_found"] or 0),
            "n_oversized_buckets": n_over,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    out = {
        "corpus": {
            "n_docs": n_docs,
            "n_base": n_base,
            "planted_near_pairs": n_near,
            "edit_distance": "1 token per 40 replaced (shingle Jaccard ~0.86)",
        },
        "cores": args.cores,
        "configs": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE", args.out, flush=True)
    import shutil

    shutil.rmtree(droot, ignore_errors=True)
    spark.stop()


def merge(args) -> None:
    levels = [json.load(open(p)) for p in args.merge]
    levels.sort(key=lambda d: d["cores"])
    lo, hi = levels[0], levels[-1]
    ratio = hi["cores"] / lo["cores"]
    ops = {}
    for name in lo["ops"]:
        a, b = lo["ops"][name], hi["ops"].get(name)
        if not b:
            continue
        speedup = round(a["wall_sec"] / b["wall_sec"], 3) if b["wall_sec"] else None
        ops[name] = {
            f"wall_sec_{lo['cores']}c": a["wall_sec"],
            f"wall_sec_{hi['cores']}c": b["wall_sec"],
            "speedup": speedup,
            "efficiency": round(speedup / ratio, 3) if speedup else None,
            "shuffleWriteMB": b["shuffleWriteMB"],
            "details": {
                k: v
                for k, v in b.items()
                if k not in ("wall_sec", "shuffleReadMB", "shuffleWriteMB", "n_stages")
            },
        }
    out = {
        "corpus": {
            "n_docs": hi["n_docs"],
            "n_embeddings": hi["n_embeddings"],
            "injections": "1% exact dups, 2% near dups (1 token per 40 edited), "
            "2% near-dup embeddings (dim 96)",
        },
        "levels": [d["cores"] for d in levels],
        "core_ratio": ratio,
        "ops": ops,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--convs", type=int, default=300_000)
    p.add_argument("--vecs", type=int, default=None,
                   help="embedding count (default: --convs); lets the IVF "
                        "level scale vectors past the doc corpus")
    p.add_argument("--merge", nargs="*", default=None)
    p.add_argument("--ops", default=None,
                   help="comma-separated op names to run (default: all)")
    p.add_argument("--minhash-sweep", action="store_true",
                   help="run the (n_hashes/n_bands) recall sweep instead")
    p.add_argument("--configs", default="12/2,18/3,16/4,24/4,24/6",
                   help="comma-separated n_hashes/n_bands configs for the sweep")
    p.add_argument("--out", default="ops_scale.json")
    args = p.parse_args()
    if args.merge:
        merge(args)
    elif args.minhash_sweep:
        minhash_sweep(args)
    else:
        run_level(args)


if __name__ == "__main__":
    main()
