"""top_ngrams + mixture_summary at corpus scale (309k seeded docs).

top_ngrams is the EXACT corpus-wide heavy-hitter count: every distinct
gram's global count must exist somewhere, so one exchange of the hashed
gram stream is the information-theoretic floor — the plan's job is to
make those rows as narrow as possible (bare longs) and combine map-side.
On a Zipf corpus trigrams are nearly unique (top count ~8 at 309k), so
map-side combine cannot shrink the stream much and the measured shuffle
IS that floor. mixture_summary must stay ~zero-shuffle (stratum
cardinality rows only).

Writes CORPUS_OPS_SCALE.json.
Usage: python scripts/corpus_ops_scale.py --cores 32 --n 300000
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--out", default="CORPUS_OPS_SCALE.json")
    ap.add_argument(
        "--only",
        default=None,
        help="comma list of measurement names to run; others skipped and "
        "the output MERGES into an existing --out instead of replacing it",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"corpus-ops-scale-{args.cores}")
        .config("spark.sql.shuffle.partitions", str(max(32, 2 * args.cores)))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedStages", "3000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from similardocs_spark.operators.textstats import (
        mixture_summary,
        top_ngrams,
    )

    import tempfile

    droot = tempfile.mkdtemp(prefix="corpus_ops_")
    make_docs(spark, args.n).write.mode("overwrite").parquet(droot + "/docs")
    docs = (
        spark.read.parquet(droot + "/docs")
        .withColumn("lang", (F.col("doc_id") % 3).cast("string"))
        .withColumn("source", (F.col("doc_id") % 7).cast("string"))
    )
    out: dict = {
        "protocol": "309k seeded corpus; wall + stage-windowed shuffle",
        "cores": args.cores,
        "n_docs": docs.count(),
    }

    only = set(args.only.split(",")) if args.only else None

    def measured(name: str, fn):
        if only is not None and name not in only:
            return
        spark.catalog.clearCache()
        pre = {s["stageId"] for s in stages_snapshot()}
        t = time.time()
        extra = fn() or {}
        wall = round(time.time() - t, 2)
        stages = [s for s in stages_snapshot() if s["stageId"] not in pre]
        out[name] = {
            "wall_sec": wall,
            "n_stages": len(stages),
            "shuffleReadMB": round(
                sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1
            ),
            "shuffleWriteMB": round(
                sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
            ),
            **extra,
        }
        print(json.dumps({name: out[name]}), flush=True)

    exact_top: list = []

    def run_top():
        rows = top_ngrams(docs, n=3, k=20).collect()
        exact_top[:] = [(r["gram"], r["cnt"]) for r in rows]
        return {
            "n_rows": len(rows),
            "top_gram": rows[0]["gram"],
            "top_cnt": rows[0]["cnt"],
        }

    def run_mixture():
        rows = mixture_summary(docs).collect()
        share = sum(r["token_share_e6"] for r in rows)
        return {"n_strata": len(rows), "share_sum_e6": share}

    measured("top_ngrams_k20_n3", run_top)

    def run_top_approx():
        from similardocs_spark.operators.textstats import top_ngrams_approx

        rows = top_ngrams_approx(docs, n=3, k=20, p=0.05).collect()
        got = [(r["gram"], r["cnt"]) for r in rows]
        overlap = len(set(got) & set(exact_top))
        return {
            "n_rows": len(rows),
            "top_gram": rows[0]["gram"],
            "top_cnt": rows[0]["cnt"],
            "rows_matching_exact_top20": overlap,
            "equals_exact": got == exact_top,
        }

    measured("top_ngrams_approx_p05", run_top_approx)

    # The raw Zipf corpus has NO heavy hitters (top trigram count 8 at
    # 309k — expected sampled occurrences 0.4 at p=0.05), so the sampled
    # pass correctly finds nothing there; the operator's regime is
    # boilerplate discovery. Plant 20 boilerplate trigrams with counts
    # 6180 down to 309 (all >> the count-8 noise floor; the rarest
    # expects ~15 sampled occurrences) and require exact recovery.
    m = F.col("doc_id") % 1000
    j = (m / 40).cast("int")
    planted = docs.withColumn(
        "text",
        F.when(
            (j < 20) & ((m - j * 40) < (20 - j)),
            F.concat(
                F.col("text"),
                F.lit(" plantedboilera"),
                j.cast("string"),
                F.lit(" plantedboilerb"),
                j.cast("string"),
                F.lit(" plantedboilerc"),
                j.cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    planted_exact: list = []

    def run_top_planted_exact():
        rows = top_ngrams(planted, n=3, k=20).collect()
        planted_exact[:] = [(r["gram"], r["cnt"]) for r in rows]
        n_plants = sum(
            1 for g, _ in planted_exact if g.startswith("plantedboilera")
        )
        return {
            "n_rows": len(rows),
            "top_cnt": rows[0]["cnt"],
            "kth_cnt": rows[-1]["cnt"],
            "plants_in_top20": n_plants,
        }

    def run_top_planted_approx():
        from similardocs_spark.operators.textstats import top_ngrams_approx

        rows = top_ngrams_approx(planted, n=3, k=20, p=0.05).collect()
        got = [(r["gram"], r["cnt"]) for r in rows]
        return {
            "n_rows": len(rows),
            "rows_matching_exact_top20": len(set(got) & set(planted_exact)),
            "equals_exact": got == planted_exact,
        }

    measured("top_ngrams_planted_exact", run_top_planted_exact)
    measured("top_ngrams_planted_approx_p05", run_top_planted_approx)

    lm_scores_mat: list = []

    def run_lm():
        from similardocs_spark.operators.lm import bigram_lm_scores

        # measured: the scoring pass itself, materialized once
        sc = bigram_lm_scores(docs).localCheckpoint()
        lm_scores_mat.append(sc)
        agg = sc.agg(
            F.count("*").alias("n"), F.sum("n_bigrams").alias("nb")
        ).collect()[0]
        return {"n_docs_scored": agg["n"], "total_bigrams": agg["nb"]}

    measured("bigram_lm_scores", run_lm)

    if lm_scores_mat:
        # attestations OUTSIDE the measured window (they read the 309k-row
        # materialized scores, not the corpus): exact-duplicate docs must
        # score identically to their sources
        sc = lm_scores_mat[0]
        med = sc.agg(F.median("xent_e6")).collect()[0][0]
        mism = (
            sc.filter(F.col("doc_id") >= args.n)
            .filter(F.col("doc_id") < args.n + args.n // 100)
            .alias("d")
            .join(
                sc.alias("s"),
                F.col("d.doc_id") - args.n == F.col("s.doc_id"),
            )
            .agg(
                F.sum(
                    (F.col("d.xent_e6") != F.col("s.xent_e6")).cast("long")
                ).alias("m")
            )
            .collect()[0]["m"]
        )
        out["bigram_lm_scores"]["median_xent_e6"] = int(med)
        out["bigram_lm_scores"]["exact_twin_score_mismatches"] = mism
        print(json.dumps({"bigram_lm_scores": out["bigram_lm_scores"]}), flush=True)

    def run_lm_trigram():
        from similardocs_spark.operators.lm import trigram_backoff_scores

        sc = trigram_backoff_scores(docs).localCheckpoint()
        agg = sc.agg(
            F.count("*").alias("n"),
            F.sum("n_terms").alias("nt"),
            F.median("xent_e6").alias("med"),
        ).collect()[0]
        return {
            "n_docs_scored": agg["n"],
            "total_terms": agg["nt"],
            "median_xent_e6": int(agg["med"]),
        }

    measured("trigram_backoff_scores", run_lm_trigram)
    measured("mixture_summary", run_mixture)

    from similardocs_spark.operators.packing import pack_sequences
    from similardocs_spark.operators.privacy import pii_stats

    def run_pii():
        rows = (
            pii_stats(docs)
            .agg(
                F.sum("n_email").alias("e"),
                F.sum(F.col("has_pii").cast("long")).alias("h"),
            )
            .collect()[0]
        )
        return {"n_emails": rows["e"], "n_docs_with_pii": rows["h"]}

    measured("pii_stats", run_pii)

    # packing over 30M synthetic (id, tokens) rows — the prefix-sum input
    # is narrow, so scale the ROW count well past the doc corpus to make
    # the range exchange visible
    n_pack = 30_000_000
    tc = spark.range(n_pack).select(
        F.col("id").alias("doc_id"), (F.col("id") % 997).alias("tokens")
    )

    def run_packing():
        packed = pack_sequences(tc, seq_len=2048)
        agg = packed.agg(
            F.count("*").alias("n"),
            F.max(F.col("start_tok") + F.lit(0)).alias("max_start"),
            F.max("seq_last").alias("max_seq"),
        ).collect()[0]
        # contiguity attestation: total tokens == sum of inputs exactly
        total = tc.agg(F.sum("tokens")).collect()[0][0]
        last = packed.orderBy(F.desc("start_tok")).limit(1).collect()[0]
        assert last["start_tok"] + (n_pack - 1) % 997 == total, "gap!"
        return {
            "n_rows": agg["n"],
            "n_sequences": agg["max_seq"] + 1,
            "stream_total_tokens": total,
        }

    measured("packing_30M_rows", run_packing)

    def run_shuffle_order():
        from similardocs_spark.operators.sampling import shuffle_order

        # same 30M-row stream as packing: shuffle_order is the step
        # BEFORE pack_sequences in a real pipeline (reproducible epoch
        # order), so measure it on the identical input. Attest it's a
        # permutation without a second global sort: sum and min/max of a
        # 0..n-1 permutation are fixed.
        ords = shuffle_order(tc, seed=42)
        agg = ords.agg(
            F.count("*").alias("n"),
            F.sum("ord").alias("s"),
            F.min("ord").alias("lo"),
            F.max("ord").alias("hi"),
        ).collect()[0]
        n = agg["n"]
        return {
            "n_rows": n,
            "is_permutation": (
                agg["lo"] == 0
                and agg["hi"] == n - 1
                and agg["s"] == n * (n - 1) // 2
            ),
        }

    measured("shuffle_order_30M_rows", run_shuffle_order)

    def run_shuffled_packing():
        from similardocs_spark.operators.packing import pack_sequences
        from similardocs_spark.operators.sampling import shuffle_order

        # the composed pipeline step: pack the SHUFFLED stream (ordinal
        # becomes the packing order). Attest the concatenation is
        # gap-free: the max (start_tok + its doc's tokens) must equal
        # the exact total token count.
        ords = shuffle_order(tc, seed=42)
        stream = tc.join(ords, "doc_id").select(
            F.col("ord").alias("doc_id"), "tokens"
        )
        packed = pack_sequences(stream, seq_len=2048)
        joined = packed.join(
            stream.withColumnRenamed("tokens", "_t"), "doc_id"
        )
        agg = joined.agg(
            F.count("*").alias("n"),
            F.max(F.col("start_tok") + F.col("_t")).alias("end"),
            F.max("seq_last").alias("max_seq"),
        ).collect()[0]
        total = tc.agg(F.sum("tokens")).collect()[0][0]
        return {
            "n_rows": agg["n"],
            "n_sequences": agg["max_seq"] + 1,
            "stream_total_tokens": total,
            "gap_free": agg["end"] == total,
        }

    measured("shuffled_packing_30M_rows", run_shuffled_packing)

    # duplicate spans: the seeded corpus plants n/100 exact copies (full
    # coverage by construction) and n/50 near copies (1-in-40 tokens
    # edited -> 39-token clean runs, each a guaranteed >= 20-token dup
    # span), so the attestations are exact. Both strategies measured:
    # broadcast shuffles bare gram longs but computes the window zip-chain
    # twice; shuffle-join shuffles (doc_id, pos, h) rows once and lets
    # ReusedExchange share the single exchange between the frequency agg
    # and the attribution probe.
    from similardocs_spark.operators.spandedup import duplicate_spans

    n_exact = args.n // 100

    def run_dup_spans(broadcast: bool):
        def f():
            agg = (
                duplicate_spans(docs, n=20, broadcast=broadcast)
                .agg(
                    F.count("*").alias("n"),
                    F.sum((F.col("n_dup_windows") > 0).cast("long")).alias(
                        "flagged"
                    ),
                    F.sum(
                        (F.col("dup_token_frac_e6") == 1_000_000).cast("long")
                    ).alias("full_cov"),
                    F.sum("dup_tokens").alias("dup_toks"),
                    F.sum("n_tokens").alias("toks"),
                )
                .collect()[0]
            )
            assert agg["full_cov"] >= 2 * n_exact, (
                f"exact twins must be fully covered: {agg['full_cov']}"
            )
            return {
                "n_docs_flagged": agg["flagged"],
                "n_docs_full_coverage": agg["full_cov"],
                "dup_token_frac": round(agg["dup_toks"] / agg["toks"], 4),
            }

        return f

    measured("dup_spans_n20_broadcast", run_dup_spans(True))
    measured("dup_spans_n20_shuffle", run_dup_spans(False))

    # the removal ACTION, then the convergence attestation: after keeping
    # exactly one canonical copy of every duplicated span, a re-detect
    # over the stripped corpus must find (near-)zero duplicated windows —
    # "near" because token removal can create new accidental adjacencies.
    from similardocs_spark.operators.spandedup import strip_duplicate_spans

    strip_dir = droot + "/stripped"

    def run_strip():
        stripped = strip_duplicate_spans(docs, n=20)
        stripped.write.mode("overwrite").parquet(strip_dir)
        agg = (
            spark.read.parquet(strip_dir)
            .agg(
                F.sum((F.col("n_dropped_tokens") > 0).cast("long")).alias(
                    "docs_stripped"
                ),
                F.sum("n_dropped_tokens").alias("toks_dropped"),
            )
            .collect()[0]
        )
        return {
            "n_docs_stripped": agg["docs_stripped"],
            "n_tokens_dropped": agg["toks_dropped"],
        }

    measured("strip_spans_n20", run_strip)

    # sessionization over 30M synthetic events with 2000x user skew
    # (quadratic bucketing: user u owns 2u+1 of every 1M-event block, so
    # user 999 has ~60k events vs user 0's 30) — the per-user window is a
    # LINEAR scan after the one exchange, so a power user costs its row
    # count, not its square. The user's k-th event is ROW-LOCAL
    # arithmetic (no generator window polluting the measured plan):
    # events 120 s apart with every 50th gap widened to 3600 s, so every
    # complete session has exactly 50 events — attested.
    from similardocs_spark.operators.sessions import sessionize

    n_ev = 30_000_000

    def run_sessionize():
        M = 1_000_000
        m = F.col("id") % M
        u = F.floor(F.sqrt(m.cast("double")))
        k = (F.col("id") - m) / M * (2 * u + 1) + (m - u * u)
        ev = spark.range(n_ev).select(
            F.col("id").alias("event_id"),
            u.alias("user_id"),
            F.timestamp_seconds(
                (k * 120).cast("long")
                + F.floor(k / 50) * 3600
            ).alias("ts"),
        )
        sess = sessionize(ev, gap_minutes=30)
        agg = sess.agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_sess_events"),
        ).collect()[0]
        assert agg["n_events"] == n_ev
        # every complete block of 50 events is one session (gap 3600 >
        # 30 min splits; within-block 120 s extends)
        assert agg["max_sess_events"] == 50
        return {
            "n_sessions": agg["n_sessions"],
            "n_events": agg["n_events"],
            "max_session_events": agg["max_sess_events"],
        }

    measured("sessionize_30M_events", run_sessionize)

    def run_redetect():
        agg = (
            duplicate_spans(spark.read.parquet(strip_dir), n=20)
            .agg(
                F.sum("n_dup_windows").alias("dup_w"),
                F.sum("n_windows").alias("w"),
            )
            .collect()[0]
        )
        residual = agg["dup_w"] / max(agg["w"], 1)
        assert residual < 0.001, f"strip did not converge: {residual}"
        return {
            "residual_dup_windows": agg["dup_w"],
            "total_windows": agg["w"],
        }

    measured("post_strip_redetect", run_redetect)

    if only is not None and os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
        merged.update({k: v for k, v in out.items() if k in only})
        out = merged
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
