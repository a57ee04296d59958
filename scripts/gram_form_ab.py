"""Interleaved A/B/C of the stride-1 window-hash projection forms.

The span/decontam operators' dominant cost is the row-local gram
projection. Three candidate forms, identical duplicate-detection
semantics (each assigns every n-token window one 64-bit fingerprint;
equal windows ⇒ equal fingerprints, distinct windows collide at 2^-64):

  A `zip`   — n-step zip_with concat_ws chain, then xxhash64 per gram
              (round-5 form; O(T·n²) char traffic, huge codegen tree)
  B `str`   — transform over sequence(1, T-n+1): xxhash64(array_join(
              slice(tokens, i, n))) (O(T·n) char traffic, small tree)
  C `long`  — hash each token ONCE (xxhash64 per token), then
              xxhash64(slice(token_hashes, i, n)) per window — O(T·n)
              LONG traffic, no per-window string materialisation

Protocol: one session, forms interleaved round-robin (steal hits all
arms equally), per-pass wall on a count-free full fold (sum over a
row-local xor-fold of the gram array — forces every gram, shuffles one
row). Burn probe between rounds.

Writes GRAM_FORM_AB.json.  Usage: python scripts/gram_form_ab.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ops_scale import make_docs  # noqa: E402

N = 20


def tokens(text_col):
    from pyspark.sql import functions as F

    return F.filter(
        F.split(F.lower(F.coalesce(text_col, F.lit(""))), "[ \n]+"),
        lambda x: F.length(x) > 0,
    )


def form_zip(text_col, n):
    from pyspark.sql import functions as F

    w = tokens(text_col)
    parts = [
        F.slice(w, i + 1, F.greatest(F.size(w) - (n - 1), F.lit(0)))
        for i in range(n)
    ]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat_ws(" ", a, b))
    grams = F.when(F.size(w) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    return F.transform(grams, lambda g: F.xxhash64(g))


def form_str(text_col, n):
    from pyspark.sql import functions as F

    w = tokens(text_col)
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.xxhash64(F.array_join(F.slice(w, i, n), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def form_long(text_col, n):
    from pyspark.sql import functions as F

    w = tokens(text_col)
    th = F.transform(w, lambda t: F.xxhash64(t))
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.xxhash64(F.slice(th, i, n)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def form_dbl(text_col, n):
    """Logarithmic doubling: g_{2p}(i) = g_p(i) ++ g_p(i+p); then one
    combine step per set bit of n. All operands sliced to the exact
    output length before each zip, so no null tails ever form. Hash
    values identical to the zip chain (same space-joined window
    strings)."""
    from pyspark.sql import functions as F

    w = tokens(text_col)
    T = F.size(w)

    def win(arr, span, out_len):
        # first `out_len` entries of arr (arr holds `span`-token grams)
        return F.slice(arr, 1, F.greatest(out_len, F.lit(0)))

    def shift(arr, k, out_len):
        return F.slice(arr, k + 1, F.greatest(out_len, F.lit(0)))

    # powers[p] = stride-1 p-token gram strings, length T - p + 1
    pows = {1: w}
    p = 1
    while p * 2 <= n:
        prev = pows[p]
        out_len = T - (2 * p) + 1
        pows[2 * p] = F.zip_with(
            win(prev, p, out_len),
            shift(prev, p, out_len),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        p *= 2
    # combine set bits of n, high to low
    bits = [1 << b for b in range(n.bit_length()) if n & (1 << b)]
    bits.sort(reverse=True)
    L = T - n + 1
    acc = win(pows[bits[0]], bits[0], L)
    off = bits[0]
    for b in bits[1:]:
        acc = F.zip_with(
            acc,
            shift(pows[b], off, L),
            lambda a, bb: F.concat_ws(" ", a, bb),
        )
        off += b
    grams = F.when(T >= n, acc).otherwise(F.array().cast("array<string>"))
    return F.transform(grams, lambda g: F.xxhash64(g))


FORMS = {"zip": form_zip, "dbl": form_dbl, "str": form_str, "long": form_long}


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="GRAM_FORM_AB.json")
    ap.add_argument("--forms", default=",".join(FORMS))
    args = ap.parse_args()
    forms = {k: FORMS[k] for k in args.forms.split(",")}

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName("gram-form-ab")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    droot = tempfile.mkdtemp(prefix="gram_ab_")
    make_docs(spark, args.n).write.mode("overwrite").parquet(droot)
    docs = spark.read.parquet(droot)
    n_docs = docs.count()

    def run(form_fn):
        grams = form_fn(F.col("text"), N)
        fold = F.aggregate(
            grams, F.lit(0).cast("long"), lambda acc, h: acc.bitwiseXOR(h)
        ) % F.lit(1_000_000_007)
        t0 = time.time()
        row = docs.select(
            F.count("*").alias("c"),
            F.sum(fold).alias("s"),
            F.sum(F.size(grams)).alias("g"),
        ).collect()[0]
        return time.time() - t0, int(row["g"])

    def burn():
        t0 = time.time()
        spark.range(0, 200_000_000, 1, 64).select(
            F.sum(F.xxhash64("id") % F.lit(1_000_000_007))
        ).collect()
        return time.time() - t0

    out = {
        "protocol": "interleaved round-robin, one session, xor-fold "
        "full-projection probe; burn probe per round",
        "cores": args.cores,
        "n_docs": n_docs,
        "n_gram": N,
        "rounds": {k: [] for k in forms},
        "burn": [],
    }
    # warm-up pass (parquet cache, codegen) not recorded
    for k, fn in forms.items():
        run(fn)
    for r in range(args.rounds):
        out["burn"].append(round(burn(), 2))
        for k, fn in forms.items():
            wall, g = run(fn)
            out["rounds"][k].append(round(wall, 2))
            print(f"round {r} {k}: {wall:.2f}s grams={g}", flush=True)
    out["median"] = {
        k: sorted(v)[len(v) // 2] for k, v in out["rounds"].items()
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["median"]))
    spark.stop()


if __name__ == "__main__":
    main()
