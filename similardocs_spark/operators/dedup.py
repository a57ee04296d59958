"""Deduplication operators for training-data pipelines.

All hashing is built on md5 (identical across Spark, DuckDB and Python's
hashlib), so every operator here is cross-engine deterministic:

- exact_dedup .......... hash-groupBy on full text
- minhash_lsh .......... token-shingle minhash (lexicographic min of seeded
                         md5's — a valid uniform min-hash), banded into LSH
                         buckets, bucket-join for candidate pairs
- simhash .............. 32-bit simhash from md5-derived token bits
- ngram_jaccard ........ exact token-3-shingle Jaccard for candidate scoring

At 100 TB the shapes matter: exact dedup is one hash-groupBy shuffle;
minhash banding turns the O(n²) pair problem into groupBy(band, key) with
bounded bucket sizes; the pair join happens only WITHIN buckets.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenize import tokenize as tokenize_udf

N_HASHES = 12
N_BANDS = 2  # 6 rows per band (strict buckets)


def exact_dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by full-text hash: one hash-groupBy shuffle."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("group_size"), F.min("doc_id").alias("keeper"))
        .agg(
            F.count("*").alias("n_groups"),
            F.sum("group_size").alias("n_docs"),
            (F.sum("group_size") - F.count("*")).alias("n_dups"),
            F.max("group_size").alias("max_group"),
        )
    )


def _minhash_cols(n: int = N_HASHES):
    """minhash_i = min over tokens of md5(i || '|' || token) (hex string min)."""
    return [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("term")))).alias(f"mh{i}")
        for i in range(n)
    ]


def shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle): DISTINCT 3-token shingles in token order."""
    toks = docs.select("doc_id", tokenize_udf(F.col(text_col)).alias("toks"))
    return toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 3,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 3),
                    lambda i: F.concat_ws(" ", F.slice("toks", i + 1, 3)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("shingle"),
    ).distinct()


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Signatures over 3-token shingles (distinctive; single tokens collide
    too often after prefix-6 truncation)."""
    sh = shingles(docs, text_col).withColumnRenamed("shingle", "term")
    return sh.groupBy("doc_id").agg(*_minhash_cols())


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any LSH band bucket.
    Band key = concat of the band's minhashes; pairs joined only within
    buckets (the scale-critical property)."""
    sig = minhash_signatures(docs, text_col)
    rows_per_band = N_HASHES // N_BANDS
    bands = []
    for b in range(N_BANDS):
        cols = [F.col(f"mh{b * rows_per_band + j}") for j in range(rows_per_band)]
        bands.append(
            sig.select(
                "doc_id", F.lit(b).alias("band"), F.concat_ws("_", *cols).alias("key")
            )
        )
    all_bands = bands[0]
    for x in bands[1:]:
        all_bands = all_bands.unionByName(x)
    a, b_ = all_bands.alias("a"), all_bands.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def simhash32(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """32-bit simhash: bit j set iff Σ_tokens (bit_j(md5(token)) ? +1 : -1) > 0.
    Bits come from the first 8 hex digits of the token md5."""
    toks = docs.select(
        "doc_id", F.explode(tokenize_udf(F.col(text_col))).alias("term")
    ).withColumn("h", F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(32)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sh = None
    for j in range(32):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sh = bit if sh is None else sh + bit
    return agg.select("doc_id", sh.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame, probe_ids: list[int], threshold: float = 0.2,
    text_col: str = "text",
) -> DataFrame:
    """Exact token-3-shingle Jaccard between probe docs and the corpus.
    Shingle = 3 consecutive tokens joined; broadcast the probe side."""
    toks = docs.select("doc_id", tokenize_udf(F.col(text_col)).alias("toks"))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 3,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 3),
                    lambda i: F.concat_ws(" ", F.slice("toks", i + 1, 3)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("shingle"),
    ).distinct()
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    probe = sh.filter(F.col("doc_id").isin(probe_ids)).withColumnRenamed(
        "doc_id", "probe_id"
    )
    inter = (
        F.broadcast(probe)
        .join(sh, "shingle")
        .filter(F.col("probe_id") < F.col("doc_id"))
        .groupBy("probe_id", "doc_id")
        .agg(F.count("*").alias("inter"))
    )
    pc = counts.withColumnRenamed("doc_id", "probe_id").withColumnRenamed("n", "n_probe")
    out = (
        inter.join(F.broadcast(pc), "probe_id")
        .join(counts, "doc_id")
        .withColumn(
            "jaccard_e6",
            F.round(
                F.col("inter") * 1e6 / (F.col("n_probe") + F.col("n") - F.col("inter"))
            ).cast("long"),
        )
        .filter(F.col("jaccard_e6") >= int(threshold * 1e6))
        .select("probe_id", "doc_id", "jaccard_e6")
    )
    return out
