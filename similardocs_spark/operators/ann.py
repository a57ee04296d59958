"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact baseline — JVM-side `aggregate`/`zip_with`
  dot products (no Python in the loop), distributed TakeOrdered top-k.
- lsh_cosine_topk: the scale path — random-hyperplane LSH (deterministic,
  seeded) buckets candidates so each probe only scores its bucket ∪ probe
  neighborhood; exactness traded for a bounded candidate set. At 100 TB the
  brute force is a full scan per probe; the LSH variant prunes to
  |bucket| ≈ n / 2^bits with multi-probe fallback.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame, probe_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of one probe vector against the corpus."""
    probe = F.array(*[F.lit(float(x)) for x in probe_vec])
    pnorm = float(np.sqrt(np.sum(np.asarray(probe_vec, dtype=np.float64) ** 2)))
    return (
        embeddings.withColumn(
            "cosine",
            _dot(F.col(vec_col), probe) / (_norm(F.col(vec_col)) * F.lit(pnorm)),
        )
        .select(id_col, F.round(F.col("cosine") * 1e6).cast("long").alias("cosine_e6"))
        .orderBy(F.desc("cosine_e6"), F.asc(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, bits: int = 8, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Bucket id = sign bits against the seeded hyperplanes (JVM-side)."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        proj = _dot(vec_col, F.array(*[F.lit(float(x)) for x in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_cosine_topk(
    embeddings: DataFrame, probe_vec: list[float], k: int = 10, bits: int = 6,
    seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: score only vectors whose LSH bucket is within
    Hamming distance 1 of the probe's bucket (multi-probe)."""
    dim = len(probe_vec)
    planes = hyperplanes(dim, bits, seed)
    signs = planes @ np.asarray(probe_vec, dtype=np.float64)
    pbucket = sum((1 << j) for j, s in enumerate(signs) if s > 0)
    probes = [pbucket] + [pbucket ^ (1 << j) for j in range(bits)]
    cand = embeddings.withColumn("bucket", lsh_bucket_col(F.col(vec_col), planes)).filter(
        F.col("bucket").isin(probes)
    )
    return cosine_topk(cand, probe_vec, k, id_col, vec_col)
