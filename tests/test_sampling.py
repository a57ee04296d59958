"""Deterministic sampling: membership vs python md5 recompute, nesting,
partitioning-invariance."""
from __future__ import annotations

import hashlib

import pytest

from similardocs_spark.operators.sampling import sample_hash, sample_stratified

pytestmark = pytest.mark.usefixtures("spark")

N = 2000


def _u32(key, seed=42):
    return int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:8], 16)


def _docs(spark):
    rows = [(i, ["web", "book", "chat"][i % 3]) for i in range(N)]
    return spark.createDataFrame(rows, ["doc_id", "source"]).repartition(7)


def test_sample_hash_matches_python_and_rate(spark):
    docs = _docs(spark)
    for rate in (0.1, 0.5):
        exp = {i for i in range(N) if _u32(i) < round(rate * 2**32)}
        got = {r["doc_id"] for r in sample_hash(docs, rate).collect()}
        assert got == exp
        assert abs(len(got) / N - rate) < 0.05  # binomial sanity


def test_sample_hash_nested_and_partition_invariant(spark):
    docs = _docs(spark)
    s10 = {r["doc_id"] for r in sample_hash(docs, 0.1).collect()}
    s50 = {r["doc_id"] for r in sample_hash(docs, 0.5).collect()}
    assert s10 <= s50  # raising the rate only adds rows
    again = {
        r["doc_id"] for r in sample_hash(docs.repartition(2), 0.1).collect()
    }
    assert again == s10


def test_sample_stratified_matches_python(spark):
    docs = _docs(spark)
    rates = {"web": 0.25, "book": 0.75}
    exp = set()
    for i in range(N):
        src = ["web", "book", "chat"][i % 3]
        r = rates.get(src, 0.0)
        if _u32(i) < round(r * 2**32):
            exp.add(i)
    got = {
        r["doc_id"]
        for r in sample_stratified(docs, rates, by="source").collect()
    }
    assert got == exp
    # chat stratum fully dropped at default_rate=0
    assert not any(i % 3 == 2 for i in got)


def test_sample_rejects_bad_rate(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        sample_hash(docs, 1.5)
    with pytest.raises(ValueError):
        sample_stratified(docs, {"web": -0.1})


def test_shuffle_order_matches_python_and_is_stable(spark):
    import hashlib

    from similardocs_spark.operators.sampling import shuffle_order

    def u32(seed, k):
        return int(hashlib.md5(f"{seed}|{k}".encode()).hexdigest()[:8], 16)

    ids = list(range(500))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    exp = {i: r for r, (_, i) in enumerate(sorted((u32(42, i), i) for i in ids))}
    got = {r["doc_id"]: r["ord"] for r in shuffle_order(df).collect()}
    assert got == exp
    # partitioning-independent, and a true permutation
    got2 = {
        r["doc_id"]: r["ord"]
        for r in shuffle_order(df.repartition(13)).collect()
    }
    assert got2 == exp
    assert sorted(got.values()) == list(range(500))


def test_shuffle_order_epoch_seed(spark):
    from similardocs_spark.operators.sampling import shuffle_order

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r["doc_id"]: r["ord"] for r in shuffle_order(df, seed=1).collect()}
    b = {r["doc_id"]: r["ord"] for r in shuffle_order(df, seed=2).collect()}
    assert a != b
    assert sorted(a.values()) == sorted(b.values()) == list(range(200))
