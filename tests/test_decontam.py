"""Benchmark decontamination: Spark vs pure-Python recompute."""
from __future__ import annotations

import pytest

from similardocs_spark.operators.decontam import decontaminate

pytestmark = pytest.mark.usefixtures("spark")


def _py_grams(text: str, n: int) -> set[str]:
    w = [t for t in text.lower().replace("\n", " ").split(" ") if t]
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


DOCS = [
    # 0: contains the benchmark phrase verbatim mid-document
    (0, "alpha beta the quick brown fox jumps over the lazy dog tail end"),
    # 1: clean, long enough
    (1, "one two three four five six seven eight nine ten eleven twelve"),
    # 2: shorter than n tokens -> zero grams, clean by construction
    (2, "tiny doc"),
    # 3: contains the phrase TWICE (distinct-gram counting: the repeat
    #    contributes nothing beyond the distinct shingles)
    (
        3,
        "the quick brown fox jumps over the lazy dog pad pad "
        "the quick brown fox jumps over the lazy dog",
    ),
    # 4: one-token overlap only (below any n >= 2 shingle) -> clean
    (4, "fox alone in the yard sits and waits for a while longer"),
    # 5: case/newline normalization must still match
    (5, "prefix THE Quick\nBrown FOX jumps over THE lazy DOG suffix pad"),
]
BENCH = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "an entirely different benchmark prompt nobody copied here"),
]
N = 8


def _expected(min_hits: int = 1):
    bgrams = set()
    for _, t in BENCH:
        bgrams |= _py_grams(t, N)
    out = {}
    for did, t in DOCS:
        g = _py_grams(t, N)
        hits = len(g & bgrams)
        out[did] = (len(g), hits, hits >= min_hits)
    return out

def test_decontaminate_matches_python(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["bench_id", "text"])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["contaminated"])
        for r in decontaminate(docs, bench, n=N).collect()
    }
    assert got == _expected()
    # sanity on the construction itself: 0/3/5 dirty, 1/2/4 clean
    assert [got[i][2] for i in range(6)] == [True, False, False, True, False, True]


def test_decontaminate_shuffle_join_equivalent(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["bench_id", "text"])
    a = sorted(decontaminate(docs, bench, n=N, broadcast=True).collect())
    b = sorted(decontaminate(docs, bench, n=N, broadcast=False).collect())
    assert a == b


def test_decontaminate_min_hits(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BENCH, ["bench_id", "text"])
    exp = _expected(min_hits=3)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["contaminated"])
        for r in decontaminate(docs, bench, n=N, min_hits=3).collect()
    }
    assert got == exp
    # doc 0 has exactly 2 benchmark shingles in range? compute from python:
    # whatever the count, the boolean must follow the threshold
    for did, (_, hits, flag) in got.items():
        assert flag == (hits >= 3)
