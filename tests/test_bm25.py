"""BM25 spec tests — SmallFloat round-trip, idf/tfnorm, deterministic scoring."""
from __future__ import annotations

import math

import numpy as np

from similardocs_spark import bm25


def test_smallfloat_exact_below_24():
    for i in range(24):
        assert bm25.int_to_byte4(i) == i
        assert bm25.quantize_dl(i) == i


def test_smallfloat_monotone_lossy():
    prev = -1
    for i in range(0, 5000):
        q = bm25.quantize_dl(i)
        assert q <= i
        assert q >= prev  # monotone non-decreasing
        prev = q
        # round-trip is idempotent
        assert bm25.quantize_dl(q) == q
    # known 4-mantissa-bit behavior: 24 + [8..15]<<shift grid
    assert bm25.quantize_dl(24) == 24
    assert bm25.quantize_dl(39) == 39  # 39-24=15 → 4 bits → exact
    assert bm25.quantize_dl(41) == 40  # 41-24=17 → keeps top 4 bits → 16 → 40
    assert bm25.int_to_byte4(2**31 - 1) == 255


def test_smallfloat_byte_range_and_table():
    assert len(bm25.LENGTH_TABLE) == 256
    assert bm25.LENGTH_TABLE[0] == 0
    assert bm25.LENGTH_TABLE[1] == 1
    assert bm25.LENGTH_TABLE[255] == bm25.byte4_to_int(255)
    # table strictly increasing
    assert all(b > a for a, b in zip(bm25.LENGTH_TABLE, bm25.LENGTH_TABLE[1:]))


def test_quantize_np_matches_scalar():
    dl = np.arange(0, 100000, dtype=np.int64)
    got = bm25.quantize_dl_np(dl)
    exp = np.array([bm25.quantize_dl(int(x)) for x in range(0, 100000)], dtype=np.int64)
    assert np.array_equal(got, exp)


def test_idf_formula():
    v = bm25.idf(df=3, n_docs=10)
    assert math.isclose(float(v), math.log(1 + (10 - 3 + 0.5) / 3.5), rel_tol=1e-6)
    assert v.dtype == np.float32
    arr = bm25.idf_np(np.array([1, 3, 10]), 10)
    assert arr.dtype == np.float32
    assert math.isclose(float(arr[1]), float(v), rel_tol=0)


def test_tfnorm_and_doc_score():
    t = bm25.tfnorm(10, avgdl=8.0)
    assert math.isclose(float(t), 1.0 / (1.0 + 1.2 * (0.25 + 0.75 * 10 / 8.0)), rel_tol=1e-6)
    s = bm25.doc_score([np.float32(1.5), np.float32(0.5)], t, const=1.0)
    assert s.dtype == np.float32
    assert math.isclose(float(s), 1.0 + 2.0 * float(t), rel_tol=1e-6)


def test_keyword_clause_score():
    # db field: every doc has exactly one value → avgdl 1, dl 1, tf 1
    v = bm25.keyword_clause_score(df=40, n_docs=100, avgdl_fld=1.0)
    exp = math.log(1 + (100 - 40 + 0.5) / 40.5) * (1.0 / (1.0 + 1.2))
    assert math.isclose(float(v), exp, rel_tol=1e-5)
