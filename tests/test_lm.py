"""Bigram-LM perplexity scores vs pure-Python recompute."""
from __future__ import annotations

import math
from collections import Counter

import pytest

from similardocs_spark.operators.lm import bigram_lm_scores

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the cat"),
    (2, "gibberish zork blat the"),
    (3, "single"),
    (4, ""),
    (5, None),
    (6, "a\nb  c a b"),
]


def _toks(t):
    return [x for x in (t or "").lower().replace("\n", " ").split(" ") if x]


def _py_scores(score_docs, lm_docs):
    uni, big = Counter(), Counter()
    for _, t in lm_docs:
        w = _toks(t)
        uni.update(w)
        big.update(zip(w, w[1:]))
    V = len(uni)
    out = {}
    for i, t in score_docs:
        w = _toks(t)
        bs = list(zip(w, w[1:]))
        nll = sum(
            int(round((math.log2(uni.get(a, 0) + V) - math.log2(big.get((a, b), 0) + 1)) * 1e6))
            for a, b in bs
        )
        n = len(bs)
        # Spark/DuckDB ROUND is HALF_UP; Python round() is banker's —
        # exact integer half-up for positive sums:
        out[i] = (n, nll, (2 * nll + n) // (2 * n) if n else None)
    return out


def test_self_lm_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_e6"], r["xent_e6"])
        for r in bigram_lm_scores(df).collect()
    }
    assert got == _py_scores(DOCS, DOCS)


def test_reference_lm_oov_smoothing(spark):
    # LM corpus shares no vocabulary with the scored docs: every bigram
    # smooths to (0+1)/(0+V) and every doc gets the same per-bigram nll
    ref = [(100, "ref words only here"), (101, "ref words again")]
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    lm = spark.createDataFrame(ref, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll_e6"], r["xent_e6"])
        for r in bigram_lm_scores(df, lm_docs=lm).collect()
    }
    assert got == _py_scores(DOCS, ref)


def test_gibberish_scores_higher_than_boilerplate(spark):
    # 50 identical template docs + 1 unique-token doc: self-LM must give
    # the template a strictly lower cross-entropy than the one-off
    rows = [(i, "this exact template repeats verbatim") for i in range(50)]
    rows.append((99, "qwerty zxcvb plmokn ijnuhb"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    xent = {r["doc_id"]: r["xent_e6"] for r in bigram_lm_scores(df).collect()}
    assert xent[0] < xent[99]


def test_partitioning_independent(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(tuple(r) for r in bigram_lm_scores(df).collect())
    b = sorted(
        tuple(r) for r in bigram_lm_scores(df.repartition(7)).collect()
    )
    assert a == b


def _py_trigram(score_docs, lm_docs, alpha=0.4):
    u, b, t3 = Counter(), Counter(), Counter()
    T = 0
    for _, t in lm_docs:
        w = _toks(t)
        T += len(w)
        u.update(w)
        b.update(zip(w, w[1:]))
        t3.update(zip(w, w[1:], w[2:]))
    V = len(u)
    la = math.log2(1 / alpha)
    out = {}
    for i, t in score_docs:
        w = _toks(t)
        terms = []
        for k in range(2, len(w)):
            tri = (w[k - 2], w[k - 1], w[k])
            bi = (w[k - 1], w[k])
            if t3.get(tri, 0) > 0:
                nll = math.log2(b[(w[k - 2], w[k - 1])]) - math.log2(t3[tri])
            elif b.get(bi, 0) > 0:
                nll = la + math.log2(u[w[k - 1]]) - math.log2(b[bi])
            else:
                nll = 2 * la + math.log2(T + V) - math.log2(u.get(w[k], 0) + 1)
            terms.append(int(round(nll * 1e6)))
        n, s = len(terms), sum(terms)
        out[i] = (n, s, (2 * s + n) // (2 * n) if n else None)
    return out


def test_trigram_backoff_self_matches_python(spark):
    from similardocs_spark.operators.lm import trigram_backoff_scores

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_terms"], r["nll_e6"], r["xent_e6"])
        for r in trigram_backoff_scores(df).collect()
    }
    assert got == _py_trigram(DOCS, DOCS)


def test_trigram_backoff_all_branches_vs_reference_lm(spark):
    # REF shares some bigrams/unigrams with DOCS but not all trigrams,
    # so the scored stream hits the trigram, bigram-backoff, AND
    # unigram-backoff (incl. OOV add-one) branches
    from similardocs_spark.operators.lm import trigram_backoff_scores

    ref = [
        (100, "the cat sat quietly"),
        (101, "on the mat again"),
        (102, "zork is strange"),
    ]
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    lm = spark.createDataFrame(ref, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_terms"], r["nll_e6"], r["xent_e6"])
        for r in trigram_backoff_scores(df, lm_docs=lm).collect()
    }
    assert got == _py_trigram(DOCS, ref)


def test_trigram_backoff_bad_alpha(spark):
    from similardocs_spark.operators.lm import trigram_backoff_scores

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for bad in (0.0, 1.0, -0.1):
        with pytest.raises(ValueError):
            trigram_backoff_scores(df, alpha=bad)
