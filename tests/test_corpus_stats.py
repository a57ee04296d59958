"""Corpus-level top-k n-grams and mixture summary vs pure-Python recompute."""
from __future__ import annotations

from collections import Counter

import pytest

from similardocs_spark.operators.textstats import mixture_summary, top_ngrams

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "en", "web", "the cat sat on the mat and the cat sat again"),
    (1, "en", "web", "the cat sat on a hat while the cat sat still"),
    (2, "en", "book", "a dog ran far away from the cat sat crowd"),
    (3, "es", "web", "el gato gris el gato gris el gato gris"),
    (4, "en", "book", "tiny"),  # shorter than n -> contributes nothing
    (5, "en", "web", "the cat sat on the mat and the cat sat again"),  # dup doc
]


def _py_grams(text: str, n: int) -> list[str]:
    w = [t for t in text.lower().split(" ") if t]
    return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]


def _expected_top(n: int, k: int):
    c = Counter()
    for _, _, _, t in DOCS:
        c.update(_py_grams(t, n))
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_top_ngrams_matches_python(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, _, _, t in DOCS], ["doc_id", "text"]
    )
    for n, k in [(3, 5), (2, 7), (1, 4)]:
        got = [(r["gram"], r["cnt"]) for r in top_ngrams(docs, n=n, k=k).collect()]
        assert got == _expected_top(n, k), (n, k)


def test_top_ngrams_ties_at_boundary_deterministic(spark):
    # every trigram in doc 3 repeats 2x except overlaps; force a tie cut and
    # check the gram-ASC tiebreak picks the lexicographically first ones
    docs = spark.createDataFrame(
        [(i, t) for i, _, _, t in DOCS], ["doc_id", "text"]
    )
    k = 3
    got = [(r["gram"], r["cnt"]) for r in top_ngrams(docs, n=3, k=k).collect()]
    assert got == _expected_top(3, k)


def test_top_ngrams_empty_corpus(spark):
    docs = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    assert top_ngrams(docs, n=3, k=5).collect() == []


def test_top_ngrams_approx_recovers_exact_top_k(spark):
    # a corpus with unambiguous heavy hitters: at p=1.0 the sampled pass
    # IS the exact pass, so the result must equal top_ngrams verbatim;
    # at p=0.5 with a 4x candidate cushion the planted hitters (hundreds
    # of occurrences) must still all surface with EXACT counts.
    from similardocs_spark.operators.textstats import top_ngrams_approx

    # five planted trigram hitters with distinct counts (300, 270, ... 180)
    # far above the singleton noise floor, so the exact top-5 is
    # unambiguous and p=0.5 sampling keeps every hitter in candidates
    rows = []
    did = 0
    for j in range(5):
        for _ in range(300 - j * 30):
            rows.append((did, f"hit{j}x hit{j}y hit{j}z"))
            did += 1
    for i in range(300):
        rows.append((did, f"unique{i}a unique{i}b unique{i}c unique{i}d"))
        did += 1
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = [(r["gram"], r["cnt"]) for r in top_ngrams(docs, n=3, k=5).collect()]
    assert [c for _, c in exact] == [300, 270, 240, 210, 180]
    for p in (1.0, 0.5):
        got = [
            (r["gram"], r["cnt"])
            for r in top_ngrams_approx(docs, n=3, k=5, p=p).collect()
        ]
        assert got == exact, (p, got, exact)


def test_top_ngrams_approx_deterministic_across_partitionings(spark):
    from similardocs_spark.operators.textstats import top_ngrams_approx

    rows = [(i, "alpha beta gamma delta alpha beta gamma") for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = top_ngrams_approx(docs, n=2, k=4, p=0.3).collect()
    b = top_ngrams_approx(docs.repartition(7), n=2, k=4, p=0.3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_top_ngrams_approx_empty_and_bad_p(spark):
    from similardocs_spark.operators.textstats import top_ngrams_approx

    docs = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    assert top_ngrams_approx(docs, n=3, k=5, p=0.9).collect() == []
    with pytest.raises(ValueError):
        top_ngrams_approx(docs, n=3, k=5, p=0.0)


def test_mixture_summary_matches_python(spark):
    import re

    from similardocs_spark.operators.textstats import TOKEN_PATTERN

    docs = spark.createDataFrame(
        [(i, lang, src, t) for i, lang, src, t in DOCS],
        ["doc_id", "lang", "source", "text"],
    )
    toks = {
        i: len(re.findall(TOKEN_PATTERN, t.lower())) for i, _, _, t in DOCS
    }
    per: dict[tuple[str, str], list[int]] = {}
    for i, lang, src, _ in DOCS:
        nd_t = per.setdefault((src, lang), [0, 0])
        nd_t[0] += 1
        nd_t[1] += toks[i]
    total = sum(v[1] for v in per.values())
    exp = {
        key: (v[0], v[1], round(v[1] * 1e6 / total)) for key, v in per.items()
    }
    got = {
        (r["source"], r["lang"]): (
            r["n_docs"],
            r["bpe_tokens"],
            r["token_share_e6"],
        )
        for r in mixture_summary(docs).collect()
    }
    assert got == exp
    assert abs(sum(v[2] for v in got.values()) - 1_000_000) <= len(got)
