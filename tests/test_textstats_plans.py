"""textstats plan variants: the row-local and shuffle-safe fingerprint plans
must be result-identical, including null/empty/short-text edges."""
from __future__ import annotations

import hashlib

import pytest


@pytest.mark.spark
def test_fingerprint_plans_identical(spark):
    from similardocs_spark.operators.textstats import fingerprint

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, ""),            # empty → md5("") singleton
            (3, None),          # null → treated as ""
            (4, "short"),       # < 8 chars → one whole-text shingle
            (5, "aaaaaaaaaaaaaaaa"),  # all-identical shingles → one hash
            (6, "x" * 300),
        ],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    b = {r["doc_id"]: r["fp"] for r in fingerprint(docs, shuffle_safe=True).collect()}
    assert a == b
    assert a[2] == a[3] == hashlib.md5(b"").hexdigest()
    assert a[4] == hashlib.md5(b"short").hexdigest()
    assert a[5] == hashlib.md5(b"aaaaaaaa").hexdigest()

    # reference semantics: bottom-4 distinct shingle hashes, concatenated
    t = "the quick brown fox jumps over the lazy dog"
    hs = sorted(
        {
            hashlib.md5(t[i : i + 8].encode()).hexdigest()
            for i in range(0, max(len(t) - 8, 0) + 1)
        }
    )
    assert a[1] == "".join(hs[:4])


@pytest.mark.spark
def test_textstats_plans_are_jvm_only(spark):
    """VERDICT r1: fingerprint was the one per-row-Python hot path; assert
    none of the textstats operators schedules a Python eval node anymore
    (langid/quality/token_counts/fingerprint — both plan variants)."""
    from similardocs_spark.operators.textstats import (
        fingerprint,
        langid,
        quality_score,
        token_counts,
    )

    docs = spark.createDataFrame(
        [(i, f"some words number {i} the and dengue") for i in range(20)],
        "doc_id long, text string",
    )
    for name, df in (
        ("fingerprint", fingerprint(docs)),
        ("fingerprint_shuffle_safe", fingerprint(docs, shuffle_safe=True)),
        ("quality", quality_score(docs)),
        ("token_counts", token_counts(docs)),
        ("langid", langid(docs)),
    ):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
            assert marker not in plan, f"{name} schedules Python: {marker}"
    # the no-shuffle claim for the default fingerprint plan
    plan = fingerprint(docs)._sc._jvm.PythonSQLUtils.explainString(
        fingerprint(docs)._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
