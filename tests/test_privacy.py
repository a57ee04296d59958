"""PII detection/redaction vs python recompute (re module ~ same dialect)."""
from __future__ import annotations

import re

import pytest

from similardocs_spark.operators.privacy import (
    PII_PATTERNS,
    pii_redact,
    pii_stats,
)

pytestmark = pytest.mark.usefixtures("spark")

DOCS = [
    (0, "write to alice.smith+spam@example.co.uk or bob@sub.domain.org now"),
    (1, "server at 10.0.254.7 and 192.168.1.1 responded"),
    (2, "account 123456789 card 4111111111111111 pin 1234"),
    (3, "clean text with number 42 and version 1.2 only"),
    (4, "mixed bob@x.io from 8.8.8.8 ref 987654321 end"),
    (5, ""),
]


def _py_stats():
    out = {}
    for did, t in DOCS:
        counts = [len(re.findall(p, t)) for _, p in PII_PATTERNS]
        out[did] = (*counts, sum(counts) > 0)
    return out


def _py_redact():
    out = {}
    for did, t in DOCS:
        for name, p in PII_PATTERNS:
            t = re.sub(p, f"<{name.upper()}>", t)
        out[did] = t
    return out


def test_pii_stats_matches_python(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_email"], r["n_ipv4"], r["n_id_number"], r["has_pii"]
        )
        for r in pii_stats(docs).collect()
    }
    assert got == _py_stats()
    # spot-pin the construction: 0/1/2/4 dirty, 3/5 clean
    assert [got[i][3] for i in range(6)] == [True, True, True, False, True, False]


def test_pii_redact_matches_python(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r["doc_id"]: r["text"] for r in pii_redact(docs).collect()}
    assert got == _py_redact()
    assert "<EMAIL>" in got[0] and "@" not in got[0]
    assert got[1].count("<IPV4>") == 2
    # redacted text is drop-in: same column name, no PII left
    assert {r["has_pii"] for r in pii_stats(pii_redact(docs)).collect()} == {False}
