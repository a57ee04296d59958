"""Checked-in golden files pin the oracle (and transitively the engine, which
golden-tests against the oracle). Regenerate ONLY via scripts/gen_golden.py.
Also: the per-row invariant from BASELINE.json input_hint."""
from __future__ import annotations

import json
import math
import os

import pytest

from similardocs_spark.fixtures import (
    END_DAYS_AGO,
    PINNED_TODAY,
    REFERENCE_QUERIES,
    make_transcripts,
    oracle_docs,
)
from similardocs_spark.oracle.refsearch import OracleIndex, OracleSearch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

MODES = {
    "plain": {},
    "split": {"split_time": True},
    "sources": {"sources": {"MEDLINE", "LILACS"}},
    "lastdays": {"last_days": 400},
}


@pytest.fixture(scope="module")
def oracle():
    idx = OracleIndex.build(oracle_docs(make_transcripts(100, seed=42)))
    return OracleSearch(idx, PINNED_TODAY, END_DAYS_AGO)


@pytest.mark.parametrize("qname", sorted(REFERENCE_QUERIES))
def test_matches_golden(oracle, qname):
    with open(os.path.join(GOLDEN, f"topk_{qname}.json")) as f:
        golden = json.load(f)
    for mode_name, mode in MODES.items():
        hits = oracle.search(REFERENCE_QUERIES[qname], **mode)
        exp = golden[mode_name]
        assert [h.doc_id for h in hits] == [e["doc_id"] for e in exp], (qname, mode_name)
        for h, e in zip(hits, exp):
            assert h.n_common == e["n_common"]
            assert h.update_date == e["update_date"]
            assert math.isclose(h.score, e["score"], rel_tol=1e-7)


def test_per_row_invariant():
    """input_hint: per-turn text equality under stable (conv_id, turn_idx)
    ordering — the assembled doc text is exactly the ordered concat of
    (truncated) turn texts."""
    turns = make_transcripts(30, seed=42)
    docs = oracle_docs(turns)
    by_conv: dict[str, list] = {}
    for t in turns:
        by_conv.setdefault(t.conv_id, []).append(t)
    for d in docs:
        ordered = sorted(by_conv[d.conv_id], key=lambda t: t.turn_idx)
        assert d.turn_texts == [t.text for t in ordered]
        assert d.text == " ".join(t.text[:10000] for t in ordered)


@pytest.mark.spark
def test_per_row_invariant_spark(spark):
    """The Spark doc assembly preserves the same invariant."""
    from pyspark.sql import functions as F

    from similardocs_spark.fixtures import transcripts_df
    from similardocs_spark.index.build import assemble_docs

    tdf = transcripts_df(spark, n_convs=25, seed=42)
    docs = {r["conv_id"]: r["text"] for r in assemble_docs(tdf).collect()}
    turns = tdf.orderBy("conv_id", "turn_idx").collect()
    by_conv: dict[str, list[str]] = {}
    for t in turns:
        by_conv.setdefault(t["conv_id"], []).append(t["text"][:10000])
    for conv_id, texts in by_conv.items():
        assert docs[conv_id] == " ".join(texts), conv_id
