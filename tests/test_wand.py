"""WAND kernel parity: use_wand=True must equal the oracle (and hence the
naive DataFrame path) exactly, including under filters and the bucket ladder.
Uses a tiny seg_size so queries cross many segments, exercising the
per-segment kernel + treeReduce heap merge."""
from __future__ import annotations

import pytest

from similardocs_spark.fixtures import (
    END_DAYS_AGO,
    PINNED_TODAY,
    REFERENCE_QUERIES,
    docs_meta_for,
    make_transcripts,
    oracle_docs,
    transcripts_df,
)
from similardocs_spark.index.build import build_index
from similardocs_spark.oracle.refsearch import OracleIndex, OracleSearch
from similardocs_spark.query.engine import SearchEngine
from tests.test_engine_golden import assert_hits_equal

N_CONVS = 120
SEED = 7


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wandindex"))
    turns = make_transcripts(N_CONVS, seed=SEED)
    meta = docs_meta_for(turns)
    meta_df = spark.createDataFrame(
        [(cid, m["db"], m["instance"], m["update_date"]) for cid, m in meta.items()],
        "conv_id string, db string, instance string, update_date string",
    )
    tdf = transcripts_df(spark, n_convs=N_CONVS, seed=SEED)
    paths = build_index(spark, tdf, root, docs_meta=meta_df, seg_size=16)
    engine = SearchEngine(spark, paths, PINNED_TODAY, END_DAYS_AGO)
    oracle = OracleSearch(
        OracleIndex.build(oracle_docs(turns)), PINNED_TODAY, END_DAYS_AGO
    )
    return engine, oracle


WAND_MODES = [
    dict(),
    dict(sources={"MEDLINE", "LILACS"}),
    dict(split_time=True),
    dict(max_docs=30),
]


@pytest.mark.spark
@pytest.mark.parametrize(
    "qname", ["profile_1", "profile_u5mr", "profile_ehealth", "profile_intestinales"]
)
def test_wand_matches_oracle(corpus, qname):
    engine, oracle = corpus
    text = REFERENCE_QUERIES[qname]
    for mode in WAND_MODES:
        got = engine.search(text, use_wand=True, **mode)
        exp = oracle.search(text, **mode)
        assert_hits_equal(got, exp, f"wand {qname} {mode}")


@pytest.mark.spark
def test_wand_kernel_unit():
    """Kernel-level unit test without Spark: one segment, synthetic postings."""
    import numpy as np
    import pandas as pd

    from similardocs_spark.index import codec
    from similardocs_spark.query.wand import wand_kernel

    from similardocs_spark import bm25

    rng = np.random.default_rng(3)
    n_docs, seg_size, avgdl = 500, 1024, 42.5
    dlq = rng.integers(5, 120, n_docs).astype(np.int64)
    tfn = bm25.tfnorm_np(dlq, avgdl)
    docs = pd.DataFrame(
        {"doc_id": np.arange(n_docs), "tfnorm": tfn, "const": np.ones(n_docs)}
    )
    w_idf = {"aaa": 2.0, "bbb": 1.0}
    rows = []
    truth = {}
    for term, w in w_idf.items():
        ids = np.sort(rng.choice(n_docs, size=200, replace=False))
        bl, bm = codec.block_metadata(ids, dlq[ids])
        rows.append(
            {
                "term": term,
                "blob": codec.encode_docids(ids),
                "block_last": bl,
                "block_min_dlq": bm,
            }
        )
        for d in ids:
            truth.setdefault(int(d), 0.0)
            truth[int(d)] += float(np.float32(np.float32(w) * tfn[d]))
    exp = sorted(
        ((np.float32(s + 1.0), d) for d, s in truth.items()), key=lambda t: (-t[0], t[1])
    )[:50]
    got = wand_kernel((0,), pd.DataFrame(rows), docs, w_idf, seg_size, 50, avgdl)
    assert got["doc_id"].tolist() == [d for _, d in exp]
    assert [float(x) for x in got["score"]] == pytest.approx([float(s) for s, _ in exp], rel=1e-6)
