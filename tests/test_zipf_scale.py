"""Cross-path validation at a less-toy scale: on a Zipf-vocabulary corpus
(3k conversations, ~50k-term vocabulary, multiple segments) the WAND kernel
and the declarative path must return identical results, and batch must equal
single-query results."""
from __future__ import annotations

import math

import pytest

from similardocs_spark.fixtures import END_DAYS_AGO, PINNED_TODAY
from similardocs_spark.index.build import build_index
from similardocs_spark.query.engine import SearchEngine

QUERIES = {
    "hot": "w0 w1 w2 w3",
    "mixed": "w5 w123 w4321 w911",
    "rare": "w31000 w44321 w27777",
    "single": "w17",
    "many": "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15",
}


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    import bench

    root = str(tmp_path_factory.mktemp("zipfidx"))
    tdf = bench.synth_transcripts_zipf(spark, n_convs=3000, turns_per_conv=3, words_per_turn=30)
    build_index(
        spark, tdf, root, seg_size=512,
        doc_id_expr="cast(substring(conv_id, 5, 9) as bigint)",
    )
    from similardocs_spark.index.build import IndexPaths

    return SearchEngine(spark, IndexPaths(root), PINNED_TODAY, END_DAYS_AGO)


@pytest.mark.spark
def test_wand_equals_naive_zipf(engine):
    assert engine.n_docs == 3000
    batch = engine.search_batch(dict(QUERIES))
    for name, text in QUERIES.items():
        naive = engine.search(text)
        wand = engine.search(text, use_wand=True)
        assert [h.doc_id for h in naive] == [h.doc_id for h in wand], name
        for a, b in zip(naive, wand):
            assert math.isclose(a.score, b.score, rel_tol=1e-7), (name, a.doc_id)
        assert [h.doc_id for h in batch[name]] == [h.doc_id for h in naive], name
        if naive:
            assert all(h.n_common >= 1 for h in naive)
