"""Streaming embedding ingestion: landing-dir drains through the
persistent LSH vector state, with replay idempotence and a
reband-at-compaction hook — the vector mirror of test_dedup_stream."""
import numpy as np
import pytest

DIM = 16


def _vec(seed: int) -> list[float]:
    v = np.random.default_rng(seed).standard_normal(DIM)
    return [float(x) for x in v]


def _near(seed: int, eps: float = 0.01) -> list[float]:
    v = np.asarray(_vec(seed))
    w = v + eps * np.random.default_rng(10_000 + seed).standard_normal(DIM)
    return [float(x) for x in w]


def _land(spark, path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1).write.mode("append").parquet(path)


@pytest.mark.spark
def test_ann_stream_ingest_and_replay(spark, tmp_path):
    from similardocs_spark.streaming.ann_stream import run_embedding_ingest

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # tick 1: two distinct vectors
    _land(spark, landing, [(1, _vec(1)), (2, _vec(2))])
    res = run_embedding_ingest(
        spark, landing, corpus, state, ckpt, dim=DIM, bits=6
    )
    assert [r["n_accepted"] for r in res] == [2]
    assert res[0]["n_rejected"] == 0 and res[0]["n_replayed"] == 0

    # tick 2: a near-dup of vec 1, an exact copy of vec 2, and a fresh one
    _land(
        spark, landing, [(10, _near(1)), (11, _vec(2)), (12, _vec(12))]
    )
    res = run_embedding_ingest(
        spark, landing, corpus, state, ckpt, dim=DIM, bits=6
    )
    assert len(res) == 1
    assert res[0]["n_arrived"] == 3
    assert res[0]["n_accepted"] == 1
    assert res[0]["n_rejected"] == 2

    kept = {r["vec_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 2, 12}
    assert {
        r["vec_id"] for r in spark.read.parquet(state + "/state").collect()
    } == kept

    # checkpoint wipe → full redelivery: accepted vecs gate out as
    # replayed, rejected ones re-adjudicate to the same verdict
    import shutil

    shutil.rmtree(ckpt)
    res = run_embedding_ingest(
        spark, landing, corpus, state, str(tmp_path / "ck2"), dim=DIM, bits=6
    )
    assert sum(r["n_replayed"] for r in res) == 3
    assert sum(r["n_accepted"] for r in res) == 0
    assert sum(r["n_rejected"] for r in res) == 2
    assert {r["vec_id"] for r in spark.read.parquet(corpus).collect()} == kept


@pytest.mark.spark
def test_ann_stream_compaction_and_reband(spark, tmp_path):
    """compact_state_every folds state partitions (optionally re-sizing
    bits via reband_bits_fn); post-compaction ticks adjudicate against the
    folded state under the NEW config, and replay appends nothing."""
    from similardocs_spark.streaming.ann_stream import run_embedding_ingest

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _land(spark, landing, [(1, _vec(1)), (2, _vec(2))])
    res = run_embedding_ingest(
        spark, landing, corpus, state, ckpt, dim=DIM, bits=5,
        compact_state_every=1, reband_bits_fn=lambda n: 7,
    )
    assert [r["n_accepted"] for r in res] == [2]
    parts = {
        r["ingest_batch"]
        for r in spark.read.parquet(state + "/state")
        .select("ingest_batch").distinct().collect()
    }
    assert parts == {"base"}
    # meta carries the rebanded bits
    from similardocs_spark.operators.ann_state import VectorDedupState

    st = VectorDedupState(spark, state)
    assert st.bits == 7

    # near-dup of vec 1 must still be rejected against the rebanded state
    _land(spark, landing, [(10, _near(1)), (12, _vec(12))])
    res = run_embedding_ingest(
        spark, landing, corpus, state, ckpt, dim=DIM,
        compact_state_every=1, reband_bits_fn=lambda n: 7,
    )
    assert res[0]["n_accepted"] == 1 and res[0]["n_rejected"] == 1
    kept = {r["vec_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 2, 12}

    import shutil

    shutil.rmtree(ckpt)
    res = run_embedding_ingest(
        spark, landing, corpus, state, str(tmp_path / "ck2"), dim=DIM
    )
    assert sum(r["n_accepted"] for r in res) == 0
    assert {r["vec_id"] for r in spark.read.parquet(corpus).collect()} == kept


@pytest.mark.spark
def test_vector_state_config_pinned_and_tick_matches_stateless(
    spark, tmp_path
):
    from similardocs_spark.operators import ann_incremental as inc
    from similardocs_spark.operators.ann_state import VectorDedupState

    corpus = spark.createDataFrame(
        [(i, _vec(i)) for i in range(20)], "vec_id long, embedding array<float>"
    )
    batch = spark.createDataFrame(
        [(100, _near(3)), (101, _vec(101))],
        "vec_id long, embedding array<float>",
    )
    root = str(tmp_path / "st")
    st = VectorDedupState(spark, root, dim=DIM, bits=6)
    st.bootstrap(corpus)
    accepted, pairs = st.tick(batch, "t1")
    got_pairs = {(r["vec_a"], r["vec_b"]) for r in pairs.collect()}

    # stateless reference: accept_batch against state_for(corpus)
    ref_state = inc.state_for(corpus, dim=DIM, bits=6)
    _, ref_pairs, _ = inc.accept_batch(batch, ref_state, dim=DIM, bits=6)
    assert got_pairs == {
        (r["vec_a"], r["vec_b"]) for r in ref_pairs.collect()
    }
    assert {r["vec_id"] for r in accepted.collect()} == {101}

    # the near-dup pair is the reason vec 100 was rejected
    assert (3, 100) in got_pairs
    # config pinned: opening with a different config fails fast
    with pytest.raises(ValueError, match="bits"):
        VectorDedupState(spark, root, dim=DIM, bits=9)
