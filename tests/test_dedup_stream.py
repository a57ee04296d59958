"""Streaming dedup ingestion: landing-dir drains adjudicated against the
persistent signature state, with batch-level replay idempotence."""
import pytest

LONG = (
    "zika dengue fever outbreak tropical region report alpha bravo "
    "charlie delta echo foxtrot golf hotel india"
)


def _land(spark, path, rows):
    spark.createDataFrame(
        [(i, t, "en", "unit") for i, t in rows],
        "doc_id long, text string, lang string, source string",
    ).coalesce(1).write.mode("append").parquet(path)


@pytest.mark.spark
def test_dedup_stream_ingest_and_replay(spark, tmp_path):
    from similardocs_spark.streaming.dedup_stream import run_dedup_ingest

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # tick 1: two distinct docs land
    _land(spark, landing, [(1, LONG + " one"), (2, "totally different "
          "matter argon boron carbon dalton erbium fluorine gallium")])
    res = run_dedup_ingest(spark, landing, corpus, state, ckpt)
    assert [r["n_accepted"] for r in res] == [2]
    assert res[0]["n_rejected"] == 0 and res[0]["n_replayed"] == 0

    # tick 2: a near-dup of doc 1, an exact copy of doc 2, and a fresh doc
    _land(
        spark,
        landing,
        [
            (10, LONG + " ones"),
            (11, "totally different matter argon boron carbon dalton "
                 "erbium fluorine gallium"),
            (12, "entirely novel content platypus wombat echidna "
                 "kookaburra cassowary dingo numbat quokka bilby"),
        ],
    )
    res = run_dedup_ingest(spark, landing, corpus, state, ckpt)
    assert len(res) == 1
    assert res[0]["n_arrived"] == 3
    assert res[0]["n_accepted"] == 1
    assert res[0]["n_rejected"] == 2

    kept = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 2, 12}
    assert {r["doc_id"] for r in spark.read.parquet(state).collect()} == kept

    # replay: wipe the checkpoint so the whole landing dir redelivers —
    # accepted docs are skipped via the state existence gate (replayed);
    # rejected docs have no state row, get re-adjudicated, and are
    # deterministically re-rejected — either way nothing is appended
    import shutil

    shutil.rmtree(ckpt)
    res = run_dedup_ingest(spark, landing, corpus, state, str(tmp_path / "ckpt2"))
    assert sum(r["n_replayed"] for r in res) == 3
    assert sum(r["n_accepted"] for r in res) == 0
    assert sum(r["n_rejected"] for r in res) == 2
    assert {r["doc_id"] for r in spark.read.parquet(corpus).collect()} == kept
