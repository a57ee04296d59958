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
    assert {
        r["doc_id"] for r in spark.read.parquet(state + "/sig").collect()
    } == kept

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


@pytest.mark.spark
def test_dedup_stream_compaction_hook(spark, tmp_path):
    """compact_state_every folds state partitions between ticks; the next
    tick still adjudicates correctly and replay after compaction appends
    nothing (the crash matrix's hardest row)."""
    from similardocs_spark.streaming.dedup_stream import run_dedup_ingest

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _land(spark, landing, [(1, LONG + " one"), (2, "totally different "
          "matter argon boron carbon dalton erbium fluorine gallium")])
    res = run_dedup_ingest(
        spark, landing, corpus, state, ckpt, compact_state_every=1
    )
    assert [r["n_accepted"] for r in res] == [2]
    # state folded into the base partition by the hook
    parts = {
        r["ingest_batch"]
        for r in spark.read.parquet(state + "/sig")
        .select("ingest_batch").distinct().collect()
    }
    assert parts == {"base"}

    # a near-dup of doc 1 must still be rejected against the compacted state
    _land(spark, landing, [(10, LONG + " ones"), (12, "entirely novel "
          "content platypus wombat echidna kookaburra cassowary dingo")])
    res = run_dedup_ingest(
        spark, landing, corpus, state, ckpt, compact_state_every=1
    )
    assert res[0]["n_accepted"] == 1 and res[0]["n_rejected"] == 1
    kept = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 2, 12}

    # checkpoint wipe → full redelivery against the compacted state:
    # everything previously accepted is gated, nothing is double-written
    import shutil

    shutil.rmtree(ckpt)
    res = run_dedup_ingest(
        spark, landing, corpus, state, str(tmp_path / "ckpt2")
    )
    assert sum(r["n_accepted"] for r in res) == 0
    assert {r["doc_id"] for r in spark.read.parquet(corpus).collect()} == kept


@pytest.mark.spark
def test_dedup_stream_fresh_checkpoint_does_not_clobber_partitions(
    spark, tmp_path
):
    """A NEW stream incarnation restarts batch ids at 0; its partition
    labels are salted by checkpoint, so accepting a fresh doc must never
    dynamic-overwrite an older incarnation's batch-0 corpus partition."""
    from similardocs_spark.streaming.dedup_stream import run_dedup_ingest

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")

    land1 = str(tmp_path / "landing1")
    _land(spark, land1, [(1, LONG + " one"), (2, "totally different "
          "matter argon boron carbon dalton erbium fluorine gallium")])
    run_dedup_ingest(spark, land1, corpus, state, str(tmp_path / "ck1"))

    # second incarnation: different landing dir + fresh checkpoint →
    # batch_id 0 again, genuinely new doc accepted
    land2 = str(tmp_path / "landing2")
    _land(spark, land2, [(50, "entirely novel content platypus wombat "
          "echidna kookaburra cassowary dingo numbat quokka")])
    res = run_dedup_ingest(spark, land2, corpus, state, str(tmp_path / "ck2"))
    assert sum(r["n_accepted"] for r in res) == 1
    kept = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert kept == {1, 2, 50}  # docs 1,2 survived the colliding batch id
