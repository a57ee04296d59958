"""Profile service end-to-end against the real engine + oracle parity:
materialized sd_ids must equal the oracle's split-time search, and
get_sim_docs must interleave them per limitDocs semantics."""
from __future__ import annotations

import pytest

from similardocs_spark.fixtures import (
    END_DAYS_AGO,
    PINNED_TODAY,
    REFERENCE_PROFILES,
    make_transcripts,
    oracle_docs,
    transcripts_df,
)
from similardocs_spark.index.build import IndexPaths, build_index
from similardocs_spark.oracle.refsearch import OracleIndex, OracleSearch
from similardocs_spark.profiles import ProfileStore, limit_docs, profile_id
from similardocs_spark.query.engine import SearchEngine


@pytest.mark.spark
def test_profile_materialization_matches_oracle(spark, tmp_path):
    root = str(tmp_path / "idx")
    turns = make_transcripts(60, seed=42)
    build_index(spark, transcripts_df(spark, n_convs=60, seed=42), root, seg_size=16)
    engine = SearchEngine(spark, IndexPaths(root), PINNED_TODAY, END_DAYS_AGO)
    oracle = OracleSearch(OracleIndex.build(oracle_docs(turns)), PINNED_TODAY, END_DAYS_AGO)

    store = ProfileStore(spark, str(tmp_path / "profiles"))
    for p in REFERENCE_PROFILES[:4]:
        store.add_profile(p["user"], p["prof_name"], p["prof_content"], now_ms=1000)

    n = store.update_stale(engine, now_ms=5000)
    assert n == 4

    id_lists = []
    for p in REFERENCE_PROFILES[:4]:
        row = next(
            r for r in store.get_profiles(p["user"])
            if r["id"] == profile_id(p["user"], p["prof_name"])
        )
        exp = oracle.search(p["prof_content"], split_time=True)
        assert list(row["sd_ids"]) == [h.doc_id for h in exp], p["prof_name"]
        id_lists.append(list(row["sd_ids"]))

    user = REFERENCE_PROFILES[0]["user"]
    names = [p["prof_name"] for p in REFERENCE_PROFILES[:4] if p["user"] == user]
    got = store.get_sim_docs(engine, user, names, max_docs=10)
    exp_ids = limit_docs(
        [l for p, l in zip(REFERENCE_PROFILES[:4], id_lists) if p["user"] == user], 10
    )
    assert [d["doc_id"] for d in got] == exp_ids
