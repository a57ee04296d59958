"""Profile store: CRUD, stale materialization, round-robin interleave parity."""
from __future__ import annotations

import pytest

from similardocs_spark.profiles import ProfileStore, limit_docs


def test_limit_docs_round_robin():
    # reference limitDocs semantics (TopIndex.scala:455-478)
    assert limit_docs([[1, 2, 3], [4, 5], [6]], 10) == [1, 4, 6, 2, 5, 3]
    assert limit_docs([[1, 2, 3], [4, 5], [6]], 4) == [1, 4, 6, 2]
    assert limit_docs([[], [4]], 3) == [4]
    assert limit_docs([], 5) == []
    # quota is applied per round on the collected heads
    assert limit_docs([[1], [2], [3]], 2) == [1, 2]


class FakeHit:
    def __init__(self, doc_id, score):
        self.doc_id, self.score = doc_id, score


class FakeEngine:
    """search() returns doc ids derived from the content length (stable)."""

    def __init__(self):
        self.calls = 0

    def search(self, content, **kw):
        self.calls += 1
        base = len(content)
        return [FakeHit(base + i, 1.0 / (i + 1)) for i in range(3)]


@pytest.mark.spark
def test_profile_crud_and_update(spark, tmp_path):
    store = ProfileStore(spark, str(tmp_path / "profiles"))
    eng = FakeEngine()
    store.add_profile("Téster!@paho.org", "é profile 1", "zika dengue", now_ms=1000)
    store.add_profile("Téster!@paho.org", "é profile 2", "febre amarela", now_ms=1000)
    profs = store.get_profiles("Téster!@paho.org")
    assert len(profs) == 2
    assert all(p["update_time"] == 0 for p in profs)

    # unchanged upsert is a no-op; changed content resets to stale
    store.add_profile("Téster!@paho.org", "é profile 1", "zika dengue", now_ms=2000)
    assert store.get_profiles("Téster!@paho.org")[0]["creation_time"] == 1000

    n = store.update_stale(eng, now_ms=5000)
    assert n == 2 and eng.calls == 2
    profs = store.get_profiles("Téster!@paho.org")
    assert all(p["update_time"] == 5000 for p in profs)
    assert all(len(p["sd_ids"]) == 3 for p in profs)

    # fresh profiles are not re-materialized
    assert store.update_stale(eng, now_ms=5001) == 0

    store.delete_profile("Téster!@paho.org", "é profile 2")
    assert len(store.get_profiles("Téster!@paho.org")) == 1
    store.delete_user("Téster!@paho.org")
    assert store.get_profiles("Téster!@paho.org") == []


@pytest.mark.spark
def test_reset_and_update_all(spark, tmp_path):
    store = ProfileStore(spark, str(tmp_path / "p2"))
    eng = FakeEngine()
    store.add_profile("u", "a", "zika", now_ms=10)
    store.add_profile("u", "b", "dengue", now_ms=10)
    assert store.update_stale(eng, now_ms=100) == 2
    assert store.reset_all_times("u") == 2
    profs = store.get_profiles("u")
    assert all(p["update_time"] == 0 for p in profs)
    assert store.update_all(eng, now_ms=200) == 2
    assert all(p["update_time"] == 200 for p in store.get_profiles("u"))
