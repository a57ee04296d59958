"""Gap sessionization: batch vs python recompute, stream vs batch.

The streaming test drives the real applyInPandasWithState operator
through four AvailableNow drains of a file source: in-order events, a
LATE batch (an old event that must merge into its original session),
then two sentinel drains that advance the watermark so every real
session times out and emits.
"""
from __future__ import annotations

import datetime as dt

import pytest

from similardocs_spark.operators.sessions import sessionize

pytestmark = pytest.mark.usefixtures("spark")

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
GAP_MIN = 30


def _ev(eid: int, uid: int, minutes: float):
    return (eid, T0 + dt.timedelta(minutes=minutes), uid)

# user 1: sessions [0,20], [120,125], [600]
# user 2: sessions [5], [50,55]   (45-minute silence splits)
# user 3: session  [30]
EVENTS_A = [
    _ev(1, 1, 0),
    _ev(2, 1, 10),
    _ev(4, 1, 120),
    _ev(5, 1, 125),
    _ev(7, 2, 5),
    _ev(8, 2, 50),
    _ev(9, 2, 55),
    _ev(10, 3, 30),
]
# arrives later: an in-order tail event plus an OUT-OF-ORDER event
# (minute 20, inside the 120-minute watermark delay) that must merge
# into user 1's first session, which already lives in the state store
EVENTS_B = [
    _ev(6, 1, 600),
    _ev(3, 1, 20),
]
ALL_EVENTS = EVENTS_A + EVENTS_B

SCHEMA = "event_id long, ts timestamp, user_id long"


def _py_sessions(events, gap_min):
    from collections import defaultdict

    by_user = defaultdict(list)
    for _, ts, uid in events:
        by_user[uid].append(ts)
    out = set()
    for uid, tss in by_user.items():
        tss.sort()
        seq, start, prev, n = 1, tss[0], tss[0], 1
        for t in tss[1:]:
            if (t - prev).total_seconds() * 1e6 > gap_min * 60e6:
                out.add((uid, seq, start, prev, n,
                         int((prev - start).total_seconds() * 1e6)))
                seq, start, n = seq + 1, t, 0
            prev = t
            n += 1
        out.add((uid, seq, start, prev, n,
                 int((prev - start).total_seconds() * 1e6)))
    return out


def test_batch_matches_python_recompute(spark):
    ev = spark.createDataFrame(ALL_EVENTS, SCHEMA)
    got = {
        (r["user_id"], r["session_seq"], r["session_start"],
         r["session_end"], r["n_events"], r["duration_us"])
        for r in sessionize(ev, gap_minutes=GAP_MIN).collect()
    }
    assert got == _py_sessions(ALL_EVENTS, GAP_MIN)


def test_batch_single_exchange(spark):
    """The window and the aggregation share ONE exchange on user_id."""
    ev = spark.createDataFrame(ALL_EVENTS, SCHEMA)
    plan = sessionize(ev)._sc._jvm.PythonSQLUtils.explainString(
        sessionize(ev)._jdf.queryExecution(), "formatted"
    )
    # tree nodes render as "Exchange (n)"; the detail section as "(n) Exchange"
    assert plan.count("Exchange (") == 1


def test_randomized_users_match_python(spark):
    """200 seeded random users — tied timestamps, duplicate events,
    micro/huge gaps — in ONE job vs the python recompute."""
    import random

    rng = random.Random(42)
    events, eid = [], 0
    for uid in range(200):
        n = rng.randint(1, 12)
        t = rng.uniform(0, 50)
        for _ in range(n):
            events.append(_ev(eid, uid, round(t, 3)))
            eid += 1
            step = rng.choice([0, 0.001, 1, 29.9, 30.0001, 31, 400])
            t += step
    ev = spark.createDataFrame(events, SCHEMA)
    got = {
        (r["user_id"], r["session_seq"], r["session_start"],
         r["session_end"], r["n_events"], r["duration_us"])
        for r in sessionize(ev, gap_minutes=GAP_MIN).collect()
    }
    assert got == _py_sessions(events, GAP_MIN)


@pytest.mark.spark
def test_stream_matches_batch(spark, tmp_path):
    from similardocs_spark.operators.sessions import sessionize_stream

    landing = str(tmp_path / "landing")
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def land(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    def drain():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = (
            sessionize_stream(stream, gap_minutes=GAP_MIN, watermark="120 minutes")
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    land(EVENTS_A)
    drain()
    land(EVENTS_B)  # includes the late minute-20 event
    drain()
    # sentinel drains: far-future events for a throwaway user advance the
    # watermark so every real session times out and emits
    land([_ev(100, 999, 3000)])
    drain()
    land([_ev(101, 999, 6000)])
    drain()

    emitted = {
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], r["duration_us"])
        for r in spark.read.parquet(outdir).collect()
        if r["user_id"] != 999
    }
    expected = {
        (u, s, e, n, d)
        for (u, _, s, e, n, d) in _py_sessions(ALL_EVENTS, GAP_MIN)
    }
    assert emitted == expected
    # exactly-once: no session row is emitted twice
    rows = [
        r for r in spark.read.parquet(outdir).collect()
        if r["user_id"] != 999
    ]
    assert len(rows) == len(emitted)
