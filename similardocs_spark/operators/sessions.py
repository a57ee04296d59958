"""Gap-based sessionization over event streams.

The standard activity-segmentation operator (web/agent analytics, and for
training pipelines the step that turns raw interaction logs into
conversation/episode units): a user's events belong to one session until
a silence longer than `gap` splits them.

Batch (`sessionize`): one exchange on the user key — the session
boundary is `lag(ts)` over (user ORDER BY ts), the session ordinal a
running sum of boundary flags over the same window, and the per-session
aggregation re-uses the SAME partitioning (groupBy on user_id +
session_seq is co-partitioned with the window; Catalyst plans a single
Exchange). Ordering by the microsecond timestamp alone is
output-deterministic: tied instants carry boundary flag 0 in any order
and contribute the same min/max/count, so no event-id tiebreaker is
needed (see the inline note in `sessionize`; `id_col` stays in the
signature for callers whose ts semantics differ).
Durations are integer microsecond arithmetic
(cross-engine exact); `value` sums are NOT emitted by default precisely
because float accumulation order is partition-dependent.

At 100 TB the shape holds: sessionization is inherently one shuffle of
the event stream by user (skewed power users are bounded by the window
being a linear scan per user, not O(n²); a user's events must meet
anyway — there is nothing to prune). State never materializes
corpus-wide: each partition streams its users' sorted events once.

Streaming (`sessionize_stream`): the same semantics as an UNBOUNDED
stateful operator via `applyInPandasWithState` (Structured Streaming's
arbitrary-stateful API) with event-time timeout on the watermark: a
user's open session lives in the state store, extends while events
arrive within `gap`, and is emitted exactly when the watermark passes
its close. `tests/test_sessions.py` pins stream≡batch equivalence on a
two-phase file-source drain.

Reference parity: the reference engine has no event analytics — this is
part of the training-data surface the graft adds beyond the reference
(SURVEY §2 addendum).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["sessionize", "sessionize_stream", "DEFAULT_GAP_MINUTES"]

DEFAULT_GAP_MINUTES = 30

_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _wall_us(ts_col: str):
    """Exact integer microseconds since the ntz epoch of `ts_col`'s
    WALL-CLOCK value (timestamp_ntz passes through; instant timestamps
    take their session-tz wall)."""
    return F.expr(
        f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, "
        f"cast(`{ts_col}` as timestamp_ntz))"
    )


def _wall_ts(us_col: str):
    """Inverse of `_wall_us`: timestamp_ntz from epoch microseconds."""
    return F.expr(f"timestampadd(MICROSECOND, `{us_col}`, {_NTZ_EPOCH})")


def sessionize(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session rows: (user_id, session_seq, session_start, session_end,
    n_events, duration_us).

    session_seq is the user's 1-based session ordinal in time order;
    a session closes when the NEXT event is more than gap_minutes later
    (strictly greater). duration_us = end − start in integer microseconds.
    """
    gap_us = int(gap_minutes) * 60_000_000
    # Exact integer-microsecond WALL-CLOCK arithmetic via timestamp_ntz
    # (a double cast would truncate the binary fraction and drift off the
    # oracle by ±1 µs; unix_micros rejects TIMESTAMP_NTZ inputs, which is
    # what parquet event logs read as). An instant-typed input is cast to
    # its session-tz wall once on the way in and back the same way on the
    # way out, so walls round-trip for either input type.
    # Ordering by _us alone is output-deterministic: tied instants have
    # boundary flag 0 in any order and contribute the same min/max/count,
    # so no event_id tiebreaker is needed (id_col kept in the signature
    # for callers whose ts semantics differ).
    del id_col
    flagged = events.select(
        F.col(user_col).alias("user_id"),
        _wall_us(ts_col).alias("_us"),
    ).withColumn(
        "_new",
        F.when(
            F.col("_us")
            - F.lag("_us").over(
                Window.partitionBy("user_id").orderBy("_us")
            )
            > F.lit(gap_us),
            1,
        )
        .otherwise(0)
        .cast("long"),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("_new").over(
            Window.partitionBy("user_id")
            .orderBy("_us")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        + 1,
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("_us").alias("_start_us"),
            F.max("_us").alias("_end_us"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            _wall_ts("_start_us").alias("session_start"),
            _wall_ts("_end_us").alias("session_end"),
            F.col("n_events").cast("long").alias("n_events"),
            (F.col("_end_us") - F.col("_start_us")).alias("duration_us"),
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization: arbitrary stateful processing via
    `applyInPandasWithState` with EVENT-TIME timeout.

    Per user, ALL not-yet-final sessions (the open one and any closed
    ones the watermark has not passed) live in the state store as
    (start, end, count) clusters. An incoming event extends the cluster
    it falls within `gap` of — and can BRIDGE two clusters into one, so
    late data inside the watermark lands in the session it belongs to,
    even one that a later event had already split off. A cluster is
    EMITTED exactly when the watermark passes its end + gap (either on
    the user's next batch or on the event-time timeout this function
    arms), at which point no in-watermark event can extend it —
    emission is exactly-once per final session.

    Output schema matches `sessionize` minus `session_seq` (a global
    ordinal needs the whole history; streaming consumers key sessions by
    (user_id, session_start)).

    Input must be a STREAMING DataFrame; the watermark is applied here.
    Timeout timestamps are computed on the event wall clock, which
    coincides with the watermark clock for timestamp_ntz inputs (always)
    and for instant inputs under a UTC session timezone; an instant
    event column in a non-UTC session would skew timeout firing by the
    zone offset (sessions still emit, later).
    """
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    gap_us = int(gap_minutes) * 60_000_000

    out_schema = (
        "user_id long, session_start timestamp_ntz, "
        "session_end timestamp_ntz, n_events long, duration_us long"
    )
    state_schema = (
        "starts array<long>, ends array<long>, counts array<long>"
    )

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (uid,) = key
        clusters: list[list[int]] = []
        if state.exists:
            ss, ee, nn = state.get
            clusters = sorted(
                [int(a), int(b), int(c)] for a, b, c in zip(ss, ee, nn)
            )
        if not state.hasTimedOut:
            tss: list[int] = []
            for pdf in pdfs:
                tss.extend(int(x) for x in pdf["_us"])
            for t in sorted(tss):
                placed = False
                for c in clusters:
                    if c[0] - gap_us <= t <= c[1] + gap_us:
                        c[0] = min(c[0], t)
                        c[1] = max(c[1], t)
                        c[2] += 1
                        placed = True
                        break
                if not placed:
                    clusters.append([t, t, 1])
            clusters.sort()
            merged: list[list[int]] = []
            for c in clusters:
                if merged and c[0] - merged[-1][1] <= gap_us:
                    merged[-1][1] = max(merged[-1][1], c[1])
                    merged[-1][2] += c[2]
                else:
                    merged.append(c)
            clusters = merged
        wm_us = state.getCurrentWatermarkMs() * 1000
        ripe = [c for c in clusters if wm_us > 0 and c[1] + gap_us < wm_us]
        keep = [c for c in clusters if not (wm_us > 0 and c[1] + gap_us < wm_us)]
        if keep:
            state.update(
                (
                    [c[0] for c in keep],
                    [c[1] for c in keep],
                    [c[2] for c in keep],
                )
            )
            # fire when the watermark passes the earliest pending close;
            # must be strictly beyond the current watermark
            fire_ms = min(c[1] for c in keep) // 1000 + gap_minutes * 60_000 + 1
            state.setTimeoutTimestamp(max(fire_ms, wm_us // 1000 + 1))
        elif state.exists:
            state.remove()
        if ripe:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(ripe),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in ripe
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in ripe
                    ],
                    "n_events": [n for _, _, n in ripe],
                    "duration_us": [e - s for s, e, _ in ripe],
                }
            )

    prepared = events.withWatermark(ts_col, watermark).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col),
        _wall_us(ts_col).alias("_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
