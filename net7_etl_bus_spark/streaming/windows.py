"""Actual Structured Streaming window/dedup operators (SURVEY.md §2.3
streaming row): readStream -> watermark -> windowed agg / dedup.

The batch-equivalent semantics are registered (and oracle-checked) in
:mod:`net7_etl_bus_spark.streaming.batch_equiv`; these functions run
the same expressions as real streams. Tests
(tests/test_streaming.py) replay the events table through a file
stream with Trigger.AvailableNow and assert the streamed result equals
the batch result — Structured Streaming's core guarantee.

Watermark note (100 TB): the watermark bounds state. A 1h window +
30m watermark keeps at most ~2 window generations of state per key;
without it, event-time state grows unboundedly. Late rows beyond the
watermark are dropped — tests pin that behavior explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.registry import dsum


def stream_tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling event-time aggregation with late-data bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("win.start").alias("window_start"), "n_events", "sum_value")
    )


def stream_session_windows(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Stateful session windows — the state store merges sessions as
    events arrive; the watermark finalizes and emits closed sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Keyed streaming dedup with bounded state:
    dropDuplicatesWithinWatermark keeps each key's state only until
    the watermark passes it — the scalable form of dropDuplicates for
    unbounded streams."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


# --- custom stateful operator: applyInPandasWithState ------------------

SESSION_GAP_MIN = 10
SESSION_CAP_MIN = 60

_SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, first_event string, last_event string"
)
# State: (start_us, last_us, n, first_type, last_type) — micros as longs.
_SESSION_STATE_SCHEMA = (
    "start_us long, last_us long, n long, first_type string, last_type string"
)


def sessionize_pure(evs, gap_us, cap_us, state=None):
    """The shared sessionizer kernel: fold sorted (ts_us, event_type)
    events into closed sessions + the still-open session.

    A session closes when the inter-event gap exceeds ``gap_us`` OR the
    session duration would exceed ``cap_us`` — the duration cap is the
    semantics built-in ``session_window`` cannot express and the reason
    this is a custom stateful operator. Used identically by the
    streaming state function and the batch twin, so the two are
    differentially testable.
    """
    sessions = []
    s = list(state) if state is not None else None
    for ts, et in evs:
        if s is None:
            s = [ts, ts, 1, et, et]
        elif ts - s[1] > gap_us or ts - s[0] > cap_us:
            sessions.append(tuple(s))
            s = [ts, ts, 1, et, et]
        else:
            s[1] = ts
            s[2] += 1
            s[4] = et
    return sessions, (tuple(s) if s is not None else None)


def _session_rows(sessions, user_id, gap_us):
    import pandas as pd

    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": [pd.Timestamp(s[0], unit="us") for s in sessions],
            "session_end": [pd.Timestamp(s[1] + gap_us, unit="us") for s in sessions],
            "n_events": [s[2] for s in sessions],
            "first_event": [s[3] for s in sessions],
            "last_event": [s[4] for s in sessions],
        }
    )


def stream_sessionize_capped(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MIN,
    cap_minutes: int = SESSION_CAP_MIN,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``:
    per-user sessions with BOTH an inactivity gap and a max-duration
    cap, carrying first/last event types.

    State shape at 100 TB: one tiny tuple per open (user) session in
    the state store, partitioned by the group key; closed sessions are
    emitted and the tuple replaced. An event-time timeout at
    last_ts + gap flushes idle sessions as the watermark passes them —
    state is bounded by active users, not stream length. The watermark
    delay must cover expected event lateness (an in-gap event arriving
    after its session timed out starts a new session, exactly as a
    gap-split would).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    cap_us = cap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            (s,) = [state.get] if state.exists else [None]
            state.remove()
            if s is not None:
                yield _session_rows([tuple(s)], user_id, gap_us)
            return
        evs = []
        for pdf in pdf_iter:
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                evs.append((ts.value // 1000, et))
        evs.sort()
        prev = tuple(state.get) if state.exists else None
        closed, open_s = sessionize_pure(evs, gap_us, cap_us, prev)
        if open_s is not None:
            state.update(open_s)
            # Flush when the watermark passes the inactivity deadline.
            state.setTimeoutTimestamp((open_s[1] + gap_us) // 1000)
        if closed:
            yield _session_rows(closed, user_id, gap_us)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            _SESSION_OUT_SCHEMA,
            _SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_sessionize_capped_tws(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MIN,
    cap_minutes: int = SESSION_CAP_MIN,
    watermark: str = "0 seconds",
) -> DataFrame:
    """The same capped sessionizer on ``transformWithStateInPandas`` —
    Spark 4's successor to applyInPandasWithState (explicit typed state
    handles + first-class timers instead of one opaque state tuple +
    GroupStateTimeout). Kept alongside the original so both custom
    stateful surfaces stay exercised; the kernel
    (:func:`sessionize_pure`) is shared, so the two streams and the
    batch twin are all differentially testable against each other.

    Environment note: executing this operator needs the RocksDB state
    store provider (bundled with Spark) AND the Python ``protobuf``
    package (the TWS state-server protocol; NOT in this container, so
    the equality test skips execution here and pins the built plan
    instead — on a real cluster ``pip install protobuf`` and the same
    test runs end-to-end).
    """
    from pyspark.sql.streaming import StatefulProcessor

    gap_us = gap_minutes * 60 * 1_000_000
    cap_us = cap_minutes * 60 * 1_000_000

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            self._state = handle.getValueState("open_session", _SESSION_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            evs = []
            for pdf in rows:
                for ts, et in zip(pdf["ts"], pdf["event_type"]):
                    evs.append((ts.value // 1000, et))
            evs.sort()
            prev = tuple(self._state.get()) if self._state.exists() else None
            closed, open_s = sessionize_pure(evs, gap_us, cap_us, prev)
            # Replace the inactivity timer: one live timer per key.
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            if open_s is not None:
                self._state.update(tuple(open_s))
                self._handle.registerTimer((open_s[1] + gap_us) // 1000)
            if closed:
                yield _session_rows(closed, user_id, gap_us)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            (user_id,) = key
            if self._state.exists():
                s = tuple(self._state.get())
                self._state.clear()
                yield _session_rows([s], user_id, gap_us)

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            _SessionProcessor(), _SESSION_OUT_SCHEMA, "Append", "EventTime"
        )
    )


def batch_sessionize_capped(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MIN,
    cap_minutes: int = SESSION_CAP_MIN,
) -> DataFrame:
    """Batch twin of :func:`stream_sessionize_capped` — the same
    kernel over the whole history per user via ``applyInPandas``
    (open tail sessions are closed at end-of-input). The streaming
    result must equal this once the watermark has flushed everything —
    pinned by tests/test_streaming.py."""
    gap_us = gap_minutes * 60 * 1_000_000
    cap_us = cap_minutes * 60 * 1_000_000

    def per_user(pdf):
        evs = sorted(
            (ts.value // 1000, et) for ts, et in zip(pdf["ts"], pdf["event_type"])
        )
        closed, open_s = sessionize_pure(evs, gap_us, cap_us)
        if open_s is not None:
            closed.append(open_s)
        return _session_rows(closed, int(pdf["user_id"].iloc[0]), gap_us)

    return events.groupBy("user_id").applyInPandas(per_user, _SESSION_OUT_SCHEMA)
