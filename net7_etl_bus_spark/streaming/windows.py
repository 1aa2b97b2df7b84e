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
