"""Event-time windowed aggregations — batch-checkable semantics.

These register the *semantics* of the streaming window operators
(tumbling / sliding / session / keyed dedup) as batch queries over the
``events`` table so the DuckDB oracle can verify them. The actual
``readStream``-based versions (with watermarks, AvailableNow triggers,
and state-store-backed dedup) live in
:mod:`net7_etl_bus_spark.streaming.windows` and are exercised by
tests/test_streaming.py — Structured Streaming guarantees a streaming
windowed aggregate converges to exactly its batch equivalent, which is
what makes this split sound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..plans.registry import dsum, register, sql_dsum


@register(
    "win_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
    """,
)
def win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows per event type. In streaming
    mode the same expression runs incrementally with a watermark
    bounding state; batch mode is the ground truth."""
    e = load_table(spark, sf_dir, "events")
    # window() silently drops NULL event times; filter explicitly so
    # the semantics (null event time = no window, matching watermark
    # behavior) don't hinge on generator internals.
    return (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "win_sliding",
    oracle=f"""
    WITH expanded AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS window_start,
             value
      FROM events, UNNEST([0, 1]) AS t(k)
      WHERE ts IS NOT NULL
    )
    SELECT window_start, COUNT(*) AS n_events, {sql_dsum('value')} AS sum_value
    FROM expanded GROUP BY window_start
    """,
)
def win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h length, 30m slide): every event belongs to
    exactly 2 windows. Spark expands via the window() generator; the
    oracle expands explicitly with the k∈{0,1} shift trick."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("win.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "win_session",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
                       <= INTERVAL '10 minutes'
                  THEN 0 ELSE 1 END AS is_new_session
      FROM events
      WHERE ts IS NOT NULL
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '10 minutes' AS session_end,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM numbered GROUP BY user_id, session_no
    """,
)
def win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user via the built-in
    session_window — Spark merges events whose gaps are <= 10m (each
    event's window is [ts, ts+gap) and TOUCHING windows coalesce, so
    an event at exactly last+gap extends the session); the session end
    is last_event + gap. The oracle reproduces this with the classic
    gaps-and-islands construction using the matching ``<=`` — its
    original ``<`` diverged at the exact boundary, which the
    hypothesis model test caught and no data fuzz could (real event
    times never land on the boundary; oracle comments are impossible
    because the registry collapses oracle SQL to one line). In
    streaming mode the identical expression runs with
    ``withWatermark`` and state-store session merging."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("ts").isNotNull())
        .groupBy("user_id", F.session_window("ts", "10 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup semantics (which keys survive is deterministic;
    which *row* represents each key is not, so only keys are output).
    The streaming twin is dropDuplicatesWithinWatermark, tested in
    tests/test_streaming.py."""
    e = load_table(spark, sf_dir, "events")
    return e.select("user_id", "event_type").distinct()


@register(
    "stream_dedup_first_event",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS rk
      FROM events) t
    WHERE rk = 1
    """,
)
def stream_dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'keep first by event time' dedup — the
    well-defined version of dropDuplicates, expressed as a ranked
    window so batch and oracle agree row-for-row."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


@register(
    "stream_join_attrib",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           p.ts AS purchase_ts,
           p.value AS purchase_value,
           c.event_id AS click_id,
           c.ts AS click_ts
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL '30 minutes'
     AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def stream_join_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (:func:`net7_etl_bus_spark.streaming.joins.stream_click_attribution`):
    purchases joined to same-user clicks in the preceding 30 minutes.
    Runs the IDENTICAL dataflow function on the batch events table —
    the streaming run (watermarked, state-store-backed; see
    tests/test_streaming.py) must converge to exactly this result."""
    from .joins import stream_click_attribution

    e = load_table(spark, sf_dir, "events")
    return stream_click_attribution(e)
