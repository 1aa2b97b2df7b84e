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


# --- watermark late-data ledger (the last live-only streaming name) ---

_WM_DELAY_US = 30 * 60 * 1_000_000  # 30-minute watermark, micros
# Prefix-max bucket sizing CONTRACT (ADVICE r7): the "~n/2^36 rows at
# the global window" claim assumes event_id is a DENSE, roughly
# sequential ingest position (the testdata PK and any monotone ingest
# counter satisfy this). With sparse id spaces (snowflake-style
# time<<22|seq, UUID-derived), nearly every row lands in its own b1
# bucket and the single-partition window degrades to ~n/2^16 rows —
# still correct (bucketing only needs to be MONOTONE in event_id; the
# within/across-bucket prefix-max algebra never assumes density) but
# no longer the advertised shape. For such id spaces, retune _WM_B1 to
# the id-space stride (e.g. 2^42 for snowflake ms-timestamps) or rank
# the ids into a dense position first. Bucket derivation uses integer
# `div`, exact for all int64 — the r7 shape went through double
# division, which misbuckets ids above 2^53 (ADVICE r7).
_WM_B1 = 1 << 20  # events per level-1 prefix-max bucket
_WM_B2 = 1 << 16  # level-1 buckets per super-bucket
_WM_MIN = -(1 << 62)  # "-infinity" sentinel: watermark before any event


@register(
    "watermark_late_data",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, ts, epoch_us(ts) AS tse FROM events
      WHERE event_id IS NOT NULL AND ts IS NOT NULL),
    wm AS (
      SELECT ts, tse,
             MAX(tse) OVER (ORDER BY event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS prior
      FROM ev)
    SELECT date_trunc('hour', ts) AS window_start,
           CAST(COUNT(CASE WHEN prior IS NULL
                            OR tse >= prior - {_WM_DELAY_US} THEN 1 END)
                AS BIGINT) AS n_accepted,
           CAST(COUNT(CASE WHEN prior IS NOT NULL
                           AND tse < prior - {_WM_DELAY_US} THEN 1 END)
                AS BIGINT) AS n_dropped
    FROM wm GROUP BY 1
    """,
)
def watermark_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-arrival DROP LEDGER, batch-expressed: replaying
    ``events`` in ``event_id`` (ingest) order under a 30-minute
    watermark, how many rows per 1-hour event-time window are accepted
    vs dropped as too late. A row is late iff its event time is more
    than the delay behind the maximum event time among all strictly
    earlier arrivals — the row-granular idealization of Structured
    Streaming's per-micro-batch watermark (the infinitesimal-batch
    limit; a real micro-batched run advances the watermark less often
    and therefore drops a SUBSET of this ledger's drops, which is what
    makes the ledger the deterministic, oracle-checkable bound). The
    live watermark path — real ``withWatermark`` + append-mode windowed
    aggregation over replayed files — is exercised in
    tests/test_streaming.py::test_watermark_drops_late_rows; this twin
    makes the semantics driver-checkable like the other streaming
    names. NULL event_id / ts rows are dropped (no ingest position /
    no event time), and ``event_id`` is unique by the PK contract
    (same as text_pack_sequences' doc_id) — the replay order, and
    therefore the ledger, is total and deterministic.

    Scale shape: the running max over arrival order is the same hazard
    as text_pack_sequences' running sum, and gets the same two-level
    distributed prefix treatment (prefix-max is associative): within-
    bucket exclusive running max (partitioned window, parallel),
    per-bucket maxes prefix-maxed within super-buckets (partitioned,
    parallel), and only the ~n/(2^36) super-bucket totals cross the
    one global window before offsets broadcast back down. One scan,
    one shuffle to bucket order, one 24-ish-row single-partition sort.
    """
    return _watermark_ledger(load_table(spark, sf_dir, "events"))


def _watermark_ledger(events: DataFrame) -> DataFrame:
    """watermark_late_data's body over an arbitrary events frame —
    unit tests replay hand-built late-arrival sequences through it."""
    e = (
        events
        .filter(F.col("event_id").isNotNull() & F.col("ts").isNotNull())
        # ts arrives TIMESTAMP_NTZ from the parquet footer; the session
        # is pinned UTC so the cast to (TZ-aware) TIMESTAMP is identity
        # and unix_micros is well-defined.
        .select(
            "event_id",
            "ts",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("tse"),
        )
        # integer div: exact for every int64 id and monotone in
        # event_id (all the prefix-max algebra requires — see the
        # contract note at _WM_B1)
        .withColumn("b1", F.expr(f"event_id div {_WM_B1}"))
    )
    from pyspark.sql import Window

    w1 = (
        Window.partitionBy("b1")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = e.withColumn("m1", F.max("tse").over(w1))

    t1 = e.groupBy("b1").agg(F.max("tse").alias("bmax"))
    t1 = t1.withColumn("b2", F.expr(f"b1 div {_WM_B2}"))
    w2 = (
        Window.partitionBy("b2")
        .orderBy("b1")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t1 = t1.withColumn("off1", F.max("bmax").over(w2))

    t2 = t1.groupBy("b2").agg(F.max("bmax").alias("b2max"))
    w3 = Window.orderBy("b2").rowsBetween(Window.unboundedPreceding, -1)
    t2 = t2.withColumn("off2", F.max("b2max").over(w3))

    mn = F.lit(_WM_MIN).cast("long")
    offs = t1.join(F.broadcast(t2.select("b2", "off2")), "b2").select(
        "b1",
        F.greatest(F.coalesce("off1", mn), F.coalesce("off2", mn)).alias("off"),
    )
    late = F.col("tse") < F.greatest(F.coalesce("m1", mn), F.col("off")) - F.lit(
        _WM_DELAY_US
    )
    return (
        e.join(offs, "b1")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(
            F.count(F.when(~late, 1)).cast("bigint").alias("n_accepted"),
            F.count(F.when(late, 1)).cast("bigint").alias("n_dropped"),
        )
    )
