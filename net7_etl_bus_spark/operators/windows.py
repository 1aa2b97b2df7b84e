"""Window functions and the as-of join (SURVEY.md §2.3).

Every window uses a total order (unique-key tiebreak) so results are
deterministic and oracle-hashable. At scale, window partitions must be
bounded (per-user, per-customer) — none of these ops sorts the whole
dataset in one partition; skewed partition keys are AQE's problem for
the shuffle and bounded-memory ExternalSorter's for the sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..plans.registry import register


@register(
    "win_rank_dense_rownum",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS BIGINT) AS price_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS BIGINT) AS price_dense_rank,
           CAST(ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey NULLS FIRST) AS BIGINT) AS price_rownum
    FROM part
    """,
)
def win_rank_dense_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number in one window pass (same partition
    spec ⇒ one shuffle + one sort shared by all three)."""
    p = load_table(spark, sf_dir, "part")
    w_rank = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    w_rn = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), "p_partkey")
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w_rank).cast("bigint").alias("price_rank"),
        F.dense_rank().over(w_rank).cast("bigint").alias("price_dense_rank"),
        F.row_number().over(w_rn).cast("bigint").alias("price_rownum"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           LAG(ts)  OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST, value NULLS FIRST) AS prev_ts,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST, value NULLS FIRST) AS next_ts,
           LAG(value, 1, 0.0) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST, value NULLS FIRST) AS prev_value
    FROM events
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event time — the building block for
    sessionization and as-of logic.

    `value` ends the ORDER BY for the same reason win_running_agg's
    measure does (r11 chaos find): (ts, event_id) is a total order on
    real data, but under mutation two rows can tie on both while
    differing in value, making prev_value engine-dependent; with the
    lagged measure in the key, fully-tied rows are identical in every
    output column, so any tie order yields the same row multiset."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id", "value")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        F.lag("value", 1, 0.0).over(w).alias("prev_value"),
    )


@register(
    "win_running_agg",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CASE WHEN MAX(CASE WHEN o_totalprice IS NOT NULL AND
                              (isnan(o_totalprice) OR abs(o_totalprice) >= 1e15)
                         THEN 1 ELSE 0 END) OVER w = 1
                THEN CAST('NaN' AS DOUBLE)
                ELSE CAST(SUM(CASE WHEN NOT isnan(o_totalprice)
                                    AND abs(o_totalprice) < 1e15
                              THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
                          OVER w AS DOUBLE)
           END AS running_spend,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST, o_totalprice NULLS FIRST) AS BIGINT)
             AS order_seq
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST, o_totalprice NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per customer. Decimal accumulation
    keeps the prefix sums exact so both engines agree bit-for-bit.

    The ORDER BY ends with the summed measure itself: on real data
    (o_orderdate, o_orderkey) is already a total order per customer,
    but a ROWS-frame prefix sum is engine-dependent the moment two
    rows tie on the full sort key while DIFFERING in the measure —
    their interleaving position gets S+p1 vs S+p2 depending on which
    engine put which row first. The r11 chaos fuzz (seed 6) produced
    exactly that: two hot-custkey rows with both date and orderkey
    nulled and distinct prices, 1/1545 rows diverging. With the
    measure as the final key, fully-tied rows are identical in every
    output column, so any tie order yields the same row multiset
    (NaN sorts greatest in BOTH engines' ORDER BY, unlike its
    comparison semantics, so the poison rows order consistently
    too)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey", "o_totalprice"
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Extremes poison contract over the running frame: a NaN/Inf/out-
    # of-decimal-domain price makes every prefix sum that includes it
    # NaN (the non-ANSI decimal cast silently dropped such rows; the
    # strict oracle cast errored).
    pr = F.col("o_totalprice")
    ok = ~F.isnan(pr) & (F.abs(pr) < F.lit(1e15))
    bad = F.max(F.when(pr.isNotNull() & ~ok, 1).otherwise(0)).over(frame)
    good = F.sum(F.when(ok, pr).cast("decimal(18,2)")).over(frame).cast("double")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.when(bad == 1, F.lit(float("nan"))).otherwise(good).alias("running_spend"),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
           CAST(COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
                               RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT)
             AS n_similar_size
    FROM part
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering key — counts parts whose
    size is within ±5 of the current row's size, per brand."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_size").rangeBetween(-5, 5)
    return p.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_similar_size"),
    )


@register(
    "win_ntile_percent",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(NTILE(4) OVER (ORDER BY c_acctbal NULLS FIRST, c_custkey NULLS FIRST) AS BIGINT) AS bal_quartile,
           CAST(CUME_DIST() OVER (ORDER BY c_acctbal NULLS FIRST) AS DOUBLE) AS bal_cume_dist
    FROM customer
    """,
)
def win_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile/cume_dist). Single global
    window — fine for ranking dimension-sized tables; for fact-scale
    data use approx percentiles instead (see text stats)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    w_cd = Window.orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).cast("bigint").alias("bal_quartile"),
        F.cume_dist().over(w_cd).cast("double").alias("bal_cume_dist"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER w AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over the full partition frame —
    each order row annotated with its customer's first, last, and
    second order. The frame is pinned to UNBOUNDED..UNBOUNDED in both
    engines (the default RANGE..CURRENT ROW frame would make
    last_value degenerate to the current row).

    One per-customer window shared by all three functions: one shuffle
    on o_custkey, one sort, partitions bounded by per-customer order
    counts."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


# --- as-of join ---------------------------------------------------------

_ASOF_ORACLE = """
WITH signups AS (
  SELECT user_id, ts AS signup_ts FROM events WHERE event_type = 'signup'
),
other AS (
  SELECT event_id, user_id, ts, event_type FROM events WHERE event_type <> 'signup'
)
SELECT o.event_id, o.user_id, o.ts, o.event_type,
       (SELECT MAX(s.signup_ts) FROM signups s
        WHERE s.user_id = o.user_id AND s.signup_ts <= o.ts) AS last_signup_ts
FROM other o
"""


@register("join_asof", oracle=_ASOF_ORACLE)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each event matched to the most recent
    signup at-or-before it for the same user.

    Spark lacks a native as-of join, so this is the documented custom
    operator (SURVEY.md §2.3): union both sides tagged, one window pass
    carries the latest right-side timestamp forward (``last(ignorenulls)``),
    then filter back to left rows. One shuffle on (user_id), no
    pandas/Python in the path, and — unlike a naive
    range-join-then-max — no row blowup on users with many matches.
    """
    e = load_table(spark, sf_dir, "events")
    # The side tag is an explicit LITERAL, not derived from event_id
    # nullness — a left row with NULL event_id (routine in real data;
    # found by the null-injection fuzz) would otherwise be silently
    # reclassified as a right row and dropped from the output.
    left = e.filter(F.col("event_type") != "signup").select(
        "event_id", "user_id", "ts", "event_type",
        F.lit(None).cast("timestamp").alias("r_ts"),
        F.lit(1).alias("is_left"),
    )
    right = e.filter(F.col("event_type") == "signup").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.lit(None).cast("string").alias("event_type"),
        F.col("ts").alias("r_ts"),
        F.lit(0).alias("is_left"),
    )
    # Order: at equal ts, right rows sort before left rows (is_left=1
    # after 0) so a signup at exactly l.ts matches (<= semantics).
    unioned = left.unionByName(right)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        # NULL event-time -> NULL match, explicitly (nulls-first order
        # already yields NULL here, but the semantics shouldn't hinge
        # on sort defaults).
        unioned.withColumn(
            "last_signup_ts",
            F.when(
                # NULL join key never matches in SQL — but a window
                # PARTITION BY groups the NULL-user rows together, so
                # mask those alongside NULL event-times.
                F.col("ts").isNotNull() & F.col("user_id").isNotNull(),
                F.last("r_ts", ignorenulls=True).over(w),
            ),
        )
        .filter(F.col("is_left") == 1)
        .select("event_id", "user_id", "ts", "event_type", "last_signup_ts")
    )


@register("join_asof_pandas", oracle=_ASOF_ORACLE)
def join_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics via ``applyInPandas`` + ``merge_asof`` —
    the Arrow-batched escape hatch pattern for semantics DataFrame ops
    can't express. Co-groups both sides by user_id (one shuffle each),
    then runs pandas' backward merge per group. Kept alongside
    ``join_asof`` to differentially test the custom-UDF path against
    the pure-DataFrame path (and the DuckDB oracle).

    Timestamps cross the UDF boundary as INT64 MICROSECONDS, never as
    timestamps (clock-fuzz find, r13): the Python worker converts each
    Arrow batch to pandas with a hardcoded timestamp[us] ->
    datetime64[ns] cast, so ONE far-range event time (anything past
    2262-04-11, e.g. a corrupted-writer year-9999 row) killed the
    whole task — at scale, one bad row takes down the executor. The
    µs longs are exact at any representable magnitude (no datetime64
    anywhere in the UDF), and timestamp_micros() round-trips
    losslessly. NULL event times and NULL user ids never enter the
    UDF at all: those left rows union back with a NULL match
    DataFrame-side (a NULL join key never matches in SQL; merge keys
    must be non-null — the null-injection fuzz found that crash
    first), NULL-ts signups can never be "most recent at-or-before" —
    and with both columns null-free inside the kernel, every column
    crosses as exact int64 (a bigint column with any NULL degrades to
    float64 in pandas — lossy past 2^53).

    OPTIMIZATION_r13 (guide §4.5 — amortize per-call overhead): the
    cogroup runs per SALT BUCKET (pmod(xxhash64(user_id), B)), not per
    user — ~1.4 ms of per-group Python glue x |users| dominated the
    runtime (6.2 s at sf0.1; 1.6 s bucketed, 3.8x, value-identical —
    OPTIMIZATION_r13.md). The kernel handles every user of a bucket in
    one vectorized pass: dense-rank users and timestamps, pack
    (user_rank, ts_rank) into ONE exact int64 that is
    order-isomorphic to (user, ts), and one searchsorted
    side='right'-1 over the packed right keys is exactly the per-user
    backward <= match; the matched VALUE is recovered from the
    ts-rank — int64 end-to-end, no float in any key path (pd.merge_asof
    would emit matched keys as float64 — a matched year-9999 signup
    would come back 1 µs off). B adapts to the input row count from
    parquet footers (floor = defaultParallelism, cap 65536 — guide
    §2.5 synthetic keys); results never depend on B."""
    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") != "signup").select(
        "event_id", "user_id", "ts", "event_type"
    )
    left_nomatch = left.filter(
        F.col("ts").isNull() | F.col("user_id").isNull()
    ).withColumn("last_signup_ts", F.lit(None).cast("timestamp"))
    # NTZ-proof epoch-µs extraction (events.ts arrives TIMESTAMP_NTZ;
    # unix_micros only accepts LTZ): exact integer µs since the epoch
    # wall time, no session-TZ dependence (UTC session makes LTZ↔NTZ
    # casts the identity anyway).
    to_us = (
        "timestampdiff(MICROSECOND, "
        "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), CAST(ts AS TIMESTAMP_NTZ))"
    )
    from ..data import table_rows

    rows = table_rows(sf_dir, "events")
    par = max(spark.sparkContext.defaultParallelism, 1)
    n_buckets = min(max((rows or 4096 * par) // 2048, par), 65536)
    bkt = F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)).alias("bkt")
    left_us = left.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select("event_id", "user_id", F.expr(to_us).alias("ts_us"), "event_type", bkt)
    # The right-side user id needs its own name: both sides resolve to
    # the SAME scan attribute, and the cogroup's child pruning dedups
    # an attribute the two sides share — r_user keeps the column alive
    # in the right pdf.
    right_us = e.filter(
        (F.col("event_type") == "signup")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    ).select(F.col("user_id").alias("r_user"), F.expr(to_us).alias("signup_us"), bkt)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        out = lpdf.drop(columns=["bkt"]).copy()
        n = len(out)
        if rpdf.empty or n == 0:
            out["last_signup_us"] = pd.array([None] * n, dtype="Int64")
            return out
        lu = out["user_id"].to_numpy(dtype="int64")
        lv = out["ts_us"].to_numpy(dtype="int64")
        ru = rpdf["r_user"].to_numpy(dtype="int64")
        rv = rpdf["signup_us"].to_numpy(dtype="int64")
        users = np.unique(np.concatenate([lu, ru]))
        lur = np.searchsorted(users, lu).astype("int64")
        rur = np.searchsorted(users, ru).astype("int64")
        all_ts = np.unique(np.concatenate([lv, rv]))
        # rank keys are bucket-local (< |bucket rows|), so the packed
        # product stays far under 2^63
        width = np.int64(len(all_ts) + 1)
        ltr = np.searchsorted(all_ts, lv).astype("int64")
        rtr = np.searchsorted(all_ts, rv).astype("int64")
        rkey = np.sort(rur * width + rtr)
        pos = np.searchsorted(rkey, lur * width + ltr, side="right") - 1
        cand = np.clip(pos, 0, None)
        matched = (pos >= 0) & (rkey[cand] // width == lur)
        vals = all_ts[rkey[cand] % width]
        out["last_signup_us"] = pd.arrays.IntegerArray(
            vals.astype("int64"), mask=~matched
        )
        return out

    schema = (
        "event_id bigint, user_id bigint, ts_us bigint, "
        "event_type string, last_signup_us bigint"
    )
    merged = (
        left_us.groupBy("bkt")
        .cogroup(right_us.groupBy("bkt"))
        .applyInPandas(lambda l, r: merge(l, r), schema)
        .select(
            "event_id",
            "user_id",
            F.timestamp_micros("ts_us").alias("ts"),
            "event_type",
            F.timestamp_micros("last_signup_us").alias("last_signup_ts"),
        )
    )
    return merged.unionByName(left_nomatch)


@register(
    "join_asof_forward",
    oracle="""
    WITH signups AS (
      SELECT user_id, ts AS signup_ts FROM events WHERE event_type = 'signup'
    ),
    other AS (
      SELECT event_id, user_id, ts, event_type FROM events WHERE event_type <> 'signup'
    )
    SELECT o.event_id, o.user_id, o.ts, o.event_type,
           (SELECT MIN(s.signup_ts) FROM signups s
            WHERE s.user_id = o.user_id AND s.signup_ts >= o.ts) AS next_signup_ts
    FROM other o
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event matched to the EARLIEST signup
    at-or-after it (pandas ``merge_asof(direction='forward')``) — the
    mirror of :func:`join_asof`, needed for "time to next conversion"
    style attribution.

    Same single-shuffle union+window formulation: both sides tagged
    and unioned, one (user_id) window carries the nearest future
    right-side timestamp backward via ``first(ignorenulls)`` over the
    CURRENT..UNBOUNDED FOLLOWING frame. At equal ts the left row
    sorts BEFORE the signup (sort_key 0 < 1) so the frame includes a
    same-instant signup — the >= semantics, exactly.
    """
    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") != "signup").select(
        "event_id", "user_id", "ts", "event_type",
        F.lit(None).cast("timestamp").alias("r_ts"),
        F.lit(0).alias("sort_key"),
    )
    right = e.filter(F.col("event_type") == "signup").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.lit(None).cast("string").alias("event_type"),
        F.col("ts").alias("r_ts"),
        F.lit(1).alias("sort_key"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "sort_key")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        left.unionByName(right)
        # NULL event-time -> NULL match (comparison against NULL is
        # undefined). Without the mask, null-ts left rows sort FIRST
        # (Spark ASC default) and their FOLLOWING frame would capture
        # every future signup — found by the null-injection fuzz.
        .withColumn(
            "next_signup_ts",
            F.when(
                F.col("ts").isNotNull() & F.col("user_id").isNotNull(),
                F.first("r_ts", ignorenulls=True).over(w),
            ),
        )
        .filter(F.col("sort_key") == 0)
        .select("event_id", "user_id", "ts", "event_type", "next_signup_ts")
    )


# --- running distinct count ---------------------------------------------


@register(
    "win_running_distinct",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts NULLS FIRST, event_id NULLS FIRST) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events WHERE event_id IS NOT NULL)
    SELECT event_id, user_id, ts, event_type,
           CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS distinct_types_so_far
    FROM f
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per partition — "how many distinct event
    types has this user produced so far?" — which no engine supports as
    a native window aggregate (COUNT(DISTINCT ...) OVER is rejected by
    both Spark and DuckDB). The standard rewrite: mark each (user,
    type)'s first occurrence with a row_number window, then running-sum
    the 0/1 markers in event order.

    Scale shape: two window passes — the marker partitions by
    (user_id, event_type), the prefix sum by user_id; each is one
    hash-partitioned shuffle + bounded per-user sort, with no blowup
    (the intermediate is exactly one 0/1 column wider than the input).
    Deterministic: both orderings carry the unique event_id tiebreak,
    and the output is an exact integer.
    """
    # Sequencing requires event IDENTITY: two rows with NULL ts AND
    # NULL event_id cannot be totally ordered, so their running counts
    # are engine-arbitrary (fuzz-found). The unique non-null event_id
    # is what makes every window order here total.
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id").isNotNull())
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return marked.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.sum("first_seen").over(w_run).cast("bigint").alias("distinct_types_so_far"),
    )


# --- gaps and islands -------------------------------------------------


@register(
    "win_gaps_islands",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS island
      FROM events WHERE event_id IS NOT NULL)
    SELECT user_id, event_type,
           MIN(ts) AS island_start,
           MAX(ts) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS run_length
    FROM marked
    GROUP BY user_id, event_type, island
    HAVING COUNT(*) >= 2
    ORDER BY user_id, island_start
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user (>= 2 long), via the classic two-row_number difference —
    the run-length-encoding shape behind streak analytics, downtime
    detection, and state-run compression.

    Both row_numbers share the user_id shuffle (the second adds
    event_type to the partition key but Spark plans it over the same
    exchange-compatible sort), and the island aggregate groups by the
    difference — constant within a run by construction.

    Sequencing requires event IDENTITY (the win_running_distinct
    contract, re-found by the r11 ties fuzz): the two-row_number
    technique pairs each ROW's positions under two different windows,
    and two rows tied on EVERY order column — possible once event_id
    can be NULL — get engine-arbitrary cross-pairings that can split
    or merge islands (an ORDER BY tiebreak cannot fix identical rows;
    the pairing itself is the ambiguity). NULL-event_id rows are
    dropped, after which the unique non-null event_id makes both
    window orders total and every island boundary deterministic.

    Scale shape: one user_id shuffle + per-user sorts, then a hash
    aggregate whose key count is the number of runs — no self-join,
    no blowup.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull()
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("island"),
    )
    return (
        marked.groupBy("user_id", "event_type", "island")
        .agg(
            F.min("ts").alias("island_start"),
            F.max("ts").alias("island_end"),
            F.count(F.lit(1)).cast("bigint").alias("run_length"),
        )
        .filter(F.col("run_length") >= 2)
        .select("user_id", "event_type", "island_start", "island_end", "run_length")
        .orderBy("user_id", "island_start")
    )
