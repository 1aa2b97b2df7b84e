"""Dataset-analysis aggregates: histograms, exact-moment regression,
one-pass column profiling, and event-sequence transition analysis.

These extend the §2.3 aggregation surface with the shapes an analyst
(or a training-data curator scanning 100 TB of logs) reaches for next:
"what does this column look like" (histogram / profile), "how do these
two measures relate" (regression), and "what do users do next"
(transition matrix). All four are single-scan, map-side-combinable
aggregations — the only shuffle in each is the final groupBy on a
low-cardinality key, so the plans scale linearly with input size.

Cross-engine determinism follows the repo-wide rules
(plans/registry.py docstring): counts and bucket ids are exact
integers; float math happens only in final expressions evaluated on
identical operands in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import probes
from ..data import load_table, scan_parallel
from ..plans.registry import ddouble, dsum, register, sql_ddouble, sql_dsum

# --- agg_histogram ----------------------------------------------------

_H_LO = 0.0
_H_W = 25_000.0  # bin width over l_extendedprice's [900, 105e3] range
_H_NB = 5


@register(
    "agg_histogram",
    oracle=f"""
    SELECT bucket,
           {_H_LO} + bucket * {_H_W} AS bin_lo,
           {_H_LO} + (bucket + 1) * {_H_W} AS bin_hi,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('l_extendedprice')} AS sum_price
    FROM (
      SELECT l_extendedprice,
             CASE WHEN l_extendedprice IS NULL THEN NULL
                  WHEN isnan(l_extendedprice) OR abs(l_extendedprice) >= 1e18
                  THEN -1
                  ELSE LEAST(GREATEST(CAST(FLOOR((l_extendedprice - {_H_LO}) / {_H_W}) AS BIGINT),
                             0), {_H_NB - 1}) END AS bucket
      FROM lineitem)
    GROUP BY bucket ORDER BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram of a measure — the `width_bucket` shape,
    spelled with clamp+floor arithmetic so the bucket id is the exact
    same integer in both engines (width_bucket's edge-inclusion rules
    differ subtly across engines; floor on one IEEE division does
    not).

    Scale shape: the bucket id is a narrow map-side expression, the
    groupBy key has `_H_NB` values — partial aggregation collapses
    each task to <= `_H_NB` rows before the (tiny) shuffle. This is
    the plan a 100 TB histogram needs: all the work is in the scan.
    """
    l = load_table(spark, sf_dir, "lineitem")
    # Corrupt measures are SURFACED: NaN/Inf/overflow-range values land
    # in bucket -1 (their own row) instead of erroring (DuckDB int64
    # cast) or silently falling into a NULL bucket (Spark non-ANSI
    # cast); in-domain sums use the dsum poison contract. NULL
    # measures get their OWN explicit NULL bucket: without the branch,
    # floor(NULL)=NULL but greatest/least SKIP nulls in both engines,
    # so NULL rows silently landed in bucket 0 — counted as real low
    # values, laundering exactly the class of missing measure the
    # histogram must surface (advice r4).
    x = F.col("l_extendedprice")
    bucket = F.when(x.isNull(), F.lit(None).cast("bigint")).when(
        F.isnan(x) | (F.abs(x) >= F.lit(1e18)), F.lit(-1)
    ).otherwise(
        F.least(
            F.greatest(F.floor((x - _H_LO) / _H_W).cast("bigint"), F.lit(0)),
            F.lit(_H_NB - 1),
        )
    )
    return (
        l.select(F.col("l_extendedprice"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dsum("l_extendedprice").alias("sum_price"),
        )
        .select(
            "bucket",
            (F.lit(_H_LO) + F.col("bucket") * _H_W).alias("bin_lo"),
            (F.lit(_H_LO) + (F.col("bucket") + 1) * _H_W).alias("bin_hi"),
            "n",
            "sum_price",
        )
        .orderBy("bucket")
    )


# --- agg_regr ---------------------------------------------------------


@register(
    "agg_regr",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             CASE WHEN ok THEN CAST(FLOOR(l_quantity * 100) AS HUGEINT) END AS xq,
             CASE WHEN ok THEN CAST(FLOOR(l_extendedprice * 100) AS HUGEINT) END AS yq,
             CASE WHEN NOT ok AND NOT ign THEN 1 ELSE 0 END AS badrow
      FROM (SELECT *,
              l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
              AND NOT isnan(l_quantity) AND NOT isnan(l_extendedprice)
              AND abs(l_quantity) < 1e11 AND abs(l_extendedprice) < 1e11 AS ok,
              l_quantity IS NULL OR l_extendedprice IS NULL AS ign
            FROM lineitem)),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             MAX(badrow) AS bad,
             SUM(xq) AS sx, SUM(yq) AS sy,
             SUM(xq * xq) AS sxx, SUM(yq * yq) AS syy, SUM(xq * yq) AS sxy
      FROM q GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           CASE WHEN bad = 1 THEN CAST('NaN' AS DOUBLE) ELSE {cov} / {varx} END AS slope,
           CASE WHEN bad = 1 THEN CAST('NaN' AS DOUBLE) ELSE ({sy} / {n100}) - ({cov} / {varx}) * ({sx} / {n100}) END AS intercept,
           CASE WHEN bad = 1 THEN CAST('NaN' AS DOUBLE) ELSE ({cov} * {cov}) / ({varx} * {vary}) END AS r2
    FROM m ORDER BY l_returnflag
    """.format(
        cov=sql_ddouble("n * sxy - sx * sy"),
        varx=sql_ddouble("n * sxx - sx * sx"),
        vary=sql_ddouble("n * syy - sy * sy"),
        sx=sql_ddouble("sx"),
        sy=sql_ddouble("sy"),
        n100=sql_ddouble("n * 100"),
    ),
)
def agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares regression (slope / intercept / R²) of price on
    quantity per return flag — the `regr_slope` family, computed from
    EXACT integer moments (the agg_stats_moments pattern: inputs
    quantized to 0.01, five raw moments summed as 38-digit integers,
    floats only in the final divisions). Built-in regr_* aggregates
    are summation-order-dependent and can't hash-match cross-engine.

    The x/y quantization scales cancel in the slope (both are 100x),
    so no rescaling is needed; the intercept divides each mean by its
    own 100x. Scale shape: identical to any one-pass moment sketch —
    map-side integer partial sums, 3-row final aggregate.
    """
    l = load_table(spark, sf_dir, "lineitem")
    # Moment-domain guard (extremes contract): any NaN/Inf or
    # |value| >= 1e11 (whose squared quantized moment would overflow
    # the exact decimal(38) accumulators) poisons the group's outputs
    # to NaN — surfaced, never silently dropped or saturated.
    xr, yr = F.col("l_quantity"), F.col("l_extendedprice")
    ok = (
        xr.isNotNull() & yr.isNotNull()
        & ~F.isnan(xr) & ~F.isnan(yr)
        & (F.abs(xr) < F.lit(1e11)) & (F.abs(yr) < F.lit(1e11))
    )
    xd = F.when(ok, F.floor(xr * 100)).cast("decimal(38,0)")
    yd = F.when(ok, F.floor(yr * 100)).cast("decimal(38,0)")
    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        # incomplete pairs (either side NULL) are IGNORED per SQL
        # regr_* semantics; only corrupt COMPLETE pairs poison
        F.max(F.when(~ok & xr.isNotNull() & yr.isNotNull(), 1).otherwise(0)).alias("bad"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = ddouble(n * F.col("sxy") - sx * sy)
    varx = ddouble(n * F.col("sxx") - sx * sx)
    vary = ddouble(n * F.col("syy") - sy * sy)
    slope = cov / varx
    mean_x = ddouble(sx) / ddouble(n * 100)
    mean_y = ddouble(sy) / ddouble(n * 100)
    nan = F.lit(float("nan"))
    bad = F.col("bad") == 1
    return m.select(
        "l_returnflag",
        "n",
        F.when(bad, nan).otherwise(slope).alias("slope"),
        F.when(bad, nan).otherwise(mean_y - slope * mean_x).alias("intercept"),
        F.when(bad, nan).otherwise((cov * cov) / (varx * vary)).alias("r2"),
    ).orderBy("l_returnflag")


# --- profile_columns --------------------------------------------------

# (name, kind) for every orders column; kind picks which min/max slot
# the value lands in so the unpivoted rows share one schema.
_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _oracle_profile_one(col: str, kind: str) -> str:
    if kind == "num":
        mn = f"CAST(MIN({col}) AS DOUBLE)"
        mx = f"CAST(MAX({col}) AS DOUBLE)"
        mns, mxs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
    elif kind == "ts":
        mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        mns = f"strftime(MIN({col}), '%Y-%m-%d %H:%M:%S')"
        mxs = f"strftime(MAX({col}), '%Y-%m-%d %H:%M:%S')"
    else:
        mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        mns, mxs = f"MIN({col})", f"MAX({col})"
    return f"""
    SELECT '{col}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           {mn} AS min_num, {mx} AS max_num,
           {mns} AS min_str, {mxs} AS max_str
    FROM orders"""


@register(
    "profile_columns",
    oracle=" UNION ALL ".join(
        _oracle_profile_one(c, k) for c, k in _PROFILE_COLS
    )
    + " ORDER BY column_name",
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column dataset profile (rows / nulls / distinct / min / max)
    — the ANALYZE-TABLE shape a curator runs before trusting a new
    100 TB drop.

    Scale shape: ONE scan computes every column's statistics in a
    single aggregate (the oracle's UNION-ALL-per-column form would
    re-scan the table N_cols times); the wide 1-row result is then
    unpivoted driver-free with `stack`. count_distinct over multiple
    columns in one agg expands via Spark's Expand operator — still one
    pass over the input. Numeric min/max pass through as untouched
    doubles, timestamps are formatted with an explicit pattern, so
    every cell is bit-comparable across engines.
    """
    # scan_parallel (OPTIMIZATION_r13): the multi-count_distinct agg
    # expands every row N_distinct-agg-fold via Expand before the
    # partial aggregate — real per-row work on the scan task.
    o = scan_parallel(load_table(spark, sf_dir, "orders"), "o_orderkey")
    aggs = []
    for col, kind in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"{col}__rows"),
            (F.count(F.lit(1)) - F.count(col)).cast("bigint").alias(f"{col}__nulls"),
            F.count_distinct(F.col(col)).cast("bigint").alias(f"{col}__dist"),
        ]
        if kind == "num":
            aggs += [
                F.min(col).cast("double").alias(f"{col}__minn"),
                F.max(col).cast("double").alias(f"{col}__maxn"),
                F.lit(None).cast("string").alias(f"{col}__mins"),
                F.lit(None).cast("string").alias(f"{col}__maxs"),
            ]
        elif kind == "ts":
            aggs += [
                F.lit(None).cast("double").alias(f"{col}__minn"),
                F.lit(None).cast("double").alias(f"{col}__maxn"),
                F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss").alias(f"{col}__mins"),
                F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss").alias(f"{col}__maxs"),
            ]
        else:
            aggs += [
                F.lit(None).cast("double").alias(f"{col}__minn"),
                F.lit(None).cast("double").alias(f"{col}__maxn"),
                F.min(col).alias(f"{col}__mins"),
                F.max(col).alias(f"{col}__maxs"),
            ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', {col}__rows, {col}__nulls, {col}__dist, "
        f"{col}__minn, {col}__maxn, {col}__mins, {col}__maxs"
        for col, _ in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_rows, n_nulls, n_distinct, "
            "min_num, max_num, min_str, max_str)"
        )
    ).orderBy("column_name")


# --- event_transitions ------------------------------------------------


@register(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
               AS next_type
      FROM events)
    SELECT event_type, next_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type) AS DOUBLE)
             AS share
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY event_type, next_type
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences ("after a click, what happens next?") — the
    path-analysis primitive product analytics builds on.

    Scale shape: one shuffle on user_id orders each user's history for
    the LEAD; the pair-count groupBy then aggregates to
    |event_types|² rows, and the per-source share is a window over
    that tiny result. Deterministic: the sequence order has a unique
    (ts, event_id) tiebreak, counts are exact integers, and the share
    is one integer-over-integer IEEE division.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wt = Window.partitionBy("event_type")
    return (
        pairs.withColumn(
            "share",
            F.col("n").cast("double") / F.sum("n").over(wt).cast("double"),
        )
        .orderBy("event_type", "next_type")
    )


# --- anomaly_zscore ---------------------------------------------------


@register(
    "anomaly_zscore",
    oracle="""
    WITH q AS (
      SELECT event_id, event_type, value,
             CASE WHEN ok THEN CAST(FLOOR(value * 100) AS HUGEINT) END AS v,
             ok
      FROM (SELECT *,
              value IS NOT NULL AND NOT isnan(value) AND abs(value) < 1e11 AS ok
            FROM events)),
    m AS (
      SELECT event_type, CAST(COUNT(v) AS HUGEINT) AS n,
             SUM(v) AS s1, SUM(v * v) AS s2
      FROM q GROUP BY event_type),
    z AS (
      SELECT q.event_id, q.event_type, q.value,
             CASE WHEN NOT q.ok AND q.value IS NOT NULL THEN CAST('NaN' AS DOUBLE)
                  ELSE CAST(CAST(m.n * q.v - m.s1 AS VARCHAR) AS DOUBLE)
                    / sqrt(CAST(CAST(m.n * m.s2 - m.s1 * m.s1 AS VARCHAR) AS DOUBLE))
             END AS z
      FROM q JOIN m USING (event_type))
    SELECT event_id, event_type, value, z
    FROM z WHERE abs(z) > 2.5
    ORDER BY event_id
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier detection: events whose `value` is
    more than 2.5 population standard deviations from their
    event_type's mean — the first-pass anomaly filter a monitoring or
    data-quality sweep runs over raw logs.

    Numerics: values are quantized to 0.01 integers, the per-group
    moments (n, Σv, Σv²) are exact 38-digit sums, and the z-score is
    the algebraic identity z = (n·x − Σv) / sqrt(n·Σv² − (Σv)²) — the
    n's cancel, so the whole score is two exact integers pushed
    through one string-exact double conversion each, a sqrt and a
    divide: bit-identical across engines, so even the `> 2.5` cut
    selects the same rows.

    Scale shape: one scan computes the moments (map-side combinable,
    |event_types| rows out); the stats rejoin the stream via a
    broadcast, so the detector adds ZERO extra shuffles of the fact —
    the plan any 100 TB scoring pass needs.
    """
    e = load_table(spark, sf_dir, "events")
    # An anomaly detector must SURFACE corrupt measures, not average
    # them in or drop them: NaN/Inf/out-of-domain values score z=NaN
    # (always reported - NaN compares greater than 2.5 in both
    # engines) while the group stats use clean rows only.
    val = F.col("value")
    ok = val.isNotNull() & ~F.isnan(val) & (F.abs(val) < F.lit(1e11))
    q = e.select(
        "event_id",
        "event_type",
        "value",
        ok.alias("ok"),
        F.when(ok, F.floor(val * 100)).cast("decimal(38,0)").alias("v"),
    )
    m = q.groupBy("event_type").agg(
        F.count("v").cast("decimal(38,0)").alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    z = F.when(
        ~F.col("ok") & F.col("value").isNotNull(), F.lit(float("nan"))
    ).otherwise(ddouble(n * F.col("v") - s1) / F.sqrt(ddouble(n * s2 - s1 * s1)))
    return (
        q.join(F.broadcast(m), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 2.5)
        .orderBy("event_id")
    )


# --- skew_key_profile -------------------------------------------------


@register(
    "skew_key_profile",
    oracle="""
    WITH c AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_partkey),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY c.n DESC, c.l_partkey) AS BIGINT)
             AS rnk,
           c.l_partkey, c.n,
           CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
    FROM c, t
    ORDER BY c.n DESC, c.l_partkey
    LIMIT 20
    """,
)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile of a join/grouping key: the top-20 keys by
    row count with each key's share of the table — the diagnostic you
    run BEFORE a 100 TB join to decide whether it needs salting or an
    AQE skew split (operators/relational.py join_skew_salted is the
    cure; this is the thermometer).

    Scale shape: one groupBy collapses the fact to |keys| rows; the
    top-20 is TakeOrderedAndProject over that (no global sort of the
    counts), and the total rides along from the same aggregated
    relation, rejoined by broadcast — the count exchange is reused,
    not recomputed. Counts are exact ints; the share is one
    int-over-int IEEE division.
    """
    l = load_table(spark, sf_dir, "lineitem")
    counts = l.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    total = counts.agg(F.sum("n").cast("bigint").alias("total"))
    top = counts.orderBy(F.col("n").desc(), "l_partkey").limit(20)
    w = Window.orderBy(F.col("n").desc(), "l_partkey")
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("bigint").alias("rnk"),
            "l_partkey",
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias("share"),
        )
        .orderBy("rnk")
    )


# --- agg_weighted_avg -------------------------------------------------


@register(
    "agg_weighted_avg",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             CASE WHEN ok THEN CAST(FLOOR(l_quantity * 100) AS HUGEINT) END AS wq,
             CASE WHEN ok THEN CAST(FLOOR(l_extendedprice * 100) AS HUGEINT) END AS xq,
             CASE WHEN NOT ok AND NOT ign THEN 1 ELSE 0 END AS badrow
      FROM (SELECT *,
              l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
              AND NOT isnan(l_quantity) AND NOT isnan(l_extendedprice)
              AND abs(l_quantity) < 1e11 AND abs(l_extendedprice) < 1e11 AS ok,
              l_quantity IS NULL OR l_extendedprice IS NULL AS ign
            FROM lineitem))
    SELECT l_returnflag,
           CASE WHEN MAX(badrow) = 1 THEN CAST('NaN' AS DOUBLE) ELSE
             CAST(CAST(SUM(wq * xq) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(wq) AS VARCHAR) AS DOUBLE) / 100.0
           END AS wavg_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM q GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag — the weighted
    mean every revenue/mix analysis needs, which has no built-in
    aggregate in either engine.

    Both the numerator Σ(w·x) and denominator Σw are exact integer
    sums of 0.01-quantized inputs; the result is two string-exact
    double conversions and two IEEE divisions — bit-identical across
    engines (a float Σ(w·x) would be summation-order-dependent).

    Scale shape: single scan, map-side-combinable aggregate, 3-row
    result — all work in the scan stage, like every moment sketch.
    """
    l = load_table(spark, sf_dir, "lineitem")
    # Same moment-domain/poison contract as agg_regr (extremes fuzz).
    wr, xr = F.col("l_quantity"), F.col("l_extendedprice")
    ok = (
        wr.isNotNull() & xr.isNotNull()
        & ~F.isnan(wr) & ~F.isnan(xr)
        & (F.abs(wr) < F.lit(1e11)) & (F.abs(xr) < F.lit(1e11))
    )
    wq = F.when(ok, F.floor(wr * 100)).cast("decimal(38,0)")
    xq = F.when(ok, F.floor(xr * 100)).cast("decimal(38,0)")
    bad = F.max(F.when(~ok & wr.isNotNull() & xr.isNotNull(), 1).otherwise(0))
    good = ddouble(F.sum(wq * xq)) / ddouble(F.sum(wq)) / F.lit(100.0)
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.when(bad == 1, F.lit(float("nan"))).otherwise(good).alias("wavg_price"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("l_returnflag")
    )


# --- time-decay weighted aggregation ----------------------------------

_DECAY_REF_YEAR = 2001  # latest order year in the synthetic data
_DECAY_MAX_K = 8


@register(
    "agg_decay_weighted",
    oracle=f"""
    WITH k AS (
      SELECT o_orderpriority,
             LEAST(GREATEST({_DECAY_REF_YEAR} - year(o_orderdate), 0), {_DECAY_MAX_K}) AS k,
             CASE WHEN ok THEN CAST(FLOOR(o_totalprice * 100) AS HUGEINT) END AS cents,
             CASE WHEN NOT ok AND o_totalprice IS NOT NULL THEN 1 ELSE 0 END AS badrow
      FROM (SELECT *,
              o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)
              AND abs(o_totalprice) < 9e16 AS ok
            FROM orders))
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CASE WHEN MAX(badrow) = 1 THEN CAST('NaN' AS DOUBLE) ELSE
             {sql_ddouble(f"SUM(cents * (1 << ({_DECAY_MAX_K} - k)))")}
               / {100.0 * (1 << _DECAY_MAX_K)}
           END AS decayed_revenue
    FROM k GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_decay_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed revenue per order priority — the
    recency-weighted aggregate behind decayed popularity scores and
    half-life dashboards (weight = 2^-age_years, one-year half-life).

    Exactness trick: the decayed sum is computed ENTIRELY in integers —
    Σ cents·2^(K−k) with K = {_DECAY_MAX_K} — and divided by 100·2^K
    once at the end. Power-of-two weights make the rescale a pure
    exponent shift, so the result is bit-identical cross-engine and
    independent of partial-aggregation order (a float Σ price·w^age
    would be neither). Age clamps INTO [0, K]: the upper clamp keeps
    the shift from underflowing; the LOWER clamp (clock-fuzz find,
    r13) keeps a FUTURE order date — negative age, routine in real
    data from clock-skewed or corrupted writers — from exploding the
    shift count: unclamped, year 9999 made the shift 8006, which
    DuckDB rejects outright while Spark's shiftleft silently wraps
    the count mod 64 and produces a garbage weight. A future order
    now decays as age 0 (weight 1, the maximum) in both engines.

    Scale shape: one scan, one map-side-combining hash agg; the decay
    weight is a narrow per-row expression — no window, no self-join
    (contrast with the naive "join each row to a reference-date dim"
    formulation).
    """
    o = load_table(spark, sf_dir, "orders")
    # dsum-style poison (extremes contract): NaN/Inf/out-of-domain
    # revenue makes the group's decayed sum NaN instead of vanishing.
    pr = F.col("o_totalprice")
    ok = pr.isNotNull() & ~F.isnan(pr) & (F.abs(pr) < F.lit(9e16))
    term = F.when(ok, F.expr(
        f"CAST(FLOOR(o_totalprice * 100) AS DECIMAL(38,0)) * "
        f"CAST(shiftleft(1L, {_DECAY_MAX_K} - LEAST(GREATEST({_DECAY_REF_YEAR} - year(o_orderdate), 0), {_DECAY_MAX_K})) AS DECIMAL(38,0))"
    ))
    badrow = F.when(~ok & pr.isNotNull(), 1).otherwise(0)
    bad = F.max("badrow")
    good = ddouble(F.sum("t")) / F.lit(100.0 * (1 << _DECAY_MAX_K))
    return (
        o.select("o_orderpriority", term.alias("t"), badrow.alias("badrow"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.when(bad == 1, F.lit(float("nan"))).otherwise(good).alias(
                "decayed_revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )


# --- period-over-period change ----------------------------------------


@register(
    "win_pct_change",
    oracle=f"""
    WITH monthly AS (
      SELECT n.n_name AS nation,
             date_trunc('month', o.o_orderdate) AS month,
             {sql_dsum('o.o_totalprice')} AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, date_trunc('month', o.o_orderdate))
    SELECT nation, month, revenue,
           revenue - LAG(revenue) OVER w AS mom_delta,
           (revenue - LAG(revenue) OVER w) / LAG(revenue) OVER w AS mom_pct,
           revenue - LAG(revenue, 12) OVER w AS yoy_delta
    FROM monthly
    WINDOW w AS (PARTITION BY nation ORDER BY month NULLS FIRST)
    ORDER BY nation, month
    """,
)
def win_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period deltas: monthly revenue per nation with
    month-over-month delta/percent and year-over-year delta — the
    hypertable "compare to previous bucket" query every metrics
    dashboard runs.

    Determinism: monthly revenue goes through exact floor-scaled
    integer summation (dsum), so the LAG operands are bit-identical
    cross-engine; deltas are single IEEE subtractions/divisions on
    identical values. First-month rows carry NULL deltas (no fill-in)
    — same on both engines.

    Scale shape: the heavy lifting is the one groupBy (fact scanned
    once, dims broadcast); the window runs over the tiny
    nation x month series and shares its partitioning with nothing —
    at 100 TB the series is still only |nations| x |months| rows.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    monthly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("month", "o_orderdate").alias("month"),
        )
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("nation").orderBy("month")
    prev = F.lag("revenue").over(w)
    prev12 = F.lag("revenue", 12).over(w)
    return monthly.select(
        "nation",
        "month",
        "revenue",
        (F.col("revenue") - prev).alias("mom_delta"),
        ((F.col("revenue") - prev) / prev).alias("mom_pct"),
        (F.col("revenue") - prev12).alias("yoy_delta"),
    ).orderBy("nation", "month")


# --- bitmap-based exact distinct --------------------------------------


@register(
    "agg_bitmap_distinct",
    oracle="""
    WITH chunks AS (
      SELECT date_trunc('day', ts) AS day,
             (user_id - ((user_id % 32) + 32) % 32) // 32 AS chunk,
             bit_or(1::BIGINT << CAST(((user_id % 32) + 32) % 32 AS INT)) AS mask
      FROM events GROUP BY day, chunk)
    SELECT day,
           CAST(SUM(bit_count(mask)) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_chunks
    FROM chunks GROUP BY day ORDER BY day
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per day via bitmap chunks — the
    roaring-bitmap pattern (ClickHouse/Druid `groupBitmap`) expressed
    with built-ins: ids bucket into 32-wide chunks, each (day, chunk)
    group ORs a one-hot mask, and the distinct count is the popcount
    sum. Both aggregation levels are map-side combinable.

    Why it matters at 100 TB: COUNT(DISTINCT user) shuffles every
    distinct (day, user) pair; this shuffles one 8-byte mask per
    (day, 32-id chunk) — up to 32x fewer, denser rows, and unlike
    approx_count_distinct it is EXACT, and the per-day chunk masks are
    mergeable state (union across days/files = bit_or again), the same
    reusability HLL sketches give but without the error bar. Needs a
    bounded integer id domain (user ids here); arbitrary keys first
    map through a dictionary/dense-rank pass.

    Fully oracle-checked: masks and popcounts are pure integer ops,
    identical in both engines.
    """
    e = load_table(spark, sf_dir, "events")
    chunks = (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            # Floor-division chunk in pure int64 (ADVICE r3): user_id -
            # pmod(...) is divisible by 32, so trunc-div == floor-div,
            # matching DuckDB's flooring `//` for negative ids too, with
            # no double rounding for ids above 2^53. pmod keeps the
            # shift count in [0, 32) regardless of sign.
            F.expr("(user_id - pmod(user_id, 32)) div 32").alias("chunk"),
            F.expr("shiftleft(1L, CAST(pmod(user_id, 32) AS INT))").alias("bit"),
        )
        .groupBy("day", "chunk")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )
    return (
        chunks.groupBy("day")
        .agg(
            F.sum(F.bit_count("mask")).cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        )
        .orderBy("day")
    )


# --- bitmap retention (mask algebra) ----------------------------------


@register(
    "agg_bitmap_retention",
    oracle="""
    WITH chunks AS (
      SELECT date_trunc('day', ts) AS day,
             (user_id - ((user_id % 32) + 32) % 32) // 32 AS chunk,
             bit_or(1::BIGINT << CAST(((user_id % 32) + 32) % 32 AS INT)) AS mask
      FROM events GROUP BY day, chunk),
    days AS (SELECT DISTINCT day FROM chunks),
    pairs AS (
      SELECT a.day AS day, b.day AS next_day,
             a.chunk, a.mask AS mask_a, b.mask AS mask_b
      FROM chunks a
      JOIN chunks b ON b.day = a.day + INTERVAL 1 DAY AND b.chunk = a.chunk)
    SELECT day,
           CAST(SUM(bit_count(mask_a & mask_b)) AS BIGINT) AS n_retained
    FROM pairs GROUP BY day ORDER BY day
    """,
)
def agg_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retained users via bitmap algebra: the users active
    on day d AND day d+1 are the popcount of the ANDed chunk masks —
    the set-intersection half of the roaring-bitmap pattern
    (agg_bitmap_distinct is the cardinality half). No (day, user)
    pairs are ever re-shuffled: retention joins day-level chunk masks
    on (chunk), 8 bytes a side, and intersection/popcount is bitwise.

    This algebra is why bitmap state beats COUNT(DISTINCT ...) at
    100 TB: masks merge (OR), intersect (AND), and diff (AND NOT)
    without touching raw ids again — N-day retention triangles,
    resurrection counts, and audience overlaps all reduce to the same
    chunk-equi-join + popcount shape.
    """
    e = load_table(spark, sf_dir, "events")
    chunks = (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            # Floor-division chunk in pure int64 (ADVICE r3): user_id -
            # pmod(...) is divisible by 32, so trunc-div == floor-div,
            # matching DuckDB's flooring `//` for negative ids too, with
            # no double rounding for ids above 2^53. pmod keeps the
            # shift count in [0, 32) regardless of sign.
            F.expr("(user_id - pmod(user_id, 32)) div 32").alias("chunk"),
            F.expr("shiftleft(1L, CAST(pmod(user_id, 32) AS INT))").alias("bit"),
        )
        .groupBy("day", "chunk")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = a.join(
        b,
        (F.col("b.day") == F.col("a.day") + F.expr("INTERVAL 1 DAY"))
        & (F.col("b.chunk") == F.col("a.chunk")),
    )
    return (
        pairs.select(
            F.col("a.day").alias("day"),
            F.bit_count(F.col("a.mask").bitwiseAND(F.col("b.mask"))).alias("bc"),
        )
        .groupBy("day")
        .agg(F.sum("bc").cast("bigint").alias("n_retained"))
        .orderBy("day")
    )


# --- exact global median by iterative histogram refinement ------------

_MED_BINS = 4096      # refinement fan-out per pass
_MED_COLLECT = 65536  # candidate count at which exact driver sort takes over
_MED_MAX_ITERS = 64   # ulp-scale convergence bound (range shrinks 4096x/pass)


@register(
    "agg_median_iterative",
    oracle="""
    WITH v AS (
      SELECT l_extendedprice AS x FROM lineitem
      WHERE l_extendedprice IS NOT NULL
        AND NOT isnan(l_extendedprice) AND NOT isinf(l_extendedprice)),
    s AS (SELECT list(x ORDER BY x) AS xs, COUNT(*) AS n FROM v),
    b AS (SELECT COUNT(*) AS n_bad FROM lineitem
          WHERE l_extendedprice IS NOT NULL
            AND (isnan(l_extendedprice) OR isinf(l_extendedprice)))
    SELECT CASE WHEN n = 0 THEN NULL
                ELSE xs[CAST(ceil(0.5 * n) AS BIGINT)] END AS median_price,
           CAST(n AS BIGINT) AS n_finite,
           CAST(b.n_bad AS BIGINT) AS n_bad
    FROM s, b
    """,
)
def agg_median_iterative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median of an unbounded double column, computed the
    way it has to be at 100 TB: iterative histogram refinement, never
    a global sort and never a value-buffering percentile aggregate.

    Each pass histograms the surviving candidates into 4096
    equal-width bins (a map-side-combining groupBy; only 4096 counter
    rows ever reach the driver), locates the bin holding the target
    rank, and descends into it — the candidate range shrinks 4096x per
    pass, so even a full double range needs ~6 passes to reach
    ulp-scale. When fewer than 65536 candidates remain (or the range
    collapses to a single value — the mass-tie case), the driver sorts
    the final sliver exactly. The answer is the ceil(n/2)-th order
    statistic — selection by RANK, with the rank bookkeeping read from
    the same binning expression the next pass filters on, so float
    rounding in bin edges can never misplace the result.

    Contract (matches agg_percentile_disc/_approx): NULLs are ignored;
    NaN/Inf are corruption, excluded from the statistic and SURFACED
    as n_bad. Driver work is bounded (4096-row histograms, one
    <=65536-value final sort) — the bounded-collect policy every
    iterative op in this repo follows (cf. connected components).
    """
    # Spark has no isinf(); the abs-compare is its idiom for it.
    finite = (
        "l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice) "
        "AND abs(l_extendedprice) != double('Infinity')"
    )
    li = load_table(spark, sf_dir, "lineitem")
    st = li.agg(
        F.count(F.when(F.expr(finite), 1)).alias("n"),
        F.count(
            F.when(
                F.col("l_extendedprice").isNotNull() & ~F.expr(finite), 1
            )
        ).alias("n_bad"),
    ).collect()[0]
    n, n_bad = int(st["n"]), int(st["n_bad"])
    out_schema = "median_price double, n_finite bigint, n_bad bigint"
    if n == 0:
        return spark.createDataFrame([(None, 0, n_bad)], out_schema)

    k = (n + 1) // 2  # ceil(0.5*n), the percentile_disc selection rank
    cur = li.where(F.expr(finite)).select(F.col("l_extendedprice").alias("x"))
    for _ in range(_MED_MAX_ITERS):
        mm = cur.agg(
            F.count(F.lit(1)).alias("m"), F.min("x").alias("lo"), F.max("x").alias("hi")
        ).collect()[0]
        m, lo, hi = int(mm["m"]), float(mm["lo"]), float(mm["hi"])
        if lo == hi:
            # range collapsed: every candidate IS the answer — return
            # it without collecting (mass ties can leave m corpus-sized
            # here; a collect would ship them all to the driver).
            return spark.createDataFrame([(lo, n, n_bad)], out_schema)
        if m <= _MED_COLLECT:
            break
        width = (hi - lo) / _MED_BINS
        if not (width > 0.0):
            # subnormal-range underflow (hi - lo too small to split):
            # at most a few thousand representable doubles remain in
            # [lo, hi], so the grouped finisher below is exact and
            # bounded even if the ROW count is corpus-sized.
            break
        binc = F.greatest(
            F.lit(0),
            F.least(F.lit(_MED_BINS - 1), F.floor((F.col("x") - lo) / width)),
        ).cast("int")
        hist = dict(
            (r["b"], r["cnt"])
            for r in cur.groupBy(binc.alias("b")).agg(
                F.count(F.lit(1)).alias("cnt")
            ).collect()
        )
        cum = 0
        for b in range(_MED_BINS):
            c = hist.get(b, 0)
            if cum + c >= k:
                k -= cum
                cur = cur.where(binc == b)
                break
            cum += c
    # Grouped finisher: ship (value, count) pairs, not rows — bounded
    # by distinct candidate values, exact under arbitrary tie mass.
    pairs = sorted(
        (float(r["x"]), int(r["cnt"]))
        for r in cur.groupBy("x").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    cum = 0
    for x, c in pairs:
        cum += c
        if cum >= k:
            return spark.createDataFrame([(x, n, n_bad)], out_schema)
    raise AssertionError("rank bookkeeping exhausted candidates")


# --- count-min sketch (mergeable heavy-hitter counter) ----------------
#
# The frequency-estimation half of the mergeable-sketch family (HLL
# covers distinct counting, test_sketches.py): DEPTH seeded hash rows
# over a WIDTH-cell counter array; a key's estimate is the MIN of its
# DEPTH cells, which can only OVER-estimate (collisions add, never
# subtract). Hashes are hex digits of one md5 per key folded to ints
# with the instr() idiom (operators/sampling.py _SQL_U24) — fully
# cross-engine, so the sketch cells AND the estimates hash-match the
# oracle exactly. WIDTH=256 is deliberately small for the part-key
# domain (~2k keys at sf0.01): collisions are REAL and the
# overestimate column is a live differential surface, not a column of
# zeros; production sizes WIDTH ~ e/eps.
_CMS_DEPTH = 4
_CMS_WIDTH = 256  # 2 hex digits per row
_CMS_TOPK = 20
_CMS_HEX = "0123456789abcdef"


def _cms_col_sql(r: int) -> str:
    """Row r's column index: hex chars 2r+1, 2r+2 of md5(key)."""
    return (
        f"((instr('{_CMS_HEX}', substring(h, {2 * r + 1}, 1)) - 1) * 16"
        f" + (instr('{_CMS_HEX}', substring(h, {2 * r + 2}, 1)) - 1))"
    )


_CMS_ROWS_SQL = " UNION ALL ".join(
    f"SELECT {r} AS r, {_cms_col_sql(r)} AS col, h FROM hashed"
    for r in range(_CMS_DEPTH)
)


@register(
    "agg_cms_heavy_hitters",
    oracle=f"""
    WITH hashed AS (
      SELECT l_partkey, md5(CAST(l_partkey AS VARCHAR)) AS h
      FROM lineitem WHERE l_partkey IS NOT NULL),
    cells AS (
      SELECT r, col, CAST(COUNT(*) AS BIGINT) AS cell_n
      FROM ({_CMS_ROWS_SQL}) rows
      GROUP BY r, col),
    exact AS (
      SELECT l_partkey, h, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM hashed GROUP BY l_partkey, h
      ORDER BY exact_n DESC, l_partkey LIMIT {_CMS_TOPK}),
    probes AS (
      {" UNION ALL ".join(
        f"SELECT l_partkey, exact_n, {r} AS r, {_cms_col_sql(r)} AS col FROM exact"
        for r in range(_CMS_DEPTH))}),
    est AS (
      SELECT p.l_partkey, p.exact_n, CAST(MIN(c.cell_n) AS BIGINT) AS est_n
      FROM probes p JOIN cells c ON c.r = p.r AND c.col = p.col
      GROUP BY p.l_partkey, p.exact_n)
    SELECT l_partkey, exact_n, est_n, est_n - exact_n AS overestimate
    FROM est ORDER BY exact_n DESC, l_partkey
    """,
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the part-key frequency stream, evaluated
    on the exact top-20 heavy hitters: builds the DEPTHxWIDTH counter
    sketch in one pass, then reports each heavy hitter's exact count,
    CMS estimate (min over its DEPTH cells), and the collision
    overestimate — the mergeable-counter pattern for "approximate
    per-key counts across shards without shuffling raw keys"
    (per-shard sketches ADD cell-wise, exactly like the per-day HLL
    union in test_sketches.py).

    Scale shape: the build explodes each row into DEPTH (r, col)
    cells, but the aggregate's key space is DEPTH*WIDTH = 1024 cells,
    so map-side partial aggregation collapses everything before ONE
    tiny exchange — raw keys never shuffle, which is the entire point
    of sketching a 100 TB stream. The probe side is TOPK*DEPTH rows
    broadcast against the 1024-cell relation. The estimate's
    one-sided error (est >= exact, always) is visible in-result.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey").isNotNull())
    hashed = l.select(
        "l_partkey", F.md5(F.col("l_partkey").cast("string")).alias("h")
    )

    def col_expr(r: int):
        return (
            (F.instr(F.lit(_CMS_HEX), F.substring("h", 2 * r + 1, 1)) - 1) * 16
            + (F.instr(F.lit(_CMS_HEX), F.substring("h", 2 * r + 2, 1)) - 1)
        )

    cells = (
        hashed.select(
            F.explode(
                F.array(*[
                    F.struct(F.lit(r).alias("r"), col_expr(r).alias("col"))
                    for r in range(_CMS_DEPTH)
                ])
            ).alias("rc")
        )
        .select("rc.r", "rc.col")
        .groupBy("r", "col")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cell_n"))
    )
    exact = (
        hashed.groupBy("l_partkey", "h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "l_partkey")
        .limit(_CMS_TOPK)
    )
    probes = exact.select(
        "l_partkey",
        "exact_n",
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("r"), col_expr(r).alias("col"))
                for r in range(_CMS_DEPTH)
            ])
        ).alias("rc"),
    ).select("l_partkey", "exact_n", "rc.r", "rc.col")
    return (
        F.broadcast(probes)
        .join(cells, ["r", "col"])
        .groupBy("l_partkey", "exact_n")
        .agg(F.min("cell_n").cast("bigint").alias("est_n"))
        .select(
            "l_partkey",
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("overestimate"),
        )
        .orderBy(F.col("exact_n").desc(), "l_partkey")
    )


# --- funnel analysis ---------------------------------------------------

_FUNNEL_STEPS = ("signup", "view", "purchase")
_FUNNEL_WINDOW_DAYS = 7
_FUNNEL_Q = 1_000_000  # conversion-rate quantum: 1e-6
# Per-user per-step-type event cap for the array path: above this a
# user's collect buffer (cap * 8-byte timestamps) stops being "small",
# so their rows route to the join path instead. 100k views/user covers
# every human; beyond it is bot traffic.
_FUNNEL_PER_USER_CAP = 100_000
# Bot-LIST row cap (enforced by the probe, VERDICT r8 item 6): the bot
# relation is broadcast downstream, so it must stay driver/broadcast-
# sized. n_bots <= n_events / _FUNNEL_PER_USER_CAP by construction
# (every bot has > cap events), so hitting this means ~800 B distinct
# bot events — at that point the corpus is the attack, not the plan.
_FUNNEL_BOT_ROW_CAP = 8_000_000


def _bot_users(e: DataFrame, cap: int) -> DataFrame:
    """user_ids with more than ``cap`` events of any single step type.
    Count buffers are 8 bytes/group — this aggregation itself can
    never blow up, which is what makes it a safe guard for the
    collect that could."""
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > cap)
        .select("user_id")
        .distinct()
    )


def _funnel_array_path(e: DataFrame, win) -> DataFrame:
    """The single-agg per-user funnel: collect only view/purchase
    timestamps, fold for the windowed sequential mins. Exact, one
    shuffle — valid only when per-user step counts are bounded."""
    return (
        e.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1"),
            F.collect_list(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).alias("views"),
            F.collect_list(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("purchases"),
        )
        .withColumn(
            "t2",
            F.array_min(
                F.filter("views", lambda x: (x >= F.col("t1")) & (x <= win))
            ),
        )
        .withColumn(
            "t3",
            F.array_min(
                F.filter("purchases", lambda x: (x >= F.col("t2")) & (x <= win))
            ),
        )
        .select("user_id", "t1", "t2", "t3")
    )


def _funnel_per_user(e: DataFrame, cap: int) -> DataFrame:
    """Per-user (t1, t2, t3) sequential-funnel times over the
    pre-filtered step events ``e``, with the bounded-collect contract
    ENFORCED by a count probe (the mega-doc-guard pattern from
    operators/dedup.py, and like it a documented construction-time
    exception to plan laziness — see text.py's laziness note): a
    per-(user, step-type) count aggregation — itself OOM-proof, its
    buffers are 8 bytes/group — detects any user above ``cap`` events
    of one type. When none exists (every human corpus) the op returns
    the UNCHANGED one-scan single-agg array plan. When a bot user
    exists, their rows route through the 3-join conditional-min
    variant (exact, min/count buffers only) and everyone else still
    takes the array path, anti-joined against the broadcast bot list —
    so no collect buffer ever exceeds ``cap`` entries and the answer
    is identical either way.

    The bot relation is built ONCE through
    ``probes.materialized_nonempty`` (ADVICE r7: the previous shape
    ran the count aggregation twice — once for a ``limit(1)`` probe,
    once for routing — and ``limit(1)`` on top of an agg cannot
    short-circuit the scan anyway, so one eager checkpoint of the
    cap-bounded bot list is strictly cheaper for every corpus)."""
    win = F.expr(f"t1 + INTERVAL {_FUNNEL_WINDOW_DAYS} DAYS")
    bots, has_bot = probes.materialized_nonempty(
        _bot_users(e, cap), row_cap=_FUNNEL_BOT_ROW_CAP
    )
    if not has_bot:
        # Discard path: the checkpointed relation is never read again,
        # so release its executor blocks now instead of pinning them
        # until driver GC (ADVICE r8).
        probes.release(bots)
        return _funnel_array_path(e, win)
    small = _funnel_array_path(
        e.join(F.broadcast(bots), "user_id", "left_anti"), win
    )
    big = e.join(F.broadcast(bots), "user_id", "left_semi")
    t1b = big.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t1")
    )
    t2b = (
        t1b.join(
            big.filter(F.col("event_type") == "view").select(
                "user_id", F.col("ts").alias("vts")
            ),
            "user_id",
            "left",
        )
        .groupBy("user_id", "t1")
        .agg(
            F.min(
                F.when((F.col("vts") >= F.col("t1")) & (F.col("vts") <= win), F.col("vts"))
            ).alias("t2")
        )
    )
    t3b = (
        t2b.join(
            big.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("pts")
            ),
            "user_id",
            "left",
        )
        .groupBy("user_id", "t1", "t2")
        .agg(
            F.min(
                F.when((F.col("pts") >= F.col("t2")) & (F.col("pts") <= win), F.col("pts"))
            ).alias("t3")
        )
    )
    return small.unionByName(t3b.select("user_id", "t1", "t2", "t3"))


@register(
    "events_funnel",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, ts, event_type FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    t1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM ev
      WHERE event_type = 'signup' GROUP BY user_id),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM ev e JOIN t1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts >= t1.t1
        AND e.ts <= t1.t1 + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
      GROUP BY e.user_id),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM ev e JOIN t2 USING (user_id) JOIN t1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= t2.t2
        AND e.ts <= t1.t1 + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
      GROUP BY e.user_id),
    counts AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) AS n1,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) AS n2,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM t3) AS n3)
    SELECT * FROM (
      SELECT CAST(1 AS INT) AS step_idx, 'signup' AS step, n1 AS n_users,
             CAST({_FUNNEL_Q} AS BIGINT) AS conv_from_prev_q FROM counts
      UNION ALL
      SELECT 2, 'view', n2,
             CAST(CASE WHEN n1 = 0 THEN 0
                  ELSE (n2 * {_FUNNEL_Q}) // n1 END AS BIGINT) FROM counts
      UNION ALL
      SELECT 3, 'purchase', n3,
             CAST(CASE WHEN n2 = 0 THEN 0
                  ELSE (n3 * {_FUNNEL_Q}) // n2 END AS BIGINT) FROM counts
    ) f ORDER BY step_idx
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup -> view -> purchase) with a
    {W}-day window anchored at each user's FIRST signup: step i counts
    users whose earliest qualifying step-i event is at or after their
    step-(i-1) time and within the window. Conversion rates are
    1e-6-quantized integer ratios (one floor division on exact BIGINT
    counts), so the ledger hash-matches the oracle exactly.

    Semantics note (pinned by the oracle): each step time is the MIN
    qualifying timestamp given the previous step's time — the TRUE
    sequential funnel. Contrast funnel_conversion
    (operators/relational.py), the cheaper min-per-type approximation
    (compares each type's global first occurrence): that one misses a
    user whose first step-i event precedes their first step-(i-1)
    event even when a later step-i event qualifies, and has no
    conversion window.
    This op re-qualifies each step against the previous step's actual
    time, windowed at the signup anchor. Events with NULL user_id or
    ts are dropped on both engines.

    Scale shape: one scan of events, pre-filtered to the three step
    types (predicate pushed to the parquet scan); ONE hash aggregation
    per user computes t1 directly (conditional min) and collects only
    the view/purchase timestamps (two bounded arrays per user — NOT
    the whole event list), then t2/t3 are pure array folds over those
    per-user arrays: no second scan beyond the count pre-pass, no
    window. The final ledger is a 3-row aggregate of three counts.

    Bounded-collect contract — ENFORCED, not just documented (VERDICT
    r6 item 5): an OOM-proof count probe (8-byte buffers) checks for
    any user above 100k step events of one type; when none exists the
    plan is the unchanged one-scan array agg, and when a bot user
    exists their rows route through the 3-join conditional-min variant
    (the shape the oracle spells) while everyone else keeps the array
    path anti-joined against the broadcast bot list. Both paths are
    exact, so routing never changes the answer — the OOM failure mode
    is eliminated, not converted to an error. See _funnel_per_user.
    """
    return _events_funnel(spark, sf_dir, _FUNNEL_PER_USER_CAP)


def _events_funnel(spark: SparkSession, sf_dir: str, cap: int) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .filter(F.col("event_type").isin(*_FUNNEL_STEPS))
        .select("user_id", "ts", "event_type")
    )
    per_user = _funnel_per_user(e, cap)
    counts = per_user.agg(
        F.count("t1").cast("bigint").alias("n1"),
        F.count("t2").cast("bigint").alias("n2"),
        F.count("t3").cast("bigint").alias("n3"),
    )
    steps = spark.createDataFrame(
        [(1, "signup"), (2, "view"), (3, "purchase")], "step_idx int, step string"
    )
    return (
        steps.crossJoin(F.broadcast(counts))
        .select(
            "step_idx",
            "step",
            F.when(F.col("step_idx") == 1, F.col("n1"))
            .when(F.col("step_idx") == 2, F.col("n2"))
            .otherwise(F.col("n3"))
            .alias("n_users"),
            F.when(F.col("step_idx") == 1, F.lit(_FUNNEL_Q).cast("bigint"))
            .when(
                F.col("step_idx") == 2,
                F.when(F.col("n1") == 0, F.lit(0)).otherwise(
                    F.expr(f"(n2 * {_FUNNEL_Q}) div n1")
                ),
            )
            .otherwise(
                F.when(F.col("n2") == 0, F.lit(0)).otherwise(
                    F.expr(f"(n3 * {_FUNNEL_Q}) div n2")
                )
            )
            .cast("bigint")
            .alias("conv_from_prev_q"),
        )
        .orderBy("step_idx")
    )
