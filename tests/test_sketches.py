"""Mergeable-sketch capability: incremental distinct counts.

At 100 TB you never recompute COUNT(DISTINCT) over history — you keep
a per-partition (e.g. per-day) HLL sketch and UNION sketches at query
time. Spark 3.5+ exposes this as hll_sketch_agg / hll_union_agg /
hll_sketch_estimate; these tests pin the two properties the pattern
depends on: merged partial sketches estimate the global cardinality
within HLL error, and merging is associative with late-arriving
partitions (adding a day's sketch never requires touching old days).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from net7_etl_bus_spark.data import load_table

from .conftest import SF_SMALL


def test_hll_daily_sketches_merge_to_global_estimate(spark):
    e = load_table(spark, SF_SMALL, "events")
    exact = e.select("user_id").distinct().count()
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).first()["est"]
    # default lgConfigK=12 => relative error ~1.6%; allow 5% headroom
    assert abs(est - exact) <= max(3, 0.05 * exact), (est, exact)


def test_hll_merge_is_incremental_for_late_partitions(spark):
    e = load_table(spark, SF_SMALL, "events")
    first_half = e.filter(F.dayofmonth("ts") <= 15)
    second_half = e.filter(F.dayofmonth("ts") > 15)
    sk_a = first_half.agg(F.hll_sketch_agg("user_id").alias("sk"))
    sk_b = second_half.agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = (
        sk_a.unionAll(sk_b)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    whole = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).first()["est"]
    # merging partials must equal sketching the whole stream
    assert merged == whole, (merged, whole)
