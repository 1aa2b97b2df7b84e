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


def test_cms_sketches_merge_cellwise(spark):
    """Count-min sketches MERGE by cell-wise addition: building one
    sketch per o_orderdate-year shard and summing cells must equal the
    whole-stream sketch exactly (counts are exact integers — unlike
    HLL there is no merge error). This is the property that lets
    100 TB of shards keep per-shard frequency sketches and answer
    global heavy-hitter queries without ever reshuffling raw keys."""
    from net7_etl_bus_spark.data import load_table
    from net7_etl_bus_spark.operators.analytics import _CMS_DEPTH, _CMS_HEX

    l = load_table(spark, SF_SMALL, "lineitem").filter(
        F.col("l_partkey").isNotNull()
    )
    hashed = l.select(
        "l_partkey",
        (F.col("l_orderkey") % 4).alias("shard"),
        F.md5(F.col("l_partkey").cast("string")).alias("h"),
    )

    def col_expr(r):
        return (
            (F.instr(F.lit(_CMS_HEX), F.substring("h", 2 * r + 1, 1)) - 1) * 16
            + (F.instr(F.lit(_CMS_HEX), F.substring("h", 2 * r + 2, 1)) - 1)
        )

    cells = hashed.select(
        "shard",
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("r"), col_expr(r).alias("col"))
                for r in range(_CMS_DEPTH)
            ])
        ).alias("rc"),
    ).select("shard", "rc.r", "rc.col")

    global_sketch = {
        (r.r, r.col): r.n
        for r in cells.groupBy("r", "col").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    per_shard = cells.groupBy("shard", "r", "col").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    merged = {}
    for row in per_shard:
        merged[(row.r, row.col)] = merged.get((row.r, row.col), 0) + row.n
    assert merged == global_sketch
