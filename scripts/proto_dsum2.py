"""Prototype: two-level dsum accumulation on q1 (VERDICT r3 item 5).

Current dsum: per-row double->floor->decimal(38,0) cast, decimal
accumulation at both partial and final agg levels.

Two-level variant: per-row double->floor->long cast, LONG accumulation
within a partition (exact: |sum| <= partition_rows * max|scaled| << 2^63
for any maxPartitionBytes-bounded partition), keyed by
spark_partition_id(); the tiny per-partition partials (groups x
partitions rows) are then merged with DECIMAL(38,0) accumulation, which
is where unbounded row counts live at 100 TB.

Run: python scripts/proto_dsum2.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from net7_etl_bus_spark.data import load_table  # noqa: E402
from net7_etl_bus_spark.session import get_spark  # noqa: E402
from net7_etl_bus_spark.plans.registry import queries  # noqa: E402


def q1_two_level(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def p(col, scale):  # partial: long accumulation within a partition
        m = float(10**scale)
        return F.sum(F.floor(col * F.lit(m)).cast("long"))

    def f(name, scale):  # final: decimal accumulation across partitions
        m = float(10**scale)
        return F.sum(F.col(name).cast("decimal(38,0)")).cast("double") / F.lit(m)

    part = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"))
        .agg(
            p(F.col("l_quantity"), 2).alias("p_qty"),
            p(F.col("l_extendedprice"), 2).alias("p_price"),
            p(disc_price, 4).alias("p_disc_price"),
            p(charge, 4).alias("p_charge"),
            p(F.col("l_discount"), 4).alias("p_disc"),
            F.count(F.lit(1)).alias("p_cnt"),
        )
    )
    cnt = F.sum("p_cnt")
    return (
        part.groupBy("l_returnflag", "l_linestatus")
        .agg(
            f("p_qty", 2).alias("sum_qty"),
            f("p_price", 2).alias("sum_base_price"),
            f("p_disc_price", 4).alias("sum_disc_price"),
            f("p_charge", 4).alias("sum_charge"),
            (f("p_qty", 2) / cnt).alias("avg_qty"),
            (f("p_price", 2) / cnt).alias("avg_price"),
            (f("p_disc", 4) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("proto-dsum2")
    q1_cur = queries()["q1_pricing_summary"]

    # correctness first: identical rows
    cur_rows = sorted(map(tuple, q1_cur(spark, sf_dir).collect()))
    new_rows = sorted(map(tuple, q1_two_level(spark, sf_dir).collect()))
    assert cur_rows == new_rows, "MISMATCH:\n%s\n%s" % (cur_rows[:2], new_rows[:2])
    print("rows identical:", len(cur_rows))

    for name, fn in [("current", q1_cur), ("two_level", q1_two_level)]:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{name}: min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} all={['%.3f' % t for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
