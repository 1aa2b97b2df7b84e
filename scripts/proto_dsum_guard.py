"""Measure dsum poison-guard variants on the q1 aggregate shape (r4
verdict item 1: the guard's bad-flag MAX leg + guarded sum leg pay the
per-row predicate twice — engineer it down without losing the
corruption-poisons-to-NaN contract).

Variants (all value-identical on clean data; A/B/E identical on
corrupt data too):
  A  current registry.dsum: bad leg `isnan|abs>=lim`, sum leg
     `~isnan & abs<lim` — two DIFFERENT expression trees, so codegen
     subexpression elimination cannot share the predicate work.
  B  shared-tree guard: ONE `bad_row` expression referenced by both
     legs (sum leg = when(~bad_row), flag leg = max(bad_row int)).
  E  count-difference guard: per-row v = when(~bad_row, floor);
     legs sum(v), count(v), count(x) — bad present iff
     count(x) > count(v); v's tree is shared by sum and count.
  C  unguarded r3 dsum (silently drops corrupt rows — the floor, NOT
     a candidate: kept only to show the total contract cost).

Run: python scripts/proto_dsum_guard.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from net7_etl_bus_spark.data import load_table  # noqa: E402
from net7_etl_bus_spark.plans.registry import _dsum_lim, dsum, davg  # noqa: E402
from net7_etl_bus_spark.session import get_spark  # noqa: E402


def _bad_row(c, scale):
    return c.isNotNull() & (F.isnan(c) | (F.abs(c) >= F.lit(_dsum_lim(scale))))


def dsum_shared(c, scale=2):
    m = float(10**scale)
    bad = _bad_row(c, scale)
    good = (
        F.sum(F.when(~bad, F.floor(c * F.lit(m))).cast("decimal(38,0)"))
        .cast("double") / F.lit(m)
    )
    return F.when(F.max(bad.cast("int")) == 1, F.lit(float("nan"))).otherwise(good)


def davg_shared(c, scale=2):
    return dsum_shared(c, scale) / F.count(F.lit(1))


def dsum_cnt(c, scale=2):
    m = float(10**scale)
    v = F.when(~_bad_row(c, scale), F.floor(c * F.lit(m)))
    good = F.sum(v.cast("decimal(38,0)")).cast("double") / F.lit(m)
    return F.when(F.count(c) > F.count(v), F.lit(float("nan"))).otherwise(good)


def davg_cnt(c, scale=2):
    return dsum_cnt(c, scale) / F.count(F.lit(1))


def dsum_raw(c, scale=2):
    m = float(10**scale)
    return F.sum(F.floor(c * F.lit(m)).cast("decimal(38,0)")).cast("double") / F.lit(m)


def davg_raw(c, scale=2):
    return dsum_raw(c, scale) / F.count(F.lit(1))


def q1_with(l, s, a):
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            s(F.col("l_quantity")).alias("sum_qty"),
            s(F.col("l_extendedprice")).alias("sum_base_price"),
            s(disc_price, 4).alias("sum_disc_price"),
            s(charge, 4).alias("sum_charge"),
            a(F.col("l_quantity")).alias("avg_qty"),
            a(F.col("l_extendedprice")).alias("avg_price"),
            a(F.col("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("proto-dsum-guard")
    l = load_table(spark, sf_dir, "lineitem")

    variants = {
        "A_current": (dsum, davg),
        "B_shared": (dsum_shared, davg_shared),
        "E_cntdiff": (dsum_cnt, davg_cnt),
        "C_unguarded": (dsum_raw, davg_raw),
    }

    # values must agree on clean data
    base = None
    for name, (s, a) in variants.items():
        rows = sorted(map(tuple, q1_with(l, s, a).collect()))
        if base is None:
            base = rows
        assert rows == base, f"{name} disagrees with A_current on clean data"

    for name, (s, a) in variants.items():
        df = q1_with(l, s, a)
        df.write.mode("overwrite").format("noop").save()  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: med {statistics.median(ts):.3f}s  runs {[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
