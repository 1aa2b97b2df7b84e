"""Prototype A/B (OPTIMIZATION_r14 item 4): provably-lossless charset
prefilter ahead of join_fuzzy_levenshtein's banded DP.

For lev(a, b) <= 1, one edit touches one position, so at most ONE
distinct character of a can be absent from b and vice versa:
|charset(a) \\ charset(b)| <= 1 and |charset(b) \\ charset(a)| <= 1.
Encode charsets as 64-bit masks (bit = ascii(ch) % 64; collisions only
make the filter MORE permissive, never lossy) computed once per ROW on
each side; the per-pair test is two AND-NOT + bit_count — integer ops
replacing a banded-DP call for every pruned pair. The DP still
verifies every survivor, so the kept pairs and their distances are
identical by construction; this script also verifies that empirically
with an exact collected comparison.

Usage: python scripts/proto_fuzzyband.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from net7_etl_bus_spark.data import load_table, scan_parallel  # noqa: E402
from net7_etl_bus_spark.operators.relational import join_fuzzy_levenshtein  # noqa: E402
from net7_etl_bus_spark.session import get_spark  # noqa: E402


def _charmask(col) -> F.Column:
    # coalesce -> non-nullable so no inferred-isnotnull constraint can
    # re-expand the fold below the scan_parallel Exchange (the r13
    # pushdown pathology).
    return F.coalesce(
        F.aggregate(
            F.split(col, ""),
            F.lit(0).cast("long"),
            lambda acc, c: acc.bitwiseOR(
                F.shiftleft(F.lit(1).cast("long"), F.pmod(F.ascii(c), F.lit(64)))
            ),
        ),
        F.lit(0).cast("long"),
    )


def fuzzy_masked(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    dirty = scan_parallel(p, "p_partkey").select(
        F.col("p_partkey").alias("dirty_id"),
        F.concat(
            F.substring("p_name", 1, 2), F.expr("substring(p_name, 4)")
        ).alias("dirty_name"),
    ).withColumn("dmask", _charmask(F.col("dirty_name")))
    clean = p.select("p_partkey", "p_name").withColumn(
        "cmask", _charmask(F.col("p_name"))
    )
    dist = F.levenshtein("dirty_name", "p_name", 1)
    cand = dirty.join(
        clean,
        (F.substring("dirty_name", 1, 2) == F.substring("p_name", 1, 2))
        & ((F.length("dirty_name") - F.length("p_name")).between(-1, 1))
        & (F.bit_count(F.col("dmask") & ~F.col("cmask")) <= 1)
        & (F.bit_count(F.col("cmask") & ~F.col("dmask")) <= 1)
        & (dist >= 0),
    ).select(
        "dirty_id", "dirty_name", "p_partkey", "p_name",
        dist.cast("bigint").alias("distance"),
    )
    w = Window.partitionBy("dirty_id").orderBy("distance", "p_name", "p_partkey")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "dirty_id", "dirty_name",
            F.col("p_partkey").alias("match_partkey"),
            F.col("p_name").alias("match_name"),
            "distance",
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("proto_fuzzyband")

    a = sorted(tuple(r) for r in join_fuzzy_levenshtein(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in fuzzy_masked(spark, sf_dir).collect())
    assert a == b, f"MISMATCH: base {len(a)} rows vs masked {len(b)}"
    print(f"exact match on {len(a)} rows", file=sys.stderr)

    tb, tv = [], []
    for r in range(reps):
        order = [("base", join_fuzzy_levenshtein, tb), ("mask", fuzzy_masked, tv)]
        if r % 2:
            order.reverse()
        for tag, fn, acc in order:
            spark.sparkContext.setJobDescription(f"fuzzyband {tag} {r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            acc.append(time.perf_counter() - t0)
    mb, mv = statistics.median(tb), statistics.median(tv)
    print(
        f"fuzzy: base med {mb:.3f}s {sorted(round(t, 2) for t in tb)} | "
        f"masked med {mv:.3f}s {sorted(round(t, 2) for t in tv)} | "
        f"speedup {mb / mv:.2f}x"
    )
    spark.stop()


if __name__ == "__main__":
    main()
