"""A/B prototype for OPTIMIZATION_r13: adaptive scan repartition
(data.scan_parallel) on representative single-row-group scan shapes.

Times, under the bench protocol (adaptive warmup + median-of-3, noop
sink), each shape with and without a post-read hash repartition to
defaultParallelism, and checks the two variants return identical
results (sorted collect compare at sf0.01).

Usage: python scripts/proto_parscan.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from net7_etl_bus_spark.data import load_table, scan_parallel, table_path  # noqa: E402
from net7_etl_bus_spark.operators.dedup import (  # noqa: E402
    _lsh_candidate_pairs,
    _minhash_signature_from,
    _shingles,
)
from net7_etl_bus_spark.plans.registry import dsum  # noqa: E402
from net7_etl_bus_spark.session import get_spark  # noqa: E402


def timed(spark, build, label):
    def one():
        t0 = time.perf_counter()
        build().write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    prev = one()
    for _ in range(4):
        cur = one()
        if abs(prev - cur) <= 0.12 * max(cur, 1e-9):
            prev = cur
            break
        prev = cur
    ts = [one() for _ in range(3)]
    med = statistics.median(ts)
    print(f"  {label}: med {med:.3f}s  runs {[round(t, 3) for t in ts]}")
    return med


def shapes(spark, sf_dir, par: bool):
    """dict name -> builder. ``par``: apply scan_parallel after read
    (and after pushdown filters)."""

    def maybe(df, table, *keys):
        if not par:
            return df
        return scan_parallel(spark, df, table_path(sf_dir, table), *keys)

    def q1_like():
        l = maybe(
            load_table(spark, sf_dir, "lineitem").filter(
                F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
            ),
            "lineitem",
            "l_orderkey",
        )
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return l.groupBy("l_returnflag", "l_linestatus").agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc, 4).alias("sum_disc_price"),
            dsum(disc * (1 + F.col("l_tax")), 4).alias("sum_charge"),
            F.count(F.lit(1)).alias("n"),
        )

    def agg_hash_like():
        l = maybe(load_table(spark, sf_dir, "lineitem"), "lineitem", "l_orderkey")
        return l.groupBy("l_suppkey").agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_price"),
        )

    def text_stats_like():
        from net7_etl_bus_spark.operators.dedup import normalized_text

        d = maybe(load_table(spark, sf_dir, "documents"), "documents", "doc_id")
        w = F.split(normalized_text("text"), " ")
        return d.select(
            "doc_id",
            F.size(w).cast("bigint").alias("n_words"),
            F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct_words"),
        )

    def minhash_sig():
        d = maybe(load_table(spark, sf_dir, "documents"), "documents", "doc_id")
        return _minhash_signature_from(_shingles(d))

    def minhash_lsh():
        d = maybe(load_table(spark, sf_dir, "documents"), "documents", "doc_id")
        return _lsh_candidate_pairs(_minhash_signature_from(_shingles(d)))

    def sim_topk_like():
        e = maybe(
            load_table(spark, sf_dir, "embeddings").filter(
                F.col("embedding").isNotNull()
            ),
            "embeddings",
            "vec_id",
        )
        q = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("embedding").isNotNull())
            .filter(F.col("vec_id") < 8)
            .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
        )
        c = e.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
        )
        dot = F.aggregate(
            F.zip_with("q_emb", "c_emb", lambda a, b: a.cast("double") * b.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
            "query_id", "neighbor_id", dot.alias("dot")
        )

    return {
        "q1_like": q1_like,
        "agg_hash_like": agg_hash_like,
        "text_stats_like": text_stats_like,
        "minhash_sig": minhash_sig,
        "minhash_lsh": minhash_lsh,
        "sim_topk_like": sim_topk_like,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("proto-parscan")
    base = shapes(spark, sf_dir, par=False)
    part = shapes(spark, sf_dir, par=True)
    # warm the JVM once
    base["q1_like"]().write.mode("overwrite").format("noop").save()
    results = {}
    for name in base:
        print(f"{name}:")
        t0 = timed(spark, base[name], "base")
        t1 = timed(spark, part[name], "par ")
        results[name] = (t0, t1, round((t0 - t1) / t0 * 100, 1))
    print("\nname, base_med, par_med, saving_pct")
    for name, (t0, t1, pct) in results.items():
        print(f"{name}: {t0:.3f} -> {t1:.3f}  ({pct:+.1f}%)")
    spark.stop()


if __name__ == "__main__":
    main()
