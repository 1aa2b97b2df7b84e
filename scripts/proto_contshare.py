"""Prototype A/B (OPTIMIZATION_r14 item 3): share ONE checkpointed
shingle relation across dedup_containment_recall's exact and LSH
halves (guide §5 lineage). Today the composite recomputes the
tokenize->shingle->explode chain independently in each half (and the
exact half's own three consumers — both self-join sides + sizes —
only partially collapse via exchange reuse).

Also measures a checkpoint inside standalone dedup_containment.

Usage: python scripts/proto_contshare.py [sf_dir] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

REPO = __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from net7_etl_bus_spark.data import load_table  # noqa: E402
from net7_etl_bus_spark.operators.dedup import (  # noqa: E402
    _CONT_TAU_Q, _containment_directions, _containment_lsh_frame,
    _shingles_counted, dedup_containment, dedup_containment_recall,
)
from net7_etl_bus_spark.session import get_spark  # noqa: E402


def _exact_from_shingles(sh: DataFrame) -> DataFrame:
    """dedup_containment's body over a prebuilt (doc_id, s) relation."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    joined = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", F.col("sa.n").alias("na"), F.col("sb.n").alias("nb"), "c")
    )
    return _containment_directions(joined, F.col("c"))


def containment_ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles_counted(docs).select("doc_id", "s").localCheckpoint()
    return _exact_from_shingles(sh)


def recall_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles_counted(docs).localCheckpoint()
    exact = _exact_from_shingles(sh.select("doc_id", "s")).select(
        "doc_src", "doc_dst", "cont_q"
    )
    lsh = _containment_lsh_frame(docs, pre_shingles=sh).select(
        F.col("doc_src").alias("l_src"), F.col("doc_dst").alias("l_dst")
    )
    return (
        exact.join(
            lsh,
            (F.col("doc_src") == F.col("l_src"))
            & (F.col("doc_dst") == F.col("l_dst")),
            "left",
        )
        .groupBy(F.expr("cont_q div 100000").cast("bigint").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("l_src").cast("bigint").alias("n_hit"),
        )
        .withColumn(
            "recall_q", F.expr("(n_hit * 1000000) div n_exact").cast("bigint")
        )
        .orderBy("band")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("proto_contshare")

    for name, base, var in [
        ("containment", dedup_containment, containment_ckpt),
        ("recall", dedup_containment_recall, recall_shared),
    ]:
        a = sorted(tuple(r) for r in base(spark, sf_dir).collect())
        b = sorted(tuple(r) for r in var(spark, sf_dir).collect())
        assert a == b, f"{name} MISMATCH: {len(a)} vs {len(b)} rows"
        print(f"{name}: exact match on {len(a)} rows", file=sys.stderr)

    for name, base, var in [
        ("containment", dedup_containment, containment_ckpt),
        ("recall", dedup_containment_recall, recall_shared),
    ]:
        tb, tv = [], []
        for r in range(reps):
            order = [("base", base, tb), ("var", var, tv)]
            if r % 2:
                order.reverse()
            for tag, fn, acc in order:
                spark.sparkContext.setJobDescription(f"contshare {name} {tag} {r}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                acc.append(time.perf_counter() - t0)
        mb, mv = statistics.median(tb), statistics.median(tv)
        print(
            f"{name}: base med {mb:.3f}s {sorted(round(t, 2) for t in tb)} | "
            f"shared med {mv:.3f}s {sorted(round(t, 2) for t in tv)} | "
            f"speedup {mb / mv:.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
