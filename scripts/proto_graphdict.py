"""Prototype A/B (OPTIMIZATION_r14 item 1): order-preserving integer
node-id dictionary for the graph family (guide §2.3 "narrower types" /
"shuffle fewer bytes").

Current graph_pagerank / graph_label_propagation shuffle STRING node
ids ("c:123" / "s:45") through every per-round join + aggregate (3
rounds each, plus deg/nodes derivations). The variant builds a per-run
dictionary node_string -> int64 (strictly increasing in the string
order: sort distinct nodes, then monotonically_increasing_id — range
partitions are ordered and ids are ordered within each partition, so
the mapping is order-preserving even though not dense), remaps the
edge relation once (int-keyed joins against the checkpointed dict),
iterates entirely on longs, and maps back to strings at output.

Value-safety argument (verified empirically below by exact collected
comparison):
- pagerank: any BIJECTION preserves join/groupBy groups; contributions
  are quantized-integer sums (order-independent); map-back restores
  the exact string ids. Order preservation is not even required.
- LPA: tie-breaks are min-label on STRING order; a strictly
  increasing map preserves argmin and all (cnt DESC, label ASC)
  comparisons, so every round's winners are the same nodes; label
  equality (changed_last_round) is preserved by injectivity.

Usage: python scripts/proto_graphdict.py [sf_dir] [reps]
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

from net7_etl_bus_spark.data import load_table  # noqa: E402
from net7_etl_bus_spark.operators.graph import (  # noqa: E402
    _D, _ITERS, _LPA_ITERS, _Q, graph_label_propagation, graph_pagerank,
)
from net7_etl_bus_spark.session import get_spark  # noqa: E402


def _int_pairs_and_dict(spark: SparkSession, sf_dir: str):
    """(pairs_int, dict) for the customer<->supplier purchase graph.

    pairs_int: (ci, si) int64 node ids, checkpointed.
    dict: (node_str, nid) with nid strictly increasing in node_str,
    checkpointed. The DISTINCT pair shuffle runs on two int64 keys
    (16 bytes) instead of two strings; node strings are built only on
    the |V|-sized dictionary relation.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    pairs_raw = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    ).localCheckpoint()
    cust = pairs_raw.select(F.col("ck").alias("k")).distinct().select(
        F.lit("c").alias("t"), "k",
        F.concat(F.lit("c:"), F.col("k")).alias("node"),
    )
    supp = pairs_raw.select(F.col("sk").alias("k")).distinct().select(
        F.lit("s").alias("t"), "k",
        F.concat(F.lit("s:"), F.col("k")).alias("node"),
    )
    nd = (
        cust.unionAll(supp)
        .orderBy("node")
        .withColumn("nid", F.monotonically_increasing_id())
    ).localCheckpoint()
    dc = nd.filter(F.col("t") == "c").select(F.col("k").alias("ck"), F.col("nid").alias("ci"))
    ds = nd.filter(F.col("t") == "s").select(F.col("k").alias("sk"), F.col("nid").alias("si"))
    pairs_int = (
        pairs_raw.join(dc, "ck").join(ds, "sk").select("ci", "si")
    ).localCheckpoint()
    return pairs_int, nd.select("node", "nid")


def pagerank_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs, nd = _int_pairs_and_dict(spark, sf_dir)
    edges = pairs.select(F.col("ci").alias("src"), F.col("si").alias("dst")).unionAll(
        pairs.select(F.col("si").alias("src"), F.col("ci").alias("dst"))
    )
    nodes = nd.select(F.col("nid").alias("node"))
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    ).localCheckpoint()
    n_nodes = nd.count()
    if n_nodes == 0:
        return nodes.select(
            F.lit(None).cast("string").alias("node"), F.lit(0.0).alias("rank")
        ).limit(0)
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n_nodes))).alias("rank"))
    for _ in range(_ITERS):
        contrib = (
            edges.join(ranks, ranks["node"] == edges["src"])
            .join(deg, deg["src"] == edges["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.floor(F.col("rank") / F.col("outdeg") * F.lit(_Q)).cast(
                        "decimal(38,0)"
                    )
                ).alias("contrib")
            )
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit((1 - _D) / float(n_nodes))
                + F.lit(_D)
                * (F.coalesce(F.col("contrib"), F.lit(0)).cast("double") / F.lit(_Q))
            ).alias("rank"),
        )
    return ranks.join(nd, ranks["node"] == nd["nid"]).select(
        nd["node"].alias("node"), "rank"
    )


def lpa_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs, nd = _int_pairs_and_dict(spark, sf_dir)
    edges = pairs.select(F.col("ci").alias("src"), F.col("si").alias("dst")).unionAll(
        pairs.select(F.col("si").alias("src"), F.col("ci").alias("dst"))
    )
    labels = nd.select(F.col("nid").alias("node"), F.col("nid").alias("label"))
    prev = labels
    for i in range(_LPA_ITERS):
        prev = labels.localCheckpoint() if i == _LPA_ITERS - 1 else labels
        labels = prev
        cnt = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        w = Window.partitionBy("dst").orderBy(F.col("cnt").desc(), "label")
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("node"), "label")
        )
    flagged = labels.join(
        prev.select("node", F.col("label").alias("prev_label")), "node"
    ).select(
        "node", "label", (F.col("label") != F.col("prev_label")).alias("changed_last_round")
    )
    n1 = nd.select(F.col("nid").alias("node"), F.col("node").alias("node_str"))
    n2 = nd.select(F.col("nid").alias("label"), F.col("node").alias("label_str"))
    return flagged.join(n1, "node").join(n2, "label").select(
        F.col("node_str").alias("node"),
        F.col("label_str").alias("label"),
        "changed_last_round",
    )


def _rows(df: DataFrame) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("proto_graphdict")

    # --- value equality (exact, both keys) ---
    for name, base, var in [
        ("pagerank", graph_pagerank, pagerank_int),
        ("lpa", graph_label_propagation, lpa_int),
    ]:
        a = _rows(base(spark, sf_dir))
        b = _rows(var(spark, sf_dir))
        assert a == b, f"{name}: MISMATCH base {len(a)} rows vs variant {len(b)}"
        print(f"{name}: exact match on {len(a)} rows", file=sys.stderr)

    # --- interleaved timing A/B ---
    for name, base, var in [
        ("pagerank", graph_pagerank, pagerank_int),
        ("lpa", graph_label_propagation, lpa_int),
    ]:
        tb, tv = [], []
        for r in range(reps):
            order = [("base", base, tb), ("var", var, tv)]
            if r % 2:
                order.reverse()
            for tag, fn, acc in order:
                spark.sparkContext.setJobDescription(f"graphdict {name} {tag} {r}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                acc.append(time.perf_counter() - t0)
        mb, mv = statistics.median(tb), statistics.median(tv)
        print(
            f"{name}: base med {mb:.3f}s {sorted(round(t, 2) for t in tb)} | "
            f"int-dict med {mv:.3f}s {sorted(round(t, 2) for t in tv)} | "
            f"speedup {mb / mv:.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
