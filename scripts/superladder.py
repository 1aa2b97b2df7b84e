"""r11 scale measurements for the trained clustered-ANN assembly
(VERDICT r10 items 5 and 6):

1. TRAINED-SEMDEDUP SCALED-K LADDER — the full production chain
   (quantize -> kmeans_train_frame with two-tier assignment ->
   trained centroids -> semdedup_frame with two-tier assignment)
   end to end over the gen_scale mirror pair, K ~ n (16 -> 160,
   S ~ sqrt(K): 4 -> 13). NOTE the sizing differs from
   scripts/annladder.py's K ~ sqrt(n): ANN SEARCH scales K ~ sqrt(n)
   to balance assign (n*K via the cascade) against probed-list size
   (n/K), but SemDeDup's pair term is sum-over-clusters (n/K)^2 * K
   = n^2/K, so only K ~ n holds CLUSTER SIZE (and the pair term per
   vector) flat — the paper's own protocol (50k clusters for LAION),
   and exactly what the semdedup_frame docstring prescribes. A first
   draft of this ladder ran the search sizing (K 16 -> 50) and
   measured 0.82, the residual n^2/K growth showing through — the
   sizing rule is itself load-bearing, so both numbers are recorded
   in SCALE.md. The r9 ladder measured semdedup_frame's pair term at
   scaled K but with SEED centroids; this measures train cost +
   assign + pair term together, the emb_semdedup_trained composition
   at its production sizing (expect <= ~0.6; the fixed-K registry
   key stays adjudicated-superlinear at 1.15 by construction).

2. SUPER-GROUP OCCUPANCY SPREAD — max/mean group size when the
   trained K-centroid relation is grouped under (a) the
   first-S-by-cid default supers and (b) train_super_centroids
   output (k-means over the centroids themselves) — measured twice:
   on the natural cid order, and on an ADVERSARIAL relabeling where
   the S lowest cids are the S centroids closest to centroid 0 (a
   tight clump — the funnel case that makes the default's worst-case
   occupancy unbounded, since every far centroid lands on the clump
   member nearest it while the clump splits hairs). Trained supers
   are relabel-invariant by construction (k-means sees coordinates,
   not ids), which is the structural-bound claim in code.

Protocol matches scripts/annladder.py: median-of-REPS noop-sink
executions, exponent = log(t_big/t_small)/log(factor). Usage:

    python scripts/superladder.py [small_dir big_dir factor]
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from net7_etl_bus_spark.operators.similarity import (  # noqa: E402
    _KM_Q,
    _km_eligible,
    _sqdist,
    kmeans_train_frame,
    semdedup_frame,
    train_super_centroids,
)
from net7_etl_bus_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

# (K, S): K ~ n holds cluster size flat (the semdedup sizing rule —
# see the module docstring; annladder's K ~ sqrt(n) is the SEARCH
# rule), S ~ sqrt(K) for the assignment cascade
SIZING = {"small": (16, 4), "big": (160, 13)}


def _norm2(col: str):
    return F.aggregate(
        col, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )


def _inputs(spark, sf_dir: str, k: int):
    fe = _km_eligible(spark, sf_dir).filter(_norm2("embedding") > 0)
    eq = fe.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda y: F.floor(y.cast("double") * F.lit(_KM_Q)).cast("long"),
        ).alias("xq"),
    )
    cent0 = eq.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("xq").alias("cq")
    )
    return fe, eq, cent0


def build_chain(spark, sf_dir: str, k: int, s: int) -> DataFrame:
    """Train (two-tier) -> trained centroids as doubles -> semdedup
    (two-tier) — emb_semdedup_trained's composition at scaled K."""
    fe, eq, cent0 = _inputs(spark, sf_dir, k)
    trained = kmeans_train_frame(eq, cent0, n_super=s)
    tc = (
        trained.filter(_norm2("cq") > 0)
        .select(
            "cid", F.transform("cq", lambda x: x.cast("double")).alias("cent_emb")
        )
        .localCheckpoint(eager=False)
    )
    return semdedup_frame(fe.select("vec_id", "embedding"), tc, n_super=s)


def run_median(spark, sf_dir, k, s) -> float:
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        build_chain(spark, sf_dir, k, s).write.mode("overwrite").format(
            "noop"
        ).save()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _group_sizes(cent: DataFrame, sup: DataFrame) -> list[int]:
    wc = Window.partitionBy("cid").orderBy("ds", "sid")
    return [
        r.n
        for r in cent.crossJoin(F.broadcast(sup.select("sid", "sq")))
        .withColumn("ds", _sqdist(F.col("cq"), F.col("sq")))
        .withColumn("rk", F.row_number().over(wc))
        .filter(F.col("rk") == 1)
        .groupBy("sid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]


def _spread(sizes: list[int]) -> dict:
    return {
        "groups": len(sizes),
        "max": max(sizes),
        "mean": round(sum(sizes) / len(sizes), 2),
        "spread_max_over_mean": round(max(sizes) / (sum(sizes) / len(sizes)), 2),
    }


def occupancy(spark, sf_dir: str, k: int, s: int) -> dict:
    """max/mean super-group occupancy over the TRAINED K-centroid
    relation, default supers vs trained supers, on the natural cid
    order AND the adversarial clump-first relabeling."""
    _fe, eq, cent0 = _inputs(spark, sf_dir, k)
    trained = kmeans_train_frame(eq, cent0, n_super=s).localCheckpoint(
        eager=False
    )
    # adversarial relabeling: the S lowest cids become the S centroids
    # nearest centroid 0 (a tight clump), everything else keeps its
    # relative order — same SET of centroids, worst-case id layout
    c0 = trained.orderBy("cid").limit(1).select(F.col("cq").alias("c0q"))
    adv = (
        trained.crossJoin(F.broadcast(c0))
        .withColumn("d0", _sqdist(F.col("cq"), F.col("c0q")))
        .withColumn(
            "cid", F.row_number().over(Window.orderBy("d0", "cid")).cast("long")
        )
        .select("cid", "cq")
        .localCheckpoint(eager=False)
    )
    out = {}
    for layout, cent in (("natural_cid_order", trained), ("adversarial_clump_first", adv)):
        first = (
            cent.orderBy("cid")
            .limit(s)
            .select(F.col("cid").alias("sid"), F.col("cq").alias("sq"))
        )
        out[layout] = {
            "first_s_by_cid": _spread(_group_sizes(cent, first)),
            "trained_supers": _spread(
                _group_sizes(cent, train_super_centroids(cent, s))
            ),
        }
    return out


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "scaledata/sf0.1relaid"
    big = sys.argv[2] if len(sys.argv) > 2 else "scaledata/sf1"
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    spark = get_spark("superladder")
    ks, ss = SIZING["small"]
    kb, sb = SIZING["big"]
    # warmup (JIT/codegen) on the small side, untimed
    build_chain(spark, small, ks, ss).write.mode("overwrite").format("noop").save()
    t_s = run_median(spark, small, ks, ss)
    t_b = run_median(spark, big, kb, sb)
    out = {
        "semdedup_trained_scaledK": {
            "t_small": round(t_s, 3),
            "t_big": round(t_b, 3),
            "exponent": round(math.log(t_b / t_s) / math.log(factor), 2),
            "sizing": {"small": (ks, ss), "big": (kb, sb)},
        },
        "super_occupancy_big": occupancy(spark, big, kb, sb),
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
