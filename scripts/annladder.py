"""Scaled-K ANN growth ladder (VERDICT r9 item 5): measure
ivf_search_frame / ivfpq_search_frame at the sizing their docstrings
call production — K ~ sqrt(|corpus|) with nprobe/K held fixed —
instead of the registered keys' fixed K=16/nprobe=4 (whose exponents
sfbench already tracks: 0.44 / 0.54 at fixed nlist).

Protocol matches scripts/sfbench.py: the gen_scale mirrors
(scaledata/sf0.1relaid -> scaledata/sf1, factor 10, genuinely new
vectors so list OCCUPANCY really grows), median-of-REPS noop-sink
executions, exponent = log(t_big/t_small)/log(factor). Centroids are
the op's deterministic seed rows (vec_id in [CENT_LO, CENT_LO + K)) —
the quantizer's PROVENANCE doesn't change the measured plan shape, and
seed rows keep both sides byte-comparable across runs.

Sizing: 2,000 vectors -> K=16, nprobe=4 (the registry sizing — also
sqrt-consistent: 16 ~ 0.36*sqrt(2000)); 20,000 vectors -> K=50 ~
16*sqrt(10), nprobe=12 ~ round(0.25*50). Usage:

    python scripts/annladder.py [small_dir big_dir factor]
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

from pyspark.sql import functions as F  # noqa: E402

from net7_etl_bus_spark.data import load_table  # noqa: E402
from net7_etl_bus_spark.operators.similarity import (  # noqa: E402
    CENT_LO,
    ivf_search_frame,
    ivfpq_search_frame,
)
from net7_etl_bus_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

# (K, nprobe, n_super): nprobe/K ~ 0.25 at both points, K ~ sqrt(n),
# n_super ~ sqrt(K) (the two-tier assignment's optimum)
SIZING = {"small": (16, 4, 4), "big": (50, 12, 7)}


def build(frame_fn, spark, sf_dir: str, k: int, n_probe: int, n_super,
          trained_supers: bool = False):
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    cent = e.filter(
        (F.col("vec_id") >= CENT_LO) & (F.col("vec_id") < CENT_LO + k)
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cent_emb"))
    if trained_supers:
        # r11 variant: super_cent from train_super_centroids (farthest-
        # point seeded k-means over the quantized centroid relation) —
        # measures whether the layout-invariant supers hold the cascade
        # exponents of the first-S default.
        from net7_etl_bus_spark.operators.similarity import (
            _KM_Q,
            train_super_centroids,
        )

        cq = cent.select(
            "cid",
            F.transform(
                "cent_emb",
                lambda y: F.floor(y.cast("double") * F.lit(_KM_Q)).cast("long"),
            ).alias("cq"),
        )
        sup = train_super_centroids(cq, n_super).select(
            "sid", (F.col("sup_emb") ).alias("sup_emb")
        )
        return frame_fn(e, cent, n_probe=n_probe, super_cent=sup)
    return frame_fn(e, cent, n_probe=n_probe, n_super=n_super)


def run_median(spark, frame_fn, sf_dir, k, n_probe, n_super,
               trained_supers: bool = False) -> float:
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        build(
            frame_fn, spark, sf_dir, k, n_probe, n_super,
            trained_supers=trained_supers,
        ).write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "scaledata/sf0.1relaid"
    big = sys.argv[2] if len(sys.argv) > 2 else "scaledata/sf1"
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    spark = get_spark("annladder")
    out = {}
    for name, fn in (
        ("sim_search_ivf_scaledK", ivf_search_frame),
        ("sim_search_ivfpq_scaledK", ivfpq_search_frame),
    ):
        for variant, use_hier, trained in (
            ("flat", False, False),
            ("hier", True, False),
            ("hier_trained", True, True),
        ):
            ks, ps, ss = SIZING["small"]
            kb, pb, sb = SIZING["big"]
            s_sup = ss if use_hier else None
            b_sup = sb if use_hier else None
            # warmup (JIT/codegen) on the small side, untimed
            build(fn, spark, small, ks, ps, s_sup, trained_supers=trained).write.mode(
                "overwrite"
            ).format("noop").save()
            t_s = run_median(spark, fn, small, ks, ps, s_sup, trained_supers=trained)
            t_b = run_median(spark, fn, big, kb, pb, b_sup, trained_supers=trained)
            out[f"{name}_{variant}"] = {
                "t_small": round(t_s, 3),
                "t_big": round(t_b, 3),
                "exponent": round(math.log(t_b / t_s) / math.log(factor), 2),
                "sizing": {"small": (ks, ps, s_sup), "big": (kb, pb, b_sup)},
            }
            print(f"# {name}_{variant}: {out[f'{name}_{variant}']}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
