"""Dump .explain('formatted') for the bench query set (or an explicit
key list) to plans/<round>/<query>_<tag>.txt — the optimization round's
plan evidence (OPTIMIZATION_r<N>.md references these files).

The round dir comes from $SPARK_GRAFT_PLAN_ROUND (default r14). The
tag is free-form so plans can be stamped at each optimization commit
(waypoints), not just round endpoints — VERDICT r13 item 9.

Usage:
    python scripts/plandump.py before [key ...]
    python scripts/plandump.py after_<commitish> [key ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from net7_etl_bus_spark.plans import registry  # noqa: E402
from net7_etl_bus_spark.session import get_spark  # noqa: E402

BENCH_SET = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "agg_hash", "agg_cube", "win_running_agg",
    "topk_per_group", "join_asof", "win_session", "dedup_exact",
    "dedup_minhash_lsh", "dedup_minhash_verified", "sim_search_topk",
    "text_stats", "text_token_count",
    "pipeline_curation", "dedup_cc_survivors",
    "text_tfidf_topk", "text_pack_sequences", "emb_kmeans_train",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    keys = sys.argv[2:] or BENCH_SET
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plandump")
    qs = registry.queries()
    for name in keys:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
