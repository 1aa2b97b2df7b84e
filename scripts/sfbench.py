"""Cross-SF scaling bench: run a query set at two SF dirs under the
bench protocol (median-of-REPS, noop sink) and report per-query
data-bound exponents log(t_big/t_small)/log(factor).

This complements scripts/scalecheck.py (x{1,4,16} REPLICATION of
sf0.1): here the bigger input comes from scripts/gen_scale.py, which
grows DISTINCT KEYSPACES (fresh surrogate keys, redrawn FKs, new
vocabulary, new vectors) — the growth axis replication cannot probe
(shuffle fan-out, LSH bucket occupancy, CC label rounds, vocab-sized
aggregations). Usage:

    python scripts/sfbench.py /root/testdata/sf0.1 scaledata/sf1 10 [key ...]

Prints one JSON line with per-query times at both SFs and exponents.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from net7_etl_bus_spark.plans import registry  # noqa: E402
from net7_etl_bus_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

DEFAULT_KEYS = [
    # the frozen headline 16
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "agg_hash", "agg_cube", "win_running_agg",
    "topk_per_group", "join_asof", "win_session", "dedup_exact",
    "dedup_minhash_lsh", "dedup_minhash_verified", "sim_search_topk",
    "text_stats", "text_token_count",
    # composites + extended LLM block
    "pipeline_curation", "dedup_cc_survivors",
    "text_tfidf_topk", "text_pack_sequences", "emb_kmeans_train",
    # keys the r5 verdict flagged for key-growth re-evaluation
    "text_bm25_search", "graph_triangle_count",
    # r6/r7 ops enrolled per r6 verdict item 4: containment candidate
    # counts under vocab growth, coarse-tier (hamming / prefix-dim)
    # selectivity under embedding growth, funnel/LPA/watermark shuffles
    # under user/node/event keyspace growth. The EXACT all-pairs
    # baselines (dedup_containment, dedup_ngram_jaccard, and the
    # recall ledger that embeds them) are deliberately NOT enrolled:
    # all-pairs-sharing-a-shingle is superlinear under vocabulary
    # growth BY CONSTRUCTION — that is the documented reason the
    # LSH twins exist — so a ladder row would only re-measure the
    # definition (and at sf1 it floods the 2-partition hot-shingle
    # join for minutes; see SCALE.md r7 note).
    "dedup_containment_lsh", "sim_search_binary_rerank",
    "sim_search_matryoshka", "events_funnel",
    "graph_label_propagation", "watermark_late_data",
    # r8 (r7 verdict item 5): the late-r7 trio. The leakage pair ride
    # the verified CC cascade (pair-count joins against the narrow
    # split map on top of it); the epoch shuffle is one hash shuffle
    # plus executor-sized per-shard sorts. The check key is enrolled
    # beside the repair so the pair-count join's own growth is visible
    # separately from the cascade's.
    "split_leakage_check", "split_leakage_repair", "shuffle_epoch_shards",
    # r8 ops, enrolled the round they landed: LM-score join growth
    # under vocab growth; token-budget bucketed prefix sums.
    "text_lm_score", "sample_token_budget",
    # r9: BPE encode — |vocab|-bounded merge rounds + the vocab-sized
    # encode equi-join; the ladder's adversarial 290x-vocab axis is
    # exactly this op's dominant cost (measured 0.87, SCALE.md r9).
    "text_bpe_encode",
    # r9 extension: ANN bucket occupancy under genuinely-new-vector
    # growth (ivf 0.44 / ivfpq 0.54), posting-list growth under 290x
    # vocab (inverted_index 0.74), salted fan-out (0.47), range
    # partitioning (zorder ~0). emb_semdedup is deliberately NOT
    # enrolled: at the registry key's fixed K=16 its (n/K)^2 pair term
    # is superlinear BY CONSTRUCTION (measured 1.15 once, SCALE.md r9)
    # — the scalable path is semdedup_frame with K scaled ~ n, like
    # the excluded exact all-pairs baselines and their LSH twins.
    "sim_search_ivf", "sim_search_ivfpq", "text_inverted_index",
    "join_skew_salted", "zorder_cluster",
    # r10: emb_semdedup_trained is deliberately NOT enrolled for the
    # same reason as emb_semdedup — its registry form pins the trained
    # quantizer at fixed K=8 for oracle stability, so the (n/K)^2
    # within-cluster pair term is superlinear by construction; the
    # production path is semdedup_frame / kmeans_train_frame with K
    # scaled ~ n (the adjudication in SCALE.md r9/r10).
    # text_quality_nb_train needs no ladder row of its own: it is
    # text_quality_classifier's scan + one more |docs|-bounded join
    # and a 64-cell aggregate (same shape class as text_stats, 0.2x).
    # The scaled-K ANN variants are measured by scripts/annladder.py
    # (frame entries, per-SF sizing — outside the fixed-key protocol).
]


def run_median(spark, fn, sf_dir: str) -> float:
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    small = sys.argv[1]
    big = sys.argv[2]
    factor = float(sys.argv[3])
    keys = sys.argv[4:] or DEFAULT_KEYS
    spark = get_spark("net7-etl-bus-sfbench")
    qs = registry.queries()
    import math

    qs["q6_forecast_revenue"](spark, small).write.mode("overwrite").format("noop").save()
    out = {}
    errors = {}
    for k in keys:
        try:
            t_small = run_median(spark, qs[k], small)
            t_big = run_median(spark, qs[k], big)
        except Exception as e:
            errors[k] = str(e).split("\n")[0][:300]
            print(f"# {k}: ERROR {errors[k]}", file=sys.stderr)
            continue
        exp = math.log(t_big / t_small) / math.log(factor)
        out[k] = {
            "t_small": round(t_small, 3),
            "t_big": round(t_big, 3),
            "exponent": round(exp, 3),
        }
        print(f"# {k}: {t_small:.3f}s -> {t_big:.3f}s  exp {exp:.3f}", file=sys.stderr)
    worst = max(out.items(), key=lambda kv: kv[1]["exponent"])
    print(json.dumps({
        "metric": "keygrowth_scaling",
        "small": small, "big": big, "factor": factor,
        "protocol": f"median-of-{REPS}",
        "queries": out,
        "worst": {"key": worst[0], **worst[1]},
        "superlinear": [k for k, v in out.items() if v["exponent"] > 1.3],
        "errors": errors,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
