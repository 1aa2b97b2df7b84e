"""Empirical scaling harness: does each headline plan's wall time grow
linearly with input size, as the 100 TB design claims?

Materializes replicated mirrors of the sf0.1 testdata at xN for N in
``--points`` (default 1,2,4): copy i shifts every int64 id/key column
by i*KEY_SHIFT (FK joins stay consistent within a copy; group/join
cardinality scales with the data, as it does in production) and makes
document text genuinely distinct per copy (per-word copy suffix), so
duplicate STATISTICS are scale-invariant — replication must not
manufacture cross-copy near-duplicates, or the dedup ops would be
measured on an N^2 pair explosion that is a property of the mutated
data, not of the plan. nation/region are shared dimensions and are
not replicated (countries don't multiply with data volume).

For each point the battery below runs with bench.py's median-of-REPS
protocol (noop sink, fresh plan per rep). Output: one JSON line with
per-query seconds per point and the fitted scaling exponent
``log(t_N/t_1)/log(N)`` at the largest N. Exponent ~1 = linear
(scan/shuffle-bound as designed); <1 = fixed overhead still
amortizing at this scale; >~1.3 sustained = superlinear red flag
(something in the plan degenerates with input size).

Usage:
    python scripts/scalecheck.py [--points 1,2,4] [--reps 3] [--keep]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import statistics
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from net7_etl_bus_spark.plans import registry  # noqa: E402
from net7_etl_bus_spark.schemas import TESTDATA_TABLES  # noqa: E402
from net7_etl_bus_spark.session import get_spark  # noqa: E402

SRC_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Far above any id at sf<=1 (max observed ~6e6), far below int64.
KEY_SHIFT = 10**12

# Shared dimensions: replicating them would be unrealistic (regions
# don't grow with data volume) and would break broadcast-side
# assumptions the scale story depends on.
SHARED_DIMS = {"nation", "region"}

# The scan/join/agg/window/text battery whose cost is designed to be
# linear in input bytes. Near-dup ops over embeddings are excluded:
# replicated vectors are genuine near-duplicates, so their candidate
# pair count is a property of the replicated data (N^2), not of the
# plan; dedup over TEXT is included because the per-copy word suffix
# keeps its duplicate statistics scale-invariant.
SCALE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "agg_hash",
    "win_running_agg",
    "topk_per_group",
    "join_asof",
    "win_session",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_search_topk",
    "text_stats",
    "text_token_count",
    # The flagship composites: the full curation cascade (lang ->
    # quality -> exact dedup -> verified near-dedup -> token ledger)
    # and LSH -> connected components -> surviving corpus. The
    # per-copy word suffix keeps near-dup candidate counts linear in
    # corpus size, so a superlinear exponent here would be a real
    # cascade defect, not a replication artifact.
    "pipeline_curation",
    "dedup_cc_survivors",
    # Round-5 additions: the packing ledger's two-level prefix sum
    # (cost must stay linear in documents — a superlinear exponent
    # would mean the global window is seeing corpus-sized input) and
    # the integer fixed-point mixture replicator (pure narrow map).
    "text_pack_sequences",
    "sample_mixture_epochs",
    # Retrieval scoring: tf/df aggregates + broadcast query join must
    # stay token-linear; the per-doc/per-query top-k is WindowGroupLimit
    # so the rank cost cannot grow past k rows per partition.
    "text_tfidf_topk",
    "text_bm25_search",
    # Triangle counting: key-shifted copies are disjoint subgraphs, so
    # edges AND triangles scale linearly by construction — a
    # superlinear exponent means the wedge join is degenerating.
    "graph_triangle_count",
    # k-means: per-round cost is corpus x K narrow work + a 64*K-cell
    # aggregate — linear in vectors regardless of their values (so,
    # unlike the near-dup ops, replicated embeddings are fine here).
    "emb_kmeans_train",
    # r10 NB trainer: token explode + |docs|-bounded teacher join + a
    # 64-cell conditional-count aggregate — token-linear, and teacher
    # labels are per-doc deterministic so replicated docs are fine.
    # emb_semdedup_trained is deliberately NOT enrolled: replicated
    # identical vectors are cos=1 near-dups of each other, so the
    # within-cluster pair term grows quadratically WITH THE REPLICATION
    # ITSELF — the same by-construction exclusion as emb_semdedup and
    # the exact all-pairs baselines (SCALE.md r9/r10 adjudications).
    "text_quality_nb_train",
    # r11 quantized NB scoring chain: the trainer above + one 64-row
    # broadcast weight join + a doc_id hash aggregate — token-linear
    # end to end, same replication-safety argument as the trainer.
    # sim_search_ivf_trained / sim_search_ivfpq_trained (r12) are NOT
    # enrolled: they compose shapes that already carry rows
    # (emb_kmeans_train here; the IVF / IVF-PQ probe plans on the
    # annladder at 0.38/0.44) and add no new growth mechanism.
    "text_quality_nb_scored",
    # r13 clock-fuzz-hardened plans: the decay agg (one scan + one
    # map-combining hash agg — the [0,K] clamp must not change
    # linearity) and the cogroup-pandas as-of join (two user_id
    # shuffles + per-group searchsorted — Python work is n log n in
    # group size, effectively linear at bounded group cardinality).
    # sim_search_ivf_cascade is NOT enrolled: its assignment tier is
    # the annladder's measured cascade shape (0.34/0.45) with fixed
    # S=2 — no new growth mechanism.
    "agg_decay_weighted",
    "join_asof_pandas",
    # r13 optimization-round pushdown fix (the one changed TEXT plan;
    # the per-copy word suffix keeps its duplicate statistics
    # scale-invariant like the other text keys): one explode + two
    # hash aggregations — token-linear. The session's other two
    # changed plans are embedding near-dup/ANN ops
    # (emb_dedup_cosine, sim_search_lsh), excluded by the standing
    # replicated-vectors-are-real-near-dups rule above.
    "text_repetition",
]


def _shift_copy(t: pa.Table, i: int, table: str) -> pa.Table:
    """Copy i of a table: id/key columns shifted, text made distinct."""
    if i == 0:
        return t
    for ci, field in enumerate(t.schema):
        if field.type == pa.int64() and (
            field.name.endswith("key") or field.name.endswith("_id")
        ):
            t = t.set_column(
                ci, field, pc.add(t.column(ci), pa.scalar(i * KEY_SHIFT, pa.int64()))
            )
    if table == "documents":
        ci = t.schema.get_field_index("text")
        suffixed = [
            None if v is None else " ".join(f"{w}x{i}" for w in v.split())
            for v in t.column(ci).to_pylist()
        ]
        t = t.set_column(ci, t.schema.field(ci), pa.array(suffixed, pa.string()))
    return t


def materialize(dst_root: str, n: int) -> str:
    """xN mirror at dst_root/x{n}: each copy is its own parquet file
    inside a <table>.parquet directory (Spark reads the directory;
    one file per copy preserves scan parallelism at every N)."""
    dst = os.path.join(dst_root, f"x{n}")
    if os.path.isdir(dst):
        return dst
    os.makedirs(dst)
    for table in TESTDATA_TABLES:
        src = os.path.join(SRC_DIR, f"{table}.parquet")
        t = pq.read_table(src)
        out_dir = os.path.join(dst, f"{table}.parquet")
        os.makedirs(out_dir)
        copies = 1 if table in SHARED_DIMS else n
        for i in range(copies):
            pq.write_table(_shift_copy(t, i, table), os.path.join(out_dir, f"part-{i}.parquet"))
    return dst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="1,2,4")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--keep", action="store_true", help="keep materialized mirrors")
    ap.add_argument("--workdir", default="/tmp/scalecheck")
    args = ap.parse_args()
    points = sorted({int(p) for p in args.points.split(",")})

    # Size the single local JVM for above-test-scale inputs: local[32]
    # defaults to a 1 GiB heap shared by driver AND all 32 task
    # threads, and at x16 the broadcast build (a few MB of rows, but
    # needing its ~300 MB build reservation against 32 concurrent
    # tasks' execution memory) is refused. On a real cluster this is
    # deployment config, not engine config — which is why it lives
    # here and not in session defaults. Only effective if this process
    # creates the first session (driver memory is JVM-launch-time).
    spark = get_spark(
        "scalecheck",
        extra_conf={"spark.driver.memory": os.environ.get("SCALECHECK_DRIVER_MEM", "8g")},
    )
    qs = registry.queries()
    results: dict[int, dict[str, float]] = {}
    for n in points:
        sf_dir = materialize(args.workdir, n)
        timings: dict[str, float] = {}
        for name in SCALE_QUERIES:
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
                ts.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(ts), 3)
            print(f"# x{n} {name}: {timings[name]}s", file=sys.stderr)
        results[n] = timings

    # Fit between the two LARGEST points: the small points are
    # overhead-dominated by design (per-query scheduling amortizes as
    # data grows), and the claim under test is the slope in the
    # data-bound regime, not the amortization curve.
    exponents = {}
    if len(points) > 1:
        n_lo, n_hi = points[-2], points[-1]
        for name in SCALE_QUERIES:
            t1, tn = results[n_lo][name], results[n_hi][name]
            exponents[name] = round(
                math.log(max(tn, 1e-9) / max(t1, 1e-9)) / math.log(n_hi / n_lo), 2
            )
    out = {
        "metric": "scaling_exponent",
        "src": SRC_DIR,
        "points": {str(n): results[n] for n in points},
        "totals": {str(n): round(sum(results[n].values()), 3) for n in points},
        "exponents": exponents,
        "reps": args.reps,
        "superlinear": sorted(k for k, v in exponents.items() if v > 1.3),
    }
    print(json.dumps(out))
    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)
    return 1 if out["superlinear"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
