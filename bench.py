"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE compact JSON line to stdout: {"metric": ..., "value": total_sec,
"unit": "sec", "queries": {name: sec}, "sf": ..., plus the
canary-normalized totals and per-query medians}. The FULL verbose
record (raw runs, composites, host block) goes to stderr as a
"# full: {...}" line — stdout stays small enough that the driver's
2000-char tail capture always yields a parseable artifact (VERDICT
r12 item 4: every prior BENCH_r*.json landed parsed=null because the
verbose JSON truncated mid-object).

Each query is forced end-to-end with the noop sink (full execution,
no driver-side collect cost, no output materialization).

Protocol (r4 verdict item 1): each query reports the MEDIAN of
``$SPARK_GRAFT_BENCH_REPS`` (default 3) timed executions; the headline
total is the sum of medians. Rationale: a single-shot timing mixes
one-time Catalyst planning + whole-stage-codegen compilation into the
measurement (measured ~1s of the old 1.7s q1 "wall" was compile, with
steady-state at ~0.7s) and the repo's round history shows ±35% host
swings on single shots. The median of 3 absorbs the compile-heavy
first run and one outlier, making round-over-round deltas signal. The
query set stays the frozen 16 + the 2 composites for series
comparability.

Host-band instrumentation (r6 verdict item 2 — the +19% r6 driver
number was adjudicated host noise, but the series couldn't prove it
from inside one run): the JSON now carries a ``host`` block (loadavg
before/after, cpu count), per-query raw ``runs`` (so IQR/spread are
readable per query), a ``spread_max_pct`` scalar (worst per-query
(max-min)/median — large values mean the host was unstable DURING the
run), and a ``close`` block re-running the headline set once more at
session close (open-vs-close drift measures host movement across the
run; the comparable ``value``/``queries`` stay the OPEN pass for
series continuity).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from net7_etl_bus_spark.plans import registry  # noqa: E402
from net7_etl_bus_spark.session import get_spark  # noqa: E402

# Headline set: scan-agg, shuffle joins, windows, as-of, dedup cascade,
# similarity, text — the ops whose physical plans carry the 100 TB story.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "agg_hash",
    "agg_cube",
    "win_running_agg",
    "topk_per_group",
    "join_asof",
    "win_session",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "sim_search_topk",
    "text_stats",
    "text_token_count",
]

# Tracked round-over-round outside the frozen headline total: the two
# flagship composites whose wall time best represents a 100 TB curation
# run (lang gate -> quality gate -> exact dedup -> verified near-dedup
# -> token ledger; LSH pairs -> connected components -> surviving corpus).
COMPOSITE_QUERIES = [
    "pipeline_curation",
    "dedup_cc_survivors",
]

# Extended headline block (r5 verdict item 8): the LLM-pipeline ops
# promoted into the per-round series so their plans get the same
# round-over-round pressure as the frozen 16 — retrieval scoring
# (tf explode + double hash agg + rank window), sequence packing
# (two-level distributed prefix sum), and the IVF coarse-quantizer
# trainer (broadcast-centroid Lloyd's rounds). Reported separately so
# the comparable 16-query total stays frozen.
EXTENDED_QUERIES = [
    "text_tfidf_topk",
    "text_pack_sequences",
    "emb_kmeans_train",
]


REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

# Quiet-host gate (r8 verdict item 2): BENCH_r08 ran at loadavg 6.8
# (right after the test suite) and recorded spread_max 116.9% that the
# adaptive warmup cannot fix — the contention was mid-rep, not JIT.
# If the 1-minute loadavg at start exceeds the gate, sleep once and
# re-check; if STILL hot, run anyway (a recorded noisy number beats no
# record) but stamp host.load_gate.hot_start=true so the series reader
# discounts the run instead of chasing phantom regressions.
LOAD_GATE = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "4.0"))
LOAD_RETRY_SEC = int(os.environ.get("SPARK_GRAFT_BENCH_LOAD_RETRY_SEC", "150"))

# Series-reference canary (r9 verdict item 4 -> r10): the open-pass
# cpu_canary_sec of the series' cleanest recorded run (BENCH_r09: the
# load-gated quiet-host run, spread_max 15.9%), pinned in BASELINE.md
# §canary. Every run emits totals multiplied by (CANARY_REF /
# canary_now): when the host is slower than the reference (canary_now
# larger), the raw totals are deflated correspondingly, so
# round-over-round deltas in the *_canary_norm fields are
# machine-readably host-speed-adjusted — no human replaying the canary
# arithmetic. The raw fields stay untouched for series continuity.
CANARY_REF = 0.167


def run_median(spark, fn, sf_dir: str):
    """Median of REPS end-to-end executions, preceded by ADAPTIVE
    untimed warmup (r7 verdict item 6: BENCH_r07's spread_max 129.5%
    was almost entirely rep-1 JIT/classload — q1 2.214 vs 0.964 — so
    median-of-3 straddled warmup and steady state). One warmup fixes
    most queries, but window-heavy plans keep re-tiering under C2 for
    several executions (win_running_agg measured 0.52/0.40/0.33 across
    post-warmup reps), so warmup repeats — bounded at 5 total — until
    two consecutive untimed runs agree within 12% (r9: a quiet-host
    run showed agg_hash timed reps 0.659/0.489/0.412 — monotone
    tiering descent that the old 20%-agreement/3-run stop let
    through, putting spread_max at 50% with the host itself clean; a
    12% gate keeps warming through that descent). The DataFrame is rebuilt per rep (fresh
    plan object) so per-rep analysis cost stays in the number — that
    part is real per-query work, not one-time JVM warmup."""

    def one() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    prev = one()
    for _ in range(4):  # up to 4 extra warmups until steady
        cur = one()
        settled = abs(prev - cur) <= 0.12 * max(cur, 1e-9)
        prev = cur
        if settled:
            break
    ts = [one() for _ in range(REPS)]
    return statistics.median(ts), ts


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # platform without getloadavg
        return []


def _cpu_canary() -> float:
    """Median-of-3 timing of a FIXED pure-Python workload — a
    host-SPEED reference stamped into the JSON beside loadavg.
    Loadavg only sees local runnable tasks; it cannot see the host
    itself getting slower (VM-neighbor contention, hypervisor
    steal, thermal caps). r9 measured two back-to-back loadavg-clean
    runs whose every query differed uniformly ~2x — only a canary
    makes that visible from inside the artifact. The series reader
    divides bench totals by (canary / series-typical-canary) before
    calling anything a regression. Interpreter-bound on one core:
    no JVM, no IO, no BLAS thread variance."""
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        s = 0
        for i in range(5_000_000):
            s += i
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def wait_for_quiet_host(
    loadavg=_loadavg, sleep=time.sleep
) -> tuple[list[float], dict]:
    """The quiet-host gate, as a function so tests can pin its three
    paths (quiet / recovered-after-wait / still-hot) without a real
    150 s sleep. Returns the loadavg the measurement starts at and the
    ``host.load_gate`` JSON block."""
    load_before = loadavg()
    gate = {"max_load": LOAD_GATE, "waited_sec": 0, "hot_start": False}
    if load_before and load_before[0] > LOAD_GATE:
        print(
            f"# host busy at start (loadavg {load_before[0]} > {LOAD_GATE}): "
            f"sleeping {LOAD_RETRY_SEC}s once before measuring",
            file=sys.stderr,
        )
        sleep(LOAD_RETRY_SEC)
        gate["waited_sec"] = LOAD_RETRY_SEC
        load_before = loadavg()
        if load_before and load_before[0] > LOAD_GATE:
            gate["hot_start"] = True
            print(
                f"# WARNING: host STILL busy (loadavg {load_before[0]}) — "
                "running anyway; treat this run's regressions as "
                "host-contended, not code",
                file=sys.stderr,
            )
    return load_before, gate


def compact_line(full: dict) -> str:
    """The stdout artifact: a compact single-line JSON projection of
    the full record, guaranteed to fit inside the driver's 2000-char
    stdout tail capture (VERDICT r12 item 4). Keeps the documented
    driver contract fields (metric/value/unit/queries/sf), the
    canary-normalized totals, and both per-query normalized median
    maps; if the line ever threatens the capture window, the
    normalized maps are dropped in redundancy order — the raw
    ``queries`` map always stays."""
    compact = {
        k: full[k]
        for k in (
            "metric", "value", "unit", "sf", "queries", "close_total",
            "drift_pct", "spread_max_pct", "canary_ref",
            "open_total_canary_norm", "close_total_canary_norm",
            "composites_total", "extended_total",
            "queries_canary_norm", "close_queries_canary_norm",
        )
    }
    compact["canary"] = full["host"]["cpu_canary_sec"]
    compact["hot_start"] = full["host"]["load_gate"]["hot_start"]
    line = json.dumps(compact, separators=(",", ":"))
    for drop in ("queries_canary_norm", "close_queries_canary_norm"):
        if len(line) <= 1900:
            break
        compact.pop(drop, None)
        line = json.dumps(compact, separators=(",", ":"))
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    load_before, load_gate = wait_for_quiet_host()
    canary_open = _cpu_canary()
    spark = get_spark("net7-etl-bus-bench")
    qs = registry.queries()

    # Warm up the JVM/codegen path once (not timed).
    qs["q6_forecast_revenue"](spark, sf_dir).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        med, ts = run_median(spark, qs[name], sf_dir)
        timings[name] = round(med, 3)
        runs[name] = [round(t, 3) for t in ts]
        print(
            f"# {name}: med {timings[name]:.3f}s  runs {runs[name]}",
            file=sys.stderr,
        )

    # Separately-reported composite block (NOT part of the comparable
    # 16-query total, which stays frozen for round-over-round series):
    # the two most 100 TB-representative end-to-end cascades.
    composites: dict[str, float] = {}
    for name in COMPOSITE_QUERIES:
        med, ts = run_median(spark, qs[name], sf_dir)
        composites[name] = round(med, 3)
        print(
            f"# [composite] {name}: med {composites[name]:.3f}s  runs {[round(t, 3) for t in ts]}",
            file=sys.stderr,
        )

    extended: dict[str, float] = {}
    for name in EXTENDED_QUERIES:
        med, ts = run_median(spark, qs[name], sf_dir)
        extended[name] = round(med, 3)
        print(
            f"# [extended] {name}: med {extended[name]:.3f}s  runs {[round(t, 3) for t in ts]}",
            file=sys.stderr,
        )

    # Close pass: the headline set once more, after ~2 minutes of other
    # work — open-vs-close drift on identical code = host movement.
    close: dict[str, float] = {}
    for name in BENCH_QUERIES:
        med, ts = run_median(spark, qs[name], sf_dir)
        close[name] = round(med, 3)
        print(
            f"# [close] {name}: med {close[name]:.3f}s  runs {[round(t, 3) for t in ts]}",
            file=sys.stderr,
        )

    load_after = _loadavg()
    canary_close = _cpu_canary()
    total = round(sum(timings.values()), 3)
    close_total = round(sum(close.values()), 3)
    norm_open = CANARY_REF / canary_open if canary_open > 0 else 1.0
    norm_close = CANARY_REF / canary_close if canary_close > 0 else 1.0
    spread_max_pct = round(
        max(
            (
                (max(r) - min(r)) / timings[n] * 100.0
                for n, r in runs.items()
                if timings[n] > 0
            ),
            default=0.0,  # degenerate run: every median rounded to 0
        ),
        1,
    )
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "composites": composites,
        "composites_total": round(sum(composites.values()), 3),
        "extended": extended,
        "extended_total": round(sum(extended.values()), 3),
        "close": close,
        "close_total": close_total,
        "drift_pct": round((close_total - total) / total * 100.0, 1)
        if total > 0
        else 0.0,
        "spread_max_pct": spread_max_pct,
        # host-speed-adjusted totals and per-query medians:
        # raw × (CANARY_REF / canary_measured); CANARY_REF is
        # pinned in BASELINE.md §canary (= BENCH_r09 open)
        "canary_ref": CANARY_REF,
        "open_total_canary_norm": round(total * norm_open, 3),
        "close_total_canary_norm": round(close_total * norm_close, 3),
        "queries_canary_norm": {
            n: round(v * norm_open, 3) for n, v in timings.items()
        },
        # the cross-round per-query comparator (r12 showed the open
        # pass swinging ±15% while close stayed within 2%)
        "close_queries_canary_norm": {
            n: round(v * norm_close, 3) for n, v in close.items()
        },
        "host": {
            "loadavg_before": load_before,
            "loadavg_after": load_after,
            "cpus": os.cpu_count(),
            "load_gate": load_gate,
            # fixed pure-CPU workload, sec (lower = faster
            # host); open vs close = speed drift DURING the run
            "cpu_canary_sec": [canary_open, canary_close],
        },
        "protocol": (
            f"untimed warmup + median-of-{REPS}, "
            "open+close headline passes"
        ),
        "sf": sf,
    }
    # Full verbose record to STDERR (local tooling / ROUNDLOG capture);
    # stdout carries ONLY the compact line below. Rationale (VERDICT
    # r12 item 4): the driver records the LAST 2000 chars of stdout —
    # the ~4 KB verbose JSON always truncated mid-object, so every
    # BENCH_r*.json in the series landed with parsed=null and an
    # unusable tail fragment. The compact line keeps the headline
    # scalars plus both per-query canary-normalized median maps (the
    # series comparators) and stays well inside the capture window.
    print("# full: " + json.dumps(full), file=sys.stderr)
    print(compact_line(full))
    spark.stop()


if __name__ == "__main__":
    main()
