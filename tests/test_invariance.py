"""Execution-config invariance: the same query on the same data must
produce identical values regardless of how the engine chooses to
execute it.

The reorder fuzz class (tests/test_fuzz_nulls.py) varies the DATA
layout; this module varies the EXECUTION config — shuffle partition
count and AQE — which changes partial-aggregation grouping, join
strategy selection, and task scheduling order. On a 1000-executor
cluster neither is ever stable run-to-run, so any query whose result
moves under these knobs returns a different answer every time it runs
in production. The keys here are the ones most tempted by
execution-order dependence (keepers, first/last, collected lists,
iterative propagation, float-adjacent aggregation).
"""

from __future__ import annotations

import pytest

from net7_etl_bus_spark.plans import registry

from .conftest import SF_SMALL

INVARIANCE_KEYS = [
    "agg_collect_list",
    "dedup_exact_survivors",
    "dedup_cc_survivors",
    "stream_dedup_first_event",
    "win_running_distinct",
    "scd2_dimension",
    "ts_resample_ohlc",
    "graph_pagerank",
    "q1_pricing_summary",
    "topk_per_group",
]

# (shuffle partitions, AQE enabled) — the session default in tests is
# (8, true); 1 forces everything through a single reducer, 37 is a
# prime that shreds every hash distribution differently, AQE off
# removes runtime coalescing/skew-splitting from the plan.
CONFIGS = [("1", "false"), ("37", "true")]


@pytest.fixture(scope="module")
def baseline(spark):
    out = {}
    qs = registry.queries()
    for key in INVARIANCE_KEYS:
        out[key] = qs[key](spark, SF_SMALL).toPandas()
    return out


@pytest.mark.parametrize("key", INVARIANCE_KEYS)
@pytest.mark.parametrize("parts,aqe", CONFIGS)
def test_result_invariant_under_execution_config(spark, baseline, key, parts, aqe):
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    import diffcheck as dc

    conf = spark.conf
    orig = {
        "spark.sql.shuffle.partitions": conf.get("spark.sql.shuffle.partitions"),
        "spark.sql.adaptive.enabled": conf.get("spark.sql.adaptive.enabled"),
    }
    try:
        conf.set("spark.sql.shuffle.partitions", parts)
        conf.set("spark.sql.adaptive.enabled", aqe)
        got = registry.queries()[key](spark, SF_SMALL).toPandas()
    finally:
        for k, v in orig.items():
            conf.set(k, v)
    problems = dc.compare(key, got, baseline[key])
    assert not problems, (
        f"{key} changed under (partitions={parts}, aqe={aqe}): "
        + "; ".join(problems)
    )


def test_funnel_counts_monotone_nonincreasing(spark):
    """A funnel can only narrow: n_signup >= n_view >= n_purchase, and
    quantized conversions are in [0, 1e6]."""
    from net7_etl_bus_spark.plans import registry

    rows = sorted(
        registry.queries()["events_funnel"](spark, SF_SMALL).collect(),
        key=lambda r: r.step_idx,
    )
    assert [r.step for r in rows] == ["signup", "view", "purchase"]
    ns = [r.n_users for r in rows]
    assert ns == sorted(ns, reverse=True), ns
    assert ns[0] > 0
    assert rows[0].conv_from_prev_q == 1_000_000
    for r in rows[1:]:
        assert 0 <= r.conv_from_prev_q <= 1_000_000


def test_containment_lsh_is_subset_of_exact_containment(spark):
    """The production twin's results must be a SUBSET of the exact
    baseline's (LSH only restricts candidates; the arithmetic is the
    same hashed-set containment, and hash collisions are ~2^-61), with
    identical scores on every surviving pair."""
    from net7_etl_bus_spark.plans import registry

    qs = registry.queries()
    exact = {
        (r.doc_src, r.doc_dst): (r.n_src, r.inter, r.cont_q)
        for r in qs["dedup_containment"](spark, SF_SMALL).collect()
    }
    lsh = {
        (r.doc_src, r.doc_dst): (r.n_src, r.inter, r.cont_q)
        for r in qs["dedup_containment_lsh"](spark, SF_SMALL).collect()
    }
    assert set(lsh) <= set(exact), set(lsh) - set(exact)
    for k, v in lsh.items():
        assert v == exact[k], (k, v, exact[k])
