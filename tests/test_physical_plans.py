"""Physical-plan assertions — the 100 TB properties, pinned as tests.

Correctness tests prove the operators compute the right answer; these
prove Catalyst produced the plan we designed for: filters pushed to
the parquet scan, columns pruned, dimension joins broadcast, the hot
path inside WholeStageCodegen, and no row-at-a-time Python anywhere in
the registry's relational surface. A regression that silently turns a
broadcast join into a shuffle join or drags a filter above the scan
fails here, at sf0.001, long before it melts a cluster.
"""

from __future__ import annotations

import pytest

from net7_etl_bus_spark.plans import registry

from .conftest import SF_SMALL


def plan_of(spark, name: str, mode: str = "formatted") -> str:
    df = registry.queries()[name](spark, SF_SMALL)
    return spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_q6_filters_pushed_to_scan(spark):
    """q6's shipdate/discount/quantity predicates must reach the
    parquet reader (PushedFilters), not run as a post-scan Filter only."""
    plan = plan_of(spark, "q6_forecast_revenue")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    line = pushed[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in line, f"{col} not pushed: {line}"


def test_q6_column_pruning(spark):
    """The scan must read only the 4 referenced columns of lineitem's
    16 — a scan that reads all columns for a narrow agg is wrong."""
    plan = plan_of(spark, "q6_forecast_revenue")
    schema_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schema_lines
    rs = schema_lines[0]
    for col in ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice"):
        assert col in rs
    for col in ("l_comment", "l_orderkey", "l_partkey", "l_shipmode"):
        assert col not in rs, f"unpruned column {col}: {rs}"


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q5_local_supplier_volume"])
def test_dimension_joins_broadcast(spark, name):
    """Dim-side joins (customer/region/nation/supplier at test SF)
    must be broadcast — a shuffle join on a broadcastable dim is the
    classic silent 100x at scale."""
    plan = plan_of(spark, name)
    assert "BroadcastHashJoin" in plan, f"no broadcast join in {name}:\n{plan}"


def test_q1_wholestage_codegen(spark):
    """The scan->filter->project->partial-agg pipeline of the flagship
    query must run inside WholeStageCodegen spans (JVM, no interpreted
    row processing). Under AQE codegen is only visible in the executed
    final plan, so run the query first; `*(n)` prefixes are the
    codegen-span markers."""
    df = registry.queries()["q1_pricing_summary"](spark, SF_SMALL)
    df.collect()
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")
    assert "isFinalPlan=true" in plan
    assert "*(1)" in plan, f"no WholeStageCodegen spans:\n{plan}"


def test_anti_join_is_broadcast_at_fixture_scale(spark):
    """J2 (the load-bearing incremental anti-join) over the small
    control table must broadcast; at fact-scale control tables AQE
    flips it to shuffle automatically."""
    plan = plan_of(spark, "anti_join_processed")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


# Ops allowed to contain Python stages: the declared UDF surface and
# the pandas escape hatches. Everything else in the registry must be
# pure JVM (built-in expressions only).
_PYTHON_ALLOWED = {
    "udf_scalar",            # deliberately the slow path, documented
    "udf_pandas_vectorized", # ArrowEvalPython (vectorized)
    "udaf_applyInPandas",    # FlatMapGroupsInPandas
    "udtf_surface",          # BatchEvalPythonUDTF
    "join_asof_pandas",      # FlatMapCoGroupsInPandas
    "mm_features",           # mapInPandas codec plumbing
    "mm_frame_sample",       # mapInPandas codec plumbing
    "dedup_minhash_mllib",   # MLlib pipeline (fit() driver-side)
}


def test_no_row_python_outside_declared_udf_surface(spark):
    """`BatchEvalPython` (row-at-a-time pickle loop) must not appear in
    ANY registered query except udf_scalar/udtf; Arrow/pandas stages
    only in the declared escape hatches."""
    for name in registry.queries():
        if name in _PYTHON_ALLOWED:
            continue
        plan = plan_of(spark, name, mode="simple")
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                       "FlatMapGroupsInPandas", "FlatMapCoGroupsInPandas"):
            assert marker not in plan, f"{marker} leaked into {name}"


def test_udf_scalar_is_arrow_or_batch_python(spark):
    """The declared Python scalar UDF shows up as a Python eval stage —
    proving the test above would catch a leak."""
    plan = plan_of(spark, "udf_scalar", mode="simple")
    assert "EvalPython" in plan
