"""Corpus-quantile quality gate (`text_quality_quantile_gate`):
threshold exactness against an independent Python model, kept-fraction
bounds, and the DuckDB differential. The bounded-histogram plan shape
is pinned in test_physical_plans.py's global-window guard."""

from __future__ import annotations

import math

from net7_etl_bus_spark.operators.text import (
    _QG_HI,
    _QG_LO,
    text_quality_classifier,
    text_quality_quantile_gate,
)
from net7_etl_bus_spark.plans import registry
from scripts.diffcheck import compare

from .conftest import SF_SMALL


def test_differential(spark, duck):
    key = "text_quality_quantile_gate"
    sdf = registry.queries()[key](spark, SF_SMALL).toPandas()
    odf = duck.execute(registry.oracles()[key]).df()
    assert not compare(key, sdf, odf)


def test_threshold_is_exact_p40_of_clamped_scores(spark):
    scores = text_quality_classifier(spark, SF_SMALL).toPandas()["raw_score"]
    clamped = scores.clip(_QG_LO, _QG_HI).sort_values().reset_index(drop=True)
    target = math.ceil(0.4 * len(clamped))
    expect_thr = int(clamped.iloc[target - 1])  # smallest s with cum >= target

    out = text_quality_quantile_gate(spark, SF_SMALL).toPandas()
    assert set(out["p40_threshold"]) == {expect_thr}
    # every kept doc is at/above the threshold; kept fraction >= 60%
    # (ties at the threshold are kept, so the drop is < 40%)
    assert (out["raw_score"].clip(_QG_LO, _QG_HI) >= expect_thr).all()
    assert len(out) >= 0.6 * len(clamped)
    # exactly the docs below the threshold were dropped
    assert len(out) == int((clamped >= expect_thr).sum())
