"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 — the in-repo mirror of the driver's correctness gate
(the standalone runner scripts/diffcheck.py does the same at any SF).
"""

from __future__ import annotations

import pytest

from net7_etl_bus_spark.plans import registry
from scripts.diffcheck import compare

from .conftest import SF_SMALL

QUERIES = registry.queries()
ORACLES = registry.oracles()


def test_every_query_has_callable():
    assert len(QUERIES) >= 70
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMALL).toPandas()
    odf = duck.execute(ORACLES[name]).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_no_oracle_queries_run(name, spark):
    # rows-only check (the driver's weaker fallback)
    assert QUERIES[name](spark, SF_SMALL).count() >= 0
