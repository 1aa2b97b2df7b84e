"""One-table-empty DIFFERENTIAL pins (tenth mutation class).

``scripts/emptycheck.py`` has two modes: the all-empty sweep proves
every operator EXECUTES on 0-row input; the ``one`` mode builds a
mirror where exactly ONE table is empty and runs the full
Spark-vs-DuckDB value comparison — because an empty join side, an
empty NOT-EXISTS subquery, an empty broadcast dimension, or a 0/0
division over an empty aggregate are SEMANTICS, not liveness. The
class caught a real divergence: Spark's Expand-based GROUPING
SETS/ROLLUP/CUBE produce NO rows over an empty relation, while ANSI
(DuckDB) emits the grand-total row with COUNT(*)=0 — the engine's
documented behavior is now encoded in the oracles as
``HAVING COUNT(*) > 0`` (a no-op on any non-empty input).

This module pins the keys where one-empty semantics are load-bearing
so the property survives refactors inside the normal suite budget;
the full 10-table x full-registry sweep stays in the script.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from net7_etl_bus_spark.plans import registry
from net7_etl_bus_spark.schemas import TESTDATA_TABLES
from scripts.diffcheck import compare
from scripts.emptycheck import build_one_empty_mirror

from .conftest import SF_SMALL

# empty_table -> keys whose VALUES the differential must preserve.
ONE_EMPTY_PINS = {
    "customer": [
        "agg_grouping_sets",   # the grand-total-suppression fix itself
        "agg_rollup",
        "q13_order_count_dist",
    ],
    "orders": [
        "agg_cube",
        "q22_dormant_customers",  # NOT EXISTS over an EMPTY subquery: all pass
        "cohort_retention",
    ],
    "events": [
        "agg_rollup_time",     # time-bucketed rollup grand-total suppression
        "win_session",
        "funnel_conversion",   # global funnel over zero users
    ],
    "supplier": [
        "q16_supplier_part_cnt",  # NOT EXISTS rewrite with an empty probe side
        "q2_min_cost_supplier",
    ],
    "lineitem": [
        "q1_pricing_summary",
        "q14_promo_revenue",   # global agg over empty join: NULL/NULL division
    ],
    "part": [
        "q17_small_quantity_revenue",  # empty broadcast dim -> empty join
    ],
    "documents": [
        "pipeline_curation",
        "dedup_cc_survivors",
    ],
    "embeddings": [
        "sim_search_topk",
        "emb_norm_stats",
    ],
    "region": [
        "q5_local_supplier_volume",  # empty broadcast catalog
    ],
    "nation": [
        "q7_volume_shipping",
    ],
}

_CASES = [(t, k) for t, keys in ONE_EMPTY_PINS.items() for k in keys]


@pytest.fixture(scope="module")
def one_empty_dirs(tmp_path_factory):
    """One mirror per pinned table: every other table is a symlink to
    the sf0.001 source (byte-identical for both engines), the empty
    one is a single zero-row parquet file with the source schema."""
    dirs: dict[str, str] = {}
    for t in ONE_EMPTY_PINS:
        dst = str(tmp_path_factory.mktemp(f"one_empty_{t}"))
        build_one_empty_mirror(SF_SMALL, dst, t)
        dirs[t] = dst
    return dirs


@pytest.fixture(scope="module")
def duck_factory(one_empty_dirs):
    cons: dict[str, duckdb.DuckDBPyConnection] = {}

    def get(table: str) -> duckdb.DuckDBPyConnection:
        if table not in cons:
            con = duckdb.connect()
            for t in TESTDATA_TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{one_empty_dirs[table]}/{t}.parquet')"
                )
            cons[table] = con
        return cons[table]

    yield get
    for con in cons.values():
        con.close()


def test_pinned_tables_are_real():
    assert set(ONE_EMPTY_PINS) <= set(TESTDATA_TABLES)


@pytest.mark.parametrize(("table", "key"), _CASES)
def test_one_empty_differential(spark, one_empty_dirs, duck_factory, table, key):
    qs, oracles = registry.queries(), registry.oracles()
    sdf = qs[key](spark, one_empty_dirs[table]).toPandas()
    odf = duck_factory(table).execute(oracles[key]).df()
    problems = compare(key, sdf, odf)
    assert not problems, f"{key} with {table} empty: {problems}"


# --- tiny (single-row) differential pins -----------------------------
#
# The eleventh class (`emptycheck.py tiny`): every table cut to its
# FIRST row — degenerate-but-nonempty input, where a different set of
# edge semantics lives than at zero rows. 200/200 green first run;
# these keys are the ones whose math degenerates hardest at n=1.
TINY_PINS = [
    "agg_stats_moments",       # sample stddev/skew/kurtosis of ONE observation
    "agg_regr",                # regression through a single point
    "rfm_segmentation",        # ntile over fewer rows than tiles
    "win_ntile_percent",
    "agg_percentile_disc",     # percentile of one value
    "agg_percentile_approx",   # sketch vs exact anchor on one value
    "anomaly_zscore",          # z-score needs a stddev that is NULL at n=1
    "ts_resample_ohlc",        # OHLC from a single tick
    "ts_interpolate_linear",   # interpolation with a single anchor
    "sim_search_ivfpq",        # k-means/PQ training on ONE vector
    "sim_search_ivf",
    "emb_centroid",
    "dedup_minhash_verified",  # one-document corpus through the cascade
]


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    from scripts.emptycheck import build_tiny_mirror

    dst = str(tmp_path_factory.mktemp("tiny_one_row"))
    build_tiny_mirror(SF_SMALL, dst, 1)
    return dst


@pytest.fixture(scope="module")
def tiny_duck(tiny_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tiny_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", TINY_PINS)
def test_single_row_differential(spark, tiny_dir, tiny_duck, key):
    qs, oracles = registry.queries(), registry.oracles()
    sdf = qs[key](spark, tiny_dir).toPandas()
    odf = tiny_duck.execute(oracles[key]).df()
    problems = compare(key, sdf, odf)
    assert not problems, f"{key} on single-row tables: {problems}"


def test_mirror_is_sharp(spark, one_empty_dirs):
    """The mirror must actually be what the class claims: the named
    table empty, every other table byte-identical to the source."""
    d = one_empty_dirs["orders"]
    assert spark.read.parquet(os.path.join(d, "orders.parquet")).count() == 0
    src_n = spark.read.parquet(os.path.join(SF_SMALL, "lineitem.parquet")).count()
    assert spark.read.parquet(os.path.join(d, "lineitem.parquet")).count() == src_n
