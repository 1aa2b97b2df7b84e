"""Empty-input robustness: every operator must execute on 0-row tables.

At 100 TB an empty partition, an empty date slice, or a filter that
matches nothing is routine — an operator that assumes "at least one
row" (driver-side ``collect()[0]``, division by a counted total, a
``head()`` probe) fails exactly there, and small-SF correctness runs
can never reach that path. ``scripts/emptycheck.py`` sweeps the FULL
registry (199 keys, 198 pass pre-fix; ``graph_pagerank`` divided by a
zero node count — fixed in operators/graph.py); this test pins the
subset with driver-side control flow / scalar probes / iterative loops
so the property survives refactors inside the normal suite budget.
"""

from __future__ import annotations

import os

import pytest

from net7_etl_bus_spark.plans import registry
from net7_etl_bus_spark.schemas import TESTDATA_TABLES

from .conftest import SF_SMALL

# Keys whose implementations contain driver-side decisions, counted
# totals, fixpoint loops, or multi-stage cascades — the shapes that
# historically break on empty input. The full-registry sweep lives in
# scripts/emptycheck.py.
EMPTY_CRITICAL = [
    "graph_pagerank",          # driver-counted n_nodes (the bug this file pins)
    "graph_common_neighbors",  # wedge join + top-k cut
    "dedup_cc_clusters",       # fixpoint loop w/ scalar convergence probe
    "dedup_cc_survivors",
    "dedup_minhash_verified",  # cascade w/ mega-doc fallback probe
    "dedup_minhash_lsh",
    "dedup_apply_increment",   # incremental state replay
    "scd2_apply_increment",
    "pipeline_curation",       # flagship composite
    "sim_search_bcast_index",  # driver-collected query rows
    "sim_search_ivfpq",        # centroid training on a counted sample
    "sim_search_ivf",
    "sim_eval_recall",
    "emb_centroid",
    "funnel_conversion",
    "cohort_retention",
    "rfm_segmentation",        # ntile over counted population
    "ts_gapfill_locf",         # spine from min/max scalars
    "ts_interpolate_linear",
    "agg_rollup_time",
    "anomaly_zscore",
    "profile_columns",
    "zorder_cluster",
    "skew_key_profile",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TESTDATA_TABLES:
        df = spark.read.parquet(os.path.join(SF_SMALL, f"{t}.parquet"))
        spark.createDataFrame([], df.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{t}.parquet"))
    return dst


@pytest.mark.parametrize("key", EMPTY_CRITICAL)
def test_runs_on_empty_tables(spark, empty_sf_dir, key):
    qs = registry.queries()
    assert key in qs, f"registry key vanished: {key}"
    # Must execute end-to-end; 0 rows or a constant row are both fine.
    n = qs[key](spark, empty_sf_dir).count()
    assert n >= 0
