"""Null-injection fuzz differential, pinned in the suite.

scripts/fuzzcheck.py found 42 of 197 oracle-checked keys diverging (or
crashing) between Spark and DuckDB once NULLs were injected into every
column — default null ordering, NULL join/partition keys, size(NULL),
''-on-NULL concat_ws, NaT-crashing pandas kernels, a nondeterministic
DuckDB window bug. All are fixed with explicit, documented null
semantics on BOTH sides. This module re-runs exactly those 42 keys
against a seeded mutated mirror so a refactor can't silently
reintroduce any of them; the full-registry sweep stays in
scripts/fuzzcheck.py (run it when adding operators).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

from net7_etl_bus_spark.plans import registry
from net7_etl_bus_spark.schemas import TESTDATA_TABLES

from .conftest import SF_SMALL

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts"))

RATE, SEED = 0.03, 0

# The 42 keys that diverged in the round-4 fuzz sweep.
FUZZ_REGRESSION_KEYS = [
    "cohort_retention", "dedup_apply_increment", "emb_norm_stats",
    "emb_pq_quantize", "event_transitions", "fn_array", "fn_array_hof",
    "fn_regexp", "fn_string", "join_asof", "join_asof_forward",
    "join_asof_pandas", "join_fuzzy_levenshtein", "join_scd2_pointintime",
    "mm_features", "mm_frame_sample", "mm_phash_dedup", "pipeline_curation",
    "sample_mixture_epochs", "sample_weighted", "scan_schema_evolution",
    "scd2_apply_increment", "scd2_dimension",
    "sim_search_bcast_index", "sim_search_ivfpq", "sim_search_pq",
    "stream_dedup_first_event", "text_lang_id", "text_quality",
    "text_stats", "text_token_count", "ts_resample_ohlc",
    "ts_rolling_stats", "udaf_applyInPandas", "win_first_last",
    "win_gaps_islands", "win_lag_lead", "win_ntile_percent",
    "win_pct_change", "win_running_agg", "win_running_distinct",
    "win_session", "win_sliding", "win_tumbling",
    "text_pack_sequences", "text_chunk_overlap",
]


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("fuzz_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            RATE,
            SEED,
        )
    return dst


@pytest.fixture(scope="module")
def fuzz_duck(fuzz_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fuzz_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", FUZZ_REGRESSION_KEYS)
def test_null_fuzz_parity(spark, fuzz_dir, fuzz_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, fuzz_dir).toPandas()
    odf = fuzz_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"


# The 18 keys that diverged under non-ASCII text (unicode fuzz mode):
# Java vs utf8proc case mapping poisoned every lower()-derived hash,
# token stat and fingerprint; DuckDB's strict JSON parser threw where
# Spark's is lenient. Fixed by the ASCII-only case-fold engine spec
# (operators/dedup.py _NORM) and json_valid() oracle guards.
UNICODE_REGRESSION_KEYS = [
    "text_chunk_overlap",
    "agg_pivot", "dedup_apply_increment", "dedup_exact",
    "dedup_lsh_jaccard_est", "dedup_minhash_signature", "dedup_simhash",
    "fn_array_hof", "fn_json", "fn_json_typed", "fn_string",
    "fn_variant", "project_expr", "text_feature_hash",
    "text_inverted_index", "text_quality_classifier", "text_repetition",
    "text_stats", "text_token_count",
]


@pytest.fixture(scope="module")
def unicode_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("unicode_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            0.05,
            SEED,
            "unicode",
        )
    return dst


@pytest.fixture(scope="module")
def unicode_duck(unicode_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{unicode_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", UNICODE_REGRESSION_KEYS)
def test_unicode_fuzz_parity(spark, unicode_dir, unicode_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, unicode_dir).toPandas()
    odf = unicode_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"


# The 37 keys that diverged or errored under extreme numerics (NaN,
# +/-Inf, 1e300, denormals, int boundaries): Spark's non-ANSI decimal
# casts silently DROPPED corrupt rows from sums and floor() saturates
# at +/-2^63, while DuckDB's strict casts failed whole queries. Fixed
# by the dsum poison contract (corruption -> NaN, surfaced) plus
# per-op guards; DuckDB's quantile_disc NaN-smallest quirk and
# truncating `//` are worked around in oracles.
EXTREMES_REGRESSION_KEYS = [
    "agg_bitmap_distinct", "agg_cube", "agg_decay_weighted",
    "agg_grouping_sets", "agg_hash", "agg_histogram",
    "agg_percentile_disc", "agg_pivot", "agg_regr", "agg_rollup",
    "agg_rollup_time", "agg_stats_moments", "agg_weighted_avg",
    "anomaly_zscore", "fn_math", "mm_frame_sample",
    "q10_returned_items", "q11_important_stock", "q14_promo_revenue",
    "q15_top_supplier", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q1_pricing_summary",
    "q20_excess_suppliers", "q22_dormant_customers",
    "q3_shipping_priority", "q9_product_type_profit",
    "rfm_segmentation", "ts_gapfill_locf", "ts_interpolate_linear",
    "ts_rolling_stats", "udaf_applyInPandas", "win_pct_change",
    "win_running_agg", "win_session", "win_sliding", "win_tumbling",
    # array-ELEMENT extremes (a NaN inside an otherwise-valid vector):
    "emb_centroid", "emb_norm_stats", "emb_quantize_int8",
    "sim_search_bcast_index",
]


@pytest.fixture(scope="module")
def extremes_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("extremes_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            0.04,
            SEED,
            "extremes",
        )
    return dst


@pytest.fixture(scope="module")
def extremes_duck(extremes_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{extremes_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", EXTREMES_REGRESSION_KEYS)
def test_extremes_fuzz_parity(spark, extremes_dir, extremes_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, extremes_dir).toPandas()
    odf = extremes_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"


# Distribution skew (VERDICT r4 item 8): a seeded 30% of every FK-ish
# join/group column rekeyed onto that column's MIN value — one monster
# key per column (hot order, hot user, hot part). Values are existing
# keys and both engines see the same bytes, so oracles must still
# hash-match; what's exercised is Spark's behavior under the 100x
# failure mode value-corruption fuzzing never touches: AQE skew-join
# splits, hot hash-agg groups, single-user sessionization, one CC
# mega-cluster. The full-registry sweep went 199/199 green on first
# run (the unique-key tiebreak discipline is what makes results
# distribution-independent); this pins the most skew-sensitive keys.
SKEW_REGRESSION_KEYS = [
    "agg_hash", "cohort_retention", "dedup_cc_survivors",
    "event_transitions", "funnel_conversion", "graph_pagerank",
    "join_asof", "join_inner_hash", "join_skew_salted",
    "q18_large_volume_customers", "q3_shipping_priority",
    "q5_local_supplier_volume", "q9_product_type_profit",
    "rfm_segmentation", "skew_key_profile", "stream_dedup_first_event",
    "topk_per_group", "win_running_agg", "win_session", "win_sliding",
]


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("skew_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            0.3,
            SEED,
            "skew",
        )
    return dst


@pytest.fixture(scope="module")
def skew_duck(skew_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{skew_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", SKEW_REGRESSION_KEYS)
def test_skew_fuzz_parity(spark, skew_dir, skew_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, skew_dir).toPandas()
    odf = skew_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"


# Stacked adversary (chaos mode): skew 30%, then extremes 3%, then
# nulls 3% — cross-class interactions no single class produces (a NULL
# on a hot key, a NaN inside a skewed group, a corrupt measure behind
# a poisoned threshold). Building the stack exposed that intermediate
# files must keep the table basename (else _TABLE_KEYS protection is
# lost and the extremes stage stomps primary keys — testing the
# mutation, not the engine), and two real engine gaps: q17's window
# davg lacked the poison contract its oracle has (a NaN quantity in a
# Brand#23 part group poisoned the oracle's threshold but not
# Spark's), and agg_collect_list serialized an all-NULL group to ''
# where string_agg is NULL. This pins the keys that diverged plus the
# most interaction-sensitive composites.
CHAOS_REGRESSION_KEYS = [
    "agg_collect_list", "cdc_snapshot_diff", "dedup_exact_survivors",
    "emb_dedup_cosine_lsh", "mm_frame_sample", "pipeline_curation",
    # seed 1: a nulled s_suppkey on a negative-balance supplier made
    # the oracle's NOT IN vacuously false (0 rows) — rewritten as the
    # NOT EXISTS the engine's anti join actually implements.
    "q16_supplier_part_cnt",
    "q17_small_quantity_revenue", "sim_eval_recall", "sim_search_lsh",
    "sim_search_topk",
]


@pytest.fixture(scope="module")
def chaos_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("chaos_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            0.3,
            SEED,
            "chaos",
        )
    return dst


@pytest.fixture(scope="module")
def chaos_duck(chaos_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{chaos_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", CHAOS_REGRESSION_KEYS)
def test_chaos_fuzz_parity(spark, chaos_dir, chaos_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, chaos_dir).toPandas()
    odf = chaos_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"


def test_chaos_stack_preserves_key_uniqueness(chaos_dir):
    """The stacked mutation must honor the engine's key-uniqueness
    input contract at every stage (duplicate PKs are ill-defined
    input, not a robustness target): no non-null primary key may
    repeat in the chaos mirror."""
    import collections

    import pyarrow.parquet as pq

    from fuzzcheck import _TABLE_KEYS

    def key_tuples(path, keys):
        t = pq.read_table(path)
        cols = [t.column(k).to_pylist() for k in keys]
        return [kt for kt in zip(*cols) if None not in kt]

    checked = 0
    for tbl, keys in _TABLE_KEYS.items():
        pristine = key_tuples(os.path.join(SF_SMALL, f"{tbl}.parquet"), keys)
        if len(set(pristine)) != len(pristine):
            # _TABLE_KEYS names the re-key column, which for lineitem
            # is not unique even in pristine data — nothing to preserve.
            continue
        mutated = key_tuples(os.path.join(chaos_dir, f"{tbl}.parquet"), keys)
        dup = [kt for kt, n in collections.Counter(mutated).items() if n > 1]
        assert not dup, f"{tbl} {keys} has duplicate PKs: {dup[:5]}"
        checked += 1
    assert checked >= 5, "uniqueness check lost its subject tables"


# Boundary adversary: snap values onto the engine's own decision
# boundaries (filter-cutoff dates, BETWEEN edges, quantity thresholds,
# 10m/30m/1h event-time grids). Random data lands on a boundary with
# probability ~zero, so >=/>, [start,end), and touching-window
# semantics are invisible to every other class — this one manufactures
# the ties. The win_session exact-gap coalescing bug (found by the
# hypothesis session model, fixed to <= in the oracle) is the class
# member this mode now permanently regression-covers, alongside the
# cutoff-comparison queries.
BOUNDARY_REGRESSION_KEYS = [
    "win_session", "win_sliding", "win_tumbling", "stream_join_attrib",
    "q1_pricing_summary", "q3_shipping_priority", "q6_forecast_revenue",
    "q14_promo_revenue", "q15_top_supplier", "ttl_freshness_filter",
    "split_temporal", "cohort_retention", "ts_resample_ohlc",
    "agg_rollup_time", "join_asof", "join_interval_overlap",
]


@pytest.fixture(scope="module")
def boundary_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("boundary_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            0.25,
            SEED,
            "boundary",
        )
    return dst


@pytest.fixture(scope="module")
def boundary_duck(boundary_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{boundary_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", BOUNDARY_REGRESSION_KEYS)
def test_boundary_fuzz_parity(spark, boundary_dir, boundary_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, boundary_dir).toPandas()
    odf = boundary_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"


def test_boundary_mode_manufactures_exact_session_gaps(boundary_dir):
    """The mode must actually produce the measure-zero tie it exists
    for: at least one same-user consecutive event pair at EXACTLY the
    10-minute session gap."""
    import collections

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(boundary_dir, "events.parquet"))
    per_user = collections.defaultdict(list)
    for u, ts in zip(t.column("user_id").to_pylist(), t.column("ts").to_pylist()):
        if u is not None and ts is not None:
            per_user[u].append(ts)
    exact = 0
    for ms in per_user.values():
        ms.sort()
        exact += sum(
            1 for a, b in zip(ms, ms[1:]) if (b - a).total_seconds() == 600
        )
    assert exact >= 1, "no exact 10-minute gap produced; boundary mode is toothless"


# Layout adversary (reorder mode): a seeded full permutation of every
# table's row order, written with small row groups — identical logical
# content, different scan partitioning, partial-agg order, and join
# build order. At 100 TB file listing and partition assignment are
# never stable run-to-run, so every result must be independent of
# physical layout; the keys pinned here are the ones whose shapes are
# most tempted by order-dependence (keepers, first/last semantics,
# collected lists, iterative propagation, OHLC open/close).
REORDER_REGRESSION_KEYS = [
    "agg_collect_list", "dedup_exact_survivors", "dedup_cc_survivors",
    "stream_dedup_first_event", "win_running_distinct",
    "scd2_dimension", "ts_resample_ohlc", "graph_pagerank",
    "q1_pricing_summary", "topk_per_group",
    "text_pack_sequences", "scan_hive_partitioned", "scan_schema_evolution",
]


@pytest.fixture(scope="module")
def reorder_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("reorder_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            1.0,
            SEED,
            "reorder",
        )
    return dst


@pytest.fixture(scope="module")
def reorder_duck(reorder_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{reorder_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", REORDER_REGRESSION_KEYS)
def test_reorder_fuzz_parity(spark, reorder_dir, reorder_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, reorder_dir).toPandas()
    odf = reorder_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"


# --- split (multi-file layout) class ----------------------------------
#
# Every table becomes a directory of part files with seeded uneven
# boundaries, mixed row-group sizes, and one EMPTY part file — the
# multi-file steady state of any lake table. Pinned keys: ordered/
# keeper semantics that must not depend on file boundaries, the
# layout-derived scans (whose content-addressed builders must hash a
# directory source), the prefix-sum packer, and representative scans/
# aggs/joins.
SPLIT_REGRESSION_KEYS = [
    "q1_pricing_summary", "topk_per_group", "agg_collect_list",
    "win_session", "join_asof", "dedup_exact_survivors",
    "stream_dedup_first_event", "ts_resample_ohlc",
    "text_pack_sequences", "scan_hive_partitioned",
    "scan_schema_evolution", "sample_mixture_epochs",
    "text_quality_quantile_gate", "pipeline_curation",
]


@pytest.fixture(scope="module")
def split_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("split_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            4,
            SEED,
            "split",
        )
    return dst


@pytest.fixture(scope="module")
def split_duck(split_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{split_dir}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


def test_split_mirror_is_fragmented(split_dir):
    """Sharpness: the mirror must actually be multi-file with an empty
    fragment somewhere (else the class degenerates to a plain copy)."""
    import pyarrow.parquet as pq

    n_files, n_empty = 0, 0
    for t in TESTDATA_TABLES:
        d = os.path.join(split_dir, f"{t}.parquet")
        assert os.path.isdir(d)
        parts = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(parts) >= 3  # >= n_parts(4)-1 slices + the empty one
        n_files += len(parts)
        n_empty += sum(
            1
            for f in parts
            if pq.ParquetFile(os.path.join(d, f)).metadata.num_rows == 0
        )
    assert n_empty >= len(TESTDATA_TABLES)  # one empty fragment per table


@pytest.mark.parametrize("key", SPLIT_REGRESSION_KEYS)
def test_split_fuzz_parity(spark, split_dir, split_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, split_dir).toPandas()
    odf = split_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"


# The 5 keys the new `ragged` mode (r12: float-array LENGTH mutations —
# truncations, the empty array, extensions) diverged or CRASHED on in
# its first run: the PQ family's fixed-subspace slices hit engine-
# divergent NULL-in-list argmin semantics, the broadcast MIPS index's
# np.stack raised on a ragged Arrow batch, and empty-array array_join
# emitted '' where the oracle said NULL. All fixed with explicit
# fixed-dimension gates (the codebook/index dimension contract) and
# the empty-vector NULL rule. The passing-but-dimension-sensitive
# kernels are pinned alongside so a refactor can't silently regress
# their ragged handling (null-padded zip_with, prefix-dim slices,
# len()-gated eligibility).
RAGGED_REGRESSION_KEYS = [
    "emb_pq_quantize", "emb_quantize_int8", "sim_search_bcast_index",
    "sim_search_ivfpq", "sim_search_pq",
    # passed the first run; pinned as dimension-sensitive
    "sim_search_topk", "sim_search_matryoshka", "emb_norm_stats",
    "sim_search_binary_rerank", "emb_centroid",
]


@pytest.fixture(scope="module")
def ragged_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("ragged_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            0.1,
            SEED,
            "ragged",
        )
    return dst


@pytest.fixture(scope="module")
def ragged_duck(ragged_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{ragged_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_ragged_mirror_is_ragged(ragged_dir):
    """Sharpness: the embeddings mirror must actually contain every
    length-mutation variant (empty, truncated incl. the 8-dim
    matryoshka prefix, extended) — else the class degenerates to a
    plain dupes run."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(ragged_dir, "embeddings.parquet"))
    lens = {
        len(v) if v is not None else None
        for v in t.column("embedding").to_pylist()
    }
    assert 0 in lens, "no empty arrays"
    assert 8 in lens, "no matryoshka-prefix truncation"
    assert 63 in lens, "no off-by-one truncation"
    assert 65 in lens, "no +1 extension"
    assert 80 in lens, "no +16 extension"
    assert 64 in lens, "original vectors vanished"


@pytest.mark.parametrize("key", RAGGED_REGRESSION_KEYS)
def test_ragged_fuzz_parity(spark, ragged_dir, ragged_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, ragged_dir).toPandas()
    odf = ragged_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"


# The 9 keys the new `holes` mode (r12: NULL ELEMENTS punched into
# float arrays — the missing-feature writer; lengths and values
# otherwise untouched) diverged on in its first run, plus the latent
# tenth (sim_search_bcast_index: Spark's EXISTS-over-holes returned
# NULL so ~exists dropped the rows, DuckDB's list_bool_or skipped the
# nulls and kept them — invisible at top-k only because hole-vectors'
# NULL scores rank last). Root causes, all fixed: the kmeans-ELIGIBLE
# contract needed an explicit `y IS NULL` leg (the eligible-set
# asymmetry diverged every trained chain at once), the PQ gates and
# int8 bad-vector contract extend to missing features, and
# emb_norm_stats stopped proxying `embedding IS NULL` with
# `l2 IS NULL` (a hole-vector has NULL l2 but is not a null vector)
# and now surfaces holes as n_hole_vectors.
HOLES_REGRESSION_KEYS = [
    "emb_kmeans_train", "emb_norm_stats", "emb_pq_quantize",
    "emb_quantize_int8", "emb_semdedup_trained", "sim_search_ivf_trained",
    "sim_search_ivfpq", "sim_search_ivfpq_trained", "sim_search_pq",
    "sim_search_bcast_index",
]


@pytest.fixture(scope="module")
def holes_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("holes_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            0.1,
            SEED,
            "holes",
        )
    return dst


@pytest.fixture(scope="module")
def holes_duck(holes_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{holes_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_holes_mirror_has_holes(holes_dir):
    """Sharpness: the embeddings mirror must contain vectors with
    interior NULL elements, a position-0 hole, and an all-null vector,
    all at the ORIGINAL length — else the class degenerates."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(holes_dir, "embeddings.parquet"))
    vecs = [v for v in t.column("embedding").to_pylist() if v is not None]
    holed = [v for v in vecs if any(x is None for x in v)]
    assert holed, "no hole vectors"
    assert all(len(v) == 64 for v in holed), "holes changed lengths"
    assert any(v[0] is None for v in holed), "no position-0 hole"
    assert any(all(x is None for x in v) for v in holed), "no all-null vector"
    assert any(sum(x is None for x in v) in (1, 2, 3) for v in holed)


@pytest.mark.parametrize("key", HOLES_REGRESSION_KEYS)
def test_holes_fuzz_parity(spark, holes_dir, holes_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, holes_dir).toPandas()
    odf = holes_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"


# --- signs (signed zeros + subnormals) class ---------------------------
# r13's thirteenth mutation class. First full-registry run: 239/0 —
# the only class to land clean on its first run, which is itself the
# evidence worth pinning: group-key -0.0 normalization, sign-LSH
# `d >= 0` on -0.0, dsum's floor over subnormals, and norm/moment
# folds all agree cross-engine TODAY. These pins keep a refactor from
# quietly breaking any of them (e.g. swapping a groupBy key to a raw
# double column without Spark's NormalizeFloatingNumbers, or an oracle
# rewrite that formats -0.0 as "-0").
SIGNS_REGRESSION_KEYS = [
    "agg_stats_moments", "emb_norm_stats", "profile_columns",
    "q1_pricing_summary", "sim_search_lsh", "sim_search_topk",
]


@pytest.fixture(scope="module")
def signs_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("signs_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            0.1,
            SEED,
            "signs",
        )
    return dst


@pytest.fixture(scope="module")
def signs_duck(signs_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{signs_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_signs_mirror_has_signed_zeros_and_subnormals(signs_dir):
    """Sharpness: the mirror must contain -0.0 in double columns, a
    -0.0/+0.0 PAIR inside one embedding vector, and subnormals in both
    widths — else the class degenerates to a plain copy."""
    import math

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(signs_dir, "lineitem.parquet"))
    prices = [v for v in t.column("l_extendedprice").to_pylist() if v is not None]
    assert any(v == 0.0 and math.copysign(1.0, v) < 0 for v in prices), "no -0.0"
    assert any(0.0 < abs(v) < 2.3e-308 for v in prices), "no f64 subnormal"

    e = pq.read_table(os.path.join(signs_dir, "embeddings.parquet"))
    vecs = [v for v in e.column("embedding").to_pylist() if v]
    paired = [
        v
        for v in vecs
        if any(x == 0.0 and math.copysign(1.0, x) < 0 for x in v if x is not None)
        and any(x == 0.0 and math.copysign(1.0, x) > 0 for x in v if x is not None)
    ]
    assert paired, "no vector carries a -0.0/+0.0 pair"
    assert any(
        any(x is not None and 0.0 < abs(x) < 1.2e-38 for x in v) for v in vecs
    ), "no f32 subnormal"


@pytest.mark.parametrize("key", SIGNS_REGRESSION_KEYS)
def test_signs_fuzz_parity(spark, signs_dir, signs_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, signs_dir).toArrow().to_pandas()
    odf = signs_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"


# --- clock (timestamp precision/range edges) class ---------------------
# r13's fourteenth mutation class: sub-second µs residues, the epoch
# and the µs before it, the datetime64[ns] range edges, 1582/1777/9999.
# First full run found TWO real divergences plus a harness crash:
# (1) agg_decay_weighted had no LOWER age clamp — a future order date
# made the weight shift count 8006: DuckDB errored, Spark's shiftleft
# silently wrapped the count mod 64 (a wrong answer with no signal);
# (2) join_asof_pandas died in the Python worker — the Arrow->pandas
# conversion hardcodes timestamp[us] -> datetime64[ns], so ONE ts past
# 2262-04-11 killed the whole task (timestamps now cross the UDF as
# exact int64 µs; merge_asof also replaced by searchsorted — its
# float64 coercion rounds µs beyond 2^53); (3) diffcheck's own fetch
# used toPandas with the same ns cast and crashed before comparing —
# it now fetches via toArrow.
CLOCK_REGRESSION_KEYS = [
    "agg_decay_weighted", "join_asof", "join_asof_forward",
    "join_asof_pandas", "ts_gapfill_locf", "watermark_late_data",
    "win_session", "win_tumbling",
]


@pytest.fixture(scope="module")
def clock_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("clock_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            0.1,
            SEED,
            "clock",
        )
    return dst


@pytest.fixture(scope="module")
def clock_duck(clock_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{clock_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_clock_mirror_has_range_and_precision_edges(clock_dir):
    """Sharpness: the events mirror must contain a year-9999 value, a
    pre-1970 fractional-second value, something past the datetime64[ns]
    range, and sub-second µs residues — else the class degenerates."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(clock_dir, "events.parquet"))
    ts = [v for v in t.column("ts").to_pylist() if v is not None]
    assert any(v.year == 9999 for v in ts), "no year-9999 value"
    assert any(v.year < 1970 and v.microsecond == 999999 for v in ts), (
        "no pre-epoch fractional second"
    )
    assert any(v.year in (2262,) for v in ts), "no ns-range-edge value"
    assert any(v.microsecond not in (0, 500000, 999999) for v in ts), (
        "no +1µs residue on an in-domain value"
    )

    o = pq.read_table(os.path.join(clock_dir, "orders.parquet"))
    od = [v for v in o.column("o_orderdate").to_pylist() if v is not None]
    assert any(v.year > 2262 for v in od), "no far-future order date"


@pytest.mark.parametrize("key", CLOCK_REGRESSION_KEYS)
def test_clock_fuzz_parity(spark, clock_dir, clock_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, clock_dir).toArrow().to_pandas()
    odf = clock_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"


# --- tempest (stacked clock+signs+nulls+reorder) class -----------------
# r13's fifteenth class: the precision/edge classes composed — clock
# 10%, then signs 3%, then nulls 3%, then a full row-order
# permutation. First full-registry run: 239/0 (each component was
# hardened in its own class first; the value here is the INTERACTIONS
# — a -0.0 beside a year-9999 ts on one row, a NULL overwriting a
# sign-mutated cell, µs-residue sort keys under a shuffled layout).
# Pins: the keys whose kernels sit at those intersections.
TEMPEST_REGRESSION_KEYS = [
    "agg_decay_weighted", "emb_norm_stats", "join_asof_pandas",
    "q1_pricing_summary", "win_session",
]


@pytest.fixture(scope="module")
def tempest_dir(spark, tmp_path_factory):
    from fuzzcheck import mutate_table

    dst = str(tmp_path_factory.mktemp("tempest_sf"))
    for t in TESTDATA_TABLES:
        mutate_table(
            os.path.join(SF_SMALL, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
            0.1,
            SEED,
            "tempest",
        )
    return dst


@pytest.fixture(scope="module")
def tempest_duck(tempest_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tempest_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_tempest_mirror_stacks_all_three_value_classes(tempest_dir):
    """Sharpness: one mirror must show clock range edges, signed
    zeros, AND injected NULLs (the nulls stage runs at 3% over every
    column) — else a stage silently dropped out of the stack."""
    import math

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(tempest_dir, "events.parquet"))
    ts = [v for v in t.column("ts").to_pylist() if v is not None]
    assert any(v.year >= 2262 for v in ts), "clock stage missing"
    assert t.column("value").null_count > 0, "nulls stage missing"
    vals = [v for v in t.column("value").to_pylist() if v is not None]
    assert any(v == 0.0 and math.copysign(1.0, v) < 0 for v in vals), (
        "signs stage missing"
    )


@pytest.mark.parametrize("key", TEMPEST_REGRESSION_KEYS)
def test_tempest_fuzz_parity(spark, tempest_dir, tempest_duck, key):
    import diffcheck as dc

    qs, oracles = registry.queries(), registry.oracles()
    assert key in qs and key in oracles, f"registry key vanished: {key}"
    sdf = qs[key](spark, tempest_dir).toArrow().to_pandas()
    odf = tempest_duck.execute(oracles[key]).df()
    problems = dc.compare(key, sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"
