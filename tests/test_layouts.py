"""Physical-layout scan surfaces: hive partitioning and schema
evolution (`net7_etl_bus_spark/sources/layouts.py`).

The load-bearing claims, each tested functionally (not only by plan
inspection):

- partition PRUNING: a filter on the partition column never OPENS the
  excluded partitions' files — proven by planting a corrupt parquet
  file in an out-of-range partition (the query succeeds iff the file
  is never read; a control full scan on the same directory fails);
- partition-column typing and NULL routing (Hive default partition);
- mergeSchema semantics: the unified schema is the union of every
  file's footer, with NULL for a file's missing column — and column
  pruning still reaches the scan through the merged schema;
- both registered keys match their DuckDB oracles at sf0.001
  (diffcheck runs them at sf0.01; the driver at its own SF).
"""

from __future__ import annotations

import os

import pytest

from net7_etl_bus_spark.plans import registry
from net7_etl_bus_spark.sources.layouts import (
    _HIVE_NULL,
    build_evolution_events,
    build_hive_orders,
    evolution_scan,
    hive_partitioned_scan,
)
from scripts.diffcheck import compare

from .conftest import SF_SMALL


def test_differential_at_sf_small(spark, duck):
    qs, oracles = registry.queries(), registry.oracles()
    for key in ("scan_hive_partitioned", "scan_schema_evolution"):
        sdf = qs[key](spark, SF_SMALL).toPandas()
        odf = duck.execute(oracles[key]).df()
        assert not compare(key, sdf, odf)


def test_hive_layout_shape_and_cache(spark):
    d1 = build_hive_orders(SF_SMALL)
    d2 = build_hive_orders(SF_SMALL)
    assert d1 == d2, "content-addressed cache must be idempotent"
    parts = sorted(p for p in os.listdir(d1) if p.startswith("o_year="))
    years = [p.split("=", 1)[1] for p in parts]
    assert len(years) >= 2 and all(y.isdigit() for y in years)
    # partition column is discovered, integer-typed, and row counts
    # round-trip exactly
    df = hive_partitioned_scan(spark, d1)
    assert "o_year" in df.columns
    assert dict(df.dtypes)["o_year"] == "int"
    from net7_etl_bus_spark.data import load_table

    assert df.count() == load_table(spark, SF_SMALL, "orders").count()


def test_hive_pruning_never_opens_excluded_partition(spark, tmp_path):
    """THE pruning proof: a corrupt file planted in o_year=1995 makes
    any scan that opens that partition fail; the 1996/1997-filtered
    query still succeeds because partition pruning drops the
    directory at listing time."""
    import shutil

    src = build_hive_orders(SF_SMALL)
    poisoned = str(tmp_path / "hive_poisoned")
    shutil.copytree(src, poisoned)
    victim = os.path.join(poisoned, "o_year=1995")
    assert os.path.isdir(victim), "fixture must contain 1995 orders"
    with open(os.path.join(victim, "part-corrupt.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    pruned = (
        hive_partitioned_scan(spark, poisoned)
        .where("o_year IN (1996, 1997)")
        .groupBy("o_orderstatus")
        .count()
    )
    assert pruned.count() > 0  # succeeds: 1995 never opened

    with pytest.raises(Exception):
        hive_partitioned_scan(spark, poisoned).where(
            "o_year = 1995"
        ).count()  # control: opening the partition surfaces the corruption


def test_hive_partition_filters_in_plan(spark):
    df = hive_partitioned_scan(spark, build_hive_orders(SF_SMALL)).where(
        "o_year IN (1996, 1997)"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_year" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]


def test_hive_null_dates_route_to_default_partition(tmp_path, spark):
    """A mirror with one NULL o_orderdate produces the Hive default
    partition, read back as a NULL partition value."""
    import pyarrow.parquet as pq

    src = os.path.join(SF_SMALL, "orders.parquet")
    tbl = pq.read_table(src)
    import pyarrow as pa

    cols = {c: tbl[c].to_pylist()[:10] for c in tbl.column_names}
    cols["o_orderdate"][0] = None
    mirror = str(tmp_path / "m")
    os.makedirs(mirror)
    pq.write_table(
        pa.table(cols, schema=tbl.schema), os.path.join(mirror, "orders.parquet")
    )
    d = build_hive_orders(mirror)
    assert os.path.isdir(os.path.join(d, f"o_year={_HIVE_NULL}"))
    df = hive_partitioned_scan(spark, d)
    assert df.where("o_year IS NULL").count() == 1
    assert df.count() == 10


def test_hive_empty_source_keeps_integer_partition_type(tmp_path, spark):
    import pyarrow.parquet as pq

    src = os.path.join(SF_SMALL, "orders.parquet")
    mirror = str(tmp_path / "m")
    os.makedirs(mirror)
    schema = pq.read_schema(src)
    pq.write_table(schema.empty_table(), os.path.join(mirror, "orders.parquet"))
    d = build_hive_orders(mirror)
    df = hive_partitioned_scan(spark, d)
    assert dict(df.dtypes)["o_year"] == "int"
    assert df.count() == 0
    # and the registered key stays both runnable and empty
    out = registry.queries()["scan_hive_partitioned"](spark, mirror)
    assert out.count() == 0


def test_evolution_merged_schema_and_null_column(spark):
    d = build_evolution_events(SF_SMALL)
    files = sorted(os.listdir(d))
    assert "part-new.parquet" in files and "part-old.parquet" in files
    df = evolution_scan(spark, d)
    assert "value" in df.columns  # union schema despite part-old lacking it
    # exactly the odd-id rows read value as NULL (even ids keep any
    # source NULLs they had, so assert set containment both ways)
    assert df.where("(event_id & 1) != 0 AND value IS NOT NULL").count() == 0
    n_even = df.where("(event_id & 1) = 0").count()
    assert n_even > 0 and df.count() > n_even


def test_evolution_column_pruning_through_merged_schema(spark):
    d = build_evolution_events(SF_SMALL)
    df = evolution_scan(spark, d).groupBy("event_type").count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = plan.split("ReadSchema", 1)[1]
    assert "event_type" in scan and "props" not in scan and "value" not in scan
