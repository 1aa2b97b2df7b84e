"""Incremental SCD2 maintenance: sequential micro-batch application
must equal the one-shot batch rebuild (the invariant that makes the
foreachBatch streaming dimension trustworthy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from net7_etl_bus_spark.data import load_table
from net7_etl_bus_spark.operators.cdc import scd2_apply_increment, scd2_dimension

from .conftest import SF_SMALL


def _canon(df):
    return sorted(
        tuple(r)
        for r in df.select(
            "user_id", "state", "valid_from", "valid_to", "version", "is_current"
        ).collect()
    )


def test_incremental_scd2_equals_batch_rebuild(spark):
    e = load_table(spark, SF_SMALL, "events")
    cuts = ("2024-01-08 00:00:00", "2024-01-17 00:00:00")
    b1 = e.filter(F.col("ts") < F.lit(cuts[0]).cast("timestamp"))
    b2 = e.filter(
        (F.col("ts") >= F.lit(cuts[0]).cast("timestamp"))
        & (F.col("ts") < F.lit(cuts[1]).cast("timestamp"))
    )
    b3 = e.filter(F.col("ts") >= F.lit(cuts[1]).cast("timestamp"))

    dim = scd2_apply_increment(None, b1)
    # materialize between batches as a real pipeline's sink would
    dim = spark.createDataFrame(dim.collect(), dim.schema)
    dim = scd2_apply_increment(dim, b2)
    dim = spark.createDataFrame(dim.collect(), dim.schema)
    dim = scd2_apply_increment(dim, b3)

    assert _canon(dim) == _canon(scd2_dimension(spark, SF_SMALL))


def test_incremental_scd2_empty_batch_is_identity(spark):
    e = load_table(spark, SF_SMALL, "events")
    dim = scd2_apply_increment(None, e)
    dim = spark.createDataFrame(dim.collect(), dim.schema)
    again = scd2_apply_increment(dim, e.limit(0))
    assert _canon(again) == _canon(dim)
