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


def test_streaming_scd2_dimension_via_queuefile(spark, tmp_path):
    """The pieces compose into a live streaming type-2 dimension: the
    queuefile plugin streams dropped event files, foreachBatch parses
    each micro-batch and applies scd2_apply_increment against the
    parquet dimension, and after two runs (second consuming only a
    late-dropped file) the dimension equals the one-shot build over
    all events — including a same-state change collapsed across the
    batch boundary and a version continued across it."""
    import os

    from pyspark.sql import functions as SF

    from net7_etl_bus_spark.sources.plugin import register_queuefile

    register_queuefile(spark)
    qdir = tmp_path / "queue"
    qdir.mkdir()
    dim_path = str(tmp_path / "dim")
    # user 1: a -> a (collapse across boundary) -> b (new version)
    # user 2: x -> y within batch 1, then z in batch 3
    (qdir / "0001.txt").write_text("1,1000,1,a\n2,2000,2,x\n3,3000,2,y\n")
    (qdir / "0002.txt").write_text("4,4000,1,a\n")
    (qdir / "0003.txt").write_text("5,5000,1,b\n6,6000,2,z\n")

    def parse(batch):
        c = SF.split("value", ",")
        return batch.select(
            c.getItem(0).cast("long").alias("event_id"),
            SF.timestamp_micros(c.getItem(1).cast("long")).alias("ts"),
            c.getItem(2).cast("long").alias("user_id"),
            c.getItem(3).alias("event_type"),
        )

    def apply_batch(batch, _bid):
        existing = (
            spark.read.parquet(dim_path) if os.path.exists(dim_path) else None
        )
        scd2_apply_increment(existing, parse(batch)).write.mode(
            "overwrite"
        ).parquet(dim_path + ".tmp")
        # tiny-dimension overwrite; partition-pruned MERGE is the scale path
        updated = spark.read.parquet(dim_path + ".tmp")
        updated.write.mode("overwrite").parquet(dim_path)

    def run_once():
        q = (
            spark.readStream.format("queuefile")
            .option("path", str(qdir))
            .load()
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1 sees files 1-2; file 3 lands late; run 2 consumes only it
    (qdir / "0003.txt").rename(tmp_path / "hold")
    run_once()
    (tmp_path / "hold").rename(qdir / "0003.txt")
    run_once()

    got = sorted(
        (r["user_id"], r["version"], r["state"], r["is_current"])
        for r in spark.read.parquet(dim_path).collect()
    )
    assert got == [
        (1, 1, "a", False),  # collapsed across files 1-2, closed by b
        (1, 2, "b", True),
        (2, 1, "x", False),
        (2, 2, "y", False),
        (2, 3, "z", True),
    ], got
