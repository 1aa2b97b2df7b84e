"""Source/format coverage: ORC round-trip, distributed checksum parity,
typed CSV binding."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from net7_etl_bus_spark.data import ZIP_CSV_PATH, load_table
from net7_etl_bus_spark.sources.batch import file_checksum, files_checksums

from .conftest import SF_SMALL


def test_orc_roundtrip_preserves_data(spark, tmp_path):
    """ORC is the other columnar format Spark ships natively; a
    write/read round-trip must preserve rows, schema, and values
    (timestamp columns included)."""
    orders = load_table(spark, SF_SMALL, "orders")
    path = str(tmp_path / "orders.orc")
    orders.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    assert back.exceptAll(orders).count() == 0


def test_orc_pushdown_reaches_scan(spark, tmp_path):
    """Predicate pushdown works on the ORC reader too."""
    orders = load_table(spark, SF_SMALL, "orders")
    path = str(tmp_path / "orders.orc")
    orders.write.orc(path)
    df = spark.read.orc(path).filter(F.col("o_totalprice") > 400000).select("o_orderkey")
    plan = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "PushedFilters" in plan and "o_totalprice" in plan


def test_distributed_checksum_matches_driver_side(spark):
    """files_checksums (binaryFile + sha2 executor-side) must agree
    with the driver-side hashlib gate on the same file."""
    row = files_checksums(spark, ZIP_CSV_PATH).collect()[0]
    assert row["checksum"].lower() == file_checksum(ZIP_CSV_PATH)
    with open(ZIP_CSV_PATH, "rb") as f:
        assert row["checksum"].lower() == hashlib.sha256(f.read()).hexdigest()
    assert row["length"] > 0


def test_csv_typed_binding_keeps_leading_zeros(spark):
    """Schema-bound CSV scan must keep zip '00501' a string — inference
    would turn it into 501 (the semantic regression SURVEY §1.3 bans)."""
    from net7_etl_bus_spark.plans.reference_ops import read_zip_csv

    z = read_zip_csv(spark)
    assert dict(z.dtypes)["ZipCode"] == "string"
    assert z.filter(F.col("ZipCode") == "00501").count() == 1


def test_avro_scan_surface(spark, tmp_path):
    """avro_scan constructs the standard spark-avro reader; this
    container ships no spark-avro module jar, so the data-source
    lookup itself must raise naming avro — proof the wiring exists
    (on a cluster with the module, the same call reads)."""
    import pytest as _pytest

    from net7_etl_bus_spark.sources.batch import avro_scan

    with _pytest.raises(Exception) as ei:
        avro_scan(spark, str(tmp_path / "x.avro")).collect()
    assert "avro" in str(ei.value).lower()


def test_orc_fixture_matches_csv_twin(spark):
    """The committed ORC fixture holds exactly the CSV fixture's rows
    (the orc_scan oracle depends on this equivalence)."""
    from net7_etl_bus_spark.data import FIXTURES_DIR, ZIP_CSV_PATH
    from net7_etl_bus_spark.schemas import ZIP_CSV_SCHEMA
    from net7_etl_bus_spark.sources.batch import orc_scan

    csv = spark.read.option("header", True).schema(ZIP_CSV_SCHEMA).csv(ZIP_CSV_PATH)
    orc = orc_scan(spark, f"{FIXTURES_DIR}/zip_codes.orc")
    assert orc.count() == csv.count()
    assert orc.exceptAll(csv).count() == 0
    assert csv.exceptAll(orc).count() == 0
