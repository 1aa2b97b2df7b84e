"""Batch sources: typed scans and file-identity checksums
(reference S2, S3, S7).

Every scan takes an explicit schema (SURVEY.md §1.3 — inference is a
semantic regression for string-typed codes). ``json_scan`` and
``csv_scan`` are thin, named wrappers so the registry and pipeline
share one entry point per format.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def csv_scan(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
) -> DataFrame:
    """S2: header CSV with typed binding (reference CsvDataHandler.cs:15-22)."""
    return spark.read.option("header", header).schema(schema).csv(path)


def json_scan(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines scan with explicit schema (the reference's
    IFileDataHandler anticipates XML/JSON handlers,
    Core/Interfaces/IFileDataHandler.cs:7-11)."""
    return spark.read.schema(schema).json(path)


def xml_scan(
    spark: SparkSession,
    path: str,
    schema: StructType,
    row_tag: str = "record",
) -> DataFrame:
    """XML scan with typed binding — the third IFileDataHandler slot
    the reference anticipates but never implements
    (Core/Interfaces/IFileDataHandler.cs:7-11 names CSV/XML/JSON;
    only CsvDataHandler.cs exists). Spark 4's built-in XML source
    (one task per file / per rowTag split) — the explicit schema is
    mandatory here for the same reason as CSV: inference types
    leading-zero zips as bigint and corrupts them."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(schema)
        .load(path)
    )


def orc_scan(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan (built-in columnar source: predicate pushdown, column
    pruning and vectorized reads, same as parquet). Schema optional —
    ORC carries types, unlike CSV/XML."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def avro_scan(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Avro scan. Spark's Avro support is the external spark-avro
    module (not bundled in this container's pyspark jars) — on a
    cluster, add ``org.apache.spark:spark-avro_2.13:<spark version>``
    and this constructs the standard reader; here the data-source
    lookup raises, which the surface test pins."""
    reader = spark.read.format("avro")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def parquet_scan(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def file_checksum(path: str) -> str:
    """S3 driver-side: SHA-256 lower-hex of the file bytes — the
    reference's file identity for the run gate
    (Utilities/FileSystem.cs:17-24). Fine for a single trigger file;
    for datasets use :func:`files_checksums`."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def files_checksums(spark: SparkSession, glob_path: str) -> DataFrame:
    """S3 distributed: per-file SHA-256 over a binaryFile scan —
    (path, length, checksum). At 100 TB the bytes hash where they
    live; only (path, hash) rows come back."""
    return (
        spark.read.format("binaryFile")
        .load(glob_path)
        .select(
            "path",
            "length",
            F.sha2(F.col("content"), 256).alias("checksum"),
        )
    )
