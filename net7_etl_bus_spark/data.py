"""Testdata and fixture loading helpers.

All loads are lazy DataFrame definitions — Catalyst sees the parquet
footer schema, so column pruning and predicate pushdown reach the scan
for free. No caching here: each registered query builds its own plan
and the optimizer prunes what it doesn't need.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES

# Repo-absolute fixture dir (committed, deterministic; generated once
# by scripts/gen_fixtures.py). Oracles reference the same paths via
# DuckDB read_csv/read_parquet so Spark and the oracle see identical
# bytes.
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES_DIR = os.path.join(REPO_ROOT, "fixtures")
ZIP_CSV_PATH = os.path.join(FIXTURES_DIR, "zip_codes.csv")
ZIP_DETAILS_PATH = os.path.join(FIXTURES_DIR, "zip_code_details.parquet")
ETL_IMPORTS_PATH = os.path.join(FIXTURES_DIR, "etl_bus_imports.parquet")
API_RESPONSES_PATH = os.path.join(FIXTURES_DIR, "api_responses.jsonl")
ZIP_XML_PATH = os.path.join(FIXTURES_DIR, "zip_codes.xml")
ZIP_FIXED_PATH = os.path.join(FIXTURES_DIR, "zip_codes_fixed.txt")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Re-assert runtime-settable parity confs (ANSI off, UTC, nanos
    # legacy read) — a vanilla session (e.g. the driver harness's)
    # throws PARQUET_TYPE_ILLEGAL on events.ts and ANSI errors on edge
    # rows otherwise. Idempotent, driver-local, cheap.
    from .session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts is TIMESTAMP(NANOS) in the file; with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as a nanos
        # long. Truncate to micros with integer division (exactly what
        # DuckDB does) and rebuild the timestamp.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
