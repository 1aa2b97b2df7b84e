"""Explicit schemas for every table the engine touches.

The reference binds all inputs to compile-time types (C# POCOs + EF
Core migrations; reference Models/ZipCodeRecord.cs:6-18,
Migrations/20230903162839_EtlBusDb.cs:15-54). Schema inference would be
a semantic regression — e.g. zip codes must stay strings to preserve
leading zeros — so every read in this engine passes an explicit
StructType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- Reference-derived schemas (SURVEY.md §1.3, FIXTURES.md §1-4) ---

# Raw zip CSV: 6 columns in the file; state_fips is dropped on
# projection (the reference's [Name] attribute binding has no mapping
# for it — reference Models/ZipCodeRecord.cs:8-17).
ZIP_CSV_SCHEMA = StructType(
    [
        StructField("state_fips", StringType()),
        StructField("state", StringType()),
        StructField("state_abbr", StringType()),
        StructField("zipcode", StringType()),  # keep leading zeros
        StructField("county", StringType()),
        StructField("city", StringType()),
    ]
)

# Canonical projected input record (reference ZipCodeRecord after
# header binding + renames).
ZIP_RECORD_COLUMNS = {
    # csv column -> canonical column
    "state": "State",
    "state_abbr": "StateCode",
    "zipcode": "ZipCode",
    "county": "County",
    "city": "City",
}

# Enriched, keyed target table (reference Models/EtlBusDb/ZipCodeDetails.cs:7-19).
ZIP_DETAILS_SCHEMA = StructType(
    [
        StructField("CompositeKey", StringType(), nullable=False),
        StructField("ZipCode", StringType(), nullable=False),
        StructField("State", StringType(), nullable=False),
        StructField("StateCode", StringType(), nullable=False),
        StructField("County", StringType(), nullable=False),
        StructField("City", StringType(), nullable=False),
        StructField("Latitude", DoubleType()),
        StructField("Longitude", DoubleType()),
        StructField("Elevation", DoubleType()),
        StructField("Timezone", StringType()),
        StructField("CreationDateUtc", TimestampType(), nullable=False),
        StructField("LastModifiedDateUtc", TimestampType(), nullable=False),
        StructField("ImportId", IntegerType()),
    ]
)

# Run-control table (reference Models/EtlBusImport.cs:5-15).
ETL_IMPORT_SCHEMA = StructType(
    [
        StructField("Id", IntegerType(), nullable=False),
        StructField("FileName", StringType(), nullable=False),
        StructField("FileChecksum", StringType(), nullable=False),
        StructField("IsActive", BooleanType(), nullable=False),
        StructField("Status", StringType(), nullable=False),
        StructField("ImportStartTimeUtc", TimestampType()),
        StructField("EndDateTimeUtc", TimestampType()),
    ]
)

# Processing status enum (reference Utilities/Constants.cs:10-16).
STATUS_NONE = "None"
STATUS_RUNNING = "Running"
STATUS_ERROR = "Error"
STATUS_COMPLETE = "Complete"
PROCESSING_STATUSES = (STATUS_NONE, STATUS_RUNNING, STATUS_ERROR, STATUS_COMPLETE)

# Queue trigger message body (reference Models/EtlServiceBusMessage.cs:3-9).
TRIGGER_MESSAGE_SCHEMA = StructType([StructField("ForceRun", BooleanType())])

# --- Synthetic testdata schemas (TESTDATA.md / FIXTURES.md §6) ---

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),  # JSON
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)
