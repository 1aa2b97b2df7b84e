"""Custom format plugin: a fixed-width file DataSource.

The reference's extension point for new file formats is the
`IFileDataHandler` interface (`Core/Interfaces/IFileDataHandler.cs:
7-11` — CSV implemented, XML/JSON anticipated, anything else a new
handler class). Spark 4's Python DataSource API is the engine-native
counterpart: subclass `DataSource`, register once per session, and
`spark.read.format("fixedwidth")` works everywhere a built-in format
does — schema projection, downstream Catalyst optimization, the lot.

Fixed-width (mainframe/COBOL copybook layout) is the canonical format
Spark does NOT ship a reader for, which is what makes it the honest
demo of the plugin slot. The reader is line-oriented Python (the
DataSource API's batch/Arrow variant is the upgrade path for wide
deployment); parsing cost is per-byte linear and partition-parallel
via one partition per file.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# (column, width) layout of fixtures/zip_codes_fixed.txt — mirrors
# scripts/gen_fixtures.py FIXED_WIDTHS.
ZIP_FIXED_LAYOUT = (
    ("state_fips", 2),
    ("state", 12),
    ("state_abbr", 2),
    ("zipcode", 5),
    ("county", 12),
    ("city", 12),
)


class FixedWidthDataSource(DataSource):
    """`spark.read.format("fixedwidth").option("widths", "2,12,...")`.

    Options:
      * ``path``   — file to read (one partition per path)
      * ``widths`` — comma-separated field widths, left-justified,
                     space-padded; field names come from the
                     user-supplied schema (required)
    """

    @classmethod
    def name(cls) -> str:
        return "fixedwidth"

    def reader(self, schema) -> "FixedWidthReader":
        return FixedWidthReader(self.options, schema)


class FixedWidthReader(DataSourceReader):
    def __init__(self, options, schema) -> None:
        self.paths = [options["path"]]
        self.widths = [int(w) for w in options["widths"].split(",")]
        if len(schema.fields) != len(self.widths):
            raise ValueError(
                f"schema has {len(schema.fields)} fields but widths has "
                f"{len(self.widths)} entries"
            )

    def partitions(self):
        return [InputPartition(p) for p in self.paths]

    def read(self, partition):
        starts = [0]
        for w in self.widths:
            starts.append(starts[-1] + w)
        with open(partition.value, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                yield tuple(
                    line[starts[i] : starts[i + 1]].rstrip(" ")
                    for i in range(len(self.widths))
                )


def register_fixedwidth(spark) -> None:
    """Idempotent per-session registration of the plugin format."""
    spark.dataSource.register(FixedWidthDataSource)
