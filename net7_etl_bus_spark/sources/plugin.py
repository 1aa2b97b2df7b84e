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


# --- streaming plugin: replayable file-queue stream source -------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class QueueFileStreamSource(DataSource):
    """`spark.readStream.format("queuefile").option("path", dir)` — a
    pure-Python STREAMING source over a drop directory, the third
    transport for the reference's S1 queue trigger (file-queue batch
    wiring and the flagged Kafka path are in streaming/trigger.py).

    Offsets are the count of fully-consumed files in lexical order, so
    progress is checkpointable and `readBetweenOffsets` replays any
    committed range byte-identically — the property exactly-once
    sinks need after a crash. New files must sort after consumed ones
    (drop with monotonic names, e.g. epoch-prefixed), the same
    contract a real queue's append order gives.
    """

    @classmethod
    def name(cls) -> str:
        return "queuefile"

    def schema(self) -> str:
        return "value string, src_file string"

    def simpleStreamReader(self, schema) -> "QueueFileStreamReader":
        return QueueFileStreamReader(self.options)


class QueueFileStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.dir = options["path"]

    def _files(self):
        import os

        return sorted(
            f for f in os.listdir(self.dir) if f.endswith(".txt")
        )

    def initialOffset(self) -> dict:
        return {"n_files": 0}

    def _rows(self, files):
        import os

        # materialized (not a generator): the simple-reader API pickles
        # prefetched rows into the offset cache for replay
        out = []
        for name in files:
            with open(os.path.join(self.dir, name), encoding="utf-8") as f:
                out.extend((line.rstrip("\n"), name) for line in f)
        return out

    def read(self, start: dict):
        files = self._files()
        new = files[start["n_files"] :]
        return self._rows(new), {"n_files": len(files)}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = self._files()[start["n_files"] : end["n_files"]]
        return self._rows(files)


def register_queuefile(spark) -> None:
    """Idempotent per-session registration of the streaming plugin."""
    spark.dataSource.register(QueueFileStreamSource)
