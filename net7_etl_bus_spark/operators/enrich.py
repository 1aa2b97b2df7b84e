"""Per-row enrichment framework (reference T1-T4: the transform stage).

The reference enriches each row with three dependent HTTP calls inside
a bounded-parallelism TPL Dataflow TransformBlock
(DataflowProcessor.cs:158-285, MaxDOP default 5): geocode(zip) ->
(lat, lng), then — only if geocode succeeded — elevation(lat, lng) and
timezone(lat, lng), each failure tolerated independently
(DataflowProcessor.cs:188-214). A failed row passes through with null
enrichment columns; one bad row never fails the job.

Spark-first redesign:

* The whole 3-call dependency chain runs inside ONE ``mapInPandas``
  invocation per row — no shuffle between calls (SURVEY.md §7.4.5).
* Concurrency is an explicit per-task knob (thread pool of size N),
  so cluster-wide external-API pressure = num_tasks x N and can be
  budgeted: at 1000 executors set maxFilesPerTrigger /
  maxOffsetsPerTrigger and N so tasks x N <= the API rate budget.
* Arrow batches in/out — Python cost is per-batch, not per-row.
* The client is injected (callable factory) — production wires an
  HTTP client; tests and the golden pipeline use the deterministic
  mock below, mirroring the reference's own mocked-API test strategy
  (Net7EtlBus.Tests/DataflowProcessorTests.cs:53-98).
"""

from __future__ import annotations

import concurrent.futures
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

# Columns appended by the enrichment stage.
ENRICHMENT_COLUMNS = ("Latitude", "Longitude", "Elevation", "Timezone")


@dataclass
class EnrichmentResult:
    latitude: float | None = None
    longitude: float | None = None
    elevation: float | None = None
    timezone: str | None = None


class DeterministicMockClient:
    """Pure-function enrichment: value = f(zipcode). Golden rows match
    the reference's own test fixtures (DataflowProcessorTests.cs:57-95
    mock 31.2562/-85.6229/101.1/'Central Daylight Time' for 35004;
    GoogleApiServiceTests.cs:11-12 lat/lng for 75074).

    ``fail_geocode`` / ``fail_elevation`` / ``fail_timezone`` inject
    per-zip failures to exercise the independence semantics.
    """

    GOLDEN = {
        "35004": (31.2562, -85.6229, 101.1, "Central Daylight Time"),
        "75074": (33.0118, -96.6946, None, None),  # elevation/tz fall through to f(zip)
    }

    def __init__(
        self,
        fail_geocode: set[str] | None = None,
        fail_elevation: set[str] | None = None,
        fail_timezone: set[str] | None = None,
    ) -> None:
        self.fail_geocode = fail_geocode or set()
        self.fail_elevation = fail_elevation or set()
        self.fail_timezone = fail_timezone or set()

    @staticmethod
    def _f(zipcode: str):
        h = int(zipcode) if zipcode.isdigit() else sum(ord(c) for c in zipcode)
        lat = round(24.0 + (h % 2500) / 100.0, 4)
        lng = round(-125.0 + (h % 5800) / 100.0, 4)
        elevation = round((h % 4400) / 10.0, 1)
        tz = [
            "Eastern Standard Time",
            "Central Daylight Time",
            "Mountain Standard Time",
            "Pacific Standard Time",
        ][h % 4]
        return lat, lng, elevation, tz

    def geocode(self, zipcode: str) -> tuple[float, float]:
        if zipcode in self.fail_geocode:
            raise RuntimeError(f"geocode failed for {zipcode}")
        g = self.GOLDEN.get(zipcode)
        if g:
            return g[0], g[1]
        f = self._f(zipcode)
        return f[0], f[1]

    def elevation(self, zipcode: str, lat: float, lng: float) -> float:
        if zipcode in self.fail_elevation:
            raise RuntimeError(f"elevation failed for {zipcode}")
        g = self.GOLDEN.get(zipcode)
        if g and g[2] is not None:
            return g[2]
        return self._f(zipcode)[2]

    def timezone(self, zipcode: str, lat: float, lng: float) -> str:
        if zipcode in self.fail_timezone:
            raise RuntimeError(f"timezone failed for {zipcode}")
        g = self.GOLDEN.get(zipcode)
        if g and g[3] is not None:
            return g[3]
        return self._f(zipcode)[3]


def enrich_record(client, zipcode: str) -> EnrichmentResult:
    """The reference's per-row chain: geocode gates elevation+timezone;
    elevation and timezone failures are independent of each other
    (DataflowProcessor.cs:188-214)."""
    out = EnrichmentResult()
    try:
        out.latitude, out.longitude = client.geocode(zipcode)
    except Exception:
        return out  # geocode failed -> all enrichment columns stay null
    try:
        out.elevation = client.elevation(zipcode, out.latitude, out.longitude)
    except Exception:
        pass
    try:
        out.timezone = client.timezone(zipcode, out.latitude, out.longitude)
    except Exception:
        pass
    return out


def enrich_dataframe(
    df: DataFrame,
    client_factory: Callable[[], object] = DeterministicMockClient,
    zip_column: str = "ZipCode",
    max_concurrency: int = 5,
) -> DataFrame:
    """Append Latitude/Longitude/Elevation/Timezone via bounded-parallel
    per-row enrichment (mapInPandas + per-task thread pool).

    The pool size is the reference's TransformMaxDegreeOfParallelism
    (Constants.cs:21 default 5) — but per task: total external-call
    parallelism is numActiveTasks x max_concurrency, which is the knob
    a 1000-executor deployment budgets against the API quota.
    """
    # copy the field list — StructType(...) keeps the list reference,
    # and .add() would otherwise mutate df.schema in place
    out_schema = (
        StructType(list(df.schema.fields))
        .add("Latitude", "double")
        .add("Longitude", "double")
        .add("Elevation", "double")
        .add("Timezone", "string")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()  # one client per task (per connection pool)
        with concurrent.futures.ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            for pdf in batches:
                results = list(pool.map(lambda z: enrich_record(client, z), pdf[zip_column]))
                pdf = pdf.copy()
                pdf["Latitude"] = [r.latitude for r in results]
                pdf["Longitude"] = [r.longitude for r in results]
                pdf["Elevation"] = [r.elevation for r in results]
                pdf["Timezone"] = [r.timezone for r in results]
                yield pdf

    return df.mapInPandas(run, out_schema)
