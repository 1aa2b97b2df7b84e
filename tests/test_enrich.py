"""Enrichment framework unit tests (reference T1-T4 semantics)."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from net7_etl_bus_spark.operators.enrich import (
    DeterministicMockClient,
    enrich_dataframe,
    enrich_record,
)


def _zip_df(spark, zips):
    return spark.createDataFrame([(z,) for z in zips], "ZipCode string")


def test_golden_values(spark):
    out = enrich_dataframe(_zip_df(spark, ["35004"])).collect()[0]
    assert (out["Latitude"], out["Longitude"]) == (31.2562, -85.6229)
    assert out["Elevation"] == 101.1
    assert out["Timezone"] == "Central Daylight Time"


def test_reference_live_test_zip(spark):
    # GoogleApiServiceTests.cs:11-12 golden lat/lng for 75074.
    out = enrich_dataframe(_zip_df(spark, ["75074"])).collect()[0]
    assert (out["Latitude"], out["Longitude"]) == (33.0118, -96.6946)


def test_failure_independence():
    c = DeterministicMockClient(fail_elevation={"11111"})
    r, err = enrich_record(c, "11111")
    assert r.latitude is not None and r.timezone is not None
    assert r.elevation is None
    assert err and err.startswith("elevation:")
    c2 = DeterministicMockClient(fail_timezone={"11111"})
    r2, err2 = enrich_record(c2, "11111")
    assert r2.elevation is not None and r2.timezone is None
    assert err2 and err2.startswith("timezone:")


def test_geocode_failure_gates_dependent_calls():
    calls = []

    class Spy(DeterministicMockClient):
        def geocode(self, z):
            raise RuntimeError("down")

        def elevation(self, *a):
            calls.append("elevation")
            return 0.0

        def timezone(self, *a):
            calls.append("timezone")
            return "x"

    r, err = enrich_record(Spy(), "99999")
    assert r.latitude is None and calls == []  # T2/T3 never attempted
    assert err and err.startswith("geocode:")


def test_per_row_errors_never_fail_job(spark):
    failing = lambda: DeterministicMockClient(fail_geocode={"22222"})  # noqa: E731
    rows = enrich_dataframe(_zip_df(spark, ["22222", "33333"]), failing).collect()
    by_zip = {r["ZipCode"]: r for r in rows}
    assert by_zip["22222"]["Latitude"] is None
    assert by_zip["33333"]["Latitude"] is not None


def test_bounded_concurrency(spark):
    """Observed in-flight parallelism never exceeds max_concurrency
    (the reference's MaxDegreeOfParallelism semantics). The spy client
    runs inside the executor's Python worker, so violations are
    reported in-band: a geocode observed above the limit raises, which
    would surface as a null Latitude."""

    def factory():
        lock = threading.Lock()
        state = {"now": 0}

        class Slow(DeterministicMockClient):
            def geocode(self, z):
                import time

                with lock:
                    state["now"] += 1
                    if state["now"] > 3:
                        raise RuntimeError("concurrency cap exceeded")
                time.sleep(0.02)
                with lock:
                    state["now"] -= 1
                return super().geocode(z)

        return Slow()

    df = _zip_df(spark, [f"{10000 + i}" for i in range(40)]).coalesce(1)
    rows = enrich_dataframe(df, factory, max_concurrency=3).collect()
    assert len(rows) == 40
    assert all(r["Latitude"] is not None for r in rows)  # no cap violations


def test_null_columns_added_with_right_types(spark):
    out = enrich_dataframe(_zip_df(spark, ["35004"]))
    dt = dict(out.dtypes)
    assert dt["Latitude"] == "double"
    assert dt["Elevation"] == "double"
    assert dt["Timezone"] == "string"


def test_retries_recover_transient_failures():
    """A client failing twice then succeeding must enrich fully with
    attempts=3 and fail with attempts=1; no real sleeping (injected
    sleeper records the backoff schedule)."""
    from net7_etl_bus_spark.operators.enrich import retrying

    class Flaky:
        def __init__(self):
            self.n = 0

        def __call__(self):
            self.n += 1
            if self.n < 3:
                raise RuntimeError("transient")
            return "ok"

    delays = []
    assert retrying(Flaky(), attempts=3, sleeper=delays.append) == "ok"
    assert len(delays) == 2 and delays[1] > delays[0] >= 0.1  # backoff grows

    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        retrying(Flaky(), attempts=1, sleeper=delays.append)


def test_quarantine_split(spark):
    """with_error_column + split_quarantine: failed rows carry the
    stage-tagged reason; clean rows drop the column; counts add up."""
    from net7_etl_bus_spark.operators.enrich import split_quarantine

    failing = lambda: DeterministicMockClient(fail_geocode={"22222"})  # noqa: E731
    enriched = enrich_dataframe(
        _zip_df(spark, ["22222", "33333", "44444"]), failing, with_error_column=True
    )
    clean, quarantined = split_quarantine(enriched)
    assert clean.count() == 2 and quarantined.count() == 1
    assert "EnrichmentError" not in clean.columns
    bad = quarantined.collect()[0]
    assert bad["ZipCode"] == "22222" and bad["EnrichmentError"].startswith("geocode:")
