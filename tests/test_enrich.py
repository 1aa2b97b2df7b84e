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


# --- global API rate budget (T4 deployment contract) -------------------


def test_token_bucket_paces_on_fake_clock():
    """Strict pacing, deterministically: with capacity 1 and rate 10/s,
    each acquire after the first must wait exactly 0.1 fake seconds."""
    from net7_etl_bus_spark.operators.enrich import TokenBucket

    t = [0.0]
    sleeps = []

    def clock():
        return t[0]

    def sleeper(dt):
        sleeps.append(round(dt, 9))
        t[0] += dt

    b = TokenBucket(rate=10.0, capacity=1.0, clock=clock, sleeper=sleeper)
    for _ in range(5):
        b.acquire()
    # first call burst-free, then 4 sleeps of exactly 1/rate
    assert sleeps == [0.1, 0.1, 0.1, 0.1]
    assert b.acquired == 5


def test_token_bucket_rejects_over_capacity_and_counts_tokens():
    """acquire(n) with n > capacity can never be satisfied (refill
    clamps at capacity) — it must raise, not hang; and the
    observability counter counts TOKENS, not calls."""
    import pytest

    from net7_etl_bus_spark.operators.enrich import TokenBucket

    t = [0.0]
    b = TokenBucket(
        rate=10.0, capacity=4.0, clock=lambda: t[0],
        sleeper=lambda dt: t.__setitem__(0, t[0] + dt),
    )
    with pytest.raises(ValueError, match="capacity"):
        b.acquire(5.0)
    b.acquire(3.0)
    b.acquire(1.0)
    assert b.acquired == 4.0


def test_aggregate_rate_under_concurrent_tasks_stays_within_budget():
    """The SURVEY §7.4.5 hard part: 4 concurrent 'tasks' (threads),
    each with its per_task_rate share of a global budget, hammering
    as fast as they can on wide pools — the measured SUSTAINED
    aggregate call rate (burst tokens excluded) must stay <= budget."""
    import concurrent.futures
    import time

    from net7_etl_bus_spark.operators.enrich import (
        DeterministicMockClient,
        RateLimitedClient,
        TokenBucket,
        per_task_rate,
    )

    budget = 200.0  # global calls/sec
    n_tasks = 4
    calls_per_task = 40
    share = per_task_rate(budget, n_tasks)
    assert share == 50.0

    stamps: list[float] = []
    lock = threading.Lock()

    class Recording(DeterministicMockClient):
        def geocode(self, z):
            with lock:
                stamps.append(time.monotonic())
            return super().geocode(z)

    def task():
        # each task builds its own bucket — exactly how enrich_dataframe
        # wires rate_limiter_factory per mapInPandas task
        client = RateLimitedClient(Recording(), TokenBucket(rate=share, capacity=1.0))
        # wide pool INSIDE the task: the bucket, not the pool, is the cap
        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(lambda i: client.geocode(str(10000 + i)), range(calls_per_task)))

    threads = [threading.Thread(target=task) for _ in range(n_tasks)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    total = len(stamps)
    assert total == n_tasks * calls_per_task
    span = max(stamps) - min(stamps)
    # one burst token per task is rate-free; everything else is paced
    sustained = (total - n_tasks) / span
    assert sustained <= budget * 1.05, (sustained, span)
    # and the limiter is not pathologically slow either (>= half budget)
    assert sustained >= budget * 0.5, (sustained, span)


def test_enrich_dataframe_with_rate_limiter_same_results(spark):
    """Wiring check: rate_limiter_factory changes timing only — the
    enriched values are identical to the unlimited run, and the chain
    costs 3 tokens per fully-enriched row."""
    from net7_etl_bus_spark.operators.enrich import TokenBucket

    zips = ["35004", "75074", "10001", "60601"]
    base = enrich_dataframe(_zip_df(spark, zips)).orderBy("ZipCode").collect()
    limited = (
        enrich_dataframe(
            _zip_df(spark, zips).coalesce(1),
            rate_limiter_factory=lambda: TokenBucket(rate=1e9),
        )
        .orderBy("ZipCode")
        .collect()
    )
    assert [r.asDict() for r in base] == [r.asDict() for r in limited]
