"""Physical-layout scan surfaces: hive-partitioned directories and
mixed-schema (schema-evolution) directories.

At 100 TB neither layout is an edge case — it is the steady state.
Data lands date-partitioned (`o_year=1996/part-*.parquet`), and files
written months apart carry different schemas (a column added mid-year
exists only in newer files). The engine must (a) discover typed
partition columns from directory names, (b) PRUNE partitions a filter
excludes — at 1000 partitions a pruned scan reads 0.1% of the listing
a full scan would — and (c) merge evolving file schemas, reading the
missing column as NULL for old files, without a full-corpus rewrite.

Both surfaces are registered as oracle-checked keys: the layouts are
derived deterministically (pyarrow, content-addressed cache) from the
flat testdata tables, so the oracle can express the identical
semantics over the flat table — partition-column derivation as
`year(o_orderdate)`, schema evolution as `CASE WHEN (event_id & 1)=0
THEN value END` (exactly the rows the builder routed to the
value-bearing files).

Pruning is attested functionally, not just by plan inspection: the
test suite plants a deliberately CORRUPT parquet file in a partition
OUTSIDE the filter range — the query succeeds iff the partition was
never opened (`tests/test_layouts.py`).

Reference parity: the reference's file handling is single-directory
CSV polling (Net7EtlBus.Service/Workers/EtlBusWorker.cs); partitioned
and schema-evolving layouts are part of the §2.3 engine surface the
reference lacks.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import table_path
from ..plans.registry import dsum, register, sql_dsum

_MARKER = "_NESB_LAYOUT_OK"

# Hive's literal spelling for a NULL partition value; Spark's
# partition discovery reads it back as NULL.
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _content_sig(path: str) -> str:
    """Content address of the source — a fuzz-mutated mirror or a
    regenerated SF gets a fresh layout, a re-run reuses the cache.
    A table may be a single parquet file or a Spark-written directory
    of part files; hash the data files in name order either way."""
    h = hashlib.md5()
    if os.path.isdir(path):
        files = sorted(
            f
            for f in os.listdir(path)
            if not f.startswith(("_", ".")) and f.endswith(".parquet")
        )
    else:
        path, files = os.path.dirname(path), [os.path.basename(path)]
    for name in files:
        h.update(name.encode())
        with open(os.path.join(path, name), "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
    return h.hexdigest()[:16]


def _layout_root() -> str:
    root = os.path.join(tempfile.gettempdir(), "nesb_layouts")
    os.makedirs(root, exist_ok=True)
    return root


def _publish(build_dir: str, dst: str) -> str:
    """Atomically publish a built layout; lose the race gracefully."""
    open(os.path.join(build_dir, _MARKER), "w").close()
    try:
        os.rename(build_dir, dst)
    except OSError:
        # Another process published the same content-addressed layout
        # first; theirs is byte-equivalent.
        shutil.rmtree(build_dir, ignore_errors=True)
    return dst


def build_hive_orders(sf_dir: str) -> str:
    """Derive a hive-partitioned mirror of ``orders``, partitioned by
    ``o_year = year(o_orderdate)``.

    Plain pyarrow (not a Spark write): the layout must be byte-
    deterministic for the content-addressed cache, and a one-pass
    filter-per-year over <=150k rows at sf0.1 is trivial driver-side
    work. NULL order dates go to Hive's ``__HIVE_DEFAULT_PARTITION__``
    (read back as a NULL partition value). A 0-row source gets a
    single empty ``o_year=0`` sentinel partition so partition
    discovery still types ``o_year`` as an integer.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = table_path(sf_dir, "orders")
    dst = os.path.join(_layout_root(), f"hive_orders_{_content_sig(src)}")
    if os.path.exists(os.path.join(dst, _MARKER)):
        return dst

    tbl = pq.read_table(src)
    years = pc.year(tbl["o_orderdate"])
    distinct = sorted(
        y for y in set(years.to_pylist()) if y is not None
    )
    build = tempfile.mkdtemp(dir=_layout_root())
    if not distinct:
        # 0 rows, or every date NULL: sentinel keeps o_year integer-
        # typed; the (possibly empty) NULL partition still materializes
        # below if there are all-NULL rows.
        part = os.path.join(build, "o_year=0")
        os.makedirs(part)
        pq.write_table(tbl.slice(0, 0), os.path.join(part, "part-0.parquet"))
    for y in distinct:
        part = os.path.join(build, f"o_year={y}")
        os.makedirs(part)
        pq.write_table(
            tbl.filter(pc.equal(years, y)),
            os.path.join(part, "part-0.parquet"),
        )
    n_null = int(pc.sum(pc.is_null(years).cast("int64")).as_py() or 0)
    if n_null:
        part = os.path.join(build, f"o_year={_HIVE_NULL}")
        os.makedirs(part)
        pq.write_table(
            tbl.filter(pc.is_null(years)),
            os.path.join(part, "part-0.parquet"),
        )
    return _publish(build, dst)


def build_evolution_events(sf_dir: str) -> str:
    """Derive a two-file mixed-schema mirror of ``events``: even
    ``event_id`` rows (``event_id & 1 = 0``, two's-complement, so the
    rule is identical in pyarrow / Spark / DuckDB for negatives) keep
    the full schema; odd / NULL-id rows go to a file WITHOUT the
    ``value`` column — the "column added later" half of the corpus.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = table_path(sf_dir, "events")
    dst = os.path.join(_layout_root(), f"evo_events_{_content_sig(src)}")
    if os.path.exists(os.path.join(dst, _MARKER)):
        return dst

    tbl = pq.read_table(src)
    ids = tbl["event_id"]
    even = pc.fill_null(
        pc.equal(pc.bit_wise_and(ids, pa.scalar(1, ids.type)), pa.scalar(0, ids.type)),
        False,
    )
    build = tempfile.mkdtemp(dir=_layout_root())
    pq.write_table(tbl.filter(even), os.path.join(build, "part-new.parquet"))
    pq.write_table(
        tbl.filter(pc.invert(even)).drop_columns(["value"]),
        os.path.join(build, "part-old.parquet"),
    )
    return _publish(build, dst)


def hive_partitioned_scan(spark: SparkSession, path: str) -> DataFrame:
    """Read a hive-partitioned directory; directory names become typed
    partition columns and filters on them prune at FILE LISTING time
    (`PartitionFilters` in the scan node — zero bytes read from
    excluded partitions)."""
    return spark.read.parquet(path)


def evolution_scan(spark: SparkSession, path: str) -> DataFrame:
    """Read a mixed-schema directory with schema merging: the unified
    schema is the union of all footers; files missing a column yield
    NULL for it. (Without the option Spark picks one footer at random
    — a silently wrong read on an evolving corpus.)"""
    return spark.read.option("mergeSchema", "true").parquet(path)


@register(
    "scan_hive_partitioned",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderstatus,
           COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS sum_price
    FROM orders
    WHERE year(o_orderdate) IN (1996, 1997)
    GROUP BY 1, 2
    """,
)
def scan_hive_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned scan over the derived hive layout: the
    ``o_year`` predicate never opens the other years' files. The
    oracle expresses the same derivation over the flat table."""
    df = hive_partitioned_scan(spark, build_hive_orders(sf_dir))
    return (
        df.where(F.col("o_year").isin(1996, 1997))
        .groupBy(
            F.col("o_year").cast("bigint").alias("o_year"), "o_orderstatus"
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )


@register(
    "scan_schema_evolution",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(CASE WHEN (event_id & 1) = 0 THEN value END) AS n_value,
           {sql_dsum('CASE WHEN (event_id & 1) = 0 THEN value END')} AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-schema scan over the derived mixed-schema layout: rows
    from the value-less files surface ``value`` as NULL, so COUNT and
    the guarded sum see exactly the even-``event_id`` population the
    builder routed to the value-bearing file — which is what the
    oracle's CASE reconstructs on the flat table."""
    df = evolution_scan(spark, build_evolution_events(sf_dir))
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("value").alias("n_value"),
        dsum("value").alias("sum_value"),
    )
