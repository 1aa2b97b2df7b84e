"""Empty-input robustness sweep.

Builds a schema-identical but ROW-EMPTY mirror of the testdata tables,
then runs every registered query against it. A query passes when it
executes end-to-end (count() succeeds) — rows may legitimately be 0 or
a constant (e.g. global aggregates). This flushes out hidden
``collect()[0]`` / ``head()`` / "assume at least one partition has
rows" assumptions that small-SF correctness runs can never reach: at
100 TB an empty partition, an empty date slice, or a filter that
matches nothing is routine.

Usage: python scripts/emptycheck.py [src_sf_dir] [query ...]
Exit 0 iff every checked query runs.

``one`` mode — ``python scripts/emptycheck.py [src_sf_dir] one
[table ...]`` — is the DIFFERENTIAL variant: for each named table
(default: all ten) it builds a mirror where ONLY that table is empty
and runs the full Spark-vs-DuckDB value check. The all-empty sweep
proves queries don't crash; this one proves the VALUES agree when one
join side, one dimension, the signup stream, or the whole corpus
vanishes — an empty broadcast side, an empty NOT EXISTS subquery, and
an all-NULL as-of match are all semantics, not just liveness.

``tiny`` mode — ``python scripts/emptycheck.py [src_sf_dir] tiny
[n]`` — is the degenerate-but-NONEMPTY differential: every table cut
to its first ``n`` rows (default 1) and the full value check re-run.
One row is where a different set of edge semantics lives: sample
stddev/variance/regression over a single observation, NTILE with
fewer rows than tiles, percentiles of one value, k-means/PQ training
on one vector, OHLC from a single tick, interpolation with a single
anchor. Both engines read the same truncated bytes, so any divergence
is a real cross-engine semantics bug.
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from net7_etl_bus_spark.plans import registry  # noqa: E402
from net7_etl_bus_spark.schemas import TESTDATA_TABLES  # noqa: E402
from net7_etl_bus_spark.session import get_spark  # noqa: E402


def build_empty_mirror(spark, src_sf_dir: str, dst_dir: str) -> None:
    for t in TESTDATA_TABLES:
        src = os.path.join(src_sf_dir, f"{t}.parquet")
        df = spark.read.parquet(src)
        empty = spark.createDataFrame([], df.schema)
        empty.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(dst_dir, f"{t}.parquet")
        )


def build_one_empty_mirror(src_sf_dir: str, dst_dir: str, empty_table: str) -> None:
    """Mirror with ONLY ``empty_table`` empty; other tables are linked
    byte-identical so both engines read the same non-empty sides."""
    import pyarrow.parquet as pq

    for t in TESTDATA_TABLES:
        src = os.path.join(src_sf_dir, f"{t}.parquet")
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if t == empty_table:
            # pyarrow, not a Spark write: an empty Spark write emits a
            # directory with no data files, which DuckDB cannot read —
            # a single zero-row file with the source schema is what
            # both engines parse identically.
            schema = pq.read_schema(src)
            pq.write_table(schema.empty_table(), dst)
        else:
            os.symlink(src, dst)


# Every testdata table: facts, join-driving dims, and the tiny
# broadcast catalogs (an empty region/nation is exactly the empty-
# broadcast-side case the docstring promises to cover).
_ONE_DEFAULT_TABLES = (
    "lineitem", "orders", "customer", "supplier", "part",
    "events", "documents", "embeddings", "nation", "region",
)


def main_one(src: str, tables: list[str]) -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import diffcheck

    rc = 0
    for t in tables or list(_ONE_DEFAULT_TABLES):
        with tempfile.TemporaryDirectory(prefix=f"emptyone_{t}_") as dst:
            build_one_empty_mirror(src, dst, t)
            print(f"\n### only {t} empty ###", flush=True)
            sys.argv = ["diffcheck.py", dst]
            rc |= diffcheck.main()
    return rc


def build_tiny_mirror(src_sf_dir: str, dst_dir: str, n: int = 1) -> None:
    """Mirror with every table truncated to its first ``n`` physical
    rows (a deterministic pyarrow slice — both engines then read the
    same bytes). FK chains mostly break, which is the point: joins
    legitimately go empty while every table still has rows."""
    import pyarrow.parquet as pq

    for t in TESTDATA_TABLES:
        src = os.path.join(src_sf_dir, f"{t}.parquet")
        pq.write_table(
            pq.read_table(src).slice(0, n),
            os.path.join(dst_dir, f"{t}.parquet"),
        )


def main_tiny(src: str, n: int) -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import diffcheck

    with tempfile.TemporaryDirectory(prefix=f"tiny{n}_") as dst:
        build_tiny_mirror(src, dst, n)
        print(f"### every table cut to first {n} row(s) ###", flush=True)
        sys.argv = ["diffcheck.py", dst]
        return diffcheck.main()


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if len(sys.argv) > 2 and sys.argv[2] == "one":
        return main_one(src, sys.argv[3:])
    if len(sys.argv) > 2 and sys.argv[2] == "tiny":
        return main_tiny(src, int(sys.argv[3]) if len(sys.argv) > 3 else 1)
    only = set(sys.argv[2:])
    spark = get_spark("net7-etl-bus-emptycheck")
    failed: list[str] = []
    with tempfile.TemporaryDirectory(prefix="emptysf_") as dst:
        build_empty_mirror(spark, src, dst)
        qs = registry.queries()
        for name, fn in qs.items():
            if only and name not in only:
                continue
            try:
                n = fn(spark, dst).count()
                print(f"ok    {name}: {n} rows")
            except Exception:
                failed.append(name)
                print(f"FAIL  {name}")
                traceback.print_exc(limit=25)
    print(f"\n{len(failed)} failed" + (": " + ", ".join(failed) if failed else ""))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
