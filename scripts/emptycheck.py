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


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
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
