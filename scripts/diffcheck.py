"""Differential checker mirroring the driver's DuckDB-oracle gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given SF, then compares row count, column names, and order-insensitive
values. Usage:

    python scripts/diffcheck.py [sf_dir] [query ...]

Exit code 0 iff all checked queries match.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from net7_etl_bus_spark.plans import registry  # noqa: E402
from net7_etl_bus_spark.schemas import TESTDATA_TABLES  # noqa: E402
from net7_etl_bus_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # Spark results arrive tz-aware (toArrow stamps the UTC
            # session zone); DuckDB's are naive UTC wall times — strip
            # the zone, don't convert (same instant, same wall time).
            # NEVER route through pd.to_datetime here: it coerces to
            # datetime64[ns], which overflows at year 9999 / before
            # 1677 — the exact far-range values the `clock` fuzz class
            # exists to probe (r13).
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            # int32 vs int64, bool vs boolean — compare as object
            df[c] = df[c].astype("object")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        problems.append(f"columns spark={scols} oracle={ocols}")
        return problems
    if problems:
        return problems
    s = normalize(sdf)
    o = normalize(odf)
    n_bad = 0
    first = None
    for i in range(len(s)):
        for c in s.columns:
            if not values_equal(s.at[i, c], o.at[i, c]):
                n_bad += 1
                if first is None:
                    first = f"row {i} col {c}: spark={s.at[i, c]!r} oracle={o.at[i, c]!r}"
                break
    if n_bad:
        problems.append(f"{n_bad}/{len(s)} rows differ; first: {first}")
    return problems


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    only = set(args[1:] if args and os.path.isdir(args[0]) else args)

    qs = registry.queries()
    oracles = registry.oracles()
    spark = get_spark("diffcheck", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        # a table may be a single file or a directory of part files
        # (the `split` fuzz mode / any real lake layout)
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    failed, passed, skipped = [], [], []
    for name in sorted(qs):
        if only and name not in only:
            continue
        if name not in oracles:
            skipped.append(name)
            continue
        try:
            # toArrow (Spark 4), NOT toPandas: toPandas hardcodes a
            # timestamp[us] -> datetime64[ns] cast that overflows at
            # year 9999 / past 2262-04-11 — the clock fuzz class's
            # far-range values crashed the FETCH before the engines
            # were ever compared (r13 first-run find). Arrow-side
            # to_pandas keeps the µs unit end-to-end.
            sdf = qs[name](spark, sf_dir).toArrow().to_pandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:500]}")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: oracle error: {str(e)[:500]}")
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            passed.append(name)
            print(f"ok   {name} ({len(sdf)} rows)")
    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(skipped)} no-oracle")
    if skipped:
        print("no-oracle:", " ".join(skipped))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
