"""Operator/query registry — the driver-facing inventory.

Every implemented operator from SURVEY.md §2 registers here as a
``(spark, sf_dir) -> DataFrame`` callable, optionally paired with an
ANSI-SQL oracle string that DuckDB runs over the same parquet tables
(views ``region nation customer supplier part orders lineitem events
documents embeddings`` are pre-registered by the driver; fixture-backed
queries reference committed files under fixtures/ via
``read_csv``/``read_parquet``).

Cross-engine determinism rules used throughout (so the driver's
order-insensitive value-hash matches):

* SUM over doubles goes through exact DECIMAL accumulation and is cast
  back to double: ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.
  Per-row double->decimal rounding is deterministic and identical in
  both engines; decimal summation is exact (order-independent); the
  final decimal->double cast is correctly rounded in both. Plain
  SUM(double) would depend on partial-aggregation order.
* AVG is ``exact_sum_double / COUNT(*)`` — one IEEE division on
  identical operands in both engines.
* Any row_number/limit/"keep one of the duplicates" uses a total order
  (unique key tiebreak) so the surviving rows are well-defined.
* Hashes use md5/sha2-256 of UTF-8 strings — hex output is identical
  across Spark and DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    Ops that are not SQL-expressible (custom stateful streaming,
    iterative algorithms, LSH with engine-specific hashing) register
    without an oracle — the driver then records a weaker rows-only
    check, which is the documented fallback.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are deferred so `import net7_etl_bus_spark` stays cheap
    # and there is no circular-import knot with the operator modules.
    from ..functions import scalar, udf_surface  # noqa: F401
    from ..operators import (  # noqa: F401
        dedup,
        enrich,
        multimodal,
        relational,
        similarity,
        text,
        windows,
    )
    from .. import pipeline  # noqa: F401
    from ..plans import reference_ops, tpch  # noqa: F401
    from ..streaming import batch_equiv  # noqa: F401

    _LOADED = True


# --- shared deterministic-aggregation helpers -------------------------

def dsum(col: Column | str, scale: int = 2) -> Column:
    """Deterministic SUM over a double column.

    ``floor(x * 10^scale)`` is computed on the identical IEEE double in
    both engines (multiply + floor are exact, deterministic ops — no
    decimal rounding mode in the path), summed exactly as DECIMAL(38,0),
    then scaled back with one double division. A plain
    ``CAST(x AS DECIMAL(18,4))`` is NOT bit-stable across engines: the
    double->decimal rounding can flip for values within 1 ulp of a
    rounding boundary, which empirically happens ~1e-3/row on
    full-precision products.
    """
    c = F.col(col) if isinstance(col, str) else col
    m = float(10**scale)
    return (
        F.sum(F.floor(c * F.lit(m)).cast("decimal(38,0)")).cast("double") / F.lit(m)
    )


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic AVG: exact-sum double divided by count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = 2) -> str:
    """Oracle-side twin of :func:`dsum`."""
    m = float(10**scale)
    return f"(CAST(SUM(CAST(FLOOR(({expr}) * {m}) AS DECIMAL(38,0))) AS DOUBLE) / {m})"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"{sql_dsum(expr, scale)} / COUNT(*)"
