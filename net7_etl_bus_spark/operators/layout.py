"""Storage-layout clustering: Z-order (Morton curve) multi-dimension
sort keys for data skipping.

At 100 TB, a table sorted by ONE column gives parquet min/max file
skipping on that column only; queries filtering the other dimension
scan everything. Interleaving the bits of two dimension keys (the
Z-order curve — what Delta's `OPTIMIZE ZORDER BY` and ClickHouse's
`mortonEncode` do) bounds EVERY file's range on BOTH dimensions, so
point/range predicates on either column skip most files.

The whole computation is integer bit-arithmetic (shift/and/or with the
classic bit-spreading magic constants) — exactly reproducible in any
engine, so the oracle hash-checks the full file→range assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from ..plans.registry import register

_EPOCH = "1992-01-01"
_CUST_BIN = 64      # custkey bucket edge (range-preserving, scale-free)
_DAY_BIN = 32       # orderdate bucket edge in days
_FILE_SHIFT = 10    # file id = z >> 10 (z-range partitioning, no sort)

# 16-bit -> 32-bit bit spreading (x -> x with a zero bit between every
# pair), the standard Morton magic-number ladder.
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    v = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def _sql_spread16(expr: str) -> str:
    v = f"({expr} & 65535)"
    for shift, mask in _SPREAD:
        v = f"(({v} | ({v} << {shift})) & {mask})"
    return v


_SQL_Z = (
    f"({_sql_spread16(f'(o_custkey // {_CUST_BIN})')}"
    " | ("
    + _sql_spread16(
        f"(datediff('day', TIMESTAMP '{_EPOCH}', o_orderdate) // {_DAY_BIN})"
    )
    + " << 1))"
)


@register(
    "zorder_cluster",
    oracle=f"""
    SELECT file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_custkey) AS custkey_lo, MAX(o_custkey) AS custkey_hi,
           MIN(dayidx) AS day_lo, MAX(dayidx) AS day_hi
    FROM (
      SELECT o_custkey,
             datediff('day', TIMESTAMP '{_EPOCH}', o_orderdate) AS dayidx,
             ({_SQL_Z} >> {_FILE_SHIFT}) AS file_id
      FROM orders)
    GROUP BY file_id ORDER BY file_id
    """,
)
def zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every order to a Z-order file bucket and report each
    bucket's min/max range on BOTH clustering dimensions — the
    manifest a data-skipping reader would consult.

    Scale shape: the z-value is a narrow per-row expression; the file
    id is a constant right-shift of it (z-RANGE partitioning), so
    clustering needs NO global sort — `df.repartitionByRange(z)` or a
    partitioned write on file_id lays the data out, and the only
    shuffle here is the tiny per-file stats groupBy. The payoff the
    stats demonstrate: every file's span is bounded in custkey AND
    order date simultaneously, which one-column sorting cannot do.
    """
    o = load_table(spark, sf_dir, "orders")
    dayidx = F.datediff(F.col("o_orderdate"), F.lit(_EPOCH).cast("date")).cast("long")
    z = _spread16(F.floor(F.col("o_custkey") / _CUST_BIN)).bitwiseOR(
        F.shiftleft(_spread16(F.floor(dayidx / _DAY_BIN)), 1)
    )
    return (
        o.select(
            F.col("o_custkey"),
            dayidx.alias("dayidx"),
            F.shiftright(z, _FILE_SHIFT).alias("file_id"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("o_custkey").alias("custkey_lo"),
            F.max("o_custkey").alias("custkey_hi"),
            F.min("dayidx").alias("day_lo"),
            F.max("dayidx").alias("day_hi"),
        )
        .orderBy("file_id")
    )
