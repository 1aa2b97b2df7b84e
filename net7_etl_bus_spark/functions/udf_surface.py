"""UDF surface (SURVEY.md §2.3): scalar Python UDF, Arrow-vectorized
pandas UDF, applyInPandas UDAF, and a lateral-join UDTF.

These ops exist to prove the extension surface, with the performance
contract stated per op: row-at-a-time Python UDFs are the SLOW path
(pickle per row, no codegen) and are never used in engine hot paths —
every builtin-expressible op in this repo uses pyspark.sql.functions.
When Python is genuinely needed (custom models, merge_asof, codecs),
the Arrow-batched forms here (pandas_udf / applyInPandas / mapInPandas)
are the pattern: columnar transfer, ~10-100x over row-at-a-time.

Each op still carries a DuckDB oracle: the Python result must equal
the relational result bit-for-bit, which also pins the UDF's semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import ZIP_CSV_PATH, load_table
from ..plans.registry import register

_SQL_CSV = f"read_csv('{ZIP_CSV_PATH}', header=true, all_varchar=true)"


@register(
    "udf_scalar",
    oracle=f"""
    SELECT zipcode || '_' || state_abbr AS CompositeKey,
           city,
           CAST(length(lower(city)) - length(regexp_replace(lower(city), '[aeiou]', '', 'g')) AS INT)
             AS n_vowels
    FROM {_SQL_CSV}
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the composite key (ZipCodeHelpers.cs:11-14)
    computed in Python instead of concat_ws. Deliberately the slow path:
    fine on a 254-row dimension, wrong on a 100 TB fact table (each row
    round-trips driver-pickled Python). The oracle pins identical
    semantics to the builtin version in derive_composite_key."""

    @F.udf("string")
    def py_key(zipcode: str, state: str) -> str:
        return f"{zipcode}_{state}"

    @F.udf("int")
    def py_vowels(city: str) -> int:
        return sum(1 for ch in city.lower() if ch in "aeiou")

    from ..plans.reference_ops import read_zip_csv

    z = read_zip_csv(spark)
    return z.select(
        py_key("ZipCode", "StateCode").alias("CompositeKey"),
        F.col("City").alias("city"),
        py_vowels("City").alias("n_vowels"),
    )


@register(
    "udf_pandas_vectorized",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF: the TPC-H charge expression
    evaluated as one numpy expression per Arrow batch. Same IEEE
    multiply sequence as the SQL (left-assoc, one rounding per op), so
    the hash matches bit-for-bit — which is the point: vectorized
    Python is a *correct* stand-in for codegen'd expressions where a
    model call would slot in."""

    @F.pandas_udf("double")
    def charge(e: pd.Series, d: pd.Series, t: pd.Series) -> pd.Series:
        return e * (1 - d) * (1 + t)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@register(
    "udaf_applyInPandas",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CASE WHEN MAX(CASE WHEN o_totalprice IS NOT NULL AND
                              (isnan(o_totalprice) OR abs(o_totalprice) >= 9e16)
                         THEN 1 ELSE 0 END) = 1
                THEN CAST('NaN' AS DOUBLE)
                ELSE CAST(SUM(CASE WHEN NOT isnan(o_totalprice) AND abs(o_totalprice) < 9e16
                              THEN CAST(FLOOR(o_totalprice * 100.0) AS DECIMAL(38,0)) END)
                          AS DOUBLE) / 100.0
           END AS total_spend,
           MAX(o_totalprice) AS max_order
    FROM orders
    GROUP BY o_custkey
    """,
)
def udaf_applyInPandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-group aggregation via applyInPandas (the UDAF
    surface). Cent-exact accumulation (floor-scaled integer cents)
    keeps the float sum order-independent so it hash-matches the
    oracle — same discipline as registry.dsum.

    OPTIMIZATION_r13 (guide §4.5 — amortize per-call overhead): the
    grouped map runs per SALT BUCKET (pmod(xxhash64(o_custkey), B)),
    not per customer — grouping ~thousands of customers into one
    Python call whose kernel does a vectorized pandas groupby over the
    real key. groupBy(o_custkey).applyInPandas paid ~1.4 ms of
    per-group glue (Arrow slice + pandas construction + 1-row result
    frame) x |customers|: 24.2 s at sf0.1 vs 2.9 s bucketed, 8.2x,
    value-identical (A/B in OPTIMIZATION_r13.md). B adapts to the
    input row count from parquet footers (target ~2k rows/call,
    floor = defaultParallelism so every core gets work, cap 65536 so
    the bucket-id shuffle stays wide at 100 TB — guide §2.5 synthetic
    keys); results never depend on B."""

    def stats_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # SQL aggregate semantics by hand, vectorized per bucket:
        # NULL prices are IGNORED by SUM/MAX, COUNT(*) still counts
        # the row, an all-NULL group sums/maxes to NULL — and the dsum
        # extremes contract applies: NaN/Inf/out-of-domain prices
        # poison total_spend to NaN (the engine must surface
        # corruption, not launder it), while max keeps SQL semantics
        # (NaN ranks greatest in both engines).
        #
        # ARROW TRAP (fuzz-found): applyInPandas converts a nullable
        # float64 column so that SQL NULL and real NaN are both NaN in
        # pandas — indistinguishable inside the kernel. Any kernel that
        # must tell them apart (this one: NULLs are ignored, NaNs
        # poison) computes the distinction JVM-SIDE and ships it as
        # boolean flag columns. Likewise o_custkey re-wraps as
        # masked Int64 so NULL keys survive exactly (a bigint column
        # with NULLs otherwise degrades to float64 — lossy past 2^53).
        is_null = pdf["p_null"].to_numpy(dtype=bool)
        is_bad = pdf["p_bad"].to_numpy(dtype=bool)
        prices = pdf["o_totalprice"].to_numpy(dtype=float)
        keys = pd.array(pdf["o_custkey"], dtype="Int64")
        good_mask = (~is_null) & (~is_bad)
        cents = np.zeros(len(pdf), dtype=float)
        cents[good_mask] = np.floor(prices[good_mask] * 100.0)
        g = pd.DataFrame(
            {
                "k": keys,
                "n": np.ones(len(pdf), dtype="int64"),
                "has": (~is_null).astype("int64"),
                "bad": is_bad.astype("int64"),
                "real_nan": (is_bad & np.isnan(prices)).astype("int64"),
                "cents": cents,
                "abs_cents": np.abs(cents),
                # -inf sentinel for ignored NULL rows: never the max
                # unless the group has no non-null price (masked below)
                "price_nn": np.where(is_null, -np.inf, prices),
            }
        ).groupby("k", sort=False, dropna=False)
        agg = g.agg(
            n_orders=("n", "sum"),
            has=("has", "max"),
            bad=("bad", "max"),
            real_nan=("real_nan", "max"),
            cents_f=("cents", "sum"),
            abs_cents=("abs_cents", "sum"),
            mx=("price_nn", "max"),
        ).reset_index()
        # Float cents sums are exact while every |prefix| < 2^52 (the
        # sum of |cents| bounds every prefix, signs included). Groups
        # past that redo in unbounded Python ints — identical
        # elementwise floors, exact sum, matching the DECIMAL(38,0)
        # oracle. Each in-domain row's cents fit int64, but a GROUP of
        # such rows can exceed it, and numpy wraps silently instead of
        # raising (advice r4) — hence Python ints, never numpy int64;
        # float(cents)/100.0 then mirrors the oracle's
        # CAST(sum AS DOUBLE)/100.0 (correctly-rounded int->double,
        # then one shared IEEE division).
        sus = agg["abs_cents"].to_numpy() >= float(1 << 52)
        if sus.any():
            kcol = pdf["o_custkey"]
            ci = agg.columns.get_loc("cents_f")
            for i in np.flatnonzero(sus):
                k = agg["k"].iloc[i]
                m = kcol.isna() if pd.isna(k) else (kcol == k)
                rows = pdf[m.to_numpy(dtype=bool)]
                gm = (~rows["p_null"].to_numpy(dtype=bool)) & (
                    ~rows["p_bad"].to_numpy(dtype=bool)
                )
                gv = rows["o_totalprice"].to_numpy(dtype=float)[gm]
                agg.iloc[i, ci] = float(sum(int(v) for v in np.floor(gv * 100.0)))
        has = agg["has"].to_numpy() == 1
        bad = agg["bad"].to_numpy() == 1
        spend = pd.arrays.FloatingArray(
            np.where(bad, np.nan, agg["cents_f"].to_numpy() / 100.0), mask=~has
        )
        mx_vals = agg["mx"].to_numpy(dtype=float).copy()
        mx_vals[agg["real_nan"].to_numpy() == 1] = np.nan
        mx = pd.arrays.FloatingArray(mx_vals, mask=~has)
        return pd.DataFrame(
            {
                "o_custkey": agg["k"],
                "n_orders": agg["n_orders"].astype("int64"),
                "total_spend": spend,
                "max_order": mx,
            }
        )

    from ..data import table_rows

    rows = table_rows(sf_dir, "orders")
    par = max(spark.sparkContext.defaultParallelism, 1)
    n_buckets = min(max((rows or 4096 * par) // 2048, par), 65536)
    o = load_table(spark, sf_dir, "orders")
    pr = F.col("o_totalprice")
    o = o.select(
        "o_custkey",
        "o_totalprice",
        pr.isNull().alias("p_null"),
        (pr.isNotNull() & (F.isnan(pr) | (F.abs(pr) >= F.lit(9e16)))).alias("p_bad"),
        F.pmod(F.xxhash64("o_custkey"), F.lit(n_buckets)).alias("bkt"),
    )
    return o.groupBy("bkt").applyInPandas(
        stats_bucket,
        "o_custkey bigint, n_orders bigint, total_spend double, max_order double",
    )


@register(
    "udtf_surface",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id % 10 = 0
    """,
)
def udtf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a LATERAL join: one input document row expands to
    N token rows. The UDTF is the engine's user-facing flat-map
    surface (tokenizers, parsers, frame samplers); the lateral-join
    form keeps it streaming — no collect, no explode of a
    driver-built array. split(' ') (not split()) so the oracle's
    string_split has identical empty-token semantics."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string")
    class TokenExplode:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for tok in text.split(" "):
                yield (doc_id, tok)

    spark.udtf.register("token_explode", TokenExplode)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        "SELECT t.doc_id, t.token FROM udtf_docs_in, LATERAL token_explode(doc_id, text) t"
    )
