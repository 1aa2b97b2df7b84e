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
    surface): one shuffle on the group key, then an arbitrary pandas
    program per group. Cent-exact accumulation (floor-scaled int64)
    keeps the float sum order-independent so it hash-matches the
    oracle — same discipline as registry.dsum."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # SQL aggregate semantics by hand: NULL prices are IGNORED by
        # SUM/MAX, COUNT(*) still counts the row, an all-NULL group
        # sums/maxes to NULL — and the dsum extremes contract applies:
        # NaN/Inf/out-of-domain prices poison total_spend to NaN (the
        # engine must surface corruption, not launder it), while max
        # keeps SQL semantics (NaN ranks greatest in both engines).
        #
        # ARROW TRAP (fuzz-found): applyInPandas converts a nullable
        # float64 column so that SQL NULL and real NaN are both NaN in
        # pandas — indistinguishable inside the kernel. Any kernel that
        # must tell them apart (this one: NULLs are ignored, NaNs
        # poison) computes the distinction JVM-SIDE and ships it as
        # boolean flag columns.
        is_null = pdf["p_null"].to_numpy(dtype=bool)
        is_bad = pdf["p_bad"].to_numpy(dtype=bool)
        prices = pdf["o_totalprice"].to_numpy()
        nn = ~is_null
        has = bool(nn.any())
        bad = bool(is_bad.any())
        good = prices[nn & ~is_bad]
        # Accumulate in Python ints, not numpy int64: each in-domain
        # row's cents fit int64 (|price| < 9e16 -> |cents| < 9e18 <
        # 2^63), but a GROUP of such rows can exceed it, and numpy
        # wraps silently instead of raising (advice r4) — while the
        # oracle accumulates the same rows in DECIMAL(38,0). Python
        # ints are unbounded, so the group sum is exact like the
        # oracle's; float(cents)/100.0 then mirrors the oracle's
        # CAST(sum AS DOUBLE)/100.0 (both correctly-rounded
        # int->double, then one shared IEEE division).
        cents = sum(int(v) for v in np.floor(good * 100.0)) if len(good) else 0
        spend = float("nan") if bad else (float(cents) / 100.0 if has else None)
        mx = None
        if has:
            real_nan = is_bad & np.isnan(prices)  # NaN specifically, not Inf/huge
            mx = float("nan") if real_nan.any() else prices[nn].max()
        return pd.DataFrame(
            {
                "o_custkey": [pdf["o_custkey"].iloc[0]],
                "n_orders": [len(pdf)],
                "total_spend": [spend],
                "max_order": [mx],
            }
        )

    o = load_table(spark, sf_dir, "orders")
    pr = F.col("o_totalprice")
    o = o.select(
        "o_custkey",
        "o_totalprice",
        pr.isNull().alias("p_null"),
        (pr.isNotNull() & (F.isnan(pr) | (F.abs(pr) >= F.lit(9e16)))).alias("p_bad"),
    )
    return o.groupBy("o_custkey").applyInPandas(
        stats, "o_custkey bigint, n_orders bigint, total_spend double, max_order double"
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
