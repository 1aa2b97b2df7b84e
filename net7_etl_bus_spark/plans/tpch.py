"""Flagship analytical queries over the TPC-H-ish testdata.

These are the headline bench queries: scan -> filter -> (broadcast)
join -> hash agg -> sort pipelines whose physical plans we actively
inspect (see tests/test_plans.py): filters and projections must reach
the parquet scan (PushedFilters/ReadSchema), small dimensions must
broadcast, and the aggregates must run as partial (map-side) + final
hash aggregation inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table
from .registry import davg, dsum, register, sql_davg, sql_dsum

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 4)} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount', 4)} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary.

    Scale shape: single scan with pushed-down date filter, 4-group hash
    aggregation — partial aggregation collapses each input partition to
    ~4 rows before the (tiny) shuffle, so this scales linearly with
    input bytes and is scan-bound at 100 TB.
    """
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # Accumulation-strategy note (VERDICT r3 item 5, measured twice):
    # a two-level shape (int64 partials per spark_partition_id, decimal
    # only across partitions) beat one-level dsum by ~20% BEFORE the
    # extremes poison contract (med 0.74s vs 0.91s at sf0.1). WITH the
    # contract each measure needs three partial legs (long + rare
    # decimal side-leg + poison flag), and the two-level shape measured
    # med 1.72s vs one-level's 1.28s — the extra per-row expression
    # work erased the win, so q1 uses the simpler one-level guarded
    # dsum. Re-evaluate if the guard ever compiles to cheaper codegen.
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 4).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q3_ORACLE = f"""
SELECT
  l.l_orderkey,
  {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
  o.o_orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 20
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style top-revenue orders.

    Scale shape: customer (filtered on segment) broadcasts into orders,
    the orders->lineitem join shuffles on orderkey (both sides huge at
    100 TB — co-partitioned shuffle join is correct; bucketing both
    tables on orderkey would remove it entirely). Top-20 is a
    TakeOrderedAndProject — no global sort materialization.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(20)
    )


_Q5_ORACLE = f"""
SELECT
  n.n_name,
  {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style revenue by nation.

    Scale shape: region/nation/supplier/customer are all dimensions —
    every join here broadcasts except orders⋈lineitem (shuffle on
    orderkey). Join order puts the most selective dimension filter
    (region) earliest via the nation/supplier chain; Catalyst + AQE
    reorder/skew-handle the rest.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


_Q6_ORACLE = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style selective scan-aggregate.

    Scale shape: all four predicates push to the parquet scan
    (row-group pruning on shipdate at 100 TB with date-partitioned
    layout); global aggregate is a 1-row partial per partition.
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))
    )


_Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_returned_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
"""


@register("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style returned-item report: which customers returned
    the most revenue in a year. Fact-fact join (lineitem x orders)
    shuffles on the order key; customer/nation broadcast. The date
    filter reaches the orders scan, shrinking the shuffle's build side
    before it happens."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            revenue.alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_returned_items"),
        )
    )


_Q14_ORACLE = f"""
SELECT
  100.0 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END", 4)}
        / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


@register("q14_promo_revenue", oracle=_Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style promotion effect: share of one month's revenue
    from promo parts. One broadcast join + a single global aggregate of
    two conditional sums — the whole query is one scan-side pipeline
    with a scalar result."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return joined.agg(
        (F.lit(100.0) * dsum(promo_rev, 4) / dsum(rev, 4)).alias("promo_revenue_pct")
    )


_Q4_ORACLE = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style priority check: orders in one quarter that had at
    least one problem lineitem (the reference schema has no
    commit/receipt dates, so 'returned' stands in for 'late').

    Scale shape: the EXISTS decorrelates to a LEFT SEMI join on
    orderkey — lineitem is pre-filtered and projected to the single
    join column before its shuffle, so the shuffle carries keys, not
    rows. The aggregate output is 5 groups.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    problem_keys = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(problem_keys, o.o_orderkey == problem_keys.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=_Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style bilateral trade volume between two nations by
    year.

    Scale shape: both nation sides broadcast (25 rows); supplier and
    customer broadcast; the only shuffle is orders><lineitem on
    orderkey. The nation-pair disjunction is applied AFTER the
    dimension joins attach both nation names, but Catalyst still
    pushes the single-nation IN-list into each broadcast side.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q8_ORACLE = f"""
SELECT o_year,
       100.0 * {sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END", 4)}
             / {sql_dsum('volume', 4)} AS mkt_share_pct
FROM (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'EUROPE'
    AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style market share: one supplier nation's slice of a
    region's spend on one part type, per year.

    Scale shape: the 8-way join keeps exactly one fact-fact shuffle
    (lineitem><orders); part/supplier/customer/nation/region all
    broadcast with their filters applied pre-broadcast. The share is a
    conditional-sum / sum over 2 yearly groups — partial aggregation
    makes the post-join reduce negligible.
    """
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_volume = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
        F.lit(0.0)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (F.lit(100.0) * dsum(nation_volume, 4) / dsum(volume, 4)).alias(
                "mkt_share_pct"
            )
        )
        .orderBy("o_year")
    )


_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q13_order_count_dist", oracle=_Q13_ORACLE)
def q13_order_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style customer order-count distribution (how many
    customers placed k non-urgent orders, including k=0).

    Scale shape: a double aggregation. The left outer join shuffles on
    custkey; the first groupBy reuses that partitioning (no second
    shuffle — same key), and the distribution groupBy reduces to at
    most ~max-orders-per-customer rows, so the second exchange is
    trivially small. The join-side filter is pushed into the orders
    scan; LEFT OUTER preserves order-less customers as count 0.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q18_ORACLE = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       {sql_dsum('l.l_quantity')} AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 200)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register("q18_large_volume_customers", oracle=_Q18_ORACLE)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style large-volume customers: orders whose total
    quantity exceeds a threshold, with their customer.

    Scale shape: the HAVING subquery is a map-side-combined groupBy on
    orderkey producing only the qualifying keys; that tiny key set
    LEFT SEMI-prunes lineitem BEFORE the re-aggregation, so the second
    pass runs over ~1% of the fact. Top-100 by totalprice is
    TakeOrderedAndProject. l_quantity is integral-valued, so the
    HAVING comparison is float-exact in both engines.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big_orders = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 200)
        .select("l_orderkey")
    )
    l_big = l.join(
        big_orders.withColumnRenamed("l_orderkey", "_bok"),
        l.l_orderkey == F.col("_bok"),
        "left_semi",
    )
    return (
        l_big.join(o, l_big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


_Q19_ORACLE = f"""
SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
"""


@register("q19_disjunctive_revenue", oracle=_Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style discounted revenue under an OR-of-ANDs
    predicate mixing columns from both join sides.

    Scale shape: Catalyst factors the disjunction — the part side gets
    `p_brand IN (...) AND p_size <= 35` and the lineitem side gets
    `l_quantity BETWEEN 1 AND 40` pushed to their scans (the full
    disjunction can't push, but the weaker conjunctive envelope can
    and does, shrinking both inputs before the broadcast join).
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


_Q21_ORACLE = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


@register("q21_waiting_suppliers", oracle=_Q21_ORACLE)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style sole-fault supplier: in finished multi-supplier
    orders, the one supplier whose items came back returned while every
    other supplier's did not ('returned' stands in for 'late' — the
    schema has no commit/receipt dates).

    Scale shape: the EXISTS / NOT EXISTS pair over the same relation is
    rewritten as ONE per-order aggregate (distinct suppliers, distinct
    returned-suppliers) joined back on orderkey — two scans of
    lineitem and a single orderkey shuffle, instead of the literal
    plan's two extra correlated join passes. The pair of correlated
    predicates becomes `n_supp >= 2 AND n_ret_supp = 1` (l1 itself is
    returned, so 'no OTHER returned supplier' == exactly one).
    """
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    order_stats = l.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count_distinct(F.col("l_suppkey")).alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    l1 = l.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(order_stats, l1.l_orderkey == F.col("_ok"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
        .join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


_Q22_ORACLE = f"""
SELECT c.c_nationkey AS cntry,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       {sql_dsum('c.c_acctbal')} AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT {sql_davg('c2.c_acctbal')}
    FROM customer c2 WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_nationkey
ORDER BY cntry
"""


@register("q22_dormant_customers", oracle=_Q22_ORACLE)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style sales opportunity: above-average-balance
    customers with no urgent orders, totaled per nation (nationkey
    stands in for the phone country code the schema doesn't have).

    Scale shape: the scalar AVG subquery is a 1-row aggregate
    broadcast-cross-joined into the scan (no driver collect); the NOT
    EXISTS is a LEFT ANTI join against urgent-order custkeys projected
    to the single join column. The threshold uses the deterministic
    decimal average (:func:`registry.davg`) so the float comparison
    agrees bit-for-bit with the oracle.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thresh = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal").alias("_avg_bal"))
    )
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("_uck"))
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(urgent, c.c_custkey == F.col("_uck"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntry")
    )


# --- q2-style: minimum-cost supplier -----------------------------------
# The reduced schema has no partsupp; the supply catalog is derived as
# the distinct (part, supplier) pairs observed in lineitem with
# unit_cost = min(extendedprice / quantity). Same shape as TPC-H Q2:
# region-filtered suppliers, per-part minimum cost, correlated-min
# semantics expressed as a window (one shuffle on partkey) instead of a
# rescan-the-catalog correlated subquery.

_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
eu AS (
  SELECT ps.l_partkey, ps.unit_cost, s.s_name, s.s_acctbal, n.n_name
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'),
m AS (SELECT *, MIN(unit_cost) OVER (PARTITION BY l_partkey) AS min_cost FROM eu)
SELECT m.s_acctbal, m.s_name, m.n_name, p.p_partkey, p.p_name
FROM m JOIN part p ON p.p_partkey = m.l_partkey
WHERE m.unit_cost = m.min_cost
  AND p.p_size BETWEEN 20 AND 30 AND p.p_type = 'STANDARD'
ORDER BY m.s_acctbal DESC, m.n_name, m.s_name, p.p_partkey
LIMIT 100
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-style minimum-cost supplier (adapted: the supply
    catalog is derived from lineitem, see module comment).

    Scale shape: supplier->nation->region broadcasts into lineitem
    BEFORE the catalog aggregate (the region filter prunes the agg's
    input, not just its output), so the one (partkey, suppkey) shuffle
    sees only the surviving region's rows; the per-part min is a
    WINDOW over the partkey shuffle — NOT the textbook correlated
    subquery, which would rescan the catalog per part. Filtered part
    broadcasts into the final probe. Top-100 is TakeOrderedAndProject.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(20, 30) & (F.col("p_type") == "STANDARD")
    )
    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # Region-filter BEFORE the catalog aggregate: the broadcast join
    # prunes ~4/5 of lineitem ahead of the (partkey, suppkey) shuffle —
    # the aggregate's input, not just its output, shrinks. Per-pair
    # minima are unchanged by dropping whole suppliers.
    eu = (
        l.join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
        .groupBy("l_partkey", "l_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    m = eu.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        m.join(F.broadcast(p), m.l_partkey == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_Q9_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE 'red%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("q9_product_type_profit", oracle=_Q9_ORACLE)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style profit by nation and year (adapted: revenue
    stands in for profit — the reduced schema has no supplycost).

    Scale shape: part (name-filtered, so heavily pruned) and
    supplier->nation broadcast into one pass over lineitem; the
    name LIKE 'red%' predicate pushes to the part scan as a
    StringStartsWith. One fact scan, one small-group hash agg.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "n_name"
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), l.l_suppkey == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("o_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", F.col("o_year").desc())
    )


# --- q11-style: important parts by traded value ------------------------

_Q11_NATION = "NATION_3"
_Q11_FRAC = 0.001

_Q11_ORACLE = f"""
WITH base AS (
  SELECT l.l_partkey, l.l_extendedprice * l.l_quantity AS v
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = '{_Q11_NATION}')
SELECT l_partkey, {sql_dsum('v', 2)} AS part_value
FROM base
GROUP BY l_partkey
HAVING {sql_dsum('v', 2)} > (SELECT {sql_dsum('v', 2)} FROM base) * {_Q11_FRAC}
ORDER BY part_value DESC, l_partkey
"""


@register("q11_important_stock", oracle=_Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-style important-parts query (adapted: traded value
    from lineitem replaces partsupp stock value): parts whose value
    from one nation's suppliers exceeds a fraction of that nation's
    total.

    Scale shape: nation-filtered supplier broadcasts into ONE pass
    over lineitem; the global total is a second aggregate of the same
    (cheap, already-filtered) base that Spark plans as a 1-row
    broadcast into the HAVING filter — never a rescan of raw
    lineitem. Both the per-part and total sums use the same exact
    decimal accumulation, so the threshold compare is deterministic.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == _Q11_NATION)
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    v = F.col("l_extendedprice") * F.col("l_quantity")
    base = l.join(F.broadcast(sn), l.l_suppkey == F.col("s_suppkey")).select(
        "l_partkey", v.alias("v")
    )
    per_part = base.groupBy("l_partkey").agg(dsum("v").alias("part_value"))
    total = base.agg((dsum("v") * F.lit(_Q11_FRAC)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


_Q12_ORACLE = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


@register("q12_priority_shipping", oracle=_Q12_ORACLE)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-style priority-class counts (adapted: grouped by
    l_linestatus — the reduced schema has no shipmode — with the same
    high/low conditional-count core).

    Scale shape: date filter pushed to the lineitem scan, orderkey
    shuffle join against orders (both fact-sized: co-partitioned
    shuffle or bucketing, never broadcast), then a 2-group conditional
    aggregate that collapses map-side.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s.s_suppkey
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-style top supplier: the supplier(s) whose quarterly
    revenue equals the maximum over all suppliers.

    Scale shape: one date-pruned pass over lineitem aggregated by
    suppkey; the scalar max is a 1-row broadcast back onto the
    (supplier-sized, small) revenue relation — the revenue view is
    computed once, not once per comparison. Exact-decimal revenue
    makes the equality join well-defined cross-engine.
    """
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.max_revenue)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT c.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) c
JOIN part p ON p.p_partkey = c.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND NOT EXISTS (SELECT 1 FROM supplier s
                  WHERE s.s_acctbal < 0 AND s.s_suppkey = c.l_suppkey)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register("q16_supplier_part_cnt", oracle=_Q16_ORACLE)
def q16_supplier_part_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style supplier counts per part attribute (adapted:
    the part-supplier catalog is the distinct pairs from lineitem;
    negative-balance suppliers stand in for the complaints exclusion).

    Scale shape: filtered part broadcasts into lineitem and the
    excluded-supplier set is a broadcast ANTI join (never a NOT IN
    rescan) — both BEFORE any shuffle, so the only exchange is the
    final attribute-group aggregate. No (partkey, suppkey) distinct
    pass is needed at all: COUNT(DISTINCT l_suppkey) absorbs duplicate
    pairs, so materializing the deduped catalog (as the oracle's CTE
    does) would be a pure extra shuffle. All joins hash, no nested
    loop.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    cat = l.select("l_partkey", "l_suppkey")
    return (
        cat.join(F.broadcast(bad), cat.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


_Q17_ORACLE = f"""
WITH a AS (
  SELECT l_partkey, {sql_davg('l_quantity')} AS avg_qty
  FROM lineitem GROUP BY l_partkey)
SELECT {sql_dsum('l.l_extendedprice', 2)} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23' AND l.l_quantity < 0.2 * a.avg_qty
"""


@register("q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style small-quantity average yearly revenue: lineitems
    of one brand whose quantity is below 20% of the part's average.

    Scale shape: the correlated AVG is decorrelated into a WINDOW over
    the partkey shuffle of the brand-pruned fact — the brand filter
    (broadcast part join, no shuffle) prunes BEFORE the partkey
    exchange, and the window makes that exchange the query's only
    fact shuffle (the aggregate-then-join formulation the oracle runs
    shuffles the full fact twice: once for the per-part avg, once for
    the join). Brand selects whole parts, so per-part averages over
    the pruned fact equal the oracle's full-fact averages.
    Exact-decimal avg makes the 0.2*avg threshold deterministic
    cross-engine.
    """
    from pyspark.sql import Window

    from ..plans.registry import _bad_row

    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    w = Window.partitionBy("l_partkey")
    # davg("l_quantity") as a window: identical op order, so the
    # threshold bit-matches the oracle's sql_davg — INCLUDING the
    # poison contract: a NaN/Inf/out-of-domain quantity anywhere in
    # the part group makes the group's avg NaN in sql_davg, and the
    # NaN threshold then admits every non-NaN quantity (NaN is the
    # total-order maximum in both engines). The raw floor-sum alone
    # would silently launder the corrupt row into a finite threshold.
    qty = F.col("l_quantity")
    bad_qty = _bad_row(qty, 2)
    raw_avg = (
        F.sum(F.when(~bad_qty, F.floor(qty * F.lit(100.0))).cast("decimal(38,0)"))
        .over(w)
        .cast("double")
        / F.lit(100.0)
    ) / F.count(F.lit(1)).over(w)
    avg_qty = F.when(
        F.max(bad_qty.cast("int")).over(w) == 1, F.lit(float("nan"))
    ).otherwise(raw_avg)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


_Q20_ORACLE = f"""
WITH excess AS (
  SELECT l.l_suppkey
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'red%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING {sql_dsum('l.l_quantity', 2)} > 30.0)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (SELECT l_suppkey FROM excess)
ORDER BY s.s_name
"""


@register("q20_excess_suppliers", oracle=_Q20_ORACLE)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style promotion-part suppliers: suppliers in one
    nation who moved more than a threshold quantity of a name-filtered
    part family in a year.

    Scale shape: the nested IN becomes a SEMI join from supplier to
    the (already tiny after HAVING) excess relation; part (name
    filter pushed as StringStartsWith) broadcasts into the single
    date-pruned lineitem pass. Supplier never joins the raw fact.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    excess = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30.0)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
