"""Core relational surface: scans, filters, projections, joins,
aggregations, set operations (SURVEY.md §2.3).

Each op is a thin, named, tested composition of built-in DataFrame
operators — Catalyst handles pushdown/pruning/reordering, AQE handles
runtime sizing and skew. Docstrings record the intended physical plan
at scale; tests/test_plans.py asserts the load-bearing properties
(pushed filters, broadcast choice, pruned schemas).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import load_table, scan_parallel
from ..plans.registry import ddouble, dsum, register, sql_ddouble, sql_dsum

# --- scans -------------------------------------------------------------


@register(
    "parquet_scan",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with explicit projection (column pruning)."""
    return load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R' AND l_discount < 0.02
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive filter; all three predicates push to the scan."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_quantity") > 45)
        & (F.col("l_returnflag") == "R")
        & (F.col("l_discount") < 0.02)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "project_expr",
    oracle="""
    SELECT
      o_orderkey,
      o_totalprice,
      CAST(ROUND(o_totalprice * 1.07, 2) AS DOUBLE) AS price_with_tax,
      translate(o_orderpriority, 'abcdefghijklmnopqrstuvwxyz', 'ABCDEFGHIJKLMNOPQRSTUVWXYZ') AS priority_uc,
      DATE_TRUNC('day', o_orderdate) AS order_date
    FROM orders
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed-column projection — pure narrow map, no shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.round(F.col("o_totalprice") * 1.07, 2).cast("double").alias("price_with_tax"),
        F.translate(F.col("o_orderpriority"), "abcdefghijklmnopqrstuvwxyz", "ABCDEFGHIJKLMNOPQRSTUVWXYZ").alias("priority_uc"),
        # timestamp (not DATE) output: DATE round-trips differently
        # through Arrow/pandas in the two engines
        F.date_trunc("day", "o_orderdate").alias("order_date"),
    )


# --- joins -------------------------------------------------------------


@register(
    "join_inner_hash",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join. At bench SF customer fits the broadcast
    threshold so AQE picks broadcast-hash; at 100 TB with a huge build
    side it degrades to shuffled hash join on the key — both correct,
    both skew-protected by AQE."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_brand, p.p_type
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 40
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dimension side: fact table never
    shuffles; the filtered part table ships to every executor once."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    return l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_brand", "p_type"
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 450000
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a join-side predicate (kept in the ON clause —
    moving it to WHERE would change semantics to inner)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@register(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_acctbal
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(
        c, (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "F"), "right"
    ).select("o_orderkey", "c_custkey", "c_acctbal")


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.c_nationkey, sn.s_nationkey) AS nationkey, cn.n_cust, sn.n_supp
    FROM cn FULL JOIN sn ON cn.c_nationkey = sn.s_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregated sides (sort-merge at scale —
    full outer cannot broadcast)."""
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full").select(
        F.coalesce(cn.c_nationkey, sn.s_nationkey).alias("nationkey"),
        "n_cust",
        "n_supp",
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — existence test, never duplicates the left side.
    Mirrors the reference's key-set restriction (semi_join_incoming,
    reference DataflowProcessor.cs:124-131) as a distributed join
    instead of a pushed-down IN list."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — the load-bearing incremental-processing op
    (reference anti_join_processed, DataflowProcessor.cs:140-148): at
    scale this is a broadcast/shuffle anti-join against the processed
    snapshot, never a giant IN list shipped to a database."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_theta_range",
    oracle=f"""
    WITH buckets(bucket_name, lo, hi) AS (
      VALUES ('tiny', 0.0, 50000.0), ('small', 50000.0, 150000.0),
             ('medium', 150000.0, 300000.0), ('large', 300000.0, 450000.0),
             ('huge', 450000.0, 100000000.0)
    )
    SELECT b.bucket_name, COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS total_price
    FROM orders o JOIN buckets b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.bucket_name
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (range-band) join: fact rows against literal range
    buckets. Physical plan is BroadcastNestedLoopJoin — correct here
    because the banded side is tiny; a large-large range join should
    instead bucketize both sides to convert to equi-join (that pattern
    is what join_asof uses)."""
    o = load_table(spark, sf_dir, "orders")
    buckets = spark.createDataFrame(
        [
            ("tiny", 0.0, 50000.0),
            ("small", 50000.0, 150000.0),
            ("medium", 150000.0, 300000.0),
            ("large", 300000.0, 450000.0),
            ("huge", 450000.0, 100000000.0),
        ],
        "bucket_name string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(buckets),
            (o.o_totalprice >= buckets.lo) & (o.o_totalprice < buckets.hi),
        )
        .groupBy("bucket_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


# --- aggregation -------------------------------------------------------


@register(
    "agg_hash",
    oracle=f"""
    SELECT l_suppkey,
           COUNT(*) AS n_items,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_price,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem GROUP BY l_suppkey
    """,
)
def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation with map-side partial aggregation — the
    shuffle carries one row per (partition, suppkey), not per input
    row."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Spark expands to a two-phase aggregate; the
    distinct keys are partially deduped map-side before shuffling."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_count_distinct_approx",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           1 AS within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) with a driver-checkable
    invariant (r4 verdict item 3). The raw sketch estimate is
    engine-specific (DuckDB's HLL legitimately disagrees), so the
    OUTPUT is the exact count plus ``within_bound`` — 1 iff the HLL++
    estimate at rsd=0.02 lands within max(10% of exact, 4) of the
    exact count (10% = 5 sigma at that rsd; the absolute floor covers
    tiny groups, where the sparse-mode estimate can sit off by one or
    two — unicode fuzz found exact=8/approx=7 failing a pure relative
    bound), evaluated in-engine on the same aggregation pass. The
    oracle computes the exact count and asserts the invariant as the
    literal 1, so a sketch gone wrong hash-mismatches the driver gate
    instead of hiding behind a rows-only check. HLL++ merge is
    max-of-registers — order-independent, hence stable under any
    partitioning."""
    l = load_table(spark, sf_dir, "lineitem")
    exact = F.count_distinct("l_partkey").cast("bigint")
    approx = F.approx_count_distinct("l_partkey", 0.02).cast("double")
    return l.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        F.count(F.lit(1)).alias("n_rows"),
        F.when(
            F.abs(approx - exact.cast("double"))
            <= F.greatest(0.1 * exact.cast("double"), F.lit(4.0)),
            1,
        )
        .otherwise(0)
        .alias("within_bound"),
    )


_GSETS_ORACLE = f"""
SELECT c_mktsegment, c_nationkey,
       COUNT(*) AS n_cust,
       {sql_dsum('c_acctbal')} AS sum_bal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
HAVING COUNT(*) > 0
"""


@register("agg_grouping_sets", oracle=_GSETS_ORACLE)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via SQL on a temp view (the DataFrame API has no
    grouping-sets method; SQL is the idiomatic Spark surface for it).
    Physically a single Expand + hash aggregate — one pass over data.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("nesb_customer_gs")
    return spark.sql(
        f"""
        SELECT c_mktsegment, c_nationkey,
               COUNT(*) AS n_cust,
               {sql_dsum('c_acctbal')} AS sum_bal
        FROM nesb_customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
        """
        # NOTE: the oracle carries HAVING COUNT(*) > 0 — a no-op on any
        # non-empty input — to encode the engine's documented
        # empty-input semantics: Spark's Expand-based grouping sets
        # produce NO rows over an empty relation (the ANSI grand-total
        # row over emptiness is suppressed). Found by the single-
        # empty-table differential (scripts/emptycheck.py one).
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_cust, {sql_dsum('c_acctbal')} AS sum_bal
    FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    HAVING COUNT(*) > 0
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.rollup("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n_cust"), dsum("c_acctbal").alias("sum_bal")
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("sum_price")
    )


# --- sort / limit / top-k ---------------------------------------------


@register(
    "sort_orderby",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal,
           CAST(ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS pos
    FROM supplier
    """,
)
def sort_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort (range-partitioned exchange at scale). The sort
    position is materialized as a column so the order itself is
    value-hash-checkable by the order-insensitive driver compare."""
    from pyspark.sql import Window

    s = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select(
        "s_suppkey", "s_name", "s_acctbal", F.row_number().over(w).cast("bigint").alias("pos")
    )


@register(
    "limit_n",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT — Spark plans TakeOrderedAndProject (per
    partition top-N then driver merge), never a full global sort.
    Tiebreak on the unique key makes the result deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, CAST(rk AS BIGINT) AS rk FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer) t
    WHERE rk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranked window + filter. Spark pushes a
    per-partition top-k (WindowGroupLimit) below the shuffle, so the
    exchange carries at most k rows per group per input partition."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# --- set operations ----------------------------------------------------


@register(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name — no shuffle, just concatenated partitions."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract == EXCEPT DISTINCT (exceptAll would keep multiplicity
    # differences, which is EXCEPT ALL semantics — not what SQL EXCEPT means)
    return c.subtract(s)


N_SALT = 8


@register(
    "join_skew_salted",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual key-salting for skewed shuffle joins, as a named op.

    The probe (fact) side appends salt = pmod(hash(key), N) to its join
    key; the build side replicates each row N times with every salt
    value (explode of a literal range — N small rows per key, never a
    shuffle blowup). The join key becomes (key, salt), so one hot key's
    rows spread across N reducers instead of one. Result is identical
    to the plain join — the oracle IS the plain join.

    AQE's skew-join split (enabled in session.py) handles most skew
    automatically by splitting oversized partitions; manual salting
    remains the tool when a single KEY (not partition) is hot enough to
    overflow one task — AQE cannot split within a key group for joins
    feeding aggregations, and pre-salting composes with bucketing.
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    salted_l = l.withColumn("salt", F.pmod(F.hash("l_orderkey"), F.lit(N_SALT)))
    salted_o = o.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)]))
    )
    return salted_l.join(
        salted_o,
        (salted_l.l_orderkey == salted_o.o_orderkey)
        & (salted_l.salt == salted_o.salt),
    ).select("l_orderkey", "l_linenumber", "o_orderdate", "o_orderpriority")


@register(
    "agg_percentile_disc",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             list(l_quantity ORDER BY l_quantity)
               FILTER (WHERE l_quantity IS NOT NULL) AS qs,
             COUNT(l_quantity) AS nq,
             list(l_extendedprice ORDER BY l_extendedprice)
               FILTER (WHERE l_extendedprice IS NOT NULL) AS ps,
             COUNT(l_extendedprice) AS np
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           qs[CAST(ceil(0.5 * nq) AS BIGINT)] AS qty_median,
           qs[CAST(ceil(0.9 * nq) AS BIGINT)] AS qty_p90,
           ps[CAST(ceil(0.5 * np) AS BIGINT)] AS price_median
    FROM s
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (median/p90) per group. Discrete
    (element-selecting) quantiles are deterministic across engines —
    no interpolation arithmetic to disagree on. At 100 TB exact
    percentiles need a full sort per group; production dashboards use
    approx_percentile (t-digest) instead — exact is the correctness
    anchor the sketch is judged against.

    NaN semantics (extremes fuzz): the engine's percentile_disc ranks
    NaN GREATEST (consistent with its sort order); DuckDB's
    quantile_disc ranks NaN SMALLEST — inconsistent with DuckDB's own
    ORDER BY — so the oracle indexes an explicitly sorted list
    (1-based ceil(p*n), the percentile_disc selection rule) instead of
    calling quantile_disc."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").alias("qty_median"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").alias("qty_p90"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").alias(
            "price_median"
        ),
    )


@register(
    "agg_percentile_approx",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             list(x ORDER BY x) FILTER (WHERE ok) AS xs,
             COUNT(*) FILTER (WHERE ok) AS n,
             COUNT(*) FILTER (WHERE badrow) AS n_bad
      FROM (SELECT l_returnflag, l_extendedprice AS x,
                   l_extendedprice IS NOT NULL AND NOT isnan(l_extendedprice)
                     AND NOT isinf(l_extendedprice) AS ok,
                   l_extendedprice IS NOT NULL AND (isnan(l_extendedprice)
                     OR isinf(l_extendedprice)) AS badrow
            FROM lineitem)
      GROUP BY l_returnflag)
    SELECT l_returnflag,
           CASE WHEN n > 0 THEN xs[CAST(ceil(0.5 * n) AS BIGINT)] END AS median_exact,
           CAST(n_bad AS BIGINT) AS n_bad,
           1 AS within_bound
    FROM s
    """,
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (mergeable rank sketch — the percentile a
    100 TB dashboard actually computes; exact per-group percentiles
    need a full sort, see agg_percentile_disc) with a driver-checkable
    invariant, same pattern as agg_count_distinct_approx: the sketch
    value is engine-specific, so the OUTPUT is the exact median plus
    ``within_bound`` — 1 iff the sketch's median (accuracy 1000, rank
    error <= 0.1%) lands between the exact 47th and 53rd percentiles,
    evaluated in-engine in the same aggregation pass. The oracle
    computes the exact median by sorted-list selection and asserts the
    invariant as the literal 1.

    Corruption contract: NaN/Inf measures can't poison a rank sketch
    the way they poison a sum (no arithmetic), but they CAN'T be
    silently dropped either — they're excluded from both engines'
    rank domain identically and SURFACED as the exact ``n_bad`` count
    per group (cross-engine checkable), so a corrupt 100 TB metric
    column is visible next to its percentile. NULLs are ignored per
    SQL; an all-NULL group has a NULL median and within_bound=1 iff
    the sketch also returns NULL.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    inf = F.lit(float("inf"))
    ok = x.isNotNull() & ~F.isnan(x) & (F.abs(x) != inf)
    badrow = x.isNotNull() & (F.isnan(x) | (F.abs(x) == inf))
    # scan_parallel (OPTIMIZATION_r13): three percentile_disc buffers
    # + the rank sketch insert per row are NOT a cheap partial agg —
    # spreading the scan wins 1.12x at sf0.1 (unlike agg_hash/q1,
    # where the same repartition loses; see data.scan_parallel).
    li = scan_parallel(li, "l_orderkey")
    prj = li.select(
        "l_returnflag",
        F.when(ok, x).alias("fin"),
        F.when(badrow, 1).alias("bad"),
    )
    return (
        prj.groupBy("l_returnflag")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY fin)").alias(
                "median_exact"
            ),
            F.expr("percentile_disc(0.47) WITHIN GROUP (ORDER BY fin)").alias("_lo"),
            F.expr("percentile_disc(0.53) WITHIN GROUP (ORDER BY fin)").alias("_hi"),
            F.percentile_approx("fin", 0.5, 1000).alias("_apx"),
            F.count("bad").cast("bigint").alias("n_bad"),
            F.count("fin").alias("_n"),
        )
        .select(
            "l_returnflag",
            "median_exact",
            "n_bad",
            F.when(F.col("_n") == 0, F.col("_apx").isNull().cast("int"))
            .otherwise(
                (
                    (F.col("_apx") >= F.col("_lo")) & (F.col("_apx") <= F.col("_hi"))
                ).cast("int")
            )
            .alias("within_bound"),
        )
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS n_O,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS n_F,
           {qty_o} AS qty_O,
           {qty_f} AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """.format(
        qty_o=sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END"),
        qty_f=sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END"),
    ),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): status categories become columns.
    Pivot values are declared explicitly — with them, pivot is a single
    hash aggregation with conditional aggregates (one pass, one
    shuffle); without them Spark must first run a distinct query to
    discover values (an extra job at scale). The oracle states the
    desugared form: FILTERed aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            # dsum carries the extremes poison contract into each cell
            dsum("l_quantity").alias("qty"),
        )
    )
    return piv.select(
        "l_returnflag",
        # a (flag, status) cell with NO rows is NULL from pivot but 0
        # from the oracle's COUNT FILTER - counts are 0, sums stay NULL
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_O"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_F"),
        F.col("O_qty").alias("qty_O"),
        F.col("F_qty").alias("qty_F"),
    )


def _sql_over_views(spark: SparkSession, sf_dir: str, sql: str, tables: list[str]) -> DataFrame:
    """Run a SQL-surface query: register the needed testdata tables as
    temp views and hand the text to spark.sql — the engine's second
    front door (same Catalyst plan as the DataFrame API). Views are
    session-scoped and idempotent to re-register."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


_SUBQ_SCALAR = """
SELECT p_partkey, p_brand, p_retailprice
FROM part p
WHERE p_retailprice > 1.15 * (
  SELECT AVG(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)
"""


@register("subquery_scalar_correlated", oracle=_SUBQ_SCALAR)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (parts priced >15% above their
    brand's average). Catalyst decorrelates this into one aggregate +
    one join — no per-row re-execution, which is what makes correlated
    subqueries survive at scale. Same SQL text runs on both engines.

    AVG appears only inside a >( ) comparison, never in the output, so
    cross-engine float-sum ordering cannot flip a row: the margin is
    1.15x while summation nondeterminism is ~1 ulp."""
    return _sql_over_views(spark, sf_dir, _SUBQ_SCALAR, ["part"])


_SUBQ_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
AND NOT EXISTS (
  SELECT 1 FROM orders o2
  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
)
"""


@register("subquery_exists", oracle=_SUBQ_EXISTS)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS pair — planned as a left-semi plus a
    left-anti join (never a per-row probe)."""
    return _sql_over_views(spark, sf_dir, _SUBQ_EXISTS, ["customer", "orders"])


_SUBQ_IN = """
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_nationkey IN (
  SELECT n_nationkey FROM nation
  WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE')
)
"""


@register("subquery_in_nested", oracle=_SUBQ_IN)
def subquery_in_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN subqueries over the dimension hierarchy — two semi
    joins after decorrelation, both broadcast at dimension size."""
    return _sql_over_views(spark, sf_dir, _SUBQ_IN, ["supplier", "nation", "region"])


@register(
    "dq_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) AS null_orderkey,
           CAST(COUNT(*) FILTER (WHERE l_quantity IS NULL) AS BIGINT) AS null_quantity,
           CAST(COUNT(*) FILTER (WHERE l_quantity <= 0 OR l_quantity > 50) AS BIGINT)
             AS bad_quantity_range,
           CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT)
             AS bad_discount_range,
           CAST(COUNT(*) FILTER (WHERE l_extendedprice <= 0) AS BIGINT) AS bad_price,
           CAST(COUNT(*) FILTER (WHERE l_shipdate < TIMESTAMP '1992-01-01 00:00:00'
                                  OR l_shipdate >= TIMESTAMP '1999-01-01 00:00:00') AS BIGINT)
             AS shipdate_out_of_range,
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_returnflag_values
    FROM lineitem
    """,
)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style data-quality audit: null counts, range
    violations, a date-domain invariant, and value-domain
    cardinality — all as conditional aggregates in ONE scan + one
    tiny aggregation (never N passes for N checks). At 100 TB this is
    the pattern for pipeline gate checks: compute the audit row, fail
    or quarantine the batch on threshold breach, publish the metrics."""
    li = load_table(spark, sf_dir, "lineitem")

    def bad(cond):
        return F.count(F.when(cond, 1)).cast("bigint")

    return li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        bad(F.col("l_orderkey").isNull()).alias("null_orderkey"),
        bad(F.col("l_quantity").isNull()).alias("null_quantity"),
        bad((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 50)).alias(
            "bad_quantity_range"
        ),
        bad((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias(
            "bad_discount_range"
        ),
        bad(F.col("l_extendedprice") <= 0).alias("bad_price"),
        bad(
            (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp"))
            | (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        ).alias("shipdate_out_of_range"),
        F.countDistinct("l_returnflag").cast("bigint").alias("n_returnflag_values"),
    )


@register(
    "agg_rollup_time",
    oracle=f"""
    SELECT date_trunc('year', ts) AS y,
           date_trunc('month', ts) AS m,
           date_trunc('day', ts) AS d,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY ROLLUP (date_trunc('year', ts), date_trunc('month', ts),
                     date_trunc('day', ts))
    HAVING COUNT(*) > 0
    """,
)
def agg_rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup: event aggregates at
    day, month, year, and grand-total grains in ONE pass
    (GROUP BY ROLLUP over the truncated-timestamp hierarchy) —
    the batch form of a timeseries store's continuous aggregate
    ladder.

    Scale shape: Spark expands the rollup into grouping sets inside a
    single Expand + hash aggregate — partial aggregation collapses
    each partition to (grains x types x days) rows before one
    shuffle; no per-grain re-scan of the fact. At 100 TB with
    date-partitioned layout the day grain prunes, and the coarser
    grains are derived in the same aggregation.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("y", F.date_trunc("year", "ts"))
        .withColumn("m", F.date_trunc("month", "ts"))
        .withColumn("d", F.date_trunc("day", "ts"))
        .rollup("y", "m", "d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select("y", "m", "d", "n_events", "sum_value")
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH u AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id)
    SELECT CAST(COUNT(t_view) AS BIGINT) AS n_view,
           CAST(COUNT(CASE WHEN t_click >= t_view THEN 1 END) AS BIGINT) AS n_view_then_click,
           CAST(COUNT(CASE WHEN t_click >= t_view AND t_purchase >= t_click THEN 1 END) AS BIGINT) AS n_full_funnel
    FROM u
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel (view -> click -> purchase ordered by first
    occurrence per user): the standard product-analytics sequence
    query, formulated as ONE conditional-min aggregation per user plus
    a global roll-up — no self-joins, no window sort over the fact.

    Scale shape: a single user_id shuffle with map-side partial mins;
    the stage comparison happens on the 3-column per-user result. The
    per-event-type sequential-scan formulation (N self-joins) that a
    naive port would produce is exactly what this avoids.
    """
    e = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    u = e.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    clicked = F.col("t_click") >= F.col("t_view")
    return u.agg(
        F.count("t_view").cast("bigint").alias("n_view"),
        F.count(F.when(clicked, 1)).cast("bigint").alias("n_view_then_click"),
        F.count(F.when(clicked & (F.col("t_purchase") >= F.col("t_click")), 1))
        .cast("bigint")
        .alias("n_full_funnel"),
    )


@register(
    "cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL)
    SELECT f.cohort,
           CAST((epoch_us(a.wk) - epoch_us(f.cohort)) / 604800000000.0 AS INTEGER) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM first_seen f JOIN activity a ON a.user_id = f.user_id
    GROUP BY f.cohort, week_offset
    ORDER BY f.cohort, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week,
    counted in each subsequent active week (the classic retention
    triangle). Week offsets are computed as exact epoch-microsecond
    differences of week-truncated timestamps — a whole number in both
    engines, so the cast is lossless.

    Scale shape: ONE user_id shuffle computes both the cohort (min ts)
    and the distinct active weeks (collect_set of week-truncated ts —
    bounded by an entity's lifetime in weeks, so the set is small by
    construction), the weeks explode in place, and the retention
    triangle is a final cohort-sized aggregate. The two-aggregates-
    plus-user-join formulation (what the oracle runs) shuffles the
    fact twice and joins two user-sized relations; this does neither.
    """
    e = load_table(spark, sf_dir, "events")
    # Activity requires a user identity and an event time: NULL ts is
    # not activity (collect_set would skip it here but min(ts) would
    # not define a cohort for all-null users), and NULL user_id rows
    # are not a cohortable entity (SQL joins would never match them).
    e = e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
    u = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort"),
        F.collect_set(F.date_trunc("week", "ts")).alias("wks"),
    )
    week_offset = (
        (F.unix_micros("wk") - F.unix_micros("cohort")) / F.lit(604800000000.0)
    ).cast("int")
    return (
        u.select("cohort", F.explode("wks").alias("wk"))
        .groupBy("cohort", week_offset.alias("week_offset"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active_users"))
        .orderBy("cohort", "week_offset")
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, value FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
                      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
                      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
                      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    ) m
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (the inverse of agg_pivot): wide measure columns
    to long (key, metric, value) rows via the native unpivot operator
    — ONE scan expanding each row in place (Spark Expand node), where
    the SQL-92 oracle needs a UNION ALL scan per measure. Narrow,
    shuffle-free, output = rows x measures.
    """
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "value",
    )


_BANDS = (("b0_low", 0.0, 20.0), ("b1_mid", 20.0, 75.0), ("b2_high", 75.0, 150.0),
          ("b3_peak", 150.0, 300.0), ("b4_tail", 300.0, 500.0))
_BIN_W = 50.0


@register(
    "join_range_binned",
    oracle=f"""
    WITH bands AS (
      SELECT * FROM (VALUES {", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)})
      t(band, lo, hi))
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('e.value')} AS sum_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY band
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-dimension lookup join (value -> band) rewritten from a
    non-equi theta join into a binned EQUI join: each band row is
    exploded into the fixed-width bins it overlaps, the fact is binned
    with floor(value / W), and the join runs hash-on-bin with the
    original range predicate kept as a residual filter.

    Scale shape: the theta formulation (the oracle) is a nested-loop
    join — O(facts x bands) comparisons, catastrophic when the range
    dimension is large (an IP-geolocation table has millions of
    ranges). The binned form is a plain hash join: O(facts + bands x
    bins_per_band) with each fact row probing exactly one bucket. The
    physical plan is a BroadcastHashJoin on the bin key, not a
    BroadcastNestedLoopJoin (asserted in test_physical_plans.py).
    """
    e = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(list(_BANDS), "band string, lo double, hi double")
    binned_bands = bands.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BIN_W).cast("int"),
                F.floor(F.col("hi") / _BIN_W).cast("int"),
            )
        ),
    )
    fact = e.withColumn("bin", F.floor(F.col("value") / _BIN_W).cast("int"))
    joined = fact.join(
        F.broadcast(binned_bands),
        (fact["bin"] == binned_bands["bin"])
        & (fact["value"] >= binned_bands["lo"])
        & (fact["value"] < binned_bands["hi"]),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        dsum("value").alias("sum_value"),
    )


@register(
    "agg_stats_moments",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             CASE WHEN ok THEN CAST(FLOOR(l_quantity * 100) AS HUGEINT) END AS xq,
             CASE WHEN ok THEN CAST(FLOOR(l_extendedprice * 100) AS HUGEINT) END AS yq,
             CASE WHEN NOT ok AND NOT ign THEN 1 ELSE 0 END AS badrow
      FROM (SELECT *,
              l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
              AND NOT isnan(l_quantity) AND NOT isnan(l_extendedprice)
              AND abs(l_quantity) < 1e11 AND abs(l_extendedprice) < 1e11 AS ok,
              l_quantity IS NULL OR l_extendedprice IS NULL AS ign
            FROM lineitem)),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             MAX(badrow) AS bad,
             SUM(xq) AS sx, SUM(yq) AS sy,
             SUM(xq * xq) AS sxx, SUM(yq * yq) AS syy, SUM(xq * yq) AS sxy
      FROM q GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           CASE WHEN bad = 1 THEN CAST('NaN' AS DOUBLE) ELSE sqrt({varx} / {nn1}) / 100.0 END AS stddev_qty,
           CASE WHEN bad = 1 THEN CAST('NaN' AS DOUBLE) ELSE sqrt({vary} / {nn1}) / 100.0 END AS stddev_price,
           CASE WHEN bad = 1 THEN CAST('NaN' AS DOUBLE) ELSE {cov} / (sqrt({varx}) * sqrt({vary})) END AS corr_qty_price
    FROM m ORDER BY l_returnflag
    """.format(
        varx=sql_ddouble("n * sxx - sx * sx"),
        vary=sql_ddouble("n * syy - sy * sy"),
        cov=sql_ddouble("n * sxy - sx * sy"),
        nn1=sql_ddouble("n * (n - 1)"),
    ),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev, Pearson correlation)
    computed deterministically across engines: inputs are quantized to
    0.01, the five raw moments accumulate as EXACT 38-digit integers
    (order-independent, so partial aggregation is free), and floats
    only appear in the final sqrt/divide — IEEE-correctly-rounded ops
    on identical operands in both engines. Built-in stddev/corr would
    be summation-order-dependent and never hash-match cross-engine.

    Scale shape: one scan, map-side partial integer sums, 3-row final
    agg — the same linear shape as any one-pass moment sketch.
    """
    l = load_table(spark, sf_dir, "lineitem")
    # Moment-domain guard (extremes contract, same as agg_regr):
    # corrupt complete pairs poison the group's stats to NaN;
    # incomplete (NULL) pairs are ignored per SQL.
    xr, yr = F.col("l_quantity"), F.col("l_extendedprice")
    ok = (
        xr.isNotNull() & yr.isNotNull()
        & ~F.isnan(xr) & ~F.isnan(yr)
        & (F.abs(xr) < F.lit(1e11)) & (F.abs(yr) < F.lit(1e11))
    )
    xd = F.when(ok, F.floor(xr * 100)).cast("decimal(38,0)")
    yd = F.when(ok, F.floor(yr * 100)).cast("decimal(38,0)")
    m = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max(F.when(~ok & xr.isNotNull() & yr.isNotNull(), 1).otherwise(0)).alias("bad"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
        F.sum(xd * yd).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    # string-round-trip casts: see registry.ddouble — direct huge-int
    # ->double casts are 1 ulp off in DuckDB above 2^53
    varx = ddouble(n * F.col("sxx") - sx * sx)
    vary = ddouble(n * F.col("syy") - sy * sy)
    cov = ddouble(n * F.col("sxy") - sx * sy)
    nn1 = ddouble(n * (n - 1))
    nan = F.lit(float("nan"))
    bad = F.col("bad") == 1
    return m.select(
        "l_returnflag",
        "n",
        F.when(bad, nan).otherwise(F.sqrt(varx / nn1) / 100.0).alias("stddev_qty"),
        F.when(bad, nan).otherwise(F.sqrt(vary / nn1) / 100.0).alias("stddev_price"),
        F.when(bad, nan).otherwise(cov / (F.sqrt(varx) * F.sqrt(vary))).alias("corr_qty_price"),
    ).orderBy("l_returnflag")


@register(
    "agg_collect_list",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
    FROM orders GROUP BY o_custkey
    """,
)
def agg_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_list / collect_set) with
    deterministic element order: lists sort numerically before
    stringification (stringified because the driver's hash compare
    can't sort array cells; the concat_ws form is the portable
    serialization).

    Scale shape: single groupBy shuffle; per-group arrays must be
    bounded (per-customer order lists are) — unbounded-group
    collect_list at 100 TB is an OOM by design, which is why the op
    pairs with the top-k and sketch aggregates rather than replacing
    them.
    """
    o = load_table(spark, sf_dir, "orders")

    # A group whose elements are ALL NULL must serialize to NULL, not
    # '': collect_list skips NULLs so the array can be empty, while the
    # oracle's string_agg over zero non-null values is NULL per SQL.
    def _joined(lst: Column) -> Column:
        return F.when(
            F.size(lst) > 0,
            F.array_join(F.transform(lst, lambda x: x.cast("string")), ","),
        )

    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        _joined(F.array_sort(F.collect_list("o_orderkey"))).alias("order_keys"),
        _joined(F.array_sort(F.collect_set("o_orderpriority"))).alias("priorities"),
    )


@register(
    "rfm_segmentation",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             {sql_dsum('o_totalprice')} AS monetary
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey, last_order, frequency, monetary,
           CAST(NTILE(5) OVER (ORDER BY last_order DESC, o_custkey) AS BIGINT) AS r_score,
           CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_score,
           CAST(NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT) AS m_score
    FROM rfm
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (last order), frequency
    (order count), monetary (exact-decimal total) per customer, each
    quintile-scored.

    Scale shape: ONE aggregation pass over the fact computes all three
    dimensions (shared o_custkey shuffle), then the ntile windows run
    over the customer-sized aggregate — global windows, but on a
    relation orders of magnitude below the fact (the win_ntile_percent
    caveat applies and is satisfied by construction). Unique-key
    tiebreaks make every quintile cut deterministic.
    """
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    )
    from pyspark.sql import Window

    def score(col: str):
        return (
            F.ntile(5)
            .over(Window.orderBy(F.col(col).desc(), "o_custkey"))
            .cast("bigint")
        )

    return rfm.select(
        "o_custkey",
        "last_order",
        "frequency",
        "monetary",
        score("last_order").alias("r_score"),
        score("frequency").alias("f_score"),
        score("monetary").alias("m_score"),
    )


_SUBQ_LATERAL = """
SELECT c.c_custkey, c.c_name, t.n_orders, t.max_price
FROM customer c,
LATERAL (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         MAX(o.o_totalprice) AS max_price
  FROM orders o WHERE o.o_custkey = c.c_custkey
) t
"""


@register("subquery_lateral", oracle=_SUBQ_LATERAL)
def subquery_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (per-customer aggregate joined in
    the FROM clause) — the identical SQL text runs on both engines.
    Catalyst decorrelates it into an aggregate-then-join on o_custkey,
    never a per-row re-execution of the inner query; the aggregate
    LATERAL always yields one row, so customers without orders surface
    with (0, NULL) rather than dropping out."""
    return _sql_over_views(spark, sf_dir, _SUBQ_LATERAL, ["customer", "orders"])


@register(
    "agg_mode",
    oracle="""
    WITH counts AS (
      SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer GROUP BY c_mktsegment, c_nationkey),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                   ORDER BY cnt DESC, c_nationkey NULLS FIRST) AS rn
      FROM counts)
    SELECT c_mktsegment, c_nationkey AS mode_nationkey, cnt AS mode_count
    FROM ranked WHERE rn = 1 ORDER BY c_mktsegment
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group with a pinned tiebreak —
    built-in mode() exists in both engines but leaves ties undefined,
    which is exactly the nondeterminism this registry bans, so the op
    is the count + WindowGroupLimit formulation with (count DESC, key)
    total order.

    Scale shape: two-phase hash count (map-side partials), then the
    rank-1 filter plans as WindowGroupLimit — per-group top-1 without
    materializing full sorted groups.
    """
    c = load_table(spark, sf_dir, "customer")
    from pyspark.sql import Window

    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("cnt").desc(), "c_nationkey"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("mode_nationkey"),
            F.col("cnt").alias("mode_count"),
        )
        .orderBy("c_mktsegment")
    )


# --- interval-overlap join (binned, shuffle-safe) ---------------------

_IVL_W_US = 6 * 3600 * 1_000_000  # 6-hour buckets, microseconds
_IVL_WINDOWS = (
    ("W1", "2024-01-03 00:00:00", "2024-01-04 12:00:00"),
    ("W2", "2024-01-10 06:00:00", "2024-01-10 18:00:00"),
    ("W3", "2024-01-15 00:00:00", "2024-01-20 00:00:00"),
    ("W4", "2024-01-29 12:00:00", "2024-02-02 00:00:00"),
)


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH ivl AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             epoch_us(MIN(ts)) AS a_lo, epoch_us(MAX(ts)) AS a_hi
      FROM events GROUP BY user_id, date_trunc('day', ts)),
    win AS (
      SELECT * FROM (VALUES {", ".join(
          f"('{w}', epoch_us(TIMESTAMP '{lo}'), epoch_us(TIMESTAMP '{hi}'))"
          for w, lo, hi in _IVL_WINDOWS)})
      t(incident_id, b_lo, b_hi))
    SELECT incident_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM ivl JOIN win ON a_lo <= b_hi AND b_lo <= a_hi
    GROUP BY incident_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join — per-user-day activity intervals joined
    to incident windows they overlap (the Flink/Timescale "interval
    join" / maintenance-window attribution shape), rewritten from the
    theta form (the oracle: a nested-loop over ``a_lo <= b_hi AND b_lo
    <= a_hi``) into a binned EQUI join.

    Both sides explode into the fixed 6-hour buckets they cover; the
    join is hash-on-bucket with the overlap predicate as a residual.
    An overlapping pair would match once per shared bucket, so instead
    of a dedup shuffle the residual keeps ONLY the bucket containing
    ``greatest(a_lo, b_lo)`` — the later start — which every
    overlapping pair contains exactly once. Zero duplicates by
    construction, no distinct, one hash join.

    Scale shape: O(intervals x buckets_per_interval) exploded rows
    instead of O(intervals x windows) comparisons; each exploded row
    probes one hash bucket. With W sized near the median interval
    length the blowup factor is ~2-3x rows for a join that would
    otherwise be quadratic. The plan is a BroadcastHashJoin on the
    bucket key (windows are dimension-sized), never a nested loop.
    """
    e = load_table(spark, sf_dir, "events")
    ivl = (
        e.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            # events.ts can surface as TIMESTAMP_NTZ; cast is a no-op
            # under the UTC session TZ and unix_micros requires TIMESTAMP.
            F.unix_micros(F.min("ts").cast("timestamp")).alias("a_lo"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("a_hi"),
        )
    )
    ivl_b = ivl.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("a_lo") / _IVL_W_US).cast("long"),
                (F.col("a_hi") / _IVL_W_US).cast("long"),
            )
        ),
    )
    win = spark.createDataFrame(
        list(_IVL_WINDOWS), "incident_id string, lo string, hi string"
    ).select(
        "incident_id",
        F.unix_micros(F.to_timestamp("lo")).alias("b_lo"),
        F.unix_micros(F.to_timestamp("hi")).alias("b_hi"),
    )
    win_b = win.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("b_lo") / _IVL_W_US).cast("long"),
                (F.col("b_hi") / _IVL_W_US).cast("long"),
            )
        ),
    )
    joined = ivl_b.join(
        F.broadcast(win_b),
        (ivl_b["bucket"] == win_b["bucket"])
        & (F.col("a_lo") <= F.col("b_hi"))
        & (F.col("b_lo") <= F.col("a_hi"))
        & (
            ivl_b["bucket"]
            == (F.greatest(F.col("a_lo"), F.col("b_lo")) / _IVL_W_US).cast("long")
        ),
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


# --- fuzzy entity-resolution join (blocking + edit distance) ----------


@register(
    "join_fuzzy_levenshtein",
    oracle="""
    WITH dirty AS (
      SELECT p_partkey AS dirty_id,
             substring(p_name, 1, 2) || substring(p_name, 4) AS dirty_name
      FROM part),
    clean AS (SELECT p_partkey, p_name FROM part),
    cand AS (
      SELECT d.dirty_id, d.dirty_name, c.p_partkey, c.p_name,
             CAST(levenshtein(d.dirty_name, c.p_name) AS BIGINT) AS distance
      FROM dirty d JOIN clean c
        ON substring(d.dirty_name, 1, 2) = substring(c.p_name, 1, 2)
       AND levenshtein(d.dirty_name, c.p_name) <= 1)
    SELECT dirty_id, dirty_name,
           p_partkey AS match_partkey, p_name AS match_name, distance
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY dirty_id
                 ORDER BY distance, p_name NULLS FIRST, p_partkey NULLS FIRST) AS rk
      FROM cand) t
    WHERE rk = 1
    """,
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-resolution join — dirty strings (each part name
    with its 3rd character deleted, a deterministic stand-in for typo
    / OCR / feed corruption) matched back to the clean catalog by
    blocking + edit-distance residual, keeping the best match per
    dirty record (min distance, total tiebreak).

    The blocking key (first two characters, chosen to survive the
    corruption model) turns the quadratic all-pairs distance
    computation into a hash equi-join: levenshtein runs only inside
    blocks. That is THE entity-resolution scale pattern — at 100 TB
    the block key comes from phonetic codes / prefixes / LSH and the
    residual metric swaps freely (levenshtein here, jaccard or
    jaro-winkler in production) without changing the plan.

    Levenshtein's definition is engine-independent (unit-cost edit
    distance), so distances — and therefore the kept matches — are
    oracle-exact.
    """
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part")
    # OPTIMIZATION_r13, three changes, value-identical join result:
    # (a) a LENGTH-BAND prefilter |len(d)-len(c)| <= 1 — a necessary
    #     condition for distance <= 1 (each edit changes length by at
    #     most 1), evaluated before any DP matrix, pruning most
    #     block-mates with one integer compare;
    # (b) the THRESHOLD form levenshtein(d, c, 1): banded early-abandon
    #     DP — O(len · threshold) instead of O(len²) — returning the
    #     exact distance when <= 1 and -1 past the threshold, so
    #     `>= 0` keeps exactly the rows `<= 1` kept and `distance`
    #     carries the identical value for every kept row;
    # (c) scan_parallel on the dirty (stream) side: part broadcasts,
    #     so every block's levenshtein work ran in the ONE scan task
    #     the single-row-group input plans.
    # A/B at sf0.1: 46.5 s -> 2.97 s (isolated median-of-5 on the
    # final tree; an earlier mid-round A/B read 0.6 s but does not
    # reproduce — the remaining cost is the banded levenshtein over
    # block pairs that survive the length band, which is the
    # residual's real work). The blocking equi-join shape — the key's
    # documented point — is unchanged; plan pin
    # test_fuzzy_join_blocks_to_hash_join still holds.
    dirty = scan_parallel(p, "p_partkey").select(
        F.col("p_partkey").alias("dirty_id"),
        F.concat(
            F.substring("p_name", 1, 2), F.expr("substring(p_name, 4)")
        ).alias("dirty_name"),
    )
    clean = p.select("p_partkey", "p_name")
    dist = F.levenshtein("dirty_name", "p_name", 1)
    cand = dirty.join(
        clean,
        (F.substring("dirty_name", 1, 2) == F.substring("p_name", 1, 2))
        & (
            (F.length("dirty_name") - F.length("p_name")).between(-1, 1)
        )
        & (dist >= 0),
    ).select(
        "dirty_id", "dirty_name", "p_partkey", "p_name",
        dist.cast("bigint").alias("distance"),
    )
    w = Window.partitionBy("dirty_id").orderBy("distance", "p_name", "p_partkey")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "dirty_id", "dirty_name",
            F.col("p_partkey").alias("match_partkey"),
            F.col("p_name").alias("match_name"),
            "distance",
        )
    )


# --- explicit bloom-prefiltered semi join -----------------------------

_BLOOM_WORDS = 4096             # bitmap = 4096 longs = 2^18 bits
_BLOOM_BITS = _BLOOM_WORDS * 64
_BLOOM_SEEDS = (1, 2, 3, 4)     # k = 4 hash probes


def _bloom_positions(key) -> list:
    """The k bit positions for a key column: pmod(xxhash64(key, seed),
    M). Identical expression on build and probe sides."""
    return [
        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(_BLOOM_BITS)) for s in _BLOOM_SEEDS
    ]


@register(
    "join_bloom_prefilter",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           {sql_dsum('l.l_extendedprice')} AS sum_price
    FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with an EXPLICIT bloom prefilter on the probe side —
    the hand-built version of Spark's InjectRuntimeFilter, for the
    cases the optimizer can't inject one (a streaming probe side, a
    build side produced outside this query, a reusable persisted
    filter). Spark doesn't expose bloom_filter_agg as a SQL function,
    so the sketch is built from built-ins: each build key sets k=4
    bits (seeded xxhash64 -> pmod) in a 2^18-bit bitmap aggregated as
    bit_or over 64-bit words — at most {_BLOOM_WORDS} counter rows
    reach the driver, and the bitmap ships back as a plan literal
    (~32 KB, i.e. broadcast). The probe side tests all 4 bits JVM-side
    (element_at + shiftright, fused into the scan) BEFORE the join's
    exchange, and the exact semi join then removes the bloom's false
    positives — so the result EXACTLY equals the plain semi join the
    oracle states; the bloom can only change bytes moved, never the
    answer. At 100 TB the pre-shuffle drop is the difference between
    exchanging the corpus and exchanging the ~few-% that can match.
    Conservativeness (bloom pass-count >= true match count) and the
    realized false-positive rate are pinned in tests."""
    pre, o = bloom_prefiltered_probe(spark, sf_dir)
    return pre.join(
        o.select("o_orderkey"),
        pre["l_orderkey"] == F.col("o_orderkey"),
        "left_semi",
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum("l_extendedprice").alias("sum_price"),
    )


def bloom_prefiltered_probe(spark: SparkSession, sf_dir: str):
    """The two stages of join_bloom_prefilter before the exact join:
    (bloom-prefiltered lineitem, filtered orders build side) — exposed
    so tests can measure the pass-set directly."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    word_rows = (
        o.select(F.explode(F.array(*_bloom_positions(F.col("o_orderkey")))).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            # SQL shiftleft takes a column shift amount; the Python
            # helper F.shiftleft requires a literal int
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
        .collect()
    )
    words = [0] * _BLOOM_WORDS
    for r in word_rows:
        words[int(r["w"])] = int(r["bits"])

    li = load_table(spark, sf_dir, "lineitem")
    if not word_rows:
        pre = li.where(F.lit(False))  # empty build side: nothing can match
    else:
        # ONE py4j call for the whole bitmap literal (OPTIMIZATION_r13):
        # the previous F.array(*[F.lit(w) for w in words]) made 4096+
        # driver round trips just to CONSTRUCT the expression —
        # measured 54 s of pure py4j latency per invocation (guide §5:
        # the driver should do almost no work; this was neither compute
        # nor I/O, just chat). One F.expr over a rendered array literal
        # builds the identical Literal-array expression JVM-side in
        # ~8 ms; plan and results are byte-identical.
        arr = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
        tests = []
        for pos in _bloom_positions(F.col("l_orderkey")):
            word = F.element_at(arr, (pos / 64).cast("int") + 1)
            # call_function: SQL shiftright takes a COLUMN shift amount
            # (the Python helper F.shiftright only takes a literal int)
            tests.append(
                (
                    F.call_function(
                        "shiftright", word, (pos % 64).cast("int")
                    ).bitwiseAND(F.lit(1))
                )
                == 1
            )
        keep = tests[0]
        for t in tests[1:]:
            keep = keep & t
        pre = li.where(F.col("l_orderkey").isNotNull() & keep)
    return pre, o
