"""Iterative graph analytics: PageRank over the purchase graph.

Complements the min-label-propagation connected components in
`dedup.py` (dedup_cc_clusters) with a NUMERIC iterative algorithm —
the shape that stresses determinism hardest, because every iteration
sums floating-point contributions whose order Spark does not fix.
Contributions are therefore quantized to 1e-9 and accumulated as exact
integers (the `dsum` trick per iteration), so three full iterations
still hash-match the DuckDB oracle bit-for-bit.

Graph: the undirected customer<->supplier purchase graph (an edge per
distinct (customer, supplier) trading pair from orders x lineitem),
which has no dangling nodes, keeping the update rule to the textbook
  rank' = (1-d)/N + d * sum_in(rank/outdeg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..data import load_table
from ..plans.registry import register

_D = 0.85
_ITERS = 3
_Q = 1000000000.0  # contribution quantum: 1e-9


def _sql_iteration(i: int) -> str:
    return f"""
    c{i} AS (
      SELECT e.dst AS node,
             SUM(CAST(FLOOR(r.rank / d.outdeg * {_Q}) AS HUGEINT)) AS contrib
      FROM edges e
      JOIN r{i - 1} r ON r.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst),
    r{i} AS (
      SELECT n.node,
             {1 - _D} / (SELECT n FROM nn)
             + {_D} * (CAST(COALESCE(c.contrib, 0) AS DOUBLE) / {_Q}) AS rank
      FROM nodes n LEFT JOIN c{i} c ON c.node = n.node)
    """


_PR_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT 'c:' || o.o_custkey AS c, 's:' || l.l_suppkey AS s
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
{", ".join(_sql_iteration(i) for i in range(1, _ITERS + 1))}
SELECT node, rank FROM r{_ITERS}
"""


@register("graph_pagerank", oracle=_PR_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three PageRank iterations on the customer<->supplier purchase
    graph, deterministic cross-engine (see module docstring for the
    quantized-accumulation scheme).

    Scale shape: each iteration is one edges->ranks hash join plus one
    dst-keyed aggregate — the standard message-passing round. Edges
    and degrees are computed once and reused; ranks stay
    node-relation-sized. For iteration counts beyond a handful,
    localCheckpoint each round (as dedup_cc_clusters does) to keep
    lineage flat; three rounds stay a single Catalyst plan here so
    the whole run is one job.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("c"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
    n_nodes = nodes.count()  # O(1) driver scalar, same as the oracle's (SELECT n)
    if n_nodes == 0:
        # Empty graph (e.g. a date slice with no orders): the uniform
        # prior 1/n is undefined — return the empty rank relation with
        # the standard schema instead of dividing by zero.
        return nodes.select("node", F.lit(0.0).alias("rank"))
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n_nodes))).alias("rank"))
    for _ in range(_ITERS):
        contrib = (
            edges.join(ranks, ranks["node"] == edges["src"])
            .join(deg, deg["src"] == edges["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.floor(F.col("rank") / F.col("outdeg") * F.lit(_Q)).cast(
                        "decimal(38,0)"
                    )
                ).alias("contrib")
            )
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit((1 - _D) / float(n_nodes))
                + F.lit(_D)
                * (F.coalesce(F.col("contrib"), F.lit(0)).cast("double") / F.lit(_Q))
            ).alias("rank"),
        )
    return ranks


# --- degree distribution ----------------------------------------------


@register(
    "graph_degree_stats",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    deg AS (
      SELECT 'customer' AS node_type, c AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM pairs GROUP BY c
      UNION ALL
      SELECT 'supplier' AS node_type, s AS node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM pairs GROUP BY s)
    SELECT node_type, degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY node_type, degree
    ORDER BY node_type, degree
    """,
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer<->supplier purchase graph
    (how many customers trade with exactly k suppliers, and vice
    versa) — the first thing to measure before running anything
    iterative on a graph: it is the skew profile that decides whether
    PageRank/CC need hub splitting.

    Scale shape: one orders x lineitem join (the same edge derivation
    PageRank uses) collapsed by DISTINCT, then two tiny aggregation
    ladders — per-node degree, then nodes-per-degree; every shuffle
    after the edge join carries only ids and small ints.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(l, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg_c = pairs.groupBy(F.col("c").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    ).select(F.lit("customer").alias("node_type"), "node", "degree")
    deg_s = pairs.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    ).select(F.lit("supplier").alias("node_type"), "node", "degree")
    return (
        deg_c.unionByName(deg_s)
        .groupBy("node_type", "degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .orderBy("node_type", "degree")
    )


# --- common-neighbor scoring (link prediction / co-purchase) ----------

_CN_TOPK = 20


@register(
    "graph_common_neighbors",
    oracle=f"""
    WITH cs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    pairs AS (
      SELECT a.s AS supp_a, b.s AS supp_b,
             CAST(COUNT(*) AS BIGINT) AS common_customers
      FROM cs a JOIN cs b ON a.c = b.c AND a.s < b.s
      GROUP BY a.s, b.s)
    SELECT supp_a, supp_b, common_customers, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               ORDER BY common_customers DESC, supp_a, supp_b) AS rk
      FROM pairs) t
    WHERE rk <= {_CN_TOPK}
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor scoring on the bipartite purchase graph: the
    top supplier pairs ranked by shared customers — the
    link-prediction / "customers also bought from" computation, and
    the standard co-occurrence join behind recommendation candidate
    generation.

    Scale shape: the wedge join (a.c = b.c) is an equi-join on the
    customer key whose output is Σ deg(c)² over customers — THE
    skew-sensitive graph join. Defenses that keep it tractable at
    100 TB: per-customer distinct edges first (bounds deg by the
    catalog, not purchase volume), AQE skew-split on hub customers,
    and in production a deg-cap/sampling on hubs (documented, not
    needed at test SF). The final global top-k is
    TakeOrderedAndProject, never a full sort.
    """
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    cs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = cs.alias("a")
    b = cs.alias("b")
    pairs = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("supp_a"), F.col("b.s").alias("supp_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("common_customers"))
    )
    # Top-k as orderBy+limit so the plan is TakeOrderedAndProject
    # (per-partition heaps + driver merge of k rows), matching the
    # docstring — a row_number over an unpartitioned Window would
    # funnel every pair through one partition's sort (ADVICE r3). The
    # rank is derived AFTER the k-row cut, where a single-partition
    # window over k rows is free.
    topk = pairs.orderBy(
        F.col("common_customers").desc(), F.col("supp_a"), F.col("supp_b")
    ).limit(_CN_TOPK)
    w = Window.orderBy(
        F.col("common_customers").desc(), F.col("supp_a"), F.col("supp_b")
    )
    return topk.withColumn("rk", F.row_number().over(w).cast("bigint"))
