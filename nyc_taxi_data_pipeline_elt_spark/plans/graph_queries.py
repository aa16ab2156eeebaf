"""Graph-analytics queries: PageRank over the nation trade graph and
triangle counting over the near-dup pair graph.

Beyond-reference coverage (the reference has no graph surface): the
iterative-join workload (PageRank) and the multi-way self-join workload
(triangles), both expressed as DataFrame compositions with exact DuckDB
twins — PageRank's oracle is iteration-unrolled CTEs generated from the
same parameters, triangles compose the MinHash pair oracle and compare
an integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.operators import dedup as D
from nyc_taxi_data_pipeline_elt_spark.operators import graph as G
from nyc_taxi_data_pipeline_elt_spark.plans.trainingdata import _minhash_oracle
from nyc_taxi_data_pipeline_elt_spark.session import tune
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

# Edge list: cross-nation trade lanes weighted by lineitem count — the
# same 6-table snowflake as nation_trade_volume, collapsed to a 25-node
# weighted digraph. Kept as ONE shared SQL string so the Spark query and
# the oracle derive the same graph by construction.
_TRADE_EDGES_SQL = """
SELECT sn.n_name AS src, cn.n_name AS dst, count(*) AS w
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY 1, 2
"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp_nation = F.broadcast(
        supplier.join(nation, supplier.s_nationkey == nation.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("src")
        )
    )
    cust_nation = F.broadcast(
        customer.join(nation, customer.c_nationkey == nation.n_nationkey).select(
            "c_custkey", F.col("n_name").alias("dst")
        )
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(supp_nation, lineitem.l_suppkey == supp_nation.s_suppkey)
        .join(cust_nation, orders.o_custkey == cust_nation.c_custkey)
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )


# Exporters-only variant: suppliers in AFRICA are excluded, so the five
# African nations appear as import destinations (dst) but never as
# sources — genuine dangling nodes that exercise the dangling-mass
# redistribution path of :func:`operators.graph.pagerank`.
_EXPORT_EDGES_SQL = """
SELECT sn.n_name AS src, cn.n_name AS dst, count(*) AS w
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN region sr ON sn.n_regionkey = sr.r_regionkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name AND sr.r_name <> 'AFRICA'
GROUP BY 1, 2
"""


def _export_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supp_nation = F.broadcast(
        supplier.join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") != "AFRICA")
        .select("s_suppkey", F.col("n_name").alias("src"))
    )
    cust_nation = F.broadcast(
        customer.join(nation, customer.c_nationkey == nation.n_nationkey).select(
            "c_custkey", F.col("n_name").alias("dst")
        )
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(supp_nation, lineitem.l_suppkey == supp_nation.s_suppkey)
        .join(cust_nation, orders.o_custkey == cust_nation.c_custkey)
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )


def pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard-formulation PageRank (dangling mass redistributed
    uniformly each iteration) over the exporters-only trade graph.
    The per-iteration extra cost is one 1-row aggregate over the
    precomputed dangling-node set, broadcast back into the step — a
    constant-size addition regardless of graph scale."""
    tune(spark)
    edges = _export_edges(spark, sf_dir)
    return G.pagerank(edges, weight="w", dangling=True).select("node", "rank")


PAGERANK_DANGLING_ORACLE = G.pagerank_oracle_sql(
    _EXPORT_EDGES_SQL, weight="w", dangling=True
)


def pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation trade graph: which nation's
    suppliers sit most centrally in the flow of goods. 25 nodes at every
    SF (the dimension is bounded), so the per-iteration joins broadcast;
    the expensive part — building the edge list — is the same fact-fact
    join plan Catalyst already handles for nation_trade_volume."""
    tune(spark)
    edges = _trade_edges(spark, sf_dir)
    return G.pagerank(edges, weight="w").select("node", "rank")


PAGERANK_ORACLE = G.pagerank_oracle_sql(_TRADE_EDGES_SQL, weight="w")


def triangles_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the MinHash near-dup candidate graph — the
    cluster-cohesion signal (triangle-dense components are true dup
    clusters; sparse stars are often false positives of one hub doc)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs)
    return G.triangle_count(pairs)


TRIANGLES_ORACLE = f"""
WITH pairs AS ({_minhash_oracle()}),
e AS (
  SELECT least(doc_a, doc_b) AS lo, greatest(doc_a, doc_b) AS hi
  FROM pairs GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e ab
JOIN e bc ON ab.hi = bc.lo
JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi
"""


def nation_cheapest_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest path over the nation trade graph:
    cheapest way to route from NATION_12 within 4 hops
    (a nation with outgoing trade at every fixture scale), where an edge's
    cost is inversely tied to trade volume (busy lanes are cheap). Edge
    costs are exact integers (greatest(1, 10000 DIV w)), so path sums
    and the min are engine-independent; the fixed 4-round Bellman-Ford
    contract is what lets the DuckDB twin enumerate the same path space
    with a hop-bounded recursive CTE (operators/graph.py:bounded_sssp)."""
    tune(spark)
    edges = _trade_edges(spark, sf_dir).select(
        "src",
        "dst",
        F.greatest(F.lit(1), F.floor(F.lit(10000) / F.col("w"))).alias("cost"),
    )
    return G.bounded_sssp(edges, "NATION_12", rounds=4).select(
        F.col("node").alias("nation"), "min_cost"
    )


SSSP_ORACLE = f"""
WITH RECURSIVE trade AS ({_TRADE_EDGES_SQL}),
edges AS (
  SELECT src, dst, greatest(1, CAST(floor(10000 / w) AS BIGINT)) AS cost
  FROM trade
),
paths(node, cost, hops) AS (
  SELECT 'NATION_12', CAST(0 AS BIGINT), 0
  UNION ALL
  SELECT e.dst, p.cost + e.cost, p.hops + 1
  FROM paths p JOIN edges e ON e.src = p.node
  WHERE p.hops < 4
)
SELECT node AS nation, min(cost) AS min_cost
FROM paths GROUP BY node
"""


QUERIES = {
    "pagerank_nation_trade": pagerank_nation_trade,
    "pagerank_dangling": pagerank_dangling,
    "triangles_neardup": triangles_neardup,
    "nation_cheapest_route": nation_cheapest_route,
}

ORACLE = {
    "pagerank_nation_trade": PAGERANK_ORACLE,
    "pagerank_dangling": PAGERANK_DANGLING_ORACLE,
    "triangles_neardup": TRIANGLES_ORACLE,
    "nation_cheapest_route": SSSP_ORACLE,
}
