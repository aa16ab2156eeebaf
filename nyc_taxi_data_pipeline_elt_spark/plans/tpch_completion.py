"""TPC-H completion battery: the five archetypes the corpus did not yet
cover — correlated-min sourcing (Q2), multi-dimension profit rollup (Q9),
top-k revenue-loss reporting (Q10), view-over-aggregate + global-max
threshold (Q15), and distinct-count with an exclusion anti-join (Q16).

With these, every one of the 22 TPC-H query archetypes has a
representative in the engine (Q1 pricing_summary, Q2 here, Q3
shipping_priority_topk, Q4 late_shipment_priorities, Q5
revenue_by_nation, Q6 forecast_revenue, Q7 nation_trade_volume, Q8
nation_market_share, Q9/Q10 here, Q11 valuable_parts, Q12
priority_lines_by_flag, Q13 customer_order_distribution, Q14
promo_revenue_share, Q15/Q16 here, Q17 small_qty_part_revenue, Q18
large_volume_orders, Q19 disjunctive_part_revenue, Q20
overstocked_suppliers, Q21 lone_fault_suppliers, Q22 big_spender_loners).

The fixture has no ``partsupp`` table, so the sourcing queries (Q2, Q9,
Q16) derive the part-supplier relation from lineitem — the observed
(l_partkey, l_suppkey) pairs are the offers, the observed unit price
``l_extendedprice / l_quantity`` is the supply cost, and a 10% share of
``p_retailprice`` stands in for ``ps_supplycost`` in the profit rollup.
Semantics (correlated min, exclusion NOT IN, distinct-count grouping)
are unchanged.

Scale notes (same contract as plans/subqueries.py):
- part/supplier/nation/region sides are broadcast after their filters;
  the lineitem/orders spine stays a shuffle join for AQE
- the Q15 global max is a 1-row aggregate broadcast-cross-joined, never
  collected — the plan runs unchanged on a cluster
- money totals are exact DECIMAL sums before the output rounding, so
  threshold equality (Q15) and top-k ordering (Q10) are deterministic
  cross-engine; the Q2 unit cost is a raw IEEE-754 double division,
  bit-identical on both engines, compared exactly (no epsilon)

Reference parity note: the reference repo (src/process_data_glue.py,
src/reporting_etl_job.py) runs only grouped averages; this battery is
part of the engine's §2.7/§2.5b extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.plans.subqueries import _REV_DEC_SQL, _rev_dec
from nyc_taxi_data_pipeline_elt_spark.session import tune
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table


# --- TPC-H Q2 shape: correlated-min sourcing ---------------------------------
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every STANDARD part of size 10-20, the EUROPE supplier(s)
    offering it at the minimum observed unit price.

    Q2's correlated scalar subquery (``ps_supplycost = (SELECT min ...)``)
    is planned here as: offers = min unit price per (part, supplier);
    part minimum = a window min over p_partkey; keep offers equal to
    their part minimum. One hash aggregate plus one window exchange —
    Catalyst's decorrelation of the subquery form computes the offers
    frame twice and joins; the direct form halves the exchanges.
    Unit price is a raw double division: IEEE-754 makes it
    bit-identical on any engine, so the min-equality is exact without
    rounding.

    100-TB: the filtered part side (1/30 of a dimension) and the
    EUROPE supplier side are broadcast; lineitem is scanned once with
    both the part and supplier semi-filters pushed into the scan-side
    join, then aggregated on (l_partkey, l_suppkey) — one shuffle,
    partition count = AQE's choice."""
    tune(spark)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supplier = load_table(spark, sf_dir, "supplier")
    euro_supp = F.broadcast(
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region), nation.n_regionkey == region.r_regionkey
                )
            ),
            supplier.s_nationkey == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    offers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(euro_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    # per-part min as a window over the (already tiny) offers frame:
    # one p_partkey exchange instead of the groupBy+self-join shape's
    # two extra exchanges — same correlated-min semantics
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            # raw double, NOT rounded: the division is bit-identical on
            # both engines, but round(double, 4) is not (half-ulp ties
            # resolve differently engine-to-engine)
            "unit_cost",
        )
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


MIN_COST_SUPPLIER_ORACLE = """
WITH offers AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
    AND r_name = 'EUROPE' AND l_quantity > 0
  GROUP BY p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM offers o
WHERE unit_cost = (SELECT min(unit_cost) FROM offers i
                   WHERE i.p_partkey = o.p_partkey)
ORDER BY s_acctbal DESC, s_name, p_partkey
LIMIT 100
"""


# --- TPC-H Q9 shape: multi-dimension profit rollup ---------------------------
def nation_profit_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on red parts by supplier nation and order year.

    Q9's five-way join (lineitem x orders x supplier x part x nation)
    with ``ps_supplycost`` replaced by a 10% share of p_retailprice
    (no partsupp in the fixture). Profit per line =
    extendedprice*(1-discount) - 0.1*retailprice*quantity, computed in
    exact DECIMAL so the grouped sums are order-independent and
    cross-engine identical; rounding happens once at output.

    100-TB: part (name-filtered) and supplier+nation are broadcast; the
    lineitem-orders join is the only big shuffle, and the p_name filter
    semi-joins lineitem down before it."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp_nation = F.broadcast(
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    cost = (
        F.col("l_quantity").cast("decimal(12,2)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit("0.1").cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(_rev_dec() - cost), 2).cast("double").alias("profit"),
            F.count("*").alias("n_lines"),
        )
    )


NATION_PROFIT_ORACLE = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(round(sum({_REV_DEC_SQL}
                      - CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(p_retailprice AS DECIMAL(12,2))
                        * CAST(0.1 AS DECIMAL(2,1))), 2) AS DOUBLE) AS profit,
       count(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


# --- TPC-H Q10 shape: top-k revenue-loss reporting ---------------------------
def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 customers who returned the most revenue in 1997Q1.

    Q10: returned lineitems (l_returnflag = 'R') of orders placed in
    the quarter, revenue summed per customer, top 20. Revenue is an
    exact DECIMAL sum so the top-k ordering is deterministic; ties
    break on c_custkey. The final sort is a TakeOrderedAndProject —
    only 20 rows ever leave the executors.

    100-TB: the orderdate window prunes orders at the scan; the
    customer+nation side is broadcast; one shuffle for the grouped sum."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust_nation = F.broadcast(
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "c_acctbal", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_nation, orders.o_custkey == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_rev_dec()).alias("rev_exact"),
            F.count("*").alias("n_returned_lines"),
        )
        .orderBy(F.col("rev_exact").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "n_name",
            F.col("rev_exact").cast("double").alias("revenue_lost"),
            "n_returned_lines",
        )
    )


RETURNED_LOSSES_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(rev_exact AS DOUBLE) AS revenue_lost,
       n_returned_lines
FROM (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         sum({_REV_DEC_SQL}) AS rev_exact,
         count(*) AS n_returned_lines
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1997-04-01'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
) t
ORDER BY rev_exact DESC, c_custkey
LIMIT 20
"""


# --- TPC-H Q15 shape: revenue view + global-max threshold --------------------
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum shipped revenue in 1996Q1.

    Q15's CREATE VIEW + ``total_revenue = (SELECT max ...)``: the view
    is a grouped DECIMAL sum per supplier; the max is a 1-row aggregate
    of that frame, broadcast-cross-joined back (the house never-collect
    scalar pattern — plans/subqueries.py module notes), and the
    equality compares exact decimals, so "the" max supplier is stable
    no matter the summation order.

    100-TB: one shuffle for the per-supplier sum; the threshold side is
    1 row; supplier names arrive by broadcast join at the end."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(F.sum(_rev_dec()).alias("total_rev"))
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


TOP_REVENUE_SUPPLIER_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, sum({_REV_DEC_SQL}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(round(total_rev, 2) AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


# --- TPC-H Q16 shape: distinct-count grouping + exclusion anti-join ----------
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers ship each (brand, type, size) part
    class — excluding one brand, one type, and suppliers in arrears.

    Q16: the part-supplier relation (derived from lineitem — the
    fixture has no partsupp), with the ``NOT IN (complaint suppliers)``
    exclusion planned as a broadcast anti-join on a negative-balance
    supplier set (the fixture's stand-in for complaints) and a
    count(DISTINCT supplier) per part class.

    100-TB: part (brand/type/size-filtered) is broadcast into the
    lineitem scan, the exclusion set is a tiny broadcast anti-join, and
    the distinct-count is one partial-aggregated shuffle on the
    (brand, type, size, suppkey) expansion."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    complaints = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(complaints),
            li.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


PART_SUPPLIER_VARIETY_ORACLE = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


QUERIES = {
    "min_cost_supplier_per_part": min_cost_supplier_per_part,
    "nation_profit_by_year": nation_profit_by_year,
    "returned_item_losses": returned_item_losses,
    "top_revenue_suppliers": top_revenue_suppliers,
    "part_supplier_variety": part_supplier_variety,
}

ORACLE = {
    "min_cost_supplier_per_part": MIN_COST_SUPPLIER_ORACLE,
    "nation_profit_by_year": NATION_PROFIT_ORACLE,
    "returned_item_losses": RETURNED_LOSSES_ORACLE,
    "top_revenue_suppliers": TOP_REVENUE_SUPPLIER_ORACLE,
    "part_supplier_variety": PART_SUPPLIER_VARIETY_ORACLE,
}
