"""Subquery / predicate-shape corpus: the TPC-H query archetypes the rest
of the extension corpus doesn't yet cover — disjunctive multi-table
predicates (Q19), multi-EXISTS correlation (Q21), scalar-subquery
threshold + anti-join (Q22), correlated scalar subqueries (Q17), ratio
aggregates (Q8), CASE-counting joins (Q12), HAVING against a global
scalar (Q11), and nested-IN semi-join chains (Q20).

The reference performs none of these (its two queries are plain grouped
averages — SURVEY.md §2.4), but every one is table-stakes for an engine
claiming its query surface: they exercise Catalyst's decorrelation,
disjunction extraction, and semi/anti-join planning paths.

Scale notes:
- every dimension side (part, supplier, customer, nation, region — all
  sublinear or bounded) is broadcast; the lineitem/orders spine stays a
  shuffle join for AQE to plan as sort-merge at 100 TB
- global scalar thresholds (Q11/Q20/Q22) are computed as 1-row aggregate
  DataFrames and broadcast-cross-joined — never ``.collect()`` into the
  driver plan, so the same plan runs unchanged on a cluster
- money sums go through DECIMAL(18,2) before rounding (cross-engine
  half-cent determinism — the nation_trade_volume lesson); count/CASE
  aggregates and integer-cents arithmetic are exact by construction
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.session import tune
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

# Exact revenue term (see analytics.nation_trade_volume for the rationale:
# double round is engine-dependent at half-cent ties; decimal sums are not).
# Built per-call: Column construction needs an active SparkContext, and
# plan modules must import bare (test collection, driver import order).
def _rev_dec():
    # Tight precisions keep the product at decimal(17,4) — long-backed in
    # Spark (<= 18 digits), measured ~20% faster than the decimal(38,4)
    # the 18,2 casts produced. Exact decimal arithmetic is exact at ANY
    # sufficient width on both engines, so the oracle need not mirror the
    # widths, only the values (price < 1e10, discount < 1e2 — no overflow).
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
_REV_DEC_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


# --- TPC-H Q19 shape: disjunctive OR-of-ANDs predicate over a join ----------
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three brand/size/quantity bands OR-ed together.

    The disjunction spans both join sides (part attrs AND lineitem
    quantity), so a naive plan evaluates it post-join; Catalyst extracts
    the common conjuncts (the quantity/size hull) below the join and
    leaves the residual OR as the join filter — with part broadcast, the
    whole predicate runs map-side at any scale."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    band = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(
            F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


DISJUNCTIVE_PART_ORACLE = f"""
SELECT CAST(round(sum({_REV_DEC_SQL}), 2) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# --- TPC-H Q21 shape: EXISTS + NOT EXISTS correlation -----------------------
def lone_fault_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY supplier with returned lines in a
    multi-supplier order, counted per supplier (Q21's "numwait" shape,
    keyed on returnflag since the fixture has no receipt dates).

    The two correlated quantifiers (EXISTS another-supplier line; NOT
    EXISTS another-supplier *returned* line) collapse into one grouped
    pass over (order, supplier): n_suppliers > 1 AND n_returning == 1 —
    the aggregation form Catalyst would decorrelate toward, written
    directly so the fact table is scanned once, not three times."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("returned")
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("returned").alias("n_ret_supp"),
    )
    fault = (
        per_os.filter(F.col("returned") == 1)
        .join(
            per_o.filter((F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)),
            "l_orderkey",
        )
    )
    return (
        fault.join(F.broadcast(supplier), fault.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("n_orders"))
    )


LONE_FAULT_ORACLE = """
SELECT s_name, count(*) AS n_orders
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R') l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
GROUP BY s_name
"""


# --- TPC-H Q22 shape: scalar-subquery threshold + anti-join -----------------
def big_spender_loners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average (positive-balance) account balances
    and no orders since 2000, rolled up per market segment (Q22's
    "dormant high-balance accounts" semantics, date-scoped because the
    fixture's customers nearly all have *some* order).

    The global threshold is a 1-row aggregate broadcast into the filter
    (never collected), and "no recent orders" is a left-anti join over
    date-filtered orders — at scale the anti-join is a shuffle hash semi
    over o_custkey with the date filter pushed to the scan. All
    arithmetic runs in integer cents: balances have exactly 2 decimals,
    so the mean comparison ``cents * n > total`` is exact in both
    engines (no FP summation-order or division rounding anywhere)."""
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    cust = customer.withColumn(
        "cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    thresh = F.broadcast(
        cust.filter(F.col("c_acctbal") > 0).agg(
            F.count("*").alias("n_pos"),
            F.sum("cents").alias("total_pos_cents"),
        )
    )
    return (
        cust.crossJoin(thresh)
        .filter(F.col("cents") * F.col("n_pos") > F.col("total_pos_cents"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("cents") / 100.0, 2).alias("total_acctbal"),
        )
    )


BIG_SPENDER_ORACLE = """
WITH cust AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
), thresh AS (
  SELECT count(*) AS n_pos, sum(cents) AS total_pos_cents
  FROM cust WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS n_customers,
       round(sum(cents) / 100.0, 2) AS total_acctbal
FROM cust, thresh
WHERE cents * n_pos > total_pos_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


# --- TPC-H Q17 shape: correlated scalar subquery ----------------------------
def small_qty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from lineitems ordering less than 20% of their part's
    average quantity, for one brand.

    Deliberately written as SQL with the *correlated* scalar subquery so
    Catalyst's DecorrelateInnerQuery path is exercised (the physical plan
    it produces is the per-part aggregate + join a hand-decorrelated
    DataFrame would build). Quantities are integer-valued doubles, so
    ``avg`` is exact in both engines and the 0.2x comparison can't
    straddle an FP boundary; revenue goes through the decimal path."""
    tune(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(SMALL_QTY_ORACLE)


SMALL_QTY_ORACLE = f"""
SELECT CAST(round(sum({_REV_DEC_SQL}), 2) AS DOUBLE) AS total_revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
"""


# --- TPC-H Q8 shape: conditional-ratio aggregate ----------------------------
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3 suppliers' share of revenue sold into AMERICA customers,
    per order year. Numerator and denominator are exact decimal sums cast
    to double, so the quotient is bit-identical cross-engine; the share
    is rounded at 6dp on a O(0..1) value."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_america = F.broadcast(
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    supp_nation = F.broadcast(
        supplier.join(nation, supplier.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    # revenue is projected ONCE per row; referenced twice in the aggregate
    # as a plain attribute (CollapseProject won't re-inline a non-cheap
    # expression used twice), halving the per-row decimal multiplies
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_america, orders.o_custkey == cust_america.c_custkey)
        .join(supp_nation, li.l_suppkey == supp_nation.s_suppkey)
        .select(
            F.year("o_orderdate").alias("order_year"),
            "supp_nation",
            _rev_dec().alias("rev"),
        )
        .groupBy("order_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("rev"))
                  .otherwise(F.lit(0).cast("decimal(17,4)"))).alias("num"),
            F.sum("rev").alias("den"),
        )
    )
    return agg.select(
        "order_year",
        F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6)
        .alias("mkt_share"),
        F.round(F.col("den"), 2).cast("double").alias("total_revenue"),
    )


MARKET_SHARE_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       round(CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN {_REV_DEC_SQL}
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum({_REV_DEC_SQL}) AS DOUBLE), 6) AS mkt_share,
       CAST(round(sum({_REV_DEC_SQL}), 2) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = 'AMERICA'
GROUP BY 1
"""


# --- TPC-H Q12 shape: CASE-counting join aggregate --------------------------
def priority_lines_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per returnflag, how many lines belong to urgent/high-priority vs
    other orders — the two-sided CASE-count aggregate over a fact-fact
    join (all-integer outputs, exact everywhere)."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(is_high.cast("long")).alias("high_line_count"),
            F.sum((~is_high).cast("long")).alias("low_line_count"),
        )
    )


PRIORITY_LINES_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


# --- TPC-H Q11 shape: HAVING against a global scalar ------------------------
def valuable_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped revenue exceeds 0.05% of total shipped
    revenue. The global total is a 1-row broadcast aggregate; both sides
    of the comparison derive from exact decimal sums, so the > is
    deterministic cross-engine."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum(_rev_dec()).alias("value_dec"))
    total = F.broadcast(per_part.agg(F.sum("value_dec").alias("total_dec")))
    return (
        per_part.crossJoin(total)
        .filter(
            F.col("value_dec").cast("double")
            > 0.0005 * F.col("total_dec").cast("double")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("value_dec"), 2).cast("double").alias("part_value"),
        )
    )


VALUABLE_PARTS_ORACLE = f"""
WITH per_part AS (
  SELECT l_partkey AS partkey, sum({_REV_DEC_SQL}) AS value_dec
  FROM lineitem GROUP BY 1
)
SELECT partkey, CAST(round(value_dec, 2) AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(value_dec AS DOUBLE)
      > 0.0005 * (SELECT CAST(sum(value_dec) AS DOUBLE) FROM per_part)
"""


# --- TPC-H Q20 shape: nested-IN semi-join chain -----------------------------
def overstocked_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped an above-threshold quantity of some PROMO
    part: IN (grouped HAVING subquery) IN (dimension subquery), resolved
    as broadcast semi-joins. The threshold (1.2x global average line
    quantity) is exact: quantities are integer-valued doubles."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    promo_parts = F.broadcast(
        part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    thresh = F.broadcast(li.agg((1.2 * F.avg("l_quantity")).alias("qty_thresh")))
    heavy = (
        li.join(promo_parts, li.l_partkey == promo_parts.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .crossJoin(thresh)
        .filter(F.col("sum_qty") > F.col("qty_thresh"))
    )
    per_supp = heavy.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_heavy_parts")
    )
    return (
        per_supp.join(
            F.broadcast(supplier), per_supp.l_suppkey == supplier.s_suppkey
        )
        .select("s_name", "n_heavy_parts")
    )


OVERSTOCKED_ORACLE = """
WITH heavy AS (
  SELECT l_suppkey, l_partkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > (SELECT 1.2 * avg(l_quantity) FROM lineitem)
)
SELECT s_name, CAST(count(*) AS BIGINT) AS n_heavy_parts
FROM heavy JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
"""


# --- Q4: correlated EXISTS behind a grouped count ----------------------------
def late_shipment_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4's shape adapted to the fixture columns (no commitdate/
    receiptdate): orders counted per priority when at least one line
    shipped after the order date. The correlated EXISTS decorrelates to
    a left-semi join on the orderkey — the orders spine is scanned once
    and the semi side never duplicates matches."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        lineitem,
        (orders.o_orderkey == lineitem.l_orderkey)
        & (lineitem.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


LATE_SHIPMENT_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o.o_orderkey AND l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority
"""


# --- Q13: outer-join count distribution (count of counts) --------------------
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed exactly N orders — the
    outer-join histogram (customers with zero orders must appear in the
    0 bucket, so the join is LEFT OUTER and the count counts the
    nullable side's key, not '*'). Two hash aggregations; the second
    runs on the customer-sized aggregate."""
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


CUSTOMER_DISTRIBUTION_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# --- Q18: IN over a grouped HAVING, joined back and top-k --------------------
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total line quantity exceeds a threshold,
    with their customer — the semi-join-on-grouped-HAVING shape, ranked
    by price. The heavy-order key set is orders-sized after its
    aggregate; the final top-k is TakeOrderedAndProject. Quantities are
    integral doubles, so the sums are FP-exact and cast losslessly."""
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    heavy = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("sum_qty").cast("long").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


LARGE_ORDERS_ORACLE = """
SELECT c_name, o_orderkey, o_totalprice,
       CAST(sum_qty AS BIGINT) AS sum_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
) heavy ON o_orderkey = heavy.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


QUERIES = {
    "disjunctive_part_revenue": disjunctive_part_revenue,
    "lone_fault_suppliers": lone_fault_suppliers,
    "big_spender_loners": big_spender_loners,
    "small_qty_part_revenue": small_qty_part_revenue,
    "nation_market_share": nation_market_share,
    "priority_lines_by_flag": priority_lines_by_flag,
    "valuable_parts": valuable_parts,
    "overstocked_suppliers": overstocked_suppliers,
    "late_shipment_priorities": late_shipment_priorities,
    "customer_order_distribution": customer_order_distribution,
    "large_volume_orders": large_volume_orders,
}

ORACLE = {
    "disjunctive_part_revenue": DISJUNCTIVE_PART_ORACLE,
    "lone_fault_suppliers": LONE_FAULT_ORACLE,
    "big_spender_loners": BIG_SPENDER_ORACLE,
    "small_qty_part_revenue": SMALL_QTY_ORACLE,
    "nation_market_share": MARKET_SHARE_ORACLE,
    "priority_lines_by_flag": PRIORITY_LINES_ORACLE,
    "valuable_parts": VALUABLE_PARTS_ORACLE,
    "overstocked_suppliers": OVERSTOCKED_ORACLE,
    "late_shipment_priorities": LATE_SHIPMENT_ORACLE,
    "customer_order_distribution": CUSTOMER_DISTRIBUTION_ORACLE,
    "large_volume_orders": LARGE_ORDERS_ORACLE,
}
