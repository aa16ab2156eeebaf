"""Extension query corpus: joins, windows, top-k, rollup, pivot, JSON,
sessionization (SURVEY.md §7.3 step 4).

The reference performs zero joins/windows (SURVEY.md §2.7-2.8) — fleet
unification is a union — but a complete engine needs them; these are the
TPC-H-style north-star queries over the fixture tables, each paired with
DuckDB oracle SQL.

Scale notes per plan shape:
- dimension joins put ``F.broadcast`` on the *bounded* sides (region,
  nation: 5/25 rows at every SF); fact-fact joins (orders x lineitem) are
  left to Catalyst/AQE — at 100 TB they become sort-merge with AQE skew
  splitting, which is the right physical plan
- window functions shuffle once on the partition key; every ORDER BY
  inside a window carries a unique tiebreak so results are deterministic
  for the oracle
- aggregates are rounded at 2dp on both sides (FP summation-order drift)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.operators import editdist as ED
from nyc_taxi_data_pipeline_elt_spark.operators import sampling as M
from nyc_taxi_data_pipeline_elt_spark.session import tune
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

_SHIP_CUTOFF = "1998-09-02"


# --- TPC-H Q1 shape: wide grouped aggregation -------------------------------
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_SHIP_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


PRICING_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       round(avg(l_discount), 2) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_SHIP_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


# --- TPC-H Q5 shape: star join with broadcast dimensions --------------------
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # region/nation are bounded (5/25 rows at any SF) -> explicit broadcast;
    # customer join is left to Catalyst/AQE (broadcastable at test SFs,
    # shuffle join at 100 TB).
    dim = F.broadcast(
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(dim, F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


REVENUE_BY_NATION_ORACLE = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# --- TPC-H Q3 shape: join + group + deterministic top-k ----------------------
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


SHIPPING_TOPK_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- semi / anti joins -------------------------------------------------------
def customers_without_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # anti-join against the 'P' slice: non-degenerate at every SF (a plain
    # "no orders at all" anti-join matches zero customers in this corpus)
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    partial = orders.filter(F.col("o_orderstatus") == "P")
    return customer.join(
        partial, customer.c_custkey == partial.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


ANTI_JOIN_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""


def customers_with_big_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 400000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_acctbal")


SEMI_JOIN_ORACLE = """
SELECT c_custkey, c_acctbal FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
"""


# --- window functions --------------------------------------------------------
def top3_lineitems_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
    )


WINDOW_TOPK_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         CAST(row_number() OVER (
           PARTITION BY l_suppkey
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         ) AS INTEGER) AS rn
  FROM lineitem
) WHERE rn <= 3
"""


def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


RUNNING_SUM_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 2) AS running_spend
FROM orders
"""


# --- SQL consumption surface (S10 + §2.6) ------------------------------------
# The reference's analytics client is PyAthena SQL with ORDER BY over the
# reporting tables (analysis/analytics_job.py:29-51); here the same report
# query runs as spark.sql over registered views — ordered output, global
# sort via a range-partitioned exchange.
def sql_consumption_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_pipeline_elt_spark.sources.catalog import (
        register_testdata_views,
    )

    register_testdata_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT concat_ws('-', CAST(year(o_orderdate) AS STRING),
                         lpad(CAST(month(o_orderdate) AS STRING), 2, '0'))
                 AS report_month,
               round(avg(o_totalprice), 2) AS avg_total_amount,
               count(*) AS n_orders
        FROM orders
        GROUP BY year(o_orderdate), month(o_orderdate)
        ORDER BY report_month
        """
    )


SQL_CONSUMPTION_ORACLE = """
SELECT concat_ws('-', CAST(year(o_orderdate) AS VARCHAR),
                 lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0')) AS report_month,
       round(avg(o_totalprice), 2) AS avg_total_amount,
       count(*) AS n_orders
FROM orders
GROUP BY year(o_orderdate), month(o_orderdate)
ORDER BY report_month
"""


# --- rollup / cube / distinct / pivot -----------------------------------------
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.count("*").alias("n_orders"),
    )


CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS sum_price,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def distinct_customers_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


DISTINCT_ORACLE = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


def orders_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_partial"),
        )
    )


PIVOT_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
FROM orders
GROUP BY o_orderpriority
"""


# --- TPC-H Q6 shape: pure filter + aggregate (date interval arithmetic) -------
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    start = F.lit("1996-01-01").cast("timestamp")
    return li.filter(
        (F.col("l_shipdate") >= start)
        & (F.col("l_shipdate") < F.expr("timestamp'1996-01-01' + interval 1 year"))
        & F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 20)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue_effect"
        ),
        F.count("*").alias("n_lines"),
    )


Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_effect,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01' + INTERVAL 1 YEAR
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 20
"""


# --- TPC-H Q12 shape: join + conditional (CASE) aggregation -------------------
def priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(urgent).alias("high_priority_lines"),
            F.sum(1 - urgent).alias("low_priority_lines"),
        )
    )


Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_priority_lines,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
         AS BIGINT) AS low_priority_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
"""


# --- TPC-H Q14 shape: join + LIKE + ratio of conditional sums -----------------
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return li.join(part, F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
        F.round(F.sum(rev), 2).alias("total_revenue"),
    )


Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --- percentiles (exact) --------------------------------------------------------
# Spark's percentile() and DuckDB's quantile_cont() share linear-
# interpolation semantics -> oracle-checkable. (approx_percentile /
# approx_count_distinct use engine-specific sketches and cannot hash-match
# by construction — use them at scale, verify with the exact twin.)
def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
        F.count("*").alias("n_orders"),
    )


PERCENTILE_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


# --- sketch-quality eval: approx_percentile rank-error bound ---------------------
def percentile_sketch_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acceptance gate for the KLL/GK quantile sketch — the analog of
    simsearch_recall_eval for ``approx_percentile``: at 100 TB the exact
    ``percentile`` (full sort per group) is off the table and the sketch
    is the production path, so PROVE its contract holds on this corpus.
    ``approx_percentile(x, p, acc)`` guarantees a returned value whose
    RANK lies within ``n/acc`` of ``p*n``. The sketch value itself is
    engine-specific (not oracle-comparable), so the query emits the
    exact percentile plus a Spark-side ``within_bound`` verdict: the
    sketch value's true rank (one conditional count over the scan,
    broadcast-scalar pattern) compared against the guaranteed window.
    The oracle expects every verdict TRUE with the exact values — a
    sketch regression flips a boolean and the hash."""
    tune(spark)
    acc = 100
    ps = [0.25, 0.5, 0.75, 0.95]
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count("*").alias("n"),
        *[
            F.expr(f"percentile(o_totalprice, {p})").alias(f"ex_{i}")
            for i, p in enumerate(ps)
        ],
        *[
            F.expr(
                f"approx_percentile(o_totalprice, {p}, {acc})"
            ).alias(f"ap_{i}")
            for i, p in enumerate(ps)
        ],
    )
    # true rank of each sketch value: conditional counts in ONE pass
    # over the scan, the 1-row agg broadcast onto it (never-collect)
    ranked = orders.crossJoin(F.broadcast(agg)).agg(
        F.first("n").alias("n"),
        *[F.first(f"ex_{i}").alias(f"ex_{i}") for i in range(len(ps))],
        *[
            F.sum(
                (F.col("o_totalprice") <= F.col(f"ap_{i}")).cast("long")
            ).alias(f"rk_{i}")
            for i in range(len(ps))
        ],
    )
    rows = [
        F.struct(
            F.lit(p).alias("p"),
            F.round(F.col(f"ex_{i}"), 2).alias("exact_value"),
            (
                F.abs(F.col(f"rk_{i}") - F.lit(p) * F.col("n"))
                <= F.col("n") / acc + 1
            ).alias("within_bound"),
        )
        for i, p in enumerate(ps)
    ]
    return (
        ranked.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.p", "r.exact_value", "r.within_bound")
    )


PERCENTILE_SKETCH_EVAL_ORACLE = """
WITH ex AS (
  SELECT quantile_cont(o_totalprice, 0.25) AS q25,
         quantile_cont(o_totalprice, 0.50) AS q50,
         quantile_cont(o_totalprice, 0.75) AS q75,
         quantile_cont(o_totalprice, 0.95) AS q95
  FROM orders
)
SELECT CAST(0.25 AS DOUBLE) AS p, round(q25, 2) AS exact_value, true AS within_bound FROM ex
UNION ALL SELECT CAST(0.5 AS DOUBLE), round(q50, 2), true FROM ex
UNION ALL SELECT CAST(0.75 AS DOUBLE), round(q75, 2), true FROM ex
UNION ALL SELECT CAST(0.95 AS DOUBLE), round(q95, 2), true FROM ex
"""


# --- skew-salted join ------------------------------------------------------------
# Same result as the plain join (salting is an internal repartitioning
# trick), so the oracle is the unsalted SQL.
def salted_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_pipeline_elt_spark.operators.skew import salted_join

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, customer, key="o_custkey", factor=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


SALTED_JOIN_ORACLE = """
SELECT c_mktsegment,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# --- as-of join ----------------------------------------------------------------
# For each lineitem, the customer's most recent order placed on or before
# the ship date — the canonical "most recent prior event" shape Spark has
# no native operator for (DuckDB does: ASOF JOIN, which is the oracle).
def lineitem_asof_prior_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_pipeline_elt_spark.operators.asof import asof_join

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    left = lineitem.join(
        orders.select("o_orderkey", F.col("o_custkey").alias("custkey")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select("custkey", "l_orderkey", "l_linenumber", "l_shipdate")
    # right side unique per (key, ts): keep the max orderkey per date
    right = orders.groupBy(
        F.col("o_custkey").alias("custkey"), "o_orderdate"
    ).agg(F.max("o_orderkey").alias("prior_orderkey"))
    return asof_join(
        left,
        right,
        key="custkey",
        left_ts="l_shipdate",
        right_ts="o_orderdate",
        payload=["prior_orderkey"],
    )


ASOF_ORACLE = """
WITH li AS (
  SELECT o_custkey AS custkey, l_orderkey, l_linenumber, l_shipdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), r AS (
  SELECT o_custkey AS custkey, o_orderdate, max(o_orderkey) AS prior_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT li.custkey, li.l_orderkey, li.l_linenumber, li.l_shipdate,
       r.prior_orderkey AS asof_prior_orderkey
FROM li ASOF LEFT JOIN r
  ON li.custkey = r.custkey AND li.l_shipdate >= r.o_orderdate
"""


# --- set operations (beyond the reference's union, §2.5) ----------------------
def repeat_high_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT: customers with an 'F' order AND an 'O' order,
    minus those who ever placed a 'P' order."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    cust = lambda st: orders.filter(F.col("o_orderstatus") == st).select(  # noqa: E731
        "o_custkey"
    )
    return cust("F").intersect(cust("O")).exceptAll(cust("P").distinct())


SETOPS_ORACLE = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


# --- range-frame window --------------------------------------------------------
def rolling_weekly_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer: total spend in the 7 days up to each order — a RANGE
    frame over an event-time ordering (value-based, not row-based)."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7 * 86400, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("weekly_spend"),
    )


RANGE_WINDOW_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
       ), 2) AS weekly_spend
FROM orders
"""


# --- distribution analytics: ntile / percent_rank / cume_dist -------------------
def order_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist over the whole table WITHOUT the
    single-task ``Window.orderBy(...)`` (the `WindowExec: No Partition
    Defined` 100 TB fail): global rank comes from the range-partition +
    broadcast-offset pattern (operators/indexing.py:with_global_index),
    and all three distribution functions are pure arithmetic on
    (rank, n):

    - ``percent_rank = (rank - 1) / (n - 1)`` — the ORDER BY key
      (o_totalprice, o_orderkey) is unique, so no peer-group term;
    - ``cume_dist = rank / n`` — ditto (every row is its own peer group);
    - ``ntile(10)``: the first ``n % 10`` buckets get ``n/10 + 1`` rows
      (Spark/ANSI semantics), derived from rank by closed form.

    n rides in as a broadcast one-row scalar (the histogram's pinned
    plan shape) — no collect, no global window; the only
    SinglePartition exchange is the O(partitions) offset side job, and
    n itself is summed from the SAME per-partition counts frame the
    offsets come from, so the data is scanned exactly once. The local
    rank comes from the monotonically_increasing_id bit layout
    (operators/indexing.py module docstring) — a narrow projection, so
    the range exchange is the plan's ONLY full-data shuffle."""
    from nyc_taxi_data_pipeline_elt_spark.operators.indexing import (
        _ranged_with_local,
        offsets_from_counts,
    )

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice")

    parts = max(spark.sparkContext.defaultParallelism, 8)
    body, counts = _ranged_with_local(
        base, ["o_totalprice", "o_orderkey"], parts
    )
    counts = counts.persist()
    offsets = offsets_from_counts(counts)
    n_df = counts.agg(F.sum("count").alias("__n"))  # O(partitions) rows
    idx = (
        body.join(F.broadcast(offsets), F.col("__pid") == F.col("__opid"))
        .withColumn("__idx", F.col("offset") + F.col("__local"))
        .drop("__pid", "__local", "__opid", "offset")
    )
    rank = F.col("__idx") + 1  # row_number, 1-based, unique total order
    k = 10
    q = (F.col("__n") / k).cast("long")  # base bucket size
    rem = F.col("__n") % k  # first `rem` buckets get one extra row
    big_span = rem * (q + 1)  # rows covered by the big buckets
    decile = (
        F.when(rank <= big_span, F.floor((rank - 1) / (q + 1)))
        .otherwise(rem + F.floor((rank - big_span - 1) / F.greatest(q, F.lit(1))))
        + 1
    )
    return (
        idx.crossJoin(F.broadcast(n_df))
        .select(
            "o_orderkey",
            decile.cast("int").alias("decile"),
            F.round(
                (rank - 1) / F.greatest(F.col("__n") - 1, F.lit(1)), 6
            ).alias("pct_rank"),
            F.round(rank / F.col("__n"), 6).alias("cume"),
        )
    )


DECILES_ORACLE = """
SELECT o_orderkey,
       CAST(ntile(10) OVER w AS INTEGER) AS decile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
"""


# --- statistical aggregates: corr / covar / stddev ------------------------------
def price_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_covar"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.var_samp("l_discount"), 6).alias("disc_var"),
    )


STATS_ORACLE = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) + 0.0 AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 2) + 0.0 AS qty_price_covar,
       round(stddev_samp(l_extendedprice), 2) AS price_stddev,
       round(var_samp(l_discount), 6) AS disc_var
FROM lineitem
GROUP BY l_returnflag
"""


# --- string similarity: levenshtein (brand-blocked, never all-pairs) ------------
def similar_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-matches within a blocking key (p_brand) — the
    entity-resolution shape. Routed per block by the measured
    segment-collision ratio (operators/editdist.py:levenshtein_join_auto):

    - PassJoin segment filter where it prunes (high-entropy names:
      near-zero collisions, candidates ~O(n) instead of O(n^2/blocks));
    - bounded-quadratic scan (banded-DP levenshtein with early exit)
      where it doesn't. THIS corpus lands there by measurement: part
      names draw ~5 words from a ~90-word vocabulary, so verbatim
      segments collide rampantly — 3.1M candidates vs 8.0M in-brand
      pairs at sf0.1 (ratio 0.39), and PassJoin's explode/join/dedup
      costs more than it saves (19s vs 5s).

    The dispatch stats are one linear agg producing O(#blocks) rows,
    broadcast back onto the data — so at 100x, blocks whose vocabulary
    diversifies flip to PassJoin automatically while dense blocks keep
    the scan; both branches are exact, so the result is
    route-independent."""
    tune(spark)
    part = load_table(spark, sf_dir, "part")
    out = ED.levenshtein_join_auto(
        part, "p_partkey", "p_name", "p_brand", tau=3
    )
    return out.select(
        "p_brand",
        F.col("key_a"),
        F.col("key_b"),
        "edit_dist",
    )


LEVENSHTEIN_ORACLE = """
SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


# --- grouping sets + grouping() flags -------------------------------------------
def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_pipeline_elt_spark.sources.catalog import (
        register_testdata_views,
    )

    register_testdata_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               round(sum(o_totalprice), 2) AS sum_price,
               every(o_totalprice >= 0) AS all_non_negative,
               any(o_totalprice > 400000) AS has_big_order
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
       CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
       round(sum(o_totalprice), 2) AS sum_price,
       bool_and(o_totalprice >= 0) AS all_non_negative,
       bool_or(o_totalprice > 400000) AS has_big_order
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- min_by / max_by (argmax aggregates) ----------------------------------------
def biggest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # argmax ordered by a UNIQUE column (o_orderkey) -> deterministic
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.expr("max_by(o_totalprice, o_orderkey)").alias("latest_order_price"),
        F.expr("min_by(o_totalprice, o_orderkey)").alias("first_order_price"),
        F.max("o_orderkey").alias("max_orderkey"),
    )


MINMAX_BY_ORACLE = """
SELECT o_custkey,
       arg_max(o_totalprice, o_orderkey) AS latest_order_price,
       arg_min(o_totalprice, o_orderkey) AS first_order_price,
       max(o_orderkey) AS max_orderkey
FROM orders
GROUP BY o_custkey
"""


# --- correlated scalar subquery (Catalyst decorrelation) ------------------------
def customer_max_order_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Catalyst rewrites the correlated scalar subquery into an aggregate +
    # left outer join — declaratively stated, decorrelated by the optimizer
    from nyc_taxi_data_pipeline_elt_spark.sources.catalog import (
        register_testdata_views,
    )

    register_testdata_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               (SELECT round(max(o_totalprice), 2) FROM orders
                WHERE o_custkey = c_custkey) AS max_order_price
        FROM customer
        """
    )


SCALAR_SUBQUERY_ORACLE = """
SELECT c_custkey, c_mktsegment,
       (SELECT round(max(o_totalprice), 2) FROM orders
        WHERE o_custkey = c_custkey) AS max_order_price
FROM customer
"""


# --- datetime feature extraction -------------------------------------------------
def order_date_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar feature derivation — the feature-engineering shape.
    Cross-engine trap handled: Spark dayofweek is 1=Sunday..7, DuckDB's is
    0=Sunday..6 (oracle adds 1)."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


DATE_FEATURES_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS y,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(month(o_orderdate) AS INTEGER) AS m,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
FROM orders
"""


# --- array function showcase ------------------------------------------------------
def token_array_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed column manipulation over tokenized text: size, sorted
    slice, membership, distinct count — all JVM array expressions."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), "\\s+")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.array_contains(toks, "spark").alias("mentions_spark"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), ",").alias(
            "first3_sorted"
        ),
    )


ARRAY_FEATURES_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_unique,
       list_contains(toks, 'spark') AS mentions_spark,
       array_to_string(list_sort(list_distinct(toks))[1:3], ',') AS first3_sorted
FROM t
"""


# --- unpivot / melt -------------------------------------------------------------
def status_counts_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot then unpivot back to long form — the wide->long reshaping
    operator (Spark 4 ``unpivot``)."""
    tune(spark)
    wide = orders_pivot_status(spark, sf_dir)
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_open", "n_filled", "n_partial"],
        variableColumnName="status_bucket",
        valueColumnName="n_orders",
    )


UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT o_orderpriority,
         count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
         count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'n_open' AS status_bucket, n_open AS n_orders FROM wide
UNION ALL
SELECT o_orderpriority, 'n_filled', n_filled FROM wide
UNION ALL
SELECT o_orderpriority, 'n_partial', n_partial FROM wide
"""


# --- sketch-quality eval: HyperLogLog++ error bound ------------------------------
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts — the sketch you actually run at
    100 TB (bounded memory, one pass, mergeable) — promoted from a
    rows-only row to an oracle-checked acceptance gate, the analog of
    ``percentile_sketch_eval`` for ``approx_count_distinct``: the sketch
    estimate itself is engine-specific and never leaves the plan;
    instead the query emits the EXACT distinct counts plus a
    within-3·rsd verdict per column (HLL++ at rsd=0.05 has ~rsd
    standard error, so 3·rsd is a deterministic-given-the-data bound
    with overwhelming margin; Spark's HLL hash is fixed, so the verdict
    is stable across runs). A sketch regression flips a boolean and the
    driver hash. The exact twins run in the same single agg — Spark
    plans the two distinct aggregates via one Expand over one scan.
    The approx-percentile counterpart is covered by
    ``percentile_sketch_eval``; the KMV counterpart by
    ``kmv_distinct_tokens``."""
    tune(spark)
    li = load_table(spark, sf_dir, "lineitem")
    rsd = 0.05
    agg = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", rsd).alias("ap_parts"),
        F.approx_count_distinct("l_orderkey", rsd).alias("ap_orders"),
    )
    bound = F.lit(3 * rsd)
    return agg.select(
        F.col("exact_parts"),
        F.col("exact_orders"),
        (
            F.abs(F.col("ap_parts") - F.col("exact_parts"))
            <= bound * F.col("exact_parts")
        ).alias("parts_within_3rsd"),
        (
            F.abs(F.col("ap_orders") - F.col("exact_orders"))
            <= bound * F.col("exact_orders")
        ).alias("orders_within_3rsd"),
    )


# ADVICE r7, documented failure mode: the oracle hardcodes TRUE for the
# within-3rsd verdicts, making this an ACCEPTANCE GATE on Spark's HLL
# sketch rather than an independent re-derivation of the bound (DuckDB's
# approx_count_distinct is a different HLL with different hash salt — its
# estimate says nothing about Spark's). Consequence: in the ~0.3% of
# (data, hash) combos where a correct HLL legitimately exceeds 3*rsd,
# the driver reports a hash-mismatch "correctness failure" that is
# really a sketch-quality signal — read a red row here as "re-check the
# sketch bound on this fixture", not "engine bug". On every shipped
# fixture (sf0.001/0.01/0.1) the verdicts are stably TRUE.
APPROX_DISTINCT_ORACLE = """
SELECT count(DISTINCT l_partkey) AS exact_parts,
       count(DISTINCT l_orderkey) AS exact_orders,
       TRUE AS parts_within_3rsd,
       TRUE AS orders_within_3rsd
FROM lineitem
"""


# --- JSON scalar extraction ---------------------------------------------------
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_with_k"),
        )
    )


JSON_ORACLE = """
SELECT event_type,
       round(avg(k), 2) AS avg_k,
       max(k) AS max_k,
       count(k) AS n_with_k
FROM (SELECT event_type, CAST(props->>'$.k' AS INTEGER) AS k FROM events)
GROUP BY event_type
"""


# --- sessionization (gap-based, batch) ---------------------------------------
# 30-min inactivity gap -> new session; the batch twin of
# streaming.session_window. Window + cumulative-sum composition, no UDF.
def sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0)
    sessioned = events.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sessioned.groupBy("user_id").agg(
        F.max("session_seq").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


SESSIONIZE_ORACLE = """
WITH gaps AS (
  SELECT user_id, event_id,
         epoch_us(CAST(ts AS TIMESTAMP))
           - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
), sessioned AS (
  SELECT user_id,
         sum(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM gaps
)
SELECT user_id,
       CAST(max(session_seq) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM sessioned
GROUP BY user_id
"""


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward/backward fill with IGNORE NULLS window functions — the
    time-series gap-fill operator. ``error`` events carry no usable
    metric (masked to NULL), and each row picks up the last/next good
    value within its user's stream. One shuffle on user_id; both fills
    share the same window partitioning so Catalyst plans a single
    exchange + sort."""
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    metric = F.when(F.col("event_type") != "error", F.col("value"))
    base = Window.partitionBy("user_id").orderBy("event_id")
    w_ff = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_bf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return events.select(
        "event_id",
        "user_id",
        metric.alias("metric"),
        F.last(metric, ignorenulls=True).over(w_ff).alias("ffill_value"),
        F.first(metric, ignorenulls=True).over(w_bf).alias("bfill_value"),
    )


GAP_FILL_ORACLE = """
WITH m AS (
  SELECT event_id, user_id,
         CASE WHEN event_type <> 'error' THEN value END AS metric
  FROM events
)
SELECT event_id, user_id, metric,
       last_value(metric IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value,
       first_value(metric IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill_value
FROM m
"""


def click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (point-in-interval): clicks attributed to a purchase by
    the same user within the preceding 30 minutes.

    A naive ``t BETWEEN lo AND hi`` join has no equi-key, so Spark plans
    a broadcast-nested-loop — O(clicks x purchases), dead at scale. The
    binned formulation quantizes time into window-width buckets and
    joins on ``(user_id, bin)`` with each purchase probing its two
    candidate buckets; the inequality becomes a cheap post-filter on an
    equi shuffle join. This is the standard interval-join decomposition
    (Flink's interval join and Databricks' range-join hints do the same
    binning internally)."""
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    width = 1800  # bin width == attribution window (seconds)
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
        F.floor(F.col("ts").cast("long") / width).alias("bin"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("p_ts"),
        F.floor(F.col("ts").cast("long") / width).alias("pbin"),
    )
    # a click in [p_ts - 30min, p_ts) can only live in the purchase's own
    # bin or the one before it
    candidates = purchases.withColumn(
        "bin", F.explode(F.array(F.col("pbin") - 1, F.col("pbin")))
    )
    matched = candidates.join(clicks, ["user_id", "bin"]).filter(
        (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts"))
    )
    counts = matched.groupBy("event_id").agg(
        F.count("*").alias("n_clicks"),
        F.round(F.sum("c_value"), 2).alias("click_value"),
    )
    return purchases.select("event_id", "user_id").join(counts, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("click_value", F.lit(0.0)).alias("click_value"),
    )


CLICK_ATTRIBUTION_ORACLE = """
WITH clicks AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS c_ts, value AS c_value
  FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id,
       count(c.c_ts) AS n_clicks,
       coalesce(round(sum(c.c_value), 2), 0.0) AS click_value
FROM purchases p
LEFT JOIN clicks c
  ON p.user_id = c.user_id
 AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE
 AND c.c_ts < p.p_ts
GROUP BY p.event_id, p.user_id
"""


def user_event_type_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: JSON props -> ``map<string,int>`` via
    ``from_json``, per-user event-type histogram assembled into a map
    column (``map_from_entries`` over ``collect_list``), then consumed
    back out through ``map_keys``/``explode``. The map is built and
    unpacked in one job so the oracle can check the round trip: each
    output row is (user, one map entry, map cardinality, avg of the
    JSON-extracted ``k``)."""
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    kval = F.element_at(
        F.from_json("props", "map<string,int>"), F.lit("k")
    ).alias("k_val")
    per_type = (
        events.select("user_id", "event_type", kval)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("k_val"), 2).alias("avg_k"))
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts"),
        # sum (not avg) of the per-type 2dp values: the true total stays on
        # the 0.01 grid, so round(…, 2) is tie-free across engines
        F.round(F.sum("avg_k"), 2).alias("macro_k_sum"),
    )
    return mapped.select(
        "user_id",
        F.size("type_counts").alias("n_types"),
        "macro_k_sum",
        F.explode("type_counts").alias("event_type", "n_events"),
    )


USER_EVENT_TYPE_MAP_ORACLE = """
WITH per_type AS (
  SELECT user_id, event_type, count(*) AS n,
         round(avg(CAST(props::JSON ->> 'k' AS INT)), 2) AS avg_k
  FROM events
  GROUP BY user_id, event_type
), per_user AS (
  SELECT user_id,
         CAST(count(*) AS INT) AS n_types,
         round(sum(avg_k), 2) AS macro_k_sum
  FROM per_type GROUP BY user_id
)
SELECT p.user_id, u.n_types, u.macro_k_sum,
       p.event_type, p.n AS n_events
FROM per_type p JOIN per_user u USING (user_id)
"""


def resample_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to a regular grid: per-user daily activity
    with zero-filled gaps over each user's own [first_day, last_day]
    span. The dense grid is generated with ``sequence`` + ``explode``
    (rows come from the engine, not the data), then the sparse daily
    aggregate left-joins onto it. Grid cardinality is users x days —
    independent of event count, so the explode is safe at any event
    volume; the join key (user_id, day) is the grid's own partitioning."""
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    daily = (
        events.select("user_id", day.alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("day_value"))
    )
    spans = events.groupBy("user_id").agg(
        F.min(day).alias("first_day"), F.max(day).alias("last_day")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence("first_day", "last_day", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    return grid.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("day_value", F.lit(0.0)).alias("day_value"),
    )


RESAMPLE_ORACLE = """
WITH e AS (
  SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, value
  FROM events
), daily AS (
  SELECT user_id, day, count(*) AS n_events,
         round(sum(value), 2) AS day_value
  FROM e GROUP BY user_id, day
), grid AS (
  SELECT user_id, unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
  FROM e GROUP BY user_id
)
SELECT g.user_id, g.day,
       coalesce(d.n_events, 0) AS n_events,
       coalesce(d.day_value, 0.0) AS day_value
FROM grid g LEFT JOIN daily d USING (user_id, day)
"""


def user_conversion_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stream alignment via cogrouped applyInPandas: per-user click
    and purchase groups meet in one pandas function (operators/
    pandas_ops.py:conversion_stats)."""
    from nyc_taxi_data_pipeline_elt_spark.operators.pandas_ops import (
        conversion_stats,
    )

    tune(spark)
    # INDEPENDENT scans per cogroup side, not two filters of one frame:
    # when both sides share a parent plan (same expression ids), Spark's
    # relation dedup mis-resolves the right side's UDF args to the LEFT
    # side's ids (`fn(user_id#2L, ts#7, user_id#2L, ts#7)` in the plan),
    # and the right pandas frame intermittently arrives missing columns
    # (PySpark 4.1.2). Fresh scans get fresh ids; the scan itself is
    # pruned/pushed identically, so there is no extra read cost.
    clicks = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", "ts")
    )
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
    )
    return conversion_stats(clicks, purchases)


CONVERSION_COGROUP_ORACLE = """
WITH c AS (
  SELECT user_id, count(*) AS n_clicks, max(CAST(ts AS TIMESTAMP)) AS last_c
  FROM events WHERE event_type = 'click' GROUP BY user_id
), p AS (
  SELECT user_id, count(*) AS n_purchases, max(CAST(ts AS TIMESTAMP)) AS last_p
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT coalesce(c.user_id, p.user_id) AS user_id,
       coalesce(n_clicks, 0) AS n_clicks,
       coalesce(n_purchases, 0) AS n_purchases,
       CASE WHEN n_clicks > 0
            THEN round(coalesce(n_purchases, 0) * 1.0 / n_clicks, 6) END
         AS conversion_rate,
       CASE WHEN n_clicks > 0 AND n_purchases > 0
            THEN CAST(floor((epoch_us(last_p) - epoch_us(last_c)) / 1000000.0)
                      AS BIGINT) END
         AS last_click_to_purchase_sec
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
"""


def order_rank_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window family: percent_rank, cume_dist and
    nth_value within each order priority. The ORDER BY carries the
    unique o_orderkey tiebreak, so ranks are total and both engines
    compute the same integer ratios — emitted unrounded because the
    int/int divisions are correctly-rounded IEEE on identical operands."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest_key"),
    )


RANK_POSITIONS_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume_dist,
       nth_value(o_orderkey, 2) OVER w AS second_cheapest_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


def events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured via the VARIANT type (Spark 4): ``parse_json`` once
    into the binary variant encoding, then typed ``variant_get`` paths —
    the modern replacement for per-field ``get_json_object`` re-parsing
    (one parse, many typed extractions; Parquet can store the variant
    natively)."""
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       min(CAST(props::JSON ->> 'k' AS INT)) AS min_k,
       max(CAST(props::JSON ->> 'k' AS INT)) AS max_k,
       CAST(sum(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
"""


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the 6-table snowflake with the nation dimension
    joined TWICE under different roles (customer nation vs supplier
    nation) — the self-aliased-dimension pattern. Both nation branches
    are bounded (25 rows at any SF) and broadcast; the lineitem-orders
    spine stays a fact-fact join for Catalyst/AQE to plan as sort-merge
    at scale. Yearly revenue per (supplier nation, customer nation)
    lane, restricted to cross-nation trade."""
    tune(spark)
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp_nation = F.broadcast(
        supplier.join(
            nation, supplier.s_nationkey == nation.n_nationkey
        ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_nation = F.broadcast(
        customer.join(
            nation, customer.c_nationkey == nation.n_nationkey
        ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    # DECIMAL end-to-end: the 4-decimal price*(1-discount) grid ties at
    # exact half-cents in these ~14-line groups, and double `round` is
    # engine-dependent there (Spark rounds the shortest decimal repr,
    # DuckDB the binary value).  Exact decimal sums tie-break identically
    # (half-up for positives) in both engines; final cast to double is
    # deterministic.
    # tight widths keep the product long-backed decimal(17,4) (~20%
    # faster than decimal(38,4)); exactness — and thus oracle parity —
    # is width-independent
    price_dec = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_dec = F.col("l_discount").cast("decimal(4,2)")
    revenue = price_dec * (F.lit(1).cast("decimal(4,2)") - disc_dec)
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(supp_nation, lineitem.l_suppkey == supp_nation.s_suppkey)
        .join(cust_nation, orders.o_custkey == cust_nation.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


NATION_TRADE_ORACLE = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
            AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
"""


def events_xml_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (Spark 4 native ``from_xml``): events are
    re-serialized as XML fragments and parsed back through a declared
    schema, then aggregated — exercising the parse path end to end
    (schema projection, typed extraction, nulls). The oracle computes
    the same aggregate from the base columns: double -> string -> double
    round-trips exactly (shortest-repr parsing), so the results are
    identical by construction."""
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    xml = F.concat(
        F.lit("<e><t>"),
        F.col("event_type"),
        F.lit("</t><v>"),
        F.col("value").cast("string"),
        F.lit("</v></e>"),
    )
    parsed = events.select(F.from_xml(xml, "t string, v double").alias("x"))
    return (
        parsed.groupBy(F.col("x.t").alias("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("x.v"), 2).alias("total_value"),
        )
    )


EVENTS_XML_ORACLE = """
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY event_type
"""


# --- market-basket co-occurrence (frequent pair mining) -------------------------
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-purchased part pairs: the pairwise-support step of
    market-basket / co-occurrence mining. The self-join key is the
    basket id (l_orderkey), so the quadratic term is bounded by basket
    size (~4 lines), not corpus size — the pair count stays linear in
    rows, and the groupBy is an ordinary partial-aggregated shuffle.
    At 100 TB the same plan holds: co-occurrence explodes only if a
    single basket is huge (cap basket size upstream)."""
    tune(spark)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(25)
    )


COPURCHASE_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 25
"""


# --- outer joins (completes the §2.7 join-type enumeration) -----------------
def nation_wealth_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two sparse per-nation aggregates: nations with
    high-balance customers vs nations with high-balance suppliers. Either
    side can be missing for a nation, so the outer join (with coalesced
    zero counts) is load-bearing, not decorative. Plan shape: two
    shuffled aggregates over dimension-bounded keys, then a full outer
    sort-merge join — at scale both inputs are already tiny post-agg."""
    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cust = (
        customer.filter(F.col("c_acctbal") > 9000)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("rich_customers"))
    )
    supp = (
        supplier.filter(F.col("s_acctbal") > 9000)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("rich_suppliers"))
    )
    return (
        cust.join(supp, "n_name", "full_outer")
        .select(
            "n_name",
            F.coalesce("rich_customers", F.lit(0)).alias("rich_customers"),
            F.coalesce("rich_suppliers", F.lit(0)).alias("rich_suppliers"),
        )
    )


NATION_WEALTH_ORACLE = """
WITH cust AS (
  SELECT n_name, count(*) AS rich_customers
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE c_acctbal > 9000 GROUP BY n_name
),
supp AS (
  SELECT n_name, count(*) AS rich_suppliers
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE s_acctbal > 9000 GROUP BY n_name
)
SELECT coalesce(cust.n_name, supp.n_name) AS n_name,
       coalesce(rich_customers, 0) AS rich_customers,
       coalesce(rich_suppliers, 0) AS rich_suppliers
FROM cust FULL OUTER JOIN supp ON cust.n_name = supp.n_name
"""


# --- set operations: INTERSECT / EXCEPT (absent in the reference, §2.5) -----
def customer_year_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer retention via set ops: buyers active in both 1995 and
    1996 (INTERSECT) vs churned 1995-only buyers (EXCEPT). Spark plans
    both as left-semi/left-anti joins over the distinct key sets — the
    same aggregate-then-join shape as the subquery battery, so the set
    syntax costs nothing extra at scale."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    y95 = (
        orders.filter(F.year("o_orderdate") == 1995)
        .select("o_custkey")
        .distinct()
    )
    y96 = (
        orders.filter(F.year("o_orderdate") == 1996)
        .select("o_custkey")
        .distinct()
    )
    both = y95.intersect(y96).agg(F.count("*").alias("n_customers")).select(
        F.lit("retained").alias("segment"), "n_customers"
    )
    churned = y95.exceptAll(y96).agg(F.count("*").alias("n_customers")).select(
        F.lit("churned").alias("segment"), "n_customers"
    )
    return both.unionByName(churned)


CUSTOMER_OVERLAP_ORACLE = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT 'retained' AS segment,
       (SELECT count(*) FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)) AS n_customers
UNION ALL
SELECT 'churned',
       (SELECT count(*) FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96))
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view -> click -> purchase): how many
    users completed each step IN ORDER — the MATCH_RECOGNIZE /
    windowFunnel shape of product analytics.

    Single-pass plan: one window partitioned on user_id ordered by
    (ts, event_id) carries two cumulative "seen a qualifying earlier
    step" flags (frame = UNBOUNDED PRECEDING..1 PRECEDING, so a step
    counts only when its predecessor happened STRICTLY before), then
    one hash-agg per user and a 1-row global rollup. Exactly one data
    shuffle at any event volume; counts are integers, conversion
    rates raw IEEE divisions of those integers — deterministic
    cross-engine without rounding."""
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_view = (F.col("event_type") == "view").cast("int")
    is_click = (F.col("event_type") == "click").cast("int")
    is_purchase = (F.col("event_type") == "purchase").cast("int")
    staged = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("seen_view", F.coalesce(F.max(is_view).over(w_prev), F.lit(0)))
        .withColumn("click_chain", is_click * F.col("seen_view"))
        .withColumn(
            "seen_click_chain",
            F.coalesce(F.max("click_chain").over(w_prev), F.lit(0)),
        )
        .withColumn("purchase_chain", is_purchase * F.col("seen_click_chain"))
    )
    per_user = staged.groupBy("user_id").agg(
        F.max(is_view).alias("s1"),
        F.max("click_chain").alias("s2"),
        F.max("purchase_chain").alias("s3"),
    )
    return per_user.agg(
        F.sum("s1").cast("bigint").alias("users_view"),
        F.sum("s2").cast("bigint").alias("users_view_click"),
        F.sum("s3").cast("bigint").alias("users_full_funnel"),
        (F.sum("s2").cast("double") / F.sum("s1")).alias("click_rate"),
        (F.sum("s3").cast("double") / F.sum("s2")).alias("purchase_rate"),
    )


FUNNEL_ORACLE = """
WITH staged AS (
  SELECT user_id,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
           * coalesce(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS click_chain,
         event_type, ts, event_id
  FROM events
), staged2 AS (
  SELECT user_id, is_view, click_chain,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
           * coalesce(max(click_chain)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS purchase_chain
  FROM staged
), per_user AS (
  SELECT user_id, max(is_view) AS s1, max(click_chain) AS s2,
         max(purchase_chain) AS s3
  FROM staged2 GROUP BY user_id
)
SELECT CAST(sum(s1) AS BIGINT) AS users_view,
       CAST(sum(s2) AS BIGINT) AS users_view_click,
       CAST(sum(s3) AS BIGINT) AS users_full_funnel,
       CAST(sum(s2) AS DOUBLE) / sum(s1) AS click_rate,
       CAST(sum(s3) AS DOUBLE) / sum(s2) AS purchase_rate
FROM per_user
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by their first signup
    day, counted as retained in each subsequent week they had ANY
    activity — the standard growth-analytics triangle.

    Plan: signup cohort anchor = one hash-agg on user_id; daily
    activity deduped per (user, day) with MAP-SIDE partial
    deduplication — every exchange after the first carries
    (user, day) pairs, not raw events, which at 100 TB of events is
    the dominant volume cut (an alternative single user_id
    repartition would co-locate all three aggs but shuffle the full
    event stream undeduped). The final matrix is cohort-days x
    week-offsets — bounded by calendar, not event volume. Counts are
    exact integers."""
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    cohorts = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(day).alias("cohort_day"))
    )
    activity = events.select("user_id", day.alias("day")).distinct()
    return (
        activity.join(cohorts, "user_id")
        .filter(F.col("day") >= F.col("cohort_day"))
        .select(
            "user_id",
            "cohort_day",
            F.floor(F.datediff("day", "cohort_day") / F.lit(7))
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


COHORT_RETENTION_ORACLE = """
WITH cohorts AS (
  SELECT user_id, min(date_trunc('day', CAST(ts AS TIMESTAMP))) AS cohort_day
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
  FROM events
)
SELECT cohort_day,
       CAST(floor(date_diff('day', cohort_day, day) / 7.0) AS BIGINT)
         AS week_offset,
       count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
WHERE day >= cohort_day
GROUP BY 1, 2
"""


def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals in 20 buckets — the
    profiling primitive behind every engine's column-stats pass (the
    equi-DEPTH twin is order_price_deciles).

    The global [min, max] is a 1-row aggregate broadcast-cross-joined
    (never collected); bucketing is then row-local arithmetic, and the
    final count is one hash-agg on a 20-value key. Every derived bound
    is raw IEEE arithmetic on identical operands — identical bits on
    both engines, no rounding."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    n_buckets = 20
    bounds = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(n_buckets))
    # mx == mn (constant column) would make width 0 and the division
    # NaN: collapse to bucket 0, mirrored in the oracle's CASE
    bucket = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("o_totalprice") - F.col("mn")) / width).cast("int"),
        )
    )
    return (
        orders.select("o_totalprice")
        .crossJoin(F.broadcast(bounds))
        .select(
            bucket.alias("bucket"),
            (F.col("mn") + bucket * width).alias("bucket_lo"),
            F.col("o_totalprice"),
        )
        .groupBy("bucket", "bucket_lo")
        .agg(F.count("*").alias("n_orders"))
    )


PRICE_HISTOGRAM_ORACLE = """
WITH bounds AS (
  SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
), bucketed AS (
  SELECT CAST(CASE WHEN mx = mn THEN 0
              ELSE least(19, floor((o_totalprice - mn) / ((mx - mn) / 20.0)))
              END AS INT) AS bucket,
         mn, mx
  FROM orders, bounds
)
SELECT bucket,
       mn + bucket * ((mx - mn) / 20.0) AS bucket_lo,
       count(*) AS n_orders
FROM bucketed
GROUP BY 1, 2
"""


# --- robust aggregation: winsorized statistics --------------------------------
def winsorized_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-status order-value statistics: clip o_totalprice
    at the global exact p01/p99 (continuous interpolation), then
    aggregate — the robust-mean pass that keeps a handful of extreme
    rows from dominating a 100 TB metric (same motivation as the
    quality-score trimming in data-curation pipelines).

    Plan: one exact-percentile agg to a single 2-value row (Spark's
    ``percentile`` is a partial-merge aggregate — no global sort), then
    a 1-row broadcast cross join feeds the clip into ONE map-side
    combined hash agg. Two scans of orders, zero wide shuffles beyond
    the O(groups) agg exchanges. Clip verdicts compare against the
    percentile ROUNDED to 2dp on both engines so boundary rows agree
    (both engines interpolate with the same (n-1)*p rule; 2dp absorbs
    float-order drift)."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.round(F.percentile("o_totalprice", F.lit(0.01)), 2).alias("p01"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 2).alias("p99"),
    )
    clipped = orders.crossJoin(F.broadcast(bounds)).select(
        "o_orderstatus",
        "p01",
        "p99",
        F.greatest(F.least(F.col("o_totalprice"), F.col("p99")), F.col("p01")).alias(
            "v"
        ),
        (F.col("o_totalprice") < F.col("p01")).cast("int").alias("lo"),
        (F.col("o_totalprice") > F.col("p99")).cast("int").alias("hi"),
    )
    return (
        clipped.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("v"), 2).alias("avg_winsorized"),
            F.round(F.sum("v"), 2).alias("sum_winsorized"),
            F.sum("lo").cast("long").alias("n_clipped_low"),
            F.sum("hi").cast("long").alias("n_clipped_high"),
            F.round(F.max("p01"), 2).alias("p01"),
            F.round(F.max("p99"), 2).alias("p99"),
        )
        .orderBy("o_orderstatus")
    )


WINSORIZED_ORACLE = """
WITH bounds AS (
  SELECT round(quantile_cont(o_totalprice, 0.01), 2) AS p01,
         round(quantile_cont(o_totalprice, 0.99), 2) AS p99
  FROM orders
), clipped AS (
  SELECT o_orderstatus, p01, p99,
         greatest(least(o_totalprice, p99), p01) AS v,
         CASE WHEN o_totalprice < p01 THEN 1 ELSE 0 END AS lo,
         CASE WHEN o_totalprice > p99 THEN 1 ELSE 0 END AS hi
  FROM orders, bounds
)
SELECT o_orderstatus, count(*) AS n_orders,
       round(avg(v), 2) AS avg_winsorized,
       round(sum(v), 2) AS sum_winsorized,
       CAST(sum(lo) AS BIGINT) AS n_clipped_low,
       CAST(sum(hi) AS BIGINT) AS n_clipped_high,
       round(max(p01), 2) AS p01, round(max(p99), 2) AS p99
FROM clipped
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --- scale operations: skew diagnosis + join-size estimation ------------------
def skew_diagnosis_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for orders.o_custkey — the diagnostic run
    BEFORE choosing a shuffle strategy at 100 TB: per-key counts, the
    p50/p99/max of that distribution, the heaviest key's row share, and
    the salt factor ``salted_join`` would need (ceil(max/p50)) to level
    the hottest key's partition to a median one.

    Plan: one map-side-combined hash agg to the per-key frame (O(keys)
    rows — the only full-data pass), then a 1-row aggregate over it.
    The percentile aggregate is partial-merge, no global sort; nothing
    is collected. This is the engine's answer to "do I need the skew
    machinery?" before paying for it."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    return per_key.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_key_rows"),
        F.round(F.percentile("cnt", F.lit(0.5)), 2).alias("p50_key_rows"),
        F.round(F.percentile("cnt", F.lit(0.99)), 2).alias("p99_key_rows"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_key_share"),
        F.ceil(
            F.max("cnt") / F.greatest(F.percentile("cnt", F.lit(0.5)), F.lit(1.0))
        )
        .cast("long")
        .alias("recommended_salt"),
    )


SKEW_DIAGNOSIS_ORACLE = """
WITH per_key AS (
  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
)
SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(cnt) AS BIGINT) AS max_key_rows,
       round(quantile_cont(cnt, 0.5), 2) AS p50_key_rows,
       round(quantile_cont(cnt, 0.99), 2) AS p99_key_rows,
       round(max(cnt) * 1.0 / sum(cnt), 6) AS top_key_share,
       CAST(ceil(max(cnt) / greatest(quantile_cont(cnt, 0.5), 1.0)) AS BIGINT)
         AS recommended_salt
FROM per_key
"""


def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-key overlap estimation between two join sides from KMV
    sketches (Bar-Yossef et al. 2002, Beyer et al. SIGMOD'07 merge
    rule) — what a planner consults to size orders ⋈ customer WITHOUT
    scanning either side twice: union cardinality from the merged
    sketch's k-th smallest hash, intersection via the Jaccard share of
    sketch members present on both sides. md5-uniform hashes make the
    whole estimate engine-deterministic, so even the approximation
    hash-matches the oracle; exact counts ride along to expose the
    sketch error (the same eval contract as kmv_distinct_tokens /
    simsearch_recall_eval).

    Plan per side: distinct (one shuffle of keys) -> bottom-k by hash
    (TakeOrderedAndProject, never a global sort) -> the k-row sketches
    full-outer-join and a 1-row aggregate. At 100 TB the data passes
    are the two distincts; everything after is k rows."""
    tune(spark)
    k = 64
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def sketch(df: DataFrame, col: str) -> DataFrame:
        keys = df.select(F.col(col).alias("key")).distinct()
        return (
            keys.select(M.hash_uniform("key", "jce-").alias("h"))
            .orderBy("h")
            .limit(k)
        )

    ska = sketch(orders, "o_custkey").withColumn("in_a", F.lit(1))
    skb = sketch(customer, "c_custkey").withColumn("in_b", F.lit(1))
    merged = (
        ska.join(skb, "h", "full_outer")
        .select(
            "h",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
        .orderBy("h")
        .limit(k)
    )
    exact = orders.select(F.col("o_custkey").alias("key")).distinct().join(
        customer.select(F.col("c_custkey").alias("key")).distinct(),
        "key",
        "full_outer",
    )
    exact_counts = exact.agg(
        F.count("*").cast("long").alias("exact_union"),
    )
    est = merged.agg(
        F.count("*").alias("m"),
        F.max("h").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    ).select(
        F.lit(k).alias("k"),
        # fewer than k distinct hashes => the sketch IS the union
        F.when(F.col("m") < k, F.col("m").cast("double"))
        .otherwise(F.round((F.lit(k) - 1) / F.col("kth"), 4))
        .alias("est_union"),
        F.col("n_both").cast("long").alias("sketch_overlap"),
        F.round(
            F.col("n_both")
            / F.col("m")
            * F.when(F.col("m") < k, F.col("m").cast("double")).otherwise(
                (F.lit(k) - 1) / F.col("kth")
            ),
            4,
        ).alias("est_intersection"),
    )
    return est.crossJoin(F.broadcast(exact_counts))


JOIN_CARDINALITY_ORACLE = """
WITH ska AS (
  SELECT h, 1 AS in_a FROM (
    SELECT ('0x' || substr(md5('jce-' || CAST(key AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS h
    FROM (SELECT DISTINCT o_custkey AS key FROM orders)
  ) ORDER BY h LIMIT 64
), skb AS (
  SELECT h, 1 AS in_b FROM (
    SELECT ('0x' || substr(md5('jce-' || CAST(key AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS h
    FROM (SELECT DISTINCT c_custkey AS key FROM customer)
  ) ORDER BY h LIMIT 64
), merged AS (
  SELECT h, coalesce(in_a, 0) AS in_a, coalesce(in_b, 0) AS in_b
  FROM ska FULL OUTER JOIN skb USING (h)
  ORDER BY h LIMIT 64
), agg AS (
  SELECT count(*) AS m, max(h) AS kth, sum(in_a * in_b) AS n_both FROM merged
), exact AS (
  SELECT count(*) AS exact_union
  FROM (SELECT DISTINCT o_custkey AS key FROM orders)
       FULL OUTER JOIN (SELECT DISTINCT c_custkey AS key FROM customer)
       USING (key)
)
SELECT 64 AS k,
       CASE WHEN m < 64 THEN m * 1.0
            ELSE round((64 - 1) / kth, 4) END AS est_union,
       CAST(n_both AS BIGINT) AS sketch_overlap,
       round(n_both * 1.0 / m
             * (CASE WHEN m < 64 THEN m * 1.0 ELSE (64 - 1) / kth END),
             4) AS est_intersection,
       CAST(exact_union AS BIGINT) AS exact_union
FROM agg, exact
"""


QUERIES = {
    "pricing_summary": pricing_summary,
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
    "order_price_histogram": order_price_histogram,
    "winsorized_order_stats": winsorized_order_stats,
    "skew_diagnosis_orders": skew_diagnosis_orders,
    "join_cardinality_estimate": join_cardinality_estimate,
    "events_xml_stats": events_xml_stats,
    "copurchase_part_pairs": copurchase_part_pairs,
    "nation_wealth_coverage": nation_wealth_coverage,
    "customer_year_overlap": customer_year_overlap,
    "revenue_by_nation": revenue_by_nation,
    "shipping_priority_topk": shipping_priority_topk,
    "customers_without_open_orders": customers_without_open_orders,
    "customers_with_big_order": customers_with_big_order,
    "top3_lineitems_per_supplier": top3_lineitems_per_supplier,
    "running_customer_spend": running_customer_spend,
    "rollup_pricing": rollup_pricing,
    "cube_order_stats": cube_order_stats,
    "sql_consumption_report": sql_consumption_report,
    "distinct_customers_per_priority": distinct_customers_per_priority,
    "orders_pivot_status": orders_pivot_status,
    "events_json_stats": events_json_stats,
    "sessionize_users": sessionize_users,
    "events_gap_fill": events_gap_fill,
    "click_attribution": click_attribution,
    "user_event_type_map": user_event_type_map,
    "resample_events_daily": resample_events_daily,
    "user_conversion_cogroup": user_conversion_cogroup,
    "order_rank_positions": order_rank_positions,
    "events_variant_stats": events_variant_stats,
    "nation_trade_volume": nation_trade_volume,
    "lineitem_asof_prior_order": lineitem_asof_prior_order,
    "order_price_percentiles": order_price_percentiles,
    "percentile_sketch_eval": percentile_sketch_eval,
    "salted_orders_per_segment": salted_orders_per_segment,
    "forecast_revenue": forecast_revenue,
    "priority_by_linestatus": priority_by_linestatus,
    "promo_revenue_share": promo_revenue_share,
    "repeat_high_value_customers": repeat_high_value_customers,
    "rolling_weekly_spend": rolling_weekly_spend,
    "status_counts_long": status_counts_long,
    "order_price_deciles": order_price_deciles,
    "grouping_sets_sales": grouping_sets_sales,
    "order_date_features": order_date_features,
    "token_array_features": token_array_features,
    "biggest_order_per_customer": biggest_order_per_customer,
    "customer_max_order_subquery": customer_max_order_subquery,
    "price_quantity_stats": price_quantity_stats,
    "similar_part_names": similar_part_names,
    "approx_distinct_stats": approx_distinct_stats,
}

ORACLE = {
    "funnel_conversion": FUNNEL_ORACLE,
    "cohort_retention": COHORT_RETENTION_ORACLE,
    "order_price_histogram": PRICE_HISTOGRAM_ORACLE,
    "winsorized_order_stats": WINSORIZED_ORACLE,
    "skew_diagnosis_orders": SKEW_DIAGNOSIS_ORACLE,
    "join_cardinality_estimate": JOIN_CARDINALITY_ORACLE,
    "copurchase_part_pairs": COPURCHASE_ORACLE,
    "events_xml_stats": EVENTS_XML_ORACLE,
    "lineitem_asof_prior_order": ASOF_ORACLE,
    "order_price_percentiles": PERCENTILE_ORACLE,
    "percentile_sketch_eval": PERCENTILE_SKETCH_EVAL_ORACLE,
    "approx_distinct_stats": APPROX_DISTINCT_ORACLE,
    "salted_orders_per_segment": SALTED_JOIN_ORACLE,
    "forecast_revenue": Q6_ORACLE,
    "priority_by_linestatus": Q12_ORACLE,
    "promo_revenue_share": Q14_ORACLE,
    "repeat_high_value_customers": SETOPS_ORACLE,
    "rolling_weekly_spend": RANGE_WINDOW_ORACLE,
    "status_counts_long": UNPIVOT_ORACLE,
    "order_price_deciles": DECILES_ORACLE,
    "grouping_sets_sales": GROUPING_SETS_ORACLE,
    "order_date_features": DATE_FEATURES_ORACLE,
    "token_array_features": ARRAY_FEATURES_ORACLE,
    "biggest_order_per_customer": MINMAX_BY_ORACLE,
    "customer_max_order_subquery": SCALAR_SUBQUERY_ORACLE,
    "price_quantity_stats": STATS_ORACLE,
    "similar_part_names": LEVENSHTEIN_ORACLE,
    "pricing_summary": PRICING_ORACLE,
    "revenue_by_nation": REVENUE_BY_NATION_ORACLE,
    "shipping_priority_topk": SHIPPING_TOPK_ORACLE,
    "customers_without_open_orders": ANTI_JOIN_ORACLE,
    "customers_with_big_order": SEMI_JOIN_ORACLE,
    "top3_lineitems_per_supplier": WINDOW_TOPK_ORACLE,
    "running_customer_spend": RUNNING_SUM_ORACLE,
    "rollup_pricing": ROLLUP_ORACLE,
    "cube_order_stats": CUBE_ORACLE,
    "sql_consumption_report": SQL_CONSUMPTION_ORACLE,
    "distinct_customers_per_priority": DISTINCT_ORACLE,
    "orders_pivot_status": PIVOT_ORACLE,
    "events_json_stats": JSON_ORACLE,
    "sessionize_users": SESSIONIZE_ORACLE,
    "events_gap_fill": GAP_FILL_ORACLE,
    "click_attribution": CLICK_ATTRIBUTION_ORACLE,
    "user_event_type_map": USER_EVENT_TYPE_MAP_ORACLE,
    "resample_events_daily": RESAMPLE_ORACLE,
    "user_conversion_cogroup": CONVERSION_COGROUP_ORACLE,
    "order_rank_positions": RANK_POSITIONS_ORACLE,
    "events_variant_stats": VARIANT_ORACLE,
    "nation_trade_volume": NATION_TRADE_ORACLE,
    "nation_wealth_coverage": NATION_WEALTH_ORACLE,
    "customer_year_overlap": CUSTOMER_OVERLAP_ORACLE,
}


# --- experiment readout + time-series anomaly screen (r5) --------------------
# Both compute inferential statistics from EXACT integer-cent sums, with
# the scalar double formulas held in shared SQL strings used verbatim by
# the Spark plan and the DuckDB oracle — identical expression trees over
# identical inputs, so +,-,*,/,sqrt (all IEEE correctly rounded) produce
# bit-identical doubles and the outputs are emitted RAW, unrounded (the
# embedding_random_projection convention).

_CENTS = "CAST(round(value * 100) AS BIGINT)"

# Welch's t on dollars, from integer cent sums (s=sum, q=sum of squares,
# n=count per arm). Fixture sums sit far below 2^53 so the BIGINT->DOUBLE
# casts are exact; at extreme scale the q sums would move to DECIMAL.
_AB_MEAN = "CAST({s} AS DOUBLE) / {n} / 100.0"
_AB_VAR = (
    "(CAST({q} AS DOUBLE) - CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE) / {n})"
    " / ({n} - 1) / 10000.0"
)
_AB_SE2 = f"(({_AB_VAR.format(s='s_a', q='q_a', n='n_a')}) / n_a + ({_AB_VAR.format(s='s_b', q='q_b', n='n_b')}) / n_b)"
_AB_EXPRS = [
    "n_a",
    "n_b",
    f"{_AB_MEAN.format(s='s_a', n='n_a')} AS mean_a",
    f"{_AB_MEAN.format(s='s_b', n='n_b')} AS mean_b",
    f"{_AB_VAR.format(s='s_a', q='q_a', n='n_a')} AS var_a",
    f"{_AB_VAR.format(s='s_b', q='q_b', n='n_b')} AS var_b",
    f"(({_AB_MEAN.format(s='s_a', n='n_a')}) - ({_AB_MEAN.format(s='s_b', n='n_b')}))"
    f" / sqrt({_AB_SE2}) AS t_stat",
    f"({_AB_SE2}) * ({_AB_SE2}) / "
    f"((({_AB_VAR.format(s='s_a', q='q_a', n='n_a')}) / n_a) * (({_AB_VAR.format(s='s_a', q='q_a', n='n_a')}) / n_a) / (n_a - 1)"
    f" + (({_AB_VAR.format(s='s_b', q='q_b', n='n_b')}) / n_b) * (({_AB_VAR.format(s='s_b', q='q_b', n='n_b')}) / n_b) / (n_b - 1))"
    " AS welch_df",
]


def ab_test_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment readout: Welch's unequal-variance t-test on purchase
    value between two deterministic user arms (user_id parity stands in
    for the assignment column a real experiment logs). The heavy part is
    ONE map-side-combined aggregate over the event scan — six
    conditional integer sums — and the t/df formulas run on the 1-row
    result; nothing about the plan changes at any event volume. The
    moments are exact integers (values are cents), so the statistics are
    engine-bit-identical."""
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    arm = F.expr("CAST(user_id % 2 AS INT)")
    c = F.expr(_CENTS)
    agg = (
        events.filter(F.col("event_type") == "purchase")
        .select(arm.alias("v"), c.alias("c"))
        .agg(
            F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).alias("n_b"),
            F.sum(F.when(F.col("v") == 0, F.col("c")).otherwise(0)).alias("s_a"),
            F.sum(F.when(F.col("v") == 1, F.col("c")).otherwise(0)).alias("s_b"),
            F.sum(
                F.when(F.col("v") == 0, F.col("c") * F.col("c")).otherwise(0)
            ).alias("q_a"),
            F.sum(
                F.when(F.col("v") == 1, F.col("c") * F.col("c")).otherwise(0)
            ).alias("q_b"),
        )
    )
    return agg.selectExpr(*_AB_EXPRS)


AB_TEST_ORACLE = f"""
WITH p AS (
  SELECT CAST(user_id % 2 AS INT) AS v, {_CENTS} AS c
  FROM events WHERE event_type = 'purchase'
), agg AS (
  SELECT CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN v = 0 THEN c ELSE 0 END) AS BIGINT) AS s_a,
         CAST(sum(CASE WHEN v = 1 THEN c ELSE 0 END) AS BIGINT) AS s_b,
         CAST(sum(CASE WHEN v = 0 THEN c * c ELSE 0 END) AS BIGINT) AS q_a,
         CAST(sum(CASE WHEN v = 1 THEN c * c ELSE 0 END) AS BIGINT) AS q_b
  FROM p
)
SELECT {", ".join(_AB_EXPRS)} FROM agg
"""

# Leave-one-out rolling z-score: baseline = the 7 preceding days
# (current day excluded, so a spike cannot mask itself).
_ZN = "CAST(rs AS DOUBLE) / rn"
_ZVAR = (
    "(CAST(rq AS DOUBLE) - CAST(rs AS DOUBLE) * CAST(rs AS DOUBLE) / rn)"
    " / (rn - 1)"
)
_Z_EXPR = (
    f"CASE WHEN rn >= 3 AND ({_ZVAR}) > 0 THEN "
    f"(CAST(c AS DOUBLE) - ({_ZN})) / sqrt({_ZVAR}) END"
)


def events_anomaly_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly screen over per-type daily revenue: each
    day is scored against its own trailing 7-day window (leave-one-out,
    >= 3 prior days required) and flagged above 2 sigma — the
    pipeline-observability pass that catches a feed going quiet or a
    double-ingest doubling a day. Daily totals are exact integer cents;
    the rolling sums are window aggregates partitioned per series, so
    every series scores in parallel and the frame never leaves its
    partition. z is emitted raw from bit-identical double arithmetic."""
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.expr(_CENTS).alias("c0"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c0").alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    scored = daily.select(
        "event_type",
        "day",
        "c",
        F.count("c").over(w).alias("rn"),
        F.sum("c").over(w).alias("rs"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("rq"),
    )
    return scored.selectExpr(
        "event_type",
        "day",
        "c AS total_cents",
        f"{_Z_EXPR} AS z",
        f"coalesce(({_Z_EXPR}) > 2.0, false) AS is_spike",
    )


ANOMALY_SCREEN_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(sum({_CENTS}) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, day, c,
         CAST(count(c) OVER w AS BIGINT) AS rn,
         CAST(sum(c) OVER w AS BIGINT) AS rs,
         CAST(sum(c * c) OVER w AS BIGINT) AS rq
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, c AS total_cents,
       {_Z_EXPR} AS z,
       coalesce(({_Z_EXPR}) > 2.0, false) AS is_spike
FROM scored
"""


QUERIES.update(
    {
        "ab_test_event_value": ab_test_event_value,
        "events_anomaly_screen": events_anomaly_screen,
    }
)
ORACLE.update(
    {
        "ab_test_event_value": AB_TEST_ORACLE,
        "events_anomaly_screen": ANOMALY_SCREEN_ORACLE,
    }
)


def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping() indicators — the §2.4 surface
    rollup/cube cannot express: an explicit, non-hierarchical set of
    aggregation levels ((priority), (status), ()) in ONE pass (Spark
    plans an Expand + single hash aggregate — the data is scanned once
    regardless of how many sets are requested). Revenue summed in exact
    integer cents; grouping() flags disambiguate aggregate NULLs from
    (absent here) data NULLs. Identical statement runs on both engines."""
    tune(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(_GROUPING_SETS_SQL.format(table="orders_gs"))


_GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM {table}
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""

GROUPING_SETS_ORACLE = _GROUPING_SETS_SQL.format(table="orders")


def quality_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor between two corpus
    slices (even- vs odd-numbered sources standing in for
    yesterday's/today's crawl): quality scores binned on the fixed
    [0,1] decile grid, per-bin shares smoothed (+0.5/bin) so empty bins
    stay finite, contribution = (p_cur - p_ref) * ln(p_cur/p_ref).

    Exactness: bins come from floor() on the 6dp-rounded score
    (identical doubles both engines), shares from exact integer counts;
    each bin's contribution is snapped to the 1e-6 grid as an INTEGER
    (micro-PSI), so the cross-bin total is an order-independent integer
    sum — the ln convention of the LM-scoring family. Plan: one
    map-side-combined (bin x slice) count aggregate over the scan, then
    all arithmetic on the 10-row grid; the running total rides on the
    pmod metadata window."""
    tune(spark)
    from nyc_taxi_data_pipeline_elt_spark.plans.trainingdata import text_stats

    stats = text_stats(spark, sf_dir).select("doc_id", "quality")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    scored = docs.join(stats, "doc_id")
    bin_ = F.expr("least(CAST(floor(quality * 10) AS INT), 9)")
    is_cur = F.expr("CAST(substring(source, 4) AS INT) % 2 = 1")
    hist = (
        scored.select(bin_.alias("bin"), is_cur.alias("cur"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(~F.col("cur"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("cur"), 1).otherwise(0)).alias("n_cur"),
        )
    )
    # densify to all 10 bins so smoothing sees empty ones
    grid = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    full = (
        grid.join(hist, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = full.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    contrib = (
        "CAST(round(((n_cur + 0.5) / (t_cur + 5.0) - (n_ref + 0.5) / (t_ref + 5.0))"
        " * ln(((n_cur + 0.5) / (t_cur + 5.0)) / ((n_ref + 0.5) / (t_ref + 5.0)))"
        " * 1000000) AS BIGINT)"
    )
    binned = full.crossJoin(F.broadcast(tot)).selectExpr(
        "bin", "n_ref", "n_cur", f"{contrib} AS psi_x1e6"
    )
    w = (
        Window.partitionBy(F.pmod(F.col("bin"), F.lit(1)))
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return binned.select(
        "bin",
        "n_ref",
        "n_cur",
        "psi_x1e6",
        F.sum("psi_x1e6").over(w).alias("psi_total_x1e6"),
    )


PSI_ORACLE = """
WITH q AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         greatest(len(toks), 1) AS n_tok,
         len(list_filter(toks, t -> t IN ({sw}))) AS sw_hits,
         length(trim(text)) * 1.0 / greatest(len(toks), 1) AS mean_wlen,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
           / greatest(length(text), 1) AS sym_ratio
  FROM q
), sc AS (
  SELECT doc_id,
         round(least(sw_hits * 3.0 / n_tok, 1.0) * 0.4
               + (CASE WHEN mean_wlen >= 3 AND mean_wlen <= 10 THEN 1.0 ELSE 0.3 END) * 0.3
               + (1.0 - least(sym_ratio * 5.0, 1.0)) * 0.3, 6) AS quality
  FROM m
), j AS (
  SELECT least(CAST(floor(sc.quality * 10) AS INT), 9) AS bin,
         CAST(substr(d.source, 4) AS INT) % 2 = 1 AS cur
  FROM sc JOIN documents d USING (doc_id)
), hist AS (
  SELECT bin,
         CAST(sum(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(sum(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM j GROUP BY bin
), filled AS (
  SELECT g.bin, coalesce(h.n_ref, 0) AS n_ref, coalesce(h.n_cur, 0) AS n_cur
  FROM (SELECT CAST(unnest(range(10)) AS INT) AS bin) g
  LEFT JOIN hist h USING (bin)
), tot AS (
  SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
         CAST(sum(n_cur) AS BIGINT) AS t_cur
  FROM filled
), binned AS (
  SELECT bin, n_ref, n_cur,
         CAST(round(((n_cur + 0.5) / (t_cur + 5.0) - (n_ref + 0.5) / (t_ref + 5.0))
           * ln(((n_cur + 0.5) / (t_cur + 5.0)) / ((n_ref + 0.5) / (t_ref + 5.0)))
           * 1000000) AS BIGINT) AS psi_x1e6
  FROM filled, tot
)
SELECT bin, n_ref, n_cur, psi_x1e6,
       CAST(sum(psi_x1e6) OVER () AS BIGINT) AS psi_total_x1e6
FROM binned
""".format(sw=", ".join(f"'{w}'" for w in __import__("nyc_taxi_data_pipeline_elt_spark.operators.text", fromlist=["LANG_STOPWORDS"]).LANG_STOPWORDS["en"]))


QUERIES.update(
    {
        "orders_grouping_sets": orders_grouping_sets,
        "quality_drift_psi": quality_drift_psi,
    }
)
ORACLE.update(
    {
        "orders_grouping_sets": GROUPING_SETS_ORACLE,
        "quality_drift_psi": PSI_ORACLE,
    }
)


def customer_entity_leaders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: blocking -> bounded-edit-distance
    matching -> deterministic leader clustering — the MDM/record-linkage
    workload over the customer table.

    Blocking on (nation, market segment) bounds the pair scan to
    block-quadratic (the corpus-linear guarantee every ER pipeline
    needs), and the pair build routes through the SAME collision-aware
    dispatcher as `similar_part_names`
    (operators/editdist.py:levenshtein_join_auto): PassJoin where
    segments prune, salted early-exit-levenshtein quadratic where the
    vocabulary is too dense for them — per block, by measured collision
    rate. Each record then joins the greedy-star leader rule: entity =
    min customer key in its closed match neighborhood. One-hop leader
    assignment is the deterministic canopy/star clustering of ER
    literature — transitive closure, when wanted, is
    `operators/dedup.py:connected_components` over the same pair frame.
    Plan: block-keyed shuffles only (pair build, neighbor min) and a
    final left join; no all-pairs, no iteration."""
    from nyc_taxi_data_pipeline_elt_spark.operators.editdist import (
        levenshtein_join_auto,
    )

    tune(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment"
    )
    blocked = cust.select(
        "c_custkey",
        "c_name",
        F.concat_ws("|", "c_nationkey", "c_mktsegment").alias("blk"),
    )
    pairs = levenshtein_join_auto(
        blocked, key_col="c_custkey", name_col="c_name", block_col="blk", tau=1
    ).select(F.col("key_a").alias("k_a"), F.col("key_b").alias("k_b"))
    # symmetrize by EXPLODING each pair into its two directions instead
    # of a self-union: the union consumed the pair pipeline twice, so
    # the whole dispatch-stats + PassJoin + salted-quadratic lineage
    # appeared TWICE in the plan (74 parquet scans / 72 exchanges
    # measured; AQE exchange reuse collapses identical subtrees at
    # runtime but the optimizer still plans both copies). One
    # consumption halves the plan (guide §2.4 — share, don't recompute).
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("k_a").alias("k"), F.col("k_b").alias("other")
                ),
                F.struct(
                    F.col("k_b").alias("k"), F.col("k_a").alias("other")
                ),
            )
        ).alias("e")
    ).select("e.k", "e.other")
    nbr_min = sym.groupBy("k").agg(F.min("other").alias("min_nbr"))
    return (
        cust.join(nbr_min, cust.c_custkey == nbr_min.k, "left")
        .select(
            "c_custkey",
            "c_name",
            F.least(
                F.col("c_custkey"), F.coalesce("min_nbr", F.col("c_custkey"))
            ).alias("entity_rep"),
        )
    )


ENTITY_LEADERS_ORACLE = """
WITH pairs AS (
  SELECT a.c_custkey AS k_a, b.c_custkey AS k_b
  FROM customer a
  JOIN customer b
    ON a.c_nationkey = b.c_nationkey
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
  WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
    AND levenshtein(a.c_name, b.c_name) <= 1
), sym AS (
  SELECT k_a AS k, k_b AS other FROM pairs
  UNION ALL
  SELECT k_b AS k, k_a AS other FROM pairs
), nbr AS (
  SELECT k, min(other) AS min_nbr FROM sym GROUP BY k
)
SELECT c.c_custkey, c.c_name,
       least(c.c_custkey, coalesce(n.min_nbr, c.c_custkey)) AS entity_rep
FROM customer c LEFT JOIN nbr n ON c.c_custkey = n.k
"""


QUERIES.update({"customer_entity_leaders": customer_entity_leaders})
ORACLE.update({"customer_entity_leaders": ENTITY_LEADERS_ORACLE})


def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition (moving-average STL-lite) of
    daily revenue: trend = centered 7-day moving sum, seasonality = mean
    detrended value per weekday, residual = the rest. The
    forecasting-prep pass that separates weekday rhythm from drift.

    Exactness: everything stays in the x7 integer domain — detrended
    ``7*total - trend_sum7`` is an exact BIGINT, so the per-weekday mean
    is an integer-sum / count division and residuals are derived from
    identical doubles. Trend is NULL on the 3 edge days of each end
    (incomplete window), excluded from the seasonal means. Plan: the
    data-scale work is one daily aggregate; every window/group after it
    runs on the O(days) frame (pmod single-partition spec, the metadata
    convention from operators/indexing.py)."""
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.expr(_CENTS).alias("c0"),
        )
        .groupBy("day")
        .agg(F.sum("c0").alias("total_cents"))
    )
    w7 = (
        Window.partitionBy(F.pmod(F.dayofmonth("day"), F.lit(1)))
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    with_trend = daily.select(
        "day",
        "total_cents",
        F.when(
            F.count("total_cents").over(w7) == 7,
            F.sum("total_cents").over(w7),
        ).alias("trend_sum7"),
        # Spark dayofweek: 1=Sunday..7=Saturday (oracle adds 1 to DuckDB's)
        F.dayofweek("day").alias("weekday"),
    ).withColumn(
        "detrended_x7",
        F.expr("7 * total_cents - trend_sum7").cast("long"),
    )
    wd = Window.partitionBy("weekday")
    seasoned = with_trend.select(
        "day",
        "total_cents",
        "trend_sum7",
        "weekday",
        "detrended_x7",
        (
            F.sum("detrended_x7").over(wd).cast("double")
            / F.count("detrended_x7").over(wd)
        ).alias("seasonal_x7"),
    )
    return seasoned.selectExpr(
        "day",
        "total_cents",
        "trend_sum7",
        "weekday",
        "detrended_x7",
        "seasonal_x7",
        "CAST(detrended_x7 AS DOUBLE) - seasonal_x7 AS residual_x7",
    )


SEASONAL_ORACLE = f"""
WITH daily AS (
  SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(sum({_CENTS}) AS BIGINT) AS total_cents
  FROM events GROUP BY 1
), t AS (
  SELECT day, total_cents,
         CASE WHEN count(total_cents) OVER w = 7
              THEN CAST(sum(total_cents) OVER w AS BIGINT) END AS trend_sum7,
         CAST(dayofweek(day) + 1 AS INT) AS weekday
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), d AS (
  SELECT day, total_cents, trend_sum7, weekday,
         CAST(7 * total_cents - trend_sum7 AS BIGINT) AS detrended_x7
  FROM t
)
SELECT day, total_cents, trend_sum7, weekday, detrended_x7,
       CAST(sum(detrended_x7) OVER (PARTITION BY weekday) AS DOUBLE)
         / count(detrended_x7) OVER (PARTITION BY weekday) AS seasonal_x7,
       CAST(detrended_x7 AS DOUBLE)
         - CAST(sum(detrended_x7) OVER (PARTITION BY weekday) AS DOUBLE)
           / count(detrended_x7) OVER (PARTITION BY weekday) AS residual_x7
FROM d
"""


def boilerplate_prefix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-boilerplate detector: the most repeated 5-token document
    PREFIXES and SUFFIXES across the corpus (shared headers/footers are
    the canonical crawl-template signal; span dedup removes them, this
    REPORTS them first so the removal threshold is an informed choice).
    Row-local slicing + one hash aggregate per end; repeated grams with
    >= 3 documents survive, with the smallest doc id as the example."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    base = docs.select(
        "doc_id", toks.alias("t")
    ).filter(F.size("t") >= 5)

    def ends(expr, kind):
        return (
            base.select(
                "doc_id", F.concat_ws(" ", expr).alias("gram")
            )
            .groupBy("gram")
            .agg(
                F.count("*").alias("n_docs"),
                F.min("doc_id").alias("example_doc"),
            )
            .filter(F.col("n_docs") >= 3)
            .select(F.lit(kind).alias("kind"), "gram", "n_docs", "example_doc")
        )

    return ends(F.slice(F.col("t"), 1, 5), "prefix").unionAll(
        ends(F.slice(F.col("t"), -5, 5), "suffix")
    )


BOILERPLATE_ORACLE = """
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
), ok AS (
  SELECT * FROM base WHERE len(t) >= 5
), pre AS (
  SELECT 'prefix' AS kind, array_to_string(t[1:5], ' ') AS gram,
         count(*) AS n_docs, CAST(min(doc_id) AS BIGINT) AS example_doc
  FROM ok GROUP BY 2 HAVING count(*) >= 3
), suf AS (
  SELECT 'suffix' AS kind, array_to_string(t[-5:], ' ') AS gram,
         count(*) AS n_docs, CAST(min(doc_id) AS BIGINT) AS example_doc
  FROM ok GROUP BY 2 HAVING count(*) >= 3
)
SELECT * FROM pre UNION ALL SELECT * FROM suf
"""


QUERIES.update(
    {
        "events_seasonal_decompose": events_seasonal_decompose,
        "boilerplate_prefix_report": boilerplate_prefix_report,
    }
)
ORACLE.update(
    {
        "events_seasonal_decompose": SEASONAL_ORACLE,
        "boilerplate_prefix_report": BOILERPLATE_ORACLE,
    }
)
