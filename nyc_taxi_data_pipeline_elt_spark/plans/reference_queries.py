"""Reference-surface queries mapped onto the driver's fixture tables.

Each entry mirrors one plan shape from SURVEY.md §2 (the reference's
operator inventory) over ``/root/testdata`` tables, paired with ANSI SQL
for the DuckDB oracle. ``orders`` plays the trip table (timestamp ->
year/month grouping, DQ filters over a double measure); ``events`` plays
the May-hourly shape (all rows fall in 2024-01 with full hour coverage).

Column-name and type parity rules (driver compares schema + value hash):
aggregates are aliased identically on both sides, and oracle SQL casts
DuckDB's BIGINT date-part outputs down to INT to match Spark's ``year``/
``month``/``hour`` return type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.functions import money_round, report_month_label
from nyc_taxi_data_pipeline_elt_spark.session import tune
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table


# --- Q1 shape: scan -> DQ filter -> derive year/month -> grouped avg -------
# Mirrors reporting_etl_job.py:86-92 + process_data_glue.py:60-74.
def q1_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_totalprice").isNotNull()
            & (F.col("o_totalprice") >= 0)
            & F.col("o_orderdate").isNotNull()
        )
        .withColumn("trip_year", F.year("o_orderdate"))
        .withColumn("trip_month", F.month("o_orderdate"))
        .groupBy("trip_year", "trip_month")
        .agg(money_round(F.avg("o_totalprice")).alias("avg_total_amount"))
        .select(
            report_month_label("trip_year", "trip_month").alias("report_month"),
            "avg_total_amount",
        )
    )


Q1_ORACLE = """
SELECT concat_ws('-', CAST(year(o_orderdate) AS VARCHAR),
                 lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0')) AS report_month,
       round(avg(o_totalprice), 2) AS avg_total_amount
FROM orders
WHERE o_totalprice IS NOT NULL AND o_totalprice >= 0 AND o_orderdate IS NOT NULL
GROUP BY year(o_orderdate), month(o_orderdate)
"""


# --- Q2 shape: month filter -> hour bucket -> grouped avg -------------------
# Mirrors reporting_etl_job.py:131-154 (May -> events' single month, Jan).
def q2_hourly_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.month("ts") == 1)
        .filter(F.col("ts").isNotNull())
        .withColumn("report_hour", F.hour("ts"))
        .groupBy("report_hour")
        .agg(money_round(F.avg("value")).alias("avg_value"))
    )


Q2_ORACLE = """
SELECT CAST(hour(ts) AS INTEGER) AS report_hour,
       round(avg(value), 2) AS avg_value
FROM events
WHERE month(ts) = 1 AND ts IS NOT NULL
GROUP BY 1
"""


# --- P3: conjunctive DQ predicates over full rows ---------------------------
# Mirrors process_data_glue.py:60-69 (passenger_count > 0, total >= 0,
# non-null datetimes) over orders' equivalents.
def dq_filter_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_custkey").isNotNull()
        & (F.col("o_custkey") > 0)
        & F.col("o_totalprice").isNotNull()
        & (F.col("o_totalprice") >= 0)
        & F.col("o_orderdate").isNotNull()
    )


DQ_ORACLE = """
SELECT * FROM orders
WHERE o_custkey IS NOT NULL AND o_custkey > 0
  AND o_totalprice IS NOT NULL AND o_totalprice >= 0
  AND o_orderdate IS NOT NULL
"""


# --- U1 + P2 + P7/P8: missing-column-tolerant union + coalesce unify --------
# Mirrors reporting_etl_job.py:123-143: yellow carries tpep_*, green lpep_*;
# unionByName pads the missing side with NULL, coalesce unifies.
def union_fleets_unify(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    yellow = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        F.lit("yellow").alias("trip_type"),
        F.col("o_orderdate").alias("tpep_pickup_datetime"),
    )
    green = orders.filter(F.col("o_orderstatus") != "O").select(
        "o_orderkey",
        F.lit("green").alias("trip_type"),
        F.col("o_orderdate").alias("lpep_pickup_datetime"),
    )
    unioned = yellow.unionByName(green, allowMissingColumns=True)
    return unioned.select(
        "o_orderkey",
        "trip_type",
        F.coalesce("tpep_pickup_datetime", "lpep_pickup_datetime").alias("pickup_ts"),
    )


UNION_ORACLE = """
WITH yellow AS (
  SELECT o_orderkey, 'yellow' AS trip_type,
         o_orderdate AS tpep_pickup_datetime,
         CAST(NULL AS TIMESTAMP) AS lpep_pickup_datetime
  FROM orders WHERE o_orderstatus = 'O'
), green AS (
  SELECT o_orderkey, 'green' AS trip_type,
         CAST(NULL AS TIMESTAMP) AS tpep_pickup_datetime,
         o_orderdate AS lpep_pickup_datetime
  FROM orders WHERE o_orderstatus <> 'O'
)
SELECT o_orderkey, trip_type,
       coalesce(tpep_pickup_datetime, lpep_pickup_datetime) AS pickup_ts
FROM (SELECT * FROM yellow UNION ALL SELECT * FROM green)
"""


# --- §2.6: global sort + limit (top-k), deterministic tiebreak --------------
# The reference sorts only at the consumption layer (analytics_job.py:35-51);
# here it is a range-exchange sort + limit. o_orderkey tiebreak keeps the
# row set deterministic for the oracle.
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-level expectations over orders — the reference README's
    own 'active DQ monitoring' to-do (README.md:152), evaluated in ONE
    aggregation pass (row-level rules catch bad rows; these catch bad
    batches: count collapse, null spikes, key breaks, domain drift)."""
    from nyc_taxi_data_pipeline_elt_spark.operators.quality import (
        Expectation,
        check_expectations,
    )

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    return check_expectations(
        orders,
        [
            Expectation("orders_nonempty", "row_count_min", threshold=1000),
            Expectation("custkey_not_null", "null_rate_max", "o_custkey", 0.0),
            Expectation("orderkey_unique", "unique", "o_orderkey"),
            Expectation(
                "status_domain",
                "accepted_values",
                "o_orderstatus",
                values=("O", "F", "P"),
            ),
            Expectation("price_non_negative", "min_value", "o_totalprice", 0.0),
        ],
    )


DQ_EXPECTATIONS_ORACLE = """
SELECT 'orders_nonempty' AS expectation,
       round(CAST(count(*) AS DOUBLE), 6) AS metric,
       count(*) >= 1000 AS passed
FROM orders
UNION ALL
SELECT 'custkey_not_null',
       round(sum(CAST(o_custkey IS NULL AS INT)) / CAST(count(*) AS DOUBLE), 6),
       sum(CAST(o_custkey IS NULL AS INT)) / CAST(count(*) AS DOUBLE) <= 0.0
FROM orders
UNION ALL
SELECT 'orderkey_unique',
       round((count(*) - count(DISTINCT o_orderkey)) / CAST(count(*) AS DOUBLE), 6),
       (count(*) - count(DISTINCT o_orderkey)) / CAST(count(*) AS DOUBLE) <= 0.0
FROM orders
UNION ALL
SELECT 'status_domain',
       round(sum(CAST(o_orderstatus NOT IN ('O','F','P') AS INT))
             / CAST(count(*) AS DOUBLE), 6),
       sum(CAST(o_orderstatus NOT IN ('O','F','P') AS INT))
             / CAST(count(*) AS DOUBLE) <= 0.0
FROM orders
UNION ALL
SELECT 'price_non_negative',
       round(CAST(min(o_totalprice) AS DOUBLE), 6),
       min(o_totalprice) >= 0.0
FROM orders
"""


QUERIES = {
    "q1_monthly_revenue": q1_monthly_revenue,
    "q2_hourly_avg_value": q2_hourly_avg_value,
    "dq_filter_orders": dq_filter_orders,
    "union_fleets_unify": union_fleets_unify,
    "topk_orders": topk_orders,
    "dq_expectations_orders": dq_expectations_orders,
}

ORACLE = {
    "q1_monthly_revenue": Q1_ORACLE,
    "q2_hourly_avg_value": Q2_ORACLE,
    "dq_filter_orders": DQ_ORACLE,
    "union_fleets_unify": UNION_ORACLE,
    "topk_orders": TOPK_ORACLE,
    "dq_expectations_orders": DQ_EXPECTATIONS_ORACLE,
}
