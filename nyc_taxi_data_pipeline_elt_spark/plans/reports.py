"""The reference's two canonical reports, reference-shaped (SURVEY.md §2.4).

Q1 — monthly average revenue over yellow trips
(``/root/reference/src/reporting_etl_job.py:73-105``; README.md:43).
Q2 — hourly average passenger count over yellow ∪ green, May only
(``reporting_etl_job.py:108-161``; README.md:44).

These operate on the *consumer-schema* DataFrame (schemas.CONSUMER_SCHEMA)
and preserve the reference's degenerate-input contract: ``None`` input ->
``None`` output (callers write a schema-correct empty report, sinks S8).

Both aggregations are single hash-aggregates — Spark plans partial
(map-side) + final HashAggregate automatically, so the only shuffle is
on the (few-valued) group keys; the plan is identical at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.functions import (
    money_round,
    report_month_label,
    unified_pickup,
)


def q1_monthly_revenue(trips: DataFrame | None) -> DataFrame | None:
    """groupBy(trip_year, trip_month).avg(total_amount), labeled + rounded.

    Mirrors reporting_etl_job.py:86-92.
    """
    if trips is None:
        return None
    return (
        trips.groupBy("trip_year", "trip_month")
        .agg(F.avg("total_amount").alias("avg_total_amount_raw"))
        .select(
            report_month_label("trip_year", "trip_month").alias("report_month"),
            money_round(F.col("avg_total_amount_raw")).alias("avg_total_amount"),
        )
    )


def q2_hourly_passengers(
    yellow: DataFrame | None, green: DataFrame | None, month: int = 5
) -> DataFrame | None:
    """union-by-name -> May filter -> hour(pickup) -> avg(passenger_count).

    Mirrors reporting_etl_job.py:108-161 including the one-side-missing
    passthrough (:123-126) and the missing-column-tolerant union (:128, U1).
    """
    if yellow is None and green is None:
        return None
    if yellow is None:
        unioned = green
    elif green is None:
        unioned = yellow
    else:
        unioned = yellow.unionByName(green, allowMissingColumns=True)

    pickup = unified_pickup("tpep_pickup_datetime", "lpep_pickup_datetime")
    return (
        unioned.filter(F.col("trip_month") == month)
        .withColumn("pickup_time_for_analysis", pickup)
        .filter(F.col("pickup_time_for_analysis").isNotNull())
        .withColumn("report_hour", F.hour("pickup_time_for_analysis"))
        .groupBy("report_hour")
        .agg(money_round(F.avg("passenger_count")).alias("avg_passenger_count"))
    )
