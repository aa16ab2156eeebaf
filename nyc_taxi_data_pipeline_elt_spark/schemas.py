"""Declared schemas — the reference's *declared-at-the-edges* schema system.

The reference declares fixed StructTypes only at the output edge
(``/root/reference/src/reporting_etl_job.py:36-45``) and in the Glue
catalog (``infra/main.tf:76-119``, ``infra/reporting_tables.tf``); inputs
are inferred with mergeSchema. We declare all of them here so empty-input
paths, conformance, and tests have a single source of truth.

Only primitive types appear in the reference (SURVEY.md §1.3): long,
double, timestamp, string, int. Money stays ``double`` for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- landing layer (raw trip files; mixed-case as on disk) -----------------
# Columns the reference code touches: process_data_glue.py:48,52,56,62,65.
LANDING_YELLOW_SCHEMA = T.StructType(
    [
        T.StructField("VendorID", T.LongType()),
        T.StructField("tpep_pickup_datetime", T.TimestampType()),
        T.StructField("tpep_dropoff_datetime", T.TimestampType()),
        T.StructField("passenger_count", T.LongType()),
        T.StructField("total_amount", T.DoubleType()),
    ]
)

LANDING_GREEN_SCHEMA = T.StructType(
    [
        T.StructField("VendorID", T.LongType()),
        T.StructField("lpep_pickup_datetime", T.TimestampType()),
        T.StructField("lpep_dropoff_datetime", T.TimestampType()),
        T.StructField("passenger_count", T.LongType()),
        T.StructField("total_amount", T.DoubleType()),
    ]
)

# --- consumer layer (unified trips; catalog DDL infra/main.tf:76-119) ------
CONSUMER_COLUMNS = [
    "vendor_id",
    "passenger_count",
    "total_amount",
    "tpep_pickup_datetime",
    "tpep_dropoff_datetime",
    "lpep_pickup_datetime",
    "lpep_dropoff_datetime",
    "trip_type",
    "trip_year",
    "trip_month",
]

CONSUMER_SCHEMA = T.StructType(
    [
        T.StructField("vendor_id", T.LongType()),
        T.StructField("passenger_count", T.LongType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("tpep_pickup_datetime", T.TimestampType()),
        T.StructField("tpep_dropoff_datetime", T.TimestampType()),
        T.StructField("lpep_pickup_datetime", T.TimestampType()),
        T.StructField("lpep_dropoff_datetime", T.TimestampType()),
        T.StructField("trip_type", T.StringType()),
        T.StructField("trip_year", T.IntegerType()),
        T.StructField("trip_month", T.IntegerType()),
    ]
)

CONSUMER_PARTITION_KEYS = ["trip_type", "trip_year", "trip_month"]

# --- reporting layer (reporting_etl_job.py:36-45) ---------------------------
Q1_SCHEMA = T.StructType(
    [
        T.StructField("report_month", T.StringType()),
        T.StructField("avg_total_amount", T.DoubleType()),
    ]
)

Q2_SCHEMA = T.StructType(
    [
        T.StructField("report_hour", T.IntegerType()),
        T.StructField("avg_passenger_count", T.DoubleType()),
    ]
)
