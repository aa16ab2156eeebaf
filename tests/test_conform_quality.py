"""Unit tests: schema conformance (drift handling) and DQ splitting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_taxi_data_pipeline_elt_spark.operators.conform import conform_to_schema
from nyc_taxi_data_pipeline_elt_spark.operators.quality import Rule, apply_quality

TARGET = T.StructType(
    [
        T.StructField("vendor_id", T.LongType()),
        T.StructField("passenger_count", T.LongType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("tpep_pickup_datetime", T.TimestampType()),
    ]
)


def test_conform_renames_pads_and_drops(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "junk")],
        T.StructType(
            [
                T.StructField("VendorID", T.IntegerType()),
                T.StructField("total_amount", T.DoubleType()),
                T.StructField("extra_col", T.StringType()),
            ]
        ),
    )
    out = conform_to_schema(df, TARGET, renames={"VendorID": "vendor_id"})
    assert [f.name for f in out.schema.fields] == [f.name for f in TARGET.fields]
    assert out.schema["vendor_id"].dataType == T.LongType()  # int -> long widened
    row = out.collect()[0]
    assert row.vendor_id == 1
    assert row.passenger_count is None  # padded typed NULL
    assert row.tpep_pickup_datetime is None
    assert "extra_col" not in out.columns


def test_conform_rejects_narrowing_drift(spark):
    # the reference's month-1 failure: double where the catalog says bigint
    df = spark.createDataFrame([(1.0,)], "passenger_count double")
    target = T.StructType([T.StructField("passenger_count", T.LongType())])
    with pytest.raises(TypeError, match="schema drift"):
        conform_to_schema(df, target)
    # explicit sanction works
    out = conform_to_schema(df, target, narrow_ok={"passenger_count"})
    assert out.collect()[0].passenger_count == 1
    assert out.schema["passenger_count"].dataType == T.LongType()


def test_quality_split_routes_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (0, 5.0), (2, -1.0), (None, None)],
        "passengers bigint, amount double",
    )
    rules = [
        Rule("passengers_positive", F.col("passengers").isNotNull() & (F.col("passengers") > 0)),
        Rule("amount_non_negative", F.col("amount").isNotNull() & (F.col("amount") >= 0)),
    ]
    good, bad = apply_quality(df, rules)
    assert [r.passengers for r in good.collect()] == [1]
    bad_rows = {tuple(r.dq_violations) for r in bad.collect()}
    assert ("passengers_positive",) in bad_rows  # the 0-passenger row
    assert ("amount_non_negative",) in bad_rows  # the -1 amount row
    assert ("passengers_positive", "amount_non_negative") in bad_rows  # all-null row
    assert good.count() + bad.count() == df.count()
