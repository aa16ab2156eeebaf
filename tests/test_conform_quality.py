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


def test_expectations_catch_bad_batches(spark):
    """Aggregate expectations: a batch with a null spike and a duplicate
    key fails exactly those checks, one aggregation pass for all."""
    from nyc_taxi_data_pipeline_elt_spark.operators.quality import (
        Expectation,
        check_expectations,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 3.0), (2, "b", -1.0)],
        "k int, name string, amount double",
    )
    report = {
        r.expectation: (r.metric, r.passed)
        for r in check_expectations(
            df,
            [
                Expectation("nonempty", "row_count_min", threshold=1),
                Expectation("name_nulls", "null_rate_max", "name", 0.1),
                Expectation("k_unique", "unique", "k"),
                Expectation("amount_min", "min_value", "amount", 0.0),
                Expectation("amount_max", "max_value", "amount", 100.0),
            ],
        ).collect()
    }
    assert report["nonempty"] == (3.0, True)
    assert report["name_nulls"][1] is False  # 1/3 > 0.1
    assert report["k_unique"][1] is False  # duplicate k=2
    assert report["amount_min"] == (-1.0, False)
    assert report["amount_max"] == (5.0, True)


def test_expectation_verdicts_use_unrounded_metric(spark):
    """One duplicate among 3M keys gives a duplicate fraction ~3.3e-7
    that ROUNDS to 0.0 at the report's 6dp — the verdict must still fail,
    i.e. be computed on the unrounded aggregate, or a unique gate
    silently passes at scale."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_pipeline_elt_spark.operators.quality import (
        Expectation,
        check_expectations,
    )

    df = spark.range(3_000_000).union(spark.range(1)).select(
        F.col("id").alias("k")
    )
    row = check_expectations(df, [Expectation("k_unique", "unique", "k")]).first()
    assert row.metric == 0.0  # reported metric is the rounded one
    assert row.passed is False  # verdict saw the raw ~3.3e-7


def test_expectations_empty_list_raises(spark):
    import pytest

    from nyc_taxi_data_pipeline_elt_spark.operators.quality import (
        check_expectations,
    )

    with pytest.raises(ValueError, match="no expectations"):
        check_expectations(spark.range(3), [])
