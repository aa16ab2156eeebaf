"""Bucketed co-located joins (no shuffle exchange) and upsert semantics."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.operators.upsert import upsert
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table
from nyc_taxi_data_pipeline_elt_spark.sources.writers import write_bucketed
from tests.conftest import SF_DIR


def _physical_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", buckets=8)
    write_bucketed(lineitem, "lineitem_b", "o_orderkey", buckets=8)

    a = spark.table("orders_b")
    b = spark.table("lineitem_b")
    # co-bucketed equi-join: without bucketing this plan needs two hash
    # exchanges; bucketed it must have none
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").count()
        plan = _physical_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_orderkey" not in join_section, plan
    # and the results are still correct
    n = joined.agg(F.sum("count")).collect()[0][0]
    assert n == load_table(spark, SF_DIR, "lineitem").count()


def test_upsert_semantics(spark):
    base = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    # corrections: zero out 10 orders' price, add a brand-new order
    updates = (
        base.orderBy("o_orderkey")
        .limit(10)
        .withColumn("o_totalprice", F.lit(0.0))
        .unionByName(
            spark.createDataFrame(
                [(99_999_999, 1.5, "O")], "o_orderkey bigint, o_totalprice double, o_orderstatus string"
            )
        )
    )
    merged = upsert(base, updates, "o_orderkey")
    assert merged.count() == base.count() + 1  # 10 updated in place, 1 inserted
    zeroed = merged.filter(F.col("o_totalprice") == 0.0).count()
    assert zeroed == 10
    assert merged.filter(F.col("o_orderkey") == 99_999_999).count() == 1
    # untouched rows identical to base
    untouched = merged.join(updates, "o_orderkey", "left_anti")
    assert untouched.exceptAll(
        base.join(updates, "o_orderkey", "left_anti")
    ).isEmpty()
