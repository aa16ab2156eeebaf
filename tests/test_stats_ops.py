"""Closed-form checks for the Welch t readout and the rolling z-score
anomaly screen (the engine queries are oracle-checked; these pin the
statistics themselves on crafted inputs)."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.plans.analytics import (
    _AB_EXPRS,
    _Z_EXPR,
)


def test_welch_t_matches_closed_form(spark):
    # arm A: 10, 12, 14 dollars; arm B: 20, 22, 24, 26 — hand-checkable.
    a = [10.0, 12.0, 14.0]
    b = [20.0, 22.0, 24.0, 26.0]
    rows = [(0, v) for v in a] + [(1, v) for v in b]
    df = spark.createDataFrame(rows, ["v", "value"])
    agg = df.selectExpr("v", "CAST(round(value * 100) AS BIGINT) AS c").agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("v") == 0, F.col("c")).otherwise(0)).alias("s_a"),
        F.sum(F.when(F.col("v") == 1, F.col("c")).otherwise(0)).alias("s_b"),
        F.sum(F.when(F.col("v") == 0, F.col("c") * F.col("c")).otherwise(0)).alias("q_a"),
        F.sum(F.when(F.col("v") == 1, F.col("c") * F.col("c")).otherwise(0)).alias("q_b"),
    )
    row = agg.selectExpr(*_AB_EXPRS).collect()[0]

    def stats(xs):
        n = len(xs)
        m = sum(xs) / n
        var = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, var

    na, ma, va = stats(a)
    nb, mb, vb = stats(b)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df_w = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert row["n_a"] == 3 and row["n_b"] == 4
    assert abs(row["mean_a"] - ma) < 1e-9 and abs(row["mean_b"] - mb) < 1e-9
    assert abs(row["var_a"] - va) < 1e-9 and abs(row["var_b"] - vb) < 1e-9
    assert abs(row["t_stat"] - t) < 1e-9
    assert abs(row["welch_df"] - df_w) < 1e-9


def test_rolling_zscore_flags_spike_only(spark):
    # Flat series of 100 with one 1000-cent day: only that day may flag,
    # and the first 3 days must score NULL (insufficient baseline).
    base = datetime.datetime(2024, 1, 1)
    vals = [100] * 10
    vals[7] = 1000
    rows = [
        ("purchase", base + datetime.timedelta(days=i), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["event_type", "day", "c"])
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    scored = df.select(
        "event_type",
        "day",
        "c",
        F.count("c").over(w).alias("rn"),
        F.sum("c").over(w).alias("rs"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("rq"),
    ).selectExpr("day", "c", f"{_Z_EXPR} AS z")
    out = {r["day"].day: r["z"] for r in scored.collect()}
    assert out[1] is None and out[2] is None and out[3] is None
    # flat baseline -> zero variance -> no score rather than inf
    assert out[5] is None
    # the spike day: baseline all-100 -> var 0 -> NULL too? No: var of
    # seven 100s is 0, so the spike itself cannot score against a
    # zero-variance baseline — it is day 9 (baseline contains the 1000)
    # that gets a large NEGATIVE z for the return to 100.
    assert out[8] is None
    assert out[9] is not None and out[9] < -0.3
