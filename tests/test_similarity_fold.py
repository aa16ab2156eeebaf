"""Pin the folded-form literal cosine/dot to the Column form it replaces.

``cosine_lit`` / ``dot_lit_sql`` exist purely to cut driver-side build
cost (one SQL parse instead of ~6,500 py4j round-trips per cosine).
They are only sound if the OPTIMIZED plan is byte-identical to what
Catalyst produces from the Column form ``cosine(col, F.array(*lits))``
after constant folding — same terms, same association, same literals —
so the executed computation (and therefore every rounded cos_sim) is
the same IEEE sequence. These tests pin that equivalence so a Spark
upgrade or an edit to either builder that breaks it fails fast.
"""

from __future__ import annotations

import math
import re

import pyspark.sql.functions as F

from nyc_taxi_data_pipeline_elt_spark.operators.similarity import (
    _self_dot,
    cosine,
    cosine_lit,
    dot,
    dot_lit_sql,
    dot_sql,
)

# deterministic, non-round doubles (exercise repr round-tripping)
_Q = [math.sin(i * 1.7) * (1 + i / 7.0) for i in range(16)]


def _optimized(df) -> str:
    # strip per-session expression-ID allocations (#N) — two plans built
    # back to back differ only in those counters; everything else
    # (literal bytes, operators, association) must match exactly
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return re.sub(r"#\d+", "#", plan)


def _frame(spark):
    rows = [
        (i, [math.cos(i + j * 0.3) for j in range(16)]) for i in range(8)
    ]
    return spark.createDataFrame(rows, "vec_id: long, v: array<double>")


def test_cosine_lit_plan_matches_column_form(spark):
    base = _frame(spark)
    qvec = F.array(*[F.lit(float(x)) for x in _Q])
    col_form = base.select(
        F.round(cosine(F.col("v"), qvec, dim=16), 6).alias("cos_sim")
    )
    lit_form = base.select(
        F.round(cosine_lit("v", _Q), 6).alias("cos_sim")
    )
    assert _optimized(lit_form) == _optimized(col_form)


def test_dot_lit_first_plan_matches_column_form(spark):
    base = _frame(spark)
    qvec = F.array(*[F.lit(float(x)) for x in _Q])
    qn = math.sqrt(_self_dot([float(x) for x in _Q]))
    col_form = base.select(
        F.round(
            dot(qvec, F.col("v"), 16)
            / (
                F.sqrt(dot(qvec, qvec, 16))
                * F.sqrt(dot(F.col("v"), F.col("v"), 16))
            ),
            6,
        ).alias("cos_sim")
    )
    lit_form = base.select(
        F.round(
            F.expr(
                f"({dot_lit_sql('v', [float(x) for x in _Q], lit_first=True)})"
                f" / ({qn!r}D * SQRT(({dot_sql('v', 'v', 16)})))"
            ),
            6,
        ).alias("cos_sim")
    )
    assert _optimized(lit_form) == _optimized(col_form)


def test_dot_lit_plan_matches_column_form(spark):
    base = _frame(spark)
    qvec = F.array(*[F.lit(float(x)) for x in _Q])
    col_form = base.select(
        dot(F.col("v"), qvec, 16).alias("d")
    )
    lit_form = base.select(
        F.expr(dot_lit_sql("v", [float(x) for x in _Q])).alias("d")
    )
    assert _optimized(lit_form) == _optimized(col_form)


def test_cosine_lit_values_equal_column_form(spark):
    base = _frame(spark)
    qvec = F.array(*[F.lit(float(x)) for x in _Q])
    col_vals = [
        r["c"]
        for r in base.select(
            F.round(cosine(F.col("v"), qvec, dim=16), 6).alias("c")
        )
        .orderBy("vec_id")
        .collect()
    ]
    lit_vals = [
        r["c"]
        for r in base.select(F.round(cosine_lit("v", _Q), 6).alias("c"))
        .orderBy("vec_id")
        .collect()
    ]
    assert lit_vals == col_vals


def test_lit_d_round_trips_exactly(spark):
    # repr-based literals must re-read to the same bits through Spark's
    # SQL parser, including negatives and subnormal-ish magnitudes
    vals = [1.0 / 3.0, -2.7182818284590452, 1e-300, 123456789.123456789]
    got = spark.sql(
        "SELECT " + ", ".join(f"{v!r}D AS c{i}" for i, v in enumerate(vals))
    ).first()
    assert [got[i] for i in range(len(vals))] == vals
