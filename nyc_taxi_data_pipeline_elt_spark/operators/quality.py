"""Declarative data-quality rules with dead-letter routing.

The reference hard-codes three conjunctive DQ filters
(``/root/reference/src/process_data_glue.py:60-69``) and silently drops
failing rows; its own to-do list asks for a DLQ for malformed rows
(``README.md:146``). Here rules are data, and the operator returns BOTH
streams: rows passing every rule, and rejected rows annotated with the
list of violated rule names.

Scale notes: the pass/fail split is two complementary filters over the
same scan — Catalyst pushes the conjunction into the parquet scan for the
good side; the bad side is typically a tiny fraction, and both sides stay
whole-stage-codegen (the violation list is built with JVM-side
``array``/``filter`` expressions, no UDF).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One named invariant; ``condition`` is True for GOOD rows."""

    name: str
    condition: Column


class QualityResult(NamedTuple):
    good: DataFrame
    bad: DataFrame  # original columns + `dq_violations: array<string>`


# The reference's exact rule set (process_data_glue.py:60-69), reusable for
# any trips-shaped frame.
def trips_rules() -> list[Rule]:
    return [
        Rule(
            "passenger_count_positive",
            F.col("passenger_count").isNotNull() & (F.col("passenger_count") > 0),
        ),
        Rule(
            "total_amount_non_negative",
            F.col("total_amount").isNotNull() & (F.col("total_amount") >= 0),
        ),
        Rule(
            "datetimes_present",
            F.col("pickup_time").isNotNull() & F.col("dropoff_time").isNotNull(),
        ),
    ]


# ---------------------------------------------------------------------------
# Aggregate-level expectations: the "active DQ monitoring with rule
# libraries" the reference's improvement list asks for (README.md:152) —
# row-level rules above catch bad ROWS; expectations catch bad BATCHES
# (row-count collapse, null-rate spikes, key-uniqueness breaks, domain
# drift) before they propagate downstream.


@dataclass(frozen=True)
class Expectation:
    """One table-level constraint.

    kinds: ``row_count_min`` (threshold), ``null_rate_max`` (column +
    threshold), ``unique`` (column), ``accepted_values`` (column +
    values), ``min_value`` / ``max_value`` (column + threshold).
    """

    name: str
    kind: str
    column: str | None = None
    threshold: float | None = None
    values: tuple = ()


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate every expectation in ONE aggregation pass over ``df`` and
    return a report frame ``(expectation, metric, passed)``.

    Fully lazy and JVM-side: all metrics compile into a single ``agg``
    (one scan, a 1-row result regardless of table size), verdicts are
    CASE expressions over that row, and ``stack`` unpivots it into the
    report — no driver action, no Python loop over results.

    Verdicts are computed on the UNROUNDED aggregate (``r{i}``); only the
    *reported* metric is rounded at 6dp for engine-portability. Rounding
    the verdict input would let a near-threshold violation slip: one
    duplicate key among >2M rows gives a duplicate fraction < 5e-7 that
    rounds to 0.0, silently passing a ``unique`` gate at scale.
    """
    if not expectations:
        raise ValueError("no expectations given")
    aggs = []
    verdicts = []
    n = F.count(F.lit(1)).cast("double")
    for i, e in enumerate(expectations):
        if e.kind == "row_count_min":
            m = n
            ok = F.col(f"r{i}") >= F.lit(float(e.threshold))
        elif e.kind == "null_rate_max":
            m = F.sum(F.col(e.column).isNull().cast("double")) / n
            ok = F.col(f"r{i}") <= F.lit(float(e.threshold or 0.0))
        elif e.kind == "unique":
            # duplicate fraction: 0.0 iff the column is unique
            m = (n - F.count_distinct(F.col(e.column)).cast("double")) / n
            ok = F.col(f"r{i}") <= F.lit(0.0)
        elif e.kind == "accepted_values":
            m = F.sum(
                (~F.col(e.column).isin(*e.values)).cast("double")
            ) / n
            ok = F.col(f"r{i}") <= F.lit(0.0)
        elif e.kind == "min_value":
            m = F.min(F.col(e.column)).cast("double")
            ok = F.col(f"r{i}") >= F.lit(float(e.threshold))
        elif e.kind == "max_value":
            m = F.max(F.col(e.column)).cast("double")
            ok = F.col(f"r{i}") <= F.lit(float(e.threshold))
        else:
            raise ValueError(f"unknown expectation kind {e.kind!r}")
        aggs.append(m.alias(f"r{i}"))
        aggs.append(F.round(m, 6).alias(f"m{i}"))
        verdicts.append(ok)

    stacked = []
    for i, e in enumerate(expectations):
        stacked += [
            F.lit(e.name),
            F.col(f"m{i}"),
            F.coalesce(verdicts[i], F.lit(False)),  # null metric = failed
        ]
    return df.agg(*aggs).select(
        F.stack(F.lit(len(expectations)), *stacked).alias(
            "expectation", "metric", "passed"
        )
    )


def apply_quality(df: DataFrame, rules: list[Rule]) -> QualityResult:
    """Split ``df`` into (good, bad-with-violations)."""
    if not rules:
        return QualityResult(df, df.filter(F.lit(False)).withColumn(
            "dq_violations", F.array().cast("array<string>")
        ))

    all_pass = rules[0].condition
    for r in rules[1:]:
        all_pass = all_pass & r.condition

    good = df.filter(all_pass)

    # array of violated rule names, built JVM-side: for each rule emit its
    # name or NULL, then compact.
    tagged = F.array_compact(
        F.array(
            *[F.when(~r.condition | r.condition.isNull(), F.lit(r.name)) for r in rules]
        )
    )
    bad = df.filter(~all_pass | all_pass.isNull()).withColumn("dq_violations", tagged)
    return QualityResult(good, bad)
