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
