"""Slowly-changing-dimension (SCD Type 2) interval build from a change
stream — the warehouse-ETL operator the reference's medallion layering
points at but never implements (its consumer layer overwrites in place;
an SCD2 consumer would keep history).

Given an event stream ``(key, attr, ts)``, emit one row per *run* of an
unchanged attribute value: ``valid_from`` = first ts of the run,
``valid_to`` = start of the next run (NULL while current), ``version`` =
1-based change counter per key.

Scale shape: one window over (key, ts) — a single hash-partitioned sort
per key group, no self-joins, no iteration. The run-collapse is the
lag-compare + filter idiom (same plan family as sessionization), so a
100 TB event table costs exactly one shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse ``(key, attr, ts)`` events into SCD2 validity intervals.

    Returns ``(key, attr, version, valid_from, valid_to, is_current)``
    with ``valid_to`` NULL on each key's current version. ``tiebreak``
    orders events within an identical timestamp (pass a unique column
    for determinism). NULL attr values are compared null-safely (a
    NULL -> NULL transition is not a change).
    """
    cols = [F.col(key), F.col(attr), F.col(ts_col).alias("valid_from")]
    order: list[Column] = [F.col("valid_from")]
    if tiebreak:
        cols.append(F.col(tiebreak).alias("_tb"))
        order.append(F.col("_tb"))
    base = df.select(*cols)
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(F.col(attr)).over(w)
    changed = (F.row_number().over(w) == 1) | ~F.col(attr).eqNullSafe(prev)

    points = base.withColumn("_chg", changed).filter(F.col("_chg"))
    wk = Window.partitionBy(key).orderBy(*order)
    return (
        points.withColumn("version", F.row_number().over(wk))
        .withColumn("valid_to", F.lead("valid_from").over(wk))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            key, attr, "version", "valid_from", "valid_to", "is_current"
        )
    )
