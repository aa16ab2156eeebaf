"""As-of (most-recent-prior) join — an operator Spark lacks natively.

Implemented as the union-sort-window composition, the scalable shape:

1. tag right rows (the "quotes") and left rows (the "probes"), union them
2. one window per key, ordered by (ts, side) — right rows sort before
   left rows at equal ts, giving inclusive <= semantics
3. ``last_value(payload) IGNORE NULLS`` carries the latest right payload
   forward; filter back to left rows

Cost: exactly one shuffle (hash partition on the key) + one sort within
partitions — the same price as a sort-merge join, with no range-explosion.
This is preferable at 100 TB to per-group ``applyInPandas`` +
``pd.merge_asof`` (which forces Python serialization of every group).

The right side must be unique per (key, ts) for deterministic results —
callers dedupe first (e.g. keep the max payload id per timestamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``key``.

    Left rows with no prior right row keep NULL payloads (left-join
    semantics). Output = all left columns + ``payload`` columns.
    """
    left_cols = left.columns
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c != key],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}")
            for c in payload
        ],
        *[F.col(c) for c in left_cols if c != key],
    )
    unioned = r.unionByName(l)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in payload
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        key,
        *[c for c in left_cols if c != key],
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in payload],
    )
