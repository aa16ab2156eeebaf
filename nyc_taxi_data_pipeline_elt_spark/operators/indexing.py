"""Global contiguous row indexing — the scalable zipWithIndex.

Training corpora need stable global example ids (0..n-1). The naive
DataFrame spelling — ``row_number() OVER (ORDER BY key)`` with no
partitioning — collapses the whole table into ONE task and is the
canonical 100 TB fail. The scalable pattern is three cheap steps:

1. range-partition by the sort key (one exchange, same as any sort);
2. count rows per partition (tiny aggregate on spark_partition_id);
3. broadcast the per-partition cumulative offsets back and add them to
   a per-partition ``row_number`` (which needs NO cross-partition data).

Total cost: one range exchange + one O(partitions) side job — versus the
single-task global window. ``monotonically_increasing_id`` is NOT a
substitute: its values are layout-dependent and non-contiguous.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_index(
    df: DataFrame,
    order_col: str,
    index_name: str = "example_id",
    partitions: int | None = None,
) -> DataFrame:
    """Add a deterministic contiguous 0-based ``index_name`` column in
    ``order_col`` order (``order_col`` must be unique — it is the total
    order that makes the index reproducible across layouts/reruns)."""
    spark = df.sparkSession
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    ranged = df.repartitionByRange(partitions, F.col(order_col)).persist()

    pid = F.spark_partition_id()
    # per-partition counts -> cumulative start offset of each partition
    counts = ranged.groupBy(pid.alias("pid")).count()
    w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("count").over(w), F.lit(0)).alias("offset")
    )

    local_rank: Column = F.row_number().over(
        Window.partitionBy(pid).orderBy(order_col)
    )
    out = (
        ranged.withColumn("__pid", pid)
        .withColumn("__local", local_rank)
        .join(F.broadcast(offsets), F.col("__pid") == F.col("pid"))
        .withColumn(index_name, F.col("offset") + F.col("__local") - 1)
        .drop("__pid", "__local", "pid", "offset")
    )
    return out
