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


def pack_sequences(
    df: DataFrame,
    capacity: int,
    weight_col: str,
    order_col: str,
    partitions: int | None = None,
) -> DataFrame:
    """Sequence packing — assign each document its (sequence id, offset)
    in a stream of fixed-``capacity`` training sequences, documents laid
    end-to-end in ``order_col`` order. The core corpus->training-batch
    step: consumers emit sequence ``seq_id`` by concatenating its docs at
    their ``seq_offset``, splitting any straddler at the boundary
    (cumulative-binning contract: offsets are exact, a document whose
    span crosses a boundary continues into the next sequence).

    Distributed exactly like :func:`with_global_index`: the global
    running token total is a per-partition cumulative sum plus a
    broadcast per-partition offset — one range exchange and an
    O(partitions) side job, never a single-task global window.
    """
    spark = df.sparkSession
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    ranged = df.repartitionByRange(partitions, F.col(order_col)).persist()

    pid = F.spark_partition_id()
    sums = ranged.groupBy(pid.alias("pid")).agg(
        F.sum(weight_col).alias("toks")
    )
    # pmod(pid, 1) is 0 for every row but NOT foldable (a lit(0)
    # partition key gets constant-folded away, restoring the empty
    # partition spec): keeps the intended O(partitions)-row single
    # partition while silencing the WindowExec no-partition warning
    w = (
        Window.partitionBy(F.pmod(F.col("pid"), F.lit(1)))
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sums.select(
        "pid", F.coalesce(F.sum("toks").over(w), F.lit(0)).alias("part_offset")
    )
    local_before = F.coalesce(
        F.sum(weight_col).over(
            Window.partitionBy(pid)
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    cum = F.col("part_offset") + F.col("__local_before")
    return (
        ranged.withColumn("__pid", pid)
        .withColumn("__local_before", local_before)
        .join(F.broadcast(offsets), F.col("__pid") == F.col("pid"))
        .withColumn("seq_id", F.floor(cum / F.lit(capacity)).cast("long"))
        .withColumn("seq_offset", (cum % F.lit(capacity)).cast("long"))
        .drop("__pid", "__local_before", "pid", "part_offset")
    )


def with_global_index(
    df: DataFrame,
    order_col: str | list[str],
    index_name: str = "example_id",
    partitions: int | None = None,
) -> DataFrame:
    """Add a deterministic contiguous 0-based ``index_name`` column in
    ``order_col`` order (``order_col`` — a column name or a list of
    names ordered lexicographically — must be unique as a whole; it is
    the total order that makes the index reproducible across
    layouts/reruns)."""
    spark = df.sparkSession
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    ranged = df.repartitionByRange(
        partitions, *[F.col(c) for c in order_cols]
    ).persist()

    pid = F.spark_partition_id()
    # per-partition counts -> cumulative start offset of each partition
    counts = ranged.groupBy(pid.alias("pid")).count()
    # pmod(pid, 1) is 0 for every row but NOT foldable (a lit(0)
    # partition key gets constant-folded away, restoring the empty
    # partition spec): keeps the intended O(partitions)-row single
    # partition while silencing the WindowExec no-partition warning
    w = (
        Window.partitionBy(F.pmod(F.col("pid"), F.lit(1)))
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "pid", F.coalesce(F.sum("count").over(w), F.lit(0)).alias("offset")
    )

    local_rank: Column = F.row_number().over(
        Window.partitionBy(pid).orderBy(*order_cols)
    )
    out = (
        ranged.withColumn("__pid", pid)
        .withColumn("__local", local_rank)
        .join(F.broadcast(offsets), F.col("__pid") == F.col("pid"))
        .withColumn(index_name, F.col("offset") + F.col("__local") - 1)
        .drop("__pid", "__local", "pid", "offset")
    )
    return out


def snake_pack_shards(
    df: DataFrame,
    n_shards: int,
    weight_col: str,
    key_col: str,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Balanced shard packing — assign rows to ``n_shards`` shards so the
    per-shard ``weight_col`` totals are near-equal (the LPT/boustrophedon
    greedy: sort by weight descending, deal ranks out in a snake —
    0..k-1 then k-1..0 — so every shard receives one row per round and
    heavy/light rows alternate sides). The training-shard sizing step:
    hash sharding (``assign_shards``) balances COUNTS, this balances
    token budgets, which is what makes per-shard training steps uniform.

    Deterministic (ties broken on ``key_col``) and distributed exactly
    like :func:`with_global_index` — the descending-weight global rank is
    a range exchange plus a broadcast offset join, never a single-task
    window. The snake mapping is pure per-row arithmetic on the rank.
    """
    ranked = with_global_index(
        df.withColumn("__wneg", -F.col(weight_col)),
        [
            "__wneg",
            key_col,
        ],
        index_name="__rank",
    )
    rnd = F.expr(f"__rank div {n_shards}")  # integer division on longs
    pos = F.col("__rank") % n_shards
    shard = F.when(rnd % 2 == 0, pos).otherwise(n_shards - 1 - pos)
    return ranked.withColumn(shard_col, shard.cast("int")).drop(
        "__wneg", "__rank"
    )
