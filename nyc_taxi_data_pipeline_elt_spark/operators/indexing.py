"""Global contiguous row indexing — the scalable zipWithIndex.

Training corpora need stable global example ids (0..n-1). The naive
DataFrame spelling — ``row_number() OVER (ORDER BY key)`` with no
partitioning — collapses the whole table into ONE task and is the
canonical 100 TB fail. The scalable pattern is three cheap steps:

1. range-partition by the sort key + sort within partitions (one
   exchange plus a partition-local sort, same total work as any
   distributed sort);
2. count rows per partition (tiny aggregate);
3. broadcast the per-partition cumulative offsets back and add them to
   each row's position WITHIN its partition.

Step 3's local position historically came from ``row_number() OVER
(PARTITION BY spark_partition_id())`` — logically partition-local, but
Catalyst cannot prove the data is already clustered by its own partition
id, so it inserts a SECOND full-data hash exchange (visible as
``Exchange hashpartitioning(_w0, ...)`` in the physical plan) just to
satisfy the window's distribution requirement. The local position is
instead read off ``monotonically_increasing_id()``, whose bit layout is
a documented API contract (partition id in the upper 31 bits, a
consecutive 0-based record counter in the lower 33): after
``sortWithinPartitions`` the low 33 bits ARE the local rank, computed in
a narrow JVM projection with no exchange at all. Total cost: ONE range
exchange + a local sort + an O(partitions) side job.

``monotonically_increasing_id`` remains unfit as a GLOBAL id (values are
layout-dependent and non-contiguous across partitions) — it is only the
per-partition counter here; layout independence is restored by the
deterministic range partitioning + offset arithmetic, and is pinned by
``tests/test_properties.py`` / the oracle parity suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# monotonically_increasing_id(): upper 31 bits = partition id, lower 33
# bits = 0-based consecutive record number within the partition (API-
# documented layout).
_MID_RECORD_BITS = 33
_MID_RECORD_MASK = (1 << _MID_RECORD_BITS) - 1


def _ranged_with_local(
    df: DataFrame, order_cols: list[str], partitions: int
) -> tuple[DataFrame, DataFrame]:
    """Range-partition ``df`` by ``order_cols``, sort within partitions,
    and attach ``__pid`` / ``__local`` (0-based rank within partition) —
    all from the ``monotonically_increasing_id`` bit layout, so the only
    exchange in the whole construction is the range partitioning itself.

    Returns ``(body, counts)``: the persisted body frame and its per-
    ``__pid`` row counts (the O(partitions) metadata frame callers turn
    into offsets; returning it lets them reuse the same counts for
    n-row scalars without a second scan). Callers own ``body.unpersist()``.
    """
    cols = [F.col(c) for c in order_cols]
    body = (
        df.repartitionByRange(partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.expr(f"shiftright(__mid, {_MID_RECORD_BITS})"))
        .withColumn("__local", F.expr(f"__mid & {_MID_RECORD_MASK}"))
        .drop("__mid")
        .persist()
    )
    counts = body.groupBy("__pid").agg(F.count("*").alias("count"))
    return body, counts


def offsets_from_counts(
    counts: DataFrame, value_col: str = "count", offset_name: str = "offset"
) -> DataFrame:
    """Exclusive prefix sums of the per-partition ``value_col`` — the
    broadcastable O(partitions) offset frame. pmod(__pid, 1) is 0 for
    every row but NOT foldable (a lit(0) partition key gets constant-
    folded away, restoring the empty partition spec): keeps the intended
    O(partitions)-row single partition while silencing the WindowExec
    no-partition warning."""
    w = (
        Window.partitionBy(F.pmod(F.col("__pid"), F.lit(1)))
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return counts.select(
        F.col("__pid").alias("__opid"),
        F.coalesce(F.sum(value_col).over(w), F.lit(0)).alias(offset_name),
    )


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

    Distributed like :func:`with_global_index` — one range exchange, a
    partition-local sort, an O(partitions) broadcast side job. Unlike
    the rank (which falls out of the mid bit layout), the per-partition
    EXCLUSIVE PREFIX SUM of weights is a running aggregate, and the
    window spelling (``sum OVER (PARTITION BY partition-id)``) pays the
    second full-data exchange the module docstring describes. The local
    cumulative sum is instead one narrow Arrow ``mapInPandas`` stage —
    a per-partition running total carried across record batches; no
    shuffle, integer weights stay exact in int64, double weights
    accumulate left-to-right exactly like the running-sum window would.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    spark = df.sparkSession
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    cols = [F.col(order_col)]
    body = (
        df.repartitionByRange(partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(
            "__pid",
            F.expr(
                f"shiftright(monotonically_increasing_id(), {_MID_RECORD_BITS})"
            ),
        )
    )
    integral = df.schema[weight_col].dataType.simpleString() in (
        "tinyint",
        "smallint",
        "int",
        "bigint",
    )
    out_field = StructField(
        "__local_before", LongType() if integral else DoubleType(), False
    )
    schema = StructType(body.schema.fields + [out_field])
    wname = weight_col

    def _running(batches):
        import numpy as np

        run = 0
        for pdf in batches:
            w = pdf[wname].to_numpy()
            cs = w.cumsum()
            pdf = pdf.copy()
            # Exclusive prefix by SHIFTING the cumsum, not by cs - w:
            # in floating point cs[i] - w[i] != cs[i-1], so only the
            # shifted form is the left-to-right running sum for double
            # weights too (for integral weights they coincide).
            excl = np.concatenate(([0], cs[:-1])) if len(w) else cs
            pdf["__local_before"] = excl + run
            run = run + (int(cs[-1]) if integral else float(cs[-1])) if len(w) else run
            yield pdf

    body = body.mapInPandas(_running, schema=schema).persist()

    sums = body.groupBy("__pid").agg(F.sum(weight_col).alias("toks"))
    offsets = offsets_from_counts(sums, "toks", "part_offset")
    cum = F.col("part_offset") + F.col("__local_before")
    return (
        body.join(F.broadcast(offsets), F.col("__pid") == F.col("__opid"))
        .withColumn("seq_id", F.floor(cum / F.lit(capacity)).cast("long"))
        .withColumn("seq_offset", (cum % F.lit(capacity)).cast("long"))
        .drop("__pid", "__local_before", "__opid", "part_offset")
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
    layouts/reruns). One range exchange, zero other data shuffles: the
    local rank is the mid-derived ``__local`` (module docstring), and
    the partition offsets arrive by broadcast."""
    spark = df.sparkSession
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    body, counts = _ranged_with_local(df, order_cols, partitions)
    offsets = offsets_from_counts(counts)
    return (
        body.join(F.broadcast(offsets), F.col("__pid") == F.col("__opid"))
        .withColumn(index_name, F.col("offset") + F.col("__local"))
        .drop("__pid", "__local", "__opid", "offset")
    )


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


def zorder_key(
    cols: list,
    bounds: list[tuple[float, float]],
    bits_per_col: int | None = None,
) -> F.Column:
    """64-bit Z-order (Morton) key over numeric columns, pure JVM-side.

    Each column is affinely scaled by its global ``[lo, hi]`` bound into
    a ``bits_per_col``-bit integer grid (values outside the bound are
    clamped; NULL lands in cell 0 so null rows cluster together), then
    the grid coordinates are bit-interleaved column-major: bit ``i`` of
    column ``j`` lands at key position ``i * k + j``. Sorting by the key
    therefore walks the space-filling Z-curve, which is what makes the
    per-file min/max envelopes recorded at snapshot-commit time tight in
    EVERY clustered dimension at once — the layout step behind
    ``SnapshotTable.optimize`` (Delta's OPTIMIZE ZORDER BY,
    reference writes Delta at src/process_data_glue.py:186-190).

    The whole key is shiftleft/shiftright/AND/OR integer arithmetic on
    longs — no UDF, fully inside whole-stage codegen, and O(1) per row
    (``k * bits`` fused bit ops). Default grid: ``min(16, 63 // k)``
    bits per column, so the key always fits a signed 64-bit long.
    """
    k = len(cols)
    if k == 0 or len(bounds) != k:
        raise ValueError("zorder_key: cols and bounds must align, non-empty")
    bits = bits_per_col if bits_per_col is not None else min(16, 63 // k)
    if bits * k > 63:
        raise ValueError(f"zorder_key: {bits} bits x {k} cols exceeds a long")
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, (c, (lo, hi)) in enumerate(zip(cols, bounds)):
        col = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        if span > 0:
            cell = F.floor(
                (col.cast("double") - float(lo)) / span * float(top)
            )
            cell = F.least(
                F.greatest(cell, F.lit(0).cast("long")),
                F.lit(top).cast("long"),
            )
        else:  # degenerate bound: every row in cell 0
            cell = F.lit(0).cast("long")
        cell = F.coalesce(cell, F.lit(0).cast("long"))
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * k + j
                )
            )
    return z
