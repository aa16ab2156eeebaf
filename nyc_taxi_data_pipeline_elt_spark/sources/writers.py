"""Sinks (SURVEY.md §2.1: S6, S7, S8).

Partition-scoped dynamic overwrite replaces the reference's Delta
partitioned overwrite (``/root/reference/src/process_data_glue.py:186-190``)
— the only Delta capability the reference uses. ``partitionOverwriteMode=
dynamic`` (set in session.RUNTIME_CONFS) makes ``mode("overwrite")``
replace only the partitions present in the incoming DataFrame, which is
what makes per-(month, fleet) incremental re-runs safe at scale.
"""

from __future__ import annotations

import shutil
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Consumer-layer sink (S6): partitioned, dynamic overwrite."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_report(df: DataFrame, path: str) -> None:
    """Reporting sink (S7): plain overwrite parquet
    (``reporting_etl_job.py:102,158``). Reports are tiny (<= dozens of
    rows) — coalesce to one file so the consumption layer reads one
    object, not one per shuffle partition.
    """
    df.coalesce(1).write.mode("overwrite").parquet(path)


def write_empty_report(spark: SparkSession, schema: T.StructType, path: str) -> None:
    """Empty-DF schema-only sink (S8): a valid parquet file carrying only
    metadata when input is empty (``reporting_etl_job.py:65-70``)."""
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(path)


# Formats with first-class Spark readers/writers. Parquet is the lake
# default (columnar, statistics, pushdown); ORC is its peer; CSV/JSON are
# interchange edges — no pushdown, schema must be re-declared on read.
SUPPORTED_FORMATS = ("parquet", "orc", "json", "csv")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Format-parameterized sink covering the interchange formats."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Bucketed catalog table: pre-hash-partitioned (and optionally
    pre-sorted) on ``key`` so later equi-joins/aggregations on ``key``
    between co-bucketed tables run with NO shuffle exchange — the
    bucketing story for repeated fact-fact joins at 100 TB, where the
    one-time write cost amortizes over every downstream join.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an in-memory catalog forgets managed tables between sessions but
    # their warehouse directories survive; clear a stale location so the
    # re-create doesn't collide (LOCATION_ALREADY_EXISTS)
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith(("file:", "/")):
        leftover = Path(warehouse.removeprefix("file:")) / table.lower()
        if leftover.exists():
            shutil.rmtree(leftover, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def write_range_clustered(
    df: DataFrame, path: str, key: str, files: int = 8
) -> None:
    """Range-cluster a table on ``key`` before writing: global range
    partitioning + in-file sort means each parquet file (and each row
    group inside it) covers a narrow, non-overlapping slice of the key
    space. Parquet footers then carry tight min/max stats, and any
    pushed-down range/equality predicate on ``key`` skips whole row
    groups at scan time — the poor-man's Z-ORDER, and the single
    biggest scan saver for time-keyed fact tables at 100 TB. The
    clustering costs one range-exchange at write; reads pay nothing.
    """
    (
        df.repartitionByRange(files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    files: int = 8,
    bits: int = 16,
) -> None:
    """Multi-column Z-ORDER clustering: sort by the bit-interleaved
    (Morton) key of the given numeric columns before writing, so parquet
    footer min/max stats stay tight on EVERY clustered column at once —
    a pushed-down predicate on any one of them skips row groups/files.
    This is what single-key range clustering (:func:`write_range_clustered`)
    cannot do: sorting on col A alone leaves col B spanning its full range
    in every file.

    Mechanics: each column is linearly scaled to a ``bits``-bit integer
    using its min/max (one aggregate; two driver scalars per column —
    metadata, not data), then the scaled values' bits are interleaved
    into one long. Integer shift/mask expressions stay inside whole-stage
    codegen. Cost at write: one range exchange on the z-key, same as any
    global sort; reads pay nothing.
    """
    from pyspark.sql import functions as F

    if not 1 <= bits * len(cols) <= 63:
        raise ValueError("bits * len(cols) must fit a signed 64-bit key")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"min_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"max_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        if lo is None or hi is None or hi == lo:
            scaled.append(F.lit(0).cast("long"))
        else:
            scaled.append(
                ((F.col(c).cast("double") - F.lit(lo)) * F.lit(top / (hi - lo)))
                .cast("long")
            )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for ci, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(s, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + ci,
                )
            )
    (
        df.withColumn("_zkey", z)
        .repartitionByRange(files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def _hive_partition_keys(p: Path) -> list[str]:
    """Partition columns of a Hive-layout directory, outermost first,
    read off the ``key=value`` subdirectory chain (empty if unpartitioned)."""
    keys: list[str] = []
    cur = p
    while True:
        subs = [
            d
            for d in cur.iterdir()
            if d.is_dir() and "=" in d.name and not d.name.startswith((".", "_"))
        ]
        if not subs:
            return keys
        keys.append(subs[0].name.split("=", 1)[0])
        cur = subs[0]


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int | None = None,
    target_mb: int = 128,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ~``target_mb``-sized files (or an explicit ``target_files`` count).
    Streaming sinks and per-partition incremental writes accumulate
    thousands of tiny files; every one costs a listing call, a footer
    read, and a scheduler task — the classic data-lake tax. Returns the
    new file count.

    Hive-partitioned inputs keep their layout: partition keys are read
    off the ``key=value`` directory chain, sized recursively, and the
    rewrite re-applies ``partitionBy`` on the same keys.

    Swap discipline: the rewrite lands in a ``.compact-tmp`` sibling,
    the live dir is *renamed* to a ``.compact-old`` sibling (atomic on a
    POSIX filesystem), tmp is moved into place, and ``.compact-old`` is
    deleted last. A crash at any step leaves the data recoverable — the
    window where the live path is briefly absent is between the two
    renames; true no-gap atomicity needs a metastore/table-format commit
    (Delta/Iceberg), which this layout intentionally stops short of.
    """
    p = Path(path)
    keys = _hive_partition_keys(p)
    if target_files is None:
        total = sum(f.stat().st_size for f in p.rglob("*.parquet"))
        target_files = max(1, -(-total // (target_mb * 1024 * 1024)))
    tmp = p.with_name(p.name + ".compact-tmp")
    old = p.with_name(p.name + ".compact-old")
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    df = spark.read.parquet(path)
    # co-locate each partition value in as few tasks as possible so
    # partitionBy doesn't fan one task out into a file per value
    df = df.repartition(target_files, *keys) if keys else df.repartition(target_files)
    writer = df.write.mode("overwrite")
    if keys:
        writer = writer.partitionBy(*keys)
    writer.parquet(str(tmp))
    p.rename(old)
    shutil.move(str(tmp), str(p))
    shutil.rmtree(old)
    return len(list(p.rglob("*.parquet")))


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    """Format-parameterized scan. CSV/JSON require the declared schema —
    inference is a full extra pass and type-lossy (SURVEY.md §1.2's
    declared-at-the-edges principle applies doubly to schemaless formats).
    """
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(path)
