"""Partitioned ``SnapshotTable`` x Structured Streaming integration
(r13): the streaming SOURCE must replay a partitioned table's rows
exactly (leaf files live under nested ``__part__`` dirs and lack the
shadow columns), and the ``foreachBatch`` SINK (``commit_batch``) must
land partition-homogeneous files with recorded values so dynamic
overwrite works on a streamed table.
"""

from __future__ import annotations

import pytest

from nyc_taxi_data_pipeline_elt_spark.session import tune
from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"), partition_by=["k"])


def _kv(spark, rows):
    return spark.createDataFrame(rows, "id INT, k STRING, v DOUBLE")


def test_stream_source_replays_partitioned_table(spark, table, tmp_path):
    """readStream over a PARTITIONED snapshot table: version-offset
    microbatches serve the nested leaf files with the partition column
    intact (it is a real parquet column, not a path reconstruction)."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_pipeline_elt_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )

    tune(spark)
    table.append(_kv(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    table.append(_kv(spark, [(3, "a", 3.0), (4, "c", 4.0)]))
    spark.dataSource.register(SnapshotDataSource)
    stream = spark.readStream.format("snapshot_table").load(str(table.root))
    agg = stream.groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("total")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("part_snap_src")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.k, r.n, r.total)
        for r in spark.sql("SELECT * FROM part_snap_src").collect()
    }
    assert got == {("a", 2, 4.0), ("b", 1, 2.0), ("c", 1, 4.0)}


def test_stream_source_pushdown_prunes_partition_files(spark, table):
    """A pushed equality filter on the partition column must prune
    whole files at the source's planning step ([v, v] envelopes), and
    the filtered replay must still be exact."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_pipeline_elt_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )

    tune(spark)
    table.append(_kv(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)]))
    spark.dataSource.register(SnapshotDataSource)
    stream = (
        spark.readStream.format("snapshot_table")
        .load(str(table.root))
        .filter(F.col("k") == "a")
    )
    q = (
        stream.groupBy("k")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("part_snap_pruned")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.k, r.n)
        for r in spark.sql("SELECT * FROM part_snap_pruned").collect()
    }
    assert got == {("a", 2)}


def test_foreachbatch_sink_lands_partitioned_commits(spark, table):
    """commit_batch routes through the partitioned write: streamed
    batches land one-tuple-per-file with recorded values, replays are
    ignored, and a later dynamic overwrite works on the streamed
    table."""
    tune(spark)
    assert table.commit_batch(_kv(spark, [(1, "a", 1.0), (2, "b", 2.0)]), 0)
    assert table.commit_batch(_kv(spark, [(3, "a", 3.0)]), 1)
    assert table.commit_batch(_kv(spark, [(9, "x", 9.0)]), 0) is None  # replay
    snap = table.snapshot()
    for f in snap.files:
        pv = snap.stats[f].get("__partition__")
        assert pv is not None and "k" in pv
    snap2 = table.overwrite_partitions(
        spark, _kv(spark, [(7, "a", 7.0)])
    )
    assert snap2.op == "overwrite_partitions"
    assert sorted((r.id, r.k) for r in table.read(spark).collect()) == [
        (2, "b"),
        (7, "a"),
    ]
