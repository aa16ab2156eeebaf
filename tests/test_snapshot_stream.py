"""Structured Streaming over the snapshot table via the Python Data
Source stream reader: version offsets, exactly-once across restarts,
compaction transparency, append-only lineage enforcement."""

from __future__ import annotations

import pytest

from nyc_taxi_data_pipeline_elt_spark.sources.snapshot_datasource import (
    SnapshotDataSource,
)
from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def _drain(spark, path, ck):
    """Run one availableNow cycle; return the rows it delivered.
    foreachBatch (not the memory sink) so the query is checkpoint-
    recoverable across restarts — the exactly-once property under
    test."""
    spark.dataSource.register(SnapshotDataSource)
    out = []
    q = (
        spark.readStream.format("snapshot_table")
        .load(path)
        .writeStream.foreachBatch(
            lambda df, _bid: out.extend(
                (r["id"], r["v"]) for r in df.collect()
            )
        )
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out


def test_stream_delivers_each_append_exactly_once(spark, tmp_path):
    table = SnapshotTable(str(tmp_path / "tbl"))
    ck = str(tmp_path / "ck")
    table.append(_df(spark, 0, 10))
    table.append(_df(spark, 10, 15))

    first = _drain(spark, str(table.root), ck)
    assert sorted(i for i, _ in first) == list(range(15))

    # restart with the same checkpoint after another append: only the
    # delta arrives (the memory sink is fresh per query start, so any
    # re-delivered old version would show up here)
    table.append(_df(spark, 15, 18))
    second = _drain(spark, str(table.root), ck)
    assert sorted(i for i, _ in second) == [15, 16, 17]


def test_stream_skips_compaction_rewrites(spark, tmp_path):
    table = SnapshotTable(str(tmp_path / "tbl"))
    ck = str(tmp_path / "ck")
    table.append(_df(spark, 0, 10))
    assert sorted(i for i, _ in _drain(spark, str(table.root), ck)) == list(
        range(10)
    )
    table.compact(spark, target_files=1)
    table.append(_df(spark, 10, 12))
    # the compaction rewrote rows 0-9 into new files; the stream must
    # deliver only the genuinely new rows
    assert sorted(i for i, _ in _drain(spark, str(table.root), ck)) == [10, 11]


def test_stream_rejects_overwrite_lineage(spark, tmp_path):
    table = SnapshotTable(str(tmp_path / "tbl"))
    ck = str(tmp_path / "ck")
    table.append(_df(spark, 0, 5))
    _drain(spark, str(table.root), ck)
    table.overwrite(_df(spark, 100, 103))
    with pytest.raises(Exception, match="non-append|overwrite"):
        _drain(spark, str(table.root), ck)
