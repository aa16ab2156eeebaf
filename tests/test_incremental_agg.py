"""Incremental aggregate maintenance over the snapshot change feed.

The production pattern: an upstream append-only table, a downstream
table of per-batch PARTIAL aggregates maintained exactly-once through
``process_changes`` + ``commit_batch``, and a merge-on-read final
aggregate (sum of partials). Each refresh touches only the delta — at
100 TB the consumer's cost is the new batch, never the full history —
and a crash replay can never double-count because the upstream version
doubles as the idempotence batch id.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable


def _events(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id % 7 AS user_id", "CAST(id AS DOUBLE) AS value"
    )


def _partial(df):
    return df.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    )


def _final(spark, downstream: SnapshotTable):
    return (
        downstream.read(spark)
        .groupBy("user_id")
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
    )


def test_maintained_aggregate_matches_full_recompute(spark, tmp_path):
    up = SnapshotTable(str(tmp_path / "up"))
    down = SnapshotTable(str(tmp_path / "down"))
    ck = str(tmp_path / "ck")

    def refresh(delta, version):
        down.commit_batch(_partial(delta), batch_id=version)

    up.append(_events(spark, 0, 50))
    assert up.process_changes(spark, ck, refresh) == 0
    up.append(_events(spark, 50, 120))
    assert up.process_changes(spark, ck, refresh) == 1

    # nothing new: one pointer read, no recompute, no new commit
    assert up.process_changes(spark, ck, refresh) is None

    maintained = {
        (r["user_id"], r["n"], r["total"])
        for r in _final(spark, down).collect()
    }
    recomputed = {
        (r["user_id"], r["n"], r["total"])
        for r in _partial(up.read(spark)).collect()
    }
    assert maintained == recomputed


def test_crash_replay_cannot_double_count(spark, tmp_path):
    up = SnapshotTable(str(tmp_path / "up"))
    down = SnapshotTable(str(tmp_path / "down"))
    ck = str(tmp_path / "ck")

    def refresh(delta, version):
        down.commit_batch(_partial(delta), batch_id=version)

    up.append(_events(spark, 0, 30))
    up.process_changes(spark, ck, refresh)

    # crash between handle() and the checkpoint swap == the handler runs
    # again for the same version; the idempotent sink must no-op
    replay = up.read_changes(spark, since_version=-1, until_version=0)
    assert down.commit_batch(_partial(replay), batch_id=0) is None
    assert _final(spark, down).agg(F.sum("n")).collect()[0][0] == 30
