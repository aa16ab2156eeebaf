"""Incremental landing->consumer: checkpointed file discovery processes
each landing file exactly once, across drifted schemas."""

from __future__ import annotations

from nyc_taxi_data_pipeline_elt_spark.pipeline import PipelineConfig
from nyc_taxi_data_pipeline_elt_spark.sources.ingest import landing_key
from nyc_taxi_data_pipeline_elt_spark.streaming.incremental import incremental_process
from tests.test_pipeline import _write, _yellow


def test_incremental_processes_only_new_files(spark, tmp_path):
    landing = tmp_path / "landing"
    cfg = PipelineConfig(
        landing_dir=str(landing),
        consumer_dir=str(tmp_path / "consumer"),
        reports_dir=str(tmp_path / "reports"),
        dlq_dir=str(tmp_path / "dlq"),
    )
    ckpt = str(tmp_path / "ckpt_yellow")

    # run 1: one clean month (5 rows -> 2 good, 3 dead-lettered)
    _write(_yellow(4), landing_key(landing, "yellow", 2023, 4))
    incremental_process(spark, cfg, "yellow", ckpt)
    consumer = spark.read.parquet(cfg.consumer_dir)
    assert consumer.count() == 2
    assert {r.trip_month for r in consumer.select("trip_month").collect()} == {4}

    # run 2: a new *drifted* month arrives (float64 passenger_count);
    # only the new file is processed, the old one is not re-read
    _write(_yellow(5, drift=True), landing_key(landing, "yellow", 2023, 5))
    incremental_process(spark, cfg, "yellow", ckpt)
    consumer = spark.read.parquet(cfg.consumer_dir)
    assert consumer.count() == 4  # appended, not reprocessed (else 6)
    assert {r.trip_month for r in consumer.select("trip_month").collect()} == {4, 5}
    assert dict(consumer.dtypes)["passenger_count"] == "bigint"

    # run 3: nothing new -> no change
    incremental_process(spark, cfg, "yellow", ckpt)
    assert spark.read.parquet(cfg.consumer_dir).count() == 4

    # DLQ accumulated 3 rejects per processed month, batch-stamped
    dlq = spark.read.parquet(cfg.dlq_dir)
    assert dlq.count() == 6
    assert dlq.select("_batch_id").distinct().count() == 2

    # consumer rows carry the same retry-reconciliation stamp as the DLQ:
    # a retried foreachBatch re-appends under an identical _batch_id
    assert "_batch_id" in consumer.columns
    assert consumer.select("_batch_id").distinct().count() == 2


def test_incremental_snapshot_sink_exactly_once(spark, tmp_path):
    """consumer_table variant: commits land in the snapshot table with
    the batch id recorded, so a replayed batch id is a no-op commit."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    landing = tmp_path / "landing"
    cfg = PipelineConfig(
        landing_dir=str(landing),
        consumer_dir=str(tmp_path / "consumer"),
        reports_dir=str(tmp_path / "reports"),
        dlq_dir=str(tmp_path / "dlq"),
    )
    table = SnapshotTable(str(tmp_path / "consumer_tbl"))
    ckpt = str(tmp_path / "ckpt_yellow")

    _write(_yellow(4), landing_key(landing, "yellow", 2023, 4))
    incremental_process(spark, cfg, "yellow", ckpt, consumer_table=table)
    assert table.read(spark).count() == 2
    committed = [s.batch_id for s in table.history()]

    # replaying the same batch id against the table is a no-op
    assert table.commit_batch(table.read(spark), committed[0]) is None
    assert table.read(spark).count() == 2

    # a second month commits exactly one more snapshot
    _write(_yellow(5), landing_key(landing, "yellow", 2023, 5))
    incremental_process(spark, cfg, "yellow", ckpt, consumer_table=table)
    assert table.read(spark).count() == 4
    assert len(table.history()) == len(committed) + 1
