"""End-to-end medallion pipeline tests on taxi-shaped fixtures (FIXTURES.md §A),
including the reference's recorded failure modes: schema drift (README.md:146)
and empty inputs (reporting_etl_job.py:65-70)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nyc_taxi_data_pipeline_elt_spark.pipeline import (
    PipelineConfig,
    build_reports,
    run,
)
from nyc_taxi_data_pipeline_elt_spark.schemas import Q1_SCHEMA, Q2_SCHEMA
from nyc_taxi_data_pipeline_elt_spark.sources.ingest import landing_key


def _write(df: pd.DataFrame, path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    # pandas defaults to ns timestamps; real TLC files are µs. Keep the
    # fixture µs so it exercises the normal reader path.
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _yellow(month: int, drift: bool = False) -> pd.DataFrame:
    ts = lambda d, h: datetime(2023, month, d, h)  # noqa: E731
    pc = [1, 2, None, 0, 3]
    df = pd.DataFrame(
        {
            "VendorID": pd.array([1, 2, 1, 2, 1], dtype="int64"),
            "tpep_pickup_datetime": [ts(1, 6), ts(2, 7), ts(3, 8), ts(4, 9), None],
            "tpep_dropoff_datetime": [ts(1, 7), ts(2, 8), ts(3, 9), ts(4, 10), ts(5, 11)],
            "passenger_count": pd.array(pc, dtype="float64" if drift else "Int64"),
            "total_amount": [10.0, 20.0, 30.0, 40.0, -5.0],
        }
    )
    return df


def _green(month: int) -> pd.DataFrame:
    ts = lambda d, h: datetime(2023, month, d, h)  # noqa: E731
    return pd.DataFrame(
        {
            "VendorID": pd.array([2, 2], dtype="int64"),
            "lpep_pickup_datetime": [ts(10, 6), ts(11, 18)],
            "lpep_dropoff_datetime": [ts(10, 7), ts(11, 19)],
            "passenger_count": pd.array([4, 6], dtype="Int64"),
            "total_amount": [15.0, 25.0],
        }
    )


@pytest.fixture()
def lake(tmp_path):
    landing = tmp_path / "landing"
    # month 1 carries the drift variant (float64 passenger_count) — the
    # mergeSchema read over trip_type=yellow/ must fail and fall back to
    # per-batch conformance.
    _write(_yellow(1, drift=True), landing_key(landing, "yellow", 2023, 1))
    _write(_yellow(4), landing_key(landing, "yellow", 2023, 4))
    _write(_yellow(5), landing_key(landing, "yellow", 2023, 5))
    _write(_green(5), landing_key(landing, "green", 2023, 5))
    return PipelineConfig(
        landing_dir=str(landing),
        consumer_dir=str(tmp_path / "consumer"),
        reports_dir=str(tmp_path / "reports"),
        dlq_dir=str(tmp_path / "dlq"),
    )


def test_full_pipeline(spark, lake, tmp_path):
    run(spark, lake)

    # consumer: Hive-partitioned by trip_type/trip_year/trip_month
    consumer = spark.read.parquet(lake.consumer_dir)
    parts = {
        (r.trip_type, r.trip_year, r.trip_month)
        for r in consumer.select("trip_type", "trip_year", "trip_month").distinct().collect()
    }
    assert parts == {
        ("yellow", 2023, 1),
        ("yellow", 2023, 4),
        ("yellow", 2023, 5),
        ("green", 2023, 5),
    }
    # per yellow month: 5 rows -> 2 good (null/0 passengers, negative amount,
    # null pickup rejected); green: both good
    assert consumer.filter("trip_type = 'yellow'").count() == 6
    assert consumer.filter("trip_type = 'green'").count() == 2
    # drift month conformed to catalog type
    assert dict(consumer.dtypes)["passenger_count"] == "bigint"

    # DLQ captured the 9 rejected rows with named violations
    dlq = spark.read.parquet(lake.dlq_dir)
    assert dlq.count() == 9
    reasons = {tuple(r.dq_violations) for r in dlq.collect()}
    assert ("passenger_count_positive",) in reasons
    assert ("total_amount_non_negative", "datetimes_present") in reasons

    # Q1: yellow monthly averages of the 2 surviving rows (10, 20) -> 15.0
    q1 = spark.read.parquet(f"{lake.reports_dir}/q1_monthly_revenue")
    q1_rows = {r.report_month: r.avg_total_amount for r in q1.collect()}
    assert q1_rows == {"2023-01": 15.0, "2023-04": 15.0, "2023-05": 15.0}

    # Q2: May, yellow(1@6h, 2@7h) ∪ green(4@6h, 6@18h)
    q2 = spark.read.parquet(f"{lake.reports_dir}/q2_hourly_passengers")
    q2_rows = {r.report_hour: r.avg_passenger_count for r in q2.collect()}
    assert q2_rows == {6: 2.5, 7: 2.0, 18: 6.0}


def test_corrupt_batch_is_quarantined_not_fatal(spark, tmp_path):
    """A landing batch with an unreadable footer is recorded to the
    file-level quarantine and skipped; healthy batches still process.
    A drifted month forces the per-batch path where quarantine lives."""
    import json

    landing = tmp_path / "landing"
    _write(_yellow(1, drift=True), landing_key(landing, "yellow", 2023, 1))
    _write(_yellow(4), landing_key(landing, "yellow", 2023, 4))
    bad = landing_key(landing, "yellow", 2023, 2)
    bad.parent.mkdir(parents=True, exist_ok=True)
    bad.write_bytes(b"this is not parquet")

    cfg = PipelineConfig(
        landing_dir=str(landing),
        consumer_dir=str(tmp_path / "consumer"),
        reports_dir=str(tmp_path / "reports"),
        dlq_dir=str(tmp_path / "dlq"),
    )
    run(spark, cfg)

    consumer = spark.read.parquet(cfg.consumer_dir)
    assert {r.trip_month for r in consumer.select("trip_month").collect()} == {1, 4}
    qlog = landing / "_quarantine.jsonl"
    assert qlog.exists()
    entries = [json.loads(l) for l in qlog.read_text().splitlines()]
    assert len(entries) == 1
    assert "partition_date=202302" in entries[0]["path"]

    # re-run: quarantine log stays deduplicated, metrics expose the count
    from nyc_taxi_data_pipeline_elt_spark.pipeline import process_trips

    metrics = process_trips(spark, cfg, "yellow")
    assert metrics["batches_quarantined"] == 1
    entries = [json.loads(l) for l in qlog.read_text().splitlines()]
    assert len(entries) == 1

    # a fleet whose every batch is unreadable must FAIL the stage, not
    # silently produce an empty consumer
    bad2 = landing_key(landing, "green", 2023, 2)
    bad2.parent.mkdir(parents=True, exist_ok=True)
    bad2.write_bytes(b"junk")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="pipeline stage|quarantined"):
        process_trips(spark, cfg, "green")


def test_empty_inputs_write_schema_correct_reports(spark, tmp_path):
    cfg = PipelineConfig(
        landing_dir=str(tmp_path / "landing"),  # nothing ingested
        consumer_dir=str(tmp_path / "consumer"),
        reports_dir=str(tmp_path / "reports"),
        dlq_dir=str(tmp_path / "dlq"),
    )
    build_reports(spark, cfg)
    q1 = spark.read.parquet(f"{cfg.reports_dir}/q1_monthly_revenue")
    q2 = spark.read.parquet(f"{cfg.reports_dir}/q2_hourly_passengers")
    assert q1.count() == 0 and q1.schema == Q1_SCHEMA
    assert q2.count() == 0 and q2.schema == Q2_SCHEMA


def test_partition_scoped_rerun_preserves_siblings(spark, lake):
    """Dynamic partition overwrite: re-processing one fleet must not clobber
    the other fleet's consumer partitions (process_data_glue.py:184-190)."""
    from nyc_taxi_data_pipeline_elt_spark.pipeline import process_trips

    run(spark, lake)
    before_green = spark.read.parquet(lake.consumer_dir).filter(
        "trip_type = 'green'"
    ).count()
    metrics = process_trips(spark, lake, "yellow")  # re-run yellow only
    after = spark.read.parquet(lake.consumer_dir)
    assert after.filter("trip_type = 'green'").count() == before_green
    assert after.filter("trip_type = 'yellow'").count() == 6
    # observe() metrics ride the write action — no extra scans
    assert metrics == {
        "rows_written": 6,
        "rows_dead_lettered": 9,
        "batches_quarantined": 0,
    }
