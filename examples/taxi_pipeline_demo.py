"""End-to-end demo: the reference pipeline's workflow, on this engine.

Creates a throwaway lake under /tmp, ingests synthetic yellow/green trip
files (including a schema-drift month — the case that broke the reference,
README.md:146), runs landing -> consumer -> reports, and prints the same
two reports the reference serves through Athena.

    python examples/taxi_pipeline_demo.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from datetime import datetime
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nyc_taxi_data_pipeline_elt_spark.pipeline import PipelineConfig, run
from nyc_taxi_data_pipeline_elt_spark.session import get_spark
from nyc_taxi_data_pipeline_elt_spark.sources.catalog import sql
from nyc_taxi_data_pipeline_elt_spark.sources.ingest import ingest_sweep, landing_key


def synth_month(month: int, fleet: str, drift: bool = False) -> pd.DataFrame:
    ts = lambda d, h: datetime(2023, month, d % 27 + 1, h % 24)  # noqa: E731
    n = 200
    pick = "tpep_pickup_datetime" if fleet == "yellow" else "lpep_pickup_datetime"
    drop = "tpep_dropoff_datetime" if fleet == "yellow" else "lpep_dropoff_datetime"
    df = pd.DataFrame(
        {
            "VendorID": pd.array([i % 3 + 1 for i in range(n)], dtype="int64"),
            pick: pd.Series([ts(i, i) for i in range(n)], dtype="datetime64[us]"),
            drop: pd.Series([ts(i, i + 1) for i in range(n)], dtype="datetime64[us]"),
            "passenger_count": pd.array(
                [None if i % 17 == 0 else i % 5 for i in range(n)],
                dtype="float64" if drift else "Int64",
            ),
            "total_amount": [round((i % 40) * 2.5 - (5 if i % 23 == 0 else 0), 2) for i in range(n)],
        }
    )
    return df


def main() -> None:
    lake = Path(tempfile.mkdtemp(prefix="taxi_lake_"))
    print(f"lake: {lake}")

    # EL: fan out over (fleet, month) exactly like the reference's Lambda
    # sweep — here with a local synthesizer standing in for the TLC CDN.
    def fetch(landing_dir, fleet, year, month):
        dst = landing_key(landing_dir, fleet, year, month)
        dst.parent.mkdir(parents=True, exist_ok=True)
        drift = fleet == "yellow" and month == 1  # January drifts, as in history
        pq.write_table(
            pa.Table.from_pandas(synth_month(month, fleet, drift), preserve_index=False),
            dst,
        )
        return dst

    files = ingest_sweep(
        str(lake / "landing"), 2023, months=[1, 4, 5], trip_types=["yellow", "green"], fetch=fetch
    )
    print(f"ingested {len(files)} landing files")

    cfg = PipelineConfig(
        landing_dir=str(lake / "landing"),
        consumer_dir=str(lake / "consumer"),
        reports_dir=str(lake / "reports"),
        dlq_dir=str(lake / "dlq"),
    )
    spark = get_spark("taxi-demo")
    run(spark, cfg)

    # consumption surface: spark.sql plays Athena
    for name, order in [("q1_monthly_revenue", "report_month"), ("q2_hourly_passengers", "report_hour")]:
        spark.read.parquet(f"{cfg.reports_dir}/{name}").createOrReplaceTempView(name)
        print(f"\n== {name}")
        sql(spark, f"SELECT * FROM {name} ORDER BY {order}").show(30, truncate=False)

    dlq = spark.read.parquet(cfg.dlq_dir)
    print(f"dead-lettered rows: {dlq.count()} (violations routed, not dropped)")

    spark.stop()
    shutil.rmtree(lake, ignore_errors=True)


if __name__ == "__main__":
    main()
