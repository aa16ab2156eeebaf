"""The in-process pipeline runner (SURVEY.md §2.11, O2-O4).

Replaces the reference's Step Functions state machine
(``/root/reference/infra/main.tf:493-596``):

    ingest -> process(yellow) -> process(green) -> reports

with plain function sequencing and fail-fast exception propagation (the
ASL ``Catch -> FailState`` becomes a raised exception, matching the
processing job's own re-raise at ``process_data_glue.py:140-143``).

The processing stage is the reference's landing->consumer transform
(``process_data_glue.py:127-205``) rebuilt Spark-first:

- partition pruning by *filter*, not path surgery
- schema drift handled by per-batch ``conform_to_schema`` (fixes the
  month-1 int<->double failure recorded at README.md:146)
- DQ failures routed to a dead-letter table instead of silently dropped
  (the README's own to-do)
- no log-only ``count()`` actions — the reference triggers 3 full
  recomputations per run (SURVEY.md §4 anti-patterns); here each stage is
  exactly one action (the write)
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_taxi_data_pipeline_elt_spark.operators.conform import conform_to_schema
from nyc_taxi_data_pipeline_elt_spark.operators.quality import apply_quality, trips_rules
from nyc_taxi_data_pipeline_elt_spark.plans.reports import (
    q1_monthly_revenue,
    q2_hourly_passengers,
)
from nyc_taxi_data_pipeline_elt_spark.schemas import (
    CONSUMER_COLUMNS,
    CONSUMER_PARTITION_KEYS,
    Q1_SCHEMA,
    Q2_SCHEMA,
)
from nyc_taxi_data_pipeline_elt_spark.session import tune
from nyc_taxi_data_pipeline_elt_spark.sources.readers import read_layer
from nyc_taxi_data_pipeline_elt_spark.sources.writers import (
    write_empty_report,
    write_partitioned,
    write_report,
)

# Unified pre-partition schema: what every landing batch conforms to before
# fleet union (generalizes process_data_glue.py:162-174's padding).
RAW_UNIFIED_SCHEMA = T.StructType(
    [
        T.StructField("vendor_id", T.LongType()),
        T.StructField("passenger_count", T.LongType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("tpep_pickup_datetime", T.TimestampType()),
        T.StructField("tpep_dropoff_datetime", T.TimestampType()),
        T.StructField("lpep_pickup_datetime", T.TimestampType()),
        T.StructField("lpep_dropoff_datetime", T.TimestampType()),
    ]
)

_RENAMES = {"VendorID": "vendor_id"}
# TLC's drifting column: some monthly files carry float64 passenger_count
# (the drift that killed the reference's January run). Narrowing back to
# the catalog's bigint is sanctioned.
_NARROW_OK = {"passenger_count"}


@dataclass
class PipelineConfig:
    landing_dir: str
    consumer_dir: str
    reports_dir: str
    dlq_dir: str
    trip_types: list[str] = field(default_factory=lambda: ["yellow", "green"])
    q2_month: int = 5


def _quarantine(batch_path: Path, exc: Exception) -> None:
    """Record an unprocessable landing batch (file-level dead-letter).

    Detection is footer/schema-level (scan planning); per-row corruption
    inside an otherwise-readable file is the row-level DLQ's job.
    Idempotent per path: re-runs over unchanged landing data do not
    re-append the same incident.
    """
    log = batch_path.parent.parent / "_quarantine.jsonl"
    if log.exists():
        for line in log.read_text().splitlines():
            if json.loads(line).get("path") == str(batch_path):
                return
    entry = {"path": str(batch_path), "error": str(exc)[:500]}
    with open(log, "a") as f:
        f.write(json.dumps(entry) + "\n")


def read_landing_conformed(
    spark: SparkSession, landing_dir: str, trip_type: str
) -> tuple[DataFrame | None, int]:
    """Read one fleet's landing partition, drift-safe.

    Fast path: one mergeSchema scan over ``trip_type=X/`` (the reference's
    read, process_data_glue.py:137-139) then a single conformance pass.
    Drift path: if the footer merge fails (int<->double across months —
    exactly README.md:146), fall back to conforming each
    ``partition_date=`` batch independently and unioning by name; per-batch
    schemas are internally consistent, so the union is well-typed.

    Returns ``(df_or_None, n_quarantined)``. Raises when every batch
    quarantined — a fleet that is entirely unreadable is a systemic
    failure, not an empty input, and must fail the stage (the reference's
    fail-fast contract, process_data_glue.py:140-143).
    """
    base = Path(landing_dir) / f"trip_type={trip_type}"
    if not base.exists():
        return None, 0

    def _conform(df: DataFrame) -> DataFrame:
        return conform_to_schema(
            df, RAW_UNIFIED_SCHEMA, renames=_RENAMES, narrow_ok=_NARROW_OK
        )

    try:
        df = spark.read.option("mergeSchema", "true").parquet(str(base))
        return _conform(df), 0
    except Exception:
        batches = sorted(p for p in base.iterdir() if p.is_dir())
        if not batches:
            return None, 0
        parts = []
        n_quarantined = 0
        for p in batches:
            try:
                part = _conform(
                    spark.read.option("mergeSchema", "true").parquet(str(p))
                )
                parts.append(part)
            except Exception as exc:
                # file-level dead-letter: a batch that cannot even be
                # conformed (corrupt footer, unmappable drift) is recorded
                # and skipped instead of failing the whole fleet — the
                # file-granularity counterpart of the row-level DLQ
                _quarantine(p, exc)
                n_quarantined += 1
        if not parts:
            # every batch unreadable: systemic, not empty — fail the stage
            raise RuntimeError(
                f"all {n_quarantined} landing batches for trip_type="
                f"{trip_type!r} were quarantined; see "
                f"{base.parent / '_quarantine.jsonl'}"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out, n_quarantined


def process_trips(
    spark: SparkSession, cfg: PipelineConfig, trip_type: str
) -> dict[str, int] | None:
    """Landing -> consumer for one fleet (EP2, process_data_glue.py).

    Returns observability metrics. The reference logs row counts with 6
    eager ``count()`` calls, each re-executing the full lineage (SURVEY.md
    §4 anti-patterns); here ``observe()`` accumulates the same counts as a
    side effect of the single write action — zero extra scans.
    """
    tune(spark)
    raw, n_quarantined = read_landing_conformed(spark, cfg.landing_dir, trip_type)
    if raw is None:
        return None

    unified = raw.withColumn(
        "pickup_time",
        F.coalesce("tpep_pickup_datetime", "lpep_pickup_datetime"),
    ).withColumn(
        "dropoff_time",
        F.coalesce("tpep_dropoff_datetime", "lpep_dropoff_datetime"),
    )

    good, bad = apply_quality(unified, trips_rules())

    # DLQ: the reference's missing to-do (README.md:146), partition-scoped
    # like the consumer table so re-runs stay incremental.
    dlq_obs = Observation(f"dlq_{trip_type}")
    bad_out = (
        bad.withColumn("trip_type", F.lit(trip_type))
        .select(
            *[c for c in unified.columns if not c.endswith("_time")],
            "trip_type",
            F.col("dq_violations").cast("array<string>"),
        )
        .observe(dlq_obs, F.count(F.lit(1)).alias("n_rows"))
    )
    write_partitioned(bad_out, cfg.dlq_dir, ["trip_type"])

    consumer_obs = Observation(f"consumer_{trip_type}")
    consumer = (
        good.withColumn("trip_type", F.lit(trip_type))  # P7
        .withColumn("trip_year", F.year("pickup_time"))  # F1
        .withColumn("trip_month", F.month("pickup_time"))  # F2
        .select(*CONSUMER_COLUMNS)  # P9
        .observe(consumer_obs, F.count(F.lit(1)).alias("n_rows"))
    )
    write_partitioned(consumer, cfg.consumer_dir, CONSUMER_PARTITION_KEYS)
    return {
        "rows_written": consumer_obs.get["n_rows"],
        "rows_dead_lettered": dlq_obs.get["n_rows"],
        "batches_quarantined": n_quarantined,
    }


def build_reports(spark: SparkSession, cfg: PipelineConfig) -> None:
    """Consumer -> reporting (EP3, reporting_etl_job.py)."""
    tune(spark)
    yellow = read_layer(spark, cfg.consumer_dir, trip_type="yellow")
    green = read_layer(spark, cfg.consumer_dir, trip_type="green")

    q1 = q1_monthly_revenue(yellow)
    q1_path = f"{cfg.reports_dir}/q1_monthly_revenue"
    if q1 is None:
        write_empty_report(spark, Q1_SCHEMA, q1_path)
    else:
        write_report(q1, q1_path)

    q2 = q2_hourly_passengers(yellow, green, month=cfg.q2_month)
    q2_path = f"{cfg.reports_dir}/q2_hourly_passengers"
    if q2 is None:
        write_empty_report(spark, Q2_SCHEMA, q2_path)
    else:
        write_report(q2, q2_path)


def run(spark: SparkSession, cfg: PipelineConfig) -> None:
    """O2: the state-machine sequencing, fail-fast (O3)."""
    stages = [
        *[
            (f"process_{t}", lambda s=None, t=t: process_trips(spark, cfg, t))
            for t in cfg.trip_types
        ],
        ("reports", lambda: build_reports(spark, cfg)),
    ]
    for name, stage in stages:
        try:
            stage()
        except Exception as exc:
            raise RuntimeError(f"pipeline stage {name!r} failed") from exc
