"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
maps every implemented operator (SURVEY.md §2 + extensions) to a callable
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` pairs each with ANSI SQL
for the DuckDB differential check. As of r7 every registered query has an
oracle twin — engine-specific sketches are registered as exact-twin +
within-error-bound gates instead of raw estimates, so the rows-only class
is empty.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Python workers (pandas_udf / UDTF / mapInPandas) unpickle functions by
# importing their defining module; local-mode workers inherit the JVM
# process env, so exporting PYTHONPATH before the session starts makes
# the package importable regardless of the harness's cwd.
import os as _os  # noqa: E402

if _REPO not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _REPO + _os.pathsep + _os.environ["PYTHONPATH"]
        if _os.environ.get("PYTHONPATH")
        else _REPO
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from nyc_taxi_data_pipeline_elt_spark.plans.reference_queries import (
        q1_monthly_revenue,
    )

    return q1_monthly_revenue(spark, "/root/testdata/sf0.001")


# The driver records correctness rows for the FIRST 50 entries of
# ``queries()`` insertion order. Round-14 rotation (VERDICT r13 task #8:
# "rotation first commit, next window per the ledger"), re-derived
# against the actual CORRECTNESS_r{1..13}.json union: staleness
# distribution is exactly 50@r10 / 50@r11 / 50@r12 / 50@r13, zero
# never-green, 200 registered == 200 ever-green. This window is the 50
# queries whose newest green driver row is r10 — the oldest evidence in
# the ledger. Window invariant: after this round no registered query's
# evidence predates r11. Everything displaced is r11/r12/r13
# driver-hash-verified and remains registered, benchmarked, and locally
# parity-tested; tests/test_window_coverage.py FAILS the suite if any
# registered query has neither a driver row in any CORRECTNESS_r*.json
# nor a slot here, and if this list exceeds the 50 slots the driver
# actually records. NEW queries registered in a round take a slot by
# displacing the alphabetically-last filler (note it in COVERAGE.md) —
# the r8 snapshot_time_travel_read pattern. (r14 is an optimization
# round: no new queries.)
_PRIORITY_WINDOW = [
    # --- stalest: newest green row is r10 (50) --------------------------
    "approx_distinct_stats",
    "biggest_order_per_customer",
    "boilerplate_prefix_report",
    "click_attribution",
    "copurchase_part_pairs",
    "curriculum_budget_selection",
    "customer_entity_leaders",
    "dedup_lsh_band_plan",
    "dedup_lsh_recall_eval",
    "dedup_minhash_lsh_capped",
    "dedup_threshold_sweep",
    "doc_char_entropy",
    "embedding_neardup_pairs",
    "embedding_norm_profile",
    "embedding_standardize_profile",
    "events_anomaly_screen",
    "funnel_conversion",
    "image_luma_profile",
    "join_cardinality_estimate",
    "kmv_distinct_tokens",
    "mixture_temperature_weights",
    "nation_cheapest_route",
    "order_price_deciles",
    "order_price_histogram",
    "orders_grouping_sets",
    "percentile_sketch_eval",
    "pii_redact_docs",
    "props_extract_udtf",
    "q1_monthly_revenue",
    "quality_drift_psi",
    "quality_quantile_normalize",
    "semantic_decontaminate",
    "similar_part_names",
    "skew_diagnosis_orders",
    "snapshot_cdf_stream_mirror",
    "snapshot_clone_divergence",
    "snapshot_dv_delete_rows",
    "snapshot_optimize_cdf_neutral",
    "snapshot_rename_column",
    "snapshot_update_rows",
    "source_novelty_curve",
    "source_overlap_matrix",
    "sql_scripting_threshold_scan",
    "streaming_click_purchase_left_join",
    "streaming_dedup_within_watermark",
    "streaming_funnel_stages",
    "streaming_user_totals_tws",
    "video_motion_profile",
    "vocab_coverage",
    "winsorized_order_stats",
]

_PLAN_MODULES = (
    "reference_queries",
    "analytics",
    "trainingdata",
    "streaming_queries",
    "graph_queries",
    "etl_queries",
    "subqueries",
    "modern_sql",
    "tpch_completion",
)


def _collect(attr: str) -> dict:
    out: dict = {}
    for mod_name in _PLAN_MODULES:
        try:
            mod = __import__(
                f"nyc_taxi_data_pipeline_elt_spark.plans.{mod_name}",
                fromlist=[attr],
            )
        except ImportError:
            continue
        out.update(getattr(mod, "QUERIES" if attr == "QUERIES" else attr, {}))
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, priority
    classes first (see _PRIORITY_WINDOW)."""
    all_q = _collect("QUERIES")
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _PRIORITY_WINDOW:
        if name in all_q:
            out[name] = all_q.pop(name)
    out.update(all_q)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return _collect("ORACLE")
