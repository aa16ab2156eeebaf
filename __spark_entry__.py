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
# ``queries()`` insertion order. Round-10 rotation (VERDICT r9 task #1,
# executing COVERAGE.md's "r10 rotation pre-computation", re-derived
# against the actual CORRECTNESS_r09.json: staleness distribution is
# 50@r9 / 50@r8 / 50@r7 / 39@r6, zero never-green, 189 registered ==
# 189 ever-green). This window is the 39 queries whose newest green
# driver row is r6 — the oldest evidence in the ledger, predating three
# rounds of table-format/CDF rework (includes customer_entity_leaders,
# nation_cheapest_route, funnel_conversion, image_luma_profile, the
# streaming left-join/dedup/funnel family) — plus the
# alphabetically-first r7 rows continuing the r7 cohort refresh.
# Window invariant: every member's newest prior green row is <= r7;
# after this round no registered query's evidence predates r7.
# Everything displaced is r8/r9 driver-hash-verified and remains
# registered, benchmarked, and locally parity-tested;
# tests/test_window_coverage.py FAILS the suite if any registered query
# has neither a driver row in any CORRECTNESS_r*.json nor a slot here,
# and if this list exceeds the 50 slots the driver actually records.
# NEW queries registered this round take a slot by displacing the
# alphabetically-last r7 filler (note it in COVERAGE.md) — the r8
# snapshot_time_travel_read pattern.
_PRIORITY_WINDOW = [
    # --- stalest: newest green row is r6 (39) ---------------------------
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
    # --- r7 cohort refresh: alphabetically-first r7 rows ----------------
    "approx_distinct_stats",
    "biggest_order_per_customer",
    "boilerplate_prefix_report",
    "click_attribution",
    "copurchase_part_pairs",
    # NEW r10 queries (SnapshotTable.update drive; optimize CDF
    # row-neutrality; merge-on-read deletion-vector delete drive;
    # shallow-clone divergence drive; streaming change-data-feed
    # mirror; column-mapping rename/drop drive) take slots 45-50 by
    # displacing the six alphabetically-last r7 fillers
    # (cube_order_stats, customer_max_order_subquery,
    # customers_with_big_order, customers_without_open_orders,
    # dedup_canonical_docs, dedup_clusters — all keep their r7 green
    # rows)
    "snapshot_update_rows",
    "snapshot_optimize_cdf_neutral",
    "snapshot_dv_delete_rows",
    "snapshot_clone_divergence",
    "snapshot_cdf_stream_mirror",
    "snapshot_rename_column",
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
