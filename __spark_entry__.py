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
# ``queries()`` insertion order. Round-12 rotation (VERDICT r11 task #1),
# re-derived against the actual CORRECTNESS_r11.json: staleness
# distribution is 46@r8 / 50@r9 / 50@r10 / 50@r11, zero never-green,
# 196 registered == 196 ever-green. This window is the 46 queries whose
# newest green driver row is r8 — the oldest evidence in the ledger —
# plus the alphabetically-first r9 rows starting the r9 cohort refresh.
# Window invariant: every member's newest prior green row is <= r9;
# after this round no registered query's evidence predates r9.
# Everything displaced is r10/r11 driver-hash-verified and remains
# registered, benchmarked, and locally parity-tested;
# tests/test_window_coverage.py FAILS the suite if any registered query
# has neither a driver row in any CORRECTNESS_r*.json nor a slot here,
# and if this list exceeds the 50 slots the driver actually records.
# NEW queries registered this round take a slot by displacing the
# alphabetically-last r9 filler (note it in COVERAGE.md) — the r8
# snapshot_time_travel_read pattern.
_PRIORITY_WINDOW = [
    # --- stalest: newest green row is r8 (46) ---------------------------
    "chunk_documents",
    "customer_order_distribution",
    "customer_status_history",
    "customer_year_overlap",
    "decontaminate_train_docs",
    "dedup_simhash",
    "disjunctive_part_revenue",
    "doc_global_index",
    "doc_token_stats_arrow",
    "doc_weighted_sample",
    "dq_filter_orders",
    "embedding_neardup_blocked",
    "embedding_quantize",
    "lone_fault_suppliers",
    "nation_market_share",
    "overstocked_suppliers",
    "price_quantity_stats",
    "pricing_summary",
    "priority_by_linestatus",
    "priority_lines_by_flag",
    "promo_revenue_share",
    "q2_hourly_avg_value",
    "quantity_profile_by_flag",
    "repeat_high_value_customers",
    "resample_events_daily",
    "revenue_by_nation",
    "rolling_weekly_spend",
    "rollup_pricing",
    "running_customer_spend",
    "salted_orders_per_segment",
    "scd2_user_event_type",
    "sessionize_users",
    "shipping_priority_topk",
    "small_qty_part_revenue",
    "snapshot_table_roundtrip",
    "snapshot_time_travel_read",
    "source_extremes_arrow",
    "status_counts_long",
    "tfidf_top_terms",
    "token_array_features",
    "topk_orders",
    "unigram_lm_scores",
    "union_fleets_unify",
    "user_conversion_cogroup",
    "user_event_type_map",
    "valuable_parts",
    # --- r9 cohort refresh: alphabetically-first r9 rows ----------------
    "ab_test_event_value",
    "audio_energy_profile",
    # NEW r12 queries take slots 49-50 by displacing the two
    # alphabetically-last r9 fillers (balanced_shard_packing,
    # bigram_lm_scores — both keep their r9 green rows):
    # conditional MERGE clauses + by-source full sync, and the
    # withEventTimeOrder watermarked stream drive
    "cdc_full_sync_merge",
    "snapshot_eventorder_stream_agg",
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
