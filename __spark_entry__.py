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
# ``queries()`` insertion order. Round-11 rotation (VERDICT r10 task #1,
# executing COVERAGE.md's "r11 rotation pre-computation", re-derived
# against the actual CORRECTNESS_r10.json: staleness distribution is
# 50@r10 / 50@r9 / 50@r8 / 45@r7, zero never-green, 195 registered ==
# 195 ever-green). This window is the 45 queries whose newest green
# driver row is r7 — the oldest evidence in the ledger (includes the
# whole simsearch IVF/PQ family, the eight r7-era streaming queries,
# the graph suite, and the classic agg/pivot/grouping-set block) —
# plus the alphabetically-first r8 rows starting the r8 cohort
# refresh. Window invariant: every member's newest prior green row is
# <= r8; after this round no registered query's evidence predates r8.
# Everything displaced is r9/r10 driver-hash-verified and remains
# registered, benchmarked, and locally parity-tested;
# tests/test_window_coverage.py FAILS the suite if any registered query
# has neither a driver row in any CORRECTNESS_r*.json nor a slot here,
# and if this list exceeds the 50 slots the driver actually records.
# NEW queries registered this round take a slot by displacing the
# alphabetically-last r8 filler (note it in COVERAGE.md) — the r8
# snapshot_time_travel_read pattern.
_PRIORITY_WINDOW = [
    # --- stalest: newest green row is r7 (45) ---------------------------
    "cube_order_stats",
    "customer_max_order_subquery",
    "customers_with_big_order",
    "customers_without_open_orders",
    "dedup_canonical_docs",
    "dedup_clusters",
    "dedup_exact_docs",
    "dedup_fingerprint_docs",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "distinct_customers_per_priority",
    "doc_stratified_split",
    "dsir_importance_select",
    "events_gap_fill",
    "events_json_stats",
    "events_seasonal_decompose",
    "events_variant_stats",
    "events_xml_stats",
    "forecast_revenue",
    "grouping_sets_sales",
    "heavy_hitter_tokens",
    "nation_reach_bfs",
    "nation_trade_volume",
    "order_date_features",
    "order_price_percentiles",
    "order_rank_positions",
    "orders_pivot_status",
    "pagerank_dangling",
    "pagerank_nation_trade",
    "simsearch_ivf_kmeans",
    "simsearch_ivf_multiprobe",
    "simsearch_ivf_topk",
    "simsearch_pq_rerank",
    "simsearch_pq_topk",
    "snapshot_zorder_pruned_scan",
    "streaming_click_purchase_join",
    "streaming_dedup_slots",
    "streaming_late_data_tumbling",
    "streaming_segment_counts",
    "streaming_session_counts",
    "streaming_sliding_totals",
    "streaming_snapshot_source_counts",
    "streaming_stateful_user_counts",
    "streaming_tumbling_counts",
    "triangles_neardup",
    # --- r8 cohort refresh: alphabetically-first r8 rows ----------------
    "big_spender_loners",
    "bigrams_udtf",
    "blocklist_scrub_docs",
    "cdc_orders_merge",
    # NEW r11 query (ignoreDeletes + column-mapped streaming drive)
    # takes slot 50 by displacing the alphabetically-last r8 filler
    # (chunk_documents — keeps its r8 green row)
    "snapshot_mapped_stream_read",
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
