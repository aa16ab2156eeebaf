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
# ``queries()`` insertion order. Round-7 rotation (COVERAGE.md ledger;
# VERDICT r6 task #1): slots 1-3 are the two-round-old ledger "MUST" —
# the three queries registered after the r5 window froze and never
# driver-verified (heavy_hitter_tokens additionally re-planned in r6 to
# Misra-Gries). Slot 4 is approx_distinct_stats, redefined THIS round
# from a rows-only HLL sketch row to an oracle-checkable bound check
# (VERDICT r6 task #4). Slots 5-10 are the six queries whose PLANS
# changed in r6 (band-row persist, clone-session loops, Misra-Gries,
# NULL-stratum Hamilton) that r6 failed to re-verify. Slots 11-22 are
# queries whose code paths change THIS round: simsearch_ivf_topk gains
# multi-probe (task #6); the graph loops gain try/finally unpersist
# (ADVICE); every streaming oracle replays through run_to_memory, which
# moves onto a conf-isolated loop_session (task #8) — the eight oldest
# streaming rows (r3/r4) plus the bench-weak snapshot-source query
# re-verify under the new replay path. The remaining slots are the 27
# stalest rows in the ledger (last green r1/r2). Everything displaced is
# r1-r6 driver-hash-verified and remains registered, benchmarked, and
# locally parity-tested; tests/test_window_coverage.py now FAILS the
# suite if any registered oracle-checkable query has neither a driver
# row in any CORRECTNESS_r*.json nor a slot in this window.
_PRIORITY_WINDOW = [
    # --- never driver-verified (ledger MUST, COVERAGE.md) --------------
    "boilerplate_prefix_report",
    "events_seasonal_decompose",
    "heavy_hitter_tokens",
    # --- redefined this round: rows-only sketch -> oracle bound check --
    "approx_distinct_stats",
    # --- plans changed in r6, never re-verified (VERDICT r6) -----------
    "dedup_minhash_lsh",
    "dedup_canonical_docs",
    "dedup_clusters",
    "triangles_neardup",
    "pagerank_nation_trade",
    "doc_stratified_split",
    # --- code paths changing THIS round (r7) ---------------------------
    "simsearch_ivf_topk",  # isin-probe refactor (VERDICT task #6)
    "simsearch_ivf_multiprobe",  # NEW: nprobe=2 (VERDICT task #6)
    "simsearch_ivf_kmeans",  # NEW: k-means coarse quantizer (task #6)
    "simsearch_pq_topk",  # NEW r7: product quantization + ADC
    "dsir_importance_select",  # NEW r7: DSIR targeted selection
    "simsearch_pq_rerank",  # NEW r7: ADC shortlist + exact re-rank
    "pagerank_dangling",  # graph loop unpersist-in-finally (ADVICE)
    "nation_reach_bfs",  # graph loop unpersist-in-finally (ADVICE)
    "streaming_snapshot_source_counts",  # bench-weak + new replay path
    "streaming_late_data_tumbling",
    "streaming_stateful_user_counts",
    "streaming_click_purchase_join",
    "streaming_tumbling_counts",
    "streaming_sliding_totals",
    "streaming_session_counts",
    "streaming_segment_counts",
    "streaming_dedup_slots",
    "snapshot_zorder_pruned_scan",  # NEW r7: OPTIMIZE ZORDER + pruned scan
    # --- stalest ledger rows (last green r1/r2) ------------------------
    "dedup_ngram_jaccard",
    "biggest_order_per_customer",
    "click_attribution",
    "copurchase_part_pairs",
    "cube_order_stats",
    "customer_max_order_subquery",
    "customers_with_big_order",
    "customers_without_open_orders",
    "dedup_exact_docs",
    "dedup_fingerprint_docs",
    "distinct_customers_per_priority",
    "events_gap_fill",
    "events_json_stats",
    "events_variant_stats",
    "events_xml_stats",
    "forecast_revenue",
    "grouping_sets_sales",
    "nation_trade_volume",
    "order_date_features",
    "order_price_percentiles",
    "order_rank_positions",
    "orders_pivot_status",
    "price_quantity_stats",
    "pricing_summary",
    "priority_by_linestatus",
    "promo_revenue_share",
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
