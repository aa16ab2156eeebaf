"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
maps every implemented operator (SURVEY.md §2 + extensions) to a callable
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` pairs each with ANSI SQL
for the DuckDB differential check. Queries whose key is missing from
``oracle_sql()`` (custom stateful streaming etc.) get a rows-only check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from nyc_taxi_data_pipeline_elt_spark.plans.reference_queries import (
        q1_monthly_revenue,
    )

    return q1_monthly_revenue(spark, "/root/testdata/sf0.001")


# The driver records correctness rows for the FIRST 50 entries of
# ``queries()`` insertion order. This priority list guarantees every
# operator class gets a driver-verified row each round: the 5 reference
# queries, all 8 streaming queries, all 8 TPC-H subquery shapes, all 5
# modern-SQL/Arrow queries, graph (incl. the dangling-mass variant),
# SCD2/CDC/snapshot ETL, the dedup/ANN family, and one representative
# per remaining §2 class and LLM-pipeline capability (joins/as-of/skew,
# windows, edit-distance join, UDAF/UDTF, text, multimodal, sampling,
# chunking, indexing, quantization, unigram LM). Everything else —
# redundant variants of already-covered shapes — registers after the
# window (still benchmarked and locally parity-tested every round).
_PRIORITY_WINDOW = [
    # reference surface (SURVEY §2.1-2.5, §7.2)
    "q1_monthly_revenue",
    "q2_hourly_avg_value",
    "dq_filter_orders",
    "dq_expectations_orders",
    "union_fleets_unify",
    "topk_orders",
    # catalog + SQL consumption (S9/S10) and ORDER BY surface (§2.6)
    "sql_consumption_report",
    # joins: as-of (custom), skew-salted (§2.7)
    "lineitem_asof_prior_order",
    "salted_orders_per_segment",
    # window functions (§2.8)
    "top3_lineitems_per_supplier",
    # edit-distance similarity join (PassJoin)
    "similar_part_names",
    # structured streaming (§2.9) — all of it
    "streaming_stateful_user_counts",
    "streaming_click_purchase_join",
    "streaming_segment_counts",
    "streaming_dedup_slots",
    "streaming_tumbling_counts",
    "streaming_sliding_totals",
    "streaming_session_counts",
    "streaming_late_data_tumbling",
    # TPC-H subquery battery — all 8 shapes
    "disjunctive_part_revenue",
    "lone_fault_suppliers",
    "big_spender_loners",
    "small_qty_part_revenue",
    "nation_market_share",
    "priority_lines_by_flag",
    "valuable_parts",
    "overstocked_suppliers",
    # modern SQL + Arrow map surface
    "nation_reach_bfs",
    "customer_status_history",
    "quantity_profile_by_flag",
    "doc_token_stats_arrow",
    "source_extremes_arrow",
    # graph
    "pagerank_nation_trade",
    "pagerank_dangling",
    "triangles_neardup",
    # ETL: SCD2 history, CDC merge, snapshot table format
    "scd2_user_event_type",
    "cdc_orders_merge",
    "snapshot_table_roundtrip",
    # dedup / ANN family (ngram_jaccard rotates out this round — green in
    # r1 and still locally parity-tested — to make room for the new
    # aggregate-expectations capability above)
    "dedup_simhash",
    "dedup_clusters",
    "embedding_neardup_blocked",
    "simsearch_ivf_topk",
    # LLM-pipeline capabilities, one representative each
    "tfidf_top_terms",
    "chunk_documents",
    "multimodal_meta",
    "doc_weighted_sample",
    "doc_global_index",
    "embedding_quantize",
    "unigram_lm_scores",
    "bigrams_udtf",
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
