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
# ``queries()`` insertion order. Round-4 rotation (COVERAGE.md ledger):
# the 20 queries that had only local parity evidence after r3 enter the
# window; every operator class keeps at least one r3-hash-verified
# representative (reference surface, DQ, as-of/skew joins, windows,
# edit-distance, streaming [stateful + tumbling + the late-data query
# whose oracle is new this round], subquery decorrelation, modern
# SQL/Arrow, graph, SCD2/CDC/snapshot, dedup/ANN production paths, text,
# multimodal). dq_expectations_orders stays: its verdict semantics
# changed this round (unrounded metrics) and needs re-verification.
# Displaced r3-verified variants (5 streaming, 6 subquery shapes,
# customer_status_history, source_extremes_arrow, pagerank_nation_trade,
# doc_weighted_sample, doc_global_index, embedding_quantize,
# unigram_lm_scores, bigrams_udtf, chunk_documents) remain registered,
# benchmarked, and locally parity-tested.
_PRIORITY_WINDOW = [
    # NEW operators this round (first driver verification): clustering /
    # semantic dedup / ANN evaluation / corpus quality battery — 7 here
    # at the head, plus 6 more swapped in for same-class representatives
    # below (marked inline). The 13 displaced queries are all
    # r3-hash-verified and remain registered, benchmarked, and locally
    # parity-tested (dedup_simhash, simsearch_ivf_topk, tfidf_top_terms,
    # triangles_neardup, scd2_user_event_type, snapshot_table_roundtrip,
    # salted_orders_per_segment, topk_orders, disjunctive_part_revenue,
    # quantity_profile_by_flag, streaming_tumbling_counts,
    # dedup_clusters, doc_token_stats_arrow).
    "embedding_kmeans",
    "semdedup_prune",
    "simsearch_recall_eval",
    "doc_repetition_stats",
    "quality_filter_docs",
    "blocklist_scrub_docs",
    "doc_group_split",
    # ledger entries getting their first driver row (r4 rotation)
    "dedup_incremental_minhash",
    "decontaminate_train_docs",
    "knn_join_embeddings",
    "pack_training_sequences",
    "doc_mixture_sample",
    "snapshot_change_feed",
    "simsearch_lsh_topk",
    "simsearch_lsh_multiprobe",
    "simsearch_bruteforce_topk",
    "nation_wealth_coverage",
    "customer_year_overlap",
    "source_quality_udaf",
    "text_stats",
    "lang_id_docs",
    "shard_assignment",
    "doc_sample_split",
    "doc_bottomk_sample",
    "doc_quota_sample",
    "doc_vowel_stats_pandas_udf",
    # NEWEST operators (late r4): TPC-H completion battery + span dedup
    # + canonical selection + JL projection — each gets its first driver
    # row now; the 8 displaced representatives (q2_hourly_avg_value,
    # dq_filter_orders, union_fleets_unify, streaming_stateful_user_counts,
    # lone_fault_suppliers, cdc_orders_merge, embedding_neardup_blocked,
    # embedding_neardup_pairs) are all r1-r3 driver-hash-verified and
    # their classes keep in-window representatives.
    "min_cost_supplier_per_part",
    "nation_profit_by_year",
    "returned_item_losses",
    "top_revenue_suppliers",
    "part_supplier_variety",
    "dedup_spans_corpus",
    "dedup_canonical_docs",
    "embedding_random_projection",
    # reference surface representatives (SURVEY §2.1-2.6, §7.2)
    "q1_monthly_revenue",
    "dq_expectations_orders",
    "large_volume_orders",  # topk_orders (r3-verified) -> Q18 top-k shape
    "sql_consumption_report",
    # joins (§2.7): as-of representative (salted_orders_per_segment is
    # r3-hash-verified)
    "lineitem_asof_prior_order",
    # window functions (§2.8)
    "top3_lineitems_per_supplier",
    # edit-distance similarity join (PassJoin)
    "similar_part_names",
    # structured streaming (§2.9): custom source + the late-data query
    # converting from rows-only to hash-checked this round
    # (streaming_stateful_user_counts r3-verified, displaced)
    "streaming_snapshot_source_counts",  # streaming_tumbling_counts (r3-verified) -> custom streaming source
    "streaming_late_data_tumbling",
    # TPC-H subquery battery representatives
    "late_shipment_priorities",  # disjunctive_part_revenue (r3-verified) -> Q4 EXISTS shape
    # modern SQL + Arrow surface representatives
    "nation_reach_bfs",
    "customer_order_distribution",  # quantity_profile_by_flag (r3-verified) -> Q13 histogram
    "winnow_fingerprint_docs",  # doc_token_stats_arrow (r3-verified) -> winnowing fingerprints
    # graph
    "pagerank_dangling",
    # ETL: snapshot change feed (snapshot_table_roundtrip,
    # scd2_user_event_type, cdc_orders_merge are r1-r3 hash-verified;
    # snapshot_change_feed is earlier in the window)
    # dedup / ANN representatives
    "dedup_containment_pairs",  # dedup_clusters (r3-verified) -> containment metric
    # multimodal representative
    "multimodal_meta",
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
