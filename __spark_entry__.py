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
# ``queries()`` insertion order. Round-5 rotation (COVERAGE.md ledger):
# the 20 queries that after r4 still lack any driver row (added late in
# r4, after that round's window was frozen) enter at the head — this
# closes the "every registered oracle-checkable query has at least one
# driver-recorded hash-match" gap. The remaining 30 slots keep one
# verified representative per operator class; order_price_deciles and
# similar_part_names are in because their PLANS change this round
# (departitioned global window; collision-aware edit-distance dispatch)
# and need re-verification under the new plans. Everything displaced is
# r1-r4 driver-hash-verified and remains registered, benchmarked, and
# locally parity-tested.
_PRIORITY_WINDOW = [
    # --- the 20 queries getting their FIRST driver row (r5 rotation) ---
    "funnel_conversion",
    "cohort_retention",
    "order_price_histogram",
    "approx_distinct_stats",  # rows-only by design (HLL sketch)
    "embedding_neardup_pairs",
    "bigram_lm_scores",
    "vocab_coverage",
    "doc_char_entropy",
    "corpus_datasheet",
    "kmv_distinct_tokens",
    "classifier_score_docs",
    "curate_corpus_pipeline",
    "dedup_lsh_recall_eval",
    "props_extract_udtf",
    "dedup_threshold_sweep",
    "embedding_norm_profile",
    "streaming_funnel_stages",
    "streaming_click_purchase_left_join",
    "nation_cheapest_route",
    "sql_scripting_threshold_scan",
    # --- operators NEW in r5 (first driver verification) ---------------
    "semantic_decontaminate",  # embedding-space benchmark scrub
    "percentile_sketch_eval",  # approx_percentile rank-error gate
    "streaming_user_totals_tws",  # Spark 4 transformWithState (probed)
    "streaming_dedup_within_watermark",  # state-bounded streaming dedup
    "dedup_minhash_lsh_capped",  # hot-bucket star-edge cap, oracle-checked
    "curriculum_budget_selection",  # quality curriculum under token budget
    "pii_redact_docs",  # typed-tag PII scrub, map-only codegen chain
    "mixture_temperature_weights",  # mT5-style temperature source mixing
    "embedding_standardize_profile",  # per-dim moments + 3-sigma screen
    "winsorized_order_stats",  # robust agg clipped at exact p01/p99
    "skew_diagnosis_orders",  # join-key skew profile + salt sizing
    "join_cardinality_estimate",  # KMV sketch join-size estimation
    "image_luma_profile",  # raw-bitmap decode/feature/resize, codec-free
    "video_motion_profile",  # raw-frame differencing motion screen
    # --- mid-r5 additions that would otherwise repeat the late-r4 gap
    # (registered after earlier window text was written; first rows now)
    "bpe_pair_counts",
    "source_overlap_matrix",
    "source_novelty_curve",
    "quality_quantile_normalize",
    "balanced_shard_packing",  # LPT/snake token-balanced shards
    "dedup_lsh_band_plan",  # DECIMAL-exact S-curve index planning
    "doc_stratified_split",  # Hamilton largest-remainder apportionment
    "ab_test_event_value",  # Welch t from exact integer-cent moments
    "events_anomaly_screen",  # leave-one-out rolling z-score flags
    "orders_grouping_sets",  # explicit GROUPING SETS + grouping() flags
    "quality_drift_psi",  # fixed-bin PSI drift between corpus slices
    "customer_entity_leaders",  # ER: blocking + editdist dispatch + star
    # --- queries whose plan CHANGED this round (re-verification) -------
    "order_price_deciles",  # global window -> range-partition + offsets
    "similar_part_names",  # collision-aware PassJoin/quadratic dispatch
    # --- one verified representative per operator class ----------------
    # (displaced to make room for the seven entries above —
    # dq_expectations_orders, sql_consumption_report,
    # salted_orders_per_segment, streaming_stateful_user_counts,
    # late_shipment_priorities, nation_reach_bfs, winnow_fingerprint_docs
    # join q2_hourly_avg_value, large_volume_orders,
    # min_cost_supplier_per_part, dedup_minhash_lsh as displaced
    # r1-r4 driver-hash-verified entries; every class keeps at least one
    # in-window or cross-round-verified representative)
    # reference surface (SURVEY §2.1-2.6, §7.2); the one remaining
    # representative slot — every other slot is a first-time or
    # changed-plan verification. Displaced, all r1-r4
    # driver-hash-verified: lineitem_asof_prior_order, pagerank_dangling,
    # top3_lineitems_per_supplier, cdc_orders_merge,
    # streaming_snapshot_source_counts (streaming keeps five first-timer
    # entries in-window; window-fn/graph classes keep
    # funnel_conversion/cohort_retention and nation_cheapest_route).
    "q1_monthly_revenue",
    # (snapshot_table_roundtrip / customer_order_distribution r4-verified,
    # displaced by image_luma_profile + video_motion_profile)
    # dedup / ANN production paths (semdedup_prune / embedding_kmeans
    # r4-verified, displaced by the four new-in-r5 operators above;
    # embedding class keeps neardup_pairs + norm_profile +
    # standardize_profile in-window)
    # text analysis (text_stats / quality_filter_docs r4-verified,
    # displaced; class keeps bigram_lm_scores, vocab_coverage,
    # doc_char_entropy, pii_redact_docs in-window)
    # sampling / packing: curriculum_budget_selection composes the same
    # pack_sequences + with_global_index machinery (pack_training_sequences
    # r4-verified, displaced)
    # multimodal: the codec-free REAL audio path (binary PCM column ->
    # integer frame stats -> engine-side RMS/silence) takes the class
    # slot from multimodal_meta (r4-verified)
    "audio_energy_profile",
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
