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
# ``queries()`` insertion order. Round-13 rotation (VERDICT r12 task #1),
# re-derived against the actual CORRECTNESS_r{1..12}.json union:
# staleness distribution is 48@r9 / 50@r10 / 50@r11 / 50@r12, zero
# never-green, 198 registered == 198 ever-green. This window is the 48
# queries whose newest green driver row is r9 — the oldest evidence in
# the ledger — plus the alphabetically-first r10 rows starting the r10
# cohort refresh. Window invariant: every member's newest prior green
# row is <= r10; after this round no registered query's evidence
# predates r10. Everything displaced is r10/r11/r12 driver-hash-verified
# and remains registered, benchmarked, and locally parity-tested;
# tests/test_window_coverage.py FAILS the suite if any registered query
# has neither a driver row in any CORRECTNESS_r*.json nor a slot here,
# and if this list exceeds the 50 slots the driver actually records.
# NEW queries registered this round take a slot by displacing the
# alphabetically-last r10 filler (note it in COVERAGE.md) — the r8
# snapshot_time_travel_read pattern.
_PRIORITY_WINDOW = [
    # --- stalest: newest green row is r9 (48) ---------------------------
    "balanced_shard_packing",
    "bigram_lm_scores",
    "bpe_pair_counts",
    "classifier_score_docs",
    "cohort_retention",
    "corpus_datasheet",
    "curate_corpus_pipeline",
    "dedup_containment_pairs",
    "dedup_incremental_minhash",
    "dedup_spans_corpus",
    "doc_bottomk_sample",
    "doc_group_split",
    "doc_mixture_sample",
    "doc_quota_sample",
    "doc_repetition_stats",
    "doc_sample_split",
    "doc_vowel_stats_pandas_udf",
    "dq_expectations_orders",
    "embedding_kmeans",
    "embedding_random_projection",
    "knn_join_embeddings",
    "lang_id_docs",
    "large_volume_orders",
    "late_shipment_priorities",
    "lineitem_asof_prior_order",
    "min_cost_supplier_per_part",
    "multimodal_meta",
    "nation_profit_by_year",
    "nation_wealth_coverage",
    "pack_training_sequences",
    "part_supplier_variety",
    "quality_filter_docs",
    "returned_item_losses",
    "semdedup_prune",
    "shard_assignment",
    "simsearch_bruteforce_topk",
    "simsearch_lsh_multiprobe",
    "simsearch_lsh_topk",
    "simsearch_recall_eval",
    "snapshot_cdf_updates",
    "snapshot_change_feed",
    "snapshot_delete_rows",
    "source_quality_udaf",
    "sql_consumption_report",
    "text_stats",
    "top3_lineitems_per_supplier",
    "top_revenue_suppliers",
    "winnow_fingerprint_docs",
    # --- NEW r13 queries take the two r10-filler slots ------------------
    # (displaced: approx_distinct_stats, biggest_order_per_customer —
    # both keep their r10 green rows)
    # conditional-merge CDF + conjunctive retention delete (VERDICT r12
    # tasks #2/#7)
    "cdc_conditional_cdf",
    # partitioned SnapshotTable + dynamic partition overwrite — the
    # reference's consumer layout end to end (VERDICT r12 task #3)
    "snapshot_partitioned_replace",
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
