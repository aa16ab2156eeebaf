"""Physical-plan regression tests: the scale properties the queries claim
(pushdown, no nested-loop joins, shared window exchanges, broadcasts) must
be visible in the executed plan, not just intended. These are the
`.explain("formatted")` audits frozen into CI — a refactor that silently
degrades a plan to a BroadcastNestedLoopJoin or drops a pushed filter
fails here long before it fails at 100 TB.
"""

from __future__ import annotations

import pytest

from nyc_taxi_data_pipeline_elt_spark.plans import analytics, trainingdata

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_click_attribution_is_equi_join(spark):
    """The binned range join must plan as an equi (shuffle/broadcast hash)
    join — the whole point of binning is avoiding the nested loop."""
    plan = _plan(analytics.click_attribution(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_probe_filter_reaches_scan(spark):
    """IVF bucket pruning must be a pushed-down scan predicate on the
    bucket column, enabling row-group/partition pruning at scale."""
    plan = _plan(trainingdata.simsearch_ivf_topk(spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "EqualTo(label," in plan


def test_gap_fill_single_exchange(spark):
    """Forward- and backward-fill share one window partitioning; the plan
    must shuffle on user_id exactly once."""
    plan = _plan(analytics.events_gap_fill(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_unigram_lm_vocab_join_broadcasts(spark):
    """The vocab-lookup join must broadcast the (tiny) vocab side, not
    shuffle the exploded token stream twice."""
    plan = _plan(trainingdata.unigram_lm_scores(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_pricing_summary_scan_is_pruned(spark):
    """Column pruning + filter pushdown on the widest fact table: the
    lineitem scan must read only the 7 referenced columns and push the
    shipdate predicate."""
    plan = _plan(analytics.pricing_summary(spark, SF_DIR))
    scan_lines = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scan_lines, plan
    scan = scan_lines[0]
    # untouched columns (keys, line numbers) stay unread
    assert "l_partkey" not in scan and "l_orderkey" not in scan
    assert "LessThanOrEqual(l_shipdate" in scan


def test_sample_split_no_shuffle(spark):
    """Hash sampling is row-local: the whole query must compile to a
    scan + project/filter with zero exchanges."""
    plan = _plan(trainingdata.doc_sample_split(spark, SF_DIR))
    assert "Exchange" not in plan


def test_neardup_blocked_is_distributed(spark):
    """The blocked near-dup path must shuffle only on the band keys plus
    the final pair dedup — never all-pairs, no corpus broadcast; both
    Python stages are Arrow-vectorized."""
    plan = _plan(trainingdata.embedding_neardup_blocked(spark, SF_DIR))
    assert "BroadcastExchange" not in plan
    assert "CartesianProduct" not in plan
    assert "MapInPandas" in plan  # band-key projection (narrow)
    assert "FlatMapGroupsInPandas" in plan  # per-bucket pair kernel
    assert plan.count("Exchange hashpartitioning") == 2


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A dim-filtered join against a Hive-partitioned fact must inject a
    dynamic pruning expression into the fact's PartitionFilters — the
    runtime star-join scan saver at 100 TB (only partitions matching the
    dim filter are read, decided at execution time)."""
    from pyspark.sql import functions as F

    facts = spark.range(0, 2000).select(
        "id",
        (F.col("id") % 12 + 1).alias("trip_month"),
        (F.col("id") * 2).alias("v"),
    )
    path = str(tmp_path / "fact")
    facts.write.partitionBy("trip_month").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(m, "peak" if m in (7, 8) else "off") for m in range(1, 13)],
        "trip_month int, season string",
    )
    j = (
        fact.join(dim, "trip_month")
        .filter(F.col("season") == "peak")
        .agg(F.sum("v").alias("s"))
    )
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower()


def test_mixture_sample_single_data_shuffle(spark):
    """Mixture sampling: apart from the O(#sources) count aggregate, the
    data path is ONE shuffle on the source key for the per-source rank."""
    plan = _plan(trainingdata.doc_mixture_sample(spark, SF_DIR))
    assert "Exchange hashpartitioning(source" in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_joins_band_keys_only(spark):
    """Incremental dedup joins the new batch against the stored index on
    the band keys — an equi join, never all-pairs."""
    from nyc_taxi_data_pipeline_elt_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_band_rows,
    )
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    dups, _ = incremental_minhash_dedup(
        docs.filter(F.col("doc_id") % 2 == 1),
        minhash_band_rows(docs.filter(F.col("doc_id") % 2 == 0)),
    )
    plan = _plan(dups)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_idx" in plan and "band_key" in plan


def test_pack_sequences_no_global_window_on_data(spark):
    """Sequence packing must never funnel the corpus through a single
    task: every window over the data is partitioned; the only
    single-partition window is the O(partitions) offset side."""
    plan = _plan(trainingdata.pack_training_sequences(spark, SF_DIR))
    # the offsets window (tiny) is the only SinglePartition exchange
    assert plan.count("Exchange SinglePartition") <= 1
    assert "Window" in plan


def test_knn_join_two_exchanges(spark):
    """Blocked kNN join: band-key shuffle + ONE id repartition that both
    the pair dedup (subset clustering rule) and the top-k window reuse."""
    plan = _plan(trainingdata.knn_join_embeddings(spark, SF_DIR))
    assert "BroadcastExchange" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_quota_sample_single_shuffle(spark):
    """Quota sampling shuffles once on the stratum key; ranking adds no
    extra exchange."""
    plan = _plan(trainingdata.doc_quota_sample(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1


def test_kmeans_assignment_is_row_local(spark):
    """The k-means assignment stage must be a NARROW Arrow stage over
    the scan — the centroid matrix rides in the closure, so no join and
    no exchange anywhere in the assignment."""
    from nyc_taxi_data_pipeline_elt_spark.operators import clustering as C
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

    dfn = C.with_norms(load_table(spark, SF_DIR, "embeddings"))
    cents = C.seed_centroids(dfn, k=4)
    plan = _plan(C.assign_clusters(dfn, cents))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "MapInPandas" in plan


def test_semdedup_pair_scan_is_cluster_blocked(spark):
    """SemDeDup's pair scan must be one shuffle on the cluster key into
    the per-cluster Arrow slab kernel — never a join, never a
    nested-loop/cartesian all-pairs product."""
    plan = _plan(trainingdata.semdedup_prune_embeddings(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_repetition_stats_single_exchange_on_docs(spark):
    """The per-token agg and the per-doc window share the doc_id
    partitioning: exactly one data exchange (plus none hidden in a
    SinglePartition funnel)."""
    plan = _plan(trainingdata.doc_repetition_stats(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_vocab_coverage_truncates_before_global_window(spark):
    """The global ranking window must consume the top-k, not the full
    vocab: a TakeOrderedAndProject appears below the window."""
    plan = _plan(trainingdata.vocab_coverage(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_curation_pipeline_is_one_fused_dag(spark):
    """The composed curation pipeline must stay a single DAG of its
    stages' own shuffles — no cartesian products, no nested-loop joins
    smuggled in by the stage composition."""
    plan = _plan(trainingdata.curate_corpus_pipeline(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_span_dedup_two_exchanges(spark):
    """Span assembly is row-local (no per-token shuffle): the whole
    query must shuffle exactly twice — the span_text first-occurrence
    window and the per-doc reassembly agg."""
    plan = _plan(trainingdata.dedup_spans_corpus(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 2


def test_random_projection_no_shuffle(spark):
    """JL projection is a pure map: zero exchanges in the plan."""
    plan = _plan(trainingdata.embedding_random_projection(spark, SF_DIR))
    assert "Exchange" not in plan


def test_min_cost_supplier_window_shape(spark):
    """Q2's correlated min must plan as offers-agg + window (2
    exchanges), with every dimension side broadcast and no nested
    loop."""
    from nyc_taxi_data_pipeline_elt_spark.plans import tpch_completion

    plan = _plan(tpch_completion.min_cost_supplier_per_part(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_part_supplier_variety_anti_join_broadcasts(spark):
    """Q16's NOT IN exclusion must be a broadcast left-anti join, and
    the distinct-count agg the only shuffles."""
    from nyc_taxi_data_pipeline_elt_spark.plans import tpch_completion

    plan = _plan(tpch_completion.part_supplier_variety(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_returned_item_losses_is_topk(spark):
    """Q10's top-20 must be a TakeOrderedAndProject with the orderdate
    window pushed to the orders scan."""
    from nyc_taxi_data_pipeline_elt_spark.plans import tpch_completion

    plan = _plan(tpch_completion.returned_item_losses(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_funnel_single_data_shuffle(spark):
    """The ordered funnel must do ONE data shuffle (the user_id window,
    reused by the per-user agg) plus the 1-row global rollup."""
    plan = _plan(analytics.funnel_conversion(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1


def test_runtime_bloom_filter_injects_on_fact_fact_join(spark):
    """At 100 TB the selective-dim x fact join that can't broadcast is
    exactly where Catalyst's runtime bloom filter pays: a bloom built
    from the filtered creation side must appear as a might_contain
    filter on the application side's scan. Local fixtures are below
    the application-side scan threshold, so it is lowered for the
    assertion (at real scale the default 10GB threshold passes by
    itself); AQE/broadcast are disabled because broadcast joins get
    the reduction for free."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        part = spark.read.parquet(f"{SF_DIR}/part.parquet").filter(
            F.col("p_size") == 1
        )
        j = (
            li.join(part, li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .count()
        )
        plan = _plan(j)
        assert "might_contain" in plan.lower()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_histogram_single_data_exchange(spark):
    """The equi-width histogram's global [min, max] is a broadcast 1-row
    aggregate (a BroadcastNestedLoopJoin with a one-row build side IS
    the never-collect scalar pattern, not a quadratic join); the only
    hash exchange in the plan must be the final 20-key count."""
    plan = _plan(analytics.order_price_histogram(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_deciles_no_global_window(spark):
    """ntile/percent_rank/cume_dist must come from the range-partition +
    broadcast-offset global rank, never a `Window.orderBy` over the
    whole table: every window over data is partitioned (by
    spark_partition_id); the only SinglePartition exchanges are the
    O(partitions) offsets side and the one-row count scalar."""
    import re

    plan = _plan(analytics.order_price_deciles(spark, SF_DIR))
    assert plan.count("Exchange SinglePartition") <= 2
    # every Window operator must carry a non-empty partition spec
    for m in re.finditer(r"Window \[[^\]]*windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # spec lists partition cols before the first ASC/DESC ordering
        assert spec.split(",")[0].strip(), f"unpartitioned window: {spec}"
    assert "rangepartitioning(o_totalprice" in plan


def test_similar_part_names_quad_branch_distributed(spark):
    """The collision-aware dispatch's quadratic branch must keep its
    pinned partition count (REPARTITION_BY_NUM is exempt from AQE
    coalescing) — without it the whole O(n_blk^2) pair scan lands on
    one task the moment AQE sees the tiny input bytes."""
    plan = _plan(analytics.similar_part_names(spark, SF_DIR))
    assert "REPARTITION_BY_NUM" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_decontaminate_is_one_narrow_stage(spark):
    """The benchmark matrix rides the task closure (k-means-centroid
    precedent), so the scrub is ONE narrow Arrow stage over the corpus
    scan: no exchange, no join, no window anywhere in the plan."""
    plan = _plan(trainingdata.semantic_decontaminate(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "MapInPandas" in plan


def test_percentile_sketch_eval_never_collects(spark):
    """Both the exact/approx percentile aggregate and the rank counts
    are 1-row frames joined back broadcast (the never-collect scalar
    pattern): no hash exchange of row data anywhere in the plan."""
    plan = _plan(analytics.percentile_sketch_eval(spark, SF_DIR))
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_pii_redact_is_map_only(spark):
    """The PII scrub must stay a pure scan->project plan: no exchange,
    no Python eval node — the zero-shuffle codegen chain it claims."""
    plan = _plan(trainingdata.pii_redact_docs(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_skew_diagnosis_two_aggs_no_sort(spark):
    """Key-skew profile = per-key hash agg + 1-row agg; the percentile
    aggregate must be partial-merge (no global Sort in the plan)."""
    plan = _plan(analytics.skew_diagnosis_orders(spark, SF_DIR))
    assert "Sort " not in plan and "Sort[" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_join_cardinality_sketches_are_topk(spark):
    """Each side's bottom-k-by-hash sketch must plan as
    TakeOrderedAndProject (partial top-k), never a global sort of the
    distinct-key frame."""
    plan = _plan(analytics.join_cardinality_estimate(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_snake_pack_no_global_data_window(spark):
    """The global weight rank must come from the range-partition + mid
    bit-layout + broadcast-offset pattern: a range exchange, NO window
    at all over the data (the partition-id window spelling costs a
    hidden second full-data exchange), and no single-partition window."""
    plan = _plan(trainingdata.balanced_shard_packing(spark, SF_DIR))
    assert "Exchange rangepartitioning" in plan
    assert "row_number()" not in plan
    assert "monotonically_increasing_id" in plan


def test_ab_test_single_aggregate_no_shuffle_of_rows(spark):
    """Welch readout = one partial+final aggregate pair over the scan;
    no join, no window, no sort anywhere in the plan."""
    plan = _plan(analytics.ab_test_event_value(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan
    assert "Sort" not in plan
    # map-side combine: partial_sum must appear before the final agg
    assert "partial_sum" in plan


def test_anomaly_screen_window_is_per_series(spark):
    """The rolling window must partition by event_type — a no-partition
    WindowExec over the daily frame would serialize all series."""
    plan = _plan(analytics.events_anomaly_screen(spark, SF_DIR))
    assert "Exchange hashpartitioning(event_type" in plan
    assert "Exchange SinglePartition" not in plan


def test_stratified_split_broadcasts_allocation(spark):
    """The O(#strata) allocation frame must broadcast onto the doc scan
    (no shuffle join of data against metadata), and the corpus-count
    lineage feeding all four allocation consumers must be cached — one
    InMemoryRelation, not four corpus aggregates."""
    plan = _plan(trainingdata.doc_stratified_split(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "InMemoryTableScan" in plan
    assert "SortMergeJoin" not in plan


def test_udtfs_row_path_is_deliberate(spark):
    """UDTFs intentionally run the row path: Arrow UDTF transfer was
    MEASURED ~5x slower for the polymorphic analyze() UDTF on this build
    (session.py RUNTIME_CONFS comment) — eval is row-wise by API
    contract either way. This pin documents the decision; flipping the
    conf should be a measured choice, not an accident."""
    for fn in (trainingdata.props_extract_udtf, trainingdata.bigrams_udtf):
        plan = _plan(fn(spark, SF_DIR))
        assert "BatchEvalPythonUDTF" in plan


def test_ivf_multiprobe_in_list_reaches_scan(spark):
    """nprobe=2 bucket pruning must push the IN-list into the scan —
    IN pushes down exactly like equality, which is what keeps the
    multi-probe read partition-prunable at 100 TB."""
    plan = _plan(trainingdata.simsearch_ivf_multiprobe(spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "In(label," in plan or "EqualTo(label," in plan


def test_ivf_kmeans_probe_is_cell_filtered_topk(spark):
    """k-means IVF: the in-cell rescoring must be a filter over the
    narrow Arrow assignment stage feeding a TakeOrderedAndProject —
    no join, no cartesian, no window over the corpus."""
    plan = _plan(trainingdata.simsearch_ivf_kmeans(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan  # the assignment stage


def test_knn_join_auto_sizing_keeps_plan_shape(spark):
    """auto_band_planes changes the KNOB, never the shape: the re-sized
    index must keep the two-exchange blocked plan (band-key shuffle +
    one id repartition), exactly like the fixed-knob plan."""
    from nyc_taxi_data_pipeline_elt_spark.operators.similarity import (
        knn_join_blocked,
    )
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = _plan(knn_join_blocked(emb, k=3, target_bucket=50))
    assert "BroadcastExchange" not in plan
    assert plan.count("Exchange hashpartitioning") == 2


def test_zorder_rewrite_is_single_range_exchange(spark, tmp_path):
    """OPTIMIZE ZORDER's clustering plan: the z-key is pure bit
    arithmetic inside codegen and the rewrite pays exactly ONE exchange
    — the range partition on the key — plus a partition-local sort
    (never a global sort). The key column itself must not survive into
    the written schema."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_pipeline_elt_spark.operators.indexing import zorder_key

    df = spark.range(1000).selectExpr(
        "id % 37 AS x", "id % 101 AS y", "id"
    )
    clustered = (
        df.withColumn("__zkey", zorder_key(["x", "y"], [(0, 36), (0, 100)]))
        .repartitionByRange(4, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    plan = _plan(clustered)
    assert plan.count("Exchange rangepartitioning") == 1
    assert plan.count("Exchange") == 1, plan
    # partition-local sort only: Sort node present with global=false
    assert "Sort [__zkey" in plan and "false, 0" in plan
    assert clustered.columns == ["x", "y", "id"]
