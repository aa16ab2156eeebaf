"""Closed-form tests for snake shard packing, Hamilton stratified
allocation, and the LSH band-plan S-curve arithmetic."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.operators.dedup import lsh_band_plan
from nyc_taxi_data_pipeline_elt_spark.operators.indexing import snake_pack_shards
from nyc_taxi_data_pipeline_elt_spark.operators.sampling import (
    stratified_split_hamilton,
)


def test_snake_pack_known_assignment(spark):
    # weights 8,7,6,5,4,3,2,1 over 2 shards: ranks 0..7, snake rounds
    # (0,1),(1,0),(0,1),(1,0) -> shard0 gets 8,5,4,1=18; shard1 gets
    # 7,6,3,2=18 — the classic boustrophedon perfect split.
    rows = [(i, 8 - i) for i in range(8)]  # (key, weight)
    df = spark.createDataFrame(rows, ["k", "w"])
    out = snake_pack_shards(df, 2, "w", "k")
    totals = {
        r["shard_id"]: r["tot"]
        for r in out.groupBy("shard_id").agg(F.sum("w").alias("tot")).collect()
    }
    assert totals == {0: 18, 1: 18}


def test_snake_pack_balance_bound(spark):
    # Arbitrary weights: snake totals must sit within max(weight) of the
    # ideal equal share (greedy round-based bound), and every row is
    # assigned exactly one shard.
    rows = [(i, (i * 37) % 101 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "w"])
    out = snake_pack_shards(df, 8, "w", "k").cache()
    assert out.count() == 200
    totals = [
        r["tot"]
        for r in out.groupBy("shard_id").agg(F.sum("w").alias("tot")).collect()
    ]
    assert len(totals) == 8
    ideal = sum(r[1] for r in rows) / 8
    maxw = max(r[1] for r in rows)
    assert all(abs(t - ideal) <= maxw for t in totals)
    out.unpersist()


def test_hamilton_allocation_exact_budgets(spark):
    # Skewed strata; realized val/test counts must hit the corpus-wide
    # budgets exactly and each stratum must be within 1 of proportional.
    rows = [(i, "s%d" % (0 if i < 70 else 1 if i < 90 else 2)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = stratified_split_hamilton(
        df, strata_col="source", key_col="doc_id", val_pct=10, test_pct=5
    ).cache()
    n = {r["split"]: r["c"] for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert n.get("val", 0) == 10 and n.get("test", 0) == 5
    per = {
        (r["source"], r["split"]): r["c"]
        for r in out.groupBy("source", "split").agg(F.count("*").alias("c")).collect()
    }
    sizes = {"s0": 70, "s1": 20, "s2": 10}
    for s, ns in sizes.items():
        got_val = per.get((s, "val"), 0)
        assert abs(got_val - ns * 10 / 100) <= 1, (s, got_val)
    # determinism: rerun assigns identically
    again = stratified_split_hamilton(
        df, strata_col="source", key_col="doc_id", val_pct=10, test_pct=5
    )
    assert out.exceptAll(again).count() == 0
    out.unpersist()


def test_band_plan_matches_closed_form(spark):
    # Synthetic pair frame with known similarities; expected counts must
    # equal the closed-form S-curve sums on the floored 1/100 grid.
    sims = [0.05, 0.12, 0.33, 0.49, 0.5, 0.77, 1.0]
    df = spark.createDataFrame(
        [(i, i + 1000, s) for i, s in enumerate(sims)],
        ["doc_a", "doc_b", "jaccard"],
    )
    out = {
        (r["bands"], r["rows_per_band"]): r
        for r in lsh_band_plan(df, threshold=0.5).collect()
    }
    assert set(out) == {(8, 1), (4, 2), (2, 4), (1, 8)}
    for (b, r), row in out.items():
        t = f = 0.0
        for s in sims:
            g = math.floor(s * 100) / 100.0
            p = 1 - (1 - g**r) ** b
            if s >= 0.5:
                t += p
            else:
                f += p
        assert row["exp_true_x10k"] == math.floor(round(t * 10000, 6))
        assert row["exp_false_x10k"] == math.floor(round(f * 10000, 6))
        assert row["n_true_pairs"] == sum(1 for s in sims if s >= 0.5)
        assert row["n_candidates"] == len(sims)


def test_band_plan_scurve_tradeoff(spark):
    # More rows per band -> sharper curve -> strictly fewer expected
    # false candidates; fewer rows -> more expected true candidates.
    sims = [i / 100 for i in range(1, 100, 2)]
    df = spark.createDataFrame(
        [(i, i + 10_000, s) for i, s in enumerate(sims)],
        ["doc_a", "doc_b", "jaccard"],
    )
    rows = {r["rows_per_band"]: r for r in lsh_band_plan(df).collect()}
    assert (
        rows[1]["exp_false_x10k"]
        > rows[2]["exp_false_x10k"]
        > rows[4]["exp_false_x10k"]
        > rows[8]["exp_false_x10k"]
    )
    assert (
        rows[1]["exp_true_x10k"]
        >= rows[2]["exp_true_x10k"]
        >= rows[4]["exp_true_x10k"]
        >= rows[8]["exp_true_x10k"]
    )


def test_mid_local_rank_equals_window_rank(spark):
    """The monotonically_increasing_id bit-layout local rank (the
    exchange-free core of with_global_index) must equal the
    row_number-over-partition-id spelling on a multi-partition frame —
    the guard for the documented API contract the fast path relies on."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nyc_taxi_data_pipeline_elt_spark.operators.indexing import (
        _ranged_with_local,
    )

    df = spark.range(0, 5000).select(
        (F.col("id") * 7919 % 4999).alias("k"), F.col("id").alias("v")
    )
    body, _ = _ranged_with_local(df, ["k", "v"], 8)
    ref = F.row_number().over(
        Window.partitionBy(F.spark_partition_id()).orderBy("k", "v")
    )
    cmp = body.withColumn("__ref", ref - 1).filter(
        F.col("__local") != F.col("__ref")
    )
    assert cmp.count() == 0
    # and the derived global index is a contiguous permutation of 0..n-1
    from nyc_taxi_data_pipeline_elt_spark.operators.indexing import (
        with_global_index,
    )

    idx = with_global_index(df, ["k", "v"], index_name="gid")
    got = sorted(r["gid"] for r in idx.select("gid").collect())
    assert got == list(range(5000))
    body.unpersist()


def test_hamilton_matches_python_reference(spark):
    """Allocation must equal a straightforward Python largest-remainder
    implementation on a skewed stratum profile."""
    from pyspark.sql import functions as F

    sizes = {"a": 137, "b": 41, "c": 7, "d": 3, "e": 812}
    rows = []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = stratified_split_hamilton(
        df, strata_col="source", key_col="doc_id", val_pct=10, test_pct=5
    )
    got = {
        (r["source"], r["split"]): r["c"]
        for r in out.groupBy("source", "split").agg(F.count("*").alias("c")).collect()
    }

    def hamilton(pct):
        n_total = sum(sizes.values())
        v = n_total * pct // 100
        base = {s: n * v // n_total for s, n in sizes.items()}
        rem = {s: sizes[s] * v - base[s] * n_total for s in sizes}
        leftover = v - sum(base.values())
        for s in sorted(sizes, key=lambda s: (-rem[s], s))[:leftover]:
            base[s] += 1
        return base

    val, test = hamilton(10), hamilton(5)
    for s in sizes:
        assert got.get((s, "val"), 0) == val[s], (s, "val")
        assert got.get((s, "test"), 0) == test[s], (s, "test")
        assert got.get((s, "train"), 0) == sizes[s] - val[s] - test[s]


def test_hamilton_null_stratum_not_dropped(spark):
    """A NULL stratum is a real stratum: it is counted, allocated seats,
    and its rows must appear in the output with val/test delivered —
    the null-safe broadcast join is what keeps the corpus-wide budgets
    honest (a plain equi-join would silently drop every NULL-strata
    row while still reserving their seats)."""
    from pyspark.sql import functions as F

    rows = [(i, "a") for i in range(60)] + [(i + 60, None) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_split_hamilton(
        df, strata_col="source", key_col="doc_id", val_pct=10, test_pct=10
    )
    assert out.count() == 100  # nothing dropped
    got = {
        (r["source"], r["split"]): r["c"]
        for r in out.groupBy("source", "split")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    # V = 10 for each split; Hamilton: a -> 6, NULL -> 4.
    assert got.get(("a", "val"), 0) == 6 and got.get((None, "val"), 0) == 4
    assert got.get(("a", "test"), 0) == 6 and got.get((None, "test"), 0) == 4


def test_heavy_hitters_exact_under_adversarial_layout(spark):
    """The candidate+verify decomposition must return EXACTLY the items
    with freq > n/k regardless of partitioning — including a layout that
    splits a heavy item across many partitions."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_pipeline_elt_spark.operators.text import heavy_hitters

    # 1000 rows: 'hot' x 300, 'warm' x 100, 200 distinct cold singletons
    # + filler; k=5 -> threshold 200: only 'hot' qualifies.
    rows = (
        [("hot",)] * 300
        + [("warm",)] * 100
        + [(f"cold{i}",) for i in range(200)]
        + [("filler",)] * 400
    )
    df = spark.createDataFrame(rows, ["token"]).repartition(16)  # scatter
    out = {r["token"]: r["cnt"] for r in heavy_hitters(df, "token", 5).collect()}
    assert out == {"hot": 300, "filler": 400}
    # k=2 -> threshold 500: nothing qualifies
    assert heavy_hitters(df, "token", 2).count() == 0


def test_heavy_hitters_bounded_candidates_high_vocab(spark):
    """The Misra-Gries phase 1 must cap candidates at k per partition
    even when per-partition distinct count >> k — the layout where a
    'locally heavy' filter degrades to emitting the whole vocabulary
    (every singleton in a small partition is locally heavy). Output must
    stay exact regardless."""
    from nyc_taxi_data_pipeline_elt_spark.operators.text import (
        heavy_hitters,
        mg_candidates,
    )

    # 20k distinct singletons + one heavy item, scattered over MANY
    # partitions so each partition holds ~330 distinct values with k=8.
    rows = [(f"v{i}",) for i in range(20_000)] + [("hot",)] * 6_000
    df = spark.createDataFrame(rows, ["token"]).repartition(64)
    k = 8
    n_cands = mg_candidates(df, "token", k).count()
    assert n_cands <= k * 64, n_cands  # O(k x partitions), not O(vocab)
    out = {r["token"]: r["cnt"] for r in heavy_hitters(df, "token", k).collect()}
    assert out == {"hot": 6_000}  # threshold 26000/8 = 3250


def test_band_plan_empty_pair_frame(spark):
    """Zero candidate pairs must report n_candidates=0 (matching the
    oracle's count(*)), with all expected yields 0."""
    df = spark.createDataFrame([], "doc_a long, doc_b long, jaccard double")
    rows = lsh_band_plan(df).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_candidates"] == 0
        assert r["n_true_pairs"] == 0
        assert r["exp_true_x10k"] == 0 and r["exp_false_x10k"] == 0
