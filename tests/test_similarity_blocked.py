"""LSH-blocked embedding near-dup: the production path must return a
subset of the exact all-pairs verifier, stay fully distributed (no
driver collect, no corpus broadcast), and agree with its DuckDB twin
(covered by test_oracle_parity)."""

from __future__ import annotations

from nyc_taxi_data_pipeline_elt_spark.operators import similarity as S
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def _pairs(df):
    return {(r.id_a, r.id_b): r.cos_sim for r in df.collect()}


def test_blocked_subset_of_exact(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = _pairs(S.neardup_pairs(emb, threshold=0.35))
    blocked = _pairs(S.neardup_pairs_blocked(emb, threshold=0.35))
    assert blocked, "blocking produced no candidate pairs at all"
    assert set(blocked) <= set(exact)
    # the similarity values are computed identically in both paths
    for k, v in blocked.items():
        assert v == exact[k]


def test_blocked_recall_improves_with_more_bands(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    few = _pairs(S.neardup_pairs_blocked(emb, n_bands=2, band_planes=4))
    more = _pairs(S.neardup_pairs_blocked(emb, n_bands=6, band_planes=4))
    assert set(few) <= set(more)
    assert len(more) > len(few)


def test_multiprobe_recall_superset(spark):
    """Multi-probe scans the exact bucket plus all Hamming-1 buckets, so
    its top-k similarity floor is at least the single-probe one."""
    emb = load_table(spark, SF_DIR, "embeddings")
    single = S.lsh_topk(emb, query_vec_id=0, k=10, n_planes=5).collect()
    multi = S.lsh_topk_multiprobe(emb, query_vec_id=0, k=10, n_planes=5).collect()
    assert len(multi) >= len(single)
    assert min(r.cos_sim for r in multi) >= min(r.cos_sim for r in single)


def test_knn_join_matches_bruteforce_for_query_vector(spark):
    """Where blocking keeps the true neighbors, the kNN join's row for a
    vector agrees with exact brute force — check the neighbor list for
    vec 0 is a subset of its brute-force top-20."""
    emb = load_table(spark, SF_DIR, "embeddings")
    knn = {
        r.neighbor_id
        for r in S.knn_join_blocked(emb, k=3).filter("vec_id = 0").collect()
    }
    brute = {
        r.vec_id
        for r in S.brute_force_topk(emb, query_vec_id=0, k=20).collect()
    }
    assert knn, "no neighbors found for vector 0"
    assert knn <= brute


def test_exact_verifier_refuses_large_corpus(spark):
    """The exact all-pairs path is capped: above max_vectors it must
    raise and point at the blocked production twin, so no registered
    query can ever collect a real corpus to the driver."""
    import pytest

    emb = load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="neardup_pairs_blocked"):
        S.neardup_pairs(emb, max_vectors=10)


def test_blocked_construction_runs_no_jobs(spark):
    """Building the blocked plan must stay lazy — the exact verifier's
    driver-side toPandas() is exactly what this path removes."""
    emb = load_table(spark, SF_DIR, "embeddings")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    S.neardup_pairs_blocked(emb)  # no action triggered
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_auto_band_planes_sizing_rule():
    """Index sizing (SCALING.md sf1 decade): bucket population must stay
    ~target across corpus decades, so planes grow by ~log2(10) ~= 3.3
    per decade; fixed-knob growth is the measured 28x/decade offender."""
    from nyc_taxi_data_pipeline_elt_spark.operators.similarity import (
        auto_band_planes,
    )

    assert auto_band_planes(2_000, 150) == 4  # sf0.1's historical knob
    assert auto_band_planes(20_000, 150) == 8  # the re-sized sf1 knob
    assert auto_band_planes(200_000, 150) == 11
    assert auto_band_planes(50, 150) == 1  # tiny corpora stay 2-bucket
    # expected population stays within [target/2, target] by construction
    for n in (10**4, 10**5, 10**6, 10**7):
        p = auto_band_planes(n, 150)
        assert 75 <= n / (1 << p) <= 150


def test_knn_join_auto_sizing_end_to_end(spark):
    from nyc_taxi_data_pipeline_elt_spark.operators.similarity import (
        knn_join_blocked,
    )
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = knn_join_blocked(emb, k=3, target_bucket=50)
    rows = out.groupBy("vec_id").count().collect()
    assert rows and all(r["count"] <= 3 for r in rows)


def test_neardup_blocked_auto_sizing_end_to_end(spark):
    from nyc_taxi_data_pipeline_elt_spark.operators.similarity import (
        neardup_pairs_blocked,
    )
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = neardup_pairs_blocked(emb, threshold=0.35, target_bucket=50)
    rows = out.collect()
    assert rows
    assert all(r["id_a"] < r["id_b"] for r in rows)
