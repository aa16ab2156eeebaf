"""Recall floors for the ANN / LSH index-quality evaluations.

``simsearch_recall_eval`` and ``dedup_lsh_recall_eval`` REPORT recall
but (pre-r5) nothing asserted a minimum — an LSH regression (bad
hyperplane literals, a band mis-split) would still hash-match its own
wrong index. These tests pin floors measured at sf0.001/sf0.01 with
headroom, so a silent index-quality regression fails CI even while the
oracle comparison (which re-derives the same wrong candidates) stays
green.
"""

from __future__ import annotations

import pytest

from nyc_taxi_data_pipeline_elt_spark.plans import trainingdata as TD

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def _by_method(df):
    return {r["method"]: r for r in df.collect()}


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_simsearch_multiprobe_recall_floor(spark, sf_dir):
    """Hamming-1 multi-probe must recover a meaningful fraction of the
    exact top-10 (measured: 0.8 at sf0.001, 0.5 at sf0.01), and must
    never do worse than single-probe — the monotonicity is structural
    (its bucket set is a superset)."""
    rows = _by_method(TD.simsearch_recall_eval(spark, sf_dir))
    multi = rows["lsh_multiprobe"]["recall"]
    single = rows["lsh"]["recall"]
    assert multi >= 0.4, f"multi-probe recall@10 collapsed: {multi}"
    assert multi >= single


def test_dedup_lsh_recall_floor(spark):
    """The banded MinHash index must recover (nearly) all exact
    n-gram-Jaccard >= 0.5 pairs. With 32 hashes in 8 bands of 4 rows,
    a >= 0.5-similar pair shares a band with probability
    1-(1-0.5^4)^8 ~= 0.40 per the S-curve — but the fixture's true
    pairs are far above the 0.5 threshold (near-duplicates by
    construction), so measured recall is 1.0 at both SFs; 0.9 leaves
    regression headroom without tolerating a band mis-split (which
    drops recall to ~0)."""
    for sf_dir in (SF_SMALL, SF_MED):
        row = TD.dedup_lsh_recall_eval(spark, sf_dir).collect()[0]
        assert row["n_exact"] > 0, "fixture lost its planted near-dups"
        assert row["lsh_recall"] >= 0.9, (
            f"{sf_dir}: LSH candidate recall {row['lsh_recall']}"
        )


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_ivf_recall_floors(spark, sf_dir):
    """IVF floors (VERDICT r6 #6). Label-bucket IVF: nprobe=2 must
    beat-or-match nprobe=1 (structural — the probed set is a superset),
    but its ABSOLUTE recall is capped near the scanned fraction
    (~nprobe/10 of the corpus; measured 0.30 at both SFs) because the
    label column is orthogonal to embedding geometry. The k-means
    coarse quantizer is the real index: 2 of 8 geometry-aligned cells
    recover 0.90 of the exact top-10 at both SFs — the floor pins that
    gap so a quantizer regression (bad seed, broken Lloyd update)
    fails CI even while its oracle (same wrong index) stays green."""
    exact = {
        r["vec_id"]
        for r in TD.simsearch_bruteforce_topk(spark, sf_dir).collect()
    }
    ivf1 = {
        r["vec_id"] for r in TD.simsearch_ivf_topk(spark, sf_dir).collect()
    }
    ivf2 = {
        r["vec_id"]
        for r in TD.simsearch_ivf_multiprobe(spark, sf_dir).collect()
    }
    km = {
        r["vec_id"]
        for r in TD.simsearch_ivf_kmeans(spark, sf_dir).collect()
    }
    r1 = len(ivf1 & exact) / len(exact)
    r2 = len(ivf2 & exact) / len(exact)
    rk = len(km & exact) / len(exact)
    assert r2 >= r1, (r1, r2)
    assert r2 >= 0.2, f"label-IVF nprobe=2 recall@10 collapsed: {r2}"
    assert rk >= 0.8, f"k-means IVF recall@10 collapsed: {rk}"
    assert rk > r2, "geometry-aligned cells must beat metadata buckets"


def test_pq_recall_floor(spark):
    """Product quantization (64-bit codes, m=16 x k=16) must place a
    meaningful fraction of the exact top-10 in its ADC top-10 (measured:
    0.6 at sf0.001, 0.3 at sf0.01 — ADC ranks by reconstruction, so on
    near-random embeddings where true cosine gaps are tiny this is the
    expected regime, not a defect). The floors catch codebook
    regressions (a broken update or seed rule drops recall to ~0)."""
    from nyc_taxi_data_pipeline_elt_spark.operators import similarity as S
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

    for sf_dir, floor in ((SF_SMALL, 0.3), (SF_MED, 0.1)):
        emb = load_table(spark, sf_dir, "embeddings")
        exact = {
            r.vec_id
            for r in S.brute_force_topk(emb, query_vec_id=0, k=10).collect()
        }
        pq = {
            r.vec_id
            for r in S.pq_topk(emb, query_vec_id=0, k=10).collect()
        }
        got = len(exact & pq) / 10
        assert got >= floor, f"{sf_dir}: PQ recall@10 collapsed to {got}"


def test_pq_rerank_recall_floor(spark):
    """The deployed PQ shape — ADC shortlist (50) + exact re-rank — must
    recover most of the exact top-10 (measured 1.0 at sf0.001, 0.9 at
    sf0.01 vs 0.6/0.3 for pure-ADC top-10): recall is bounded only by
    shortlist membership, which is the quantitative case for the
    re-rank stage."""
    from nyc_taxi_data_pipeline_elt_spark.operators import similarity as S
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

    # VERDICT r7 task #6: the sf0.1 floor is 0.8 (measured 0.9 at both
    # shortlist 50 and 100 on the 50k-vector fixture) — thicker evidence
    # than the 0.7 small-fixture floors that the shortlist+re-rank shape
    # holds where pure ADC has already degraded to 0.4.
    for sf_dir, floor in (
        (SF_SMALL, 0.7),
        (SF_MED, 0.7),
        ("/root/testdata/sf0.1", 0.8),
    ):
        emb = load_table(spark, sf_dir, "embeddings")
        exact = {
            r.vec_id
            for r in S.brute_force_topk(emb, query_vec_id=0, k=10).collect()
        }
        rr = {
            r.vec_id
            for r in S.pq_rerank_topk(
                emb, query_vec_id=0, k=10, shortlist=50
            ).collect()
        }
        got = len(exact & rr) / 10
        assert got >= floor, f"{sf_dir}: PQ re-rank recall@10 fell to {got}"


def test_pq_small_corpus_trains_smaller_codebook(spark):
    """A corpus smaller than codebook_k must train an n-word codebook
    (clamped), not crash — and still return a valid top-k."""
    from nyc_taxi_data_pipeline_elt_spark.operators import similarity as S
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

    emb = load_table(spark, SF_SMALL, "embeddings").filter("vec_id < 8")
    out = S.pq_topk(emb, query_vec_id=0, k=5, m=4, codebook_k=16).collect()
    assert len(out) == 5
    assert all(r.vec_id != 0 for r in out)


def test_pq_topk_missing_query_and_no_cache_leak(spark):
    """ADVICE r7: a missing query id raises a clear ValueError (not a
    bare TypeError from first()['v']) and the exception path releases
    the corpus cache (try/finally, same class as pagerank/cc)."""
    import pytest

    from nyc_taxi_data_pipeline_elt_spark.operators import similarity as S
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    before = {
        r.toString() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    with pytest.raises(ValueError, match="not in the corpus"):
        S.pq_topk(emb, query_vec_id=-999_999)
    after = {
        r.toString() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    assert after <= before, f"pq_topk leaked cache entries: {after - before}"
