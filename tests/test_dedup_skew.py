"""Hot-key stress for the dedup/LSH family.

The driver fixtures are uniform; real corpora have boilerplate — one
shingle (or one band key) shared by a double-digit percentage of the
corpus. These tests build exactly that corpus and pin the two caps that
keep the operators off a straggler task:

- ``minhash_lsh_pairs(max_bucket_size=...)``: mega band-buckets emit
  O(c) star edges instead of O(c^2) pairs, preserving the candidate
  graph's connected components exactly;
- ``ngram_jaccard_pairs/containment_pairs(df_cap=...)``: shingles
  hotter than the cap are dropped from candidate generation only, with
  an exact verify recomputing every reported metric over the FULL
  shingle sets.

Uncapped exactness on the same skewed corpus is asserted too (the caps
must be opt-in, not a silent semantics change).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.operators import dedup as D

BOILER = "terms of service apply all rights reserved contact us today"


def _skewed_docs(spark, n_docs=300, hot_frac=0.1, seed=3):
    """~hot_frac of docs are the SAME boilerplate (plus a unique tail
    token so ids differ but shingles collide); the rest are random."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(n_docs):
        if i < int(n_docs * hot_frac):
            rows.append((i, BOILER))
        else:
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(30))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_star_cap_bounds_hot_bucket_output(spark):
    docs = _skewed_docs(spark, n_docs=300, hot_frac=0.1)
    hot = 30  # identical docs -> identical signatures -> one bucket/band

    exact = D.minhash_lsh_pairs(docs)
    capped = D.minhash_lsh_pairs(docs, max_bucket_size=10)

    exact_rows = {(r.doc_a, r.doc_b) for r in exact.collect()}
    capped_rows = {(r.doc_a, r.doc_b) for r in capped.collect()}

    # exact path: the hot cluster alone contributes c*(c-1)/2 pairs
    hot_pairs = {(a, b) for a in range(hot) for b in range(hot) if a < b}
    assert hot_pairs <= exact_rows

    # capped path: hot cluster collapses to the O(c) star around doc 0
    star = {(0, b) for b in range(1, hot)}
    assert star <= capped_rows
    assert len(capped_rows) < len(exact_rows)
    # nothing outside the hot cluster invented or lost
    assert {p for p in capped_rows if p[0] >= hot} == {
        p for p in exact_rows if p[0] >= hot
    }


def test_lsh_star_cap_preserves_connected_components(spark):
    """The star edges must keep every hot doc in ONE component — the
    contract the downstream clustering consumes."""
    docs = _skewed_docs(spark, n_docs=200, hot_frac=0.15)
    capped = D.minhash_lsh_pairs(docs, max_bucket_size=8)
    comps = D.connected_components(capped)
    hot_ids = set(range(int(200 * 0.15)))
    hot_comp = {
        r["component"]
        for r in comps.collect()
        if r["node"] in hot_ids
    }
    assert len(hot_comp) == 1


def test_df_cap_keeps_metrics_exact_on_surviving_pairs(spark):
    """Candidate+verify: every pair BOTH paths report must carry an
    IDENTICAL jaccard/containment value (the verify recomputes over the
    full shingle sets); pairs only the exact path reports must be
    pure-boilerplate pairs (all shared shingles hotter than the cap)."""
    docs = _skewed_docs(spark, n_docs=120, hot_frac=0.1)
    cap = 6

    for fn, value_cols in (
        (D.ngram_jaccard_pairs, ["jaccard"]),
        (D.containment_pairs, ["containment_a", "containment_b"]),
    ):
        exact = {
            (r["doc_a"], r["doc_b"]): tuple(r[c] for c in value_cols)
            for r in fn(docs).collect()
        }
        capped = {
            (r["doc_a"], r["doc_b"]): tuple(r[c] for c in value_cols)
            for r in fn(docs, df_cap=cap).collect()
        }
        assert set(capped) <= set(exact)
        for pair, vals in capped.items():
            assert vals == exact[pair], (fn.__name__, pair)
        # the hot cluster (12 identical docs; its shingles have df=12 >
        # cap) is exactly what the capped path drops
        dropped = set(exact) - set(capped)
        hot_ids = set(range(12))
        assert dropped == {
            p for p in exact if p[0] in hot_ids and p[1] in hot_ids
        }
        assert dropped  # the stress actually exercised the cap


def test_df_cap_bounds_join_fanout(spark):
    """The capped inverted index must not carry the hot shingle: its
    per-key join fan-out is bounded by df_cap (the plan property that
    kills the straggler)."""
    docs = _skewed_docs(spark, n_docs=300, hot_frac=0.1)
    from nyc_taxi_data_pipeline_elt_spark.operators.dedup import (
        shingle_rows,
    )

    inv = shingle_rows(docs, n=3).distinct()
    cap = 10
    rare = (
        inv.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= cap)
    )
    max_df = rare.agg(F.max("df")).collect()[0][0]
    assert max_df <= cap
    # and the uncapped index really does contain a ~10% hot key
    hot_df = (
        inv.groupBy("s")
        .agg(F.count("*").alias("df"))
        .agg(F.max("df"))
        .collect()[0][0]
    )
    assert hot_df >= 30


def test_caps_on_empty_corpus(spark):
    """Empty input must flow through the capped plans without error —
    the first crawl batch is empty more often than not."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert D.minhash_lsh_pairs(empty, max_bucket_size=5).count() == 0
    assert D.ngram_jaccard_pairs(empty, df_cap=5).count() == 0
    assert D.containment_pairs(empty, df_cap=5).count() == 0
