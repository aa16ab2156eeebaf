"""Closed-form tests for distributed spherical k-means + SemDeDup."""

from __future__ import annotations

import pyspark.sql.functions as F

from nyc_taxi_data_pipeline_elt_spark.operators import clustering as C
from nyc_taxi_data_pipeline_elt_spark.operators import sampling as M
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table
from tests.conftest import SF_DIR

# Two obvious directions in 4-d: +x-ish and +y-ish. vec_id 0 and 1 are
# the seeds, so cluster 0 must collect the x-family and cluster 1 the
# y-family regardless of iteration count.
_VECS = [
    (0, [1.0, 0.0, 0.1, 0.0]),
    (1, [0.0, 1.0, 0.0, 0.1]),
    (2, [0.9, 0.1, 0.0, 0.0]),
    (3, [0.1, 0.9, 0.0, 0.0]),
    (4, [1.0, 0.0, 0.0, 0.2]),
    (5, [0.0, 1.0, 0.1, 0.0]),
]


def _frame(spark):
    return spark.createDataFrame(
        _VECS, "vec_id: long, embedding: array<float>"
    )


def test_kmeans_recovers_directions(spark):
    assigned, cents = C.kmeans(_frame(spark), k=2, n_iter=2, dim=4)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}
    assert len(cents) == 2
    # updated centroid 0 leans x: first component dominates
    assert cents[0][1][0] > cents[0][1][1]


def test_assignment_tie_breaks_to_lowest_cid(spark):
    # identical centroids: every vector ties; lowest cid must win
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0, 0.0])]
    dfn = C.with_norms(_frame(spark), dim=4)
    out = C.assign_clusters(dfn, cents, dim=4)
    assert {r["cluster"] for r in out.collect()} == {0}


def test_norms_match_python(spark):
    import math

    dfn = C.with_norms(_frame(spark), dim=4)
    for r in dfn.collect():
        assert abs(r["vnorm"] - math.sqrt(sum(x * x for x in r["v"]))) < 1e-12


def test_semdedup_drops_higher_id_of_near_identical_pair(spark):
    rows = _VECS + [(6, [0.9, 0.1, 0.0, 0.0])]  # clone of vec 2
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    assigned, _ = C.kmeans(df, k=2, n_iter=1, dim=4)
    dropped = C.semdedup_prune(assigned, threshold=0.999, dim=4)
    got = {r["vec_id"] for r in dropped.collect()}
    assert 6 in got and 2 not in got  # lower id kept


def test_group_split_is_leakage_safe(spark):
    docs = load_table(spark, SF_DIR, "documents")
    per_source = (
        docs.withColumn("split", M.split_assignment("source", 0.8, 0.1))
        .groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert per_source and all(r["n_splits"] == 1 for r in per_source)


def test_reference_scrub_closed_form(spark):
    """Closed-form contract for the semantic scrub kernel: an exact
    duplicate of a reference vector scores cos 1.0; an orthogonal
    vector is excluded; a vector equidistant from two references
    reports the LOWEST reference id (the oracle's ORDER BY cos DESC,
    ref_id tie-break)."""
    from nyc_taxi_data_pipeline_elt_spark.operators.similarity import (
        reference_scrub,
    )

    dim = 64

    def vec(*hot):
        v = [0.0] * dim
        for i, x in hot:
            v[i] = x
        return v

    refs = spark.createDataFrame(
        [(100, vec((0, 1.0))), (101, vec((1, 1.0)))],
        "bench_vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, vec((0, 2.0))),            # duplicate direction of ref 100
            (2, vec((2, 1.0))),            # orthogonal to both -> excluded
            (3, vec((0, 1.0), (1, 1.0))),  # tie: cos ~0.707107 to both
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["vec_id"]: (r["bench_vec_id"], r["max_cos"])
        for r in reference_scrub(corpus, refs, theta=0.5).collect()
    }
    assert rows[1] == (100, 1.0)
    assert 2 not in rows
    assert rows[3][0] == 100  # lowest ref id wins the tie
    assert abs(rows[3][1] - 0.707107) < 1e-9


def test_reference_scrub_empty_sides(spark):
    """No references -> nothing is contaminated; empty corpus -> empty
    result. Neither may error (the crawl-time batches that hit these
    edges are routine)."""
    from nyc_taxi_data_pipeline_elt_spark.operators.similarity import (
        reference_scrub,
    )

    dim = 64
    v = [1.0] + [0.0] * (dim - 1)
    corpus = spark.createDataFrame(
        [(1, v)], "vec_id long, embedding array<double>"
    )
    refs = spark.createDataFrame(
        [(9, v)], "bench_vec_id long, embedding array<double>"
    )
    empty_refs = refs.filter("bench_vec_id < 0")
    empty_corpus = corpus.filter("vec_id < 0")

    assert reference_scrub(empty_corpus, refs, theta=0.5).count() == 0
    # empty reference set: vacuously clean corpus
    assert reference_scrub(corpus, empty_refs, theta=0.5).count() == 0
