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
