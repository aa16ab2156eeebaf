"""Graph operators: PageRank (known closed-form cases) and triangle
count (hand-countable graphs)."""

from __future__ import annotations

import pytest

from nyc_taxi_data_pipeline_elt_spark.operators.graph import pagerank, triangle_count


def test_pagerank_symmetric_cycle(spark):
    # a directed 3-cycle is perfectly symmetric: every node keeps rank 1/3
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = {r.node: r.rank for r in pagerank(e, iterations=5).collect()}
    assert got == pytest.approx({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, abs=1e-9)


def test_pagerank_sink_dominates(spark):
    # two sources pointing at one sink: sink accumulates damped mass
    # r(c) after 1 iter = 0.05 + 0.85*(r(a)+r(b)) with r0=1/3 each
    e = spark.createDataFrame(
        [("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = {r.node: r.rank for r in pagerank(e, iterations=1).collect()}
    base = 0.15 / 3
    assert got["c"] == pytest.approx(base + 0.85 * (2 / 3), abs=1e-9)
    assert got["a"] == pytest.approx(base, abs=1e-9)


def test_pagerank_weighted_split(spark):
    # a splits 3:1 between b and c -> contributions follow the weights
    e = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)], "src string, dst string, w int"
    )
    got = {r.node: r.rank for r in pagerank(e, weight="w", iterations=1).collect()}
    base = 0.15 / 3
    assert got["b"] == pytest.approx(base + 0.85 * (1 / 3) * 0.75, abs=1e-9)
    assert got["c"] == pytest.approx(base + 0.85 * (1 / 3) * 0.25, abs=1e-9)


def test_triangle_count(spark):
    # K4 has 4 triangles; a pendant edge adds none; direction/duplicates
    # of the input pairs are irrelevant after canonicalization
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    extra = [("d", "e"), ("e", "d")]  # duplicate in both directions
    e = spark.createDataFrame(k4 + extra, "doc_a string, doc_b string")
    assert triangle_count(e).collect()[0].n_triangles == 4


def test_triangle_count_empty_of_triangles(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "c")], "doc_a string, doc_b string")
    assert triangle_count(e).collect()[0].n_triangles == 0
