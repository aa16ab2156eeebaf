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


def test_pagerank_dangling_one_step(spark):
    # a -> {b, c}; b and c are dangling. With redistribution, after one
    # iteration: dm = r(b)+r(c) = 2/3, each node gains d*dm/N uniformly.
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string"
    )
    got = {
        r.node: r.rank
        for r in pagerank(e, iterations=1, dangling=True).collect()
    }
    base = 0.15 / 3
    redist = 0.85 * (2 / 3) / 3
    assert got["a"] == pytest.approx(base + redist, abs=1e-9)
    assert got["b"] == pytest.approx(base + 0.85 * (1 / 6) + redist, abs=1e-9)
    assert got["c"] == pytest.approx(base + 0.85 * (1 / 6) + redist, abs=1e-9)


def test_pagerank_dangling_conserves_mass(spark):
    # the whole point of redistribution: total rank mass stays 1, while
    # the leaky variant loses the dangling outflow every iteration
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a")], "src string, dst string"
    )
    full = pagerank(e, iterations=4, dangling=True).collect()
    assert sum(r.rank for r in full) == pytest.approx(1.0, abs=1e-8)
    leaky = pagerank(e, iterations=4).collect()
    assert sum(r.rank for r in leaky) < 1.0 - 1e-6


def test_pagerank_no_danglers_unaffected(spark):
    # on a graph where every node has out-edges the two formulations agree
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    plain = {r.node: r.rank for r in pagerank(e, iterations=3).collect()}
    dang = {
        r.node: r.rank
        for r in pagerank(e, iterations=3, dangling=True).collect()
    }
    assert plain == pytest.approx(dang, abs=1e-12)


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


def test_bounded_sssp_closed_form(spark):
    """Diamond with a cheap long way round: a -> b -> d costs 10+1,
    a -> d direct costs 100; with 2 rounds the cheap 2-hop path wins,
    with 1 round only the direct edge is reachable at its cost."""
    from nyc_taxi_data_pipeline_elt_spark.operators.graph import bounded_sssp

    edges = spark.createDataFrame(
        [("a", "b", 10), ("b", "d", 1), ("a", "d", 100)],
        "src: string, dst: string, cost: long",
    )
    two = {r["node"]: r["min_cost"] for r in bounded_sssp(edges, "a", rounds=2).collect()}
    assert two == {"a": 0, "b": 10, "d": 11}
    one = {r["node"]: r["min_cost"] for r in bounded_sssp(edges, "a", rounds=1).collect()}
    assert one == {"a": 0, "b": 10, "d": 100}
