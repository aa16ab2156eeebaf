"""connected_components: generic over id type and magnitude."""

from __future__ import annotations

import warnings

import pytest

from nyc_taxi_data_pipeline_elt_spark.operators.dedup import connected_components


def _components(spark, pairs, schema):
    df = spark.createDataFrame(pairs, schema)
    out = connected_components(df)
    return {r.node: r.component for r in out.collect()}


def test_chain_and_island_long_ids(spark):
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (7, 8)], "doc_a long, doc_b long")
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7}


def test_string_ids(spark):
    # the id type is generic: labels are compared/min'd lexicographically
    got = _components(
        spark, [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], "doc_a string, doc_b string"
    )
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_iteration_cap_warns_not_silent(spark):
    # a 6-node chain needs ~3 min-propagation rounds; cap at 1 and the
    # labels are still split -> must warn, never silently return
    pairs = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    with pytest.warns(RuntimeWarning, match="max_iterations"):
        connected_components(df, max_iterations=1).collect()
    # and with enough rounds the same graph converges silently
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(7)}


def test_large_magnitude_ids(spark):
    # hash-scale ids (~2^62): convergence must not depend on summability
    base = 1 << 62
    got = _components(
        spark,
        [(base, base + 1), (base + 1, base + 2), (base + 2, base + 3)],
        "doc_a long, doc_b long",
    )
    assert got == {base + i: base for i in range(4)}
