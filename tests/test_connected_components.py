"""connected_components: generic over id type and magnitude."""

from __future__ import annotations

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


def test_large_magnitude_ids(spark):
    # hash-scale ids (~2^62): convergence must not depend on summability
    base = 1 << 62
    got = _components(
        spark,
        [(base, base + 1), (base + 1, base + 2), (base + 2, base + 3)],
        "doc_a long, doc_b long",
    )
    assert got == {base + i: base for i in range(4)}
