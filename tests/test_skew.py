"""salted_join: result-equivalence to the unsalted join for supported
modes; explicit rejection of modes that would replicate unmatched
small-side rows across salts."""

from __future__ import annotations

import pytest

from nyc_taxi_data_pipeline_elt_spark.operators.skew import salted_join


def _frames(spark):
    big = spark.createDataFrame(
        [("k1", i) for i in range(50)] + [("k2", i) for i in range(5)] + [("k3", 0)],
        "key string, v int",
    )
    # small side has a key the big side lacks ("k9") and misses "k3"
    small = spark.createDataFrame(
        [("k1", "x"), ("k2", "y"), ("k9", "z")], "key string, tag string"
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_matches_unsalted(spark, how):
    big, small = _frames(spark)
    got = sorted(map(tuple, salted_join(big, small, "key", factor=4, how=how).collect()))
    want = sorted(map(tuple, big.join(small, "key", how).collect()))
    assert got == want


@pytest.mark.parametrize("how", ["right", "full", "outer", "right_outer", "cross"])
def test_outer_modes_rejected(spark, how):
    big, small = _frames(spark)
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(big, small, "key", factor=4, how=how)
