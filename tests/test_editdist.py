"""PassJoin segment-filter levenshtein join == quadratic levenshtein join.

The candidate filter must be a provable superset of the true pair set;
these tests compare the operator's output against the brute-force
quadratic form on randomized corpora that stress the filter's edge
cases: equal strings, 1..tau-edit mutations (substitute/insert/delete,
which shift alignments), length-band boundaries, and strings shorter
than tau+1 (the pigeonhole blind spot routed to the quadratic branch).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.operators.editdist import (
    levenshtein_join,
)

WORDS = [
    "almond", "antique", "aquamarine", "azure", "beige", "bisque",
    "black", "blanched", "blue", "blush", "brown", "burlywood",
    "burnished", "chartreuse", "chiffon", "chocolate", "coral",
]


def _mutate(rng: random.Random, s: str, n_edits: int) -> str:
    out = list(s)
    for _ in range(n_edits):
        op = rng.choice(["sub", "ins", "del"]) if len(out) > 1 else "ins"
        i = rng.randrange(len(out) + (op == "ins"))
        c = rng.choice("abcdefghij ")
        if op == "sub":
            out[i] = c
        elif op == "ins":
            out.insert(i, c)
        else:
            del out[i]
    return "".join(out)


def _brute(df, tau):
    a = df.select("blk", F.col("k").alias("key_a"), F.col("n").alias("na"))
    b = df.select("blk", F.col("k").alias("key_b"), F.col("n").alias("nb"))
    return (
        a.join(b, "blk")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("na", "nb", tau))
        .filter(F.col("edit_dist") >= 0)
        .select("blk", "key_a", "key_b", "edit_dist")
    )


def _check(spark, rows, tau):
    df = spark.createDataFrame(rows, "blk string, k int, n string")
    got = sorted(
        map(
            tuple,
            levenshtein_join(df, "k", "n", "blk", tau=tau).collect(),
        )
    )
    want = sorted(map(tuple, _brute(df, tau).collect()))
    assert got == want
    return len(want)


def test_mutated_corpus_matches_bruteforce(spark):
    rng = random.Random(42)
    rows = []
    kid = 0
    for blk in ("b0", "b1"):
        seeds = [
            " ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 4)))
            for _ in range(12)
        ]
        for s in seeds:
            for n_edits in (0, 1, 2, 3, 4):
                rows.append((blk, kid, _mutate(rng, s, n_edits)))
                kid += 1
    n_matches = _check(spark, rows, tau=3)
    assert n_matches > 20  # mutations within tau must actually match


def test_short_strings_hit_quadratic_branch(spark):
    rows = [
        ("b", 1, "ab"), ("b", 2, "ac"), ("b", 3, "b"), ("b", 4, ""),
        ("b", 5, "abcd"), ("b", 6, "abce"), ("b", 7, "xyzw"),
        ("b", 8, "a" * 9), ("b", 9, "a" * 9 + "bbb"),
    ]
    _check(spark, rows, tau=3)


def test_tau_one(spark):
    rng = random.Random(7)
    rows = [
        ("b", i, _mutate(rng, "sandy golden lemon", i % 3))
        for i in range(30)
    ]
    _check(spark, rows, tau=1)


def _entropy_corpus(rng: random.Random, n: int, blk: str):
    """High-entropy random strings: verbatim segment collisions ~never."""
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    return [
        (blk, i, "".join(rng.choice(alpha) for _ in range(rng.randint(16, 28))))
        for i in range(n)
    ]


DENSE_WORDS = ["black", "blush", "beige", "brown", "coral", "azure"]


def _dense_corpus(rng: random.Random, n: int, blk: str, start: int = 0):
    """Dense vocabulary (TPC-H part-name shape, sharpened): every word
    is 5 chars, so all strings have the same length, segment boundaries
    align exactly, and verbatim segments collide rampantly."""
    return [
        (blk, start + i, " ".join(rng.choice(DENSE_WORDS) for _ in range(4)))
        for i in range(n)
    ]


def test_dispatch_stats_separate_corpora(spark):
    """The collision-ratio estimate must rank a dense-vocabulary block
    far above a high-entropy block — that ordering is the whole basis
    of the auto dispatch."""
    from nyc_taxi_data_pipeline_elt_spark.operators.editdist import (
        dispatch_stats,
    )

    rng = random.Random(11)
    rows = _dense_corpus(rng, 120, "dense") + _entropy_corpus(
        rng, 120, "entropy"
    )
    df = spark.createDataFrame(rows, "blk string, k int, n string")
    stats = {
        r["blk"]: r
        for r in dispatch_stats(df, "n", "blk", tau=3).collect()
    }
    assert stats["dense"]["collision_ratio"] > 0.1
    assert stats["entropy"]["collision_ratio"] < 0.01
    assert stats["dense"]["n_rows"] == 120


def test_auto_dispatch_routes_and_matches_bruteforce(spark):
    """levenshtein_join_auto: a dense-vocab block routes to the
    quadratic scan, a high-entropy block (above the row cutoff) routes
    to PassJoin — and the combined result equals brute force exactly
    (both branches are exact, so routing is invisible in the output)."""
    from nyc_taxi_data_pipeline_elt_spark.operators.editdist import (
        dispatch_stats,
        levenshtein_join_auto,
    )

    rng = random.Random(23)
    # entropy block with planted near-duplicates so the result is non-trivial
    ent = _entropy_corpus(rng, 150, "entropy")
    planted = [
        ("entropy", 1000 + i, _mutate(rng, ent[i][2], 1 + i % 3))
        for i in range(20)
    ]
    rows = _dense_corpus(rng, 60, "dense") + ent + planted
    df = spark.createDataFrame(rows, "blk string, k int, n string")

    got = sorted(
        map(
            tuple,
            levenshtein_join_auto(
                df, "k", "n", "blk", tau=3,
                min_rows_for_passjoin=100,
            ).collect(),
        )
    )
    want = sorted(map(tuple, _brute(df, 3).collect()))
    assert got == want
    assert len(want) > 10

    stats = {
        r["blk"]: r for r in dispatch_stats(df, "n", "blk", tau=3).collect()
    }
    # the routing predicate used by levenshtein_join_auto
    assert stats["dense"]["collision_ratio"] >= 0.1  # -> quadratic
    assert (
        stats["entropy"]["collision_ratio"] < 0.1
        and stats["entropy"]["n_rows"] >= 100
    )  # -> PassJoin


def test_auto_dispatch_sampled_ratio_stable(spark):
    """The Bernoulli-sampled estimate must land on the same side of the
    threshold as the full computation (the ratio is fraction-invariant
    in expectation)."""
    from nyc_taxi_data_pipeline_elt_spark.operators.editdist import (
        dispatch_stats,
    )

    rng = random.Random(31)
    rows = _dense_corpus(rng, 400, "dense") + _entropy_corpus(
        rng, 400, "entropy"
    )
    df = spark.createDataFrame(rows, "blk string, k int, n string")
    full = {
        r["blk"]: r["collision_ratio"]
        for r in dispatch_stats(df, "n", "blk", tau=3).collect()
    }
    samp = {
        r["blk"]: r["collision_ratio"]
        for r in dispatch_stats(
            df, "n", "blk", tau=3, sample_fraction=0.5
        ).collect()
    }
    assert (full["dense"] > 0.1) == (samp["dense"] > 0.1)
    assert (full["entropy"] < 0.01) == (samp["entropy"] < 0.01)


def test_auto_dispatch_empty_input(spark):
    from nyc_taxi_data_pipeline_elt_spark.operators.editdist import (
        dispatch_stats,
        levenshtein_join_auto,
    )

    empty = spark.createDataFrame([], "blk string, k int, n string")
    assert dispatch_stats(empty, "n", "blk").count() == 0
    assert levenshtein_join_auto(empty, "k", "n", "blk").count() == 0


def test_entity_leaders_star_rule(spark):
    """Greedy-star leader clustering over the dispatcher's pair frame:
    names within distance 1 inside a block share the min key; distinct
    names and cross-block twins stay singletons."""
    from nyc_taxi_data_pipeline_elt_spark.plans.analytics import (
        customer_entity_leaders,
    )

    out = {
        r["c_custkey"]: r["entity_rep"]
        for r in customer_entity_leaders(spark, "/root/testdata/sf0.001").collect()
    }
    # every leader is <= its member and is itself a known key
    assert all(rep <= k and rep in out for k, rep in out.items())
    # at least one non-trivial cluster exists on the fixture
    assert any(rep != k for k, rep in out.items())
