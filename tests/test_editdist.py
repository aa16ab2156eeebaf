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
