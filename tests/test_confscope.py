"""Conf isolation for iterative loops (operators/confscope.py).

The iterative operators (connected components, PageRank, bounded SSSP)
run their rounds under pre-sized shuffle.partitions and AQE-off. Those
confs must be invisible to the caller's session: a concurrent query
planned mid-loop has to see the session defaults, not 4-partition
shuffles with AQE disabled. The loops achieve this with a clone
session; these tests pin the mechanism AND the mid-loop invisibility.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.operators.confscope import (
    loop_session,
    rebind,
)
from nyc_taxi_data_pipeline_elt_spark.operators.dedup import (
    connected_components,
)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_loop_session_isolates_confs(spark):
    base_sp = spark.conf.get("spark.sql.shuffle.partitions")
    base_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    with loop_session(
        spark,
        {"spark.sql.shuffle.partitions": 4, "spark.sql.adaptive.enabled": "false"},
    ) as ls:
        assert ls.conf.get("spark.sql.shuffle.partitions") == "4"
        assert ls.conf.get("spark.sql.adaptive.enabled") == "false"
        # caller session untouched WHILE the scope is open
        assert spark.conf.get("spark.sql.shuffle.partitions") == base_sp
        assert spark.conf.get("spark.sql.adaptive.enabled") == base_aqe
        # runtime-set confs carried over (tune() settings must hold
        # inside the loop, e.g. the parquet nanos handling)
        assert (
            ls.conf.get("spark.sql.legacy.parquet.nanosAsLong")
            == spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == base_sp


def test_rebind_serves_cache_both_ways(spark):
    """The session hop must be plan-level only: a frame persisted and
    materialized on one session scans as InMemoryTableScan on the
    other — the expensive upstream pipeline is never re-evaluated."""
    df = spark.range(0, 1000).withColumn("k", F.col("id") % 7).persist()
    try:
        df.count()
        with loop_session(spark, {"spark.sql.adaptive.enabled": "false"}) as ls:
            hopped = rebind(df, ls, "t_cache")
            assert "InMemoryTableScan" in _executed(hopped)
            agg = hopped.groupBy("k").agg(F.count("*").alias("c")).persist()
            agg.count()
            back = rebind(agg, spark, "t_back")
        assert "InMemoryTableScan" in _executed(back)
        assert back.count() == 7
        agg.unpersist()
    finally:
        df.unpersist()


def test_concurrent_frame_sees_default_confs_mid_loop(spark):
    """Run the connected-components loop (many rounds on a long chain)
    in a background thread while the main thread repeatedly PLANS a
    query on the caller's session: every observed plan must shuffle at
    the session default width, and the session confs must never show
    the loop's values. With session-global conf mutation this fails
    almost immediately (the mid-loop reads observe 4-partition
    shuffles / AQE off)."""
    default_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # chain 0-1-2-...-39: diameter forces the full 20-round budget
    chain = [(i, i + 1) for i in range(39)]
    edges = spark.createDataFrame(chain, "doc_a long, doc_b long")
    result = {}

    def run_cc():
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # non-convergence
            result["labels"] = connected_components(edges).collect()

    t = threading.Thread(target=run_cc)
    probe = spark.range(0, 100).withColumn("g", F.col("id") % 5)
    seen_confs = set()
    widths = set()
    samples = 0
    t.start()
    while t.is_alive():
        seen_confs.add(
            (
                spark.conf.get("spark.sql.shuffle.partitions"),
                spark.conf.get("spark.sql.adaptive.enabled"),
            )
        )
        # executedPlan (post-EnsureRequirements) shows the Exchange and
        # whether the plan was handed to AQE — both conf-sensitive
        plan = (
            probe.groupBy("g")
            .count()
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "AdaptiveSparkPlan" in plan  # AQE not disabled mid-loop
        if "hashpartitioning(g#" in plan:
            widths.add(
                plan.split("hashpartitioning(")[1].split(")")[0].split(", ")[-1]
            )
        samples += 1
        time.sleep(0.01)
    t.join()
    assert samples >= 5, "loop finished before any concurrent sampling"
    assert seen_confs == {(default_sp, "true")}, seen_confs
    assert widths == {default_sp}, widths
    assert len(result["labels"]) == 40


def test_loop_session_does_not_copy_redacted_conf_values(spark):
    """SET redacts secret-like keys (spark.redaction.regex matches
    'password' etc.); loop_session must copy the REAL runtime value to
    the clone, never the '*(redacted)' placeholder (ADVICE r6)."""
    key = "spark.ntx.test.password"
    spark.conf.set(key, "hunter2")
    try:
        # precondition: SET really does redact this key — if Spark ever
        # stops redacting, the guard below is vacuous and this keeps us
        # honest
        [row] = [r for r in spark.sql("SET").collect() if r["key"] == key]
        assert "(redacted)" in row["value"], row["value"]
        with loop_session(spark, {}) as ls:
            assert ls.conf.get(key) == "hunter2"
    finally:
        spark.conf.unset(key)


def test_tune_memoizes_on_session_stamp(spark):
    """tune() on an already-stamped session is one conf.get, not a
    conf.set walk (r13 optimization): the stamp conf survives -> no
    re-pin; clearing the stamp -> the full walk runs and re-stamps.
    The stamp derives from RUNTIME_CONFS' contents, so editing the
    dict invalidates every prior stamp by construction."""
    from nyc_taxi_data_pipeline_elt_spark import session as S

    # the get_spark fixture session is stamped at build
    assert spark.conf.get(S._TUNE_SENTINEL, None) == S._TUNE_STAMP
    probe = "spark.sql.sources.partitionOverwriteMode"
    try:
        spark.conf.set(probe, "static")
        S.tune(spark)  # memoized: must not touch any conf
        assert spark.conf.get(probe) == "static"
        spark.conf.unset(S._TUNE_SENTINEL)
        S.tune(spark)  # stamp gone: full re-pin + re-stamp
        assert spark.conf.get(probe) == S.RUNTIME_CONFS[probe]
        assert spark.conf.get(S._TUNE_SENTINEL) == S._TUNE_STAMP
    finally:
        spark.conf.set(probe, S.RUNTIME_CONFS[probe])
        spark.conf.set(S._TUNE_SENTINEL, S._TUNE_STAMP)


def test_tune_stamp_tracks_runtime_confs_contents():
    from nyc_taxi_data_pipeline_elt_spark import session as S

    before = S._tune_stamp()
    S.RUNTIME_CONFS["spark.ntx.test.extra"] = "1"
    try:
        assert S._tune_stamp() != before
    finally:
        del S.RUNTIME_CONFS["spark.ntx.test.extra"]
    assert S._tune_stamp() == before
