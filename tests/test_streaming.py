"""Streaming semantics beyond oracle parity: watermark state-dropping in
append mode vs complete-mode replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.streaming import windows as W
from tests.conftest import SF_DIR


def test_append_mode_withholds_trailing_windows(spark):
    events = W.stream_events(spark, SF_DIR)
    complete = W.run_to_memory(
        W.tumbling_counts(events), "t_complete", mode="complete"
    )
    events2 = W.stream_events(spark, SF_DIR)
    append = W.run_to_memory(
        W.late_data_tumbling(events2), "t_append", mode="append"
    )
    n_complete = complete.select("window_start").distinct().count()
    n_append = append.select("window_start").distinct().count()
    # windows newer than (max ts - 10 min watermark) stay in state
    assert 0 < n_append < n_complete

    max_emitted = append.agg(F.max("window_start")).collect()[0][0]
    max_complete = complete.agg(F.max("window_start")).collect()[0][0]
    assert max_emitted < max_complete


def test_streaming_dedup_removes_replayed_duplicates(spark):
    """A union of two replays of the same source is a stream with every
    event duplicated; watermarked dropDuplicates must emit each id once."""
    doubled = W.stream_events(spark, SF_DIR).unionByName(
        W.stream_events(spark, SF_DIR)
    )
    out = W.run_to_memory(W.dedup_events(doubled), "dedup_out", mode="append")
    n_batch = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert out.count() == n_batch
    assert out.select("event_id").distinct().count() == n_batch


def test_session_windows_match_batch_sessionization(spark):
    """The streaming session_window operator must agree with the batch
    lag+cumsum sessionization on total session count."""
    from nyc_taxi_data_pipeline_elt_spark.plans.analytics import sessionize_users

    events = W.stream_events(spark, SF_DIR)
    streaming_sessions = W.run_to_memory(
        W.session_counts(events), "s_sessions", mode="complete"
    )
    batch = sessionize_users(spark, SF_DIR)
    n_streaming = streaming_sessions.count()
    n_batch = batch.agg(F.sum("n_sessions")).collect()[0][0]
    assert n_streaming == n_batch


def test_left_join_null_boundary_is_strict(spark, tmp_path):
    """Pins the state-eviction boundary of the stream-stream LEFT OUTER
    join: a click whose match window ends EXACTLY at the final
    watermark must NOT produce a NULL row (Spark evicts strictly — the
    row is still open state when the stream ends); one second past the
    watermark it must. SS_LEFT_JOIN_ORACLE's `click_ts + window < wm`
    comparison encodes exactly this — if Spark's eviction semantics
    ever shift to non-strict, this test (not a fixture accident)
    catches the divergence."""
    import datetime as dt

    from pyspark.sql import functions as F  # noqa: F401

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def run(probe_offset_seconds: int, name: str):
        # probe click at t0 (window bound t0+30min); watermark drivers on
        # both sides at t0 + 90min + offset => final watermark (max - 1h)
        # lands at bound + offset
        late = t0 + dt.timedelta(minutes=90, seconds=probe_offset_seconds)
        rows = [
            (1, 100, "click", t0),
            (2, 101, "click", late),
            (3, 102, "purchase", late),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, ts timestamp"
        )
        d = str(tmp_path / name)
        df.repartition(1).write.parquet(d, mode="overwrite")
        stream = spark.readStream.schema(df.schema).parquet(d)
        out = W.run_to_memory(
            W.click_purchase_left_join(stream), f"wmprobe_{name}", mode="append"
        )
        return sorted(tuple(r) for r in out.collect())

    assert run(0, "exact") == []  # bound == watermark: no emission
    assert run(1, "past") == [(1, 100, None)]  # bound < watermark: NULL row


def test_stateful_funnel_state_survives_restart(spark, tmp_path):
    """Checkpoint-kill-restart proof for the applyInPandasWithState
    funnel (the analog of test_snapshot_stream's exactly-once proof,
    for the STATE side): run 1 delivers view+click, the query stops;
    run 2 restarts from the checkpoint and delivers only the purchase.
    The purchase can set s3 ONLY if s2 was recovered from the state
    store — a fresh state would leave (0, 0, 1)-shaped flags, which the
    assert distinguishes."""
    import datetime as dt

    src = tmp_path / "funnel_src"
    ck = str(tmp_path / "funnel_ck")
    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)

    def write_batch(name, rows):
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string, ts timestamp"
        )
        df.repartition(1).write.parquet(str(src / name))

    def drain():
        stream = spark.readStream.schema(
            "user_id long, event_id long, event_type string, ts timestamp"
        ).parquet(str(src) + "/*")
        out = []
        q = (
            W.stateful_funnel(stream)
            .writeStream.foreachBatch(
                lambda df, _bid: out.extend(
                    (r["user_id"], r["s1"], r["s2"], r["s3"])
                    for r in df.collect()
                )
            )
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # last flags per user (flags are monotone across batches)
        final = {}
        for u, s1, s2, s3 in out:
            final[u] = (s1, s2, s3)
        return final

    write_batch("b1", [
        (1, 1, "view", t0),
        (1, 2, "click", t0 + dt.timedelta(minutes=1)),
        (2, 3, "view", t0),
    ])
    first = drain()
    assert first[1] == (1, 1, 0)
    assert first[2] == (1, 0, 0)

    # second installment: later timestamps, only the missing stages
    write_batch("b2", [
        (1, 4, "purchase", t0 + dt.timedelta(minutes=5)),
        (2, 5, "click", t0 + dt.timedelta(minutes=6)),
    ])
    second = drain()
    # s3=1 for user 1 REQUIRES the recovered s2; s2=1 for user 2
    # REQUIRES the recovered s1
    assert second[1] == (1, 1, 1)
    assert second[2] == (1, 1, 0)


def test_tws_dispatch_matches_batch_aggregate(spark):
    """streaming_user_totals_tws runs the Spark 4 transformWithState
    operator where its protobuf runtime exists and the contract-
    identical applyInPandasWithState twin where it doesn't; either way
    the result must equal the batch GROUP BY. Also pins that the probe
    reflects the actual runtime (a probe that lies would crash the
    registered query at driver time)."""
    from pyspark.sql import functions as F

    from nyc_taxi_data_pipeline_elt_spark.plans.streaming_queries import (
        streaming_user_totals_tws,
    )
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

    probe = W.tws_runtime_available()
    try:
        import google.protobuf.descriptor  # noqa: F401

        assert probe is True
    except ImportError:
        assert probe is False

    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in streaming_user_totals_tws(spark, SF_DIR).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["tv"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .withColumnRenamed("total_value", "tv")
        .collect()
    }
    assert got == want


def test_replay_conf_is_invisible_to_caller_session(spark):
    """run_to_memory sizes state-store partitions on a clone session
    (VERDICT r6 task #8): the caller's shuffle width must never flip to
    STREAM_STATE_PARTITIONS, even mid-replay."""
    import threading
    import time

    default_sp = spark.conf.get("spark.sql.shuffle.partitions")
    assert default_sp != str(W.STREAM_STATE_PARTITIONS), (
        "fixture session must differ from the stream knob for this "
        "test to discriminate"
    )
    result = {}

    def replay():
        events = W.stream_events(spark, SF_DIR)
        result["n"] = W.run_to_memory(
            W.tumbling_counts(events), "conf_probe_tumbling"
        ).count()

    t = threading.Thread(target=replay)
    seen = set()
    t.start()
    while t.is_alive():
        seen.add(spark.conf.get("spark.sql.shuffle.partitions"))
        time.sleep(0.005)
    t.join()
    assert seen == {default_sp}, seen
    assert result["n"] > 0


def test_no_conf_set_outside_tune_and_confscope():
    """The package-wide guard the r6 verdict asked for: session-global
    conf mutation is confined to session.tune() and the confscope clone
    machinery — everything else must scope confs via loop_session."""
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / (
        "nyc_taxi_data_pipeline_elt_spark"
    )
    offenders = []
    for py in pkg.rglob("*.py"):
        if py.name in ("session.py", "confscope.py"):
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if ".conf.set(" in line:
                offenders.append(f"{py.name}:{i}: {line.strip()}")
    assert not offenders, offenders


def _n_data_batches(progresses) -> int:
    return sum(1 for p in progresses if p["numInputRows"] > 0)


def test_funnel_batch_count_independence(spark):
    """stateful_funnel's FINAL per-user flags must not depend on how
    many micro-batches deliver the bounded input (VERDICT r6 task #7):
    a 3-file chronological replay under maxFilesPerTrigger=1 yields one
    row per (user, batch-with-that-user); the per-user max of each flag
    (flags are monotone) must equal the single-batch replay's rows."""
    cutoff = F.lit("2024-01-04").cast("timestamp")
    single = W.run_to_memory(
        W.stateful_funnel(
            W.stream_events(spark, SF_DIR).filter(F.col("ts") < cutoff)
        ),
        "funnel_single",
        mode="append",
    )
    probe = []
    multi = W.run_to_memory(
        W.stateful_funnel(
            W.stream_events_multifile(spark, SF_DIR, n_files=3).filter(
                F.col("ts") < cutoff
            )
        ),
        "funnel_multi",
        mode="append",
        batch_probe=probe,
    )
    assert _n_data_batches(probe) >= 2, "replay did not split into batches"
    final_multi = sorted(
        tuple(r)
        for r in multi.groupBy("user_id")
        .agg(
            F.max("s1").alias("s1"),
            F.max("s2").alias("s2"),
            F.max("s3").alias("s3"),
        )
        .collect()
    )
    final_single = sorted(tuple(r) for r in single.collect())
    assert final_multi == final_single


def test_dedup_within_watermark_batch_count_independence(spark):
    """dropDuplicatesWithinWatermark must collapse the doubled replay
    identically whether the redelivery arrives in one batch or across
    a chronological multi-batch feed (duplicates land inside their
    original's watermark window by construction)."""
    single = W.run_to_memory(
        W.dedup_within_watermark(
            W.stream_events(spark, SF_DIR).unionByName(
                W.stream_events(spark, SF_DIR)
            )
        ),
        "dedup_wm_single",
        mode="append",
    )
    probe = []
    multi = W.run_to_memory(
        W.dedup_within_watermark(
            W.stream_events_multifile(spark, SF_DIR, n_files=3).unionByName(
                W.stream_events_multifile(spark, SF_DIR, n_files=3)
            )
        ),
        "dedup_wm_multi",
        mode="append",
        batch_probe=probe,
    )
    assert _n_data_batches(probe) >= 2, "replay did not split into batches"
    cols = sorted(multi.columns)
    assert sorted(map(tuple, multi.select(*cols).collect())) == sorted(
        map(tuple, single.select(*cols).collect())
    )
