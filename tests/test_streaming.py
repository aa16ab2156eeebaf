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
