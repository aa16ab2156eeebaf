"""SCD2 interval build: known-answer cases incl. null transitions."""

from __future__ import annotations

import datetime as dt

from nyc_taxi_data_pipeline_elt_spark.operators.scd import scd2_intervals


def _ts(s):
    return dt.datetime(2023, 1, 1) + dt.timedelta(seconds=s)


def test_scd2_known_answer(spark):
    rows = [
        # user 1: a a b b a  -> versions a, b, a
        (1, "a", _ts(0), 1), (1, "a", _ts(10), 2), (1, "b", _ts(20), 3),
        (1, "b", _ts(30), 4), (1, "a", _ts(40), 5),
        # user 2: single event -> one current version
        (2, "x", _ts(5), 6),
        # user 3: null -> null -> y  (null-safe compare: one change at y)
        (3, None, _ts(0), 7), (3, None, _ts(10), 8), (3, "y", _ts(20), 9),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, attr string, ts timestamp, eid int"
    )
    out = scd2_intervals(df, "user_id", "attr", "ts", tiebreak="eid")
    got = {
        (r.user_id, r.version): (r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert got == {
        (1, 1): ("a", _ts(0), _ts(20), False),
        (1, 2): ("b", _ts(20), _ts(40), False),
        (1, 3): ("a", _ts(40), None, True),
        (2, 1): ("x", _ts(5), None, True),
        (3, 1): (None, _ts(0), _ts(20), False),
        (3, 2): ("y", _ts(20), None, True),
    }


def test_scd2_tiebreak_within_same_timestamp(spark):
    rows = [(1, "a", _ts(0), 1), (1, "b", _ts(0), 2), (1, "b", _ts(1), 3)]
    df = spark.createDataFrame(
        rows, "user_id int, attr string, ts timestamp, eid int"
    )
    out = scd2_intervals(df, "user_id", "attr", "ts", tiebreak="eid")
    got = sorted((r.version, r.attr, r.is_current) for r in out.collect())
    assert got == [(1, "a", False), (2, "b", True)]
