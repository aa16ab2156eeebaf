"""Partition columns on ``SnapshotTable`` (VERDICT r12 task #3):
declared at creation, one partition tuple per data file with values
recorded in the manifest (``__partition__``), dynamic partition
overwrite (:meth:`overwrite_partitions`), exact partition pruning, and
parity with ``writers.write_partitioned``'s dynamic-overwrite
semantics (the reference's consumer layout,
``/root/reference/src/process_data_glue.py:186-190``).
"""

from __future__ import annotations

import pytest

from nyc_taxi_data_pipeline_elt_spark.session import tune
from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(
        str(tmp_path / "tbl"), partition_by=["trip_type", "trip_year"]
    )


def _trips(spark, rows):
    """rows: (id, trip_type, trip_year, fare)."""
    return spark.createDataFrame(
        rows, "id INT, trip_type STRING, trip_year INT, fare DOUBLE"
    )


BASE = [
    (1, "yellow", 2023, 10.0),
    (2, "yellow", 2024, 20.0),
    (3, "green", 2023, 30.0),
    (4, "green", 2024, 40.0),
]


def test_partition_by_recorded_and_one_tuple_per_file(spark, table):
    tune(spark)
    table.append(_trips(spark, BASE))
    snap = table.snapshot()
    assert snap.partition_by == ("trip_type", "trip_year")
    assert table.detail()["partition_by"] == ["trip_type", "trip_year"]
    seen = set()
    for f in snap.files:
        pv = snap.stats[f].get("__partition__")
        assert pv is not None, f"{f}: no partition record"
        assert set(pv) == {"trip_type", "trip_year"}
        seen.add((pv["trip_type"], pv["trip_year"]))
    assert seen == {
        ("yellow", 2023),
        ("yellow", 2024),
        ("green", 2023),
        ("green", 2024),
    }


def test_partition_columns_stay_in_files(spark, table):
    """Unlike Delta, the columns are kept in the parquet — any reader
    (including one ignorant of partitioning) sees correct rows."""
    tune(spark)
    table.append(_trips(spark, BASE))
    rows = sorted(
        (r.id, r.trip_type, r.trip_year, r.fare)
        for r in table.read(spark).collect()
    )
    assert rows == sorted(BASE)
    # a direct leaf-file read (no table layer at all) also sees them
    snap = table.snapshot()
    f = snap.files[0]
    direct = spark.read.parquet(str(table.root / f))
    assert {"trip_type", "trip_year"} <= set(direct.columns)
    assert not any(c.startswith("__part__") for c in direct.columns)


def test_dynamic_overwrite_replaces_exactly_present_tuples(spark, table):
    tune(spark)
    table.append(_trips(spark, BASE))
    before = table.snapshot()
    snap = table.overwrite_partitions(
        spark, _trips(spark, [(9, "yellow", 2023, 99.0)])
    )
    assert snap.op == "overwrite_partitions"
    rows = sorted((r.id, r.trip_type, r.trip_year) for r in table.read(spark).collect())
    assert rows == [
        (2, "yellow", 2024),
        (3, "green", 2023),
        (4, "green", 2024),
        (9, "yellow", 2023),
    ]
    # untouched partitions carried VERBATIM (same manifest paths)
    assert len(set(before.files) & set(snap.files)) == len(before.files) - 1


def test_dynamic_overwrite_cdf_replays_whole_file_deletes(spark, table):
    tune(spark)
    table.append(_trips(spark, BASE))
    table.overwrite_partitions(
        spark, _trips(spark, [(9, "yellow", 2023, 99.0)])
    )
    ch = sorted(
        (r._change_type, r.id)
        for r in table.read_changes_cdf(spark, since_version=0).collect()
    )
    assert ch == [("delete", 1), ("insert", 9)]


def test_dynamic_overwrite_parity_with_write_partitioned(
    spark, table, tmp_path
):
    """Same input, same replacement batch: the snapshot table's dynamic
    overwrite and the plain-parquet dynamic partitionOverwriteMode
    (``writers.write_partitioned``'s semantics) must agree row-for-row."""
    from nyc_taxi_data_pipeline_elt_spark.sources.writers import (
        write_partitioned,
    )

    tune(spark)
    base = _trips(spark, BASE)
    batch = _trips(spark, [(9, "yellow", 2023, 99.0), (8, "green", 2024, 88.0)])
    table.append(base)
    table.overwrite_partitions(spark, batch)

    plain = str(tmp_path / "plain")
    write_partitioned(base, plain, ["trip_type", "trip_year"])
    write_partitioned(batch, plain, ["trip_type", "trip_year"])

    got = sorted(
        tuple(r) for r in table.read(spark)
        .select("id", "trip_type", "trip_year", "fare").collect()
    )
    want = sorted(
        tuple(r) for r in spark.read.parquet(plain)
        .select("id", "trip_type", "trip_year", "fare")
        .collect()
    )
    assert got == want


def test_null_partition_value_roundtrip(spark, tmp_path):
    tune(spark)
    t = SnapshotTable(str(tmp_path / "t"), partition_by=["k"])
    t.append(
        spark.createDataFrame([(1, None), (2, "a")], "id INT, k STRING")
    )
    snap = t.snapshot()
    vals = sorted(
        str((snap.stats[f].get("__partition__") or {}).get("k"))
        for f in snap.files
    )
    assert vals == ["None", "a"]
    t.overwrite_partitions(
        spark, spark.createDataFrame([(5, None)], "id INT, k STRING")
    )
    rows = sorted(
        ((r.id, r.k) for r in t.read(spark).collect()), key=str
    )
    assert rows == [(2, "a"), (5, None)]


def test_partition_pruned_conjunctive_delete_is_exact(spark, table, monkeypatch):
    """A delete whose conjunctive predicate names the partition columns
    is METADATA-ONLY when every file's [v, v] envelope excludes it —
    the r13 conjunctive prover over the partition layout."""
    tune(spark)
    table.append(_trips(spark, BASE))
    before = table.snapshot()
    orig_write = SnapshotTable._write_data

    def boom(*a, **kw):
        raise AssertionError("disjoint partition delete must not write")

    monkeypatch.setattr(SnapshotTable, "_write_data", boom)
    snap = table.delete(
        spark, "trip_type = 'purple' AND trip_year = 2023"
    )
    assert snap.files == before.files
    monkeypatch.setattr(SnapshotTable, "_write_data", orig_write)
    snap2 = table.delete(spark, "trip_type = 'green' AND trip_year = 2023")
    assert sorted(r.id for r in table.read(spark).collect()) == [1, 2, 4]
    # only the (green, 2023) file was touched
    assert len(set(before.files) & set(snap2.files)) == len(before.files) - 1


def test_declaration_is_immutable_and_validated(spark, table, tmp_path):
    tune(spark)
    table.append(_trips(spark, BASE))
    # reopening without a declaration works (manifest is the record)
    t2 = SnapshotTable(str(table.root))
    assert t2._partition_spec() == ("trip_type", "trip_year")
    # a conflicting declaration is refused
    with pytest.raises(ValueError, match="fixed at creation"):
        SnapshotTable(str(table.root), partition_by=["x"])._partition_spec()
    # rename / drop of a partition column is refused
    with pytest.raises(ValueError, match="partition column"):
        t2.rename_column("trip_type", "tt")
    with pytest.raises(ValueError, match="partition column"):
        t2.drop_column("trip_year")
    # a write missing a partition column is refused
    with pytest.raises(Exception, match="partition"):
        t2.append(spark.createDataFrame([(1, 1.0)], "id INT, fare DOUBLE"))
    # overwrite_partitions on an unpartitioned table is refused
    plain = SnapshotTable(str(tmp_path / "plain"))
    plain.append(spark.range(3))
    with pytest.raises(ValueError, match="partition_by"):
        plain.overwrite_partitions(spark, spark.range(2))


def test_rewrites_preserve_partition_records(spark, table):
    """merge / compact funnel through the partitioned write: output
    files stay one-tuple-per-file with recorded values."""
    tune(spark)
    table.append(_trips(spark, BASE))
    table.merge(
        spark,
        _trips(spark, [(2, "yellow", 2024, 21.0), (7, "red", 2024, 70.0)]),
        ["id"],
    )
    table.compact(spark, target_files=2)
    snap = table.snapshot()
    for f in snap.files:
        pv = snap.stats[f].get("__partition__")
        assert pv is not None and set(pv) == {"trip_type", "trip_year"}
    rows = sorted((r.id, r.fare) for r in table.read(spark).collect())
    assert rows == [(1, 10.0), (2, 21.0), (3, 30.0), (4, 40.0), (7, 70.0)]


def test_shallow_clone_carries_partitioning(spark, table, tmp_path):
    tune(spark)
    table.append(_trips(spark, BASE))
    clone = table.shallow_clone(str(tmp_path / "clone"))
    assert clone.snapshot().partition_by == ("trip_type", "trip_year")
    clone.overwrite_partitions(
        spark, _trips(spark, [(9, "green", 2023, 9.0)])
    )
    assert sorted(r.id for r in clone.read(spark).collect()) == [1, 2, 4, 9]
    # source untouched
    assert sorted(r.id for r in table.read(spark).collect()) == [1, 2, 3, 4]


def test_concurrent_append_into_replaced_partition_aborts_rebase(
    spark, table
):
    """A commit race where the concurrent append lands rows in a
    partition this overwrite replaces must abort (the rows were
    semantically replaced); an append into an untouched partition
    rebases fine."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import (
        CommitConflict,
    )

    tune(spark)
    table.append(_trips(spark, BASE))
    orig = SnapshotTable._commit
    raced = {"done": False}

    def race_once(self, *a, **kw):
        if not raced["done"] and a[1] == "overwrite_partitions":
            raced["done"] = True
            # a concurrent append into the REPLACED partition
            orig_self = SnapshotTable(str(self.root))
            orig_self.append(
                _trips(spark, [(6, "yellow", 2023, 66.0)])
            )
        return orig(self, *a, **kw)

    SnapshotTable._commit = race_once
    try:
        with pytest.raises(CommitConflict):
            table.overwrite_partitions(
                spark, _trips(spark, [(9, "yellow", 2023, 99.0)])
            )
    finally:
        SnapshotTable._commit = orig

    # untouched partition: rebases
    raced["done"] = False

    def race_other(self, *a, **kw):
        if not raced["done"] and a[1] == "overwrite_partitions":
            raced["done"] = True
            SnapshotTable(str(self.root)).append(
                _trips(spark, [(6, "green", 2024, 66.0)])
            )
        return orig(self, *a, **kw)

    SnapshotTable._commit = race_other
    try:
        snap = table.overwrite_partitions(
            spark, _trips(spark, [(9, "yellow", 2024, 99.0)])
        )
    finally:
        SnapshotTable._commit = orig
    # first race: the racer's (6, yellow, 2023) append LANDED, our
    # overwrite aborted (id 2 kept, id 9 never entered); second race:
    # the (6, green, 2024) append landed AND the overwrite of
    # (yellow, 2024) rebased over it — id 2 replaced by id 9
    ids = sorted(r.id for r in table.read(spark).collect())
    assert ids == [1, 3, 4, 6, 6, 9]
    assert snap.op == "overwrite_partitions"
