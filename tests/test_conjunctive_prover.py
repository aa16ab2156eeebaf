"""Conjunctive (AND) stats-prover grammar + session-zone guards
(VERDICT r12 task #2, ADVICE r12).

Unit half: the pure splitter/prover functions — no Spark. Integration
half: a conjunctive retention delete on a real ``SnapshotTable`` must
prune provably-disjoint files (metadata-only when every file is
disjoint on ANY conjunct) and still produce exactly the right rows.
"""

from __future__ import annotations

import datetime as dt

import pytest

from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import (
    SnapshotTable,
    _check_proven_by_stats,
    _pred_disjoint_by_stats,
    _probe_key,
    _split_conjunction,
    _stat_key,
    _utc_session,
)


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


# ---------------------------------------------------------------- unit

def test_split_single_relation_passthrough():
    assert _split_conjunction("a > 1") == ["a > 1"]
    assert _split_conjunction("  (a > 1) ") == ["a > 1"]


def test_split_two_and_three_conjuncts():
    assert _split_conjunction("a > 1 AND b < 2") == ["a > 1", "b < 2"]
    assert _split_conjunction("a>1 AND b<2 AND c=3") == [
        "a>1",
        "b<2",
        "c=3",
    ]


def test_split_is_case_insensitive_and_paren_wrapped():
    assert _split_conjunction("(a > 1) and (b < 2)") == [
        "(a > 1)",
        "(b < 2)",
    ]
    assert _split_conjunction("((a > 1 AND b < 2))") == ["a > 1", "b < 2"]


def test_between_keeps_its_and():
    assert _split_conjunction("x BETWEEN 1 AND 2") == ["x BETWEEN 1 AND 2"]
    assert _split_conjunction("x BETWEEN 1 AND 2 AND y = 3") == [
        "x BETWEEN 1 AND 2",
        "y = 3",
    ]


def test_top_level_or_and_not_refused():
    assert _split_conjunction("a > 1 OR b < 2") is None
    assert _split_conjunction("NOT a > 1") is None
    assert _split_conjunction("a = 1 AND b = 2 OR c = 3") is None


def test_nested_or_stays_inside_its_conjunct():
    assert _split_conjunction("(a > 1 OR b < 2) AND c = 3") == [
        "(a > 1 OR b < 2)",
        "c = 3",
    ]


def test_quoted_and_is_not_a_split_point():
    assert _split_conjunction("s = 'x AND y' AND c = 3") == [
        "s = 'x AND y'",
        "c = 3",
    ]


def test_unmodelled_lexemes_refuse_whole_expression():
    """Review r13 pass 5 (reproduced corruption class): constructs
    Spark's SQL lexer understands but the word-splitter does not —
    backslash escapes, double-quoted literals, backticked identifiers,
    comments — must refuse the WHOLE expression (inconclusive), never
    split across them into fake live branches."""
    # backslash-escaped quote: Spark sees ONE string literal
    assert _split_conjunction("c = 'x\\' AND v = 7 AND d = \\'y'") is None
    assert _split_conjunction("c = 'x\\' OR v >= 5 OR d = \\'y'") is None
    # comments: Spark drops them, the splitter must not treat their
    # interior as live operators
    assert _split_conjunction("v = 99 -- OR v >= 5") is None
    assert _split_conjunction("v = 7 -- AND tenant = 'EU'") is None
    assert _split_conjunction("v = 7 /* AND x */ AND w = 1") is None
    # double-quoted literal / backticked identifier
    assert _split_conjunction('c = "a OR v >= 5 OR b"') is None
    assert _split_conjunction("`a OR v >= 5 OR b` = 5") is None
    # ...but the same tokens INSIDE a single-quoted literal are plain
    # text (review pass 6): the expression still splits and the sound
    # conjunct still prunes
    assert _split_conjunction("c = 'n/a -- none' AND v = 7") == [
        "c = 'n/a -- none'",
        "v = 7",
    ]
    assert _split_conjunction("c = 'a \"q\" /* x */ b' AND v = 7") == [
        "c = 'a \"q\" /* x */ b'",
        "v = 7",
    ]
    assert _pred_disjoint_by_stats(
        "c = 'n/a -- none' AND v > 100", _FS
    )
    # and the provers stay inconclusive on all of them
    assert not _check_proven_by_stats("v = 99 -- OR v >= 5", _FS)
    assert not _pred_disjoint_by_stats(
        "v = 7 -- AND tenant = 'US'", _FS
    )
    assert not _check_proven_by_stats('c = "a OR v >= 5 OR b"', _FS)
    assert not _pred_disjoint_by_stats(
        "c = 'x\\' AND v = 7 AND d = \\'y'",
        {"v": [10, 20], "__num_rows__": 3},
    )


def test_pathological_nesting_is_inconclusive_not_crash():
    """~1500 nesting levels previously blew the Python stack out of
    DELETE planning; past _BOOL_DEPTH_MAX the provers now answer
    inconclusive (False) instead."""
    deep = "v = 2"
    for _ in range(1500):
        deep = f"(v = 2 OR ({deep}))"
    assert _pred_disjoint_by_stats(deep, _FS) is False
    assert _check_proven_by_stats(deep, _FS) is False
    # sane nesting still resolves
    shallow = "v = 999"
    for _ in range(5):
        shallow = f"(v = 999 OR ({shallow}))"
    assert _pred_disjoint_by_stats(shallow, _FS) is True


def test_malformed_inputs_refused():
    assert _split_conjunction("a > 1 AND") is None
    assert _split_conjunction("AND a > 1") is None
    assert _split_conjunction("x BETWEEN 1") is None
    assert _split_conjunction("(a > 1 AND b < 2") is None
    assert _split_conjunction("a = 'unclosed AND b = 2") is None
    assert _split_conjunction("") is None


_FS = {
    "ts": ["2023-01-01T00:00:00", "2023-01-31T23:59:59"],
    "tenant": ["EU", "EU"],
    "v": [5, 10],
    "__num_rows__": 4,
}


def test_disjoint_any_conjunct_suffices():
    # the multi-tenant retention purge: time conjunct inconclusive
    # (envelope intersects) but tenant conjunct disjoint -> prune
    assert _pred_disjoint_by_stats("ts < '2023-02-01' AND tenant = 'US'", _FS)
    # time conjunct disjoint, tenant intersects -> prune
    assert _pred_disjoint_by_stats("ts > '2023-02-01' AND tenant = 'EU'", _FS)
    # neither disjoint -> touched
    assert not _pred_disjoint_by_stats(
        "ts < '2023-02-01' AND tenant = 'EU'", _FS
    )


def test_disjoint_sound_with_nested_or_conjunct():
    # the parenthesized OR conjunct recurses through the disjunction
    # prover (r13): v < 0 and v > 100 are BOTH outside [5, 10], so the
    # OR conjunct alone proves the file match-free
    assert _pred_disjoint_by_stats("(v < 0 OR v > 100) AND tenant = 'US'", _FS)
    assert _pred_disjoint_by_stats(
        "(v < 0 OR v > 100) AND tenant = 'EU'", _FS
    )
    # one OR branch may match -> that conjunct is inconclusive; the
    # conjunction still prunes only via the sound tenant conjunct
    assert not _pred_disjoint_by_stats(
        "(v < 0 OR v >= 7) AND tenant = 'EU'", _FS
    )
    assert _pred_disjoint_by_stats(
        "(v < 0 OR v >= 7) AND tenant = 'US'", _FS
    )


def test_disjunction_semantics():
    """r13 OR grammar: disjoint iff EVERY branch is provably
    match-free; CHECK-proven iff ANY branch is provably never-FALSE;
    SQL precedence (a AND b OR c) = ((a AND b) OR c); NOT refused."""
    assert _pred_disjoint_by_stats("tenant = 'US' OR tenant = 'XX'", _FS)
    assert not _pred_disjoint_by_stats("tenant = 'US' OR tenant = 'EU'", _FS)
    # precedence: the AND binds before OR — v>100 AND tenant='EU' is
    # disjoint (v), tenant='US' is disjoint (value) -> whole disjoint
    assert _pred_disjoint_by_stats(
        "v > 100 AND tenant = 'EU' OR tenant = 'US'", _FS
    )
    assert not _pred_disjoint_by_stats(
        "v > 100 AND tenant = 'EU' OR tenant = 'EU'", _FS
    )
    # CHECK: any never-FALSE branch proves
    assert _check_proven_by_stats("v >= 5 OR tenant = 'ZZ'", _FS)
    assert not _check_proven_by_stats("v >= 6 OR v <= 3", _FS)
    # NOT stays refused -> inconclusive both ways
    assert not _pred_disjoint_by_stats("NOT v >= 0", _FS)
    assert not _check_proven_by_stats("NOT v < 0", _FS)
    # BETWEEN composes with OR
    assert _pred_disjoint_by_stats(
        "v BETWEEN 100 AND 200 OR tenant = 'US'", _FS
    )
    assert _check_proven_by_stats(
        "v BETWEEN 5 AND 10 OR tenant = 'ZZ'", _FS
    )


def test_check_proven_needs_all_conjuncts():
    assert _check_proven_by_stats("v >= 5 AND v <= 10", _FS)
    assert _check_proven_by_stats(
        "v BETWEEN 5 AND 10 AND ts >= '2023-01-01'", _FS
    )
    assert not _check_proven_by_stats("v >= 6 AND v <= 10", _FS)
    # string equality proving stays refused per conjunct (writer-
    # truncated parquet bounds)
    assert not _check_proven_by_stats("v >= 5 AND tenant = 'EU'", _FS)


def test_allow_time_false_disables_time_conjuncts_only():
    # non-UTC session (ADVICE r12): time-family pruning is inconclusive,
    # numeric conjuncts still prove/prune
    assert not _pred_disjoint_by_stats(
        "ts > '2023-02-01'", _FS, allow_time=False
    )
    assert _pred_disjoint_by_stats("v > 100", _FS, allow_time=False)
    assert _pred_disjoint_by_stats(
        "ts > '2023-02-01' AND v > 100", _FS, allow_time=False
    )
    assert not _check_proven_by_stats(
        "v BETWEEN 5 AND 10 AND ts >= '2023-01-01'", _FS, allow_time=False
    )


def test_per_conjunct_guards_still_apply():
    # NaN envelope on one conjunct: that conjunct is inconclusive, the
    # conjunction prunes only via the sound conjunct
    fs = {"a": [float("nan"), float("nan")], "v": [5, 10], "__num_rows__": 2}
    assert not _pred_disjoint_by_stats("a > 100 AND v >= 5", fs)
    assert _pred_disjoint_by_stats("a > 100 AND v > 100", fs)


def test_empty_file_trivially_proves_and_excludes():
    fs = {"__num_rows__": 0}
    assert _pred_disjoint_by_stats("a = 1 AND b = 2", fs)
    assert _check_proven_by_stats("a = 1 AND b = 2", fs)


def test_stat_key_dst_unanimity(monkeypatch):
    """A naive probe inside a DST-ambiguous or imaginary OS-local hour
    has no unanimous instant: _probe_key returns None (inconclusive)
    instead of silently picking one reading (ADVICE r12). Forced by
    pinning TZ to a DST zone for the subprocess-free check."""
    import os
    import time as _time

    monkeypatch.setenv("TZ", "America/New_York")
    _time.tzset()
    try:
        # 2023-11-05 01:30 EDT/EST: ambiguous (clocks fall back)
        assert _probe_key(dt.datetime(2023, 11, 5, 1, 30), False) is None
        # 2023-03-12 02:30: nonexistent (clocks spring forward)
        assert _probe_key(dt.datetime(2023, 3, 12, 2, 30), False) is None
        # a plain hour still keys fine
        assert (
            _probe_key(dt.datetime(2023, 6, 1, 12, 0), False)
            == "2023-06-01T16:00:00"
        )
        # NTZ walls are zone-free: never ambiguous
        assert (
            _probe_key(dt.datetime(2023, 11, 5, 1, 30), True)
            == "2023-11-05T01:30:00"
        )
    finally:
        monkeypatch.delenv("TZ", raising=False)
        os.environ.pop("TZ", None)
        _time.tzset()


def test_stat_key_plain_values_unchanged():
    assert _stat_key(5) == 5
    assert _stat_key("x") == "x"
    assert _stat_key(dt.date(2023, 5, 1)) == "2023-05-01"


# -------------------------------------------------------- integration

def _tenanted(spark, rows):
    """rows: (id, tenant, day) with day as 'YYYY-MM-DD'."""
    return spark.createDataFrame(
        [(i, t, dt.date.fromisoformat(d)) for i, t, d in rows],
        "id INT, tenant STRING, d DATE",
    )


def test_utc_session_detects_pin(spark):
    from nyc_taxi_data_pipeline_elt_spark.session import tune

    tune(spark)
    assert _utc_session(spark) is True


def test_conjunctive_retention_delete_is_metadata_only_when_disjoint(
    spark, table, monkeypatch
):
    """ts < cutoff AND tenant = X where every file is disjoint on at
    least one conjunct: zero reads, zero writes, one manifest commit —
    the at-scale contract for the multi-tenant purge."""
    from nyc_taxi_data_pipeline_elt_spark.session import tune

    tune(spark)
    # file A: tenant EU only (disjoint on tenant = 'US')
    table.append(_tenanted(spark, [(1, "EU", "2023-01-05"), (2, "EU", "2023-01-20")]).coalesce(1))
    # file B: tenant US but all AFTER the cutoff (disjoint on d)
    table.append(_tenanted(spark, [(3, "US", "2023-03-01"), (4, "US", "2023-03-15")]).coalesce(1))
    before = table.snapshot()

    def boom(*a, **kw):
        raise AssertionError("disjoint conjunctive delete must not write")

    monkeypatch.setattr(SnapshotTable, "_write_data", boom)
    snap = table.delete(spark, "d < '2023-02-01' AND tenant = 'US'")
    assert snap.version == before.version + 1
    assert snap.files == before.files
    monkeypatch.setattr(
        SnapshotTable, "_write_data", SnapshotTable.__dict__["_write_data"]
    )
    assert table.read(spark).count() == 4


def test_conjunctive_retention_delete_correct_rows(spark, table):
    """The straddling file is scrubbed of exactly the conjunction's
    rows; disjoint files carry verbatim."""
    from nyc_taxi_data_pipeline_elt_spark.session import tune

    tune(spark)
    table.append(_tenanted(spark, [(1, "EU", "2023-01-05"), (2, "EU", "2023-01-20")]).coalesce(1))
    table.append(_tenanted(spark, [(3, "US", "2023-01-10"), (4, "US", "2023-03-15")]).coalesce(1))
    before = table.snapshot()
    eu_files = {
        f for f in before.files if before.stats[f]["tenant"] == ["EU", "EU"]
    }
    assert eu_files, "setup: expected an all-EU file"
    snap = table.delete(spark, "d < '2023-02-01' AND tenant = 'US'")
    # the all-EU file is tenant-disjoint: carried with the same path
    assert eu_files <= set(snap.files)
    assert sorted(r.id for r in table.read(spark).collect()) == [1, 2, 4]


def test_conjunctive_check_constraint_metadata_only(spark, table):
    """Adding a conjunctive CHECK a table's envelopes prove must not
    scan (stats prove ALL conjuncts file-wide)."""
    from nyc_taxi_data_pipeline_elt_spark.session import tune

    tune(spark)
    table.append(
        spark.range(0, 10).selectExpr("id", "id + 100 AS v")
    )
    called = {"n": 0}
    orig = SnapshotTable._constraint_scan_dv

    def spy(self, *a, **kw):
        called["n"] += 1
        return orig(self, *a, **kw)

    SnapshotTable._constraint_scan_dv = spy
    try:
        table.add_check_constraint(
            spark, "bounds", "id >= 0 AND v >= 100 AND v <= 200"
        )
    finally:
        SnapshotTable._constraint_scan_dv = orig
    assert called["n"] == 0, "conjunctive in-bounds CHECK must be metadata-only"
    # and a violating conjunctive constraint is still caught (row scan)
    with pytest.raises(Exception):
        table.add_check_constraint(spark, "bad", "id >= 0 AND v >= 150")


def test_conjunctive_merge_by_source_condition_prunes(spark, table):
    """A by-source clause with a conjunctive condition: files the stats
    prove condition-disjoint on ANY conjunct stay carried."""
    from nyc_taxi_data_pipeline_elt_spark.session import tune

    tune(spark)
    table.append(_tenanted(spark, [(1, "EU", "2023-01-05")]).coalesce(1))
    table.append(_tenanted(spark, [(2, "US", "2023-01-10")]).coalesce(1))
    before = table.snapshot()
    src = _tenanted(spark, [(9, "EU", "2023-06-01")])
    snap = table.merge(
        spark,
        src,
        ["id"],
        when_matched="update",
        when_not_matched="insert",
        when_not_matched_by_source=(
            "delete",
            "d < '2023-02-01' AND tenant = 'US'",
        ),
    )
    # EU file is by-source-condition-disjoint AND key-disjoint: carried
    eu_files = {
        f for f in before.files if before.stats[f]["tenant"] == ["EU", "EU"]
    }
    assert eu_files <= set(snap.files)
    ids = sorted(r.id for r in table.read(spark).collect())
    assert ids == [1, 9]  # US row deleted by the conjunctive condition
