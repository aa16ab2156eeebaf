"""Differential test: every queries() entry vs its oracle_sql() in DuckDB.

This is the local replica of the driver's t2 correctness gate — run at
sf0.001 for speed (the driver runs sf0.01).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR
from tests.util_compare import assert_frames_match

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()


def test_every_oracle_key_has_query():
    missing = set(_ORACLE) - set(_QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, oracle):
    fn = _QUERIES[name]
    sdf = fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if name not in _ORACLE:
        # rows-only check, mirroring the driver's weaker path
        assert spark_pdf is not None
        return
    oracle_pdf = oracle.execute(_ORACLE[name]).fetch_df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"report_month", "avg_total_amount"}
