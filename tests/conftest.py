"""Shared pytest fixtures: one session-scoped SparkSession + DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest

from nyc_taxi_data_pipeline_elt_spark.session import get_spark
from nyc_taxi_data_pipeline_elt_spark.sources.readers import TESTDATA_TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ntx-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
