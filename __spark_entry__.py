"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
maps every implemented operator (SURVEY.md §2 + extensions) to a callable
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` pairs each with ANSI SQL
for the DuckDB differential check. Queries whose key is missing from
``oracle_sql()`` (custom stateful streaming etc.) get a rows-only check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from nyc_taxi_data_pipeline_elt_spark.plans.reference_queries import (
        q1_monthly_revenue,
    )

    return q1_monthly_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from nyc_taxi_data_pipeline_elt_spark.plans import reference_queries

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(reference_queries.QUERIES)
    for mod_name in (
        "analytics",
        "trainingdata",
        "streaming_queries",
        "graph_queries",
        "etl_queries",
        "subqueries",
        "modern_sql",
    ):
        try:
            mod = __import__(
                f"nyc_taxi_data_pipeline_elt_spark.plans.{mod_name}",
                fromlist=["QUERIES"],
            )
        except ImportError:
            continue
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    from nyc_taxi_data_pipeline_elt_spark.plans import reference_queries

    out: dict[str, str] = {}
    out.update(reference_queries.ORACLE)
    for mod_name in (
        "analytics",
        "trainingdata",
        "streaming_queries",
        "graph_queries",
        "etl_queries",
        "subqueries",
        "modern_sql",
    ):
        try:
            mod = __import__(
                f"nyc_taxi_data_pipeline_elt_spark.plans.{mod_name}",
                fromlist=["ORACLE"],
            )
        except ImportError:
            continue
        out.update(mod.ORACLE)
    return out
