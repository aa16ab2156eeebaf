"""Scalar function helpers (SURVEY.md §2.3, F1-F8).

The reference's complete scalar surface is year/month/hour/coalesce/
concat_ws/lpad/round/lit/cast — all JVM built-ins, no UDFs. These helpers
keep the exact label/rounding semantics in one place so Spark plans and
DuckDB oracle SQL stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def report_month_label(year_col: Column | str, month_col: Column | str) -> Column:
    """``"2023-05"``-style label: concat_ws("-", year, lpad(month, 2, "0")).

    Mirrors ``/root/reference/src/reporting_etl_job.py:91``.
    """
    y = F.col(year_col) if isinstance(year_col, str) else year_col
    m = F.col(month_col) if isinstance(month_col, str) else month_col
    return F.concat_ws("-", y.cast("string"), F.lpad(m.cast("string"), 2, "0"))


def money_round(col: Column) -> Column:
    """2-decimal rounding of report metrics (reporting_etl_job.py:92,154).

    Also the float-drift guard for oracle comparison: Spark and DuckDB may
    sum doubles in different orders; rounding collapses the ~1e-9 relative
    difference.
    """
    return F.round(col, 2)


def unified_pickup(tpep: Column | str, lpep: Column | str) -> Column:
    """Yellow/green datetime unification via coalesce
    (process_data_glue.py:49-57; reporting_etl_job.py:140-143)."""
    t = F.col(tpep) if isinstance(tpep, str) else tpep
    l = F.col(lpep) if isinstance(lpep, str) else lpep
    return F.coalesce(t, l)
