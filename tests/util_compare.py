"""Local replica of the driver's differential check: row-count + column
names + order-insensitive exact values (mirrors CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import math

import pandas as pd


def _norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        # repr of the exact double — any FP divergence shows up here.
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s, o = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    diffs = [(a, b) for a, b in zip(s, o) if a != b]
    assert not diffs, f"{name}: {len(diffs)} differing rows; first: {diffs[:3]}"
