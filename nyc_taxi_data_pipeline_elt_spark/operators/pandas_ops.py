"""Grouped-map custom operators (the ``applyInPandas`` fallback path).

Preference order for operators Spark lacks (README / pyspark guide):
(1) compose built-in DataFrame ops; (2) Arrow-batched pandas — grouped map
(``applyInPandas``) or partition map (``mapInPandas``); (3) mapPartitions.
This module is the (2) exemplar: per-group logic written against a pandas
DataFrame, shipped to executors via Arrow, one shuffle on the group key.

The demo operator assigns training shards within each label group —
deterministic integer output, so it still oracle-checks exactly against a
window-function twin. Real uses at scale: per-group model scoring,
resampling, curve fitting — anything needing imperative per-group code.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def assign_shards(
    embeddings: DataFrame,
    shard_size: int = 16,
    group_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Within each group, order rows by id and pack them into shards of
    ``shard_size`` (shard_idx = rank // shard_size, rank 0-based)."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        out = pdf[[group_col, id_col]].copy()
        out["rank_in_group"] = range(len(pdf))
        out["shard_idx"] = out["rank_in_group"] // shard_size
        return out

    return embeddings.groupBy(group_col).applyInPandas(
        per_group,
        schema=f"{group_col} int, {id_col} bigint, rank_in_group int, shard_idx int",
    )
