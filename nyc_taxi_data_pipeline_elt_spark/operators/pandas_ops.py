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


def _named(pdf: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Pin positional column names on an incoming grouped/cogrouped frame.

    PySpark's cogroup Arrow deserializer intermittently delivers frames
    with positional integer column labels instead of field names
    (observed run-level, PySpark 4.1.2 + pyarrow 16). Column ORDER is the
    projection order and is stable, so renaming positionally is exact —
    and a no-op on healthy frames."""
    if list(pdf.columns) != cols:
        pdf = pdf.set_axis(cols, axis=1)
    return pdf


def assign_shards(
    embeddings: DataFrame,
    shard_size: int = 16,
    group_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Within each group, order rows by id and pack them into shards of
    ``shard_size`` (shard_idx = rank // shard_size, rank 0-based)."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = _named(pdf, [group_col, id_col])
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        out = pdf[[group_col, id_col]].copy()
        out["rank_in_group"] = range(len(pdf))
        out["shard_idx"] = out["rank_in_group"] // shard_size
        return out

    # project to the two consumed columns BEFORE the group shuffle — the
    # embedding arrays would otherwise ride the exchange only to be
    # dropped by the pandas function
    return embeddings.select(group_col, id_col).groupBy(group_col).applyInPandas(
        per_group,
        schema=f"{group_col} int, {id_col} bigint, rank_in_group int, shard_idx int",
    )


def conversion_stats(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Cogrouped-map operator (``cogroup(...).applyInPandas``): align two
    keyed streams per user and compute conversion stats imperatively.
    Both sides shuffle once on the key; each (click-group, purchase-group)
    pair arrives as two pandas frames — the two-table counterpart of
    ``applyInPandas``, for logic that needs BOTH sequences at once.

    Rounding uses floor(x*1e6 + 0.5) — round-half-away-from-zero on the
    nonnegative rate, matching Spark's and DuckDB's ``round`` so the
    oracle hashes identically.

    Timestamps cross the Arrow boundary as epoch-micros longs
    (``unix_micros`` JVM-side): the timestamp converter in PySpark's
    pandas serializer costs ~2s per million rows that int64 transfer
    avoids, and the lag arithmetic is exact either way.
    """
    from pyspark.sql import functions as F

    # Cogroup on a HASH BUCKET of the user key, not the user key itself:
    # per-user groups average a handful of rows, and applyInPandas pays
    # one Python call + one result-frame construction per group (~0.4ms)
    # — per-tiny-group invocation was the entire cost of this operator
    # (measured 6s for ~15k users at sf0.1). Bucketing bounds the Python
    # call count at `buckets` regardless of user cardinality, and the
    # per-user logic runs vectorized (pandas groupby) inside each bucket.
    # Same shuffle volume, same semantics, same oracle.
    buckets = 256
    c = clicks.select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    ).withColumn("bkt", F.pmod(F.hash("user_id"), F.lit(buckets)))
    p = purchases.select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    ).withColumn("bkt", F.pmod(F.hash("user_id"), F.lit(buckets)))

    def per_bucket(cdf: pd.DataFrame, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        cdf = _named(cdf, ["user_id", "ts_us", "bkt"])
        pdf = _named(pdf, ["user_id", "ts_us", "bkt"])
        ca = cdf.groupby("user_id")["ts_us"].agg(["size", "max"])
        pa = pdf.groupby("user_id")["ts_us"].agg(["size", "max"])
        m = ca.join(pa, how="outer", lsuffix="_c", rsuffix="_p")
        n_c = m["size_c"].fillna(0).to_numpy(dtype=np.int64)
        n_p = m["size_p"].fillna(0).to_numpy(dtype=np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            # same float path as the scalar form: python-float division,
            # floor(x*1e6 + 0.5) round-half-away on the nonnegative rate
            rate = np.floor((n_p / n_c) * 1e6 + 0.5) / 1e6
        lag = np.floor((m["max_p"].to_numpy() - m["max_c"].to_numpy()) / 1e6)
        both = (n_c > 0) & (n_p > 0)
        # nullable extension dtypes (Float64/Int64) carry the None cells
        # through Arrow as proper nulls — a plain float64 NaN would reach
        # Spark as NaN, not NULL, and break the oracle hash
        return pd.DataFrame(
            {
                "user_id": m.index.to_numpy(dtype=np.int64),
                "n_clicks": n_c,
                "n_purchases": n_p,
                "conversion_rate": pd.array(
                    np.where(n_c > 0, rate, np.nan), dtype="Float64"
                ),
                "last_click_to_purchase_sec": pd.array(
                    np.where(both, lag, np.nan), dtype="Float64"
                ).astype("Int64"),
            }
        )

    return (
        c.groupBy("bkt")
        .cogroup(p.groupBy("bkt"))
        .applyInPandas(
            per_bucket,
            schema=(
                "user_id bigint, n_clicks bigint, n_purchases bigint, "
                "conversion_rate double, last_click_to_purchase_sec bigint"
            ),
        )
    )
