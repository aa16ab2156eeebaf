"""Upsert / MERGE-INTO emulation over immutable parquet.

The reference's consumer layer is Delta, but it uses no Delta feature
beyond partitioned overwrite (SURVEY.md §7.5); for row-level upserts
(CDC, SCD-ish corrections) without a Delta/Iceberg runtime the classic
emulation is::

    merged = updates UNION ALL (base ANTI JOIN updates ON key)

— updated rows win, untouched rows pass through. One shuffle (the anti
join on the key); at scale, pair with partition pruning so only affected
partitions are rewritten (dynamic partition overwrite, sinks S6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert(base: DataFrame, updates: DataFrame, key: str | list[str]) -> DataFrame:
    """Apply ``updates`` over ``base`` by ``key`` (updates win; new keys
    are inserted). Schemas must be union-compatible by name."""
    keys = [key] if isinstance(key, str) else list(key)
    untouched = base.join(updates, keys, "left_anti")
    return updates.unionByName(untouched)
