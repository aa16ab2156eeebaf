"""Skew-resistant join: key salting.

AQE's skew-join splitting (enabled in session.RUNTIME_CONFS) handles most
skew transparently, but only for sort-merge joins and only per shuffle
block. Salting is the explicit fallback when one join key dominates (the
classic hot-key problem at 100 TB): the big side scatters each hot key
into ``factor`` sub-keys; the small side replicates each row ``factor``
times; the join runs on (key, salt) with ``factor``-way better balance.

Results are identical to the unsalted join (the salt is an internal
partitioning detail), so the DuckDB oracle for any salted query is simply
the plain join SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` on ``key`` with ``factor``-way salting.

    The big side's salt is derived deterministically from its whole row
    (xxhash64 of all columns), so repeated runs produce identical
    partition assignment. The small side is replicated via a literal
    explode — its size multiplies by ``factor``; keep it broadcast-sized.

    Only ``inner``, ``left``/``left_outer``, ``left_semi``, and
    ``left_anti`` are accepted: modes that can emit *unmatched
    small-side rows* (right / full outer) would emit ``factor`` copies
    of each such row — one per salt replica — diverging from the
    unsalted join. (Unmatched BIG-side rows are fine: each big row
    exists once, under one salt, and sees every small replica there.)
    """
    allowed = {
        "inner", "left", "left_outer", "left_semi", "leftsemi",
        "left_anti", "leftanti",
    }
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} not supported — unmatched small-side "
            f"rows would be replicated x{factor}; use one of {sorted(allowed)}"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(factor)).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    joined = salted_big.join(salted_small, [key, "_salt"], how)
    return joined.drop("_salt")
