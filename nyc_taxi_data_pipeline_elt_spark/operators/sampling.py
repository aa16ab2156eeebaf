"""Deterministic hash-based sampling / dataset splitting.

Training-data pipelines need *reproducible* sampling: the same document
must land in the same split on every run, on any cluster layout, at any
parallelism — so `rand()`-style sampling (seeded per-partition, layout-
dependent) is out. Instead we map a stable key through md5 to a uniform
double in [0, 1) and compare against rates. Properties that matter at
100 TB:

- purely row-local (no shuffle, no state, survives repartitioning);
- engine-portable: md5 is bit-identical across Spark and DuckDB, so the
  oracle replicates the exact sample;
- stratification is just a per-stratum rate expression;
- independent decisions compose by salting the key (`sample-` vs
  `split-` prefixes give independent uniforms from one key).

md5-only hashing per the repo parity rules (xxhash64 differs between
engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^32: the first 8 hex chars of md5 read as an unsigned 32-bit int.
_HASH_SPACE = 4294967296.0


def hash_uniform(key: Column | str, salt: str) -> Column:
    """Uniform double in [0, 1) from md5(salt || key) — deterministic,
    row-local, identical in DuckDB as
    ``('0x' || substr(md5('<salt>' || CAST(key AS VARCHAR)), 1, 8))::BIGINT
    / 4294967296.0``."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10
    ).cast("long")
    return h / F.lit(_HASH_SPACE)


def split_assignment(
    key: Column | str,
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "split-",
) -> Column:
    """train/val/test label from a stable key; fractions are cumulative
    thresholds over one uniform draw."""
    v = hash_uniform(key, salt)
    return (
        F.when(v < train, F.lit("train"))
        .when(v < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def weighted_bottom_k(
    df,
    k: int,
    key_col: str,
    weight_col: str,
    salt: str = "pps-",
    score_col: str = "score",
):
    """Weighted sampling without replacement, probability proportional
    to ``weight_col`` — the Efraimidis–Spirakis exponential-keys scheme
    (A-ExpJ, Inf. Proc. Letters 2006): score = -ln(u) / w with u a
    deterministic md5 uniform; the k SMALLEST scores are the sample.

    Distributed + deterministic: scores are row-local (no state, any
    layout), and bottom-k compiles to TakeOrderedAndProject (per-
    partition heaps, O(k) driver merge) — reservoir semantics without a
    sequential scan. Oracle-replicable: the same formula in SQL draws
    the identical sample (ln ulp drift across engines is absorbed far
    below any realistic score gap).
    """
    u = hash_uniform(key_col, salt)
    score = -F.log(u) / F.col(weight_col)
    return (
        df.withColumn(score_col, score)
        .orderBy(score_col, key_col)
        .limit(k)
    )


def mixture_sample(
    df,
    source_col: str,
    key_col: str,
    target_shares: dict[str, float],
    salt: str = "mix-",
):
    """Corpus mixture sampling: draw the LARGEST sample whose source
    composition matches ``target_shares`` exactly — the data-mixing step
    of LLM corpus prep (e.g. 60% web / 30% code / 10% reference).

    Given per-source counts ``n_s`` and target shares ``p_s``, the
    binding source fixes the total budget ``T = min_s floor(n_s / p_s)``
    and each source keeps its ``k_s = floor(p_s * T)`` lowest-uniform
    rows — per-source bottom-k, so membership is deterministic and
    layout-independent (same md5 uniforms as every other sampler here).

    Physical shape: one tiny groupBy for the counts (driver scalars,
    O(#sources)), then a rank-per-source window — a single shuffle on the
    source key. Sources absent from ``target_shares`` are dropped.
    """
    from pyspark.sql import Window

    counts = {
        r["src"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("src"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    missing = [s for s, p in target_shares.items() if p > 0 and s not in counts]
    if missing:
        # A requested source with zero rows cannot contribute its share;
        # silently returning an empty sample (budget 0) hides the data
        # problem, and the SQL twin (counts INNER JOIN shares) would
        # silently drop the source instead — fail loudly over either.
        raise ValueError(
            f"mixture_sample: sources {missing!r} in target_shares have no "
            f"rows in {source_col!r}"
        )
    budget = min(
        int(counts[s] / p) for s, p in target_shares.items() if p > 0
    )
    quotas = {s: int(p * budget) for s, p in target_shares.items()}
    quota_col = F.create_map(
        *[F.lit(x) for kv in quotas.items() for x in kv]
    )[F.col(source_col)]
    w = Window.partitionBy(source_col).orderBy("_mix_u", key_col)
    return (
        df.filter(F.col(source_col).isin(*target_shares))
        .withColumn("_mix_u", hash_uniform(key_col, salt))
        .withColumn("_mix_rank", F.row_number().over(w))
        .filter(F.col("_mix_rank") <= quota_col)
        .drop("_mix_u", "_mix_rank")
    )


def bottom_k_sample(
    df, k: int, key_col: str, salt: str = "bottomk-", u_col: str = "u"
):
    """Deterministic fixed-SIZE sample: the k rows with the smallest
    salted-hash uniforms — the distributed, layout-independent stand-in
    for reservoir sampling (a sequential algorithm that cannot be
    deterministic under Spark's parallel, unordered scan).

    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject: each
    partition keeps a k-element heap and the driver merges — no global
    sort, no shuffle of non-survivors, O(k) driver memory. The uniform is
    h / 2^32 with h the first 8 md5 hex digits: division by a power of
    two is exact in binary, so the emitted double is bit-identical in
    DuckDB.
    """
    u = hash_uniform(key_col, salt)
    return (
        df.withColumn(u_col, u)
        .orderBy(u_col, key_col)
        .limit(k)
    )


def stratified_split_hamilton(
    df,
    strata_col: str,
    key_col: str,
    val_pct: int = 10,
    test_pct: int = 10,
    salt: str = "strat-",
):
    """Stratified train/val/test split with EXACT proportional allocation
    (Hamilton / largest-remainder apportionment, the census-seat method).

    ``doc_sample_split`` draws each row's split independently, so a small
    stratum's realized val share can be far from 10%. Here the val and
    test budgets are fixed corpus-wide (``floor(n_total * pct / 100)``)
    and apportioned to strata by largest remainder: every stratum gets
    ``floor(n_s * V / n_total)`` seats, and the leftover seats go to the
    largest fractional remainders (ties: stratum ascending). Within a
    stratum, membership is the bottom ranks of the salted md5 uniform —
    deterministic and layout-independent like every sampler here.

    All apportionment arithmetic is integer (remainders compared as
    ``n_s*V - base_s*n_total``), so the allocation is engine-exact. The
    plan: one O(#strata) count aggregate, two single-partition windows
    over that metadata frame (pmod partition key, see
    ``operators/indexing.py``), the allocation broadcast back, and ONE
    per-stratum rank window over the data — no global sort.

    Caveat: val and test are apportioned independently, so a stratum
    smaller than its combined allocation (possible only when
    ``n_s < 2`` at the default rates, since each allocation is within
    one of proportional) assigns its rows to val first and leaves the
    test budget short by the difference — the deterministic analogue of
    an unsatisfiable quota, surfaced by count checks downstream rather
    than silently rebalanced across strata.
    """
    from pyspark.sql import Window

    # O(#strata) rows, but its lineage is a full-corpus aggregate — and
    # FOUR consumers reference it (val/test allocation branches x
    # counts/total). Persisting pins the corpus scan to once.
    counts = (
        df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count("*").alias("n_s"))
        .persist()
    )
    tot = counts.agg(F.sum("n_s").alias("n_total"))
    c = counts.crossJoin(F.broadcast(tot))

    meta_w = Window.partitionBy(F.pmod(F.col("n_s"), F.lit(1)))

    def _alloc(pct: int, name: str):
        # `div` is integer division on longs — no double quotient whose
        # rounding could cross an integer boundary at extreme counts.
        v = F.expr(f"n_total * {pct} div 100")
        base = F.expr(f"(n_s * (n_total * {pct} div 100)) div n_total")
        rem = F.col("n_s") * v - base * F.col("n_total")
        alloc = c.select(
            "s",
            "n_s",
            "n_total",
            v.alias("__v"),
            base.alias(f"__base_{name}"),
            rem.alias("__rem"),
        )
        leftover = F.col("__v") - F.sum(f"__base_{name}").over(meta_w)
        rk = F.row_number().over(
            meta_w.orderBy(F.col("__rem").desc(), F.col("s"))
        )
        return alloc.select(
            "s",
            "n_s",
            "n_total",
            (
                F.col(f"__base_{name}")
                + (rk <= leftover).cast("long")
            ).alias(f"alloc_{name}"),
        )

    a_val = _alloc(val_pct, "val")
    a_test = _alloc(test_pct, "test").select(
        F.col("s").alias("s2"), "alloc_test"
    )
    # Null-safe equality throughout: a NULL stratum is a real stratum —
    # groupBy counted it and Hamilton allocated it seats, so the
    # broadcast join back to the data (and the val/test allocation
    # merge) must match it, not silently drop its rows and
    # under-deliver the corpus-wide val/test budgets.
    alloc = a_val.join(a_test, F.col("s").eqNullSafe(F.col("s2"))).select(
        "s", "alloc_val", "alloc_test"
    )

    w = Window.partitionBy(strata_col).orderBy("__u", key_col)
    return (
        df.withColumn("__u", hash_uniform(key_col, salt))
        .join(
            F.broadcast(alloc), F.col(strata_col).eqNullSafe(F.col("s"))
        )
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "split",
            F.when(F.col("__rn") <= F.col("alloc_val"), F.lit("val"))
            .when(
                F.col("__rn") <= F.col("alloc_val") + F.col("alloc_test"),
                F.lit("test"),
            )
            .otherwise(F.lit("train")),
        )
        .drop("__u", "__rn", "s", "alloc_val", "alloc_test")
    )
