"""Warehouse-ETL query surface: SCD Type 2 history build and CDC
MERGE application — the two row-level maintenance patterns the
reference's Delta consumer layer gestures at (partitioned overwrite,
`/root/reference/src/process_data_glue.py:186-190`) but never
implements. Both are pure DataFrame compositions with exact DuckDB
twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.operators.scd import scd2_intervals
from nyc_taxi_data_pipeline_elt_spark.operators.upsert import upsert
from nyc_taxi_data_pipeline_elt_spark.plans._snapshot_fixtures import (
    cached_fixture,
    ephemeral_root,
    register_prewarmer,
)
from nyc_taxi_data_pipeline_elt_spark.session import tune
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table


def _change_feed_fixture(spark: SparkSession, sf_dir: str):
    """Three-append orders table — snapshot_change_feed's INPUT, built
    once per process and bench-prewarmed (see _snapshot_fixtures)."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    def build(root: str):
        orders = load_table(spark, sf_dir, "orders")
        table = SnapshotTable(root + "/tbl")
        bucket = F.col("o_orderkey") % 3
        for b in range(3):
            table.append(orders.filter(bucket == b))
        return table

    return cached_fixture("snapcdf", sf_dir, build)


def _zorder_fixture(spark: SparkSession, sf_dir: str):
    """orders appended hash-scattered then OPTIMIZE ZORDERed, plus the
    fixture-derived custkey box (its one max() scan is paid at build,
    not in the timed scan — review r9)."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    def build(root: str):
        orders = load_table(spark, sf_dir, "orders")
        mx = orders.agg(F.max("o_custkey")).first()[0]  # O(1) driver scalar
        table = SnapshotTable(root + "/tbl")
        table.append(orders.repartition(8))
        table.optimize(
            spark, zorder_by=["o_custkey", "o_totalprice"], target_files=8
        )
        return table, (mx * 2) // 5, (mx * 3) // 5

    return cached_fixture("snapzorder", sf_dir, build)


def _ttr_fixture(spark: SparkSession, sf_dir: str):
    """Two-commit orders table + recorded mid-commit timestamp + the
    first commit's expected row count; the detail() metadata-vs-actual
    gate runs once at build."""
    import time as _time

    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    def build(root: str):
        orders = load_table(spark, sf_dir, "orders")
        table = SnapshotTable(root + "/tbl")
        n_even = orders.filter(F.col("o_orderkey") % 2 == 0).count()
        table.append(orders.filter(F.col("o_orderkey") % 2 == 0))  # v0
        mid = _time.time()
        table.append(orders.filter(F.col("o_orderkey") % 2 == 1))  # v1
        d = table.detail()
        if d["num_rows"] != orders.count():
            raise AssertionError(
                f"detail() num_rows {d['num_rows']} != table total"
            )
        return table, mid, n_even

    return cached_fixture("snapttr", sf_dir, build)


register_prewarmer("snapshot_change_feed", _change_feed_fixture)
register_prewarmer("snapshot_zorder_pruned_scan", _zorder_fixture)
register_prewarmer("snapshot_time_travel_read", _ttr_fixture)


def scd2_user_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals over each user's event_type stream: one
    row per run of an unchanged type, versioned, with from/to bounds.

    Timestamps are emitted as whole epoch seconds: the fixture's `ts` is
    parquet TIMESTAMP(NANOS), which Spark truncates to µs at scan —
    second-floor values are identical on both engines (parity rule for
    the events table). Ordering ties between equal µs-truncated
    timestamps are broken by event_id on BOTH engines (the oracle orders
    by the µs-truncated ts too, or DuckDB's nano precision would order
    drifted rows differently).
    """
    tune(spark)
    events = load_table(spark, sf_dir, "events")
    iv = scd2_intervals(
        events, key="user_id", attr="event_type", ts_col="ts", tiebreak="event_id"
    )
    return iv.select(
        "user_id",
        "event_type",
        "version",
        F.unix_timestamp("valid_from").alias("valid_from_s"),
        F.unix_timestamp("valid_to").alias("valid_to_s"),
        "is_current",
    )


SCD2_ORACLE = """
WITH e AS (
  SELECT user_id, event_type,
         date_trunc('microseconds', ts) AS ts_us, event_id
  FROM events
), flagged AS (
  SELECT user_id, event_type, ts_us, event_id,
         (row_number() OVER w = 1
          OR event_type IS DISTINCT FROM lag(event_type) OVER w) AS chg
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), points AS (
  SELECT user_id, event_type, ts_us AS valid_from, event_id
  FROM flagged WHERE chg
)
SELECT user_id, event_type,
       CAST(row_number() OVER wk AS INT) AS version,
       CAST(floor(epoch(valid_from)) AS BIGINT) AS valid_from_s,
       CAST(floor(epoch(lead(valid_from) OVER wk)) AS BIGINT) AS valid_to_s,
       (lead(valid_from) OVER wk IS NULL) AS is_current
FROM points
WINDOW wk AS (PARTITION BY user_id ORDER BY valid_from, event_id)
"""


def cdc_orders_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC batch (updates + inserts + deletes) to the orders
    table via the MERGE emulation (`operators/upsert.py`) and emit the
    post-merge per-status footprint as proof.

    The change batch is derived deterministically from the base table
    (update every 97th key, delete every 101st, insert a shifted copy of
    every 203rd) so the oracle can rebuild the identical batch. Price
    arithmetic runs in DECIMAL on both engines: cent-grid values times
    1.1 land exactly on half-cent ties where double rounding diverges
    between engines (the nation_trade_volume lesson) — decimal HALF_UP
    is deterministic and identical.
    """
    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")

    updates = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn(
            "o_totalprice",
            F.round(price_dec * F.lit(1.1).cast("decimal(2,1)"), 2)
            .cast("double"),
        )
    )
    inserts = (
        orders.filter(F.col("o_orderkey") % 203 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(100000000))
        .withColumn("o_orderstatus", F.lit("N"))
    )
    deletes = orders.filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey")

    base = orders.join(deletes, "o_orderkey", "left_anti")
    merged = upsert(base, updates.unionByName(inserts), key="o_orderkey")

    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_orderkey").alias("key_checksum"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


CDC_ORACLE = """
WITH updates AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE) AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 = 0
), inserts AS (
  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey, 'N' AS o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 203 = 0
), changes AS (
  SELECT * FROM updates UNION ALL SELECT * FROM inserts
), base AS (
  SELECT * FROM orders
  WHERE o_orderkey % 101 <> 0
), merged AS (
  SELECT * FROM changes
  UNION ALL
  SELECT * FROM base b
  WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.o_orderkey = b.o_orderkey)
)
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM merged
GROUP BY o_orderstatus
"""


def cdc_full_sync_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-sync mirror MERGE (VERDICT r11 task #3): apply a complete
    current-state batch to the orders snapshot table with ALL THREE
    Delta clause shapes at once —

    - ``when_matched`` CONDITIONAL (``source.o_totalprice >
      target.o_totalprice``, the CDC update-only-if-newer idiom): the
      deterministic batch bumps even keys x1.5 (passes) and halves odd
      keys x0.5 (fails — target row must stay verbatim);
    - ``when_not_matched='insert'``: shifted keys absent from the
      target enter;
    - ``when_not_matched_by_source='delete'``: every target row the
      batch no longer carries (keys not divisible by 3) is purged —
      after the merge the table IS the reconciled mirror.

    Price arithmetic runs in DECIMAL on both engines (the
    cdc_orders_merge lesson): cent-grid values times 1.5/0.5 stay
    exact, so the matched condition compares identical doubles in
    Spark and DuckDB. The merge drive IS the query, so the table is
    rebuilt per call under an ephemeral root.
    """
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    table = SnapshotTable(ephemeral_root("fullsync") + "/tbl")
    table.append(orders)

    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    mult = (
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(1.5))
        .otherwise(F.lit(0.5))
        .cast("decimal(2,1)")
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_orderstatus", F.lit("S"))
        .withColumn(
            "o_totalprice", F.round(price_dec * mult, 2).cast("double")
        )
    )
    inserts = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(100000000))
        .withColumn("o_orderstatus", F.lit("N"))
    )
    table.merge(
        spark,
        updates.unionByName(inserts),
        ["o_orderkey"],
        when_matched=("update", "source.o_totalprice > target.o_totalprice"),
        when_not_matched="insert",
        when_not_matched_by_source="delete",
    )
    return (
        table.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


CDC_FULL_SYNC_ORACLE = """
WITH upd AS (
  SELECT o_orderkey, o_custkey, 'S' AS o_orderstatus,
         CAST(round(CAST(o_totalprice AS DECIMAL(18,2))
                    * CAST(CASE WHEN o_orderkey % 2 = 0 THEN 1.5 ELSE 0.5 END
                           AS DECIMAL(2,1)), 2) AS DOUBLE) AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 0
), ins AS (
  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 0
), src AS (
  SELECT * FROM upd UNION ALL SELECT * FROM ins
), merged AS (
  -- matched, condition passes: source version replaces the row
  SELECT s.* FROM src s JOIN orders t ON s.o_orderkey = t.o_orderkey
  WHERE s.o_totalprice > t.o_totalprice
  UNION ALL
  -- matched, condition fails: target row kept verbatim
  SELECT t.* FROM orders t JOIN src s ON s.o_orderkey = t.o_orderkey
  WHERE NOT (s.o_totalprice > t.o_totalprice)
  UNION ALL
  -- not matched by target: inserts
  SELECT s.* FROM src s
  WHERE NOT EXISTS (SELECT 1 FROM orders t
                    WHERE t.o_orderkey = s.o_orderkey)
  -- not matched by source: deleted (absent from the mirror)
)
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM merged
GROUP BY o_orderstatus
"""


def cdc_conditional_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed of a per-clause-conditional MERGE plus a
    CONJUNCTIVE retention delete (VERDICT r12 tasks #2/#7): the orders
    mirror takes one merge with all three clause shapes conditional —

    - ``when_matched=('update', 'source.o_totalprice >
      target.o_totalprice')``: the batch bumps even keys x1.5 (passes)
      and halves odd keys x0.5 (fails — no change rows for those);
    - ``when_not_matched='insert'``: shifted keys enter;
    - ``when_not_matched_by_source=('delete', "o_orderdate <
      '1998-01-01' AND o_orderstatus = 'F'")``: a conjunctive
      by-source condition — old FINISHED rows absent from the batch
      are purged, everything else absent is KEPT;

    then ``DELETE WHERE o_orderdate >= '1999-06-01' AND o_orderstatus
    = 'O'`` — the multi-tenant-shaped retention purge the r13
    conjunctive stats prover grammar exists for (at scale, files
    disjoint on EITHER conjunct's envelope are carried verbatim;
    pruning is pinned by tests/test_conjunctive_prover.py and probed
    in SCALING.md). The result is the full CDF aggregated by (commit
    version, change type): update_preimage/postimage exactly for
    condition-PASSING matched pairs, by-source + retention deletes
    replayed with their original row images — the driver-checked
    oracle twin the r12 verdict asked for (task #7).

    The mutation sequence is the query, so the table rebuilds per call
    under an ephemeral root. Price arithmetic in DECIMAL on both
    engines (the cdc_orders_merge lesson)."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    table = SnapshotTable(ephemeral_root("cdccond") + "/tbl")
    table.append(orders)  # v0

    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    mult = (
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(1.5))
        .otherwise(F.lit(0.5))
        .cast("decimal(2,1)")
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_orderstatus", F.lit("S"))
        .withColumn(
            "o_totalprice", F.round(price_dec * mult, 2).cast("double")
        )
    )
    inserts = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(100000000))
        .withColumn("o_orderstatus", F.lit("N"))
    )
    table.merge(
        spark,
        updates.unionByName(inserts),
        ["o_orderkey"],
        when_matched=("update", "source.o_totalprice > target.o_totalprice"),
        when_not_matched="insert",
        when_not_matched_by_source=(
            "delete",
            "o_orderdate < '1998-01-01' AND o_orderstatus = 'F'",
        ),
        change_data=True,
    )  # v1
    table.delete(
        spark, "o_orderdate >= '1999-06-01' AND o_orderstatus = 'O'"
    )  # v2
    return (
        table.read_changes_cdf(spark, since_version=0)
        .groupBy(
            F.col("_commit_version").cast("long").alias("version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


CDC_CONDITIONAL_CDF_ORACLE = """
WITH upd AS (
  SELECT o_orderkey, o_totalprice AS old_price,
         CAST(round(CAST(o_totalprice AS DECIMAL(18,2))
                    * CAST(CASE WHEN o_orderkey % 2 = 0 THEN 1.5 ELSE 0.5 END
                           AS DECIMAL(2,1)), 2) AS DOUBLE) AS new_price
  FROM orders WHERE o_orderkey % 3 = 0
), passing AS (
  SELECT * FROM upd WHERE new_price > old_price
), ins AS (
  SELECT o_orderkey + 100000000 AS o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0
), bs_del AS (
  -- by-source conditional delete: target keys absent from the batch
  -- (o_orderkey % 3 <> 0; shifted insert keys never collide) that
  -- pass the conjunctive condition
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_orderkey % 3 <> 0
    AND o_orderdate < TIMESTAMP '1998-01-01' AND o_orderstatus = 'F'
), v2_del AS (
  -- retention purge over the POST-merge state: status 'O' rows (never
  -- touched by the merge: matched-passing rows became 'S', by-source
  -- deletes required 'F', inserts are 'N') except the
  -- matched-passing keys (o_orderkey % 6 = 0, replaced by 'S' rows)
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_orderstatus = 'O' AND o_orderdate >= TIMESTAMP '1999-06-01'
    AND o_orderkey % 6 <> 0
)
SELECT CAST(1 AS BIGINT) AS version, 'update_preimage' AS change_type,
       count(*) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(sum(CAST(old_price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM passing
UNION ALL
SELECT CAST(1 AS BIGINT), 'update_postimage', count(*),
       CAST(sum(o_orderkey) AS BIGINT),
       CAST(sum(CAST(new_price AS DECIMAL(18,2))) AS DOUBLE)
FROM passing
UNION ALL
SELECT CAST(1 AS BIGINT), 'insert', count(*),
       CAST(sum(o_orderkey) AS BIGINT),
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
FROM ins
UNION ALL
SELECT CAST(1 AS BIGINT), 'delete', count(*),
       CAST(sum(o_orderkey) AS BIGINT),
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
FROM bs_del
UNION ALL
SELECT CAST(2 AS BIGINT), 'delete', count(*),
       CAST(sum(o_orderkey) AS BIGINT),
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
FROM v2_del
"""


def snapshot_partitioned_replace(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partitioned snapshot table + DYNAMIC partition overwrite
    (VERDICT r12 task #3): the reference's consumer layout —
    ``partitionBy(trip_type, trip_year, trip_month)`` over Delta,
    ``/root/reference/src/process_data_glue.py:186-190`` — expressed
    end to end on the snapshot format as ``partition_by=
    (o_orderstatus, o_year, o_month)``, with the reference's
    incremental re-run (recompute one type x month slice, overwrite
    just its partitions) as ONE ``overwrite_partitions`` commit.

    The batch recomputes the ('O', 1998) slice (12 monthly partitions,
    prices x1.1 in DECIMAL); the commit must replace EXACTLY those
    partitions' files — two inline gates assert manifest-recorded
    partition values for every removed file sit in the slice and every
    other partition's files carry verbatim (zero reads at any scale:
    membership is the exact ``__partition__`` record, not an envelope
    proof). The result aggregates the final table by (status, year)
    against the plain SQL merge oracle — proving the replace was both
    exact and lossless. The mutation is the query: rebuilt per call
    under an ephemeral root."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    orders = (
        load_table(spark, sf_dir, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("o_month", F.month("o_orderdate"))
    )
    table = SnapshotTable(
        ephemeral_root("snappart") + "/tbl",
        partition_by=["o_orderstatus", "o_year", "o_month"],
    )
    table.append(orders)
    before = table.snapshot()
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    batch = orders.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_year") == 1998)
    ).withColumn(
        "o_totalprice",
        F.round(price_dec * F.lit(1.1).cast("decimal(2,1)"), 2)
        .cast("double"),
    )
    snap = table.overwrite_partitions(spark, batch)
    kept = set(snap.files)
    for f in before.files:
        pv = (before.stats.get(f) or {}).get("__partition__") or {}
        in_slice = pv.get("o_orderstatus") == "O" and pv.get("o_year") == 1998
        if in_slice and f in kept:
            raise AssertionError(f"replaced-slice file survived: {f}")
        if not in_slice and f not in kept:
            raise AssertionError(f"untouched partition rewritten: {f}")
    return (
        table.read(spark)
        .groupBy("o_orderstatus", "o_year")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


SNAPSHOT_PARTITIONED_REPLACE_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         CAST(year(o_orderdate) AS INT) AS o_year
  FROM orders
), repl AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(CAST(o_totalprice AS DECIMAL(18,2))
                    * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
           AS o_totalprice,
         o_year
  FROM base WHERE o_orderstatus = 'O' AND o_year = 1998
), merged AS (
  SELECT * FROM base WHERE NOT (o_orderstatus = 'O' AND o_year = 1998)
  UNION ALL
  SELECT * FROM repl
)
SELECT o_orderstatus, o_year, count(*) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM merged
GROUP BY o_orderstatus, o_year
"""


def snapshot_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end drive of the snapshot table format
    (``sources/snapshots.py``): orders land in two append commits, the
    table is compacted (new snapshot, no directory swap), and the result
    is read back through the manifest and aggregated. The oracle is the
    plain aggregate over orders — equality proves the commit/compact/read
    protocol is lossless. Protocol-level guarantees (time travel, vacuum,
    idempotent batch replay, commit conflicts) are pytest-verified in
    ``tests/test_snapshots.py``.

    The append/compact protocol drive IS this query's operation, so the
    table is rebuilt per invocation — under a unique per-call root
    (ADVICE r8: the old fixed shared path let concurrent runs clobber
    each other), removed at exit."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    table = SnapshotTable(ephemeral_root("snaproundtrip") + "/tbl")
    table.append(orders.filter(F.col("o_orderkey") % 2 == 0))
    table.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    table.compact(spark, target_files=4)
    return (
        table.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


SNAPSHOT_ROUNDTRIP_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY o_orderstatus
"""


def snapshot_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed drive: orders land in three append commits split
    by order priority; the feed since v0 must return exactly the rows of
    the later two commits — resolved as a manifest file-set difference
    (O(files) metadata, no row diffing), then aggregated. A compaction
    between reads is invisible to the feed.

    The three-append fixture is pure INPUT (the operation this query
    names is the FEED READ), so it is built once per process, reused,
    and registered for bench.py's untimed per-pass prewarm (VERDICT r8:
    construction was being charged to the feed's timing; the fixed
    shared path also clobbered under concurrency)."""
    tune(spark)
    table = _change_feed_fixture(spark, sf_dir)
    return (
        table.read_changes(spark, since_version=0)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_checksum"),
        )
    )


SNAPSHOT_CDF_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
FROM orders
WHERE o_orderkey % 3 IN (1, 2)
GROUP BY o_orderstatus
"""


def snapshot_zorder_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER drive (Delta's layout command over the snapshot
    table format; the reference's Delta tables at
    src/process_data_glue.py:186-190 inherit it from the lakehouse):
    orders land hash-scattered across eight files in one append commit —
    a layout whose per-file (custkey, price) envelopes span the whole
    domain, so manifest-stats skipping prunes nothing (multi-commit
    lineage is snapshot_table_roundtrip's and the change feed's job) —
    then
    ``SnapshotTable.optimize(zorder_by=["o_custkey", "o_totalprice"])``
    rewrites the table along the Z-curve, and the scan goes through the
    ``snapshot_table`` Python Data Source with a 2-D box predicate whose
    pushed conjuncts now prune whole files from manifest metadata alone
    (effectiveness pinned in tests/test_snapshots.py::
    test_optimize_zorder_tightens_envelopes_and_prunes_2d; this query
    proves LOSSLESSNESS — no row lost to a skipped file). The custkey
    box is derived by exact integer arithmetic on max(o_custkey) so the
    slice tracks scale factor identically on both engines.

    The appended-then-z-ordered table is pure INPUT (the operation this
    query names is the PRUNED SCAN), so it is built once per process,
    reused, and registered for bench.py's untimed per-pass prewarm
    (VERDICT r8)."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )

    tune(spark)
    table, lo_ck, hi_ck = _zorder_fixture(spark, sf_dir)
    spark.dataSource.register(SnapshotDataSource)
    scan = spark.read.format("snapshot_table").load(str(table.root))
    return (
        scan.filter(
            (F.col("o_custkey") >= lo_ck)
            & (F.col("o_custkey") <= hi_ck)
            & (F.col("o_totalprice") >= 100000.0)
            & (F.col("o_totalprice") <= 200000.0)
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_checksum"),
        )
    )


SNAPSHOT_ZORDER_ORACLE = """
WITH b AS (
  SELECT (max(o_custkey) * 2) // 5 AS lo, (max(o_custkey) * 3) // 5 AS hi
  FROM orders
)
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
FROM orders, b
WHERE o_custkey BETWEEN b.lo AND b.hi
  AND o_totalprice >= 100000.0 AND o_totalprice <= 200000.0
GROUP BY o_orderstatus
"""


def snapshot_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP AS OF drive (Delta time travel by wall clock, the query
    a lakehouse debugging session starts with): orders land in two
    append commits (even keys, then odd keys); the read resolves a
    timestamp sampled BETWEEN the commits and must see exactly the
    first commit's rows — the newest-snapshot-at-or-before-ts rule over
    real manifest timestamps, driven end to end through
    ``SnapshotTable.snapshot_at_timestamp``. ``detail()`` gates the
    plumbing: the manifest-metadata row count must equal the table's
    actual total, or the query raises (no silent drift).

    The two-commit fixture (with its recorded mid-commit timestamp and
    expected first-commit row count) is pure INPUT — the operation this
    query names is the TIMESTAMP READ — so it is built once per process
    under a unique root, reused, and registered for bench.py's untimed
    per-pass prewarm (ADVICE r8: the old fixed shared path let
    concurrent runs clobber mid-query)."""
    tune(spark)
    table, mid, n_even = _ttr_fixture(spark, sf_dir)
    asof = table.read(spark, timestamp=mid)
    if table.snapshot_at_timestamp(mid).version != 0:
        raise AssertionError("timestamp between commits must resolve v0")
    if asof.count() != n_even:
        raise AssertionError("TIMESTAMP AS OF read saw the wrong snapshot")
    return asof.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum("o_orderkey").alias("key_checksum"),
    )


SNAPSHOT_TTR_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
FROM orders
WHERE o_orderkey % 2 = 0
GROUP BY o_orderstatus
"""


def snapshot_delete_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE drive (``SnapshotTable.delete`` — Delta
    ``DELETE FROM ... WHERE`` parity, VERDICT r8 gap #2): orders land
    range-partitioned on ``o_totalprice`` so the per-file [min, max]
    envelopes are TIGHT along the predicate column, then
    ``DELETE WHERE o_totalprice BETWEEN 100000 AND 200000`` removes the
    price band — the stats pruner carries every provably-disjoint file
    VERBATIM (no read, no rewrite; at 100 TB a band delete touches only
    the band's files) and copy-on-writes just the intersecting ones.
    Two inline gates: a follow-up provably-disjoint delete must be
    METADATA-ONLY (version bumps, file list identical), and the
    insert-only change feed must refuse to cross the row-removing
    commit while ``read_changes_cdf`` replays exactly the removed rows.
    The read-back aggregate must equal the anti-filter over orders —
    lossless copy-on-write.

    DELETE is the operation this query names, so the table is rebuilt
    per invocation under a unique per-call root (every bench pass times
    a real delete against virgin state)."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    table = SnapshotTable(ephemeral_root("snapdelete") + "/tbl")
    table.append(orders.repartitionByRange(8, "o_totalprice"))
    snap = table.delete(spark, "o_totalprice BETWEEN 100000 AND 200000")
    noop = table.delete(spark, "o_totalprice < 0")  # provably disjoint
    if noop.files != snap.files or noop.version != snap.version + 1:
        raise AssertionError("disjoint delete must be metadata-only")
    try:
        table.read_changes(spark, since_version=0)
        raise AssertionError("insert-only feed must refuse a row delete")
    except ValueError:
        pass
    n_removed = (
        table.read_changes_cdf(spark, since_version=0)
        .filter(F.col("_change_type") == "delete")
        .count()
    )
    n_expect = orders.filter(
        "o_totalprice BETWEEN 100000 AND 200000"
    ).count()
    if n_removed != n_expect:
        raise AssertionError(
            f"CDF replayed {n_removed} removals, expected {n_expect}"
        )
    return (
        table.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


SNAPSHOT_DELETE_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE NOT COALESCE(o_totalprice BETWEEN 100000 AND 200000, FALSE)
GROUP BY o_orderstatus
"""


def snapshot_cdf_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE change-data-feed drive (``merge(change_data=True)`` —
    Delta ``enableChangeDataFeed`` for MERGE): the table starts as the
    orders with ``o_orderkey % 3 != 0``; a CDC batch of all EVEN-keyed
    orders with doubled prices merges in — even keys not divisible by 3
    are matched (update), even multiples of 3 are new (insert). The
    materialized change rows are read back through
    ``read_changes_cdf`` and aggregated BY CHANGE TYPE: the
    update_preimage checksum must equal the original matched rows, the
    update_postimage and insert checksums the doubled-price batch —
    proving the cdc files capture exactly the merge's row changes.
    MERGE+CDF is the operation; the table rebuilds per invocation under
    a unique exit-cleaned root."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    table = SnapshotTable(ephemeral_root("snapcdfmerge") + "/tbl")
    table.append(orders.filter(F.col("o_orderkey") % 3 != 0))
    source = orders.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    table.merge(spark, source, key_cols=["o_orderkey"], change_data=True)
    return (
        table.read_changes_cdf(spark, since_version=0)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


SNAPSHOT_CDF_MERGE_ORACLE = """
WITH matched AS (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 <> 0
), ins AS (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 = 0
)
SELECT 'update_preimage' AS change_type, count(*) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM matched
UNION ALL
SELECT 'update_postimage', count(*),
       CAST(sum(o_orderkey) AS BIGINT),
       CAST(sum(CAST(o_totalprice * 2 AS DECIMAL(18,2))) AS DOUBLE)
FROM matched
UNION ALL
SELECT 'insert', count(*),
       CAST(sum(o_orderkey) AS BIGINT),
       CAST(sum(CAST(o_totalprice * 2 AS DECIMAL(18,2))) AS DOUBLE)
FROM ins
"""


def snapshot_update_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level UPDATE drive (``SnapshotTable.update`` — VERDICT r9
    task #2, the last Delta row-level op): the orders table is
    range-partitioned on ``o_totalprice`` so per-file [min, max]
    envelopes are TIGHT along the predicate column, then
    ``UPDATE ... SET o_totalprice = o_totalprice + 50000.0,
    o_orderpriority = '1-URGENT' WHERE o_totalprice BETWEEN 100000 AND
    200000`` rewrites only the band's files (at 100 TB a band update
    touches just those files; every provably-disjoint file is carried
    verbatim). Three inline gates: a follow-up provably-disjoint
    update must be METADATA-ONLY (version bumps, file list identical);
    the derived CDF must replay exactly one update_preimage and one
    update_postimage row per matched order; and the read-back
    aggregate must equal the CASE-projection oracle — lossless
    copy-on-write with SQL UPDATE semantics.

    UPDATE is the operation this query names, so the table is rebuilt
    per invocation under a unique per-call root (every bench pass
    times a real update against virgin state)."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    table = SnapshotTable(ephemeral_root("snapupdate") + "/tbl")
    table.append(orders.repartitionByRange(8, "o_totalprice"))
    band = "o_totalprice BETWEEN 100000 AND 200000"
    snap = table.update(
        spark,
        band,
        {
            "o_totalprice": "o_totalprice + 50000.0",
            "o_orderpriority": "'1-URGENT'",
        },
    )
    noop = table.update(spark, "o_totalprice < 0", {"o_totalprice": "0.0"})
    if noop.files != snap.files or noop.version != snap.version + 1:
        raise AssertionError("disjoint update must be metadata-only")
    n_expect = orders.filter(band).count()
    pairs = (
        table.read_changes_cdf(spark, since_version=0)
        .groupBy("_change_type")
        .count()
        .collect()
    )
    counts = {r._change_type: r["count"] for r in pairs}
    if counts != {"update_preimage": n_expect, "update_postimage": n_expect}:
        raise AssertionError(
            f"CDF must pair pre/post per matched row, got {counts}"
        )
    return (
        table.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.sum(F.length("o_orderpriority")).alias("prio_len_sum"),
        )
    )


SNAPSHOT_UPDATE_ORACLE = """
WITH updated AS (
  SELECT o_orderstatus, o_orderkey,
         CASE WHEN COALESCE(o_totalprice BETWEEN 100000 AND 200000, FALSE)
              THEN o_totalprice + 50000.0 ELSE o_totalprice END AS o_totalprice,
         CASE WHEN COALESCE(o_totalprice BETWEEN 100000 AND 200000, FALSE)
              THEN '1-URGENT' ELSE o_orderpriority END AS o_orderpriority
  FROM orders
)
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(sum(length(o_orderpriority)) AS BIGINT) AS prio_len_sum
FROM updated
GROUP BY o_orderstatus
"""


def snapshot_dv_delete_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE drive (deletion vectors — Delta's
    ``delta.enableDeletionVectors``): same price-band delete as
    ``snapshot_delete_rows`` but ``mode='merge-on-read'`` — instead of
    copy-on-writing the band's files, the matching rows' file-absolute
    positions land in a tiny (file, pos) sidecar and every reader
    anti-joins the broadcast dead set. At 100 TB a GDPR-style delete of
    scattered rows writes KILOBYTES instead of rewriting terabytes.
    Inline gates: the data FILE SET must be byte-identical before and
    after the soft delete (zero data writes); the CDF must replay
    exactly the removed rows; a follow-up ``compact`` must materialize
    the deletes away (empty dv map) without changing a single row —
    the returned aggregate is computed over the POST-COMPACT table, so
    the oracle match proves soft-delete -> read -> materialize is
    lossless end to end."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    table = SnapshotTable(ephemeral_root("snapdvdelete") + "/tbl")
    table.append(orders.repartitionByRange(8, "o_totalprice"))
    before = table.snapshot()
    band = "o_totalprice BETWEEN 100000 AND 200000"
    snap = table.delete(spark, band, mode="merge-on-read")
    if set(snap.files) - set(before.files):
        raise AssertionError("merge-on-read delete must write no data file")
    n_removed = (
        table.read_changes_cdf(spark, since_version=0)
        .filter(F.col("_change_type") == "delete")
        .count()
    )
    n_expect = orders.filter(band).count()
    if n_removed != n_expect:
        raise AssertionError(
            f"CDF replayed {n_removed} soft removals, expected {n_expect}"
        )
    compacted = table.compact(spark, target_files=8)
    if compacted.dv:
        raise AssertionError("compact must materialize deletion vectors away")
    return (
        table.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


SNAPSHOT_DV_DELETE_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE NOT COALESCE(o_totalprice BETWEEN 100000 AND 200000, FALSE)
GROUP BY o_orderstatus
"""


def snapshot_clone_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE drive (Delta ``CREATE TABLE ... SHALLOW CLONE``):
    the source orders table takes a merge-on-read band delete (deletion
    vectors carry into the clone), is cloned ZERO-COPY (inline gate: the
    clone's data directory must not exist), and the CLONE alone then
    takes a price UPDATE — the returned aggregate is over the diverged
    clone, while an inline gate pins the source unchanged (its aggregate
    equals the pre-clone read). Proves reference-by-absolute-path reads,
    carried dv correctness across roots, and write isolation — the
    whole clone contract in one oracle-checked query."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    root = ephemeral_root("snapclone")
    src = SnapshotTable(root + "/src")
    src.append(orders.repartitionByRange(8, "o_totalprice"))
    band = "o_totalprice BETWEEN 100000 AND 200000"
    src.delete(spark, band, mode="merge-on-read")
    src_before = src.read(spark).count()
    clone = src.shallow_clone(root + "/clone")
    if (clone.root / "data").exists():
        raise AssertionError("shallow clone must copy zero data files")
    clone.update(
        spark,
        "o_totalprice < 50000",
        {"o_totalprice": "o_totalprice + 10000.0"},
    )
    if src.read(spark).count() != src_before:
        raise AssertionError("clone writes must not touch the source")
    return (
        clone.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("key_checksum"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


SNAPSHOT_CLONE_ORACLE = """
WITH survivors AS (
  SELECT o_orderstatus, o_orderkey,
         CASE WHEN o_totalprice < 50000
              THEN o_totalprice + 10000.0 ELSE o_totalprice END AS o_totalprice
  FROM orders
  WHERE NOT COALESCE(o_totalprice BETWEEN 100000 AND 200000, FALSE)
)
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM survivors
GROUP BY o_orderstatus
"""


def snapshot_optimize_cdf_neutral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-neutral rewrites must be ROW-NEUTRAL in the change feed
    (VERDICT r9 task #5): build a mutating history — two appends, then
    a row-level DELETE of a price band — snapshot the full CDF, run
    ``OPTIMIZE ZORDER BY`` over the whole table (rewrites EVERY file),
    and assert the feed over the same range is byte-identical: the
    optimize commit contributes nothing, replays of the delete still
    read the (immutable, pre-optimize) removed files, and no carried
    row re-surfaces as an insert. Returns the post-optimize feed
    aggregated by (change type, commit version) — deterministic from
    the orders table alone, so the oracle is plain SQL."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    table = SnapshotTable(ephemeral_root("snapoptcdf") + "/tbl")
    key3 = F.col("o_orderkey") % 3
    table.append(orders.filter(key3 == 0))                      # v0
    table.append(orders.filter(key3 == 1))                      # v1
    band = "o_totalprice BETWEEN 100000 AND 200000"
    table.delete(spark, band)                                   # v2
    agg = lambda df: (  # noqa: E731
        df.groupBy(
            F.col("_change_type").alias("change_type"),
            F.col("_commit_version").alias("commit_version"),
        ).agg(
            F.count("*").alias("n_rows"),
            F.sum("o_orderkey").alias("key_checksum"),
        )
    )
    # r14 (guide §2.6 + VERDICT r13 #4): the pre-optimize feed collect
    # and the optimize rewrite are independent jobs — the feed plan pins
    # its version range HERE (read_changes_cdf resolves the manifest
    # chain at construction, before optimize commits v3; manifests and
    # data files are immutable), so the collect runs on a side thread
    # while optimize rewrites. Same sets compared, same assertion.
    import threading

    before_df = agg(table.read_changes_cdf(spark, since_version=-1))
    box: dict = {}

    def _collect_before() -> None:
        try:
            box["rows"] = before_df.collect()
        except BaseException as exc:  # re-raised on the main thread
            box["err"] = exc

    collector = threading.Thread(target=_collect_before, daemon=True)
    collector.start()
    table.optimize(spark, zorder_by=["o_totalprice"], target_files=4)  # v3
    collector.join()
    if "err" in box:
        raise box["err"]
    before = {tuple(r) for r in box["rows"]}
    feed = agg(table.read_changes_cdf(spark, since_version=-1))
    after = {tuple(r) for r in feed.collect()}
    if before != after:
        raise AssertionError(
            "optimize changed the change feed: "
            f"{sorted(before ^ after)}"
        )
    return feed


SNAPSHOT_OPTIMIZE_CDF_ORACLE = """
WITH v0 AS (
  SELECT * FROM orders WHERE o_orderkey % 3 = 0
), v1 AS (
  SELECT * FROM orders WHERE o_orderkey % 3 = 1
), both_v AS (
  SELECT * FROM v0 UNION ALL SELECT * FROM v1
)
SELECT 'insert' AS change_type, 0 AS commit_version,
       count(*) AS n_rows, CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
FROM v0
UNION ALL
SELECT 'insert', 1, count(*), CAST(sum(o_orderkey) AS BIGINT)
FROM v1
UNION ALL
SELECT 'delete', 2, count(*), CAST(sum(o_orderkey) AS BIGINT)
FROM both_v
WHERE COALESCE(o_totalprice BETWEEN 100000 AND 200000, FALSE)
"""


def snapshot_cdf_stream_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CHANGE DATA FEED drive (Delta
    ``readStream.option('readChangeFeed', 'true')`` re-expressed on the
    Python Data Source — ``snapshot_datasource._SnapshotCDFStreamReader``):
    the orders table takes a merge-on-read band DELETE and, under
    ``delta.enableChangeDataFeed``, a copy-on-write price UPDATE
    (materialized cdc files); one ``availableNow`` stream cycle then
    delivers the FULL feed — v0 inserts, frozen-sidecar delete replay,
    cdc pre/post pairs — which a downstream MIRROR rebuilds
    distributed-style: stage every microbatch to parquet, keep each
    key's latest ``_commit_version`` change, drop deletes (one window
    function — no driver-side row loop, the 100 TB-sound way to apply
    a feed). The returned aggregate is over the MIRROR, so the oracle
    match proves stream-plan -> Arrow replay -> apply is lossless end
    to end."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    spark.dataSource.register(SnapshotDataSource)
    orders = load_table(spark, sf_dir, "orders")
    root = ephemeral_root("snapcdfstream")
    table = SnapshotTable(root + "/tbl")
    table.append(orders.repartitionByRange(8, "o_orderkey"))     # v0
    table.set_property("delta.enableChangeDataFeed", "true")     # v1
    band = "o_totalprice BETWEEN 100000 AND 200000"
    table.delete(spark, band, mode="merge-on-read")              # v2
    table.update(                                                # v3: cdc
        spark,
        "o_totalprice < 50000",
        {"o_totalprice": "o_totalprice + 10000.0"},
    )
    stage = root + "/stage"
    # r14 (guide §2.6 + VERDICT r13 #1): the batch-CDF gate count is
    # independent of the stream cycle — its version range pins at
    # construction time (read_changes_cdf resolves the manifest chain
    # here, before any further commit could exist), so the count job
    # overlaps the availableNow cycle on a side thread instead of
    # running serially after it. Same gate, same compared invariant.
    import threading

    batch_feed = table.read_changes_cdf(spark, since_version=-1)
    gate: dict = {}

    def _count_batch_feed() -> None:
        try:
            gate["n"] = batch_feed.count()
        except BaseException as exc:  # re-raised on the main thread
            gate["err"] = exc

    counter = threading.Thread(target=_count_batch_feed, daemon=True)
    counter.start()
    # r14 (guide §4 + VERDICT r13 #1): stage through the JVM parquet
    # FILE SINK, not foreachBatch — the staged rows are identical
    # (append per microbatch either way) but the per-batch Python
    # callback round-trip is gone and the sink commits natively.
    q = (
        spark.readStream.format("snapshot_table")
        .option("readChangeFeed", "true")
        .load(str(table.root))
        .writeStream.format("parquet")
        .option("path", stage)
        .option("checkpointLocation", root + "/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    counter.join()
    if "err" in gate:
        raise gate["err"]
    from pyspark.sql.window import Window

    staged = spark.read.parquet(stage)
    n_feed = staged.count()
    n_batch = gate["n"]
    if n_feed != n_batch:
        raise AssertionError(
            f"stream delivered {n_feed} change rows, batch feed has {n_batch}"
        )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("_commit_version").desc()
    )
    mirror = (
        staged.filter(F.col("_change_type") != "update_preimage")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .filter(F.col("_change_type") != "delete")
    )
    return mirror.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


SNAPSHOT_CDF_STREAM_ORACLE = """
WITH final AS (
  SELECT o_orderstatus,
         CASE WHEN o_totalprice < 50000
              THEN o_totalprice + 10000.0
              ELSE o_totalprice END AS price
  FROM orders
  WHERE NOT COALESCE(o_totalprice BETWEEN 100000 AND 200000, FALSE)
)
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM final
GROUP BY o_orderstatus
"""


def snapshot_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-mapping drive (Delta ``ALTER TABLE RENAME/DROP COLUMN``):
    RENAME is METADATA-ONLY — the physical parquet name never changes;
    the manifest maps {logical: physical}, appends translate at write
    and reads translate back, so at 100 TB a rename costs one manifest
    write, zero data I/O. Inline gates: the file set must be
    byte-identical across the rename; a provably-disjoint DELETE on the
    RENAMED column must stay metadata-only (stats pruning translates
    through the mapping); a post-rename append must land the PHYSICAL
    name on disk. The pipeline then drops a column (tombstoned
    physical), updates through the new name, and returns an aggregate
    over the logical view — the oracle match proves rename -> append ->
    mutate -> read is lossless end to end."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    orders = load_table(spark, sf_dir, "orders")
    table = SnapshotTable(ephemeral_root("snaprename") + "/tbl")
    table.append(orders.repartitionByRange(8, "o_totalprice"))   # v0
    before = set(table.snapshot().files)
    table.rename_column("o_totalprice", "price")                 # v1
    snap = table.snapshot()
    if set(snap.files) != before:
        raise AssertionError("rename must rewrite zero data files")
    if snap.column_mapping != {"price": "o_totalprice"}:
        raise AssertionError(f"bad mapping {snap.column_mapping}")
    # disjoint delete on the RENAMED column: stats pruning must
    # translate logical -> physical and stay metadata-only
    table.delete(spark, "price < 0")                             # v2
    if set(table.snapshot().files) != before:
        raise AssertionError("disjoint delete on renamed column rewrote")
    table.drop_column("o_orderpriority")                         # v3
    if "o_orderpriority" in table.read(spark).columns:
        raise AssertionError("dropped column still visible")
    table.update(                                                # v4
        spark, "price < 50000", {"price": "price + 10000.0"}
    )
    return (
        table.read(spark)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("price").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


SNAPSHOT_RENAME_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(CASE WHEN o_totalprice < 50000
                          THEN o_totalprice + 10000.0
                          ELSE o_totalprice END AS DECIMAL(18,2)))
            AS DOUBLE) AS sum_price
FROM orders
GROUP BY o_orderstatus
"""


def snapshot_mapped_stream_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r11 stream-source drive (Delta parity:
    ``ignoreDeletes`` + streaming a column-mapped table — VERDICT r10
    tasks #3/#4): the orders table takes an append, a METADATA-ONLY
    rename (``o_totalprice`` -> ``price``), a merge-on-read band
    DELETE, and a post-rename append (lands the PHYSICAL name, serves
    the logical one). A FRESH insert-only stream with
    ``ignoreDeletes=true`` then drains in one ``availableNow`` cycle:
    the rename is row-neutral for a stream whose schema is current,
    the DV delete added no file and is skipped as a commit while the
    served files are masked by the RANGE-END deletion vectors (Delta
    parity: the initial snapshot is DV-masked; ignoreDeletes only
    means already-delivered rows are not retracted — a fresh stream
    must not resurrect retired rows), and every served row carries
    LOGICAL column names via the range-end mapping. The returned
    aggregate therefore equals orders MINUS the deleted band slice —
    if the stream served physical names the ``price`` column would
    null-pad and the sum would diverge; if the delete wedged the
    stream nothing would return; if the dv mask were skipped the
    deleted rows would resurface and counts would diverge. At 100 TB
    the plan is O(files added) manifest metadata + one Arrow read per
    file — no row diffing."""
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )
    from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

    tune(spark)
    spark.dataSource.register(SnapshotDataSource)
    orders = load_table(spark, sf_dir, "orders")
    root = ephemeral_root("snapmappedstream")
    table = SnapshotTable(root + "/tbl")
    key2 = F.col("o_orderkey") % 2
    table.append(orders.filter(key2 == 0))                       # v0
    table.rename_column("o_totalprice", "price")                 # v1
    table.delete(                                                # v2: DV
        spark,
        "price BETWEEN 100000 AND 200000",
        mode="merge-on-read",
    )
    table.append(                                                # v3
        orders.filter(key2 == 1).withColumnRenamed(
            "o_totalprice", "price"
        )
    )
    stage = root + "/stage"
    # r14: JVM parquet file sink instead of foreachBatch — identical
    # staged rows, no per-batch Python callback (see the mirror query)
    q = (
        spark.readStream.format("snapshot_table")
        .option("ignoreDeletes", "true")
        .load(str(table.root))
        .writeStream.format("parquet")
        .option("path", stage)
        .option("checkpointLocation", root + "/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.read.parquet(stage)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("price").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


SNAPSHOT_MAPPED_STREAM_ORACLE = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price
FROM orders
WHERE NOT (o_orderkey % 2 = 0
           AND COALESCE(o_totalprice BETWEEN 100000 AND 200000, FALSE))
GROUP BY o_orderstatus
"""


QUERIES = {
    "scd2_user_event_type": scd2_user_event_type,
    "cdc_orders_merge": cdc_orders_merge,
    "cdc_full_sync_merge": cdc_full_sync_merge,
    "cdc_conditional_cdf": cdc_conditional_cdf,
    "snapshot_partitioned_replace": snapshot_partitioned_replace,
    "snapshot_table_roundtrip": snapshot_table_roundtrip,
    "snapshot_change_feed": snapshot_change_feed,
    "snapshot_zorder_pruned_scan": snapshot_zorder_pruned_scan,
    "snapshot_time_travel_read": snapshot_time_travel_read,
    "snapshot_delete_rows": snapshot_delete_rows,
    "snapshot_cdf_updates": snapshot_cdf_updates,
    "snapshot_update_rows": snapshot_update_rows,
    "snapshot_optimize_cdf_neutral": snapshot_optimize_cdf_neutral,
    "snapshot_dv_delete_rows": snapshot_dv_delete_rows,
    "snapshot_clone_divergence": snapshot_clone_divergence,
    "snapshot_cdf_stream_mirror": snapshot_cdf_stream_mirror,
    "snapshot_rename_column": snapshot_rename_column,
    "snapshot_mapped_stream_read": snapshot_mapped_stream_read,
}

ORACLE = {
    "scd2_user_event_type": SCD2_ORACLE,
    "cdc_orders_merge": CDC_ORACLE,
    "cdc_full_sync_merge": CDC_FULL_SYNC_ORACLE,
    "cdc_conditional_cdf": CDC_CONDITIONAL_CDF_ORACLE,
    "snapshot_partitioned_replace": SNAPSHOT_PARTITIONED_REPLACE_ORACLE,
    "snapshot_table_roundtrip": SNAPSHOT_ROUNDTRIP_ORACLE,
    "snapshot_change_feed": SNAPSHOT_CDF_ORACLE,
    "snapshot_zorder_pruned_scan": SNAPSHOT_ZORDER_ORACLE,
    "snapshot_time_travel_read": SNAPSHOT_TTR_ORACLE,
    "snapshot_delete_rows": SNAPSHOT_DELETE_ORACLE,
    "snapshot_cdf_updates": SNAPSHOT_CDF_MERGE_ORACLE,
    "snapshot_update_rows": SNAPSHOT_UPDATE_ORACLE,
    "snapshot_optimize_cdf_neutral": SNAPSHOT_OPTIMIZE_CDF_ORACLE,
    "snapshot_dv_delete_rows": SNAPSHOT_DV_DELETE_ORACLE,
    "snapshot_clone_divergence": SNAPSHOT_CLONE_ORACLE,
    "snapshot_cdf_stream_mirror": SNAPSHOT_CDF_STREAM_ORACLE,
    "snapshot_rename_column": SNAPSHOT_RENAME_ORACLE,
    "snapshot_mapped_stream_read": SNAPSHOT_MAPPED_STREAM_ORACLE,
}
