"""Tour of the snapshot-committed table format: every lakehouse
capability in one runnable script.

    python examples/snapshot_table_tour.py

Covers: atomic appends, time travel, change data feed, predicate-scoped
replaceWhere (stats-driven copy-on-write), gap-free compaction, vacuum,
exactly-once batch commits, and reading through the Spark 4 Python Data
Source with pushed filters.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from nyc_taxi_data_pipeline_elt_spark.session import get_spark  # noqa: E402
from nyc_taxi_data_pipeline_elt_spark.sources.snapshot_datasource import (  # noqa: E402
    SnapshotDataSource,
)
from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import (  # noqa: E402
    SnapshotTable,
)


def main() -> None:
    spark = get_spark("snapshot-tour", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="snapshot_tour_")
    table = SnapshotTable(f"{root}/trips")

    month = lambda m, lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("trip_id"),
        F.lit(m).alias("trip_month"),
        (F.col("id") % 7).cast("double").alias("total_amount"),
    )

    # 1. atomic appends — one manifest commit per batch
    table.append(month(1, 0, 1000))
    table.append(month(2, 1000, 2000))
    print("versions:", [s.version for s in table.history()])

    # 2. time travel — v0 is still exactly the first append
    print("v0 rows:", table.read(spark, version=0).count(), "(current:",
          table.read(spark).count(), ")")

    # 3. change data feed — only the delta, resolved from manifests
    print("rows added after v0:",
          table.read_changes(spark, since_version=0).count())

    # 4. replaceWhere — re-run month 2 with corrected data; month-1 files
    #    are carried over verbatim thanks to manifest column stats
    table.replace_where(spark, month(2, 5000, 5500), {"trip_month": [2]})
    print("month 2 after replace:",
          table.read(spark).filter("trip_month = 2").count())

    # 5. compaction + vacuum — no reader ever sees a torn directory
    table.compact(spark, target_files=2)
    # grace_seconds=0: this single-process tour has no in-flight writer
    removed = table.vacuum(keep_versions=1, grace_seconds=0.0)
    print("compacted; vacuum removed", len(removed), "files")

    # 6. exactly-once batch commits — a replayed batch id is a no-op
    table.commit_batch(month(3, 9000, 9100), batch_id=42)
    assert table.commit_batch(month(3, 9000, 9100), batch_id=42) is None
    print("after exactly-once commit:", table.read(spark).count())

    # 7. Spark 4 Python Data Source with filter pushdown + file pruning
    spark.dataSource.register(SnapshotDataSource)
    df = spark.read.format("snapshot_table").load(str(table.root))
    pruned = df.filter("trip_month = 3")
    print("via format('snapshot_table'):", pruned.count(), "rows from",
          pruned.rdd.getNumPartitions(), "pruned partition(s)")

    # 8. row-level maintenance — UPDATE, and DELETE in both modes:
    #    copy-on-write (rewrite the touched files) vs merge-on-read
    #    (deletion vectors: soft-delete positions in a tiny sidecar,
    #    materialized away by the next compact)
    table.update(spark, "total_amount >= 6", {"total_amount": "5.0"})
    before_files = set(table.snapshot().files)
    table.delete(spark, "total_amount = 0", mode="merge-on-read")
    assert set(table.snapshot().files) == before_files  # no data rewrite
    print("after soft delete:", table.read(spark).count(), "live rows,",
          table.detail()["num_deletion_vectors"], "deletion vector(s)")
    table.compact(spark, target_files=2)  # materializes the soft deletes
    assert table.snapshot().dv == {}
    print("after compact:", table.read(spark).count(), "rows, dv cleared")


if __name__ == "__main__":
    main()
