"""SCALING.md probe for the SHARDED copy-on-write freeze sidecar
(VERDICT r10 task #2): at each given SF dir, build an orders snapshot
table range-partitioned on o_totalprice (16 files), then time a ~50%
scattered COW DELETE (``o_orderkey % 2 = 0`` — uncorrelated with the
layout, so every file is touched and the frozen position set is
O(table)/2). Records the frozen sidecar's file COUNT and BYTES: the
r10 layout funneled this set through ``coalesce(1)`` (one writer task,
one giant object); ``_write_dv(single=False)`` shards it by ``file``,
so writer parallelism tracks touched files and no single object holds
the whole position set. The survivors' correctness is pinned by
pytest (`test_cow_delete_large_fraction_shards_frozen_sidecar`); this
probe prices the write path across a data decade.

Same protocol as the sibling probes: untimed construction, min of
SCALING_REPEATS (default 2) fresh-table rounds, fresh JVM, warm worker
pool, idle host — cite conditions with any quoted number.

Usage: python scripts/cow_sidecar_probe.py <sf_dir> [<sf_dir> ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nyc_taxi_data_pipeline_elt_spark.session import get_spark
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table
from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import (
    SnapshotTable,
    _dv_new_list,
)

HALF = "o_orderkey % 2 = 0"
FILES = 16


def main() -> None:
    sf_dirs = sys.argv[1:]
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    spark = get_spark("cow-sidecar-probe", cpus=32)
    spark.range(1024).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()
    out: dict = {}
    for sf_dir in sf_dirs:
        orders = load_table(spark, sf_dir, "orders").repartitionByRange(
            FILES, "o_totalprice"
        )
        times: list[float] = []
        shard_files = shard_bytes = deleted = None
        for _ in range(repeats):
            root = tempfile.mkdtemp(prefix="ntx-cowshard-")
            try:
                table = SnapshotTable(root + "/tbl")
                table.append(orders)  # untimed construction
                t0 = time.perf_counter()
                table.delete(spark, HALF)
                times.append(time.perf_counter() - t0)
                frozen = _dv_new_list(
                    table._raw_manifest(1).get("dv_new")
                )
                shard_files = len(frozen)
                shard_bytes = sum(
                    (Path(root + "/tbl") / f).stat().st_size
                    for f in frozen
                )
                deleted = (
                    table.read(spark, version=0).count()
                    - table.read(spark).count()
                )
            finally:
                shutil.rmtree(root, ignore_errors=True)
        out[sf_dir] = {
            "half_cow_delete_s": round(min(times), 2),
            "sidecar_files": shard_files,
            "sidecar_bytes": shard_bytes,
            "rows_deleted": deleted,
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
