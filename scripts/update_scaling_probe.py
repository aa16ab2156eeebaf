"""SCALING.md probe for SnapshotTable.update (VERDICT r9 task #6): at
each given SF dir, build an orders snapshot table range-partitioned on
o_totalprice (tight per-file envelopes), then time

- ``disjoint``: UPDATE with a predicate every file's envelope excludes
  (``o_totalprice < 0``) — the contract is METADATA-ONLY: zero read
  tasks, zero rewrites, one manifest write, so the cost must be ~flat
  across a data decade (O(1) data);
- ``band``: UPDATE of a narrow price band (SET price + priority) —
  copy-on-write of only the files whose envelope intersects it, so the
  cost tracks O(touched files), not O(table). Also reports
  touched/total file counts from the manifest diff.

Table construction is untimed. Each timed update runs against a fresh
table state (updates mutate); min of SCALING_REPEATS (default 2)
rebuild+update rounds per bound, matching the scaling_probe protocol
(fresh JVM, warm worker pool, idle host — cite conditions with any
quoted number).

Usage: python scripts/update_scaling_probe.py <sf_dir> [<sf_dir> ...]
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
from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

BAND = "o_totalprice BETWEEN 100000 AND 110000"
DISJOINT = "o_totalprice < 0"
SET_BAND = {
    "o_totalprice": "o_totalprice + 50000.0",
    "o_orderpriority": "'1-URGENT'",
}
SET_DISJOINT = {"o_totalprice": "0.0"}
FILES = 16


def main() -> None:
    sf_dirs = sys.argv[1:]
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    spark = get_spark("update-scaling-probe", cpus=32)
    # untimed warmup: worker pool + codegen path
    spark.range(1024).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()
    out: dict = {}
    for sf_dir in sf_dirs:
        orders = load_table(spark, sf_dir, "orders").repartitionByRange(
            FILES, "o_totalprice"
        )
        times: dict = {"disjoint": [], "band": []}
        touched = total = None
        for _ in range(repeats):
            root = tempfile.mkdtemp(prefix="ntx-updprobe-")
            try:
                table = SnapshotTable(root + "/tbl")
                table.append(orders)  # untimed construction
                before = table.snapshot()
                t0 = time.perf_counter()
                table.update(spark, DISJOINT, SET_DISJOINT)
                times["disjoint"].append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                snap = table.update(spark, BAND, SET_BAND)
                times["band"].append(time.perf_counter() - t0)
                total = len(before.files)
                touched = total - len(
                    set(snap.files) & set(before.files)
                )
            finally:
                shutil.rmtree(root, ignore_errors=True)
        out[sf_dir] = {
            "disjoint_s": round(min(times["disjoint"]), 2),
            "band_s": round(min(times["band"]), 2),
            "files_touched": touched,
            "files_total": total,
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
