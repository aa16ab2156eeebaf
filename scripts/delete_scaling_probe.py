"""SCALING.md probe for SnapshotTable.delete (VERDICT r8 task #6): at
each given SF dir, build an orders snapshot table range-partitioned on
o_totalprice (tight per-file envelopes), then time

- ``disjoint``: DELETE with a predicate every file's envelope excludes
  (``o_totalprice < 0``) — the contract is METADATA-ONLY: zero read
  tasks, zero rewrites, one manifest write, so the cost must be ~flat
  across a data decade (O(1) data);
- ``band``: DELETE of a narrow price band — copy-on-write of only the
  files whose envelope intersects it, so the cost tracks O(touched
  files), not O(table). Also reports touched/total file counts from the
  manifest diff.

Table construction is untimed. Each timed delete runs against a fresh
table state (deletes mutate); min of SCALING_REPEATS (default 2)
rebuild+delete rounds per bound, matching the scaling_probe protocol
(fresh JVM, warm worker pool, idle host — cite conditions with any
quoted number).

Usage: python scripts/delete_scaling_probe.py <sf_dir> [<sf_dir> ...]
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
# ~0.1% of rows, scattered across EVERY file (orderkey is uncorrelated
# with the o_totalprice range layout): the GDPR shape where
# copy-on-write rewrites the whole table and merge-on-read writes one
# tiny sidecar
SCATTER = "o_orderkey % 1000 = 0"
FILES = 16


def main() -> None:
    sf_dirs = sys.argv[1:]
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    spark = get_spark("delete-scaling-probe", cpus=32)
    # untimed warmup: worker pool + codegen path
    spark.range(1024).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()
    out: dict = {}
    for sf_dir in sf_dirs:
        orders = load_table(spark, sf_dir, "orders").repartitionByRange(
            FILES, "o_totalprice"
        )
        times: dict = {
            "disjoint": [],
            "band": [],
            "scatter_cow": [],
            "mor_band": [],
            "mor_scatter": [],
            "mor_read": [],
        }
        touched = total = None
        for _ in range(repeats):
            root = tempfile.mkdtemp(prefix="ntx-delprobe-")
            try:
                table = SnapshotTable(root + "/tbl")
                table.append(orders)  # untimed construction
                before = table.snapshot()
                t0 = time.perf_counter()
                table.delete(spark, DISJOINT)
                times["disjoint"].append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                snap = table.delete(spark, BAND)
                times["band"].append(time.perf_counter() - t0)
                total = len(before.files)
                touched = total - len(
                    set(snap.files) & set(before.files)
                )
            finally:
                shutil.rmtree(root, ignore_errors=True)
            # scattered copy-on-write: the predicate hits every file,
            # so the COW path rewrites the whole table
            root = tempfile.mkdtemp(prefix="ntx-delprobe-scat-")
            try:
                table = SnapshotTable(root + "/tbl")
                table.append(orders)
                t0 = time.perf_counter()
                s = table.delete(spark, SCATTER)
                times["scatter_cow"].append(time.perf_counter() - t0)
                cow_bytes = sum(
                    (Path(root + "/tbl") / f).stat().st_size for f in s.files
                )
            finally:
                shutil.rmtree(root, ignore_errors=True)
            # merge-on-read twin: fresh table, soft delete of the band
            # AND the scattered predicate (each writes a sidecar, no
            # data rewrite), then a full dv-honoring read to price the
            # read-path amplification
            root = tempfile.mkdtemp(prefix="ntx-delprobe-mor-")
            try:
                table = SnapshotTable(root + "/tbl")
                table.append(orders)
                t0 = time.perf_counter()
                table.delete(spark, BAND, mode="merge-on-read")
                times["mor_band"].append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                s = table.delete(spark, SCATTER, mode="merge-on-read")
                times["mor_scatter"].append(time.perf_counter() - t0)
                mor_bytes = sum(
                    (Path(root + "/tbl") / f).stat().st_size
                    for f in {e[0] for e in s.dv.values()}
                )
                t0 = time.perf_counter()
                table.read(spark).selectExpr(
                    "count(*)", "sum(o_orderkey)"
                ).collect()
                times["mor_read"].append(time.perf_counter() - t0)
            finally:
                shutil.rmtree(root, ignore_errors=True)
        out[sf_dir] = {
            "disjoint_s": round(min(times["disjoint"]), 2),
            "band_s": round(min(times["band"]), 2),
            "scatter_cow_s": round(min(times["scatter_cow"]), 2),
            "mor_band_s": round(min(times["mor_band"]), 2),
            "mor_scatter_s": round(min(times["mor_scatter"]), 2),
            "mor_read_s": round(min(times["mor_read"]), 2),
            "scatter_cow_bytes_written": cow_bytes,
            "mor_scatter_bytes_written": mor_bytes,
            "files_touched": touched,
            "files_total": total,
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
