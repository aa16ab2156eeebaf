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
  touched/total file counts from the manifest diff;
- ``mor_disjoint`` / ``mor_band`` (VERDICT r10 task #6): the
  merge-on-read twins — the disjoint UPDATE stays metadata-only in
  both modes, and the band UPDATE soft-deletes the matched positions
  and lands ONLY the post-image rows, so its write volume is
  O(matched rows) instead of O(touched files);
  ``mor_band_bytes_written`` prices the dv sidecar + post-image files
  against the COW rewrite.

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
        times: dict = {
            "disjoint": [],
            "band": [],
            "mor_disjoint": [],
            "mor_band": [],
        }
        touched = total = mor_bytes = None
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
            # merge-on-read twin: fresh table, same predicates; the
            # band UPDATE writes O(matched rows) post-image + a dv
            # sidecar instead of rewriting the touched files
            root = tempfile.mkdtemp(prefix="ntx-updprobe-mor-")
            try:
                table = SnapshotTable(root + "/tbl")
                table.append(orders)
                t0 = time.perf_counter()
                table.update(
                    spark, DISJOINT, SET_DISJOINT, mode="merge-on-read"
                )
                times["mor_disjoint"].append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                s = table.update(spark, BAND, SET_BAND, mode="merge-on-read")
                times["mor_band"].append(time.perf_counter() - t0)
                raw = table._raw_manifest(s.version)
                written = set(raw.get("update_added", []))
                written |= {e[0] for e in (s.dv or {}).values()}
                mor_bytes = sum(
                    (Path(root + "/tbl") / f).stat().st_size
                    for f in written
                )
            finally:
                shutil.rmtree(root, ignore_errors=True)
        out[sf_dir] = {
            "disjoint_s": round(min(times["disjoint"]), 2),
            "band_s": round(min(times["band"]), 2),
            "mor_disjoint_s": round(min(times["mor_disjoint"]), 2),
            "mor_band_s": round(min(times["mor_band"]), 2),
            "mor_band_bytes_written": mor_bytes,
            "files_touched": touched,
            "files_total": total,
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
