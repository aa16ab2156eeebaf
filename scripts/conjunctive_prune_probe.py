"""SCALING.md probe for the r13 conjunctive (AND) stats-prover grammar
and partitioned-table surface (VERDICT r12 tasks #2/#3): at each given
SF dir, build orders snapshot tables and time

- ``conj_retention``: ``DELETE WHERE o_orderdate < '<cutoff>' AND
  o_orderstatus = 'F'`` on a 16-file date-range layout — the
  multi-tenant retention purge. The status conjunct is inconclusive on
  this layout (every file spans all statuses) but the DATE conjunct
  prunes the retained range: touched-file count must be the date
  band's, flat across the decade. Before r13 this predicate was out of
  grammar and touched EVERY file;
- ``conj_partition_scoped``: the same predicate on a table
  ``partition_by=['o_orderstatus']`` — the partition layout's [v, v]
  envelopes make the STATUS conjunct exact, so only the 'F'
  partition's files are touched at any scale;
- ``dyn_overwrite``: ``overwrite_partitions`` replacing the 'O' slice
  — exact manifest membership, touched == that partition's files,
  zero reads of carried files;
- ``conj_inconclusive`` (contrast): ``o_totalprice > 0 AND
  o_orderstatus = 'F'`` on the date layout — both conjuncts intersect
  every file, so it honestly touches 16/16 (no silent skip).

Construction untimed; min of SCALING_REPEATS (default 2) per bound;
fresh table state per timed run. Cite conditions (passes, load, sf)
next to any quoted number.

Usage: python scripts/conjunctive_prune_probe.py <sf_dir> [<sf_dir> ...]
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

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.session import get_spark
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table
from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import SnapshotTable

FILES = 16


def main() -> None:
    sf_dirs = sys.argv[1:]
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    spark = get_spark("conj-prune-probe", cpus=32)
    spark.range(1024).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()
    out: dict = {}
    for sf_dir in sf_dirs:
        orders = load_table(spark, sf_dir, "orders")
        by_date = orders.repartitionByRange(FILES, "o_orderdate")
        cutoff = orders.agg(
            F.date_add(F.min("o_orderdate"), 365).alias("c")
        ).first()["c"]
        conj = (
            f"o_orderdate < '{cutoff.isoformat()}' "
            "AND o_orderstatus = 'F'"
        )
        times: dict = {
            "conj_retention": [],
            "conj_partition_scoped": [],
            "dyn_overwrite": [],
            "conj_inconclusive": [],
        }
        meta: dict = {}

        def run(tag, fn, base, partition_by=None):
            root = tempfile.mkdtemp(prefix=f"ntx-cprobe-{tag}-")
            try:
                table = SnapshotTable(
                    root + "/tbl", partition_by=partition_by
                )
                table.append(base)  # untimed construction
                before = table.snapshot()
                t0 = time.perf_counter()
                snap = fn(table)
                times[tag].append(time.perf_counter() - t0)
                meta[f"{tag}_files_touched"] = len(before.files) - len(
                    set(snap.files) & set(before.files)
                )
                meta[f"{tag}_files_total"] = len(before.files)
            finally:
                shutil.rmtree(root, ignore_errors=True)

        o_slice = orders.filter(F.col("o_orderstatus") == "O").withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        )
        for _ in range(repeats):
            run(
                "conj_retention",
                lambda t: t.delete(spark, conj),
                by_date,
            )
            run(
                "conj_partition_scoped",
                lambda t: t.delete(spark, conj),
                by_date,
                partition_by=["o_orderstatus"],
            )
            run(
                "dyn_overwrite",
                lambda t: t.overwrite_partitions(spark, o_slice),
                by_date,
                partition_by=["o_orderstatus"],
            )
            run(
                "conj_inconclusive",
                lambda t: t.delete(
                    spark, "o_totalprice > 0 AND o_orderstatus = 'F'"
                ),
                by_date,
            )
        out[sf_dir] = {
            **{f"{k}_s": round(min(v), 2) for k, v in times.items() if v},
            **meta,
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
