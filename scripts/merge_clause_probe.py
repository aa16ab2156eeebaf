"""SCALING.md probe for the r12 MERGE clause surface (VERDICT r11
task #3) and the time-literal stats grammar: at each given SF dir,
build orders snapshot tables with tight per-file envelopes, then time

- ``matched_cond``: conditional MERGE (``source.o_totalprice >
  target.o_totalprice``) whose source batch touches ONE key band —
  the contract is O(touched files): key-disjoint files carry verbatim,
  so cost must track the touched count, not the table;
- ``bysrc_cond``: the same batch with
  ``when_not_matched_by_source=('update', set, cond)`` where the
  condition is a narrow numeric band — pruning INVERTS (key-disjoint
  files hold only by-source rows) but the condition's stats
  disjointness still carries everything outside the band: cost is
  O(key-touched + condition-touched files);
- ``bysrc_uncond``: ``when_not_matched_by_source='delete'``
  (full-sync mirror) — every file is genuinely touched; the cost
  honestly tracks O(table) and is reported as the contrast line, with
  files_touched == files_total proving no silent skip;
- ``ts_retention_delete``: ``DELETE WHERE o_orderdate <
  '<cutoff ISO>'`` on a date-partitioned table — with the r12
  ISO-envelope stats + quoted-literal prover grammar this is
  METADATA-ONLY off the retained range (files wholly before the
  cutoff rewrite; files wholly after carry verbatim), the classic
  retention purge a 100 TB table runs daily.

Construction untimed; min of SCALING_REPEATS (default 2) per bound;
fresh table state per timed run. Cite conditions (passes, load, sf)
next to any quoted number.

Usage: python scripts/merge_clause_probe.py <sf_dir> [<sf_dir> ...]
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
    spark = get_spark("merge-clause-probe", cpus=32)
    spark.range(1024).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()
    out: dict = {}
    for sf_dir in sf_dirs:
        orders = load_table(spark, sf_dir, "orders")
        by_key = orders.repartitionByRange(FILES, "o_orderkey")
        by_date = orders.repartitionByRange(FILES, "o_orderdate")
        # one key band ~ one file's envelope, derived from QUANTILES of
        # the actual key distribution (a kmax/FILES band lands between
        # replica blocks on the synthesized sf1 decade and selects
        # nothing — empty source means no pruning signal at all)
        klo, khi = orders.approxQuantile(
            "o_orderkey", [0.30, 0.33], 0.001
        )
        src = (
            orders.filter(F.col("o_orderkey").between(klo, khi))
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        )
        # by-source condition on the LAYOUT dimension so its stats
        # disjointness can actually carry files (a price condition on
        # key-partitioned files prunes nothing — every file's price
        # envelope spans the domain)
        k90 = orders.approxQuantile("o_orderkey", [0.90], 0.001)[0]
        band = f"o_orderkey >= {int(k90)}"
        times: dict = {
            "matched_cond": [],
            "bysrc_cond": [],
            "bysrc_uncond": [],
            "ts_retention_delete": [],
        }
        meta: dict = {}

        def run(tag, fn, base):
            root = tempfile.mkdtemp(prefix=f"ntx-mprobe-{tag}-")
            try:
                table = SnapshotTable(root + "/tbl")
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

        cutoff = orders.agg(
            F.date_add(F.min("o_orderdate"), 365).alias("c")
        ).first()["c"]
        for _ in range(repeats):
            run(
                "matched_cond",
                lambda t: t.merge(
                    spark, src, ["o_orderkey"],
                    when_matched=(
                        "update", "source.o_totalprice > target.o_totalprice"
                    ),
                ),
                by_key,
            )
            run(
                "bysrc_cond",
                lambda t: t.merge(
                    spark, src, ["o_orderkey"],
                    when_matched=(
                        "update", "source.o_totalprice > target.o_totalprice"
                    ),
                    when_not_matched_by_source=(
                        "update", {"o_orderpriority": "'5-LOW'"}, band
                    ),
                ),
                by_key,
            )
            run(
                "bysrc_uncond",
                lambda t: t.merge(
                    spark, src, ["o_orderkey"],
                    when_not_matched_by_source="delete",
                ),
                by_key,
            )
            run(
                "ts_retention_delete",
                lambda t: t.delete(
                    spark, f"o_orderdate < '{cutoff.isoformat()}'"
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
