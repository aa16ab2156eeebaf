"""SCALING.md measurement probe: time a named subset of registered
queries at one SF dir in THIS fresh JVM — min of N warm repeats per
query (first repeat pays codegen/footers and is discarded unless it is
the min anyway; matches the SCALING.md protocol). Prints one JSON line.

Usage: python scripts/scaling_probe.py <sf_dir> <query> [<query> ...]
Env: SCALING_REPEATS (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from nyc_taxi_data_pipeline_elt_spark.session import get_spark


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    repeats = int(os.environ.get("SCALING_REPEATS", "2"))
    queries = entrymod.queries()
    spark = get_spark("scaling-probe", cpus=32)
    # untimed warmup: worker pool + codegen path
    spark.range(1024).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()
    out = {}
    for name in names:
        times = []
        for _ in range(repeats):
            try:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            t0 = time.perf_counter()
            try:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(time.perf_counter() - t0)
            except Exception as exc:
                print(f"{name} FAILED: {exc}", file=sys.stderr)
                times.append(-1.0)
                break
        out[name] = round(min(t for t in times if t > 0), 2) if all(
            t > 0 for t in times
        ) else -1.0
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "times": out}))


if __name__ == "__main__":
    main()
