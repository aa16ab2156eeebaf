"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query is materialized with the ``noop`` sink — full execution of the
physical plan (scan -> shuffle -> agg) with no driver collect, which is the
honest cost of the query at scale.

Warm-up: queries are timed in alphabetical order inside one shared session,
so whichever query FIRST touches a table pays its file-index/footer listing,
and the first pandas/Arrow query pays Python-worker-pool startup (~1-2 s).
Adding queries to the suite shifts those first-touch costs onto different
alphabetical victims — measured round-2-vs-1: multimodal_meta 0.20 s -> 2.49 s
with an unchanged three-projection plan, 2.09 s cold vs 0.33 s warm in the
same JVM. The warm-up below therefore touches every fixture table and spins
up the Python worker pool untimed, so per-query numbers compare plans across
rounds instead of suite ordering.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod
from nyc_taxi_data_pipeline_elt_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("ntx-bench")
    queries = entrymod.queries()

    # untimed warmup against the *benchmark* dataset: JIT/codegen
    # compilation, the per-table file-index/footer caches, and the Python
    # worker pool are per-JVM one-time costs, not per-query costs — pay
    # them all before timing (see module docstring for the measured
    # ordering artifact this removes)
    try:
        queries["q1_monthly_revenue"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        from nyc_taxi_data_pipeline_elt_spark.sources.readers import (
            TESTDATA_TABLES,
            load_table,
        )

        for t in TESTDATA_TABLES:
            load_table(spark, sf_dir, t).write.format("noop").mode(
                "overwrite"
            ).save()
        spark.range(1024).repartition(32).mapInPandas(
            lambda batches: batches, "id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name in sorted(queries):
        fn = queries[name]
        # each query measures from a cache-clean session: operators that
        # legitimately persist partition-pinned inputs (global indexing,
        # sequence packing) cannot unpersist the frame they return, and
        # letting those caches accumulate across 110 queries charges
        # later queries with earlier queries' GC pressure
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        start = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - start, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)

    # Full per-query detail goes to a sidecar file; the stdout line must
    # stay short enough that a consumer keeping only the LAST ~2000 bytes
    # of output still sees the complete JSON object (with ~80 queries the
    # full dict exceeds that window, truncating the head of the line and
    # making it unparseable). The line keeps the slowest queries — the
    # ones that matter for the total — and counts the rest.
    try:
        Path(__file__).resolve().parent.joinpath("BENCH_DETAIL.json").write_text(
            json.dumps(
                {
                    "metric": "total_query_wall_seconds",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                }
            )
            + "\n"
        )
    except OSError:
        pass

    failed = {k: v for k, v in timings.items() if v < 0}
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
    )
    line_queries: dict[str, float] = dict(failed)
    for name, t in slowest.items():
        trial = dict(line_queries)
        trial.setdefault(name, t)
        payload = {
            "metric": "total_query_wall_seconds",
            "value": total,
            "unit": "sec",
            "queries": trial,
            "n_queries": len(timings),
            "n_reported": len(trial),
            "detail": "BENCH_DETAIL.json",
            "sf": sf,
        }
        if len(json.dumps(payload, separators=(",", ":"))) > 1800:
            break
        line_queries = trial
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": line_queries,
                "n_queries": len(timings),
                "n_reported": len(line_queries),
                "detail": "BENCH_DETAIL.json",
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
