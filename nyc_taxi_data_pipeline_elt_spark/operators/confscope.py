"""Concurrency-safe SQL-conf scoping for iterative driver loops.

The iterative operators (connected components, PageRank, bounded SSSP)
pre-size their per-round shuffles from the measured edge volume and run
with AQE off (per-stage materialize-and-replan latency dominates tiny
loop stages — measured 3x on the clustering call). Both knobs are SQL
confs, and SQL confs are SESSION-global: setting them on the shared
session inside try/finally is correct single-threaded but races any
concurrent query planned on the same session mid-loop (it would run
with 4-partition shuffles and AQE off).

The scoped mechanism here is a CLONE SESSION: ``SparkSession.newSession``
shares the SparkContext, the SharedState and — critically — the
CacheManager, but owns an isolated ``SQLConf``. The loop plans and runs
every round on the clone, so its conf mutations are invisible to the
caller's session by construction; concurrent queries keep their
defaults with no window of exposure, and nothing needs restoring on
exit (the clone is dropped).

DataFrames are session-bound, so inputs hop onto the clone (and results
hop back) through GLOBAL temp views — the one catalog namespace shared
across sessions of a SparkContext. The hop is plan-level only: cache
lookup matches canonicalized plans, so a frame persisted and
materialized on one session is served from the shared cache when the
other session scans it — the expensive upstream pipeline (e.g. MinHash
LSH pair generation) is never re-evaluated across the hop.
"""

from __future__ import annotations

import itertools
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

_seq = itertools.count()
_lock = threading.Lock()


def _next_name(tag: str) -> str:
    with _lock:
        return f"__confscope_{tag}_{next(_seq)}"


def rebind(df: DataFrame, target: SparkSession, tag: str = "df") -> DataFrame:
    """Re-home ``df`` onto ``target`` (a session sharing the same
    SparkContext) via a global temp view. Persisted/materialized frames
    stay cached across the hop (shared CacheManager, canonicalized-plan
    match).

    The view is deliberately NOT dropped: ``dropGlobalTempView``
    cascades an uncache of every cache entry whose plan matches the
    view's stored plan — which is exactly ``df``'s analyzed plan, so
    dropping would silently evict the persisted input (measured: the
    downstream scan lost its InMemoryTableScan). The residue is one
    name->logical-plan catalog entry per hop, bounded by the number of
    loop invocations in the session."""
    name = _next_name(tag)
    df.createOrReplaceGlobalTempView(name)
    gdb = target.conf.get("spark.sql.globalTempDatabase", "global_temp")
    return target.table(f"{gdb}.{name}")


@contextmanager
def loop_session(spark: SparkSession, confs: dict):
    """Yield a clone of ``spark`` with the caller's explicitly-set
    runtime SQL confs copied over and ``confs`` applied on top. The
    caller's session is never mutated; the clone's conf changes die
    with the clone."""
    clone = None
    try:
        # fast path (r13 optimization): the JVM's ``cloneSession()``
        # copies the WHOLE session state — runtime SQL confs included —
        # in one py4j call. The SET-walk fallback below costs ~0.28 s
        # per invocation in driver round-trips (measured: 32 conf rows
        # x get+set at ~4 ms each), charged to every streaming replay
        # and every iterative-loop query; the clone costs ~0.07 s and
        # cannot miss a conf. Same isolation contract: the clone owns
        # its SQLConf, shares SparkContext/SharedState/CacheManager.
        clone = SparkSession(
            spark.sparkContext, spark._jsparkSession.cloneSession()
        )
    except Exception:
        # runtimes without JVM session introspection (Spark Connect):
        # newSession + copy the explicitly-set confs key by key
        clone = spark.newSession()
        # newSession() starts from the SparkConf captured at context
        # build time, not the caller's runtime values — copy the
        # runtime-set confs (SET lists exactly those KEYS) so
        # tune()-applied settings like the parquet nanos handling hold
        # inside the loop too. Values come from conf.get, NOT the SET
        # output: SET redacts secret-like keys (spark.redaction.regex
        # matches secret/password/token/access.key), and copying its
        # output verbatim would overwrite such a conf with the literal
        # placeholder on the clone. Static/readonly entries refuse
        # runtime set; skip them.
        for row in spark.sql("SET").collect():
            if row["value"] is None or row["value"] == "<undefined>":
                continue
            try:
                value = spark.conf.get(row["key"], row["value"])
                if value is None or "(redacted)" in value:
                    continue
                clone.conf.set(row["key"], value)
            except Exception:
                pass
    for k, v in confs.items():
        clone.conf.set(k, str(v))
    yield clone
