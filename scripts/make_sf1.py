"""Synthesize an sf1 decade (10x sf0.1) for the SCALING.md measurement
(VERDICT r6 task #5) — only the three tables the five heaviest operator
families touch: documents, embeddings, customer.

The replication model is "10x corpus at the SAME local density" — the
honest scaling model for these workloads (a bigger crawl has more
near-dup clusters, not 10x-denser ones):

- documents: 10 replicas; replica 0 is the original corpus verbatim,
  replica r applies a letter-ROTATION cipher (shift r) to every token
  that is not an English stopword. The cipher is length-preserving and
  injective, so intra-replica shingle/n-gram structure (planted
  near-dups, boilerplate, bucket sizes, repetition profiles) is
  preserved EXACTLY while cross-replica shingle overlap collapses to
  the rare stopword-only n-grams — candidate-pair volume grows
  linearly with the corpus. Stopwords are kept verbatim and token
  lengths never change, so the Gopher/C4 quality gates (word count,
  mean word length, stopword presence, top-token repetition) score
  replicas identically to the original — quality-gated pipelines
  (curate_corpus_pipeline) see the same survivor fraction at sf1 as at
  sf0.1, which a plain token-suffix transform destroyed (it stripped
  every stopword match). All JVM-side (split -> transform with literal
  alphabets -> array_join), one map stage per replica, 10-way union.
- embeddings: 10 replicas; replica r multiplies the vector by a
  deterministic per-(replica, dim) +-1 mask (xxhash64 parity). Sign
  flips are an isometry, so intra-replica geometry (near-dup pairs,
  cluster structure) is exact, while cross-replica cosines are
  decorrelated — near-dup volume again grows linearly.
- customer: 10 replicas; block keys (c_nationkey, c_mktsegment) get a
  per-replica nation offset so ER block COUNT grows 10x at constant
  block size (the corpus-linear ER model; the same-keys densified
  variant is measured separately in SCALING.md's notes). Names keep
  their collision structure inside each replica.

Ids are offset by replica * 10^9 so every id stays unique and joins
never cross replicas by accident. Output: /root/repo/.scaling_sf1/.
Deterministic — no Date.now/random anywhere.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.session import get_spark, tune
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

SRC = "/root/testdata/sf0.1"
OUT = str(Path(__file__).resolve().parent.parent / ".scaling_sf1")
R = 10
OFF = 1_000_000_000


def main() -> None:
    spark = get_spark("make-sf1", cpus=32)
    tune(spark)
    reps = spark.range(R).select(F.col("id").cast("int").alias("r"))

    import string

    from nyc_taxi_data_pipeline_elt_spark.operators import text as X

    ab, up = string.ascii_lowercase, string.ascii_uppercase
    stop = X.LANG_STOPWORDS["en"]
    docs = load_table(spark, SRC, "documents")
    parts = []
    for r in range(R):
        if r == 0:
            t = F.col("text")
        else:
            rot = ab[r:] + ab[:r] + up[r:] + up[:r]
            t = F.array_join(
                F.transform(
                    F.split(F.trim(F.col("text")), r"\s+"),
                    lambda tok: F.when(F.lower(tok).isin(stop), tok).otherwise(
                        F.translate(tok, ab + up, rot)
                    ),
                ),
                " ",
            )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r).cast("long") * OFF).alias(
                    "doc_id"
                ),
                t.alias("text"),
                "lang",
                "source",
            )
        )
    d = parts[0]
    for p in parts[1:]:
        d = d.unionByName(p)
    d = d.withColumn("n_chars", F.length("text"))
    d.repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    emb = load_table(spark, SRC, "embeddings")
    e = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("r").cast("long") * OFF).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(
                (F.col("r") == 0)
                | (F.pmod(F.xxhash64(F.col("r"), i), F.lit(2)) == 0),
                x,
            ).otherwise(-x),
        ).alias("embedding"),
        "label",
    )
    e.repartition(8).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")

    cust = load_table(spark, SRC, "customer")
    c = cust.crossJoin(F.broadcast(reps)).select(
        (F.col("c_custkey") + F.col("r").cast("long") * OFF).alias("c_custkey"),
        "c_name",
        (F.col("c_nationkey") + F.col("r") * 25).alias("c_nationkey"),
        "c_acctbal",
        "c_mktsegment",
    )
    c.repartition(8).write.mode("overwrite").parquet(f"{OUT}/customer.parquet")

    for t in ("documents", "embeddings", "customer"):
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(t, n)


if __name__ == "__main__":
    main()


def make_dense(spark=None) -> None:
    """Densified variants: SAME keys, 10x population — the c^2-output
    stress regime (boilerplate flood / ER block saturation) that the
    hot-bucket caps and the collision-aware editdist dispatcher exist
    for. documents_dense: replica tokens NOT decorrelated (texts repeat
    verbatim, so every band bucket and shingle posting grows 10x);
    customer_dense: nation keys NOT offset (every ER block grows 10x).
    Written beside the linear-model tables with a _dense suffix."""
    spark = spark or get_spark("make-sf1-dense", cpus=32)
    tune(spark)
    reps = spark.range(R).select(F.col("id").cast("int").alias("r"))

    docs = load_table(spark, SRC, "documents")
    d = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("r").cast("long") * OFF).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    d.repartition(32).write.mode("overwrite").parquet(
        f"{OUT}/documents_dense.parquet"
    )

    cust = load_table(spark, SRC, "customer")
    c = cust.crossJoin(F.broadcast(reps)).select(
        (F.col("c_custkey") + F.col("r").cast("long") * OFF).alias(
            "c_custkey"
        ),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    c.repartition(8).write.mode("overwrite").parquet(
        f"{OUT}/customer_dense.parquet"
    )
    for t in ("documents_dense", "customer_dense"):
        print(t, spark.read.parquet(f"{OUT}/{t}.parquet").count())


def make_orders(spark=None) -> None:
    """sf1 orders for the snapshot-maintenance (OPTIMIZE ZORDER) decade:
    10 replicas, orderkeys offset by replica * 10^9 and custkeys by
    replica * 150000 — the linear corpus model (10x the customers at the
    same per-customer order density), so the zorder grid spans a 10x key
    range while the 2-D box predicate keeps selecting the same
    FRACTION of the domain. Written beside the other sf1 tables."""
    spark = spark or get_spark("make-sf1-orders", cpus=32)
    tune(spark)
    reps = spark.range(R).select(F.col("id").cast("int").alias("r"))
    orders = load_table(spark, SRC, "orders")
    o = orders.crossJoin(F.broadcast(reps)).select(
        (F.col("o_orderkey") + F.col("r").cast("long") * OFF).alias(
            "o_orderkey"
        ),
        (F.col("o_custkey") + F.col("r").cast("long") * 150_000).alias(
            "o_custkey"
        ),
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    o.repartition(16).write.mode("overwrite").parquet(
        f"{OUT}/orders.parquet"
    )
    print("orders", spark.read.parquet(f"{OUT}/orders.parquet").count())


def make_events() -> None:
    """sf1 events for the streaming-replay decade (VERDICT r7 task #5):
    10 replicas with event_id / user_id offset by replica * 10^9 and ts
    kept VERBATIM — same wall-clock span and watermark windows, 10x the
    keyed state (users) and 10x the rows per window, which is the honest
    "bigger firehose, same cadence" scaling model for a stream. Pure
    pyarrow (no Spark session) so the TIMESTAMP(NANOS) physical type the
    fixtures ship — and the footer-sniff path every streaming reader
    exercises — is preserved bit-exactly; output is a single file like
    the source fixture, so single-file replay stays one micro-batch and
    the multifile splitter sees the same layout."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for r in range(R):
        off = pa.scalar(r * OFF, type=pa.int64())
        parts.append(
            t.set_column(
                t.schema.get_field_index("event_id"),
                "event_id",
                pc.add(t.column("event_id"), off),
            ).set_column(
                t.schema.get_field_index("user_id"),
                "user_id",
                pc.add(t.column("user_id"), off),
            )
        )
    out = pa.concat_tables(parts)
    Path(OUT).mkdir(exist_ok=True)
    pq.write_table(out, f"{OUT}/events.parquet")
    print("events", out.num_rows)
