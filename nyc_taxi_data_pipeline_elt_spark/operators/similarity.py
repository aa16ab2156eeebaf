"""Similarity search over embedding columns (``array<float>``).

Two paths, mirroring how ANN is actually deployed:

- **brute force**: exact cosine against every row — the correctness
  baseline. One scan, one top-k; embarrassingly parallel at any scale.
- **IVF (inverted file)**: coarse quantization — vectors are bucketed by
  their nearest centroid; a query probes only its centroid's bucket. The
  scan cost drops by ~n_buckets. Centroid assignment here uses the
  fixture's ``label`` as the coarse partition (deterministic, so the
  DuckDB oracle can replicate the *same* approximation), with centroids
  computed as per-bucket means — the shape of a real IVF index build:
  one aggregation to build centroids, one broadcast join to probe.

Performance: dot products are *unrolled* into a fixed-width sum of
``element_at`` products rather than ``aggregate(zip_with(...))`` — Spark
evaluates array higher-order functions interpreted (CodegenFallback),
measured ~10x slower than the codegen'd unrolled expression on the
pairwise path. Unrolling needs the dimension at plan time (EMBED_DIM);
summation stays left-to-right, matching DuckDB's list_dot_product order
so results are bit-identical for the oracle.

All floats are cast to double before arithmetic on both engines: Spark
and DuckDB must accumulate in the same precision for the hash to match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixture embedding dimensionality (embeddings.parquet: array<float>[64]).
EMBED_DIM = 64


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return c.cast("array<double>")


def dot(a: Column, b: Column, dim: int = EMBED_DIM) -> Column:
    """Unrolled dot product: codegen-friendly, left-to-right summation
    (same association as DuckDB's list_dot_product)."""
    terms = [
        F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def cosine(a: Column, b: Column, dim: int = EMBED_DIM) -> Column:
    return dot(a, b, dim) / F.sqrt(dot(a, a, dim) * dot(b, b, dim))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against the vector with ``query_vec_id``.

    The 1-row query side is broadcast: the 'join' is a map-side closure
    over the full scan — embarrassingly parallel at any scale.
    """
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        as_double(vec_col).alias("qvec")
    )
    return (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine(as_double(vec_col), F.col("qvec")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine >= threshold (exact). Quadratic — the verifier /
    small-corpus path; at scale, block with LSH or IVF buckets first.

    Self-norms are precomputed per row before the join, so per-pair work
    is one unrolled dot + a divide (codegen end to end).

    Physical shape: broadcast nested-loop join with the *streamed* side
    repartitioned — a small vector table arrives as one file split, and
    without the repartition the whole O(n^2) loop would run in a single
    task. At cluster scale the streamed side is naturally partitioned and
    the broadcast side must fit in executor memory (block the corpus
    first when it doesn't).

    The similarity threshold lives in the JOIN CONDITION, not a
    post-filter: a BNLJ evaluates its condition on a cheap row wrapper
    and only builds (and copies) an output row for survivors, so the
    O(n^2) non-matches never materialize. Measured ~2x on the all-pairs
    path; the projection recomputes the similarity only for the few
    matches.
    """
    e = embeddings.select(F.col(id_col), as_double(vec_col).alias("v"))
    e = e.withColumn("n2", dot(F.col("v"), F.col("v")))
    par = max(e.sparkSession.sparkContext.defaultParallelism, 8)
    a = e.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("n2").alias("na")
    ).repartition(par)
    b = e.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("n2").alias("nb")
    )
    sim = F.round(
        dot(F.col("va"), F.col("vb")) / F.sqrt(F.col("na") * F.col("nb")), 6
    )
    pairs = a.join(
        F.broadcast(b), (F.col("id_a") < F.col("id_b")) & (sim >= threshold)
    )
    return pairs.select("id_a", "id_b", sim.alias("cos_sim"))


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """IVF-style approximate top-k: probe only the bucket whose centroid is
    nearest the query (nprobe=1).

    Index build = one groupBy to average vectors per bucket (posexplode ->
    mean per position -> reassemble ordered). Probe = centroid argmax +
    bucket-pruned brute force. Deterministic, so oracle-checkable; recall
    vs brute force depends on how well buckets reflect geometry.

    Serving shape: the query vector and the probed bucket id are fetched
    as driver-side scalars (two O(1)-result lookups — this is how ANN is
    actually served; the query arrives from outside the corpus anyway).
    Embedding them as literals means the probe compiles to a plain scan
    with a *pushed-down* ``bucket = <best>`` filter — on a corpus
    partitioned/clustered by bucket, parquet row-group and partition
    pruning skip everything but the probed bucket, which is the entire
    point of IVF at 100 TB. The earlier broadcast-join formulation could
    not push the probe predicate into the scan and serialized three
    nested broadcast jobs.
    """
    e = embeddings.select(
        F.col(id_col), F.col(bucket_col), as_double(vec_col).alias("v")
    )
    qrow = (
        embeddings.filter(F.col(id_col) == query_vec_id)
        .select(as_double(vec_col).alias("v"))
        .first()
    )
    q = [float(x) for x in qrow["v"]]
    qvec = F.array(*[F.lit(x) for x in q])
    # build centroids: mean per (bucket, position), reassembled in order.
    # The distributed part is the aggregation; the result — n_buckets x dim
    # doubles — IS the IVF index metadata, which serving keeps in driver /
    # index memory. Selecting the probe bucket is a Python argmax over it
    # (left-to-right float sums, the same association as the distributed
    # dot), not a Spark job: compiling a 192-term codegen expression to
    # rank 10 rows costs more than the whole lookup.
    pos = e.select(bucket_col, F.posexplode("v").alias("pos", "val"))
    centroids = (
        pos.groupBy(bucket_col, "pos")
        .agg(F.avg("val").alias("mval"))
        .groupBy(bucket_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mval"))),
                lambda s: s["mval"],
            ).alias("centroid")
        )
    )

    def _cos(c: list[float]) -> float:
        num = nc = nq = 0.0
        for ci, qi in zip(c, q):
            num = num + ci * qi
            nc = nc + ci * ci
            nq = nq + qi * qi
        return num / (nc * nq) ** 0.5

    # nprobe=1: bucket whose centroid maximizes cosine (tiebreak: bucket id)
    ranked = sorted(
        ((row[bucket_col], _cos(list(row["centroid"]))) for row in centroids.collect()),
        key=lambda t: (-t[1], t[0]),
    )
    best = ranked[0][0]
    return (
        e.filter(F.col(bucket_col) == best)  # pushed-down bucket pruning
        .filter(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col),
            F.round(cosine(F.col("v"), qvec), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
