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

import math

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


def _lit_d(x: float) -> str:
    """Render a double as a SQL literal that round-trips exactly:
    ``repr`` emits the shortest digit string that re-reads to the same
    bits, and the ``D`` suffix pins DoubleType (no decimal inference)."""
    return f"{x!r}D"


def _self_dot(vals: list[float]) -> float:
    """Left-to-right self-dot — the association the unrolled expression
    (and Catalyst's constant folder, which evaluates the literal tree
    node by node) produces, so the folded scalar is bit-identical."""
    s = vals[0] * vals[0]
    for v in vals[1:]:
        s = s + v * v
    return s


def dot_lit_sql(col_sql: str, vals: list[float], lit_first: bool = False) -> str:
    """SQL text of :func:`dot` between column ``col_sql`` and a literal
    vector, emitted pre-folded: the ``element_at(array(<lits>), i)``
    lookups Catalyst would constant-fold anyway appear as scalar
    literals directly. Building the equivalent Column expression costs
    ~130 py4j round-trips per dot (~0.45 s of driver wall; ~1.3 s per
    cosine — measured, guide §1.2/§4: driver-side latency is part of
    the query), while this string parses in ~2 ms. ``lit_first``
    mirrors the operand order of the Column form it replaces so the
    optimized plan stays byte-identical."""
    if lit_first:
        return " + ".join(
            f"({_lit_d(float(v))} * element_at({col_sql}, {i + 1}))"
            for i, v in enumerate(vals)
        )
    return " + ".join(
        f"(element_at({col_sql}, {i + 1}) * {_lit_d(float(v))})"
        for i, v in enumerate(vals)
    )


def dot_sql(a_sql: str, b_sql: str, dim: int = EMBED_DIM) -> str:
    """SQL text of the unrolled column-column :func:`dot` (same terms,
    same left-to-right association; one parse instead of py4j calls)."""
    return " + ".join(
        f"(element_at({a_sql}, {i + 1}) * element_at({b_sql}, {i + 1}))"
        for i in range(dim)
    )


def cosine_lit(col_sql: str, vals) -> Column:
    """:func:`cosine` of column ``col_sql`` against a LITERAL query
    vector, built directly in the constant-folded form the optimizer
    produces from ``cosine(col, F.array(*lits))``: the numerator dots
    the column against scalar literals, and the query's self-dot is the
    folded scalar (left-to-right in Python, the same IEEE sequence).
    The optimized plan is byte-identical to the Column form (pinned in
    tests/test_similarity_fold.py) — this is purely a driver-side
    build-cost optimization (~1.3 s -> ~2 ms per cosine)."""
    vals = [float(v) for v in vals]
    return F.expr(
        f"({dot_lit_sql(col_sql, vals)})"
        f" / SQRT(({dot_sql(col_sql, col_sql, len(vals))})"
        f" * {_lit_d(_self_dot(vals))})"
    )


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


#: neardup_pairs refuses corpora above this size: the exact all-pairs
#: design (driver toPandas + corpus broadcast) is a verifier, not a
#: production path — beyond this bound use neardup_pairs_blocked.
NEARDUP_EXACT_MAX_VECTORS = 100_000


def neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_vectors: int = NEARDUP_EXACT_MAX_VECTORS,
) -> DataFrame:
    """All-pairs cosine >= threshold (exact). Quadratic — the verifier /
    small-corpus path; at scale, block with LSH or IVF buckets first.
    Guarded: raises above ``max_vectors`` rows, pointing at the blocked
    production twin, so this can never silently run on a real corpus.

    Physical shape: block-matrix product. The index side (all vectors) is
    a broadcast variable — same memory contract as the broadcast join it
    replaces: the corpus must fit in executor memory, block it first when
    it doesn't. The streamed side is repartitioned so each task computes
    one (block x corpus) similarity slab in numpy.

    This is the one hot path where a Pandas kernel beats codegen: the
    unrolled ``element_at`` dot product ran ~3.5us/pair (generic ArrayData
    access per element), the vectorized slab ~50x faster. Bit-parity with
    the SQL twin is preserved by construction:

    - accumulation loops dimension-by-dimension across the whole slab, so
      every pair's sum is the same left-to-right association as DuckDB's
      ``list_dot_product`` (vector lanes are independent — lane-parallel
      addition does not reassociate any single pair's sum);
    - ``floor(x*1e6 + 0.5)/1e6`` reproduces DuckDB ``round(x, 6)``
      exactly (verified on 2e5 random doubles incl. negatives);
    - NaN similarities (zero-norm vectors) are kept, matching Spark's and
      DuckDB's NaN-is-largest comparison semantics.
    """
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    id_type = dict(embeddings.dtypes)[id_col]
    base = embeddings.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("v")
    )
    n_vectors = base.count()
    if n_vectors > max_vectors:
        raise ValueError(
            f"neardup_pairs is the exact small-corpus verifier and refuses "
            f"{n_vectors} vectors (> {max_vectors}): it collects the corpus "
            f"to the driver and broadcasts it. Use neardup_pairs_blocked "
            f"(banded sign-LSH, fully distributed) at this scale."
        )
    side = base.toPandas()
    ids_all = side["id"].to_numpy()
    B = np.array([np.asarray(v, dtype=np.float64) for v in side["v"]])
    nb = np.zeros(len(ids_all), dtype=np.float64)
    for i in range(B.shape[1]):
        nb = nb + B[:, i] * B[:, i]
    bc = spark.sparkContext.broadcast((ids_all, B, nb))
    thr = float(threshold)

    def block(batches):
        ids_b, Bm, nbv = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            ida = pdf["id"].to_numpy()
            dim = A.shape[1]
            na = np.zeros(len(ida), dtype=np.float64)
            S = A[:, 0:1] * Bm[:, 0][None, :]
            na = na + A[:, 0] * A[:, 0]
            for i in range(1, dim):
                S = S + A[:, i : i + 1] * Bm[:, i][None, :]
                na = na + A[:, i] * A[:, i]
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = S / np.sqrt(na[:, None] * nbv[None, :])
                r = np.floor(cos * 1e6 + 0.5) / 1e6
                keep = (ida[:, None] < ids_b[None, :]) & (
                    (r >= thr) | np.isnan(r)
                )
            ia, ib = np.nonzero(keep)
            yield pd.DataFrame(
                {"id_a": ida[ia], "id_b": ids_b[ib], "cos_sim": r[ia, ib]}
            )

    par = max(spark.sparkContext.defaultParallelism, 8)
    return base.repartition(par).mapInPandas(
        block, schema=f"id_a {id_type}, id_b {id_type}, cos_sim double"
    )


def neardup_pairs_blocked(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_bands: int = 4,
    band_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket: int | None = None,
) -> DataFrame:
    """LSH-blocked near-dup pairs — the *production* path that
    :func:`neardup_pairs` (driver collect + full-corpus broadcast, the
    exact verifier) is not.

    Blocking: ``n_bands`` independent sign-LSH keys of ``band_planes``
    bits each (banding, exactly like MinHash-LSH over text in
    ``operators.dedup``); a pair is a candidate iff it collides in at
    least one band. Physical shape: one row-local projection computes
    every band key, ``explode`` fans each vector out to its
    ``n_bands`` (band, bucket) rows, and the ONLY shuffle is the
    ``groupBy`` on those keys — never all-pairs, no driver ``toPandas``,
    no corpus broadcast. Each bucket group runs the same vectorized
    numpy slab kernel as the exact verifier (dimension-by-dimension
    accumulation keeps bit-parity with DuckDB ``list_dot_product``;
    ``floor(x*1e6+0.5)/1e6`` == ``round(x, 6)``); duplicate hits across
    bands are collapsed by one final ``dropDuplicates`` on the pair key
    (the similarity is computed identically in every band, so any
    surviving row carries the same value).

    Recall/efficiency knob: P(candidate) = 1-(1-p^r)^b with
    p = 1 - theta/pi. At a true near-dup threshold (cos >= 0.8,
    p >= 0.9) the default 4x4 banding keeps ~98% recall while pruning
    ~(1 - 2^-4) of comparisons per band; at the fixture's loose 0.35 it
    trades ~58% of pairs for ~4x fewer comparisons. Both engines derive
    the SAME deterministic approximation (shared hyperplane literals),
    so the result is oracle-checkable and always a subset of the exact
    pairs. At 100 TB: raise ``band_planes`` so per-bucket groups fit an
    Arrow batch; bucket sizes stay balanced because the hyperplanes are
    data-independent. Like :func:`knn_join_blocked`, a FROZEN knob is
    quadratic per corpus decade (the slab kernel is c^2 per bucket at
    fixed bucket count — the measured 28x/decade kNN offender in
    SCALING.md); pass ``target_bucket`` to size ``band_planes`` from
    the corpus count via :func:`auto_band_planes`. The oracle-checked
    registered query pins explicit knobs so its SQL twin embeds the
    identical plane literals.
    """
    import numpy as np
    import pandas as pd

    if target_bucket is not None:
        band_planes = auto_band_planes(embeddings.count(), target_bucket)
    planes = _hyperplanes(n_bands * band_planes)
    id_type = dict(embeddings.dtypes)[id_col]
    base = embeddings.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("v")
    )
    # Band keys are computed in one Arrow-vectorized *narrow* stage (no
    # shuffle), not as unrolled JVM expressions: n_bands*band_planes
    # 64-term dot products form nested add-trees that overflow Janino's
    # 64KB method limit (measured: the whole stage falls back to
    # interpreted row-at-a-time eval — far slower than the Arrow batch).
    # The accumulation runs dimension-by-dimension across the batch, so
    # every (vector, plane) dot keeps the left-to-right association of
    # DuckDB's list_dot_product, and the sign bits agree bit-exactly.
    P = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
    id_field = embeddings.schema[id_col].dataType.simpleString()

    def band_keys(batches):
        weights = 1 << np.arange(band_planes, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            D = V[:, 0:1] * P[:, 0][None, :]
            for i in range(1, V.shape[1]):
                D = D + V[:, i : i + 1] * P[:, i][None, :]
            bits = D >= 0  # (n, n_planes)
            frames = []
            for b in range(n_bands):
                bucket = (
                    bits[:, b * band_planes : (b + 1) * band_planes] * weights
                ).sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "id": pdf["id"],
                            "v": pdf["v"],
                            "band": np.full(len(pdf), b, dtype=np.int32),
                            "bucket": bucket,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    keyed = base.mapInPandas(
        band_keys,
        schema=f"id {id_field}, v array<double>, band int, bucket long",
    )
    thr = float(threshold)

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        A = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        ids = pdf["id"].to_numpy()
        dim = A.shape[1]
        S = A[:, 0:1] * A[:, 0][None, :]
        nrm = A[:, 0] * A[:, 0]
        for i in range(1, dim):
            S = S + A[:, i : i + 1] * A[:, i][None, :]
            nrm = nrm + A[:, i] * A[:, i]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = S / np.sqrt(nrm[:, None] * nrm[None, :])
            r = np.floor(cos * 1e6 + 0.5) / 1e6
            keep = (ids[:, None] < ids[None, :]) & ((r >= thr) | np.isnan(r))
        ia, ib = np.nonzero(keep)
        return pd.DataFrame(
            {"id_a": ids[ia], "id_b": ids[ib], "cos_sim": r[ia, ib]}
        )

    pairs = keyed.groupBy("band", "bucket").applyInPandas(
        bucket_pairs, schema=f"id_a {id_type}, id_b {id_type}, cos_sim double"
    )
    return pairs.dropDuplicates(["id_a", "id_b"])


def neardup_blocked_oracle_sql(
    threshold: float = 0.35, n_bands: int = 4, band_planes: int = 4
) -> str:
    """DuckDB twin of :func:`neardup_pairs_blocked`: same hyperplane
    literals, per-band equi-joins unioned (UNION dedups pair hits across
    bands), then exact cosine on the candidates."""
    planes = _hyperplanes(n_bands * band_planes)

    def bits(sub: list[list[float]]) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product(v, {p}) >= 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(sub)
        )

    band_exprs = ",\n         ".join(
        f"({bits(planes[b * band_planes:(b + 1) * band_planes])}) AS b{b}"
        for b in range(n_bands)
    )
    union = "\n  UNION\n".join(
        f"  SELECT a.vec_id AS id_a, b.vec_id AS id_b\n"
        f"  FROM e a JOIN e b ON a.vec_id < b.vec_id AND a.b{b} = b.b{b}"
        for b in range(n_bands)
    )
    cos = (
        "list_dot_product(ea.v, eb.v) / sqrt(list_dot_product(ea.v, ea.v)"
        " * list_dot_product(eb.v, eb.v))"
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {band_exprs}
  FROM embeddings
),
cand AS (
{union}
)
SELECT c.id_a, c.id_b, round({cos}, 6) AS cos_sim
FROM cand c
JOIN e ea ON ea.vec_id = c.id_a
JOIN e eb ON eb.vec_id = c.id_b
WHERE round({cos}, 6) >= {threshold} OR isnan({cos})
"""


def auto_band_planes(n_vectors: int, target_bucket: int) -> int:
    """LSH/IVF index-sizing rule: planes per band so that expected
    bucket population ``n / 2^planes`` lands at ``target_bucket`` —
    the knob that keeps the per-bucket slab kernel's pair volume
    corpus-LINEAR across decades (fixed knob = quadratic; measured 28x
    vs ~1.9x for the sf0.1 -> sf1 decade, SCALING.md)."""
    return max(1, math.ceil(math.log2(max(2.0, n_vectors / target_bucket))))


def knn_join_blocked(
    embeddings: DataFrame,
    k: int = 3,
    n_bands: int = 4,
    band_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket: int | None = None,
) -> DataFrame:
    """Approximate kNN *join*: top-k cosine neighbors for EVERY vector,
    candidates blocked by the same banded sign-LSH as
    :func:`neardup_pairs_blocked` — the production all-vectors shape
    (dedup clustering input, retrieval-index build) that single-query
    top-k serving doesn't cover.

    Physical shape: Arrow band-key stage (narrow) -> shuffle on band
    keys -> per-bucket directed-pair slab kernel -> pair dedup across
    bands -> one window shuffle on the vector id for the per-id top-k.
    Never all-pairs, no driver collect, no corpus broadcast. Neighbors
    outside every shared bucket are missed (recall follows the banding
    formula); both engines derive the identical approximation.

    **Index sizing is the scale contract.** The bucket count per band
    is FIXED at ``2^band_planes``, so the slab kernel's pair volume is
    ``n_bands * 2^band_planes * (n / 2^band_planes)^2`` — quadratic in
    the corpus at a fixed knob (measured: 28x wall for the 10x
    sf0.1 -> sf1 decade at ``band_planes=4``; see SCALING.md). Like any
    LSH/IVF index, the knob must track the corpus:
    ``band_planes ~ log2(n / target_bucket)`` keeps bucket populations
    — and therefore per-decade growth — constant (re-measured at sf1
    with ``band_planes=7``: ~linear). Pass ``target_bucket`` to apply
    that rule from a corpus count (one cheap pass at index-build time);
    the oracle-checked registered query pins explicit knobs instead so
    its SQL twin embeds the identical plane literals.
    """
    if target_bucket is not None:
        band_planes = auto_band_planes(embeddings.count(), target_bucket)
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    planes = _hyperplanes(n_bands * band_planes)
    id_type = dict(embeddings.dtypes)[id_col]
    base = embeddings.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("v")
    )
    P = np.asarray(planes, dtype=np.float64)

    def band_keys(batches):
        weights = 1 << np.arange(band_planes, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            D = V[:, 0:1] * P[:, 0][None, :]
            for i in range(1, V.shape[1]):
                D = D + V[:, i : i + 1] * P[:, i][None, :]
            bits = D >= 0
            frames = []
            for b in range(n_bands):
                bucket = (
                    bits[:, b * band_planes : (b + 1) * band_planes] * weights
                ).sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "id": pdf["id"],
                            "v": pdf["v"],
                            "band": np.full(len(pdf), b, dtype=np.int32),
                            "bucket": bucket,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    keyed = base.mapInPandas(
        band_keys, schema=f"id {id_type}, v array<double>, band int, bucket long"
    )

    def bucket_neighbors(pdf: pd.DataFrame) -> pd.DataFrame:
        A = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        ids = pdf["id"].to_numpy()
        dim = A.shape[1]
        S = A[:, 0:1] * A[:, 0][None, :]
        nrm = A[:, 0] * A[:, 0]
        for i in range(1, dim):
            S = S + A[:, i : i + 1] * A[:, i][None, :]
            nrm = nrm + A[:, i] * A[:, i]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = S / np.sqrt(nrm[:, None] * nrm[None, :])
            r = np.floor(cos * 1e6 + 0.5) / 1e6
        keep = ids[:, None] != ids[None, :]
        ia, ib = np.nonzero(keep)
        return pd.DataFrame(
            {"id": ids[ia], "nbr": ids[ib], "cos_sim": r[ia, ib]}
        )

    # One repartition on id serves BOTH downstream clusterings: hash(id)
    # satisfies the (id, nbr) clustering dropDuplicates requires (subset
    # rule) and is exactly the window's partitioning — so dedup + top-k
    # add zero further exchanges after the band shuffle.
    pairs = (
        keyed.groupBy("band", "bucket")
        .applyInPandas(
            bucket_neighbors,
            schema=f"id {id_type}, nbr {id_type}, cos_sim double",
        )
        .repartition("id")
        .dropDuplicates(["id", "nbr"])
    )
    w = Window.partitionBy("id").orderBy(F.col("cos_sim").desc(), F.col("nbr"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("id").alias(id_col),
            F.col("nbr").alias("neighbor_id"),
            "cos_sim",
        )
    )


def knn_join_oracle_sql(
    k: int = 3, n_bands: int = 4, band_planes: int = 4
) -> str:
    """DuckDB twin of :func:`knn_join_blocked`: per-band equi-joins
    unioned into the directed candidate set, exact cosine, per-id
    row_number top-k with the same (cos desc, neighbor) tie-break."""
    planes = _hyperplanes(n_bands * band_planes)

    def bits(sub: list[list[float]]) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product(v, {p}) >= 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(sub)
        )

    band_exprs = ",\n         ".join(
        f"({bits(planes[b * band_planes:(b + 1) * band_planes])}) AS b{b}"
        for b in range(n_bands)
    )
    union = "\n  UNION\n".join(
        f"  SELECT a.vec_id AS va, b.vec_id AS vb\n"
        f"  FROM e a JOIN e b ON a.vec_id <> b.vec_id AND a.b{b} = b.b{b}"
        for b in range(n_bands)
    )
    cos = (
        "list_dot_product(ea.v, eb.v) / sqrt(list_dot_product(ea.v, ea.v)"
        " * list_dot_product(eb.v, eb.v))"
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {band_exprs}
  FROM embeddings
),
cand AS (
{union}
),
scored AS (
  SELECT c.va AS vec_id, c.vb AS neighbor_id, round({cos}, 6) + 0.0 AS cos_sim
  FROM cand c
  JOIN e ea ON ea.vec_id = c.va
  JOIN e eb ON eb.vec_id = c.vb
)
SELECT vec_id, neighbor_id, cos_sim FROM (
  SELECT vec_id, neighbor_id, cos_sim,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY cos_sim DESC, neighbor_id
         ) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def _hyperplanes(n_planes: int, dim: int = EMBED_DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH, derived
    from a fixed seed and rounded to 6 decimals so the SAME literal
    vectors can be embedded in both the Spark plan and the oracle SQL —
    no cross-engine RNG or hash agreement needed."""
    import random

    rng = random.Random(20240817)
    return [
        [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]
        for _ in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = (vec . plane_i >= 0), packed to an
    int. Random-hyperplane LSH (SimHash for real vectors, Charikar
    STOC'02): vectors at small cosine distance agree on most sign bits,
    so same-bucket candidates are cosine-close with high probability."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        terms = [vec[j] * F.lit(p[j]) for j in range(len(p))]
        d = terms[0]
        for t in terms[1:]:
            d = d + t
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def _sign_buckets_arrow(
    base: DataFrame, planes: list[list[float]], id_col: str, id_field: str
) -> DataFrame:
    """Row-local sign-LSH bucketing as one Arrow-vectorized narrow stage.

    The JVM alternative — ``lsh_bucket``'s unrolled dot products — is a
    nested add-tree of n_planes*dim terms that overflows Janino's 64KB
    method limit beyond ~4 planes at dim 64, dropping the whole stage to
    interpreted eval. Accumulation runs dimension-by-dimension so every
    (vector, plane) dot keeps DuckDB list_dot_product's left-to-right
    association; sign bits agree bit-exactly with the SQL twin."""
    import numpy as np
    import pandas as pd

    P = np.asarray(planes, dtype=np.float64)
    weights = 1 << np.arange(len(planes), dtype=np.int64)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            D = V[:, 0:1] * P[:, 0][None, :]
            for i in range(1, V.shape[1]):
                D = D + V[:, i : i + 1] * P[:, i][None, :]
            bucket = ((D >= 0) * weights).sum(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "v": pdf["v"], "bucket": bucket}
            )

    return base.mapInPandas(
        gen, schema=f"{id_col} {id_field}, v array<double>, bucket long"
    )


def _sign_bucket_driver(q: list[float], planes: list[list[float]]) -> int:
    """The query row's sign-LSH bucket, computed driver-side with the
    IDENTICAL float64 accumulation order as ``_sign_buckets_arrow``
    (dimension-by-dimension numpy adds over the same plane matrix), so
    serving never needs a full corpus pass just to learn the query's
    bucket — the r13 optimization round removed the second Arrow pass
    ``lsh_topk``/``lsh_topk_multiprobe`` paid for their ``first()``
    (guide §1.2: don't compute things you throw away). One vector is
    one numpy lane of the exact slab the distributed kernel runs, so
    the sign bits agree bit-for-bit by construction."""
    import numpy as np

    P = np.asarray(planes, dtype=np.float64)
    weights = 1 << np.arange(len(planes), dtype=np.int64)
    v = np.asarray(q, dtype=np.float64)
    d = v[0] * P[:, 0]
    for i in range(1, v.shape[0]):
        d = d + v[i] * P[:, i]
    return int(((d >= 0) * weights).sum())


def lsh_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate top-k: probe only the query's sign-LSH
    bucket. The index build is one row-local Arrow stage (no shuffle at
    all, unlike IVF's centroid aggregation); serving fetches the query's
    bucket as a driver scalar and probes with a ``bucket = <b>`` filter —
    on a corpus WRITTEN with its bucket column (the deployment shape),
    that probe is a pushed-down scan predicate skipping ~1-1/2^n_planes
    of the files. Recall depends on n_planes: more planes = smaller
    buckets = faster and less complete (multi-probe — flipping low-margin
    bits — is the standard extension).

    Size ``n_planes`` to the corpus, not by habit: the probed bucket
    holds ~``n / 2^n_planes`` vectors, and a top-``k`` probe needs that
    comfortably above ``k`` (``n_planes <=
    auto_band_planes(n, several*k)``) or the bucket physically cannot
    contain k candidates — the measured failure mode in
    examples/ann_index_tour.py, where 64 buckets over a 500-vector
    corpus leave ~8 candidates per probe. Same knob contract as the
    banded families (SCALING.md).
    """
    planes = _hyperplanes(n_planes)
    id_field = embeddings.schema[id_col].dataType.simpleString()
    e = _sign_buckets_arrow(
        embeddings.select(F.col(id_col), as_double(vec_col).alias("v")),
        planes,
        id_col,
        id_field,
    )
    # query row via a pushed-down id filter on the RAW scan (one O(1)
    # lookup, no Python stage), bucket derived driver-side — before r13
    # this was a ``first()`` on the bucketed frame, i.e. a second full
    # Arrow pass over the corpus per query
    qrow = (
        embeddings.filter(F.col(id_col) == query_vec_id)
        .select(as_double(vec_col).alias("v"))
        .first()
    )
    q = [float(x) for x in qrow["v"]]
    return (
        e.filter(F.col("bucket") == _sign_bucket_driver(q, planes))
        .filter(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col),
            F.round(cosine_lit("v", q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_topk_multiprobe(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe sign-LSH top-k: probe the query's bucket AND every
    bucket at Hamming distance 1 (each single sign bit flipped) —
    n_planes+1 buckets total. The standard recall fix for sign-LSH:
    near neighbors lost to one marginal hyperplane crossing come back,
    at ~(n_planes+1)/2^n_planes of the corpus scanned instead of
    1/2^n_planes. The probe set is computed driver-side from the query's
    bucket (n_planes+1 integer literals), so on a bucket-clustered
    corpus the probe is still a pushed-down ``bucket IN (...)`` scan."""
    planes = _hyperplanes(n_planes)
    id_field = embeddings.schema[id_col].dataType.simpleString()
    e = _sign_buckets_arrow(
        embeddings.select(F.col(id_col), as_double(vec_col).alias("v")),
        planes,
        id_col,
        id_field,
    )
    # same single-pass serving shape as lsh_topk: pushed-down query-row
    # fetch + driver-side bucket (was a full-corpus Arrow first())
    qrow = (
        embeddings.filter(F.col(id_col) == query_vec_id)
        .select(as_double(vec_col).alias("v"))
        .first()
    )
    q = [float(x) for x in qrow["v"]]
    qb = _sign_bucket_driver(q, planes)
    probes = [qb] + [qb ^ (1 << i) for i in range(n_planes)]
    return (
        e.filter(F.col("bucket").isin(probes))
        .filter(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col),
            F.round(cosine_lit("v", q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_oracle_sql(
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 6,
    multiprobe: bool = False,
) -> str:
    """DuckDB twin of :func:`lsh_topk` / :func:`lsh_topk_multiprobe`,
    generated from the same hyperplane literals (list_dot_product is
    left-to-right, the same association as the Arrow bucket stage). The
    multi-probe candidate set "Hamming distance <= 1" is expressed as
    ``xor(bucket, qbucket)`` being 0 or a power of two."""
    planes = _hyperplanes(n_planes)
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(v, {p}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    cos = (
        "list_dot_product(v, qvec) / sqrt(list_dot_product(v, v)"
        " * list_dot_product(qvec, qvec))"
    )
    if multiprobe:
        xors = ", ".join(str(1 << i) for i in range(n_planes))
        probe = f"(bucket = qbucket OR xor(bucket, qbucket) IN ({xors}))"
    else:
        probe = "bucket = qbucket"
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         ({bits}) AS bucket
  FROM embeddings
),
q AS (SELECT v AS qvec, bucket AS qbucket FROM e WHERE vec_id = {query_vec_id})
SELECT vec_id, round({cos}, 6) + 0.0 AS cos_sim
FROM e, q
WHERE {probe} AND vec_id <> {query_vec_id}
ORDER BY cos_sim DESC, vec_id
LIMIT {k}
"""


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    nprobe: int = 1,
) -> DataFrame:
    """IVF-style approximate top-k: probe the ``nprobe`` buckets whose
    centroids are nearest the query (classic IVF recall knob — the r6
    recall eval showed single-bucket probing is the weak spot; nprobe=2
    roughly doubles scanned volume for a structural recall gain, the
    probed set being a superset).

    Index build = one groupBy to average vectors per bucket (posexplode ->
    mean per position -> reassemble ordered). Probe = centroid argmax +
    bucket-pruned brute force. Deterministic, so oracle-checkable; recall
    vs brute force depends on how well buckets reflect geometry.

    Serving shape: the query vector and the probed bucket id are fetched
    as driver-side scalars (two O(1)-result lookups — this is how ANN is
    actually served; the query arrives from outside the corpus anyway).
    Embedding them as literals means the probe compiles to a plain scan
    with a *pushed-down* ``bucket IN (<best nprobe>)`` filter — on a
    corpus partitioned/clustered by bucket, parquet row-group and
    partition pruning skip everything but the probed buckets, which is
    the entire point of IVF at 100 TB (IN-lists push down exactly like
    equality). The earlier broadcast-join formulation could not push
    the probe predicate into the scan and serialized three nested
    broadcast jobs.
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
    # build centroids: mean per (bucket, position), reassembled in order.
    # The distributed part is the aggregation; the result — n_buckets x dim
    # doubles — IS the IVF index metadata, which serving keeps in driver /
    # index memory. Selecting the probe bucket is a Python argmax over it
    # (left-to-right float sums, the same association as the distributed
    # dot), not a Spark job: compiling a 192-term codegen expression to
    # rank 10 rows costs more than the whole lookup.
    pos = e.select(bucket_col, F.posexplode("v").alias("pos", "val"))
    # centroid means and the probe ranking both live on the 6-dp grid:
    # raw means are partial-aggregation-order-dependent doubles, and an
    # unrounded near-tie at the nprobe boundary could flip the probed
    # bucket set between engines/layouts (the repo's raw-doubles rule)
    centroids = (
        pos.groupBy(bucket_col, "pos")
        .agg(F.round(F.avg("val"), 6).alias("mval"))
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
        # floor(x*1e6+0.5)/1e6 == DuckDB round(x, 6) (neardup_pairs note)
        return math.floor(num / (nc * nq) ** 0.5 * 1e6 + 0.5) / 1e6

    # nprobe buckets whose centroids maximize cosine (tiebreak: bucket id)
    ranked = sorted(
        ((row[bucket_col], _cos(list(row["centroid"]))) for row in centroids.collect()),
        key=lambda t: (-t[1], t[0]),
    )
    best = [b for b, _ in ranked[:nprobe]]
    return (
        e.filter(F.col(bucket_col).isin(best))  # pushed-down bucket pruning
        .filter(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col),
            F.round(cosine_lit("v", q), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def random_project(
    emb: DataFrame,
    out_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress embeddings to
    ``out_dim`` coordinates by dotting each vector against ``out_dim``
    fixed pseudo-random hyperplanes (the same deterministic
    :func:`_hyperplanes` family the sign-LSH index uses, so the oracle
    embeds identical literals). The standard cheap dimensionality
    reduction before clustering / coarse ANN when PCA is too expensive
    to fit distributed.

    Returns ``(id_col, p0..p{out_dim-1})`` as RAW doubles — no rounding
    on either engine: accumulation runs dimension-by-dimension (see
    :func:`_sign_buckets_arrow`) so every coordinate keeps DuckDB
    list_dot_product's left-to-right association and is bit-identical
    to the SQL twin, while cross-engine round() of a double is NOT
    tie-stable (the min_cost_supplier_per_part lesson). Row-local: ONE
    Arrow-vectorized narrow stage, no shuffle at all — at 100 TB this
    is a pure map over the corpus."""
    import numpy as np
    import pandas as pd

    planes = _hyperplanes(out_dim)
    P = np.asarray(planes, dtype=np.float64)
    id_field = emb.schema[id_col].dataType.simpleString()
    base = emb.select(F.col(id_col), as_double(vec_col).alias("v"))

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            D = V[:, 0:1] * P[:, 0][None, :]
            for i in range(1, V.shape[1]):
                D = D + V[:, i : i + 1] * P[:, i][None, :]
            out = {id_col: pdf[id_col]}
            for j in range(P.shape[0]):
                out[f"p{j}"] = D[:, j]
            yield pd.DataFrame(out)

    schema = ", ".join(
        [f"{id_col} {id_field}"] + [f"p{j} double" for j in range(out_dim)]
    )
    return base.mapInPandas(gen, schema=schema)


def random_project_oracle_sql(
    out_dim: int = 8, table: str = "embeddings", id_col: str = "vec_id"
) -> str:
    """DuckDB twin of :func:`random_project`: list_dot_product against
    the same hyperplane literals."""
    planes = _hyperplanes(out_dim)
    cols = ",\n       ".join(
        f"list_dot_product(v, {planes[j]!r}) AS p{j}" for j in range(out_dim)
    )
    return f"""
WITH e AS (SELECT {id_col}, embedding::DOUBLE[] AS v FROM {table})
SELECT {id_col},
       {cols}
FROM e
"""


def reference_scrub(
    emb: DataFrame,
    reference: DataFrame,
    theta: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ref_id_col: str = "bench_vec_id",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Semantic scrub against a small REFERENCE set (benchmark
    embeddings): one row per corpus vector whose rounded cosine to any
    reference vector reaches ``theta``, carrying its worst (highest
    cosine, lowest-reference-id tie) match.

    Physical shape: the reference matrix is collected driver-side and
    rides the task closure — the k-means-centroid precedent
    (operators/clustering.py:assign_clusters): reference sets are model
    parameters, small by construction, and a closure literal turns the
    whole scrub into ONE narrow Arrow stage over the corpus scan — no
    join, no shuffle, no per-pair JVM expression tree. (The pure-JVM
    broadcast-join spelling of the same query overflows Janino's 64KB
    method limit — b x 3 unrolled 64-term dots in one filter+project —
    and silently drops the stage to interpreted eval, ~5x slower; the
    kernel's generated code is constant-size.)

    Exactness contract (hash-parity with the DuckDB oracle): the dot
    accumulates dimension-by-dimension left-to-right, the denominator is
    ``sqrt(tt * bb)`` (NOT ``sqrt(tt) * sqrt(bb)`` — different ulps)
    with ``tt`` computed by the same unrolled JVM expression the oracle
    twin mirrors, and ``floor(x*1e6+0.5)/1e6 == round(x, 6)`` for the
    positive cosines that can pass ``theta``."""
    import numpy as np

    ref_rows = sorted(
        (r[0], r[1])
        for r in reference.select(
            F.col(ref_id_col), as_double(vec_col).alias("rv")
        ).collect()
    )
    id_type_early = dict(emb.dtypes)[id_col]
    if not ref_rows:
        # empty reference set: vacuously clean corpus (crawl batches
        # before the first benchmark lands hit this routinely)
        schema = f"{id_col} {id_type_early}, {ref_id_col} bigint, max_cos double"
        return emb.sparkSession.createDataFrame([], schema)
    rids = np.array([rid for rid, _ in ref_rows], dtype=np.int64)
    R = np.array([list(v) for _, v in ref_rows], dtype=np.float64)
    bb = np.zeros(len(ref_rows), dtype=np.float64)
    for i in range(dim):  # left-to-right per-reference self-dot
        bb = bb + R[:, i] * R[:, i]

    v = as_double(vec_col)
    base = emb.select(
        F.col(id_col), v.alias("v"), dot(v, v, dim).alias("tt")
    )
    id_type = dict(base.dtypes)[id_col]

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            D = V[:, 0:1] * R[:, 0][None, :]
            for i in range(1, dim):
                D = D + V[:, i : i + 1] * R[:, i][None, :]
            denom = np.sqrt(pdf["tt"].to_numpy()[:, None] * bb[None, :])
            r = np.floor((D / denom) * 1e6 + 0.5) / 1e6
            best = np.argmax(r, axis=1)  # first max = lowest ref id
            best_cos = r[np.arange(len(pdf)), best]
            keep = best_cos >= theta
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[keep],
                    ref_id_col: rids[best[keep]],
                    "max_cos": best_cos[keep],
                }
            )

    return base.mapInPandas(
        kernel,
        schema=f"{id_col} {id_type}, {ref_id_col} bigint, max_cos double",
    )


# --- product quantization (IVF-PQ's compression half) -----------------------
def _pq_codes(V, books, subdim: int):
    """Per-subspace nearest-codeword codes for a slab ``V`` (n x dim
    float64): for each subspace the scores are the inner-product form of
    L2 argmin, ``round(sv . c - 0.5 * c . c, 6)``, computed with the
    module's slab conventions — accumulation loops DIMENSION-BY-DIMENSION
    so every (row, codeword) sum keeps the left-to-right association of
    DuckDB's ``list_dot_product``, and ``floor(x*1e6 + 0.5)/1e6``
    reproduces DuckDB ``round(x, 6)`` exactly (see
    :func:`neardup_pairs`). ``np.argmax`` returns the FIRST max, which
    IS the lowest-cid tiebreak. Returns an (n, m) int array."""
    import numpy as np

    m = len(books)
    codes = np.empty((V.shape[0], m), dtype=np.int64)
    for s in range(m):
        Vs = V[:, s * subdim : (s + 1) * subdim]
        C = np.asarray(books[s], dtype=np.float64)  # k x subdim
        cc = np.zeros(C.shape[0], dtype=np.float64)
        S = Vs[:, 0:1] * C[:, 0][None, :]
        cc = cc + C[:, 0] * C[:, 0]
        for i in range(1, subdim):
            S = S + Vs[:, i : i + 1] * C[:, i][None, :]
            cc = cc + C[:, i] * C[:, i]
        r = np.floor((S - 0.5 * cc[None, :]) * 1e6 + 0.5) / 1e6
        codes[:, s] = np.argmax(r, axis=1)
    return codes


def pq_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    m: int = 16,
    codebook_k: int = 16,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
    query_vec: list | None = None,
) -> DataFrame:
    """Product-quantization ANN (Jegou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011 — the compression half of
    FAISS's IVF-PQ): the space splits into ``m`` orthogonal subspaces,
    each gets an independent ``codebook_k``-word L2 codebook (Lloyd,
    deterministic lowest-id seeds), and every corpus vector is ENCODED
    as its per-subspace nearest codeword — ``m * log2(codebook_k)`` bits
    (64 at the defaults) instead of ``dim * 64`` (4096): the memory move
    that lets a 100 TB corpus' index live in RAM. Search is asymmetric
    distance computation (ADC): the query stays exact and scores each
    row's RECONSTRUCTION (concatenated codewords) by rounded cosine,
    top-k with id tiebreak (reconstructions collide across rows by
    design — only ``codebook_k ** m`` codes exist — so the tiebreak
    does real work).

    Engine shape: encode-and-score is the module's vectorized-slab hot
    path (:func:`neardup_pairs` precedent — three pure-DataFrame
    formulations were measured first: per-codeword unrolled expressions
    cost 40+ s of Catalyst ANALYSIS at m=k=16; a broadcast-join +
    min(struct) argmax re-paid a broadcast build and an argmax shuffle
    per action; ``transform``-lambda scoring runs interpreted,
    CodegenFallback, ~2x slower still). The codebook is m x k x subdim
    driver floats — index METADATA riding the task closure; each task
    encodes its slab in numpy with the documented bit-parity
    conventions (dimension-ordered accumulation == list_dot_product
    association; ``floor(x*1e6+0.5)/1e6`` == DuckDB ``round(x, 6)``;
    ``np.argmax`` first-max == lowest-cid ties). Per Lloyd round the
    kernel emits per-(subspace, codeword) PARTIAL sums, so the only
    shuffle is m x k x (subdim + 1) doubles per task — map-side
    combined by construction; the final pass is one map stage feeding a
    global TopK. Job count independent of ``m``. Deterministic on the
    shared 6-dp grid: the DuckDB oracle (:func:`pq_oracle_sql`) replays
    training, encoding and ADC exactly (differentially verified at
    sf0.001/0.01/0.1)."""
    subdim = dim // m
    e = embeddings.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("v")
    ).persist()
    # ADVICE r7: everything from here to the returned plan runs under
    # try/finally — a failure during query fetch / seeding / Lloyd
    # training must not leak the corpus-sized cache (the same
    # exception-path class fixed in pagerank/connected_components).
    try:
        return _pq_topk_body(
            embeddings, e, query_vec_id, k, m, codebook_k, n_iter,
            id_col, dim, subdim, query_vec,
        )
    finally:
        e.unpersist()


def _pq_topk_body(
    embeddings: DataFrame,
    e: DataFrame,
    query_vec_id,
    k: int,
    m: int,
    codebook_k: int,
    n_iter: int,
    id_col: str,
    dim: int,
    subdim: int,
    query_vec: list | None,
) -> DataFrame:
    import numpy as np
    import pandas as pd

    id_type = dict(embeddings.dtypes)[id_col]
    # ``query_vec`` lets a caller that already fetched the query row
    # (pq_rerank_topk) skip a redundant full-scan first() job
    if query_vec is not None:
        q = [float(x) for x in query_vec]
    else:
        qrow = e.filter(F.col("id") == query_vec_id).first()
        if qrow is None:
            raise ValueError(
                f"pq_topk: {id_col}={query_vec_id!r} not in the corpus"
            )
        q = [float(x) for x in qrow["v"]]
    # one seed collect serves every subspace: the codebook_k lowest-id
    # rows (a TopK plan, never a full sort), sliced driver-side. A
    # corpus smaller than codebook_k trains a smaller codebook (the
    # oracle's LIMIT degrades identically).
    seed_rows = [
        list(r["v"])
        for r in e.orderBy("id").limit(codebook_k).select("v").collect()
    ]
    codebook_k = min(codebook_k, len(seed_rows))
    books: list[list[list[float]]] = [
        [row[s * subdim : (s + 1) * subdim] for row in seed_rows]
        for s in range(m)
    ]

    for _ in range(n_iter):
        bks = [list(map(list, b)) for b in books]

        def partials(batches, _bks=bks):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
                )
                codes = _pq_codes(V, _bks, subdim)
                out = []
                for s in range(m):
                    Vs = V[:, s * subdim : (s + 1) * subdim]
                    for cid in np.unique(codes[:, s]):
                        mask = codes[:, s] == cid
                        sums = Vs[mask].sum(axis=0)
                        for pos in range(subdim):
                            out.append(
                                (s, int(cid), pos, sums[pos], int(mask.sum()))
                            )
                yield pd.DataFrame(
                    out, columns=["s", "cid", "pos", "sm", "cnt"]
                )

        rows = (
            e.mapInPandas(
                partials,
                schema="s int, cid int, pos int, sm double, cnt long",
            )
            .groupBy("s", "cid", "pos")
            # the rounded mean is computed ENGINE-side (Spark round is
            # BigDecimal HALF_UP == DuckDB round half-away-from-zero for
            # every non-boundary double), never Python banker's rounding
            .agg(F.round(F.sum("sm") / F.sum("cnt"), 6).alias("mv"))
            .collect()
        )
        acc: dict[tuple[int, int], list[float]] = {}
        for r in rows:
            acc.setdefault(
                (int(r["s"]), int(r["cid"])), [0.0] * subdim
            )[int(r["pos"])] = float(r["mv"])
        books = [
            [acc.get((s, cid), books[s][cid]) for cid in range(codebook_k)]
            for s in range(m)
        ]

    # encode + reconstruct + ADC in one slab pass; global TopK after
    bks = [list(map(list, b)) for b in books]
    qv = np.asarray(q, dtype=np.float64)
    qq = 0.0
    for x in q:  # left-to-right, matching list_dot_product(q, q)
        qq += x * x

    def adc(batches, _bks=bks):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            codes = _pq_codes(V, _bks, subdim)
            n = V.shape[0]
            R = np.empty((n, dim), dtype=np.float64)
            for s in range(m):
                C = np.asarray(_bks[s], dtype=np.float64)
                R[:, s * subdim : (s + 1) * subdim] = C[codes[:, s]]
            num = R[:, 0] * qv[0]
            rr = R[:, 0] * R[:, 0]
            for i in range(1, dim):  # dimension-ordered: flat l-to-r sums
                num = num + R[:, i] * qv[i]
                rr = rr + R[:, i] * R[:, i]
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = num / (np.sqrt(qq) * np.sqrt(rr))
                r = np.floor(cos * 1e6 + 0.5) / 1e6
            yield pd.DataFrame({"id": pdf["id"], "approx_cos": r})

    out = (
        e.filter(F.col("id") != query_vec_id)
        .mapInPandas(adc, schema=f"id {id_type}, approx_cos double")
        .orderBy(F.col("approx_cos").desc(), "id")
        .limit(k)
        .select(F.col("id").alias(id_col), "approx_cos")
    )
    return out



def pq_rerank_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    shortlist: int = 50,
    m: int = 16,
    codebook_k: int = 16,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """The deployed PQ serving shape: ADC over the compressed codes
    produces a ``shortlist``-sized candidate set (cheap — the index is
    64-bit codes), then ONLY those candidates are re-scored with the
    exact vectors and the true top-k returned. This is how FAISS-style
    systems spend their memory/recall budget: the full-precision
    vectors are touched for ``shortlist`` rows, not the corpus. Recall
    is bounded by shortlist membership only — the re-rank ordering is
    exact (floor pinned in tests/test_recall_floors.py, measured well
    above pure-ADC top-k).

    Scale shape: everything in :func:`pq_topk` plus one k-row broadcast
    semi-join (the shortlist ids) against the corpus and a ``shortlist``-
    row exact rescore — O(shortlist * dim) extra work total."""
    e = embeddings.select(
        F.col(id_col), as_double(vec_col).alias("v")
    )
    q = [
        float(x)
        for x in e.filter(F.col(id_col) == query_vec_id).first()["v"]
    ]
    cand = pq_topk(
        embeddings,
        query_vec_id=query_vec_id,
        k=shortlist,
        m=m,
        codebook_k=codebook_k,
        n_iter=n_iter,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        query_vec=q,  # no second full-scan first() job
    ).select(id_col)
    # folded form of dot(qvec, v) / (sqrt(dot(qvec, qvec)) * sqrt(dot(v, v)))
    # with qvec literal: the query self-dot and its sqrt are the scalars
    # Catalyst would fold to (math.sqrt is the same correctly-rounded
    # IEEE op as the JVM's) — optimized plan byte-identical, build ~2 ms
    qn = _lit_d(math.sqrt(_self_dot([float(x) for x in q])))
    return (
        e.join(F.broadcast(cand), id_col)
        .select(
            id_col,
            F.round(
                F.expr(
                    f"({dot_lit_sql('v', q, lit_first=True)})"
                    f" / ({qn} * SQRT(({dot_sql('v', 'v', dim)})))"
                ),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def pq_rerank_oracle_sql(
    query_vec_id: int = 0,
    k: int = 10,
    shortlist: int = 50,
    m: int = 16,
    codebook_k: int = 16,
    n_iter: int = 1,
    dim: int = EMBED_DIM,
) -> str:
    """Oracle for :func:`pq_rerank_topk`: the full PQ statement as a
    shortlist CTE, then the exact rounded-cosine rescore of exactly
    those ids."""
    inner = pq_oracle_sql(
        query_vec_id=query_vec_id,
        k=shortlist,
        m=m,
        codebook_k=codebook_k,
        n_iter=n_iter,
        dim=dim,
    )
    return f"""
WITH pq AS ({inner}),
ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qv AS (SELECT v FROM ev WHERE vec_id = {query_vec_id})
SELECT ev.vec_id,
       round(list_dot_product(qv.v, ev.v) /
             (sqrt(list_dot_product(qv.v, qv.v)) *
              sqrt(list_dot_product(ev.v, ev.v))), 6) AS cos_sim
FROM ev JOIN pq USING (vec_id), qv
ORDER BY cos_sim DESC, ev.vec_id
LIMIT {k}
"""


def pq_oracle_sql(
    query_vec_id: int = 0,
    k: int = 10,
    m: int = 16,
    codebook_k: int = 16,
    n_iter: int = 1,
    dim: int = EMBED_DIM,
) -> str:
    """DuckDB CTE chain replaying :func:`pq_topk` exactly: same seed
    rule, same inner-product-form L2 assignment on the 6-dp grid with
    lowest-cid ties, same plain-mean update, same ADC cosine. Mirrors
    the :func:`clustering.kmeans_oracle_ctes` convention."""
    subdim = dim // m
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        f"q AS (SELECT v FROM e WHERE vec_id = {query_vec_id})",
    ]
    score = "round(list_dot_product(sv, c) - 0.5 * list_dot_product(c, c), 6)"
    for s in range(m):
        lo, hi = s * subdim + 1, (s + 1) * subdim
        parts.append(f"s{s} AS (SELECT vec_id, v[{lo}:{hi}] AS sv FROM e)")
        prev = f"k{s}_seed"
        parts.append(
            f"{prev} AS (SELECT row_number() OVER (ORDER BY vec_id) - 1"
            f" AS cid, sv AS c FROM (SELECT vec_id, sv FROM s{s}"
            f" ORDER BY vec_id LIMIT {codebook_k}) t)"
        )
        for it in range(n_iter):
            parts.append(
                f"k{s}_a{it} AS (SELECT vec_id, sv, cid, {score} AS sc"
                f" FROM s{s} CROSS JOIN {prev})"
            )
            parts.append(
                f"k{s}_b{it} AS (SELECT vec_id, sv, cid FROM (SELECT *,"
                " row_number() OVER (PARTITION BY vec_id"
                f" ORDER BY sc DESC, cid) AS rn FROM k{s}_a{it}) t"
                " WHERE rn = 1)"
            )
            upd = (
                "SELECT cid, list(mv ORDER BY dim) AS gc FROM"
                " (SELECT cid, dim, round(avg(val), 6) AS mv FROM"
                " (SELECT cid, unnest(sv) AS val,"
                f" generate_subscripts(sv, 1) AS dim FROM k{s}_b{it}) u"
                " GROUP BY cid, dim) g GROUP BY cid"
            )
            old = prev
            prev = f"k{s}_c{it}"
            parts.append(
                # a cluster that lost all members keeps its previous
                # codeword (same carry as the engine's acc.get fallback)
                f"{prev} AS (SELECT sd.cid, coalesce(g.gc, sd.c) AS c"
                f" FROM {old} sd LEFT JOIN ({upd}) g USING (cid))"
            )
        parts.append(
            f"k{s}_enc0 AS (SELECT vec_id, cid, c, {score} AS sc"
            f" FROM s{s} CROSS JOIN {prev})"
        )
        parts.append(
            f"k{s}_enc AS (SELECT vec_id, c AS cw{s} FROM (SELECT *,"
            " row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY sc DESC, cid) AS rn FROM k{s}_enc0) t WHERE rn = 1)"
        )
    cat = " || ".join(f"cw{s}" for s in range(m))
    joins = "k0_enc" + "".join(
        f" JOIN k{s}_enc USING (vec_id)" for s in range(1, m)
    )
    parts.append(f"rec AS (SELECT vec_id, {cat} AS r FROM {joins})")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id,
       round(list_dot_product(q.v, r) /
             (sqrt(list_dot_product(q.v, q.v)) *
              sqrt(list_dot_product(r, r))), 6) AS approx_cos
FROM rec, q
WHERE vec_id != {query_vec_id}
ORDER BY approx_cos DESC, vec_id
LIMIT {k}
"""
    )
