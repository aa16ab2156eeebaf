"""Distributed spherical k-means and SemDeDup-style semantic dedup.

K-means over an embedding column is the index-build / corpus-curation
workhorse (IVF coarse quantizers, SemDeDup's cluster stage, diversity
sampling). The Lloyd iteration maps cleanly onto DataFrame ops:

- **norms once**: each row carries its scalar L2 norm; every cosine
  downstream is ONE unrolled 64-term dot divided by the norm product.
  Two formulations were rejected on measurement: the naive
  ``dot/sqrt(dot*dot)`` 3-dot form exceeds janino's 64 KB method limit
  inside the pair join (silent CodegenFallback, ~20x slower), and a
  *constructed* unit-vector array column is worse — Catalyst's
  extract-value simplification inlines the 64-element array build into
  every ``element_at``, nesting the norm expression inside each of the
  64 dot terms (~O(dim^2 * k) expression nodes) until the optimizer
  itself OOMs. A scalar norm column + post-sum division keeps every
  expression linear in dim and codegen-compiled;
- **assignment** is a narrow Arrow-vectorized stage (no join, no
  shuffle): the normalized centroid matrix rides in the task closure
  and each batch computes all k cosines with dimension-by-dimension
  numpy accumulation — constant-size generated code, measured 5x
  faster than the equivalent k unrolled JVM dot expressions, which
  re-pay codegen compilation on every Lloyd action;
- **update** is one hash aggregation in long format (posexplode ->
  mean of val/vnorm per (cluster, dim)) — map-side partials reduce the
  shuffle to k x dim doubles per executor, independent of row count;
- the driver only ever holds the k x dim centroid matrix (metadata-
  sized, like any k-means implementation — MLlib does the same), never
  row data.

At 100 TB the assignment stage is embarrassingly parallel and the
update shuffle moves ``executors x k x dim`` doubles — both scale-safe.
MLlib's KMeans is not used because its random init + Euclidean path is
neither deterministic across engines nor oracle-expressible; this
formulation is bit-reproducible: centroids are rounded to 6 decimals
each iteration and re-normalized with the same left-to-right float
arithmetic on both engines, and cosines are rounded before the argmax
so assignment ties break identically (lowest centroid id).

SemDeDup (Abbas et al. 2023, public arXiv 2303.09540): cluster the
corpus, then drop near-duplicate members *within* each cluster — the
cluster key turns the quadratic all-pairs problem into per-cluster
blocks. The intra-cluster pair scan here is a self-equi-join on
``cluster`` (shuffles only the cluster key, never all pairs); k is
chosen so clusters stay ~1e3-1e4 vectors, which is exactly how the
paper runs it at LAION scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.operators.similarity import (
    EMBED_DIM,
    as_double,
    dot,
    dot_lit_sql,
)

Centroid = tuple[int, list[float]]


def _py_dot(a: list[float], b: list[float]) -> float:
    """Left-to-right double sum — the same association as the unrolled
    Spark expression and DuckDB's list_dot_product, so constants folded
    driver-side are bit-identical to both engines' columnar results."""
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def _py_normalize(c: list[float]) -> list[float]:
    """Driver-side unit normalization — the exact mirror of DuckDB's
    ``list_transform(c, x -> x / sqrt(list_dot_product(c, c)))``."""
    norm = math.sqrt(_py_dot(c, c))
    return [x / norm for x in c]


def with_norms(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """(id, v, vnorm): the double-cast vector and its scalar L2 norm —
    the per-row precompute that makes every later cosine one dot and
    one division."""
    v = as_double(vec_col)
    return df.select(
        F.col(id_col),
        v.alias("v"),
        F.sqrt(dot(v, v, dim)).alias("vnorm"),
    )


def assign_clusters(
    dfn: DataFrame,
    centroids: list[Centroid],
    dim: int = EMBED_DIM,
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment by cosine over a :func:`with_norms`
    frame: a NARROW Arrow-vectorized stage — no join, no shuffle, no
    driver involvement; the centroid matrix rides in the task closure.

    Adds ``cluster`` (int) and ``cos_sim`` (double, rounded to 6
    decimals). Centroids are normalized driver-side; the batch kernel
    accumulates the k dot products dimension-by-dimension (the
    left-to-right association of DuckDB's ``list_dot_product``) and
    divides by the JVM-computed ``vnorm``, so cosines are bit-identical
    to the oracle; ``floor(x*1e6+0.5)/1e6`` == ``round(x, 6)``. The
    argmax takes the FIRST maximum over centroids ordered by ascending
    cid — the exact mirror of the oracle's ``ORDER BY cos DESC, cid``.

    (A JVM unrolled-expression variant was measured 5x slower at equal
    results: k 64-term dot trees re-pay whole-stage codegen compilation
    on every Lloyd action, while this kernel's generated code is
    constant-size.)
    """
    import numpy as np

    ordered = sorted(centroids, key=lambda c: c[0])
    NC = np.array([_py_normalize(c) for _, c in ordered], dtype=np.float64)
    cids = np.array([cid for cid, _ in ordered], dtype=np.int32)
    id_type = dict(dfn.dtypes)[id_col]

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            D = V[:, 0:1] * NC[:, 0][None, :]
            for i in range(1, dim):
                D = D + V[:, i : i + 1] * NC[:, i][None, :]
            cos = D / pdf["vnorm"].to_numpy()[:, None]
            r = np.floor(cos * 1e6 + 0.5) / 1e6
            j = np.argmax(r, axis=1)
            yield pdf.assign(
                cluster=cids[j], cos_sim=r[np.arange(len(pdf)), j]
            )

    return dfn.mapInPandas(
        kernel,
        schema=(
            f"{id_col} {id_type}, v array<double>, vnorm double,"
            " cluster int, cos_sim double"
        ),
    )


def seed_centroids(
    dfn: DataFrame, k: int, id_col: str = "vec_id"
) -> list[Centroid]:
    """Deterministic init: the k lowest-id vectors, cid = rank 0..k-1.
    (k driver rows — the centroid matrix is metadata, not row data.)
    Raw vectors; :func:`assign_clusters` normalizes driver-side."""
    rows = dfn.orderBy(id_col).limit(k).select("v").collect()
    return [(i, list(r["v"])) for i, r in enumerate(rows)]


def update_centroids(
    assigned: DataFrame,
    old: list[Centroid],
    dim: int = EMBED_DIM,
    round_dp: int = 6,
) -> list[Centroid]:
    """One Lloyd update: per-cluster element-wise mean of the UNIT
    vectors (val / vnorm, divided after the explode so the norm stays a
    pass-through scalar column), rounded to the shared 6-decimal grid.
    Long-format aggregation: map-side partials reduce the shuffle to
    k x dim doubles per executor; k x dim result rows to the driver.
    A cluster that lost all members keeps its previous centroid; the
    oracle applies the identical carry (LEFT JOIN + coalesce against the
    previous codebook CTE), so engine and oracle agree cid-for-cid even
    on the empty-cluster edge."""
    rows = (
        assigned.select(
            "cluster", "vnorm", F.posexplode("v").alias("dim", "val")
        )
        .groupBy("cluster", "dim")
        .agg(F.round(F.avg(F.col("val") / F.col("vnorm")), round_dp).alias("m"))
        .collect()
    )
    acc: dict[int, list[float]] = {}
    for r in rows:
        acc.setdefault(int(r["cluster"]), [0.0] * dim)[int(r["dim"])] = r["m"]
    return [(cid, acc.get(cid, cvec)) for cid, cvec in old]


def kmeans(
    df: DataFrame,
    k: int = 4,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
) -> tuple[DataFrame, list[Centroid]]:
    """Spherical k-means: compute norms once, seed with the k lowest-id
    vectors, run ``n_iter`` assign+update rounds, return the final
    assignment frame (id, v, vnorm, cluster, cos_sim) and the centroids
    that produced it."""
    dfn = with_norms(df, id_col=id_col, vec_col=vec_col, dim=dim)
    cents = seed_centroids(dfn, k, id_col=id_col)
    for _ in range(n_iter):
        assigned = assign_clusters(dfn, cents, dim=dim)
        cents = update_centroids(assigned, cents, dim=dim)
    return assign_clusters(dfn, cents, dim=dim), cents


def kmeans_oracle_ctes(k: int = 4, n_iter: int = 1) -> str:
    """DuckDB CTE chain replicating :func:`kmeans` exactly: same seed
    rule, same norms-once / divide-after-the-sum cosine, same 6-decimal
    centroid grid, same rounded-cosine argmax with lowest-cid ties.
    Ends at ``b{n_iter}`` = (vec_id, v, vnorm, cid, cos), the final
    assignment."""
    cos = (
        "round(list_dot_product(v,"
        " list_transform(c, x -> x / sqrt(list_dot_product(c, c))))"
        " / vnorm, 6)"
    )
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,"
        " sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),"
        " CAST(embedding AS DOUBLE[]))) AS vnorm FROM embeddings)",
        "seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,"
        f" v AS c FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}) s)",
    ]
    prev = "seeds"
    for it in range(n_iter + 1):
        parts.append(
            f"a{it} AS (SELECT vec_id, v, vnorm, cid, {cos} AS cos"
            f" FROM e CROSS JOIN {prev})"
        )
        parts.append(
            f"b{it} AS (SELECT vec_id, v, vnorm, cid, cos FROM (SELECT *,"
            " row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid)"
            f" AS rn FROM a{it}) t WHERE rn = 1)"
        )
        if it < n_iter:
            upd = (
                "SELECT cid, list(m ORDER BY dim) AS gc FROM"
                " (SELECT cid, dim, round(avg(val / vnorm), 6) AS m FROM"
                " (SELECT cid, vnorm, unnest(v) AS val,"
                f" generate_subscripts(v, 1) AS dim FROM b{it}) u"
                " GROUP BY cid, dim) g GROUP BY cid"
            )
            parts.append(
                # a cluster that lost every member keeps its previous
                # centroid — the same carry rule as update_centroids, so
                # the oracle's codebook (and anything ranking it, e.g.
                # the IVF probe) matches the engine's cid-for-cid
                f"c{it + 1} AS (SELECT sd.cid, coalesce(g.gc, sd.c) AS c"
                f" FROM {prev} sd LEFT JOIN ({upd}) g USING (cid))"
            )
            prev = f"c{it + 1}"
    return "WITH " + ",\n".join(parts)


def ivf_kmeans_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """IVF top-k with a GEOMETRY-ALIGNED coarse quantizer: spherical
    k-means buckets instead of a metadata column (``ivf_topk`` over the
    ``label`` column measures recall ~= fraction-of-corpus-scanned —
    labels are orthogonal to embedding geometry, so probing 2 of 10
    label buckets recovers ~2/10 of the true neighbors; k-means buckets
    put near neighbors in the same or adjacent cells, which is the
    whole point of IVF — tests/test_recall_floors.py pins the gap).

    Index build = :func:`kmeans` (norms once, Arrow assignment, one
    hash-agg Lloyd update; driver holds only the k x dim centroid
    matrix). Probe = rank centroids by cosine-to-query DRIVER-side
    (metadata-sized, mirroring the oracle's ``ORDER BY cos DESC, cid``
    with the same floor-round and left-to-right float association as
    :func:`assign_clusters`), then brute-force only the ``nprobe``
    probed cells. In this one-shot evaluation the assignment is
    computed inline, so the probe filter prunes compute, not I/O; the
    production layout materializes the assignment partitioned/bucketed
    by cell, where ``cluster IN (<probes>)`` becomes partition pruning
    at the scan — the serving shape at 100 TB."""
    assigned, cents = kmeans(
        embeddings,
        k=n_clusters,
        n_iter=n_iter,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
    )
    # the query row comes from the pre-assignment norms frame: fetching
    # it from `assigned` would run the Arrow assignment kernel over the
    # whole corpus a second time just to read two columns (with_norms'
    # v/vnorm expressions are identical, so the values are too)
    qrow = (
        with_norms(embeddings, id_col=id_col, vec_col=vec_col, dim=dim)
        .filter(F.col(id_col) == query_vec_id)
        .select("v", "vnorm")
        .first()
    )
    if qrow is None:
        raise ValueError(
            f"ivf_kmeans_topk: {id_col}={query_vec_id!r} not in the corpus"
        )
    qv, qnorm = list(qrow["v"]), float(qrow["vnorm"])
    scored = []
    for cid, c in cents:
        cn = _py_normalize(c)
        cos = math.floor(_py_dot(qv, cn) / qnorm * 1e6 + 0.5) / 1e6
        scored.append((cid, cos))
    probes = [cid for cid, _ in sorted(scored, key=lambda t: (-t[1], t[0]))][
        :nprobe
    ]
    # folded form of dot(v, <literal qvec>): element_at on the literal
    # array is pre-folded to scalar literals — one SQL parse instead of
    # ~130 py4j round-trips (plan byte-identical, see similarity.py)
    qdot = F.expr(dot_lit_sql("v", [float(x) for x in qv]))
    return (
        assigned.filter(F.col("cluster").isin(probes))
        .filter(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col),
            F.round(
                qdot / (F.col("vnorm") * F.lit(qnorm)),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_kmeans_oracle_sql(
    query_vec_id: int = 0,
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 2,
    n_iter: int = 1,
) -> str:
    """DuckDB twin of :func:`ivf_kmeans_topk`: the shared k-means CTE
    chain, the identical probe ranking (round-6 cosine of the
    unit-normalized post-update centroids against the query, ties by
    cid), and the identical in-cell cosine. Requires ``n_iter >= 1``
    (the probe reads the ``c{n_iter}`` centroid CTE)."""
    assert n_iter >= 1
    unit = "list_transform(c, x -> x / sqrt(list_dot_product(c, c)))"
    return f"""{kmeans_oracle_ctes(k=n_clusters, n_iter=n_iter)},
q AS (SELECT v AS qvec, vnorm AS qnorm FROM e WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT cid FROM c{n_iter}, q
  ORDER BY round(list_dot_product(qvec, {unit}) / qnorm, 6) DESC, cid
  LIMIT {nprobe}
)
SELECT vec_id, round(list_dot_product(v, qvec) / (vnorm * qnorm), 6) + 0.0 AS cos_sim
FROM b{n_iter} JOIN probe USING (cid), q
WHERE vec_id <> {query_vec_id}
ORDER BY cos_sim DESC, vec_id
LIMIT {k}
"""


def semdedup_prune(
    assigned: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """SemDeDup drop list: within each cluster, a vector is dropped when
    a lower-id cluster-mate has cosine >= threshold (compared on the
    6-decimal-rounded value, so membership is engine-deterministic).
    Input is a :func:`kmeans` assignment frame.

    Physical shape: ONE shuffle on the cluster key, then the same
    vectorized numpy slab kernel as ``similarity.neardup_pairs_blocked``
    runs per cluster group (a JVM self-join was measured: the pair
    expression overflows janino's 64 KB method limit and the whole
    stage falls back to interpreted eval, ~25x slower than the Arrow
    batch). Dimension-by-dimension accumulation keeps bit-parity with
    DuckDB's ``list_dot_product``; ``floor(x*1e6+0.5)/1e6`` ==
    ``round(x, 6)``.

    Returns (cluster, vec_id, n_dups, max_cos) for every dropped
    vector. Candidate volume is sum(|cluster|^2) — the SemDeDup
    contract; at scale k is sized so each cluster slab fits an executor
    Arrow batch (~1e3-1e4 vectors), exactly how the paper runs it.
    """
    import numpy as np
    import pandas as pd

    id_type = dict(assigned.dtypes)[id_col]
    thr = float(threshold)

    def cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        A = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        ids = pdf[id_col].to_numpy()
        S = A[:, 0:1] * A[:, 0][None, :]
        nrm = A[:, 0] * A[:, 0]
        for i in range(1, A.shape[1]):
            S = S + A[:, i : i + 1] * A[:, i][None, :]
            nrm = nrm + A[:, i] * A[:, i]
        cos = S / np.sqrt(nrm[:, None] * nrm[None, :])
        r = np.floor(cos * 1e6 + 0.5) / 1e6
        keep = (ids[:, None] < ids[None, :]) & (r >= thr)
        n_dups = keep.sum(axis=0)
        hit = n_dups > 0
        max_cos = np.where(keep, r, -np.inf).max(axis=0, initial=-np.inf)
        return pd.DataFrame(
            {
                "cluster": pdf["cluster"].to_numpy()[hit],
                "vec_id": ids[hit],
                "n_dups": n_dups[hit].astype("int64"),
                "max_cos": max_cos[hit],
            }
        )

    return (
        assigned.select("cluster", F.col(id_col), "v")
        .groupBy("cluster")
        .applyInPandas(
            cluster_pairs,
            schema=(
                f"cluster int, vec_id {id_type}, n_dups long, max_cos double"
            ),
        )
    )


def semdedup_oracle_sql(
    k: int = 4, n_iter: int = 1, threshold: float = 0.3
) -> str:
    """DuckDB twin of kmeans(n_iter) + :func:`semdedup_prune`. The pair
    cosine uses the ``sqrt(dot * dot)`` denominator — the association
    the slab kernel computes (``sqrt(nrm_a * nrm_b)``), which differs
    in the last ulp from ``vnorm_a * vnorm_b``."""
    b = f"b{n_iter}"
    cos = (
        "round(list_dot_product(x.v, y.v) / sqrt(list_dot_product(x.v, x.v)"
        " * list_dot_product(y.v, y.v)), 6)"
    )
    return f"""{kmeans_oracle_ctes(k=k, n_iter=n_iter)},
pairs AS (
  SELECT y.vec_id AS vec_id, CAST(x.cid AS INTEGER) AS cluster,
         {cos} AS cos
  FROM {b} x JOIN {b} y ON x.cid = y.cid AND x.vec_id < y.vec_id
  WHERE {cos} >= {threshold}
)
SELECT cluster, vec_id, count(*) AS n_dups, max(cos) AS max_cos
FROM pairs GROUP BY vec_id, cluster
"""
