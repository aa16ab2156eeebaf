"""Training-data pipeline queries over ``documents`` and ``embeddings``:
dedup (exact / fingerprint / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search (brute-force + IVF), text analysis, multimodal metadata.

Each query pairs with DuckDB oracle SQL. Hashing is md5 end-to-end (bit-
identical across engines); float outputs are rounded; thresholds are
applied to the *rounded* values on both sides so set membership is
deterministic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.operators import clustering as C
from nyc_taxi_data_pipeline_elt_spark.operators import dedup as D
from nyc_taxi_data_pipeline_elt_spark.operators import sampling as M
from nyc_taxi_data_pipeline_elt_spark.operators import similarity as S
from nyc_taxi_data_pipeline_elt_spark.operators import text as X
from nyc_taxi_data_pipeline_elt_spark.operators import multimodal as MM
from nyc_taxi_data_pipeline_elt_spark.operators.multimodal import attach_payload
from nyc_taxi_data_pipeline_elt_spark.session import tune
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table


# --- dedup -------------------------------------------------------------------
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup_groups(docs)


DEDUP_EXACT_ORACLE = """
SELECT min(doc_id) AS keep_doc_id,
       count(*) AS n_copies,
       md5(text) AS text_hash
FROM documents
GROUP BY text
"""


def dedup_fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-collision dedup: identical sorted-distinct-token sets collide."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", X.fingerprint("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_docs"))
    )


DEDUP_FINGERPRINT_ORACLE = """
SELECT md5(array_to_string(list_sort(list_distinct(
         string_split_regex(trim(lower(text)), '\\s+'))), ' ')) AS fp,
       min(doc_id) AS keep_doc_id,
       count(*) AS n_docs
FROM documents
GROUP BY 1
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs)


def _minhash_oracle(table: str = "documents") -> str:
    sig_cols = ",\n         ".join(
        f"list_min(list_transform(shingles, s -> md5('{seed}|' || s))) AS mh{seed}"
        for seed in range(D.MINHASH_K)
    )
    band_rows = []
    for b in range(D.LSH_BANDS):
        cols = " || ".join(f"mh{b * D.LSH_ROWS + r}" for r in range(D.LSH_ROWS))
        band_rows.append(f"SELECT doc_id, {b} AS band_idx, md5({cols}) AS band_key FROM sig")
    bands_union = "\n  UNION ALL\n  ".join(band_rows)
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM {table}
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct(list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
              ELSE [] END AS shingles
  FROM toks
), sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM sh WHERE len(shingles) > 0
), banded AS (
  {bands_union}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
 AND a.doc_id < b.doc_id
"""


def dedup_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-bucket-capped LSH candidate path
    (operators/dedup.py:minhash_lsh_pairs(max_bucket_size=2)) — the
    100 TB-production form: band buckets above the cap emit O(c) star
    edges around the bucket-min hub instead of O(c^2) pairs, preserving
    the candidate graph's connected components exactly. cap=2 so the
    fixture's size-3 buckets actually exercise the star branch; the
    oracle replays the identical cap arithmetic in SQL, so the driver
    hash-checks the CAPPED semantics, not just the exact path."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, max_bucket_size=2)


def _minhash_capped_oracle(cap: int, table: str = "documents") -> str:
    base = _minhash_oracle(table)
    head, _, _tail = base.rpartition("SELECT DISTINCT")
    return f"""{head}, sizes AS (
  SELECT band_idx, band_key, count(*) AS bsz, min(doc_id) AS hub
  FROM banded GROUP BY 1, 2
), tagged AS (
  SELECT banded.doc_id, banded.band_idx, banded.band_key, s.bsz, s.hub
  FROM banded JOIN sizes s USING (band_idx, band_key)
), small_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM tagged a JOIN tagged b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
  WHERE a.bsz <= {cap}
), star_pairs AS (
  SELECT least(hub, doc_id) AS doc_a, greatest(hub, doc_id) AS doc_b
  FROM tagged WHERE bsz > {cap} AND doc_id <> hub
)
SELECT DISTINCT doc_a, doc_b FROM (
  SELECT * FROM small_pairs UNION ALL SELECT * FROM star_pairs
)
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, threshold=0.5)


NGRAM_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
  FROM toks WHERE len(t) >= 3
), inv AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh)
SELECT doc_a, doc_b,
       round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.5
"""


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment (|A∩B|/|A|): catches a document
    mostly included in another even when the Jaccard union dilutes the
    overlap below the symmetric threshold (operators/dedup.py:
    containment_pairs)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.containment_pairs(docs, threshold=0.6)


CONTAINMENT_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
  FROM toks WHERE len(t) >= 3
), inv AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh)
SELECT doc_a, doc_b,
       round(n_common * 1.0 / sa.n_sh, 6) AS containment_a,
       round(n_common * 1.0 / sb.n_sh, 6) AS containment_b
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(n_common * 1.0 / sa.n_sh, 6) >= 0.6
   OR round(n_common * 1.0 / sb.n_sh, 6) >= 0.6
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_docs(docs)


def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-time incremental dedup: the corpus (even doc ids) exists
    only as its stored MinHash band index; the new batch (odd doc ids)
    is signed once and joined against that index — the historical corpus
    is never re-shingled. Result = (new, corpus) collision pairs; the
    oracle derives the same pairs from the full-corpus LSH pair set
    restricted to cross-parity pairs.

    The index side is persisted: in production it is STORED state (built
    once at corpus-ingest time, read per batch), so materializing it
    inside this self-contained query mirrors those semantics — and
    measured 25% faster at sf0.1 (median-of-3 isolated: 3.0 s persisted
    vs 4.0 s re-derived) by keeping the index build out of the join's
    stage graph. Not unpersisted (the returned frame depends on it);
    bench.py's per-query clearCache reclaims it."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    index = D.minhash_band_rows(corpus).persist()
    dups, _new_rows = D.incremental_minhash_dedup(batch, index)
    return dups


INCREMENTAL_MINHASH_ORACLE = f"""
WITH pairs AS ({_minhash_oracle()})
SELECT CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END AS new_doc_id,
       CASE WHEN doc_a % 2 = 1 THEN doc_b ELSE doc_a END AS corpus_doc_id
FROM pairs
WHERE (doc_a % 2) <> (doc_b % 2)
"""


def decontaminate_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (even ids) sharing >= 5
    distinct 3-gram shingles with any benchmark doc (odd ids). The
    benchmark shingle index is broadcast, so the corpus-side check is a
    map-side join — no training-corpus shuffle at any scale."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.contamination_overlap(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        min_shared=5,
    )


def semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space complement of the
    n-gram scrub above: flag training vectors whose cosine similarity to
    ANY benchmark vector reaches theta (paraphrased benchmark leakage
    that shares no shingles). Benchmark = ``label = 0`` (benchmarks are
    the small side by construction) and is BROADCAST, so the check is a
    map-side pass over the training scan — no corpus shuffle at any
    scale, the exact physical shape of ``contamination_overlap``. For
    corpora where the benchmark outgrows a broadcast, the blocked
    sign-LSH path (operators/similarity.py) swaps in unchanged.

    Output: one row per contaminated train vector with its worst
    (highest-cosine) benchmark match — ``max_cos`` ties broken by
    smallest benchmark id, deterministic on the rounded grid.

    Physical shape: operators/similarity.py:reference_scrub — the
    benchmark matrix rides the task closure (the k-means-centroid
    precedent; reference sets are model parameters), making the scrub
    ONE narrow Arrow stage over the corpus scan. The broadcast-join JVM
    spelling of the same semantics overflows Janino's method limit on
    the b x 64-term unrolled cosines and drops to interpreted eval —
    measured 3.4 s vs 0.9 s for this kernel at sf0.1."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("bench_vec_id"), "embedding"
    )
    train = emb.filter(F.col("label") != 0)
    return S.reference_scrub(train, bench, theta=0.35)


_COS_TB = (
    "list_dot_product(tv, bv) / sqrt(list_dot_product(tv, tv)"
    " * list_dot_product(bv, bv))"
)

SEMANTIC_DECONTAMINATE_ORACLE = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id AS bench_vec_id, v AS bv FROM e WHERE label = 0),
t AS (SELECT vec_id, v AS tv FROM e WHERE label <> 0),
scored AS (
  SELECT t.vec_id, b.bench_vec_id,
         round({_COS_TB}, 6) AS cos
  FROM t, b
  WHERE round({_COS_TB}, 6) >= 0.35
), best AS (
  SELECT vec_id, bench_vec_id, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, bench_vec_id) AS rn
  FROM scored
)
SELECT vec_id, bench_vec_id, cos AS max_cos FROM best WHERE rn = 1
"""


DECONTAMINATE_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct(list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
              ELSE [] END AS shingles
  FROM toks
), flat AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
)
SELECT tr.doc_id, be.doc_id AS bench_doc_id, count(*) AS shared_shingles
FROM flat tr JOIN flat be ON tr.s = be.s
WHERE tr.doc_id % 2 = 0 AND be.doc_id % 2 = 1
GROUP BY 1, 2
HAVING count(*) >= 5
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash candidate pairs -> connected components -> one canonical
    representative per near-dup cluster (the full dedup decision)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs)
    return D.connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_rep")
    )


# the oracle rebuilds the same pair graph (the dedup_minhash_lsh oracle)
# and closes it transitively with a recursive CTE; component = min
# reachable node (incl. self)
def _clusters_oracle() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_minhash_oracle()}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id,
       least(src, min(dst)) AS cluster_rep
FROM reach
GROUP BY src
"""


# --- similarity search --------------------------------------------------------
_COS = (
    "list_dot_product({a}, {b}) / sqrt(list_dot_product({a}, {a})"
    " * list_dot_product({b}, {b}))"
)


def simsearch_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, query_vec_id=0, k=10)


SIMSEARCH_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qvec FROM e WHERE vec_id = 0)
SELECT vec_id, round({_COS.format(a="v", b="qvec")}, 6) + 0.0 AS cos_sim
FROM e, q
WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id
LIMIT 10
"""


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs verifier (collect+broadcast — small-corpus only);
    the production path is :func:`embedding_neardup_blocked`."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return S.neardup_pairs(emb, threshold=0.35)


NEARDUP_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_COS.format(a="a.v", b="b.v")}, 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round({_COS.format(a="a.v", b="b.v")}, 6) >= 0.35
"""


def embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked near-dup pairs — the scale path: banded sign-LSH
    candidate generation (shuffle only on band keys, never all-pairs, no
    driver collect / corpus broadcast), per-bucket vectorized kernel via
    ``applyInPandas``. Result is a deterministic subset of
    ``embedding_neardup_pairs`` that both engines derive identically."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return S.neardup_pairs_blocked(emb, threshold=0.35)


NEARDUP_BLOCKED_ORACLE = S.neardup_blocked_oracle_sql(threshold=0.35)


def _geomean_udaf():
    """Arrow grouped-agg UDAF (the one pandas surface the rest of the
    repo doesn't exercise): geometric mean, computed as exp(mean(ln x)).
    The 1e-16-relative drift between numpy's pairwise mean and the
    oracle's sequential avg is absorbed by round(.., 6) on a O(100)
    value — same tolerance argument as the cosine queries.

    Built lazily: ``pandas_udf`` parses its DDL return type through the
    active session, so decorating at module import would require a
    SparkSession before import (breaks bare imports / test collection).
    """
    import numpy as np

    @F.pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(dtype=np.float64)).mean()))

    return geomean


def source_quality_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile via a custom UDAF: geometric mean of
    document length (the right central tendency for heavy-tailed length
    distributions). Grouped-agg pandas UDFs plan like any aggregate —
    one shuffle on the group key, Arrow batches per group."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    # NB: Spark disallows mixing a grouped-agg pandas UDF with JVM
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT) — the agg
    # is UDAF-only by rule, not by choice.
    return docs.groupBy("source").agg(
        F.round(_geomean_udaf()("n_chars"), 6).alias("geomean_chars"),
    )


SOURCE_QUALITY_ORACLE = """
SELECT source, round(exp(avg(ln(n_chars))), 6) AS geomean_chars
FROM documents
GROUP BY source
"""


def simsearch_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (sign-)LSH approximate top-k: index build is a
    row-local projection (zero shuffles, vs IVF's centroid agg); the
    probe is a pushed-down bucket-equality scan. The hyperplanes are
    fixed 6-decimal literals shared verbatim with the oracle, so the
    approximation is engine-identical by construction."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return S.lsh_topk(emb, query_vec_id=0, k=10, n_planes=5)


LSH_TOPK_ORACLE = S.lsh_oracle_sql(query_vec_id=0, k=10, n_planes=5)


def simsearch_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH top-k: the query bucket plus every Hamming-1
    neighbor bucket — the standard recall fix for marginal hyperplane
    crossings, still a bucket-literal probe scan."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return S.lsh_topk_multiprobe(emb, query_vec_id=0, k=10, n_planes=5)


LSH_MULTIPROBE_ORACLE = S.lsh_oracle_sql(
    query_vec_id=0, k=10, n_planes=5, multiprobe=True
)


def knn_join_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH blocked kNN join: top-3 cosine neighbors for every
    vector — the all-vectors retrieval/dedup-input shape; candidates
    blocked exactly like embedding_neardup_blocked, ranked per id with
    one window shuffle."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_join_blocked(emb, k=3)


KNN_JOIN_ORACLE = S.knn_join_oracle_sql(k=3)


def simsearch_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, query_vec_id=0, k=10)


def simsearch_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2 — the production recall knob (VERDICT r6 #6):
    the r6 recall eval showed nprobe=1 is the weak probe; scanning the
    two nearest-centroid buckets is still a pushed-down IN-list scan
    (operators/similarity.py:ivf_topk), and the probed set is a strict
    superset of nprobe=1's, so recall is structurally monotone
    (tests/test_recall_floors.py pins the floor)."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, query_vec_id=0, k=10, nprobe=2)


def simsearch_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a k-means coarse quantizer, nprobe=2 — the
    geometry-aligned index (operators/clustering.py:ivf_kmeans_topk).
    The label-bucket variants above document the metadata-partition
    ceiling (recall ~= scanned fraction); this is the real ANN index
    shape: near neighbors share cells, so probing 2 of 8 cells recovers
    most of the exact top-10 (floor pinned in
    tests/test_recall_floors.py)."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return C.ivf_kmeans_topk(
        emb, query_vec_id=0, k=10, n_clusters=8, nprobe=2
    )


def simsearch_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.py:pq_topk —
    Jegou et al. 2011, the compression half of FAISS IVF-PQ): sixteen
    independent 16-word L2 codebooks over the sixteen 4-dim subspaces,
    every vector encoded to its nearest-codeword tuple — 64 bits per
    vector instead of 64 doubles, the memory move that lets a 100 TB
    corpus' index live in RAM — then asymmetric-distance top-10
    against the exact query. The job count is independent of the
    subspace count (one seed collect, one exploded aggregate trains
    all 16 codebooks, one map-only encode+ADC scan). Training,
    encoding and ADC are deterministic on a shared 6-dp grid, so the
    DuckDB oracle replays them exactly; the approximation floor vs
    exact brute force is pinned in tests/test_recall_floors.py."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return S.pq_topk(emb, query_vec_id=0, k=10, m=16, codebook_k=16)


def simsearch_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC shortlist + exact re-rank (operators/similarity.py:
    pq_rerank_topk) — the deployed PQ serving shape: the 64-bit codes
    produce a 50-candidate shortlist, the full-precision vectors are
    touched for those 50 rows only, and the returned top-10 ordering is
    exact within the shortlist. Recall vs brute force is bounded only
    by shortlist membership (floor pinned in
    tests/test_recall_floors.py, measured well above pure-ADC)."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return S.pq_rerank_topk(emb, query_vec_id=0, k=10, shortlist=50)


PQ_RERANK_ORACLE = S.pq_rerank_oracle_sql(query_vec_id=0, k=10, shortlist=50)


PQ_TOPK_ORACLE = S.pq_oracle_sql(query_vec_id=0, k=10, m=16, codebook_k=16)


IVF_KMEANS_ORACLE = C.ivf_kmeans_oracle_sql(
    query_vec_id=0, k=10, n_clusters=8, nprobe=2
)


def _ivf_oracle(nprobe: int) -> str:
    return f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
pos AS (
  SELECT label, i, round(avg(v[i + 1]), 6) AS mval
  FROM e, unnest(range(64)) AS t(i)
  GROUP BY label, i
), centroids AS (
  SELECT label, list(mval ORDER BY i) AS centroid FROM pos GROUP BY label
), q AS (SELECT v AS qvec FROM e WHERE vec_id = 0),
best AS (
  SELECT label FROM centroids, q
  ORDER BY round({_COS.format(a="centroid", b="qvec")}, 6) DESC, label
  LIMIT {nprobe}
)
SELECT vec_id, round({_COS.format(a="v", b="qvec")}, 6) + 0.0 AS cos_sim
FROM e JOIN best USING (label), q
WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id
LIMIT 10
"""


IVF_ORACLE = _ivf_oracle(1)
IVF_MULTIPROBE_ORACLE = _ivf_oracle(2)


# --- text analysis -------------------------------------------------------------
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count("text").alias("n_tokens"),
        X.bpe_ish_token_count("text").alias("n_bpe_tokens"),
        F.round(X.stopword_ratio("text", X.LANG_STOPWORDS["en"]), 6).alias("sw_ratio"),
        F.round(X.quality_score("text"), 6).alias("quality"),
    )


_SW_EN = ", ".join(f"'{w}'" for w in X.LANG_STOPWORDS["en"])
TEXT_STATS_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), m AS (
  SELECT doc_id, text, toks,
         greatest(len(toks), 1) AS n_tok,
         len(list_filter(toks, t -> t IN ({_SW_EN}))) AS sw_hits,
         length(trim(text)) * 1.0 / greatest(len(toks), 1) AS mean_wlen,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
           / greatest(length(text), 1) AS sym_ratio
  FROM base
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(regexp_extract_all(text, '{X.TOKEN_REGEX}')) AS n_bpe_tokens,
       round(sw_hits * 1.0 / n_tok, 6) AS sw_ratio,
       round(least(sw_hits * 3.0 / n_tok, 1.0) * 0.4
             + (CASE WHEN mean_wlen >= 3 AND mean_wlen <= 10 THEN 1.0 ELSE 0.3 END) * 0.3
             + (1.0 - least(sym_ratio * 5.0, 1.0)) * 0.3, 6) AS quality
FROM m
"""


def lang_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(X.lang_id("text").alias("lang_guess"))
        .groupBy("lang_guess")
        .agg(F.count("*").alias("n_docs"))
    )


def _lang_id_oracle() -> str:
    hit_cols = ",\n         ".join(
        "len(list_intersect(toks, [{}])) AS h_{}".format(
            ", ".join(f"'{w}'" for w in X.LANG_STOPWORDS[lang]), lang
        )
        for lang in X.LANG_PRIORITY
    )
    case = "CASE\n"
    for lang in X.LANG_PRIORITY:
        others = " AND ".join(
            f"h_{lang} >= h_{o}" for o in X.LANG_PRIORITY if o != lang
        )
        case += f"  WHEN h_{lang} > 0 AND {others} THEN '{lang}'\n"
    case += "  ELSE 'und' END"
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
  FROM documents
), hits AS (
  SELECT doc_id,
         {hit_cols}
  FROM toks
)
SELECT {case} AS lang_guess, count(*) AS n_docs
FROM hits
GROUP BY 1
"""


# --- TF-IDF (pure SQL, no MLlib hashing) ------------------------------------------
# tf = term count per doc; idf = ln(N / df). Composed from explode +
# two aggregations + a window top-k — every stage shuffles on a key and
# scales linearly; ln() is libm-identical across engines (probed).
# MLlib's HashingTF uses murmur3 (not oracle-able); this is the exact twin.
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), "\\s+")).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = terms.distinct().groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
    )


TFIDF_ORACLE = """
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
), df AS (
  SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms)
  GROUP BY 1
), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, round(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, tfidf,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
) WHERE rank <= 3
"""


# --- context-window chunking -------------------------------------------------------
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 64-token windows with stride 48 per document — LLM
    context-window preprocessing."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(X.chunk_tokens("text", width=64, stride=48)).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.start_token").alias("start_token"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


CHUNK_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), c AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start FROM t
)
SELECT doc_id,
       CAST(start // 48 AS INTEGER) AS chunk_idx,
       CAST(start AS INTEGER) AS start_token,
       array_to_string(toks[start + 1 : start + 64], ' ') AS chunk_text
FROM c
"""


# --- deterministic sampling / splits ---------------------------------------------
def doc_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified hash-sample of documents (per-source rate) plus a
    reproducible train/val/test split — both decisions are row-local
    md5 draws (operators/sampling.py), so the sample is identical at any
    parallelism / cluster layout and the oracle replicates it exactly.
    Strata rates here: even-numbered sources keep 80%, odd keep 40%."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(0.8))
        .otherwise(F.lit(0.4))
    )
    return docs.filter(M.hash_uniform("doc_id", "sample-") < rate).select(
        "doc_id", "source", M.split_assignment("doc_id").alias("split")
    )


SAMPLE_SPLIT_ORACLE = """
WITH h AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('sample-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u,
         ('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS v
  FROM documents
)
SELECT doc_id, source,
       CASE WHEN v < 0.8 THEN 'train'
            WHEN v < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM h
WHERE u < CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
              THEN 0.8 ELSE 0.4 END
"""


def doc_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size deterministic sample: bottom-k by salted md5 uniform —
    the layout-independent stand-in for reservoir sampling (which is
    sequential and cannot be deterministic under a parallel unordered
    scan). Compiles to TakeOrderedAndProject: per-partition k-heaps, no
    global sort."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return M.bottom_k_sample(docs, k=100, key_col="doc_id").select(
        "doc_id", "source", "u"
    )


BOTTOMK_ORACLE = """
SELECT doc_id, source,
       ('0x' || substr(md5('bottomk-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         / 4294967296.0 AS u
FROM documents
ORDER BY u, doc_id
LIMIT 100
"""


_MIX_SHARES = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture sampling — the LLM data-mixing step: the largest
    sample whose source composition is exactly 50/30/20 across three
    sources, membership decided by per-source md5 bottom-k (deterministic
    at any layout). Output is the per-source count + id checksum, proving
    exact membership against the oracle."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    sample = M.mixture_sample(
        docs, source_col="source", key_col="doc_id", target_shares=_MIX_SHARES
    )
    return sample.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("id_checksum"),
    )


_MIX_VALUES = ", ".join(f"('{s}', {p})" for s, p in _MIX_SHARES.items())
MIXTURE_SAMPLE_ORACLE = f"""
WITH shares(source, p) AS (VALUES {_MIX_VALUES}),
counts AS (
  SELECT source, count(*) AS n FROM documents GROUP BY source
),
budget AS (
  SELECT min(CAST(floor(n / p) AS BIGINT)) AS t
  FROM counts JOIN shares USING (source)
),
ranked AS (
  SELECT d.doc_id, d.source,
         CAST(floor(s.p * b.t) AS BIGINT) AS quota,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY ('0x' || substr(md5('mix-' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                    / 4294967296.0,
                    d.doc_id
         ) AS rnk
  FROM documents d
  JOIN shares s ON d.source = s.source
  CROSS JOIN budget b
)
SELECT source, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM ranked WHERE rnk <= quota
GROUP BY source
"""


def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling proportional to document length (the curation
    move: long documents carry more training signal per draw) via
    exponential keys (Efraimidis–Spirakis) — deterministic, layout-
    independent, fixed size k. The emitted score is rounded to 9
    decimals: scores sit at the 1e-4 scale, so cross-engine ln() ulp
    drift (~1e-20 absolute) cannot move the rounded value."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return M.weighted_bottom_k(
        docs, k=200, key_col="doc_id", weight_col="n_chars"
    ).select("doc_id", "n_chars", F.round("score", 9).alias("score"))


WEIGHTED_SAMPLE_ORACLE = """
SELECT doc_id, n_chars,
       round(-ln(('0x' || substr(md5('pps-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 / 4294967296.0) / n_chars, 9) AS score
FROM documents
ORDER BY -ln(('0x' || substr(md5('pps-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             / 4294967296.0) / n_chars, doc_id
LIMIT 200
"""


# --- Python UDTF (table function) ------------------------------------------------
class BigramCounts:
    """Python UDTF (PySpark 4 table-function surface): per-document
    bigram histogram, one input row -> many output rows via LATERAL.

    UDF-surface demo on purpose — the set-oriented equivalent
    (split -> explode -> groupBy) is the hot path shown elsewhere; a
    UDTF is for logic that genuinely needs imperative per-row expansion.
    """

    def eval(self, text: str):
        if not text:
            return
        toks = text.strip().split()
        counts: dict[tuple[str, str], int] = {}
        for pair in zip(toks, toks[1:]):
            counts[pair] = counts.get(pair, 0) + 1
        for (a, b), n in counts.items():
            yield f"{a} {b}", n


class ExtractJsonKeys:
    """Polymorphic Python UDTF (Spark 4 ``analyze``): the OUTPUT SCHEMA
    is computed at plan time from the constant key-list argument — one
    output column per requested JSON key — so the same table function
    serves any key set without per-shape registration. The complement
    of the static-schema ``BigramCounts`` UDTF; together they cover the
    full Spark 4 UDTF API. Values surface as strings (the caller casts),
    missing keys as NULL. Non-string values are rendered as their JSON
    text (``json.dumps``: ``true``/``false``, numbers, nested objects)
    so the output agrees with SQL ``json_extract_string`` semantics
    rather than Python ``repr``; raw strings pass through as-is."""

    @staticmethod
    def analyze(js, keys):
        from pyspark.sql.types import StringType, StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        fields = [
            StructField(k.strip(), StringType())
            for k in keys.value.split(",")
        ]
        return AnalyzeResult(schema=StructType(fields))

    def eval(self, js, keys):
        import json

        ks = [k.strip() for k in keys.split(",")]
        try:
            d = json.loads(js) if js else {}
            if not isinstance(d, dict):
                d = {}
        except (ValueError, TypeError):
            # malformed payload -> all-NULL row, mirroring SQL
            # json_extract semantics instead of failing the task
            d = {}
        def render(v):
            if v is None:
                return None
            if isinstance(v, str):
                return v
            return json.dumps(v, separators=(",", ":"))

        yield tuple(render(d.get(k)) for k in ks)


def props_extract_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL-apply the polymorphic UDTF over the events props JSON
    (schema decided by ``analyze`` from the 'k' key list) and aggregate
    the extracted values per event type. Python row path — an API
    surface demonstration like bigrams_udtf, not a hot-path design;
    the built-in twin is events_json_stats."""
    tune(spark)
    from pyspark.sql.functions import udtf as _udtf

    spark.udtf.register("extract_json_keys", _udtf(ExtractJsonKeys))
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "__events_udtf"
    )
    return spark.sql(
        """
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(TRY_CAST(e.k AS BIGINT)) AS BIGINT) AS total_k
        FROM __events_udtf, LATERAL extract_json_keys(props, 'k') e
        GROUP BY event_type
        """
    )


# TRY_CAST on both sides: Spark CAST would yield NULL on a non-numeric
# payload but DuckDB CAST hard-errors — TRY_CAST pins the NULL behavior
# in both engines so non-numeric 'k' values cannot diverge.
PROPS_EXTRACT_ORACLE = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS total_k
FROM events GROUP BY event_type
"""


def bigrams_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    # wrap at CALL time, after tune(): the @udtf decorator snapshots the
    # Arrow-execution choice when it runs, and at module import there is
    # no session yet — decorating here keeps that decision a
    # session-conf choice. session.py deliberately leaves
    # pythonUDTF.arrow.enabled UNSET (row path, BatchEvalPythonUDTF —
    # measured ~5x faster for these analyze() UDTFs; numbers in
    # session.py), and test_udtfs_row_path_is_deliberate pins it.
    spark.udtf.register(
        "bigram_counts", F.udtf(BigramCounts, returnType="bigram: string, n: int")
    )
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        "SELECT doc_id, b.bigram, b.n "
        "FROM __docs_udtf, LATERAL bigram_counts(text) AS b"
    )


BIGRAMS_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), b AS (
  SELECT doc_id, toks[i + 1] || ' ' || toks[i + 2] AS bigram
  FROM t, unnest(range(len(toks) - 1)) AS u(i)
)
SELECT doc_id, bigram, CAST(count(*) AS INT) AS n
FROM b
GROUP BY doc_id, bigram
"""


def doc_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum quota sampling: exactly min(k, |stratum|) documents
    per source, chosen by ranking a deterministic md5 uniform — the
    fixed-size counterpart of the rate-based sample. One shuffle on the
    stratum key; the per-group sort is k-bounded. Layout-independent
    like all hash sampling here, so re-runs and the oracle agree row
    for row."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        M.hash_uniform("doc_id", "quota-"), "doc_id"
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "source", F.col("rk").cast("int").alias("rk"))
    )


QUOTA_SAMPLE_ORACLE = """
WITH h AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('quota-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
), r AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (PARTITION BY source ORDER BY u, doc_id) AS INT) AS rk
  FROM h
)
SELECT doc_id, source, rk FROM r WHERE rk <= 5
"""


def doc_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global contiguous example ids in doc_id order via the scalable
    range-partition + offset-join pattern (operators/indexing.py) — never
    a single-task global window."""
    from nyc_taxi_data_pipeline_elt_spark.operators.indexing import (
        with_global_index,
    )

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return with_global_index(
        docs.select("doc_id", "source"), order_col="doc_id"
    ).select("doc_id", "source", "example_id")


GLOBAL_INDEX_ORACLE = """
SELECT doc_id, source,
       row_number() OVER (ORDER BY doc_id) - 1 AS example_id
FROM documents
"""


def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: lay documents end-to-end in doc_id order into
    4096-char training sequences; each doc gets its (seq_id, seq_offset).
    Distributed global running total via range partition + broadcast
    offsets (operators/indexing.py:pack_sequences) — the oracle's single
    window is exactly the plan shape this operator exists to avoid."""
    from nyc_taxi_data_pipeline_elt_spark.operators.indexing import (
        pack_sequences,
    )

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(
        docs.select("doc_id", "n_chars"),
        capacity=4096,
        weight_col="n_chars",
        order_col="doc_id",
    ).select("doc_id", "n_chars", "seq_id", "seq_offset")


PACK_SEQUENCES_ORACLE = """
SELECT doc_id, n_chars,
       CAST(floor(cb / 4096) AS BIGINT) AS seq_id,
       CAST(cb % 4096 AS BIGINT) AS seq_offset
FROM (
  SELECT doc_id, n_chars,
         coalesce(sum(n_chars) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cb
  FROM documents
)
"""


# --- vectorized scalar UDF (pandas_udf) ------------------------------------------
def doc_vowel_stats_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar ``@pandas_udf`` surface: Arrow-batched vectorized Python,
    the ~10-100x-over-row-UDF path for logic that genuinely needs Python
    (here a stand-in regex count that a built-in could also do — the
    point is the API contract: Series in, Series out, one Arrow batch
    per task chunk, codegen around it undisturbed)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def n_vowels(s: pd.Series) -> pd.Series:
        return s.str.lower().str.count(r"[aeiou]").astype("int32")

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_vowels("text").alias("n_vowels"),
        F.length("text").alias("n_chars_txt"),
    )


VOWEL_UDF_ORACLE = """
SELECT doc_id,
       CAST(length(lower(text))
            - length(regexp_replace(lower(text), '[aeiou]', '', 'g'))
         AS INT) AS n_vowels,
       CAST(length(text) AS INT) AS n_chars_txt
FROM documents
"""


# --- corpus LM scoring -----------------------------------------------------------
def unigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level quality filter: score each document by its total
    unigram log-likelihood under the corpus's own unigram LM — the
    classic cheap perplexity proxy used to rank training data.

    Two passes over the exploded tokens: (1) vocab counts -> per-token
    ``round(ln(p), 6)`` contribution (vocab is tiny relative to the
    corpus, so the lookup join is a broadcast); (2) per-doc sum. The
    per-token round puts every contribution on the 1e-6 grid, so the
    doc-level sum is order-independent up to FP noise that a final
    round(…, 6) snaps back — deterministic across engines and shuffle
    layouts."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count("*").alias("n_tok"))
    total = vocab.agg(F.sum("n_tok").alias("n_total"))
    contrib = vocab.crossJoin(F.broadcast(total)).select(
        "token",
        F.round(F.log(F.col("n_tok") / F.col("n_total")), 6).alias("logp"),
    )
    return (
        toks.join(F.broadcast(contrib), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("logp"), 6).alias("logprob_sum"),
        )
    )


def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style targeted data selection (Xie et al., "Data Selection
    for Language Models via Importance Resampling", NeurIPS 2023): rank
    the corpus by the log likelihood RATIO between a target-domain
    n-gram LM and the background-corpus LM, then keep the top slice —
    the standard cheap recipe for steering a 100 TB crawl toward a
    domain without training a classifier. Target here: the ``en``
    documents; background: the full corpus; unigram LMs with add-one
    smoothing over the shared corpus vocabulary.

    Same engine shape as unigram_lm_scores: two vocabulary aggregates
    (the target one is a filtered twin), the three scalars (target
    mass, corpus mass, vocab size) ride a 1-row broadcast, per-token
    ``round(ln(p_t) - ln(p_c), 6)`` pins every contribution to the 1e-6
    grid so the per-doc sum is layout-independent, and the top-25 is a
    k-row global sort. One shuffle per aggregate, broadcast joins only
    — nothing quadratic, vocab is the only driver-size object."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
    )
    corpus = toks.groupBy("token").agg(F.count("*").alias("n_c"))
    target = (
        toks.filter(F.col("lang") == "en")
        .groupBy("token")
        .agg(F.count("*").alias("n_t"))
    )
    vocab = corpus.join(target, "token", "left").select(
        "token", "n_c", F.coalesce("n_t", F.lit(0)).alias("n_t")
    )
    scalars = vocab.agg(
        F.sum("n_c").alias("mass_c"),
        F.sum("n_t").alias("mass_t"),
        F.count("*").alias("v"),
    )
    contrib = vocab.crossJoin(F.broadcast(scalars)).select(
        "token",
        F.round(
            F.log((F.col("n_t") + 1) / (F.col("mass_t") + F.col("v")))
            - F.log((F.col("n_c") + 1) / (F.col("mass_c") + F.col("v"))),
            6,
        ).alias("ratio"),
    )
    return (
        toks.join(F.broadcast(contrib), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum("ratio"), 6).alias("dsir_weight"),
        )
        .orderBy(F.col("dsir_weight").desc(), "doc_id")
        .limit(25)
    )


DSIR_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents
), corpus AS (
  SELECT token, count(*) AS n_c FROM toks GROUP BY token
), target AS (
  SELECT token, count(*) AS n_t FROM toks WHERE lang = 'en' GROUP BY token
), vocab AS (
  SELECT c.token, c.n_c, coalesce(t.n_t, 0) AS n_t
  FROM corpus c LEFT JOIN target t USING (token)
), scalars AS (
  SELECT sum(n_c) AS mass_c, sum(n_t) AS mass_t, count(*) AS v FROM vocab
), contrib AS (
  SELECT token,
         round(ln((n_t + 1) * 1.0 / (mass_t + v))
               - ln((n_c + 1) * 1.0 / (mass_c + v)), 6) AS ratio
  FROM vocab, scalars
)
SELECT t.doc_id, count(*) AS n_tokens,
       round(sum(c.ratio), 6) AS dsir_weight
FROM toks t JOIN contrib c USING (token)
GROUP BY t.doc_id
ORDER BY dsir_weight DESC, t.doc_id
LIMIT 25
"""


UNIGRAM_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents
), vocab AS (
  SELECT token, count(*) AS n_tok FROM toks GROUP BY token
), contrib AS (
  SELECT token, round(ln(n_tok * 1.0 / (SELECT sum(n_tok) FROM vocab)), 6) AS logp
  FROM vocab
)
SELECT t.doc_id, count(*) AS n_tokens,
       round(sum(c.logp), 6) AS logprob_sum
FROM toks t JOIN contrib c USING (token)
GROUP BY t.doc_id
"""


def bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM corpus scoring with add-one smoothing: score each
    document by its total ``ln P(w_i | w_{i-1})`` under the corpus's own
    bigram model — one step up the n-gram ladder from
    :func:`unigram_lm_scores`, the standard cheap-perplexity ranking.

    Bigrams come from one window ``lag`` over (doc, position) — a single
    shuffle on doc_id; model counts are two hash aggregations. The
    score join keys on (prev, cur) with no broadcast hint: the bigram
    table grows with vocab^2, so AQE picks broadcast only when it truly
    fits — at 100 TB this is a plain shuffle join on a key that is
    orders of magnitude smaller than the corpus. Per-bigram log-probs
    are rounded to the 1e-6 grid before the per-doc sum (the same
    order-independence trick as the unigram scorer)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy("pos")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "token"),
    )
    big = toks.withColumn("prev", F.lag("token").over(w)).filter(
        F.col("prev").isNotNull()
    )
    c2 = big.groupBy("prev", "token").agg(F.count("*").alias("n2"))
    c1 = c2.groupBy("prev").agg(F.sum("n2").alias("n1"))
    vsize = toks.agg(F.countDistinct("token").alias("v"))
    contrib = (
        c2.join(c1, "prev")
        .crossJoin(F.broadcast(vsize))
        .select(
            "prev",
            "token",
            F.round(
                F.log((F.col("n2") + 1) / (F.col("n1") + F.col("v"))), 6
            ).alias("logp"),
        )
    )
    return (
        big.join(contrib, ["prev", "token"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum("logp"), 6).alias("logprob_sum"),
        )
    )


BIGRAM_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS token,
         generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
  FROM documents
), big AS (
  SELECT doc_id, token,
         lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM toks
  QUALIFY prev IS NOT NULL
), c2 AS (
  SELECT prev, token, count(*) AS n2 FROM big GROUP BY prev, token
), c1 AS (
  SELECT prev, sum(n2) AS n1 FROM c2 GROUP BY prev
), v AS (SELECT count(DISTINCT token) AS vs FROM toks),
contrib AS (
  SELECT prev, token, round(ln((n2 + 1) * 1.0 / (n1 + vs)), 6) AS logp
  FROM c2 JOIN c1 USING (prev), v
)
SELECT b.doc_id, count(*) AS n_bigrams, round(sum(c.logp), 6) AS logprob_sum
FROM big b JOIN contrib c ON b.prev = c.prev AND b.token = c.token
GROUP BY b.doc_id
"""


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build with coverage curve: the top-20 corpus tokens by
    frequency (ties to the lexicographically smallest) with each rank's
    cumulative share of all token occurrences — the sizing analysis done
    before freezing a tokenizer vocab. One explode + hash agg over the
    corpus; the ranking window runs on the vocab-sized aggregate, not
    the corpus — and the global ranking window only ever sees the 20
    surviving rows (top-k via TakeOrderedAndProject first, then rank:
    the cumulative share at rank r <= 20 depends only on the top-20
    counts, so truncating before the single-partition window is exact,
    not an approximation)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("n_total"))
    top = counts.orderBy(F.col("n").desc(), "token").limit(20)
    # 20-row frame post-limit; pmod(n, 1) = 0 everywhere but is not
    # foldable (lit(0) would be constant-folded back to an empty
    # partition spec), so the intended single partition stays warning-free
    w = Window.partitionBy(F.pmod(F.col("n"), F.lit(1))).orderBy(
        F.col("n").desc(), F.col("token")
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn(
            "cum_share",
            F.round(
                F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
                / F.col("n_total"),
                6,
            ),
        )
        .select("rank", "token", "n", "cum_share")
    )


VOCAB_COVERAGE_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
  FROM documents
), counts AS (
  SELECT token, count(*) AS n FROM toks GROUP BY token
), ranked AS (
  SELECT token, n,
         CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER) AS rank,
         round(
           CAST(sum(n) OVER (ORDER BY n DESC, token
                             ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / (SELECT sum(n) FROM counts), 6) AS cum_share
  FROM counts
)
SELECT rank, token, n, cum_share FROM ranked WHERE rank <= 20
"""


# --- embedding quantization ------------------------------------------------------
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector scalar (int8-style) quantization with reconstruction
    error — the storage-compression step before shipping embeddings at
    scale. Each vector is min-max quantized to 256 levels; the output
    reports the codebook range and the MSE of dequantization.

    The residual array is materialized once, then the sum of squares is
    the *unrolled* left-to-right dot product (operators/similarity.py) —
    bitwise-identical to DuckDB's list_dot_product association, keeping
    the oracle exact without trusting HOF fold order."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    v = S.as_double("embedding")
    base = emb.select(
        "vec_id",
        v.alias("v"),
        F.array_min(v).alias("mn"),
        F.array_max(v).alias("mx"),
    )
    scale = (F.col("mx") - F.col("mn")) / F.lit(255.0)
    dq = F.transform(
        "v",
        lambda x: F.round((x - F.col("mn")) / scale) * scale + F.col("mn"),
    )
    resid = base.withColumn(
        "d", F.zip_with("v", dq, lambda a, b: a - b)
    )
    return resid.select(
        "vec_id",
        F.round("mn", 6).alias("vmin"),
        F.round("mx", 6).alias("vmax"),
        F.round(S.dot(F.col("d"), F.col("d")) / F.lit(64.0), 12).alias("mse"),
    )


QUANTIZE_ORACLE = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_min(embedding::DOUBLE[]) AS mn,
         list_max(embedding::DOUBLE[]) AS mx
  FROM embeddings
), resid AS (
  SELECT vec_id, mn, mx,
         list_transform(v, x ->
           x - (round((x - mn) / ((mx - mn) / 255.0)) * ((mx - mn) / 255.0) + mn)
         ) AS d
  FROM base
)
SELECT vec_id, round(mn, 6) AS vmin, round(mx, 6) AS vmax,
       round(list_dot_product(d, d) / 64.0, 12) AS mse
FROM resid
"""


# --- grouped-map custom operator (applyInPandas) ---------------------------------
def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_taxi_data_pipeline_elt_spark.operators.pandas_ops import assign_shards

    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return assign_shards(emb, shard_size=16)


SHARD_ORACLE = """
SELECT label, vec_id,
       CAST(row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1 AS INTEGER)
         AS rank_in_group,
       CAST((row_number() OVER (PARTITION BY label ORDER BY vec_id) - 1) // 16
         AS INTEGER) AS shard_idx
FROM embeddings
"""


# --- multimodal metadata --------------------------------------------------------
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return attach_payload(docs).select("doc_id", "n_bytes", "prefix_hex")


MULTIMODAL_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       lower(substring(hex(encode(text)), 1, 16)) AS prefix_hex
FROM documents
"""


def classifier_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear text-classifier inference at corpus scale — the
    fastText-style quality-classifier pass every curation pipeline runs
    (hashed bag-of-tokens -> weight lookup -> sigmoid). The 'model' here
    is a deterministic stand-in: each token hashes to one of 1024
    buckets and the bucket's weight is an md5-derived uniform in
    [-1, 1), so the inference *mechanics* (row-local feature hashing,
    per-token weight contribution, per-doc reduction, logistic link)
    are exactly the production shape while staying engine-reproducible.

    Everything is row-local expressions + one hash aggregation: bucket
    and weight derive from the token string itself, so there is no
    weight-table join at all — the degenerate-best case of a broadcast
    model. Per-token contributions are rounded to the 1e-6 grid before
    the sum (order independence); exp() is libm-identical (probed like
    ln in the LM scorers)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token"),
    )
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("feat-"), F.col("token"))), 1, 8),
        16,
        10,
    ).cast("long") % 1024
    weight = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("wt-"), bucket.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    ) * 2.0 - 1.0
    contrib = toks.select(
        "doc_id", F.round(weight, 6).alias("w")
    )
    summed = contrib.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.sum("w"), 6).alias("margin"),
    )
    score = F.round(
        1.0 / (1.0 + F.exp(-F.col("margin") / F.col("n_tokens"))), 6
    )
    return summed.select(
        "doc_id",
        "n_tokens",
        "margin",
        score.alias("score"),
        (score > 0.5).alias("keep"),
    )


CLASSIFIER_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
  FROM documents
), contrib AS (
  SELECT doc_id,
         round((('0x' || substr(md5('wt-' ||
                  (('0x' || substr(md5('feat-' || token), 1, 8))::BIGINT % 1024)
                ), 1, 8))::BIGINT / 4294967296.0) * 2.0 - 1.0, 6) AS w
  FROM toks
), summed AS (
  SELECT doc_id, count(*) AS n_tokens, round(sum(w), 6) AS margin
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, n_tokens, margin,
       round(1.0 / (1.0 + exp(-margin / n_tokens)), 6) AS score,
       round(1.0 / (1.0 + exp(-margin / n_tokens)), 6) > 0.5 AS keep
FROM summed
"""


def kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-cardinality sketch over the
    corpus's 3-gram shingle space (the statistic that sizes a dedup
    index before building it) — the deterministic, oracle-checkable
    counterpart to `approx_distinct_stats`'s HLL (whose register layout
    is engine-private by construction). Estimate = (k-1)/h_(k) with
    md5-uniform hashes (Bar-Yossef et al. 2002, public): bit-identical
    in both engines, so even the *approximation* hash-matches.

    Shape: shingle -> distinct (one shuffle) -> bottom-k by hash
    (TakeOrderedAndProject — never a global sort) -> 1-row aggregate.
    The true count rides along to expose the sketch's relative error;
    at scale you'd drop it and keep only the k-row bottom-k pass."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    k = 256
    toks = D.shingle_rows(docs, n=3).select(
        F.col("s").alias("token")
    ).distinct()
    hashed = toks.select(
        "token", M.hash_uniform("token", "kmv-").alias("h")
    )
    bottom = hashed.orderBy("h").limit(k)
    n_true = toks.agg(F.count("*").alias("n_true"))
    return bottom.agg(
        F.lit(k).alias("k"),
        F.max("h").alias("kth_hash"),
        F.round((F.lit(k) - 1) / F.max("h"), 4).alias("estimate"),
    ).crossJoin(F.broadcast(n_true)).select(
        "k",
        F.round("kth_hash", 12).alias("kth_hash"),
        "estimate",
        "n_true",
        F.round(
            F.abs(F.col("estimate") - F.col("n_true")) / F.col("n_true"), 4
        ).alias("rel_error"),
    )


KMV_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '\\s+')) AS tk,
         generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos
  FROM documents
), toks AS (
  SELECT DISTINCT concat_ws(' ', tk,
           lead(tk, 1) OVER (PARTITION BY doc_id ORDER BY pos),
           lead(tk, 2) OVER (PARTITION BY doc_id ORDER BY pos)) AS token
  FROM tok
  QUALIFY lead(tk, 2) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
), hashed AS (
  SELECT token,
         ('0x' || substr(md5('kmv-' || token), 1, 8))::BIGINT
           / 4294967296.0 AS h
  FROM toks
), bottom AS (
  SELECT h FROM hashed ORDER BY h LIMIT 256
), agg AS (
  SELECT 256 AS k, max(h) AS kth_hash,
         round(255 / max(h), 4) AS estimate
  FROM bottom
), t AS (SELECT count(*) AS n_true FROM toks)
SELECT k, round(kth_hash, 12) AS kth_hash, estimate, n_true,
       round(abs(estimate - n_true) / n_true, 4) AS rel_error
FROM agg, t
"""


def winnow_fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) local fingerprints: min-hash of every sliding
    window of w=4 consecutive 3-gram shingle hashes — guarantees any
    shared 6-token run produces a common fingerprint while storing a
    fraction of the shingles (operators/dedup.py:winnow_fingerprints)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.winnow_fingerprints(docs, n=3, w=4)


WINNOW_ORACLE = D.winnow_oracle_sql(n=3, w=4)


def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the
    information-theoretic quality signal (gibberish and boilerplate sit
    at the distribution's tails). One explode + two hash aggregations;
    per-character contributions are rounded to the 1e-6 grid before the
    per-doc sum so the result is order-independent across engines."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit("."), 0)).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    w = Window.partitionBy("doc_id")
    contrib = counts.withColumn("n", F.sum("c").over(w)).select(
        "doc_id",
        "n",
        F.round(
            -(F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n")), 6
        ).alias("term"),
    )
    return contrib.groupBy("doc_id").agg(
        F.first("n").alias("n_chars"),
        F.round(F.sum("term"), 6).alias("entropy"),
    )


CHAR_ENTROPY_ORACLE = """
WITH chars AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch FROM documents
), counts AS (
  SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
), contrib AS (
  SELECT doc_id,
         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n,
         round(-(c * 1.0 / sum(c) OVER (PARTITION BY doc_id))
               * ln(c * 1.0 / sum(c) OVER (PARTITION BY doc_id)), 6) AS term
  FROM counts
)
SELECT doc_id, any_value(n) AS n_chars, round(sum(term), 6) AS entropy
FROM contrib GROUP BY doc_id
"""


# --- clustering / semantic dedup ---------------------------------------------
def embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed spherical k-means (operators/clustering.py): row-local
    literal-centroid assignment + one hash-agg Lloyd update per round;
    the driver only ever holds the k x dim centroid matrix. Output is the
    per-cluster census after one update round."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = C.kmeans(emb, k=4, n_iter=1)
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg("cos_sim"), 4).alias("avg_cos"),
    )


KMEANS_ORACLE = f"""{C.kmeans_oracle_ctes(k=4, n_iter=1)}
SELECT CAST(cid AS INTEGER) AS cluster, count(*) AS n_vecs,
       round(avg(cos), 4) + 0.0 AS avg_cos
FROM b1 GROUP BY cid
"""


def semdedup_prune_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv 2303.09540): k-means cluster the corpus, then drop
    vectors with a lower-id cluster-mate above the cosine threshold. The
    cluster key blocks the pair scan — sum(|cluster|^2) candidates, never
    a global cross product."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = C.kmeans(emb, k=4, n_iter=1)
    return C.semdedup_prune(assigned, threshold=0.3)


SEMDEDUP_ORACLE = C.semdedup_oracle_sql(k=4, n_iter=1, threshold=0.3)


def simsearch_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation: recall@k of each ANN probe strategy
    against the exact brute-force top-k — the acceptance gate every ANN
    deployment runs, and the quantitative case for multi-probe (at
    sf0.01 single-probe sign-LSH recalls 0/10 of the true neighbors;
    Hamming-1 multi-probe recovers 5/10). All sides are k-row frames, so
    the joins are broadcast and driver-free."""
    tune(spark)
    n_planes, k = 5, 10
    emb = load_table(spark, sf_dir, "embeddings")
    # Build the sign-LSH index ONCE and persist it: both probe
    # strategies and the query-row lookup read the same bucketed frame,
    # so the corpus is Arrow-bucketed a single time instead of once per
    # probe (measured ~2x on this query; in production the bucket column
    # is simply a stored column of the corpus).
    planes = S._hyperplanes(n_planes)
    e = S._sign_buckets_arrow(
        emb.select("vec_id", S.as_double("embedding").alias("v")),
        planes,
        "vec_id",
        dict(emb.dtypes)["vec_id"],
    ).persist()
    qrow = e.filter(F.col("vec_id") == 0).select("v", "bucket").first()
    qb = int(qrow["bucket"])
    # one folded-form cosine built once and shared by both probes and
    # the exact ranking (the Column-expression form cost ~1.3 s of
    # driver py4j time PER build, ~4 s here — see similarity.cosine_lit)
    cos_q = S.cosine_lit("v", [float(x) for x in qrow["v"]])

    def probe(buckets: list[int]) -> DataFrame:
        return (
            e.filter(F.col("bucket").isin(buckets))
            .filter(F.col("vec_id") != 0)
            .select(
                "vec_id",
                F.round(cos_q, 6).alias("cos_sim"),
            )
            .orderBy(F.col("cos_sim").desc(), "vec_id")
            .limit(k)
            .select("vec_id")
        )

    # exact top-k from the SAME persisted frame the probes read: e's "v"
    # is as_double(embedding) bit-preserved through Arrow and the cosine
    # is the identical expression, so this equals brute_force_topk(emb)
    # while skipping a second corpus scan and a second query-row job
    exact = (
        e.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(cos_q, 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(k)
        .select("vec_id")
    )
    probes = probe([qb]).select(
        "vec_id", F.lit("lsh").alias("method")
    ).unionByName(
        probe([qb] + [qb ^ (1 << i) for i in range(n_planes)]).select(
            "vec_id", F.lit("lsh_multiprobe").alias("method")
        )
    )
    # union the tagged probe sets BEFORE the single join against the
    # exact top-k, so the brute-force pass runs once for both methods;
    # the left join against the method list keeps 0-recall rows
    methods = spark.createDataFrame(
        [("lsh",), ("lsh_multiprobe",)], "method string"
    )
    hits = probes.join(exact, "vec_id").groupBy("method").agg(
        F.count("*").alias("hits")
    )
    return methods.join(hits, "method", "left").select(
        "method",
        F.lit(k).alias("k"),
        F.coalesce(F.col("hits"), F.lit(0)).alias("n_hits"),
        F.round(F.coalesce(F.col("hits"), F.lit(0)) / float(k), 4).alias(
            "recall"
        ),
    )


RECALL_EVAL_ORACLE = f"""
WITH bf AS ({SIMSEARCH_ORACLE}),
probe1 AS ({LSH_TOPK_ORACLE}),
probe2 AS ({LSH_MULTIPROBE_ORACLE})
SELECT 'lsh' AS method, 10 AS k, count(*) AS n_hits,
       round(count(*) / 10.0, 4) AS recall
FROM bf JOIN probe1 USING (vec_id)
UNION ALL
SELECT 'lsh_multiprobe' AS method, 10 AS k, count(*) AS n_hits,
       round(count(*) / 10.0, 4) AS recall
FROM bf JOIN probe2 USING (vec_id)
"""


# --- corpus quality / filtering ------------------------------------------------
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition profile (arXiv 2112.11446 §A1.1):
    token totals, distinct share, dominant token and its share."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return X.repetition_stats(docs)


REPETITION_ORACLE = """
WITH t AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
), c AS (
  SELECT doc_id, tok, count(*) AS n FROM t GROUP BY doc_id, tok
), r AS (
  SELECT doc_id, tok, n,
         CAST(sum(n) OVER (PARTITION BY doc_id) AS BIGINT) AS n_words,
         count(*) OVER (PARTITION BY doc_id) AS n_unique,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, tok) AS rn
  FROM c
)
SELECT doc_id, n_words, n_unique,
       round(n_unique * 1.0 / n_words, 6) AS unique_ratio,
       tok AS top_tok,
       round(n * 1.0 / n_words, 6) AS top_share
FROM r WHERE rn = 1
"""


def quality_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-battery document filter (C4 / Gopher heuristics): length
    bounds, mean word length, stopword presence, top-token repetition.
    Row-local flags plus one join against the repetition profile; `keep`
    is the conjunction — the shape of every public corpus-cleaning
    pipeline's first pass."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = X.whitespace_tokens(F.lower(F.col("text")))
    n_words = F.size(toks)
    mean_wlen = F.length(F.trim(F.col("text"))) / F.greatest(n_words, F.lit(1))
    sw = F.size(
        F.filter(toks, lambda t: t.isin(X.LANG_STOPWORDS["en"]))
    )
    flags = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        (n_words.between(30, 200)).alias("ok_len"),
        ((mean_wlen >= 3) & (mean_wlen <= 10)).alias("ok_wlen"),
        (sw >= 2).alias("ok_sw"),
    )
    rep = X.repetition_stats(docs).select(
        "doc_id", (F.col("top_share") <= 0.10).alias("ok_rep")
    )
    return flags.join(rep, "doc_id").select(
        "doc_id",
        "n_words",
        "ok_len",
        "ok_wlen",
        "ok_sw",
        "ok_rep",
        (
            F.col("ok_len") & F.col("ok_wlen") & F.col("ok_sw") & F.col("ok_rep")
        ).alias("keep"),
    )


QUALITY_FILTER_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
), flags AS (
  SELECT doc_id,
         len(toks) AS n_words,
         len(toks) BETWEEN 30 AND 200 AS ok_len,
         (length(trim(text)) * 1.0 / greatest(len(toks), 1)) BETWEEN 3 AND 10
           AS ok_wlen,
         len(list_filter(toks, t -> t IN ({_SW_EN}))) >= 2 AS ok_sw
  FROM base
), c AS (
  SELECT doc_id, tok, count(*) AS n
  FROM (SELECT doc_id, unnest(toks) AS tok FROM base) t
  GROUP BY doc_id, tok
), rep AS (
  SELECT doc_id, round(max(n) * 1.0 / sum(n), 6) <= 0.10 AS ok_rep
  FROM c GROUP BY doc_id
)
SELECT doc_id, n_words, ok_len, ok_wlen, ok_sw, ok_rep,
       ok_len AND ok_wlen AND ok_sw AND ok_rep AS keep
FROM flags JOIN rep USING (doc_id)
"""


#: Denylist for the scrub operator — corpus terms standing in for the
#: C4-style bad-words / PII patterns (the fixture corpus has no real PII;
#: the regexp machinery is identical for any pattern set).
BLOCKLIST_PATTERN = "\\b(spark|vector|hash)\\b"


def blocklist_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist scrubbing: count and redact blocklisted terms (the C4
    bad-words / PII-redaction shape — regexp_count + regexp_replace, all
    row-local JVM built-ins). Flags documents whose redaction density
    exceeds 5% of tokens."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    hits = F.regexp_count(F.col("text"), F.lit(BLOCKLIST_PATTERN))
    cleaned = F.regexp_replace(F.col("text"), BLOCKLIST_PATTERN, "<removed>")
    n_words = F.size(X.whitespace_tokens("text"))
    return docs.select(
        "doc_id",
        hits.alias("n_redactions"),
        F.length(cleaned).alias("clean_n_chars"),
        (hits / F.greatest(n_words, F.lit(1)) > 0.05).alias("flagged"),
    )


BLOCKLIST_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{BLOCKLIST_PATTERN}')) AS INTEGER)
         AS n_redactions,
       CAST(length(regexp_replace(text, '{BLOCKLIST_PATTERN}', '<removed>', 'g'))
         AS INTEGER) AS clean_n_chars,
       len(regexp_extract_all(text, '{BLOCKLIST_PATTERN}')) * 1.0
         / greatest(len(string_split_regex(trim(text), '\\s+')), 1) > 0.05
         AS flagged
FROM documents
"""


def doc_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the hash is taken over the
    GROUP key (source), not the document, so every document of a source
    lands in the same split — the standard guard against near-duplicate
    leakage across splits (split by domain/site, not by page). Row-local
    md5 assignment + one aggregate."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", M.split_assignment("source", 0.8, 0.1))
        .groupBy("split")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count("*").alias("n_docs"),
        )
    )


GROUP_SPLIT_ORACLE = """
WITH s AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('split-' || source), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
)
SELECT CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       count(DISTINCT source) AS n_sources,
       count(*) AS n_docs
FROM s GROUP BY 1
"""


def curriculum_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum data selection under a token budget — the
    "spend my N training tokens on the best documents" decision, as a
    composition of the verified building blocks: quality scores
    (text_stats) -> global curriculum position by (quality DESC, doc_id)
    via the composite-key range-partition index -> running token total
    against the budget via the sequence-packing machinery. ``in_budget``
    marks the curriculum prefix whose cumulative token count (before the
    doc) is under 20k — the straddling document is kept, the
    cumulative-binning contract of pack_sequences.

    Plan shape: one range exchange + O(partitions) offset side jobs —
    never a single-task global window over the corpus (that is the
    oracle's spelling, not the operator's)."""
    from nyc_taxi_data_pipeline_elt_spark.operators.indexing import (
        pack_sequences,
        with_global_index,
    )

    tune(spark)
    budget = 20_000
    stats = text_stats(spark, sf_dir).select("doc_id", "n_tokens", "quality")
    ranked = with_global_index(
        stats.withColumn("negq", -F.col("quality")),
        ["negq", "doc_id"],
        index_name="cur_pos",
    )
    packed = pack_sequences(
        ranked, capacity=budget, weight_col="n_tokens", order_col="cur_pos"
    )
    return packed.select(
        "doc_id",
        "quality",
        F.col("cur_pos").cast("long").alias("cur_pos"),
        (F.col("seq_id") == 0).alias("in_budget"),
    )


CURRICULUM_ORACLE = f"""
WITH stats AS ({TEXT_STATS_ORACLE}),
ordered AS (
  SELECT doc_id, quality,
         row_number() OVER (ORDER BY quality DESC, doc_id) - 1 AS cur_pos,
         coalesce(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS before_toks
  FROM stats
)
SELECT doc_id, quality, CAST(cur_pos AS BIGINT) AS cur_pos,
       before_toks < 20000 AS in_budget
FROM ordered
"""


def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus datasheet — the curation dashboard every
    training-data pipeline publishes: document/token volumes, quality
    score, and the quality-filter keep rate, composed from the same
    operator frames users query individually (filters + profile join,
    then one aggregate per source)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    stats = text_stats(spark, sf_dir).select("doc_id", "n_tokens", "quality")
    keep = quality_filter_docs(spark, sf_dir).select("doc_id", "keep")
    joined = docs.select("doc_id", "source").join(stats, "doc_id").join(
        keep, "doc_id"
    )
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.sum(F.col("keep").cast("long")).alias("n_keep"),
        F.round(
            F.sum(F.col("keep").cast("long")) / F.count("*"), 4
        ).alias("keep_rate"),
    )


CORPUS_DATASHEET_ORACLE = f"""
WITH stats AS ({TEXT_STATS_ORACLE}),
keepf AS ({QUALITY_FILTER_ORACLE})
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(s.n_tokens) AS BIGINT) AS n_tokens,
       round(avg(s.quality), 4) AS avg_quality,
       CAST(sum(CASE WHEN k.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       round(sum(CASE WHEN k.keep THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
         AS keep_rate
FROM documents d
JOIN stats s USING (doc_id)
JOIN keepf k USING (doc_id)
GROUP BY d.source
"""


def curate_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pipeline, composed from the same operator
    frames users run individually — the FineWeb/C4 shape in one plan:

      1. quality-rule filter (keep only rule-passing docs),
      2. exact dedup (lowest doc id per md5(text)),
      3. MinHash-LSH near-dup pruning on the survivors (drop the higher
         id of every candidate pair),
      4. per-source datasheet of the final corpus.

    Each stage consumes the previous stage's frame, so Catalyst plans
    the whole pipeline as one DAG — no materialization between stages —
    and every shuffle is one of the stages' own (filter join, dedup
    window, band-key join). The oracle composes the same stages from
    the individually-verified oracle fragments, scoped to the curated
    subset via the parametrized MinHash CTE."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    keep = quality_filter_docs(spark, sf_dir).filter(F.col("keep")).select(
        "doc_id"
    )
    filtered = docs.join(keep, "doc_id")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = (
        filtered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    drops = (
        D.minhash_lsh_pairs(exact)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    final = exact.join(drops, "doc_id", "left_anti")
    return final.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(X.whitespace_tokens("text"))).alias("n_tokens"),
    )


CURATION_ORACLE = f"""
WITH keepq AS ({QUALITY_FILTER_ORACLE}),
filtered AS (
  SELECT d.* FROM documents d JOIN keepq k USING (doc_id) WHERE k.keep
),
exact AS (
  SELECT * FROM filtered
  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
),
pairs AS ({{MINHASH}}),
drops AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
final AS (
  SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM drops)
)
SELECT source, count(*) AS n_docs,
       CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
         AS n_tokens
FROM final GROUP BY source
"""



def embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-corpus sanity profile before any ANN indexing: L2-norm
    order statistics plus the count of near-zero vectors (the rows that
    break cosine math and IVF training). Norms are the unrolled
    left-to-right dot (bit-identical to list_dot_product) under sqrt —
    order statistics and comparisons only, no cross-row float
    summation, so the profile is engine-exact; percentiles follow the
    order_price_percentiles recipe (exact percentile + 2dp round).
    One scan, one 1-row aggregate."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    v = S.as_double("embedding")
    # peak |coordinate| as an unrolled greatest-chain (codegen'd, like
    # the dot products) — the "is any dimension dominating?" signal;
    # the fixture's unit norms make the norm stats a (correct)
    # constant-1 confirmation, the peak distribution varies per vector
    peak = F.greatest(
        *[F.abs(F.element_at(v, i + 1)) for i in range(S.EMBED_DIM)]
    )
    norms = emb.select(
        F.sqrt(S.dot(v, v)).alias("nrm"), peak.alias("peak")
    )
    return norms.agg(
        F.count("*").alias("n_vectors"),
        F.round(F.min("nrm"), 2).alias("min_norm"),
        F.round(F.expr("percentile(nrm, 0.5)"), 2).alias("median_norm"),
        F.round(F.max("nrm"), 2).alias("max_norm"),
        F.sum((F.col("nrm") < 0.1).cast("long")).alias("n_near_zero"),
        F.round(F.expr("percentile(peak, 0.5)"), 2).alias("median_peak"),
        F.round(F.expr("percentile(peak, 0.99)"), 2).alias("p99_peak"),
        F.round(F.max("peak"), 2).alias("max_peak"),
    )


NORM_PROFILE_ORACLE = """
WITH norms AS (
  SELECT sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
           AS nrm,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS peak
  FROM embeddings
)
SELECT count(*) AS n_vectors,
       round(min(nrm), 2) AS min_norm,
       round(quantile_cont(nrm, 0.5), 2) AS median_norm,
       round(max(nrm), 2) AS max_norm,
       CAST(sum(CASE WHEN nrm < 0.1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_near_zero,
       round(quantile_cont(peak, 0.5), 2) AS median_peak,
       round(quantile_cont(peak, 0.99), 2) AS p99_peak,
       round(max(peak), 2) AS max_peak
FROM norms
"""


def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup tuning curve: how many candidate pairs survive at each
    Jaccard threshold — the one-pass sweep an operator runs before
    committing a near-dup cutoff for a corpus. Exact jaccard is
    computed ONCE over the inverted-index candidates (pairs sharing
    >= 1 shingle) and the per-threshold counts are conditional sums in
    a single 1-row aggregate; integer counts, no re-scans."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.0)
    return pairs.agg(
        F.count("*").alias("n_candidates"),
        *[
            F.sum((F.col("jaccard") >= t).cast("long")).alias(
                f"n_ge_{str(t).replace('.', '')}"
            )
            # thresholds chosen to straddle the corpus's jaccard knee
            # (noise-overlap pairs die between 0.01 and 0.05; true
            # near-dups persist through 0.9)
            for t in (0.01, 0.02, 0.05, 0.3, 0.9)
        ],
    )


THRESHOLD_SWEEP_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
  FROM toks WHERE len(t) >= 3
), inv AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
j AS (
  SELECT round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jac
  FROM common
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
)
SELECT count(*) AS n_candidates,
       CAST(sum(CASE WHEN jac >= 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_001,
       CAST(sum(CASE WHEN jac >= 0.02 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_002,
       CAST(sum(CASE WHEN jac >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_005,
       CAST(sum(CASE WHEN jac >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_03,
       CAST(sum(CASE WHEN jac >= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_09
FROM j
"""


def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation for the TEXT dedup path (the analog of
    simsearch_recall_eval for MinHash-LSH): candidate recall and
    precision of the banded LSH index against the exact n-gram-Jaccard
    >= 0.5 pair set — the acceptance gate for choosing (bands, rows)
    before a production dedup run. Composed from the two
    independently-verified operator frames; counts are 1-row
    aggregates cross-joined broadcast (the house never-collect scalar
    pattern), ratios raw IEEE divisions of exact integers.

    At 100 TB the exact side is the expensive one (inverted-index
    join) — production runs it on a sample; the composition is
    unchanged."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    exact = D.ngram_jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    cand = D.minhash_lsh_pairs(docs)
    n_exact = exact.agg(F.count("*").alias("n_exact"))
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    n_hits = (
        cand.join(exact, ["doc_a", "doc_b"])
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        n_exact.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_hits))
        .select(
            "n_exact",
            "n_candidates",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_exact")).alias(
                "lsh_recall"
            ),
            (F.col("n_hits").cast("double") / F.col("n_candidates")).alias(
                "lsh_precision"
            ),
        )
    )


LSH_RECALL_EVAL_ORACLE = f"""
WITH exact AS ({NGRAM_JACCARD_ORACLE}),
cand AS ({{MINHASH}}),
ne AS (SELECT count(*) AS n_exact FROM exact),
nc AS (SELECT count(*) AS n_candidates FROM cand),
nh AS (SELECT count(*) AS n_hits
       FROM cand c JOIN exact e
         ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b)
SELECT n_exact, n_candidates, n_hits,
       CAST(n_hits AS DOUBLE) / n_exact AS lsh_recall,
       CAST(n_hits AS DOUBLE) / n_candidates AS lsh_precision
FROM ne, nc, nh
"""


def dedup_spans_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level repeated-span removal (the C4 / RefinedWeb exact
    span dedup): every 10-token window that already appeared anywhere
    in the corpus is dropped, documents are reassembled from the
    surviving spans. See operators/dedup.py:span_dedup_docs for the
    plan shape (two shuffles total at any corpus size)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.span_dedup_docs(docs, span=10)


def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection per near-dup cluster: the dedup
    DECISION a production pipeline ships — not the lowest doc_id but
    the best document (longest, tie-break lowest id) of each MinHash
    connected component is kept. One window over the component frame
    (edge-sized, tiny next to the corpus) after a join with the
    documents' length column; clusters come from the same
    minhash_lsh_pairs -> connected_components path the dedup_clusters
    query verifies."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs)
    comp = D.connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_rep")
    )
    member = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_rep").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        member.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n_members", F.count("*").over(Window.partitionBy("cluster_rep"))
        )
        .filter(F.col("rk") == 1)
        .select(
            "cluster_rep",
            F.col("doc_id").alias("canonical_doc_id"),
            F.col("n_chars").alias("canonical_chars"),
            "n_members",
        )
    )


CANONICAL_DOCS_ORACLE = f"""
WITH comp AS ({_clusters_oracle()}), m AS (
  SELECT c.cluster_rep, d.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster_rep
                            ORDER BY d.n_chars DESC, d.doc_id) AS rk,
         count(*) OVER (PARTITION BY c.cluster_rep) AS n_members
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT cluster_rep, doc_id AS canonical_doc_id,
       n_chars AS canonical_chars, n_members
FROM m WHERE rk = 1
"""


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss compression of the embedding corpus to 8
    coordinates against fixed hyperplane literals — see
    operators/similarity.py:random_project (one Arrow narrow stage,
    zero shuffles)."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return S.random_project(emb, out_dim=8)


def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus (operators/text.py:redact_pii): mask
    emails / SSNs / phones / IPv4s with typed tags and report per-doc
    match counts. The fixture text is synthetic word salad with no PII,
    so the discriminating surface is built deterministically from key
    columns — every doc gets an email + IP, every 3rd a phone, every
    5th an SSN — then scrubbed; the output hash proves both the rewrite
    and that clean text passes through byte-identical.

    Plan: map-only (regex chain inside whole-stage codegen), zero
    shuffles, zero Python — at 100 TB this is the ideal scrub shape.
    """
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    payload = F.concat_ws(
        " ",
        F.substring("text", 1, 80),
        F.concat(F.lit("user"), "doc_id", F.lit("@"), "source", F.lit(".net")),
        F.concat(
            F.lit("10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
        ),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("call 555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad(((F.col("doc_id") * 3) % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit("ssn 123-45-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    counts = X.pii_counts(payload)
    return docs.select(
        "doc_id",
        *[counts[k].alias(f"n_{k}") for k in ("email", "ssn", "phone", "ipv4")],
        F.md5(X.redact_pii(payload)).alias("redacted_md5"),
    )


# concat_ws skips NULLs but joins empty strings WITH a separator; the
# oracle mirrors the Spark construction exactly (CASE yields '' so both
# engines emit the same trailing-space layout before the md5).
_PII_PAYLOAD_SQL = """
  concat_ws(' ',
    substr(text, 1, 80),
    'user' || doc_id || '@' || source || '.net',
    '10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256),
    CASE WHEN doc_id % 3 = 0
         THEN 'call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
              || '-' || lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0')
         ELSE '' END,
    CASE WHEN doc_id % 5 = 0
         THEN 'ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE '' END)
"""

PII_REDACT_ORACLE = f"""
WITH p AS (
  SELECT doc_id, {_PII_PAYLOAD_SQL} AS payload FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(payload,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
       len(regexp_extract_all(payload,
           '\\b[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}\\b')) AS n_ssn,
       len(regexp_extract_all(payload,
           '\\b[0-9]{{3}}[-.][0-9]{{3}}[-.][0-9]{{4}}\\b')) AS n_phone,
       len(regexp_extract_all(payload,
           '\\b[0-9]{{1,3}}(\\.[0-9]{{1,3}}){{3}}\\b')) AS n_ipv4,
       md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(payload,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
           '\\b[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}\\b', '<SSN>', 'g'),
           '\\b[0-9]{{3}}[-.][0-9]{{3}}[-.][0-9]{{4}}\\b', '<PHONE>', 'g'),
           '\\b[0-9]{{1,3}}(\\.[0-9]{{1,3}}){{3}}\\b', '<IP>', 'g')) AS redacted_md5
FROM p
"""


def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights — the multilingual
    mixing rule (public mT5/XLM-R recipe): w_i ∝ p_i^alpha with
    alpha=0.3, p_i the source's token share. Upweights tail sources,
    downweights the head; ``expected_docs`` is the per-source draw
    count for a 1000-doc budget under the reweighted distribution.

    Plan: one map-side-combined agg to O(#sources) rows, then the
    normalization runs over that metadata-sized frame via a 1-row
    broadcast cross join — no second scan, no window, no collect."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(X.token_count("text")).alias("n_tokens"),
    )
    tot = per_src.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum(F.pow(F.col("n_tokens"), F.lit(0.3))).alias("tot_pow"),
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("tot_tokens"), 6).alias("p_raw"),
            F.round(
                F.pow(F.col("n_tokens"), F.lit(0.3)) / F.col("tot_pow"), 6
            ).alias("p_temp"),
            F.round(
                F.pow(F.col("n_tokens"), F.lit(0.3)) / F.col("tot_pow") * 1000
            )
            .cast("long")
            .alias("expected_docs"),
        )
        .orderBy("source")
    )


MIXTURE_TEMPERATURE_ORACLE = """
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(n_tokens) AS tot_tokens, sum(pow(n_tokens, 0.3)) AS tot_pow
  FROM per_src
)
SELECT source, n_docs, n_tokens,
       round(n_tokens / tot_tokens, 6) AS p_raw,
       round(pow(n_tokens, 0.3) / tot_pow, 6) AS p_temp,
       CAST(round(pow(n_tokens, 0.3) / tot_pow * 1000) AS BIGINT) AS expected_docs
FROM per_src, tot
ORDER BY source
"""


def embedding_standardize_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus standardization profile: mean / population
    stddev for each of the 64 coordinates, plus how many vectors sit
    beyond 3 sigma in that dimension — the feature-scaling pass that
    precedes k-means / PQ codebook training, and the outlier screen.

    Plan: standardization is inherently two-pass (the z-rule needs the
    moments first). Pass 1: posexplode (narrow) into one hash agg keyed
    by position — 64 result rows of metadata. Pass 2: re-scan with the
    64-row stats frame BROADCAST back onto the exploded rows (never a
    shuffle join, never a collect) and count the 3-sigma exceedances.
    Float-sum order varies with partitioning, so moments are rounded to
    4dp and the outlier rule uses a wide margin (3 sigma) — integer
    verdicts stay stable across engines. The rounded mean is
    additionally canonicalized with ``+ 0.0`` on BOTH engines: a
    zero-mean dimension can round to IEEE negative zero, and the two
    engines disagree on the sign (DuckDB's round preserves -0.0,
    Spark's drops it) — caught by the r7 third-scale differential at
    sf0.1, invisible at the driver's sf0.01."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    )
    agg = pos.groupBy("dim").agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mu"),
        F.stddev_pop("x").alias("sigma"),
        F.max(F.abs("x")).alias("max_abs"),
    )
    z_out = (
        pos.join(F.broadcast(agg.select("dim", "mu", "sigma")), "dim")
        .filter(F.abs(F.col("x") - F.col("mu")) > 3 * F.col("sigma"))
        .groupBy("dim")
        .agg(F.count("*").alias("n_outlier3s"))
    )
    return (
        agg.join(z_out, "dim", "left")
        .select(
            "dim",
            "n",
            (F.round("mu", 4) + F.lit(0.0)).alias("mu"),
            F.round("sigma", 4).alias("sigma"),
            F.round("max_abs", 4).alias("max_abs"),
            F.coalesce("n_outlier3s", F.lit(0)).cast("long").alias("n_outlier3s"),
        )
        .orderBy("dim")
    )


EMBEDDING_STANDARDIZE_ORACLE = """
WITH pos AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding) AS x
  FROM embeddings
), agg AS (
  SELECT dim, count(*) AS n, avg(x) AS mu, stddev_pop(x) AS sigma,
         max(abs(x)) AS max_abs
  FROM pos GROUP BY dim
), z AS (
  SELECT p.dim, count(*) AS n_outlier3s
  FROM pos p JOIN agg a ON p.dim = a.dim
  WHERE abs(p.x - a.mu) > 3 * a.sigma
  GROUP BY p.dim
)
SELECT a.dim, a.n, round(a.mu, 4) + 0.0 AS mu, round(a.sigma, 4) AS sigma,
       round(a.max_abs, 4) AS max_abs,
       CAST(coalesce(z.n_outlier3s, 0) AS BIGINT) AS n_outlier3s
FROM agg a LEFT JOIN z ON a.dim = z.dim
ORDER BY a.dim
"""


def audio_energy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document audio energy profile through the REAL (codec-free)
    media path: deterministic int16 PCM synthesized into a true binary
    column (operators/multimodal.py:synthesize_pcm — the audio-ingest
    stand-in), frames decoded with np.frombuffer and reduced to INTEGER
    sum-of-squares/peak per frame (audio_frame_stats), then silence
    ratio + RMS computed engine-side. Unlike the image/video decode
    stubs this is end-to-end executable here: PCM needs no codec.

    Plan: two narrow Arrow stages (synthesize, frame) + one hash agg on
    doc_id — no shuffle until the final O(docs x frames) aggregate. The
    Python boundary emits only integers, so all float math happens in
    engine SQL where the oracle replays it exactly; samples themselves
    are engine-exact (integer phase reduction before sin, floor(x+0.5)
    quantization — see _pcm_samples)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    frames = MM.audio_frame_stats(MM.synthesize_pcm(docs))
    # milli-RMS as an INTEGER: IEEE sqrt is correctly rounded, so
    # floor(sqrt(x)*1000 + 0.5) is bit-identical cross-engine, and the
    # per-doc SUM of integers is exact — no float mean to land on a
    # rounding boundary (a 3dp-rounded avg did, 1590.9555 exactly).
    rms_milli = F.floor(
        F.sqrt(F.col("sumsq") / F.lit(MM.AUDIO_FRAME)) * 1000 + F.lit(0.5)
    ).cast("long")
    per_frame = frames.select(
        "doc_id",
        "sumsq",
        "peak",
        rms_milli.alias("rms_milli"),
        (F.col("peak") < 100).cast("int").alias("silent"),
    )
    return per_frame.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.sum("silent").cast("long").alias("n_silent"),
        F.max("peak").alias("peak_amp"),
        F.sum("rms_milli").cast("long").alias("sum_rms_milli"),
        F.max("sumsq").alias("max_frame_sumsq"),
    )


# closed-form replay of the synthesizer: generate_series stands in for
# np.arange, the integer phase reduction and floor(x+0.5) quantization
# are verbatim — so even though DuckDB never sees the binary payload,
# every frame statistic is computed from the identical int16 samples
AUDIO_ENERGY_ORACLE = f"""
WITH d AS (
  SELECT doc_id, 800 + (doc_id % 5) * 400 AS n FROM documents
), t AS (
  SELECT doc_id, unnest(generate_series(0, n - 1)) AS t FROM d
), samp AS (
  SELECT doc_id, t // {MM.AUDIO_FRAME} AS frame_idx,
         CASE WHEN ((t // {MM.AUDIO_FRAME}) % 4) = (doc_id % 4) THEN 0
              ELSE CAST(floor(3000.0 * sin(
                     2 * pi() * (((200 + (doc_id % 40) * 20) * t) % {MM.AUDIO_SR})
                     / {MM.AUDIO_SR}.0) + 0.5) AS BIGINT)
         END AS s
  FROM t
), fr AS (
  SELECT doc_id, frame_idx, sum(s * s) AS sumsq, max(abs(s)) AS peak
  FROM samp GROUP BY doc_id, frame_idx
), pf AS (
  SELECT doc_id, sumsq, peak,
         CAST(floor(sqrt(sumsq / {MM.AUDIO_FRAME}.0) * 1000 + 0.5) AS BIGINT)
           AS rms_milli,
         CASE WHEN peak < 100 THEN 1 ELSE 0 END AS silent
  FROM fr
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(silent) AS BIGINT) AS n_silent,
       CAST(max(peak) AS INT) AS peak_amp,
       CAST(sum(rms_milli) AS BIGINT) AS sum_rms_milli,
       CAST(max(sumsq) AS BIGINT) AS max_frame_sumsq
FROM pf GROUP BY doc_id
"""


def image_luma_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image statistics through the raw-bitmap (codec-free) image
    path: synthesize_rgb materializes a true RGB888 binary column,
    image_stats decodes it with np.frombuffer and emits exact-integer
    channel sums, BT.601 bright-pixel counts, and the luma sum of a 2x
    nearest-neighbor downsample — decode + feature-extract + resize as
    REAL compute; only container parsing (PNG/JPEG) stays behind the
    real_decode probe. Two narrow Arrow stages, zero shuffles; the
    oracle regenerates every pixel closed-form."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return MM.image_stats(MM.synthesize_rgb(docs))


IMAGE_LUMA_ORACLE = f"""
WITH px AS (
  SELECT d.doc_id, x.x AS x, y.y AS y,
         (d.doc_id * 7 + x.x * 3 + y.y * 5) % 256 AS r,
         (d.doc_id * 11 + x.x + 2 * y.y) % 256 AS g,
         (d.doc_id + x.x * y.y) % 256 AS b
  FROM documents d,
       generate_series(0, {MM.IMG_W - 1}) AS x(x),
       generate_series(0, {MM.IMG_H - 1}) AS y(y)
), l AS (
  SELECT doc_id, x, y, r, g, b, 299 * r + 587 * g + 114 * b AS luma FROM px
)
SELECT doc_id,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b,
       CAST(sum(CASE WHEN luma > 128000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bright,
       CAST(sum(CASE WHEN x % 2 = 0 AND y % 2 = 0 THEN luma ELSE 0 END)
            AS BIGINT) AS ds_luma_sum
FROM l GROUP BY doc_id
"""


def video_motion_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-motion profile through the raw-frame (codec-free) video
    path: synthesize_video stacks 4-7 gray frames per doc into one
    binary payload, video_motion_stats frame-differences them into
    exact-integer absolute-delta sums — the static-clip/scene-change
    screen run before frame sampling for vision-language corpora.
    Same closed-form-oracle contract as the audio/image legs."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    prof = MM.video_motion_stats(MM.synthesize_video(docs))
    return prof.withColumn(
        "n_frames", (4 + F.col("doc_id") % 4).cast("int")
    )


VIDEO_MOTION_ORACLE = f"""
WITH v AS (
  SELECT doc_id, 4 + doc_id % 4 AS nf FROM documents
), fr AS (
  SELECT doc_id, nf, unnest(generate_series(0, nf - 1)) AS f FROM v
), px AS (
  SELECT fr.doc_id, fr.nf, fr.f,
         (fr.doc_id * 7 + x.x * 3 + y.y * 5 + fr.f * 17) % 256 AS val,
         (fr.doc_id * 7 + x.x * 3 + y.y * 5 + (fr.f - 1) * 17) % 256 AS prev
  FROM fr,
       generate_series(0, {MM.VID_W - 1}) AS x(x),
       generate_series(0, {MM.VID_H - 1}) AS y(y)
), pair AS (
  SELECT doc_id, f, sum(abs(val - prev)) AS pair_motion
  FROM px WHERE f >= 1 GROUP BY doc_id, f
), frames AS (
  SELECT doc_id,
         sum(CASE WHEN f = 0 THEN val ELSE 0 END) AS first_frame_sum,
         sum(CASE WHEN f = nf - 1 THEN val ELSE 0 END) AS last_frame_sum
  FROM px GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(sum(p.pair_motion) AS BIGINT) AS total_motion,
       CAST(max(p.pair_motion) AS BIGINT) AS max_pair_motion,
       CAST(max(fs.first_frame_sum) AS BIGINT) AS first_frame_sum,
       CAST(max(fs.last_frame_sum) AS BIGINT) AS last_frame_sum,
       CAST(max(fs2.nf) AS INT) AS n_frames
FROM pair p
JOIN frames fs ON p.doc_id = fs.doc_id
JOIN v fs2 ON p.doc_id = fs2.doc_id
GROUP BY p.doc_id
"""


def quality_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score calibration: per-source quantile rank of the
    quality score (percent_rank within source) — the normalization that
    makes 'top 30% of every source' a meaningful curation rule when raw
    score distributions differ per source (they do: each source's crawl
    and boilerplate profile shifts the score mass). Emits per-doc raw
    quality, in-source quantile, and the keep verdict at the 0.7
    quantile cutoff, plus a tie-stable in-source rank.

    Plan: ONE window partitioned by source — a keyed shuffle that scales
    with the source count and balances like any hash partition (a
    single-source corpus would degenerate; real corpora have hundreds).
    percent_rank needs no second pass; the tiebreak (quality DESC,
    doc_id) pins cross-engine determinism."""
    tune(spark)
    stats = text_stats(spark, sf_dir).select("doc_id", "quality")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    scored = docs.join(stats, "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.col("quality").asc(), F.col("doc_id").asc()
    )
    return scored.select(
        "doc_id",
        "source",
        "quality",
        F.round(F.percent_rank().over(w), 6).alias("q_in_source"),
        (F.percent_rank().over(w) >= 0.7).alias("keep_top30"),
        F.row_number().over(w).cast("long").alias("rk_in_source"),
    )


QUALITY_QNORM_ORACLE = f"""
WITH stats AS ({{TEXT_STATS_ORACLE}}), scored AS (
  SELECT d.doc_id, d.source, s.quality
  FROM documents d JOIN stats s ON d.doc_id = s.doc_id
)
SELECT doc_id, source, quality,
       round(percent_rank() OVER w, 6) AS q_in_source,
       percent_rank() OVER w >= 0.7 AS keep_top30,
       CAST(row_number() OVER w AS BIGINT) AS rk_in_source
FROM scored
WINDOW w AS (PARTITION BY source ORDER BY quality ASC, doc_id ASC)
""".format(TEXT_STATS_ORACLE=TEXT_STATS_ORACLE)


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First merge decision of BPE tokenizer training: corpus-weighted
    adjacent character-pair counts, top 15 by count (the pair a trainer
    would merge first). Uses the vocab-first trick every real BPE
    trainer uses at scale: aggregate the corpus to (word, count) ONCE —
    the only full-data shuffle — then explode pairs over the (tiny)
    vocabulary and weight by word count; pair volume scales with vocab
    size, not corpus size. Deterministic tiebreak (count DESC, pair)
    makes the top-k engine-exact."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(X.whitespace_tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    pairs = (
        vocab.filter(F.length("w") >= 2)
        .select(
            "w",
            "n",
            F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        )
        .select(F.expr("substring(w, i, 2)").alias("pair"), "n")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(15)
    )


BPE_PAIR_ORACLE = """
WITH w AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
), v AS (
  SELECT w, count(*) AS n FROM w GROUP BY w
), ex AS (
  SELECT w, n, unnest(generate_series(1, length(w) - 1)) AS i
  FROM v WHERE length(w) >= 2
)
SELECT substr(w, i, 2) AS pair, CAST(sum(n) AS BIGINT) AS cnt
FROM ex GROUP BY pair
ORDER BY cnt DESC, pair LIMIT 15
"""


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise content overlap between sources — the "which feeds
    duplicate each other" report that decides crawl budgets: for every
    ordered source pair (a < b), how many distinct key-collision
    fingerprints (operators/text.py:fingerprint) appear in both.

    Plan: corpus -> distinct (fingerprint, source) — one shuffle keyed
    on the fingerprint — then a self-equi-join ON THE FINGERPRINT
    (quadratic only in the per-fingerprint source list, bounded by
    #sources) and a hash agg to the #sources^2-row matrix. Never an
    all-pairs doc join."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        X.fingerprint("text").alias("fp"), "source"
    ).distinct()
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared_fp"))
        .orderBy("src_a", "src_b")
    )


SOURCE_OVERLAP_ORACLE = """
WITH fp AS (
  SELECT DISTINCT
         md5(array_to_string(list_sort(list_distinct(
           string_split_regex(trim(lower(text)), '\\s+'))), ' ')) AS fp,
         source
  FROM documents
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(count(*) AS BIGINT) AS n_shared_fp
FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY src_a, src_b
"""


def source_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-novelty attribution: processing sources in
    lexicographic order, how many distinct 3-gram shingles does each
    source introduce that no earlier source contains — the statistic
    behind "does adding this feed buy new content or re-crawl the
    web". Each distinct shingle is attributed to its MIN source (one
    shuffle keyed on the shingle, min is order-insensitive), then a
    hash agg counts introductions per source; cum_novel is the running
    union size over the O(#sources) result frame."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    first = (
        D.shingle_rows(docs, n=3)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("s")
        .agg(F.min("source").alias("first_source"))
    )
    per_src = first.groupBy("first_source").agg(
        F.count("*").cast("long").alias("n_novel")
    )
    # O(#sources) rows: a metadata-sized frame, so the running union is
    # deliberately a single partition — pmod(n_novel, 1) is 0 for every
    # row but not foldable, which silences the WindowExec no-partition
    # warning without changing the partition count (indexing.py trick)
    w = (
        Window.partitionBy(F.pmod(F.col("n_novel"), F.lit(1)))
        .orderBy("first_source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_src.select(
        F.col("first_source").alias("source"),
        "n_novel",
        F.sum("n_novel").over(w).cast("long").alias("cum_novel"),
    ).orderBy("source")


SOURCE_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
), sh AS (
  SELECT doc_id, source,
         unnest(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM toks WHERE len(t) >= 3
), first AS (
  SELECT s, min(source) AS first_source FROM sh GROUP BY s
), per_src AS (
  SELECT first_source AS source, CAST(count(*) AS BIGINT) AS n_novel
  FROM first GROUP BY first_source
)
SELECT source, n_novel,
       CAST(sum(n_novel) OVER (ORDER BY source
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_novel
FROM per_src ORDER BY source
"""


QUERIES = {
    "dedup_exact_docs": dedup_exact_docs,
    "dedup_fingerprint_docs": dedup_fingerprint_docs,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_minhash_lsh_capped": dedup_minhash_lsh_capped,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
    "simsearch_bruteforce_topk": simsearch_bruteforce_topk,
    "embedding_neardup_pairs": embedding_neardup_pairs,
    "embedding_neardup_blocked": embedding_neardup_blocked,
    "simsearch_ivf_topk": simsearch_ivf_topk,
    "simsearch_pq_topk": simsearch_pq_topk,
    "simsearch_pq_rerank": simsearch_pq_rerank,
    "simsearch_ivf_multiprobe": simsearch_ivf_multiprobe,
    "simsearch_ivf_kmeans": simsearch_ivf_kmeans,
    "simsearch_lsh_topk": simsearch_lsh_topk,
    "simsearch_lsh_multiprobe": simsearch_lsh_multiprobe,
    "knn_join_embeddings": knn_join_embeddings,
    "source_quality_udaf": source_quality_udaf,
    "text_stats": text_stats,
    "lang_id_docs": lang_id_docs,
    "multimodal_meta": multimodal_meta,
    "shard_assignment": shard_assignment,
    "tfidf_top_terms": tfidf_top_terms,
    "dedup_clusters": dedup_clusters,
    "dedup_incremental_minhash": dedup_incremental_minhash,
    "decontaminate_train_docs": decontaminate_train_docs,
    "semantic_decontaminate": semantic_decontaminate,
    "chunk_documents": chunk_documents,
    "doc_sample_split": doc_sample_split,
    "doc_bottomk_sample": doc_bottomk_sample,
    "doc_weighted_sample": doc_weighted_sample,
    "doc_mixture_sample": doc_mixture_sample,
    "bigrams_udtf": bigrams_udtf,
    "unigram_lm_scores": unigram_lm_scores,
    "dsir_importance_select": dsir_importance_select,
    "embedding_quantize": embedding_quantize,
    "doc_quota_sample": doc_quota_sample,
    "doc_global_index": doc_global_index,
    "pack_training_sequences": pack_training_sequences,
    "doc_vowel_stats_pandas_udf": doc_vowel_stats_pandas_udf,
    "embedding_kmeans": embedding_kmeans,
    "semdedup_prune": semdedup_prune_embeddings,
    "simsearch_recall_eval": simsearch_recall_eval,
    "doc_repetition_stats": doc_repetition_stats,
    "quality_filter_docs": quality_filter_docs,
    "blocklist_scrub_docs": blocklist_scrub_docs,
    "doc_group_split": doc_group_split,
    "bigram_lm_scores": bigram_lm_scores,
    "vocab_coverage": vocab_coverage,
    "winnow_fingerprint_docs": winnow_fingerprint_docs,
    "doc_char_entropy": doc_char_entropy,
    "corpus_datasheet": corpus_datasheet,
    "curriculum_budget_selection": curriculum_budget_selection,
    "kmv_distinct_tokens": kmv_distinct_tokens,
    "classifier_score_docs": classifier_score_docs,
    "dedup_containment_pairs": dedup_containment_pairs,
    "curate_corpus_pipeline": curate_corpus_pipeline,
    "dedup_spans_corpus": dedup_spans_corpus,
    "dedup_canonical_docs": dedup_canonical_docs,
    "embedding_random_projection": embedding_random_projection,
    "pii_redact_docs": pii_redact_docs,
    "mixture_temperature_weights": mixture_temperature_weights,
    "embedding_standardize_profile": embedding_standardize_profile,
    "audio_energy_profile": audio_energy_profile,
    "image_luma_profile": image_luma_profile,
    "video_motion_profile": video_motion_profile,
    "quality_quantile_normalize": quality_quantile_normalize,
    "bpe_pair_counts": bpe_pair_counts,
    "source_overlap_matrix": source_overlap_matrix,
    "source_novelty_curve": source_novelty_curve,
    "dedup_lsh_recall_eval": dedup_lsh_recall_eval,
    "props_extract_udtf": props_extract_udtf,
    "dedup_threshold_sweep": dedup_threshold_sweep,
    "embedding_norm_profile": embedding_norm_profile,
}

ORACLE = {
    "dedup_exact_docs": DEDUP_EXACT_ORACLE,
    "dedup_fingerprint_docs": DEDUP_FINGERPRINT_ORACLE,
    "dedup_minhash_lsh": _minhash_oracle(),
    "dedup_minhash_lsh_capped": _minhash_capped_oracle(cap=2),
    "dedup_ngram_jaccard": NGRAM_JACCARD_ORACLE,
    "dedup_simhash": D.simhash_oracle_sql(),
    "simsearch_bruteforce_topk": SIMSEARCH_ORACLE,
    "embedding_neardup_pairs": NEARDUP_ORACLE,
    "embedding_neardup_blocked": NEARDUP_BLOCKED_ORACLE,
    "simsearch_ivf_topk": IVF_ORACLE,
    "simsearch_pq_topk": PQ_TOPK_ORACLE,
    "simsearch_pq_rerank": PQ_RERANK_ORACLE,
    "simsearch_ivf_multiprobe": IVF_MULTIPROBE_ORACLE,
    "simsearch_ivf_kmeans": IVF_KMEANS_ORACLE,
    "simsearch_lsh_topk": LSH_TOPK_ORACLE,
    "simsearch_lsh_multiprobe": LSH_MULTIPROBE_ORACLE,
    "knn_join_embeddings": KNN_JOIN_ORACLE,
    "source_quality_udaf": SOURCE_QUALITY_ORACLE,
    "text_stats": TEXT_STATS_ORACLE,
    "lang_id_docs": _lang_id_oracle(),
    "multimodal_meta": MULTIMODAL_ORACLE,
    "shard_assignment": SHARD_ORACLE,
    "tfidf_top_terms": TFIDF_ORACLE,
    "dedup_clusters": _clusters_oracle(),
    "dedup_incremental_minhash": INCREMENTAL_MINHASH_ORACLE,
    "decontaminate_train_docs": DECONTAMINATE_ORACLE,
    "semantic_decontaminate": SEMANTIC_DECONTAMINATE_ORACLE,
    "chunk_documents": CHUNK_ORACLE,
    "doc_sample_split": SAMPLE_SPLIT_ORACLE,
    "doc_bottomk_sample": BOTTOMK_ORACLE,
    "doc_weighted_sample": WEIGHTED_SAMPLE_ORACLE,
    "doc_mixture_sample": MIXTURE_SAMPLE_ORACLE,
    "bigrams_udtf": BIGRAMS_ORACLE,
    "unigram_lm_scores": UNIGRAM_LM_ORACLE,
    "dsir_importance_select": DSIR_ORACLE,
    "embedding_quantize": QUANTIZE_ORACLE,
    "doc_quota_sample": QUOTA_SAMPLE_ORACLE,
    "doc_global_index": GLOBAL_INDEX_ORACLE,
    "pack_training_sequences": PACK_SEQUENCES_ORACLE,
    "doc_vowel_stats_pandas_udf": VOWEL_UDF_ORACLE,
    "embedding_kmeans": KMEANS_ORACLE,
    "semdedup_prune": SEMDEDUP_ORACLE,
    "simsearch_recall_eval": RECALL_EVAL_ORACLE,
    "doc_repetition_stats": REPETITION_ORACLE,
    "quality_filter_docs": QUALITY_FILTER_ORACLE,
    "blocklist_scrub_docs": BLOCKLIST_ORACLE,
    "doc_group_split": GROUP_SPLIT_ORACLE,
    "bigram_lm_scores": BIGRAM_LM_ORACLE,
    "vocab_coverage": VOCAB_COVERAGE_ORACLE,
    "winnow_fingerprint_docs": WINNOW_ORACLE,
    "doc_char_entropy": CHAR_ENTROPY_ORACLE,
    "corpus_datasheet": CORPUS_DATASHEET_ORACLE,
    "curriculum_budget_selection": CURRICULUM_ORACLE,
    "kmv_distinct_tokens": KMV_ORACLE,
    "classifier_score_docs": CLASSIFIER_ORACLE,
    "dedup_containment_pairs": CONTAINMENT_ORACLE,
    "curate_corpus_pipeline": CURATION_ORACLE.replace(
        "{MINHASH}", _minhash_oracle(table="exact")
    ),
    "dedup_spans_corpus": D.span_dedup_oracle_sql(span=10),
    "dedup_canonical_docs": CANONICAL_DOCS_ORACLE,
    "embedding_random_projection": S.random_project_oracle_sql(out_dim=8),
    "pii_redact_docs": PII_REDACT_ORACLE,
    "mixture_temperature_weights": MIXTURE_TEMPERATURE_ORACLE,
    "embedding_standardize_profile": EMBEDDING_STANDARDIZE_ORACLE,
    "audio_energy_profile": AUDIO_ENERGY_ORACLE,
    "image_luma_profile": IMAGE_LUMA_ORACLE,
    "video_motion_profile": VIDEO_MOTION_ORACLE,
    "quality_quantile_normalize": QUALITY_QNORM_ORACLE,
    "bpe_pair_counts": BPE_PAIR_ORACLE,
    "source_overlap_matrix": SOURCE_OVERLAP_ORACLE,
    "source_novelty_curve": SOURCE_NOVELTY_ORACLE,
    "dedup_lsh_recall_eval": LSH_RECALL_EVAL_ORACLE.replace(
        "{MINHASH}", _minhash_oracle()
    ),
    "props_extract_udtf": PROPS_EXTRACT_ORACLE,
    "dedup_threshold_sweep": THRESHOLD_SWEEP_ORACLE,
    "embedding_norm_profile": NORM_PROFILE_ORACLE,
}


# --- balanced shard packing / LSH band planning / Hamilton split (r5) --------


def balanced_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced training shards: LPT/snake greedy packing
    (operators/indexing.py:snake_pack_shards) — global weight-descending
    rank via range partition + broadcast offsets, then pure per-row snake
    arithmetic. Reported per shard so the balance is visible; hash
    sharding (`shard_assignment`) balances counts, this balances the
    token budget that actually sizes a training step."""
    from nyc_taxi_data_pipeline_elt_spark.operators.indexing import (
        snake_pack_shards,
    )

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    packed = snake_pack_shards(sized, 8, "n_tokens", "doc_id")
    return packed.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.max("n_tokens").cast("long").alias("max_doc_tokens"),
    )


BALANCED_SHARD_ORACLE = """
WITH w AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
), r AS (
  SELECT n_tokens,
         row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rk
  FROM w
), a AS (
  SELECT n_tokens,
         CASE WHEN (rk // 8) % 2 = 0 THEN rk % 8 ELSE 7 - rk % 8 END AS shard_id
  FROM r
)
SELECT CAST(shard_id AS INT) AS shard_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(n_tokens) AS BIGINT) AS max_doc_tokens
FROM a
GROUP BY shard_id
"""


def dedup_lsh_band_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index design-time band/row planning (operators/dedup.py:
    lsh_band_plan): expected true/false candidate yield of every (b, r)
    split of an 8-hash MinHash signature under the S-curve
    1-(1-s^r)^b, evaluated against this corpus's observed candidate-pair
    Jaccard mass. Complements `dedup_threshold_sweep` (verify cutoff)
    and `dedup_lsh_recall_eval` (measured recall of the deployed index):
    this predicts the yield of the shapes NOT deployed, from one pass.
    DECIMAL-exact S-curve on the floored 1/100 similarity grid; expected
    counts reported as exact floor(sum*1e4) integers."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.0)
    return D.lsh_band_plan(pairs, threshold=0.5)


_BAND_PLAN_PAIRS = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
  FROM toks WHERE len(t) >= 3
), inv AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
j AS (
  SELECT round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) AS jac
  FROM common
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
)
"""

BAND_PLAN_ORACLE = (
    _BAND_PLAN_PAIRS
    + """,
d AS (
  SELECT jac >= 0.5 AS is_true,
         CAST(CAST(CAST(floor(jac * 100) AS BIGINT) AS DECIMAL(6,0))
              * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(3,2)) AS sd
  FROM j
), chains AS (
  SELECT is_true, sd,
         CAST(1 - sd AS DECIMAL(3,2)) AS u1,
         CAST(sd * sd AS DECIMAL(5,4)) AS s2
  FROM d
), chains2 AS (
  SELECT is_true, sd, s2,
         CAST(u1 * u1 AS DECIMAL(5,4)) AS u2,
         CAST(1 - s2 AS DECIMAL(5,4)) AS v1,
         CAST(s2 * s2 AS DECIMAL(9,8)) AS s4
  FROM chains
), chains3 AS (
  SELECT is_true,
         CAST(u2 * u2 AS DECIMAL(9,8)) AS u4,
         CAST(v1 * v1 AS DECIMAL(9,8)) AS v2,
         CAST(1 - s4 AS DECIMAL(9,8)) AS w1,
         CAST(s4 * s4 AS DECIMAL(17,16)) AS s8
  FROM chains2
), p AS (
  SELECT is_true,
         CAST(1 - CAST(u4 * u4 AS DECIMAL(17,16)) AS DECIMAL(17,16)) AS p_b8,
         CAST(1 - CAST(v2 * v2 AS DECIMAL(17,16)) AS DECIMAL(17,16)) AS p_b4,
         CAST(1 - CAST(w1 * w1 AS DECIMAL(17,16)) AS DECIMAL(17,16)) AS p_b2,
         s8 AS p_b1
  FROM chains3
), agg AS (
  SELECT count(*) AS n_candidates,
         CAST(coalesce(sum(CASE WHEN is_true THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_true_pairs,
         sum(CASE WHEN is_true THEN p_b8 ELSE CAST(0 AS DECIMAL(17,16)) END) AS t_b8,
         sum(CASE WHEN NOT is_true THEN p_b8 ELSE CAST(0 AS DECIMAL(17,16)) END) AS f_b8,
         sum(CASE WHEN is_true THEN p_b4 ELSE CAST(0 AS DECIMAL(17,16)) END) AS t_b4,
         sum(CASE WHEN NOT is_true THEN p_b4 ELSE CAST(0 AS DECIMAL(17,16)) END) AS f_b4,
         sum(CASE WHEN is_true THEN p_b2 ELSE CAST(0 AS DECIMAL(17,16)) END) AS t_b2,
         sum(CASE WHEN NOT is_true THEN p_b2 ELSE CAST(0 AS DECIMAL(17,16)) END) AS f_b2,
         sum(CASE WHEN is_true THEN p_b1 ELSE CAST(0 AS DECIMAL(17,16)) END) AS t_b1,
         sum(CASE WHEN NOT is_true THEN p_b1 ELSE CAST(0 AS DECIMAL(17,16)) END) AS f_b1
  FROM p
), cfg AS (
  SELECT 8 AS bands, 1 AS rows_per_band, t_b8 AS t, f_b8 AS f, n_candidates, n_true_pairs FROM agg
  UNION ALL
  SELECT 4, 2, t_b4, f_b4, n_candidates, n_true_pairs FROM agg
  UNION ALL
  SELECT 2, 4, t_b2, f_b2, n_candidates, n_true_pairs FROM agg
  UNION ALL
  SELECT 1, 8, t_b1, f_b1, n_candidates, n_true_pairs FROM agg
)
SELECT n_candidates, n_true_pairs,
       CAST(bands AS INT) AS bands,
       CAST(rows_per_band AS INT) AS rows_per_band,
       CAST(floor(coalesce(t, 0) * 10000) AS BIGINT) AS exp_true_x10k,
       CAST(floor(coalesce(f, 0) * 10000) AS BIGINT) AS exp_false_x10k
FROM cfg
"""
)


def doc_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder stratified split
    (operators/sampling.py:stratified_split_hamilton): corpus-wide val
    (10%) and test (5%) budgets apportioned exactly across sources, so
    every stratum's realized share is within one document of
    proportional — unlike the per-row independent draws of
    `doc_sample_split`. Integer apportionment arithmetic end-to-end."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    return M.stratified_split_hamilton(
        docs.select("doc_id", "source"),
        strata_col="source",
        key_col="doc_id",
        val_pct=10,
        test_pct=5,
    ).select("doc_id", "source", "split")


STRATIFIED_SPLIT_ORACLE = """
WITH c AS (
  SELECT source AS s, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY source
), t AS (
  SELECT CAST(sum(n_s) AS BIGINT) AS n_total FROM c
), a AS (
  SELECT s, n_s, n_total,
         (n_total * 10) // 100 AS v_val,
         (n_total * 5) // 100 AS v_test
  FROM c, t
), r AS (
  SELECT s, v_val, v_test,
         (n_s * v_val) // n_total AS base_val,
         n_s * v_val - ((n_s * v_val) // n_total) * n_total AS rem_val,
         (n_s * v_test) // n_total AS base_test,
         n_s * v_test - ((n_s * v_test) // n_total) * n_total AS rem_test
  FROM a
), al AS (
  SELECT s,
         base_val + CASE WHEN row_number() OVER (ORDER BY rem_val DESC, s)
                          <= v_val - sum(base_val) OVER () THEN 1 ELSE 0 END AS alloc_val,
         base_test + CASE WHEN row_number() OVER (ORDER BY rem_test DESC, s)
                           <= v_test - sum(base_test) OVER () THEN 1 ELSE 0 END AS alloc_test
  FROM r
), d AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY
           ('0x' || substr(md5('strat-' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             / 4294967296.0,
           doc_id) AS rn
  FROM documents
)
SELECT d.doc_id, d.source,
       CASE WHEN rn <= alloc_val THEN 'val'
            WHEN rn <= alloc_val + alloc_test THEN 'test'
            ELSE 'train' END AS split
FROM d JOIN al ON d.source IS NOT DISTINCT FROM al.s
"""


QUERIES.update(
    {
        "balanced_shard_packing": balanced_shard_packing,
        "dedup_lsh_band_plan": dedup_lsh_band_plan,
        "doc_stratified_split": doc_stratified_split,
    }
)
ORACLE.update(
    {
        "balanced_shard_packing": BALANCED_SHARD_ORACLE,
        "dedup_lsh_band_plan": BAND_PLAN_ORACLE,
        "doc_stratified_split": STRATIFIED_SPLIT_ORACLE,
    }
)


def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items report: every token with frequency > n/80 via the
    candidate + verify heavy-hitters decomposition
    (operators/text.py:heavy_hitters) — per-partition local-heavy
    candidates, then exact verification counts of the candidate set
    only; the full token vocabulary is never shuffled. The fourth
    classic sketch class alongside KMV (distinct), HLL
    (approx_distinct_stats) and the quantile sketch gate; like KMV, the
    OUTPUT is exact and layout-independent, so it hash-checks."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("token")
    )
    return X.heavy_hitters(toks, "token", k=80)


HEAVY_HITTERS_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
  FROM documents
), n AS (SELECT count(*) AS n_total FROM toks)
SELECT token, count(*) AS cnt
FROM toks, n
GROUP BY token, n_total
HAVING count(*) * 80 > n_total
"""


QUERIES.update({"heavy_hitter_tokens": heavy_hitter_tokens})
ORACLE.update({"heavy_hitter_tokens": HEAVY_HITTERS_ORACLE})
