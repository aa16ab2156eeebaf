"""ANN index tour: every similarity-search path the engine ships, on
the sf0.01 fixture — what to use when, with measured recall.

    python examples/ann_index_tour.py

- brute force      exact baseline; embarrassingly parallel, scan-bound
- label-IVF        metadata-partition probing: recall ~= scanned
                   fraction (labels are orthogonal to geometry) — use
                   only when the filter IS the query (e.g. per-source)
- k-means IVF      geometry-aligned cells: 2 of 8 cells ~= 0.9
                   recall@10; the real index shape
- sign-LSH top-k   hyperplane buckets + Hamming-1 multiprobe
- blocked kNN join top-k for EVERY vector; size the index to the
                   corpus (auto_band_planes) or it goes quadratic per
                   decade (SCALING.md)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nyc_taxi_data_pipeline_elt_spark.operators import clustering as C
from nyc_taxi_data_pipeline_elt_spark.operators import similarity as S
from nyc_taxi_data_pipeline_elt_spark.session import get_spark, tune
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("ann-tour", cpus=8)
    tune(spark)
    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    print(f"corpus: {n} vectors x {S.EMBED_DIM} dims\n")

    # recall averaged over several query vectors — single-query recall
    # is high-variance on a small corpus (a query whose bucket is
    # unlucky can score 0.0 while the corpus-wide recall is fine)
    qids = list(range(8))
    exact = {
        q: {r["vec_id"] for r in S.brute_force_topk(emb, q, k=10).collect()}
        for q in qids
    }

    def show(name, fn):
        t0 = time.perf_counter()
        recs = []
        for q in qids:
            got = {r["vec_id"] for r in fn(q).collect()}
            recs.append(len(got & exact[q]) / len(exact[q]))
        dt = time.perf_counter() - t0
        rec = sum(recs) / len(recs)
        print(
            f"{name:<28} recall@10={rec:.2f} "
            f"(min {min(recs):.1f} / max {max(recs):.1f})  "
            f"{dt / len(qids):5.2f}s/query"
        )

    show("brute force (exact)", lambda q: S.brute_force_topk(emb, q, k=10))
    show("label-IVF nprobe=1", lambda q: S.ivf_topk(emb, q, k=10))
    show("label-IVF nprobe=2", lambda q: S.ivf_topk(emb, q, k=10, nprobe=2))
    show(
        "k-means IVF 2/8 cells",
        lambda q: C.ivf_kmeans_topk(emb, q, k=10, nprobe=2),
    )
    show("sign-LSH top-k", lambda q: S.lsh_topk(emb, q, k=10))
    show("sign-LSH multiprobe", lambda q: S.lsh_topk_multiprobe(emb, q, k=10))

    # the all-vectors shape: auto-sized blocked kNN join
    t0 = time.perf_counter()
    rows = S.knn_join_blocked(emb, k=3, target_bucket=150).count()
    print(
        f"\nblocked kNN join (auto-sized): {rows} neighbor rows for all "
        f"{n} vectors in {time.perf_counter() - t0:.2f}s "
        "(band_planes from auto_band_planes — a frozen knob is "
        "quadratic per corpus decade, see SCALING.md)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
