"""Tour of the training-data curation surface: a raw document corpus in,
a deduplicated, quality-filtered, packed training set out.

    python examples/corpus_curation_tour.py [sf_dir]

Stages (each is an independently oracle-verified operator — see
COVERAGE.md "North-star training-data extensions"):
  1. quality-rule filter battery (C4/Gopher-style row-local rules)
  2. exact dedup (hash groupBy)
  3. MinHash+LSH near-dup candidates -> connected components ->
     canonical selection (keep the best doc per cluster)
  4. corpus-level repeated-span removal (C4-style)
  5. deterministic leakage-safe split + sequence packing
  6. per-source datasheet
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from nyc_taxi_data_pipeline_elt_spark.operators import dedup as D  # noqa: E402
from nyc_taxi_data_pipeline_elt_spark.operators.indexing import (  # noqa: E402
    pack_sequences,
)
from nyc_taxi_data_pipeline_elt_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curation-tour")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"raw corpus: {n0} docs")

    # 1. quality rules (row-local; the full battery incl. repetition
    # profile is the quality_filter_docs query)
    toks = F.split(F.trim("text"), r"\s+")
    # length floor + ceiling (C4 drops both stubs and over-long pages)
    quality = docs.filter(
        (F.size(toks) >= 5) & F.col("n_chars").between(60, 500)
    )
    n1 = quality.count()
    print(f"after quality rules: {n1} docs (-{n0 - n1})")

    # 2. exact dedup: keep the lowest doc_id of each identical text
    exact_keep = quality.groupBy("text").agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    exact = quality.join(exact_keep, "doc_id", "left_semi")
    n2 = exact.count()
    print(f"after exact dedup: {n2} docs (-{n1 - n2})")

    # 3. near-dup: LSH candidates -> components -> keep the LONGEST
    # member of each cluster (canonical selection), drop the rest
    pairs = D.minhash_lsh_pairs(exact)
    comp = D.connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )
    member = comp.join(exact.select("doc_id", "n_chars"), "doc_id")
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    drop = (
        member.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") > 1)
        .select("doc_id")
    )
    neardup = exact.join(drop, "doc_id", "left_anti")
    n3 = neardup.count()
    print(f"after near-dup canonical selection: {n3} docs (-{n2 - n3})")

    # 4. corpus-level repeated-span removal on the survivors
    spans = D.span_dedup_docs(neardup, span=10)
    kept_spans = spans.agg(
        F.sum("n_spans").alias("total"), F.sum("n_kept").alias("kept")
    ).first()
    print(
        f"span dedup: kept {kept_spans['kept']}/{kept_spans['total']} "
        "10-token spans"
    )

    # 5. split + pack into 512-token training sequences
    cleaned = spans.filter(F.col("n_kept") > 0).select(
        "doc_id", F.col("cleaned_text").alias("text")
    )
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    packed = pack_sequences(
        cleaned.select("doc_id", n_tokens.alias("n_tokens")),
        capacity=512,
        weight_col="n_tokens",
        order_col="doc_id",
    )
    n_seq = packed.agg(F.countDistinct("seq_id")).first()[0]
    print(f"packed into {n_seq} sequences of <=512 tokens")

    # 6. datasheet
    sheet = (
        neardup.groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("chars"))
        .orderBy("source")
    )
    print("datasheet:")
    for r in sheet.collect():
        print(f"  {r['source']}: {r['n_docs']} docs, {r['chars']} chars")
    spark.stop()


if __name__ == "__main__":
    main()
