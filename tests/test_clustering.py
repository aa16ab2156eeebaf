"""Range-clustered writes must produce the footer stats that make
row-group skipping work: each file covers a narrow, non-overlapping key
slice, so a range predicate overlaps only a few files. The assertion
reads the parquet metadata directly — the same min/max stats the scan's
pushed-down filters consult.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq

from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table
from nyc_taxi_data_pipeline_elt_spark.sources.writers import (
    compact_parquet,
    write_range_clustered,
)

SF_DIR = "/root/testdata/sf0.001"


def _file_ranges(path: str, col: str) -> list[tuple]:
    ranges = []
    for f in Path(path).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    return sorted(ranges)


def test_range_clustered_write_skips(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_clustered")
    write_range_clustered(orders, out, "o_totalprice", files=8)

    ranges = _file_ranges(out, "o_totalprice")
    assert len(ranges) >= 4  # range exchange actually fanned out

    # non-overlapping slices: every file's min is >= the previous file's max
    for (_, prev_hi), (lo, _) in zip(ranges, ranges[1:]):
        assert lo >= prev_hi

    # a narrow predicate overlaps at most 2 of the slices -> the scan can
    # skip >= 6/8 of the data from footers alone
    lo_q, hi_q = ranges[2][0], ranges[2][1]
    overlapping = [r for r in ranges if not (r[1] < lo_q or r[0] > hi_q)]
    assert len(overlapping) <= 2

    # row counts survive the rewrite (clustering is layout-only)
    assert spark.read.parquet(out).count() == orders.count()


def test_compact_parquet_small_files(spark, tmp_path):
    """Fragmented directory -> few right-sized files, same rows."""
    events = load_table(spark, SF_DIR, "events")
    out = str(tmp_path / "events_fragmented")
    events.repartition(64).write.parquet(out)
    assert len(list(Path(out).glob("*.parquet"))) == 64

    n_files = compact_parquet(spark, out, target_files=2)
    assert n_files == 2
    assert len(list(Path(out).glob("*.parquet"))) == 2
    assert spark.read.parquet(out).count() == events.count()
    # swap leaves no stranded temp/old siblings
    assert not (tmp_path / "events_fragmented.compact-tmp").exists()
    assert not (tmp_path / "events_fragmented.compact-old").exists()


def test_compact_parquet_partitioned_preserves_layout(spark, tmp_path):
    """Hive-partitioned input: sizes recursively, keeps key=value dirs,
    and round-trips rows including the partition column values."""
    orders = load_table(spark, SF_DIR, "orders")
    out = str(tmp_path / "orders_parts")
    (
        orders.withColumn("prio", orders.o_orderpriority.substr(1, 1))
        .repartition(16)
        .write.partitionBy("prio")
        .parquet(out)
    )
    before = spark.read.parquet(out)
    n_before = before.count()
    per_prio_before = {r.prio: r.n for r in before.groupBy("prio").count().withColumnRenamed("count", "n").collect()}

    compact_parquet(spark, out, target_mb=128)  # derive count from recursive size

    part_dirs = sorted(d.name for d in Path(out).iterdir() if d.is_dir() and "=" in d.name)
    assert part_dirs and all(d.startswith("prio=") for d in part_dirs)
    after = spark.read.parquet(out)
    assert after.count() == n_before
    per_prio_after = {r.prio: r.n for r in after.groupBy("prio").count().withColumnRenamed("count", "n").collect()}
    assert per_prio_after == per_prio_before
    # compaction actually reduced file counts (16 per partition -> ~1)
    n_files = len(list(Path(out).rglob("*.parquet")))
    assert n_files <= 2 * len(part_dirs)


def test_incremental_dedup_matches_full_cross_pairs(spark):
    """Incremental dedup (new batch vs stored band index) must find
    exactly the full-run candidate pairs that cross the corpus/batch
    split — without re-signing the corpus."""
    from nyc_taxi_data_pipeline_elt_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_band_rows,
        minhash_lsh_pairs,
    )
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    dups, new_rows = incremental_minhash_dedup(batch, minhash_band_rows(corpus))
    got = {(r.new_doc_id, r.corpus_doc_id) for r in dups.collect()}
    full = minhash_lsh_pairs(docs).collect()
    want = {
        (r.doc_a, r.doc_b) if r.doc_a % 2 == 1 else (r.doc_b, r.doc_a)
        for r in full
        if (r.doc_a % 2) != (r.doc_b % 2)
    }
    assert got == want and got
    # the returned rows extend the index for the next batch
    assert new_rows.columns == ["doc_id", "band_idx", "band_key"]


def test_contamination_overlap_known_answer(spark):
    """A training doc copying a 5-word benchmark span is flagged with the
    exact shared-shingle count; disjoint docs are not."""
    from nyc_taxi_data_pipeline_elt_spark.operators.dedup import (
        contamination_overlap,
    )

    bench = spark.createDataFrame(
        [(101, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "intro text then the quick brown fox jumps along"),  # 3 shared
            (2, "completely different words in every position here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.bench_doc_id): r.shared_shingles
        for r in contamination_overlap(train, bench, min_shared=2).collect()
    }
    # shared 3-gram shingles: "the quick brown", "quick brown fox",
    # "brown fox jumps"
    assert got == {(1, 101): 3}
