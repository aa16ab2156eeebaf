"""Winnowing fingerprint guarantees (Schleimer et al., SIGMOD 2003)."""

from __future__ import annotations

from nyc_taxi_data_pipeline_elt_spark.operators.dedup import (
    winnow_fingerprints,
)

# n=3, w=4: any shared run of n + w - 1 = 6 tokens guarantees a shared
# fingerprint. Docs 1 and 2 share exactly such a run; doc 3 is disjoint.
_SHARED = "red orange yellow green blue indigo"
_DOCS = [
    (1, f"alpha beta {_SHARED} gamma delta epsilon zeta"),
    (2, f"one two three {_SHARED} four five six seven"),
    (3, "cat dog bird fish lion tiger bear wolf fox deer"),
]


def _fps(spark):
    df = spark.createDataFrame(_DOCS, "doc_id: long, text: string")
    rows = winnow_fingerprints(df, n=3, w=4).collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    return out

def test_shared_run_guarantees_shared_fingerprint(spark):
    fps = _fps(spark)
    assert fps[1] & fps[2], "6-token shared run must share a fingerprint"


def test_disjoint_docs_share_nothing(spark):
    fps = _fps(spark)
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_fingerprints_are_sparser_than_shingles(spark):
    # 13-token doc -> 11 shingles; winnowing with w=4 must select fewer
    fps = _fps(spark)
    assert 0 < len(fps[1]) < 11


def test_containment_flags_included_doc_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment ~1.0 for
    the short side while Jaccard stays below its threshold."""
    from nyc_taxi_data_pipeline_elt_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "red orange yellow green blue indigo"
    filler = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, short), (2, f"{filler} {short}")],
        "doc_id: long, text: string",
    )
    cont = containment_pairs(docs, threshold=0.9).collect()
    assert len(cont) == 1 and cont[0]["containment_a"] == 1.0
    assert ngram_jaccard_pairs(docs, threshold=0.5).count() == 0
