"""Closed-form checks for corpus-level span dedup and random projection."""

from __future__ import annotations

import math

from nyc_taxi_data_pipeline_elt_spark.operators.dedup import span_dedup_docs
from nyc_taxi_data_pipeline_elt_spark.operators.similarity import (
    _hyperplanes,
    random_project,
)

# span=3: doc 1 owns spans [a b c][d e f]; doc 2 repeats doc 1's first
# span then continues with its own tokens; doc 3 is doc 1 verbatim.
_DOCS = [
    (1, "a b c d e f"),
    (2, "a b c x y z"),
    (3, "a b c d e f"),
]


def _result(spark):
    df = spark.createDataFrame(_DOCS, "doc_id: long, text: string")
    return {r["doc_id"]: r for r in span_dedup_docs(df, span=3).collect()}


def test_first_occurrence_wins_and_repeats_drop(spark):
    out = _result(spark)
    # doc 1 is first everywhere: keeps both spans verbatim
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["cleaned_text"] == "a b c d e f"
    # doc 2 loses its copied head span, keeps its own tail
    assert out[2]["n_kept"] == 1
    assert out[2]["cleaned_text"] == "x y z"
    # doc 3 is a full duplicate: nothing survives, NULL cleaned text
    assert out[3]["n_kept"] == 0
    assert out[3]["cleaned_text"] is None


def test_short_tail_span_kept_whole(spark):
    df = spark.createDataFrame([(1, "p q r s")], "doc_id: long, text: string")
    rows = span_dedup_docs(df, span=3).collect()
    assert rows[0]["n_spans"] == 2  # [p q r] + the short [s]
    assert rows[0]["cleaned_text"] == "p q r s"


def test_random_projection_matches_manual_dot(spark):
    vec = [float(i % 5 - 2) for i in range(64)]
    df = spark.createDataFrame(
        [(7, vec)], "vec_id: long, embedding: array<double>"
    )
    row = random_project(df, out_dim=2).collect()[0]
    planes = _hyperplanes(2)
    for j in range(2):
        expect = 0.0
        for i in range(64):
            expect += vec[i] * planes[j][i]
        assert math.isclose(row[f"p{j}"], expect, rel_tol=1e-12)


def test_props_udtf_malformed_json_yields_nulls(spark):
    """Malformed payloads must produce all-NULL rows (SQL json_extract
    semantics), never a task failure."""
    from pyspark.sql.functions import udtf

    from nyc_taxi_data_pipeline_elt_spark.plans.trainingdata import (
        ExtractJsonKeys,
    )

    spark.udtf.register("extract_json_keys_t", udtf(ExtractJsonKeys))
    spark.createDataFrame(
        [('{"k": 1}',), ("not json",), (None,), ("[1,2]",)], "props string"
    ).createOrReplaceTempView("__props_edge")
    rows = spark.sql(
        "SELECT e.k FROM __props_edge, LATERAL extract_json_keys_t(props, 'k') e"
    ).collect()
    assert sorted(r["k"] for r in rows if r["k"] is not None) == ["1"]
    assert sum(1 for r in rows if r["k"] is None) == 3
