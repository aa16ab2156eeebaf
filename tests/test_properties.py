"""Property-based tests (hypothesis): invariants that must hold for any
input, not just the fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_taxi_data_pipeline_elt_spark.operators.conform import conform_to_schema
from nyc_taxi_data_pipeline_elt_spark.operators.quality import Rule, apply_quality

TARGET = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("b", T.DoubleType()),
        T.StructField("c", T.StringType()),
    ]
)

rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=15, deadline=None)
@given(rows)
def test_conform_always_yields_target_schema(spark, data):
    """Whatever subset/ordering/int-width the source has, conformance must
    produce exactly the target schema with NULL padding for gaps."""
    df = spark.createDataFrame(
        data, T.StructType([T.StructField("A", T.IntegerType()), T.StructField("b", T.FloatType())])
    )
    out = conform_to_schema(df, TARGET)
    assert out.schema == TARGET
    assert out.count() == len(data)
    # padded column is all-NULL; widened ints survive exactly
    assert out.filter(F.col("c").isNotNull()).count() == 0
    src_a = [r[0] for r in data]
    got_a = [r.a for r in out.collect()]
    assert sorted(x for x in got_a if x is not None) == sorted(
        x for x in src_a if x is not None
    )


@settings(max_examples=15, deadline=None)
@given(rows)
def test_quality_split_partitions_input(spark, data):
    """good + bad is always a partition of the input: disjoint, complete,
    and every bad row names at least one violated rule."""
    df = spark.createDataFrame(data, "a int, b float")
    rules = [
        Rule("a_nonneg", F.col("a").isNotNull() & (F.col("a") >= 0)),
        Rule("b_present", F.col("b").isNotNull()),
    ]
    good, bad = apply_quality(df, rules)
    n_good, n_bad = good.count(), bad.count()
    assert n_good + n_bad == len(data)
    assert bad.filter(F.size("dq_violations") == 0).count() == 0


def test_pack_sequences_invariants(spark):
    """Packing contract: offsets advance by exactly the document weights
    in order, stay inside capacity, and sequence ids never decrease."""
    from nyc_taxi_data_pipeline_elt_spark.operators.indexing import pack_sequences
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    cap = 2048
    packed = pack_sequences(
        docs.select("doc_id", "n_chars"),
        capacity=cap,
        weight_col="n_chars",
        order_col="doc_id",
    ).orderBy("doc_id").collect()
    cum = 0
    prev_seq = 0
    for r in packed:
        assert r.seq_id == cum // cap
        assert r.seq_offset == cum % cap
        assert 0 <= r.seq_offset < cap
        assert r.seq_id >= prev_seq
        prev_seq = r.seq_id
        cum += r.n_chars
    assert prev_seq > 0  # corpus actually spans multiple sequences


def test_mixture_sample_property(spark):
    """On random per-source populations, the sample composition matches
    the target shares exactly at the binding-source budget, and
    membership is layout-independent."""
    from hypothesis import given, settings, strategies as st
    from nyc_taxi_data_pipeline_elt_spark.operators.sampling import mixture_sample

    @settings(max_examples=5, deadline=None)
    @given(
        counts=st.tuples(
            st.integers(5, 40), st.integers(5, 40), st.integers(5, 40)
        )
    )
    def run(counts):
        rows, base = [], 0
        for si, n in enumerate(counts):
            rows += [(base + i, f"s{si}") for i in range(n)]
            base += 1000
        df = spark.createDataFrame(rows, "doc_id long, source string")
        shares = {"s0": 0.5, "s1": 0.3, "s2": 0.2}
        budget = min(int(n / p) for n, p in zip(counts, shares.values()))
        sample = mixture_sample(df, "source", "doc_id", shares)
        got = {
            r.source: r.n for r in
            sample.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        for (s, p) in shares.items():
            assert got.get(s, 0) == int(p * budget)
        # layout independence: same members after a repartition
        reparted = mixture_sample(df.repartition(7), "source", "doc_id", shares)
        assert {r.doc_id for r in sample.collect()} == {
            r.doc_id for r in reparted.collect()
        }

    run()


def test_mixture_sample_missing_source_raises(spark):
    """A target source with zero rows cannot contribute its share — the
    operator fails loudly instead of returning an empty sample (and
    instead of the SQL twin's silent share drop)."""
    import pytest

    from nyc_taxi_data_pipeline_elt_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(1, "web"), (2, "web"), (3, "code")], "doc_id long, source string"
    )
    with pytest.raises(ValueError, match="reference_books"):
        mixture_sample(
            df, "source", "doc_id", {"web": 0.5, "code": 0.3, "reference_books": 0.2}
        )


# -- span dedup invariants ----------------------------------------------------

_span_docs = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=12
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None)
@given(_span_docs)
def test_span_dedup_partition_and_reconstruction(spark, token_lists):
    """For ANY corpus: every span is kept exactly once corpus-wide per
    distinct span text (first occurrence), kept+dropped partitions each
    doc's spans, and a corpus with all-distinct span texts reconstructs
    every document verbatim."""
    from nyc_taxi_data_pipeline_elt_spark.operators.dedup import span_dedup_docs

    data = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(data, "doc_id: long, text: string")
    span = 3
    out = {r["doc_id"]: r for r in span_dedup_docs(df, span=span).collect()}
    # per-doc span count is ceil(len/span); n_kept <= n_spans
    total_kept = 0
    distinct_spans = set()
    for i, toks in enumerate(token_lists):
        n_spans = -(-len(toks) // span)
        assert out[i]["n_spans"] == n_spans
        assert 0 <= out[i]["n_kept"] <= n_spans
        total_kept += out[i]["n_kept"]
        for j in range(n_spans):
            distinct_spans.add(" ".join(toks[j * span : (j + 1) * span]))
    # corpus-wide: exactly one survivor per distinct span text
    assert total_kept == len(distinct_spans)
    # reconstruction: a doc whose spans were all first occurrences is
    # returned verbatim
    first_doc_spans = {
        " ".join(token_lists[0][j * span : (j + 1) * span])
        for j in range(-(-len(token_lists[0]) // span))
    }
    if out[0]["n_kept"] == out[0]["n_spans"] == len(first_doc_spans):
        assert out[0]["cleaned_text"] == data[0][1]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=15,
    )
)
def test_canonical_selection_is_cluster_member(spark, raw_pairs):
    """For ANY pair graph: each cluster's canonical doc is a member of
    that cluster, and every clustered node appears in exactly one
    cluster."""
    from nyc_taxi_data_pipeline_elt_spark.operators.dedup import (
        connected_components,
    )

    pairs = [(a, b) if a < b else (b, a + 31) for a, b in raw_pairs]
    pdf = spark.createDataFrame(pairs, "doc_a: long, doc_b: long")
    comp = connected_components(pdf)
    rows = comp.collect()
    membership = {}
    for r in rows:
        assert r["node"] not in membership
        membership[r["node"]] = r["component"]
    # component label is the min reachable node: must itself be a member
    for node, c in membership.items():
        assert membership.get(c) == c
        assert c <= node


# --- collision-aware edit-distance dispatch ---------------------------------
_ED_WORDS = ["black", "blush", "beige", "azure", "qzkvx", "mwyto"]

ed_corpus = st.lists(
    st.one_of(
        # dense phrases (collide) and random strings (don't), mixed freely
        st.tuples(st.just("d"), st.integers(0, 5), st.integers(0, 5),
                  st.integers(0, 5)),
        st.tuples(st.just("r"), st.text("abcdefghij0123456789",
                                        min_size=6, max_size=24)),
    ),
    min_size=2,
    max_size=25,
)


@settings(max_examples=8, deadline=None)
@given(ed_corpus)
def test_levenshtein_auto_equals_bruteforce_any_corpus(spark, specs):
    """levenshtein_join_auto must equal the quadratic brute force for ANY
    corpus and ANY routing decision — the dispatch is a cost choice,
    never a semantics choice. Low row cutoff forces the PassJoin branch
    to actually run on eligible blocks."""
    from nyc_taxi_data_pipeline_elt_spark.operators.editdist import (
        levenshtein_join_auto,
    )

    rows = []
    for i, spec in enumerate(specs):
        if spec[0] == "d":
            s = " ".join(_ED_WORDS[j] for j in spec[1:])
        else:
            s = spec[1]
        rows.append(("blk", i, s))
    df = spark.createDataFrame(rows, "blk string, k int, n string")

    got = sorted(
        map(
            tuple,
            levenshtein_join_auto(
                df, "k", "n", "blk", tau=2,
                min_rows_for_passjoin=4, quad_parallelism=4,
            ).collect(),
        )
    )
    a = df.selectExpr("blk", "k AS key_a", "n AS na")
    b = df.selectExpr("blk", "k AS key_b", "n AS nb")
    want = sorted(
        map(
            tuple,
            a.join(b, "blk")
            .filter(F.col("key_a") < F.col("key_b"))
            .withColumn("edit_dist", F.levenshtein("na", "nb", 2))
            .filter(F.col("edit_dist") >= 0)
            .select("blk", "key_a", "key_b", "edit_dist")
            .collect(),
        )
    )
    assert got == want
