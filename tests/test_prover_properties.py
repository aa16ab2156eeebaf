"""Property-based soundness gate for the stats prover (r13): for
randomly generated AND/OR predicate trees over random row sets, the
prover's verdicts must agree with SPARK'S OWN evaluation —

- ``_pred_disjoint_by_stats(expr, stats) is True``  ⟹
  ``df.filter(expr)`` matches ZERO rows (a wrong prune is the
  data-loss class every review pass hunted by hand);
- ``_check_proven_by_stats(expr, stats) is True``  ⟹
  ``(expr) IS FALSE`` matches zero rows (a wrong proof silently skips
  CHECK verification).

The prover may always answer False (inconclusive) — only True claims
are checked, exactly the one-sided soundness contract. Stats envelopes
are built the way ``_file_stats`` builds them (min/max over non-null
values, ``__num_rows__``); string literals include embedded AND/OR
words and doubled-quote escapes to keep attacking the tokenizer the
way review pass 5 did.

Examples are kept modest (Spark round trip per example); the generator
seeds are deterministic under hypothesis' derandomize so CI is stable.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nyc_taxi_data_pipeline_elt_spark.sources.snapshots import (
    _check_proven_by_stats,
    _pred_disjoint_by_stats,
)

_INTS = st.integers(min_value=-50, max_value=50)
_WORDS = st.sampled_from(
    ["a", "zz", "m", "AND", "OR", "x AND y", "n''t", "-- hmm", "it''s"]
)


@st.composite
def _leaf(draw):
    col = draw(st.sampled_from(["v", "s", "w"]))
    if col == "s":
        lit = draw(_WORDS)
        op = draw(st.sampled_from([">", ">=", "<", "<=", "="]))
        return f"s {op} '{lit}'"
    if draw(st.booleans()):
        a, b = sorted([draw(_INTS), draw(_INTS)])
        return f"{col} BETWEEN {a} AND {b}"
    op = draw(st.sampled_from([">", ">=", "<", "<=", "="]))
    return f"{col} {op} {draw(_INTS)}"


@st.composite
def _tree(draw, depth=0):
    if depth >= 3 or draw(st.integers(0, 2)) == 0:
        return draw(_leaf())
    a = draw(_tree(depth=depth + 1))
    b = draw(_tree(depth=depth + 1))
    kw = draw(st.sampled_from(["AND", "OR"]))
    e = f"{a} {kw} {b}"
    return f"({e})" if draw(st.booleans()) else e


_ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), _INTS),
        st.one_of(st.none(), _WORDS),
    ),
    min_size=0,
    max_size=5,
)


def _stats_of(rows):
    vs = [v for v, _ in rows if v is not None]
    ss = [s for _, s in rows if s is not None]
    out = {"__num_rows__": len(rows)}
    if vs:
        out["v"] = [min(vs), max(vs)]
    if ss:
        out["s"] = [min(ss), max(ss)]
    return out


@settings(
    max_examples=60,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_ROWS, expr=_tree())
def test_prover_claims_agree_with_spark(spark, rows, expr):
    from nyc_taxi_data_pipeline_elt_spark.session import tune

    tune(spark)
    fstats = _stats_of(rows)
    disjoint = _pred_disjoint_by_stats(expr, fstats)
    proven = _check_proven_by_stats(expr, fstats)
    if not disjoint and not proven:
        return  # inconclusive both ways: nothing claimed, nothing to check
    # w is an all-NULL column: the "evolution-added column no file
    # holds" case — predicates on it must resolve (to NULL) like the
    # engine's log-schema reads, and it never gets a stats envelope
    df = spark.createDataFrame(
        [(v, s, None) for v, s in rows] or [(None, None, None)],
        "v INT, s STRING, w INT",
    )
    if not rows:
        df = df.limit(0)
    if disjoint:
        n = df.filter(expr).count()
        assert n == 0, (
            f"UNSOUND PRUNE: {expr!r} claimed disjoint from {fstats} "
            f"but matches {n} of {rows}"
        )
    if proven:
        n = df.filter(f"({expr}) IS FALSE").count()
        assert n == 0, (
            f"UNSOUND PROOF: {expr!r} claimed proven over {fstats} "
            f"but is FALSE for {n} of {rows}"
        )
