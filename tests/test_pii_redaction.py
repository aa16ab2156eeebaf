"""Crafted-fixture tests for the PII scrub (operators/text.py:redact_pii).

The registered query (plans/trainingdata.py:pii_redact_docs) proves
cross-engine parity on SYNTHESIZED contacts; these tests pin the
category semantics on hand-written strings — hits, non-hits, and the
pattern-precedence corners the corpus construction never exercises.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_pipeline_elt_spark.operators import text as X


def _redact(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(X.redact_pii("t").alias("r")).collect()[0]["r"]


def _counts(spark, s: str) -> dict:
    df = spark.createDataFrame([(s,)], "t string")
    c = X.pii_counts("t")
    row = df.select(*[c[k].alias(k) for k in c]).collect()[0]
    return row.asDict()


@pytest.mark.parametrize(
    "raw,expected",
    [
        # one of each category, mixed prose
        (
            "mail a.b+c@ex-1.org, ip 192.168.1.254, tel 555-123-4567, "
            "ssn 987-65-4320 end",
            "mail <EMAIL>, ip <IP>, tel <PHONE>, ssn <SSN> end",
        ),
        # dotted phone form
        ("call 555.123.4567 now", "call <PHONE> now"),
        # SSN 3-2-4 grouping must not be eaten by the phone rule
        ("id 123-45-6789", "id <SSN>"),
        # phone 3-3-4 must not be eaten by the SSN rule
        ("id 123-456-7890", "id <PHONE>"),
        # clean text passes through byte-identical
        ("no secrets here, just words and 42 numbers", None),
        # digits glued to letters are not a phone (word boundary)
        ("part x555-123-4567y stays", None),
        # version strings: 1.2.3 is not an IPv4 (needs 4 octets)
        ("release 1.2.3 shipped", None),
    ],
)
def test_redaction_rewrites(spark, raw, expected):
    assert _redact(spark, raw) == (expected if expected is not None else raw)


def test_counts_match_categories(spark):
    s = (
        "a@b.io c@d.net 10.0.0.1 10.0.0.2 10.0.0.3 "
        "555-111-2222 111-22-3333"
    )
    got = _counts(spark, s)
    assert got == {"email": 2, "ipv4": 3, "phone": 1, "ssn": 1}


def test_clean_text_counts_zero(spark):
    got = _counts(spark, "the quick brown fox 12345")
    assert got == {"email": 0, "ipv4": 0, "phone": 0, "ssn": 0}


def test_redaction_stays_jvm_side(spark):
    """The scrub must compile to a pure expression chain — no
    BatchEvalPython / ArrowEvalPython node (100 TB = map-only codegen)."""
    df = spark.range(10).select(
        F.concat(F.lit("u"), "id", F.lit("@x.io")).alias("t")
    )
    out = df.select(X.redact_pii("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
