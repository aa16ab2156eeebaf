"""Multimodal plumbing: binary payloads, metadata, Arrow-batched decode stub."""

from __future__ import annotations

import pytest

from nyc_taxi_data_pipeline_elt_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    real_decode,
)
from nyc_taxi_data_pipeline_elt_spark.sources.readers import load_table
from tests.conftest import SF_DIR


def test_payload_and_features_pipeline(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with_payload = attach_payload(docs)
    assert dict(with_payload.dtypes)["payload"] == "binary"

    feats = extract_features(with_payload)
    rows = feats.collect()
    assert len(rows) == docs.count()
    by_id = {r.doc_id: r for r in rows}
    # deterministic fake decode: same payload -> same dims, plausible shapes
    sample = next(iter(by_id.values()))
    assert sample.fake_width >= 16
    assert sample.fake_height >= 1
    assert sample.n_bytes > 0
    assert len(sample.prefix_hex) == 16


def test_real_decoder_is_clearly_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        real_decode(b"\x89PNG")
