"""Multimodal plumbing: binary payloads, metadata, Arrow-batched decode stub."""

from __future__ import annotations

import pytest

from nyc_taxi_data_pipeline_elt_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    real_decode,
    resize_payloads,
    sample_frames,
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


def test_resize_and_frame_sampling_plumbing(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with_payload = attach_payload(docs)

    resized = resize_payloads(with_payload, target_w=32, target_h=32)
    rows = resized.collect()
    assert len(rows) == docs.count()
    assert all(1 <= r.out_width <= 32 and 1 <= r.out_height <= 32 for r in rows)
    assert dict(resized.dtypes)["payload"] == "binary"

    frames = sample_frames(with_payload, n_frames=4)
    assert frames.count() == docs.count() * 4
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in per_doc)
    sample = frames.filter("doc_id = 0").orderBy("frame_idx").collect()
    assert [r.frame_idx for r in sample] == [0, 1, 2, 3]
    assert all(len(bytes(r.frame_payload)) > 0 for r in sample)


def test_real_decoder_probes_pil_at_call_time():
    """Deterministically exercises whichever branch this environment has:
    without PIL the documented stub error; with PIL a real decode of a
    minimal in-memory image returning its true dimensions."""
    try:
        import io

        from PIL import Image
    except ImportError:
        with pytest.raises(NotImplementedError, match="codec"):
            real_decode(b"\x89PNG")
        return
    buf = io.BytesIO()
    Image.new("RGB", (5, 3)).save(buf, format="PNG")
    assert real_decode(buf.getvalue()) == (5, 3)


def test_binary_file_source_reads_media_dir(spark, tmp_path):
    """binaryFile ingestion edge (sources/readers.py:read_binary_dir):
    glob pushdown selects only matching files, the length cap prunes
    oversized assets, and the bytes round-trip into the same opaque
    payload shape the multimodal operators consume."""
    from nyc_taxi_data_pipeline_elt_spark.sources.readers import (
        read_binary_dir,
    )

    payloads = {
        "a.png": b"\x89PNG" + b"\x00" * 40,
        "b.png": b"\x89PNG" + b"\x01" * 4000,
        "c.txt": b"not media",
    }
    for name, blob in payloads.items():
        (tmp_path / name).write_bytes(blob)

    df = read_binary_dir(spark, str(tmp_path), glob="*.png")
    rows = {r["path"].split("/")[-1]: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.png"}
    assert bytes(rows["a.png"]["content"]) == payloads["a.png"]
    assert rows["b.png"]["length"] == 4004

    capped = read_binary_dir(
        spark, str(tmp_path), glob="*.png", max_bytes=1000
    )
    assert [r["path"].split("/")[-1] for r in capped.collect()] == ["a.png"]


def test_pcm_payload_is_true_int16_bytes(spark):
    """The synthesized payload must be genuine little-endian int16 PCM:
    decoding it off the DataFrame reproduces _pcm_samples exactly."""
    import numpy as np

    from nyc_taxi_data_pipeline_elt_spark.operators import multimodal as MM

    docs = spark.createDataFrame([(3,), (7,)], "doc_id bigint")
    rows = {r["doc_id"]: r for r in MM.synthesize_pcm(docs).collect()}
    for doc_id, row in rows.items():
        expected = MM._pcm_samples(doc_id, 800 + (doc_id % 5) * 400)
        got = np.frombuffer(bytes(row["payload"]), dtype="<i2")
        assert row["n_samples"] == len(expected)
        assert np.array_equal(got, expected)


def test_audio_frames_mute_pattern(spark):
    """Every (doc_id % 4)-th frame is muted: its peak and sumsq are 0;
    all other frames carry near-full-scale energy."""
    from nyc_taxi_data_pipeline_elt_spark.operators import multimodal as MM

    docs = spark.createDataFrame([(5,)], "doc_id bigint")  # 5 % 4 == 1
    frames = MM.audio_frame_stats(MM.synthesize_pcm(docs)).collect()
    assert len(frames) == (800 + (5 % 5) * 400) // MM.AUDIO_FRAME == 4
    by_idx = {f["frame_idx"]: f for f in frames}
    assert by_idx[1]["peak"] == 0 and by_idx[1]["sumsq"] == 0
    for i in (0, 2, 3):
        assert by_idx[i]["peak"] > 2500
        assert by_idx[i]["sumsq"] > 0


def test_rgb_payload_round_trips(spark):
    """The RGB payload must be a genuine row-major RGB888 bitmap:
    decoding it reproduces the channel formulas pixel-exactly."""
    import numpy as np

    from nyc_taxi_data_pipeline_elt_spark.operators import multimodal as MM

    row = MM.synthesize_rgb(
        spark.createDataFrame([(9,)], "doc_id bigint")
    ).collect()[0]
    px = np.frombuffer(bytes(row["payload"]), dtype=np.uint8).reshape(
        MM.IMG_H, MM.IMG_W, 3
    )
    y, x = 5, 17
    assert px[y, x, 0] == (9 * 7 + x * 3 + y * 5) % 256
    assert px[y, x, 1] == (9 * 11 + x + 2 * y) % 256
    assert px[y, x, 2] == (9 + x * y) % 256


def test_video_motion_known_answer(spark):
    """A constant-delta frame stack has a closed-form motion profile:
    each pixel steps by 17 (mod 256), so every pair's motion is
    sum(|delta|) with wraparound pixels contributing 256-17... computed
    directly against numpy as the independent reference."""
    import numpy as np

    from nyc_taxi_data_pipeline_elt_spark.operators import multimodal as MM

    doc_id = 6  # 6 % 4 == 2 -> 6 frames
    row = MM.video_motion_stats(
        MM.synthesize_video(spark.createDataFrame([(doc_id,)], "doc_id bigint"))
    ).collect()[0]
    y, x = np.mgrid[0:MM.VID_H, 0:MM.VID_W]
    frames = np.stack(
        [
            (doc_id * 7 + x * 3 + y * 5 + f * 17) % 256
            for f in range(4 + doc_id % 4)
        ]
    ).astype(np.int64)
    diffs = np.abs(frames[1:] - frames[:-1]).sum(axis=(1, 2))
    assert row["total_motion"] == int(diffs.sum())
    assert row["max_pair_motion"] == int(diffs.max())
    assert row["first_frame_sum"] == int(frames[0].sum())
    assert row["last_frame_sum"] == int(frames[-1].sum())
