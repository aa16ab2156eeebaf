"""Multimodal column plumbing + codec-free media compute.

Treats image/audio/video as ``binary`` columns with a typed metadata
struct alongside — the storage pattern for multimodal training corpora
(payload stays opaque to the engine; metadata is queryable/prunable).

Two tiers of media compute live here:

1. **REAL, codec-free** — raw formats are just bytes on a grid, so the
   math runs for real in this container: int16 PCM framing/energy
   (``synthesize_pcm`` / ``audio_frame_stats``), RGB888 bitmap stats +
   nearest-neighbor resize (``synthesize_rgb`` / ``image_stats``), gray
   frame-stack motion differencing (``synthesize_video`` /
   ``video_motion_stats``). Python boundaries emit only integers, so
   every statistic is engine-exact and oracle-checkable.
2. **STUBBED container parsing** — PNG/JPEG/MP4 decoding needs codec
   libraries absent here, so ``real_decode`` sits behind a feature
   probe with a clearly marked ``NotImplementedError`` plus a
   deterministic fake, keeping the Spark-side plumbing — schema, Arrow
   batch shape, ``mapInPandas`` signature, partition behavior — real
   and tested. Swapping in PIL/av/torchaudio is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of the (fake) feature extractor: what a real image decode
# would emit per payload.
FEATURES_SCHEMA = (
    "doc_id bigint, n_bytes int, prefix_hex string, fake_width int, fake_height int"
)


def attach_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload + queryable metadata.

    In production the payload arrives as real bytes (image/audio); here it
    is the utf-8 encoding of ``text`` so results are deterministic.
    Metadata (size, content prefix) is computed with JVM built-ins —
    the engine never decodes the payload to answer metadata queries.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"),
        F.lower(F.hex(F.substring(payload, 1, 8))).alias("prefix_hex"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decode: derive a plausible
    (width, height) from the byte content. Replace with a real codec."""
    n = len(payload)
    w = 16 + (payload[0] if n else 0) % 64
    return w, max(1, n // max(w, 1))


def real_decode(payload: bytes):
    """The genuine image-decode hook, gated on a call-time feature probe:
    when PIL is importable the payload is decoded for real and its true
    (width, height) returned; otherwise the documented stub error stands.
    The operator is therefore complete the day the environment grows
    codecs — no code change, just ``pip install pillow``."""
    try:
        import io

        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "environment; PIL.Image decode is already wired behind this "
            "probe (av/torchaudio hooks attach the same way)"
        ) from None
    with Image.open(io.BytesIO(payload)) as img:
        return img.size


def resize_payloads(df: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Resize step of an image pipeline (STUB decode): recomputes the
    aspect-fit output dimensions per payload and passes the payload
    through opaque. Swapping `_fake_decode`/the passthrough for
    PIL's decode+resize changes nothing Spark-side: same schema, same
    Arrow batch shape, same partition-parallel execution."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [_fake_decode(p) for p in pdf["payload"]]
            scale = [min(target_w / w, target_h / h) for (w, h) in dims]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"],
                    "out_width": pd.Series(
                        [max(1, int(w * s)) for (w, _), s in zip(dims, scale)],
                        dtype="int32",
                    ),
                    "out_height": pd.Series(
                        [max(1, int(h * s)) for (_, h), s in zip(dims, scale)],
                        dtype="int32",
                    ),
                }
            )

    return df.mapInPandas(
        batches, schema="doc_id bigint, payload binary, out_width int, out_height int"
    )


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling step of a video pipeline (STUB decode): emits
    ``n_frames`` evenly-spaced 'frames' per payload — a 1->N batch
    explosion, the shape real frame extraction has. Frames here are
    deterministic byte slices; a real implementation seeks with av/ffmpeg
    per frame index inside the same batch loop."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                n = max(len(payload), 1)
                step = max(n // n_frames, 1)
                for i in range(n_frames):
                    start = min(i * step, n - 1)
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    out_frames.append(payload[start : start + step])
            yield pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_payload": out_frames,
                }
            )

    return df.mapInPandas(
        batches, schema="doc_id bigint, frame_idx int, frame_payload binary"
    )


def extract_features(df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame; the
    decoder runs per payload inside the batch — the canonical shape for
    CPU-bound media preprocessing on Spark (vectorized transfer, per-row
    compute, no driver involvement, scales with partitions).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = real_decode if use_real_decoder else _fake_decode
        for pdf in it:
            dims = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"].astype("int32"),
                    "prefix_hex": pdf["prefix_hex"],
                    "fake_width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "fake_height": pd.Series([d[1] for d in dims], dtype="int32"),
                }
            )

    return df.mapInPandas(batches, schema=FEATURES_SCHEMA)


# --- audio: a REAL (codec-free) media compute path ---------------------------
# PCM is raw samples — no codec needed — so unlike the image/video stubs
# above, the audio path below is complete in this environment: synthesize
# int16 PCM into a true binary column, then frame it and measure energy.
# Swapping the synthesizer for torchaudio.load changes nothing downstream.

AUDIO_SR = 8000
AUDIO_FRAME = 200  # samples per analysis frame (25 ms at 8 kHz)


def _pcm_samples(doc_id: int, n: int):
    """Deterministic int16 waveform for ``doc_id``: a per-doc sine tone
    with every (doc_id % 4)-th frame muted. The phase argument is
    reduced modulo one period IN INTEGER ARITHMETIC before sin(), so
    both engines evaluate sin on the same small double and the
    floor(x + 0.5) quantization lands on the same int16 grid —
    engine-exact samples, hence engine-exact frame statistics."""
    import numpy as np

    t = np.arange(n, dtype=np.int64)
    freq = 200 + (doc_id % 40) * 20
    phase = 2.0 * np.pi * ((freq * t) % AUDIO_SR) / AUDIO_SR
    wave = np.floor(3000.0 * np.sin(phase) + 0.5)
    muted = ((t // AUDIO_FRAME) % 4) == (doc_id % 4)
    wave[muted] = 0.0
    return wave.astype(np.int16)


def synthesize_pcm(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Materialize a binary PCM payload per document (the audio-ingest
    stand-in): ``n_samples`` varies per doc so frame counts discriminate.
    One narrow Arrow stage; the payload is genuine little-endian int16
    bytes, exactly what a ``binaryFile`` scan of .raw/.wav data yields
    after header strip."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            ns = (800 + (ids % 5) * 400).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        _pcm_samples(int(i), int(n)).tobytes()
                        for i, n in zip(ids, ns)
                    ],
                    "n_samples": ns.astype("int32"),
                }
            )

    return docs.select(id_col).mapInPandas(
        batches, schema="doc_id bigint, payload binary, n_samples int"
    )


def audio_frame_stats(pcm: DataFrame, frame: int = AUDIO_FRAME) -> DataFrame:
    """Per-frame energy statistics from the binary payload: decode
    little-endian int16 with ``np.frombuffer`` (zero-copy), reshape to
    frames, emit INTEGER sum-of-squares and peak per frame. Returning
    integers keeps the Python boundary float-free — RMS/silence math
    happens engine-side where the oracle can mirror it exactly.

    1->N batch explosion (one row per frame), the same Arrow shape as
    video frame extraction; scales with partitions, no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out_id, out_idx, out_sumsq, out_peak = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                x = np.frombuffer(bytes(payload), dtype="<i2").astype(np.int64)
                n_frames = len(x) // frame
                fr = x[: n_frames * frame].reshape(n_frames, frame)
                out_id.extend([doc_id] * n_frames)
                out_idx.extend(range(n_frames))
                out_sumsq.extend((fr * fr).sum(axis=1).tolist())
                out_peak.extend(np.abs(fr).max(axis=1).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "sumsq": pd.Series(out_sumsq, dtype="int64"),
                    "peak": pd.Series(out_peak, dtype="int32"),
                }
            )

    return pcm.mapInPandas(
        batches, schema="doc_id bigint, frame_idx int, sumsq bigint, peak int"
    )


# --- image / video: raw-bitmap compute, same codec-free principle ------------
# A raw RGB888 bitmap (or a gray frame stack) is just bytes on a grid, so
# resize / luma statistics / frame differencing are pure integer math —
# real media compute, no codec. Only container parsing (PNG/JPEG/MP4)
# remains behind the real_decode probe above.

IMG_W, IMG_H = 32, 24  # RGB888 bitmap dimensions
VID_W, VID_H = 16, 12  # gray frame dimensions


def synthesize_rgb(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic raw RGB888 bitmap per document, row-major RGBRGB…
    bytes — what a ``binaryFile`` scan of .raw/.ppm data yields after
    header strip. Channel values are integer formulas of (doc_id, x, y)
    so the oracle regenerates every pixel closed-form."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        y, x = np.mgrid[0:IMG_H, 0:IMG_W]
        payloads = []

        def render(doc_id: int) -> bytes:
            r = (doc_id * 7 + x * 3 + y * 5) % 256
            g = (doc_id * 11 + x + 2 * y) % 256
            b = (doc_id + x * y) % 256
            return np.stack([r, g, b], axis=-1).astype(np.uint8).tobytes()

        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [render(int(i)) for i in ids],
                    "width": pd.Series([IMG_W] * len(ids), dtype="int32"),
                    "height": pd.Series([IMG_H] * len(ids), dtype="int32"),
                }
            )

    return docs.select(id_col).mapInPandas(
        batches, schema="doc_id bigint, payload binary, width int, height int"
    )


def image_stats(images: DataFrame) -> DataFrame:
    """Per-image integer statistics off the raw bitmap: channel sums,
    bright-pixel count on the BT.601 integer luma grid
    (299 r + 587 g + 114 b, x1000 scale), and the luma sum of a 2x
    nearest-neighbor downsample (out(i,j) = in(2i, 2j) — the resize
    kernel real thumbnailers use for the fast path). All outputs are
    exact integers; one narrow Arrow stage."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {
                "doc_id": pdf["doc_id"],
                "sum_r": [], "sum_g": [], "sum_b": [],
                "n_bright": [], "ds_luma_sum": [],
            }
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                px = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                px = px.reshape(int(h), int(w), 3)
                r, g, b = px[..., 0], px[..., 1], px[..., 2]
                luma = 299 * r + 587 * g + 114 * b
                rows["sum_r"].append(int(r.sum()))
                rows["sum_g"].append(int(g.sum()))
                rows["sum_b"].append(int(b.sum()))
                rows["n_bright"].append(int((luma > 128_000).sum()))
                rows["ds_luma_sum"].append(int(luma[::2, ::2].sum()))
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "sum_r": pd.Series(rows["sum_r"], dtype="int64"),
                    "sum_g": pd.Series(rows["sum_g"], dtype="int64"),
                    "sum_b": pd.Series(rows["sum_b"], dtype="int64"),
                    "n_bright": pd.Series(rows["n_bright"], dtype="int64"),
                    "ds_luma_sum": pd.Series(rows["ds_luma_sum"], dtype="int64"),
                }
            )

    return images.mapInPandas(
        batches,
        schema="doc_id bigint, sum_r bigint, sum_g bigint, sum_b bigint, "
        "n_bright bigint, ds_luma_sum bigint",
    )


def synthesize_video(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic gray frame stack per document (4 + doc_id % 4
    frames of VID_W x VID_H bytes, concatenated) — the raw-frame layout
    a demuxed stream hands a sampler."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        y, x = np.mgrid[0:VID_H, 0:VID_W]

        def render(doc_id: int, n_frames: int) -> bytes:
            frames = [
                ((doc_id * 7 + x * 3 + y * 5 + f * 17) % 256).astype(np.uint8)
                for f in range(n_frames)
            ]
            return np.stack(frames).tobytes()

        for pdf in it:
            ids = pdf[id_col].astype("int64")
            nf = (4 + ids % 4).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        render(int(i), int(n)) for i, n in zip(ids, nf)
                    ],
                    "n_frames": nf.astype("int32"),
                }
            )

    return docs.select(id_col).mapInPandas(
        batches, schema="doc_id bigint, payload binary, n_frames int"
    )


def video_motion_stats(videos: DataFrame) -> DataFrame:
    """Frame-differencing motion profile off the raw frame stack:
    per adjacent frame pair, the sum of absolute pixel deltas — the
    scene-change / static-clip detector run before sampling frames for
    vision-language training. Integer outputs, one narrow Arrow stage."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": pdf["doc_id"], "total_motion": [],
                   "max_pair_motion": [], "first_frame_sum": [],
                   "last_frame_sum": []}
            for payload, nf in zip(pdf["payload"], pdf["n_frames"]):
                fr = (
                    np.frombuffer(bytes(payload), dtype=np.uint8)
                    .astype(np.int64)
                    .reshape(int(nf), VID_H * VID_W)
                )
                diffs = np.abs(fr[1:] - fr[:-1]).sum(axis=1)
                out["total_motion"].append(int(diffs.sum()))
                out["max_pair_motion"].append(int(diffs.max()))
                out["first_frame_sum"].append(int(fr[0].sum()))
                out["last_frame_sum"].append(int(fr[-1].sum()))
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "total_motion": pd.Series(out["total_motion"], dtype="int64"),
                    "max_pair_motion": pd.Series(out["max_pair_motion"], dtype="int64"),
                    "first_frame_sum": pd.Series(out["first_frame_sum"], dtype="int64"),
                    "last_frame_sum": pd.Series(out["last_frame_sum"], dtype="int64"),
                }
            )

    return videos.mapInPandas(
        batches,
        schema="doc_id bigint, total_motion bigint, max_pair_motion bigint, "
        "first_frame_sum bigint, last_frame_sum bigint",
    )
