"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, plus the Spark-side decode / feature-extract / resize /
frame-sample operators.

All three decode paths are REAL and dependency-free, running Arrow-batched
inside ``mapInPandas`` (no PIL/ffmpeg in this environment — and none
needed for these formats):

- images: a pure-numpy PPM (P6) parser;
- audio: a PCM16 mono WAV (RIFF) parser;
- video: a raw-frame container of our own ("FRV1": fixed little-endian
  header + length-prefixed concatenated PPM frames at a constant frame
  interval). Real codecs (H.264 etc.) genuinely need ffmpeg, so the
  CONTAINER is the honest stand-in: demux, per-frame decode, and frame
  sampling are all real numpy code with the exact batch shape an
  ffmpeg-backed decoder would have.

Two synthetic media tables over the documents corpus:

- ``synth_media``: payload = utf-8 text bytes (opaque), metadata pure
  functions of doc_id — the metadata query has an exact SQL oracle.
- ``synth_media_binary``: VALID payloads — PPM images, PCM16 WAV audio,
  and FRV1 video whose pixel/sample values are integer functions of
  (doc_id, frame, flat index), so decoded integer value-sums are
  order-independent and the decode queries have exact SQL oracles too.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_BINS = 16

# synth_media_binary geometry (small fixed sizes keep payloads compact)
IMG_W, IMG_H = 16, 12
WAV_SAMPLES = 256
WAV_RATE = 8000
VID_INTERVAL_MS = 500  # constant frame spacing in the FRV1 container


def synth_media(docs: DataFrame) -> DataFrame:
    """(doc_id, media_type, payload, width, height, duration_ms): a
    deterministic stand-in for a crawled media table. Catalyst-native."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.lit(64) + (F.col("doc_id") * 13) % 448).cast("long").alias("width"),
        (F.lit(64) + (F.col("doc_id") * 29) % 448).cast("long").alias("height"),
        ((F.col("doc_id") * 97) % 60000).cast("long").alias("duration_ms"),
    )


def media_meta(docs: DataFrame) -> DataFrame:
    """Metadata projection incl. payload size — the SQL-checkable face of
    the media table."""
    m = synth_media(docs)
    return m.select(
        "doc_id",
        "media_type",
        F.length("payload").cast("long").alias("payload_bytes"),
        "width",
        "height",
        "duration_ms",
    )


# ---------------------------------------------------------------------------
# Real codecs: PPM (P6) and PCM16 WAV, pure numpy
# ---------------------------------------------------------------------------


def _img_pixels(doc_id: int) -> np.ndarray:
    """Deterministic pixel bytes, flat row-major (h, w, 3): the integer
    formula the SQL decode oracle replicates."""
    i = np.arange(IMG_W * IMG_H * 3, dtype=np.int64)
    return ((doc_id * 7 + i * 13) % 256).astype(np.uint8)


def _wav_samples(doc_id: int) -> np.ndarray:
    """Deterministic int16 samples (same contract as _img_pixels)."""
    i = np.arange(WAV_SAMPLES, dtype=np.int64)
    return (((doc_id * 31 + i * 17) % 65536) - 32768).astype(np.int16)


def encode_ppm(pixels: np.ndarray, width: int, height: int) -> bytes:
    """Binary PPM (P6, maxval 255) from flat row-major RGB bytes."""
    return b"P6\n%d %d\n255\n" % (width, height) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, flat uint8 pixels) from a binary PPM. Header
    grammar handled: any whitespace and '#' comments *between* tokens,
    then exactly one whitespace byte after maxval before the raster (a
    comment between maxval and the raster — legal but rare PPM — is NOT
    supported and would corrupt the pixel offset)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = width * height * 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return width, height, raster


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """Minimal PCM16 mono WAV (44-byte canonical RIFF header)."""
    data = samples.astype("<i2").tobytes()
    n = len(data)

    def le32(v: int) -> bytes:
        return int(v).to_bytes(4, "little")

    def le16(v: int) -> bytes:
        return int(v).to_bytes(2, "little")

    return (
        b"RIFF" + le32(36 + n) + b"WAVE"
        + b"fmt " + le32(16) + le16(1) + le16(1) + le32(rate)
        + le32(rate * 2) + le16(2) + le16(16)
        + b"data" + le32(n) + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from a PCM16 mono WAV; walks the RIFF
    chunk list (tolerates extra chunks before 'data')."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt")
            return rate, np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    raise ValueError("no data chunk")


def _vid_n_frames(doc_id: int) -> int:
    """2..4 frames per synthetic video (same contract as _img_pixels).
    Video rows all have doc_id % 3 == 2, so the varying term must NOT be
    doc_id % 3 (that would be the constant 2 → always 4 frames); // 3
    makes consecutive video docs cycle 2, 3, 4."""
    return 2 + (doc_id // 3) % 3


def _vid_pixels(doc_id: int, frame: int) -> np.ndarray:
    """Deterministic per-frame pixel bytes, flat row-major (h, w, 3)."""
    i = np.arange(IMG_W * IMG_H * 3, dtype=np.int64)
    return ((doc_id * 7 + frame * 101 + i * 13) % 256).astype(np.uint8)


def encode_frv(frames: list[bytes], interval_ms: int = VID_INTERVAL_MS) -> bytes:
    """FRV1 raw-frame video container: magic + le32 frame count + le32
    frame interval (ms), then each frame as le32 length + PPM bytes."""

    def le32(v: int) -> bytes:
        return int(v).to_bytes(4, "little")

    parts = [b"FRV1", le32(len(frames)), le32(interval_ms)]
    for fr in frames:
        parts.append(le32(len(fr)))
        parts.append(fr)
    return b"".join(parts)


def decode_frv(payload: bytes) -> tuple[int, list[bytes]]:
    """(interval_ms, frame payloads) from an FRV1 container — the demux
    half; each returned frame is a standalone PPM for decode_ppm."""
    if payload[:4] != b"FRV1":
        raise ValueError("not an FRV1 payload")
    n_frames = int.from_bytes(payload[4:8], "little")
    interval_ms = int.from_bytes(payload[8:12], "little")
    pos, frames = 12, []
    for _ in range(n_frames):
        if pos + 4 > len(payload):
            raise ValueError("truncated FRV1 frame table")
        size = int.from_bytes(payload[pos : pos + 4], "little")
        pos += 4
        if pos + size > len(payload):
            raise ValueError("truncated FRV1 frame payload")
        frames.append(payload[pos : pos + size])
        pos += size
    return interval_ms, frames


def synth_media_binary(docs: DataFrame) -> DataFrame:
    """(doc_id, media_type, payload): VALID media payloads — PPM images
    (doc_id % 3 == 0), PCM16 WAV audio (doc_id % 3 == 1), and FRV1 video
    (doc_id % 3 == 2, 2-4 PPM frames). Pixel/sample values are integer
    functions of (doc_id, frame, index) so the decode oracles are exact."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, kinds = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 3 == 0:
                    payloads.append(encode_ppm(_img_pixels(d), IMG_W, IMG_H))
                    kinds.append("image")
                elif d % 3 == 1:
                    payloads.append(encode_wav(_wav_samples(d)))
                    kinds.append("audio")
                else:
                    frames = [
                        encode_ppm(_vid_pixels(d, f), IMG_W, IMG_H)
                        for f in range(_vid_n_frames(d))
                    ]
                    payloads.append(encode_frv(frames))
                    kinds.append("video")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": kinds,
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(
        kernel, schema="doc_id long, media_type string, payload binary"
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode PPM/WAV payloads into raw integer arrays, Arrow-batched:

    (doc_id, media_type, width, height, sample_rate, values array<long>)

    Image values are pixel bytes 0..255 flat row-major; audio values are
    raw int16 samples; video values are all frames' pixel bytes
    concatenated in frame order (integers keep downstream aggregates
    order-independent)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "media_type": [], "width": [], "height": [],
                "sample_rate": [], "values": [],
            }
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                b = bytes(payload)
                if kind == "image":
                    w, h, px = decode_ppm(b)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sample_rate"].append(None)
                    out["values"].append(px.astype(np.int64))
                elif kind == "audio":
                    rate, smp = decode_wav(b)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["sample_rate"].append(rate)
                    out["values"].append(smp.astype(np.int64))
                else:
                    _, frames = decode_frv(b)
                    if not frames:
                        # keep the malformed-payload contract: every bad
                        # media path raises ValueError, never IndexError
                        raise ValueError("empty FRV1 container (0 frames)")
                    decoded = [decode_ppm(fr) for fr in frames]
                    w, h = decoded[0][0], decoded[0][1]
                    if any((fw, fh) != (w, h) for fw, fh, _ in decoded):
                        raise ValueError("FRV1 frames disagree on geometry")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sample_rate"].append(None)
                    out["values"].append(
                        np.concatenate([px for _, _, px in decoded]).astype(
                            np.int64
                        )
                    )
                out["doc_id"].append(doc_id)
                out["media_type"].append(kind)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        kernel,
        schema=(
            "doc_id long, media_type string, width long, height long, "
            "sample_rate long, values array<long>"
        ),
    )


def decode_summary(docs: DataFrame) -> DataFrame:
    """SQL-checkable face of the decode path: synthesize valid payloads,
    decode them, and reduce each to integer aggregates —
    (doc_id, media_type, width, height, n_values, value_sum). Integer sums
    are order-independent, so the DuckDB oracle (which regenerates the
    pixel/sample formulas with generate_series) matches bit-for-bit."""
    dec = decode_media(synth_media_binary(docs))
    # audio rows have no width/height: 0, not NULL — NULLs would surface
    # as NaN floats in the driver's pandas compare / value hash
    return dec.select(
        "doc_id",
        "media_type",
        F.coalesce("width", F.lit(0)).cast("long").alias("width"),
        F.coalesce("height", F.lit(0)).cast("long").alias("height"),
        F.size("values").cast("long").alias("n_values"),
        F.aggregate(
            "values", F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("value_sum"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """(doc_id, features array<double>): deterministic byte-histogram
    features over the binary payload — a stand-in with the exact batch
    shape a real decoder+featurizer would have (binary in, fixed-size
    float vector out, Arrow-batched)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=FEATURE_BINS).astype(
                    np.float64
                )
                total = hist.sum()
                feats.append(hist / total if total > 0 else hist)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "features": feats}
            )

    return media.select("doc_id", "payload").mapInPandas(
        kernel, schema="doc_id long, features array<double>"
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize of PPM image rows to (width, height):
    (doc_id, width, height, pixels array<long>) — decode + numpy index
    gather per Arrow batch, no imaging library needed."""
    tw, th = int(width), int(height)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pixels = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_ppm(bytes(payload))
                img = px.reshape(h, w, 3)
                ys = (np.arange(th) * h) // th
                xs = (np.arange(tw) * w) // tw
                resized = img[ys][:, xs]
                ids.append(doc_id)
                pixels.append(resized.reshape(-1).astype(np.int64))
            yield pd.DataFrame(
                {"doc_id": ids, "width": tw, "height": th, "pixels": pixels}
            )

    return (
        media.filter(F.col("media_type") == "image")
        .select("doc_id", "payload")
        .mapInPandas(
            kernel,
            schema="doc_id long, width long, height long, pixels array<long>",
        )
    )


def extract_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Real frame extraction over FRV1 video rows: demux the container,
    decode every ``every_ms``-th frame (constant frame interval from the
    header), and emit the frame's pixels —

    (doc_id, frame_idx, frame_ts_ms, width, height, pixels array<long>)

    Arrow-batched like every codec kernel here; this is the decode half
    of frame sampling (``frame_sample`` is the Catalyst-native scheduling
    half over metadata-only tables)."""
    step_ms = max(1, int(every_ms))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "frame_idx": [], "frame_ts_ms": [],
                "width": [], "height": [], "pixels": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                interval_ms, frames = decode_frv(bytes(payload))
                iv = max(1, interval_ms)
                # schedule-aligned sampling, matching frame_sample's
                # semantics: for each sampling tick k*every_ms, keep the
                # FIRST frame at-or-after the tick (dedup'd). A naive
                # floor-division stride over-samples whenever the frame
                # interval does not divide every_ms (e.g. interval=600,
                # every=1000 → stride floor(1000/600)=1 kept EVERY frame).
                indices, k = [], 0
                while True:
                    idx = -(-(k * step_ms) // iv)  # ceil
                    if idx >= len(frames):
                        break
                    if not indices or indices[-1] != idx:
                        indices.append(idx)
                    k += 1
                for idx in indices:
                    w, h, px = decode_ppm(frames[idx])
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_ts_ms"].append(idx * interval_ms)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["pixels"].append(px.astype(np.int64))
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("media_type") == "video")
        .select("doc_id", "payload")
        .mapInPandas(
            kernel,
            schema=(
                "doc_id long, frame_idx long, frame_ts_ms long, "
                "width long, height long, pixels array<long>"
            ),
        )
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(doc_id, frame_ts_ms): deterministic frame-sampling plan for video
    rows — the scheduling half of frame extraction over metadata-only
    tables (``extract_frames`` is the decode half for FRV1 payloads).
    Catalyst-native sequence explode."""
    return (
        media.filter((F.col("media_type") == "video") & (F.col("duration_ms") > 0))
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("duration_ms") - 1,
                    F.lit(int(every_ms)),
                )
            ).alias("frame_ts_ms"),
        )
        .select("doc_id", F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"))
    )
