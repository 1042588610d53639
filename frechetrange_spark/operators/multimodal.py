"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, plus the Spark-side plumbing for decode / feature-extract /
resize / frame-sample.

The decode step itself is STUBBED (no PIL/ffmpeg in this environment):
``decode_media`` raises ``NotImplementedError`` unless the optional
libraries are importable, and ``extract_features`` uses a deterministic
byte-level feature (16-bin byte histogram) so the schema, partitioning,
Arrow batch shape, and UDF signatures are real and tested end-to-end.

The media table is synthesized deterministically from the documents corpus
(payload = utf-8 bytes of the text; metadata pure functions of doc_id), so
the metadata query has an exact SQL oracle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_BINS = 16

try:  # pragma: no cover - not present in this environment
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


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


def decode_media(media: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Decode payloads into pixel/sample arrays. STUB: requires PIL/ffmpeg,
    not available here; the Arrow plumbing is exercised by
    ``extract_features`` instead."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg which are not available in "
            "this environment; use extract_features for the tested path"
        )
    raise NotImplementedError("real decode not implemented in this round")


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
    """Resize plumbing: filters to images, carries target dims; the pixel
    work is the stubbed decode."""
    if not _HAS_PIL:
        raise NotImplementedError("resize requires PIL; stubbed in this environment")
    raise NotImplementedError


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(doc_id, frame_ts_ms): deterministic frame-sampling plan for video
    rows — the scheduling half of frame extraction (the decode half is the
    stub). Catalyst-native sequence explode."""
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
