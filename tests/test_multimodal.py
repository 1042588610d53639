"""Multimodal tests: deterministic media table, Arrow-batched feature
extraction shape/values, frame-sampling plan, and the real PPM/WAV codecs
(decode round-trips, header/chunk robustness, nearest-neighbor resize)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from frechetrange_spark.operators.multimodal import (
    FEATURE_BINS,
    IMG_H,
    IMG_W,
    WAV_RATE,
    WAV_SAMPLES,
    _img_pixels,
    _wav_samples,
    decode_media,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    extract_features,
    frame_sample,
    media_meta,
    resize_images,
    synth_media,
    synth_media_binary,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_media_table_deterministic(spark, docs):
    m = synth_media(docs)
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.filter("doc_id = 0").collect()[0]
    assert row["media_type"] == "image"
    assert row["width"] == 64 and row["height"] == 64
    text = docs.filter("doc_id = 0").collect()[0]["text"]
    assert bytes(row["payload"]) == text.encode("utf-8")


def test_extract_features_shape_and_values(spark, docs):
    m = synth_media(docs)
    feats = extract_features(m).filter("doc_id < 10").orderBy("doc_id").collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.filter("doc_id < 10").collect()
    }
    assert len(feats) == 10
    for r in feats:
        v = np.array(r["features"])
        assert v.shape == (FEATURE_BINS,)
        assert v.sum() == pytest.approx(1.0, abs=1e-12)
        b = np.frombuffer(texts[r["doc_id"]].encode("utf-8"), dtype=np.uint8)
        want = np.bincount(b >> 4, minlength=FEATURE_BINS) / len(b)
        assert np.allclose(v, want)


def test_frame_sample_plan(spark, docs):
    m = synth_media(docs)
    fs = frame_sample(m, every_ms=1000)
    pdf = fs.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("frame_ts_ms").alias("last")
    ).join(m.select("doc_id", "duration_ms"), "doc_id").toPandas()
    assert (pdf["last"] < pdf["duration_ms"]).all()
    assert (pdf["n"] == (pdf["duration_ms"] - 1) // 1000 + 1).all()


# ---------------------------------------------------------------------------
# Real codecs
# ---------------------------------------------------------------------------


def test_ppm_roundtrip_local():
    px = _img_pixels(42)
    w, h, got = decode_ppm(encode_ppm(px, IMG_W, IMG_H))
    assert (w, h) == (IMG_W, IMG_H)
    assert np.array_equal(got, px)


def test_ppm_header_grammar():
    """Comments and arbitrary whitespace in the header parse correctly."""
    px = np.arange(2 * 2 * 3, dtype=np.uint8)
    payload = b"P6 # comment\n# another\n  2\t2 \n255\n" + px.tobytes()
    w, h, got = decode_ppm(payload)
    assert (w, h) == (2, 2)
    assert np.array_equal(got, px)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + px.tobytes())
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n65535\n" + px.tobytes())


def test_wav_roundtrip_local():
    smp = _wav_samples(17)
    rate, got = decode_wav(encode_wav(smp))
    assert rate == WAV_RATE
    assert np.array_equal(got, smp)


def test_wav_tolerates_extra_chunks():
    smp = np.array([1, -2, 3], dtype=np.int16)
    wav = encode_wav(smp)
    # splice a LIST chunk (odd size -> exercises word-alignment) after fmt
    extra = b"LIST" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
    spliced = wav[:36] + extra + wav[36:]
    rate, got = decode_wav(spliced)
    assert rate == WAV_RATE
    assert np.array_equal(got, smp)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")


def test_decode_media_distributed_roundtrip(spark, docs):
    """decode(synth_media_binary(docs)) reproduces the generator formulas
    exactly through the full Spark/Arrow path — images, audio, AND video
    (FRV1 demux + per-frame PPM decode)."""
    from frechetrange_spark.operators.multimodal import _vid_n_frames, _vid_pixels

    sub = docs.filter("doc_id < 30")
    rows = decode_media(synth_media_binary(sub)).collect()
    assert len(rows) == sub.count()
    for r in rows:
        d = r["doc_id"]
        if r["media_type"] == "image":
            assert (r["width"], r["height"]) == (IMG_W, IMG_H)
            assert np.array_equal(np.array(r["values"]), _img_pixels(d))
        elif r["media_type"] == "audio":
            assert r["sample_rate"] == WAV_RATE
            assert len(r["values"]) == WAV_SAMPLES
            assert np.array_equal(np.array(r["values"]), _wav_samples(d))
        else:
            assert (r["width"], r["height"]) == (IMG_W, IMG_H)
            want = np.concatenate(
                [_vid_pixels(d, f) for f in range(_vid_n_frames(d))]
            )
            assert np.array_equal(np.array(r["values"]), want)


def test_resize_nearest_neighbor_parity(spark, docs):
    sub = docs.filter("doc_id < 30")
    got = {
        r["doc_id"]: np.array(r["pixels"])
        for r in resize_images(synth_media_binary(sub), 8, 8).collect()
    }
    assert len(got) == sub.filter("doc_id % 3 = 0").count()
    for d, pix in got.items():
        img = _img_pixels(d).reshape(IMG_H, IMG_W, 3)
        ys = (np.arange(8) * IMG_H) // 8
        xs = (np.arange(8) * IMG_W) // 8
        want = img[ys][:, xs].reshape(-1)
        assert np.array_equal(pix, want)


def test_frv_roundtrip_local():
    """FRV1 container: encode N PPM frames, demux them back bit-exactly."""
    from frechetrange_spark.operators.multimodal import (
        VID_INTERVAL_MS,
        _vid_pixels,
        decode_frv,
        encode_frv,
    )

    frames = [encode_ppm(_vid_pixels(8, f), IMG_W, IMG_H) for f in range(4)]
    interval, got = decode_frv(encode_frv(frames))
    assert interval == VID_INTERVAL_MS
    assert got == frames
    with pytest.raises(ValueError):
        decode_frv(b"nope")
    with pytest.raises(ValueError):
        decode_frv(encode_frv(frames)[:-3])  # truncated last frame


def test_extract_frames_sampling_and_values(spark, docs):
    """extract_frames demuxes FRV1 video rows and keeps every stride-th
    frame: with every_ms = 2*interval only even frame indices survive,
    timestamps are idx*interval, pixels match the generator formula."""
    from frechetrange_spark.operators.multimodal import (
        VID_INTERVAL_MS,
        _vid_n_frames,
        _vid_pixels,
        extract_frames,
    )

    sub = docs.filter("doc_id < 30")
    rows = extract_frames(
        synth_media_binary(sub), every_ms=2 * VID_INTERVAL_MS
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    vids = [r["doc_id"] for r in sub.collect() if r["doc_id"] % 3 == 2]
    assert sorted(by_doc) == sorted(vids)
    for d, rs in by_doc.items():
        n = _vid_n_frames(d)
        want_idx = list(range(0, n, 2))
        assert sorted(r["frame_idx"] for r in rs) == want_idx
        for r in rs:
            assert r["frame_ts_ms"] == r["frame_idx"] * VID_INTERVAL_MS
            assert (r["width"], r["height"]) == (IMG_W, IMG_H)
            assert np.array_equal(
                np.array(r["pixels"]), _vid_pixels(d, r["frame_idx"])
            )


def test_decode_media_rejects_invalid_video_container(spark, docs):
    """A video-typed row whose payload is NOT an FRV1 container fails
    loudly inside the kernel (no silent skip)."""
    m = synth_media(docs).filter("media_type = 'video'").limit(1)
    with pytest.raises(Exception) as exc:
        decode_media(m).collect()
    assert "FRV1" in str(exc.value) or "ValueError" in str(exc.value)


def test_extract_frames_schedule_aligned_at_non_divisible_interval(spark):
    """Sampling must match frame_sample's schedule semantics (first frame
    at-or-after each k*every_ms tick), not a floor-division stride: with
    interval=600 and every_ms=1000 the kept indices are ceil(k*1000/600)
    = 0, 2, 4, 5, 7 — a naive stride of floor(1000/600)=1 kept EVERY
    frame (1.67x over-sampling)."""
    from frechetrange_spark.operators.multimodal import (
        _vid_pixels,
        encode_frv,
        encode_ppm,
        extract_frames,
    )

    frames = [
        encode_ppm(_vid_pixels(7, f), IMG_W, IMG_H) for f in range(8)
    ]
    payload = encode_frv(frames, interval_ms=600)
    media = spark.createDataFrame(
        [(7, "video", bytearray(payload))],
        "doc_id long, media_type string, payload binary",
    )
    rows = extract_frames(media, every_ms=1000).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 2, 4, 5, 7]
    for r in rows:
        assert r["frame_ts_ms"] == r["frame_idx"] * 600


def test_decode_media_rejects_empty_frv_container(spark):
    """A zero-frame FRV1 container raises ValueError (the same contract
    as every other malformed-payload path), not IndexError."""
    from frechetrange_spark.operators.multimodal import encode_frv

    media = spark.createDataFrame(
        [(2, "video", bytearray(encode_frv([])))],
        "doc_id long, media_type string, payload binary",
    )
    with pytest.raises(Exception) as exc:
        decode_media(media).collect()
    assert "empty FRV1" in str(exc.value)
