"""Multimodal plumbing tests: deterministic media table, Arrow-batched
feature extraction shape/values, frame-sampling plan, stubbed decode."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from frechetrange_spark.operators.multimodal import (
    FEATURE_BINS,
    decode_media,
    extract_features,
    frame_sample,
    media_meta,
    resize_images,
    synth_media,
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


def test_decode_and_resize_are_stubbed(spark, docs):
    m = synth_media(docs)
    with pytest.raises(NotImplementedError):
        decode_media(m)
    with pytest.raises(NotImplementedError):
        resize_images(m, 32, 32)
