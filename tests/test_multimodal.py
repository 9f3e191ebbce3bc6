"""Multimodal plumbing tests: schema, Arrow batch shape, deterministic
fake decode, resize, features, frame sampling, real-codec stub."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from anomaly_detection_iiot_spark.operators import multimodal


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(6),
                "text": [f"payload-{i} " * (i + 1) for i in range(6)],
            }
        )
    )
    return multimodal.synthesize_media(docs)


def _types(schema):
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def test_media_schema(media):
    assert _types(media.schema) == _types(multimodal.MEDIA_SCHEMA)
    kinds = {r.media_id: r.kind for r in media.select("media_id", "kind").collect()}
    assert kinds[0] == "image" and kinds[1] == "audio" and kinds[2] == "video"


def test_fake_decode_roundtrip(media):
    decoded = multimodal.decode_media(media, codec="fake")
    assert _types(decoded.schema) == _types(multimodal.DECODED_SCHEMA)
    rows = {r.media_id: r for r in decoded.collect()}
    src = {r.media_id: r for r in media.collect()}
    for mid, r in rows.items():
        raw = np.frombuffer(bytes(src[mid].data), dtype=np.uint8)
        w = src[mid].meta.width
        usable = (len(raw) // w) * w
        np.testing.assert_allclose(r.pixels, raw[:usable] / 255.0)
        assert r.shape == [len(raw) // w, w]


def test_real_codec_is_explicit_stub(media):
    with pytest.raises(NotImplementedError, match="not installed"):
        multimodal.decode_media(media, codec="real")


def test_resize_nearest(spark, media):
    decoded = multimodal.decode_media(media, codec="fake")
    resized = multimodal.resize_nearest(decoded, out_len=10)
    rows = resized.collect()
    assert all(len(r.pixels) == 10 for r in rows)
    assert all(r.shape == [1, 10] for r in rows)
    # nearest-neighbor keeps only values present in the source
    # (empty decodes zero-fill by design)
    dec = {r.media_id: r.pixels for r in decoded.collect()}
    for r in rows:
        if dec[r.media_id]:
            assert set(r.pixels) <= set(dec[r.media_id])
        else:
            assert r.pixels == [0.0] * 10


def test_byte_features(media):
    feats = multimodal.byte_features(media, n_bins=8)
    assert _types(feats.schema) == _types(multimodal.FEATURE_SCHEMA)
    src = {r.media_id: bytes(r.data) for r in media.collect()}
    for r in feats.collect():
        raw = np.frombuffer(src[r.media_id], dtype=np.uint8)
        assert r.n_bytes == len(raw)
        assert r.mean_byte == pytest.approx(raw.mean())
        assert sum(r.histogram) == len(raw)


def test_sample_frames(media):
    sampled = multimodal.sample_frames(media, every=7)
    meta = {r.media_id: r.meta.n_frames for r in media.collect()}
    got = sampled.groupBy("media_id").count().collect()
    vids = {r.media_id: r["count"] for r in got}
    expected = {
        mid: len(range(0, nf, 7))
        for mid, nf in meta.items()
        if mid % 3 == 2
    }
    assert vids == expected
