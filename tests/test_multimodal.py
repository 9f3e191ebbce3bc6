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


def test_real_codec_raises_cleanly_without_pil(media):
    """When Pillow is absent, codec='real' must fail at CONSTRUCTION
    with an explicit NotImplementedError (not a mid-job executor
    ImportError). Skipped where Pillow exists — the decode tests below
    cover that environment."""
    if multimodal.pil_available():
        pytest.skip("Pillow installed; construction-time guard inactive")
    with pytest.raises(NotImplementedError, match="not installed"):
        multimodal.decode_media(media, codec="real")


def test_real_codec_decodes_png(spark):
    """Real PIL decode of an in-memory PNG — skipped (not failed) where
    Pillow is not installed."""
    PIL = pytest.importorskip("PIL")
    import io

    rng = np.random.default_rng(5)
    img_arr = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    buf = io.BytesIO()
    PIL.Image.fromarray(img_arr, mode="L").save(buf, format="PNG")
    media = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "media_id": 1,
                    "kind": "image",
                    "data": bytearray(buf.getvalue()),
                    "meta": (5, 4, 1, 0, 1, "png"),
                }
            ]
        ),
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.decode_media(media, codec="real").collect()
    assert len(rows) == 1
    assert rows[0].shape == [4, 5]
    np.testing.assert_allclose(
        rows[0].pixels, img_arr.ravel() / 255.0, rtol=1e-12
    )


def test_real_codec_decodes_wav(spark):
    """PCM WAV decode uses the stdlib wave module — no optional deps,
    always runs."""
    import io
    import wave

    samples = np.array([0, 1000, -1000, 32767, -32768, 5], dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    media = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "media_id": 2,
                    "kind": "audio",
                    "data": bytearray(buf.getvalue()),
                    "meta": (0, 0, 1, 8000, 0, "wav"),
                }
            ]
        ),
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.decode_media(
        media, codec="real", kinds=("audio",)
    ).collect()
    assert rows[0].shape == [6, 1]
    np.testing.assert_allclose(rows[0].pixels, samples / 32768.0, rtol=1e-12)


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


def _fake_jpeg(*, app1_payload: bytes = b"", entropy: bytes = b"\x01\x02\x03") -> bytes:
    """Build a structurally valid minimal JPEG: SOI, optional APP1
    (length-prefixed — where EXIF thumbnails live), an SOS header, raw
    entropy bytes, EOI. `entropy` must not contain a bare 0xFF followed
    by a non-stuffing byte (real encoders guarantee this by stuffing)."""
    parts = [b"\xff\xd8"]
    if app1_payload:
        parts.append(b"\xff\xe1" + (len(app1_payload) + 2).to_bytes(2, "big") + app1_payload)
    sos_hdr = b"\x00\x01\x00"  # arbitrary 3-byte SOS header payload
    parts.append(b"\xff\xda" + (len(sos_hdr) + 2).to_bytes(2, "big") + sos_hdr)
    parts.append(entropy)
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def test_split_mjpeg_frames_pure_bytes():
    """Marker-segment MJPEG splitting is pure bytes logic — testable
    without Pillow. Covers stuffed 0xFF and restart markers inside
    entropy-coded data."""
    f1 = _fake_jpeg(entropy=b"frame-one \xff\x00 stuffed \xff\xd3 rst")
    f2 = _fake_jpeg(entropy=b"\x00" * 9)
    f3 = _fake_jpeg(entropy=b"tail")
    assert multimodal.split_mjpeg_frames(f1 + f2 + f3) == [f1, f2, f3]
    assert multimodal.split_mjpeg_frames(f2) == [f2]
    with pytest.raises(ValueError, match="SOI"):
        multimodal.split_mjpeg_frames(b"not a jpeg at all")


def test_split_mjpeg_frames_exif_thumbnail_not_split():
    """ADVICE r4: an APP1 (EXIF) payload may legally contain a complete
    embedded thumbnail JPEG — its SOI must NOT start a new frame. The
    segment walker skips APPn payloads by declared length, so the
    thumbnail is invisible to the splitter."""
    thumbnail = _fake_jpeg(entropy=b"thumb")  # full JPEG inside APP1
    f1 = _fake_jpeg(app1_payload=b"Exif\x00\x00" + thumbnail)
    f2 = _fake_jpeg(entropy=b"second-frame")
    assert multimodal.split_mjpeg_frames(f1 + f2) == [f1, f2]


def test_real_codec_video_gate_without_pil(media):
    """ADVICE r3: kinds including 'video' must fail at CONSTRUCTION
    when Pillow is absent — never mid-job in an executor."""
    if multimodal.pil_available():
        pytest.skip("Pillow installed; construction-time guard inactive")
    with pytest.raises(NotImplementedError, match="not installed"):
        multimodal.decode_media(media, codec="real", kinds=("video",))


def test_real_codec_decodes_mjpeg_video(spark):
    """Real MJPEG-style video decode: concatenated Pillow-encoded JPEG
    frames split on SOI and stacked to (n_frames, h, w). Skipped (not
    failed) where Pillow is absent."""
    PIL = pytest.importorskip("PIL")
    import io

    # uniform-gray frames survive JPEG's lossy round-trip almost exactly
    levels = [40, 128, 220]
    frames = []
    for lv in levels:
        buf = io.BytesIO()
        arr = np.full((6, 8), lv, dtype=np.uint8)
        PIL.Image.fromarray(arr, mode="L").save(buf, format="JPEG", quality=95)
        frames.append(buf.getvalue())
    media = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "media_id": 7,
                    "kind": "video",
                    "data": bytearray(b"".join(frames)),
                    "meta": (8, 6, 1, 0, len(levels), "mjpeg"),
                }
            ]
        ),
        multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.decode_media(
        media, codec="real", kinds=("video",)
    ).collect()
    assert len(rows) == 1
    assert rows[0].shape == [3, 6, 8]
    got = np.asarray(rows[0].pixels).reshape(3, 6, 8)
    for k, lv in enumerate(levels):
        np.testing.assert_allclose(got[k], lv / 255.0, atol=0.02)
