"""Property-based round-trips for the stdlib codecs (no SparkSession —
these are pure functions, so hypothesis can hammer them cheaply).

encode→decode must be the identity for every valid input, not just the
fixtures the example tests pick; shrinking then hands back the minimal
failing frame/array if a framing or filter bug ever creeps in.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from anomaly_detection_iiot_spark.operators import multimodal as m


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_any_shape(w, h, seed):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    out = m.decode_png(m.encode_png(arr))
    assert out.shape == (h, w)
    assert (out == arr).all()


@settings(max_examples=60, deadline=None)
@given(
    frames=st.lists(
        st.binary(min_size=0, max_size=64), min_size=0, max_size=8
    ),
    w=st.integers(min_value=1, max_value=64),
    h=st.integers(min_value=1, max_value=64),
)
def test_avi_roundtrip_any_frames(frames, w, h):
    # odd-length frames exercise RIFF word-alignment padding; empty
    # frames and empty containers are legal
    blob = m.encode_avi(frames, w, h)
    meta, got = m.parse_avi(blob)
    assert meta == {"n_frames": len(frames), "width": w, "height": h}
    assert got == frames


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=64))
def test_avi_parser_rejects_arbitrary_bytes(data):
    # arbitrary bytes must raise, never silently return frames
    try:
        meta, frames = m.parse_avi(data)
    except (ValueError, Exception):
        return
    raise AssertionError(f"parser accepted junk: {meta} {frames}")


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=255), min_size=1, max_size=12
    ),
    wblocks=st.integers(min_value=1, max_value=3),
)
def test_jpeg_uniform_blocks_lossless_any_values(vals, wblocks):
    # DC quant step 8 makes uniform 8x8 blocks round-trip exactly for
    # EVERY pixel value, any block grid shape
    arr = np.repeat(
        np.repeat(
            np.array(vals, dtype=np.uint8).reshape(-1, 1), 8, axis=0
        ),
        8 * wblocks,
        axis=1,
    )
    out = m.decode_jpeg(m.encode_jpeg(arr))
    assert out.shape == arr.shape
    assert (out == arr).all()


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_decode_equals_coefficient_reference_any_shape(w, h, seed):
    # lossy content: decode must equal dequant+IDCT of the encoder's own
    # quantized coefficients (independent recomputation, edge-padded
    # like the encoder then cropped), for every shape including
    # non-multiples of 8
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    out = m.decode_jpeg(m.encode_jpeg(arr))
    assert out.shape == (h, w)
    C = m._jpeg_dct_matrix()
    Q = m._JPEG_Q.reshape(8, 8)
    ph, pw = (-h) % 8, (-w) % 8
    padded = np.pad(arr, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    ref = np.zeros_like(padded)
    for by in range(0, padded.shape[0], 8):
        for bx in range(0, padded.shape[1], 8):
            blk = padded[by : by + 8, bx : bx + 8] - 128
            q = np.rint((C @ blk @ C.T) / Q)
            ref[by : by + 8, bx : bx + 8] = np.clip(
                np.rint(C.T @ (q * Q) @ C + 128), 0, 255
            )
    assert (out == ref[:h, :w].astype(np.uint8)).all()


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=64))
def test_jpeg_decoder_rejects_arbitrary_bytes(data):
    try:
        m.decode_jpeg(data)
    except (ValueError, NotImplementedError, IndexError, Exception):
        return
    raise AssertionError("decoder accepted junk bytes")
