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
