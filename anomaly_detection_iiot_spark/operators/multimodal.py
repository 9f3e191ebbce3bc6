"""Multimodal (image/audio/video) column plumbing (BASELINE.json north
star; no reference equivalent).

Design: media are opaque ``binary`` columns plus a typed ``meta``
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` so each task streams batches instead of
materializing a partition of blobs. Partition by ``media_id`` (or a
storage bucket of it) and cap
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of decoded
frames fits executor memory at 100 TB.

The codec boundary is explicit:

- ``decode_media(df, codec="real")`` decodes images (Pillow), PCM WAV
  audio (stdlib ``wave``), and MJPEG-style video — a blob of
  concatenated JPEG frames split on SOI markers, each frame decoded
  via the same Pillow path. Pillow is optional: when absent and
  ``kinds`` touches image/video, construction raises
  NotImplementedError driver-side (never a mid-job executor crash).
- ``codec="fake"`` (default here, used by tests) decodes
  deterministically: the blob bytes are interpreted as uint8 and
  reshaped per the meta struct — schema, batch shape, and everything
  downstream (resize, features) is REAL numpy and fully tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("format", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("data", BinaryType()),
        StructField("meta", META_SCHEMA),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("pixels", ArrayType(DoubleType())),
        StructField("shape", ArrayType(IntegerType())),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("std_byte", DoubleType()),
        StructField("histogram", ArrayType(LongType())),
    ]
)


def synthesize_media(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table from any text corpus: blob = utf-8
    bytes, kind round-robins image/audio/video, meta derived from the
    blob length. Pure column ops — used by tests and the oracle-checked
    manifest/frame-sample queries."""
    n_bytes = F.octet_length(F.encode(F.col(text_col), "utf-8"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    meta = F.struct(
        (n_bytes % 32 + 1).cast("int").alias("width"),
        F.lit(1).cast("int").alias("height"),
        F.lit(1).cast("int").alias("channels"),
        F.lit(8000).cast("int").alias("sample_rate"),
        (n_bytes % 50 + 10).cast("int").alias("n_frames"),
        F.lit("raw").alias("format"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("data"),
        meta.alias("meta"),
    )


def pil_available() -> bool:
    """True when Pillow can be imported (optional dependency)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def split_mjpeg_frames(blob: bytes) -> list[bytes]:
    """Split an MJPEG-style blob (concatenated JPEG images) into
    per-frame byte strings by walking JPEG marker segments.

    Pure bytes logic. Each frame is parsed from its SOI (FFD8) to its
    EOI (FFD9): length-prefixed segments (APPn/DQT/SOF/DHT/SOS headers)
    are skipped by their declared length — so an EXIF thumbnail (a full
    JPEG embedded in an APP1 payload) cannot cause a false split — and
    entropy-coded data after SOS is scanned for the next real marker
    (within entropy data a 0xFF is always stuffed with 0x00 or a
    restart marker D0-D7, so anything else terminates the scan)."""
    frames: list[bytes] = []
    i, n = 0, len(blob)
    while i < n:
        if blob[i:i + 2] != b"\xff\xd8":
            raise ValueError(
                f"expected JPEG SOI marker at offset {i} in video blob"
            )
        start = i
        j = i + 2
        while True:
            if j + 1 >= n or blob[j] != 0xFF:
                raise ValueError(
                    f"corrupt JPEG: expected marker at offset {j}"
                )
            marker = blob[j + 1]
            if marker == 0xFF:  # fill byte before a marker — resync
                j += 1
                continue
            if marker == 0xD9:  # EOI — frame complete
                j += 2
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
                j += 2
                continue
            if j + 3 >= n:
                raise ValueError("truncated JPEG segment header")
            seglen = int.from_bytes(blob[j + 2:j + 4], "big")
            is_sos = marker == 0xDA
            j += 2 + seglen
            if is_sos:
                # entropy-coded scan: skip stuffed FF00 / restart markers
                while True:
                    k = blob.find(b"\xff", j)
                    if k == -1 or k + 1 >= n:
                        raise ValueError(
                            "unterminated entropy-coded JPEG scan"
                        )
                    nxt = blob[k + 1]
                    if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                        j = k + 2
                        continue
                    j = k
                    break
        frames.append(blob[start:j])
        i = j
    if not frames:
        raise ValueError("no JPEG SOI marker found in video blob")
    return frames


def decode_media(
    df: DataFrame,
    codec: str = "fake",
    kinds: tuple[str, ...] = ("image", "audio", "video"),
) -> DataFrame:
    """Decode blobs to float pixel/sample arrays via mapInPandas.

    codec="real" decodes with real codecs where one exists:

    - images via Pillow (optional dependency — when absent and
      ``kinds`` touches "image" or "video", raises NotImplementedError
      at CONSTRUCTION time, so the failure is a clear driver-side
      error, not a mid-job executor crash; pass ``kinds=("audio",)``
      to decode audio without Pillow);
    - PCM WAV audio via the stdlib ``wave`` module (always available);
    - MJPEG-style video — concatenated JPEG frames split on SOI
      markers (``split_mjpeg_frames``), each frame decoded via the
      same Pillow path, stacked to a (n_frames, h, w[, c]) tensor.

    codec="fake" (deterministic uint8 reinterpretation) exercises the
    identical Spark plumbing with no codec dependency."""
    if codec == "real":
        needs_pil = {"image", "video"} & set(kinds)
        if needs_pil and not pil_available():
            raise NotImplementedError(
                f"codec='real' {'/'.join(sorted(needs_pil))} decode needs "
                "Pillow, which is not installed; pass kinds=('audio',) for "
                "stdlib WAV decode, or use codec='fake' (deterministic "
                "uint8 reinterpretation) — the Spark plumbing is identical"
            )
        df = df.filter(F.col("kind").isin(*kinds))

        def real_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io
            import wave

            out_cols = [f.name for f in DECODED_SCHEMA]
            for pdf in it:
                out = []
                for r in pdf.itertuples(index=False):
                    blob = bytes(r.data)
                    if r.kind == "image":
                        # executor-side import; guaranteed present by the
                        # construction-time gate above
                        from PIL import Image

                        arr = (
                            np.asarray(Image.open(io.BytesIO(blob)))
                            .astype(np.float64)
                            / 255.0
                        )
                        shape = list(arr.shape)
                    elif r.kind == "audio":
                        with wave.open(io.BytesIO(blob)) as w:
                            raw = w.readframes(w.getnframes())
                            width = w.getsampwidth()
                            nch = w.getnchannels()
                        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
                        if dtype is None:
                            raise NotImplementedError(
                                f"unsupported WAV sample width {width}"
                            )
                        samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
                        scale = float(2 ** (8 * width - 1))
                        if dtype is np.uint8:  # 8-bit WAV is unsigned
                            samples = samples - 128.0
                            scale = 128.0
                        arr = samples / scale
                        shape = [len(samples) // nch, nch]
                    else:  # video: MJPEG-style concatenated JPEGs
                        from PIL import Image

                        frames = [
                            np.asarray(Image.open(io.BytesIO(fb))).astype(
                                np.float64
                            )
                            / 255.0
                            for fb in split_mjpeg_frames(blob)
                        ]
                        arr = np.stack(frames)
                        shape = list(arr.shape)
                    out.append(
                        {
                            "media_id": r.media_id,
                            "kind": r.kind,
                            "pixels": arr.ravel().tolist(),
                            "shape": shape,
                        }
                    )
                yield pd.DataFrame(out, columns=out_cols)

        return df.mapInPandas(real_batches, DECODED_SCHEMA)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                raw = np.frombuffer(bytes(r.data), dtype=np.uint8)
                meta = r.meta
                w = int(meta["width"]) if meta["width"] else len(raw)
                usable = (len(raw) // w) * w
                arr = raw[:usable].astype(np.float64) / 255.0
                out.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "pixels": arr.tolist(),
                        "shape": [len(raw) // w, w],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA])

    return df.mapInPandas(batches, DECODED_SCHEMA)


def resize_nearest(df: DataFrame, out_len: int) -> DataFrame:
    """Nearest-neighbor 1-D resample of decoded pixel arrays to a fixed
    length (the resize step of an image pipeline, flattened) — real
    numpy over mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def rs(p):
                a = np.asarray(p, dtype=np.float64)
                if len(a) == 0:
                    return [0.0] * out_len
                idx = np.floor(np.arange(out_len) * len(a) / out_len).astype(int)
                return a[idx].tolist()

            pdf = pdf.copy()
            pdf["pixels"] = pdf["pixels"].map(rs)
            pdf["shape"] = pdf["shape"].map(lambda s: [1, out_len])
            yield pdf

    return df.mapInPandas(batches, DECODED_SCHEMA)


def byte_features(df: DataFrame, n_bins: int = 8) -> DataFrame:
    """Per-media byte statistics + histogram — the cheap feature
    extraction used for corpus triage before real model embedding."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                raw = np.frombuffer(bytes(r.data), dtype=np.uint8)
                hist = np.histogram(raw, bins=n_bins, range=(0, 256))[0]
                rows.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "n_bytes": len(raw),
                        "mean_byte": float(raw.mean()) if len(raw) else 0.0,
                        "std_byte": float(raw.std()) if len(raw) else 0.0,
                        "histogram": hist.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every: int = 7) -> DataFrame:
    """Video frame sampling: every k-th frame index from meta.n_frames,
    exploded to (media_id, frame_idx) — pure JVM sequence/explode, no
    Python; the decode of sampled frames happens later and touches only
    the sampled subset."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.n_frames") - 1,
                    F.lit(every),
                )
            ).alias("frame_idx"),
        )
    )
