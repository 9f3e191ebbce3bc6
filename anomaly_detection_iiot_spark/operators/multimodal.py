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
- ``codec="png"`` is a REAL image codec with zero dependencies: a
  stdlib (``zlib`` + ``struct``) 8-bit-grayscale PNG encoder/decoder
  (``encode_png``/``decode_png``) with all five PNG scanline filters,
  so real image decode is oracle-provable in containers without
  Pillow — the image sibling of mm3's stdlib-``wave`` audio path.
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
                     id_col: str = "doc_id", codec: str = "raw") -> DataFrame:
    """Deterministic media table from any text corpus: blob = utf-8
    bytes, kind round-robins image/audio/video, meta derived from the
    blob length. Pure column ops — used by tests and the oracle-checked
    manifest/frame-sample queries.

    ``codec="png"`` additionally REAL-encodes each image-kind row's
    bytes as an 8-bit grayscale PNG (``encode_png``) of shape
    (n_bytes // width, width) — tail bytes past the last full row are
    dropped, meta.height/format updated — via Arrow-batched
    ``mapInPandas``, so the encode runs distributed on executors."""
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
    out = df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("data"),
        meta.alias("meta"),
    )
    if codec == "raw":
        return out
    if codec != "png":
        raise ValueError(f"synthesize_media codec must be raw|png, got {codec!r}")

    def png_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            for i in pdf.index:
                if pdf.at[i, "kind"] != "image":
                    continue
                raw = np.frombuffer(bytes(pdf.at[i, "data"]), dtype=np.uint8)
                m = dict(pdf.at[i, "meta"])
                w = int(m["width"])
                h = len(raw) // w
                pdf.at[i, "data"] = bytearray(
                    encode_png(raw[: h * w].reshape(h, w))
                )
                m["height"], m["format"] = h, "png"
                pdf.at[i, "meta"] = m
            yield pdf

    return out.mapInPandas(png_batches, MEDIA_SCHEMA)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor (RFC 2083 §6.6), vectorized: pick whichever
    of left/up/up-left is closest to a + b - c, ties in that order."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as an 8-bit grayscale PNG (stdlib
    only). Scanline filter types cycle 0..4 by row — None/Sub/Up/
    Average/Paeth — so any consumer must implement real unfiltering,
    not just strip a zero byte; filters are computed per the PNG spec
    from the raw (reconstructed) neighbor bytes."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"encode_png wants a 2-D grayscale array, got {a.shape}")
    h, w = a.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    lines = []
    prev = np.zeros(w, dtype=np.int32)
    for i in range(h):
        row = a[i].astype(np.int32)
        left = np.concatenate(([0], row[:-1]))
        up_left = np.concatenate(([0], prev[:-1]))
        ft = i % 5
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = (row - left) % 256
        elif ft == 2:
            filt = (row - prev) % 256
        elif ft == 3:
            filt = (row - (left + prev) // 2) % 256
        else:
            filt = (row - _paeth(left, prev, up_left)) % 256
        lines.append(bytes([ft]) + filt.astype(np.uint8).tobytes())
        prev = row
    idat = zlib.compress(b"".join(lines))
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def decode_png(blob: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale non-interlaced PNG to a (h, w) uint8
    array (stdlib only): chunk walk with CRC verification, IDAT
    concatenation + zlib inflate, and full five-filter scanline
    reconstruction. Sub/Average/Paeth rows reconstruct left-to-right
    (the spec's left-neighbor dependency is inherently sequential);
    None/Up rows are vectorized."""
    import struct
    import zlib

    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    i, n = 8, len(blob)
    idat = bytearray()
    w = h = None
    while i + 12 <= n:
        ln = int.from_bytes(blob[i : i + 4], "big")
        tag = blob[i + 4 : i + 8]
        payload = blob[i + 8 : i + 8 + ln]
        crc = int.from_bytes(blob[i + 8 + ln : i + 12 + ln], "big")
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color != 0 or interlace != 0:
                raise NotImplementedError(
                    "decode_png supports 8-bit grayscale non-interlaced only "
                    f"(got depth={depth} color={color} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w + 1
    if len(raw) != h * stride:
        raise ValueError(f"PNG data length {len(raw)} != {h}x{stride}")
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        ft = line[0]
        cur = np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
        if ft == 0:
            rec = cur
        elif ft == 2:
            rec = (cur + prev) % 256
        elif ft in (1, 3, 4):
            rec = np.zeros(w, dtype=np.int32)
            for x in range(w):
                a = int(rec[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                if ft == 1:
                    rec[x] = (cur[x] + a) % 256
                elif ft == 3:
                    rec[x] = (cur[x] + (a + b) // 2) % 256
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = rec.astype(np.uint8)
        prev = rec
    return out


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

    codec="png" decodes image-kind blobs with the stdlib PNG decoder
    (``decode_png`` — zlib inflate + five-filter reconstruction, no
    Pillow), normalizing to [0,1] like the Pillow path; non-image rows
    are dropped. This is the dependency-free REAL image path, provable
    in-container (mm4_image_roundtrip).

    codec="fake" (deterministic uint8 reinterpretation) exercises the
    identical Spark plumbing with no codec dependency."""
    if codec == "png":
        df = df.filter(F.col("kind") == "image")

        def png_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            out_cols = [f.name for f in DECODED_SCHEMA]
            for pdf in it:
                out = []
                for r in pdf.itertuples(index=False):
                    arr = decode_png(bytes(r.data))
                    out.append(
                        {
                            "media_id": r.media_id,
                            "kind": r.kind,
                            "pixels": (arr.astype(np.float64) / 255.0)
                            .ravel()
                            .tolist(),
                            "shape": list(arr.shape),
                        }
                    )
                yield pd.DataFrame(out, columns=out_cols)

        return df.mapInPandas(png_batches, DECODED_SCHEMA)

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


# --- RIFF/AVI container (stdlib struct walk) ----------------------------------

def encode_avi(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal structurally-valid RIFF/AVI container around raw
    grayscale frames (the video sibling of ``encode_png``/stdlib wave
    for mm3/mm4): RIFF('AVI ') → LIST('hdrl') holding a spec-shaped
    56-byte ``avih`` (real dims + frame count) → LIST('movi') holding
    one ``00db`` (uncompressed DIB) chunk per frame, word-aligned as
    RIFF requires. No codec — the point is the CONTAINER: chunk
    framing, nesting, alignment, and header fields all round-trip
    through ``parse_avi``."""
    import struct

    def chunk(tag: bytes, payload: bytes) -> bytes:
        out = tag + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            out += b"\x00"  # RIFF word alignment
        return out

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,      # dwMicroSecPerFrame
        width * height * fps,  # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0,                     # dwFlags — no idx1 chunk is written, so
                               # AVIF_HASINDEX (0x10) MUST be clear; we set no
                               # interleave hint (AVIF_ISINTERLEAVED=0x100) either
        len(frames),           # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        width * height,        # dwSuggestedBufferSize
        width,                 # dwWidth
        height,                # dwHeight
        0, 0, 0, 0,            # dwReserved[4]
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(
        b"LIST", b"movi" + b"".join(chunk(b"00db", f) for f in frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(blob: bytes) -> tuple[dict, list[bytes]]:
    """Walk a RIFF/AVI container: verify the RIFF signature and 'AVI '
    form type, descend into LIST chunks (explicit stack, depth-safe
    against adversarially nested lists) honoring word alignment,
    read (width, height, n_frames) from ``avih``, and collect every
    ``00db``/``00dc`` payload in stream order. Raises on truncated or
    mis-framed chunks — corrupt containers must fail loudly, not yield
    silent partial frames."""
    import struct

    if blob[:4] != b"RIFF":
        raise ValueError("not RIFF")
    (riff_len,) = struct.unpack("<I", blob[4:8])
    if riff_len + 8 != len(blob):
        raise ValueError(f"RIFF length {riff_len} != payload {len(blob) - 8}")
    if blob[8:12] != b"AVI ":
        raise ValueError("RIFF form type is not 'AVI '")
    meta: dict = {}
    frames: list[bytes] = []

    # Explicit work stack, NOT recursion: an adversarial blob of deeply
    # nested 8-byte LIST chunks must fail with ValueError (via the
    # truncation / framing checks), never RecursionError. Each stack
    # entry is one chunk sequence still to scan.
    # On LIST we descend immediately (data ← list body) after pushing
    # the REMAINDER of the current level, so traversal order is
    # identical to the recursive form — frames inside nested 'rec '
    # lists still land in stream order.
    stack: list[bytes] = []
    data = blob[12:]
    i = 0
    while True:
        if i >= len(data):
            if not stack:
                break
            data, i = stack.pop(), 0
            continue
        if i + 8 > len(data):
            # sub-header trailing bytes inside a chunk body: the
            # container is mis-framed — fail loudly, don't ignore.
            raise ValueError(
                f"{len(data) - i} trailing bytes shorter than a chunk header"
            )
        tag = data[i : i + 8][:4]
        (ln,) = struct.unpack("<I", data[i + 4 : i + 8])
        payload = data[i + 8 : i + 8 + ln]
        if len(payload) != ln:
            raise ValueError(f"truncated chunk {tag!r}")
        if tag == b"LIST":
            if ln < 4:
                raise ValueError("LIST chunk shorter than its form type")
            stack.append(data[i + 8 + ln + (ln % 2) :])
            data, i = payload[4:], 0  # descend into the list body
            continue
        elif tag == b"avih":
            fields = struct.unpack("<14I", payload[:56])
            meta.update(
                n_frames=fields[4], width=fields[8], height=fields[9]
            )
        elif tag in (b"00db", b"00dc"):
            frames.append(payload)
        i += 8 + ln + (ln % 2)
    if meta.get("n_frames") != len(frames):
        raise ValueError(
            f"header frame count {meta.get('n_frames')} != "
            f"{len(frames)} movi chunks"
        )
    return meta, frames


def decode_avi_frames(df: DataFrame) -> DataFrame:
    """Arrow-batched container decode: one output row per frame with
    the header dims and the frame's pixels normalized to [0, 1]. The
    per-frame explode happens Python-side (frames are already in
    memory per blob); every downstream statistic stays JVM-side."""
    import pyarrow  # noqa: F401 — document the Arrow path

    out_schema = (
        "media_id long, width int, height int, frame_idx int, "
        "pixels array<double>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                meta, frames = parse_avi(bytes(r["data"]))
                for k, f in enumerate(frames):
                    rows.append(
                        {
                            "media_id": int(r["media_id"]),
                            "width": meta["width"],
                            "height": meta["height"],
                            "frame_idx": k,
                            "pixels": (
                                np.frombuffer(f, dtype=np.uint8).astype(
                                    np.float64
                                )
                                / 255.0
                            ),
                        }
                    )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {
                    "media_id": pd.Series([], dtype="int64"),
                    "width": pd.Series([], dtype="int32"),
                    "height": pd.Series([], dtype="int32"),
                    "frame_idx": pd.Series([], dtype="int32"),
                    "pixels": pd.Series([], dtype="object"),
                }
            )

    return df.mapInPandas(batches, out_schema)
