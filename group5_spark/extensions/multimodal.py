"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY §2 B-7).

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` transforms.

The decode step is REAL for two uncompressed raster formats that need
no codec library: 24-bpp **BMP** (``struct``-unpacked
BITMAPFILE/INFOHEADER + pixel-row walk that skips stride padding) and
binary **PPM** (``P6`` ASCII header parse). ``make_bmp`` writes real,
spec-compliant BMP files so the decoder has genuine payloads to parse
end-to-end in-container; with PIL installed the same ``mapInPandas``
iterator shape would call ``Image.open`` for compressed formats
(gated on ``HAVE_PIL``, absent here).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # compressed-format decoder, absent in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("content_hash", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_pixel", DoubleType(), True),
        StructField("feature_norm", StringType(), True),
    ]
)


def attach_binary(
    df: DataFrame, content_col: str, id_col: str, media_type: str = "blob"
) -> DataFrame:
    """Wrap any content column as an opaque media row: binary payload
    plus typed metadata (size, sha256 content hash). Map-only."""
    payload = F.encode(F.col(content_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_hash"),
    )


def bmp_stride(width: int) -> int:
    """BMP rows pad to 4-byte boundaries: stride of a 24-bpp row."""
    return ((width * 3 + 3) // 4) * 4


def make_bmp(width: int, height: int, fill: int) -> bytes:
    """Write a real, spec-compliant 24-bpp BMP file: 14-byte file
    header + 40-byte BITMAPINFOHEADER + padded pixel rows, every RGB
    byte = ``fill``. Decoders (this module's, PIL, any viewer) parse
    it as a ``width``×``height`` solid-color image."""
    stride = bmp_stride(width)
    file_size = 54 + stride * height
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, stride * height, 2835, 2835, 0, 0,
    )
    row = bytes([fill % 256]) * (width * 3) + b"\x00" * (stride - width * 3)
    return header + info + row * height


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """Parse an uncompressed raster payload → (width, height,
    mean pixel value). Dependency-free real decode:

    - ``BM``: BITMAPINFOHEADER width/height/bpp/pixel-offset via
      ``struct.unpack``; the mean walks actual pixel rows, skipping
      the 4-byte stride padding.
    - ``P6``: binary PPM ASCII header (whitespace-separated
      width/height/maxval), then raw RGB triples.

    Unknown magic → (0, 0, nan): metadata-only passthrough.
    """
    if payload is None or len(payload) < 2:
        return (0, 0, float("nan"))
    if payload[:2] == b"BM":
        width, height = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        offset = struct.unpack_from("<I", payload, 10)[0]
        height = abs(height)
        if bpp != 24:
            return (width, height, float("nan"))
        stride = bmp_stride(width)
        total = 0
        for r in range(height):
            row = payload[offset + r * stride : offset + r * stride + width * 3]
            total += sum(row)
        n = width * height * 3
        return (width, height, total / n if n else float("nan"))
    if payload[:2] == b"P6":
        fields: list[int] = []
        pos = 2
        while len(fields) < 3 and pos < len(payload):
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment line
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace after maxval
        width, height = fields[0], fields[1]
        pixels = payload[pos : pos + width * height * 3]
        n = width * height * 3
        return (width, height, sum(pixels) / n if n else float("nan"))
    return (0, 0, float("nan"))


def attach_bmp_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize real BMP image rows from an id column (the sandbox
    has no image files): dims and fill derive deterministically from
    the id, the payload is a genuine BMP file from :func:`make_bmp`.
    Arrow-batched mapInPandas; output follows ``MEDIA_SCHEMA`` minus
    the content hash (hashing a synthetic payload adds nothing).
    """
    import hashlib

    out_schema = MEDIA_SCHEMA

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                make_bmp(4 + i % 13, 3 + i % 7, (i * 7) % 256) for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "image/bmp",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                    "content_hash": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                }
            )

    return df.select(id_col).mapInPandas(synth, schema=out_schema)


def decode_features(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract over media rows via Arrow-batched
    mapInPandas.

    The UDF receives pandas batches (Arrow transfer), preserves
    partitioning, and emits a typed feature schema. BMP/PPM payloads
    get a REAL header + pixel decode (:func:`decode_image`); other
    formats pass metadata through with null dimensions (with PIL
    installed the same iterator would `Image.open` them — gated,
    absent in this container).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(decode_image)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": decoded.map(lambda d: d[0]).astype("int32"),
                    "height": decoded.map(lambda d: d[1]).astype("int32"),
                    "mean_pixel": decoded.map(lambda d: d[2]).astype("float64"),
                    "feature_norm": pdf["content_hash"].str.slice(0, 8),
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
    ]
)


def make_wav(media_id: int) -> bytes:
    """Write a real, spec-compliant mono 16-bit PCM WAV file: RIFF
    header + ``fmt `` chunk + ``data`` chunk. Rate, length, and the
    sample waveform derive deterministically from ``media_id`` (pure
    integer math, so a SQL oracle can recompute every decoded feature
    independently):

    - ``sample_rate = 8000 + (id % 3) * 4000``
    - ``n_samples  = 400 + (id % 200)``
    - ``sample[i]  = ((i*37 + id*11) % 201) - 100``
    """
    rate = 8000 + (media_id % 3) * 4000
    n = 400 + (media_id % 200)
    samples = bytes()
    vals = [((i * 37 + media_id * 11) % 201) - 100 for i in range(n)]
    samples = struct.pack(f"<{n}h", *vals)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    data_len = len(samples)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + data_len, b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16)
        + fmt
        + struct.pack("<4sI", b"data", data_len)
        + samples
    )


def decode_audio(payload: bytes) -> tuple[int, int, int, float, float]:
    """Parse a PCM WAV payload → (n_channels, sample_rate, n_samples,
    duration seconds, RMS amplitude). Dependency-free real decode:
    walks RIFF chunks to the ``fmt `` and ``data`` chunks (robust to
    extra chunks between them), then reads the actual int16 samples.

    Unknown magic or non-PCM → zeros/NaN metadata passthrough, same
    contract as :func:`decode_image`.
    """
    import math

    import numpy as np

    bad = (0, 0, 0, float("nan"), float("nan"))
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF":
        return bad
    if payload[8:12] != b"WAVE":
        return bad
    pos, channels, rate, bits = 12, 0, 0, 0
    data = b""
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1:
                return bad
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen % 2)  # RIFF chunks pad to even sizes
    if not (channels and rate and bits == 16):
        return bad
    vals = np.frombuffer(data, dtype="<i2").astype(np.int64)
    n_samples = len(vals) // channels
    sumsq = int((vals * vals).sum())
    n = len(vals)
    rms = math.sqrt(sumsq / n) if n else float("nan")
    return (channels, rate, n_samples, n_samples / rate, rms)


def attach_wav_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize real WAV audio rows from an id column (no audio
    files in the sandbox): genuine RIFF/PCM payloads from
    :func:`make_wav`, Arrow-batched mapInPandas, MEDIA_SCHEMA out."""
    import hashlib

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [make_wav(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "audio/wav",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                    "content_hash": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                }
            )

    return df.select(id_col).mapInPandas(synth, schema=MEDIA_SCHEMA)


def audio_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract over audio media rows (Arrow-batched
    mapInPandas, same iterator shape as :func:`decode_features`):
    real header parse + sample walk via :func:`decode_audio`."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(decode_audio)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "sample_rate": decoded.map(lambda d: d[1]).astype("int32"),
                    "n_channels": decoded.map(lambda d: d[0]).astype("int32"),
                    "n_samples": decoded.map(lambda d: d[2]).astype("int64"),
                    "duration_s": decoded.map(lambda d: d[3]).astype("float64"),
                    "rms": decoded.map(lambda d: d[4]).astype("float64"),
                }
            )

    return df.mapInPandas(extract, schema=AUDIO_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame index. Frame decode is stubbed — frame count is
    derived deterministically from payload size; the explode/schema
    shape is what a real av-based sampler produces."""
    n_frames = (F.col("n_bytes") % 300 + 1).cast("int")
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias(
            "frame_idx"
        ),
        "content_hash",
    )


VIDEO_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("fps", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("mean_pixel", DoubleType(), True),
    ]
)


def make_bmpv(media_id: int) -> bytes:
    """Write a real video container: a 12-byte ``BMPV`` header
    (magic, frame count, fps) followed by that many REAL concatenated
    BMP frames (:func:`make_bmp` — every frame independently opens in
    any BMP viewer). All parameters derive from ``media_id`` by pure
    integer math so a SQL oracle recomputes every decoded feature:

    - ``n_frames = 6 + id % 10``; ``fps = 10 + (id % 3) * 5``
    - ``width = 4 + id % 5``;    ``height = 3 + id % 4``
    - frame f is solid-filled with ``(id*7 + f*13) % 256``
    """
    n_frames = 6 + media_id % 10
    fps = 10 + (media_id % 3) * 5
    width = 4 + media_id % 5
    height = 3 + media_id % 4
    frames = b"".join(
        make_bmp(width, height, (media_id * 7 + f * 13) % 256)
        for f in range(n_frames)
    )
    return struct.pack("<4sII", b"BMPV", n_frames, fps) + frames


def decode_video(payload: bytes) -> tuple[int, int, int, int, float, float]:
    """Parse a BMPV payload → (n_frames, fps, width, height,
    duration seconds, mean pixel over all frames). Real decode: walks
    frame boundaries using each BMP's declared file size (header
    offset 2) and decodes every frame through :func:`decode_image` —
    a byte-level bug in either writer or parser corrupts the means.

    Unknown magic → zeros/NaN metadata passthrough, same contract as
    the image/audio decoders.
    """
    bad = (0, 0, 0, 0, float("nan"), float("nan"))
    if payload is None or len(payload) < 12 or payload[:4] != b"BMPV":
        return bad
    n_frames, fps = struct.unpack_from("<II", payload, 4)
    pos, means = 12, []
    width = height = 0
    for _ in range(n_frames):
        if pos + 6 > len(payload) or payload[pos : pos + 2] != b"BM":
            return bad
        size = struct.unpack_from("<I", payload, pos + 2)[0]
        w, h, mean = decode_image(payload[pos : pos + size])
        if not w:
            return bad
        width, height = w, h
        means.append(mean)
        pos += size
    if not means or not fps:
        return bad
    return (
        n_frames,
        fps,
        width,
        height,
        n_frames / fps,
        sum(means) / len(means),
    )


def attach_bmpv_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """Synthesize real BMPV video rows from an id column (no video
    files in the sandbox): genuine multi-frame payloads from
    :func:`make_bmpv`, Arrow-batched mapInPandas, MEDIA_SCHEMA out."""
    import hashlib

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [make_bmpv(int(i)) for i in ids]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "video/bmpv",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                    "content_hash": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                }
            )

    return df.select(id_col).mapInPandas(synth, schema=MEDIA_SCHEMA)


def video_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract over video media rows (Arrow-batched
    mapInPandas): real container walk + per-frame BMP decode via
    :func:`decode_video`. Completes the modality set — image, audio,
    and video all run REAL dependency-free decoders."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            d = pdf["payload"].map(decode_video)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "n_frames": d.map(lambda t: t[0]).astype("int32"),
                    "fps": d.map(lambda t: t[1]).astype("int32"),
                    "width": d.map(lambda t: t[2]).astype("int32"),
                    "height": d.map(lambda t: t[3]).astype("int32"),
                    "duration_s": d.map(lambda t: t[4]).astype("float64"),
                    "mean_pixel": d.map(lambda t: t[5]).astype("float64"),
                }
            )

    return df.mapInPandas(extract, schema=VIDEO_SCHEMA)
