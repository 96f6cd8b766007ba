"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY §2 B-7).

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` transforms. The codec libraries
(PIL/av/librosa) are not in this container, so the decode step is
STUBBED: a clearly-marked deterministic fake stands in, and the real
import is gated — the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoder, absent in this container
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


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image decode: derive (width, height)
    from payload bytes. STUB — replace with PIL decode when available."""
    if payload is None:
        return (0, 0)
    w = 64 + (len(payload) % 64)
    h = 64 + (sum(payload[:16]) % 64 if payload else 0)
    return (w, h)


def decode_features(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract over media rows via Arrow-batched
    mapInPandas.

    Real plumbing: the UDF receives pandas batches (Arrow transfer),
    preserves partitioning, and emits a typed feature schema. The
    pixel-level decode itself is stubbed (`_fake_decode`) because no
    codec libs exist in this container; with PIL installed the same
    iterator shape does `Image.open(io.BytesIO(p))`.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if HAVE_PIL:
                raise NotImplementedError(
                    "real decoder path not wired in this container"
                )
            dims = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "feature_norm": pdf["content_hash"].str.slice(0, 8),
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


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
