"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / resize / frame-sample are Arrow-batched
``mapInPandas`` stages.  The actual codecs (PIL / ffmpeg / torchaudio) are
NOT in this container, so the decode step is stubbed — clearly marked —
while everything Spark-side is real and tested: schema, partitioning, UDF
signature, Arrow batch shape.

Scale: mapInPandas streams Arrow record batches through one Python worker
per core — the transfer is columnar and zero-copy on the JVM side; payloads
stay out of the driver.  Repartition by a content-hash bucket before heavy
decode stages so stragglers (huge videos) spread evenly.
"""

from __future__ import annotations

import hashlib
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256_8", StringType()),
        StructField("byte_entropy_q", IntegerType()),
        StructField("head_hex", StringType()),
    ]
)


def decode_image(content: bytes) -> "object":
    """STUB: real image decode requires PIL/libjpeg, absent in this
    container.  The Spark plumbing around this function is real; swap this
    body for ``PIL.Image.open(io.BytesIO(content))`` in production."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "plug in PIL/ffmpeg here in production"
    )


def attach_binary_payloads(docs: DataFrame) -> DataFrame:
    """Stand-in media table: document text bytes as the opaque payload
    (deterministic fake for the absent image corpus), with the same schema
    a real media table would have."""
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
    )


def extract_features(media: DataFrame, bucket_partitions: int = 0) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Computes deterministic byte-level features (hash, size, a quantized
    entropy proxy, head bytes) — the stage where a production pipeline would
    call decode_image / frame-sample.  ``bucket_partitions`` > 0 spreads
    payloads by content-hash bucket first (straggler mitigation)."""
    if bucket_partitions:
        media = media.repartition(
            bucket_partitions, F.crc32(F.col("content")) % bucket_partitions
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "sha256_8": [
                        hashlib.sha256(b).hexdigest()[:8] for b in pdf["content"]
                    ],
                    "byte_entropy_q": [
                        # quantized distinct-byte proxy (deterministic fake
                        # for a real entropy / perceptual-hash feature)
                        len(set(b)) for b in pdf["content"]
                    ],
                    "head_hex": [bytes(b[:4]).hex() for b in pdf["content"]],
                }
            )
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Arrow-batched 1:1 resize stage (mapInPandas, same row count out).

    Production body: decode_image -> Image.resize((w, h)) -> re-encode.  The
    codec-free stand-in emits a deterministic fixed-size payload (truncate /
    zero-pad to w*h bytes) so batch shape, output schema and size accounting
    are all real and assertable.  Payloads never visit the driver."""
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [bytes(b[:target]).ljust(target, b"\0") for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "content": resized,
                    "n_bytes": [len(b) for b in resized],
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every_n: int = 4, max_frames: int = 8
) -> DataFrame:
    """Arrow-batched 1:N frame sampling (mapInPandas, MORE rows out than in —
    the explode-shaped batch contract a video pipeline needs).

    Production body: ffmpeg keyframe extraction every ``every_n`` frames.
    The stand-in treats the payload as a sequence of ``frame_bytes`` chunks
    and keeps every ``every_n``-th chunk up to ``max_frames`` — deterministic,
    so tests can assert exact frame counts and content.  Empty payloads
    yield ZERO rows (an un-decodable video has no frames), keeping the
    every-frame ``n_bytes > 0`` invariant."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                n_chunks = (len(b) + frame_bytes - 1) // frame_bytes
                for k, chunk_i in enumerate(range(0, n_chunks, every_n)):
                    if k >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(chunk_i)
                    frames.append(bytes(b[chunk_i * frame_bytes:(chunk_i + 1) * frame_bytes]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "n_bytes": [len(f) for f in frames],
                }
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
