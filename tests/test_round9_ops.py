"""Round-9 tests: codec hardening (advisor findings), 4:2:0 JPEG decode,
star-edge dedup clusters, and the media-family plan pins.

Advisor findings closed here:
- zlib.error escaped _corrupt_guard: PNG chunk CRCs are over raw chunk
  bytes, so a payload with valid CRCs and an invalid IDAT zlib stream
  crashed the Spark task instead of dead-lettering.
- No resource bounds: a 60000x60000 SOF/IHDR header requested ~86 GB
  before any sanity check; a small zlib bomb expanded ~1000:1.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from conftest import SF_DIR, assert_matches_oracle

from pyspark.sql import functions as F

from procurement_system_bigdata_spark.catalog import load_table
from procurement_system_bigdata_spark.operators import codecs, multimodal


def _png_with_chunks(chunks: list[tuple[bytes, bytes]]) -> bytes:
    """Assemble a PNG from (tag, data) chunks with VALID CRCs."""
    out = [b"\x89PNG\r\n\x1a\n"]
    for tag, data in chunks:
        out.append(
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )
    return b"".join(out)


def test_png_valid_crc_invalid_zlib_stream_dead_letters():
    """CRC is computed over raw chunk bytes, so a garbage IDAT passes
    every CRC check yet is not a zlib stream — must raise
    UnsupportedMediaError, not zlib.error (advisor repro)."""
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    bad = _png_with_chunks(
        [(b"IHDR", ihdr), (b"IDAT", b"\x99not-a-zlib-stream"), (b"IEND", b"")]
    )
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_png(bad)


def test_png_truncated_zlib_stream_inside_intact_chunk():
    """Stream-level truncation INSIDE a CRC-intact chunk (re-CRC'd after
    cutting the stream) is the other advisor-named shape."""
    img = codecs.decode_ppm(codecs.synthesize_image(3))
    good = codecs.encode_png(img)
    # extract the IDAT payload, truncate the zlib stream, re-wrap with a
    # fresh (valid) CRC
    pos = 8
    chunks = []
    while pos + 8 <= len(good):
        (length,) = struct.unpack_from(">I", good, pos)
        tag = good[pos + 4 : pos + 8]
        data = good[pos + 8 : pos + 8 + length]
        if tag == b"IDAT":
            data = data[: len(data) // 2]
        chunks.append((tag, data))
        pos += 12 + length
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_png(_png_with_chunks(chunks))


def test_png_zlib_bomb_bounded():
    """An IDAT that inflates to far more than the declared pixel buffer
    must be rejected WITHOUT materializing the expansion (decompressobj
    max_length bound)."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # expects 26 bytes
    bomb = zlib.compress(b"\x00" * 10_000_000, 9)  # ~10k bytes -> 10 MB
    assert len(bomb) < 20_000
    payload = _png_with_chunks([(b"IHDR", ihdr), (b"IDAT", bomb), (b"IEND", b"")])
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_png(payload)


def test_png_oversized_header_rejected_before_alloc():
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    payload = _png_with_chunks(
        [(b"IHDR", ihdr), (b"IDAT", zlib.compress(b"\x00" * 16)), (b"IEND", b"")]
    )
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_png(payload)


def test_jpeg_oversized_sof_rejected_before_alloc():
    """A 60000x60000 SOF would request ~86 GB of planes (advisor repro);
    the dimension ceiling must fire at header-parse time."""

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    sof = struct.pack(">BHHB", 8, 60000, 60000, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    payload = struct.pack(">H", 0xFFD8) + seg(0xFFC0, sof)
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.decode_jpeg(payload)


def test_corrupt_guard_converts_memoryerror():
    @codecs._corrupt_guard
    def boom():
        raise MemoryError("np.zeros on a constrained worker")

    with pytest.raises(codecs.UnsupportedMediaError):
        boom()


# --- star-edge dedup clusters (round-9 judge ask #1) --------------------------


def _clusters(spark, ids_df, edges_df):
    from procurement_system_bigdata_spark.operators import clustering

    return (
        clustering.dedup_clusters(ids_df, edges_df)
        .select("doc_id", "component", "cluster_size")
        .orderBy("doc_id")
        .collect()
    )


def test_image_star_edges_components_match_clique_graph(spark):
    """The star+bridge edge set must induce EXACTLY the components of the
    full confirmed-pair graph (the equivalence the docstring proves)."""
    docs = load_table(spark, SF_DIR, "documents").limit(150)
    media = multimodal.attach_pattern_images(docs).localCheckpoint()
    ids = media.select(F.col("media_id").alias("doc_id"))
    clique = multimodal.image_neardup_pairs(media).select(
        F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
    )
    star = multimodal.image_dedup_edges(media)
    assert _clusters(spark, ids, clique) == _clusters(spark, ids, star)


def test_image_star_edges_linear_in_duplicate_class(spark):
    """A planted class of n identical images must produce n-1 edges (one
    star per non-rep member, no bridges), where the clique pair listing
    produces C(n,2) — the 100-TB sharp edge the round-8 audit flagged."""
    n = 60
    docs = spark.range(n).select((F.col("id") * 256).alias("doc_id"))
    media = multimodal.attach_pattern_images(docs).localCheckpoint()
    assert multimodal.image_dedup_edges(media).count() == n - 1
    assert multimodal.image_neardup_pairs(media).count() == n * (n - 1) // 2


def test_audio_star_edges_components_match_clique_graph(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(150)
    media = multimodal.attach_fp_tones(docs).localCheckpoint()
    ids = media.select(F.col("media_id").alias("doc_id"))
    clique = multimodal.audio_neardup_pairs(media).select(
        F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
    )
    star = multimodal.audio_dedup_edges(media)
    assert _clusters(spark, ids, clique) == _clusters(spark, ids, star)


def test_audio_star_edges_linear_in_duplicate_class(spark):
    n = 60
    docs = spark.range(n).select((F.col("id") * 128).alias("doc_id"))
    media = multimodal.attach_fp_tones(docs).localCheckpoint()
    assert multimodal.audio_dedup_edges(media).count() == n - 1
    assert multimodal.audio_neardup_pairs(media).count() == n * (n - 1) // 2


def test_image_dedup_clusters_star_oracle_green(spark, duck):
    """q_image_dedup_clusters now rides the star-edge generator; the
    union-find oracle must stay green (bit-identical output contract)."""
    from procurement_system_bigdata_spark.queries import llmdata

    assert_matches_oracle(
        llmdata.q_image_dedup_clusters(spark, SF_DIR),
        duck,
        llmdata.Q_IMAGE_DEDUP_CLUSTERS_SQL,
    )


def test_audio_dedup_clusters_oracle_green(spark, duck):
    from procurement_system_bigdata_spark.queries import llmdata

    assert_matches_oracle(
        llmdata.q_audio_dedup_clusters(spark, SF_DIR),
        duck,
        llmdata.Q_AUDIO_DEDUP_CLUSTERS_SQL,
    )
