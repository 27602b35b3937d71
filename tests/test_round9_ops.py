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

from procurement_system_bigdata_spark.operators import codecs


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
