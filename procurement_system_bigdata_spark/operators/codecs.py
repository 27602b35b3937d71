"""Dependency-free media codecs for the multimodal stages.

PIL / ffmpeg are not in this container, but uncompressed formats need
neither: P6 PPM and 24-bit BMP images parse with struct + numpy, and PCM
WAV parses with the stdlib ``wave`` module.  These are REAL decoders — the
multimodal stages decode, resize (nearest-neighbor), and feature-extract
actual pixels/samples for these formats; compressed formats (JPEG/PNG/MP4)
remain honestly gated behind ``UnsupportedMediaError`` with the production
swap point documented (PIL.Image.open / ffmpeg).

Everything here is deterministic pure-Python/numpy: safe inside Arrow
mapInPandas workers, no native libs, no RNG.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


class UnsupportedMediaError(NotImplementedError):
    """Raised for formats that need external codecs (JPEG/PNG/MP4/...) AND
    for corrupt/truncated payloads of supported formats.

    Production deployments register PIL / ffmpeg decoders at this exact
    seam; the Spark-side plumbing is identical for all formats.  Folding
    corruption into the same error type is deliberate: the multimodal
    stages' dead-letter contract is "undecodable row -> dropped", and a
    truncated PPM must not crash an executor task where a JPEG would be
    skipped."""


def _corrupt_guard(fn):
    """Convert the parse-failure zoo (short buffers -> ValueError /
    struct.error, stdlib wave -> EOFError, bad reshape -> ValueError) into
    UnsupportedMediaError so decoders have ONE failure type."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except UnsupportedMediaError:
            raise
        except (ValueError, struct.error, EOFError, IndexError) as e:
            raise UnsupportedMediaError(
                f"corrupt {fn.__name__} payload: {type(e).__name__}: {e}"
            ) from e

    return wrapped


# ---------------------------------------------------------------------------
# Images
# ---------------------------------------------------------------------------


def sniff_media_type(content: bytes) -> str:
    head = bytes(content[:8])
    if head[:2] == b"P6":
        return "image/x-portable-pixmap"
    if head[:2] == b"BM":
        return "image/bmp"
    if head[:3] == b"\xff\xd8\xff":
        return "image/jpeg"
    if head[:8] == b"\x89PNG\r\n\x1a\n":
        return "image/png"
    if head[:4] == b"RIFF" and bytes(content[8:12]) == b"WAVE":
        return "audio/wav"
    if head[:4] == b"RAWV":
        return "video/x-rawv"
    return "application/octet-stream"


@_corrupt_guard
def decode_ppm(content: bytes) -> np.ndarray:
    """P6 binary PPM -> (h, w, 3) uint8 array.  Handles comments and
    arbitrary whitespace in the header, maxval must be 255."""
    buf = bytes(content)
    if buf[:2] != b"P6":
        raise UnsupportedMediaError("not a P6 PPM payload")
    # tokenize header: P6 <width> <height> <maxval>, '#' comments to EOL
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        tokens.append(buf[start:pos])
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise UnsupportedMediaError("only maxval=255 PPMs supported")
    pos += 1  # single whitespace after maxval
    pixels = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
    return pixels.reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> P6 PPM bytes (the canonical re-encode format for
    the resize stage: header + raw pixels, bit-deterministic)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


@_corrupt_guard
def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> (h, w, 3) uint8 RGB.

    BMP stores BGR rows bottom-up, padded to 4-byte boundaries — both are
    undone here."""
    buf = bytes(content)
    if buf[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", buf, 10)
    header_size, w, h = struct.unpack_from("<Iii", buf, 14)
    if header_size < 40:
        raise UnsupportedMediaError("BITMAPCOREHEADER BMPs not supported")
    planes, bitcount, compression = struct.unpack_from("<HHI", buf, 26)
    if bitcount != 24 or compression != 0:
        raise UnsupportedMediaError(
            f"only uncompressed 24-bit BMPs supported (got {bitcount}-bit, "
            f"compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=row_bytes * h, offset=data_offset
    ).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def decode_image(content: bytes) -> np.ndarray:
    """Decode a supported image payload to (h, w, 3) uint8 RGB.

    Real decode for PPM/BMP; JPEG/PNG raise ``UnsupportedMediaError`` (the
    PIL swap point — reference has no media pipeline at all; this is the
    training-data extension surface)."""
    kind = sniff_media_type(content)
    if kind == "image/x-portable-pixmap":
        return decode_ppm(content)
    if kind == "image/bmp":
        return decode_bmp(content)
    raise UnsupportedMediaError(
        f"{kind}: compressed formats need PIL/libjpeg — register the codec "
        "at this seam in production"
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample to (height, width, 3) —
    index math only, bit-reproducible on any platform (unlike interpolating
    resamplers whose float rounding varies by implementation)."""
    h_in, w_in = arr.shape[:2]
    yy = (np.arange(height) * h_in) // height
    xx = (np.arange(width) * w_in) // width
    return arr[yy][:, xx]


# ---------------------------------------------------------------------------
# Audio
# ---------------------------------------------------------------------------


@_corrupt_guard
def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (samples float64 in [-1, 1] mono-mixed, sample_rate).

    8/16/32-bit integer PCM via stdlib ``wave``; float/compressed WAVs raise
    (ffmpeg swap point)."""
    try:
        with wave.open(io.BytesIO(bytes(content))) as f:
            rate = f.getframerate()
            n_ch = f.getnchannels()
            width = f.getsampwidth()
            raw = f.readframes(f.getnframes())
    except wave.Error as e:
        raise UnsupportedMediaError(f"not a PCM WAV: {e}") from e
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise UnsupportedMediaError(f"{width * 8}-bit PCM not supported")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Mono float64 [-1, 1] -> 16-bit PCM WAV bytes (for tests/fixtures)."""
    pcm = np.clip(np.asarray(samples) * 32767.0, -32768, 32767).astype("<i2")
    out = io.BytesIO()
    with wave.open(out, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return out.getvalue()


# ---------------------------------------------------------------------------
# Deterministic synthetic payloads (stand-ins for the absent media corpus,
# with REAL decodable pixels/samples)
# ---------------------------------------------------------------------------


def synthesize_image(media_id: int, width: int = 32, height: int = 24) -> bytes:
    """Deterministic P6 PPM test image: a gradient seeded by media_id."""
    y, x = np.mgrid[0:height, 0:width]
    r = ((x * 255) // max(width - 1, 1)).astype(np.uint8)
    g = ((y * 255) // max(height - 1, 1)).astype(np.uint8)
    b = np.full((height, width), (media_id * 37) % 256, dtype=np.uint8)
    return encode_ppm(np.stack([r, g, b], axis=-1))


# Synthesis contract for the WAV test clips — the audit oracle
# (multimodal.audio_features_audit) checks decoded features against these
# closed forms, so they are named constants rather than inline literals.
TONE_FREQ_BASE = 100.0
TONE_FREQ_STEP = 25.0
TONE_FREQ_MOD = 32
TONE_AMP = 0.5


def tone_freq(media_id: int) -> float:
    """The pure-tone frequency synthesize_wav assigns to ``media_id``."""
    return TONE_FREQ_BASE + (media_id % TONE_FREQ_MOD) * TONE_FREQ_STEP


def synthesize_wav(media_id: int, rate: int = 8000, n: int = 1600) -> bytes:
    """Deterministic PCM WAV test clip: a pure tone whose frequency is
    seeded by media_id (0.2s at 8kHz)."""
    t = np.arange(n, dtype=np.float64) / rate
    return encode_wav(TONE_AMP * np.sin(2 * np.pi * tone_freq(media_id) * t), rate)


# ---------------------------------------------------------------------------
# RAWV: a minimal real video container (uncompressed RGB frames)
# ---------------------------------------------------------------------------
# Layout: b"RAWV" | uint16 width | uint16 height | uint32 n_frames |
# n_frames contiguous (h, w, 3) uint8 RGB frames.  Deliberately trivial —
# the point is that frame sampling PARSES A REAL CONTAINER (header, frame
# geometry, offsets) rather than slicing arbitrary bytes; compressed video
# (MP4/H.264) stays gated at the ffmpeg seam like JPEG does for images.


def encode_rawv(frames: list[np.ndarray]) -> bytes:
    h, w = frames[0].shape[:2]
    out = [b"RAWV", struct.pack("<HHI", w, h, len(frames))]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all RAWV frames must share one geometry")
        out.append(np.ascontiguousarray(f, dtype=np.uint8).tobytes())
    return b"".join(out)


@_corrupt_guard
def decode_rawv(content: bytes) -> tuple[int, int, int]:
    """Header only -> (width, height, n_frames); validates payload length."""
    buf = bytes(content)
    if buf[:4] != b"RAWV":
        raise UnsupportedMediaError(
            "not a RAWV payload — compressed video needs ffmpeg at this seam"
        )
    w, h, n = struct.unpack_from("<HHI", buf, 4)
    if len(buf) != 12 + w * h * 3 * n:
        raise UnsupportedMediaError("truncated RAWV payload")
    return w, h, n


def rawv_frame(content: bytes, idx: int) -> np.ndarray:
    """Random access to frame ``idx`` without materializing the rest —
    the property a frame SAMPLER needs (decode k of n frames, not all n).

    Deliberately NOT wrapped in _corrupt_guard: parse failures surface as
    UnsupportedMediaError from the guarded decode_rawv, but an out-of-range
    ``idx`` is a CALLER bug and raises IndexError unguarded — classifying
    it as a corrupt payload would silently dead-letter the row instead of
    surfacing the indexing error."""
    w, h, n = decode_rawv(content)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} of {n}")
    off = 12 + w * h * 3 * idx
    return (
        np.frombuffer(bytes(content), dtype=np.uint8, count=w * h * 3, offset=off)
        .reshape(h, w, 3)
    )


def synthesize_video(
    media_id: int, width: int = 16, height: int = 12, n_frames: int = 12
) -> bytes:
    """Deterministic RAWV clip: the per-id gradient image, brightness-shifted
    per frame (so every frame is distinct and index-identifiable)."""
    base = decode_ppm(synthesize_image(media_id, width, height))
    frames = [((base.astype(np.uint16) + 7 * k) % 256).astype(np.uint8) for k in range(n_frames)]
    return encode_rawv(frames)
