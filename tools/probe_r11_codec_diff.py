"""Round-11 codec differential harness: byte/pixel-exact equivalence guard
for the codec-internals optimization (VERDICT r10 #6).

``snapshot`` mode records every codec path's encoded bytes + decoded pixels
for a deterministic id set to a pickle; ``check`` mode re-runs the same
paths on the CURRENT code and asserts bit-identity against the snapshot.
Run snapshot on the pre-optimization code, check after every codec edit.

Usage: python tools/probe_r11_codec_diff.py snapshot|check [path.pkl]
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from procurement_system_bigdata_spark.operators import codecs  # noqa: E402

IDS = list(range(24)) + [101, 255, 256, 1000, 4999]
W, H, Q = 32, 24, 90


def digest(x) -> str:
    if isinstance(x, np.ndarray):
        return hashlib.md5(
            repr((x.shape, str(x.dtype))).encode() + x.tobytes()
        ).hexdigest()
    if isinstance(x, bytes):
        return hashlib.md5(x).hexdigest()
    if isinstance(x, tuple):
        return "|".join(digest(v) if isinstance(v, (np.ndarray, bytes)) else repr(v) for v in x)
    return repr(x)


def corpus() -> dict[str, str]:
    out: dict[str, str] = {}
    for mid in IDS:
        arr = codecs.decode_ppm(codecs.synthesize_image(mid, W, H))
        for ss in ("444", "420", "422"):
            p = codecs.encode_jpeg(arr, Q, subsampling=ss)
            out[f"jpeg_{ss}_{mid}_bytes"] = digest(p)
            out[f"jpeg_{ss}_{mid}_px"] = digest(codecs.decode_jpeg(p))
            out[f"jpeg_{ss}_{mid}_px_fancy"] = digest(
                codecs.decode_jpeg(p, fancy_upsampling=True)
            )
            pp = codecs.encode_jpeg_progressive(arr, Q, subsampling=ss)
            out[f"prog_{ss}_{mid}_bytes"] = digest(pp)
            out[f"prog_{ss}_{mid}_px"] = digest(codecs.decode_jpeg(pp))
        prp = codecs.encode_jpeg_progressive(
            arr, Q, subsampling="420", restart_interval=1 + mid % 3
        )
        out[f"rstprog_{mid}_bytes"] = digest(prp)
        out[f"rstprog_{mid}_px"] = digest(codecs.decode_jpeg(prp))
        for pred in range(1, 8):
            pl = codecs.encode_jpeg_lossless(arr, pred)
            out[f"lossless_{pred}_{mid}_bytes"] = digest(pl)
            out[f"lossless_{pred}_{mid}_px"] = digest(codecs.decode_jpeg(pl))
        png = codecs.encode_png(arr)
        out[f"png_{mid}"] = digest(codecs.decode_png(png))
        pngi = codecs.encode_png(arr, interlaced=True)
        out[f"pngi_{mid}"] = digest(codecs.decode_png(pngi))
        v = codecs.synthesize_mjpeg_video(mid % 64)
        out[f"mp4_{mid}_meta"] = repr(sorted(codecs.parse_mp4(v).items()))[:2000]
        n = codecs.mp4_frame_count(mid % 64)
        for i in range(n):
            out[f"mp4_{mid}_f{i}"] = digest(codecs.mp4_frame(v, i))
        wav = codecs.synthesize_wav(mid)
        out[f"wav_{mid}"] = digest(codecs.decode_wav(wav))
        ct = codecs.synthesize_compressed_tone(mid)
        out[f"ctone_{mid}"] = digest(codecs.decode_wav(ct))
        out[f"zc_{mid}"] = repr(codecs.audio_zc_fingerprint(ct))
    # corrupt-payload behavior must be preserved too (dead-letter seam)
    for i, bad in enumerate(
        [b"", b"\xff\xd8\xff", b"\xff\xd8\xff\xdb\x00\x04\x00\x00", b"RIFFxxxx"]
    ):
        try:
            codecs.decode_image(bad)
            out[f"bad_{i}"] = "decoded"
        except Exception as e:
            out[f"bad_{i}"] = type(e).__name__
    # truncated-entropy JPEG: exception class must not change
    arr = codecs.decode_ppm(codecs.synthesize_image(3, W, H))
    p = codecs.encode_jpeg(arr, Q)
    for cut in (len(p) // 2, len(p) - 6, len(p) - 3):
        try:
            codecs.decode_jpeg(p[:cut])
            out[f"trunc_{cut}"] = "decoded"
        except Exception as e:
            out[f"trunc_{cut}"] = type(e).__name__
    pl = codecs.encode_jpeg_lossless(arr, 4)
    for cut in (len(pl) // 2, len(pl) - 6):
        try:
            codecs.decode_jpeg(pl[:cut])
            out[f"trunclossless_{cut}"] = "decoded"
        except Exception as e:
            out[f"trunclossless_{cut}"] = type(e).__name__
    return out


def main() -> None:
    mode = sys.argv[1]
    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/codec_ref_r11.pkl"
    cur = corpus()
    if mode == "snapshot":
        with open(path, "wb") as f:
            pickle.dump(cur, f)
        print(f"snapshot: {len(cur)} digests -> {path}")
        return
    with open(path, "rb") as f:
        ref = pickle.load(f)
    missing = sorted(set(ref) - set(cur))
    extra = sorted(set(cur) - set(ref))
    diffs = sorted(k for k in set(ref) & set(cur) if ref[k] != cur[k])
    if missing or extra or diffs:
        print(f"MISMATCH: missing={missing[:10]} extra={extra[:10]} diffs={diffs[:20]}")
        raise SystemExit(1)
    print(f"check OK: {len(cur)} digests identical")


if __name__ == "__main__":
    main()
