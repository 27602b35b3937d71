"""Second-dial truth probe for the media banding recall claims (round-9
judge ask #7).

The image/audio near-dup oracles precompute the confirmed set THROUGH the
same codec + banding semantics as the engine, so cross-engine hash-matching
proves agreement, not recall truth (the round-7 narrow-hash lesson).  This
probe measures banding recall against an INDEPENDENT brute-force exact
join, on three dials:

1. corpus dial — dHashes of a 5k-image sample at sf0.1, computed through
   the REAL distributed decode+hash path; every pair's exact 64-bit
   Hamming distance brute-forced (numpy popcount over the distinct-hash
   matrix, weighted by class multiplicity) vs the 4x16-band candidacy.
   Recall must be EXACTLY 1.0 for h <= 3 (pigeonhole: 4 bands, h <= 3
   differing bits leave >= 1 band intact).
2. synthetic dial — deterministic pseudorandom 64-bit hashes with exactly
   h bits flipped at seeded positions, h = 1..12, 20k trials each;
   measured candidate rate vs the exact hypergeometric inclusion-
   exclusion expectation P(>= 1 intact band) — the banding claim checked
   against closed-form combinatorics, not against itself.
3. audio dial — the two-offset-grid candidacy over the 128 fp-tone
   classes vs brute-force max per-window deviation: recall must be
   EXACTLY 1.0 for max-dev <= 1 (the |a-b|<=1 => floor-grid-share
   guarantee), with the unguaranteed dev >= 2 rates recorded.

Usage: python tools/probe_media_banding_recall.py [--sf-dir DIR] [--sample N]
Prints one JSON document; paste the summary row into DESIGN.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procurement_system_bigdata_spark.operators import codecs  # noqa: E402


def _hamming_matrix(hashes: np.ndarray) -> np.ndarray:
    """(n,) uint64 -> (n, n) popcount(xor) matrix."""
    x = hashes[:, None] ^ hashes[None, :]
    # vectorized popcount via byte view + lookup table
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    return lut[x.view(np.uint8).reshape(x.shape + (8,))].sum(axis=-1).astype(np.int64)


def _band_candidate_matrix(hashes: np.ndarray) -> np.ndarray:
    """(n,) uint64 -> (n, n) bool: share at least one 16-bit band."""
    out = np.zeros((len(hashes), len(hashes)), dtype=bool)
    for b in range(4):
        band = (hashes >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        out |= band[:, None] == band[None, :]
    return out


def expected_band_recall(h: int, bands: int = 4, band_bits: int = 16) -> float:
    """P(>= 1 intact band) when h differing bits land uniformly without
    replacement among bands*band_bits positions — inclusion-exclusion over
    which bands stay clean (hypergeometric)."""
    n = bands * band_bits
    if h == 0:
        return 1.0
    total = math.comb(n, h)
    p = 0.0
    for k in range(1, bands + 1):
        free = n - k * band_bits
        if free < h:
            term = 0.0
        else:
            term = math.comb(free, h) / total
        p += (-1) ** (k + 1) * math.comb(bands, k) * term
    return p


def corpus_dial(sf_dir: str, sample_n: int) -> dict:
    """dHash banding recall over the real corpus, brute-force verified.

    Hashes come from the REAL distributed decode path (Spark mapInPandas
    over pattern payloads); the exact join is numpy over the sample."""
    from procurement_system_bigdata_spark.operators import multimodal
    from procurement_system_bigdata_spark.session import get_spark

    spark = get_spark(app_name="probe-banding-recall", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .orderBy("doc_id")
        .limit(sample_n)
    )
    media = multimodal.attach_pattern_images(docs)
    rows = multimodal.image_dhash(media).select("media_id", "dhash").collect()
    ids = np.array([r.media_id for r in rows], dtype=np.int64)
    hx = np.array([int(r.dhash, 16) for r in rows], dtype=np.uint64)
    # distinct-hash level with multiplicities: the pair counts over the
    # sample are exact but the matrices stay tiny (<= 256 distinct)
    uniq, counts = np.unique(hx, return_counts=True)
    ham = _hamming_matrix(uniq)
    cand = _band_candidate_matrix(uniq)
    iu = np.triu_indices(len(uniq), k=1)
    # cross-class pair multiplicity = count_i * count_j; same-class pairs
    # have h = 0 (trivially candidates, excluded from the recall table)
    mult = counts[iu[0]] * counts[iu[1]]
    table = {}
    for h in range(1, 13):
        sel = ham[iu] == h
        true_pairs = int(mult[sel].sum())
        cand_pairs = int(mult[sel & cand[iu]].sum())
        table[h] = {
            "true_pairs": true_pairs,
            "candidate_pairs": cand_pairs,
            "recall": round(cand_pairs / true_pairs, 6) if true_pairs else None,
            "pigeonhole_guaranteed": h <= 3,
        }
    assert all(
        row["recall"] == 1.0
        for h, row in table.items()
        if h <= 3 and row["true_pairs"]
    ), "pigeonhole guarantee violated on corpus hashes"
    return {
        "sample_images": int(len(ids)),
        "distinct_hashes": int(len(uniq)),
        "recall_by_hamming": table,
    }


def synthetic_dial(trials: int = 20000) -> dict:
    """Measured banding candidacy on seeded random hashes + exact-h flips
    vs the closed-form hypergeometric expectation."""
    rng = np.random.default_rng(0x9E3779B9)  # fixed seed: reproducible
    out = {}
    for h in range(1, 13):
        base = rng.integers(0, 2**63, size=trials, dtype=np.uint64) * np.uint64(2) | (
            rng.integers(0, 2, size=trials).astype(np.uint64)
        )
        hits = 0
        flips = np.argsort(rng.random((trials, 64)), axis=1)[:, :h]
        flipped = base.copy()
        for t in range(trials):
            m = np.uint64(0)
            for pos in flips[t]:
                m |= np.uint64(1) << np.uint64(pos)
            flipped[t] ^= m
        for b in range(4):
            sh = np.uint64(16 * b)
            mask = np.uint64(0xFFFF)
            match = ((base >> sh) & mask) == ((flipped >> sh) & mask)
            hits += match
        measured = float(np.mean(np.asarray(hits) > 0))
        expected = expected_band_recall(h)
        out[h] = {
            "measured": round(measured, 4),
            "expected_closed_form": round(expected, 4),
            "abs_dev": round(abs(measured - expected), 4),
        }
    # 20k trials -> binomial se <= 0.0035; 3 sigma gate
    worst = max(v["abs_dev"] for v in out.values())
    assert worst <= 0.012, f"synthetic banding recall off closed form: {worst}"
    return {"trials": trials, "recall_by_hamming": out, "max_abs_dev": worst}


def audio_dial() -> dict:
    """Two-grid candidacy vs brute-force max-deviation over the 128
    fp-tone classes (single-threaded recompute — independent of both the
    Spark path and the oracle VALUES)."""
    sigs = np.array(
        [
            codecs.audio_zc_fingerprint(codecs.synthesize_fp_tone(c))
            for c in range(codecs.FP_TONE_CLASSES)
        ],
        dtype=np.int64,
    )
    n = len(sigs)
    dev = np.abs(sigs[:, None, :] - sigs[None, :, :]).max(axis=2)
    cand = np.zeros((n, n), dtype=bool)
    for g in (0, 1):
        grid = (sigs + g) // 2
        cand |= (grid[:, None, :] == grid[None, :, :]).any(axis=2)
    iu = np.triu_indices(n, k=1)
    table = {}
    for d in range(0, 5):
        sel = dev[iu] == d
        true_pairs = int(sel.sum())
        cand_pairs = int((sel & cand[iu]).sum())
        table[d] = {
            "true_class_pairs": true_pairs,
            "candidate_class_pairs": cand_pairs,
            "recall": round(cand_pairs / true_pairs, 6) if true_pairs else None,
            "two_grid_guaranteed": d <= 1,
        }
    assert all(
        row["recall"] == 1.0
        for d, row in table.items()
        if d <= 1 and row["true_class_pairs"]
    ), "two-grid guarantee violated"
    return {"classes": n, "recall_by_max_dev": table}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--sample", type=int, default=5000)
    ap.add_argument("--trials", type=int, default=20000)
    args = ap.parse_args()
    result = {
        "probe": "media_banding_recall_second_dial",
        "synthetic": synthetic_dial(args.trials),
        "audio": audio_dial(),
        "corpus": corpus_dial(args.sf_dir, args.sample),
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
