"""Pure-numpy perceptual image hashes (dHash / aHash / pHash).

The reference's image pipeline keeps thumbnails for result-page display
(``Images.cpp`` [U]); a training-data pipeline additionally needs
NEAR-duplicate image detection — re-encoded, resized, or lightly edited
copies of the same picture hash to nearby signatures, so hamming-LSH
banding (operators/dedup.py::hamming_neardup_pairs) finds them without
an all-pairs scan.  Public algorithms:

  * aHash — 8×8 area-mean grayscale, bit = pixel > mean;
  * dHash — 9×8 grid, bit = left pixel < right neighbour (gradient
    sign, robust to global brightness shifts);
  * pHash — 32×32 grayscale → 2-D DCT-II → lowest 8×8 frequency block
    (minus DC) vs its median (robust to blur/resize/compression).

All three return an int64 (the 64-bit signature viewed signed, matching
Spark LongType / DuckDB BIGINT bit-for-bit).
"""

from __future__ import annotations

import numpy as np


def gray_area(pix: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """RGB uint8 (h, w, 3) → float64 grayscale (out_h, out_w), area-mean
    downsample (each output cell averages its whole source window —
    stable under small shifts, unlike nearest-neighbour)."""
    h, w = pix.shape[:2]
    gray = pix.astype(np.float64).mean(axis=2)
    ye = (np.arange(out_h + 1) * h) // out_h
    xe = (np.arange(out_w + 1) * w) // out_w
    # summed-area table → O(1) window means
    sat = np.zeros((h + 1, w + 1))
    np.cumsum(np.cumsum(gray, axis=0), axis=1, out=sat[1:, 1:])
    win = (sat[ye[1:, None], xe[None, 1:]] - sat[ye[:-1, None], xe[None, 1:]]
           - sat[ye[1:, None], xe[None, :-1]] + sat[ye[:-1, None], xe[None, :-1]])
    area = ((ye[1:] - ye[:-1])[:, None] * (xe[1:] - xe[:-1])[None, :])
    return win / np.maximum(area, 1)


def _pack64(bits: np.ndarray) -> int:
    """boolean array of 64 → signed int64 (bit 0 = first element)."""
    v = np.uint64(0)
    for i, b in enumerate(bits.reshape(-1)[:64]):
        if b:
            v |= np.uint64(1) << np.uint64(i)
    return int(v.astype(np.int64))


def ahash64(pix: np.ndarray) -> int:
    g = gray_area(pix, 8, 8)
    return _pack64(g > g.mean())


def dhash64(pix: np.ndarray) -> int:
    g = gray_area(pix, 9, 8)
    return _pack64(g[:, :-1] < g[:, 1:])


def _dct_mat(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    return np.cos(np.pi * k * (2 * np.arange(n)[None, :] + 1) / (2 * n))


_DCT32 = _dct_mat(32)


def phash64(pix: np.ndarray) -> int:
    g = gray_area(pix, 32, 32)
    freq = _DCT32 @ g @ _DCT32.T           # 2-D DCT-II (unnormalized)
    block = freq[:8, :8].copy().reshape(-1)
    block[0] = np.nan                      # drop DC before the median
    med = np.nanmedian(block)
    bits = np.where(np.isnan(block), False, block > med)
    return _pack64(bits)
