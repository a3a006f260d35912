"""Perceptual hash kernel (F9): DCT-free average-hash, pure NumPy.

The input table carries a phash column (input_hint), but the engine can
recompute it from pixels: downscale to an 8x8 grayscale grid by block
averaging, threshold at the mean, pack 64 bits row-major. Identical pixel
content → identical hash; near-identical content → small hamming distance
(pairable with dedup.simhash-style banding)."""

from __future__ import annotations

import numpy as np


def average_hash(px: np.ndarray) -> int:
    """(h, w, bands) uint8 → 64-bit average-hash (int64)."""
    h, w = px.shape[0], px.shape[1]
    gray = px.mean(axis=2, dtype=np.float64)
    # block-average to 8x8 using bincount over block ids (handles any dims)
    ys = np.minimum((np.arange(h) * 8) // max(h, 1), 7)
    xs = np.minimum((np.arange(w) * 8) // max(w, 1), 7)
    block = ys[:, None] * 8 + xs[None, :]
    sums = np.bincount(block.ravel(), weights=gray.ravel(), minlength=64)
    counts = np.bincount(block.ravel(), minlength=64)
    cells = np.divide(sums, np.maximum(counts, 1))
    bits = (cells > cells.mean()).astype(np.uint64)
    val = np.uint64(0)
    for i in range(64):
        if bits[i]:
            val |= np.uint64(1) << np.uint64(i)
    return int(val.astype(np.int64))
