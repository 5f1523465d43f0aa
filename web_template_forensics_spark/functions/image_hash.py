"""Perceptual image hashing (pHash) — pure numpy, deterministic.

64-bit DCT perceptual hash over decoded pixels: greyscale (Rec.601) →
32×32 area-average (box-filter) downsample — the block-EDGE index rule
matches ``operators.multimodal.resize_image``; the sampling rule is a
block mean, not nearest-neighbor (see ``_grey32``) → orthonormal 2-D
DCT-II → the
8×8 low-frequency block, each coefficient thresholded against the
block's median. Robust to re-encoding (JPEG quality, PNG vs JPEG) and
resampling, which is exactly the near-duplicate class a training-data
pipeline must collapse; Hamming distance between hashes approximates
perceptual distance.

Determinism contract: every step is fixed-order numpy float64 with a
1e-6 quantization before the median threshold, so the Spark face
(executor-side ``mapInPandas``) and the Spark-free oracle twin
(driver-side VALUES builder) produce bit-identical hashes on the same
decoded pixels — the same cross-face discipline as
``text_udfs.minhash_signature`` after the r4 advice fix.

Reference parity: the reference repo's visual path is an empty stub
(``visual/compare_images.py``, all ``pass`` — SURVEY.md §0), so this is
graft surface for the multimodal × dedup families, not reference
parity.
"""

from __future__ import annotations

import numpy as np

PHASH_SIDE = 32  # downsample grid
PHASH_BLOCK = 8  # low-frequency DCT block -> 64 bits

# Orthonormal DCT-II basis, precomputed once: C @ x applies the 1-D
# transform; C @ img @ C.T is the separable 2-D transform.
_N = PHASH_SIDE
_k = np.arange(_N)[:, None]
_n = np.arange(_N)[None, :]
_DCT = np.sqrt(2.0 / _N) * np.cos(np.pi * (2 * _n + 1) * _k / (2 * _N))
_DCT[0] /= np.sqrt(2.0)


def _grey32(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) or (h, w) uint8 -> (32, 32) float64 greyscale.

    Area-average (box-filter) downsample, not nearest-neighbor: each
    output cell is the mean of its source block, so single-pixel
    codec noise averages out — the standard pHash resize choice, and
    measurably ~2× fewer flipped bits across JPEG quality levels than
    NN on this package's own encoders."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 3:
        a = a @ np.array([0.299, 0.587, 0.114])
    h, w = a.shape
    # prefix sums -> exact block means at arbitrary (even fractional-
    # ratio) grids, in fixed evaluation order
    ps = np.zeros((h + 1, w + 1))
    ps[1:, 1:] = a.cumsum(0).cumsum(1)
    ye = np.minimum((np.arange(PHASH_SIDE + 1) * h) // PHASH_SIDE, h)
    xe = np.minimum((np.arange(PHASH_SIDE + 1) * w) // PHASH_SIDE, w)
    ye[-1], xe[-1] = h, w
    # degenerate dims (h or w < 32): empty blocks borrow the previous
    # edge so every cell still has >= 1 source pixel
    ye = np.maximum.accumulate(np.maximum(ye, np.arange(PHASH_SIDE + 1) > 0))
    xe = np.maximum.accumulate(np.maximum(xe, np.arange(PHASH_SIDE + 1) > 0))
    y0, y1 = ye[:-1].copy(), ye[1:]
    x0, x1 = xe[:-1].copy(), xe[1:]
    y0 = np.minimum(y0, y1 - 1)
    x0 = np.minimum(x0, x1 - 1)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    s = (
        ps[y1[:, None], x1[None, :]]
        - ps[y0[:, None], x1[None, :]]
        - ps[y1[:, None], x0[None, :]]
        + ps[y0[:, None], x0[None, :]]
    )
    return s / area


def phash64(img: np.ndarray) -> int:
    """Perceptual hash of a decoded image -> unsigned 64-bit int.

    Bit i (MSB-first over the row-major 8×8 DCT block) is 1 iff the
    quantized coefficient exceeds the block median. The median over all
    64 coefficients (DC included) keeps the popcount near 32 for any
    input, which is what makes Hamming distance comparable across
    images of different brightness."""
    d = _DCT @ _grey32(img) @ _DCT.T
    block = d[:PHASH_BLOCK, :PHASH_BLOCK].reshape(-1)
    # 1e-6 quantization BEFORE the threshold: median ties must resolve
    # identically on both faces regardless of summation order
    q = np.round(block, 6)
    med = np.median(q)
    bits = q > med
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h


def phash_to_signed(h: int) -> int:
    """Unsigned 64-bit hash -> the two's-complement signed value a Spark
    ``long`` column stores (inverse: ``& ((1 << 64) - 1)``)."""
    return h - (1 << 64) if h >= (1 << 63) else h
