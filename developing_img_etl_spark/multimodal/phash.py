"""Perceptual image hashing (pHash) — DCT-domain near-duplicate
detection for image corpora.

The text dedup family (M4 MinHash, M5 SimHash, q14c Jaccard, q31
cosine) has no image counterpart in the reference, but any
LAION-shaped multimodal corpus needs one: re-encoded, resized or
slightly-filtered copies of the same picture must collapse even
though their BYTES differ (exact dedup q14a sees distinct hashes).
The classic answer is the DCT perceptual hash: luminance → 32×32 →
2-D DCT → keep the 8×8 low-frequency corner (drop DC) → threshold
each coefficient against the median → 63-bit fingerprint. Lossy
re-encoding perturbs high frequencies and absolute levels; the
low-frequency SIGN STRUCTURE survives, so perceptual duplicates land
within a few Hamming bits of each other.

Pure numpy over the decoded pixels the existing codecs (BMP/PNG/GIF/
JPEG/FAKEIMG) already produce — no new dependency. Pair generation
at corpus scale reuses the SimHash discipline (operators/dedup.py):
band the 64 bits, join on band equality, verify survivors by exact
Hamming distance — never all-pairs.
"""

from __future__ import annotations

import numpy as np

_N = 32  # DCT grid
_K = 8  # low-frequency corner kept


def _dct_matrix(n: int) -> np.ndarray:
    u = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    m = np.cos((2 * x + 1) * u * np.pi / (2 * n))
    m[0, :] *= np.sqrt(1.0 / n)
    m[1:, :] *= np.sqrt(2.0 / n)
    return m


_DCT32 = _dct_matrix(_N)


def phash64(arr: np.ndarray) -> int:
    """(h, w, 3) or (h, w) uint8 pixels → 63-bit perceptual hash.

    Deterministic: BT.601 luminance, nearest-neighbor gather to 32×32
    (the reference's int-truncation arithmetic), orthonormal 2-D DCT,
    median threshold over the 8×8 corner minus DC."""
    a = np.asarray(arr)
    if a.ndim == 3:
        lum = (
            0.299 * a[:, :, 0].astype(np.float64)
            + 0.587 * a[:, :, 1].astype(np.float64)
            + 0.114 * a[:, :, 2].astype(np.float64)
        )
    else:
        lum = a.astype(np.float64)
    h, w = lum.shape
    ys = np.minimum((np.arange(_N) * h) // _N, h - 1)
    xs = np.minimum((np.arange(_N) * w) // _N, w - 1)
    g = lum[np.ix_(ys, xs)]
    freq = _DCT32 @ g @ _DCT32.T
    vals = freq[:_K, :_K].reshape(-1)[1:]  # drop DC
    med = np.median(vals)
    bits = 0
    for i, v in enumerate(vals):
        if v > med:
            bits |= 1 << i
    return int(bits)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def make_textured(width: int, height: int, seed: int) -> np.ndarray:
    """Deterministic test pixels with seed-dependent STRUCTURE (spatial
    frequencies vary with the seed, not just the phase) — make_photo's
    shifted-gradient corpus is structurally self-similar, which is
    exactly what a perceptual hash is designed to collapse; pHash test
    corpora need images that actually differ."""
    xs = np.arange(width, dtype=np.int64)[None, :]
    ys = np.arange(height, dtype=np.int64)[:, None]
    fx, fy = 1 + seed % 5, 1 + (seed // 5) % 7
    r = (seed * 29 + xs * fx + ys * fy) % 256
    g = (seed * 11 + (xs * xs) // (1 + fx) + ys * 3) % 256
    b = (seed * 7 + xs * fy + (ys * ys) // (1 + fy)) % 256
    return np.stack(
        [np.broadcast_to(c, (height, width)) for c in (r, g, b)], axis=2
    ).astype(np.uint8)
