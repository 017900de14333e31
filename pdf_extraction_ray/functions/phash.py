"""Perceptual hash (pHash) kernels for image near-duplicate detection:
decode-stub grayscale, batched 2D DCT-II (pure numpy matrix form), and
the 64-bit low-frequency sign hash.

The classic image near-dup operator of a multimodal training pipeline
(pHash over decoded thumbnails, multi-index Hamming search). The decode
step is the repo's deterministic stub (no imaging libs here) — real
codecs replace ``payload_gray32`` only; the DCT, hashing and the
banded pair search are the production kernels.

Reference analog: the reference renders page rasters for its CV path
(advanced_layout_extractor.py:293-297); near-dup hashing of media
payloads extends that family to corpus-scale image dedup.
"""

from __future__ import annotations

import numpy as np

GRAY_N = 16            # thumbnail side: the 256-byte stub body maps to
                       # one 16x16 frame EXACTLY — tiling a short body
                       # to a larger frame makes the image periodic and
                       # collapses low-frequency DCT entropy (measured:
                       # unrelated images collide within Hamming 7)
HASH_BITS = 64
N_BANDS = 8            # 8 bands x 8 bits: any pair with Hamming <= 7
                       # shares at least one full band (pigeonhole), so
                       # the banded search has EXACT recall at the
                       # default threshold
MAX_HAMMING = 7


def payload_gray32(payloads: list[bytes]) -> np.ndarray:
    """Stub decode: payload body bytes -> (n, 16, 16) float grayscale.
    Byte-local, so small payload perturbations (recompression noise)
    perturb few pixels — the property pHash exploits. Real decoders
    (PIL thumbnail + convert("L")) replace exactly this function."""
    out = np.zeros((len(payloads), GRAY_N, GRAY_N))
    need = GRAY_N * GRAY_N
    for i, p in enumerate(payloads):
        body = np.frombuffer(p[4:], dtype=np.uint8)
        if len(body) == 0:
            continue
        reps = -(-need // len(body))                 # ceil
        out[i] = np.tile(body, reps)[:need].reshape(GRAY_N, GRAY_N)
    return out


def _dct_matrix(n: int = GRAY_N) -> np.ndarray:
    """Orthonormal DCT-II basis (rows = frequencies)."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


_DCT = _dct_matrix()


def phash64(imgs: np.ndarray) -> np.ndarray:
    """(n, 32, 32) grayscale -> (n,) uint64 pHash: 2D DCT, keep the 8x8
    low-frequency block, bit = coefficient > block median (strict, so
    the hash is deterministic)."""
    coefs = np.einsum("ij,njk,lk->nil", _DCT, imgs, _DCT)[:, :8, :8] \
        .reshape(len(imgs), 64)
    med = np.median(coefs, axis=1, keepdims=True)
    bits = (coefs > med).astype(np.uint64)
    return (bits << np.arange(64, dtype=np.uint64)).sum(axis=1,
                                                        dtype=np.uint64)


def band_keys(hashes: np.ndarray) -> np.ndarray:
    """(n,) uint64 -> (n, N_BANDS) int64 salted band keys (8 bits per
    band, xor-salted so equal bytes in different bands never collide)."""
    salts = (np.arange(N_BANDS, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))
    bands = np.stack([(hashes >> np.uint64(8 * b)) & np.uint64(0xFF)
                      for b in range(N_BANDS)], axis=1)
    return (bands ^ salts[None, :]).view(np.int64)
