"""Mergeable sketches for approximate aggregates at 10^12-row scale.

HyperLogLog (Flajolet et al. 2007, public algorithm): vectorized add
(numpy over uint64 hashes), byte-serializable registers, associative
merge — the shape that lets a distributed count-distinct ship one small
sketch per batch through the exchange instead of every key."""

from __future__ import annotations

import numpy as np

HLL_P = 12                      # 4096 registers; ~1.6% standard error
HLL_M = 1 << HLL_P


def hll_create() -> np.ndarray:
    return np.zeros(HLL_M, dtype=np.uint8)


def hll_add_hashes(reg: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Add pre-hashed uint64 values (vectorized)."""
    if len(hashes) == 0:
        return reg
    idx = (hashes >> np.uint64(64 - HLL_P)).astype(np.int64)
    # rank = leading zeros of the remaining 64-P bits, + 1 (capped)
    bits = hashes << np.uint64(HLL_P)
    found = np.zeros(len(hashes), dtype=bool)
    pos = np.zeros(len(hashes), dtype=np.uint8)
    for b in range(64 - HLL_P):
        top = (bits >> np.uint64(63)) & np.uint64(1)
        hit = (~found) & (top == 1)
        pos[hit] = b
        found |= hit
        bits = bits << np.uint64(1)
    lz = np.where(found, pos, 64 - HLL_P).astype(np.uint8)
    rank = lz + 1
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_count(reg: np.ndarray) -> int:
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-reg.astype(np.float64))))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:          # small-range correction
        est = m * np.log(m / zeros)
    return int(round(est))
