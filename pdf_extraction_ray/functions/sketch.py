"""Mergeable sketches for approximate aggregates at 10^12-row scale.

All public algorithms, vectorized over numpy uint64 hash arrays and
byte-serializable so one small sketch per batch flows through the
exchange instead of every key:

- HyperLogLog (Flajolet et al. 2007): count-distinct, max-merge.
- Count-Min Sketch (Cormode & Muthukrishnan 2005): frequency
  estimation with one-sided (over-)error <= eps*N, sum-merge.
- Bloom filter (Bloom 1970): approximate membership with bounded
  false-positive rate and no false negatives, OR-merge — the join
  pre-filter that prunes probe-side rows before an exact verify."""

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


# ---------------------------------------------------------------------------
# Count-Min Sketch
# ---------------------------------------------------------------------------

CMS_W = 2048                    # eps ~ e/w ~ 0.13% of total count
CMS_D = 4                       # failure prob ~ e^-d ~ 1.8%
def cms_create() -> np.ndarray:
    return np.zeros((CMS_D, CMS_W), dtype=np.int64)


def _splitmix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Vigna): full-avalanche mix so
    h2 is independent of h1's low bits. A plain odd-constant multiply is
    NOT enough here: with power-of-two widths, (h * c) mod w depends only
    on h's low bits, so keys sharing them would collide in EVERY row."""
    z = h ^ (h >> np.uint64(30))
    z = z * np.uint64(0xBF58476D1CE4E5B9)
    z = z ^ (z >> np.uint64(27))
    z = z * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _double_hash_idx(hashes: np.ndarray, row: int, width: int) -> np.ndarray:
    """Row-i index via double hashing (Kirsch-Mitzenmacher):
    (h1 + i*h2) mod width with h2 = splitmix64(h1)."""
    h2 = _splitmix64(hashes)
    return ((hashes + np.uint64(row) * h2) % np.uint64(width)).astype(np.int64)


def cms_add_hashes(sk: np.ndarray, hashes: np.ndarray,
                   counts: np.ndarray | None = None) -> np.ndarray:
    if len(hashes) == 0:
        return sk
    w = counts if counts is not None else np.ones(len(hashes), dtype=np.int64)
    for i in range(CMS_D):
        np.add.at(sk[i], _double_hash_idx(hashes, i, CMS_W), w)
    return sk


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_query(sk: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Estimated counts (int64, >= true count) for pre-hashed keys."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=np.int64)
    est = np.full(len(hashes), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(CMS_D):
        est = np.minimum(est, sk[i][_double_hash_idx(hashes, i, CMS_W)])
    return est


# ---------------------------------------------------------------------------
# Count-Sketch (signed) — unbiased inner products for join-size estimation
# ---------------------------------------------------------------------------

CS_W = 16384                    # var(inner) ~ ||a||2^2 * ||b||2^2 / W
CS_D = 5                        # median of 5 independent estimates


def cs_create() -> np.ndarray:
    return np.zeros((CS_D, CS_W), dtype=np.int64)


def _cs_sign(hashes: np.ndarray, row: int) -> np.ndarray:
    """±1 from an independent bit of the row-i double hash (fast-AGMS:
    sign and bucket from the same Kirsch-Mitzenmacher family). The
    row constant wraps mod 2^64 in PYTHON ints — a numpy uint64 scalar
    multiply warns on the (intended) overflow."""
    salt = np.uint64((0x9E3779B97F4A7C15 * (row + 1)) & 0xFFFFFFFFFFFFFFFF)
    h2 = _splitmix64(hashes + salt)
    return (1 - 2 * ((h2 >> np.uint64(63)).astype(np.int64)))


def cs_add_hashes(sk: np.ndarray, hashes: np.ndarray,
                  counts: np.ndarray | None = None) -> np.ndarray:
    if len(hashes) == 0:
        return sk
    w = counts if counts is not None else np.ones(len(hashes), dtype=np.int64)
    for i in range(CS_D):
        np.add.at(sk[i], _double_hash_idx(hashes, i, CS_W),
                  _cs_sign(hashes, i) * w)
    return sk


def cs_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cs_inner(a: np.ndarray, b: np.ndarray) -> int:
    """Unbiased estimate of the inner product of the two sketched
    frequency vectors — i.e. the JOIN SIZE when each side sketched its
    key column (fast-AGMS, Cormode-Garofalakis): median over rows of
    the per-row dot products."""
    return int(np.median(np.einsum("ij,ij->i", a, b)))


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 1 << 17          # 128 Kbit = 16 KiB
BLOOM_K = 6                     # FPR ~ 0.009 at n = m/12 keys


def bloom_create() -> np.ndarray:
    return np.zeros(BLOOM_M_BITS // 8, dtype=np.uint8)


def bloom_add_hashes(bf: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    if len(hashes) == 0:
        return bf
    for i in range(BLOOM_K):
        idx = _double_hash_idx(hashes, i, BLOOM_M_BITS)
        np.bitwise_or.at(bf, idx >> 3,
                         np.left_shift(np.uint8(1),
                                       (idx & 7).astype(np.uint8)))
    return bf


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a | b


def bloom_contains_hashes(bf: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Boolean membership mask (no false negatives) for pre-hashed keys."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    out = np.ones(len(hashes), dtype=bool)
    for i in range(BLOOM_K):
        idx = _double_hash_idx(hashes, i, BLOOM_M_BITS)
        bit = (bf[idx >> 3] >> (idx & 7).astype(np.uint8)) & np.uint8(1)
        out &= bit.astype(bool)
    return out


# ---------------------------------------------------------------------------
# DDSketch-style log-binned quantile sketch (mergeable, relative-error
# bounded). Bins are gamma^i boundaries with gamma = (1+alpha)/(1-alpha),
# so any returned quantile is within alpha relative error of the true
# value; merging is elementwise addition, so partial sketches stream
# through any tree of combines without error growth.
# ---------------------------------------------------------------------------

DDS_ALPHA = 0.01
DDS_GAMMA = (1 + DDS_ALPHA) / (1 - DDS_ALPHA)
DDS_MIN = 1e-9                 # values below this collapse into bin 0
DDS_BINS = 4096                # covers up to DDS_MIN * gamma^4095 (~1e26)
_LOG_G = np.log(DDS_GAMMA)


def dds_create() -> np.ndarray:
    """int64[DDS_BINS + 1]: slot 0 counts values <= DDS_MIN (incl. 0)."""
    return np.zeros(DDS_BINS + 1, dtype=np.int64)


def dds_add(sk: np.ndarray, values: np.ndarray) -> np.ndarray:
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if len(v) == 0:
        return sk
    small = v <= DDS_MIN
    sk[0] += int(small.sum())
    big = v[~small]
    if len(big):
        idx = np.ceil(np.log(big / DDS_MIN) / _LOG_G).astype(np.int64)
        idx = np.clip(idx, 1, DDS_BINS)
        np.add.at(sk, idx, 1)
    return sk


def dds_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def dds_quantile(sk: np.ndarray, q: float) -> float:
    """Value at quantile q (rank = ceil(q * n), lower bin midpoint in
    log space) — within DDS_ALPHA relative error of the exact result."""
    n = int(sk.sum())
    if n == 0:
        return 0.0
    rank = max(1, int(np.ceil(q * n)))
    cum = np.cumsum(sk)
    b = int(np.searchsorted(cum, rank))
    if b == 0:
        return 0.0
    # geometric midpoint of (gamma^(b-1), gamma^b] * DDS_MIN
    return float(DDS_MIN * DDS_GAMMA ** (b - 0.5))


# ---------------------------------------------------------------------------
# KMV (k minimum values / bottom-k theta) sketch — mergeable distinct
# counting that, unlike HLL, also supports SET OPERATIONS: keeping the k
# smallest unique hash values of a set preserves a uniform sample of the
# union when two sketches merge, so Jaccard (shared fraction among the
# union's k minima) and intersection size fall out of the same k values.
# Standard error of the distinct estimate ~ 1/sqrt(k-2) (~3% at k=1024).
# ---------------------------------------------------------------------------

KMV_K = 1024


def kmv_from_hashes(h: np.ndarray, k: int = KMV_K) -> np.ndarray:
    """uint64 hashes -> sorted unique k minima (shorter if fewer seen)."""
    return np.unique(np.asarray(h, dtype=np.uint64))[:k]


def kmv_merge(a: np.ndarray, b: np.ndarray, k: int = KMV_K) -> np.ndarray:
    return np.unique(np.concatenate([np.asarray(a, dtype=np.uint64),
                                     np.asarray(b, dtype=np.uint64)]))[:k]


def kmv_distinct(sk: np.ndarray, k: int = KMV_K) -> int:
    """Exact below k; else (k-1) / normalized kth minimum."""
    if len(sk) < k:
        return int(len(sk))
    return int((k - 1) / (float(sk[k - 1]) / 2.0 ** 64))


def kmv_intersection(a: np.ndarray, b: np.ndarray,
                     k: int = KMV_K) -> int:
    """|A ∩ B| estimate: jaccard over the union's k minima (a uniform
    hash-sample of A ∪ B) times the union's distinct estimate."""
    u = kmv_merge(a, b, k)
    if len(u) == 0:
        return 0
    both = np.isin(u, a, assume_unique=True) \
        & np.isin(u, b, assume_unique=True)
    jac = both.sum() / len(u)
    return int(round(jac * kmv_distinct(u, k)))
