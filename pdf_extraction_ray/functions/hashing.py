"""Vectorized hashing / sketch kernels for dedup & fingerprinting.

MinHash, SimHash, word-shingles, n-gram Jaccard, rolling-hash document
fingerprints. All deterministic (fixed seeds / pandas' fixed siphash key)
and vectorized: per-batch numpy over flattened token arrays — no python
loop over documents in the signature path. Signatures are mergeable /
bandable so the distributed stages shuffle only (band_id, band_hash,
doc_id) rows, never raw text (SNIPPETS/ray_guide near-dup pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .arrow_utils import as_array

MERSENNE61 = (1 << 61) - 1
N_PERM = 128
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_K = 3            # word 3-shingles
SIMHASH_BITS = 64

_rng = np.random.default_rng(0xD5ED)
_MINHASH_A = _rng.integers(1, MERSENNE61, size=N_PERM, dtype=np.int64).astype(np.uint64)
_MINHASH_B = _rng.integers(0, MERSENNE61, size=N_PERM, dtype=np.int64).astype(np.uint64)


def hash_strings(arr) -> np.ndarray:
    """Deterministic uint64 hash of a string array (pandas siphash,
    fixed default key — stable across processes/nodes)."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = as_array(arr).to_numpy(zero_copy_only=False)
    return pd.util.hash_array(np.asarray(arr, dtype=object))


def _doc_tokens(text: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (token_hashes uint64, parent doc index per token, doc lengths).
    Empty-string tokens (from empty/whitespace docs) are dropped."""
    toks = as_array(pc.split_pattern_regex(
        pc.utf8_lower(pc.utf8_trim_whitespace(text)), r"\s+"))
    flat = as_array(pc.list_flatten(toks))
    parent = as_array(pc.list_parent_indices(toks)).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(nonempty))
    parent = parent[nonempty]
    lengths = np.bincount(parent, minlength=len(text)).astype(np.int64)
    return hash_strings(flat), parent, lengths


def shingle_hashes(text: pa.Array, k: int = SHINGLE_K) -> tuple[np.ndarray, np.ndarray]:
    """Word k-shingle hashes per doc -> (shingle_hash uint64, parent doc idx),
    in document order. Docs with < k tokens contribute their whole-token
    hashes (so short docs still dedup)."""
    h, parent, lengths = _doc_tokens(text)
    n = len(h)
    if n == 0:
        return np.array([], dtype=np.uint64), np.array([], dtype=np.int64)
    if n >= k:
        # rolling combine over k consecutive token hashes, masked to windows
        # fully inside one doc
        comb = np.zeros(n - k + 1, dtype=np.uint64)
        for j in range(k):
            comb = comb * np.uint64(1099511628211) + h[j:n - k + 1 + j]
        ok = parent[: n - k + 1] == parent[k - 1:]
        sh, sp = comb[ok], parent[: n - k + 1][ok]
    else:
        sh, sp = np.array([], dtype=np.uint64), np.array([], dtype=np.int64)
    # short docs: fall back to single-token hashes
    short = np.isin(parent, np.nonzero(lengths < k)[0])
    if short.any():
        sh = np.concatenate([sh, h[short]])
        sp = np.concatenate([sp, parent[short]])
        order = np.argsort(sp, kind="stable")
        sh, sp = sh[order], sp[order]
    return sh, sp


def minhash_signatures(text: pa.Array, n_perm: int = N_PERM) -> np.ndarray:
    """(n_docs, n_perm) uint64 MinHash signature matrix. Empty docs get
    all-MAX signatures (match nothing)."""
    sh, sp = shingle_hashes(text)
    n_docs = len(text)
    sig = np.full((n_docs, n_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    have_docs = np.unique(sp)                    # docs with >=1 shingle
    seg_starts = np.searchsorted(sp, have_docs)  # strictly increasing, < len
    base = sh % MERSENNE61
    for p in range(n_perm):
        hp = (_MINHASH_A[p] * base + _MINHASH_B[p]) % MERSENNE61
        sig[have_docs, p] = np.minimum.reduceat(hp, seg_starts)
    return sig


def lsh_band_hashes(sig: np.ndarray) -> np.ndarray:
    """(n_docs, N_BANDS) uint64 band hashes from a signature matrix."""
    n_docs = sig.shape[0]
    out = np.zeros((n_docs, N_BANDS), dtype=np.uint64)
    for b in range(N_BANDS):
        band = sig[:, b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
        acc = np.zeros(n_docs, dtype=np.uint64)
        for j in range(ROWS_PER_BAND):
            acc = acc * np.uint64(1099511628211) + band[:, j]
        out[:, b] = acc
    return out


def simhash(text: pa.Array) -> np.ndarray:
    """64-bit SimHash per doc (uint64): sign of the sum of +-1 bit vectors
    of token hashes. Per-doc segment sums run through ``np.add.reduceat``
    (``parent`` from list_parent_indices is sorted ascending), not the
    unbuffered ``np.add.at``."""
    h, parent, lengths = _doc_tokens(text)
    n_docs = len(text)
    acc = np.zeros((n_docs, SIMHASH_BITS), dtype=np.int64)
    if len(h):
        # uint8 unpack (19 MB for 300k tokens) instead of 64 int64 shifts
        # (150 MB); bitorder='little' puts hash bit b in column b
        bits01 = np.unpackbits(
            np.ascontiguousarray(h[:, None]).view(np.uint8),
            axis=1, bitorder="little")
        nz = lengths > 0
        # consecutive nonzero docs have strictly increasing starts, which
        # is exactly what reduceat's segment semantics need (zero-token
        # docs would alias the next doc's start — they stay all-zero)
        starts = np.searchsorted(parent, np.nonzero(nz)[0])
        ones = np.add.reduceat(bits01, starts, axis=0, dtype=np.int64)
        # sum of +-1 bits == 2 * ones - n_tokens
        acc[nz] = 2 * ones - lengths[nz][:, None]
    out = np.zeros(n_docs, dtype=np.uint64)
    pos = acc > 0
    for b in range(SIMHASH_BITS):
        out |= pos[:, b].astype(np.uint64) << np.uint64(b)
    return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Popcount of xor via one unpackbits pass (vs 64 shift iterations)."""
    x = np.ascontiguousarray(np.bitwise_xor(a, b))
    if x.size == 0:
        return np.zeros(x.shape, dtype=np.int64)
    bytes_view = x.reshape(-1, 1).view(np.uint8)
    return np.unpackbits(bytes_view, axis=1).sum(axis=1).astype(np.int64) \
        .reshape(x.shape)


def jaccard(a_tokens: set, b_tokens: set) -> float:
    if not a_tokens and not b_tokens:
        return 1.0
    u = len(a_tokens | b_tokens)
    return len(a_tokens & b_tokens) / u if u else 0.0


def containment(a_tokens: set, b_tokens: set) -> float:
    """Asymmetric near-dup score |A ∩ B| / min(|A|, |B|) — 1.0 when the
    smaller shingle set is fully inside the larger (quotation / subset
    duplication, which Jaccard under-scores for unequal lengths)."""
    if not a_tokens and not b_tokens:
        return 1.0
    m = min(len(a_tokens), len(b_tokens))
    return len(a_tokens & b_tokens) / m if m else 0.0


def word_ngrams(text: str, k: int = SHINGLE_K) -> set:
    toks = text.lower().split()
    if len(toks) < k:
        return set(toks)
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def rolling_fingerprint(text: pa.Array, k: int = 8) -> np.ndarray:
    """Winnowing-style document fingerprint (uint64): minimum polynomial
    rolling hash over all k-char windows. Vectorized over byte arrays."""
    out = np.zeros(len(text), dtype=np.uint64)
    texts = as_array(text).to_pylist()
    for i, t in enumerate(texts):     # per-doc, but each doc vectorized
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) == 0:
            continue
        if len(b) < k:
            acc = np.uint64(0)
            for v in b:
                acc = acc * np.uint64(257) + v
            out[i] = acc
            continue
        n = len(b) - k + 1
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            acc = acc * np.uint64(257) + b[j:n + j]
        out[i] = acc.min()
    return out
