"""Content-defined chunking (CDC): windowed polynomial rolling hash
over utf-8 bytes, cut where the hash masks to zero, min/max size
clamped. The dedup-friendly chunker of large-scale training pipelines —
unlike fixed-size splitting, an insertion near the start of a document
only perturbs boundaries near the edit, so downstream chunk-level exact
dedup still collapses the untouched remainder (the FastCDC/LBFS
property; tested directly in tests/test_cdc.py).

The hash is vectorized: gear-mapped byte values convolved with W=16
powers of an odd multiplier via shifted adds (numpy, no per-byte python
loop); only the boundary-candidate positions — ~1/TARGET of all bytes —
are touched by the sequential min/max clamp.
"""

from __future__ import annotations

import numpy as np

CDC_WINDOW = 16
CDC_TARGET = 256            # mean chunk size ~ 2x mask density
CDC_MIN = 64
CDC_MAX = 1024
_MASK = np.uint64(CDC_TARGET - 1)       # boundary: (h & mask) == 0
_MULT = np.uint64(0x9E3779B97F4A7C15)   # odd => invertible mod 2^64

_rng = np.random.default_rng(0xCDC)
_GEAR = _rng.integers(0, 2**63, size=256, dtype=np.int64) \
    .astype(np.uint64)      # deterministic gear table

_POWS = np.empty(CDC_WINDOW, dtype=np.uint64)
_POWS[0] = np.uint64(1)
with np.errstate(over="ignore"):              # mod-2^64 wraparound is the hash
    for _i in range(1, CDC_WINDOW):
        _POWS[_i] = _POWS[_i - 1] * _MULT


def _window_hash(data: np.ndarray) -> np.ndarray:
    """h[i] = sum_{j<W} gear[data[i-j]] * MULT^j (uint64 wraparound) —
    a pure function of the last W bytes, so it is position-independent:
    the same 16 bytes hash the same anywhere in any document."""
    g = _GEAR[data]
    h = np.zeros(len(data), dtype=np.uint64)
    for j in range(min(CDC_WINDOW, len(data))):
        h[j:] += g[: len(data) - j] * _POWS[j]
    return h


def cdc_boundaries(data: bytes) -> list[int]:
    """Cut positions (exclusive chunk ends) for one byte string."""
    n = len(data)
    if n == 0:
        return []
    arr = np.frombuffer(data, dtype=np.uint8)
    h = _window_hash(arr)
    cand = np.nonzero((h & _MASK) == 0)[0] + 1      # cut AFTER position
    cuts = []
    start = 0
    for c in cand:
        if c - start < CDC_MIN:
            continue
        while c - start > CDC_MAX:                  # forced max-size cut
            start += CDC_MAX
            cuts.append(start)
        cuts.append(int(c))
        start = int(c)
    while n - start > CDC_MAX:
        start += CDC_MAX
        cuts.append(start)
    if start < n:
        cuts.append(n)
    return cuts


def cdc_chunks(text: str) -> list[str]:
    """Chunk one document; concatenation of chunks == original text.
    Byte cuts landing inside a multibyte utf-8 sequence shift left to
    the character start, so every chunk is valid text."""
    data = text.encode("utf-8")
    out = []
    start = 0
    for c in cdc_boundaries(data):
        while 0 < c < len(data) and (data[c] & 0xC0) == 0x80:
            c -= 1
        if c <= start:
            continue
        out.append(data[start:c].decode("utf-8"))
        start = c
    if start < len(data):
        out.append(data[start:].decode("utf-8"))
    return out
