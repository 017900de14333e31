"""Greedy in-order sequence packing: assign consecutive chunks to
fixed-token-budget training sequences (the sample-packing step that
turns variable-length chunks into dense model inputs).

``pack_greedy`` is the deterministic first-fit-in-order rule: walk the
chunks in their given order, open a new sequence whenever the next chunk
would overflow the capacity. Computed in O(n_sequences * log n) via
cumsum + searchsorted rather than a per-chunk python loop."""

from __future__ import annotations

import numpy as np


def pack_greedy(token_counts: np.ndarray, capacity: int) -> np.ndarray:
    """Sequence id (0-based, int64) per chunk under first-fit-in-order.

    A chunk larger than ``capacity`` still gets its own sequence (the
    upstream chunker bounds chunk size, so this is a safety valve, not a
    normal path)."""
    n = len(token_counts)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    cs = np.concatenate([[0], np.cumsum(token_counts.astype(np.int64))])
    start, seq = 0, 0
    while start < n:
        # largest j with sum(tokens[start..j-1]) <= capacity
        j = int(np.searchsorted(cs, cs[start] + capacity, side="right")) - 1
        j = max(j, start + 1)          # always make progress (oversize chunk)
        out[start:j] = seq
        start, seq = j, seq + 1
    return out


def pack_greedy_reference(token_counts, capacity: int) -> list[int]:
    """Plain-python serial reference for tests."""
    out, seq, used = [], 0, 0
    for i, t in enumerate(token_counts):
        if out and used + t > capacity:
            seq += 1
            used = 0
        out.append(seq)
        used += t
    return out
