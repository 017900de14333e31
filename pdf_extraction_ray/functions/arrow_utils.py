"""Small Arrow helpers shared by the vectorized stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def as_array(col) -> pa.Array:
    """ChunkedArray | Array -> contiguous Array (no copy when one chunk)."""
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def list_offsets(list_col) -> np.ndarray:
    """int64 offsets[n+1] of a list column, from per-row lengths (robust to
    slicing, unlike reading ``.offsets`` directly). Null list rows count as
    length 0 — consistent with ``pc.list_flatten`` skipping them, so flat
    arrays stay aligned with these offsets."""
    import pyarrow.compute as pc
    lengths = pc.fill_null(pc.list_value_length(list_col), 0) \
        .to_numpy(zero_copy_only=False)
    out = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=out[1:])
    return out


def relist(offsets: np.ndarray, values) -> pa.ListArray:
    """Re-nest flat values under int32 offsets."""
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                    as_array(values))


def round_half_away(a: np.ndarray) -> np.ndarray:
    """Half-AWAY-from-zero rounding to int64 — DuckDB ROUND semantics.
    The single numpy home for oracle-parity rounding (np.round/pc.round
    default to half-to-even and silently diverge from SQL on .5)."""
    return (np.sign(a) * np.floor(np.abs(a) + 0.5)).astype("int64")
