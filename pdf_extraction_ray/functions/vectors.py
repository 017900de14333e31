"""Fixed-point vector kernels shared by the similarity / dedup pipelines.

Embeddings are quantized to int64 (``floor(x * 1e3)``) so dot products
and squared norms are EXACT integers in both numpy and DuckDB; the final
cosine is the identical IEEE-double expression

    floor( dot / (sqrt(n2_a) * sqrt(n2_b)) * 1e6 )

evaluated with the same operation order on both engines, giving bit-exact
oracle parity (the same trick as the integer money math in
``relational.py`` — see memory note on half-even rounding; here only
floor/sqrt/division appear, all correctly-rounded IEEE ops).

The quantization defines the operator's semantics: "cosine" in the
embedding-dedup family means fixed-point cosine at 1e-3 component
resolution. At near-dup thresholds (0.95) the difference from float
cosine is far below the decision band for any real embedding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

QUANT = 1000.0          # component fixed-point scale
COS_SCALE = 1_000_000.0  # output cosine scale


def quantize(mat: np.ndarray) -> np.ndarray:
    """float (n, d) -> int64 (n, d), floor(x * 1e3)."""
    return np.floor(mat.astype(np.float64) * QUANT).astype(np.int64)


def quantize_batch(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """Arrow batch with a list<float> column -> quantized int64 matrix."""
    emb = batch[col]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    return quantize(np.stack(emb.to_numpy(zero_copy_only=False)))


def sq_norms(q: np.ndarray) -> np.ndarray:
    """Exact integer squared norms of quantized rows."""
    return (q * q).sum(axis=1)


def cosine_x1e6(qa: np.ndarray, qb: np.ndarray) -> np.ndarray:
    """Pairwise fixed-point cosine matrix (len(qa), len(qb)) — int64.

    Exact integer dot / norms; the float expression mirrors the oracle
    SQL token-for-token: ``(d / (sqrt(na) * sqrt(nb))) * 1e6`` floored.
    """
    dot = qa @ qb.T                                     # exact int64
    na = np.sqrt(sq_norms(qa).astype(np.float64))
    nb = np.sqrt(sq_norms(qb).astype(np.float64))
    denom = na[:, None] * nb[None, :]
    return np.floor(dot / denom * COS_SCALE).astype(np.int64)


def cosine_pairs_block(ids_a, qa, ids_b, qb, threshold_x1e6):
    """All cross pairs (a, b) with id_a < id_b and fixed-point cosine >=
    threshold. Returns (vec_a, vec_b, cosine_x1e6) int64 arrays."""
    cos = cosine_x1e6(qa, qb)
    ai, bj = np.nonzero(cos >= threshold_x1e6)
    va, vb = np.asarray(ids_a)[ai], np.asarray(ids_b)[bj]
    keep = va < vb
    return va[keep], vb[keep], cos[ai, bj][keep]


def pairs_sql(threshold_x1e6: int, dims: int = 64) -> str:
    """DuckDB oracle for fixed-point cosine pairs over ``embeddings``."""
    return f"""
WITH ev AS (
  SELECT vec_id, i,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {QUANT:.1f}) AS BIGINT) AS q
  FROM embeddings, range(1, {dims + 1}) t(i)
),
nrm AS (
  SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS n2 FROM ev GROUP BY vec_id
),
dot AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(SUM(a.q * b.q) AS BIGINT) AS d
  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
cosv AS (
  SELECT vec_a, vec_b,
         CAST(FLOOR(CAST(d AS DOUBLE)
              / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
              * {COS_SCALE:.1f}) AS BIGINT) AS cosine_x1e6
  FROM dot
  JOIN nrm na ON dot.vec_a = na.vec_id
  JOIN nrm nb ON dot.vec_b = nb.vec_id
)
SELECT vec_a, vec_b, cosine_x1e6
FROM cosv WHERE cosine_x1e6 >= {threshold_x1e6}
ORDER BY vec_a, vec_b
"""
