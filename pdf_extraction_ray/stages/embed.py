"""Deterministic text embedder — actor-pool stand-in for the reference's
e5-large / CLIP embedding stage (T6 in SURVEY.md §2.4; complete_multimodal_
rag_evaluation.py:188-196). "Model load" in ``__init__`` builds a fixed
seeded projection table once per actor; ``__call__`` embeds batches
vectorized (token hashes -> rows of the projection table -> mean-pooled,
L2-normalized). Swap the class for a real model actor without touching
the pipeline: same signature, same output schema (list<float32>).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrow_utils import as_array
from ..functions.hashing import hash_strings

EMBED_DIM = 64
_VOCAB_BUCKETS = 4096


class HashEmbedder:
    def __init__(self, dim: int = EMBED_DIM, text_col: str = "chunk_text"):
        # once-per-actor "model load": the seeded projection table
        rng = np.random.default_rng(0xE3BED)
        self.proj = rng.standard_normal((_VOCAB_BUCKETS, dim)).astype(np.float64)
        self.dim = dim
        self.text_col = text_col

    def embed(self, texts: pa.Array) -> np.ndarray:
        toks = as_array(pc.split_pattern_regex(
            pc.utf8_lower(pc.utf8_trim_whitespace(pc.fill_null(texts, ""))),
            r"\s+"))
        flat = as_array(pc.list_flatten(toks))
        parent = as_array(pc.list_parent_indices(toks)) \
            .to_numpy(zero_copy_only=False)
        # drop empty tokens (from ""/whitespace docs) — otherwise every
        # degenerate text embeds to the same unit vector and junk chunks
        # score cosine 1.0 against each other; empty text -> zero vector
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        if len(flat):
            rows = self.proj[hash_strings(flat) % _VOCAB_BUCKETS]
            np.add.at(out, parent, rows)
        norms = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        return out / norms

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        texts = as_array(col.combine_chunks()
                         if isinstance(col, pa.ChunkedArray) else col)
        emb = self.embed(texts).astype(np.float32)
        emb_col = pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1)), self.dim)
        return batch.append_column("embedding", emb_col)
