"""Byte-trigram language model: vectorized training counts and
per-document negative-log-likelihood scoring.

The quality-filtering stage of a web-scale training-data pipeline
scores documents with a small LM trained on a reference corpus (the
CCNet / KenLM recipe); this is that operator with the model reduced to
an add-one-smoothed byte-trigram model so it stays dependency-free and
deterministic. Everything is numpy over the raw utf-8 bytes — no
per-row Python in either stage:

- ``trigram_codes``: one big byte buffer (documents joined by a
  sentinel), 24-bit trigram codes via three shifted views, windows that
  cross a document boundary masked out, plus the owning doc index per
  window.
- scoring: vocab lookup by ``searchsorted`` on the sorted code table,
  per-doc mean of log2 probabilities via one grouped sum.

Reference analog: the reference scores documents with remote model
calls (hybrid_docling_gpt4_processor.py); the train-on-corpus +
broadcast + score shape here is the distributed form of that stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SEP = 0            # never a valid utf-8 text byte in these corpora


def trigram_codes(text: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(codes, doc_idx): 24-bit byte-trigram codes of every in-document
    window, and the document ordinal owning each window. Lowercases
    first so the model is case-insensitive."""
    import pyarrow.compute as pc
    lowered = pc.utf8_lower(text)
    n = len(lowered)
    if n == 0:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
    joined = ("\x00".join((s or "").replace("\x00", " ")
                          for s in lowered.to_pylist())).encode("utf-8")
    buf = np.frombuffer(joined, dtype=np.uint8)
    if len(buf) < 3:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64))
    a, b, c = buf[:-2], buf[1:-1], buf[2:]
    codes = (a.astype(np.int64) << 16) | (b.astype(np.int64) << 8) \
        | c.astype(np.int64)
    valid = (a != _SEP) & (b != _SEP) & (c != _SEP)
    # document ordinal of each window = separators seen before it
    doc_idx = np.cumsum(buf == _SEP)[:-2].astype(np.int64)
    return codes[valid], doc_idx[valid]


def count_trigrams(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(unique codes, counts) — one batch's training partial."""
    return np.unique(codes, return_counts=True)


def top_k_vocab(codes: np.ndarray, counts: np.ndarray,
                k: int) -> tuple[np.ndarray, np.ndarray]:
    """Keep the k most frequent trigrams (ties broken by code, so the
    model is deterministic). Bounds the broadcast model size no matter
    how large the corpus charset is."""
    if len(codes) <= k:
        order = np.argsort(codes)
        return codes[order], counts[order]
    sel = np.lexsort((codes, -counts))[:k]
    keep = np.sort(codes[sel])
    order = np.argsort(codes)
    pos = np.searchsorted(codes[order], keep)
    return keep, counts[order][pos]


def nll_partials(codes: np.ndarray, doc_idx: np.ndarray, n_docs: int,
                 vocab: np.ndarray, vocab_counts: np.ndarray,
                 total: int, v_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-document (sum of -log2 p, window count) under the add-one
    smoothed model. Unknown trigrams get the floor probability
    1 / (total + v_size)."""
    denom = float(total + v_size)
    if len(codes):
        if len(vocab):
            pos = np.minimum(np.searchsorted(vocab, codes),
                             len(vocab) - 1)
            cnt = np.where(vocab[pos] == codes, vocab_counts[pos], 0)
        else:
            cnt = np.zeros(len(codes), dtype=np.int64)
        nll = -np.log2((cnt + 1.0) / denom)
        sums = np.bincount(doc_idx, weights=nll, minlength=n_docs)
        ns = np.bincount(doc_idx, minlength=n_docs)
    else:
        sums = np.zeros(n_docs)
        ns = np.zeros(n_docs, dtype=np.int64)
    return sums, ns.astype(np.int64)
