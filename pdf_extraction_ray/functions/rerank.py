"""Deterministic second-stage reranker stand-in (the cross-encoder slot
in a two-stage retrieval pipeline). A real reranker is a model forward
pass per (query, candidate) pair; the sandbox stand-in scores lexical
overlap — exact, integer-scaled, order-independent — so the Ray-side
plumbing (candidate pool -> per-pair scoring -> re-ordered context) is
real and testable. Reference analog: the hybrid processor's second-pass
validation of first-pass candidates (hybrid_docling_gpt4_processor.py's
detect-then-validate flow), applied to the RAG retrieval stage
(complete_multimodal_rag_evaluation.py:199-260's single-stage top-k)."""

from __future__ import annotations


def rerank_score_x1e6(query: str, text: str) -> int:
    """Integer-scaled overlap score: |query_tokens ∩ text_tokens| /
    |query_tokens|, x1e6. Tokenization is lowercase whitespace split —
    the same convention as the corpus operators."""
    q = set((query or "").lower().split())
    if not q:
        return 0
    t = set((text or "").lower().split())
    return (1_000_000 * len(q & t)) // len(q)
