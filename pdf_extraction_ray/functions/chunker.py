"""Recursive character chunker — re-specification of the reference's
RecursiveCharacterTextSplitter usage (complete_multimodal_rag_evaluation.py:
33-48): chunk_size=1200, overlap=200, markdown-header-priority separators.

Pure deterministic function; used via ``flat_map``-style ``map_batches``
(one doc -> N chunk rows).
"""

from __future__ import annotations

from ..spec import CHUNK_OVERLAP, CHUNK_SEPARATORS, CHUNK_SIZE


def _split_recursive(text: str, separators: list[str],
                     chunk_size: int = CHUNK_SIZE) -> list[str]:
    """Split on the first separator present; recurse into oversize pieces."""
    if len(text) <= chunk_size:
        return [text] if text else []
    for i, sep in enumerate(separators):
        if sep == "":
            # hard split
            return [text[j:j + chunk_size] for j in range(0, len(text), chunk_size)]
        if sep in text:
            parts = text.split(sep)
            # re-attach separator prefix to all but the first piece so no
            # characters are lost (header-priority separators start with \n)
            pieces = [parts[0]] + [sep + p for p in parts[1:]]
            out: list[str] = []
            for p in pieces:
                if len(p) > chunk_size:
                    out.extend(_split_recursive(p, separators[i + 1:],
                                                chunk_size))
                else:
                    out.append(p)
            return [p for p in out if p]
    return [text]


def chunk_text(text: str, chunk_size: int = CHUNK_SIZE,
               overlap: int = CHUNK_OVERLAP) -> list[str]:
    """Merge recursive splits into chunks <= chunk_size with ~overlap
    characters of tail carried between consecutive chunks."""
    pieces = _split_recursive(text, CHUNK_SEPARATORS, chunk_size)
    chunks: list[str] = []
    cur = ""
    for p in pieces:
        if cur and len(cur) + len(p) > chunk_size:
            chunks.append(cur)
            cur = cur[-overlap:] if overlap else ""
        cur += p
    if cur:
        chunks.append(cur)
    return chunks
