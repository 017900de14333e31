"""Fixed Arrow schemas — the contract between pipeline stages.

The reference uses dynamic duck-typed dicts with defensive probing
(hybrid_docling_gpt4_processor.py:203-249); here every stage declares its
schema up front (SURVEY.md §1.3-1.4). The input/output span layout is
exactly the driver's ``input_hint``:

    (doc_id: string,
     spans: list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>)

Auxiliary input-only columns (pruned before output) carry the block
metadata the reference reads from PyMuPDF/pdfplumber: per-span font size,
1-based page, normalized bbox, link density, plus per-region vector
geometry (pdf_vector_utils.py:18-107 analog).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

LINE_STRUCT = pa.struct([
    ("x0", pa.float32()),
    ("y0", pa.float32()),
    ("x1", pa.float32()),
    ("y1", pa.float32()),
])

REGION_STRUCT = pa.struct([
    ("page", pa.int32()),
    ("offset", pa.int32()),            # reading-order slot of the region span
    ("bbox", pa.list_(pa.float32(), 4)),
    ("lines", pa.list_(LINE_STRUCT)),
])

# Input table: one row per document. Parallel list columns (same length as
# ``spans``) instead of a struct-of-lists so each can flatten zero-copy.
DOCS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
    ("font_size", pa.list_(pa.float32())),
    ("page", pa.list_(pa.int32())),            # 1-based, clamped >= 1
    ("link_density", pa.list_(pa.float32())),
    ("bbox", pa.list_(pa.list_(pa.float32(), 4))),
    ("regions", pa.list_(REGION_STRUCT)),
    ("n_pages", pa.int32()),
])

# Output table: the golden-equality surface.
OUT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])
