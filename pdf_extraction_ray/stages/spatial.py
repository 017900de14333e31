"""Spatial-relationship analysis (J2 in SURVEY.md §2.5) — doc-local
pairwise relations among a page's kept spans, re-specified from
advanced_layout_extractor.py:471-538:

For each ordered pair (i, j), i < j, on the same page:
- containment first: bbox_i fully contains bbox_j -> "contains";
  bbox_j contains bbox_i -> "contained_by"
- else vertical: |cx_i - cx_j| < 0.1 (page fraction; the contract pinned
  explicitly — all bboxes normalized [0,1], fixing the reference's
  implicit assumption, SURVEY.md §2.12) -> "above" if cy_i < cy_j else
  "below"
- else horizontal: |cy_i - cy_j| < 0.1 -> "left_of" if cx_i < cx_j else
  "right_of"
- else no relation.

Never a shuffle: pages are doc-local and small; the O(n^2) pair space is
enumerated vectorized per page with numpy broadcasting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrow_utils import as_array, list_offsets

CENTER_TOL = 0.1

_REL_NAMES = np.array(["", "contains", "contained_by", "above", "below",
                       "left_of", "right_of"])


def page_relations(bboxes: np.ndarray) -> list[tuple[int, int, str]]:
    """Relations among one page's elements; bboxes (n, 4) normalized."""
    n = len(bboxes)
    if n < 2:
        return []
    x0, y0, x1, y1 = bboxes[:, 0], bboxes[:, 1], bboxes[:, 2], bboxes[:, 3]
    cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0

    contains = ((x0[:, None] <= x0[None, :]) & (y0[:, None] <= y0[None, :])
                & (x1[:, None] >= x1[None, :]) & (y1[:, None] >= y1[None, :]))
    dx = np.abs(cx[:, None] - cx[None, :])
    dy = np.abs(cy[:, None] - cy[None, :])

    rel = np.zeros((n, n), dtype=np.int8)
    vert = (dx < CENTER_TOL)
    horiz = ~vert & (dy < CENTER_TOL)
    rel[vert & (cy[:, None] < cy[None, :])] = 3    # above
    rel[vert & (cy[:, None] >= cy[None, :])] = 4   # below
    rel[horiz & (cx[:, None] < cx[None, :])] = 5   # left_of
    rel[horiz & (cx[:, None] >= cx[None, :])] = 6  # right_of
    rel[contains.T] = 2
    rel[contains] = 1    # containment wins; "contains" beats "contained_by"
                         # on identical boxes (reference checks it first)

    iu, ju = np.triu_indices(n, k=1)
    keep = rel[iu, ju] != 0
    return [(int(i), int(j), _REL_NAMES[rel[i, j]])
            for i, j in zip(iu[keep], ju[keep])]


def spatial_relations_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, spans+meta) -> one row per (page, i, j, relation).
    Operates on kept spans only (post boilerplate strip)."""
    batch = batch.combine_chunks()
    spans = batch.column("spans")
    offsets = list_offsets(spans)
    keep = as_array(pc.list_flatten(batch.column("keep"))) \
        .to_numpy(zero_copy_only=False)
    page = as_array(pc.list_flatten(batch.column("page"))) \
        .to_numpy(zero_copy_only=False)
    bbox_nested = as_array(pc.list_flatten(batch.column("bbox")))
    # .values keeps null fixed-size-list slots aligned (flatten drops them)
    bb = np.nan_to_num(bbox_nested.values.to_numpy(zero_copy_only=False).astype(np.float64),
                       nan=0.0).reshape(-1, 4) \
        if len(bbox_nested) else np.zeros((0, 4))
    doc_ids = batch.column("doc_id").to_pylist()

    rows = {"doc_id": [], "page": [], "elem_i": [], "elem_j": [],
            "relation": []}
    for d in range(len(doc_ids)):
        lo, hi = offsets[d], offsets[d + 1]
        k = keep[lo:hi]
        pg = page[lo:hi]
        for p in np.unique(pg[k]):
            idx = np.nonzero(k & (pg == p))[0]
            for (i, j, r) in page_relations(bb[lo + idx]):
                rows["doc_id"].append(doc_ids[d])
                rows["page"].append(int(p))
                rows["elem_i"].append(int(idx[i]))
                rows["elem_j"].append(int(idx[j]))
                rows["relation"].append(r)

    return pa.Table.from_arrays(
        [pa.array(rows["doc_id"], type=pa.string()),
         pa.array(rows["page"], type=pa.int32()),
         pa.array(rows["elem_i"], type=pa.int32()),
         pa.array(rows["elem_j"], type=pa.int32()),
         pa.array(rows["relation"], type=pa.string())],
        names=["doc_id", "page", "elem_i", "elem_j", "relation"])
