"""Hierarchy builder — parent/child structure over extracted spans
(rebuild of the reference's LayoutElement hierarchy fields
``hierarchy_level`` / ``parent_id`` / ``children_ids``
(advanced_layout_extractor.py:65-79) whose builder was left a stub
(ALE:137-164): here the semantics are pinned and implemented).

Rule (doc-local, vectorized): spans in offset order; ``title`` spans are
level 1 with no parent; every other span is level 2 with parent = the
nearest preceding title span's offset (-1 when none precedes)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import spec
from ..functions.arrow_utils import as_array, list_offsets


def hierarchy_batch(batch: pa.Table) -> pa.Table:
    """OUT_SCHEMA rows -> (doc_id, offset, kind, hierarchy_level,
    parent_offset) one row per span."""
    batch = batch.combine_chunks()
    spans = batch.column("spans")
    offsets = list_offsets(spans)
    flat = as_array(pc.list_flatten(spans))
    kind = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
    off = as_array(pc.fill_null(pc.struct_field(flat, "offset"), 0)) \
        .to_numpy(zero_copy_only=False).astype(np.int64)   # null -> 0 policy
    parent_doc = as_array(pc.list_parent_indices(spans)) \
        .to_numpy(zero_copy_only=False)

    n = len(kind)
    is_title = kind == spec.OUT_TITLE
    # forward-fill the latest title offset, reset per doc
    title_off = np.where(is_title, off, -1)
    idx = np.arange(n)
    # last index at-or-before i that is a title in the same doc
    marker = np.where(is_title, idx, -1)
    ff = np.maximum.accumulate(marker)
    doc_start = np.zeros(n, dtype=np.int64)
    if n:
        starts = offsets[:-1]
        doc_start = np.repeat(starts, np.diff(offsets))
    valid = ff >= doc_start                     # title is within this doc
    parent = np.where(valid & ~is_title, title_off[np.maximum(ff, 0)], -1)
    # a title's "preceding title" is itself -> no parent
    parent[is_title] = -1
    level = np.where(is_title, 1, 2).astype(np.int32)

    doc_id = pc.take(batch.column("doc_id"), pa.array(parent_doc))
    return pa.Table.from_arrays(
        [as_array(doc_id),
         pa.array(off.astype(np.int32)),
         pa.array(kind.astype(object), type=pa.string()),
         pa.array(level),
         pa.array(parent.astype(np.int32))],
        names=["doc_id", "offset", "kind", "hierarchy_level", "parent_offset"])
