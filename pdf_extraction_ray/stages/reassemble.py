"""Stage C — span reassembly: ordered (kind, text, media_ref, offset) emission.

Stateless vectorized ``map_batches`` task. Order is data, not layout
(SURVEY.md §2.7 O1): spans carry ``offset``; this stage sorts doc-locally
by ``(doc, offset)`` with one numpy lexsort over the whole batch, so
shuffled input span order and late-synthesized region spans land in
reading order. All string movement stays in Arrow (``pc.take``); no
python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrow_utils import as_array
from ..schema import OUT_SCHEMA, SPAN_STRUCT


def reassemble_spans(batch: pa.Table) -> pa.Table:
    batch = batch.combine_chunks()
    spans = batch.column("spans")
    n_docs = len(spans)

    flat = as_array(pc.list_flatten(spans))
    parent = as_array(pc.list_parent_indices(spans)).to_numpy(zero_copy_only=False)
    keep = as_array(pc.list_flatten(batch.column("keep"))) \
        .to_numpy(zero_copy_only=False)
    kept_idx = pa.array(np.nonzero(keep)[0])

    cls = as_array(pc.take(as_array(pc.list_flatten(batch.column("cls"))), kept_idx))
    text = as_array(pc.take(as_array(pc.list_flatten(batch.column("out_text"))), kept_idx))
    media = as_array(pc.take(
        pc.fill_null(pc.struct_field(flat, "media_ref"), ""), kept_idx))
    # null policy: null offset -> 0 (matches golden's `offset or 0`)
    off = as_array(pc.fill_null(pc.struct_field(flat, "offset"), 0)) \
        .to_numpy(zero_copy_only=False)[np.asarray(kept_idx)]
    doc = parent[np.asarray(kept_idx)]

    rspans = batch.column("region_spans")
    rflat = as_array(pc.list_flatten(rspans))
    rparent = as_array(pc.list_parent_indices(rspans)).to_numpy(zero_copy_only=False)
    roff = pc.struct_field(rflat, "offset").to_numpy(zero_copy_only=False)

    all_doc = np.concatenate([doc, rparent])
    all_off = np.concatenate([off, roff]).astype(np.int64)
    all_kind = pa.concat_arrays([cls, as_array(pc.struct_field(rflat, "kind"))])
    all_text = pa.concat_arrays([text, as_array(pc.struct_field(rflat, "text"))])
    all_media = pa.concat_arrays([media, as_array(pc.struct_field(rflat, "media_ref"))])

    order = np.lexsort((all_off, all_doc))
    take = pa.array(order)
    struct = pa.StructArray.from_arrays(
        [pc.take(all_kind, take),
         pc.take(all_text, take),
         pc.take(all_media, take),
         pa.array(all_off[order], type=pa.int32())],
        fields=list(SPAN_STRUCT))

    counts = np.bincount(all_doc, minlength=n_docs)
    out_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offsets[1:])
    span_col = pa.ListArray.from_arrays(pa.array(out_offsets, type=pa.int32()), struct)

    return pa.Table.from_arrays([batch.column("doc_id"), span_col],
                                schema=OUT_SCHEMA)
