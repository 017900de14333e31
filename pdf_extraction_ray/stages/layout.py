"""Stage B — layout parse: a stateful stage (actor pool or task pool).

Callable class usable as ``map_batches(LayoutParser, concurrency=N)``:
parser/OCR state (compiled patterns, the stub OCR "engine", classifier
weights) is built once per actor in ``__init__`` (T1-T4 in SURVEY.md
§2.4), batches flow through ``__call__``. In production this actor holds
real model state (Docling converter / Tesseract / layout weights); here
the deterministic stand-ins keep fixtures reproducible while exercising
identical actor-pool mechanics. ``layout_parse`` is the task-pool form
with per-worker-process cached state (default — see pipelines.extract).

Per document (all state doc-local — never a shuffle):
- stub OCR for image spans (advanced_layout_extractor.py:360-386)
- per-page greedy IoU dedup of vector-region candidates
  (advanced_layout_extractor.py:1073-1114)
- vector-grid analysis + caption-evidence table/figure classification
  (pdf_vector_utils.py:118-218; table_figure_classifier.py:15-24,244-251)
- caption assignment for kept text spans near kept regions
  (table_figure_classifier.py:155-192)

Hot-path shape: strings never round-trip through python object arrays —
sparse updates (OCR texts, caption kinds) apply via
``pc.replace_with_mask``; caption proximity is numpy-broadcast per page;
only region geometry (a handful of rows per doc) runs as python loops.

Adds ``region_spans`` (synthesized table/figure spans) and prunes the
heavy metadata columns so downstream batches stay narrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import spec
from ..functions.arrow_utils import as_array, list_offsets
from ..schema import SPAN_STRUCT


class LayoutParser:
    def __init__(self, classifier_weights: dict | None = None,
                 emit_provenance: bool = False):
        # once-per-actor setup: compiled patterns + "loaded" OCR engine
        self.caption_any = spec.CAPTION_ANY_RE
        self.weights = classifier_weights or spec.CLASSIFIER_WEIGHTS
        self.ocr = spec.stub_ocr
        # opt-in extended schema: a per-region "source" provenance column
        # (layout_validated / layout_detected, J1 merge tags) parallel to
        # region_spans; OFF by default so the hot path stays narrow
        self.emit_provenance = emit_provenance

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        spans = batch.column("spans")
        n_docs = len(spans)
        offsets = list_offsets(spans)

        flat = as_array(pc.list_flatten(spans))
        kind = pc.struct_field(flat, "kind")
        is_image = pc.equal(kind, spec.KIND_IMAGE)
        is_text_np = pc.equal(kind, spec.KIND_TEXT).to_numpy(zero_copy_only=False)
        keep_np = as_array(pc.list_flatten(batch.column("keep"))) \
            .to_numpy(zero_copy_only=False)
        kept_text_np = keep_np & is_text_np
        cls_arr = as_array(pc.list_flatten(batch.column("cls")))
        text_arr = as_array(pc.list_flatten(batch.column("out_text")))
        page_np = as_array(pc.fill_null(pc.list_flatten(batch.column("page")), 0)) \
            .to_numpy(zero_copy_only=False)
        bbox_nested = as_array(pc.list_flatten(batch.column("bbox")))
        if len(bbox_nested):
            # .values (not .flatten()): flatten DROPS null fixed-size-list
            # slots and silently misaligns every later span; .values keeps
            # one 4-slot block per entry, and NaN/null leaves become 0
            # (the spec's null policy, mirrored in golden)
            bbox_flat = np.nan_to_num(
                bbox_nested.values.to_numpy(zero_copy_only=False)
                .astype(np.float64), nan=0.0).reshape(-1, 4)
        else:
            bbox_flat = np.zeros((0, 4))
        if len(bbox_flat) != len(flat):
            raise ValueError(f"bbox column misaligned with spans: "
                             f"{len(bbox_flat)} != {len(flat)}")

        # ---- flat Arrow extraction of the regions column (no to_pylist:
        # the r2 verdict measured the per-doc dict scaffolding as the
        # layout stage's dominant cost) ----
        regs_col = as_array(batch.column("regions"))
        roff_doc = list_offsets(regs_col)
        n_regions = int(roff_doc[-1])
        img_mask = is_image.to_numpy(zero_copy_only=False)
        has_work = bool(img_mask.any()) or n_regions > 0

        # one C-level conversion to a python list (indexed access after is
        # cheap; object-array / per-element arrow access both lose to it)
        # — skipped entirely for batches with no images and no regions,
        # which then pass text through zero-copy
        text_list = text_arr.to_pylist() if has_work else None

        # OCR image spans: python only on image rows
        if img_mask.any():
            img_idx = np.nonzero(img_mask)[0]
            refs = pc.take(pc.fill_null(pc.struct_field(flat, "media_ref"), ""),
                           pa.array(img_idx)).to_pylist()
            for j, r in zip(img_idx, refs):
                text_list[j] = self.ocr(r)

        if n_regions:
            flat_regs = as_array(pc.list_flatten(regs_col))
            rbb_arr = as_array(pc.struct_field(flat_regs, "bbox"))
            rlines_col = as_array(pc.struct_field(flat_regs, "lines"))
            flat_lines = as_array(pc.list_flatten(rlines_col))
            # loud on malformed geometry (null region fields would silently
            # misalign the flat value buffers); safe mode converts the
            # raise into an error row, same policy as the meta columns
            if (flat_regs.null_count or rbb_arr.null_count
                    or rlines_col.null_count or flat_lines.null_count):
                raise ValueError("null region geometry")
            rpage_np = pc.struct_field(flat_regs, "page") \
                .to_numpy(zero_copy_only=False)
            roffv_np = pc.struct_field(flat_regs, "offset") \
                .to_numpy(zero_copy_only=False)
            rbb = rbb_arr.values.to_numpy(zero_copy_only=False) \
                .astype(np.float64).reshape(-1, 4)
            loff = list_offsets(rlines_col)
            lines_mat = np.column_stack([
                pc.struct_field(flat_lines, f).to_numpy(zero_copy_only=False)
                .astype(np.float64) for f in ("x0", "y0", "x1", "y1")]) \
                if len(flat_lines) else np.zeros((0, 4))
        doc_ids = batch.column("doc_id").to_pylist()
        region_counts = np.zeros(n_docs, dtype=np.int64)
        # parallel output columns (struct build at the end — one dict per
        # region span was measurably slower)
        rr_kind: list[str] = []
        rr_text: list[str] = []
        rr_ref: list[str] = []
        rr_off: list[int] = []
        prov_rows: list[str] = []            # parallel to region spans
        caption_idx: list[int] = []          # global span indices -> caption
        # per-span caption regex flags, computed lazily ONCE per span (the
        # old per-(part, near-span) re.search calls were ~25% of stage
        # time); plain python re — exact spec semantics, no RE2 twin
        flag_memo: dict[int, tuple[bool, bool]] = {}
        tbl_re, fig_re = spec.TABLE_CAPTION_RE, spec.FIGURE_CAPTION_RE

        def caption_flags(j: int) -> tuple[bool, bool]:
            v = flag_memo.get(j)
            if v is None:
                t = text_list[j]
                v = flag_memo[j] = (tbl_re.search(t) is not None,
                                    fig_re.search(t) is not None)
            return v

        for d in (np.nonzero(roff_doc[1:] > roff_doc[:-1])[0]
                  if n_regions else ()):
            lo, hi = offsets[d], offsets[d + 1]
            kept_text = kept_text_np[lo:hi]
            pg = page_np[lo:hi]

            g0 = int(roff_doc[d])
            bb_doc = rbb[g0:roff_doc[d + 1]].tolist()
            by_page: dict[int, list[int]] = {}       # page -> region rows
            for gi in range(g0, int(roff_doc[d + 1])):
                by_page.setdefault(int(rpage_np[gi]), []).append(gi)

            for page, cands in by_page.items():
                kept_idx = spec.dedup_boxes_iou(
                    [bb_doc[gi - g0] for gi in cands])
                pidx = np.nonzero(kept_text & (pg == page))[0]
                pbb = bbox_flat[lo + pidx] if len(pidx) else np.zeros((0, 4))
                near_any = np.zeros(len(pidx), dtype=bool)

                def near_mask(part_bbox):
                    # exact caption_near semantics, broadcast: horizontal
                    # overlap > 0 AND (within margin above / within margin
                    # below / vertical overlap)
                    rx0, ry0, rx1, ry1 = part_bbox
                    if not len(pidx):
                        return near_any
                    ov = (np.minimum(pbb[:, 2], rx1)
                          - np.maximum(pbb[:, 0], rx0)) > 0.0
                    above = pbb[:, 3] <= ry0
                    below = pbb[:, 1] >= ry1
                    return ov & (
                        (above & ((ry0 - pbb[:, 3]) <= spec.CAPTION_MARGIN))
                        | (~above & below
                           & ((pbb[:, 1] - ry1) <= spec.CAPTION_MARGIN))
                        | (~above & ~below))

                def caption_for(part_bbox):
                    # caption_evidence over the proximate spans, computed
                    # from the memoized flags (TABLE/FIGURE imply ANY, so
                    # two flags carry the full evidence state)
                    nonlocal near_any
                    near = near_mask(part_bbox)
                    near_any = near_any | near
                    if not near.any():
                        return 0.5
                    t_hits = f_hits = 0
                    for j in lo + pidx[near]:
                        t, f = caption_flags(int(j))
                        t_hits += t
                        f_hits += f
                    if t_hits > f_hits:
                        return 1.0
                    if f_hits > t_hits:
                        return 0.0
                    return 0.5

                for ridx in kept_idx:
                    gi = cands[ridx]
                    # one C-level .tolist() per region: spec kernels run
                    # ~5x faster on python floats than np.float64 scalars
                    parts = spec.emit_region_spans(
                        doc_ids[d], page, ridx, bb_doc[gi - g0],
                        lines_mat[loff[gi]:loff[gi + 1]].tolist(),
                        int(roffv_np[gi]), caption_for)
                    for part in parts:
                        rr_kind.append(part["kind"])
                        rr_text.append(part["text"])
                        rr_ref.append(part["media_ref"])
                        rr_off.append(int(part["offset"]))
                        if self.emit_provenance:
                            prov_rows.append(part["source"])
                    region_counts[d] += len(parts)
                for j in lo + pidx[near_any]:
                    t, f = caption_flags(int(j))
                    if t or f:                 # == CAPTION_ANY_RE.search
                        caption_idx.append(int(j))

        if caption_idx:
            cap_mask = np.zeros(len(flat), dtype=bool)
            cap_mask[caption_idx] = True
            cls_arr = pc.replace_with_mask(
                cls_arr, pa.array(cap_mask),
                pa.array([spec.OUT_CAPTION] * len(caption_idx)))

        off32 = pa.array(offsets, type=pa.int32())
        roff = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(region_counts, out=roff[1:])
        region_col = pa.ListArray.from_arrays(
            pa.array(roff, type=pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array(rr_kind, type=pa.string()),
                 pa.array(rr_text, type=pa.string()),
                 pa.array(rr_ref, type=pa.string()),
                 pa.array(rr_off, type=pa.int32())],
                fields=list(SPAN_STRUCT)))

        out_text = pa.array(text_list, type=pa.string()) \
            if text_list is not None else text_arr
        # `page` rides along for page-granular consumers (per-page
        # describer); reassemble ignores it
        out = batch.select(["doc_id", "spans", "keep", "page"])
        out = out.append_column("cls", pa.ListArray.from_arrays(off32, cls_arr))
        out = out.append_column(
            "out_text", pa.ListArray.from_arrays(off32, out_text))
        out = out.append_column("region_spans", region_col)
        if self.emit_provenance:
            out = out.append_column(
                "region_prov",
                pa.ListArray.from_arrays(pa.array(roff, type=pa.int32()),
                                         pa.array(prov_rows,
                                                  type=pa.string())))
        return out


_TASK_PARSER: LayoutParser | None = None


def layout_parse(batch: pa.Table) -> pa.Table:
    """Task-pool form of the layout stage: parser state is built once per
    worker process (module-level cache) and reused across tasks — the same
    once-per-worker amortization as the actor pool, but scheduled as
    elastic tasks, which lets Ray fuse classify -> layout -> reassemble ->
    write into one zero-transfer task stage (measured ~2x faster and
    better-scaling than the actor pool for this light state; keep the
    ``LayoutParser`` actor-pool mode for heavy model state where bounded
    concurrency / restart semantics matter)."""
    global _TASK_PARSER
    if _TASK_PARSER is None:
        _TASK_PARSER = LayoutParser()
    return _TASK_PARSER(batch)
