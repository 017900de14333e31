"""Stage B — layout parse: a stateful actor-pool stage.

Callable class passed to ``map_batches(LayoutParser, concurrency=N)``:
parser/OCR state (compiled patterns, the stub OCR "engine", classifier
weights) is built once per actor in ``__init__`` (T1-T4 in SURVEY.md
§2.4), batches flow through ``__call__``. In production this actor holds
real model state (Docling converter / Tesseract / layout weights); here
the deterministic stand-ins keep fixtures reproducible while exercising
identical actor-pool mechanics.

Per document (all state doc-local — never a shuffle):
- stub OCR for image spans (advanced_layout_extractor.py:360-386)
- per-page greedy IoU dedup of vector-region candidates
  (advanced_layout_extractor.py:1073-1114)
- vector-grid analysis + caption-evidence table/figure classification
  (pdf_vector_utils.py:118-218; table_figure_classifier.py:15-24,244-251)
- caption assignment for kept text spans near kept regions
  (table_figure_classifier.py:155-192)

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
    def __init__(self, classifier_weights: dict | None = None):
        # once-per-actor setup: compiled patterns + "loaded" OCR engine
        self.caption_any = spec.CAPTION_ANY_RE
        self.weights = classifier_weights or spec.CLASSIFIER_WEIGHTS
        self.ocr = spec.stub_ocr

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        spans = batch.column("spans")
        n_docs = len(spans)
        offsets = list_offsets(spans)

        flat = as_array(pc.list_flatten(spans))
        kind_flat = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
        media_flat = pc.struct_field(flat, "media_ref").to_numpy(zero_copy_only=False)
        keep_flat = as_array(pc.list_flatten(batch.column("keep"))) \
            .to_numpy(zero_copy_only=False)
        cls_flat = as_array(pc.list_flatten(batch.column("cls"))) \
            .to_numpy(zero_copy_only=False).astype(object)
        text_flat = as_array(pc.list_flatten(batch.column("out_text"))) \
            .to_numpy(zero_copy_only=False).astype(object)
        page_flat = as_array(pc.list_flatten(batch.column("page"))) \
            .to_numpy(zero_copy_only=False)
        bbox_nested = as_array(pc.list_flatten(batch.column("bbox")))
        bbox_flat = np.asarray(bbox_nested.flatten(), dtype=np.float64) \
            .reshape(-1, 4) if len(bbox_nested) else np.zeros((0, 4))

        # OCR image spans (loop touches only image spans)
        for j in np.nonzero(kind_flat == spec.KIND_IMAGE)[0]:
            text_flat[j] = self.ocr(media_flat[j])

        regions_py = batch.column("regions").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        region_counts = np.zeros(n_docs, dtype=np.int64)
        region_rows: list[dict] = []

        for d in range(n_docs):
            regs = regions_py[d]
            if not regs:
                continue
            lo, hi = offsets[d], offsets[d + 1]
            k = keep_flat[lo:hi]
            pg = page_flat[lo:hi]
            kd = kind_flat[lo:hi]
            kept_text = k & (kd == spec.KIND_TEXT)

            by_page: dict[int, list[dict]] = {}
            for r in regs:
                by_page.setdefault(r["page"], []).append(r)

            for page, cands in by_page.items():
                kept_idx = spec.dedup_boxes_iou([r["bbox"] for r in cands])
                pidx = np.nonzero(kept_text & (pg == page))[0]
                kept_bboxes = []
                for ridx in kept_idx:
                    r = cands[ridx]
                    grid = spec.analyze_grid(
                        [(ln["x0"], ln["y0"], ln["x1"], ln["y1"])
                         for ln in r["lines"]])
                    near = [int(j) for j in pidx
                            if spec.caption_near(bbox_flat[lo + j], r["bbox"])]
                    cap = spec.caption_evidence([text_flat[lo + j] for j in near])
                    rkind, _ = spec.classify_region(grid, cap)
                    region_rows.append({
                        "kind": rkind,
                        "text": spec.region_span_text(rkind, grid),
                        "media_ref": spec.region_media_ref(doc_ids[d], page, ridx),
                        "offset": r["offset"],
                    })
                    region_counts[d] += 1
                    kept_bboxes.append(r["bbox"])
                # caption override: near any kept region + caption keyword
                for j in pidx:
                    if self.caption_any.search(text_flat[lo + j]) and any(
                            spec.caption_near(bbox_flat[lo + j], rb)
                            for rb in kept_bboxes):
                        cls_flat[lo + j] = spec.OUT_CAPTION

        off32 = pa.array(offsets, type=pa.int32())
        roff = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(region_counts, out=roff[1:])
        region_col = pa.ListArray.from_arrays(
            pa.array(roff, type=pa.int32()),
            pa.array(region_rows, type=SPAN_STRUCT))

        out = batch.select(["doc_id", "spans", "keep"])
        out = out.append_column(
            "cls", pa.ListArray.from_arrays(off32, pa.array(cls_flat, type=pa.string())))
        out = out.append_column(
            "out_text", pa.ListArray.from_arrays(off32, pa.array(text_flat, type=pa.string())))
        return out.append_column("region_spans", region_col)


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
