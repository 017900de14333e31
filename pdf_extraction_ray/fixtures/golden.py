"""Pure-python golden extractor — the serial reference implementation of
the extraction spec (``pdf_extraction_ray.spec``). One document at a time,
plain dicts, no Ray. Golden fixtures = this extractor over the synthetic
corpus; the Ray pipeline must match its ``(kind, text, media_ref, offset)``
span sequence per document exactly (the north rule).

Processing order (the spec, in prose):

1. Strip: drop ``boilerplate`` spans, text spans with
   link_density >= 0.5, and whitespace-only text spans.
2. Per-page median font over the *kept* text spans.
3. Image spans -> ``figure`` spans; text = deterministic stub OCR of the
   media_ref (advanced_layout_extractor.py:360-386 semantics).
4. Region candidates: per-page greedy IoU dedup (first-wins, 0.5), then
   vector-grid analysis + caption-evidence classification -> synthesized
   ``table``/``figure`` spans at the region's reading-order offset.
5. Kept text spans near a kept region that contain a caption keyword ->
   ``caption``; remaining text spans -> title / list / paragraph by the
   markdown + font-median rules.
6. Emit spans sorted by offset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import spec
from ..schema import OUT_SCHEMA


def golden_extract_doc(doc: dict) -> list[dict]:
    """Extract one DOCS_SCHEMA row (python dict) -> ordered output spans."""
    spans = doc["spans"]
    fonts = doc["font_size"]
    pages = doc["page"]
    links = doc["link_density"]
    bboxes = doc["bbox"]
    doc_id = doc["doc_id"]

    def _num(v):
        """null/NaN numeric -> 0 (the spec's null policy; NaN != NaN)."""
        return 0.0 if v is None or v != v else v

    def _bb(b):
        return [_num(v) for v in b] if b is not None else [0.0] * 4

    # 1. strip + normalize (null policy: null text/kind -> "", null/NaN
    # numerics -> 0, null lists -> empty)
    spans = spans or []
    kept = []  # (pos, kind, stripped_text, media_ref, offset, font, page, bbox)
    for pos, s in enumerate(spans):
        kind = s["kind"] or ""
        link = _num(links[pos])
        font = _num(fonts[pos])
        page = pages[pos] or 0
        if kind == spec.KIND_BOILER:
            continue
        if kind == spec.KIND_TEXT:
            stripped = (s["text"] or "").strip()
            if stripped == "" or link >= spec.BOILER_LINK_DENSITY:
                continue
            kept.append((pos, kind, stripped, s["media_ref"] or "",
                         s["offset"] or 0, font, page, _bb(bboxes[pos])))
        elif kind == spec.KIND_IMAGE:
            kept.append((pos, kind, s["text"] or "", s["media_ref"] or "",
                         s["offset"] or 0, font, page, _bb(bboxes[pos])))

    # 2. per-page median font over kept text spans
    page_fonts: dict[int, list[float]] = {}
    for (_, kind, _, _, _, font, page, _) in kept:
        if kind == spec.KIND_TEXT:
            page_fonts.setdefault(page, []).append(font)
    page_median = {p: float(np.median(np.asarray(fs, dtype=np.float64)))
                   for p, fs in page_fonts.items()}

    # 4. regions: per-page first-wins IoU dedup, then grid + evidence classify
    out_regions = []            # (kind, text, media_ref, offset)
    kept_region_bboxes: dict[int, list] = {}
    by_page: dict[int, list[dict]] = {}
    for r in doc["regions"]:
        by_page.setdefault(r["page"], []).append(r)
    for page, cands in by_page.items():
        kept_idx = spec.dedup_boxes_iou([r["bbox"] for r in cands])

        def near_texts(part_bbox, _page=page):
            return [text for (_, kind, text, _, _, _, sp, bb) in kept
                    if kind == spec.KIND_TEXT and sp == _page
                    and spec.caption_near(bb, part_bbox)]

        def caption_for(part_bbox):
            return spec.caption_evidence(near_texts(part_bbox))

        for ridx in kept_idx:       # ridx = per-page pre-dedup candidate index
            r = cands[ridx]
            for part in spec.emit_region_spans(
                    doc_id, page, ridx, r["bbox"],
                    [(ln["x0"], ln["y0"], ln["x1"], ln["y1"])
                     for ln in r["lines"]],
                    r["offset"], caption_for):
                out_regions.append((part["kind"], part["text"],
                                    part["media_ref"], part["offset"]))
                kept_region_bboxes.setdefault(page, []).append(part["bbox"])

    # 3 + 5. span kinds
    out = []
    for (_, kind, text, media_ref, offset, font, page, bb) in kept:
        if kind == spec.KIND_IMAGE:
            out.append((spec.OUT_FIGURE, spec.stub_ocr(media_ref), media_ref, offset))
            continue
        near_kept_region = any(
            spec.caption_near(bb, rb) for rb in kept_region_bboxes.get(page, []))
        if near_kept_region and spec.CAPTION_ANY_RE.search(text):
            out.append((spec.OUT_CAPTION, text, media_ref, offset))
        else:
            out.append((spec.classify_text_kind(text, font, page_median.get(page, 0.0)),
                        text, media_ref, offset))

    out.extend(out_regions)
    out.sort(key=lambda t: t[3])
    return [{"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in out]


def golden_extract_table(docs: pa.Table) -> pa.Table:
    """Golden extraction over a whole DOCS_SCHEMA table -> OUT_SCHEMA."""
    rows = [{"doc_id": d["doc_id"], "spans": golden_extract_doc(d)}
            for d in docs.to_pylist()]
    return pa.Table.from_pylist(rows, schema=OUT_SCHEMA)
