"""Extraction-semantics spec: the single source of truth for every
normalization / classification choice, shared by the pure-python golden
extractor (``fixtures.golden``) and the Ray pipeline stages.

Semantics are re-specified from the reference (GoldSurfer2/pdf-extraction):

- title rule:   span font >= 1.2 x per-page median font
                (advanced_layout_extractor.py:343-349)
- boilerplate:  link-density >= 0.5 strip (north-star readability /
                trafilatura-style heuristic; analog of the reference's
                keyword scoring advanced_layout_extractor.py:868-894)
- grid table test: >= 4 line intersections AND grid regularity > 0.5
                (pdf_vector_utils.py:118-218)
- evidence classifier: weighted features, threshold 0.8
                (table_figure_classifier.py:15-24, 244-251)
- caption proximity: horizontal overlap + vertical gap <= 5% of page
                (table_figure_classifier.py:155-192)
- IoU dedup:    greedy first-wins, threshold 0.5
                (advanced_layout_extractor.py:1073-1114)
- bbox convention: (x0, y0, x1, y1), normalized [0, 1] everywhere
                (fixes the reference's mixed conventions, SURVEY.md §2.12)

All kernels here are pure functions of plain python / numpy values for ONE
document — no Ray, no I/O. The pipeline's vectorized stages must reproduce
these semantics exactly (verified by golden span-sequence equality tests).
"""

from __future__ import annotations

import hashlib
import math
import re
from typing import Iterable, Sequence

# ---------------------------------------------------------------------------
# Constants (tunable config in the rebuild; reference values cited above)
# ---------------------------------------------------------------------------

TITLE_FONT_RATIO = 1.2          # inclusive: font >= ratio * page median
BOILER_LINK_DENSITY = 0.5       # text spans with link_density >= this drop
IOU_DEDUP_THRESHOLD = 0.5       # greedy first-wins region dedup
GRID_MIN_INTERSECTIONS = 4      # vector-grid table test
GRID_MIN_REGULARITY = 0.5       # 1 - cv(line intervals), averaged h/v
CAPTION_MARGIN = 0.05           # vertical proximity, fraction of page
HORIZ_ANGLE_TOL = 5.0           # degrees; line orientation buckets
CLASSIFIER_WEIGHTS = {          # table-vs-figure evidence weights
    "cross_pts": 1.0,
    "orth_density": 0.8,
    "gridy": 0.6,
    "caption": 1.2,
    "texture": -0.7,
}
CLASSIFIER_THRESHOLD = 0.8
CROSS_PTS_NORM = 8.0            # intersections normalizer (min(n/8, 1))
ORTH_DENSITY_NORM = 10.0        # orthogonal-line-count normalizer
CHUNK_SIZE = 1200               # recursive chunker (rag_evaluation:33-48)
CHUNK_OVERLAP = 200
CHUNK_SEPARATORS = ["\n## ", "\n### ", "\n#### ", "\n\n", "\n", ". ", " ", ""]

# Caption keyword patterns (reference hard-codes kor+eng lists,
# table_figure_classifier.py:175-189; configurable here).
TABLE_CAPTION_RE = re.compile(r"(?:^|[\s(\[])(?:표|table|tab\.)", re.IGNORECASE)
FIGURE_CAPTION_RE = re.compile(r"(?:^|[\s(\[])(?:그림|figure|fig\.)", re.IGNORECASE)
CAPTION_ANY_RE = re.compile(
    r"(?:^|[\s(\[])(?:표|table|tab\.|그림|figure|fig\.)", re.IGNORECASE
)

# Markdown structure rules (applied before the font rule, in this order).
# Pattern STRINGS are the contract: ASCII-explicit classes only, because
# the vectorized stages evaluate the same strings under RE2 (Arrow) while
# the golden extractor uses Python re — `\s`/`\d` diverge on unicode
# whitespace/digits between the two engines, explicit classes do not.
WS = r"[ \t\r\n\f\v]"
MD_HEADER_PATTERN = r"^#{1,6}" + WS
LIST_ITEM_PATTERN = r"^(?:[-*]|[0-9]+\.)" + WS
MD_HEADER_RE = re.compile(MD_HEADER_PATTERN)
LIST_ITEM_RE = re.compile(LIST_ITEM_PATTERN)

# Input span kinds.
KIND_TEXT = "text"
KIND_IMAGE = "image"
KIND_BOILER = "boilerplate"
# Output span kinds (subset of the reference's ElementType vocabulary).
OUT_TITLE = "title"
OUT_PARAGRAPH = "paragraph"
OUT_LIST = "list"
OUT_TABLE = "table"
OUT_FIGURE = "figure"
OUT_CAPTION = "caption"

# region provenance vocabulary (J1 merge tags,
# hybrid_docling_gpt4_processor.py:404,421)
PROV_VALIDATED = "layout_validated"
PROV_DETECTED = "layout_detected"


# ---------------------------------------------------------------------------
# Scalar kernels
# ---------------------------------------------------------------------------

# what the stub OCR returns for an "unreadable" asset: 3 ascii
# non-alphanumeric chars, so meaningful_text_gate rejects it (V16)
UNREADABLE_OCR_TEXT = ".,."
UNREADABLE_OCR_RATE = 16        # 1 in 16 refs hash to unreadable


def stub_ocr(media_ref: str) -> str:
    """Deterministic stand-in for the Tesseract OCR engine (M6/T2 in
    SURVEY.md §2): pure function of the media reference so golden fixtures
    are reproducible without any model. Real deployments swap this for an
    OCR actor with identical signature.

    ~1/16 of refs deterministically come back UNREADABLE (punctuation
    only) — the real-engine failure mode on degraded scans
    (table_figure_classifier.py:253-309's reason to gate) — so the V16
    ``meaningful_text_gate`` actually bites in the golden corpus instead
    of being structurally open (r2 verdict item 6)."""
    digest = hashlib.sha1(media_ref.encode("utf-8")).hexdigest()
    if int(digest[8], 16) % UNREADABLE_OCR_RATE == 0:
        return UNREADABLE_OCR_TEXT
    return f"ocr[{digest[:8]}]"


def iou(a: Sequence[float], b: Sequence[float]) -> float:
    """IoU of two (x0, y0, x1, y1) boxes (advanced_layout_extractor.py:1093-1114)."""
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(0.0, ix1 - ix0), max(0.0, iy1 - iy0)
    inter = iw * ih
    if inter <= 0.0:
        return 0.0
    area_a = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    area_b = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    union = area_a + area_b - inter
    return inter / union if union > 0.0 else 0.0


def dedup_boxes_iou(boxes: Sequence[Sequence[float]],
                    threshold: float = IOU_DEDUP_THRESHOLD) -> list[int]:
    """Greedy first-wins near-dedup over candidate boxes: keep a box iff its
    IoU with every previously kept box is <= threshold. Returns kept indices
    in input order (advanced_layout_extractor.py:1073-1091)."""
    kept: list[int] = []
    for i, box in enumerate(boxes):
        if all(iou(box, boxes[j]) <= threshold for j in kept):
            kept.append(i)
    return kept


def line_orientation(x0: float, y0: float, x1: float, y1: float) -> str:
    """'horizontal' | 'vertical' | 'diagonal' from the line angle mod 180,
    tolerance +-5 degrees (pdf_vector_utils.py:47-61)."""
    angle = math.degrees(math.atan2(y1 - y0, x1 - x0)) % 180.0
    if angle <= HORIZ_ANGLE_TOL or angle >= 180.0 - HORIZ_ANGLE_TOL:
        return "horizontal"
    if abs(angle - 90.0) <= HORIZ_ANGLE_TOL:
        return "vertical"
    return "diagonal"


def _interval_regularity(positions: Iterable[float]) -> float | None:
    """1 - coefficient-of-variation of sorted position deltas; None when
    fewer than 3 positions (pdf_vector_utils.py:194-218). Pure-python math
    — numpy per-call overhead dominates on these tiny inputs."""
    pos = sorted(positions)
    n = len(pos) - 1
    if n < 2:
        return None
    deltas = [pos[i + 1] - pos[i] for i in range(n)]
    mean = sum(deltas) / n
    if mean <= 0.0:
        return 0.0
    var = sum((d - mean) ** 2 for d in deltas) / n
    cv = math.sqrt(var) / mean
    return max(0.0, 1.0 - cv)


def analyze_grid(lines: Sequence[tuple[float, float, float, float]]) -> dict:
    """Vector-grid analysis of a region's line set: orientation counts,
    h/v intersections (midpoint span test), grid regularity, table-likeness
    (pdf_vector_utils.py:118-218). The primary deterministic table detector
    (V17 in SURVEY.md §2.3) — no raster needed.

    Returns dict with n_h, n_v, n_diag, intersections, regularity,
    is_table_like.
    """
    horiz: list[tuple[float, float, float, float]] = []
    vert: list[tuple[float, float, float, float]] = []
    n_diag = 0
    for (x0, y0, x1, y1) in lines:
        o = line_orientation(x0, y0, x1, y1)
        if o == "horizontal":
            horiz.append((min(x0, x1), max(x0, x1), (y0 + y1) / 2.0, 0.0))
        elif o == "vertical":
            vert.append((min(y0, y1), max(y0, y1), (x0 + x1) / 2.0, 0.0))
        else:
            n_diag += 1

    inter = 0
    for (hx0, hx1, hy, _) in horiz:
        for (vy0, vy1, vx, _) in vert:
            if hx0 <= vx <= hx1 and vy0 <= hy <= vy1:
                inter += 1

    regs = [r for r in (_interval_regularity([h[2] for h in horiz]),
                        _interval_regularity([v[2] for v in vert]))
            if r is not None]
    regularity = sum(regs) / len(regs) if regs else 0.0
    return {
        "n_h": len(horiz),
        "n_v": len(vert),
        "n_diag": n_diag,
        "intersections": inter,
        "regularity": regularity,
        "is_table_like": inter >= GRID_MIN_INTERSECTIONS
        and regularity > GRID_MIN_REGULARITY,
    }


def caption_near(span_bbox: Sequence[float], region_bbox: Sequence[float],
                 margin: float = CAPTION_MARGIN) -> bool:
    """True iff the span horizontally overlaps the region and sits within
    ``margin`` above or below it (table_figure_classifier.py:160-175)."""
    sx0, sy0, sx1, sy1 = span_bbox
    rx0, ry0, rx1, ry1 = region_bbox
    if min(sx1, rx1) - max(sx0, rx0) <= 0.0:
        return False
    if sy1 <= ry0:          # span above region
        return (ry0 - sy1) <= margin
    if sy0 >= ry1:          # span below region
        return (sy0 - ry1) <= margin
    return True             # vertical overlap counts as near


def caption_evidence(texts: Iterable[str]) -> float:
    """1.0 if nearby captions look table-ish, 0.0 figure-ish, 0.5 mixed or
    absent (table_figure_classifier.py:175-192)."""
    t_hits = f_hits = 0
    for t in texts:
        if not CAPTION_ANY_RE.search(t):     # fast miss (same alternation)
            continue
        if TABLE_CAPTION_RE.search(t):
            t_hits += 1
        if FIGURE_CAPTION_RE.search(t):
            f_hits += 1
    if t_hits > f_hits:
        return 1.0
    if f_hits > t_hits:
        return 0.0
    return 0.5


def classify_region(grid: dict, caption_score: float) -> tuple[str, float]:
    """Evidence-based table-vs-figure decision: linear score over normalized
    features with the reference's weight vector and 0.8 threshold
    (table_figure_classifier.py:15-24, 244-251). ``texture`` is the
    deterministic stand-in: fraction of diagonal lines in the region
    (Sobel-entropy analog, table_figure_classifier.py:194-226).

    Returns (kind, score): kind 'table' iff the region passes BOTH the
    vector-grid test and the evidence threshold, else 'figure'.
    """
    n_lines = grid["n_h"] + grid["n_v"] + grid["n_diag"]
    features = {
        "cross_pts": min(grid["intersections"] / CROSS_PTS_NORM, 1.0),
        "orth_density": min((grid["n_h"] + grid["n_v"]) / ORTH_DENSITY_NORM, 1.0),
        "gridy": min(max(grid["regularity"], 0.0), 1.0),
        "caption": caption_score,
        "texture": grid["n_diag"] / n_lines if n_lines else 0.0,
    }
    score = sum(CLASSIFIER_WEIGHTS[k] * v for k, v in features.items())
    kind = OUT_TABLE if (grid["is_table_like"] and score >= CLASSIFIER_THRESHOLD) \
        else OUT_FIGURE
    return kind, score


# Large-region splitter (V4/V8 in SURVEY.md §2.3, advanced_layout_
# extractor.py:693-749, 1036-1071 — re-specified with ONE bbox convention):
SPLIT_MIN_W_FRAC = 0.6      # region wider than 60% of the page
SPLIT_MIN_H_FRAC = 0.3      # and taller than 30%
SPLIT_BAND_FRAC = 0.25      # split line must sit within +-25% of center
SPLIT_MIN_LINE_FRAC = 0.8   # and span >= 80% of the region height
SPLIT_MIN_SIDE = 0.05       # both halves >= 5% of the page wide


def maybe_split_region(bbox: Sequence[float],
                       lines: Sequence[tuple[float, float, float, float]]):
    """Split an oversized region at its strongest central vertical line.
    Returns (left_bbox, right_bbox, split_x) or None. The splitting line
    belongs to BOTH halves (closed-interval membership)."""
    x0, y0, x1, y1 = bbox
    w, h = x1 - x0, y1 - y0
    if not (w > SPLIT_MIN_W_FRAC and h > SPLIT_MIN_H_FRAC):
        return None
    cx = (x0 + x1) / 2.0
    band = SPLIT_BAND_FRAC * w
    best = None
    for (lx0, ly0, lx1, ly1) in lines:
        if line_orientation(lx0, ly0, lx1, ly1) != "vertical":
            continue
        lx = (lx0 + lx1) / 2.0
        if abs(lx - cx) <= band and abs(ly1 - ly0) >= SPLIT_MIN_LINE_FRAC * h:
            d = abs(lx - cx)
            if best is None or d < best[0]:
                best = (d, lx)
    if best is None:
        return None
    sx = best[1]
    if sx - x0 < SPLIT_MIN_SIDE or x1 - sx < SPLIT_MIN_SIDE:
        return None
    return (x0, y0, sx, y1), (sx, y0, x1, y1), sx


def lines_in_bbox(lines: Sequence[tuple[float, float, float, float]],
                  bbox: Sequence[float]) -> list[tuple[float, float, float, float]]:
    """Lines whose bounding box intersects ``bbox`` (closed intervals, so a
    boundary line belongs to both halves of a split) —
    pdf_vector_utils.py:127-136 predicate."""
    x0, y0, x1, y1 = bbox
    out = []
    for (lx0, ly0, lx1, ly1) in lines:
        if (min(lx0, lx1) <= x1 and max(lx0, lx1) >= x0
                and min(ly0, ly1) <= y1 and max(ly0, ly1) >= y0):
            out.append((lx0, ly0, lx1, ly1))
    return out


SNAP_TOL = 0.01      # bbox-edge snap distance (pdf_vector_utils.py:220-248
                     # uses 5pt on ~500pt pages ~= 1% normalized)


def snap_bbox_to_lines(bbox: Sequence[float],
                       lines: Sequence[tuple[float, float, float, float]],
                       tol: float = SNAP_TOL) -> tuple[float, float, float, float]:
    """Snap bbox edges to nearby vector-line coordinates (M26 in SURVEY.md
    §2.2): each edge moves to the closest h/v line position within ``tol``.
    Diagnostic/refinement utility — not part of the golden span contract."""
    xs, ys = [], []
    for (x0, y0, x1, y1) in lines:
        o = line_orientation(x0, y0, x1, y1)
        if o == "vertical":
            xs.append((x0 + x1) / 2.0)
        elif o == "horizontal":
            ys.append((y0 + y1) / 2.0)

    def snap(v: float, cands: list[float]) -> float:
        best = min(cands, key=lambda c: abs(c - v), default=None)
        return best if best is not None and abs(best - v) <= tol else v

    bx0, by0, bx1, by1 = bbox
    return (snap(bx0, xs), snap(by0, ys), snap(bx1, xs), snap(by1, ys))


# a split region's right half sits at this offset delta after the left
SPLIT_RIGHT_OFFSET_DELTA = 5


def region_sub_refs(base_ref: str) -> tuple[str, str]:
    return base_ref + "/L", base_ref + "/R"


def region_span_text(kind: str, grid: dict) -> str:
    """Deterministic text payload for a synthesized region span."""
    if kind == OUT_TABLE:
        return f"[table {grid['n_h']}x{grid['n_v']} grid]"
    return "[figure]"


def region_media_ref(doc_id: str, page: int, region_idx: int) -> str:
    return f"vector://{doc_id}/p{page}/r{region_idx}"


MEANINGFUL_TEXT_MIN_CHARS = 3


def meaningful_text_gate(ocr_text: str) -> bool:
    """V16 meaningful-text gate (table_figure_classifier.py:253-309):
    a region whose OCR text has fewer than 3 characters or no
    alphanumeric/non-ASCII content cannot be a table — force 'figure'.
    Bites on the ~1/16 of refs the stub OCR marks unreadable
    (``UNREADABLE_OCR_TEXT``) and on any real engine's empty/garbage
    output."""
    t = ocr_text.strip()
    if len(t) < MEANINGFUL_TEXT_MIN_CHARS:
        return False
    return any(c.isalnum() or ord(c) > 127 for c in t)


def region_ocr_text(media_ref: str) -> str:
    """Deterministic OCR stand-in for a vector region (same engine slot
    as stub_ocr; keyed by the region's media_ref)."""
    return stub_ocr(media_ref)


def emit_region_spans(doc_id: str, page: int, ridx: int,
                      bbox: Sequence[float],
                      lines: Sequence[tuple[float, float, float, float]],
                      offset: int, caption_for) -> list[dict]:
    """Shared region kernel (golden extractor AND pipeline call this):
    split-aware emission of classified table/figure spans for ONE kept
    candidate region. ``caption_for(part_bbox) -> float`` supplies the
    caption-evidence score (``caption_evidence`` over the proximate span
    texts — the pipeline computes it from precomputed per-span regex
    flags, the golden extractor from the texts directly). Each returned
    dict carries its part bbox under "bbox" (caller strips it before
    output)."""
    split = maybe_split_region(bbox, lines)
    base_ref = region_media_ref(doc_id, page, ridx)
    if split is None:
        parts = [(tuple(bbox), list(lines), base_ref, offset)]
    else:
        lb, rb, _sx = split
        ref_l, ref_r = region_sub_refs(base_ref)
        parts = [(lb, lines_in_bbox(lines, lb), ref_l, offset),
                 (rb, lines_in_bbox(lines, rb), ref_r,
                  offset + SPLIT_RIGHT_OFFSET_DELTA)]
    out = []
    for (bb, ls, ref, off) in parts:
        grid = analyze_grid(ls)
        cap_ev = caption_for(bb)
        kind, score = classify_region(grid, cap_ev)
        if kind == OUT_TABLE and not meaningful_text_gate(region_ocr_text(ref)):
            kind = OUT_FIGURE               # V16 gate: text-free "tables"
        # provenance (J1, hybrid_docling_gpt4_processor.py:404,421):
        # "layout_validated" = a second signal agrees (caption-text
        # evidence — the cross-detector analog) or the evidence score
        # clears the reference's high-confidence bar; "layout_detected"
        # = accepted on geometry alone (the lenient figure rule)
        source = (PROV_VALIDATED
                  if cap_ev > 0.0 or score >= CLASSIFIER_THRESHOLD
                  else PROV_DETECTED)
        out.append({"kind": kind, "text": region_span_text(kind, grid),
                    "media_ref": ref, "offset": off, "bbox": bb,
                    "source": source})
    return out


def classify_text_kind(text: str, font_size: float, page_median: float) -> str:
    """Ordered text-span classification (rules applied in this order):
    markdown header -> title; list marker -> list; font >= 1.2 x page
    median -> title; else paragraph. ``text`` must already be stripped."""
    if MD_HEADER_RE.match(text):
        return OUT_TITLE
    if LIST_ITEM_RE.match(text):
        return OUT_LIST
    if page_median > 0.0 and font_size >= TITLE_FONT_RATIO * page_median:
        return OUT_TITLE
    return OUT_PARAGRAPH
