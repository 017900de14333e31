"""Unit tests for the extraction-spec kernels (SURVEY.md §5 item 2)."""

import numpy as np

from pdf_extraction_ray import spec


def grid_lines(bbox, n_rows, n_cols, jitter=0.0, rng=None):
    x0, y0, x1, y1 = bbox
    ys = np.linspace(y0, y1, n_rows + 1)
    xs = np.linspace(x0, x1, n_cols + 1)
    if jitter and rng is not None:
        ys = ys + rng.uniform(-jitter, jitter, ys.shape)
    lines = [(x0, float(y), x1, float(y)) for y in ys]
    lines += [(float(x), y0, float(x), y1) for x in xs]
    return lines


class TestIoU:
    def test_identical(self):
        assert spec.iou((0, 0, 1, 1), (0, 0, 1, 1)) == 1.0

    def test_disjoint(self):
        assert spec.iou((0, 0, 0.4, 0.4), (0.5, 0.5, 1, 1)) == 0.0

    def test_half_overlap(self):
        v = spec.iou((0, 0, 1, 1), (0.5, 0, 1.5, 1))
        assert abs(v - (0.5 / 1.5)) < 1e-9

    def test_dedup_first_wins(self):
        boxes = [(0, 0, 1, 1), (0.02, 0.02, 1.02, 1.02), (2, 2, 3, 3)]
        assert spec.dedup_boxes_iou(boxes) == [0, 2]

    def test_dedup_threshold_boundary(self):
        # IoU exactly 0.5 is NOT a duplicate (drop only when > 0.5)
        a = (0.0, 0.0, 1.0, 1.0)
        b = (0.0, 0.0, 1.0, 0.5)   # iou = 0.5
        assert abs(spec.iou(a, b) - 0.5) < 1e-12
        assert spec.dedup_boxes_iou([a, b]) == [0, 1]


class TestOrientation:
    def test_horizontal(self):
        assert spec.line_orientation(0, 0.5, 1, 0.5) == "horizontal"
        assert spec.line_orientation(1, 0.5, 0, 0.5) == "horizontal"

    def test_vertical(self):
        assert spec.line_orientation(0.5, 0, 0.5, 1) == "vertical"

    def test_diagonal(self):
        assert spec.line_orientation(0, 0, 1, 1) == "diagonal"

    def test_five_degree_tolerance(self):
        # 4 degrees from horizontal -> horizontal; 6 degrees -> diagonal
        import math
        y4 = math.tan(math.radians(4.0))
        y6 = math.tan(math.radians(6.0))
        assert spec.line_orientation(0, 0, 1, y4) == "horizontal"
        assert spec.line_orientation(0, 0, 1, y6) == "diagonal"


class TestGrid:
    def test_regular_grid_is_table(self):
        g = spec.analyze_grid(grid_lines((0.1, 0.1, 0.9, 0.5), 4, 3))
        assert g["n_h"] == 5 and g["n_v"] == 4
        assert g["intersections"] == 20
        assert g["regularity"] > 0.95
        assert g["is_table_like"]

    def test_sparse_grid_not_table(self):
        g = spec.analyze_grid(grid_lines((0.1, 0.1, 0.9, 0.5), 1, 0))
        assert g["intersections"] < spec.GRID_MIN_INTERSECTIONS
        assert not g["is_table_like"]

    def test_irregular_grid_not_table(self):
        # wildly uneven horizontal spacing -> cv high -> regularity <= 0.5
        lines = [(0.0, y, 1.0, y) for y in (0.0, 0.01, 0.02, 0.9)]
        lines += [(x, 0.0, x, 1.0) for x in (0.0, 0.5, 1.0)]
        g = spec.analyze_grid(lines)
        assert g["intersections"] >= 4
        assert g["regularity"] <= spec.GRID_MIN_REGULARITY
        assert not g["is_table_like"]

    def test_diagonals_counted(self):
        g = spec.analyze_grid([(0, 0, 1, 1), (0, 1, 1, 0)])
        assert g["n_diag"] == 2 and g["n_h"] == g["n_v"] == 0


class TestCaption:
    def test_near_below(self):
        assert spec.caption_near((0.2, 0.81, 0.8, 0.83), (0.1, 0.5, 0.9, 0.8))

    def test_near_above(self):
        assert spec.caption_near((0.2, 0.46, 0.8, 0.49), (0.1, 0.5, 0.9, 0.8))

    def test_too_far(self):
        assert not spec.caption_near((0.2, 0.9, 0.8, 0.95), (0.1, 0.5, 0.9, 0.8))

    def test_no_horizontal_overlap(self):
        assert not spec.caption_near((0.91, 0.81, 1.0, 0.83), (0.1, 0.5, 0.9, 0.8))

    def test_evidence_kor_eng(self):
        assert spec.caption_evidence(["표 3: 결과"]) == 1.0
        assert spec.caption_evidence(["그림 1"]) == 0.0
        assert spec.caption_evidence(["Figure 2", "Table 1"]) == 0.5
        assert spec.caption_evidence([]) == 0.5
        assert spec.caption_evidence(["Tab. 4 summary"]) == 1.0

    def test_keyword_needs_word_start(self):
        # 'stable' / 'prefigure' must not match
        assert spec.caption_evidence(["stable results"]) == 0.5
        assert spec.caption_evidence(["prefigure nothing"]) == 0.5


class TestClassifier:
    def test_table_when_grid_and_caption(self):
        g = spec.analyze_grid(grid_lines((0.1, 0.1, 0.9, 0.5), 4, 3))
        kind, score = spec.classify_region(g, 1.0)
        assert kind == "table" and score >= spec.CLASSIFIER_THRESHOLD

    def test_figure_when_not_table_like(self):
        g = spec.analyze_grid([(0, 0, 1, 1), (0, 1, 1, 0)])
        kind, _ = spec.classify_region(g, 0.0)
        assert kind == "figure"

    def test_weights_match_reference(self):
        assert spec.CLASSIFIER_WEIGHTS == {
            "cross_pts": 1.0, "orth_density": 0.8, "gridy": 0.6,
            "caption": 1.2, "texture": -0.7}
        assert spec.CLASSIFIER_THRESHOLD == 0.8


class TestTextKind:
    def test_title_threshold_inclusive(self):
        assert spec.classify_text_kind("body", 12.0, 10.0) == "title"
        assert spec.classify_text_kind("body", 11.99, 10.0) == "paragraph"

    def test_markdown_header(self):
        assert spec.classify_text_kind("## heading", 10.0, 10.0) == "title"

    def test_list_markers(self):
        assert spec.classify_text_kind("- item", 10.0, 10.0) == "list"
        assert spec.classify_text_kind("3. item", 10.0, 10.0) == "list"
        assert spec.classify_text_kind("3.item no space", 10.0, 10.0) == "paragraph"

    def test_no_median(self):
        assert spec.classify_text_kind("anything", 99.0, 0.0) == "paragraph"


class TestStubOcr:
    def test_deterministic(self):
        a = spec.stub_ocr("media://doc-1/1-0")
        assert a == spec.stub_ocr("media://doc-1/1-0")
        assert a != spec.stub_ocr("media://doc-1/1-1")
        assert a.startswith("ocr[")


class TestRegionSplitter:
    def _lines(self, bbox, n_rows, n_cols):
        return grid_lines(bbox, n_rows, n_cols)

    def test_oversized_region_splits_at_center(self):
        bbox = (0.1, 0.5, 0.9, 0.85)
        lines = self._lines(bbox, 4, 2)     # center vertical at x=0.5
        got = spec.maybe_split_region(bbox, lines)
        assert got is not None
        left, right, sx = got
        assert abs(sx - 0.5) < 1e-9
        assert left == (0.1, 0.5, 0.5, 0.85)
        assert right == (0.5, 0.5, 0.9, 0.85)

    def test_small_region_never_splits(self):
        bbox = (0.15, 0.55, 0.85, 0.8)      # h = 0.25 < 0.3
        assert spec.maybe_split_region(bbox, self._lines(bbox, 4, 2)) is None

    def test_no_central_line_no_split(self):
        bbox = (0.1, 0.5, 0.9, 0.85)
        lines = self._lines(bbox, 4, 1)     # verticals only at edges
        assert spec.maybe_split_region(bbox, lines) is None

    def test_shared_line_belongs_to_both_halves(self):
        bbox = (0.1, 0.5, 0.9, 0.85)
        lines = self._lines(bbox, 4, 2)
        left, right, sx = spec.maybe_split_region(bbox, lines)
        in_left = spec.lines_in_bbox(lines, left)
        in_right = spec.lines_in_bbox(lines, right)
        center = [(x0, y0, x1, y1) for (x0, y0, x1, y1) in lines
                  if abs(x0 - 0.5) < 1e-9 and abs(x1 - 0.5) < 1e-9]
        assert center and all(c in in_left and c in in_right for c in center)

    def test_emit_region_spans_split_offsets_and_refs(self):
        bbox = (0.1, 0.5, 0.9, 0.85)
        lines = self._lines(bbox, 4, 4)
        parts = spec.emit_region_spans("d", 1, 0, bbox, lines, 900,
                                       lambda bb: 0.5)
        assert len(parts) == 2
        assert parts[0]["offset"] == 900
        assert parts[1]["offset"] == 900 + spec.SPLIT_RIGHT_OFFSET_DELTA
        assert parts[0]["media_ref"].endswith("/L")
        assert parts[1]["media_ref"].endswith("/R")
        # each half keeps a table-grade grid (rows span both halves)
        assert all(p["kind"] in ("table", "figure") for p in parts)


class TestBboxSnap:
    def test_snaps_within_tolerance(self):
        lines = [(0.2, 0.1, 0.2, 0.9),      # vertical at x=0.2
                 (0.1, 0.5, 0.9, 0.5)]      # horizontal at y=0.5
        got = spec.snap_bbox_to_lines((0.205, 0.495, 0.7, 0.8), lines)
        assert abs(got[0] - 0.2) < 1e-12
        assert abs(got[1] - 0.5) < 1e-12
        assert got[2] == 0.7 and got[3] == 0.8   # nothing nearby -> unchanged

    def test_beyond_tolerance_unchanged(self):
        lines = [(0.2, 0.1, 0.2, 0.9)]
        got = spec.snap_bbox_to_lines((0.25, 0.1, 0.7, 0.8), lines)
        assert got[0] == 0.25


class TestMeaningfulTextGate:
    def test_short_text_rejected(self):
        assert not spec.meaningful_text_gate("")
        assert not spec.meaningful_text_gate("ab")
        assert not spec.meaningful_text_gate("  a  ")

    def test_symbol_only_rejected(self):
        assert not spec.meaningful_text_gate("---|||---")

    def test_alnum_accepted(self):
        assert spec.meaningful_text_gate("abc")
        assert spec.meaningful_text_gate("1 2 3")

    def test_non_ascii_accepted(self):
        assert spec.meaningful_text_gate("한국어")

    def test_stub_ocr_always_passes(self):
        # structurally open with the stub engine (hex digest text)
        assert spec.meaningful_text_gate(
            spec.region_ocr_text("vector://d/p1/r0"))
