"""Synthetic-raster detector path (V1/V2/V14): pure-numpy morphology
kernels cross-checked against the vector-geometry detector on the same
planted regions."""

import numpy as np
import pytest

from pdf_extraction_ray import spec
from pdf_extraction_ray.functions import raster as R
from pdf_extraction_ray.fixtures.generator import _diag_lines, _grid_lines


def _tuples(lines):
    return [(ln["x0"], ln["y0"], ln["x1"], ln["y1"]) for ln in lines]


def _render(lines, bbox):
    return R.rasterize_region(_tuples(lines), bbox)


BBOX = (0.15, 0.55, 0.85, 0.8)


class TestMorphologyKernels:
    def test_erode_dilate_extracts_long_lines_only(self):
        img = np.full((256, 256), 255, dtype=np.uint8)
        img[100, 20:240] = 0                  # long horizontal line
        img[50, 30:38] = 0                    # short speck (8 px < kernel)
        ink = R.binarize(img)
        horiz, vert, inter = R.extract_line_masks(ink)
        assert horiz[100, 120]                # long line survives
        assert not horiz[50].any()            # speck eroded away
        assert not vert.any()

    def test_intersections_detected(self):
        img = np.full((256, 256), 255, dtype=np.uint8)
        img[100, 20:240] = 0
        img[:, 128] = 0
        ink = R.binarize(img)
        _, _, inter = R.extract_line_masks(ink)
        assert inter[100, 128]

    def test_band_centers_groups_runs(self):
        prof = np.zeros(20, dtype=bool)
        prof[3:6] = True
        prof[10:13] = True
        assert R._band_centers(prof) == [4.0, 11.0]


class TestTexture:
    def test_grid_has_low_diag_fraction(self):
        rng = np.random.default_rng(0)
        img = _render(_grid_lines(rng, BBOX, 4, 3, 0.0), BBOX)
        assert R.diag_edge_fraction(img) < 0.2

    def test_diagram_has_high_diag_fraction_and_entropy(self):
        rng = np.random.default_rng(0)
        grid_img = _render(_grid_lines(rng, BBOX, 4, 3, 0.0), BBOX)
        diag_img = _render(_diag_lines(rng, BBOX, 6), BBOX)
        assert R.diag_edge_fraction(diag_img) > 0.5
        assert R.direction_entropy(diag_img) > R.direction_entropy(grid_img)

    def test_blank_region_zero(self):
        blank = np.full((64, 64), 255, dtype=np.uint8)
        assert R.direction_entropy(blank) == 0.0
        assert R.diag_edge_fraction(blank) == 0.0


class TestCrossCheckVsVectorDetector:
    """Both detectors must agree on planted regions (the verdict's done
    criterion for the raster path)."""

    @pytest.mark.parametrize("seed", range(8))
    def test_regular_grid_both_table(self, seed):
        rng = np.random.default_rng(seed)
        lines = _grid_lines(rng, BBOX, int(rng.integers(3, 7)),
                            int(rng.integers(2, 6)), 0.0)
        vkind, _ = spec.classify_region(spec.analyze_grid(_tuples(lines)),
                                        caption_score=1.0)
        rkind, _ = R.classify_region_raster(_render(lines, BBOX),
                                            caption_score=1.0)
        assert vkind == rkind == "table"

    @pytest.mark.parametrize("seed", range(8))
    def test_diagram_both_figure(self, seed):
        rng = np.random.default_rng(seed)
        lines = _diag_lines(rng, BBOX, int(rng.integers(3, 7)))
        vkind, _ = spec.classify_region(spec.analyze_grid(_tuples(lines)),
                                        caption_score=0.0)
        rkind, _ = R.classify_region_raster(_render(lines, BBOX),
                                            caption_score=0.0)
        assert vkind == rkind == "figure"

    @pytest.mark.parametrize("seed", range(4))
    def test_sparse_grid_both_figure(self, seed):
        rng = np.random.default_rng(seed)
        lines = _grid_lines(rng, BBOX, 1, 0, 0.0)   # < 4 intersections
        vkind, _ = spec.classify_region(spec.analyze_grid(_tuples(lines)),
                                        caption_score=0.0)
        rkind, _ = R.classify_region_raster(_render(lines, BBOX),
                                            caption_score=0.0)
        assert vkind == rkind == "figure"


def test_clean_grid_agreement_is_total():
    """Adjudication support (VERDICT r2 item 6): on jitter-FREE geometry
    the raster and vector detectors must agree on every region; the ~2%
    corpus disagreement is entirely the jittered-grid quantization case,
    where the vector detector (exact coordinates) is authoritative."""
    rng = np.random.default_rng(3)
    cases = []
    for nr in (2, 3, 5):
        for nc in (2, 3, 5):
            cases.append(_grid_lines(rng, (0.15, 0.5, 0.85, 0.8),
                                     nr, nc, 0.0))          # regular grids
    cases.append(_grid_lines(rng, (0.15, 0.5, 0.85, 0.8), 1, 0, 0.0))  # sparse
    for _ in range(5):
        cases.append(_diag_lines(rng, (0.25, 0.3, 0.75, 0.5), 6))      # diagrams
    for lines in cases:
        tup = [(ln["x0"], ln["y0"], ln["x1"], ln["y1"]) for ln in lines]
        vkind, _ = spec.classify_region(spec.analyze_grid(tup),
                                        caption_score=0.0)
        img = R.rasterize_region(tup, (0.1, 0.25, 0.9, 0.85))
        rkind, _ = R.classify_region_raster(img, caption_score=0.0)
        assert vkind == rkind, (vkind, rkind, len(tup))


def test_v16_gate_bites_in_golden_corpus():
    """The unreadable-OCR mode must actually flip at least one
    grid-perfect region to figure in the generator corpus (the gate is
    no longer structurally open)."""
    from pdf_extraction_ray.fixtures import golden_extract_table
    from pdf_extraction_ray.fixtures.generator import generate_docs_table

    docs = generate_docs_table(42, 0, 400)
    bitten = tables = 0
    for row in golden_extract_table(docs).to_pylist():
        for s in row["spans"]:
            ref = s["media_ref"]
            if not ref.startswith("vector://"):
                continue
            if s["kind"] == "table":
                tables += 1
                assert spec.meaningful_text_gate(spec.region_ocr_text(ref))
            elif s["kind"] == "figure" \
                    and not spec.meaningful_text_gate(spec.region_ocr_text(ref)) \
                    and s["text"] == "[figure]":
                bitten += 1       # unreadable ref; may or may not be grid-y
    assert tables > 50            # gate never wrongly fires on readable refs
    assert bitten > 0             # and some unreadable regions exist


def test_stub_ocr_unreadable_mode():
    readable = unreadable = 0
    for i in range(400):
        t = spec.stub_ocr(f"media://doc-{i}/1-0")
        if t == spec.UNREADABLE_OCR_TEXT:
            unreadable += 1
            assert not spec.meaningful_text_gate(t)
        else:
            readable += 1
            assert t.startswith("ocr[") and spec.meaningful_text_gate(t)
    # ~1/16 rate, deterministic
    assert 8 <= unreadable <= 60 and readable > 300


def test_v16_gate_flips_perfect_table_to_figure():
    """A grid-perfect, caption-confirmed region whose media_ref hashes
    UNREADABLE must emit as figure; the identical region under a
    readable ref emits as table (table_figure_classifier.py:253-309)."""
    rng = np.random.default_rng(0)
    bbox = (0.2, 0.55, 0.55, 0.8)          # small: never split
    lines = [(ln["x0"], ln["y0"], ln["x1"], ln["y1"])
             for ln in _grid_lines(rng, bbox, 4, 3, 0.0)]
    assert spec.analyze_grid(lines)["is_table_like"]

    def find(pred):
        for i in range(5000):
            ref = spec.region_media_ref(f"doc-{i}", 1, 0)
            if pred(spec.meaningful_text_gate(spec.region_ocr_text(ref))):
                return f"doc-{i}"
        raise AssertionError("no matching ref found")

    bad_doc = find(lambda ok: not ok)
    good_doc = find(lambda ok: ok)
    cap = lambda bb: 1.0                   # strong table caption evidence
    bad = spec.emit_region_spans(bad_doc, 1, 0, bbox, lines, 900, cap)
    good = spec.emit_region_spans(good_doc, 1, 0, bbox, lines, 900, cap)
    assert [p["kind"] for p in good] == ["table"]
    assert [p["kind"] for p in bad] == ["figure"]      # V16 gate bit
