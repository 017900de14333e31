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
