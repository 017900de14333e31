"""Pure-numpy raster detector path for V1/V2/V14 — the morphology-style
table detector the reference runs over rendered pages
(advanced_layout_extractor.py:594-691: binarize -> horizontal/vertical
line erosion/dilation -> intersection check; scorer :751-805; texture
entropy table_figure_classifier.py:194-226). No OpenCV exists in this
environment, so every kernel is re-expressed in numpy:

- binarize: fixed-threshold ink mask (Otsu is overkill for synthetic
  rasters whose ink/background separation is bimodal by construction);
- line extraction: 1-D erosion (moving-window ALL) followed by dilation
  (moving-window ANY) along each axis — the separable equivalent of the
  reference's MORPH_RECT erode/dilate with kernel len max(15, dim//30);
- grid features: detected line-band centers, pairwise h x v intersection
  presence, spacing regularity (1 - cv, same formula as the vector
  analyzer in spec.py), table-likeness with the same thresholds;
- texture: 3x3 Sobel gradients -> 8-bin direction histogram entropy
  (V14), plus the diagonal-edge fraction that feeds classify_region's
  ``texture`` feature in place of the vector diag-line fraction.

The module is cross-checked against the vector-geometry detector on the
same planted regions (tests/test_raster.py): both must agree on
table-vs-figure for regular grids, sparse grids and diagonal diagrams.
"""

from __future__ import annotations

import math

import numpy as np

from .. import spec

RASTER_SIZE = 256          # region raster resolution (square)
INK_THRESHOLD = 128        # gray < threshold -> ink
MIN_KERNEL_LEN = 15        # reference: max(15, dim // 30)
KERNEL_DIM_FRAC = 30
STRONG_EDGE_PCT = 75
DIAG_ANGLE_TOL = math.pi / 8     # within tol of 0/90/180 -> axis-aligned


# ---------------------------------------------------------------------------
# rasterizer (fixtures-side: deterministic fake "rendered page region")
# ---------------------------------------------------------------------------

def rasterize_region(lines, bbox, size: int = RASTER_SIZE,
                     thickness: int = 2) -> np.ndarray:
    """Render a region's vector lines into a region-local grayscale
    raster (white background, dark strokes). Coordinates are normalized
    page coords; the region bbox maps to the full raster."""
    x0, y0, x1, y1 = bbox
    w = max(x1 - x0, 1e-9)
    h = max(y1 - y0, 1e-9)
    img = np.full((size, size), 255, dtype=np.uint8)
    t = max(1, thickness)
    for (lx0, ly0, lx1, ly1) in lines:
        n = size * 2
        xs = np.linspace((lx0 - x0) / w, (lx1 - x0) / w, n)
        ys = np.linspace((ly0 - y0) / h, (ly1 - y0) / h, n)
        px = np.clip((xs * (size - 1)).round().astype(int), 0, size - 1)
        py = np.clip((ys * (size - 1)).round().astype(int), 0, size - 1)
        for dy in range(t):
            for dx in range(t):
                img[np.clip(py + dy, 0, size - 1),
                    np.clip(px + dx, 0, size - 1)] = 0
    return img


# ---------------------------------------------------------------------------
# morphology kernels (separable 1-D erosion / dilation)
# ---------------------------------------------------------------------------

def binarize(gray: np.ndarray) -> np.ndarray:
    """Inverse binarization: True where ink."""
    return gray < INK_THRESHOLD


def _moving_sum(mask: np.ndarray, k: int, axis: int) -> np.ndarray:
    """Centered moving-window sum of a boolean mask along ``axis``
    (cumsum trick; windows are truncated at the borders)."""
    cs = mask.cumsum(axis=axis, dtype=np.int32)  # cs[i] = sum(x[:i+1])
    n = mask.shape[axis]
    lo = np.arange(n) - k // 2          # inclusive window [lo, hi)
    hi = np.clip(lo + k, 0, n)          # hi >= 1 for k >= 1
    lo = np.clip(lo, 0, n)
    hi_v = np.take(cs, hi - 1, axis=axis)
    lo_v = np.take(cs, np.maximum(lo - 1, 0), axis=axis)
    gate = (lo > 0).astype(np.int32)    # zero the lo term where lo == 0
    if axis == 0 and mask.ndim == 2:
        gate = gate[:, None]
    return hi_v - lo_v * gate


def erode_1d(mask: np.ndarray, k: int, axis: int) -> np.ndarray:
    """Pixel survives iff its full k-window (un-truncated) is all ink."""
    return _moving_sum(mask, k, axis) >= k


def dilate_1d(mask: np.ndarray, k: int, axis: int) -> np.ndarray:
    """Pixel set iff any ink within its k-window."""
    return _moving_sum(mask, k, axis) > 0


def extract_line_masks(ink: np.ndarray):
    """-> (horizontal, vertical, intersection) masks, reference kernel
    sizing max(MIN_KERNEL_LEN, dim // 30)."""
    h, w = ink.shape
    kh = max(MIN_KERNEL_LEN, w // KERNEL_DIM_FRAC)
    kv = max(MIN_KERNEL_LEN, h // KERNEL_DIM_FRAC)
    horiz = dilate_1d(erode_1d(ink, kh, axis=1), kh, axis=1)
    vert = dilate_1d(erode_1d(ink, kv, axis=0), kv, axis=0)
    return horiz, vert, horiz & vert


def _band_centers(profile: np.ndarray) -> list[float]:
    """Centers of consecutive-True runs of a 1-D presence profile (one
    detected line band -> one center)."""
    idx = np.nonzero(profile)[0]
    if len(idx) == 0:
        return []
    breaks = np.nonzero(np.diff(idx) > 1)[0]
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [len(idx) - 1]])
    return [float(idx[s] + idx[e]) / 2.0 for s, e in zip(starts, ends)]


# ---------------------------------------------------------------------------
# V14: Sobel direction entropy + diagonal-edge fraction
# ---------------------------------------------------------------------------

def _sobel(gray: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Separable integer Sobel (kernels [-1,0,1]x[1,2,1] and its
    transpose). gray is uint8, so every partial sum is an exact int32
    (|g| <= 2040) — bit-identical to the dense float convolution at a
    third of the work."""
    p = np.pad(gray.astype(np.int32), 1, mode="edge")
    sy = p[:-2, :] + 2 * p[1:-1, :] + p[2:, :]      # (h, w+2)
    sx = p[:, :-2] + 2 * p[:, 1:-1] + p[:, 2:]      # (h+2, w)
    gx = sy[:, 2:] - sy[:, :-2]
    gy = sx[2:, :] - sx[:-2, :]
    return gx, gy


def _strong_edge_angles(gray: np.ndarray) -> np.ndarray:
    gx, gy = _sobel(gray)
    mag = np.sqrt((gx * gx + gy * gy).astype(np.float64))
    strong = mag > np.percentile(mag, STRONG_EDGE_PCT)
    if not strong.any():
        return np.empty(0)
    return np.arctan2(gy[strong], gx[strong])


def direction_entropy(gray: np.ndarray) -> float:
    """8-direction edge histogram entropy, normalized to [0, 1]
    (table_figure_classifier.py:194-226)."""
    angles = _strong_edge_angles(gray)
    if len(angles) == 0:
        return 0.0
    bins = np.digitize(angles, np.linspace(-np.pi, np.pi, 9))
    hist, _ = np.histogram(bins, bins=8)
    p = hist / hist.sum()
    return float(-np.sum(p * np.log(p + 1e-10)) / np.log(8))


def diag_edge_fraction(gray: np.ndarray) -> float:
    """Fraction of strong edges whose direction is NOT axis-aligned —
    the raster stand-in for the vector detector's diagonal-line fraction
    (feeds classify_region's negative ``texture`` weight)."""
    angles = _strong_edge_angles(gray)
    if len(angles) == 0:
        return 0.0
    a = np.abs(angles) % (np.pi / 2)           # fold to [0, pi/2)
    off_axis = np.minimum(a, np.pi / 2 - a) > DIAG_ANGLE_TOL
    return float(off_axis.mean())


# ---------------------------------------------------------------------------
# V1/V2: grid features + classification over a region raster
# ---------------------------------------------------------------------------

def raster_grid_features(gray: np.ndarray) -> dict:
    """Grid analysis of a region raster — same output contract as
    ``spec.analyze_grid`` so the evidence classifier can consume either
    detector's features."""
    ink = binarize(gray)
    horiz, vert, inter = extract_line_masks(ink)
    rows = _band_centers(horiz.any(axis=1))
    cols = _band_centers(vert.any(axis=0))
    n_inter = 0
    for r in rows:
        for c in cols:
            ri, ci = int(r), int(c)
            if inter[max(0, ri - 2):ri + 3, max(0, ci - 2):ci + 3].any():
                n_inter += 1
    regs = [r for r in (spec._interval_regularity(rows),
                        spec._interval_regularity(cols)) if r is not None]
    regularity = sum(regs) / len(regs) if regs else 0.0
    return {
        "n_h": len(rows),
        "n_v": len(cols),
        "n_diag": 0,            # raster path measures diagonality via
                                # diag_edge_fraction, not line counts
        "intersections": n_inter,
        "regularity": regularity,
        "is_table_like": n_inter >= spec.GRID_MIN_INTERSECTIONS
        and regularity > spec.GRID_MIN_REGULARITY,
    }


def classify_region_raster(gray: np.ndarray, caption_score: float) \
        -> tuple[str, float]:
    """Raster-path table-vs-figure decision: raster grid features + the
    Sobel diagonal-edge texture, scored by the SAME evidence weights and
    threshold as the vector classifier (spec.classify_region)."""
    grid = raster_grid_features(gray)
    n_lines = grid["n_h"] + grid["n_v"]
    features = {
        "cross_pts": min(grid["intersections"] / spec.CROSS_PTS_NORM, 1.0),
        "orth_density": min(n_lines / spec.ORTH_DENSITY_NORM, 1.0),
        "gridy": min(max(grid["regularity"], 0.0), 1.0),
        "caption": caption_score,
        "texture": diag_edge_fraction(gray),
    }
    score = sum(spec.CLASSIFIER_WEIGHTS[k] * v for k, v in features.items())
    kind = spec.OUT_TABLE if (grid["is_table_like"]
                              and score >= spec.CLASSIFIER_THRESHOLD) \
        else spec.OUT_FIGURE
    return kind, score
