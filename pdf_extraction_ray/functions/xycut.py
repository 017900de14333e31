"""Recursive XY-cut reading order (pdfminer-style block ordering — the
north-star layout-parse component; analog of the reference's reliance on
PyMuPDF block order, SURVEY.md §2.7 O1, made explicit and testable).

Given normalized (x0, y0, x1, y1) boxes on one page, recursively split on
the widest whitespace gap — horizontal cuts (top/bottom) preferred over
vertical cuts (left/right) — and emit indices in reading order:
top-to-bottom, then left-to-right within bands; (y0, x0) lexsort when no
cut exists. Deterministic and permutation-invariant.
"""

from __future__ import annotations

import numpy as np

MIN_GAP = 1e-6


def _best_gap(starts: np.ndarray, ends: np.ndarray) -> tuple[int, float]:
    """Boxes sorted by ``starts``: widest whitespace gap between the
    running max of ``ends`` and the next start. -> (cut position, width)."""
    max_end = np.maximum.accumulate(ends)
    gaps = starts[1:] - max_end[:-1]
    if len(gaps) == 0:
        return -1, 0.0
    cut = int(np.argmax(gaps))
    return cut, float(gaps[cut])


def xy_cut_order(bboxes: np.ndarray) -> np.ndarray:
    """Reading-order permutation of box indices."""
    bb = np.asarray(bboxes, dtype=np.float64)
    out: list[int] = []

    def rec(ids: np.ndarray) -> None:
        if len(ids) <= 1:
            out.extend(int(i) for i in ids)
            return
        # candidate cuts on both axes; take the WIDER whitespace gap
        # (horizontal wins ties), so genuine columns beat row banding
        oy = ids[np.argsort(bb[ids, 1], kind="stable")]
        ycut, ygap = _best_gap(bb[oy, 1], bb[oy, 3])
        ox = ids[np.argsort(bb[ids, 0], kind="stable")]
        xcut, xgap = _best_gap(bb[ox, 0], bb[ox, 2])
        if ygap > MIN_GAP and ygap >= xgap:
            rec(oy[:ycut + 1])
            rec(oy[ycut + 1:])
            return
        if xgap > MIN_GAP:
            rec(ox[:xcut + 1])
            rec(ox[xcut + 1:])
            return
        # no whitespace cut: fall back to (y0, x0) reading order
        out.extend(int(i) for i in ids[np.lexsort((bb[ids, 0], bb[ids, 1]))])

    rec(np.arange(len(bb)))
    return np.asarray(out, dtype=np.int64)
