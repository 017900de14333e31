"""Spatial-relations operator vs a literal scalar re-implementation of the
reference semantics (advanced_layout_extractor.py:509-538)."""

import numpy as np

from pdf_extraction_ray.stages.spatial import page_relations, CENTER_TOL


def scalar_relation(b1, b2):
    x1_1, y1_1, x2_1, y2_1 = b1
    x1_2, y1_2, x2_2, y2_2 = b2
    c1 = ((x1_1 + x2_1) / 2, (y1_1 + y2_1) / 2)
    c2 = ((x1_2 + x2_2) / 2, (y1_2 + y2_2) / 2)
    if x1_1 <= x1_2 and y1_1 <= y1_2 and x2_1 >= x2_2 and y2_1 >= y2_2:
        return "contains"
    if x1_2 <= x1_1 and y1_2 <= y1_1 and x2_2 >= x2_1 and y2_2 >= y2_1:
        return "contained_by"
    if abs(c1[0] - c2[0]) < CENTER_TOL:
        return "above" if c1[1] < c2[1] else "below"
    if abs(c1[1] - c2[1]) < CENTER_TOL:
        return "left_of" if c1[0] < c2[0] else "right_of"
    return None


def test_matches_scalar_reference():
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(2, 12))
        x0 = rng.uniform(0, 0.8, n)
        y0 = rng.uniform(0, 0.8, n)
        bb = np.stack([x0, y0, x0 + rng.uniform(0.05, 0.2, n),
                       y0 + rng.uniform(0.02, 0.2, n)], axis=1)
        got = {(i, j): r for i, j, r in page_relations(bb)}
        want = {}
        for i in range(n):
            for j in range(i + 1, n):
                r = scalar_relation(bb[i], bb[j])
                if r:
                    want[(i, j)] = r
        assert got == want


def test_containment_and_alignment():
    bb = np.array([
        [0.1, 0.1, 0.9, 0.9],    # 0 contains 1
        [0.2, 0.2, 0.4, 0.4],
        [0.2, 0.6, 0.4, 0.8],    # 2: same cx as 1 -> 1 above 2
    ])
    rels = dict(((i, j), r) for i, j, r in page_relations(bb))
    assert rels[(0, 1)] == "contains"
    assert rels[(1, 2)] == "above"


def test_identical_boxes_contains_wins():
    bb = np.array([[0.1, 0.1, 0.5, 0.5], [0.1, 0.1, 0.5, 0.5]])
    assert page_relations(bb) == [(0, 1, "contains")]
