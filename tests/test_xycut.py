import numpy as np

from pdf_extraction_ray.functions.xycut import xy_cut_order


def test_stacked_rows_top_down():
    bb = np.array([[0.1, 0.7, 0.9, 0.8],
                   [0.1, 0.1, 0.9, 0.2],
                   [0.1, 0.4, 0.9, 0.5]])
    assert xy_cut_order(bb).tolist() == [1, 2, 0]


def test_two_columns_left_then_right():
    # column gutter (0.16) wider than row gap (0.1) -> column-major order
    bb = np.array([
        [0.58, 0.1, 0.9, 0.3],    # right top
        [0.1, 0.1, 0.42, 0.3],    # left top
        [0.1, 0.4, 0.42, 0.6],    # left bottom
        [0.58, 0.4, 0.9, 0.6],    # right bottom
    ])
    assert xy_cut_order(bb).tolist() == [1, 2, 0, 3]


def test_banner_then_columns():
    bb = np.array([
        [0.1, 0.55, 0.45, 0.9],   # left col
        [0.1, 0.05, 0.9, 0.15],   # full-width banner on top
        [0.55, 0.55, 0.9, 0.9],   # right col
    ])
    assert xy_cut_order(bb).tolist() == [1, 0, 2]


def test_permutation_invariant():
    rng = np.random.default_rng(5)
    y = np.arange(8) / 10.0
    bb = np.stack([np.full(8, 0.1), y, np.full(8, 0.9), y + 0.05], axis=1)
    base = bb[xy_cut_order(bb)]
    for _ in range(5):
        perm = rng.permutation(8)
        got = bb[perm][xy_cut_order(bb[perm])]
        assert np.allclose(got, base)


def test_overlapping_falls_back_to_lexsort():
    bb = np.array([[0.1, 0.1, 0.9, 0.9],
                   [0.2, 0.1, 0.8, 0.8]])     # same y0 -> x0 breaks tie
    assert xy_cut_order(bb).tolist() == [0, 1]
