"""HyperLogLog sketch: accuracy, mergeability, determinism."""

import numpy as np
import pytest

from pdf_extraction_ray.functions import sketch as S
from pdf_extraction_ray.functions.hashing import hash_strings


def _hashes(vals):
    return hash_strings(np.asarray([str(v) for v in vals], dtype=object))


def test_accuracy_within_2pct():
    for n in (100, 5_000, 100_000):
        reg = S.hll_create()
        S.hll_add_hashes(reg, _hashes(range(n)))
        est = S.hll_count(reg)
        assert abs(est - n) / n < 0.02, (n, est)


def test_merge_equals_union():
    a, b, u = S.hll_create(), S.hll_create(), S.hll_create()
    ha, hb = _hashes(range(0, 3000)), _hashes(range(2000, 6000))
    S.hll_add_hashes(a, ha)
    S.hll_add_hashes(b, hb)
    S.hll_add_hashes(u, np.concatenate([ha, hb]))
    assert np.array_equal(S.hll_merge(a, b), u)


def test_duplicates_do_not_inflate():
    reg = S.hll_create()
    h = _hashes(range(500))
    for _ in range(5):
        S.hll_add_hashes(reg, h)
    assert abs(S.hll_count(reg) - 500) / 500 < 0.05


@pytest.mark.usefixtures("ray_session")
def test_pipeline_matches_exact_count():
    import duckdb
    from pdf_extraction_ray.pipelines.relational import approx_distinct_users
    est = int(approx_distinct_users("/root/testdata/sf0.01")
              ["approx_distinct_users"].iloc[0])
    exact = duckdb.sql("SELECT count(DISTINCT user_id) FROM "
                       "read_parquet('/root/testdata/sf0.01/events.parquet')") \
        .fetchone()[0]
    assert abs(est - exact) / exact < 0.02
