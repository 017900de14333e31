"""Sampling-based join-size estimation and relational division:
estimator accuracy against the exact join size, determinism of the
key-sample hash, and division boundary semantics."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.pipelines.relational import (
    DIVISION_SQL, JOIN_SIZE_SAMPLED_SQL, SAMPLE_RATE_INV,
    customers_all_priorities, join_size_estimate_sampled,
    orders_lineitem_join_size)


def _mk_join_tables(d: str, rng, n_orders=4000, fanout_hi=8):
    ok = np.arange(1, n_orders + 1, dtype=np.int64)
    pd.DataFrame({"o_orderkey": ok,
                  "o_custkey": rng.integers(1, 300, size=n_orders)}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    fan = rng.integers(1, fanout_hi, size=n_orders)
    pd.DataFrame({"l_orderkey": np.repeat(ok, fan)}) \
        .to_parquet(os.path.join(d, "lineitem.parquet"))
    return int(fan.sum())


@pytest.mark.usefixtures("ray_session")
def test_sampled_estimate_tracks_exact_join_size(tmp_path):
    """Key-sampling at 1/16 over a uniform FK join must land within
    25% of the exact cardinality (it is unbiased; variance at 4000
    keys is far inside that band), and sampled_keys must be ~n/16."""
    d = str(tmp_path)
    rng = np.random.default_rng(42)
    true_size = _mk_join_tables(d, rng)
    est = join_size_estimate_sampled(d)
    exact = int(orders_lineitem_join_size(d)["join_size"].iloc[0])
    assert exact == true_size
    got = int(est["est_join_size"].iloc[0])
    assert abs(got - exact) / exact < 0.25
    n_keys = int(est["sampled_keys"].iloc[0])
    assert abs(n_keys - 4000 / SAMPLE_RATE_INV) < 4000 / SAMPLE_RATE_INV


@pytest.mark.usefixtures("ray_session")
def test_sampled_estimate_matches_duckdb(tmp_path):
    d = str(tmp_path)
    rng = np.random.default_rng(43)
    _mk_join_tables(d, rng, n_orders=1500)
    got = join_size_estimate_sampled(d)
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{os.path.join(d, t + '.parquet')}')")
    want = con.sql(JOIN_SIZE_SAMPLED_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_division_boundaries(tmp_path):
    """Customer 1 covers all 3 priorities (qualifies, n_orders counts
    ALL orders incl. repeats); customer 2 misses one (out); customer 3
    covers all via repeats (in)."""
    d = str(tmp_path)
    rows = [(1, "A"), (1, "B"), (1, "C"), (1, "A"),
            (2, "A"), (2, "B"),
            (3, "A"), (3, "A"), (3, "B"), (3, "C")]
    pd.DataFrame({
        "o_orderkey": np.arange(len(rows), dtype=np.int64),
        "o_custkey": np.array([r[0] for r in rows], dtype=np.int64),
        "o_orderpriority": [r[1] for r in rows]}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    out = customers_all_priorities(d).to_pandas()
    assert out["o_custkey"].tolist() == [1, 3]
    assert out["n_orders"].tolist() == [4, 4]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{os.path.join(d, 'orders.parquet')}')")
    want = con.sql(DIVISION_SQL).df()
    pd.testing.assert_frame_equal(out, want, check_dtype=False,
                                  check_exact=True)
