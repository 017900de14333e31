"""Data-quality expectation suite: every check must fire on planted
violations and agree with the DuckDB oracle on the same table."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.pipelines.relational import (QUALITY_CHECKS_SQL,
                                                     events_quality_checks)


def _dir(tmp_path):
    d = str(tmp_path / "qc")
    os.makedirs(d, exist_ok=True)
    ev = pd.DataFrame({
        # one duplicated event_id (7 twice)
        "event_id": np.array([1, 2, 3, 4, 5, 6, 7, 7], dtype=np.int64),
        "ts": pd.to_datetime(["2021-01-01", "2021-01-02", None,
                              "2021-01-04", "2021-01-05", "2021-01-06",
                              "2021-01-07", "2021-01-08"]),   # one null
        # user 999 has no customer row
        "user_id": np.array([1, 2, 3, 999, 1, 2, 3, 1], dtype=np.int64),
        "event_type": ["click", "view", "purchase", "signup", "error",
                       "mystery", "click", "view"],   # one unknown
        # one negative, one above 95
        "value": [1.0, -2.0, 3.0, 99.5, 5.0, 6.0, 7.0, 8.0],
        "props": '{"k": 1}'})
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev.to_parquet(os.path.join(d, "events.parquet"))
    cust = pd.DataFrame({
        "c_custkey": np.arange(0, 10, dtype=np.int64),
        "c_name": [f"Customer#{i}" for i in range(10)],
        "c_nationkey": np.zeros(10, dtype=np.int64),
        "c_acctbal": np.full(10, 1.0)})
    cust.to_parquet(os.path.join(d, "customer.parquet"))
    return d


@pytest.mark.usefixtures("ray_session")
def test_planted_violations_all_fire(tmp_path):
    d = _dir(tmp_path)
    got = events_quality_checks(d).set_index("check_name")["n_violations"]
    assert got["duplicate_event_id"] == 1
    assert got["null_ts"] == 1
    assert got["orphan_user"] == 1
    assert got["unknown_event_type"] == 1
    assert got["negative_value"] == 1
    assert got["value_gt_95"] == 1


@pytest.mark.usefixtures("ray_session")
def test_matches_oracle_on_planted(tmp_path):
    d = _dir(tmp_path)
    got = events_quality_checks(d)
    con = duckdb.connect()
    for t in ("events", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    want = con.sql(QUALITY_CHECKS_SQL).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_fk_audit_counts_planted_orphans(tmp_path):
    from pdf_extraction_ray.pipelines.relational import (FK_AUDIT_SQL,
                                                         fk_integrity_audit)
    d = str(tmp_path / "fk")
    os.makedirs(d, exist_ok=True)
    # 6 lineitems: orderkeys {1,2,9,9} -> 2 orphans vs orders {1,2,3};
    # partkeys {10,11,99,10,11,98} -> 2 orphans vs part {10,11};
    # orders custkeys {5,6,777} -> 1 orphan vs customer {5,6}
    pd.DataFrame({"l_orderkey": np.array([1, 2, 9, 9, 1, 2],
                                         dtype=np.int64),
                  "l_partkey": np.array([10, 11, 99, 10, 11, 98],
                                        dtype=np.int64)}) \
        .to_parquet(os.path.join(d, "lineitem.parquet"))
    pd.DataFrame({"o_orderkey": np.array([1, 2, 3], dtype=np.int64),
                  "o_custkey": np.array([5, 6, 777], dtype=np.int64)}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame({"p_partkey": np.array([10, 11], dtype=np.int64)}) \
        .to_parquet(os.path.join(d, "part.parquet"))
    pd.DataFrame({"c_custkey": np.array([5, 6], dtype=np.int64)}) \
        .to_parquet(os.path.join(d, "customer.parquet"))

    out = fk_integrity_audit(d).set_index("relationship")
    assert out.loc["lineitem->orders", "n_orphans"] == 2
    assert out.loc["lineitem->part", "n_orphans"] == 2
    assert out.loc["orders->customer", "n_orphans"] == 1
    assert out.loc["lineitem->orders", "n_child"] == 6

    con = duckdb.connect()
    for t in ("lineitem", "orders", "part", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    want = con.sql(FK_AUDIT_SQL).df().set_index("relationship")
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
