"""Watermark late-arrival accounting: planted out-of-order events must
be flagged late (the all-in-order synthetic log yields zero lates, so
these tests are what distinguishes a dead kernel from a quiet one),
bucketing must not change the result (carry-in correctness), and the
whole thing must match the DuckDB window oracle bit-exactly."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.pipelines import streaming as S


def _mk_events(d: str):
    """20 arrivals, one per hour of event time — except arrivals 5 and
    12 which carry event times 2h behind the running max (late at the
    10-minute allowance), and arrival 7 which is only 5 min behind
    (NOT late)."""
    base = pd.Timestamp("2024-01-01")
    ts = [base + pd.Timedelta(hours=i) for i in range(20)]
    ts[5] = ts[4] - pd.Timedelta(hours=2)
    ts[12] = ts[11] - pd.Timedelta(hours=2)
    ts[7] = ts[6] - pd.Timedelta(minutes=5)
    pd.DataFrame({"event_id": np.arange(20, dtype=np.int64),
                  "ts": ts}).to_parquet(os.path.join(d, "events.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_watermark_flags_planted_late_arrivals(tmp_path):
    d = str(tmp_path)
    _mk_events(d)
    out = S.events_watermark_lateness(d, bucket_rows=4)   # 5 buckets
    assert int(out.n_late.sum()) == 2                     # arrivals 5, 12
    assert int(out.n_events.sum()) == 20
    # the 5-minutes-behind arrival is within the allowance
    late_hours = set(out.loc[out.n_late > 0, "hr"])
    assert len(late_hours) == 2


@pytest.mark.usefixtures("ray_session")
def test_watermark_bucket_invariance_and_oracle(tmp_path):
    """Result is independent of the arrival-bucket width (carry-in
    correct across buckets) and matches the SQL window oracle."""
    d = str(tmp_path)
    _mk_events(d)
    fine = S.events_watermark_lateness(d, bucket_rows=3)
    one = S.events_watermark_lateness(d, bucket_rows=10_000)
    pd.testing.assert_frame_equal(fine, one, check_exact=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{os.path.join(d, 'events.parquet')}')")
    want = con.sql(S.WATERMARK_SQL).df()
    got = fine
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
