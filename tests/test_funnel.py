"""Ordered-step funnel (relational.events_funnel_steps): planted users
prove the STRICT (ts, event_id) ordering rule — events present but out
of order must not convert — and the oracle agrees on the same table."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest


def _write_events(d, rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_s",
                                     "event_type"])
    out = pd.DataFrame({
        "event_id": df["event_id"].astype("int64"),
        "user_id": df["user_id"].astype("int64"),
        "ts": pd.to_datetime(df["ts_s"], unit="s"),
        "event_type": df["event_type"],
        "value": np.zeros(len(df)),
        "properties": ["{}"] * len(df)})
    os.makedirs(d, exist_ok=True)
    out.to_parquet(os.path.join(d, "events.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_funnel_ordering_semantics(tmp_path):
    from pdf_extraction_ray.pipelines.relational import (
        FUNNEL_STEPS_SQL, events_funnel_steps)
    rows = [
        # user 1: full ordered chain view < click < purchase
        (1, 1, 10, "view"), (2, 1, 20, "click"), (3, 1, 30, "purchase"),
        # user 2: purchase BEFORE the click — completes only step 2
        (4, 2, 10, "view"), (5, 2, 30, "click"), (6, 2, 20, "purchase"),
        # user 3: click before the first view — only step 1
        (7, 3, 20, "view"), (8, 3, 10, "click"),
        # user 4: view only
        (9, 4, 10, "view"),
        # user 5: no view at all — not even step 1
        (10, 5, 10, "click"), (11, 5, 20, "purchase"),
        # user 6: same-ts chain ordered by event_id — converts
        (12, 6, 10, "view"), (13, 6, 10, "click"),
        (14, 6, 10, "purchase"),
        # user 7: same-ts chain with event_id REVERSED — view only
        (17, 7, 10, "view"), (16, 7, 10, "click"), (15, 7, 10, "purchase"),
    ]
    d = str(tmp_path / "funnel")
    _write_events(d, rows)
    out = events_funnel_steps(d)
    out = (out.to_pandas() if hasattr(out, "to_pandas") else out) \
        .set_index("step")
    assert out.loc[1, "n_users"] == 6      # users 1,2,3,4,6,7 viewed
    assert out.loc[2, "n_users"] == 3      # users 1,2,6 clicked after
    assert out.loc[3, "n_users"] == 2      # users 1,6 purchased after
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    orc = con.execute(FUNNEL_STEPS_SQL).fetchdf()
    pd.testing.assert_frame_equal(
        out.reset_index().astype({"step": "int64", "n_users": "int64"}),
        orc.astype({"step": "int64", "n_users": "int64"}))


@pytest.mark.usefixtures("ray_session")
def test_funnel_four_steps_parameterized(tmp_path):
    """k=4 chain (round-5: arbitrary step lists): drops must happen at
    every depth, greedy earliest-pick must not be fooled by a decoy
    early pick that kills the rest of the chain (greedy is exact for
    existence), and the generated 4-step oracle agrees."""
    from pdf_extraction_ray.pipelines.relational import (
        events_funnel_steps, funnel_steps_sql)
    steps = ("view", "click", "signup", "purchase")
    rows = [
        # user 1: full 4-chain in order
        (1, 1, 10, "view"), (2, 1, 20, "click"),
        (3, 1, 30, "signup"), (4, 1, 40, "purchase"),
        # user 2: signup BEFORE the click -> stops at step 2
        (5, 2, 10, "view"), (6, 2, 30, "click"),
        (7, 2, 20, "signup"), (8, 2, 40, "purchase"),
        # user 3: stops at step 3 (no purchase after signup)
        (9, 3, 10, "view"), (10, 3, 20, "click"),
        (11, 3, 30, "signup"), (12, 3, 25, "purchase"),
        # user 4: TWO clicks; only the later one precedes signup —
        # greedy takes the EARLIEST click (15) and still converts
        # because signup (30) follows it
        (13, 4, 10, "view"), (14, 4, 15, "click"),
        (15, 4, 25, "click"), (16, 4, 30, "signup"),
        (17, 4, 40, "purchase"),
        # user 5: view only
        (18, 5, 10, "view"),
    ]
    d = str(tmp_path / "funnel4")
    _write_events(d, rows)
    out = events_funnel_steps(d, steps=steps)
    out = (out.to_pandas() if hasattr(out, "to_pandas") else out) \
        .set_index("step")
    assert list(out["event_type"]) == list(steps)
    assert out.loc[1, "n_users"] == 5      # everyone viewed
    assert out.loc[2, "n_users"] == 4      # users 1,2,3,4 clicked after
    assert out.loc[3, "n_users"] == 3      # users 1,3,4 signed up after
    assert out.loc[4, "n_users"] == 2      # users 1,4 purchased after
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    orc = con.execute(funnel_steps_sql(steps)).fetchdf()
    pd.testing.assert_frame_equal(
        out.reset_index().astype({"step": "int64", "n_users": "int64"}),
        orc.astype({"step": "int64", "n_users": "int64"}))


@pytest.mark.usefixtures("ray_session")
def test_funnel_empty(tmp_path):
    from pdf_extraction_ray.pipelines.relational import events_funnel_steps
    d = str(tmp_path / "fe")
    _write_events(d, [])
    out = events_funnel_steps(d)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_funnel_short_chains(tmp_path):
    """Degenerate step lists: k=1 counts first-event users; k=2 is the
    plain strict-order pair — both through the same generated oracle."""
    from pdf_extraction_ray.pipelines.relational import (
        events_funnel_steps, funnel_steps_sql)
    rows = [
        (1, 1, 10, "view"), (2, 1, 20, "click"),
        (3, 2, 20, "view"),
        (4, 3, 10, "click"),            # click with no prior view
    ]
    d = str(tmp_path / "short")
    _write_events(d, rows)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    for steps, expect in ((("view",), [2]),
                          (("view", "click"), [2, 1])):
        out = events_funnel_steps(d, steps=steps)
        out = (out.to_pandas() if hasattr(out, "to_pandas") else out)
        assert list(out["n_users"]) == expect, steps
        orc = con.execute(funnel_steps_sql(steps)).fetchdf()
        pd.testing.assert_frame_equal(
            out.astype({"step": "int64", "n_users": "int64"}),
            orc.astype({"step": "int64", "n_users": "int64"}))
