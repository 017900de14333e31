"""Stream-stream last-click attribution: planted boundary cases (log-
order ties, exact-window lag, eviction, click reuse) against the
windowed self-join oracle."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.pipelines.streaming import (
    ATTR_WINDOW_MS, STREAM_ATTRIBUTION_SQL, events_stream_attribution)

T0 = pd.Timestamp("2022-01-01 12:00:00")
MS = pd.Timedelta(milliseconds=1)
H = pd.Timedelta(hours=1)


def _dir(tmp_path):
    rows = [
        # u1: click at t0, purchase exactly 1h later -> lag == window, match
        (1, T0, 1, "click"),
        (2, T0 + H, 1, "purchase"),
        # u2: click, purchase 1h + 1ms later -> outside window, no match
        (3, T0, 2, "click"),
        (4, T0 + H + MS, 2, "purchase"),
        # u3: same-ts tie, click id < purchase id -> click is earlier in
        # log order, match
        (5, T0, 3, "click"),
        (6, T0, 3, "purchase"),
        # u4: same-ts tie, click id > purchase id -> later in log order,
        # no match
        (8, T0, 4, "purchase"),
        (9, T0, 4, "click"),
        # u5: two clicks in window -> newest wins; second purchase
        # reuses the same click
        (10, T0, 5, "click"),
        (11, T0 + MS * 500, 5, "click"),
        (12, T0 + MS * 900, 5, "purchase"),
        (13, T0 + MS * 1000, 5, "purchase"),
        # u6: purchase with no click at all
        (14, T0, 6, "purchase"),
        # u7: stale click evicted on the LATER click's arrival; the
        # purchase just after matches the fresh click
        (15, T0, 7, "click"),
        (16, T0 + 2 * H, 7, "click"),
        (17, T0 + 2 * H + MS, 7, "purchase"),
    ]
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    ev["event_id"] = ev["event_id"].astype(np.int64)
    ev["user_id"] = ev["user_id"].astype(np.int64)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["value"] = 1.0
    ev["props"] = '{"k": 1}'
    d = str(tmp_path / "attr")
    os.makedirs(d, exist_ok=True)
    ev.to_parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.mark.usefixtures("ray_session")
def test_planted_boundaries(tmp_path):
    d = _dir(tmp_path)
    got = events_stream_attribution(d).set_index("purchase_id")
    # u1: exact-window lag matches
    assert got.loc[2, "click_id"] == 1
    assert got.loc[2, "lag_ms"] == ATTR_WINDOW_MS
    # u2: one ms past the window does not
    assert 4 not in got.index
    # u3 tie: click earlier in log order matches at lag 0
    assert got.loc[6, "click_id"] == 5 and got.loc[6, "lag_ms"] == 0
    # u4 tie: click later in log order does not
    assert 8 not in got.index
    # u5: newest click wins, and is reused by the second purchase
    assert got.loc[12, "click_id"] == 11
    assert got.loc[13, "click_id"] == 11
    # u6: no click, no row
    assert 14 not in got.index
    # u7: fresh click wins after the stale one was evicted click-side
    assert got.loc[17, "click_id"] == 16 and got.loc[17, "lag_ms"] == 1


@pytest.mark.usefixtures("ray_session")
def test_matches_oracle(tmp_path):
    d = _dir(tmp_path)
    got = events_stream_attribution(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    want = con.sql(STREAM_ATTRIBUTION_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


# ---------------------------------------------------------------------------
# Gap-session windows (events_stream_sessions)
# ---------------------------------------------------------------------------

from pdf_extraction_ray.pipelines.streaming import (   # noqa: E402
    SESSION_GAP_MS, STREAM_SESSIONS_SQL, events_stream_sessions)

GAP = pd.Timedelta(milliseconds=SESSION_GAP_MS)


def _sessions_dir(tmp_path):
    rows = [
        # u1: gap EXACTLY 30 min -> same session (strict > breaks)
        (1, T0), (1, T0 + GAP),
        # gap 30 min + 1ms after the last event -> new session
        (1, T0 + 2 * GAP + MS),
        # u2: single event
        (2, T0),
        # u3: three sessions, each one event, exact numbering
        (3, T0), (3, T0 + GAP + MS), (3, T0 + 2 * (GAP + MS)),
        # u10 (different bucket than u2 under %8): interleaved with the
        # others, isolation check
        (10, T0), (10, T0 + MS),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    d = str(tmp_path / "sess")
    os.makedirs(d, exist_ok=True)
    ev.to_parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.mark.usefixtures("ray_session")
def test_session_gap_boundaries(tmp_path):
    d = _sessions_dir(tmp_path)
    got = events_stream_sessions(d)
    g1 = got[got.user_id == 1]
    assert list(g1.session_id) == [1, 2]
    assert list(g1.n_events) == [2, 1]       # exact-gap pair stays joined
    assert list(got[got.user_id == 2].n_events) == [1]
    assert list(got[got.user_id == 3].session_id) == [1, 2, 3]
    g10 = got[got.user_id == 10]
    assert list(g10.n_events) == [2]
    assert (g10.end_ms - g10.start_ms).iloc[0] == 1


@pytest.mark.usefixtures("ray_session")
def test_sessions_match_oracle(tmp_path):
    d = _sessions_dir(tmp_path)
    got = events_stream_sessions(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    want = con.sql(STREAM_SESSIONS_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


# ---------------------------------------------------------------------------
# windowed top-k event types
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_stream_topk_tiebreak_and_window_split(tmp_path):
    """Counts 3,3,2,2 in hour 0 (tie at the k=3 boundary resolves to the
    lexicographically smaller type) and a second hour proving windows
    never mix; users spread across buckets so partial merge is real."""
    from pdf_extraction_ray.pipelines.streaming import (
        STREAM_TOPK_SQL, events_stream_topk)
    rows = []
    eid = 0
    for ty, cnt in (("a", 3), ("b", 3), ("c", 2), ("d", 2)):
        for i in range(cnt):
            eid += 1
            rows.append((eid, T0 + MS * eid, eid % 5, ty))
    for ty, cnt in (("d", 2), ("a", 1)):      # hour 2: different winner
        for i in range(cnt):
            eid += 1
            rows.append((eid, T0 + 2 * H + MS * eid, eid % 5, ty))
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    ev["event_id"] = ev["event_id"].astype(np.int64)
    ev["user_id"] = ev["user_id"].astype(np.int64)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["value"] = 1.0
    d = str(tmp_path / "topk")
    os.makedirs(d, exist_ok=True)
    ev.to_parquet(os.path.join(d, "events.parquet"))

    out = events_stream_topk(d)
    h0 = out[out.hour == T0.strftime("%Y-%m-%d %H")]
    assert list(zip(h0.event_type, h0.n, h0.rnk)) == \
        [("a", 3, 1), ("b", 3, 2), ("c", 2, 3)]
    h2 = out[out.hour == (T0 + 2 * H).strftime("%Y-%m-%d %H")]
    assert list(zip(h2.event_type, h2.n, h2.rnk)) == \
        [("d", 2, 1), ("a", 1, 2)]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    odf = con.sql(STREAM_TOPK_SQL).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), odf, check_dtype=False)


# ---------------------------------------------------------------------------
# Symmetric interval join: planted boundaries + oracle on random logs
# ---------------------------------------------------------------------------

from pdf_extraction_ray.pipelines.streaming import (     # noqa: E402
    IJOIN_WINDOW_MS, STREAM_IJOIN_SQL, events_stream_interval_join)

W = pd.Timedelta(milliseconds=IJOIN_WINDOW_MS)


def _ijoin_dir(tmp_path):
    rows = [
        # u1: click exactly W after the view -> inclusive match
        (1, T0, 1, "view"),
        (2, T0 + W, 1, "click"),
        # u2: click W+1ms after -> no match
        (3, T0, 2, "view"),
        (4, T0 + W + MS, 2, "click"),
        # u3: click BEFORE the view (future-side pair, dt negative)
        (5, T0, 3, "click"),
        (6, T0 + MS * 700, 3, "view"),
        # u4: same-ts view/click -> dt 0, matched once
        (7, T0, 4, "view"),
        (8, T0, 4, "click"),
        # u5: 2 views x 2 clicks all inside one window -> 4 pairs
        (9, T0, 5, "view"),
        (10, T0 + MS * 100, 5, "click"),
        (11, T0 + MS * 200, 5, "view"),
        (12, T0 + MS * 300, 5, "click"),
        # u6: other event types never pair
        (13, T0, 6, "purchase"),
        (14, T0, 6, "view"),
    ]
    ev = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    ev["event_id"] = ev["event_id"].astype(np.int64)
    ev["user_id"] = ev["user_id"].astype(np.int64)
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["value"] = 1.0
    ev["props"] = "{}"
    d = str(tmp_path / "ijoin")
    os.makedirs(d, exist_ok=True)
    ev.to_parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.mark.usefixtures("ray_session")
def test_interval_join_planted_boundaries(tmp_path):
    d = _ijoin_dir(tmp_path)
    got = events_stream_interval_join(d)
    pairs = set(zip(got["view_id"], got["click_id"]))
    assert (1, 2) in pairs                      # inclusive at +W
    assert (3, 4) not in pairs                  # 1 ms past the window
    assert (6, 5) in pairs                      # click before view
    assert int(got.set_index(["view_id", "click_id"])
               .loc[(6, 5), "dt_ms"]) == -700   # signed dt
    assert (7, 8) in pairs                      # same-ts, once
    u5 = {p for p in pairs if p[0] in (9, 11)}
    assert u5 == {(9, 10), (9, 12), (11, 10), (11, 12)}
    assert not any(v == 14 or c == 13 for v, c in pairs)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [3, 17])
def test_interval_join_matches_oracle_random(tmp_path, seed):
    rng = np.random.default_rng(seed)
    n = 300
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 6, size=n).astype(np.int64),
        "ts": (pd.Timestamp("2023-03-01")
               + pd.to_timedelta(rng.integers(0, 10 * IJOIN_WINDOW_MS,
                                              size=n), unit="ms"))
        .astype("datetime64[us]"),
        "event_type": rng.choice(["view", "click", "error"], size=n),
        "value": 1.0, "props": "{}"})
    d = str(tmp_path / f"rij{seed}")
    os.makedirs(d, exist_ok=True)
    ev.to_parquet(os.path.join(d, "events.parquet"))
    got = events_stream_interval_join(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    want = con.sql(STREAM_IJOIN_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"view_id": "int64", "click_id": "int64",
                     "user_id": "int64", "dt_ms": "int64"}),
        check_dtype=False)
