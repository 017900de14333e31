"""U-shaped (position-based) multi-touch attribution: hand-computed
credit splits per touch count, pre/post-purchase boundary behavior,
and a randomized DuckDB oracle fuzz."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.pipelines.relational import (
    USHAPE_SQL, events_attribution_ushape)


def _write_events(d: str, rows):
    """rows: (event_id, user_id, minutes, event_type)."""
    base = pd.Timestamp("2024-05-01")
    pd.DataFrame({
        "event_id": np.array([r[0] for r in rows], dtype=np.int64),
        "user_id": np.array([r[1] for r in rows], dtype=np.int64),
        "ts": [base + pd.Timedelta(minutes=r[2]) for r in rows],
        "event_type": [r[3] for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))


def _duck(d: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{os.path.join(d, 'events.parquet')}')")
    return con.sql(USHAPE_SQL).df()


@pytest.mark.usefixtures("ray_session")
def test_ushape_hand_computed_splits(tmp_path):
    """n=1 -> 10000; n=2 -> 5000/5000; n=4 -> 4000/1000/1000/4000;
    post-purchase events and later purchases earn nothing."""
    d = str(tmp_path)
    _write_events(d, [
        # user 1: single view then purchase -> view gets 10000
        (1, 1, 0, "view"), (2, 1, 5, "purchase"),
        # user 2: click, view, purchase -> 5000 each
        (3, 2, 0, "click"), (4, 2, 1, "view"), (5, 2, 9, "purchase"),
        # user 3: view click view error purchase -> 4000/1000/1000/4000
        (6, 3, 0, "view"), (7, 3, 1, "click"), (8, 3, 2, "view"),
        (9, 3, 3, "error"), (10, 3, 8, "purchase"),
        # post-first-purchase activity and a second purchase: ignored
        (11, 3, 20, "click"), (12, 3, 30, "purchase"),
        # user 4: no purchase at all -> nothing
        (13, 4, 0, "view"), (14, 4, 1, "click")])
    out = events_attribution_ushape(d).set_index("event_type")
    # view: 10000 (u1) + 5000 (u2) + 4000 + 1000 (u3, first + middle)
    assert out.loc["view", "credit_x10k"] == 20000
    assert out.loc["view", "n_touches"] == 4
    # click: 5000 (u2) + 1000 (u3 middle); u3's post-purchase click
    # and u4's click earn nothing
    assert out.loc["click", "credit_x10k"] == 6000
    assert out.loc["click", "n_touches"] == 2
    # error: the LAST pre-purchase touch of user 3
    assert out.loc["error", "credit_x10k"] == 4000
    assert "purchase" not in out.index
    want = _duck(d)
    pd.testing.assert_frame_equal(
        out.reset_index(), want, check_dtype=False, check_exact=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1])
def test_ushape_fuzz_vs_duckdb(tmp_path, seed):
    rng = np.random.default_rng(500 + seed)
    d = str(tmp_path)
    rows = []
    eid = 0
    for uid in range(int(rng.integers(5, 25))):
        for _ in range(int(rng.integers(1, 12))):
            rows.append((eid, uid, int(rng.integers(0, 300)),
                         str(rng.choice(["view", "click", "signup",
                                         "error", "purchase"]))))
            eid += 1
    _write_events(d, rows)
    got = events_attribution_ushape(d)
    want = _duck(d)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_cohort_ltv_hand_matrix(tmp_path):
    """Two customers: one starts Jan (orders Jan+Mar), one starts Feb
    (order Feb only) -> three cells with exact ages and cents."""
    from pdf_extraction_ray.pipelines.relational import orders_cohort_ltv
    d = str(tmp_path)
    pd.DataFrame({
        "o_orderkey": np.arange(3, dtype=np.int64),
        "o_custkey": np.array([1, 1, 2], dtype=np.int64),
        "o_orderdate": [pd.Timestamp("2024-01-15").date(),
                        pd.Timestamp("2024-03-02").date(),
                        pd.Timestamp("2024-02-20").date()],
        "o_totalprice": [10.0, 20.0, 5.5]}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    out = orders_cohort_ltv(d)
    jan = 2024 * 12 + 1
    want = pd.DataFrame({
        "cohort_mi": np.array([jan, jan, jan + 1], dtype=np.int64),
        "age_months": np.array([0, 2, 0], dtype=np.int64),
        "n_customers": np.ones(3, dtype=np.int64),
        "revenue_x100": np.array([1000, 2000, 550], dtype=np.int64)})
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_brand_top3_dense_rank_ties(tmp_path):
    """Equal prices share a dense rank and do not consume ranks below:
    prices [9, 9, 8, 7, 7, 6] -> ranks [1, 1, 2, 3, 3] kept, 6 cut."""
    from pdf_extraction_ray.pipelines.relational import part_brand_top3
    d = str(tmp_path)
    pd.DataFrame({"p_partkey": np.arange(1, 7, dtype=np.int64),
                  "p_brand": ["B1"] * 6,
                  "p_retailprice": [9.0, 9.0, 8.0, 7.0, 7.0, 6.0]}) \
        .to_parquet(os.path.join(d, "part.parquet"))
    out = part_brand_top3(d).to_pandas()
    assert out["p_partkey"].tolist() == [1, 2, 3, 4, 5]
    assert out["price_rank"].tolist() == [1, 1, 2, 3, 3]


@pytest.mark.usefixtures("ray_session")
def test_rate_limit_burst_and_refill(tmp_path):
    """Burst of 7 instant events: 5 admitted (full bucket), 2
    throttled; an event 10 s later is admitted again (refill); a
    slow user (1/min) is never throttled."""
    from pdf_extraction_ray.pipelines.streaming import events_rate_limited
    d = str(tmp_path)
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(7):                     # user 1: instant burst
        rows.append((i, 1, t0))
    rows.append((7, 1, t0 + pd.Timedelta(seconds=10)))   # refilled
    for i in range(5):                     # user 2: slow, never limited
        rows.append((10 + i, 2, t0 + pd.Timedelta(minutes=i)))
    pd.DataFrame({"event_id": np.array([r[0] for r in rows],
                                       dtype=np.int64),
                  "user_id": np.array([r[1] for r in rows],
                                      dtype=np.int64),
                  "ts": [r[2] for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = events_rate_limited(d).to_pandas().set_index("user_id")
    assert int(out.loc[1, "n_allowed"]) == 6     # 5 burst + 1 refilled
    assert int(out.loc[1, "n_throttled"]) == 2
    assert int(out.loc[2, "n_throttled"]) == 0


@pytest.mark.usefixtures("ray_session")
def test_type_user_lift_hand_case(tmp_path):
    """3 users: u1 {a,b}, u2 {a,b}, u3 {a}. lift(a,b) =
    2*3/(3*2) = 1.0 exactly; a type pair never co-occurring is
    absent."""
    from pdf_extraction_ray.pipelines.relational import (
        events_type_user_lift)
    d = str(tmp_path)
    rows = [(0, 1, "a"), (1, 1, "b"), (2, 2, "a"), (3, 2, "b"),
            (4, 3, "a"), (5, 3, "a")]
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame({"event_id": np.array([r[0] for r in rows],
                                       dtype=np.int64),
                  "user_id": np.array([r[1] for r in rows],
                                      dtype=np.int64),
                  "event_type": [r[2] for r in rows],
                  "ts": [base + pd.Timedelta(minutes=r[0])
                         for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = events_type_user_lift(d)
    assert len(out) == 1
    assert out.iloc[0]["type_a"] == "a" and out.iloc[0]["type_b"] == "b"
    assert int(out.iloc[0]["n_both"]) == 2
    assert int(out.iloc[0]["lift_x1e6"]) == 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_bot_detection_window_boundary(tmp_path):
    """21 events inside one minute flags a bot; an event exactly 60 s
    after the anchor is OUTSIDE its window ([t, t+60s)); same-ts ties
    count fully."""
    from pdf_extraction_ray.pipelines.relational import (
        events_bot_detection)
    d = str(tmp_path)
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(21):                    # user 1: 21 in one second
        rows.append((i, 1, t0))
    rows.append((21, 2, t0))               # user 2: 2 events 60s apart
    rows.append((22, 2, t0 + pd.Timedelta(seconds=60)))
    pd.DataFrame({"event_id": np.array([r[0] for r in rows],
                                       dtype=np.int64),
                  "user_id": np.array([r[1] for r in rows],
                                      dtype=np.int64),
                  "ts": [r[2] for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = events_bot_detection(d).to_pandas().set_index("user_id")
    assert int(out.loc[1, "max_per_minute"]) == 21
    assert int(out.loc[1, "is_bot"]) == 1
    assert int(out.loc[2, "max_per_minute"]) == 1   # 60s is exclusive
    assert int(out.loc[2, "is_bot"]) == 0


@pytest.mark.usefixtures("ray_session")
def test_duplicate_billing_band_semantics(tmp_path):
    """Two same-band charges flag with the two smallest orderkeys as
    evidence; a $100-band boundary crossing does NOT flag."""
    from pdf_extraction_ray.pipelines.relational import (
        orders_duplicate_billing)
    d = str(tmp_path)
    pd.DataFrame({
        "o_orderkey": np.array([10, 20, 30, 40, 50], dtype=np.int64),
        "o_custkey": np.array([1, 1, 1, 2, 2], dtype=np.int64),
        # cust 1: 150.00 and 155.00 share band 1; 99.99 is band 0
        # cust 2: 199.99 (band 1) vs 200.01 (band 2): no flag
        "o_totalprice": [150.00, 155.00, 99.99, 199.99, 200.01]}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    out = orders_duplicate_billing(d)
    assert len(out) == 1
    r = out.iloc[0]
    assert int(r["o_custkey"]) == 1 and int(r["price_band"]) == 1
    assert int(r["first_order"]) == 10 and int(r["second_order"]) == 20


@pytest.mark.usefixtures("ray_session")
def test_growth_accounting_lifecycle(tmp_path):
    """One user active weeks {0, 1, 3}: new@0, retained@1, churned@2,
    resurrected@3; a week-3-only user is new@3; churn past the global
    last week is NOT emitted."""
    from pdf_extraction_ray.pipelines.relational import (
        events_growth_accounting)
    d = str(tmp_path)
    base = pd.Timestamp("1970-01-01")      # epoch-week aligned
    rows = [(1, 0), (1, 1), (1, 3), (2, 3)]
    pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "user_id": np.array([r[0] for r in rows], dtype=np.int64),
        "ts": [base + pd.Timedelta(weeks=r[1], hours=5)
               for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = events_growth_accounting(d)
    got = {(int(r.wk), r.cls): int(r.n_users)
           for r in out.itertuples(index=False)}
    assert got == {(0, "new"): 1, (1, "retained"): 1,
                   (2, "churned"): 1, (3, "resurrected"): 1,
                   (3, "new"): 1}


@pytest.mark.usefixtures("ray_session")
def test_tier_transitions_totals_and_absents(tmp_path):
    """Matrix totals: sum over the matrix equals distinct customers;
    a first-half-only customer lands in (tier, 0), a second-half-only
    one in (0, tier)."""
    from pdf_extraction_ray.pipelines.relational import (
        customer_tier_transitions)
    d = str(tmp_path)
    rng = np.random.default_rng(31)
    rows = []
    okey = 0
    early = pd.Timestamp("2024-01-10")
    late = pd.Timestamp("2024-12-10")
    for cust in range(1, 31):
        halves = {1: [early], 2: [late], 0: [early, late]}[cust % 3]
        for ts in halves:
            rows.append((okey, cust, ts.date(),
                         float(rng.integers(100, 9999)) / 1.0))
            okey += 1
    pd.DataFrame(rows, columns=["o_orderkey", "o_custkey",
                                "o_orderdate", "o_totalprice"]) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    out = customer_tier_transitions(d)
    assert int(out["n_customers"].sum()) == 30
    from_only = out[(out["tier_to"] == 0) & (out["tier_from"] > 0)]
    to_only = out[(out["tier_from"] == 0) & (out["tier_to"] > 0)]
    assert int(from_only["n_customers"].sum()) == 10   # cust % 3 == 1
    assert int(to_only["n_customers"].sum()) == 10     # cust % 3 == 2


@pytest.mark.usefixtures("ray_session")
def test_error_incidents_islands(tmp_path):
    """Burning minutes {0, 1, 2} and {5} form two incidents with exact
    spans and error totals; a 1-error minute never flags."""
    from pdf_extraction_ray.pipelines.relational import (
        events_error_incidents)
    d = str(tmp_path)
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for minute, n_err in ((0, 2), (1, 3), (2, 2), (3, 1), (5, 2)):
        for k in range(n_err):
            rows.append((eid, "error",
                         t0 + pd.Timedelta(minutes=minute, seconds=k)))
            eid += 1
    rows.append((eid, "view", t0))
    pd.DataFrame({"event_id": np.array([r[0] for r in rows],
                                       dtype=np.int64),
                  "event_type": [r[1] for r in rows],
                  "ts": [r[2] for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = events_error_incidents(d)
    assert len(out) == 2
    assert out["duration_min"].tolist() == [3, 1]
    assert out["n_errors"].tolist() == [7, 2]


@pytest.mark.usefixtures("ray_session")
def test_repeat_conversion_hand_case(tmp_path):
    """3 customers: gaps {10, 30} days and one one-timer -> repeat
    rate 2/3, med2 = 10 + 30 = 40."""
    from pdf_extraction_ray.pipelines.relational import (
        orders_repeat_conversion)
    d = str(tmp_path)
    base = pd.Timestamp("2024-01-01")
    rows = [(1, 1, 0), (2, 1, 10),
            (3, 2, 0), (4, 2, 30), (5, 2, 60),
            (6, 3, 5)]
    pd.DataFrame({
        "o_orderkey": np.array([r[0] for r in rows], dtype=np.int64),
        "o_custkey": np.array([r[1] for r in rows], dtype=np.int64),
        "o_orderdate": [(base + pd.Timedelta(days=r[2])).date()
                        for r in rows],
        "o_totalprice": [10.0] * 6}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    out = orders_repeat_conversion(d)
    assert int(out["n_customers"].iloc[0]) == 3
    assert int(out["n_repeat"].iloc[0]) == 2
    assert int(out["repeat_rate_x1e6"].iloc[0]) == 666_666
    assert int(out["gap_days_med2"].iloc[0]) == 40


@pytest.mark.usefixtures("ray_session")
def test_revenue_waterfall_new_vs_returning(tmp_path):
    """A customer is 'new' only in its first month — even with several
    first-month orders — and 'returning' afterwards."""
    from pdf_extraction_ray.pipelines.relational import (
        orders_revenue_waterfall)
    d = str(tmp_path)
    rows = [(1, 1, "2024-01-05", 10.0), (2, 1, "2024-01-20", 20.0),
            (3, 1, "2024-02-10", 40.0),
            (4, 2, "2024-02-15", 5.0)]
    pd.DataFrame({
        "o_orderkey": np.array([r[0] for r in rows], dtype=np.int64),
        "o_custkey": np.array([r[1] for r in rows], dtype=np.int64),
        "o_orderdate": [pd.Timestamp(r[2]).date() for r in rows],
        "o_totalprice": [r[3] for r in rows]}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    out = orders_revenue_waterfall(d).set_index("mi")
    jan, feb = 2024 * 12 + 1, 2024 * 12 + 2
    assert int(out.loc[jan, "new_rev_x100"]) == 3000   # both Jan orders
    assert int(out.loc[jan, "n_new"]) == 1
    assert int(out.loc[feb, "new_rev_x100"]) == 500    # cust 2 only
    assert int(out.loc[feb, "ret_rev_x100"]) == 4000   # cust 1 returns
    assert int(out.loc[feb, "n_returning"]) == 1


@pytest.mark.usefixtures("ray_session")
def test_anomalous_users_iqr_fence(tmp_path):
    """20 users at ~5 events, one whale at 60: only the whale crosses
    Tukey's upper fence."""
    from pdf_extraction_ray.pipelines.relational import (
        events_anomalous_users_iqr)
    d = str(tmp_path)
    rng = np.random.default_rng(41)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01")
    for uid in range(1, 21):
        for _ in range(int(rng.integers(4, 7))):
            rows.append((eid, uid)); eid += 1
    for _ in range(60):
        rows.append((eid, 99)); eid += 1
    pd.DataFrame({"event_id": np.array([r[0] for r in rows],
                                       dtype=np.int64),
                  "user_id": np.array([r[1] for r in rows],
                                      dtype=np.int64),
                  "ts": [base + pd.Timedelta(seconds=r[0])
                         for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = events_anomalous_users_iqr(d)
    assert out["user_id"].tolist() == [99]
    assert int(out["n_events"].iloc[0]) == 60
