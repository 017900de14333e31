"""Rank-statistics tier: Spearman sign/magnitude on planted monotonic
data, Mann-Whitney U on hand-computed tie cases, Bollinger degenerate
(zero-variance) bands, Theil-Sen exactness on linear revenue, and a
randomized DuckDB oracle fuzz over the tie-heavy regime."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.pipelines import ranks as R


def _mk_nation_fixture(d: str, qty, price):
    pd.DataFrame({
        "l_suppkey": np.ones(len(qty), dtype=np.int64),
        "l_quantity": np.asarray(qty, dtype=np.float64),
        "l_extendedprice": np.asarray(price, dtype=np.float64),
        "l_discount": np.zeros(len(qty))}) \
        .to_parquet(os.path.join(d, "lineitem.parquet"))
    pd.DataFrame({"s_suppkey": [1], "s_nationkey": [0]}) \
        .to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame({"n_nationkey": [0], "n_name": ["ALPHA"]}) \
        .to_parquet(os.path.join(d, "nation.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_spearman_monotonic_is_exactly_one(tmp_path):
    """A strictly monotonic (even nonlinear) relation has identical
    rank orders, so rho is EXACTLY 1.0 (integer moments cancel)."""
    d = str(tmp_path)
    qty = np.arange(1, 21, dtype=np.float64)
    _mk_nation_fixture(d, qty, qty ** 2 + 7.0)
    out = R.lineitem_spearman_by_nation(d)
    assert list(out.nation) == ["ALPHA"]
    assert out.spearman_r.iloc[0] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_spearman_antitonic_is_exactly_minus_one(tmp_path):
    d = str(tmp_path)
    qty = np.arange(1, 16, dtype=np.float64)
    _mk_nation_fixture(d, qty, 1000.0 - 3.0 * qty)
    out = R.lineitem_spearman_by_nation(d)
    # sqrt(dx)*sqrt(dy) rounds one ulp off dx, so the IEEE result is
    # -1-1ulp on BOTH engines; assert bit-parity with the oracle, not
    # the algebraic -1
    assert abs(out.spearman_r.iloc[0] + 1.0) < 1e-14
    want = _duck(d, R.SPEARMAN_SQL)
    assert out.spearman_r.iloc[0] == want.spearman_r.iloc[0]


@pytest.mark.usefixtures("ray_session")
def test_mannwhitney_separated_and_tied(tmp_path):
    """Fully separated samples give U in {0, n1*n2}; a planted tie
    across groups gives the hand-computed half-rank U (x2 exact)."""
    d = str(tmp_path)
    pd.DataFrame({"event_type": ["a"] * 3 + ["b"] * 3,
                  "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = R.events_type_mannwhitney(d).set_index("event_type")
    assert out.loc["a", "u_x2"] == 0            # every a below every b
    assert out.loc["b", "u_x2"] == 2 * 3 * 3    # n1*n2, doubled

    d2 = str(tmp_path / "tied")
    os.makedirs(d2)
    # values [1, 2] vs [2, 3]: avg ranks 1, 2.5 | 2.5, 4
    # R_a = 3.5 -> U_a = 0.5 -> u_x2 = 1; U_b = n1*n2 - U_a = 3.5 -> 7
    pd.DataFrame({"event_type": ["a", "a", "b", "b"],
                  "value": [1.0, 2.0, 2.0, 3.0]}) \
        .to_parquet(os.path.join(d2, "events.parquet"))
    out2 = R.events_type_mannwhitney(d2).set_index("event_type")
    assert out2.loc["a", "u_x2"] == 1
    assert out2.loc["b", "u_x2"] == 7


@pytest.mark.usefixtures("ray_session")
def test_bollinger_constant_series_collapses(tmp_path):
    """A constant hourly count series has zero variance: both bands
    equal the mean equal the count, and the k=1 first hour is absent."""
    d = str(tmp_path)
    base = pd.Timestamp("2024-01-01")
    ts = [base + pd.Timedelta(hours=h, minutes=m * 7)
          for h in range(30) for m in range(3)]
    pd.DataFrame({"ts": ts}).to_parquet(os.path.join(d, "events.parquet"))
    out = R.events_hourly_bollinger(d)
    assert len(out) == 29                       # first hour dropped (k=1)
    assert (out.c == 3).all()
    assert (out.mean_c == 3.0).all()
    assert (out.lower == 3.0).all()
    assert (out.upper == 3.0).all()


@pytest.mark.usefixtures("ray_session")
def test_theilsen_linear_revenue_exact(tmp_path):
    """One order per month with revenue linear in the month index:
    every pairwise slope equals the true slope, so slope_med2 is
    exactly twice it."""
    d = str(tmp_path)
    months = pd.date_range("2023-01-15", periods=12, freq="MS")
    pd.DataFrame({"o_orderdate": months,
                  "o_totalprice": 100.0 + 10.0 * np.arange(12)}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    out = R.orders_monthly_theilsen(d)
    assert out.n_points.iloc[0] == 12
    assert out.n_pairs.iloc[0] == 12 * 11 // 2
    assert out.slope_med2.iloc[0] == 2 * 1000.0  # 10 dollars = 1000 cents


@pytest.mark.usefixtures("ray_session")
def test_kendall_monotone_and_tied(tmp_path):
    """Values strictly increasing in time give tau_b = +1 (all pairs
    concordant); a planted tie case matches the hand count."""
    d = str(tmp_path)
    base = pd.Timestamp("2024-01-01")
    ts = [base + pd.Timedelta(minutes=i) for i in range(10)]
    pd.DataFrame({"event_id": np.arange(10, dtype=np.int64),
                  "event_type": ["a"] * 10, "ts": ts,
                  "value": np.arange(10, dtype=np.float64)}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = R.events_type_kendall(d)
    assert out.cmd.iloc[0] == 10 * 9 // 2       # all concordant
    assert abs(out.tau_b.iloc[0] - 1.0) < 1e-14

    d2 = str(tmp_path / "tied")
    os.makedirs(d2)
    # times 0,1,2,3 with values 1,2,2,1: pairs (0,1)+ (0,2)+ (0,3)=
    # (1,1) tie-y=0, (1,2) tie 0, (1,3)- , (2,3)-  -> cmd = 2-2 = 0
    pd.DataFrame({"event_id": np.arange(4, dtype=np.int64),
                  "event_type": ["a"] * 4,
                  "ts": [base + pd.Timedelta(minutes=i) for i in range(4)],
                  "value": [1.0, 2.0, 2.0, 1.0]}) \
        .to_parquet(os.path.join(d2, "events.parquet"))
    out2 = R.events_type_kendall(d2)
    assert out2.cmd.iloc[0] == 0
    assert out2.tau_b.iloc[0] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_xcorr_detects_planted_lag(tmp_path):
    """Purchases planted as an exact 3-hour-delayed copy of the click
    pattern peak the cross-correlation at lag 3 with r ~ 1."""
    d = str(tmp_path)
    base = pd.Timestamp("2024-01-01")
    rng = np.random.default_rng(7)
    clicks_per_hr = rng.integers(1, 9, size=60)
    rows = []
    for h, c in enumerate(clicks_per_hr):
        for k in range(int(c)):
            rows.append(("click", base + pd.Timedelta(hours=h, minutes=k)))
        for k in range(int(c)):                  # same counts, +3 hours
            rows.append(("purchase",
                         base + pd.Timedelta(hours=h + 3, minutes=30 + k)))
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    df.to_parquet(os.path.join(d, "events.parquet"))
    out = R.events_hourly_xcorr(d)
    best = out.loc[out.xcorr.idxmax()]
    assert best.lag == 3
    assert best.xcorr > 0.999999


# ---------------------------------------------------------------------------
# randomized oracle fuzz (tie-heavy regime: tiny value domains)
# ---------------------------------------------------------------------------

def _duck(d: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("lineitem", "supplier", "nation", "orders", "events"):
        p = os.path.join(d, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{p}')")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mannwhitney_fuzz_vs_duckdb(tmp_path, seed):
    rng = np.random.default_rng(seed)
    d = str(tmp_path)
    n = int(rng.integers(20, 120))
    pd.DataFrame({
        "event_type": rng.choice(list("abc"), size=n),
        # domain of 6 distinct cents values -> dense cross-group ties
        "value": rng.integers(0, 6, size=n) / 2.0}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    got = _canon(R.events_type_mannwhitney(d))
    want = _canon(_duck(d, R.MANNWHITNEY_SQL))
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1])
def test_kendall_fuzz_vs_duckdb(tmp_path, seed):
    rng = np.random.default_rng(200 + seed)
    d = str(tmp_path)
    n = int(rng.integers(20, 100))
    base = pd.Timestamp("2024-01-01")
    # coarse second-resolution times + tiny value domain -> many ties
    pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(list("ab"), size=n),
        "ts": [base + pd.Timedelta(seconds=int(s))
               for s in rng.integers(0, 30, size=n)],
        "value": rng.integers(0, 5, size=n) / 2.0}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    got = _canon(R.events_type_kendall(d))
    want = _canon(_duck(d, R.KENDALL_SQL))
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1])
def test_spearman_fuzz_vs_duckdb(tmp_path, seed):
    rng = np.random.default_rng(100 + seed)
    d = str(tmp_path)
    n = int(rng.integers(30, 150))
    _mk_nation_fixture(
        d, rng.integers(1, 8, size=n).astype(np.float64),
        rng.integers(1, 10, size=n).astype(np.float64) * 25.0)
    got = _canon(R.lineitem_spearman_by_nation(d))
    want = _canon(_duck(d, R.SPEARMAN_SQL))
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_decompose_constant_series_is_flat(tmp_path):
    """A constant hourly series decomposes exactly: trend == the
    constant, seasonal == 0, residual == 0 (all integer-derived)."""
    d = str(tmp_path)
    base = pd.Timestamp("2024-01-01")
    n_hours = 3 * 24 + 5
    rows = []
    for h in range(n_hours):
        for k in range(3):                    # exactly 3 events/hour
            rows.append((len(rows), base + pd.Timedelta(hours=h,
                                                        minutes=k)))
    pd.DataFrame({"event_id": [r[0] for r in rows],
                  "ts": [r[1] for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = R.events_hourly_decompose(d)
    assert len(out) == n_hours - R.DECOMP_W + 1
    assert (out["trend"] == 3.0).all()
    assert (out["seasonal"] == 0.0).all()
    assert (out["resid"] == 0.0).all()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1])
def test_decompose_fuzz_vs_duckdb(tmp_path, seed):
    """Random hourly batches (with gap hours) must decompose
    bit-identically to the WITH-window oracle."""
    rng = np.random.default_rng(300 + seed)
    d = str(tmp_path)
    base = pd.Timestamp("2024-03-01")
    ts = []
    for h in range(int(rng.integers(30, 80))):
        if rng.random() < 0.2:
            continue                          # gap hour -> dense zero
        for _ in range(int(rng.integers(1, 6))):
            ts.append(base + pd.Timedelta(hours=h,
                                          seconds=int(rng.integers(3600))))
    pd.DataFrame({"event_id": np.arange(len(ts), dtype=np.int64),
                  "ts": ts}).to_parquet(os.path.join(d, "events.parquet"))
    got = _canon(R.events_hourly_decompose(d))
    want = _canon(_duck(d, R.DECOMPOSE_SQL))
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def _mk_orders_daily(d: str, revs):
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame({
        "o_orderkey": np.arange(len(revs), dtype=np.int64),
        "o_orderdate": [(base + pd.Timedelta(days=i)).date()
                        for i in range(len(revs))],
        "o_totalprice": np.asarray(revs, dtype=np.float64)}) \
        .to_parquet(os.path.join(d, "orders.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_runs_test_extremes(tmp_path):
    """A perfectly alternating hi/lo sequence maximizes runs (= n);
    a sorted ramp gives exactly 2 runs (below-block then above-block).
    z sign: alternating -> positive, ramp -> negative."""
    d = str(tmp_path)
    # alternate around a single median day (50, dropped by the rule)
    _mk_orders_daily(d, [10.0, 99.0] * 10 + [50.0])
    out = R.orders_daily_runs_test(d)
    assert int(out["n_days"].iloc[0]) == 20
    assert int(out["runs"].iloc[0]) == 20
    assert out["runs_z"].iloc[0] > 0

    d2 = str(tmp_path / "ramp")
    os.makedirs(d2)
    _mk_orders_daily(d2, [float(10 + i) for i in range(21)])
    out2 = R.orders_daily_runs_test(d2)
    # 21 days, lower median day dropped -> 10 below + 10 above, 2 runs
    assert int(out2["n_days"].iloc[0]) == 20
    assert int(out2["runs"].iloc[0]) == 2
    assert out2["runs_z"].iloc[0] < 0


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1])
def test_runs_test_fuzz_vs_duckdb(tmp_path, seed):
    rng = np.random.default_rng(600 + seed)
    d = str(tmp_path)
    # duplicated revenue values -> median ties get dropped
    _mk_orders_daily(d, (rng.integers(1, 15, size=int(
        rng.integers(10, 60))) * 7.5).tolist())
    got = _canon(R.orders_daily_runs_test(d))
    want = _canon(_duck(d, R.RUNS_TEST_SQL))
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_spectral_planted_24h_cycle(tmp_path):
    """A pure 24-hour sinusoid over 8 days peaks exactly at freq index
    n/24 (8 cycles)."""
    d = str(tmp_path)
    base = pd.Timestamp("2024-01-01")
    ts = []
    for h in range(8 * 24):
        count = 5 + int(round(4 * np.cos(2 * np.pi * h / 24)))
        for k in range(count):
            ts.append(base + pd.Timedelta(hours=h, minutes=k))
    pd.DataFrame({"event_id": np.arange(len(ts), dtype=np.int64),
                  "ts": ts}).to_parquet(os.path.join(d, "events.parquet"))
    out = R.events_hourly_spectral(d)
    assert int(out["freq_idx"].iloc[0]) == 8          # n/24 cycles
    assert int(out["period_mhours"].iloc[0]) == 24000


@pytest.mark.usefixtures("ray_session")
def test_mannkendall_extremes(tmp_path):
    """Strictly increasing monthly revenue -> S = n(n-1)/2 and large
    positive z; constant revenue is all-ties (empty, var = 0)."""
    d = str(tmp_path)
    dates, prices = [], []
    for i in range(12):
        dates.append(pd.Timestamp(f"2024-{i+1:02d}-10").date())
        prices.append(100.0 + 10.0 * i)
    pd.DataFrame({"o_orderkey": np.arange(12, dtype=np.int64),
                  "o_orderdate": dates,
                  "o_totalprice": prices}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    out = R.orders_monthly_mannkendall(d)
    assert int(out["s_stat"].iloc[0]) == 66           # 12*11/2
    assert out["mk_z"].iloc[0] > 3.0

    d2 = str(tmp_path / "const")
    os.makedirs(d2)
    pd.DataFrame({"o_orderkey": np.arange(12, dtype=np.int64),
                  "o_orderdate": dates,
                  "o_totalprice": [100.0] * 12}) \
        .to_parquet(os.path.join(d2, "orders.parquet"))
    assert R.orders_monthly_mannkendall(d2).empty     # var18 == 0


@pytest.mark.usefixtures("ray_session")
def test_cusum_recursion_identity(tmp_path):
    """The prefix-min/max closed form must equal the literal CUSUM
    recursion on a random series; a planted level shift drives
    cusum_pos up only after the shift hour."""
    d = str(tmp_path)
    base = pd.Timestamp("2024-01-01")
    rng = np.random.default_rng(13)
    counts = np.concatenate([rng.integers(2, 5, size=30),
                             rng.integers(8, 12, size=20)])  # level shift
    ts = []
    for h, c in enumerate(counts):
        for k in range(int(c)):
            ts.append(base + pd.Timedelta(hours=h, minutes=k))
    pd.DataFrame({"event_id": np.arange(len(ts), dtype=np.int64),
                  "ts": ts}).to_parquet(os.path.join(d, "events.parquet"))
    out = R.events_hourly_cusum(d)
    n = len(counts)
    y = counts.astype(np.int64) * n - int(counts.sum())
    sp = sn = 0
    for i, yi in enumerate(y):
        sp = max(0, sp + int(yi))
        sn = max(0, sn - int(yi))
        assert int(out["cusum_pos"].iloc[i]) == sp
        assert int(out["cusum_neg"].iloc[i]) == sn
    assert int(out["cusum_pos"].iloc[29]) < int(out["cusum_pos"].iloc[-1])


@pytest.mark.usefixtures("ray_session")
def test_next_higher_revenue_stack_semantics(tmp_path):
    """Revenues [5, 3, 4, 6, 2] by consecutive day: next strictly
    higher at +3, +1, +1, never, never."""
    d = str(tmp_path)
    _mk_orders_daily(d, [5.0, 3.0, 4.0, 6.0, 2.0])
    out = R.orders_next_higher_revenue(d)
    assert out["days_to_higher"].tolist() == [3, 1, 1, -1, -1]
    got = _canon(out)
    want = _canon(_duck(d, R.NEXT_HIGHER_SQL))
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_slo_burn_needs_both_windows(tmp_path):
    """A single-hour error spike does NOT alert (the 6 h window
    dilutes it on a long healthy history); a sustained burn alerts."""
    d = str(tmp_path)
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    # 24 healthy hours: 100 views/hour, zero errors
    for h in range(24):
        for k in range(100):
            rows.append((eid, "view", base + pd.Timedelta(
                hours=h, seconds=k))); eid += 1
    # hour 24: a 30% error spike (one hour only)
    for k in range(70):
        rows.append((eid, "view", base + pd.Timedelta(
            hours=24, seconds=k))); eid += 1
    for k in range(30):
        rows.append((eid, "error", base + pd.Timedelta(
            hours=24, seconds=100 + k))); eid += 1
    # hours 25-30: sustained 30% errors
    for h in range(25, 31):
        for k in range(70):
            rows.append((eid, "view", base + pd.Timedelta(
                hours=h, seconds=k))); eid += 1
        for k in range(30):
            rows.append((eid, "error", base + pd.Timedelta(
                hours=h, seconds=100 + k))); eid += 1
    pd.DataFrame({"event_id": np.array([r[0] for r in rows],
                                       dtype=np.int64),
                  "event_type": [r[1] for r in rows],
                  "ts": [r[2] for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = R.events_slo_burn_alerts(d).set_index("hr")
    h0 = int(out.index.min())
    # hour 24 short window burns but the 6h window is still diluted:
    # 30 errors / 600 total = 5% < 6% -> NO alert
    assert int(out.loc[h0 + 24, "alert"]) == 0
    # by hour 29 the 6h window is all burning -> alert
    assert int(out.loc[h0 + 29, "alert"]) == 1


@pytest.mark.usefixtures("ray_session")
def test_backtest_pure_seasonal_beats_naive(tmp_path):
    """A perfectly 24-periodic series has ZERO seasonal-naive error
    (MASE 0) while the plain naive errs at every level change."""
    d = str(tmp_path)
    base = pd.Timestamp("2024-01-01")
    ts = []
    for h in range(4 * 24):
        count = 2 + (3 if (h % 24) < 12 else 0)   # day/night square wave
        for k in range(count):
            ts.append(base + pd.Timedelta(hours=h, minutes=k))
    pd.DataFrame({"event_id": np.arange(len(ts), dtype=np.int64),
                  "ts": ts}).to_parquet(os.path.join(d, "events.parquet"))
    out = R.events_forecast_backtest(d)
    assert int(out["abs_err_seasonal"].iloc[0]) == 0
    assert int(out["abs_err_naive"].iloc[0]) > 0
    assert int(out["mase_x1e6"].iloc[0]) == 0
