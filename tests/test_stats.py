"""Statistical tier: OLS trend exactness on planted linear data,
percentile_cont interpolation parity, skyline dominance semantics
(duplicates, same-price ties), the edit-distance kernel vs DuckDB, and
randomized oracle fuzz for all four operators."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.pipelines import stats as S


# ---------------------------------------------------------------------------
# levenshtein kernel
# ---------------------------------------------------------------------------

def test_levenshtein_known_values():
    assert S.levenshtein("kitten", "sitting") == 3
    assert S.levenshtein("", "") == 0
    assert S.levenshtein("", "ab") == 2
    assert S.levenshtein("abc", "abc") == 0
    assert S.levenshtein("abc", "abd") == 1
    assert S.levenshtein("abc", "abcd") == 1
    assert S.levenshtein("hot gear", "hot bear") == 1
    assert S.levenshtein("new plate", "red plate") == 2


def test_levenshtein_matches_duckdb_random():
    rng = np.random.default_rng(42)
    con = duckdb.connect()
    alphabet = list("abcde ")
    for _ in range(200):
        s = "".join(rng.choice(alphabet, size=rng.integers(0, 12)))
        t = "".join(rng.choice(alphabet, size=rng.integers(0, 12)))
        want = con.execute("SELECT levenshtein(?, ?)", [s, t]).fetchone()[0]
        assert S.levenshtein(s, t) == want, (s, t)


# ---------------------------------------------------------------------------
# planted-case tests
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_trend_exact_on_planted_linear_data(tmp_path):
    """Perfectly linear revenue (price = 2*(day - base) + 500 dollars,
    zero discount) must fit slope = 200 cents/day exactly."""
    d = str(tmp_path)
    days = np.arange(S.TREND_X_BASE - 50, S.TREND_X_BASE + 50)
    price = 2.0 * (days - S.TREND_X_BASE) + 500.0
    pd.DataFrame({
        "l_suppkey": np.ones(len(days), dtype=np.int64),
        "l_shipdate": pd.to_datetime(days, unit="D"),
        "l_extendedprice": price,
        "l_discount": np.zeros(len(days))}) \
        .to_parquet(os.path.join(d, "lineitem.parquet"))
    pd.DataFrame({"s_suppkey": [1], "s_nationkey": [0]}) \
        .to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame({"n_nationkey": [0], "n_name": ["ALPHA"]}) \
        .to_parquet(os.path.join(d, "nation.parquet"))

    out = S.nation_revenue_trend(d)
    assert list(out.nation) == ["ALPHA"]
    assert out.n_lines.iloc[0] == len(days)
    assert out.slope_x100_per_day.iloc[0] == 200.0


@pytest.mark.usefixtures("ray_session")
def test_percentile_cont_interpolation(tmp_path):
    """Even-count group interpolates the midpoint; odd count hits the
    middle order statistic exactly — DuckDB's rn = q*(n-1) formula."""
    d = str(tmp_path)
    pd.DataFrame({
        "event_type": ["a"] * 4 + ["b"] * 5,
        "value": [1.0, 2.0, 4.0, 9.0, 1.0, 2.0, 4.0, 9.0, 100.0]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_value_percentiles_cont(d)
    got = out.set_index("event_type")
    # 'a' (n=4): rn=1.5 -> 200 + .5*(400-200) = 300
    assert got.loc["a", "p50_x100"] == 300.0
    # 'b' (n=5): middle = 400
    assert got.loc["b", "p50_x100"] == 400.0
    # p90 of 'a': rn=2.7 -> 400 + .7*(900-400) = 750.0000000000001 (fp)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    odf = con.sql(S.PCTL_SQL).df().set_index("event_type")
    for t in ("a", "b"):
        for c in ("p50_x100", "p90_x100"):
            assert got.loc[t, c] == odf.loc[t, c], (t, c)


@pytest.mark.usefixtures("ray_session")
def test_skyline_dominance_semantics(tmp_path):
    """Duplicates on both dims both survive; same-price smaller size is
    dominated; cheaper-same-size dominates."""
    d = str(tmp_path)
    pd.DataFrame({
        "p_partkey": np.arange(1, 7, dtype=np.int64),
        "p_retailprice": [10.0, 10.0, 10.0, 9.0, 11.0, 11.0],
        "p_size": np.array([5, 5, 4, 3, 6, 5], dtype=np.int32)}) \
        .to_parquet(os.path.join(d, "part.parquet"))
    out = S.part_price_size_skyline(d)
    # 3 dominated by 1 (same price, bigger size); 6 dominated by 1/2
    # (cheaper, same size); duplicates 1 and 2 both kept
    assert list(out.p_partkey) == [1, 2, 4, 5]


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_pairs_blocking_is_complete(tmp_path):
    """Length-bucket blocking must find every pair the quadratic oracle
    finds, including the |len|=2 boundary, and nothing past it."""
    d = str(tmp_path)
    names = ["abc", "abd", "abcd", "abcde", "abcdef", "zz", "z",
             "hot gear", "hot bear", "hot gears"]
    pd.DataFrame({"p_name": names * 2}) \
        .to_parquet(os.path.join(d, "part.parquet"))
    out = S.part_name_fuzzy_pairs(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM "
                f"read_parquet('{d}/part.parquet')")
    odf = con.sql(S.FUZZY_SQL).df()
    got = set(zip(out.name_a, out.name_b, out.dist))
    want = set(zip(odf.name_a, odf.name_b, odf.dist))
    assert got == want
    assert ("abc", "abcde", 2) in got       # len-diff-2 boundary included
    assert not any(a == "abc" and b == "abcdef" for a, b, _ in got)
    assert (out.cnt_a == 2).all() and (out.cnt_b == 2).all()


@pytest.mark.usefixtures("ray_session")
def test_entity_clusters_transitive(tmp_path):
    """a-b and b-c within distance 2 but a-c at distance 2 via chain:
    one cluster, canonical = lexicographic min."""
    d = str(tmp_path)
    pd.DataFrame({"p_name": ["aaaa", "aaab", "aabb", "zzzz"]}) \
        .to_parquet(os.path.join(d, "part.parquet"))
    out = S.part_name_entity_clusters(d)
    got = dict(zip(out.name, out.canonical))
    # aaaa-aaab d1, aaab-aabb d1, aaaa-aabb d2: all one cluster
    assert got == {"aaaa": "aaaa", "aaab": "aaaa", "aabb": "aaaa"}
    assert "zzzz" not in got                  # isolated name absent


@pytest.mark.usefixtures("ray_session")
def test_debounce_boundaries(tmp_path):
    """Exactly 5 s gap is suppressed (strict >), 5 s + 1 ms survives;
    chains compare to the immediately previous event (LAG semantics);
    types and users are independent."""
    d = str(tmp_path)
    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    ms = pd.Timedelta(milliseconds=1)
    rows = [
        (1, 1, "a", t0),                      # kept
        (2, 1, "a", t0 + 5 * s),              # exactly 5s -> dropped
        (3, 1, "a", t0 + 10 * s + ms),        # 5s+1ms after #2 -> kept
        (4, 1, "b", t0),                      # other type: kept
        (5, 2, "a", t0),                      # other user: kept
        (6, 2, "a", t0),                      # same-ts tie -> dropped
    ]
    pd.DataFrame(rows, columns=["event_id", "user_id", "event_type",
                                "ts"]) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_debounced(d)
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert sorted(df.event_id) == [1, 3, 4, 5]


@pytest.mark.usefixtures("ray_session")
def test_modal_type_tiebreak_and_interarrival(tmp_path):
    """Tied counts resolve to the lexicographically smallest type; a
    single-event user reports -1 gaps and span 0; span telescopes to
    last-first regardless of intermediate gaps."""
    d = str(tmp_path)
    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        (1, 1, "b", t0),            # user 1: b x2, a x2 -> tie -> "a"
        (2, 1, "b", t0 + 3 * s),
        (3, 1, "a", t0 + 10 * s),
        (4, 1, "a", t0 + 11 * s),
        (5, 2, "z", t0),            # single event: -1 gaps, span 0
    ]
    pd.DataFrame(rows, columns=["event_id", "user_id", "event_type",
                                "ts"]) \
        .assign(value=1.0) \
        .to_parquet(os.path.join(d, "events.parquet"))

    out = S.events_user_modal_type(d).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert list(out.modal_type) == ["a", "z"]
    assert list(out.n_modal) == [2, 1]

    ia = S.events_user_interarrival(d).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert list(ia.n_events) == [4, 1]
    assert list(ia.span_us) == [11_000_000, 0]
    assert list(ia.max_gap_us) == [7_000_000, -1]
    assert list(ia.min_gap_us) == [1_000_000, -1]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("prices,want", [
    ([10.00, 30.00, 20.00], 2000.0),                 # odd n
    ([10.00, 20.00, 30.00, 40.00], 2500.0),          # even n: midpoint
    ([7.77] * 5, 777.0),                             # all equal
    ([42.42], 4242.0),                               # single row
    ([10.00, 10.00, 99999999.99], 1000.0),           # huge domain, dup lo
])
def test_median_exact_edge_cases(tmp_path, prices, want):
    d = str(tmp_path)
    pd.DataFrame({
        "o_orderkey": np.arange(len(prices), dtype=np.int64),
        "o_totalprice": prices}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    out = S.orders_price_median_exact(d)
    assert list(out.n_orders) == [len(prices)]
    assert list(out.median_x100) == [want]


@pytest.mark.usefixtures("ray_session")
def test_stats_family_on_empty_tables(tmp_path):
    import pyarrow.parquet as pq
    d = str(tmp_path / "empty")
    os.makedirs(d, exist_ok=True)
    for t in ("lineitem", "part", "supplier", "nation", "region",
              "events", "orders", "customer"):
        tbl = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), os.path.join(d, f"{t}.parquet"))
    for name, (fn, _sql) in S.STATS_QUERIES.items():
        res = fn(d)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        assert len(df) == 0, name


# ---------------------------------------------------------------------------
# randomized oracle fuzz
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [13, 31])
def test_stats_oracles_on_random_tables(tmp_path, seed):
    """Random tables stressing the hard spots: tie-heavy event values at
    .5-cent boundaries (percentile interpolation + rounding), duplicate
    part names and near-collision names (fuzzy join), duplicated
    price/size points (skyline), few-row nations (trend dof guard)."""
    rng = np.random.default_rng(seed)
    d = str(tmp_path / f"s{seed}")
    os.makedirs(d, exist_ok=True)

    n_ev = 400
    # a SMALL timestamp pool forces same-ts ties and sub-5s gaps (the
    # debounce boundary) alongside the .5-boundary values
    ts_pool = pd.to_datetime("2024-05-01") + \
        pd.to_timedelta(rng.integers(0, 200, size=30) * 2500, unit="ms")
    pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "user_id": rng.integers(0, 5, size=n_ev).astype(np.int64),
        "ts": rng.choice(ts_pool, size=n_ev),
        "event_type": rng.choice(["x", "y", "z"], size=n_ev),
        "value": rng.integers(0, 40, size=n_ev) / 2.0
        + rng.integers(0, 3, size=n_ev) * 1e-6}) \
        .to_parquet(os.path.join(d, "events.parquet"))

    base = ["ring", "rings", "ping", "rink", "widget", "midget",
            "gadget", "qqqqqqqq"]
    n_part = 120
    pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": rng.choice(base, size=n_part),
        "p_brand": rng.choice(["B#1", "B#2", "B#3"], size=n_part),
        "p_size": rng.integers(1, 8, size=n_part).astype(np.int32),
        "p_retailprice": rng.integers(5, 15, size=n_part) / 1.0}) \
        .to_parquet(os.path.join(d, "part.parquet"))

    n_li = 300
    pd.DataFrame({
        "l_suppkey": rng.integers(0, 5, size=n_li).astype(np.int64),
        "l_shipdate": pd.to_datetime("1997-06-01")
        + pd.to_timedelta(rng.integers(0, 900, size=n_li), unit="D"),
        "l_returnflag": rng.choice(["A", "N", "R"], size=n_li),
        "l_quantity": rng.integers(1, 100, size=n_li).astype(float),
        "l_extendedprice": rng.integers(0, 2_000_000, size=n_li) / 200.0,
        "l_discount": rng.integers(0, 21, size=n_li) / 200.0,
        "l_tax": rng.integers(0, 9, size=n_li) / 200.0}) \
        .to_parquet(os.path.join(d, "lineitem.parquet"))
    pd.DataFrame({"s_suppkey": np.arange(5, dtype=np.int64),
                  "s_nationkey": np.array([0, 0, 1, 2, 2],
                                          dtype=np.int32)}) \
        .to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame({"n_nationkey": np.arange(3, dtype=np.int32),
                  "n_name": ["N_A", "N_B", "N_C"],
                  "n_regionkey": np.array([0, 0, 1], dtype=np.int32)}) \
        .to_parquet(os.path.join(d, "nation.parquet"))
    pd.DataFrame({"r_regionkey": np.arange(2, dtype=np.int32),
                  "r_name": ["R_EAST", "R_WEST"]}) \
        .to_parquet(os.path.join(d, "region.parquet"))
    # customer keys 0..3: user 4 is an orphan the INNER join must drop,
    # balances on half-cent boundaries stress ROUND parity
    pd.DataFrame({"c_custkey": np.arange(4, dtype=np.int64),
                  "c_acctbal": rng.integers(-4000, 4000, size=4) / 2.0
                  / 100.0 * 100.0,
                  "c_mktsegment": rng.choice(["A", "B"], size=4),
                  "c_nationkey": np.array([0, 1, 2, 0],
                                          dtype=np.int32)}) \
        .to_parquet(os.path.join(d, "customer.parquet"))

    # orders on half-cent boundaries with heavy duplication: stresses
    # the selection buckets (tiny domain -> width 1) and interpolation
    n_ord = 250
    pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, 4, size=n_ord).astype(np.int64),
        "o_totalprice": rng.integers(100, 140, size=n_ord) / 2.0,
        "o_orderdate": pd.to_datetime("1996-01-01")
        + pd.to_timedelta(rng.integers(0, 400, size=n_ord), unit="D"),
        "o_orderpriority": rng.choice(["1-URGENT", "3-MEDIUM"],
                                      size=n_ord),
        "o_orderstatus": rng.choice(["O", "F"], size=n_ord)}) \
        .to_parquet(os.path.join(d, "orders.parquet"))

    con = duckdb.connect()
    for t in ("events", "part", "lineitem", "supplier", "nation",
              "region", "customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    for name, (fn, sql) in S.STATS_QUERIES.items():
        if sql is None:
            continue
        res = fn(d)
        ray_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        duck_df = con.sql(sql).df()
        rc = ray_df[sorted(ray_df.columns)] \
            .sort_values(by=sorted(ray_df.columns)).reset_index(drop=True)
        oc = duck_df[sorted(duck_df.columns)] \
            .sort_values(by=sorted(duck_df.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(rc, oc, check_dtype=False,
                                      check_exact=True,
                                      obj=f"{name}@{seed}")


# ---------------------------------------------------------------------------
# chi-square + ACF planted-structure checks
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_chisq_independent_uniform_is_zero(tmp_path):
    """A perfectly balanced type x dow grid has O == E in every cell, so
    every integer term floors to 0."""
    d = str(tmp_path)
    days = pd.date_range("2024-05-06", periods=7, freq="D")  # Mon..Sun
    rows = [(t, day) for t in ("a", "b") for day in days for _ in range(5)]
    pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "user_id": np.zeros(len(rows), dtype=np.int64),
        "ts": [r[1] for r in rows],
        "event_type": [r[0] for r in rows],
        "value": np.zeros(len(rows))}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_type_dow_chisq(d)
    assert out.n_types.iloc[0] == 2 and out.n_dows.iloc[0] == 7
    assert out.dof.iloc[0] == 6 and out.chi2_x1e6.iloc[0] == 0


@pytest.mark.usefixtures("ray_session")
def test_chisq_perfect_dependence(tmp_path):
    """Type 'a' only on Monday, 'b' only on Tuesday, equal counts: the
    2x2 chi-square equals N exactly -> chi2_x1e6 == N * 1e6."""
    d = str(tmp_path)
    mon, tue = pd.Timestamp("2024-05-06"), pd.Timestamp("2024-05-07")
    n_half = 6
    pd.DataFrame({
        "event_id": np.arange(2 * n_half, dtype=np.int64),
        "user_id": np.zeros(2 * n_half, dtype=np.int64),
        "ts": [mon] * n_half + [tue] * n_half,
        "event_type": ["a"] * n_half + ["b"] * n_half,
        "value": np.zeros(2 * n_half)}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_type_dow_chisq(d)
    assert out.dof.iloc[0] == 1
    assert out.chi2_x1e6.iloc[0] == 2 * n_half * 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_acf_alternating_series(tmp_path):
    """Counts alternating 3,1,3,1,... by hour: lag-1 autocorrelation is
    exactly -1 (+boundary effects), lag-2 is +1; gap hours count 0."""
    d = str(tmp_path)
    hours = pd.date_range("2024-05-01", periods=24, freq="h")
    rows = []
    for i, h in enumerate(hours):
        rows += [h] * (3 if i % 2 == 0 else 1)
    pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "user_id": np.zeros(len(rows), dtype=np.int64),
        "ts": rows,
        "event_type": ["x"] * len(rows),
        "value": np.zeros(len(rows))}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_hourly_acf(d).set_index("lag")
    assert out.loc[1, "n_pairs"] == 23 and out.loc[2, "n_pairs"] == 22
    assert out.loc[1, "r"] < -0.95 and out.loc[2, "r"] > 0.95


@pytest.mark.usefixtures("ray_session")
def test_key_skew_gini_planted(tmp_path):
    """Uniform keys give Gini 0; counts [1,1,1,97] give exactly
    288/(4*100) = 0.72 through the tie-invariant rank formula."""
    from pdf_extraction_ray.pipelines.relational import (
        events_key_skew_profile)
    d = str(tmp_path / "uni")
    os.makedirs(d, exist_ok=True)
    ts = pd.Timestamp("2024-05-01")
    pd.DataFrame({"event_id": np.arange(12, dtype=np.int64),
                  "user_id": np.repeat(np.arange(4, dtype=np.int64), 3),
                  "ts": [ts] * 12, "event_type": ["x"] * 12,
                  "value": np.zeros(12)}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = events_key_skew_profile(d)
    assert (out.n_keys.iloc[0], out.max_count.iloc[0],
            out.gini_x1e9.iloc[0]) == (4, 3, 0)

    d2 = str(tmp_path / "hot")
    os.makedirs(d2, exist_ok=True)
    users = np.concatenate([np.arange(3), np.full(97, 9)]).astype(np.int64)
    pd.DataFrame({"event_id": np.arange(100, dtype=np.int64),
                  "user_id": users, "ts": [ts] * 100,
                  "event_type": ["x"] * 100, "value": np.zeros(100)}) \
        .to_parquet(os.path.join(d2, "events.parquet"))
    out2 = events_key_skew_profile(d2)
    assert (out2.n_keys.iloc[0], out2.n_events.iloc[0],
            out2.max_count.iloc[0]) == (4, 100, 97)
    assert out2.gini_x1e9.iloc[0] == 720_000_000


@pytest.mark.usefixtures("ray_session")
def test_ols2_exact_on_planted_plane(tmp_path):
    """Data generated exactly on price = 7 + 3*qty - 2*disc_x100 must
    recover the coefficients exactly (integer determinants, one final
    division)."""
    d = str(tmp_path)
    rng = np.random.default_rng(2)
    q = rng.integers(1, 50, size=200).astype(float)
    disc = rng.integers(0, 11, size=200) / 100.0
    price = 7.0 + 3.0 * q - 2.0 * (disc * 100.0)
    pd.DataFrame({"l_quantity": q, "l_extendedprice": price,
                  "l_discount": disc}) \
        .to_parquet(os.path.join(d, "lineitem.parquet"))
    out = S.lineitem_ols2(d)
    assert out.n_lines.iloc[0] == 200
    assert (out.b0.iloc[0], out.b1.iloc[0], out.b2.iloc[0]) == \
        (7.0, 3.0, -2.0)


@pytest.mark.usefixtures("ray_session")
def test_ewma_recurrence_planted(tmp_path):
    """EWMA over counts [4, 0, 8]: s = 4, 3, 4.25 exactly (alpha=0.25
    is an exact binary fraction); gap hour counts as 0."""
    d = str(tmp_path)
    h = pd.Timestamp("2024-05-01")
    hr = pd.Timedelta(hours=1)
    rows = [h] * 4 + [h + 2 * hr] * 8          # hour 1 missing -> 0
    pd.DataFrame({"event_id": np.arange(12, dtype=np.int64),
                  "user_id": np.zeros(12, dtype=np.int64),
                  "ts": rows, "event_type": ["x"] * 12,
                  "value": np.zeros(12)}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_hourly_ewma(d)
    assert list(out.c) == [4, 0, 8]
    assert list(out.ewma) == [4.0, 3.0, 0.25 * 8 + 0.75 * 3.0]


@pytest.mark.usefixtures("ray_session")
def test_locf_fill_and_sentinel(tmp_path):
    """Gap hours inherit the last observed sum; the first hour is by
    construction observed (span starts at min observed hour)."""
    d = str(tmp_path)
    h = pd.Timestamp("2024-05-01")
    hr = pd.Timedelta(hours=1)
    rows = [(h, 1.0), (h, 2.5), (h + 3 * hr, 10.0)]
    pd.DataFrame({"event_id": np.arange(3, dtype=np.int64),
                  "user_id": np.zeros(3, dtype=np.int64),
                  "ts": [r[0] for r in rows],
                  "event_type": ["x"] * 3,
                  "value": [r[1] for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_hourly_locf(d)
    assert list(out.observed) == [1, 0, 0, 1]
    assert list(out.value_x100) == [350, 350, 350, 1000]


@pytest.mark.usefixtures("ray_session")
def test_changepoint_planted_step(tmp_path):
    """Step series (24h at 2/hr then 24h at 10/hr): |CUSUM| peaks at the
    last hour of the first regime."""
    d = str(tmp_path)
    t0 = pd.Timestamp("2024-05-01")
    rows = []
    for i in range(48):
        rows += [t0 + pd.Timedelta(hours=i)] * (2 if i < 24 else 10)
    pd.DataFrame({"event_id": np.arange(len(rows), dtype=np.int64),
                  "user_id": np.zeros(len(rows), dtype=np.int64),
                  "ts": rows, "event_type": ["x"] * len(rows),
                  "value": np.zeros(len(rows))}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_hourly_changepoint(d)
    h0 = t0.to_datetime64().astype("datetime64[h]").astype(np.int64)
    assert out.split_hr.iloc[0] == h0 + 23
    assert out.n_hours.iloc[0] == 48 and out.total.iloc[0] == 288


@pytest.mark.usefixtures("ray_session")
def test_drift_tvd_extremes(tmp_path):
    """Identical halves give TVD 0; disjoint type sets give exactly
    1e9."""
    d = str(tmp_path / "same")
    os.makedirs(d, exist_ok=True)
    t0 = pd.Timestamp("2024-05-01")
    ts = [t0, t0, t0 + pd.Timedelta(hours=10),
          t0 + pd.Timedelta(hours=10)]
    pd.DataFrame({"event_id": np.arange(4, dtype=np.int64),
                  "user_id": np.zeros(4, dtype=np.int64),
                  "ts": ts, "event_type": ["a", "b", "a", "b"],
                  "value": np.zeros(4)}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_type_drift_tvd(d)
    assert out.tvd_x1e9.iloc[0] == 0

    d2 = str(tmp_path / "disjoint")
    os.makedirs(d2, exist_ok=True)
    pd.DataFrame({"event_id": np.arange(4, dtype=np.int64),
                  "user_id": np.zeros(4, dtype=np.int64),
                  "ts": ts, "event_type": ["a", "a", "b", "b"],
                  "value": np.zeros(4)}) \
        .to_parquet(os.path.join(d2, "events.parquet"))
    out2 = S.events_type_drift_tvd(d2)
    assert out2.tvd_x1e9.iloc[0] == 1_000_000_000


@pytest.mark.usefixtures("ray_session")
def test_interp_gap_values(tmp_path):
    """Observed sums 100 @h0 and 400 @h3: gaps read 200, 300 (exact
    thirds); a DOWNWARD slope exercises the trunc-division mirror."""
    d = str(tmp_path)
    h = pd.Timestamp("2024-05-01")
    hr = pd.Timedelta(hours=1)
    rows = [(h, 1.0), (h + 3 * hr, 4.0), (h + 5 * hr, 1.0)]
    pd.DataFrame({"event_id": np.arange(3, dtype=np.int64),
                  "user_id": np.zeros(3, dtype=np.int64),
                  "ts": [r[0] for r in rows],
                  "event_type": ["x"] * 3,
                  "value": [r[1] for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_hourly_interp(d)
    assert list(out.observed) == [1, 0, 0, 1, 0, 1]
    # up: 100 -> 400 over 3 h: 200, 300; down: 400 -> 100 over 2 h:
    # 400 + (-300 * 1) trunc// 2 = 400 - 150 = 250
    assert list(out.value_x100) == [100, 200, 300, 400, 250, 100]


# ---------------------------------------------------------------------------
# Markov stationary distribution: eigenvector differential
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_markov_stationary_matches_eigenvector():
    """Power-iterated pi must match the left Perron eigenvector of the
    row-normalized transition matrix built independently from the
    oracled transition counts."""
    from pdf_extraction_ray.pipelines.relational import (
        events_type_transitions)
    d = "/root/testdata/sf0.001"
    out = S.events_markov_stationary(d).set_index("event_type")["pi"]
    tr = events_type_transitions(d)
    tr = tr if isinstance(tr, pd.DataFrame) else tr.to_pandas()
    types = sorted(set(tr["from_type"]) | set(tr["to_type"]))
    idx = {t: i for i, t in enumerate(types)}
    P = np.zeros((len(types), len(types)))
    for f, t, n in tr.itertuples(index=False):
        P[idx[f], idx[t]] = float(n)
    P /= P.sum(axis=1, keepdims=True)
    w, v = np.linalg.eig(P.T)
    pi = np.real(v[:, np.argmax(np.real(w))])
    pi = pi / pi.sum()
    assert np.allclose(out.reindex(types).to_numpy(), pi, atol=1e-10)
    assert out.sum() == pytest.approx(1.0, abs=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_qq_drift_planted_shift(tmp_path):
    """Second half = first half + 3.00 shifts EVERY decile by exactly
    300 cents (same per-half counts, disjoint halves)."""
    import os
    d = str(tmp_path)
    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    v1 = rng.integers(100, 5000, size=400) / 100.0
    ts1 = [base + pd.Timedelta(minutes=int(m))
           for m in rng.integers(0, 1000, size=400)]
    ts2 = [base + pd.Timedelta(days=30, minutes=int(m))
           for m in rng.integers(0, 1000, size=400)]
    pd.DataFrame({"event_id": np.arange(800, dtype=np.int64),
                  "ts": ts1 + ts2,
                  "value": np.concatenate([v1, v1 + 3.0])}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    from pdf_extraction_ray.pipelines.stats import events_qq_drift
    out = events_qq_drift(d)
    assert len(out) == 9
    assert (out["shift_x100"] == 300).all()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1])
def test_qq_drift_fuzz_vs_duckdb(tmp_path, seed):
    import os
    import duckdb
    rng = np.random.default_rng(700 + seed)
    d = str(tmp_path)
    n = int(rng.integers(40, 400))
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame({"event_id": np.arange(n, dtype=np.int64),
                  "ts": [base + pd.Timedelta(minutes=int(m))
                         for m in rng.integers(0, 10000, size=n)],
                  "value": rng.integers(0, 500, size=n) / 4.0}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    from pdf_extraction_ray.pipelines.stats import (QQ_DRIFT_SQL,
                                                    events_qq_drift)
    got = events_qq_drift(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{os.path.join(d, 'events.parquet')}')")
    want = con.sql(QQ_DRIFT_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_hhi_extremes(tmp_path):
    """Monopoly region (one nation) -> HHI exactly 1.0; two equal
    nations -> exactly 0.5."""
    import os
    d = str(tmp_path)
    pd.DataFrame({"r_regionkey": [0, 1],
                  "r_name": ["MONO", "DUO"]}) \
        .to_parquet(os.path.join(d, "region.parquet"))
    pd.DataFrame({"n_nationkey": [0, 1, 2],
                  "n_name": ["A", "B", "C"],
                  "n_regionkey": [0, 1, 1]}) \
        .to_parquet(os.path.join(d, "nation.parquet"))
    pd.DataFrame({"s_suppkey": [1, 2, 3],
                  "s_nationkey": [0, 1, 2]}) \
        .to_parquet(os.path.join(d, "supplier.parquet"))
    pd.DataFrame({"l_suppkey": [1, 1, 2, 3],
                  "l_extendedprice": [10.0, 30.0, 20.0, 20.0],
                  "l_discount": [0.0] * 4}) \
        .to_parquet(os.path.join(d, "lineitem.parquet"))
    from pdf_extraction_ray.pipelines.stats import region_revenue_hhi
    out = region_revenue_hhi(d).set_index("region")
    assert out.loc["MONO", "hhi"] == 1.0
    assert out.loc["DUO", "hhi"] == 0.5
    assert out.loc["DUO", "n_nations"] == 2


@pytest.mark.usefixtures("ray_session")
def test_welch_identical_sides_t_zero(tmp_path):
    """Identical weekend/weekday value multisets -> t exactly 0 and
    df = 2*(n-1) (equal variances, equal n)."""
    import os
    d = str(tmp_path)
    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    rows = []
    # 2024-01-06 was a Saturday; 2024-01-08 a Monday
    for i, v in enumerate(vals):
        rows.append((pd.Timestamp("2024-01-06 10:00")
                     + pd.Timedelta(minutes=i), v))
        rows.append((pd.Timestamp("2024-01-08 10:00")
                     + pd.Timedelta(minutes=i), v))
    pd.DataFrame({"event_id": np.arange(len(rows), dtype=np.int64),
                  "ts": [r[0] for r in rows],
                  "value": [r[1] for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    from pdf_extraction_ray.pipelines.stats import events_value_welch_ttest
    out = events_value_welch_ttest(d)
    assert int(out["n_weekend"].iloc[0]) == 5
    assert out["t_welch"].iloc[0] == 0.0
    assert out["df_welch"].iloc[0] == 8.0


@pytest.mark.usefixtures("ray_session")
def test_lorenz_extremes(tmp_path):
    """Perfect equality -> share == decile/10 exactly; a single whale
    holding ~all revenue -> decile 9 share near zero."""
    import os
    d = str(tmp_path)
    # 10 customers, one order each, all equal revenue
    pd.DataFrame({"o_orderkey": np.arange(10, dtype=np.int64),
                  "o_custkey": np.arange(10, dtype=np.int64),
                  "o_totalprice": [100.0] * 10}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    from pdf_extraction_ray.pipelines.stats import customer_lorenz_points
    out = customer_lorenz_points(d)
    assert out["rev_share_x1e6"].tolist() == \
        [d_ * 100_000 for d_ in range(1, 11)]

    d2 = str(tmp_path / "whale")
    os.makedirs(d2)
    pd.DataFrame({"o_orderkey": np.arange(10, dtype=np.int64),
                  "o_custkey": np.arange(10, dtype=np.int64),
                  "o_totalprice": [1.0] * 9 + [991.0]}) \
        .to_parquet(os.path.join(d2, "orders.parquet"))
    out2 = customer_lorenz_points(d2)
    assert int(out2.set_index("decile").loc[9, "rev_share_x1e6"]) == 9000
    assert int(out2.set_index("decile").loc[10, "rev_share_x1e6"]) \
        == 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_anova_planted_groups(tmp_path):
    """Three groups with equal within-group shape but shifted means:
    hand-computed SSB/SSW; identical groups -> ssb exactly 0."""
    import os
    d = str(tmp_path)
    # groups a: {1,2,3}, b: {11,12,13}, c: {21,22,23} (dollars)
    vals = [1, 2, 3, 11, 12, 13, 21, 22, 23]
    types = ["a"] * 3 + ["b"] * 3 + ["c"] * 3
    pd.DataFrame({"event_id": np.arange(9, dtype=np.int64),
                  "event_type": types,
                  "value": [float(v) for v in vals]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_value_anova(d)
    assert int(out["k"].iloc[0]) == 3 and int(out["n"].iloc[0]) == 9
    # cents: means 200, 1200, 2200; grand 1200 -> SSB = 3*(1000^2)*2
    assert out["ssb"].iloc[0] == 6_000_000.0
    # within each group: (-100)^2 + 0 + 100^2 = 20000, x3 groups
    assert out["ssw"].iloc[0] == 60_000.0
    # F = (SSB/2) / (SSW/6) = 3_000_000 / 10_000
    assert out["f_stat"].iloc[0] == 300.0

    d2 = str(tmp_path / "flat")
    os.makedirs(d2, exist_ok=True)
    pd.DataFrame({"event_id": np.arange(6, dtype=np.int64),
                  "event_type": ["a", "b", "c"] * 2,
                  "value": [5.0] * 6}) \
        .to_parquet(os.path.join(d2, "events.parquet"))
    out2 = S.events_value_anova(d2)
    # zero variance everywhere: ssw = ssb = 0 -> F and eta are NaN,
    # mirroring DuckDB's x/0.0 semantics
    assert out2["ssb"].iloc[0] == 0.0 and out2["ssw"].iloc[0] == 0.0
    assert np.isnan(out2["f_stat"].iloc[0])
    assert np.isnan(out2["eta_sq"].iloc[0])


@pytest.mark.usefixtures("ray_session")
def test_survival_hand_computed_km(tmp_path):
    """4 users: C converts at +0h, A and D at +2h, B never (censored at
    +5h) -> KM steps (0: 1-1/4) and (2: x(1-2/3)); censoring consumes
    no step."""
    import os
    d = str(tmp_path)
    base = pd.Timestamp("2024-03-01 00:00:00")
    rows = [
        ("A", base, "view"), ("A", base + pd.Timedelta(hours=2), "purchase"),
        ("B", base, "view"), ("B", base + pd.Timedelta(hours=5), "click"),
        ("C", base, "purchase"),
        ("D", base, "click"), ("D", base + pd.Timedelta(hours=2), "purchase"),
        ("D", base + pd.Timedelta(hours=9), "view"),   # after-death noise
    ]
    pd.DataFrame({"event_id": np.arange(len(rows), dtype=np.int64),
                  "user_id": pd.factorize([r[0] for r in rows])[0]
                  .astype(np.int64),
                  "ts": [r[1] for r in rows],
                  "event_type": [r[2] for r in rows],
                  "value": [1.0] * len(rows)}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_user_survival(d).reset_index(drop=True)
    assert list(out["t_hours"]) == [0, 2]
    assert list(out["n_risk"]) == [4, 3]
    assert list(out["n_events"]) == [1, 2]
    assert out["surv"].iloc[0] == 0.75
    assert out["surv"].iloc[1] == 0.75 * (1.0 - 2.0 / 3.0)


@pytest.mark.usefixtures("ray_session")
def test_did_hand_computed(tmp_path):
    """Control (even users) rises 1.00; treated (odd) rises 3.00 ->
    DiD = +200 cents exactly."""
    import os
    d = str(tmp_path)
    t0 = pd.Timestamp("2024-06-01")
    t1 = pd.Timestamp("2024-06-30")   # mid falls between the clusters
    rows = [
        (0, t0, 10.0), (2, t0, 20.0),       # control pre (mean 15)
        (0, t1, 11.0), (2, t1, 21.0),       # control post (mean 16)
        (1, t0, 30.0), (3, t0, 40.0),       # treat pre (mean 35)
        (1, t1, 33.0), (3, t1, 43.0),       # treat post (mean 38)
    ]
    pd.DataFrame({"event_id": np.arange(len(rows), dtype=np.int64),
                  "user_id": np.array([r[0] for r in rows], np.int64),
                  "ts": [r[1] for r in rows],
                  "event_type": ["view"] * len(rows),
                  "value": [r[2] for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_value_did(d)
    assert out["mean_c0_x100"].iloc[0] == 1500.0
    assert out["mean_t1_x100"].iloc[0] == 3800.0
    assert out["did_x100"].iloc[0] == (3800.0 - 3500.0) - (1600.0 - 1500.0)
    assert list(out[["n_c0", "n_c1", "n_t0", "n_t1"]].iloc[0]) == [2, 2, 2, 2]


@pytest.mark.usefixtures("ray_session")
def test_cuped_perfectly_correlated_covariate(tmp_path):
    """Y = X + constant lift with heavily unbalanced X across arms:
    theta == 1 exactly, the raw effect is pure covariate imbalance
    (+4500c) and CUPED removes it completely (true effect 0)."""
    import os
    d = str(tmp_path)
    pre, post = pd.Timestamp("2024-06-01"), pd.Timestamp("2024-06-30")
    x = {0: 1000, 2: 2000, 1: 5000, 3: 7000}        # cents
    rows = []
    for u, xv in x.items():
        rows.append((u, pre, xv / 100.0))
        rows.append((u, post, (xv + 100) / 100.0))
    pd.DataFrame({"event_id": np.arange(len(rows), dtype=np.int64),
                  "user_id": np.array([r[0] for r in rows], np.int64),
                  "ts": [r[1] for r in rows],
                  "event_type": ["view"] * len(rows),
                  "value": [r[2] for r in rows]}) \
        .to_parquet(os.path.join(d, "events.parquet"))
    out = S.events_value_cuped(d)
    assert out["theta"].iloc[0] == 1.0
    assert out["raw_effect_x100"].iloc[0] == 4500.0
    assert out["cuped_effect_x100"].iloc[0] == 0.0
    assert list(out[["n_c", "n_t"]].iloc[0]) == [2, 2]
