"""Randomized differential check: every ORACLED documents-family
operator over seeded random tables vs DuckDB on the same file. The
generator plants the hard cases — exact duplicates, shared 20+-token
blocks, multilingual stopwords, punctuation-bearing tokens, empty and
whitespace-only docs — none of which are guaranteed by the sf fixtures.
ASCII-only by construction (the fingerprint oracle's documented
equivalence domain)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.pipelines.cleaning import CLEANING_QUERIES
from pdf_extraction_ray.pipelines.corpus import CORPUS_QUERIES
from pdf_extraction_ray.pipelines.mleval import MLEVAL_QUERIES
from pdf_extraction_ray.pipelines.spans import SPANS_QUERIES
from pdf_extraction_ray.pipelines.textops import TEXT_QUERIES

VOCAB = ("the and of to a in is it le la les de et un une el los y que "
         "der die das und alpha beta gamma delta scan sort merge join "
         "window batch key. row, col; val? x1 x2 x3").split()


def _random_docs(seed: int, n: int = 40) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 60))
        toks = list(rng.choice(VOCAB, size=k))
        texts.append(" ".join(toks))
    # plant: exact dup, shared long block, empty, whitespace-only
    if n >= 8:
        texts[1] = texts[0]
        long_block = " ".join(rng.choice(VOCAB, size=25))
        texts[2] = long_block + " tailA tailB"
        texts[3] = long_block + " other tail"
        texts[4] = ""
        texts[5] = "   "
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(["en", "fr", "es", "de", "zh"], size=n),
        "source": rng.choice(["src0", "src1", "src2"], size=n),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)})


ORACLED = sorted(
    [(n, fn, sql) for n, (fn, sql) in
     {**CORPUS_QUERIES, **TEXT_QUERIES, **MLEVAL_QUERIES,
      **SPANS_QUERIES, **CLEANING_QUERIES}.items()
     if sql is not None])


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [11, 23])
def test_oracled_docs_ops_on_random_tables(tmp_path, seed):
    d = tmp_path / f"rand{seed}"
    os.makedirs(d, exist_ok=True)
    _random_docs(seed).to_parquet(d / "documents.parquet")
    # random embeddings (64-dim, non-degenerate) with duplicate vectors
    # planted so cosine ties stress the rank tie-breaks
    rng = np.random.default_rng(seed + 1000)
    vecs = rng.normal(size=(40, 64)).astype(np.float32)
    vecs[7] = vecs[3]
    vecs[21] = vecs[20]
    pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                  "embedding": list(vecs),
                  "label": rng.integers(0, 4, size=40).astype(np.int32)}) \
        .to_parquet(d / "embeddings.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{d}/embeddings.parquet')")

    for name, fn, sql in ORACLED:
        res = fn(str(d))
        ray_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        duck_df = con.sql(sql).df()
        if len(ray_df) == 0 and len(duck_df) == 0:
            # a fully-empty Dataset legitimately loses its schema
            # through to_pandas (same convention as the family gates)
            continue
        rc = ray_df[sorted(ray_df.columns)] \
            .sort_values(by=sorted(ray_df.columns)).reset_index(drop=True)
        oc = duck_df[sorted(duck_df.columns)] \
            .sort_values(by=sorted(duck_df.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(rc, oc, check_dtype=False,
                                      check_exact=True, obj=f"{name}@{seed}")


# ---------------------------------------------------------------------------
# Events/orders family on random tables (ties + rounding edge cases)
# ---------------------------------------------------------------------------

EVENT_QUERIES = [
    "events_hourly", "events_sessions", "events_running_totals",
    "events_lead_lag", "events_value_percentiles",
    "events_type_salted_agg", "events_sliding_windows",
    "events_cohort_retention", "events_asof_orders",
    "events_funnel_steps", "events_funnel_steps4",
    "events_asof_next_order", "events_asof_nearest_order",
    "events_stream_topk", "events_type_dow_chisq",
    "events_hourly_acf", "events_key_skew_profile",
    "events_user_diversity", "events_asof_orders_tolerance",
    "orders_events_range_join", "top_order_per_customer",
    "orders_moving_window", "orders_monthly", "orders_rollup",
    "orders_cube", "events_funnel", "events_latest_state",
    "events_props_ksum", "events_hourly_gapfill",
    "order_custkeys_intersect", "order_custkeys_except",
    "events_user_activity_hist", "events_new_users_daily",
    "events_type_distinct_users", "events_type_robust_outliers",
    "events_type_transitions", "events_quality_checks",
    "events_value_cume_dist", "events_debounced",
    "events_pattern_matches",
    "customer_snapshot_diff",
    "events_nation_skew_join", "customer_merge_upsert",
    "events_stream_attribution", "events_partitioned_prune",
    "orders_monthly_view", "events_zorder_prune",
    "orders_grouping_sets", "events_user_negative_types",
    "sessions_peak_concurrency", "events_minute_ohlc",
    "customer_rfm_segments", "events_dau_wau",
]

# props pool stresses the JSON field extraction: valid ints (incl.
# negatives and whitespace variants), missing key, non-numeric value,
# malformed JSON, nested first-match, and NULL
PROPS_POOL = ['{"k": 87}', '{"k": -3}', '{ "k" :  5 }', "{}",
              '{"k": "str"}', "not json at all", '{"a": {"k": 1}, "k": 2}',
              '{"other": 9}', None]


def _random_events_orders(seed: int, d):
    rng = np.random.default_rng(seed)
    n_ev, n_ord, n_users = 300, 60, 6
    # a SMALL timestamp pool forces ties (ordering tie-break coverage)
    ts_pool = pd.to_datetime("2024-03-01") + \
        pd.to_timedelta(rng.integers(0, 40, size=25), unit="h")
    events = pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": rng.choice(ts_pool, size=n_ev),
        "user_id": rng.integers(0, n_users, size=n_ev).astype(np.int64),
        "event_type": rng.choice(["click", "error", "purchase", "signup",
                                  "view"], size=n_ev),
        # .5-boundary values stress ROUND-half-away parity
        "value": rng.integers(0, 2000, size=n_ev) / 2 * 1e-6 +
        rng.integers(0, 100, size=n_ev).astype(float),
        "props": [PROPS_POOL[i] for i in
                  rng.integers(0, len(PROPS_POOL), size=n_ev)]})
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_users, size=n_ord).astype(np.int64),
        "o_orderstatus": rng.choice(["F", "O", "P"], size=n_ord),
        "o_totalprice": rng.integers(0, 10_000_000, size=n_ord) / 200.0,
        "o_orderdate": rng.choice(ts_pool, size=n_ord),
        "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM"],
                                      size=n_ord)})
    events.to_parquet(os.path.join(d, "events.parquet"))
    orders.to_parquet(os.path.join(d, "orders.parquet"))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [5, 17])
def test_oracled_event_ops_on_random_tables(tmp_path, seed):
    import shutil
    from pdf_extraction_ray.pipelines.relational import RELATIONAL_QUERIES
    from pdf_extraction_ray.pipelines.stats import STATS_QUERIES
    from pdf_extraction_ray.pipelines.storage import STORAGE_QUERIES
    from pdf_extraction_ray.pipelines.streaming import STREAMING_QUERIES
    registry = {**RELATIONAL_QUERIES, **STATS_QUERIES, **STORAGE_QUERIES,
                **STREAMING_QUERIES}

    d = str(tmp_path / f"ev{seed}")
    os.makedirs(d, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "lineitem", "documents", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    os.path.join(d, f"{t}.parquet"))
    _random_events_orders(seed, d)

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")

    for name in EVENT_QUERIES:
        fn, sql = registry[name]
        res = fn(d)
        ray_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        duck_df = con.sql(sql).df()
        rc = ray_df[sorted(ray_df.columns)] \
            .sort_values(by=sorted(ray_df.columns)).reset_index(drop=True)
        oc = duck_df[sorted(duck_df.columns)] \
            .sort_values(by=sorted(duck_df.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(rc, oc, check_dtype=False,
                                      check_exact=True, obj=f"{name}@{seed}")


# ---------------------------------------------------------------------------
# Lineitem/part/customer family (ROUND-half-away parity on .5 boundaries)
# ---------------------------------------------------------------------------

LINEITEM_QUERIES = [
    "q1_pricing_summary", "filter_high_quantity", "lineitem_discount_hist",
    "part_brand_median_price", "part_brand_price_stats",
    "customer_balance_ntile", "distinct_segments", "segment_names_agg",
    "q6_forecast_revenue", "q18_large_orders", "q10_returned_customers",
    "q10_partitioned", "segment_top_orders", "orders_lineitem_join_size",
    "lineitem_measures_unpivot", "lineitem_cov_matrix",
]


def _random_lineitem_tables(seed: int, d):
    rng = np.random.default_rng(seed)
    # n_cust covers the sf0.001 orders table's full o_custkey range so
    # order->customer joins (q10) produce non-trivial matches
    n_li, n_part, n_cust = 400, 80, 150
    # prices at exact half-cent boundaries: scaled x100 they land on .5,
    # the divergence point between ROUND and banker's rounding
    li = pd.DataFrame({
        "l_orderkey": rng.integers(0, 100, size=n_li).astype(np.int64),
        "l_partkey": rng.integers(0, n_part, size=n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, 10, size=n_li).astype(np.int64),
        "l_linenumber": rng.integers(1, 7, size=n_li).astype(np.int32),
        "l_quantity": (rng.integers(1, 100, size=n_li)).astype(float),
        "l_extendedprice": rng.integers(0, 2_000_000, size=n_li) / 200.0,
        "l_discount": rng.integers(0, 21, size=n_li) / 200.0,
        "l_tax": rng.integers(0, 17, size=n_li) / 200.0,
        "l_returnflag": rng.choice(["A", "N", "R"], size=n_li),
        "l_linestatus": rng.choice(["F", "O"], size=n_li),
        "l_shipdate": pd.to_datetime("1996-01-01") +
        pd.to_timedelta(rng.integers(0, 2500, size=n_li), unit="D")})
    part = pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"part {i}" for i in range(n_part)],
        "p_brand": rng.choice([f"Brand#{b}" for b in range(5)], size=n_part),
        "p_type": rng.choice(["STANDARD", "SMALL", "LARGE"], size=n_part),
        "p_size": rng.integers(1, 50, size=n_part).astype(np.int32),
        "p_retailprice": rng.integers(0, 400_000, size=n_part) / 200.0})
    cust = pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        # keys 25/26 are ORPHANS (nation has 0-24): INNER-join queries
        # must drop those customers exactly like the SQL oracle
        "c_nationkey": rng.integers(0, 27, size=n_cust).astype(np.int32),
        "c_acctbal": rng.integers(-200_000, 2_000_000, size=n_cust) / 200.0,
        "c_mktsegment": rng.choice(["AUTOMOBILE", "BUILDING", "FURNITURE",
                                    "HOUSEHOLD", "MACHINERY"], size=n_cust)})
    li.to_parquet(os.path.join(d, "lineitem.parquet"))
    part.to_parquet(os.path.join(d, "part.parquet"))
    cust.to_parquet(os.path.join(d, "customer.parquet"))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [7, 29])
def test_oracled_lineitem_ops_on_random_tables(tmp_path, seed):
    import shutil
    from pdf_extraction_ray.pipelines.relational import RELATIONAL_QUERIES

    d = str(tmp_path / f"li{seed}")
    os.makedirs(d, exist_ok=True)
    for t in ("region", "nation", "supplier", "orders", "events",
              "documents", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    os.path.join(d, f"{t}.parquet"))
    _random_lineitem_tables(seed, d)

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")

    from pdf_extraction_ray.pipelines.stats import STATS_QUERIES
    li_registry = {**RELATIONAL_QUERIES, **STATS_QUERIES}
    for name in LINEITEM_QUERIES:
        fn, sql = li_registry[name]
        res = fn(d)
        ray_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        duck_df = con.sql(sql).df()
        rc = ray_df[sorted(ray_df.columns)] \
            .sort_values(by=sorted(ray_df.columns)).reset_index(drop=True)
        oc = duck_df[sorted(duck_df.columns)] \
            .sort_values(by=sorted(duck_df.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(rc, oc, check_dtype=False,
                                      check_exact=True, obj=f"{name}@{seed}")


# ---------------------------------------------------------------------------
# TPC-H tier on random tables (join-boundary + correlated-avg edges)
# ---------------------------------------------------------------------------

TPCH_FUZZ_QUERIES = [
    "q4_priority_count", "q7_nation_trade", "q8_market_share",
    "q9_product_profit", "q12_priority_class", "q14_promo_revenue",
    "q15_top_supplier", "q16_brand_supplier_counts",
    "q17_small_qty_revenue", "q19_disjunctive_revenue",
    "q21_late_suppliers", "q22_idle_balance",
    "q2_min_cost_supplier", "q11_important_parts",
    "q13_customer_distribution", "q20_excess_shippers",
]


def _random_tpch_tables(seed: int, d):
    """Plants the cases the sf fixtures don't guarantee: lineitems
    shipped EXACTLY 60/90 days after the order date (the strict-> late
    boundary of q4/q21), a part whose quantities hit 5*qty*n == sum_qty
    exactly (q17's strict-< average boundary), orphan lineitem orderkeys
    (inner-join semantics), and brand/type/size pools chosen so every
    q16/q17/q19 predicate branch matches some rows."""
    rng = np.random.default_rng(seed)
    n_li, n_ord, n_part, n_cust, n_supp = 500, 80, 60, 150, 12

    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, size=n_ord).astype(np.int64),
        "o_orderstatus": rng.choice(["F", "O", "P"], size=n_ord),
        "o_totalprice": rng.integers(0, 10_000_000, size=n_ord) / 200.0,
        "o_orderdate": pd.to_datetime("1996-01-01") +
        pd.to_timedelta(rng.integers(0, 1825, size=n_ord), unit="D"),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"], size=n_ord)})

    # lineitem orderkeys run past n_ord (orphans must drop in every
    # inner-join query); shipdate = orderdate + offset with offsets
    # pinning the exact 60/90-day late boundaries
    lkey = rng.integers(0, n_ord + 20, size=n_li).astype(np.int64)
    offs = rng.choice([0, 30, 59, 60, 61, 89, 90, 91, 200, 400],
                      size=n_li)
    base = pd.to_datetime("1996-06-01")
    odate = orders.set_index("o_orderkey")["o_orderdate"]
    ship = np.where(
        lkey < n_ord,
        odate.reindex(np.minimum(lkey, n_ord - 1)).to_numpy(),
        base.to_datetime64())
    ship = pd.to_datetime(ship) + pd.to_timedelta(offs, unit="D")
    li = pd.DataFrame({
        "l_orderkey": lkey,
        "l_partkey": rng.integers(0, n_part, size=n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, size=n_li).astype(np.int64),
        "l_linenumber": rng.integers(1, 7, size=n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 60, size=n_li).astype(float),
        "l_extendedprice": rng.integers(0, 2_000_000, size=n_li) / 200.0,
        "l_discount": rng.integers(0, 21, size=n_li) / 200.0,
        "l_tax": rng.integers(0, 17, size=n_li) / 200.0,
        "l_returnflag": rng.choice(["A", "N", "R"], size=n_li),
        "l_linestatus": rng.choice(["F", "O"], size=n_li),
        "l_shipdate": ship})
    # q17 boundary: part 0 is Brand#13 with quantities (10, 90) only ->
    # 5 * 1000 * 2 == 10000 == sum_qty_x100 (strict < excludes both)
    li.loc[li["l_partkey"] == 0, "l_partkey"] = 1
    b = li.index[:2]
    li.loc[b, "l_partkey"] = 0
    li.loc[b, "l_quantity"] = [10.0, 90.0]

    part = pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{rng.choice(['red', 'blue', 'hot', 'small'])} "
                   f"{rng.choice(['bolt', 'gear', 'widget', 'ring'])}"
                   for _ in range(n_part)],
        "p_brand": rng.choice(["Brand#3", "Brand#13", "Brand#14",
                               "Brand#21", "Brand#25"], size=n_part),
        "p_type": rng.choice(["STANDARD", "PROMO", "SMALL"], size=n_part),
        "p_size": rng.choice([1, 4, 9, 14, 19, 23, 36, 45, 2, 7],
                             size=n_part).astype(np.int32),
        "p_retailprice": rng.integers(0, 400_000, size=n_part) / 200.0})
    part.loc[0, "p_brand"] = "Brand#13"          # the q17 boundary part

    cust = pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, size=n_cust).astype(np.int32),
        "c_acctbal": rng.integers(-200_000, 2_000_000, size=n_cust) / 200.0,
        "c_mktsegment": rng.choice(["AUTOMOBILE", "BUILDING"],
                                   size=n_cust)})
    supp = pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, size=n_supp).astype(np.int32),
        "s_acctbal": rng.integers(0, 2_000_000, size=n_supp) / 200.0})

    li.to_parquet(os.path.join(d, "lineitem.parquet"))
    orders.to_parquet(os.path.join(d, "orders.parquet"))
    part.to_parquet(os.path.join(d, "part.parquet"))
    cust.to_parquet(os.path.join(d, "customer.parquet"))
    supp.to_parquet(os.path.join(d, "supplier.parquet"))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [3, 41])
def test_oracled_tpch_ops_on_random_tables(tmp_path, seed):
    import shutil
    from pdf_extraction_ray.pipelines.tpch import TPCH_QUERIES

    d = str(tmp_path / f"tpch{seed}")
    os.makedirs(d, exist_ok=True)
    for t in ("region", "nation", "events", "documents", "embeddings"):
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    os.path.join(d, f"{t}.parquet"))
    _random_tpch_tables(seed, d)

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")

    for name in TPCH_FUZZ_QUERIES:
        fn, sql = TPCH_QUERIES[name]
        res = fn(d)
        ray_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        duck_df = con.sql(sql).df()
        rc = ray_df[sorted(ray_df.columns)] \
            .sort_values(by=sorted(ray_df.columns)).reset_index(drop=True)
        oc = duck_df[sorted(duck_df.columns)] \
            .sort_values(by=sorted(duck_df.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(rc, oc, check_dtype=False,
                                      check_exact=True, obj=f"{name}@{seed}")
