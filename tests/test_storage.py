"""Table-maintenance operators: skew-aware join (hot-key replication),
MERGE INTO changelog upsert, and Hive-partitioned write + pruned read."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pdf_extraction_ray.pipelines.relational import (_skew_hot_keys,
                                                     events_nation_skew_join,
                                                     SKEW_JOIN_SQL)
from pdf_extraction_ray.pipelines.storage import (customer_merge_upsert,
                                                  events_partitioned_prune,
                                                  MERGE_UPSERT_SQL,
                                                  MERGE_KEY_STRIDE,
                                                  PARTITIONED_PRUNE_SQL,
                                                  PRUNE_EVENT_TYPE)


def _write_events(d, df):
    os.makedirs(d, exist_ok=True)
    df.to_parquet(os.path.join(d, "events.parquet"))


def _oracle(sf_dir, sql, tables):
    con = duckdb.connect()
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{p}')")
    return con.sql(sql).df()


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _zipf_dir(tmp_path):
    """20 cold users (5 events each) + one user with 500 events: the hot
    key carries 5x the uniform share, forcing the split."""
    d = str(tmp_path / "zipf")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(7)
    users = np.concatenate([np.repeat(np.arange(1, 21), 5),
                            np.repeat(99, 500)])
    n = len(users)
    events = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.Timestamp("2020-01-01")
        + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        "user_id": users.astype(np.int64),
        "event_type": np.where(rng.random(n) < 0.2, "error", "click"),
        "value": rng.random(n) * 100,
        "props": '{"k": 1}'})
    events.to_parquet(os.path.join(d, "events.parquet"))
    cust = pd.DataFrame({
        "c_custkey": np.arange(0, 120, dtype=np.int64),
        "c_name": [f"Customer#{i}" for i in range(120)],
        "c_nationkey": (np.arange(120) % 7).astype(np.int64),
        "c_acctbal": np.linspace(0, 999, 120)})
    cust.to_parquet(os.path.join(d, "customer.parquet"))
    nation = pd.DataFrame({
        "n_nationkey": np.arange(7, dtype=np.int64),
        "n_name": [f"NATION_{i}" for i in range(7)]})
    nation.to_parquet(os.path.join(d, "nation.parquet"))
    return d


@pytest.mark.usefixtures("ray_session")
class TestSkewJoin:
    def test_hot_key_detected(self, tmp_path):
        d = _zipf_dir(tmp_path)
        ds = rd.read_parquet(os.path.join(d, "events.parquet"),
                             columns=["user_id", "value"])
        hot = _skew_hot_keys(ds)
        assert 99 in hot
        # cold users (uniform share) stay out of the broadcast set
        assert len(hot) == 1

    def test_planted_zipf_matches_oracle(self, tmp_path):
        d = _zipf_dir(tmp_path)
        got = _canon(events_nation_skew_join(d).to_pandas())
        want = _canon(_oracle(d, SKEW_JOIN_SQL,
                              ["events", "customer", "nation"]))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_hot_rows_counted_once(self, tmp_path):
        """Total event count across nations must equal the raw joined
        count — a double-counted hot path would inflate it."""
        d = _zipf_dir(tmp_path)
        got = events_nation_skew_join(d).to_pandas()
        ev = pd.read_parquet(os.path.join(d, "events.parquet"))
        cust = pd.read_parquet(os.path.join(d, "customer.parquet"))
        joined = ev.merge(cust, left_on="user_id", right_on="c_custkey")
        assert got["n_events"].sum() == len(joined)


def _merge_dir(tmp_path):
    d = str(tmp_path / "merge")
    os.makedirs(d, exist_ok=True)
    # base keys 0..10 (stride-aligned keys 0, 11 exist in base)
    cust = pd.DataFrame({
        "c_custkey": np.arange(0, 12, dtype=np.int64),
        "c_name": [f"Customer#{i}" for i in range(12)],
        "c_nationkey": np.zeros(12, dtype=np.int64),
        "c_acctbal": np.full(12, 50.0)})
    cust.to_parquet(os.path.join(d, "customer.parquet"))
    # user 0 -> key 0: update (click, latest value 7.0)
    # user 1 -> key 11: delete (latest is error)
    # user 5 -> key 55: insert (not in base)
    events = pd.DataFrame({
        "event_id": np.arange(5, dtype=np.int64),
        "ts": pd.to_datetime(["2020-01-01", "2020-01-02", "2020-01-01",
                              "2020-01-03", "2020-01-02"]),
        "user_id": np.array([0, 0, 1, 1, 5], dtype=np.int64),
        "event_type": ["error", "click", "click", "error", "view"],
        "value": [1.0, 7.0, 2.0, 3.0, 9.5],
        "props": '{"k": 1}'})
    events.to_parquet(os.path.join(d, "events.parquet"))
    return d


@pytest.mark.usefixtures("ray_session")
class TestMergeUpsert:
    def test_all_three_arms(self, tmp_path):
        d = _merge_dir(tmp_path)
        got = customer_merge_upsert(d).to_pandas() \
            .set_index("c_custkey")
        # update: latest change for key 0 is the click at 7.0
        assert got.loc[0, "acctbal_x100"] == 700
        assert got.loc[0, "c_name"] == "Customer#0"
        # delete: key 11 tombstoned by the latest error event
        assert 11 not in got.index
        # insert: key 55 was not in base
        assert got.loc[55, "acctbal_x100"] == 950
        assert got.loc[55, "c_name"] == "NEW#55"
        # untouched base rows keep their balance
        assert got.loc[2, "acctbal_x100"] == 5000
        assert MERGE_KEY_STRIDE == 11

    def test_matches_oracle(self, tmp_path):
        d = _merge_dir(tmp_path)
        got = _canon(customer_merge_upsert(d).to_pandas())
        want = _canon(_oracle(d, MERGE_UPSERT_SQL, ["customer", "events"]))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestZorder:
    def test_morton_monotone_locality(self):
        from pdf_extraction_ray.pipelines.storage import _morton2
        a = np.array([0, 1, 0, 1], dtype=np.int64)
        b = np.array([0, 0, 1, 1], dtype=np.int64)
        # the 2x2 quadrant order of the Z curve
        assert _morton2(a, b).tolist() == [0, 1, 2, 3]

    def test_prune_matches_oracle(self, tmp_path):
        from pdf_extraction_ray.pipelines.storage import (
            ZORDER_PRUNE_SQL, events_zorder_prune)
        sf = "/root/testdata/sf0.001"
        got = events_zorder_prune(sf)
        want = _oracle(sf, ZORDER_PRUNE_SQL, ["events"])
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      want.reset_index(drop=True),
                                      check_dtype=False)

    def test_balanced_pruning_vs_single_dim_sort(self, tmp_path):
        """The user-dimension box must be prunable ONLY under z-order
        (a ts-sorted layout reads every file), and across a mixed box
        workload z-order must read no more files overall."""
        from pdf_extraction_ray.pipelines.storage import (
            _events_bounds, surviving_files, write_layout)
        sf = "/root/testdata/sf0.001"
        umin, umax, tmin, tmax = _events_bounds(sf)
        boxes = {
            "user": (umin + (umax - umin) * 2 // 5,
                     umin + (umax - umin) * 3 // 5, tmin, tmax),
            "time": (umin, umax, tmin + (tmax - tmin) * 2 // 5,
                     tmin + (tmax - tmin) * 3 // 5),
            "2d": (umin + (umax - umin) * 2 // 5,
                   umin + (umax - umin) * 3 // 5,
                   tmin + (tmax - tmin) * 2 // 5,
                   tmin + (tmax - tmin) * 3 // 5)}
        reads = {}
        for order in ("ts", "zorder"):
            d = str(tmp_path / order)
            files = write_layout(sf, d, order)
            reads[order] = {b: len(surviving_files(files, box))
                            for b, box in boxes.items()}
            reads[order]["total_files"] = len(files)
        assert reads["ts"]["user"] == reads["ts"]["total_files"]
        assert reads["zorder"]["user"] < reads["ts"]["user"]
        assert sum(reads["zorder"][b] for b in boxes) <= \
            sum(reads["ts"][b] for b in boxes)


def _orders_shard(n0, n, month_offset=0):
    dates = pd.to_datetime("2020-01-15") \
        + pd.to_timedelta((np.arange(n) % 90) + month_offset * 30, unit="D")
    return pd.DataFrame({
        "o_orderkey": np.arange(n0, n0 + n, dtype=np.int64),
        "o_custkey": np.ones(n, dtype=np.int64),
        "o_orderdate": dates.astype("datetime64[us]"),
        "o_totalprice": np.linspace(10, 500, n)})


@pytest.mark.usefixtures("ray_session")
class TestMatview:
    def test_incremental_refresh_and_rebuild(self, tmp_path):
        from pdf_extraction_ray.pipelines.storage import (
            refresh_orders_monthly_view)
        sf = str(tmp_path / "src")
        odir = os.path.join(sf, "orders.parquet")   # table as a shard dir
        os.makedirs(odir)
        store = str(tmp_path / "store")
        _orders_shard(0, 100).to_parquet(os.path.join(odir, "s0.parquet"))
        _orders_shard(100, 80).to_parquet(os.path.join(odir, "s1.parquet"))

        v1, scanned, rebuilt = refresh_orders_monthly_view(sf, store)
        assert scanned == 2 and not rebuilt

        # append-only advance: one new shard -> only it is scanned
        _orders_shard(180, 60, month_offset=3).to_parquet(
            os.path.join(odir, "s2.parquet"))
        v2, scanned, rebuilt = refresh_orders_monthly_view(sf, store)
        assert scanned == 1 and not rebuilt

        want = _oracle(sf, """
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))
                        AS BIGINT) AS total_x100,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY month ORDER BY month""", ["orders"])
        pd.testing.assert_frame_equal(v2.reset_index(drop=True), want,
                                      check_dtype=False)

        # no change -> nothing scanned, same view
        v3, scanned, rebuilt = refresh_orders_monthly_view(sf, store)
        assert scanned == 0 and not rebuilt
        pd.testing.assert_frame_equal(v3, v2)

        # a corrupted store pointer degrades to a full rebuild, never an
        # error or a double count
        with open(os.path.join(store, "CURRENT"), "w") as fh:
            fh.write("not-a-snapshot")
        vc, scanned, rebuilt = refresh_orders_monthly_view(sf, store)
        assert scanned == 3
        pd.testing.assert_frame_equal(vc, v2)

        # rewriting a known shard voids append-only -> full rebuild
        _orders_shard(0, 50).to_parquet(os.path.join(odir, "s0.parquet"))
        v4, scanned, rebuilt = refresh_orders_monthly_view(sf, store)
        assert rebuilt and scanned == 3
        want = _oracle(sf, """
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))
                        AS BIGINT) AS total_x100,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY month ORDER BY month""", ["orders"])
        pd.testing.assert_frame_equal(v4.reset_index(drop=True), want,
                                      check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestPartitionedPrune:
    def test_round_trip_matches_oracle(self, tmp_path):
        d = str(tmp_path / "ev")
        rng = np.random.default_rng(3)
        n = 400
        ev = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.Timestamp("2021-06-01")
            + pd.to_timedelta(rng.integers(0, 86400 * 5, n), unit="s"),
            "user_id": rng.integers(0, 10, n).astype(np.int64),
            "event_type": rng.choice(
                [PRUNE_EVENT_TYPE, "click", "view"], n),
            "value": rng.random(n) * 10,
            "props": '{"k": 1}'})
        _write_events(d, ev)
        got = _canon(events_partitioned_prune(d))
        want = _canon(_oracle(d, PARTITIONED_PRUNE_SQL, ["events"]))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_missing_partition_is_empty(self, tmp_path):
        d = str(tmp_path / "ev2")
        ev = pd.DataFrame({
            "event_id": np.array([0], dtype=np.int64),
            "ts": pd.to_datetime(["2021-06-01"]),
            "user_id": np.array([1], dtype=np.int64),
            "event_type": ["click"],   # no purchase partition at all
            "value": [1.0],
            "props": '{"k": 1}'})
        _write_events(d, ev)
        out = events_partitioned_prune(d)
        assert len(out) == 0
        assert list(out.columns) == ["day", "n_events", "value_x100"]


class TestCompaction:
    def test_plan_next_fit_semantics(self, tmp_path):
        from pdf_extraction_ray.pipelines.storage import plan_compaction_bins
        d = str(tmp_path / "frags")
        os.makedirs(d)
        # deterministic sizes via padded binary columns: name order a..e
        sizes = {"a": 100, "b": 100, "c": 100, "d": 500, "e": 100}
        for name, extra in sizes.items():
            with open(os.path.join(d, f"{name}.parquet"), "wb") as f:
                f.write(b"x" * extra)
        bins = plan_compaction_bins(d, target_bytes=250)
        names = [[os.path.basename(p)[0] for p in b] for b in bins]
        # a+b fit (200), c opens a new bin, d (500 > target) closes c's
        # bin and sits alone (never split), e starts fresh
        assert names == [["a", "b"], ["c"], ["d"], ["e"]]
        # every multi-file bin respects the target on INPUT bytes
        for b in bins:
            if len(b) > 1:
                assert sum(os.path.getsize(p) for p in b) <= 250

    @pytest.mark.usefixtures("ray_session")
    def test_compact_roundtrip_content_exact(self, tmp_path):
        from pdf_extraction_ray.pipelines.storage import (
            compact_parquet_dir, plan_compaction_bins)
        import pyarrow.parquet as pq
        frag = str(tmp_path / "in")
        outd = str(tmp_path / "out")
        df = pd.DataFrame({"k": np.arange(5000, dtype=np.int64),
                           "v": np.arange(5000, dtype=np.int64) * 3})
        rd.from_pandas(df).repartition(20).write_parquet(frag)
        n_in = len(os.listdir(frag))
        assert n_in >= 10
        total = sum(os.path.getsize(os.path.join(frag, f))
                    for f in os.listdir(frag))
        target = total // 4
        stats = compact_parquet_dir(frag, outd, target).to_pandas()
        outs = sorted(os.listdir(outd))
        assert len(outs) == len(plan_compaction_bins(frag, target))
        assert len(outs) < n_in                       # actually compacted
        assert int(stats["rows"].sum()) == 5000
        back = pd.concat([pq.read_table(os.path.join(outd, f)).to_pandas()
                          for f in outs]).sort_values("k",
                                                      ignore_index=True)
        pd.testing.assert_frame_equal(back, df)


# ---------------------------------------------------------------------------
# schema evolution + bucketed join
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_schema_evolution_fill_and_exactness(tmp_path):
    """Even orderkeys surface as the fill value, odd keep their real
    priority; counts and cents totals are exact vs a pandas reference."""
    from pdf_extraction_ray.pipelines.storage import (
        orders_schema_evolution, EVOLVE_FILL)
    d = str(tmp_path)
    df = pd.DataFrame({
        "o_orderkey": np.arange(1, 21, dtype=np.int64),
        "o_totalprice": np.arange(1, 21) * 10.01,
        "o_orderpriority": ["1-URGENT" if k % 3 == 0 else "3-MEDIUM"
                            for k in range(1, 21)]})
    df.to_parquet(os.path.join(d, "orders.parquet"))
    out = orders_schema_evolution(d)
    ref = df.copy()
    ref.loc[ref.o_orderkey % 2 == 0, "o_orderpriority"] = EVOLVE_FILL
    ref["cents"] = np.round(ref.o_totalprice * 100.0).astype(np.int64)
    want = ref.groupby("o_orderpriority").agg(
        n_orders=("cents", "size"), total_x100=("cents", "sum")) \
        .reset_index()
    got = out.sort_values("o_orderpriority").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want.sort_values("o_orderpriority").reset_index(drop=True),
        check_dtype=False)
    assert EVOLVE_FILL in set(got.o_orderpriority)


@pytest.mark.usefixtures("ray_session")
def test_bucketed_join_drops_orphans(tmp_path):
    """Orders referencing absent customers must vanish (inner-join
    semantics survive the bucketed layout); per-segment sums exact."""
    from pdf_extraction_ray.pipelines.storage import (
        orders_customer_bucketed_join)
    d = str(tmp_path)
    pd.DataFrame({
        "o_orderkey": np.arange(6, dtype=np.int64),
        "o_custkey": np.array([1, 2, 3, 99, 1, 2], dtype=np.int64),
        "o_totalprice": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0]}) \
        .to_parquet(os.path.join(d, "orders.parquet"))
    pd.DataFrame({
        "c_custkey": np.array([1, 2, 3], dtype=np.int64),
        "c_mktsegment": ["A", "B", "A"]}) \
        .to_parquet(os.path.join(d, "customer.parquet"))
    out = orders_customer_bucketed_join(d).set_index("c_mktsegment")
    # custkey 99 orphan dropped; A: custkeys 1(10+50) + 3(30); B: 20+60
    assert out.loc["A", "n_orders"] == 3
    assert out.loc["A", "total_x100"] == (10 + 50 + 30) * 100
    assert out.loc["B", "n_orders"] == 2
    assert out.loc["B", "total_x100"] == (20 + 60) * 100
