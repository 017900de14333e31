"""Relational operator pipelines over the TPC-H-ish testdata tables —
the engine's filter / project / join / aggregate / sort / distinct /
window surface (SURVEY.md §2.2, §2.5-2.8 cross-doc analogs), each with a
DuckDB oracle SQL string for the driver's side-by-side check.

Scale design notes (these run on ~100 TB inputs in production):

- **Partial aggregation**: every groupby pre-aggregates inside
  ``map_batches`` (one row per key per batch) so the all-to-all shuffle
  moves partials, not rows.
- **Broadcast joins**: dimension sides (region/nation/supplier/customer/
  part, and filtered orders) are built once on the driver, ``ray.put``
  into the object store, and hash-looked-up inside ``map_batches`` —
  no shuffle. When the "small" side stops being small (orders at full
  scale), the documented fallback is bucket-partitioned hash join:
  add ``bucket = hash(key) % B`` to both sides and join per bucket.
- **Exact money math**: decimal columns are scaled to int64 (cents /
  x1e4 / x1e6) BEFORE summation, so distributed summation order cannot
  perturb results and the DuckDB comparison is bit-exact.
- **Pruned reads**: every ``read_parquet`` passes ``columns=``.
- **Whole-block batches**: every stateless vectorized stage passes
  ``batch_size=None`` (= one batch per block). The map_batches default
  of 1024 rows costs one pandas/Arrow kernel dispatch per KB-scale
  slice — measured 4.7x slower on q18 at 10M rows — while these
  kernels are O(rows) on block-sized inputs.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def _pq(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def _cents(col, scale: float = 100.0):
    """ROUND(col * scale) -> int64, half-AWAY-from-zero to match DuckDB's
    ROUND exactly (pc.round/np.round default to half-to-even — a latent
    oracle divergence whenever a scaled value lands on .5)."""
    x = pc.multiply(col, pa.scalar(float(scale)))
    away = pc.multiply(pc.sign(x),
                       pc.floor(pc.add(pc.abs(x), pa.scalar(0.5))))
    return pc.cast(away, pa.int64())


from ..functions.arrow_utils import round_half_away as _round_half_away  # noqa: E402


def _pre_coalesce(ds, spec):
    """Bound the block count entering a sort-based exchange. Ray's sort
    cost carries a per-block constant (sampling + partition + merge
    bookkeeping) that dominates when the input is over-fragmented —
    parquet SplitBlocks targets ~2 blocks/core regardless of table
    size, so two unioned narrow projections enter the exchange as 128
    tiny blocks at sf scales. ``"auto"`` coalesces to ~cores/2 blocks
    (measured on the as-of join at sf0.1: 4.0 s -> 1.5 s; sessions
    1.2 s -> 0.6 s), which stays data-proportional on a real cluster
    (cores grows with nodes). Pass ``None`` when the exchanged rows are
    petabyte-raw and per-block bytes would exceed the object-store
    block target — the one regime where fewer blocks is wrong."""
    if spec == "auto":
        from ..functions.cluster import cluster_cpus
        spec = max(8, cluster_cpus() // 2)
    return ds.repartition(spec) if spec else ds


def _coarse_grouped_map(ds, key: str, per_group_fn, n_coarse: int | None = None,
                        pre_coalesce="auto"):
    """Per-key grouped map with a COARSE shuffle key: the exchange
    partitions on ``key % n_coarse`` (constant group count at any scale);
    the exact per-key grouping runs as a pandas groupby inside each
    partition. One tiny Ray group per key is pure scheduler overhead —
    same pattern as the LSH band grouping in pipelines/dedup.py.
    ``n_coarse`` defaults to ``default_n_coarse()`` (cluster-scaled)."""
    if n_coarse is None:
        from ..functions.cluster import default_n_coarse
        n_coarse = default_n_coarse()

    def add_coarse(batch: pa.Table) -> pa.Table:
        c = batch[key].to_numpy(zero_copy_only=False) % n_coarse
        return batch.append_column("_coarse", pa.array(c.astype(np.int64))) \
            .replace_schema_metadata(None)   # clean schemas shuffle faster

    def run(g: pd.DataFrame) -> pd.DataFrame:
        outs = [per_group_fn(sub.drop(columns=["_coarse"]))
                for _, sub in g.groupby(key)]
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()

    return _pre_coalesce(ds, pre_coalesce) \
        .map_batches(add_coarse, batch_format="pyarrow", batch_size=None) \
        .groupby("_coarse").map_groups(run, batch_format="pandas")


def _coarse_partition_map(ds, key: str, partition_fn, n_coarse: int | None = None,
                          pre_coalesce="auto"):
    """Like ``_coarse_grouped_map`` but hands the WHOLE coarse partition
    (all keys that hashed to it) to ``partition_fn`` in one DataFrame.
    Use with pandas-groupby-vectorized window logic: a per-key callback
    costs one DataFrame construction per key (~130 us), which dominates
    wall time once a table has >10k keys."""
    if n_coarse is None:
        from ..functions.cluster import default_n_coarse
        n_coarse = default_n_coarse()

    def add_coarse(batch: pa.Table) -> pa.Table:
        c = batch[key].to_numpy(zero_copy_only=False) % n_coarse
        return batch.append_column("_coarse", pa.array(c.astype(np.int64))) \
            .replace_schema_metadata(None)

    return _pre_coalesce(ds, pre_coalesce) \
        .map_batches(add_coarse, batch_format="pyarrow", batch_size=None) \
        .groupby("_coarse") \
        .map_groups(lambda g: partition_fn(g.drop(columns=["_coarse"])),
                    batch_format="pandas")


def _coarse_grouped_map_union(left, right, partition_fn, key: str = "key",
                              n_coarse: int | None = None, pre_coalesce="auto"):
    """Co-partitioned merge of two SIDE-TAGGED datasets sharing one
    schema: union them, hash both through one coarse exchange on the
    int ``key`` column, and hand each whole partition to
    ``partition_fn``. The pool-free alternative to a second native hash
    join — two concurrent join actor pools starve each other on small
    CPU budgets, while this shape is plain tasks + one sort exchange."""
    if n_coarse is None:
        from ..functions.cluster import default_n_coarse
        n_coarse = default_n_coarse()

    def add_coarse(batch: pa.Table) -> pa.Table:
        c = batch[key].to_numpy(zero_copy_only=False) % n_coarse
        return batch.append_column("_coarse", pa.array(c.astype(np.int64))) \
            .replace_schema_metadata(None)

    return (_pre_coalesce(left.union(right), pre_coalesce)
            .map_batches(add_coarse, batch_format="pyarrow", batch_size=None)
            .groupby("_coarse")
            .map_groups(lambda g: partition_fn(g.drop(columns=["_coarse"])),
                        batch_format="pandas"))


def _coarse_str_partition_map(ds, key: str, partition_fn,
                              n_coarse: int = 8, pre_coalesce="auto"):
    """``_coarse_partition_map`` for STRING keys (stable string hash
    instead of int modulo). One implementation shared by every
    string-keyed grouped map in this module (corpus.py carries the same
    helper for its term/md5 exchanges)."""
    def add_coarse(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            batch[key].to_numpy(zero_copy_only=False).astype(str))
        return batch.append_column(
            "_coarse", pa.array((h % np.uint64(n_coarse)).astype(np.int64))) \
            .replace_schema_metadata(None)

    return _pre_coalesce(ds, pre_coalesce) \
        .map_batches(add_coarse, batch_format="pyarrow", batch_size=None) \
        .groupby("_coarse") \
        .map_groups(lambda g: partition_fn(g.drop(columns=["_coarse"])),
                    batch_format="pandas")


def _from_pandas(df) -> pa.Table:
    """from_pandas with pandas schema metadata stripped — leftover metadata
    defeats Ray's block-schema deduplication during shuffles (visible as
    'Failed to hash the schemas' warnings and slower exchanges)."""
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _table_empty(sf_dir: str, table: str) -> bool:
    """Row count straight from parquet footers (no data read) — used to
    short-circuit native hash joins, whose aggregators cannot finalize
    fully-empty inputs."""
    import pyarrow.dataset as pads
    return pads.dataset(_pq(sf_dir, table)).count_rows() == 0


# ---------------------------------------------------------------------------
# Q1 — pricing summary (grouped aggregate with partial pre-aggregation)
# ---------------------------------------------------------------------------

Q1_CUTOFF = "2000-09-02"


def q1_pricing_summary(sf_dir: str):
    ds = rd.read_parquet(
        _pq(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less_equal(
            batch["l_shipdate"],
            pa.scalar(pd.Timestamp(Q1_CUTOFF).to_datetime64())))
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        charge = pc.multiply(disc, pc.add(pa.scalar(1.0), t["l_tax"]))
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_pandas(),
            "l_linestatus": t["l_linestatus"].to_pandas(),
            "sum_qty_x100": _cents(t["l_quantity"]).to_pandas(),
            "sum_base_x100": _cents(t["l_extendedprice"]).to_pandas(),
            "sum_disc_x1e4": _cents(disc, 1e4).to_pandas(),
            "sum_charge_x1e6": _cents(charge, 1e6).to_pandas(),
        })
        g = (df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
               .agg(sum_qty_x100=("sum_qty_x100", "sum"),
                    sum_base_x100=("sum_base_x100", "sum"),
                    sum_disc_x1e4=("sum_disc_x1e4", "sum"),
                    sum_charge_x1e6=("sum_charge_x1e6", "sum"),
                    count_order=("sum_qty_x100", "size")))
        return _from_pandas(g)

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum("sum_qty_x100", alias_name="sum_qty_x100"),
                        Sum("sum_base_x100", alias_name="sum_base_x100"),
                        Sum("sum_disc_x1e4", alias_name="sum_disc_x1e4"),
                        Sum("sum_charge_x1e6", alias_name="sum_charge_x1e6"),
                        Sum("count_order", alias_name="count_order")))

    def finalize(batch: pa.Table) -> pa.Table:
        q = batch["sum_qty_x100"].to_numpy(zero_copy_only=False)
        n = batch["count_order"].to_numpy(zero_copy_only=False)
        avg = np.where(n > 0, (q * 100) // np.maximum(n, 1), 0)
        return batch.append_column("avg_qty_x1e4", pa.array(avg, type=pa.int64()))

    return agg.map_batches(finalize, batch_format="pyarrow", batch_size=None) \
              .sort(["l_returnflag", "l_linestatus"])


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_x100,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_base_x100,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000.0) AS BIGINT)) AS BIGINT) AS sum_disc_x1e4,
       CAST(SUM(CAST(ROUND(((l_extendedprice * (1 - l_discount)) * (1 + l_tax)) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_charge_x1e6,
       COUNT(*) AS count_order,
       (CAST(SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT)) AS BIGINT) * 100) // COUNT(*) AS avg_qty_x1e4
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q3 — top orders by revenue (broadcast semi-join + grouped agg + top-k)
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_TOPK = 10


def q3_top_orders(sf_dir: str):
    # small side 1: customers in segment -> key set (broadcast)
    cust = pd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    custkeys = set(cust.loc[cust.c_mktsegment == Q3_SEGMENT, "c_custkey"])
    # small side 2: their orders -> orderkey -> orderdate map (broadcast)
    orders = pd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders[orders.o_custkey.isin(custkeys)]
    okeys_ref = ray.put(np.sort(orders.o_orderkey.to_numpy()))
    omap_ref = ray.put(dict(zip(orders.o_orderkey, orders.o_orderdate)))

    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(okeys_ref)                # broadcast sorted key set
        lk = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        if len(keys) == 0:                       # empty segment -> no rows
            mask = np.zeros(len(lk), dtype=bool)
        else:
            pos = np.searchsorted(keys, lk)
            mask = (pos < len(keys)) \
                & (keys[np.minimum(pos, len(keys) - 1)] == lk)
        t = batch.filter(pa.array(mask))
        rev = _cents(pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"])), 1e4)
        df = pd.DataFrame({"o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
                           "revenue_x1e4": rev.to_numpy(zero_copy_only=False)})
        g = df.groupby("o_orderkey", as_index=False).sum()
        return _from_pandas(g)

    # partials are small; coalesce before the high-cardinality groupby so
    # the sort-based shuffle runs over a few blocks, not 64 tiny ones
    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
             .repartition(16)
             .groupby("o_orderkey")
             .aggregate(Sum("revenue_x1e4", alias_name="revenue_x1e4")))

    top = agg.sort(["revenue_x1e4", "o_orderkey"],
                   descending=[True, False]).limit(Q3_TOPK)

    def attach_date(batch: pa.Table) -> pa.Table:
        omap = ray.get(omap_ref)
        dates = [pd.Timestamp(omap[k]).strftime("%Y-%m-%d")
                 for k in batch["o_orderkey"].to_pylist()]
        return batch.append_column("o_orderdate", pa.array(dates, type=pa.string()))

    return top.map_batches(attach_date, batch_format="pyarrow", batch_size=None)


Q3_SQL = f"""
SELECT o_orderkey,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_x1e4,
       strftime(ANY_VALUE(o_orderdate), '%Y-%m-%d') AS o_orderdate
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
GROUP BY o_orderkey
ORDER BY revenue_x1e4 DESC, o_orderkey
LIMIT {Q3_TOPK}
"""


# ---------------------------------------------------------------------------
# Q6-style — forecast revenue (predicate-heavy scan, no join, no groupby)
# ---------------------------------------------------------------------------

Q6_DISC_LO, Q6_DISC_HI, Q6_QTY_LIM = 0.05, 0.07, 24.0


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: the pure filter-then-reduce pattern — every
    predicate applied per batch with Arrow kernels, only an int64
    partial sum leaving each task, one global Sum at the end. The
    cheapest possible plan over the biggest table: no exchange at all."""
    import datetime
    import pyarrow.dataset as pads
    lo, hi = datetime.date(1996, 1, 1), datetime.date(1997, 1, 1)
    # the full predicate is ALSO pushed into the parquet scan
    # (row-group statistics pruning + scan-level filtering — at 100 TB
    # a date-sorted layout skips most of the table before any task
    # sees it); the in-batch mask below stays as the correctness
    # guard, costing one redundant vectorized pass over survivors
    push = ((pads.field("l_shipdate") >= pa.scalar(lo))
            & (pads.field("l_shipdate") < pa.scalar(hi))
            & (pads.field("l_discount") >= Q6_DISC_LO)
            & (pads.field("l_discount") <= Q6_DISC_HI)
            & (pads.field("l_quantity") < Q6_QTY_LIM))
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_shipdate", "l_discount",
                                  "l_quantity", "l_extendedprice"],
                         filter=push)

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
                    pc.less(batch["l_shipdate"], pa.scalar(hi))),
            pc.and_(
                pc.and_(pc.greater_equal(batch["l_discount"],
                                         pa.scalar(Q6_DISC_LO)),
                        pc.less_equal(batch["l_discount"],
                                      pa.scalar(Q6_DISC_HI))),
                pc.less(batch["l_quantity"], pa.scalar(Q6_QTY_LIM))))
        t = batch.filter(m)
        rev = _cents(pc.multiply(t["l_extendedprice"], t["l_discount"]),
                     1e4)
        s = pc.sum(rev).as_py() or 0
        return pa.Table.from_pydict(
            {"revenue_x1e4": pa.array([s], type=pa.int64())})

    total = ds.map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .sum("revenue_x1e4")
    return pd.DataFrame({"revenue_x1e4":
                         pd.Series([int(total or 0)], dtype="int64")})


Q6_SQL = """
SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * l_discount
                                    * 10000.0) AS BIGINT)), 0) AS BIGINT)
           AS revenue_x1e4
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q18-style — large-volume orders (HAVING on a grouped sum + native join)
# ---------------------------------------------------------------------------

Q18_QTY_THRESHOLD_X100 = 180 * 100
Q18_TOPK = 10


def q18_large_orders(sf_dir: str):
    """TPC-H Q18 shape: high-cardinality grouped sum over the big table,
    HAVING filter, orders attach, global top-k — in ONE exchange.
    Lineitem pre-aggregates per-orderkey partials inside each batch;
    the coarse hash exchange co-locates every partial of a key together
    with that key's orders row, so the final sum, the HAVING filter and
    the attach all happen in the same partition pass. Orders is never
    broadcast and no join actor pool spins up (the native JoinOperator
    costs ~13 s flat at this scale and stays exercised by
    q3_partitioned_join / the outer-join family / the composed
    pipeline)."""
    if _table_empty(sf_dir, "lineitem") or _table_empty(sf_dir, "orders"):
        return pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "o_custkey": pd.Series(dtype="int64"),
            "total_qty_x100": pd.Series(dtype="int64"),
            "total_x100": pd.Series(dtype="int64"),
            "o_orderdate": pd.Series(dtype="object")})

    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_quantity"])

    def li_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "key": batch["l_orderkey"].to_numpy(zero_copy_only=False),
            "qty_x100": _cents(batch["l_quantity"])
            .to_numpy(zero_copy_only=False)})
        g = df.groupby("key", as_index=False).sum()
        n = len(g)
        return pa.Table.from_pydict({
            "key": g["key"].astype("int64"),
            "side": np.zeros(n, dtype=np.int8),
            "qty_x100": g["qty_x100"].astype("int64"),
            "o_custkey": np.full(n, -1, dtype=np.int64),
            "total_x100": np.full(n, -1, dtype=np.int64),
            "o_orderdate": pa.array([""] * n, type=pa.string())})

    def tag_orders(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [pc.cast(batch["o_orderkey"], pa.int64()),
             pa.array(np.ones(n, dtype=np.int8)),
             pa.array(np.full(n, -1, dtype=np.int64)),
             pc.cast(batch["o_custkey"], pa.int64()),
             _cents(batch["o_totalprice"]),
             pc.strftime(pc.cast(batch["o_orderdate"], pa.timestamp("us")),
                         format="%Y-%m-%d")],
            names=["key", "side", "qty_x100", "o_custkey",
                   "total_x100", "o_orderdate"])

    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice", "o_orderdate"]) \
        .map_batches(tag_orders, batch_format="pyarrow", batch_size=None)

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # every partial of a key lands here: final sum + HAVING + attach
        b = g[g["side"] == 0].groupby("key", as_index=False)["qty_x100"] \
            .sum()
        b = b[b["qty_x100"] > Q18_QTY_THRESHOLD_X100]
        od = g[g["side"] == 1].set_index("key")
        b = b[b["key"].isin(od.index)]
        if b.empty:
            return pd.DataFrame({
                "o_orderkey": pd.Series(dtype="int64"),
                "o_custkey": pd.Series(dtype="int64"),
                "total_qty_x100": pd.Series(dtype="int64"),
                "total_x100": pd.Series(dtype="int64"),
                "o_orderdate": pd.Series(dtype="object")})
        keys = b["key"].to_numpy()
        return pd.DataFrame({
            "o_orderkey": pd.Series(keys, dtype="int64"),
            "o_custkey": od["o_custkey"].reindex(keys)
            .astype("int64").to_numpy(),
            "total_qty_x100": b["qty_x100"].astype("int64").to_numpy(),
            "total_x100": od["total_x100"].reindex(keys)
            .astype("int64").to_numpy(),
            "o_orderdate": od["o_orderdate"].reindex(keys).to_numpy()})

    joined = _coarse_grouped_map_union(
        li.map_batches(li_partial, batch_format="pyarrow", batch_size=None), orders, attach)

    out = (joined
           .sort(["total_x100", "o_orderkey"], descending=[True, False])
           .limit(Q18_TOPK).to_pandas())
    if len(out.columns) == 0:      # schema lost through an all-empty result
        return pd.DataFrame({
            "o_orderkey": pd.Series(dtype="int64"),
            "o_custkey": pd.Series(dtype="int64"),
            "total_qty_x100": pd.Series(dtype="int64"),
            "total_x100": pd.Series(dtype="int64"),
            "o_orderdate": pd.Series(dtype="object")})
    return out


Q18_SQL = f"""
SELECT q.o_orderkey, o.o_custkey, q.total_qty_x100, o.total_x100,
       o.o_orderdate
FROM (
  SELECT l_orderkey AS o_orderkey,
         CAST(SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT)) AS BIGINT)
             AS total_qty_x100
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT))
             > {Q18_QTY_THRESHOLD_X100}) q
JOIN (
  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS total_x100,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
  FROM orders) o USING (o_orderkey)
ORDER BY o.total_x100 DESC, q.o_orderkey
LIMIT {Q18_TOPK}
"""


# ---------------------------------------------------------------------------
# Q10-style — returned-item customer revenue (two native joins + dims)
# ---------------------------------------------------------------------------

Q10_TOPK = 20


def _q10_empty() -> pd.DataFrame:
    return pd.DataFrame({
        "c_custkey": pd.Series(dtype="int64"),
        "c_name": pd.Series(dtype="object"),
        "revenue_x1e4": pd.Series(dtype="int64"),
        "acctbal_x100": pd.Series(dtype="int64"),
        "n_name": pd.Series(dtype="object")})


def q10_returned_customers(sf_dir: str):
    """TPC-H Q10 shape: revenue lost to returned items per customer
    over a date window, top-20 — with q3_auto-style size-aware plan
    selection. While the orders table fits a worker's heap (parquet
    footer probe, same ``BROADCAST_ROW_LIMIT``) the WINDOW-FILTERED
    orders (one 6-month slice, ~7% of rows) broadcast as sorted
    key->custkey arrays and the whole query runs with ONE custkey
    exchange; past the limit it switches to ``q10_partitioned``'s
    two co-partitioned union merges (no broadcast of any fact table).
    Identical result either way — the oracle covers both plans."""
    if _table_rows(sf_dir, "orders") <= BROADCAST_ROW_LIMIT:
        return _q10_broadcast(sf_dir)
    return q10_partitioned(sf_dir)


def _q10_broadcast(sf_dir: str):
    """One-exchange q10 plan: window-filtered orders broadcast
    (orderkey -> custkey sorted-lookup), lineitem R-flag revenue maps
    straight to custkeys inside the scan, and only the custkey-keyed
    customer attach exchanges."""
    import datetime
    lo, hi = datetime.date(1996, 1, 1), datetime.date(1996, 7, 1)
    if _table_empty(sf_dir, "lineitem") or _table_empty(sf_dir, "orders") \
            or _table_empty(sf_dir, "customer"):
        return _q10_empty()

    import pyarrow.dataset as pads
    expr = ((pads.field("o_orderdate") >= pa.scalar(pd.Timestamp(lo)))
            & (pads.field("o_orderdate") < pa.scalar(pd.Timestamp(hi))))
    ot = pads.dataset(_pq(sf_dir, "orders")) \
        .to_table(columns=["o_orderkey", "o_custkey"], filter=expr)
    ok = ot["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ck = ot["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ok)
    oref = ray.put((ok[order], ck[order]))

    def li_to_cust(batch: pa.Table) -> pa.Table:
        ok_s, ck_s = ray.get(oref)
        t = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        if len(ok_s) == 0 or len(keys) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["o_custkey", "revenue_x1e4"])
        pos = np.minimum(np.searchsorted(ok_s, keys), len(ok_s) - 1)
        found = ok_s[pos] == keys
        rev = _cents(pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0),
                                             t["l_discount"])), 1e4) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"o_custkey": ck_s[pos][found],
                           "revenue_x1e4": rev[found]})
        return _from_pandas(df.groupby("o_custkey", as_index=False).sum())

    by_cust = rd.read_parquet(_pq(sf_dir, "lineitem"),
                              columns=["l_orderkey", "l_returnflag",
                                       "l_extendedprice", "l_discount"]) \
        .map_batches(li_to_cust, batch_format="pyarrow", batch_size=None)
    return _q10_cust_attach(sf_dir, by_cust)


def q10_partitioned(sf_dir: str):
    """The at-scale q10 plan: lineitem pre-aggregates R-flag
    revenue per orderkey inside each batch; the window-filtered orders
    and then the customer attributes attach through coarse
    co-partitioned union merges (orders and customer are NOT broadcast;
    the pool-free exchange does the same hash co-partitioning as the
    native JoinOperator without its aggregator-pool spin-up — ~13 s
    flat at sf0.1 — and without the mutual starvation two concurrent
    join pools exhibit below ~8 CPUs); only the 25-row nation table is
    broadcast. The exchanges move partial sums, never raw lineitems."""
    import datetime
    lo, hi = datetime.date(1996, 1, 1), datetime.date(1996, 7, 1)

    if _table_empty(sf_dir, "lineitem") or _table_empty(sf_dir, "orders") \
            or _table_empty(sf_dir, "customer"):
        return _q10_empty()

    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_returnflag",
                                  "l_extendedprice", "l_discount"])

    def li_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["l_returnflag"], "R"))
        rev = _cents(pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0),
                                             t["l_discount"])), 1e4)
        df = pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "revenue_x1e4": rev.to_numpy(zero_copy_only=False)})
        return _from_pandas(df.groupby("l_orderkey", as_index=False).sum())

    # NOTE: no standalone groupby(l_orderkey) here — the co-partitioned
    # union exchange below already lands every per-order partial in the
    # same partition as its order row, so attach_orders finishes the
    # per-order sum for free (a separate keyed aggregate was a fourth
    # all-to-all and measured ~1/3 of q10's wall time at sf0.1)
    rev_partials = li.map_batches(li_partial, batch_format="pyarrow",
                                  batch_size=None)

    def orders_window(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(batch["o_orderdate"], pa.scalar(lo)),
                    pc.less(batch["o_orderdate"], pa.scalar(hi)))
        t = batch.filter(m)
        n = t.num_rows
        return pa.Table.from_arrays(
            [pc.cast(t["o_orderkey"], pa.int64()),
             pa.array(np.ones(n, dtype=np.int8)),
             pa.array(np.full(n, -1, dtype=np.int64)),
             pc.cast(t["o_custkey"], pa.int64())],
            names=["key", "side", "revenue_x1e4", "o_custkey"])

    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"]) \
        .map_batches(orders_window, batch_format="pyarrow", batch_size=None)

    def tag_rev_order(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["l_orderkey"], pa.array(np.zeros(n, dtype=np.int8)),
             batch["revenue_x1e4"],
             pa.array(np.full(n, -1, dtype=np.int64))],
            names=["key", "side", "revenue_x1e4", "o_custkey"])

    def attach_orders(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["side"] == 1].set_index("key")
        r = g[g["side"] == 0].groupby("key", as_index=False)[
            "revenue_x1e4"].sum()                  # finish per-order sum
        r = r[r["key"].isin(od.index)]
        if r.empty:
            return pd.DataFrame({
                "o_custkey": pd.Series(dtype="int64"),
                "revenue_x1e4": pd.Series(dtype="int64")})
        keys = r["key"].to_numpy()
        out = pd.DataFrame({
            "o_custkey": od["o_custkey"].reindex(keys)
            .astype("int64").to_numpy(),
            "revenue_x1e4": r["revenue_x1e4"].astype("int64").to_numpy()})
        # PARTIAL per-customer sums only — the custkey-keyed exchange
        # below finishes them (a standalone groupby here was a third
        # all-to-all; each exchange costs ~5 s flat at sf0.1)
        return out.groupby("o_custkey", as_index=False).sum()

    by_cust = _coarse_grouped_map_union(
        rev_partials.map_batches(tag_rev_order, batch_format="pyarrow",
                                 batch_size=None),
        orders, attach_orders)
    return _q10_cust_attach(sf_dir, by_cust)


def _q10_cust_attach(sf_dir: str, by_cust):
    """Shared q10 tail: co-partitioned customer-attribute attach over a
    (o_custkey, revenue_x1e4) partial-sum Dataset, then the tiny top-k
    landing. Used by both the broadcast and partitioned plans."""
    nation = pd.read_parquet(_pq(sf_dir, "nation"),
                             columns=["n_nationkey", "n_name"])
    nmap_ref = ray.put(dict(zip(nation.n_nationkey.astype(int),
                                nation.n_name)))

    def cust_project(batch: pa.Table) -> pa.Table:
        nmap = ray.get(nmap_ref)           # 25-row broadcast dimension
        # INNER-join semantics, same as the oracle: a c_nationkey
        # absent from nation DROPS the customer (never fabricate "")
        names = [nmap.get(int(k)) for k in
                 batch["c_nationkey"].to_pylist()]
        keep = pa.array([n is not None for n in names])
        t = batch.filter(keep)
        return pa.Table.from_arrays(
            [pc.cast(t["c_custkey"], pa.int64()), t["c_name"],
             _cents(t["c_acctbal"]),
             pa.array([n for n in names if n is not None],
                      type=pa.string())],
            names=["c_custkey", "c_name", "acctbal_x100", "n_name"])

    customer = rd.read_parquet(_pq(sf_dir, "customer"),
                               columns=["c_custkey", "c_name",
                                        "c_acctbal", "c_nationkey"]) \
        .map_batches(cust_project, batch_format="pyarrow", batch_size=None)

    def tag_rev(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["o_custkey"], pa.array(np.zeros(n, dtype=np.int8)),
             batch["revenue_x1e4"],
             pa.array([""] * n, type=pa.string()),
             pa.array(np.full(n, -1, dtype=np.int64)),
             pa.array([""] * n, type=pa.string())],
            names=["key", "side", "revenue_x1e4", "c_name",
                   "acctbal_x100", "n_name"])

    def tag_cust(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["c_custkey"], pa.array(np.ones(n, dtype=np.int8)),
             pa.array(np.full(n, -1, dtype=np.int64)),
             batch["c_name"], batch["acctbal_x100"], batch["n_name"]],
            names=["key", "side", "revenue_x1e4", "c_name",
                   "acctbal_x100", "n_name"])

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        cu = g[g["side"] == 1].set_index("key")
        # finish the per-customer revenue sum (partials arrive from the
        # order-attach partitions), then INNER-join customer attributes
        rev = g[g["side"] == 0].groupby("key", as_index=False)[
            "revenue_x1e4"].sum()
        rev = rev[rev["key"].isin(cu.index)]
        if rev.empty:
            return pd.DataFrame({
                "c_custkey": pd.Series(dtype="int64"),
                "c_name": pd.Series(dtype="object"),
                "revenue_x1e4": pd.Series(dtype="int64"),
                "acctbal_x100": pd.Series(dtype="int64"),
                "n_name": pd.Series(dtype="object")})
        keys = rev["key"].to_numpy()
        return pd.DataFrame({
            "c_custkey": pd.Series(keys, dtype="int64"),
            "c_name": cu["c_name"].reindex(keys).to_numpy(),
            "revenue_x1e4": rev["revenue_x1e4"].astype("int64").to_numpy(),
            "acctbal_x100": cu["acctbal_x100"].reindex(keys)
            .astype("int64").to_numpy(),
            "n_name": cu["n_name"].reindex(keys).to_numpy()})

    joined = _coarse_grouped_map_union(
        by_cust.map_batches(tag_rev, batch_format="pyarrow", batch_size=None),
        customer.map_batches(tag_cust, batch_format="pyarrow", batch_size=None),
        attach)

    # top-k result is tiny: land it driver-side so an empty result keeps
    # its schema (an all-empty Dataset loses columns through to_pandas)
    out = (joined
           .sort(["revenue_x1e4", "c_custkey"], descending=[True, False])
           .limit(Q10_TOPK).to_pandas())
    if len(out.columns) == 0:
        return _q10_empty()
    return out


Q10_SQL = f"""
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,
       r.revenue_x1e4,
       CAST(ROUND(c.c_acctbal * 100.0) AS BIGINT) AS acctbal_x100,
       n.n_name
FROM (
  SELECT o_custkey,
         CAST(SUM(revenue_x1e4) AS BIGINT) AS revenue_x1e4
  FROM (
    SELECT l_orderkey,
           SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000.0)
                    AS BIGINT)) AS revenue_x1e4
    FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey) lr
  JOIN orders ON lr.l_orderkey = o_orderkey
  WHERE o_orderdate >= DATE '1996-01-01'
    AND o_orderdate < DATE '1996-07-01'
  GROUP BY o_custkey) r
JOIN customer c ON r.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY r.revenue_x1e4 DESC, c.c_custkey
LIMIT {Q10_TOPK}
"""


# ---------------------------------------------------------------------------
# Q5-style — revenue by nation (multi-dim broadcast join chain)
# ---------------------------------------------------------------------------

def q5_nation_revenue(sf_dir: str):
    nation = pd.read_parquet(_pq(sf_dir, "nation"),
                             columns=["n_nationkey", "n_name"])
    supplier = pd.read_parquet(_pq(sf_dir, "supplier"),
                               columns=["s_suppkey", "s_nationkey"])
    side = supplier.merge(nation, left_on="s_nationkey",
                          right_on="n_nationkey")[["s_suppkey", "n_name"]]
    side_ref = ray.put(dict(zip(side.s_suppkey, side.n_name)))

    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        smap = ray.get(side_ref)
        rev = _cents(pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"])),
                     1e4).to_numpy(zero_copy_only=False)
        names = pd.Series(batch["l_suppkey"].to_numpy(zero_copy_only=False)) \
            .map(smap).to_numpy()
        df = pd.DataFrame({"n_name": names, "revenue_x1e4": rev})
        return pa.Table.from_pandas(
            df.groupby("n_name", as_index=False).sum(), preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
              .groupby("n_name")
              .aggregate(Sum("revenue_x1e4", alias_name="revenue_x1e4"))
              .sort("n_name"))


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_x1e4
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Vectorized filter + computed projection
# ---------------------------------------------------------------------------

FILTER_MIN_QTY = 48.0


def filter_high_quantity(sf_dir: str):
    import pyarrow.dataset as pads
    # predicate pushed to the parquet scan (row-group pruning); the
    # in-batch filter remains the correctness guard
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_linenumber", "l_quantity",
                                  "l_extendedprice", "l_discount"],
                         filter=pads.field("l_quantity")
                         >= FILTER_MIN_QTY)

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch["l_quantity"],
                                          pa.scalar(FILTER_MIN_QTY)))
        rev = _cents(pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"])), 1e4)
        return pa.Table.from_arrays(
            [t["l_orderkey"], pc.cast(t["l_linenumber"], pa.int64()), rev],
            names=["l_orderkey", "l_linenumber", "revenue_x1e4"])

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


FILTER_SQL = f"""
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000.0) AS BIGINT) AS revenue_x1e4
FROM lineitem WHERE l_quantity >= {FILTER_MIN_QTY}
"""


# ---------------------------------------------------------------------------
# Distinct / dedup-by-key
# ---------------------------------------------------------------------------

def distinct_segments(sf_dir: str):
    ds = rd.read_parquet(_pq(sf_dir, "customer"), columns=["c_mktsegment"])
    return ds.groupby("c_mktsegment").aggregate(Count(alias_name="n_customers")) \
             .sort("c_mktsegment")


DISTINCT_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Temporal bucket aggregate (orders by month)
# ---------------------------------------------------------------------------

def orders_monthly(sf_dir: str):
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        month = pc.strftime(batch["o_orderdate"], format="%Y-%m")
        df = pd.DataFrame({
            "month": month.to_pandas(),
            "total_x100": _cents(batch["o_totalprice"]).to_pandas()})
        g = (df.groupby("month", as_index=False)
               .agg(total_x100=("total_x100", "sum"),
                    n_orders=("total_x100", "size")))
        return _from_pandas(g)

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
              .groupby("month")
              .aggregate(Sum("total_x100", alias_name="total_x100"),
                         Sum("n_orders", alias_name="n_orders"))
              .sort("month"))


ORDERS_MONTHLY_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_x100,
       COUNT(*) AS n_orders
FROM orders GROUP BY month ORDER BY month
"""


def orders_monthly_growth(sf_dir: str):
    """Month-over-month revenue growth: a WINDOW OVER AN AGGREGATE —
    the full-size scan reduces to one row per month first (exact cents,
    the distributed part), then the LAG ratio runs on that tiny
    months-sized table driver-side (at 100 TB this table is still
    <=1200 rows, so a driver window is the scale-honest plan, not a
    shuffle). growth is ONE IEEE division of two exact integers, so the
    oracle matches bit-exactly; the first month carries prev=-1 and
    growth 0 by convention (COALESCE in the oracle).
    Output: (month, total_x100, prev_x100, growth)."""
    m = orders_monthly(sf_dir).to_pandas()
    if len(m) == 0:
        return pd.DataFrame({"month": pd.Series(dtype="object"),
                             "total_x100": pd.Series(dtype="int64"),
                             "prev_x100": pd.Series(dtype="int64"),
                             "growth": pd.Series(dtype="float64")})
    m = m.sort_values("month", ignore_index=True)
    total = m["total_x100"].to_numpy(np.int64)
    prev = np.empty_like(total)
    prev[0] = -1
    prev[1:] = total[:-1]
    growth = np.zeros(len(total), dtype=np.float64)
    growth[1:] = (total[1:] - prev[1:]).astype(np.float64) \
        / prev[1:].astype(np.float64)
    return pd.DataFrame({"month": m["month"], "total_x100": total,
                         "prev_x100": prev, "growth": growth})


FIRST_CLICK_WINDOW_MS = 3_600_000


def events_first_click_attribution(sf_dir: str):
    """FIRST-click attribution (batch): every purchase attributes to
    the user's EARLIEST click at most 1 hour before it (strictly
    earlier in (ts, event_id) log order) — the campaign-origination
    mirror of the streaming tier's last-click join. Both event roles
    co-partition through one user-keyed exchange; the per-partition
    match is a vectorized user merge + window filter + min-(ts, id)
    pick. Output: (purchase_id, user_id, click_id, lag_ms)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("purchase_id", "user_id", "click_id",
                           "lag_ms")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(
            batch["event_type"],
            value_set=pa.array(["click", "purchase"])))

    def match(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(ts_ms=g["ts"].astype("datetime64[us]")
                     .astype(np.int64) // 1000)
        c = g[g["event_type"] == "click"][["user_id", "ts_ms",
                                           "event_id"]]
        p = g[g["event_type"] == "purchase"][["user_id", "ts_ms",
                                              "event_id"]]
        if c.empty or p.empty:
            return empty
        j = p.merge(c, on="user_id", suffixes=("_p", "_c"))
        in_win = (j["ts_ms_c"] > j["ts_ms_p"] - FIRST_CLICK_WINDOW_MS) \
            & ((j["ts_ms_c"] < j["ts_ms_p"])
               | ((j["ts_ms_c"] == j["ts_ms_p"])
                  & (j["event_id_c"] < j["event_id_p"])))
        j = j[in_win]
        if j.empty:
            return empty
        j = j.sort_values(["event_id_p", "ts_ms_c", "event_id_c"]) \
            .drop_duplicates("event_id_p", keep="first")
        return pd.DataFrame({
            "purchase_id": j["event_id_p"].astype("int64"),
            "user_id": j["user_id"].astype("int64"),
            "click_id": j["event_id_c"].astype("int64"),
            "lag_ms": (j["ts_ms_p"] - j["ts_ms_c"]).astype("int64")})

    return _coarse_partition_map(
        ds.map_batches(keep, batch_format="pyarrow", batch_size=None),
        "user_id", match).sort("purchase_id")


FIRST_CLICK_SQL = f"""
WITH c AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'click'),
     p AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase'),
     pairs AS (
       SELECT p.event_id AS purchase_id, p.user_id,
              c.event_id AS click_id,
              CAST(date_diff('millisecond', c.ts, p.ts) AS BIGINT)
                  AS lag_ms,
              ROW_NUMBER() OVER (PARTITION BY p.event_id
                                 ORDER BY c.ts ASC, c.event_id ASC)
                  AS rn
       FROM p JOIN c ON p.user_id = c.user_id
        AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
        AND date_diff('millisecond', c.ts, p.ts)
            < {FIRST_CLICK_WINDOW_MS})
SELECT purchase_id, user_id, click_id, lag_ms FROM pairs WHERE rn = 1
ORDER BY purchase_id
"""


# ---------------------------------------------------------------------------
# U-shaped (position-based) multi-touch attribution
# ---------------------------------------------------------------------------

USHAPE_FIRST_BP = 4000       # basis points to the first touch
USHAPE_MID_BP = 2000         # pool the middle touches floor-divide


def events_attribution_ushape(sf_dir: str):
    """U-shaped (position-based) multi-touch attribution: each user's
    FIRST purchase distributes 10000 basis points over every earlier
    event (any non-purchase type, strictly before in (ts, event_id)
    log order) — 40% to the first touch, 40% to the last, the middle
    {USHAPE_MID_BP}bp pool floor-split evenly; a single touch takes
    all 10000, exactly two split 5000/5000. Credit stays integer end
    to end, summed per touch TYPE. One user-keyed exchange carries
    both roles; per-user credit assignment is a vectorized position
    rule, and partials pre-reduce per partition so the final exchange
    is type-cardinality-bounded. Output: (event_type, n_touches,
    credit_x10k)."""
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "n_touches": pd.Series(dtype="int64"),
                          "credit_x10k": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def credit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(ts_us=g["ts"].astype("datetime64[us]")
                     .astype(np.int64))
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          ignore_index=True)
        is_p = (g["event_type"] == "purchase").to_numpy()
        uid = g["user_id"].to_numpy(np.int64)
        # first purchase per user: first True inside each user run
        pidx = np.flatnonzero(is_p)
        if len(pidx) == 0:
            return empty
        first_p = pidx[np.unique(uid[pidx], return_index=True)[1]]
        # touches = rows of the same user BEFORE its first purchase
        fp_map = dict(zip(uid[first_p].tolist(), first_p.tolist()))
        fp_row = np.array([fp_map.get(u, -1) for u in uid.tolist()],
                          dtype=np.int64)
        touch = (~is_p) & (fp_row >= 0) \
            & (np.arange(len(g)) < fp_row)
        if not touch.any():
            return empty
        t = g.loc[touch, ["user_id", "event_type"]].copy()
        tu = t["user_id"].to_numpy(np.int64)
        tstarts = np.unique(tu, return_index=True)[1]
        counts = np.diff(np.append(tstarts, len(t)))
        n = np.repeat(counts, counts)
        rn = np.arange(len(t)) - np.repeat(tstarts, counts) + 1
        cr = np.where(
            n == 1, 10000,
            np.where(n == 2, 5000,
                     np.where((rn == 1) | (rn == n), USHAPE_FIRST_BP,
                              USHAPE_MID_BP // np.maximum(n - 2, 1))))
        t["credit"] = cr.astype(np.int64)
        out = t.groupby("event_type", as_index=False) \
            .agg(n_touches=("credit", "size"),
                 credit_x10k=("credit", "sum"))
        out["n_touches"] = out["n_touches"].astype("int64")
        out["credit_x10k"] = out["credit_x10k"].astype("int64")
        return out

    parts = _coarse_partition_map(ds, "user_id", credit).to_pandas()
    if parts.empty:
        return empty
    return parts.groupby("event_type", as_index=False) \
        .agg(n_touches=("n_touches", "sum"),
             credit_x10k=("credit_x10k", "sum")) \
        .astype({"n_touches": "int64", "credit_x10k": "int64"}) \
        .sort_values("event_type").reset_index(drop=True)


USHAPE_SQL = f"""
WITH p AS (
  SELECT user_id, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'),
fp AS (SELECT user_id, ts, event_id FROM p WHERE rn = 1),
t AS (
  SELECT e.user_id, e.event_type,
         ROW_NUMBER() OVER (PARTITION BY e.user_id
                            ORDER BY e.ts, e.event_id) AS rn,
         COUNT(*) OVER (PARTITION BY e.user_id) AS n
  FROM events e JOIN fp ON e.user_id = fp.user_id
  WHERE e.event_type <> 'purchase'
    AND (e.ts < fp.ts OR (e.ts = fp.ts AND e.event_id < fp.event_id))),
c AS (
  SELECT event_type,
         CASE WHEN n = 1 THEN 10000
              WHEN n = 2 THEN 5000
              WHEN rn = 1 OR rn = n THEN {USHAPE_FIRST_BP}
              ELSE {USHAPE_MID_BP} // (n - 2) END AS credit
  FROM t)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(credit) AS BIGINT) AS credit_x10k
FROM c GROUP BY event_type ORDER BY event_type
"""


def orders_cohort_ltv(sf_dir: str):
    """Cohort lifetime-value triangle: customers grouped by FIRST-order
    month (the cohort), revenue and active-customer counts laid out by
    months-since-first-order (the age) — the LTV matrix growth teams
    read down the diagonal. ONE custkey-keyed exchange resolves each
    customer's cohort AND its per-age partials together (no join back);
    the second exchange is (cohort, age)-shaped, calendar-bounded.
    Output: (cohort_mi, age_months, n_customers, revenue_x100)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("cohort_mi", "age_months", "n_customers",
                           "revenue_x100")})
    if _table_empty(sf_dir, "orders"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        d = g["o_orderdate"].to_numpy().astype("datetime64[M]")
        mi = d.astype(np.int64) + 1970 * 12 + 1    # year*12 + month
        cents = _cents(pa.array(g["o_totalprice"].to_numpy())) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"cust": g["o_custkey"].to_numpy(np.int64),
                           "mi": mi, "cents": cents})
        cohort = df.groupby("cust")["mi"].transform("min")
        df["cohort_mi"] = cohort
        df["age_months"] = df["mi"] - cohort
        out = df.groupby(["cohort_mi", "age_months"]).agg(
            n_customers=("cust", "nunique"),
            revenue_x100=("cents", "sum")).reset_index()
        return out.astype("int64")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["cohort_mi", "age_months"], as_index=False) \
            .agg(n_customers=("n_customers", "sum"),
                 revenue_x100=("revenue_x100", "sum")).astype("int64")

    parts = _coarse_partition_map(ds, "o_custkey", per_user)
    out = _coarse_partition_map(parts, "cohort_mi", fold).to_pandas()
    if out.empty:
        return empty
    return out.sort_values(["cohort_mi", "age_months"]) \
        .reset_index(drop=True)[["cohort_mi", "age_months",
                                 "n_customers", "revenue_x100"]]


COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         (year(o_orderdate) * 12 + month(o_orderdate)) AS mi,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders),
c AS (SELECT o_custkey, MIN(mi) AS cohort_mi FROM o GROUP BY 1)
SELECT CAST(c.cohort_mi AS BIGINT) AS cohort_mi,
       CAST(o.mi - c.cohort_mi AS BIGINT) AS age_months,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
       CAST(SUM(o.cents) AS BIGINT) AS revenue_x100
FROM o JOIN c USING (o_custkey)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_dow_hour_heatmap(sf_dir: str):
    """Activity heatmap: event counts by (day-of-week, hour-of-day) —
    the 7x24 usage grid. Per-batch bincount over the fused dow*24+hour
    key, one 168-key exchange. Output: (dow, hour, n) with dow 0 =
    Sunday (DuckDB dayofweek convention)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("dow", "hour", "n")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        days = ts.astype("datetime64[D]").astype(np.int64)
        hours = ts.astype("datetime64[h]").astype(np.int64) - days * 24
        dow = (days + 4) % 7               # 1970-01-01 = Thursday
        cnt = np.bincount(dow * 24 + hours, minlength=168)
        nz = np.flatnonzero(cnt)
        return pa.Table.from_pydict(
            {"cell": nz.astype(np.int64),
             "n": cnt[nz].astype(np.int64)})

    g = (rd.read_parquet(_pq(sf_dir, "events"), columns=["ts"])
         .map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby("cell").aggregate(Sum("n", alias_name="n"))
         .to_pandas())
    if g.empty:
        return empty
    cell = g["cell"].to_numpy(np.int64)
    return pd.DataFrame({"dow": cell // 24, "hour": cell % 24,
                         "n": g["n"].to_numpy(np.int64)}) \
        .sort_values(["dow", "hour"]).reset_index(drop=True)


DOW_HEATMAP_SQL = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2 ORDER BY dow, hour
"""


PART_TOP_N = 3


def part_brand_top3(sf_dir: str):
    """Top-{PART_TOP_N} parts per brand by retail price with
    DENSE_RANK tie semantics (equal prices share a rank and do not
    consume ranks below). One brand-keyed exchange; per-group the
    dense rank is a searchsorted against the group's distinct
    descending prices. Output: (p_brand, p_partkey, price_x100,
    price_rank)."""
    empty = pd.DataFrame({"p_brand": pd.Series(dtype="object"),
                          "p_partkey": pd.Series(dtype="int64"),
                          "price_x100": pd.Series(dtype="int64"),
                          "price_rank": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "part"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_brand",
                                  "p_retailprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch["p_brand"], batch["p_partkey"],
             _cents(batch["p_retailprice"])],
            names=["p_brand", "p_partkey", "price_x100"])

    def topn(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for brand, sub in g.groupby("p_brand"):
            prices = sub["price_x100"].to_numpy(np.int64)
            distinct = np.unique(prices)[::-1]       # descending
            rank = np.searchsorted(-distinct, -prices) + 1
            keep = rank <= PART_TOP_N
            o = sub.loc[keep].copy()
            o["price_rank"] = rank[keep]
            out.append(o)
        if not out:
            return empty
        return pd.concat(out)[["p_brand", "p_partkey", "price_x100",
                               "price_rank"]] \
            .astype({"p_partkey": "int64", "price_x100": "int64",
                     "price_rank": "int64"})

    return _coarse_str_partition_map(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "p_brand", topn).sort(["p_brand", "price_rank", "p_partkey"])


PART_TOP3_SQL = f"""
SELECT p_brand, CAST(p_partkey AS BIGINT) AS p_partkey,
       CAST(round(p_retailprice * 100.0) AS BIGINT) AS price_x100,
       CAST(price_rank AS BIGINT) AS price_rank
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         DENSE_RANK() OVER (PARTITION BY p_brand
                            ORDER BY round(p_retailprice * 100.0)
                                DESC) AS price_rank
  FROM part)
WHERE price_rank <= {PART_TOP_N}
ORDER BY p_brand, price_rank, p_partkey
"""


def orders_ship_leadtime_hist(sf_dir: str):
    """Fulfilment lead-time distribution: days from order date to each
    line's ship date, bucketed into weeks, counted per order priority —
    the ops-health histogram behind 'are urgent orders shipping
    faster'. Both tables co-partition on the orderkey through one
    side-tagged exchange (orders is NOT broadcastable at scale);
    per-partition merge emits (priority, week) count partials and the
    final exchange is priority x week shaped.
    Output: (o_orderpriority, week_bucket, n_lines)."""
    empty = pd.DataFrame({"o_orderpriority": pd.Series(dtype="object"),
                          "week_bucket": pd.Series(dtype="int64"),
                          "n_lines": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "orders") or _table_empty(sf_dir, "lineitem"):
        return empty

    def tag_orders(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.Table.from_pydict({
            "key": batch["o_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "side": np.ones(len(batch), dtype=np.int8),
            "day": d,
            "prio": batch["o_orderpriority"].to_pandas().to_numpy()})

    def tag_lines(batch: pa.Table) -> pa.Table:
        d = batch["l_shipdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        n = len(batch)
        return pa.Table.from_pydict({
            "key": batch["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "side": np.zeros(n, dtype=np.int8),
            "day": d,
            "prio": np.array([""] * n, dtype=object)})

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        o = part[part["side"] == 1]
        li = part[part["side"] == 0]
        if o.empty or li.empty:
            return pd.DataFrame({
                "o_orderpriority": pd.Series(dtype="object"),
                "week_bucket": pd.Series(dtype="int64"),
                "n_lines": pd.Series(dtype="int64")})
        j = li[["key", "day"]].rename(columns={"day": "day_ship"}) \
            .merge(o[["key", "day", "prio"]]
                   .rename(columns={"day": "day_ord"}), on="key")
        j["week_bucket"] = (j["day_ship"] - j["day_ord"]) // 7
        g = j.groupby(["prio", "week_bucket"], as_index=False).size() \
            .rename(columns={"prio": "o_orderpriority",
                             "size": "n_lines"})
        return g.astype({"week_bucket": "int64", "n_lines": "int64"})

    oside = rd.read_parquet(_pq(sf_dir, "orders"),
                            columns=["o_orderkey", "o_orderdate",
                                     "o_orderpriority"]) \
        .map_batches(tag_orders, batch_format="pyarrow", batch_size=None)
    lside = rd.read_parquet(_pq(sf_dir, "lineitem"),
                            columns=["l_orderkey", "l_shipdate"]) \
        .map_batches(tag_lines, batch_format="pyarrow", batch_size=None)
    parts = _coarse_grouped_map_union(lside, oside, merge,
                                      key="key").to_pandas()
    if parts.empty:
        return empty
    return parts.groupby(["o_orderpriority", "week_bucket"],
                         as_index=False)["n_lines"].sum() \
        .astype({"week_bucket": "int64", "n_lines": "int64"}) \
        .sort_values(["o_orderpriority", "week_bucket"]) \
        .reset_index(drop=True)


LEADTIME_SQL = """
SELECT o.o_orderpriority,
       -- floor division (Python semantics): integer // in DuckDB
       -- truncates toward zero, which disagrees on negative lead times
       CAST(floor(CAST(CAST(l.l_shipdate AS DATE)
                       - CAST(o.o_orderdate AS DATE) AS DOUBLE) / 7.0)
            AS BIGINT) AS week_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2 ORDER BY o_orderpriority, week_bucket
"""


def events_type_user_lift(sf_dir: str):
    """User-level co-occurrence LIFT between event types: for each
    unordered type pair, how much more often a single user's history
    contains BOTH types than independence predicts — lift =
    n_both * n_users / (n_a * n_b), the cross-sell / feature-affinity
    score. One user-keyed exchange: each partition reduces its
    (disjoint) users to per-pair / per-type / user-count partial rows
    (type cardinality is tiny, so a user contributes <= C(T,2)+T), and
    the driver folds the pair-shaped partials. Lift is one exact
    integer cross-division (big ints; HUGEINT in the oracle).
    Output: (type_a, type_b, n_both, n_a, n_b, lift_x1e6)."""
    cols = ("type_a", "type_b", "n_both", "n_a", "n_b", "lift_x1e6")
    empty = pd.DataFrame({c: pd.Series(
        dtype="object" if c.startswith("type") else "int64")
        for c in cols})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        import itertools
        u = g.drop_duplicates(["user_id", "event_type"])
        singles = u.groupby("event_type").size()
        pair_count: dict[tuple, int] = {}
        for _, types in u.groupby("user_id")["event_type"]:
            for a, b in itertools.combinations(sorted(types), 2):
                pair_count[(a, b)] = pair_count.get((a, b), 0) + 1
        rows = [(a, b, n) for (a, b), n in pair_count.items()]
        rows += [(t, "", int(n)) for t, n in singles.items()]
        rows.append(("\x00users", "", int(u["user_id"].nunique())))
        return pd.DataFrame(rows, columns=["type_a", "type_b", "n"]) \
            .astype({"n": "int64"})

    parts = _coarse_partition_map(ds, "user_id", per_user).to_pandas()
    if parts.empty:
        return empty
    agg = parts.groupby(["type_a", "type_b"])["n"].sum()
    n_users = int(agg.get(("\x00users", ""), 0))
    if n_users == 0:
        return empty
    rows = []
    for (a, b), n_both in agg.items():
        if b == "":
            continue
        n_a = int(agg.get((a, "")))
        n_b = int(agg.get((b, "")))
        rows.append((a, b, int(n_both), n_a, n_b,
                     int(n_both) * n_users * 1_000_000 // (n_a * n_b)))
    return pd.DataFrame(rows, columns=list(cols)) \
        .sort_values(["type_a", "type_b"]).reset_index(drop=True)


TYPE_LIFT_SQL = """
WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       FROM events),
s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM u GROUP BY 1),
p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM u a JOIN u b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT p.type_a, p.type_b, p.n_both, sa.n AS n_a, sb.n AS n_b,
       CAST(CAST(p.n_both AS HUGEINT) * nu.n_users * 1000000
            // (sa.n * sb.n) AS BIGINT) AS lift_x1e6
FROM p
JOIN s sa ON sa.event_type = p.type_a
JOIN s sb ON sb.event_type = p.type_b, nu
ORDER BY type_a, type_b
"""


def orders_fanout_hist(sf_dir: str):
    """Join fan-out profile: the distribution of lineitem multiplicity
    per order — the statistic a planner needs to size a key join's
    output (join_size = sum over this histogram of key_count * fanout).
    One orderkey exchange compacts to per-order counts, the second is
    fanout-value-shaped. Output: (fanout, n_orders)."""
    empty = pd.DataFrame({"fanout": pd.Series(dtype="int64"),
                          "n_orders": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey"])

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("l_orderkey").size()
        h = c.groupby(c).size().rename("n_orders").reset_index() \
            .rename(columns={"index": "fanout"})
        h.columns = ["fanout", "n_orders"]
        return h.astype("int64")

    parts = _coarse_partition_map(ds, "l_orderkey", per_order) \
        .to_pandas()
    if parts.empty:
        return empty
    return parts.groupby("fanout", as_index=False)["n_orders"].sum() \
        .astype("int64").sort_values("fanout").reset_index(drop=True)


FANOUT_SQL = """
WITH c AS (SELECT l_orderkey, COUNT(*) AS fanout
           FROM lineitem GROUP BY 1)
SELECT CAST(fanout AS BIGINT) AS fanout,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM c GROUP BY fanout ORDER BY fanout
"""


BOT_WINDOW_US = 60_000_000     # 1-minute burst window
BOT_THRESHOLD = 20             # > this many events/minute flags a bot


def events_bot_detection(sf_dir: str):
    """Burst-rate bot flagging: per user, the MAXIMUM number of events
    inside any sliding {BOT_WINDOW_US // 1_000_000}-second window
    (windows anchored at an event — sufficient, since the max window
    starts at some event), flagged when it exceeds {BOT_THRESHOLD} —
    the super-human-rate abuse gate an ingestion edge runs. One
    user-keyed exchange; per user the sliding count is an O(n)
    TWO-POINTER sweep over its sorted timestamps (the oracle states
    the same thing as a quadratic windowed self-count).
    Output: (user_id, n_events, max_per_minute, is_bot)."""
    cols = ("user_id", "n_events", "max_per_minute", "is_bot")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(t=g["ts"].astype("datetime64[us]")
                     .astype(np.int64))
        g = g.sort_values(["user_id", "t"])
        rows = []
        for uid, sub in g.groupby("user_id", sort=False):
            t = sub["t"].to_numpy(np.int64)
            # two-pointer: for each window start i, count events in
            # [t_i, t_i + W); vectorized via searchsorted
            hi = np.searchsorted(t, t + BOT_WINDOW_US, side="left")
            mx = int((hi - np.arange(len(t))).max())
            rows.append((int(uid), len(t), mx,
                         int(mx > BOT_THRESHOLD)))
        return pd.DataFrame(rows, columns=list(cols)).astype("int64")

    return _coarse_partition_map(ds, "user_id", per_user) \
        .sort("user_id")


BOT_SQL = f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
w AS (
  SELECT a.user_id, a.event_id,
         COUNT(*) AS in_window
  FROM e a JOIN e b
    ON a.user_id = b.user_id
   AND b.t >= a.t AND b.t < a.t + {BOT_WINDOW_US}
  GROUP BY a.user_id, a.event_id)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(in_window) AS BIGINT) AS max_per_minute,
       CAST(CASE WHEN MAX(in_window) > {BOT_THRESHOLD}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_bot
FROM w GROUP BY user_id ORDER BY user_id
"""


DUP_BAND_X100 = 10_000       # $100 amount band


def orders_duplicate_billing(sf_dir: str):
    """Duplicate-billing audit: a customer charged MORE THAN ONCE in
    the same ${DUP_BAND_X100 // 100} amount band — the double-charge
    candidate list a billing-forensics pass reviews first (exact-cents
    equality never fires on continuous totals; banding is the
    practical rule). One custkey-keyed exchange (the band check rides
    the same partition); emits the group size and the smallest two
    orderkeys as evidence columns. Output: (o_custkey, price_band,
    n_orders, first_order, second_order)."""
    cols = ("o_custkey", "price_band", "n_orders", "first_order",
            "second_order")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _table_empty(sf_dir, "orders"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderkey", "o_custkey",
                                  "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        band = pc.divide(_cents(batch["o_totalprice"]),
                         pa.scalar(DUP_BAND_X100, type=pa.int64()))
        return pa.Table.from_arrays(
            [batch["o_custkey"], band, batch["o_orderkey"]],
            names=["cust", "band", "okey"])

    def dupes(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cust", "band", "okey"])
        grp = g.groupby(["cust", "band"])
        agg = grp.agg(n_orders=("okey", "size"),
                      first_order=("okey", lambda s: s.iloc[0]),
                      second_order=("okey", lambda s: s.iloc[1]
                                    if len(s) > 1 else -1)) \
            .reset_index()
        agg = agg[agg["n_orders"] >= 2]
        out = agg.rename(columns={"cust": "o_custkey",
                                  "band": "price_band"}) \
            .astype("int64")
        if out.empty:                  # keep the schema on empty parts
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in cols})
        return out[list(cols)]

    out = _coarse_partition_map(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "cust", dupes).to_pandas()
    if out.empty or "o_custkey" not in out.columns:
        return empty                  # all-empty partitions lose schema
    return out.sort_values(["o_custkey", "price_band"]) \
        .reset_index(drop=True)


DUP_BILLING_SQL = f"""
WITH c AS (
  SELECT o_custkey,
         CAST(round(o_totalprice * 100.0) AS BIGINT)
             // {DUP_BAND_X100} AS price_band,
         o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey,
             CAST(round(o_totalprice * 100.0) AS BIGINT)
                 // {DUP_BAND_X100}
                            ORDER BY o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey,
             CAST(round(o_totalprice * 100.0) AS BIGINT)
                 // {DUP_BAND_X100}) AS n
  FROM orders)
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(price_band AS BIGINT) AS price_band,
       CAST(n AS BIGINT) AS n_orders,
       CAST(MAX(CASE WHEN rn = 1 THEN o_orderkey END) AS BIGINT)
           AS first_order,
       CAST(MAX(CASE WHEN rn = 2 THEN o_orderkey END) AS BIGINT)
           AS second_order
FROM c WHERE n >= 2
GROUP BY o_custkey, price_band, n
ORDER BY o_custkey, price_band
"""


def events_growth_accounting(sf_dir: str):
    """Weekly GROWTH ACCOUNTING (the new / retained / resurrected /
    churned user ledger a growth team reads): per epoch-week, users
    seen for the first time (new), seen this week and last (retained),
    seen this week after a gap (resurrected), and seen last week but
    not this (churned, bounded by the global last week). One cheap
    global week-range probe, then ONE user-keyed exchange classifies
    each user's whole week set vectorized; the final exchange is
    (week, class)-shaped. Output: (wk, cls, n_users)."""
    empty = pd.DataFrame({"wk": pd.Series(dtype="int64"),
                          "cls": pd.Series(dtype="object"),
                          "n_users": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts"])

    def wk_minmax(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        wk = ts.astype("datetime64[D]").astype(np.int64) // 7
        return pa.Table.from_pydict({"lo": [int(wk.min())],
                                     "hi": [int(wk.max())]})

    mm = ds.map_batches(wk_minmax, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    if mm.empty:
        return empty
    w1 = int(mm["hi"].max())

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        days = g["ts"].astype("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        g = pd.DataFrame({"user_id": g["user_id"].to_numpy(np.int64),
                          "wk": (days // 7).to_numpy(np.int64)}) \
            .drop_duplicates()
        rows = []
        for uid, sub in g.groupby("user_id", sort=False):
            wks = np.sort(sub["wk"].to_numpy(np.int64))
            present = set(wks.tolist())
            rows.append((int(wks[0]), "new"))
            for w in wks[1:].tolist():
                rows.append((w, "retained" if (w - 1) in present
                             else "resurrected"))
            for w in wks.tolist():
                if w + 1 <= w1 and (w + 1) not in present:
                    rows.append((w + 1, "churned"))
        out = pd.DataFrame(rows, columns=["wk", "cls"])
        return out.groupby(["wk", "cls"], as_index=False).size() \
            .rename(columns={"size": "n_users"}) \
            .astype({"wk": "int64", "n_users": "int64"})

    parts = _coarse_partition_map(ds, "user_id", classify).to_pandas()
    if parts.empty:
        return empty
    return parts.groupby(["wk", "cls"], as_index=False)["n_users"] \
        .sum().astype({"wk": "int64", "n_users": "int64"}) \
        .sort_values(["wk", "cls"]).reset_index(drop=True)


GROWTH_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 604800000000 AS wk
  FROM events),
b AS (SELECT MAX(wk) AS w1 FROM uw),
f AS (SELECT user_id, MIN(wk) AS first_wk FROM uw GROUP BY 1),
cls AS (
  SELECT u.wk,
         CASE WHEN u.wk = f.first_wk THEN 'new'
              WHEN EXISTS (SELECT 1 FROM uw p
                           WHERE p.user_id = u.user_id
                             AND p.wk = u.wk - 1) THEN 'retained'
              ELSE 'resurrected' END AS cls
  FROM uw u JOIN f USING (user_id)),
churn AS (
  SELECT u.wk + 1 AS wk, 'churned' AS cls
  FROM uw u, b
  WHERE u.wk + 1 <= b.w1
    AND NOT EXISTS (SELECT 1 FROM uw n
                    WHERE n.user_id = u.user_id
                      AND n.wk = u.wk + 1))
SELECT wk, cls, CAST(COUNT(*) AS BIGINT) AS n_users
FROM (SELECT wk, cls FROM cls UNION ALL SELECT wk, cls FROM churn)
GROUP BY wk, cls ORDER BY wk, cls
"""


def events_type_weekly_movers(sf_dir: str):
    """Week-over-week movers per event type: weekly counts with the
    delta to the PREVIOUS CALENDAR week (gap weeks count as zero — a
    type that vanishes shows the crash, not a missing row) — the
    'what changed this week' report. One (type, week) exchange;
    densification is calendar-bounded per type.
    Output: (event_type, wk, n, prev_n, delta)."""
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "wk": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64"),
                          "prev_n": pd.Series(dtype="int64"),
                          "delta": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        wk = ts.astype("datetime64[D]").astype(np.int64) // 7
        g = pd.DataFrame({"event_type": batch["event_type"]
                          .to_pandas(), "wk": wk}) \
            .groupby(["event_type", "wk"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return _from_pandas(g.astype({"wk": "int64", "n": "int64"}))

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby(["event_type", "wk"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    if hist.empty:
        return empty
    w0, w1 = int(hist["wk"].min()), int(hist["wk"].max())
    rows = []
    for et, sub in hist.groupby("event_type"):
        dense = np.zeros(w1 - w0 + 1, dtype=np.int64)
        dense[sub["wk"].to_numpy(np.int64) - w0] = \
            sub["n"].to_numpy(np.int64)
        for i in range(1, len(dense)):
            rows.append((et, w0 + i, int(dense[i]), int(dense[i - 1]),
                         int(dense[i] - dense[i - 1])))
    return pd.DataFrame(rows, columns=["event_type", "wk", "n",
                                       "prev_n", "delta"]) \
        .sort_values(["event_type", "wk"]).reset_index(drop=True)


WEEKLY_MOVERS_SQL = """
WITH h AS (
  SELECT event_type, epoch_us(ts) // 604800000000 AS wk,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2),
b AS (SELECT MIN(wk) AS w0, MAX(wk) AS w1 FROM h),
grid AS (
  SELECT t.event_type, g.wk
  FROM (SELECT DISTINCT event_type FROM h) t,
       (SELECT unnest(generate_series(w0, w1)) AS wk FROM b) g),
dense AS (
  SELECT grid.event_type, grid.wk, COALESCE(h.n, 0) AS n
  FROM grid LEFT JOIN h USING (event_type, wk)),
w AS (
  SELECT event_type, wk, n,
         LAG(n) OVER (PARTITION BY event_type ORDER BY wk) AS prev_n
  FROM dense)
SELECT event_type, wk, CAST(n AS BIGINT) AS n,
       CAST(prev_n AS BIGINT) AS prev_n,
       CAST(n - prev_n AS BIGINT) AS delta
FROM w WHERE prev_n IS NOT NULL
ORDER BY event_type, wk
"""


def customer_tier_transitions(sf_dir: str):
    """Customer value-tier TRANSITION MATRIX between the early and
    late halves of the order history (same midpoint split as the drift
    monitors): per half, customers tier 1/2/3 by tie-inclusive
    discrete revenue-tercile cutoffs (a pure function of the revenue
    VALUE, so it computes from the compacted per-revenue histogram —
    no global customer sort); tier 0 = absent that half. The matrix is
    the upgrade/downgrade/churn movement report. One custkey exchange
    pivots both halves per customer; cutoffs broadcast; the final
    exchange is 4x4-shaped. Output: (tier_from, tier_to,
    n_customers)."""
    import ray as _ray
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("tier_from", "tier_to", "n_customers")})
    if _table_empty(sf_dir, "orders"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def day_minmax(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.Table.from_pydict({"lo": [int(d.min())],
                                     "hi": [int(d.max())]})

    mm = ds.map_batches(day_minmax, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    mid = lo + (hi - lo) // 2

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        d = g["o_orderdate"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        cents = _cents(pa.array(g["o_totalprice"].to_numpy())) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"cust": g["o_custkey"].to_numpy(np.int64),
                           "half": (d > mid).astype(np.int64),
                           "rev": cents})
        p = df.groupby(["cust", "half"])["rev"].sum().unstack(
            fill_value=-1).reindex(columns=[0, 1], fill_value=-1)
        p.columns = ["rev0", "rev1"]
        return p.reset_index().astype("int64")

    cust = _coarse_partition_map(ds, "o_custkey", per_cust) \
        .materialize()

    def rev_hist(batch: pa.Table) -> pa.Table:
        frames = []
        for half, col in ((0, "rev0"), (1, "rev1")):
            v = batch[col].to_numpy(zero_copy_only=False)
            v = v[v >= 0]
            u, c = np.unique(v, return_counts=True)
            frames.append(pd.DataFrame({
                "half": np.full(len(u), half, dtype=np.int64),
                "rev": u.astype(np.int64),
                "n": c.astype(np.int64)}))
        return _from_pandas(pd.concat(frames, ignore_index=True))

    hist = (cust.map_batches(rev_hist, batch_format="pyarrow",
                             batch_size=None).to_pandas()
            .groupby(["half", "rev"], as_index=False)["n"].sum())
    if hist.empty:
        return empty
    cuts = {}
    for half, sub in hist.groupby("half"):
        sub = sub.sort_values("rev")
        cc = sub["n"].to_numpy(np.int64).cumsum()
        n = int(cc[-1])
        vals = sub["rev"].to_numpy(np.int64)
        q33 = int(vals[np.searchsorted(
            cc, int(np.ceil(1.0 / 3 * n)))])
        q66 = int(vals[np.searchsorted(
            cc, int(np.ceil(2.0 / 3 * n)))])
        cuts[int(half)] = (q33, q66)
    cuts_ref = _ray.put(cuts)

    def to_tiers(batch: pa.Table) -> pa.Table:
        c = _ray.get(cuts_ref)
        out = {}
        for half, col in ((0, "rev0"), (1, "rev1")):
            v = batch[col].to_numpy(zero_copy_only=False)
            q33, q66 = c.get(half, (0, 0))
            tier = np.where(v < 0, 0,
                            1 + (v > q33).astype(np.int64)
                            + (v > q66).astype(np.int64))
            out[f"t{half}"] = tier.astype(np.int64)
        g = pd.DataFrame(out).groupby(["t0", "t1"], as_index=False) \
            .size().rename(columns={"size": "n"})
        return _from_pandas(g.astype("int64"))

    parts = (cust.map_batches(to_tiers, batch_format="pyarrow",
                              batch_size=None).to_pandas())
    return parts.groupby(["t0", "t1"], as_index=False)["n"].sum() \
        .rename(columns={"t0": "tier_from", "t1": "tier_to",
                         "n": "n_customers"}) \
        .astype("int64").sort_values(["tier_from", "tier_to"]) \
        .reset_index(drop=True)


TIER_TRANSITIONS_SQL = """
WITH b AS (
  SELECT MIN(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
             AS BIGINT)) AS lo,
         MAX(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
             AS BIGINT)) AS hi
  FROM orders),
o AS (
  SELECT o_custkey,
         CASE WHEN CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                   AS BIGINT) > lo + (hi - lo) // 2
              THEN 1 ELSE 0 END AS half,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders, b),
c AS (SELECT o_custkey, half, SUM(cents) AS rev
      FROM o GROUP BY 1, 2),
q AS (SELECT half, quantile_disc(rev, 1.0/3) AS q33,
             quantile_disc(rev, 2.0/3) AS q66
      FROM c GROUP BY half),
t AS (
  SELECT c.o_custkey, c.half,
         1 + CAST(c.rev > q.q33 AS INT) + CAST(c.rev > q.q66 AS INT)
             AS tier
  FROM c JOIN q USING (half)),
f AS (
  SELECT o_custkey,
         COALESCE(MAX(CASE WHEN half = 0 THEN tier END), 0) AS t0,
         COALESCE(MAX(CASE WHEN half = 1 THEN tier END), 0) AS t1
  FROM t GROUP BY 1)
SELECT CAST(t0 AS BIGINT) AS tier_from, CAST(t1 AS BIGINT) AS tier_to,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM f GROUP BY 1, 2 ORDER BY tier_from, tier_to
"""


INCIDENT_MIN_ERRORS = 2      # errors/minute that flag a minute


def events_error_incidents(sf_dir: str):
    """Incident detection: minutes with >= {INCIDENT_MIN_ERRORS}
    errors are 'burning', and CONSECUTIVE burning minutes merge into
    one incident (gaps-and-islands over the flagged minute set) with
    its span and total error count — the error-cascade grouping an
    on-call pages on. One bounded (minute -> errors) exchange; the
    island grouping is a vectorized diff over the flagged minutes.
    Output: (incident_start_min, incident_end_min, duration_min,
    n_errors)."""
    cols = ("incident_start_min", "incident_end_min", "duration_min",
            "n_errors")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        m = et == "error"
        if not m.any():
            return pa.Table.from_pydict(
                {"minute": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())})
        mins = ts[m].astype("datetime64[m]").astype(np.int64)
        g = pd.DataFrame({"minute": mins}) \
            .groupby("minute", as_index=False).size() \
            .rename(columns={"size": "n"})
        return _from_pandas(g.astype("int64"))

    hist = (rd.read_parquet(_pq(sf_dir, "events"),
                            columns=["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("minute").aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    if hist.empty:
        return empty
    hist = hist[hist["n"] >= INCIDENT_MIN_ERRORS].sort_values("minute")
    if hist.empty:
        return empty
    mins = hist["minute"].to_numpy(np.int64)
    n = hist["n"].to_numpy(np.int64)
    island = np.concatenate(([0], (np.diff(mins) > 1).cumsum()))
    df = pd.DataFrame({"island": island, "minute": mins, "n": n})
    out = df.groupby("island").agg(
        incident_start_min=("minute", "min"),
        incident_end_min=("minute", "max"),
        n_errors=("n", "sum")).reset_index(drop=True)
    out["duration_min"] = out["incident_end_min"] \
        - out["incident_start_min"] + 1
    return out[list(cols)].astype("int64") \
        .sort_values("incident_start_min").reset_index(drop=True)


INCIDENTS_SQL = f"""
WITH m AS (
  SELECT epoch_us(ts) // 60000000 AS minute, COUNT(*) AS n
  FROM events WHERE event_type = 'error'
  GROUP BY 1 HAVING COUNT(*) >= {INCIDENT_MIN_ERRORS}),
i AS (
  SELECT minute, n,
         minute - ROW_NUMBER() OVER (ORDER BY minute) AS island
  FROM m)
SELECT CAST(MIN(minute) AS BIGINT) AS incident_start_min,
       CAST(MAX(minute) AS BIGINT) AS incident_end_min,
       CAST(MAX(minute) - MIN(minute) + 1 AS BIGINT) AS duration_min,
       CAST(SUM(n) AS BIGINT) AS n_errors
FROM i GROUP BY island ORDER BY incident_start_min
"""


def orders_repeat_conversion(sf_dir: str):
    """First-to-second purchase conversion: how many customers ever
    came back, the repeat rate, and the exact DOUBLED median days
    between first and second order (med2 = the two middle order
    statistics summed — stays int64, house rule) — the retention
    number subscription teams watch. One custkey exchange emits
    per-partition counts plus a (gap-days -> n) histogram partial
    (calendar-bounded), so the driver folds histograms, never rows.
    Output: (n_customers, n_repeat, repeat_rate_x1e6, gap_days_med2)."""
    cols = ("n_customers", "n_repeat", "repeat_rate_x1e6",
            "gap_days_med2")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _table_empty(sf_dir, "orders"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate"])

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        d = g["o_orderdate"].to_numpy().astype("datetime64[D]") \
            .astype(np.int64)
        df = pd.DataFrame({"cust": g["o_custkey"].to_numpy(np.int64),
                           "day": d}).sort_values(["cust", "day"])
        sizes = df.groupby("cust").size()
        firsts = df.groupby("cust")["day"].min()
        df["rk"] = df.groupby("cust").cumcount()
        sec = df[df["rk"] == 1].set_index("cust")["day"]
        gaps = (sec - firsts.loc[sec.index]).to_numpy(np.int64)
        u, c = np.unique(gaps, return_counts=True)
        h = pd.DataFrame({"gap": u.astype(np.int64),
                          "n": c.astype(np.int64)})
        h["n_customers"] = 0
        h["n_repeat"] = 0
        meta = pd.DataFrame({"gap": [-1], "n": [0],
                             "n_customers": [int(len(sizes))],
                             "n_repeat": [int((sizes >= 2).sum())]})
        return pd.concat([h, meta], ignore_index=True).astype("int64")

    parts = _coarse_partition_map(ds, "o_custkey", per_cust).to_pandas()
    if parts.empty:
        return empty
    n_cust = int(parts["n_customers"].sum())
    n_rep = int(parts["n_repeat"].sum())
    if n_cust == 0 or n_rep == 0:
        return empty
    hist = parts[parts["gap"] >= 0].groupby("gap", as_index=False) \
        ["n"].sum().sort_values("gap")
    gaps = hist["gap"].to_numpy(np.int64)
    cc = hist["n"].to_numpy(np.int64).cumsum()
    k = int(cc[-1])
    lo = int(gaps[np.searchsorted(cc, (k + 1) // 2)])
    hi = int(gaps[np.searchsorted(cc, k // 2 + 1)])
    return pd.DataFrame({
        "n_customers": [np.int64(n_cust)],
        "n_repeat": [np.int64(n_rep)],
        "repeat_rate_x1e6": [np.int64(n_rep * 1_000_000 // n_cust)],
        "gap_days_med2": [np.int64(lo + hi)]})


REPEAT_CONV_SQL = """
WITH o AS (
  SELECT o_custkey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
             AS day,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders),
f AS (SELECT o_custkey, day FROM o WHERE rn = 1),
s AS (SELECT o_custkey, day FROM o WHERE rn = 2),
gaps AS (
  SELECT s.day - f.day AS gap
  FROM s JOIN f USING (o_custkey)),
sel AS (
  SELECT gap, ROW_NUMBER() OVER (ORDER BY gap) AS rn,
         COUNT(*) OVER () AS k
  FROM gaps),
med AS (
  SELECT CAST(SUM(CASE WHEN rn = (k + 1) // 2 THEN gap ELSE 0 END)
              + SUM(CASE WHEN rn = k // 2 + 1 THEN gap ELSE 0 END)
              AS BIGINT) AS med2
  FROM sel),
c AS (
  SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
  FROM orders),
r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_repeat FROM s)
SELECT c.n_customers, r.n_repeat,
       CAST(r.n_repeat * 1000000 // c.n_customers AS BIGINT)
           AS repeat_rate_x1e6,
       med.med2 AS gap_days_med2
FROM c, r, med
WHERE r.n_repeat > 0
"""


def orders_revenue_waterfall(sf_dir: str):
    """Monthly revenue waterfall: each month's cents split into NEW
    customer revenue (customers whose FIRST order month this is) vs
    RETURNING revenue, with the matching customer counts — the
    new-vs-existing decomposition under every growth chart. One
    custkey exchange resolves first months and per-month partials
    together; the fold is month-shaped.
    Output: (mi, new_rev_x100, ret_rev_x100, n_new, n_returning)."""
    cols = ("mi", "new_rev_x100", "ret_rev_x100", "n_new",
            "n_returning")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _table_empty(sf_dir, "orders"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        m = g["o_orderdate"].to_numpy().astype("datetime64[M]") \
            .astype(np.int64) + 1970 * 12 + 1
        cents = _cents(pa.array(g["o_totalprice"].to_numpy())) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"cust": g["o_custkey"].to_numpy(np.int64),
                           "mi": m, "cents": cents})
        first = df.groupby("cust")["mi"].transform("min")
        df["is_new"] = (df["mi"] == first).astype(np.int64)
        rev = df.groupby(["mi", "is_new"], as_index=False)["cents"] \
            .sum()
        ncust = df.drop_duplicates(["cust", "mi"]) \
            .groupby(["mi", "is_new"], as_index=False).size() \
            .rename(columns={"size": "nc"})
        out = rev.merge(ncust, on=["mi", "is_new"])
        return out.astype("int64")

    parts = _coarse_partition_map(ds, "o_custkey", per_cust).to_pandas()
    if parts.empty:
        return empty
    agg = parts.groupby(["mi", "is_new"], as_index=False) \
        [["cents", "nc"]].sum()
    piv_r = agg.pivot(index="mi", columns="is_new", values="cents") \
        .reindex(columns=[1, 0], fill_value=0).fillna(0)
    piv_n = agg.pivot(index="mi", columns="is_new", values="nc") \
        .reindex(columns=[1, 0], fill_value=0).fillna(0)
    return pd.DataFrame({
        "mi": piv_r.index.to_numpy(np.int64),
        "new_rev_x100": piv_r[1].to_numpy(np.int64),
        "ret_rev_x100": piv_r[0].to_numpy(np.int64),
        "n_new": piv_n[1].to_numpy(np.int64),
        "n_returning": piv_n[0].to_numpy(np.int64)}) \
        .sort_values("mi").reset_index(drop=True)


WATERFALL_SQL = """
WITH o AS (
  SELECT o_custkey,
         (year(o_orderdate) * 12 + month(o_orderdate)) AS mi,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders),
f AS (SELECT o_custkey, MIN(mi) AS first_mi FROM o GROUP BY 1),
t AS (
  SELECT o.mi, o.cents, o.o_custkey,
         CASE WHEN o.mi = f.first_mi THEN 1 ELSE 0 END AS is_new
  FROM o JOIN f USING (o_custkey))
SELECT CAST(mi AS BIGINT) AS mi,
       CAST(COALESCE(SUM(cents) FILTER (WHERE is_new = 1), 0)
            AS BIGINT) AS new_rev_x100,
       CAST(COALESCE(SUM(cents) FILTER (WHERE is_new = 0), 0)
            AS BIGINT) AS ret_rev_x100,
       CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE is_new = 1)
            AS BIGINT) AS n_new,
       CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE is_new = 0)
            AS BIGINT) AS n_returning
FROM t GROUP BY mi ORDER BY mi
"""


def events_anomalous_users_iqr(sf_dir: str):
    """Users whose event COUNT is an IQR outlier (count > Q3 +
    1.5*IQR, Tukey's fence on the discrete quartiles) — the
    heavy-account screen that complements the per-minute bot gate.
    Per-user counts come from one keyed exchange compacted to a
    (count -> n_users) histogram, so the fence computes from the
    value domain without sorting users; the integer fence comparison
    is cross-multiplied by 2 (1.5*IQR stays integral).
    Output: (user_id, n_events, q3, iqr_x2)."""
    cols = ("user_id", "n_events", "q3", "iqr_x2")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False).size() \
            .rename(columns={"size": "n_events"}).astype("int64")

    cnt = _coarse_partition_map(ds, "user_id", per_user).materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch["n_events"].to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        return pa.Table.from_pydict({"cnt": u.astype(np.int64),
                                     "n": c.astype(np.int64)})

    hist = (cnt.map_batches(hist_partial, batch_format="pyarrow",
                            batch_size=None).to_pandas()
            .groupby("cnt", as_index=False)["n"].sum()
            .sort_values("cnt"))
    if hist.empty:
        return empty
    vals = hist["cnt"].to_numpy(np.int64)
    cc = hist["n"].to_numpy(np.int64).cumsum()
    n = int(cc[-1])
    q1 = int(vals[np.searchsorted(cc, int(np.ceil(0.25 * n)))])
    q3 = int(vals[np.searchsorted(cc, int(np.ceil(0.75 * n)))])
    iqr2 = 2 * (q3 - q1)
    import ray as _ray
    fence_ref = _ray.put((q3, iqr2))

    def flag(batch: pa.Table) -> pa.Table:
        q3_, iqr2_ = _ray.get(fence_ref)
        v = batch["n_events"].to_numpy(zero_copy_only=False)
        # count > q3 + 1.5*iqr  <=>  2*count > 2*q3 + 3*(q3-q1)
        keep = 2 * v > 2 * q3_ + 3 * (iqr2_ // 2)
        sub = batch.filter(pa.array(keep))
        nrow = sub.num_rows
        return pa.Table.from_pydict({
            "user_id": sub["user_id"],
            "n_events": sub["n_events"],
            "q3": pa.array(np.full(nrow, q3_, dtype=np.int64)),
            "iqr_x2": pa.array(np.full(nrow, iqr2_, dtype=np.int64))})

    out = cnt.map_batches(flag, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if out.empty or "user_id" not in out.columns:
        return empty
    return out.sort_values("user_id").reset_index(drop=True)


ANOM_IQR_SQL = """
WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1),
q AS (SELECT quantile_disc(n_events, 0.25) AS q1,
             quantile_disc(n_events, 0.75) AS q3 FROM c)
SELECT CAST(c.user_id AS BIGINT) AS user_id, c.n_events,
       CAST(q.q3 AS BIGINT) AS q3,
       CAST(2 * (q.q3 - q.q1) AS BIGINT) AS iqr_x2
FROM c, q
WHERE 2 * c.n_events > 2 * q.q3 + 3 * (q.q3 - q.q1)
ORDER BY user_id
"""


ABC_BOUNDS = (70, 90)        # cumulative-share percent cut points


def customer_abc_classes(sf_dir: str):
    """ABC / Pareto classification: customers sorted by revenue
    (desc) fall into class A while the TIE-INCLUSIVE cumulative share
    is <= {ABC_BOUNDS[0]}%, B to <= {ABC_BOUNDS[1]}%, else C — the
    inventory-analysis 'few customers carry most revenue' split. Tie
    inclusion (the oracle's RANGE frame) makes the classification a
    pure function of the revenue VALUE, so it computes entirely from
    the compacted per-revenue histogram: per-customer sums are one
    keyed exchange, the histogram exchange is value-domain-shaped, and
    the 3-row class table never joins back. All comparisons are exact
    integer cross-multiplications. Output: (abc_class, n_customers,
    revenue_x100)."""
    empty = pd.DataFrame({"abc_class": pd.Series(dtype="object"),
                          "n_customers": pd.Series(dtype="int64"),
                          "revenue_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "orders"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
            "rev": _cents(batch["o_totalprice"])
            .to_numpy(zero_copy_only=False)})
        return _from_pandas(df.groupby("o_custkey", as_index=False)
                            .sum())

    per_cust = (ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
                .groupby("o_custkey").aggregate(Sum("rev",
                                                    alias_name="rev")))

    def to_hist(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"rev": batch["rev"]
                           .to_numpy(zero_copy_only=False)})
        g = df.groupby("rev", as_index=False).size() \
            .rename(columns={"size": "m"})
        return _from_pandas(g.astype("int64"))

    hist = (per_cust.map_batches(to_hist, batch_format="pyarrow",
                                 batch_size=None)
            .groupby("rev").aggregate(Sum("m", alias_name="m"))
            .to_pandas())
    if hist.empty:
        return empty
    hist = hist.sort_values("rev", ascending=False)
    rev = hist["rev"].to_numpy(np.int64)
    m = hist["m"].to_numpy(np.int64)
    cum = (rev * m).cumsum()
    total = int(cum[-1])
    lo, hi = ABC_BOUNDS
    # exact integer comparisons: cum * 100 <= bound * total
    cls = np.where(cum * 100 <= lo * total, "A",
                   np.where(cum * 100 <= hi * total, "B", "C"))
    out = pd.DataFrame({"abc_class": cls, "n_customers": m,
                        "revenue_x100": rev * m}) \
        .groupby("abc_class", as_index=False).sum()
    return out.sort_values("abc_class").reset_index(drop=True) \
        .astype({"n_customers": "int64", "revenue_x100": "int64"})


ABC_SQL = f"""
WITH c AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
             AS rev
  FROM orders GROUP BY o_custkey),
w AS (
  SELECT rev,
         SUM(rev) OVER (ORDER BY rev DESC
                        RANGE UNBOUNDED PRECEDING) AS cum,
         SUM(rev) OVER () AS total
  FROM c),
cls AS (
  SELECT rev,
         CASE WHEN cum * 100 <= {ABC_BOUNDS[0]} * total THEN 'A'
              WHEN cum * 100 <= {ABC_BOUNDS[1]} * total THEN 'B'
              ELSE 'C' END AS abc_class
  FROM w)
SELECT abc_class, COUNT(*) AS n_customers,
       CAST(SUM(rev) AS BIGINT) AS revenue_x100
FROM cls GROUP BY abc_class ORDER BY abc_class
"""


ISLANDS_TOPK = 20
ISLANDS_RANGE = 4096          # key-range bucket width for the exchange


def orders_key_islands(sf_dir: str):
    """Gaps-and-islands over the orderkey domain: the top contiguous
    runs of PRESENT keys (longest first, then start) — the
    sequence-integrity audit behind 'which id ranges are complete'.
    Distributed form: keys bucket by key // {ISLANDS_RANGE} (a RANGE
    exchange, so a bucket holds a contiguous key interval), islands
    resolve per bucket with the classic key-minus-rank grouping, and
    only the <= 2-per-bucket BOUNDARY islands merge driver-side (an
    island crossing buckets is split exactly at multiples of the range
    width). Output: (start_key, end_key, run_len)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("start_key", "end_key", "run_len")})
    if _table_empty(sf_dir, "orders"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_orderkey"])

    def keyed(batch: pa.Table) -> pa.Table:
        k = np.unique(batch["o_orderkey"].to_numpy(zero_copy_only=False))
        return pa.Table.from_pydict({
            "k": k.astype(np.int64),
            "bucket": (k // ISLANDS_RANGE).astype(np.int64)})

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("bucket", sort=False):
            k = np.unique(grp["k"].to_numpy(np.int64))
            brk = np.flatnonzero(np.diff(k) > 1)
            starts = np.concatenate([[0], brk + 1])
            ends = np.concatenate([brk, [len(k) - 1]])
            for s, e in zip(starts, ends):
                out.append((int(k[s]), int(k[e])))
        return pd.DataFrame(out, columns=["start_key", "end_key"]) \
            .astype("int64") if out else \
            pd.DataFrame({"start_key": pd.Series(dtype="int64"),
                          "end_key": pd.Series(dtype="int64")})

    runs = _coarse_partition_map(
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=None),
        "bucket", islands).to_pandas()
    if runs.empty:
        return empty
    # merge islands that touch across bucket boundaries: only runs
    # ending/starting at a multiple of the range width can chain
    runs = runs.sort_values("start_key").reset_index(drop=True)
    merged = []
    cur_s, cur_e = None, None
    for r in runs.itertuples(index=False):
        if cur_s is None:
            cur_s, cur_e = r.start_key, r.end_key
        elif r.start_key == cur_e + 1:
            cur_e = r.end_key
        else:
            merged.append((cur_s, cur_e))
            cur_s, cur_e = r.start_key, r.end_key
    merged.append((cur_s, cur_e))
    out = pd.DataFrame(merged, columns=["start_key", "end_key"])
    out["run_len"] = out["end_key"] - out["start_key"] + 1
    return out.sort_values(["run_len", "start_key"],
                           ascending=[False, True]) \
        .head(ISLANDS_TOPK).reset_index(drop=True).astype("int64")


KEY_ISLANDS_SQL = f"""
WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
r AS (SELECT k, k - ROW_NUMBER() OVER (ORDER BY k) AS grp FROM k),
runs AS (
  SELECT MIN(k) AS start_key, MAX(k) AS end_key,
         MAX(k) - MIN(k) + 1 AS run_len
  FROM r GROUP BY grp)
SELECT CAST(start_key AS BIGINT) AS start_key,
       CAST(end_key AS BIGINT) AS end_key,
       CAST(run_len AS BIGINT) AS run_len
FROM runs
ORDER BY run_len DESC, start_key
LIMIT {ISLANDS_TOPK}
"""


def orders_seasonality_index(sf_dir: str):
    """Calendar-month seasonality index: revenue share of each month-of-
    year vs the uniform 1/12 expectation, as exact x1e6 floor divisions
    (index = month_total * 12 * 1e6 // grand_total) — the seasonal
    profile a demand model divides out. One grouped pass to a <= 12-row
    table; everything after runs on it. Output: (month_of_year,
    n_orders, total_x100, index_x1e6)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("month_of_year", "n_orders", "total_x100",
                           "index_x1e6")})
    if _table_empty(sf_dir, "orders"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.month(batch["o_orderdate"]).to_numpy(zero_copy_only=False)
        v = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"month_of_year": m.astype(np.int64),
                          "n_orders": np.ones(len(v), dtype=np.int64),
                          "total_x100": v}) \
            .groupby("month_of_year", as_index=False).sum()
        return _from_pandas(g)

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("month_of_year")
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("total_x100", alias_name="total_x100"))
           .to_pandas())
    if agg.empty:
        return empty
    grand = int(agg["total_x100"].sum())
    agg["index_x1e6"] = [int(t) * 12 * 1_000_000 // grand
                         for t in agg["total_x100"]]
    return agg.sort_values("month_of_year").reset_index(drop=True) \
        .astype("int64")


SEASONALITY_SQL = """
WITH m AS (
  SELECT CAST(month(o_orderdate) AS BIGINT) AS month_of_year,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
             AS total_x100
  FROM orders GROUP BY month_of_year)
SELECT month_of_year, n_orders, total_x100,
       CAST(CAST(total_x100 AS HUGEINT) * 12 * 1000000
            // (SELECT SUM(total_x100) FROM m) AS BIGINT) AS index_x1e6
FROM m ORDER BY month_of_year
"""


ORDERS_MONTHLY_GROWTH_SQL = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
             AS total_x100
  FROM orders GROUP BY month)
SELECT month, total_x100,
       COALESCE(LAG(total_x100) OVER (ORDER BY month), -1) AS prev_x100,
       COALESCE(CAST(total_x100 - LAG(total_x100) OVER (ORDER BY month)
                     AS DOUBLE)
                / CAST(LAG(total_x100) OVER (ORDER BY month) AS DOUBLE),
                0.0) AS growth
FROM m ORDER BY month
"""


# ---------------------------------------------------------------------------
# Broadcast dimension join + top-k (part brands by revenue)
# ---------------------------------------------------------------------------

BRAND_TOPK = 5


def brand_revenue_topk(sf_dir: str):
    part = pd.read_parquet(_pq(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    bmap_ref = ray.put(dict(zip(part.p_partkey, part.p_brand)))
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        bmap = ray.get(bmap_ref)
        rev = _cents(pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"])),
                     1e4).to_numpy(zero_copy_only=False)
        brands = pd.Series(batch["l_partkey"].to_numpy(zero_copy_only=False)) \
            .map(bmap).to_numpy()
        df = pd.DataFrame({"p_brand": brands, "revenue_x1e4": rev})
        return pa.Table.from_pandas(
            df.groupby("p_brand", as_index=False).sum(), preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
              .groupby("p_brand")
              .aggregate(Sum("revenue_x1e4", alias_name="revenue_x1e4"))
              .sort(["revenue_x1e4", "p_brand"], descending=[True, False])
              .limit(BRAND_TOPK))


BRAND_SQL = f"""
SELECT p_brand,
       CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_x1e4
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY revenue_x1e4 DESC, p_brand
LIMIT {BRAND_TOPK}
"""


# ---------------------------------------------------------------------------
# Events: tumbling-window aggregate (streaming-shaped batch semantics)
# ---------------------------------------------------------------------------

def events_hourly(sf_dir: str):
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.strftime(batch["ts"], format="%Y-%m-%d %H")
        df = pd.DataFrame({
            "hour": hour.to_pandas(),
            "event_type": batch["event_type"].to_pandas(),
            "value_x1e6": _cents(batch["value"], 1e6).to_pandas()})
        g = (df.groupby(["hour", "event_type"], as_index=False)
               .agg(value_x1e6=("value_x1e6", "sum"),
                    n_events=("value_x1e6", "size")))
        return _from_pandas(g)

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
              .groupby(["hour", "event_type"])
              .aggregate(Sum("value_x1e6", alias_name="value_x1e6"),
                         Sum("n_events", alias_name="n_events"))
              .sort(["hour", "event_type"]))


EVENTS_HOURLY_SQL = """
SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
       CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS BIGINT) AS value_x1e6,
       COUNT(*) AS n_events
FROM events GROUP BY hour, event_type ORDER BY hour, event_type
"""


# ---------------------------------------------------------------------------
# Events: sessionization (gap > 30 min) — partitioned ordered-log windowing
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 30


def events_sessions(sf_dir: str):
    """Per-user session stats. Partition by user (groupby shuffle), order by
    ts within the group, count gap-based session breaks — the documented
    Ray Data pattern for stream-shaped references (ordering assumption:
    within one user's group only)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gaps = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_sessions": [int(gaps.sum()) + 1],
            "n_events": [len(g)]})

    return _coarse_grouped_map(ds, "user_id", sessionize).sort("user_id")


EVENTS_SESSIONS_SQL = f"""
WITH marks AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM marks GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Anti-join: customers with no orders (broadcast key set, filter not-in)
# ---------------------------------------------------------------------------

ANTI_CUTOFF = "2000-06-01"


def customers_without_orders(sf_dir: str):
    """Anti-semi-join via broadcast key set (at real scale: a Bloom filter
    of the key set, same shape) — SURVEY.md §2.8 D3/D4 cross-table analog.
    'Recent orders' cutoff keeps the result non-empty at every sf."""
    orders = pd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_custkey", "o_orderdate"])
    orders = orders[orders.o_orderdate >= pd.Timestamp(ANTI_CUTOFF)]
    keys_ref = ray.put(np.unique(orders["o_custkey"].to_numpy()))
    ds = rd.read_parquet(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_name", "c_acctbal"])

    def anti(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = ~np.isin(batch["c_custkey"].to_numpy(zero_copy_only=False), keys)
        t = batch.filter(pa.array(mask))
        return pa.Table.from_arrays(
            [t["c_custkey"], t["c_name"], _cents(t["c_acctbal"])],
            names=["c_custkey", "c_name", "acctbal_x100"])

    return ds.map_batches(anti, batch_format="pyarrow", batch_size=None).sort("c_custkey")


ANTI_JOIN_SQL = f"""
SELECT c_custkey, c_name,
       CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS acctbal_x100
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '{ANTI_CUTOFF} 00:00:00')
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Cross-table referential-integrity audit (exact orphan-FK counts)
# ---------------------------------------------------------------------------

FK_RELATIONSHIPS = [
    # (label, child table, child key, parent table, parent key)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
]


def fk_integrity_audit(sf_dir: str):
    """EXACT orphan-foreign-key counts for every parent-child
    relationship — the cross-table completion of the single-table
    expectation checks (events_quality_checks). No side is assumed
    broadcastable: child keys and parent keys ride ONE side-tagged
    co-partitioned union exchange per relationship (the
    customer_merge_upsert machinery), each partition counts its child
    rows with no local parent key (np.isin on the partition's arrays),
    and the per-partition counts sum driver-side. Child row counts come
    from parquet footers (no extra scan).
    Output: (relationship, n_child, n_orphans)."""
    rows = []
    for label, child, ckey, parent, pkey in FK_RELATIONSHIPS:
        import pyarrow.dataset as pads
        n_child = pads.dataset(_pq(sf_dir, child)).count_rows()
        if n_child == 0:
            rows.append((label, 0, 0))
            continue

        def tag(side: int, col: str):
            def fn(batch: pa.Table) -> pa.Table:
                k = batch[col].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                return pa.Table.from_pydict(
                    {"key": k, "side": np.full(len(k), side,
                                               dtype=np.int64)})
            return fn

        cds = rd.read_parquet(_pq(sf_dir, child), columns=[ckey]) \
            .map_batches(tag(0, ckey), batch_format="pyarrow",
                         batch_size=None)
        pds = rd.read_parquet(_pq(sf_dir, parent), columns=[pkey]) \
            .map_batches(tag(1, pkey), batch_format="pyarrow",
                         batch_size=None)

        def orphans(g: pd.DataFrame) -> pd.DataFrame:
            side = g["side"].to_numpy(np.int64)
            keys = g["key"].to_numpy(np.int64)
            child_k = keys[side == 0]
            parent_k = keys[side == 1]
            n = int((~np.isin(child_k, parent_k)).sum())
            return pd.DataFrame({"n_orphans": [n]})

        part = _coarse_grouped_map_union(cds, pds, orphans).to_pandas()
        rows.append((label, int(n_child),
                     int(part["n_orphans"].sum()) if len(part) else 0))
    return pd.DataFrame(rows, columns=["relationship", "n_child",
                                       "n_orphans"]) \
        .sort_values("relationship").reset_index(drop=True)


FK_AUDIT_SQL = """
SELECT relationship, n_child, n_orphans FROM (
  SELECT 'lineitem->orders' AS relationship, COUNT(*) AS n_child,
         COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS n_orphans
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'lineitem->part', COUNT(*),
         COUNT(*) FILTER (WHERE p.p_partkey IS NULL)
  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
  UNION ALL
  SELECT 'orders->customer', COUNT(*),
         COUNT(*) FILTER (WHERE c.c_custkey IS NULL)
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
) ORDER BY relationship
"""


# ---------------------------------------------------------------------------
# As-of join (events enriched with the latest order at-or-before ts)
# ---------------------------------------------------------------------------

def events_asof_orders(sf_dir: str, direction: str = "backward",
                       tolerance_days: int | None = None):
    """As-of join: each event joined to the most recent order of customer
    ``user_id`` placed at or before the event timestamp (or, with
    ``direction="forward"``, the EARLIEST order at-or-after it — the
    attribution-window mirror). Ray Data has no
    as-of join primitive, so BOTH sides are co-partitioned on the key
    through one coarse exchange (side-tagged union on user_id %% 64) and
    each per-user group runs ``pd.merge_asof`` — at full scale orders is
    not a dimension table, so no side is broadcast and no side is
    scanned per group (the round-1 form ray.put the whole orders table
    and filtered it O(|orders|) once per user)."""

    def tag_events(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["user_id"],
             pa.array(np.zeros(n, dtype=np.int8)),
             batch["event_id"],
             pa.array(np.full(n, -1, dtype=np.int64)),
             pc.cast(batch["ts"], pa.timestamp("us"))],
            names=["user_id", "side", "event_id", "okey", "t"])

    def tag_orders(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [pc.cast(batch["o_custkey"], pa.int64()),
             pa.array(np.ones(n, dtype=np.int8)),
             pa.array(np.full(n, -1, dtype=np.int64)),
             pc.cast(batch["o_orderkey"], pa.int64()),
             pc.cast(batch["o_orderdate"], pa.timestamp("us"))],
            names=["user_id", "side", "event_id", "okey", "t"])

    events = rd.read_parquet(_pq(sf_dir, "events"),
                             columns=["event_id", "user_id", "ts"]) \
        .map_batches(tag_events, batch_format="pyarrow", batch_size=None)
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"]) \
        .map_batches(tag_orders, batch_format="pyarrow", batch_size=None)

    def asof_part(g: pd.DataFrame) -> pd.DataFrame:
        """Whole-partition as-of via ``merge_asof(by="user_id")`` — one
        vectorized call instead of one python merge per user."""
        ev = g[g["side"] == 0][["event_id", "user_id", "t"]] \
            .sort_values("t", kind="stable")
        if ev.empty:                     # partition has orders, no events
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "o_orderkey": pd.Series([], dtype="int64")})
        # latest order with t <= event ts; ties on date -> max orderkey
        # (keep="last" after the (t, okey) sort; mirrored in the SQL with
        # ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1)
        # forward ties on date -> MIN orderkey (keep="first"), mirrored
        # by the oracle's ASC, ASC LIMIT 1
        od_all = g[g["side"] == 1][["user_id", "okey", "t"]] \
            .sort_values(["t", "okey"], kind="stable")
        if direction == "nearest":
            # run both directions, pick min |distance|; ties prefer the
            # backward (earlier) order — mirrored by the oracle's
            # (o_orderdate > ts) ASC tiebreak
            out = {"event_id": ev["event_id"].astype("int64"),
                   "user_id": ev["user_id"].astype("int64")}
            sides = {}
            for dirn, keep in (("backward", "last"), ("forward", "first")):
                od = od_all.drop_duplicates(["user_id", "t"], keep=keep) \
                    .sort_values("t", kind="stable") \
                    .assign(ot=lambda d: d["t"])
                m = pd.merge_asof(ev, od, on="t", by="user_id",
                                  direction=dirn)
                sides[dirn] = m
            ts = sides["backward"]["t"].to_numpy("datetime64[us]") \
                .astype(np.int64)
            kb = sides["backward"]["okey"].fillna(-1).to_numpy(np.int64)
            kf = sides["forward"]["okey"].fillna(-1).to_numpy(np.int64)
            BIG = np.int64(1 << 62)
            tb = sides["backward"]["ot"]
            tf = sides["forward"]["ot"]
            db = np.where(kb >= 0, ts - tb.to_numpy("datetime64[us]")
                          .astype(np.int64), BIG)
            df_ = np.where(kf >= 0, tf.to_numpy("datetime64[us]")
                           .astype(np.int64) - ts, BIG)
            out["o_orderkey"] = np.where(db <= df_, kb, kf).astype(np.int64)
            return pd.DataFrame(out)
        keep = "last" if direction == "backward" else "first"
        od = od_all.drop_duplicates(["user_id", "t"], keep=keep) \
            .sort_values("t", kind="stable")
        tol = pd.Timedelta(days=tolerance_days) \
            if tolerance_days is not None else None
        merged = pd.merge_asof(ev, od, on="t", by="user_id",
                               direction=direction, tolerance=tol)
        return pd.DataFrame({
            "event_id": merged["event_id"].astype("int64"),
            "user_id": merged["user_id"].astype("int64"),
            "o_orderkey": merged["okey"].fillna(-1).astype("int64")})

    def add_coarse(batch: pa.Table) -> pa.Table:
        c = batch["user_id"].to_numpy(zero_copy_only=False) % 64
        return batch.append_column("_coarse",
                                   pa.array(c.astype(np.int64))) \
            .replace_schema_metadata(None)

    return (_pre_coalesce(events.union(orders), "auto")
            .map_batches(add_coarse, batch_format="pyarrow", batch_size=None)
            .groupby("_coarse")
            .map_groups(lambda g: asof_part(g.drop(columns=["_coarse"])),
                        batch_format="pandas")
            .sort("event_id"))


def events_asof_next_order(sf_dir: str):
    """Forward as-of: earliest order at-or-after each event — same
    co-partitioned union exchange, ``merge_asof(direction="forward")``
    per partition."""
    return events_asof_orders(sf_dir, direction="forward")


ASOF_TOLERANCE_DAYS = 7


def events_asof_orders_tolerance(sf_dir: str):
    """Tolerance-bounded backward as-of: the latest order at-or-before
    each event AND within {ASOF_TOLERANCE_DAYS} days — the bounded
    attribution window that keeps stale matches out (-1 past the
    horizon). Same co-partitioned exchange; ``merge_asof(tolerance=)``
    per partition."""
    return events_asof_orders(sf_dir, direction="backward",
                              tolerance_days=ASOF_TOLERANCE_DAYS)


EVENTS_ASOF_TOL_SQL = f"""
SELECT e.event_id, e.user_id,
       COALESCE((SELECT o.o_orderkey FROM orders o
                 WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                   AND o.o_orderdate >= e.ts
                       - INTERVAL {ASOF_TOLERANCE_DAYS} DAY
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1),
                -1) AS o_orderkey
FROM events e
ORDER BY event_id
"""


def events_asof_nearest_order(sf_dir: str):
    """Nearest as-of: the user's order with the smallest
    |o_orderdate - ts| (completing the backward/forward family) —
    equal-distance ties prefer the earlier (backward) order; same-date
    ties keep the backward side's max / forward side's min orderkey.
    One co-partitioned exchange; both directional merges run inside the
    same partition fold."""
    return events_asof_orders(sf_dir, direction="nearest")


EVENTS_ASOF_NEAREST_SQL = """
SELECT e.event_id, e.user_id,
       COALESCE((SELECT o.o_orderkey FROM orders o
                 WHERE o.o_custkey = e.user_id
                 ORDER BY ABS(date_diff('microsecond', o.o_orderdate,
                                        e.ts)) ASC,
                          (o.o_orderdate > e.ts) ASC,
                          CASE WHEN o.o_orderdate <= e.ts
                               THEN -o.o_orderkey
                               ELSE o.o_orderkey END ASC
                 LIMIT 1),
                -1) AS o_orderkey
FROM events e
ORDER BY event_id
"""


EVENTS_ASOF_FWD_SQL = """
SELECT e.event_id, e.user_id,
       COALESCE((SELECT o.o_orderkey FROM orders o
                 WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
                 ORDER BY o.o_orderdate ASC, o.o_orderkey ASC LIMIT 1),
                -1) AS o_orderkey
FROM events e
ORDER BY event_id
"""


EVENTS_ASOF_SQL = """
SELECT e.event_id, e.user_id,
       COALESCE((SELECT o.o_orderkey FROM orders o
                 WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
                 ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1),
                -1) AS o_orderkey
FROM events e
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Window function: per-user running totals over the event log
# ---------------------------------------------------------------------------

def events_running_totals(sf_dir: str):
    """Cumulative per-user value totals in ts order — the ordered-log
    window pattern (groupby shuffle on the key, sort + cumsum within the
    group; ordering assumption holds only within one user's group)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        # whole-partition vectorized: one sort + one grouped cumsum
        g = g.sort_values(["user_id", "ts", "event_id"])
        v = pd.Series(_round_half_away(g["value"].to_numpy() * 1e6),
                      index=g.index)
        return pd.DataFrame({
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "running_value_x1e6": v.groupby(g["user_id"].to_numpy()).cumsum()})

    return _coarse_partition_map(ds, "user_id", running).sort("event_id")


EVENTS_RUNNING_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_value_x1e6
FROM events
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Native distributed hash join (both-sides-large tier)
# ---------------------------------------------------------------------------

def segment_order_revenue_native_join(sf_dir: str):
    """Revenue by market segment via ``Dataset.join`` — the hash-partitioned
    both-sides-large join tier (broadcast is the small-side default
    elsewhere; this exercises the native exchange both sides pay)."""
    if _table_empty(sf_dir, "orders") or _table_empty(sf_dir, "customer"):
        return pd.DataFrame({"c_mktsegment": pd.Series(dtype="object"),
                             "total_x100": pd.Series(dtype="int64"),
                             "n_orders": pd.Series(dtype="int64")})
    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_custkey", "o_totalprice"])

    def scale(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch["o_custkey"], _cents(batch["o_totalprice"])],
            names=["o_custkey", "total_x100"])

    customer = rd.read_parquet(_pq(sf_dir, "customer"),
                               columns=["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda t: t.replace_schema_metadata(None),
                     batch_format="pyarrow", batch_size=None)
    joined = orders.map_batches(scale, batch_format="pyarrow", batch_size=None).join(
        customer, join_type="inner", num_partitions=16,
        on=("o_custkey",), right_on=("c_custkey",))

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c_mktsegment": batch["c_mktsegment"].to_pandas(),
            "total_x100": batch["total_x100"].to_pandas()})
        g = (df.groupby("c_mktsegment", as_index=False)
               .agg(total_x100=("total_x100", "sum"),
                    n_orders=("total_x100", "size")))
        return _from_pandas(g)

    return (joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("c_mktsegment")
            .aggregate(Sum("total_x100", alias_name="total_x100"),
                       Sum("n_orders", alias_name="n_orders"))
            .sort("c_mktsegment"))


NATIVE_JOIN_SQL = """
SELECT c_mktsegment,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_x100,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Per-group top-k (window rank): each customer's highest-value order
# ---------------------------------------------------------------------------

def top_order_per_customer(sf_dir: str):
    """Grouped top-1 (ROW_NUMBER window analog): groupby shuffle on the
    key, per-group sort + head inside ``map_groups``."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        # whole-partition vectorized: sort + first row per key
        g = g.assign(total_x100=_round_half_away(
            g["o_totalprice"].to_numpy() * 100))
        g = g.sort_values(["o_custkey", "total_x100", "o_orderkey"],
                          ascending=[True, False, True]) \
             .drop_duplicates("o_custkey", keep="first")
        return g[["o_custkey", "o_orderkey", "total_x100"]].astype("int64")

    return _coarse_partition_map(ds, "o_custkey", top1).sort("o_custkey")


TOP_ORDER_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS total_x100
FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY o_custkey
          ORDER BY CAST(ROUND(o_totalprice * 100.0) AS BIGINT) DESC,
                   o_orderkey) AS rn
      FROM orders)
WHERE rn = 1
ORDER BY o_custkey
"""


# ---------------------------------------------------------------------------
# Deterministic sampling + union
# ---------------------------------------------------------------------------

SAMPLE_MOD = 10


def events_hash_sample(sf_dir: str):
    """Deterministic 1-in-N sample (key-hash sampling — reproducible at
    any parallelism, unlike random_sample; the smoke-subset analog of
    SURVEY O6/O7)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(ids % SAMPLE_MOD == 0))
        return pa.Table.from_arrays(
            [t["event_id"], t["event_type"], _cents(t["value"], 1e6)],
            names=["event_id", "event_type", "value_x1e6"])

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None).sort("event_id")


SAMPLE_SQL = f"""
SELECT event_id, event_type,
       CAST(ROUND(value * 1000000.0) AS BIGINT) AS value_x1e6
FROM events WHERE event_id % {SAMPLE_MOD} = 0 ORDER BY event_id
"""


def orders_priority_union(sf_dir: str):
    """Dataset.union of two disjoint filtered subsets (D1 cross-dataset
    union) re-aggregated by priority."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderpriority", "o_orderstatus",
                                  "o_totalprice"])

    def split(status):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch["o_orderstatus"], status))
            return pa.Table.from_arrays(
                [t["o_orderpriority"], _cents(t["o_totalprice"])],
                names=["o_orderpriority", "total_x100"])
        return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)

    both = split("F").union(split("O"))

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderpriority": batch["o_orderpriority"].to_pandas(),
            "total_x100": batch["total_x100"].to_pandas()})
        g = (df.groupby("o_orderpriority", as_index=False)
               .agg(total_x100=("total_x100", "sum"),
                    n_orders=("total_x100", "size")))
        return _from_pandas(g)

    return (both.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("o_orderpriority")
            .aggregate(Sum("total_x100", alias_name="total_x100"),
                       Sum("n_orders", alias_name="n_orders"))
            .sort("o_orderpriority"))


UNION_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_x100,
       COUNT(*) AS n_orders
FROM (SELECT * FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT * FROM orders WHERE o_orderstatus = 'O')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Approximate distinct count (HyperLogLog, mergeable custom aggregate)
# ---------------------------------------------------------------------------

def approx_distinct_users(sf_dir: str):
    """HLL(p=12) count-distinct over events.user_id: one 4 KiB sketch per
    batch flows to the driver-side merge instead of shuffling every key.

    ORACLED form (round-5 sketch pattern): the estimate is checked
    against the exact distinct count (per-batch distinct partials, one
    tiny exchange) at the HLL_REL_BOUND band and ships as
    ``within_bound`` beside the exact count the SQL oracle recomputes.
    Output: (n_users, within_bound)."""
    from ..functions import sketch as S

    if _table_empty(sf_dir, "events"):
        return pd.DataFrame({"n_users": pd.Series([0], dtype="int64"),
                             "within_bound":
                             pd.Series([1], dtype="int64")})
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        reg = S.hll_create()
        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        # hash the int64 array directly (deterministic, no per-element
        # python string boxing); the exact side ships the batch's
        # DISTINCT ids (bounded by true cardinality after the exchange)
        S.hll_add_hashes(reg, pd.util.hash_array(ids))
        return pa.Table.from_arrays(
            [pa.array([reg.tobytes()], type=pa.binary())],
            names=["sketch"])

    merged = S.hll_create()
    for b in ds.map_batches(partial, batch_format="pyarrow", batch_size=None) \
               .iter_batches(batch_format="pyarrow", batch_size=None):
        for sk in b["sketch"].to_pylist():
            merged = S.hll_merge(merged, np.frombuffer(sk, dtype=np.uint8))
    est = int(S.hll_count(merged))

    # exact twin, scale-honest: per-batch distinct partials -> ONE
    # uid-keyed exchange of deduped ids -> count groups (never a
    # driver-side id set)
    def uniq(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["user_id"].to_numpy(zero_copy_only=False))
        return pa.Table.from_pydict({"uid": u.astype(np.int64)})

    exact = int(rd.read_parquet(_pq(sf_dir, "events"),
                                columns=["user_id"])
                .map_batches(uniq, batch_format="pyarrow",
                             batch_size=None)
                .groupby("uid").count().count())
    ok = abs(est - exact) <= HLL_REL_BOUND * max(exact, 1)
    return pd.DataFrame({"n_users": pd.Series([exact], dtype="int64"),
                         "within_bound":
                         pd.Series([int(ok)], dtype="int64")})


APPROX_DISTINCT_SQL = """
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(1 AS BIGINT) AS within_bound
FROM events
"""


# ---------------------------------------------------------------------------
# Grouped count-distinct: exact (oracled) + grouped-HLL (error-bounded)
# ---------------------------------------------------------------------------


def events_type_distinct_users(sf_dir: str):
    """Exact distinct users per event type — the exact baseline for the
    grouped-HLL path below. Per-batch distinct (type, user) partials ->
    one keyed exchange over the deduped pairs -> a tiny per-type count.
    At 100 TB the pair exchange is the honest exact cost; the sketch
    variant below removes it when +-2% is acceptable."""
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "n_users": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "user_id"])

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False)}) \
            .drop_duplicates()
        return _from_pandas(df)

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow",
                           batch_size=None) \
        .groupby(["event_type", "user_id"]).aggregate(Count())

    def per_type(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": batch["event_type"]
                           .to_numpy(zero_copy_only=False)})
        return _from_pandas(df.groupby("event_type", as_index=False)
                            .size().rename(columns={"size": "n_users"}))

    out = pairs.map_batches(per_type, batch_format="pyarrow",
                            batch_size=None) \
        .groupby("event_type") \
        .aggregate(Sum("n_users", alias_name="n_users")).to_pandas()
    if out.empty or "event_type" not in out.columns:
        return empty
    return out[["event_type", "n_users"]] \
        .sort_values("event_type").reset_index(drop=True) \
        .astype({"n_users": "int64"})


TYPE_DISTINCT_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


HLL_REL_BOUND = 0.02      # grouped-HLL(p=12) acceptance band vs exact
CMS_REL_BOUND = 0.05      # Count-Sketch join-size acceptance band
DDS_REL_BOUND = 0.03      # DDSketch quantile acceptance band
KMV_REL_BOUND = 0.25      # KMV intersection band ABOVE the exact regime


def events_type_approx_distinct(sf_dir: str):
    """Grouped HLL(p=12): one 4 KiB sketch per (event_type, batch) row
    flows through a |types|-group merge — NO (type, user) pair exchange
    at all, the 100-TB shape for grouped count-distinct.

    ORACLED form (round-5): the sketch estimate is distilled into a
    ``within_bound`` flag against the exact distinct count (computed by
    the same kernel as ``events_type_distinct_users``) so the driver
    can hash-check the row: the SQL oracle recomputes the exact side
    and asserts the bound as TRUE — a broken sketch flips the flag and
    fails the hash. Output: (event_type, n_users, within_bound)."""
    from ..functions import sketch as S

    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "n_users": pd.Series(dtype="int64"),
                          "within_bound": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        types = batch["event_type"].to_numpy(zero_copy_only=False)
        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        if len(types) == 0:            # empty blocks are routine at scale
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.binary())],
                names=["event_type", "sketch"])
        order = np.argsort(types, kind="stable")
        st, si = types[order], pd.util.hash_array(ids[order])
        bounds = np.flatnonzero(np.r_[True, st[1:] != st[:-1], True])
        out_t, out_s = [], []
        for a, b in zip(bounds[:-1], bounds[1:]):
            reg = S.hll_create()
            S.hll_add_hashes(reg, si[a:b])
            out_t.append(st[a])
            out_s.append(reg.tobytes())
        return pa.Table.from_arrays(
            [pa.array(out_t, pa.string()), pa.array(out_s, pa.binary())],
            names=["event_type", "sketch"])

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions import sketch as S2
        reg = S2.hll_create()
        for sk in g["sketch"]:
            reg = S2.hll_merge(reg, np.frombuffer(sk, dtype=np.uint8))
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "approx_users": [np.int64(S2.hll_count(reg))]})

    out = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=None) \
        .groupby("event_type") \
        .map_groups(merge_group, batch_format="pandas").to_pandas()
    if out.empty or "event_type" not in out.columns:
        return empty
    out = out.sort_values("event_type").reset_index(drop=True) \
        .astype({"approx_users": "int64"})
    exact = events_type_distinct_users(sf_dir)
    exact = exact if isinstance(exact, pd.DataFrame) else exact.to_pandas()
    m = out.merge(exact, on="event_type", how="outer").fillna(0)
    est = m["approx_users"].to_numpy(np.int64)
    n = m["n_users"].to_numpy(np.int64)
    m["within_bound"] = (np.abs(est - n)
                         <= HLL_REL_BOUND * np.maximum(n, 1)) \
        .astype(np.int64)
    return m[["event_type", "n_users", "within_bound"]] \
        .astype({"n_users": "int64"}) \
        .sort_values("event_type").reset_index(drop=True)


TYPE_APPROX_DISTINCT_SQL = """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(1 AS BIGINT) AS within_bound
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Audience overlap: distinct users doing BOTH of two event types —
# exact (INTERSECT, oracled) and KMV bottom-k sketch (set-operation
# sketch; HLL can union but cannot intersect)
# ---------------------------------------------------------------------------

OVERLAP_TYPES = ("click", "purchase")


def events_type_overlap_exact(sf_dir: str):
    """|users(click) ∩ users(purchase)| exactly: per-batch dedup of
    (type, user) pairs for the two types only, one user-keyed exchange
    of the surviving pairs, per-group both-types test."""
    if _table_empty(sf_dir, "events"):
        return pd.DataFrame({"n_common_users": [np.int64(0)]})
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        types = batch["event_type"].to_numpy(zero_copy_only=False)
        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        m = np.isin(types, OVERLAP_TYPES)
        df = pd.DataFrame({
            "user_id": ids[m],
            "has_a": (types[m] == OVERLAP_TYPES[0]).astype(np.int64),
            "has_b": (types[m] == OVERLAP_TYPES[1]).astype(np.int64)})
        return _from_pandas(df.groupby("user_id", as_index=False).max())

    from ray.data.aggregate import Max
    both = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby("user_id")
            .aggregate(Max("has_a", alias_name="has_a"),
                       Max("has_b", alias_name="has_b")))

    def count_both(batch: pa.Table) -> pa.Table:
        ha = batch["has_a"].to_numpy(zero_copy_only=False)
        hb = batch["has_b"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"n_common_users": [np.int64(((ha > 0) & (hb > 0)).sum())]})

    agg = both.map_batches(count_both, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if agg.empty:
        return pd.DataFrame({"n_common_users": [np.int64(0)]})
    return pd.DataFrame(
        {"n_common_users": [np.int64(agg["n_common_users"].sum())]})


TYPE_OVERLAP_EXACT_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_common_users FROM (
  SELECT user_id FROM events WHERE event_type = '{OVERLAP_TYPES[0]}'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = '{OVERLAP_TYPES[1]}')
"""


def events_type_overlap_matrix(sf_dir: str):
    """Full pairwise audience-overlap matrix: distinct common users for
    every unordered event-type pair. Per-batch (type, user) dedup, one
    user-keyed exchange, then each user's type set expands to its
    C(T,2) pairs map-side (T = |types|, tiny) and pre-reduced pair
    counts Sum up — the exchange never carries a (type_a, type_b, user)
    triple."""
    empty = pd.DataFrame({"type_a": pd.Series(dtype="object"),
                          "type_b": pd.Series(dtype="object"),
                          "n_common": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "event_type": batch["event_type"]
            .to_numpy(zero_copy_only=False)}).drop_duplicates()
        return _from_pandas(df)

    def pairs_per_part(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()        # cross-batch (type, user) dups
        m = d.merge(d, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        out = m.groupby(["event_type_x", "event_type_y"],
                        as_index=False).size()
        return out.rename(columns={"event_type_x": "type_a",
                                   "event_type_y": "type_b",
                                   "size": "n_common"}) \
            .astype({"n_common": "int64"})

    per_part = _coarse_partition_map(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "user_id", pairs_per_part)
    out = (per_part.groupby(["type_a", "type_b"])
           .aggregate(Sum("n_common", alias_name="n_common"))
           .to_pandas())
    if out.empty:
        return empty
    return out.sort_values(["type_a", "type_b"]) \
        .reset_index(drop=True).astype({"n_common": "int64"})


TYPE_OVERLAP_MATRIX_SQL = """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_common
FROM du a JOIN du b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_type_overlap_kmv(sf_dir: str):
    """KMV bottom-k estimate of the same overlap: one k-minima sketch
    per (type, batch) row through a 2-group merge — no (type, user)
    pair ever crosses the exchange (the 100-TB shape; HLL cannot
    intersect, bottom-k can).

    ORACLED form (round-5): the estimate is checked against the exact
    intersection (same kernel as ``events_type_overlap_exact``) — when
    BOTH sketches are below k the estimate must be EXACT, past k a 25%
    band applies — and the verdict ships as ``within_bound`` next to
    the exact count, which the SQL oracle recomputes.
    Output: (n_common_users, within_bound)."""
    from ..functions import sketch as S

    if _table_empty(sf_dir, "events"):
        return pd.DataFrame({"n_common_users": [np.int64(0)],
                             "within_bound": [np.int64(1)]})
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        types = batch["event_type"].to_numpy(zero_copy_only=False)
        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        out_t, out_s = [], []
        for t in OVERLAP_TYPES:
            m = types == t
            if m.any():
                sk = S.kmv_from_hashes(pd.util.hash_array(ids[m]))
                out_t.append(t)
                out_s.append(sk.tobytes())
        return pa.Table.from_arrays(
            [pa.array(out_t, pa.string()), pa.array(out_s, pa.binary())],
            names=["event_type", "sketch"])

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions import sketch as S2
        sk = np.empty(0, dtype=np.uint64)
        for b in g["sketch"]:
            sk = S2.kmv_merge(sk, np.frombuffer(b, dtype=np.uint64))
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "sketch": [sk.tobytes()]})

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("event_type")
           .map_groups(merge_group, batch_format="pandas").to_pandas())
    sks = {r["event_type"]: np.frombuffer(r["sketch"], dtype=np.uint64)
           for _, r in out.iterrows()}
    a = sks.get(OVERLAP_TYPES[0], np.empty(0, dtype=np.uint64))
    b = sks.get(OVERLAP_TYPES[1], np.empty(0, dtype=np.uint64))
    est = int(S.kmv_intersection(a, b))
    exact_df = events_type_overlap_exact(sf_dir)
    exact_df = exact_df if isinstance(exact_df, pd.DataFrame) \
        else exact_df.to_pandas()
    exact = int(exact_df["n_common_users"].iloc[0])
    if len(a) < S.KMV_K and len(b) < S.KMV_K:
        ok = est == exact              # both sketches exact below k
    else:
        ok = abs(est - exact) <= KMV_REL_BOUND * max(exact, 1)
    return pd.DataFrame({"n_common_users": [np.int64(exact)],
                         "within_bound": [np.int64(ok)]})


TYPE_OVERLAP_KMV_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_common_users,
       CAST(1 AS BIGINT) AS within_bound
FROM (
  SELECT user_id FROM events WHERE event_type = '{OVERLAP_TYPES[0]}'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = '{OVERLAP_TYPES[1]}')
"""


# ---------------------------------------------------------------------------
# LAG window: per-user gap to the previous event
# ---------------------------------------------------------------------------

def events_lead_lag(sf_dir: str):
    """Per-user previous-event gap (LAG window): (event_id, user_id,
    prev_gap_us), gap -1 for each user's first event. Same co-partitioned
    grouped-map shape as the running totals."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts"])

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        # whole-partition vectorized: gap at each user's first row is -1
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy(np.int64)
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.empty(len(g), dtype=np.int64)
        if len(g):
            gap[0] = -1
            gap[1:] = np.where(uid[1:] == uid[:-1],
                               ts_us[1:] - ts_us[:-1], -1)
        return pd.DataFrame({"event_id": g["event_id"].astype("int64"),
                             "user_id": uid,
                             "prev_gap_us": gap})

    return _coarse_partition_map(ds, "user_id", lag).sort("event_id")


EVENTS_LAG_SQL = """
SELECT event_id, user_id,
       COALESCE(CAST(epoch_us(ts) - epoch_us(
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           AS BIGINT), -1) AS prev_gap_us
FROM events
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Histogram: lineitem discount buckets (vectorized bucket + groupby count)
# ---------------------------------------------------------------------------

def lineitem_discount_hist(sf_dir: str):
    """Discount histogram: bucket = floor(discount * 100) (exact integer
    percent), count + summed quantity per bucket — partial aggregation
    in-batch, tiny final groupby."""
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_discount", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        b = np.floor(batch["l_discount"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = pd.DataFrame({"bucket": b, "n": 1, "sum_qty": q})
        g = df.groupby("bucket", as_index=False).sum()
        return _from_pandas(g.astype("int64"))

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("bucket")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_qty", alias_name="sum_qty"))
            .sort("bucket"))


DISCOUNT_HIST_SQL = """
SELECT CAST(FLOOR(l_discount * 100.0) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY bucket
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Discrete median per group (exact order statistic, no interpolation)
# ---------------------------------------------------------------------------

def part_brand_median_price(sf_dir: str):
    """Per-brand discrete median retail price in cents: exact order
    statistic (element at floor((n-1)/2) of the sorted values — DuckDB's
    quantile_disc(0.5)). Grouped map over the brand key; per-group
    values fit comfortably (a brand is a bounded category)."""
    ds = rd.read_parquet(_pq(sf_dir, "part"),
                         columns=["p_brand", "p_retailprice"])

    def add_key(batch: pa.Table) -> pa.Table:
        cents = _round_half_away(
            batch["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0)
        return pa.Table.from_arrays(
            [batch["p_brand"], pa.array(cents)],
            names=["p_brand", "price_cents"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for brand, sub in g.groupby("p_brand"):
            v = np.sort(sub["price_cents"].to_numpy())
            rows.append((brand, int(v[(len(v) - 1) // 2])))
        return pd.DataFrame(rows, columns=["p_brand", "median_cents"]) \
            .astype({"median_cents": "int64"})

    return _coarse_str_partition_map(
        ds.map_batches(add_key, batch_format="pyarrow", batch_size=None),
        "p_brand", med, n_coarse=16).sort("p_brand")


BRAND_MEDIAN_SQL = """
SELECT p_brand,
       CAST(quantile_disc(CAST(ROUND(p_retailprice * 100.0) AS BIGINT), 0.5)
            AS BIGINT) AS median_cents
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Pivot: per-user event-type counts as columns (conditional aggregation)
# ---------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_type_pivot(sf_dir: str):
    """Pivot the event log to one row per user with a count column per
    event type — in-batch partial pivot (pandas crosstab shape), tiny
    final groupby-sum over the 5 count columns."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "event_type": batch["event_type"].to_numpy(
                zero_copy_only=False)})
        for t in EVENT_TYPES:
            df[f"n_{t}"] = (df["event_type"] == t).astype("int64")
        g = df.drop(columns=["event_type"]) \
            .groupby("user_id", as_index=False).sum()
        return _from_pandas(g.astype("int64"))

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES]
    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("user_id").aggregate(*aggs).sort("user_id"))


EVENTS_PIVOT_SQL = """
SELECT user_id,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Rollup: order counts/revenue at (year, month), (year), () levels
# ---------------------------------------------------------------------------

def orders_rollup(sf_dir: str):
    """GROUPING-SETS-style rollup computed the distributed way: ONE
    month-level partial aggregation over the data, then the (year) and
    grand-total levels derive from that tiny result — never a second
    scan. Sentinel -1 marks rolled-up levels (hash-stable, no NULLs)."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]")
        year = (d.astype("datetime64[Y]").astype(np.int64) + 1970)
        month = (d.astype(np.int64) % 12) + 1
        cents = _round_half_away(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0)
        df = pd.DataFrame({"year": year, "month": month,
                           "n_orders": 1, "revenue_cents": cents})
        return _from_pandas(
            df.groupby(["year", "month"], as_index=False).sum()
            .astype("int64"))

    from ray.data.aggregate import Sum
    monthly = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
               .groupby(["year", "month"])
               .aggregate(Sum("n_orders", alias_name="n_orders"),
                          Sum("revenue_cents", alias_name="revenue_cents"))
               .to_pandas())            # tiny: years x 12 rows
    if "year" not in monthly.columns:     # empty input loses schema
        monthly = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                ("year", "month", "n_orders",
                                 "revenue_cents")})
    yearly = monthly.groupby("year", as_index=False)[
        ["n_orders", "revenue_cents"]].sum()
    yearly["month"] = -1
    total = pd.DataFrame({
        "year": [-1], "month": [-1],
        "n_orders": [monthly["n_orders"].sum()],
        "revenue_cents": [monthly["revenue_cents"].sum()]})
    out = pd.concat([monthly, yearly, total], ignore_index=True)
    return out[["year", "month", "n_orders", "revenue_cents"]] \
        .astype("int64").sort_values(["year", "month"]) \
        .reset_index(drop=True)


ORDERS_ROLLUP_SQL = """
SELECT CAST(COALESCE(year(o_orderdate), -1) AS BIGINT) AS year,
       CAST(COALESCE(month(o_orderdate), -1) AS BIGINT) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders
GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
ORDER BY year, month
"""


# ---------------------------------------------------------------------------
# Grouped string aggregation (ordered concat per segment)
# ---------------------------------------------------------------------------

def segment_names_agg(sf_dir: str):
    """string_agg analog: per market segment, the comma-joined sorted
    list of its 5 lexicographically-first customer names (bounded output;
    per-group top-k then concat — the scalable form of string_agg)."""
    ds = rd.read_parquet(_pq(sf_dir, "customer"),
                         columns=["c_mktsegment", "c_name"])

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for seg, sub in g.groupby("c_mktsegment"):
            names = sorted(sub["c_name"])[:5]
            rows.append((seg, ",".join(names)))
        return pd.DataFrame(rows, columns=["c_mktsegment", "first_names"])

    return _coarse_str_partition_map(ds, "c_mktsegment", partial) \
        .sort("c_mktsegment")


SEGMENT_NAMES_SQL = """
SELECT c_mktsegment,
       array_to_string((array_agg(c_name ORDER BY c_name))[1:5], ',')
           AS first_names
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# RANK + NTILE windows: balance quartiles per market segment
# ---------------------------------------------------------------------------

NTILE_BUCKETS = 4


def customer_balance_ntile(sf_dir: str):
    """Per-segment balance RANK (competition ranking, ties share rank)
    and NTILE(4) quartile — the ranked-window family on top of the
    grouped-map shuffle. NTILE needs a total order per partition; at full
    scale the same result comes from a per-segment sort + broadcast of
    the 3 quantile boundaries instead of one giant ordered group (the
    segment count is bounded, so the grouped form is fine here)."""
    ds = rd.read_parquet(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def add_key(batch: pa.Table) -> pa.Table:
        bal = _round_half_away(
            batch["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0)
        return pa.Table.from_arrays(
            [batch["c_custkey"], batch["c_mktsegment"], pa.array(bal)],
            names=["c_custkey", "c_mktsegment", "bal_x100"])

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for seg, sub in g.groupby("c_mktsegment"):
            sub = sub.sort_values(["bal_x100", "c_custkey"],
                                  ascending=[False, True]).reset_index(drop=True)
            n = len(sub)
            bal = sub["bal_x100"].to_numpy()
            # competition rank over bal desc: 1 + #rows strictly greater
            uniq, idx = np.unique(-bal, return_index=True)   # sorted asc = bal desc
            rank = idx[np.searchsorted(uniq, -bal)] + 1
            # NTILE(k): first (n % k) buckets get ceil(n/k) rows
            k = NTILE_BUCKETS
            base, extra = divmod(n, k)
            sizes = np.full(k, base, dtype=np.int64)
            sizes[:extra] += 1
            quartile = np.repeat(np.arange(1, k + 1), sizes)[:n]
            outs.append(pd.DataFrame({
                "c_custkey": sub["c_custkey"].astype("int64"),
                "c_mktsegment": sub["c_mktsegment"],
                "bal_x100": bal,
                "bal_rank": rank,
                "bal_quartile": quartile}))
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()

    return _coarse_str_partition_map(
        ds.map_batches(add_key, batch_format="pyarrow", batch_size=None),
        "c_mktsegment", windows).sort("c_custkey")


NTILE_SQL = f"""
SELECT c_custkey, c_mktsegment,
       CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS bal_x100,
       CAST(RANK() OVER (PARTITION BY c_mktsegment
                         ORDER BY CAST(ROUND(c_acctbal * 100.0) AS BIGINT) DESC)
            AS BIGINT) AS bal_rank,
       CAST(NTILE({NTILE_BUCKETS}) OVER (
            PARTITION BY c_mktsegment
            ORDER BY CAST(ROUND(c_acctbal * 100.0) AS BIGINT) DESC, c_custkey)
            AS BIGINT) AS bal_quartile
FROM customer
ORDER BY c_custkey
"""


def events_value_cume_dist(sf_dir: str):
    """CUME_DIST + PERCENT_RANK of the event value within its type —
    the distribution-position windows completing the ranked family
    (RANK/NTILE above). Per-partition order statistics come from one
    sorted-values searchsorted per group (no per-row loop); the float
    results mirror the SQL engines' int->double division exactly.
    Output: (event_id, event_type, v_x100, cume_dist, percent_rank)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def add_key(batch: pa.Table) -> pa.Table:
        v = _cents(batch["value"])
        return pa.Table.from_arrays(
            [batch["event_id"], batch["event_type"], v],
            names=["event_id", "event_type", "v_x100"])

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for etype, sub in g.groupby("event_type"):
            v = sub["v_x100"].to_numpy()
            n = len(v)
            sv = np.sort(v)
            n_le = np.searchsorted(sv, v, side="right")   # rows <= v
            n_lt = np.searchsorted(sv, v, side="left")    # rows <  v
            cume = n_le.astype(np.float64) / float(n)
            prank = (np.zeros(n) if n == 1
                     else n_lt.astype(np.float64) / float(n - 1))
            outs.append(pd.DataFrame({
                "event_id": sub["event_id"].astype("int64"),
                "event_type": etype,
                "v_x100": v,
                "cume_dist": cume,
                "percent_rank": prank}))
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()

    return _coarse_str_partition_map(
        ds.map_batches(add_key, batch_format="pyarrow", batch_size=None),
        "event_type", windows).sort("event_id")


CUME_DIST_SQL = """
SELECT event_id, event_type,
       CAST(ROUND(value * 100.0) AS BIGINT) AS v_x100,
       CUME_DIST() OVER (PARTITION BY event_type
                         ORDER BY CAST(ROUND(value * 100.0) AS BIGINT))
           AS cume_dist,
       PERCENT_RANK() OVER (PARTITION BY event_type
                            ORDER BY CAST(ROUND(value * 100.0) AS BIGINT))
           AS percent_rank
FROM events
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Frame-based moving window: trailing 3-order revenue per customer
# ---------------------------------------------------------------------------

MOVING_FRAME = 3


def orders_moving_window(sf_dir: str):
    """Per-customer trailing-3-order revenue sum (ROWS BETWEEN 2
    PRECEDING AND CURRENT ROW) in (orderdate, orderkey) order — the
    frame-based window tier next to the unbounded running totals.
    Exact int64 frame sums via cumsum difference (no float rolling)."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderkey", "o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def moving(g: pd.DataFrame) -> pd.DataFrame:
        # whole-partition vectorized: the trailing frame is the sum of
        # MOVING_FRAME-1 grouped shifts plus the row itself (exact int64)
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        cents = pd.Series(_round_half_away(
            g["o_totalprice"].to_numpy() * 100.0), index=g.index)
        grp = cents.groupby(g["o_custkey"].to_numpy())
        win = cents.copy()
        for s in range(1, MOVING_FRAME):
            win = win + grp.shift(s, fill_value=0)
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].astype("int64"),
            "o_custkey": g["o_custkey"].astype("int64"),
            "total_x100": cents,
            "trailing3_x100": win})

    return _coarse_partition_map(ds, "o_custkey", moving).sort("o_orderkey")


MOVING_SQL = f"""
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS total_x100,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN {MOVING_FRAME - 1} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS trailing3_x100
FROM orders
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# RANGE-interval window frame: trailing 30 days by time, per customer
# ---------------------------------------------------------------------------

TRAILING_DAYS = 30


def orders_trailing_30d(sf_dir: str):
    """Per-customer trailing-30-DAY order count and revenue sum — the
    RANGE-frame window (RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND
    CURRENT ROW): the frame is bounded by TIME, not row count, and all
    peer rows sharing a date get the identical frame value. One
    customer-keyed coarse exchange; inside each partition the frame
    collapses to per-(customer, day) cumulative sums probed by a
    single vectorized backward ``merge_asof`` at day-31 (frame sum =
    cum(d) - cum(last day <= d-31)) — no per-row rescan. Exact int64
    throughout. Output: (o_orderkey, n_30d, sum_30d_x100)."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderkey", "o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def trailing(g: pd.DataFrame) -> pd.DataFrame:
        day = g["o_orderdate"].to_numpy("datetime64[us]") \
            .astype("datetime64[D]").astype(np.int64)
        cents = _round_half_away(g["o_totalprice"].to_numpy() * 100.0)
        rows = pd.DataFrame({"cust": g["o_custkey"].to_numpy(np.int64),
                             "day": day, "cents": cents,
                             "okey": g["o_orderkey"].to_numpy(np.int64)})
        per = rows.groupby(["cust", "day"], as_index=False) \
            .agg(cnt=("cents", "size"), cents=("cents", "sum")) \
            .sort_values(["cust", "day"], kind="stable")
        gb = per.groupby("cust")
        per["cum_n"] = gb["cnt"].cumsum()
        per["cum_c"] = gb["cents"].cumsum()
        probe = per[["cust", "day", "cum_n", "cum_c"]].copy()
        probe["probe"] = probe["day"] - (TRAILING_DAYS + 1)
        right = per[["cust", "day", "cum_n", "cum_c"]].rename(
            columns={"cum_n": "bn", "cum_c": "bc"})
        m = pd.merge_asof(probe.sort_values("probe", kind="stable"),
                          right.sort_values("day", kind="stable"),
                          left_on="probe", right_on="day", by="cust",
                          direction="backward", suffixes=("", "_b"))
        m["n_30d"] = m["cum_n"] - m["bn"].fillna(0).astype("int64")
        m["sum_30d_x100"] = m["cum_c"] - m["bc"].fillna(0).astype("int64")
        out = rows.merge(m[["cust", "day", "n_30d", "sum_30d_x100"]],
                         on=["cust", "day"], how="left")
        return pd.DataFrame({
            "o_orderkey": out["okey"].astype("int64"),
            "n_30d": out["n_30d"].astype("int64"),
            "sum_30d_x100": out["sum_30d_x100"].astype("int64")})

    return _coarse_partition_map(ds, "o_custkey", trailing) \
        .sort("o_orderkey")


TRAILING_30D_SQL = f"""
SELECT o_orderkey,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_30d,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) OVER w
            AS BIGINT) AS sum_30d_x100
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL {TRAILING_DAYS} DAYS PRECEDING
             AND CURRENT ROW)
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# LEFT OUTER join: customer counts per nation, zero-preserving
# ---------------------------------------------------------------------------

def nation_customer_counts_left(sf_dir: str):
    """Customers per nation with nations that have NO customers kept at
    zero (LEFT OUTER semantics) — distributed as: fact-side partial
    counts -> tiny keyed aggregate -> broadcast onto the dimension table
    with a 0 default. The outer side never shuffles."""
    counts = (rd.read_parquet(_pq(sf_dir, "customer"),
                              columns=["c_nationkey"])
              .map_batches(lambda b: _from_pandas(
                  pd.DataFrame({"c_nationkey": b["c_nationkey"]
                                .to_numpy(zero_copy_only=False)})
                  .groupby("c_nationkey", as_index=False).size()
                  .rename(columns={"size": "n"})),
                  batch_format="pyarrow", batch_size=None)
              .groupby("c_nationkey")
              .aggregate(Sum("n", alias_name="n")).to_pandas())
    if "c_nationkey" not in counts.columns:   # empty input loses schema
        counts = pd.DataFrame({"c_nationkey": [], "n": []})
    cmap_ref = ray.put(dict(zip(counts["c_nationkey"], counts["n"])))

    nations = rd.read_parquet(_pq(sf_dir, "nation"),
                              columns=["n_nationkey", "n_name", "n_regionkey"])
    regions = pd.read_parquet(_pq(sf_dir, "region"),
                              columns=["r_regionkey", "r_name"])
    rmap_ref = ray.put(dict(zip(regions["r_regionkey"], regions["r_name"])))

    def attach(batch: pa.Table) -> pa.Table:
        cmap, rmap = ray.get(cmap_ref), ray.get(rmap_ref)
        nk = batch["n_nationkey"].to_numpy(zero_copy_only=False)
        rk = batch["n_regionkey"].to_numpy(zero_copy_only=False)
        # region is an INNER side (matches the oracle): a nation whose
        # region is missing — e.g. an empty region shard — drops out
        keep = np.array([k in rmap for k in rk], dtype=bool)
        t = batch.filter(pa.array(keep))
        return pa.Table.from_arrays(
            [t["n_name"],
             pa.array([rmap[k] for k in rk[keep]], type=pa.string()),
             pa.array([int(cmap.get(k, 0))
                       for k in nk[keep]], type=pa.int64())],
            names=["n_name", "r_name", "n_customers"])

    return nations.map_batches(attach, batch_format="pyarrow", batch_size=None).sort("n_name")


LEFT_JOIN_SQL = """
SELECT n_name, r_name, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS n_customers
FROM nation
JOIN region ON n_regionkey = r_regionkey
LEFT JOIN (SELECT c_nationkey, COUNT(*) AS cnt
           FROM customer GROUP BY c_nationkey) c
  ON n_nationkey = c.c_nationkey
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# CUBE: all grouping-set margins over (status, priority)
# ---------------------------------------------------------------------------

def orders_cube(sf_dir: str):
    """GROUP BY CUBE (o_orderstatus, o_orderpriority): one full-resolution
    distributed aggregation, all three margin levels derived from that
    tiny result driver-side (never a second scan). Sentinel 'ALL' marks
    rolled-up dimensions (hash-stable, no NULL keys)."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderstatus": batch["o_orderstatus"].to_numpy(zero_copy_only=False),
            "o_orderpriority": batch["o_orderpriority"].to_numpy(zero_copy_only=False),
            "revenue_cents": _round_half_away(
                batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0),
            "n_orders": 1})
        return _from_pandas(
            df.groupby(["o_orderstatus", "o_orderpriority"], as_index=False)
            .sum())

    full = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(["o_orderstatus", "o_orderpriority"])
            .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                       Sum("n_orders", alias_name="n_orders"))
            .to_pandas())            # tiny: |status| x |priority| rows
    if "o_orderstatus" not in full.columns:   # empty input loses schema
        full = pd.DataFrame({"o_orderstatus": pd.Series(dtype="object"),
                             "o_orderpriority": pd.Series(dtype="object"),
                             "revenue_cents": pd.Series(dtype="int64"),
                             "n_orders": pd.Series(dtype="int64")})

    def margin(df, keys):
        m = df.groupby(keys, as_index=False)[
            ["revenue_cents", "n_orders"]].sum() if keys else \
            pd.DataFrame({"revenue_cents": [df["revenue_cents"].sum()],
                          "n_orders": [df["n_orders"].sum()]})
        for c in ("o_orderstatus", "o_orderpriority"):
            if c not in m.columns:
                m[c] = "ALL"
        return m

    out = pd.concat([full, margin(full, ["o_orderstatus"]),
                     margin(full, ["o_orderpriority"]), margin(full, [])],
                    ignore_index=True)
    out = out[["o_orderstatus", "o_orderpriority", "revenue_cents",
               "n_orders"]].astype({"revenue_cents": "int64",
                                    "n_orders": "int64"})
    return out.sort_values(["o_orderstatus", "o_orderpriority"]) \
        .reset_index(drop=True)


CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
"""


# ---------------------------------------------------------------------------
# Exact second-moment components per group (covariance/correlation blocks)
# ---------------------------------------------------------------------------

def part_brand_price_stats(sf_dir: str):
    """Per-brand exact integer moment components for size-vs-price
    covariance/correlation: n, sum(size), sum(size^2), sum(price_x100),
    sum(price_x100^2), sum(size*price_x100). All int64-exact under any
    summation order, so corr/covar derive bit-stably downstream."""
    ds = rd.read_parquet(_pq(sf_dir, "part"),
                         columns=["p_brand", "p_size", "p_retailprice"])

    def partial(batch: pa.Table) -> pa.Table:
        size = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = _round_half_away(
            batch["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0)
        df = pd.DataFrame({
            "p_brand": batch["p_brand"].to_numpy(zero_copy_only=False),
            "n": 1, "sum_size": size, "sum_size_sq": size * size,
            "sum_price_x100": price, "sum_price_sq_x10000": price * price,
            "sum_size_price_x100": size * price})
        return _from_pandas(df.groupby("p_brand", as_index=False).sum())

    cols = ["n", "sum_size", "sum_size_sq", "sum_price_x100",
            "sum_price_sq_x10000", "sum_size_price_x100"]
    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("p_brand")
            .aggregate(*[Sum(c, alias_name=c) for c in cols])
            .sort("p_brand"))


PRICE_STATS_SQL = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_size,
       CAST(SUM(CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT)) AS BIGINT)
           AS sum_size_sq,
       CAST(SUM(CAST(ROUND(p_retailprice * 100.0) AS BIGINT)) AS BIGINT)
           AS sum_price_x100,
       CAST(SUM(CAST(ROUND(p_retailprice * 100.0) AS BIGINT)
              * CAST(ROUND(p_retailprice * 100.0) AS BIGINT)) AS BIGINT)
           AS sum_price_sq_x10000,
       CAST(SUM(CAST(p_size AS BIGINT)
              * CAST(ROUND(p_retailprice * 100.0) AS BIGINT)) AS BIGINT)
           AS sum_size_price_x100
FROM part
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Bloom-pruned semi-join (exact result, sketch-accelerated)
# ---------------------------------------------------------------------------

BLOOM_SEGMENT = "AUTOMOBILE"


def orders_bloom_semi_count(sf_dir: str):
    """Order count + revenue for one customer segment, computed as a
    Bloom-filter-pruned semi-join: the build side ships a 16 KiB filter
    of segment customer keys; probe batches drop non-members BEFORE the
    exact verify, so at scale only ~(selectivity + FPR) of probe rows
    ever touch the exact key structure. The exact verify keeps the
    result deterministic (oracle-equal) — the sketch only prunes."""
    from ..functions import sketch as S

    cust = pd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    keys = np.sort(cust.loc[cust.c_mktsegment == BLOOM_SEGMENT,
                            "c_custkey"].to_numpy())
    bf = S.bloom_create()
    S.bloom_add_hashes(bf, pd.util.hash_array(keys))
    bf_ref = ray.put(bf)
    keys_ref = ray.put(keys)

    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        bfl, exact = ray.get(bf_ref), ray.get(keys_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        maybe = S.bloom_contains_hashes(bfl, pd.util.hash_array(ck))
        t = batch.filter(pa.array(maybe))
        ck = ck[maybe]
        if len(exact) and len(ck):          # exact verify on survivors only
            pos = np.searchsorted(exact, ck)
            ok = (pos < len(exact)) & \
                (exact[np.minimum(pos, len(exact) - 1)] == ck)
        else:
            ok = np.zeros(len(ck), dtype=bool)
        t = t.filter(pa.array(ok))
        cents = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "n_orders": [np.int64(len(t))],
            "total_x100": [np.int64(cents.sum())]})

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("total_x100", alias_name="total_x100")))
    return pd.DataFrame([{"n_orders": np.int64(agg["n_orders"] or 0),
                          "total_x100": np.int64(agg["total_x100"] or 0)}])


BLOOM_SEMI_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS total_x100
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{BLOOM_SEGMENT}'
"""


# ---------------------------------------------------------------------------
# Salted aggregation for pathological key skew
# ---------------------------------------------------------------------------

SALT_FANOUT = 16


def events_type_salted_agg(sf_dir: str):
    """Value totals per event_type via SALTED two-phase aggregation:
    phase 1 groups on (event_type, salt) — splitting each hot key across
    SALT_FANOUT reducers — and phase 2 combines the per-salt partials.
    With only ~5 event types, a plain groupby would route the whole
    table through 5 reducers; salting bounds any single reducer's share
    at 1/SALT_FANOUT of a key. Result is identical to the unsalted
    groupby (oracled) because the aggregate is commutative."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        salt = (batch["event_id"].to_numpy(zero_copy_only=False)
                % SALT_FANOUT).astype(np.int64)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            "salt": salt,
            "value_x1e6": _round_half_away(
                batch["value"].to_numpy(zero_copy_only=False) * 1e6),
            "n": 1})
        return _from_pandas(
            df.groupby(["event_type", "salt"], as_index=False).sum())

    salted = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
              .groupby(["event_type", "salt"])
              .aggregate(Sum("value_x1e6", alias_name="value_x1e6"),
                         Sum("n", alias_name="n")))

    def unsalt(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            "value_x1e6": batch["value_x1e6"].to_numpy(zero_copy_only=False),
            "n": batch["n"].to_numpy(zero_copy_only=False)})
        return _from_pandas(
            df.groupby("event_type", as_index=False).sum().astype(
                {"value_x1e6": "int64", "n": "int64"}))

    # phase 2: |types| x SALT_FANOUT partial rows -> tiny final groupby
    return (salted.map_batches(unsalt, batch_format="pyarrow", batch_size=None)
            .groupby("event_type")
            .aggregate(Sum("value_x1e6", alias_name="value_x1e6"),
                       Sum("n", alias_name="n"))
            .sort("event_type"))


SALTED_AGG_SQL = """
SELECT event_type,
       CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS BIGINT)
           AS value_x1e6,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Exact per-group percentiles (discrete order statistics)
# ---------------------------------------------------------------------------

PCTL_QS = (0.25, 0.5, 0.9, 0.99)


def events_value_percentiles(sf_dir: str):
    """Exact p25/p50/p90/p99 of event value per event_type — discrete
    order statistics (DuckDB quantile_disc: 1-based element
    ceil(q*n) of the sorted values). Grouped map over the bounded type
    key; at unbounded group sizes the same numbers come from a
    per-key distributed sort + offset lookup, or a t-digest when
    approximate is acceptable."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "value"])

    def add_key(batch: pa.Table) -> pa.Table:
        v = _round_half_away(
            batch["value"].to_numpy(zero_copy_only=False) * 1e6)
        return pa.Table.from_arrays(
            [batch["event_type"], pa.array(v)],
            names=["event_type", "value_x1e6"])

    def pctl(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, sub in g.groupby("event_type"):
            v = np.sort(sub["value_x1e6"].to_numpy())
            n = len(v)
            row = {"event_type": et}
            for q in PCTL_QS:
                idx = int(np.ceil(q * n)) - 1
                row[f"p{int(q * 100)}_x1e6"] = np.int64(v[max(idx, 0)])
            rows.append(row)
        return pd.DataFrame(rows)

    return _coarse_str_partition_map(
        ds.map_batches(add_key, batch_format="pyarrow", batch_size=None),
        "event_type", pctl).sort("event_type")


PCTL_SQL = """
SELECT event_type,
       CAST(quantile_disc(CAST(ROUND(value * 1000000.0) AS BIGINT), 0.25)
            AS BIGINT) AS p25_x1e6,
       CAST(quantile_disc(CAST(ROUND(value * 1000000.0) AS BIGINT), 0.5)
            AS BIGINT) AS p50_x1e6,
       CAST(quantile_disc(CAST(ROUND(value * 1000000.0) AS BIGINT), 0.9)
            AS BIGINT) AS p90_x1e6,
       CAST(quantile_disc(CAST(ROUND(value * 1000000.0) AS BIGINT), 0.99)
            AS BIGINT) AS p99_x1e6
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q3 at full scale: bucket-partitioned hash joins, no broadcast side
# ---------------------------------------------------------------------------

# a worker can comfortably hold ~5M keyed build-side rows (low hundreds
# of MB once broadcast); past that the partitioned plan wins
BROADCAST_ROW_LIMIT = 5_000_000


def _table_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet footers only — the planner's size probe."""
    import pyarrow.dataset as pads
    return pads.dataset(_pq(sf_dir, table)).count_rows()


def q3_auto(sf_dir: str):
    """Size-aware plan selection — the decision a 100-TB deployment must
    make automatically rather than by code edit: probe ONLY the parquet
    footers of the build sides, then run the broadcast plan
    (``q3_top_orders``) while orders/customer fit a worker's heap, or
    the fully hash-partitioned plan (``q3_partitioned_join``) once they
    don't. Same oracle either way — identical result, different plan."""
    build_rows = max(_table_rows(sf_dir, "orders"),
                     _table_rows(sf_dir, "customer"))
    if build_rows <= BROADCAST_ROW_LIMIT:
        return q3_top_orders(sf_dir)
    return q3_partitioned_join(sf_dir)


def q3_partitioned_join(sf_dir: str):
    """The documented at-scale fallback for q3_top_orders, implemented:
    when orders/customer stop being broadcastable, BOTH joins run as
    native hash-partitioned exchanges (customer-filter ⨝ orders on
    custkey, then ⨝ per-batch lineitem revenue partials on orderkey).
    Nothing is read driver-side and no ``ray.put`` of a table exists in
    this path. Same oracle as q3 — identical result, different plan."""
    if _table_empty(sf_dir, "orders") or _table_empty(sf_dir, "customer"):
        return pd.DataFrame({"o_orderkey": pd.Series(dtype="int64"),
                             "revenue_x1e4": pd.Series(dtype="int64"),
                             "o_orderdate": pd.Series(dtype="object")})
    cust = (rd.read_parquet(_pq(sf_dir, "customer"),
                            columns=["c_custkey", "c_mktsegment"])
            .map_batches(lambda b: b.filter(
                pc.equal(b["c_mktsegment"], Q3_SEGMENT))
                .select(["c_custkey"]).replace_schema_metadata(None),
                batch_format="pyarrow", batch_size=None))

    orders = (rd.read_parquet(_pq(sf_dir, "orders"),
                              columns=["o_orderkey", "o_custkey",
                                       "o_orderdate"])
              .map_batches(lambda b: pa.Table.from_arrays(
                  [b["o_orderkey"], b["o_custkey"],
                   pc.strftime(b["o_orderdate"], format="%Y-%m-%d")],
                  names=["o_orderkey", "o_custkey", "o_orderdate"]),
                  batch_format="pyarrow", batch_size=None))

    seg_orders = orders.join(cust, join_type="inner", num_partitions=16,
                             on=("o_custkey",), right_on=("c_custkey",)) \
        .select_columns(["o_orderkey", "o_orderdate"]) \
        .map_batches(lambda t: t.replace_schema_metadata(None),
                     batch_format="pyarrow", batch_size=None)

    def li_partial(batch: pa.Table) -> pa.Table:
        rev = _cents(pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"])), 1e4)
        df = pd.DataFrame({
            "l_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
            "revenue_x1e4": rev.to_numpy(zero_copy_only=False)})
        return _from_pandas(df.groupby("l_orderkey", as_index=False).sum())

    li = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount"]) \
        .map_batches(li_partial, batch_format="pyarrow", batch_size=None)

    # second exchange: co-partition BOTH sides on orderkey through the
    # sort-based coarse groupby (a second concurrent hash-join actor
    # pool can starve small clusters — two pools of aggregators exceed
    # the CPU budget and deadlock the streaming executor at 4 CPUs)
    def tag_orders(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch["o_orderkey"],
             pa.array(np.zeros(len(batch), dtype=np.int64)),
             batch["o_orderdate"]],
            names=["k", "revenue_x1e4", "o_orderdate"])

    def tag_li(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch["l_orderkey"], batch["revenue_x1e4"],
             pa.array([""] * len(batch), type=pa.string())],
            names=["k", "revenue_x1e4", "o_orderdate"])

    both = seg_orders.map_batches(tag_orders, batch_format="pyarrow", batch_size=None) \
        .union(li.map_batches(tag_li, batch_format="pyarrow", batch_size=None))

    def add_coarse(batch: pa.Table) -> pa.Table:
        c = batch["k"].to_numpy(zero_copy_only=False) % 64
        return batch.append_column("_coarse",
                                   pa.array(c.astype(np.int64))) \
            .replace_schema_metadata(None)

    def combine_partition(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized over the WHOLE coarse partition (one pandas groupby
        # per partition; a per-orderkey callback costs a DataFrame
        # construction per key — measured 22 s vs 6 s at sf0.1)
        g = g.assign(is_order=(g["o_orderdate"] != "").astype("int64"))
        a = g.groupby("k").agg(
            revenue_x1e4=("revenue_x1e4", "sum"),
            n_rows=("revenue_x1e4", "size"),
            n_ord=("is_order", "sum"),
            o_orderdate=("o_orderdate", "max"))   # "" sorts below dates
        a = a[(a["n_ord"] > 0) & (a["n_rows"] > a["n_ord"])]  # inner join
        return pd.DataFrame({
            "o_orderkey": a.index.to_numpy(np.int64),
            "revenue_x1e4": a["revenue_x1e4"].to_numpy(np.int64),
            "o_orderdate": a["o_orderdate"].to_numpy()})

    agg = (_pre_coalesce(both, "auto")
           .map_batches(add_coarse, batch_format="pyarrow", batch_size=None)
           .groupby("_coarse")
           .map_groups(lambda g: combine_partition(
               g.drop(columns=["_coarse"])), batch_format="pandas"))
    return agg.sort(["revenue_x1e4", "o_orderkey"],
                    descending=[True, False]).limit(Q3_TOPK) \
        .select_columns(["o_orderkey", "revenue_x1e4", "o_orderdate"])


# ---------------------------------------------------------------------------
# Cohort retention: distinct users per (first-seen week, week offset)
# ---------------------------------------------------------------------------

def _week_floor_days(days: np.ndarray) -> np.ndarray:
    """Monday-floor of days-since-epoch (1970-01-01 was a Thursday), the
    same bucketing as DuckDB date_trunc('week')."""
    return days - ((days + 3) % 7)


def events_cohort_retention(sf_dir: str):
    """Classic cohort table: users bucketed by first-activity week, the
    count still active at each week offset. One user-keyed exchange
    (each user's events co-locate; w0 and the distinct-week set are
    group-local), then a tiny (cohort, offset) count aggregate."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        # whole-partition vectorized: distinct (user, week) rows, then a
        # grouped min-transform for each user's cohort week
        days = g["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({"u": g["user_id"].to_numpy(np.int64),
                           "wk": _week_floor_days(days)}).drop_duplicates()
        w0 = df.groupby("u")["wk"].transform("min").to_numpy()
        return pd.DataFrame({
            "cohort_week": np.datetime64(0, "D") + w0,
            "week_offset": (df["wk"].to_numpy() - w0) // 7,
            "n_users": 1})

    partial = _coarse_partition_map(ds, "user_id", per_partition)

    def fmt(batch: pa.Table) -> pa.Table:
        cw = pc.strftime(pc.cast(batch["cohort_week"], pa.timestamp("us")),
                         format="%Y-%m-%d")
        return pa.Table.from_arrays(
            [cw, batch["week_offset"], batch["n_users"]],
            names=["cohort_week", "week_offset", "n_users"])

    return (partial.map_batches(fmt, batch_format="pyarrow", batch_size=None)
            .groupby(["cohort_week", "week_offset"])
            .aggregate(Sum("n_users", alias_name="n_users"))
            .sort(["cohort_week", "week_offset"]))


COHORT_SQL = """
WITH f AS (SELECT user_id, MIN(date_trunc('week', ts)) AS w0
           FROM events GROUP BY user_id),
w AS (SELECT DISTINCT e.user_id, date_trunc('week', e.ts) AS wk, f.w0
      FROM events e JOIN f ON e.user_id = f.user_id)
SELECT strftime(w0, '%Y-%m-%d') AS cohort_week,
       CAST((epoch(wk) - epoch(w0)) // (7 * 86400) AS BIGINT)
           AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM w
GROUP BY w0, week_offset
ORDER BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
# Sliding windows: 60-min windows advancing every 15 min
# ---------------------------------------------------------------------------

SLIDE_WINDOW_US = 3_600_000_000
SLIDE_STEP_US = 900_000_000
_SLIDE_FANOUT = SLIDE_WINDOW_US // SLIDE_STEP_US     # windows per event


def events_sliding_windows(sf_dir: str):
    """Sliding-window aggregate (60-min window, 15-min slide): each
    event fans out to its WINDOW/STEP member windows inside the batch
    (a flat-map, no state), then partial sums per window shuffle to a
    tiny keyed reduce. The streaming-actor tier (events_stream_windows)
    covers the stateful tumbling form; this is the overlap form."""
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["ts", "value"])

    def fanout(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        base = (us // SLIDE_STEP_US) * SLIDE_STEP_US
        cents = _round_half_away(
            batch["value"].to_numpy(zero_copy_only=False) * 1e6)
        starts = (base[:, None]
                  - np.arange(_SLIDE_FANOUT, dtype=np.int64)[None, :]
                  * SLIDE_STEP_US).reshape(-1)
        vals = np.repeat(cents, _SLIDE_FANOUT)
        df = pd.DataFrame({"win_us": starts, "value_x1e6": vals, "n": 1})
        g = df.groupby("win_us", as_index=False).sum()
        return _from_pandas(g.astype("int64"))

    agg = (ds.map_batches(fanout, batch_format="pyarrow", batch_size=None)
           .groupby("win_us")
           .aggregate(Sum("value_x1e6", alias_name="value_x1e6"),
                      Sum("n", alias_name="n_events")))

    def fmt(batch: pa.Table) -> pa.Table:
        ts = pa.array(batch["win_us"].to_numpy(zero_copy_only=False)
                      .astype("datetime64[us]"))
        return pa.Table.from_arrays(
            [pc.strftime(ts, format="%Y-%m-%d %H:%M"),
             batch["value_x1e6"], batch["n_events"]],
            names=["window_start", "value_x1e6", "n_events"])

    return agg.map_batches(fmt, batch_format="pyarrow", batch_size=None).sort("window_start")


SLIDING_SQL = f"""
WITH e AS (SELECT epoch_us(ts) AS us,
                  CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
           FROM events),
w AS (SELECT (us // {SLIDE_STEP_US}) * {SLIDE_STEP_US}
             - unnest(range({_SLIDE_FANOUT})) * {SLIDE_STEP_US} AS win_us,
             v
      FROM e)
SELECT strftime(make_timestamp(win_us), '%Y-%m-%d %H:%M') AS window_start,
       CAST(SUM(v) AS BIGINT) AS value_x1e6,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM w
GROUP BY window_start
ORDER BY window_start
"""


def events_sliding_distinct(sf_dir: str):
    """Sliding-window COUNT DISTINCT users (60-min window, 15-min
    slide): events fan out to member windows and dedup to (window,
    user) inside the batch; the exchange moves only deduped pairs and
    the exact per-window nunique runs in a coarse win-keyed grouped
    map. The honest exact cost — the KMV twin below replaces the pair
    exchange with k-minima sketches."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["ts", "user_id"])

    def fanout(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        base = (us // SLIDE_STEP_US) * SLIDE_STEP_US
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = (base[:, None]
                  - np.arange(_SLIDE_FANOUT, dtype=np.int64)[None, :]
                  * SLIDE_STEP_US).reshape(-1)
        df = pd.DataFrame({"win_us": starts,
                           "user_id": np.repeat(uid, _SLIDE_FANOUT)}) \
            .drop_duplicates()
        return _from_pandas(df)

    pairs = ds.map_batches(fanout, batch_format="pyarrow",
                           batch_size=None)

    def nuniq(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "win_us": [np.int64(g["win_us"].iloc[0])],
            "n_users": [np.int64(g["user_id"].nunique())]})

    agg = _coarse_grouped_map(pairs, "win_us", nuniq)

    def fmt(batch: pa.Table) -> pa.Table:
        ts = pa.array(batch["win_us"].to_numpy(zero_copy_only=False)
                      .astype("datetime64[us]"))
        return pa.Table.from_arrays(
            [pc.strftime(ts, format="%Y-%m-%d %H:%M"),
             batch["n_users"]],
            names=["window_start", "n_users"])

    return agg.map_batches(fmt, batch_format="pyarrow",
                           batch_size=None).sort("window_start")


SLIDING_DISTINCT_SQL = f"""
WITH e AS (SELECT epoch_us(ts) AS us, user_id FROM events),
w AS (SELECT (us // {SLIDE_STEP_US}) * {SLIDE_STEP_US}
             - unnest(range({_SLIDE_FANOUT})) * {SLIDE_STEP_US} AS win_us,
             user_id
      FROM e)
SELECT strftime(make_timestamp(win_us), '%Y-%m-%d %H:%M')
           AS window_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM w
GROUP BY window_start
ORDER BY window_start
"""


def events_sliding_distinct_kmv(sf_dir: str):
    """The mergeable-sketch form of the sliding distinct count: one
    KMV bottom-k sketch per (window, batch) row through a win-keyed
    merge — no (window, user) pair ever crosses the exchange (the
    100-TB shape for windowed cardinality; sketches also merge across
    adjacent window PARTIALS, which is how a streaming deployment
    would maintain them).

    ORACLED form (round-5, same pattern as the other sketch ops): each
    window's estimate is checked against the exact twin — EXACT
    equality while the merged sketch is below k, a 10% band past it —
    and ships as ``within_bound`` beside the exact count the SQL
    oracle recomputes. Output: (window_start, n_users, within_bound)."""
    from ..functions import sketch as S

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["ts", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        base = (us // SLIDE_STEP_US) * SLIDE_STEP_US
        wins = (base[:, None]
                - np.arange(_SLIDE_FANOUT, dtype=np.int64)[None, :]
                * SLIDE_STEP_US).reshape(-1)
        h = np.repeat(pd.util.hash_array(uid), _SLIDE_FANOUT)
        order = np.argsort(wins, kind="stable")
        w_s, h_s = wins[order], h[order]
        bounds = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1], True])
        out_w, out_s = [], []
        for a, b in zip(bounds[:-1], bounds[1:]):
            out_w.append(w_s[a])
            out_s.append(S.kmv_from_hashes(h_s[a:b]).tobytes())
        return pa.Table.from_arrays(
            [pa.array(np.array(out_w, dtype=np.int64)),
             pa.array(out_s, pa.binary())],
            names=["win_us", "sketch"])

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions import sketch as S2
        sk = np.empty(0, dtype=np.uint64)
        for b in g["sketch"]:
            sk = S2.kmv_merge(sk, np.frombuffer(b, dtype=np.uint64))
        return pd.DataFrame({
            "win_us": [np.int64(g["win_us"].iloc[0])],
            "approx_users": [np.int64(S2.kmv_distinct(sk))],
            "sk_full": [np.int64(len(sk) >= S2.KMV_K)]})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("win_us")
           .map_groups(merge_group, batch_format="pandas"))

    def fmt(batch: pa.Table) -> pa.Table:
        ts = pa.array(batch["win_us"].to_numpy(zero_copy_only=False)
                      .astype("datetime64[us]"))
        return pa.Table.from_arrays(
            [pc.strftime(ts, format="%Y-%m-%d %H:%M"),
             batch["approx_users"], batch["sk_full"]],
            names=["window_start", "approx_users", "sk_full"])

    approx = agg.map_batches(fmt, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    if approx.empty or "window_start" not in approx.columns:
        return pd.DataFrame({"window_start": pd.Series(dtype="object"),
                             "n_users": pd.Series(dtype="int64"),
                             "within_bound": pd.Series(dtype="int64")})
    exact = events_sliding_distinct(sf_dir)
    exact = exact if isinstance(exact, pd.DataFrame) \
        else exact.to_pandas()
    m = approx.merge(exact, on="window_start", how="outer").fillna(0)
    est = m["approx_users"].to_numpy(np.int64)
    n = m["n_users"].to_numpy(np.int64)
    full = m["sk_full"].to_numpy(np.int64).astype(bool)
    m["within_bound"] = np.where(
        full, np.abs(est - n) <= 0.10 * np.maximum(n, 1),
        est == n).astype(np.int64)
    return m[["window_start", "n_users", "within_bound"]] \
        .astype({"n_users": "int64"}) \
        .sort_values("window_start").reset_index(drop=True)


SLIDING_DISTINCT_KMV_SQL = f"""
WITH e AS (SELECT epoch_us(ts) AS us, user_id FROM events),
w AS (SELECT (us // {SLIDE_STEP_US}) * {SLIDE_STEP_US}
             - unnest(range({_SLIDE_FANOUT})) * {SLIDE_STEP_US} AS win_us,
             user_id
      FROM e)
SELECT strftime(make_timestamp(win_us), '%Y-%m-%d %H:%M')
           AS window_start,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(1 AS BIGINT) AS within_bound
FROM w
GROUP BY window_start
ORDER BY window_start
"""


# ---------------------------------------------------------------------------
# Range (interval) join: events within 7 days after the same user's order
# ---------------------------------------------------------------------------

RANGE_JOIN_DAYS = 7
_RANGE_US = RANGE_JOIN_DAYS * 86_400_000_000


def orders_events_range_join(sf_dir: str):
    """Range join — Ray Data has no interval-join primitive, so both
    sides co-partition on (user, week-bucket) through one side-tagged
    union exchange, and the interval predicate evaluates vectorized
    inside each partition (user+bucket equality merge + range filter).
    The TIME AXIS IS PART OF THE KEY: orders key on their own week,
    events replicate into their week and the PRIOR week (a 7-day range
    spans at most two buckets), so a hot user's pair product is capped
    by events-per-two-weeks instead of events-per-user — the guard the
    round-1 design only documented. Events ship <= 2x; each order lives
    in exactly one partition, so counts need no re-aggregation."""
    def _ukey(uid: np.ndarray, bucket: np.ndarray) -> pa.Array:
        """One packed int64 exchange key from (user, week-bucket), so
        the shared _coarse_grouped_map_union helper does the exchange."""
        m = ((uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             ^ (bucket.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)))
        return pa.array(m.view(np.int64))

    def tag_orders(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["o_orderdate"], pa.timestamp("us"))
        us = t.to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        uid = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = us // _RANGE_US
        return pa.Table.from_arrays(
            [_ukey(uid, w), pa.array(uid), pa.array(w),
             pa.array(np.zeros(len(batch), dtype=np.int8)),
             batch["o_orderkey"], t],
            names=["key", "user_id", "bucket", "side", "okey", "t"])

    def tag_events(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch["ts"], pa.timestamp("us"))
        us = t.to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        w = us // _RANGE_US
        n = len(batch)
        uid = np.repeat(batch["user_id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64), 2)
        wb = np.column_stack([w, w - 1]).reshape(-1)
        return pa.Table.from_arrays(
            [_ukey(uid, wb), pa.array(uid), pa.array(wb),
             pa.array(np.ones(2 * n, dtype=np.int8)),
             pa.array(np.full(2 * n, -1, dtype=np.int64)),
             pa.array(np.repeat(us, 2).view("datetime64[us]"))],
            names=["key", "user_id", "bucket", "side", "okey", "t"])

    orders = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"]) \
        .map_batches(tag_orders, batch_format="pyarrow", batch_size=None)
    events = rd.read_parquet(_pq(sf_dir, "events"),
                             columns=["user_id", "ts"]) \
        .map_batches(tag_events, batch_format="pyarrow", batch_size=None)

    def range_part(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["side"] == 0]
        if od.empty:
            return pd.DataFrame({"o_orderkey": pd.Series([], dtype="int64"),
                                 "n_events": pd.Series([], dtype="int64")})
        ev = g[g["side"] == 1][["user_id", "bucket", "t"]]
        pairs = od[["user_id", "bucket", "okey", "t"]].merge(
            ev, on=["user_id", "bucket"], suffixes=("_o", "_e"))
        t_o = pairs["t_o"].to_numpy().astype("datetime64[us]").astype(np.int64)
        t_e = pairs["t_e"].to_numpy().astype("datetime64[us]").astype(np.int64)
        pairs = pairs[(t_e >= t_o) & (t_e < t_o + _RANGE_US)]
        cnt = pairs.groupby("okey").size()
        out = pd.DataFrame({
            "o_orderkey": od["okey"].to_numpy(np.int64),
            "n_events": cnt.reindex(od["okey"].to_numpy(),
                                    fill_value=0).to_numpy(np.int64)})
        return out

    return _coarse_grouped_map_union(orders, events, range_part) \
        .sort("o_orderkey")


RANGE_JOIN_SQL = f"""
SELECT o_orderkey, CAST(COUNT(e.ts) AS BIGINT) AS n_events
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL {RANGE_JOIN_DAYS} DAY
GROUP BY o_orderkey
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# FULL OUTER join summary (completes the join-type matrix)
# ---------------------------------------------------------------------------

FULL_OUTER_MIN_BAL = 5000.0


def customers_orders_full_outer(sf_dir: str):
    """FULL OUTER join of orders against the high-balance customer
    subset, summarized as match-status counts (matched / customer-only /
    order-only) so the result stays bounded. Distributed as two
    independent passes sharing one broadcast key set — the outer-join
    bookkeeping reduces to a semi-count on each side, so neither table
    shuffles."""
    cust = pd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_acctbal"])
    keys = np.sort(cust.loc[cust.c_acctbal >= FULL_OUTER_MIN_BAL,
                            "c_custkey"].to_numpy())
    keys_ref = ray.put(keys)

    def order_partial(batch: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        if len(k):
            pos = np.searchsorted(k, ck)
            hit = (pos < len(k)) & (k[np.minimum(pos, len(k) - 1)] == ck)
        else:
            hit = np.zeros(len(ck), dtype=bool)
        return pa.Table.from_pydict({
            "n_matched": [np.int64(hit.sum())],
            "n_order_only": [np.int64((~hit).sum())]})

    orders = rd.read_parquet(_pq(sf_dir, "orders"), columns=["o_custkey"])
    agg = (orders.map_batches(order_partial, batch_format="pyarrow", batch_size=None)
           .aggregate(Sum("n_matched", alias_name="n_matched"),
                      Sum("n_order_only", alias_name="n_order_only")))

    # customer-only = high-balance customers with NO orders: semi-count
    # of the key set against the distinct order custkeys
    def cust_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.Table.from_pydict({"o_custkey": u.astype(np.int64)})

    ordered = (orders.map_batches(cust_partial, batch_format="pyarrow", batch_size=None)
               .groupby("o_custkey").aggregate(Count(alias_name="_n"))
               .to_pandas())
    have_orders = set(ordered["o_custkey"]) \
        if "o_custkey" in ordered.columns else set()
    n_cust_only = int(np.sum(~np.isin(keys, list(have_orders))))

    return pd.DataFrame([{
        "n_matched": np.int64(agg["n_matched"] or 0),
        "n_customer_only": np.int64(n_cust_only),
        "n_order_only": np.int64(agg["n_order_only"] or 0)}])


FULL_OUTER_SQL = f"""
WITH hc AS (SELECT c_custkey FROM customer
            WHERE c_acctbal >= {FULL_OUTER_MIN_BAL})
SELECT CAST(COUNT(*) FILTER (o.o_orderkey IS NOT NULL
                             AND hc.c_custkey IS NOT NULL) AS BIGINT)
           AS n_matched,
       CAST(COUNT(DISTINCT hc.c_custkey)
                FILTER (o.o_orderkey IS NULL) AS BIGINT) AS n_customer_only,
       CAST(COUNT(*) FILTER (hc.c_custkey IS NULL) AS BIGINT)
           AS n_order_only
FROM hc FULL OUTER JOIN orders o ON hc.c_custkey = o.o_custkey
"""


# ---------------------------------------------------------------------------
# Semi-structured (JSON) field extraction + aggregate
# ---------------------------------------------------------------------------

_PROPS_K_RE = r'"k"\s*:\s*(?P<k>-?\d+)'


PROPS_KEY_RE = r'"([A-Za-z_][A-Za-z0-9_]*)"\s*:'


def events_props_keys(sf_dir: str):
    """Semi-structured schema discovery: frequency of every key-looking
    token in the JSON ``props`` column — the profile that tells you
    which fields exist before you write extraction rules. One
    vectorized RE2 extract-all pass (quoted identifier followed by a
    colon, nested keys included — identical RE2 on both engines, so
    malformed JSON contributes the same tokens); per-batch key-count
    partials reach one tiny key-domain groupby.
    Output: (key, n_occurrences)."""
    empty = pd.DataFrame({"key": pd.Series(dtype="object"),
                          "n_occurrences": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["props"])

    def partial(batch: pa.Table) -> pa.Table:
        import re
        rx = re.compile(PROPS_KEY_RE)
        counts: dict[str, int] = {}
        for s in batch["props"].to_pylist():
            if s is None:
                continue
            for k in rx.findall(s):
                counts[k] = counts.get(k, 0) + 1
        if not counts:
            return pa.Table.from_pydict(
                {"key": pa.array([], pa.string()),
                 "n_occurrences": pa.array([], pa.int64())})
        return pa.Table.from_pydict(
            {"key": list(counts), "n_occurrences": list(counts.values())})

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("key")
           .aggregate(Sum("n_occurrences", alias_name="n_occurrences"))
           .to_pandas())
    if out.empty:
        return empty
    return out.sort_values("key").reset_index(drop=True) \
        .astype({"n_occurrences": "int64"})


PROPS_KEYS_SQL = rf"""
WITH ks AS (
  SELECT unnest(regexp_extract_all(props,
                '{PROPS_KEY_RE.replace("'", "''")}', 1)) AS key
  FROM events WHERE props IS NOT NULL)
SELECT key, COUNT(*) AS n_occurrences
FROM ks GROUP BY key ORDER BY key
"""


def events_props_ksum(sf_dir: str):
    """Semi-structured column handling: extract the integer field ``k``
    from the JSON ``props`` string and aggregate it per event type.
    Extraction is one vectorized RE2 pass (Arrow ``extract_regex``);
    the oracle uses DuckDB's identical-RE2 ``regexp_extract``, so
    malformed/missing entries null out the same way on both engines
    (a real JSON parser would slot into the same batch fn). Per-batch
    partials -> one tiny groupby over |event types| keys."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["props"], _PROPS_K_RE)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(
                zero_copy_only=False),
            "has_k": pc.is_valid(k).to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "k": pc.fill_null(k, 0).to_numpy(zero_copy_only=False)})
        g = df.groupby("event_type", as_index=False).sum()
        return _from_pandas(g.rename(columns={"has_k": "n_with_k",
                                              "k": "sum_k"}))

    out = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=None) \
        .groupby("event_type") \
        .aggregate(Sum("n_with_k", alias_name="n_with_k"),
                   Sum("sum_k", alias_name="sum_k")).to_pandas()
    if out.empty or "event_type" not in out.columns:
        return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                             "n_with_k": pd.Series(dtype="int64"),
                             "sum_k": pd.Series(dtype="int64")})
    return out.sort_values("event_type").reset_index(drop=True) \
        .astype({"n_with_k": "int64", "sum_k": "int64"})


PROPS_KSUM_SQL = r"""
SELECT event_type,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k
FROM (SELECT event_type,
             TRY_CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1)
                      AS BIGINT) AS k
      FROM events) t
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Time-series gap fill (resample with zero-filled missing cells)
# ---------------------------------------------------------------------------


def events_hourly_gapfill(sf_dir: str):
    """Hourly event counts per type with missing (hour, type) cells
    filled with 0 over the global [min_hour, max_hour] span — the
    resample/densify op every time-series pipeline needs before window
    math. The wide work is the same partial-counts aggregate as
    ``events_hourly`` (shuffle moves one row per (hour,type) per
    block); the dense grid is OUTPUT-sized (|hours| x |types|), so
    densification legitimately runs on the collected result."""
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "hour": pd.Series(dtype="object"),
                          "n": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.strftime(batch["ts"], format="%Y-%m-%d %H")
        df = pd.DataFrame({"hour": hour.to_pandas(),
                           "event_type": batch["event_type"].to_pandas()})
        g = df.groupby(["hour", "event_type"], as_index=False).size() \
              .rename(columns={"size": "n"})
        return _from_pandas(g)

    counts = ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None) \
        .groupby(["hour", "event_type"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    if counts.empty:
        return empty
    # the hour format sorts lexicographically == chronologically
    h0 = pd.to_datetime(counts["hour"].min(), format="%Y-%m-%d %H")
    h1 = pd.to_datetime(counts["hour"].max(), format="%Y-%m-%d %H")
    hours = pd.date_range(h0, h1, freq="h").strftime("%Y-%m-%d %H")
    types = sorted(counts["event_type"].unique())
    grid = pd.MultiIndex.from_product(
        [types, hours], names=["event_type", "hour"]).to_frame(index=False)
    out = grid.merge(counts, on=["event_type", "hour"], how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


GAPFILL_SQL = """
WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
                  date_trunc('hour', MAX(ts)) AS h1 FROM events),
hours AS (SELECT strftime(unnest(generate_series(h0, h1,
                                                 INTERVAL 1 HOUR)),
                          '%Y-%m-%d %H') AS hour FROM b),
types AS (SELECT DISTINCT event_type FROM events),
c AS (SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2)
SELECT t.event_type, h.hour, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
FROM hours h CROSS JOIN types t
LEFT JOIN c ON c.hour = h.hour AND c.event_type = t.event_type
ORDER BY t.event_type, h.hour
"""


# ---------------------------------------------------------------------------
# Set ops over high-cardinality keys: INTERSECT / EXCEPT DISTINCT
# ---------------------------------------------------------------------------


def _order_custkey_sides(sf_dir: str) -> pd.DataFrame:
    """Per-custkey presence flags for 'F'- and 'O'-status orders.
    Per-batch distinct partials (one row per custkey per block), one
    keyed exchange combining flags with Max — set membership never
    ships raw rows."""
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderstatus"])

    def partial(batch: pa.Table) -> pa.Table:
        st = batch["o_orderstatus"].to_numpy(zero_copy_only=False)
        keep = (st == "F") | (st == "O")
        df = pd.DataFrame({
            "o_custkey": batch["o_custkey"]
            .to_numpy(zero_copy_only=False)[keep],
            "in_f": (st[keep] == "F").astype(np.int64),
            "in_o": (st[keep] == "O").astype(np.int64)})
        return _from_pandas(df.groupby("o_custkey", as_index=False).max())

    from ray.data.aggregate import Max
    return ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("o_custkey") \
        .aggregate(Max("in_f", alias_name="in_f"),
                   Max("in_o", alias_name="in_o")).to_pandas()


def _custkey_setop(sf_dir: str, keep_mask_fn) -> pd.DataFrame:
    empty = pd.DataFrame({"o_custkey": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "orders"):
        return empty
    sides = _order_custkey_sides(sf_dir)
    if sides.empty or "o_custkey" not in sides.columns:
        return empty
    out = sides[keep_mask_fn(sides)][["o_custkey"]]
    return out.sort_values("o_custkey").reset_index(drop=True) \
        .astype({"o_custkey": "int64"})


def order_custkeys_intersect(sf_dir: str):
    """INTERSECT DISTINCT (D4 set-op completion): customers with BOTH
    an 'F'-status and an 'O'-status order."""
    return _custkey_setop(
        sf_dir, lambda s: (s["in_f"] == 1) & (s["in_o"] == 1))


def order_custkeys_except(sf_dir: str):
    """EXCEPT DISTINCT: customers with an 'F'-status order but no
    'O'-status order."""
    return _custkey_setop(
        sf_dir, lambda s: (s["in_f"] == 1) & (s["in_o"] == 0))


CUSTKEY_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_custkey
"""

CUSTKEY_EXCEPT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_custkey
"""


# ---------------------------------------------------------------------------
# Per-user activity histogram (data-distribution profiling)
# ---------------------------------------------------------------------------


def events_user_diversity(sf_dir: str):
    """Per-user behavioral diversity as the Gini-Simpson index over
    event types: D = 1 - sum n_i*(n_i-1) / (N*(N-1)) — an exact
    RATIONAL (no log, unlike Shannon entropy), emitted as a x1e9 floor
    division so no float enters the compare. One grouped exchange of
    (user, type) count partials; the per-user fold runs on the
    user x type grid (output-shaped). Single-event users carry the
    -1 sentinel (diversity undefined at N < 2).
    Output: (user_id, n_events, n_types, simpson_x1e9)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("user_id", "n_events", "n_types",
                           "simpson_x1e9")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "event_type": batch["event_type"]
            .to_numpy(zero_copy_only=False)})
        return _from_pandas(df.groupby(["user_id", "event_type"],
                                       as_index=False)
                            .size().rename(columns={"size": "n"}))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "event_type"], as_index=False)["n"] \
            .sum()
        n = g["n"].to_numpy(np.int64)
        agg = pd.DataFrame({
            "user_id": g["user_id"],
            "n_events": n,
            "n_types": np.ones(len(g), dtype=np.int64),
            "same": n * (n - 1)}).groupby("user_id", as_index=False).sum()
        ne = agg["n_events"].to_numpy(np.int64)
        same = agg.pop("same").to_numpy(np.int64)
        # python ints: denom * 1e9 overflows int64 past ~100k events
        # per user (the oracle's HUGEINT path has the same headroom)
        agg["simpson_x1e9"] = [
            ((n * (n - 1) - s) * 1_000_000_000 // (n * (n - 1)))
            if n > 1 else -1
            for n, s in zip(ne.tolist(), same.tolist())]
        return agg.astype("int64")

    return _coarse_partition_map(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "user_id", fold).sort("user_id")


USER_DIVERSITY_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id, event_type),
u AS (
  SELECT user_id, SUM(n) AS ne, COUNT(*) AS nt,
         SUM(n * (n - 1)) AS same
  FROM c GROUP BY user_id)
SELECT user_id, CAST(ne AS BIGINT) AS n_events,
       CAST(nt AS BIGINT) AS n_types,
       CAST(CASE WHEN ne > 1
                 THEN (ne * (ne - 1) - same) * 1000000000
                      // (ne * (ne - 1))
                 ELSE -1 END AS BIGINT) AS simpson_x1e9
FROM u
ORDER BY user_id
"""


def events_key_skew_profile(sf_dir: str):
    """Key-skew summary of the user_id distribution — the diagnostic an
    engine runs before choosing a partitioning key: key count, event
    count, the hottest key's count, and the exact Gini coefficient of
    per-key counts as an integer floor division (x1e9). Per-user counts
    are one keyed exchange over partials; they compact to a
    (count -> n_keys) histogram (output-shaped) whose driver-side scan
    computes the rank-weighted Gini numerator in exact Python ints —
    the rank formula sum_i (2i-n-1)*c_i over ascending counts is
    tie-invariant, so histogram multiplicities replace per-key ranks
    exactly. Output: (n_keys, n_events, max_count, gini_x1e9)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("n_keys", "n_events", "max_count",
                           "gini_x1e9")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": batch["user_id"]
                           .to_numpy(zero_copy_only=False)})
        return _from_pandas(df.groupby("user_id", as_index=False)
                            .size().rename(columns={"size": "n"}))

    def to_hist(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"cnt": n}).groupby("cnt", as_index=False) \
            .size().rename(columns={"size": "m"})
        return _from_pandas(df.astype("int64"))

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby("user_id").aggregate(Sum("n", alias_name="n"))
            .map_batches(to_hist, batch_format="pyarrow", batch_size=None)
            .groupby("cnt").aggregate(Sum("m", alias_name="m"))
            .to_pandas())
    if hist.empty:
        return empty
    hist = hist.sort_values("cnt")
    cnts = hist["cnt"].astype("int64").tolist()
    ms = hist["m"].astype("int64").tolist()
    n_keys = sum(ms)
    n_events = sum(c * m for c, m in zip(cnts, ms))
    num = 0
    r = 1                                     # next 1-based rank
    for c, m in zip(cnts, ms):
        # ranks r .. r+m-1 all carry value c:
        # sum(2i - n - 1) = 2*(m*r + m*(m-1)/2) - m*(n_keys + 1)
        num += c * (2 * (m * r + m * (m - 1) // 2) - m * (n_keys + 1))
        r += m
    gini = num * 1_000_000_000 // (n_keys * n_events)
    return pd.DataFrame({"n_keys": [n_keys], "n_events": [n_events],
                         "max_count": [cnts[-1]], "gini_x1e9": [gini]})


KEY_SKEW_SQL = """
WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt) AS i,
             COUNT(*) OVER () AS n, SUM(cnt) OVER () AS s
      FROM c),
g AS (SELECT SUM(CAST((2 * i - n - 1) * cnt AS HUGEINT)) AS num,
             MAX(n) AS n, MAX(s) AS s, MAX(cnt) AS mx
      FROM r)
SELECT CAST(n AS BIGINT) AS n_keys, CAST(s AS BIGINT) AS n_events,
       CAST(mx AS BIGINT) AS max_count,
       CAST(num * 1000000000 // (CAST(n AS HUGEINT) * s) AS BIGINT)
           AS gini_x1e9
FROM g
"""


def events_user_activity_hist(sf_dir: str):
    """Log2-bucket histogram of per-user event counts — the skew
    profile you compute before choosing partitioning keys. Two-level
    aggregate: per-user counts (keyed exchange over partial counts),
    then a tiny bucket groupby over the |users|-sized intermediate.
    Buckets are exact on both engines: log2 of a power of two is exact
    in IEEE doubles, and every other count sits >= 1/(n ln 2) away
    from an integer boundary — far beyond 1-ulp libm divergence."""
    empty = pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                          "n_users": pd.Series(dtype="int64"),
                          "n_events": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": batch["user_id"]
                           .to_numpy(zero_copy_only=False)})
        return _from_pandas(df.groupby("user_id", as_index=False)
                            .size().rename(columns={"size": "n"}))

    per_user = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None) \
        .groupby("user_id").aggregate(Sum("n", alias_name="n"))

    def bucketize(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "bucket": np.floor(np.log2(n)).astype(np.int64),
            "n_users": np.ones(len(n), dtype=np.int64),
            "n_events": n})
        return _from_pandas(df.groupby("bucket", as_index=False).sum())

    out = per_user.map_batches(bucketize, batch_format="pyarrow",
                               batch_size=None) \
        .groupby("bucket") \
        .aggregate(Sum("n_users", alias_name="n_users"),
                   Sum("n_events", alias_name="n_events")).to_pandas()
    if out.empty or "bucket" not in out.columns:
        return empty
    return out.sort_values("bucket").reset_index(drop=True) \
        .astype({"bucket": "int64", "n_users": "int64",
                 "n_events": "int64"})


ACTIVITY_HIST_SQL = """
SELECT CAST(FLOOR(LOG2(n)) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id) t
GROUP BY bucket ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Join-size: exact (oracled) + Count-Sketch estimate (the planner input)
# ---------------------------------------------------------------------------


def orders_lineitem_join_size(sf_dir: str):
    """Exact join cardinality |orders JOIN lineitem ON orderkey| — the
    number a planner needs before choosing broadcast vs partitioned.
    Per-side per-batch key-count partials, ONE co-partitioned union
    exchange, per-partition product-sum."""
    empty = pd.DataFrame({"join_size": pd.Series([0], dtype="int64")})
    if _table_empty(sf_dir, "orders") or _table_empty(sf_dir, "lineitem"):
        return empty

    def counts(table: str, key: str, side: int):
        def partial(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({"key": batch[key]
                               .to_numpy(zero_copy_only=False)}) \
                .groupby("key", as_index=False).size() \
                .rename(columns={"size": "n"})
            df["side"] = np.int8(side)
            return _from_pandas(df[["key", "side", "n"]]
                                .astype({"key": "int64", "n": "int64"}))
        return rd.read_parquet(_pq(sf_dir, table), columns=[key]) \
            .map_batches(partial, batch_format="pyarrow", batch_size=None)

    def product_sum(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 1].groupby("key")["n"].sum()
        l_ = g[g["side"] == 0].groupby("key")["n"].sum()
        both = o.index.intersection(l_.index)
        return pd.DataFrame({"join_size": [np.int64(
            (o.loc[both] * l_.loc[both]).sum())]})

    parts = _coarse_grouped_map_union(
        counts("lineitem", "l_orderkey", 0),
        counts("orders", "o_orderkey", 1), product_sum).to_pandas()
    if parts.empty or "join_size" not in parts.columns:
        return empty
    return pd.DataFrame({"join_size":
                         pd.Series([int(parts["join_size"].sum())],
                                   dtype="int64")})


JOIN_SIZE_SQL = """
SELECT CAST(COALESCE(SUM(n_o * n_l), 0) AS BIGINT) AS join_size
FROM (SELECT o_orderkey AS key, COUNT(*) AS n_o
      FROM orders GROUP BY 1) o
JOIN (SELECT l_orderkey AS key, COUNT(*) AS n_l
      FROM lineitem GROUP BY 1) l USING (key)
"""


# Two-round multiplicative key-sample hash:
#   h(k) = (((k * 48271) % M) * 69621) % M,  M = 2^31 - 1.
# One round is NOT enough: 48271*k < M for k < 44485, so small
# consecutive keys never wrap and the "sample" is a prefix. The second
# round's effective multiplier (48271*69621 mod M ~ 1.21e9) wraps on
# every increment, equidistributing consecutive keys (Weyl). Headroom:
# round 1 is safe for keys < ~1.9e14, round 2's operand is < M — the
# SAME int64 arithmetic runs in numpy and in the oracle SQL.
SAMPLE_HASH_MUL = 48271
SAMPLE_HASH_MUL2 = 69621
SAMPLE_HASH_MOD = 2147483647
SAMPLE_RATE_INV = 16         # keep keys with h(k) < MOD // 16


def join_size_estimate_sampled(sf_dir: str):
    """SAMPLING-based join cardinality estimate — the planner probe
    that reads only 1/{SAMPLE_RATE_INV} of the key space: both sides
    keep a key iff the DETERMINISTIC Lehmer hash of the join key falls
    under MOD/{SAMPLE_RATE_INV} (correlated key sampling — both sides
    keep the SAME keys, so the sampled join is a true join of the
    sampled key universe), the exact join size of the sample computes
    through one co-partitioned exchange, and the estimate scales by
    {SAMPLE_RATE_INV}. Unlike Bernoulli row sampling, key sampling is
    unbiased for foreign-key joins. The filter pushes into the scan
    batches so unsampled keys never leave the read stage. Output:
    (sampled_keys, sampled_pairs, est_join_size)."""
    empty = pd.DataFrame({c: pd.Series([0], dtype="int64") for c in
                          ("sampled_keys", "sampled_pairs",
                           "est_join_size")})
    if _table_empty(sf_dir, "orders") or _table_empty(sf_dir, "lineitem"):
        return empty
    thr = SAMPLE_HASH_MOD // SAMPLE_RATE_INV

    def counts(table: str, key: str, side: int):
        def partial(batch: pa.Table) -> pa.Table:
            k = batch[key].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            h = ((k * SAMPLE_HASH_MUL) % SAMPLE_HASH_MOD
                 * SAMPLE_HASH_MUL2) % SAMPLE_HASH_MOD
            k = k[h < thr]
            df = pd.DataFrame({"key": k}) \
                .groupby("key", as_index=False).size() \
                .rename(columns={"size": "n"})
            df["side"] = np.int8(side)
            return _from_pandas(df[["key", "side", "n"]]
                                .astype({"key": "int64", "n": "int64"}))
        return rd.read_parquet(_pq(sf_dir, table), columns=[key]) \
            .map_batches(partial, batch_format="pyarrow", batch_size=None)

    def product_sum(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 1].groupby("key")["n"].sum()
        l_ = g[g["side"] == 0].groupby("key")["n"].sum()
        both = o.index.intersection(l_.index)
        return pd.DataFrame({
            "sampled_keys": [np.int64(len(both))],
            "sampled_pairs": [np.int64(
                (o.loc[both] * l_.loc[both]).sum())]})

    parts = _coarse_grouped_map_union(
        counts("lineitem", "l_orderkey", 0),
        counts("orders", "o_orderkey", 1), product_sum).to_pandas()
    if parts.empty or "sampled_pairs" not in parts.columns:
        return empty
    pairs = int(parts["sampled_pairs"].sum())
    return pd.DataFrame({
        "sampled_keys": pd.Series([int(parts["sampled_keys"].sum())],
                                  dtype="int64"),
        "sampled_pairs": pd.Series([pairs], dtype="int64"),
        "est_join_size": pd.Series([pairs * SAMPLE_RATE_INV],
                                   dtype="int64")})


JOIN_SIZE_SAMPLED_SQL = f"""
WITH o AS (
  SELECT o_orderkey AS key, COUNT(*) AS n_o FROM orders
  WHERE ((o_orderkey * {SAMPLE_HASH_MUL}) % {SAMPLE_HASH_MOD}
         * {SAMPLE_HASH_MUL2}) % {SAMPLE_HASH_MOD}
        < {SAMPLE_HASH_MOD // SAMPLE_RATE_INV}
  GROUP BY 1),
l AS (
  SELECT l_orderkey AS key, COUNT(*) AS n_l FROM lineitem
  WHERE ((l_orderkey * {SAMPLE_HASH_MUL}) % {SAMPLE_HASH_MOD}
         * {SAMPLE_HASH_MUL2}) % {SAMPLE_HASH_MOD}
        < {SAMPLE_HASH_MOD // SAMPLE_RATE_INV}
  GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS sampled_keys,
       CAST(COALESCE(SUM(n_o * n_l), 0) AS BIGINT) AS sampled_pairs,
       CAST(COALESCE(SUM(n_o * n_l), 0) * {SAMPLE_RATE_INV} AS BIGINT)
           AS est_join_size
FROM o JOIN l USING (key)
"""


def customers_all_priorities(sf_dir: str):
    """RELATIONAL DIVISION (the FOR ALL join): customers whose order
    history spans EVERY order priority present in the table —
    orders / priorities. Shape: one distinct (custkey, priority)
    exchange with per-batch pre-distinct, per-partition distinct-count,
    then a filter against the GLOBAL priority count (a tiny broadcast
    aggregate, never a join). Output: (o_custkey, n_orders) for
    qualifying customers."""
    empty = pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                          "n_orders": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "orders"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderpriority"])

    def pre(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cust": batch["o_custkey"].to_numpy(zero_copy_only=False),
            "prio": batch["o_orderpriority"].to_pandas()})
        g = df.groupby(["cust", "prio"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return _from_pandas(g.astype({"cust": "int64", "n": "int64"}))

    # global distinct priority count: tiny, from the same partials
    pre_ds = ds.map_batches(pre, batch_format="pyarrow",
                            batch_size=None)

    def prio_partial(batch: pa.Table) -> pa.Table:
        u = pd.unique(batch["prio"].to_pandas())
        return pa.Table.from_pydict({"prio": u})

    n_prio = len(pre_ds.map_batches(prio_partial,
                                    batch_format="pyarrow",
                                    batch_size=None)
                 .to_pandas()["prio"].unique())

    def divide(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("cust").agg(k=("prio", "nunique"),
                                    n_orders=("n", "sum"))
        out = agg[agg["k"] == n_prio].reset_index()
        return out[["cust", "n_orders"]] \
            .rename(columns={"cust": "o_custkey"}).astype("int64")

    return _coarse_partition_map(pre_ds, "cust", divide).sort("o_custkey")


DIVISION_SQL = """
WITH np AS (SELECT COUNT(DISTINCT o_orderpriority) AS k FROM orders)
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(DISTINCT o_orderpriority) = (SELECT k FROM np)
ORDER BY o_custkey
"""


def join_size_estimate_cms(sf_dir: str):
    """Sketch-based join-size estimate (fast-AGMS / Count-Sketch inner
    product, cf. the sketches-based join-estimation literature): each
    side builds mergeable signed key sketches per batch (5x16384 int64,
    640 KiB), the estimate is the median per-row dot product — NO key
    exchange at all, the shape a planner uses to probe a join it can't
    afford to run.

    ORACLED form (round-5): the estimate is distilled into a
    ``within_bound`` flag against the exact join size (same kernel as
    ``orders_lineitem_join_size``); the SQL oracle recomputes the exact
    side and asserts the bound as TRUE, so a broken sketch fails the
    value hash. Output: (join_size, w, d, within_bound)."""
    from ..functions import sketch as S

    empty = pd.DataFrame({"join_size": pd.Series([0], dtype="int64"),
                          "w": pd.Series([S.CS_W], dtype="int64"),
                          "d": pd.Series([S.CS_D], dtype="int64"),
                          "within_bound": pd.Series([1], dtype="int64")})
    if _table_empty(sf_dir, "orders") or _table_empty(sf_dir, "lineitem"):
        return empty

    def sketch_side(table: str, key: str) -> np.ndarray:
        def partial(batch: pa.Table) -> pa.Table:
            sk = S.cs_create()
            keys = batch[key].to_numpy(zero_copy_only=False)
            S.cs_add_hashes(sk, pd.util.hash_array(keys))
            return pa.Table.from_arrays(
                [pa.array([sk.tobytes()], pa.binary())], names=["sk"])

        merged = S.cs_create()
        ds = rd.read_parquet(_pq(sf_dir, table), columns=[key]) \
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            for raw in b["sk"].to_pylist():
                merged = S.cs_merge(
                    merged, np.frombuffer(raw, dtype=np.int64)
                    .reshape(S.CS_D, S.CS_W))
        return merged

    a = sketch_side("orders", "o_orderkey")
    b = sketch_side("lineitem", "l_orderkey")
    est = int(S.cs_inner(a, b))
    exact_df = orders_lineitem_join_size(sf_dir)
    exact_df = exact_df if isinstance(exact_df, pd.DataFrame) \
        else exact_df.to_pandas()
    exact = int(exact_df["join_size"].iloc[0])
    ok = abs(est - exact) <= CMS_REL_BOUND * max(exact, 1)
    return pd.DataFrame({"join_size": pd.Series([exact], dtype="int64"),
                         "w": pd.Series([S.CS_W], dtype="int64"),
                         "d": pd.Series([S.CS_D], dtype="int64"),
                         "within_bound":
                         pd.Series([int(ok)], dtype="int64")})


JOIN_SIZE_CMS_SQL = """
SELECT CAST(COALESCE(SUM(n_o * n_l), 0) AS BIGINT) AS join_size,
       CAST(16384 AS BIGINT) AS w, CAST(5 AS BIGINT) AS d,
       CAST(1 AS BIGINT) AS within_bound
FROM (SELECT o_orderkey AS key, COUNT(*) AS n_o
      FROM orders GROUP BY 1) o
JOIN (SELECT l_orderkey AS key, COUNT(*) AS n_l
      FROM lineitem GROUP BY 1) l USING (key)
"""


# ---------------------------------------------------------------------------
# Catalog probe: per-table row counts from parquet footers only
# ---------------------------------------------------------------------------

_CATALOG_TABLES = ("region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents",
                   "embeddings")


def table_stats(sf_dir: str):
    """Catalog statistics: row count per table, read from parquet
    FOOTERS only (zero data bytes scanned — the probe the q3/q10/q13
    planners run before choosing a join plan, exposed as a query so
    the driver hash-checks it against real COUNT(*)s)."""
    return pd.DataFrame({
        "table_name": list(_CATALOG_TABLES),
        "n_rows": pd.Series([_table_rows(sf_dir, t)
                             for t in _CATALOG_TABLES], dtype="int64")}) \
        .sort_values("table_name").reset_index(drop=True)


TABLE_STATS_SQL = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows "
    f"FROM {t}" for t in _CATALOG_TABLES) + "\nORDER BY table_name"


# ---------------------------------------------------------------------------
# Robust outlier profile: per-type median + MAD + 3-MAD outlier count
# ---------------------------------------------------------------------------


def events_type_robust_outliers(sf_dir: str):
    """Robust anomaly profile per event type: discrete median, MAD
    (median absolute deviation, also discrete), and the count of
    values deviating more than 3*MAD from the median — the
    outlier-detection pass a data-quality pipeline runs before
    training-set admission. All math is integer (x1e6 values, integer
    MAD compare), so both engines agree bit-exactly. Grouped map over
    the bounded type key, same shape as ``events_value_percentiles``;
    at unbounded group sizes the same numbers come from two per-key
    distributed order statistics."""
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "med_x1e6": pd.Series(dtype="int64"),
                          "mad_x1e6": pd.Series(dtype="int64"),
                          "n_outliers": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "value"])

    def add_key(batch: pa.Table) -> pa.Table:
        v = _round_half_away(
            batch["value"].to_numpy(zero_copy_only=False) * 1e6)
        return pa.Table.from_arrays(
            [batch["event_type"], pa.array(v)],
            names=["event_type", "value_x1e6"])

    def robust(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, sub in g.groupby("event_type"):
            v = np.sort(sub["value_x1e6"].to_numpy())
            n = len(v)
            med = v[max(int(np.ceil(0.5 * n)) - 1, 0)]
            dev = np.sort(np.abs(v - med))
            mad = dev[max(int(np.ceil(0.5 * n)) - 1, 0)]
            rows.append({"event_type": et,
                         "med_x1e6": np.int64(med),
                         "mad_x1e6": np.int64(mad),
                         "n_outliers": np.int64((dev > 3 * mad).sum())})
        return pd.DataFrame(rows)

    out = _coarse_str_partition_map(
        ds.map_batches(add_key, batch_format="pyarrow", batch_size=None),
        "event_type", robust).to_pandas()
    if out.empty or "event_type" not in out.columns:
        return empty
    return out.sort_values("event_type").reset_index(drop=True) \
        .astype({"med_x1e6": "int64", "mad_x1e6": "int64",
                 "n_outliers": "int64"})


ROBUST_OUTLIERS_SQL = """
WITH s AS (SELECT event_type,
                  CAST(ROUND(value * 1000000.0) AS BIGINT) AS v
           FROM events),
m AS (SELECT event_type, quantile_disc(v, 0.5) AS med
      FROM s GROUP BY event_type),
d AS (SELECT s.event_type, ABS(s.v - m.med) AS dev, m.med
      FROM s JOIN m USING (event_type)),
md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
       FROM d GROUP BY event_type)
SELECT d.event_type,
       CAST(MAX(d.med) AS BIGINT) AS med_x1e6,
       CAST(MAX(md.mad) AS BIGINT) AS mad_x1e6,
       CAST(SUM(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM d JOIN md USING (event_type)
GROUP BY d.event_type ORDER BY d.event_type
"""


# ---------------------------------------------------------------------------
# User-acquisition curve: new + cumulative unique users per day
# ---------------------------------------------------------------------------


def events_new_users_daily(sf_dir: str):
    """First-appearance day per user -> new-user counts per day -> the
    cumulative unique-user curve. Distinct-over-time is a classic
    distributed trap (a naive COUNT(DISTINCT) per day rescans history);
    the scale-honest form is two partial-aggregated exchanges — (user,
    min_day) then (day, n) — with the running sum over the |days|-sized
    collected result."""
    empty = pd.DataFrame({"day": pd.Series(dtype="object"),
                          "new_users": pd.Series(dtype="int64"),
                          "cum_users": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    from ray.data.aggregate import Min
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["ts", "user_id"])

    def first_seen(batch: pa.Table) -> pa.Table:
        # INTEGER epoch-days through the exchange: min over int days
        # == min over ISO strings (lexicographic == chronological),
        # and per-row strftime string building was this op's dominant
        # cost at sweep scale; the ~|days| strings materialize once at
        # the end
        day = (pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                       pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "day": day})
        return _from_pandas(df.groupby("user_id", as_index=False).min())

    first = ds.map_batches(first_seen, batch_format="pyarrow",
                           batch_size=None) \
        .groupby("user_id").aggregate(Min("day", alias_name="day"))

    def day_counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"day": batch["day"]
                           .to_numpy(zero_copy_only=False)})
        return _from_pandas(df.groupby("day", as_index=False).size()
                            .rename(columns={"size": "new_users"}))

    out = first.map_batches(day_counts, batch_format="pyarrow",
                            batch_size=None) \
        .groupby("day") \
        .aggregate(Sum("new_users", alias_name="new_users")).to_pandas()
    if out.empty or "day" not in out.columns:
        return empty
    out = out.sort_values("day").reset_index(drop=True)
    out["day"] = np.array(out["day"].to_numpy(np.int64),
                          dtype="datetime64[D]").astype(str)
    out["new_users"] = out["new_users"].astype("int64")
    out["cum_users"] = out["new_users"].cumsum().astype("int64")
    return out


NEW_USERS_SQL = """
WITH f AS (SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS day
           FROM events GROUP BY user_id),
d AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY day)
SELECT day, CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM d ORDER BY day
"""


# ---------------------------------------------------------------------------
# HLL time series: approx cumulative distinct users per day
# ---------------------------------------------------------------------------


def events_cum_users_approx(sf_dir: str):
    """Approximate cumulative-unique-users curve: one HLL(p=12) sketch
    per (day, batch) flows to a |days|-sized merge, then PREFIX merges
    over the day-sorted sketches give every day's cumulative estimate
    from one pass — no (day, user) pair ever exchanges, and adding a
    day to the window is one 4 KiB merge (the streaming-dashboard shape
    for distinct-over-time).

    ORACLED form (round-5): every day's estimate is checked against the
    exact cumulative curve (forward-filled ``events_new_users_daily``)
    at the HLL_REL_BOUND band and ships as ``within_bound`` next
    to the exact count, which the SQL oracle recomputes with a window
    sum over first-seen days. Output: (day, cum_users, within_bound)."""
    from ..functions import sketch as S

    empty = pd.DataFrame({"day": pd.Series(dtype="object"),
                          "cum_users": pd.Series(dtype="int64"),
                          "within_bound": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["ts", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        # integer epoch-days through the exchange (same reasoning as
        # events_new_users_daily: per-row strftime dominates); the
        # |days| strings materialize once after the day-keyed merge
        days = (pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
                // 86_400_000_000)
        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        if len(days) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.binary())],
                names=["day", "sketch"])
        order = np.argsort(days, kind="stable")
        sd, si = days[order], pd.util.hash_array(ids[order])
        bounds = np.flatnonzero(np.r_[True, sd[1:] != sd[:-1], True])
        out_d, out_s = [], []
        for a, b in zip(bounds[:-1], bounds[1:]):
            reg = S.hll_create()
            S.hll_add_hashes(reg, si[a:b])
            out_d.append(int(sd[a]))
            out_s.append(reg.tobytes())
        return pa.Table.from_arrays(
            [pa.array(out_d, pa.int64()), pa.array(out_s, pa.binary())],
            names=["day", "sketch"])

    def merge_day(g: pd.DataFrame) -> pd.DataFrame:
        reg = S.hll_create()
        for sk in g["sketch"]:
            reg = S.hll_merge(reg, np.frombuffer(sk, dtype=np.uint8))
        return pd.DataFrame({"day": [g["day"].iloc[0]],
                             "sketch": [reg.tobytes()]})

    per_day = ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None) \
        .groupby("day").map_groups(merge_day, batch_format="pandas") \
        .to_pandas()
    if per_day.empty or "day" not in per_day.columns:
        return empty
    per_day = per_day.sort_values("day").reset_index(drop=True)
    per_day["day"] = np.array(per_day["day"].to_numpy(np.int64),
                              dtype="datetime64[D]").astype(str)
    # prefix merges over the |days|-sized collected result
    run = None
    cum = []
    for sk in per_day["sketch"]:
        sk = np.frombuffer(sk, dtype=np.uint8)
        run = sk.copy() if run is None else S.hll_merge(run, sk)
        cum.append(np.int64(S.hll_count(run)))
    out = pd.DataFrame({"day": per_day["day"].to_numpy(),
                        "est": pd.Series(cum, dtype="int64")})
    exact = events_new_users_daily(sf_dir)
    exact = exact if isinstance(exact, pd.DataFrame) else exact.to_pandas()
    # the exact curve lists only first-seen days; between them the
    # cumulative count is flat, so forward-fill onto every event day
    ff = exact.set_index("day")["cum_users"] \
        .reindex(out["day"].to_numpy()).ffill().fillna(0) \
        .astype("int64").to_numpy()
    est = out["est"].to_numpy(np.int64)
    out["cum_users"] = ff
    out["within_bound"] = (np.abs(est - ff)
                           <= HLL_REL_BOUND * np.maximum(ff, 1)) \
        .astype(np.int64)
    return out[["day", "cum_users", "within_bound"]]


CUM_USERS_SQL = """
WITH f AS (SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS day
           FROM events GROUP BY user_id),
nu AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY day),
days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events)
SELECT d.day,
       CAST(SUM(COALESCE(nu.n, 0)) OVER (ORDER BY d.day) AS BIGINT)
           AS cum_users,
       CAST(1 AS BIGINT) AS within_bound
FROM days d LEFT JOIN nu USING (day)
ORDER BY day
"""


# ---------------------------------------------------------------------------
# CDC latest-state compaction (upsert log -> current table)
# ---------------------------------------------------------------------------

def events_latest_state(sf_dir: str):
    """Change-log compaction: the event stream as an upsert log, reduced
    to each user's CURRENT state (latest event by ts, event_id as the
    tie-break — the Delta/Hudi merge-latest shape). Each batch first
    reduces to its own per-user latest, so the exchange moves at most
    one row per (user, batch); the per-partition merge picks the global
    latest. Oracled against the ROW_NUMBER()=1 window."""
    empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                          "last_ts": pd.Series(dtype="datetime64[us]"),
                          "last_event_type": pd.Series(dtype="object"),
                          "last_value_x1e6": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts", "event_id",
                                  "event_type", "value"])

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        return df.groupby("user_id", as_index=False).last()

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "ts": batch["ts"].to_numpy(zero_copy_only=False),
            "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
            "event_type": batch["event_type"]
            .to_numpy(zero_copy_only=False),
            "value_x1e6": _cents(batch["value"], 1e6)
            .to_numpy(zero_copy_only=False)})
        return _from_pandas(latest(df))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        m = latest(g)
        return pd.DataFrame({
            "user_id": m["user_id"].astype("int64"),
            "last_ts": m["ts"],
            "last_event_type": m["event_type"],
            "last_value_x1e6": m["value_x1e6"].astype("int64")})

    out = _coarse_partition_map(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None), "user_id", final)
    return out.sort("user_id")


LATEST_STATE_SQL = """
SELECT user_id, ts AS last_ts, event_type AS last_event_type,
       CAST(ROUND(value * 1000000.0) AS BIGINT) AS last_value_x1e6
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
WHERE rn = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Group-wise top-k (bounded partials, no exchange)
# ---------------------------------------------------------------------------

SEG_TOPK = 3


def segment_top_orders(sf_dir: str):
    """Top-3 orders per market segment by total price (ROW_NUMBER <= k
    per group): every batch keeps only its local top-3 per segment
    (group count is bounded, so partials are <= 3*|segments| rows per
    block), and the driver finishes on that bounded set — group-wise
    top-k never needs an exchange when the group domain is small."""
    empty = pd.DataFrame({"c_mktsegment": pd.Series(dtype="object"),
                          "o_orderkey": pd.Series(dtype="int64"),
                          "total_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "orders") or _table_empty(sf_dir, "customer"):
        return empty
    cust = pd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    order = np.argsort(cust["c_custkey"].to_numpy())
    ck = cust["c_custkey"].to_numpy()[order].astype(np.int64)
    seg = cust["c_mktsegment"].to_numpy()[order]
    ref = ray.put((ck, seg))

    def partial(batch: pa.Table) -> pa.Table:
        ck_s, seg_s = ray.get(ref)
        keys = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ck_s, keys), len(ck_s) - 1) \
            if len(ck_s) else np.zeros(len(keys), dtype=int)
        found = len(ck_s) > 0 and (ck_s[pos] == keys)
        df = pd.DataFrame({
            "c_mktsegment": seg_s[pos][found],
            "o_orderkey": batch["o_orderkey"]
            .to_numpy(zero_copy_only=False)[found],
            "total_x100": _cents(batch["o_totalprice"])
            .to_numpy(zero_copy_only=False)[found]})
        top = df.sort_values(["total_x100", "o_orderkey"],
                             ascending=[False, True]) \
            .groupby("c_mktsegment").head(SEG_TOPK)
        return _from_pandas(top)

    parts = rd.read_parquet(_pq(sf_dir, "orders"),
                            columns=["o_custkey", "o_orderkey",
                                     "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas()
    if parts.empty:
        return empty
    out = parts.sort_values(["total_x100", "o_orderkey"],
                            ascending=[False, True]) \
        .groupby("c_mktsegment").head(SEG_TOPK) \
        .sort_values(["c_mktsegment", "total_x100", "o_orderkey"],
                     ascending=[True, False, True]).reset_index(drop=True)
    return out.astype({"o_orderkey": "int64", "total_x100": "int64"})


SEG_TOPK_SQL = f"""
SELECT c_mktsegment, o_orderkey, total_x100 FROM (
  SELECT c_mktsegment, o_orderkey,
         CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS total_x100,
         ROW_NUMBER() OVER (
           PARTITION BY c_mktsegment
           ORDER BY CAST(ROUND(o_totalprice * 100.0) AS BIGINT) DESC,
                    o_orderkey) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey) t
WHERE rn <= {SEG_TOPK}
ORDER BY c_mktsegment, total_x100 DESC, o_orderkey
"""


# ---------------------------------------------------------------------------
# Approximate quantiles (mergeable DDSketch — bounded relative error)
# ---------------------------------------------------------------------------

DDS_QUANTILES = (0.5, 0.9, 0.99)


def events_value_quantiles_approx(sf_dir: str):
    """Approximate p50/p90/p99 of events.value by mergeable log-binned
    sketch (DDSketch shape): each batch emits one 32 KiB histogram, the
    driver streams and adds them (same shape as the HLL sketch), and
    any answer is within 1% relative error of exact — the scale path
    for quantiles over data too big to sort (the exact groupwise
    percentiles operator stays for oracled workloads).

    ORACLED form (round-5): the sketch answers are checked against the
    exact global order statistics (quantile_disc over the x1e6-quantized
    values, computed from a distributed (value, count) histogram
    exchange — value cardinality is micro-quantized so the histogram is
    groupby-sized) and ship as ``within_bound`` next to the exact
    values; the SQL oracle recomputes the exact side.
    Output: (quantile, value_x1e6, within_bound)."""
    from ..functions import sketch as S

    empty = pd.DataFrame({"quantile": pd.Series(dtype="float64"),
                          "value_x1e6": pd.Series(dtype="int64"),
                          "within_bound": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        sk = S.dds_create()
        S.dds_add(sk, v)
        # exact side: per-batch (value_x1e6, n) histogram partial
        u, c = np.unique(_round_half_away(v * 1e6), return_counts=True)
        return pa.Table.from_pydict({
            "sk": pa.array([sk.tobytes()] + [b""] * len(u), pa.binary()),
            "vx": pa.array(np.r_[0, u].astype(np.int64)),
            "n": pa.array(np.r_[0, c].astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    merged = S.dds_create()
    hist: dict[int, int] = {}
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        for raw, vx, n in zip(b["sk"].to_pylist(), b["vx"].to_pylist(),
                              b["n"].to_pylist()):
            if raw:
                merged = S.dds_merge(merged,
                                     np.frombuffer(raw, dtype=np.int64))
            else:
                hist[vx] = hist.get(vx, 0) + n
    vals = np.array(sorted(hist), dtype=np.int64)
    cum = np.cumsum([hist[v] for v in vals])
    n_total = int(cum[-1])
    rows = []
    for q in DDS_QUANTILES:
        rank = max(int(np.ceil(q * n_total)), 1)    # 1-based disc rank
        exact = int(vals[np.searchsorted(cum, rank)])
        est = S.dds_quantile(merged, q) * 1e6
        ok = abs(est - exact) <= DDS_REL_BOUND * max(abs(exact), 1)
        rows.append((q, exact, int(ok)))
    return pd.DataFrame(rows, columns=["quantile", "value_x1e6",
                                       "within_bound"]) \
        .astype({"quantile": "float64", "value_x1e6": "int64",
                 "within_bound": "int64"})


DDS_QUANTILES_SQL = """
WITH v AS (SELECT CAST(ROUND(value * 1000000.0) AS BIGINT) AS vx
           FROM events),
qs AS (
  SELECT CAST(0.5 AS DOUBLE) AS quantile,
         CAST(quantile_disc(vx, 0.5) AS BIGINT) AS value_x1e6,
         COUNT(vx) AS n FROM v
  UNION ALL
  SELECT CAST(0.9 AS DOUBLE),
         CAST(quantile_disc(vx, 0.9) AS BIGINT), COUNT(vx) FROM v
  UNION ALL
  SELECT CAST(0.99 AS DOUBLE),
         CAST(quantile_disc(vx, 0.99) AS BIGINT), COUNT(vx) FROM v)
SELECT quantile, value_x1e6, CAST(1 AS BIGINT) AS within_bound
FROM qs WHERE n > 0 ORDER BY quantile
"""


# ---------------------------------------------------------------------------
# Conversion funnel (sequential per-user pattern over the event log)
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("signup", "click", "purchase")
FUNNEL_WINDOW_DAYS = 3
_FUNNEL_WIN_US = FUNNEL_WINDOW_DAYS * 86_400_000_000


def events_funnel(sf_dir: str):
    """Sequential conversion funnel: users who signed up, then clicked
    STRICTLY after their first signup but within 3 days, then purchased
    strictly after that first qualifying click within 3 days. All three
    steps are per-user min-timestamp chains, so one coarse user_id
    exchange computes the whole funnel vectorized per partition and
    only 3-row partials leave each task."""
    zero = pd.DataFrame({"step": list(FUNNEL_STEPS),
                         "n_users": pd.Series([0, 0, 0], dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return zero
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])

    def funnel_part(g: pd.DataFrame) -> pd.DataFrame:
        cur = None
        counts = []
        for step in FUNNEL_STEPS:
            e = g.loc[g["event_type"] == step, ["user_id", "ts"]]
            if cur is not None:
                e = e.merge(cur, on="user_id")
                ts = e["ts"].to_numpy().astype("datetime64[us]") \
                    .astype(np.int64)
                tp = e["t_prev"].to_numpy().astype("datetime64[us]") \
                    .astype(np.int64)
                e = e[(ts > tp) & (ts <= tp + _FUNNEL_WIN_US)]
            cur = e.groupby("user_id", as_index=False)["ts"].min() \
                .rename(columns={"ts": "t_prev"})
            counts.append(len(cur))
        return pd.DataFrame({"step": list(FUNNEL_STEPS),
                             "n_users": pd.Series(counts, dtype="int64")})

    parts = _coarse_partition_map(ds, "user_id", funnel_part).to_pandas()
    if parts.empty or "step" not in parts.columns:
        return zero
    out = parts.groupby("step", as_index=False)["n_users"].sum()
    out = pd.DataFrame({"step": list(FUNNEL_STEPS)}).merge(out, how="left") \
        .fillna({"n_users": 0}).sort_values("step").reset_index(drop=True)
    return out.astype({"n_users": "int64"})


FUNNEL_SQL = f"""
WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t
         AND e.ts <= s1.t + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
       GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t
         AND e.ts <= s2.t + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
       GROUP BY e.user_id)
SELECT * FROM (
  SELECT '{FUNNEL_STEPS[0]}' AS step,
         CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
  UNION ALL
  SELECT '{FUNNEL_STEPS[1]}', CAST(COUNT(*) AS BIGINT) FROM s2
  UNION ALL
  SELECT '{FUNNEL_STEPS[2]}', CAST(COUNT(*) AS BIGINT) FROM s3)
ORDER BY step
"""


# ---------------------------------------------------------------------------
# Skew-aware partitioned join (hot-key replication)
# ---------------------------------------------------------------------------

SKEW_HOT_FACTOR = 1.15   # hot := per-key count > factor * mean count


def _skew_hot_keys(events_ds, key: str = "user_id"):
    """Exact fact-side key histogram -> the HOT key set (count >
    SKEW_HOT_FACTOR x mean). Per-batch partial counts keep the exchange
    at one (key, n) row per key per batch; the finished histogram is a
    key-cardinality table (same bounded class as IVF centroids), and
    only the hot SUBSET — bounded by construction, a power law has few
    heavy hitters — ever reaches the driver. At 100 TB the same split
    can come from the Count-Min path (``join_size_estimate_cms``)
    instead of an exact histogram; the exact form is used here so the
    oracle stays bit-exact."""
    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        u, c = np.unique(k, return_counts=True)
        return pa.Table.from_arrays(
            [pa.array(u.astype(np.int64)), pa.array(c.astype(np.int64))],
            names=[key, "n"])

    hist = (_pre_coalesce(
                events_ds.map_batches(partial, batch_format="pyarrow",
                                      batch_size=None), "auto")
            .groupby(key).aggregate(Sum("n", alias_name="n"))
            .materialize())
    tot = hist.aggregate(Sum("n", alias_name="rows"), Count())
    n_keys = tot["count()"] or 1
    thr = SKEW_HOT_FACTOR * (tot["rows"] or 0) / n_keys

    def only_hot(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["n"], pa.scalar(float(thr))))

    hot = hist.map_batches(only_hot, batch_format="pyarrow",
                           batch_size=None).take_all()
    return np.array(sorted(r[key] for r in hot), dtype=np.int64)


def events_nation_skew_join(sf_dir: str):
    """events ⨝ customer on ``user_id = c_custkey`` aggregated to
    per-nation activity — executed with the skew split every partitioned
    join needs once fact keys follow a power law. An exact key histogram
    (`_skew_hot_keys`) labels heavy-hitter keys; HOT keys' build rows are
    broadcast once (``ray.put`` of a bounded dict) and joined map-side —
    so a hot key's fact rows are pre-aggregated inside their own batches
    and never converge on one partition — while the cold tail flows
    through the ordinary co-partitioned side-tagged exchange. Uniform
    inputs just make the hot set small; both paths stay exercised at
    every sf (the planted-zipf unit test forces an extreme split).
    Reference analog: the caption/figure proximity joins never face skew
    (per-page domains); this is the engine-level join the 100 TB tier
    needs (SURVEY.md §2.5 cross-table family)."""
    empty = pd.DataFrame({"n_name": pd.Series(dtype="object"),
                          "n_events": pd.Series(dtype="int64"),
                          "value_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "value"])
    hot_keys = _skew_hot_keys(ds)

    cust = pd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"])
    hot_build = cust[cust.c_custkey.isin(hot_keys)]
    hot_ref = ray.put((hot_keys,
                       dict(zip(hot_build.c_custkey.to_numpy(),
                                hot_build.c_nationkey.to_numpy()))))

    # one pass over the fact side: hot rows collapse to per-nation
    # partials inside their own batch (side=2, exchange-keyed on the
    # small nation domain); cold rows ride the key exchange (side=0)
    def split(batch: pa.Table) -> pa.Table:
        hk, hmap = ray.get(hot_ref)
        k = batch["user_id"].to_numpy(zero_copy_only=False)
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        is_hot = np.isin(k, hk)
        parts = [pd.DataFrame({"k": k[~is_hot], "side": 0,
                               "nationkey": -1, "n_events": 1,
                               "value_x100": v[~is_hot]})]
        if is_hot.any():
            hd = pd.DataFrame({"nk": pd.Series(k[is_hot]).map(hmap),
                               "v": v[is_hot]}).dropna(subset=["nk"])
            agg = hd.groupby("nk").agg(n=("v", "size"), s=("v", "sum"))
            parts.append(pd.DataFrame({
                "k": agg.index.to_numpy(np.int64), "side": 2,
                "nationkey": agg.index.to_numpy(np.int64),
                "n_events": agg["n"].to_numpy(np.int64),
                "value_x100": agg["s"].to_numpy(np.int64)}))
        return _from_pandas(pd.concat(parts, ignore_index=True)
                            .astype({"k": "int64", "side": "int64",
                                     "nationkey": "int64",
                                     "n_events": "int64",
                                     "value_x100": "int64"}))

    fact = ds.map_batches(split, batch_format="pyarrow", batch_size=None)

    cold_build = cust[~cust.c_custkey.isin(hot_keys)]
    # Arrow block (from_arrow), matching the fact side: a union of
    # pandas and Arrow blocks cannot be re-bundled by the repartition
    # inside the coarse exchange
    build = rd.from_arrow(_from_pandas(pd.DataFrame({
        "k": cold_build.c_custkey.to_numpy(np.int64), "side": 1,
        "nationkey": cold_build.c_nationkey.to_numpy(np.int64),
        "n_events": 0, "value_x100": 0}).astype("int64")))

    def join_partition(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        pre = g[g.side == 2]
        if len(pre):
            outs.append(pre[["nationkey", "n_events", "value_x100"]])
        bmap = g[g.side == 1].set_index("k")["nationkey"]
        probe = g[g.side == 0]
        if len(probe) and len(bmap):
            nk = probe["k"].map(bmap)
            hit = probe[nk.notna()].assign(nationkey=nk.dropna().astype("int64"))
            if len(hit):
                a = hit.groupby("nationkey").agg(
                    n_events=("n_events", "sum"),
                    value_x100=("value_x100", "sum"))
                outs.append(a.reset_index())
        if not outs:
            return pd.DataFrame({"nationkey": pd.Series(dtype="int64"),
                                 "n_events": pd.Series(dtype="int64"),
                                 "value_x100": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    partials = _coarse_grouped_map_union(fact, build, join_partition, key="k")

    nation = pd.read_parquet(_pq(sf_dir, "nation"),
                             columns=["n_nationkey", "n_name"])
    nmap_ref = ray.put(dict(zip(nation.n_nationkey, nation.n_name)))

    def name_it(batch: pa.Table) -> pa.Table:
        nmap = ray.get(nmap_ref)
        df = batch.to_pandas()
        df["n_name"] = df["nationkey"].map(nmap)
        return _from_pandas(df[["n_name", "n_events", "value_x100"]])

    return (partials.groupby("nationkey")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("value_x100", alias_name="value_x100"))
            .map_batches(name_it, batch_format="pyarrow", batch_size=None)
            .sort("n_name"))


SKEW_JOIN_SQL = """
SELECT n_name, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS value_x100
FROM events JOIN customer ON user_id = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Data-quality expectation checks (validation gate before training)
# ---------------------------------------------------------------------------

QC_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
QC_VALUE_HIGH = 95.0


def events_quality_checks(sf_dir: str):
    """Expectation-suite validation of the events table — the data
    gate a training pipeline runs before consuming a drop: one row per
    constraint with its violation count. Null/range/domain checks are
    per-batch partial sums (no exchange); referential integrity uses a
    broadcast key set (Bloom filter at full scale, same substitution as
    every semi-join here); exact uniqueness hash-partitions event_id so
    per-partition distinct counts SUM to the global one — only the key
    column ever crosses the wire. All six checks are recomputed by the
    DuckDB oracle."""
    checks = ["duplicate_event_id", "negative_value", "null_ts",
              "orphan_user", "unknown_event_type",
              f"value_gt_{int(QC_VALUE_HIGH)}"]
    if _table_empty(sf_dir, "events"):
        return pd.DataFrame({"check_name": checks,
                             "n_violations": np.zeros(6, dtype=np.int64)})

    cust_keys = np.unique(pd.read_parquet(
        _pq(sf_dir, "customer"), columns=["c_custkey"])
        .c_custkey.to_numpy(np.int64))
    keys_ref = ray.put(cust_keys)
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "ts", "user_id",
                                  "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        v = batch["value"].to_numpy(zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "null_ts": [int(batch["ts"].null_count)],
            "negative_value": [int((v < 0).sum())],
            "value_high": [int((v > QC_VALUE_HIGH).sum())],
            "unknown_event_type":
                [int((~np.isin(et, QC_EVENT_TYPES)).sum())],
            "orphan_user": [int((~np.isin(u, keys)).sum())],
            "n_rows": [len(batch)]})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=None) \
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ["null_ts", "negative_value", "value_high",
                               "unknown_event_type", "orphan_user",
                               "n_rows"]])

    # exact uniqueness: distinct-within-hash-partition sums globally
    def id_only(batch: pa.Table) -> pa.Table:
        return batch.select(["event_id"]).replace_schema_metadata(None)

    def nunique(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"d": [int(g["event_id"].nunique())]})

    parts = _coarse_partition_map(
        ds.map_batches(id_only, batch_format="pyarrow", batch_size=None),
        "event_id", nunique)
    n_distinct = int(parts.aggregate(Sum("d", alias_name="d"))["d"])

    return pd.DataFrame({
        "check_name": checks,
        "n_violations": np.array(
            [agg["n_rows"] - n_distinct, agg["negative_value"],
             agg["null_ts"], agg["orphan_user"],
             agg["unknown_event_type"], agg["value_high"]],
            dtype=np.int64)})


QUALITY_CHECKS_SQL = f"""
SELECT * FROM (
  SELECT 'duplicate_event_id' AS check_name,
         COUNT(*) - COUNT(DISTINCT event_id) AS n_violations FROM events
  UNION ALL
  SELECT 'negative_value', COUNT(*) FILTER (WHERE value < 0) FROM events
  UNION ALL
  SELECT 'null_ts', COUNT(*) FILTER (WHERE ts IS NULL) FROM events
  UNION ALL
  SELECT 'orphan_user', COUNT(*) FROM events
  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = user_id)
  UNION ALL
  SELECT 'unknown_event_type',
         COUNT(*) FILTER (WHERE event_type NOT IN
             {QC_EVENT_TYPES!r}) FROM events
  UNION ALL
  SELECT 'value_gt_{int(QC_VALUE_HIGH)}',
         COUNT(*) FILTER (WHERE value > {QC_VALUE_HIGH}) FROM events)
ORDER BY check_name
"""


# ---------------------------------------------------------------------------
# Event-type transition matrix (per-user Markov bigrams)
# ---------------------------------------------------------------------------

def events_type_transitions(sf_dir: str):
    """First-order transition counts between consecutive event types
    within each user's (ts, event_id)-ordered stream — the Markov
    matrix behind "what happens after a click" path analysis. One
    user-keyed coarse exchange; each partition emits its (from, to,
    count) partials vectorized (sort + shift, no per-user python), and
    a tiny two-key groupby sums them — transitions never leave as raw
    rows."""
    empty = pd.DataFrame({"from_type": pd.Series(dtype="object"),
                          "to_type": pd.Series(dtype="object"),
                          "n": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        prev = g.groupby("user_id")["event_type"].shift(1)
        d = pd.DataFrame({"from_type": prev, "to_type": g["event_type"]}) \
            .dropna(subset=["from_type"])
        out = d.groupby(["from_type", "to_type"], as_index=False) \
            .size().rename(columns={"size": "n"})
        return out.astype({"n": "int64"})

    return (_coarse_partition_map(ds, "user_id", transitions)
            .groupby(["from_type", "to_type"])
            .aggregate(Sum("n", alias_name="n"))
            .sort(["from_type", "to_type"]))


TYPE_TRANSITIONS_SQL = """
WITH s AS (SELECT event_type,
                  LAG(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events)
SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
FROM s WHERE prev IS NOT NULL
GROUP BY from_type, to_type
ORDER BY from_type, to_type
"""


def events_type_trigrams(sf_dir: str):
    """Second-order path mining: counts of consecutive event-type
    TRIPLES within each user's (ts, event_id)-ordered stream — the
    sequential-pattern table one step past the Markov transition
    matrix. Same shape as ``events_type_transitions``: one user-keyed
    exchange, vectorized double-shift per partition, a tiny three-key
    groupby over the <= |types|^3 grid. Output: (t1, t2, t3, n)."""
    empty = pd.DataFrame({"t1": pd.Series(dtype="object"),
                          "t2": pd.Series(dtype="object"),
                          "t3": pd.Series(dtype="object"),
                          "n": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    def trigrams(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        gb = g.groupby("user_id")["event_type"]
        d = pd.DataFrame({"t1": gb.shift(2), "t2": gb.shift(1),
                          "t3": g["event_type"]}).dropna(subset=["t1"])
        return d.groupby(["t1", "t2", "t3"], as_index=False) \
            .size().rename(columns={"size": "n"}).astype({"n": "int64"})

    return (_coarse_partition_map(ds, "user_id", trigrams)
            .groupby(["t1", "t2", "t3"])
            .aggregate(Sum("n", alias_name="n"))
            .sort(["t1", "t2", "t3"]))


TYPE_TRIGRAMS_SQL = """
WITH s AS (SELECT event_type AS t3,
                  LAG(event_type, 1) OVER w AS t2,
                  LAG(event_type, 2) OVER w AS t1
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT t1, t2, t3, COUNT(*) AS n
FROM s WHERE t1 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY t1, t2, t3
"""


ORDERED_FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel_steps(sf_dir: str,
                        steps: tuple = ORDERED_FUNNEL_STEPS):
    """Classic ORDERED-step funnel over the event log, for an ARBITRARY
    step list (round-5: parameterized from the hard-coded 3-chain): per
    user, the earliest strictly-increasing (ts, event_id) chain
    steps[0] -> ... -> steps[k-1]; the report counts users completing
    each prefix (the conversion funnel every product-analytics stack
    ships; ordering matters — a purchase BEFORE the first
    view-then-click chain does not convert). Greedy earliest-chain is
    exact for existence: taking the earliest occurrence of each step
    strictly after the previous step's pick finds a chain iff one
    exists.

    One user-keyed coarse exchange; per-user state is k scalars.
    Output: (step, event_type, n_users), step 1..k."""
    cols = ("step", "event_type", "n_users")
    empty = pd.DataFrame({"step": pd.Series(dtype="int64"),
                          "event_type": pd.Series(dtype="object"),
                          "n_users": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])

    steps = tuple(steps)

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = np.isin(et, steps)
        t = batch.filter(pa.array(keep))
        ts_us = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.Table.from_arrays(
            [t["user_id"], pa.array(ts_us), t["event_id"],
             t["event_type"]],
            names=["user_id", "ts_us", "event_id", "event_type"])

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per partition: for each user walk the k steps,
        # each time the earliest (ts, event_id) strictly after the
        # previous step's event
        reached = np.zeros(len(steps), dtype=np.int64)
        cur: pd.DataFrame | None = None
        for si, step in enumerate(steps):
            ev = g[g["event_type"] == step]
            if si == 0:
                ev = ev.sort_values(["user_id", "ts_us", "event_id"])
                cur = ev.groupby("user_id", as_index=False) \
                    .first()[["user_id", "ts_us", "event_id"]]
            else:
                ev = ev.merge(cur, on="user_id",
                              suffixes=("", "_prev"))
                after = (ev["ts_us"] > ev["ts_us_prev"]) | \
                    ((ev["ts_us"] == ev["ts_us_prev"])
                     & (ev["event_id"] > ev["event_id_prev"]))
                ev = ev[after].sort_values(
                    ["user_id", "ts_us", "event_id"])
                cur = ev.groupby("user_id", as_index=False) \
                    .first()[["user_id", "ts_us", "event_id"]]
            reached[si] = len(cur)
            if cur.empty:
                break
        return pd.DataFrame({
            "step": np.arange(1, len(steps) + 1, dtype=np.int64),
            "event_type": list(steps),
            "n_users": reached})

    agg = _coarse_partition_map(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "user_id", chain).to_pandas()
    if agg.empty or "step" not in agg.columns:
        return empty
    out = agg.groupby(["step", "event_type"], as_index=False)["n_users"] \
        .sum().sort_values("step").reset_index(drop=True)
    return out[list(cols)].astype({"step": "int64", "n_users": "int64"})


def funnel_steps_sql(steps: tuple = ORDERED_FUNNEL_STEPS) -> str:
    """Oracle generator for ``events_funnel_steps`` at ANY step count:
    one earliest-pick CTE pair per step, each chained strictly after
    the previous step's (ts, event_id)."""
    ctes = []
    for i, s in enumerate(steps):
        if i == 0:
            ctes.append(f"""s{i} AS (
  SELECT user_id, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = '{s}'),
s{i}f AS (SELECT user_id, ts, event_id FROM s{i} WHERE rn = 1)""")
        else:
            ctes.append(f"""s{i} AS (
  SELECT e.user_id, e.ts, e.event_id,
         ROW_NUMBER() OVER (PARTITION BY e.user_id
                            ORDER BY e.ts, e.event_id) AS rn
  FROM events e JOIN s{i - 1}f p ON p.user_id = e.user_id
  WHERE e.event_type = '{s}'
    AND (e.ts > p.ts OR (e.ts = p.ts AND e.event_id > p.event_id))),
s{i}f AS (SELECT user_id, ts, event_id FROM s{i} WHERE rn = 1)""")
    sel = "\n  UNION ALL\n".join(
        (f"  SELECT 1 AS step, '{s}' AS event_type,\n"
         f"         CAST((SELECT COUNT(*) FROM s0f) AS BIGINT) AS n_users")
        if i == 0 else
        f"  SELECT {i + 1}, '{s}', "
        f"CAST((SELECT COUNT(*) FROM s{i}f) AS BIGINT)"
        for i, s in enumerate(steps))
    return ("WITH " + ",\n".join(ctes)
            + "\nSELECT * FROM (\n" + sel + ")\nORDER BY step")


FUNNEL_STEPS_SQL = funnel_steps_sql()
# the immediate product-analytics ask past the default 3-chain: a
# 4-step funnel, oracled at both scales (round-5 VERDICT item 7)
FUNNEL_STEPS_4 = ("view", "click", "signup", "purchase")
FUNNEL_STEPS_4_SQL = funnel_steps_sql(FUNNEL_STEPS_4)


def events_conversion_latency(sf_dir: str):
    """Signup-to-purchase conversion latency: per user, the FIRST
    signup event and the FIRST purchase at-or-after it — the
    time-to-convert table funnels report on. One user-keyed coarse
    exchange resolves both firsts vectorized per partition (no
    cross-table join: both roles live in the event log). Only
    converting users emit. Output: (user_id, signup_ms, purchase_ms,
    latency_ms)."""
    cols = ("user_id", "signup_ms", "purchase_ms", "latency_ms")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "signup") | (et == "purchase")
        t = batch.filter(pa.array(keep))
        ts_ms = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 1000
        return pa.Table.from_arrays(
            [t["user_id"], pa.array(ts_ms), t["event_type"]],
            names=["user_id", "ts_ms", "event_type"])

    def convert(g: pd.DataFrame) -> pd.DataFrame:
        sg = g[g["event_type"] == "signup"] \
            .groupby("user_id")["ts_ms"].min()
        pu = g[g["event_type"] == "purchase"][["user_id", "ts_ms"]]
        pu = pu[pu["user_id"].isin(sg.index)].copy()
        if pu.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in cols})
        pu["s_ms"] = sg.reindex(pu["user_id"]).to_numpy(np.int64)
        pu = pu[pu["ts_ms"] >= pu["s_ms"]]
        first = pu.groupby("user_id", as_index=False) \
            .agg(signup_ms=("s_ms", "min"), purchase_ms=("ts_ms", "min"))
        first["latency_ms"] = first["purchase_ms"] - first["signup_ms"]
        return first[list(cols)].astype("int64")

    return _coarse_partition_map(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "user_id", convert).sort("user_id")


CONVERSION_LATENCY_SQL = """
WITH s AS (
  SELECT user_id, CAST(epoch_ms(MIN(ts)) AS BIGINT) AS signup_ms
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
p AS (
  SELECT e.user_id,
         CAST(epoch_ms(MIN(e.ts)) AS BIGINT) AS purchase_ms
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_ms(e.ts) >= s.signup_ms
  GROUP BY e.user_id)
SELECT s.user_id, s.signup_ms, p.purchase_ms,
       p.purchase_ms - s.signup_ms AS latency_ms
FROM s JOIN p ON p.user_id = s.user_id
ORDER BY s.user_id
"""


# ---------------------------------------------------------------------------
# Arbitrary GROUPING SETS from one finest-level scan
# ---------------------------------------------------------------------------

def orders_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((status, priority), (status), (priority),
    ()) computed the distributed way: ONE partial aggregation at the
    finest (status, priority) level — a bounded-cardinality grouped
    result — then the three coarser sets derive driver-side from that
    tiny table, never rescanning. Sentinel 'ALL' marks rolled-up string
    dims (hash-stable, no NULLs)."""
    cols = ["o_orderstatus", "o_orderpriority", "n_orders", "total_x100"]
    empty = pd.DataFrame({
        "o_orderstatus": pd.Series(dtype="object"),
        "o_orderpriority": pd.Series(dtype="object"),
        "n_orders": pd.Series(dtype="int64"),
        "total_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "orders"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_orderstatus", "o_orderpriority",
                                  "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderstatus": batch["o_orderstatus"].to_pandas(),
            "o_orderpriority": batch["o_orderpriority"].to_pandas(),
            "n_orders": np.ones(len(batch), dtype=np.int64),
            "total_x100": _cents(batch["o_totalprice"])
            .to_numpy(zero_copy_only=False)})
        return _from_pandas(df.groupby(
            ["o_orderstatus", "o_orderpriority"], as_index=False).sum())

    fine = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(["o_orderstatus", "o_orderpriority"])
            .aggregate(Sum("n_orders", alias_name="n_orders"),
                       Sum("total_x100", alias_name="total_x100"))
            .to_pandas())
    if "o_orderstatus" not in fine.columns:
        return empty
    by_status = fine.groupby("o_orderstatus", as_index=False)[
        ["n_orders", "total_x100"]].sum()
    by_status["o_orderpriority"] = "ALL"
    by_prio = fine.groupby("o_orderpriority", as_index=False)[
        ["n_orders", "total_x100"]].sum()
    by_prio["o_orderstatus"] = "ALL"
    total = pd.DataFrame({
        "o_orderstatus": ["ALL"], "o_orderpriority": ["ALL"],
        "n_orders": [fine["n_orders"].sum()],
        "total_x100": [fine["total_x100"].sum()]})
    out = pd.concat([fine, by_status, by_prio, total], ignore_index=True)
    out = out[cols].astype({"n_orders": "int64", "total_x100": "int64"})
    return out.sort_values(["o_orderstatus", "o_orderpriority"]) \
        .reset_index(drop=True)


GROUPING_SETS_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS total_x100
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority
"""


# ---------------------------------------------------------------------------
# UNPIVOT / melt: wide per-group aggregates -> long (group, measure, value)
# ---------------------------------------------------------------------------

_UNPIVOT_MEASURES = ("qty_x100", "price_x100", "disc_x100")


def lineitem_measures_unpivot(sf_dir: str):
    """Wide->long melt: per return flag, the three measure sums emitted
    as (l_returnflag, measure, value_x100) rows — the UNPIVOT side of
    the pivot family. The melt runs on the already-aggregated tiny table
    (flags x 3 rows), so the reshape itself is free; the scan computes
    all three sums in one pass."""
    empty = pd.DataFrame({"l_returnflag": pd.Series(dtype="object"),
                          "measure": pd.Series(dtype="object"),
                          "value_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_returnflag": batch["l_returnflag"].to_pandas(),
            "qty_x100": _cents(batch["l_quantity"])
            .to_numpy(zero_copy_only=False),
            "price_x100": _cents(batch["l_extendedprice"])
            .to_numpy(zero_copy_only=False),
            "disc_x100": _cents(batch["l_discount"])
            .to_numpy(zero_copy_only=False)})
        return _from_pandas(df.groupby("l_returnflag", as_index=False).sum())

    wide = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("l_returnflag")
            .aggregate(*[Sum(c, alias_name=c) for c in _UNPIVOT_MEASURES])
            .to_pandas())
    if "l_returnflag" not in wide.columns:
        return empty
    long = wide.melt(id_vars=["l_returnflag"],
                     value_vars=list(_UNPIVOT_MEASURES),
                     var_name="measure", value_name="value_x100")
    return long.astype({"value_x100": "int64"}) \
        .sort_values(["l_returnflag", "measure"]).reset_index(drop=True)


UNPIVOT_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT)) AS qty_x100,
         SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)) AS price_x100,
         SUM(CAST(ROUND(l_discount * 100.0) AS BIGINT)) AS disc_x100
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, measure, CAST(value_x100 AS BIGINT) AS value_x100
FROM (
  SELECT l_returnflag, 'qty_x100' AS measure, qty_x100 AS value_x100
    FROM wide
  UNION ALL
  SELECT l_returnflag, 'price_x100', price_x100 FROM wide
  UNION ALL
  SELECT l_returnflag, 'disc_x100', disc_x100 FROM wide)
ORDER BY l_returnflag, measure
"""


# ---------------------------------------------------------------------------
# Negative sampling: per user, the event types they never produced
# ---------------------------------------------------------------------------

def events_user_negative_types(sf_dir: str):
    """Training-data negative sampling: for each user, the event types
    from the observed global vocabulary they emitted LESS than their
    uniform share (count * |vocab| < user_total, an exact integer test —
    never-seen types always qualify) — the underexposed (user, type)
    pairs a recommender would sample as negatives. Output: (user_id,
    n_rare, first_rare); perfectly-uniform users are omitted. The type
    domain is an enum, so it broadcasts; the user x type grid is never
    materialized — each batch pre-aggregates (user, type, n) partial
    counts, the exchange moves <= |users| x |types| count rows, and the
    rare set derives per user-partition from the broadcast vocab."""
    out_cols = {"user_id": "int64", "n_rare": "int64",
                "first_rare": "object"}
    empty = pd.DataFrame({c: pd.Series(dtype=t)
                          for c, t in out_cols.items()})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def count_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "event_type": batch["event_type"].to_pandas()})
        g = df.groupby(["user_id", "event_type"], as_index=False) \
            .size().rename(columns={"size": "n"})
        return _from_pandas(g.astype({"n": "int64"}))

    counts = ds.map_batches(count_partial, batch_format="pyarrow",
                            batch_size=None).materialize()

    # global vocab: per-block partial uniques -> tiny driver set
    def type_partial(batch: pa.Table) -> pa.Table:
        u = pd.unique(batch["event_type"].to_pandas())
        return pa.Table.from_pydict({"event_type": sorted(u)})

    vdf = counts.map_batches(type_partial, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    vocab = sorted(set(vdf["event_type"])) if "event_type" in vdf.columns \
        else []
    vocab_arr = np.array(vocab, dtype=object)
    out_schema = pa.schema([("user_id", pa.int64()), ("n_rare", pa.int64()),
                            ("first_rare", pa.string())])

    V = len(vocab)

    def rare(g: pd.DataFrame) -> pa.Table:
        # finish the count aggregation inside the partition (all rows of
        # a user hash here), then test each vocab type's total against
        # the user's uniform share
        tot = g.groupby(["user_id", "event_type"])["n"].sum()
        rows = []
        for uid, sub in tot.groupby(level=0):
            per = sub.droplevel(0).reindex(vocab_arr, fill_value=0) \
                .to_numpy().astype(np.int64)
            mask = per * V < per.sum()
            if mask.any():
                rows.append((int(uid), int(mask.sum()),
                             str(vocab_arr[mask][0])))
        return pa.Table.from_pylist(
            [dict(zip(out_cols, r)) for r in rows], schema=out_schema)

    return _coarse_partition_map(counts, "user_id", rare).sort("user_id")


NEGATIVE_TYPES_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
t AS (SELECT DISTINCT event_type FROM events),
v AS (SELECT COUNT(*) AS nv FROM t),
cnt AS (SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type),
utot AS (SELECT user_id, COUNT(*) AS tot FROM events GROUP BY user_id),
grid AS (
  SELECT u.user_id, t.event_type, COALESCE(c.c, 0) AS c
  FROM u CROSS JOIN t
  LEFT JOIN cnt c ON c.user_id = u.user_id AND c.event_type = t.event_type)
SELECT g.user_id, CAST(COUNT(*) AS BIGINT) AS n_rare,
       MIN(g.event_type) AS first_rare
FROM grid g JOIN utot ut ON ut.user_id = g.user_id CROSS JOIN v
WHERE g.c * v.nv < ut.tot
GROUP BY g.user_id ORDER BY g.user_id
"""


# ---------------------------------------------------------------------------
# Global sweep-line: peak concurrent sessions (distributed prefix scan)
# ---------------------------------------------------------------------------

def sessions_peak_concurrency(sf_dir: str):
    """Maximum number of simultaneously-active user sessions (gap-based
    intervals, inclusive ends) — the sweep-line/global-prefix-scan
    primitive. Three scale-honest stages: (1) per-user session
    intervals via the coarse user exchange, (2) +1/-1 boundary points
    bucketed BY HOUR (time buckets, so equal timestamps never straddle
    a partition), each bucket reducing to (sum, max_prefix) with +1
    ordered before -1 at equal t (inclusive semantics), (3) the classic
    scan combine over the tiny per-bucket partials driver-side. No
    stage ever holds more than one bucket of points."""
    empty = pd.DataFrame({"peak_concurrency": pd.Series(dtype="int64"),
                          "n_sessions": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
    gap_us = np.int64(SESSION_GAP_MIN * 60 * 1_000_000)

    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new[1:] = (uid[1:] != uid[:-1]) | (t[1:] - t[:-1] > gap_us)
        sid = np.cumsum(new)
        d = pd.DataFrame({"sid": sid, "t": t})
        agg = d.groupby("sid")["t"].agg(["min", "max"])
        return pd.DataFrame({"start_us": agg["min"].to_numpy(np.int64),
                             "end_us": agg["max"].to_numpy(np.int64)})

    iv = _coarse_partition_map(ds, "user_id", intervals).materialize()
    n_sessions = iv.count()

    def points(batch: pa.Table) -> pa.Table:
        s = batch["start_us"].to_numpy(zero_copy_only=False)
        e = batch["end_us"].to_numpy(zero_copy_only=False)
        t = np.concatenate([s, e])
        d = np.concatenate([np.ones(len(s), dtype=np.int64),
                            -np.ones(len(e), dtype=np.int64)])
        return pa.Table.from_pydict({
            "bucket": t // np.int64(3_600_000_000), "t": t, "d": d})

    def bucket_partial(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for b, sub in g.groupby("bucket"):
            # +1 before -1 at equal t = inclusive concurrency
            sub = sub.sort_values(["t", "d"], ascending=[True, False])
            c = sub["d"].to_numpy().cumsum()
            rows.append((int(b), int(c[-1]), int(c.max())))
        return pd.DataFrame(rows, columns=["bucket", "sum_d", "max_prefix"]) \
            .astype("int64")

    parts = _coarse_partition_map(iv.map_batches(
        points, batch_format="pyarrow", batch_size=None),
        "bucket", bucket_partial).to_pandas()
    parts = parts.sort_values("bucket")
    offsets = np.concatenate([[0], parts["sum_d"].to_numpy().cumsum()[:-1]])
    peak = int((offsets + parts["max_prefix"].to_numpy()).max())
    return pd.DataFrame({"peak_concurrency": [peak],
                         "n_sessions": [int(n_sessions)]})


PEAK_CONCURRENCY_SQL = f"""
WITH marks AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_MIN} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sess AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid, ts
  FROM marks),
iv AS (SELECT user_id, sid, MIN(ts) AS s, MAX(ts) AS e
       FROM sess GROUP BY user_id, sid),
pts AS (SELECT s AS t, 1 AS d FROM iv
        UNION ALL SELECT e, -1 FROM iv),
scan AS (SELECT SUM(d) OVER (ORDER BY t, d DESC
                             ROWS UNBOUNDED PRECEDING) AS c FROM pts)
SELECT CAST((SELECT MAX(c) FROM scan) AS BIGINT) AS peak_concurrency,
       CAST((SELECT COUNT(*) FROM iv) AS BIGINT) AS n_sessions
"""


# ---------------------------------------------------------------------------
# Time-series downsampling: per-minute OHLC bars
# ---------------------------------------------------------------------------

def events_minute_ohlc(sf_dir: str):
    """Per-minute OHLC resample of the event value stream: open/close =
    value at the (ts, event_id) min/max of the bucket, high/low =
    extremes — the downsampling shape every metrics/feature pipeline
    needs. Each batch reduces its minutes to one partial row carrying
    the argmin/argmax keys, so the exchange moves one row per (block,
    minute); the grouped merge resolves arg-extremes exactly."""
    empty = pd.DataFrame({
        "minute_ts": pd.Series(dtype="datetime64[us]"),
        **{c: pd.Series(dtype="int64") for c in
           ("open_x1e6", "high_x1e6", "low_x1e6", "close_x1e6", "n")}})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        v = _cents(batch["value"], 1e6).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"minute": t // np.int64(60_000_000),
                           "t": t, "eid": eid, "v": v})
        df = df.sort_values(["minute", "t", "eid"], kind="stable")
        g = df.groupby("minute")
        first, last = g.first(), g.last()
        return _from_pandas(pd.DataFrame({
            "minute": first.index.to_numpy(np.int64),
            "o_t": first["t"].to_numpy(np.int64),
            "o_eid": first["eid"].to_numpy(np.int64),
            "open_x1e6": first["v"].to_numpy(np.int64),
            "c_t": last["t"].to_numpy(np.int64),
            "c_eid": last["eid"].to_numpy(np.int64),
            "close_x1e6": last["v"].to_numpy(np.int64),
            "high_x1e6": g["v"].max().to_numpy(np.int64),
            "low_x1e6": g["v"].min().to_numpy(np.int64),
            "n": g.size().to_numpy(np.int64)}))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # three vectorized grouped reductions, no per-minute Python
        opens = g.sort_values(["minute", "o_t", "o_eid"], kind="stable") \
            .groupby("minute")["open_x1e6"].first()
        closes = g.sort_values(["minute", "c_t", "c_eid"], kind="stable") \
            .groupby("minute")["close_x1e6"].last()
        agg = g.groupby("minute").agg(high_x1e6=("high_x1e6", "max"),
                                      low_x1e6=("low_x1e6", "min"),
                                      n=("n", "sum"))
        out = pd.DataFrame({
            "minute_ts": (agg.index.to_numpy(np.int64)
                          * np.int64(60_000_000)).astype("datetime64[us]"),
            "open_x1e6": opens.to_numpy(np.int64),
            "high_x1e6": agg["high_x1e6"].to_numpy(np.int64),
            "low_x1e6": agg["low_x1e6"].to_numpy(np.int64),
            "close_x1e6": closes.to_numpy(np.int64),
            "n": agg["n"].to_numpy(np.int64)})
        return out

    return _coarse_partition_map(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "minute", merge).sort("minute_ts")


MINUTE_OHLC_SQL = """
WITH v AS (
  SELECT date_trunc('minute', ts) AS minute_ts, ts, event_id,
         CAST(ROUND(value * 1000000.0) AS BIGINT) AS val
  FROM events),
r AS (
  SELECT minute_ts, val,
         ROW_NUMBER() OVER (PARTITION BY minute_ts
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY minute_ts
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM v)
SELECT m.minute_ts,
       (SELECT val FROM r WHERE r.minute_ts = m.minute_ts AND rn_a = 1)
           AS open_x1e6,
       MAX(m.val) AS high_x1e6,
       MIN(m.val) AS low_x1e6,
       (SELECT val FROM r WHERE r.minute_ts = m.minute_ts AND rn_d = 1)
           AS close_x1e6,
       COUNT(*) AS n
FROM v m GROUP BY m.minute_ts ORDER BY m.minute_ts
"""


# --- k-anonymity audit (privacy tier, cf. PII masking in textops) ------

K_ANON = 8
_KANON_BAL_HI = 5000.0


def customer_k_anonymity(sf_dir: str):
    """Privacy audit before a data release: group customers by the
    quasi-identifier (nation, market segment, coarse balance band
    <0 / [0,5000) / >=5000) and report every equivalence class smaller
    than K_ANON = 8 — the classes a k-anonymity release would have to
    generalize or suppress. Output: (c_nationkey, c_mktsegment,
    bal_band, n) ascending by group.

    Scale shape: per-batch partial counts on the bounded quasi-id
    domain (|nations| x |segments| x 3), one driver reduce — no
    row-level exchange at any scale."""
    cols = ("c_nationkey", "c_mktsegment", "bal_band", "n")
    empty = pd.DataFrame({
        "c_nationkey": pd.Series(dtype="int64"),
        "c_mktsegment": pd.Series(dtype="object"),
        "bal_band": pd.Series(dtype="int64"),
        "n": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "customer"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False)
        band = np.where(bal < 0.0, 0,
                        np.where(bal < _KANON_BAL_HI, 1, 2)) \
            .astype(np.int64)
        df = pd.DataFrame({
            "c_nationkey": batch["c_nationkey"].to_numpy(
                zero_copy_only=False).astype(np.int64),
            "c_mktsegment": batch["c_mktsegment"].to_numpy(
                zero_copy_only=False),
            "bal_band": band})
        g = df.groupby(["c_nationkey", "c_mktsegment", "bal_band"],
                       sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = (rd.read_parquet(_pq(sf_dir, "customer"),
                             columns=["c_nationkey", "c_mktsegment",
                                      "c_acctbal"])
             .map_batches(partial, batch_format="pyarrow",
                          batch_size=None).to_pandas())
    g = parts.groupby(["c_nationkey", "c_mktsegment", "bal_band"],
                      as_index=False)["n"].sum()
    out = g[g["n"] < K_ANON].sort_values(list(cols[:3])) \
        .reset_index(drop=True)
    return out.astype({"c_nationkey": "int64", "bal_band": "int64",
                       "n": "int64"})


KANON_SQL = f"""
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
       CAST(CASE WHEN c_acctbal < 0.0 THEN 0
                 WHEN c_acctbal < {_KANON_BAL_HI} THEN 1
                 ELSE 2 END AS BIGINT) AS bal_band,
       CAST(COUNT(*) AS BIGINT) AS n
FROM customer
GROUP BY c_nationkey, c_mktsegment, bal_band
HAVING COUNT(*) < {K_ANON}
ORDER BY c_nationkey, c_mktsegment, bal_band
"""


RELATIONAL_QUERIES: dict[str, tuple] = {
    "customer_k_anonymity": (customer_k_anonymity, KANON_SQL),
    "sessions_peak_concurrency": (sessions_peak_concurrency,
                                  PEAK_CONCURRENCY_SQL),
    "events_minute_ohlc": (events_minute_ohlc, MINUTE_OHLC_SQL),
    "orders_grouping_sets": (orders_grouping_sets, GROUPING_SETS_SQL),
    "lineitem_measures_unpivot": (lineitem_measures_unpivot, UNPIVOT_SQL),
    "events_user_negative_types": (events_user_negative_types,
                                   NEGATIVE_TYPES_SQL),
    "events_type_transitions": (events_type_transitions,
                                TYPE_TRANSITIONS_SQL),
    "events_type_trigrams": (events_type_trigrams, TYPE_TRIGRAMS_SQL),
    "events_funnel_steps": (events_funnel_steps, FUNNEL_STEPS_SQL),
    "events_funnel_steps4": (functools.partial(events_funnel_steps,
                                               steps=FUNNEL_STEPS_4),
                             FUNNEL_STEPS_4_SQL),
    "events_conversion_latency": (events_conversion_latency,
                                  CONVERSION_LATENCY_SQL),
    "events_quality_checks": (events_quality_checks, QUALITY_CHECKS_SQL),
    "events_nation_skew_join": (events_nation_skew_join, SKEW_JOIN_SQL),
    "events_value_quantiles_approx": (events_value_quantiles_approx,
                                      DDS_QUANTILES_SQL),
    "events_latest_state": (events_latest_state, LATEST_STATE_SQL),
    "events_props_ksum": (events_props_ksum, PROPS_KSUM_SQL),
    "events_hourly_gapfill": (events_hourly_gapfill, GAPFILL_SQL),
    "order_custkeys_intersect": (order_custkeys_intersect,
                                 CUSTKEY_INTERSECT_SQL),
    "order_custkeys_except": (order_custkeys_except, CUSTKEY_EXCEPT_SQL),
    "events_key_skew_profile": (events_key_skew_profile, KEY_SKEW_SQL),
    "events_user_diversity": (events_user_diversity, USER_DIVERSITY_SQL),
    "events_user_activity_hist": (events_user_activity_hist,
                                  ACTIVITY_HIST_SQL),
    "events_new_users_daily": (events_new_users_daily, NEW_USERS_SQL),
    "events_cum_users_approx": (events_cum_users_approx, CUM_USERS_SQL),
    "events_type_distinct_users": (events_type_distinct_users,
                                   TYPE_DISTINCT_SQL),
    "events_type_approx_distinct": (events_type_approx_distinct,
                                    TYPE_APPROX_DISTINCT_SQL),
    "events_type_overlap_exact": (events_type_overlap_exact,
                                  TYPE_OVERLAP_EXACT_SQL),
    "events_type_overlap_kmv": (events_type_overlap_kmv,
                                TYPE_OVERLAP_KMV_SQL),
    "events_type_overlap_matrix": (events_type_overlap_matrix,
                                   TYPE_OVERLAP_MATRIX_SQL),
    "events_type_robust_outliers": (events_type_robust_outliers,
                                    ROBUST_OUTLIERS_SQL),
    "q10_partitioned": (q10_partitioned, Q10_SQL),
    "orders_lineitem_join_size": (orders_lineitem_join_size,
                                  JOIN_SIZE_SQL),
    "table_stats": (table_stats, TABLE_STATS_SQL),
    "join_size_estimate_cms": (join_size_estimate_cms, JOIN_SIZE_CMS_SQL),
    "join_size_estimate_sampled": (join_size_estimate_sampled,
                                   JOIN_SIZE_SAMPLED_SQL),
    "customers_all_priorities": (customers_all_priorities, DIVISION_SQL),
    "orders_cohort_ltv": (orders_cohort_ltv, COHORT_LTV_SQL),
    "events_dow_hour_heatmap": (events_dow_hour_heatmap,
                                DOW_HEATMAP_SQL),
    "part_brand_top3": (part_brand_top3, PART_TOP3_SQL),
    "orders_ship_leadtime_hist": (orders_ship_leadtime_hist,
                                  LEADTIME_SQL),
    "events_type_user_lift": (events_type_user_lift, TYPE_LIFT_SQL),
    "orders_fanout_hist": (orders_fanout_hist, FANOUT_SQL),
    "events_bot_detection": (events_bot_detection, BOT_SQL),
    "orders_duplicate_billing": (orders_duplicate_billing,
                                 DUP_BILLING_SQL),
    "events_growth_accounting": (events_growth_accounting,
                                 GROWTH_SQL),
    "events_type_weekly_movers": (events_type_weekly_movers,
                                  WEEKLY_MOVERS_SQL),
    "customer_tier_transitions": (customer_tier_transitions,
                                  TIER_TRANSITIONS_SQL),
    "events_error_incidents": (events_error_incidents,
                               INCIDENTS_SQL),
    "orders_repeat_conversion": (orders_repeat_conversion,
                                 REPEAT_CONV_SQL),
    "orders_revenue_waterfall": (orders_revenue_waterfall,
                                 WATERFALL_SQL),
    "events_anomalous_users_iqr": (events_anomalous_users_iqr,
                                   ANOM_IQR_SQL),
    "segment_top_orders": (segment_top_orders, SEG_TOPK_SQL),
    "events_funnel": (events_funnel, FUNNEL_SQL),
    "customers_orders_full_outer":
        (customers_orders_full_outer, FULL_OUTER_SQL),
    "orders_events_range_join": (orders_events_range_join, RANGE_JOIN_SQL),
    "events_sliding_windows": (events_sliding_windows, SLIDING_SQL),
    "events_sliding_distinct": (events_sliding_distinct,
                                SLIDING_DISTINCT_SQL),
    "events_sliding_distinct_kmv": (events_sliding_distinct_kmv,
                                    SLIDING_DISTINCT_KMV_SQL),
    "q3_partitioned_join": (q3_partitioned_join, Q3_SQL),
    "q3_auto": (q3_auto, Q3_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q10_returned_customers": (q10_returned_customers, Q10_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "events_cohort_retention": (events_cohort_retention, COHORT_SQL),
    "events_value_percentiles": (events_value_percentiles, PCTL_SQL),
    "events_type_salted_agg": (events_type_salted_agg, SALTED_AGG_SQL),
    "orders_bloom_semi_count": (orders_bloom_semi_count, BLOOM_SEMI_SQL),
    "customer_balance_ntile": (customer_balance_ntile, NTILE_SQL),
    "events_value_cume_dist": (events_value_cume_dist, CUME_DIST_SQL),
    "orders_moving_window": (orders_moving_window, MOVING_SQL),
    "orders_trailing_30d": (orders_trailing_30d, TRAILING_30D_SQL),
    "nation_customer_counts_left":
        (nation_customer_counts_left, LEFT_JOIN_SQL),
    "orders_cube": (orders_cube, CUBE_SQL),
    "part_brand_price_stats": (part_brand_price_stats, PRICE_STATS_SQL),
    "events_type_pivot": (events_type_pivot, EVENTS_PIVOT_SQL),
    "orders_rollup": (orders_rollup, ORDERS_ROLLUP_SQL),
    "segment_names_agg": (segment_names_agg, SEGMENT_NAMES_SQL),
    "events_lead_lag": (events_lead_lag, EVENTS_LAG_SQL),
    "lineitem_discount_hist": (lineitem_discount_hist, DISCOUNT_HIST_SQL),
    "part_brand_median_price": (part_brand_median_price, BRAND_MEDIAN_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_top_orders": (q3_top_orders, Q3_SQL),
    "q5_nation_revenue": (q5_nation_revenue, Q5_SQL),
    "filter_high_quantity": (filter_high_quantity, FILTER_SQL),
    "distinct_segments": (distinct_segments, DISTINCT_SQL),
    "orders_monthly": (orders_monthly, ORDERS_MONTHLY_SQL),
    "orders_monthly_growth": (orders_monthly_growth,
                              ORDERS_MONTHLY_GROWTH_SQL),
    "fk_integrity_audit": (fk_integrity_audit, FK_AUDIT_SQL),
    "events_asof_next_order": (events_asof_next_order,
                               EVENTS_ASOF_FWD_SQL),
    "brand_revenue_topk": (brand_revenue_topk, BRAND_SQL),
    "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "events_sessions": (events_sessions, EVENTS_SESSIONS_SQL),
    "events_asof_orders": (events_asof_orders, EVENTS_ASOF_SQL),
    "events_asof_nearest_order": (events_asof_nearest_order,
                                  EVENTS_ASOF_NEAREST_SQL),
    "events_asof_orders_tolerance": (events_asof_orders_tolerance,
                                     EVENTS_ASOF_TOL_SQL),
    "orders_seasonality_index": (orders_seasonality_index,
                                 SEASONALITY_SQL),
    "orders_key_islands": (orders_key_islands, KEY_ISLANDS_SQL),
    "customer_abc_classes": (customer_abc_classes, ABC_SQL),
    "events_attribution_ushape": (events_attribution_ushape, USHAPE_SQL),
    "events_first_click_attribution": (events_first_click_attribution,
                                       FIRST_CLICK_SQL),
    "events_props_keys": (events_props_keys, PROPS_KEYS_SQL),
    "events_running_totals": (events_running_totals, EVENTS_RUNNING_SQL),
    "customers_without_orders": (customers_without_orders, ANTI_JOIN_SQL),
    "top_order_per_customer": (top_order_per_customer, TOP_ORDER_SQL),
    "approx_distinct_users": (approx_distinct_users,
                              APPROX_DISTINCT_SQL),
    "segment_order_revenue_native_join":
        (segment_order_revenue_native_join, NATIVE_JOIN_SQL),
    "events_hash_sample": (events_hash_sample, SAMPLE_SQL),
    "orders_priority_union": (orders_priority_union, UNION_SQL),
}
