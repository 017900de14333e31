"""Table-maintenance operators: MERGE INTO (changelog upsert against a
base table) and Hive-partitioned writes with partition-pruned reads.

The reference writes versioned JSON result directories per run
(`hybrid_docling_gpt4_processor.py` output layout; re-expressed in
`state/manifest.py`); these two operators are the engine-level
generalization a 100 TB lakehouse tier needs on top of that:

- ``customer_merge_upsert`` — the Delta/Hudi/Iceberg MERGE shape:
  compact a changelog to latest-per-key (same machinery as
  ``events_latest_state``), then resolve base-vs-change per key in ONE
  co-partitioned exchange (side-tagged union) — inserts, updates and
  deletes in a single pass, no side broadcast anywhere.
- ``events_partitioned_prune`` — write a table Hive-partitioned by a
  column via ``Dataset.write_parquet(partition_cols=...)``, then answer
  a partition-selective query by reading ONLY that partition's
  directory: the scan never touches the other partitions' bytes (the
  resumable-output requirement of the north rule applied to reads).

Both are DuckDB-oracled (the oracle recomputes from the raw table).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .relational import (_cents, _coarse_grouped_map_union, _from_pandas,
                         _pq, _table_empty)

# ---------------------------------------------------------------------------
# MERGE INTO: apply an event changelog to the customer base table
# ---------------------------------------------------------------------------

# deterministic changelog derived from events: merge key spreads across
# AND beyond the customer key range, so all three MERGE arms (update /
# delete / insert) are exercised at every sf.  'error' events are
# tombstones; anything else upserts the account balance to the event
# value.  Latest (ts, event_id) wins per key.
MERGE_KEY_STRIDE = 11


def customer_merge_upsert(sf_dir: str):
    """MERGE INTO customer USING latest-changelog ON key. Two stages,
    both exchange-bounded: (1) per-batch merge-latest compaction of the
    changelog so the exchange moves at most one row per (key, batch);
    (2) side-tagged union of base and compacted changes through one
    coarse key exchange, with per-partition pandas resolution:
    matched+tombstone -> drop, matched+upsert -> new balance,
    unmatched change -> insert, untouched base -> keep. No process
    holds more than one partition of either table."""
    empty = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                          "c_name": pd.Series(dtype="object"),
                          "acctbal_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "customer") and _table_empty(sf_dir, "events"):
        return empty

    changes = rd.read_parquet(_pq(sf_dir, "events"),
                              columns=["user_id", "ts", "event_id",
                                       "event_type", "value"])

    def compact(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": batch["user_id"].to_numpy(zero_copy_only=False)
            * MERGE_KEY_STRIDE,
            "ts": batch["ts"].to_numpy(zero_copy_only=False),
            "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
            "is_delete": pc.equal(batch["event_type"], "error")
            .to_numpy(zero_copy_only=False),
            "val_x100": _cents(batch["value"]).to_numpy(zero_copy_only=False)})
        df = df.sort_values(["k", "ts", "event_id"]) \
            .groupby("k", as_index=False).last()
        return _from_pandas(pd.DataFrame({
            "k": df["k"].astype("int64"), "side": 1,
            "ts": df["ts"], "event_id": df["event_id"].astype("int64"),
            "is_delete": df["is_delete"].astype("int64"),
            "val_x100": df["val_x100"].astype("int64"),
            "c_name": ""}))

    base = rd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_name", "c_acctbal"])

    def tag_base(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return _from_pandas(pd.DataFrame({
            "k": batch["c_custkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "side": 0,
            "ts": pd.Series(np.zeros(n, dtype="datetime64[us]")),
            "event_id": -1,
            "is_delete": 0,
            "val_x100": _cents(batch["c_acctbal"])
            .to_numpy(zero_copy_only=False),
            "c_name": batch["c_name"].to_numpy(zero_copy_only=False)}))

    def merge_partition(g: pd.DataFrame) -> pd.DataFrame:
        ch = g[g.side == 1].sort_values(["k", "ts", "event_id"]) \
            .groupby("k", as_index=False).last()
        b = g[g.side == 0]
        m = b.merge(ch, on="k", how="outer", suffixes=("", "_ch"),
                    indicator=True)
        # matched tombstone or unmatched tombstone-insert: drop
        deleted = m["is_delete_ch"].fillna(m["is_delete"]).astype(bool) \
            if "is_delete_ch" in m else m["is_delete"].astype(bool)
        m = m[~deleted]
        has_change = m["_merge"] != "left_only"
        bal = np.where(has_change, m["val_x100_ch"].fillna(0),
                       m["val_x100"].fillna(0)).astype(np.int64)
        name = np.where(m["_merge"] == "right_only",
                        "NEW#" + m["k"].astype(np.int64).astype(str),
                        m["c_name"].fillna(""))
        return pd.DataFrame({"c_custkey": m["k"].astype("int64"),
                             "c_name": name,
                             "acctbal_x100": bal})

    out = _coarse_grouped_map_union(
        base.map_batches(tag_base, batch_format="pyarrow", batch_size=None),
        changes.map_batches(compact, batch_format="pyarrow",
                            batch_size=None),
        merge_partition, key="k")
    return out.sort("c_custkey")


MERGE_UPSERT_SQL = f"""
WITH latest AS (
  SELECT user_id * {MERGE_KEY_STRIDE} AS k,
         event_type = 'error' AS is_delete,
         CAST(ROUND(value * 100.0) AS BIGINT) AS val_x100
  FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
  WHERE rn = 1)
SELECT COALESCE(l.k, c.c_custkey) AS c_custkey,
       COALESCE(c.c_name, 'NEW#' || CAST(l.k AS VARCHAR)) AS c_name,
       CASE WHEN l.k IS NULL
            THEN CAST(ROUND(c_acctbal * 100.0) AS BIGINT)
            ELSE l.val_x100 END AS acctbal_x100
FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.k
WHERE NOT COALESCE(l.is_delete, FALSE)
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Hive-partitioned write + partition-pruned read
# ---------------------------------------------------------------------------

PRUNE_EVENT_TYPE = "purchase"


def events_partitioned_prune(sf_dir: str):
    """Write events Hive-partitioned by event_type
    (``write_parquet(partition_cols=["event_type"])`` — one directory
    per type, the resumable layout the north rule requires of sinks),
    then answer a type-selective daily aggregate by reading ONLY
    ``event_type=purchase/``: bytes of the other partitions are never
    opened. The oracle recomputes from the raw table, proving the
    round-trip through the partitioned layout is lossless."""
    empty = pd.DataFrame({"day": pd.Series(dtype="object"),
                          "n_events": pd.Series(dtype="int64"),
                          "value_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    root = tempfile.mkdtemp(prefix="events_part_", dir="/tmp")
    try:
        (rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["ts", "value", "event_type"])
         .write_parquet(root, partition_cols=["event_type"]))

        part_dir = os.path.join(root, f"event_type={PRUNE_EVENT_TYPE}")
        if not os.path.isdir(part_dir):
            return empty
        ds = rd.read_parquet(part_dir, columns=["ts", "value"])

        def partial(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "day": pc.strftime(batch["ts"], format="%Y-%m-%d")
                .to_numpy(zero_copy_only=False),
                "value_x100": _cents(batch["value"])
                .to_numpy(zero_copy_only=False)})
            a = df.groupby("day").agg(n_events=("value_x100", "size"),
                                      value_x100=("value_x100", "sum"))
            return _from_pandas(a.reset_index().astype(
                {"n_events": "int64", "value_x100": "int64"}))

        from ray.data.aggregate import Sum
        out = (ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
               .groupby("day")
               .aggregate(Sum("n_events", alias_name="n_events"),
                          Sum("value_x100", alias_name="value_x100"))
               .sort("day"))
        return out.to_pandas()   # tiny (one row per day); scratch dir
        #                          must outlive lazy execution
    finally:
        shutil.rmtree(root, ignore_errors=True)


PARTITIONED_PRUNE_SQL = f"""
SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT)
           AS value_x100
FROM events
WHERE event_type = '{PRUNE_EVENT_TYPE}'
GROUP BY day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Z-order clustering + zone-map file skipping
# ---------------------------------------------------------------------------

ZORDER_FILES = 64        # blocks in the rewritten layout: pruning
#                          resolution goes with the block count (a
#                          Morton interval of length L spans ~sqrt(L)
#                          of each dimension, so files ~ grid cells)
ZORDER_BITS = 16         # per-dimension Morton resolution


def _morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave two 16-bit dimensions into one int64 Morton key
    (classic part1by1 bit spreading, vectorized)."""
    def spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 8)) & np.uint64(0x00FF00FF)
        x = (x | (x << 4)) & np.uint64(0x0F0F0F0F)
        x = (x | (x << 2)) & np.uint64(0x33333333)
        x = (x | (x << 1)) & np.uint64(0x55555555)
        return x
    return (spread(a) | (spread(b) << np.uint64(1))).astype(np.int64)


def _scale_dim(x: np.ndarray, lo: int, hi: int) -> np.ndarray:
    span = max(1, hi - lo)
    return ((x - lo).astype(np.int64) * ((1 << ZORDER_BITS) - 1)
            // span).astype(np.int64)


def _events_bounds(sf_dir: str) -> tuple[int, int, int, int]:
    """Global (umin, umax, tmin_us, tmax_us) via a tiny distributed
    min/max aggregate (per-batch partials; four numbers move)."""
    from ray.data.aggregate import Max, Min
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        t = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.table({"umin": [int(u.min())], "umax": [int(u.max())],
                         "tmin": [int(t.min())], "tmax": [int(t.max())]})

    r = ds.map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .aggregate(Min("umin", alias_name="umin"),
                   Max("umax", alias_name="umax"),
                   Min("tmin", alias_name="tmin"),
                   Max("tmax", alias_name="tmax"))
    return r["umin"], r["umax"], r["tmin"], r["tmax"]


def _zorder_box(sf_dir: str, bounds=None):
    """The benchmark box: middle fifth of BOTH dimensions, derived from
    the global bounds with integer math both engines reproduce."""
    umin, umax, tmin, tmax = bounds or _events_bounds(sf_dir)
    return (umin + (umax - umin) * 2 // 5, umin + (umax - umin) * 3 // 5,
            tmin + (tmax - tmin) * 2 // 5, tmin + (tmax - tmin) * 3 // 5)


def write_layout(sf_dir: str, out_dir: str, order: str,
                 bounds=None) -> list[str]:
    """Rewrite events into ``ZORDER_FILES`` parquet blocks clustered by
    ``order``: 'ts' (plain time-sorted) or 'zorder' (Morton interleave
    of user_id x time — one global sort, the standard one-off
    clustering cost, amortized over every pruned query after it)."""
    import pyarrow.dataset as pads

    umin, umax, tmin, tmax = bounds or _events_bounds(sf_dir)
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "ts", "value"])

    def add_key(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        t = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        if order == "zorder":
            key = _morton2(_scale_dim(u, umin, umax),
                           _scale_dim(t, tmin, tmax))
        else:
            key = t
        return batch.append_column("sort_key", pa.array(key)) \
            .replace_schema_metadata(None)

    n = pads.dataset(_pq(sf_dir, "events")).count_rows()
    n_files = min(ZORDER_FILES, max(1, n // 4))
    # order-preserving repartition pins the block (=file) count so zone
    # maps get the intended resolution regardless of input block sizes
    (ds.map_batches(add_key, batch_format="pyarrow", batch_size=None)
       .sort("sort_key")
       .repartition(n_files)
       .write_parquet(out_dir))
    import glob
    return sorted(glob.glob(f"{out_dir}/*.parquet"))


def surviving_files(files: list[str], box) -> list[str]:
    """Zone-map pruning: keep a file only when its FOOTER min/max ranges
    for user_id and ts intersect the box — data pages of skipped files
    are never opened."""
    import pyarrow.parquet as pq

    ulo, uhi, tlo, thi = box
    keep = []
    for f in files:
        md = pq.read_metadata(f)
        umins, umaxs, tmins, tmaxs = [], [], [], []
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                if name == "user_id":
                    umins.append(st.min)
                    umaxs.append(st.max)
                elif name == "ts":
                    tmins.append(np.datetime64(st.min, "us").astype(np.int64))
                    tmaxs.append(np.datetime64(st.max, "us").astype(np.int64))
        if not umins or not tmins:        # no stats: cannot skip safely
            keep.append(f)
            continue
        if min(umins) <= uhi and max(umaxs) >= ulo \
                and min(tmins) <= thi and max(tmaxs) >= tlo:
            keep.append(f)
    return keep


def events_zorder_prune(sf_dir: str):
    """Multi-dimensional clustering + file skipping: rewrite events
    Z-ordered on (user_id, ts), then answer a (user-range x time-range)
    box aggregate reading ONLY the files whose zone maps intersect the
    box. Under a single-dimension (ts) sort every file spans the full
    user range — a user-range query reads EVERY file — while the Morton
    layout keeps both dimensions selective per file (the unit test
    asserts strictly fewer files read on a user-dimension box and no
    regression across a mixed box workload: the classic z-order trade of
    best-case single-dim pruning for balanced multi-dim pruning). The
    oracle recomputes the box aggregate from the raw table — proving
    pruning loses nothing."""
    empty = pd.DataFrame({"n_events": pd.Series(dtype="int64"),
                          "value_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    root = tempfile.mkdtemp(prefix="zorder_", dir="/tmp")
    try:
        bounds = _events_bounds(sf_dir)   # one scan serves layout + box
        files = write_layout(sf_dir, root, "zorder", bounds=bounds)
        box = _zorder_box(sf_dir, bounds=bounds)
        keep = surviving_files(files, box)
        if not keep:
            return pd.DataFrame({"n_events": [0], "value_x100": [0]})
        ulo, uhi, tlo, thi = box
        ds = rd.read_parquet(keep, columns=["user_id", "ts", "value"])

        def partial(batch: pa.Table) -> pa.Table:
            u = batch["user_id"].to_numpy(zero_copy_only=False)
            t = batch["ts"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype(np.int64)
            m = (u >= ulo) & (u <= uhi) & (t >= tlo) & (t <= thi)
            v = _cents(batch["value"]).to_numpy(zero_copy_only=False)[m]
            return pa.table({"n_events": [int(m.sum())],
                             "value_x100": [int(v.sum())]})

        from ray.data.aggregate import Sum
        r = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None) \
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("value_x100", alias_name="value_x100"))
        return pd.DataFrame({"n_events": [int(r["n_events"])],
                             "value_x100": [int(r["value_x100"])]})
    finally:
        shutil.rmtree(root, ignore_errors=True)


ZORDER_PRUNE_SQL = """
WITH b AS (SELECT MIN(user_id) AS umin, MAX(user_id) AS umax,
                  MIN(epoch_us(ts)) AS tmin, MAX(epoch_us(ts)) AS tmax
           FROM events)
SELECT COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT)
           AS value_x100
FROM events, b
WHERE user_id >= umin + (umax - umin) * 2 // 5
  AND user_id <= umin + (umax - umin) * 3 // 5
  AND epoch_us(ts) >= tmin + (tmax - tmin) * 2 // 5
  AND epoch_us(ts) <= tmin + (tmax - tmin) * 3 // 5
"""


# ---------------------------------------------------------------------------
# Incrementally-maintained materialized view (append-only refresh)
# ---------------------------------------------------------------------------

MATVIEW_ROOT = "/tmp/pdfxr_matviews"


def _source_files(path: str) -> dict[str, tuple[int, int]]:
    """Fingerprint every file backing a table: path -> (size, mtime_ns).
    Footer-only metadata; no data pages are opened."""
    import pyarrow.dataset as pads
    out = {}
    for f in pads.dataset(path).files:
        st = os.stat(f)
        out[f] = (st.st_size, st.st_mtime_ns)
    return out


def _load_snapshot(store_dir: str):
    """Read the committed snapshot named by the CURRENT pointer.
    Returns (known_fingerprints, view_df) or ({}, None). ANY defect —
    missing pointer, dangling name, unreadable manifest or view — is
    treated as 'no committed snapshot' and heals via full rebuild."""
    import json
    try:
        with open(os.path.join(store_dir, "CURRENT")) as fh:
            snap = fh.read().strip()
        sdir = os.path.join(store_dir, snap)
        with open(os.path.join(sdir, "manifest.json")) as fh:
            known = {k: tuple(v) for k, v in json.load(fh).items()}
        return known, pd.read_parquet(os.path.join(sdir, "view.parquet"))
    except Exception:
        return {}, None


def refresh_orders_monthly_view(sf_dir: str, store_dir: str | None = None):
    """Materialized `orders_monthly` with INCREMENTAL refresh: the view
    store holds the month-level partial aggregate plus a manifest of
    source-file fingerprints. A refresh aggregates ONLY files not yet in
    the manifest (the append-only fast path — at 10^12-document scale a
    daily refresh touches one day of shards, not the table) and merges
    the delta into the stored view; a changed or deleted known file
    voids the append-only assumption and triggers a full rebuild. The
    merge is exact because the view stores int partials (sum, count) —
    the same mergeable-partial property every groupby in this engine
    relies on.

    Commit protocol: view + manifest are written together into a NEW
    snapshot directory, then a one-line CURRENT pointer is atomically
    replaced — a crash at any point leaves the previous snapshot
    committed (never a view whose files the manifest does not list,
    which would double-count on the next refresh), and a corrupt store
    degrades to a full rebuild, not an error. Old snapshots remain
    readable until GC (keep-2), giving time-travel for free.
    Returns (view_df, files_scanned, full_rebuild)."""
    import hashlib
    import json

    src = _pq(sf_dir, "orders")
    if store_dir is None:
        store_dir = os.path.join(
            MATVIEW_ROOT,
            hashlib.sha1(os.path.abspath(src).encode()).hexdigest()[:16])
    os.makedirs(store_dir, exist_ok=True)

    current = _source_files(src)
    known, base = _load_snapshot(store_dir)

    full_rebuild = bool(known) and any(
        k not in current or current[k] != v for k, v in known.items())
    if full_rebuild or base is None:
        known = {}
        base = pd.DataFrame({
            "month": pd.Series(dtype="object"),
            "total_x100": pd.Series(dtype="int64"),
            "n_orders": pd.Series(dtype="int64")})
    new_files = [f for f in current if f not in known]
    if not new_files and not full_rebuild:
        return base, 0, False             # up to date: no commit churn

    import pyarrow.dataset as pads
    if new_files and pads.dataset(new_files).count_rows() > 0:
        ds = rd.read_parquet(new_files,
                             columns=["o_orderdate", "o_totalprice"])

        def partial(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "month": pc.strftime(batch["o_orderdate"], format="%Y-%m")
                .to_pandas(),
                "total_x100": _cents(batch["o_totalprice"]).to_pandas()})
            g = df.groupby("month", as_index=False).agg(
                total_x100=("total_x100", "sum"),
                n_orders=("total_x100", "size"))
            return _from_pandas(g)

        from ray.data.aggregate import Sum
        delta = (ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None)
                 .groupby("month")
                 .aggregate(Sum("total_x100", alias_name="total_x100"),
                            Sum("n_orders", alias_name="n_orders"))
                 .to_pandas())
        base = (pd.concat([base, delta], ignore_index=True)
                .groupby("month", as_index=False)
                .agg(total_x100=("total_x100", "sum"),
                     n_orders=("n_orders", "sum")))

    base = base.sort_values("month").reset_index(drop=True) \
        .astype({"total_x100": "int64", "n_orders": "int64"})

    # commit: snapshot dir first, CURRENT pointer swap last
    snaps = sorted(d for d in os.listdir(store_dir) if d.startswith("v"))
    snap = f"v{(int(snaps[-1][1:]) + 1) if snaps else 1:08d}"
    sdir = os.path.join(store_dir, snap)
    os.makedirs(sdir)
    base.to_parquet(os.path.join(sdir, "view.parquet"))
    with open(os.path.join(sdir, "manifest.json"), "w") as fh:
        json.dump({k: list(v) for k, v in current.items()}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    ptr_tmp = os.path.join(store_dir, "CURRENT.tmp")
    with open(ptr_tmp, "w") as fh:
        fh.write(snap)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(ptr_tmp, os.path.join(store_dir, "CURRENT"))
    for old in snaps[:-1]:                # GC: keep previous + new
        shutil.rmtree(os.path.join(store_dir, old), ignore_errors=True)
    return base, len(new_files), full_rebuild


def orders_monthly_view(sf_dir: str):
    """`orders_monthly` served from the materialized view. The
    driver-visible query uses an EPHEMERAL store (fresh build, removed
    after) so its timing and result never depend on leftover /tmp state
    from earlier runs; the incremental behavior against a persistent
    store is exercised by `tests/test_storage.py::TestMatview`. Same
    oracle as the base query — the view must be indistinguishable from
    recomputation."""
    store = tempfile.mkdtemp(prefix="matview_q_", dir="/tmp")
    try:
        view, _, _ = refresh_orders_monthly_view(sf_dir, store)
        return view[["month", "total_x100", "n_orders"]]
    finally:
        shutil.rmtree(store, ignore_errors=True)


MONTHLY_VIEW_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS total_x100,
       COUNT(*) AS n_orders
FROM orders GROUP BY month ORDER BY month
"""


# ---------------------------------------------------------------------------
# Snapshot diff: what changed between two table versions
# ---------------------------------------------------------------------------

def customer_snapshot_diff(sf_dir: str):
    """Row-level diff between two snapshots of the customer table — the
    base table vs the MERGE-d version (``customer_merge_upsert``) — the
    audit/CDC-extraction primitive of a versioned lakehouse: emit one
    row per INSERTED, DELETED, or UPDATED key (balance change), nothing
    for untouched rows. One side-tagged co-partitioned exchange
    compares the snapshots per key; neither snapshot is broadcast.
    Balances are float64 with NaN for the missing side (matching the
    oracle's nullable BIGINT -> double projection).
    Output: (c_custkey, change, old_bal_x100, new_bal_x100)."""
    empty = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                          "change": pd.Series(dtype="object"),
                          "old_bal_x100": pd.Series(dtype="float64"),
                          "new_bal_x100": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "customer") and _table_empty(sf_dir, "events"):
        return empty

    new_snap = customer_merge_upsert(sf_dir)
    if not isinstance(new_snap, pd.DataFrame):
        new_snap = new_snap.to_pandas()
    new_ds = _from_pandas(pd.DataFrame({
        "key": new_snap["c_custkey"].astype("int64"),
        "side": np.ones(len(new_snap), dtype=np.int8),
        "bal": new_snap["acctbal_x100"].astype("float64")}))
    old = rd.read_parquet(_pq(sf_dir, "customer"),
                          columns=["c_custkey", "c_acctbal"])

    def tag_old(batch: pa.Table) -> pa.Table:
        bal = _cents(batch["c_acctbal"]).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.Table.from_arrays(
            [batch["c_custkey"],
             pa.array(np.zeros(len(batch), dtype=np.int8)),
             pa.array(bal)],
            names=["key", "side", "bal"])

    def diff(part: pd.DataFrame) -> pd.DataFrame:
        o = part[part["side"] == 0].set_index("key")["bal"]
        n = part[part["side"] == 1].set_index("key")["bal"]
        keys = o.index.union(n.index)
        ob = o.reindex(keys)
        nb = n.reindex(keys)
        ins = ob.isna()
        dele = nb.isna()
        upd = (~ins) & (~dele) & (ob != nb)
        changed = ins | dele | upd
        change = np.where(ins, "insert", np.where(dele, "delete", "update"))
        return pd.DataFrame({
            "c_custkey": keys.to_numpy()[changed.to_numpy()],
            "change": change[changed.to_numpy()],
            "old_bal_x100": ob.to_numpy()[changed.to_numpy()],
            "new_bal_x100": nb.to_numpy()[changed.to_numpy()]})

    out = _coarse_grouped_map_union(
        old.map_batches(tag_old, batch_format="pyarrow", batch_size=None),
        rd.from_arrow(new_ds), diff, key="key").to_pandas()
    if out.empty:
        return empty
    return out.sort_values("c_custkey").reset_index(drop=True)


SNAPSHOT_DIFF_SQL = f"""
WITH new_snap AS ({MERGE_UPSERT_SQL.replace("ORDER BY c_custkey", "")}),
old_snap AS (SELECT c_custkey,
                    CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS bal
             FROM customer)
SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
       CASE WHEN o.c_custkey IS NULL THEN 'insert'
            WHEN n.c_custkey IS NULL THEN 'delete'
            ELSE 'update' END AS change,
       CAST(o.bal AS DOUBLE) AS old_bal_x100,
       CAST(n.acctbal_x100 AS DOUBLE) AS new_bal_x100
FROM old_snap o FULL OUTER JOIN new_snap n ON o.c_custkey = n.c_custkey
WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
   OR o.bal <> n.acctbal_x100
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# Small-file compaction (bin-pack fragments to target-size files)
# ---------------------------------------------------------------------------

COMPACT_FRAGMENTS = 48   # fragmentation factor for the demo query
COMPACT_BINS = 8         # target ~8 compacted files


def plan_compaction_bins(in_dir: str,
                         target_bytes: int) -> list[list[str]]:
    """Deterministic next-fit bin packing over the fragment FILE SIZES
    (footer metadata only — the plan never reads data bytes, so at
    100 TB planning is O(n_files) driver work on a directory listing).
    Files are taken in sorted-name order; a bin closes when adding the
    next file would exceed ``target_bytes`` (a single oversized file
    gets its own bin — compaction never splits a file)."""
    files = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if f.endswith(".parquet"))
    bins: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f in files:
        s = os.path.getsize(f)
        if cur and cur_bytes + s > target_bytes:
            bins.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += s
    if cur:
        bins.append(cur)
    return bins


def compact_parquet_dir(in_dir: str, out_dir: str,
                        target_bytes: int):
    """Distributed small-file compaction: rewrite a directory of many
    small parquet fragments into ~``total/target_bytes`` files of
    ~``target_bytes`` each — the table-maintenance pass every long-lived
    100 TB dataset needs after incremental/resumable writes (the north
    rule's per-shard sinks produce one file per shard; readers want
    row-group-sized files). One Ray task per output bin reads only its
    own fragments and writes exactly one file (idempotent name
    ``part-{bin:05d}.parquet``), so a failed run reruns only missing
    bins and no task ever holds more than ``target_bytes`` of input.
    Returns the per-bin stats Dataset (bin, n_files, rows)."""
    os.makedirs(out_dir, exist_ok=True)
    bins = plan_compaction_bins(in_dir, target_bytes)

    def compact_bin(row: dict) -> dict:
        import pyarrow.parquet as pq
        tbl = pa.concat_tables([pq.read_table(f) for f in row["files"]])
        pq.write_table(
            tbl, os.path.join(out_dir, f"part-{row['bin']:05d}.parquet"))
        return {"bin": row["bin"], "n_files": len(row["files"]),
                "rows": tbl.num_rows}

    if not bins:
        return rd.from_items([])
    return rd.from_items(
        [{"bin": i, "files": b} for i, b in enumerate(bins)]).map(compact_bin)


def events_compacted_roundtrip(sf_dir: str):
    """Fragment events into COMPACT_FRAGMENTS small files, compact them
    to ~COMPACT_BINS target-size files with ``compact_parquet_dir``,
    then recompute (n_events, value_x100) FROM THE COMPACTED LAYOUT.
    The oracle recomputes from the raw table, proving the compaction
    round-trip is lossless (row- and value-exact)."""
    empty = pd.DataFrame({"n_events": pd.Series(dtype="int64"),
                          "value_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    root = tempfile.mkdtemp(prefix="compact_", dir="/tmp")
    try:
        frag = os.path.join(root, "frags")
        outd = os.path.join(root, "compacted")
        (rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "value"])
         .repartition(COMPACT_FRAGMENTS).write_parquet(frag))
        total = sum(os.path.getsize(os.path.join(frag, f))
                    for f in os.listdir(frag))
        stats = compact_parquet_dir(
            frag, outd, max(1, total // COMPACT_BINS)).to_pandas()
        assert int(stats["n_files"].sum()) == len(os.listdir(frag))

        def partial(batch: pa.Table) -> pa.Table:
            v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "n_events": [len(v)],
                "value_x100": [int(v.sum())]})

        agg = (rd.read_parquet(outd, columns=["value"])
               .map_batches(partial, batch_format="pyarrow",
                            batch_size=None).to_pandas())
        return pd.DataFrame({"n_events": [int(agg["n_events"].sum())],
                             "value_x100": [int(agg["value_x100"].sum())]})
    finally:
        shutil.rmtree(root, ignore_errors=True)


COMPACTED_ROUNDTRIP_SQL = """
SELECT COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT)
           AS value_x100
FROM events
"""


# ---------------------------------------------------------------------------
# Columnar-format interchange: ORC and Arrow-IPC roundtrips
# ---------------------------------------------------------------------------

FORMAT_ROUNDTRIP_SHARDS = 12


def _format_roundtrip(sf_dir: str, write_fn, read_fn):
    """Shared body: shard events through the engine into the target
    format (one file per block, distributed write), read it back with
    the matching file-parallel reader, and recompute exact totals FROM
    THE ROUNDTRIPPED LAYOUT. The oracle recomputes from the raw parquet
    table, proving the format conversion is lossless (row-, id- and
    value-exact)."""
    empty = pd.DataFrame({"n_events": pd.Series(dtype="int64"),
                          "id_sum": pd.Series(dtype="int64"),
                          "value_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    root = tempfile.mkdtemp(prefix="fmt_rt_", dir="/tmp")
    try:
        ds = (rd.read_parquet(_pq(sf_dir, "events"),
                              columns=["event_id", "value"])
              .repartition(FORMAT_ROUNDTRIP_SHARDS))
        write_fn(ds, root)

        def partial(batch: pa.Table) -> pa.Table:
            ids = batch["event_id"].to_numpy(zero_copy_only=False)
            v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "n_events": [len(ids)], "id_sum": [int(ids.sum())],
                "value_x100": [int(v.sum())]})

        agg = (read_fn(root)
               .map_batches(partial, batch_format="pyarrow",
                            batch_size=None).to_pandas())
        return pd.DataFrame({
            "n_events": [int(agg["n_events"].sum())],
            "id_sum": [int(agg["id_sum"].sum())],
            "value_x100": [int(agg["value_x100"].sum())]})
    finally:
        shutil.rmtree(root, ignore_errors=True)


def events_orc_roundtrip(sf_dir: str):
    """Distributed parquet -> ORC -> engine roundtrip (S-family source/
    sink coverage for the warehouse-native columnar format)."""
    from ..sources.io import read_orc_dir, write_orc
    return _format_roundtrip(sf_dir, write_orc, read_orc_dir)


def events_ipc_roundtrip(sf_dir: str):
    """Distributed parquet -> Arrow IPC (Feather v2) -> engine
    roundtrip (the zero-parse interchange path between Arrow-native
    stages)."""
    from ..sources.io import read_ipc_dir, write_ipc
    return _format_roundtrip(sf_dir, write_ipc, read_ipc_dir)


FORMAT_ROUNDTRIP_SQL = """
SELECT COUNT(*) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS id_sum,
       CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT)
           AS value_x100
FROM events
"""


# ---------------------------------------------------------------------------
# Schema evolution: reader-side unification of heterogeneous snapshots
# ---------------------------------------------------------------------------

EVOLVE_FILL = "UNKNOWN"


def orders_schema_evolution(sf_dir: str):
    """Reader-side schema evolution — the lakehouse contract that old
    files written before a column existed stay readable next to new
    files: snapshot v1 (even orderkeys) is written WITHOUT
    o_orderpriority, snapshot v2 (odd orderkeys) with it and with a
    different column order; the unified read fills the missing column
    with '{EVOLVE_FILL}' and aggregates per priority. Each snapshot is
    read file-parallel with its OWN schema and normalized to the
    evolved schema inside `map_batches` (no driver-side row work); the
    oracle recomputes the same aggregate from the raw table, proving
    the evolved layout is lossless. Output: (o_orderpriority, n_orders,
    total_x100)."""
    empty = pd.DataFrame({"o_orderpriority": pd.Series(dtype="object"),
                          "n_orders": pd.Series(dtype="int64"),
                          "total_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "orders"):
        return empty
    root = tempfile.mkdtemp(prefix="evolve_", dir="/tmp")
    try:
        base = rd.read_parquet(_pq(sf_dir, "orders"),
                               columns=["o_orderkey", "o_totalprice",
                                        "o_orderpriority"])

        def v1(batch: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(batch["o_orderkey"], 1), 0)
            t = batch.filter(keep)
            return t.select(["o_orderkey", "o_totalprice"])

        def v2(batch: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(batch["o_orderkey"], 1), 1)
            t = batch.filter(keep)
            # reordered columns: evolution must not depend on position
            return t.select(["o_orderpriority", "o_totalprice",
                             "o_orderkey"])

        base.map_batches(v1, batch_format="pyarrow", batch_size=None) \
            .write_parquet(os.path.join(root, "v1"))
        base.map_batches(v2, batch_format="pyarrow", batch_size=None) \
            .write_parquet(os.path.join(root, "v2"))

        EVOLVED = ["o_orderkey", "o_totalprice", "o_orderpriority"]

        def widen_v1(batch: pa.Table) -> pa.Table:
            fill = pa.array([EVOLVE_FILL] * len(batch))
            return batch.append_column("o_orderpriority", fill) \
                .select(EVOLVED)

        def reorder_v2(batch: pa.Table) -> pa.Table:
            return batch.select(EVOLVED)

        unified = (rd.read_parquet(os.path.join(root, "v1"))
                   .map_batches(widen_v1, batch_format="pyarrow",
                                batch_size=None)
                   .union(rd.read_parquet(os.path.join(root, "v2"))
                          .map_batches(reorder_v2, batch_format="pyarrow",
                                       batch_size=None)))

        def partial(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "o_orderpriority":
                    batch["o_orderpriority"].to_numpy(zero_copy_only=False),
                "total_x100": _cents(batch["o_totalprice"])
                    .to_numpy(zero_copy_only=False)})
            g = df.groupby("o_orderpriority").agg(
                n_orders=("total_x100", "size"),
                total_x100=("total_x100", "sum")).reset_index()
            return _from_pandas(g.astype({"n_orders": "int64",
                                          "total_x100": "int64"}))

        from ray.data.aggregate import Sum
        return (unified
                .map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
                .groupby("o_orderpriority")
                .aggregate(Sum("n_orders", alias_name="n_orders"),
                           Sum("total_x100", alias_name="total_x100"))
                .sort("o_orderpriority")
                .to_pandas())
    finally:
        shutil.rmtree(root, ignore_errors=True)


SCHEMA_EVOLUTION_SQL = f"""
SELECT CASE WHEN o_orderkey % 2 = 0 THEN '{EVOLVE_FILL}'
            ELSE o_orderpriority END AS o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS total_x100
FROM orders
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Bucketed tables: shuffle-once-at-write, exchange-free co-located join
# ---------------------------------------------------------------------------

JOIN_BUCKETS = 16


def orders_customer_bucketed_join(sf_dir: str):
    """Bucketed-table join — the storage optimization that pays the
    shuffle ONCE at write time: both orders and customer are written
    Hive-partitioned by hash-bucket(custkey) % {JOIN_BUCKETS}; the join
    then runs as one independent task per bucket pair (each task reads
    exactly two co-located directories and joins in memory), with NO
    runtime exchange of either table. Per-segment revenue totals prove
    the bucketed layout joins losslessly vs the raw-table oracle.
    Output: (c_mktsegment, n_orders, total_x100)."""
    empty = pd.DataFrame({"c_mktsegment": pd.Series(dtype="object"),
                          "n_orders": pd.Series(dtype="int64"),
                          "total_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "orders") or _table_empty(sf_dir, "customer"):
        return empty
    root = tempfile.mkdtemp(prefix="bucketed_", dir="/tmp")
    try:
        def bucketize(key: str):
            def f(batch: pa.Table) -> pa.Table:
                b = (batch[key].to_numpy(zero_copy_only=False)
                     % JOIN_BUCKETS).astype(np.int64)
                return batch.append_column("bucket", pa.array(b))
            return f

        (rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])
         .map_batches(bucketize("o_custkey"), batch_format="pyarrow",
                      batch_size=None)
         .write_parquet(os.path.join(root, "orders"),
                        partition_cols=["bucket"]))
        (rd.read_parquet(_pq(sf_dir, "customer"),
                         columns=["c_custkey", "c_mktsegment"])
         .map_batches(bucketize("c_custkey"), batch_format="pyarrow",
                      batch_size=None)
         .write_parquet(os.path.join(root, "customer"),
                        partition_cols=["bucket"]))

        def join_bucket(row: dict) -> list[dict]:
            b = int(row["bucket"])
            od = os.path.join(root, "orders", f"bucket={b}")
            cd = os.path.join(root, "customer", f"bucket={b}")
            if not (os.path.isdir(od) and os.path.isdir(cd)):
                return []
            odf = pd.read_parquet(od)
            cdf = pd.read_parquet(cd)
            j = odf.merge(cdf, left_on="o_custkey", right_on="c_custkey")
            if j.empty:
                return []
            j["total_x100"] = np.round(
                j["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
            g = j.groupby("c_mktsegment").agg(
                n_orders=("total_x100", "size"),
                total_x100=("total_x100", "sum")).reset_index()
            return [{"c_mktsegment": r.c_mktsegment,
                     "n_orders": int(r.n_orders),
                     "total_x100": int(r.total_x100)}
                    for r in g.itertuples(index=False)]

        from ray.data.aggregate import Sum
        out = (rd.from_items([{"bucket": b} for b in range(JOIN_BUCKETS)])
               .flat_map(join_bucket)
               .groupby("c_mktsegment")
               .aggregate(Sum("n_orders", alias_name="n_orders"),
                          Sum("total_x100", alias_name="total_x100"))
               .sort("c_mktsegment")
               .to_pandas())
        return out if not out.empty else empty
    finally:
        shutil.rmtree(root, ignore_errors=True)


BUCKETED_JOIN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS total_x100
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Federated multi-format read: one logical table across 3 file formats
# ---------------------------------------------------------------------------

def events_multiformat_union(sf_dir: str):
    """Federated read — one logical events table whose shards live in
    THREE formats at once (parquet / ORC / Arrow IPC, split by
    event_id % 3, the mid-migration state every lakehouse passes
    through): each shard set is written distributed in its native
    format, read back with the matching file-parallel reader, and the
    three Datasets union into one stream for the exact totals. The
    oracle recomputes from the raw table, proving the federation is
    lossless. Output: (n_events, id_sum, value_x100)."""
    empty = pd.DataFrame({"n_events": pd.Series(dtype="int64"),
                          "id_sum": pd.Series(dtype="int64"),
                          "value_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    from ..sources.io import (read_ipc_dir, read_orc_dir, write_ipc,
                              write_orc)
    root = tempfile.mkdtemp(prefix="multifmt_", dir="/tmp")
    try:
        base = rd.read_parquet(_pq(sf_dir, "events"),
                               columns=["event_id", "value"])

        def shard_np(k: int):
            def f(batch: pa.Table) -> pa.Table:
                e = batch["event_id"].to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(e % 3 == k))
            return f

        parts = [base.map_batches(shard_np(k), batch_format="pyarrow",
                                  batch_size=None).repartition(4)
                 for k in range(3)]
        parts[0].write_parquet(os.path.join(root, "pq"))
        write_orc(parts[1], os.path.join(root, "orc"))
        write_ipc(parts[2], os.path.join(root, "ipc"))

        unioned = (rd.read_parquet(os.path.join(root, "pq"))
                   .union(read_orc_dir(os.path.join(root, "orc")))
                   .union(read_ipc_dir(os.path.join(root, "ipc"))))

        def partial(batch: pa.Table) -> pa.Table:
            t = batch.select(["event_id", "value"])
            ids = t["event_id"].to_numpy(zero_copy_only=False)
            v = _cents(t["value"]).to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict({
                "n_events": [len(ids)], "id_sum": [int(ids.sum())],
                "value_x100": [int(v.sum())]})

        agg = (unioned.map_batches(partial, batch_format="pyarrow",
                                   batch_size=None).to_pandas())
        return pd.DataFrame({
            "n_events": [int(agg["n_events"].sum())],
            "id_sum": [int(agg["id_sum"].sum())],
            "value_x100": [int(agg["value_x100"].sum())]})
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# SCD2 history build from a CDC changelog
# ---------------------------------------------------------------------------

def events_scd2_history(sf_dir: str):
    """Slowly-changing-dimension (type 2) history from the event
    changelog: per user, events are balance versions — same-timestamp
    duplicates collapse to the max event_id (log order), then each
    version gets [valid_from, valid_to) with valid_to = the next
    version's timestamp and the -1 sentinel on the current row — the
    dimension-table historization every warehouse load performs. One
    user-keyed exchange; the interval assignment is one vectorized
    sort + shift per partition. Output: (user_id, version_no,
    bal_x100, valid_from_ms, valid_to_ms, is_current)."""
    from .relational import _coarse_partition_map
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("user_id", "version_no", "bal_x100",
                           "valid_from_ms", "valid_to_ms",
                           "is_current")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        ts_ms = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 1000
        return pa.Table.from_arrays(
            [batch["user_id"], pa.array(ts_ms), batch["event_id"],
             _cents(batch["value"])],
            names=["user_id", "ts_ms", "event_id", "bal_x100"])

    def historize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_ms", "event_id"]) \
            .drop_duplicates(["user_id", "ts_ms"], keep="last")
        nxt = g.groupby("user_id")["ts_ms"].shift(-1)
        return pd.DataFrame({
            "user_id": g["user_id"].astype("int64"),
            "version_no": g.groupby("user_id").cumcount().astype("int64")
            + 1,
            "bal_x100": g["bal_x100"].astype("int64"),
            "valid_from_ms": g["ts_ms"].astype("int64"),
            "valid_to_ms": nxt.fillna(-1).astype("int64"),
            "is_current": nxt.isna().astype("int64")})

    return _coarse_partition_map(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        "user_id", historize).sort(["user_id", "version_no"])


SCD2_SQL = """
WITH v AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
         CAST(ROUND(value * 100.0) AS BIGINT) AS bal_x100,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events),
d AS (SELECT user_id, ts_ms, bal_x100 FROM v WHERE rn = 1),
h AS (
  SELECT user_id, ts_ms, bal_x100,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_ms)
             AS version_no,
         LEAD(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms)
             AS next_ts
  FROM d)
SELECT user_id, CAST(version_no AS BIGINT) AS version_no, bal_x100,
       CAST(ts_ms AS BIGINT) AS valid_from_ms,
       CAST(COALESCE(next_ts, -1) AS BIGINT) AS valid_to_ms,
       CAST(CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS BIGINT)
           AS is_current
FROM h
ORDER BY user_id, version_no
"""


# ---------------------------------------------------------------------------
# Point-in-time (PIT) join of orders against the SCD2 dimension
# ---------------------------------------------------------------------------

PIT_DIM_TYPE = "purchase"   # changelog that versions the dimension
PIT_FACT_TYPE = "click"     # probe facts looked up point-in-time


def events_pit_join(sf_dir: str):
    """Point-in-time (PIT) join: each probe fact (a ``click`` event)
    looked up against the SCD2 balance-version history its user's
    ``purchase`` changelog defines (historized exactly as
    ``events_scd2_history``) to find the version VALID AT the click
    timestamp — the feature-store / bitemporal lookup that prevents
    label leakage in training pipelines. ONE events scan splits the
    two roles by type; both sides co-partition through one side-tagged
    coarse exchange on the user key (nothing broadcast); each
    partition historizes its users' changelog vectorized and resolves
    all its probes with a single ``merge_asof`` — versions are
    contiguous, so backward-asof on valid_from IS the
    [valid_from, valid_to) containment probe. Clicks before their
    user's first version (or with no versions) drop out, mirroring the
    oracle's inner range join. Output: (event_id, user_id, version_no,
    bal_x100)."""
    from .relational import _coarse_partition_map
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("event_id", "user_id", "version_no",
                           "bal_x100")})
    if _table_empty(sf_dir, "events"):
        return empty

    def tag(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == PIT_DIM_TYPE) | (et == PIT_FACT_TYPE)
        t = batch.filter(pa.array(keep))
        if len(t) == 0:
            return pa.Table.from_pydict(
                {"user_id": [], "side": [], "t_ms": [], "event_id": [],
                 "bal_x100": []},
                schema=pa.schema([("user_id", pa.int64()),
                                  ("side", pa.int8()),
                                  ("t_ms", pa.int64()),
                                  ("event_id", pa.int64()),
                                  ("bal_x100", pa.int64())]))
        ts_ms = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 1000
        side = (t["event_type"].to_numpy(zero_copy_only=False)
                == PIT_FACT_TYPE).astype(np.int8)
        return pa.Table.from_arrays(
            [t["user_id"], pa.array(side), pa.array(ts_ms),
             t["event_id"], _cents(t["value"])],
            names=["user_id", "side", "t_ms", "event_id", "bal_x100"])

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value",
                                  "event_type"]) \
        .map_batches(tag, batch_format="pyarrow", batch_size=None)

    def pit_part(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["side"] == 0]
        fx = g[g["side"] == 1]
        if ev.empty or fx.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                 ("event_id", "user_id", "version_no",
                                  "bal_x100")})
        v = ev.sort_values(["user_id", "t_ms", "event_id"]) \
            .drop_duplicates(["user_id", "t_ms"], keep="last")
        v = v.assign(version_no=v.groupby("user_id").cumcount()
                     .astype("int64") + 1) \
            [["user_id", "t_ms", "version_no", "bal_x100"]] \
            .sort_values("t_ms", kind="stable")
        o = fx[["event_id", "user_id", "t_ms"]].sort_values(
            "t_ms", kind="stable")
        m = pd.merge_asof(o, v, on="t_ms", by="user_id",
                          direction="backward")
        m = m[m["version_no"].notna()]
        return pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["user_id"].astype("int64"),
            "version_no": m["version_no"].astype("int64"),
            "bal_x100": m["bal_x100"].astype("int64")})

    return _coarse_partition_map(ds, "user_id", pit_part) \
        .sort("event_id")


PIT_JOIN_SQL = f"""
WITH v AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms,
         CAST(ROUND(value * 100.0) AS BIGINT) AS bal_x100,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = '{PIT_DIM_TYPE}'),
d AS (SELECT user_id, ts_ms, bal_x100 FROM v WHERE rn = 1),
h AS (
  SELECT user_id, ts_ms, bal_x100,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_ms)
             AS version_no,
         LEAD(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms)
             AS next_ts
  FROM d)
SELECT f.event_id, h.user_id,
       CAST(h.version_no AS BIGINT) AS version_no, h.bal_x100
FROM events f JOIN h
  ON f.event_type = '{PIT_FACT_TYPE}'
 AND h.user_id = f.user_id
 AND epoch_ms(f.ts) >= h.ts_ms
 AND (h.next_ts IS NULL OR epoch_ms(f.ts) < h.next_ts)
ORDER BY f.event_id
"""


# ---------------------------------------------------------------------------
# Exactly-once ingestion: duplicated-delivery replay + idempotent dedupe
# ---------------------------------------------------------------------------

EO_DUP_MOD = 7      # every 7th event is delivered twice in the replay


def events_exactly_once_ingest(sf_dir: str):
    """At-least-once delivery made exactly-once: the event log is
    replayed with deterministic duplicated deliveries (every event_id %
    {EO_DUP_MOD} == 0 arrives twice — the redelivery a crashed producer
    causes), and the ingest dedupes on the event key through one
    key-hashed exchange, so the committed table equals the clean log
    regardless of delivery count. Emits the reconciliation row an
    idempotent sink reports: deliveries seen, unique rows committed,
    duplicate rate, and an exact content checksum (id sum + value cents
    sum) that must match the clean log's. Output: (n_delivered,
    n_unique, dup_rate_x1e6, id_sum, value_x100_sum)."""
    from .relational import _coarse_partition_map
    cols = ("n_delivered", "n_unique", "dup_rate_x1e6", "id_sum",
            "value_x100_sum")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "value"])
    def _redelivered(batch: pa.Table) -> pa.Table:
        e = batch.column("event_id").to_numpy()
        return batch.filter(pa.array(e % EO_DUP_MOD == 0))

    replay = ds.union(
        ds.map_batches(_redelivered, batch_format="pyarrow"))

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates("event_id")
        return pd.DataFrame({
            "n_delivered": [len(g)], "n_unique": [len(u)],
            "id_sum": [int(u["event_id"].sum())],
            "value_x100_sum": [int(_cents(
                pa.array(u["value"].to_numpy())).to_numpy().sum())]}) \
            .astype("int64")

    parts = _coarse_partition_map(replay, "event_id", dedupe).to_pandas()
    n_del = int(parts["n_delivered"].sum())
    n_uniq = int(parts["n_unique"].sum())
    return pd.DataFrame({
        "n_delivered": [n_del], "n_unique": [n_uniq],
        "dup_rate_x1e6": [(n_del - n_uniq) * 1_000_000 // n_del],
        "id_sum": [int(parts["id_sum"].sum())],
        "value_x100_sum": [int(parts["value_x100_sum"].sum())]})


EXACTLY_ONCE_SQL = f"""
WITH replay AS (
  SELECT event_id, value FROM events
  UNION ALL
  SELECT event_id, value FROM events WHERE event_id % {EO_DUP_MOD} = 0),
u AS (
  SELECT event_id, MIN(value) AS value FROM replay GROUP BY event_id),
m AS (
  SELECT (SELECT COUNT(*) FROM replay) AS n_delivered,
         COUNT(*) AS n_unique,
         CAST(SUM(event_id) AS BIGINT) AS id_sum,
         CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT)
             AS value_x100_sum
  FROM u)
SELECT CAST(n_delivered AS BIGINT) AS n_delivered,
       CAST(n_unique AS BIGINT) AS n_unique,
       CAST((n_delivered - n_unique) * 1000000 // n_delivered AS BIGINT)
           AS dup_rate_x1e6,
       id_sum, value_x100_sum
FROM m
"""


# --- WebDataset tar shard export (interleaved interchange) -------------


def docs_webdataset_shards(sf_dir: str):
    """Export the interleaved corpus as WebDataset-style tar shards
    (sources/wds.py: canonical per-doc JSON member + one payload member
    per media span, content-addressed shard = md5(doc_id) % 8,
    deterministic bytes) and report the per-shard manifest stats. The
    tar write/read round-trip and byte-level determinism are pinned by
    tests/test_wds.py; the shard/doc/media accounting is oracled here
    by replaying the shard hash and the media derivation in SQL.
    Output: (shard_id, n_docs, n_media)."""
    from ..sources.wds import write_webdataset
    from .spans import interleaved_docs

    out_dir = tempfile.mkdtemp(prefix="pdfxr_wds_",
                               dir="/tmp")
    try:
        manifest = write_webdataset(interleaved_docs(sf_dir), out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return manifest[["shard_id", "n_docs", "n_media"]]


WDS_SHARDS_SQL = """
WITH gs AS (
  SELECT doc_id, coalesce(text, '') AS txt,
         unnest(range(0, CAST(ceil(length(coalesce(text, '')) / 40.0)
                               AS BIGINT))) AS g
  FROM documents),
per_doc AS (
  SELECT d.doc_id,
         CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 8 AS shard_id,
         COALESCE(m.n_media, 0) AS n_media
  FROM documents d
  LEFT JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_media
             FROM gs WHERE g % 4 = 2 GROUP BY doc_id) m
    USING (doc_id))
SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_media) AS BIGINT) AS n_media
FROM per_doc
GROUP BY shard_id
ORDER BY shard_id
"""


STORAGE_QUERIES: dict[str, tuple] = {
    "docs_webdataset_shards": (docs_webdataset_shards, WDS_SHARDS_SQL),
    "events_pit_join": (events_pit_join, PIT_JOIN_SQL),
    "events_exactly_once_ingest": (events_exactly_once_ingest,
                                   EXACTLY_ONCE_SQL),
    "events_scd2_history": (events_scd2_history, SCD2_SQL),
    "events_multiformat_union": (events_multiformat_union,
                                 FORMAT_ROUNDTRIP_SQL),
    "orders_schema_evolution": (orders_schema_evolution,
                                SCHEMA_EVOLUTION_SQL),
    "orders_customer_bucketed_join": (orders_customer_bucketed_join,
                                      BUCKETED_JOIN_SQL),
    "events_orc_roundtrip": (events_orc_roundtrip, FORMAT_ROUNDTRIP_SQL),
    "events_ipc_roundtrip": (events_ipc_roundtrip, FORMAT_ROUNDTRIP_SQL),
    "orders_monthly_view": (orders_monthly_view, MONTHLY_VIEW_SQL),
    "events_zorder_prune": (events_zorder_prune, ZORDER_PRUNE_SQL),
    "customer_merge_upsert": (customer_merge_upsert, MERGE_UPSERT_SQL),
    "customer_snapshot_diff": (customer_snapshot_diff, SNAPSHOT_DIFF_SQL),
    "events_partitioned_prune": (events_partitioned_prune,
                                 PARTITIONED_PRUNE_SQL),
    "events_compacted_roundtrip": (events_compacted_roundtrip,
                                   COMPACTED_ROUNDTRIP_SQL),
}
