"""Stateful streaming windowing — the raw-actor tier (SURVEY.md §2.10;
ray_guide "streaming-shaped workloads").

The reference has no streaming semantics; this is the engine capability a
stream-shaped corpus needs: treat ``events`` as an ordered, partitioned
log, keep incremental per-key window state in one actor per key-hash
bucket, feed batches in timestamp order, close windows as the watermark
(max seen ts - allowed lateness) passes them, flush the rest at
end-of-log.

Partitioning assumption (documented per the task's custom-operator rule):
rows for one user always route to the same bucket actor, and arrive in
ts order WITHIN their bucket (watermarks are per-actor state, so only
per-bucket order matters — no global sort). The log is staged as
bucket-partitioned parquet (a real deployment reads an
already-partitioned stream, e.g. one Kafka partition per bucket), and
one feeder TASK per bucket drives its actor — the driver never touches
an event batch, so no single process is the throughput ceiling. The
final result is independent of bucketing and equals the batch group-by
— which is exactly what the DuckDB oracle checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

N_BUCKETS = 8
ALLOWED_LATENESS_MS = 3_600_000        # 1 window of lateness


@ray.remote(num_cpus=0.1)     # state-holders, not compute hogs: fractional
class WindowActor:            # reservation so small sessions can host all
                              # buckets without starving the sort/read ops
    """Incremental tumbling-window (1h) aggregator for one key bucket."""

    def __init__(self):
        self.open: dict[tuple[int, int], list[int]] = {}   # (user, hour_ms) -> [n, sum]
        self.closed: list[tuple[int, int, int, int]] = []
        self.max_ts_ms = -(1 << 62)

    def add(self, user_id: np.ndarray, ts_ms: np.ndarray,
            value_x1e6: np.ndarray) -> int:
        hours = (ts_ms // 3_600_000) * 3_600_000
        for u, h, v in zip(user_id.tolist(), hours.tolist(),
                           value_x1e6.tolist()):
            key = (u, h)
            cur = self.open.get(key)
            if cur is None:
                self.open[key] = [1, v]
            else:
                cur[0] += 1
                cur[1] += v
        if len(ts_ms):
            self.max_ts_ms = max(self.max_ts_ms, int(ts_ms.max()))
        # close windows fully behind the watermark
        watermark = self.max_ts_ms - ALLOWED_LATENESS_MS
        for key in [k for k in self.open if k[1] + 3_600_000 <= watermark]:
            n, s = self.open.pop(key)
            self.closed.append((key[0], key[1], n, s))
        return len(self.closed)

    def flush(self) -> list[tuple[int, int, int, int]]:
        for key, (n, s) in self.open.items():
            self.closed.append((key[0], key[1], n, s))
        self.open.clear()
        return self.closed

    # -- checkpointing: plain-python state so a preempted bucket can be
    #    re-hosted on a fresh actor and resume at a file boundary
    def snapshot(self) -> dict:
        return {"open": [[list(k), v] for k, v in self.open.items()],
                "closed": list(self.closed),
                "max_ts_ms": self.max_ts_ms}

    def restore(self, state: dict) -> None:
        self.open = {tuple(k): list(v) for k, v in state["open"]}
        self.closed = [tuple(r) for r in state["closed"]]
        self.max_ts_ms = state["max_ts_ms"]


@ray.remote(num_cpus=1)
def _feed_bucket(part_dir: str, actor) -> int:
    """Feeder task for ONE bucket: read that bucket's partition of the
    staged log, order it by ts (per-bucket sort — watermarks are
    per-actor, so global order is never needed), and drive the bucket's
    actor batch by batch. At real scale the partition is a time-ordered
    file sequence and the feeder streams file-by-file instead of
    concatenating (noted; the per-bucket memory here is |log|/N_BUCKETS)."""
    import glob as _glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..functions.arrow_utils import round_half_away

    files = sorted(_glob.glob(f"{part_dir}/*.parquet"))
    if not files:
        return 0
    t = pa.concat_tables([pq.read_table(f, columns=["user_id", "ts", "value"])
                          for f in files])
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    pending = []
    for batch in t.to_batches(max_chunksize=4096):
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        ts_ms = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 1000
        vals = round_half_away(
            batch["value"].to_numpy(zero_copy_only=False) * 1e6)
        pending.append(actor.add.remote(users, ts_ms, vals))
    ray.get(pending)                     # ordered per actor (actor mailbox)
    return t.num_rows


@ray.remote(num_cpus=1)
def _feed_bucket_checkpointed(part_dir: str, actor,
                              ckpt_path: str) -> int:
    """Checkpointing feeder for ONE bucket: files feed in sorted-name
    order (the staged log's time-ordered sequence); after EVERY file
    the actor's snapshot persists atomically next to a cursor, so a
    preempted bucket resumes on a fresh actor from the last complete
    file — no event is fed twice and none is skipped. The snapshot is
    per-bucket state (open windows x users-in-bucket), never the
    stream."""
    import glob as _glob
    import json
    import os as _os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..functions.arrow_utils import round_half_away

    files = sorted(_glob.glob(f"{part_dir}/*.parquet"))
    start = 0
    if _os.path.exists(ckpt_path):
        with open(ckpt_path) as f:
            state = json.load(f)
        start = state["next_file"]
        ray.get(actor.restore.remote(state["actor"]))
    fed = 0
    for i in range(start, len(files)):
        t = pq.read_table(files[i], columns=["user_id", "ts", "value"])
        t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
        pending = []
        for batch in t.to_batches(max_chunksize=4096):
            users = batch["user_id"].to_numpy(zero_copy_only=False)
            ts_ms = batch["ts"].to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").astype(np.int64) // 1000
            vals = round_half_away(
                batch["value"].to_numpy(zero_copy_only=False) * 1e6)
            pending.append(actor.add.remote(users, ts_ms, vals))
        ray.get(pending)
        fed += t.num_rows
        snap = ray.get(actor.snapshot.remote())
        tmp = ckpt_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"next_file": i + 1, "actor": snap}, f)
        _os.replace(tmp, ckpt_path)          # atomic commit
    return fed


def events_stream_windows(sf_dir: str):
    """Per-(user, hour) event counts/sums computed INCREMENTALLY by bucket
    actors over the partitioned log; result equals the batch group-by.

    Shape: one hash-partitioning pass stages the log as bucket=N parquet
    (the partitioned-stream emulation), then N_BUCKETS feeder tasks run
    in parallel, each driving its own actor — no driver loop, no global
    sort."""
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="stream_stage_", dir="/tmp")
    try:
        def add_bucket(batch: pa.Table) -> pa.Table:
            b = batch["user_id"].to_numpy(zero_copy_only=False) % N_BUCKETS
            return batch.append_column("bucket",
                                       pa.array(b.astype(np.int64)))

        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "value"]) \
            .map_batches(add_bucket, batch_format="pyarrow", batch_size=None) \
            .write_parquet(stage, partition_cols=["bucket"])

        actors = [WindowActor.remote() for _ in range(N_BUCKETS)]
        ray.get([_feed_bucket.remote(f"{stage}/bucket={b}", actors[b])
                 for b in range(N_BUCKETS)])
        rows = [r for chunk in ray.get([a.flush.remote() for a in actors])
                for r in chunk]
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    df = pd.DataFrame(rows, columns=["user_id", "hour_ms", "n_events",
                                     "value_x1e6"]).astype("int64")
    df["hour"] = pd.to_datetime(df["hour_ms"], unit="ms") \
        .dt.strftime("%Y-%m-%d %H")
    return df[["user_id", "hour", "n_events", "value_x1e6"]] \
        .sort_values(["user_id", "hour"]).reset_index(drop=True)


STREAM_WINDOWS_SQL = """
SELECT user_id, strftime(ts, '%Y-%m-%d %H') AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS BIGINT) AS value_x1e6
FROM events
GROUP BY user_id, hour
ORDER BY user_id, hour
"""


# ---------------------------------------------------------------------------
# Stream-stream interval join (last-click attribution)
# ---------------------------------------------------------------------------

ATTR_WINDOW_MS = 3_600_000   # purchase attributes to a click <= 1h before


@ray.remote(num_cpus=0.1)
class AttributionActor:
    """Incremental last-click attribution for one key bucket: per user,
    a bounded buffer of recent clicks (evicted once older than the
    window behind the bucket's clock — state is window x arrival rate,
    never the stream). The feed arrives in (ts, event_id) log order, so
    when a purchase arrives every attributable click is already
    buffered and the LAST buffer entry inside the window is the match;
    no retraction logic is needed."""

    def __init__(self):
        self.clicks: dict[int, list[tuple[int, int]]] = {}   # user -> [(ts_ms, id)]
        self.out: list[tuple[int, int, int, int]] = []

    def add(self, user_id: np.ndarray, ts_ms: np.ndarray,
            event_id: np.ndarray, is_click: np.ndarray) -> int:
        for u, t, eid, c in zip(user_id.tolist(), ts_ms.tolist(),
                                event_id.tolist(), is_click.tolist()):
            buf = self.clicks.get(u)
            lo = t - ATTR_WINDOW_MS
            if c:
                if buf is None:
                    self.clicks[u] = [(t, eid)]
                else:
                    # evict on EVERY arrival, not only purchases — a
                    # click-heavy user who never buys must not grow the
                    # buffer past window x rate
                    while buf and buf[0][0] < lo:
                        buf.pop(0)
                    buf.append((t, eid))
            else:                                   # purchase
                if buf:
                    while buf and buf[0][0] < lo:
                        buf.pop(0)
                    if buf:
                        ct, cid = buf[-1]
                        self.out.append((eid, u, cid, t - ct))
        return len(self.out)

    def flush(self) -> list[tuple[int, int, int, int]]:
        return self.out


@ray.remote(num_cpus=1)
def _feed_attribution(part_dir: str, actor) -> int:
    """Feeder for ONE bucket of the click/purchase log: per-bucket sort
    on (ts, event_id) — the log-order tiebreak both engines share — and
    batch-wise ordered drive of the bucket's actor."""
    import glob as _glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = sorted(_glob.glob(f"{part_dir}/*.parquet"))
    if not files:
        return 0
    t = pa.concat_tables(
        [pq.read_table(f, columns=["user_id", "ts", "event_id",
                                   "event_type"]) for f in files])
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending"),
                                             ("event_id", "ascending")]))
    pending = []
    for batch in t.to_batches(max_chunksize=4096):
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        ts_ms = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 1000
        eids = batch["event_id"].to_numpy(zero_copy_only=False)
        is_click = pc.equal(batch["event_type"], "click") \
            .to_numpy(zero_copy_only=False)
        pending.append(actor.add.remote(users, ts_ms, eids, is_click))
    ray.get(pending)
    return t.num_rows


def events_stream_attribution(sf_dir: str):
    """Stream-stream interval join, incremental: every purchase is
    attributed to the user's most recent click at most 1 hour earlier
    (strictly earlier in (ts, event_id) log order). Same partitioned-log
    shape as ``events_stream_windows`` — hash-staged buckets, one feeder
    task per bucket, per-user bounded click buffers as actor state — and
    the result equals the batch interval join, which is what the oracle
    (windowed self-join, ROW_NUMBER = 1) checks."""
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="stream_attr_", dir="/tmp")
    try:
        def keep_and_bucket(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            mask = pc.is_in(batch["event_type"],
                            value_set=pa.array(["click", "purchase"]))
            t2 = batch.filter(mask)
            b = t2["user_id"].to_numpy(zero_copy_only=False) % N_BUCKETS
            return t2.append_column("bucket", pa.array(b.astype(np.int64)))

        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "event_id",
                                 "event_type"]) \
            .map_batches(keep_and_bucket, batch_format="pyarrow",
                         batch_size=None) \
            .write_parquet(stage, partition_cols=["bucket"])

        actors = [AttributionActor.remote() for _ in range(N_BUCKETS)]
        ray.get([_feed_attribution.remote(f"{stage}/bucket={b}", actors[b])
                 for b in range(N_BUCKETS)])
        rows = [r for chunk in ray.get([a.flush.remote() for a in actors])
                for r in chunk]
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    df = pd.DataFrame(rows, columns=["purchase_id", "user_id", "click_id",
                                     "lag_ms"]).astype("int64")
    return df.sort_values("purchase_id").reset_index(drop=True)


STREAM_ATTRIBUTION_SQL = f"""
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
                                 ORDER BY c.ts DESC, c.event_id DESC)
                  AS rn
       FROM p JOIN c ON p.user_id = c.user_id
        AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
        AND date_diff('millisecond', c.ts, p.ts) <= {ATTR_WINDOW_MS})
SELECT purchase_id, user_id, click_id, lag_ms FROM pairs WHERE rn = 1
ORDER BY purchase_id
"""


# ---------------------------------------------------------------------------
# Symmetric two-stream interval join (both sides buffered)
# ---------------------------------------------------------------------------

IJOIN_WINDOW_MS = 7_200_000   # pair view/click within +-2 hours


@ray.remote(num_cpus=0.1)
class IntervalJoinActor:
    """Symmetric stream-stream interval join for one key bucket — the
    Flink-style intervalJoin: BOTH sides keep a bounded per-user buffer
    (evicted once older than the window behind the feed clock), and
    every arrival emits its pairs against the OTHER side's buffer. The
    feed arrives in (ts, event_id) log order, so past-side pairs are
    complete at arrival time and future-side pairs are produced when
    the future element arrives — together exactly the |dt| <= W pair
    set, with no retraction logic. State is 2 x window x arrival rate
    per user, never the stream."""

    def __init__(self):
        # user -> ([(ts, id)] views, [(ts, id)] clicks)
        self.buf: dict[int, tuple[list, list]] = {}
        self.out: list[tuple[int, int, int, int]] = []

    def add(self, user_id: np.ndarray, ts_ms: np.ndarray,
            event_id: np.ndarray, is_view: np.ndarray) -> int:
        for u, t, eid, v in zip(user_id.tolist(), ts_ms.tolist(),
                                event_id.tolist(), is_view.tolist()):
            pair = self.buf.get(u)
            if pair is None:
                pair = ([], [])
                self.buf[u] = pair
            views, clicks = pair
            lo = t - IJOIN_WINDOW_MS
            # evict BOTH sides behind the window (feed is ts-ordered)
            while views and views[0][0] < lo:
                views.pop(0)
            while clicks and clicks[0][0] < lo:
                clicks.pop(0)
            if v:
                for ct, cid in clicks:       # click earlier, view now
                    self.out.append((eid, cid, u, ct - t))
                views.append((t, eid))
            else:
                for vt, vid in views:        # view earlier, click now
                    self.out.append((vid, eid, u, t - vt))
                clicks.append((t, eid))
        return len(self.out)

    def flush(self) -> list[tuple[int, int, int, int]]:
        return self.out


@ray.remote(num_cpus=1)
def _feed_interval_join(part_dir: str, actor) -> int:
    """Feeder for ONE bucket of the view/click log: per-bucket sort on
    (ts, event_id) and batch-wise ordered drive."""
    import glob as _glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = sorted(_glob.glob(f"{part_dir}/*.parquet"))
    if not files:
        return 0
    t = pa.concat_tables(
        [pq.read_table(f, columns=["user_id", "ts", "event_id",
                                   "event_type"]) for f in files])
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending"),
                                             ("event_id", "ascending")]))
    pending = []
    for batch in t.to_batches(max_chunksize=4096):
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        ts_ms = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 1000
        eids = batch["event_id"].to_numpy(zero_copy_only=False)
        is_view = pc.equal(batch["event_type"], "view") \
            .to_numpy(zero_copy_only=False)
        pending.append(actor.add.remote(users, ts_ms, eids, is_view))
    ray.get(pending)
    return t.num_rows


def events_stream_interval_join(sf_dir: str):
    """ALL (view, click) pairs of the same user within +-2 hours,
    computed incrementally as a SYMMETRIC stream-stream interval join —
    unlike the last-click attribution (one side buffered, top-1 match)
    both sides buffer and every qualifying pair is emitted. Same
    partitioned-log shape: hash-staged buckets, one feeder task per
    bucket, bounded two-sided per-user buffers as actor state. Equals
    the batch range self-join, which the oracle checks. Output:
    (view_id, click_id, user_id, dt_ms = click ts - view ts)."""
    import shutil
    import tempfile

    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ["view_id", "click_id", "user_id", "dt_ms"]})
    stage = tempfile.mkdtemp(prefix="stream_ijoin_", dir="/tmp")
    try:
        def keep_and_bucket(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            mask = pc.is_in(batch["event_type"],
                            value_set=pa.array(["view", "click"]))
            t2 = batch.filter(mask)
            b = t2["user_id"].to_numpy(zero_copy_only=False) % N_BUCKETS
            return t2.append_column("bucket", pa.array(b.astype(np.int64)))

        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "event_id",
                                 "event_type"]) \
            .map_batches(keep_and_bucket, batch_format="pyarrow",
                         batch_size=None) \
            .write_parquet(stage, partition_cols=["bucket"])

        actors = [IntervalJoinActor.remote() for _ in range(N_BUCKETS)]
        ray.get([_feed_interval_join.remote(f"{stage}/bucket={b}",
                                            actors[b])
                 for b in range(N_BUCKETS)])
        rows = [r for chunk in ray.get([a.flush.remote() for a in actors])
                for r in chunk]
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["view_id", "click_id", "user_id",
                                       "dt_ms"]).astype("int64") \
        .sort_values(["view_id", "click_id"]).reset_index(drop=True)


STREAM_IJOIN_SQL = f"""
WITH v AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'view'),
     c AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'click')
SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
       CAST(date_diff('millisecond', v.ts, c.ts) AS BIGINT) AS dt_ms
FROM v JOIN c ON v.user_id = c.user_id
 AND abs(date_diff('millisecond', v.ts, c.ts)) <= {IJOIN_WINDOW_MS}
ORDER BY view_id, click_id
"""


# ---------------------------------------------------------------------------
# Gap-based SESSION windows (data-driven window boundaries)
# ---------------------------------------------------------------------------

SESSION_GAP_MS = 30 * 60_000            # same 30-min gap as the batch tier


@ray.remote(num_cpus=0.1)
class SessionActor:
    """Incremental gap-session windowing for one key bucket: per user,
    ONE open session (start, last, count) — unlike tumbling windows the
    boundary is data-driven, so a session closes the moment its user's
    next event arrives past the gap (or at end-of-log). Per-user state
    is O(1); emitted sessions leave the actor eagerly."""

    def __init__(self):
        self.open: dict[int, list[int]] = {}   # user -> [start, last, n, sid]
        self.next_sid: dict[int, int] = {}
        self.out: list[tuple[int, int, int, int, int]] = []

    def add(self, user_id: np.ndarray, ts_ms: np.ndarray) -> int:
        for u, t in zip(user_id.tolist(), ts_ms.tolist()):
            cur = self.open.get(u)
            if cur is None:
                sid = self.next_sid.get(u, 0) + 1
                self.next_sid[u] = sid
                self.open[u] = [t, t, 1, sid]
            elif t - cur[1] > SESSION_GAP_MS:
                self.out.append((u, cur[3], cur[0], cur[1], cur[2]))
                sid = self.next_sid[u] + 1
                self.next_sid[u] = sid
                self.open[u] = [t, t, 1, sid]
            else:
                cur[1] = t
                cur[2] += 1
        return len(self.out)

    def flush(self) -> list[tuple[int, int, int, int, int]]:
        for u, cur in self.open.items():
            self.out.append((u, cur[3], cur[0], cur[1], cur[2]))
        self.open.clear()
        return self.out


@ray.remote(num_cpus=1)
def _feed_sessions(part_dir: str, actor) -> int:
    """Feeder for ONE bucket: per-bucket ts sort (same-ts order is
    irrelevant to gap semantics — a zero gap never breaks a session),
    batch-wise ordered drive."""
    import glob as _glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = sorted(_glob.glob(f"{part_dir}/*.parquet"))
    if not files:
        return 0
    t = pa.concat_tables([pq.read_table(f, columns=["user_id", "ts"])
                          for f in files])
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    pending = []
    for batch in t.to_batches(max_chunksize=4096):
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        ts_ms = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 1000
        pending.append(actor.add.remote(users, ts_ms))
    ray.get(pending)
    return t.num_rows


def events_stream_sessions(sf_dir: str):
    """Per-SESSION rows (user, session #, start, end, event count) from
    gap-based session windows computed incrementally on the bucket-actor
    tier — the data-driven-boundary window the tumbling/sliding tiers
    cannot express. Same partitioned-log shape: hash-staged buckets, one
    feeder task per bucket, O(1) per-user actor state. Equals the batch
    LAG-mark + running-sum sessionization, which the oracle checks."""
    import shutil
    import tempfile

    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ["user_id", "session_id", "start_ms", "end_ms",
                           "n_events"]})
    stage = tempfile.mkdtemp(prefix="stream_sess_", dir="/tmp")
    try:
        def add_bucket(batch: pa.Table) -> pa.Table:
            b = batch["user_id"].to_numpy(zero_copy_only=False) % N_BUCKETS
            return batch.append_column("bucket",
                                       pa.array(b.astype(np.int64)))

        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts"]) \
            .map_batches(add_bucket, batch_format="pyarrow",
                         batch_size=None) \
            .write_parquet(stage, partition_cols=["bucket"])

        actors = [SessionActor.remote() for _ in range(N_BUCKETS)]
        ray.get([_feed_sessions.remote(f"{stage}/bucket={b}", actors[b])
                 for b in range(N_BUCKETS)])
        rows = [r for chunk in ray.get([a.flush.remote() for a in actors])
                for r in chunk]
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["user_id", "session_id", "start_ms",
                                       "end_ms", "n_events"]) \
        .astype("int64").sort_values(["user_id", "session_id"]) \
        .reset_index(drop=True)


STREAM_SESSIONS_SQL = f"""
WITH marks AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {SESSION_GAP_MS // 60000} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       CAST(epoch_ms(MIN(ts)) AS BIGINT) AS start_ms,
       CAST(epoch_ms(MAX(ts)) AS BIGINT) AS end_ms,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# Windowed top-k: per tumbling hour, the top event types by count
# ---------------------------------------------------------------------------

STREAM_TOPK = 3


@ray.remote(num_cpus=0.1)
class TypeCountActor:
    """Incremental per-(hour, event_type) counter for one key bucket,
    with the same watermark discipline as WindowActor: hour windows
    fully behind (max seen ts - lateness) move to the closed list
    eagerly, the rest flush at end-of-log. Counts here are PARTIALS —
    the hour x type grid is split across buckets by the user hash, and
    any disjoint partition of the log sums to the same global grid."""

    def __init__(self):
        self.open: dict[tuple[int, str], int] = {}
        self.closed: list[tuple[int, str, int]] = []
        self.max_ts_ms = -(1 << 62)

    def add(self, ts_ms: np.ndarray, types: list[str]) -> int:
        hours = (ts_ms // 3_600_000) * 3_600_000
        for h, ty in zip(hours.tolist(), types):
            key = (h, ty)
            self.open[key] = self.open.get(key, 0) + 1
        if len(ts_ms):
            self.max_ts_ms = max(self.max_ts_ms, int(ts_ms.max()))
        watermark = self.max_ts_ms - ALLOWED_LATENESS_MS
        for key in [k for k in self.open if k[0] + 3_600_000 <= watermark]:
            self.closed.append((key[0], key[1], self.open.pop(key)))
        return len(self.closed)

    def flush(self) -> list[tuple[int, str, int]]:
        for (h, ty), n in self.open.items():
            self.closed.append((h, ty, n))
        self.open.clear()
        return self.closed


@ray.remote(num_cpus=1)
def _feed_type_counts(part_dir: str, actor) -> int:
    """Feeder for ONE bucket: per-bucket ts sort, batch-wise ordered
    drive (same-ts order is irrelevant to counting)."""
    import glob as _glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    files = sorted(_glob.glob(f"{part_dir}/*.parquet"))
    if not files:
        return 0
    t = pa.concat_tables([pq.read_table(f, columns=["ts", "event_type"])
                          for f in files])
    t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending")]))
    pending = []
    for batch in t.to_batches(max_chunksize=4096):
        ts_ms = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 1000
        types = batch["event_type"].to_pylist()
        pending.append(actor.add.remote(ts_ms, types))
    ray.get(pending)
    return t.num_rows


def events_stream_topk(sf_dir: str):
    """Top-{STREAM_TOPK} event types per tumbling hour (count desc, type
    asc tie-break) computed incrementally on the bucket-actor tier: per
    bucket the actors hold watermarked (hour, type) count partials, and
    the flush merge runs over the OUTPUT-SHAPED grid (hours x types, not
    events) before the per-hour top-k selection. Equals the batch
    grouped count + ROW_NUMBER, which the oracle checks.
    Output: (hour, event_type, n, rnk)."""
    import shutil
    import tempfile

    empty = pd.DataFrame({"hour": pd.Series(dtype="object"),
                          "event_type": pd.Series(dtype="object"),
                          "n": pd.Series(dtype="int64"),
                          "rnk": pd.Series(dtype="int64")})
    stage = tempfile.mkdtemp(prefix="stream_topk_", dir="/tmp")
    try:
        def add_bucket(batch: pa.Table) -> pa.Table:
            b = batch["user_id"].to_numpy(zero_copy_only=False) % N_BUCKETS
            return batch.append_column("bucket",
                                       pa.array(b.astype(np.int64)))

        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "event_type"]) \
            .map_batches(add_bucket, batch_format="pyarrow",
                         batch_size=None) \
            .write_parquet(stage, partition_cols=["bucket"])

        actors = [TypeCountActor.remote() for _ in range(N_BUCKETS)]
        ray.get([_feed_type_counts.remote(f"{stage}/bucket={b}", actors[b])
                 for b in range(N_BUCKETS)])
        rows = [r for chunk in ray.get([a.flush.remote() for a in actors])
                for r in chunk]
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    if not rows:
        return empty
    df = pd.DataFrame(rows, columns=["hour_ms", "event_type", "n"])
    df = df.groupby(["hour_ms", "event_type"], as_index=False)["n"].sum()
    df["rnk"] = df.sort_values(["n", "event_type"],
                               ascending=[False, True]) \
        .groupby("hour_ms").cumcount() + 1
    df = df[df["rnk"] <= STREAM_TOPK].copy()
    df["hour"] = pd.to_datetime(df["hour_ms"], unit="ms") \
        .dt.strftime("%Y-%m-%d %H")
    df["n"] = df["n"].astype("int64")
    df["rnk"] = df["rnk"].astype("int64")
    return df[["hour", "event_type", "n", "rnk"]] \
        .sort_values(["hour", "rnk"]).reset_index(drop=True)


STREAM_TOPK_SQL = f"""
WITH c AS (
  SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
         COUNT(*) AS n
  FROM events GROUP BY hour, event_type),
r AS (
  SELECT hour, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY hour
                            ORDER BY n DESC, event_type) AS rnk
  FROM c)
SELECT hour, event_type, CAST(n AS BIGINT) AS n, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= {STREAM_TOPK}
ORDER BY hour, rnk
"""


# ---------------------------------------------------------------------------
# Watermark / late-arrival accounting (distributed prefix-MAX scan)
# ---------------------------------------------------------------------------

# arrival-order bucket width: event_id // WM_BUCKET rows per bucket. At
# test scale this yields ~dozens of buckets so the carry-in path is
# actually exercised; at 10^12 events size it so the carry table stays
# driver-small (e.g. 2^20 rows/bucket -> ~1M carries).
WM_BUCKET = 4096
WM_LATE_US = 10 * 60 * 1_000_000       # allowed lateness: 10 minutes


def events_watermark_lateness(sf_dir: str, bucket_rows: int = WM_BUCKET,
                              late_us: int = WM_LATE_US):
    """Late-data accounting for the event log: treating ``event_id`` as
    ARRIVAL order, an event is late if its event time is more than 10
    minutes behind the watermark (the max event time of all earlier
    arrivals). The classic streaming metric, computed batch-side as a
    distributed prefix-MAX scan: pass 1 reduces each arrival bucket
    (event_id // {WM_BUCKET}) to its max event time, the driver
    prefix-combines those tiny partials into per-bucket carry-ins, and
    pass 2 re-scans each bucket with its carry-in broadcast, marking
    lateness against the bucket-local shifted prefix max — no stage
    ever orders more than one bucket. All integers (epoch micros);
    grouped per event-time hour. Output: (hr, n_events, n_late)."""
    from .relational import _coarse_partition_map, _pq, _table_empty

    empty = pd.DataFrame({"hr": pd.Series(dtype="int64"),
                          "n_events": pd.Series(dtype="int64"),
                          "n_late": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["event_id", "ts"])

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        batch = batch.filter(pc.is_valid(batch["ts"]))
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        x = ts.astype("datetime64[us]").astype(np.int64)
        return pa.Table.from_pydict({
            "bucket": (eid // bucket_rows).astype(np.int64), "eid": eid,
            "x": x, "hr": ts.astype("datetime64[h]").astype(np.int64)})

    pts = ds.map_batches(project, batch_format="pyarrow",
                         batch_size=None).materialize()

    # pass 1: per-bucket max event time (tiny partials)
    from ray.data.aggregate import Max, Sum
    bmax = (pts.groupby("bucket").aggregate(Max("x", alias_name="mx"))
            .to_pandas().sort_values("bucket"))
    if bmax.empty:
        return empty
    mx = bmax["mx"].to_numpy(np.int64)
    carry_vals = np.concatenate(([np.iinfo(np.int64).min],
                                 np.maximum.accumulate(mx)[:-1]))
    carry = dict(zip(bmax["bucket"].to_numpy(np.int64),
                     carry_vals.astype(np.int64)))
    carry_ref = ray.put(carry)

    # pass 2: bucket-local shifted prefix max + carry-in -> lateness
    def bucket_scan(g: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(carry_ref)
        out = []
        for b, sub in g.groupby("bucket"):
            sub = sub.sort_values("eid")
            x = sub["x"].to_numpy(np.int64)
            prev = np.concatenate(([cmap[int(b)]],
                                   np.maximum.accumulate(x)[:-1]))
            prev = np.maximum(prev, cmap[int(b)])
            # the very first arrival carries the int64-min sentinel (no
            # watermark yet) — never late, and kept out of the subtract
            has_wm = prev != np.iinfo(np.int64).min
            late = has_wm & ((np.where(has_wm, prev, x) - x) > late_us)
            d = pd.DataFrame({"hr": sub["hr"].to_numpy(np.int64),
                              "late": late.astype(np.int64)})
            a = d.groupby("hr", as_index=False).agg(
                n_events=("late", "size"), n_late=("late", "sum"))
            out.append(a)
        return pd.concat(out, ignore_index=True).astype("int64")

    res = (_coarse_partition_map(pts, "bucket", bucket_scan)
           .groupby("hr")
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("n_late", alias_name="n_late"))
           .to_pandas())
    return res.sort_values("hr").reset_index(drop=True).astype("int64")


WATERMARK_SQL = f"""
WITH c AS (
  SELECT event_id, epoch_us(ts) AS x,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr
  FROM events WHERE ts IS NOT NULL),
w AS (
  SELECT hr, x,
         MAX(x) OVER (ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS wm
  FROM c)
SELECT hr, count(*) AS n_events,
       CAST(COALESCE(SUM(CASE WHEN wm - x > {WM_LATE_US}
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_late
FROM w GROUP BY hr ORDER BY hr
"""


# ---------------------------------------------------------------------------
# Token-bucket rate limiting (per-user quota enforcement)
# ---------------------------------------------------------------------------

RATE_COST_US = 10_000_000       # one event costs 10 s of refill budget
RATE_CAP_US = 50_000_000        # bucket capacity: 5 events burst


def events_rate_limited(sf_dir: str):
    """Per-user TOKEN-BUCKET rate limiting over the event log — the
    quota-enforcement primitive an ingestion edge applies (allow bursts
    of {RATE_CAP_US // RATE_COST_US}, sustain 1 event / 10 s): the
    bucket refills 1 unit/us up to the cap, each admitted event spends
    {RATE_COST_US}; an event is throttled iff the refilled bucket
    cannot cover the cost. Buckets start full; ties order by
    (ts, event_id) — everything stays integer microseconds, and the
    clamped recursion replays exactly in the oracle's recursive CTE.
    One user-keyed exchange; per-user state is O(1).
    Output: (user_id, n_events, n_allowed, n_throttled)."""
    from .relational import (_coarse_partition_map, _pq, _table_empty)
    cols = ("user_id", "n_events", "n_allowed", "n_throttled")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts"])

    def bucket_replay(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(t=g["ts"].astype("datetime64[us]")
                     .astype(np.int64))
        g = g.sort_values(["user_id", "t", "event_id"])
        rows = []
        for uid, sub in g.groupby("user_id", sort=False):
            ts = sub["t"].to_numpy(np.int64)
            bucket = RATE_CAP_US
            prev_t = None
            allowed = 0
            for t in ts.tolist():       # clamped recursion: inherently
                if prev_t is not None:  # sequential per user, O(1) state
                    bucket = min(RATE_CAP_US, bucket + (t - prev_t))
                prev_t = t
                if bucket >= RATE_COST_US:
                    bucket -= RATE_COST_US
                    allowed += 1
            n = len(ts)
            rows.append((int(uid), n, allowed, n - allowed))
        return pd.DataFrame(rows, columns=list(cols)).astype("int64")

    return _coarse_partition_map(ds, "user_id", bucket_replay) \
        .sort("user_id")


RATE_LIMIT_SQL = f"""
WITH RECURSIVE ev AS (
  SELECT user_id, epoch_us(ts) AS t,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
rec AS (
  SELECT user_id, rn, t,
         {RATE_CAP_US} - {RATE_COST_US} AS bucket, 1 AS allowed
  FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.t,
         CASE WHEN LEAST({RATE_CAP_US}, r.bucket + (e.t - r.t))
                   >= {RATE_COST_US}
              THEN LEAST({RATE_CAP_US}, r.bucket + (e.t - r.t))
                   - {RATE_COST_US}
              ELSE LEAST({RATE_CAP_US}, r.bucket + (e.t - r.t)) END,
         CASE WHEN LEAST({RATE_CAP_US}, r.bucket + (e.t - r.t))
                   >= {RATE_COST_US} THEN 1 ELSE 0 END
  FROM ev e JOIN rec r
    ON e.user_id = r.user_id AND e.rn = r.rn + 1)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(allowed) AS BIGINT) AS n_allowed,
       CAST(COUNT(*) - SUM(allowed) AS BIGINT) AS n_throttled
FROM rec GROUP BY user_id ORDER BY user_id
"""


def stream_windows_bench(sf_dir: str) -> dict:
    """Instrumented ``events_stream_windows`` run for the bench sweep:
    wall per phase (hash-partition staging, bucket feed, flush),
    end-to-end events/sec through the bucket-actor feed, and how many
    windows the watermark closed EAGERLY (before the end-of-log flush)
    — the streaming-ness signal. Same pipeline, same result; only
    timing and the pre-flush snapshot are added."""
    import shutil
    import tempfile
    import time

    stage = tempfile.mkdtemp(prefix="stream_bench_", dir="/tmp")
    try:
        def add_bucket(batch: pa.Table) -> pa.Table:
            b = batch["user_id"].to_numpy(zero_copy_only=False) % N_BUCKETS
            return batch.append_column("bucket",
                                       pa.array(b.astype(np.int64)))

        t0 = time.perf_counter()
        rd.read_parquet(f"{sf_dir}/events.parquet",
                        columns=["user_id", "ts", "value"]) \
            .map_batches(add_bucket, batch_format="pyarrow",
                         batch_size=None) \
            .write_parquet(stage, partition_cols=["bucket"])
        stage_wall = time.perf_counter() - t0

        actors = [WindowActor.remote() for _ in range(N_BUCKETS)]
        t1 = time.perf_counter()
        fed = ray.get([_feed_bucket.remote(f"{stage}/bucket={b}",
                                           actors[b])
                       for b in range(N_BUCKETS)])
        feed_wall = time.perf_counter() - t1
        # pre-flush snapshot: windows already closed by the watermark
        eager = sum(len(s["closed"]) for s in
                    ray.get([a.snapshot.remote() for a in actors]))
        t2 = time.perf_counter()
        rows = [r for chunk in ray.get([a.flush.remote() for a in actors])
                for r in chunk]
        flush_wall = time.perf_counter() - t2
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    n_events = int(sum(fed))
    n_windows = len(rows)
    return {
        "n_events": n_events, "n_buckets": N_BUCKETS,
        "stage_wall_s": round(stage_wall, 3),
        "feed_wall_s": round(feed_wall, 3),
        "flush_wall_s": round(flush_wall, 3),
        "end_to_end_wall_s": round(stage_wall + feed_wall + flush_wall, 3),
        "feed_events_per_sec": round(n_events / feed_wall, 1)
        if feed_wall > 0 else 0.0,
        "end_to_end_events_per_sec": round(
            n_events / (stage_wall + feed_wall + flush_wall), 1),
        "n_windows": n_windows,
        "n_closed_eagerly": int(eager),
        "eager_close_frac": round(eager / n_windows, 4)
        if n_windows else 0.0,
    }


STREAMING_QUERIES: dict[str, tuple] = {
    "events_rate_limited": (events_rate_limited, RATE_LIMIT_SQL),
    "events_watermark_lateness": (events_watermark_lateness,
                                  WATERMARK_SQL),
    "events_stream_topk": (events_stream_topk, STREAM_TOPK_SQL),
    "events_stream_windows": (events_stream_windows, STREAM_WINDOWS_SQL),
    "events_stream_attribution": (events_stream_attribution,
                                  STREAM_ATTRIBUTION_SQL),
    "events_stream_sessions": (events_stream_sessions,
                               STREAM_SESSIONS_SQL),
    "events_stream_interval_join": (events_stream_interval_join,
                                    STREAM_IJOIN_SQL),
}
