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
global ts order (the driver emulates a partitioned ordered log with one
``sort("ts")``; a real deployment reads an already-partitioned stream).
The final result is independent of bucketing and equals the batch
group-by — which is exactly what the DuckDB oracle checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

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


def events_stream_windows(sf_dir: str):
    """Per-(user, hour) event counts/sums computed INCREMENTALLY by bucket
    actors over the ordered log; result equals the batch group-by."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"]).sort("ts")
    actors = [WindowActor.remote() for _ in range(N_BUCKETS)]
    pending = []
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        users = batch["user_id"].to_numpy(zero_copy_only=False)
        ts_ms = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64) // 1000
        from ..functions.arrow_utils import round_half_away
        vals = round_half_away(
            batch["value"].to_numpy(zero_copy_only=False) * 1e6)
        buckets = users % N_BUCKETS
        for b in np.unique(buckets):
            m = buckets == b
            pending.append(actors[b].add.remote(users[m], ts_ms[m], vals[m]))
    ray.get(pending)                     # ordered per actor (actor mailbox)
    rows = [r for chunk in ray.get([a.flush.remote() for a in actors])
            for r in chunk]
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


STREAMING_QUERIES: dict[str, tuple] = {
    "events_stream_windows": (events_stream_windows, STREAM_WINDOWS_SQL),
}
