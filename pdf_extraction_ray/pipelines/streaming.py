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


STREAMING_QUERIES: dict[str, tuple] = {
    "events_stream_windows": (events_stream_windows, STREAM_WINDOWS_SQL),
}
