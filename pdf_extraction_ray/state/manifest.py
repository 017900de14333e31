"""Per-partition lineage manifests — the checkpoint/resume substrate
(SURVEY.md §4; north rule: "resumable from checkpoint with per-partition
lineage + metrics").

Output layout::

    out/{run_id}/
      part-{partition_id}.parquet          # atomic: tmp + rename
      _manifests/part-{partition_id}.json  # written AFTER the data file

A partition is an input shard (deterministic unit, stable across runs and
parallelism levels). A manifest records lineage (input path + fingerprint),
metrics (rows, spans, duration) and status; error-as-data: a failed
partition writes a status="error" manifest instead of aborting the run
(the reference's per-page failure counters generalized,
gpt4_comprehensive_visual_processor.py:411-421). Resume = list manifests,
skip partitions whose manifest says ok AND whose data file exists,
reprocess the rest; re-runs are idempotent (same input -> same bytes).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass


@dataclass
class PartitionManifest:
    partition_id: str
    run_id: str
    input_path: str
    input_fingerprint: str       # size:mtime-ns of the input shard
    status: str                  # "ok" | "error"
    n_docs: int
    n_spans: int
    duration_sec: float
    error: str = ""


def input_fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def manifest_path(out_dir: str, partition_id: str) -> str:
    return os.path.join(manifest_dir(out_dir), f"part-{partition_id}.json")


def data_path(out_dir: str, partition_id: str) -> str:
    return os.path.join(out_dir, f"part-{partition_id}.parquet")


def fsync_file(path: str) -> None:
    """Force file contents to stable storage (a manifest must never outlive
    a power loss that its data file did not survive)."""
    with open(path, "rb") as f:
        os.fsync(f.fileno())


def write_manifest(out_dir: str, m: PartitionManifest) -> None:
    """Durable atomic write (tmp + fsync + rename), AFTER the partition
    data file exists and is fsynced — a manifest therefore proves its data
    file is complete, even across power loss."""
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    p = manifest_path(out_dir, m.partition_id)
    tmp = p + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)


def read_manifests(out_dir: str) -> dict[str, PartitionManifest]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return {}
    out = {}
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                m = PartitionManifest(**json.load(f))
            out[m.partition_id] = m
    return out


def completed_partitions(out_dir: str) -> set[str]:
    """Partitions safe to skip on resume: ok manifest + data file present +
    input unchanged is checked by the caller against current fingerprints."""
    return {pid for pid, m in read_manifests(out_dir).items()
            if m.status == "ok" and os.path.exists(data_path(out_dir, pid))}
