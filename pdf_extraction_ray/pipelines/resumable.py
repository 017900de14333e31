"""Resumable extraction runner: checkpointed, partition-at-a-time.

The streaming ``extract_pipeline`` is the throughput path; this runner is
the production *checkpoint* path the north rule requires. The partition
unit is the input shard — deterministic, stable across runs and
parallelism levels — so output naming, lineage and resume are exact.

Why raw Ray tasks here (the documented exception to Dataset-first):
Ray Data cannot bind "this output file came from exactly this input
shard" — batches are re-split dynamically, so per-partition lineage and
idempotent re-runs need a fixed partition->task mapping. Each task reuses
the SAME pure batch kernels as the streaming pipeline (classify_spans ->
layout_parse -> reassemble_spans), so both paths produce byte-identical
span sequences; only scheduling differs. Error-as-data: a poisoned shard
yields a status="error" manifest, never a failed job.

Skew: shards are dispatched largest-first (size-ordered) so pathological
multi-hundred-page-doc shards start early and cannot become the lone
straggler at the tail — the task-level analog of the size-bucket
repartition in SURVEY.md §4.
"""

from __future__ import annotations

import glob
import os
import time

import ray

from ..state.manifest import (PartitionManifest, data_path,
                              input_fingerprint, read_manifests,
                              write_manifest)


def _process_shard(shard: str, out_dir: str, run_id: str,
                   partition_id: str) -> dict:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.layout import layout_parse
    from ..stages.reassemble import reassemble_spans
    from ..stages.tokenize import classify_spans

    t0 = time.perf_counter()
    fp = "unavailable"
    try:
        fp = input_fingerprint(shard)       # inside try: a vanished shard
        table = pq.read_table(shard)        # is error-as-data, not job death
        out = reassemble_spans(layout_parse(classify_spans(table)))
        dst = data_path(out_dir, partition_id)
        tmp = dst + f".tmp{os.getpid()}"
        pq.write_table(out, tmp)
        from ..state.manifest import fsync_file
        fsync_file(tmp)      # data durable BEFORE its ok-manifest exists
        os.replace(tmp, dst)
        n_spans = int(pc.sum(pc.list_value_length(out["spans"])).as_py() or 0)
        m = PartitionManifest(partition_id, run_id, shard, fp, "ok",
                              out.num_rows, n_spans,
                              round(time.perf_counter() - t0, 3))
    except Exception as e:                      # error-as-data, not job death
        m = PartitionManifest(partition_id, run_id, shard, fp, "error",
                              0, 0, round(time.perf_counter() - t0, 3),
                              error=repr(e)[:500])
    write_manifest(out_dir, m)
    return {"partition_id": partition_id, "status": m.status}


def run_extract_resumable(input_dir: str, out_dir: str, run_id: str = "run0",
                          max_partitions: int | None = None) -> dict:
    """Process every input shard not yet completed for this output dir.

    ``max_partitions`` limits this invocation (used by tests to simulate a
    killed run). Returns {"processed": n, "skipped": n, "errors": n}.
    """
    os.makedirs(out_dir, exist_ok=True)
    shards = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    # one manifest snapshot: deriving 'done' from a second listing would
    # race against concurrent manifest changes
    manifests = read_manifests(out_dir)
    done = {pid for pid, m in manifests.items()
            if m.status == "ok" and os.path.exists(data_path(out_dir, pid))}

    def _safe_stat(p: str) -> int:
        try:                 # a shard vanishing mid-listing is error-as-data
            return os.stat(p).st_size
        except OSError:
            return 0

    def _safe_fp(p: str) -> str:
        try:
            return input_fingerprint(p)
        except OSError:
            return "vanished"

    todo = []
    for shard in shards:
        pid = os.path.splitext(os.path.basename(shard))[0]
        if pid in done and manifests[pid].input_fingerprint == _safe_fp(shard):
            continue                             # completed + input unchanged
        todo.append((shard, pid))
    skipped = len(shards) - len(todo)
    if max_partitions is not None:
        todo = todo[:max_partitions]

    # largest shards first: the skew guard
    todo.sort(key=lambda sp: -_safe_stat(sp[0]))

    task = ray.remote(num_cpus=1)(_process_shard)
    results = ray.get([task.remote(s, out_dir, run_id, pid)
                       for s, pid in todo])
    errors = sum(1 for r in results if r["status"] == "error")
    return {"processed": len(results), "skipped": skipped, "errors": errors}
