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


def _read_partition(shard) -> "pa.Table":
    """One partition's DOCS_SCHEMA table: a parquet shard path, or a
    tuple ("pdf"|"html", [files...]) for binary-document corpora."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if isinstance(shard, str):
        return pq.read_table(shard)
    kind, files = shard
    if kind == "pdf":
        from ..sources.pdf import parse_pdf as parse
    else:
        from ..sources.html import parse_html as parse
    from ..schema import DOCS_SCHEMA
    rows = []
    for f in files:
        with open(f, "rb") as fh:
            rows.append(parse(fh.read()))
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def _shard_fingerprint(shard) -> str:
    """Size:mtime for a parquet shard; a combined digest of every
    member file's (name, size, mtime) for a binary file group — any
    member changing, appearing, or vanishing changes the fingerprint."""
    if isinstance(shard, str):
        return input_fingerprint(shard)
    import hashlib
    h = hashlib.md5()
    for f in shard[1]:
        h.update(os.path.basename(f).encode())
        h.update(input_fingerprint(f).encode())
    return f"group:{len(shard[1])}:{h.hexdigest()[:16]}"


def _process_shard(shard, out_dir: str, run_id: str,
                   partition_id: str) -> dict:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.layout import layout_parse
    from ..stages.reassemble import reassemble_spans
    from ..stages.tokenize import classify_spans

    t0 = time.perf_counter()
    fp = "unavailable"
    src = shard if isinstance(shard, str) else \
        f"{shard[0]}-group[{len(shard[1])}]:{shard[1][0]}"
    try:
        fp = _shard_fingerprint(shard)      # inside try: a vanished shard
        table = _read_partition(shard)      # is error-as-data, not job death
        out = reassemble_spans(layout_parse(classify_spans(table)))
        dst = data_path(out_dir, partition_id)
        tmp = dst + f".tmp{os.getpid()}"
        pq.write_table(out, tmp)
        from ..state.manifest import fsync_file
        fsync_file(tmp)      # data durable BEFORE its ok-manifest exists
        os.replace(tmp, dst)
        n_spans = int(pc.sum(pc.list_value_length(out["spans"])).as_py() or 0)
        m = PartitionManifest(partition_id, run_id, src, fp, "ok",
                              out.num_rows, n_spans,
                              round(time.perf_counter() - t0, 3))
    except Exception as e:                      # error-as-data, not job death
        m = PartitionManifest(partition_id, run_id, src, fp, "error",
                              0, 0, round(time.perf_counter() - t0, 3),
                              error=repr(e)[:500])
    write_manifest(out_dir, m)
    return {"partition_id": partition_id, "status": m.status}


BINARY_GROUP_FILES = 256    # binary-doc corpora: files per partition


def _list_partitions(input_dir: str) -> list[tuple]:
    """(shard, partition_id) pairs for a corpus directory.

    Parquet shards partition 1:1 (the original contract). Binary-doc
    corpora (.pdf/.html files, incl. one subdirectory level — the
    ``shard=NN`` layout the ingest renders use) partition as
    deterministic lexicographic groups of BINARY_GROUP_FILES files:
    at 10^12 documents, one manifest per FILE would itself be a
    metadata explosion, while a group is the same unit of re-work a
    parquet shard is."""
    shards = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if shards:
        return [(s, os.path.splitext(os.path.basename(s))[0])
                for s in shards]
    for kind in ("pdf", "html"):
        files = sorted(glob.glob(os.path.join(input_dir, f"*.{kind}"))
                       + glob.glob(os.path.join(input_dir, "*",
                                                f"*.{kind}")))
        if files:
            return [((kind, files[i:i + BINARY_GROUP_FILES]),
                     f"{kind}-{i:010d}")
                    for i in range(0, len(files), BINARY_GROUP_FILES)]
    return []


def run_extract_resumable(input_dir: str, out_dir: str, run_id: str = "run0",
                          max_partitions: int | None = None) -> dict:
    """Process every input partition not yet completed for this output
    dir — parquet shards or raw PDF/HTML document corpora.

    ``max_partitions`` limits this invocation (used by tests to simulate a
    killed run). Returns {"processed": n, "skipped": n, "errors": n}.
    """
    os.makedirs(out_dir, exist_ok=True)
    parts = _list_partitions(input_dir)
    # one manifest snapshot: deriving 'done' from a second listing would
    # race against concurrent manifest changes
    manifests = read_manifests(out_dir)
    done = {pid for pid, m in manifests.items()
            if m.status == "ok" and os.path.exists(data_path(out_dir, pid))}

    def _safe_stat(shard) -> int:
        try:                 # a shard vanishing mid-listing is error-as-data
            if isinstance(shard, str):
                return os.stat(shard).st_size
            return sum(os.stat(f).st_size for f in shard[1])
        except OSError:
            return 0

    def _safe_fp(shard) -> str:
        try:
            return _shard_fingerprint(shard)
        except OSError:
            return "vanished"

    todo = []
    for shard, pid in parts:
        if pid in done and manifests[pid].input_fingerprint == _safe_fp(shard):
            continue                             # completed + input unchanged
        todo.append((shard, pid))
    skipped = len(parts) - len(todo)
    if max_partitions is not None:
        todo = todo[:max_partitions]

    # largest shards first: the skew guard
    todo.sort(key=lambda sp: -_safe_stat(sp[0]))

    task = ray.remote(num_cpus=1)(_process_shard)
    results = ray.get([task.remote(s, out_dir, run_id, pid)
                       for s, pid in todo])
    errors = sum(1 for r in results if r["status"] == "error")
    return {"processed": len(results), "skipped": skipped, "errors": errors}
