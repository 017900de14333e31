"""WebDataset-style tar shard sink + source for interleaved documents.

The de-facto interchange format for multimodal training corpora is a set
of tar shards whose members group per-sample files (WebDataset
convention: ``{key}.{ext}`` members, one shard per worker stream). This
module writes the engine's interleaved (doc_id, spans) rows into
deterministic tar shards — span structure as one canonical JSON member
per doc, one payload member per media span (deterministic synth payload;
a real asset store slots in behind the same shape) — and reads them back
into the identical Dataset.

Determinism: shard assignment is content-addressed (md5 of the doc id,
mod n_shards — the same '0x' + substr(md5) integer DuckDB replays),
members are emitted doc-ascending with zeroed tar metadata (mtime 0,
uid/gid 0, fixed mode, USTAR), so a shard's BYTES are identical across
runs and parallelism levels — tests pin per-shard sha256 equality
between independent writes.

Scale shape: one shard-keyed exchange groups docs (bounded shard count,
cluster-scaled); each group streams its members into its own tar file;
the driver only ever sees the per-shard manifest. Reading is
``read_binary_files`` over the shard dir with a per-tar parse batch.

Reference analog: the versioned JSON result sink / chained JSON source
(hybrid_docling_gpt4_processor.py:685-693;
complete_multimodal_rag_evaluation.py:143-145) — rebuilt as the
industry-standard sharded container format.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa

WDS_N_SHARDS = 8


def _doc_key(doc_id) -> str:
    s = str(doc_id)
    return s.zfill(12) if s.isdigit() else s


def shard_of(doc_id) -> int:
    """Content-addressed shard id — DuckDB replays this exactly via
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS
    BIGINT) % n."""
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8],
               16) % WDS_N_SHARDS


def _doc_members(doc_id, spans: list) -> list[tuple[str, bytes]]:
    """(member_name, bytes) pairs for one document, in member order."""
    from ..stages.multimodal import synth_payload

    key = _doc_key(doc_id)
    meta = {"doc_id": doc_id if not isinstance(doc_id, np.integer)
            else int(doc_id),
            "spans": [{"kind": s["kind"], "text": s["text"],
                       "media_ref": s["media_ref"],
                       "offset": int(s["offset"])} for s in spans]}
    members = [(f"{key}.spans.json",
                json.dumps(meta, sort_keys=True,
                           separators=(",", ":"),
                           ensure_ascii=False).encode("utf-8"))]
    j = 0
    for s in meta["spans"]:
        if s["kind"] == "image" and s["media_ref"]:
            members.append((f"{key}.{j}.bin",
                            synth_payload(s["media_ref"], "image")))
            j += 1
    return members


def _write_shard_tar(path: str, docs: list[tuple]) -> tuple[int, str]:
    """Write one deterministic tar for [(doc_id, spans), ...] sorted by
    key; returns (n_media, sha256 of the shard bytes)."""
    buf = io.BytesIO()
    n_media = 0
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for doc_id, spans in docs:
            for name, data in _doc_members(doc_id, spans):
                ti = tarfile.TarInfo(name=name)
                ti.size = len(data)
                ti.mtime = 0
                ti.uid = ti.gid = 0
                ti.uname = ti.gname = ""
                ti.mode = 0o644
                tf.addfile(ti, io.BytesIO(data))
                n_media += name.endswith(".bin")
    raw = buf.getvalue()
    with open(path, "wb") as f:
        f.write(raw)
    return n_media, hashlib.sha256(raw).hexdigest()


def write_webdataset(ds, out_dir: str,
                     resume: bool = False) -> pd.DataFrame:
    """Write an interleaved (doc_id, spans) Dataset into WDS_N_SHARDS
    deterministic tar shards under ``out_dir``; returns the manifest
    (shard_id, path, n_docs, n_media, sha256) sorted by shard_id.

    ``resume=True`` skips shards whose tar file already exists — sound
    because shard bytes are a pure deterministic function of the input
    (content-addressed membership + zeroed tar metadata), so a partial
    earlier run's surviving shards are exactly what a rewrite would
    produce (the resumable-output contract; equality pinned by
    tests/test_wds.py)."""
    os.makedirs(out_dir, exist_ok=True)

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return batch.append_column(
            "shard", pa.array([shard_of(i) for i in ids], pa.int64())) \
            .replace_schema_metadata(None)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        sid = int(g["shard"].iloc[0])
        docs = sorted(zip(g["doc_id"], g["spans"]),
                      key=lambda t: _doc_key(t[0]))
        path = os.path.join(out_dir, f"shard-{sid:05d}.tar")
        if resume and os.path.exists(path):
            with open(path, "rb") as f:
                raw = f.read()
            n_media = sum(1 for _d, spans in docs for s in spans
                          if s["kind"] == "image" and s["media_ref"])
            digest = hashlib.sha256(raw).hexdigest()
        else:
            n_media, digest = _write_shard_tar(path, docs)
        return pd.DataFrame({"shard_id": [sid], "path": [path],
                             "n_docs": [len(docs)],
                             "n_media": [n_media],
                             "sha256": [digest]})

    manifest = (ds.map_batches(add_shard, batch_format="pyarrow",
                               batch_size=None)
                .groupby("shard")
                .map_groups(write_group, batch_format="pandas")
                .to_pandas())       # <= WDS_N_SHARDS rows
    if manifest.empty:
        return pd.DataFrame({
            "shard_id": pd.Series(dtype="int64"),
            "path": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "n_media": pd.Series(dtype="int64"),
            "sha256": pd.Series(dtype="object")})
    return manifest.astype({"shard_id": "int64", "n_docs": "int64",
                            "n_media": "int64"}) \
        .sort_values("shard_id").reset_index(drop=True)


def read_webdataset(out_dir: str):
    """Read tar shards back into a Dataset of (doc_id, spans) — the
    inverse of write_webdataset (payload members are validated against
    the deterministic payload function by tests, not re-emitted)."""
    import ray.data as rd

    from ..pipelines.spans import INTERLEAVED_SCHEMA, SPAN_STRUCT

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for raw in batch.column("bytes").to_pylist():
            with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
                for m in tf.getmembers():
                    if not m.name.endswith(".spans.json"):
                        continue
                    meta = json.loads(
                        tf.extractfile(m).read().decode("utf-8"))
                    rows.append({"doc_id": meta["doc_id"],
                                 "spans": meta["spans"]})
        if rows and isinstance(rows[0]["doc_id"], str):
            schema = pa.schema([("doc_id", pa.string()),
                                ("spans", pa.list_(SPAN_STRUCT))])
        else:
            schema = INTERLEAVED_SCHEMA
        return pa.Table.from_pylist(rows, schema=schema)

    return rd.read_binary_files(out_dir, file_extensions=["tar"]) \
        .map_batches(parse, batch_format="pyarrow")
