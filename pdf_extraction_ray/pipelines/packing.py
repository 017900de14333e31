"""Sequence packing pipeline: documents -> recursive chunks -> fixed
token-budget training sequences (the sample-packing stage of an LLM
data pipeline, downstream of chunking and upstream of tokenized shard
writing).

Scale shape: packing is inherently order-dependent, so global first-fit
would serialize. Instead chunks pack independently per doc-hash bucket
(``hash(doc_id) % PACK_BUCKETS``) in (doc_id, chunk_id) order — the
result is deterministic at ANY parallelism (bucket membership and
in-bucket order are data-derived, not scheduler-derived), each bucket is
an independent grouped-map task, and a resumable run can re-pack one
bucket without touching the rest. The fill-ratio loss vs a global pack
is bounded: at most one under-filled tail sequence per bucket."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Max, Sum  # noqa: F401  (Count imported lazily)

from ..functions.chunker import chunk_text
from ..functions.packing import pack_greedy

PACK_CAPACITY = 256             # whitespace tokens per training sequence
PACK_BUCKETS = 32


def _chunk_tokens(sf_dir: str, docs=None):
    """(bucket, doc_id, chunk_id, n_tokens) rows — chunker fan-out with
    per-chunk whitespace token counts, batch-local."""
    ds = docs if docs is not None else rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, chunk_ids, toks = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for ci, ch in enumerate(chunk_text(text or "")):
                doc_ids.append(doc_id)
                chunk_ids.append(ci)
                toks.append(len(ch.split()))
        doc = np.asarray(doc_ids, dtype=np.int64)
        return pa.Table.from_pydict({
            "bucket": (pd.util.hash_array(doc) % np.uint64(PACK_BUCKETS))
            .astype(np.int64),
            "doc_id": doc,
            "chunk_id": np.asarray(chunk_ids, dtype=np.int64),
            "n_tokens": np.asarray(toks, dtype=np.int64)})

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def packed_sequences(sf_dir: str, docs=None):
    """One row per packed training sequence: (bucket, seq_id, n_chunks,
    n_tokens, fill_x1e6). seq_id is bucket-local and deterministic."""
    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "chunk_id"])
        seq = pack_greedy(g["n_tokens"].to_numpy(), PACK_CAPACITY)
        out = pd.DataFrame({"seq_id": seq,
                            "n_tokens": g["n_tokens"].to_numpy()}) \
            .groupby("seq_id", as_index=False) \
            .agg(n_chunks=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
        out.insert(0, "bucket", np.int64(g["bucket"].iloc[0]))
        out["fill_x1e6"] = (out["n_tokens"] * 1_000_000) // PACK_CAPACITY
        return out.astype("int64")

    return (_chunk_tokens(sf_dir, docs)
            .groupby("bucket")
            .map_groups(pack, batch_format="pandas")
            .sort(["bucket", "seq_id"]))


# ---------------------------------------------------------------------------
# End-to-end training-data pipeline: quality gate -> dedup -> chunk -> pack
# ---------------------------------------------------------------------------

def training_pipeline_sequences(sf_dir: str):
    """The composed LLM-data flow as ONE streaming Dataset pipeline:
    quality-gate documents (same thresholds as doc_quality_filter), drop
    exact duplicates keeping each content group's min-doc_id
    representative, then chunk and pack the survivors. The dedup
    keeper set attaches via the NATIVE hash-partitioned ``Dataset.join``
    (both sides large at 100 TB — no broadcast of the corpus), and the
    packing stage inherits the per-bucket determinism of
    ``packed_sequences``."""
    import hashlib

    import pyarrow.compute as pc

    from ray.data.aggregate import Min
    from ..functions import text as T
    from .textops import (QUALITY_MAX_PUNCT_X1E6, QUALITY_MIN_MTL_X1E6,
                          QUALITY_MIN_TOKENS)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def gate(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        q = T.quality_scores(text)
        keep = pc.and_(
            pc.and_(pc.greater_equal(q["n_tokens"],
                                     pa.scalar(QUALITY_MIN_TOKENS)),
                    pc.less_equal(q["punct_ratio_x1e6"],
                                  pa.scalar(QUALITY_MAX_PUNCT_X1E6))),
            pc.greater_equal(q["mean_token_len_x1e6"],
                             pa.scalar(QUALITY_MIN_MTL_X1E6)))
        t = batch.filter(keep)
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        norm = T.normalize_for_dedup(text)
        md5 = pa.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                        for s in norm.to_pylist()], type=pa.string())
        return t.append_column("text_md5", md5) \
            .replace_schema_metadata(None)

    # materialize the gated stage once: three consumers follow (keeper
    # aggregate, emptiness check, join probe side) and each would
    # otherwise re-run the full gate scan. At production scale this is
    # the checkpoint-to-storage step; in-session the object store holds
    # it (and spills if needed).
    gated = docs.map_batches(gate, batch_format="pyarrow", batch_size=None).materialize()

    # keeper per content group: min doc_id (ships only (md5, doc_id))
    keepers = (gated.select_columns(["text_md5", "doc_id"])
               .groupby("text_md5")
               .aggregate(Min("doc_id", alias_name="rep_doc_id"))
               .select_columns(["rep_doc_id"])
               .map_batches(lambda t: t.replace_schema_metadata(None),
                            batch_format="pyarrow", batch_size=None))

    # the native hash-shuffle join cannot finalize over schema-less
    # empty inputs (and an empty corpus needs no join at all). Check the
    # MATERIALIZED gated stage — keepers is empty iff gated is, and
    # counting keepers would execute its groupby shuffle a second time
    # when the join re-runs it as the build side.
    if gated.count() == 0:
        return rd.from_pandas(            # Dataset, like the normal path
            pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("bucket", "seq_id", "n_chunks", "n_tokens",
                           "fill_x1e6")}))

    clean = gated.select_columns(["doc_id", "text"]).join(
        keepers, join_type="inner", num_partitions=8,
        on=("doc_id",), right_on=("rep_doc_id",))

    return packed_sequences(sf_dir, docs=clean)


def packing_stats(sf_dir: str):
    """One-row packing summary: sequences, chunks, token totals, mean
    fill ratio, max sequence size (reduced distributed, never a driver
    materialization of the sequence table)."""
    from ray.data.aggregate import Count
    agg = packed_sequences(sf_dir).aggregate(
        Count(alias_name="n_sequences"),
        Sum("n_chunks", alias_name="total_chunks"),
        Sum("n_tokens", alias_name="total_tokens"),
        Sum("fill_x1e6", alias_name="fill_sum_x1e6"),
        Max("n_tokens", alias_name="max_seq_tokens"))
    n_seqs = int(agg["n_sequences"] or 0)    # None sums on empty input
    return pd.DataFrame([{
        "n_sequences": np.int64(n_seqs),
        "total_chunks": np.int64(agg["total_chunks"] or 0),
        "total_tokens": np.int64(agg["total_tokens"] or 0),
        "mean_fill_x1e6": np.int64((agg["fill_sum_x1e6"] or 0)
                                   // max(n_seqs, 1)),
        "max_seq_tokens": np.int64(agg["max_seq_tokens"] or 0)}])


# ---------------------------------------------------------------------------
# Length-bucketed batch assignment (padding-efficient dynamic batching)
# ---------------------------------------------------------------------------

LEN_BATCH_SIZE = 32


def docs_length_buckets(sf_dir: str):
    """Length-bucketed batch assignment — the padding-efficiency
    counterpart of sample packing: every document goes to the
    floor(log2(n_tokens)) length bucket, and batches of
    {LEN_BATCH_SIZE} form INSIDE each bucket in md5(doc_id) order (a
    deterministic, parallelism-independent shuffle order), so a batch
    never pads across a 2x length spread. The per-doc token count is
    batch-local; the batch numbering is a per-bucket rank over the
    (bucket, md5) key — output-shaped, mirrored by the oracle's
    ROW_NUMBER. Output: (doc_id, n_tokens, bucket, batch_id)."""
    import hashlib

    import pyarrow.compute as pc

    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("doc_id", "n_tokens", "bucket", "batch_id")})

    def counts(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) \
            else batch["text"]
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text),
                                      r"\s+")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        md5s = [hashlib.md5(str(d).encode()).hexdigest()
                for d in batch["doc_id"].to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "n_tokens": n,
            "bucket": np.floor(np.log2(np.maximum(n, 1)))
            .astype(np.int64),
            "md5": md5s})

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", "md5", "doc_id"])
        g["batch_id"] = g.groupby("bucket").cumcount() // LEN_BATCH_SIZE
        return g[["doc_id", "n_tokens", "bucket", "batch_id"]] \
            .astype("int64")

    from .relational import _coarse_partition_map
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = _coarse_partition_map(
        ds.map_batches(counts, batch_format="pyarrow", batch_size=None),
        "bucket", assign).to_pandas()
    if out.empty:
        return empty
    return out.sort_values("doc_id").reset_index(drop=True)


LENGTH_BUCKETS_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
             AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents),
b AS (
  SELECT doc_id, n_tokens,
         CAST(FLOOR(LOG2(GREATEST(n_tokens, 1))) AS BIGINT) AS bucket,
         h
  FROM t)
SELECT doc_id, n_tokens, bucket,
       CAST((ROW_NUMBER() OVER (PARTITION BY bucket
                                ORDER BY h, doc_id) - 1)
            // {LEN_BATCH_SIZE} AS BIGINT) AS batch_id
FROM b
ORDER BY doc_id
"""


PACKING_QUERIES: dict[str, tuple] = {
    "docs_length_buckets": (docs_length_buckets, LENGTH_BUCKETS_SQL),
    "packed_sequences": (packed_sequences, None),
    "packing_stats": (packing_stats, None),
    "training_pipeline_sequences": (training_pipeline_sequences, None),
}
