"""Flagship extraction pipeline (rebuild of the reference's hybrid
lifecycle, SURVEY.md §3.1, as a streaming Ray Data pipeline):

    read_docs(...)                                   # (doc_id, spans, meta)
      .map_batches(classify_spans,  pyarrow)         # stateless tokenizer
      .map_batches(LayoutParser,    pyarrow, actors) # stateful layout parse
      .map_batches(reassemble_spans, pyarrow)        # ordered span emission
      [.write_parquet(out/...)]                      # resumable sink

Every stage is doc-local — no shuffle anywhere on the hot path. Skew from
pathological multi-hundred-page docs is bounded by per-batch row caps
(small ``batch_size``) plus Ray Data's dynamic block splitting; the input
is sharded at the source so the streaming executor pipelines read →
classify → layout → reassemble with backpressure.
"""

from __future__ import annotations

from ray.data import Dataset

from ..sources.io import read_docs
from ..stages.tokenize import classify_spans
from ..stages.layout import LayoutParser, layout_parse
from ..stages.reassemble import reassemble_spans


def bucket_by_size(ds: Dataset, boundaries=(50, 200, 1000)) -> Dataset:
    """Skew control (SURVEY.md §4): bucket docs by span count and sort
    descending so pathological multi-hundred-page docs are scheduled
    FIRST and spread across workers instead of straggling at the tail.
    This is a full shuffle — apply it only when the corpus has a heavy
    tail worth paying the exchange for (the resumable runner gets the
    same effect for free from largest-shard-first dispatch)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_bucket(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(batch["spans"]).to_numpy(zero_copy_only=False)
        bucket = np.digitize(n, np.asarray(boundaries))
        return batch.append_column("size_bucket",
                                   pa.array(bucket, type=pa.int8()))

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
             .sort("size_bucket", descending=True)


def extract_pipeline(ds: Dataset, *, batch_size: int = 256,
                     layout_mode: str = "tasks",
                     skew_bucketing: bool = False,
                     layout_concurrency=None) -> Dataset:
    """Wire the three extraction stages onto an interleaved-docs Dataset.

    ``batch_size`` is rows (documents) per batch — kept modest because one
    row can hold a pathological multi-hundred-page doc.

    ``layout_mode``:

    - ``"tasks"`` (default): the layout parser runs as elastic tasks with
      per-worker-process cached state. Ray fuses the whole chain
      (classify -> layout -> reassemble -> sink) into one task stage —
      zero inter-stage transfer, near-linear scaling. Right for light
      parser state (compiled patterns, stub OCR).
    - ``"actors"``: an autoscaling actor pool
      (``concurrency=(min, max)``, sized to the cluster) — parser/model
      state built once per actor in ``__init__``. Right when state is
      heavy (real OCR/layout model weights) or concurrency must be
      bounded (rate-limited clients). Measurably slower to dispatch for
      sub-millisecond-per-doc work, so not the default here.
    """
    if skew_bucketing:
        ds = bucket_by_size(ds)
    ds = ds.map_batches(classify_spans, batch_format="pyarrow",
                        batch_size=batch_size)
    if layout_mode == "tasks":
        ds = ds.map_batches(layout_parse, batch_format="pyarrow",
                            batch_size=batch_size)
    else:
        if layout_concurrency is None:
            from ..functions.cluster import cluster_cpus
            # min 1 so small sessions never starve the read/write task
            # pools (two pools with min>=2 deadlock a 4-CPU session)
            layout_concurrency = (1, max(2, cluster_cpus() - 2))
        ds = ds.map_batches(LayoutParser, batch_format="pyarrow",
                            batch_size=batch_size,
                            concurrency=layout_concurrency,
                            num_cpus=1)
    return ds.map_batches(reassemble_spans, batch_format="pyarrow",
                          batch_size=batch_size)


def run_extract(input_path: str, output_path: str | None = None,
                **kwargs) -> Dataset:
    out = extract_pipeline(read_docs(input_path), **kwargs)
    if output_path is not None:
        out.write_parquet(output_path)
    return out


def safe_extract_pipeline(ds: Dataset, *, batch_size: int = 256,
                          kernel=None) -> Dataset:
    """Error-as-data variant of the streaming path (SURVEY.md §4: one
    poisoned document must never fail the job — the reference's
    per-page failure counters generalized,
    gpt4_comprehensive_visual_processor.py:411-421).

    Each batch runs the fused kernel; on failure it falls back to
    per-document execution and emits error rows (empty spans +
    status/error columns) for exactly the documents that fail. Output =
    OUT_SCHEMA + (status: string, error: string).

    ``kernel`` (a DOCS_SCHEMA table -> OUT_SCHEMA table callable)
    defaults to the real three-stage chain; tests inject failing kernels.
    """
    import pyarrow as pa

    from ..schema import SPAN_STRUCT
    from ..stages.layout import layout_parse

    if kernel is None:
        def kernel(t: pa.Table) -> pa.Table:
            return reassemble_spans(layout_parse(classify_spans(t)))

    def _finish(out: pa.Table, status: list[str], errors: list[str]) -> pa.Table:
        return (out.append_column("status", pa.array(status, type=pa.string()))
                   .append_column("error", pa.array(errors, type=pa.string())))

    def safe(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        try:
            out = kernel(batch)
            return _finish(out, ["ok"] * len(out), [""] * len(out))
        except Exception:
            pass
        # isolate: one doc at a time; failures become rows, not raises
        parts, status, errors = [], [], []
        for i in range(len(batch)):
            row = batch.slice(i, 1)
            try:
                parts.append(kernel(row))
                status.append("ok")
                errors.append("")
            except Exception as e:          # error-as-data
                parts.append(pa.Table.from_arrays(
                    [row.column("doc_id"),
                     pa.array([[]], type=pa.list_(SPAN_STRUCT))],
                    names=["doc_id", "spans"]))
                status.append("error")
                errors.append(repr(e)[:500])
        return _finish(pa.concat_tables(parts), status, errors)

    return ds.map_batches(safe, batch_format="pyarrow", batch_size=batch_size)
