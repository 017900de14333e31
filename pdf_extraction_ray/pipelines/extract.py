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
from ..stages.layout import LayoutParser
from ..stages.reassemble import reassemble_spans


def extract_pipeline(ds: Dataset, *, batch_size: int = 256,
                     layout_concurrency=None) -> Dataset:
    """Wire the three extraction stages onto an interleaved-docs Dataset.

    ``batch_size`` is rows (documents) per batch — kept modest because one
    row can hold a pathological multi-hundred-page doc; layout runs as an
    autoscaling actor pool (``concurrency=(min, max)``) so parser state is
    loaded once per actor, not per batch.
    """
    ds = ds.map_batches(classify_spans, batch_format="pyarrow",
                        batch_size=batch_size)
    ds = ds.map_batches(LayoutParser, batch_format="pyarrow",
                        batch_size=batch_size,
                        concurrency=layout_concurrency or (1, 8),
                        num_cpus=1)
    return ds.map_batches(reassemble_spans, batch_format="pyarrow",
                          batch_size=batch_size)


def run_extract(input_path: str, output_path: str | None = None,
                **kwargs) -> Dataset:
    out = extract_pipeline(read_docs(input_path), **kwargs)
    if output_path is not None:
        out.write_parquet(output_path)
    return out
