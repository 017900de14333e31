"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline; ``queries()`` exposes
every implemented operator/pipeline family (SURVEY.md §2 + the
training-data-scale additions); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible query (identical column names and
integer-scaled numerics so value hashes match bit-exactly).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _explode_spans(batch, columns=("kind", "text", "media_ref", "offset")):
    """OUT_SCHEMA batch -> one row per span (shared by entry() and the
    extraction queries)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    doc_id = pc.take(batch.column("doc_id"), pc.list_parent_indices(spans))
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    return pa.Table.from_arrays(
        [doc_id] + [pc.struct_field(flat, c) for c in columns],
        names=["doc_id", *columns])


def entry() -> Any:
    """Flagship pipeline over /root/testdata/sf0.001: adapt the plain-text
    ``documents`` table into interleaved (doc_id, spans) rows, run the
    3-stage extraction pipeline (tokenize -> layout -> reassemble), and
    return the flattened span table."""
    from pdf_extraction_ray.sources import dataset_from_text_table
    from pdf_extraction_ray.pipelines import extract_pipeline

    ds = dataset_from_text_table("/root/testdata/sf0.001/documents.parquet")
    return extract_pipeline(ds).map_batches(_explode_spans,
                                            batch_format="pyarrow")


def _extract_spans_query(sf_dir: str):
    """Flagship extraction over the deterministic synthetic interleaved
    corpus (scaled by sf tier), flattened to one row per span."""
    from functools import partial

    from pdf_extraction_ray.pipelines.analysis import _corpus_for
    from pdf_extraction_ray.sources import read_docs
    from pdf_extraction_ray.pipelines import extract_pipeline

    out = extract_pipeline(read_docs(_corpus_for(sf_dir)))
    return out.map_batches(partial(_explode_spans, columns=("kind", "offset")),
                           batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_extraction_ray.registry import all_queries

    out: dict[str, Callable[[str], Any]] = {
        name: fn for name, (fn, _sql) in all_queries().items()}
    out["extract_flagship_spans"] = _extract_spans_query
    return out


def oracle_sql() -> dict[str, str]:
    from pdf_extraction_ray.registry import all_queries

    return {name: sql for name, (_fn, sql) in all_queries().items()
            if sql is not None}
