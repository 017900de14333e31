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


def entry() -> Any:
    """Flagship pipeline over /root/testdata/sf0.001: adapt the plain-text
    ``documents`` table into interleaved (doc_id, spans) rows, run the
    3-stage extraction pipeline (tokenize -> layout actor pool ->
    reassemble), and return the flattened span table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pdf_extraction_ray.sources import dataset_from_text_table
    from pdf_extraction_ray.pipelines import extract_pipeline

    ds = dataset_from_text_table("/root/testdata/sf0.001/documents.parquet")
    out = extract_pipeline(ds)

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans)
        doc_id = pc.take(batch.column("doc_id"), parent)
        return pa.Table.from_arrays(
            [doc_id if not isinstance(doc_id, pa.ChunkedArray) else doc_id.combine_chunks(),
             pc.struct_field(flat, "kind"),
             pc.struct_field(flat, "text"),
             pc.struct_field(flat, "media_ref"),
             pc.struct_field(flat, "offset")],
            names=["doc_id", "kind", "text", "media_ref", "offset"])

    return out.map_batches(explode, batch_format="pyarrow")


def _extract_spans_query(sf_dir: str):
    """Flagship extraction over the deterministic synthetic interleaved
    corpus (scaled by sf tier), flattened to one row per span."""
    from pdf_extraction_ray.fixtures import ensure_corpus
    from pdf_extraction_ray.sources import read_docs
    from pdf_extraction_ray.pipelines import extract_pipeline
    import pyarrow as pa
    import pyarrow.compute as pc

    n = {"sf0.001": 100, "sf0.01": 2000, "sf0.1": 20000}.get(
        sf_dir.rstrip("/").rsplit("/", 1)[-1], 2000)
    path = ensure_corpus("query", 42, n)
    out = extract_pipeline(read_docs(path))

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans)
        doc_id = pc.take(batch.column("doc_id"), parent)
        if isinstance(doc_id, pa.ChunkedArray):
            doc_id = doc_id.combine_chunks()
        return pa.Table.from_arrays(
            [doc_id, pc.struct_field(flat, "kind"),
             pc.struct_field(flat, "offset")],
            names=["doc_id", "kind", "offset"])

    return out.map_batches(explode, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_extraction_ray.pipelines.relational import RELATIONAL_QUERIES
    from pdf_extraction_ray.pipelines.textops import TEXT_QUERIES
    from pdf_extraction_ray.pipelines.dedup import DEDUP_QUERIES
    from pdf_extraction_ray.pipelines.similarity import SIMILARITY_QUERIES
    from pdf_extraction_ray.pipelines.analysis import ANALYSIS_QUERIES
    from pdf_extraction_ray.pipelines.retrieval import RETRIEVAL_QUERIES
    from pdf_extraction_ray.pipelines.media import MEDIA_QUERIES
    from pdf_extraction_ray.pipelines.compare import COMPARE_QUERIES
    from pdf_extraction_ray.pipelines.streaming import STREAMING_QUERIES

    out: dict[str, Callable[[str], Any]] = {}
    for reg in (RELATIONAL_QUERIES, TEXT_QUERIES, DEDUP_QUERIES,
                SIMILARITY_QUERIES, ANALYSIS_QUERIES, RETRIEVAL_QUERIES,
                MEDIA_QUERIES, COMPARE_QUERIES, STREAMING_QUERIES):
        for name, (fn, _sql) in reg.items():
            out[name] = fn
    out["extract_flagship_spans"] = _extract_spans_query
    return out


def oracle_sql() -> dict[str, str]:
    from pdf_extraction_ray.pipelines.relational import RELATIONAL_QUERIES
    from pdf_extraction_ray.pipelines.textops import TEXT_QUERIES
    from pdf_extraction_ray.pipelines.dedup import DEDUP_QUERIES
    from pdf_extraction_ray.pipelines.similarity import SIMILARITY_QUERIES
    from pdf_extraction_ray.pipelines.streaming import STREAMING_QUERIES

    out: dict[str, str] = {}
    for reg in (RELATIONAL_QUERIES, TEXT_QUERIES, DEDUP_QUERIES,
                SIMILARITY_QUERIES, STREAMING_QUERIES):
        for name, (_fn, sql) in reg.items():
            if sql is not None:
                out[name] = sql
    return out
