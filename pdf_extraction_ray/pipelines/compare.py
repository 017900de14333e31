"""A/B comparison harness (rebuild of compare_gpt_vs_hybrid.py: run two
pipeline variants on the same input, compare outputs + wall time) and the
debug-overlay diagnostic sink (hybrid_docling_gpt4_processor.py:591-662
analog: per-span bbox/kind records for visual tooling — structured rows
instead of rendered PNGs, off the hot path)."""

from __future__ import annotations

import time

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrow_utils import as_array
from ..sources.io import read_docs
from .analysis import _corpus_for
from .extract import extract_pipeline


def _seqs(rows) -> dict:
    return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                          for s in r["spans"]] for r in rows}


def compare_extract_modes(sf_dir: str) -> pd.DataFrame:
    """Run the task-mode and actor-mode layout variants on the same corpus
    and report agreement + timings (one summary row)."""
    path = _corpus_for(sf_dir)

    t0 = time.perf_counter()
    a = _seqs(extract_pipeline(read_docs(path)).take_all())
    t_a = time.perf_counter() - t0

    t0 = time.perf_counter()
    b = _seqs(extract_pipeline(read_docs(path),
                               layout_mode="actors").take_all())
    t_b = time.perf_counter() - t0

    mism = sum(1 for k in a if a[k] != b.get(k))
    return pd.DataFrame([{
        "n_docs": len(a),
        "mismatched_docs": mism,
        "identical": mism == 0 and set(a) == set(b),
        "sec_tasks": round(t_a, 3),
        "sec_actors": round(t_b, 3),
    }])


def debug_overlay_records(sf_dir: str):
    """Diagnostic overlay rows: (doc_id, page, kind, bbox coords, keep)
    per input span — what a renderer would draw; structured, not rasters."""
    from ..stages.tokenize import classify_spans
    import numpy as np

    def records(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        spans = batch.column("spans")
        flat = as_array(pc.list_flatten(spans))
        parent = as_array(pc.list_parent_indices(spans))
        doc_id = as_array(pc.take(batch.column("doc_id"), parent))
        cls = as_array(pc.list_flatten(batch.column("cls")))
        keep = as_array(pc.list_flatten(batch.column("keep")))
        page = as_array(pc.list_flatten(batch.column("page")))
        nested = as_array(pc.list_flatten(batch.column("bbox")))
        bb = np.nan_to_num(nested.values.to_numpy(zero_copy_only=False).astype(np.float32),
                           nan=0.0).reshape(-1, 4) \
            if len(nested) else np.zeros((0, 4), dtype=np.float32)
        return pa.Table.from_arrays(
            [doc_id, page, cls, keep,
             pa.array(bb[:, 0]), pa.array(bb[:, 1]),
             pa.array(bb[:, 2]), pa.array(bb[:, 3])],
            names=["doc_id", "page", "cls", "keep", "x0", "y0", "x1", "y1"])

    return read_docs(_corpus_for(sf_dir)) \
        .map_batches(classify_spans, batch_format="pyarrow") \
        .map_batches(records, batch_format="pyarrow")


def span_hierarchy(sf_dir: str):
    """Title-anchored parent/child hierarchy over extracted spans."""
    from ..stages.hierarchy import hierarchy_batch
    out = extract_pipeline(read_docs(_corpus_for(sf_dir)))
    return out.map_batches(hierarchy_batch, batch_format="pyarrow")


COMPARE_QUERIES: dict[str, tuple] = {
    "ab_compare_extract_modes": (compare_extract_modes, None),
    "debug_overlay_records": (debug_overlay_records, None),
    "span_hierarchy": (span_hierarchy, None),
}
