"""Analysis pipeline: extraction output -> heuristic visual describer
(VLM stand-in actor pool) -> vectorized content-type counters -> per-doc
counts and global totals (A2/A3 aggregates in SURVEY.md §2.6).

Rebuild of the reference's VLM-only lifecycle (SURVEY.md §3.2) with the
memory hazard fixed: pages/docs stream through the describer in batches
instead of rasterizing everything up front (gpt4_comprehensive_visual_
processor.py:349).
"""

from __future__ import annotations

import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..fixtures.generator import ensure_corpus
from ..sources.io import read_docs
from ..stages.counters import analyze_content_types_batch
from ..stages.describe import VisualDescriber
from .extract import extract_pipeline

COUNT_COLS = ["formulas", "tables", "graphs", "figures", "data_points"]


def _corpus_for(sf_dir: str) -> str:
    n = {"sf0.001": 100, "sf0.01": 2000, "sf0.1": 20000}.get(
        sf_dir.rstrip("/").rsplit("/", 1)[-1], 2000)
    return ensure_corpus("query", 42, n)


def analysis_pipeline(ds: Dataset, *, batch_size: int = 256,
                      describer_concurrency=None,
                      describer_num_gpus: float | None = None,
                      describer_resources: dict | None = None) -> Dataset:
    """``describer_num_gpus`` / ``describer_resources``: accelerator /
    rate-limit-slot claim per describer actor (SURVEY T5/T8) — a real
    VLM pool passes a GPU fraction or an endpoint-slot resource here;
    defaulted off."""
    from ..functions.cluster import accel_remote_args
    if describer_concurrency is None:
        from ..functions.cluster import half_pool
        describer_concurrency = half_pool()
    out = extract_pipeline(ds, batch_size=batch_size)
    out = out.map_batches(VisualDescriber, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=describer_concurrency, num_cpus=1,
                          **accel_remote_args(describer_num_gpus,
                                              describer_resources))
    return out.map_batches(analyze_content_types_batch, batch_format="pyarrow", batch_size=None)


def page_analysis_pipeline(ds: Dataset, *, batch_size: int = 256,
                           describer_num_gpus: float | None = None,
                           describer_resources: dict | None = None) -> Dataset:
    """Page-granular analysis (the reference's per-page VLM unit): layout
    output -> per-(doc, page) describer -> counters."""
    from ..functions.cluster import accel_remote_args, half_pool
    from ..stages.describe import PageVisualDescriber
    from ..stages.layout import layout_parse
    from ..stages.tokenize import classify_spans
    ds = ds.map_batches(classify_spans, batch_format="pyarrow",
                        batch_size=batch_size)
    ds = ds.map_batches(layout_parse, batch_format="pyarrow",
                        batch_size=batch_size)
    ds = ds.map_batches(PageVisualDescriber, batch_format="pyarrow",
                        batch_size=batch_size,
                        concurrency=half_pool(), num_cpus=1,
                        **accel_remote_args(describer_num_gpus,
                                            describer_resources))
    return ds.map_batches(analyze_content_types_batch, batch_format="pyarrow", batch_size=None)


def vlm_page_counts(sf_dir: str):
    """Per-(doc, page) content-type counts (rows-only)."""
    ds = page_analysis_pipeline(read_docs(_corpus_for(sf_dir)))
    return ds.select_columns(["doc_id", "page", "has_visuals"] + COUNT_COLS)


def vlm_page_totals(sf_dir: str):
    """Run summary at page granularity (the reference's summary block:
    total_pages, pages_with_visuals + element totals,
    hybrid_docling_gpt4_processor.py:511-517)."""
    ds = page_analysis_pipeline(read_docs(_corpus_for(sf_dir)))

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        arrays = [pa.array([len(batch)], type=pa.int64()),
                  pa.array([pc.sum(pc.cast(batch["has_visuals"], pa.int64()))
                            .as_py() or 0], type=pa.int64())]
        names = ["total_pages", "pages_with_visuals"]
        for c in COUNT_COLS:
            arrays.append(pa.array([pc.sum(batch[c]).as_py() or 0],
                                   type=pa.int64()))
            names.append(f"total_{c}")
        return pa.Table.from_arrays(arrays, names=names)

    cols = (["total_pages", "pages_with_visuals"]
            + [f"total_{c}" for c in COUNT_COLS])
    res = ds.map_batches(partial, batch_format="pyarrow", batch_size=None) \
            .aggregate(*[Sum(c, alias_name=c) for c in cols])
    import pandas as pd
    return pd.DataFrame([res])[cols]


def vlm_content_counts(sf_dir: str):
    """Per-doc content-type counts over the synthetic corpus (rows-only)."""
    ds = analysis_pipeline(read_docs(_corpus_for(sf_dir)))
    return ds.select_columns(["doc_id", "has_visuals"] + COUNT_COLS)


def vlm_content_totals(sf_dir: str):
    """Global totals + pages-with-visuals count (A2/A3 partial+final)."""
    ds = analysis_pipeline(read_docs(_corpus_for(sf_dir)))

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        arrays = [pa.array([len(batch)], type=pa.int64())]
        names = ["n_docs"]
        arrays.append(pa.array(
            [pc.sum(pc.cast(batch["has_visuals"], pa.int64())).as_py() or 0],
            type=pa.int64()))
        names.append("docs_with_visuals")
        for c in COUNT_COLS:
            arrays.append(pa.array([pc.sum(batch[c]).as_py() or 0],
                                   type=pa.int64()))
            names.append(f"total_{c}")
        return pa.Table.from_arrays(arrays, names=names)

    cols = ["n_docs", "docs_with_visuals"] + [f"total_{c}" for c in COUNT_COLS]
    res = ds.map_batches(partial, batch_format="pyarrow", batch_size=None) \
            .aggregate(*[Sum(c, alias_name=c) for c in cols])
    import pandas as pd
    return pd.DataFrame([res])[cols]


def spatial_relations(sf_dir: str):
    """Doc-local pairwise spatial relations (J2) over the synthetic corpus."""
    from ..stages.spatial import spatial_relations_batch
    from ..stages.tokenize import classify_spans
    ds = read_docs(_corpus_for(sf_dir))
    return ds.map_batches(classify_spans, batch_format="pyarrow", batch_size=None) \
             .map_batches(spatial_relations_batch, batch_format="pyarrow", batch_size=None)


def visual_docs(sf_dir: str):
    """M21 visual-analysis doc builder: page analyses with has_visuals ->
    retrieval documents with metadata (complete_multimodal_rag_
    evaluation.py:156-176 analog)."""
    import pyarrow.compute as pc
    ds = analysis_pipeline(read_docs(_corpus_for(sf_dir)))

    def build(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["has_visuals"], True))
        n = len(t)
        return pa.Table.from_arrays(
            [t["doc_id"], t["analysis_md"],
             pa.array(["visual_analysis"] * n, type=pa.string()),
             pa.array([True] * n, type=pa.bool_())],
            names=["doc_id", "page_content", "type", "has_visuals"])

    return ds.map_batches(build, batch_format="pyarrow", batch_size=None)


def xycut_reading_order(sf_dir: str):
    """XY-cut reading order per (doc, page) over kept spans: one row per
    span with its whitespace-cut rank (rows-only; the ordering itself is
    unit-tested against constructed layouts)."""
    import numpy as np
    import pyarrow.compute as pc
    from ..functions.arrow_utils import as_array, list_offsets
    from ..functions.xycut import xy_cut_order
    from ..stages.tokenize import classify_spans

    def ranks(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        spans = batch.column("spans")
        offsets = list_offsets(spans)
        flat = as_array(pc.list_flatten(spans))
        span_off = pc.struct_field(flat, "offset").to_numpy(zero_copy_only=False)
        keep = as_array(pc.list_flatten(batch.column("keep"))) \
            .to_numpy(zero_copy_only=False)
        page = as_array(pc.list_flatten(batch.column("page"))) \
            .to_numpy(zero_copy_only=False)
        nested = as_array(pc.list_flatten(batch.column("bbox")))
        bb = np.nan_to_num(nested.values.to_numpy(zero_copy_only=False).astype(np.float64),
                           nan=0.0).reshape(-1, 4) \
            if len(nested) else np.zeros((0, 4))
        doc_ids = batch.column("doc_id").to_pylist()
        rows = {"doc_id": [], "page": [], "offset": [], "xy_rank": []}
        for d in range(len(doc_ids)):
            lo, hi = offsets[d], offsets[d + 1]
            k = keep[lo:hi]
            pg = page[lo:hi]
            for p in np.unique(pg[k]):
                idx = np.nonzero(k & (pg == p))[0]
                order = xy_cut_order(bb[lo + idx])
                for rank, oi in enumerate(order):
                    rows["doc_id"].append(doc_ids[d])
                    rows["page"].append(int(p))
                    rows["offset"].append(int(span_off[lo + idx[oi]]))
                    rows["xy_rank"].append(rank)
        return pa.Table.from_arrays(
            [pa.array(rows["doc_id"], type=pa.string()),
             pa.array(rows["page"], type=pa.int32()),
             pa.array(rows["offset"], type=pa.int32()),
             pa.array(rows["xy_rank"], type=pa.int32())],
            names=["doc_id", "page", "offset", "xy_rank"])

    return read_docs(_corpus_for(sf_dir)) \
        .map_batches(classify_spans, batch_format="pyarrow", batch_size=None) \
        .map_batches(ranks, batch_format="pyarrow", batch_size=None)


_AUDIT_KINDS = ("title", "paragraph", "list", "table", "figure",
                "caption")
_AUDIT_COLS = ("n_docs", "n_spans", "bad_kind_spans", "bad_order_docs",
               "blank_text_spans", "null_field_spans")


def audit_extract_batch(batch: pa.Table) -> pa.Table:
    """Output-contract audit partials for one OUT_SCHEMA batch (the
    north rule's per-partition metrics surface): every counter is a
    violation of an invariant the spec guarantees, so a healthy corpus
    sums to all-zero. Vectorized — flatten once, numpy masks, no
    per-span python."""
    import numpy as np
    import pyarrow.compute as pc

    batch = batch.combine_chunks()
    spans = batch.column("spans")
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kind = pc.struct_field(flat, "kind")
    text = pc.struct_field(flat, "text")
    off = pc.struct_field(flat, "offset")
    nulls = (pc.is_null(kind).to_numpy(zero_copy_only=False)
             | pc.is_null(text).to_numpy(zero_copy_only=False)
             | pc.is_null(off).to_numpy(zero_copy_only=False))
    bad_kind = ~pc.is_in(pc.fill_null(kind, ""),
                         value_set=pa.array(_AUDIT_KINDS)) \
        .to_numpy(zero_copy_only=False)
    # whitespace-only text is stripped for textual kinds by the spec
    textual = pc.is_in(pc.fill_null(kind, ""),
                       value_set=pa.array(
                           ["title", "paragraph", "list", "caption"])) \
        .to_numpy(zero_copy_only=False)
    blank = textual & (pc.utf8_length(
        pc.utf8_trim_whitespace(pc.fill_null(text, "")))
        .to_numpy(zero_copy_only=False) == 0)
    # reassembly emits spans sorted by offset within each doc
    offv = pc.fill_null(off, 0).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    if len(offv) > 1:
        same_doc = parent[1:] == parent[:-1]
        desc = same_doc & (offv[1:] < offv[:-1])
        bad_docs = np.unique(parent[1:][desc]).size
    else:
        bad_docs = 0
    return pa.Table.from_pydict({
        "n_docs": [np.int64(len(batch))],
        "n_spans": [np.int64(len(parent))],
        "bad_kind_spans": [np.int64(int(bad_kind.sum()))],
        "bad_order_docs": [np.int64(int(bad_docs))],
        "blank_text_spans": [np.int64(int(blank.sum()))],
        "null_field_spans": [np.int64(int(nulls.sum()))]})


def extract_output_audit(sf_dir: str):
    """Run the flagship extraction over the deterministic synthetic
    corpus and audit every output batch against the span contract
    (kind vocabulary, offset ordering, no blank textual spans, no
    nulls). One totals row; all violation counters MUST be zero — this
    is the cheap always-on data-quality gate a 10^12-doc run tails per
    partition before marking a manifest complete."""
    out = extract_pipeline(read_docs(_corpus_for(sf_dir)))
    totals = (out.map_batches(audit_extract_batch,
                              batch_format="pyarrow", batch_size=None)
              .sum(list(_AUDIT_COLS)))
    import pandas as pd
    return pd.DataFrame([{c: int(totals[f"sum({c})"])
                          for c in _AUDIT_COLS}])


ANALYSIS_QUERIES: dict[str, tuple] = {
    "extract_output_audit": (extract_output_audit, None),
    "vlm_content_counts": (vlm_content_counts, None),
    "vlm_content_totals": (vlm_content_totals, None),
    "spatial_relations": (spatial_relations, None),
    "xycut_reading_order": (xycut_reading_order, None),
    "visual_docs": (visual_docs, None),
    "vlm_page_counts": (vlm_page_counts, None),
    "vlm_page_totals": (vlm_page_totals, None),
}
