"""Heuristic "visual describer" — the deterministic stand-in for the
reference's VLM page-analysis stage (M13/T5 in SURVEY.md: hybrid_docling_
gpt4_processor.py:430-472; gpt4_comprehensive_visual_processor.py:143-184).

A stateful actor pool (prompt/template state loaded once per actor, like
the real model client would be) that turns each extracted document's span
sequence into the section-structured analysis markdown the counter
operators parse. No network, no model — a pure function of the spans —
but the actor-pool mechanics, bounded concurrency and output schema match
what a real VLM client stage needs.
"""

from __future__ import annotations

import re

import pyarrow as pa

from .. import spec
from ..functions.arrow_utils import as_array


class VisualDescriber:
    """(doc_id, spans) -> (doc_id, analysis_md, has_visuals)."""

    def __init__(self):
        # per-actor "model state": the prompt/section templates
        self.sections = ["Mathematical Formulas", "Tables and Data",
                         "Graphs and Charts", "Figures and Diagrams"]

    def _describe(self, spans: list[dict]) -> tuple[str, bool]:
        formulas = [s for s in spans if "=" in s["text"]]
        tables = [s for s in spans if s["kind"] == spec.OUT_TABLE]
        figures = [s for s in spans
                   if s["kind"] == spec.OUT_FIGURE and s["media_ref"]]
        graphs = [s for s in figures if s["media_ref"].startswith("vector://")]
        images = [s for s in figures if s["media_ref"].startswith("media://")]

        out = ["## Page Analysis", ""]
        out.append("### Mathematical Formulas")
        if formulas:
            out += [f"{i}. **Equation {i}**: {s['text'][:40]}"
                    for i, s in enumerate(formulas, 1)]
        else:
            out.append("There are no mathematical formulas on this page.")
        out.append("### Tables and Data")
        if tables:
            for s in tables:
                out += [f"**{s['text']}**", "| col1 | col2 |", "|---|---|",
                        "| v1 | v2 |"]
        else:
            out.append("There are no tables on this page.")
        out.append("### Graphs and Charts")
        if graphs:
            out += [f"{i}. **Figure G{i}**: vector graphic region"
                    for i, _ in enumerate(graphs, 1)]
        else:
            out.append("There are no graphs or charts present.")
        out.append("### Figures and Diagrams")
        if images:
            out += [f"{i}. **Figure {i}**: {s['text']}"
                    for i, s in enumerate(images, 1)]
        else:
            out.append("There are no figures or diagrams present.")
        has_visuals = bool(tables or figures)
        return "\n".join(out), has_visuals

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        mds, viz = [], []
        for spans in spans_col.to_pylist():
            md, h = self._describe(spans)
            mds.append(md)
            viz.append(h)
        return pa.Table.from_arrays(
            [as_array(batch.column("doc_id")),
             pa.array(mds, type=pa.string()),
             pa.array(viz, type=pa.bool_())],
            names=["doc_id", "analysis_md", "has_visuals"])


_REGION_PAGE_RE = re.compile(r"^vector://[^/]*/p([0-9]+)/")


class PageVisualDescriber(VisualDescriber):
    """Page-granular variant — one analysis per (doc, page), the
    reference's actual unit (serial per-page VLM loop, SURVEY.md §3.2,
    rebuilt as a streaming batch stage). Consumes the LAYOUT stage output
    (kept spans carry `page`; synthesized region spans carry their page in
    the media_ref `vector://{doc}/p{page}/r{i}`)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: C901
        import numpy as np
        import pyarrow.compute as pc
        from ..functions.arrow_utils import as_array, list_offsets

        batch = batch.combine_chunks()
        spans = batch.column("spans")
        offsets = list_offsets(spans)
        flat = as_array(pc.list_flatten(spans))
        keep = as_array(pc.list_flatten(batch.column("keep"))) \
            .to_numpy(zero_copy_only=False)
        page = as_array(pc.fill_null(pc.list_flatten(batch.column("page")), 0)) \
            .to_numpy(zero_copy_only=False)
        cls = as_array(pc.list_flatten(batch.column("cls"))).to_pylist()
        text = as_array(pc.list_flatten(batch.column("out_text"))).to_pylist()
        media = as_array(pc.fill_null(
            pc.struct_field(flat, "media_ref"), "")).to_pylist()
        regions_py = batch.column("region_spans").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()

        out = {"doc_id": [], "page": [], "analysis_md": [], "has_visuals": []}
        for d in range(len(doc_ids)):
            lo, hi = offsets[d], offsets[d + 1]
            by_page: dict[int, list[dict]] = {}
            for j in range(lo, hi):
                if not keep[j]:
                    continue
                by_page.setdefault(int(page[j]), []).append(
                    {"kind": cls[j], "text": text[j], "media_ref": media[j]})
            for r in regions_py[d]:
                m = _REGION_PAGE_RE.match(r["media_ref"])
                pg = int(m.group(1)) if m else 0
                by_page.setdefault(pg, []).append(r)
            for pg in sorted(by_page):
                md, h = self._describe(by_page[pg])
                out["doc_id"].append(doc_ids[d])
                out["page"].append(pg)
                out["analysis_md"].append(md)
                out["has_visuals"].append(h)
        return pa.Table.from_arrays(
            [pa.array(out["doc_id"], type=pa.string()),
             pa.array(out["page"], type=pa.int32()),
             pa.array(out["analysis_md"], type=pa.string()),
             pa.array(out["has_visuals"], type=pa.bool_())],
            names=["doc_id", "page", "analysis_md", "has_visuals"])
