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
