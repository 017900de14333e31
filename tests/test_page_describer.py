"""Page-granular describer invariants vs the doc-granular one."""

import pytest

import ray.data as rd

from pdf_extraction_ray.fixtures.generator import generate_docs_table
from pdf_extraction_ray.pipelines.analysis import (analysis_pipeline,
                                                   page_analysis_pipeline)


@pytest.mark.usefixtures("ray_session")
def test_page_and_doc_visuals_consistent():
    docs = generate_docs_table(42, 0, 120)
    doc_rows = analysis_pipeline(rd.from_arrow(docs)).take_all()
    page_rows = page_analysis_pipeline(rd.from_arrow(docs)).take_all()

    by_doc_pages: dict[str, list] = {}
    for r in page_rows:
        by_doc_pages.setdefault(r["doc_id"], []).append(r)

    for d in doc_rows:
        pages = by_doc_pages.get(d["doc_id"], [])
        # a doc has visuals iff some page does
        assert d["has_visuals"] == any(p["has_visuals"] for p in pages), \
            d["doc_id"]
        # pages are unique and ordered-compatible
        pgs = [p["page"] for p in pages]
        assert len(pgs) == len(set(pgs))
        # per-page table/figure counts sum to at least the doc's counts
        # only for tables (describer emits one separator block per table
        # span in both granularities)
        assert sum(p["tables"] for p in pages) == d["tables"], d["doc_id"]
