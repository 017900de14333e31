"""Error-as-data streaming path: a poisoned document becomes an error row,
never a failed job; healthy docs in the same batch are unaffected."""

import pyarrow as pa
import pytest

import ray.data as rd

from pdf_extraction_ray.fixtures.generator import generate_docs_table
from pdf_extraction_ray.fixtures.golden import golden_extract_table
from pdf_extraction_ray.pipelines.extract import safe_extract_pipeline
from pdf_extraction_ray.stages.layout import layout_parse
from pdf_extraction_ray.stages.reassemble import reassemble_spans
from pdf_extraction_ray.stages.tokenize import classify_spans


@pytest.mark.usefixtures("ray_session")
def test_poisoned_doc_becomes_error_row():
    # defined inline so cloudpickle ships it by value (test modules are
    # not importable from ray workers)
    def poisoned_kernel(t: pa.Table) -> pa.Table:
        if "doc-00000007" in t.column("doc_id").to_pylist():
            raise ValueError("poisoned doc")
        return reassemble_spans(layout_parse(classify_spans(t)))

    docs = generate_docs_table(42, 0, 30)
    out = safe_extract_pipeline(rd.from_arrow(docs), batch_size=10,
                                kernel=poisoned_kernel).take_all()
    assert len(out) == 30
    by_id = {r["doc_id"]: r for r in out}
    bad = by_id["doc-00000007"]
    assert bad["status"] == "error"
    assert "poisoned" in bad["error"]
    assert bad["spans"] == []
    # every other doc extracted normally and matches golden
    golden = {r["doc_id"]: r["spans"]
              for r in golden_extract_table(docs).to_pylist()}
    for doc_id, r in by_id.items():
        if doc_id == "doc-00000007":
            continue
        assert r["status"] == "ok" and r["error"] == ""
        assert r["spans"] == golden[doc_id], doc_id


@pytest.mark.usefixtures("ray_session")
def test_healthy_input_all_ok():
    docs = generate_docs_table(42, 0, 20)
    out = safe_extract_pipeline(rd.from_arrow(docs), batch_size=7).take_all()
    assert len(out) == 20
    assert all(r["status"] == "ok" for r in out)
