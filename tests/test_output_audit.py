"""Extraction output-contract audit: zero violations on the healthy
pipeline, and every counter provably fires on planted corruption."""

import pandas as pd
import pyarrow as pa
import pytest

from pdf_extraction_ray.pipelines.analysis import (
    _AUDIT_COLS, audit_extract_batch, extract_output_audit)


def _out_table(spans_per_doc):
    span_t = pa.struct([("kind", pa.string()), ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32())])
    return pa.Table.from_pydict(
        {"doc_id": [str(i) for i in range(len(spans_per_doc))],
         "spans": pa.array(spans_per_doc, type=pa.list_(span_t))})


def _span(kind="paragraph", text="hello world", media="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media,
            "offset": offset}


class TestAuditKernel:
    def test_clean_batch_is_all_zero(self):
        t = _out_table([[_span(offset=0), _span("title", "T", offset=1),
                         _span("figure", "ocr", "m1", 2)],
                        [_span(offset=0)]])
        out = audit_extract_batch(t).to_pydict()
        assert out["n_docs"] == [2] and out["n_spans"] == [4]
        for c in _AUDIT_COLS[2:]:
            assert out[c] == [0], c

    def test_bad_kind_fires(self):
        t = _out_table([[_span(kind="banner")]])
        assert audit_extract_batch(t)["bad_kind_spans"][0].as_py() == 1

    def test_order_violation_fires_per_doc(self):
        t = _out_table([[_span(offset=5), _span(offset=3),
                         _span(offset=1)],           # one bad doc
                        [_span(offset=0), _span(offset=7)]])
        out = audit_extract_batch(t)
        assert out["bad_order_docs"][0].as_py() == 1

    def test_blank_textual_fires_but_not_figure(self):
        t = _out_table([[_span(text="   "),               # blank para
                         _span("figure", "", "m", 1)]])   # figures exempt
        assert audit_extract_batch(t)["blank_text_spans"][0].as_py() == 1

    def test_null_fields_fire(self):
        t = _out_table([[_span()]])
        # null out the kind via a rebuilt struct column
        spans = t.column("spans").combine_chunks()
        flat = spans.flatten()
        import pyarrow.compute as pc
        null_kind = pa.array([None], type=pa.string())
        rebuilt = pa.ListArray.from_arrays(
            spans.offsets, pa.StructArray.from_arrays(
                [null_kind, pc.struct_field(flat, "text"),
                 pc.struct_field(flat, "media_ref"),
                 pc.struct_field(flat, "offset")],
                names=["kind", "text", "media_ref", "offset"]))
        t2 = pa.Table.from_pydict({"doc_id": ["0"], "spans": rebuilt})
        out = audit_extract_batch(t2)
        assert out["null_field_spans"][0].as_py() == 1
        assert out["bad_kind_spans"][0].as_py() == 1


@pytest.mark.usefixtures("ray_session")
def test_pipeline_output_is_violation_free():
    out = extract_output_audit("/root/testdata/sf0.001")
    assert isinstance(out, pd.DataFrame) and len(out) == 1
    row = out.iloc[0]
    assert row["n_docs"] > 0 and row["n_spans"] > 0
    for c in _AUDIT_COLS[2:]:
        assert row[c] == 0, c
