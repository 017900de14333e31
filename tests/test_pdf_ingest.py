"""Raw-PDF ingestion slice (round-3 task #1, VERDICT.md):

- exact round trip: ``parse_pdf(synthesize_pdf(row)) == row`` for the
  full fixture generator surface (escapes, Korean hex strings, images,
  link annots, vector regions, permuted span order, pathological docs),
  bit-for-bit after the float32 schema cast;
- golden equality: the PDF-parsed corpus produces span-for-span the same
  extraction OUTPUT as the identical corpus fed as parquet
  (reference analog: advanced_layout_extractor.py:282-341 consumes real
  PDF files; pdf_vector_utils.py:18-36 pulls per-page line drawings).
"""

import numpy as np
import pytest

from pdf_extraction_ray.fixtures import golden_extract_table
from pdf_extraction_ray.fixtures.generator import generate_docs_table
from pdf_extraction_ray.pipelines import extract_pipeline
from pdf_extraction_ray.schema import DOCS_SCHEMA
from pdf_extraction_ray.sources import read_docs
from pdf_extraction_ray.sources.pdf import (
    ensure_pdf_corpus, parse_pdf, read_pdf_docs, synthesize_pdf,
)

import pyarrow as pa


def f32(x):
    return np.float32(x).item()


def canon(row):
    """Canonical doc form: spans (+parallel meta) sorted by (page, offset),
    floats quantized to float32 (the schema's dtype), regions as tuples.
    PDF serialization groups spans by page, so order inside a page is the
    comparable unit; offsets are unique within a page by construction."""
    idx = sorted(range(len(row["spans"])),
                 key=lambda j: (row["page"][j], row["spans"][j]["offset"]))
    spans = [(row["spans"][j]["kind"], row["spans"][j]["text"],
              row["spans"][j]["media_ref"], row["spans"][j]["offset"])
             for j in idx]
    meta = [(row["page"][j], f32(row["font_size"][j]),
             f32(row["link_density"][j]),
             tuple(f32(v) for v in row["bbox"][j])) for j in idx]
    regions = [(r["page"], r["offset"], tuple(f32(v) for v in r["bbox"]),
                tuple(tuple(f32(ln[k]) for k in ("x0", "y0", "x1", "y1"))
                      for ln in r["lines"]))
               for r in row["regions"]]
    return (row["doc_id"], spans, meta, regions)


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_exact(compress):
    """150 generator docs (covers empty docs, single-span docs, permuted
    order, boilerplate+links, images, all region kinds) round-trip
    bit-exactly; n_pages widens to >=1 (a PDF cannot have zero pages)."""
    rows = generate_docs_table(7, 0, 150, pathological_frac=0.02).to_pylist()
    for row in rows:
        parsed = parse_pdf(synthesize_pdf(row, compress=compress))
        assert canon(parsed) == canon(row), row["doc_id"]
        assert parsed["n_pages"] == max(row["n_pages"], 1)


def test_roundtrip_tricky_strings():
    """Escaping and encoding edges: parens, backslashes, newlines (hex
    path), Korean, empty and whitespace-only text."""
    texts = ["(nested (parens))", "back\\slash \\( mix )", "line\nbreak",
             "한국어 텍스트 (mixed) ascii", "", "   ", ")", "\\", "tab\there"]
    spans, fonts, pages, links, bboxes = [], [], [], [], []
    for k, t in enumerate(texts):
        spans.append({"kind": "text", "text": t, "media_ref": "",
                      "offset": 10 * k})
        fonts.append(10.0 + k)
        pages.append(1)
        links.append(0.0 if k % 2 else 0.625)   # exact binary fraction
        bboxes.append([0.125, 0.0625 * k, 0.875, 0.0625 * k + 0.05])
    row = pa.Table.from_pylist(
        [{"doc_id": "tricky-1", "spans": spans, "font_size": fonts,
          "page": pages, "link_density": links, "bbox": bboxes,
          "regions": [], "n_pages": 1}], schema=DOCS_SCHEMA).to_pylist()[0]
    parsed = parse_pdf(synthesize_pdf(row))
    assert canon(parsed) == canon(row)
    assert [s["text"] for s in parsed["spans"]] == texts


@pytest.mark.usefixtures("ray_session")
def test_pdf_golden_output_equality():
    """North rule over the PDF entry point: extract(read_pdf_docs(dir))
    must be span-for-span identical to the golden extractor on the same
    generator corpus."""
    n = 120
    pdf_dir = ensure_pdf_corpus("t-pdfgold", seed=31, n_docs=n)
    docs = generate_docs_table(31, 0, n)
    out = extract_pipeline(read_pdf_docs(pdf_dir)).take_all()
    golden = {r["doc_id"]: r["spans"]
              for r in golden_extract_table(docs).to_pylist()}

    def seq(spans):
        return [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in spans]

    assert len(out) == n
    for row in out:
        assert seq(row["spans"]) == seq(golden[row["doc_id"]]), row["doc_id"]


@pytest.mark.usefixtures("ray_session")
def test_read_docs_dispatches_pdf_dirs():
    """A directory of .pdf files is a first-class corpus input for
    read_docs (S1 dispatch, sources/io.py)."""
    pdf_dir = ensure_pdf_corpus("t-pdfdisp", seed=5, n_docs=12)
    ds = read_docs(pdf_dir)
    rows = ds.take_all()
    assert len(rows) == 12
    assert sorted(r["doc_id"] for r in rows) == [
        f"doc-{i:08d}" for i in range(12)]


def test_parse_rejects_garbage():
    with pytest.raises(Exception):
        parse_pdf(b"not a pdf at all")
