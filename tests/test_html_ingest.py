"""Raw-HTML ingestion slice (the web half of the north rule's "HTML
boilerplate strip / DOM heuristics" contract):

- exact round trip: ``parse_html(synthesize_html(row)) == row`` for the
  full fixture generator surface (entity escaping, Korean text, images,
  real anchors encoding link density, SVG vector regions, permuted span
  order, pathological docs), bit-for-bit after the float32 schema cast;
- golden equality: the HTML-parsed corpus produces span-for-span the
  same extraction OUTPUT as the identical corpus fed as parquet.
"""

import numpy as np
import pytest

import pyarrow as pa

from pdf_extraction_ray.fixtures import golden_extract_table
from pdf_extraction_ray.fixtures.generator import generate_docs_table
from pdf_extraction_ray.pipelines import extract_pipeline
from pdf_extraction_ray.schema import DOCS_SCHEMA
from pdf_extraction_ray.sources import read_docs
from pdf_extraction_ray.sources.html import (
    ensure_html_corpus, parse_html, read_html_docs, synthesize_html,
)


def f32(x):
    return np.float32(x).item()


def canon(row):
    """Canonical doc form: spans (+parallel meta) sorted by (page, offset),
    floats quantized to float32 (the schema's dtype), regions as tuples.
    HTML serialization groups spans by page, so order inside a page is the
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


def test_roundtrip_exact():
    """150 generator docs (covers empty docs, single-span docs, permuted
    order, boilerplate+links, images, all region kinds) round-trip
    bit-exactly; n_pages widens to >=1 (one page div is always written)."""
    rows = generate_docs_table(7, 0, 150, pathological_frac=0.02).to_pylist()
    for row in rows:
        parsed = parse_html(synthesize_html(row))
        assert canon(parsed) == canon(row), row["doc_id"]
        assert parsed["n_pages"] == max(row["n_pages"], 1)


def test_roundtrip_tricky_strings():
    """Markup escaping edges: angle brackets, ampersands/entities,
    quotes, Korean, empty and whitespace-only text."""
    texts = ["<b>not bold</b>", "a & b &amp; c", 'quo"te \'mix\'',
             "한국어 텍스트 <mixed> ascii", "", "   ", ">", "&", "tab\there"]
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
    parsed = parse_html(synthesize_html(row))
    assert canon(parsed) == canon(row)
    assert [s["text"] for s in parsed["spans"]] == texts


def test_boilerplate_rides_footer_elements():
    """The DOM-heuristic contract: boilerplate spans serialize as real
    <footer> elements and the parser recovers the kind from the TAG,
    not from any sidecar."""
    row = pa.Table.from_pylist([{
        "doc_id": "b-1",
        "spans": [{"kind": "text", "text": "body", "media_ref": "",
                   "offset": 0},
                  {"kind": "boilerplate", "text": "(c) 2026 corp",
                   "media_ref": "", "offset": 10}],
        "font_size": [10.0, 8.0], "page": [1, 1],
        "link_density": [0.0, 0.75],
        "bbox": [[0.1, 0.1, 0.9, 0.2], [0.0, 0.95, 1.0, 1.0]],
        "regions": [], "n_pages": 1}], schema=DOCS_SCHEMA).to_pylist()[0]
    markup = synthesize_html(row).decode()
    assert "<footer" in markup and "<a href=" in markup
    parsed = parse_html(synthesize_html(row))
    assert [s["kind"] for s in parsed["spans"]] == ["text", "boilerplate"]
    assert parsed["link_density"][1] == pytest.approx(0.75, abs=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_html_golden_output_equality():
    """North rule over the HTML entry point: extract(read_html_docs(dir))
    must be span-for-span identical to the golden extractor on the same
    generator corpus."""
    n = 120
    html_dir = ensure_html_corpus("t-htmlgold", seed=31, n_docs=n)
    docs = generate_docs_table(31, 0, n)
    out = extract_pipeline(read_html_docs(html_dir)).take_all()
    golden = {r["doc_id"]: r["spans"]
              for r in golden_extract_table(docs).to_pylist()}

    def seq(spans):
        return [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in spans]

    assert len(out) == n
    for row in out:
        assert seq(row["spans"]) == seq(golden[row["doc_id"]]), row["doc_id"]


@pytest.mark.usefixtures("ray_session")
def test_read_docs_dispatches_html_dirs():
    """A directory of .html files is a first-class corpus input for
    read_docs (S1 dispatch, sources/io.py)."""
    html_dir = ensure_html_corpus("t-htmldisp", seed=5, n_docs=12)
    ds = read_docs(html_dir)
    rows = ds.take_all()
    assert len(rows) == 12
    assert sorted(r["doc_id"] for r in rows) == [
        f"doc-{i:08d}" for i in range(12)]


def test_parse_garbage_yields_empty_doc():
    """html.parser is forgiving by design (real-web HTML is tag soup);
    non-hOCR input parses to an empty document, never a crash."""
    parsed = parse_html(b"just some <b>random</b> markup")
    assert parsed["spans"] == [] and parsed["n_pages"] == 0
