"""Differential fuzzing: chaotic documents far outside the generator's
distribution must still produce identical spans from the vectorized
pipeline and the serial golden extractor — duplicate offsets, arbitrary
page numbers, zero-line regions, regions on empty pages, extreme fonts,
unicode oddities, all-dropped pages."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from pdf_extraction_ray.fixtures.golden import golden_extract_table
from pdf_extraction_ray.pipelines import extract_pipeline
from pdf_extraction_ray.schema import DOCS_SCHEMA

WEIRD_TEXTS = [
    "", "   ", "\t\n", "## ", "-", "- x", "1.", "1. y", "#notheader",
    "표", "그림 ", "Table", "fig. 9", "예시 텍스트 ​ zero width",
    "🙂 emoji only", "a" * 500, "line\nbreaks\nin\nspan", "  leading spaces",
    "## 한국어 헤더", "* star bullet", "None", "nan",
    "##\xa0nbsp header", "٣. arabic-indic digit list", "1.\xa0nbsp list",
    " em-space lead", "７. fullwidth digit",
]


def chaotic_doc(seed: int, i: int) -> dict:
    rng = np.random.default_rng([seed, i, 999])
    n = int(rng.integers(0, 15))
    spans, fonts, pages, links, bboxes = [], [], [], [], []
    offsets_pool = rng.integers(0, 50, size=max(n, 1))   # collisions likely
    for k in range(n):
        kind = str(rng.choice(["text", "text", "text", "image",
                               "boilerplate"]))
        text = str(rng.choice(WEIRD_TEXTS)) if kind == "text" else ""
        spans.append({
            "kind": kind,
            # null policy: occasional null text/media_ref must behave as ""
            "text": None if rng.random() < 0.05 else text,
            "media_ref": (f"media://x/{k}" if kind == "image"
                          else (None if rng.random() < 0.05 else "")),
            "offset": (None if rng.random() < 0.03
                       else int(offsets_pool[k % len(offsets_pool)])),
        })
        fonts.append(float(rng.choice([0.0, 0.1, 10.0, 12.0, 99.0, 1e-3,
                                       np.nan])))
        pages.append(int(rng.choice([1, 1, 2, 7, 100])))
        links.append(float(rng.choice([0.0, 0.499, 0.5, 0.999, 1.0, np.nan])))
        x0, y0 = rng.uniform(0, 0.9, 2)
        bb = [float(x0), float(y0),
              float(min(1.0, x0 + rng.uniform(0, 0.4))),
              float(min(1.0, y0 + rng.uniform(0, 0.2)))]
        if rng.random() < 0.05:
            bb[int(rng.integers(0, 4))] = float(np.nan)
        bboxes.append(None if rng.random() < 0.03 else bb)
    regions = []
    for ridx in range(int(rng.integers(0, 3))):
        page = int(rng.choice([1, 2, 50]))       # may have no spans at all
        x0, y0 = rng.uniform(0, 0.5, 2)
        bbox = [float(x0), float(y0), float(x0 + rng.uniform(0.1, 0.5)),
                float(y0 + rng.uniform(0.05, 0.45))]
        n_lines = int(rng.integers(0, 14))       # zero-line regions included
        lines = []
        for _ in range(n_lines):
            a = rng.uniform(0, 1, 4)
            lines.append({"x0": float(a[0]), "y0": float(a[1]),
                          "x1": float(a[2]), "y1": float(a[3])})
        regions.append({"page": page, "offset": int(rng.integers(0, 100)),
                        "bbox": bbox, "lines": lines})
    return {"doc_id": f"fuzz-{i:05d}", "spans": spans, "font_size": fonts,
            "page": pages, "link_density": links, "bbox": bboxes,
            "regions": regions, "n_pages": 100}


@pytest.mark.usefixtures("ray_session")
def test_chaotic_docs_match_golden():
    docs = pa.Table.from_pylist([chaotic_doc(7, i) for i in range(300)],
                                schema=DOCS_SCHEMA)
    golden = {r["doc_id"]: r["spans"]
              for r in golden_extract_table(docs).to_pylist()}
    out = extract_pipeline(rd.from_arrow(docs), batch_size=37).take_all()
    assert len(out) == 300
    for r in out:
        assert r["spans"] == golden[r["doc_id"]], r["doc_id"]
