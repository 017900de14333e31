"""Streamed A/B compare: hash-based agreement must replicate the
full-sequence compare (and never hold span corpora on the driver)."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_compare_modes_identical_and_detects_diff(tmp_path):
    from pdf_extraction_ray.fixtures import ensure_corpus
    from pdf_extraction_ray.pipelines.compare import (_span_hash_ds,
                                                      compare_extract_modes)
    from pdf_extraction_ray.pipelines.extract import extract_pipeline
    from pdf_extraction_ray.sources.io import read_docs
    import pdf_extraction_ray.pipelines.compare as compare

    path = ensure_corpus("cmp_t", 3, 120)
    # task vs actor layout must agree doc-for-doc
    orig = compare._corpus_for
    compare._corpus_for = lambda sf: path           # pin corpus
    try:
        out = compare_extract_modes("ignored")
    finally:
        compare._corpus_for = orig
    assert int(out["n_docs"].iloc[0]) == 120
    assert bool(out["identical"].iloc[0])
    assert int(out["mismatched_docs"].iloc[0]) == 0

    # the hash unit actually discriminates: two different docs hash apart
    hs = _span_hash_ds(extract_pipeline(read_docs(path))).to_pandas()
    assert hs["doc_id"].is_unique
    assert hs["h"].nunique() > 1


@pytest.mark.usefixtures("ray_session")
def test_region_provenance_agrees_with_default_path():
    """The provenance-tagged mode must emit exactly the regions the
    absorbed-classifier path emits (same kind/media_ref/offset multiset),
    plus a source tag from the J1 vocabulary, with both tags occurring
    on the fixture corpus."""
    from pdf_extraction_ray.fixtures import ensure_corpus
    import pdf_extraction_ray.pipelines.compare as compare
    from pdf_extraction_ray.pipelines.extract import extract_pipeline
    from pdf_extraction_ray.sources.io import read_docs

    path = ensure_corpus("prov_t", 3, 200)
    orig = compare._corpus_for
    compare._corpus_for = lambda sf: path
    try:
        prov = compare.region_provenance("ignored").to_pandas()
    finally:
        compare._corpus_for = orig
    assert set(prov["source"]) == {"layout_validated", "layout_detected"}
    assert set(prov["kind"]) <= {"table", "figure"}

    # agreement: default extraction's VECTOR region spans == provenance
    # run's rows (image-derived figures carry media:// refs and are not
    # detector-merge output, so they have no provenance row)
    out = extract_pipeline(read_docs(path)).to_pandas()
    regions = []
    for spans in out["spans"]:
        for s in spans:
            if (s["kind"] in ("table", "figure")
                    and s["media_ref"].startswith("vector://")):
                regions.append((s["kind"], s["media_ref"], s["offset"]))
    got = list(map(tuple, prov[["kind", "media_ref", "offset"]].to_numpy()))
    assert sorted(regions) == sorted(got)


def test_png_encoder_roundtrip_structure():
    """Encoder output must be a structurally valid grayscale PNG: magic,
    IHDR dims, IDAT zlib stream that decompresses to H*(W+1) filter-0
    scanlines carrying the original pixels."""
    import struct
    import zlib

    import numpy as np
    from pdf_extraction_ray.functions.png import (decode_png_gray_size,
                                                  draw_rect,
                                                  encode_png_gray)

    img = np.full((32, 48), 255, dtype=np.uint8)
    draw_rect(img, 0.1, 0.1, 0.9, 0.9, 0, thickness=2)
    png = encode_png_gray(img)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert decode_png_gray_size(png) == (48, 32)
    # pull the IDAT chunk and verify the raw scanlines round-trip
    off = 8
    idat = b""
    while off < len(png):
        ln = struct.unpack(">I", png[off:off + 4])[0]
        tag = png[off + 4:off + 8]
        if tag == b"IDAT":
            idat += png[off + 8:off + 8 + ln]
        off += 12 + ln
    raw = zlib.decompress(idat)
    assert len(raw) == 32 * (48 + 1)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(32, 49)
    assert (rows[:, 0] == 0).all()                   # filter byte 0
    np.testing.assert_array_equal(rows[:, 1:], img)


@pytest.mark.usefixtures("ray_session")
def test_debug_overlay_render_emits_valid_pngs():
    from pdf_extraction_ray.fixtures import ensure_corpus
    import pdf_extraction_ray.pipelines.compare as compare
    from pdf_extraction_ray.functions.png import decode_png_gray_size

    path = ensure_corpus("ovl_t", 3, 80)
    orig = compare._corpus_for
    compare._corpus_for = lambda sf: path
    try:
        out = compare.debug_overlay_render("ignored").to_pandas()
    finally:
        compare._corpus_for = orig
    assert len(out) > 0
    assert (out["n_boxes"] > 0).any()
    for png in out["png"].head(5):
        w, h = decode_png_gray_size(bytes(png))
        assert (w, h) == (256, 256)
