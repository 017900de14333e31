"""PDF 1.5+ reader/writer features (round-4 VERDICT item #2): cross-
reference streams (binary W-width entries behind FlateDecode + PNG Up
predictor), /ObjStm object streams (type-2 xref entries), /Prev
incremental-update chains, and composite Type0 fonts whose text only a
/ToUnicode CMap decodes. The reference leans on PyMuPDF for all of this
(advanced_layout_extractor.py:282-341); here both halves are stdlib.
"""

import numpy as np
import pytest

import pyarrow as pa

from pdf_extraction_ray.fixtures import golden_extract_table
from pdf_extraction_ray.fixtures.generator import generate_docs_table
from pdf_extraction_ray.pipelines import extract_pipeline
from pdf_extraction_ray.schema import DOCS_SCHEMA
from pdf_extraction_ray.sources.pdf import (
    _parse_tounicode, _png_unpredict, ensure_pdf_corpus, parse_pdf,
    read_pdf_docs, synthesize_pdf,
)


def f32(x):
    return np.float32(x).item()


def canon(row):
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


MODES = [
    {"xref_stream": True},
    {"object_streams": True},                      # implies xref_stream
    {"cid_text": True},
    {"object_streams": True, "cid_text": True},    # full modern layout
]


@pytest.mark.parametrize("modes", MODES,
                         ids=lambda m: "+".join(sorted(m)))
@pytest.mark.parametrize("compress", [True, False])
def test_modern_roundtrip_exact(modes, compress):
    """Generator corpus (empty docs, permuted spans, images, regions,
    Korean text, pathological giants) round-trips bit-exactly through
    every modern writer layout."""
    rows = generate_docs_table(7, 0, 80, pathological_frac=0.02) \
        .to_pylist()
    for row in rows:
        parsed = parse_pdf(synthesize_pdf(row, compress=compress, **modes))
        assert canon(parsed) == canon(row), row["doc_id"]
        assert parsed["n_pages"] == max(row["n_pages"], 1)


def test_cid_text_is_unreadable_without_cmap():
    """The CID mode must actually exercise the CMap: raw content bytes
    carry no literal text, only 2-byte CID hex strings."""
    row = pa.Table.from_pylist([{
        "doc_id": "cid-1",
        "spans": [{"kind": "text", "text": "secret phrase",
                   "media_ref": "", "offset": 0}],
        "font_size": [10.0], "page": [1], "link_density": [0.0],
        "bbox": [[0.1, 0.1, 0.9, 0.2]], "regions": [], "n_pages": 1}],
        schema=DOCS_SCHEMA).to_pylist()[0]
    data = synthesize_pdf(row, compress=False, cid_text=True)
    assert b"secret" not in data          # only CIDs in the stream
    assert b"Identity-H" in data and b"ToUnicode" in data
    parsed = parse_pdf(data)
    assert parsed["spans"][0]["text"] == "secret phrase"


def test_cid_text_non_bmp_surrogates():
    """Astral-plane characters serialize as UTF-16 surrogate pairs in
    bfchar targets and decode back intact."""
    txt = "math 𝒜𝒵 emoji 🎉 mix한글"
    row = pa.Table.from_pylist([{
        "doc_id": "cid-astral",
        "spans": [{"kind": "text", "text": txt, "media_ref": "",
                   "offset": 0}],
        "font_size": [10.0], "page": [1], "link_density": [0.0],
        "bbox": [[0.1, 0.1, 0.9, 0.2]], "regions": [], "n_pages": 1}],
        schema=DOCS_SCHEMA).to_pylist()[0]
    parsed = parse_pdf(synthesize_pdf(row, cid_text=True))
    assert parsed["spans"][0]["text"] == txt


def test_parse_tounicode_bfrange_and_bfchar():
    cm = (b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
          b"2 beginbfrange\n<0001> <0003> <0041>\n"
          b"<0010> <0011> <AC00>\nendbfrange\n"
          b"1 beginbfchar\n<0020> <D83C\xdf89>"  # raw byte noise ignored
          b"\nendbfchar\n"
          b"1 beginbfchar\n<0021> <D83CDF89>\nendbfchar\n")
    m = _parse_tounicode(cm)
    assert m[1] == "A" and m[2] == "B" and m[3] == "C"
    assert m[0x10] == "가" and m[0x11] == "각"
    assert m[0x21] == "🎉"                 # surrogate pair via bfchar


def test_png_unpredict_all_filters():
    """Reverse every PNG filter type against a forward implementation."""
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, size=(6, 7), dtype=np.uint8)
    # forward-filter each row with its type = row index % 5
    enc = bytearray()
    prev = np.zeros(7, dtype=np.int32)
    for r_i, row in enumerate(raw.astype(np.int32)):
        ft = r_i % 5
        enc.append(ft)
        out = row.copy()
        for i in range(7):
            a = row[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if ft == 1:
                out[i] = row[i] - a
            elif ft == 2:
                out[i] = row[i] - b
            elif ft == 3:
                out[i] = row[i] - (a + b) // 2
            elif ft == 4:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa_ <= pb and pa_ <= pc_ else (
                    b if pb <= pc_ else c)
                out[i] = row[i] - pr
        enc += (out % 256).astype(np.uint8).tobytes()
        prev = row
    dec = _png_unpredict(bytes(enc), columns=7)
    assert dec == raw.tobytes()


def test_incremental_update_prev_chain():
    """A classic-table incremental update appended to an xref-STREAM
    base: the newest section's object shadows the old one and /Prev
    walks back for everything else — the cross-type chain real
    incrementally-saved files contain."""
    row = generate_docs_table(11, 0, 1).to_pylist()[0]
    base = synthesize_pdf(row, xref_stream=True, object_streams=True)
    old_xref = int(base[base.rfind(b"startxref") + 9:
                        base.rfind(b"%%EOF")].strip())
    upd = bytearray(base)
    off3 = len(upd)
    upd += b"3 0 obj\n<< /Title (doc-updated) /Producer (t) >>\nendobj\n"
    xat = len(upd)
    upd += (b"xref\n3 1\n" + f"{off3:010d} 00000 n \n".encode("ascii")
            + f"trailer\n<< /Size 99 /Root 1 0 R /Info 3 0 R "
              f"/Prev {old_xref} >>\nstartxref\n{xat}\n%%EOF\n"
              .encode("ascii"))
    parsed = parse_pdf(bytes(upd))
    assert parsed["doc_id"] == "doc-updated"         # newest wins
    assert canon(parsed)[1:] == canon(row)[1:]       # rest via /Prev


def test_incremental_update_free_entry_shadows():
    """An incremental update that FREES an object must shadow the older
    definition (spec 7.5.6): the freed /Info object resolves to null,
    not the resurrected old dictionary, across both classic-table and
    xref-stream bases."""
    row = generate_docs_table(12, 0, 1).to_pylist()[0]
    for kw in ({}, {"xref_stream": True, "object_streams": True}):
        base = synthesize_pdf(row, **kw)
        old_xref = int(base[base.rfind(b"startxref") + 9:
                            base.rfind(b"%%EOF")].strip())
        upd = bytearray(base)
        xat = len(upd)
        upd += (b"xref\n3 1\n" + b"0000000000 00001 f \n"
                + f"trailer\n<< /Size 99 /Root 1 0 R /Info 3 0 R "
                  f"/Prev {old_xref} >>\nstartxref\n{xat}\n%%EOF\n"
                  .encode("ascii"))
        parsed = parse_pdf(bytes(upd))
        assert parsed["doc_id"] == ""                # not resurrected
        assert canon(parsed)[1:] == canon(row)[1:]   # content intact


@pytest.mark.usefixtures("ray_session")
def test_modern_pdf_golden_output_equality():
    """North rule through the modern layout: extraction over an
    objstm+xref-stream+CID corpus is span-for-span identical to the
    golden extractor on the same generator rows."""
    n = 60
    pdf_dir = ensure_pdf_corpus("t-pdf15gold", seed=31, n_docs=n,
                                object_streams=True, cid_text=True)
    docs = generate_docs_table(31, 0, n)
    out = extract_pipeline(read_pdf_docs(pdf_dir)).take_all()
    golden = {r["doc_id"]: r["spans"]
              for r in golden_extract_table(docs).to_pylist()}

    def seq(spans):
        return [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in spans]

    assert len(out) == n
    for row in out:
        assert seq(row["spans"]) == seq(golden[row["doc_id"]]), \
            row["doc_id"]


FILTERS = ["ASCIIHexDecode", "ASCII85Decode", "RunLengthDecode",
           "LZWDecode"]


@pytest.mark.parametrize("filt", FILTERS)
def test_stream_filter_roundtrip(filt):
    """Each classic stream filter round-trips the generator corpus
    exactly, alone and chained behind FlateDecode (decode order =
    /Filter array order)."""
    rows = generate_docs_table(7, 0, 40, pathological_frac=0.02) \
        .to_pylist()
    for compress in (False, True):
        for row in rows:
            parsed = parse_pdf(synthesize_pdf(
                row, compress=compress, stream_filter=filt))
            assert canon(parsed) == canon(row), (filt, row["doc_id"])


def test_stream_filter_with_modern_layout():
    rows = generate_docs_table(9, 0, 15).to_pylist()
    for row in rows:
        parsed = parse_pdf(synthesize_pdf(
            row, object_streams=True, cid_text=True,
            stream_filter="ASCII85Decode"))
        assert canon(parsed) == canon(row)


def test_codec_kernels_roundtrip_boundaries():
    """LZW must survive the 9->10->11->12-bit width boundaries AND the
    12-bit table-full clear/reset; RLE/A85/AHx on the same vectors."""
    from pdf_extraction_ray.sources.pdf import (
        _a85_decode, _a85_encode, _ahx_decode, _ahx_encode,
        _lzw_decode, _lzw_encode, _rle_decode, _rle_encode)
    rng = np.random.default_rng(7)
    cases = [b"", b"a", b"ab" * 5000, bytes(range(256)) * 4,
             rng.integers(0, 256, size=20000, dtype=np.uint8).tobytes(),
             rng.integers(0, 4, size=60000, dtype=np.uint8).tobytes(),
             rng.integers(0, 256, size=300000,
                          dtype=np.uint8).tobytes()]
    for c in cases:
        assert _lzw_decode(_lzw_encode(c)) == c
        assert _rle_decode(_rle_encode(c)) == c
        assert _a85_decode(_a85_encode(c)) == c
        assert _ahx_decode(_ahx_encode(c)) == c
