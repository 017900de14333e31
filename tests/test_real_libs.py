"""Real-library dispatch shims (round-5 VERDICT item 3).

The sandbox has no Pillow / PyMuPDF, so the always-run half of this
module pins the STUB contract: real codecs raise NotImplementedError
naming the missing library, the stub paths are untouched, and the
capability flags read False. The importorskip half lights up
automatically if the runtime image ever gains the libraries —
exercising the real decode/resize/parse paths with zero code change
(the lance pattern, ``sources/io.py``).
"""

import numpy as np
import pytest

import pyarrow as pa

from pdf_extraction_ray.functions import imaging
from pdf_extraction_ray.stages.multimodal import (MediaDecoder,
                                                  MediaResizer,
                                                  synth_payload)


# -- always-run: stub contract under missing libraries ----------------

def test_capability_flags_are_booleans():
    assert isinstance(imaging.HAVE_PIL, bool)
    assert isinstance(imaging.HAVE_PYMUPDF, bool)


@pytest.mark.skipif(imaging.HAVE_PIL, reason="Pillow present")
def test_pil_codec_gated_without_pillow():
    with pytest.raises(NotImplementedError, match="Pillow"):
        MediaDecoder(codec="pil")
    with pytest.raises(NotImplementedError, match="Pillow"):
        MediaResizer(codec="pil")


@pytest.mark.skipif(imaging.HAVE_PYMUPDF, reason="PyMuPDF present")
def test_pymupdf_engine_gated_without_fitz():
    from pdf_extraction_ray.sources.pdf import read_pdf_docs
    with pytest.raises(NotImplementedError, match="PyMuPDF"):
        read_pdf_docs("/tmp/nonexistent", engine="pymupdf")


def test_unknown_engine_rejected():
    from pdf_extraction_ray.sources.pdf import read_pdf_docs
    with pytest.raises(ValueError, match="unknown engine"):
        read_pdf_docs("/tmp/nonexistent", engine="tesseract")


def test_stub_decode_unchanged_by_dispatch():
    """The default stub path must be byte-identical to its pre-shim
    behavior (same deterministic tuple from the same payload)."""
    payload = synth_payload("probe:1", "image")
    dec = MediaDecoder()
    batch = pa.table({"payload": pa.array([payload], pa.binary())})
    out = dec(batch)
    w, h, nf, en = MediaDecoder._decode_stub(payload)
    assert out["width"][0].as_py() == w
    assert out["height"][0].as_py() == h
    assert out["n_frames"][0].as_py() == nf
    assert out["energy_x1e3"][0].as_py() == en


def test_image_xobject_dict_fallback():
    """Without Pillow the XObject decode answers from the declared
    /Width /Height — the seam the real decoder replaces."""
    from pdf_extraction_ray.sources.pdf import (_Stream,
                                                decode_image_xobject)
    xobj = _Stream({"Width": 640, "Height": 480,
                    "Filter": "DCTDecode"}, b"\xff\xd8not-a-real-jpeg")
    if imaging.HAVE_PIL:
        pytest.skip("Pillow present: dict fallback not reachable")
    out = decode_image_xobject(xobj)
    assert out == {"width": 640, "height": 480, "decoded_by": "dict"}


# -- importorskip: light up when the libraries appear -----------------

def test_pil_decode_real_png():
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image
    im = Image.fromarray(
        (np.arange(64 * 48 * 3) % 255).astype("uint8")
        .reshape(48, 64, 3))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    dec = MediaDecoder(codec="pil")
    batch = pa.table({"payload": pa.array([buf.getvalue()], pa.binary())})
    out = dec(batch)
    assert out["width"][0].as_py() == 64
    assert out["height"][0].as_py() == 48
    assert out["n_frames"][0].as_py() == 1

    rs = MediaResizer(max_dim=16, codec="pil")
    rbatch = pa.table({"width": pa.array([64], pa.int32()),
                       "height": pa.array([48], pa.int32()),
                       "payload": pa.array([buf.getvalue()], pa.binary())})
    rout = rs(rbatch)
    assert rout["out_width"][0].as_py() == 16
    back = Image.open(io.BytesIO(rout["resized_payload"][0].as_py()))
    assert back.size == (16, 12)


def test_pymupdf_parse_real_pdf(tmp_path):
    pytest.importorskip("fitz")
    from pdf_extraction_ray.fixtures.generator import generate_docs_table
    from pdf_extraction_ray.sources.pdf import (parse_pdf_pymupdf,
                                                synthesize_pdf)
    row = generate_docs_table(5, 0, 1).to_pylist()[0]
    parsed = parse_pdf_pymupdf(synthesize_pdf(row))
    assert parsed["n_pages"] == row["n_pages"]
    assert len(parsed["spans"]) > 0
    joined = " ".join(s["text"] for s in parsed["spans"])
    ref = " ".join(s["text"] for s in row["spans"]
                   if s["kind"] != "image")
    # PyMuPDF reflows whitespace; token sets must agree
    assert set(ref.split()) <= set(joined.split())
