"""Real imaging/PDF library probes (round-5 VERDICT item 3).

The sandbox image ships no PIL/Pillow and no PyMuPDF, so every media
decode runs through deterministic stubs. These probes follow the
pattern proven for lance (``sources/io.py``): detect the library at
import, expose a capability flag, and let call sites dispatch — when
the runtime image ever gains the library, the real path lights up with
zero call-site changes, and importorskip tests
(tests/test_real_libs.py) begin exercising it.

Reference analog: advanced_layout_extractor.py:30-50 guards its
Docling/tesseract imports with the same try/except capability flags.
"""

from __future__ import annotations

try:                                    # Pillow: real raster codecs
    from PIL import Image as _PILImage
    HAVE_PIL = True
except ImportError:                     # pragma: no cover - env-dependent
    _PILImage = None
    HAVE_PIL = False

try:                                    # PyMuPDF: battle-tested PDF parse
    import fitz as _fitz
    HAVE_PYMUPDF = True
except ImportError:                     # pragma: no cover - env-dependent
    _fitz = None
    HAVE_PYMUPDF = False


def pil_image():
    """The PIL Image module, or raise with the dispatch contract."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "PIL/Pillow is not available in this environment; "
            "use codec='stub' (the real path lights up automatically "
            "when the image gains Pillow)")
    return _PILImage


def pymupdf():
    """The fitz module, or raise with the dispatch contract."""
    if not HAVE_PYMUPDF:
        raise NotImplementedError(
            "PyMuPDF (fitz) is not available in this environment; "
            "use engine='stdlib' (the real path lights up automatically "
            "when the image gains PyMuPDF)")
    return _fitz


def pil_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Real decode: payload bytes -> (width, height, n_frames,
    energy_x1e3) — the same tuple contract as MediaDecoder._decode_stub
    so the two paths are drop-in interchangeable."""
    import io

    import numpy as np

    im = pil_image().open(io.BytesIO(payload))
    n_frames = int(getattr(im, "n_frames", 1))
    gray = np.asarray(im.convert("L"), dtype=np.float64)
    energy = int(float(gray.mean()) * 1000) if gray.size else 0
    return im.width, im.height, n_frames, energy


def pil_resize(payload: bytes, tw: int, th: int) -> bytes:
    """Real resize: decode, thumbnail to (tw, th), re-encode PNG."""
    import io

    im = pil_image().open(io.BytesIO(payload)).convert("RGB")
    im = im.resize((max(1, tw), max(1, th)))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    return buf.getvalue()
