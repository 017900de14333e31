"""Raw-HTML ingestion: the web half of the north rule's "HTML
boilerplate strip / DOM heuristics" contract, rebuilt for Ray.

The reference family's web-extraction analogs (readability/trafilatura
-style) consume HTML *files* and recover main content from DOM
structure: which elements are navigation/footer boilerplate, how much
of a node's text is anchor text (link density), and the layout
geometry OCR/converter toolchains attach to markup. This module closes
that contract with pure stdlib (html.parser): an **hOCR-flavored
writer** (`synthesize_html`) and a real DOM **reader** (`parse_html`)
that rebuilds DOCS_SCHEMA rows from the markup conventions real
toolchains emit.

Serialization conventions (all standard markup; documented because the
parser is the other half of the contract):

- Pages are ``<div class="ocr_page" title="bbox 0 0 512 1024;
  ppageno N">`` — the hOCR page convention (Tesseract's HTML output
  format; pdf2htmlEX emits the same paginated-div shape). The page box
  is 512x1024 px — powers of two, so normalized [0,1] coordinates
  round-trip *bit-exactly* through pixel coords (multiply/divide by
  2^k is exact in float64; hOCR is y-down like our normalized
  convention, so no flip at all).
- Every span is an hOCR element: ``<p class="ocr_line" id="w_<offset>"
  title="bbox x0 y0 x1 y1; x_size F">text</p>``. ``x_size`` is
  Tesseract's float font-size property; the id carries the logical
  reading-order slot (our span ``offset``) the way hOCR ids carry
  word/line identity. Boilerplate spans use the ``<footer>`` element —
  the DOM-semantic way pagination/footer content is marked, and
  exactly what a trafilatura-style extractor keys on.
- Link density is encoded the way a DOM extractor *observes* it: the
  span's text is wrapped in a real ``<a>`` whose own hOCR bbox covers
  ``link_density`` of the span's width; the parser recovers
  ``L = anchor_width / span_width`` (the geometric twin of the PDF
  path's ``/Link`` annotation rect — exact after the float32 schema
  cast for all practical values; a zero-width span cannot encode a
  density and parses as 0).
- Images are ``<img class="ocr_image" title="bbox ...; x_size F"
  src="<media_ref>">`` — the asset reference rides ``src``, the
  native HTML sidecar.
- Vector regions are inline ``<svg class="ocr_region" id="r_<offset>"
  title="bbox ...">`` holding their line set as SVG ``<line>``
  elements in page-pixel coords — how a chart/table renders on the
  real web.

Canonicalization: markup groups spans by page in document order, so a
row whose span LIST order was permuted parses back page-grouped.
Extraction output is invariant (reassembly orders by ``offset`` — O1),
and the round-trip tests compare after an offset sort. An empty
document (``n_pages == 0``) still writes one page div, so it parses
back with ``n_pages == 1`` — the only field the round trip widens
(same widening as the PDF path).
"""

from __future__ import annotations

import html as _html
import os
from html.parser import HTMLParser

import pyarrow as pa

from ..schema import DOCS_SCHEMA

PAGE_W = 512.0          # powers of two: exact normalized <-> pixel coords
PAGE_H = 1024.0


def _num(v) -> str:
    """Shortest exact decimal (repr round-trips float64 exactly)."""
    f = float(v)
    if f == int(f) and abs(f) < 2**53:
        return str(int(f))
    return repr(f)


def _bbox_px(bbox) -> tuple[float, float, float, float]:
    x0, y0, x1, y1 = (float(v) for v in bbox)
    return (x0 * PAGE_W, y0 * PAGE_H, x1 * PAGE_W, y1 * PAGE_H)


def _title(bbox, font=None) -> str:
    px = _bbox_px(bbox)
    t = "bbox " + " ".join(_num(v) for v in px)
    if font is not None:
        t += f"; x_size {_num(font)}"
    return t


def _attr(s: str) -> str:
    return _html.escape(str(s), quote=True)


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _span_markup(span: dict, font: float, link: float, bbox) -> str:
    kind = span.get("kind") or ""
    text = span.get("text") or ""
    off = int(span.get("offset") or 0)
    title = _title(bbox, font)
    if kind == "image":
        inner = (f'<img class="ocr_image" id="w_{off}" '
                 f'title="{_attr(title)}" '
                 f'src="{_attr(span.get("media_ref") or "")}" alt="">')
        tag = None
    else:
        # unknown kinds collapse to text (the markup has 3 vocabularies:
        # content, footer-boilerplate, image) — same widening as PDF tags
        tag = "footer" if kind == "boilerplate" else "p"
        inner = _html.escape(text, quote=False)
    x0, y0, x1, y1 = _bbox_px(bbox)
    if float(link or 0.0) > 0.0 and x1 - x0 > 0.0:
        a_t = "bbox " + " ".join(_num(v) for v in
                                 (x0, y0, x0 + float(link) * (x1 - x0), y1))
        inner = f'<a href="#" title="{_attr(a_t)}">{inner}</a>'
    if tag is None:
        return inner
    return (f'<{tag} class="ocr_line" id="w_{off}" '
            f'title="{_attr(title)}">{inner}</{tag}>')


def _region_markup(region: dict) -> str:
    off = int(region.get("offset") or 0)
    lines = []
    for ln in region.get("lines") or []:
        lines.append(
            f'<line x1="{_num(float(ln["x0"]) * PAGE_W)}" '
            f'y1="{_num(float(ln["y0"]) * PAGE_H)}" '
            f'x2="{_num(float(ln["x1"]) * PAGE_W)}" '
            f'y2="{_num(float(ln["y1"]) * PAGE_H)}"/>')
    return (f'<svg class="ocr_region" id="r_{off}" '
            f'title="{_attr(_title(region["bbox"]))}" '
            f'viewBox="0 0 {int(PAGE_W)} {int(PAGE_H)}">'
            + "".join(lines) + "</svg>")


def synthesize_html(row: dict) -> bytes:
    """DOCS_SCHEMA row -> one hOCR-flavored HTML document (bytes)."""
    spans = row.get("spans") or []
    pages = row.get("page") or []
    fonts = row.get("font_size") or []
    links = row.get("link_density") or []
    bboxes = row.get("bbox") or []
    regions = row.get("regions") or []

    page_nos = {int(p) for p in pages} | {int(r["page"]) for r in regions}
    last = max(page_nos | {int(row.get("n_pages") or 0), 1})

    parts = ['<!DOCTYPE html>', '<html lang="en"><head>',
             '<meta charset="utf-8">',
             f'<title>{_html.escape(str(row["doc_id"]), quote=False)}'
             '</title>',
             '</head><body class="ocr_doc">']
    for p in range(1, last + 1):
        parts.append(
            f'<div class="ocr_page" id="page_{p}" '
            f'title="bbox 0 0 {int(PAGE_W)} {int(PAGE_H)}; '
            f'ppageno {p - 1}">')
        for j, s in enumerate(spans):
            if int(pages[j]) == p:
                parts.append(_span_markup(s, fonts[j], links[j], bboxes[j]))
        for r in regions:
            if int(r["page"]) == p:
                parts.append(_region_markup(r))
        parts.append('</div>')
    parts.append('</body></html>')
    return "\n".join(parts).encode("utf-8")


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _parse_title(t: str) -> dict:
    """hOCR title attribute: semicolon-separated ``name v1 v2 ...``."""
    out = {}
    for part in (t or "").split(";"):
        toks = part.split()
        if toks:
            out[toks[0]] = [float(v) for v in toks[1:]]
    return out


class _DocParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.doc_id = ""
        self._in_title = False
        self.n_pages = 0
        self.cur_page = 1
        self.spans: list[dict] = []
        self.fonts: list[float] = []
        self.pages: list[int] = []
        self.links: list[float] = []
        self.bboxes: list[list[float]] = []
        self.regions: list[dict] = []
        self._span = None          # open span state
        self._region = None        # open region state

    # -- helpers ----------------------------------------------------------
    @staticmethod
    def _norm_bbox(px: list[float]) -> list[float]:
        return [px[0] / PAGE_W, px[1] / PAGE_H,
                px[2] / PAGE_W, px[3] / PAGE_H]

    def _finish_span(self):
        s = self._span
        self._span = None
        if s is None:
            return
        bbox = s["bbox_px"]
        link = 0.0
        if s["a_bbox"] is not None and bbox[2] - bbox[0] > 0.0:
            link = (s["a_bbox"][2] - s["a_bbox"][0]) / (bbox[2] - bbox[0])
        self.spans.append({"kind": s["kind"], "text": "".join(s["text"]),
                           "media_ref": s["media_ref"],
                           "offset": s["offset"]})
        self.fonts.append(s["font"])
        self.pages.append(self.cur_page)
        self.links.append(link)
        self.bboxes.append(self._norm_bbox(bbox))

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        cls = (a.get("class") or "").split()
        if tag == "title":
            self._in_title = True
        elif tag == "div" and "ocr_page" in cls:
            t = _parse_title(a.get("title", ""))
            self.cur_page = int(t.get("ppageno", [self.n_pages])[0]) + 1
            self.n_pages += 1
        elif tag in ("p", "footer") and "ocr_line" in cls:
            t = _parse_title(a.get("title", ""))
            self._span = {
                "kind": "boilerplate" if tag == "footer" else "text",
                "text": [], "media_ref": "",
                "offset": int((a.get("id") or "w_0").split("_", 1)[1]),
                "font": t.get("x_size", [0.0])[0],
                "bbox_px": t.get("bbox", [0.0, 0.0, 0.0, 0.0]),
                "a_bbox": None}
        elif tag == "img" and "ocr_image" in cls:
            t = _parse_title(a.get("title", ""))
            px = t.get("bbox", [0.0, 0.0, 0.0, 0.0])
            link = 0.0
            if self._span is not None and self._span["a_bbox"] is not None \
                    and px[2] - px[0] > 0.0:
                ab = self._span["a_bbox"]
                link = (ab[2] - ab[0]) / (px[2] - px[0])
            self.spans.append({"kind": "image", "text": "",
                               "media_ref": a.get("src") or "",
                               "offset": int((a.get("id") or "w_0")
                                             .split("_", 1)[1])})
            self.fonts.append(t.get("x_size", [0.0])[0])
            self.pages.append(self.cur_page)
            self.links.append(link)
            self.bboxes.append(self._norm_bbox(px))
        elif tag == "a" and self._span is not None:
            self._span["a_bbox"] = _parse_title(
                a.get("title", "")).get("bbox")
        elif tag == "a":
            # an anchored image: remember the rect for the img child
            self._span = {"kind": None, "a_bbox": _parse_title(
                a.get("title", "")).get("bbox")}
        elif tag == "svg" and "ocr_region" in cls:
            t = _parse_title(a.get("title", ""))
            self._region = {
                "page": self.cur_page,
                "offset": int((a.get("id") or "r_0").split("_", 1)[1]),
                "bbox": self._norm_bbox(
                    t.get("bbox", [0.0, 0.0, 0.0, 0.0])),
                "lines": []}
        elif tag == "line" and self._region is not None:
            self._region["lines"].append(
                {"x0": float(a.get("x1", 0)) / PAGE_W,
                 "y0": float(a.get("y1", 0)) / PAGE_H,
                 "x1": float(a.get("x2", 0)) / PAGE_W,
                 "y1": float(a.get("y2", 0)) / PAGE_H})

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
        elif tag in ("p", "footer") and self._span is not None \
                and self._span.get("kind") is not None:
            self._finish_span()
        elif tag == "a" and self._span is not None \
                and self._span.get("kind") is None:
            self._span = None      # anchored-image wrapper closed
        elif tag == "svg" and self._region is not None:
            self.regions.append(self._region)
            self._region = None

    def handle_data(self, data):
        if self._in_title:
            self.doc_id += data
        elif self._span is not None and self._span.get("kind") is not None:
            self._span["text"].append(data)


def parse_html(data: bytes) -> dict:
    """One HTML document (bytes) -> DOCS_SCHEMA row dict."""
    p = _DocParser()
    p.feed(data.decode("utf-8"))
    p.close()
    return {"doc_id": p.doc_id, "spans": p.spans, "font_size": p.fonts,
            "page": p.pages, "link_density": p.links, "bbox": p.bboxes,
            "regions": p.regions, "n_pages": p.n_pages}


# ---------------------------------------------------------------------------
# Ray integration (mirrors sources/pdf.py)
# ---------------------------------------------------------------------------


def parse_html_batch(batch: pa.Table) -> pa.Table:
    """``read_binary_files`` batch -> DOCS_SCHEMA batch. Per-document
    python is inherent to markup parsing (real DOM extractors are too);
    throughput comes from file-level parallelism."""
    rows = [parse_html(b) for b in batch.column("bytes").to_pylist()]
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def read_html_docs(path: str, *, batch_size: int = 64,
                   **kwargs) -> "ray.data.Dataset":
    """Directory (or list) of ``.html`` files -> interleaved-docs Dataset.

    ``read_binary_files`` shards at the file level, so a 10^12-document
    corpus parallelizes by its natural unit; the parse stage is an
    elastic task pool (stateless — html.parser has no model to load)."""
    import ray.data

    ds = ray.data.read_binary_files(path, file_extensions=["html"],
                                    **kwargs)
    return ds.map_batches(parse_html_batch, batch_format="pyarrow",
                          batch_size=batch_size)


def write_html_corpus(table: pa.Table, out_dir: str) -> int:
    """DOCS_SCHEMA table -> one ``.html`` file per document."""
    os.makedirs(out_dir, exist_ok=True)
    rows = table.to_pylist()
    for row in rows:
        p = os.path.join(out_dir, f"{row['doc_id']}.html")
        tmp = p + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(synthesize_html(row))
        os.replace(tmp, p)
    return len(rows)


HTMLGEN_VERSION = 1


def ensure_html_corpus(name: str, seed: int, n_docs: int,
                       pathological_frac: float = 0.01,
                       root: str = "/tmp/pdfxr_fixtures") -> str:
    """Cached HTML mirror of ``fixtures.ensure_corpus`` (same generator,
    same (seed, index) determinism): a directory of ``doc-*.html``."""
    from ..fixtures.generator import generate_docs_table

    path = os.path.join(
        root, f"{name}-html-v{HTMLGEN_VERSION}-s{seed}-n{n_docs}"
              f"-p{pathological_frac}")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    for start in range(0, n_docs, 1000):
        tbl = generate_docs_table(seed, start, min(1000, n_docs - start),
                                  pathological_frac)
        write_html_corpus(tbl, path)
    with open(done, "w") as f:
        f.write(f"{seed} {n_docs} {pathological_frac}\n")
    return path
