"""WARC ingestion: multi-document web-archive container files.

The web-scale twin of ``sources/html.py``: real crawl corpora
(CommonCrawl and every ISO-28500 archive) arrive not as one HTML file
per document but as **WARC containers** — each file holds thousands of
records (warcinfo, request, response, metadata), each response wrapping
one HTTP message whose body is the HTML payload. This module closes
that shape with pure stdlib:

- ``write_warc_file`` serializes DOCS_SCHEMA rows as a spec-shaped
  WARC/1.0 file: a leading ``warcinfo`` record, then per document a
  ``request`` record and a ``response`` record whose HTTP body is the
  hOCR-flavored markup from ``sources.html.synthesize_html`` — the
  record mix real crawlers emit, so the reader's type/status filtering
  is genuinely exercised.
- ``.warc.gz`` support uses the **member-per-record** convention
  (every record its own gzip member, members concatenated) — the
  CommonCrawl layout that makes record-level random access possible;
  ``gzip.decompress`` inflates all members in order.
- ``parse_warc`` scans records by ``Content-Length`` (never by
  delimiter search inside payloads), keeps ``WARC-Type: response``
  with HTTP status 200 + an HTML content type, and delegates body
  parsing to ``sources.html.parse_html`` — one markup parser, two
  container formats.
- ``read_warc_docs`` shards at the FILE level (``read_binary_files``)
  and parses one container per task (``batch_size=1``): at crawl scale
  a single WARC is ~1 GB / tens of thousands of documents, so the file
  is the natural unit of parallelism and a task never holds two.

Reference analog: the reference consumes loose local files
(``advanced_layout_extractor.py:203,282-297``); the container layout
here is what the same pipeline needs at 10^12-document scale, where a
filesystem of single-document files is operationally impossible.
"""

from __future__ import annotations

import gzip
import os

import pyarrow as pa

from ..schema import DOCS_SCHEMA
from .html import parse_html, synthesize_html

_CRLF = b"\r\n"
_SOFTWARE = b"pdf-extraction-ray warc writer"


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _record(warc_type: str, headers: list[tuple[str, str]],
            payload: bytes) -> bytes:
    """One WARC/1.0 record: header block, blank line, Content-Length
    bytes of payload, blank-line record separator."""
    lines = [b"WARC/1.0",
             b"WARC-Type: " + warc_type.encode("ascii")]
    for k, v in headers:
        lines.append(f"{k}: {v}".encode("utf-8"))
    lines.append(b"Content-Length: " + str(len(payload)).encode("ascii"))
    return (_CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF)


def _http_response(body: bytes, status: str = "200 OK",
                   ctype: str = "text/html; charset=utf-8") -> bytes:
    return (f"HTTP/1.1 {status}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("ascii") + body


def doc_uri(doc_id: str) -> str:
    return f"http://corpus.local/{doc_id}.html"


def write_warc_file(rows: list[dict], path: str, *,
                    compress: bool | None = None) -> int:
    """DOCS_SCHEMA row dicts -> one WARC file (``.warc`` plain or
    ``.warc.gz`` member-per-record; inferred from the path when
    ``compress`` is None). Atomic tmp+rename write. Returns the number
    of response records written."""
    if compress is None:
        compress = path.endswith(".gz")

    def pack(rec: bytes) -> bytes:
        # mtime=0 keeps the member bytes deterministic across runs
        return gzip.compress(rec, mtime=0) if compress else rec

    # WARC-Date is a required header; the corpus is synthetic and
    # deterministic, so a fixed instant is the honest value.
    date = ("WARC-Date", "2026-01-01T00:00:00Z")
    parts = [pack(_record("warcinfo",
                          [date, ("WARC-Filename", os.path.basename(path)),
                           ("Content-Type", "application/warc-fields")],
                          b"software: " + _SOFTWARE + _CRLF))]
    n = 0
    for row in rows:
        uri = doc_uri(str(row["doc_id"]))
        body = synthesize_html(row)
        req = (f"GET /{row['doc_id']}.html HTTP/1.1\r\n"
               f"Host: corpus.local\r\n\r\n").encode("ascii")
        parts.append(pack(_record(
            "request",
            [date, ("WARC-Target-URI", uri),
             ("Content-Type", "application/http; msgtype=request")], req)))
        parts.append(pack(_record(
            "response",
            [date, ("WARC-Target-URI", uri),
             ("WARC-Record-ID", f"<urn:corpus:{row['doc_id']}>"),
             ("Content-Type", "application/http; msgtype=response")],
            _http_response(body))))
        n += 1
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(b"".join(parts))
    os.replace(tmp, path)
    return n


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def iter_warc_records(data: bytes):
    """Yield ``(headers: dict[lowercased name -> value], payload bytes)``
    for every record in one (already-inflated) WARC byte stream.
    Payloads are sliced by ``Content-Length`` — the only correct way,
    since an HTML body may contain anything, including record-like
    text."""
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        end = data.find(_CRLF + _CRLF, pos)
        if end < 0:
            return                     # truncated trailer: stop cleanly
        block = data[pos:end].decode("utf-8", "replace").split("\r\n")
        if not block or not block[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at byte {pos}")
        headers: dict[str, str] = {}
        for line in block[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body_at = end + 4
        yield headers, data[body_at:body_at + length]
        pos = body_at + length


def _http_body(payload: bytes) -> bytes | None:
    """HTTP response message -> HTML body, or None when the status is
    not 200 or the entity is not HTML (real crawls carry 404s, redirects
    and binary assets; an extraction pipeline must drop them here)."""
    head_end = payload.find(_CRLF + _CRLF)
    if head_end < 0:
        return None
    head = payload[:head_end].decode("utf-8", "replace").split("\r\n")
    status = head[0].split()
    if len(status) < 2 or status[1] != "200":
        return None
    for line in head[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type" \
                and "text/html" not in v.lower():
            return None
    return payload[head_end + 4:]


def parse_warc(data: bytes) -> list[dict]:
    """One WARC container (plain or gzip member-concatenated) ->
    DOCS_SCHEMA row dicts, in record order."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)   # inflates ALL concatenated members
    rows = []
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        body = _http_body(payload)
        if body is not None:
            rows.append(parse_html(body))
    return rows


def parse_warc_batch(batch: pa.Table) -> pa.Table:
    rows: list[dict] = []
    for data in batch.column("bytes").to_pylist():
        rows.extend(parse_warc(data))
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def read_warc_docs(path: str, **kwargs) -> "ray.data.Dataset":
    """Directory (or list) of ``.warc`` / ``.warc.gz`` containers ->
    interleaved-docs Dataset. One parse task per container file: the
    file is the parallelism unit (CommonCrawl ships ~1 GB WARCs, so a
    crawl segment is tens of thousands of independent tasks), and
    ``batch_size=1`` bounds per-task memory to one container."""
    import ray.data

    ds = ray.data.read_binary_files(path, file_extensions=["warc", "gz"],
                                    **kwargs)
    return ds.map_batches(parse_warc_batch, batch_format="pyarrow",
                          batch_size=1)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

WARCGEN_VERSION = 1


def ensure_warc_corpus(name: str, seed: int, n_docs: int,
                       docs_per_file: int = 50,
                       pathological_frac: float = 0.01,
                       compress: bool = True,
                       root: str = "/tmp/pdfxr_fixtures") -> str:
    """Cached WARC mirror of ``fixtures.ensure_corpus`` (same generator,
    same (seed, index) determinism): a directory of multi-document
    ``part-*.warc[.gz]`` containers."""
    from ..fixtures.generator import generate_docs_table

    ext = "warc.gz" if compress else "warc"
    path = os.path.join(
        root, f"{name}-warc-v{WARCGEN_VERSION}-s{seed}-n{n_docs}"
              f"-d{docs_per_file}-p{pathological_frac}-{ext}")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    for i, start in enumerate(range(0, n_docs, docs_per_file)):
        tbl = generate_docs_table(seed, start,
                                  min(docs_per_file, n_docs - start),
                                  pathological_frac)
        write_warc_file(tbl.to_pylist(),
                        os.path.join(path, f"part-{i:05d}.{ext}"),
                        compress=compress)
    with open(done, "w") as f:
        f.write(f"{seed} {n_docs} {docs_per_file} {pathological_frac}\n")
    return path
