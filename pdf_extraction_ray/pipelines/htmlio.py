"""HTML-ingestion query: drive the raw-HTML entry point end-to-end over
the driver's ``documents`` table and verify it against a DuckDB oracle.

Flow (the web half of the north rule — HTML boilerplate strip / DOM
heuristics over real markup files):

    documents.parquet
      -> the SAME deterministic paragraph render as the PDF slice
         (pdfio._render_rows: 120-char chunks, every 11th a markdown
         header, every 7th a list item)
      -> ``synthesize_html`` one real hOCR-flavored HTML file per
         document (parallel map_batches; cached per sf_dir under /tmp)
      -> ``read_html_docs`` (read_binary_files + html.parser tasks)
      -> the flagship extract pipeline
      -> per-document span/class counts

The oracle is byte-identical to the PDF slice's (``PDF_INGEST_SQL``):
both parsers must land on the SAME answer from the same text, so the
driver's rows+schema+hash gate covers the ENTIRE markup round trip —
writer, entity escaping, hOCR title parsing, anchor link-density
recovery, and stage-A classification.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pyarrow as pa

import ray.data

from ..sources.html import read_html_docs, synthesize_html
from .extract import extract_pipeline
from .pdfio import PDF_INGEST_SQL, _render_rows

_RENDER_VERSION = 1

HTML_INGEST_SQL = PDF_INGEST_SQL


def ensure_html_render(sf_dir: str,
                       root: str = "/tmp/pdfxr_fixtures") -> str:
    """Render (once, cached) ``{sf_dir}/documents.parquet`` into a
    sharded directory of real HTML files (parallel Ray tasks; atomic
    tmp+rename writes)."""
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    path = os.path.join(root, f"htmlingest-v{_RENDER_VERSION}-{key}")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        n = 0
        for row in _render_rows(batch):
            sub = os.path.join(path, f"shard={int(row['doc_id']) % 16:02d}")
            os.makedirs(sub, exist_ok=True)
            p = os.path.join(sub, f"{int(row['doc_id']):012d}.html")
            tmp = p + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(synthesize_html(row))
            os.replace(tmp, p)
            n += 1
        return pa.Table.from_pydict({"n": [n]})

    (ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
     .map_batches(write_batch, batch_format="pyarrow", batch_size=256)
     .sum("n"))
    with open(done, "w") as f:
        f.write(sf_dir + "\n")
    return path


def html_ingest_extract(sf_dir: str) -> pd.DataFrame:
    """documents -> HTML files -> DOM parse -> extract -> class counts."""
    from .pdfio import _ingest_counts
    html_dir = ensure_html_render(sf_dir)
    return _ingest_counts(extract_pipeline(read_html_docs(html_dir)))


HTMLIO_QUERIES: dict[str, tuple] = {
    "html_ingest_extract": (html_ingest_extract, HTML_INGEST_SQL),
}
