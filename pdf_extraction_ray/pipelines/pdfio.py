"""PDF-ingestion queries: drive the raw-PDF entry point end-to-end over
the driver's ``documents`` table and verify it against a DuckDB oracle.

Flow (the "documents-in" contract the reference actually has —
``advanced_layout_extractor.py:203,282-341`` consumes PDF *files*):

    documents.parquet
      -> deterministic paragraph render (120-char chunks, every 11th a
         markdown header, every 7th a list item)
      -> ``synthesize_pdf`` one real PDF file per document (parallel
         map_batches; cached per sf_dir under /tmp)
      -> ``read_pdf_docs`` (read_binary_files + parse tasks)
      -> the flagship extract pipeline
      -> per-document span/class counts

The oracle recomputes the same counts from the raw text with pure SQL, so
the driver's rows+schema+hash gate covers the ENTIRE binary round trip:
PDF writer, xref/object/content-stream parser, FlateDecode, string
escaping, and stage-A classification.
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .corpus import _typed_empty_on_no_docs

from ..schema import DOCS_SCHEMA
from ..sources.pdf import read_pdf_docs, synthesize_pdf
from .extract import extract_pipeline

_CHUNK = 120
_HEAD_EVERY = 11        # g % 11 == 5 -> "## " prefix
_LIST_EVERY = 7         # g % 7 == 3 (and not header) -> "- " prefix
_RENDER_VERSION = 2


def _render_rows(batch: pa.Table) -> list[dict]:
    """documents (doc_id, text) -> DOCS_SCHEMA rows: fixed 120-char
    paragraph chunks with deterministic markdown prefixes (flat font, so
    classification is purely structural — SQL-replicable)."""
    rows = []
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    for doc_id, text in zip(ids, texts):
        text = text or ""
        n = math.ceil(len(text) / _CHUNK)
        spans, fonts, pages, links, bboxes = [], [], [], [], []
        for g in range(n):
            if g % _HEAD_EVERY == 5:
                prefix = "## "
            elif g % _LIST_EVERY == 3:
                prefix = "- "
            else:
                prefix = ""
            spans.append({"kind": "text",
                          "text": prefix + text[g * _CHUNK:(g + 1) * _CHUNK],
                          "media_ref": "", "offset": 10 * g})
            fonts.append(10.0)
            pages.append(1 + g // 40)          # paginate long docs
            links.append(0.0)
            y = (g % 40) / 40.0
            bboxes.append([0.0625, y, 0.9375, min(1.0, y + 0.015625)])
        rows.append({"doc_id": str(doc_id), "spans": spans,
                     "font_size": fonts, "page": pages,
                     "link_density": links, "bbox": bboxes,
                     "regions": [], "n_pages": max(1 + (n - 1) // 40, 1)})
    return rows


def ensure_pdf_render(sf_dir: str, root: str = "/tmp/pdfxr_fixtures",
                      **modes) -> str:
    """Render (once, cached) ``{sf_dir}/documents.parquet`` into a sharded
    directory of real PDF files. Synthesis runs as parallel Ray tasks —
    each batch writes its own files (atomic tmp+rename, so concurrent
    generations of identical content are safe). ``modes`` forwards the
    writer toggles (``encrypt`` / ``inline_images`` / ...) and joins
    the cache key (full kwarg names — ADVICE r4)."""
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    mode_key = "".join(
        f"-{k}={v if isinstance(v, str) else int(bool(v))}"
        for k, v in sorted(modes.items()))
    path = os.path.join(root,
                        f"pdfingest-v{_RENDER_VERSION}-{key}{mode_key}")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        n = 0
        for row in _render_rows(batch):
            sub = os.path.join(path, f"shard={int(row['doc_id']) % 16:02d}")
            os.makedirs(sub, exist_ok=True)
            p = os.path.join(sub, f"{int(row['doc_id']):012d}.pdf")
            tmp = p + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(synthesize_pdf(row, **modes))
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


def _ingest_counts(out) -> pd.DataFrame:
    """Extraction output Dataset -> per-doc span/class/char counts (the
    shared verification surface of every binary-ingestion slice: PDF and
    HTML must land on the SAME counts from the same rendered text)."""
    def agg(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans").combine_chunks()
        flat = spans.flatten()
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        cls = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(pc.struct_field(flat, "text")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(batch)
        doc_ids = pc.cast(batch.column("doc_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)

        def bincount(mask, w=None):
            return np.bincount(parent[mask], weights=None if w is None
                               else w[mask], minlength=n_docs).astype(np.int64)

        n_spans = bincount(np.ones(len(parent), dtype=bool)) \
            if len(parent) else np.zeros(n_docs, dtype=np.int64)
        n_title = bincount(cls == "title") if len(parent) \
            else np.zeros(n_docs, dtype=np.int64)
        n_list = bincount(cls == "list") if len(parent) \
            else np.zeros(n_docs, dtype=np.int64)
        n_chars = bincount(np.ones(len(parent), dtype=bool), chars) \
            if len(parent) else np.zeros(n_docs, dtype=np.int64)
        keep = n_spans > 0           # oracle emits only docs with >=1 chunk
        return pa.Table.from_pydict({
            "doc_id": doc_ids[keep], "n_spans": n_spans[keep],
            "n_title": n_title[keep], "n_list": n_list[keep],
            "n_para": (n_spans - n_title - n_list)[keep],
            "n_chars": n_chars[keep].astype(np.int64)})

    df = out.map_batches(agg, batch_format="pyarrow").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


@_typed_empty_on_no_docs(doc_id='int64', n_spans='int64', n_title='int64', n_list='int64', n_para='int64', n_chars='int64')
def pdf_ingest_extract(sf_dir: str) -> pd.DataFrame:
    """documents -> PDFs -> parse -> extract -> per-doc class counts."""
    pdf_dir = ensure_pdf_render(sf_dir)
    return _ingest_counts(extract_pipeline(read_pdf_docs(pdf_dir)))


@_typed_empty_on_no_docs(doc_id='int64', n_spans='int64', n_title='int64', n_list='int64', n_para='int64', n_chars='int64')
def pdf_ingest_extract_encrypted(sf_dir: str) -> pd.DataFrame:
    """The same ingestion slice through AES-128-ENCRYPTED PDFs with
    BI/ID/EI inline images (round-5): decrypt + parse + extract must
    land on byte-identical per-doc counts, so the clear-corpus oracle
    doubles as the encrypted path's oracle."""
    pdf_dir = ensure_pdf_render(sf_dir, encrypt="aes128",
                                inline_images=True)
    return _ingest_counts(extract_pipeline(read_pdf_docs(pdf_dir)))


_WS_SET = "' ' || chr(9) || chr(13) || chr(10) || chr(12) || chr(11)"
_HEAD_RE = r"'^#{1,6}[ \t\r\n\f\v]'"
_LIST_RE = r"'^(?:[-*]|[0-9]+\.)[ \t\r\n\f\v]'"

PDF_INGEST_SQL = f"""
WITH gs AS (
  SELECT doc_id, coalesce(text, '') AS txt,
         unnest(range(0, CAST(ceil(length(coalesce(text, ''))
                                   / {_CHUNK}.0) AS BIGINT))) AS g
  FROM documents
),
chunks AS (
  SELECT doc_id,
         trim(CASE WHEN g % {_HEAD_EVERY} = 5 THEN '## '
                   WHEN g % {_LIST_EVERY} = 3 THEN '- '
                   ELSE '' END
              || substring(txt, 1 + {_CHUNK} * CAST(g AS INT), {_CHUNK}),
              {_WS_SET}) AS t
  FROM gs
),
kept AS (SELECT doc_id, t FROM chunks WHERE t <> '')
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(count(*) FILTER (regexp_matches(t, {_HEAD_RE}))
            AS BIGINT) AS n_title,
       CAST(count(*) FILTER (NOT regexp_matches(t, {_HEAD_RE})
                             AND regexp_matches(t, {_LIST_RE}))
            AS BIGINT) AS n_list,
       CAST(count(*) FILTER (NOT regexp_matches(t, {_HEAD_RE})
                             AND NOT regexp_matches(t, {_LIST_RE}))
            AS BIGINT) AS n_para,
       CAST(sum(length(t)) AS BIGINT) AS n_chars
FROM kept GROUP BY doc_id ORDER BY doc_id
"""


PDFIO_QUERIES: dict[str, tuple] = {
    "pdf_ingest_extract": (pdf_ingest_extract, PDF_INGEST_SQL),
    "pdf_ingest_extract_encrypted": (pdf_ingest_extract_encrypted,
                                     PDF_INGEST_SQL),
}
