"""Span-window queries over INTERLEAVED text+media documents — the
driver's `input_hint` payload shape (doc_id, spans:array<struct<kind,
text, media_ref, offset>>) exercised directly as an analytical surface:

- ``span_media_context``: for every media span, the nearest PRECEDING
  title span's text (the "what section does this figure live in"
  lookup a multimodal training pipeline runs when pairing images with
  captions/sections). A per-document ordered window (last-title
  propagation), computed with one vectorized ``maximum.accumulate``
  pass per batch — a document's spans always live in one list row, so
  no exchange and no cross-batch state are needed.
- ``span_section_stats``: windowed aggregate — every span is assigned
  to its governing section (the last title at-or-before it; -1 for the
  preamble) and per-(doc, section) span/media/char counts are emitted.
  Aggregation is batch-local and complete (a doc never splits across
  rows), so the whole operator is shuffle-free at any corpus size.

The interleaved corpus is derived deterministically from the driver's
``documents`` table (fixed 40-char chunks; every 7th-mod-5 chunk is a
title; a media span follows every 4th-mod-2 chunk, ref =
``img_<doc>_<g>``), so a pure-SQL DuckDB oracle reproduces the same
spans and windows bit-exactly from ``documents.text``.

Reference analog: figure/caption proximity + section context assembly
(`hybrid_docling_gpt4_processor.py` caption search near figures;
`complete_multimodal_rag_evaluation.py` context assembly) — rebuilt as
window operators over the interleaved span payload.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_SCHUNK = 40            # chars per text chunk
_TITLE_MOD, _TITLE_AT = 7, 5    # g % 7 == 5 -> title span
_MEDIA_MOD, _MEDIA_AT = 4, 2    # media span follows chunk when g % 4 == 2

SPAN_STRUCT = pa.struct([("kind", pa.string()), ("text", pa.string()),
                         ("media_ref", pa.string()),
                         ("offset", pa.int32())])
INTERLEAVED_SCHEMA = pa.schema([("doc_id", pa.int64()),
                                ("spans", pa.list_(SPAN_STRUCT))])


def _interleave_rows(batch: pa.Table) -> pa.Table:
    """documents (doc_id, text) -> interleaved (doc_id, spans) rows.
    Fixture-style derivation (same class as pdfio._render_rows): offsets
    are 2g for the chunk at position g and 2g+1 for the media span that
    follows it, so the oracle can rebuild the exact sequence in SQL."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    rows = []
    for doc_id, text in zip(ids, texts):
        text = text or ""
        spans = []
        for g in range(-(-len(text) // _SCHUNK)):
            kind = "title" if g % _TITLE_MOD == _TITLE_AT else "text"
            spans.append({"kind": kind,
                          "text": text[g * _SCHUNK:(g + 1) * _SCHUNK],
                          "media_ref": "", "offset": 2 * g})
            if g % _MEDIA_MOD == _MEDIA_AT:
                spans.append({"kind": "image", "text": "",
                              "media_ref": f"img_{doc_id}_{g}",
                              "offset": 2 * g + 1})
        rows.append({"doc_id": doc_id, "spans": spans})
    return pa.Table.from_pylist(rows, schema=INTERLEAVED_SCHEMA)


def interleaved_docs(sf_dir: str) -> "ray.data.Dataset":
    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
            .map_batches(_interleave_rows, batch_format="pyarrow"))


def _flat_spans(batch: pa.Table):
    """Flatten one interleaved batch -> (doc_ids, doc_start_per_span,
    kind, text, media_ref, offset) numpy/arrow columns, span order
    preserved (doc-major, offset-ascending within a doc)."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    starts = np.asarray(spans.offsets)          # first flat idx per doc
    return (batch.column("doc_id").to_numpy(zero_copy_only=False), parent,
            starts[:-1][parent] if len(parent) else parent,
            pc.struct_field(flat, "kind"), pc.struct_field(flat, "text"),
            pc.struct_field(flat, "media_ref"),
            pc.struct_field(flat, "offset"))


def _last_title(kind_np: np.ndarray, doc_start: np.ndarray) -> np.ndarray:
    """Index of the last title span at-or-before each span within its
    own document, -1 if none. One maximum.accumulate over the flat span
    order; the doc_start guard cancels carry-over across documents."""
    idx = np.arange(len(kind_np), dtype=np.int64)
    last = np.maximum.accumulate(np.where(kind_np == "title", idx, -1))
    return np.where(last >= doc_start, last, -1)


def span_media_context(sf_dir: str):
    """(doc_id, media_ref, offset, context): nearest preceding title
    text per media span ('' when the media precedes every title)."""
    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, parent, doc_start, kind, text, ref, off = _flat_spans(batch)
        kind_np = kind.to_numpy(zero_copy_only=False)
        last = _last_title(kind_np, doc_start)
        sel = np.flatnonzero(kind_np == "image")
        lt = last[sel]
        ctx = pc.if_else(pa.array(lt >= 0),
                         pc.take(text, pa.array(np.maximum(lt, 0))),
                         pa.scalar("", pa.string()))
        return pa.Table.from_arrays(
            [pa.array(doc_ids[parent[sel]], pa.int64()),
             pc.take(ref, pa.array(sel)), pc.take(off, pa.array(sel)), ctx],
            names=["doc_id", "media_ref", "offset", "context"])

    return interleaved_docs(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=None)


SPAN_MEDIA_CONTEXT_SQL = f"""
WITH gs AS (
  SELECT doc_id, coalesce(text, '') AS txt,
         unnest(range(0, CAST(ceil(length(coalesce(text, ''))
                                   / {_SCHUNK}.0) AS BIGINT))) AS g
  FROM documents
),
spans AS (
  SELECT doc_id, 2 * g AS off,
         CASE WHEN g % {_TITLE_MOD} = {_TITLE_AT} THEN 'title'
              ELSE 'text' END AS kind,
         substring(txt, 1 + {_SCHUNK} * CAST(g AS INT), {_SCHUNK}) AS t,
         '' AS media_ref
  FROM gs
  UNION ALL
  SELECT doc_id, 2 * g + 1, 'image', '',
         'img_' || CAST(doc_id AS VARCHAR) || '_' || CAST(g AS VARCHAR)
  FROM gs WHERE g % {_MEDIA_MOD} = {_MEDIA_AT}
),
w AS (
  SELECT *, max(CASE WHEN kind = 'title' THEN off END) OVER
           (PARTITION BY doc_id ORDER BY off
            ROWS UNBOUNDED PRECEDING) AS t_off
  FROM spans
),
titles AS (SELECT doc_id, off, t FROM spans WHERE kind = 'title')
SELECT w.doc_id, w.media_ref, CAST(w.off AS INT) AS "offset",
       coalesce(titles.t, '') AS context
FROM w LEFT JOIN titles
  ON titles.doc_id = w.doc_id AND titles.off = w.t_off
WHERE w.kind = 'image'
ORDER BY w.doc_id, w.off
"""


def span_section_stats(sf_dir: str):
    """Windowed aggregate: per-(doc, section) span/media/char counts,
    section = offset of the governing title (-1 = preamble). Batch-local
    and complete — zero exchange."""
    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, parent, doc_start, kind, text, _ref, off = _flat_spans(batch)
        if len(parent) == 0:
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.int64()),
                 "section_off": pa.array([], pa.int32()),
                 "n_spans": pa.array([], pa.int64()),
                 "n_media": pa.array([], pa.int64()),
                 "n_chars": pa.array([], pa.int64())})
        kind_np = kind.to_numpy(zero_copy_only=False)
        off_np = off.to_numpy(zero_copy_only=False).astype(np.int64)
        last = _last_title(kind_np, doc_start)
        sec = np.where(last >= 0, off_np[np.maximum(last, 0)], -1)
        key = parent.astype(np.int64) * (off_np.max() + 2) + (sec + 1)
        uniq, inv = np.unique(key, return_inverse=True)
        n = len(uniq)
        n_spans = np.bincount(inv, minlength=n).astype(np.int64)
        n_media = np.bincount(inv, weights=(kind_np == "image"),
                              minlength=n).astype(np.int64)
        chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n_chars = np.bincount(inv, weights=chars, minlength=n) \
            .astype(np.int64)
        first = np.full(n, -1, dtype=np.int64)
        first[inv[::-1]] = np.arange(len(inv) - 1, -1, -1)
        return pa.Table.from_pydict({
            "doc_id": pa.array(doc_ids[parent[first]], pa.int64()),
            "section_off": pa.array(sec[first].astype(np.int32)),
            "n_spans": n_spans, "n_media": n_media, "n_chars": n_chars})

    return interleaved_docs(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=None)


SPAN_SECTION_STATS_SQL = f"""
WITH gs AS (
  SELECT doc_id, coalesce(text, '') AS txt,
         unnest(range(0, CAST(ceil(length(coalesce(text, ''))
                                   / {_SCHUNK}.0) AS BIGINT))) AS g
  FROM documents
),
spans AS (
  SELECT doc_id, 2 * g AS off,
         CASE WHEN g % {_TITLE_MOD} = {_TITLE_AT} THEN 'title'
              ELSE 'text' END AS kind,
         substring(txt, 1 + {_SCHUNK} * CAST(g AS INT), {_SCHUNK}) AS t
  FROM gs
  UNION ALL
  SELECT doc_id, 2 * g + 1, 'image', ''
  FROM gs WHERE g % {_MEDIA_MOD} = {_MEDIA_AT}
),
w AS (
  SELECT *, coalesce(max(CASE WHEN kind = 'title' THEN off END) OVER
           (PARTITION BY doc_id ORDER BY off
            ROWS UNBOUNDED PRECEDING), -1) AS sec
  FROM spans
)
SELECT doc_id, CAST(sec AS INT) AS section_off,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(count(*) FILTER (kind = 'image') AS BIGINT) AS n_media,
       CAST(sum(length(t)) AS BIGINT) AS n_chars
FROM w GROUP BY doc_id, sec ORDER BY doc_id, sec
"""


_PAIR_MIN_CHARS = 150            # section must carry real text


def span_caption_pairs(sf_dir: str):
    """Composed multimodal pair mining over the interleaved payload:
    (media span, governing-section title) pairs kept only when the
    section is substantive — the media sits under a title (sec >= 0)
    and its section carries >= {_PAIR_MIN_CHARS} chars of span text.
    The image-text pair table a multimodal training run consumes.

    Still ONE zero-exchange pass: section membership, per-section char
    sums and the media selection are all batch-local (a doc never
    splits across rows); output is (doc_id, media_ref, context,
    section_chars)."""
    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, parent, doc_start, kind, text, ref, off = \
            _flat_spans(batch)
        if len(parent) == 0:
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.int64()),
                 "media_ref": pa.array([], pa.string()),
                 "context": pa.array([], pa.string()),
                 "section_chars": pa.array([], pa.int64())})
        kind_np = kind.to_numpy(zero_copy_only=False)
        off_np = off.to_numpy(zero_copy_only=False).astype(np.int64)
        last = _last_title(kind_np, doc_start)
        sec_anchor = np.maximum(last, 0)          # flat idx of the title
        has_sec = last >= 0
        # per-(doc, section) char totals, batch-local (cf. section stats)
        key = parent.astype(np.int64) * (off_np.max() + 2) \
            + np.where(has_sec, off_np[sec_anchor], -1) + 1
        uniq, inv = np.unique(key, return_inverse=True)
        chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sec_chars = np.bincount(inv, weights=chars,
                                minlength=len(uniq)).astype(np.int64)
        per_span_sec_chars = sec_chars[inv]
        sel = np.flatnonzero((kind_np == "image") & has_sec
                             & (per_span_sec_chars >= _PAIR_MIN_CHARS))
        ctx = pc.take(text, pa.array(sec_anchor[sel]))
        return pa.Table.from_arrays(
            [pa.array(doc_ids[parent[sel]], pa.int64()),
             pc.take(ref, pa.array(sel)), ctx,
             pa.array(per_span_sec_chars[sel])],
            names=["doc_id", "media_ref", "context", "section_chars"])

    return interleaved_docs(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=None)


SPAN_CAPTION_PAIRS_SQL = f"""
WITH gs AS (
  SELECT doc_id, coalesce(text, '') AS txt,
         unnest(range(0, CAST(ceil(length(coalesce(text, ''))
                                   / {_SCHUNK}.0) AS BIGINT))) AS g
  FROM documents
),
spans AS (
  SELECT doc_id, 2 * g AS off,
         CASE WHEN g % {_TITLE_MOD} = {_TITLE_AT} THEN 'title'
              ELSE 'text' END AS kind,
         substring(txt, 1 + {_SCHUNK} * CAST(g AS INT), {_SCHUNK}) AS t,
         '' AS media_ref
  FROM gs
  UNION ALL
  SELECT doc_id, 2 * g + 1, 'image', '',
         'img_' || CAST(doc_id AS VARCHAR) || '_' || CAST(g AS VARCHAR)
  FROM gs WHERE g % {_MEDIA_MOD} = {_MEDIA_AT}
),
w AS (
  SELECT *, max(CASE WHEN kind = 'title' THEN off END) OVER
           (PARTITION BY doc_id ORDER BY off
            ROWS UNBOUNDED PRECEDING) AS sec
  FROM spans
),
secagg AS (
  SELECT doc_id, sec, CAST(sum(length(t)) AS BIGINT) AS section_chars
  FROM w WHERE sec IS NOT NULL GROUP BY doc_id, sec
),
titles AS (SELECT doc_id, off, t FROM spans WHERE kind = 'title')
SELECT w.doc_id, w.media_ref, titles.t AS context,
       secagg.section_chars
FROM w
JOIN secagg ON secagg.doc_id = w.doc_id AND secagg.sec = w.sec
JOIN titles ON titles.doc_id = w.doc_id AND titles.off = w.sec
WHERE w.kind = 'image' AND secagg.section_chars >= {_PAIR_MIN_CHARS}
ORDER BY w.doc_id, w.off
"""


SPANS_QUERIES = {
    "span_media_context": (span_media_context, SPAN_MEDIA_CONTEXT_SQL),
    "span_section_stats": (span_section_stats, SPAN_SECTION_STATS_SQL),
    "span_caption_pairs": (span_caption_pairs, SPAN_CAPTION_PAIRS_SQL),
}
