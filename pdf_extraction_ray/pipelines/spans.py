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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .corpus import _typed_empty_on_no_docs

_SCHUNK = 40            # chars per text chunk
_TITLE_MOD, _TITLE_AT = 7, 5    # g % 7 == 5 -> title span
_MEDIA_MOD, _MEDIA_AT = 4, 2    # media span follows chunk when g % 4 == 2

SPAN_STRUCT = pa.struct([("kind", pa.string()), ("text", pa.string()),
                         ("media_ref", pa.string()),
                         ("offset", pa.int32())])
INTERLEAVED_SCHEMA = pa.schema([("doc_id", pa.int64()),
                                ("spans", pa.list_(SPAN_STRUCT))])


def _interleave_rows_ref(batch: pa.Table) -> pa.Table:
    """Pure-python reference for ``_interleave_rows`` (differential
    twin, cf. the counters tier): one row-loop, kept ONLY for tests."""
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


def _interleave_rows(batch: pa.Table) -> pa.Table:
    """documents (doc_id, text) -> interleaved (doc_id, spans) rows.
    Fixture-style derivation (same class as pdfio._render_rows): offsets
    are 2g for the chunk at position g and 2g+1 for the media span that
    follows it, so the oracle can rebuild the exact sequence in SQL.

    Vectorized: one loop per chunk INDEX (bounded by the longest doc in
    the batch, cf. `cleaning._render_site_lines`), each iteration an
    Arrow slice kernel over every doc that still has that chunk; the
    flat span columns are then lexsorted into (doc, offset) order and
    re-listed via bincount offsets — no per-document python work.
    Differential-tested against ``_interleave_rows_ref``."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_chunks = (lens + _SCHUNK - 1) // _SCHUNK
    kind_dict = pa.array(["text", "title", "image"])
    empty1 = pa.array([""])

    def _const_str(val_arr: pa.Array, n: int) -> pa.Array:
        return val_arr.take(pa.array(np.zeros(n, np.int64)))

    par, offs, codes, texts, refs = [], [], [], [], []
    for g in range(int(n_chunks.max()) if len(ids) else 0):
        sel = n_chunks > g
        idx = np.flatnonzero(sel)
        sl = pc.utf8_slice_codeunits(txt.filter(pa.array(sel)),
                                     _SCHUNK * g, _SCHUNK * (g + 1))
        code = 1 if g % _TITLE_MOD == _TITLE_AT else 0
        par.append(idx)
        offs.append(np.full(len(idx), 2 * g, np.int64))
        codes.append(np.full(len(idx), code, np.int64))
        texts.append(sl)
        refs.append(_const_str(empty1, len(idx)))
        if g % _MEDIA_MOD == _MEDIA_AT:
            par.append(idx)
            offs.append(np.full(len(idx), 2 * g + 1, np.int64))
            codes.append(np.full(len(idx), 2, np.int64))
            texts.append(_const_str(empty1, len(idx)))
            refs.append(pc.binary_join_element_wise(
                "img_", pc.cast(pa.array(ids[idx]), pa.string()),
                f"_{g}", ""))
    if par:
        parv = np.concatenate(par)
        offv = np.concatenate(offs)
        order = np.lexsort((offv, parv))
        take = pa.array(order)
        parv, offv = parv[order], offv[order]
        kindv = kind_dict.take(pa.array(
            np.concatenate(codes)[order]))
        textv = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
             else a for a in texts]).take(take)
        refv = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
             else a for a in refs]).take(take)
    else:
        parv = np.array([], np.int64)
        offv = np.array([], np.int64)
        kindv = textv = refv = pa.array([], pa.string())
    counts = np.bincount(parv, minlength=len(ids)) if len(ids) \
        else np.array([], np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    struct = pa.StructArray.from_arrays(
        [kindv, textv, refv,
         pa.array(offv.astype(np.int32), pa.int32())],
        fields=list(SPAN_STRUCT))
    spans = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), pa.int32()), struct)
    return pa.Table.from_arrays([pa.array(ids, pa.int64()), spans],
                                schema=INTERLEAVED_SCHEMA)


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


@_typed_empty_on_no_docs(doc_id='int64', media_ref='object', offset='int32', context='object')
def span_media_context(sf_dir: str, ds=None):
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
            [pa.array(doc_ids[parent[sel]]),
             pc.take(ref, pa.array(sel)), pc.take(off, pa.array(sel)), ctx],
            names=["doc_id", "media_ref", "offset", "context"])

    src = ds if ds is not None else interleaved_docs(sf_dir)
    return src.map_batches(fn, batch_format="pyarrow",
                           batch_size=None)


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


@_typed_empty_on_no_docs(doc_id='int64', section_off='int32', n_spans='int64', n_media='int64', n_chars='int64')
def span_section_stats(sf_dir: str, ds=None):
    """Windowed aggregate: per-(doc, section) span/media/char counts,
    section = offset of the governing title (-1 = preamble). Batch-local
    and complete — zero exchange."""
    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, parent, doc_start, kind, text, _ref, off = _flat_spans(batch)
        if len(parent) == 0:
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], batch.column("doc_id").type),
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
            "doc_id": pa.array(doc_ids[parent[first]]),
            "section_off": pa.array(sec[first].astype(np.int32)),
            "n_spans": n_spans, "n_media": n_media, "n_chars": n_chars})

    src = ds if ds is not None else interleaved_docs(sf_dir)
    return src.map_batches(fn, batch_format="pyarrow",
                           batch_size=None)


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


@_typed_empty_on_no_docs(doc_id='int64', media_ref='object', context='object', section_chars='int64')
def span_caption_pairs(sf_dir: str, ds=None):
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
                {"doc_id": pa.array([], batch.column("doc_id").type),
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
            [pa.array(doc_ids[parent[sel]]),
             pc.take(ref, pa.array(sel)), ctx,
             pa.array(per_span_sec_chars[sel])],
            names=["doc_id", "media_ref", "context", "section_chars"])

    src = ds if ds is not None else interleaved_docs(sf_dir)
    return src.map_batches(fn, batch_format="pyarrow",
                           batch_size=None)


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


# ---------------------------------------------------------------------------
# Shared oracle CTE: re-derive the interleaved spans from documents.text
# ---------------------------------------------------------------------------

_DERIVE_CTE = f"""
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
)"""


@_typed_empty_on_no_docs(doc_id='int64', media_ref='object', offset='int32', gap_chars='int64')
def span_media_gaps(sf_dir: str, ds=None):
    """OBELICS/MMC4-style interleaving statistic: for every media span,
    the count of span-text characters between it and the PREVIOUS media
    span in the same document (from the document start for the first
    one). The signal an interleaved image-text training pipeline uses
    to drop image-dense or text-desert documents and to budget
    tokens-per-image when packing sequences.

    One vectorized pass per batch (global char cumsum + a
    maximum.accumulate previous-media index, doc_start-guarded like
    ``_last_title``); a doc never splits across rows, so the operator
    is shuffle-free at any corpus size."""
    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, parent, doc_start, kind, text, ref, off = _flat_spans(batch)
        if len(parent) == 0:
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], batch.column("doc_id").type),
                 "media_ref": pa.array([], pa.string()),
                 "offset": pa.array([], pa.int32()),
                 "gap_chars": pa.array([], pa.int64())})
        kind_np = kind.to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cum_excl = np.cumsum(chars) - chars      # chars before each span
        idx = np.arange(len(kind_np), dtype=np.int64)
        lastm = np.maximum.accumulate(np.where(kind_np == "image", idx, -1))
        prev = np.concatenate([[-1], lastm[:-1]])      # strictly-before
        prev = np.where(prev >= doc_start, prev, -1)
        sel = np.flatnonzero(kind_np == "image")
        base = np.where(prev[sel] >= 0,
                        cum_excl[np.maximum(prev[sel], 0)],
                        cum_excl[doc_start[sel]])
        return pa.Table.from_arrays(
            [pa.array(doc_ids[parent[sel]]),
             pc.take(ref, pa.array(sel)), pc.take(off, pa.array(sel)),
             pa.array(cum_excl[sel] - base)],
            names=["doc_id", "media_ref", "offset", "gap_chars"])

    src = ds if ds is not None else interleaved_docs(sf_dir)
    return src.map_batches(fn, batch_format="pyarrow",
                           batch_size=None)


SPAN_MEDIA_GAPS_SQL = _DERIVE_CTE + """,
w AS (
  SELECT *, coalesce(sum(length(t)) OVER
           (PARTITION BY doc_id ORDER BY off
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM spans
),
m AS (
  SELECT doc_id, media_ref, off, cum,
         coalesce(lag(cum) OVER (PARTITION BY doc_id ORDER BY off), 0)
             AS pcum
  FROM w WHERE kind = 'image'
)
SELECT doc_id, media_ref, CAST(off AS INT) AS "offset",
       CAST(cum - pcum AS BIGINT) AS gap_chars
FROM m ORDER BY doc_id, off
"""


_DENSITY_MAX = 200       # max span-text chars per media span to keep


@_typed_empty_on_no_docs(doc_id='int64', n_media='int64', n_chars='int64', keep='int64')
def docs_interleaved_filter(sf_dir: str, ds=None):
    """Doc-level multimodal curation gate over the interleaved payload
    (OBELICS-style): keep a document iff it contains at least one media
    span AND its text density stays under ``_DENSITY_MAX`` chars per
    media span (text deserts make poor interleaved training docs).
    Emits every document WITH its keep flag so the rejected set is
    auditable. Batch-local and complete — zero exchange."""
    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, parent, _ds, kind, text, _ref, _off = _flat_spans(batch)
        if len(parent) == 0:
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], batch.column("doc_id").type),
                 "n_media": pa.array([], pa.int64()),
                 "n_chars": pa.array([], pa.int64()),
                 "keep": pa.array([], pa.int64())})
        kind_np = kind.to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(batch)
        n_spans = np.bincount(parent, minlength=n)
        n_media = np.bincount(parent, weights=(kind_np == "image"),
                              minlength=n).astype(np.int64)
        n_chars = np.bincount(parent, weights=chars,
                              minlength=n).astype(np.int64)
        keep = ((n_media >= 1)
                & (n_chars <= _DENSITY_MAX * n_media)).astype(np.int64)
        has = n_spans > 0            # docs with no spans match no oracle row
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids[has]),
             "n_media": n_media[has], "n_chars": n_chars[has],
             "keep": keep[has]})

    src = ds if ds is not None else interleaved_docs(sf_dir)
    return src.map_batches(fn, batch_format="pyarrow",
                           batch_size=None)


DOCS_INTERLEAVED_FILTER_SQL = _DERIVE_CTE + f"""
SELECT doc_id,
       CAST(count(*) FILTER (kind = 'image') AS BIGINT) AS n_media,
       CAST(sum(length(t)) AS BIGINT) AS n_chars,
       CAST(CASE WHEN count(*) FILTER (kind = 'image') >= 1
                  AND sum(length(t)) <=
                      {_DENSITY_MAX} * count(*) FILTER (kind = 'image')
             THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM spans GROUP BY doc_id ORDER BY doc_id
"""


def _line_doc_rows(batch: pa.Table) -> pa.Table:
    """Interleaved batch -> one row per (line text, doc): (t, doc_id,
    cnt, min_off). Lines are the non-media spans; a doc never splits
    across rows, so (t, doc) pairs are globally distinct after this
    batch-local reduction."""
    doc_ids, parent, _ds, kind, text, _ref, off = _flat_spans(batch)
    kind_np = kind.to_numpy(zero_copy_only=False)
    sel = np.flatnonzero(kind_np != "image")
    if len(sel) == 0:
        return pa.Table.from_pydict(
            {"t": pa.array([], pa.string()),
             "doc_id": pa.array([], pa.int64()),
             "cnt": pa.array([], pa.int64()),
             "min_off": pa.array([], pa.int64())})
    df = pd.DataFrame({
        "t": text.take(pa.array(sel)).to_pandas(),
        "doc_id": doc_ids[parent[sel]],
        "off": off.to_numpy(zero_copy_only=False)[sel].astype(np.int64)})
    g = df.groupby(["t", "doc_id"], as_index=False, sort=False).agg(
        cnt=("off", "size"), min_off=("off", "min"))
    return pa.Table.from_pandas(g.astype({"cnt": "int64",
                                          "min_off": "int64"}),
                                preserve_index=False)


@_typed_empty_on_no_docs(t='object', n='int64', n_docs='int64')
def span_dup_texts(sf_dir: str):
    """Corpus-global duplicate-line profile over the interleaved
    payload (the CCNet/RefinedWeb 'duplicated lines across documents'
    signal, computed on spans instead of raw text lines): every line
    text that occurs in >= 2 distinct documents, with its total
    occurrence count and distinct-doc count.

    Scale shape: the only exchange is keyed by the line text and moves
    per-(line, doc) pre-reduced rows — never per-occurrence rows; at
    web scale you would ship a 128-bit line hash instead of the 40-char
    text, an identical plan."""
    pairs = interleaved_docs(sf_dir).map_batches(
        _line_doc_rows, batch_format="pyarrow", batch_size=None)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("t", as_index=False).agg(
            n=("cnt", "sum"), n_docs=("doc_id", "nunique"))
        a = a[a["n_docs"] >= 2]
        return a[["t", "n", "n_docs"]].astype({"n": "int64",
                                               "n_docs": "int64"})

    from .corpus import _coarse_str_group
    return _coarse_str_group(pairs, "t", per_group).sort("t")


SPAN_DUP_TEXTS_SQL = _DERIVE_CTE + """
SELECT t, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM spans WHERE kind <> 'image'
GROUP BY t HAVING count(DISTINCT doc_id) >= 2
ORDER BY t
"""


@_typed_empty_on_no_docs(doc_id='int64', n_lines='int64', n_removed='int64', kept_chars='int64')
def span_line_dedup(sf_dir: str):
    """Global keep-first line dedup over the interleaved payload
    (CCNet's cross-document line dedup, downstream of
    ``span_dup_texts``): every line text keeps only its corpus-wide
    first occurrence (minimal ``(doc_id, offset)``); per-doc stats of
    the rewrite are emitted as (doc_id, n_lines, n_removed,
    kept_chars).

    Scale shape (cf. ``corpus.doc_dedup_blocks``): the wide exchange is
    keyed by line text and moves only per-(line, doc) marker rows
    (count + min offset — never one row per occurrence); removed-side
    partials then meet the map-side per-doc totals in one int-keyed
    doc aggregate. No second pass over the corpus is needed because the
    output is the rewrite's accounting, not the rewritten text."""
    base = interleaved_docs(sf_dir)
    pairs = base.map_batches(_line_doc_rows, batch_format="pyarrow",
                             batch_size=None)

    def removed_partials(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of one line text land in one coarse group; the
        # global winner is the lexicographic (doc_id, min_off) first.
        g = g.sort_values(["t", "doc_id", "min_off"])
        chars = g["t"].str.len().astype("int64")
        first = ~g.duplicated("t")          # winner row per line text
        # a winner row still removes its own within-doc repeats
        rem = (g["cnt"] - first.astype("int64")).astype("int64")
        out = pd.DataFrame({"doc_id": g["doc_id"],
                            "n_removed": rem,
                            "removed_chars": rem * chars})
        out = out[out["n_removed"] > 0]
        return out.groupby("doc_id", as_index=False).sum().astype("int64")

    from .corpus import _coarse_str_group
    removed = _coarse_str_group(pairs, "t", removed_partials)

    def doc_totals(batch: pa.Table) -> pa.Table:
        doc_ids, parent, _ds, kind, text, _ref, _off = _flat_spans(batch)
        kind_np = kind.to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        line = kind_np != "image"
        n = len(batch)
        n_lines = np.bincount(parent, weights=line,
                              minlength=n).astype(np.int64)
        tot = np.bincount(parent, weights=chars * line,
                          minlength=n).astype(np.int64)
        has = n_lines > 0
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # totals side of the union: (n_lines, 0, +total_chars) — the
        # removed side contributes (0, n_removed, -removed_chars), so
        # the doc-keyed Sum of the third column IS kept_chars.
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids[has], pa.int64()),
             "n_lines": n_lines[has],
             "n_removed": np.zeros(int(has.sum()), dtype=np.int64),
             "removed_chars": tot[has]})

    def tag_removed(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"],
             "n_lines": np.zeros(len(batch), dtype=np.int64),
             "n_removed": batch["n_removed"],
             "removed_chars": pc.multiply(
                 batch["removed_chars"], pa.scalar(-1, pa.int64()))})

    from ray.data.aggregate import Sum
    totals = base.map_batches(doc_totals, batch_format="pyarrow",
                              batch_size=None)
    unioned = totals.union(removed.map_batches(
        tag_removed, batch_format="pyarrow", batch_size=None))
    agg = unioned.groupby("doc_id").aggregate(
        Sum("n_lines", alias_name="n_lines"),
        Sum("n_removed", alias_name="n_removed"),
        Sum("removed_chars", alias_name="kept_chars"))
    return agg.sort("doc_id")


SPAN_LINE_DEDUP_SQL = _DERIVE_CTE + """,
lines AS (SELECT doc_id, off, t FROM spans WHERE kind <> 'image'),
r AS (SELECT doc_id, t,
             row_number() OVER (PARTITION BY t
                                ORDER BY doc_id, off) AS rn
      FROM lines)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (rn > 1) AS BIGINT) AS n_removed,
       CAST(coalesce(sum(length(t)) FILTER (rn = 1), 0) AS BIGINT)
           AS kept_chars
FROM r GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Interleaved -> training-sample serialization, media-atomic sequence
# packing, and a reading-order audit over a perturbed corpus.
# ---------------------------------------------------------------------------


@_typed_empty_on_no_docs(doc_id='int64', n_media='int64', rendered='object')
def docs_render_interleaved(sf_dir: str, ds=None):
    """Serialize each interleaved document into ONE training-sample
    string: spans in offset order, titles prefixed ``# ``, media spans
    replaced by an ``<image:ref>`` placeholder token, joined by
    newlines — the flattening step an interleaved multimodal trainer
    (MMC4/OBELICS-style) runs right before tokenization.

    Fully vectorized: the per-span projection is three Arrow kernels
    and the per-doc join is ONE ``pc.binary_join`` over the original
    list offsets — no python loop, no exchange (a doc never splits
    across rows). Output: (doc_id, n_media, rendered)."""
    def fn(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        kind = pc.struct_field(flat, "kind")
        text = pc.struct_field(flat, "text")
        ref = pc.struct_field(flat, "media_ref")
        is_img = pc.equal(kind, "image")
        rendered = pc.if_else(
            is_img,
            pc.binary_join_element_wise("<image:", ref, ">", ""),
            pc.if_else(pc.equal(kind, "title"),
                       pc.binary_join_element_wise("# ", text, ""),
                       text))
        relist = pa.ListArray.from_arrays(spans.offsets, rendered)
        joined = pc.binary_join(relist, "\n")
        n_media = np.zeros(len(batch), dtype=np.int64)
        parent = pc.list_parent_indices(spans) \
            .to_numpy(zero_copy_only=False)
        np.add.at(n_media, parent,
                  is_img.to_numpy(zero_copy_only=False))
        has = pc.list_value_length(spans).to_numpy(
            zero_copy_only=False) > 0
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id").filter(pa.array(has)),
             "n_media": pa.array(n_media[has]),
             "rendered": joined.filter(pa.array(has))})

    src = ds if ds is not None else interleaved_docs(sf_dir)
    return src.map_batches(fn, batch_format="pyarrow",
                           batch_size=None)


DOCS_RENDER_INTERLEAVED_SQL = _DERIVE_CTE + """
SELECT doc_id,
       CAST(count(*) FILTER (kind = 'image') AS BIGINT) AS n_media,
       string_agg(CASE WHEN kind = 'image'
                         THEN '<image:' || media_ref || '>'
                       WHEN kind = 'title' THEN '# ' || t
                       ELSE t END, chr(10) ORDER BY off) AS rendered
FROM spans GROUP BY doc_id ORDER BY doc_id
"""


_PACK_BUDGET = 64        # tokens per packed sequence
_PACK_MEDIA_COST = 16    # fixed token cost of one media span


def _span_costs(kind_np: np.ndarray, text) -> np.ndarray:
    """Per-span token cost: media is a fixed {_PACK_MEDIA_COST}-token
    patch budget; text/title cost ceil(chars / 4) (a chars-per-token
    proxy the oracle can replay exactly in integer SQL)."""
    chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    return np.where(kind_np == "image", _PACK_MEDIA_COST,
                    (chars + 3) // 4)


def _greedy_bounds(costs: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Greedy budget-reset cut points for ALL documents at once:
    ``starts`` is the flat-span offset array (one entry per doc + final
    end). Returns the sorted flat indices where sequences begin. Each
    round advances every still-open doc by one full sequence via one
    ``np.searchsorted`` on the global cost prefix-sum, so rounds = max
    sequences per doc, not spans."""
    prefix = np.cumsum(costs)
    s, e = starts[:-1], starts[1:]
    ne = s < e
    cur, end = s[ne].copy(), e[ne]
    if len(cur) == 0:
        return np.array([], dtype=np.int64)
    base = np.where(cur > 0, prefix[np.maximum(cur, 1) - 1], 0)
    bounds = [cur.copy()]
    while True:
        cut = np.searchsorted(prefix, base + _PACK_BUDGET, side="right")
        cut = np.minimum(np.maximum(cut, cur + 1), end)
        alive = cut < end
        if not alive.any():
            break
        cur = cut[alive]
        base = prefix[cur - 1]
        end = end[alive]
        bounds.append(cur.copy())
    return np.sort(np.concatenate(bounds))


@_typed_empty_on_no_docs(doc_id='int64', seq_id='int64', n_spans='int64', n_media='int64', n_tokens='int64')
def packed_interleaved(sf_dir: str, ds=None):
    """Media-atomic greedy sequence packing over the interleaved
    payload: walk each document's spans in offset order and start a new
    sequence whenever adding the next span would push the running token
    count past ``_PACK_BUDGET``; media spans are never split and never
    separated from their token cost. Output one row per (doc, seq):
    (doc_id, seq_id, n_spans, n_media, n_tokens) — the shape a trainer
    feeds its dataloader manifest.

    The greedy reset scan is vectorized ACROSS documents: each round
    advances every still-open document by one full sequence via one
    ``np.searchsorted`` on the global cost prefix-sum (cut = first span
    whose doc-local cumulative cost exceeds the budget), so rounds =
    max sequences per doc, not spans — a giant 10^6-token doc costs
    ~15k O(log n) probes, not 10^6 python steps. Batch-local, zero
    exchange (a doc never splits across rows)."""
    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, parent, _dsf, kind, text, _ref, _off = _flat_spans(batch)
        empty = pa.Table.from_pydict(
            {"doc_id": pa.array([], batch.column("doc_id").type),
             "seq_id": pa.array([], pa.int64()),
             "n_spans": pa.array([], pa.int64()),
             "n_media": pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64())})
        if len(parent) == 0:
            return empty
        kind_np = kind.to_numpy(zero_copy_only=False)
        costs = _span_costs(kind_np, text)
        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        starts = np.asarray(spans_col.offsets, dtype=np.int64)
        b = _greedy_bounds(costs, starts)
        if len(b) == 0:
            return empty
        n_spans = np.diff(np.append(b, len(costs)))
        n_tokens = np.add.reduceat(costs, b)
        n_media = np.add.reduceat(
            (kind_np == "image").astype(np.int64), b)
        doc_of = parent[b]
        change = np.concatenate(
            [[True], doc_of[1:] != doc_of[:-1]]) if len(b) else \
            np.array([], dtype=bool)
        grp = np.maximum.accumulate(
            np.where(change, np.arange(len(b)), 0))
        seq_id = np.arange(len(b)) - grp
        return pa.Table.from_pydict(
            {"doc_id": pa.array(doc_ids[doc_of]),
             "seq_id": seq_id.astype(np.int64),
             "n_spans": n_spans.astype(np.int64),
             "n_media": n_media, "n_tokens": n_tokens})

    src = ds if ds is not None else interleaved_docs(sf_dir)
    return src.map_batches(fn, batch_format="pyarrow",
                           batch_size=None)


PACKED_INTERLEAVED_SQL = f"""
WITH RECURSIVE gs AS (
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
sp AS (
  SELECT doc_id, kind,
         CASE WHEN kind = 'image' THEN {_PACK_MEDIA_COST}
              ELSE (length(t) + 3) // 4 END AS cost,
         row_number() OVER (PARTITION BY doc_id ORDER BY off) AS rn
  FROM spans
),
r AS (
  SELECT doc_id, rn, kind, cost, cost AS cum,
         CAST(0 AS BIGINT) AS seq
  FROM sp WHERE rn = 1
  UNION ALL
  SELECT s.doc_id, s.rn, s.kind, s.cost,
         CASE WHEN r.cum + s.cost > {_PACK_BUDGET} THEN s.cost
              ELSE r.cum + s.cost END,
         CASE WHEN r.cum + s.cost > {_PACK_BUDGET} THEN r.seq + 1
              ELSE r.seq END
  FROM r JOIN sp s ON s.doc_id = r.doc_id AND s.rn = r.rn + 1
)
SELECT doc_id, seq AS seq_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(count(*) FILTER (kind = 'image') AS BIGINT) AS n_media,
       CAST(sum(cost) AS BIGINT) AS n_tokens
FROM r GROUP BY doc_id, seq ORDER BY doc_id, seq
"""


_AUD_SWAP_MOD, _AUD_SWAP_AT = 13, 3     # swap spans 1<->2 of these docs
_AUD_DUP_MOD, _AUD_DUP_AT = 17, 5       # duplicate span 1's offset


def span_order_audit(sf_dir: str):
    """Reading-order integrity gate with PLANTED violations: the
    interleaved corpus is deterministically perturbed (docs with
    ``doc_id % {_AUD_SWAP_MOD} == {_AUD_SWAP_AT}`` get their first two
    span offsets swapped — an inversion; docs with ``doc_id %
    {_AUD_DUP_MOD} == {_AUD_DUP_AT}`` not already swapped get span 2's
    offset copied from span 1 — a duplicate), then audited: adjacent
    offset inversions and duplicates are counted corpus-wide. The gate
    a span-reassembly stage (O1, `stages/reassemble.py`) runs before
    trusting `sort(offset)` to reproduce reading order. One row:
    (n_docs, n_inversions, n_dup_offsets, docs_inverted, docs_dup).

    Per-batch partial counts -> one 5-column Sum; docs are batch-local
    so distinct-doc partials add exactly. Zero exchange beyond the
    final 5-int reduce."""
    def partial(batch: pa.Table) -> pa.Table:
        doc_ids, parent, doc_start, kind, text, _ref, off = \
            _flat_spans(batch)
        zero = pa.Table.from_pydict(
            {k: pa.array([0], pa.int64())
             for k in ("n_docs", "n_inversions", "n_dup_offsets",
                       "docs_inverted", "docs_dup")})
        if len(parent) == 0:
            return zero
        off2 = off.to_numpy(zero_copy_only=False).astype(np.int64).copy()
        orig = off2.copy()
        idx = np.arange(len(parent), dtype=np.int64)
        pos0 = idx == doc_start                  # first span of its doc
        doc = doc_ids[parent]
        nsp = np.bincount(parent, minlength=len(batch))
        big = nsp[parent] >= 2
        sel_a = np.flatnonzero(pos0 & big
                               & (doc % _AUD_SWAP_MOD == _AUD_SWAP_AT))
        off2[sel_a] = orig[sel_a + 1]
        off2[sel_a + 1] = orig[sel_a]
        sel_b = np.flatnonzero(pos0 & big
                               & (doc % _AUD_DUP_MOD == _AUD_DUP_AT)
                               & (doc % _AUD_SWAP_MOD != _AUD_SWAP_AT))
        off2[sel_b + 1] = orig[sel_b]
        same = parent[1:] == parent[:-1]
        inv = same & (off2[1:] < off2[:-1])
        dup = same & (off2[1:] == off2[:-1])
        n_docs = int((nsp > 0).sum())
        return pa.Table.from_pydict({
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_inversions": pa.array([int(inv.sum())], pa.int64()),
            "n_dup_offsets": pa.array([int(dup.sum())], pa.int64()),
            "docs_inverted": pa.array(
                [int(len(np.unique(parent[1:][inv])))], pa.int64()),
            "docs_dup": pa.array(
                [int(len(np.unique(parent[1:][dup])))], pa.int64())})

    from ray.data.aggregate import Sum
    agg = (interleaved_docs(sf_dir)
           .map_batches(partial, batch_format="pyarrow", batch_size=None)
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_inversions", alias_name="n_inversions"),
                      Sum("n_dup_offsets", alias_name="n_dup_offsets"),
                      Sum("docs_inverted", alias_name="docs_inverted"),
                      Sum("docs_dup", alias_name="docs_dup")))
    return pd.DataFrame([{k: np.int64(agg.get(k, 0) or 0)
                          for k in ("n_docs", "n_inversions",
                                    "n_dup_offsets", "docs_inverted",
                                    "docs_dup")}])


SPAN_ORDER_AUDIT_SQL = _DERIVE_CTE + f""",
w AS (
  SELECT doc_id, off,
         row_number() OVER (PARTITION BY doc_id ORDER BY off) AS rn,
         count(*) OVER (PARTITION BY doc_id) AS n,
         lead(off) OVER (PARTITION BY doc_id ORDER BY off) AS nxt,
         lag(off) OVER (PARTITION BY doc_id ORDER BY off) AS prv
  FROM spans
),
p AS (
  SELECT doc_id, rn,
         CASE WHEN doc_id % {_AUD_SWAP_MOD} = {_AUD_SWAP_AT}
                   AND n >= 2 AND rn = 1 THEN nxt
              WHEN doc_id % {_AUD_SWAP_MOD} = {_AUD_SWAP_AT}
                   AND n >= 2 AND rn = 2 THEN prv
              WHEN doc_id % {_AUD_DUP_MOD} = {_AUD_DUP_AT}
                   AND doc_id % {_AUD_SWAP_MOD} <> {_AUD_SWAP_AT}
                   AND n >= 2 AND rn = 2 THEN prv
              ELSE off END AS off2
  FROM w
),
a AS (
  SELECT doc_id, off2,
         lag(off2) OVER (PARTITION BY doc_id ORDER BY rn) AS p2
  FROM p
)
SELECT (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM spans)
           AS n_docs,
       CAST(count(*) FILTER (off2 < p2) AS BIGINT) AS n_inversions,
       CAST(count(*) FILTER (off2 = p2) AS BIGINT) AS n_dup_offsets,
       CAST(count(DISTINCT doc_id) FILTER (off2 < p2) AS BIGINT)
           AS docs_inverted,
       CAST(count(DISTINCT doc_id) FILTER (off2 = p2) AS BIGINT)
           AS docs_dup
FROM a
"""


def _density_keep_mask(batch: pa.Table) -> np.ndarray:
    """Per-row boolean: does this interleaved doc pass the OBELICS
    density gate (>= 1 media span, text chars <= _DENSITY_MAX per
    media)? Same rule as ``docs_interleaved_filter``."""
    _ids, parent, _ds, kind, text, _ref, _off = _flat_spans(batch)
    n = len(batch)
    if len(parent) == 0:
        return np.zeros(n, dtype=bool)
    kind_np = kind.to_numpy(zero_copy_only=False)
    chars = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_media = np.bincount(parent, weights=(kind_np == "image"),
                          minlength=n).astype(np.int64)
    n_chars = np.bincount(parent, weights=chars,
                          minlength=n).astype(np.int64)
    return (n_media >= 1) & (n_chars <= _DENSITY_MAX * n_media)


_FUNNEL_COLS = ("n_docs_in", "n_docs_kept", "n_spans_removed",
                "n_sequences", "n_tokens_packed")


def interleaved_curation_funnel(sf_dir: str,
                                max_broadcast_bytes: int = 64 << 20):
    """END-TO-END interleaved curation: density gate -> corpus-global
    line ownership (a line text belongs to the doc of its first global
    occurrence; every other doc loses it) -> media-atomic greedy
    packing of the surviving spans. One summary row: (n_docs_in,
    n_docs_kept, n_spans_removed, n_sequences, n_tokens_packed) — the
    end-to-end number a curation run reports per snapshot, oracled as
    ONE SQL chain (gate CTE + ownership window + recursive packing
    replay), so the whole composition is hash-gated, not just the
    pieces.

    Scale shape, adaptive by MEASURED size (the dedup-tier convention,
    `dedup._verify_pairs_jaccard`): the line-text-keyed marker exchange
    reduces the corpus to a (doc, t) drop set. When that set is small
    (``max_broadcast_bytes``) it broadcasts via ``ray.put`` and the
    gate/anti-join/packing pass is batch-local with zero further
    movement. On a duplicate-heavy crawl the drop set is a corpus-scale
    fraction — the exact class of driver materialization the r2 review
    flagged on survivorship — so past the cap the funnel switches to a
    doc-keyed exchange: markers and flat span rows co-partition by doc,
    the anti-join + gate + packing finish per partition, and no process
    (driver included) ever holds more than one hash partition of the
    drop set."""
    import ray
    from ray.data.aggregate import Sum

    base = interleaved_docs(sf_dir)

    def gated_lines(batch: pa.Table) -> pa.Table:
        keep = _density_keep_mask(batch)
        return _line_doc_rows(batch.filter(pa.array(keep)))

    def drops_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "doc_id", "min_off"])
        first = ~g.duplicated("t")
        return g.loc[~first, ["doc_id", "t"]]

    from .corpus import _coarse_str_group
    drops_ds = _coarse_str_group(
        base.map_batches(gated_lines, batch_format="pyarrow",
                         batch_size=None), "t", drops_fn).materialize()

    def _result(agg) -> pd.DataFrame:
        return pd.DataFrame([{k: np.int64(agg.get(k, 0) or 0)
                              for k in _FUNNEL_COLS}])

    zero = pa.Table.from_pydict(
        {k: pa.array([0], pa.int64()) for k in _FUNNEL_COLS})

    if (drops_ds.size_bytes() or 0) <= max_broadcast_bytes:
        # fast path: bounded drop set -> broadcast, batch-local finish
        drops = drops_ds.to_pandas()
        if drops.empty:
            drops = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                  "t": pd.Series(dtype="object")})
        drops = drops.drop_duplicates()
        drop_ref = ray.put(drops)

        def final(batch: pa.Table) -> pa.Table:
            dr = ray.get(drop_ref)
            doc_ids, parent, _ds, kind, text, _ref, _off = \
                _flat_spans(batch)
            n = len(batch)
            if len(parent) == 0:
                return zero
            keep_doc = _density_keep_mask(batch)
            nsp = np.bincount(parent, minlength=n)
            kind_np = kind.to_numpy(zero_copy_only=False)
            sel = keep_doc[parent]
            df = pd.DataFrame({
                "doc_id": doc_ids[parent[sel]],
                "t": text.take(
                    pa.array(np.flatnonzero(sel))).to_pandas(),
                "is_img": (kind_np[sel] == "image"),
                "pid": parent[sel],
                "cost": _span_costs(
                    kind_np[sel],
                    text.take(pa.array(np.flatnonzero(sel))))})
            m = dr.assign(_hit=1).merge(
                df.reset_index(), on=["doc_id", "t"], how="right") \
                .sort_values("index")
            dropped = (~m["is_img"].to_numpy()) \
                & (m["_hit"].to_numpy() == 1)
            kept = ~dropped
            pid_k = m["pid"].to_numpy()[kept]
            costs_k = m["cost"].to_numpy()[kept].astype(np.int64)
            starts = np.concatenate(
                [[0], np.cumsum(np.bincount(pid_k, minlength=n))]) \
                .astype(np.int64)
            b = _greedy_bounds(costs_k, starts)
            return pa.Table.from_pydict({
                "n_docs_in": pa.array([int((nsp > 0).sum())],
                                      pa.int64()),
                "n_docs_kept": pa.array([int(keep_doc.sum())],
                                        pa.int64()),
                "n_spans_removed": pa.array([int(dropped.sum())],
                                            pa.int64()),
                "n_sequences": pa.array([len(b)], pa.int64()),
                "n_tokens_packed": pa.array([int(costs_k.sum())],
                                            pa.int64())})

        agg = (base.map_batches(final, batch_format="pyarrow",
                                batch_size=None)
               .aggregate(*[Sum(k, alias_name=k)
                            for k in _FUNNEL_COLS]))
        return _result(agg)

    # scale path: co-partition markers and flat span rows by doc;
    # anti-join + gate + packing finish inside each partition
    def flat_rows(batch: pa.Table) -> pa.Table:
        doc_ids, parent, _ds, kind, text, _ref, off = \
            _flat_spans(batch)
        if len(parent) == 0:
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.int64()),
                 "off": pa.array([], pa.int64()),
                 "kind": pa.array([], pa.string()),
                 "t": pa.array([], pa.string()),
                 "mark": pa.array([], pa.int64())})
        return pa.Table.from_pydict({
            "doc_id": doc_ids[parent].astype(np.int64),
            "off": off.to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "kind": kind, "t": text,
            "mark": np.zeros(len(parent), dtype=np.int64)})

    def mark_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"],
            "off": np.full(n, -1, dtype=np.int64),
            "kind": pa.nulls(n, pa.string()).fill_null(""),
            "t": batch["t"],
            "mark": np.ones(n, dtype=np.int64)})

    unioned = base.map_batches(flat_rows, batch_format="pyarrow",
                               batch_size=None) \
        .union(drops_ds.map_batches(mark_rows, batch_format="pyarrow",
                                    batch_size=None))

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        spans = g[g["mark"] == 0].sort_values(["doc_id", "off"])
        marks = g.loc[g["mark"] == 1, ["doc_id", "t"]] \
            .drop_duplicates()
        if spans.empty:
            return pd.DataFrame({k: pd.Series([0], dtype="int64")
                                 for k in _FUNNEL_COLS})
        doc = spans["doc_id"].to_numpy()
        kind_np = spans["kind"].to_numpy()
        chars = spans["t"].str.len().to_numpy().astype(np.int64)
        codes = np.unique(doc)
        pid = np.searchsorted(codes, doc)
        n = len(codes)
        n_media = np.bincount(pid, weights=(kind_np == "image"),
                              minlength=n).astype(np.int64)
        n_chars = np.bincount(pid, weights=chars,
                              minlength=n).astype(np.int64)
        keep_doc = (n_media >= 1) & (n_chars <= _DENSITY_MAX * n_media)
        sel = keep_doc[pid]
        sub = spans.loc[sel].reset_index(drop=True)
        m = marks.assign(_hit=1).merge(
            sub.reset_index(), on=["doc_id", "t"], how="right") \
            .sort_values("index")
        is_img = m["kind"].to_numpy() == "image"
        dropped = (~is_img) & (m["_hit"].to_numpy() == 1)
        kept = ~dropped
        pid_k = pid[sel][kept]
        text_k = pa.array(m["t"].to_numpy()[kept].astype(object),
                          pa.string())
        costs_k = _span_costs(m["kind"].to_numpy()[kept], text_k)
        starts = np.concatenate(
            [[0], np.cumsum(np.bincount(pid_k, minlength=n))]) \
            .astype(np.int64)
        b = _greedy_bounds(costs_k, starts)
        return pd.DataFrame({
            "n_docs_in": [int(n)],
            "n_docs_kept": [int(keep_doc.sum())],
            "n_spans_removed": [int(dropped.sum())],
            "n_sequences": [len(b)],
            "n_tokens_packed": [int(costs_k.sum())]}).astype("int64")

    from .relational import _coarse_partition_map
    agg = (_coarse_partition_map(unioned, "doc_id", part_fn)
           .aggregate(*[Sum(k, alias_name=k) for k in _FUNNEL_COLS]))
    return _result(agg)


INTERLEAVED_FUNNEL_SQL = f"""
WITH RECURSIVE gs AS (
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
gate AS (
  SELECT doc_id FROM spans GROUP BY doc_id
  HAVING count(*) FILTER (kind = 'image') >= 1
     AND sum(length(t)) <= {_DENSITY_MAX}
                           * count(*) FILTER (kind = 'image')
),
k AS (SELECT s.* FROM spans s JOIN gate USING (doc_id)),
own AS (
  SELECT t, doc_id AS owner FROM (
    SELECT t, doc_id,
           row_number() OVER (PARTITION BY t
                              ORDER BY doc_id, off) AS rn
    FROM k WHERE kind <> 'image') WHERE rn = 1
),
kept AS (
  SELECT k.* FROM k
  LEFT JOIN own ON own.t = k.t AND k.kind <> 'image'
  WHERE k.kind = 'image' OR own.owner = k.doc_id
),
sp AS (
  SELECT doc_id, kind,
         CASE WHEN kind = 'image' THEN {_PACK_MEDIA_COST}
              ELSE (length(t) + 3) // 4 END AS cost,
         row_number() OVER (PARTITION BY doc_id ORDER BY off) AS rn
  FROM kept
),
r AS (
  SELECT doc_id, rn, cost, cost AS cum, CAST(0 AS BIGINT) AS seq
  FROM sp WHERE rn = 1
  UNION ALL
  SELECT s.doc_id, s.rn, s.cost,
         CASE WHEN r.cum + s.cost > {_PACK_BUDGET} THEN s.cost
              ELSE r.cum + s.cost END,
         CASE WHEN r.cum + s.cost > {_PACK_BUDGET} THEN r.seq + 1
              ELSE r.seq END
  FROM r JOIN sp s ON s.doc_id = r.doc_id AND s.rn = r.rn + 1
),
seqs AS (SELECT doc_id, seq, CAST(sum(cost) AS BIGINT) AS toks
         FROM r GROUP BY doc_id, seq)
SELECT (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM spans)
           AS n_docs_in,
       (SELECT CAST(count(*) AS BIGINT) FROM gate) AS n_docs_kept,
       (SELECT CAST(count(*) AS BIGINT) FROM k WHERE kind <> 'image')
       - (SELECT CAST(count(*) AS BIGINT) FROM kept
          WHERE kind <> 'image') AS n_spans_removed,
       (SELECT CAST(count(*) AS BIGINT) FROM seqs) AS n_sequences,
       (SELECT CAST(coalesce(sum(toks), 0) AS BIGINT) FROM seqs)
           AS n_tokens_packed
"""


@_typed_empty_on_no_docs(doc_id='int64', n_spans='int64', n_lang_spans='int64', n_langs='int64', major_lang='object')
def span_lang_mixing(sf_dir: str, ds=None):
    """Per-document language-mixing profile over the interleaved
    payload (code-switch detection — the gate a multilingual curation
    run uses to route mixed-language pages away from monolingual
    training mixes): every non-media span gets the stopword-profile
    langid (`functions/text.langid`, same kernel as the doc-level
    tier), then per doc: span count, identified-span count, distinct
    identified languages, and the majority language (highest span
    count, ties broken alphabetically; 'und' when nothing
    identifies). Batch-local and complete — zero exchange."""
    from ..functions import text as T

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, parent, _ds, kind, text, _ref, _off = _flat_spans(batch)
        if len(parent) == 0:
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], batch.column("doc_id").type),
                 "n_spans": pa.array([], pa.int64()),
                 "n_lang_spans": pa.array([], pa.int64()),
                 "n_langs": pa.array([], pa.int64()),
                 "major_lang": pa.array([], pa.string())})
        kind_np = kind.to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(kind_np != "image")
        pred = T.langid(text.take(pa.array(sel))) \
            .to_numpy(zero_copy_only=False)
        pid = parent[sel]
        n = len(batch)
        # all-bincount/lexsort profile (the pandas lambda-agg form
        # measured 3.5 s per 1.4M spans; this path is ~30x faster)
        n_spans = np.bincount(pid, minlength=n).astype(np.int64)
        known = pred != "und"
        n_lang_spans = np.bincount(pid, weights=known,
                                   minlength=n).astype(np.int64)
        la = np.sort(np.array(T.LANG_ORDER))   # alphabetical tie order
        code = np.searchsorted(la, pred[known])
        key = pid[known].astype(np.int64) * len(la) + code
        uk, cnt = np.unique(key, return_counts=True)
        upid = (uk // len(la)).astype(np.int64)
        ucode = (uk % len(la)).astype(np.int64)
        n_langs = np.bincount(upid, minlength=n).astype(np.int64)
        order = np.lexsort((ucode, -cnt, upid))
        s_upid = upid[order]
        first = np.concatenate([[True], s_upid[1:] != s_upid[:-1]]) \
            if len(s_upid) else np.array([], dtype=bool)
        major = np.full(n, "und", dtype=object)
        major[s_upid[first]] = la[ucode[order][first]]
        has = n_spans > 0
        return pa.Table.from_pydict(
            {"doc_id": pa.array(doc_ids[has]),
             "n_spans": n_spans[has],
             "n_lang_spans": n_lang_spans[has],
             "n_langs": n_langs[has],
             "major_lang": pa.array(major[has], pa.string())})

    src = ds if ds is not None else interleaved_docs(sf_dir)
    return src.map_batches(fn, batch_format="pyarrow",
                           batch_size=None)


def _span_lang_mixing_sql() -> str:
    from .textops import _langid_pieces
    sels, case = _langid_pieces()
    return _DERIVE_CTE + rf""",
tok AS (
  SELECT doc_id, off,
         regexp_split_to_array(lower(trim(t)), '\s+') AS ltoks
  FROM spans WHERE kind <> 'image'),
s AS (SELECT doc_id, off, {sels} FROM tok),
p AS (SELECT doc_id, off, {case} AS pred FROM s),
cnt AS (SELECT doc_id, pred, count(*) AS c FROM p
        WHERE pred <> 'und' GROUP BY doc_id, pred),
maj AS (SELECT doc_id, pred,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, pred) AS rn
        FROM cnt),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(count(*) FILTER (pred <> 'und') AS BIGINT)
                   AS n_lang_spans
        FROM p GROUP BY doc_id),
nl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_langs
       FROM cnt GROUP BY doc_id)
SELECT agg.doc_id, agg.n_spans, agg.n_lang_spans,
       CAST(coalesce(nl.n_langs, 0) AS BIGINT) AS n_langs,
       coalesce(m.pred, 'und') AS major_lang
FROM agg
LEFT JOIN nl USING (doc_id)
LEFT JOIN (SELECT doc_id, pred FROM maj WHERE rn = 1) m USING (doc_id)
ORDER BY agg.doc_id
"""


SPAN_LANG_MIXING_SQL = _span_lang_mixing_sql()


_FETCH_MOD, _FETCH_AT = 11, 4   # (doc*31 + g) % 11 == 4 -> fetch failed


def media_fetch_audit(sf_dir: str):
    """Referential-integrity audit between the interleaved spans' media
    references and the payload STORE manifest (the object-store bucket
    a fetcher fills): the store derivation plants fetch failures (a ref
    is absent when ``(doc*31 + g) % {_FETCH_MOD} == {_FETCH_AT}``), and
    the audit reports how many span references dangle and how many
    documents they touch — the gate run before a multimodal training
    job trusts its media joins. One row: (n_refs, n_missing,
    n_docs_affected).

    Scale shape: both sides reduce to (ref, doc, side) key rows
    map-side and meet in ONE doc-keyed coarse exchange — the store
    manifest records the owning doc, and a ref's span and store rows
    share it, so partitioning by doc co-locates refs AND makes
    distinct-affected-doc counting group-local (one partitioning key,
    reused; no second shuffle). Per-group work is a vectorized isin
    over <= 2 rows per ref. Payloads never move."""
    from ray.data.aggregate import Sum

    def both_sides(batch: pa.Table) -> pa.Table:
        # ONE derivation pass emits both key streams: the span side
        # (side=0, every image ref) and the fetcher's store manifest
        # (side=1, same grid minus planted failures). At real scale the
        # store side is an independent table scan; the exchange below
        # is the same either way.
        doc_ids, parent, _ds, kind, _t, ref, off = _flat_spans(batch)
        kind_np = kind.to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(kind_np == "image")
        doc = doc_ids[parent[sel]]
        g = (off.to_numpy(zero_copy_only=False).astype(np.int64)[sel]
             - 1) // 2
        ok = (doc * 31 + g) % _FETCH_MOD != _FETCH_AT
        refs_span = pc.take(ref, pa.array(sel))
        return pa.Table.from_pydict({
            "ref": pa.concat_arrays(
                [refs_span.combine_chunks()
                 if isinstance(refs_span, pa.ChunkedArray)
                 else refs_span,
                 pc.take(ref, pa.array(sel[ok]))]),
            "doc_id": np.concatenate([doc, doc[ok]]),
            "side": np.concatenate(
                [np.zeros(len(sel), dtype=np.int64),
                 np.ones(int(ok.sum()), dtype=np.int64)])})

    refs = interleaved_docs(sf_dir).map_batches(
        both_sides, batch_format="pyarrow", batch_size=None)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of a doc (hence of each of its refs) land in one
        # coarse partition, so the whole audit finishes group-locally:
        # one 3-int partial per partition
        span_rows = g[g["side"] == 0]
        has_store = span_rows["ref"].isin(g.loc[g["side"] == 1, "ref"])
        miss = ~has_store.to_numpy()
        docs = span_rows["doc_id"].to_numpy()
        return pd.DataFrame({
            "n_refs": [int(len(span_rows))],
            "n_missing": [int(miss.sum())],
            "n_docs_affected": [int(pd.unique(docs[miss]).size)]})

    from .relational import _coarse_partition_map
    agg = (_coarse_partition_map(refs, "doc_id", per_group)
           .aggregate(Sum("n_refs", alias_name="n_refs"),
                      Sum("n_missing", alias_name="n_missing"),
                      Sum("n_docs_affected",
                          alias_name="n_docs_affected")))
    return pd.DataFrame([{k: np.int64(agg.get(k, 0) or 0)
                          for k in ("n_refs", "n_missing",
                                    "n_docs_affected")}])


MEDIA_FETCH_AUDIT_SQL = _DERIVE_CTE + f""",
m AS (
  SELECT doc_id, media_ref, (off - 1) // 2 AS g
  FROM spans WHERE kind = 'image'
),
miss AS (
  SELECT doc_id, media_ref FROM m
  WHERE (doc_id * 31 + g) % {_FETCH_MOD} = {_FETCH_AT}
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM m) AS n_refs,
       CAST(count(*) AS BIGINT) AS n_missing,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_affected
FROM miss
"""


# --- MMC4-style image<->text assignment over the interleaved payload ---

_ALIGN_MOD = 1_000_003      # similarity modulus (prime)
_ALIGN_MUL = 31


def _span_h64(strs: list) -> np.ndarray:
    """First 8 md5 hex digits as int64 per string — the deterministic
    pseudo-embedding both engines share (same stand-in family as the
    mixture sampler / block-dedup md5 keys; a real CLIP encoder slots
    in behind the same per-span shape)."""
    import hashlib
    return np.fromiter(
        (int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in strs),
        dtype=np.int64, count=len(strs))


def span_media_alignment(sf_dir: str, ds=None):
    """Assign every media span to its best-matching TEXT span within
    the same document — the MMC4 image-to-sentence assignment step
    (Zhu et al. 2023), with similarity sim(i, j) = (h(ref_i) * 31 +
    h(text_j)) mod P over per-span md5 pseudo-embeddings (CLIP absent
    from the sandbox; the per-image argmax with smallest-offset
    tie-break is the real operator shape). Batch-local and complete —
    a doc's spans live in one row, so zero exchange at any scale; the
    per-doc argmax runs as one FLAT (media, text) pair expansion plus
    a single segment argmax — sized by actual pairs, never a padded
    (docs x Tmax) rectangle (one giant doc per block otherwise
    inflates every row; measured 43s -> seconds at the 1M-doc tier).
    Output: (doc_id, media_ref, offset, best_text_off, sim)."""
    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, parent, _ds, kind, text, ref, off = _flat_spans(batch)
        kind_np = kind.to_numpy(zero_copy_only=False)
        off_np = off.to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = len(batch)
        is_txt = kind_np != "image"
        is_med = ~is_txt
        empty = pa.Table.from_pydict(
            {"doc_id": pa.array([], batch.column("doc_id").type),
             "media_ref": pa.array([], pa.string()),
             "offset": pa.array([], pa.int64()),
             "best_text_off": pa.array([], pa.int64()),
             "sim": pa.array([], pa.int64())})
        if not is_med.any():
            return empty
        # hash once per UNIQUE text (dictionary encode): repeated span
        # texts are the common case and the python md5 + string boxing
        # is the batch's dominant cost otherwise
        t_enc = pc.dictionary_encode(
            pc.take(text, pa.array(np.flatnonzero(is_txt))))
        h_txt = _span_h64(t_enc.dictionary.to_pylist())[
            t_enc.indices.to_numpy(zero_copy_only=False)]
        h_med = _span_h64(pc.take(ref, pa.array(np.flatnonzero(is_med)))
                          .to_pylist())
        tdoc = parent[is_txt]
        mdoc = parent[is_med]
        tcnt = np.bincount(tdoc, minlength=n_docs)
        tstart = np.concatenate([[0], np.cumsum(tcnt)[:-1]])
        toff = off_np[is_txt]
        pair_cnt = tcnt[mdoc]             # text spans in media's doc
        total = int(pair_cnt.sum())
        if total == 0:                    # media in text-less docs only
            return empty
        pm = np.repeat(np.arange(len(mdoc)), pair_cnt)
        offs = np.concatenate([[0], np.cumsum(pair_cnt)[:-1]])
        pt = (np.arange(total) - np.repeat(offs, pair_cnt)
              + np.repeat(tstart[mdoc], pair_cnt))
        sim = (h_med[pm] * _ALIGN_MUL + h_txt[pt]) % _ALIGN_MOD
        # per-media argmax with smallest-offset tie-break in ONE O(P)
        # segmented max: composite = sim << 32 | ~offset (offsets are
        # int32 by schema), so the max composite decodes to (max sim,
        # min offset) — no O(P log P) pair sort
        comp = (sim << 32) | (0xFFFFFFFF - toff[pt])
        med_sel = np.flatnonzero(pair_cnt > 0)
        best = np.maximum.reduceat(comp, offs[med_sel])
        return pa.Table.from_pydict({
            "doc_id": pa.array(doc_ids[mdoc[med_sel]],
                               batch.column("doc_id").type),
            "media_ref": pc.take(ref, pa.array(
                np.flatnonzero(is_med)[med_sel])),
            "offset": pa.array(off_np[is_med][med_sel], pa.int64()),
            "best_text_off": pa.array(
                0xFFFFFFFF - (best & 0xFFFFFFFF), pa.int64()),
            "sim": pa.array(best >> 32, pa.int64())})

    if ds is None:
        from .corpus import _n_docs
        if _n_docs(sf_dir) == 0:   # typed empty: schema must survive
            return pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "media_ref": pd.Series(dtype="object"),
                **{c: pd.Series(dtype="int64") for c in
                   ("offset", "best_text_off", "sim")}})
    src = ds if ds is not None else interleaved_docs(sf_dir)
    return src.map_batches(fn, batch_format="pyarrow", batch_size=None)


SPAN_MEDIA_ALIGNMENT_SQL = _DERIVE_CTE + f""",
h AS (
  SELECT doc_id, off, kind, media_ref,
         CAST(('0x' || substr(md5(CASE WHEN kind = 'image'
                                       THEN media_ref ELSE t END),
                              1, 8)) AS BIGINT) AS hv
  FROM spans),
pairs AS (
  SELECT m.doc_id, m.media_ref, m.off AS m_off, x.off AS t_off,
         (m.hv * {_ALIGN_MUL} + x.hv) % {_ALIGN_MOD} AS sim,
         ROW_NUMBER() OVER (
             PARTITION BY m.doc_id, m.off
             ORDER BY (m.hv * {_ALIGN_MUL} + x.hv) % {_ALIGN_MOD} DESC,
                      x.off ASC) AS r
  FROM h m JOIN h x
    ON x.doc_id = m.doc_id AND x.kind <> 'image'
  WHERE m.kind = 'image')
SELECT doc_id, media_ref, CAST(m_off AS BIGINT) AS "offset",
       CAST(t_off AS BIGINT) AS best_text_off, CAST(sim AS BIGINT) AS sim
FROM pairs WHERE r = 1
ORDER BY doc_id, m_off
"""


# --- text-dup / media-conflict audit over the re-crawl union ----------


def _union_interleaved(sf_dir: str):
    """Interleaved derivation over the UNION snapshot (originals plus
    the planted re-crawl copies of the split tier: ``doc_id % 7 == 2``
    reappears under ``doc_id + 500001`` with identical text — see
    textops._RECRAWL_*). Re-crawled media refs embed the NEW doc_id, so
    text-identical docs carry conflicting media — the exact shape an
    interleaved near-dup resolver must adjudicate."""
    from .textops import _RECRAWL_AT, _RECRAWL_BASE, _RECRAWL_MOD

    def with_recrawls(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        again = np.flatnonzero(ids % _RECRAWL_MOD == _RECRAWL_AT)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        aug = pa.Table.from_pydict({
            "doc_id": pa.array(np.concatenate(
                [ids, ids[again] + _RECRAWL_BASE]), pa.int64()),
            "text": pa.concat_arrays([text, text.take(pa.array(again))])})
        return _interleave_rows(aug)

    return (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
            .map_batches(with_recrawls, batch_format="pyarrow"))


def span_dup_media_conflicts(sf_dir: str):
    """Cross-document conflict audit for interleaved dedup: groups of
    >= 2 docs whose TEXT span content (offset-ordered concatenation) is
    identical but whose media refs differ — same page re-crawled with
    re-hosted assets. Per group: member count, per-doc media count
    (min), distinct media refs across the group (> per-doc count
    proves the conflict), and the doc the keep rule selects (most
    media, ties to the smallest doc_id). Runs over the union snapshot
    with the split tier's planted re-crawl layer so the audit has real
    work at every scale.

    Scale shape: per-doc (text-md5 key, media stats, ref hashes) are
    batch-local; the only exchange is the coarse text-key groupby
    moving one bounded row per doc.
    Output: (text_md5, n_docs, n_media_per_doc, n_distinct_refs,
    keep_doc_id)."""
    import hashlib

    from .corpus import _n_docs
    if _n_docs(sf_dir) == 0:       # typed empty: schema must survive
        return pd.DataFrame({
            "text_md5": pd.Series(dtype="object"),
            **{c: pd.Series(dtype="int64") for c in
               ("n_docs", "n_media_per_doc", "n_distinct_refs",
                "keep_doc_id")}})

    def per_doc(batch: pa.Table) -> pa.Table:
        doc_ids, parent, _dsb, kind, text, ref, _off = _flat_spans(batch)
        kind_np = kind.to_numpy(zero_copy_only=False)
        n = len(batch)
        # offset-ordered text concat per doc == the original text: one
        # Arrow binary_join over a rebuilt (doc -> text spans) list
        is_txt = kind_np != "image"
        tdoc = parent[is_txt]
        tcnt = np.bincount(tdoc, minlength=n)
        toffs = np.concatenate([[0], np.cumsum(tcnt)]).astype(np.int32)
        tlist = pa.ListArray.from_arrays(
            pa.array(toffs), pc.take(text, pa.array(
                np.flatnonzero(is_txt))))
        joined = pc.binary_join(tlist, "").to_pylist()
        keys = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                for t in joined]
        n_media = np.bincount(parent[~is_txt], minlength=n) \
            .astype(np.int64)
        refs = ref.to_numpy(zero_copy_only=False)[~is_txt]
        rh = np.fromiter(
            (int(hashlib.md5(r.encode()).hexdigest()[:15], 16)
             for r in refs), dtype=np.int64, count=len(refs))
        ref_lists = np.split(rh, np.cumsum(n_media)[:-1]) \
            if n else []
        return pa.Table.from_pydict({
            "h": pa.array(keys, pa.string()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_media": pa.array(n_media, pa.int64()),
            "ref_h": [list(map(int, r)) for r in ref_lists]})

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for h, grp in g.groupby("h"):
            if len(grp) < 2:
                continue
            grp = grp.sort_values(["n_media", "doc_id"],
                                  ascending=[False, True])
            all_refs = np.concatenate(
                [np.asarray(r, dtype=np.int64)
                 for r in grp["ref_h"]]) if len(grp) else []
            out.append((h, len(grp), int(grp["n_media"].min()),
                        int(len(np.unique(all_refs))),
                        int(grp["doc_id"].iloc[0])))
        return pd.DataFrame(out, columns=[
            "text_md5", "n_docs", "n_media_per_doc", "n_distinct_refs",
            "keep_doc_id"])

    from .corpus import _coarse_str_group
    rows = _union_interleaved(sf_dir) \
        .map_batches(per_doc, batch_format="pyarrow", batch_size=None)
    return _coarse_str_group(rows, "h", per_group).sort("text_md5")


SPAN_DUP_CONFLICTS_SQL = f"""
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS txt FROM documents
  UNION ALL
  SELECT doc_id + 500001, coalesce(text, '') FROM documents
  WHERE doc_id % 7 = 2),
gs AS (
  SELECT doc_id, txt,
         unnest(range(0, CAST(ceil(length(txt) / {_SCHUNK}.0)
                               AS BIGINT))) AS g
  FROM d),
med AS (
  SELECT doc_id,
         'img_' || CAST(doc_id AS VARCHAR) || '_' || CAST(g AS VARCHAR)
             AS ref
  FROM gs WHERE g % {_MEDIA_MOD} = {_MEDIA_AT}),
per_doc AS (
  SELECT d.doc_id, md5(d.txt) AS h,
         CAST(COALESCE(m.cnt, 0) AS BIGINT) AS n_media
  FROM d LEFT JOIN (SELECT doc_id, COUNT(*) AS cnt FROM med
                    GROUP BY doc_id) m USING (doc_id)),
grp AS (
  SELECT h, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(MIN(n_media) AS BIGINT) AS n_media_per_doc
  FROM per_doc GROUP BY h HAVING COUNT(*) >= 2),
refs AS (
  SELECT p.h, CAST(COUNT(DISTINCT m.ref) AS BIGINT) AS nrefs
  FROM per_doc p JOIN med m USING (doc_id) GROUP BY p.h),
keep AS (
  SELECT h, doc_id,
         ROW_NUMBER() OVER (PARTITION BY h
                            ORDER BY n_media DESC, doc_id ASC) AS r
  FROM per_doc)
SELECT g.h AS text_md5, g.n_docs, g.n_media_per_doc,
       CAST(COALESCE(r.nrefs, 0) AS BIGINT) AS n_distinct_refs,
       k.doc_id AS keep_doc_id
FROM grp g
LEFT JOIN refs r ON r.h = g.h
JOIN keep k ON k.h = g.h AND k.r = 1
ORDER BY text_md5
"""


SPANS_QUERIES = {
    "span_dup_media_conflicts": (span_dup_media_conflicts,
                                 SPAN_DUP_CONFLICTS_SQL),
    "span_media_alignment": (span_media_alignment,
                             SPAN_MEDIA_ALIGNMENT_SQL),
    "span_media_context": (span_media_context, SPAN_MEDIA_CONTEXT_SQL),
    "span_section_stats": (span_section_stats, SPAN_SECTION_STATS_SQL),
    "span_caption_pairs": (span_caption_pairs, SPAN_CAPTION_PAIRS_SQL),
    "span_media_gaps": (span_media_gaps, SPAN_MEDIA_GAPS_SQL),
    "docs_interleaved_filter": (docs_interleaved_filter,
                                DOCS_INTERLEAVED_FILTER_SQL),
    "span_dup_texts": (span_dup_texts, SPAN_DUP_TEXTS_SQL),
    "span_line_dedup": (span_line_dedup, SPAN_LINE_DEDUP_SQL),
    "docs_render_interleaved": (docs_render_interleaved,
                                DOCS_RENDER_INTERLEAVED_SQL),
    "packed_interleaved": (packed_interleaved, PACKED_INTERLEAVED_SQL),
    "span_order_audit": (span_order_audit, SPAN_ORDER_AUDIT_SQL),
    "span_lang_mixing": (span_lang_mixing, SPAN_LANG_MIXING_SQL),
    "interleaved_curation_funnel": (interleaved_curation_funnel,
                                    INTERLEAVED_FUNNEL_SQL),
    "media_fetch_audit": (media_fetch_audit, MEDIA_FETCH_AUDIT_SQL),
}
