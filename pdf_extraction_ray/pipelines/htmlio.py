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

from .corpus import _typed_empty_on_no_docs

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


@_typed_empty_on_no_docs(doc_id='int64', n_spans='int64', n_title='int64', n_list='int64', n_para='int64', n_chars='int64')
def html_ingest_extract(sf_dir: str) -> pd.DataFrame:
    """documents -> HTML files -> DOM parse -> extract -> class counts."""
    from .pdfio import _ingest_counts
    html_dir = ensure_html_render(sf_dir)
    return _ingest_counts(extract_pipeline(read_html_docs(html_dir)))


# ---------------------------------------------------------------------------
# WARC containers: the crawl-scale packaging of the same web entry point
# ---------------------------------------------------------------------------

_WARC_DOCS_PER_FILE = 128
_WARC_RENDER_VERSION = 1

WARC_INGEST_SQL = PDF_INGEST_SQL


def ensure_warc_render(sf_dir: str,
                       root: str = "/tmp/pdfxr_fixtures") -> str:
    """Render (once, cached) ``{sf_dir}/documents.parquet`` into
    multi-document ``.warc.gz`` containers (the CommonCrawl packaging:
    gzip member per record, 128 docs per container). A container must
    be written WHOLE by one task (read batches don't align to doc-id
    ranges), so the render is one container-keyed groupby exchange —
    each group writes exactly its own ``part-N.warc.gz`` (atomic
    tmp+rename), making the layout deterministic, parallel and
    resumable."""
    from ..sources.warc import write_warc_file

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    path = os.path.join(root, f"warcingest-v{_WARC_RENDER_VERSION}-{key}")
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)

    def tag_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        part = pc.divide(pc.cast(batch.column("doc_id"), pa.int64()),
                         _WARC_DOCS_PER_FILE)
        return batch.append_column("_part", pc.cast(part, pa.int64()))

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", key=lambda s: s.astype("int64"))
        part = int(g["_part"].iloc[0])
        rows = _render_rows(pa.Table.from_pandas(
            g.drop(columns="_part"), preserve_index=False))
        n = write_warc_file(
            rows, os.path.join(path, f"part-{part:06d}.warc.gz"))
        return pd.DataFrame({"n": [n]})

    (ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
     .map_batches(tag_part, batch_format="pyarrow")
     .groupby("_part")
     .map_groups(write_group, batch_format="pandas")
     .sum("n"))
    with open(done, "w") as f:
        f.write(sf_dir + "\n")
    return path


@_typed_empty_on_no_docs(doc_id='int64', n_spans='int64', n_title='int64', n_list='int64', n_para='int64', n_chars='int64')
def warc_ingest_extract(sf_dir: str) -> pd.DataFrame:
    """documents -> WARC containers -> record scan -> DOM parse ->
    extract -> class counts. Same oracle as the PDF/HTML slices, so the
    driver's rows+schema+hash gate covers WARC framing, per-record gzip
    members, HTTP status/content-type filtering, and the markup round
    trip in one check."""
    from ..sources.warc import read_warc_docs
    from .pdfio import _ingest_counts
    warc_dir = ensure_warc_render(sf_dir)
    return _ingest_counts(extract_pipeline(read_warc_docs(warc_dir)))


# ---------------------------------------------------------------------------
# End-to-end web curation funnel: raw markup files in, training docs out
# ---------------------------------------------------------------------------

FUNNEL_MIN_SPANS = 2
FUNNEL_MIN_CHARS = 200
FUNNEL_BUDGET_CHARS = 40_000
_FUNNEL_BUCKETS = 64


@_typed_empty_on_no_docs(doc_id='int64', n_spans='int64', n_chars='int64', cum_chars='int64')
def web_curation_funnel(sf_dir: str) -> pd.DataFrame:
    """The north-star demo as ONE oracled query — documents-in,
    training-set-out, every stage distributed:

        real .html files (ensure_html_render)
          -> read_html_docs (read_binary_files + DOM parse tasks)
          -> flagship extract (classify/layout/reassemble)
          -> per-doc reassembly: doc_text = kept span texts joined by
             newline in offset order (doc-local, vectorized flatten)
          -> quality gate: n_spans >= FUNNEL_MIN_SPANS and
             n_chars >= FUNNEL_MIN_CHARS
          -> exact dedup: md5(doc_text)-keyed coarse exchange, min
             doc_id survives
          -> char-budget selection: maximal doc_id-ordered prefix with
             cumulative chars <= FUNNEL_BUDGET_CHARS, via doc_id-range
             bucket partials (the driver folds 64 ints, never rows —
             docs_token_budget_select's pattern)

    The DuckDB oracle recomputes the whole funnel from raw text
    through the deterministic render, so one rows+schema+hash gate
    covers markup round trip, extraction, reassembly, gating, dedup,
    and selection together. Output: (doc_id, n_spans, n_chars,
    cum_chars)."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc

    import ray.data as rd

    from ..functions.arrow_utils import as_array, list_offsets

    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("doc_id", "n_spans", "n_chars", "cum_chars")})
    html_dir = ensure_html_render(sf_dir)
    out = extract_pipeline(read_html_docs(html_dir))

    import pyarrow.dataset as pads
    n_docs = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    if n_docs == 0:
        return empty

    def doc_stats(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        spans = batch.column("spans")
        offs = list_offsets(spans)
        texts = as_array(pc.struct_field(
            as_array(pc.list_flatten(spans)), "text")) \
            .to_numpy(zero_copy_only=False)
        ids = pc.cast(batch.column("doc_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rows = {"doc_id": [], "n_spans": [], "n_chars": [], "h": []}
        for i in range(len(batch)):
            n = int(offs[i + 1] - offs[i])
            if n < FUNNEL_MIN_SPANS:
                continue
            doc_text = "\n".join(texts[offs[i]:offs[i + 1]])
            if len(doc_text) < FUNNEL_MIN_CHARS:
                continue
            rows["doc_id"].append(int(ids[i]))
            rows["n_spans"].append(n)
            rows["n_chars"].append(len(doc_text))
            rows["h"].append(int.from_bytes(
                hashlib.md5(doc_text.encode("utf-8")).digest()[:8],
                "big", signed=True))
        t = pa.Table.from_pydict(rows)
        return t.cast(pa.schema([("doc_id", pa.int64()),
                                 ("n_spans", pa.int64()),
                                 ("n_chars", pa.int64()),
                                 ("h", pa.int64())]))

    from ..functions.cluster import default_n_coarse
    n_coarse = default_n_coarse()

    def tag(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_c", pa.array((h % n_coarse).astype(np.int64)))

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        keep = g["doc_id"] == g.groupby("h")["doc_id"].transform("min")
        return g[keep].drop(columns=["_c", "h"])

    survivors = (out.map_batches(doc_stats, batch_format="pyarrow")
                 .map_batches(tag, batch_format="pyarrow",
                              batch_size=None)
                 .groupby("_c")
                 .map_groups(dedup_group, batch_format="pandas")
                 .materialize())

    # doc_id-range buckets -> per-bucket char sums -> driver folds 64
    # ints into cumulative offsets -> per-bucket exact running totals
    def bucket_of(ids: np.ndarray) -> np.ndarray:
        return np.minimum(ids * _FUNNEL_BUCKETS // n_docs,
                          _FUNNEL_BUCKETS - 1).astype(np.int64)

    def sum_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hist = np.bincount(
            bucket_of(ids),
            weights=batch["n_chars"].to_numpy(zero_copy_only=False),
            minlength=_FUNNEL_BUCKETS).astype(np.int64)
        return pa.Table.from_pydict({"hist": [hist.tobytes()]})

    hist = np.zeros(_FUNNEL_BUCKETS, dtype=np.int64)
    for b in survivors.map_batches(sum_partial, batch_format="pyarrow",
                                   batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for part in b["hist"].to_pylist():
            hist += np.frombuffer(part, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(hist)[:-1]])

    def select_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        base = int(offsets[int(g["_b"].iloc[0])])
        g = g.drop(columns="_b")
        g["cum_chars"] = base + g["n_chars"].cumsum()
        return g[g["cum_chars"] <= FUNNEL_BUDGET_CHARS]

    def tag_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("_b", pa.array(bucket_of(ids)))

    sel = (survivors.map_batches(tag_bucket, batch_format="pyarrow",
                                 batch_size=None)
           .groupby("_b")
           .map_groups(select_group, batch_format="pandas")
           .to_pandas())
    if sel.empty:
        return empty
    return sel.sort_values("doc_id").reset_index(drop=True) \
        .astype({c: "int64" for c in
                 ("doc_id", "n_spans", "n_chars", "cum_chars")})


from .pdfio import _CHUNK, _HEAD_EVERY, _LIST_EVERY, _WS_SET  # noqa: E402

WEB_FUNNEL_SQL = f"""
WITH gs AS (
  SELECT doc_id, coalesce(text, '') AS txt,
         unnest(range(0, CAST(ceil(length(coalesce(text, ''))
                                   / {_CHUNK}.0) AS BIGINT))) AS g
  FROM documents
),
chunks AS (
  SELECT doc_id, g,
         trim(CASE WHEN g % {_HEAD_EVERY} = 5 THEN '## '
                   WHEN g % {_LIST_EVERY} = 3 THEN '- '
                   ELSE '' END
              || substring(txt, 1 + {_CHUNK} * CAST(g AS INT), {_CHUNK}),
              {_WS_SET}) AS t
  FROM gs
),
kept AS (SELECT doc_id, g, t FROM chunks WHERE t <> ''),
doc AS (SELECT doc_id,
               string_agg(t, chr(10) ORDER BY g) AS doc_text,
               CAST(count(*) AS BIGINT) AS n_spans
        FROM kept GROUP BY doc_id),
q AS (SELECT doc_id, n_spans,
             CAST(length(doc_text) AS BIGINT) AS n_chars, doc_text
      FROM doc
      WHERE n_spans >= {FUNNEL_MIN_SPANS}
        AND length(doc_text) >= {FUNNEL_MIN_CHARS}),
d AS (SELECT doc_id, n_spans, n_chars,
             min(doc_id) OVER (PARTITION BY md5(doc_text)) AS rep
      FROM q),
s AS (SELECT doc_id, n_spans, n_chars,
             CAST(SUM(n_chars) OVER (ORDER BY doc_id) AS BIGINT)
                 AS cum_chars
      FROM d WHERE doc_id = rep)
SELECT doc_id, n_spans, n_chars, cum_chars
FROM s WHERE cum_chars <= {FUNNEL_BUDGET_CHARS}
ORDER BY doc_id
"""


HTMLIO_QUERIES: dict[str, tuple] = {
    "html_ingest_extract": (html_ingest_extract, HTML_INGEST_SQL),
    "warc_ingest_extract": (warc_ingest_extract, WARC_INGEST_SQL),
    "web_curation_funnel": (web_curation_funnel, WEB_FUNNEL_SQL),
}
