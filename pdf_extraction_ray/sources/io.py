"""Sources: interleaved-docs readers and adapters.

The canonical input is a Lance table of interleaved documents
(``input_hint``); in environments without the lance reader (this sandbox)
the identical Arrow schema is read from parquet shards — same columns,
same semantics (SURVEY.md §1.4). ``read_docs`` prefers
``ray.data.read_lance`` when available and falls back transparently.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

import ray.data

from ..schema import DOCS_SCHEMA


def read_docs(path: str, **kwargs) -> "ray.data.Dataset":
    """Read an interleaved-docs table (Lance dataset dir or parquet shards).

    Parallelism comes from file sharding — pass a directory of parquet
    shards (``fixtures.ensure_corpus`` layout) or a ``.lance`` dataset.
    """
    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        if hasattr(ray.data, "read_lance"):
            return ray.data.read_lance(path, **kwargs)
        raise RuntimeError("lance reader unavailable; use parquet shards")
    if path.endswith(".pdf"):
        from .pdf import read_pdf_docs
        return read_pdf_docs(path, **kwargs)
    if path.endswith((".html", ".htm")):
        from .html import read_html_docs
        return read_html_docs(path, **kwargs)
    if path.endswith((".warc", ".warc.gz")):
        from .warc import read_warc_docs
        return read_warc_docs(path, **kwargs)
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            if glob.glob(os.path.join(path, "*.pdf")):
                from .pdf import read_pdf_docs
                return read_pdf_docs(path, **kwargs)
            if glob.glob(os.path.join(path, "*.html")):
                from .html import read_html_docs
                return read_html_docs(path, **kwargs)
            if glob.glob(os.path.join(path, "*.warc")) \
                    or glob.glob(os.path.join(path, "*.warc.gz")):
                from .warc import read_warc_docs
                return read_warc_docs(path, **kwargs)
            raise FileNotFoundError(
                f"no parquet shards in {path!r} (generation incomplete or "
                "wrong path?)")
        return ray.data.read_parquet(files, **kwargs)
    return ray.data.read_parquet(path, **kwargs)


def read_table_auto(path: str, **kwargs) -> "ray.data.Dataset":
    """Format-dispatching reader for FLAT tables (``documents``/
    ``events``-style): parquet, JSONL (``.json``/``.jsonl``), or CSV by
    extension — the reference chains stages through JSON files
    (`complete_multimodal_rag_evaluation.py:144-145`,
    `compare_gpt_vs_hybrid.py:24,62`); this is the engine-level analog
    so a pipeline can ingest whichever serialization the upstream stage
    produced. Directories dispatch on their first file's extension."""
    probe = path
    if os.path.isdir(path):
        files = sorted(f for f in glob.glob(os.path.join(path, "*"))
                       if os.path.isfile(f))
        if not files:
            raise FileNotFoundError(f"no files in {path!r}")
        probe = files[0]
    if probe.endswith(".parquet"):
        return ray.data.read_parquet(path, **kwargs)
    if probe.endswith((".json", ".jsonl")):
        return ray.data.read_json(path, **kwargs)
    if probe.endswith(".csv"):
        return ray.data.read_csv(path, **kwargs)
    if probe.endswith(".orc"):
        return read_orc_dir(path, **kwargs)
    if probe.endswith(".arrow"):
        return read_ipc_dir(path, **kwargs)
    raise ValueError(f"unrecognized table format: {probe!r}")


def _json_safe(dt: pa.DataType) -> pa.DataType:
    """The Arrow JSON parser cannot emit fixed_size_list; parse those as
    variable lists and cast back after."""
    if pa.types.is_fixed_size_list(dt):
        return pa.list_(_json_safe(dt.value_type))
    if pa.types.is_list(dt):
        return pa.list_(_json_safe(dt.value_type))
    if pa.types.is_struct(dt):
        return pa.struct([pa.field(f.name, _json_safe(f.type))
                          for f in dt])
    return dt


def read_docs_jsonl(path: str, **kwargs) -> "ray.data.Dataset":
    """Interleaved-docs corpus from JSONL shards. The nested schema
    (span structs, per-span float lists, 4-float bboxes, region line
    structs) is declared EXPLICITLY — JSON inference would type empty
    lists as null and integral floats as int64, breaking the block
    contract downstream. Fixed-size lists (bbox) parse as variable
    lists and cast back per batch."""
    from pyarrow import json as pajson

    parse_schema = pa.schema([pa.field(f.name, _json_safe(f.type))
                              for f in DOCS_SCHEMA])
    ds = ray.data.read_json(
        path,
        parse_options=pajson.ParseOptions(explicit_schema=parse_schema),
        **kwargs)
    return ds.map_batches(lambda b: b.cast(DOCS_SCHEMA),
                          batch_format="pyarrow")


def write_docs(ds: "ray.data.Dataset", path: str, **kwargs) -> None:
    """Write an interleaved-docs Dataset — ``write_lance`` when the
    target is a ``.lance`` path and the writer exists, parquet shards
    otherwise (the symmetric counterpart of ``read_docs``; one file per
    block keeps the output resumable/parallel-readable)."""
    if path.endswith(".lance"):
        if hasattr(ds, "write_lance"):
            ds.write_lance(path, **kwargs)
            return
        raise RuntimeError("lance writer unavailable; use a parquet path")
    ds.write_parquet(path, **kwargs)


def compact_shards(in_path: str, out_path: str,
                   target_rows: int = 100_000) -> int:
    """Small-file compaction: rewrite a directory of parquet shards as
    ~``target_rows``-row files (the maintenance op every long-running
    ingest needs — thousands of tiny commit files destroy read
    parallelism economics and metadata caches at 100 TB). Streaming:
    read -> repartition to ceil(n/target) blocks -> one file per block.
    Row counts come from footers only. Returns the output file count.

    Schema drift across input shards (a column added mid-ingest) is
    unified by the read — missing columns surface as nulls, so the
    compacted output carries ONE schema.
    """
    import math

    import pyarrow.dataset as pads

    n = pads.dataset(in_path).count_rows()
    if n == 0:
        os.makedirs(out_path, exist_ok=True)
        return 0
    blocks = max(1, math.ceil(n / target_rows))
    ray.data.read_parquet(in_path).repartition(blocks) \
        .write_parquet(out_path, min_rows_per_file=min(target_rows, n))
    return len(glob.glob(os.path.join(out_path, "*.parquet")))


def read_orc_dir(path: str, columns: list[str] | None = None,
                 **kwargs) -> "ray.data.Dataset":
    """Distributed ORC reader: one Ray block per file — the same
    file-parallel shape as ``ray.data.read_parquet`` (the driver lists
    paths, each task opens only its own file). ORC is columnar, so
    ``columns`` prunes stripe streams at the read. Ray Data ships no
    ORC datasource; this composes one from ``from_items`` + a per-file
    ``flat_map``-style batch read."""
    from pyarrow import orc as paorc

    files = sorted(glob.glob(os.path.join(path, "*.orc"))) \
        if os.path.isdir(path) else [path]
    if not files:
        raise FileNotFoundError(f"no .orc files in {path!r}")

    def read_file(batch: pa.Table) -> pa.Table:
        tbls = [paorc.ORCFile(f).read(columns=columns)
                for f in batch["path"].to_pylist()]
        return pa.concat_tables(tbls)

    return (ray.data.from_items([{"path": f} for f in files],
                                override_num_blocks=len(files))
            .map_batches(read_file, batch_format="pyarrow",
                         batch_size=None, **kwargs))


def write_orc(ds: "ray.data.Dataset", out_dir: str) -> None:
    """Distributed ORC sink: one file per block (resumable/parallel-
    readable, mirroring ``write_parquet``'s layout). File names carry a
    uuid — content, not naming, is the contract (same as Ray's own
    sinks)."""
    from pyarrow import orc as paorc

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import uuid
        if batch.num_rows:
            paorc.write_table(
                batch, os.path.join(out_dir, f"{uuid.uuid4().hex}.orc"))
        return pa.Table.from_pydict({"rows": [batch.num_rows]})

    # consume via sum so the sink streams (no driver materialization)
    ds.map_batches(write_block, batch_format="pyarrow",
                   batch_size=None).sum("rows")


def read_ipc_dir(path: str, **kwargs) -> "ray.data.Dataset":
    """Distributed Arrow-IPC (Feather v2) reader — file-parallel like
    ``read_orc_dir``. IPC is the zero-parse interchange format between
    Arrow-native engines; memory-maps locally and round-trips every
    Arrow type exactly."""
    from pyarrow import feather

    files = sorted(glob.glob(os.path.join(path, "*.arrow"))) \
        if os.path.isdir(path) else [path]
    if not files:
        raise FileNotFoundError(f"no .arrow files in {path!r}")

    def read_file(batch: pa.Table) -> pa.Table:
        return pa.concat_tables([feather.read_table(f)
                                 for f in batch["path"].to_pylist()])

    return (ray.data.from_items([{"path": f} for f in files],
                                override_num_blocks=len(files))
            .map_batches(read_file, batch_format="pyarrow",
                         batch_size=None, **kwargs))


def write_ipc(ds: "ray.data.Dataset", out_dir: str) -> None:
    """Distributed Arrow-IPC sink: one ``.arrow`` file per block."""
    from pyarrow import feather

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import uuid
        if batch.num_rows:
            feather.write_feather(
                batch, os.path.join(out_dir, f"{uuid.uuid4().hex}.arrow"))
        return pa.Table.from_pydict({"rows": [batch.num_rows]})

    ds.map_batches(write_block, batch_format="pyarrow",
                   batch_size=None).sum("rows")


def text_table_to_docs(batch: pa.Table) -> pa.Table:
    """Adapter: a plain text table (``documents``-style: doc_id, text) ->
    DOCS_SCHEMA interleaved rows. Deterministic byte-stream tokenizer:
    paragraphs split on blank lines, offsets = running paragraph index * 10,
    flat font (10.0) so structure comes from markdown rules; no vector
    geometry. Used by ``entry()`` to run the flagship pipeline over the
    driver's ``documents.parquet``.
    """
    doc_ids = [str(v) for v in batch.column("doc_id").to_pylist()]
    texts = batch.column("text").to_pylist()
    rows = []
    for doc_id, text in zip(doc_ids, texts):
        paras = [p for p in (text or "").split("\n\n")]
        spans, fonts, pages, links, bboxes = [], [], [], [], []
        n = max(len(paras), 1)
        for k, p in enumerate(paras):
            spans.append({"kind": "text", "text": p, "media_ref": "",
                          "offset": 10 * k})
            fonts.append(10.0)
            pages.append(1)
            links.append(0.0)
            y = k / n
            bboxes.append([0.1, float(y), 0.9, float(min(1.0, y + 0.8 / n))])
        rows.append({"doc_id": doc_id, "spans": spans, "font_size": fonts,
                     "page": pages, "link_density": links, "bbox": bboxes,
                     "regions": [], "n_pages": 1})
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def dataset_from_text_table(path: str, **kwargs) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"], **kwargs)
    return ds.map_batches(text_table_to_docs, batch_format="pyarrow")
