"""Flagship extraction pipeline (rebuild of the reference's hybrid
lifecycle, SURVEY.md §3.1, as a streaming Ray Data pipeline):

    read_docs(...)                                   # (doc_id, spans, meta)
      .map_batches(classify_spans,  pyarrow)         # stateless tokenizer
      .map_batches(LayoutParser,    pyarrow, actors) # stateful layout parse
      .map_batches(reassemble_spans, pyarrow)        # ordered span emission
      [.write_parquet(out/...)]                      # resumable sink

Every stage is doc-local — no shuffle anywhere on the hot path. Skew from
pathological multi-hundred-page docs is bounded by per-batch row caps
(small ``batch_size``) plus Ray Data's dynamic block splitting; the input
is sharded at the source so the streaming executor pipelines read →
classify → layout → reassemble with backpressure.
"""

from __future__ import annotations

from ray.data import Dataset

from ..sources.io import read_docs
from ..stages.tokenize import classify_spans
from ..stages.layout import LayoutParser, layout_parse
from ..stages.reassemble import reassemble_spans


def spread_skew(ds: Dataset) -> Dataset:
    """Skew control (SURVEY.md §4): de-cluster pathological
    multi-hundred-page docs by re-ordering the corpus on a uniform
    doc-id hash, so every downstream block carries a fair share of the
    giant tail instead of whole blocks of giants serializing on a few
    workers (the "book dump" shape: one input shard holding all the
    giants).

    Design note, from measurement (bench.py --skew): the textbook
    giants-FIRST sort is an anti-pattern under Ray Data's block
    scheduling — ordering by size CLUSTERS the giants into a handful of
    consecutive blocks, concentrating ~80% of the page mass on 2-3
    tasks; it measured 17x slower than no bucketing on a 50k-doc/1%
    -giant corpus. Under streaming execution with backpressure, workers
    stay fed until the input exhausts, so scheduling giants early buys
    nothing; what matters is that no single block is giant-heavy, which
    the uniform-hash re-order guarantees (~Poisson giants per block).

    This is a full payload shuffle — apply it only when the input is
    actually clustered AND per-doc compute is heavy enough that the
    straggler outweighs one exchange (``decide_skew_bucketing`` models
    exactly that; the resumable runner gets a similar effect for free
    from largest-shard-first dispatch)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def add_spread(batch: pa.Table) -> pa.Table:
        spread = pd.util.hash_array(
            batch["doc_id"].to_numpy(zero_copy_only=False)
            .astype(object)).view(np.int64)
        return batch.append_column("_spread", pa.array(spread))

    return ds.map_batches(add_spread, batch_format="pyarrow") \
             .sort("_spread") \
             .drop_columns(["_spread"])


# kept for callers of the old name; semantics are the spread re-order
bucket_by_size = spread_skew


def skew_profile(input_path: str) -> dict:
    """Cheap distributed pre-pass for the auto-bucketing decision: reads
    ONLY the ``n_pages`` int32 column (column-pruned at the parquet
    reader), reduces per-block partials (docs, pages, giant docs/pages,
    max) to one tiny row each, and sums them on the driver — the driver
    never sees per-doc data, so this holds at 10^12 docs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        # one partial row per input FILE (not per block: the tiny
        # one-column read coalesces files differently than the real
        # payload read does; the file is the stable clustering unit)
        n = batch["n_pages"].to_numpy(zero_copy_only=False).astype(np.int64)
        paths = batch["path"].to_numpy(zero_copy_only=False)
        rows = []
        for p in np.unique(paths):
            m = n[paths == p]
            giant = m >= GIANT_PAGES
            rows.append({"docs": len(m), "pages": int(m.sum()),
                         "giant_docs": int(giant.sum()),
                         "giant_pages": int(m[giant].sum()),
                         "max_pages": int(m.max()) if len(m) else 0,
                         "path": str(p)})
        return pa.Table.from_pylist(rows)

    parts = (rd.read_parquet(input_path, columns=["n_pages"],
                             include_paths=True)
             .map_batches(partial, batch_format="pyarrow", batch_size=None)
             .to_pandas())
    if parts.empty:
        return {"docs": 0, "pages": 0, "giant_docs": 0, "giant_pages": 0,
                "max_pages": 0, "max_file_pages": 0, "n_files": 0}
    # a file can straddle blocks: re-sum per path before the max
    per_file = parts.groupby("path")["pages"].sum()
    out = {c: int(parts[c].sum()) for c in
           ("docs", "pages", "giant_docs", "giant_pages")}
    out["max_pages"] = int(parts["max_pages"].max())
    # per-file page mass exposes CLUSTERING (one input shard holding
    # all the giants), which is what the spread re-order actually fixes
    out["max_file_pages"] = int(per_file.max())
    out["n_files"] = int(len(per_file))
    return out


GIANT_PAGES = 200        # a doc this long counts toward the heavy tail
GIANT_TAIL_SHARE = 0.05  # giants holding >=5% of page mass have a real tail
# measured exchange throughput of the spread re-order on this engine
# (50k-doc/1% giant corpus, 32 CPUs: ~570k pages re-ordered in ~9 s)
SORT_PAGES_PER_SEC_PER_CPU = 2_000.0
# measured per-page cost of the full light chain (read -> classify ->
# layout -> reassemble -> write) at 32 CPUs: 4.7 s x 32 / 572k pages.
# Callers with heavy model stages (real OCR/VLM) pass their measured
# per-page seconds instead.
DEFAULT_SEC_PER_PAGE = 250e-6


def decide_skew_bucketing(input_path: str, *,
                          sec_per_page: float = DEFAULT_SEC_PER_PAGE,
                          cluster_cpus: int | None = None) -> bool:
    """Auto skew policy (SURVEY.md §4), a measured cost model — NOT
    "spread whenever a tail exists": the spread re-order is a full
    payload exchange, so it pays only when the serialized hot-file
    work it breaks up exceeds the exchange's own cost. Validated
    against the bench.py --skew 2x2 grid (BASELINE.md): iid giants
    light/heavy -> False/False (spread measured 0.35x/0.70x — a pure
    loss), clustered giants light/heavy -> True/True (spread measured
    2.5x/7.2x wins). It enables when BOTH hold:

    (a) the giant tail is real (giants >= GIANT_PAGES pages hold >=
        GIANT_TAIL_SHARE of page mass) and CLUSTERED — one input
        file's page mass far exceeds the even share, the "book dump"
        shape ``skew_profile``'s per-file partials expose. An iid
        giant corpus needs no spread: every block already carries
        ~Poisson(giant_frac x rows) giants.
    (b) the serialized hot-file work (max_file_pages x sec_per_page)
        exceeds the ideal parallel share plus the exchange's estimated
        cost. ``sec_per_page`` defaults to the measured light-chain
        cost; real OCR/VLM model stages (~0.1-1 s/page) pass their
        measured value and flip the decision at far milder
        clustering."""
    p = skew_profile(input_path)
    if p["pages"] == 0 or p["giant_pages"] / p["pages"] < GIANT_TAIL_SHARE:
        return False
    if cluster_cpus is None:
        from ..functions.cluster import cluster_cpus as _cc
        cluster_cpus = _cc()
    ncpu = max(cluster_cpus, 1)
    exchange_sec = p["pages"] / (SORT_PAGES_PER_SEC_PER_CPU * ncpu)
    straggler_sec = p["max_file_pages"] * sec_per_page
    ideal_sec = p["pages"] * sec_per_page / ncpu
    return straggler_sec - ideal_sec > exchange_sec


def extract_pipeline(ds: Dataset, *, batch_size: int = 256,
                     layout_mode: str = "tasks",
                     skew_bucketing: bool = False,
                     layout_concurrency=None,
                     layout_num_gpus: float | None = None,
                     layout_resources: dict | None = None) -> Dataset:
    """Wire the three extraction stages onto an interleaved-docs Dataset.

    ``batch_size`` is rows (documents) per batch — kept modest because one
    row can hold a pathological multi-hundred-page doc.

    ``layout_mode``:

    - ``"tasks"`` (default): the layout parser runs as elastic tasks with
      per-worker-process cached state. Ray fuses the whole chain
      (classify -> layout -> reassemble -> sink) into one task stage —
      zero inter-stage transfer, near-linear scaling. Right for light
      parser state (compiled patterns, stub OCR).
    - ``"actors"``: a FIXED-size actor pool (``concurrency=(k, k)``,
      k = usable CPUs via ``fixed_heavy_pool``) — parser/model state
      built once per actor in ``__init__``. Right when state is heavy
      (real OCR/layout model weights) or concurrency must be bounded
      (rate-limited clients). Fixed, not autoscaling, by default:
      ``bench.py --actors`` measured autoscale (1, 30) ramping to only
      4 actors on a 14 s job with 2 s init — a fixed pool of 8 was 2x
      faster; since actors pay init concurrently, wall ~= init + work/k
      is monotone in k. Pass ``layout_concurrency=(min, max)`` to get
      an autoscaling pool back. Measurably slower to dispatch than
      tasks for sub-millisecond-per-doc work, so not the overall
      default here.

    ``layout_num_gpus`` / ``layout_resources`` (actors mode only): the
    GPU fraction / custom-resource claim each layout actor schedules
    against — how a real OCR/layout model pins its device (SURVEY
    T3/T8; reference env-pins CUDA at
    hybrid_docling_gpt4_processor.py:111-112). Default off.
    """
    if skew_bucketing:
        ds = spread_skew(ds)
    ds = ds.map_batches(classify_spans, batch_format="pyarrow",
                        batch_size=batch_size)
    if layout_mode == "tasks":
        ds = ds.map_batches(layout_parse, batch_format="pyarrow",
                            batch_size=batch_size)
    else:
        if layout_concurrency is None:
            from ..functions.cluster import fixed_heavy_pool
            layout_concurrency = fixed_heavy_pool()
        from ..functions.cluster import accel_remote_args
        ds = ds.map_batches(LayoutParser, batch_format="pyarrow",
                            batch_size=batch_size,
                            concurrency=layout_concurrency,
                            num_cpus=1,
                            **accel_remote_args(layout_num_gpus,
                                                layout_resources))
    return ds.map_batches(reassemble_spans, batch_format="pyarrow",
                          batch_size=batch_size)


def run_extract(input_path: str, output_path: str | None = None,
                **kwargs) -> Dataset:
    if kwargs.get("skew_bucketing") == "auto":
        kwargs["skew_bucketing"] = decide_skew_bucketing(input_path)
    out = extract_pipeline(read_docs(input_path), **kwargs)
    if output_path is not None:
        out.write_parquet(output_path)
    return out


def safe_extract_pipeline(ds: Dataset, *, batch_size: int = 256,
                          kernel=None) -> Dataset:
    """Error-as-data variant of the streaming path (SURVEY.md §4: one
    poisoned document must never fail the job — the reference's
    per-page failure counters generalized,
    gpt4_comprehensive_visual_processor.py:411-421).

    Each batch runs the fused kernel; on failure it falls back to
    per-document execution and emits error rows (empty spans +
    status/error columns) for exactly the documents that fail. Output =
    OUT_SCHEMA + (status: string, error: string).

    ``kernel`` (a DOCS_SCHEMA table -> OUT_SCHEMA table callable)
    defaults to the real three-stage chain; tests inject failing kernels.
    """
    import pyarrow as pa

    from ..schema import SPAN_STRUCT
    from ..stages.layout import layout_parse

    if kernel is None:
        def kernel(t: pa.Table) -> pa.Table:
            return reassemble_spans(layout_parse(classify_spans(t)))

    def _finish(out: pa.Table, status: list[str], errors: list[str]) -> pa.Table:
        return (out.append_column("status", pa.array(status, type=pa.string()))
                   .append_column("error", pa.array(errors, type=pa.string())))

    def safe(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        try:
            out = kernel(batch)
            return _finish(out, ["ok"] * len(out), [""] * len(out))
        except Exception:
            pass
        # isolate: one doc at a time; failures become rows, not raises
        parts, status, errors = [], [], []
        for i in range(len(batch)):
            row = batch.slice(i, 1)
            try:
                parts.append(kernel(row))
                status.append("ok")
                errors.append("")
            except Exception as e:          # error-as-data
                parts.append(pa.Table.from_arrays(
                    [row.column("doc_id"),
                     pa.array([[]], type=pa.list_(SPAN_STRUCT))],
                    names=["doc_id", "spans"]))
                status.append("error")
                errors.append(repr(e)[:500])
        return _finish(pa.concat_tables(parts), status, errors)

    return ds.map_batches(safe, batch_format="pyarrow", batch_size=batch_size)
