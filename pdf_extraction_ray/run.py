"""CLI entry point (SURVEY.md §2.11 rebuild of the reference's per-script
argparse mains)::

    python -m pdf_extraction_ray.run --input <docs dir> --output <dir> \
        [--pipeline extract|resumable|analysis] [--limit N] \
        [--run-id RUN] [--num-cpus N] [--skew-bucketing [on|off|auto]]

    # run any registered query over an sf-style table dir -> parquet
    python -m pdf_extraction_ray.run --query <name> --input <sf dir> \
        --output <dir> [--num-cpus N]
    python -m pdf_extraction_ray.run --list-queries

On a cluster this is the payload of ``ray job submit -- python -m
pdf_extraction_ray.run ...``; locally it owns its Ray session (guarded
init + shutdown — the only CLI-owned session besides bench.py and the
test fixture).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _query_registry() -> dict:
    from .registry import all_queries
    return {name: fn for name, (fn, _sql) in all_queries().items()}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pdf_extraction_ray.run")
    p.add_argument("--input", help="interleaved-docs dir (parquet shards or .lance); for --query, the sf-style table dir")
    p.add_argument("--output")
    p.add_argument("--pipeline", default="extract",
                   choices=["extract", "resumable", "analysis"])
    p.add_argument("--query", default=None,
                   help="run one registered query over --input to --output")
    p.add_argument("--list-queries", action="store_true")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--run-id", default="run0")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--skew-bucketing", nargs="?", const="on", default="off",
                   choices=["on", "off", "auto"],
                   help="spread re-order for clustered giant-doc skew; "
                        "'auto' runs the cheap n_pages pre-pass cost "
                        "model (--sec-per-page declares per-page stage "
                        "cost; default = measured light-chain cost)")
    p.add_argument("--sec-per-page", type=float, default=None)
    p.add_argument("--compact", action="store_true",
                   help="compact --input's small parquet shards into "
                        "~--target-rows files at --output")
    p.add_argument("--target-rows", type=int, default=100_000)
    p.add_argument("--stats", action="store_true",
                   help="with --query: print the executed Dataset's "
                        "per-stage ds.stats() profile to stderr")
    p.add_argument("--span-op", default=None,
                   help="run a batch-local span analytics op directly "
                        "over --input as a REAL (doc_id, spans) table "
                        "(parquet shards or .lance), bypassing the "
                        "sf-table derivation; see pipelines.spans")
    args = p.parse_args(argv)

    if args.list_queries:
        print("\n".join(sorted(_query_registry())))
        return 0
    if not args.input or not args.output:
        p.error("--input and --output are required")

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from .sources.io import read_docs
    from .pipelines.extract import extract_pipeline
    from .pipelines.resumable import run_extract_resumable

    t0 = time.perf_counter()
    if args.compact:
        from .sources.io import compact_shards
        n_files = compact_shards(args.input, args.output,
                                 target_rows=args.target_rows)
        print(json.dumps({"compacted_to_files": n_files,
                          "output": args.output,
                          "sec": round(time.perf_counter() - t0, 2)}))
        ray.shutdown()
        return 0
    if args.span_op is not None:
        from .pipelines import spans as _spans
        ops = {n: getattr(_spans, n) for n in
               ("span_media_context", "span_section_stats",
                "span_caption_pairs", "span_media_gaps",
                "docs_interleaved_filter", "docs_render_interleaved",
                "packed_interleaved", "span_lang_mixing")}
        if args.span_op not in ops:
            print(f"unknown span op {args.span_op!r} "
                  f"(one of {sorted(ops)})", file=sys.stderr)
            ray.shutdown()
            return 2
        res = ops[args.span_op](None, ds=read_docs(args.input))
        res.write_parquet(args.output)
        if args.stats:
            print(res.stats(), file=sys.stderr)
        print(json.dumps({"span_op": args.span_op,
                          "output": args.output,
                          "sec": round(time.perf_counter() - t0, 2)}))
        ray.shutdown()
        return 0
    if args.query is not None:
        reg = _query_registry()
        if args.query not in reg:
            print(f"unknown query {args.query!r} (see --list-queries)",
                  file=sys.stderr)
            ray.shutdown()
            return 2
        res = reg[args.query](args.input)
        if hasattr(res, "write_parquet"):          # Ray Dataset
            res.write_parquet(args.output)
            n = "written"
            if args.stats:                         # post-execution profile
                print(res.stats(), file=sys.stderr)
        else:                                      # small pandas result
            import os
            os.makedirs(args.output, exist_ok=True)
            res.to_parquet(f"{args.output}/part-0.parquet", index=False)
            n = len(res)
            if args.stats:
                print(f"(driver-finalized result: {n} rows; no Dataset "
                      "stats)", file=sys.stderr)
        print(json.dumps({"query": args.query, "output": args.output,
                          "sec": round(time.perf_counter() - t0, 2),
                          "rows": n}))
        ray.shutdown()
        return 0
    if args.pipeline == "resumable":
        for flag, val in (("--limit", args.limit),
                          ("--skew-bucketing",
                           None if args.skew_bucketing == "off"
                           else args.skew_bucketing)):
            if val is not None:
                print(f"warning: {flag} is ignored by --pipeline resumable",
                      file=sys.stderr)
        stats = run_extract_resumable(args.input, args.output,
                                      run_id=args.run_id)
    else:
        if args.pipeline == "analysis" and args.skew_bucketing != "off":
            print("warning: --skew-bucketing is ignored by --pipeline "
                  "analysis", file=sys.stderr)
        bucketing = args.skew_bucketing == "on"
        if args.skew_bucketing == "auto":
            from .pipelines.extract import decide_skew_bucketing
            kw = {} if args.sec_per_page is None else \
                {"sec_per_page": args.sec_per_page}
            bucketing = decide_skew_bucketing(args.input, **kw)
            print(f"auto skew bucketing: {bucketing}", file=sys.stderr)
        ds = read_docs(args.input)
        if args.limit is not None:
            ds = ds.limit(args.limit)
        if args.pipeline == "analysis":
            from .pipelines.analysis import analysis_pipeline
            out = analysis_pipeline(ds, batch_size=args.batch_size)
        else:
            out = extract_pipeline(ds, batch_size=args.batch_size,
                                   skew_bucketing=bucketing)
        out.write_parquet(args.output)
        stats = {"rows": "written"}
    print(json.dumps({"pipeline": args.pipeline, "output": args.output,
                      "sec": round(time.perf_counter() - t0, 2), **stats}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
