"""CLI entry point (SURVEY.md §2.11 rebuild of the reference's per-script
argparse mains)::

    python -m pdf_extraction_ray.run --input <docs dir> --output <dir> \
        [--pipeline extract|resumable|analysis] [--limit N] \
        [--run-id RUN] [--num-cpus N] [--skew-bucketing]

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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pdf_extraction_ray.run")
    p.add_argument("--input", required=True, help="interleaved-docs dir (parquet shards or .lance)")
    p.add_argument("--output", required=True)
    p.add_argument("--pipeline", default="extract",
                   choices=["extract", "resumable", "analysis"])
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--run-id", default="run0")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--skew-bucketing", action="store_true")
    args = p.parse_args(argv)

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
    if args.pipeline == "resumable":
        for flag, val in (("--limit", args.limit),
                          ("--skew-bucketing", args.skew_bucketing or None)):
            if val is not None:
                print(f"warning: {flag} is ignored by --pipeline resumable",
                      file=sys.stderr)
        stats = run_extract_resumable(args.input, args.output,
                                      run_id=args.run_id)
    else:
        if args.pipeline == "analysis" and args.skew_bucketing:
            print("warning: --skew-bucketing is ignored by --pipeline "
                  "analysis", file=sys.stderr)
        ds = read_docs(args.input)
        if args.limit is not None:
            ds = ds.limit(args.limit)
        if args.pipeline == "analysis":
            from .pipelines.analysis import analysis_pipeline
            out = analysis_pipeline(ds, batch_size=args.batch_size)
        else:
            out = extract_pipeline(ds, batch_size=args.batch_size,
                                   skew_bucketing=args.skew_bucketing)
        out.write_parquet(args.output)
        stats = {"rows": "written"}
    print(json.dumps({"pipeline": args.pipeline, "output": args.output,
                      "sec": round(time.perf_counter() - t0, 2), **stats}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
