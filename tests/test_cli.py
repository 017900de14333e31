"""CLI surface: `python -m pdf_extraction_ray.run` end-to-end in its own
process (owns its Ray session, as `ray job submit` would)."""

import glob
import json
import subprocess
import sys

import pyarrow.parquet as pq

from pdf_extraction_ray.fixtures import ensure_corpus


def _run(args, timeout=300):
    r = subprocess.run([sys.executable, "-m", "pdf_extraction_ray.run", *args],
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])

def test_cli_extract_and_resumable(tmp_path):
    corpus = ensure_corpus("cli", 5, 120, shard_rows=40)

    out = _run(["--input", corpus, "--output", str(tmp_path / "x"),
                "--num-cpus", "4"])
    assert out["pipeline"] == "extract"
    n = sum(pq.read_metadata(f).num_rows
            for f in glob.glob(str(tmp_path / "x") + "/*.parquet"))
    assert n == 120

    out = _run(["--input", corpus, "--output", str(tmp_path / "r"),
                "--pipeline", "resumable", "--num-cpus", "4"])
    assert out["processed"] == 3 and out["errors"] == 0


def test_cli_query_mode(tmp_path):
    out = _run(["--query", "doc_token_stats",
                "--input", "/root/testdata/sf0.001",
                "--output", str(tmp_path / "q"), "--num-cpus", "4"])
    assert out["query"] == "doc_token_stats"
    n = sum(pq.read_metadata(f).num_rows
            for f in glob.glob(str(tmp_path / "q") + "/*.parquet"))
    assert n == 500


def test_cli_query_stats(tmp_path):
    r = subprocess.run([sys.executable, "-m", "pdf_extraction_ray.run",
                        "--query", "q1_pricing_summary",
                        "--input", "/root/testdata/sf0.001",
                        "--output", str(tmp_path / "q"),
                        "--num-cpus", "4", "--stats"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    # the per-operator profile lands on stderr, result JSON on stdout
    assert "Operator" in r.stderr and "wall time" in r.stderr
    assert json.loads(r.stdout.strip().splitlines()[-1])["rows"] == "written"


def test_cli_list_queries():
    r = subprocess.run([sys.executable, "-m", "pdf_extraction_ray.run",
                        "--list-queries"], capture_output=True, text=True,
                       timeout=120)
    assert r.returncode == 0
    names = r.stdout.split()
    assert "q1_pricing_summary" in names and "packed_sequences" in names


def test_cli_unknown_query(tmp_path):
    r = subprocess.run([sys.executable, "-m", "pdf_extraction_ray.run",
                        "--query", "nope", "--input", "/root/testdata/sf0.001",
                        "--output", str(tmp_path / "n")],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_cli_compact(tmp_path):
    import pandas as pd
    src = tmp_path / "tiny"
    src.mkdir()
    for i in range(30):
        pd.DataFrame({"doc_id": [i], "text": [f"t{i}"]}) \
            .to_parquet(src / f"p{i:02d}.parquet")
    out = _run(["--compact", "--input", str(src),
                "--output", str(tmp_path / "c"), "--target-rows", "10",
                "--num-cpus", "4"])
    assert 1 <= out["compacted_to_files"] <= 4
    n = sum(pq.read_metadata(f).num_rows
            for f in glob.glob(str(tmp_path / "c") + "/*.parquet"))
    assert n == 30


def test_cli_span_op_over_real_table(tmp_path):
    # run a span analytics op directly over a real (doc_id, spans)
    # table — the flagship fixtures corpus — via --span-op
    corpus = ensure_corpus("cli", 5, 120, shard_rows=40)
    out = _run(["--span-op", "packed_interleaved",
                "--input", corpus,
                "--output", str(tmp_path / "s"), "--num-cpus", "4"])
    assert out["span_op"] == "packed_interleaved"
    n = sum(pq.read_metadata(f).num_rows
            for f in glob.glob(str(tmp_path / "s") + "/*.parquet"))
    assert n >= 120          # at least one sequence per document
