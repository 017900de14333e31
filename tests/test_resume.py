"""Checkpoint-resume properties: interrupted + resumed == uninterrupted;
idempotent re-runs; error-as-data manifests; lineage metrics."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.smoke

from pdf_extraction_ray.fixtures import ensure_corpus
from pdf_extraction_ray.pipelines.resumable import run_extract_resumable
from pdf_extraction_ray.state.manifest import read_manifests


def _spans_by_doc(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                          for s in r["spans"]]
            for r in t.to_pylist()}


@pytest.mark.usefixtures("ray_session")
def test_resume_after_kill_matches_uninterrupted(tmp_path):
    corpus = ensure_corpus("resume", 11, 300, shard_rows=50)   # 6 shards
    a, b = str(tmp_path / "a"), str(tmp_path / "b")

    # uninterrupted
    r = run_extract_resumable(corpus, a)
    assert r["processed"] == 6 and r["errors"] == 0

    # killed after 2 partitions, then resumed
    r1 = run_extract_resumable(corpus, b, max_partitions=2)
    assert r1["processed"] == 2
    r2 = run_extract_resumable(corpus, b)
    assert r2["skipped"] == 2 and r2["processed"] == 4

    assert _spans_by_doc(a) == _spans_by_doc(b)

    # idempotent: nothing left to do
    r3 = run_extract_resumable(corpus, b)
    assert r3["processed"] == 0 and r3["skipped"] == 6


@pytest.mark.usefixtures("ray_session")
def test_manifest_lineage_and_metrics(tmp_path):
    corpus = ensure_corpus("resume", 11, 300, shard_rows=50)
    out = str(tmp_path / "m")
    run_extract_resumable(corpus, out, run_id="r42")
    ms = read_manifests(out)
    assert len(ms) == 6
    for pid, m in ms.items():
        assert m.status == "ok" and m.run_id == "r42"
        assert m.n_docs == 50 and m.n_spans > 0
        assert os.path.exists(m.input_path)
        assert ":" in m.input_fingerprint
        assert m.duration_sec >= 0


@pytest.mark.usefixtures("ray_session")
def test_error_as_data(tmp_path):
    corpus = ensure_corpus("resume", 11, 300, shard_rows=50)
    # poison: copy corpus, corrupt one shard
    poisoned = str(tmp_path / "poisoned_in")
    shutil.copytree(corpus, poisoned)
    victim = sorted(glob.glob(poisoned + "/*.parquet"))[2]
    with open(victim, "wb") as f:
        f.write(b"not a parquet file")
    out = str(tmp_path / "e")
    r = run_extract_resumable(poisoned, out)
    assert r["processed"] == 6 and r["errors"] == 1
    ms = read_manifests(out)
    bad = [m for m in ms.values() if m.status == "error"]
    assert len(bad) == 1 and bad[0].error
    # resume retries only the failed partition
    r2 = run_extract_resumable(poisoned, out)
    assert r2["processed"] == 1 and r2["skipped"] == 5


@pytest.mark.usefixtures("ray_session")
def test_matches_streaming_pipeline(tmp_path):
    """Both execution paths produce identical span sequences."""
    from pdf_extraction_ray.pipelines import extract_pipeline
    from pdf_extraction_ray.sources import read_docs
    corpus = ensure_corpus("resume", 11, 300, shard_rows=50)
    out = str(tmp_path / "s")
    run_extract_resumable(corpus, out)
    streaming = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                               for s in r["spans"]]
                 for r in extract_pipeline(read_docs(corpus)).take_all()}
    assert _spans_by_doc(out) == streaming


@pytest.mark.usefixtures("ray_session")
def test_resume_over_binary_html_corpus(tmp_path, monkeypatch):
    """The checkpoint path over a raw-document corpus (north rule:
    documents-in, resumable): .html files partition into deterministic
    file groups, kill+resume matches uninterrupted, and the output is
    span-identical to the streaming pipeline over the same corpus."""
    import pdf_extraction_ray.pipelines.resumable as R
    from pdf_extraction_ray.pipelines import extract_pipeline
    from pdf_extraction_ray.sources import read_docs
    from pdf_extraction_ray.sources.html import ensure_html_corpus

    monkeypatch.setattr(R, "BINARY_GROUP_FILES", 40)   # 120 files -> 3 parts
    corpus = ensure_html_corpus("t-resume-html", seed=13, n_docs=120)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")

    r = R.run_extract_resumable(corpus, a)
    assert r["processed"] == 3 and r["errors"] == 0

    r1 = R.run_extract_resumable(corpus, b, max_partitions=1)
    assert r1["processed"] == 1
    r2 = R.run_extract_resumable(corpus, b)
    assert r2["skipped"] == 1 and r2["processed"] == 2
    assert _spans_by_doc(a) == _spans_by_doc(b)

    # idempotent third run: everything skips
    r3 = R.run_extract_resumable(corpus, b)
    assert r3["processed"] == 0 and r3["skipped"] == 3

    # lineage: manifests carry the group source + fingerprint
    ms = read_manifests(b)
    assert len(ms) == 3
    assert all(m.input_fingerprint.startswith("group:40:")
               for m in ms.values())

    # streaming-path equality
    stream = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"],
                             s["offset"]) for s in r["spans"]]
              for r in extract_pipeline(read_docs(corpus)).take_all()}
    assert _spans_by_doc(a) == stream


@pytest.mark.usefixtures("ray_session")
def test_binary_group_fingerprint_invalidates_on_change(tmp_path):
    """Touching ONE file inside a completed group re-runs exactly that
    group (the per-partition lineage contract)."""
    import pdf_extraction_ray.pipelines.resumable as R
    from pdf_extraction_ray.sources.html import write_html_corpus
    from pdf_extraction_ray.fixtures.generator import generate_docs_table

    src = tmp_path / "src"
    src.mkdir()
    write_html_corpus(generate_docs_table(3, 0, 10), str(src))
    out = str(tmp_path / "out")
    r = R.run_extract_resumable(str(src), out)
    assert r["processed"] == 1

    f = sorted(glob.glob(str(src / "*.html")))[0]
    os.utime(f, (1, 1))                      # mtime change = new fingerprint
    r2 = R.run_extract_resumable(str(src), out)
    assert r2["processed"] == 1 and r2["skipped"] == 0
