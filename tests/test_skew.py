"""One-giant-row skew (SURVEY.md §4, VERDICT r2 #4): a corpus planted
with 400-1200-page documents (~200-600x the median span count) must
stream through the extraction pipeline with BOUNDED per-batch bytes,
produce golden-equal output with and without the skew-bucketing sort,
and trip the cheap n_pages auto-bucketing pre-pass — while a uniform
corpus must NOT pay the sort."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from pdf_extraction_ray.fixtures import golden_extract_table
from pdf_extraction_ray.fixtures.generator import generate_docs_table
from pdf_extraction_ray.pipelines import extract_pipeline
from pdf_extraction_ray.pipelines.extract import (
    GIANT_PAGES, decide_skew_bucketing, skew_profile)
from pdf_extraction_ray.stages.tokenize import classify_spans
from pdf_extraction_ray.stages.layout import layout_parse
from pdf_extraction_ray.stages.reassemble import reassemble_spans


def as_seq(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


@pytest.fixture(scope="module")
def giant_corpus(tmp_path_factory):
    # giant_frac=0.15 over 60 docs -> a handful of 400-1200-page giants
    # interleaved with ordinary 1-5-page docs
    t = generate_docs_table(11, 0, 60, giant_frac=0.15)
    n_pages = t["n_pages"].to_numpy()
    assert (n_pages >= 400).sum() >= 3, "fixture must actually plant giants"
    d = tmp_path_factory.mktemp("giant")
    import pyarrow.parquet as pq
    pq.write_table(t, str(d / "docs.parquet"))
    return str(d), t


@pytest.mark.usefixtures("ray_session")
def test_giant_corpus_bounded_batches_and_golden(giant_corpus):
    """The whole chain runs at batch_size=8 over giant docs; every batch
    entering every stage stays under a hard byte/row cap (one giant doc
    is ~1.5 MB of spans — bounded work per task, no OOM-shaped batches),
    and the output is span-for-span golden."""
    path, docs = giant_corpus
    CAP_BYTES = 64 << 20
    CAP_ROWS = 8

    def capped(stage):
        def fn(t: pa.Table) -> pa.Table:
            assert t.num_rows <= CAP_ROWS, t.num_rows
            assert t.nbytes <= CAP_BYTES, t.nbytes
            return stage(t)
        return fn

    ds = rd.read_parquet(f"{path}/docs.parquet")
    for stage in (classify_spans, layout_parse, reassemble_spans):
        ds = ds.map_batches(capped(stage), batch_format="pyarrow",
                            batch_size=CAP_ROWS)
    out = ds.take_all()
    golden = {r["doc_id"]: r["spans"]
              for r in golden_extract_table(docs).to_pylist()}
    assert len(out) == docs.num_rows
    for row in out:
        assert as_seq(row["spans"]) == as_seq(golden[row["doc_id"]])


@pytest.mark.usefixtures("ray_session")
def test_giant_corpus_bucketing_invariance(giant_corpus):
    path, _ = giant_corpus
    src = f"{path}/docs.parquet"
    plain = {r["doc_id"]: as_seq(r["spans"])
             for r in extract_pipeline(rd.read_parquet(src)).take_all()}
    bucketed = {r["doc_id"]: as_seq(r["spans"])
                for r in extract_pipeline(rd.read_parquet(src),
                                          skew_bucketing=True).take_all()}
    assert plain == bucketed


@pytest.mark.usefixtures("ray_session")
def test_skew_profile_and_auto_decision(giant_corpus, t2_corpus):
    path, docs = giant_corpus
    src = f"{path}/docs.parquet"
    p = skew_profile(src)
    n = docs["n_pages"].to_numpy()
    assert p["docs"] == len(n)
    assert p["pages"] == int(n.sum())
    assert p["giant_docs"] == int((n >= GIANT_PAGES).sum())
    assert p["max_pages"] == int(n.max())
    # free kernels: the exchange can never pay back
    assert decide_skew_bucketing(src, sec_per_page=0.0) is False
    # heavy per-page compute (real OCR at ~0.5 s/page) over a
    # single-file (maximally clustered) giant corpus: the serialized
    # hot-file work dwarfs one exchange -> spread pays
    assert decide_skew_bucketing(src, sec_per_page=0.5) is True
    # the ordinary golden corpus has no giant tail at all -> never sort,
    # no matter how heavy the kernel
    t2_path, _ = t2_corpus
    assert decide_skew_bucketing(t2_path, sec_per_page=0.5) is False


@pytest.mark.usefixtures("ray_session")
def test_auto_decision_clustered_vs_iid(tmp_path):
    """The bench-validated quadrant signs at unit scale: a sharded
    corpus whose giants are packed into one shard flips the default
    (light-kernel) decision ON; the same giants spread iid across
    shards keep it OFF."""
    import pyarrow.parquet as pq
    from pdf_extraction_ray.fixtures.generator import generate_doc

    def write(dirname: str, giant_idx: set) -> str:
        d = tmp_path / dirname
        d.mkdir()
        rows = []
        for i in range(400):
            r = generate_doc(5, i + 1, giant_frac=(1.0 if i in giant_idx
                                                   else 0.0))
            rows.append(r)
        for s in range(0, 400, 50):
            pa_tbl = pa.Table.from_pylist(rows[s:s + 50])
            pq.write_table(pa_tbl, str(d / f"part-{s:04d}.parquet"))
        return str(d)

    clustered = write("clustered", set(range(8)))          # all in shard 0
    iid = write("iid", set(range(0, 400, 50)))             # one per shard
    assert decide_skew_bucketing(clustered) is True
    assert decide_skew_bucketing(iid) is False


@pytest.mark.usefixtures("ray_session")
def test_run_extract_auto_resolves(giant_corpus, tmp_path):
    from pdf_extraction_ray.pipelines import run_extract
    path, docs = giant_corpus
    out = run_extract(f"{path}/docs.parquet",
                      skew_bucketing="auto").take_all()
    assert len(out) == docs.num_rows
