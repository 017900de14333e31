"""The north rule: per-document span-sequence equality
(kind, text, media_ref, order) between the Ray pipeline and the golden
extractor, plus permutation-invariance and write-path properties."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.smoke

import ray.data as rd

from pdf_extraction_ray.fixtures import golden_extract_table, golden_extract_doc
from pdf_extraction_ray.fixtures.generator import generate_docs_table
from pdf_extraction_ray.pipelines import extract_pipeline
from pdf_extraction_ray.schema import DOCS_SCHEMA
from pdf_extraction_ray.sources import read_docs


def as_seq(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


@pytest.mark.usefixtures("ray_session")
def test_span_sequence_equality_t2(t2_corpus):
    path, docs = t2_corpus
    out = extract_pipeline(read_docs(path)).take_all()
    golden = {r["doc_id"]: r["spans"]
              for r in golden_extract_table(docs).to_pylist()}
    assert len(out) == docs.num_rows
    for row in out:
        assert as_seq(row["spans"]) == as_seq(golden[row["doc_id"]]), row["doc_id"]


@pytest.mark.usefixtures("ray_session")
def test_permutation_invariance():
    """Shuffling span order within a doc never changes output (O1: order
    is data, not layout)."""
    docs = generate_docs_table(42, 0, 40).to_pylist()
    rng = np.random.default_rng(0)
    shuffled = []
    for d in docs:
        n = len(d["spans"])
        perm = rng.permutation(n)
        shuffled.append({
            **d,
            "spans": [d["spans"][j] for j in perm],
            "font_size": [d["font_size"][j] for j in perm],
            "page": [d["page"][j] for j in perm],
            "link_density": [d["link_density"][j] for j in perm],
            "bbox": [d["bbox"][j] for j in perm],
        })
    t1 = pa.Table.from_pylist(docs, schema=DOCS_SCHEMA)
    t2 = pa.Table.from_pylist(shuffled, schema=DOCS_SCHEMA)
    r1 = {r["doc_id"]: as_seq(r["spans"])
          for r in extract_pipeline(rd.from_arrow(t1)).take_all()}
    r2 = {r["doc_id"]: as_seq(r["spans"])
          for r in extract_pipeline(rd.from_arrow(t2)).take_all()}
    assert r1 == r2


@pytest.mark.usefixtures("ray_session")
def test_batch_size_invariance(t2_corpus):
    """Block/batch boundaries never change content."""
    path, docs = t2_corpus
    small = extract_pipeline(read_docs(path), batch_size=17).take_all()
    big = extract_pipeline(read_docs(path), batch_size=4096).take_all()
    a = {r["doc_id"]: as_seq(r["spans"]) for r in small}
    b = {r["doc_id"]: as_seq(r["spans"]) for r in big}
    assert a == b


@pytest.mark.usefixtures("ray_session")
def test_skew_bucketing_invariance(t2_corpus):
    """The size-bucket repartition (skew control shuffle) never changes
    per-doc output."""
    path, _ = t2_corpus
    plain = {r["doc_id"]: as_seq(r["spans"])
             for r in extract_pipeline(read_docs(path)).take_all()}
    bucketed = {r["doc_id"]: as_seq(r["spans"])
                for r in extract_pipeline(read_docs(path),
                                          skew_bucketing=True).take_all()}
    assert plain == bucketed


@pytest.mark.usefixtures("ray_session")
def test_actor_pool_mode_matches(t2_corpus):
    """The actor-pool layout mode produces identical spans to task mode."""
    path, _ = t2_corpus
    tasks = {r["doc_id"]: as_seq(r["spans"])
             for r in extract_pipeline(read_docs(path)).take_all()}
    actors = {r["doc_id"]: as_seq(r["spans"])
              for r in extract_pipeline(read_docs(path),
                                        layout_mode="actors").take_all()}
    assert tasks == actors


def test_golden_empty_doc():
    d = {"doc_id": "x", "spans": [], "font_size": [], "page": [],
         "link_density": [], "bbox": [], "regions": [], "n_pages": 0}
    assert golden_extract_doc(d) == []


def test_golden_output_sorted_by_offset(t2_corpus):
    _, docs = t2_corpus
    for r in golden_extract_table(docs).to_pylist()[:200]:
        offs = [s["offset"] for s in r["spans"]]
        assert offs == sorted(offs)
