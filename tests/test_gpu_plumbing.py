"""GPU / custom-resource plumbing through the actor-pool stages
(SURVEY T3/T8): each pipeline forwards its `num_gpus` / `resources`
kwarg into the stage's `map_batches` ray-remote args — asserted on the
logical plan, since no GPU exists in this sandbox to schedule against.
The reference instead env-pins CUDA in-process
(hybrid_docling_gpt4_processor.py:111-112); Ray's resource claim is
the multi-tenant-safe rebuild of that knob.
"""

import pytest

from pdf_extraction_ray.functions.cluster import accel_remote_args

SF = "/root/testdata/sf0.001"


def _remote_args(ds, op_name_part: str) -> dict:
    """ray-remote args of the first logical op whose name contains
    ``op_name_part`` (walks the plan from the sink upward)."""
    op = ds._logical_plan.dag
    while op is not None:
        if op_name_part in type(op).__name__ or op_name_part in op.name:
            return op._ray_remote_args
        deps = op.input_dependencies
        op = deps[0] if deps else None
    raise AssertionError(f"no op matching {op_name_part!r} in plan")


def test_accel_remote_args_shapes():
    assert accel_remote_args() == {}
    assert accel_remote_args(None, None) == {}
    assert accel_remote_args(0.25) == {"num_gpus": 0.25}
    assert accel_remote_args(resources={"vlm_slot": 1}) == {
        "resources": {"vlm_slot": 1}}
    assert accel_remote_args(1.0, {"a": 2}) == {
        "num_gpus": 1.0, "resources": {"a": 2}}
    # empty resources dict stays off (no zero-resource claim emitted)
    assert accel_remote_args(resources={}) == {}


@pytest.mark.usefixtures("ray_session")
def test_layout_actor_stage_carries_num_gpus():
    from pdf_extraction_ray.fixtures import ensure_corpus
    from pdf_extraction_ray.pipelines.extract import extract_pipeline
    from pdf_extraction_ray.sources.io import read_docs
    path = ensure_corpus("gpuplumb", 3, 20, shard_rows=20)
    ds = extract_pipeline(read_docs(path), layout_mode="actors",
                          layout_num_gpus=0.5,
                          layout_resources={"ocr_slot": 1})
    args = _remote_args(ds, "LayoutParser")
    assert args["num_gpus"] == 0.5
    assert args["resources"] == {"ocr_slot": 1}
    # defaulted off: no accelerator keys in the plain wiring
    plain = extract_pipeline(read_docs(path), layout_mode="actors")
    pargs = _remote_args(plain, "LayoutParser")
    assert "num_gpus" not in pargs and "resources" not in pargs


@pytest.mark.usefixtures("ray_session")
def test_describer_stages_carry_num_gpus():
    from pdf_extraction_ray.fixtures import ensure_corpus
    from pdf_extraction_ray.pipelines.analysis import (
        analysis_pipeline, page_analysis_pipeline)
    from pdf_extraction_ray.sources.io import read_docs
    path = ensure_corpus("gpuplumb", 3, 20, shard_rows=20)
    ds = analysis_pipeline(read_docs(path), describer_num_gpus=0.25)
    assert _remote_args(ds, "VisualDescriber")["num_gpus"] == 0.25
    ds2 = page_analysis_pipeline(
        read_docs(path), describer_resources={"vlm_endpoint_slot": 1})
    assert _remote_args(ds2, "PageVisualDescriber")["resources"] == {
        "vlm_endpoint_slot": 1}


@pytest.mark.usefixtures("ray_session")
def test_embedder_and_decoder_stages_carry_num_gpus():
    from pdf_extraction_ray.fixtures import ensure_corpus
    from pdf_extraction_ray.pipelines.media import features_pipeline
    from pdf_extraction_ray.pipelines.retrieval import _stage1_candidates
    from pdf_extraction_ray.sources.io import read_docs
    cand = _stage1_candidates(SF, embed_num_gpus=0.125)
    assert _remote_args(cand, "HashEmbedder")["num_gpus"] == 0.125
    path = ensure_corpus("gpuplumb", 3, 20, shard_rows=20)
    feats = features_pipeline(read_docs(path),
                              decode_resources={"nvdec": 1})
    assert _remote_args(feats, "MediaDecoder")["resources"] == {
        "nvdec": 1}


@pytest.mark.usefixtures("ray_session")
def test_custom_resource_stage_executes_when_resource_exists(tmp_path):
    """End-to-end scheduling check with a resource the local session CAN
    satisfy: num_cpus-only claim via accel_remote_args(resources=None)
    plus a real run of the actors path to pin that the extra kwargs
    don't break fusion/execution."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extraction_ray.fixtures import ensure_corpus, golden_extract_table
    from pdf_extraction_ray.pipelines.extract import extract_pipeline
    from pdf_extraction_ray.sources.io import read_docs
    path = ensure_corpus("gpuplumb", 3, 20, shard_rows=20)
    out = extract_pipeline(read_docs(path), layout_mode="actors")
    t = out.take_all()
    docs = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(path + "/*.parquet"))])
    g = {r["doc_id"]: r["spans"]
         for r in golden_extract_table(docs).to_pylist()}
    assert len(t) == 20
    for r in t:
        assert r["spans"] == g[r["doc_id"]]
