"""Source-format tier: JSONL and CSV ingestion must be row-identical to
the parquet path — for flat tables (documents) via the auto-dispatch
reader, and for the nested interleaved corpus via the explicit-schema
JSONL reader feeding the flagship pipeline."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extraction_ray.sources.io import (read_docs, read_docs_jsonl,
                                           read_table_auto)

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_flat_table_jsonl_and_csv_match_parquet(tmp_path):
    src = pd.read_parquet(f"{SF}/documents.parquet")

    jd = str(tmp_path / "j")
    os.makedirs(jd)
    src.to_json(os.path.join(jd, "part-0.jsonl"), orient="records",
                lines=True)
    jdf = read_table_auto(jd).to_pandas()
    pd.testing.assert_frame_equal(_canon(jdf), _canon(src),
                                  check_dtype=False)

    cd = str(tmp_path / "c")
    os.makedirs(cd)
    src.to_csv(os.path.join(cd, "part-0.csv"), index=False)
    cdf = read_table_auto(cd).to_pandas()
    # CSV has no null/empty-string distinction: normalize both sides
    a = _canon(cdf).fillna("")
    b = _canon(src).fillna("")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    pdf = read_table_auto(f"{SF}/documents.parquet").to_pandas()
    pd.testing.assert_frame_equal(_canon(pdf), _canon(src),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("fmt", ["orc", "ipc"])
def test_orc_ipc_roundtrip_content_exact(tmp_path, fmt):
    """Engine-write then engine-read of ORC / Arrow IPC must be
    content-identical to the parquet source, including via the
    auto-dispatch reader; column pruning must project."""
    from pdf_extraction_ray.sources.io import (read_ipc_dir, read_orc_dir,
                                               write_ipc, write_orc)
    import ray.data as rd

    src = pd.read_parquet(f"{SF}/events.parquet",
                          columns=["event_id", "event_type", "value"])
    d = str(tmp_path / fmt)
    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"]) \
        .repartition(4)
    write, read = (write_orc, read_orc_dir) if fmt == "orc" \
        else (write_ipc, read_ipc_dir)
    write(ds, d)
    assert len(glob.glob(os.path.join(d, "*"))) == 4  # one file per block
    back = read(d).to_pandas()
    pd.testing.assert_frame_equal(_canon(back), _canon(src))
    auto = read_table_auto(d).to_pandas()
    pd.testing.assert_frame_equal(_canon(auto), _canon(src))
    if fmt == "orc":  # stripe-level column pruning
        pruned = read_orc_dir(d, columns=["event_id"]).to_pandas()
        assert list(pruned.columns) == ["event_id"]
        assert sorted(pruned["event_id"]) == sorted(src["event_id"])


@pytest.mark.usefixtures("ray_session")
def test_docs_corpus_jsonl_roundtrip_preserves_extraction(tmp_path):
    """Interleaved corpus written as JSONL and read back with the
    explicit schema must extract to byte-identical span sequences."""
    from pdf_extraction_ray.fixtures import ensure_corpus
    from pdf_extraction_ray.pipelines import extract_pipeline

    corpus = ensure_corpus("iofmt", 11, 60, shard_rows=30)
    jd = str(tmp_path / "docs_jsonl")
    read_docs(corpus).write_json(jd)
    # write_json emits .json shards; sanity: at least one file
    assert glob.glob(os.path.join(jd, "*"))

    ds_j = read_docs_jsonl(jd)
    assert ds_j.schema().base_schema.equals(
        pq.read_schema(sorted(glob.glob(corpus + "/*.parquet"))[0]))

    out_p = {r["doc_id"]: r["spans"]
             for r in extract_pipeline(read_docs(corpus)).take_all()}
    out_j = {r["doc_id"]: r["spans"]
             for r in extract_pipeline(ds_j).take_all()}
    assert out_j == out_p
    assert len(out_j) == 60
