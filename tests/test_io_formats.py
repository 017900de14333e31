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
