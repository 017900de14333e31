"""Tokenizer-fertility rollup: planted multi-language corpus where the
BPE-ish tokenizer genuinely over-fragments (punctuation, digits,
contractions), differentially checked against the DuckDB oracle."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extraction_ray.pipelines.textops import (
    FERTILITY_SQL, corpus_tokenizer_fertility)


@pytest.mark.usefixtures("ray_session")
def test_fertility_discriminates_and_matches_oracle(tmp_path):
    rows = [
        # plain words: fertility 1.0
        {"doc_id": 1, "text": "plain words only here", "lang": "aa"},
        {"doc_id": 2, "text": "more plain words again", "lang": "aa"},
        # punctuated/numeric: BPE splits "word," -> "word" + ","
        {"doc_id": 3, "text": "hello, world! 42 items: 3.14 approx",
         "lang": "bb"},
        {"doc_id": 4, "text": "don't split-me; (really) 2026-08-20",
         "lang": "bb"},
    ]
    df = pd.DataFrame(rows)
    df["source"] = "s0"
    df["n_chars"] = df["text"].str.len().astype("int64")
    df["doc_id"] = df["doc_id"].astype("int64")
    d = os.path.join(str(tmp_path), "sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "documents.parquet"))

    out = corpus_tokenizer_fertility(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    ora = con.sql(FERTILITY_SQL).df()

    def canon(x):
        x = x[sorted(x.columns)]
        return x.sort_values(by=list(x.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(canon(out), canon(ora),
                                  check_dtype=False)
    f = out.set_index("lang")["fertility_x1e6"]
    assert f["aa"] == 1_000_000          # plain words: 1 BPE tok/word
    assert f["bb"] > 1_000_000           # punctuation inflates fertility
