"""Randomized differential check: every ORACLED documents-family
operator over seeded random tables vs DuckDB on the same file. The
generator plants the hard cases — exact duplicates, shared 20+-token
blocks, multilingual stopwords, punctuation-bearing tokens, empty and
whitespace-only docs — none of which are guaranteed by the sf fixtures.
ASCII-only by construction (the fingerprint oracle's documented
equivalence domain)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.pipelines.corpus import CORPUS_QUERIES
from pdf_extraction_ray.pipelines.textops import TEXT_QUERIES

VOCAB = ("the and of to a in is it le la les de et un une el los y que "
         "der die das und alpha beta gamma delta scan sort merge join "
         "window batch key. row, col; val? x1 x2 x3").split()


def _random_docs(seed: int, n: int = 40) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 60))
        toks = list(rng.choice(VOCAB, size=k))
        texts.append(" ".join(toks))
    # plant: exact dup, shared long block, empty, whitespace-only
    if n >= 8:
        texts[1] = texts[0]
        long_block = " ".join(rng.choice(VOCAB, size=25))
        texts[2] = long_block + " tailA tailB"
        texts[3] = long_block + " other tail"
        texts[4] = ""
        texts[5] = "   "
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(["en", "fr", "es", "de", "zh"], size=n)})


ORACLED = sorted(
    [(n, fn, sql) for n, (fn, sql) in
     {**CORPUS_QUERIES, **TEXT_QUERIES}.items() if sql is not None])


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [11, 23])
def test_oracled_docs_ops_on_random_tables(tmp_path, seed):
    d = tmp_path / f"rand{seed}"
    os.makedirs(d, exist_ok=True)
    _random_docs(seed).to_parquet(d / "documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")

    for name, fn, sql in ORACLED:
        res = fn(str(d))
        ray_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        duck_df = con.sql(sql).df()
        rc = ray_df[sorted(ray_df.columns)] \
            .sort_values(by=sorted(ray_df.columns)).reset_index(drop=True)
        oc = duck_df[sorted(duck_df.columns)] \
            .sort_values(by=sorted(duck_df.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(rc, oc, check_dtype=False,
                                      check_exact=True, obj=f"{name}@{seed}")
