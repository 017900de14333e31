"""Repetition-signal semantics pinned on planted documents (the oracle
parity test covers corpus-scale agreement; this pins the VALUES)."""

import os

import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.pipelines.textops import docs_repetition_signals


@pytest.mark.usefixtures("ray_session")
def test_planted_values(tmp_path):
    d = str(tmp_path / "rep")
    os.makedirs(d, exist_ok=True)
    docs = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "text": [
            # 4 distinct words, 3 bigram slots, modal bigram count 1
            "a b c d",
            # "spam ham" loop: bigrams (s h)x3 (h s)x2 of 5 -> 600000;
            # trigrams: (s h s)x2 + (h s h)x2 of 4 dup -> 1000000
            "spam ham spam ham spam ham",
            # all same word
            "x x x x x",
            # single word: no bigrams at all
            "solo"],
        "lang": ["en"] * 4, "source": ["s"] * 4,
        "n_chars": np.array([7, 26, 9, 4], dtype=np.int64)})
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    out = docs_repetition_signals(d).to_pandas().set_index("doc_id")
    assert out.loc[1].tolist() == [4, 1_000_000, 333_333, 0]
    assert out.loc[2].tolist() == [6, 333_333, 600_000, 1_000_000]
    assert out.loc[3].tolist() == [5, 200_000, 1_000_000, 1_000_000]
    assert out.loc[4].tolist() == [1, 1_000_000, 0, 0]
    assert list(out.columns) == ["n_words", "ttr_x1e6",
                                 "top_bigram_frac_x1e6",
                                 "dup_trigram_frac_x1e6"]
