"""Trigram-LM scorer: pure-python differential check of the vectorized
kernels, and end-to-end ordering on a planted-gibberish corpus (the
checks standing in for a SQL oracle — a trained model isn't
SQL-expressible)."""

import math
import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_extraction_ray.functions import lm as L


def _py_trigrams(texts):
    """Reference: byte trigrams per doc, lowercased, no vectorization."""
    out = []
    for t in texts:
        b = (t or "").replace("\x00", " ").lower().encode("utf-8")
        out.append([(b[i] << 16) | (b[i + 1] << 8) | b[i + 2]
                    for i in range(len(b) - 2)])
    return out


TEXTS = ["The quick brown fox", "the THE thé", "", "ab", "a b c d",
         "zzzéé", "  spaces  inside  "]


def test_trigram_codes_matches_python_reference():
    codes, doc_idx = L.trigram_codes(pa.array(TEXTS))
    ref = _py_trigrams(TEXTS)
    for d in range(len(TEXTS)):
        got = codes[doc_idx == d].tolist()
        assert got == ref[d], d


def test_nll_matches_python_reference():
    codes, doc_idx = L.trigram_codes(pa.array(TEXTS))
    u, c = L.count_trigrams(codes)
    total, v = int(c.sum()), len(u) + 1
    sums, ns = L.nll_partials(codes, doc_idx, len(TEXTS), u, c, total, v)
    model = Counter()
    for tri in [t for doc in _py_trigrams(TEXTS) for t in doc]:
        model[tri] += 1
    for d, doc in enumerate(_py_trigrams(TEXTS)):
        want = sum(-math.log2((model[t] + 1) / (total + v)) for t in doc)
        assert ns[d] == len(doc)
        assert abs(sums[d] - want) < 1e-9, d


def test_top_k_vocab_deterministic_ties():
    codes = np.array([5, 1, 9, 7], dtype=np.int64)
    counts = np.array([3, 3, 3, 1], dtype=np.int64)
    keep, kc = L.top_k_vocab(codes, counts, 2)
    # ties on count break by code: keep 1 and 5, sorted
    assert keep.tolist() == [1, 5] and kc.tolist() == [3, 3]


@pytest.mark.usefixtures("ray_session")
def test_gibberish_scores_worse_than_corpus_text(tmp_path):
    from pdf_extraction_ray.pipelines.textops import doc_trigram_lm

    rng = np.random.default_rng(7)
    natural = [" ".join(rng.choice(
        ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
         "and", "runs", "into", "the", "green", "field"], size=30))
        for _ in range(40)]
    gibberish = ["qzxjv wkqzx vjqxz kqjzv xwzqj" * 4 for _ in range(2)]
    docs = pd.DataFrame({
        "doc_id": np.arange(42, dtype=np.int64),
        "text": natural + gibberish,
        "lang": ["en"] * 42,
        "source": ["s"] * 42})
    d = tmp_path / "lmcorpus"
    os.makedirs(d, exist_ok=True)
    docs.to_parquet(d / "documents.parquet")

    out = doc_trigram_lm(str(d)).to_pandas().set_index("doc_id") \
        .sort_index()
    nat = out.loc[out.index <= 39, "nll_x1e3"]
    gib = out.loc[out.index >= 40, "nll_x1e3"]
    assert gib.min() > nat.max(), (gib.min(), nat.max())
    assert (out["n_trigrams"] > 0).all()


@pytest.mark.usefixtures("ray_session")
def test_trigram_lm_runs_on_sf(tmp_path):
    from pdf_extraction_ray.pipelines.textops import doc_trigram_lm

    out = doc_trigram_lm("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    assert (out["nll_x1e3"] >= 0).all()
