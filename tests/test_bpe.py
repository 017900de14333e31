"""BPE vocabulary learning: the distributed learner must reproduce the
pure reference learner (functions/bpe.py) exactly — same merges, same
order, same counts — and the encoder stats must match a local rerun."""

import os
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.functions import bpe as B
from pdf_extraction_ray.pipelines.corpus import (corpus_bpe_merges,
                                                 corpus_bpe_token_stats)

TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "low lower lowest",
    "new newer newest news",
    "the low cat and the new cat",
    "",
    "mat mat mat mat",
]


def _dir(tmp_path):
    d = str(tmp_path / "bpe")
    os.makedirs(d, exist_ok=True)
    docs = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(len(TEXTS))],
        "text": TEXTS,
        "lang": "en", "source": "t",
        "n_chars": [len(t) for t in TEXTS]})
    docs.to_parquet(os.path.join(d, "documents.parquet"))
    return d


def _tokenize(t):
    """Engine tokenization: lower(trim) split on \\s+ — an empty doc
    yields one '' token, same as DuckDB regexp_split_to_array('')."""
    return re.split(r"\s+", t.strip().lower())


def _word_counts():
    c = Counter()
    for t in TEXTS:
        c.update(_tokenize(t))
    return dict(c)


class TestReference:
    def test_merge_word_overlaps(self):
        assert B.merge_word(("a", "a", "a", "</w>"), "a", "a") == \
            ("aa", "a", "</w>")

    def test_learn_deterministic_and_sane(self):
        wc = {"aaab": 5, "aab": 3}
        merges = B.learn_merges(wc, 4)
        assert merges[0][0:2] == ("a", "a")  # most frequent adjacent pair
        assert merges == B.learn_merges(wc, 4)

    def test_encode_applies_in_order(self):
        wc = _word_counts()
        merges = [(l, r) for l, r, _ in B.learn_merges(wc, 10)]
        enc = B.encode_word("the", merges)
        # 'the' is the most common word; 10 merges collapse it fully
        assert enc == ("the</w>",)


@pytest.mark.usefixtures("ray_session")
class TestDistributed:
    def test_matches_reference_learner(self, tmp_path):
        d = _dir(tmp_path)
        got = corpus_bpe_merges(d, n_merges=12)
        want = B.learn_merges(_word_counts(), 12)
        assert len(got) == len(want)
        for row, (l, r, cnt) in zip(got.itertuples(), want):
            assert (row.left, row.right, row.pair_count) == (l, r, cnt)
            assert row.merged == l + r

    def test_token_stats_match_local(self, tmp_path):
        d = _dir(tmp_path)
        got = corpus_bpe_token_stats(d).to_pandas().set_index("doc_id")
        merges = [(l, r) for l, r, _ in
                  B.learn_merges(_word_counts(), 24)]
        for i, t in enumerate(TEXTS):
            words = _tokenize(t)
            n_bpe = sum(len(B.encode_word(w, merges)) for w in words)
            assert got.loc[f"d{i}", "n_words"] == len(words)
            assert got.loc[f"d{i}", "n_bpe_tokens"] == n_bpe
