"""ExactSubstr dedup (stride-1 window, keep-first, maximal removal):
semantic plants + brute-force pure-python differential (exact token
tuples, no hashing) on randomized corpora with planted shared spans."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extraction_ray.pipelines.substr import (
    W_SUB, doc_dedup_substrings, exact_substr_reference)

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
          "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron"]


def _write(tmp_path, docs: dict[int, str]) -> str:
    d = os.path.join(str(tmp_path), "docs")
    os.makedirs(d, exist_ok=True)
    df = pd.DataFrame({
        "doc_id": pd.Series(sorted(docs), dtype="int64"),
        "text": [docs[k] for k in sorted(docs)],
        "lang": "en", "source": "s0",
        "n_chars": pd.Series([len(docs[k]) for k in sorted(docs)],
                             dtype="int64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    return d


def _run(tmp_path, docs):
    out = doc_dedup_substrings(_write(tmp_path, docs)).to_pandas() \
        .set_index("doc_id").sort_index()
    ref = exact_substr_reference(docs)
    return out, ref


def _assert_matches_reference(out, ref):
    assert sorted(out.index) == sorted(ref)
    for d in ref:
        for k in ("text_kept", "n_tokens", "removed_tokens"):
            assert out.loc[d, k] == ref[d][k], (d, k, out.loc[d, k],
                                                ref[d][k])


def _rand_text(rng, n):
    return " ".join(rng.choice(_WORDS, size=n))


@pytest.mark.usefixtures("ray_session")
class TestExactSubstr:
    def test_maximal_extension_past_block_boundaries(self, tmp_path):
        """A shared 25-token passage is removed in FULL from the copy
        (the stride-20 block deduper would only drop aligned blocks)."""
        rng = np.random.default_rng(3)
        shared = _rand_text(rng, W_SUB + 5)
        a = _rand_text(rng, 7) + " " + shared + " " + _rand_text(rng, 9)
        b = _rand_text(rng, 13) + " " + shared + " " + _rand_text(rng, 4)
        out, ref = _run(tmp_path, {1: a, 2: b})
        _assert_matches_reference(out, ref)
        assert out.loc[1, "removed_tokens"] == 0         # first copy kept
        assert out.loc[2, "removed_tokens"] == W_SUB + 5  # exact span

    def test_sub_window_span_untouched(self, tmp_path):
        rng = np.random.default_rng(4)
        shared = _rand_text(rng, W_SUB - 1)              # 19 < W tokens
        a = shared + " " + _rand_text(rng, 6)
        b = _rand_text(rng, 6) + " " + shared
        out, ref = _run(tmp_path, {1: a, 2: b})
        _assert_matches_reference(out, ref)
        assert (out["removed_tokens"] == 0).all()

    def test_within_doc_repeat_keeps_first(self, tmp_path):
        rng = np.random.default_rng(5)
        phrase = _rand_text(rng, W_SUB)
        doc = phrase + " " + _rand_text(rng, 8) + " " + phrase
        out, ref = _run(tmp_path, {7: doc})
        _assert_matches_reference(out, ref)
        assert out.loc[7, "removed_tokens"] == W_SUB

    def test_cross_doc_keep_first_order(self, tmp_path):
        rng = np.random.default_rng(6)
        phrase = _rand_text(rng, W_SUB + 2)
        docs = {10: phrase, 3: phrase, 25: phrase}       # min doc_id wins
        out, ref = _run(tmp_path, docs)
        _assert_matches_reference(out, ref)
        assert out.loc[3, "removed_tokens"] == 0
        assert out.loc[10, "removed_tokens"] == W_SUB + 2
        assert out.loc[25, "removed_tokens"] == W_SUB + 2

    def test_randomized_differential(self, tmp_path):
        """Random corpus with planted shared spans, empty and short
        docs: engine == brute-force reference on every field."""
        rng = np.random.default_rng(11)
        docs = {}
        spans = [_rand_text(rng, int(k))
                 for k in rng.integers(W_SUB, 2 * W_SUB, size=6)]
        for d in range(40):
            parts = [_rand_text(rng, int(rng.integers(0, 30)))]
            if rng.random() < 0.5:
                parts.append(spans[int(rng.integers(0, len(spans)))])
                parts.append(_rand_text(rng, int(rng.integers(0, 15))))
            docs[d] = " ".join(p for p in parts if p)
        docs[40] = ""                                     # empty doc
        docs[41] = "single"                               # 1 token
        out, ref = _run(tmp_path, docs)
        _assert_matches_reference(out, ref)
        assert out["removed_tokens"].sum() > 0            # plants fired

    def test_corpus_runs_and_is_conservative(self):
        """Over the driver corpus: never removes more tokens than a doc
        has, token totals preserved, unique docs untouched."""
        out = doc_dedup_substrings("/root/testdata/sf0.001").to_pandas()
        assert len(out) == 500
        assert (out["removed_tokens"] <= out["n_tokens"]).all()
        kept_tokens = out["text_kept"].str.split().str.len().fillna(0)
        assert (kept_tokens <= out["n_tokens"]).all()
        # a doc with nothing removed round-trips its token count
        full = out[(out["removed_tokens"] == 0) & (out["text_kept"] != "")]
        fk = full["text_kept"].str.split().str.len()
        assert (fk == full["n_tokens"]).all()
