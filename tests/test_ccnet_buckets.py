"""CCNet perplexity bucketing: end-to-end pure-python differential
(model training, scoring, discrete terciles, bucket rollup recomputed
with no Ray / no vectorization) plus planted-gibberish placement."""

import math
import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extraction_ray.functions import text as T
from pdf_extraction_ray.pipelines.textops import corpus_ccnet_buckets


def _py_trigrams(t: str):
    b = (t or "").replace("\x00", " ").lower().encode("utf-8")
    return [(b[i] << 16) | (b[i + 1] << 8) | b[i + 2]
            for i in range(len(b) - 2)]


def _py_round_half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _py_reference(df: pd.DataFrame) -> pd.DataFrame:
    """Serial CCNet: train on ALL docs, score, per-lang terciles."""
    model = Counter()
    for t in df["text"]:
        model.update(_py_trigrams(t))
    total = sum(model.values())
    v = len(model) + 1
    rows = []
    for _, r in df.iterrows():
        tri = _py_trigrams(r["text"])
        nll = (sum(-math.log2((model[c] + 1) / (total + v)) for c in tri)
               / len(tri)) if tri else 0.0
        # langid + token counting reuse the engine's own kernels (each
        # has its own bit-exact oracle elsewhere) — the differential
        # here targets the CCNet composition: LM, terciles, buckets
        lang = T.langid(pa.array([r["text"]]))[0].as_py()
        n_tok = int(T.token_stats(pa.array([r["text"]]))["n_tokens"][0]
                    .as_py())
        rows.append({"lang": lang,
                     "nll_x1e3": _py_round_half_away(nll * 1000.0),
                     "n_tokens": n_tok})
    s = pd.DataFrame(rows)
    out = []
    for lang, g in s.groupby("lang"):
        v_sorted = np.sort(g["nll_x1e3"].to_numpy())
        n = len(v_sorted)
        t1 = v_sorted[math.ceil(n / 3) - 1]
        t2 = v_sorted[math.ceil(2 * n / 3) - 1]
        b = np.where(g["nll_x1e3"] <= t1, "head",
                     np.where(g["nll_x1e3"] <= t2, "middle", "tail"))
        gg = g.assign(bucket=b).groupby("bucket", as_index=False) \
            .agg(n_docs=("nll_x1e3", "size"), n_tokens=("n_tokens", "sum"))
        gg.insert(0, "lang", lang)
        out.append(gg)
    return pd.concat(out, ignore_index=True) \
        .sort_values(["lang", "bucket"]).reset_index(drop=True) \
        .astype({"n_docs": "int64", "n_tokens": "int64"})


def _write(df: pd.DataFrame, tmp_path) -> str:
    d = os.path.join(str(tmp_path), "sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.usefixtures("ray_session")
class TestCCNetBuckets:
    def test_differential_vs_serial_reference(self, tmp_path):
        rng = np.random.default_rng(7)
        vocab = ["the", "and", "stream", "batch", "sort", "merge",
                 "key", "join", "where", "which", "with", "from"]
        texts = [" ".join(rng.choice(vocab, size=rng.integers(8, 40)))
                 for _ in range(120)]
        # a planted gibberish cluster (unlike the corpus -> high nll)
        texts += ["zqxj vwpk qjzx wvkp zzqq xjvw" for _ in range(6)]
        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": "en", "source": "s0",
            "n_chars": [len(t) for t in texts]})
        d = _write(df, tmp_path)
        got = corpus_ccnet_buckets(d)
        want = _py_reference(df)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)

    def test_gibberish_lands_in_tail(self, tmp_path):
        # corpus dominated by one phrase; gibberish must NOT be head
        texts = ["the stream batch sort merge key join" for _ in range(60)]
        gib = "zzzz qqqq xxxx jjjj vvvv wwww"
        texts += [gib for _ in range(3)]
        df = pd.DataFrame({
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts, "lang": "en", "source": "s0",
            "n_chars": [len(t) for t in texts]})
        d = _write(df, tmp_path)
        out = corpus_ccnet_buckets(d)
        # every lang×bucket row is accounted for and doc totals add up
        assert out["n_docs"].sum() == len(texts)
        # the tail bucket of the dominant lang holds the gibberish:
        # its 3 docs cannot be in head (60 identical low-nll docs fill it)
        want = _py_reference(df)
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), want, check_dtype=False)

    def test_empty_table(self, tmp_path):
        schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                            ("lang", pa.string()), ("source", pa.string()),
                            ("n_chars", pa.int64())])
        d = os.path.join(str(tmp_path), "empty")
        os.makedirs(d, exist_ok=True)
        pq.write_table(schema.empty_table(),
                       os.path.join(d, "documents.parquet"))
        out = corpus_ccnet_buckets(d)
        assert len(out) == 0
        assert list(out.columns) == ["lang", "bucket", "n_docs",
                                     "n_tokens"]
