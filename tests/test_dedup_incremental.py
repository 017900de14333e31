"""Incremental MinHash near-dedup against the persisted LSH index:
planted cross-snapshot recovery, new-vs-new exclusion, index reuse, and
quantified recall vs the exact cross-snapshot Jaccard ground truth at
sf0.01 (same discipline as test_dedup_recall.py)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_extraction_ray.functions import hashing as H
from pdf_extraction_ray.pipelines.dedup import (
    MINHASH_JACCARD_THRESHOLD, dedup_minhash_incremental,
    ensure_lsh_index)

SF_DIR = "/root/testdata/sf0.01"


def _write_docs(rows, tmp_path) -> str:
    df = pd.DataFrame(rows)
    df["doc_id"] = df["doc_id"].astype("int64")
    d = os.path.join(str(tmp_path), "sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    return d


@pytest.mark.usefixtures("ray_session")
class TestIncrementalMinhash:
    def test_planted_cross_snapshot_pair_recovered(self, tmp_path):
        base_text = ("alpha beta gamma delta epsilon zeta eta theta "
                     "iota kappa lambda mu nu xi omicron pi rho sigma "
                     "tau upsilon phi chi psi omega one two three four")
        near = base_text.replace("omega", "spark")   # 1-token edit
        filler = ["quick brown fox jumps over the lazy dog %d" % i
                  for i in range(20)]
        rows = [{"doc_id": 2, "text": base_text}]          # prior
        rows += [{"doc_id": 3, "text": near}]              # new near-dup
        # a near-dup pair strictly INSIDE the new snapshot (both odd):
        rows += [{"doc_id": 5, "text": base_text.replace("alpha", "zzz")
                  .replace("omega", "yyy")},
                 {"doc_id": 7, "text": base_text.replace("alpha", "zzz")
                  .replace("omega", "xxx")}]
        rows += [{"doc_id": 100 + 2 * i, "text": t}
                 for i, t in enumerate(filler)]
        d = _write_docs(rows, tmp_path)
        out = dedup_minhash_incremental(d)
        got = set(map(tuple,
                      out[["doc_new", "doc_old"]].to_numpy()))
        assert (3, 2) in got
        # new-vs-new pairs are NOT this operator's output
        assert not any(a % 2 == 1 and b % 2 == 1 for a, b in got)
        # orientation: new side odd, old side even, always
        assert all(a % 2 == 1 and b % 2 == 0 for a, b in got)

    def test_index_is_persisted_and_prior_only(self, tmp_path):
        rows = [{"doc_id": i, "text": f"text number {i} with words"}
                for i in range(10)]
        d = _write_docs(rows, tmp_path)
        p1 = ensure_lsh_index(d)
        assert os.path.exists(os.path.join(p1, "_DONE"))
        p2 = ensure_lsh_index(d)          # cached: same artifact
        assert p1 == p2
        idx = pd.concat([pd.read_parquet(os.path.join(p1, f))
                         for f in os.listdir(p1)
                         if f.endswith(".parquet")])
        assert set(idx.columns) == {"key", "doc_id"}
        assert (idx["doc_id"].to_numpy() % 2 == 0).all()
        assert len(idx) == 5 * H.N_BANDS   # 16 band rows per prior doc

    def test_recall_vs_exact_cross_snapshot_truth(self):
        docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                               columns=["doc_id", "text"])
        ids = docs["doc_id"].to_numpy()
        sets = [H.word_ngrams(t) for t in docs["text"].tolist()]
        truth = set()
        n = len(ids)
        for i in range(n):
            si = sets[i]
            for j in range(i + 1, n):
                if (ids[i] + ids[j]) % 2 == 0:
                    continue                      # same snapshot parity
                sj = sets[j]
                mi, ma = min(len(si), len(sj)), max(len(si), len(sj))
                if ma and mi / ma < MINHASH_JACCARD_THRESHOLD:
                    continue
                if H.jaccard(si, sj) >= MINHASH_JACCARD_THRESHOLD:
                    o = int(ids[i]) if ids[i] % 2 == 1 else int(ids[j])
                    e = int(ids[j]) if ids[i] % 2 == 1 else int(ids[i])
                    truth.add((o, e))
        out = dedup_minhash_incremental(SF_DIR)
        got = set(map(tuple,
                      out[["doc_new", "doc_old"]].to_numpy()))
        # exact-kernel verification -> no false positives
        assert got <= truth
        if truth:
            recall = len(got & truth) / len(truth)
            assert recall >= 0.92, \
                f"incremental recall {recall:.3f} ({len(got)}/{len(truth)})"
