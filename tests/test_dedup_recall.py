"""Quantified recall/precision of the blocked near-dup pipelines against
EXACT ground-truth pair sets at sf0.01 (VERDICT r2 #7: planted-pair tests
show the pipelines find what we hid; these show how much of the TRUE
near-dup set the blocking schemes surface on a real corpus).

Ground truths are brute-force over all C(500,2) pairs of the driver's
sf0.01 documents table:

- MinHash-LSH truth: word-3-gram Jaccard >= MINHASH_JACCARD_THRESHOLD
  computed with the SAME ``H.word_ngrams`` / ``H.jaccard`` kernels the
  pipeline's verification stage uses — so precision is 1.0 by
  construction and recall isolates the LSH banding loss.
- SimHash truth: brute-force Hamming <= SIMHASH_MAX_HAMMING over the
  exact ``H.simhash`` signatures — recall isolates the band-blocking
  loss, which the 4x16-bit pigeonhole scheme provably eliminates
  (<=3 flipped bits cannot touch all 4 bands).

Measured on this corpus (2026-08-19): MinHash recall 25/25 = 1.0,
SimHash recall 19/19 = 1.0 (the previous top-16-bits-only blocking
measured 12/19 = 0.63).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_extraction_ray.functions import hashing as H
from pdf_extraction_ray.pipelines.dedup import (
    MINHASH_JACCARD_THRESHOLD, SIMHASH_MAX_HAMMING,
    dedup_minhash_lsh, dedup_simhash)

SF_DIR = "/root/testdata/sf0.01"


def _pairs_set(res) -> set:
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    return set(map(tuple, df[["doc_a", "doc_b"]].astype(int).to_numpy()))


@pytest.fixture(scope="module")
def corpus():
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    return docs["doc_id"].to_numpy(), docs["text"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_recall_vs_exact_jaccard(corpus):
    ids, texts = corpus
    sets = [H.word_ngrams(t) for t in texts]
    truth = set()
    n = len(ids)
    for i in range(n):
        si = sets[i]
        for j in range(i + 1, n):
            sj = sets[j]
            # |A|/|B| upper-bounds Jaccard: prune the obvious misses
            mi, ma = min(len(si), len(sj)), max(len(si), len(sj))
            if ma and mi / ma < MINHASH_JACCARD_THRESHOLD:
                continue
            if H.jaccard(si, sj) >= MINHASH_JACCARD_THRESHOLD:
                a, b = sorted((int(ids[i]), int(ids[j])))
                truth.add((a, b))
    assert len(truth) >= 20          # non-vacuous corpus
    got = _pairs_set(dedup_minhash_lsh(SF_DIR))
    # verification re-scores with the exact kernel -> no false positives
    assert got <= truth
    recall = len(got & truth) / len(truth)
    # measured 1.0; >=0.92 leaves margin for banding probability at pairs
    # sitting exactly on the threshold under future corpus regeneration
    assert recall >= 0.92, f"MinHash-LSH recall {recall:.3f} ({len(got)}/{len(truth)})"


@pytest.mark.usefixtures("ray_session")
def test_simhash_recall_is_total_by_pigeonhole(corpus):
    ids, texts = corpus
    sig = H.simhash(pa.array(texts))
    ii, jj = np.triu_indices(len(ids), 1)
    hd = H.hamming_distance(sig[ii], sig[jj])
    k = hd <= SIMHASH_MAX_HAMMING
    ta, tb = ids[ii[k]], ids[jj[k]]
    truth = set(zip(np.minimum(ta, tb).astype(int).tolist(),
                    np.maximum(ta, tb).astype(int).tolist()))
    assert len(truth) >= 15          # non-vacuous corpus
    got = _pairs_set(dedup_simhash(SF_DIR))
    # 4x16-bit pigeonhole: <=3 flipped bits leave >=1 band intact, and
    # in-bucket verification is the exact Hamming kernel -> set equality
    assert got == truth


@pytest.mark.usefixtures("ray_session")
def test_simhash_output_has_no_duplicate_pairs():
    df = dedup_simhash(SF_DIR).to_pandas()
    assert not df.duplicated(["doc_a", "doc_b"]).any()
    assert (df["doc_a"] < df["doc_b"]).all()


@pytest.mark.usefixtures("ray_session")
def test_fingerprint_jaccard_recall_vs_exact(corpus):
    """Winnowing-fingerprint blocking quantified against the exact
    jaccard >= 0.5 pair set. Measured 24/25 = 0.96 on this corpus: the
    single miss is the documented failure mode (a near-dup whose
    minimal rolling-hash window fell inside the edited region, so the
    two docs' fingerprints differ) — the cheaper single-key exchange
    trades exactly that recall against MinHash-LSH's 16-band cost."""
    from pdf_extraction_ray.pipelines.dedup import (
        NGRAM_JACCARD_THRESHOLD, dedup_fingerprint_jaccard)
    ids, texts = corpus
    sets = [H.word_ngrams(t) for t in texts]
    truth = set()
    n = len(ids)
    for i in range(n):
        si = sets[i]
        for j in range(i + 1, n):
            sj = sets[j]
            mi, ma = min(len(si), len(sj)), max(len(si), len(sj))
            if ma and mi / ma < NGRAM_JACCARD_THRESHOLD:
                continue
            if H.jaccard(si, sj) >= NGRAM_JACCARD_THRESHOLD:
                truth.add(tuple(sorted((int(ids[i]), int(ids[j])))))
    assert len(truth) >= 20
    got = _pairs_set(dedup_fingerprint_jaccard(SF_DIR))
    assert got <= truth                     # verification is exact
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"fingerprint recall {recall:.3f}"
