"""Dedup-family semantics with planted duplicates (the rows-only queries
need real assertions somewhere: here)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_extraction_ray.functions import hashing as H


WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def make_docs_parquet(tmp_path):
    rng = np.random.default_rng(9)
    texts = [" ".join(rng.choice(WORDS, size=60)) for _ in range(40)]
    texts.append(texts[0])                     # exact dup of doc 0 -> doc 40
    near = texts[1].split()
    near[5] = "REPLACED"                       # 1-token change -> doc 41
    texts.append(" ".join(near))
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    d = tmp_path / "planted"
    d.mkdir()
    df.to_parquet(d / "documents.parquet")
    return str(d)


class TestMinHash:
    def test_identical_docs_identical_signatures(self):
        t = pa.array(["the quick brown fox jumps", "the quick brown fox jumps",
                      "something else entirely here"])
        sig = H.minhash_signatures(t)
        assert (sig[0] == sig[1]).all()
        assert (sig[0] != sig[2]).any()

    def test_near_dup_shares_bands(self):
        base = " ".join(WORDS * 5)
        toks = base.split()
        toks[7] = "CHANGED"
        t = pa.array([base, " ".join(toks)])
        bands = H.lsh_band_hashes(H.minhash_signatures(t))
        assert (bands[0] == bands[1]).sum() >= 1

    def test_jaccard(self):
        assert H.jaccard({"a", "b"}, {"a", "b"}) == 1.0
        assert H.jaccard({"a"}, {"b"}) == 0.0
        assert H.jaccard(set(), set()) == 1.0

    def test_short_doc_signatures(self):
        t = pa.array(["one two", "one two", ""])
        sig = H.minhash_signatures(t)
        assert (sig[0] == sig[1]).all()
        assert (sig[2] == np.iinfo(np.uint64).max).all()


class TestSimHash:
    def test_deterministic_and_discriminative(self):
        t = pa.array(["aaa bbb ccc ddd", "aaa bbb ccc ddd", "xxx yyy zzz www"])
        s = H.simhash(t)
        assert s[0] == s[1]
        assert H.hamming_distance(np.array([s[0]]), np.array([s[2]]))[0] > 3

    def test_near_dup_low_hamming(self):
        base = " ".join(WORDS * 4)
        toks = base.split()
        toks[3] = "CHANGED"
        s = H.simhash(pa.array([base, " ".join(toks)]))
        # one changed token in 80: a handful of borderline bits may flip
        assert H.hamming_distance(np.array([s[0]]), np.array([s[1]]))[0] <= 8


def _df(res):
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_pipeline_finds_planted_dups(tmp_path):
    from pdf_extraction_ray.pipelines.dedup import dedup_minhash_lsh
    d = make_docs_parquet(tmp_path)
    pairs = _df(dedup_minhash_lsh(d))
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 40) in found          # exact dup
    assert (1, 41) in found          # near dup
    exact = pairs[(pairs.doc_a == 0) & (pairs.doc_b == 40)]
    assert exact["jaccard_x1e6"].iloc[0] == 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_simhash_pipeline_finds_planted_dups(tmp_path):
    from pdf_extraction_ray.pipelines.dedup import dedup_simhash
    d = make_docs_parquet(tmp_path)
    pairs = _df(dedup_simhash(d))
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 40) in found
    zero = pairs[(pairs.doc_a == 0) & (pairs.doc_b == 40)]
    assert zero["hamming"].iloc[0] == 0


@pytest.mark.usefixtures("ray_session")
def test_fingerprint_jaccard_finds_exact_dup(tmp_path):
    from pdf_extraction_ray.pipelines.dedup import dedup_fingerprint_jaccard
    d = make_docs_parquet(tmp_path)
    pairs = _df(dedup_fingerprint_jaccard(d))
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 40) in found          # exact dup always shares its fingerprint


@pytest.mark.usefixtures("ray_session")
def test_exact_dedup_groups_planted(tmp_path):
    from pdf_extraction_ray.pipelines.textops import doc_dedup_exact
    d = make_docs_parquet(tmp_path)
    g = doc_dedup_exact(d).to_pandas()
    assert len(g) == 41                        # 42 docs, one exact dup pair
    assert (g["n_dups"] == 2).sum() == 1
    rep = g[g.n_dups == 2]["rep_doc_id"].iloc[0]
    assert rep == 0                            # min doc_id wins


@pytest.mark.usefixtures("ray_session")
def test_dedup_clusters_transitive(tmp_path):
    """A ring A~B, B~C must resolve to ONE cluster rep (transitivity)."""
    from pdf_extraction_ray.pipelines.dedup import dedup_clusters
    rng = np.random.default_rng(4)
    base = " ".join(rng.choice(WORDS, size=80))
    toks = base.split()
    t1 = list(toks); t1[3] = "ONE"
    t2 = list(toks); t2[70] = "TWO"
    # doc1 ~ doc0 ~ doc2 (doc1 and doc2 differ in 2 tokens -> may or may
    # not pair directly; transitivity must still cluster all three)
    df = pd.DataFrame({"doc_id": [0, 1, 2, 3],
                       "text": [base, " ".join(t1), " ".join(t2),
                                "completely different content here now"]})
    d = tmp_path / "ring"; d.mkdir()
    df.to_parquet(d / "documents.parquet")
    out = dedup_clusters(str(d))
    reps = dict(zip(out.doc_id, out.cluster_rep))
    assert reps.get(0) == 0 and reps.get(1) == 0 and reps.get(2) == 0
    assert 3 not in reps
