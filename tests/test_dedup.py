"""Dedup-family semantics with planted duplicates (the rows-only queries
need real assertions somewhere: here)."""

import os

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


def make_embeddings_parquet(tmp_path, n=200, d=64, n_labels=8, planted=3):
    """Label-clustered embeddings + `planted` near-identical pairs (the
    duplicate of vec i gets id n+j). Returns (dir, expected_pair_set)."""
    rng = np.random.default_rng(11)
    cents = rng.normal(size=(n_labels, d)) * 3.0
    labels = rng.integers(0, n_labels, size=n)
    vecs = cents[labels] + rng.normal(size=(n, d)) * 0.4
    dup_of = rng.choice(n, size=planted, replace=False)
    dups = vecs[dup_of] + rng.normal(size=(planted, d)) * 0.01
    all_vecs = np.vstack([vecs, dups]).astype(np.float32)
    all_labels = np.concatenate([labels, labels[dup_of]]).astype(np.int32)
    df = pd.DataFrame({
        "vec_id": np.arange(len(all_vecs), dtype=np.int64),
        "embedding": list(all_vecs),
        "label": all_labels})
    out = tmp_path / "emb"; out.mkdir()
    df.to_parquet(out / "embeddings.parquet")
    expected = {(int(i), int(n + j)) for j, i in enumerate(dup_of)}
    return str(out), expected, all_vecs


def _exact_pairs_x1e6(vecs, threshold):
    """Reference all-pairs fixed-point cosine (numpy, no Ray)."""
    from pdf_extraction_ray.functions import vectors as V
    q = V.quantize(vecs.astype(np.float64))
    cos = V.cosine_x1e6(q, q)
    ai, bj = np.nonzero(np.triu(cos >= threshold, k=1))
    return {(int(a), int(b)) for a, b in zip(ai, bj)}, cos


@pytest.mark.usefixtures("ray_session")
def test_embedding_cosine_dedup_finds_planted_pairs(tmp_path):
    from pdf_extraction_ray.pipelines.dedup import (
        EMBED_COSINE_THRESHOLD_X1E6, dedup_embedding_cosine)
    d, expected, vecs = make_embeddings_parquet(tmp_path)
    out = _df(dedup_embedding_cosine(d))
    found = set(map(tuple, out[["vec_a", "vec_b"]].to_numpy()))
    assert expected <= found, f"missing planted pairs: {expected - found}"
    # IVF agreement with the exact brute-force kernel (subset property
    # means IVF can't add pairs; this checks it didn't DROP any either)
    exact, cos = _exact_pairs_x1e6(vecs, EMBED_COSINE_THRESHOLD_X1E6)
    assert found == exact
    # reported cosine values match the kernel exactly
    for _, r in out.iterrows():
        assert r["cosine_x1e6"] == cos[r["vec_a"], r["vec_b"]]


@pytest.mark.usefixtures("ray_session")
def test_embedding_cosine_pairs_matches_duckdb_oracle(tmp_path):
    """Bit-exact fixed-point parity of the exact path vs DuckDB on a
    low threshold that yields real rows."""
    import duckdb
    from pdf_extraction_ray.functions.vectors import pairs_sql
    from pdf_extraction_ray.pipelines.dedup import (
        PAIRS_COSINE_THRESHOLD_X1E6, embedding_cosine_pairs)
    d, _, _ = make_embeddings_parquet(tmp_path)
    ray_df = _df(embedding_cosine_pairs(d)).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{d}/embeddings.parquet')")
    duck = con.sql(pairs_sql(PAIRS_COSINE_THRESHOLD_X1E6)).df()
    assert len(ray_df) > 0, "threshold must yield real rows"
    pd.testing.assert_frame_equal(ray_df, duck, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_partitioned_verify_scale_path_matches_broadcast(tmp_path):
    """Forcing the two-stage hash-exchange path (thresholds=0) must give
    the same verified pairs as the broadcast fast path."""
    import ray.data as rd
    from pdf_extraction_ray.pipelines.dedup import _verify_pairs_jaccard
    d = make_docs_parquet(tmp_path)
    cand = rd.from_pandas(pd.DataFrame({
        "doc_a": pd.Series([0, 1, 2, 0], dtype="int64"),
        "doc_b": pd.Series([40, 41, 3, 40], dtype="int64")}))  # dup pair
    fast = _verify_pairs_jaccard(cand, d, 0.7)
    cand2 = rd.from_pandas(pd.DataFrame({
        "doc_a": pd.Series([0, 1, 2, 0], dtype="int64"),
        "doc_b": pd.Series([40, 41, 3, 40], dtype="int64")}))
    scale = _verify_pairs_jaccard(cand2, d, 0.7, max_broadcast_bytes=0)
    pd.testing.assert_frame_equal(fast, scale)
    found = set(map(tuple, fast[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 40) in found and (1, 41) in found and (2, 3) not in found
    assert len(fast) == len(fast.drop_duplicates(["doc_a", "doc_b"]))


@pytest.mark.usefixtures("ray_session")
def test_distributed_clusters_matches_driver_path():
    """The groupby min-label propagation must resolve the same clusters
    as the driver rounds, including transitivity through a chain."""
    from pdf_extraction_ray.pipelines.dedup import _clusters_distributed
    # chain 5-7-9-11, pair (2,4), isolated pair (100,200)
    pairs = pd.DataFrame({
        "doc_a": pd.Series([7, 9, 5, 2, 100], dtype="int64"),
        "doc_b": pd.Series([9, 11, 7, 4, 200], dtype="int64")})
    # n_coarse=4 keeps the per-round sort exchanges cheap in the 4-CPU
    # test session; production default (64) only runs past the >100k-pair
    # threshold where exchange overhead amortizes
    out = _clusters_distributed(pairs, n_coarse=4).to_pandas()
    reps = dict(zip(out.doc_id, out.cluster_rep))
    assert reps == {5: 5, 7: 5, 9: 5, 11: 5, 2: 2, 4: 2, 100: 100, 200: 100}


@pytest.mark.usefixtures("ray_session")
def test_ensemble_dedup_requires_both_signals(tmp_path):
    """Ensemble dedup keeps an embedding near-dup pair ONLY when the
    aligned documents' texts also agree (word-3-gram Jaccard >= 0.5):
    a pair with near-identical embeddings but disjoint text must be
    dropped; one with matching text must survive with its jaccard."""
    from pdf_extraction_ray.pipelines.dedup import doc_dedup_ensemble

    d, expected, _vecs = make_embeddings_parquet(tmp_path)
    pairs = sorted(expected)
    n_docs = 200 + len(pairs)
    rng = np.random.default_rng(5)
    words = np.array(["alpha", "beta", "gamma", "delta", "eps",
                      "zeta", "eta", "theta", "iota", "kappa"])
    texts = [" ".join(rng.choice(words, size=30)) for _ in range(n_docs)]
    # pair 0: same text on both sides -> must SURVIVE
    a0, b0 = pairs[0]
    texts[b0] = texts[a0]
    # remaining pairs: textually disjoint -> must be DROPPED
    for a, b in pairs[1:]:
        texts[b] = " ".join(f"uniq{b}tok{k}" for k in range(30))
    pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64),
                  "text": texts,
                  "lang": ["en"] * n_docs,
                  "source": ["s"] * n_docs}) \
        .to_parquet(os.path.join(d, "documents.parquet"))

    out = doc_dedup_ensemble(d)
    got = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
    assert (a0, b0) in got
    for a, b in pairs[1:]:
        assert (a, b) not in got, (a, b)
    row = out.set_index(["doc_a", "doc_b"]).loc[(a0, b0)]
    assert int(row["jaccard_x1e6"]) == 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_hot_bucket_star_guard(tmp_path):
    """A boilerplate flood (600 identical docs) must emit LINEAR star
    candidates, not O(n^2) pairs — and cluster resolution must still
    place the whole flood in ONE cluster around the min doc."""
    from pdf_extraction_ray.pipelines.dedup import (
        DEDUP_STAR_THRESHOLD, dedup_clusters, dedup_minhash_lsh)

    n_flood, n_rand = 600, 40
    assert n_flood > DEDUP_STAR_THRESHOLD
    rng = np.random.default_rng(9)
    flood = " ".join(rng.choice(WORDS, size=60))
    texts = [flood] * n_flood + \
        [" ".join(rng.choice(WORDS, size=60)) + f" uniq{i}"
         for i in range(n_rand)]
    d = tmp_path / "flood"
    d.mkdir()
    pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "text": texts,
                  "lang": ["en"] * len(texts),
                  "source": ["s"] * len(texts)}) \
        .to_parquet(d / "documents.parquet")

    pairs = dedup_minhash_lsh(str(d))
    flood_pairs = pairs[(pairs["doc_a"] < n_flood)
                        & (pairs["doc_b"] < n_flood)]
    # star guard: linear in flood size, far below the 179700 all-pairs
    assert len(flood_pairs) <= 2 * n_flood, len(flood_pairs)
    assert (flood_pairs["jaccard_x1e6"] == 1_000_000).all()

    clusters = dedup_clusters(str(d))
    fl = clusters[clusters["doc_id"] < n_flood]
    assert len(fl) == n_flood                      # every flood member
    assert (fl["cluster_rep"] == fl["cluster_rep"].min()).all()


def test_simhash_big_bucket_outlier_cannot_poison_star():
    """A hot simhash bucket sub-groups by exact signature: an unrelated
    smallest-id doc sharing only the 16-bit bucket prefix must NOT
    become the star representative and erase the flood's pairs."""
    from pdf_extraction_ray.pipelines.dedup import (
        _simhash_big_bucket_pairs)

    flood_sig = np.uint64(0xABCD_0000_0000_FF00)
    outlier_sig = np.uint64(0xABCD_0000_0000_00FF)   # hamming 16, same top16
    n_flood = 300
    sig = np.concatenate([[outlier_sig], [flood_sig] * n_flood]) \
        .astype(np.uint64)
    doc = np.arange(n_flood + 1, dtype=np.int64)     # outlier has id 0
    frames = _simhash_big_bucket_pairs(sig, doc, {})
    out = pd.concat(frames, ignore_index=True) if frames else \
        pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
    flood_pairs = out[(out["doc_a"] >= 1) & (out["doc_b"] >= 1)]
    # the flood keeps its full star (rep = doc 1, hamming 0) ...
    assert len(flood_pairs) == n_flood - 1
    assert (flood_pairs["doc_a"] == 1).all()
    assert (flood_pairs["hamming"] == 0).all()
    # ... and the far outlier pairs with nobody
    assert not ((out["doc_a"] == 0) | (out["doc_b"] == 0)).any()


@pytest.mark.usefixtures("ray_session")
def test_ensemble_drops_candidates_without_documents_rows(tmp_path):
    """vec_ids with no matching doc_id must be DROPPED by the text
    verification, not auto-confirmed via jaccard(\"\",\"\") == 1."""
    from pdf_extraction_ray.pipelines.dedup import doc_dedup_ensemble

    d, expected, _ = make_embeddings_parquet(tmp_path)
    # documents table covers NONE of the planted pair ids
    pd.DataFrame({"doc_id": np.arange(5000, 5010, dtype=np.int64),
                  "text": ["some text here"] * 10,
                  "lang": ["en"] * 10, "source": ["s"] * 10}) \
        .to_parquet(os.path.join(d, "documents.parquet"))
    out = doc_dedup_ensemble(d)
    assert len(out) == 0, out


@pytest.mark.usefixtures("ray_session")
def test_containment_catches_subset_dup(tmp_path):
    """A doc fully embedded in a longer doc scores containment 1.0 but
    Jaccard well under the 0.5 dedup bar — the asymmetric metric is
    what catches quotation/excerpt duplication."""
    import os
    d = str(tmp_path)
    core = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    extra = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen seventeen "
             "eighteen nineteen twenty " * 3)
    pd.DataFrame({"doc_id": np.array([0, 1, 2], dtype=np.int64),
                  "text": [core, core + " " + extra,
                           "totally different words here entirely"]}) \
        .to_parquet(os.path.join(d, "documents.parquet"))
    from pdf_extraction_ray.functions.hashing import (containment,
                                                      jaccard,
                                                      word_ngrams)
    a, b = word_ngrams(core), word_ngrams(core + " " + extra)
    assert containment(a, b) >= 0.8 > jaccard(a, b)
    from pdf_extraction_ray.pipelines.dedup import doc_dedup_containment
    out = doc_dedup_containment(d)
    got = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 1) in got
    assert all(2 not in p for p in got)


@pytest.mark.usefixtures("ray_session")
def test_survivorship_keeps_best_quality(tmp_path):
    """Two near-dup docs: the one with the better quality score
    survives even when it has the LARGER doc_id (policy is
    best-score, not first-seen)."""
    import os
    d = str(tmp_path)
    # doc 1 = doc 0 plus punctuation noise (worse quality score);
    # they are near-identical so minhash clusters them
    core = ("the quick brown fox jumps over the lazy dog and then "
            "the small red hen walks around the big green yard " * 6)
    noisy = core.replace("the quick", "the ,,.;;: quick")
    pd.DataFrame({"doc_id": np.array([0, 1], dtype=np.int64),
                  "text": [noisy, core]}) \
        .to_parquet(os.path.join(d, "documents.parquet"))
    from pdf_extraction_ray.pipelines.dedup import (
        corpus_dedup_survivorship)
    out = corpus_dedup_survivorship(d)
    assert len(out) == 1
    assert int(out["survivor"].iloc[0]) == 1     # better score wins
    assert int(out["n_members"].iloc[0]) == 2
    assert int(out["n_dropped"].iloc[0]) == 1


@pytest.mark.usefixtures("ray_session")
def test_survivorship_distributed_paths_match(tmp_path, monkeypatch):
    """Round-3 rewrite: survivorship through the fully-distributed shape
    (membership as a Dataset via a forced _clusters_distributed, scoring
    pass unfiltered via max_broadcast_ids=0) must equal the broadcast
    fast path on the same planted clusters."""
    import os
    from pdf_extraction_ray.pipelines import dedup as D

    d = str(tmp_path)
    base = ("the quick brown fox jumps over the lazy dog and then "
            "the small red hen walks around the big green yard " * 6)
    texts, ids = [], []
    for c in range(3):                         # 3 clusters of 3 near-dups
        # per-cluster vocabulary shift -> clusters share no shingles
        core = " ".join(w + str(c) for w in base.split())
        for k, t in enumerate([
                core.replace(f"the{c} quick{c}", f"the{c} ,,.;; quick{c}"),
                core,
                core.replace(f"dog{c} and{c}", f"dog{c} ;;: and{c}")]):
            ids.append(c * 10 + k)
            texts.append(t)
    pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                  "text": texts}).to_parquet(
        os.path.join(d, "documents.parquet"))

    fast = D.corpus_dedup_survivorship(d)
    assert len(fast) == 3 and (fast["n_members"] == 3).all()
    # clean copy (no punctuation noise) wins in every cluster
    assert list(fast["survivor"]) == [1, 11, 21]

    monkeypatch.setattr(D, "DISTRIBUTED_CLUSTER_THRESHOLD", 0)
    slow = D.corpus_dedup_survivorship(d, max_broadcast_ids=0)
    pd.testing.assert_frame_equal(fast, slow)


@pytest.mark.usefixtures("ray_session")
def test_n_coarse_invariance():
    """Coarse-partition count is a pure performance knob: an oracled
    exchange op must emit identical rows at 16 and 128 partitions
    (VERDICT r2 item 8 — no 64-partition ceiling baked into results)."""
    from pdf_extraction_ray.pipelines.corpus import doc_dedup_blocks
    sf = "/root/testdata/sf0.001"
    a = doc_dedup_blocks(sf, n_coarse=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = doc_dedup_blocks(sf, n_coarse=128).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
