"""Similarity-search family: value-level checks for the approximate
paths (every returned score must match the exact kernel; the recall
queries report real recall)."""

import os

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory):
    rng = np.random.default_rng(21)
    n, d, n_labels = 300, 64, 8
    cents = rng.normal(size=(n_labels, d)) * 3.0
    labels = rng.integers(0, n_labels, size=n)
    vecs = (cents[labels] + rng.normal(size=(n, d)) * 0.5).astype(np.float32)
    out = tmp_path_factory.mktemp("sim")
    pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                  "embedding": list(vecs),
                  "label": labels.astype(np.int32)}) \
        .to_parquet(out / "embeddings.parquet")
    return str(out), vecs


def _exact_cosines(vecs, qid=0):
    m = vecs.astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return m @ m[qid]


@pytest.mark.usefixtures("ray_session")
def test_lsh_scores_exact_and_deterministic(emb_dir):
    from pdf_extraction_ray.pipelines.similarity import (KNN_K,
                                                         knn_cosine_lsh)
    d, vecs = emb_dir
    cos = _exact_cosines(vecs)
    out1 = knn_cosine_lsh(d).to_pandas()
    out2 = knn_cosine_lsh(d).to_pandas()
    pd.testing.assert_frame_equal(out1, out2)        # deterministic
    assert len(out1) == KNN_K
    for _, r in out1.iterrows():                     # scores are exact
        assert abs(r["cosine_x1e6"] - int(cos[r["vec_id"]] * 1e6)) <= 1
    # descending by score
    assert (np.diff(out1["cosine_x1e6"].to_numpy()) <= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_lsh_recall_reported(emb_dir):
    from pdf_extraction_ray.pipelines.similarity import knn_lsh_recall
    d, _ = emb_dir
    r = knn_lsh_recall(d)
    assert 0 <= int(r["recall_x1e6"].iloc[0]) <= 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_ivf_scores_subset_of_exact_topk_universe(emb_dir):
    from pdf_extraction_ray.pipelines.similarity import knn_cosine_ivf
    d, vecs = emb_dir
    cos = _exact_cosines(vecs)
    out = knn_cosine_ivf(d).to_pandas()
    assert len(out) > 0
    for _, r in out.iterrows():
        assert abs(r["cosine_x1e6"] - int(cos[r["vec_id"]] * 1e6)) <= 1


@pytest.mark.usefixtures("ray_session")
def test_kmeans_inertia_monotone_and_partition():
    import duckdb
    import numpy as np
    from pdf_extraction_ray.pipelines import similarity as S

    sf = "/root/testdata/sf0.001"
    n = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{sf}/embeddings.parquet')").fetchone()[0]

    res = S.embeddings_kmeans(sf)
    assert res["n_vectors"].sum() == n          # every vector assigned
    assert (res["n_vectors"] > 0).any()
    total3 = res["inertia_x1e3"].sum()

    # fewer iterations must not produce LOWER inertia (Lloyd's monotone)
    old_iters = S.KMEANS_ITERS
    try:
        S.KMEANS_ITERS = 1
        total1 = S.embeddings_kmeans(sf)["inertia_x1e3"].sum()
    finally:
        S.KMEANS_ITERS = old_iters
    assert total3 <= total1 + 1                  # +1 for int truncation

    # deterministic
    again = S.embeddings_kmeans(sf)
    assert np.array_equal(res["inertia_x1e3"].to_numpy(),
                          again["inertia_x1e3"].to_numpy())


def test_embedding_pca_matches_numpy(ray_session):
    import numpy as np
    import pyarrow.parquet as pq
    from pdf_extraction_ray.pipelines.similarity import embedding_pca_top

    sf = "/root/testdata/sf0.001"
    out = embedding_pca_top(sf)
    m = np.stack(pq.read_table(f"{sf}/embeddings.parquet",
                               columns=["embedding"])["embedding"]
                 .to_numpy(zero_copy_only=False)).astype(np.float64)
    cov = np.cov(m, rowvar=False, bias=True)
    w = np.linalg.eigvalsh(cov)[::-1]
    assert len(out) == 4
    np.testing.assert_allclose(out["eigenvalue"].to_numpy(), w[:4],
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(out["explained_ratio"].to_numpy(),
                               w[:4] / w.sum(), rtol=1e-8, atol=1e-12)
    assert (out["eigenvalue"].to_numpy()[:-1]
            >= out["eigenvalue"].to_numpy()[1:]).all()


def test_quantized_knn_recall_and_minmax(ray_session):
    """int8 scalar quantization: the per-dimension (lo, hi) pass must
    match a direct numpy reduction, and the quantized top-k must keep
    >= 80% recall vs exact brute force (8-bit codes on these smooth
    embeddings should in fact be near-perfect)."""
    import numpy as np
    import pyarrow.parquet as pq
    from pdf_extraction_ray.pipelines.similarity import (
        _dim_minmax, knn_quantized_recall)

    sf = "/root/testdata/sf0.001"
    lo, hi = _dim_minmax(sf)
    m = np.stack(pq.read_table(f"{sf}/embeddings.parquet",
                               columns=["embedding"])["embedding"]
                 .to_numpy(zero_copy_only=False)).astype(np.float64)
    np.testing.assert_array_equal(lo, m.min(axis=0))
    np.testing.assert_array_equal(hi, m.max(axis=0))

    rec = knn_quantized_recall(sf)
    assert int(rec["recall_x1e6"].iloc[0]) >= 800_000


def test_pq_codebooks_and_recall(ray_session):
    """Product quantization: codebooks must have the configured shape
    with no NaNs, the ADC+rerank top-k must keep >= 80% recall vs exact
    brute force, and the recall row must report the 64x storage ratio
    (PQ_M one-byte codes vs float64[64])."""
    import numpy as np
    from pdf_extraction_ray.pipelines.similarity import (
        PQ_K, PQ_M, _pq_codebooks, knn_pq_recall)

    sf = "/root/testdata/sf0.001"
    books = _pq_codebooks(sf)
    assert books.shape == (PQ_M, PQ_K, 64 // PQ_M)
    assert np.isfinite(books).all()

    rec = knn_pq_recall(sf)
    assert int(rec["recall_x1e6"].iloc[0]) >= 800_000
    assert int(rec["compression_x"].iloc[0]) == 64


def _semdedup_postconditions(out, vecs, thr):
    """The greedy-leader output is uniquely characterized by: (a) kept
    vectors in a cluster are pairwise below threshold, (b) every pruned
    vector has an earlier (lower vec_id) kept cluster-mate at/above
    threshold, (c) each cluster's first member is kept."""
    m = vecs.astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    for _, g in out.groupby("cluster"):
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        kept = g["keep"].to_numpy().astype(bool)
        assert kept[0], "first cluster member must be kept"
        sims = m[ids] @ m[ids].T
        kidx = np.nonzero(kept)[0]
        if len(kidx) > 1:
            ks = sims[np.ix_(kidx, kidx)]
            np.fill_diagonal(ks, 0.0)
            assert (ks < thr).all(), "kept vectors must be pairwise < thr"
        for j in np.nonzero(~kept)[0]:
            assert (sims[j, kidx[kidx < j]] >= thr).any(), \
                f"pruned vec {ids[j]} has no earlier kept leader"


@pytest.mark.usefixtures("ray_session")
def test_semdedup_planted_duplicates(tmp_path):
    from pdf_extraction_ray.pipelines.similarity import (
        SEMDEDUP_THRESHOLD_X1E6, embeddings_semdedup)

    rng = np.random.default_rng(5)
    n, d = 60, 16
    vecs = rng.normal(size=(n, d)).astype(np.float64)
    # planted near-dup groups (cosine ~0.9999): leaders 10 and 15
    for grp in ([10, 20, 30], [15, 40]):
        base = vecs[grp[0]]
        for v in grp[1:]:
            vecs[v] = base + rng.normal(size=d) * 1e-3
    pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                  "embedding": list(vecs.astype(np.float32)),
                  "label": np.zeros(n, dtype=np.int32)}) \
        .to_parquet(tmp_path / "embeddings.parquet")

    out = embeddings_semdedup(str(tmp_path)).to_pandas()
    assert len(out) == n
    assert set(out.columns) == {"vec_id", "cluster", "keep"}
    keep = out.set_index("vec_id")["keep"]
    # group leaders kept, followers pruned
    assert keep[10] == 1 and keep[20] == 0 and keep[30] == 0
    assert keep[15] == 1 and keep[40] == 0
    # near-identical vectors must land in the same cluster
    cl = out.set_index("vec_id")["cluster"]
    assert cl[10] == cl[20] == cl[30]
    assert cl[15] == cl[40]
    # random 16-dim vectors are far below 0.95 cosine: everything else kept
    planted_followers = {20, 30, 40}
    assert (out[~out["vec_id"].isin(planted_followers)]["keep"] == 1).all()
    # full postcondition + determinism
    _semdedup_postconditions(out, vecs, SEMDEDUP_THRESHOLD_X1E6 / 1e6)
    again = embeddings_semdedup(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(out, again)


@pytest.mark.usefixtures("ray_session")
def test_semdedup_postconditions_on_clustered_corpus(emb_dir):
    from pdf_extraction_ray.pipelines.similarity import (
        SEMDEDUP_THRESHOLD_X1E6, embeddings_semdedup)

    d, vecs = emb_dir
    out = embeddings_semdedup(d).to_pandas()
    assert len(out) == len(vecs)
    # this fixture's label clusters sit ~0.97 cosine apart internally,
    # so the prune must actually fire
    assert (out["keep"] == 0).any()
    assert (out["keep"] == 1).any()
    _semdedup_postconditions(out, vecs.astype(np.float64),
                             SEMDEDUP_THRESHOLD_X1E6 / 1e6)


@pytest.mark.usefixtures("ray_session")
def test_truncated_knn_prefix_semantics(tmp_path):
    """Truncated search must rank by the PREFIX only: two vectors with
    identical prefixes but different tails tie (vec_id order), and a
    vector aligned with the query prefix beats one aligned only in the
    tail."""
    import os
    import pandas as pd
    from pdf_extraction_ray.pipelines.similarity import (
        TRUNC_D, knn_cosine_truncated, KNN_QUERY_VEC_ID)
    d = str(tmp_path)
    dim = 64
    rng = np.random.default_rng(5)
    base = rng.normal(size=dim)
    rows = []
    # query vector gets id KNN_QUERY_VEC_ID
    rows.append((KNN_QUERY_VEC_ID, base.copy()))
    v_prefix = np.concatenate([base[:TRUNC_D], rng.normal(size=dim - TRUNC_D)])
    v_prefix2 = np.concatenate([base[:TRUNC_D], rng.normal(size=dim - TRUNC_D)])
    v_tail = np.concatenate([-base[:TRUNC_D], base[TRUNC_D:]])
    rows.append((1000, v_prefix))
    rows.append((1001, v_prefix2))
    rows.append((1002, v_tail))
    for i in range(20):
        rows.append((2000 + i, rng.normal(size=dim)))
    df = pd.DataFrame({
        "vec_id": np.array([r[0] for r in rows], dtype=np.int64),
        "embedding": [np.asarray(r[1], dtype=np.float32) for r in rows],
        "label": np.zeros(len(rows), dtype=np.int32)})
    df.to_parquet(os.path.join(d, "embeddings.parquet"))
    out = knn_cosine_truncated(d)
    top4 = list(out.vec_id.iloc[:4])
    # query itself first, then the two identical-prefix vectors in
    # vec_id order; the anti-prefix vector never enters the top
    assert top4[0] == KNN_QUERY_VEC_ID
    assert top4[1:3] == [1000, 1001]
    assert 1002 not in set(out.vec_id)


@pytest.mark.usefixtures("ray_session")
def test_dispersion_collapsed_vs_orthogonal(tmp_path):
    """A corpus of one repeated vector reads ~1.0; an orthonormal basis
    reads ~-1/(n-1) scaled... exactly 0 pairwise dot (quantization
    exact for basis vectors)."""
    import os
    import pandas as pd
    from pdf_extraction_ray.pipelines.similarity import (
        embedding_dispersion)
    d1 = str(tmp_path / "collapsed")
    os.makedirs(d1, exist_ok=True)
    v = np.ones(8, dtype=np.float32)
    pd.DataFrame({"vec_id": np.arange(5, dtype=np.int64),
                  "embedding": [v] * 5,
                  "label": np.zeros(5, dtype=np.int32)}) \
        .to_parquet(os.path.join(d1, "embeddings.parquet"))
    out = embedding_dispersion(d1)
    assert abs(out.mean_pairwise_dot.iloc[0] - 1.0) < 5e-3

    d2 = str(tmp_path / "ortho")
    os.makedirs(d2, exist_ok=True)
    eye = np.eye(8, dtype=np.float32)
    pd.DataFrame({"vec_id": np.arange(8, dtype=np.int64),
                  "embedding": [eye[i] for i in range(8)],
                  "label": np.zeros(8, dtype=np.int32)}) \
        .to_parquet(os.path.join(d2, "embeddings.parquet"))
    out2 = embedding_dispersion(d2)
    assert out2.mean_pairwise_dot.iloc[0] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_hard_negatives_planted(tmp_path):
    """A near-duplicate vector with a DIFFERENT label must win; the
    even-nearer SAME-label duplicate must be skipped."""
    import os
    rng = np.random.default_rng(7)
    d = str(tmp_path)
    base = rng.normal(size=(40, 64)).astype(np.float32)
    q = base[0]
    base[10] = q + rng.normal(scale=1e-3, size=64)   # same label: skip
    base[11] = q + rng.normal(scale=1e-2, size=64)   # diff label: win
    labels = (np.arange(40) % 3).astype(np.int32)
    labels[0] = 0
    labels[10] = 0
    labels[11] = 1
    pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                  "embedding": [v for v in base],
                  "label": labels}) \
        .to_parquet(os.path.join(d, "embeddings.parquet"))
    from pdf_extraction_ray.pipelines.similarity import (
        embedding_hard_negatives)
    out = embedding_hard_negatives(d).set_index("query_id")
    assert out.loc[0, "neg_id"] == 11


@pytest.mark.usefixtures("ray_session")
def test_hard_negatives_matches_duckdb(tmp_path):
    import os
    import duckdb
    rng = np.random.default_rng(8)
    d = str(tmp_path)
    n = 120
    pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                  "embedding": [v for v in
                                rng.normal(size=(n, 64))
                                .astype(np.float32)],
                  "label": (np.arange(n) % 4).astype(np.int32)}) \
        .to_parquet(os.path.join(d, "embeddings.parquet"))
    from pdf_extraction_ray.pipelines.similarity import (
        HARDNEG_SQL, embedding_hard_negatives)
    got = embedding_hard_negatives(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{os.path.join(d, 'embeddings.parquet')}')")
    want = con.sql(HARDNEG_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.usefixtures("ray_session")
def test_triplet_mining_planted(tmp_path):
    """The planted same-label near-dup is the hardest positive and the
    planted cross-label near-dup the hardest negative."""
    import os
    rng = np.random.default_rng(9)
    d = str(tmp_path)
    base = rng.normal(size=(40, 64)).astype(np.float32)
    q = base[0]
    base[10] = q + rng.normal(scale=1e-3, size=64)   # same label: pos
    base[11] = q + rng.normal(scale=1e-2, size=64)   # diff label: neg
    labels = (np.arange(40) % 3).astype(np.int32)
    labels[0] = 0
    labels[10] = 0
    labels[11] = 1
    pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                  "embedding": [v for v in base],
                  "label": labels}) \
        .to_parquet(os.path.join(d, "embeddings.parquet"))
    from pdf_extraction_ray.pipelines.similarity import (
        embedding_triplet_mining)
    out = embedding_triplet_mining(d).set_index("query_id")
    assert out.loc[0, "pos_id"] == 10
    assert out.loc[0, "neg_id"] == 11


@pytest.mark.usefixtures("ray_session")
def test_maxmin_diverse_matches_bruteforce(tmp_path):
    """The distributed greedy must equal the single-process farthest-
    point traversal (same start, same tie rule)."""
    import os
    rng = np.random.default_rng(12)
    d = str(tmp_path)
    n = 60
    vecs = rng.normal(size=(n, 64)).astype(np.float32)
    pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                  "embedding": [v for v in vecs],
                  "label": np.zeros(n, dtype=np.int32)}) \
        .to_parquet(os.path.join(d, "embeddings.parquet"))
    from pdf_extraction_ray.pipelines.similarity import (
        MAXMIN_K, embedding_maxmin_diverse)
    out = embedding_maxmin_diverse(d)
    m = vecs.astype(np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    sel = [0]
    for _ in range(MAXMIN_K - 1):
        mind = 1.0 - (m @ m[sel].T).max(axis=1)
        mind[sel] = -np.inf
        cand = np.lexsort((np.arange(n), -mind))[0]
        sel.append(int(cand))
    assert out["vec_id"].tolist() == sel
    # min-distances are non-increasing along the greedy order
    md = out["mindist_x1e6"].to_numpy()[1:]
    assert (np.diff(md) <= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_bitext_planted_mutual_pairs(tmp_path):
    """Cross-side identical vectors are mutual best matches with the
    top margins; wave-chunked execution (wave_rows=2) is identical to
    the single-wave run."""
    from pdf_extraction_ray.pipelines.similarity import (
        embedding_bitext_margin)
    rng = np.random.default_rng(5)
    d = 64
    n_noise = 20
    vecs = []
    # planted translations: vec 2i (side A) == vec 2i+1 (side B)
    for i in range(3):
        v = rng.normal(size=d)
        vecs.append(v)          # even id
        vecs.append(v)          # odd id
    vecs.extend(rng.normal(size=d) for _ in range(n_noise))
    pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
        "label": np.zeros(len(vecs), dtype=np.int32)}) \
        .to_parquet(tmp_path / "embeddings.parquet")
    out = embedding_bitext_margin(str(tmp_path))
    top3 = set(zip(out["vec_a"].head(3), out["vec_b"].head(3)))
    assert top3 == {(0, 1), (2, 3), (4, 5)}
    # identical quantized vectors: cosine at the 1e6 fixed-point cap
    assert (out["cosine_x1e6"].head(3) >= 999_998).all()
    assert (out["margin_x1e6"].head(3) > 1_000_000).all()
    waved = embedding_bitext_margin(str(tmp_path), wave_rows=2)
    pd.testing.assert_frame_equal(out, waved)


@pytest.mark.usefixtures("ray_session")
def test_bitext_empty_and_single_side(tmp_path):
    from pdf_extraction_ray.pipelines.similarity import (
        embedding_bitext_margin, _BITEXT_COLS)
    d0 = tmp_path / "empty"; d0.mkdir()
    pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                  "embedding": pd.Series(dtype="object"),
                  "label": pd.Series(dtype="int32")}) \
        .to_parquet(d0 / "embeddings.parquet")
    out = embedding_bitext_margin(str(d0))
    assert len(out) == 0 and list(out.columns) == list(_BITEXT_COLS)
    # only even ids: no B side -> empty
    d1 = tmp_path / "oneside"; d1.mkdir()
    pd.DataFrame({"vec_id": np.array([0, 2, 4], dtype=np.int64),
                  "embedding": [np.ones(64, dtype=np.float32)] * 3,
                  "label": np.zeros(3, dtype=np.int32)}) \
        .to_parquet(d1 / "embeddings.parquet")
    assert len(embedding_bitext_margin(str(d1))) == 0


@pytest.mark.usefixtures("ray_session")
def test_bitext_multiwave_scale_path(tmp_path):
    """wave_rows=2 AND merge_driver_max=0 together — multi-wave LAZY
    datasets, the combination the default parameters produce at scale.
    Each wave's closure must see its OWN query block (definition-time
    binding) and its ObjectRef must stay alive until consumption;
    a late-binding capture loses every non-final wave's pairs."""
    from pdf_extraction_ray.pipelines.similarity import (
        embedding_bitext_margin)
    rng = np.random.default_rng(5)
    d = 64
    vecs = []
    for i in range(3):
        v = rng.normal(size=d)
        vecs.append(v)          # even id
        vecs.append(v)          # odd id
    vecs.extend(rng.normal(size=d) for _ in range(20))
    pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
        "label": np.zeros(len(vecs), dtype=np.int32)}) \
        .to_parquet(tmp_path / "embeddings.parquet")
    fast = embedding_bitext_margin(str(tmp_path))
    scale = embedding_bitext_margin(str(tmp_path), wave_rows=2,
                                    merge_driver_max=0)
    pd.testing.assert_frame_equal(fast, scale)
    assert set(zip(scale["vec_a"].head(3), scale["vec_b"].head(3))) \
        == {(0, 1), (2, 3), (4, 5)}


@pytest.mark.usefixtures("ray_session")
def test_bitext_scale_path_zero_pairs_typed_empty(tmp_path):
    """Scale path on a corpus where no pair survives the positive-
    cosine gate (sides are antipodal): must return the SAME typed
    empty frame as the fast path instead of crashing on the
    schema-less all-empty map_groups output."""
    from pdf_extraction_ray.pipelines.similarity import (
        embedding_bitext_margin, _BITEXT_COLS)
    d = 64
    u = np.ones(d, dtype=np.float32)
    n = 8
    pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [u if i % 2 == 0 else -u for i in range(n)],
        "label": np.zeros(n, dtype=np.int32)}) \
        .to_parquet(tmp_path / "embeddings.parquet")
    fast = embedding_bitext_margin(str(tmp_path))
    scale = embedding_bitext_margin(str(tmp_path), wave_rows=2,
                                    merge_driver_max=0)
    assert len(fast) == 0 and len(scale) == 0
    assert list(scale.columns) == list(_BITEXT_COLS)
    pd.testing.assert_frame_equal(fast, scale)


@pytest.mark.usefixtures("ray_session")
def test_bitext_exchange_path_matches_driver_merge(emb_dir):
    """Forcing the qid-keyed exchange merge (merge_driver_max=0) must
    reproduce the driver-merge fast path exactly."""
    from pdf_extraction_ray.pipelines.similarity import (
        embedding_bitext_margin)
    d, _ = emb_dir
    fast = embedding_bitext_margin(d)
    slow = embedding_bitext_margin(d, merge_driver_max=0)
    pd.testing.assert_frame_equal(fast, slow)


def _pca_write(d, vecs, n_shards=1):
    os.makedirs(d, exist_ok=True)
    df = pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
        "label": np.zeros(len(vecs), dtype=np.int32)})
    if n_shards == 1:
        df.to_parquet(os.path.join(d, "embeddings.parquet"))
    else:
        os.makedirs(os.path.join(d, "embeddings.parquet"), exist_ok=True)
        for s in range(n_shards):
            df.iloc[s::n_shards].to_parquet(os.path.join(
                d, "embeddings.parquet", f"part-{s}.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_pca_planted_axis_recovery(tmp_path):
    """Points spread along a planted direction (tiny isotropic noise):
    the pc1 projection must track the planted coordinate almost
    perfectly, and pc1 variance must dominate pc2."""
    from pdf_extraction_ray.pipelines.similarity import (
        embedding_pca_project)
    rng = np.random.default_rng(11)
    d = 64
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    t = rng.normal(size=200) * 5.0
    vecs = t[:, None] * u[None, :] + rng.normal(size=(200, d)) * 0.05
    dd = str(tmp_path / "pca")
    _pca_write(dd, vecs)
    out = embedding_pca_project(dd).to_pandas().sort_values("vec_id")
    p1 = out["pc1_x1e6"].to_numpy(np.float64)
    p2 = out["pc2_x1e6"].to_numpy(np.float64)
    corr = abs(np.corrcoef(p1, t)[0, 1])
    assert corr > 0.999
    assert p1.var() > 50 * p2.var()


@pytest.mark.usefixtures("ray_session")
def test_pca_sharding_invariant(tmp_path):
    """Integer moment partials: 1-shard vs 4-shard layouts give the
    bit-identical projection."""
    from pdf_extraction_ray.pipelines.similarity import (
        embedding_pca_project)
    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(60, 64))
    d1, d4 = str(tmp_path / "s1"), str(tmp_path / "s4")
    _pca_write(d1, vecs, n_shards=1)
    _pca_write(d4, vecs, n_shards=4)
    o1 = embedding_pca_project(d1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    o4 = embedding_pca_project(d4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(o1, o4)


@pytest.mark.usefixtures("ray_session")
def test_pca_empty(tmp_path):
    from pdf_extraction_ray.pipelines.similarity import (
        embedding_pca_project)
    dd = str(tmp_path / "e")
    _pca_write(dd, [])
    out = embedding_pca_project(dd)
    assert len(out) == 0
    assert list(out.columns) == ["vec_id", "pc1_x1e6", "pc2_x1e6"]
