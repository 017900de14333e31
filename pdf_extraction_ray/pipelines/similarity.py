"""Similarity search over the ``embeddings`` table (list<float> column):
brute-force cosine top-k as the baseline (numpy matmul per batch against a
broadcast query matrix) and an IVF-bucketed variant as the scale path.
Plus per-label centroid sums with a bit-exact SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .corpus import _typed_empty_on_no_docs
import ray.data as rd
from ray.data.aggregate import Sum

KNN_QUERY_VEC_ID = 0
KNN_K = 10
IVF_NPROBE = 2


def _emb(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding", "label"])


def _query_vec(sf_dir: str, vec_id: int) -> np.ndarray:
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", vec_id)])   # row-group prune
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


@_typed_empty_on_no_docs(_table='embeddings', vec_id='int64', rank='int64')
def knn_cosine(sf_dir: str):
    """Brute-force cosine top-k: broadcast query vector, per-batch numpy
    dot products, global sort + limit. Output (vec_id, rank), rank 1-based;
    ties broken by vec_id (deterministic)."""
    q = _query_vec(sf_dir, KNN_QUERY_VEC_ID)
    qref = ray.put(q / max(np.linalg.norm(q), 1e-12))

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pa.Table.from_arrays(
            [batch["vec_id"], pa.array(m @ qv)], names=["vec_id", "cos"])

    top = (_emb(sf_dir).map_batches(score, batch_format="pyarrow", batch_size=None)
           .sort(["cos", "vec_id"], descending=[True, False])
           .limit(KNN_K))

    def rank(batch: pa.Table) -> pa.Table:
        # runs on the tiny top-k result only
        return pa.Table.from_arrays(
            [batch["vec_id"],
             pa.array(np.arange(1, len(batch) + 1, dtype=np.int64))],
            names=["vec_id", "rank"])

    return rd.from_arrow(rank(pa.Table.from_pandas(
        top.to_pandas(), preserve_index=False)))


KNN_SQL = f"""
SELECT vec_id,
       CAST(ROW_NUMBER() OVER (
            ORDER BY list_cosine_similarity(
                embedding,
                (SELECT embedding FROM embeddings WHERE vec_id = {KNN_QUERY_VEC_ID})
            ) DESC, vec_id) AS BIGINT) AS rank
FROM embeddings
ORDER BY rank
LIMIT {KNN_K}
"""


@_typed_empty_on_no_docs(_table='embeddings', vec_id='int64', cosine_x1e6='int64')
def knn_cosine_ivf(sf_dir: str):
    """IVF-style scale path: vectors bucketed by nearest of the per-label
    centroids (the 'coarse quantizer'); the query probes the IVF_NPROBE
    nearest centroids and scores only those buckets. Not exact — recall
    depends on nprobe — so rows-only checked; determinism is exact."""
    # normalized per-label centroids via the DISTRIBUTED partial-sum pass
    # (the driver only ever sees nlabels x ndims partials — the round-1
    # full-parquet driver read was flagged as the 100-TB weak spot)
    from .dedup import _label_centroids
    cents = _label_centroids(sf_dir)
    q = _query_vec(sf_dir, KNN_QUERY_VEC_ID)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = set(np.argsort(-(cents @ qn))[:IVF_NPROBE].tolist())
    qref = ray.put(qn)

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        norm = np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        mn = m / norm
        bucket = np.asarray([int(b) for b in np.argmax(mn @ cents.T, axis=1)])
        keep = np.isin(bucket, list(probe))
        cos = (mn[keep] @ qv * 1e6).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(batch["vec_id"].to_numpy(zero_copy_only=False)[keep]),
             pa.array(cos)],
            names=["vec_id", "cosine_x1e6"])

    return (_emb(sf_dir).map_batches(score, batch_format="pyarrow", batch_size=None)
            .sort(["cosine_x1e6", "vec_id"], descending=[True, False])
            .limit(KNN_K))


def embedding_centroid_sums(sf_dir: str):
    """Per-(label, dim) integer-floored component sums — a distributed
    'centroid' aggregate with a bit-exact oracle: each component is floored
    to int BEFORE summation, so order cannot perturb the result."""
    def partial(batch: pa.Table) -> pa.Table:
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        fl = np.floor(m * 1e6).astype(np.int64)          # (n, d)
        lab = batch["label"].to_numpy(zero_copy_only=False)
        d = fl.shape[1]
        df = pd.DataFrame({
            "label": np.repeat(lab, d).astype(np.int64),
            "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), len(lab)),
            "sum_x1e6": fl.reshape(-1)})
        g = df.groupby(["label", "dim"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (_emb(sf_dir).map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(["label", "dim"])
            .aggregate(Sum("sum_x1e6", alias_name="sum_x1e6"))
            .sort(["label", "dim"]))


CENTROID_SQL = """
SELECT CAST(label AS BIGINT) AS label, i AS dim,
       CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_x1e6
FROM embeddings, range(1, 65) t(i)
GROUP BY label, i
ORDER BY label, dim
"""


LSH_BITS = 6              # random-hyperplane signature width
LSH_PROBE_RADIUS = 2      # probe all buckets within this Hamming radius
                          # (recall on UNCLUSTERED data ~= probed-bucket
                          # fraction: 22/64 here; tune bits/radius per
                          # selectivity target at real scale)
LSH_SEED = 1234


def _lsh_planes(dim: int) -> np.ndarray:
    """Deterministic random hyperplanes (dim, LSH_BITS)."""
    return np.random.default_rng(LSH_SEED).normal(size=(dim, LSH_BITS))


def _lsh_sig(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit signatures -> int bucket ids."""
    bits = (mat @ planes) > 0.0
    return (bits.astype(np.int64)
            * (1 << np.arange(LSH_BITS, dtype=np.int64))).sum(axis=1)


@_typed_empty_on_no_docs(_table='embeddings', vec_id='int64', cosine_x1e6='int64')
def knn_cosine_lsh(sf_dir: str):
    """LSH-bucketed ANN scale path (random-hyperplane signatures): each
    vector hashes to one of 2^LSH_BITS buckets; the query probes its own
    bucket plus every Hamming-1 neighbor and scores ONLY those rows —
    per-batch work shrinks by the bucket selectivity, and at real scale
    the signature doubles as the partition key so probes touch only
    matching partitions. Approximate (rows-only + recall query), exact
    scores for every returned row (checked in tests vs the fixed-point
    kernel)."""
    q = _query_vec(sf_dir, KNN_QUERY_VEC_ID)
    qn = q / max(np.linalg.norm(q), 1e-12)
    planes = _lsh_planes(len(q))
    qsig = int(_lsh_sig(qn[None, :], planes)[0])
    probe = {qsig}
    frontier = {qsig}
    for _ in range(LSH_PROBE_RADIUS):
        frontier = {s ^ (1 << b) for s in frontier for b in range(LSH_BITS)}
        probe |= frontier
    qref = ray.put((qn, planes, np.asarray(sorted(probe))))

    def score(batch: pa.Table) -> pa.Table:
        qv, pl, pr = ray.get(qref)
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        keep = np.isin(_lsh_sig(mn, pl), pr)
        cos = (mn[keep] @ qv * 1e6).astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(batch["vec_id"].to_numpy(zero_copy_only=False)[keep]),
             pa.array(cos)],
            names=["vec_id", "cosine_x1e6"])

    return (_emb(sf_dir).map_batches(score, batch_format="pyarrow", batch_size=None)
            .sort(["cosine_x1e6", "vec_id"], descending=[True, False])
            .limit(KNN_K))


@_typed_empty_on_no_docs(_table='embeddings', k='int64', bits='int64', probe_radius='int64', recall_x1e6='int64')
def knn_lsh_recall(sf_dir: str):
    """Recall@k of the LSH path vs exact brute force."""
    exact = set(knn_cosine(sf_dir).to_pandas()["vec_id"])
    approx = set(knn_cosine_lsh(sf_dir).to_pandas()["vec_id"])
    hit = len(exact & approx)
    return pd.DataFrame({
        "k": [KNN_K],
        "bits": [LSH_BITS],
        "probe_radius": [LSH_PROBE_RADIUS],
        "recall_x1e6": [int(hit * 1_000_000 / max(len(exact), 1))]})


@_typed_empty_on_no_docs(_table='embeddings', k='int64', nprobe='int64', recall_x1e6='int64')
def knn_ivf_recall(sf_dir: str):
    """Recall@k of the IVF path vs exact brute force (quality measurement
    for the approximate scale path; rows-only)."""
    exact = set(knn_cosine(sf_dir).to_pandas()["vec_id"])
    approx = set(knn_cosine_ivf(sf_dir).to_pandas()["vec_id"])
    hit = len(exact & approx)
    return pd.DataFrame({
        "k": [KNN_K],
        "nprobe": [IVF_NPROBE],
        "recall_x1e6": [int(hit * 1_000_000 / max(len(exact), 1))]})


KNN_MULTI_QUERY_IDS = (0, 100, 200, 300, 400)


@_typed_empty_on_no_docs(_table='embeddings', query_vec_id='int64', vec_id='int64', rank='int64')
def knn_multi_query(sf_dir: str):
    """Batched brute-force KNN: ALL queries score in ONE corpus pass via
    a broadcast (Q x d) query matrix and a per-batch matmul — the shape
    that amortizes the scan across a whole query workload. Each batch
    emits only its per-query partial top-k (bounded: batches x Q x 4k
    rows), so the final exact rank runs over a tiny candidate set."""
    import pyarrow.parquet as pq

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "in", list(KNN_MULTI_QUERY_IDS))])
    qdf = qt.to_pandas().sort_values("vec_id")
    qids = qdf["vec_id"].to_numpy(np.int64)
    qm = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    qref = ray.put((qids, qm))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids, qmat = ray.get(qref)
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        scores = m @ qmat.T                       # (n, Q)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        keep = min(4 * KNN_K, len(vids))          # 4k margin absorbs ties
        rows_q, rows_v, rows_c = [], [], []
        for j, qid in enumerate(ids):
            top = np.argpartition(-scores[:, j], keep - 1)[:keep]
            rows_q.append(np.full(keep, qid, dtype=np.int64))
            rows_v.append(vids[top])
            rows_c.append(scores[top, j])
        return pa.Table.from_pydict({
            "query_vec_id": np.concatenate(rows_q),
            "vec_id": np.concatenate(rows_v),
            "cos": np.concatenate(rows_c)})

    cand = _emb(sf_dir).map_batches(partial_topk, batch_format="pyarrow", batch_size=None) \
        .to_pandas()                  # bounded: n_batches x Q x 4k rows
    out = (cand.sort_values(["query_vec_id", "cos", "vec_id"],
                            ascending=[True, False, True])
           .groupby("query_vec_id").head(KNN_K))
    out["rank"] = out.groupby("query_vec_id").cumcount() + 1
    return out[["query_vec_id", "vec_id", "rank"]] \
        .astype("int64").reset_index(drop=True)


KNN_MULTI_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id IN {KNN_MULTI_QUERY_IDS}),
s AS (SELECT q.qid, e.vec_id,
             ROW_NUMBER() OVER (
                 PARTITION BY q.qid
                 ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC,
                          e.vec_id) AS rank
      FROM embeddings e CROSS JOIN q)
SELECT qid AS query_vec_id, vec_id, CAST(rank AS BIGINT) AS rank
FROM s WHERE rank <= {KNN_K}
ORDER BY query_vec_id, rank
"""


KMEANS_K = 8
KMEANS_ITERS = 3


def _kmeans_centroids(sf_dir: str, k: int = KMEANS_K,
                      iters: int = KMEANS_ITERS):
    """Shared Lloyd's-iteration core: returns (centroids, last-iter stats
    DataFrame) after ``iters`` streaming passes. Deterministic init from
    the first ``k`` vec_ids; the driver only ever holds k x dim floats."""
    # deterministic init: embeddings of vec_id 0..k-1 (pruned read)
    init = (_emb(sf_dir)
            .filter(expr=f"vec_id < {k}")
            .to_pandas().sort_values("vec_id"))
    if init.empty:
        return np.zeros((0, 0)), None
    cents = np.stack(init["embedding"].to_numpy()).astype(np.float64)

    stats = None
    for _ in range(iters):
        cref = ray.put(cents)

        def assign(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
                .astype(np.float64)
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            lab = d2.argmin(axis=1)
            best = d2[np.arange(len(m)), lab]
            k, dim = c.shape
            sums = np.zeros((k, dim))
            np.add.at(sums, lab, m)
            cnt = np.bincount(lab, minlength=k).astype(np.int64)
            sq = np.zeros(k)
            np.add.at(sq, lab, best)
            out = pd.DataFrame({"cluster": np.arange(k, dtype=np.int64),
                                "n": cnt,
                                "sq_dist": sq})
            for j in range(dim):
                out[f"s{j}"] = sums[:, j]
            return pa.Table.from_pandas(out, preserve_index=False) \
                .replace_schema_metadata(None)

        dim = cents.shape[1]
        aggs = [Sum("n", alias_name="n"), Sum("sq_dist", alias_name="sq_dist")]
        aggs += [Sum(f"s{j}", alias_name=f"s{j}") for j in range(dim)]
        stats = (_emb(sf_dir).map_batches(assign, batch_format="pyarrow", batch_size=None)
                 .groupby("cluster").aggregate(*aggs).to_pandas()
                 .sort_values("cluster").reset_index(drop=True))
        n = stats["n"].to_numpy(np.float64)
        sums = stats[[f"s{j}" for j in range(dim)]].to_numpy()
        nonzero = n > 0
        cents = np.where(nonzero[:, None],
                         sums / np.maximum(n[:, None], 1.0), cents)

    return cents, stats


@_typed_empty_on_no_docs(_table='embeddings', cluster='int64', n_vectors='int64', inertia_x1e3='int64')
def embeddings_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means, KMEANS_ITERS iterations — the
    engine's iterative-algorithm representative (not SQL-expressible;
    tests assert inertia is non-increasing and sizes cover N). Each
    iteration is one streaming pass: broadcast centroids, per-batch
    nearest-centroid assignment + per-cluster partial (sum, count,
    sq-dist) rows, tiny keyed Sum; the driver only ever holds k x dim
    floats. Deterministic init from the first k vec_ids."""
    cents, stats = _kmeans_centroids(sf_dir)
    if stats is None:
        return pd.DataFrame({"cluster": pd.Series([], dtype="int64"),
                             "n_vectors": pd.Series([], dtype="int64"),
                             "inertia_x1e3": pd.Series([], dtype="int64")})
    return pd.DataFrame({
        "cluster": stats["cluster"].astype("int64"),
        "n_vectors": stats["n"].astype("int64"),
        "inertia_x1e3": (stats["sq_dist"] * 1e3).astype("int64")})


SEMDEDUP_THRESHOLD_X1E6 = 950_000      # prune at cosine >= 0.95
SEMDEDUP_CHUNK = 2048


@_typed_empty_on_no_docs(_table='embeddings', vec_id='int64', cluster='int64', keep='int64')
def embeddings_semdedup(sf_dir: str, k: int = KMEANS_K,
                        iters: int = KMEANS_ITERS,
                        threshold_x1e6: int = SEMDEDUP_THRESHOLD_X1E6):
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then prune
    within each cluster every vector whose cosine similarity to an
    earlier KEPT (lower vec_id, itself not pruned) member of the same
    cluster reaches the threshold — greedy leader selection, first
    occurrence kept, deterministic.

    Scale shape: the k-means passes stream (see _kmeans_centroids); the
    prune is one assignment pass + ONE groupby("cluster") exchange with
    per-cluster vectorized work (normalized matmul in vec_id-sorted
    chunks: chunk-vs-kept-prefix plus in-chunk upper triangle — never a
    full n^2 similarity matrix in memory at once). Per-cluster cost is
    O(n_c * kept_c * dim); the paper's own scaling lever applies: pick
    k proportional to N so expected cluster size stays bounded. Output:
    (vec_id, cluster, keep 0/1) sorted by vec_id; rows-only check (the
    k-means stage makes it non-SQL) + planted-duplicate unit tests.

    Reference analog: the dedup family of SURVEY.md §2.8 / the
    embedding-cosine tier in pipelines/dedup.py — this composes it with
    clustering so the candidate search is global, not
    threshold-bucketed."""
    cents, _ = _kmeans_centroids(sf_dir, k=k, iters=iters)
    if cents.shape[0] == 0:
        return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                             "cluster": pd.Series([], dtype="int64"),
                             "keep": pd.Series([], dtype="int64")})
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        # (n,k) expanded form, never the (n,k,dim) broadcast
        d2 = ((m * m).sum(axis=1, keepdims=True)
              - 2.0 * (m @ c.T) + (c * c).sum(axis=1))
        lab = d2.argmin(axis=1).astype(np.int64)
        return pa.Table.from_arrays(
            [batch["vec_id"], pa.array(lab),
             batch["embedding"]],
            names=["vec_id", "cluster", "embedding"])

    thr = threshold_x1e6 / 1e6

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        m = np.stack(g["embedding"].to_numpy()[order]).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        kept_rows: list[np.ndarray] = []
        for s in range(0, n, SEMDEDUP_CHUNK):
            e = min(s + SEMDEDUP_CHUNK, n)
            chunk = m[s:e]
            dup = np.zeros(e - s, dtype=bool)
            if kept_rows:
                prior = np.concatenate(kept_rows)
                dup |= (chunk @ prior.T >= thr).any(axis=1)
            # in-chunk: earlier kept members of the same chunk
            sims = chunk @ chunk.T
            for j in range(e - s):
                if dup[j]:
                    continue
                later = sims[j, j + 1:] >= thr
                dup[j + 1:] |= later
            keep[s:e] = ~dup
            if (~dup).any():
                kept_rows.append(chunk[~dup])
        return pd.DataFrame({
            "vec_id": pd.Series(ids, dtype="int64"),
            "cluster": pd.Series(g["cluster"].to_numpy()[order],
                                 dtype="int64"),
            "keep": pd.Series(keep.astype(np.int64), dtype="int64")})

    return (_emb(sf_dir)
            .map_batches(assign, batch_format="pyarrow", batch_size=None)
            .groupby("cluster")
            .map_groups(prune, batch_format="pandas")
            .sort("vec_id"))


# ---------------------------------------------------------------------------
# Distributed PCA (one-pass second-moment partials + tiny driver eigh)
# ---------------------------------------------------------------------------

PCA_TOPK = 4


def embedding_pca_top(sf_dir: str):
    """Top principal components of the embedding matrix: ONE streaming
    pass emits each batch's (sum, count, X^T X) moment partials — a
    d x d float64 block regardless of corpus size — the driver adds
    them, forms the covariance, and eigendecomposes the tiny d x d
    matrix. The classic scale shape for PCA over data too big to
    centralize: no row ever leaves its batch. Output: component rank,
    eigenvalue, explained-variance ratio. Tested against numpy PCA on
    the full matrix (float tolerance — partial-sum order makes bit
    equality meaningless here, unlike the integer aggregates)."""
    ds = _emb(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        xtx = m.T @ m                                   # (d, d)
        s = m.sum(axis=0)                               # (d,)
        return pa.Table.from_pydict({
            "xtx": [xtx.tobytes()],
            "s": [s.tobytes()],
            "n": [np.int64(len(m))],
            "d": [np.int64(m.shape[1])]})

    xtx_sum, s_sum, n_total, d = None, None, 0, 0
    for b in ds.map_batches(partial, batch_format="pyarrow", batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for xtx_raw, s_raw, n, dd in zip(b["xtx"].to_pylist(),
                                         b["s"].to_pylist(),
                                         b["n"].to_pylist(),
                                         b["d"].to_pylist()):
            d = int(dd)
            x = np.frombuffer(xtx_raw).reshape(d, d)
            s = np.frombuffer(s_raw)
            xtx_sum = x if xtx_sum is None else xtx_sum + x
            s_sum = s if s_sum is None else s_sum + s
            n_total += int(n)
    if n_total < 2:
        return pd.DataFrame({"component": pd.Series(dtype="int64"),
                             "eigenvalue": pd.Series(dtype="float64"),
                             "explained_ratio":
                                 pd.Series(dtype="float64")})
    mean = s_sum / n_total
    cov = xtx_sum / n_total - np.outer(mean, mean)
    w = np.linalg.eigvalsh(cov)[::-1]                   # descending
    total = float(w.sum())
    top = w[:PCA_TOPK]
    return pd.DataFrame({
        "component": pd.Series(np.arange(1, len(top) + 1), dtype="int64"),
        "eigenvalue": pd.Series(top, dtype="float64"),
        "explained_ratio": pd.Series(top / total, dtype="float64")})


# ---------------------------------------------------------------------------
# int8 scalar quantization: 4x-smaller vectors + recall evaluation
# ---------------------------------------------------------------------------

QUANT_LEVELS = 255               # 8-bit codes 0..255


def _dim_minmax(sf_dir: str):
    """Pass 1 of scalar quantization: per-dimension global min/max.
    Each batch emits ONE (lo, hi) float-vector pair (2*d floats), so
    the driver-side merge sees |batches| tiny rows — the same
    mergeable-partial shape as the HLL sketches."""
    def partial(batch: pa.Table) -> pa.Table:
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        return pa.Table.from_arrays(
            [pa.array([m.min(axis=0).tobytes()], pa.binary()),
             pa.array([m.max(axis=0).tobytes()], pa.binary())],
            names=["lo", "hi"])

    lo = hi = None
    for b in _emb(sf_dir).map_batches(partial, batch_format="pyarrow",
                                      batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for lob, hib in zip(b["lo"].to_pylist(), b["hi"].to_pylist()):
            l_ = np.frombuffer(lob, dtype=np.float64)
            h_ = np.frombuffer(hib, dtype=np.float64)
            lo = l_ if lo is None else np.minimum(lo, l_)
            hi = h_ if hi is None else np.maximum(hi, h_)
    return lo, hi


@_typed_empty_on_no_docs(_table='embeddings', vec_id='int64', rank='int64')
def knn_cosine_quantized(sf_dir: str):
    """Brute-force top-k over int8 scalar-quantized vectors — the
    4x-smaller storage path for a 100-TB embedding store. Pass 1
    computes per-dimension (lo, hi); pass 2 quantizes each batch to
    uint8 codes, immediately dequantizes for scoring, and ships only
    its local candidates. Same output contract as ``knn_cosine``
    (vec_id, rank); quality is pinned by ``knn_quantized_recall``."""
    lo, hi = _dim_minmax(sf_dir)
    if lo is None:
        return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64")})
    scale = np.where(hi > lo, (hi - lo) / QUANT_LEVELS, 1.0)
    q = _query_vec(sf_dir, KNN_QUERY_VEC_ID)
    qref = ray.put((q / max(np.linalg.norm(q), 1e-12), lo, scale))

    def score(batch: pa.Table) -> pa.Table:
        qv, lo_, sc_ = ray.get(qref)
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        # quantize -> uint8 codes (what a real store would persist) ...
        codes = np.clip(np.rint((m - lo_) / sc_), 0,
                        QUANT_LEVELS).astype(np.uint8)
        # ... and score on the DEQUANTIZED reconstruction
        deq = lo_ + codes.astype(np.float64) * sc_
        deq /= np.maximum(np.linalg.norm(deq, axis=1, keepdims=True),
                          1e-12)
        return pa.Table.from_arrays(
            [batch["vec_id"], pa.array(deq @ qv)], names=["vec_id", "cos"])

    top = (_emb(sf_dir).map_batches(score, batch_format="pyarrow",
                                    batch_size=None)
           .sort(["cos", "vec_id"], descending=[True, False])
           .limit(KNN_K)).to_pandas()
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["vec_id", "rank"]].astype({"vec_id": "int64"})


@_typed_empty_on_no_docs(_table='embeddings', k='int64', levels='int64', recall_x1e6='int64')
def knn_quantized_recall(sf_dir: str):
    """Recall@k of the int8-quantized path vs exact brute force."""
    exact = set(knn_cosine(sf_dir).to_pandas()["vec_id"])
    approx = set(knn_cosine_quantized(sf_dir)["vec_id"])
    hit = len(exact & approx)
    return pd.DataFrame({
        "k": [KNN_K],
        "levels": [QUANT_LEVELS],
        "recall_x1e6": [int(hit * 1_000_000 / max(len(exact), 1))]})


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: subspace codebooks + ADC scoring
# ---------------------------------------------------------------------------

PQ_M = 8          # subspaces (codes are PQ_M bytes per vector: 64x
#                   smaller than float64[64] — the real 100-TB ANN path)
PQ_K = 32         # centroids per subspace codebook
PQ_ITERS = 4


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    """(n, d) float64 matrix from the list<float> embedding column via
    one offset-aware flatten + reshape (no per-row object boxing)."""
    import pyarrow.compute as pc
    col = batch.column("embedding")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), -1).astype(np.float64)


def _pq_assign(sub: np.ndarray, book: np.ndarray) -> np.ndarray:
    """Nearest-centroid labels via the BLAS form: argmin ||x-c||^2 =
    argmax (x.c - |c|^2/2) — one (n x k) matmul instead of the (n, k,
    ds) broadcast-subtract cube."""
    return (sub @ book.T - 0.5 * (book * book).sum(axis=1)).argmax(axis=1)


def _pq_codebooks(sf_dir: str, m: int = PQ_M, k: int = PQ_K,
                  iters: int = PQ_ITERS):
    """Train M subspace codebooks with Lloyd's iterations over UNIT
    vectors — all M subspaces learned in the SAME streaming pass, and
    each iteration is ONE tree-reduced `Dataset.aggregate` whose
    accumulator is the dense (m, k, 1+ds) count+sum tensor (~16 KB):
    no key shuffle anywhere, the driver only ever receives the reduced
    tensor. Driver state is the codebook, never the corpus.
    Deterministic init from the first k vec_ids."""
    from ray.data.aggregate import AggregateFn
    init = (_emb(sf_dir).filter(expr=f"vec_id < {k}")
            .to_pandas().sort_values("vec_id"))
    if init.empty:
        return None
    x0 = _normalize_rows(np.stack(init["embedding"].to_numpy())
                         .astype(np.float64))
    d = x0.shape[1]
    ds_ = d // m
    books = np.stack([x0[:, j * ds_:(j + 1) * ds_] for j in range(m)])

    for _ in range(iters):
        bref = ray.put(books)

        def acc_block(acc: np.ndarray, block: pa.Table) -> np.ndarray:
            if block.num_rows == 0:
                return acc
            bks = ray.get(bref)
            x = _normalize_rows(_emb_matrix(block))
            for j in range(m):
                sub = x[:, j * ds_:(j + 1) * ds_]
                lab = _pq_assign(sub, bks[j])
                acc[j, :, 0] += np.bincount(lab, minlength=k)
                np.add.at(acc[j, :, 1:], lab, sub)
            return acc

        fn = AggregateFn(
            init=lambda _k: np.zeros((m, k, 1 + ds_)),
            merge=lambda a, b: a + b,
            accumulate_block=acc_block, name="pq")
        st = _emb(sf_dir).aggregate(fn)["pq"]
        n = st[:, :, 0]
        books = np.where(n[:, :, None] > 0,
                         st[:, :, 1:] / np.maximum(n[:, :, None], 1.0),
                         books)
    return books


PQ_SHORTLIST = 100   # ADC candidates kept for the exact re-rank


@_typed_empty_on_no_docs(_table='embeddings', vec_id='int64', rank='int64')
def knn_cosine_pq(sf_dir: str):
    """ANN top-k via product quantization with asymmetric distance
    computation (ADC) plus exact re-rank — the production PQ shape:
    corpus vectors are normalized and encoded to PQ_M one-byte codes
    against the trained codebooks; the query builds an (M x K)
    inner-product lookup table once, and every vector's approximate
    cosine is M table lookups summed — no float reconstruction in the
    scan. The ADC pass only has to get the true neighbors into its
    top-PQ_SHORTLIST; a second exact pass re-scores just those
    (bounded) candidates. Same output contract as ``knn_cosine``;
    quality pinned by ``knn_pq_recall``."""
    books = _pq_codebooks(sf_dir)
    if books is None:
        return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64")})
    m, k, ds_ = books.shape
    q = _query_vec(sf_dir, KNN_QUERY_VEC_ID)
    qn = q / max(np.linalg.norm(q), 1e-12)
    lut = np.stack([books[j] @ qn[j * ds_:(j + 1) * ds_]
                    for j in range(m)])          # (m, k) ip table
    ref = ray.put((books, lut))

    def score(batch: pa.Table) -> pa.Table:
        bks, lt = ray.get(ref)
        x = _normalize_rows(_emb_matrix(batch))
        approx = np.zeros(len(x))
        for j in range(bks.shape[0]):
            sub = x[:, j * ds_:(j + 1) * ds_]
            codes = _pq_assign(sub, bks[j])      # the stored byte
            approx += lt[j][codes]               # ADC lookup
        return pa.Table.from_arrays(
            [batch["vec_id"], pa.array(approx)], names=["vec_id", "cos"])

    shortlist = (_emb(sf_dir)
                 .map_batches(score, batch_format="pyarrow",
                              batch_size=None)
                 .sort(["cos", "vec_id"], descending=[True, False])
                 .limit(PQ_SHORTLIST)).to_pandas()
    cand = np.sort(shortlist["vec_id"].to_numpy(np.int64))
    cref = ray.put((cand, qn))

    def exact(batch: pa.Table) -> pa.Table:     # re-rank candidates only
        ids, qv = ray.get(cref)
        v = batch["vec_id"].to_numpy(zero_copy_only=False)
        mask = np.isin(v, ids)
        if not mask.any():
            return pa.table({"vec_id": pa.array([], type=pa.int64()),
                             "cos": pa.array([], type=pa.float64())})
        x = _normalize_rows(
            np.stack(batch["embedding"].to_numpy(zero_copy_only=False)
                     [mask]).astype(np.float64))
        return pa.Table.from_arrays(
            [pa.array(v[mask]), pa.array(x @ qv)],
            names=["vec_id", "cos"])

    top = (_emb(sf_dir).map_batches(exact, batch_format="pyarrow",
                                    batch_size=None)
           .sort(["cos", "vec_id"], descending=[True, False])
           .limit(KNN_K)).to_pandas()
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["vec_id", "rank"]].astype({"vec_id": "int64"})


@_typed_empty_on_no_docs(_table='embeddings', k='int64', m_codes='int64', compression_x='int64', recall_x1e6='int64')
def knn_pq_recall(sf_dir: str):
    """Recall@k of the PQ/ADC path vs exact brute force, with the
    storage ratio the codes achieve (bytes per vector: PQ_M vs 8*d)."""
    exact = set(knn_cosine(sf_dir).to_pandas()["vec_id"])
    approx = set(knn_cosine_pq(sf_dir)["vec_id"])
    hit = len(exact & approx)
    return pd.DataFrame({
        "k": [KNN_K],
        "m_codes": [PQ_M],
        "compression_x": [64 * 8 // PQ_M],
        "recall_x1e6": [int(hit * 1_000_000 / max(len(exact), 1))]})




def embedding_norms(sf_dir: str):
    """Per-vector L2 norm — the normalization precursor of every cosine
    pipeline, as an ORACLED float op: both engines sum the squared
    components LEFT-TO-RIGHT in float64 (python loop here, DuckDB's
    sequential list_aggregate there) and take one IEEE sqrt, so the
    doubles are bit-identical (numpy's pairwise np.sum would NOT be).
    Output: (vec_id, l2_norm)."""
    import pyarrow.dataset as pads
    if pads.dataset(f"{sf_dir}/embeddings.parquet").count_rows() == 0:
        return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                             "l2_norm": pd.Series(dtype="float64")})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def norms(batch: pa.Table) -> pa.Table:
        import math
        embs = batch["embedding"].to_pylist()
        out = []
        for row in embs:
            acc = 0.0
            for v in row:                     # left-to-right, like SQL
                fv = float(v)
                acc += fv * fv
            out.append(math.sqrt(acc))
        return pa.Table.from_pydict({
            "vec_id": batch["vec_id"].to_numpy(zero_copy_only=False),
            "l2_norm": np.asarray(out)})

    return ds.map_batches(norms, batch_format="pyarrow", batch_size=None)


NORMS_SQL = """
SELECT vec_id,
       sqrt(list_aggregate(
            list_transform(embedding, v -> CAST(v AS DOUBLE) * v),
            'sum')) AS l2_norm
FROM embeddings
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Corpus dispersion: mean pairwise dot via the sum-of-vectors moment
# ---------------------------------------------------------------------------

DISPERSION_SCALE = 1000      # unit vectors quantized to 1e-3 components


def embedding_dispersion(sf_dir: str):
    """Mean pairwise similarity of the WHOLE embedding corpus in one
    streaming pass — the collapse/diversity diagnostic (a healthy
    corpus sits near 0, a collapsed one near 1). Uses the moment
    identity sum_{i!=j} q_i.q_j = ||sum_i q_i||^2 - sum_i ||q_i||^2, so
    no pair is ever materialized: each vector is normalized (left-to-
    right float64 sums, the oracle's list_aggregate order), quantized
    to integer 1e-3 units, and the only aggregate is (n, 64 per-dim
    int sums, int sum of squared norms). The final statistic is one
    exact-int -> double division. Output: (n_vectors,
    mean_pairwise_dot)."""
    import math

    import pyarrow.dataset as pads

    from ..functions.arrow_utils import round_half_away

    empty = pd.DataFrame({"n_vectors": pd.Series(dtype="int64"),
                          "mean_pairwise_dot": pd.Series(dtype="float64")})
    if pads.dataset(f"{sf_dir}/embeddings.parquet").count_rows() < 2:
        return empty
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        embs = batch["embedding"].to_pylist()
        qs = []
        for row in embs:
            acc = 0.0
            for v in row:                    # left-to-right, like SQL
                fv = float(v)
                acc += fv * fv
            nrm = math.sqrt(acc)
            fr = np.asarray(row, dtype=np.float64)
            q = round_half_away(fr / nrm * DISPERSION_SCALE) \
                if nrm > 0.0 else np.zeros(len(fr), dtype=np.int64)
            qs.append(q.astype(np.int64))
        m = np.stack(qs)
        out = {"n": [np.int64(len(qs))],
               "ssq": [int((m * m).sum())]}
        s = m.sum(axis=0)
        for d in range(m.shape[1]):
            out[f"s{d}"] = [int(s[d])]
        return pa.Table.from_pydict(out)

    first = ds.take(1)[0]["embedding"]
    dim = len(first)
    cols = ["n", "ssq"] + [f"s{d}" for d in range(dim)]
    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .aggregate(*[Sum(c, alias_name=c) for c in cols]))
    n = int(agg["n"])
    if n < 2:
        return empty
    num = sum(int(agg[f"s{d}"]) ** 2 for d in range(dim)) \
        - int(agg["ssq"])
    den = n * (n - 1) * DISPERSION_SCALE * DISPERSION_SCALE
    return pd.DataFrame({"n_vectors": [n],
                         "mean_pairwise_dot": [float(num) / float(den)]})


DISPERSION_SQL = f"""
WITH q AS (
  SELECT list_transform(embedding,
           v -> CAST(ROUND(CAST(v AS DOUBLE)
                     / sqrt(list_aggregate(
                         list_transform(embedding,
                                        x -> CAST(x AS DOUBLE) * x),
                         'sum')) * {DISPERSION_SCALE}) AS BIGINT)) AS qv
  FROM embeddings),
dims AS (
  SELECT unnest(generate_series(1, (SELECT MAX(len(qv)) FROM q))) AS d),
s AS (
  SELECT d, SUM(CAST(qv[d] AS HUGEINT)) AS sd
  FROM q CROSS JOIN dims GROUP BY d),
tot AS (
  SELECT (SELECT SUM(sd * sd) FROM s) AS sq,
         (SELECT SUM(CAST(list_aggregate(
              list_transform(qv, x -> CAST(x AS HUGEINT) * x), 'sum')
              AS HUGEINT)) FROM q) AS ssq,
         (SELECT COUNT(*) FROM q) AS n)
SELECT CAST(n AS BIGINT) AS n_vectors,
       CAST(sq - ssq AS DOUBLE)
         / CAST(CAST(n AS HUGEINT) * (n - 1)
                * {DISPERSION_SCALE * DISPERSION_SCALE} AS DOUBLE)
           AS mean_pairwise_dot
FROM tot
WHERE n >= 2
"""


# ---------------------------------------------------------------------------
# Matryoshka-style truncated-dimension search
# ---------------------------------------------------------------------------

TRUNC_D = 16


@_typed_empty_on_no_docs(_table='embeddings', vec_id='int64', rank='int64')
def knn_cosine_truncated(sf_dir: str):
    """Brute-force cosine top-k over only the FIRST TRUNC_D dimensions —
    the Matryoshka/truncated-embedding cheap path (score on a prefix of
    the vector, 4x less compute and bandwidth; re-rank with full dims
    when needed). Same contract as ``knn_cosine`` (vec_id, rank);
    prefix vectors are re-normalized before scoring on both engines."""
    q = _query_vec(sf_dir, KNN_QUERY_VEC_ID)[:TRUNC_D]
    qref = ray.put(q / max(np.linalg.norm(q), 1e-12))

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)[:, :TRUNC_D]
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pa.Table.from_arrays(
            [batch["vec_id"], pa.array(m @ qv)], names=["vec_id", "cos"])

    top = (_emb(sf_dir).map_batches(score, batch_format="pyarrow",
                                    batch_size=None)
           .sort(["cos", "vec_id"], descending=[True, False])
           .limit(KNN_K)).to_pandas()
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["vec_id", "rank"]].astype({"vec_id": "int64"})


KNN_TRUNC_SQL = f"""
SELECT vec_id,
       CAST(ROW_NUMBER() OVER (
            ORDER BY list_cosine_similarity(
                embedding[1:{TRUNC_D}],
                (SELECT embedding[1:{TRUNC_D}] FROM embeddings
                 WHERE vec_id = {KNN_QUERY_VEC_ID})
            ) DESC, vec_id) AS BIGINT) AS rank
FROM embeddings
ORDER BY rank
LIMIT {KNN_K}
"""


@_typed_empty_on_no_docs(_table='embeddings', k='int64', trunc_d='int64', recall_x1e6='int64')
def knn_truncated_recall(sf_dir: str):
    """Recall@k of prefix-dimension search vs exact full-dim brute
    force — the quality/number-of-dims trade curve's measured point.
    The synthetic embeddings are isotropic random (no Matryoshka
    training concentrates signal in the prefix), so this measures the
    UNTRAINED floor; with real MRL embeddings the same operator reads
    near 1.0."""
    exact = set(knn_cosine(sf_dir).to_pandas()["vec_id"])
    approx = set(knn_cosine_truncated(sf_dir)["vec_id"])
    hit = len(exact & approx)
    return pd.DataFrame({
        "k": [KNN_K],
        "trunc_d": [TRUNC_D],
        "recall_x1e6": [int(hit * 1_000_000 / max(len(exact), 1))]})


# ---------------------------------------------------------------------------
# Filtered ANN: metadata predicate + top-k in one pass
# ---------------------------------------------------------------------------

KNN_FILTER_LABELS = (2, 5)


@_typed_empty_on_no_docs(_table='embeddings', vec_id='int64', rank='int64')
def knn_cosine_filtered(sf_dir: str):
    """Filtered vector search — the vector-DB pattern where a metadata
    predicate (label IN {KNN_FILTER_LABELS}) restricts the candidate
    set BEFORE scoring: the filter pushes into the same per-batch pass
    as the dot products (pre-filtering, the exact-recall strategy;
    post-filtering top-k would undershoot k), so non-matching vectors
    are never normalized or scored. Same broadcast-query /
    partial-top-k shape as ``knn_cosine``. Output: (vec_id, rank)."""
    q = _query_vec(sf_dir, KNN_QUERY_VEC_ID)
    qref = ray.put(q / max(np.linalg.norm(q), 1e-12))
    lab = pa.array(np.array(KNN_FILTER_LABELS, dtype=np.int32))

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = batch.filter(pc.is_in(batch["label"], value_set=lab))
        if len(t) == 0:
            return pa.Table.from_pydict(
                {"vec_id": [], "cos": []},
                schema=pa.schema([("vec_id", pa.int64()),
                                  ("cos", pa.float64())]))
        qv = ray.get(qref)
        m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pa.Table.from_arrays(
            [t["vec_id"], pa.array(m @ qv)], names=["vec_id", "cos"])

    top = (_emb(sf_dir)
           .map_batches(score, batch_format="pyarrow", batch_size=None)
           .sort(["cos", "vec_id"], descending=[True, False])
           .limit(KNN_K))

    def rank(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch["vec_id"],
             pa.array(np.arange(1, len(batch) + 1, dtype=np.int64))],
            names=["vec_id", "rank"])

    return rd.from_arrow(rank(pa.Table.from_pandas(
        top.to_pandas(), preserve_index=False)))


KNN_FILTERED_SQL = f"""
SELECT vec_id,
       CAST(ROW_NUMBER() OVER (
            ORDER BY list_cosine_similarity(
                embedding,
                (SELECT embedding FROM embeddings
                 WHERE vec_id = {KNN_QUERY_VEC_ID})
            ) DESC, vec_id) AS BIGINT) AS rank
FROM embeddings
WHERE label IN {KNN_FILTER_LABELS}
ORDER BY rank
LIMIT {KNN_K}
"""


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive training pairs)
# ---------------------------------------------------------------------------

HARDNEG_NQ = 8       # anchor queries: the first NQ vec_ids


def embedding_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training: for each of the
    first {HARDNEG_NQ} anchor vectors, the single most-cosine-similar
    vector with a DIFFERENT label — the 'looks like me but isn't my
    class' example a triplet/InfoNCE loss wants. The anchor matrix
    broadcasts once (bounded by NQ); every batch computes one
    (n x NQ) matmul against it, masks same-label rows, and emits at
    most NQ partial champions, so the reduce sees nbatches*NQ rows
    regardless of corpus size. Ties break on vec_id ascending (same
    rule as the oracle's ORDER BY). Output: (query_id, neg_id)."""
    empty = pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                          "neg_id": pd.Series(dtype="int64")})
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"],
                      filters=[("vec_id", "<", HARDNEG_NQ)])
    if t.num_rows == 0:
        return empty
    qdf = t.to_pandas().sort_values("vec_id")
    qm = _normalize_rows(np.stack(qdf["embedding"].to_numpy())
                         .astype(np.float64))
    qids = qdf["vec_id"].to_numpy(np.int64)
    qlab = qdf["label"].to_numpy(np.int64)
    ref = ray.put((qm, qids, qlab))

    def champions(batch: pa.Table) -> pa.Table:
        qm_, qids_, qlab_ = ray.get(ref)
        x = _normalize_rows(_emb_matrix(batch))
        vids = batch["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        labs = batch["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sims = x @ qm_.T                       # (n, NQ)
        out_q, out_id, out_cos = [], [], []
        for qi in range(len(qids_)):
            m = labs != qlab_[qi]
            if not m.any():
                continue
            s = sims[m][:, qi]
            v = vids[m]
            best = np.lexsort((v, -s))[0]      # max cos, then min id
            out_q.append(qids_[qi])
            out_id.append(int(v[best]))
            out_cos.append(float(s[best]))
        return pa.Table.from_pydict(
            {"query_id": pa.array(out_q, type=pa.int64()),
             "neg_id": pa.array(out_id, type=pa.int64()),
             "cos": pa.array(out_cos, type=pa.float64())})

    parts = (_emb(sf_dir)
             .map_batches(champions, batch_format="pyarrow",
                          batch_size=None).to_pandas())
    if parts.empty:
        return empty
    win = parts.sort_values(["query_id", "cos", "neg_id"],
                            ascending=[True, False, True]) \
        .drop_duplicates("query_id", keep="first")
    return win[["query_id", "neg_id"]].astype("int64") \
        .sort_values("query_id").reset_index(drop=True)


HARDNEG_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe, label AS ql
  FROM embeddings WHERE vec_id < {HARDNEG_NQ}),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding, q.qe) AS cos,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(
                                e.embedding, q.qe) DESC,
                            e.vec_id ASC) AS rn
  FROM embeddings e JOIN q ON e.label <> q.ql)
SELECT query_id, CAST(vec_id AS BIGINT) AS neg_id
FROM s WHERE rn = 1 ORDER BY query_id
"""


def embedding_triplet_mining(sf_dir: str):
    """Triplet mining for metric learning: for each anchor (the first
    {HARDNEG_NQ} vec_ids), BOTH the hardest positive (most-similar
    vector with the SAME label, self excluded) and the hardest negative
    (most-similar with a DIFFERENT label) — the (a, p, n) triple a
    triplet loss trains on. Same bounded-champions shape as
    ``embedding_hard_negatives``: one broadcast anchor matrix, one
    (n x NQ) matmul per batch, <= 2*NQ partial rows per batch. Ties
    break on vec_id ascending. Output: (query_id, pos_id, neg_id)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("query_id", "pos_id", "neg_id")})
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"],
                      filters=[("vec_id", "<", HARDNEG_NQ)])
    if t.num_rows == 0:
        return empty
    qdf = t.to_pandas().sort_values("vec_id")
    qm = _normalize_rows(np.stack(qdf["embedding"].to_numpy())
                         .astype(np.float64))
    qids = qdf["vec_id"].to_numpy(np.int64)
    qlab = qdf["label"].to_numpy(np.int64)
    ref = ray.put((qm, qids, qlab))

    def champions(batch: pa.Table) -> pa.Table:
        qm_, qids_, qlab_ = ray.get(ref)
        x = _normalize_rows(_emb_matrix(batch))
        vids = batch["vec_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        labs = batch["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sims = x @ qm_.T
        out = {"query_id": [], "role": [], "cand_id": [], "cos": []}
        for qi in range(len(qids_)):
            for role, m in ((0, (labs == qlab_[qi])
                             & (vids != qids_[qi])),
                            (1, labs != qlab_[qi])):
                if not m.any():
                    continue
                s = sims[m][:, qi]
                v = vids[m]
                best = np.lexsort((v, -s))[0]
                out["query_id"].append(int(qids_[qi]))
                out["role"].append(role)
                out["cand_id"].append(int(v[best]))
                out["cos"].append(float(s[best]))
        return pa.Table.from_pydict(
            {"query_id": pa.array(out["query_id"], type=pa.int64()),
             "role": pa.array(out["role"], type=pa.int8()),
             "cand_id": pa.array(out["cand_id"], type=pa.int64()),
             "cos": pa.array(out["cos"], type=pa.float64())})

    parts = (_emb(sf_dir)
             .map_batches(champions, batch_format="pyarrow",
                          batch_size=None).to_pandas())
    if parts.empty:
        return empty
    win = parts.sort_values(["query_id", "role", "cos", "cand_id"],
                            ascending=[True, True, False, True]) \
        .drop_duplicates(["query_id", "role"], keep="first")
    pos = win[win["role"] == 0].set_index("query_id")["cand_id"]
    neg = win[win["role"] == 1].set_index("query_id")["cand_id"]
    both = pos.index.intersection(neg.index).sort_values()
    return pd.DataFrame({"query_id": both.to_numpy(np.int64),
                         "pos_id": pos.loc[both].to_numpy(np.int64),
                         "neg_id": neg.loc[both].to_numpy(np.int64)})


TRIPLET_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe, label AS ql
  FROM embeddings WHERE vec_id < {HARDNEG_NQ}),
p AS (
  SELECT q.query_id, e.vec_id,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(
                                e.embedding, q.qe) DESC,
                            e.vec_id ASC) AS rn
  FROM embeddings e JOIN q
    ON e.label = q.ql AND e.vec_id <> q.query_id),
n AS (
  SELECT q.query_id, e.vec_id,
         ROW_NUMBER() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(
                                e.embedding, q.qe) DESC,
                            e.vec_id ASC) AS rn
  FROM embeddings e JOIN q ON e.label <> q.ql)
SELECT p.query_id, CAST(p.vec_id AS BIGINT) AS pos_id,
       CAST(n.vec_id AS BIGINT) AS neg_id
FROM p JOIN n ON p.query_id = n.query_id
WHERE p.rn = 1 AND n.rn = 1
ORDER BY p.query_id
"""


MAXMIN_K = 8


def embedding_maxmin_diverse(sf_dir: str):
    """Max-min (k-center greedy / farthest-point) DIVERSE subset
    selection: starting from the anchor vec_id 0, repeatedly pick the
    vector whose minimum cosine distance to everything selected so far
    is LARGEST — the coverage-maximizing curation pass a training set
    runs to avoid redundant examples (2-approximation to the k-center
    optimum). Each round is one distributed argmax: the selected
    matrix broadcasts (bounded by K), every batch emits its single
    champion (max min-distance, ties to the smaller vec_id), and the
    driver reduces nbatches rows. K rounds = K bounded scans; no
    pairwise matrix ever materializes. Deterministic; rows-only
    checked, unit-tested against the brute-force greedy.
    Output: (sel_rank, vec_id, mindist_x1e6)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("sel_rank", "vec_id", "mindist_x1e6")})
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", 0)])
    if t.num_rows == 0:
        return empty
    v0 = np.asarray(t["embedding"][0].as_py(), dtype=np.float64)
    v0 /= max(np.linalg.norm(v0), 1e-12)
    selected = [(0, 0)]                     # (vec_id, mindist_x1e6)
    sel_mat = v0[None, :]

    for _ in range(MAXMIN_K - 1):
        ref = ray.put((sel_mat, np.array([i for i, _ in selected],
                                         dtype=np.int64)))

        def champion(batch: pa.Table) -> pa.Table:
            sm, sids = ray.get(ref)
            x = _normalize_rows(_emb_matrix(batch))
            vids = batch["vec_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            keep = ~np.isin(vids, sids)
            if not keep.any():
                return pa.table({"vec_id": pa.array([], type=pa.int64()),
                                 "mind": pa.array([], type=pa.float64())})
            x, vids = x[keep], vids[keep]
            mind = 1.0 - (x @ sm.T).max(axis=1)
            best = np.lexsort((vids, -mind))[0]
            return pa.table({"vec_id": pa.array([int(vids[best])]),
                             "mind": pa.array([float(mind[best])])})

        parts = (_emb(sf_dir)
                 .map_batches(champion, batch_format="pyarrow",
                              batch_size=None).to_pandas())
        if parts.empty:
            break
        win = parts.sort_values(["mind", "vec_id"],
                                ascending=[False, True]).iloc[0]
        wid = int(win["vec_id"])
        selected.append((wid, int(round(win["mind"] * 1e6))))
        import pyarrow.parquet as _pqm
        wt = _pqm.read_table(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"],
                             filters=[("vec_id", "=", wid)])
        wv = np.asarray(wt["embedding"][0].as_py(), dtype=np.float64)
        wv /= max(np.linalg.norm(wv), 1e-12)
        sel_mat = np.vstack([sel_mat, wv[None, :]])

    return pd.DataFrame({
        "sel_rank": np.arange(1, len(selected) + 1, dtype=np.int64),
        "vec_id": np.array([i for i, _ in selected], dtype=np.int64),
        "mindist_x1e6": np.array([d for _, d in selected],
                                 dtype=np.int64)})


# --- margin-based bitext mining (Artetxe & Schwenk 2019 / CCMatrix) ----

BITEXT_K = 4            # neighborhood size for the margin denominator
BITEXT_TOP = 20         # mined pairs reported (ranked by margin)
_BITEXT_COLS = ("vec_a", "vec_b", "cosine_x1e6", "margin_x1e6")


def embedding_bitext_margin(sf_dir: str, wave_rows: int = 4096,
                            merge_driver_max: int = 4096):
    """Margin-based parallel-pair mining between the even-id side (A)
    and the odd-id side (B) of the embeddings table — the CCMatrix /
    LASER alignment primitive. A pair is mined iff it is the MUTUAL
    best match (forward and backward argmax under fixed-point cosine,
    ties to the smaller vec_id) with positive cosine and positive
    neighborhood mass; its ratio margin is the all-integer

        margin_x1e6 = cos_x1e6 * 2K * 1e6 // (sumTopK_fwd + sumTopK_bwd)

    (Artetxe & Schwenk 2019's ratio margin with the mean-of-top-K
    denominator cleared of divisions). Top BITEXT_TOP pairs by
    (margin desc, vec_a asc). Exact and oracled: the fixed-point
    cosine kernel (functions/vectors.py) makes every value an integer.

    Scale shape: queries stream out in waves of ``wave_rows`` (each
    wave = one broadcast of <= wave_rows quantized int16-scale rows +
    one corpus pass; W waves cover any mined-side size with bounded
    memory), per-batch partials are top-K only, and the exact per-query
    merge is a qid-keyed groupby exchange — the driver only ever holds
    per-query STATS (best + sum), then the tiny mutual-join result."""
    import pyarrow.parquet as pq

    from ..functions import vectors as V

    empty = pd.DataFrame({c: pd.Series(dtype="int64")
                          for c in _BITEXT_COLS})
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id"])
    ids = np.sort(tbl["vec_id"].to_numpy())
    if (ids % 2 == 0).sum() == 0 or (ids % 2 == 1).sum() == 0:
        return empty

    # Every wave's ray.put ObjectRef is pinned here until the final
    # result is collected: the as_dataset path builds LAZY map_batches
    # stages whose closures dereference these after the wave loop ends,
    # so dropping a ref when the loop variable is reassigned would free
    # the broadcast query block before the stage runs.
    _wave_refs: list = []

    def side_stats(parity: int, as_dataset: bool = False):
        """(qid, best_vid, best_cos, s_topk) for every parity-side
        vector vs the opposite side — a DataFrame on the driver fast
        path, a Dataset (groupby-exchange merge, never collected) when
        ``as_dataset`` (the scale path)."""
        qids_all = ids[ids % 2 == parity]
        stats_frames = []
        for w0 in range(0, len(qids_all), wave_rows):
            wave = qids_all[w0:w0 + wave_rows]
            qt = pq.read_table(
                f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"],
                filters=[("vec_id", "in", wave.tolist())]).to_pandas() \
                .sort_values("vec_id")
            qids = qt["vec_id"].to_numpy(np.int64)
            qm = V.quantize(np.stack(qt["embedding"].to_numpy()))
            qref = ray.put((qids, qm))
            _wave_refs.append(qref)

            # qref/parity are bound at DEFINITION time (default args):
            # the lazy as_dataset path executes these closures after
            # the wave loop has moved on, so a free-variable capture
            # would make every wave read the LAST wave's query block.
            def partial(batch: pa.Table, qref=qref,
                        parity=parity) -> pa.Table:
                qids, qm = ray.get(qref)
                vids = batch["vec_id"].to_numpy(zero_copy_only=False)
                m = vids % 2 != parity          # opposite side only
                vids = vids[m]
                if len(vids) == 0:
                    return pa.Table.from_pydict(
                        {"qid": pa.array([], pa.int64()),
                         "vid": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.int64())})
                q = V.quantize_batch(batch)[m]
                cos = V.cosine_x1e6(q, qm)      # (n, Q)
                k = min(BITEXT_K, len(vids))
                out_q, out_v, out_c = [], [], []
                for j, qid in enumerate(qids):
                    order = np.lexsort((vids, -cos[:, j]))[:k]
                    out_q.append(np.full(k, qid, dtype=np.int64))
                    out_v.append(vids[order])
                    out_c.append(cos[order, j])
                return pa.Table.from_pydict({
                    "qid": np.concatenate(out_q),
                    "vid": np.concatenate(out_v),
                    "cos": np.concatenate(out_c)})

            def merge(g: pd.DataFrame) -> pd.DataFrame:
                g = g.sort_values(["cos", "vid"],
                                  ascending=[False, True]).head(BITEXT_K)
                return pd.DataFrame({
                    "qid": [int(g["qid"].iloc[0])],
                    "best_vid": [int(g["vid"].iloc[0])],
                    "best_cos": [int(g["cos"].iloc[0])],
                    "s_topk": [int(g["cos"].sum())]})

            part_ds = rd.read_parquet(
                f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"]) \
                .map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
            if as_dataset:
                stats_frames.append(
                    part_ds.groupby("qid")
                    .map_groups(merge, batch_format="pandas"))
                continue
            if len(qids_all) <= merge_driver_max:
                # small query side: the partials are batches x Q x K
                # bounded rows — merge them in ONE lexsort pass instead
                # of paying a qid-keyed exchange (identical semantics,
                # equality pinned by test)
                pr = part_ds.to_pandas()
                q = pr["qid"].to_numpy(np.int64)
                v = pr["vid"].to_numpy(np.int64)
                c = pr["cos"].to_numpy(np.int64)
                order = np.lexsort((v, -c, q))
                q, v, c = q[order], v[order], c[order]
                starts = np.flatnonzero(np.concatenate(
                    [[True], q[1:] != q[:-1]]))
                rank = np.arange(len(q)) - np.repeat(
                    starts, np.diff(np.concatenate([starts, [len(q)]])))
                topk = rank < BITEXT_K
                s = np.zeros(len(starts), dtype=np.int64)
                np.add.at(s, np.searchsorted(q[starts], q[topk]), c[topk])
                stats = pd.DataFrame({
                    "qid": q[starts], "best_vid": v[starts],
                    "best_cos": c[starts], "s_topk": s})
            else:
                # scale path: per-query exact merge as a qid-keyed
                # groupby exchange — the driver never holds the
                # per-candidate partials of a corpus-sized query side
                stats = part_ds.groupby("qid") \
                    .map_groups(merge, batch_format="pandas") \
                    .to_pandas()     # per-QUERY stats only: 4 ints/query
            stats_frames.append(stats)
        if as_dataset:
            out_ds = stats_frames[0]
            for extra in stats_frames[1:]:
                out_ds = out_ds.union(extra)
            return out_ds
        return pd.concat(stats_frames, ignore_index=True)

    def _margin_rows(m: pd.DataFrame) -> pd.DataFrame:
        m = m[(m["best_vid_b"] == m["qid_f"]) & (m["best_cos_f"] > 0)
              & (m["s_topk_f"] + m["s_topk_b"] > 0)]
        if m.empty:
            return empty
        denom = (m["s_topk_f"] + m["s_topk_b"]).astype(object)
        margin = (m["best_cos_f"].astype(object) * (2 * BITEXT_K)
                  * 1_000_000 // denom).astype("int64")
        return pd.DataFrame(
            {"vec_a": m["qid_f"].to_numpy(np.int64),
             "vec_b": m["best_vid_f"].to_numpy(np.int64),
             "cosine_x1e6": m["best_cos_f"].to_numpy(np.int64),
             "margin_x1e6": margin.to_numpy()})

    n_side = max(int((ids % 2 == 0).sum()), int((ids % 2 == 1).sum()))
    if n_side <= merge_driver_max:
        # fast path: per-query stat tables are small — mutual-best
        # join on the driver
        fwd = side_stats(0)          # A (even) -> best in B
        bwd = side_stats(1)          # B (odd)  -> best in A
        m = fwd.merge(bwd, left_on="best_vid", right_on="qid",
                      suffixes=("_f", "_b"))
        out = _margin_rows(m)
        return out.sort_values(["margin_x1e6", "vec_a"],
                               ascending=[False, True]) \
            .head(BITEXT_TOP).reset_index(drop=True)

    # scale path: the stat tables are CORPUS-sized — the mutual-best
    # join runs as one pair-keyed coarse exchange (fwd rows keyed by
    # their own qid, bwd rows re-keyed by their best match, so both
    # halves of a candidate pair land in the same partition), each
    # partition emits only its margin top-K partial, and the driver
    # merges <= partitions x BITEXT_TOP rows.
    from .relational import _coarse_partition_map

    fwd_ds = side_stats(0, as_dataset=True)
    bwd_ds = side_stats(1, as_dataset=True)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.append_column(
                "side", pa.array(np.full(len(batch), side, np.int64)))
            key = batch["qid"] if side == 0 else batch["best_vid"]
            return t.append_column("pair_a", key)
        return fn

    both = fwd_ds.map_batches(tag(0), batch_format="pyarrow",
                              batch_size=None) \
        .union(bwd_ds.map_batches(tag(1), batch_format="pyarrow",
                                  batch_size=None))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        f = g[g["side"] == 0]
        b = g[g["side"] == 1]
        m = f.merge(b, left_on=["qid", "best_vid"],
                    right_on=["best_vid", "qid"],
                    suffixes=("_f", "_b"))
        out = _margin_rows(m)
        return out.sort_values(["margin_x1e6", "vec_a"],
                               ascending=[False, True]) \
            .head(BITEXT_TOP)

    cand = _coarse_partition_map(both, "pair_a", per_part).to_pandas()
    if cand.empty:
        # every coarse partition mined zero pairs: Ray drops the schema
        # of all-empty map_groups output, so sort_values on the named
        # columns would KeyError — return the typed empty frame the
        # fast path returns on the same input.
        return empty.copy()
    return cand.sort_values(["margin_x1e6", "vec_a"],
                            ascending=[False, True]) \
        .head(BITEXT_TOP).reset_index(drop=True)


BITEXT_SQL = f"""
WITH ev AS (
  SELECT vec_id, i,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000.0) AS BIGINT) AS q
  FROM embeddings, range(1, 65) t(i)),
nrm AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS n2
        FROM ev GROUP BY vec_id),
cosab AS (
  SELECT a.vec_id AS xa, b.vec_id AS xb,
         CAST(FLOOR(CAST(SUM(a.q * b.q) AS BIGINT)
                    / (sqrt(MAX(na.n2)) * sqrt(MAX(nb.n2)))
                    * 1000000.0) AS BIGINT) AS c
  FROM ev a
  JOIN ev b ON a.i = b.i
  JOIN nrm na ON na.vec_id = a.vec_id
  JOIN nrm nb ON nb.vec_id = b.vec_id
  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
  GROUP BY a.vec_id, b.vec_id),
fr AS (
  SELECT xa, xb, c,
         ROW_NUMBER() OVER (PARTITION BY xa
                            ORDER BY c DESC, xb ASC) AS r
  FROM cosab),
fwd AS (
  SELECT xa, MAX(CASE WHEN r = 1 THEN xb END) AS besty,
         MAX(CASE WHEN r = 1 THEN c END) AS bestc,
         SUM(CASE WHEN r <= {BITEXT_K} THEN c ELSE 0 END) AS sx
  FROM fr GROUP BY xa),
br AS (
  SELECT xa, xb, c,
         ROW_NUMBER() OVER (PARTITION BY xb
                            ORDER BY c DESC, xa ASC) AS r
  FROM cosab),
bwd AS (
  SELECT xb, MAX(CASE WHEN r = 1 THEN xa END) AS bestx,
         SUM(CASE WHEN r <= {BITEXT_K} THEN c ELSE 0 END) AS sy
  FROM br GROUP BY xb)
SELECT f.xa AS vec_a, f.besty AS vec_b,
       CAST(f.bestc AS BIGINT) AS cosine_x1e6,
       CAST(f.bestc * {2 * BITEXT_K} * 1000000
            // (f.sx + b.sy) AS BIGINT) AS margin_x1e6
FROM fwd f JOIN bwd b ON b.xb = f.besty AND b.bestx = f.xa
WHERE f.bestc > 0 AND f.sx + b.sy > 0
ORDER BY margin_x1e6 DESC, vec_a ASC
LIMIT {BITEXT_TOP}
"""


# --- distributed PCA projection -------------------------------------

PCA_COMPONENTS = 2


def embedding_pca_project(sf_dir: str):
    """Distributed PCA of the embeddings table: per-batch EXACT integer
    second-moment partials (sum q, sum q^T q over the x1e3-quantized
    grid — int64 matmul, order-invariant), a 64x64 driver
    eigendecomposition, then a batch-local projection of every vector
    onto the top-{PCA_COMPONENTS} components. Sign fixed per component
    (largest-|entry| coordinate positive, lowest index on ties), so the
    result is unique; integer moment accumulation makes it bit-stable
    at any block layout (sharding-invariance test). Eigendecomposition
    is not SQL-expressible -> rows-only; planted-axis recovery and
    variance-ordering tests check the values.

    Scale shape: the exchange carries ONE (64 + 64x64) integer partial
    per batch; projection streams. At ~1e12 rows the int64 moment sum
    approaches overflow for |x| ~ unit-scale embeddings — shard the
    accumulation by key range and widen to object ints at the driver
    merge before that point (documented bound, not hit at any test SF).
    Output: (vec_id, pc1_x1e6, pc2_x1e6)."""
    import pyarrow.dataset as pads

    from ..functions import vectors as V

    cols = ("vec_id", "pc1_x1e6", "pc2_x1e6")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if pads.dataset(f"{sf_dir}/embeddings.parquet").count_rows() == 0:
        return empty

    src = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])

    def moments(batch: pa.Table) -> pa.Table:
        q = V.quantize_batch(batch)
        return pa.Table.from_pydict({
            "n": np.array([len(q)], dtype=np.int64),
            "s1": [q.sum(axis=0)],
            "s2": [(q.T @ q).ravel()]})

    parts = src.map_batches(moments, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    n = int(parts["n"].sum())
    s1 = np.sum(np.stack(parts["s1"].to_numpy()), axis=0)
    d = len(s1)
    s2 = np.sum(np.stack(parts["s2"].to_numpy()), axis=0) \
        .reshape(d, d)
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)        # ascending
    order = np.argsort(evals)[::-1][:PCA_COMPONENTS]
    comps = []
    for j in order:
        v = evecs[:, j]
        k = int(np.argmax(np.abs(v)))         # first max on ties
        comps.append(v if v[k] > 0 else -v)
    proj_m = np.stack(comps, axis=1)          # (d, k)
    import ray
    pref = ray.put((mean, proj_m))

    def project(batch: pa.Table) -> pa.Table:
        mean, proj_m = ray.get(pref)
        q = V.quantize_batch(batch)
        # q is x1e3-scaled: x1000 brings the projection to x1e6 of
        # the original embedding units
        p = np.floor((q - mean) @ proj_m * 1000.0).astype(np.int64)
        return pa.Table.from_pydict({
            "vec_id": batch["vec_id"],
            "pc1_x1e6": p[:, 0], "pc2_x1e6": p[:, 1]})

    return src.map_batches(project, batch_format="pyarrow",
                           batch_size=None).sort("vec_id")


SIMILARITY_QUERIES: dict[str, tuple] = {
    "embedding_pca_project": (embedding_pca_project, None),
    "embedding_bitext_margin": (embedding_bitext_margin, BITEXT_SQL),
    "embedding_hard_negatives": (embedding_hard_negatives, HARDNEG_SQL),
    "embedding_triplet_mining": (embedding_triplet_mining, TRIPLET_SQL),
    "embedding_maxmin_diverse": (embedding_maxmin_diverse, None),
    "knn_cosine_filtered": (knn_cosine_filtered, KNN_FILTERED_SQL),
    "embedding_dispersion": (embedding_dispersion, DISPERSION_SQL),
    "knn_cosine_truncated": (knn_cosine_truncated, KNN_TRUNC_SQL),
    "knn_truncated_recall": (knn_truncated_recall, None),
    "embedding_norms": (embedding_norms, NORMS_SQL),
    "knn_cosine_pq": (knn_cosine_pq, None),
    "knn_pq_recall": (knn_pq_recall, None),
    "knn_cosine_quantized": (knn_cosine_quantized, None),
    "knn_quantized_recall": (knn_quantized_recall, None),
    "embedding_pca_top": (embedding_pca_top, None),
    "embeddings_kmeans": (embeddings_kmeans, None),
    "embeddings_semdedup": (embeddings_semdedup, None),
    "knn_multi_query": (knn_multi_query, KNN_MULTI_SQL),
    "knn_cosine": (knn_cosine, KNN_SQL),
    "knn_cosine_ivf": (knn_cosine_ivf, None),
    "knn_ivf_recall": (knn_ivf_recall, None),
    "knn_cosine_lsh": (knn_cosine_lsh, None),
    "knn_lsh_recall": (knn_lsh_recall, None),
    "embedding_centroid_sums": (embedding_centroid_sums, CENTROID_SQL),
}
