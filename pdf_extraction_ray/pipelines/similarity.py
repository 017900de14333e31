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

    top = (_emb(sf_dir).map_batches(score, batch_format="pyarrow")
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

    return (_emb(sf_dir).map_batches(score, batch_format="pyarrow")
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

    return (_emb(sf_dir).map_batches(partial, batch_format="pyarrow")
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

    return (_emb(sf_dir).map_batches(score, batch_format="pyarrow")
            .sort(["cosine_x1e6", "vec_id"], descending=[True, False])
            .limit(KNN_K))


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


SIMILARITY_QUERIES: dict[str, tuple] = {
    "knn_cosine": (knn_cosine, KNN_SQL),
    "knn_cosine_ivf": (knn_cosine_ivf, None),
    "knn_ivf_recall": (knn_ivf_recall, None),
    "knn_cosine_lsh": (knn_cosine_lsh, None),
    "knn_lsh_recall": (knn_lsh_recall, None),
    "embedding_centroid_sums": (embedding_centroid_sums, CENTROID_SQL),
}
