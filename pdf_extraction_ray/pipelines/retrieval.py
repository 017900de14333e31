"""RAG-evaluation analog (SURVEY.md §3.3 lifecycle, rebuilt Ray-Data-first):

    documents -> chunker (flat_map, 1200/200 recursive splitter, M20)
              -> embed actor pool (T6 stand-in)
              -> per-query top-k retrieval (J4/O2: broadcast query matrix,
                 per-batch partial top-k, tiny global merge)
              -> context assembly (M22: numbered top-3 context string)

plus chunk-size statistics (A5: mean/min/max via ds.aggregate).

Retrieval never shuffles chunk embeddings: each batch scores against the
broadcast query matrix and emits only its local top-k rows per query
(k x n_queries rows per batch), so the global merge input is tiny. At
10^12-chunk scale the same shape holds — the scale path swaps brute-force
scoring for the IVF bucketing in ``similarity.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .corpus import _typed_empty_on_no_docs
import ray.data as rd
from ray.data.aggregate import Max, Mean, Min, Count

from ..functions.chunker import chunk_text
from ..stages.embed import HashEmbedder

TOP_K = 5
CONTEXT_K = 3
# fixed evaluation queries (the reference evaluates 5 fixed kor queries,
# complete_multimodal_rag_evaluation.py:199-211; ours match the synthetic
# corpus domain)
EVAL_QUERIES = [
    "table extraction pipeline",
    "figure caption region",
    "document quality score",
    "stream partition shuffle",
    "checkpoint resume manifest",
]


def chunk_documents_ds(sf_dir: str):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def chunks(batch: pa.Table) -> pa.Table:
        doc_ids, chunk_ids, texts = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for ci, ch in enumerate(chunk_text(text or "")):
                doc_ids.append(doc_id)
                chunk_ids.append(ci)
                texts.append(ch)
        return pa.Table.from_arrays(
            [pa.array(doc_ids, type=pa.int64()),
             pa.array(chunk_ids, type=pa.int64()),
             pa.array(texts, type=pa.string())],
            names=["doc_id", "chunk_id", "chunk_text"])

    return ds.map_batches(chunks, batch_format="pyarrow", batch_size=None)


def chunk_stats(sf_dir: str):
    """A5 chunk-size statistics as a global aggregate."""
    ds = chunk_documents_ds(sf_dir)

    def size(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.append_column(
            "chunk_size", pc.cast(pc.utf8_length(batch["chunk_text"]),
                                  pa.int64()))

    res = ds.map_batches(size, batch_format="pyarrow", batch_size=None).aggregate(
        Count(alias_name="n_chunks"),
        Mean("chunk_size", alias_name="mean_size"),
        Min("chunk_size", alias_name="min_size"),
        Max("chunk_size", alias_name="max_size"))
    return pd.DataFrame([res])[["n_chunks", "mean_size", "min_size", "max_size"]]


def _partial_topk_fn(qref):
    """Stage-1 scorer factory: per-batch partial top-k against the
    broadcast query matrix (shared by the single-stage and reranked
    retrieval pipelines)."""
    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)                             # (Q, d)
        emb = np.asarray(batch["embedding"].combine_chunks().flatten()
                         if isinstance(batch["embedding"], pa.ChunkedArray)
                         else batch["embedding"].flatten()) \
            .reshape(len(batch), -1).astype(np.float64)
        scores = emb @ q.T                            # (n, Q)
        doc_np = batch["doc_id"].to_numpy(zero_copy_only=False)
        chunk_np = batch["chunk_id"].to_numpy(zero_copy_only=False)
        rows = []
        for qi in range(q.shape[0]):
            s = scores[:, qi]
            k = min(TOP_K, len(s))
            # deterministic tie-break: (-score, doc_id, chunk_id) — a tied
            # score at the k boundary must never depend on batch layout
            order = np.lexsort((chunk_np, doc_np, -s))
            for j in order[:k]:
                rows.append((qi, int(doc_np[j]), int(chunk_np[j]),
                             batch["chunk_text"][j].as_py(),
                             int(np.floor(s[j] * 1e6))))
        return pa.Table.from_pylist(
            [dict(zip(["query_id", "doc_id", "chunk_id", "chunk_text",
                       "score_x1e6"], r)) for r in rows],
            schema=pa.schema([("query_id", pa.int64()),
                              ("doc_id", pa.int64()),
                              ("chunk_id", pa.int64()),
                              ("chunk_text", pa.string()),
                              ("score_x1e6", pa.int64())]))

    return partial_topk


def _stage1_candidates(sf_dir: str, *,
                       embed_num_gpus: float | None = None,
                       embed_resources: dict | None = None):
    """Shared stage-1 retrieval: chunk -> actor-pool embed -> per-batch
    partial top-k against the broadcast query matrix. Returns the
    candidate Dataset (query_id, doc_id, chunk_id, chunk_text,
    score_x1e6), k rows per query per batch. One wiring for both the
    single-stage and the reranked pipelines — a tuning change (batch
    size, pool size, embedder) applies to both.

    ``embed_num_gpus`` / ``embed_resources``: per-actor accelerator
    claim for a real embedding model (SURVEY T6/T8); defaulted off."""
    embedder = HashEmbedder()        # driver-side twin embeds the queries
    qref = ray.put(embedder.embed(pa.array(EVAL_QUERIES)))

    from ..functions.cluster import accel_remote_args, half_pool
    embedded = chunk_documents_ds(sf_dir) \
        .map_batches(HashEmbedder, batch_format="pyarrow",
                     batch_size=1024, concurrency=half_pool(),
                     num_cpus=1,
                     **accel_remote_args(embed_num_gpus,
                                         embed_resources))
    return embedded.map_batches(_partial_topk_fn(qref),
                                batch_format="pyarrow", batch_size=None)


def rag_topk_contexts(sf_dir: str, context_k: int = CONTEXT_K):
    """Top-k retrieval + assembled context per eval query.

    Output: (query_id, query, context) — context is the reference's
    numbered join of the top-``context_k`` chunks (RAG:84; CMP:30-34)."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_x1e6", "doc_id", "chunk_id"],
                          ascending=[False, True, True]).head(context_k)
        qi = int(g["query_id"].iloc[0])
        ctx = "\n\n".join(f"[문서 {i + 1}] {t}"
                          for i, t in enumerate(g["chunk_text"]))
        return pd.DataFrame({"query_id": [qi],
                             "query": [EVAL_QUERIES[qi]],
                             "context": [ctx]})

    return (_stage1_candidates(sf_dir)
            .groupby("query_id")
            .map_groups(merge, batch_format="pandas")
            .sort("query_id"))


def rag_reranked_contexts(sf_dir: str, context_k: int = CONTEXT_K):
    """Two-stage retrieval: the embedding top-k builds a per-query
    candidate POOL (stage 1, same broadcast/partial-top-k shape as
    ``rag_topk_contexts``), then a second-stage reranker rescores only
    the pooled candidates and the context is assembled in RERANK order
    (stage 2). At scale this is the standard recall-then-precision
    split: stage 1 touches every chunk but ships k rows per batch;
    stage 2 — the expensive per-pair scorer — sees only k*|queries|
    rows total. Output: (query_id, query, context, top_rerank_x1e6)."""
    from ..functions.rerank import rerank_score_x1e6

    def rerank_group(g: pd.DataFrame) -> pd.DataFrame:
        # global stage-1 pool: top TOP_K by embedding score
        g = g.sort_values(["score_x1e6", "doc_id", "chunk_id"],
                          ascending=[False, True, True]).head(TOP_K)
        qi = int(g["query_id"].iloc[0])
        query = EVAL_QUERIES[qi]
        rr = [rerank_score_x1e6(query, t) for t in g["chunk_text"]]
        g = g.assign(rerank_x1e6=rr) \
            .sort_values(["rerank_x1e6", "score_x1e6", "doc_id", "chunk_id"],
                         ascending=[False, False, True, True]) \
            .head(context_k)
        ctx = "\n\n".join(f"[문서 {i + 1}] {t}"
                          for i, t in enumerate(g["chunk_text"]))
        return pd.DataFrame({"query_id": [qi], "query": [query],
                             "context": [ctx],
                             "top_rerank_x1e6":
                             [np.int64(g["rerank_x1e6"].iloc[0])]})

    return (_stage1_candidates(sf_dir)
            .groupby("query_id")
            .map_groups(rerank_group, batch_format="pandas")
            .sort("query_id"))


def rag_answers(sf_dir: str, context_k: int = CONTEXT_K):
    """Answer generation over the assembled contexts — the §3.3 lifecycle
    step the reference runs per query (RAG:80-131): deterministic
    extractive answerer stand-in (``functions.answerer``) + per-query
    latency and token accounting. Runs as a map over the tiny context
    table (one row per eval query)."""
    import time as _time

    from ..functions.answerer import generate_answer

    def answer(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in batch.iterrows():
            t0 = _time.perf_counter_ns()
            a = generate_answer(r["query"], r["context"])
            dt_us = (_time.perf_counter_ns() - t0) // 1000
            rows.append({"query_id": int(r["query_id"]),
                         "query": r["query"],
                         "answer": a["answer"],
                         "processing_time_us": int(dt_us),
                         "input_tokens": a["input_tokens"],
                         "output_tokens": a["output_tokens"],
                         "total_tokens": a["total_tokens"]})
        return pd.DataFrame(rows)

    return rag_topk_contexts(sf_dir, context_k=context_k) \
        .map_batches(answer, batch_format="pandas")


def rag_eval_totals(sf_dir: str):
    """Performance summary over the answer run (RAG:287-301 analog:
    total/mean processing time, total/input/output token sums, question
    count) as Sum/Mean Dataset aggregates."""
    from ray.data.aggregate import Sum

    res = rag_answers(sf_dir).aggregate(
        Count(alias_name="n_queries"),
        Sum("processing_time_us", alias_name="total_time_us"),
        Mean("processing_time_us", alias_name="mean_time_us"),
        Sum("total_tokens", alias_name="total_tokens"),
        Sum("input_tokens", alias_name="total_input_tokens"),
        Sum("output_tokens", alias_name="total_output_tokens"))
    return pd.DataFrame([res])[["n_queries", "total_time_us", "mean_time_us",
                                "total_tokens", "total_input_tokens",
                                "total_output_tokens"]]


@_typed_empty_on_no_docs(query_id='int64', query='object', same_answer='bool', token_diff='int64', time_diff_us='int64')
def rag_ab_compare(sf_dir: str):
    """A/B answer comparison between two retrieval configs (the
    compare_gpt_vs_hybrid.py:129-135 analog: same queries, two systems,
    per-query answer match + time/token deltas). Config A = top-3
    contexts, config B = top-1 context."""
    a = rag_answers(sf_dir, context_k=CONTEXT_K).to_pandas() \
        .set_index("query_id")
    b = rag_answers(sf_dir, context_k=1).to_pandas().set_index("query_id")
    out = pd.DataFrame({
        "query_id": a.index.astype("int64"),
        "query": a["query"].to_numpy(),
        "same_answer": (a["answer"] == b["answer"]).to_numpy(),
        "token_diff": (a["total_tokens"] - b["total_tokens"])
        .astype("int64").to_numpy(),
        "time_diff_us": (a["processing_time_us"] - b["processing_time_us"])
        .astype("int64").to_numpy()})
    return out.sort_values("query_id").reset_index(drop=True)




MMR_LAMBDA = 0.7


def rag_mmr_contexts(sf_dir: str, context_k: int = CONTEXT_K):
    """Maximal-Marginal-Relevance retrieval: the stage-1 pool is
    re-selected greedily by lambda*sim(query, c) - (1-lambda)*max
    sim(c, already-selected) — the diversity-aware selection that keeps
    near-duplicate chunks from filling the whole context window. The
    pairwise similarities are computed only over the pooled TOP_K
    candidates per query (the expensive all-pairs step never touches
    the corpus). Output: (query_id, query, context, mmr_first_x1e6)."""

    def mmr_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_x1e6", "doc_id", "chunk_id"],
                          ascending=[False, True, True]).head(TOP_K)             .reset_index(drop=True)
        qi = int(g["query_id"].iloc[0])
        emb = HashEmbedder()
        cand = emb.embed(pa.array(list(g["chunk_text"])))
        cand = cand / np.maximum(
            np.linalg.norm(cand, axis=1, keepdims=True), 1e-12)
        qsim = g["score_x1e6"].to_numpy().astype(np.float64)
        pair = cand @ cand.T
        chosen: list[int] = []
        remaining = list(range(len(g)))
        while remaining and len(chosen) < context_k:
            best_i, best_v = None, None
            for i in remaining:
                div = max((pair[i, j] for j in chosen), default=0.0)
                v = MMR_LAMBDA * qsim[i] - (1 - MMR_LAMBDA) * div * 1e6
                # deterministic tie-break: earlier pool position wins
                if best_v is None or v > best_v + 1e-9:
                    best_i, best_v = i, v
            chosen.append(best_i)
            remaining.remove(best_i)
        sel = g.iloc[chosen]
        ctx = "\n\n".join(f"[문서 {i + 1}] {t}"
                           for i, t in enumerate(sel["chunk_text"]))
        return pd.DataFrame({"query_id": [qi],
                             "query": [EVAL_QUERIES[qi]],
                             "context": [ctx],
                             "mmr_first_x1e6":
                             [np.int64(g["score_x1e6"].iloc[chosen[0]])]})

    return (_stage1_candidates(sf_dir)
            .groupby("query_id")
            .map_groups(mmr_group, batch_format="pandas")
            .sort("query_id"))


# ---------------------------------------------------------------------------
# BM25 lexical retrieval (the sparse baseline every RAG stack pairs with
# the dense path above)
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = "merge sort join stream"   # fixed eval query, corpus-domain
BM25_TOP_K = 20


def bm25_reference(texts: list, query: str,
                   k1: float = BM25_K1, b: float = BM25_B) -> list:
    """Pure-python BM25 (Lucene idf: ln(1 + (N-df+0.5)/(df+0.5))) — the
    differential oracle for ``bm25_topk``. Returns [(idx, score), ...]
    for docs with score > 0, sorted (score desc, idx). Token = the
    engine's lower/split contract."""
    import math
    toks = [t.lower().split() for t in texts]
    q = query.lower().split()
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n if n else 0.0
    idf = {}
    for w in set(q):
        df = sum(1 for t in toks if w in t)
        idf[w] = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    out = []
    for i, t in enumerate(toks):
        dl = len(t)
        s = 0.0
        for w in q:
            tf = t.count(w)
            if tf:
                s += idf[w] * tf * (k1 + 1.0) \
                    / (tf + k1 * (1.0 - b + b * dl / avgdl))
        if s > 0.0:
            out.append((i, s))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out


def bm25_topk(sf_dir: str) -> pd.DataFrame:
    """Distributed BM25 over ``documents.text`` for the fixed eval
    query. Two passes, neither shuffles a token: pass 1 folds
    (per-query-term df, N, total token count) partials — |Q|+2 ints
    per block — on the driver; pass 2 scores each doc against the
    broadcast idf table (vectorized token-mask bincounts) and keeps a
    distributed (score desc, doc_id) top-K. Differential-tested
    bit-exact against ``bm25_reference`` (same float ops in the same
    order); rows-only for the driver (ln() fixed-point is not
    SQL-hash-stable). Output: (doc_id, score_x1e6, bm_rank)."""
    import math

    import pyarrow.compute as pc

    q_terms = BM25_QUERY.lower().split()
    uniq_q = sorted(set(q_terms))
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("doc_id", "score_x1e6", "bm_rank")})
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def _tok(batch: pa.Table):
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(pc.utf8_lower(
            pc.fill_null(text, "")), " ")
        # python str.split() drops empty tokens; split_pattern keeps
        # them — mask them out so dl matches the reference exactly
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat_np = flat.to_numpy(zero_copy_only=False)[keep]
        return flat_np, parent[keep]

    def part(batch: pa.Table) -> pa.Table:
        flat, parent = _tok(batch)
        n = len(batch)
        dl = np.bincount(parent, minlength=n)
        dfs = []
        for w in uniq_q:
            hit = np.bincount(parent[flat == w], minlength=n) > 0
            dfs.append(int(hit.sum()))
        return pa.Table.from_pydict({
            "df": [np.asarray(dfs, dtype=np.int64).tobytes()],
            "n": [n], "len": [int(dl.sum())]})

    dfv = np.zeros(len(uniq_q), dtype=np.int64)
    n_docs = 0
    total_len = 0
    for b in ds.map_batches(part, batch_format="pyarrow",
                            batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for part_b in b["df"].to_pylist():
            dfv += np.frombuffer(part_b, dtype=np.int64)
        n_docs += int(pc.sum(b["n"]).as_py() or 0)
        total_len += int(pc.sum(b["len"]).as_py() or 0)
    if n_docs == 0:
        return empty
    avgdl = total_len / n_docs
    # python-math ln, same as the reference (term-at-a-time float order)
    idf = {w: math.log(1.0 + (n_docs - int(df) + 0.5) / (int(df) + 0.5))
           for w, df in zip(uniq_q, dfv)}

    def score(batch: pa.Table) -> pa.Table:
        flat, parent = _tok(batch)
        n = len(batch)
        dl = np.bincount(parent, minlength=n).astype(np.float64)
        denom_base = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        s = np.zeros(n, dtype=np.float64)
        for w in q_terms:           # reference iterates q, not set(q)
            tf = np.bincount(parent[flat == w],
                             minlength=n).astype(np.float64)
            hit = tf > 0
            s[hit] += idf[w] * tf[hit] * (BM25_K1 + 1.0) \
                / (tf[hit] + denom_base[hit])
        keep = s > 0.0
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "doc_id": ids[keep].astype(np.int64),
            "score_x1e6": np.floor(s[keep] * 1e6).astype(np.int64)})

    out = (ds.map_batches(score, batch_format="pyarrow", batch_size=None)
           .sort(["score_x1e6", "doc_id"], descending=[True, False])
           .limit(BM25_TOP_K)
           .to_pandas())
    if out.empty:
        return empty
    out["bm_rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.astype({c: "int64" for c in
                       ("doc_id", "score_x1e6", "bm_rank")})


RRF_C = 60                  # the standard reciprocal-rank-fusion constant
RRF_SCALE = 1_000_000_000   # integer RRF: SCALE // (C + rank), exact


def hybrid_rrf_topk(sf_dir: str) -> pd.DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the sparse (BM25)
    and dense (embedding-cosine) document rankings for the fixed eval
    query — the standard production pairing. RRF in exact integers:
    ``rrf = sum over lists of RRF_SCALE // (RRF_C + rank)`` (a doc
    missing from a list contributes 0), so distributed summation order
    cannot perturb results.

    Scale shape: both input rankings are top-K-bounded (the dense side
    is one embed-and-score pass with per-batch partial top-K — no
    shuffle), so the fusion itself touches only <= 2K rows on the
    driver. Output: (doc_id, rrf_x1e9, in_sparse, in_dense, rank)."""
    cols = ("doc_id", "rrf_x1e9", "in_sparse", "in_dense", "rank")
    sparse = bm25_topk(sf_dir)

    # dense leg: doc-level embeddings vs the embedded query, per-batch
    # partial top-K then one tiny global merge
    embedder = HashEmbedder(text_col="text")
    qv = embedder.embed(pa.array([BM25_QUERY]))[0]
    qref = ray.put(qv)

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        emb = HashEmbedder(text_col="text")
        m = emb.embed(batch["text"].combine_chunks()
                      if isinstance(batch["text"], pa.ChunkedArray)
                      else batch["text"])
        s = m @ q
        k = min(BM25_TOP_K, len(s))
        top = np.argpartition(-s, k - 1)[:k] if k else np.array([], int)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "doc_id": ids[top].astype(np.int64),
            "score_x1e6": np.floor(s[top] * 1e6).astype(np.int64)})

    dense = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"])
             .map_batches(score, batch_format="pyarrow", batch_size=None)
             .sort(["score_x1e6", "doc_id"], descending=[True, False])
             .limit(BM25_TOP_K)
             .to_pandas())
    if sparse.empty and dense.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    dense["d_rank"] = np.arange(1, len(dense) + 1, dtype=np.int64)

    fused: dict[int, dict] = {}
    for _, r in sparse.iterrows():
        fused[int(r["doc_id"])] = {
            "rrf": RRF_SCALE // (RRF_C + int(r["bm_rank"])),
            "s": 1, "d": 0}
    for _, r in dense.iterrows():
        e = fused.setdefault(int(r["doc_id"]), {"rrf": 0, "s": 0, "d": 0})
        e["rrf"] += RRF_SCALE // (RRF_C + int(r["d_rank"]))
        e["d"] = 1
    out = pd.DataFrame(
        [(k, v["rrf"], v["s"], v["d"]) for k, v in fused.items()],
        columns=["doc_id", "rrf_x1e9", "in_sparse", "in_dense"])
    out = out.sort_values(["rrf_x1e9", "doc_id"],
                          ascending=[False, True]).head(BM25_TOP_K) \
        .reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.astype({c: "int64" for c in cols})


RETRIEVAL_QUERIES: dict[str, tuple] = {
    "bm25_topk": (bm25_topk, None),
    "hybrid_rrf_topk": (hybrid_rrf_topk, None),
    "rag_mmr_contexts": (rag_mmr_contexts, None),
    "chunk_stats": (chunk_stats, None),
    "rag_topk_contexts": (rag_topk_contexts, None),
    "rag_reranked_contexts": (rag_reranked_contexts, None),
    "rag_answers": (rag_answers, None),
    "rag_eval_totals": (rag_eval_totals, None),
    "rag_ab_compare": (rag_ab_compare, None),
}
