"""Deterministic extractive answerer unit tests + RAG lifecycle rows."""

import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.functions.answerer import (NOT_FOUND,
                                                   PROMPT_OVERHEAD_TOKENS,
                                                   generate_answer)


def test_extracts_matching_sentence():
    ctx = ("[1] The quick brown fox jumps.\n\n"
           "[2] Table extraction uses grid lines. Nothing else here.\n\n"
           "[3] Some other topic entirely.")
    a = generate_answer("table extraction grid", ctx)
    assert "Table extraction uses grid lines." in a["answer"]
    assert NOT_FOUND not in a["answer"]
    assert a["output_tokens"] == len(a["answer"].split())
    assert a["input_tokens"] == (PROMPT_OVERHEAD_TOKENS
                                 + 3 + len(ctx.split()))
    assert a["total_tokens"] == a["input_tokens"] + a["output_tokens"]


def test_not_found_when_no_overlap():
    a = generate_answer("zebra quantum", "All about pdf layout parsing.")
    assert a["answer"] == NOT_FOUND


def test_deterministic():
    ctx = "Alpha beta gamma. Beta gamma delta. Gamma delta epsilon."
    assert generate_answer("gamma", ctx) == generate_answer("gamma", ctx)


def test_top_sentences_in_context_order():
    ctx = "B match here too. Irrelevant filler. A match here first."
    a = generate_answer("match here", ctx)
    # both matching sentences selected, emitted in CONTEXT order
    assert a["answer"] == "B match here too. A match here first."


@pytest.mark.usefixtures("ray_session")
def test_rag_answers_and_totals(tmp_path):
    import numpy as np
    from pdf_extraction_ray.pipelines.retrieval import (EVAL_QUERIES,
                                                        rag_ab_compare,
                                                        rag_answers,
                                                        rag_eval_totals)
    rng = np.random.default_rng(5)
    words = ("table extraction pipeline figure caption region quality "
             "score stream partition shuffle checkpoint resume manifest "
             "alpha beta gamma delta epsilon").split()
    texts = [" ".join(rng.choice(words, size=200)) + "." for _ in range(30)]
    d = tmp_path / "rag"
    d.mkdir()
    pd.DataFrame({"doc_id": range(30), "text": texts}) \
        .to_parquet(d / "documents.parquet")

    ans = rag_answers(str(d)).to_pandas()
    assert len(ans) == len(EVAL_QUERIES)
    assert (ans["total_tokens"]
            == ans["input_tokens"] + ans["output_tokens"]).all()
    assert (ans["answer"].str.len() > 0).all()

    tot = rag_eval_totals(str(d))
    assert int(tot["n_queries"].iloc[0]) == len(EVAL_QUERIES)
    assert int(tot["total_tokens"].iloc[0]) == int(ans["total_tokens"].sum())

    ab = rag_ab_compare(str(d))
    assert len(ab) == len(EVAL_QUERIES)
    # top-3 context always has >= as many prompt tokens as top-1
    assert (ab["token_diff"] >= 0).all()


def test_rerank_score_kernel():
    from pdf_extraction_ray.functions.rerank import rerank_score_x1e6

    assert rerank_score_x1e6("table extraction pipeline",
                             "the table extraction pipeline runs") == 1_000_000
    assert rerank_score_x1e6("table extraction pipeline",
                             "nothing relevant here") == 0
    # 1 of 3 query tokens present, case-insensitive
    assert rerank_score_x1e6("table extraction pipeline",
                             "a TABLE of numbers") == 333_333
    assert rerank_score_x1e6("", "anything") == 0
    assert rerank_score_x1e6("q", "") == 0


@pytest.mark.usefixtures("ray_session")
def test_reranked_contexts_prefer_lexical_overlap(tmp_path):
    """Two-stage retrieval: a chunk containing the literal query tokens
    must lead the reranked context even when embedding-similar noise
    chunks exist; the stage-2 order is deterministic."""
    from pdf_extraction_ray.pipelines.retrieval import (
        EVAL_QUERIES, rag_reranked_contexts)

    rng = np.random.default_rng(3)
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon",
                      "zeta", "eta", "theta"])
    texts = [" ".join(rng.choice(words, size=150)) + "." for _ in range(25)]
    # plant one perfect-overlap doc per eval query
    for qi, q in enumerate(EVAL_QUERIES):
        texts[qi] = (q + " ") * 40
    d = tmp_path / "rerank"
    d.mkdir()
    pd.DataFrame({"doc_id": range(len(texts)), "text": texts}) \
        .to_parquet(d / "documents.parquet")

    out = rag_reranked_contexts(str(d)).to_pandas()
    assert len(out) == len(EVAL_QUERIES)
    for _, r in out.iterrows():
        q = EVAL_QUERIES[int(r["query_id"])]
        first = r["context"].split("\n\n")[0]
        assert all(w in first.lower() for w in q.lower().split()), \
            (q, first[:80])
        assert int(r["top_rerank_x1e6"]) == 1_000_000
    again = rag_reranked_contexts(str(d)).to_pandas()
    pd.testing.assert_frame_equal(out, again)


@pytest.mark.usefixtures("ray_session")
def test_mmr_contexts_diversify():
    """MMR selection: one row per eval query; the FIRST pick maximizes
    query similarity (lambda term dominates an empty selected set), and
    at least one query's context differs from the plain top-k context
    (the diversity term re-orders near-duplicate-heavy pools)."""
    SF = "/root/testdata/sf0.001"
    from pdf_extraction_ray.pipelines.retrieval import (
        rag_mmr_contexts, rag_topk_contexts, _stage1_candidates)

    mmr = rag_mmr_contexts(SF).to_pandas()
    assert len(mmr) == 5
    assert (mmr.context.str.len() > 0).all()

    # first pick == stage-1 argmax per query
    pool = _stage1_candidates(SF).to_pandas()
    best = pool.sort_values(["score_x1e6", "doc_id", "chunk_id"],
                            ascending=[False, True, True]) \
        .groupby("query_id").first()
    got = mmr.set_index("query_id")["mmr_first_x1e6"]
    for qi in got.index:
        assert got.loc[qi] == best.loc[qi, "score_x1e6"], qi

    plain = rag_topk_contexts(SF).to_pandas()
    assert (mmr.context.values != plain.context.values).any()


@pytest.mark.usefixtures("ray_session")
def test_bm25_topk_matches_pure_reference():
    """Distributed BM25 is bit-exact against the pure-python reference
    (same float ops in the same order), after applying the same x1e6
    quantized (score desc, doc_id) tie-break to both."""
    import numpy as np
    import pandas as pd
    from pdf_extraction_ray.pipelines.retrieval import (
        BM25_QUERY, BM25_TOP_K, bm25_reference, bm25_topk)

    sf = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"])
    ref = bm25_reference(docs["text"].tolist(), BM25_QUERY)
    exp = pd.DataFrame({
        "doc_id": [int(docs["doc_id"].iloc[i]) for i, _ in ref],
        "score_x1e6": [int(np.floor(s * 1e6)) for _, s in ref]})
    exp = exp.sort_values(["score_x1e6", "doc_id"],
                          ascending=[False, True]).head(BM25_TOP_K) \
        .reset_index(drop=True)
    exp["bm_rank"] = np.arange(1, len(exp) + 1, dtype=np.int64)

    got = bm25_topk(sf).reset_index(drop=True)
    assert len(got) == BM25_TOP_K          # query terms exist in corpus
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


@pytest.mark.usefixtures("ray_session")
def test_bm25_planted_relevant_doc_ranks_first(tmp_path):
    import numpy as np
    import pandas as pd
    from pdf_extraction_ray.pipelines.retrieval import (
        BM25_QUERY, bm25_topk)
    filler = "alpha beta gamma delta epsilon " * 20
    relevant = (BM25_QUERY + " ") * 5 + filler
    df = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": [filler] * 9 + [relevant],
        "lang": ["en"] * 10, "source": ["s0"] * 10})
    d = tmp_path / "bm25"
    d.mkdir()
    df.to_parquet(str(d / "documents.parquet"))
    out = bm25_topk(str(d))
    assert int(out.loc[0, "doc_id"]) == 9
    assert len(out) == 1                   # filler docs score exactly 0


@pytest.mark.usefixtures("ray_session")
def test_hybrid_rrf_fusion_semantics(tmp_path):
    """RRF: a doc ranked #1 by BOTH legs must fuse above a doc ranked
    #1 by only one; integer RRF contributions are exact."""
    from pdf_extraction_ray.pipelines.retrieval import (
        BM25_QUERY, RRF_C, RRF_SCALE, hybrid_rrf_topk)
    filler = "alpha beta gamma delta epsilon " * 20
    both = (BM25_QUERY + " ") * 10                 # lexical AND dense hit
    sparse_only = (BM25_QUERY + " ") + filler * 3  # diluted dense cosine
    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [filler] * 6 + [sparse_only, both],
        "lang": ["en"] * 8, "source": ["s0"] * 8})
    d = tmp_path / "rrf"
    d.mkdir()
    df.to_parquet(str(d / "documents.parquet"))
    out = hybrid_rrf_topk(str(d))
    top = out.iloc[0]
    assert int(top["doc_id"]) == 7
    assert int(top["in_sparse"]) == 1 and int(top["in_dense"]) == 1
    # doc 7 leads both legs -> exact double first-rank contribution
    assert int(top["rrf_x1e9"]) == 2 * (RRF_SCALE // (RRF_C + 1))
    assert set(out["doc_id"]).issuperset({6, 7})
