"""Model-eval tier: exact-AUC differential vs a brute-force all-pairs
reference, perfect-separation / all-tied edge cases, and confusion-table
arithmetic on planted counts."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pdf_extraction_ray.pipelines import mleval as M


def _write_docs(d: str, texts, langs, sources=None):
    n = len(texts)
    pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": sources if sources is not None else ["s0"] * n,
        "n_chars": [len(t) for t in texts]}) \
        .to_parquet(os.path.join(d, "documents.parquet"))


def _brute_auc(scores, labels):
    """All-pairs Mann-Whitney reference: P(score_pos > score_neg) +
    0.5 * P(==)."""
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    num = 0.0
    for p in pos:
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    return num / (len(pos) * len(neg))


# stopword-rich text with long clean words scores high (~7.7e6, above
# the 4.6e6 gate); short punctuation junk scores ~1.0e6, below it
_HI = "the and wonderful the and wonderful the and wonderful"
_LO = "z. q, x; v: w? z. q, x; v: w? " * 4
_MID = "alpha beta the gamma delta and epsilon words here mixed in text"


@pytest.mark.usefixtures("ray_session")
def test_auc_perfect_separation(tmp_path):
    d = str(tmp_path)
    _write_docs(d, [_HI] * 5 + [_LO] * 7, ["en"] * 5 + ["de"] * 7)
    out = M.model_eval_auc(d)
    assert out.n_pos.iloc[0] == 5 and out.n_neg.iloc[0] == 7
    assert out.auc.iloc[0] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_auc_all_tied_is_half(tmp_path):
    d = str(tmp_path)
    _write_docs(d, [_MID] * 8, ["en"] * 3 + ["fr"] * 5)
    out = M.model_eval_auc(d)
    assert out.auc.iloc[0] == 0.5


@pytest.mark.usefixtures("ray_session")
def test_auc_matches_brute_force_pairs(tmp_path):
    """Mixed scores with ties: the histogram-scan AUC must equal the
    all-pairs reference computed from the very same per-doc scores."""
    d = str(tmp_path)
    rng = np.random.default_rng(7)
    texts, langs = [], []
    vocab = ["the", "and", "is", "zz", "qq", "word", "alpha", "!!", ",,"]
    for i in range(40):
        k = rng.integers(5, 30)
        texts.append(" ".join(rng.choice(vocab, size=k)))
        langs.append("en" if rng.random() < 0.4 else "de")
    _write_docs(d, texts, langs)

    tbl = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64)),
                    "text": pa.array(texts), "lang": pa.array(langs)})
    scores, labels = M._score_label_batch(tbl)
    want = _brute_auc(scores.tolist(), labels.tolist())

    out = M.model_eval_auc(d)
    assert out.auc.iloc[0] == pytest.approx(want, abs=0)


@pytest.mark.usefixtures("ray_session")
def test_auc_single_class_empty(tmp_path):
    d = str(tmp_path)
    _write_docs(d, [_HI] * 4, ["en"] * 4)
    assert len(M.model_eval_auc(d)) == 0


@pytest.mark.usefixtures("ray_session")
def test_confusion_planted_counts(tmp_path):
    """2 sources: src_a holds 2 TP + 1 FN, src_b holds 1 FP + 2 TN;
    precision/recall/F1 must be the exact floor divisions."""
    d = str(tmp_path)
    texts = [_HI, _HI, _LO, _HI, _LO, _LO]
    langs = ["en", "en", "en", "de", "de", "de"]
    sources = ["src_a", "src_a", "src_a", "src_b", "src_b", "src_b"]
    _write_docs(d, texts, langs, sources)
    out = M.model_eval_confusion(d).set_index("source")
    a, b = out.loc["src_a"], out.loc["src_b"]
    assert (a.tp, a.fp, a.fn, a.tn) == (2, 0, 1, 0)
    assert (b.tp, b.fp, b.fn, b.tn) == (0, 1, 0, 2)
    assert a.precision_x1e6 == 1_000_000
    assert a.recall_x1e6 == 2 * 1_000_000 // 3
    assert a.f1_x1e6 == 4 * 1_000_000 // 5
    assert b.precision_x1e6 == 0 and b.recall_x1e6 == -1 and b.f1_x1e6 == 0


@pytest.mark.usefixtures("ray_session")
def test_calibration_planted_bins(tmp_path):
    """Separable corpus: positives score high, negatives low -> bin 0
    holds only negatives, the top bin only positives; counts conserve."""
    d = str(tmp_path)
    _write_docs(d, [_HI] * 4 + [_LO] * 6, ["en"] * 4 + ["de"] * 6)
    out = M.model_eval_calibration(d)
    assert out.bin.between(0, M.N_CALIB_BINS - 1).all()
    assert out.n.sum() == 10 and out.n_pos.sum() == 4
    lo, hi = out.iloc[0], out.iloc[-1]
    assert lo.bin == 0 and lo.n == 6 and lo.n_pos == 0 \
        and lo.obs_rate_x1e6 == 0
    assert hi.bin == M.N_CALIB_BINS - 1 and hi.n == 4 and hi.n_pos == 4 \
        and hi.obs_rate_x1e6 == 1_000_000


@pytest.mark.usefixtures("ray_session")
def test_brier_matches_per_row_reference(tmp_path):
    """Distributed integer-unit Brier equals a per-row python reference
    over the same scores (same link, same floor-to-1e-8 rule)."""
    d = str(tmp_path)
    rng = np.random.default_rng(11)
    vocab = ["the", "and", "is", "zz", "qq", "word", "alpha", "!!", ",,"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(5, 30))))
             for _ in range(30)]
    langs = ["en" if rng.random() < 0.5 else "de" for _ in range(30)]
    _write_docs(d, texts, langs)
    tbl = pa.table({"doc_id": pa.array(np.arange(30, dtype=np.int64)),
                    "text": pa.array(texts), "lang": pa.array(langs)})
    scores, labels = M._score_label_batch(tbl)
    units = 0
    for s, y in zip(scores.tolist(), labels.tolist()):
        sc = float(s - M.MODEL_SCORE_THRESHOLD)
        p = 0.5 + sc / (2.0 * (abs(sc) + M.BRIER_LINK_C))
        units += int(np.floor((p - y) * (p - y) * 1e8))
    want = float(units) / (30.0 * 1e8)
    out = M.model_eval_brier(d)
    assert out.n.iloc[0] == 30 and out.brier.iloc[0] == want


@pytest.mark.usefixtures("ray_session")
def test_brier_perfect_predictions_near_zero(tmp_path):
    """Strongly separated corpus: the rational link saturates toward
    1/0, so the Brier score must be well under the 0.25 coin-flip line."""
    d = str(tmp_path)
    _write_docs(d, [_HI] * 5 + [_LO] * 5, ["en"] * 5 + ["de"] * 5)
    out = M.model_eval_brier(d)
    assert 0.0 <= out.brier.iloc[0] < 0.25


# ---------------------------------------------------------------------------
# Average precision + lift deciles
# ---------------------------------------------------------------------------

def _brute_ap_units(scores, labels):
    """Per-row reference under the pessimistic tie convention: order by
    (score desc, pos asc), sum floor(cum_pos * 1e9 / rank) over
    positives."""
    rows = sorted(zip(scores, labels), key=lambda r: (-r[0], r[1]))
    units = 0
    cum = 0
    for rn, (_, y) in enumerate(rows, start=1):
        cum += y
        if y:
            units += cum * M.AP_UNIT // rn
    return units, sum(labels)


@pytest.mark.usefixtures("ray_session")
def test_ap_matches_brute_force(tmp_path):
    d = str(tmp_path)
    rng = np.random.default_rng(13)
    vocab = ["the", "and", "is", "zz", "qq", "word", "alpha", "!!", ",,"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(5, 30))))
             for _ in range(40)]
    langs = ["en" if rng.random() < 0.4 else "de" for _ in range(40)]
    _write_docs(d, texts, langs)
    tbl = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64)),
                    "text": pa.array(texts), "lang": pa.array(langs)})
    scores, labels = M._score_label_batch(tbl)
    units, n_pos = _brute_ap_units(scores.tolist(), labels.tolist())
    out = M.model_eval_ap(d)
    assert out.ap.iloc[0] == float(units) / (float(n_pos) * M.AP_UNIT)


@pytest.mark.usefixtures("ray_session")
def test_ap_perfect_separation_is_one(tmp_path):
    d = str(tmp_path)
    _write_docs(d, [_HI] * 3 + [_LO] * 5, ["en"] * 3 + ["de"] * 5)
    assert M.model_eval_ap(d).ap.iloc[0] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_lift_perfect_separation(tmp_path):
    """16 docs, 4 positives all scoring highest: positives fill deciles
    0-2 and part of 3 (16/10 rounding), every later decile has lift 0,
    cumulative capture hits 1e6 by decile 3 and stays."""
    d = str(tmp_path)
    _write_docs(d, [_HI] * 4 + [_LO] * 12, ["en"] * 4 + ["de"] * 12)
    out = M.model_eval_lift_deciles(d).set_index("decile")
    assert int(out["n_rows"].sum()) == 16
    assert int(out["n_pos"].sum()) == 4
    # base rate 4/16: a pure-positive decile lifts 4x
    assert out.loc[0, "lift_x1e6"] == 4_000_000
    assert out.loc[9, "n_pos"] == 0 and out.loc[9, "lift_x1e6"] == 0
    assert out["cum_capture_x1e6"].iloc[-1] == 1_000_000
    assert out["cum_capture_x1e6"].is_monotonic_increasing


@pytest.mark.usefixtures("ray_session")
def test_roc_points_monotone_and_endpoint(tmp_path):
    """tp/fp cumulative down the threshold axis are monotone
    non-decreasing and the last point is (P, N) -> tpr = fpr = 1e6."""
    sf = "/root/testdata/sf0.001"
    from pdf_extraction_ray.pipelines.mleval import model_eval_roc_points
    out = model_eval_roc_points(sf)
    assert len(out) >= 2
    assert (np.diff(out["tp"]) >= 0).all()
    assert (np.diff(out["fp"]) >= 0).all()
    assert int(out["tpr_x1e6"].iloc[-1]) == 1_000_000
    assert int(out["fpr_x1e6"].iloc[-1]) == 1_000_000
    assert (np.diff(out["thr"]) < 0).all()


def _write_emb(d: str, mat, labels):
    n = len(labels)
    pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [np.asarray(v, dtype=np.float32) for v in mat],
        "label": np.asarray(labels, dtype=np.int32)}) \
        .to_parquet(os.path.join(d, "embeddings.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_ranking_planted_perfect_and_miss(tmp_path):
    """A query whose label-mates are exact copies of it ranks them all
    at the top (first_hit_rank 1, MRR 2520, AP numerator = full prefix
    sums); a query with no label-mates in the corpus scores all zeros."""
    rng = np.random.default_rng(7)
    d = 8
    q0 = rng.normal(size=d)
    # vec 0 = query; vecs 1..3 identical to it, same label 0
    mat = [q0, q0, q0, q0] + [rng.normal(size=d) for _ in range(8)]
    labels = [0, 0, 0, 0] + [1] * 4 + [2] * 4
    # second query (vec 1) shares label 0 -> also perfect; make an
    # isolated-label query by relabeling vec 4 to a unique label 9
    labels[4] = 9
    _write_emb(str(tmp_path), mat, labels)
    out = M.retrieval_eval_ranking(str(tmp_path))
    out = out.set_index("query_vec_id")
    # query 0: three identical same-label vectors at ranks 1-3
    assert out.loc[0, "first_hit_rank"] == 1
    assert out.loc[0, "mrr_x2520"] == 2520
    assert out.loc[0, "hits_k"] == 3
    # prefix precisions 1/1, 2/2, 3/3 -> 3 * 2520
    assert out.loc[0, "sum_prec_x2520"] == 3 * 2520
    assert out.loc[0, "rel_total"] == 3
    # query 4 (label 9, unique): nothing relevant anywhere
    assert out.loc[4, "rel_total"] == 0
    assert out.loc[4, "hits_k"] == 0
    assert out.loc[4, "first_hit_rank"] == 0
    assert out.loc[4, "mrr_x2520"] == 0
    assert out.loc[4, "sum_prec_x2520"] == 0


@pytest.mark.usefixtures("ray_session")
def test_ranking_empty_embeddings(tmp_path):
    _write_emb(str(tmp_path), [], [])
    out = M.retrieval_eval_ranking(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == list(M._RANKING_COLS)


@pytest.mark.usefixtures("ray_session")
def test_ranking_single_row_corpus_matches_oracle(tmp_path):
    """Degenerate 1-row corpus: the only query has zero candidates, so
    the SQL oracle's `win` CTE is empty and emits no row — the Python
    path must also emit none (not an all-zero row) for parity."""
    import duckdb
    _write_emb(str(tmp_path), [np.ones(64)], [0])
    out = M.retrieval_eval_ranking(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == list(M._RANKING_COLS)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')")
    orc = con.execute(M.RANKING_SQL).fetchdf()
    assert len(orc) == 0
