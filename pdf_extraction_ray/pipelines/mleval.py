"""Model-evaluation operators: exact distributed ROC-AUC, grouped
confusion/precision/recall metrics — the classifier-eval tier a
training-data pipeline runs after a quality model scores the corpus.

Reference analogs: the RAG evaluation's accuracy/latency totals
(`complete_multimodal_rag_evaluation.py:287-301`) are the reference's
only eval aggregates; these operators generalize that tier to proper
ranking metrics (Mann-Whitney AUC with tie correction) and per-source
confusion tables over the quality-model scores of
`pipelines/textops.py`.

Exactness strategy (shared with stats.py): the AUC numerator is an
exact Python-int accumulation over the compacted (score -> pos,neg)
histogram, converted to double ONCE with the same operation order the
oracle's HUGEINT sums + CAST AS DOUBLE perform; precision/recall/F1
are integer floor divisions (x1e6) so no float enters the comparison
at all.

Scale shape: one streaming pass over ``documents`` emits per-batch
(score, pos, neg) count partials; the only exchange is a groupby-sum
whose key space is the distinct-score domain (a compacted histogram,
the same pattern as events_value_deciles), and the final tie-corrected
scan runs over that small table on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

from ..functions import text as T
from .relational import _from_pandas, _table_empty
from .textops import _docs, MODEL_SCORE_THRESHOLD, QualityModel, _EN

POS_LANG = "en"


def _score_label_batch(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(model_score int64, label 0/1 int64) per row — the QualityModel
    linear score over the vectorized quality features, labelled by the
    documents table's own ``lang`` column (positive class = English)."""
    text = batch["text"].combine_chunks() \
        if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
    q = T.quality_scores(text)
    score = np.zeros(len(batch), dtype=np.int64)
    for col, w in QualityModel.WEIGHTS.items():
        score += w * q[col].to_numpy(zero_copy_only=False)
    lang = batch["lang"].to_numpy(zero_copy_only=False)
    label = (lang == POS_LANG).astype(np.int64)
    return score, label


def _scored_cte(extra: str = "") -> str:
    """``scored`` CTE (doc_id{extra}, score, pos) — the SQL mirror of
    ``_score_label_batch``, with optional extra pass-through columns
    (e.g. ``", source"``)."""
    return rf"""
WITH t AS (
  SELECT doc_id, lang{extra},
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS punct_cnt,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
  FROM documents),
q AS (
  SELECT doc_id, lang{extra},
       CASE WHEN n_chars > 0 THEN (punct_cnt * 1000000) // n_chars ELSE 0 END AS punct_ratio_x1e6,
       CASE WHEN len(toks) > 0 THEN
         (CAST(len(list_filter(ltoks, x -> x IN ({_EN}))) AS BIGINT) * 1000000) // len(toks)
       ELSE 0 END AS stop_ratio_x1e6,
       CASE WHEN len(toks) > 0 THEN
         (CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) * 1000000) // len(toks)
       ELSE 0 END AS mean_token_len_x1e6
  FROM t),
scored AS (
  SELECT doc_id{extra},
         2 * stop_ratio_x1e6 + mean_token_len_x1e6 - 3 * punct_ratio_x1e6
             AS score,
         CASE WHEN lang = '{POS_LANG}' THEN 1 ELSE 0 END AS pos
  FROM q)
"""


# ---------------------------------------------------------------------------
# Exact ROC AUC (Mann-Whitney with tie correction)
# ---------------------------------------------------------------------------

def model_eval_auc(sf_dir: str):
    """Exact ROC-AUC of the quality-model score against the lang='en'
    label: AUC = (sum over ascending scores of 2*neg_below*pos +
    pos*neg) / (2*P*N) — the Mann-Whitney U statistic with the 0.5
    tie credit. Per-batch partials compact rows to (score, pos, neg)
    counts; one groupby-sum builds the global histogram; the ordered
    scan over it runs driver-side in Python ints (exact at any scale)
    with ONE final int->double division. Output: (n_pos, n_neg, auc)."""
    empty = pd.DataFrame({"n_pos": pd.Series(dtype="int64"),
                          "n_neg": pd.Series(dtype="int64"),
                          "auc": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "documents"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        score, label = _score_label_batch(batch)
        df = pd.DataFrame({"score": score, "pos": label, "neg": 1 - label})
        return _from_pandas(df.groupby("score", as_index=False).sum())

    hist = (_docs(sf_dir, columns=("doc_id", "text", "lang"))
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("score")
            .aggregate(Sum("pos", alias_name="pos"),
                       Sum("neg", alias_name="neg"))
            .to_pandas())
    if hist.empty:
        return empty
    hist = hist.sort_values("score")
    pos = hist["pos"].to_numpy(np.int64)
    neg = hist["neg"].to_numpy(np.int64)
    n_pos, n_neg = int(pos.sum()), int(neg.sum())
    if n_pos == 0 or n_neg == 0:
        return empty
    # exact Python-int accumulation: x2 numerator carries the 0.5 tie
    # credit as an integer; one IEEE division at the very end
    num2 = 0
    neg_below = 0
    for p, n in zip(pos.tolist(), neg.tolist()):
        num2 += 2 * neg_below * p + p * n
        neg_below += n
    return pd.DataFrame({"n_pos": [n_pos], "n_neg": [n_neg],
                         "auc": [float(num2)
                                 / float(2 * n_pos * n_neg)]})


AUC_SQL = _scored_cte() + """
, h AS (
  SELECT score, SUM(pos) AS pos, SUM(1 - pos) AS neg
  FROM scored GROUP BY score),
c AS (
  SELECT pos, neg,
         COALESCE(SUM(neg) OVER (ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS neg_below
  FROM h),
agg AS (
  SELECT SUM(CAST(2 * neg_below * pos + pos * neg AS HUGEINT)) AS num2,
         SUM(pos) AS n_pos, SUM(neg) AS n_neg
  FROM c)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       CAST(num2 AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
FROM agg
WHERE n_pos > 0 AND n_neg > 0
"""


# ---------------------------------------------------------------------------
# Per-source confusion table at the production threshold
# ---------------------------------------------------------------------------

def model_eval_confusion(sf_dir: str):
    """Per-source confusion matrix of the thresholded quality gate
    (pred = score >= MODEL_SCORE_THRESHOLD) against the lang='en'
    label, with precision/recall/F1 as exact integer floor divisions
    (x1e6) — the per-slice eval table a data-quality dashboard shows.
    Four grouped count sums; the exchange moves <= 4 rows per batch
    per source. Output: (source, tp, fp, fn, tn, precision_x1e6,
    recall_x1e6, f1_x1e6; -1 sentinel when a denominator is 0)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("tp", "fp", "fn", "tn", "precision_x1e6",
                           "recall_x1e6", "f1_x1e6")})
    empty.insert(0, "source", pd.Series(dtype="object"))
    if _table_empty(sf_dir, "documents"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        score, label = _score_label_batch(batch)
        pred = (score >= MODEL_SCORE_THRESHOLD).astype(np.int64)
        src = batch["source"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "source": src,
            "tp": (pred & label).astype(np.int64),
            "fp": (pred & (1 - label)).astype(np.int64),
            "fn": ((1 - pred) & label).astype(np.int64),
            "tn": ((1 - pred) & (1 - label)).astype(np.int64)})
        return _from_pandas(df.groupby("source", as_index=False).sum())

    agg = (_docs(sf_dir, columns=("doc_id", "text", "lang", "source"))
           .map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby("source")
           .aggregate(*[Sum(c, alias_name=c)
                        for c in ("tp", "fp", "fn", "tn")])
           .to_pandas())
    if agg.empty:
        return empty
    tp = agg["tp"].to_numpy(np.int64)
    fp = agg["fp"].to_numpy(np.int64)
    fn = agg["fn"].to_numpy(np.int64)
    M = np.int64(1_000_000)
    agg["precision_x1e6"] = np.where(tp + fp > 0, tp * M // np.maximum(tp + fp, 1), -1)
    agg["recall_x1e6"] = np.where(tp + fn > 0, tp * M // np.maximum(tp + fn, 1), -1)
    agg["f1_x1e6"] = np.where(2 * tp + fp + fn > 0,
                              2 * tp * M // np.maximum(2 * tp + fp + fn, 1),
                              -1)
    return agg[["source", "tp", "fp", "fn", "tn", "precision_x1e6",
                "recall_x1e6", "f1_x1e6"]] \
        .sort_values("source").reset_index(drop=True)


CONFUSION_SQL = _scored_cte(", source") + f"""
, cm AS (
  SELECT source,
         SUM(CASE WHEN score >= {MODEL_SCORE_THRESHOLD} AND pos = 1
                  THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN score >= {MODEL_SCORE_THRESHOLD} AND pos = 0
                  THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN score < {MODEL_SCORE_THRESHOLD} AND pos = 1
                  THEN 1 ELSE 0 END) AS fn,
         SUM(CASE WHEN score < {MODEL_SCORE_THRESHOLD} AND pos = 0
                  THEN 1 ELSE 0 END) AS tn
  FROM scored GROUP BY source)
SELECT source, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CAST(CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp)
                 ELSE -1 END AS BIGINT) AS precision_x1e6,
       CAST(CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn)
                 ELSE -1 END AS BIGINT) AS recall_x1e6,
       CAST(CASE WHEN 2 * tp + fp + fn > 0
                 THEN 2 * tp * 1000000 // (2 * tp + fp + fn)
                 ELSE -1 END AS BIGINT) AS f1_x1e6
FROM cm
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Calibration table (fixed-width bins over the observed score range)
# ---------------------------------------------------------------------------

N_CALIB_BINS = 10


def _score_histogram(sf_dir: str) -> pd.DataFrame:
    """Compacted global (score -> pos, neg) histogram — the shared
    distributed pass behind AUC and calibration: per-batch partial
    counts, one groupby-sum whose key space is the distinct-score
    domain."""

    def partial(batch: pa.Table) -> pa.Table:
        score, label = _score_label_batch(batch)
        df = pd.DataFrame({"score": score, "pos": label, "neg": 1 - label})
        return _from_pandas(df.groupby("score", as_index=False).sum())

    return (_docs(sf_dir, columns=("doc_id", "text", "lang"))
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("score")
            .aggregate(Sum("pos", alias_name="pos"),
                       Sum("neg", alias_name="neg"))
            .to_pandas())


def model_eval_calibration(sf_dir: str):
    """Reliability/calibration table of the quality-model score against
    the lang='en' label: N_CALIB_BINS fixed-width bins over the observed
    [min, max] score range, per bin the row count, positive count, exact
    integer score sum and the observed positive rate (x1e6 floor
    division) — all derived driver-side from the SAME compacted
    (score -> pos, neg) histogram the AUC pass builds, so the only
    exchange is the histogram groupby. Output: (bin, n, n_pos,
    sum_score, obs_rate_x1e6)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("bin", "n", "n_pos", "sum_score",
                           "obs_rate_x1e6")})
    if _table_empty(sf_dir, "documents"):
        return empty
    hist = _score_histogram(sf_dir)
    if hist.empty:
        return empty
    score = hist["score"].to_numpy(np.int64)
    n = (hist["pos"] + hist["neg"]).to_numpy(np.int64)
    pos = hist["pos"].to_numpy(np.int64)
    mn, mx = int(score.min()), int(score.max())
    width = mx - mn + 1  # integer bin rule shared verbatim with the SQL
    bins = (score - mn) * N_CALIB_BINS // width
    df = pd.DataFrame({"bin": bins, "n": n, "n_pos": pos,
                       "sum_score": score * n})
    out = df.groupby("bin", as_index=False).sum()
    # exact ints only: observed rate as a floor division (never float)
    out["obs_rate_x1e6"] = out["n_pos"] * 1_000_000 // out["n"]
    return out.sort_values("bin").reset_index(drop=True)


CALIBRATION_SQL = _scored_cte() + f"""
, b AS (
  SELECT (score - MIN(score) OVER ()) * {N_CALIB_BINS}
             // (MAX(score) OVER () - MIN(score) OVER () + 1) AS bin,
         score, pos
  FROM scored)
SELECT CAST(bin AS BIGINT) AS bin, COUNT(*) AS n,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(score) AS BIGINT) AS sum_score,
       CAST(SUM(pos) * 1000000 // COUNT(*) AS BIGINT) AS obs_rate_x1e6
FROM b GROUP BY bin ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Brier score through an arithmetic-only (rational) probability link
# ---------------------------------------------------------------------------

BRIER_LINK_C = 1_000_000.0  # score-scale constant of the rational link


def model_eval_brier(sf_dir: str):
    """Brier score of the quality model: probability from the rational
    link p = 0.5 + s / (2*(|s| + C)) over the threshold-centered score
    s = score - MODEL_SCORE_THRESHOLD — monotone in the score, p = 0.5 at
    the production gate, and built
    from IEEE +,*,/,abs only, so per-row doubles are bit-identical on
    both engines (no exp/ln, whose libm rounding may differ). Each
    row's squared error is floored to integer 1e-8 units (int64 headroom out to ~1e10 rows); partial
    integer sums exchange one row per batch; the final mean is ONE
    exact-int -> double division. Output: (n, brier)."""
    empty = pd.DataFrame({"n": pd.Series(dtype="int64"),
                          "brier": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "documents"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        score, label = _score_label_batch(batch)
        s = (score - MODEL_SCORE_THRESHOLD).astype(np.float64)
        p = 0.5 + s / (2.0 * (np.abs(s) + BRIER_LINK_C))
        e = p - label.astype(np.float64)
        units = np.floor(e * e * 1e8).astype(np.int64)
        return pa.Table.from_pydict(
            {"n": [len(units)], "units": [int(units.sum())]},
            schema=pa.schema([("n", pa.int64()), ("units", pa.int64())]))

    agg = (_docs(sf_dir, columns=("doc_id", "text", "lang"))
           .map_batches(partial, batch_format="pyarrow", batch_size=None)
           .aggregate(Sum("n", alias_name="n"),
                      Sum("units", alias_name="units")))
    n = int(agg["n"])
    if n == 0:
        return empty
    units = int(agg["units"])
    return pd.DataFrame({"n": [n],
                         "brier": [float(units) / (float(n) * 1e8)]})


BRIER_SQL = _scored_cte() + f"""
, pe AS (
  -- e computed once, squared by plain multiplication (POWER may route
  -- through exp/ln and round differently than x*x)
  SELECT 0.5 + CAST(score - {MODEL_SCORE_THRESHOLD} AS DOUBLE)
             / (2.0 * (ABS(CAST(score - {MODEL_SCORE_THRESHOLD} AS DOUBLE))
                       + {BRIER_LINK_C!r}))
         - CAST(pos AS DOUBLE) AS e
  FROM scored),
e AS (
  SELECT CAST(FLOOR(e * e * 1e8) AS BIGINT) AS units FROM pe)
SELECT COUNT(*) AS n,
       CAST(SUM(units) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e8)
           AS brier
FROM e HAVING COUNT(*) > 0
"""


# ---------------------------------------------------------------------------
# Average precision (tie-deterministic, integer floor units)
# ---------------------------------------------------------------------------

AP_UNIT = 1_000_000_000  # precision@k floored to 1e-9 units before summing


def model_eval_ap(sf_dir: str):
    """Exact average precision of the quality-model score under the
    pessimistic tie convention (within a tied score block, negatives
    rank BEFORE positives — a total order both engines share without
    needing a per-row tiebreak column): AP = mean over positives of
    precision@rank, each precision floored to integer 1e-9 units so the
    sum is order-free exact integer math. Derived driver-side from the
    SAME compacted (score -> pos, neg) histogram as the AUC — for a
    tied block at cumulative (pos_before=A, total_before=Tb) with p
    positives of t rows, the j-th positive sits at rank Tb+(t-p)+j with
    cum_pos A+j. Output: (n, n_pos, ap)."""
    empty = pd.DataFrame({"n": pd.Series(dtype="int64"),
                          "n_pos": pd.Series(dtype="int64"),
                          "ap": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "documents"):
        return empty
    hist = _score_histogram(sf_dir)
    if hist.empty:
        return empty
    hist = hist.sort_values("score", ascending=False)
    pos = hist["pos"].to_numpy(np.int64)
    neg = hist["neg"].to_numpy(np.int64)
    n_pos, n = int(pos.sum()), int((pos + neg).sum())
    if n_pos == 0:
        return empty
    units = 0
    A = 0   # positives above this block
    Tb = 0  # rows above this block
    for p, ng in zip(pos.tolist(), neg.tolist()):
        if p:
            j = np.arange(1, p + 1, dtype=np.int64)
            # (A+j)*AP_UNIT fits int64 out to ~9e9 positives
            units += int((((A + j) * AP_UNIT) // (Tb + ng + j)).sum())
        A += p
        Tb += p + ng
    return pd.DataFrame({"n": [n], "n_pos": [n_pos],
                         "ap": [float(units) / (float(n_pos) * AP_UNIT)]})


AP_SQL = _scored_cte() + f"""
, r AS (
  SELECT pos,
         ROW_NUMBER() OVER (ORDER BY score DESC, pos ASC) AS rn,
         SUM(pos) OVER (ORDER BY score DESC, pos ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum_pos
  FROM scored),
agg AS (
  SELECT COUNT(*) AS n, SUM(pos) AS n_pos,
         SUM(CASE WHEN pos = 1
                  THEN CAST(cum_pos AS HUGEINT) * {AP_UNIT} // rn
                  ELSE 0 END) AS units
  FROM r)
SELECT CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       CAST(units AS DOUBLE) / (CAST(n_pos AS DOUBLE) * {AP_UNIT}.0) AS ap
FROM agg WHERE n_pos > 0
"""


# ---------------------------------------------------------------------------
# Lift / gain table by score decile
# ---------------------------------------------------------------------------

N_LIFT_BINS = 10


def model_eval_lift_deciles(sf_dir: str):
    """Lift/gain table: rows ranked by score descending (pessimistic
    tie convention, as in AP), cut into N_LIFT_BINS equal-count bins by
    rank; per bin the row count, positive count, lift vs the base rate
    (x1e6 floor division: pos_d * n * 1e6 // (n_d * n_pos)) and the
    cumulative capture rate (cum_pos * 1e6 // n_pos) — the campaign-
    targeting diagnostic every scoring pipeline ships. Derived from the
    compacted histogram by interval intersection of each tied block's
    negative/positive rank ranges with the decile boundaries, so the
    only exchange is the histogram groupby. Output: (decile, n_rows,
    n_pos, lift_x1e6, cum_capture_x1e6)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("decile", "n_rows", "n_pos", "lift_x1e6",
                           "cum_capture_x1e6")})
    if _table_empty(sf_dir, "documents"):
        return empty
    hist = _score_histogram(sf_dir)
    if hist.empty:
        return empty
    hist = hist.sort_values("score", ascending=False)
    pos = hist["pos"].to_numpy(np.int64)
    neg = hist["neg"].to_numpy(np.int64)
    n_pos, n = int(pos.sum()), int((pos + neg).sum())
    if n_pos == 0:
        return empty
    # decile of rank rn (1-based) = (rn-1)*B // n; bin d covers ranks
    # [d*n//B + 1, (d+1)*n//B]  (exact complement of the floor rule)
    B = N_LIFT_BINS
    bounds = [(d * n // B, (d + 1) * n // B) for d in range(B)]  # (lo, hi]
    n_d = np.zeros(B, dtype=np.int64)
    pos_d = np.zeros(B, dtype=np.int64)
    Tb = 0
    A = 0
    for p, ng in zip(pos.tolist(), neg.tolist()):
        t = p + ng
        pos_lo, pos_hi = Tb + ng, Tb + t        # positives occupy (lo, hi]
        for d, (lo, hi) in enumerate(bounds):
            if lo >= Tb + t or hi <= Tb:
                continue
            n_d[d] += min(hi, Tb + t) - max(lo, Tb)
            pos_d[d] += max(0, min(hi, pos_hi) - max(lo, pos_lo))
        Tb += t
        A += p
    cum = np.cumsum(pos_d)
    out = pd.DataFrame({
        "decile": np.arange(B, dtype=np.int64),
        "n_rows": n_d, "n_pos": pos_d,
        "lift_x1e6": np.array(
            [int(pd_) * n * 1_000_000 // (int(nd) * n_pos) if nd else -1
             for pd_, nd in zip(pos_d, n_d)], dtype=np.int64),
        "cum_capture_x1e6": np.array(
            [int(c) * 1_000_000 // n_pos for c in cum], dtype=np.int64)})
    return out[out["n_rows"] > 0].reset_index(drop=True)


LIFT_SQL = _scored_cte() + f"""
, r AS (
  SELECT pos, ROW_NUMBER() OVER (ORDER BY score DESC, pos ASC) AS rn,
         COUNT(*) OVER () AS n, SUM(pos) OVER () AS n_pos
  FROM scored),
b AS (
  SELECT (rn - 1) * {N_LIFT_BINS} // n AS decile, pos, n, n_pos FROM r),
g AS (
  SELECT decile, COUNT(*) AS n_rows, SUM(pos) AS pos_d,
         MAX(n) AS n, MAX(n_pos) AS n_pos
  FROM b GROUP BY decile)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(pos_d AS BIGINT) AS n_pos,
       CAST(CASE WHEN n_rows > 0
                 THEN CAST(pos_d AS HUGEINT) * n * 1000000
                      // (CAST(n_rows AS HUGEINT) * n_pos)
                 ELSE -1 END AS BIGINT) AS lift_x1e6,
       CAST(SUM(pos_d) OVER (ORDER BY decile
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)
            * 1000000 // MAX(n_pos) OVER () AS BIGINT)
           AS cum_capture_x1e6
FROM g
WHERE n_pos > 0
ORDER BY decile
"""


def model_eval_roc_points(sf_dir: str):
    """The FULL ROC / precision-recall curve, one point per distinct
    score threshold (pred = score >= thr): cumulative tp/fp down the
    descending score axis plus tpr/fpr/precision as exact x1e6 floor
    divisions — the curve behind the AUC scalar, integer end to end.
    Same compacted (score -> pos,neg) histogram exchange as the AUC;
    the cumulative scan is distinct-score-bounded.
    Output: (thr, tp, fp, tpr_x1e6, fpr_x1e6, precision_x1e6)."""
    cols = ("thr", "tp", "fp", "tpr_x1e6", "fpr_x1e6",
            "precision_x1e6")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _table_empty(sf_dir, "documents"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        score, label = _score_label_batch(batch)
        df = pd.DataFrame({"score": score, "pos": label,
                           "neg": 1 - label})
        return _from_pandas(df.groupby("score", as_index=False).sum())

    hist = (_docs(sf_dir, columns=("doc_id", "text", "lang"))
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("score")
            .aggregate(Sum("pos", alias_name="pos"),
                       Sum("neg", alias_name="neg"))
            .to_pandas())
    if hist.empty:
        return empty
    hist = hist.sort_values("score", ascending=False)
    pos = hist["pos"].to_numpy(np.int64)
    neg = hist["neg"].to_numpy(np.int64)
    n_pos, n_neg = int(pos.sum()), int(neg.sum())
    if n_pos == 0 or n_neg == 0:
        return empty
    tp = pos.cumsum()
    fp = neg.cumsum()
    return pd.DataFrame({
        "thr": hist["score"].to_numpy(np.int64),
        "tp": tp, "fp": fp,
        "tpr_x1e6": tp * 1_000_000 // n_pos,
        "fpr_x1e6": fp * 1_000_000 // n_neg,
        "precision_x1e6": tp * 1_000_000 // (tp + fp)}) \
        .astype("int64").reset_index(drop=True)


ROC_SQL = _scored_cte() + """
, h AS (
  SELECT score, SUM(pos) AS pos, SUM(1 - pos) AS neg
  FROM scored GROUP BY score),
c AS (
  SELECT score,
         SUM(pos) OVER (ORDER BY score DESC
                        ROWS UNBOUNDED PRECEDING) AS tp,
         SUM(neg) OVER (ORDER BY score DESC
                        ROWS UNBOUNDED PRECEDING) AS fp
  FROM h),
tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS p,
               CAST(SUM(neg) AS BIGINT) AS n FROM h)
SELECT CAST(score AS BIGINT) AS thr,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(tp * 1000000 // p AS BIGINT) AS tpr_x1e6,
       CAST(fp * 1000000 // n AS BIGINT) AS fpr_x1e6,
       CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_x1e6
FROM c, tot WHERE p > 0 AND n > 0
ORDER BY thr DESC
"""


# --- ranking-metrics eval (MRR / MAP / hits@K over planted qrels) ------
#
# The retrieval-eval counterpart of the classifier metrics above: given a
# query workload (the RANKING_QUERY_N smallest vec_ids) and graded
# relevance (a candidate is relevant iff it shares the query's ``label``,
# self excluded), rank the corpus by the FIXED-POINT cosine kernel
# (functions/vectors.py — the bit-exact dedup/oracle kernel) and emit
# per-query integer ranking metrics. Reference analog: the RAG
# evaluation's per-query provenance/accuracy loop
# (complete_multimodal_rag_evaluation.py:222-301) — generalized to
# standard IR metrics.
#
# Exactness: every metric is an INTEGER. Reciprocal ranks use the
# lcm(1..10) = 2520 trick — 2520/r is exact for every rank r <= K — so
# MRR and the un-normalized MAP numerator (sum of precision@hit-ranks,
# each hits_so_far * 2520/r) never touch floats. Scale shape: one
# streaming corpus pass with the (Q x d) quantized query matrix
# broadcast once via ray.put; each batch emits only per-query partial
# top-4K candidates plus a per-query relevant-count partial (bounded:
# batches x Q rows), so the exact final rank runs over a tiny set.

RANKING_QUERY_N = 8
RANKING_K = 10
_RANK_LCM = 2520          # lcm(1..10): 2520 // r exact for r in 1..K

_RANKING_COLS = ("query_vec_id", "rel_total", "hits_k", "first_hit_rank",
                 "mrr_x2520", "sum_prec_x2520")


def retrieval_eval_ranking(sf_dir: str):
    """Per-query ranking metrics (hits@K, first-hit rank, MRR_x2520,
    MAP-numerator sum_prec_x2520, corpus relevant count) for the
    RANKING_QUERY_N smallest vec_ids over the fixed-point-cosine ranking,
    relevance = shared ``label``. All-integer output; oracled."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..functions import vectors as V

    empty = pd.DataFrame({c: pd.Series(dtype="int64")
                          for c in _RANKING_COLS})
    vid_col = pq.read_table(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id"])
    if vid_col.num_rows == 0:
        return empty
    qid_list = np.sort(vid_col["vec_id"].to_numpy())[:RANKING_QUERY_N]
    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filters=[("vec_id", "in", qid_list.tolist())]).to_pandas() \
        .sort_values("vec_id")
    qids = qt["vec_id"].to_numpy(np.int64)
    qlab = qt["label"].to_numpy(np.int64)
    qm = V.quantize(np.stack(qt["embedding"].to_numpy()))
    qref = ray.put((qids, qlab, qm))
    keep = 4 * RANKING_K

    def partial(batch: pa.Table) -> pa.Table:
        qids, qlab, qm = ray.get(qref)
        q = V.quantize_batch(batch)
        cos = V.cosine_x1e6(q, qm)                    # (n, Q) int64
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        labs = batch["label"].to_numpy(zero_copy_only=False)
        rel_m = labs[:, None] == qlab[None, :]        # (n, Q)
        not_self = vids[:, None] != qids[None, :]
        out_q, out_v, out_c, out_r, out_k = [], [], [], [], []
        for j, qid in enumerate(qids):
            m = not_self[:, j]
            order = np.lexsort((vids[m], -cos[m, j]))[:keep]
            vv, cc = vids[m][order], cos[m, j][order]
            out_q.append(np.full(len(vv) + 1, qid, dtype=np.int64))
            out_v.append(np.concatenate([vv, [-1]]))
            out_c.append(np.concatenate([cc, [0]]))
            out_r.append(np.concatenate(
                [rel_m[m, j][order].astype(np.int64),
                 [int((rel_m[:, j] & m).sum())]]))
            out_k.append(np.concatenate(
                [np.zeros(len(vv), dtype=np.int64), [1]]))
        return pa.Table.from_pydict({
            "qid": np.concatenate(out_q), "vid": np.concatenate(out_v),
            "cos": np.concatenate(out_c), "rel": np.concatenate(out_r),
            "is_cnt": np.concatenate(out_k)})

    rows = (rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .to_pandas())         # bounded: batches x Q x (4K + 1) rows
    cnts = rows[rows["is_cnt"] == 1].groupby("qid")["rel"].sum()
    cand = rows[rows["is_cnt"] == 0]
    top = (cand.sort_values(["qid", "cos", "vid"],
                            ascending=[True, False, True])
           .groupby("qid").head(RANKING_K).copy())
    top["rnk"] = top.groupby("qid").cumcount() + 1
    top["hsf"] = top.groupby("qid")["rel"].cumsum()
    out = []
    for qid in qids:
        g = top[top["qid"] == qid]
        if len(g) == 0:
            # query with zero candidates (e.g. a 1-row corpus): the
            # oracle's `win` CTE is empty for this qid and emits no
            # row — skip it here too so both engines agree.
            continue
        hit_rnk = g.loc[g["rel"] == 1, "rnk"]
        first = int(hit_rnk.min()) if len(hit_rnk) else 0
        out.append((int(qid), int(cnts.get(qid, 0)),
                    int(g["rel"].sum()), first,
                    _RANK_LCM // first if first else 0,
                    int((g["rel"] * g["hsf"]
                         * (_RANK_LCM // g["rnk"])).sum())))
    return pd.DataFrame(out, columns=list(_RANKING_COLS)) \
        .astype("int64").sort_values("query_vec_id") \
        .reset_index(drop=True)


RANKING_SQL = f"""
WITH qsel AS (
  SELECT vec_id AS qid, label AS qlabel
  FROM embeddings ORDER BY vec_id LIMIT {RANKING_QUERY_N}),
ev AS (
  SELECT vec_id, i,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000.0) AS BIGINT) AS q
  FROM embeddings, range(1, 65) t(i)),
nrm AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS n2
        FROM ev GROUP BY vec_id),
dots AS (
  SELECT a.vec_id AS qid, b.vec_id AS vid,
         CAST(SUM(a.q * b.q) AS BIGINT) AS dot
  FROM ev a JOIN ev b ON a.i = b.i
  WHERE a.vec_id IN (SELECT qid FROM qsel) AND b.vec_id <> a.vec_id
  GROUP BY a.vec_id, b.vec_id),
cos AS (
  SELECT d.qid, d.vid,
         CAST(FLOOR(d.dot / (sqrt(na.n2) * sqrt(nb.n2)) * 1000000.0)
              AS BIGINT) AS c
  FROM dots d
  JOIN nrm na ON na.vec_id = d.qid
  JOIN nrm nb ON nb.vec_id = d.vid),
ranked AS (
  SELECT qid, vid, c,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY c DESC, vid ASC) AS BIGINT) AS rnk
  FROM cos),
win AS (
  SELECT r.qid, r.rnk,
         CASE WHEN e.label = qs.qlabel THEN 1 ELSE 0 END AS rel,
         SUM(CASE WHEN e.label = qs.qlabel THEN 1 ELSE 0 END)
             OVER (PARTITION BY r.qid ORDER BY r.rnk) AS hsf
  FROM ranked r
  JOIN embeddings e ON e.vec_id = r.vid
  JOIN qsel qs ON qs.qid = r.qid
  WHERE r.rnk <= {RANKING_K}),
relt AS (
  SELECT qs.qid, CAST(COUNT(*) AS BIGINT) AS rel_total
  FROM qsel qs JOIN embeddings e
    ON e.label = qs.qlabel AND e.vec_id <> qs.qid
  GROUP BY qs.qid)
SELECT w.qid AS query_vec_id,
       CAST(COALESCE(MAX(rt.rel_total), 0) AS BIGINT) AS rel_total,
       CAST(SUM(w.rel) AS BIGINT) AS hits_k,
       CAST(COALESCE(MIN(CASE WHEN w.rel = 1 THEN w.rnk END), 0)
            AS BIGINT) AS first_hit_rank,
       CAST(COALESCE({_RANK_LCM} // MIN(CASE WHEN w.rel = 1 THEN w.rnk END),
                     0) AS BIGINT) AS mrr_x2520,
       CAST(SUM(CASE WHEN w.rel = 1
                     THEN w.hsf * ({_RANK_LCM} // w.rnk) ELSE 0 END)
            AS BIGINT) AS sum_prec_x2520
FROM win w LEFT JOIN relt rt ON rt.qid = w.qid
GROUP BY w.qid
ORDER BY query_vec_id
"""


MLEVAL_QUERIES: dict[str, tuple] = {
    "model_eval_roc_points": (model_eval_roc_points, ROC_SQL),
    "model_eval_auc": (model_eval_auc, AUC_SQL),
    "model_eval_confusion": (model_eval_confusion, CONFUSION_SQL),
    "model_eval_calibration": (model_eval_calibration, CALIBRATION_SQL),
    "model_eval_brier": (model_eval_brier, BRIER_SQL),
    "model_eval_ap": (model_eval_ap, AP_SQL),
    "model_eval_lift_deciles": (model_eval_lift_deciles, LIFT_SQL),
    "retrieval_eval_ranking": (retrieval_eval_ranking, RANKING_SQL),
}
