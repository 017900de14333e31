"""Text-analysis pipelines over the ``documents`` table: token counting,
quality scoring, language ID, exact dedup, chunking, fingerprinting —
the training-data-pipeline text operators, each vectorized per batch and
(where SQL-expressible) paired with a DuckDB oracle.

All fractional scores are integer-scaled (``x1e6`` via integer division)
so distributed execution and the SQL oracle agree bit-exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from ..functions import text as T
from ..functions.arrow_utils import as_array
from ..functions.chunker import chunk_text
from ..functions.hashing import rolling_fingerprint


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=list(columns))


# ---------------------------------------------------------------------------
# Token / char statistics
# ---------------------------------------------------------------------------

def doc_token_stats(sf_dir: str):
    def fn(batch: pa.Table) -> pa.Table:
        stats = T.token_stats(batch["text"].combine_chunks()
                              if isinstance(batch["text"], pa.ChunkedArray)
                              else batch["text"])
        return pa.Table.from_arrays(
            [batch["doc_id"], stats["n_chars"], stats["n_tokens"],
             stats["n_tokens_bpe"], stats["token_chars"], stats["punct_cnt"]],
            names=["doc_id", "n_chars", "n_tokens", "n_tokens_bpe",
                   "token_chars", "punct_cnt"])
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None)


# the BPE-ish pattern is RE2 in both engines (Arrow count_substring_regex
# and DuckDB regexp_extract_all), so counts match exactly
TOKEN_STATS_SQL = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, $$'[a-z]+|\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+$$)) AS BIGINT) AS n_tokens_bpe,
       CAST(list_aggregate(list_transform(regexp_split_to_array(trim(text), '\s+'),
                                          x -> length(x)), 'sum') AS BIGINT) AS token_chars,
       CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS punct_cnt
FROM documents
"""


# ---------------------------------------------------------------------------
# Quality scores
# ---------------------------------------------------------------------------

def doc_quality(sf_dir: str):
    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        q = T.quality_scores(text)
        return pa.Table.from_arrays(
            [batch["doc_id"], q["n_chars"], q["n_tokens"],
             q["punct_ratio_x1e6"], q["stop_ratio_x1e6"],
             q["mean_token_len_x1e6"]],
            names=["doc_id", "n_chars", "n_tokens", "punct_ratio_x1e6",
                   "stop_ratio_x1e6", "mean_token_len_x1e6"])
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None)


_EN = ", ".join(f"'{w}'" for w in T.LANG_STOPWORDS["en"])
QUALITY_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS punct_cnt,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
  FROM documents)
SELECT doc_id, n_chars,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CASE WHEN n_chars > 0 THEN (punct_cnt * 1000000) // n_chars ELSE 0 END AS punct_ratio_x1e6,
       CASE WHEN len(toks) > 0 THEN
         (CAST(len(list_filter(ltoks, x -> x IN ({_EN}))) AS BIGINT) * 1000000) // len(toks)
       ELSE 0 END AS stop_ratio_x1e6,
       CASE WHEN len(toks) > 0 THEN
         (CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) * 1000000) // len(toks)
       ELSE 0 END AS mean_token_len_x1e6
FROM t
"""


_SWEEP_STEP = 100_000            # stop-ratio threshold grid (x1e6 units)
_SWEEP_BINS = 10


def doc_quality_threshold_sweep(sf_dir: str):
    """Threshold-selection curve for the stopword-ratio quality gate
    (the FineWeb-style sweep run before fixing a filter threshold):
    for each threshold t in {0, 0.1, ..., 0.9} (x1e6 integer units),
    how many documents and tokens survive ``stop_ratio >= t``.

    Scale shape: one pass bins each doc's ratio into its threshold
    decile and pre-reduces (bin -> n_docs, n_tokens) per batch; the
    exchange moves <= 10 rows per batch, and the suffix-sum that turns
    the histogram into the kept-at-threshold curve runs on the 10-row
    result. The sweep is corpus-size-free after the single scan."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) \
            else batch["text"]
        q = T.quality_scores(text)
        ratio = q["stop_ratio_x1e6"].to_numpy(zero_copy_only=False)
        ntok = q["n_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = np.clip(ratio // _SWEEP_STEP, 0, _SWEEP_BINS - 1) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "bin": np.arange(_SWEEP_BINS, dtype=np.int64),
            "n_docs": np.bincount(b, minlength=_SWEEP_BINS)
            .astype(np.int64),
            "n_tokens": np.bincount(b, weights=ntok,
                                    minlength=_SWEEP_BINS)
            .astype(np.int64)})

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby("bin")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens"))
            .to_pandas())
    nd = np.zeros(_SWEEP_BINS, dtype=np.int64)
    nt = np.zeros(_SWEEP_BINS, dtype=np.int64)
    if not hist.empty:
        nd[hist["bin"].to_numpy()] = hist["n_docs"].to_numpy()
        nt[hist["bin"].to_numpy()] = hist["n_tokens"].to_numpy()
    return pd.DataFrame({
        "thr": np.arange(_SWEEP_BINS, dtype=np.int64) * _SWEEP_STEP,
        "n_docs_kept": nd[::-1].cumsum()[::-1].astype(np.int64),
        "n_tokens_kept": nt[::-1].cumsum()[::-1].astype(np.int64)})


QUALITY_SWEEP_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
  FROM documents),
s AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) > 0 THEN
           (CAST(len(list_filter(ltoks, x -> x IN ({{EN}}))) AS BIGINT)
            * 1000000) // len(toks)
         ELSE 0 END AS stop_ratio
  FROM t),
thr AS (SELECT unnest(range(0, {_SWEEP_BINS})) * {_SWEEP_STEP} AS thr)
SELECT thr.thr AS thr,
       CAST(count(s.doc_id) AS BIGINT) AS n_docs_kept,
       CAST(coalesce(sum(s.n_tokens), 0) AS BIGINT) AS n_tokens_kept
FROM thr LEFT JOIN s ON s.stop_ratio >= thr.thr
GROUP BY thr.thr ORDER BY thr.thr
""".replace("{EN}", _EN)


# ---------------------------------------------------------------------------
# Language ID (stopword-profile heuristic)
# ---------------------------------------------------------------------------

def doc_langid(sf_dir: str):
    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        return pa.Table.from_arrays([batch["doc_id"], T.langid(text)],
                                    names=["doc_id", "pred_lang"])
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None)


def _langid_pieces() -> tuple[str, str]:
    hits = {lang: f"len(list_filter(ltoks, x -> x IN "
                  f"({', '.join(repr(w) for w in T.LANG_STOPWORDS[lang])})))"
            for lang in T.LANG_ORDER}
    # earlier languages win ties: strict comparison against earlier langs,
    # >= against later ones (mirrors numpy argmax tie-break in T.langid)
    cascades = []
    for i, lang in enumerate(T.LANG_ORDER):
        parts = [f"s_{lang} > s_{o}" for o in T.LANG_ORDER[:i]]
        parts += [f"s_{lang} >= s_{o}" for o in T.LANG_ORDER[i + 1:]]
        cond = " AND ".join(parts) if parts else "TRUE"
        cascades.append(f"WHEN {cond} AND s_{lang} >= {T.LANG_MIN_HITS} THEN '{lang}'")
    case = "CASE " + " ".join(cascades) + " ELSE 'und' END"
    sels = ", ".join(f"{expr} AS s_{lang}" for lang, expr in hits.items())
    return sels, case


def _langid_sql() -> str:
    sels, case = _langid_pieces()
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
  FROM documents),
s AS (SELECT doc_id, {sels} FROM t)
SELECT doc_id, {case} AS pred_lang FROM s
"""


def _langid_accuracy_sql() -> str:
    sels, case = _langid_pieces()
    return rf"""
WITH t AS (
  SELECT lang, regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
  FROM documents),
s AS (SELECT lang, {sels} FROM t),
p AS (SELECT lang, {case} AS pred_lang FROM s)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (pred_lang = lang) AS BIGINT) AS n_correct
FROM p GROUP BY lang ORDER BY lang
"""


LANGID_SQL = _langid_sql()
LANGID_ACC_SQL = _langid_accuracy_sql()


# ---------------------------------------------------------------------------
# Exact dedup: hash-partitioned group-by-content, keep first
# ---------------------------------------------------------------------------

def doc_dedup_exact(sf_dir: str):
    """Exact dedup groups: md5 of normalized text -> representative doc
    (min doc_id) + group size. At scale the md5 key hash-partitions the
    shuffle; content never re-ships after the key column is added."""
    def keyed(batch: pa.Table) -> pa.Table:
        norm = T.normalize_for_dedup(
            batch["text"].combine_chunks()
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"])
        md5 = pa.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                        for s in norm.to_pylist()], type=pa.string())
        return pa.Table.from_arrays([md5, batch["doc_id"]],
                                    names=["text_md5", "doc_id"])

    return (_docs(sf_dir).map_batches(keyed, batch_format="pyarrow", batch_size=None)
            .groupby("text_md5")
            .aggregate(Min("doc_id", alias_name="rep_doc_id"),
                       Count(alias_name="n_dups"))
            .sort("text_md5"))


DEDUP_EXACT_SQL = """
SELECT md5(lower(trim(text))) AS text_md5,
       MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_dups
FROM documents GROUP BY text_md5 ORDER BY text_md5
"""


# ---------------------------------------------------------------------------
# Incremental (cross-snapshot) dedup: new docs vs a prior snapshot
# ---------------------------------------------------------------------------

def doc_dedup_incremental(sf_dir: str):
    """Cross-snapshot contamination check — the month-over-month crawl
    shape: documents with even doc_id stand in for the PRIOR snapshot,
    odd for the NEW batch; flag every new doc sharing a verbatim
    20-token block with prior content, attributed to the smallest such
    prior doc. Both sides reduce to (doc, block-md5) rows inside their
    scan and meet in ONE coarse md5-keyed exchange (text never
    re-ships; at real scale the prior side is the stored block index,
    read not recomputed); the per-doc MIN attribution finishes on the
    small match set."""
    from ray.data.aggregate import Min as _Min

    from .corpus import _block_rows
    from .relational import _coarse_str_partition_map

    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "dup_of": pd.Series(dtype="int64")})

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        doc = g["doc_id"].to_numpy()
        prior = g[doc % 2 == 0].groupby("blk_md5")["doc_id"].min()
        new = g[doc % 2 == 1][["doc_id", "blk_md5"]].drop_duplicates()
        dup_of = prior.reindex(new["blk_md5"]).to_numpy()
        hit = ~pd.isna(dup_of)
        out = pd.DataFrame({
            "doc_id": new["doc_id"].to_numpy()[hit].astype("int64"),
            "dup_of": dup_of[hit].astype("int64")})
        # partial per-doc MIN (several blocks of one doc land here)
        return out.groupby("doc_id", as_index=False).min()

    blocks = _docs(sf_dir).map_batches(_block_rows, batch_format="pyarrow",
                                       batch_size=None)
    matches = _coarse_str_partition_map(blocks, "blk_md5", part_fn)
    out = matches.groupby("doc_id") \
        .aggregate(_Min("dup_of", alias_name="dup_of")).to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return empty
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype("int64")


DEDUP_INCREMENTAL_SQL = rf"""
WITH t AS (SELECT doc_id,
                  regexp_split_to_array(lower(trim(text)), '\s+') AS toks
           FROM documents),
u AS (SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) - 1 AS ord FROM t),
b AS (SELECT doc_id, ord // 20 AS blk,
             md5(string_agg(tok, ' ' ORDER BY ord)) AS blk_md5
      FROM u GROUP BY doc_id, blk)
SELECT n.doc_id, CAST(MIN(p.dup_of) AS BIGINT) AS dup_of
FROM (SELECT DISTINCT doc_id, blk_md5 FROM b WHERE doc_id % 2 = 1) n
JOIN (SELECT blk_md5, MIN(doc_id) AS dup_of
      FROM b WHERE doc_id % 2 = 0 GROUP BY 1) p USING (blk_md5)
GROUP BY n.doc_id
ORDER BY n.doc_id
"""


# ---------------------------------------------------------------------------
# Preference pairs, dedup-weighted budgets, weak-supervision labels
# ---------------------------------------------------------------------------

_ENC_SHIFT = np.int64(1) << 34   # order-preserving (ratio, doc) encoding

# planted re-crawl copy layer (shared by the dedup-weight and split
# tiers): docs with doc_id % 7 == 2 reappear under doc_id + 500001, so
# exact-dup groups of size > 1 exist at driver SFs and the +1 id shift
# makes the naive mod-10 split labels of a dup pair differ for 3 of 10
# residues — real structure for the leakage audit.
_RECRAWL_BASE = 500_001
_RECRAWL_MOD, _RECRAWL_AT = 7, 2


def dpo_pairs_by_source(sf_dir: str):
    """Preference-pair mining (DPO/RLHF data prep): per source, pair
    the highest-quality document (stopword-ratio proxy) as `chosen`
    against the lowest as `rejected`, with the score margin. Sources
    with a single document cannot form a pair and are dropped.

    Scale shape: argmax/argmin travel the exchange as ONE
    order-preserving int64 each — ``ratio * 2^34 + (2^34-1 - doc_id)``
    makes Max() pick the best ratio with ties to the SMALLEST doc, and
    ``ratio * 2^34 + doc_id`` makes Min() pick the worst ratio with the
    same tie rule — so the groupby ships three ints per (source, batch)
    and no row-level data. Decode happens on the source-sized result."""
    from ray.data.aggregate import Count as _Count, Max as _Max, \
        Min as _Min

    def enc(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) \
            else batch["text"]
        ratio = T.quality_scores(text)["stop_ratio_x1e6"] \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "source": batch["source"],
            "enc_max": ratio * _ENC_SHIFT + (_ENC_SHIFT - 1 - ids),
            "enc_min": ratio * _ENC_SHIFT + ids})

    agg = (_docs(sf_dir, columns=("doc_id", "source", "text"))
           .map_batches(enc, batch_format="pyarrow", batch_size=None)
           .groupby("source")
           .aggregate(_Max("enc_max", alias_name="enc_max"),
                      _Min("enc_min", alias_name="enc_min"),
                      _Count(alias_name="n"))
           .to_pandas())
    if agg.empty or "n" not in agg.columns:     # empty corpus
        return pd.DataFrame({
            "source": pd.Series(dtype="object"),
            "chosen_doc": pd.Series(dtype="int64"),
            "rejected_doc": pd.Series(dtype="int64"),
            "margin_x1e6": pd.Series(dtype="int64")})
    agg = agg[agg["n"] >= 2].sort_values("source")
    e_hi = agg["enc_max"].to_numpy().astype(np.int64)
    e_lo = agg["enc_min"].to_numpy().astype(np.int64)
    return pd.DataFrame({
        "source": agg["source"].to_numpy(),
        "chosen_doc": (_ENC_SHIFT - 1 - e_hi % _ENC_SHIFT)
        .astype("int64"),
        "rejected_doc": (e_lo % _ENC_SHIFT).astype("int64"),
        "margin_x1e6": (e_hi // _ENC_SHIFT - e_lo // _ENC_SHIFT)
        .astype("int64")}).reset_index(drop=True)


BT_ITERS = 50               # Bradley-Terry MM iterations (Hunter 2004)


def preference_bradley_terry(sf_dir: str):
    """Bradley-Terry preference-strength fitting over mined pairwise
    comparisons — the reward-model-style readout of the DPO tier:
    consecutive documents (pair_id = doc_id // 2) with DIFFERENT langs
    play one "game", won by the higher stopword-ratio quality proxy
    (exact ties void the game); per-lang strengths then come from
    Hunter (2004)'s MM iteration on the aggregated win matrix.

    Scale shape: one pair_id-keyed coarse exchange emits (winner,
    loser) rows, a (winner, loser)-keyed Sum reduces them to the
    langs x langs win matrix (items-bounded, tiny), and the MM loop
    runs on the driver over that matrix — iterations never touch the
    corpus. The win matrix is exact integers, so the fit is
    deterministic at any parallelism. Iterative -> rows-only; planted
    transitive-order recovery pins the values.
    Output: (lang, games, wins, strength_x1e6), strength desc."""
    from .relational import _coarse_partition_map, _table_empty

    cols = ("lang", "games", "wins", "strength_x1e6")
    empty = pd.DataFrame({
        "lang": pd.Series(dtype="object"),
        **{c: pd.Series(dtype="int64") for c in cols[1:]}})[list(cols)]
    if _table_empty(sf_dir, "documents"):
        return empty

    def prep(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) \
            else batch["text"]
        ratio = T.quality_scores(text)["stop_ratio_x1e6"] \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.Table.from_pydict({
            "pair_id": ids // 2, "doc_id": ids,
            "lang": batch["lang"], "r": ratio})

    games = _docs(sf_dir, columns=("doc_id", "lang", "text")) \
        .map_batches(prep, batch_format="pyarrow", batch_size=None)

    def play(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pair_id", "doc_id"])
        out_w, out_l = [], []
        first = g.groupby("pair_id").nth(0)
        second = g.groupby("pair_id").nth(1)
        m = first.merge(second, on="pair_id",
                        suffixes=("_a", "_b"))
        m = m[(m["lang_a"] != m["lang_b"]) & (m["r_a"] != m["r_b"])]
        win_a = m["r_a"] > m["r_b"]
        out_w = np.where(win_a, m["lang_a"], m["lang_b"])
        out_l = np.where(win_a, m["lang_b"], m["lang_a"])
        return pd.DataFrame({"winner": out_w, "loser": out_l,
                             "n": np.ones(len(m), dtype=np.int64)})

    wm = _coarse_partition_map(games, "pair_id", play) \
        .groupby(["winner", "loser"]) \
        .aggregate(Sum("n", alias_name="n")).to_pandas()
    if wm.empty or "winner" not in wm.columns:
        return empty

    items = sorted(set(wm["winner"]) | set(wm["loser"]))
    k = len(items)
    N = np.zeros((k, k), dtype=np.int64)      # games between i and j
    W = np.zeros(k, dtype=np.int64)           # wins of i
    for w_, l_, n_ in wm.itertuples(index=False):
        i, j = items.index(w_), items.index(l_)
        N[i, j] += n_
        N[j, i] += n_
        W[i] += n_
    s = np.full(k, 1.0 / k)
    for _ in range(BT_ITERS):
        denom = np.zeros(k)
        for i in range(k):
            mask = N[i] > 0
            denom[i] = (N[i, mask] / (s[i] + s[mask])).sum()
        s = np.where(denom > 0, W / np.maximum(denom, 1e-300), s)
        s = np.maximum(s, 1e-12)
        s /= s.sum()
    out = pd.DataFrame({
        "lang": items,
        "games": N.sum(axis=1).astype("int64"),
        "wins": W.astype("int64"),
        "strength_x1e6": np.floor(s * 1e6).astype("int64")})
    return out.sort_values(["strength_x1e6", "lang"],
                           ascending=[False, True]) \
        .reset_index(drop=True)[list(cols)]


DPO_PAIRS_SQL = rf"""
WITH q AS (
  SELECT doc_id, source,
         CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 0
              THEN (CAST(len(list_filter(
                       regexp_split_to_array(lower(trim(text)), '\s+'),
                       x -> x IN ({{EN}}))) AS BIGINT) * 1000000)
                   // len(regexp_split_to_array(trim(text), '\s+'))
              ELSE 0 END AS r
  FROM documents),
w AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY r DESC, doc_id) AS rn_hi,
            row_number() OVER (PARTITION BY source
                               ORDER BY r ASC, doc_id) AS rn_lo,
            count(*) OVER (PARTITION BY source) AS n
  FROM q)
SELECT hi.source, hi.doc_id AS chosen_doc, lo.doc_id AS rejected_doc,
       CAST(hi.r - lo.r AS BIGINT) AS margin_x1e6
FROM (SELECT * FROM w WHERE rn_hi = 1 AND n >= 2) hi
JOIN (SELECT * FROM w WHERE rn_lo = 1) lo USING (source)
ORDER BY hi.source
""".replace("{EN}", _EN)


def dedup_weighted_sampling(sf_dir: str):
    """Multi-epoch dedup budget: every document weighs 1/n_dups of its
    exact-dedup group (integer ``1e6 // n`` units, SQL-replayable), so
    a source's `effective_x1e6` is the deduplicated token-budget mass
    it really contributes — the number a mixture-weight solver consumes
    instead of raw doc counts.

    Scale shape: docs reduce to (md5, source, cnt) partials inside the
    scan; the md5-keyed coarse exchange computes each group's total and
    emits per-(source) weighted partials; a second source-keyed Sum
    (dimension-sized) finishes. Text never crosses either exchange.
    Operates on the UNION snapshot with planted re-crawl copies
    (``_group_split_partials``'s derivation) so groups of size > 1
    actually exist at driver SFs and the weights do real work."""
    from ray.data.aggregate import Sum as _Sum

    from .relational import _coarse_str_partition_map

    def keyed(batch: pa.Table) -> pa.Table:
        norm = T.normalize_for_dedup(
            batch["text"].combine_chunks()
            if isinstance(batch["text"], pa.ChunkedArray)
            else batch["text"])
        md5 = pa.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                        for s in norm.to_pylist()], type=pa.string())
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        again = np.flatnonzero(ids % _RECRAWL_MOD == _RECRAWL_AT)
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        df = pd.DataFrame({
            "h": pa.concat_arrays(
                [md5, md5.take(pa.array(again))]).to_pylist(),
            "source": pa.concat_arrays(
                [src, src.take(pa.array(again))]).to_pylist()})
        g = df.groupby(["h", "source"], as_index=False).size() \
            .rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g.astype({"cnt": "int64"}),
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("h")["cnt"].transform("sum")
        w = (g["cnt"] * (1_000_000 // tot)).astype("int64")
        out = pd.DataFrame({"source": g["source"], "n_docs": g["cnt"],
                            "effective_x1e6": w})
        return out.groupby("source", as_index=False).sum() \
            .astype({"n_docs": "int64", "effective_x1e6": "int64"})

    partials = _docs(sf_dir, columns=("doc_id", "source", "text")) \
        .map_batches(keyed, batch_format="pyarrow", batch_size=None)
    return (_coarse_str_partition_map(partials, "h", per_group)
            .groupby("source")
            .aggregate(_Sum("n_docs", alias_name="n_docs"),
                       _Sum("effective_x1e6",
                            alias_name="effective_x1e6"))
            .sort("source"))


DEDUP_WEIGHTED_SQL = f"""
WITH d AS (
  SELECT doc_id, source, md5(lower(trim(text))) AS h FROM documents
  UNION ALL
  SELECT doc_id + {_RECRAWL_BASE}, source, md5(lower(trim(text)))
  FROM documents WHERE doc_id % {_RECRAWL_MOD} = {_RECRAWL_AT}),
n AS (SELECT h, count(*) AS tot FROM d GROUP BY h)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(1000000 // tot) AS BIGINT) AS effective_x1e6
FROM d JOIN n USING (h) GROUP BY source ORDER BY source
"""


_WL_STOP_MIN = 150_000      # stopword ratio >= 0.15 (english prose)
_WL_PUNCT_MAX = 100_000     # punct ratio <= 0.10 (not symbol soup)
_WL_TLEN_LO = 3_000_000     # mean token length in [3, 9] chars
_WL_TLEN_HI = 9_000_000
_WL_MIN_TOKENS = 20         # enough signal to label at all


def quality_weak_labels(sf_dir: str):
    """Weak supervision for a quality classifier (the label-model step
    of an Snorkel-style pipeline): four independent heuristic voters
    (stopword ratio, punctuation ratio, mean token length, minimum
    length) each cast a binary vote; docs with >= 3 votes are labeled
    'high', <= 1 'low', otherwise 'abstain'. Output: per-label doc and
    token totals — the coverage/overlap sheet read before training the
    student model.

    One pass, batch-local voting, 3-row output; the exchange moves a
    3-int partial per batch."""
    from ray.data.aggregate import Sum as _Sum

    def vote(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) \
            else batch["text"]
        q = T.quality_scores(text)
        stop = q["stop_ratio_x1e6"].to_numpy(zero_copy_only=False)
        punct = q["punct_ratio_x1e6"].to_numpy(zero_copy_only=False)
        tlen = q["mean_token_len_x1e6"].to_numpy(zero_copy_only=False)
        ntok = q["n_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        votes = ((stop >= _WL_STOP_MIN).astype(np.int64)
                 + (punct <= _WL_PUNCT_MAX)
                 + ((tlen >= _WL_TLEN_LO) & (tlen <= _WL_TLEN_HI))
                 + (ntok >= _WL_MIN_TOKENS))
        lab = np.where(votes >= 3, 0, np.where(votes <= 1, 1, 2))
        return pa.Table.from_pydict({
            "label": pa.array(["high", "low", "abstain"]),
            "n_docs": np.bincount(lab, minlength=3).astype(np.int64),
            "n_tokens": np.bincount(lab, weights=ntok, minlength=3)
            .astype(np.int64)})

    agg = (_docs(sf_dir)
           .map_batches(vote, batch_format="pyarrow", batch_size=None)
           .groupby("label")
           .aggregate(_Sum("n_docs", alias_name="n_docs"),
                      _Sum("n_tokens", alias_name="n_tokens"))
           .to_pandas())
    out = pd.DataFrame({"label": ["abstain", "high", "low"]})
    for c in ("n_docs", "n_tokens"):
        m = dict(zip(agg.get("label", []), agg.get(c, [])))
        out[c] = out["label"].map(m).fillna(0).astype("int64")
    return out


WEAK_LABELS_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
              AS BIGINT) AS punct_cnt,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
  FROM documents),
q AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) > 0 THEN
           (CAST(len(list_filter(ltoks, x -> x IN ({{EN}})))
                 AS BIGINT) * 1000000) // len(toks) ELSE 0 END AS stop,
         CASE WHEN n_chars > 0
              THEN (punct_cnt * 1000000) // n_chars ELSE 0 END AS punct,
         CASE WHEN len(toks) > 0 THEN
           (CAST(list_aggregate(list_transform(toks, x -> length(x)),
                                'sum') AS BIGINT) * 1000000)
           // len(toks) ELSE 0 END AS tlen
  FROM t),
v AS (
  SELECT n_tokens,
         (CASE WHEN stop >= {_WL_STOP_MIN} THEN 1 ELSE 0 END
          + CASE WHEN punct <= {_WL_PUNCT_MAX} THEN 1 ELSE 0 END
          + CASE WHEN tlen BETWEEN {_WL_TLEN_LO} AND {_WL_TLEN_HI}
                 THEN 1 ELSE 0 END
          + CASE WHEN n_tokens >= {_WL_MIN_TOKENS} THEN 1 ELSE 0 END)
             AS votes
  FROM q),
lab AS (
  SELECT CASE WHEN votes >= 3 THEN 'high'
              WHEN votes <= 1 THEN 'low'
              ELSE 'abstain' END AS label, n_tokens
  FROM v),
names AS (SELECT unnest(['abstain', 'high', 'low']) AS label)
SELECT names.label,
       CAST(count(lab.label) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(lab.n_tokens), 0) AS BIGINT) AS n_tokens
FROM names LEFT JOIN lab USING (label)
GROUP BY names.label ORDER BY names.label
""".replace("{EN}", _EN)


_WRS_K = 50                      # sample size
_WRS_MIX = 2654435761            # Knuth multiplicative hash constant
_WRS_MOD = np.int64(1) << 32


def docs_weighted_sample_k(sf_dir: str):
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis priority form, integer-exact): every doc gets
    priority ``hash(doc_id) * 1e6 // weight`` (weight = token count;
    heavier docs draw smaller priorities more often) and the corpus-
    wide {_WRS_K} smallest (priority, doc_id) win — the one-pass
    distributed "pick k docs proportional-to-size" a mixture builder
    runs per source bucket. Integer priorities make the selection
    bit-exact for the oracle (a float -ln(u)/w key would be subject to
    libm last-ulp divergence between engines).

    Scale shape: per-batch partial top-k (sort inside the batch, keep
    {_WRS_K}) then one tiny global top-k — the same partial/final
    shape as every top-k in the engine; no full sort, no full
    exchange."""
    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) \
            else batch["text"]
        w = T.token_stats(text)["n_tokens"] \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(w, 1)
        h = (ids * _WRS_MIX) % _WRS_MOD
        pri = h * 1_000_000 // w
        order = np.lexsort((ids, pri))[:_WRS_K]
        return pa.Table.from_pydict({
            "doc_id": ids[order], "priority": pri[order],
            "weight": w[order]})

    ds = _docs(sf_dir).map_batches(partial, batch_format="pyarrow",
                                   batch_size=None)
    df = ds.sort(["priority", "doc_id"]).limit(_WRS_K).to_pandas()
    if df.empty or "doc_id" not in df.columns:      # empty corpus
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "priority": pd.Series(dtype="int64"),
                             "weight": pd.Series(dtype="int64")})
    return df.astype({"doc_id": "int64", "priority": "int64",
                      "weight": "int64"})


WEIGHTED_SAMPLE_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         greatest(len(regexp_split_to_array(trim(text), '\s+')), 1)
             AS w
  FROM documents),
p AS (
  SELECT doc_id, CAST(w AS BIGINT) AS weight,
         ((doc_id * {_WRS_MIX}) % {int(_WRS_MOD)}) * 1000000 // w
             AS priority
  FROM t)
SELECT doc_id, CAST(priority AS BIGINT) AS priority, weight
FROM p ORDER BY priority, doc_id LIMIT {_WRS_K}
"""


# ---------------------------------------------------------------------------
# Leakage-safe splits: assign DEDUP GROUPS, not documents, to splits
# ---------------------------------------------------------------------------

def _group_split_partials(sf_dir: str):
    """(rep, n_docs, n_naive) per exact-dedup group, through ONE
    md5-keyed coarse exchange: rep = min doc_id, n_naive = distinct
    naive doc-level split labels inside the group (how many splits the
    group would straddle under ``doc_id % 10`` assignment).

    The corpus rows are unique at driver SFs, so the split tier
    operates on the UNION snapshot: docs with ``doc_id %
    {_RECRAWL_MOD} == {_RECRAWL_AT}`` were re-crawled under
    ``doc_id + {_RECRAWL_BASE}`` (same text -> same group). The +1 id
    shift guarantees real straddles under the naive rule (a dup pair
    lands in different splits whenever its ids' mod-10 labels differ),
    giving the audit genuine structure — and the derivation stays
    map-side and SQL-replayable."""
    from .relational import _coarse_str_partition_map

    def keyed(batch: pa.Table) -> pa.Table:
        norm = T.normalize_for_dedup(
            batch["text"].combine_chunks()
            if isinstance(batch["text"], pa.ChunkedArray)
            else batch["text"])
        md5 = pa.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                        for s in norm.to_pylist()], type=pa.string())
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        again = np.flatnonzero(ids % _RECRAWL_MOD == _RECRAWL_AT)
        return pa.Table.from_pydict({
            "h": pa.concat_arrays(
                [md5, md5.take(pa.array(again))]),
            "doc_id": np.concatenate(
                [ids, ids[again] + _RECRAWL_BASE])})

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        d = g["doc_id"].astype("int64")
        naive = np.where(d % 10 <= 7, 0, np.where(d % 10 == 8, 1, 2))
        out = g.assign(naive=naive).groupby("h").agg(
            rep=("doc_id", "min"), n_docs=("doc_id", "size"),
            n_naive=("naive", "nunique")).reset_index(drop=True)
        return out.astype({"rep": "int64", "n_docs": "int64",
                           "n_naive": "int64"})

    docs = _docs(sf_dir).map_batches(keyed, batch_format="pyarrow",
                                     batch_size=None)
    return _coarse_str_partition_map(docs, "h", per_group)


def split_leakage_safe(sf_dir: str):
    """Leakage-safe train/val/test split: every exact-dedup GROUP is
    assigned whole to one split by its representative id (rep % 10:
    0-7 train, 8 val, 9 test), so no near-identical text can sit on
    both sides of an eval boundary. Output per split: document and
    group counts — the manifest a training run consumes.

    Scale shape: one md5-keyed exchange reduces docs to per-group
    (rep, n_docs) rows; the split rollup is a 3-row aggregate. Text
    never ships past the key stage."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    def assign(batch: pa.Table) -> pa.Table:
        rep = batch["rep"].to_numpy(zero_copy_only=False)
        m = rep % 10
        split = np.where(m <= 7, "train",
                         np.where(m == 8, "val", "test"))
        return pa.Table.from_pydict(
            {"split": pa.array(split, pa.string()),
             "n_docs": batch["n_docs"]})

    agg = (_group_split_partials(sf_dir)
           .map_batches(assign, batch_format="pyarrow", batch_size=None)
           .groupby("split")
           .aggregate(_Sum("n_docs", alias_name="n_docs"),
                      _Count(alias_name="n_groups"))
           .to_pandas())
    out = pd.DataFrame({"split": ["test", "train", "val"]})
    for c in ("n_docs", "n_groups"):
        m = dict(zip(agg.get("split", []), agg.get(c, [])))
        out[c] = out["split"].map(m).fillna(0).astype("int64")
    return out


SPLIT_LEAKAGE_SAFE_SQL = f"""
WITH d AS (
  SELECT doc_id, md5(lower(trim(text))) AS h FROM documents
  UNION ALL
  SELECT doc_id + {_RECRAWL_BASE}, md5(lower(trim(text)))
  FROM documents WHERE doc_id % {_RECRAWL_MOD} = {_RECRAWL_AT}),
g AS (SELECT h, MIN(doc_id) AS rep, CAST(count(*) AS BIGINT) AS n_docs
      FROM d GROUP BY h),
s AS (SELECT CASE WHEN rep % 10 <= 7 THEN 'train'
                  WHEN rep % 10 = 8 THEN 'val'
                  ELSE 'test' END AS split, n_docs FROM g),
names AS (SELECT unnest(['test', 'train', 'val']) AS split)
SELECT names.split,
       CAST(coalesce(sum(s.n_docs), 0) AS BIGINT) AS n_docs,
       CAST(count(s.split) AS BIGINT) AS n_groups
FROM names LEFT JOIN s USING (split)
GROUP BY names.split ORDER BY names.split
"""


def split_naive_leakage(sf_dir: str):
    """The leakage audit justifying group-level splitting: under the
    naive doc-level split (``doc_id % 10``), how many exact-dup groups
    would straddle two or more splits — i.e. have a copy of the same
    text in train AND eval. One row: (n_groups, n_straddled,
    n_docs_straddled). Same single-exchange shape as
    ``split_leakage_safe``."""
    from ray.data.aggregate import Sum as _Sum

    def partial(batch: pa.Table) -> pa.Table:
        n_naive = batch["n_naive"].to_numpy(zero_copy_only=False)
        n_docs = batch["n_docs"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bad = n_naive > 1
        return pa.Table.from_pydict({
            "n_groups": pa.array([len(n_naive)], pa.int64()),
            "n_straddled": pa.array([int(bad.sum())], pa.int64()),
            "n_docs_straddled": pa.array([int(n_docs[bad].sum())],
                                         pa.int64())})

    agg = (_group_split_partials(sf_dir)
           .map_batches(partial, batch_format="pyarrow",
                        batch_size=None)
           .aggregate(_Sum("n_groups", alias_name="n_groups"),
                      _Sum("n_straddled", alias_name="n_straddled"),
                      _Sum("n_docs_straddled",
                           alias_name="n_docs_straddled")))
    return pd.DataFrame([{k: np.int64(agg.get(k, 0) or 0)
                          for k in ("n_groups", "n_straddled",
                                    "n_docs_straddled")}])


SPLIT_NAIVE_LEAKAGE_SQL = f"""
WITH d AS (
  SELECT doc_id, md5(lower(trim(text))) AS h FROM documents
  UNION ALL
  SELECT doc_id + {_RECRAWL_BASE}, md5(lower(trim(text)))
  FROM documents WHERE doc_id % {_RECRAWL_MOD} = {_RECRAWL_AT}),
g AS (
  SELECT h, CAST(count(*) AS BIGINT) AS n_docs,
         count(DISTINCT CASE WHEN doc_id % 10 <= 7 THEN 'train'
                             WHEN doc_id % 10 = 8 THEN 'val'
                             ELSE 'test' END) AS n_naive
  FROM d GROUP BY h)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (n_naive > 1) AS BIGINT) AS n_straddled,
       CAST(coalesce(sum(n_docs) FILTER (n_naive > 1), 0) AS BIGINT)
           AS n_docs_straddled
FROM g
"""


# ---------------------------------------------------------------------------
# Snapshot diff (CDC): added / removed / changed between two crawls
# ---------------------------------------------------------------------------

_DIFF_NEW_BASE = 1_000_000       # id offset of docs "added" in snapshot B


def corpus_snapshot_diff(sf_dir: str):
    """Change-data-capture between two corpus snapshots — the
    month-over-month reconciliation a crawl pipeline runs before
    reprocessing only what moved. Snapshot A is the corpus as stored;
    snapshot B is the deterministic next crawl: docs with
    ``doc_id % 10 == 3`` vanished, docs with ``% 10 == 7`` changed
    (text gained a revision suffix), docs with ``% 10 == 1`` also
    appear duplicated under a new id (+{_DIFF_NEW_BASE}). Output: every
    doc whose status is not 'unchanged', as (doc_id, status in
    {{added, removed, changed}}).

    Scale shape: each side reduces to (doc_id, content-md5) inside its
    scan — text never crosses the exchange; the two sides meet in ONE
    int-keyed groupby and classification is a per-group 3-way flag. At
    real scale side A is the stored manifest of the prior run (read,
    not recomputed), which is exactly the (doc_id, md5) shape shipped
    here."""
    from ray.data.aggregate import Max as _Max, Min as _Min

    def sides(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) \
            else batch["text"]
        raw = pc.fill_null(text, "").to_pylist()
        h_a = np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                            "big", signed=False) >> 1 for s in raw),
            dtype=np.int64, count=len(raw))
        out_id = [ids]
        out_h = [h_a]
        out_side = [np.zeros(len(ids), np.int64)]         # side A
        keep = ids % 10 != 3
        changed = ids % 10 == 7
        h_b = np.where(
            changed,
            np.fromiter(
                (int.from_bytes(
                    hashlib.md5((s + " v2").encode()).digest()[:8],
                    "big", signed=False) >> 1 for s in raw),
                dtype=np.int64, count=len(raw)),
            h_a)
        out_id.append(ids[keep])
        out_h.append(h_b[keep])
        out_side.append(np.ones(int(keep.sum()), np.int64))
        new = ids % 10 == 1
        out_id.append(ids[new] + _DIFF_NEW_BASE)
        out_h.append(h_a[new])
        out_side.append(np.ones(int(new.sum()), np.int64))
        return pa.Table.from_pydict({
            "doc_id": np.concatenate(out_id),
            "h": np.concatenate(out_h),
            "side": np.concatenate(out_side)})

    # per-doc: which sides exist and whether the two hashes differ.
    # side in {0, 1} and each side emits one row per doc, so MIN/MAX of
    # side give presence and MIN/MAX of h give equality — one exchange,
    # no group UDF.
    agg = (_docs(sf_dir)
           .map_batches(sides, batch_format="pyarrow", batch_size=None)
           .groupby("doc_id")
           .aggregate(_Min("side", alias_name="s_min"),
                      _Max("side", alias_name="s_max"),
                      _Min("h", alias_name="h_min"),
                      _Max("h", alias_name="h_max")))

    def classify(batch: pa.Table) -> pa.Table:
        s_min = batch["s_min"].to_numpy(zero_copy_only=False)
        s_max = batch["s_max"].to_numpy(zero_copy_only=False)
        h_min = batch["h_min"].to_numpy(zero_copy_only=False)
        h_max = batch["h_max"].to_numpy(zero_copy_only=False)
        status = np.where(
            s_min == 1, "added",
            np.where(s_max == 0, "removed",
                     np.where(h_min != h_max, "changed", "unchanged")))
        keep = status != "unchanged"
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"].filter(pa.array(keep)),
             "status": pa.array(status[keep], pa.string())})

    return agg.map_batches(classify, batch_format="pyarrow",
                           batch_size=None).sort("doc_id")


SNAPSHOT_DIFF_SQL = f"""
WITH a AS (
  SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents),
b AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 10 = 7
                  THEN coalesce(text, '') || ' v2'
                  ELSE coalesce(text, '') END) AS h
  FROM documents WHERE doc_id % 10 <> 3
  UNION ALL
  SELECT doc_id + {_DIFF_NEW_BASE}, md5(coalesce(text, ''))
  FROM documents WHERE doc_id % 10 = 1)
SELECT CAST(coalesce(a.doc_id, b.doc_id) AS BIGINT) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.h <> b.h
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Chunker (flat_map: 1 doc -> N chunks) — not SQL-expressible
# ---------------------------------------------------------------------------

def doc_chunks(sf_dir: str):
    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, chunk_ids, sizes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for ci, ch in enumerate(chunk_text(text or "")):
                doc_ids.append(doc_id)
                chunk_ids.append(ci)
                sizes.append(len(ch))
        return pa.Table.from_arrays(
            [pa.array(doc_ids, type=pa.int64()),
             pa.array(chunk_ids, type=pa.int64()),
             pa.array(sizes, type=pa.int64())],
            names=["doc_id", "chunk_id", "chunk_size"])
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None)


def doc_cdc_chunks(sf_dir: str):
    """Content-defined chunking (gear rolling hash, min/max clamped):
    boundaries key on CONTENT, so edits perturb only nearby chunks and
    chunk-level exact dedup collapses the shared remainder across
    near-identical documents — the dedup-friendly complement to the
    fixed recursive chunker. Emits (doc_id, chunk_id, chunk_size,
    chunk_md5); the md5 is what a downstream chunk-dedup groups on.
    Not SQL-expressible (rolling hash); the shift-invariance property
    and exact reassembly are unit-tested."""
    from ..functions.cdc import cdc_chunks

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, chunk_ids, sizes, md5s = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for ci, ch in enumerate(cdc_chunks(text or "")):
                doc_ids.append(doc_id)
                chunk_ids.append(ci)
                sizes.append(len(ch))
                md5s.append(hashlib.md5(ch.encode()).hexdigest())
        return pa.Table.from_arrays(
            [pa.array(doc_ids, type=pa.int64()),
             pa.array(chunk_ids, type=pa.int64()),
             pa.array(sizes, type=pa.int64()),
             pa.array(md5s, type=pa.string())],
            names=["doc_id", "chunk_id", "chunk_size", "chunk_md5"])
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# Rolling-hash fingerprint — not SQL-expressible
# ---------------------------------------------------------------------------

def doc_fingerprint(sf_dir: str):
    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        fp = rolling_fingerprint(text).view(np.int64)   # reinterpret for arrow
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(fp, type=pa.int64())],
            names=["doc_id", "fingerprint"])
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None)


# The oracle replays the winnowing hash (min over 8-char-window
# polynomial hashes, base 257, mod 2^64) with HUGEINT arithmetic.
# ord(char) == utf-8 byte only for ASCII — which the testdata is; the
# Ray kernel itself is byte-exact for any input.
FINGERPRINT_SQL = r"""
WITH t AS (
  SELECT doc_id, text, length(text) AS n FROM documents),
ch AS (
  SELECT doc_id, n, list_transform(split(text, ''), x -> ord(x)) AS cs
  FROM t),
win0 AS (
  SELECT doc_id, cs, unnest(range(1, CAST(GREATEST(n - 6, 1) AS BIGINT))) AS i
  FROM ch WHERE n >= 8),
win AS (
  SELECT doc_id,
         MIN(CAST((
             CAST(cs[i]   AS HUGEINT) * 74051159531521793 +
             CAST(cs[i+1] AS HUGEINT) * 288136807515649 +
             CAST(cs[i+2] AS HUGEINT) * 1121154893057 +
             CAST(cs[i+3] AS HUGEINT) * 4362470401 +
             CAST(cs[i+4] AS HUGEINT) * 16974593 +
             CAST(cs[i+5] AS HUGEINT) * 66049 +
             CAST(cs[i+6] AS HUGEINT) * 257 +
             CAST(cs[i+7] AS HUGEINT)
           ) % 18446744073709551616 AS UHUGEINT)) AS h
  FROM win0
  GROUP BY doc_id),
short AS (
  -- reduce in HUGEINT: ord() is INT32 and a 5-7 char doc overflows a
  -- 32-bit polynomial accumulation (latent until a sub-8-char doc
  -- appears; the sf corpus has none)
  SELECT doc_id,
         CASE WHEN n = 0 THEN 0
              ELSE CAST(list_reduce(
                       list_transform(cs, x -> CAST(x AS HUGEINT)),
                       (a, b) -> a * 257 + b) AS UHUGEINT)
         END AS h
  FROM ch WHERE n < 8),
u AS (SELECT * FROM win UNION ALL SELECT * FROM short)
SELECT doc_id,
       CAST(CASE WHEN h >= 9223372036854775808 THEN h - 18446744073709551616
                 ELSE h END AS BIGINT) AS fingerprint
FROM u ORDER BY doc_id
"""


QUALITY_MIN_TOKENS = 20
QUALITY_MAX_PUNCT_X1E6 = 60_000       # <= 6% punctuation
QUALITY_MIN_MTL_X1E6 = 3_000_000      # mean token length >= 3


def doc_quality_filter(sf_dir: str):
    """Training-data quality gate: keep docs passing the documented
    thresholds (the trafilatura-style pipeline endpoint for the quality
    scores). Integer thresholds so the oracle is bit-exact."""
    import pyarrow.compute as pc

    def gate(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(batch["n_tokens"],
                                     pa.scalar(QUALITY_MIN_TOKENS)),
                    pc.less_equal(batch["punct_ratio_x1e6"],
                                  pa.scalar(QUALITY_MAX_PUNCT_X1E6))),
            pc.greater_equal(batch["mean_token_len_x1e6"],
                             pa.scalar(QUALITY_MIN_MTL_X1E6)))
        return batch.filter(keep).select(["doc_id", "n_tokens",
                                          "punct_ratio_x1e6",
                                          "mean_token_len_x1e6"])

    return doc_quality(sf_dir).map_batches(gate, batch_format="pyarrow", batch_size=None)


QUALITY_FILTER_SQL = rf"""
WITH q AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
         CASE WHEN length(text) > 0 THEN
           (CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) * 1000000)
             // length(text) ELSE 0 END AS punct_ratio_x1e6,
         CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 0 THEN
           (CAST(list_aggregate(list_transform(regexp_split_to_array(trim(text), '\s+'),
                                               x -> length(x)), 'sum') AS BIGINT) * 1000000)
             // len(regexp_split_to_array(trim(text), '\s+'))
         ELSE 0 END AS mean_token_len_x1e6
  FROM documents)
SELECT doc_id, n_tokens, punct_ratio_x1e6, mean_token_len_x1e6
FROM q
WHERE n_tokens >= {QUALITY_MIN_TOKENS}
  AND punct_ratio_x1e6 <= {QUALITY_MAX_PUNCT_X1E6}
  AND mean_token_len_x1e6 >= {QUALITY_MIN_MTL_X1E6}
"""


def langid_accuracy(sf_dir: str):
    """Evaluation harness analog (A6/CMP): predicted language vs the
    table's lang label, per label. Labels are COLUMNS of the same rows
    being scored, so prediction and truth meet batch-locally — no
    broadcast, no join (the round-1 form shipped a whole-corpus label
    dict through the object store)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def score(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        pred = T.langid(text).to_numpy(zero_copy_only=False)
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"lang": lang,
                           "hit": (pred == lang).astype("int64")})
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("hit", "size"), n_correct=("hit", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    from ray.data.aggregate import Sum
    return (ds.map_batches(score, batch_format="pyarrow", batch_size=None)
            .groupby("lang")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_correct", alias_name="n_correct"))
            .sort("lang"))


# ---------------------------------------------------------------------------
# Regex extraction counts (RE2 in BOTH engines -> exact count parity)
# ---------------------------------------------------------------------------

# ASCII-explicit pattern STRINGS shared verbatim with the SQL (same rule
# as the BPE pattern above: RE2 via Arrow count_substring_regex and
# DuckDB regexp_extract_all; no \s/\d shorthand anywhere)
PATTERN_OPS = "(scan|sort|merge|join)"
PATTERN_VOWEL_PAIR = "[aeiou][aeiou]"
PATTERN_WINDOW = "window"


def doc_pattern_counts(sf_dir: str):
    """Per-doc non-overlapping match counts for three extraction
    patterns — the regex-mining stage of a text pipeline, vectorized
    with Arrow's RE2 kernel."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        text = pc.fill_null(text, "")
        return pa.Table.from_arrays(
            [batch["doc_id"],
             pc.cast(pc.count_substring_regex(text, PATTERN_OPS),
                     pa.int64()),
             pc.cast(pc.count_substring_regex(text, PATTERN_VOWEL_PAIR),
                     pa.int64()),
             pc.cast(pc.count_substring_regex(text, PATTERN_WINDOW),
                     pa.int64())],
            names=["doc_id", "n_ops", "n_vowel_pairs", "n_window"])

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None)


PATTERN_COUNTS_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '{PATTERN_OPS}'))
            AS BIGINT) AS n_ops,
       CAST(len(regexp_extract_all(COALESCE(text, ''),
                                   '{PATTERN_VOWEL_PAIR}'))
            AS BIGINT) AS n_vowel_pairs,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '{PATTERN_WINDOW}'))
            AS BIGINT) AS n_window
FROM documents
"""


# ---------------------------------------------------------------------------
# PII-style masking (redaction rewrite, C4/Dolma-style scrub stage)
# ---------------------------------------------------------------------------

# Ordered rule list: (RE2 pattern, replacement token), applied
# sequentially. Email/URL are the real-world PII rules (the synthetic
# corpus contains none, so they are exercised by the planted-PII unit
# test); the entity-word rule fires on the corpus itself so the query
# path does real rewrites at every sf. Both engines run RE2
# (Arrow ``replace_substring_regex`` / DuckDB ``regexp_replace`` with
# 'g'), and both count non-overlapping matches, so text and counts
# match bit-exactly.
MASK_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "[EMAIL]"),
    (r"https?://[^ \t\n]+", "[URL]"),
    (r"\bcustomer\b", "[ENTITY]"),
)


def doc_pii_masked(sf_dir: str):
    """Redaction transform: apply the ordered ``MASK_RULES`` rewrites to
    every document (vectorized RE2 per batch — no Python row loop) and
    return the masked text plus the per-doc total replacement count.
    The scrub stage every large-scale training-data pipeline runs before
    tokenization; reference analog: the keyword-normalization pass of
    the content validator (`advanced_layout_extractor.py` keyword
    lists), generalized to a configurable rewrite list."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        masked = pc.fill_null(text, "")
        total = np.zeros(len(batch), dtype=np.int64)
        for pat, rep in MASK_RULES:
            total += pc.count_substring_regex(masked, pat) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            masked = pc.replace_substring_regex(masked, pat, rep)
        return pa.Table.from_arrays(
            [batch["doc_id"], masked, pa.array(total)],
            names=["doc_id", "masked", "n_masked"])

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None)


def _mask_sql() -> str:
    """Generate the sequential-rewrite oracle (one CTE per rule, counting
    before replacing, exactly mirroring the batch function's order)."""
    parts = ["WITH s0 AS (SELECT doc_id, COALESCE(text, '') AS t, "
             "CAST(0 AS BIGINT) AS c FROM documents)"]
    prev = "s0"
    for i, (pat, rep) in enumerate(MASK_RULES, 1):
        parts.append(
            f", s{i} AS (SELECT doc_id, "
            f"regexp_replace(t, $${pat}$$, '{rep}', 'g') AS t, "
            f"c + len(regexp_extract_all(t, $${pat}$$)) AS c FROM {prev})")
        prev = f"s{i}"
    parts.append(f"SELECT doc_id, t AS masked, CAST(c AS BIGINT) AS n_masked "
                 f"FROM {prev}")
    return "\n".join(parts)


PII_MASK_SQL = _mask_sql()


# ---------------------------------------------------------------------------
# Model-scored quality gate (actor-pool model inference pattern)
# ---------------------------------------------------------------------------

MODEL_SCORE_THRESHOLD = 4_600_000     # ~median of the synthetic corpus
                                      # so the gate visibly splits it


class QualityModel:
    """Deterministic linear stand-in for a fastText-style quality
    classifier: 'weights' load ONCE per actor in ``__init__`` (the place
    a real model file/deserialization goes), scoring is vectorized per
    batch in ``__call__``. Integer weights over the integer-scaled
    quality features keep the result oracle-exact."""

    WEIGHTS = {"stop_ratio_x1e6": 2, "mean_token_len_x1e6": 1,
               "punct_ratio_x1e6": -3}

    def __init__(self):
        # deterministic "model load" — constants here, a checkpoint
        # read in production; per-actor, never per-batch
        self.w = dict(self.WEIGHTS)
        self.threshold = MODEL_SCORE_THRESHOLD

    def __call__(self, batch: pa.Table) -> pa.Table:
        score = np.zeros(len(batch), dtype=np.int64)
        for col, w in self.w.items():
            score += w * batch[col].to_numpy(zero_copy_only=False)
        kept = (score >= self.threshold).astype(np.int64)
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(score), pa.array(kept)],
            names=["doc_id", "model_score", "kept"])


def doc_model_scores(sf_dir: str):
    """Quality-classifier scoring as an ACTOR-POOL stage over the quality
    features — the batched model-inference shape (T6/M13 analog with a
    linear stand-in)."""
    return doc_quality(sf_dir).map_batches(
        QualityModel, batch_format="pyarrow", batch_size=2048,
        concurrency=2, num_cpus=1).sort("doc_id")


MODEL_SCORES_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) AS punct_cnt,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
  FROM documents),
q AS (
  SELECT doc_id,
       CASE WHEN n_chars > 0 THEN (punct_cnt * 1000000) // n_chars ELSE 0 END AS punct_ratio_x1e6,
       CASE WHEN len(toks) > 0 THEN
         (CAST(len(list_filter(ltoks, x -> x IN ({_EN}))) AS BIGINT) * 1000000) // len(toks)
       ELSE 0 END AS stop_ratio_x1e6,
       CASE WHEN len(toks) > 0 THEN
         (CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) * 1000000) // len(toks)
       ELSE 0 END AS mean_token_len_x1e6
  FROM t)
SELECT doc_id,
       2 * stop_ratio_x1e6 + mean_token_len_x1e6 - 3 * punct_ratio_x1e6
           AS model_score,
       CAST(CASE WHEN 2 * stop_ratio_x1e6 + mean_token_len_x1e6
                      - 3 * punct_ratio_x1e6 >= {MODEL_SCORE_THRESHOLD}
                 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM q
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Trained trigram-LM perplexity scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------

LM_VOCAB_K = 65_536


def _lm_train(sf_dir: str):
    """Shared TRAIN pass of the corpus byte-trigram LM (see
    ``doc_trigram_lm``): per-batch count partials -> one bounded
    groupby-sum -> top-K capped vocabulary, shipped once via
    ``ray.put``. Returns the object ref of (vocab, counts, total,
    v_size)."""
    from ..functions import lm as L

    def count_partial(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        codes, _ = L.trigram_codes(text)
        u, c = L.count_trigrams(codes)
        return pa.Table.from_pydict({"code": u, "cnt": c.astype(np.int64)})

    from ray.data.aggregate import Sum
    vocab_df = _docs(sf_dir) \
        .map_batches(count_partial, batch_format="pyarrow", batch_size=None) \
        .groupby("code").aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()
    if vocab_df.empty or "code" not in vocab_df.columns:
        vocab = np.zeros(0, dtype=np.int64)
        counts = np.zeros(0, dtype=np.int64)
    else:
        vocab, counts = L.top_k_vocab(
            vocab_df["code"].to_numpy(np.int64),
            vocab_df["cnt"].to_numpy(np.int64), LM_VOCAB_K)
    total = int(counts.sum())
    v_size = len(vocab) + 1
    import ray as _ray
    return _ray.put((vocab, counts, total, v_size))


def doc_trigram_lm(sf_dir: str):
    """Two-stage trained-model scoring, the CCNet/KenLM quality-filter
    shape: (1) TRAIN — per-batch byte-trigram count partials (numpy
    unique over one shared buffer, no per-row Python) flow through one
    groupby-sum whose key space is bounded by the charset (<=2^24,
    practically ~50k), top-K capped so the broadcast model has a fixed
    ceiling regardless of corpus size; (2) SCORE — the model ships once
    via ``ray.put`` and every batch computes per-doc mean -log2 p by
    vectorized lookup + one grouped sum. Returns
    (doc_id, n_trigrams, nll_x1e3); higher nll = less like the corpus.
    Not SQL-expressible (trained model) — verified by a pure-python
    differential test and planted-gibberish ordering tests."""
    import ray as _ray

    from ..functions import lm as L

    import pyarrow.dataset as pads
    if pads.dataset(f"{sf_dir}/documents.parquet").count_rows() == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_trigrams": pd.Series(dtype="int64"),
                             "nll_x1e3": pd.Series(dtype="int64")})

    model_ref = _lm_train(sf_dir)

    def score(batch: pa.Table) -> pa.Table:
        vo, co, tot, vs = _ray.get(model_ref)
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        codes, doc_idx = L.trigram_codes(text)
        sums, ns = L.nll_partials(codes, doc_idx, len(batch),
                                  vo, co, tot, vs)
        mean = np.divide(sums, ns, out=np.zeros(len(ns)),
                         where=ns > 0)
        from ..functions.arrow_utils import round_half_away
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "n_trigrams": ns,
            "nll_x1e3": round_half_away(mean * 1000.0)})

    return _docs(sf_dir).map_batches(score, batch_format="pyarrow", batch_size=None)


def corpus_tokenizer_fertility(sf_dir: str):
    """Per-language tokenizer fertility — BPE-ish tokens per whitespace
    word (x1e6, integer floor), the standard metric for how much a
    tokenizer over-fragments each language. One partial-aggregated
    exchange over the language key; the fertility ratio is computed
    from the summed integer partials, never per doc, so both engines
    agree bit-exactly. Output: (lang, n_docs, n_words, n_bpe_tokens,
    fertility_x1e6)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        stats = T.token_stats(text)
        df = pd.DataFrame({
            "lang": batch["lang"].to_numpy(zero_copy_only=False),
            "n_docs": np.ones(len(batch), dtype=np.int64),
            "n_words": stats["n_tokens"].to_numpy(zero_copy_only=False),
            "n_bpe_tokens": stats["n_tokens_bpe"]
            .to_numpy(zero_copy_only=False)})
        return pa.Table.from_pandas(
            df.groupby("lang", as_index=False).sum(),
            preserve_index=False).replace_schema_metadata(None)

    out = (_docs(sf_dir, columns=["doc_id", "text", "lang"])
           .map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby("lang")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_words", alias_name="n_words"),
                      Sum("n_bpe_tokens", alias_name="n_bpe_tokens"))
           .to_pandas())
    if out.empty or "lang" not in out.columns:
        return pd.DataFrame({
            "lang": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "n_words": pd.Series(dtype="int64"),
            "n_bpe_tokens": pd.Series(dtype="int64"),
            "fertility_x1e6": pd.Series(dtype="int64")})
    out = out.astype({"n_docs": "int64", "n_words": "int64",
                      "n_bpe_tokens": "int64"})
    out["fertility_x1e6"] = (out["n_bpe_tokens"] * 1_000_000) \
        // out["n_words"]
    return out.sort_values("lang").reset_index(drop=True)


FERTILITY_SQL = ("WITH t AS (" + TOKEN_STATS_SQL + """)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t.n_tokens) AS BIGINT) AS n_words,
       CAST(sum(t.n_tokens_bpe) AS BIGINT) AS n_bpe_tokens,
       CAST((sum(t.n_tokens_bpe) * 1000000) // sum(t.n_tokens)
            AS BIGINT) AS fertility_x1e6
FROM t JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
""")


def corpus_ccnet_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document against the corpus byte-trigram LM, split each
    LANGUAGE's score distribution at its discrete terciles, and report
    per (lang, bucket) document/token counts — ``head`` is the
    most-corpus-like third, ``tail`` the least. This is the exact
    composition CCNet runs to stage Common Crawl for LM training.

    Scale shape: one shared TRAIN pass (``_lm_train``), then ONE
    scoring scan whose batches emit (lang, nll_x1e3) histogram
    partials — terciles AND the bucket rollup are both computed from
    that one histogram, so no per-document row ever reaches the driver
    and the corpus is never rescanned per threshold. The histogram is
    bounded by distinct (lang, millibit-score) pairs, the same
    value-histogram trade the exact-percentile ops document.

    Not SQL-expressible (trained model) — verified by a pure-python
    end-to-end differential in tests/test_ccnet_buckets.py.
    Output: (lang, bucket, n_docs, n_tokens)."""
    import ray as _ray

    from ..functions import lm as L
    from ..functions.arrow_utils import round_half_away

    empty = pd.DataFrame({"lang": pd.Series(dtype="object"),
                          "bucket": pd.Series(dtype="object"),
                          "n_docs": pd.Series(dtype="int64"),
                          "n_tokens": pd.Series(dtype="int64")})
    import pyarrow.dataset as pads
    if pads.dataset(f"{sf_dir}/documents.parquet").count_rows() == 0:
        return empty

    model_ref = _lm_train(sf_dir)

    def hist_partial(batch: pa.Table) -> pa.Table:
        vo, co, tot, vs = _ray.get(model_ref)
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        codes, doc_idx = L.trigram_codes(text)
        sums, ns = L.nll_partials(codes, doc_idx, len(batch),
                                  vo, co, tot, vs)
        mean = np.divide(sums, ns, out=np.zeros(len(ns)), where=ns > 0)
        nll = round_half_away(mean * 1000.0)
        lang = T.langid(text).to_numpy(zero_copy_only=False)
        n_tok = T.token_stats(text)["n_tokens"] \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"lang": lang, "nll_x1e3": nll,
                           "n_docs": np.ones(len(batch), dtype=np.int64),
                           "n_tokens": n_tok})
        return pa.Table.from_pandas(
            df.groupby(["lang", "nll_x1e3"], as_index=False).sum(),
            preserve_index=False).replace_schema_metadata(None)

    from ray.data.aggregate import Sum
    hist = (_docs(sf_dir)
            .map_batches(hist_partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby(["lang", "nll_x1e3"])
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens"))
            .to_pandas())
    if hist.empty:
        return empty

    rows = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("nll_x1e3").reset_index(drop=True)
        cum = g["n_docs"].cumsum().to_numpy()
        n = int(cum[-1])
        # discrete quantile: smallest value with cum >= ceil(q * n)
        t1 = g["nll_x1e3"].to_numpy()[
            np.searchsorted(cum, -(-n // 3))]          # ceil(n/3)
        t2 = g["nll_x1e3"].to_numpy()[
            np.searchsorted(cum, -(-2 * n // 3))]      # ceil(2n/3)
        v = g["nll_x1e3"].to_numpy()
        bucket = np.where(v <= t1, "head",
                          np.where(v <= t2, "middle", "tail"))
        bg = g.assign(bucket=bucket).groupby("bucket", as_index=False) \
            .agg(n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum"))
        bg.insert(0, "lang", lang)
        rows.append(bg)
    out = pd.concat(rows, ignore_index=True)
    return out.astype({"n_docs": "int64", "n_tokens": "int64"}) \
        .sort_values(["lang", "bucket"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Distributed global rank (ORDER BY + ROW_NUMBER at scale)
# ---------------------------------------------------------------------------

RANK_BUCKETS = 64
_RANK_SCALE = 1_000_000          # stop_ratio_x1e6 lives in [0, 1e6]


def doc_quality_rank(sf_dir: str):
    """Global ROW_NUMBER() over ORDER BY (stop_ratio DESC, doc_id) —
    the distributed-sort operator a curriculum-ordering pipeline needs.
    No single node ever sees the whole corpus in order: the score key
    has a FIXED range ([0, 1e6] integer), so rows range-partition into
    64 equal-width buckets with no sampling pass; one tiny groupby
    counts each bucket, the driver turns counts into descending-order
    rank offsets (<=64 ints, broadcast by closure), and each bucket
    sorts locally and adds its offset. Ties break on doc_id, so the
    result is deterministic and bit-exact against the SQL window.

    The scored projection (doc_id, score, bucket — 24 bytes/row) is
    materialized once so the count pass and the rank pass don't both
    re-read the text column; the text itself never crosses an exchange.
    """
    import pyarrow.dataset as pads
    if pads.dataset(f"{sf_dir}/documents.parquet").count_rows() == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="int64")})

    def score_fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        q = T.quality_scores(text)
        s = q["stop_ratio_x1e6"].to_numpy(zero_copy_only=False)
        bucket = np.minimum(s * RANK_BUCKETS // (_RANK_SCALE + 1),
                            RANK_BUCKETS - 1).astype(np.int64)
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "score": s.astype(np.int64),
            "bucket": bucket})

    scored = _docs(sf_dir).map_batches(score_fn, batch_format="pyarrow", batch_size=None) \
        .materialize()

    # bucket sizes: per-batch bincount partials streamed to the driver
    # (64 ints per block — no exchange, unlike a groupby().count())
    def size_partial(batch: pa.Table) -> pa.Table:
        h = np.bincount(batch["bucket"].to_numpy(zero_copy_only=False),
                        minlength=RANK_BUCKETS)
        return pa.Table.from_pydict({"h": [h.astype(np.int64).tobytes()]})

    sizes = np.zeros(RANK_BUCKETS, dtype=np.int64)
    for b in scored.map_batches(size_partial, batch_format="pyarrow", batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for part in b["h"].to_pylist():
            sizes += np.frombuffer(part, dtype=np.int64)
    # rank offset of bucket b = rows in all HIGHER-score buckets
    higher = np.concatenate([[0], np.cumsum(sizes[::-1])[:-1]])[::-1]
    offsets = {b: int(higher[b]) for b in range(RANK_BUCKETS)}

    def rank_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "doc_id"],
                          ascending=[False, True], ignore_index=True)
        base = offsets[int(g["bucket"].iloc[0])]
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "score": g["score"].astype("int64"),
            "rank": pd.Series(np.arange(1, len(g) + 1) + base,
                              dtype="int64")})

    return scored.groupby("bucket").map_groups(rank_fn,
                                               batch_format="pandas")


QUALITY_RANK_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
  FROM documents),
s AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0 THEN
           (CAST(len(list_filter(ltoks, x -> x IN ({_EN}))) AS BIGINT)
            * 1000000) // len(toks)
         ELSE 0 END AS score
  FROM t)
SELECT doc_id, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
           AS rank
FROM s
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Unicode normalization rewrite (NFC + whitespace canonicalization)
# ---------------------------------------------------------------------------

def doc_text_normalized(sf_dir: str):
    """Text-canonicalization rewrite: unicode NFC, whitespace runs
    collapsed to single spaces, trimmed — the first stage of any
    web-scale text pipeline (mojibake-adjacent cleanup). All three
    transforms are Arrow kernels (utf8_normalize + RE2 replace), zero
    per-row Python; the oracle applies DuckDB's nfc_normalize +
    regexp_replace in the same order."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            pc.utf8_normalize(text, form="NFC"), r"\s+", " "))
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "norm_text": norm,
            "n_chars_before": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_chars_after": pc.cast(pc.utf8_length(norm), pa.int64())})

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None)


NORMALIZED_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(nfc_normalize(text), '\s+', ' ', 'g'))
           AS norm_text,
       CAST(length(text) AS BIGINT) AS n_chars_before,
       CAST(length(trim(regexp_replace(nfc_normalize(text), '\s+', ' ',
                                       'g'))) AS BIGINT) AS n_chars_after
FROM documents
"""


# ---------------------------------------------------------------------------
# Token-budget corpus selection (quality-ordered prefix under a budget)
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 12_000


def docs_token_budget_select(sf_dir: str):
    """Select the best documents that fit a training token budget: order
    the corpus by (quality score DESC, doc_id) and keep the maximal
    prefix whose cumulative whitespace-token count stays <= the budget
    — the data-mixing primitive behind 'take the top N tokens of this
    source'. Same fixed-range bucket partitioning as doc_quality_rank:
    per-bucket TOKEN sums stream to the driver (64 ints), become
    cumulative offsets, and each bucket computes exact global running
    totals locally — the corpus is never globally sorted on one node.
    Output: (doc_id, score, n_tokens, cum_tokens), cum <= budget."""
    import pyarrow.dataset as pads
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ["doc_id", "score", "n_tokens", "cum_tokens"]})
    if pads.dataset(f"{sf_dir}/documents.parquet").count_rows() == 0:
        return empty

    def score_fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        q = T.quality_scores(text)
        s = q["stop_ratio_x1e6"].to_numpy(zero_copy_only=False)
        bucket = np.minimum(s * RANK_BUCKETS // (_RANK_SCALE + 1),
                            RANK_BUCKETS - 1).astype(np.int64)
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "score": s.astype(np.int64),
            "n_tokens": q["n_tokens"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "bucket": bucket})

    scored = _docs(sf_dir).map_batches(score_fn, batch_format="pyarrow",
                                       batch_size=None).materialize()

    def sum_partial(batch: pa.Table) -> pa.Table:
        h = np.bincount(batch["bucket"].to_numpy(zero_copy_only=False),
                        weights=batch["n_tokens"]
                        .to_numpy(zero_copy_only=False),
                        minlength=RANK_BUCKETS).astype(np.int64)
        return pa.Table.from_pydict({"h": [h.tobytes()]})

    tok = np.zeros(RANK_BUCKETS, dtype=np.int64)
    for b in scored.map_batches(sum_partial, batch_format="pyarrow",
                                batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for part in b["h"].to_pylist():
            tok += np.frombuffer(part, dtype=np.int64)
    # tokens in all HIGHER-score buckets precede bucket b in the order
    higher = np.concatenate([[0], np.cumsum(tok[::-1])[:-1]])[::-1]
    offsets = {b: int(higher[b]) for b in range(RANK_BUCKETS)}

    def select_fn(g: pd.DataFrame) -> pd.DataFrame:
        base = offsets[int(g["bucket"].iloc[0])]
        if base > TOKEN_BUDGET:          # whole bucket past the budget
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                 ["doc_id", "score", "n_tokens",
                                  "cum_tokens"]})
        g = g.sort_values(["score", "doc_id"],
                          ascending=[False, True], ignore_index=True)
        cum = g["n_tokens"].to_numpy().cumsum() + base
        keep = cum <= TOKEN_BUDGET
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy()[keep],
            "score": g["score"].to_numpy()[keep],
            "n_tokens": g["n_tokens"].to_numpy()[keep],
            "cum_tokens": cum[keep]}).astype("int64")

    return scored.groupby("bucket").map_groups(select_fn,
                                               batch_format="pandas")


TOKEN_BUDGET_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
  FROM documents),
s AS (
  SELECT doc_id,
         CASE WHEN len(toks) > 0 THEN
           (CAST(len(list_filter(ltoks, x -> x IN ({_EN}))) AS BIGINT)
            * 1000000) // len(toks)
         ELSE 0 END AS score,
         CAST(len(toks) AS BIGINT) AS n_tokens
  FROM t),
w AS (
  SELECT doc_id, score, n_tokens,
         SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM s)
SELECT doc_id, score, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM w WHERE cum_tokens <= {TOKEN_BUDGET}
ORDER BY cum_tokens
"""


# ---------------------------------------------------------------------------
# Composed curation pipeline (langid -> quality -> dedup -> budget)
# ---------------------------------------------------------------------------

CURATION_STAGES = ("raw", "langid_en", "quality", "dedup_exact",
                   "token_budget")


def corpus_curation_stages(sf_dir: str):
    """The END-TO-END web-corpus curation funnel as ONE oracled
    operator: raw -> language filter (heuristic langid == 'en') ->
    quality gate (>= 20 tokens) -> exact dedup (keep min doc_id per
    md5(lower(trim(text)))) -> token-budget selection (best-score
    prefix under the budget); emits (stage, n_docs, n_tokens) per
    stage — the per-stage retention curve every data-curation report
    shows. Each stage composes the already-oracled kernels; the oracle
    recomputes the identical funnel as one CTE chain, so the whole
    COMPOSITION is value-checked, not just the pieces. Text is read
    once: a single projection pass computes tokens/lang/score/md5 per
    doc and the funnel runs on the narrow projection (stage 0-2 counts
    are streamed per-batch partials; dedup is one md5-keyed exchange;
    the budget stage reuses the fixed-range bucket running total)."""
    import pyarrow.dataset as pads
    empty = pd.DataFrame({"stage": pd.Series(dtype="int64"),
                          "stage_name": pd.Series(dtype="object"),
                          "n_docs": pd.Series(dtype="int64"),
                          "n_tokens": pd.Series(dtype="int64")})
    if pads.dataset(f"{sf_dir}/documents.parquet").count_rows() == 0:
        return empty

    def project(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        q = T.quality_scores(text)
        norm = T.normalize_for_dedup(text)
        md5 = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in norm.to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "n_tokens": q["n_tokens"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "lang": T.langid(text),
            "score": q["stop_ratio_x1e6"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "md5key": md5})

    proj = _docs(sf_dir).map_batches(project, batch_format="pyarrow",
                                     batch_size=None).materialize()

    def _counts(ds) -> tuple:
        n_docs, n_tokens = 0, 0
        part = ds.map_batches(
            lambda b: pa.Table.from_pydict(
                {"c": [len(b)],
                 "t": [int(b["n_tokens"].to_numpy(
                     zero_copy_only=False).sum())]}),
            batch_format="pyarrow", batch_size=None)
        for b in part.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
            n_docs += int(np.sum(b["c"].to_numpy(zero_copy_only=False)))
            n_tokens += int(np.sum(b["t"].to_numpy(zero_copy_only=False)))
        return n_docs, n_tokens

    s1 = proj.map_batches(
        lambda b: b.filter(pc.equal(b["lang"], "en")),
        batch_format="pyarrow", batch_size=None).materialize()
    s2 = s1.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_tokens"],
                                            QUALITY_MIN_TOKENS)),
        batch_format="pyarrow", batch_size=None).materialize()

    # exact dedup: md5-keyed coarse exchange, keep min doc_id per group
    from .relational import _coarse_str_partition_map

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("doc_id").drop_duplicates("md5key")

    s3 = _coarse_str_partition_map(s2, "md5key", keep_first) \
        .materialize()

    # token budget over s3: fixed-range score buckets -> running total
    def bucketed(batch: pa.Table) -> pa.Table:
        s = batch["score"].to_numpy(zero_copy_only=False)
        b = np.minimum(s * RANK_BUCKETS // (_RANK_SCALE + 1),
                       RANK_BUCKETS - 1).astype(np.int64)
        return batch.append_column("bucket", pa.array(b))

    s3b = s3.map_batches(bucketed, batch_format="pyarrow",
                         batch_size=None).materialize()
    tok = np.zeros(RANK_BUCKETS, dtype=np.int64)
    for b in s3b.map_batches(
            lambda t: pa.Table.from_pydict({"h": [np.bincount(
                t["bucket"].to_numpy(zero_copy_only=False),
                weights=t["n_tokens"].to_numpy(zero_copy_only=False),
                minlength=RANK_BUCKETS).astype(np.int64).tobytes()]}),
            batch_format="pyarrow", batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for part in b["h"].to_pylist():
            tok += np.frombuffer(part, dtype=np.int64)
    higher = np.concatenate([[0], np.cumsum(tok[::-1])[:-1]])[::-1]
    offsets = {i: int(higher[i]) for i in range(RANK_BUCKETS)}

    def select_fn(g: pd.DataFrame) -> pd.DataFrame:
        base = offsets[int(g["bucket"].iloc[0])]
        if base > TOKEN_BUDGET:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_tokens": pd.Series(dtype="int64")})
        g = g.sort_values(["score", "doc_id"],
                          ascending=[False, True], ignore_index=True)
        cum = g["n_tokens"].to_numpy().cumsum() + base
        keep = cum <= TOKEN_BUDGET
        return g.loc[keep, ["doc_id", "n_tokens"]].astype("int64")

    s4 = s3b.groupby("bucket").map_groups(select_fn,
                                          batch_format="pandas")

    rows = []
    for i, (name, ds) in enumerate(zip(
            CURATION_STAGES, (proj, s1, s2, s3, s4))):
        c, t = _counts(ds)
        rows.append((i, name, c, t))
    return pd.DataFrame(rows, columns=["stage", "stage_name", "n_docs",
                                       "n_tokens"])


def _curation_sql() -> str:
    sels, case = _langid_pieces()
    return rf"""
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
  FROM documents),
f AS (SELECT doc_id, text, toks, ltoks, {sels} FROM t),
base AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         {case} AS pred_lang,
         CASE WHEN len(toks) > 0 THEN
           (CAST(len(list_filter(ltoks, x -> x IN ({_EN}))) AS BIGINT)
            * 1000000) // len(toks)
         ELSE 0 END AS score,
         md5(lower(trim(text))) AS md5key
  FROM f),
s1 AS (SELECT * FROM base WHERE pred_lang = 'en'),
s2 AS (SELECT * FROM s1 WHERE n_tokens >= {QUALITY_MIN_TOKENS}),
s3 AS (SELECT * FROM s2
       QUALIFY ROW_NUMBER() OVER (PARTITION BY md5key
                                  ORDER BY doc_id) = 1),
s4 AS (SELECT * FROM (
         SELECT *, SUM(n_tokens) OVER (ORDER BY score DESC, doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cum
         FROM s3)
       WHERE cum <= {TOKEN_BUDGET})
SELECT 0 AS stage, 'raw' AS stage_name, count(*) AS n_docs,
       CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS n_tokens FROM base
UNION ALL SELECT 1, 'langid_en', count(*),
       CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s1
UNION ALL SELECT 2, 'quality', count(*),
       CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s2
UNION ALL SELECT 3, 'dedup_exact', count(*),
       CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s3
UNION ALL SELECT 4, 'token_budget', count(*),
       CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s4
ORDER BY stage
"""


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle (seeded global training order)
# ---------------------------------------------------------------------------

SHUFFLE_SEED = 7
_SHUFFLE_BUCKETS = 256


def docs_epoch_shuffle(sf_dir: str):
    """Seeded deterministic global shuffle: every document's training
    position for one epoch, as ROW_NUMBER over md5(doc_id ':' seed) —
    reproducible across runs and engines (the md5 hex IS the sort key,
    so resharding the input cannot change the order). Distributed rank
    without a global sort: the key is uniform by construction, so its
    first byte range-partitions into 256 equal buckets; per-bucket
    counts stream to the driver and become rank offsets, each bucket
    sorts locally (the doc_quality_rank machinery on a hash key).
    Output: (doc_id, shuffle_pos)."""
    import hashlib
    import pyarrow.dataset as pads
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "shuffle_pos": pd.Series(dtype="int64")})
    if pads.dataset(f"{sf_dir}/documents.parquet").count_rows() == 0:
        return empty

    def key_fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        keys = [hashlib.md5(f"{i}:{SHUFFLE_SEED}".encode()).hexdigest()
                for i in ids]
        bucket = np.array([int(k[:2], 16) for k in keys], dtype=np.int64)
        return pa.Table.from_pydict({
            "doc_id": np.asarray(ids, dtype=np.int64),
            "key": keys, "bucket": bucket})

    keyed = _docs(sf_dir, columns=["doc_id"]) \
        .map_batches(key_fn, batch_format="pyarrow", batch_size=None) \
        .materialize()

    def size_partial(batch: pa.Table) -> pa.Table:
        h = np.bincount(batch["bucket"].to_numpy(zero_copy_only=False),
                        minlength=_SHUFFLE_BUCKETS)
        return pa.Table.from_pydict({"h": [h.astype(np.int64).tobytes()]})

    sizes = np.zeros(_SHUFFLE_BUCKETS, dtype=np.int64)
    for b in keyed.map_batches(size_partial, batch_format="pyarrow",
                               batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for part in b["h"].to_pylist():
            sizes += np.frombuffer(part, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])

    def rank_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("key", ignore_index=True)
        base = int(offsets[int(g["bucket"].iloc[0])])
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "shuffle_pos": pd.Series(np.arange(1, len(g) + 1) + base,
                                     dtype="int64")})

    return keyed.groupby("bucket").map_groups(rank_fn,
                                              batch_format="pandas")


EPOCH_SHUFFLE_SQL = f"""
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
            ORDER BY md5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_SEED}'))
            AS BIGINT) AS shuffle_pos
FROM documents
ORDER BY shuffle_pos
"""


# ---------------------------------------------------------------------------
# Source-level quality gate (aggregate up, filter down)
# ---------------------------------------------------------------------------

SOURCE_GATE_THR_X1E6 = 60_000


def docs_source_quality_gate(sf_dir: str):
    """Two-pass provenance filter: aggregate document quality UP to the
    source (domain) level, then keep every document whose SOURCE passes
    — the C4/RefinedWeb-style rule that drops a whole low-quality
    domain even when individual pages look fine. Pass 1 pre-reduces
    (source, sum(score), count) per batch into a tiny exchange; the
    passing-source set (source-cardinality-bounded) broadcasts back as
    a filter. The mean test is integer cross-multiplied
    (sum >= thr * n), so no float mean is ever compared.
    Output: kept (doc_id, source, score)."""
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "source": pd.Series(dtype="object"),
                          "score": pd.Series(dtype="int64")})
    import pyarrow.dataset as pads
    if pads.dataset(f"{sf_dir}/documents.parquet").count_rows() == 0:
        return empty
    import ray
    from ray.data.aggregate import Sum as _Sum

    def score_fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        q = T.quality_scores(text)
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "source": batch["source"].to_numpy(zero_copy_only=False),
            "score": q["stop_ratio_x1e6"].to_numpy(zero_copy_only=False)
            .astype(np.int64)})

    scored = _docs(sf_dir, columns=["doc_id", "text", "source"]) \
        .map_batches(score_fn, batch_format="pyarrow", batch_size=None) \
        .materialize()

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "source": batch["source"].to_numpy(zero_copy_only=False),
            "ss": batch["score"].to_numpy(zero_copy_only=False),
            "cnt": np.ones(len(batch), dtype=np.int64)})
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(),
            preserve_index=False).replace_schema_metadata(None)

    agg = (scored.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
           .groupby("source")
           .aggregate(_Sum("ss", alias_name="ss"),
                      _Sum("cnt", alias_name="cnt"))
           .to_pandas())
    passing = set(agg.loc[agg["ss"] >= SOURCE_GATE_THR_X1E6 * agg["cnt"],
                          "source"])
    pass_ref = ray.put(passing)

    def gate(batch: pa.Table) -> pa.Table:
        ok = ray.get(pass_ref)
        src = batch["source"].to_numpy(zero_copy_only=False)
        mask = np.array([s in ok for s in src])
        return batch.filter(pa.array(mask))

    out = scored.map_batches(gate, batch_format="pyarrow",
                             batch_size=None).to_pandas()
    return out if not out.empty else empty


SOURCE_GATE_SQL = rf"""
WITH t AS (
  SELECT doc_id, source,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
  FROM documents),
s AS (
  SELECT doc_id, source,
         CASE WHEN len(toks) > 0 THEN
           (CAST(len(list_filter(ltoks, x -> x IN ({_EN}))) AS BIGINT)
            * 1000000) // len(toks)
         ELSE 0 END AS score
  FROM t),
g AS (SELECT source, SUM(score) AS ss, COUNT(*) AS cnt FROM s
      GROUP BY source)
SELECT s.doc_id, s.source, s.score
FROM s JOIN g ON s.source = g.source
WHERE g.ss >= {SOURCE_GATE_THR_X1E6} * g.cnt
ORDER BY s.doc_id
"""


# ---------------------------------------------------------------------------
# Readability (Flesch-style, integer-exact)
# ---------------------------------------------------------------------------

def doc_readability(sf_dir: str):
    """Per-document readability: sentence count (runs of [.!?]),
    whitespace word count, vowel-group syllable proxy, and the Flesch
    reading-ease score as the all-integer floor form
    206835 - 1015*words//sentences - 84600*syllables//words (x1e3) —
    the style/complexity quality signal next to the Gopher-style
    repetition stats. Pure vectorized RE2 counts per batch, zero
    exchange. Output: (doc_id, n_sentences, n_words, n_syllables,
    flesch_x1e3)."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) \
            else batch["text"]
        sent = pc.count_substring_regex(text, r"[.!?]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(text), T.TOKEN_SPLIT_RE)
        words = pc.list_value_length(toks) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        syl = pc.count_substring_regex(pc.utf8_lower(text),
                                       r"[aeiouy]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s1 = np.maximum(sent, 1)
        w1 = np.maximum(words, 1)
        flesch = (206_835 - 1015 * words // s1 - 84_600 * syl // w1)
        return pa.Table.from_arrays(
            [batch["doc_id"], pa.array(sent), pa.array(words),
             pa.array(syl), pa.array(flesch.astype(np.int64))],
            names=["doc_id", "n_sentences", "n_words", "n_syllables",
                   "flesch_x1e3"])

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow",
                                     batch_size=None)


READABILITY_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
           AS n_sentences,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_words,
       CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
           AS n_syllables,
       CAST(206835
            - 1015 * len(regexp_split_to_array(trim(text), '\s+'))
              // GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
            - 84600 * len(regexp_extract_all(lower(text), '[aeiouy]+'))
              // GREATEST(len(regexp_split_to_array(trim(text), '\s+')),
                          1)
            AS BIGINT) AS flesch_x1e3
FROM documents
"""


# ---------------------------------------------------------------------------
# SFT chat-template rendering
# ---------------------------------------------------------------------------

SFT_USER_TAG = "<|user|>"
SFT_ASSISTANT_TAG = "<|assistant|>"


SFT_PROMPT_TOKENS = 8


def docs_sft_render(sf_dir: str):
    """Deterministic SFT formatting: each document with more than
    SFT_PROMPT_TOKENS whitespace tokens renders into the chat template
    (first SFT_PROMPT_TOKENS tokens as the user turn, the remainder as
    the assistant turn) — the prompt-assembly rewrite every
    instruction-tuning pipeline runs before packing. Pure vectorized
    Arrow split/slice/join, zero exchange; short docs are filtered on
    both engines. Output: (doc_id, rendered, n_chars)."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) \
            else batch["text"]
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text),
                                      T.TOKEN_SPLIT_RE)
        n = pc.list_value_length(toks)
        keep = pc.greater(n, SFT_PROMPT_TOKENS) \
            .to_numpy(zero_copy_only=False)
        t = pa.Table.from_arrays([batch["doc_id"], toks],
                                 names=["doc_id", "toks"]) \
            .filter(pa.array(keep))
        tk = t["toks"].combine_chunks() \
            if isinstance(t["toks"], pa.ChunkedArray) else t["toks"]
        instr = pa.array([" ".join(row[:SFT_PROMPT_TOKENS])
                          for row in tk.to_pylist()])
        resp = pa.array([" ".join(row[SFT_PROMPT_TOKENS:])
                         for row in tk.to_pylist()])
        rendered = pc.binary_join_element_wise(
            pa.array([SFT_USER_TAG + "\n"] * len(t)), instr,
            pa.array(["\n" + SFT_ASSISTANT_TAG + "\n"] * len(t)),
            resp, "")
        return pa.Table.from_arrays(
            [t["doc_id"], rendered,
             pc.cast(pc.utf8_length(rendered), pa.int64())],
            names=["doc_id", "rendered", "n_chars"])

    out = _docs(sf_dir).map_batches(fn, batch_format="pyarrow",
                                    batch_size=None).to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "rendered": pd.Series(dtype="object"),
                             "n_chars": pd.Series(dtype="int64")})
    return out


SFT_RENDER_SQL = rf"""
WITH s AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\s+') AS l
  FROM documents),
r AS (
  SELECT doc_id,
         array_to_string(l[1:{SFT_PROMPT_TOKENS}], ' ') AS instr,
         array_to_string(l[{SFT_PROMPT_TOKENS + 1}:], ' ') AS resp
  FROM s WHERE len(l) > {SFT_PROMPT_TOKENS})
SELECT doc_id,
       '{SFT_USER_TAG}' || chr(10) || instr || chr(10)
           || '{SFT_ASSISTANT_TAG}' || chr(10) || resp AS rendered,
       CAST(length('{SFT_USER_TAG}' || chr(10) || instr || chr(10)
           || '{SFT_ASSISTANT_TAG}' || chr(10) || resp) AS BIGINT)
           AS n_chars
FROM r
"""


# ---------------------------------------------------------------------------
# Per-source duplication rate (curation dashboard slice)
# ---------------------------------------------------------------------------

def docs_dup_rate_by_source(sf_dir: str):
    """Duplication rate per source: the share of each source's docs
    whose normalized text also appears elsewhere in the corpus
    (cross-source duplicates count for BOTH sources) — the per-slice
    dedup metric a curation dashboard tracks. Two exchanges: the md5
    group sizes (text never re-ships), then per-source counts of docs
    in >1-sized groups; rate is an exact x1e6 floor division.
    Output: (source, n_docs, n_duped, dup_rate_x1e6)."""
    empty = pd.DataFrame({"source": pd.Series(dtype="object"),
                          **{c: pd.Series(dtype="int64") for c in
                             ("n_docs", "n_duped", "dup_rate_x1e6")}})
    ds = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def keyed(batch: pa.Table) -> pa.Table:
        norm = T.normalize_for_dedup(
            batch["text"].combine_chunks()
            if isinstance(batch["text"], pa.ChunkedArray)
            else batch["text"])
        md5 = pa.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                        for s in norm.to_pylist()], type=pa.string())
        return pa.Table.from_arrays([md5, batch["source"]],
                                    names=["text_md5", "source"])

    from .relational import _coarse_str_partition_map

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.groupby("text_md5")["source"].transform("size")
        g = g.assign(duped=(sz > 1).astype("int64"),
                     one=np.ones(len(g), dtype=np.int64))
        return g.groupby("source", as_index=False)[["one", "duped"]] \
            .sum().rename(columns={"one": "n_docs", "duped": "n_duped"})

    agg = _coarse_str_partition_map(
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=None),
        "text_md5", per_group).to_pandas()
    if agg.empty:
        return empty
    out = agg.groupby("source", as_index=False)[["n_docs", "n_duped"]] \
        .sum()
    out["dup_rate_x1e6"] = out["n_duped"] * 1_000_000 // out["n_docs"]
    return out.sort_values("source").reset_index(drop=True) \
        .astype({"n_docs": "int64", "n_duped": "int64",
                 "dup_rate_x1e6": "int64"})


DUP_RATE_SQL = """
WITH k AS (
  SELECT source, md5(lower(trim(text))) AS text_md5 FROM documents),
g AS (
  SELECT source, text_md5,
         COUNT(*) OVER (PARTITION BY text_md5) AS grp_sz
  FROM k)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN grp_sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_duped,
       CAST(SUM(CASE WHEN grp_sz > 1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS dup_rate_x1e6
FROM g GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# Token-budget apportionment across sources (largest-remainder method)
# ---------------------------------------------------------------------------

ALLOC_BUDGET = 1_000_000


def source_token_allocation(sf_dir: str):
    """Apportion a global token budget of {ALLOC_BUDGET} across sources
    proportional to their token counts with the largest-remainder
    (Hamilton) method — the exact integer data-mixing computation
    behind 'sample X tokens per source': floor quotas first, then one
    extra token-unit to the largest remainders (source-name ties
    deterministic). One grouped token-count exchange; the apportionment
    runs on the sources-sized table. Output: (source, n_tokens, quota).
    sum(quota) == min(budget, via exact remainders) by construction."""
    empty = pd.DataFrame({"source": pd.Series(dtype="object"),
                          "n_tokens": pd.Series(dtype="int64"),
                          "quota": pd.Series(dtype="int64")})
    ds = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) \
            else batch["text"]
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text),
                                      T.TOKEN_SPLIT_RE)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        g = pd.DataFrame({"source": batch["source"]
                          .to_numpy(zero_copy_only=False),
                          "n_tokens": n}) \
            .groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("source")
           .aggregate(Sum("n_tokens", alias_name="n_tokens"))
           .to_pandas())
    if agg.empty:
        return empty
    total = int(agg["n_tokens"].sum())
    if total == 0:
        agg["quota"] = 0
        return agg.sort_values("source").reset_index(drop=True)
    floor_q = [int(n) * ALLOC_BUDGET // total for n in agg["n_tokens"]]
    rem = [int(n) * ALLOC_BUDGET % total for n in agg["n_tokens"]]
    leftover = ALLOC_BUDGET - sum(floor_q)
    order = sorted(range(len(agg)),
                   key=lambda i: (-rem[i], agg["source"].iloc[i]))
    quota = list(floor_q)
    for i in order[:leftover]:
        quota[i] += 1
    agg["quota"] = quota
    return agg.sort_values("source").reset_index(drop=True) \
        .astype({"n_tokens": "int64", "quota": "int64"})


ALLOC_SQL = rf"""
WITH t AS (
  SELECT source,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
q AS (
  SELECT source, n_tokens,
         CAST(n_tokens AS HUGEINT) * {ALLOC_BUDGET}
             // (SELECT SUM(n_tokens) FROM t) AS floor_q,
         CAST(n_tokens AS HUGEINT) * {ALLOC_BUDGET}
             % (SELECT SUM(n_tokens) FROM t) AS rem,
         ROW_NUMBER() OVER (ORDER BY CAST(n_tokens AS HUGEINT)
                            * {ALLOC_BUDGET}
                            % (SELECT SUM(n_tokens) FROM t) DESC,
                            source) AS rnk
  FROM t),
l AS (SELECT {ALLOC_BUDGET} - SUM(floor_q) AS leftover FROM q)
SELECT source, n_tokens,
       CAST(floor_q + CASE WHEN rnk <= (SELECT leftover FROM l)
                           THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM q ORDER BY source
"""


COMPRESSION_GATE_X1E6 = 300_000   # ratio below 0.30 => degenerate doc


def doc_compression_ratio(sf_dir: str):
    """Compression-ratio quality signal (the MassiveText/RefinedWeb
    -lineage repetition detector): ``ratio_x1e6 = len(zlib(text)) * 1e6
    // len(utf8(text))``. Highly repetitive or templated text
    compresses far below natural prose (~0.4-0.7 for English); a
    near-zero ratio flags degenerate machine-generated pages that
    token-level Gopher rules can miss (long-range repetition). Adds a
    ``degenerate`` flag at ratio < 0.30. Not SQL-expressible (no zlib
    in DuckDB) — differential-tested against direct zlib plus planted
    repetitive docs. Embarrassingly parallel; zlib releases the GIL, so
    the per-row loop is C-bound.
    Output: (doc_id, n_bytes, ratio_x1e6, degenerate)."""
    import zlib

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        nb, ratio = [], []
        for t in texts:
            raw = (t or "").encode("utf-8")
            nb.append(len(raw))
            ratio.append(len(zlib.compress(raw, 6)) * 1_000_000
                         // len(raw) if raw else 0)
        nb_a = pa.array(nb, type=pa.int64())
        r_a = pa.array(ratio, type=pa.int64())
        return pa.Table.from_arrays(
            [batch["doc_id"], nb_a, r_a,
             pa.array([0 < r < COMPRESSION_GATE_X1E6 for r in ratio])],
            names=["doc_id", "n_bytes", "ratio_x1e6", "degenerate"])

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow",
                                     batch_size=None)


# ---------------------------------------------------------------------------
# Repetition signals (Gopher rules 5-8 family): per-doc n-gram repetition
# ---------------------------------------------------------------------------

def docs_repetition_signals(sf_dir: str):
    """Per-document repetition/diversity signals — the Gopher-style
    quality rules that catch boilerplate-looping and spam pages, which
    length/punctuation heuristics (``doc_quality``) miss:

      - ``ttr_x1e6``: type-token ratio (distinct words / words);
      - ``top_bigram_frac_x1e6``: share of bigram positions taken by
        the single most frequent bigram (Gopher's "fraction of
        characters in the most common 2-gram", word-position flavored
        so the statistic is integer-exact);
      - ``dup_trigram_frac_x1e6``: share of trigram positions whose
        trigram occurs more than once in the document.

    All fixed-point x1e6 floor-divided (hash-stable vs the oracle).
    Doc-local by definition: ZERO exchanges — one vectorized pass,
    outputs one short row per document. Counting runs on integer word
    codes (np.unique inverse), never on strings."""
    def signals(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = as_array(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(text)),
            T.TOKEN_SPLIT_RE))
        flat = as_array(pc.list_flatten(toks))
        parent = as_array(pc.list_parent_indices(toks)) \
            .to_numpy(zero_copy_only=False)
        n_docs = len(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n_words = np.bincount(parent, minlength=n_docs).astype(np.int64)

        _, codes = np.unique(flat.to_numpy(zero_copy_only=False),
                             return_inverse=True)
        codes = codes.astype(np.int64)
        df = pd.DataFrame({"d": parent, "c": codes})
        ttr_n = df.groupby("d")["c"].nunique() \
            .reindex(range(n_docs), fill_value=0).to_numpy()

        def ngram_stats(k: int):
            """(modal count, dup-position count, total positions) of
            word k-grams per doc."""
            if len(codes) < k:
                z = np.zeros(n_docs, dtype=np.int64)
                return z, z, z
            m = len(codes) - k + 1
            same = parent[:m] == parent[k - 1:]
            cols = {"d": parent[:m][same]}
            for j in range(k):
                cols[f"c{j}"] = codes[j:j + m][same]
            g = pd.DataFrame(cols).groupby(list(cols), as_index=False) \
                .size()
            per = g.groupby("d")["size"]
            mx = per.max().reindex(range(n_docs), fill_value=0) \
                .to_numpy().astype(np.int64)
            dup = g[g["size"] >= 2].groupby("d")["size"].sum() \
                .reindex(range(n_docs), fill_value=0).to_numpy() \
                .astype(np.int64)
            tot = per.sum().reindex(range(n_docs), fill_value=0) \
                .to_numpy().astype(np.int64)
            return mx, dup, tot

        bg_mx, _, bg_tot = ngram_stats(2)
        _, tg_dup, tg_tot = ngram_stats(3)

        def frac(num, den):
            return np.where(den > 0, num * 1_000_000 //
                            np.maximum(den, 1), 0).astype(np.int64)

        return pa.Table.from_pydict({
            "doc_id": doc_ids, "n_words": n_words,
            "ttr_x1e6": frac(ttr_n.astype(np.int64), n_words),
            "top_bigram_frac_x1e6": frac(bg_mx, bg_tot),
            "dup_trigram_frac_x1e6": frac(tg_dup, tg_tot)})

    return (_docs(sf_dir)
            .map_batches(signals, batch_format="pyarrow", batch_size=None)
            .sort("doc_id"))


REPETITION_SQL = r"""
WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+')
                  AS l FROM documents),
base AS (SELECT doc_id, len(l) AS n_words FROM t),
w AS (SELECT doc_id, unnest(l) AS w FROM t),
ttr AS (SELECT doc_id, COUNT(DISTINCT w) AS n_distinct
        FROM w GROUP BY doc_id),
bg AS (SELECT doc_id, l[i.g] || ' ' || l[i.g + 1] AS b
       FROM t, UNNEST(generate_series(1, len(l) - 1)) AS i(g)),
bgc AS (SELECT doc_id, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
bgm AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM bgc
        GROUP BY doc_id),
tg AS (SELECT doc_id, l[i.g] || ' ' || l[i.g + 1] || ' ' || l[i.g + 2] AS b
       FROM t, UNNEST(generate_series(1, len(l) - 2)) AS i(g)),
tgc AS (SELECT doc_id, COUNT(*) AS c FROM tg GROUP BY doc_id, b),
tgm AS (SELECT doc_id, SUM(c) FILTER (c >= 2) AS dup, SUM(c) AS tot
        FROM tgc GROUP BY doc_id)
SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words,
       CAST(ttr.n_distinct * 1000000 // b.n_words AS BIGINT) AS ttr_x1e6,
       CAST(COALESCE(bgm.mx * 1000000 // bgm.tot, 0) AS BIGINT)
           AS top_bigram_frac_x1e6,
       CAST(COALESCE(COALESCE(tgm.dup, 0) * 1000000 // tgm.tot, 0)
            AS BIGINT) AS dup_trigram_frac_x1e6
FROM base b JOIN ttr USING (doc_id)
LEFT JOIN bgm USING (doc_id) LEFT JOIN tgm USING (doc_id)
ORDER BY b.doc_id
"""


TEXT_QUERIES: dict[str, tuple] = {
    "doc_compression_ratio": (doc_compression_ratio, None),
    "docs_repetition_signals": (docs_repetition_signals, REPETITION_SQL),
    "docs_dup_rate_by_source": (docs_dup_rate_by_source, DUP_RATE_SQL),
    "source_token_allocation": (source_token_allocation, ALLOC_SQL),
    "docs_sft_render": (docs_sft_render, SFT_RENDER_SQL),
    "doc_readability": (doc_readability, READABILITY_SQL),
    "docs_token_budget_select": (docs_token_budget_select,
                                 TOKEN_BUDGET_SQL),
    "docs_source_quality_gate": (docs_source_quality_gate,
                                 SOURCE_GATE_SQL),
    "docs_epoch_shuffle": (docs_epoch_shuffle, EPOCH_SHUFFLE_SQL),
    "corpus_curation_stages": (corpus_curation_stages, _curation_sql()),
    "doc_text_normalized": (doc_text_normalized, NORMALIZED_SQL),
    "doc_quality_rank": (doc_quality_rank, QUALITY_RANK_SQL),
    "doc_trigram_lm": (doc_trigram_lm, None),
    "corpus_ccnet_buckets": (corpus_ccnet_buckets, None),
    "corpus_tokenizer_fertility": (corpus_tokenizer_fertility,
                                   FERTILITY_SQL),
    "doc_model_scores": (doc_model_scores, MODEL_SCORES_SQL),
    "doc_pii_masked": (doc_pii_masked, PII_MASK_SQL),
    "doc_pattern_counts": (doc_pattern_counts, PATTERN_COUNTS_SQL),
    "doc_token_stats": (doc_token_stats, TOKEN_STATS_SQL),
    "doc_quality": (doc_quality, QUALITY_SQL),
    "doc_quality_threshold_sweep": (doc_quality_threshold_sweep,
                                    QUALITY_SWEEP_SQL),
    "doc_langid": (doc_langid, LANGID_SQL),
    "doc_dedup_exact": (doc_dedup_exact, DEDUP_EXACT_SQL),
    "doc_dedup_incremental": (doc_dedup_incremental, DEDUP_INCREMENTAL_SQL),
    "corpus_snapshot_diff": (corpus_snapshot_diff, SNAPSHOT_DIFF_SQL),
    "dpo_pairs_by_source": (dpo_pairs_by_source, DPO_PAIRS_SQL),
    "preference_bradley_terry": (preference_bradley_terry, None),
    "dedup_weighted_sampling": (dedup_weighted_sampling,
                                DEDUP_WEIGHTED_SQL),
    "quality_weak_labels": (quality_weak_labels, WEAK_LABELS_SQL),
    "docs_weighted_sample_k": (docs_weighted_sample_k,
                               WEIGHTED_SAMPLE_SQL),
    "split_leakage_safe": (split_leakage_safe, SPLIT_LEAKAGE_SAFE_SQL),
    "split_naive_leakage": (split_naive_leakage,
                            SPLIT_NAIVE_LEAKAGE_SQL),
    "doc_chunks": (doc_chunks, None),
    "doc_cdc_chunks": (doc_cdc_chunks, None),
    "doc_fingerprint": (doc_fingerprint, FINGERPRINT_SQL),
    "langid_accuracy": (langid_accuracy, LANGID_ACC_SQL),
    "doc_quality_filter": (doc_quality_filter, QUALITY_FILTER_SQL),
}
