"""Corpus-level text statistics over the ``documents`` table — the
vocabulary / term-frequency operators a training-data pipeline runs
before and after filtering: corpus heavy hitters, vocabulary stats,
TF-IDF term scoring, repetition (Gopher-style) quality signals, token
length histograms, blocklist redaction, and an inverted index. Each is
paired with a DuckDB oracle (identical tokenization: lower(trim(text))
split on ``\\s+``, same RE2 class in both engines).

Scale shapes (these run over ~100 TB of text in production):

- Tokenization is a zero-copy Arrow kernel (``split_pattern_regex`` +
  ``list_flatten``/``list_parent_indices``) — no python loop over rows.
- Every corpus-wide count pre-aggregates per batch (one row per term per
  batch) so the term shuffle moves partial counts, not token instances.
- Term-keyed stages (df, postings) shuffle on a COARSE hash of the term
  (``hash(term) % 64``) — bounded group count at any vocabulary size —
  with the exact per-term grouping done in pandas inside the partition.
- Per-doc stages (TF-IDF top-k, repetition) never shuffle token rows at
  all: a document's tokens live in its own batch row, so tf/bigram
  counting is batch-local; only the tiny (doc, term, tf) partials and
  the df side table move.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from ..functions import text as T
from ..functions.arrow_utils import as_array


def _docs(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


def _n_docs(sf_dir: str) -> int:
    """Row count from parquet footers only (single file or shard dir)."""
    import pyarrow.dataset as pads
    return pads.dataset(f"{sf_dir}/documents.parquet").count_rows()


def _n_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet footers only (single file or shard dir)."""
    import pyarrow.dataset as pads
    return pads.dataset(f"{sf_dir}/{table}.parquet").count_rows()


def _typed_empty_on_no_docs(_table: str = "documents", **schema):
    """Decorator: on an EMPTY ``_table`` return a TYPED empty frame
    instead of running the pipeline — map_batches over zero blocks
    yields a schema-less Dataset whose to_pandas() has no columns,
    which KeyErrors column-selecting consumers downstream (and several
    broadcast-query ops would index row 0 of the empty table). Skipped
    when the caller supplies its own ``ds`` (composition path: the
    outer op owns the guard). ``schema`` maps column -> pandas dtype
    string; order is the output column order."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(sf_dir, *args, **kw):
            ds = args[0] if args else kw.get("ds")
            if ds is None and _n_rows(sf_dir, _table) == 0:
                return pd.DataFrame({c: pd.Series(dtype=t)
                                     for c, t in schema.items()})
            return fn(sf_dir, *args, **kw)
        return wrapper
    return deco


def _from_pandas(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False) \
        .replace_schema_metadata(None)


def _doc_terms(batch: pa.Table):
    """(doc_id_per_token, token) flat numpy/arrow pair for one batch —
    lowercase, whitespace-split, identical to the oracle's
    regexp_split_to_array(lower(trim(text)), '\\s+')."""
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = as_array(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(text)), T.TOKEN_SPLIT_RE))
    flat = as_array(pc.list_flatten(toks))
    parent = as_array(pc.list_parent_indices(toks)) \
        .to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)[parent]
    return doc_ids, flat


def _coarse_str_group(ds, key: str, per_group_fn,
                      n_coarse: int | None = None):
    """Grouped map keyed by a STRING column via a coarse hash shuffle
    (cf. relational._coarse_grouped_map, which keys on ints). Blocks
    entering the exchange are bounded to ~cores/2 first (see
    relational._pre_coalesce — sort cost carries a per-block
    constant). ``n_coarse`` defaults cluster-scaled."""
    from .relational import _pre_coalesce
    if n_coarse is None:
        from ..functions.cluster import default_n_coarse
        n_coarse = default_n_coarse()

    def add_coarse(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            batch[key].to_numpy(zero_copy_only=False).astype(str))
        return batch.append_column(
            "_coarse", pa.array((h % np.uint64(n_coarse)).astype(np.int64))) \
            .replace_schema_metadata(None)

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return per_group_fn(g.drop(columns=["_coarse"]))

    return _pre_coalesce(ds, "auto") \
        .map_batches(add_coarse, batch_format="pyarrow", batch_size=None) \
        .groupby("_coarse").map_groups(run, batch_format="pandas")


# ---------------------------------------------------------------------------
# Corpus heavy hitters: top-k most frequent tokens
# ---------------------------------------------------------------------------

HEAVY_HITTERS_K = 20


def _token_counts(sf_dir: str):
    """(token, n) dataset: per-batch partial counts -> keyed Sum."""
    def partial(batch: pa.Table) -> pa.Table:
        _, flat = _doc_terms(batch)
        vc = pc.value_counts(flat)       # Arrow-native, no object boxing
        return pa.Table.from_arrays(
            [vc.field("values"), pc.cast(vc.field("counts"), pa.int64())],
            names=["token", "n"]).replace_schema_metadata(None)

    return (_docs(sf_dir).map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("token").aggregate(Sum("n", alias_name="n")))


def corpus_heavy_hitters(sf_dir: str):
    """Exact corpus-wide top-k tokens by frequency (the exact baseline
    the count-min-sketch path is checked against). Ties break on token
    so the result is deterministic at any parallelism."""
    return _token_counts(sf_dir) \
        .sort(["n", "token"], descending=[True, False]) \
        .limit(HEAVY_HITTERS_K)


HEAVY_HITTERS_SQL = rf"""
SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      FROM documents)
GROUP BY tok
ORDER BY n DESC, token
LIMIT {HEAVY_HITTERS_K}
"""


TOP_BY_LANG_K = 5


def corpus_top_tokens_by_lang(sf_dir: str):
    """GROUPED heavy hitters: top-{TOP_BY_LANG_K} tokens per language
    stratum (the per-language vocabulary profile a multilingual mixture
    needs before setting sampling weights). Same partial-count shape as
    the global version — one row per (lang, token) per batch enters the
    exchange, never token instances — then per-lang top-k inside a
    coarse lang-keyed grouped map. Ties break on token so the result is
    deterministic at any parallelism."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = as_array(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                as_array(batch["text"]))), T.TOKEN_SPLIT_RE))
        flat = as_array(pc.list_flatten(toks))
        parent = as_array(pc.list_parent_indices(toks)) \
            .to_numpy(zero_copy_only=False)
        lang = batch["lang"].to_numpy(zero_copy_only=False)[parent]
        df = pd.DataFrame({"lang": lang,
                           "token": flat.to_numpy(zero_copy_only=False)})
        g = df.groupby(["lang", "token"], as_index=False).size() \
            .rename(columns={"size": "n"}).astype({"n": "int64"})
        return _from_pandas(g)

    tc = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
          .groupby(["lang", "token"]).aggregate(Sum("n", alias_name="n")))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["lang", "n", "token"],
                          ascending=[True, False, True])
        g["rk"] = g.groupby("lang").cumcount().astype("int64") + 1
        return g[g["rk"] <= TOP_BY_LANG_K]

    return _coarse_str_group(tc, "lang", topk) \
        .sort(["lang", "rk"])


TOP_BY_LANG_SQL = rf"""
WITH tc AS (
  SELECT lang, tok AS token, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT lang,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                 AS tok
        FROM documents)
  GROUP BY lang, tok),
r AS (SELECT *, row_number() OVER
        (PARTITION BY lang ORDER BY n DESC, token) AS rk FROM tc)
SELECT lang, token, n, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {TOP_BY_LANG_K}
ORDER BY lang, rk
"""


# ---------------------------------------------------------------------------
# Vocabulary stats (single-row corpus summary)
# ---------------------------------------------------------------------------

def corpus_vocab_stats(sf_dir: str):
    """One-row corpus summary off the token-count aggregate: vocabulary
    size, hapax count (tokens seen exactly once), total token instances.
    The second pass reduces (token, n) rows — already tiny relative to
    the corpus — through a global Sum, never back to the driver."""
    tc = _token_counts(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "vocab_size": [np.int64(len(n))],
            "hapax_count": [np.int64((n == 1).sum())],
            "total_tokens": [np.int64(n.sum())]})

    agg = (tc.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .aggregate(Sum("vocab_size", alias_name="vocab_size"),
                      Sum("hapax_count", alias_name="hapax_count"),
                      Sum("total_tokens", alias_name="total_tokens")))
    # empty input -> None sums -> well-defined zeros
    return pd.DataFrame([{k: np.int64(v or 0) for k, v in agg.items()}])


VOCAB_STATS_SQL = r"""
WITH tc AS (
  SELECT tok, COUNT(*) AS n
  FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        FROM documents)
  GROUP BY tok)
SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
       CAST(COUNT(*) FILTER (n = 1) AS BIGINT) AS hapax_count,
       CAST(SUM(n) AS BIGINT) AS total_tokens
FROM tc
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms per document
# ---------------------------------------------------------------------------

TFIDF_TOPK = 3


def doc_tfidf_top_terms(sf_dir: str):
    """Per-doc top-3 terms by integer TF-IDF score ``tf * N // df``
    (N = corpus size, df = docs containing the term — integer-scaled so
    the oracle matches bit-exactly; log-idf would be float-ordered the
    same way for top-k but not hash-comparable).

    Shuffle plan: the ONLY exchange is the tiny (term, df) aggregate —
    a document's terms live in its own batch row, so tf counting AND
    the per-doc top-k are batch-local once the df table is broadcast
    (``ray.put`` once, read per task). At vocabularies too large to
    broadcast, the fallback is the term-keyed coarse exchange attaching
    df to (doc, term, tf) rows — one extra shuffle of per-doc-term
    partials, never token instances."""
    import ray

    n_docs = _n_docs(sf_dir)

    def df_partial(batch: pa.Table) -> pa.Table:
        # per-batch docs-per-term counts are exact partials (each doc is
        # wholly inside one batch row)
        doc_ids, flat = _doc_terms(batch)
        g = pd.DataFrame({"doc_id": doc_ids,
                          "term": flat.to_numpy(zero_copy_only=False)}) \
            .drop_duplicates().groupby("term", as_index=False).size() \
            .rename(columns={"size": "df"})
        return _from_pandas(g.astype({"df": "int64"}))

    dfs = (_docs(sf_dir).map_batches(df_partial, batch_format="pyarrow", batch_size=None)
           .groupby("term").aggregate(Sum("df", alias_name="df"))
           .to_pandas())
    if "term" not in dfs.columns:      # empty input loses its schema
        dfs = pd.DataFrame({"term": [], "df": []})
    df_ref = ray.put(dict(zip(dfs["term"], dfs["df"].astype(np.int64))))

    def topk(batch: pa.Table) -> pa.Table:
        dmap = ray.get(df_ref)
        doc_ids, flat = _doc_terms(batch)
        tf = pd.DataFrame({"doc_id": doc_ids,
                           "term": flat.to_numpy(zero_copy_only=False)}) \
            .groupby(["doc_id", "term"], as_index=False).size() \
            .rename(columns={"size": "tf"})
        tf["score"] = (tf["tf"].to_numpy(np.int64) * np.int64(n_docs)) \
            // tf["term"].map(dmap).to_numpy(np.int64)
        out = (tf.sort_values(["doc_id", "score", "term"],
                              ascending=[True, False, True])
               .groupby("doc_id").head(TFIDF_TOPK))
        return _from_pandas(out.astype({"doc_id": "int64", "tf": "int64",
                                        "score": "int64"}))

    return _docs(sf_dir).map_batches(topk, batch_format="pyarrow", batch_size=None) \
        .sort(["doc_id", "term"])


TFIDF_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM t GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
s AS (SELECT doc_id, tf.term, tf,
             (tf * (SELECT COUNT(*) FROM documents)) // df AS score
      FROM tf JOIN df USING (term)),
r AS (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY score DESC, term) AS rn FROM s)
SELECT doc_id, term, tf, score FROM r WHERE rn <= {TFIDF_TOPK}
ORDER BY doc_id, term
"""


# ---------------------------------------------------------------------------
# Repetition / diversity signals (Gopher-style quality rules)
# ---------------------------------------------------------------------------

def doc_repetition(sf_dir: str):
    """Per-doc repetition signals: distinct-token ratio and the fraction
    of bigram slots taken by the single most frequent bigram — the
    Gopher repetition-rule family over newline-free text. Entirely
    batch-local (a doc's tokens sit in its own row); no shuffle."""
    def fn(batch: pa.Table) -> pa.Table:
        doc_ids_flat, flat = _doc_terms(batch)
        toks = flat.to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)

        df = pd.DataFrame({"doc_id": doc_ids_flat, "tok": toks})
        per = df.groupby("doc_id").agg(n_tokens=("tok", "size"),
                                       n_distinct=("tok", "nunique"))
        per = per.reindex(ids, fill_value=0)

        # bigrams: adjacent token pairs within the same doc
        same = doc_ids_flat[1:] == doc_ids_flat[:-1]
        bg = pd.DataFrame({"doc_id": doc_ids_flat[1:][same],
                           "a": toks[:-1][same], "b": toks[1:][same]})
        if len(bg):
            counts = bg.groupby(["doc_id", "a", "b"]).size() \
                       .groupby("doc_id").max()
        else:
            counts = pd.Series(dtype="int64")
        top_bg = counts.reindex(ids, fill_value=0).to_numpy(np.int64)

        n_tok = per["n_tokens"].to_numpy(np.int64)
        n_dis = per["n_distinct"].to_numpy(np.int64)
        distinct_ratio = np.where(n_tok > 0,
                                  (n_dis * 1_000_000) // np.maximum(n_tok, 1),
                                  0)
        bg_slots = np.maximum(n_tok - 1, 1)
        top_bg_frac = np.where(n_tok > 1,
                               (top_bg * 1_000_000) // bg_slots, 0)
        return pa.Table.from_pydict({
            "doc_id": ids,
            "n_tokens": n_tok,
            "distinct_ratio_x1e6": distinct_ratio.astype(np.int64),
            "top_bigram_cnt": top_bg,
            "top_bigram_frac_x1e6": top_bg_frac.astype(np.int64)})

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None) \
        .sort("doc_id")


REPETITION_SQL = r"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
u AS (SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS ord FROM t),
bg AS (SELECT doc_id,
              tok || ' ' || LEAD(tok) OVER (
                  PARTITION BY doc_id ORDER BY ord) AS bigram
       FROM u),
bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg
       WHERE bigram IS NOT NULL GROUP BY doc_id, bigram),
m AS (SELECT doc_id, MAX(c) AS top_bigram_cnt FROM bc GROUP BY doc_id),
d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
      FROM t)
SELECT d.doc_id, n_tokens,
       CASE WHEN n_tokens > 0 THEN (n_distinct * 1000000) // n_tokens
            ELSE 0 END AS distinct_ratio_x1e6,
       CAST(COALESCE(top_bigram_cnt, 0) AS BIGINT) AS top_bigram_cnt,
       CASE WHEN n_tokens > 1 THEN
            (CAST(COALESCE(top_bigram_cnt, 0) AS BIGINT) * 1000000)
                // (n_tokens - 1)
            ELSE 0 END AS top_bigram_frac_x1e6
FROM d LEFT JOIN m ON d.doc_id = m.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Token length histogram (corpus-wide)
# ---------------------------------------------------------------------------

def token_length_hist(sf_dir: str):
    """Corpus histogram of token lengths — partial bincounts per batch,
    tiny keyed Sum (the distribution snapshot a tokenizer-budget
    analysis reads)."""
    def partial(batch: pa.Table) -> pa.Table:
        _, flat = _doc_terms(batch)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        vc = np.bincount(lens)
        nz = np.nonzero(vc)[0]
        return pa.Table.from_pydict({
            "token_len": nz.astype(np.int64),
            "n": vc[nz].astype(np.int64)})

    return (_docs(sf_dir).map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("token_len").aggregate(Sum("n", alias_name="n"))
            .sort("token_len"))


TOKEN_LEN_HIST_SQL = r"""
SELECT CAST(length(tok) AS BIGINT) AS token_len,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
      FROM documents)
GROUP BY token_len
ORDER BY token_len
"""


# ---------------------------------------------------------------------------
# Blocklist redaction (the PII-scrub machinery on synthetic text)
# ---------------------------------------------------------------------------

# the redaction machinery is what matters (vectorized RE2 substitution +
# audit counts); on real data this pattern is emails/phones/SSNs — the
# synthetic corpus has none, so the blocklist targets terms it does have
REDACT_PATTERN = r"(spark|hash|customer)"
REDACT_TOKEN = "[REDACTED]"


def doc_redact(sf_dir: str):
    """Blocklist redaction with an audit trail: per doc, the number of
    redactions and the md5 of the redacted text (hash instead of the
    full text keeps the result driver-small; the full-text variant is
    the same kernel flowing to write_parquet)."""
    def fn(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        n_red = pc.cast(pc.count_substring_regex(text, REDACT_PATTERN),
                        pa.int64())
        red = pc.replace_substring_regex(text, REDACT_PATTERN, REDACT_TOKEN)
        md5 = pa.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                        for s in red.to_pylist()], type=pa.string())
        return pa.Table.from_arrays(
            [batch["doc_id"], n_red, md5],
            names=["doc_id", "n_redactions", "redacted_md5"])

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None) \
        .sort("doc_id")


REDACT_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(COALESCE(text, ''), '{REDACT_PATTERN}'))
            AS BIGINT) AS n_redactions,
       md5(regexp_replace(COALESCE(text, ''), '{REDACT_PATTERN}',
                          '{REDACT_TOKEN}', 'g')) AS redacted_md5
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Inverted index: term -> bounded posting list + document frequency
# ---------------------------------------------------------------------------

POSTINGS_K = 5


def corpus_inverted_index(sf_dir: str):
    """Term -> (df, first-K doc_ids ascending as CSV): the retrieval-side
    index build. Posting lists are BOUNDED (top-K head; full lists go to
    partitioned parquet in the write variant) so no single term row can
    blow a block. Doc-term pairs arrive pre-deduped from the tf stage."""
    def tf_partial(batch: pa.Table) -> pa.Table:
        doc_ids, flat = _doc_terms(batch)
        df = pd.DataFrame({"doc_id": doc_ids,
                           "term": flat.to_numpy(zero_copy_only=False)})
        g = df.drop_duplicates()
        return _from_pandas(g.astype({"doc_id": "int64"}))

    pairs = _docs(sf_dir).map_batches(tf_partial, batch_format="pyarrow", batch_size=None)

    def postings(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for term, sub in g.groupby("term"):
            ids = np.sort(sub["doc_id"].to_numpy())
            rows.append((term, np.int64(len(ids)),
                         ",".join(str(i) for i in ids[:POSTINGS_K])))
        return pd.DataFrame(rows, columns=["term", "df", "postings"]) \
            .astype({"df": "int64"})

    return _coarse_str_group(pairs, "term", postings).sort("term")


INVERTED_INDEX_SQL = rf"""
WITH pairs AS (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        FROM documents))
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       array_to_string((array_agg(doc_id ORDER BY doc_id))[1:{POSTINGS_K}],
                       ',') AS postings
FROM pairs
GROUP BY term
ORDER BY term
"""


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters (approximate tier of corpus_heavy_hitters)
# ---------------------------------------------------------------------------

def cms_token_counts(sf_dir: str):
    """Approximate corpus heavy hitters via Count-Min Sketch: each batch
    ships one fixed-size sketch plus its local top candidates; the merge
    sums sketches and unions candidates, then estimates each candidate's
    corpus count from the merged sketch. At 10^12 rows this moves
    (n_batches x 64 KiB) instead of a vocabulary-wide shuffle, at the
    cost of one-sided overestimates bounded by ~e/w of total tokens
    (tests/test_sketch.py bounds it against the exact counts)."""
    from ..functions import sketch as S

    def partial(batch: pa.Table) -> pa.Table:
        _, flat = _doc_terms(batch)
        toks = flat.to_numpy(zero_copy_only=False)
        vc = pd.Series(toks).value_counts()
        sk = S.cms_create()
        S.cms_add_hashes(sk, pd.util.hash_array(vc.index.to_numpy(str)),
                         vc.to_numpy(np.int64))
        cand = vc.index[:2 * HEAVY_HITTERS_K].astype(str)
        return pa.Table.from_pydict({
            "sketch": [sk.tobytes()],
            "candidates": [",".join(cand)],
            "n_tokens": [int(vc.sum())]})

    sk = S.cms_create()
    cands: set[str] = set()
    total_tokens = 0
    for b in _docs(sf_dir).map_batches(partial, batch_format="pyarrow", batch_size=None) \
                          .iter_batches(batch_format="pyarrow", batch_size=None):
        for raw, cs, nt in zip(b["sketch"].to_pylist(),
                               b["candidates"].to_pylist(),
                               b["n_tokens"].to_pylist()):
            sk = S.cms_merge(sk, np.frombuffer(raw, dtype=np.int64)
                             .reshape(S.CMS_D, S.CMS_W))
            cands.update(c for c in cs.split(",") if c)
            total_tokens += int(nt)

    cand = np.array(sorted(cands), dtype=object)
    est = S.cms_query(sk, pd.util.hash_array(cand.astype(str)))
    surfaced = set(pd.DataFrame({"token": cand.astype(str),
                                 "est_n": est})
                   .sort_values(["est_n", "token"],
                                ascending=[False, True])
                   .head(2 * HEAVY_HITTERS_K)["token"])

    # ORACLED form (round-5 sketch pattern): rows are the EXACT top-k
    # (same kernel as corpus_heavy_hitters); within_bound checks the
    # CMS guarantee per token (one-sided overestimate within ~2eN) AND
    # that the sketch path's candidate-estimated top-2k SURFACES every
    # exact heavy hitter — the property a planner relying on the
    # sketch needs. The SQL oracle recomputes the exact side.
    exact = corpus_heavy_hitters(sf_dir)
    exact = exact if isinstance(exact, pd.DataFrame) else exact.to_pandas()
    if exact.empty:
        return pd.DataFrame({"token": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64"),
                             "within_bound": pd.Series(dtype="int64")})
    e_tok = exact["token"].to_numpy(str)
    n = exact["n"].to_numpy(np.int64)
    e_est = S.cms_query(sk, pd.util.hash_array(e_tok))
    eps = int(np.e / S.CMS_W * max(int(total_tokens), 1)) + 1
    ok = (e_est >= n) & (e_est - n <= 2 * eps + 50) \
        & np.isin(e_tok, list(surfaced))
    return pd.DataFrame({"token": e_tok, "n": n,
                         "within_bound": ok.astype(np.int64)})


CMS_TOKEN_COUNTS_SQL = HEAVY_HITTERS_SQL.replace(
    "CAST(COUNT(*) AS BIGINT) AS n",
    "CAST(COUNT(*) AS BIGINT) AS n, CAST(1 AS BIGINT) AS within_bound")


# ---------------------------------------------------------------------------
# Deterministic stratified sampling + train/val/test hash split
# ---------------------------------------------------------------------------

STRATA_K = 10


def docs_stratified_sample(sf_dir: str):
    """K docs per language stratum, chosen by smallest md5(doc_id) —
    a reproducible pseudo-random stratified sample (same rows at any
    parallelism and on any engine, unlike random_sample). Per-stratum
    top-k via the coarse grouped map; only (doc_id, lang, md5) rows
    shuffle, never text."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])

    def add_md5(batch: pa.Table) -> pa.Table:
        md5 = pa.array([hashlib.md5(str(d).encode()).hexdigest()
                        for d in batch["doc_id"].to_pylist()],
                       type=pa.string())
        return batch.append_column("h", md5)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, sub in g.groupby("lang"):
            sub = sub.sort_values(["h", "doc_id"]).head(STRATA_K)
            outs.append(sub[["doc_id", "lang"]])
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()

    return _coarse_str_group(
        ds.map_batches(add_md5, batch_format="pyarrow", batch_size=None), "lang", topk) \
        .sort(["lang", "doc_id"])


STRATIFIED_SQL = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
             AS rn
  FROM documents)
WHERE rn <= {STRATA_K}
ORDER BY lang, doc_id
"""


def docs_train_split(sf_dir: str):
    """Deterministic train/val/test assignment from the last hex digit
    of md5(doc_id) — 12/2/2 of 16 — reported as per-split counts. The
    assignment is pure per-row compute (no shuffle); only the tiny
    count aggregate exchanges."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        last = np.array([hashlib.md5(str(d).encode()).hexdigest()[-1]
                         for d in batch["doc_id"].to_pylist()])
        split = np.where(last < "c", "train",
                         np.where(last < "e", "val", "test"))
        vc = pd.Series(split).value_counts()
        return _from_pandas(pd.DataFrame(
            {"split": vc.index.astype(str),
             "n_docs": vc.to_numpy(np.int64)}))

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("split").aggregate(Sum("n_docs", alias_name="n_docs"))
            .sort("split"))


TRAIN_SPLIT_SQL = """
SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) < 'c'
                 THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) < 'e'
                 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY split
ORDER BY split
"""


KFOLD_K = 5


def docs_kfold_assign(sf_dir: str):
    """Deterministic K-fold cross-validation assignment: fold =
    int(last md5 hex digit) mod K — reproducible at any parallelism and
    across engines (the eval-protocol counterpart of the train/val/test
    split). Pure per-row compute; only K count rows exchange."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        fold = np.array(
            [int(hashlib.md5(str(d).encode()).hexdigest()[-1], 16) % KFOLD_K
             for d in batch["doc_id"].to_pylist()], dtype=np.int64)
        vc = pd.Series(fold).value_counts()
        return _from_pandas(pd.DataFrame(
            {"fold": vc.index.to_numpy(np.int64),
             "n_docs": vc.to_numpy(np.int64)}))

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("fold").aggregate(Sum("n_docs", alias_name="n_docs"))
            .sort("fold"))


KFOLD_SQL = f"""
SELECT CAST((strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1)
            % {KFOLD_K} AS BIGINT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY fold
ORDER BY fold
"""


# ---------------------------------------------------------------------------
# Cross-corpus duplicate-block stats (substring-level dedup signal)
# ---------------------------------------------------------------------------

DUP_BLOCK_TOKENS = 20


def _block_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, blk_md5) per DUP_BLOCK_TOKENS-token block of one batch.

    Tokens arrive doc-major and in order, so blocks are contiguous runs:
    a block starts at every doc change and every DUP_BLOCK_TOKENS-th
    token within a doc. The per-block token lists come from run offsets
    and join with Arrow's vectorized binary_join (a 750k-group pandas
    string join measured ~6x slower at the stress tier)."""
    doc_ids, flat = _doc_terms(batch)
    if len(doc_ids) == 0:
        return pa.Table.from_pydict(
            {"doc_id": pa.array([], type=pa.int64()),
             "blk_ord": pa.array([], type=pa.int64()),
             "blk_md5": pa.array([], type=pa.string())})
    new_doc = np.empty(len(doc_ids), dtype=bool)
    new_doc[0] = True
    new_doc[1:] = doc_ids[1:] != doc_ids[:-1]
    ord_in_doc = np.arange(len(doc_ids), dtype=np.int64)
    ord_in_doc -= np.maximum.accumulate(
        np.where(new_doc, ord_in_doc, 0))
    starts = new_doc | (ord_in_doc % DUP_BLOCK_TOKENS == 0)
    offs = np.flatnonzero(starts)
    offsets = np.concatenate([offs, [len(doc_ids)]]).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offsets), flat)
    shingles = pc.binary_join(lists, " ")
    md5 = pa.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                    for s in shingles.to_pylist()], type=pa.string())
    return pa.Table.from_pydict(
        {"doc_id": doc_ids[offs],
         "blk_ord": ord_in_doc[offs] // DUP_BLOCK_TOKENS,
         "blk_md5": md5})


def doc_dup_block_stats(sf_dir: str):
    """Per-doc count of 20-token blocks that appear (verbatim) anywhere
    else in the corpus — the corpus-level 'duplicate lines' Gopher rule,
    and the cheap precursor to exact-substring dedup. Blocks travel as
    fixed-width md5 keys (never the text); the only exchanges are the
    md5-keyed duplicate count and the per-doc roll-up of (doc, is_dup)
    rows."""
    pairs = _docs(sf_dir).map_batches(_block_rows, batch_format="pyarrow", batch_size=None)

    def mark_dups(g: pd.DataFrame) -> pd.DataFrame:
        # all rows for one md5 land in one group: dup <=> group size > 1
        g = g.copy()
        g["is_dup"] = (g.groupby("blk_md5")["blk_md5"]
                       .transform("size") > 1).astype("int64")
        return g[["doc_id", "is_dup"]]

    marked = _coarse_str_group(pairs, "blk_md5", mark_dups)

    def roll(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "is_dup": batch["is_dup"].to_numpy(zero_copy_only=False)})
        g = df.groupby("doc_id", as_index=False).agg(
            n_blocks=("is_dup", "size"), dup_blocks=("is_dup", "sum"))
        return _from_pandas(g.astype("int64"))

    out = (marked.map_batches(roll, batch_format="pyarrow", batch_size=None)
           .groupby("doc_id")
           .aggregate(Sum("n_blocks", alias_name="n_blocks"),
                      Sum("dup_blocks", alias_name="dup_blocks")))

    def frac(batch: pa.Table) -> pa.Table:
        nb = batch["n_blocks"].to_numpy(zero_copy_only=False)
        db = batch["dup_blocks"].to_numpy(zero_copy_only=False)
        f = (db * 1_000_000) // np.maximum(nb, 1)
        return batch.append_column("dup_frac_x1e6",
                                   pa.array(f.astype(np.int64)))

    return out.map_batches(frac, batch_format="pyarrow", batch_size=None).sort("doc_id")


DUP_BLOCK_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
u AS (SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) - 1 AS ord FROM t),
b AS (SELECT doc_id, ord // {DUP_BLOCK_TOKENS} AS blk,
             md5(string_agg(tok, ' ' ORDER BY ord)) AS blk_md5
      FROM u GROUP BY doc_id, blk),
c AS (SELECT blk_md5, COUNT(*) AS n FROM b GROUP BY blk_md5)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(COUNT(*) FILTER (n > 1) AS BIGINT) AS dup_blocks,
       (CAST(COUNT(*) FILTER (n > 1) AS BIGINT) * 1000000)
           // GREATEST(COUNT(*), 1) AS dup_frac_x1e6
FROM b JOIN c USING (blk_md5)
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Exact-substring dedup REWRITE (block-level, keep-first)
# ---------------------------------------------------------------------------

def doc_dedup_blocks(sf_dir: str, n_coarse: int | None = None):
    """Block-level exact-substring dedup rewrite: every 20-token block
    that appears verbatim elsewhere in the corpus is DROPPED unless this
    occurrence is the corpus-wide first (minimal ``(doc_id, blk_ord)``)
    — the train-data transform of Lee et al. 2021 ("Deduplicating
    Training Data"), downstream of the ``doc_dup_block_stats`` signal.
    Output text is tokenization-normalized (lowercase, single-spaced),
    the form a block-level deduper emits.

    Scale shape: the wide md5-keyed exchange moves ONLY
    ``(blk_md5, doc_id, blk_ord)`` rows — never text — and only the
    DROPPED markers (a tiny fraction) re-join the documents through an
    int-keyed coarse exchange; the rebuild re-tokenizes each doc locally
    (a second read pass, same trade as ``doc_tfidf_top_terms``)."""
    if n_coarse is None:
        from ..functions.cluster import default_n_coarse
        n_coarse = default_n_coarse()
    pairs = _docs(sf_dir).map_batches(_block_rows, batch_format="pyarrow", batch_size=None)

    def drop_markers(g: pd.DataFrame) -> pd.DataFrame:
        # all rows of one md5 land in one coarse group: everything after
        # the lexicographic (doc_id, blk_ord) first is a drop
        g = g.sort_values(["blk_md5", "doc_id", "blk_ord"])
        dup = g.duplicated("blk_md5")
        return g.loc[dup, ["doc_id", "blk_ord"]].astype("int64")

    drops = _coarse_str_group(pairs, "blk_md5", drop_markers)

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array((ids % n_coarse).astype(np.int64)), batch["doc_id"],
             pa.array(np.full(len(batch), -1, dtype=np.int64)),
             batch["text"]],
            names=["_coarse", "doc_id", "blk_ord", "text"])

    def tag_drops(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array((ids % n_coarse).astype(np.int64)), batch["doc_id"],
             batch["blk_ord"],
             pa.array([""] * len(batch), type=pa.string())],
            names=["_coarse", "doc_id", "blk_ord", "text"])

    W = DUP_BLOCK_TOKENS

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["blk_ord"] < 0]
        dropset: dict[int, set] = {}
        for d, o in zip(g.loc[g["blk_ord"] >= 0, "doc_id"],
                        g.loc[g["blk_ord"] >= 0, "blk_ord"]):
            dropset.setdefault(int(d), set()).add(int(o))
        if docs.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "text_kept": pd.Series([], dtype="string"),
                "n_blocks": pd.Series([], dtype="int64"),
                "kept_blocks": pd.Series([], dtype="int64")})
        # the SAME tokenizer as the block stage (Arrow RE2), so the
        # rebuilt blocks match the hashed ones byte-for-byte
        toks_list = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pa.array(docs["text"].tolist(), type=pa.string()))),
            T.TOKEN_SPLIT_RE).to_pylist()
        out_id, out_txt, out_nb, out_kb = [], [], [], []
        for d, toks in zip(docs["doc_id"], toks_list):
            nb = (len(toks) + W - 1) // W
            dr = dropset.get(int(d), ())
            kept = [" ".join(toks[i * W:(i + 1) * W])
                    for i in range(nb) if i not in dr]
            out_id.append(int(d))
            out_txt.append(" ".join(kept))
            out_nb.append(nb)
            out_kb.append(nb - len(dr))
        return pd.DataFrame({
            "doc_id": pd.Series(out_id, dtype="int64"),
            "text_kept": pd.Series(out_txt, dtype="string"),
            "n_blocks": pd.Series(out_nb, dtype="int64"),
            "kept_blocks": pd.Series(out_kb, dtype="int64")})

    # no final sort: it would move every rebuilt TEXT through one more
    # all-to-all for ordering the comparison doesn't need (the driver's
    # value compare is order-insensitive; the int-only stats queries sort
    # because their exchange is cheap)
    return (_docs(sf_dir).map_batches(tag_docs, batch_format="pyarrow", batch_size=None)
            .union(drops.map_batches(tag_drops, batch_format="pyarrow", batch_size=None))
            .groupby("_coarse")
            .map_groups(rebuild, batch_format="pandas"))


DEDUP_BLOCKS_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
u AS (SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) - 1 AS ord FROM t),
b AS (SELECT doc_id, ord // {DUP_BLOCK_TOKENS} AS blk,
             md5(string_agg(tok, ' ' ORDER BY ord)) AS blk_md5,
             string_agg(tok, ' ' ORDER BY ord) AS blk_text
      FROM u GROUP BY doc_id, blk),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY blk_md5
                                   ORDER BY doc_id, blk) AS rn FROM b)
SELECT doc_id,
       COALESCE(string_agg(blk_text, ' ' ORDER BY blk) FILTER (rn = 1), '')
           AS text_kept,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(COUNT(*) FILTER (rn = 1) AS BIGINT) AS kept_blocks
FROM r GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Eval-set contamination check (decontamination primitive)
# ---------------------------------------------------------------------------

def eval_contamination(sf_dir: str):
    """For each eval-set document (the deterministic stratified sample),
    how many of its 20-token blocks also appear in ANY other corpus
    document — the exact form of the train/eval decontamination check.
    The corpus side flows as md5 block keys through the same coarse
    exchange as doc_dup_block_stats; the tiny eval id set broadcasts.
    (At extreme scale the corpus side drops to a Bloom pre-filter with
    exact verify on survivors — the orders_bloom_semi_count pattern.)"""
    import ray

    sample = docs_stratified_sample(sf_dir).to_pandas()
    # empty results legitimately lose their schema through to_pandas
    eval_ids = np.sort(sample["doc_id"].to_numpy(np.int64)) \
        if "doc_id" in sample.columns else np.empty(0, dtype=np.int64)
    eval_ref = ray.put(eval_ids)

    pairs = _docs(sf_dir).map_batches(_block_rows, batch_format="pyarrow", batch_size=None)

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        ev = ray.get(eval_ref)
        g = g.copy()
        nd = g.groupby("blk_md5")["doc_id"].transform("nunique")
        g["contaminated"] = (nd > 1).astype("int64")
        keep = np.isin(g["doc_id"].to_numpy(np.int64), ev)
        return g.loc[keep, ["doc_id", "contaminated"]]

    marked = _coarse_str_group(pairs, "blk_md5", mark)

    def roll(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "contaminated": batch["contaminated"]
            .to_numpy(zero_copy_only=False)})
        g = df.groupby("doc_id", as_index=False).agg(
            n_blocks=("contaminated", "size"),
            contaminated_blocks=("contaminated", "sum"))
        return _from_pandas(g.astype("int64"))

    return (marked.map_batches(roll, batch_format="pyarrow", batch_size=None)
            .groupby("doc_id")
            .aggregate(Sum("n_blocks", alias_name="n_blocks"),
                       Sum("contaminated_blocks",
                           alias_name="contaminated_blocks"))
            .sort("doc_id"))


CONTAMINATION_SQL = rf"""
WITH eval_set AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           ROW_NUMBER() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
    FROM documents)
  WHERE rn <= {STRATA_K}),
t AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS toks
  FROM documents),
u AS (SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) - 1 AS ord FROM t),
b AS (SELECT doc_id, ord // {DUP_BLOCK_TOKENS} AS blk,
             md5(string_agg(tok, ' ' ORDER BY ord)) AS blk_md5
      FROM u GROUP BY doc_id, blk),
c AS (SELECT blk_md5, COUNT(DISTINCT doc_id) AS nd FROM b GROUP BY blk_md5)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(COUNT(*) FILTER (c.nd > 1) AS BIGINT) AS contaminated_blocks
FROM b JOIN c USING (blk_md5)
WHERE b.doc_id IN (SELECT doc_id FROM eval_set)
GROUP BY b.doc_id
ORDER BY b.doc_id
"""


# ---------------------------------------------------------------------------
# Mixture (per-source weighted) sampling — the data-mixing primitive
# ---------------------------------------------------------------------------

# acceptance percentage per source; sources not listed use the default
MIXTURE_RATES = {"src0": 80, "src1": 40}
MIXTURE_DEFAULT_RATE = 20


def docs_mixture_sample(sf_dir: str):
    """Deterministic per-source weighted sampling (dataset mixing):
    accept a doc when ``md5(doc_id)``'s first 4 hex digits mod 100 fall
    under its source's rate. Reproducible at any parallelism and on any
    engine — no RNG state — and pure per-row compute: the only exchange
    is the per-source count aggregate reported alongside."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])

    def accept(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        src = batch["source"].to_numpy(zero_copy_only=False)
        bucket = np.array([int(hashlib.md5(str(d).encode())
                               .hexdigest()[:4], 16) % 100 for d in ids])
        rates = np.array([MIXTURE_RATES.get(s, MIXTURE_DEFAULT_RATE)
                          for s in src])
        return batch.filter(pa.array(bucket < rates))

    return ds.map_batches(accept, batch_format="pyarrow", batch_size=None).sort("doc_id")


def _mixture_sql() -> str:
    cases = " ".join(f"WHEN source = '{s}' THEN {r}"
                     for s, r in MIXTURE_RATES.items())
    return f"""
SELECT doc_id, source
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
        % 100
      < CASE {cases} ELSE {MIXTURE_DEFAULT_RATE} END
ORDER BY doc_id
"""


MIXTURE_SQL = _mixture_sql()


# ---------------------------------------------------------------------------
# Priority sampling (Duffield-Lund-Thorup weighted sample, exact oracle)
# ---------------------------------------------------------------------------

PRIORITY_SAMPLE_K = 50
_PRI_MULT = 2654435761          # Knuth multiplicative hash
_PRI_MOD = 4294967296           # 2^32


def doc_priority_sample(sf_dir: str):
    """Weighted sample of K documents by priority sampling: each doc
    gets priority q = w / u with weight w = n_chars and u = h/2^32 a
    deterministic per-doc uniform; the K largest-priority docs form an
    unbiased weighted sample (Duffield-Lund-Thorup) — the mixture-
    building sampler that upweights long documents without a shuffle.
    Every batch keeps its local top-K, the driver finishes on the
    bounded partials. The key uses ONLY IEEE-exact operations
    (integer hash, one multiply, one divide — no pow/log), so the
    DuckDB oracle reproduces the ordering bit-exactly."""
    k = PRIORITY_SAMPLE_K

    def partial(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        text = batch["text"].combine_chunks() \
            if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        w = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = (doc * _PRI_MULT) % _PRI_MOD + 1
        q = (w.astype(np.float64) * float(_PRI_MOD)) / h
        top = np.lexsort((doc, -q))[:k]
        return pa.Table.from_pydict({
            "doc_id": doc[top].astype(np.int64),
            "n_chars": w[top],
            "priority": q[top]})

    parts = _docs(sf_dir).map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .to_pandas()
    if parts.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_chars": pd.Series(dtype="int64"),
                             "priority": pd.Series(dtype="float64")})
    return parts.sort_values(["priority", "doc_id"],
                             ascending=[False, True]).head(k) \
        .reset_index(drop=True)


PRIORITY_SAMPLE_SQL = f"""
SELECT doc_id, n_chars, priority FROM (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
         (CAST(length(text) AS DOUBLE) * {_PRI_MOD}.0)
           / ((doc_id * {_PRI_MULT}) % {_PRI_MOD} + 1) AS priority
  FROM documents) t
ORDER BY priority DESC, doc_id
LIMIT {PRIORITY_SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Corpus bigrams: top-k adjacent token pairs (collocation counts)
# ---------------------------------------------------------------------------

BIGRAM_K = 20


def corpus_bigrams(sf_dir: str):
    """Exact corpus-wide top-k adjacent token pairs — the collocation /
    phrase statistic a BPE-style vocab builder computes before picking
    merges. Bigram construction is batch-local Arrow (two offset slices
    + one ``binary_join_element_wise``; cross-document pairs masked by
    parent-id equality); the shuffle moves per-batch partial
    (bigram, n) counts only. Ties break on the bigram text, so the
    result is deterministic at any parallelism."""
    empty = pa.Table.from_arrays(
        [pa.array([], pa.string()), pa.array([], pa.int64())],
        names=["bigram", "n"])

    def partial(batch: pa.Table) -> pa.Table:
        d, flat = _doc_terms(batch)
        if len(flat) < 2:
            return empty
        left = flat.slice(0, len(flat) - 1)
        right = flat.slice(1, len(flat) - 1)
        joined = pc.binary_join_element_wise(left, right, " ")
        vc = pc.value_counts(joined.filter(pa.array(d[:-1] == d[1:])))
        return pa.Table.from_arrays(
            [vc.field("values"), pc.cast(vc.field("counts"), pa.int64())],
            names=["bigram", "n"]).replace_schema_metadata(None)

    return (_docs(sf_dir)
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("bigram").aggregate(Sum("n", alias_name="n"))
            .sort(["n", "bigram"], descending=[True, False])
            .limit(BIGRAM_K))


BIGRAMS_SQL = rf"""
WITH toks AS (
  SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS l
  FROM documents),
pairs AS (
  SELECT l[i.g] || ' ' || l[i.g + 1] AS bigram
  FROM toks, UNNEST(generate_series(1, len(l) - 1)) AS i(g))
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT {BIGRAM_K}
"""


# ---------------------------------------------------------------------------
# Per-group deterministic sample (k docs per language by hash order)
# ---------------------------------------------------------------------------

GROUP_SAMPLE_K = 3


def docs_group_sample(sf_dir: str):
    """Deterministic k-per-group sample: the first ``GROUP_SAMPLE_K``
    docs per language in md5(doc_id) order — the inspect-a-few-per-
    stratum op run before shipping a filtered corpus. Same zero-exchange
    group-wise top-k shape as ``segment_top_orders``: every batch keeps
    only its local top-k per language (bounded group domain), the
    driver finishes on the <= k*|langs|*|blocks| partial set."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        df = pd.DataFrame({
            "lang": batch["lang"].to_numpy(zero_copy_only=False),
            "doc_id": np.asarray(ids, dtype=np.int64),
            "h": [hashlib.md5(str(d).encode()).hexdigest() for d in ids]})
        top = df.sort_values(["h", "doc_id"]) \
            .groupby("lang").head(GROUP_SAMPLE_K)
        return _from_pandas(top)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if parts.empty:
        return pd.DataFrame({"lang": pd.Series(dtype="object"),
                             "doc_id": pd.Series(dtype="int64")})
    out = parts.sort_values(["h", "doc_id"]) \
        .groupby("lang").head(GROUP_SAMPLE_K)[["lang", "doc_id"]]
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True) \
        .astype({"doc_id": "int64"})


GROUP_SAMPLE_SQL = f"""
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
             PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents) t
WHERE rn <= {GROUP_SAMPLE_K}
ORDER BY lang, doc_id
"""


# ---------------------------------------------------------------------------
# BPE vocabulary learning (iterative merges over the word-count table)
# ---------------------------------------------------------------------------

BPE_N_MERGES = 24
BPE_MIN_PAIR = 2          # stop early when the best pair occurs once


def corpus_bpe_merges(sf_dir: str, n_merges: int = BPE_N_MERGES):
    """Distributed byte-pair-encoding vocabulary learning (Sennrich
    BPE): ONE corpus-wide exchange builds the word-frequency table —
    after that every merge round runs over the vocab-bounded (word,
    count) table only, never re-touching the corpus. Each round is a
    per-batch adjacent-pair partial count + a small two-key groupby to
    pick the global best pair (ties break (count desc, left, right) so
    the merge sequence is deterministic at any parallelism), then a
    map_batches rewrite applying just that merge; the table is
    re-materialized per round to keep the lineage chain flat. The
    per-word python loop is bounded by vocabulary size, the same
    bounded-table class as the k-means centroid and IVF label updates
    (it never sees corpus rows). Differential-tested against the pure
    reference learner in ``functions/bpe.py``.
    """
    from ..functions import bpe as B

    empty = pd.DataFrame({"rank": pd.Series(dtype="int64"),
                          "left": pd.Series(dtype="object"),
                          "right": pd.Series(dtype="object"),
                          "merged": pd.Series(dtype="object"),
                          "pair_count": pd.Series(dtype="int64")})

    def symbolize(batch: pa.Table) -> pa.Table:
        words = batch["token"].to_pylist()
        return pa.table({
            "syms": pa.array([list(B.word_symbols(w)) for w in words],
                             type=pa.list_(pa.string())),
            "n": batch["n"]})

    # compact the vocab-bounded table into a handful of blocks once:
    # each merge round then schedules O(4) tasks instead of one per
    # corpus read shard (at larger vocabularies, raise with vocab size)
    words = _token_counts(sf_dir) \
        .map_batches(symbolize, batch_format="pyarrow", batch_size=None) \
        .repartition(4).materialize()

    def pair_partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple, int] = {}
        ns = batch["n"].to_numpy(zero_copy_only=False)
        for syms, n in zip(batch["syms"].to_pylist(), ns):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + int(n)
        if not counts:
            return pa.table({"left": pa.array([], type=pa.string()),
                             "right": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        l, r = zip(*counts.keys())
        return pa.table({"left": pa.array(l), "right": pa.array(r),
                         "cnt": pa.array(list(counts.values()),
                                         type=pa.int64())})

    merges = []
    for rank in range(n_merges):
        top = (words.map_batches(pair_partial, batch_format="pyarrow",
                                 batch_size=None)
               .groupby(["left", "right"])
               .aggregate(Sum("cnt", alias_name="cnt"))
               .sort(["cnt", "left", "right"],
                     descending=[True, False, False])
               .limit(1).take_all())
        if not top or top[0]["cnt"] < BPE_MIN_PAIR:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["cnt"]
        merges.append({"rank": rank, "left": left, "right": right,
                       "merged": left + right, "pair_count": int(cnt)})

        def apply_merge(batch: pa.Table, _l=left, _r=right) -> pa.Table:
            out = [list(B.merge_word(tuple(s), _l, _r))
                   for s in batch["syms"].to_pylist()]
            return pa.table({
                "syms": pa.array(out, type=pa.list_(pa.string())),
                "n": batch["n"]})

        words = words.map_batches(apply_merge, batch_format="pyarrow",
                                  batch_size=None).materialize()

    return pd.DataFrame(merges) if merges else empty


def corpus_bpe_token_stats(sf_dir: str):
    """Apply the learned BPE merge sequence to every document: per-doc
    whitespace word count and post-BPE subword count. The merge list is
    broadcast once (``ray.put``, bounded by BPE_N_MERGES); each batch
    encodes only its UNIQUE words (memoized per batch), so the python
    cost is per distinct word, not per token instance."""
    import ray as _ray
    from ..functions import bpe as B

    merge_rows = corpus_bpe_merges(sf_dir)
    merges = [(r.left, r.right) for r in merge_rows.itertuples()]
    merges_ref = _ray.put(merges)

    def encode(batch: pa.Table) -> pa.Table:
        ms = _ray.get(merges_ref)
        doc_ids, flat = _doc_terms(batch)
        toks = flat.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(toks, return_inverse=True)
        lens = np.array([len(B.encode_word(w, ms)) for w in uniq],
                        dtype=np.int64)
        per_tok = lens[inv]
        df = pd.DataFrame({"doc_id": doc_ids, "n": per_tok})
        a = df.groupby("doc_id").agg(n_words=("n", "size"),
                                     n_bpe_tokens=("n", "sum"))
        return pa.Table.from_pandas(a.reset_index(), preserve_index=False) \
            .replace_schema_metadata(None)

    return (_docs(sf_dir)
            .map_batches(encode, batch_format="pyarrow", batch_size=None)
            .groupby("doc_id")
            .aggregate(Sum("n_words", alias_name="n_words"),
                       Sum("n_bpe_tokens", alias_name="n_bpe_tokens"))
            .sort("doc_id"))


# ---------------------------------------------------------------------------
# Bigram PMI components: collocation strength via count joins
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 3


def corpus_bigram_pmi(sf_dir: str):
    """PMI components for every corpus bigram seen >= PMI_MIN_COUNT
    times: (w1, w2, n_xy, n_w1, n_w2, n_tokens) — everything needed for
    pmi = ln(n_xy * N / (n_w1 * n_w2)), kept as exact integers so the
    oracle is bit-free of float-log ordering. Three distributed count
    aggregations plus TWO string-keyed join exchanges (bigram side
    tagged and unioned with the unigram table, once per endpoint) — the
    unigram vocabulary is never broadcast or materialized driver-side."""
    empty = pd.DataFrame({
        "w1": pd.Series(dtype="object"), "w2": pd.Series(dtype="object"),
        **{c: pd.Series(dtype="int64") for c in
           ("n_xy", "n_w1", "n_w2", "n_tokens")}})

    docs = _docs(sf_dir)

    def uni_partial(batch: pa.Table) -> pa.Table:
        _, flat = _doc_terms(batch)
        vc = pc.value_counts(flat)
        return pa.Table.from_arrays(
            [vc.field("values"), pc.cast(vc.field("counts"), pa.int64())],
            names=["term", "cnt"]).replace_schema_metadata(None)

    from .relational import _coarse_str_partition_map

    def uni_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("term", as_index=False)["cnt"].sum() \
            .astype({"cnt": "int64"})

    # coarse exchanges, not per-key Ray aggregates: one reduce group
    # per term/bigram is pure scheduler overhead at vocab cardinality
    # (same fix as the basket join's freq stage)
    uni = _coarse_str_partition_map(
        docs.map_batches(uni_partial, batch_format="pyarrow",
                         batch_size=None),
        "term", uni_sum).materialize()
    n_tokens = int(uni.sum("cnt") or 0)
    if n_tokens == 0:
        return empty

    def bg_partial(batch: pa.Table) -> pa.Table:
        d, flat = _doc_terms(batch)
        if len(flat) < 2:
            return pa.Table.from_pydict(
                {"w1": pa.array([], pa.string()),
                 "w2": pa.array([], pa.string()),
                 "n_xy": pa.array([], pa.int64())})
        keep = pa.array(d[:-1] == d[1:])
        df = pd.DataFrame({
            "w1": flat.slice(0, len(flat) - 1).filter(keep).to_pandas(),
            "w2": flat.slice(1, len(flat) - 1).filter(keep).to_pandas()})
        g = df.groupby(["w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "n_xy"})
        return _from_pandas(g.astype({"n_xy": "int64"}))

    def bg_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["w1", "w2"], as_index=False)["n_xy"].sum()
        # w1-keyed partitions hold every instance of a (w1, w2) pair,
        # so the >= PMI_MIN_COUNT threshold is exact here
        return s[s["n_xy"] >= PMI_MIN_COUNT].astype({"n_xy": "int64"})

    bg = _coarse_str_partition_map(
        docs.map_batches(bg_partial, batch_format="pyarrow",
                         batch_size=None),
        "w1", bg_sum).materialize()

    def attach(endpoint: str, count_col: str):
        """Per-partition join resolve: unigram rows (side 0) + bigram
        rows (side 1) arrive co-partitioned on the endpoint term."""
        def resolve(g: pd.DataFrame) -> pd.DataFrame:
            m = g[g["side"] == 0].set_index("term")["cnt"]
            b = g[g["side"] == 1]
            out = pd.DataFrame({
                "term": b["term"], "other": b["other"],
                "n_xy": b["n_xy"].astype("int64"),
                "carry": b["carry"],
                count_col: b["term"].map(m).astype("int64")})
            return out

        return resolve

    u0 = uni.map_batches(lambda b: pa.Table.from_arrays(
        [b["term"], pa.nulls(b.num_rows, pa.string()),
         pa.nulls(b.num_rows, pa.int64()), pa.nulls(b.num_rows, pa.int64()),
         b["cnt"], pa.array(np.zeros(b.num_rows, dtype=np.int64))],
        names=["term", "other", "n_xy", "carry", "cnt", "side"]),
        batch_format="pyarrow", batch_size=None)
    b1 = bg.map_batches(lambda b: pa.Table.from_arrays(
        [b["w1"], b["w2"], b["n_xy"], pa.nulls(b.num_rows, pa.int64()),
         pa.nulls(b.num_rows, pa.int64()),
         pa.array(np.ones(b.num_rows, dtype=np.int64))],
        names=["term", "other", "n_xy", "carry", "cnt", "side"]),
        batch_format="pyarrow", batch_size=None)
    j1 = _coarse_str_group(u0.union(b1), "term", attach("w1", "n_w1"))

    # second exchange: re-key on w2 ("other"), carry n_w1 through
    b2 = j1.map_batches(lambda b: pa.Table.from_arrays(
        [b["other"], b["term"], b["n_xy"], b["n_w1"],
         pa.nulls(b.num_rows, pa.int64()),
         pa.array(np.ones(b.num_rows, dtype=np.int64))],
        names=["term", "other", "n_xy", "carry", "cnt", "side"]),
        batch_format="pyarrow", batch_size=None)
    j2 = _coarse_str_group(u0.union(b2), "term",
                           attach("w2", "n_w2")).to_pandas()
    if j2.empty or "term" not in j2.columns:
        return empty
    out = pd.DataFrame({
        "w1": j2["other"], "w2": j2["term"],
        "n_xy": j2["n_xy"].astype("int64"),
        "n_w1": j2["carry"].astype("int64"),
        "n_w2": j2["n_w2"].astype("int64"),
        "n_tokens": np.int64(n_tokens)})
    return out.sort_values(["w1", "w2"]).reset_index(drop=True)


BIGRAM_PMI_SQL = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS l
  FROM documents),
uni AS (
  SELECT t.tok AS term, COUNT(*) AS n
  FROM toks, UNNEST(l) AS t(tok) GROUP BY term),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tokens FROM uni),
pairs AS (
  SELECT l[i.g] AS w1, l[i.g + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(l) - 1)) AS i(g)),
bg AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_xy
  FROM pairs GROUP BY w1, w2
  HAVING COUNT(*) >= {PMI_MIN_COUNT})
SELECT bg.w1, bg.w2, bg.n_xy,
       CAST(u1.n AS BIGINT) AS n_w1, CAST(u2.n AS BIGINT) AS n_w2,
       tot.n_tokens
FROM bg
JOIN uni u1 ON u1.term = bg.w1
JOIN uni u2 ON u2.term = bg.w2, tot
ORDER BY bg.w1, bg.w2
"""


# ---------------------------------------------------------------------------
# TextRank keyword extraction (PageRank over the co-occurrence graph)
# ---------------------------------------------------------------------------

TEXTRANK_K = 20
TEXTRANK_MIN_COOC = 2        # prune: vocabulary graph stays output-shaped
TEXTRANK_MIN_LEN = 3         # keyword candidates: alphabetic, len >= 3
TEXTRANK_DAMPING = 0.85
TEXTRANK_ITERS = 30


def _textrank_edges(sf_dir: str) -> pd.DataFrame:
    """Pruned undirected co-occurrence edge list (w1 < w2, weight) from
    ADJACENT candidate tokens within each doc. Edge construction is
    batch-local Arrow (the bigram kernel + candidate mask); the shuffle
    moves per-batch (edge, n) partials keyed by the joined edge string,
    and the prune keeps the collected graph vocabulary-shaped."""
    empty = pa.Table.from_arrays(
        [pa.array([], pa.string()), pa.array([], pa.int64())],
        names=["edge", "n"])

    def partial(batch: pa.Table) -> pa.Table:
        d, flat = _doc_terms(batch)
        if len(flat) < 2:
            return empty
        ok = pc.and_(pc.utf8_is_alpha(flat),
                     pc.greater_equal(pc.utf8_length(flat),
                                      TEXTRANK_MIN_LEN)) \
            .to_numpy(zero_copy_only=False)
        left = flat.slice(0, len(flat) - 1)
        right = flat.slice(1, len(flat) - 1)
        keep = ok[:-1] & ok[1:] & (d[:-1] == d[1:])
        # undirected: join in lexicographic order so (a,b) == (b,a)
        lo = pc.min_element_wise(left, right)
        hi = pc.max_element_wise(left, right)
        joined = pc.binary_join_element_wise(lo, hi, " ") \
            .filter(pa.array(keep))
        vc = pc.value_counts(joined)
        return pa.Table.from_arrays(
            [vc.field("values"), pc.cast(vc.field("counts"), pa.int64())],
            names=["edge", "n"]).replace_schema_metadata(None)

    agg = (_docs(sf_dir)
           .map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby("edge").aggregate(Sum("n", alias_name="n"))
           .map_batches(lambda t: t.filter(
               pc.greater_equal(t["n"], TEXTRANK_MIN_COOC)),
               batch_format="pyarrow", batch_size=None))
    df = agg.to_pandas()
    if df.empty:
        return pd.DataFrame({"w1": pd.Series(dtype="object"),
                             "w2": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64")})
    ws = df["edge"].str.split(" ", n=1, expand=True)
    return pd.DataFrame({"w1": ws[0], "w2": ws[1],
                         "n": df["n"].astype("int64")})


def textrank_scores(edges: pd.DataFrame) -> pd.DataFrame:
    """Weighted PageRank over an undirected (w1, w2, n) edge list —
    numpy power iteration with the classic TextRank update
    r_i = (1-d) + d * sum_j (w_ij / wdeg_j) * r_j, init 1.0, fixed
    iteration count (deterministic; no convergence test). Runs on the
    PRUNED vocabulary graph (output-shaped); past ~1M vocab terms the
    distributed PageRank of pipelines/graph.py is the same update over
    string-keyed exchanges."""
    terms = pd.Index(sorted(set(edges.w1) | set(edges.w2)))
    idx = {t: i for i, t in enumerate(terms)}
    src = np.array([idx[t] for t in edges.w1], dtype=np.int64)
    dst = np.array([idx[t] for t in edges.w2], dtype=np.int64)
    w = edges.n.to_numpy(np.float64)
    n = len(terms)
    wdeg = np.zeros(n)
    np.add.at(wdeg, src, w)
    np.add.at(wdeg, dst, w)
    r = np.ones(n)
    for _ in range(TEXTRANK_ITERS):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, w * r[src] / wdeg[src])
        np.add.at(contrib, src, w * r[dst] / wdeg[dst])
        r = (1.0 - TEXTRANK_DAMPING) + TEXTRANK_DAMPING * contrib
    return pd.DataFrame({"term": terms, "score": r})


def corpus_textrank_keywords(sf_dir: str):
    """TextRank keyword extraction: PageRank over the corpus-wide
    adjacent-token co-occurrence graph (candidates: alphabetic tokens,
    len >= {TEXTRANK_MIN_LEN}; edges pruned below {TEXTRANK_MIN_COOC}
    co-occurrences), top-{TEXTRANK_K} terms by (score desc, term asc).
    Not SQL-expressible (iterative); differential-tested against a
    pure-python reference over the same edge list.
    Output: (term, score)."""
    edges = _textrank_edges(sf_dir)
    if edges.empty:
        return pd.DataFrame({"term": pd.Series(dtype="object"),
                             "score": pd.Series(dtype="float64")})
    # canonical edge order: float accumulation order is fixed, so the
    # scores are bit-identical at any parallelism
    edges = edges.sort_values(["w1", "w2"]).reset_index(drop=True)
    scores = textrank_scores(edges)
    return scores.sort_values(["score", "term"],
                              ascending=[False, True]) \
        .head(TEXTRANK_K).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Tokenized phrase search
# ---------------------------------------------------------------------------

PHRASE = "the data"          # two-token phrase under the shared tokenizer
PHRASE_TOPK = 20


def corpus_phrase_search(sf_dir: str):
    """Exact tokenized phrase search: documents whose token stream
    contains the adjacent pair {PHRASE!r}, ranked by occurrence count
    (doc_id tie-break) — the retrieval primitive an inverted index
    accelerates, here as the zero-exchange scan form: a document's
    tokens live inside its own batch row, so phrase counting is one
    batch-local Arrow bigram equality; only (doc_id, n) survivors move.
    Output: (doc_id, n_hits)."""
    w1, w2 = PHRASE.split(" ")
    empty = pa.Table.from_arrays(
        [pa.array([], pa.int64()), pa.array([], pa.int64())],
        names=["doc_id", "n_hits"])

    def partial(batch: pa.Table) -> pa.Table:
        d, flat = _doc_terms(batch)
        if len(flat) < 2:
            return empty
        left = flat.slice(0, len(flat) - 1)
        right = flat.slice(1, len(flat) - 1)
        hit = pc.and_(pc.and_(pc.equal(left, w1), pc.equal(right, w2)),
                      pa.array(d[:-1] == d[1:])) \
            .to_numpy(zero_copy_only=False)
        if not hit.any():
            return empty
        df = pd.DataFrame({"doc_id": d[:-1][hit]}) \
            .groupby("doc_id", as_index=False).size() \
            .rename(columns={"size": "n_hits"}).astype("int64")
        return _from_pandas(df)

    out = (_docs(sf_dir)
           .map_batches(partial, batch_format="pyarrow", batch_size=None)
           .sort(["n_hits", "doc_id"], descending=[True, False])
           .limit(PHRASE_TOPK)).to_pandas()
    if out.empty:           # schema survives an all-empty result
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_hits": pd.Series(dtype="int64")})
    return out


PHRASE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS l
  FROM documents),
hits AS (
  SELECT doc_id, COUNT(*) AS n_hits
  FROM toks, UNNEST(generate_series(1, len(l) - 1)) AS i(g)
  WHERE l[i.g] = '{PHRASE.split(" ")[0]}'
    AND l[i.g + 1] = '{PHRASE.split(" ")[1]}'
  GROUP BY doc_id)
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits
FROM hits
ORDER BY n_hits DESC, doc_id
LIMIT {PHRASE_TOPK}
"""


# ---------------------------------------------------------------------------
# Count-based word embeddings (co-occurrence -> PPMI -> eigenvectors)
# ---------------------------------------------------------------------------

EMB_VOCAB = 64        # top-V terms get vectors
EMB_WINDOW = 2        # symmetric co-occurrence window
EMB_DIMS = 2          # leading eigenvector components emitted


def corpus_word_embeddings(sf_dir: str):
    """Train count-based word embeddings FROM SCRATCH, distributed:
    (1) top-{EMB_VOCAB} vocabulary by frequency (exact, one token-count
    exchange); (2) symmetric window-{EMB_WINDOW} co-occurrence counts
    accumulated as a dense V x V int64 matrix through ONE tree-reduced
    `Dataset.aggregate` (the 32 KB accumulator replaces a pair-key
    shuffle); (3) PPMI transform + top-{EMB_DIMS} eigenvectors of the
    symmetric matrix driver-side (V-bounded) — the classic
    counts->PPMI->SVD embedding pipeline (Levy & Goldberg 2014) in
    miniature. Sign convention: each component's largest-|x| entry is
    positive. Deterministic; rows-only checked (PPMI's log is not
    oracle-exact), unit-tested on planted co-occurrence structure.
    Output: (term, dim0_x1e6, dim1_x1e6) as scaled ints."""
    import ray
    from ray.data.aggregate import AggregateFn
    empty = pd.DataFrame({"term": pd.Series(dtype="object"),
                          "dim0_x1e6": pd.Series(dtype="int64"),
                          "dim1_x1e6": pd.Series(dtype="int64")})
    # exact top-V vocabulary via the token-count exchange
    vocab_df = (_token_counts(sf_dir)
                .sort(["n", "token"], descending=[True, False])
                .limit(EMB_VOCAB).to_pandas())
    if vocab_df.empty:
        return empty
    terms = vocab_df["token"].tolist()
    index = {t: i for i, t in enumerate(terms)}
    v = len(terms)
    idx_ref = ray.put(index)

    def acc_block(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        if block.num_rows == 0:
            return acc
        ix = ray.get(idx_ref)
        # one flat token stream with an out-of-vocab separator between
        # docs (maps to -1), so windows never straddle a doc boundary
        # and the whole block vectorizes through one Series.map
        texts = block["text"].to_pylist()
        words = " \x00 ".join(t.lower() for t in texts).split()
        ids = pd.Series(words).map(ix).fillna(-1) \
            .to_numpy(np.int64)
        for off in range(1, EMB_WINDOW + 1):
            a, b = ids[:-off], ids[off:]
            m = (a >= 0) & (b >= 0)
            if not m.any():
                continue
            acc += np.bincount(a[m] * v + b[m], minlength=v * v)
            acc += np.bincount(b[m] * v + a[m], minlength=v * v)
        return acc

    fn = AggregateFn(init=lambda _k: np.zeros(v * v, np.int64),
                     merge=lambda x, y: x + y,
                     accumulate_block=acc_block, name="cooc")
    cooc = _docs(sf_dir).aggregate(fn)["cooc"].reshape(v, v) \
        .astype(np.float64)
    total = cooc.sum()
    if total == 0:
        return empty
    r = cooc.sum(axis=1, keepdims=True)
    c = cooc.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log(cooc * total / np.maximum(r * c, 1.0))
    ppmi = np.where((cooc > 0) & (pmi > 0), pmi, 0.0)
    w_, vec = np.linalg.eigh(ppmi)          # ascending eigenvalues
    comps = vec[:, ::-1][:, :EMB_DIMS] * np.sqrt(
        np.maximum(w_[::-1][:EMB_DIMS], 0.0))
    for j in range(comps.shape[1]):         # deterministic sign
        k = int(np.argmax(np.abs(comps[:, j])))
        if comps[k, j] < 0:
            comps[:, j] = -comps[:, j]
    return pd.DataFrame({
        "term": terms,
        "dim0_x1e6": np.round(comps[:, 0] * 1e6).astype(np.int64),
        "dim1_x1e6": np.round(comps[:, 1] * 1e6).astype(np.int64)}) \
        .sort_values("term").reset_index(drop=True)


ZIPF_TOP = 200        # fit over the top-K tokens


def corpus_zipf_fit(sf_dir: str):
    """Zipf power-law fit of the token frequency distribution: OLS of
    log(freq) on log(rank) over the top-{ZIPF_TOP} tokens — slope near
    -1 is the natural-language signature, a flat slope exposes
    synthetic/templated text (a corpus-forensics gate). The
    distributed piece is the exact token-count exchange; the log-log
    regression runs on the K-bounded head. Rows-only (logs are not
    oracle-exact); deterministic tie-break by token.
    Output: (n_tokens_fit, slope_x1e6, intercept_x1e6, r2_x1e6)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("n_tokens_fit", "slope_x1e6",
                           "intercept_x1e6", "r2_x1e6")})
    head = (_token_counts(sf_dir)
            .sort(["n", "token"], descending=[True, False])
            .limit(ZIPF_TOP).to_pandas())
    if len(head) < 3:
        return empty
    f = head["n"].to_numpy(np.float64)
    x = np.log(np.arange(1, len(f) + 1, dtype=np.float64))
    y = np.log(f)
    n = len(f)
    sx, sy = x.sum(), y.sum()
    sxx, sxy, syy = (x * x).sum(), (x * y).sum(), (y * y).sum()
    dx = n * sxx - sx * sx
    if dx == 0:
        return empty
    slope = (n * sxy - sx * sy) / dx
    intercept = (sy - slope * sx) / n
    dy = n * syy - sy * sy
    r2 = ((n * sxy - sx * sy) ** 2) / (dx * dy) if dy else 0.0
    return pd.DataFrame({
        "n_tokens_fit": [np.int64(n)],
        "slope_x1e6": [np.int64(round(slope * 1e6))],
        "intercept_x1e6": [np.int64(round(intercept * 1e6))],
        "r2_x1e6": [np.int64(round(r2 * 1e6))]})


# ---------------------------------------------------------------------------
# DSIR-style importance selection (hashed-feature domain matching)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256      # md5-prefix hashed feature space. DSIR (Xie et
                        # al. 2023) uses ~10k hashed n-gram buckets; 256
                        # two-hex-char buckets keep the DuckDB oracle
                        # bit-exact and the lift table broadcast-trivial.
DSIR_TARGET_LANG = "en"
DSIR_TOP_K = 50


def _dsir_buckets(batch: pa.Table):
    """Flat (bucket_idx int array, parent doc idx) for one batch — the
    oracle's tokenization (lower/trim/``\\s+``, empty tokens dropped),
    bucketed by the first two hex chars of each token's md5 (the md5
    runs once per UNIQUE token per batch: vocabulary-bounded python)."""
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = as_array(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(
            pc.fill_null(text, ""))), T.TOKEN_SPLIT_RE))
    flat = as_array(pc.list_flatten(toks))
    parent = as_array(pc.list_parent_indices(toks)) \
        .to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat_np = flat.to_numpy(zero_copy_only=False)[nonempty]
    parent = parent[nonempty]
    if len(flat_np) == 0:
        return np.zeros(0, dtype=np.int64), parent
    uniq, inv = np.unique(flat_np, return_inverse=True)
    bk = np.fromiter(
        (int(hashlib.md5(str(t).encode("utf-8")).hexdigest()[:2], 16)
         for t in uniq), dtype=np.int64, count=len(uniq))
    return bk[inv], parent


def corpus_dsir_selection(sf_dir: str):
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every candidate
    document in the raw pool (lang != DSIR_TARGET_LANG) by how much its
    hashed token-feature distribution resembles the TARGET domain
    (lang == DSIR_TARGET_LANG), and keep the top-DSIR_TOP_K.

    Log-free integer-exact formulation (this engine's keyness idiom, so
    the oracle hashes bit-exact): per bucket b,
    ``lift_x1e6 = (ct+1)(Nr+B) * 1e6 // ((cr+1)(Nt+B))`` — the
    add-one-smoothed target/raw frequency ratio in fixed point (DSIR's
    per-feature log-ratio as a monotone ratio instead of a log); doc
    weight = floor-mean lift over the doc's token occurrences.

    Scale shape: pass 1 pre-aggregates (bucket, ct, cr) per batch and
    exchanges B-bounded partials (the driver only ever holds 256 rows);
    the lift table broadcasts via ``ray.put``; pass 2 is one
    embarrassingly-parallel scoring pass plus a distributed
    (weight desc, doc_id) sort-limit. No token instance ever shuffles.
    Output: (doc_id, n_tokens, weight_x1e6, sel_rank)."""
    import ray

    B = DSIR_BUCKETS
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("doc_id", "n_tokens", "weight_x1e6",
                           "sel_rank")})
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])

    def part(batch: pa.Table) -> pa.Table:
        bk, parent = _dsir_buckets(batch)
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        tl = lang[parent] if len(parent) else lang[:0]
        is_t = tl == DSIR_TARGET_LANG
        is_r = (tl != DSIR_TARGET_LANG) & pd.notna(tl)
        ct = np.bincount(bk[is_t], minlength=B)
        cr = np.bincount(bk[is_r], minlength=B)
        nz = np.nonzero(ct | cr)[0]
        return pa.Table.from_pydict({
            "bucket": nz.astype(np.int64),
            "ct": ct[nz].astype(np.int64),
            "cr": cr[nz].astype(np.int64)})

    counts = (ds.map_batches(part, batch_format="pyarrow",
                             batch_size=None)
              .groupby("bucket")
              .aggregate(Sum("ct", alias_name="ct"),
                         Sum("cr", alias_name="cr"))
              .to_pandas())               # <= 256 rows by construction
    if counts.empty or int(counts["cr"].sum()) == 0:
        return empty
    nt, nr = int(counts["ct"].sum()), int(counts["cr"].sum())
    lift = np.zeros(B, dtype=np.int64)
    for b, ct, cr in counts[["bucket", "ct", "cr"]].itertuples(index=False):
        # python ints: (ct+1)(Nr+B)*1e6 overflows int64 at web scale
        lift[int(b)] = (int(ct) + 1) * (nr + B) * 1_000_000 \
            // ((int(cr) + 1) * (nt + B))
    lift_ref = ray.put(lift)

    def score(batch: pa.Table) -> pa.Table:
        lf = ray.get(lift_ref)
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        raw = pa.array((lang != DSIR_TARGET_LANG) & pd.notna(lang))
        batch = batch.filter(raw)
        bk, parent = _dsir_buckets(batch)
        n_tok = np.bincount(parent, minlength=len(batch)).astype(np.int64)
        # lift*count sums stay < 2^53, so float64 bincount is exact
        tot = np.bincount(parent, weights=lf[bk].astype(np.float64),
                          minlength=len(batch)).astype(np.int64) \
            if len(parent) else np.zeros(len(batch), dtype=np.int64)
        keep = n_tok > 0
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "doc_id": ids[keep].astype(np.int64),
            "n_tokens": n_tok[keep],
            "weight_x1e6": tot[keep] // n_tok[keep]})

    out = (ds.map_batches(score, batch_format="pyarrow", batch_size=None)
           .sort(["weight_x1e6", "doc_id"], descending=[True, False])
           .limit(DSIR_TOP_K)
           .to_pandas())
    if out.empty:
        return empty
    out["sel_rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.astype({c: "int64" for c in
                       ("doc_id", "n_tokens", "weight_x1e6", "sel_rank")})


DSIR_SQL = rf"""
WITH tok AS (
  SELECT doc_id, lang, t AS token
  FROM (SELECT doc_id, lang,
               unnest(regexp_split_to_array(
                   trim(lower(coalesce(text, ''))), '\s+')) AS t
        FROM documents)
  WHERE t <> ''
),
b AS (SELECT doc_id, lang, substr(md5(token), 1, 2) AS bucket FROM tok),
cnt AS (SELECT bucket,
          CAST(COUNT(*) FILTER (lang = '{DSIR_TARGET_LANG}')
               AS BIGINT) AS ct,
          CAST(COUNT(*) FILTER (lang <> '{DSIR_TARGET_LANG}')
               AS BIGINT) AS cr
        FROM b GROUP BY 1),
tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM cnt),
lift AS (SELECT bucket,
           CAST(CAST(ct + 1 AS HUGEINT) * (nr + {DSIR_BUCKETS}) * 1000000
                // (CAST(cr + 1 AS HUGEINT) * (nt + {DSIR_BUCKETS}))
                AS BIGINT) AS lift_x1e6
         FROM cnt, tot),
doc AS (SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CAST(l.lift_x1e6 AS HUGEINT)) // COUNT(*)
                    AS BIGINT) AS weight_x1e6
        FROM b JOIN lift l USING (bucket)
        WHERE b.lang <> '{DSIR_TARGET_LANG}'
        GROUP BY 1)
SELECT doc_id, n_tokens, weight_x1e6,
       CAST(ROW_NUMBER() OVER (ORDER BY weight_x1e6 DESC, doc_id)
            AS BIGINT) AS sel_rank
FROM doc
ORDER BY weight_x1e6 DESC, doc_id
LIMIT {DSIR_TOP_K}
"""


# --- UniMax language-budget allocation (Chung et al. 2023) -------------

UNIMAX_EPOCH_CAP = 3           # max epochs any language may repeat
UNIMAX_BUDGET_NUM, UNIMAX_BUDGET_DEN = 1, 2   # budget = total_tokens // 2

_UNIMAX_COLS = ("lang", "n_docs", "tokens", "alloc_tokens",
                "epochs_x1e6")


def docs_unimax_alloc(sf_dir: str):
    """UniMax temperature-free language-budget waterfilling: given the
    per-language whitespace-token totals c_l, a total budget
    B = total_tokens // 2 and an epoch cap E = 3, languages (ascending
    by c_l, ties by name) take min(E * c_l, fair share of the remaining
    budget). Once a language is uncapped every later one takes the SAME
    integer share floor((B - E * P_m) // (L - m)) (the greedy's equal-
    share fixed point; capped languages provably form a prefix of the
    sorted order, so the closed form the oracle replays is exact).
    Output per language: docs, tokens, allocated tokens, and the
    resulting epoch multiplier floor(alloc * 1e6 // tokens).

    Scale shape: one streaming pass emits per-batch (lang, n_docs,
    tokens) partials; everything after runs over the <= L-row language
    table on the driver."""
    empty = pd.DataFrame({
        "lang": pd.Series(dtype="object"),
        **{c: pd.Series(dtype="int64") for c in _UNIMAX_COLS[1:]}})
    import pyarrow.parquet as pq
    if pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows == 0:
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        stats = T.token_stats(batch["text"].combine_chunks()
                              if isinstance(batch["text"], pa.ChunkedArray)
                              else batch["text"])
        nt = stats["n_tokens"].to_numpy(zero_copy_only=False)
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(langs, return_inverse=True)
        c = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(c, inv, nt)
        return pa.Table.from_pydict({
            "lang": pa.array(uniq),
            "n_docs": pa.array(np.bincount(inv), type=pa.int64()),
            "tokens": pa.array(c, type=pa.int64())})

    parts = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["text", "lang"])
             .map_batches(partial, batch_format="pyarrow",
                          batch_size=None).to_pandas())
    if parts.empty:
        return empty
    g = parts.groupby("lang", sort=True)[["n_docs", "tokens"]] \
        .agg(lambda col: sum(int(x) for x in col)) \
        .sort_values(["tokens", "lang"]).reset_index()
    E = UNIMAX_EPOCH_CAP
    total = int(g["tokens"].sum())
    budget = total * UNIMAX_BUDGET_NUM // UNIMAX_BUDGET_DEN
    L = len(g)
    c = [int(x) for x in g["tokens"]]
    # prefix waterfill: capped languages are exactly the sorted prefix
    alloc, remaining, m = [], budget, 0
    for i in range(L):
        if E * c[i] * (L - i) <= remaining:      # capped: takes E*c_i
            alloc.append(E * c[i])
            remaining -= E * c[i]
            m += 1
        else:
            break
    share = remaining // (L - m) if m < L else 0
    alloc.extend([share] * (L - m))
    out = pd.DataFrame({
        "lang": g["lang"],
        "n_docs": g["n_docs"].astype("int64"),
        "tokens": g["tokens"].astype("int64"),
        "alloc_tokens": pd.Series(alloc, dtype="int64"),
        "epochs_x1e6": pd.Series(
            [a * 1_000_000 // t if t > 0 else 0
             for a, t in zip(alloc, c)], dtype="int64")})
    return out.sort_values("lang").reset_index(drop=True)


UNIMAX_SQL = rf"""
WITH tok AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
              AS BIGINT) AS c
  FROM documents GROUP BY lang),
tot AS (SELECT CAST(SUM(c) AS BIGINT) * {UNIMAX_BUDGET_NUM}
               // {UNIMAX_BUDGET_DEN} AS b,
               CAST(COUNT(*) AS BIGINT) AS l FROM tok),
ord AS (
  SELECT lang, n_docs, c,
         ROW_NUMBER() OVER (ORDER BY c, lang) AS i,
         COALESCE(SUM(c) OVER (ORDER BY c, lang
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS p
  FROM tok),
flag AS (
  SELECT o.*, t.b, t.l,
         CASE WHEN {UNIMAX_EPOCH_CAP} * o.c * (t.l - o.i + 1)
                   <= t.b - {UNIMAX_EPOCH_CAP} * o.p
              THEN 1 ELSE 0 END AS capped
  FROM ord o, tot t),
mm AS (
  SELECT CAST(COALESCE(SUM(capped), 0) AS BIGINT) AS m,
         CAST(COALESCE(SUM(CASE WHEN capped = 1 THEN c END), 0)
              AS BIGINT) AS pc
  FROM flag),
alloc AS (
  SELECT f.lang, f.n_docs, f.c,
         CASE WHEN f.capped = 1 THEN {UNIMAX_EPOCH_CAP} * f.c
              WHEN f.l > mm.m
                THEN (f.b - {UNIMAX_EPOCH_CAP} * mm.pc) // (f.l - mm.m)
              ELSE 0 END AS a
  FROM flag f, mm)
SELECT lang, n_docs, c AS tokens, CAST(a AS BIGINT) AS alloc_tokens,
       CAST(CASE WHEN c > 0 THEN a * 1000000 // c ELSE 0 END
            AS BIGINT) AS epochs_x1e6
FROM alloc
ORDER BY lang
"""


# --- topic clustering over hashed term-frequency vectors ---------------

TOPICS_K = 5
TOPICS_DIMS = 64
TOPICS_ITERS = 4
TOPICS_TOP_TERMS = 10
# Power-of-two quantization of the normalized TF vectors: every
# component becomes an exact dyadic k/2^20, so float64 per-cluster sums
# are EXACT (integer numerators < 2^53 up to ~8e9 docs/cluster) and
# therefore order-invariant — the driver fast path and the distributed
# partial-sum path produce bit-identical centroids at any block layout.
TOPICS_QSCALE = float(2 ** 20)


def _tf_parts(batch: pa.Table):
    """(doc_ids, parent, flat_tokens, L2-normalized (n, TOPICS_DIMS)
    hashed-TF matrix) for one batch. Feature hashing runs once per
    UNIQUE token (dictionary encode, md5 -> bucket); counts accumulate
    via one scatter-add."""
    import hashlib
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = as_array(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(text)), T.TOKEN_SPLIT_RE))
    flat = as_array(pc.list_flatten(toks))
    parent = as_array(pc.list_parent_indices(toks)) \
        .to_numpy(zero_copy_only=False)
    n = len(batch)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    m = np.zeros((n, TOPICS_DIMS), dtype=np.float64)
    if len(flat):
        enc = pc.dictionary_encode(flat)
        idx = enc.indices.to_numpy(zero_copy_only=False)
        buckets = np.fromiter(
            (int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
             % TOPICS_DIMS for t in enc.dictionary.to_pylist()),
            dtype=np.int64, count=len(enc.dictionary))
        np.add.at(m, (parent, buckets[idx]), 1.0)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    m = np.floor(m * TOPICS_QSCALE) / TOPICS_QSCALE
    return doc_ids, parent, flat, m


TOPICS_DRIVER_MAX = 65536   # <= this many docs: cluster on the driver


def corpus_topics(sf_dir: str, driver_max: int = TOPICS_DRIVER_MAX):
    """Document TOPIC clustering without embeddings: L2-normalized
    64-bucket hashed term-frequency vectors, distributed Lloyd's
    k-means (TOPICS_ITERS streaming passes, deterministic init from the
    TOPICS_K smallest doc_ids), then per-topic top terms. Iterative and
    hash-based — not SQL-expressible, so rows-only for the driver;
    tests pin planted-vocabulary recovery and partition invariants.

    Scale shape: every k-means pass broadcasts k x D floats and emits
    per-cluster (sum, count) partials; the term profile pass
    pre-aggregates (topic, term, cnt) per batch and keeps per-topic
    top candidates per coarse hash group, so the exchange moves
    partial counts, never token instances.
    Output: (topic_id, n_docs, rank, term, cnt)."""
    cols = ("topic_id", "n_docs", "rank", "term", "cnt")
    empty = pd.DataFrame({
        **{c: pd.Series(dtype="int64") for c in
           ("topic_id", "n_docs", "rank", "cnt")},
        "term": pd.Series(dtype="object")})[list(cols)]
    import pyarrow.parquet as pq
    import ray

    if pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows == 0:
        return empty
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def _assign(m: np.ndarray, c: np.ndarray) -> np.ndarray:
        return np.argmin(((m[:, None, :] - c[None, :, :]) ** 2)
                         .sum(axis=2), axis=1)

    # deterministic farthest-point init (greedy k-center, cf.
    # embedding_maxmin_diverse): seed with the smallest doc_id, then
    # K-1 streaming passes each pick the doc maximizing its distance
    # to the chosen centroids (ties -> smallest doc_id). Seeding with
    # the K smallest ids collapses whole topics when the id order
    # correlates with content — the planted-vocabulary test pins this.
    n_docs_total = _n_docs(sf_dir)
    if n_docs_total == 0:
        return empty
    k_target = min(TOPICS_K, n_docs_total)

    if n_docs_total <= driver_max:
        # small-corpus fast path: same min-doc seed, same greedy
        # k-center init (identical (-d2, doc_id) tie rule), same Lloyd
        # sum/count updates and same term-profile ordering, on one
        # in-memory matrix — minus the 1 + K-1 + TOPICS_ITERS
        # scheduling barriers. BIT-identical to the distributed path:
        # TOPICS_QSCALE dyadic quantization makes every per-cluster
        # float64 sum exact hence order-invariant (pinned by
        # test_topics_driver_vs_distributed_bit_equal). The distributed
        # path stays default past the cap.
        tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
        doc_ids_all, parent, flat, m = _tf_parts(tbl)
        cents = m[int(np.argmin(doc_ids_all))][None, :].copy()
        while len(cents) < k_target:
            d2 = ((m[:, None, :] - cents[None, :, :]) ** 2) \
                .sum(axis=2).min(axis=1)
            j = np.lexsort((doc_ids_all, -d2))[0]
            cents = np.vstack([cents, m[j]])
        for _ in range(TOPICS_ITERS):
            a = _assign(m, cents)
            new = cents.copy()
            for cl in range(len(cents)):
                sel = a == cl
                if sel.any():
                    new[cl] = m[sel].sum(axis=0) / int(sel.sum())
            cents = new
        a = _assign(m, cents)
        df = pd.DataFrame({"cl": a[parent],
                           "term": flat.to_numpy(zero_copy_only=False)})
        top = df.groupby(["cl", "term"], as_index=False).size() \
            .rename(columns={"size": "cnt"}) \
            .sort_values(["cl", "cnt", "term"],
                         ascending=[True, False, True]) \
            .groupby("cl").head(TOPICS_TOP_TERMS).reset_index(drop=True)
        top["rank"] = top.groupby("cl").cumcount() + 1
        sizes = np.bincount(a, minlength=len(cents))
        top["n_docs"] = top["cl"].map(lambda c: int(sizes[c]))
        out = top.rename(columns={"cl": "topic_id"})[list(cols)]
        return out.astype({"topic_id": "int64", "n_docs": "int64",
                           "rank": "int64", "cnt": "int64"}) \
            .sort_values(["topic_id", "rank"]).reset_index(drop=True)

    # distributed path: seed selection needs only ONE scalar (min
    # doc_id) — a distributed Min aggregate, never the full id column
    # on the driver (at 10^12 docs one int64 column is terabytes)
    from ray.data.aggregate import Min
    id_stats = rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"]).aggregate(Min("doc_id"))
    seed_id = int(id_stats["min(doc_id)"])
    seed = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filters=[("doc_id", "in", [seed_id])]).to_pandas()
    _, _, _, cents = _tf_parts(pa.Table.from_pandas(
        seed, preserve_index=False))

    # tokenize + hash ONCE: the iterative passes run over the
    # materialized (doc_id, vec) table in the object store, not over
    # re-tokenized text (measured 2x end-to-end at sf0.1)
    def to_vecs(batch: pa.Table) -> pa.Table:
        doc_ids_b, _, _, m = _tf_parts(batch)
        return pa.Table.from_pydict({
            "doc_id": pa.array(doc_ids_b, pa.int64()),
            "vec": list(m)})

    vecs = docs.map_batches(to_vecs, batch_format="pyarrow",
                            batch_size=None).materialize()

    def _vec_batch(batch: pa.Table):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = np.stack(batch["vec"].to_numpy(zero_copy_only=False))
        return ids, m

    while len(cents) < k_target:
        cref0 = ray.put(cents)

        def far_partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref0)
            doc_ids_b, m = _vec_batch(batch)
            d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2) \
                .min(axis=1)
            j = np.lexsort((doc_ids_b, -d2))[0]
            return pa.Table.from_pydict({
                "doc_id": pa.array([int(doc_ids_b[j])], pa.int64()),
                "d2": pa.array([float(d2[j])], pa.float64()),
                "vec": [m[j]]})

        cand = vecs.map_batches(far_partial, batch_format="pyarrow",
                                batch_size=None).to_pandas() \
            .sort_values(["d2", "doc_id"],
                         ascending=[False, True])
        cents = np.vstack([cents,
                           np.asarray(cand["vec"].iloc[0],
                                      dtype=np.float64)])
    k = len(cents)

    for _ in range(TOPICS_ITERS):
        cref = ray.put(cents)

        def assign_partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            _, m = _vec_batch(batch)
            a = _assign(m, c)
            sums = np.zeros_like(c)
            np.add.at(sums, a, m)
            return pa.Table.from_pydict({
                "cl": np.arange(len(c), dtype=np.int64),
                "cnt": np.bincount(a, minlength=len(c))
                .astype(np.int64),
                "sum": list(sums)})

        parts = vecs.map_batches(assign_partial, batch_format="pyarrow",
                                 batch_size=None).to_pandas()
        new = cents.copy()
        for cl, grp in parts.groupby("cl"):
            c_n = int(grp["cnt"].sum())
            if c_n > 0:           # empty cluster keeps its centroid
                new[cl] = np.sum(np.stack(grp["sum"].to_numpy()),
                                 axis=0) / c_n
        cents = new

    cref = ray.put(cents)

    def term_partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        _, parent, flat, m = _tf_parts(batch)
        a = _assign(m, c)
        df = pd.DataFrame({"cl": a[parent],
                           "term": flat.to_numpy(zero_copy_only=False)})
        g = df.groupby(["cl", "term"], sort=False).size() \
            .reset_index(name="cnt")
        g["is_size"] = 0
        szs = pd.DataFrame({"cl": np.arange(len(c), dtype=np.int64),
                            "term": "",
                            "cnt": np.bincount(a, minlength=len(c))
                            .astype(np.int64),
                            "is_size": 1})
        return pa.Table.from_pandas(pd.concat([g, szs]),
                                    preserve_index=False) \
            .replace_schema_metadata(None)

    def per_group_top(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g[g["is_size"] == 1]
        terms = g[g["is_size"] == 0] \
            .groupby(["cl", "term"], as_index=False)[["cnt"]].sum()
        terms["is_size"] = 0
        terms = terms.sort_values(["cl", "cnt", "term"],
                                  ascending=[True, False, True]) \
            .groupby("cl").head(TOPICS_TOP_TERMS)
        return pd.concat([terms, sizes], ignore_index=True) \
            [["cl", "term", "cnt", "is_size"]]

    cand = _coarse_str_group(
        docs.map_batches(term_partial, batch_format="pyarrow",
                         batch_size=None),
        "term", per_group_top).to_pandas()
    sizes = cand[cand["is_size"] == 1].groupby("cl")["cnt"].sum()
    top = (cand[cand["is_size"] == 0]
           .groupby(["cl", "term"], as_index=False)["cnt"].sum()
           .sort_values(["cl", "cnt", "term"],
                        ascending=[True, False, True])
           .groupby("cl").head(TOPICS_TOP_TERMS).reset_index(drop=True))
    top["rank"] = top.groupby("cl").cumcount() + 1
    top["n_docs"] = top["cl"].map(lambda c: int(sizes.get(c, 0)))
    out = top.rename(columns={"cl": "topic_id"})[list(cols)]
    return out.astype({"topic_id": "int64", "n_docs": "int64",
                       "rank": "int64", "cnt": "int64"}) \
        .sort_values(["topic_id", "rank"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Source-vocabulary Jaccard (corpus-comparison matrix)
# ---------------------------------------------------------------------------


def docs_source_vocab_jaccard(sf_dir: str):
    """Pairwise Jaccard similarity between each SOURCE's distinct token
    vocabulary — the corpus-comparison matrix a mixture designer reads
    before weighting sources (complements corpus_snapshot_diff, which
    diffs docs, not vocabularies). Only pairs sharing >= 1 token emit
    (the oracle's inner join does the same).

    Scale shape: per-batch distinct (source, token) pairs enter ONE
    token-keyed coarse exchange; within a bucket each token's distinct
    source set yields pair-intersection partials and per-source
    distinct-token partials (vocab-bounded rows), and the driver sums
    a sources^2-sized table. Output: (source_a, source_b, inter, uni,
    jaccard_x1e6), ordered."""
    cols = ("source_a", "source_b", "inter", "uni", "jaccard_x1e6")
    empty = pd.DataFrame({
        "source_a": pd.Series(dtype="object"),
        "source_b": pd.Series(dtype="object"),
        **{c: pd.Series(dtype="int64") for c in cols[2:]}})[list(cols)]
    if _n_docs(sf_dir) == 0:
        return empty
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def pairs_fn(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = as_array(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pc.fill_null(text, ""))), T.TOKEN_SPLIT_RE))
        flat = as_array(pc.list_flatten(toks))
        parent = as_array(pc.list_parent_indices(toks)) \
            .to_numpy(zero_copy_only=False)
        src = batch["source"].to_numpy(zero_copy_only=False)[parent]
        df = pd.DataFrame({"source": src,
                           "tok": flat.to_numpy(zero_copy_only=False)}) \
            .drop_duplicates(ignore_index=True)
        return _from_pandas(df)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()          # global distinct per token here
        sizes = d.groupby("source").size().reset_index(name="n")
        sizes.columns = ["a", "n"]
        sizes["b"] = ""
        sizes["kind"] = np.int64(1)
        m = d.merge(d, on="tok")
        m = m[m["source_x"] < m["source_y"]]
        inter = m.groupby(["source_x", "source_y"]).size() \
            .reset_index(name="n")
        inter.columns = ["a", "b", "n"]
        inter["kind"] = np.int64(0)
        return pd.concat([inter, sizes], ignore_index=True) \
            [["kind", "a", "b", "n"]].astype(
            {"kind": "int64", "n": "int64"})

    parts = _coarse_str_group(
        ds.map_batches(pairs_fn, batch_format="pyarrow",
                       batch_size=None),
        "tok", per_bucket).to_pandas()
    if parts.empty or "kind" not in parts.columns:
        return empty
    sizes = parts[parts["kind"] == 1].groupby("a")["n"].sum()
    inter = parts[parts["kind"] == 0].groupby(["a", "b"],
                                              as_index=False)["n"].sum()
    if inter.empty:
        return empty
    inter["uni"] = (sizes.reindex(inter["a"]).to_numpy(np.int64)
                    + sizes.reindex(inter["b"]).to_numpy(np.int64)
                    - inter["n"].to_numpy(np.int64))
    inter["jaccard_x1e6"] = (inter["n"] * 1_000_000) // inter["uni"]
    out = inter.rename(columns={"a": "source_a", "b": "source_b",
                                "n": "inter"})
    return out[list(cols)].astype(
        {"inter": "int64", "uni": "int64", "jaccard_x1e6": "int64"}) \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)


EMD_BUCKET_TOKENS = 5        # length-histogram bucket width (tokens)


def docs_source_length_emd(sf_dir: str):
    """Pairwise EXACT Wasserstein-1 (earth-mover) distance between each
    source's document-length distribution (token counts bucketed by
    {EMD_BUCKET_TOKENS}) — the transport-metric companion to the
    TVD/KS drift ops: EMD = sum over the integer bucket axis of
    |CDF_a - CDF_b|, computed as the all-integer
    sum(|cum_a*n_b - cum_b*n_a| * gap) * 1e6 // (n_a*n_b)
    (units: buckets, x1e6). Only pairs of non-empty sources emit.

    Scale shape: per-batch (source, bucket) count partials -> one
    vocab-bounded keyed Sum -> the driver folds a sources x buckets
    table (tiny) with exact integer arithmetic.
    Output: (source_a, source_b, emd_x1e6)."""
    cols = ("source_a", "source_b", "emd_x1e6")
    empty = pd.DataFrame({
        "source_a": pd.Series(dtype="object"),
        "source_b": pd.Series(dtype="object"),
        "emd_x1e6": pd.Series(dtype="int64")})[list(cols)]
    if _n_docs(sf_dir) == 0:
        return empty
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = as_array(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pc.fill_null(text, ""))), T.TOKEN_SPLIT_RE))
        n_tok = pc.list_value_length(toks) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "source": batch["source"].to_numpy(zero_copy_only=False),
            "b": n_tok // EMD_BUCKET_TOKENS})
        g = df.groupby(["source", "b"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return _from_pandas(g.astype({"b": "int64", "n": "int64"}))

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None) \
        .groupby(["source", "b"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    if hist.empty or "source" not in hist.columns:
        return empty
    grid = np.sort(hist["b"].unique())
    srcs = sorted(hist["source"].unique())
    piv = hist.pivot_table(index="b", columns="source", values="n",
                           fill_value=0, aggfunc="sum") \
        .reindex(grid, fill_value=0)
    cums = piv.cumsum()
    tot = piv.sum()
    gaps = np.concatenate([np.diff(grid), [0]]).astype(object)
    rows = []
    for i, a in enumerate(srcs):
        for b_ in srcs[i + 1:]:
            na, nb = int(tot[a]), int(tot[b_])
            if na == 0 or nb == 0:
                continue
            diff = (cums[a].to_numpy().astype(object) * nb
                    - cums[b_].to_numpy().astype(object) * na)
            num = sum(abs(int(d)) * int(g)
                      for d, g in zip(diff, gaps))
            rows.append((a, b_, num * 1_000_000 // (na * nb)))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=list(cols)) \
        .astype({"emd_x1e6": "int64"}) \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)


SOURCE_EMD_SQL = rf"""
WITH t AS (
  SELECT source,
         CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
              // {EMD_BUCKET_TOKENS} AS BIGINT) AS b
  FROM documents),
counts AS (SELECT source, b, COUNT(*) AS n FROM t GROUP BY source, b),
srcs AS (SELECT source, COUNT(*) AS tot FROM t GROUP BY source),
grid AS (SELECT DISTINCT b FROM t),
filled AS (
  SELECT s.source, g.b, s.tot, COALESCE(c.n, 0) AS n
  FROM srcs s CROSS JOIN grid g
  LEFT JOIN counts c ON c.source = s.source AND c.b = g.b),
cums AS (
  SELECT source, b, tot,
         SUM(n) OVER (PARTITION BY source ORDER BY b) AS cum,
         COALESCE(LEAD(b) OVER (PARTITION BY source ORDER BY b) - b,
                  0) AS gap
  FROM filled),
pairs AS (
  SELECT a.source AS sa, x.source AS sb,
         SUM(ABS(a.cum * x.tot - x.cum * a.tot) * a.gap) AS num,
         MAX(a.tot) AS na, MAX(x.tot) AS nb
  FROM cums a JOIN cums x ON a.b = x.b AND a.source < x.source
  GROUP BY sa, sb)
SELECT sa AS source_a, sb AS source_b,
       CAST(num * 1000000 // (na * nb) AS BIGINT) AS emd_x1e6
FROM pairs ORDER BY source_a, source_b
"""


SOURCE_JACCARD_SQL = r"""
WITH st AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source,
           unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
    FROM documents)),
sz AS (SELECT source, COUNT(*) AS n FROM st GROUP BY source),
iv AS (SELECT a.source AS sa, b.source AS sb, COUNT(*) AS inter
       FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
       GROUP BY sa, sb)
SELECT sa AS source_a, sb AS source_b,
       CAST(inter AS BIGINT) AS inter,
       CAST(za.n + zb.n - inter AS BIGINT) AS uni,
       CAST(inter * 1000000 // (za.n + zb.n - inter) AS BIGINT)
           AS jaccard_x1e6
FROM iv
JOIN sz za ON za.source = iv.sa
JOIN sz zb ON zb.source = iv.sb
ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
# Distributed quality-classifier training (fastText-style linear model)
# ---------------------------------------------------------------------------

QC_ITERS = 30               # full-batch gradient-descent steps
QC_LR = 4.0                 # step size on L2-normalized hashed features
QC_GRAD_SCALE = 1_000_000_000   # per-doc gradient quantization (x1e9)
QC_DRIVER_MAX = 65536       # <= this many docs: train on the driver


def _weak_label_batch(batch: pa.Table) -> np.ndarray:
    """Per-doc Snorkel-style weak label: 1 = high quality (>= 3 voter
    heuristics agree), 0 = low (<= 1), 2 = abstain — the SAME four
    voters as ``quality_weak_labels`` (textops), reused so the student
    model distills exactly the published label model."""
    from ..functions import text as _T
    from .textops import (_WL_MIN_TOKENS, _WL_PUNCT_MAX, _WL_STOP_MIN,
                          _WL_TLEN_HI, _WL_TLEN_LO)
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    q = _T.quality_scores(text)
    stop = q["stop_ratio_x1e6"].to_numpy(zero_copy_only=False)
    punct = q["punct_ratio_x1e6"].to_numpy(zero_copy_only=False)
    tlen = q["mean_token_len_x1e6"].to_numpy(zero_copy_only=False)
    ntok = q["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
    votes = ((stop >= _WL_STOP_MIN).astype(np.int64)
             + (punct <= _WL_PUNCT_MAX)
             + ((tlen >= _WL_TLEN_LO) & (tlen <= _WL_TLEN_HI))
             + (ntok >= _WL_MIN_TOKENS))
    return np.where(votes >= 3, 1, np.where(votes <= 1, 0, 2)) \
        .astype(np.int64)


def doc_quality_classifier(sf_dir: str,
                           driver_max: int = QC_DRIVER_MAX):
    """Train a LINEAR quality classifier (logistic regression over the
    64-bucket hashed-TF features of `_tf_parts`, plus bias) fully
    distributed — the fastText-style student model behind CCNet /
    FineWeb-Edu quality filters, distilling the repo's own Snorkel-style
    weak labels (``quality_weak_labels``'s four heuristic voters):
    train on the non-abstain docs, score EVERY doc. Each GD step
    broadcasts the weights, every batch emits ONE integer gradient
    partial, the driver applies the update.

    Determinism at ANY parallelism: per-document gradient rows are
    floor-quantized to integers (x1e9) BEFORE summation, so the global
    gradient is an order-invariant int64 sum and every weight update —
    hence every score — is bit-identical whatever the batch/block
    layout (pinned by the sharding-invariance test). Iterative, so
    rows-only for the driver.

    Scale shape: features tokenized/hashed/labeled ONCE into a
    materialized (doc_id, label, vec) table; each GD step is one
    streaming pass emitting 66 ints per batch; the scoring pass is
    batch-local. Output: (doc_id, label [0 low / 1 high / 2 abstain],
    score_x1e6, pred), sorted by doc_id."""
    import ray

    cols = ("doc_id", "label", "score_x1e6", "pred")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _n_docs(sf_dir) == 0:
        return empty
    docs = _docs(sf_dir)

    def to_feat(batch: pa.Table) -> pa.Table:
        doc_ids, _, _, m = _tf_parts(batch)
        return pa.Table.from_pydict({
            "doc_id": pa.array(doc_ids.astype(np.int64)),
            "label": pa.array(_weak_label_batch(batch)),
            "vec": list(m)})

    feats = docs.map_batches(to_feat, batch_format="pyarrow",
                             batch_size=None).materialize()
    d1 = TOPICS_DIMS + 1
    w = np.zeros(d1, dtype=np.float64)

    def xw(batch: pa.Table, w: np.ndarray):
        X = np.stack(batch["vec"].to_numpy(zero_copy_only=False))
        X1 = np.hstack([X, np.ones((len(X), 1))])
        z = np.clip(X1 @ w, -30.0, 30.0)
        return X1, 1.0 / (1.0 + np.exp(-z))

    if _n_docs(sf_dir) <= driver_max:
        # small-corpus fast path: the SAME per-doc integer-quantized
        # gradient algebra on one in-memory matrix — bit-identical to
        # the distributed passes by construction (the global gradient
        # is an order-invariant int64 sum either way; pinned by
        # test_quality_classifier_driver_path_equals_distributed) —
        # minus {QC_ITERS}+1 scheduling barriers per run.
        df = feats.to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        X = np.stack(df["vec"].to_numpy())
        X1 = np.hstack([X, np.ones((len(X), 1))])
        y = df["label"].to_numpy(np.int64)
        keep = y < 2
        n_tr = max(int(keep.sum()), 1)
        for _ in range(QC_ITERS):
            z = np.clip(X1 @ w, -30.0, 30.0)
            p = 1.0 / (1.0 + np.exp(-z))
            per_doc = (X1 * (p - y)[:, None])[keep]
            g_int = np.floor(per_doc * QC_GRAD_SCALE) \
                .astype(np.int64).sum(axis=0)
            w = w - QC_LR * (g_int / (QC_GRAD_SCALE * float(n_tr)))
        z = np.clip(X1 @ w, -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-z))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "label": y,
            "score_x1e6": np.floor(p * 1e6).astype(np.int64),
            "pred": (p >= 0.5).astype(np.int64)})

    def count_train(batch: pa.Table) -> pa.Table:
        y = batch["label"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"n": np.array([(y < 2).sum()], dtype=np.int64)})

    n_train = int(feats.map_batches(count_train, batch_format="pyarrow",
                                    batch_size=None).sum("n") or 0)
    if n_train == 0:
        n_train = 1            # all-abstain corpus: w stays 0

    for _ in range(QC_ITERS):
        wref = ray.put(w)

        def grad_partial(batch: pa.Table, wref=wref) -> pa.Table:
            y = batch["label"].to_numpy(zero_copy_only=False)
            keep = y < 2                       # abstains don't train
            if not keep.any():
                return pa.Table.from_pydict(
                    {"g": [np.zeros(TOPICS_DIMS + 1, dtype=np.int64)]})
            X1, p = xw(batch, ray.get(wref))
            per_doc = (X1 * (p - y)[:, None])[keep]
            gq = np.floor(per_doc * QC_GRAD_SCALE).astype(np.int64) \
                .sum(axis=0)
            return pa.Table.from_pydict({"g": [gq]})

        parts = feats.map_batches(grad_partial, batch_format="pyarrow",
                                  batch_size=None).to_pandas()
        g_int = np.sum(np.stack(parts["g"].to_numpy()), axis=0)
        w = w - QC_LR * (g_int / (QC_GRAD_SCALE * float(n_train)))

    wref = ray.put(w)

    def score(batch: pa.Table, wref=wref) -> pa.Table:
        _, p = xw(batch, ray.get(wref))
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"],
            "label": batch["label"],
            "score_x1e6": np.floor(p * 1e6).astype(np.int64),
            "pred": (p >= 0.5).astype(np.int64)})

    return feats.map_batches(score, batch_format="pyarrow",
                             batch_size=None).sort("doc_id")


# ---------------------------------------------------------------------------
# Cross-doc duplicate n-gram fraction (FineWeb-style corpus signal)
# ---------------------------------------------------------------------------

NGRAM_N = 8                    # sliding window width (GPT-3 used 13)


def _doc_grams_batch(batch: pa.Table) -> pd.DataFrame:
    """Distinct (doc_id, gram) pairs for one batch: sliding
    ``NGRAM_N``-token windows over the whitespace/lowercase token
    stream, joined with single spaces — byte-identical to the oracle's
    ``array_to_string(w[i:i+N-1], ' ')``. Vectorized: one
    ``binary_join_element_wise`` over N shifted views of the flat token
    array; window validity = same parent doc at both ends. Each doc_id
    lives in exactly one batch (one row per doc), so per-batch distinct
    pairs are globally distinct."""
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = as_array(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.utf8_lower(pc.fill_null(text, ""))),
        T.TOKEN_SPLIT_RE))
    flat = as_array(pc.list_flatten(toks))
    parent = as_array(pc.list_parent_indices(toks)) \
        .to_numpy(zero_copy_only=False)
    m = len(flat)
    if m < NGRAM_N:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "gram": pd.Series(dtype="object")})
    shifted = [flat.slice(k, m - NGRAM_N + 1) for k in range(NGRAM_N)]
    grams = pc.binary_join_element_wise(*shifted, " ")
    valid = parent[:m - NGRAM_N + 1] == parent[NGRAM_N - 1:]
    ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)[parent[:m - NGRAM_N + 1][valid]]
    df = pd.DataFrame({"doc_id": ids,
                       "gram": grams.to_numpy(zero_copy_only=False)[valid]})
    return df.drop_duplicates(ignore_index=True)


DUPN_DRIVER_MAX = 10_000    # <= this many docs: merge pairs driver-side


def docs_dup_ngram_fraction(sf_dir: str,
                            driver_max: int = DUPN_DRIVER_MAX):
    """Per-document CROSS-corpus duplicate n-gram fraction: of each
    doc's distinct sliding {NGRAM_N}-token grams, how many also occur
    in at least one OTHER document — the FineWeb/Gopher "duplicated
    n-gram fraction" quality signal at corpus (not intra-doc)
    granularity; `doc_repetition` is the intra-doc twin and
    `doc_dup_block_stats` the disjoint-block one.

    Scale shape: pass 1 ships globally-distinct (gram, doc_id) pairs
    through ONE gram-keyed coarse exchange, where per-gram doc counts
    mark dup membership and only (doc_id, partial dup count) rows
    leave; pass 2 is doc-local (distinct-gram totals, no exchange);
    the final merge is a doc_id-keyed coarse partition — nothing ever
    holds the corpus on the driver.
    Output: (doc_id, n_grams, n_dup, dup_frac_x1e6), docs with >= 1
    gram."""
    from .relational import _coarse_partition_map

    cols = ("doc_id", "n_grams", "n_dup", "dup_frac_x1e6")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _n_docs(sf_dir) == 0:
        return empty

    def pairs_fn(batch: pa.Table) -> pa.Table:
        return _from_pandas(_doc_grams_batch(batch))

    pairs = _docs(sf_dir).map_batches(pairs_fn, batch_format="pyarrow",
                                      batch_size=None)

    if _n_docs(sf_dir) <= driver_max:
        # small-corpus fast path: the distinct (gram, doc) pair set is
        # bounded by docs x grams-per-doc — one collect, the same
        # count/merge algebra in pandas (identical to the exchange
        # path and the SQL oracle; equality pinned by test)
        df = pairs.to_pandas()
        if df.empty or "gram" not in df.columns:
            return empty
        nd_per_gram = df.groupby("gram")["doc_id"].transform("size")
        per = df.groupby("doc_id").size().rename("n_grams").to_frame()
        per["n_dup"] = df.loc[nd_per_gram >= 2] \
            .groupby("doc_id").size().reindex(per.index, fill_value=0)
        per = per.reset_index().astype("int64")
        per["dup_frac_x1e6"] = (per["n_dup"] * 1_000_000) \
            // per["n_grams"]
        return per[list(cols)].sort_values("doc_id") \
            .reset_index(drop=True)

    # typed empty when NO doc reaches NGRAM_N tokens (all-empty
    # map_groups output loses its schema); the streaming limit(1)
    # probe stops after the first non-empty block
    if len(pairs.limit(1).take(1)) == 0:
        return empty

    def mark_dups(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("gram")["doc_id"].transform("size")
        dup = g[nd >= 2]
        out = dup.groupby("doc_id", as_index=False).size() \
            .rename(columns={"size": "n"})
        return out.astype("int64")

    dup_counts = _coarse_str_group(pairs, "gram", mark_dups) \
        .groupby("doc_id").aggregate(Sum("n", alias_name="n_dup"))

    def totals_fn(batch: pa.Table) -> pa.Table:
        df = _doc_grams_batch(batch)
        g = df.groupby("doc_id", as_index=False).size() \
            .rename(columns={"size": "n_grams"})
        return _from_pandas(g.astype("int64"))

    totals = _docs(sf_dir).map_batches(totals_fn, batch_format="pyarrow",
                                       batch_size=None)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array(np.full(len(batch), side, np.int64)))
        return fn

    def rename_dup(batch: pa.Table) -> pa.Table:
        if batch.num_columns != 2:    # all-empty map_groups output
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.int64()),
                 "n_grams": pa.array([], pa.int64())})
        return batch.rename_columns(["doc_id", "n_grams"])

    both = totals.map_batches(tag(0), batch_format="pyarrow",
                              batch_size=None) \
        .union(dup_counts.map_batches(rename_dup, batch_format="pyarrow",
                                      batch_size=None)
               .map_batches(tag(1), batch_format="pyarrow",
                            batch_size=None))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        tot = g[g["side"] == 0][["doc_id", "n_grams"]]
        dup = g[g["side"] == 1][["doc_id", "n_grams"]] \
            .rename(columns={"n_grams": "n_dup"})
        m = tot.merge(dup, on="doc_id", how="left")
        m["n_dup"] = m["n_dup"].fillna(0).astype("int64")
        m["dup_frac_x1e6"] = (m["n_dup"] * 1_000_000) \
            // np.maximum(m["n_grams"], 1)
        return m[list(cols)].astype("int64")

    return _coarse_partition_map(both, "doc_id", merge).sort("doc_id")


DUP_NGRAM_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(lower(trim(text)), '\s+') AS w
  FROM documents),
u AS (SELECT doc_id, w,
             unnest(generate_series(1, len(w) - {NGRAM_N - 1})) AS i
      FROM t WHERE len(w) >= {NGRAM_N}),
g AS (SELECT DISTINCT doc_id,
             array_to_string(w[i:i+{NGRAM_N - 1}], ' ') AS gram
      FROM u),
c AS (SELECT gram, COUNT(*) AS nd FROM g GROUP BY gram),
per AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup
        FROM g JOIN c USING (gram) GROUP BY g.doc_id)
SELECT doc_id, n_grams, n_dup,
       (n_dup * 1000000) // n_grams AS dup_frac_x1e6
FROM per ORDER BY doc_id
"""


CORPUS_QUERIES: dict[str, tuple] = {
    "docs_dup_ngram_fraction": (docs_dup_ngram_fraction, DUP_NGRAM_SQL),
    "docs_source_vocab_jaccard": (docs_source_vocab_jaccard,
                                  SOURCE_JACCARD_SQL),
    "docs_source_length_emd": (docs_source_length_emd, SOURCE_EMD_SQL),
    "doc_quality_classifier": (doc_quality_classifier, None),
    "docs_unimax_alloc": (docs_unimax_alloc, UNIMAX_SQL),
    "corpus_topics": (corpus_topics, None),
    "corpus_dsir_selection": (corpus_dsir_selection, DSIR_SQL),
    "corpus_word_embeddings": (corpus_word_embeddings, None),
    "corpus_zipf_fit": (corpus_zipf_fit, None),
    "corpus_phrase_search": (corpus_phrase_search, PHRASE_SQL),
    "corpus_textrank_keywords": (corpus_textrank_keywords, None),
    "corpus_bigram_pmi": (corpus_bigram_pmi, BIGRAM_PMI_SQL),
    "corpus_bpe_merges": (corpus_bpe_merges, None),
    "corpus_bpe_token_stats": (corpus_bpe_token_stats, None),
    "corpus_bigrams": (corpus_bigrams, BIGRAMS_SQL),
    "docs_group_sample": (docs_group_sample, GROUP_SAMPLE_SQL),
    "doc_priority_sample": (doc_priority_sample, PRIORITY_SAMPLE_SQL),
    "cms_token_counts": (cms_token_counts, CMS_TOKEN_COUNTS_SQL),
    "doc_dup_block_stats": (doc_dup_block_stats, DUP_BLOCK_SQL),
    "doc_dedup_blocks": (doc_dedup_blocks, DEDUP_BLOCKS_SQL),
    "eval_contamination": (eval_contamination, CONTAMINATION_SQL),
    "docs_mixture_sample": (docs_mixture_sample, MIXTURE_SQL),
    "docs_stratified_sample": (docs_stratified_sample, STRATIFIED_SQL),
    "docs_train_split": (docs_train_split, TRAIN_SPLIT_SQL),
    "docs_kfold_assign": (docs_kfold_assign, KFOLD_SQL),
    "corpus_heavy_hitters": (corpus_heavy_hitters, HEAVY_HITTERS_SQL),
    "corpus_top_tokens_by_lang": (corpus_top_tokens_by_lang,
                                  TOP_BY_LANG_SQL),
    "corpus_vocab_stats": (corpus_vocab_stats, VOCAB_STATS_SQL),
    "doc_tfidf_top_terms": (doc_tfidf_top_terms, TFIDF_SQL),
    "doc_repetition": (doc_repetition, REPETITION_SQL),
    "token_length_hist": (token_length_hist, TOKEN_LEN_HIST_SQL),
    "doc_redact": (doc_redact, REDACT_SQL),
    "corpus_inverted_index": (corpus_inverted_index, INVERTED_INDEX_SQL),
}
