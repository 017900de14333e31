"""C4-style line-level cleaning tier (Raffel et al. 2020, §2.2 "C4").

The public C4 pipeline cleans Common Crawl with LINE-granular rules:
keep only lines that end in a terminal punctuation mark and contain at
least five words; drop any page that contains "lorem ipsum" or a curly
brace (JavaScript leak), or that retains fewer than three lines.

The driver's ``documents`` table is single-line word soup, so — exactly
like the PDF/HTML ingestion slices (`pipelines/pdfio.py`) — each query
first derives a deterministic *page render* from ``(doc_id, text)``
with the SAME expression in Ray and in the DuckDB oracle: fixed
40-char line chunks, plus a per-line decoration drawn from a pure
integer mix of ``(doc_id, line_no)`` that plants terminal punctuation
(~2/3 of lines), rare "lorem ipsum" markers and rare "{" leaks. The
rules then have real work to do, and the rows+schema+hash gate covers
render + rule kernel + rollup end to end.

Scale shape: the whole operator is ONE ``map_batches`` pass — the line
explosion, rule predicates and per-document rollup all happen inside
the batch (numpy ``bincount`` over list-parent indices), so no line
ever crosses the exchange and output is one short row per surviving
document. The per-batch loop runs once per line INDEX (bounded by the
longest document in the batch), each iteration a vectorized Arrow
kernel over every document that still has that line — total work is
O(total lines), not O(rows × max lines).

Reference analog: the reference engine has no corpus-cleaning stage;
this tier exists for the 100-TB training-data use the north rule
targets (C4/RefinedWeb/FineWeb-style curation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .corpus import _typed_empty_on_no_docs

_LINE = 40                  # chars per rendered line
_MIN_WORDS = 5              # C4: ">= 5 words per retained line"
_MIN_KEPT = 3               # C4: ">= 3 sentences per retained page"
_MIX_A = 1000003            # line-decoration mix (doc term)
_MIX_B = 7919               # line-decoration mix (line term)
_MOD = 1000
_LOREM_R = 421              # r == 421 -> line carries " lorem ipsum."
_BRACE_R = 737              # r == 737 -> line carries " {"


def _line_features(batch: pa.Table):
    """Render lines for one batch and evaluate the C4 predicates.

    Returns per-doc int64 aggregates (n_lines, n_kept, kept_chars,
    kept_words) plus a per-doc "contains lorem-ipsum / brace" flag.
    """
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n = len(ids)
    n_chunks = (lens + _LINE - 1) // _LINE

    n_lines = n_chunks.copy()
    n_kept = np.zeros(n, dtype=np.int64)
    kept_chars = np.zeros(n, dtype=np.int64)
    kept_words = np.zeros(n, dtype=np.int64)
    bad = np.zeros(n, dtype=bool)

    max_g = int(n_chunks.max()) if n else 0
    for g in range(max_g):
        sel = n_chunks > g
        idx = np.flatnonzero(sel)
        sl = pc.utf8_slice_codeunits(txt.filter(pa.array(sel)),
                                     _LINE * g, _LINE * (g + 1))
        r = (ids[idx] * _MIX_A + g * _MIX_B) % _MOD
        suffix = np.select([r == _LOREM_R, r == _BRACE_R, r % 3 != 0],
                           [" lorem ipsum.", " {", "."], default="")
        dec = pc.binary_join_element_wise(sl, pa.array(suffix), "")
        ends = pc.ends_with(dec, pattern=".").to_numpy(
            zero_copy_only=False)
        words = pc.count_substring(dec, " ").to_numpy(
            zero_copy_only=False).astype(np.int64) + 1
        chars = pc.utf8_length(dec).to_numpy(
            zero_copy_only=False).astype(np.int64)
        has_bad = pc.or_(pc.match_substring(dec, "lorem ipsum"),
                         pc.match_substring(dec, "{")) \
            .to_numpy(zero_copy_only=False)
        kept = ends & (words >= _MIN_WORDS)
        n_kept[idx] += kept
        kept_chars[idx] += np.where(kept, chars, 0)
        kept_words[idx] += np.where(kept, words, 0)
        bad[idx] |= has_bad
    return ids, n_lines, n_kept, kept_chars, kept_words, bad


@_typed_empty_on_no_docs(doc_id='int64', n_lines='int64', n_kept='int64', kept_chars='int64', kept_words='int64')
def docs_c4_line_clean(sf_dir: str):
    """C4 line-level cleaning: render 40-char lines, keep lines ending
    in terminal punctuation with >= 5 words, drop pages containing
    "lorem ipsum" / "{" or retaining < 3 lines. One short row per
    surviving document; zero exchange."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, n_lines, n_kept, kept_chars, kept_words, bad = \
            _line_features(batch)
        keep = (~bad) & (n_kept >= _MIN_KEPT)
        return pa.Table.from_pydict({
            "doc_id": ids[keep], "n_lines": n_lines[keep],
            "n_kept": n_kept[keep], "kept_chars": kept_chars[keep],
            "kept_words": kept_words[keep]})

    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=None).sort("doc_id")


_R_EXPR = f"(CAST(doc_id AS BIGINT) * {_MIX_A} + g * {_MIX_B}) % {_MOD}"

C4_LINE_CLEAN_SQL = f"""
WITH gs AS (
  SELECT doc_id, coalesce(text, '') AS txt,
         unnest(range(0, CAST(ceil(length(coalesce(text, ''))
                                   / {_LINE}.0) AS BIGINT))) AS g
  FROM documents),
lines AS (
  SELECT doc_id,
         substring(txt, 1 + {_LINE} * CAST(g AS INT), {_LINE})
         || CASE WHEN {_R_EXPR} = {_LOREM_R} THEN ' lorem ipsum.'
                 WHEN {_R_EXPR} = {_BRACE_R} THEN ' {{'
                 WHEN {_R_EXPR} % 3 <> 0 THEN '.'
                 ELSE '' END AS t
  FROM gs),
feat AS (
  SELECT doc_id,
         (t LIKE '%.') AND
           (length(t) - length(replace(t, ' ', '')) + 1)
             >= {_MIN_WORDS} AS kept,
         contains(t, 'lorem ipsum') OR contains(t, '{{') AS bad,
         CAST(length(t) AS BIGINT) AS chars,
         CAST(length(t) - length(replace(t, ' ', '')) + 1
              AS BIGINT) AS words
  FROM lines)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (kept) AS BIGINT) AS n_kept,
       CAST(coalesce(sum(chars) FILTER (kept), 0) AS BIGINT)
         AS kept_chars,
       CAST(coalesce(sum(words) FILTER (kept), 0) AS BIGINT)
         AS kept_words
FROM feat
GROUP BY doc_id
HAVING NOT bool_or(bad) AND count(*) FILTER (kept) >= {_MIN_KEPT}
ORDER BY doc_id
"""


@_typed_empty_on_no_docs(doc_id='int64', clean_text='object')
def docs_c4_clean_rewrite(sf_dir: str):
    """The REWRITE form of the C4 cleaner: surviving documents carry
    their retained lines re-joined with newlines (the text a training
    run would actually consume), not just counters. Same single
    zero-exchange pass; the per-doc join runs over already-filtered
    kept lines only. Output: (doc_id, clean_text)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.fill_null(txt, "")
        lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = len(ids)
        n_chunks = (lens + _LINE - 1) // _LINE
        n_kept = np.zeros(n, dtype=np.int64)
        bad = np.zeros(n, dtype=bool)
        kept_parent, kept_g, kept_txt = [], [], []
        for g in range(int(n_chunks.max()) if n else 0):
            sel = n_chunks > g
            idx = np.flatnonzero(sel)
            sl = pc.utf8_slice_codeunits(txt.filter(pa.array(sel)),
                                         _LINE * g, _LINE * (g + 1))
            r = (ids[idx] * _MIX_A + g * _MIX_B) % _MOD
            suffix = np.select(
                [r == _LOREM_R, r == _BRACE_R, r % 3 != 0],
                [" lorem ipsum.", " {", "."], default="")
            dec = pc.binary_join_element_wise(sl, pa.array(suffix), "")
            ends = pc.ends_with(dec, pattern=".") \
                .to_numpy(zero_copy_only=False)
            words = pc.count_substring(dec, " ") \
                .to_numpy(zero_copy_only=False).astype(np.int64) + 1
            has_bad = pc.or_(pc.match_substring(dec, "lorem ipsum"),
                             pc.match_substring(dec, "{")) \
                .to_numpy(zero_copy_only=False)
            kept = ends & (words >= _MIN_WORDS)
            n_kept[idx] += kept
            bad[idx] |= has_bad
            if kept.any():
                kidx = np.flatnonzero(kept)
                kept_parent.append(idx[kidx])
                kept_g.append(np.full(len(kidx), g, dtype=np.int64))
                kept_txt.append(
                    dec.take(pa.array(kidx)).to_numpy(
                        zero_copy_only=False))
        keep_doc = (~bad) & (n_kept >= _MIN_KEPT)
        if not kept_parent or not keep_doc.any():
            return pa.Table.from_pydict(
                {"doc_id": np.zeros(0, dtype=np.int64),
                 "clean_text": pa.array([], type=pa.string())})
        par = np.concatenate(kept_parent)
        gs = np.concatenate(kept_g)
        ts = np.concatenate(kept_txt)
        live = keep_doc[par]
        par, gs, ts = par[live], gs[live], ts[live]
        order = np.lexsort((gs, par))
        par, ts = par[order], ts[order]
        joined = pd.Series(ts).groupby(par).agg("\n".join)
        return pa.Table.from_pydict({
            "doc_id": ids[joined.index.to_numpy()],
            "clean_text": joined.to_numpy()})

    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=None).sort("doc_id")


C4_CLEAN_REWRITE_SQL = f"""
WITH gs AS (
  SELECT doc_id, coalesce(text, '') AS txt,
         unnest(range(0, CAST(ceil(length(coalesce(text, ''))
                                   / {_LINE}.0) AS BIGINT))) AS g
  FROM documents),
lines AS (
  SELECT doc_id, g,
         substring(txt, 1 + {_LINE} * CAST(g AS INT), {_LINE})
         || CASE WHEN {_R_EXPR} = {_LOREM_R} THEN ' lorem ipsum.'
                 WHEN {_R_EXPR} = {_BRACE_R} THEN ' {{'
                 WHEN {_R_EXPR} % 3 <> 0 THEN '.'
                 ELSE '' END AS t
  FROM gs),
feat AS (
  SELECT doc_id, g, t,
         (t LIKE '%.') AND
           (length(t) - length(replace(t, ' ', '')) + 1)
             >= {_MIN_WORDS} AS kept,
         contains(t, 'lorem ipsum') OR contains(t, '{{') AS bad
  FROM lines)
SELECT doc_id,
       string_agg(t, chr(10) ORDER BY g) FILTER (kept) AS clean_text
FROM feat
GROUP BY doc_id
HAVING NOT bool_or(bad) AND count(*) FILTER (kept) >= {_MIN_KEPT}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Badword blocklist gate (the C4 "List of Dirty, Naughty, Obscene ..."
# page drop: any page containing a blocklisted token is removed)
# ---------------------------------------------------------------------------

BADWORDS = ("dup", "lorem")     # corpus stand-in for the C4 blocklist


@_typed_empty_on_no_docs(doc_id='int64', n_tokens='int64')
def docs_badword_filter(sf_dir: str):
    """C4 blocklist page gate: drop any document whose whitespace token
    set intersects the blocklist; emit (doc_id, n_tokens) for survivors.

    Scale shape: one map_batches pass — tokenization is the zero-copy
    Arrow kernel shared with the corpus tier, membership is an Arrow
    ``is_in`` against the (tiny, task-constant) blocklist, the per-doc
    any-hit reduce is a ``bincount`` over list-parent indices. No token
    ever leaves its batch; output is one short row per kept doc."""
    from ..functions import text as T

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    bw = pa.array(list(BADWORDS))

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(pc.fill_null(txt, ""))),
            T.TOKEN_SPLIT_RE)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks) \
            .to_numpy(zero_copy_only=False)
        hit = pc.is_in(flat, value_set=bw).to_numpy(zero_copy_only=False)
        n = len(batch)
        bad = np.bincount(parent[hit], minlength=n) > 0 \
            if len(parent) else np.zeros(n, dtype=bool)
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = ~bad
        return pa.Table.from_pydict({"doc_id": ids[keep],
                                     "n_tokens": n_tok[keep]})

    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=None).sort("doc_id")


BADWORD_FILTER_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(lower(trim(coalesce(text, ''))),
                                      '\\s+')) AS BIGINT) AS n_tokens
FROM documents
WHERE NOT list_has_any(
        regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+'),
        {list(BADWORDS)})
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Domain-reputation filter (RefinedWeb-style whole-domain drop, but with
# the threshold LEARNED from the corpus instead of a fixed constant)
# ---------------------------------------------------------------------------

_N_SUB = 64                 # subdomains per source -> domain cardinality


def _domains(ids: np.ndarray, source) -> np.ndarray:
    """Deterministic subdomain per document (twin of `_DOMAIN_SQL`):
    64 subdomains per source, so the domain side has real cardinality
    instead of one row per source."""
    i = np.asarray(ids, dtype=np.int64)
    src = pd.Series(np.asarray(source, dtype=object)).fillna("")
    return ("w" + pd.Series(i % _N_SUB).astype(str) + "." + src
            + ".example.com").to_numpy()


_DOMAIN_SQL = f"""
  SELECT doc_id, source, n_chars,
         'w' || CAST(doc_id % {_N_SUB} AS VARCHAR) || '.' || source
             || '.example.com' AS domain
  FROM documents
"""


def docs_domain_reputation_filter(sf_dir: str):
    """Two-pass domain-reputation gate with a corpus-learned threshold:
    pass 1 pre-reduces (domain, sum(n_chars), count) partials into one
    vocabulary-sized exchange; the global mean chars/doc (integer,
    floor) comes from the SAME partials at no extra pass; domains whose
    integer mean >= the global mean pass, and the passing-domain set
    broadcasts back as a semi-join filter (domain vocabulary is
    crawl-host-sized — at true web scale swap the broadcast for the
    byte-capped semi-join exchange the dedup tier uses). Output: per
    source, surviving doc count + chars."""
    import ray
    from ray.data.aggregate import Sum as _Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dom = _domains(ids, batch.column("source")
                       .to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "domain": dom,
            "c": batch.column("n_chars").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "n": np.ones(len(batch), dtype=np.int64)})
        return pa.Table.from_pandas(
            df.groupby("domain", as_index=False).sum(),
            preserve_index=False).replace_schema_metadata(None)

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
           .groupby("domain")
           .aggregate(_Sum("c", alias_name="c"),
                      _Sum("n", alias_name="n"))
           .to_pandas())
    if agg.empty:
        return pd.DataFrame({"source": pd.Series(dtype="object"),
                             "n_docs_kept": pd.Series(dtype="int64"),
                             "n_chars_kept": pd.Series(dtype="int64")})
    thr = int(agg["c"].sum()) // int(agg["n"].sum())
    # integer cross-multiplied mean test: c // n >= thr
    passing = np.sort(agg.loc[agg["c"] // agg["n"] >= thr, "domain"]
                      .to_numpy())
    pass_ref = ray.put(passing)

    def gate(batch: pa.Table) -> pa.Table:
        ok = ray.get(pass_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dom = _domains(ids, batch.column("source")
                       .to_numpy(zero_copy_only=False))
        mask = np.isin(dom, ok)          # vectorized membership
        src = batch.column("source").to_numpy(zero_copy_only=False)
        chars = batch.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        df = pd.DataFrame({"source": src[mask], "c": chars[mask],
                           "n": np.ones(int(mask.sum()),
                                        dtype=np.int64)})
        g = df.groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    out = (ds.map_batches(gate, batch_format="pyarrow", batch_size=None)
           .groupby("source")
           .aggregate(_Sum("c", alias_name="n_chars_kept"),
                      _Sum("n", alias_name="n_docs_kept"))
           .to_pandas())
    out = out.astype({"n_chars_kept": "int64", "n_docs_kept": "int64"})
    return out[["source", "n_docs_kept", "n_chars_kept"]] \
        .sort_values("source").reset_index(drop=True)


DOMAIN_REPUTATION_SQL = f"""
WITH d AS ({_DOMAIN_SQL}),
g AS (SELECT domain, CAST(sum(n_chars) AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY domain),
thr AS (SELECT CAST(sum(c) // sum(n) AS BIGINT) AS t FROM g),
keep AS (SELECT domain FROM g, thr WHERE c // n >= t)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs_kept,
       CAST(sum(d.n_chars) AS BIGINT) AS n_chars_kept
FROM d JOIN keep USING (domain)
GROUP BY d.source ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# Site-template boilerplate (RefinedWeb-style): lines repeating across
# a large fraction of one site's pages are navigation/header/footer
# boilerplate, not content — detect them per source and strip them.
# The deterministic page render plants a real header and footer line
# per source (every page of a site shares them), so the detector has
# genuine cross-document structure to find, and the whole derivation
# stays SQL-replicable for the oracle.
# ---------------------------------------------------------------------------

_TPL_MIN_DOCS = 2               # line must appear in >= 2 docs ...
_TPL_FRAC_NUM, _TPL_FRAC_DEN = 3, 10    # ... and >= 30% of site docs


def _render_site_lines(batch: pa.Table):
    """(doc_id, source, text) -> flat (doc_id, source, ln, t) line rows:
    a per-site header (ln = -1), the 40-char content chunks (ln = g),
    and a per-site footer (ln = 10^9). Chunk slicing is one vectorized
    Arrow kernel per line INDEX (cf. `_line_features`)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    src = batch.column("source").to_numpy(zero_copy_only=False)
    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_chunks = (lens + _LINE - 1) // _LINE

    out_id = [ids, ids]
    out_src = [src, src]
    out_ln = [np.full(len(ids), -1, dtype=np.int64),
              np.full(len(ids), 1_000_000_000, dtype=np.int64)]
    out_t = [np.char.add(np.char.add("== ", src.astype(str)),
                         " header =="),
             np.char.add(np.char.add("-- ", src.astype(str)),
                         " footer --")]
    for g in range(int(n_chunks.max()) if len(ids) else 0):
        sel = n_chunks > g
        idx = np.flatnonzero(sel)
        sl = pc.utf8_slice_codeunits(txt.filter(pa.array(sel)),
                                     _LINE * g, _LINE * (g + 1))
        out_id.append(ids[idx])
        out_src.append(src[idx])
        out_ln.append(np.full(len(idx), g, dtype=np.int64))
        out_t.append(sl.to_numpy(zero_copy_only=False))
    return (np.concatenate(out_id), np.concatenate(out_src),
            np.concatenate(out_ln),
            np.concatenate([np.asarray(t, dtype=object)
                            for t in out_t]))


def _template_counts(sf_dir: str):
    """(source, t, nd) dataset: per-(site, line) distinct-document
    counts. A document's lines are batch-local, so the per-(doc, line)
    dedup completes inside the batch and the exchange moves one partial
    row per (source, line, batch) — never line instances."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        ids, src, _ln, t = _render_site_lines(batch)
        df = pd.DataFrame({"doc_id": ids, "source": src, "t": t}) \
            .drop_duplicates()
        g = df.groupby(["source", "t"], as_index=False).size() \
            .rename(columns={"size": "nd"}).astype({"nd": "int64"})
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

    from ray.data.aggregate import Sum as _Sum
    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby(["source", "t"]).aggregate(_Sum("nd",
                                                     alias_name="nd")))


def _source_totals(sf_dir: str) -> dict:
    import duckdb
    con = duckdb.connect()
    q = con.sql(f"SELECT source, CAST(count(*) AS BIGINT) n FROM "
                f"read_parquet('{sf_dir}/documents.parquet') "
                f"GROUP BY source")
    return dict(q.fetchall())


def docs_template_lines(sf_dir: str):
    """Per-site template profile: (source, n_docs, n_template_lines) —
    lines shared by >= {_TPL_MIN_DOCS} docs and >= 30% of the site's
    pages. Site doc totals (one row per site) broadcast into the flag
    stage; the (source, line) counts never leave the exchange
    unaggregated."""
    import ray
    from ray.data.aggregate import Sum as _Sum

    totals = _source_totals(sf_dir)
    if not totals:
        return pd.DataFrame({
            "source": pd.Series(dtype="object"),
            "n_docs": pd.Series(dtype="int64"),
            "n_template_lines": pd.Series(dtype="int64")})
    tot_ref = ray.put(totals)

    def flag(batch: pa.Table) -> pa.Table:
        tot = ray.get(tot_ref)
        src = batch["source"].to_numpy(zero_copy_only=False)
        nd = batch["nd"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = np.array([tot.get(s, 0) for s in src], dtype=np.int64)
        is_tpl = (nd >= _TPL_MIN_DOCS) \
            & (nd * _TPL_FRAC_DEN >= n_docs * _TPL_FRAC_NUM)
        return pa.Table.from_pydict({
            "source": src, "n_template_lines": is_tpl.astype(np.int64)})

    agg = (_template_counts(sf_dir)
           .map_batches(flag, batch_format="pyarrow", batch_size=None)
           .groupby("source")
           .aggregate(_Sum("n_template_lines",
                           alias_name="n_template_lines"))
           .to_pandas())
    out = pd.DataFrame({"source": sorted(totals)})
    out["n_docs"] = out["source"].map(totals).astype("int64")
    agg_m = dict(zip(agg.get("source", []),
                     agg.get("n_template_lines", [])))
    out["n_template_lines"] = out["source"].map(agg_m).fillna(0) \
        .astype("int64")
    return out


_SITE_LINES_SQL = f"""
gs AS (
  SELECT doc_id, source, coalesce(text, '') AS txt,
         unnest(range(0, CAST(ceil(length(coalesce(text, ''))
                                   / {_LINE}.0) AS BIGINT))) AS g
  FROM documents),
lines AS (
  SELECT doc_id, source, CAST(-1 AS BIGINT) AS ln,
         '== ' || source || ' header ==' AS t FROM documents
  UNION ALL
  SELECT doc_id, source, g,
         substring(txt, 1 + {_LINE} * CAST(g AS INT), {_LINE}) FROM gs
  UNION ALL
  SELECT doc_id, source, CAST(1000000000 AS BIGINT),
         '-- ' || source || ' footer --' FROM documents),
cnt AS (
  SELECT source, t, CAST(count(*) AS BIGINT) AS nd
  FROM (SELECT DISTINCT doc_id, source, t FROM lines)
  GROUP BY source, t),
tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source),
tpl AS (SELECT c.source, c.t FROM cnt c JOIN tot USING (source)
        WHERE c.nd >= {_TPL_MIN_DOCS}
          AND c.nd * {_TPL_FRAC_DEN} >= tot.n_docs * {_TPL_FRAC_NUM})
"""

TEMPLATE_LINES_SQL = f"""
WITH {_SITE_LINES_SQL}
SELECT tot.source, tot.n_docs,
       CAST(count(tpl.t) AS BIGINT) AS n_template_lines
FROM tot LEFT JOIN tpl ON tpl.source = tot.source
GROUP BY tot.source, tot.n_docs ORDER BY tot.source
"""


def docs_template_strip_rewrite(sf_dir: str):
    """The REWRITE form: every document with its site's template lines
    removed, content order preserved — (doc_id, text_kept). The
    template vocabulary (a handful of lines per site) collects once
    and broadcasts via ``ray.put``; at true crawl scale swap the
    broadcast for the byte-capped semi-join exchange the dedup tier
    uses (same fallback noted on the domain gate)."""
    import ray

    totals = _source_totals(sf_dir)
    if not totals:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "text_kept": pd.Series(dtype="object")})

    cnt = _template_counts(sf_dir).to_pandas()
    nd = cnt["nd"].astype(np.int64)
    n_docs = cnt["source"].map(totals).astype(np.int64)
    tpl = cnt[(nd >= _TPL_MIN_DOCS)
              & (nd * _TPL_FRAC_DEN >= n_docs * _TPL_FRAC_NUM)]
    tpl_keys = np.sort((tpl["source"].astype(str) + "\x00"
                        + tpl["t"].astype(str)).to_numpy())
    tpl_ref = ray.put(tpl_keys)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])

    def strip(batch: pa.Table) -> pa.Table:
        keys = ray.get(tpl_ref)
        ids, src, ln, t = _render_site_lines(batch)
        k = np.char.add(np.char.add(src.astype(str), "\x00"),
                        t.astype(str))
        keep = ~np.isin(k, keys)
        ids_k, ln_k, t_k = ids[keep], ln[keep], t[keep]
        order = np.lexsort((ln_k, ids_k))
        ids_k, t_k = ids_k[order], t_k[order]
        if len(ids_k):
            joined = pd.Series(t_k).groupby(ids_k).agg("\n".join)
        else:
            joined = pd.Series(dtype="object")
        all_ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        txt = joined.reindex(all_ids).fillna("").to_numpy()
        return pa.Table.from_pydict({"doc_id": all_ids,
                                     "text_kept": txt})

    return ds.map_batches(strip, batch_format="pyarrow",
                          batch_size=None).sort("doc_id")


TEMPLATE_STRIP_SQL = f"""
WITH {_SITE_LINES_SQL},
keep AS (
  SELECT l.doc_id, l.ln, l.t FROM lines l
  LEFT JOIN tpl ON tpl.source = l.source AND tpl.t = l.t
  WHERE tpl.t IS NULL),
agg AS (
  SELECT doc_id, string_agg(t, chr(10) ORDER BY ln) AS text_kept
  FROM keep GROUP BY doc_id)
SELECT d.doc_id, coalesce(agg.text_kept, '') AS text_kept
FROM documents d LEFT JOIN agg USING (doc_id)
ORDER BY d.doc_id
"""


def template_detector_eval(sf_dir: str):
    """Detector-quality eval: precision/recall of the site-template
    line detector against the PLANTED ground truth (the render plants
    exactly one header and one footer line per site, so truth is known
    bit-exactly). Per site: predicted template lines, true planted
    lines (always 2), TP/FP/FN and precision/recall — the eval table a
    curation team reads before trusting a boilerplate stripper on a
    new crawl. A 1-doc site legitimately scores recall 0 (the >= 2-doc
    evidence rule cannot fire), which the oracle reproduces.

    Scale shape: identical to ``docs_template_lines`` — the exchange
    moves per-(site, line) pre-reduced counts only; truth membership
    is a string comparison against the site's two known planted lines,
    computed map-side."""
    import ray
    from ray.data.aggregate import Sum

    totals = _source_totals(sf_dir)
    if not totals:
        return pd.DataFrame({
            "source": pd.Series(dtype="object"),
            "n_pred": pd.Series(dtype="int64"),
            "n_true": pd.Series(dtype="int64"),
            "tp": pd.Series(dtype="int64"),
            "fp": pd.Series(dtype="int64"),
            "fn": pd.Series(dtype="int64"),
            "precision": pd.Series(dtype="float64"),
            "recall": pd.Series(dtype="float64")})
    tot_ref = ray.put(totals)

    def flag(batch: pa.Table) -> pa.Table:
        tot = ray.get(tot_ref)
        src = batch["source"].to_numpy(zero_copy_only=False)
        t = batch["t"].to_numpy(zero_copy_only=False)
        nd = batch["nd"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_docs = np.array([tot.get(s, 0) for s in src], dtype=np.int64)
        is_tpl = (nd >= _TPL_MIN_DOCS) \
            & (nd * _TPL_FRAC_DEN >= n_docs * _TPL_FRAC_NUM)
        s = src.astype(str)
        is_true = (t == np.char.add(np.char.add("== ", s), " header ==")) \
            | (t == np.char.add(np.char.add("-- ", s), " footer --"))
        return pa.Table.from_pydict({
            "source": src,
            "n_pred": is_tpl.astype(np.int64),
            "tp": (is_tpl & is_true).astype(np.int64)})

    agg = (_template_counts(sf_dir)
           .map_batches(flag, batch_format="pyarrow", batch_size=None)
           .groupby("source")
           .aggregate(Sum("n_pred", alias_name="n_pred"),
                      Sum("tp", alias_name="tp"))
           .to_pandas())
    out = pd.DataFrame({"source": sorted(totals)})
    for c in ("n_pred", "tp"):
        m = dict(zip(agg.get("source", []), agg.get(c, [])))
        out[c] = out["source"].map(m).fillna(0).astype("int64")
    out["n_true"] = np.int64(2)
    out["fp"] = (out["n_pred"] - out["tp"]).astype("int64")
    out["fn"] = (out["n_true"] - out["tp"]).astype("int64")
    out["precision"] = np.where(out["n_pred"] > 0,
                                out["tp"] / out["n_pred"].replace(0, 1),
                                0.0)
    out["recall"] = out["tp"] / 2.0
    return out[["source", "n_pred", "n_true", "tp", "fp", "fn",
                "precision", "recall"]]


TEMPLATE_DETECTOR_EVAL_SQL = f"""
WITH {_SITE_LINES_SQL},
ev AS (
  SELECT tpl.source,
         CASE WHEN tpl.t = '== ' || tpl.source || ' header =='
                OR tpl.t = '-- ' || tpl.source || ' footer --'
              THEN 1 ELSE 0 END AS is_true
  FROM tpl),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_pred,
         CAST(sum(is_true) AS BIGINT) AS tp
  FROM ev GROUP BY source)
SELECT tot.source,
       CAST(coalesce(agg.n_pred, 0) AS BIGINT) AS n_pred,
       CAST(2 AS BIGINT) AS n_true,
       CAST(coalesce(agg.tp, 0) AS BIGINT) AS tp,
       CAST(coalesce(agg.n_pred, 0) - coalesce(agg.tp, 0) AS BIGINT)
           AS fp,
       CAST(2 - coalesce(agg.tp, 0) AS BIGINT) AS fn,
       CASE WHEN coalesce(agg.n_pred, 0) > 0
            THEN CAST(agg.tp AS DOUBLE) / agg.n_pred
            ELSE 0.0 END AS precision,
       CAST(coalesce(agg.tp, 0) AS DOUBLE) / 2 AS recall
FROM tot LEFT JOIN agg USING (source)
ORDER BY tot.source
"""


# ---------------------------------------------------------------------------
# JusText-style block classifier (stopword density + link density +
# context smoothing — Pomikálek 2011; the trafilatura/readability
# boilerplate heuristic the north rule names)
# ---------------------------------------------------------------------------

JX_A = 999983               # line-decoration mix (doc term)
JX_B = 6007                 # line-decoration mix (line term)
JX_MOD = 1000
JX_LINK_SUFFIX = " <a>nav menu links</a>"     # r % 7 == 2: nav line
JX_STOP_SUFFIX = " the and of to in."         # r % 3 == 0: prose line
JX_STOPWORDS = ("the", "and", "of", "to", "in")
JX_SHORT_CHARS = 25         # JusText length_low analog
JX_STOP_MIN_X1E6 = 250_000  # stopwords_high analog

_CLS_GOOD, _CLS_BAD, _CLS_SHORT, _CLS_NEAR = 0, 1, 2, 3


def _justext_lines(batch: pa.Table):
    """Flat per-line arrays (parent doc index, line no, chars,
    stop_density_x1e6, linked) for one batch, in (doc, line) order —
    same 40-char render as the C4 tier, with its OWN deterministic
    decoration: ``r = (doc_id*JX_A + g*JX_B) % JX_MOD`` plants a
    link-navigation suffix on r%7==2 lines and a stopword-rich prose
    suffix on r%3==0 lines (link wins when both fire)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    txt = pc.fill_null(txt, "")
    lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_chunks = (lens + _LINE - 1) // _LINE
    parts: list[tuple] = []
    for g in range(int(n_chunks.max()) if len(ids) else 0):
        sel = n_chunks > g
        idx = np.flatnonzero(sel)
        sl = pc.utf8_slice_codeunits(txt.filter(pa.array(sel)),
                                     _LINE * g, _LINE * (g + 1))
        r = (ids[idx] * JX_A + g * JX_B) % JX_MOD
        suffix = np.select([r % 7 == 2, r % 3 == 0],
                           [JX_LINK_SUFFIX, JX_STOP_SUFFIX], default="")
        dec = pc.binary_join_element_wise(sl, pa.array(suffix), "")
        linked = pc.match_substring(dec, "<a>") \
            .to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(dec).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        words = pc.count_substring(dec, " ") \
            .to_numpy(zero_copy_only=False).astype(np.int64) + 1
        from ..functions.arrow_utils import as_array
        toks = as_array(pc.split_pattern_regex(pc.utf8_lower(dec),
                                               r"\s+"))
        flat = as_array(pc.list_flatten(toks))
        par = as_array(pc.list_parent_indices(toks)) \
            .to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=pa.array(JX_STOPWORDS)) \
            .to_numpy(zero_copy_only=False)
        stop_cnt = np.zeros(len(idx), dtype=np.int64)
        np.add.at(stop_cnt, par[is_stop], 1)
        parts.append((idx, np.full(len(idx), g, dtype=np.int64), chars,
                      (stop_cnt * 1_000_000) // words, linked))
    if not parts:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z, np.zeros(0, dtype=bool)
    parent = np.concatenate([p[0] for p in parts])
    gno = np.concatenate([p[1] for p in parts])
    order = np.lexsort((gno, parent))
    return (parent[order], gno[order],
            np.concatenate([p[2] for p in parts])[order],
            np.concatenate([p[3] for p in parts])[order],
            np.concatenate([p[4] for p in parts])[order])


def docs_justext_blocks(sf_dir: str):
    """JusText-style main-content block classification over the
    rendered lines: context-free classes first (bad = link-navigation,
    short = under {JX_SHORT_CHARS} chars, good = stopword density >=
    0.25 with enough length, near-good otherwise), then ONE
    context-smoothing pass — a short/near-good line joins the content
    iff an adjacent line of the same document is context-free good
    (Pomikálek 2011's neighbor rule, deterministic single pass). The
    whole operator is batch-local (lines never cross the exchange);
    the oracle replays render + both passes with LAG/LEAD windows.
    Output: (doc_id, n_lines, n_good, n_bad, content_chars)."""
    from .corpus import _n_docs
    if _n_docs(sf_dir) == 0:       # typed empty, like the sibling ops
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                             ("doc_id", "n_lines", "n_good", "n_bad",
                              "content_chars")})
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parent, gno, chars, stopd, linked = _justext_lines(batch)
        cls0 = np.select(
            [linked, chars < JX_SHORT_CHARS,
             stopd >= JX_STOP_MIN_X1E6],
            [_CLS_BAD, _CLS_SHORT, _CLS_GOOD], default=_CLS_NEAR)
        good0 = cls0 == _CLS_GOOD
        same_prev = np.zeros(len(parent), dtype=bool)
        same_next = np.zeros(len(parent), dtype=bool)
        if len(parent) > 1:
            same_prev[1:] = parent[1:] == parent[:-1]
            same_next[:-1] = parent[:-1] == parent[1:]
        prev_good = np.zeros(len(parent), dtype=bool)
        next_good = np.zeros(len(parent), dtype=bool)
        if len(parent) > 1:
            prev_good[1:] = good0[:-1] & same_prev[1:]
            next_good[:-1] = good0[1:] & same_next[:-1]
        undecided = (cls0 == _CLS_SHORT) | (cls0 == _CLS_NEAR)
        final_good = good0 | (undecided & (prev_good | next_good))
        n = len(ids)
        n_lines = np.bincount(parent, minlength=n).astype(np.int64)
        n_good = np.bincount(parent[final_good], minlength=n) \
            .astype(np.int64)
        content = np.zeros(n, dtype=np.int64)
        np.add.at(content, parent[final_good], chars[final_good])
        has = n_lines > 0
        return pa.Table.from_pydict({
            "doc_id": ids[has], "n_lines": n_lines[has],
            "n_good": n_good[has],
            "n_bad": (n_lines - n_good)[has],
            "content_chars": content[has]})

    return ds.map_batches(fn, batch_format="pyarrow",
                          batch_size=None).sort("doc_id")


_JXR = f"(CAST(doc_id AS BIGINT) * {JX_A} + g * {JX_B}) % {JX_MOD}"

JUSTEXT_SQL = f"""
WITH gs AS (
  SELECT doc_id, coalesce(text, '') AS txt,
         unnest(range(0, CAST(ceil(length(coalesce(text, ''))
                                   / {_LINE}.0) AS BIGINT))) AS g
  FROM documents),
lines AS (
  SELECT doc_id, g,
         substring(txt, 1 + {_LINE} * CAST(g AS INT), {_LINE})
         || CASE WHEN {_JXR} % 7 = 2 THEN '{JX_LINK_SUFFIX}'
                 WHEN {_JXR} % 3 = 0 THEN '{JX_STOP_SUFFIX}'
                 ELSE '' END AS t
  FROM gs),
feat AS (
  SELECT doc_id, g, CAST(length(t) AS BIGINT) AS chars,
         contains(t, '<a>') AS linked,
         CAST(len(list_filter(
                regexp_split_to_array(lower(t), '\\s+'),
                x -> x IN ({", ".join(f"'{s}'" for s in JX_STOPWORDS)})))
              AS BIGINT) * 1000000
           // (length(t) - length(replace(t, ' ', '')) + 1) AS stopd
  FROM lines),
cls AS (
  SELECT doc_id, g, chars,
         CASE WHEN linked THEN {_CLS_BAD}
              WHEN chars < {JX_SHORT_CHARS} THEN {_CLS_SHORT}
              WHEN stopd >= {JX_STOP_MIN_X1E6} THEN {_CLS_GOOD}
              ELSE {_CLS_NEAR} END AS c0
  FROM feat),
ctx AS (
  SELECT doc_id, g, chars, c0,
         LAG(c0) OVER w AS pc, LEAD(c0) OVER w AS nc
  FROM cls WINDOW w AS (PARTITION BY doc_id ORDER BY g)),
fin AS (
  SELECT doc_id, chars,
         coalesce((c0 = {_CLS_GOOD}) OR
                  (c0 IN ({_CLS_SHORT}, {_CLS_NEAR})
                   AND ({_CLS_GOOD} IN (pc, nc))),
                  FALSE) AS good     -- edge lines: NULL neighbor, not good
  FROM ctx)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (good) AS BIGINT) AS n_good,
       CAST(count(*) FILTER (NOT good) AS BIGINT) AS n_bad,
       CAST(coalesce(sum(chars) FILTER (good), 0) AS BIGINT)
           AS content_chars
FROM fin GROUP BY doc_id ORDER BY doc_id
"""


CLEANING_QUERIES: dict[str, tuple] = {
    "docs_justext_blocks": (docs_justext_blocks, JUSTEXT_SQL),
    "docs_c4_line_clean": (docs_c4_line_clean, C4_LINE_CLEAN_SQL),
    "docs_c4_clean_rewrite": (docs_c4_clean_rewrite,
                              C4_CLEAN_REWRITE_SQL),
    "docs_domain_reputation_filter": (docs_domain_reputation_filter,
                                      DOMAIN_REPUTATION_SQL),
    "docs_badword_filter": (docs_badword_filter, BADWORD_FILTER_SQL),
    "docs_template_lines": (docs_template_lines, TEMPLATE_LINES_SQL),
    "docs_template_strip_rewrite": (docs_template_strip_rewrite,
                                    TEMPLATE_STRIP_SQL),
    "template_detector_eval": (template_detector_eval,
                               TEMPLATE_DETECTOR_EVAL_SQL),
}
