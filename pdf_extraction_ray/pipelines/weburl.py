"""URL-tier operators: canonicalization-keyed dedup and per-domain
rollups over the crawl's URL space.

The ``documents`` table carries no URL column, so each query first
synthesizes a deterministic *messy* URL per document from
``(doc_id, source)`` — uppercase scheme/host, explicit default port,
``www.`` prefix, duplicate path slashes, tracking params, shuffled
query order, fragments — with the SAME expression in Ray and in the
DuckDB oracle. The normalization kernel (``functions/urlnorm.py``) then
has real work to undo, and the driver's rows+schema+hash gate covers
synthesis + canonicalization + aggregation end to end. Three raw forms
map onto ONE canonical URL per (source, doc_id mod 40, has-query)
cell, so the dedup genuinely merges distinct raw strings.

Scale shape: synthesis + canonicalization are vectorized map_batches
over (doc_id, source[, lang, n_chars]) columns only (the text never
ships); the groupbys move one short key row per document, and the
domain rollup pre-compacts on (domain, lang) before the final
domain-level exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .corpus import _typed_empty_on_no_docs
from ray.data.aggregate import Count, Min, Sum

from ..functions.urlnorm import normalize_urls

_N_PATHS = 40


def synthesize_urls(doc_id: np.ndarray, source: pd.Series) -> pd.Series:
    """Deterministic messy URL per document (twin of ``_URL_SYNTH_SQL``)."""
    i = pd.Series(np.asarray(doc_id, dtype=np.int64))
    src = pd.Series(np.asarray(source, dtype=object)).fillna("")
    base = ("HTTPS://WWW." + src + ".Example.COM:443/cat/"
            + (i % _N_PATHS).astype(str) + "//item")
    t0 = "/?utm_source=" + i.astype(str) + "&b=2&a=1#sec"
    t1 = "?b=2&a=1&utm_campaign=x"
    tail = pd.Series(np.select([i % 3 == 0, i % 3 == 1],
                               [t0, t1], default="/"))
    return base + tail


_URL_SYNTH_SQL = f"""
  SELECT doc_id, lang, n_chars,
         'HTTPS://WWW.' || source || '.Example.COM:443/cat/'
           || CAST(doc_id % {_N_PATHS} AS VARCHAR) || '//item'
           || CASE WHEN doc_id % 3 = 0
                   THEN '/?utm_source=' || CAST(doc_id AS VARCHAR)
                        || '&b=2&a=1#sec'
                   WHEN doc_id % 3 = 1 THEN '?b=2&a=1&utm_campaign=x'
                   ELSE '/' END AS url
  FROM documents
"""

# The oracle re-states the urlnorm rule set in SQL (specialized to the
# https scheme the synthesizer emits — scheme-conditional port rules
# need non-constant regex patterns; generality is covered by the
# urllib differential fuzz in tests/test_weburl.py):
_URL_NORM_SQL = r"""
  SELECT doc_id, lang, n_chars,
         regexp_replace(regexp_replace(
             lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)),
             ':443$', ''), '^www\.', '') AS host,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1)
             AS rawpath,
         CASE WHEN url LIKE '%?%'
              THEN regexp_extract(url, '\?([^#]*)', 1) ELSE '' END AS rawq
  FROM u
"""

_URL_CANON_SQL = r"""
  SELECT doc_id, lang, n_chars, host,
         'https://' || host
         || CASE WHEN p <> '/' AND p LIKE '%/'
                 THEN substring(p, 1, length(p) - 1) ELSE p END
         || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS url_norm
  FROM (SELECT doc_id, lang, n_chars, host,
               regexp_replace(rawpath, '/{2,}', '/', 'g') AS p,
               array_to_string(list_sort(list_filter(
                   string_split(rawq, '&'),
                   x -> x <> '' AND NOT starts_with(x, 'utm_')
                        AND NOT starts_with(x, 'fbclid=')
                        AND NOT starts_with(x, 'gclid=')
                        AND NOT starts_with(x, 'msclkid=')
                        AND x NOT IN ('fbclid', 'gclid', 'msclkid'))),
                   '&') AS q
        FROM parts)
"""


def _canon_batch(batch: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    urls = synthesize_urls(ids, batch.column("source").to_pandas())
    norm = normalize_urls(urls)
    out = {"doc_id": ids.astype(np.int64), "url_norm": norm.to_numpy()}
    if "host" in cols:
        out["host"] = norm.str.extract(
            r"^https://([^/?#]*)")[0].to_numpy()
    for c in cols:
        if c in batch.column_names:
            out[c] = batch.column(c).to_numpy(zero_copy_only=False)
    return pa.Table.from_pydict(out)


def docs_url_dedup(sf_dir: str):
    """Canonical-URL dedup: distinct raw URLs that normalize to one
    canonical form collapse into a group keyed by ``url_norm``;
    representative = min doc_id. The string key hash-partitions the
    one exchange; only (url_norm, doc_id) rows move."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return (ds.map_batches(lambda b: _canon_batch(b, ()),
                           batch_format="pyarrow", batch_size=None)
            .groupby("url_norm")
            .aggregate(Min("doc_id", alias_name="rep_doc_id"),
                       Count(alias_name="n_docs"))
            .sort("url_norm"))


URL_DEDUP_SQL = f"""
WITH u AS ({_URL_SYNTH_SQL}),
parts AS ({_URL_NORM_SQL}),
n AS ({_URL_CANON_SQL})
SELECT url_norm, MIN(doc_id) AS rep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM n GROUP BY url_norm ORDER BY url_norm
"""


@_typed_empty_on_no_docs(domain='object', n_docs='int64', n_chars='int64', n_langs='int64')
def docs_domain_stats(sf_dir: str):
    """Per-domain crawl rollup: doc count, total chars, distinct
    languages. Two-level aggregation — batches pre-compact to
    (domain, lang) partials inside the scan, the (domain, lang) table
    (vocabulary-sized) takes the first exchange, and the final
    domain-level groupby folds partials only."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "lang", "n_chars"])

    def pairs(batch: pa.Table) -> pa.Table:
        t = _canon_batch(batch, ("host", "lang", "n_chars"))
        df = t.select(["host", "lang", "n_chars"]).to_pandas()
        g = df.groupby(["host", "lang"], as_index=False) \
            .agg(n_docs=("n_chars", "size"), n_chars=("n_chars", "sum"))
        g = g.rename(columns={"host": "domain"})
        return pa.Table.from_pandas(g, preserve_index=False)

    per_lang = (ds.map_batches(pairs, batch_format="pyarrow",
                               batch_size=None)
                .groupby(["domain", "lang"])
                .aggregate(Sum("n_docs", alias_name="n_docs"),
                           Sum("n_chars", alias_name="n_chars")))
    out = (per_lang.groupby("domain")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_chars", alias_name="n_chars"),
                      Count(alias_name="n_langs"))
           .sort("domain").to_pandas())
    return out.astype({"n_docs": "int64", "n_chars": "int64",
                       "n_langs": "int64"})


DOMAIN_STATS_SQL = f"""
WITH u AS ({_URL_SYNTH_SQL}),
parts AS ({_URL_NORM_SQL}),
n AS ({_URL_CANON_SQL})
SELECT host AS domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM n GROUP BY domain ORDER BY domain
"""


WEBURL_QUERIES: dict[str, tuple] = {
    "docs_url_dedup": (docs_url_dedup, URL_DEDUP_SQL),
    "docs_domain_stats": (docs_domain_stats, DOMAIN_STATS_SQL),
}
