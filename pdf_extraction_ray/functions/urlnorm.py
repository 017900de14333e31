"""URL canonicalization: the first transform of every crawl pipeline.

Two URLs that differ only in scheme/host case, a default port, a
``www.`` prefix, duplicate or trailing path slashes, tracking
parameters, query-parameter order, or a fragment fetch the same
resource — crawl frontiers and URL-level dedup must key on the
canonical form or they re-crawl/re-keep the same page endlessly.

Two implementations of ONE rule set:

- ``normalize_urls`` — the production kernel: vectorized pandas/numpy
  (C-level regex extract/replace; the query-param sort runs as one
  explode -> filter -> lexsort -> group-join, never a per-row python
  loop).
- ``url_normalize_ref`` — a pure-python ``urllib.parse`` reference,
  used by the differential fuzz tests (the same twin-implementation
  pattern as ``functions/counters.py`` / ``functions/bpe.py``).

Rule set (documented here, asserted by tests):
  1. only strings matching ``scheme://...`` are touched; anything else
     passes through unchanged (relative refs are not canonicalizable
     without a base);
  2. scheme and host:port lowercase;
  3. the scheme's default port is stripped (http:80, https:443);
  4. a leading ``www.`` is stripped from the host;
  5. runs of ``/`` in the path collapse to one; a trailing ``/`` is
     stripped unless the path is exactly ``/``; an absent path stays
     empty;
  6. query parameters: empties and tracking params (``utm_*``,
     ``fbclid``, ``gclid``, ``msclkid``) are dropped, the rest sort
     byte-lexicographically and rejoin with ``&``; an emptied query
     drops its ``?``;
  7. the fragment is dropped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_URL_RE = (r'^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)'
           r'(?:\?([^#]*))?(?:#.*)?$')
_DEFAULT_PORT = {"http": ":80", "https": ":443"}
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "msclkid=")
TRACKING_NAMES = ("fbclid", "gclid", "msclkid")


def normalize_urls(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalization; index-preserving. Non-URL entries
    (no ``scheme://``) return unchanged."""
    s = urls.fillna("").astype(str)
    flat = s.reset_index(drop=True)            # positional work frame
    m = flat.str.extract(_URL_RE)
    ok = m[0].notna()
    if not ok.any():
        return s
    scheme = m[0].str.lower()
    host = m[1].str.lower()
    for sch, port in _DEFAULT_PORT.items():
        sel = ok & scheme.eq(sch) & host.str.endswith(port)
        host[sel] = host[sel].str[:-len(port)]
    host = host.str.replace(r"^www\.", "", regex=True)
    path = m[2].fillna("").str.replace(r"/{2,}", "/", regex=True)
    strip = path.str.endswith("/") & path.ne("/")
    path = path.mask(strip, path.str[:-1])

    # query params: explode -> drop empties/tracking -> stable
    # lexicographic sort within each row -> rejoin
    q = m[3].fillna("")
    qn = pd.Series("", index=flat.index)
    has_q = ok & q.ne("")
    if has_q.any():
        parts = q[has_q].str.split("&").explode()
        keep = parts.ne("") & ~parts.str.startswith(TRACKING_PREFIXES) \
            & ~parts.isin(TRACKING_NAMES)
        parts = parts[keep]
        if len(parts):
            frame = parts.reset_index()
            frame.columns = ["row", "p"]
            frame = frame.sort_values(["row", "p"], kind="stable")
            joined = frame.groupby("row")["p"].agg("&".join)
            qn.update(joined)

    norm = scheme.str.cat(host, sep="://").str.cat(path) \
        + np.where(qn.ne(""), "?" + qn, "")
    out = flat.mask(ok, norm)
    out.index = s.index
    return out


def url_normalize_ref(url: str) -> str:
    """Pure ``urllib.parse`` reference for the SAME rule set."""
    from urllib.parse import urlsplit

    try:
        sp = urlsplit(url)
    except ValueError:
        return url
    if not sp.scheme or "://" not in url:
        return url
    scheme = sp.scheme.lower()
    host = sp.netloc.lower()
    port = _DEFAULT_PORT.get(scheme)
    if port and host.endswith(port):
        host = host[:-len(port)]
    if host.startswith("www."):
        host = host[4:]
    path = sp.path
    while "//" in path:
        path = path.replace("//", "/")
    if path.endswith("/") and path != "/":
        path = path[:-1]
    params = [p for p in sp.query.split("&")
              if p and not p.startswith(TRACKING_PREFIXES)
              and p not in TRACKING_NAMES]
    q = "&".join(sorted(params))
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")
