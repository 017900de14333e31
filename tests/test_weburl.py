"""URL canonicalization kernel: differential fuzz vs the urllib
reference, idempotence, and the planted collision the dedup query
relies on."""

import random

import pandas as pd
import pytest

from pdf_extraction_ray.functions.urlnorm import (
    normalize_urls, url_normalize_ref,
)
from pdf_extraction_ray.pipelines.weburl import synthesize_urls

import numpy as np


def _fuzz_urls(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = ["Example.COM", "www.Example.com", "WWW.sub.Ex.org",
             "example.com:443", "www.example.com:80", "ex.org:8080",
             "xn--bcher-kva.example"]
    paths = ["", "/", "/a/b", "/a//b///c", "/a/b/", "//", "/trail/",
             "/%7Euser/a"]
    queries = [None, "", "a=1", "b=2&a=1", "utm_source=x&a=1",
               "a=1&utm_campaign=y&b=2", "fbclid=abc&z=9", "gclid",
               "a=1&a=0", "empty=&=1&&a=2", "msclkid=1&msclkid=2"]
    frags = [None, "", "sec", "a?b"]
    out = []
    for _ in range(n):
        u = (f"{rng.choice(schemes)}://{rng.choice(hosts)}"
             f"{rng.choice(paths)}")
        q = rng.choice(queries)
        if q is not None:
            u += "?" + q
        f = rng.choice(frags)
        if f is not None:
            u += "#" + f
        out.append(u)
    # non-URL strings must pass through untouched
    out += ["not a url", "", "relative/path?a=1", "mailto:x@y.z",
            "://nohost", "https:/oneslash"]
    return out


def test_differential_vs_urllib():
    urls = _fuzz_urls(17, 400)
    got = normalize_urls(pd.Series(urls)).tolist()
    want = [url_normalize_ref(u) for u in urls]
    for u, g, w in zip(urls, got, want):
        assert g == w, f"{u!r}: kernel {g!r} != ref {w!r}"


def test_idempotent():
    urls = _fuzz_urls(23, 200)
    once = normalize_urls(pd.Series(urls))
    twice = normalize_urls(once)
    assert once.tolist() == twice.tolist()


def test_rule_examples():
    cases = {
        "HTTPS://WWW.Ex.COM:443//a//b/?b=2&utm_source=t&a=1#f":
            "https://ex.com/a/b?a=1&b=2",
        "http://ex.com:80/": "http://ex.com/",
        "http://ex.com:8080/x/": "http://ex.com:8080/x",
        "https://ex.com": "https://ex.com",
        "https://ex.com/?utm_source=1": "https://ex.com/",
        "ftp://Ex.com:21/A/": "ftp://ex.com:21/A",   # path case kept
    }
    got = normalize_urls(pd.Series(list(cases))).tolist()
    assert got == list(cases.values())


def test_index_preserved_and_nonurls_pass_through():
    s = pd.Series({"k1": "HTTPS://A.b//c", "k2": "plain text"})
    out = normalize_urls(s)
    assert list(out.index) == ["k1", "k2"]
    assert out["k1"] == "https://a.b/c"
    assert out["k2"] == "plain text"


def test_synth_collision_shape():
    """The three raw tail forms collapse: %3==0 and %3==1 docs in the
    same (source, doc_id%40) cell share one canonical URL; %3==2 docs
    form a separate (query-less) canonical URL."""
    ids = np.array([0, 1, 2, 120], dtype=np.int64)   # 0,120: %40==0,%3==0
    src = pd.Series(["srcA"] * 4)
    norm = normalize_urls(synthesize_urls(ids, src))
    assert norm[0] == "https://srca.example.com/cat/0/item?a=1&b=2"
    assert norm[3] == norm[0]
    assert norm[1] == "https://srca.example.com/cat/1/item?a=1&b=2"
    assert norm[2] == "https://srca.example.com/cat/2/item"


@pytest.mark.usefixtures("ray_session")
def test_url_dedup_merges_raw_forms():
    from pdf_extraction_ray.pipelines.weburl import docs_url_dedup
    df = docs_url_dedup("/root/testdata/sf0.001").to_pandas()
    assert (df["n_docs"] >= 1).all()
    assert df["n_docs"].sum() == 500
    assert (df["n_docs"] > 1).any()          # normalization merged forms
    assert df["url_norm"].is_unique
