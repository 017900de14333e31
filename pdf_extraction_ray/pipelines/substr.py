"""Exact-substring dedup at FULL resolution (ExactSubstr, Lee et al.
2022 "Deduplicating Training Data Makes Language Models Better"): any
window of ``W_SUB`` consecutive tokens that appears verbatim anywhere
else in the corpus is removed from every occurrence except the
corpus-wide first (minimal ``(doc_id, pos)``). Because windows slide at
STRIDE 1, a shared passage of any length >= W_SUB is removed exactly and
maximally — unlike the stride-``W`` block deduper
(`corpus.doc_dedup_blocks`), which quantizes duplicated regions to
aligned block boundaries and can both miss unaligned duplicates and
over-trim.

The paper builds a corpus-wide suffix array; the Ray-native equivalent
keys a single exchange on a per-position rolling window hash:

  stage 1  map_batches: tokenize (shared Arrow kernel), hash tokens,
           one polynomial window hash PER TOKEN POSITION (vectorized —
           W shifted multiply-adds over the flat token-hash array, doc
           boundaries masked). Emits (h, doc_id, pos): 16 bytes per
           corpus token. That linear exchange IS the honest cost of
           exact-substring dedup — the suffix-array build moves the
           same order of bytes; there is nothing to pre-reduce because
           almost every window is unique.
  stage 2  coarse h-keyed partition map: inside each partition, sort by
           (h, doc_id, pos); every row after the first of its h is a
           removal marker. Only markers (a tiny fraction) leave.
  stage 3  markers re-join documents through an int-keyed coarse
           exchange (side-tagged union, same shape as the block
           deduper's rebuild); per doc the removed-token mask is the
           union of [pos, pos+W) ranges via one diff/cumsum pass.

Correctness: no SQL oracle — keep-first maximal-window semantics need
either a self-join of every window occurrence (quadratic in duplicated
mass) or recursive reasoning DuckDB can't hash-compare cheaply; instead
``tests/test_substr.py`` runs a brute-force pure-python differential
(exact token-tuple windows, no hashing) on planted and randomized
corpora, plus semantic plants: maximal extension past block boundaries,
sub-W spans untouched, within-doc repeats, cross-doc keep-first order.
Window hashes are 64-bit (splitmix-finalized polynomial): a cross-pair
collision is ~2^-40 per window pair at test scale; the suffix-array
original is exact — documented trade for the hash-keyed exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import text as T
from ..functions.arrow_utils import as_array
from .corpus import _docs
from .relational import _coarse_partition_map

W_SUB = 20                       # window length in tokens (paper: 50)
_POLY_B = np.uint64(0x9E3779B97F4A7C15)     # odd multiplier


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _window_hashes(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (h, doc_id, pos) for every stride-1 window of
    W_SUB tokens that fits inside its document."""
    with np.errstate(over="ignore"):
        toks = as_array(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pc.fill_null(as_array(batch["text"]), ""))),
            T.TOKEN_SPLIT_RE))
        flat = as_array(pc.list_flatten(toks))
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(n_tok)])
        th = pd.util.hash_array(
            flat.to_numpy(zero_copy_only=False).astype(str))
        total = len(th)
        if total < W_SUB:
            return pa.Table.from_pydict(
                {"h": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.int64()),
                 "pos": pa.array([], pa.int64())})
        # polynomial window hash over token hashes: W shifted
        # multiply-adds, mod 2^64 wrap, splitmix finalizer
        n_win = total - W_SUB + 1
        h = np.zeros(n_win, dtype=np.uint64)
        w = np.uint64(1)
        for j in range(W_SUB - 1, -1, -1):
            h += th[j:j + n_win] * w
            w *= _POLY_B
        h = _splitmix64(h)
        # keep only windows fully inside one doc
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parent = np.repeat(np.arange(len(ids)), n_tok)[:n_win]
        pos = np.arange(n_win, dtype=np.int64) - starts[parent]
        ok = pos + W_SUB <= n_tok[parent]
        return pa.Table.from_pydict({
            "h": h[ok].view(np.int64),
            "doc_id": ids[parent[ok]], "pos": pos[ok]})


def doc_dedup_substrings(sf_dir: str, n_coarse: int | None = None):
    """ExactSubstr rewrite: (doc_id, text_kept, n_tokens, removed_tokens)
    with every non-first duplicated >=W_SUB-token span removed maximally.
    Output text is tokenization-normalized (lowercase, single-spaced),
    matching the block deduper's convention."""
    if n_coarse is None:
        from ..functions.cluster import default_n_coarse
        n_coarse = default_n_coarse()

    wins = _docs(sf_dir).map_batches(_window_hashes,
                                     batch_format="pyarrow",
                                     batch_size=None)

    def mark(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["h", "doc_id", "pos"])
        dup = part.duplicated("h")
        return part.loc[dup, ["doc_id", "pos"]].astype("int64")

    markers = _coarse_partition_map(wins, "h", mark)

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(ids % n_coarse), pa.array(ids),
             pa.array(np.full(len(batch), -1, dtype=np.int64)),
             as_array(batch["text"])],
            names=["_coarse", "doc_id", "pos", "text"])

    def tag_marks(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.Table.from_arrays(
            [pa.array(ids % n_coarse), pa.array(ids), batch["pos"],
             pa.array([""] * len(batch), type=pa.string())],
            names=["_coarse", "doc_id", "pos", "text"])

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["pos"] < 0]
        marks = g[g["pos"] >= 0]
        by_doc: dict[int, list] = {}
        for d, p in zip(marks["doc_id"].astype(np.int64),
                        marks["pos"].astype(np.int64)):
            by_doc.setdefault(int(d), []).append(int(p))
        if docs.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "text_kept": pd.Series([], dtype="string"),
                "n_tokens": pd.Series([], dtype="int64"),
                "removed_tokens": pd.Series([], dtype="int64")})
        toks_list = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pa.array(docs["text"].fillna("").tolist(),
                         type=pa.string()))),
            T.TOKEN_SPLIT_RE).to_pylist()
        out = {"doc_id": [], "text_kept": [], "n_tokens": [],
               "removed_tokens": []}
        for d, toks in zip(docs["doc_id"].astype(np.int64), toks_list):
            n = len(toks)
            ps = by_doc.get(int(d), ())
            if ps:
                delta = np.zeros(n + 1, dtype=np.int64)
                for p in ps:                 # union of [p, p+W) ranges
                    delta[p] += 1
                    delta[min(p + W_SUB, n)] -= 1
                removed = np.cumsum(delta[:n]) > 0
            else:
                removed = np.zeros(n, dtype=bool)
            kept = [t for t, r in zip(toks, removed) if not r]
            out["doc_id"].append(int(d))
            out["text_kept"].append(" ".join(kept))
            out["n_tokens"].append(n)
            out["removed_tokens"].append(int(removed.sum()))
        return pd.DataFrame({
            "doc_id": pd.Series(out["doc_id"], dtype="int64"),
            "text_kept": pd.Series(out["text_kept"], dtype="string"),
            "n_tokens": pd.Series(out["n_tokens"], dtype="int64"),
            "removed_tokens": pd.Series(out["removed_tokens"],
                                        dtype="int64")})

    return (_docs(sf_dir).map_batches(tag_docs, batch_format="pyarrow",
                                      batch_size=None)
            .union(markers.map_batches(tag_marks, batch_format="pyarrow",
                                       batch_size=None))
            .groupby("_coarse")
            .map_groups(rebuild, batch_format="pandas"))


def exact_substr_reference(docs: dict[int, str],
                           w: int = W_SUB) -> dict[int, dict]:
    """Brute-force differential reference: EXACT token tuples (no
    hashing). Returns {doc_id: {text_kept, n_tokens, removed_tokens}}."""
    toked = {d: [t for t in
                 (txt or "").strip().lower().split()] or [""]
             for d, txt in docs.items()}
    # NOTE: python split() differs from the RE2 '\s+' split on empty
    # strings; mirror the Arrow kernel: ''.split -> [''] via the `or`
    first: dict[tuple, tuple] = {}
    for d in sorted(toked):
        toks = toked[d]
        for p in range(len(toks) - w + 1):
            key = tuple(toks[p:p + w])
            first.setdefault(key, (d, p))
    out = {}
    for d in sorted(toked):
        toks = toked[d]
        n = len(toks)
        removed = np.zeros(n, dtype=bool)
        for p in range(n - w + 1):
            if first[tuple(toks[p:p + w])] != (d, p):
                removed[p:p + w] = True
        out[d] = {"text_kept": " ".join(
                      t for t, r in zip(toks, removed) if not r),
                  "n_tokens": n,
                  "removed_tokens": int(removed.sum())}
    return out


SUBSTR_QUERIES: dict[str, tuple] = {
    "doc_dedup_substrings": (doc_dedup_substrings, None),
}
