"""Vectorized text-analysis kernels over Arrow string arrays.

Engine-level text operators for large-scale training-data pipelines:
token counting, quality scoring (punctuation / stopword / length ratios),
language ID (stopword-profile heuristic), exact-dedup normalization.
All pure pyarrow.compute / numpy — no python loop over rows; every
fractional score is emitted as ``floor(x * 1e6)`` int64 so the DuckDB
oracle can reproduce values bit-exactly (no float-summation drift).

Analog of the reference's keyword scoring and counter operators
(advanced_layout_extractor.py:868-894; gpt4_comprehensive_visual_
processor.py:186-336) re-expressed as engine primitives.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .arrow_utils import as_array

TOKEN_SPLIT_RE = r"\s+"
PUNCT_RE = r"[.,;:!?]"
# BPE-ish tokenizer (GPT-2-style pattern, RE2-compatible so Arrow and
# DuckDB count identically): contractions | letter runs | digit runs |
# punctuation runs
BPE_TOKEN_RE = r"'[a-z]+|\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"

# Stopword profiles for the language-ID heuristic. Deterministic cascade:
# first language (in LANG_ORDER) whose hit-count is maximal and >= 2 wins,
# else 'und'. Mirrors fastText-style stopword profiling at toy scale.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est"],
    "es": ["el", "los", "las", "y", "que", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "zu"],
}
LANG_ORDER = ["en", "fr", "es", "de"]
LANG_MIN_HITS = 2


def _tokens(text: pa.Array) -> pa.ListArray:
    return as_array(pc.split_pattern_regex(pc.utf8_trim_whitespace(text),
                                           TOKEN_SPLIT_RE))


def token_stats(text: pa.Array) -> dict[str, pa.Array]:
    """n_chars, n_tokens, token_chars, punct_cnt per row (all int64)."""
    toks = _tokens(text)
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    flat = as_array(pc.list_flatten(toks))
    parent = as_array(pc.list_parent_indices(toks)).to_numpy(zero_copy_only=False)
    tok_chars = np.zeros(len(text), dtype=np.int64)
    if len(flat):
        np.add.at(tok_chars, parent,
                  pc.utf8_length(flat).to_numpy(zero_copy_only=False))
    return {
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "n_tokens": n_tokens,
        "n_tokens_bpe": pc.cast(
            pc.count_substring_regex(text, BPE_TOKEN_RE), pa.int64()),
        "token_chars": pa.array(tok_chars, type=pa.int64()),
        "punct_cnt": pc.cast(pc.count_substring_regex(text, PUNCT_RE), pa.int64()),
    }


def _stop_hits(toks_lower_flat: pa.Array, parent: np.ndarray, n: int,
               words: list[str]) -> np.ndarray:
    hits = np.zeros(n, dtype=np.int64)
    if len(toks_lower_flat):
        mask = pc.is_in(toks_lower_flat,
                        value_set=pa.array(words)).to_numpy(zero_copy_only=False)
        np.add.at(hits, parent[mask], 1)
    return hits


def lang_profile(text: pa.Array) -> dict[str, np.ndarray]:
    """Per-language stopword hit counts (int64 per row).

    Dictionary-encoded path: membership tests run once per UNIQUE
    token (the dictionary, typically 100-1000x smaller than the flat
    token stream) and per-row totals come from one filtered
    ``np.bincount`` per language — identical counts to the naive
    per-token ``is_in`` (differential-tested; the langid accuracy
    oracle also pins it). The membership+count stage measures ~6x
    faster; end-to-end the shared whitespace tokenizer dominates, so
    treat this as a scalability guard for larger vocabularies, not a
    headline win."""
    toks = _tokens(pc.utf8_lower(text))
    flat = as_array(pc.list_flatten(toks))
    parent = as_array(pc.list_parent_indices(toks)).to_numpy(zero_copy_only=False)
    n = len(text)
    if len(flat) == 0:
        return {lang: np.zeros(n, dtype=np.int64)
                for lang in LANG_STOPWORDS}
    enc = pc.dictionary_encode(flat)
    idx = enc.indices.to_numpy(zero_copy_only=False)
    dictionary = enc.dictionary
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        dmask = pc.is_in(dictionary, value_set=pa.array(words)) \
            .to_numpy(zero_copy_only=False)
        out[lang] = np.bincount(parent[dmask[idx]],
                                minlength=n).astype(np.int64)
    return out


def langid(text: pa.Array) -> pa.Array:
    """Deterministic stopword-profile language ID -> 'en'|'fr'|'es'|'de'|'und'."""
    prof = lang_profile(text)
    counts = np.stack([prof[lang] for lang in LANG_ORDER])   # (L, n)
    out = np.full(len(text), "und", dtype=object)
    best = counts.max(axis=0)
    # first language in LANG_ORDER achieving the max wins (ties -> earlier)
    winner = counts.argmax(axis=0)
    ok = best >= LANG_MIN_HITS
    for li, lang in enumerate(LANG_ORDER):
        out[ok & (winner == li)] = lang
    return pa.array(out, type=pa.string())


def scaled_ratio(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """(num * 1e6) // den as int64; 0 where den == 0. Pure integer math so
    Ray and the SQL oracle (``(num * 1000000) // den``) agree bit-exactly."""
    den_safe = np.where(den > 0, den, 1).astype(np.int64)
    r = (num.astype(np.int64) * 1_000_000) // den_safe
    return np.where(den > 0, r, 0)


def quality_scores(text: pa.Array) -> dict[str, pa.Array]:
    """Per-row quality features (trafilatura/readability-style):
    punct_ratio_x1e6, stop_ratio_x1e6 (english stopwords / tokens),
    mean_token_len_x1e6 — all int64."""
    stats = token_stats(text)
    n_chars = stats["n_chars"].to_numpy(zero_copy_only=False)
    n_tokens = stats["n_tokens"].to_numpy(zero_copy_only=False)
    tok_chars = stats["token_chars"].to_numpy(zero_copy_only=False)
    punct = stats["punct_cnt"].to_numpy(zero_copy_only=False)
    prof = lang_profile(text)
    return {
        "n_chars": stats["n_chars"],
        "n_tokens": stats["n_tokens"],
        "punct_ratio_x1e6": pa.array(scaled_ratio(punct, n_chars)),
        "stop_ratio_x1e6": pa.array(scaled_ratio(prof["en"], n_tokens)),
        "mean_token_len_x1e6": pa.array(scaled_ratio(tok_chars, n_tokens)),
    }


def normalize_for_dedup(text: pa.Array) -> pa.Array:
    """Exact-dedup key normalization: lower + trim (the documented
    equivalence class; SQL: lower(trim(text)))."""
    return as_array(pc.utf8_lower(pc.utf8_trim_whitespace(text)))
