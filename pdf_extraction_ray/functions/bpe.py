"""Byte-pair-encoding vocabulary learning — pure reference
implementation (Sennrich et al. 2016, public algorithm), used both as
the per-batch kernel of the distributed learner in
``pipelines/corpus.py`` and as the differential oracle in tests.

A word is a tuple of symbols, initially its characters plus a
terminal ``</w>`` marker. Each merge round counts adjacent symbol
pairs across the word-frequency table (weighted by word count,
counting every occurrence), merges the most frequent pair everywhere,
and records it. Ties break on (pair count desc, left asc, right asc)
so the learned merge sequence is deterministic at any parallelism.
"""

from __future__ import annotations

END_OF_WORD = "</w>"


def word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END_OF_WORD,)


def pair_counts(words: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    """Adjacent-pair occurrence counts over a symbolized word table,
    weighted by word frequency. Overlapping occurrences all count
    (``aaa</w>`` contributes (a,a) twice), matching the greedy merge."""
    counts: dict[tuple[str, str], int] = {}
    for syms, n in words.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + n
    return counts


def merge_word(syms: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    """Greedy left-to-right merge of every adjacent (left, right) pair."""
    out = []
    i = 0
    merged = left + right
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def best_pair(counts: dict[tuple[str, str], int]) -> tuple[tuple[str, str], int] | None:
    if not counts:
        return None
    pair = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
    return pair, counts[pair]


def learn_merges(word_counts: dict[str, int],
                 n_merges: int) -> list[tuple[str, str, int]]:
    """Reference learner: returns [(left, right, pair_count)] in merge
    order. Stops early when the best remaining pair occurs once."""
    words = {word_symbols(w): n for w, n in word_counts.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = best_pair(pair_counts(words))
        if best is None or best[1] < 2:
            break
        (left, right), cnt = best
        merges.append((left, right, cnt))
        words = {merge_word(s, left, right): n for s, n in words.items()}
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> tuple[str, ...]:
    """Apply a learned merge sequence, in order, to one word."""
    syms = word_symbols(word)
    for left, right in merges:
        if len(syms) == 1:
            break
        syms = merge_word(syms, left, right)
    return syms
