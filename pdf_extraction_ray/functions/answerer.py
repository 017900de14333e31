"""Deterministic extractive answer generation — the sandboxed stand-in
for the reference's LLM answer step (complete_multimodal_rag_evaluation
.py:80-131: build a numbered context, call the chat model, account
latency + token usage). No model exists here, so the "generation" is a
deterministic extractive template: pick the context sentences sharing
the most terms with the query. The accounting contract (answer text,
input/output/total tokens) is the part downstream eval aggregates
consume, and it is exactly preserved."""

from __future__ import annotations

import re

NOT_FOUND = "not specified in the retrieved documents"
PROMPT_OVERHEAD_TOKENS = 64     # fixed "system message" accounting analog
MAX_ANSWER_SENTENCES = 2

_SENT_SPLIT = re.compile(r"(?<=[.!?])[ \t]+|\n+")
_WORD = re.compile(r"[A-Za-z0-9]+")


def _terms(s: str) -> set[str]:
    return {w.lower() for w in _WORD.findall(s)}


def generate_answer(query: str, context: str) -> dict:
    """Extractive answer + token accounting for one (query, context).

    Deterministic: sentences scored by query-term overlap, top
    MAX_ANSWER_SENTENCES by (-overlap, position), emitted in context
    order; zero overlap -> the NOT_FOUND template (the reference's
    "문서에 명시되지 않았습니다" rule)."""
    qt = _terms(query)
    sentences = [s.strip() for s in _SENT_SPLIT.split(context) if s.strip()]
    scored = []
    for i, s in enumerate(sentences):
        overlap = len(qt & _terms(s))
        if overlap:
            scored.append((-overlap, i, s))
    if scored:
        top = sorted(scored)[:MAX_ANSWER_SENTENCES]
        answer = " ".join(s for _, _, s in sorted(top, key=lambda t: t[1]))
    else:
        answer = NOT_FOUND
    input_tokens = (PROMPT_OVERHEAD_TOKENS + len(query.split())
                    + len(context.split()))
    output_tokens = len(answer.split())
    return {"answer": answer,
            "input_tokens": input_tokens,
            "output_tokens": output_tokens,
            "total_tokens": input_tokens + output_tokens}
