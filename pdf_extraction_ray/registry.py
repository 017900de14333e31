"""Canonical query registry: every pipeline family's (name -> (callable,
oracle_sql)) mapping in ONE place, consumed by both the driver contract
(``__ray_entry__``) and the CLI (``run.py --query``) so the two can
never drift."""

from __future__ import annotations


def all_queries() -> dict[str, tuple]:
    from .pipelines.relational import RELATIONAL_QUERIES
    from .pipelines.tpch import TPCH_QUERIES
    from .pipelines.textops import TEXT_QUERIES
    from .pipelines.corpus import CORPUS_QUERIES
    from .pipelines.dedup import DEDUP_QUERIES
    from .pipelines.similarity import SIMILARITY_QUERIES
    from .pipelines.analysis import ANALYSIS_QUERIES
    from .pipelines.retrieval import RETRIEVAL_QUERIES
    from .pipelines.media import MEDIA_QUERIES
    from .pipelines.compare import COMPARE_QUERIES
    from .pipelines.streaming import STREAMING_QUERIES
    from .pipelines.packing import PACKING_QUERIES
    from .pipelines.storage import STORAGE_QUERIES
    from .pipelines.graph import GRAPH_QUERIES
    from .pipelines.stats import STATS_QUERIES
    from .pipelines.ranks import RANKS_QUERIES
    from .pipelines.mleval import MLEVAL_QUERIES
    from .pipelines.pdfio import PDFIO_QUERIES
    from .pipelines.htmlio import HTMLIO_QUERIES
    from .pipelines.weburl import WEBURL_QUERIES
    from .pipelines.cleaning import CLEANING_QUERIES
    from .pipelines.spans import SPANS_QUERIES
    from .pipelines.substr import SUBSTR_QUERIES

    out: dict[str, tuple] = {}
    for reg in (RELATIONAL_QUERIES, TPCH_QUERIES, TEXT_QUERIES,
                CORPUS_QUERIES,
                DEDUP_QUERIES, SIMILARITY_QUERIES, ANALYSIS_QUERIES,
                RETRIEVAL_QUERIES, MEDIA_QUERIES, COMPARE_QUERIES,
                STREAMING_QUERIES, PACKING_QUERIES, STORAGE_QUERIES,
                GRAPH_QUERIES, STATS_QUERIES, RANKS_QUERIES,
                MLEVAL_QUERIES, PDFIO_QUERIES, HTMLIO_QUERIES,
                WEBURL_QUERIES, CLEANING_QUERIES, SPANS_QUERIES,
                SUBSTR_QUERIES):
        out.update(reg)
    return out
