"""Canonical query registry: every pipeline family's (name -> (callable,
oracle_sql)) mapping in ONE place, consumed by both the driver contract
(``__ray_entry__``) and the CLI (``run.py --query``) so the two can
never drift."""

from __future__ import annotations


def query_families() -> dict[str, dict[str, tuple]]:
    """Family name -> that family's (name -> (callable, oracle_sql))
    registry — the structure behind ``all_queries`` and the generated
    ``QUERIES.md`` index."""
    from .pipelines.analysis import ANALYSIS_QUERIES
    from .pipelines.cleaning import CLEANING_QUERIES
    from .pipelines.compare import COMPARE_QUERIES
    from .pipelines.corpus import CORPUS_QUERIES
    from .pipelines.dedup import DEDUP_QUERIES
    from .pipelines.graph import GRAPH_QUERIES
    from .pipelines.htmlio import HTMLIO_QUERIES
    from .pipelines.media import MEDIA_QUERIES
    from .pipelines.mleval import MLEVAL_QUERIES
    from .pipelines.packing import PACKING_QUERIES
    from .pipelines.pdfio import PDFIO_QUERIES
    from .pipelines.ranks import RANKS_QUERIES
    from .pipelines.relational import RELATIONAL_QUERIES
    from .pipelines.retrieval import RETRIEVAL_QUERIES
    from .pipelines.similarity import SIMILARITY_QUERIES
    from .pipelines.spans import SPANS_QUERIES
    from .pipelines.stats import STATS_QUERIES
    from .pipelines.storage import STORAGE_QUERIES
    from .pipelines.streaming import STREAMING_QUERIES
    from .pipelines.substr import SUBSTR_QUERIES
    from .pipelines.textops import TEXT_QUERIES
    from .pipelines.tpch import TPCH_QUERIES
    from .pipelines.weburl import WEBURL_QUERIES

    return {
        "relational": RELATIONAL_QUERIES, "tpch": TPCH_QUERIES,
        "textops": TEXT_QUERIES, "corpus": CORPUS_QUERIES,
        "dedup": DEDUP_QUERIES, "similarity": SIMILARITY_QUERIES,
        "analysis": ANALYSIS_QUERIES, "retrieval": RETRIEVAL_QUERIES,
        "media": MEDIA_QUERIES, "compare": COMPARE_QUERIES,
        "streaming": STREAMING_QUERIES, "packing": PACKING_QUERIES,
        "storage": STORAGE_QUERIES, "graph": GRAPH_QUERIES,
        "stats": STATS_QUERIES, "ranks": RANKS_QUERIES,
        "mleval": MLEVAL_QUERIES, "pdfio": PDFIO_QUERIES,
        "htmlio": HTMLIO_QUERIES, "weburl": WEBURL_QUERIES,
        "cleaning": CLEANING_QUERIES, "spans": SPANS_QUERIES,
        "substr": SUBSTR_QUERIES,
    }


_TABLES = ("documents", "events", "lineitem", "orders", "customer",
           "part", "supplier", "nation", "region", "embeddings")


def _snapshot_is_empty(sf_dir: str) -> bool:
    """True iff every table in the snapshot has zero rows (parquet
    footer counts only; big tables first so the common non-empty case
    short-circuits after ONE footer read)."""
    from .pipelines.corpus import _n_rows
    for t in _TABLES:
        try:
            if _n_rows(sf_dir, t) > 0:
                return False
        except Exception:
            return False        # missing table: let the op decide
    return True


def _sole_table_empty(sf_dir: str, table) -> bool:
    """True iff the query's SOLE input table (from EMPTY_WHEN — its
    oracle references exactly one table, so SQL semantics guarantee an
    empty result) is empty. One parquet footer read."""
    if table is None:
        return False
    from .pipelines.corpus import _n_rows
    try:
        return _n_rows(sf_dir, table) == 0
    except Exception:
        return False


def _empty_guarded(fn, schema, sole_table=None):
    """Typed-empty contract at the registry boundary: on a FULLY empty
    snapshot return the query's typed 0-row frame (dtypes captured at
    sf0.001, ``empty_schemas.py``) instead of running the pipeline —
    Ray Data ``map_batches`` over zero blocks loses the output schema,
    and a column-less frame KeyErrors downstream consumers. Semantics
    are unchanged: every guarded query already returns 0 rows on an
    all-empty snapshot; queries with non-empty degenerate outputs are
    not in the map and run unguarded."""
    import functools

    import pandas as pd

    @functools.wraps(fn)
    def wrapper(sf_dir, *args, **kw):
        if _sole_table_empty(sf_dir, sole_table) \
                or _snapshot_is_empty(sf_dir):
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in schema})
        return fn(sf_dir, *args, **kw)
    return wrapper


def all_queries() -> dict[str, tuple]:
    from .empty_schemas import EMPTY_SCHEMAS
    out: dict[str, tuple] = {}
    for reg in query_families().values():
        out.update(reg)
    from .empty_schemas import EMPTY_WHEN
    return {name: ((fn, sql) if name not in EMPTY_SCHEMAS
                   else (_empty_guarded(fn, EMPTY_SCHEMAS[name],
                                        EMPTY_WHEN.get(name)), sql))
            for name, (fn, sql) in out.items()}


def generate_queries_md() -> str:
    """One-line-per-query index of the full driver contract: name ->
    family -> implementation file:line -> oracle kind. Regenerated and
    diffed by ``tests/test_queries_md.py`` so QUERIES.md can't drift
    from the registry (VERDICT r3 item 8)."""
    import functools
    import inspect
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fams = query_families()
    n_total = sum(len(r) for r in fams.values())
    n_oracle = sum(1 for r in fams.values()
                   for (_fn, sql) in r.values() if sql)
    lines = [
        "# Query surface",
        "",
        "GENERATED FILE — regenerate with"
        " `python -m pdf_extraction_ray.registry`"
        " (tests/test_queries_md.py fails if this drifts).",
        "",
        f"{n_total} queries across {len(fams)} families; {n_oracle} have"
        " a bit-exact DuckDB oracle (`oracle_sql()`); the rest are"
        " rows-only by design (iterative / stateful / sketch ops with"
        " their own value-checking tests).",
        "",
        "| query | family | impl | oracle |",
        "|---|---|---|---|",
    ]
    for fam in sorted(fams):
        for name in sorted(fams[fam]):
            fn, sql = fams[fam][name]
            target = fn
            while isinstance(target, functools.partial):
                target = target.func
            target = inspect.unwrap(target)
            try:
                src = os.path.relpath(inspect.getsourcefile(target), root)
                line = inspect.getsourcelines(target)[1]
                impl = f"`{src}:{line}`"
            except (TypeError, OSError):
                impl = "`?`"
            lines.append(f"| {name} | {fam} | {impl} | "
                         f"{'sql' if sql else 'rows-only'} |")
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "QUERIES.md"), "w") as f:
        f.write(generate_queries_md())
    print("wrote QUERIES.md")
