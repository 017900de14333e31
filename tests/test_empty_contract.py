"""Typed-empty contract over a FULLY EMPTY snapshot (round-5).

Empty partitions — and empty snapshots, e.g. a date shard with no data
yet — are routine at 100-TB scale. Two layers guarantee consumers never
see a schema-less frame:

1. Per-op guards (``_typed_empty_on_no_docs``) on ops whose pipeline
   would crash or lose its schema when its primary table is empty
   (broadcast-query knn ops index row 0; map_batches over zero blocks
   drops the output schema).
2. The registry boundary (``registry.all_queries``): every query whose
   all-empty result is an empty frame has its sf0.001 dtypes recorded
   in ``empty_schemas.py`` and returns that typed 0-row frame.

The per-family gates in test_corpus.py cover the big families against
the RAW (unwrapped) callables; this module pins the registry-level
contract and the families without their own gate.
"""

import os

import pandas as pd
import pytest

import pyarrow.parquet as pq

from pdf_extraction_ray.empty_schemas import EMPTY_SCHEMAS, EMPTY_WHEN
from pdf_extraction_ray.registry import all_queries, query_families


@pytest.fixture(scope="module")
def empty_snapshot(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_snapshot")
    src = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), os.path.join(d, f"{t}.parquet"))
    return str(d)


def test_empty_schemas_cover_only_registered_queries():
    names = set(all_queries())
    stale = set(EMPTY_SCHEMAS) - names
    assert not stale, f"empty_schemas.py has unregistered entries: {stale}"


def test_empty_when_matches_oracle_table_sets():
    """EMPTY_WHEN is sound ONLY while each listed query's oracle still
    references exactly that one table — re-derive from the live SQL so
    an oracle gaining a second table fails loudly here."""
    import re
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__
    oracles = __ray_entry__.oracle_sql()
    tables = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings")
    derived = {}
    for q in EMPTY_SCHEMAS:
        sql = oracles.get(q)
        if not sql:
            continue
        used = {t for t in tables if re.search(rf"\b{t}\b", sql)}
        if len(used) == 1:
            derived[q] = next(iter(used))
    assert derived == EMPTY_WHEN


def test_registry_typed_empty_contract(empty_snapshot):
    """Every EMPTY_SCHEMAS query returns its typed 0-row frame on an
    all-empty snapshot — column names, order and dtypes exactly as the
    non-empty result carries at sf0.001. Instant (footer reads only)."""
    qs = all_queries()
    for name, schema in EMPTY_SCHEMAS.items():
        out = qs[name][0](empty_snapshot)
        df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        assert len(df) == 0, name
        assert [(c, str(t)) for c, t in df.dtypes.items()] \
            == [(c, t) for c, t in schema], name


@pytest.fixture(scope="module",
                params=["customer", "supplier", "part", "nation",
                        "region"])
def one_empty_snapshot(request, tmp_path_factory):
    """Snapshot with exactly ONE dimension table empty — the partial
    emptiness a per-day shard of a real lakehouse routinely has."""
    import shutil
    t_empty = request.param
    d = tmp_path_factory.mktemp(f"empty_{t_empty}")
    src = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        if t == t_empty:
            tbl = pq.read_table(f"{src}/{t}.parquet")
            pq.write_table(tbl.slice(0, 0),
                           os.path.join(d, f"{t}.parquet"))
        else:
            shutil.copy(f"{src}/{t}.parquet",
                        os.path.join(d, f"{t}.parquet"))
    return str(d)


def test_partial_empty_single_table_queries_typed(tmp_path):
    """A snapshot whose EVENTS table alone is empty: every
    single-table events query returns its typed 0-row frame through
    the registry (the EMPTY_WHEN extension of the contract)."""
    import shutil
    d = tmp_path / "ev_empty"
    d.mkdir()
    src = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        if t == "events":
            tbl = pq.read_table(f"{src}/{t}.parquet")
            pq.write_table(tbl.slice(0, 0), str(d / f"{t}.parquet"))
        else:
            shutil.copy(f"{src}/{t}.parquet", str(d / f"{t}.parquet"))
    qs = all_queries()
    n = 0
    for name, table in EMPTY_WHEN.items():
        if table != "events":
            continue
        out = qs[name][0](str(d))
        df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        assert len(df) == 0 and df.shape[1] > 0, name
        n += 1
    assert n >= 10      # the events family is well represented


@pytest.mark.usefixtures("ray_session")
def test_broadcast_joins_survive_empty_build_side(one_empty_snapshot):
    """The sorted-broadcast join family must survive an EMPTY build
    side (regression: np.where(found, vals[pos], -1) fancy-indexed an
    empty values array and crashed q7/q8 when customer or supplier was
    empty — an empty dimension shard is routine at scale)."""
    qs = all_queries()
    for name in ("q5_nation_revenue", "q7_nation_trade",
                 "q8_market_share", "q9_product_profit",
                 "q14_promo_revenue", "q19_disjunctive_revenue",
                 "q21_late_suppliers", "q2_min_cost_supplier",
                 "nation_revenue_share",
                 "nation_customer_counts_left"):
        out = qs[name][0](one_empty_snapshot)
        df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
        assert df is not None, name


@pytest.mark.usefixtures("ray_session")
def test_ungated_families_typed_on_empty(empty_snapshot):
    """Families without their own empty gate in test_corpus.py: every
    query must return a TYPED result (no crash, schema survives) over
    the all-empty snapshot. Runs the real pipelines for queries outside
    EMPTY_SCHEMAS (the ones with degenerate non-empty outputs)."""
    gated = {"relational", "tpch", "storage", "streaming", "dedup",
             "corpus", "textops", "packing", "spans", "cleaning"}
    qs = all_queries()
    fams = query_families()
    for fam in sorted(set(fams) - gated):
        for name in sorted(fams[fam]):
            out = qs[name][0](empty_snapshot)
            df = out if isinstance(out, pd.DataFrame) \
                else out.to_pandas()
            assert df is not None, name
            assert df.shape[1] > 0, \
                f"{name} ({fam}): schema lost on empty snapshot"
