"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.001 and compare row-count, column names, and
order-insensitive values against oracle_sql() via DuckDB."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__  # noqa: E402

SF_DIR = os.environ.get("GRAFT_PARITY_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


ORACLED = sorted(__ray_entry__.oracle_sql().keys())
ROWS_ONLY = sorted(set(__ray_entry__.queries().keys()) - set(ORACLED))


def _smoke_oracles() -> set:
    """One oracled query per registry family — the smoke tier's parity
    slice (the full ORACLED run stays the gate)."""
    from pdf_extraction_ray.registry import query_families
    oracled = set(ORACLED)
    out = set()
    for fam in query_families().values():
        for name in sorted(fam):
            if name in oracled:
                out.add(name)
                break
    return out


SMOKE_ORACLES = _smoke_oracles()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "name", [pytest.param(n, marks=pytest.mark.smoke)
             if n in SMOKE_ORACLES else n for n in ORACLED])
def test_oracle_parity(name):
    ray_df = _canon(_to_df(__ray_entry__.queries()[name](SF_DIR)))
    duck_df = _canon(_duck(__ray_entry__.oracle_sql()[name]))
    assert list(ray_df.columns) == list(duck_df.columns), \
        f"{name}: columns {list(ray_df.columns)} != {list(duck_df.columns)}"
    assert len(ray_df) == len(duck_df), \
        f"{name}: rows {len(ray_df)} != {len(duck_df)}"
    # dtype KINDS must agree (a HUGEINT oracle comes back float64 and
    # would hash differently than Ray's int64 under a strict driver)
    for c in ray_df.columns:
        assert ray_df[c].dtype.kind == duck_df[c].dtype.kind, \
            f"{name}.{c}: dtype {ray_df[c].dtype} != {duck_df[c].dtype}"
    pd.testing.assert_frame_equal(ray_df, duck_df, check_dtype=False,
                                  check_exact=True, obj=name)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    df = _to_df(__ray_entry__.queries()[name](SF_DIR))
    assert df is not None
    # empty results legitimately lose schema through Ray's to_pandas
    assert len(df.columns) > 0 or len(df) == 0
