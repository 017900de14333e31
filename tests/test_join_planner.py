"""Size-aware join planning: q3_auto picks the broadcast plan for
small build sides and the hash-partitioned plan past the threshold,
producing identical results either way."""

import pytest

import pdf_extraction_ray.pipelines.relational as rel

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _to_df(res):
    import pandas as pd
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_q3_auto_picks_broadcast_at_sf(monkeypatch):
    chosen = []
    real = rel.q3_top_orders
    monkeypatch.setattr(rel, "q3_top_orders",
                        lambda d: chosen.append("broadcast") or real(d))
    res = rel.q3_auto(SF_DIR)
    assert chosen == ["broadcast"]
    assert len(_to_df(res)) > 0


@pytest.mark.usefixtures("ray_session")
def test_q3_auto_partitioned_path_matches(monkeypatch):
    """Force the at-scale branch and check it equals the broadcast plan
    row for row."""
    import pandas as pd
    monkeypatch.setattr(rel, "BROADCAST_ROW_LIMIT", 0)
    part = _canon(_to_df(rel.q3_auto(SF_DIR)))
    bcast = _canon(_to_df(rel.q3_top_orders(SF_DIR)))
    pd.testing.assert_frame_equal(part, bcast, check_dtype=False,
                                  check_exact=True)
