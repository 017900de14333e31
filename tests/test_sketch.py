"""HyperLogLog sketch: accuracy, mergeability, determinism."""

import numpy as np
import pytest

from pdf_extraction_ray.functions import sketch as S
from pdf_extraction_ray.functions.hashing import hash_strings


def _hashes(vals):
    return hash_strings(np.asarray([str(v) for v in vals], dtype=object))


def test_accuracy_within_2pct():
    for n in (100, 5_000, 100_000):
        reg = S.hll_create()
        S.hll_add_hashes(reg, _hashes(range(n)))
        est = S.hll_count(reg)
        assert abs(est - n) / n < 0.02, (n, est)


def test_merge_equals_union():
    a, b, u = S.hll_create(), S.hll_create(), S.hll_create()
    ha, hb = _hashes(range(0, 3000)), _hashes(range(2000, 6000))
    S.hll_add_hashes(a, ha)
    S.hll_add_hashes(b, hb)
    S.hll_add_hashes(u, np.concatenate([ha, hb]))
    assert np.array_equal(S.hll_merge(a, b), u)


def test_duplicates_do_not_inflate():
    reg = S.hll_create()
    h = _hashes(range(500))
    for _ in range(5):
        S.hll_add_hashes(reg, h)
    assert abs(S.hll_count(reg) - 500) / 500 < 0.05


@pytest.mark.usefixtures("ray_session")
def test_pipeline_matches_exact_count():
    import duckdb
    from pdf_extraction_ray.pipelines.relational import approx_distinct_users
    out = approx_distinct_users("/root/testdata/sf0.01")
    exact = duckdb.sql("SELECT count(DISTINCT user_id) FROM "
                       "read_parquet('/root/testdata/sf0.01/events.parquet')") \
        .fetchone()[0]
    # within_bound carries the <2% sketch check; exact column is exact
    assert int(out["n_users"].iloc[0]) == exact
    assert int(out["within_bound"].iloc[0]) == 1


# ---------------------------------------------------------------------------
# Count-Min Sketch
# ---------------------------------------------------------------------------

def test_cms_overestimates_and_bounded():
    rng = np.random.default_rng(7)
    # zipfian-ish counts over 5000 keys
    keys = np.array([f"k{i}" for i in range(5000)], dtype=object)
    counts = (10000 / (1 + np.arange(5000))).astype(np.int64) + 1
    sk = S.cms_create()
    S.cms_add_hashes(sk, _hashes(keys), counts)
    est = S.cms_query(sk, _hashes(keys))
    assert (est >= counts).all()                       # one-sided error
    eps_n = int(np.e / S.CMS_W * counts.sum()) + 1
    # overwhelming majority of keys within the eps*N bound
    assert ((est - counts) <= 2 * eps_n).mean() > 0.99


def test_cms_merge_equals_single():
    ha, hb = _hashes(range(0, 2000)), _hashes(range(1000, 3000))
    a, b, u = S.cms_create(), S.cms_create(), S.cms_create()
    S.cms_add_hashes(a, ha)
    S.cms_add_hashes(b, hb)
    S.cms_add_hashes(u, np.concatenate([ha, hb]))
    assert np.array_equal(S.cms_merge(a, b), u)


@pytest.mark.usefixtures("ray_session")
def test_cms_top_tokens_match_exact_heavy_hitters():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pdf_extraction_ray.pipelines.corpus import (
        cms_token_counts, corpus_heavy_hitters)
    out = cms_token_counts("/root/testdata/sf0.001")
    exact = corpus_heavy_hitters("/root/testdata/sf0.001").to_pandas()
    # oracled form: rows ARE the exact top-k; within_bound carries the
    # CMS overestimate bound AND the candidate-surfacing property
    assert list(out["token"]) == list(exact["token"])
    assert (out["n"].to_numpy() == exact["n"].to_numpy()).all()
    assert (out["within_bound"] == 1).all()


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_low_fpr():
    members = _hashes(range(10_000))
    others = _hashes(range(10_000, 110_000))
    bf = S.bloom_create()
    S.bloom_add_hashes(bf, members)
    assert S.bloom_contains_hashes(bf, members).all()
    assert S.bloom_contains_hashes(bf, others).mean() < 0.02


def test_bloom_merge_is_union():
    ha, hb = _hashes(range(0, 500)), _hashes(range(500, 1000))
    a, b, u = S.bloom_create(), S.bloom_create(), S.bloom_create()
    S.bloom_add_hashes(a, ha)
    S.bloom_add_hashes(b, hb)
    S.bloom_add_hashes(u, np.concatenate([ha, hb]))
    assert np.array_equal(S.bloom_merge(a, b), u)


# ---------------------------------------------------------------------------
# DDSketch quantiles
# ---------------------------------------------------------------------------

def test_dds_quantile_error_bound_and_merge():
    import numpy as np
    from pdf_extraction_ray.functions import sketch as S

    rng = np.random.default_rng(5)
    v = np.concatenate([rng.exponential(50, 50000),
                        rng.uniform(0, 1, 5000), [0.0] * 50])
    # split into 7 partials merged in arbitrary order == one-shot sketch
    parts = np.array_split(rng.permutation(v), 7)
    merged = S.dds_create()
    for p in parts:
        sk = S.dds_create()
        S.dds_add(sk, p)
        merged = S.dds_merge(merged, sk)
    one = S.dds_create()
    S.dds_add(one, v)
    assert (merged == one).all()
    for q in (0.5, 0.9, 0.99):
        est = S.dds_quantile(merged, q)
        true = float(np.quantile(v, q))
        assert abs(est - true) / true <= 2.5 * S.DDS_ALPHA, (q, est, true)


def test_dds_zeros_and_empty():
    import numpy as np
    from pdf_extraction_ray.functions import sketch as S

    assert S.dds_quantile(S.dds_create(), 0.5) == 0.0
    sk = S.dds_create()
    S.dds_add(sk, np.zeros(10))
    assert S.dds_quantile(sk, 0.99) == 0.0


@pytest.mark.usefixtures("ray_session")
def test_events_value_quantiles_approx_vs_exact():
    import duckdb
    from pdf_extraction_ray.pipelines.relational import (
        events_value_quantiles_approx)

    sf = "/root/testdata/sf0.001"
    out = events_value_quantiles_approx(sf).set_index("quantile")
    # the sketch estimate is distilled into within_bound (oracled form);
    # the exact side must match DuckDB's quantile_disc bit-for-bit
    assert (out["within_bound"] == 1).all()
    exact = duckdb.sql(
        f"SELECT quantile_disc(CAST(ROUND(value * 1000000.0) AS BIGINT),"
        f" [0.5, 0.9, 0.99]) FROM "
        f"read_parquet('{sf}/events.parquet')").fetchall()[0][0]
    for q, true in zip((0.5, 0.9, 0.99), exact):
        assert int(out.loc[q, "value_x1e6"]) == int(true), (q, true)


@pytest.mark.usefixtures("ray_session")
def test_grouped_hll_matches_exact_per_group():
    """Grouped-HLL approx distinct stays within 2% of the exact grouped
    distinct for every event type (the sketch path never exchanges
    (type, user) pairs, so this bound is its only value check)."""
    from pdf_extraction_ray.pipelines.relational import (
        events_type_approx_distinct, events_type_distinct_users)

    sf = "/root/testdata/sf0.01"
    exact = events_type_distinct_users(sf).set_index("event_type")
    out = events_type_approx_distinct(sf).set_index("event_type")
    assert sorted(exact.index) == sorted(out.index)
    # within_bound carries the <2% sketch check; the exact column must
    # equal the exact twin per group
    assert (out["within_bound"] == 1).all()
    for t in exact.index:
        assert int(out.loc[t, "n_users"]) == int(exact.loc[t, "n_users"])


@pytest.mark.usefixtures("ray_session")
def test_grouped_hll_survives_empty_shard(tmp_path):
    """An events table stored as shards where one shard is EMPTY must
    not crash the grouped-HLL partial (empty blocks are routine at
    scale; regression: IndexError on zero-row batches)."""
    import os
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdf_extraction_ray.pipelines.relational import (
        events_type_approx_distinct)

    src = pq.read_table("/root/testdata/sf0.001/events.parquet")
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(src, os.path.join(d, "events.parquet"))
    os.mkdir(d / "shards")  # a sharded layout with one empty shard
    sharded = tmp_path / "sharded"
    sharded.mkdir()
    edir = sharded / "events.parquet"
    edir.mkdir()
    pq.write_table(src, str(edir / "part0.parquet"))
    pq.write_table(src.slice(0, 0), str(edir / "part1.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        import shutil
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    str(sharded / f"{t}.parquet"))

    out = events_type_approx_distinct(str(sharded))
    assert len(out) == 5 and (out["n_users"] > 0).all()
    assert (out["within_bound"] == 1).all()


def test_count_sketch_inner_product_unbiased():
    """Count-Sketch inner product: exact on disjoint key sets (0) and
    within a few percent on a realistic skewed join."""
    from pdf_extraction_ray.functions import sketch as S
    rng = np.random.default_rng(7)
    # side A: unique keys; side B: zipf-ish repeats of a subset
    a_keys = np.arange(20_000, dtype=np.int64)
    # moderate skew (p ~ 1/sqrt(rank)): std ~ sqrt(|a|*||b||2^2/W) ~ 1.4%
    # of the true size — an extreme zipf(1) tail needs sketch skimming
    # (heavy hitters removed first), out of scope for the estimator
    b_keys = rng.choice(15_000, size=80_000,
                        p=(lambda w: w / w.sum())(
                            1.0 / np.sqrt(np.arange(1, 15_001)))) \
        .astype(np.int64)
    exact = np.isin(b_keys, a_keys).sum()    # a-side counts are all 1
    ska, skb = S.cs_create(), S.cs_create()
    S.cs_add_hashes(ska, _hashes(a_keys))
    S.cs_add_hashes(skb, _hashes(b_keys))
    est = S.cs_inner(ska, skb)
    assert abs(est - exact) / exact < 0.05, (est, int(exact))
    # disjoint sides -> estimate near zero relative to the joint mass
    skc = S.cs_create()
    S.cs_add_hashes(skc, _hashes(np.arange(100_000, 120_000)))
    assert abs(S.cs_inner(ska, skc)) < 0.02 * exact


@pytest.mark.usefixtures("ray_session")
def test_join_size_estimate_vs_exact():
    from pdf_extraction_ray.pipelines.relational import (
        join_size_estimate_cms, orders_lineitem_join_size)
    sf = "/root/testdata/sf0.001"
    exact = int(orders_lineitem_join_size(sf)["join_size"].iloc[0])
    out = join_size_estimate_cms(sf)
    assert exact > 0
    # within_bound carries the <5% estimate check; the exact column
    # must equal the exact twin
    assert int(out["join_size"].iloc[0]) == exact
    assert int(out["within_bound"].iloc[0]) == 1


@pytest.mark.usefixtures("ray_session")
def test_cumulative_hll_tracks_exact_curve():
    """The HLL cumulative-unique-users curve stays within 2% of the
    exact first-seen-day curve on EVERY day (prefix merges must not
    accumulate drift beyond the sketch's standard error)."""
    from pdf_extraction_ray.pipelines.relational import (
        events_cum_users_approx, events_new_users_daily)

    sf = "/root/testdata/sf0.01"
    exact = events_new_users_daily(sf).set_index("day")["cum_users"]
    out = events_cum_users_approx(sf).set_index("day").sort_index()
    # within_bound carries the per-day <2% sketch check; the exact
    # column must match the forward-filled first-seen-day curve
    assert (out["within_bound"] == 1).all()
    assert set(exact.index) <= set(out.index)
    exact_ff = exact.reindex(out.index).ffill()
    for day in out.index:
        assert int(out.loc[day, "cum_users"]) == int(exact_ff.loc[day])


def test_kmv_exact_below_k_and_merge():
    from pdf_extraction_ray.functions.sketch import (
        KMV_K, kmv_distinct, kmv_from_hashes, kmv_merge)
    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**63, size=500, dtype=np.int64).astype(np.uint64)
    sk = kmv_from_hashes(h)
    assert kmv_distinct(sk) == len(np.unique(h))       # exact below k
    # merge == sketch of the union, regardless of split point
    a, b = h[:200], h[150:]                            # overlapping halves
    assert np.array_equal(kmv_merge(kmv_from_hashes(a),
                                    kmv_from_hashes(b)),
                          kmv_from_hashes(h))
    assert KMV_K >= 1024


def test_kmv_distinct_and_intersection_accuracy():
    from pdf_extraction_ray.functions.sketch import (
        kmv_distinct, kmv_from_hashes, kmv_intersection)
    import pandas as pd
    n, common = 50_000, 10_000
    ids_a = np.arange(n, dtype=np.int64)
    ids_b = np.arange(n - common, 2 * n - common, dtype=np.int64)
    ha = pd.util.hash_array(ids_a)
    hb = pd.util.hash_array(ids_b)
    sa, sb = kmv_from_hashes(ha), kmv_from_hashes(hb)
    assert abs(kmv_distinct(sa) - n) / n < 0.10        # ~3% se, 3-sigma
    est = kmv_intersection(sa, sb)
    assert abs(est - common) / common < 0.25, est      # jaccard noise


@pytest.mark.usefixtures("ray_session")
def test_kmv_overlap_tracks_exact():
    from pdf_extraction_ray.pipelines.relational import (
        events_type_overlap_exact, events_type_overlap_kmv)
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = int(events_type_overlap_exact(sf)
                    ["n_common_users"].iloc[0])
        out = events_type_overlap_kmv(sf)
        # 150 distinct users at these SFs -> both sketches are exact
        # (below k), so within_bound asserts estimate == exact
        assert exact > 0
        assert int(out["n_common_users"].iloc[0]) == exact
        assert int(out["within_bound"].iloc[0]) == 1, sf


@pytest.mark.usefixtures("ray_session")
def test_kmv_sliding_distinct_tracks_exact():
    """Windowed KMV merge vs the exact sliding distinct count: at these
    SFs every window holds < k users, so the sketch must be EXACT on
    every window (the estimation regime is covered by the planted
    50k-user test above)."""
    from pdf_extraction_ray.pipelines.relational import (
        events_sliding_distinct, events_sliding_distinct_kmv)
    sf = "/root/testdata/sf0.001"
    exact = events_sliding_distinct(sf).to_pandas() \
        .set_index("window_start")["n_users"]
    out = events_sliding_distinct_kmv(sf).set_index("window_start")
    assert len(exact) == len(out) and len(exact) > 0
    # below k every window's within_bound asserts estimate == exact,
    # and the exact column must equal the twin
    assert (out["within_bound"] == 1).all()
    assert (exact.sort_index().to_numpy()
            == out["n_users"].sort_index().to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_overlap_matrix_consistent_with_pair():
    from pdf_extraction_ray.pipelines.relational import (
        OVERLAP_TYPES, events_type_overlap_exact,
        events_type_overlap_matrix)
    sf = "/root/testdata/sf0.001"
    m = events_type_overlap_matrix(sf)
    a, b = sorted(OVERLAP_TYPES)
    cell = m[(m["type_a"] == a) & (m["type_b"] == b)]
    exact = int(events_type_overlap_exact(sf)["n_common_users"].iloc[0])
    assert int(cell["n_common"].iloc[0]) == exact
    assert (m["type_a"] < m["type_b"]).all()      # unordered, no diag


@pytest.mark.usefixtures("ray_session")
def test_kmv_sliding_estimation_regime_bound(tmp_path):
    """Past k distinct users per window the sketch ESTIMATES: plant 5k
    users in one hour so every covering window's merged sketch is full,
    and the op's within_bound (10% band in the estimation regime) must
    still hold while the exact column stays exact."""
    import os
    import pandas as pd
    from pdf_extraction_ray.pipelines.relational import (
        events_sliding_distinct_kmv)
    n = 5000
    df = pd.DataFrame({
        "event_id": range(n),
        "user_id": range(n),                       # all distinct
        "ts": pd.to_datetime(1_700_000_000 + (pd.RangeIndex(n) % 600),
                             unit="s"),
        "event_type": ["view"] * n,
        "value": [0.0] * n,
        "properties": ["{}"] * n})
    d = tmp_path / "kmvfull"
    d.mkdir()
    df.to_parquet(os.path.join(d, "events.parquet"))
    out = events_sliding_distinct_kmv(str(d))
    assert len(out) > 0
    assert int(out["n_users"].max()) == n          # exact side exact
    from pdf_extraction_ray.functions.sketch import KMV_K
    assert int(out["n_users"].max()) > KMV_K       # estimation regime
    assert (out["within_bound"] == 1).all()        # 10% band holds
