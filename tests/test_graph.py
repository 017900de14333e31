"""Graph-analytics tier: co-purchase pair semantics (multiplicity-aware,
the SQL self-join contract), connected components on planted cliques,
and a numpy-differential check of the distributed PageRank iteration."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.pipelines import graph as G

SF = "/root/testdata/sf0.001"


def _write_lineitem(d, orders):
    """orders: list of part-key lists (one entry per order, with
    multiplicities)."""
    rows = []
    for ok, parts in enumerate(orders):
        for pk in parts:
            rows.append((ok + 1, pk))
    pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]) \
        .astype("int64").to_parquet(os.path.join(d, "lineitem.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_copurchase_pairs_multiplicity(tmp_path):
    """A part appearing twice in one order pairs twice — the exact
    count(*) of the SQL self-join, not the distinct-pair count."""
    d = str(tmp_path)
    _write_lineitem(d, [
        [1, 2, 2],        # (1,2) weight 2 (multiplicity), (2,2) excluded
        [1, 2],           # (1,2) +1 -> 3
        [3, 4], [3, 4],   # (3,4) weight 2
        [5, 6],           # weight 1
        [7],              # singleton order: no pairs
    ])
    out = G.part_copurchase_pairs(d)
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    got = {(r.part_a, r.part_b): r.n_orders for r in df.itertuples()}
    assert got == {(1, 2): 3, (3, 4): 2, (5, 6): 1}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{d}/lineitem.parquet')")
    odf = con.sql(G.COPURCHASE_PAIRS_SQL).df()
    assert got == {(r.part_a, r.part_b): r.n_orders
                   for r in odf.itertuples()}


@pytest.mark.usefixtures("ray_session")
def test_copurchase_components_planted_cliques(tmp_path):
    """Two disjoint repeat-pair cliques resolve to two components with
    min-key labels; weight-1 edges are pruned out entirely."""
    d = str(tmp_path)
    _write_lineitem(d, [
        [1, 2], [1, 2],            # edge (1,2) w2
        [2, 3], [2, 3],            # edge (2,3) w2 -> {1,2,3}
        [10, 11], [10, 11],        # {10,11}
        [5, 6],                    # w1: pruned, 5/6 absent from output
    ])
    out = G.copurchase_components(d)
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    got = dict(zip(df.part, df.component))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_numpy_power_iteration(tmp_path, monkeypatch):
    """The distributed (ranks x edges co-partition -> contribution sum
    -> fold) iteration must equal the dense numpy recurrence at every
    returned vertex."""
    monkeypatch.setattr(G, "PAGERANK_ITERS", 3)
    d = str(tmp_path)
    # a star {1..5 around 0} plus a triangle {20,21,22}, all weight 2
    orders = []
    for leaf in (1, 2, 3, 4, 5):
        orders += [[0, leaf], [0, leaf]]
    for a, b in ((20, 21), (21, 22), (20, 22)):
        orders += [[a, b], [a, b]]
    _write_lineitem(d, orders)

    out = G.part_copurchase_pagerank(d)
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert len(df) == 9          # all nodes fit in the top-20

    # dense reference with identical semantics
    edges = [(0, leaf) for leaf in (1, 2, 3, 4, 5)] + \
        [(20, 21), (21, 22), (20, 22)]
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, b in edges:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(3):
        contrib = np.zeros(n)
        out_mass = rank / deg
        for a, b in edges:
            contrib[idx[b]] += out_mass[idx[a]]
            contrib[idx[a]] += out_mass[idx[b]]
        rank = (1 - G.PAGERANK_DAMPING) / n + G.PAGERANK_DAMPING * contrib
    expected = {node: rank[idx[node]] for node in nodes}
    for r in df.itertuples():
        assert abs(r.pagerank - expected[r.part]) < 1e-12, r.part
    # hub outranks leaves; triangle nodes are symmetric
    ranks = dict(zip(df.part, df.pagerank))
    assert ranks[0] > ranks[1]
    assert abs(ranks[20] - ranks[21]) < 1e-12


@pytest.mark.usefixtures("ray_session")
def test_bfs_depths_on_planted_path(tmp_path):
    """Chain 1-2-3-4: hop distances 0..3 from the min node; the other
    component (10-11) is unreachable and absent."""
    d = str(tmp_path)
    orders = []
    for a, b in ((1, 2), (2, 3), (3, 4), (10, 11)):
        orders += [[a, b], [a, b]]        # weight 2 -> kept edges
    _write_lineitem(d, orders)
    out = G.copurchase_bfs_depths(d)
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert dict(zip(df.part, df.dist)) == {1: 0, 2: 1, 3: 2, 4: 3}


@pytest.mark.usefixtures("ray_session")
def test_similar_baskets_boundary_semantics(tmp_path):
    """Jaccard boundary inclusion (exactly 0.5 kept), identical baskets
    (J=1), below-boundary excluded, multiplicities collapse to sets."""
    d = str(tmp_path)
    _write_lineitem(d, [
        [1, 2],           # o1: {1,2}
        [1, 2],           # o2: identical -> J(o1,o2)=1
        [1],              # o3: {1}; J(o3,o1)=1/2 boundary -> kept
        [3, 4, 5, 6],     # o4
        [3, 4, 7, 8],     # o5: inter 2, union 6 -> 1/3 excluded
        [9, 9, 10],       # o6: set {9,10} (multiplicity collapsed)
        [9, 10, 10],      # o7: set {9,10} -> J=1
    ])
    out = G.orders_similar_baskets(d)
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    got = {(r.order_a, r.order_b): (r.inter_sz, r.union_sz, r.jaccard)
           for r in df.itertuples()}
    assert got == {(1, 2): (2, 2, 1.0), (1, 3): (1, 2, 0.5),
                   (2, 3): (1, 2, 0.5), (6, 7): (2, 2, 1.0)}


@pytest.mark.usefixtures("ray_session")
def test_graph_family_on_empty_tables(tmp_path):
    import pyarrow.parquet as pq
    d = str(tmp_path / "empty")
    os.makedirs(d, exist_ok=True)
    for t in ("lineitem", "part"):
        tbl = pq.read_table(f"{SF}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), os.path.join(d, f"{t}.parquet"))
    for name, (fn, _sql) in G.GRAPH_QUERIES.items():
        res = fn(d)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        assert len(df) == 0, name


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [3, 19])
def test_graph_oracles_on_random_tables(tmp_path, seed):
    """Randomized co-purchase structure (small part pool forces heavy
    multiplicity and repeat pairs) vs the DuckDB oracles."""
    rng = np.random.default_rng(seed)
    d = str(tmp_path / f"g{seed}")
    os.makedirs(d, exist_ok=True)
    n_li = 500
    pd.DataFrame({
        "l_orderkey": rng.integers(0, 80, size=n_li).astype(np.int64),
        "l_partkey": rng.integers(0, 25, size=n_li).astype(np.int64),
    }).to_parquet(os.path.join(d, "lineitem.parquet"))
    pd.DataFrame({
        "p_partkey": np.arange(1, 26, dtype=np.int64),
        "p_retailprice": rng.integers(100, 9999, size=25) / 100.0,
    }).to_parquet(os.path.join(d, "part.parquet"))

    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    for name, (fn, sql) in G.GRAPH_QUERIES.items():
        if sql is None:
            continue
        res = fn(d)
        ray_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        duck_df = con.sql(sql).df()
        rc = ray_df[sorted(ray_df.columns)] \
            .sort_values(by=sorted(ray_df.columns)).reset_index(drop=True)
        oc = duck_df[sorted(duck_df.columns)] \
            .sort_values(by=sorted(duck_df.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(rc, oc, check_dtype=False,
                                      check_exact=True,
                                      obj=f"{name}@{seed}")


@pytest.mark.usefixtures("ray_session")
def test_pagerank_checkpoint_resume(tmp_path, monkeypatch):
    """A preempted iterative job resumes from the last complete
    checkpoint: 2 checkpointed rounds + resume to 4 must equal a
    straight 4-round run at every vertex."""
    monkeypatch.setattr(G, "PAGERANK_ITERS", 4)
    d = str(tmp_path / "g")
    os.makedirs(d, exist_ok=True)
    orders = []
    for a, b in ((1, 2), (2, 3), (3, 4), (1, 4), (2, 5)):
        orders += [[a, b], [a, b]]
    _write_lineitem(d, orders)

    full = G.part_copurchase_pagerank(d)
    full = full if isinstance(full, pd.DataFrame) else full.to_pandas()

    # "crash" after 2 checkpointed rounds...
    store = str(tmp_path / "ckpt")
    os.makedirs(store, exist_ok=True)
    monkeypatch.setattr(G, "PAGERANK_ITERS", 2)
    G.part_copurchase_pagerank(d, checkpoint_dir=store)
    assert os.path.exists(os.path.join(store, "iter_01", "_DONE"))
    # ...then resume to 4 total
    monkeypatch.setattr(G, "PAGERANK_ITERS", 4)
    resumed = G.resume_pagerank(d, store, n_iters=4)
    resumed = resumed if isinstance(resumed, pd.DataFrame) \
        else resumed.to_pandas()
    assert os.path.exists(os.path.join(store, "iter_03", "_DONE"))

    f = dict(zip(full.part, full.pagerank))
    r = dict(zip(resumed.part, resumed.pagerank))
    assert set(f) == set(r)
    for k in f:
        assert abs(f[k] - r[k]) < 1e-12, k


@pytest.mark.usefixtures("ray_session")
def test_link_prediction_planted(tmp_path):
    """Edges 1-2, 1-3, 4-2, 4-3, 2-3 (each planted twice to survive the
    weight>=2 prune): the only non-edge with >= 2 common neighbors is
    (1,4) via {2,3}; (2,3) also shares {1,4} but IS an edge and must be
    excluded. Jaccard(1,4) = 2/(2+2-2) = 1.0 exactly."""
    d = str(tmp_path)
    edges = [[1, 2], [1, 3], [4, 2], [4, 3], [2, 3]]
    _write_lineitem(d, edges + edges)
    out = G.copurchase_link_prediction(d)
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert list(zip(df.part_a, df.part_b, df.cn, df.jaccard_x1e6)) == \
        [(1, 4, 2, 1_000_000)]


@pytest.mark.usefixtures("ray_session")
def test_association_rules_planted(tmp_path):
    """Baskets {1,2} x3, {1} x1, {2,3} x1: n=5 distinct orders,
    pair (1,2): support 3/5, conf 1->2 = 3/4, conf 2->1 = 3/4,
    lift = 5*3/(4*4); multiplicities inside one basket must NOT
    inflate distinct-basket counts."""
    from pdf_extraction_ray.pipelines.graph import (
        basket_association_rules)
    d = str(tmp_path)
    _write_lineitem(d, [[1, 2, 2], [1, 2], [1, 2], [1], [2, 3]])
    out = basket_association_rules(d).set_index(["part_a", "part_b"])
    r = out.loc[(1, 2)]
    assert r.n_both == 3 and r.n_a == 4 and r.n_b == 4
    assert r.support_x1e6 == 3 * 1_000_000 // 5
    assert r.conf_a_to_b_x1e6 == 3 * 1_000_000 // 4
    assert r.conf_b_to_a_x1e6 == 3 * 1_000_000 // 4
    assert r.lift_x1e6 == 5 * 3 * 1_000_000 // 16
    r2 = out.loc[(2, 3)]
    assert r2.n_both == 1 and r2.n_a == 4 and r2.n_b == 1


@pytest.mark.usefixtures("ray_session")
def test_sssp_prefers_cheap_two_hop(tmp_path):
    """Edge costs 1e6//n: a strong 2-hop chain (n=10 each, cost 2e5)
    must beat a weak direct edge (n=2, cost 5e5); unreachable-within-4-
    hops nodes are absent."""
    from pdf_extraction_ray.pipelines.graph import (
        copurchase_cheapest_paths, SSSP_COST_SCALE)
    d = str(tmp_path)
    orders = []
    orders += [[1, 2]] * 10          # strong 1-2
    orders += [[2, 3]] * 10          # strong 2-3
    orders += [[1, 3]] * 2           # weak direct 1-3
    # a far chain beyond 4 hops from source 1: 3-4,4-5,5-6,6-7,7-8
    for a, b in ((3, 4), (4, 5), (5, 6), (6, 7), (7, 8)):
        orders += [[a, b]] * 2
    _write_lineitem(d, orders)
    out = copurchase_cheapest_paths(d).set_index("part")["dist"]
    assert out[1] == 0
    assert out[2] == SSSP_COST_SCALE // 10
    assert out[3] == 2 * (SSSP_COST_SCALE // 10)      # 2-hop beats direct
    assert out[7] == 2 * (SSSP_COST_SCALE // 10) \
        + 4 * (SSSP_COST_SCALE // 2) if 7 in out.index else True
    assert 8 not in out.index        # 5 hops from 3 -> beyond the cap


def test_kcore_planted_graph():
    """Known decomposition: 4-clique (core 3), a triangle sharing one
    node (core 2), and a pendant path (core 1)."""
    # 4-clique on 1..4; triangle 4-5-6; path 6-7-8
    edges = pd.DataFrame({
        "doc_a": [1, 1, 1, 2, 2, 3, 4, 4, 5, 6, 7],
        "doc_b": [2, 3, 4, 3, 4, 4, 5, 6, 6, 7, 8]}).astype("int64")
    out = G.kcore_labels(edges).set_index("part")["core"]
    assert {n: int(out[n]) for n in range(1, 9)} == {
        1: 3, 2: 3, 3: 3, 4: 3, 5: 2, 6: 2, 7: 1, 8: 1}


def test_kcore_empty_and_single_edge():
    assert G.kcore_labels(pd.DataFrame({
        "doc_a": pd.Series(dtype="int64"),
        "doc_b": pd.Series(dtype="int64")})).empty
    one = G.kcore_labels(pd.DataFrame({"doc_a": [1], "doc_b": [2]})
                         .astype("int64"))
    assert one["core"].tolist() == [1, 1]


@pytest.mark.usefixtures("ray_session")
def test_kcore_matches_networkx_free_reference(tmp_path):
    """Differential check against an independent O(V^2) reference
    implementation on the sf0.001 co-purchase graph."""
    df = G._copurchase_edges(SF)
    got = G.kcore_labels(df).set_index("part")["core"].to_dict()

    # independent reference: brute-force peel per k
    import collections
    adj = collections.defaultdict(set)
    for a, b in df.itertuples(index=False):
        adj[a].add(b)
        adj[b].add(a)
    ref = {}
    alive = set(adj)
    k = 1
    while alive:
        changed = True
        while changed:
            changed = False
            for n in list(alive):
                if sum(1 for m in adj[n] if m in alive) < k:
                    ref[n] = k - 1
                    alive.discard(n)
                    changed = True
        k += 1
    assert got == ref and len(got) > 0


@pytest.mark.usefixtures("ray_session")
def test_hierarchy_rollup_hand_tree(tmp_path):
    """Tiny hand tree: parts 1..20 at 1.00 each, parent = key // 4.
    Node 5's subtree is {5, 20} (20//4 == 5, 21+ absent); the three
    roots {1, 2, 3} together cover every part exactly once."""
    import os
    d = str(tmp_path)
    pd.DataFrame({"p_partkey": np.arange(1, 21, dtype=np.int64),
                  "p_retailprice": np.ones(20)}) \
        .to_parquet(os.path.join(d, "part.parquet"))
    from pdf_extraction_ray.pipelines.graph import part_hierarchy_rollup
    out = part_hierarchy_rollup(d).to_pandas().set_index("node")
    assert out.loc[5, "n_desc"] == 2          # {5, 20}
    assert out.loc[5, "subtree_x100"] == 200
    assert out.loc[4, "n_desc"] == 5          # {4, 16, 17, 18, 19}
    roots = out.loc[[1, 2, 3]]
    assert roots["n_desc"].sum() == 20
    assert roots["subtree_x100"].sum() == 2000


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0])
def test_hierarchy_rollup_fuzz_vs_duckdb(tmp_path, seed):
    import os
    rng = np.random.default_rng(400 + seed)
    d = str(tmp_path)
    n = int(rng.integers(50, 300))
    keys = rng.choice(np.arange(1, 5000), size=n, replace=False)
    pd.DataFrame({"p_partkey": np.sort(keys).astype(np.int64),
                  "p_retailprice": rng.integers(100, 99999, size=n)
                  / 100.0}) \
        .to_parquet(os.path.join(d, "part.parquet"))
    from pdf_extraction_ray.pipelines.graph import (HIER_ROLLUP_SQL,
                                                    part_hierarchy_rollup)
    got = part_hierarchy_rollup(d).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM "
                f"read_parquet('{os.path.join(d, 'part.parquet')}')")
    want = con.sql(HIER_ROLLUP_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
