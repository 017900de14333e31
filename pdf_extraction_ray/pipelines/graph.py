"""Graph analytics over the part co-purchase graph.

The reference's only graph-shaped computation is doc-local (the spatial
relationship pairs of `advanced_layout_extractor.py:471-538` and the
IoU dedup clusters); a 100 TB training-data engine also needs the
CROSS-ROW graph tier — co-occurrence graph construction, connected
components, and an iterative vertex program (PageRank) — because
link-based quality signals and dedup-cluster resolution are graph jobs.

Graph definition (derived, no external data): two parts are linked when
they appear in the same order; the edge weight is the SQL-join pair
count (multiplicity-aware: a part appearing twice in one order pairs
twice). Components/PageRank run over edges with weight >= 2 so the
graph is noise-pruned and its size is output-shaped, not corpus-shaped.

Scale notes:
- pair generation never self-joins the fact table globally: one coarse
  exchange on ``l_orderkey`` (same machinery as every grouped map in
  relational.py), per-order pair expansion is bounded by order size
  (~7 lines), and pair counts pre-reduce inside each partition before
  the (part_a, part_b) aggregation exchange.
- components reuse the dedup tier's min-label propagation
  (``dedup.resolve_components``): driver-vectorized rounds for small
  edge sets, the distributed groupby form past 100k edges.
- PageRank keeps BOTH the rank vector and the edge set distributed:
  each iteration is one side-tagged coarse exchange co-partitioning
  ranks with edges (per-partition contribution emit, pre-reduced), a
  groupby-sum on the destination key, and a second side-tagged
  exchange folding the sums back into the (node, rank, deg) vector.
  No process ever holds the full vertex set; edges are materialized
  once and reused across iterations.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .relational import (_coarse_partition_map, _coarse_grouped_map_union,
                         _from_pandas, _pq, _table_empty)

PAIR_TOPK = 20
DEGREE_TOPK = 20
COMPONENT_MIN_WEIGHT = 2
PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 8

_EMPTY_PAIRS = {"part_a": pd.Series(dtype="int64"),
                "part_b": pd.Series(dtype="int64"),
                "n_orders": pd.Series(dtype="int64")}


def _copurchase_pair_counts(sf_dir: str):
    """Dataset of (part_a, part_b, n_orders) for every co-purchased part
    pair (part_a < part_b), multiplicity-aware to match the SQL
    self-join count exactly. One orderkey exchange + one pair-key
    aggregation exchange, pairs pre-reduced per partition. The final
    sum is a coarse exchange + in-partition pandas groupby, NOT a Ray
    Aggregate: the pair key is high-cardinality (~2 pairs per lineitem
    row) and one Ray reduce group per pair is pure scheduler overhead
    (measured 35 s -> 6 s at sf0.01)."""
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey"])

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        # multiplicity per (order, part), then a per-order self-merge:
        # pair weight = mult_a * mult_b (== the SQL join's row count)
        m = g.groupby(["l_orderkey", "l_partkey"], as_index=False) \
             .size().rename(columns={"size": "m"})
        j = m.merge(m, on="l_orderkey", suffixes=("_a", "_b"))
        j = j[j["l_partkey_a"] < j["l_partkey_b"]]
        if j.empty:
            return pd.DataFrame({**_EMPTY_PAIRS,
                                 "pairkey": pd.Series(dtype="int64")})
        j["n_orders"] = j["m_a"] * j["m_b"]
        out = j.rename(columns={"l_partkey_a": "part_a",
                                "l_partkey_b": "part_b"}) \
               [["part_a", "part_b", "n_orders"]] \
            .groupby(["part_a", "part_b"], as_index=False).sum() \
            .astype("int64")
        out["pairkey"] = out["part_a"] * (1 << 32) + out["part_b"]
        return out

    def final_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["part_a", "part_b"], as_index=False) \
            ["n_orders"].sum().astype("int64")

    return _coarse_partition_map(
        _coarse_partition_map(ds, "l_orderkey", pairs_in_partition),
        "pairkey", final_sum)


def part_copurchase_pairs(sf_dir: str):
    """Top co-purchased part pairs by pair count (ties broken on the
    part keys — a deterministic total order both engines share)."""
    if _table_empty(sf_dir, "lineitem"):
        return pd.DataFrame(_EMPTY_PAIRS)
    return (_copurchase_pair_counts(sf_dir)
            .sort(["n_orders", "part_a", "part_b"],
                  descending=[True, False, False])
            .limit(PAIR_TOPK))


COPURCHASE_PAIRS_SQL = f"""
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS n_orders
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT {PAIR_TOPK}
"""


def part_copurchase_degree(sf_dir: str):
    """Top parts by DISTINCT co-purchase partner count (graph degree).
    The aggregated pair set IS the distinct edge set, so degree is one
    explode + one part-keyed count exchange on output-shaped data."""
    if _table_empty(sf_dir, "lineitem"):
        return pd.DataFrame({"part": pd.Series(dtype="int64"),
                             "degree": pd.Series(dtype="int64")})

    def explode(batch: pa.Table) -> pa.Table:
        a = batch["part_a"].to_numpy(zero_copy_only=False)
        b = batch["part_b"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"part": np.concatenate([a, b])})
        out = df.groupby("part", as_index=False).size() \
                .rename(columns={"size": "degree"}).astype("int64")
        return _from_pandas(out)

    return (_copurchase_pair_counts(sf_dir)
            .map_batches(explode, batch_format="pyarrow", batch_size=None)
            .groupby("part")
            .aggregate(Sum("degree", alias_name="degree"))
            .sort(["degree", "part"], descending=[True, False])
            .limit(DEGREE_TOPK))


COPURCHASE_DEGREE_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
SELECT part, count(*) AS degree
FROM (SELECT pa AS part FROM pairs UNION ALL SELECT pb FROM pairs)
GROUP BY part
ORDER BY degree DESC, part
LIMIT {DEGREE_TOPK}
"""


def _copurchase_edges(sf_dir: str) -> pd.DataFrame:
    """Noise-pruned edge list (weight >= COMPONENT_MIN_WEIGHT) as a
    driver DataFrame. The pruned graph is output-shaped (only pairs
    that repeat across orders), collected after both reduction
    exchanges — the same bounded-result contract as the dedup pair
    sets (past ~100k edges the consumers below switch to their
    distributed forms and this collect should become a materialized
    Dataset; resolve_components already carries that dual path)."""
    agg = _copurchase_pair_counts(sf_dir).map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_orders"],
                                            COMPONENT_MIN_WEIGHT)),
        batch_format="pyarrow", batch_size=None)
    df = agg.to_pandas()
    if df.empty:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                             "doc_b": pd.Series(dtype="int64")})
    return df.rename(columns={"part_a": "doc_a", "part_b": "doc_b"}) \
             [["doc_a", "doc_b"]].astype("int64")


def copurchase_components(sf_dir: str):
    """Connected components of the pruned co-purchase graph: every part
    labeled with the min part key of its component. Reuses the dedup
    tier's min-label propagation (distributed groupby form past 100k
    edges)."""
    from .dedup import resolve_components
    if _table_empty(sf_dir, "lineitem"):
        return pd.DataFrame({"part": pd.Series(dtype="int64"),
                             "component": pd.Series(dtype="int64")})
    out = resolve_components(_copurchase_edges(sf_dir))
    return out.rename(columns={"doc_id": "part", "cluster_rep": "component"})


COPURCHASE_COMPONENTS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {COMPONENT_MIN_WEIGHT}),
edges AS (SELECT pa AS s, pb AS d FROM pairs
          UNION ALL SELECT pb, pa FROM pairs),
cc(node, label) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.d, cc.label FROM cc JOIN edges e ON e.s = cc.node
  WHERE cc.label < e.d
)
SELECT node AS part, min(label) AS component FROM cc GROUP BY node
"""


def _pagerank_graph(sf_dir: str):
    """(edges_ds, initial ranks_ds, teleport) for the pruned co-purchase
    graph, or (None, None, None) when the graph is empty."""
    if _table_empty(sf_dir, "lineitem"):
        return None, None, None
    pairs = _copurchase_edges(sf_dir)
    if pairs.empty:
        return None, None, None
    # symmetric directed edge list, materialized once, reused per iter
    sym = pd.DataFrame({
        "src": np.concatenate([pairs.doc_a.to_numpy(),
                               pairs.doc_b.to_numpy()]),
        "dst": np.concatenate([pairs.doc_b.to_numpy(),
                               pairs.doc_a.to_numpy()])}).astype("int64")
    deg = sym.groupby("src", as_index=False).size() \
             .rename(columns={"src": "node", "size": "deg"})
    n_nodes = len(deg)
    edges_ds = rd.from_pandas(sym).repartition(8).materialize()
    ranks_ds = rd.from_pandas(
        pd.DataFrame({"node": deg.node.astype("int64"),
                      "rank": np.full(n_nodes, 1.0 / n_nodes),
                      "deg": deg.deg.astype("float64")})).materialize()
    return edges_ds, ranks_ds, (1.0 - PAGERANK_DAMPING) / n_nodes


def _pagerank_iterate(edges_ds, ranks_ds, teleport: float, n_iters: int,
                      checkpoint_dir: str = None, start: int = 0):
    """Run ``n_iters - start`` PageRank rounds from ``ranks_ds``. With
    ``checkpoint_dir``, every completed iteration writes its rank
    vector as ``iter_{k:02d}/`` parquet plus a ``_DONE`` marker (write
    THEN mark, so a torn checkpoint is never resumed from) — a
    preempted iterative job restarts from the last complete round
    instead of round 0 (``resume_pagerank``)."""
    import os as _os

    # shared side-tag schema for the contribution exchange:
    # (key, side, dst, val); edges side 0 carry dst, ranks side 1
    # carry val = rank/deg (the out-mass per neighbor).
    def tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["src"], pa.array(np.zeros(n, dtype=np.int8)),
             batch["dst"], pa.array(np.full(n, np.nan))],
            names=["key", "side", "dst", "val"])

    def tag_ranks(batch: pa.Table) -> pa.Table:
        n = len(batch)
        out = (batch["rank"].to_numpy(zero_copy_only=False)
               / batch["deg"].to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays(
            [batch["node"], pa.array(np.ones(n, dtype=np.int8)),
             pa.array(np.full(n, -1, dtype=np.int64)), pa.array(out)],
            names=["key", "side", "dst", "val"])

    def contribs(part: pd.DataFrame) -> pd.DataFrame:
        r = part[part["side"] == 1].set_index("key")["val"]
        e = part[part["side"] == 0]
        if e.empty or r.empty:
            return pd.DataFrame({"dst": pd.Series(dtype="int64"),
                                 "contrib": pd.Series(dtype="float64")})
        out = pd.DataFrame({"dst": e["dst"].to_numpy(),
                            "contrib": e["key"].map(r).to_numpy()})
        return out.groupby("dst", as_index=False).sum()

    # fold exchange: summed contributions (side 0) + current vector
    # (side 1, val carries deg so it survives into the next vector)
    def tag_sums(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["dst"], pa.array(np.zeros(n, dtype=np.int8)),
             batch["contrib"]],
            names=["key", "side", "val"])

    def tag_deg(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["node"], pa.array(np.ones(n, dtype=np.int8)),
             batch["deg"]],
            names=["key", "side", "val"])

    def new_ranks(part: pd.DataFrame) -> pd.DataFrame:
        # side-0 rows are PARTIAL contribution sums (one per source
        # partition); summing them here replaces a whole Ray Aggregate
        # round per iteration
        s = part[part["side"] == 0].groupby("key")["val"].sum()
        d = part[part["side"] == 1]
        if d.empty:
            return pd.DataFrame({"node": pd.Series(dtype="int64"),
                                 "rank": pd.Series(dtype="float64"),
                                 "deg": pd.Series(dtype="float64")})
        got = d["key"].map(s).fillna(0.0).to_numpy()
        return pd.DataFrame({
            "node": d["key"].to_numpy(),
            "rank": teleport + PAGERANK_DAMPING * got,
            "deg": d["val"].to_numpy()})

    for k in range(start, n_iters):
        summed = _coarse_grouped_map_union(
            edges_ds.map_batches(tag_edges, batch_format="pyarrow",
                                 batch_size=None),
            ranks_ds.map_batches(tag_ranks, batch_format="pyarrow",
                                 batch_size=None),
            contribs, key="key")
        ranks_ds = _coarse_grouped_map_union(
            summed.map_batches(tag_sums, batch_format="pyarrow",
                               batch_size=None),
            ranks_ds.map_batches(tag_deg, batch_format="pyarrow",
                                 batch_size=None),
            new_ranks, key="key").repartition(8).materialize()
        if checkpoint_dir:
            d = _os.path.join(checkpoint_dir, f"iter_{k:02d}")
            ranks_ds.write_parquet(d)
            with open(_os.path.join(d, "_DONE"), "w") as fh:
                fh.write("ok")
    return ranks_ds


def _pagerank_topk(ranks_ds):
    return (ranks_ds
            .map_batches(lambda b: pa.Table.from_arrays(
                [b["node"], b["rank"]], names=["part", "pagerank"]),
                batch_format="pyarrow", batch_size=None)
            .sort(["pagerank", "part"], descending=[True, False])
            .limit(PAIR_TOPK))


_PAGERANK_EMPTY = {"part": pd.Series(dtype="int64"),
                   "pagerank": pd.Series(dtype="float64")}


def part_copurchase_pagerank(sf_dir: str, checkpoint_dir: str = None):
    """PageRank over the pruned co-purchase graph (damping 0.85, 8
    iterations, uniform init 1/N). The rank vector stays a distributed
    (node, rank, deg) Dataset: each iteration co-partitions it with
    the static edge Dataset through one side-tagged coarse exchange
    (contributions rank/deg emitted per partition, pre-reduced) and a
    fold exchange that sums partials and applies the teleport. The
    symmetric graph has no dangling nodes, so (1-d)/N closes the
    recurrence. With ``checkpoint_dir``, each round checkpoints its
    rank vector (see ``resume_pagerank``). Output: top-20
    (part, pagerank) by rank. Not SQL-expressible (iterative fixpoint)
    — verified by a numpy-differential test (tests/test_graph.py)."""
    edges_ds, ranks_ds, teleport = _pagerank_graph(sf_dir)
    if edges_ds is None:
        return pd.DataFrame(_PAGERANK_EMPTY)
    ranks_ds = _pagerank_iterate(edges_ds, ranks_ds, teleport,
                                 PAGERANK_ITERS,
                                 checkpoint_dir=checkpoint_dir)
    return _pagerank_topk(ranks_ds)


def resume_pagerank(sf_dir: str, checkpoint_dir: str,
                    n_iters: int = PAGERANK_ITERS):
    """Resume a checkpointed PageRank run: find the last iteration with
    a complete (``_DONE``-marked) rank-vector checkpoint, reload it as
    a Dataset, and run only the remaining rounds — the iterative-job
    analog of the extraction tier's partition-manifest resume."""
    import glob as _glob
    import os as _os

    done = sorted(d for d in _glob.glob(
        _os.path.join(checkpoint_dir, "iter_*"))
        if _os.path.exists(_os.path.join(d, "_DONE")))
    edges_ds, ranks_ds, teleport = _pagerank_graph(sf_dir)
    if edges_ds is None:
        return pd.DataFrame(_PAGERANK_EMPTY)
    start = 0
    if done:
        last = done[-1]
        start = int(_os.path.basename(last).split("_")[1]) + 1
        ranks_ds = rd.read_parquet(last).materialize()
    ranks_ds = _pagerank_iterate(edges_ds, ranks_ds, teleport, n_iters,
                                 checkpoint_dir=checkpoint_dir,
                                 start=start)
    return _pagerank_topk(ranks_ds)


# ---------------------------------------------------------------------------
# BFS traversal: hop distance from the min-key node
# ---------------------------------------------------------------------------

BFS_MAX_DEPTH = 16


def copurchase_bfs_depths(sf_dir: str):
    """Single-source BFS over the pruned co-purchase graph: hop distance
    from the globally smallest part key, capped at BFS_MAX_DEPTH (the
    same cap the recursive-CTE oracle applies, so unreachable-within-cap
    nodes are absent from both). Distributed frontier expansion: the
    known-distance vector and the edge set co-partition through one
    side-tagged coarse exchange per round (newly-settled nodes emit
    candidate dist+1 for their neighbors), a fold exchange keeps the
    per-node minimum; rounds stop when no node settles (frontier empty),
    i.e. O(diameter) rounds like the component propagation.
    Output: (part, dist)."""
    empty = pd.DataFrame({"part": pd.Series(dtype="int64"),
                          "dist": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    pairs = _copurchase_edges(sf_dir)
    if pairs.empty:
        return empty

    sym = pd.DataFrame({
        "src": np.concatenate([pairs.doc_a.to_numpy(),
                               pairs.doc_b.to_numpy()]),
        "dst": np.concatenate([pairs.doc_b.to_numpy(),
                               pairs.doc_a.to_numpy()])}).astype("int64")
    source = int(sym["src"].min())

    edges_ds = rd.from_pandas(sym).repartition(8).materialize()
    # dist vector rows: (node, dist, fresh) — fresh marks the frontier
    dist_ds = rd.from_pandas(pd.DataFrame(
        {"node": [source], "dist": [0], "fresh": [1]})).materialize()

    def tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["src"], pa.array(np.zeros(n, dtype=np.int8)),
             batch["dst"], pa.array(np.full(n, -1, dtype=np.int64))],
            names=["key", "side", "dst", "val"])

    def tag_frontier(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["fresh"], 1))
        n = len(t)
        return pa.Table.from_arrays(
            [t["node"], pa.array(np.ones(n, dtype=np.int8)),
             pa.array(np.full(n, -1, dtype=np.int64)), t["dist"]],
            names=["key", "side", "dst", "val"])

    def expand(part: pd.DataFrame) -> pd.DataFrame:
        f = part[part["side"] == 1].set_index("key")["val"]
        e = part[part["side"] == 0]
        if f.empty or e.empty:
            return pd.DataFrame({"node": pd.Series(dtype="int64"),
                                 "cand": pd.Series(dtype="int64")})
        d = e["key"].map(f)
        keep = d.notna().to_numpy()
        out = pd.DataFrame({"node": e["dst"].to_numpy()[keep],
                            "cand": d.to_numpy()[keep].astype(np.int64) + 1})
        return out.groupby("node", as_index=False).min()

    def tag_cands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["node"], pa.array(np.zeros(n, dtype=np.int8)),
             batch["cand"]],
            names=["key", "side", "val"])

    def tag_known(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["node"], pa.array(np.ones(n, dtype=np.int8)),
             batch["dist"]],
            names=["key", "side", "val"])

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        known = part[part["side"] == 1].set_index("key")["val"]
        cand = part[part["side"] == 0].groupby("key")["val"].min()
        nodes = known.index.union(cand.index)
        d = known.reindex(nodes)
        c = cand.reindex(nodes)
        # a node settles (fresh=1) iff it had no distance before — BFS
        # candidates never improve a settled hop distance
        fresh = d.isna() & c.notna()
        dist = d.fillna(c)
        return pd.DataFrame({"node": nodes.to_numpy(),
                             "dist": dist.to_numpy().astype(np.int64),
                             "fresh": fresh.to_numpy().astype(np.int64)})

    for _depth in range(BFS_MAX_DEPTH):
        cands = _coarse_grouped_map_union(
            edges_ds.map_batches(tag_edges, batch_format="pyarrow",
                                 batch_size=None),
            dist_ds.map_batches(tag_frontier, batch_format="pyarrow",
                                batch_size=None),
            expand, key="key")
        dist_ds = _coarse_grouped_map_union(
            cands.map_batches(tag_cands, batch_format="pyarrow",
                              batch_size=None),
            dist_ds.map_batches(tag_known, batch_format="pyarrow",
                                batch_size=None),
            fold, key="key").repartition(8).materialize()
        if dist_ds.sum("fresh") == 0:     # frontier exhausted
            break

    out = dist_ds.to_pandas()             # settled set: output-bounded
    return out[["node", "dist"]] \
        .rename(columns={"node": "part"}).astype("int64") \
        .sort_values("part").reset_index(drop=True)


BFS_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {COMPONENT_MIN_WEIGHT}),
edges AS (SELECT pa AS s, pb AS d FROM pairs
          UNION ALL SELECT pb, pa FROM pairs),
src AS (SELECT min(s) AS m FROM edges),
walk(node, dist) AS (
  SELECT m, 0 FROM src
  UNION
  SELECT e.d, walk.dist + 1 FROM walk JOIN edges e ON e.s = walk.node
  WHERE walk.dist < {BFS_MAX_DEPTH}
)
SELECT node AS part, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node
ORDER BY part
"""


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (Bellman-Ford rounds)
# ---------------------------------------------------------------------------

SSSP_ROUNDS = 4
SSSP_COST_SCALE = 1_000_000


def copurchase_cheapest_paths(sf_dir: str):
    """Weighted SSSP over the pruned co-purchase graph: cost of an edge
    is {SSSP_COST_SCALE} // pair_count (strong links are cheap), source
    is the smallest part key, and dist(v) = exact min path cost using
    at most SSSP_ROUNDS edges — one Bellman-Ford relaxation sweep per
    round, the label-CORRECTING generalization of the BFS frontier
    (a settled node re-enters the frontier whenever its distance
    improves). Same two side-tagged exchanges per round as BFS; all
    costs integer. Output: (part, dist)."""
    empty = pd.DataFrame({"part": pd.Series(dtype="int64"),
                          "dist": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    w = _copurchase_pair_counts(sf_dir).map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_orders"],
                                            COMPONENT_MIN_WEIGHT)),
        batch_format="pyarrow", batch_size=None).to_pandas()
    if w.empty:
        return empty
    cost = (SSSP_COST_SCALE // w["n_orders"].to_numpy(np.int64)) \
        .astype(np.int64)
    sym = pd.DataFrame({
        "src": np.concatenate([w.part_a.to_numpy(), w.part_b.to_numpy()]),
        "dst": np.concatenate([w.part_b.to_numpy(), w.part_a.to_numpy()]),
        "cost": np.concatenate([cost, cost])}).astype("int64")
    source = int(sym["src"].min())

    edges_ds = rd.from_pandas(sym).repartition(8).materialize()
    dist_ds = rd.from_pandas(pd.DataFrame(
        {"node": [source], "dist": [0], "fresh": [1]})).materialize()

    def tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["src"], pa.array(np.zeros(n, dtype=np.int8)),
             batch["dst"], batch["cost"],
             pa.array(np.full(n, -1, dtype=np.int64))],
            names=["key", "side", "dst", "cost", "val"])

    def tag_frontier(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["fresh"], 1))
        n = len(t)
        return pa.Table.from_arrays(
            [t["node"], pa.array(np.ones(n, dtype=np.int8)),
             pa.array(np.full(n, -1, dtype=np.int64)),
             pa.array(np.full(n, -1, dtype=np.int64)), t["dist"]],
            names=["key", "side", "dst", "cost", "val"])

    def relax(part: pd.DataFrame) -> pd.DataFrame:
        f = part[part["side"] == 1].set_index("key")["val"]
        e = part[part["side"] == 0]
        if f.empty or e.empty:
            return pd.DataFrame({"node": pd.Series(dtype="int64"),
                                 "cand": pd.Series(dtype="int64")})
        d = e["key"].map(f)
        keep = d.notna().to_numpy()
        out = pd.DataFrame({
            "node": e["dst"].to_numpy()[keep],
            "cand": d.to_numpy()[keep].astype(np.int64)
            + e["cost"].to_numpy()[keep]})
        return out.groupby("node", as_index=False).min()

    def tag_cands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["node"], pa.array(np.zeros(n, dtype=np.int8)),
             batch["cand"]],
            names=["key", "side", "val"])

    def tag_known(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.Table.from_arrays(
            [batch["node"], pa.array(np.ones(n, dtype=np.int8)),
             batch["dist"]],
            names=["key", "side", "val"])

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        known = part[part["side"] == 1].set_index("key")["val"]
        cand = part[part["side"] == 0].groupby("key")["val"].min()
        nodes = known.index.union(cand.index)
        d = known.reindex(nodes)
        c = cand.reindex(nodes)
        # label-correcting: improvement re-freshens the node
        fresh = (d.isna() & c.notna()) | (c.notna() & (c < d))
        dist = pd.concat([d, c], axis=1).min(axis=1)
        return pd.DataFrame({"node": nodes.to_numpy(),
                             "dist": dist.to_numpy().astype(np.int64),
                             "fresh": fresh.to_numpy().astype(np.int64)})

    for _round in range(SSSP_ROUNDS):
        cands = _coarse_grouped_map_union(
            edges_ds.map_batches(tag_edges, batch_format="pyarrow",
                                 batch_size=None),
            dist_ds.map_batches(tag_frontier, batch_format="pyarrow",
                                batch_size=None),
            relax, key="key")
        dist_ds = _coarse_grouped_map_union(
            cands.map_batches(tag_cands, batch_format="pyarrow",
                              batch_size=None),
            dist_ds.map_batches(tag_known, batch_format="pyarrow",
                                batch_size=None),
            fold, key="key").repartition(8).materialize()
        if dist_ds.sum("fresh") == 0:
            break

    out = dist_ds.to_pandas()
    return out[["node", "dist"]] \
        .rename(columns={"node": "part"}).astype("int64") \
        .sort_values("part").reset_index(drop=True)


SSSP_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {COMPONENT_MIN_WEIGHT}),
edges AS (
  SELECT pa AS s, pb AS d, {SSSP_COST_SCALE} // n AS c FROM pairs
  UNION ALL SELECT pb, pa, {SSSP_COST_SCALE} // n FROM pairs),
src AS (SELECT min(s) AS m FROM edges),
walk(node, dist, hops) AS (
  SELECT m, CAST(0 AS BIGINT), 0 FROM src
  UNION
  SELECT e.d, walk.dist + e.c, walk.hops + 1
  FROM walk JOIN edges e ON e.s = walk.node
  WHERE walk.hops < {SSSP_ROUNDS}
)
SELECT node AS part, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node
ORDER BY part
"""


# ---------------------------------------------------------------------------
# Triangle counting (wedge-check, min-vertex orientation)
# ---------------------------------------------------------------------------

TRIANGLE_TOPK = 20


def copurchase_triangles(sf_dir: str):
    """Per-node triangle participation in the pruned co-purchase graph
    (top-20 by count) — the clustering-structure primitive. Min-vertex
    orientation: every triangle {u<v<w} is generated exactly once as a
    wedge (v, w) at its smallest vertex u, then verified against the
    directed a<b edge set through ONE side-tagged coarse exchange on
    the (v, w) pair key — wedges never meet edges anywhere else, and
    neither the adjacency lists nor the wedge set ever converge on one
    process. Output: (part, n_triangles)."""
    empty = pd.DataFrame({"part": pd.Series(dtype="int64"),
                          "n_triangles": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    pairs = _copurchase_edges(sf_dir)      # doc_a < doc_b, distinct
    if pairs.empty:
        return empty

    edges_df = pairs.rename(columns={"doc_a": "a", "doc_b": "b"})
    edges_ds = rd.from_pandas(edges_df).repartition(8).materialize()

    # wedges at the min vertex: group a<b edges by a; emit neighbor
    # pairs (v < w) with their generating vertex u
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        out_u, out_v, out_w = [], [], []
        for u, grp in g.groupby("a", sort=False):
            nb = np.sort(grp["b"].to_numpy())
            for i in range(len(nb)):
                for j in range(i + 1, len(nb)):
                    out_u.append(u)
                    out_v.append(nb[i])
                    out_w.append(nb[j])
        return pd.DataFrame({"u": out_u, "v": out_v, "w": out_w}) \
            .astype("int64") if out_u else \
            pd.DataFrame({c: pd.Series(dtype="int64")
                          for c in ("u", "v", "w")})

    wedge_ds = _coarse_partition_map(edges_ds, "a", wedges)

    def tag_wedges(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array(v * (1 << 32) + w),
             pa.array(np.zeros(len(batch), dtype=np.int8)),
             batch["u"]],
            names=["key", "side", "u"])

    def tag_edges(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array(a * (1 << 32) + b),
             pa.array(np.ones(len(batch), dtype=np.int8)),
             pa.array(np.full(len(batch), -1, dtype=np.int64))],
            names=["key", "side", "u"])

    def close_wedges(part: pd.DataFrame) -> pd.DataFrame:
        have = set(part.loc[part["side"] == 1, "key"].tolist())
        wg = part[part["side"] == 0]
        if not have or wg.empty:
            return pd.DataFrame({"part": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        closed = wg[wg["key"].isin(have)]
        if closed.empty:
            return pd.DataFrame({"part": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        keys = closed["key"].to_numpy()
        nodes = np.concatenate([closed["u"].to_numpy(),
                                keys >> np.int64(32),
                                keys & np.int64((1 << 32) - 1)])
        return pd.DataFrame({"part": nodes}) \
            .groupby("part", as_index=False).size() \
            .rename(columns={"size": "n"}).astype("int64")

    counts = _coarse_grouped_map_union(
        wedge_ds.map_batches(tag_wedges, batch_format="pyarrow",
                             batch_size=None),
        edges_ds.map_batches(tag_edges, batch_format="pyarrow",
                             batch_size=None),
        close_wedges, key="key")

    def node_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("part", as_index=False)["n"].sum() \
            .rename(columns={"n": "n_triangles"}).astype("int64")

    return _coarse_partition_map(counts, "part", node_sum) \
        .sort(["n_triangles", "part"], descending=[True, False]) \
        .limit(TRIANGLE_TOPK)


TRIANGLES_SQL = f"""
WITH pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {COMPONENT_MIN_WEIGHT}),
tri AS (
  SELECT e1.pa AS u, e1.pb AS v, e2.pb AS w
  FROM pairs e1 JOIN pairs e2 ON e2.pa = e1.pb
  JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
SELECT part, count(*) AS n_triangles
FROM (SELECT u AS part FROM tri UNION ALL
      SELECT v FROM tri UNION ALL SELECT w FROM tri)
GROUP BY part
ORDER BY n_triangles DESC, part
LIMIT {TRIANGLE_TOPK}
"""


# ---------------------------------------------------------------------------
# Set-similarity self-join over order baskets (PPJoin-style prefix filter)
# ---------------------------------------------------------------------------

BASKET_JACCARD_T = 0.5


def orders_similar_baskets(sf_dir: str):
    """All order pairs whose part BASKETS (distinct part sets) have
    Jaccard >= 0.5 — the set-similarity join shape (near-identical
    shopping carts / document token sets). Exact, with prefix-filter
    blocking (SSJoin/PPJoin): under a global canonical token order
    (ascending part frequency, then key — rarest first), a pair with
    |A∩B| >= a shares a token inside both prefixes of length
    |X| - a + 1; J >= t implies |A∩B| >= ceil(t*|X|) for each side, so
    emitting each basket's first |X| - ceil(t*|X|) + 1 tokens is a
    COMPLETE candidate generator (tests assert completeness vs the
    quadratic oracle). Scale shape: one orderkey exchange builds
    baskets (order-size-bounded rows), one token exchange groups
    candidates (prefix tokens are the RARE tokens, so groups stay
    small), per-group verification is exact set intersection; the
    threshold test runs in integers (2i >= u  <=>  i/u >= 0.5).
    Frequencies broadcast once (part-dimension-bounded).
    Output: (order_a, order_b, inter_sz, union_sz, jaccard)."""
    empty = pd.DataFrame({"order_a": pd.Series(dtype="int64"),
                          "order_b": pd.Series(dtype="int64"),
                          "inter_sz": pd.Series(dtype="int64"),
                          "union_sz": pd.Series(dtype="int64"),
                          "jaccard": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    import ray

    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey"])

    def part_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "part": batch["l_partkey"].to_numpy(zero_copy_only=False)})
        return _from_pandas(df.groupby("part", as_index=False).size()
                            .rename(columns={"size": "freq"}))

    def freq_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("part", as_index=False)["freq"].sum() \
            .astype("int64")

    # coarse exchange, not a Ray Aggregate: one reduce group per part
    # key is pure scheduler overhead at part cardinality (9 s -> 1 s)
    freq_df = _coarse_partition_map(
        ds.map_batches(part_partial, batch_format="pyarrow",
                       batch_size=None),
        "part", freq_sum).to_pandas()
    freq_ref = ray.put(dict(zip(freq_df.part, freq_df.freq)))

    def emit_prefixes(g: pd.DataFrame) -> pd.DataFrame:
        freq = ray.get(freq_ref)
        ept = pd.DataFrame({"token": pd.Series(dtype="int64"),
                            "order_id": pd.Series(dtype="int64"),
                            "basket": pd.Series(dtype="object"),
                            "pos": pd.Series(dtype="int64")})
        b = g.drop_duplicates(["l_orderkey", "l_partkey"]).copy()
        if b.empty:
            return ept
        b["f"] = b["l_partkey"].map(freq)
        b = b.sort_values(["l_orderkey", "f", "l_partkey"])
        # fully vectorized prefix emission (the old per-order python
        # loop with per-token appends was the partition's hot spot):
        # run-length boundaries give per-order position/size, the
        # prefix mask is pos < |X| - ceil(t*|X|) + 1 (t = 0.5), and the
        # basket an emitted row carries is its order's row-slice
        # (verify() uses it as an UNORDERED set)
        keys = b["l_orderkey"].to_numpy()
        parts = b["l_partkey"].to_numpy()
        new = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(keys)]
        size = np.repeat(ends - starts, ends - starts)
        pos = np.arange(len(keys)) - np.repeat(starts, ends - starts)
        plen = size - (size + 1) // 2 + 1      # s - ceil(t*s) + 1, t=0.5
        order_idx = np.cumsum(new) - 1         # 0-based order per row
        # baskets ride the token exchange as PACKED int64 bytes (one
        # binary cell), not python lists — object-list serialization
        # through the sort exchange was the operator's dominant cost
        pbytes = parts.astype(np.int64).tobytes()
        baskets = [pbytes[8 * s:8 * e] for s, e in zip(starts, ends)]
        mask = pos < plen
        if not mask.any():
            return ept
        return pd.DataFrame({
            "token": parts[mask].astype(np.int64),
            "order_id": keys[mask].astype(np.int64),
            "basket": [baskets[i] for i in order_idx[mask]],
            "pos": pos[mask].astype(np.int64)})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, grp in g.groupby("token", sort=False):
            n = len(grp)
            if n < 2:
                continue
            orders = grp["order_id"].to_numpy(np.int64)
            pos = grp["pos"].to_numpy(np.int64)
            sizes = np.fromiter((len(x) // 8 for x in grp["basket"]),
                                np.int64, n)
            baskets = None                       # built lazily below
            # the filters kill ~all pairs, so run them VECTORIZED over
            # the pair block and only intersect the survivors; i-chunked
            # so the pair block stays bounded for a hot token
            for i0 in range(0, n - 1, 1024):
                i1 = min(i0 + 1024, n - 1)
                irange = np.arange(i0, i1)
                counts = n - irange - 1          # j runs (i, n)
                ii = np.repeat(irange, counts)
                ends = np.cumsum(counts)
                offs = np.arange(int(ends[-1])) - np.repeat(
                    ends - counts, counts)
                jj = ii + 1 + offs
                keep = orders[ii] != orders[jj]
                sa, sb = sizes[ii], sizes[jj]
                keep &= 2 * np.minimum(sa, sb) >= np.maximum(sa, sb)
                # PPJoin position filter: overlap is bounded by 1 + what
                # remains after this token in each basket; J >= 1/2
                # needs overlap >= (sa+sb)/3. A true pair always passes
                # at its FIRST shared prefix token, which is the
                # occurrence that survives dedup.
                maxov = 1 + np.minimum(sa - pos[ii] - 1,
                                       sb - pos[jj] - 1)
                keep &= 3 * maxov >= sa + sb
                if not keep.any():
                    continue
                if baskets is None:
                    # frozensets beat np.intersect1d ~10x on these tiny
                    # (<=13-element) baskets
                    baskets = [frozenset(np.frombuffer(x, np.int64)
                                         .tolist())
                               for x in grp["basket"]]
                for i, j in zip(ii[keep].tolist(), jj[keep].tolist()):
                    inter = len(baskets[i] & baskets[j])
                    union = int(sizes[i] + sizes[j]) - inter
                    if 2 * inter >= union:       # J >= 0.5 exact
                        a, b2 = sorted((int(orders[i]),
                                        int(orders[j])))
                        rows.append((a, b2, inter, union,
                                     float(inter) / float(union)))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["order_a", "order_b",
                                           "inter_sz", "union_sz",
                                           "jaccard"])

    out = _coarse_partition_map(
        _coarse_partition_map(ds, "l_orderkey", emit_prefixes),
        "token", verify).to_pandas()
    if out.empty:
        return empty
    # a pair sharing several prefix tokens verifies once per token
    return out.drop_duplicates(["order_a", "order_b"]) \
        .sort_values(["order_a", "order_b"]).reset_index(drop=True)


SIMILAR_BASKETS_SQL = f"""
WITH b AS (SELECT l_orderkey o, l_partkey p FROM lineitem GROUP BY 1, 2),
sz AS (SELECT o, count(*) s FROM b GROUP BY o),
inter AS (
  SELECT a.o oa, c.o ob, count(*) i
  FROM b a JOIN b c ON a.p = c.p AND a.o < c.o
  GROUP BY 1, 2)
SELECT oa AS order_a, ob AS order_b,
       i AS inter_sz, (sa.s + sb.s - i) AS union_sz,
       CAST(i AS DOUBLE) / (sa.s + sb.s - i) AS jaccard
FROM inter JOIN sz sa ON sa.o = oa JOIN sz sb ON sb.o = ob
WHERE CAST(i AS DOUBLE) / (sa.s + sb.s - i) >= {BASKET_JACCARD_T}
ORDER BY order_a, order_b
"""


# ---------------------------------------------------------------------------
# Association rules over order baskets (support / confidence / lift)
# ---------------------------------------------------------------------------

RULES_TOPK = 20


def basket_association_rules(sf_dir: str):
    """Market-basket association rules for the top co-occurring part
    pairs: DISTINCT-basket pair supports through the same orderkey
    exchange as the pair counts (baskets deduped per order before pair
    expansion), item supports through a part-keyed count, and the exact
    x1e6 floor-division metrics support, confidence both ways, and
    lift. The top-K pair selection is a distributed sort on the
    aggregated pair table; only the <= 2K involved part keys and the
    K result rows ever reach the driver. Output: (part_a, part_b,
    n_both, n_a, n_b, support_x1e6, conf_a_to_b_x1e6,
    conf_b_to_a_x1e6, lift_x1e6)."""
    cols = ("part_a", "part_b", "n_both", "n_a", "n_b", "support_x1e6",
            "conf_a_to_b_x1e6", "conf_b_to_a_x1e6", "lift_x1e6")
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey"])

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        m = g.drop_duplicates(["l_orderkey", "l_partkey"])
        j = m.merge(m, on="l_orderkey", suffixes=("_a", "_b"))
        j = j[j["l_partkey_a"] < j["l_partkey_b"]]
        if j.empty:
            return pd.DataFrame({**_EMPTY_PAIRS,
                                 "pairkey": pd.Series(dtype="int64")})
        out = j.rename(columns={"l_partkey_a": "part_a",
                                "l_partkey_b": "part_b"}) \
            .groupby(["part_a", "part_b"], as_index=False).size() \
            .rename(columns={"size": "n_orders"}).astype("int64")
        out["pairkey"] = out["part_a"] * (1 << 32) + out["part_b"]
        return out

    def final_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["part_a", "part_b"], as_index=False) \
            ["n_orders"].sum().astype("int64")

    pair_ds = _coarse_partition_map(
        _coarse_partition_map(ds, "l_orderkey", pairs_in_partition),
        "pairkey", final_sum)
    top = pair_ds.sort(["n_orders", "part_a", "part_b"],
                       descending=[True, False, False]) \
        .limit(RULES_TOPK).to_pandas()
    if top.empty:
        return empty

    # item supports for ONLY the involved parts: broadcast the tiny key
    # set, count distinct (order, part) rows per batch, one small sum
    want = sorted(set(top.part_a) | set(top.part_b))
    want_arr = pa.array(np.array(want, dtype=np.int64))

    def item_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch["l_partkey"],
                                  value_set=want_arr))
        df = pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False)}) \
            .drop_duplicates()
        return _from_pandas(df.astype("int64"))

    def item_count(g: pd.DataFrame) -> pd.DataFrame:
        du = g.drop_duplicates(["l_orderkey", "l_partkey"])
        return du.groupby("l_partkey", as_index=False).size() \
            .rename(columns={"size": "c"}).astype("int64")

    ic = _coarse_partition_map(
        ds.map_batches(item_partial, batch_format="pyarrow",
                       batch_size=None),
        "l_partkey", item_count).to_pandas().set_index("l_partkey")["c"]

    # distinct basket count: per-batch distinct orderkeys -> one groupby
    def okey_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["l_orderkey"].to_numpy(zero_copy_only=False))
        return pa.table({"l_orderkey": pa.array(u.astype(np.int64))})

    def okey_count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"n": [g["l_orderkey"].nunique()]}).astype("int64")

    n_orders = int(_coarse_partition_map(
        ds.map_batches(okey_partial, batch_format="pyarrow",
                       batch_size=None),
        "l_orderkey", okey_count).to_pandas()["n"].sum())

    rows = []
    for r in top.itertuples(index=False):
        na, nb = int(ic[r.part_a]), int(ic[r.part_b])
        nab = int(r.n_orders)
        rows.append((int(r.part_a), int(r.part_b), nab, na, nb,
                     nab * 1_000_000 // n_orders,
                     nab * 1_000_000 // na,
                     nab * 1_000_000 // nb,
                     n_orders * nab * 1_000_000 // (na * nb)))
    return pd.DataFrame(rows, columns=list(cols)).astype("int64") \
        .sort_values(["n_both", "part_a", "part_b"],
                     ascending=[False, True, True]).reset_index(drop=True)


RULES_SQL = f"""
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
            FROM lineitem),
n AS (SELECT COUNT(DISTINCT o) AS n FROM op),
ic AS (SELECT p, COUNT(*) AS c FROM op GROUP BY p),
pc2 AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS nab
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2),
top AS (SELECT * FROM pc2 ORDER BY nab DESC, pa, pb LIMIT {RULES_TOPK})
SELECT pa AS part_a, pb AS part_b, CAST(nab AS BIGINT) AS n_both,
       CAST(ca.c AS BIGINT) AS n_a, CAST(cb.c AS BIGINT) AS n_b,
       CAST(nab * 1000000 // (SELECT n FROM n) AS BIGINT)
           AS support_x1e6,
       CAST(nab * 1000000 // ca.c AS BIGINT) AS conf_a_to_b_x1e6,
       CAST(nab * 1000000 // cb.c AS BIGINT) AS conf_b_to_a_x1e6,
       CAST(CAST((SELECT n FROM n) AS HUGEINT) * nab * 1000000
            // (CAST(ca.c AS HUGEINT) * cb.c) AS BIGINT) AS lift_x1e6
FROM top JOIN ic ca ON ca.p = pa JOIN ic cb ON cb.p = pb
ORDER BY n_both DESC, part_a, part_b
"""


# ---------------------------------------------------------------------------
# Link prediction: common-neighbor / Jaccard scores for NON-edges
# ---------------------------------------------------------------------------

LINKPRED_TOPK = 20
LINKPRED_MIN_CN = 2


def copurchase_link_prediction(sf_dir: str):
    """Common-neighbor link prediction over the pruned co-purchase
    graph: for every NON-adjacent part pair sharing >= LINKPRED_MIN_CN
    neighbors, the common-neighbor count and the neighborhood Jaccard
    cn / (deg_u + deg_w - cn) as an exact x1e6 floor division; top-K by
    (jaccard, cn, keys) — the 'parts usually bought with the same
    things' recommender primitive. Scale shape mirrors triangles: wedge
    pairs generate at each shared node through one node exchange
    (pre-reduced per partition), common-neighbor counts aggregate on
    the pair key WITH edge tombstones riding the same exchange (edge
    removal costs no extra pass), both endpoint degrees attach through
    ONE side-tagged node-key exchange (candidates explode into two
    stubs, sym rows pre-reduce map-side), and a final pair-key exchange
    re-merges the halves — four exchanges total, and no adjacency,
    degree vector, or candidate set ever converges on one process.
    Output: (part_a, part_b, cn, jaccard_x1e6)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("part_a", "part_b", "cn", "jaccard_x1e6")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    pairs = _copurchase_edges(sf_dir)      # doc_a < doc_b, distinct
    if pairs.empty:
        return empty

    a = pairs.doc_a.to_numpy()
    b = pairs.doc_b.to_numpy()
    sym = pd.DataFrame({"s": np.concatenate([a, b]),
                        "d": np.concatenate([b, a])}).astype("int64")
    sym_ds = rd.from_pandas(sym).repartition(8).materialize()
    edges_ds = rd.from_pandas(
        pairs.rename(columns={"doc_a": "a", "doc_b": "b"})) \
        .repartition(8).materialize()

    # wedge pairs at every shared node (full adjacency, unlike the
    # min-vertex triangle orientation: cn(u,w) counts ALL shared nodes).
    # Vectorized as a per-partition self-merge on the shared node —
    # memory is sum(deg^2) over the partition's nodes, bounded by the
    # weight>=2 prune (a per-node degree cap is the hub guard at 100 TB)
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        m = g[["s", "d"]]
        j = m.merge(m, on="s", suffixes=("_a", "_b"))
        j = j[j["d_a"] < j["d_b"]]
        if j.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in ("pairkey", "u", "w", "cn")})
        df = j.rename(columns={"d_a": "u", "d_b": "w"}) \
            .groupby(["u", "w"], as_index=False).size() \
            .rename(columns={"size": "cn"}).astype("int64")
        df["pairkey"] = df["u"] * (1 << 32) + df["w"]
        return df[["pairkey", "u", "w", "cn"]]

    wedge_ds = _coarse_partition_map(sym_ds, "s", wedges)

    # exchange 2 (pair-key): CN sums FUSED with existing-edge removal —
    # wedge partials and edge tombstones ride the SAME exchange, so the
    # old separate drop-edges pass disappears
    def tag_cn(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch["pairkey"],
             pa.array(np.zeros(len(batch), dtype=np.int8)),
             batch["u"], batch["w"], batch["cn"]],
            names=["key", "side", "u", "w", "cn"])

    def tag_edges(batch: pa.Table) -> pa.Table:
        ea = batch["a"].to_numpy(zero_copy_only=False)
        eb = batch["b"].to_numpy(zero_copy_only=False)
        z = np.full(len(batch), -1, dtype=np.int64)
        return pa.Table.from_arrays(
            [pa.array(ea * (1 << 32) + eb),
             pa.array(np.ones(len(batch), dtype=np.int8)),
             pa.array(z), pa.array(z), pa.array(z)],
            names=["key", "side", "u", "w", "cn"])

    def cn_and_drop(part: pd.DataFrame) -> pd.DataFrame:
        have = set(part.loc[part["side"] == 1, "key"].tolist())
        wp = part[part["side"] == 0]
        if wp.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                                 ("key", "u", "w", "cn")})
        g = wp.groupby(["key", "u", "w"], as_index=False)["cn"].sum()
        g = g[(g["cn"] >= LINKPRED_MIN_CN) & ~g["key"].isin(have)]
        return g[["key", "u", "w", "cn"]].astype("int64")

    cand_ds = _coarse_grouped_map_union(
        wedge_ds.map_batches(tag_cn, batch_format="pyarrow",
                             batch_size=None),
        edges_ds.map_batches(tag_edges, batch_format="pyarrow",
                             batch_size=None),
        cn_and_drop, key="key")

    # exchange 3 (node-key): BOTH endpoint degrees attach in ONE
    # side-tagged exchange — each candidate explodes into two (node,
    # pairkey, pos) stubs, sym rows pre-reduce per batch into (node,
    # count) partials, and the per-partition merge sums partial degrees
    def explode_cand(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        pk = batch["key"].to_numpy(zero_copy_only=False)
        cn = batch["cn"].to_numpy(zero_copy_only=False)
        n = len(u)
        return pa.Table.from_pydict({
            "key": np.concatenate([u, w]).astype(np.int64),
            "side": np.zeros(2 * n, dtype=np.int8),
            "pairkey": np.tile(pk, 2).astype(np.int64),
            "pos": np.repeat(np.array([0, 1], dtype=np.int64), n),
            "cn": np.tile(cn, 2).astype(np.int64)})

    def deg_partial(batch: pa.Table) -> pa.Table:
        g = pd.DataFrame({"key": batch["s"]
                          .to_numpy(zero_copy_only=False)}) \
            .groupby("key", as_index=False).size()
        n = len(g)
        return pa.Table.from_pydict({
            "key": g["key"].to_numpy(np.int64),
            "side": np.ones(n, dtype=np.int8),
            "pairkey": np.full(n, -1, dtype=np.int64),
            "pos": np.full(n, -1, dtype=np.int64),
            "cn": g["size"].to_numpy(np.int64)})

    def attach_deg(part: pd.DataFrame) -> pd.DataFrame:
        c = part[part["side"] == 0]
        if c.empty:
            return pd.DataFrame({k: pd.Series(dtype="int64") for k in
                                 ("pairkey", "pos", "cn", "deg")})
        deg = part[part["side"] == 1].groupby("key")["cn"].sum()
        c = c.copy()
        c["deg"] = c["key"].map(deg).astype("int64")
        return c[["pairkey", "pos", "cn", "deg"]].astype("int64")

    deg_rows = _coarse_grouped_map_union(
        cand_ds.map_batches(explode_cand, batch_format="pyarrow",
                            batch_size=None),
        sym_ds.map_batches(deg_partial, batch_format="pyarrow",
                           batch_size=None),
        attach_deg, key="key")

    # exchange 4 (pair-key): re-merge the two degree halves; endpoints
    # recover from the pairkey (u*2^32 + w, partkeys < 2^32)
    def merge_pair(part: pd.DataFrame) -> pd.DataFrame:
        a = part[part["pos"] == 0]
        b = part[part["pos"] == 1][["pairkey", "deg"]] \
            .rename(columns={"deg": "deg_w"})
        if a.empty or b.empty:
            return pd.DataFrame({k: pd.Series(dtype="int64") for k in
                                 ("u", "w", "cn", "deg_u", "deg_w")})
        j = a.rename(columns={"deg": "deg_u"}).merge(b, on="pairkey")
        pk = j["pairkey"].to_numpy(np.int64)
        j["u"] = pk >> 32
        j["w"] = pk & ((1 << 32) - 1)
        return j[["u", "w", "cn", "deg_u", "deg_w"]].astype("int64")

    out = _coarse_partition_map(deg_rows, "pairkey", merge_pair) \
        .to_pandas()
    if out.empty:
        return empty
    out["jaccard_x1e6"] = (out["cn"] * 1_000_000
                           // (out["deg_u"] + out["deg_w"] - out["cn"]))
    out = out.rename(columns={"u": "part_a", "w": "part_b"})
    out = out.sort_values(["jaccard_x1e6", "cn", "part_a", "part_b"],
                          ascending=[False, False, True, True]) \
        .head(LINKPRED_TOPK)
    return out[["part_a", "part_b", "cn", "jaccard_x1e6"]] \
        .astype("int64").reset_index(drop=True)


LINKPRED_SQL = f"""
WITH pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {COMPONENT_MIN_WEIGHT}),
edges AS (SELECT pa AS s, pb AS d FROM pairs
          UNION ALL SELECT pb, pa FROM pairs),
deg AS (SELECT s AS node, COUNT(*) AS deg FROM edges GROUP BY s),
cn AS (
  SELECT e1.d AS u, e2.d AS w, COUNT(*) AS cn
  FROM edges e1 JOIN edges e2 ON e1.s = e2.s AND e1.d < e2.d
  GROUP BY 1, 2 HAVING COUNT(*) >= {LINKPRED_MIN_CN}),
nonedge AS (
  SELECT cn.u, cn.w, cn.cn
  FROM cn LEFT JOIN pairs p ON p.pa = cn.u AND p.pb = cn.w
  WHERE p.pa IS NULL)
SELECT n.u AS part_a, n.w AS part_b, n.cn,
       n.cn * 1000000 // (du.deg + dw.deg - n.cn) AS jaccard_x1e6
FROM nonedge n
JOIN deg du ON du.node = n.u
JOIN deg dw ON dw.node = n.w
ORDER BY jaccard_x1e6 DESC, cn DESC, part_a, part_b
LIMIT {LINKPRED_TOPK}
"""


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling)
# ---------------------------------------------------------------------------

def kcore_labels(edges: pd.DataFrame) -> pd.DataFrame:
    """Core number per node of an undirected edge list (columns doc_a,
    doc_b): the largest k such that the node survives in the subgraph
    where every node has degree >= k. Matula-Beck peeling, vectorized:
    phase k repeatedly deletes nodes whose CURRENT degree is < k; a
    node deleted in phase k has core number k-1. Iterate-to-fixpoint
    inside each phase makes this non-SQL-expressible (recursive CTEs
    cannot aggregate over the recursive reference), hence the planted
    unit test instead of a DuckDB oracle. Each round is one bincount
    over the surviving edge array — the distributed form is the same
    loop with the degree count as a groupby-sum and the node drop as a
    semi-join, peeling whole degree-classes per exchange."""
    if edges.empty:
        return pd.DataFrame({"part": pd.Series(dtype="int64"),
                             "core": pd.Series(dtype="int64")})
    a = edges["doc_a"].to_numpy(np.int64)
    b = edges["doc_b"].to_numpy(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[:len(a)], inv[len(a):]
    n = len(nodes)
    alive_e = np.ones(len(ia), dtype=bool)
    alive_n = np.ones(n, dtype=bool)
    core = np.zeros(n, dtype=np.int64)
    k = 1
    while alive_n.any():
        while True:
            deg = np.bincount(ia[alive_e], minlength=n) \
                + np.bincount(ib[alive_e], minlength=n)
            drop = alive_n & (deg < k)
            if not drop.any():
                break
            core[drop] = k - 1
            alive_n &= ~drop
            alive_e &= alive_n[ia] & alive_n[ib]
        k += 1
    return pd.DataFrame({"part": nodes, "core": core}) \
        .sort_values(["core", "part"], ascending=[False, True]) \
        .reset_index(drop=True)


def copurchase_kcore(sf_dir: str):
    """k-core decomposition of the pruned co-purchase graph — the
    cohesion tier past components: core numbers separate tightly-knit
    product clusters (high k) from tree-like fringe (k=1). Pair
    pruning/aggregation run distributed as in ``copurchase_components``;
    peeling runs over the output-shaped pruned edge list. Output:
    (part, core), core desc."""
    if _table_empty(sf_dir, "lineitem"):
        return pd.DataFrame({"part": pd.Series(dtype="int64"),
                             "core": pd.Series(dtype="int64")})
    return kcore_labels(_copurchase_edges(sf_dir))


# ---------------------------------------------------------------------------
# Item-item cosine similarity from co-purchase counts
# ---------------------------------------------------------------------------

COSINE_MIN_CO = 2
COSINE_TOPK = 20


def part_copurchase_cosine(sf_dir: str):
    """Item-item cosine similarity over binary basket vectors — the
    classic item-based collaborative-filtering score: cosine(a, b) =
    co / sqrt(d_a * d_b) where co = DISTINCT orders containing both
    parts and d_x = DISTINCT orders containing x. Pair supports flow
    through the same orderkey exchange as the basket rules (dedupe
    before pair expansion, pre-reduced pairkey aggregation); part
    degrees are one part-keyed count over the deduped (order, part)
    rows and broadcast as a dimension-table lookup (the part catalog is
    catalog-shaped, not fact-shaped; past broadcast size the same
    side-tagged coarse exchange the PageRank fold uses applies). The
    cosine double is ONE division by an exactly-rounded SQRT, so the
    descending sort agrees bit-exactly with the oracle; ties break on
    the part keys. Output: (part_a, part_b, co, da, db, cosine)."""
    cols = ("part_a", "part_b", "co", "da", "db")
    empty = pd.DataFrame({**{c: pd.Series(dtype="int64") for c in cols},
                          "cosine": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey"])

    def pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
        m = g.drop_duplicates(["l_orderkey", "l_partkey"])
        j = m.merge(m, on="l_orderkey", suffixes=("_a", "_b"))
        j = j[j["l_partkey_a"] < j["l_partkey_b"]]
        if j.empty:
            return pd.DataFrame({**_EMPTY_PAIRS,
                                 "pairkey": pd.Series(dtype="int64")})
        out = j.rename(columns={"l_partkey_a": "part_a",
                                "l_partkey_b": "part_b"}) \
            .groupby(["part_a", "part_b"], as_index=False).size() \
            .rename(columns={"size": "n_orders"}).astype("int64")
        out["pairkey"] = out["part_a"] * (1 << 32) + out["part_b"]
        return out

    def final_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["part_a", "part_b"], as_index=False) \
            ["n_orders"].sum().astype("int64")
        return out[out["n_orders"] >= COSINE_MIN_CO]

    pair_ds = _coarse_partition_map(
        _coarse_partition_map(ds, "l_orderkey", pairs_in_partition),
        "pairkey", final_sum)

    # part degrees: distinct (order, part) -> part-keyed count
    def dedupe_batch(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_orderkey": batch["l_orderkey"].to_numpy(zero_copy_only=False),
            "l_partkey": batch["l_partkey"].to_numpy(zero_copy_only=False)}) \
            .drop_duplicates()
        return _from_pandas(df.astype("int64"))

    def item_count(g: pd.DataFrame) -> pd.DataFrame:
        du = g.drop_duplicates(["l_orderkey", "l_partkey"])
        return du.groupby("l_partkey", as_index=False).size() \
            .rename(columns={"size": "d"}).astype("int64")

    deg = _coarse_partition_map(
        ds.map_batches(dedupe_batch, batch_format="pyarrow",
                       batch_size=None),
        "l_partkey", item_count).to_pandas()
    if deg.empty:
        return empty
    keys = deg["l_partkey"].to_numpy(np.int64)
    order = np.argsort(keys)
    deg_ref = ray.put((keys[order], deg["d"].to_numpy(np.int64)[order]))

    def score(batch: pa.Table) -> pa.Table:
        dk, dv = ray.get(deg_ref)
        a = batch["part_a"].to_numpy(zero_copy_only=False)
        b = batch["part_b"].to_numpy(zero_copy_only=False)
        co = batch["n_orders"].to_numpy(zero_copy_only=False)
        da = dv[np.searchsorted(dk, a)]
        db = dv[np.searchsorted(dk, b)]
        cos = co.astype(np.float64) / np.sqrt((da * db).astype(np.float64))
        return pa.table({"part_a": a, "part_b": b, "co": co,
                         "da": da, "db": db, "cosine": cos})

    return (pair_ds.map_batches(score, batch_format="pyarrow",
                                batch_size=None)
            .sort(["cosine", "part_a", "part_b"],
                  descending=[True, False, False])
            .limit(COSINE_TOPK))


COPURCHASE_COSINE_SQL = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
d AS (SELECT p, COUNT(*) AS d FROM op GROUP BY p),
c AS (
  SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS co
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
  HAVING COUNT(*) >= {COSINE_MIN_CO})
SELECT part_a, part_b, CAST(co AS BIGINT) AS co,
       CAST(da.d AS BIGINT) AS da, CAST(db.d AS BIGINT) AS db,
       CAST(co AS DOUBLE) / SQRT(CAST(da.d * db.d AS DOUBLE)) AS cosine
FROM c JOIN d da ON da.p = part_a JOIN d db ON db.p = part_b
ORDER BY cosine DESC, part_a, part_b
LIMIT {COSINE_TOPK}
"""


# ---------------------------------------------------------------------------
# Recursive hierarchy rollup (bill-of-materials shape)
# ---------------------------------------------------------------------------

HIER_FANOUT = 4      # synthetic containment tree: parent(node) = node // 4


def part_hierarchy_rollup(sf_dir: str):
    """Subtree aggregation over a recursive containment hierarchy (the
    bill-of-materials / org-chart rollup the oracle needs WITH
    RECURSIVE for): every part sits in a deterministic synthetic tree
    (parent = key // {HIER_FANOUT}), and each node's rollup is the
    COUNT and retail-price cents SUM over every part in its subtree
    (self included). Ray shape: no recursion at run time — each part
    EXPLODES its ancestor chain in one vectorized map (chain length is
    log_{HIER_FANOUT}(keyspace), <= ~16 even at 2^63 keys), and ONE
    node-keyed exchange sums the partials; depth never serializes the
    pipeline the way the SQL recursion does. Output: (node, n_desc,
    subtree_x100)."""
    from .relational import _cents
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("node", "n_desc", "subtree_x100")})
    if _table_empty(sf_dir, "part"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_retailprice"])

    def explode(batch: pa.Table) -> pa.Table:
        node = batch["p_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        val = _cents(batch["p_retailprice"]).to_numpy(zero_copy_only=False)
        nodes, vals = [node], [val]
        while True:                     # ancestor chain, quartering up
            m = node >= HIER_FANOUT
            if not m.any():
                break
            node = node[m] // HIER_FANOUT
            val = val[m]
            nodes.append(node)
            vals.append(val)
        df = pd.DataFrame({"node": np.concatenate(nodes),
                           "cents": np.concatenate(vals)})
        part = df.groupby("node", as_index=False) \
            .agg(n_desc=("cents", "size"), subtree_x100=("cents", "sum"))
        return _from_pandas(part.astype("int64"))

    def reduce_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False) \
            .agg(n_desc=("n_desc", "sum"),
                 subtree_x100=("subtree_x100", "sum")).astype("int64")

    return _coarse_partition_map(
        ds.map_batches(explode, batch_format="pyarrow", batch_size=None),
        "node", reduce_nodes).sort("node")


HIER_ROLLUP_SQL = f"""
WITH RECURSIVE anc AS (
  SELECT p_partkey AS node,
         CAST(round(p_retailprice * 100.0) AS BIGINT) AS cents
  FROM part
  UNION ALL
  SELECT node // {HIER_FANOUT}, cents FROM anc WHERE node >= {HIER_FANOUT})
SELECT CAST(node AS BIGINT) AS node,
       CAST(COUNT(*) AS BIGINT) AS n_desc,
       CAST(SUM(cents) AS BIGINT) AS subtree_x100
FROM anc GROUP BY node ORDER BY node
"""


GRAPH_QUERIES: dict[str, tuple] = {
    "basket_association_rules": (basket_association_rules, RULES_SQL),
    "copurchase_link_prediction": (copurchase_link_prediction,
                                   LINKPRED_SQL),
    "part_copurchase_pairs": (part_copurchase_pairs, COPURCHASE_PAIRS_SQL),
    "part_copurchase_degree": (part_copurchase_degree,
                               COPURCHASE_DEGREE_SQL),
    "copurchase_components": (copurchase_components,
                              COPURCHASE_COMPONENTS_SQL),
    "part_copurchase_pagerank": (part_copurchase_pagerank, None),
    "copurchase_bfs_depths": (copurchase_bfs_depths, BFS_SQL),
    "copurchase_cheapest_paths": (copurchase_cheapest_paths, SSSP_SQL),
    "copurchase_triangles": (copurchase_triangles, TRIANGLES_SQL),
    "orders_similar_baskets": (orders_similar_baskets,
                               SIMILAR_BASKETS_SQL),
    "part_copurchase_cosine": (part_copurchase_cosine,
                               COPURCHASE_COSINE_SQL),
    "copurchase_kcore": (copurchase_kcore, None),
    "part_hierarchy_rollup": (part_hierarchy_rollup, HIER_ROLLUP_SQL),
}
