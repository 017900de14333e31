"""Statistical / analytical operators: grouped OLS trend, interpolated
percentiles, skyline (Pareto frontier), and an edit-distance fuzzy
self-join — the analytics tier above the plain grouped aggregates of
pipelines/relational.py.

Reference analogs: the evidence classifier's weighted linear scoring
(`table_figure_classifier.py:15-24`) and grid-regularity statistics
(`pdf_vector_utils.py:194-218`) are the reference's only statistical
kernels; these operators generalize that tier to cross-row model
fitting (trend), order statistics (percentile_cont), multi-objective
selection (skyline), and approximate string matching (entity-resolution
blocking), all DuckDB-oracled bit-exactly.

Exactness strategy (shared with relational.py): every sum that feeds a
final float expression is an INTEGER partial (cents / epoch days), the
final expression is evaluated once from exact integers with the same
operation order as the oracle SQL, so float results are bit-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from .relational import (_cents, _coarse_partition_map, _from_pandas,
                         _pq, _table_empty)

# ---------------------------------------------------------------------------
# Grouped OLS trend: revenue slope per supplier nation
# ---------------------------------------------------------------------------

# Epoch-day offset subtracted from x before the moment sums: slope is
# shift-invariant, and centering keeps sum(x*y) inside int64 out to
# ~600M rows/group (|x'| <= ~1300 days for the 1995-2001 ship range,
# y <= ~1e7 cents). The per-nation moment combination runs in Python
# ints (exact, unbounded) on the tiny per-group partial rows.
TREND_X_BASE = 10400


def nation_revenue_trend(sf_dir: str):
    """Per-supplier-nation OLS slope of line revenue (cents) against
    ship day: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx) over raw line
    items. Partials (n, Sx, Sy, Sxy, Sxx) are exact int64 per batch,
    pre-reduced map-side so the exchange moves <= 25 rows per batch;
    the final moments combine driver-side in Python ints and convert
    to double once — the identical operation sequence the oracle's
    HUGEINT sums + CAST AS DOUBLE perform, so results are bit-exact.
    Output: (nation, n_lines, slope_x100_per_day)."""
    empty = pd.DataFrame({"nation": pd.Series(dtype="object"),
                          "n_lines": pd.Series(dtype="int64"),
                          "slope_x100_per_day": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty

    sup = pd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(_pq(sf_dir, "nation"),
                          columns=["n_nationkey", "n_name"])
    nk = dict(zip(sup.s_suppkey, sup.s_nationkey))
    nname = dict(zip(nat.n_nationkey, nat.n_name))
    import ray
    maps_ref = ray.put((nk, nname))

    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        nk, nname = ray.get(maps_ref)
        # date32 cast is timestamp-unit-agnostic (us fixtures, ns pandas)
        x = (batch["l_shipdate"].cast(pa.date32()).cast(pa.int32())
             .to_numpy(zero_copy_only=False).astype(np.int64)
             - TREND_X_BASE)
        y = _cents(pc.multiply(batch["l_extendedprice"],
                               pc.subtract(pa.scalar(1.0),
                                           batch["l_discount"]))) \
            .to_numpy(zero_copy_only=False)
        nations = pd.Series(batch["l_suppkey"].to_numpy(zero_copy_only=False)) \
            .map(nk).map(nname)
        df = pd.DataFrame({"nation": nations.to_numpy(),
                           "n_lines": np.ones(len(batch), dtype=np.int64),
                           "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        return _from_pandas(df.groupby("nation", as_index=False).sum())

    parts = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
             .groupby("nation")
             .aggregate(Sum("n_lines", alias_name="n_lines"),
                        Sum("sx", alias_name="sx"),
                        Sum("sy", alias_name="sy"),
                        Sum("sxy", alias_name="sxy"),
                        Sum("sxx", alias_name="sxx"))
             .to_pandas())
    rows = []
    for r in parts.itertuples(index=False):
        n, sx, sy, sxy, sxx = (int(r.n_lines), int(r.sx), int(r.sy),
                               int(r.sxy), int(r.sxx))
        den = n * sxx - sx * sx
        if n < 2 or den == 0:
            continue
        rows.append((r.nation, n, float(n * sxy - sx * sy) / float(den)))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["nation", "n_lines",
                                       "slope_x100_per_day"]) \
        .sort_values("nation").reset_index(drop=True)


TREND_SQL = f"""
WITH pts AS (
  SELECT n.n_name AS nation,
         (CAST(l.l_shipdate AS DATE) - DATE '1970-01-01')
           - {TREND_X_BASE} AS x,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
              AS BIGINT) AS y
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey),
sums AS (
  SELECT nation, count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM pts GROUP BY nation)
SELECT nation, CAST(n AS BIGINT) AS n_lines,
       CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
         AS slope_x100_per_day
FROM sums
WHERE n >= 2 AND (n*sxx - sx*sx) <> 0
ORDER BY nation
"""


# ---------------------------------------------------------------------------
# Interpolated per-group percentiles (percentile_cont semantics)
# ---------------------------------------------------------------------------

PCTL_QS = (0.5, 0.9)


def events_value_percentiles_cont(sf_dir: str):
    """Per event-type INTERPOLATED percentiles (p50/p90) of the event
    value in cents — percentile_cont semantics, exact (not sketched;
    the DDSketch variant is ``events_value_quantiles_approx``).
    Distributed form: one (type, cents) pre-reduced count exchange
    compacts the corpus to its value histogram (bounded by the value
    domain, ~50k cent values, NOT by row count); the order statistics
    interpolate from cumulative counts with DuckDB's exact formula
    rn = q*(n-1); lo + (rn-floor(rn))*(hi-lo), evaluated in float64 in
    the same op order, so results are bit-exact."""
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "p50_x100": pd.Series(dtype="float64"),
                          "p90_x100": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "events"):
        return empty

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            "v_x100": _cents(batch["value"]).to_numpy(zero_copy_only=False)})
        out = df.groupby(["event_type", "v_x100"], as_index=False).size() \
                .rename(columns={"size": "cnt"})
        return _from_pandas(out)

    hist = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(["event_type", "v_x100"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas())
    if hist.empty:
        return empty

    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("v_x100")
        vals = g["v_x100"].to_numpy(dtype=np.float64)
        cum = g["cnt"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        ps = []
        for q in PCTL_QS:
            rn = q * (n - 1)
            frn = np.floor(rn)
            crn = np.ceil(rn)
            lo = vals[np.searchsorted(cum, int(frn), side="right")]
            hi = vals[np.searchsorted(cum, int(crn), side="right")]
            # DuckDB's Interpolator: lo*(CRN-RN) + hi*(RN-FRN) when the
            # bracket is proper, plain lo when RN is integral — NOT the
            # lo + frac*(hi-lo) form, which differs in the last ulp
            ps.append(lo if crn == frn
                      else lo * (crn - rn) + hi * (rn - frn))
        rows.append((etype, *ps))
    return pd.DataFrame(rows, columns=["event_type", "p50_x100",
                                       "p90_x100"]) \
        .sort_values("event_type").reset_index(drop=True)


PCTL_SQL = """
SELECT event_type,
  percentile_cont(0.5) WITHIN GROUP
    (ORDER BY CAST(round(value*100) AS BIGINT)) AS p50_x100,
  percentile_cont(0.9) WITHIN GROUP
    (ORDER BY CAST(round(value*100) AS BIGINT)) AS p90_x100
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier): cheapest-largest parts
# ---------------------------------------------------------------------------

def part_price_size_skyline(sf_dir: str):
    """Pareto frontier over (minimize p_retailprice, maximize p_size):
    parts no other part dominates. Skylines COMPOSE — the global
    skyline is the skyline of the union of per-block skylines — so one
    vectorized local pass per block reduces the corpus to frontier
    candidates (tiny), and a single final pass resolves them. No keyed
    exchange at all; the reduction is a map + coalesce."""
    empty = pd.DataFrame({"p_partkey": pd.Series(dtype="int64"),
                          "p_retailprice": pd.Series(dtype="float64"),
                          "p_size": pd.Series(dtype="int32")})
    if _table_empty(sf_dir, "part"):
        return empty

    def local_skyline(df: pd.DataFrame) -> pd.DataFrame:
        # dominated iff a strictly-cheaper part has >= size, or a
        # same-price part has > size. Vectorized: per-price max size,
        # prefix-max over strictly cheaper prices.
        gmax = df.groupby("p_retailprice")["p_size"].max().sort_index()
        prefix = gmax.cummax().shift(1, fill_value=np.iinfo(np.int64).min)
        price_ok = gmax > prefix
        keep = ((df["p_size"].to_numpy()
                 == df["p_retailprice"].map(gmax).to_numpy())
                & df["p_retailprice"].map(price_ok).to_numpy())
        return df[keep]

    def per_batch(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "p_partkey": batch["p_partkey"].to_numpy(zero_copy_only=False),
            "p_retailprice":
                batch["p_retailprice"].to_numpy(zero_copy_only=False),
            "p_size": batch["p_size"].to_numpy(zero_copy_only=False)})
        return _from_pandas(local_skyline(df))

    ds = rd.read_parquet(_pq(sf_dir, "part"),
                         columns=["p_partkey", "p_retailprice", "p_size"])
    cands = ds.map_batches(per_batch, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if cands.empty:
        return empty
    out = local_skyline(cands)
    return out.sort_values("p_partkey").reset_index(drop=True)


SKYLINE_SQL = """
SELECT p_partkey, p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# Edit-distance fuzzy self-join over part names (ER blocking)
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 2


def levenshtein(s: str, t: str) -> int:
    """Classic unit-cost edit distance (insert/delete/substitute = 1),
    the semantics DuckDB's levenshtein() implements. Row-vectorized DP
    over the shorter string."""
    if len(s) < len(t):
        s, t = t, s
    if not t:
        return len(s)
    t_codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(t) + 1)
    for i, cs in enumerate(s, 1):
        cur = np.empty(len(t) + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (t_codes != ord(cs)).astype(np.int64)
        for j in range(1, len(t) + 1):
            cur[j] = min(cur[j - 1] + 1, prev[j] + 1, sub[j - 1])
        prev = cur
    return int(prev[-1])


def part_name_fuzzy_pairs(sf_dir: str):
    """All DISTINCT part-name pairs within edit distance <= 2, with the
    per-name part counts — the blocking step of fuzzy entity
    resolution. Scale shape: (1) one name-keyed count exchange compacts
    the corpus to its name vocabulary (vocab-bounded, never row-bounded);
    (2) candidate generation is a LENGTH-BUCKET exchange — each name
    posts an index row at its own length and probe rows at lengths
    len..len+2, so every pair within the distance bound (which forces
    |len(a)-len(b)| <= 2) meets in EXACTLY one bucket, with no
    all-pairs comparison across buckets; (3) the DP verify runs inside
    each bucket. Output: (name_a, name_b, dist, cnt_a, cnt_b),
    lexicographically ordered pairs."""
    empty = pd.DataFrame({"name_a": pd.Series(dtype="object"),
                          "name_b": pd.Series(dtype="object"),
                          "dist": pd.Series(dtype="int64"),
                          "cnt_a": pd.Series(dtype="int64"),
                          "cnt_b": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "part"):
        return empty

    ds = rd.read_parquet(_pq(sf_dir, "part"), columns=["p_name"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "name": batch["p_name"].to_numpy(zero_copy_only=False)})
        out = df.groupby("name", as_index=False).size() \
                .rename(columns={"size": "cnt"})
        return _from_pandas(out)

    names = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
             .groupby("name").aggregate(Sum("cnt", alias_name="cnt")))

    def post(batch: pa.Table) -> pa.Table:
        nm = batch["name"].to_numpy(zero_copy_only=False)
        cnt = batch["cnt"].to_numpy(zero_copy_only=False)
        lens = np.char.str_len(nm.astype(str))
        buckets, sides, out_nm, out_cnt = [], [], [], []
        for k in range(FUZZY_MAX_DIST + 1):       # probe rows upward
            buckets.append(lens + k)
            sides.append(np.zeros(len(nm), dtype=np.int8))
            out_nm.append(nm)
            out_cnt.append(cnt)
        buckets.append(lens)                       # index row at own len
        sides.append(np.ones(len(nm), dtype=np.int8))
        out_nm.append(nm)
        out_cnt.append(cnt)
        return pa.Table.from_arrays(
            [pa.array(np.concatenate(buckets).astype(np.int64)),
             pa.array(np.concatenate(sides)),
             pa.array(np.concatenate(out_nm)),
             pa.array(np.concatenate(out_cnt).astype(np.int64))],
            names=["bucket", "side", "name", "cnt"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        idx = g[g["side"] == 1]
        prb = g[g["side"] == 0]
        rows = []
        for pn, pcnt in zip(prb["name"], prb["cnt"]):
            for ix, icnt in zip(idx["name"], idx["cnt"]):
                # each unordered pair verifies exactly once: the
                # shorter name probes the longer's bucket; equal
                # lengths tie-break lexicographically
                if len(pn) > len(ix):
                    continue
                if len(pn) == len(ix) and pn >= ix:
                    continue
                d = levenshtein(pn, ix)
                if d <= FUZZY_MAX_DIST:
                    a, b = (pn, ix) if pn < ix else (ix, pn)
                    ca, cb = (pcnt, icnt) if pn < ix else (icnt, pcnt)
                    rows.append((a, b, d, int(ca), int(cb)))
        if not rows:
            return empty
        return pd.DataFrame(rows, columns=["name_a", "name_b", "dist",
                                           "cnt_a", "cnt_b"])

    out = (names.map_batches(post, batch_format="pyarrow", batch_size=None)
           .groupby("bucket")
           .map_groups(per_bucket, batch_format="pandas")
           .to_pandas())
    if out.empty:
        return empty
    return out.sort_values(["name_a", "name_b"]).reset_index(drop=True) \
        .astype({"dist": "int64", "cnt_a": "int64", "cnt_b": "int64"})


FUZZY_SQL = f"""
WITH d AS (SELECT p_name AS name, count(*) AS cnt FROM part GROUP BY 1)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
       a.cnt AS cnt_a, b.cnt AS cnt_b
FROM d a JOIN d b ON a.name < b.name
WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
ORDER BY name_a, name_b
"""


# ---------------------------------------------------------------------------
# Feature-table build (star-join denormalization rewrite)
# ---------------------------------------------------------------------------

def events_feature_table(sf_dir: str):
    """The feature-engineering denormalization every training pipeline
    runs before modeling: one wide row per event with the user's
    account features (balance cents, segment, nation name) and derived
    time features (hour-of-day, day-of-week) attached. The dimension
    chain customer->nation broadcasts once (dimension-bounded; the
    co-partitioned q10 machinery is the fallback when the user side
    stops being broadcastable) and the rewrite is a single vectorized
    map over the fact stream — no exchange at all.
    Output: (event_id, user_id, hour, dow, value_x100, bal_x100,
    segment, nation)."""
    empty = pd.DataFrame({
        "event_id": pd.Series(dtype="int64"),
        "user_id": pd.Series(dtype="int64"),
        "hour": pd.Series(dtype="int64"),
        "dow": pd.Series(dtype="int64"),
        "value_x100": pd.Series(dtype="int64"),
        "bal_x100": pd.Series(dtype="int64"),
        "segment": pd.Series(dtype="object"),
        "nation": pd.Series(dtype="object")})
    if _table_empty(sf_dir, "events"):
        return empty
    import ray

    cust = pd.read_parquet(_pq(sf_dir, "customer"),
                           columns=["c_custkey", "c_acctbal",
                                    "c_mktsegment", "c_nationkey"])
    nat = pd.read_parquet(_pq(sf_dir, "nation"),
                          columns=["n_nationkey", "n_name"])
    side = cust.merge(nat, left_on="c_nationkey",
                      right_on="n_nationkey")
    from ..functions.arrow_utils import round_half_away
    side_map = {
        int(r.c_custkey): (int(round_half_away(
            np.array([r.c_acctbal]))[0]), r.c_mktsegment, r.n_name)
        for r in side.assign(c_acctbal=side.c_acctbal * 100.0)
        .itertuples()}
    side_ref = ray.put(side_map)

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def widen(batch: pa.Table) -> pa.Table:
        m = ray.get(side_ref)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        feats = pd.Series(uid).map(m)
        keep = feats.notna().to_numpy()          # INNER join semantics
        feats = feats[keep]
        ts = pd.Series(batch["ts"].to_numpy(zero_copy_only=False)[keep])
        return pa.Table.from_pydict({
            "event_id": batch["event_id"].to_numpy(
                zero_copy_only=False)[keep],
            "user_id": uid[keep],
            "hour": ts.dt.hour.to_numpy(dtype=np.int64),
            "dow": ts.dt.dayofweek.to_numpy(dtype=np.int64),
            "value_x100": _cents(batch["value"]).to_numpy(
                zero_copy_only=False)[keep],
            "bal_x100": np.array([f[0] for f in feats], dtype=np.int64),
            "segment": np.array([f[1] for f in feats], dtype=object),
            "nation": np.array([f[2] for f in feats], dtype=object)})

    return ds.map_batches(widen, batch_format="pyarrow", batch_size=None)


FEATURE_TABLE_SQL = """
SELECT e.event_id, e.user_id,
       CAST(hour(e.ts) AS BIGINT) AS hour,
       CAST(isodow(e.ts) - 1 AS BIGINT) AS dow,
       CAST(round(e.value * 100) AS BIGINT) AS value_x100,
       CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_x100,
       c.c_mktsegment AS segment,
       n.n_name AS nation
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Percent-of-total contribution (two-pass share analysis)
# ---------------------------------------------------------------------------

def nation_revenue_share(sf_dir: str):
    """Each supplier nation's revenue share of the corpus total — the
    contribution-analysis window (SUM OVER ()) as a two-pass
    distributed plan: pass 1 is the existing pre-reduced grouped sum,
    the scalar total folds driver-side in Python ints, and the share is
    one exact int->double division per group.
    Output: (nation, revenue_x100, share)."""
    empty = pd.DataFrame({"nation": pd.Series(dtype="object"),
                          "revenue_x100": pd.Series(dtype="int64"),
                          "share": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    import ray
    from ray.data.aggregate import Sum as _Sum

    sup = pd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(_pq(sf_dir, "nation"),
                          columns=["n_nationkey", "n_name"])
    nk = dict(zip(sup.s_suppkey, sup.s_nationkey))
    nname = dict(zip(nat.n_nationkey, nat.n_name))
    maps_ref = ray.put((nk, nname))

    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        nk, nname = ray.get(maps_ref)
        y = _cents(pc.multiply(batch["l_extendedprice"],
                               pc.subtract(pa.scalar(1.0),
                                           batch["l_discount"]))) \
            .to_numpy(zero_copy_only=False)
        nations = pd.Series(batch["l_suppkey"]
                            .to_numpy(zero_copy_only=False)) \
            .map(nk).map(nname)
        df = pd.DataFrame({"nation": nations.to_numpy(),
                           "revenue_x100": y})
        return _from_pandas(df.groupby("nation", as_index=False).sum())

    g = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby("nation")
         .aggregate(_Sum("revenue_x100", alias_name="revenue_x100"))
         .to_pandas())
    if "revenue_x100" not in g.columns:
        # empty supplier/nation side: every row joins away (the
        # all-empty grouped result comes back schema-less)
        return empty
    total = int(g["revenue_x100"].astype("int64").sum())
    if total == 0:
        return empty
    g["revenue_x100"] = g["revenue_x100"].astype("int64")
    g["share"] = np.array(
        [float(int(v)) / float(total) for v in g["revenue_x100"]])
    return g.sort_values("nation").reset_index(drop=True)


REVENUE_SHARE_SQL = """
WITH g AS (
  SELECT n.n_name AS nation,
         SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT)) AS rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name)
SELECT nation, CAST(rev AS BIGINT) AS revenue_x100,
       CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE) AS share
FROM g ORDER BY nation
"""


KEYNESS_TOP = 3


def part_brand_keyness(sf_dir: str):
    """Distinctive name tokens per brand by integer LIFT keyness —
    lift = tf_brand * total_tokens / (tf_global * brand_tokens), the
    log-free class-keyness ranking (which words does THIS brand use
    more than the catalog does). One (brand, token) count exchange;
    the token-marginal totals are vocabulary-bounded and fold
    driver-side; top-{KEYNESS_TOP} per brand by (lift desc, token).
    Exact x1e6 big-int cross-division (HUGEINT in the oracle).
    Output: (p_brand, token, n_bt, keyness_x1e6, kw_rank)."""
    cols = ("p_brand", "token", "n_bt", "keyness_x1e6", "kw_rank")
    empty = pd.DataFrame({
        "p_brand": pd.Series(dtype="object"),
        "token": pd.Series(dtype="object"),
        "n_bt": pd.Series(dtype="int64"),
        "keyness_x1e6": pd.Series(dtype="int64"),
        "kw_rank": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "part"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "part"),
                         columns=["p_brand", "p_name"])

    def explode(batch: pa.Table) -> pa.Table:
        brands = batch["p_brand"].to_pandas()
        names = batch["p_name"].to_pandas()
        b = brands.repeat(names.str.split().str.len())
        t = names.str.split().explode()
        g = pd.DataFrame({"p_brand": b.to_numpy(),
                          "token": t.to_numpy()}) \
            .groupby(["p_brand", "token"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return _from_pandas(g.astype({"n": "int64"}))

    bt = (ds.map_batches(explode, batch_format="pyarrow",
                         batch_size=None)
          .groupby(["p_brand", "token"])
          .aggregate(Sum("n", alias_name="n"))
          .to_pandas())
    if bt.empty:
        return empty
    tok_tot = bt.groupby("token")["n"].sum()
    brand_tot = bt.groupby("p_brand")["n"].sum()
    total = int(bt["n"].sum())
    rows = []
    for r in bt.itertuples(index=False):
        n_bt = int(r.n)
        rows.append((r.p_brand, r.token, n_bt,
                     n_bt * total * 1_000_000
                     // (int(tok_tot[r.token])
                         * int(brand_tot[r.p_brand]))))
    df = pd.DataFrame(rows, columns=["p_brand", "token", "n_bt",
                                     "keyness_x1e6"])
    df = df.sort_values(["p_brand", "keyness_x1e6", "token"],
                        ascending=[True, False, True])
    df["kw_rank"] = df.groupby("p_brand").cumcount() + 1
    out = df[df["kw_rank"] <= KEYNESS_TOP].reset_index(drop=True)
    return out.astype({"n_bt": "int64", "keyness_x1e6": "int64",
                       "kw_rank": "int64"})


KEYNESS_SQL = rf"""
WITH tok AS (
  SELECT p_brand,
         unnest(regexp_split_to_array(trim(p_name), '\s+')) AS token
  FROM part),
bt AS (SELECT p_brand, token, CAST(COUNT(*) AS BIGINT) AS n_bt
       FROM tok GROUP BY 1, 2),
tt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_t
       FROM tok GROUP BY 1),
bb AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_b
       FROM tok GROUP BY 1),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok),
k AS (
  SELECT bt.p_brand, bt.token, bt.n_bt,
         CAST(CAST(bt.n_bt AS HUGEINT) * g.total * 1000000
              // (tt.n_t * bb.n_b) AS BIGINT) AS keyness_x1e6
  FROM bt JOIN tt USING (token) JOIN bb USING (p_brand), g),
r AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY p_brand
      ORDER BY keyness_x1e6 DESC, token) AS BIGINT) AS kw_rank
  FROM k)
SELECT p_brand, token, n_bt, keyness_x1e6, kw_rank
FROM r WHERE kw_rank <= {KEYNESS_TOP}
ORDER BY p_brand, kw_rank
"""


LORENZ_DECILES = 10


def customer_lorenz_points(sf_dir: str):
    """Lorenz curve of customer revenue concentration: customers sorted
    by revenue ascending, one point per population decile with the
    cumulative revenue share — the curve behind the Gini/ABC scalars.
    Per-customer sums are one keyed exchange; the curve computes from
    the COMPACTED per-revenue-value histogram (value-domain-bounded,
    same trick as the ABC classes), so no global sort of customers is
    needed: decile cut = the k-th order statistic read off cumulative
    counts, tie-inclusive cents from cumulative value sums. Everything
    integer; the share is one floor division x1e6.
    Output: (decile, cum_customers, cum_rev_x100, rev_share_x1e6)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("decile", "cum_customers", "cum_rev_x100",
                           "rev_share_x1e6")})
    if _table_empty(sf_dir, "orders"):
        return empty

    def per_cust(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cust", as_index=False)["cents"].sum()
        # compact to the (revenue value -> n customers) histogram
        h = out.groupby("cents", as_index=False).size() \
            .rename(columns={"size": "n"})
        return h.astype("int64")

    def prep(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [batch["o_custkey"], _cents(batch["o_totalprice"])],
            names=["cust", "cents"])

    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"]) \
        .map_batches(prep, batch_format="pyarrow", batch_size=None)
    hist = _coarse_partition_map(ds, "cust", per_cust).to_pandas()
    if hist.empty:
        return empty
    # partitions emit per-value counts for DISJOINT customer sets, so
    # one more value-keyed fold gives the global histogram
    hist = hist.groupby("cents", as_index=False)["n"].sum() \
        .sort_values("cents")
    vals = hist["cents"].to_numpy(np.int64)
    cnt = hist["n"].to_numpy(np.int64)
    ccnt = cnt.cumsum()
    crev = (vals * cnt).cumsum()
    n_cust = int(ccnt[-1])
    tot = int(crev[-1])
    rows = []
    for d in range(1, LORENZ_DECILES + 1):
        k = d * n_cust // LORENZ_DECILES        # customers in decile
        i = int(np.searchsorted(ccnt, k))       # value bucket of the cut
        # revenue of the k poorest: full buckets below + partial bucket
        below = int(crev[i - 1]) if i > 0 else 0
        nbelow = int(ccnt[i - 1]) if i > 0 else 0
        rev = below + (k - nbelow) * int(vals[i]) if k > nbelow else below
        rows.append((d, k, rev,
                     rev * 1_000_000 // tot if tot else 0))
    return pd.DataFrame(rows, columns=["decile", "cum_customers",
                                       "cum_rev_x100",
                                       "rev_share_x1e6"]) \
        .astype("int64")


LORENZ_SQL = f"""
WITH c AS (
  SELECT o_custkey,
         SUM(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS rev
  FROM orders GROUP BY 1),
r AS (
  SELECT rev,
         ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rn,
         SUM(rev) OVER (ORDER BY rev, o_custkey
                        ROWS UNBOUNDED PRECEDING) AS crev
  FROM c),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS BIGINT) AS tot FROM c),
d AS (SELECT unnest(generate_series(1, {LORENZ_DECILES})) AS decile)
SELECT CAST(d.decile AS BIGINT) AS decile,
       CAST(d.decile * t.n // {LORENZ_DECILES} AS BIGINT)
           AS cum_customers,
       CAST(COALESCE((SELECT crev FROM r
                      WHERE rn = d.decile * t.n // {LORENZ_DECILES}),
                     0) AS BIGINT) AS cum_rev_x100,
       CAST(COALESCE((SELECT crev FROM r
                      WHERE rn = d.decile * t.n // {LORENZ_DECILES}),
                     0) * 1000000 // t.tot AS BIGINT) AS rev_share_x1e6
FROM d, t ORDER BY decile
"""


def region_revenue_hhi(sf_dir: str):
    """Herfindahl-Hirschman market-concentration index of supplier-
    nation revenue within each region: HHI = sum(share_i^2) =
    sum(rev_i^2) / (sum rev_i)^2 over the region's nations — the
    'is this region's supply concentrated in one nation' monitor that
    complements the Gini tier. Distributed piece: the per-nation cents
    sums (pre-reduced grouped exchange, dims broadcast once); the
    region fold is a 5-row driver reduction in exact Python ints
    (rev^2 exceeds int64 at scale — arbitrary-precision here, HUGEINT
    in the oracle), with ONE float expression per region.
    Output: (region, n_nations, revenue_x100, hhi)."""
    empty = pd.DataFrame({"region": pd.Series(dtype="object"),
                          "n_nations": pd.Series(dtype="int64"),
                          "revenue_x100": pd.Series(dtype="int64"),
                          "hhi": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    import ray
    from ray.data.aggregate import Sum as _Sum

    sup = pd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(_pq(sf_dir, "nation"),
                          columns=["n_nationkey", "n_name",
                                   "n_regionkey"])
    reg = pd.read_parquet(_pq(sf_dir, "region"),
                          columns=["r_regionkey", "r_name"])
    nk = dict(zip(sup.s_suppkey, sup.s_nationkey))
    nname = dict(zip(nat.n_nationkey, nat.n_name))
    maps_ref = ray.put((nk, nname))
    nregion = dict(zip(nat.n_name,
                       nat.n_regionkey.map(
                           dict(zip(reg.r_regionkey, reg.r_name)))))

    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        nk, nname = ray.get(maps_ref)
        y = _cents(pc.multiply(batch["l_extendedprice"],
                               pc.subtract(pa.scalar(1.0),
                                           batch["l_discount"]))) \
            .to_numpy(zero_copy_only=False)
        nations = pd.Series(batch["l_suppkey"]
                            .to_numpy(zero_copy_only=False)) \
            .map(nk).map(nname)
        df = pd.DataFrame({"nation": nations.to_numpy(),
                           "rev": y})
        return _from_pandas(df.groupby("nation", as_index=False).sum())

    g = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby("nation")
         .aggregate(_Sum("rev", alias_name="rev"))
         .to_pandas())
    if g.empty:
        return empty
    g["region"] = g["nation"].map(nregion)
    rows = []
    for region, sub in g.groupby("region"):
        revs = [int(v) for v in sub["rev"]]
        tot = sum(revs)
        if tot == 0:
            continue
        sq = sum(v * v for v in revs)           # exact big ints
        rows.append((region, len(revs), tot,
                     float(sq) / (float(tot) * float(tot))))
    return pd.DataFrame(rows, columns=["region", "n_nations",
                                       "revenue_x100", "hhi"]) \
        .sort_values("region").reset_index(drop=True)


HHI_SQL = """
WITH g AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT)) AS rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2)
SELECT region, CAST(COUNT(*) AS BIGINT) AS n_nations,
       CAST(SUM(rev) AS BIGINT) AS revenue_x100,
       CAST(SUM(rev * rev) AS DOUBLE)
           / (CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)) AS hhi
FROM g GROUP BY region HAVING SUM(rev) <> 0 ORDER BY region
"""


# ---------------------------------------------------------------------------
# Entity clusters over the fuzzy name pairs (blocking -> verify -> resolve)
# ---------------------------------------------------------------------------

def part_name_entity_clusters(sf_dir: str):
    """End-to-end entity resolution: the fuzzy-join pairs (edit distance
    <= 2) resolved into connected components, canonical = lexicographic
    min name — blocking, verification, and cluster resolution composed
    into the full ER pipeline. The pair set is vocabulary-bounded
    (names, not rows), so label propagation runs driver-side; with an
    unbounded key domain it would route through the dedup tier's
    distributed propagation like ``copurchase_components``.
    Output: (name, canonical) for every name in some cluster."""
    empty = pd.DataFrame({"name": pd.Series(dtype="object"),
                          "canonical": pd.Series(dtype="object")})
    pairs = part_name_fuzzy_pairs(sf_dir)
    if pairs.empty:
        return empty
    label: dict[str, str] = {}
    for n in pd.unique(pairs[["name_a", "name_b"]].to_numpy().ravel()):
        label[n] = n
    edges = list(zip(pairs.name_a, pairs.name_b))
    for _ in range(64):
        changed = False
        for a, b in edges:
            m = min(label[a], label[b])
            if label[a] != m:
                label[a] = m
                changed = True
            if label[b] != m:
                label[b] = m
                changed = True
        if not changed:
            break
    return pd.DataFrame(sorted(label.items()),
                        columns=["name", "canonical"])


ENTITY_CLUSTERS_SQL = f"""
WITH RECURSIVE d AS (SELECT p_name AS name FROM part GROUP BY 1),
pairs AS (
  SELECT a.name AS na, b.name AS nb
  FROM d a JOIN d b ON a.name < b.name
  WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}),
edges AS (SELECT na AS s, nb AS t FROM pairs
          UNION ALL SELECT nb, na FROM pairs),
cc(node, label) AS (
  SELECT s, s FROM edges
  UNION
  SELECT e.t, cc.label FROM cc JOIN edges e ON e.s = cc.node
  WHERE cc.label < e.t
)
SELECT node AS name, min(label) AS canonical FROM cc GROUP BY node
ORDER BY name
"""


# ---------------------------------------------------------------------------
# Event debouncing (LAG-window suppression of rapid repeats)
# ---------------------------------------------------------------------------

DEBOUNCE_MS = 5_000


def events_debounced(sf_dir: str):
    """Suppress rapid repeats: an event is kept iff no event of the same
    (user, type) occurred within the previous 5 s — the LAG-window
    debounce that de-noises interaction logs before sessionization.
    One user-keyed coarse exchange; per-partition pandas computes the
    per-(user, type) ordered diffs vectorized. Ties ((ts, event_id)
    order) match the SQL window's tiebreak.
    Output: kept (event_id, user_id, event_type)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type",
                                  "ts"])

    def debounce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"],
                          ignore_index=True)
        ts_ms = g["ts"].to_numpy().astype("datetime64[ms]").astype(np.int64)
        same = (g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]) \
            & (g["event_type"].to_numpy()[1:]
               == g["event_type"].to_numpy()[:-1])
        close = (ts_ms[1:] - ts_ms[:-1]) <= DEBOUNCE_MS
        drop = np.concatenate([[False], same & close])
        out = g.loc[~drop, ["event_id", "user_id", "event_type"]]
        return out.reset_index(drop=True)

    return _coarse_partition_map(ds, "user_id", debounce)


DEBOUNCE_SQL = f"""
WITH m AS (
  SELECT event_id, user_id, event_type, ts,
         LAG(ts) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS prev
  FROM events)
SELECT event_id, user_id, event_type FROM m
WHERE prev IS NULL
   OR date_diff('millisecond', prev, ts) > {DEBOUNCE_MS}
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Decile binning (quantile-bound feature bucketing, all-integer)
# ---------------------------------------------------------------------------

N_DECILES = 10


def events_value_deciles(sf_dir: str):
    """Assign every event its global value DECILE (1..10) — the
    quantile-binning rewrite feature pipelines use for monotone
    bucketing. Bucket = 1 + (# decile bounds strictly below the value),
    with bounds = quantile_disc(k/10) computed exactly from the
    compacted value histogram (DuckDB's ceil(q*n)-1 index rule) and
    broadcast; the assignment is one vectorized searchsorted per batch.
    All-integer logic — no float boundary risk at the bucket edges.
    Output: (event_id, v_x100, decile)."""
    empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                          "v_x100": pd.Series(dtype="int64"),
                          "decile": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty
    import ray

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        df = pd.DataFrame({
            "v_x100": _cents(batch["value"]).to_numpy(zero_copy_only=False),
            "cnt": np.ones(len(batch), dtype=np.int64)})
        return _from_pandas(df.groupby("v_x100", as_index=False).sum())

    def hist_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v_x100", as_index=False)["cnt"].sum()

    hist = _coarse_partition_map(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "v_x100", hist_sum).to_pandas().sort_values("v_x100")
    if hist.empty:
        return empty
    vals = hist["v_x100"].to_numpy(dtype=np.int64)
    cum = hist["cnt"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1])
    bounds = []
    for k in range(1, N_DECILES):
        idx = int(np.ceil(k / N_DECILES * n)) - 1   # quantile_disc rule
        bounds.append(int(vals[np.searchsorted(cum, idx, side="right")]))
    b_ref = ray.put(np.asarray(bounds, dtype=np.int64))

    def assign(batch: pa.Table) -> pa.Table:
        b = ray.get(b_ref)
        batch = batch.drop_null()
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        # decile = 1 + (# bounds strictly below v)
        dec = 1 + np.searchsorted(b, v, side="left")
        return pa.Table.from_pydict({
            "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
            "v_x100": v, "decile": dec.astype(np.int64)})

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def _deciles_sql() -> str:
    bounds = ", ".join(
        f"quantile_disc(v, {k}/10.0) AS b{k}" for k in range(1, N_DECILES))
    terms = " + ".join(
        f"CASE WHEN c.v > b.b{k} THEN 1 ELSE 0 END"
        for k in range(1, N_DECILES))
    return f"""
WITH c AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL),
b AS (SELECT {bounds} FROM c)
SELECT c.event_id, c.v AS v_x100,
       CAST(1 + {terms} AS BIGINT) AS decile
FROM c, b
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Z-score normalization (feature scaling REWRITE, bit-exact floats)
# ---------------------------------------------------------------------------

def events_value_zscore(sf_dir: str):
    """Per-type z-score of every event's value — the feature-scaling
    rewrite a training pipeline applies before modeling. Exactness
    discipline for a float output: both engines evaluate the IDENTICAL
    expression z = (n*v - sx) / sqrt(n * (n*sxx - sx^2)) from exact
    integer moments (algebraically (v - mean)/stddev_pop; sqrt is
    IEEE-correctly-rounded, so same ints -> same double). One moment
    pass (pre-reduced partials), one broadcast of the 5-row moment
    table, one vectorized rewrite pass.
    Output: (event_id, event_type, v_x100, zscore)."""
    empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                          "event_type": pd.Series(dtype="object"),
                          "v_x100": pd.Series(dtype="int64"),
                          "zscore": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "events"):
        return empty
    import ray

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def moments(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            "n": np.ones(len(batch), dtype=np.int64),
            "sx": v, "sxx": v * v})
        return _from_pandas(df.groupby("event_type", as_index=False).sum())

    mom = (ds.map_batches(moments, batch_format="pyarrow", batch_size=None)
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sx", alias_name="sx"),
                      Sum("sxx", alias_name="sxx"))
           .to_pandas())
    # per-type (n, sx, denom = sqrt(n*(n*sxx - sx^2))) in Python ints
    # then one float sqrt — identical op order to the oracle SQL
    table = {}
    for r in mom.itertuples(index=False):
        n, sx, sxx = int(r.n), int(r.sx), int(r.sxx)
        var_num = n * (n * sxx - sx * sx)
        if n == 0 or var_num == 0:
            continue
        table[r.event_type] = (n, sx, float(np.sqrt(float(var_num))))
    mom_ref = ray.put(table)

    def rewrite(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        t = ray.get(mom_ref)
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        ets = pd.Series(batch["event_type"].to_numpy(zero_copy_only=False))
        # vectorized per-type lookups (a python loop here is the hot
        # path at full row count)
        n = ets.map({k: m[0] for k, m in t.items()}) \
            .fillna(0).to_numpy(dtype=np.int64)
        sx = ets.map({k: m[1] for k, m in t.items()}) \
            .fillna(0).to_numpy(dtype=np.int64)
        den = ets.map({k: m[2] for k, m in t.items()}).to_numpy(
            dtype=np.float64)
        keep = n > 0
        z = (n[keep] * v[keep] - sx[keep]).astype(np.float64) / den[keep]
        return pa.Table.from_pydict({
            "event_id": batch["event_id"].to_numpy(
                zero_copy_only=False)[keep],
            "event_type": ets.to_numpy()[keep], "v_x100": v[keep],
            "zscore": z})

    return ds.map_batches(rewrite, batch_format="pyarrow",
                          batch_size=None)


ZSCORE_SQL = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL),
m AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(v AS HUGEINT)) AS sx,
         sum(CAST(v AS HUGEINT) * v) AS sxx
  FROM c GROUP BY event_type)
SELECT c.event_id, c.event_type, c.v AS v_x100,
       CAST(m.n * c.v - m.sx AS DOUBLE)
         / sqrt(CAST(m.n * (m.n * m.sxx - m.sx * m.sx) AS DOUBLE))
           AS zscore
FROM c JOIN m ON c.event_type = m.event_type
WHERE m.n > 0 AND (m.n * m.sxx - m.sx * m.sx) <> 0
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Pearson correlation per group (two-metric moments)
# ---------------------------------------------------------------------------

def nation_price_qty_corr(sf_dir: str):
    """Per-supplier-nation Pearson correlation between line quantity
    and revenue cents — the two-metric extension of the OLS trend:
    partials (n, sx, sy, sxy, sxx, syy) are exact int64 per batch, the
    final r = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))
    evaluates once from Python ints with IEEE sqrt on both engines.
    Output: (nation, n_lines, corr_r)."""
    empty = pd.DataFrame({"nation": pd.Series(dtype="object"),
                          "n_lines": pd.Series(dtype="int64"),
                          "corr_r": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    import ray

    sup = pd.read_parquet(_pq(sf_dir, "supplier"),
                          columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(_pq(sf_dir, "nation"),
                          columns=["n_nationkey", "n_name"])
    nk = dict(zip(sup.s_suppkey, sup.s_nationkey))
    nname = dict(zip(nat.n_nationkey, nat.n_name))
    maps_ref = ray.put((nk, nname))

    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        nk, nname = ray.get(maps_ref)
        x = _cents(batch["l_quantity"], 1.0).to_numpy(zero_copy_only=False)
        # revenue in whole DOLLARS: r is scale-invariant and dollar
        # units keep sum(y^2) inside int64 out to ~sf100 (cents
        # overflow at sf0.1: sum(y_cents^2) = 2e19 > 2^63)
        y = _cents(pc.multiply(batch["l_extendedprice"],
                               pc.subtract(pa.scalar(1.0),
                                           batch["l_discount"])), 1.0) \
            .to_numpy(zero_copy_only=False)
        nations = pd.Series(batch["l_suppkey"]
                            .to_numpy(zero_copy_only=False)) \
            .map(nk).map(nname)
        df = pd.DataFrame({"nation": nations.to_numpy(),
                           "n_lines": np.ones(len(batch), dtype=np.int64),
                           "sx": x, "sy": y, "sxy": x * y,
                           "sxx": x * x, "syy": y * y})
        return _from_pandas(df.groupby("nation", as_index=False).sum())

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
             .groupby("nation")
             .aggregate(*[Sum(c, alias_name=c) for c in
                          ("n_lines", "sx", "sy", "sxy", "sxx", "syy")])
             .to_pandas())
    rows = []
    for r in parts.itertuples(index=False):
        n, sx, sy = int(r.n_lines), int(r.sx), int(r.sy)
        sxy, sxx, syy = int(r.sxy), int(r.sxx), int(r.syy)
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        if n < 2 or dx == 0 or dy == 0:
            continue
        rows.append((r.nation, n,
                     float(n * sxy - sx * sy)
                     / (float(np.sqrt(float(dx)))
                        * float(np.sqrt(float(dy))))))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["nation", "n_lines", "corr_r"]) \
        .sort_values("nation").reset_index(drop=True)


CORR_SQL = """
WITH pts AS (
  SELECT n.n_name AS nation,
         CAST(round(l.l_quantity) AS BIGINT) AS x,
         CAST(round(l.l_extendedprice * (1 - l.l_discount))
              AS BIGINT) AS y
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey),
sums AS (
  SELECT nation, count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM pts GROUP BY nation)
SELECT nation, CAST(n AS BIGINT) AS n_lines,
       CAST(n*sxy - sx*sy AS DOUBLE)
         / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
            * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr_r
FROM sums
WHERE n >= 2 AND (n*sxx - sx*sx) <> 0 AND (n*syy - sy*sy) <> 0
ORDER BY nation
"""


# ---------------------------------------------------------------------------
# Trimmed mean per group (robust central tendency, exact)
# ---------------------------------------------------------------------------

TRIM_LO_Q = 0.1
TRIM_HI_Q = 0.9


def events_value_trimmed_mean(sf_dir: str):
    """Per event-type mean of the values between the discrete p10 and
    p90 (inclusive) — the outlier-robust mean a metrics pipeline
    reports instead of the raw average. Same compacted (type, cents)
    histogram exchange as the percentile operator; the trim bounds use
    DuckDB's quantile_disc index rule ceil(q*n)-1, the kept-range sum
    and count come exactly from the histogram, and the final mean is
    one int->double division. Output: (event_type, n_kept,
    trimmed_mean_x100)."""
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "n_kept": pd.Series(dtype="int64"),
                          "trimmed_mean_x100": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "events"):
        return empty

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.drop_null()
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            "v_x100": _cents(batch["value"]).to_numpy(zero_copy_only=False),
            "cnt": np.ones(len(batch), dtype=np.int64)})
        return _from_pandas(df.groupby(["event_type", "v_x100"],
                                       as_index=False).sum())

    def hist_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "v_x100"], as_index=False) \
            ["cnt"].sum()

    from .relational import _coarse_str_partition_map
    hist = _coarse_str_partition_map(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "event_type", hist_sum).to_pandas()
    if hist.empty:
        return empty

    rows = []
    for etype, g in hist.groupby("event_type"):
        g = g.sort_values("v_x100")
        vals = g["v_x100"].to_numpy(dtype=np.int64)
        cnts = g["cnt"].to_numpy(dtype=np.int64)
        cum = cnts.cumsum()
        n = int(cum[-1])
        lo_i = int(np.ceil(TRIM_LO_Q * n)) - 1     # quantile_disc index
        hi_i = int(np.ceil(TRIM_HI_Q * n)) - 1
        lo = vals[np.searchsorted(cum, lo_i, side="right")]
        hi = vals[np.searchsorted(cum, hi_i, side="right")]
        keep = (vals >= lo) & (vals <= hi)
        total = int((vals[keep] * cnts[keep]).sum())
        kept = int(cnts[keep].sum())
        rows.append((etype, kept, float(total) / float(kept)))
    return pd.DataFrame(rows, columns=["event_type", "n_kept",
                                       "trimmed_mean_x100"]) \
        .sort_values("event_type").reset_index(drop=True)


TRIMMED_MEAN_SQL = f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL),
b AS (
  SELECT event_type, quantile_disc(v, {TRIM_LO_Q}) AS lo,
         quantile_disc(v, {TRIM_HI_Q}) AS hi
  FROM c GROUP BY event_type)
SELECT c.event_type, COUNT(*) AS n_kept,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS trimmed_mean_x100
FROM c JOIN b ON c.event_type = b.event_type
WHERE v BETWEEN lo AND hi
GROUP BY c.event_type
ORDER BY c.event_type
"""


# ---------------------------------------------------------------------------
# Sequence-pattern matching (CEP / MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------

# one or more views, then a click, then a purchase — contiguous in the
# user's event sequence (type initials are distinct: c,e,p,s,v)
EVENT_PATTERN = "v+cp"


def events_pattern_matches(sf_dir: str):
    """Complex-event-processing-lite: count non-overlapping occurrences
    of a regex over each user's ordered event-type sequence
    (view+ click purchase, contiguous) — the sequence-mining shape
    MATCH_RECOGNIZE covers in engines that have it. One user-keyed
    coarse exchange; per partition the sequence string builds
    vectorized (type initials) and one compiled-regex pass counts
    matches per user. Leftmost non-overlapping semantics match RE2's
    regexp_extract_all. Output: (user_id, n_matches) for every user."""
    import re as _re

    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "event_type", "ts",
                                  "event_id"])
    rex = _re.compile(EVENT_PATTERN)

    def count(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ignore_index=True)
        initials = g["event_type"].str[0]
        out = []
        for uid, sub in initials.groupby(g["user_id"], sort=False):
            out.append((uid, len(rex.findall("".join(sub)))))
        return pd.DataFrame(out, columns=["user_id", "n_matches"]) \
            .astype("int64")

    return _coarse_partition_map(ds, "user_id", count)


PATTERN_MATCHES_SQL = f"""
WITH seqs AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
             AS seq
  FROM events GROUP BY user_id)
SELECT user_id,
       CAST(len(regexp_extract_all(seq, '{EVENT_PATTERN}')) AS BIGINT)
           AS n_matches
FROM seqs ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Grouped exact mode (aggregate -> argmax): modal event type per user
# ---------------------------------------------------------------------------

def events_user_modal_type(sf_dir: str):
    """Most frequent event type per user, ties broken by smallest type
    string — the aggregate-then-argmax plan shape (distinct from the
    row_number-top-1-by-VALUE of top_order_per_customer: here the argmax
    runs over a DERIVED count, so the job is two aggregation levels).
    Scale shape: per-batch pandas groupby pre-reduces (user, type) counts
    map-side, so the one coarse exchange moves <= |users|x|types| partial
    rows, never events. All-integer counts + lexicographic ties => the
    DuckDB window oracle is bit-exact.
    Output: (user_id, modal_type, n_modal)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["user_id", "event_type"], sort=False) \
              .size().rename("n").reset_index()
        return c

    partials = ds.map_batches(partial, batch_format="pandas",
                              batch_size=None)

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "event_type"], sort=False)["n"] \
             .sum().reset_index()
        c = c.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True],
                          ignore_index=True)
        top = c.drop_duplicates("user_id", keep="first")
        return pd.DataFrame({
            "user_id": top["user_id"].astype("int64"),
            "modal_type": top["event_type"].astype("object"),
            "n_modal": top["n"].astype("int64")})

    return _coarse_partition_map(partials, "user_id", argmax)


MODAL_TYPE_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n_modal
  FROM events GROUP BY user_id, event_type),
r AS (
  SELECT user_id, event_type AS modal_type, n_modal,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY n_modal DESC, event_type) AS rk
  FROM c)
SELECT user_id, modal_type, n_modal FROM r WHERE rk = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Inter-arrival gap statistics per user (exact integer microseconds)
# ---------------------------------------------------------------------------

def events_user_interarrival(sf_dir: str):
    """Per-user inter-arrival statistics over the ordered event stream:
    event count, total span (last-first, == the telescoping sum of
    gaps), and max/min gap, all in exact integer microseconds (-1
    max/min for single-event users, matching the SQL COALESCE over an
    all-NULL LAG window). One user-keyed coarse exchange; gaps are one
    vectorized diff per partition and the per-user max/min reduce is a
    pandas hash groupby over the within-user gap rows only.
    Output: (user_id, n_events, span_us, max_gap_us, min_gap_us)."""
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts"])

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ignore_index=True)
        uid = g["user_id"].to_numpy(np.int64)
        ts_us = g["ts"].to_numpy().astype("datetime64[us]") \
                       .astype(np.int64)
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "n_events": pd.Series(dtype="int64"),
                "span_us": pd.Series(dtype="int64"),
                "max_gap_us": pd.Series(dtype="int64"),
                "min_gap_us": pd.Series(dtype="int64")})
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        counts = np.diff(np.r_[starts, len(uid)])
        span = ts_us[starts + counts - 1] - ts_us[starts]
        out = pd.DataFrame({"user_id": uid[starts],
                            "n_events": counts.astype(np.int64),
                            "span_us": span})
        within = uid[1:] == uid[:-1]
        gaps = pd.DataFrame({"user_id": uid[1:][within],
                             "gap": ts_us[1:][within]
                             - ts_us[:-1][within]})
        mm = gaps.groupby("user_id")["gap"].agg(["max", "min"])
        out = out.merge(mm, on="user_id", how="left")
        out["max_gap_us"] = out.pop("max").fillna(-1).astype("int64")
        out["min_gap_us"] = out.pop("min").fillna(-1).astype("int64")
        return out

    return _coarse_partition_map(ds, "user_id", stats)


INTERARRIVAL_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS span_us,
       COALESCE(MAX(gap), -1) AS max_gap_us,
       COALESCE(MIN(gap), -1) AS min_gap_us
FROM g GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Exact selection over an UNBOUNDED value domain (multi-pass refinement)
# ---------------------------------------------------------------------------

SELECT_BUCKETS = 1 << 16


def orders_price_median_exact(sf_dir: str):
    """Exact interpolated median of o_totalprice (cents) — distributed
    SELECTION over a near-continuous column. events_value_percentiles
    exploits a bounded cent domain (~50k distinct values compact into
    one histogram); order prices don't compact (cardinality ~ rows), so
    this uses the classic multi-pass refinement instead, never assuming
    a bounded domain:

      pass 1: (n, min, max) aggregate;
      pass 2: 65536-bucket count histogram (per-batch np.bincount
              partials, pre-reduced map-side — the exchange moves
              <= 65536 rows per batch, never values);
      pass 3: exact (value, count) compaction of ONLY the straddling
              bucket range (expected n/65536 rows — at 100 TB with a
              pathological single-bucket skew the pass re-refines, but
              on any real distribution one refinement suffices).

    The bracket values interpolate with DuckDB's Interpolator op order
    (lo*(CRN-RN) + hi*(RN-FRN)), so the oracle is bit-exact.
    Output: (n_orders, median_x100)."""
    empty = pd.DataFrame({"n_orders": pd.Series(dtype="int64"),
                          "median_x100": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "orders"):
        return empty

    def cents_ds():
        ds = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_totalprice"])

        def to_cents(batch: pa.Table) -> pa.Table:
            c = _cents(batch["o_totalprice"])
            return pa.Table.from_arrays([c], names=["cents"])

        return ds.map_batches(to_cents, batch_format="pyarrow",
                              batch_size=None)

    # pass 1: n / min / max
    def minmax(batch: pa.Table) -> pa.Table:
        v = batch["cents"].to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.Table.from_pydict(
                {"n": [], "lo": [], "hi": []},
                schema=pa.schema([("n", pa.int64()), ("lo", pa.int64()),
                                  ("hi", pa.int64())]))
        return pa.Table.from_pydict({"n": [len(v)],
                                     "lo": [int(v.min())],
                                     "hi": [int(v.max())]})

    mm = cents_ds().map_batches(minmax, batch_format="pyarrow",
                                batch_size=None).to_pandas()
    if mm.empty or mm["n"].sum() == 0:
        return empty
    n = int(mm["n"].sum())
    lo_dom, hi_dom = int(mm["lo"].min()), int(mm["hi"].max())
    width = max(1, (hi_dom - lo_dom + SELECT_BUCKETS) // SELECT_BUCKETS)

    # pass 2: bucket-count histogram (bounded exchange)
    def bucket_counts(batch: pa.Table) -> pa.Table:
        v = batch["cents"].to_numpy(zero_copy_only=False)
        b = (v - lo_dom) // width
        cnt = np.bincount(b, minlength=1)
        nz = np.flatnonzero(cnt)
        return pa.Table.from_pydict({"bucket": nz.astype(np.int64),
                                     "cnt": cnt[nz].astype(np.int64)})

    hist = (cents_ds()
            .map_batches(bucket_counts, batch_format="pyarrow",
                         batch_size=None)
            .groupby("bucket").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas().sort_values("bucket", ignore_index=True))
    cum = hist["cnt"].to_numpy(np.int64).cumsum()
    buckets = hist["bucket"].to_numpy(np.int64)

    rn = 0.5 * (n - 1)
    frn, crn = int(np.floor(rn)), int(np.ceil(rn))
    b_lo = buckets[np.searchsorted(cum, frn, side="right")]
    b_hi = buckets[np.searchsorted(cum, crn, side="right")]
    below = int(cum[np.searchsorted(buckets, b_lo) - 1]) \
        if np.searchsorted(buckets, b_lo) > 0 else 0
    r_start = lo_dom + int(b_lo) * width
    r_end = lo_dom + (int(b_hi) + 1) * width      # exclusive

    # pass 3: exact value compaction of the straddling range only
    def in_range(batch: pa.Table) -> pa.Table:
        v = batch["cents"].to_numpy(zero_copy_only=False)
        v = v[(v >= r_start) & (v < r_end)]
        u, c = np.unique(v, return_counts=True)
        return pa.Table.from_pydict({"cents": u.astype(np.int64),
                                     "cnt": c.astype(np.int64)})

    fine = (cents_ds()
            .map_batches(in_range, batch_format="pyarrow",
                         batch_size=None)
            .groupby("cents").aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas().sort_values("cents", ignore_index=True))
    vals = fine["cents"].to_numpy(np.float64)
    fcum = below + fine["cnt"].to_numpy(np.int64).cumsum()
    lo_v = vals[np.searchsorted(fcum, frn, side="right")]
    hi_v = vals[np.searchsorted(fcum, crn, side="right")]
    med = lo_v if crn == frn else lo_v * (crn - rn) + hi_v * (rn - frn)
    return pd.DataFrame({"n_orders": [n], "median_x100": [float(med)]})


MEDIAN_EXACT_SQL = """
SELECT COUNT(*) AS n_orders,
       percentile_cont(0.5) WITHIN GROUP
         (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT))
           AS median_x100
FROM orders
"""


def orders_priority_median_exact(sf_dir: str):
    """GROUPED exact median over an unbounded domain — the 3-pass
    selection of orders_price_median_exact composed with grouping, with
    every exchange a TREE REDUCTION instead of a key shuffle: group
    cardinality (order priorities) is tiny and each group's bucket
    histogram has fixed size, so passes 2 and 3 run as
    `Dataset.aggregate(AggregateFn)` over a dense (group x bucket)
    count vector — per-block np.bincount partials merged pairwise
    (~2.6 MB per accumulator for 5 x 65536 int64) — and the driver only
    ever receives the ONE reduced histogram. (The previous
    groupby-shuffle form moved the same counts through two all-to-all
    exchanges and measured 21 s at sf0.1; this form is bounded by the
    three scans.) Output: (o_orderpriority, n_orders, median_x100)."""
    from ray.data.aggregate import AggregateFn
    empty = pd.DataFrame({"o_orderpriority": pd.Series(dtype="object"),
                          "n_orders": pd.Series(dtype="int64"),
                          "median_x100": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "orders"):
        return empty

    def cents_ds():
        ds = rd.read_parquet(_pq(sf_dir, "orders"),
                             columns=["o_orderpriority", "o_totalprice"])

        def prep(batch: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [batch["o_orderpriority"], _cents(batch["o_totalprice"])],
                names=["grp", "cents"])

        return ds.map_batches(prep, batch_format="pyarrow",
                              batch_size=None)

    # pass 1: per-group n / min / max (<= |groups| partial rows/block)
    mm_schema = pa.schema([("grp", pa.string()), ("n", pa.int64()),
                           ("lo", pa.int64()), ("hi", pa.int64())])

    def minmax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return mm_schema.empty_table()
        g = batch.to_pandas().groupby("grp")["cents"] \
            .agg(n="size", lo="min", hi="max")
        return pa.Table.from_pandas(g.reset_index(), schema=mm_schema,
                                    preserve_index=False)

    mm = cents_ds().map_batches(minmax, batch_format="pyarrow",
                                batch_size=None).to_pandas()
    if mm.empty:
        return empty
    dom = mm.groupby("grp").agg(n=("n", "sum"), lo=("lo", "min"),
                                hi=("hi", "max"))
    dom["width"] = np.maximum(
        1, (dom["hi"] - dom["lo"] + SELECT_BUCKETS) // SELECT_BUCKETS)
    grps = list(dom.index)
    ngrp = len(grps)
    gset = pa.array(grps, type=pa.string())
    glo_arr = dom["lo"].to_numpy(np.int64)
    gw_arr = dom["width"].to_numpy(np.int64)

    def codes(block: pa.Table) -> np.ndarray:
        idx = pc.index_in(block.column("grp"), value_set=gset)
        return np.asarray(idx.combine_chunks()
                          if isinstance(idx, pa.ChunkedArray) else idx,
                          dtype=np.int64)

    def vals_of(block: pa.Table) -> np.ndarray:
        return np.asarray(block.column("cents").combine_chunks(),
                          dtype=np.int64) \
            if isinstance(block.column("cents"), pa.ChunkedArray) \
            else np.asarray(block.column("cents"), dtype=np.int64)

    # pass 2: dense (group x bucket) histogram as a tree-reduced vector
    sb = SELECT_BUCKETS

    def h_acc(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        if block.num_rows == 0:
            return acc
        c = codes(block)
        v = vals_of(block)
        b = (v - glo_arr[c]) // gw_arr[c]
        return acc + np.bincount(c * sb + b, minlength=ngrp * sb)

    hist_fn = AggregateFn(
        init=lambda k: np.zeros(ngrp * sb, np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=h_acc, name="hist")
    hist = cents_ds().aggregate(hist_fn)["hist"].reshape(ngrp, sb)

    # straddling range per group (driver: the reduced matrix is tiny)
    ranges = np.empty((ngrp, 2), np.int64)   # [start, end) in cents
    below_arr = np.empty(ngrp, np.int64)
    marks: list[tuple[float, int, int]] = []
    for gi in range(ngrp):
        cum = hist[gi].cumsum()
        n = int(dom["n"].iloc[gi])
        rn = 0.5 * (n - 1)
        frn, crn = int(np.floor(rn)), int(np.ceil(rn))
        b_lo = int(np.searchsorted(cum, frn, side="right"))
        b_hi = int(np.searchsorted(cum, crn, side="right"))
        below_arr[gi] = int(cum[b_lo - 1]) if b_lo > 0 else 0
        ranges[gi, 0] = glo_arr[gi] + b_lo * gw_arr[gi]
        ranges[gi, 1] = glo_arr[gi] + (b_hi + 1) * gw_arr[gi]
        marks.append((rn, frn, crn))
    rs = ranges[:, 0]
    re_ = ranges[:, 1]

    # pass 3: exact (group, value) compaction of straddling ranges only
    # (expected n/65536 values per group -> a tiny dict accumulator)
    def f_acc(acc: dict, block: pa.Table) -> dict:
        if block.num_rows == 0:
            return acc
        c = codes(block)
        v = vals_of(block)
        keep = (v >= rs[c]) & (v < re_[c])
        if not keep.any():
            return acc
        ck, vk = c[keep], v[keep]
        for gi in range(ngrp):
            m = ck == gi
            if not m.any():
                continue
            u, cnt = np.unique(vk[m], return_counts=True)
            for val, nn in zip(u.tolist(), cnt.tolist()):
                key = (gi, val)
                acc[key] = acc.get(key, 0) + nn
        return acc

    def f_merge(a: dict, b: dict) -> dict:
        for k, nn in b.items():
            a[k] = a.get(k, 0) + nn
        return a

    fine_fn = AggregateFn(init=lambda k: {}, merge=f_merge,
                          accumulate_block=f_acc, name="fine")
    fdict = cents_ds().aggregate(fine_fn)["fine"]

    rows = []
    for gi, grp in enumerate(grps):
        items = sorted((val, nn) for (g2, val), nn in fdict.items()
                       if g2 == gi)
        vals = np.array([v for v, _ in items], np.float64)
        cum = below_arr[gi] + np.array([nn for _, nn in items],
                                       np.int64).cumsum()
        rn, frn, crn = marks[gi]
        lo_v = vals[np.searchsorted(cum, frn, side="right")]
        hi_v = vals[np.searchsorted(cum, crn, side="right")]
        med = lo_v if crn == frn else lo_v * (crn - rn) + hi_v * (rn - frn)
        rows.append((grp, int(dom["n"].iloc[gi]), float(med)))
    return pd.DataFrame(rows, columns=["o_orderpriority", "n_orders",
                                       "median_x100"]) \
        .sort_values("o_orderpriority").reset_index(drop=True)


PRIORITY_MEDIAN_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       percentile_cont(0.5) WITHIN GROUP
         (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT))
           AS median_x100
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Population covariance matrix over the lineitem measure columns
# ---------------------------------------------------------------------------

# (name, source column, integer scale) — price in whole DOLLARS for the
# same int64-headroom reason as the corr query (dollar^2 sums stay under
# 2^63 out to ~sf100; cent^2 sums overflow at sf0.1 already)
_COV_MEASURES = (("qty", "l_quantity", 1.0),
                 ("price_usd", "l_extendedprice", 1.0),
                 ("disc_x100", "l_discount", 100.0),
                 ("tax_x100", "l_tax", 100.0))


def lineitem_cov_matrix(sf_dir: str):
    """Full population covariance matrix (10 unordered pairs incl.
    diagonals = variances) over the four lineitem measures — the
    feature-correlation pass a training pipeline runs before model
    fitting. ONE scan computes all first and second moments as exact
    int64 partials per batch (k + k*(k+1)/2 sums); the k x k matrix
    assembles driver-side from Python ints, so cov_pop =
    (n*sxy - sx*sy) / n^2 is a single IEEE division of exactly-computed
    operands on both engines (bit-exact vs the SQL formula). Never
    shuffles rows — the exchange moves one 15-number partial per block."""
    names = [m[0] for m in _COV_MEASURES]
    pair_idx = [(i, j) for i in range(len(names))
                for j in range(i, len(names))]
    empty = pd.DataFrame({"m_a": pd.Series(dtype="object"),
                          "m_b": pd.Series(dtype="object"),
                          "n_lines": pd.Series(dtype="int64"),
                          "cov_pop": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=[m[1] for m in _COV_MEASURES])

    def partial(batch: pa.Table) -> pa.Table:
        xs = [_cents(batch[col], sc).to_numpy(zero_copy_only=False)
              for _, col, sc in _COV_MEASURES]
        out = {"n": [np.int64(len(batch))]}
        for k, x in enumerate(xs):
            out[f"s{k}"] = [x.sum()]
        for i, j in pair_idx:
            out[f"s{i}{j}"] = [(xs[i] * xs[j]).sum()]
        return pa.Table.from_pydict(out)

    cols = (["n"] + [f"s{k}" for k in range(len(names))]
            + [f"s{i}{j}" for i, j in pair_idx])
    sums = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .aggregate(*[Sum(c, alias_name=c) for c in cols]))
    n = int(sums["n"])
    if n == 0:
        return empty
    s = [int(sums[f"s{k}"]) for k in range(len(names))]
    rows = []
    for i, j in pair_idx:
        num = n * int(sums[f"s{i}{j}"]) - s[i] * s[j]
        rows.append((names[i], names[j], n, float(num) / float(n * n)))
    return pd.DataFrame(rows, columns=["m_a", "m_b", "n_lines", "cov_pop"]) \
        .sort_values(["m_a", "m_b"]).reset_index(drop=True)


def _cov_matrix_sql() -> str:
    names = [m[0] for m in _COV_MEASURES]
    sel = ", ".join(
        [f"sum(CAST(x{k} AS HUGEINT)) AS s{k}" for k in range(len(names))]
        + [f"sum(CAST(x{i} AS HUGEINT) * x{j}) AS s{i}{j}"
           for i in range(len(names)) for j in range(i, len(names))])
    arms = "\nUNION ALL\n".join(
        f"SELECT '{names[i]}' AS m_a, '{names[j]}' AS m_b, "
        f"CAST(n AS BIGINT) AS n_lines, "
        f"CAST(n*s{i}{j} - s{i}*s{j} AS DOUBLE) / CAST(n*n AS DOUBLE) "
        f"AS cov_pop FROM s"
        for i in range(len(names)) for j in range(i, len(names)))
    return f"""
WITH pts AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS x0,
         CAST(round(l_extendedprice) AS BIGINT) AS x1,
         CAST(round(l_discount * 100.0) AS BIGINT) AS x2,
         CAST(round(l_tax * 100.0) AS BIGINT) AS x3
  FROM lineitem),
s AS (SELECT count(*) AS n, {sel} FROM pts)
SELECT * FROM ({arms}) WHERE n_lines > 0 ORDER BY m_a, m_b
"""


# ---------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quartile bins)
# ---------------------------------------------------------------------------

RFM_Q = 4


def customer_rfm_segments(sf_dir: str):
    """Classic RFM marketing segmentation: per customer (recency = days
    from last order to the corpus max date, frequency = order count,
    monetary = total cents), each dimension quartile-binned by
    value-threshold quantiles, reported as counts per (r,f,m) bin
    triple (<= 64 rows at any scale). Distributed shape: one grouped
    pass builds the per-customer table (never leaves the cluster);
    per-dimension COMPACTED VALUE HISTOGRAMS (distinct values only)
    exchange to the driver to derive the quantile_disc bounds (DuckDB's
    ceil(q*n)-1 index rule, all-integer); a second pass assigns bins by
    searchsorted and pre-aggregates triple counts per block. At 100 TB
    the monetary histogram can grow with customer count — the
    multi-pass selection of ``orders_price_median_exact`` is the
    drop-in replacement for deriving those bounds."""
    empty = pd.DataFrame({
        **{c: pd.Series(dtype="int64") for c in
           ("r_bin", "f_bin", "m_bin", "n_customers")}})
    if _table_empty(sf_dir, "orders"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({
            "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
            "last_day": d, "f": np.ones(len(batch), dtype=np.int64),
            "m": _cents(batch["o_totalprice"])
            .to_numpy(zero_copy_only=False)})
        g = df.groupby("o_custkey", as_index=False) \
            .agg(last_day=("last_day", "max"), f=("f", "sum"),
                 m=("m", "sum"))
        return _from_pandas(g)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_custkey", as_index=False) \
            .agg(last_day=("last_day", "max"), f=("f", "sum"),
                 m=("m", "sum"))

    per_cust = _coarse_partition_map(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "o_custkey", merge).materialize()
    max_day = int(per_cust.max("last_day"))

    def add_r(batch: pa.Table) -> pa.Table:
        r = max_day - batch["last_day"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array(r.astype(np.int64)), batch["f"], batch["m"]],
            names=["r", "f", "m"])

    rfm = per_cust.map_batches(add_r, batch_format="pyarrow",
                               batch_size=None).materialize()

    def bounds_for(col: str) -> np.ndarray:
        def hist(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "v": batch[col].to_numpy(zero_copy_only=False),
                "cnt": np.ones(batch.num_rows, dtype=np.int64)})
            return _from_pandas(df.groupby("v", as_index=False).sum())

        h = (rfm.map_batches(hist, batch_format="pyarrow", batch_size=None)
             .groupby("v").aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas().sort_values("v"))
        vals = h["v"].to_numpy(np.int64)
        cum = h["cnt"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        return np.array(
            [int(vals[np.searchsorted(
                cum, int(np.ceil(k / RFM_Q * n)) - 1, side="right")])
             for k in range(1, RFM_Q)], dtype=np.int64)

    rb, fb, mb = bounds_for("r"), bounds_for("f"), bounds_for("m")

    def assign(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "r_bin": 1 + np.searchsorted(
                rb, batch["r"].to_numpy(zero_copy_only=False), side="left"),
            "f_bin": 1 + np.searchsorted(
                fb, batch["f"].to_numpy(zero_copy_only=False), side="left"),
            "m_bin": 1 + np.searchsorted(
                mb, batch["m"].to_numpy(zero_copy_only=False), side="left"),
            "n_customers": np.ones(batch.num_rows, dtype=np.int64)})
        g = df.groupby(["r_bin", "f_bin", "m_bin"], as_index=False).sum()
        return _from_pandas(g.astype("int64"))

    return (rfm.map_batches(assign, batch_format="pyarrow", batch_size=None)
            .groupby(["r_bin", "f_bin", "m_bin"])
            .aggregate(Sum("n_customers", alias_name="n_customers"))
            .sort(["r_bin", "f_bin", "m_bin"]))


# bin = 1 + (# quantile bounds strictly below the value); searchsorted
# side="left" counts bounds < v, the SQL mirrors with three > tests
RFM_SQL = f"""
WITH per AS (
  SELECT o_custkey,
         date_diff('day', MAX(o_orderdate),
                   (SELECT MAX(o_orderdate) FROM orders)) AS r,
         COUNT(*) AS f,
         SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS m
  FROM orders GROUP BY o_custkey),
b AS (SELECT quantile_disc(r, [{", ".join(str(k / RFM_Q) for k in range(1, RFM_Q))}]) AS rb,
             quantile_disc(f, [{", ".join(str(k / RFM_Q) for k in range(1, RFM_Q))}]) AS fb,
             quantile_disc(m, [{", ".join(str(k / RFM_Q) for k in range(1, RFM_Q))}]) AS mb
      FROM per)
SELECT CAST(1 + (per.r > b.rb[1])::INT + (per.r > b.rb[2])::INT
              + (per.r > b.rb[3])::INT AS BIGINT) AS r_bin,
       CAST(1 + (per.f > b.fb[1])::INT + (per.f > b.fb[2])::INT
              + (per.f > b.fb[3])::INT AS BIGINT) AS f_bin,
       CAST(1 + (per.m > b.mb[1])::INT + (per.m > b.mb[2])::INT
              + (per.m > b.mb[3])::INT AS BIGINT) AS m_bin,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM per, b
GROUP BY r_bin, f_bin, m_bin
ORDER BY r_bin, f_bin, m_bin
"""


# ---------------------------------------------------------------------------
# DAU / WAU sliding-window distinct users (stickiness)
# ---------------------------------------------------------------------------

WAU_WINDOW_DAYS = 7


def events_dau_wau(sf_dir: str):
    """Daily active users plus the 7-day sliding-window distinct count
    (WAU) and the DAU/WAU stickiness ratio. Sliding DISTINCT is not
    derivable from daily counts, so each deduped (day, user) pair is
    exploded to the WAU_WINDOW_DAYS window days it serves and deduped
    again per window day — the standard exact form (a mergeable HLL per
    day is the approximate alternative at extreme user counts). Both
    dedups are coarse day-keyed exchanges of already-deduplicated
    per-block pairs; no stage sees more than one day bucket's users."""
    empty = pd.DataFrame({
        "day": pd.Series(dtype="datetime64[us]"),
        "dau": pd.Series(dtype="int64"), "wau": pd.Series(dtype="int64"),
        "stickiness": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["ts", "user_id"])

    def pairs(batch: pa.Table) -> pa.Table:
        d = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame({
            "day": d,
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False)}) \
            .drop_duplicates()
        return _from_pandas(df)

    def dedup_count(g: pd.DataFrame) -> pd.DataFrame:
        du = g.drop_duplicates()
        c = du.groupby("day", as_index=False).size() \
            .rename(columns={"size": "dau"})
        return c.astype("int64")

    pair_ds = ds.map_batches(pairs, batch_format="pyarrow",
                             batch_size=None).materialize()
    dau = _coarse_partition_map(pair_ds, "day", dedup_count).to_pandas()
    days = set(int(d) for d in dau["day"]) if "day" in dau.columns else set()

    def explode(batch: pa.Table) -> pa.Table:
        d = batch["day"].to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        k = WAU_WINDOW_DAYS
        wday = (d[:, None] + np.arange(k)[None, :]).ravel()
        wu = np.repeat(u, k)
        keep = np.isin(wday, list(days))
        df = pd.DataFrame({"day": wday[keep], "user_id": wu[keep]}) \
            .drop_duplicates()
        return _from_pandas(df)

    def wau_count(g: pd.DataFrame) -> pd.DataFrame:
        du = g.drop_duplicates()
        c = du.groupby("day", as_index=False).size() \
            .rename(columns={"size": "wau"})
        return c.astype("int64")

    wau = _coarse_partition_map(
        pair_ds.map_batches(explode, batch_format="pyarrow",
                            batch_size=None),
        "day", wau_count).to_pandas()
    out = dau.merge(wau, on="day")
    out["stickiness"] = out["dau"].astype(float) / out["wau"].astype(float)
    out["day"] = (out.pop("day").astype(np.int64)
                  * np.int64(86_400_000_000)).astype("datetime64[us]")
    return out[["day", "dau", "wau", "stickiness"]] \
        .sort_values("day").reset_index(drop=True)


DAU_WAU_SQL = f"""
WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d,
                   user_id FROM events),
days AS (SELECT DISTINCT d FROM du),
dau AS (SELECT d, COUNT(*) AS dau FROM du GROUP BY d),
wau AS (SELECT dy.d, COUNT(DISTINCT du.user_id) AS wau
        FROM days dy JOIN du
          ON du.d BETWEEN dy.d - INTERVAL {WAU_WINDOW_DAYS - 1} DAY
                      AND dy.d
        GROUP BY dy.d)
SELECT CAST(dau.d AS TIMESTAMP) AS day,
       CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
       CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
FROM dau JOIN wau ON dau.d = wau.d
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Chi-square test of independence: event_type x ISO day-of-week
# ---------------------------------------------------------------------------

def events_type_dow_chisq(sf_dir: str):
    """Pearson chi-square statistic for independence of event_type and
    ISO day-of-week — the seasonality/independence screen an analytics
    tier runs before trusting per-type daily breakdowns. One grouped
    count exchange builds the (type, dow) contingency grid (<= |types|*7
    rows at any scale); the statistic assembles driver-side over the
    FULL cross grid (zero cells included, as the test requires) in exact
    Python ints: each cell contributes (N*O - R*C)^2 * 1e6 // (N*R*C),
    an integer floor division, so chi2_x1e6 is integer-exact on both
    engines. Output: (n_types, n_dows, n_events, dof, chi2_x1e6)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("n_types", "n_dows", "n_events", "dof",
                           "chi2_x1e6")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        # days since epoch; 1970-01-01 was a Thursday -> isodow 4
        day = ts.astype("datetime64[D]").astype(np.int64)
        dow = (day + 3) % 7 + 1
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
            "dow": dow})
        g = df.groupby(["event_type", "dow"], as_index=False).size() \
            .rename(columns={"size": "o"})
        return _from_pandas(g)

    grid = (rd.read_parquet(_pq(sf_dir, "events"),
                            columns=["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(["event_type", "dow"])
            .aggregate(Sum("o", alias_name="o"))
            .to_pandas())
    if grid.empty:
        return empty
    types = sorted(grid["event_type"].unique())
    dows = sorted(int(d) for d in grid["dow"].unique())
    obs = {(r.event_type, int(r.dow)): int(r.o)
           for r in grid.itertuples(index=False)}
    row_tot = {t: sum(obs.get((t, d), 0) for d in dows) for t in types}
    col_tot = {d: sum(obs.get((t, d), 0) for t in types) for d in dows}
    n = sum(row_tot.values())
    chi2 = 0
    for t in types:
        for d in dows:
            o = obs.get((t, d), 0)
            num = n * o - row_tot[t] * col_tot[d]
            chi2 += num * num * 1_000_000 // (n * row_tot[t] * col_tot[d])
    return pd.DataFrame({"n_types": [len(types)], "n_dows": [len(dows)],
                         "n_events": [n],
                         "dof": [(len(types) - 1) * (len(dows) - 1)],
                         "chi2_x1e6": [chi2]})


CHISQ_SQL = """
WITH c AS (
  SELECT event_type, isodow(ts) AS dow, COUNT(*) AS o
  FROM events GROUP BY event_type, dow),
grid AS (
  SELECT t.event_type, d.dow
  FROM (SELECT DISTINCT event_type FROM c) t
  CROSS JOIN (SELECT DISTINCT dow FROM c) d),
f AS (
  SELECT g.event_type, g.dow, COALESCE(c.o, 0) AS o
  FROM grid g LEFT JOIN c ON g.event_type = c.event_type
                         AND g.dow = c.dow),
m AS (
  SELECT event_type, dow, o,
         SUM(o) OVER (PARTITION BY event_type) AS rt,
         SUM(o) OVER (PARTITION BY dow) AS ct,
         SUM(o) OVER () AS n
  FROM f),
terms AS (
  SELECT n, rt, ct,
         CAST(n * o - rt * ct AS HUGEINT)
           * CAST(n * o - rt * ct AS HUGEINT) * 1000000
           // (CAST(n AS HUGEINT) * rt * ct) AS term
  FROM m)
SELECT CAST((SELECT COUNT(DISTINCT event_type) FROM f) AS BIGINT)
           AS n_types,
       CAST((SELECT COUNT(DISTINCT dow) FROM f) AS BIGINT) AS n_dows,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(((SELECT COUNT(DISTINCT event_type) FROM f) - 1)
            * ((SELECT COUNT(DISTINCT dow) FROM f) - 1) AS BIGINT) AS dof,
       CAST(SUM(term) AS BIGINT) AS chi2_x1e6
FROM terms
"""


# ---------------------------------------------------------------------------
# Autocorrelation of the hourly event-count series (lags 1..3)
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 3


def events_hourly_acf(sf_dir: str):
    """Autocorrelation of the DENSIFIED hourly event-count series (gap
    hours count 0) at lags 1..ACF_MAX_LAG — the periodicity probe behind
    seasonality detection. The distributed pass is one grouped count
    keyed by epoch-hour; the dense series (bounded by the time span, not
    the row count) is lagged driver-side with exact integer moments and
    ONE float expression per lag, mirroring the oracle's HUGEINT sums:
    r = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2)).
    Zero-variance lags are omitted on both engines.
    Output: (lag, n_pairs, r)."""
    empty = pd.DataFrame({"lag": pd.Series(dtype="int64"),
                          "n_pairs": pd.Series(dtype="int64"),
                          "r": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hr = ts.astype("datetime64[h]").astype(np.int64)
        g = pd.DataFrame({"hr": hr}).groupby("hr", as_index=False).size() \
            .rename(columns={"size": "c"})
        return _from_pandas(g)

    hist = (rd.read_parquet(_pq(sf_dir, "events"), columns=["ts"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("hr").aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    if hist.empty:
        return empty
    hr = hist["hr"].to_numpy(np.int64)
    h0, h1 = int(hr.min()), int(hr.max())
    dense = np.zeros(h1 - h0 + 1, dtype=np.int64)
    dense[hr - h0] = hist["c"].to_numpy(np.int64)
    rows = []
    for lag in range(1, ACF_MAX_LAG + 1):
        if len(dense) <= lag:
            break
        x, y = dense[:-lag], dense[lag:]
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        if dx <= 0 or dy <= 0:
            continue
        r = float(n * sxy - sx * sy) / (np.sqrt(float(dx))
                                        * np.sqrt(float(dy)))
        rows.append((lag, n, r))
    return pd.DataFrame(rows, columns=["lag", "n_pairs", "r"]) \
        if rows else empty


def _acf_sql() -> str:
    lag_selects = " UNION ALL ".join(
        f"SELECT {k} AS lag" for k in range(1, ACF_MAX_LAG + 1))
    return f"""
WITH h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr,
         COUNT(*) AS c
  FROM events GROUP BY hr),
b AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM h),
dense AS (
  SELECT g.hr, COALESCE(h.c, 0) AS c
  FROM (SELECT unnest(generate_series(h0, h1)) AS hr FROM b) g
  LEFT JOIN h ON h.hr = g.hr),
lags AS ({lag_selects}),
pairs AS (
  SELECT l.lag, d1.c AS x, d2.c AS y
  FROM lags l
  CROSS JOIN dense d1
  JOIN dense d2 ON d2.hr = d1.hr + l.lag),
mo AS (
  SELECT lag, COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs GROUP BY lag)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
            * SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS r
FROM mo
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY lag
"""


# ---------------------------------------------------------------------------
# EWMA smoothing of the hourly count series
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.25        # exact binary fraction: 0.25*x + 0.75*s is the
#                          same IEEE sequence on both engines


def events_hourly_ewma(sf_dir: str):
    """Exponentially-weighted moving average over the densified hourly
    event-count series (s_0 = x_0; s_t = alpha*x_t + (1-alpha)*s_{t-1})
    — the smoothing/forecast-baseline recurrence no window function
    expresses. Distributed pass = the same grouped epoch-hour count as
    the ACF; the sequential fold runs over the time-span-bounded dense
    series with an EXACT-binary alpha, so every step is the identical
    IEEE sequence the oracle's RECURSIVE CTE performs — bit-exact
    without integerization. Output: (hr, c, ewma)."""
    empty = pd.DataFrame({"hr": pd.Series(dtype="int64"),
                          "c": pd.Series(dtype="int64"),
                          "ewma": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hr = ts.astype("datetime64[h]").astype(np.int64)
        g = pd.DataFrame({"hr": hr}).groupby("hr", as_index=False).size() \
            .rename(columns={"size": "c"})
        return _from_pandas(g)

    hist = (rd.read_parquet(_pq(sf_dir, "events"), columns=["ts"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("hr").aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    if hist.empty:
        return empty
    hr = hist["hr"].to_numpy(np.int64)
    h0, h1 = int(hr.min()), int(hr.max())
    dense = np.zeros(h1 - h0 + 1, dtype=np.int64)
    dense[hr - h0] = hist["c"].to_numpy(np.int64)
    ewma = np.empty(len(dense))
    s = float(dense[0])
    ewma[0] = s
    for i in range(1, len(dense)):
        s = EWMA_ALPHA * float(dense[i]) + (1.0 - EWMA_ALPHA) * s
        ewma[i] = s
    return pd.DataFrame({"hr": np.arange(h0, h1 + 1, dtype=np.int64),
                         "c": dense, "ewma": ewma})


EWMA_SQL = f"""
WITH RECURSIVE h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr,
         COUNT(*) AS c
  FROM events GROUP BY hr),
b AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM h),
dense AS (
  SELECT g.hr, COALESCE(h.c, 0) AS c
  FROM (SELECT unnest(generate_series(h0, h1)) AS hr FROM b) g
  LEFT JOIN h ON h.hr = g.hr),
rec(hr, c, ewma) AS (
  SELECT hr, c, CAST(c AS DOUBLE) FROM dense
  WHERE hr = (SELECT h0 FROM b)
  UNION ALL
  SELECT d.hr, d.c,
         {EWMA_ALPHA!r} * CAST(d.c AS DOUBLE)
             + {1.0 - EWMA_ALPHA!r} * rec.ewma
  FROM rec JOIN dense d ON d.hr = rec.hr + 1)
SELECT CAST(hr AS BIGINT) AS hr, CAST(c AS BIGINT) AS c, ewma
FROM rec ORDER BY hr
"""


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing of the hourly count series
# ---------------------------------------------------------------------------

HOLT_ALPHA = 0.5      # exact binary fractions: every recurrence step is
HOLT_BETA = 0.25      # the identical IEEE +,* sequence on both engines


def events_hourly_holt(sf_dir: str):
    """Holt's double-exponential (level + trend) smoothing over the
    densified hourly event-count series — the forecast-baseline
    recurrence one step past EWMA:

        l_0 = x_0;  b_0 = 0
        l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

    Distributed pass = the same grouped epoch-hour count as the EWMA;
    the sequential fold runs over the time-span-bounded dense series
    with EXACT-binary alpha/beta so every step is bit-identical to the
    oracle's RECURSIVE CTE (which re-derives l_t textually inside the
    b_t expression — recomputing the identical double). Output:
    (hr, c, level, trend)."""
    empty = pd.DataFrame({"hr": pd.Series(dtype="int64"),
                          "c": pd.Series(dtype="int64"),
                          "level": pd.Series(dtype="float64"),
                          "trend": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hr = ts.astype("datetime64[h]").astype(np.int64)
        g = pd.DataFrame({"hr": hr}).groupby("hr", as_index=False).size() \
            .rename(columns={"size": "c"})
        return _from_pandas(g)

    hist = (rd.read_parquet(_pq(sf_dir, "events"), columns=["ts"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("hr").aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    if hist.empty:
        return empty
    hr = hist["hr"].to_numpy(np.int64)
    h0, h1 = int(hr.min()), int(hr.max())
    dense = np.zeros(h1 - h0 + 1, dtype=np.int64)
    dense[hr - h0] = hist["c"].to_numpy(np.int64)
    level = np.empty(len(dense))
    trend = np.empty(len(dense))
    lv, tr = float(dense[0]), 0.0
    level[0], trend[0] = lv, tr
    a, b = HOLT_ALPHA, HOLT_BETA
    for i in range(1, len(dense)):
        nl = a * float(dense[i]) + (1.0 - a) * (lv + tr)
        tr = b * (nl - lv) + (1.0 - b) * tr
        lv = nl
        level[i], trend[i] = lv, tr
    return pd.DataFrame({"hr": np.arange(h0, h1 + 1, dtype=np.int64),
                         "c": dense, "level": level, "trend": trend})


_HOLT_L = (f"{HOLT_ALPHA!r} * CAST(d.c AS DOUBLE) "
           f"+ {1.0 - HOLT_ALPHA!r} * (rec.level + rec.trend)")

HOLT_SQL = f"""
WITH RECURSIVE h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr,
         COUNT(*) AS c
  FROM events GROUP BY hr),
b AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM h),
dense AS (
  SELECT g.hr, COALESCE(h.c, 0) AS c
  FROM (SELECT unnest(generate_series(h0, h1)) AS hr FROM b) g
  LEFT JOIN h ON h.hr = g.hr),
rec(hr, c, level, trend) AS (
  -- anchor trend MUST be CAST AS DOUBLE: a bare 0.0 types the column
  -- DECIMAL(1,1) and the union then rounds every recursive step
  SELECT hr, c, CAST(c AS DOUBLE), CAST(0.0 AS DOUBLE) FROM dense
  WHERE hr = (SELECT h0 FROM b)
  UNION ALL
  SELECT d.hr, d.c,
         {_HOLT_L},
         {HOLT_BETA!r} * (({_HOLT_L}) - rec.level)
             + {1.0 - HOLT_BETA!r} * rec.trend
  FROM rec JOIN dense d ON d.hr = rec.hr + 1)
SELECT CAST(hr AS BIGINT) AS hr, CAST(c AS BIGINT) AS c, level, trend
FROM rec ORDER BY hr
"""


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing (period 24)
# ---------------------------------------------------------------------------

HW_ALPHA = 0.5        # all exact binary fractions: every step is the
HW_BETA = 0.25        # identical IEEE sequence on both engines
HW_GAMMA = 0.25
HW_PERIOD = 24


def events_hourly_holtwinters(sf_dir: str):
    """Holt-Winters ADDITIVE seasonal smoothing (period 24 h) over the
    densified hourly count series — level + trend + seasonal:

        l_t = alpha*(x_t - s_{t-24}) + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
        s_t = gamma*(x_t - l_t) + (1-gamma)*s_{t-24}

    seeded l_0 = x_0, b_0 = 0, s_{<0} = 0. The oracle's RECURSIVE CTE
    cannot reach 24 steps back (the working table holds only the
    previous iteration), so each row CARRIES the trailing 24 seasonals
    as a LIST column — seas[1] is s_{t-24}, each step appends s_t and
    drops the head. Exact-binary alpha/beta/gamma keep every double
    bit-identical to the numpy fold. Output: (hr, c, level, trend,
    seasonal)."""
    empty = pd.DataFrame({"hr": pd.Series(dtype="int64"),
                          "c": pd.Series(dtype="int64"),
                          "level": pd.Series(dtype="float64"),
                          "trend": pd.Series(dtype="float64"),
                          "seasonal": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hr = ts.astype("datetime64[h]").astype(np.int64)
        g = pd.DataFrame({"hr": hr}).groupby("hr", as_index=False).size() \
            .rename(columns={"size": "c"})
        return _from_pandas(g)

    hist = (rd.read_parquet(_pq(sf_dir, "events"), columns=["ts"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("hr").aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    if hist.empty:
        return empty
    hr = hist["hr"].to_numpy(np.int64)
    h0, h1 = int(hr.min()), int(hr.max())
    dense = np.zeros(h1 - h0 + 1, dtype=np.int64)
    dense[hr - h0] = hist["c"].to_numpy(np.int64)
    n = len(dense)
    level = np.empty(n)
    trend = np.empty(n)
    seas = np.empty(n)
    a, b, g = HW_ALPHA, HW_BETA, HW_GAMMA
    lv = float(dense[0])
    tr = 0.0
    window = [0.0] * HW_PERIOD          # trailing 24 seasonals
    # t = 0 seeds the state; its seasonal still updates via the rule
    s0 = g * (float(dense[0]) - lv) + (1.0 - g) * window[0]
    window = window[1:] + [s0]
    level[0], trend[0], seas[0] = lv, tr, s0
    for i in range(1, n):
        x = float(dense[i])
        sp = window[0]                  # s_{t-24}
        nl = a * (x - sp) + (1.0 - a) * (lv + tr)
        tr = b * (nl - lv) + (1.0 - b) * tr
        lv = nl
        st = g * (x - lv) + (1.0 - g) * sp
        window = window[1:] + [st]
        level[i], trend[i], seas[i] = lv, tr, st
    return pd.DataFrame({"hr": np.arange(h0, h1 + 1, dtype=np.int64),
                         "c": dense, "level": level, "trend": trend,
                         "seasonal": seas})


_HW_L = (f"{HW_ALPHA!r} * (CAST(d.c AS DOUBLE) - rec.seas[1]) "
         f"+ {1.0 - HW_ALPHA!r} * (rec.level + rec.trend)")

HOLTWINTERS_SQL = f"""
WITH RECURSIVE h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr,
         COUNT(*) AS c
  FROM events GROUP BY hr),
b AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM h),
dense AS (
  SELECT g.hr, COALESCE(h.c, 0) AS c
  FROM (SELECT unnest(generate_series(h0, h1)) AS hr FROM b) g
  LEFT JOIN h ON h.hr = g.hr),
rec(hr, c, level, trend, seasonal, seas) AS (
  -- t=0 seeds l=x_0, b=0; its seasonal update is gamma*(x_0-l_0)=0,
  -- so the carried window is exactly 24 double zeros
  SELECT hr, c, CAST(c AS DOUBLE), CAST(0.0 AS DOUBLE),
         CAST(0.0 AS DOUBLE),
         list_transform(generate_series(1, {HW_PERIOD}),
                        x -> CAST(0.0 AS DOUBLE))
  FROM dense WHERE hr = (SELECT h0 FROM b)
  UNION ALL
  SELECT d.hr, d.c,
         {_HW_L},
         {HW_BETA!r} * (({_HW_L}) - rec.level)
             + {1.0 - HW_BETA!r} * rec.trend,
         {HW_GAMMA!r} * (CAST(d.c AS DOUBLE) - ({_HW_L}))
             + {1.0 - HW_GAMMA!r} * rec.seas[1],
         list_append(rec.seas[2:],
                     {HW_GAMMA!r} * (CAST(d.c AS DOUBLE) - ({_HW_L}))
                     + {1.0 - HW_GAMMA!r} * rec.seas[1])
  FROM rec JOIN dense d ON d.hr = rec.hr + 1)
SELECT CAST(hr AS BIGINT) AS hr, CAST(c AS BIGINT) AS c,
       level, trend, seasonal
FROM rec ORDER BY hr
"""


# ---------------------------------------------------------------------------
# Markov stationary distribution of the event-type chain
# ---------------------------------------------------------------------------

MARKOV_ITERS = 200


def events_markov_stationary(sf_dir: str):
    """Stationary distribution of the per-user event-type Markov chain:
    row-normalize the distributed transition counts
    (``events_type_transitions``) and power-iterate pi <- pi P from the
    uniform start for a FIXED {MARKOV_ITERS} steps — deterministic
    doubles at any parallelism (the matrix is |types| x |types|,
    driver-side; all distributed work is the transition-count
    exchange). Rows whose type never transitions out hold pi mass as an
    absorbing state. No DuckDB oracle (a linear fixpoint is not
    SQL-expressible); correctness rests on a numpy left-eigenvector
    differential test. Output: (event_type, pi)."""
    from .relational import events_type_transitions
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          "pi": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "events"):
        return empty
    tr = events_type_transitions(sf_dir)
    if not isinstance(tr, pd.DataFrame):
        tr = tr.to_pandas()
    if tr.empty:
        return empty
    types = sorted(set(tr["from_type"]) | set(tr["to_type"]))
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    P = np.zeros((k, k))
    for f, t, n in tr.itertuples(index=False):
        P[idx[f], idx[t]] = float(n)
    rs = P.sum(axis=1, keepdims=True)
    # absorbing fallback: a type with no outgoing transitions self-loops
    for i in range(k):
        if rs[i, 0] == 0.0:
            P[i, i] = 1.0
            rs[i, 0] = 1.0
    P /= rs
    pi = np.full(k, 1.0 / k)
    for _ in range(MARKOV_ITERS):
        pi = pi @ P
    return pd.DataFrame({"event_type": types, "pi": pi})


# ---------------------------------------------------------------------------
# Exact weighted median (quantity-weighted discount per return flag)
# ---------------------------------------------------------------------------

def lineitem_weighted_median(sf_dir: str):
    """Per-return-flag LOWER weighted median of the discount, weighted
    by quantity: the smallest discount value v whose cumulative weight
    reaches half the total (2*cumw >= total in exact ints — no /2
    fraction ever materializes). Per-batch partial (flag, discount)
    weight sums compact to the tiny flag x discount-domain histogram;
    one groupby-sum exchange; the crossing scan runs driver-side over
    that grid. Output: (flag, total_qty, wmedian_disc_x100)."""
    empty = pd.DataFrame({"flag": pd.Series(dtype="object"),
                          "total_qty": pd.Series(dtype="int64"),
                          "wmedian_disc_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_discount",
                                  "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "flag": batch["l_returnflag"].to_numpy(zero_copy_only=False),
            "disc_x100": _cents(batch["l_discount"]).to_numpy(),
            "w": _cents(batch["l_quantity"], 1.0).to_numpy()})
        return _from_pandas(
            df.groupby(["flag", "disc_x100"], as_index=False)["w"].sum())

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby(["flag", "disc_x100"])
            .aggregate(Sum("w", alias_name="w"))
            .to_pandas())
    if hist.empty:
        return empty
    hist = hist.sort_values(["flag", "disc_x100"])
    hist["cw"] = hist.groupby("flag")["w"].cumsum()
    tot = hist.groupby("flag")["w"].transform("sum")
    cross = hist[2 * hist["cw"] >= tot]
    out = cross.groupby("flag", as_index=False) \
        .agg(wmedian_disc_x100=("disc_x100", "min"))
    out["total_qty"] = hist.groupby("flag")["w"].sum() \
        .reindex(out["flag"]).to_numpy(np.int64)
    return out[["flag", "total_qty", "wmedian_disc_x100"]] \
        .astype({"total_qty": "int64", "wmedian_disc_x100": "int64"}) \
        .sort_values("flag").reset_index(drop=True)


WEIGHTED_MEDIAN_SQL = """
WITH h AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_discount * 100.0) AS BIGINT) AS disc_x100,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2),
c AS (
  SELECT flag, disc_x100, w,
         SUM(w) OVER (PARTITION BY flag ORDER BY disc_x100
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cw,
         SUM(w) OVER (PARTITION BY flag) AS tw
  FROM h)
SELECT flag, CAST(MAX(tw) AS BIGINT) AS total_qty,
       CAST(MIN(disc_x100) AS BIGINT) AS wmedian_disc_x100
FROM c WHERE 2 * cw >= tw
GROUP BY flag ORDER BY flag
"""


# ---------------------------------------------------------------------------
# Daily event-type Gini impurity (rational diversity index — no libm)
# ---------------------------------------------------------------------------

def events_type_gini_daily(sf_dir: str):
    """Per-day Gini impurity of the event-type mix, 1 - sum(p_i^2) —
    the diversity/concentration index that, unlike Shannon entropy,
    is a pure RATIONAL in the counts (no ln, whose libm rounding
    differs across engines): numerator and denominator stay exact
    int64 and the final double is ONE division. Per-batch partial
    (day, type) counts compact each batch to <= days x types rows; one
    small groupby-sum exchange; the per-day fold is driver-side exact
    ints. Output: (day, n, sumsq, gini)."""
    empty = pd.DataFrame({"day": pd.Series(dtype="int64"),
                          "n": pd.Series(dtype="int64"),
                          "sumsq": pd.Series(dtype="int64"),
                          "gini": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype(np.int64)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"day": day, "event_type": et}) \
            .groupby(["day", "event_type"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return _from_pandas(g)

    hist = (rd.read_parquet(_pq(sf_dir, "events"),
                            columns=["ts", "event_type"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(["day", "event_type"])
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    if hist.empty:
        return empty
    g = hist.assign(sq=hist["c"].astype("int64") ** 2) \
        .groupby("day", as_index=False) \
        .agg(n=("c", "sum"), sumsq=("sq", "sum")).astype("int64")
    n = g["n"].to_numpy(np.int64)
    sq = g["sumsq"].to_numpy(np.int64)
    g["gini"] = (n * n - sq).astype(np.float64) / (n * n).astype(np.float64)
    return g.sort_values("day").reset_index(drop=True)


GINI_DAILY_SQL = """
WITH c AS (
  SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
         event_type, COUNT(*) AS c
  FROM events GROUP BY day, event_type),
g AS (
  SELECT day, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * c) AS BIGINT) AS sumsq
  FROM c GROUP BY day)
SELECT day, n, sumsq,
       CAST(n * n - sumsq AS DOUBLE) / CAST(n * n AS DOUBLE) AS gini
FROM g ORDER BY day
"""


# ---------------------------------------------------------------------------
# Two-regressor OLS (multiple regression via exact integer Cramer dets)
# ---------------------------------------------------------------------------

def lineitem_ols2(sf_dir: str):
    """Multiple linear regression price_usd ~ b0 + b1*qty +
    b2*discount_x100 over raw line items — the 2-feature generalization
    of the grouped OLS trend. ONE scan emits the 9 exact int64 moment
    partials (n, Sx1, Sx2, Sy, Sx11, Sx12, Sx22, Sx1y, Sx2y); the 3x3
    normal equations solve by Cramer's rule in exact PYTHON-INT
    determinants (y in whole dollars keeps det(A_i) inside int128 for
    the oracle out to ~sf100), so each coefficient is ONE int->double
    division on both engines — bit-exact with zero float-order
    sensitivity. Output: (n_lines, b0, b1, b2)."""
    empty = pd.DataFrame({"n_lines": pd.Series(dtype="int64"),
                          "b0": pd.Series(dtype="float64"),
                          "b1": pd.Series(dtype="float64"),
                          "b2": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "lineitem"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_extendedprice",
                                  "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        x1 = _cents(batch["l_quantity"], 1.0) \
            .to_numpy(zero_copy_only=False)
        x2 = _cents(batch["l_discount"], 100.0) \
            .to_numpy(zero_copy_only=False)
        y = _cents(batch["l_extendedprice"], 1.0) \
            .to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "n": [len(y)],
            "sx1": [int(x1.sum())], "sx2": [int(x2.sum())],
            "sy": [int(y.sum())],
            "sx11": [int((x1 * x1).sum())],
            "sx12": [int((x1 * x2).sum())],
            "sx22": [int((x2 * x2).sum())],
            "sx1y": [int((x1 * y).sum())],
            "sx2y": [int((x2 * y).sum())]})

    cols = ("n", "sx1", "sx2", "sy", "sx11", "sx12", "sx22",
            "sx1y", "sx2y")
    s = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .aggregate(*[Sum(c, alias_name=c) for c in cols]))
    n = int(s["n"])
    if n == 0:
        return empty
    a = [[n, int(s["sx1"]), int(s["sx2"])],
         [int(s["sx1"]), int(s["sx11"]), int(s["sx12"])],
         [int(s["sx2"]), int(s["sx12"]), int(s["sx22"])]]
    b = [int(s["sy"]), int(s["sx1y"]), int(s["sx2y"])]

    def det3(m):
        return (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
                - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
                + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))

    da = det3(a)
    if da == 0:
        return empty
    dets = []
    for col in range(3):
        m = [row[:] for row in a]
        for r_ in range(3):
            m[r_][col] = b[r_]
        dets.append(det3(m))
    return pd.DataFrame({"n_lines": [n],
                         "b0": [float(dets[0]) / float(da)],
                         "b1": [float(dets[1]) / float(da)],
                         "b2": [float(dets[2]) / float(da)]})


OLS2_SQL = """
WITH m AS (
  SELECT COUNT(*) AS n,
    SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT)) AS sx1,
    SUM(CAST(CAST(ROUND(l_discount * 100.0) AS BIGINT) AS HUGEINT)) AS sx2,
    SUM(CAST(CAST(ROUND(l_extendedprice) AS BIGINT) AS HUGEINT)) AS sy,
    SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT)
        * CAST(ROUND(l_quantity) AS BIGINT)) AS sx11,
    SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT)
        * CAST(ROUND(l_discount * 100.0) AS BIGINT)) AS sx12,
    SUM(CAST(CAST(ROUND(l_discount * 100.0) AS BIGINT) AS HUGEINT)
        * CAST(ROUND(l_discount * 100.0) AS BIGINT)) AS sx22,
    SUM(CAST(CAST(ROUND(l_quantity) AS BIGINT) AS HUGEINT)
        * CAST(ROUND(l_extendedprice) AS BIGINT)) AS sx1y,
    SUM(CAST(CAST(ROUND(l_discount * 100.0) AS BIGINT) AS HUGEINT)
        * CAST(ROUND(l_extendedprice) AS BIGINT)) AS sx2y
  FROM lineitem),
d AS (
  SELECT n, sy, sx1y, sx2y,
    n * (sx11 * sx22 - sx12 * sx12)
      - sx1 * (sx1 * sx22 - sx12 * sx2)
      + sx2 * (sx1 * sx12 - sx11 * sx2) AS da,
    sy * (sx11 * sx22 - sx12 * sx12)
      - sx1 * (sx1y * sx22 - sx12 * sx2y)
      + sx2 * (sx1y * sx12 - sx11 * sx2y) AS d0,
    n * (sx1y * sx22 - sx12 * sx2y)
      - sy * (sx1 * sx22 - sx12 * sx2)
      + sx2 * (sx1 * sx2y - sx1y * sx2) AS d1,
    n * (sx11 * sx2y - sx1y * sx12)
      - sx1 * (sx1 * sx2y - sx1y * sx2)
      + sy * (sx1 * sx12 - sx11 * sx2) AS d2
  FROM m)
SELECT CAST(n AS BIGINT) AS n_lines,
       CAST(d0 AS DOUBLE) / CAST(da AS DOUBLE) AS b0,
       CAST(d1 AS DOUBLE) / CAST(da AS DOUBLE) AS b1,
       CAST(d2 AS DOUBLE) / CAST(da AS DOUBLE) AS b2
FROM d
WHERE n > 0 AND da <> 0
"""


# ---------------------------------------------------------------------------
# LOCF imputation over the hourly value series
# ---------------------------------------------------------------------------

def events_hourly_locf(sf_dir: str):
    """Last-observation-carried-forward imputation: the densified
    hourly series of exact value sums (cents), with gap hours filled by
    the most recent observed hour's sum — the imputation step before
    any equally-spaced time-series model. Same one grouped exchange as
    the ACF/EWMA; the fill is a driver fold over the span-bounded dense
    series in exact ints (leading gaps keep the -1 sentinel). Output:
    (hr, observed, value_x100)."""
    empty = pd.DataFrame({"hr": pd.Series(dtype="int64"),
                          "observed": pd.Series(dtype="int64"),
                          "value_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hr = ts.astype("datetime64[h]").astype(np.int64)
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"hr": hr, "v": v}) \
            .groupby("hr", as_index=False)["v"].sum()
        return _from_pandas(g.astype("int64"))

    hist = (rd.read_parquet(_pq(sf_dir, "events"),
                            columns=["ts", "value"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("hr").aggregate(Sum("v", alias_name="v"))
            .to_pandas())
    if hist.empty:
        return empty
    hr = hist["hr"].to_numpy(np.int64)
    h0, h1 = int(hr.min()), int(hr.max())
    observed = np.zeros(h1 - h0 + 1, dtype=np.int64)
    vals = np.zeros(h1 - h0 + 1, dtype=np.int64)
    observed[hr - h0] = 1
    vals[hr - h0] = hist["v"].to_numpy(np.int64)
    last = -1
    out_vals = np.empty_like(vals)
    for i in range(len(vals)):
        if observed[i]:
            last = int(vals[i])
        out_vals[i] = last
    return pd.DataFrame({"hr": np.arange(h0, h1 + 1, dtype=np.int64),
                         "observed": observed,
                         "value_x100": out_vals})


LOCF_SQL = """
WITH h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr,
         CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY hr),
b AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM h),
dense AS (
  SELECT g.hr, h.v, CASE WHEN h.hr IS NULL THEN 0 ELSE 1 END AS observed
  FROM (SELECT unnest(generate_series(h0, h1)) AS hr FROM b) g
  LEFT JOIN h ON h.hr = g.hr)
SELECT hr, CAST(observed AS BIGINT) AS observed,
       CAST(COALESCE(LAST_VALUE(v IGNORE NULLS)
                     OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING), -1)
            AS BIGINT) AS value_x100
FROM dense
ORDER BY hr
"""


# ---------------------------------------------------------------------------
# Multi-granularity time rollup (hour -> day -> month from one scan)
# ---------------------------------------------------------------------------

def events_time_rollup(sf_dir: str):
    """Event counts and exact value sums at three time granularities
    (hour, day, month) from ONE finest-level scan: the hourly grouped
    table computes distributed, and the day/month levels derive from
    that tiny intermediate — the time-dimension ROLLUP every metrics
    store materializes. Output: (grain, bucket, n_events,
    value_x100)."""
    empty = pd.DataFrame({"grain": pd.Series(dtype="object"),
                          "bucket": pd.Series(dtype="object"),
                          "n_events": pd.Series(dtype="int64"),
                          "value_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.strftime(batch["ts"], format="%Y-%m-%d %H") \
            .to_numpy(zero_copy_only=False)
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"hour": hour, "v": v}).groupby(
            "hour", as_index=False).agg(n=("v", "size"), v=("v", "sum"))
        return _from_pandas(g.astype({"n": "int64", "v": "int64"}))

    hourly = (rd.read_parquet(_pq(sf_dir, "events"),
                              columns=["ts", "value"])
              .map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
              .groupby("hour")
              .aggregate(Sum("n", alias_name="n"),
                         Sum("v", alias_name="v"))
              .to_pandas())
    if hourly.empty:
        return empty
    levels = []
    for grain, width in (("hour", 13), ("day", 10), ("month", 7)):
        lv = hourly.assign(bucket=hourly["hour"].str[:width]) \
            .groupby("bucket", as_index=False)[["n", "v"]].sum()
        lv.insert(0, "grain", grain)
        levels.append(lv)
    out = pd.concat(levels, ignore_index=True).rename(
        columns={"n": "n_events", "v": "value_x100"})
    return out.sort_values(["grain", "bucket"]).reset_index(drop=True) \
        .astype({"n_events": "int64", "value_x100": "int64"})


TIME_ROLLUP_SQL = """
WITH h AS (
  SELECT strftime(ts, '%Y-%m-%d %H') AS hour, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY hour)
SELECT 'hour' AS grain, hour AS bucket, CAST(SUM(n) AS BIGINT)
       AS n_events, CAST(SUM(v) AS BIGINT) AS value_x100
FROM h GROUP BY hour
UNION ALL
SELECT 'day', substr(hour, 1, 10), CAST(SUM(n) AS BIGINT),
       CAST(SUM(v) AS BIGINT) FROM h GROUP BY 2
UNION ALL
SELECT 'month', substr(hour, 1, 7), CAST(SUM(n) AS BIGINT),
       CAST(SUM(v) AS BIGINT) FROM h GROUP BY 2
ORDER BY grain, bucket
"""


# ---------------------------------------------------------------------------
# Benford first-digit profile (data-quality / fraud screen)
# ---------------------------------------------------------------------------

def orders_benford_digits(sf_dir: str):
    """First-significant-digit distribution of order totals (cents)
    against the Benford expectation — the data-authenticity screen.
    Counts are exact (digit extraction from the integer's decimal
    string on both engines); shares are x1e6 floor divisions; the
    Benford reference column is a fixed x1e6 integer constant table, so
    no float enters the compare. Output: (digit, n_orders, share_x1e6,
    benford_x1e6)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("digit", "n_orders", "share_x1e6",
                           "benford_x1e6")})
    if _table_empty(sf_dir, "orders"):
        return empty
    # floor(log10(1+1/d)*1e6) constants, identical literals both sides
    benford = {1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
               6: 66946, 7: 57991, 8: 51152, 9: 45757}

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch["o_totalprice"]).to_numpy(
            zero_copy_only=False)
        cents = cents[cents > 0]
        # leading decimal digit via string head (exact, locale-free)
        d = np.array([int(str(c)[0]) for c in cents.tolist()],
                     dtype=np.int64)
        g = pd.DataFrame({"digit": d}).groupby(
            "digit", as_index=False).size().rename(columns={"size": "n"})
        return _from_pandas(g.astype("int64"))

    agg = (rd.read_parquet(_pq(sf_dir, "orders"),
                           columns=["o_totalprice"])
           .map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby("digit").aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    if agg.empty:
        return empty
    agg = agg.sort_values("digit")
    total = int(agg["n"].sum())
    agg["share_x1e6"] = agg["n"].astype("int64") * 1_000_000 // total
    agg["benford_x1e6"] = agg["digit"].map(benford).astype("int64")
    return agg.rename(columns={"n": "n_orders"}) \
        .astype("int64").reset_index(drop=True)


BENFORD_SQL = """
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders),
d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c WHERE cents > 0),
g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
ref(digit, benford_x1e6) AS (VALUES
  (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181),
  (6, 66946), (7, 57991), (8, 51152), (9, 45757))
SELECT g.digit, CAST(g.n AS BIGINT) AS n_orders,
       CAST(g.n * 1000000 // (SELECT SUM(n) FROM g) AS BIGINT)
           AS share_x1e6,
       CAST(ref.benford_x1e6 AS BIGINT) AS benford_x1e6
FROM g JOIN ref ON ref.digit = g.digit
ORDER BY g.digit
"""


# ---------------------------------------------------------------------------
# Winsorization rewrite (clamp to exact [p05, p95])
# ---------------------------------------------------------------------------

WINSOR_LO_Q, WINSOR_HI_Q = 0.05, 0.95


def events_value_winsorized(sf_dir: str):
    """Winsorize event values to the exact global [p05, p95]
    quantile_disc bounds — the outlier-clamping rewrite run before
    moment-sensitive models. Bounds derive from the SAME compacted
    value histogram as the decile binning (ceil(q*n)-1 rule, all
    integer); the clamp is one vectorized pass. Outputs the per-type
    audit the rewrite ships with: rows clamped each side and exact
    cents sums before/after. Output: (event_type, n_events, n_lo,
    n_hi, sum_x100, winsorized_sum_x100)."""
    empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                          **{c: pd.Series(dtype="int64") for c in
                             ("n_events", "n_lo", "n_hi", "sum_x100",
                              "winsorized_sum_x100")}})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["event_type", "value"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "v_x100": _cents(batch["value"]).to_numpy(
                zero_copy_only=False),
            "cnt": np.ones(len(batch), dtype=np.int64)})
        return _from_pandas(df.groupby("v_x100", as_index=False).sum())

    def hist_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v_x100", as_index=False)["cnt"].sum()

    hist = _coarse_partition_map(
        ds.map_batches(hist_partial, batch_format="pyarrow",
                       batch_size=None),
        "v_x100", hist_sum).to_pandas().sort_values("v_x100")
    if hist.empty:
        return empty
    vals = hist["v_x100"].to_numpy(np.int64)
    cum = hist["cnt"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])

    def q_disc(q: float) -> int:
        idx = int(np.ceil(q * n)) - 1
        return int(vals[np.searchsorted(cum, idx, side="right")])

    lo, hi = q_disc(WINSOR_LO_Q), q_disc(WINSOR_HI_Q)

    def clamp_partial(batch: pa.Table) -> pa.Table:
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        w = np.clip(v, lo, hi)
        df = pd.DataFrame({
            "event_type": batch["event_type"]
            .to_numpy(zero_copy_only=False),
            "n_events": np.ones(len(v), dtype=np.int64),
            "n_lo": (v < lo).astype(np.int64),
            "n_hi": (v > hi).astype(np.int64),
            "sum_x100": v, "winsorized_sum_x100": w})
        return _from_pandas(df.groupby("event_type", as_index=False)
                            .sum())

    cols = ("n_events", "n_lo", "n_hi", "sum_x100",
            "winsorized_sum_x100")
    return (ds.map_batches(clamp_partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby("event_type")
            .aggregate(*[Sum(c, alias_name=c) for c in cols])
            .sort("event_type"))


WINSOR_SQL = f"""
WITH v AS (
  SELECT event_type,
         CAST(ROUND(value * 100.0) AS BIGINT) AS v
  FROM events),
b AS (
  SELECT quantile_disc(v, {WINSOR_LO_Q}) AS lo,
         quantile_disc(v, {WINSOR_HI_Q}) AS hi
  FROM v)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN v.v < b.lo THEN 1 ELSE 0 END) AS BIGINT)
           AS n_lo,
       CAST(SUM(CASE WHEN v.v > b.hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hi,
       CAST(SUM(v.v) AS BIGINT) AS sum_x100,
       CAST(SUM(LEAST(GREATEST(v.v, b.lo), b.hi)) AS BIGINT)
           AS winsorized_sum_x100
FROM v CROSS JOIN b
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Distribution drift: total-variation distance between time halves
# ---------------------------------------------------------------------------

def events_type_drift_tvd(sf_dir: str):
    """Drift monitor: total-variation distance between the event-type
    distributions of the EARLY and LATE halves of the time range
    (split at the midpoint of [min ts, max ts]) — TVD instead of
    PSI/KL because it is an exact rational: with half counts (n_i, N)
    and (m_i, M), TVD = sum |n_i*M - m_i*N| / (2*N*M), all integers
    until one final floor division (x1e9). Two streaming passes (the
    min/max probe is a tiny aggregate; the counts are one grouped
    exchange). Output: (n_early, n_late, n_types, tvd_x1e9)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("n_early", "n_late", "n_types", "tvd_x1e9")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["ts", "event_type"])

    def minmax(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.Table.from_pydict({"lo": [int(ts.min())],
                                     "hi": [int(ts.max())]})

    mm = ds.map_batches(minmax, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    mid = lo + (hi - lo) // 2               # integer us midpoint

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({
            "event_type": batch["event_type"]
            .to_numpy(zero_copy_only=False),
            "early": (ts <= mid).astype(np.int64),
            "late": (ts > mid).astype(np.int64)})
        return _from_pandas(df.groupby("event_type", as_index=False)
                            .sum())

    g = (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
         .groupby("event_type")
         .aggregate(Sum("early", alias_name="early"),
                    Sum("late", alias_name="late"))
         .to_pandas())
    if g.empty:
        return empty
    n = int(g["early"].sum())
    m = int(g["late"].sum())
    if n == 0 or m == 0:
        return empty
    num = sum(abs(int(e) * m - int(l) * n)
              for e, l in zip(g["early"], g["late"]))
    tvd = num * 1_000_000_000 // (2 * n * m)
    return pd.DataFrame({"n_early": [n], "n_late": [m],
                         "n_types": [len(g)], "tvd_x1e9": [tvd]})


DRIFT_TVD_SQL = """
WITH b AS (
  SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi FROM events),
s AS (
  SELECT event_type,
         SUM(CASE WHEN epoch_us(ts) <=
                 (SELECT lo + (hi - lo) // 2 FROM b)
             THEN 1 ELSE 0 END) AS early,
         SUM(CASE WHEN epoch_us(ts) >
                 (SELECT lo + (hi - lo) // 2 FROM b)
             THEN 1 ELSE 0 END) AS late
  FROM events GROUP BY event_type),
tot AS (SELECT SUM(early) AS n, SUM(late) AS m FROM s)
SELECT CAST(n AS BIGINT) AS n_early, CAST(m AS BIGINT) AS n_late,
       (SELECT COUNT(*) FROM s) AS n_types,
       CAST((SELECT SUM(ABS(CAST(early * m - late * n AS HUGEINT)))
             FROM s, tot) * 1000000000
            // (2 * CAST(n AS HUGEINT) * m) AS BIGINT) AS tvd_x1e9
FROM tot
WHERE n > 0 AND m > 0
"""


# ---------------------------------------------------------------------------
# CUSUM change-point over the hourly count series
# ---------------------------------------------------------------------------

def events_hourly_changepoint(sf_dir: str):
    """Single change-point detection on the densified hourly count
    series via the integer CUSUM statistic D_k = n*S_k - k*S_n
    (maximum absolute deviation of the cumulative sum from the global
    trend line): the split hour with max |D_k|, ties to the earliest
    hour — all integers, no float anywhere. Same grouped epoch-hour
    exchange as the ACF/EWMA; the scan runs over the span-bounded
    dense series. Output: (split_hr, d_abs_max, n_hours, total)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("split_hr", "d_abs_max", "n_hours", "total")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hr = ts.astype("datetime64[h]").astype(np.int64)
        g = pd.DataFrame({"hr": hr}).groupby("hr", as_index=False) \
            .size().rename(columns={"size": "c"})
        return _from_pandas(g)

    hist = (rd.read_parquet(_pq(sf_dir, "events"), columns=["ts"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("hr").aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    if hist.empty:
        return empty
    hr = hist["hr"].to_numpy(np.int64)
    h0, h1 = int(hr.min()), int(hr.max())
    dense = np.zeros(h1 - h0 + 1, dtype=np.int64)
    dense[hr - h0] = hist["c"].to_numpy(np.int64)
    n = len(dense)
    s = dense.cumsum()
    total = int(s[-1])
    k = np.arange(1, n + 1, dtype=np.int64)
    d = n * s - k * total
    i = int(np.lexsort((k, -np.abs(d)))[0])   # max |d|, earliest hour
    return pd.DataFrame({"split_hr": [h0 + i],
                         "d_abs_max": [int(abs(d[i]))],
                         "n_hours": [n], "total": [total]})


CHANGEPOINT_SQL = """
WITH h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr,
         COUNT(*) AS c
  FROM events GROUP BY hr),
b AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM h),
dense AS (
  SELECT g.hr, COALESCE(h.c, 0) AS c
  FROM (SELECT unnest(generate_series(h0, h1)) AS hr FROM b) g
  LEFT JOIN h ON h.hr = g.hr),
cum AS (
  SELECT hr,
         SUM(c) OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING) AS s,
         ROW_NUMBER() OVER (ORDER BY hr) AS k,
         COUNT(*) OVER () AS n, SUM(c) OVER () AS total
  FROM dense),
d AS (
  SELECT hr, ABS(CAST(n * s - k * total AS HUGEINT)) AS dabs,
         n, total
  FROM cum)
SELECT CAST(hr AS BIGINT) AS split_hr, CAST(dabs AS BIGINT) AS d_abs_max,
       CAST(n AS BIGINT) AS n_hours, CAST(total AS BIGINT) AS total
FROM d
ORDER BY dabs DESC, hr
LIMIT 1
"""


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift over the value distribution
# ---------------------------------------------------------------------------

def events_value_drift_ks(sf_dir: str):
    """Two-sample KS statistic between the value distributions of the
    early and late time halves: D = max over the merged value domain of
    |F_early - F_late|, computed exactly as the integer argmax of
    |c1*M - c2*N| over the compacted per-half value histogram (cents) —
    the continuous-distribution counterpart of the TVD type-drift
    monitor. One grouped (value -> early,late counts) exchange; the
    CDF scan runs over the distinct-value domain. Ties on D take the
    smallest value. Output: (n_early, n_late, at_value_x100,
    ks_x1e9)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("n_early", "n_late", "at_value_x100",
                           "ks_x1e9")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["ts", "value"])

    def minmax(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.Table.from_pydict({"lo": [int(ts.min())],
                                     "hi": [int(ts.max())]})

    mm = ds.map_batches(minmax, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    mid = lo + (hi - lo) // 2

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"v_x100": v,
                           "early": (ts <= mid).astype(np.int64),
                           "late": (ts > mid).astype(np.int64)})
        return _from_pandas(df.groupby("v_x100", as_index=False).sum())

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby("v_x100")
            .aggregate(Sum("early", alias_name="early"),
                       Sum("late", alias_name="late"))
            .to_pandas())
    if hist.empty:
        return empty
    hist = hist.sort_values("v_x100")
    n = int(hist["early"].sum())
    m = int(hist["late"].sum())
    if n == 0 or m == 0:
        return empty
    c1 = hist["early"].to_numpy(np.int64).cumsum()
    c2 = hist["late"].to_numpy(np.int64).cumsum()
    d = np.abs(c1 * m - c2 * n)
    i = int(np.lexsort((hist["v_x100"].to_numpy(np.int64),
                        -d))[0])                # max d, smallest value
    return pd.DataFrame({
        "n_early": [n], "n_late": [m],
        "at_value_x100": [int(hist["v_x100"].iloc[i])],
        "ks_x1e9": [int(d[i]) * 1_000_000_000 // (n * m)]})


DRIFT_KS_SQL = """
WITH b AS (
  SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi FROM events),
h AS (
  SELECT CAST(ROUND(value * 100.0) AS BIGINT) AS v,
         SUM(CASE WHEN epoch_us(ts) <=
                 (SELECT lo + (hi - lo) // 2 FROM b)
             THEN 1 ELSE 0 END) AS early,
         SUM(CASE WHEN epoch_us(ts) >
                 (SELECT lo + (hi - lo) // 2 FROM b)
             THEN 1 ELSE 0 END) AS late
  FROM events GROUP BY v),
c AS (
  SELECT v,
         SUM(early) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c1,
         SUM(late) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c2,
         SUM(early) OVER () AS n, SUM(late) OVER () AS m
  FROM h),
d AS (
  SELECT v, ABS(CAST(c1 * m - c2 * n AS HUGEINT)) AS dabs, n, m
  FROM c WHERE n > 0 AND m > 0)
SELECT CAST(n AS BIGINT) AS n_early, CAST(m AS BIGINT) AS n_late,
       CAST(v AS BIGINT) AS at_value_x100,
       CAST(dabs * 1000000000 // (CAST(n AS HUGEINT) * m) AS BIGINT)
           AS ks_x1e9
FROM d
ORDER BY dabs DESC, v
LIMIT 1
"""


# ---------------------------------------------------------------------------
# Linear-interpolation imputation over the hourly value series
# ---------------------------------------------------------------------------

def events_hourly_interp(sf_dir: str):
    """Linear interpolation for gap hours between observed hourly cents
    sums — the smooth imputation next to the LOCF step function:
    v = v_prev + (v_next - v_prev) * (hr - hr_prev) // gap, an
    all-integer form whose division TRUNCATES toward zero on both
    engines (DuckDB's `//` semantics, mirrored explicitly — the delta
    can be negative). Leading/trailing gaps cannot exist (the span is
    [min, max] observed). Same grouped epoch-hour exchange; the fill is
    a span-bounded driver fold. Output: (hr, observed, value_x100)."""
    empty = pd.DataFrame({"hr": pd.Series(dtype="int64"),
                          "observed": pd.Series(dtype="int64"),
                          "value_x100": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hr = ts.astype("datetime64[h]").astype(np.int64)
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({"hr": hr, "v": v}) \
            .groupby("hr", as_index=False)["v"].sum()
        return _from_pandas(g.astype("int64"))

    hist = (rd.read_parquet(_pq(sf_dir, "events"),
                            columns=["ts", "value"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("hr").aggregate(Sum("v", alias_name="v"))
            .to_pandas().sort_values("hr"))
    if hist.empty:
        return empty
    hrs = hist["hr"].to_numpy(np.int64)
    vs = hist["v"].to_numpy(np.int64)
    h0, h1 = int(hrs.min()), int(hrs.max())
    span = np.arange(h0, h1 + 1, dtype=np.int64)
    observed = np.zeros(len(span), dtype=np.int64)
    observed[hrs - h0] = 1
    # prev/next observed index per position
    idx = np.searchsorted(hrs, span, side="right") - 1   # prev obs
    nxt = np.searchsorted(hrs, span, side="left")        # next obs
    nxt = np.minimum(nxt, len(hrs) - 1)
    hp, vp = hrs[idx], vs[idx]
    hn, vn = hrs[nxt], vs[nxt]
    gap = np.maximum(hn - hp, 1)
    num = (vn - vp) * (span - hp)
    q = np.sign(num) * (np.abs(num) // gap)              # trunc division
    vals = np.where(observed == 1, vs[np.minimum(idx, len(vs) - 1)],
                    vp + q)
    return pd.DataFrame({"hr": span, "observed": observed,
                         "value_x100": vals.astype(np.int64)})


INTERP_SQL = """
WITH h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr,
         CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY hr),
b AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM h),
dense AS (
  SELECT g.hr, h.v, CASE WHEN h.hr IS NULL THEN 0 ELSE 1 END AS observed
  FROM (SELECT unnest(generate_series(h0, h1)) AS hr FROM b) g
  LEFT JOIN h ON h.hr = g.hr),
ctx AS (
  SELECT hr, v, observed,
         LAST_VALUE(v IGNORE NULLS)
           OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING) AS vp,
         LAST_VALUE(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
           OVER (ORDER BY hr ROWS UNBOUNDED PRECEDING) AS hp,
         FIRST_VALUE(v IGNORE NULLS)
           OVER (ORDER BY hr ROWS BETWEEN CURRENT ROW
                 AND UNBOUNDED FOLLOWING) AS vn,
         FIRST_VALUE(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
           OVER (ORDER BY hr ROWS BETWEEN CURRENT ROW
                 AND UNBOUNDED FOLLOWING) AS hn
  FROM dense)
SELECT hr, CAST(observed AS BIGINT) AS observed,
       CAST(CASE WHEN observed = 1 THEN v
                 ELSE vp + (vn - vp) * (hr - hp)
                      // GREATEST(hn - hp, 1)
            END AS BIGINT) AS value_x100
FROM ctx
ORDER BY hr
"""


# ---------------------------------------------------------------------------
# Rolling median over the hourly count series
# ---------------------------------------------------------------------------

ROLL_MED_WINDOW = 24


def events_hourly_rolling_median(sf_dir: str):
    """Trailing {ROLL_MED_WINDOW}-hour rolling MEDIAN of the densified
    hourly count series — the robust (outlier-immune) smoother next to
    the EWMA. Counts are integers, so the median is either an integer
    or an exact .5 (even window): emitted x2 as an exact int on both
    engines. Same grouped epoch-hour exchange; the windowed scan is a
    vectorized stride-tricks median over the span-bounded dense series.
    Output: (hr, c, median2_x)."""
    empty = pd.DataFrame({"hr": pd.Series(dtype="int64"),
                          "c": pd.Series(dtype="int64"),
                          "median2_x": pd.Series(dtype="int64")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False)
        hr = ts.astype("datetime64[h]").astype(np.int64)
        g = pd.DataFrame({"hr": hr}).groupby("hr", as_index=False) \
            .size().rename(columns={"size": "c"})
        return _from_pandas(g)

    hist = (rd.read_parquet(_pq(sf_dir, "events"), columns=["ts"])
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("hr").aggregate(Sum("c", alias_name="c"))
            .to_pandas())
    if hist.empty:
        return empty
    hr = hist["hr"].to_numpy(np.int64)
    h0, h1 = int(hr.min()), int(hr.max())
    dense = np.zeros(h1 - h0 + 1, dtype=np.int64)
    dense[hr - h0] = hist["c"].to_numpy(np.int64)
    n = len(dense)
    med2 = np.empty(n, dtype=np.int64)
    for i in range(n):                 # windows are tiny (<= 24 values)
        w = np.sort(dense[max(0, i - ROLL_MED_WINDOW + 1):i + 1])
        k = len(w)
        if k % 2 == 1:
            med2[i] = 2 * int(w[k // 2])
        else:
            med2[i] = int(w[k // 2 - 1]) + int(w[k // 2])
    return pd.DataFrame({"hr": np.arange(h0, h1 + 1, dtype=np.int64),
                         "c": dense, "median2_x": med2})


ROLLING_MEDIAN_SQL = f"""
WITH h AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hr,
         COUNT(*) AS c
  FROM events GROUP BY hr),
b AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM h),
dense AS (
  SELECT g.hr, COALESCE(h.c, 0) AS c
  FROM (SELECT unnest(generate_series(h0, h1)) AS hr FROM b) g
  LEFT JOIN h ON h.hr = g.hr)
SELECT hr, CAST(c AS BIGINT) AS c,
       CAST(median(c) OVER (ORDER BY hr
            ROWS {ROLL_MED_WINDOW - 1} PRECEDING) * 2 AS BIGINT)
           AS median2_x
FROM dense
ORDER BY hr
"""


# ---------------------------------------------------------------------------
# Quantile-quantile drift between the early and late time halves
# ---------------------------------------------------------------------------

QQ_DECILES = 9       # deciles 0.1 .. 0.9


def events_qq_drift(sf_dir: str):
    """Q-Q drift report between the value distributions of the early
    and late time halves (same midpoint split as the KS monitor): the
    nine DISCRETE deciles of each half side by side with their shift —
    the 'where in the distribution did it move' complement to the KS
    max-gap scalar. Everything is integer order statistics (DuckDB
    quantile_disc = 1-based element ceil(q*n)) over the compacted
    per-half cents histogram, so the report is bit-exact. One grouped
    (value -> early,late counts) exchange; the decile lookup scans the
    distinct-value domain. Output: (q_x10, v_early_x100, v_late_x100,
    shift_x100)."""
    empty = pd.DataFrame({c: pd.Series(dtype="int64") for c in
                          ("q_x10", "v_early_x100", "v_late_x100",
                           "shift_x100")})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"), columns=["ts", "value"])

    def minmax(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.Table.from_pydict({"lo": [int(ts.min())],
                                     "hi": [int(ts.max())]})

    mm = ds.map_batches(minmax, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    if mm.empty:
        return empty
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    mid = lo + (hi - lo) // 2

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"v_x100": v,
                           "early": (ts <= mid).astype(np.int64),
                           "late": (ts > mid).astype(np.int64)})
        return _from_pandas(df.groupby("v_x100", as_index=False).sum())

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby("v_x100")
            .aggregate(Sum("early", alias_name="early"),
                       Sum("late", alias_name="late"))
            .to_pandas().sort_values("v_x100"))
    if hist.empty:
        return empty
    vals = hist["v_x100"].to_numpy(np.int64)
    n_e = int(hist["early"].sum())
    n_l = int(hist["late"].sum())
    if n_e == 0 or n_l == 0:
        return empty
    ce = hist["early"].to_numpy(np.int64).cumsum()
    cl = hist["late"].to_numpy(np.int64).cumsum()
    rows = []
    for qi in range(1, QQ_DECILES + 1):
        ke = int(np.ceil(qi / 10.0 * n_e))      # 1-based rank
        kl = int(np.ceil(qi / 10.0 * n_l))
        ve = int(vals[np.searchsorted(ce, ke)])
        vl = int(vals[np.searchsorted(cl, kl)])
        rows.append((qi, ve, vl, vl - ve))
    return pd.DataFrame(rows, columns=["q_x10", "v_early_x100",
                                       "v_late_x100", "shift_x100"]) \
        .astype("int64")


QQ_DRIFT_SQL = """
WITH b AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events),
e AS (
  SELECT CAST(round(value * 100.0) AS BIGINT) AS v,
         CASE WHEN epoch_us(ts) <= lo + (hi - lo) // 2
              THEN 0 ELSE 1 END AS half
  FROM events, b),
qe AS (SELECT quantile_disc(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
           AS qs FROM e WHERE half = 0),
ql AS (SELECT quantile_disc(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])
           AS qs FROM e WHERE half = 1),
i AS (SELECT unnest(generate_series(1, 9)) AS qi)
SELECT CAST(qi AS BIGINT) AS q_x10,
       CAST(qe.qs[qi] AS BIGINT) AS v_early_x100,
       CAST(ql.qs[qi] AS BIGINT) AS v_late_x100,
       CAST(ql.qs[qi] - qe.qs[qi] AS BIGINT) AS shift_x100
FROM qe, ql, i ORDER BY q_x10
"""


def events_value_welch_ttest(sf_dir: str):
    """Welch's unequal-variance t-test between WEEKEND and WEEKDAY
    event values — the A/B-significance primitive over a calendar
    split. Exactness: per-side (n, sum, sum-of-squares) are integer
    partials tree-reduced in one scan (n*ss - s^2 exceeds int64 at
    extreme scale — Python big ints here, HUGEINT in the oracle), and
    every emitted float is ONE fixed expression: a_i = (n*ss - s^2) /
    (n^2 (n-1)) fuses v_i/n_i, t = (m_w - m_d)/sqrt(a_w + a_d), df by
    Welch-Satterthwaite in the same op order as the SQL.
    Output: (n_weekend, n_weekday, mean_we_x100, mean_wd_x100,
    t_welch, df_welch)."""
    cols = ("n_weekend", "n_weekday", "mean_we_x100", "mean_wd_x100",
            "t_welch", "df_welch")
    empty = pd.DataFrame({c: pd.Series(
        dtype="int64" if c.startswith("n_") else "float64")
        for c in cols})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        days = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        we = np.isin((days + 4) % 7, (0, 6))   # Sunday=0 .. Saturday=6
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        rows = []
        for side, m in ((1, we), (0, ~we)):
            if m.any():
                vv = v[m]
                rows.append((side, len(vv), int(vv.sum()),
                             int((vv * vv).sum())))
        return pa.Table.from_pydict(
            {"side": pa.array([r[0] for r in rows], type=pa.int8()),
             "n": pa.array([r[1] for r in rows], type=pa.int64()),
             "s": pa.array([r[2] for r in rows], type=pa.int64()),
             "ss": pa.array([r[3] for r in rows], type=pa.int64())})

    parts = (rd.read_parquet(_pq(sf_dir, "events"),
                             columns=["ts", "value"])
             .map_batches(partial, batch_format="pyarrow",
                          batch_size=None).to_pandas())
    if parts.empty:
        return empty
    agg = parts.groupby("side").sum()

    def mom(side):
        if side not in agg.index:
            return 0, 0, 0
        r = agg.loc[side]
        return int(r["n"]), int(r["s"]), int(r["ss"])

    nw, sw, ssw = mom(1)
    nd, sd_, ssd = mom(0)
    if nw < 2 or nd < 2:
        return empty
    aw = float(nw * ssw - sw * sw) / ((float(nw) * nw) * (nw - 1.0))
    ad = float(nd * ssd - sd_ * sd_) / ((float(nd) * nd) * (nd - 1.0))
    mw = float(sw) / nw
    md = float(sd_) / nd
    t = (mw - md) / float(np.sqrt(aw + ad))
    df = ((aw + ad) * (aw + ad)) \
        / ((aw * aw) / (nw - 1.0) + (ad * ad) / (nd - 1.0))
    return pd.DataFrame({"n_weekend": [np.int64(nw)],
                         "n_weekday": [np.int64(nd)],
                         "mean_we_x100": [mw], "mean_wd_x100": [md],
                         "t_welch": [t], "df_welch": [df]})


WELCH_SQL = """
WITH e AS (
  SELECT CAST(round(value * 100.0) AS BIGINT) AS v,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we
  FROM events),
m AS (
  SELECT CAST(COUNT(*) FILTER (WHERE we = 1) AS BIGINT) AS nw,
         CAST(SUM(v) FILTER (WHERE we = 1) AS BIGINT) AS sw,
         SUM(v * v) FILTER (WHERE we = 1) AS ssw,
         CAST(COUNT(*) FILTER (WHERE we = 0) AS BIGINT) AS nd,
         CAST(SUM(v) FILTER (WHERE we = 0) AS BIGINT) AS sd,
         SUM(v * v) FILTER (WHERE we = 0) AS ssd
  FROM e),
x AS (
  SELECT nw, nd,
         CAST(nw * ssw - sw * sw AS DOUBLE)
             / ((CAST(nw AS DOUBLE) * nw) * (nw - 1.0)) AS aw,
         CAST(nd * ssd - sd * sd AS DOUBLE)
             / ((CAST(nd AS DOUBLE) * nd) * (nd - 1.0)) AS ad,
         CAST(sw AS DOUBLE) / nw AS mw,
         CAST(sd AS DOUBLE) / nd AS md
  FROM m WHERE nw >= 2 AND nd >= 2)
SELECT nw AS n_weekend, nd AS n_weekday,
       mw AS mean_we_x100, md AS mean_wd_x100,
       (mw - md) / sqrt(aw + ad) AS t_welch,
       ((aw + ad) * (aw + ad))
           / ((aw * aw) / (nw - 1.0) + (ad * ad) / (nd - 1.0))
           AS df_welch
FROM x
"""


def events_value_anova(sf_dir: str):
    """One-way ANOVA of event value (cents) across event types — the
    k-group generalization of the Welch A/B test above. Exactness: the
    only inputs are per-group integer moments (n, sum, sum-of-squares;
    Python big ints mirror the oracle's HUGEINT), and every float is one
    fixed IEEE expression; the single cross-group float sum
    T = sum_i (s_i^2 / n_i) accumulates LEFT-TO-RIGHT over types sorted
    ascending, matching DuckDB's ``list_aggregate(list(... ORDER BY
    event_type), 'sum')`` (verified sequential). Scale shape: one
    streaming pass emits per-batch (type, n, s, ss) partials; the driver
    reduces a <= k x batches table.
    Output: (k, n, ssb, ssw, f_stat, eta_sq)."""
    cols = ("k", "n", "ssb", "ssw", "f_stat", "eta_sq")
    empty = pd.DataFrame({c: pd.Series(dtype="int64" if c in ("k", "n")
                                       else "float64") for c in cols})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        types = batch["event_type"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(types, return_inverse=True)
        n = np.bincount(inv)
        s = np.zeros(len(uniq), dtype=np.int64)
        ss = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, v)
        np.add.at(ss, inv, v * v)      # v ~ 1e5 cents: v*v < 1e10, safe
        return pa.Table.from_pydict({
            "event_type": pa.array(uniq),
            "n": pa.array(n, type=pa.int64()),
            "s": pa.array(s, type=pa.int64()),
            "ss": pa.array(ss, type=pa.int64())})

    parts = (rd.read_parquet(_pq(sf_dir, "events"),
                             columns=["event_type", "value"])
             .map_batches(partial, batch_format="pyarrow",
                          batch_size=None).to_pandas())
    if parts.empty:
        return empty
    # python-int reduce: per-group sums never overflow at any corpus size
    g = parts.groupby("event_type", sort=True)[["n", "s", "ss"]] \
        .agg(lambda col: sum(int(x) for x in col))
    k, nt = len(g), int(g["n"].sum())
    if k < 2 or nt <= k:
        return empty
    st = int(g["s"].sum())
    u = float(sum(int(x) for x in g["ss"]))
    tt = 0.0
    for _, r in g.iterrows():                  # sorted by type: l-t-r sum
        tt += float(int(r["s"]) * int(r["s"])) / int(r["n"])
    ssb = tt - float(st * st) / nt
    ssw = u - tt

    def div(a: float, b: float) -> float:
        return a / b if b != 0.0 else float("nan")   # DuckDB: x/0.0 = NaN

    f = div(ssb / (k - 1.0), ssw / (nt - k * 1.0))
    return pd.DataFrame({"k": [np.int64(k)], "n": [np.int64(nt)],
                         "ssb": [ssb], "ssw": [ssw], "f_stat": [f],
                         "eta_sq": [div(ssb, ssb + ssw)]})


ANOVA_SQL = """
WITH e AS (
  SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS v
  FROM events),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         SUM(CAST(v AS HUGEINT) * v) AS ss
  FROM e GROUP BY event_type),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nt,
         CAST(SUM(s) AS BIGINT) AS st,
         CAST(SUM(ss) AS DOUBLE) AS u,
         list_aggregate(list(CAST(CAST(s AS HUGEINT) * s AS DOUBLE) / n
                             ORDER BY event_type), 'sum') AS tt
  FROM g),
x AS (
  SELECT k, nt,
         tt - CAST(CAST(st AS HUGEINT) * st AS DOUBLE) / nt AS ssb,
         u - tt AS ssw
  FROM t WHERE k >= 2 AND nt > k)
SELECT k, nt AS n, ssb, ssw,
       (ssb / (k - 1.0)) / (ssw / (nt - k * 1.0)) AS f_stat,
       ssb / (ssb + ssw) AS eta_sq
FROM x
"""


_HOUR_US = 3_600_000_000
_SURV_SENTINEL = np.iinfo(np.int64).max


def events_user_survival(sf_dir: str):
    """Kaplan-Meier time-to-first-purchase: per user, the event is the
    first 'purchase' at t = hours since their first event of any type;
    users who never purchase are right-censored at their last observed
    event. One step row per hour with >= 1 purchase: (t_hours, n_risk,
    n_events, surv), surv = KM product over steps <= t. Exactness:
    counts are integer; each factor is ONE double expression
    1.0 - d/n and the running product multiplies ascending-hour
    left-to-right — numpy ``cumprod`` and the oracle's ordered
    ``list_aggregate(..., 'product')`` prefix perform the identical
    multiplication sequence.

    Scale shape: one user-keyed aggregate (block-level partial
    min/max/min-purchase) builds the per-user duration table; the
    curve is computed from hour-histogram partials (<= batches x hours
    rows) — the driver never holds per-user rows."""
    empty = pd.DataFrame({
        "t_hours": pd.Series(dtype="int64"),
        "n_risk": pd.Series(dtype="int64"),
        "n_events": pd.Series(dtype="int64"),
        "surv": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "events"):
        return empty
    from ray.data.aggregate import Max, Min

    def proj(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64())
        is_p = pc.equal(b["event_type"], "purchase")
        return pa.Table.from_pydict({
            "user_id": b["user_id"], "us": us,
            "pus": pc.if_else(is_p, us,
                              pa.scalar(_SURV_SENTINEL, pa.int64()))})

    users = (rd.read_parquet(_pq(sf_dir, "events"),
                             columns=["user_id", "ts", "event_type"])
             .map_batches(proj, batch_format="pyarrow", batch_size=None)
             .groupby("user_id")
             .aggregate(Min("us"), Max("us"), Min("pus")))

    def hour_partials(batch: pa.Table) -> pa.Table:
        fi = batch["min(us)"].to_numpy(zero_copy_only=False)
        la = batch["max(us)"].to_numpy(zero_copy_only=False)
        pu = batch["min(pus)"].to_numpy(zero_copy_only=False)
        dead = pu != _SURV_SENTINEL
        t = np.where(dead, (np.minimum(pu, la) - fi), la - fi) // _HOUR_US
        uniq, inv = np.unique(t, return_inverse=True)
        return pa.Table.from_pydict({
            "t": pa.array(uniq, pa.int64()),
            "n_all": pa.array(np.bincount(inv), pa.int64()),
            "n_dead": pa.array(
                np.bincount(inv, weights=dead).astype(np.int64),
                pa.int64())})

    hist = (users.map_batches(hour_partials, batch_format="pyarrow",
                              batch_size=None)
            .to_pandas().groupby("t", sort=True).sum())
    if hist.empty:
        return empty
    t = hist.index.to_numpy(np.int64)
    n_all = hist["n_all"].to_numpy(np.int64)
    d = hist["n_dead"].to_numpy(np.int64)
    # at-risk at t = users whose duration >= t (suffix sum, all users)
    n_risk = np.cumsum(n_all[::-1])[::-1]
    steps = d > 0
    factors = 1.0 - d[steps].astype(np.float64) / n_risk[steps]
    return pd.DataFrame({
        "t_hours": t[steps], "n_risk": n_risk[steps],
        "n_events": d[steps], "surv": np.cumprod(factors)})


SURVIVAL_SQL = f"""
WITH u AS (
  SELECT user_id, epoch_us(MIN(ts)) AS fi, epoch_us(MAX(ts)) AS la,
         epoch_us(MIN(ts) FILTER (WHERE event_type = 'purchase')) AS pu
  FROM events GROUP BY user_id),
lt AS (
  SELECT CASE WHEN pu IS NOT NULL
              THEN (LEAST(pu, la) - fi) // {_HOUR_US}
              ELSE (la - fi) // {_HOUR_US} END AS t,
         CASE WHEN pu IS NOT NULL THEN 1 ELSE 0 END AS dead
  FROM u),
steps AS (
  SELECT t, CAST(COUNT(*) FILTER (WHERE dead = 1) AS BIGINT) AS d_t
  FROM lt GROUP BY t),
sel AS (
  SELECT s.t, s.d_t,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lt WHERE lt.t >= s.t)
             AS n_t
  FROM steps s WHERE s.d_t > 0)
SELECT s1.t AS t_hours, s1.n_t AS n_risk, s1.d_t AS n_events,
       (SELECT list_aggregate(
                   list(1.0 - CAST(s2.d_t AS DOUBLE) / s2.n_t
                        ORDER BY s2.t), 'product')
        FROM sel s2 WHERE s2.t <= s1.t) AS surv
FROM sel s1
ORDER BY t_hours
"""


def events_value_did(sf_dir: str):
    """Difference-in-differences estimate of event value: treatment =
    odd user_id (the deterministic assignment stand-in for an
    experiment flag), periods split at the global time midpoint (the
    drift-tier convention). DiD = (treat_post - treat_pre) -
    (ctrl_post - ctrl_pre) over cell means — the experimentation
    readout next to the Welch A/B test. Exactness: per-cell (n, sum)
    integer partials; each mean is ONE double division and the
    estimate one fixed expression.
    Output: (n_c0, n_c1, n_t0, n_t1, mean_c0_x100, mean_c1_x100,
    mean_t0_x100, mean_t1_x100, did_x100)."""
    cols = ("n_c0", "n_c1", "n_t0", "n_t1", "mean_c0_x100",
            "mean_c1_x100", "mean_t0_x100", "mean_t1_x100", "did_x100")
    empty = pd.DataFrame({c: pd.Series(
        dtype="int64" if c.startswith("n_") else "float64")
        for c in cols})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["ts", "user_id", "value"])

    def minmax(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.Table.from_pydict({"lo": [int(ts.min())],
                                     "hi": [int(ts.max())]})

    mm = ds.map_batches(minmax, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    if mm.empty:
        return empty
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    mid = lo + (hi - lo) // 2

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        treat = (batch["user_id"].to_numpy(zero_copy_only=False)
                 % 2).astype(np.int64)
        post = (ts > mid).astype(np.int64)
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        cell = treat * 2 + post
        n = np.bincount(cell, minlength=4)
        s = np.zeros(4, dtype=np.int64)
        np.add.at(s, cell, v)
        return pa.Table.from_pydict({
            "cell": pa.array(np.arange(4), pa.int64()),
            "n": pa.array(n, pa.int64()),
            "s": pa.array(s, pa.int64())})

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=None).to_pandas()
             .groupby("cell")[["n", "s"]]
             .agg(lambda col: sum(int(x) for x in col)))
    n = [int(parts["n"].get(c, 0)) for c in range(4)]
    if any(x == 0 for x in n):
        return empty
    m = [float(int(parts["s"].loc[c])) / n[c] for c in range(4)]
    return pd.DataFrame({
        "n_c0": [np.int64(n[0])], "n_c1": [np.int64(n[1])],
        "n_t0": [np.int64(n[2])], "n_t1": [np.int64(n[3])],
        "mean_c0_x100": [m[0]], "mean_c1_x100": [m[1]],
        "mean_t0_x100": [m[2]], "mean_t1_x100": [m[3]],
        "did_x100": [(m[3] - m[2]) - (m[1] - m[0])]})


DID_SQL = """
WITH b AS (
  SELECT epoch_us(MIN(ts)) AS lo,
         epoch_us(MIN(ts))
           + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2 AS mid
  FROM events),
e AS (
  SELECT CAST(user_id % 2 AS BIGINT) * 2
           + CASE WHEN epoch_us(ts) > (SELECT mid FROM b)
                  THEN 1 ELSE 0 END AS cell,
         CAST(round(value * 100.0) AS BIGINT) AS v
  FROM events),
g AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s
  FROM e GROUP BY cell),
x AS (
  SELECT MAX(CASE WHEN cell = 0 THEN n END) AS n_c0,
         MAX(CASE WHEN cell = 1 THEN n END) AS n_c1,
         MAX(CASE WHEN cell = 2 THEN n END) AS n_t0,
         MAX(CASE WHEN cell = 3 THEN n END) AS n_t1,
         MAX(CASE WHEN cell = 0 THEN CAST(s AS DOUBLE) / n END) AS m0,
         MAX(CASE WHEN cell = 1 THEN CAST(s AS DOUBLE) / n END) AS m1,
         MAX(CASE WHEN cell = 2 THEN CAST(s AS DOUBLE) / n END) AS m2,
         MAX(CASE WHEN cell = 3 THEN CAST(s AS DOUBLE) / n END) AS m3
  FROM g)
SELECT n_c0, n_c1, n_t0, n_t1,
       m0 AS mean_c0_x100, m1 AS mean_c1_x100,
       m2 AS mean_t0_x100, m3 AS mean_t1_x100,
       (m3 - m2) - (m1 - m0) AS did_x100
FROM x
WHERE n_c0 IS NOT NULL AND n_c1 IS NOT NULL
  AND n_t0 IS NOT NULL AND n_t1 IS NOT NULL
"""


def events_value_cuped(sf_dir: str):
    """CUPED variance-reduced treatment effect (Deng et al. 2013):
    per-user PRE-period value total X (covariate) and POST-period
    total Y, pooled theta = Cov(X,Y)/Var(X), adjusted effect =
    mean_t(Y - theta*(X - Xbar)) - mean_c(Y - theta*(X - Xbar)).
    Treatment = odd user_id, period split at the global midpoint (the
    DiD conventions). Users missing a period contribute 0 to that
    period. Exactness: every moment (n, Sx, Sy, Sxy, Sxx per arm) is
    an exact integer (python big ints / HUGEINT); theta, Xbar and both
    effects are fixed single float expressions.

    Scale shape: one user-keyed coarse partition exchange builds
    per-user (x, y) AND reduces them to per-arm moment partials inside
    the partition — the driver only ever sums 2 x partitions moment
    rows, never a user table.
    Output: (n_c, n_t, theta, raw_effect_x100, cuped_effect_x100)."""
    cols = ("n_c", "n_t", "theta", "raw_effect_x100",
            "cuped_effect_x100")
    empty = pd.DataFrame({c: pd.Series(
        dtype="int64" if c.startswith("n_") else "float64")
        for c in cols})
    if _table_empty(sf_dir, "events"):
        return empty
    ds = rd.read_parquet(_pq(sf_dir, "events"),
                         columns=["ts", "user_id", "value"])

    def minmax(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        return pa.Table.from_pydict({"lo": [int(ts.min())],
                                     "hi": [int(ts.max())]})

    mm = ds.map_batches(minmax, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    if mm.empty:
        return empty
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    mid = lo + (hi - lo) // 2

    def per_user_xy(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        pre = ts <= mid
        df = pd.DataFrame({"user_id": uid,
                           "x": np.where(pre, v, 0),
                           "y": np.where(pre, 0, v)})
        return _from_pandas(df.groupby("user_id", as_index=False).sum())

    def arm_moments(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby("user_id", as_index=False)[["x", "y"]].sum()
        arm = (u["user_id"] % 2).to_numpy(np.int64)
        rows = []
        for a in (0, 1):
            sub = u[arm == a]
            if len(sub) == 0:
                continue
            x = [int(t) for t in sub["x"]]
            y = [int(t) for t in sub["y"]]
            rows.append({"arm": a, "n": len(sub), "sx": sum(x),
                         "sy": sum(y),
                         "sxy": sum(a_ * b_ for a_, b_ in zip(x, y)),
                         "sxx": sum(a_ * a_ for a_ in x)})
        return pd.DataFrame(rows, columns=["arm", "n", "sx", "sy",
                                           "sxy", "sxx"])

    parts = _coarse_partition_map(
        ds.map_batches(per_user_xy, batch_format="pyarrow",
                       batch_size=None),
        "user_id", arm_moments).to_pandas()
    if parts.empty:
        return empty
    agg = parts.groupby("arm").agg(
        lambda col: sum(int(t) for t in col))
    if 0 not in agg.index or 1 not in agg.index:
        return empty
    n_c, n_t = int(agg.loc[0, "n"]), int(agg.loc[1, "n"])
    n = n_c + n_t
    sx = int(agg.loc[0, "sx"]) + int(agg.loc[1, "sx"])
    sy = int(agg.loc[0, "sy"]) + int(agg.loc[1, "sy"])
    sxy = int(agg.loc[0, "sxy"]) + int(agg.loc[1, "sxy"])
    sxx = int(agg.loc[0, "sxx"]) + int(agg.loc[1, "sxx"])
    var_num = n * sxx - sx * sx
    if var_num == 0:
        return empty
    theta = float(n * sxy - sx * sy) / float(var_num)
    xbar = float(sx) / n
    sy_t, sx_t = int(agg.loc[1, "sy"]), int(agg.loc[1, "sx"])
    sy_c, sx_c = int(agg.loc[0, "sy"]), int(agg.loc[0, "sx"])
    raw = float(sy_t) / n_t - float(sy_c) / n_c
    adj_t = (float(sy_t) - theta * (float(sx_t)
                                    - float(n_t) * xbar)) / n_t
    adj_c = (float(sy_c) - theta * (float(sx_c)
                                    - float(n_c) * xbar)) / n_c
    return pd.DataFrame({"n_c": [np.int64(n_c)], "n_t": [np.int64(n_t)],
                         "theta": [theta], "raw_effect_x100": [raw],
                         "cuped_effect_x100": [adj_t - adj_c]})


CUPED_SQL = """
WITH b AS (
  SELECT epoch_us(MIN(ts))
           + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2 AS mid
  FROM events),
u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN epoch_us(ts) <= (SELECT mid FROM b)
                       THEN CAST(round(value * 100.0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN epoch_us(ts) > (SELECT mid FROM b)
                       THEN CAST(round(value * 100.0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         CAST(COUNT(*) FILTER (WHERE user_id % 2 = 1) AS BIGINT) AS n_t,
         CAST(SUM(x) FILTER (WHERE user_id % 2 = 1) AS BIGINT) AS sx_t,
         CAST(SUM(y) FILTER (WHERE user_id % 2 = 1) AS BIGINT) AS sy_t
  FROM u),
x AS (
  SELECT n - n_t AS n_c, n_t,
         CAST(CAST(n AS HUGEINT) * sxy
              - CAST(sx AS HUGEINT) * sy AS DOUBLE)
           / CAST(CAST(n AS HUGEINT) * sxx
                  - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS theta,
         CAST(sx AS DOUBLE) / n AS xbar,
         sx - sx_t AS sx_c, sy - sy_t AS sy_c, sx_t, sy_t, n, sx
  FROM m
  WHERE n_t > 0 AND n - n_t > 0
    AND CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx <> 0)
SELECT n_c, n_t, theta,
       CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c
           AS raw_effect_x100,
       (CAST(sy_t AS DOUBLE)
          - theta * (CAST(sx_t AS DOUBLE) - CAST(n_t AS DOUBLE) * xbar))
         / n_t
       - (CAST(sy_c AS DOUBLE)
          - theta * (CAST(sx_c AS DOUBLE) - CAST(n_c AS DOUBLE) * xbar))
         / n_c AS cuped_effect_x100
FROM x
"""


def events_assignment_srm(sf_dir: str):
    """Sample-ratio-mismatch guardrail for the deterministic odd-user
    experiment assignment: distinct users per arm and the 1-dof
    chi-square GOF statistic against the expected 50/50 split,
    chi2 = (n_t - n_c)^2 / (n_t + n_c) — the first sanity check an
    experimentation readout (DiD/CUPED above) must pass. Exactness:
    counts are exact distinct-user integers (per-batch distinct
    partials, one user-keyed coarse reduce); chi2 is one float
    division. Output: (n_c, n_t, chi2_srm)."""
    empty = pd.DataFrame({"n_c": pd.Series(dtype="int64"),
                          "n_t": pd.Series(dtype="int64"),
                          "chi2_srm": pd.Series(dtype="float64")})
    if _table_empty(sf_dir, "events"):
        return empty

    def partial(batch: pa.Table) -> pa.Table:
        uid = np.unique(batch["user_id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64))
        return pa.Table.from_pydict({"user_id": pa.array(uid,
                                                         pa.int64())})

    def arm_counts(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].drop_duplicates()
        arm = (u % 2).to_numpy(np.int64)
        return pd.DataFrame({"arm": [0, 1],
                             "n": [int((arm == 0).sum()),
                                   int((arm == 1).sum())]})

    parts = _coarse_partition_map(
        rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None),
        "user_id", arm_counts).to_pandas()
    if parts.empty:
        return empty
    agg = parts.groupby("arm")["n"].sum()
    n_c, n_t = int(agg.get(0, 0)), int(agg.get(1, 0))
    if n_c + n_t == 0:
        return empty
    chi2 = float((n_t - n_c) * (n_t - n_c)) / (n_t + n_c)
    return pd.DataFrame({"n_c": [np.int64(n_c)], "n_t": [np.int64(n_t)],
                         "chi2_srm": [chi2]})


SRM_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
c AS (
  SELECT CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS n_c,
         CAST(COUNT(*) FILTER (WHERE user_id % 2 = 1) AS BIGINT) AS n_t
  FROM u)
SELECT n_c, n_t,
       CAST((n_t - n_c) * (n_t - n_c) AS DOUBLE) / (n_t + n_c)
           AS chi2_srm
FROM c WHERE n_c + n_t > 0
"""


STATS_QUERIES: dict[str, tuple] = {
    "events_assignment_srm": (events_assignment_srm, SRM_SQL),
    "events_value_cuped": (events_value_cuped, CUPED_SQL),
    "events_value_did": (events_value_did, DID_SQL),
    "events_qq_drift": (events_qq_drift, QQ_DRIFT_SQL),
    "events_value_welch_ttest": (events_value_welch_ttest, WELCH_SQL),
    "events_value_anova": (events_value_anova, ANOVA_SQL),
    "events_user_survival": (events_user_survival, SURVIVAL_SQL),
    "region_revenue_hhi": (region_revenue_hhi, HHI_SQL),
    "customer_lorenz_points": (customer_lorenz_points, LORENZ_SQL),
    "part_brand_keyness": (part_brand_keyness, KEYNESS_SQL),
    "events_hourly_rolling_median": (events_hourly_rolling_median,
                                     ROLLING_MEDIAN_SQL),
    "events_hourly_interp": (events_hourly_interp, INTERP_SQL),
    "events_value_drift_ks": (events_value_drift_ks, DRIFT_KS_SQL),
    "events_type_drift_tvd": (events_type_drift_tvd, DRIFT_TVD_SQL),
    "events_hourly_changepoint": (events_hourly_changepoint,
                                  CHANGEPOINT_SQL),
    "events_value_winsorized": (events_value_winsorized, WINSOR_SQL),
    "events_hourly_locf": (events_hourly_locf, LOCF_SQL),
    "events_time_rollup": (events_time_rollup, TIME_ROLLUP_SQL),
    "orders_benford_digits": (orders_benford_digits, BENFORD_SQL),
    "lineitem_ols2": (lineitem_ols2, OLS2_SQL),
    "events_hourly_ewma": (events_hourly_ewma, EWMA_SQL),
    "events_hourly_holt": (events_hourly_holt, HOLT_SQL),
    "events_type_gini_daily": (events_type_gini_daily, GINI_DAILY_SQL),
    "lineitem_weighted_median": (lineitem_weighted_median,
                                 WEIGHTED_MEDIAN_SQL),
    "events_hourly_holtwinters": (events_hourly_holtwinters,
                                  HOLTWINTERS_SQL),
    "events_markov_stationary": (events_markov_stationary, None),
    "events_type_dow_chisq": (events_type_dow_chisq, CHISQ_SQL),
    "events_hourly_acf": (events_hourly_acf, _acf_sql()),
    "lineitem_cov_matrix": (lineitem_cov_matrix, _cov_matrix_sql()),
    "customer_rfm_segments": (customer_rfm_segments, RFM_SQL),
    "events_dau_wau": (events_dau_wau, DAU_WAU_SQL),
    "nation_revenue_trend": (nation_revenue_trend, TREND_SQL),
    "events_value_percentiles_cont": (events_value_percentiles_cont,
                                      PCTL_SQL),
    "part_price_size_skyline": (part_price_size_skyline, SKYLINE_SQL),
    "part_name_fuzzy_pairs": (part_name_fuzzy_pairs, FUZZY_SQL),
    "part_name_entity_clusters": (part_name_entity_clusters,
                                  ENTITY_CLUSTERS_SQL),
    "events_debounced": (events_debounced, DEBOUNCE_SQL),
    "events_pattern_matches": (events_pattern_matches,
                               PATTERN_MATCHES_SQL),
    "events_value_trimmed_mean": (events_value_trimmed_mean,
                                  TRIMMED_MEAN_SQL),
    "events_value_zscore": (events_value_zscore, ZSCORE_SQL),
    "events_value_deciles": (events_value_deciles, _deciles_sql()),
    "events_feature_table": (events_feature_table, FEATURE_TABLE_SQL),
    "nation_revenue_share": (nation_revenue_share, REVENUE_SHARE_SQL),
    "nation_price_qty_corr": (nation_price_qty_corr, CORR_SQL),
    "events_user_modal_type": (events_user_modal_type, MODAL_TYPE_SQL),
    "events_user_interarrival": (events_user_interarrival,
                                 INTERARRIVAL_SQL),
    "orders_price_median_exact": (orders_price_median_exact,
                                  MEDIAN_EXACT_SQL),
    "orders_priority_median_exact": (orders_priority_median_exact,
                                     PRIORITY_MEDIAN_SQL),
}
