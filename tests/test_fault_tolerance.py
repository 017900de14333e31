"""Fault tolerance: a WORKER PROCESS that dies mid-task must be retried
by Ray with no effect on results — the property that lets a 256-node
run survive preempted workers. The injection is a hard ``os._exit``
(worker death = system failure, which Ray retries; a user exception is
correctly NOT retried), gated by a tmp-dir marker so the retried task
sees the marker and succeeds — exactly one death per test.

All injected callables are built INSIDE the tests so cloudpickle ships
them by value (module-level test helpers pickle by reference and are
unimportable on workers)."""

import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _make_flaky(marker: str, body):
    """Closure factory used inline by each test: die hard once (durable
    marker first), then behave as ``body`` on the retry."""
    def fn(batch):
        if not os.path.exists(marker):
            fd = os.open(marker, os.O_CREAT | os.O_WRONLY)
            os.fsync(fd)
            os.close(fd)
            os._exit(1)
        return body(batch)
    return fn


@pytest.mark.usefixtures("ray_session")
def test_map_batches_survives_worker_death(tmp_path):
    n = 10_000
    df = pd.DataFrame({"x": np.arange(n, dtype=np.int64)})
    marker = os.path.join(str(tmp_path), "died_once")

    def double(batch):
        out = batch.to_pandas()
        out["doubled"] = out["x"] * 2
        return out

    out = (rd.from_pandas(df).repartition(8)
           .map_batches(_make_flaky(marker, double),
                        batch_format="pyarrow", batch_size=None)
           .to_pandas())
    assert os.path.exists(marker)
    assert len(out) == n
    assert int(out["doubled"].sum()) == int(df["x"].sum()) * 2


@pytest.mark.usefixtures("ray_session")
def test_extraction_pipeline_survives_worker_death(tmp_path):
    """End-to-end: the flagship extract over a small corpus with one
    injected worker death still matches the golden spans exactly."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_extraction_ray.fixtures import ensure_corpus, golden_extract_table
    from pdf_extraction_ray.pipelines.extract import extract_pipeline
    from pdf_extraction_ray.sources.io import read_docs

    path = ensure_corpus("fault", 11, 120, shard_rows=40)
    docs = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(path + "/*.parquet"))])
    golden = {r["doc_id"]: r["spans"]
              for r in golden_extract_table(docs).to_pylist()}

    marker = os.path.join(str(tmp_path), "died_once")
    ds = read_docs(path).map_batches(
        _make_flaky(marker, lambda batch: batch),
        batch_format="pyarrow", batch_size=None)
    rows = extract_pipeline(ds).take_all()    # small corpus: test-only
    assert os.path.exists(marker)
    assert len(rows) == 120
    for r in rows:
        assert r["spans"] == golden[r["doc_id"]], r["doc_id"]


@pytest.mark.usefixtures("ray_session")
def test_exchange_query_survives_worker_death(tmp_path):
    """A query whose plan crosses a sort-based EXCHANGE (coarse groupby)
    must also survive worker death — retries on the map side of a
    shuffle exercise a different recovery path than plain map_batches.
    The flaky stage is injected before the exchange; the grouped result
    must equal the DuckDB oracle bit-exactly."""
    import duckdb

    from pdf_extraction_ray.pipelines.relational import (
        _coarse_partition_map)

    SF = "/root/testdata/sf0.001"
    marker = os.path.join(str(tmp_path), "died_once")

    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "value"]) \
        .map_batches(_make_flaky(marker, lambda b: b),
                     batch_format="pyarrow", batch_size=None)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False)["value"].count()
        return out.rename(columns={"value": "n"}).astype("int64")

    got = _coarse_partition_map(ds, "user_id", per_user).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert os.path.exists(marker)

    con = duckdb.connect()
    want = con.sql(f"""SELECT user_id, count(*) AS n
                       FROM '{SF}/events.parquet'
                       GROUP BY user_id ORDER BY user_id""").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# streaming-actor checkpoint/resume
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_stream_window_actor_checkpoint_resume(tmp_path):
    """A bucket preempted after 2 of 4 staged files resumes on a FRESH
    actor from the persisted snapshot (no event fed twice, none
    skipped): the resumed flush equals the uninterrupted run and the
    batch reference exactly."""
    import glob
    import json

    import ray
    from pdf_extraction_ray.pipelines.streaming import (
        WindowActor, _feed_bucket_checkpointed)

    bucket = str(tmp_path / "bucket=0")
    os.makedirs(bucket, exist_ok=True)
    t0 = pd.Timestamp("2024-03-01")
    rng = np.random.default_rng(4)
    all_rows = []
    for f in range(4):                   # time-ordered file segments
        n = 50
        ts = t0 + pd.to_timedelta(f * 3600 + rng.integers(
            0, 3600, size=n), unit="s")
        df = pd.DataFrame({
            "user_id": rng.integers(0, 6, size=n).astype(np.int64),
            "ts": ts.astype("datetime64[us]"),
            "value": rng.integers(0, 100, size=n) / 4.0})
        df.to_parquet(os.path.join(bucket, f"seg-{f}.parquet"))
        all_rows.append(df)

    # uninterrupted reference
    ck0 = str(tmp_path / "ck0.json")
    a0 = WindowActor.remote()
    ray.get(_feed_bucket_checkpointed.remote(bucket, a0, ck0))
    want = sorted(ray.get(a0.flush.remote()))

    # preempted run: feed only the first 2 files, then lose the actor
    part = str(tmp_path / "partial" / "bucket=0")
    os.makedirs(part, exist_ok=True)
    for f in sorted(glob.glob(bucket + "/*.parquet"))[:2]:
        os.link(f, os.path.join(part, os.path.basename(f)))
    ck = str(tmp_path / "ck.json")
    a1 = WindowActor.remote()
    ray.get(_feed_bucket_checkpointed.remote(part, a1, ck))
    ray.kill(a1)
    with open(ck) as fh:
        assert json.load(fh)["next_file"] == 2

    # fresh actor resumes from the snapshot over the FULL file list
    a2 = WindowActor.remote()
    ray.get(_feed_bucket_checkpointed.remote(bucket, a2, ck))
    got = sorted(ray.get(a2.flush.remote()))
    assert got == want

    # and equals the batch group-by reference
    full = pd.concat(all_rows)
    full["hour_ms"] = (full.ts.astype("datetime64[ms]").astype(np.int64)
                       // 3_600_000) * 3_600_000
    full["v"] = np.round(full.value.to_numpy() * 1e6).astype(np.int64)
    ref = full.groupby(["user_id", "hour_ms"]).agg(
        n=("v", "size"), s=("v", "sum")).reset_index()
    ref_rows = sorted((int(r.user_id), int(r.hour_ms), int(r.n),
                       int(r.s)) for r in ref.itertuples(index=False))
    assert got == ref_rows
