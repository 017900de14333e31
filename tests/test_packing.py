"""Sequence packing: kernel vs serial reference, invariants, pipeline."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from pdf_extraction_ray.functions.packing import (
    pack_greedy, pack_greedy_reference)

SF = "/root/testdata/sf0.001"


@given(st.lists(st.integers(min_value=1, max_value=400), max_size=200),
       st.integers(min_value=50, max_value=300))
@settings(max_examples=200, deadline=None)
def test_kernel_matches_serial_reference(tokens, cap):
    got = pack_greedy(np.asarray(tokens, dtype=np.int64), cap)
    assert got.tolist() == pack_greedy_reference(tokens, cap)


def test_kernel_invariants():
    rng = np.random.default_rng(3)
    toks = rng.integers(1, 200, 5000)
    seq = pack_greedy(toks, 256)
    # sequence ids are contiguous and non-decreasing
    assert seq[0] == 0
    assert ((np.diff(seq) == 0) | (np.diff(seq) == 1)).all()
    # no sequence exceeds capacity unless it is a single oversize chunk
    import pandas as pd
    df = pd.DataFrame({"seq": seq, "t": toks})
    g = df.groupby("seq").agg(total=("t", "sum"), n=("t", "size"))
    bad = g[(g.total > 256) & (g.n > 1)]
    assert len(bad) == 0
    # greedy: the first chunk of every sequence did NOT fit in the
    # previous one
    starts = np.flatnonzero(np.diff(seq)) + 1
    prev_tot = g["total"].to_numpy()[:-1]
    assert (prev_tot + toks[starts] > 256).all()


def test_oversize_chunk_gets_own_sequence():
    seq = pack_greedy(np.array([10, 500, 10], dtype=np.int64), 256)
    assert seq.tolist() == [0, 1, 2]
    assert pack_greedy_reference([10, 500, 10], 256) == [0, 1, 2]


@pytest.mark.usefixtures("ray_session")
def test_pipeline_invariants_and_determinism():
    from pdf_extraction_ray.pipelines.packing import (
        packed_sequences, packing_stats, PACK_CAPACITY, _chunk_tokens)
    seqs = packed_sequences(SF).to_pandas()
    assert len(seqs) > 0
    # capacity respected (multi-chunk sequences)
    bad = seqs[(seqs.n_tokens > PACK_CAPACITY) & (seqs.n_chunks > 1)]
    assert len(bad) == 0
    # every chunk packed exactly once
    chunks = _chunk_tokens(SF).to_pandas()
    assert seqs["n_chunks"].sum() == len(chunks)
    assert seqs["n_tokens"].sum() == chunks["n_tokens"].sum()
    # deterministic under repartition (parallelism-independent)
    again = packed_sequences(SF).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(
        seqs.reset_index(drop=True), again.reset_index(drop=True))
    stats = packing_stats(SF)
    assert int(stats["n_sequences"].iloc[0]) == len(seqs)
    assert int(stats["total_chunks"].iloc[0]) == len(chunks)


@pytest.mark.usefixtures("ray_session")
def test_training_pipeline_composition():
    """The composed flow equals quality-filter + exact-dedup computed
    serially, then packed by the same kernel."""
    import duckdb
    import pandas as pd
    from pdf_extraction_ray.pipelines.packing import (
        training_pipeline_sequences, packed_sequences)
    from pdf_extraction_ray.pipelines.textops import (
        QUALITY_MIN_TOKENS, QUALITY_MAX_PUNCT_X1E6, QUALITY_MIN_MTL_X1E6)

    got = training_pipeline_sequences(SF).to_pandas()

    clean = duckdb.sql(rf"""
        WITH q AS (
          SELECT doc_id, text,
                 CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
                 CASE WHEN length(text) > 0 THEN
                   (CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS BIGINT) * 1000000)
                     // length(text) ELSE 0 END AS punct,
                 CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 0 THEN
                   (CAST(list_aggregate(list_transform(regexp_split_to_array(trim(text), '\s+'),
                                                       x -> length(x)), 'sum') AS BIGINT) * 1000000)
                     // len(regexp_split_to_array(trim(text), '\s+'))
                 ELSE 0 END AS mtl
          FROM read_parquet('{SF}/documents.parquet')),
        f AS (SELECT doc_id, text, md5(lower(trim(text))) AS h FROM q
              WHERE n_tokens >= {QUALITY_MIN_TOKENS}
                AND punct <= {QUALITY_MAX_PUNCT_X1E6}
                AND mtl >= {QUALITY_MIN_MTL_X1E6})
        SELECT doc_id, text FROM f
        WHERE doc_id = (SELECT MIN(doc_id) FROM f f2 WHERE f2.h = f.h)
        """).df()
    assert len(clean) > 0

    # pack the serial clean set through the distributed packer
    import ray.data as rd
    want = packed_sequences(
        SF, docs=rd.from_pandas(clean)).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))
    # composition dropped something (planted dups / low-quality docs)
    full = packed_sequences(SF).to_pandas()
    assert got["n_chunks"].sum() < full["n_chunks"].sum()


@pytest.mark.usefixtures("ray_session")
def test_length_buckets_batch_invariants(tmp_path):
    """Batches never span a length bucket, batch sizes are <= the cap
    with at most one tail per bucket, and assignment is deterministic
    across runs."""
    import os

    import pandas as pd

    from pdf_extraction_ray.pipelines.packing import (LEN_BATCH_SIZE,
                                                      docs_length_buckets)
    d = str(tmp_path)
    rng = np.random.default_rng(9)
    texts = [" ".join(["w"] * int(rng.integers(1, 300)))
             for _ in range(200)]
    pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                  "text": texts}).to_parquet(
        os.path.join(d, "documents.parquet"))
    a = docs_length_buckets(d)
    b = docs_length_buckets(d)
    pd.testing.assert_frame_equal(a, b)
    assert (a.bucket == np.floor(np.log2(np.maximum(a.n_tokens, 1)))
            .astype(np.int64)).all()
    sizes = a.groupby(["bucket", "batch_id"]).size()
    assert (sizes <= LEN_BATCH_SIZE).all()
    # at most one non-full batch (the tail) per bucket
    for bkt, grp in a.groupby("bucket"):
        s = grp.groupby("batch_id").size()
        assert (s[:-1] == LEN_BATCH_SIZE).all() if len(s) > 1 else True
