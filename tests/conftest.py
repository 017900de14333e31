import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray


@pytest.fixture(scope="session")
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t2_corpus():
    """Deterministic correctness corpus (cached across runs under /tmp)."""
    from pdf_extraction_ray.fixtures import ensure_corpus
    path = ensure_corpus("t2", 42, 2000, pathological_frac=0.01, shard_rows=500)
    docs = pa.concat_tables(
        [pq.read_table(f) for f in sorted(glob.glob(path + "/*.parquet"))])
    return path, docs
