"""Multi-node execution pinning (round-5 VERDICT item 1).

An emulated ``ray.cluster_utils.Cluster`` — head + 3 workers, each with
its own raylet and object store — runs the flagship extraction and a
wide cross-node exchange, and the outputs must be BYTE-identical to the
single-node run on the same input. Runs in a subprocess because a
cluster cannot share the process with the session-scoped local Ray
fixture.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import hashlib, json, sys
import ray
import pyarrow as pa


def canon_hash(tbl: pa.Table) -> str:
    order = pa.compute.sort_indices(tbl["doc_id"])
    tbl = tbl.take(order)
    h = hashlib.md5()
    for r in tbl.to_pylist():
        h.update(repr((r["doc_id"], r["spans"])).encode())
    return h.hexdigest()


def run_pipeline(sf):
    from pdf_extraction_ray.fixtures import ensure_corpus
    from pdf_extraction_ray.pipelines import extract_pipeline
    from pdf_extraction_ray.sources import read_docs
    corpus = ensure_corpus("mnode", 13, 2000, shard_rows=500)
    out = extract_pipeline(read_docs(corpus), batch_size=256)
    tbl = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow", batch_size=None)))
    # wide cross-node exchange on a real sf table
    import __ray_entry__
    wide = __ray_entry__.queries()["events_type_distinct_users"](sf)
    wide = wide.to_pandas() if hasattr(wide, "to_pandas") else wide
    return canon_hash(tbl), tbl.num_rows, wide.to_dict("records")


sf = "/root/testdata/sf0.001"

ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
single = run_pipeline(sf)
ray.shutdown()

from ray.cluster_utils import Cluster
cluster = Cluster(initialize_head=True, head_node_args={
    "num_cpus": 2, "object_store_memory": 192 << 20,
    "include_dashboard": False})
for _ in range(3):
    cluster.add_node(num_cpus=2, object_store_memory=192 << 20)
cluster.wait_for_nodes()
ray.init(address=cluster.address, logging_level="ERROR")
DataContext.get_current().enable_progress_bars = False
n_nodes = len([n for n in ray.nodes() if n["Alive"]])
multi = run_pipeline(sf)
ray.shutdown()
cluster.shutdown()

print(json.dumps({
    "n_nodes": n_nodes,
    "rows": single[1],
    "extract_equal": single[0] == multi[0],
    "wide_equal": single[2] == multi[2]}))
"""


_KILL_SCRIPT = r"""
import hashlib, json
import ray
import pyarrow as pa
from ray.cluster_utils import Cluster


def canon_hash(tbl):
    order = pa.compute.sort_indices(tbl["doc_id"])
    tbl = tbl.take(order)
    h = hashlib.md5()
    for r in tbl.to_pylist():
        h.update(repr((r["doc_id"], r["spans"])).encode())
    return h.hexdigest()


from pdf_extraction_ray.fixtures import ensure_corpus
corpus = ensure_corpus("mnode-ft", 23, 20000, shard_rows=1000)

ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from pdf_extraction_ray.pipelines import extract_pipeline
from pdf_extraction_ray.sources import read_docs
ref = pa.concat_tables(list(
    extract_pipeline(read_docs(corpus), batch_size=256)
    .iter_batches(batch_format="pyarrow", batch_size=None)))
ref_hash = canon_hash(ref)
ray.shutdown()

cluster = Cluster(initialize_head=True, head_node_args={
    "num_cpus": 2, "object_store_memory": 256 << 20,
    "include_dashboard": False})
workers = [cluster.add_node(num_cpus=2, object_store_memory=256 << 20)
           for _ in range(3)]
cluster.wait_for_nodes()
ray.init(address=cluster.address, logging_level="ERROR")
DataContext.get_current().enable_progress_bars = False
out = extract_pipeline(read_docs(corpus), batch_size=256)
tables, killed = [], False
for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
    tables.append(b)
    if not killed:                     # kill a worker MID-STREAM
        cluster.remove_node(workers[-1])
        killed = True
tbl = pa.concat_tables(tables)
ray.shutdown()
cluster.shutdown()
print(json.dumps({"killed": killed, "rows": tbl.num_rows,
                  "equal": canon_hash(tbl) == ref_hash}))
"""


def test_multinode_survives_worker_loss_mid_stream():
    """Losing a WORKER NODE mid-execution must not lose or corrupt a
    single row: Ray reconstructs the dead node's objects by lineage
    and the streamed output stays byte-identical to a clean
    single-node run — the per-partition recomputability the 100x
    deployment counts on (node loss is routine at 256 nodes)."""
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    env.pop("RAY_ADDRESS", None)
    res = subprocess.run([sys.executable, "-c", _KILL_SCRIPT], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["killed"]
    assert out["rows"] == 20000
    assert out["equal"], "output drifted after worker-node loss"


def test_multinode_output_byte_identical():
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get(
                   "PYTHONPATH", ""))
    env.pop("RAY_ADDRESS", None)   # the script manages its own sessions
    res = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["n_nodes"] == 4
    assert out["rows"] == 2000
    assert out["extract_equal"], "multi-node extraction output drifted"
    assert out["wide_equal"], "multi-node wide exchange drifted"
