"""read_docs / write_docs format dispatch — the Lance branch can't run
in this image (no lance reader), so these tests pin the DISPATCH
contract: a .lance path must route to ray.data.read_lance when it
exists and fail loudly (not fall back silently) when it doesn't."""

import os

import pytest

import ray.data

from pdf_extraction_ray.sources.io import read_docs, write_docs


def test_lance_path_routes_to_read_lance(monkeypatch, tmp_path):
    calls = {}

    def fake_read_lance(path, **kwargs):
        calls["path"] = path
        calls["kwargs"] = kwargs
        return "LANCE_DS"

    monkeypatch.setattr(ray.data, "read_lance", fake_read_lance,
                        raising=False)
    assert read_docs("/data/corpus.lance", columns=["doc_id"]) == "LANCE_DS"
    assert calls["path"] == "/data/corpus.lance"
    assert calls["kwargs"] == {"columns": ["doc_id"]}


def test_lance_versions_dir_routes_to_read_lance(monkeypatch, tmp_path):
    d = tmp_path / "corpus"
    (d / "_versions").mkdir(parents=True)
    monkeypatch.setattr(ray.data, "read_lance",
                        lambda path, **kw: ("LANCE_DS", path),
                        raising=False)
    assert read_docs(str(d)) == ("LANCE_DS", str(d))


def test_lance_path_without_reader_raises(monkeypatch):
    if hasattr(ray.data, "read_lance"):
        monkeypatch.delattr(ray.data, "read_lance")
    with pytest.raises(RuntimeError, match="lance reader unavailable"):
        read_docs("/data/corpus.lance")


def test_empty_parquet_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="no parquet shards"):
        read_docs(str(tmp_path))


def test_write_lance_routes_to_writer():
    class FakeDS:
        def __init__(self):
            self.written = None

        def write_lance(self, path, **kw):
            self.written = path

        def write_parquet(self, path, **kw):
            raise AssertionError("must not fall back to parquet")

    ds = FakeDS()
    write_docs(ds, "/out/result.lance")
    assert ds.written == "/out/result.lance"


def test_write_lance_without_writer_raises():
    class NoLanceDS:
        def write_parquet(self, path, **kw):
            raise AssertionError("must not fall back to parquet")

    with pytest.raises(RuntimeError, match="lance writer unavailable"):
        write_docs(NoLanceDS(), "/out/result.lance")


@pytest.mark.usefixtures("ray_session")
def test_parquet_roundtrip_through_write_docs(tmp_path):
    import pandas as pd
    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]}) \
        .to_parquet(src / "part0.parquet")
    ds = read_docs(str(src))
    out = tmp_path / "out"
    write_docs(ds, str(out))
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    back = read_docs(str(out)).to_pandas().sort_values("doc_id")
    assert list(back["text"]) == ["a", "b"]


@pytest.mark.usefixtures("ray_session")
def test_schema_drift_unifies_with_nulls(tmp_path):
    """Shards written before/after a column was added must read as ONE
    dataset with nulls for the missing column (mid-ingest schema
    evolution is routine at scale)."""
    import pandas as pd
    d = tmp_path / "drift"
    d.mkdir()
    pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"],
                  "lang": ["en", "fr"]}).to_parquet(d / "p0.parquet")
    pd.DataFrame({"doc_id": [3], "text": ["c"]}) \
        .to_parquet(d / "p1.parquet")
    df = read_docs(str(d)).to_pandas().sort_values("doc_id")
    assert list(df["doc_id"]) == [1, 2, 3]
    assert df["lang"].isna().sum() == 1


@pytest.mark.usefixtures("ray_session")
def test_compact_shards_merges_small_files(tmp_path):
    """120 tiny shards -> a handful of target-sized files with content
    (including drifted-schema nulls) preserved."""
    import pandas as pd
    from pdf_extraction_ray.sources.io import compact_shards

    src = tmp_path / "tiny"
    src.mkdir()
    for i in range(120):
        pd.DataFrame({"doc_id": [i], "text": [f"t{i}"]}) \
            .to_parquet(src / f"p{i:03d}.parquet")
    out = tmp_path / "compact"
    n_files = compact_shards(str(src), str(out), target_rows=50)
    assert 1 <= n_files <= 4, n_files
    back = read_docs(str(out)).to_pandas().sort_values("doc_id")
    assert list(back["doc_id"]) == list(range(120))

    empty_out = tmp_path / "empty_out"
    esrc = tmp_path / "empty_src"
    esrc.mkdir()
    pd.DataFrame({"doc_id": pd.Series(dtype="int64")}) \
        .to_parquet(esrc / "p0.parquet")
    assert compact_shards(str(esrc), str(empty_out)) == 0


def test_lance_roundtrip_when_lib_present(ray_session, tmp_path):
    """Real Lance round trip of the full interleaved DOCS_SCHEMA
    (VERDICT r2 item 9). Skipped in this image (no ``lance``); the
    moment the library lands in the container, the driver's named input
    format is exercised end-to-end with zero code change."""
    pytest.importorskip("lance")
    import pyarrow as pa

    from pdf_extraction_ray.fixtures.generator import generate_docs_table
    from pdf_extraction_ray.sources.io import write_docs

    docs = generate_docs_table(9, 0, 60)
    path = str(tmp_path / "corpus.lance")
    ds = ray.data.from_arrow(docs)
    if not hasattr(ds, "write_lance"):
        pytest.skip("ray.data Dataset lacks write_lance in this build")
    write_docs(ds, path)
    back = read_docs(path).take_all()
    assert len(back) == 60
    got = pa.Table.from_pylist(back, schema=docs.schema)
    assert got.sort_by("doc_id").equals(docs.sort_by("doc_id"))
