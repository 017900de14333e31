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
