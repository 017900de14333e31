"""WebDataset tar shard sink/source: lossless round-trip, byte-level
determinism across parallelism, payload integrity, string-id corpora."""

import hashlib
import io
import os
import sys
import tarfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_extraction_ray.pipelines import spans as S
from pdf_extraction_ray.sources import wds as W

SF = "/root/testdata/sf0.001"


def _canon_spans(ds):
    rows = sorted(ds.to_pandas().to_dict("records"),
                  key=lambda r: str(r["doc_id"]))
    return [(str(r["doc_id"]),
             [(s["kind"], s["text"], s["media_ref"], int(s["offset"]))
              for s in r["spans"]]) for r in rows]


@pytest.mark.usefixtures("ray_session")
def test_roundtrip_lossless(tmp_path):
    src = S.interleaved_docs(SF)
    W.write_webdataset(src, str(tmp_path / "out"))
    back = W.read_webdataset(str(tmp_path / "out"))
    assert _canon_spans(S.interleaved_docs(SF)) == _canon_spans(back)


@pytest.mark.usefixtures("ray_session")
def test_shard_bytes_deterministic_across_parallelism(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = W.write_webdataset(S.interleaved_docs(SF), a)
    # different block structure feeding the same exchange
    m2 = W.write_webdataset(
        S.interleaved_docs(SF).repartition(7), b)
    pd.testing.assert_frame_equal(
        m1.drop(columns=["path"]), m2.drop(columns=["path"]))
    for p1, p2 in zip(m1["path"], m2["path"]):
        with open(p1, "rb") as f1, open(p2, "rb") as f2:
            assert hashlib.sha256(f1.read()).hexdigest() == \
                hashlib.sha256(f2.read()).hexdigest()


@pytest.mark.usefixtures("ray_session")
def test_payload_members_match_synth(tmp_path):
    from pdf_extraction_ray.stages.multimodal import synth_payload
    out = str(tmp_path / "out")
    W.write_webdataset(S.interleaved_docs(SF), out)
    tars = sorted(os.listdir(out))
    assert len(tars) == W.WDS_N_SHARDS
    checked = 0
    with tarfile.open(os.path.join(out, tars[0])) as tf:
        import json
        metas = {m.name[:-11]: json.loads(
            tf.extractfile(m).read().decode())
            for m in tf.getmembers() if m.name.endswith(".spans.json")}
        for m in tf.getmembers():
            if not m.name.endswith(".bin"):
                continue
            key, j = m.name.rsplit(".", 2)[0], int(
                m.name.rsplit(".", 2)[1])
            refs = [s["media_ref"] for s in metas[key]["spans"]
                    if s["kind"] == "image" and s["media_ref"]]
            assert tf.extractfile(m).read() == \
                synth_payload(refs[j], "image")
            checked += 1
            if checked >= 10:
                break
    assert checked > 0


@pytest.mark.usefixtures("ray_session")
def test_string_doc_ids_roundtrip(tmp_path):
    import ray.data as rd
    spans = [{"kind": "text", "text": "hello", "media_ref": "",
              "offset": 0},
             {"kind": "image", "text": "", "media_ref": "asset-1",
              "offset": 1}]
    tbl = pa.Table.from_pylist(
        [{"doc_id": "doc/alpha", "spans": spans},
         {"doc_id": "doc/beta", "spans": spans[:1]}],
        schema=pa.schema([("doc_id", pa.string()),
                          ("spans", pa.list_(S.SPAN_STRUCT))]))
    out = str(tmp_path / "out")
    W.write_webdataset(rd.from_arrow(tbl), out)
    back = W.read_webdataset(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(back["doc_id"]) == ["doc/alpha", "doc/beta"]
    assert back["spans"].iloc[0][1]["media_ref"] == "asset-1"


@pytest.mark.usefixtures("ray_session")
def test_resume_skips_existing_shards(tmp_path):
    """Delete one shard from a finished write; resume=True rewrites
    ONLY the missing shard (mtimes of survivors untouched) and the
    manifest — including sha256 — equals a full rewrite's."""
    out = str(tmp_path / "out")
    m1 = W.write_webdataset(S.interleaved_docs(SF), out)
    victim = m1["path"].iloc[3]
    os.remove(victim)
    mtimes = {p: os.path.getmtime(p) for p in m1["path"] if p != victim}
    m2 = W.write_webdataset(S.interleaved_docs(SF), out, resume=True)
    pd.testing.assert_frame_equal(m1, m2)
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t, f"{p} was rewritten"
    assert os.path.exists(victim)
