"""WARC container ingestion (the crawl-scale packaging of the web entry
point): record framing, per-record gzip members, HTTP status /
content-type filtering, and golden extraction equality vs the
parquet-fed path."""

import gzip
import os

import pytest

from pdf_extraction_ray.fixtures import golden_extract_table
from pdf_extraction_ray.fixtures.generator import generate_docs_table
from pdf_extraction_ray.pipelines import extract_pipeline
from pdf_extraction_ray.sources import read_docs
from pdf_extraction_ray.sources.warc import (
    ensure_warc_corpus, iter_warc_records, parse_warc, read_warc_docs,
    write_warc_file,
)

from test_html_ingest import canon


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_exact(tmp_path, compress):
    """Generator docs -> one multi-doc container -> parse: bit-exact
    after the float32 schema cast (same canon as the HTML round trip —
    the container adds framing, never content)."""
    rows = generate_docs_table(11, 0, 60, pathological_frac=0.02).to_pylist()
    ext = "warc.gz" if compress else "warc"
    p = str(tmp_path / f"part.{ext}")
    assert write_warc_file(rows, p, compress=compress) == 60
    parsed = parse_warc(open(p, "rb").read())
    assert len(parsed) == 60
    for got, want in zip(parsed, rows):       # record order == row order
        assert canon(got) == canon(want), want["doc_id"]


def test_record_mix_and_filtering(tmp_path):
    """The container interleaves warcinfo/request/response records;
    only 200 text/html responses produce documents. A planted 404 and a
    non-HTML asset record are dropped."""
    rows = generate_docs_table(3, 0, 4).to_pylist()
    p = str(tmp_path / "mix.warc")
    write_warc_file(rows, p, compress=False)
    data = open(p, "rb").read()
    types = [h.get("warc-type") for h, _ in iter_warc_records(data)]
    assert types[0] == "warcinfo"
    assert types.count("request") == 4 and types.count("response") == 4

    def rec(status, ctype, body=b"x"):
        http = (f"HTTP/1.1 {status}\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        return (b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: http://corpus.local/x\r\n"
                b"Content-Length: " + str(len(http)).encode() +
                b"\r\n\r\n" + http + b"\r\n\r\n")

    junk = rec("404 Not Found", "text/html") + \
        rec("200 OK", "image/png", b"\x89PNG")
    parsed = parse_warc(data + junk)
    assert len(parsed) == 4
    assert [r["doc_id"] for r in parsed] == [r["doc_id"] for r in rows]


def test_payload_cannot_break_framing(tmp_path):
    """Record scanning is Content-Length-driven: a document whose TEXT
    contains WARC-like lines must not desync the scanner."""
    rows = generate_docs_table(5, 0, 1).to_pylist()
    rows[0]["spans"] = [{"kind": "text",
                         "text": "WARC/1.0\r\nWARC-Type: response\r\n\r\n",
                         "media_ref": "", "offset": 0}]
    rows[0]["font_size"] = [10.0]
    rows[0]["page"] = [1]
    rows[0]["link_density"] = [0.0]
    rows[0]["bbox"] = [[0.1, 0.1, 0.9, 0.2]]
    rows[0]["regions"] = []
    p = str(tmp_path / "adv.warc")
    write_warc_file(rows + generate_docs_table(5, 1, 2).to_pylist(), p,
                    compress=False)
    parsed = parse_warc(open(p, "rb").read())
    assert len(parsed) == 3
    assert "WARC/1.0" in parsed[0]["spans"][0]["text"]


def test_gzip_members_are_individually_inflatable(tmp_path):
    """The .warc.gz layout is member-per-record (CommonCrawl's
    random-access convention): the FIRST member alone must inflate to a
    complete warcinfo record, not to the whole file."""
    rows = generate_docs_table(7, 0, 3).to_pylist()
    p = str(tmp_path / "m.warc.gz")
    write_warc_file(rows, p, compress=True)
    data = open(p, "rb").read()
    d = gzip.zlib.decompressobj(16 + gzip.zlib.MAX_WBITS)
    first = d.decompress(data)
    assert first.startswith(b"WARC/1.0")
    assert d.unused_data                        # more members follow
    headers, _ = next(iter_warc_records(first))
    assert headers["warc-type"] == "warcinfo"


@pytest.mark.usefixtures("ray_session")
def test_warc_golden_output_equality():
    """North rule over the WARC entry point: extract(read_warc_docs)
    span-for-span equals the golden extractor on the same generator
    corpus (multi-doc containers, gzip members)."""
    n = 120
    warc_dir = ensure_warc_corpus("t-warcgold", seed=31, n_docs=n,
                                  docs_per_file=32)
    assert len([f for f in os.listdir(warc_dir)
                if f.endswith(".warc.gz")]) == 4
    docs = generate_docs_table(31, 0, n)
    out = extract_pipeline(read_warc_docs(warc_dir)).take_all()
    golden = {r["doc_id"]: r["spans"]
              for r in golden_extract_table(docs).to_pylist()}

    def seq(spans):
        return [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in spans]

    assert len(out) == n
    for row in out:
        assert seq(row["spans"]) == seq(golden[row["doc_id"]]), row["doc_id"]


@pytest.mark.usefixtures("ray_session")
def test_read_docs_dispatches_warc_dirs():
    warc_dir = ensure_warc_corpus("t-warcdisp", seed=5, n_docs=12,
                                  docs_per_file=5)
    rows = read_docs(warc_dir).take_all()
    assert sorted(r["doc_id"] for r in rows) == [
        f"doc-{i:08d}" for i in range(12)]
