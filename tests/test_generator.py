"""Generator determinism + corpus content guarantees (FIXTURES.md)."""

from pdf_extraction_ray.fixtures.generator import generate_doc, generate_docs_table


def test_pure_function_of_seed_and_index():
    assert generate_doc(42, 7) == generate_doc(42, 7)
    assert generate_doc(42, 7) != generate_doc(43, 7)


def test_sharding_independence():
    # content depends only on (seed, index), never on shard layout
    a = generate_docs_table(42, 0, 50).to_pylist()
    b = (generate_docs_table(42, 0, 20).to_pylist()
         + generate_docs_table(42, 20, 30).to_pylist())
    assert a == b


def test_boundary_cases_present():
    tbl = generate_docs_table(42, 0, 300).to_pylist()
    assert any(len(d["spans"]) == 0 for d in tbl), "empty docs"
    assert any(len(d["spans"]) == 1 for d in tbl), "single-span docs"
    assert any(d["regions"] for d in tbl), "vector regions"
    assert any(len(d["regions"]) > 1 for d in tbl), "multi-region docs"
    assert any(s["kind"] == "image" for d in tbl for s in d["spans"])
    assert any(s["kind"] == "boilerplate" for d in tbl for s in d["spans"])
    # shuffled span order exists (offsets not monotonically increasing)
    def shuffled(d):
        offs = [s["offset"] for s in d["spans"]]
        return offs != sorted(offs)
    assert any(shuffled(d) for d in tbl), "shuffled docs"
    # parallel columns stay aligned
    for d in tbl:
        n = len(d["spans"])
        assert len(d["font_size"]) == len(d["page"]) == n
        assert len(d["link_density"]) == len(d["bbox"]) == n
