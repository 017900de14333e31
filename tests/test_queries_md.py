"""QUERIES.md is GENERATED from the registry (VERDICT r3 item 8): this
test regenerates it in-memory and fails on any drift — and rewrites the
file on mismatch so the fix is just committing the diff."""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_md_matches_registry():
    from pdf_extraction_ray.registry import (all_queries,
                                             generate_queries_md)
    want = generate_queries_md()
    path = os.path.join(REPO, "QUERIES.md")
    have = open(path).read() if os.path.exists(path) else ""
    if have != want:
        with open(path, "w") as f:
            f.write(want)
        raise AssertionError(
            "QUERIES.md drifted from the registry — regenerated, "
            "commit the updated file")
    # sanity: the index covers the whole driver contract
    n = len(all_queries())
    assert want.count("\n| ") == n + 1          # header row + n queries
    assert f"{n} queries" in want


def test_queries_md_impl_paths_exist():
    from pdf_extraction_ray.registry import generate_queries_md
    md = generate_queries_md()
    assert "`?`" not in md          # every query resolved to file:line
    for line in md.splitlines():
        if not line.startswith("| ") or line.startswith("| query"):
            continue
        impl = line.split("|")[3].strip().strip("`")
        src = impl.rsplit(":", 1)[0]
        assert os.path.exists(os.path.join(REPO, src)), impl
