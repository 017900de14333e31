import pyarrow as pa

from pdf_extraction_ray.schema import OUT_SCHEMA
from pdf_extraction_ray.stages.hierarchy import hierarchy_batch


def _doc(doc_id, spans):
    return {"doc_id": doc_id,
            "spans": [{"kind": k, "text": "t", "media_ref": "", "offset": o}
                      for k, o in spans]}


def test_parent_is_nearest_preceding_title():
    t = pa.Table.from_pylist([
        _doc("d1", [("title", 0), ("paragraph", 10), ("table", 20),
                    ("title", 30), ("paragraph", 40)]),
        _doc("d2", [("paragraph", 0), ("title", 10), ("figure", 20)]),
        _doc("d3", []),
    ], schema=OUT_SCHEMA)
    out = hierarchy_batch(t).to_pylist()
    rows = {(r["doc_id"], r["offset"]): r for r in out}
    assert rows[("d1", 0)]["parent_offset"] == -1
    assert rows[("d1", 0)]["hierarchy_level"] == 1
    assert rows[("d1", 10)]["parent_offset"] == 0
    assert rows[("d1", 20)]["parent_offset"] == 0
    assert rows[("d1", 30)]["parent_offset"] == -1
    assert rows[("d1", 40)]["parent_offset"] == 30
    # d2: leading paragraph has no preceding title
    assert rows[("d2", 0)]["parent_offset"] == -1
    assert rows[("d2", 20)]["parent_offset"] == 10
    # cross-doc isolation: d2's first span must not inherit d1's title
    assert rows[("d2", 0)]["hierarchy_level"] == 2
    assert len(out) == 8
