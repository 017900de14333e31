"""Counter operators: vectorized stage == pure-python reference, plus the
reference's documented edge cases (negative guards, ' and ' double-count,
visual-indicator floor)."""

import pyarrow as pa
import pytest

from pdf_extraction_ray.functions import counters as C
from pdf_extraction_ray.fixtures.vlm import make_vlm_pages
from pdf_extraction_ray.stages.counters import analyze_content_types_batch


def test_negative_guards():
    assert C.count_formulas("blah no mathematical formulas blah") == 0
    assert C.count_tables("### Tables and Data\nno tables here") == 0
    assert C.count_graphs("### Graphs and Charts\nThere are no graphs") == 0
    assert C.count_figures("### Figures and Diagrams\nno figures") == 0


def test_missing_section_is_zero():
    assert C.count_formulas("just prose") == 0
    assert C.count_tables("just prose") == 0


def test_numbered_items():
    md = "### Mathematical Formulas\n1. **Eq 1**: a\n2. **Eq 2**: b\n### Next"
    assert C.count_formulas(md) == 2


def test_table_separators_beat_numbered():
    md = "### Tables and Data\n|---|---|\n|---|---|\n1. **Big Table**\n"
    assert C.count_tables(md) == 2
    md2 = "### Tables and Data\n1. **Big Table** one\n2. **Small Table** two\n"
    assert C.count_tables(md2) == 2


def test_and_double_count():
    md = "### Graphs and Charts\n**Figure S5a and S5b** shown.\n"
    assert C.count_graphs(md) == 2
    md2 = "### Graphs and Charts\n**Figure S4** shown.\n"
    assert C.count_graphs(md2) == 1


def test_visual_indicator_floor():
    md = "### Figures and Diagrams\nThe schematic shows the assembly.\n"
    assert C.count_figures(md) == 1


def test_data_points():
    assert C.count_data_points("x=3 and 4.5% of 10") == 3 + 1 + 1


def test_vectorized_matches_reference():
    tbl = make_vlm_pages(7, 400)
    out = analyze_content_types_batch(tbl)
    mds = tbl.column("analysis_md").to_pylist()
    for i, md in enumerate(mds):
        want = C.analyze_content_types(md)
        for key in ("formulas", "tables", "graphs", "figures", "data_points"):
            got = out.column(key)[i].as_py()
            assert got == want[key], (i, key, got, want[key], md[:200])
