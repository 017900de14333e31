"""`vlm_pages` fixture (FIXTURES.md §3): deterministic analysis-markdown
strings exercising every branch of the content-type counters — numbered
**bold** items, markdown table separators, ``**Figure S5a and S5b**``
double-counting, visual-indicator keyword floors, and the explicit
negative phrases ("no tables", ...) that force zero counts."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_WORDS = np.array("signal spectrum phase current voltage output response "
                  "curve trend axis sample region".split())


def make_analysis_md(seed: int, i: int) -> str:
    rng = np.random.default_rng([seed, i])
    parts = ["## Comprehensive Analysis", ""]

    # formulas section
    r = rng.random()
    parts.append("### Mathematical Formulas")
    if r < 0.25:
        parts.append("There are no mathematical formulas in this page.")
    elif r < 0.5:
        parts.append("The page discusses methods only.")
    else:
        for k in range(1, int(rng.integers(1, 5)) + 1):
            parts.append(f"{k}. **Eq. {k}**: E = mc^2 + {k}")

    # tables section
    r = rng.random()
    parts.append("### Tables and Data")
    if r < 0.2:
        parts.append("There are no tables on this page.")
    elif r < 0.5:
        n = int(rng.integers(1, 4))
        for _ in range(n):
            parts += ["| a | b |", "|---|---|", "| 1 | 2 |"]
    elif r < 0.75:
        for k in range(1, int(rng.integers(1, 4)) + 1):
            parts.append(f"{k}. **Summary Table {k}** of results")
    else:
        parts.append("Values are described inline.")

    # graphs section
    r = rng.random()
    parts.append("### Graphs and Charts")
    if r < 0.2:
        parts.append("There are no graphs or charts present.")
    elif r < 0.5:
        for k in range(1, int(rng.integers(1, 4)) + 1):
            parts.append(f"{k}. **Figure S{k}**: "
                         + " ".join(rng.choice(_WORDS, 3)))
    elif r < 0.7:
        parts.append("**Figure S5a and S5b** show the measured response.")
    else:
        parts.append("Trends are discussed qualitatively.")

    # figures section
    r = rng.random()
    parts.append("### Figures and Diagrams")
    if r < 0.2:
        parts.append("There are no figures or diagrams present.")
    elif r < 0.45:
        for k in range(1, int(rng.integers(1, 4)) + 1):
            parts.append(f"{k}. **Figure {k}**: " + " ".join(rng.choice(_WORDS, 3)))
    elif r < 0.6:
        parts.append("**Figure A and Figure B** are shown side by side.")
    elif r < 0.75:
        parts.append("The schematic shows the full assembly.")
    else:
        parts.append("The layout is described in prose.")

    # numeric payload for the data-point counter
    for _ in range(int(rng.integers(0, 4))):
        parts.append(f"measured {rng.integers(0, 100)}.{rng.integers(0, 9)} "
                     f"at x={rng.integers(0, 50)}%")
    return "\n".join(parts)


def make_vlm_pages(seed: int, n: int) -> pa.Table:
    rows = [{"doc_id": f"doc-{i:06d}", "page": i % 7 + 1,
             "analysis_md": make_analysis_md(seed, i)} for i in range(n)]
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("doc_id", pa.string()), ("page", pa.int32()),
        ("analysis_md", pa.string())]))
