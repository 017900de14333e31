"""Content-type counters over analysis markdown — pure-python reference
implementations (one string at a time), re-specified from the reference's
regex section counters (gpt4_comprehensive_visual_processor.py:186-336):

- formulas: numbered ``1. **Name**`` items in the "### Mathematical
  Formulas" section; explicit "no mathematical formulas" -> 0 (GPT:210-227)
- tables: markdown separator rows ``|---|---|`` in "### Tables and Data",
  falling back to numbered ``**...Table`` items; "no tables" -> 0
  (GPT:229-252)
- graphs: max(numbered items, Figure-pattern count) in "### Graphs and
  Charts"; a ``**Figure S5a and S5b**`` pattern counts double (GPT:254-284)
- figures: same in "### Figures and Diagrams", plus a visual-indicator
  keyword floor of 1 (GPT:286-325)
- data_points: count of numbers + '=' + '%' over the whole text (GPT:327-336)

The vectorized stage (stages/counters.py) must match these exactly.
"""

from __future__ import annotations

import re

# Pattern STRINGS shared with the vectorized stage (stages/counters.py):
# ASCII-explicit classes only, so Python re here and RE2 there count
# identically (the reference's `\d`/`\s` are pinned to ASCII by this
# re-specification).
_WS = r"[ \t\r\n\f\v]"
NUMBERED_PATTERN = r"^[0-9]+\." + _WS + r"+\*\*[^*]+\*\*"
TABLE_SEP_PATTERN = r"\|[ \t\r\n\f\v-]*\|[ \t\r\n\f\v-]*\|"
NUMBERED_TABLE_PATTERN = r"^[0-9]+\." + _WS + r"+\*\*.*Table"
FIGURE_PATTERN = r"\*\*Figure[^*]*\*\*|\*\*Figures[^*]*\*\*"
FIGURE_AND_PATTERN = r"\*\*Figure[^*]* and [^*]*\*\*|\*\*Figures[^*]* and [^*]*\*\*"
NUMBER_PATTERN = r"[0-9]+\.?[0-9]*"

_NUMBERED = re.compile(NUMBERED_PATTERN, re.MULTILINE)
_TABLE_SEP = re.compile(TABLE_SEP_PATTERN)
_NUMBERED_TABLE = re.compile(NUMBERED_TABLE_PATTERN, re.MULTILINE | re.IGNORECASE)
_FIGURE_PAT = re.compile(FIGURE_PATTERN)
_NUMBER = re.compile(NUMBER_PATTERN)

VISUAL_INDICATORS = ["schematic", "diagram shows", "illustration", "drawing",
                     "visual representation", "flowchart", "circuit diagram"]

NO_FORMULAS = ["no mathematical formulas",
               "does not explicitly contain mathematical formulas"]
NO_TABLES = ["no tables", "does not present explicit tables",
             "no explicit tables"]
NO_GRAPHS = ["no graphs", "no charts"]
NO_FIGURES = ["no figures", "no diagrams", "no traditional diagrams",
              "are not explicitly described"]


def _section(text: str, title: str) -> str | None:
    m = re.search(rf"### {title}(.*?)(?=###|$)", text, re.DOTALL)
    return m.group(1) if m else None


def _individual_figures(content: str) -> int:
    total = 0
    for pat in _FIGURE_PAT.findall(content):
        total += 2 if " and " in pat else 1
    return total


def count_formulas(text: str) -> int:
    low = text.lower()
    if any(p in low for p in NO_FORMULAS):
        return 0
    sec = _section(text, "Mathematical Formulas")
    return len(_NUMBERED.findall(sec)) if sec is not None else 0


def count_tables(text: str) -> int:
    low = text.lower()
    if any(p in low for p in NO_TABLES):
        return 0
    sec = _section(text, "Tables and Data")
    if sec is None:
        return 0
    seps = len(_TABLE_SEP.findall(sec))
    if seps > 0:
        return seps
    return len(_NUMBERED_TABLE.findall(sec))


def count_graphs(text: str) -> int:
    low = text.lower()
    if any(p in low for p in NO_GRAPHS):
        return 0
    sec = _section(text, "Graphs and Charts")
    if sec is None:
        return 0
    return max(len(_NUMBERED.findall(sec)), _individual_figures(sec))


def count_figures(text: str) -> int:
    low = text.lower()
    if any(p in low for p in NO_FIGURES):
        return 0
    sec = _section(text, "Figures and Diagrams")
    if sec is None:
        return 0
    has_visual = any(k in sec.lower() for k in VISUAL_INDICATORS)
    return max(len(_NUMBERED.findall(sec)), _individual_figures(sec),
               1 if has_visual else 0)


def count_data_points(text: str) -> int:
    return len(_NUMBER.findall(text)) + text.count("=") + text.count("%")


def analyze_content_types(text: str) -> dict[str, int]:
    """Composite analyzer (GPT:186-208)."""
    return {
        "formulas": count_formulas(text),
        "tables": count_tables(text),
        "graphs": count_graphs(text),
        "figures": count_figures(text),
        "data_points": count_data_points(text),
    }
