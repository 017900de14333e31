"""Vectorized content-type counter stage (M14-M19 in SURVEY.md §2.2).

One stateless ``map_batches`` task producing five int64 columns from an
``analysis_md`` string column, entirely with RE2 kernels
(``pc.count_substring_regex`` / ``pc.extract_regex``) — no python loop.
Must match ``functions.counters`` (the pure reference implementation)
exactly; RE2 has no lookahead, so section extraction uses a consuming
``(?:###|$)`` terminator which is group-equivalent to the reference's
``(?=###|$)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import counters as C
from ..functions.arrow_utils import as_array

# shared ASCII-explicit pattern strings (see functions/counters.py)
_NUMBERED_RE = "(?m)" + C.NUMBERED_PATTERN
_FIGURE_RE = C.FIGURE_PATTERN
_FIGURE_AND_RE = C.FIGURE_AND_PATTERN


def _np(arr) -> np.ndarray:
    return as_array(arr).to_numpy(zero_copy_only=False)


def _section(text: pa.Array, title: str) -> tuple[np.ndarray, np.ndarray]:
    """-> (section content with '' fill, found mask)."""
    ext = pc.extract_regex(text, rf"### {title}(?P<sec>(?s:.*?))(?:###|$)")
    found = pc.is_valid(ext).to_numpy(zero_copy_only=False)
    sec = pc.struct_field(ext, "sec")
    sec = pc.fill_null(sec, "")
    return _np(sec).astype(object), found


def _any_phrase(low: pa.Array, phrases: list[str]) -> np.ndarray:
    out = np.zeros(len(low), dtype=bool)
    for p in phrases:
        out |= pc.match_substring(low, p).to_numpy(zero_copy_only=False)
    return out


def _count(strings: np.ndarray, pattern: str) -> np.ndarray:
    return pc.count_substring_regex(pa.array(strings, type=pa.string()),
                                    pattern).to_numpy(zero_copy_only=False) \
        .astype(np.int64)


def _figure_count(sec: np.ndarray) -> np.ndarray:
    n_pat = _count(sec, _FIGURE_RE)
    n_and = _count(sec, _FIGURE_AND_RE)
    return n_pat + n_and            # " and " patterns count double


def analyze_content_types_batch(batch: pa.Table,
                                text_col: str = "analysis_md") -> pa.Table:
    text = as_array(batch[text_col] if not isinstance(batch[text_col], pa.ChunkedArray)
                    else batch[text_col].combine_chunks())
    low = as_array(pc.utf8_lower(text))

    f_sec, f_found = _section(text, "Mathematical Formulas")
    formulas = np.where(
        _any_phrase(low, C.NO_FORMULAS) | ~f_found, 0,
        _count(f_sec, _NUMBERED_RE))

    t_sec, t_found = _section(text, "Tables and Data")
    seps = _count(t_sec, C.TABLE_SEP_PATTERN)
    numbered_tables = _count(t_sec, "(?mi)" + C.NUMBERED_TABLE_PATTERN)
    tables = np.where(_any_phrase(low, C.NO_TABLES) | ~t_found, 0,
                      np.where(seps > 0, seps, numbered_tables))

    g_sec, g_found = _section(text, "Graphs and Charts")
    graphs = np.where(
        _any_phrase(low, C.NO_GRAPHS) | ~g_found, 0,
        np.maximum(_count(g_sec, _NUMBERED_RE), _figure_count(g_sec)))

    d_sec, d_found = _section(text, "Figures and Diagrams")
    d_low = np.array([s.lower() for s in d_sec], dtype=object)
    has_visual = np.zeros(len(text), dtype=np.int64)
    for k in C.VISUAL_INDICATORS:
        has_visual |= pc.match_substring(
            pa.array(d_low, type=pa.string()), k) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
    figures = np.where(
        _any_phrase(low, C.NO_FIGURES) | ~d_found, 0,
        np.maximum.reduce([_count(d_sec, _NUMBERED_RE),
                           _figure_count(d_sec), has_visual]))

    data_points = (_count(_np(text).astype(object), C.NUMBER_PATTERN)
                   + _np(pc.count_substring(text, "=")).astype(np.int64)
                   + _np(pc.count_substring(text, "%")).astype(np.int64))

    for name, arr in (("formulas", formulas), ("tables", tables),
                      ("graphs", graphs), ("figures", figures),
                      ("data_points", data_points)):
        batch = batch.append_column(name, pa.array(arr, type=pa.int64()))
    return batch
