"""Stage A — vectorized span tokenizer / boilerplate + structure classifier.

Stateless ``map_batches`` task, ``batch_format="pyarrow"``: flattens the
``spans`` list column zero-copy via Arrow offsets, computes everything
columnar (numpy / pyarrow.compute / one pandas groupby for the per-page
font median), and re-nests. No python loop over spans.

Semantics (see ``spec``): strip boilerplate kinds, link-density >= 0.5
text spans (readability/trafilatura-style heuristic) and whitespace-only
text; classify kept text spans as markdown header -> title, list marker ->
list, font >= 1.2 x per-(doc,page) median -> title
(advanced_layout_extractor.py:302-358 analog), else paragraph; image
spans -> figure (OCR text filled by the layout actor stage).

Adds parallel list columns: ``keep`` (bool), ``cls`` (classified kind,
"" = dropped), ``out_text`` (normalized text payload).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .. import spec
from ..functions.arrow_utils import as_array, list_offsets, relist


def classify_spans(batch: pa.Table) -> pa.Table:
    batch = batch.combine_chunks()
    spans = batch.column("spans")
    offsets = list_offsets(spans)

    flat = as_array(pc.list_flatten(spans))
    n = len(flat)
    if n == 0:
        empty_str = relist(offsets, pa.array([], type=pa.string()))
        empty_bool = relist(offsets, pa.array([], type=pa.bool_()))
        return (batch.append_column("keep", empty_bool)
                     .append_column("cls", empty_str)
                     .append_column("out_text", empty_str))

    # null policy (spec): null text/kind -> "", null numerics -> 0
    parent = as_array(pc.list_parent_indices(spans)).to_numpy(zero_copy_only=False)
    kind = pc.fill_null(pc.struct_field(flat, "kind"), "")
    stripped = as_array(pc.utf8_trim_whitespace(
        pc.fill_null(pc.struct_field(flat, "text"), "")))
    # NaN (not just null) numerics also normalize to 0 — the complementary
    # keep/drop comparisons and the median would otherwise diverge between
    # the NaN-propagating golden path and vectorized kernels
    font = np.nan_to_num(
        as_array(pc.fill_null(pc.list_flatten(batch.column("font_size")), 0))
        .to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0)
    page = as_array(pc.fill_null(pc.list_flatten(batch.column("page")), 0)) \
        .to_numpy(zero_copy_only=False)
    link = np.nan_to_num(
        as_array(pc.fill_null(pc.list_flatten(batch.column("link_density")), 0))
        .to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0)

    # structural contract: meta lists are parallel to spans — misalignment
    # must fail loudly (safe mode turns it into an error row), never slice
    # downstream docs against shifted flat arrays
    if not (len(font) == len(page) == len(link) == n):
        raise ValueError(
            f"meta columns misaligned with spans: spans={n} font={len(font)} "
            f"page={len(page)} link={len(link)}")

    is_text = pc.equal(kind, spec.KIND_TEXT).to_numpy(zero_copy_only=False)
    is_image = pc.equal(kind, spec.KIND_IMAGE).to_numpy(zero_copy_only=False)
    empty = pc.equal(stripped, "").to_numpy(zero_copy_only=False)
    keep_text = is_text & ~empty & (link < spec.BOILER_LINK_DENSITY)
    keep = keep_text | is_image

    # per-(doc, page) median font over kept text spans, aligned back per span
    med = np.zeros(n, dtype=np.float64)
    if keep_text.any():
        df = pd.DataFrame({"d": parent[keep_text], "p": page[keep_text],
                           "f": font[keep_text]})
        med[keep_text] = df.groupby(["d", "p"])["f"].transform("median").to_numpy()

    # same ASCII-explicit pattern strings as the golden extractor (spec):
    # RE2 here, Python re there — explicit classes keep them identical
    header = pc.match_substring_regex(stripped, spec.MD_HEADER_PATTERN) \
        .to_numpy(zero_copy_only=False)
    listm = pc.match_substring_regex(stripped, spec.LIST_ITEM_PATTERN) \
        .to_numpy(zero_copy_only=False)
    title_font = (med > 0.0) & (font >= spec.TITLE_FONT_RATIO * med)

    cls = np.full(n, "", dtype=object)
    cls[is_image] = spec.OUT_FIGURE
    body = keep_text & ~header & ~listm
    cls[keep_text & header] = spec.OUT_TITLE
    cls[keep_text & ~header & listm] = spec.OUT_LIST
    cls[body & title_font] = spec.OUT_TITLE
    cls[body & ~title_font] = spec.OUT_PARAGRAPH

    return (batch
            .append_column("keep", relist(offsets, pa.array(keep)))
            .append_column("cls", relist(offsets, pa.array(cls, type=pa.string())))
            .append_column("out_text", relist(offsets, stripped)))
