"""Content-defined chunking: exact reassembly, size clamps,
determinism, and the property the whole operator exists for —
shift-invariance (an edit near the start leaves the remainder's chunks
identical, so chunk-level dedup collapses them)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extraction_ray.functions.cdc import (CDC_MAX, CDC_MIN,
                                              cdc_boundaries, cdc_chunks)


def _rand_text(seed: int, n: int) -> str:
    rng = np.random.default_rng(seed)
    return "".join(chr(c) for c in rng.integers(32, 127, size=n))


def test_reassembly_and_clamps():
    text = _rand_text(1, 20000)
    chunks = cdc_chunks(text)
    assert "".join(chunks) == text
    sizes = [len(c) for c in chunks]
    assert max(sizes) <= CDC_MAX
    # natural cuts respect CDC_MIN; forced max-cuts and the tail may be
    # shorter, so check the bulk
    assert np.median(sizes) >= CDC_MIN


def test_deterministic():
    text = _rand_text(2, 5000)
    assert cdc_chunks(text) == cdc_chunks(text)


def test_shift_invariance_vs_fixed_chunking():
    """Prepending bytes must leave most chunks identical (CDC), while
    fixed-size splitting shares almost nothing after a shift."""
    base = _rand_text(3, 30000)
    edited = "PREPENDED EDIT >>> " + base
    a, b = set(cdc_chunks(base)), set(cdc_chunks(edited))
    shared = len(a & b) / max(len(a), 1)
    assert shared > 0.9, shared
    fixed_a = {base[i:i + 256] for i in range(0, len(base), 256)}
    fixed_b = {edited[i:i + 256] for i in range(0, len(edited), 256)}
    fixed_shared = len(fixed_a & fixed_b) / max(len(fixed_a), 1)
    assert fixed_shared < 0.1, fixed_shared


def test_mid_document_edit_localized():
    base = _rand_text(4, 30000)
    edited = base[:15000] + "XX" + base[15000:]
    a, b = cdc_chunks(base), cdc_chunks(edited)
    differing = set(a).symmetric_difference(b)
    assert len(differing) <= 6, len(differing)


@given(st.text(alphabet=st.characters(min_codepoint=32,
                                      max_codepoint=0x2FFF),
               max_size=4000))
@settings(max_examples=30, deadline=None)
def test_reassembly_holds_on_unicode(text):
    assert "".join(cdc_chunks(text)) == text


def test_empty_and_tiny():
    assert cdc_chunks("") == []
    assert cdc_chunks("ab") == ["ab"]
    assert cdc_boundaries(b"") == []


@pytest.mark.usefixtures("ray_session")
def test_doc_cdc_chunks_pipeline_and_dedup_friendliness(tmp_path):
    import os
    import pandas as pd
    from pdf_extraction_ray.pipelines.textops import doc_cdc_chunks

    base = _rand_text(5, 8000)
    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": [base, "edited head | " + base, _rand_text(6, 8000)],
        "lang": ["en"] * 3, "source": ["s"] * 3})
    d = tmp_path / "cdcdocs"
    os.makedirs(d, exist_ok=True)
    docs.to_parquet(d / "documents.parquet")
    out = doc_cdc_chunks(str(d)).to_pandas()
    assert (out.groupby("doc_id")["chunk_size"].max() <= CDC_MAX).all()
    m0 = set(out.loc[out.doc_id == 0, "chunk_md5"])
    m1 = set(out.loc[out.doc_id == 1, "chunk_md5"])
    m2 = set(out.loc[out.doc_id == 2, "chunk_md5"])
    assert len(m0 & m1) / len(m0) > 0.9       # near-dup docs share chunks
    assert len(m0 & m2) == 0                  # unrelated docs share none
