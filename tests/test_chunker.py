"""Chunker properties (M20: 1200/200 recursive splitter) — including a
hypothesis content-preservation property."""

from hypothesis import given, settings, strategies as st

from pdf_extraction_ray.functions.chunker import (_split_recursive, chunk_text)
from pdf_extraction_ray.spec import CHUNK_OVERLAP, CHUNK_SEPARATORS, CHUNK_SIZE


def test_custom_chunk_size_respected():
    chunks = chunk_text("x" * 5000, chunk_size=100, overlap=10)
    assert all(len(c) <= 110 for c in chunks)
    assert len(chunks) >= 40


def test_short_text_single_chunk():
    assert chunk_text("hello world") == ["hello world"]
    assert chunk_text("") == []


def test_chunks_bounded():
    text = ("word " * 100 + "\n\n") * 20
    for ch in chunk_text(text):
        # a chunk may exceed chunk_size only by the carried overlap
        assert len(ch) <= CHUNK_SIZE + CHUNK_OVERLAP


def test_header_priority_split():
    text = ("intro " * 100) + "\n## section " + ("body " * 300)
    chunks = chunk_text(text)
    assert len(chunks) >= 2
    assert any(c.lstrip().startswith("## section") or "\n## section" in c
               for c in chunks)


def test_overlap_carried():
    text = "x" * 3000
    chunks = chunk_text(text)
    assert len(chunks) >= 2
    for a, b in zip(chunks, chunks[1:]):
        assert b.startswith(a[-CHUNK_OVERLAP:])


@given(st.text(alphabet=st.sampled_from(list("ab .\n#")), max_size=5000))
@settings(max_examples=200, deadline=None)
def test_split_preserves_content(text):
    assert "".join(_split_recursive(text, CHUNK_SEPARATORS)) == text


@given(st.text(alphabet=st.sampled_from(list("abc .\n#")), max_size=5000))
@settings(max_examples=100, deadline=None)
def test_chunks_cover_content(text):
    """Stripping the carried overlaps, chunks re-concatenate to the
    original text."""
    chunks = chunk_text(text)
    if not text:
        assert chunks == []
        return
    rebuilt = chunks[0]
    for prev, ch in zip(chunks, chunks[1:]):
        carried = prev[-CHUNK_OVERLAP:] if CHUNK_OVERLAP else ""
        assert ch.startswith(carried)
        rebuilt += ch[len(carried):]
    assert rebuilt == text
