"""Property-based chunker tests (hypothesis): the invariants the reference's
e2e suite asserts on every run (tests/README.md:647-686) hold for arbitrary
generated markdown."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from doc2vec_spark.chunking import MAX_CHARS, chunk_markdown

_WORDS = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "word", "spark", "chunk", "data", "émoji😀", "键值"]
)
_LINE = st.builds(" ".join, st.lists(_WORDS, min_size=0, max_size=12))
_HEADING = st.builds(
    lambda level, text: "#" * level + " " + text,
    st.integers(min_value=1, max_value=4),
    st.builds(" ".join, st.lists(_WORDS, min_size=1, max_size=4)),
)
_BLOCK = st.one_of(_LINE, _HEADING, st.just(""), st.just("```\ncode block\n```"))
_MARKDOWN = st.builds("\n".join, st.lists(_BLOCK, min_size=0, max_size=120))


@settings(max_examples=60, deadline=None)
@given(_MARKDOWN)
def test_chunker_invariants(md):
    chunks = chunk_markdown(md)

    # empty input <-> no chunks
    if not md.strip():
        assert chunks == []
        return
    assert chunks, "non-empty markdown must produce chunks"

    total = len(chunks)
    for i, c in enumerate(chunks):
        # contiguous indexes and consistent totals
        assert c.chunk_index == i
        assert c.total_chunks == total
        # content-addressed ids: id == hash == sha256(content)
        assert c.chunk_id == hashlib.sha256(c.content.encode("utf-8", "replace")).hexdigest()
        # content is never blank and never wildly over budget (prefix can
        # push slightly past MAX on split pieces)
        assert c.content.strip()
        assert len(c.content) <= MAX_CHARS + 200
        # hierarchy entries are non-empty strings
        assert all(h for h in c.heading_hierarchy)
        assert c.section


@settings(max_examples=30, deadline=None)
@given(_MARKDOWN)
def test_chunker_deterministic(md):
    a = [(c.chunk_id, c.chunk_index) for c in chunk_markdown(md)]
    b = [(c.chunk_id, c.chunk_index) for c in chunk_markdown(md)]
    assert a == b


@settings(max_examples=30, deadline=None)
@given(st.lists(st.sampled_from(["alpha", "beta", "spark", "data"]), min_size=1, max_size=400))
def test_headingless_text_content_preserved(words):
    """For headingless input every non-whitespace character survives into
    the chunk stream (no silent loss), modulo the trims at chunk edges."""
    text = " ".join(words)
    chunks = chunk_markdown(text)
    joined = " ".join(c.content for c in chunks)
    for w in set(words):
        assert w in joined
