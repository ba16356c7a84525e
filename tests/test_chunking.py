"""Chunker semantics tests — mirror the reference's behavioral matrix
(tests/README.md:153-305: merge rules, overlap, hierarchy, breadcrumbs)."""

from __future__ import annotations

import hashlib

from doc2vec_spark.chunking import (
    MAX_CHARS,
    MIN_CHARS,
    chunk_markdown,
    strip_lone_surrogates,
)


def sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_short_plain_text_single_chunk():
    text = "just a short paragraph of plain text"
    chunks = chunk_markdown(text)
    assert len(chunks) == 1
    c = chunks[0]
    assert c.content == text  # no heading -> no [Topic:] prefix
    assert c.section == "Introduction"
    assert c.heading_hierarchy == []
    assert c.chunk_id == sha(text)
    assert c.chunk_index == 0 and c.total_chunks == 1


def test_breadcrumb_and_section():
    md = "# Guide\n## Install\n" + ("install instructions. " * 40)
    chunks = chunk_markdown(md)
    assert len(chunks) == 1
    c = chunks[0]
    assert c.content.startswith("[Topic: Guide > Install]\n")
    assert c.section == "Install"
    assert c.heading_hierarchy == ["Guide", "Install"]
    assert c.chunk_id == sha(c.content)


def test_small_sibling_sections_merge_with_parent_topic():
    # two small H2 siblings under an H1: merged into one chunk whose topic
    # hierarchy is the PARENT (content-processor.ts:2170-2193)
    md = "# Parent\n## A\nshort a\n## B\nshort b\n"
    chunks = chunk_markdown(md)
    assert len(chunks) == 1
    c = chunks[0]
    assert "## A" in c.content and "## B" in c.content
    assert c.content.startswith("[Topic: Parent]\n")
    assert c.heading_hierarchy == ["Parent"]


def test_shallower_heading_flushes_section():
    big = "x" * (MIN_CHARS + 10)
    md = f"## Sec1\n### Sub\n{big}\n## Sec2\n{big}\n"
    chunks = chunk_markdown(md)
    assert len(chunks) == 2
    assert "Sec1" in chunks[0].content and "Sec2" in chunks[1].content
    # hierarchy reset: Sec2 chunk must not contain Sub
    assert chunks[1].heading_hierarchy[-1] == "Sec2"
    assert "Sub" not in chunks[1].heading_hierarchy


def test_overlap_split_for_oversize_section():
    body = "word " * 2000  # ~10000 chars
    md = "# Big\n" + body
    chunks = chunk_markdown(md)
    assert len(chunks) >= 3
    step = MAX_CHARS - int(MAX_CHARS * 0.1)
    for i, c in enumerate(chunks):
        assert c.content.startswith("[Topic: Big]\n")
        assert c.chunk_index == i
        assert c.total_chunks == len(chunks)
    # consecutive slices overlap by ~400 chars (each sub-slice is trimmed
    # before hashing, content-processor.ts:2205, so compare trimmed tails)
    raw0 = chunks[0].content.split("]\n", 1)[1]
    raw1 = chunks[1].content.split("]\n", 1)[1]
    tail = raw0[step:].strip()
    assert tail and raw1.startswith(tail)


def test_anchor_links_removed_from_headings():
    md = "# Title [link](#anchor-id)\n" + "content " * 100
    chunks = chunk_markdown(md)
    assert chunks[0].heading_hierarchy == ["Title"]


def test_heading_level_jump_leaves_hole():
    # H1 then H3: hierarchy has a JS-style hole; breadcrumb skips it, but
    # section still reflects the H3
    md = "# Top\n### Deep\n" + "content " * 100
    chunks = chunk_markdown(md)
    c = chunks[0]
    assert c.content.startswith("[Topic: Top > Deep]\n")
    assert c.section == "Deep"
    assert c.heading_hierarchy == ["Top", "Deep"]


def test_safety_valve_flush_headingless():
    text = "a" * (MAX_CHARS * 2 + 100)
    chunks = chunk_markdown(text)
    assert len(chunks) >= 2
    assert all(len(c.content) <= MAX_CHARS for c in chunks)


def test_ids_stable_across_runs():
    md = "# A\n" + "stable content " * 100
    a = [c.chunk_id for c in chunk_markdown(md)]
    b = [c.chunk_id for c in chunk_markdown(md)]
    assert a == b


def test_surrogate_stripping():
    s = "ok \ud800 broken \udfff also"
    cleaned = strip_lone_surrogates(s)
    assert "\ud800" not in cleaned and "\udfff" not in cleaned
    # well-formed emoji (surrogate pair as a real code point) survives
    assert strip_lone_surrogates("hi 😀") == "hi 😀"


def test_astral_chars_use_utf16_lengths():
    # 300 emoji = 600 UTF-16 units but 300 python chars; MIN_CHARS uses units
    md = "# E\n## A\n" + "😀" * 150 + "\n## B\nshort\n"
    chunks = chunk_markdown(md)
    # 150 emoji -> 300 units + heading; buffer still < MIN -> merges with B
    assert len(chunks) == 1


def test_strip_lone_surrogates_handles_runs():
    from doc2vec_spark.chunking import strip_lone_surrogates

    assert strip_lone_surrogates("x\udc00\udc00y") == "xy"
    assert strip_lone_surrogates("\udc00\udc00\udc00") == ""
    # a valid surrogate PAIR is preserved
    assert strip_lone_surrogates("a😀b") == "a😀b"
