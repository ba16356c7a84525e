"""S3/S4 document-extractor plumbing tests (codec stubbed, Spark path real)."""

from __future__ import annotations

import pytest


def test_pdf_pages_to_markdown():
    from doc2vec_spark.sources.docs import pdf_pages_to_markdown

    md = pdf_pages_to_markdown(["first page", "", "  third page  "])
    assert md == "## Page 1\n\nfirst page\n\n## Page 3\n\nthird page"
    assert pdf_pages_to_markdown([]) == ""


def test_read_pdf_directory_stub_extractor(spark, tmp_path):
    from doc2vec_spark.sources.docs import read_pdf_directory

    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(b"%PDF-fake-a")
    (d / "b.pdf").write_bytes(b"%PDF-fake-bb")
    (d / "skip.txt").write_text("not a pdf")

    def make_extractor():
        def extract(data: bytes):
            # deterministic fake: one page per 4 bytes, content from the blob
            return [f"page {i} of {len(data)}b" for i in range(max(1, len(data) // 4))]
        return extract

    rows = {r["url"].rsplit("/", 1)[-1]: r for r in read_pdf_directory(spark, str(d), make_extractor).collect()}
    assert set(rows) == {"a.pdf", "b.pdf"}
    assert rows["a.pdf"]["markdown"].startswith("## Page 1\n\npage 0 of 11b")
    assert rows["a.pdf"]["n_pages"] == 2
    assert rows["b.pdf"]["n_pages"] == 3


def test_read_docx_directory_stub_extractor(spark, tmp_path):
    from doc2vec_spark.sources.docs import read_docx_directory

    d = tmp_path / "docs"
    d.mkdir()
    (d / "r.docx").write_bytes(b"PK-fake-docx")

    rows = read_docx_directory(
        spark, str(d), lambda: (lambda data: f"# Converted\n\n{len(data)} bytes")
    ).collect()
    assert len(rows) == 1
    assert rows[0]["markdown"] == "# Converted\n\n12 bytes"


def test_real_codecs_are_import_gated():
    from doc2vec_spark.sources.docs import default_docx_extractor, default_pdf_extractor

    with pytest.raises(ImportError):
        default_pdf_extractor()
    with pytest.raises(ImportError):
        default_docx_extractor()


def test_pdf_feeds_markdown_chunker(spark, tmp_path):
    """S3 -> F9: page-sectioned markdown chunks with page headings in the
    hierarchy (the reference pipeline contract)."""
    from doc2vec_spark.chunking import chunk_markdown
    from doc2vec_spark.sources.docs import pdf_pages_to_markdown

    md = pdf_pages_to_markdown([f"paragraph text for page {i} " * 30 for i in range(1, 4)])
    chunks = chunk_markdown(md)
    assert chunks
    assert any(c.heading_hierarchy and c.heading_hierarchy[-1].startswith("Page") for c in chunks)
