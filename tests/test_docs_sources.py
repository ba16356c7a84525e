"""S3/S4 document-extractor tests: codecs stubbed, Spark path real, and the
markdown-assembly layer golden-tested against pre-extracted fixtures (the
reference's `# title` / `## Page N` / table-fidelity contract,
content-processor.ts:1411-1567)."""

from __future__ import annotations

import pytest


def test_pdf_pages_to_markdown_multipage():
    from doc2vec_spark.sources.docs import pdf_pages_to_markdown

    md = pdf_pages_to_markdown(["first page", "", "  third   page  "])
    # blank page skipped, whitespace collapsed, per-page headings
    assert md == "## Page 1\n\nfirst page\n\n## Page 3\n\nthird page"
    assert pdf_pages_to_markdown([]) == ""


def test_pdf_single_page_has_no_page_heading():
    from doc2vec_spark.sources.docs import pdf_to_markdown

    md = pdf_to_markdown("/docs/manual.pdf", ["only page text here"])
    # reference emits `## Page N` only when numPages > 1
    assert md == "# manual\n\nonly page text here"


def test_pdf_to_markdown_golden():
    from doc2vec_spark.sources.docs import pdf_to_markdown

    pages = [
        "Intro paragraph\nwith a   wrapped\nline.",
        "",
        "Conclusion text.",
    ]
    md = pdf_to_markdown("/x/report.pdf", pages)
    assert md == (
        "# report\n\n"
        "## Page 1\n\nIntro paragraph with a wrapped line.\n\n"
        "## Page 3\n\nConclusion text."
    )


DOCX_HTML_FIXTURE = """
<h1>Quarterly Report</h1>
<p>Summary paragraph with <strong>bold</strong> text.</p>
<table>
  <thead><tr><th>Region</th><th>Revenue</th></tr></thead>
  <tbody>
    <tr><td>EMEA</td><td>10</td></tr>
    <tr><td>APAC</td><td>20</td></tr>
  </tbody>
</table>
"""


def test_docx_html_golden_with_table():
    from doc2vec_spark.sources.docs import docx_html_to_markdown

    md = docx_html_to_markdown("/x/q3.docx", DOCX_HTML_FIXTURE)
    assert md.startswith("# q3\n\n# Quarterly Report")
    assert "**bold**" in md
    # table fidelity: header separator + escaped-pipe-safe rows
    assert "| Region | Revenue |" in md
    assert "|--- | ---|" in md  # the reference's exact separator row format
    assert "| EMEA | 10 |" in md and "| APAC | 20 |" in md


def test_doc_text_golden():
    from doc2vec_spark.sources.docs import doc_text_to_markdown

    md = doc_text_to_markdown("/x/old.doc", "line one\r\n\r\n\r\n\r\nline two\r\n")
    assert md == "# old\n\nline one\n\nline two"


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
    assert rows["a.pdf"]["markdown"].startswith("# a\n\n## Page 1\n\npage 0 of 11b")
    assert rows["a.pdf"]["n_pages"] == 2
    assert rows["b.pdf"]["n_pages"] == 3


def test_read_docx_directory_html_pipeline(spark, tmp_path):
    from doc2vec_spark.sources.docs import read_docx_directory

    d = tmp_path / "docs"
    d.mkdir()
    (d / "r.docx").write_bytes(b"PK-fake-docx")

    rows = read_docx_directory(
        spark,
        str(d),
        lambda: (lambda data: f"<h2>Converted</h2><p>{len(data)} bytes</p>"),
    ).collect()
    assert len(rows) == 1
    assert rows[0]["markdown"] == "# r\n\n## Converted\n\n12 bytes"


def test_read_legacy_doc_directory(spark, tmp_path):
    from doc2vec_spark.sources.docs import read_docx_directory

    d = tmp_path / "docs"
    d.mkdir()
    (d / "old.doc").write_bytes(b"\xd0\xcf-fake-doc")

    rows = read_docx_directory(
        spark,
        str(d),
        lambda: (lambda data: f"body of {len(data)} bytes\r\n\r\n\r\nmore"),
        glob="*.doc",
    ).collect()
    assert len(rows) == 1
    assert rows[0]["markdown"] == "# old\n\nbody of 11 bytes\n\nmore"


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
    from doc2vec_spark.sources.docs import pdf_to_markdown

    md = pdf_to_markdown(
        "/x/guide.pdf", [f"paragraph text for page {i} " * 30 for i in range(1, 4)]
    )
    chunks = chunk_markdown(md)
    assert chunks
    assert any(c.heading_hierarchy and c.heading_hierarchy[-1].startswith("Page") for c in chunks)
