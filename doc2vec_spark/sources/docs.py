"""PDF / DOC / DOCX extraction sources (S3/S4; reference
content-processor.ts:1411-1694).

Markdown assembly is reference-faithful:

- PDF (content-processor.ts:1489-1567): ``# <basename>`` title, per-page
  whitespace collapsed to single spaces, ``## Page N`` headings only for
  multi-page documents, blank pages skipped, final ``\\n{3,}`` cleanup.
- DOCX (content-processor.ts:1442-1487): mammoth produces HTML, which runs
  through the SAME sanitize + markdown converter as web pages (F7,
  html_markdown.py) under a ``# <basename>`` title.
- DOC (content-processor.ts:1411-1440): plain body text with normalized
  line endings under the title.

Codecs are pluggable: ``pypdf``/``mammoth`` are import-gated (not in this
container); tests inject deterministic extractors and golden-test the
assembly layer against pre-extracted fixtures, so the ``## Page N`` and
table-fidelity paths are exercised without the binary codecs.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# (bytes) -> list of page texts
PdfExtractor = Callable[[bytes], list[str]]
# (bytes) -> HTML (docx) or plain text (doc)
DocExtractor = Callable[[bytes], str]

OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("markdown", T.StringType()),
        T.StructField("n_pages", T.IntegerType()),
    ]
)


def default_pdf_extractor() -> PdfExtractor:
    """pypdf when installed; raises ImportError otherwise (callers inject a
    stub — the reference's tests stub the browser/codec layer the same way)."""
    import io

    from pypdf import PdfReader  # type: ignore[import-not-found]

    def extract(data: bytes) -> list[str]:
        reader = PdfReader(io.BytesIO(data))
        return [(page.extract_text() or "") for page in reader.pages]

    return extract


def default_docx_extractor() -> DocExtractor:
    """mammoth -> HTML (the reference converts HTML, not markdown, then runs
    its turndown pipeline — we mirror that with html_markdown.py)."""
    import io

    import mammoth  # type: ignore[import-not-found]

    def extract(data: bytes) -> str:
        return mammoth.convert_to_html(io.BytesIO(data)).value

    return extract


def _basename(path: str, ext: str) -> str:
    name = path.rstrip("/").rsplit("/", 1)[-1]
    return name[: -len(ext)] if ext and name.lower().endswith(ext) else name


def pdf_pages_to_markdown(pages: list[str]) -> str:
    """Page sectioning core: ``## Page N`` headings (multi-page only, blank
    pages skipped), page text whitespace-collapsed
    (content-processor.ts:1543-1556)."""
    n = len(pages)
    sections = []
    for i, text in enumerate(pages, start=1):
        cleaned = re.sub(r"\s+", " ", text or "").strip()
        if cleaned:
            if n > 1:
                sections.append(f"## Page {i}\n\n{cleaned}")
            else:
                sections.append(cleaned)
    return "\n\n".join(sections)


def pdf_to_markdown(path: str, pages: list[str]) -> str:
    """Full document assembly: filename title + page sections + final
    blank-run cleanup (content-processor.ts:1514-1560)."""
    body = pdf_pages_to_markdown(pages)
    md = f"# {_basename(path, '.pdf')}\n\n{body}"
    return re.sub(r"\n{3,}", "\n\n", md).strip()


def docx_html_to_markdown(path: str, html: str) -> str:
    """mammoth-HTML -> sanitized markdown under the filename title
    (content-processor.ts:1442-1487: sanitize-html + turndown == F7)."""
    from doc2vec_spark.html_markdown import convert_html_to_markdown

    body = convert_html_to_markdown(html)
    md = f"# {_basename(path, '.docx')}\n\n{body}"
    return re.sub(r"\n{3,}", "\n\n", md).strip()


def doc_text_to_markdown(path: str, text: str) -> str:
    """Legacy .doc body text: normalize line endings, collapse blank runs,
    filename title (content-processor.ts:1411-1440)."""
    cleaned = re.sub(r"\n{3,}", "\n\n", (text or "").replace("\r\n", "\n")).strip()
    return f"# {_basename(path, '.doc')}\n\n{cleaned}"


def read_pdf_directory(
    spark: SparkSession,
    path: str,
    make_extractor: Callable[[], PdfExtractor] = default_pdf_extractor,
) -> DataFrame:
    """S3: binaryFile scan of *.pdf -> (url, markdown, n_pages)."""
    import pandas as pd

    from doc2vec_spark.tables import ensure_shipped

    ensure_shipped(spark)
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.pdf")
        .load(path)
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extractor = make_extractor()  # codec per partition, like the crawler
        for pdf in batches:
            out = {"url": [], "markdown": [], "n_pages": []}
            for p, data in zip(pdf["path"], pdf["content"]):
                pages = extractor(bytes(data))
                out["url"].append(f"file://{p.removeprefix('file:')}")
                out["markdown"].append(pdf_to_markdown(str(p), pages))
                out["n_pages"].append(len(pages))
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(process, OUT_SCHEMA)


def read_docx_directory(
    spark: SparkSession,
    path: str,
    make_extractor: Callable[[], DocExtractor] = default_docx_extractor,
    glob: str = "*.docx",
) -> DataFrame:
    """S4: binaryFile scan of word documents -> (url, markdown, n_pages=1).

    The extractor yields HTML for .docx (converted via F7) or plain text for
    legacy .doc (normalized under the title)."""
    import pandas as pd

    from doc2vec_spark.tables import ensure_shipped

    ensure_shipped(spark)
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    legacy_doc = glob.endswith(".doc")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extractor = make_extractor()
        for pdf in batches:
            out = {"url": [], "markdown": [], "n_pages": []}
            for p, data in zip(pdf["path"], pdf["content"]):
                raw = extractor(bytes(data))
                md = (
                    doc_text_to_markdown(str(p), raw)
                    if legacy_doc
                    else docx_html_to_markdown(str(p), raw)
                )
                out["url"].append(f"file://{p.removeprefix('file:')}")
                out["markdown"].append(md)
                out["n_pages"].append(1)
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(process, OUT_SCHEMA)
