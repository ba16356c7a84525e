"""PDF / DOC / DOCX extraction sources (S3/S4; reference
content-processor.ts:1411-1694).

The reference extracts PDF text per page via PDF.js, emitting ``## Page N``
sections, and converts Word docs via mammoth/word-extractor. The Spark shape
is: ``binaryFile`` scan -> Arrow-batched ``mapInPandas`` extraction -> the
same (url, markdown) contract every other source produces, feeding the
shared chunk/embed/sync pipeline.

Codecs are pluggable: ``pypdf``/``mammoth`` are import-gated (not in this
container); tests inject a deterministic extractor. The Spark plumbing —
scan, batching, page sectioning, markdown assembly — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# (bytes) -> list of page texts
PdfExtractor = Callable[[bytes], list[str]]
# (bytes) -> markdown/plain text
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
    import io

    import mammoth  # type: ignore[import-not-found]

    def extract(data: bytes) -> str:
        return mammoth.convert_to_markdown(io.BytesIO(data)).value

    return extract


def pdf_pages_to_markdown(pages: list[str]) -> str:
    """`## Page N` sectioning (content-processor.ts:1489-1567): one heading
    per page so the markdown chunker keeps page boundaries in hierarchy."""
    sections = []
    for i, text in enumerate(pages, start=1):
        cleaned = (text or "").strip()
        if cleaned:
            sections.append(f"## Page {i}\n\n{cleaned}")
    return "\n\n".join(sections)


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
                out["markdown"].append(pdf_pages_to_markdown(pages))
                out["n_pages"].append(len(pages))
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(process, OUT_SCHEMA)


def read_docx_directory(
    spark: SparkSession,
    path: str,
    make_extractor: Callable[[], DocExtractor] = default_docx_extractor,
    glob: str = "*.docx",
) -> DataFrame:
    """S4: binaryFile scan of word documents -> (url, markdown, n_pages=1)."""
    import pandas as pd

    from doc2vec_spark.tables import ensure_shipped

    ensure_shipped(spark)
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(path)
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extractor = make_extractor()
        for pdf in batches:
            out = {"url": [], "markdown": [], "n_pages": []}
            for p, data in zip(pdf["path"], pdf["content"]):
                out["url"].append(f"file://{p.removeprefix('file:')}")
                out["markdown"].append(extractor(bytes(data)).strip())
                out["n_pages"].append(1)
            yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(process, OUT_SCHEMA)
