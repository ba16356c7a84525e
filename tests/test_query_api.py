"""Query-plane tests: unique-phrase retrieval through the full pipeline
(the reference's MCP e2e technique, tests/README.md:565-588)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

PHRASE = "the zanzibar quokka protocol handles vector reconciliation"
FILLER = "ordinary documentation text about configuration. " * 20


@pytest.fixture(scope="module")
def chunks(spark):
    from doc2vec_spark.chunking import chunk_documents
    from doc2vec_spark.embedding import with_embeddings

    docs = spark.createDataFrame(
        [
            ("https://d/planted.md", PHRASE, "prodA", "1.0"),
            ("https://d/f1.md", f"# One\n{FILLER}", "prodA", "1.0"),
            ("https://d/f2.html", f"# Two\n{FILLER} extra", "prodA", "2.0"),
            ("https://e/f3.md", f"# Three\n{FILLER} more", "prodB", "1.0"),
        ],
        "url string, markdown string, product_name string, version string",
    )
    return with_embeddings(chunk_documents(docs)).cache()


def test_unique_phrase_comes_back_top1(spark, chunks):
    from doc2vec_spark.query import query_documentation

    rows = query_documentation(chunks, PHRASE, k=4).collect()
    assert rows, "no results"
    assert rows[0]["url"] == "https://d/planted.md"
    assert rows[0]["distance"] == pytest.approx(0.0, abs=1e-9)
    assert "embedding" not in rows[0].asDict()  # P8 drop


def test_metadata_filter_excludes(spark, chunks):
    from doc2vec_spark.query import query_documentation

    rows = query_documentation(chunks, PHRASE, product_name="prodB", k=4).collect()
    assert rows and all(r["product_name"] == "prodB" for r in rows)
    assert all(r["url"] != "https://d/planted.md" for r in rows)


def test_url_prefix_and_extension_filters(spark, chunks):
    from doc2vec_spark.query import query_documentation

    rows = query_documentation(chunks, PHRASE, url_prefix="https://d/", k=10).collect()
    assert rows and all(r["url"].startswith("https://d/") for r in rows)

    rows = query_documentation(chunks, PHRASE, extensions=["md"], k=10).collect()
    assert rows and all(r["url"].endswith(".md") for r in rows)


def test_get_chunks_and_reconstruct(spark, chunks):
    from doc2vec_spark.query import get_chunks, reconstruct_page

    url = "https://d/f1.md"
    got = get_chunks(chunks, url).collect()
    assert [r["chunk_index"] for r in got] == sorted(r["chunk_index"] for r in got)

    page = reconstruct_page(chunks, url).collect()[0]["page"]
    for r in got:
        assert r["content"] in page


def test_query_code_repo_filter(spark, chunks):
    from doc2vec_spark.query import query_code

    # non-code chunks have repo='' (database.ts:419-425): filter excludes all
    assert query_code(chunks, PHRASE, repo="owner/name").count() == 0
    assert query_code(chunks, PHRASE, repo="").count() > 0
