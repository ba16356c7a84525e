"""Multi-sync e2e over the real driver corpus (500 docs at sf0.001): the
reference's 6-run change-detection matrix shape at corpus scale."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def corpus(spark):
    from doc2vec_spark.tables import load

    return load(spark, SF_DIR, "documents").select(
        F.concat(F.lit("https://c/"), F.col("doc_id").cast("string")).alias("url"),
        F.col("text").alias("markdown"),
        F.col("lang").alias("product_name"),
        F.lit("v1").alias("version"),
        "doc_id",
    )


def test_corpus_sync_then_mutate(spark, tmp_path, corpus):
    from doc2vec_spark.store import ChunkStore
    from doc2vec_spark.sync import sync_documents

    store = ChunkStore(spark, str(tmp_path / "chunks"))

    c1 = sync_documents(spark, store, corpus.drop("doc_id"))
    assert c1.items_new == 500 and c1.chunks_added == store.count() > 0

    # mutate: 10% edited, 5% dropped, 3 added
    edited = corpus.withColumn(
        "markdown",
        F.when(F.col("doc_id") % 10 == 0, F.concat(F.col("markdown"), F.lit(" EDITED")))
        .otherwise(F.col("markdown")),
    ).filter(F.col("doc_id") % 20 != 1)
    added = spark.createDataFrame(
        [(f"https://c/new{i}", f"brand new document {i} " * 30, "en", "v1", -1) for i in range(3)],
        "url string, markdown string, product_name string, version string, doc_id long",
    )
    v2 = edited.unionByName(added).drop("doc_id")

    c2 = sync_documents(spark, store, v2, cleanup_prefix="https://c/")
    assert c2.items_new == 3
    assert c2.items_updated == 50   # doc_id % 10 == 0, minus none in dropped set
    assert c2.items_deleted == 25   # doc_id % 20 == 1
    assert c2.items_unchanged == 500 - 50 - 25

    # store agrees: urls present = v2 urls exactly
    stored_urls = {r["url"] for r in store.read().select("url").distinct().collect()}
    v2_urls = {r["url"] for r in v2.select("url").collect()}
    assert stored_urls == v2_urls

    # third sync with no changes: nothing written
    token = store.version_token()
    c3 = sync_documents(spark, store, v2, cleanup_prefix="https://c/")
    assert c3.items_unchanged == len(v2_urls) and c3.chunks_added == 0
    assert store.version_token() == token


def test_query_after_sync(spark, tmp_path, corpus):
    from doc2vec_spark.query import query_documentation
    from doc2vec_spark.store import ChunkStore
    from doc2vec_spark.sync import sync_documents

    store = ChunkStore(spark, str(tmp_path / "chunks"))
    sync_documents(spark, store, corpus.drop("doc_id"))

    target = corpus.filter(F.col("doc_id") == 42).first()
    rows = query_documentation(store.read(), target["markdown"], k=3).collect()
    assert rows[0]["url"] == target["url"]
    assert rows[0]["distance"] == pytest.approx(0.0, abs=1e-9)
    # product filter respected on the partitioned store
    rows = query_documentation(
        store.read(), target["markdown"], product_name="zh", k=3
    ).collect()
    assert all(r["product_name"] == "zh" for r in rows)