"""Domain-pipeline query specs: the doc2vec ingestion + query plane run
end-to-end over the driver `documents` table (chunk -> embed -> KNN).

The chunker and embedder are pandas-UDF stages, so most entries are
rows-only for the driver's weaker check — their real verification is the
behavioral pytest suite (tests/test_chunking.py, test_sync_store.py,
test_query_api.py). Two entries ARE oracle-checkable because the driver
corpus is headingless short text where the chunker's output has a closed
form (single chunk == trimmed text, id == sha256): that pins the
mapInPandas plumbing itself to SQL ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc2vec_spark.spec import QuerySpec
from doc2vec_spark.tables import load

QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _doc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table -> the chunker's input shape.

    Repartitioned: the single-file parquet scan is ONE partition, which would
    serialize the mapInPandas chunk/embed stages onto one core (one executor
    at cluster scale)."""
    from doc2vec_spark.session import default_parallelism

    return load(spark, sf_dir, "documents").repartition(default_parallelism()).select(
        F.concat(F.lit("https://docs.example.com/"), F.col("source"), F.lit("/p"),
                 F.col("doc_id").cast("string"), F.lit(".md")).alias("url"),
        F.col("text").alias("markdown"),
        F.col("lang").alias("product_name"),
        F.lit("latest").alias("version"),
        "doc_id",
        "text",
    )


_URL_SQL = "'https://docs.example.com/' || source || '/p' || doc_id::VARCHAR || '.md'"


@_register(
    "doc_chunk_pipeline",
    f"""
    SELECT {_URL_SQL} AS url,
           sha256(trim(text)) AS chunk_id,
           trim(text) AS content,
           'Introduction' AS section,
           0 AS chunk_index,
           1 AS total_chunks
    FROM documents
    """,
    "F9 chunker via mapInPandas over the driver corpus; headingless short "
    "docs have a closed-form expected output, pinning the UDF plumbing to SQL",
)
def doc_chunk_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doc2vec_spark.chunking import chunk_documents

    corpus = _doc_corpus(spark, sf_dir)
    return chunk_documents(corpus).select(
        "url",
        "chunk_id",
        "content",
        "section",
        "chunk_index",
        "total_chunks",
    )


@_register(
    "doc_reconstruct_pages",
    f"SELECT {_URL_SQL} AS url, trim(text) AS page FROM documents",
    "T4 page reconstruction through the chunk pipeline (chunk -> ordered concat)",
)
def doc_reconstruct_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doc2vec_spark.chunking import chunk_documents
    from doc2vec_spark.query import reconstruct_page

    return reconstruct_page(chunk_documents(_doc_corpus(spark, sf_dir)))


@_register(
    "doc_chunk_markdown_corpus",
    None,  # multi-section merge/split output has no closed form -> rows-only
    "F9 chunker over a REAL markdown corpus: documents are grouped per "
    "(lang, source) into heading-structured pages (## section per doc), so "
    "the sibling-merge and hierarchy machinery runs at corpus scale "
    "(behavioral truth pinned by tests/test_chunking.py + hypothesis suite)",
)
def doc_chunk_markdown_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doc2vec_spark.chunking import chunk_documents

    docs = load(spark, sf_dir, "documents")
    sections = docs.select(
        "lang",
        "source",
        F.struct("doc_id", "text").alias("s"),
    )
    pages = (
        sections.groupBy("lang", "source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")),
                    lambda s: F.concat(
                        F.lit("## Doc "), s.doc_id.cast("string"), F.lit("\n\n"), s.text
                    ),
                ),
                "\n\n",
            ).alias("body")
        )
        .select(
            F.concat(F.lit("https://corpus/"), F.col("lang"), F.lit("/"), F.col("source")).alias("url"),
            F.concat(F.lit("# "), F.col("source"), F.lit("\n\n"), F.col("body")).alias("markdown"),
            F.col("lang").alias("product_name"),
            F.lit("latest").alias("version"),
        )
    )
    chunks = chunk_documents(pages)
    return chunks.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("total_chunks").alias("total_chunks"),
        F.count_distinct("chunk_id").alias("distinct_ids"),
    )


def _doc_knn_oracle(k: int = 4) -> str:
    from doc2vec_spark.embedding import components_sql, vector_sql
    from doc2vec_spark.functions.rounding import sql_round

    dist = (
        "1.0 - list_sum(list_transform(range(0, 64), i -> "
        "CAST(e[i+1] AS DOUBLE) * CAST(v[i+1] AS DOUBLE))) / "
        "(sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
        "sqrt(list_sum(list_transform(v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
    )
    return f"""
    WITH base AS (SELECT {_URL_SQL} AS url, sha256(trim(text)) AS chunk_id,
                         trim(text) AS content, 0 AS chunk_index, doc_id
                  FROM documents),
    qc AS (SELECT {components_sql('text')} AS comps FROM documents WHERE doc_id = 7),
    qv AS (SELECT {vector_sql('comps')} AS v FROM qc),
    ec AS (SELECT url, chunk_id, chunk_index, {components_sql('content')} AS comps
           FROM base WHERE trim(content) <> ''),
    ev AS (SELECT url, chunk_id, chunk_index, {vector_sql('comps')} AS e FROM ec),
    scored AS (SELECT url, chunk_id, chunk_index, {dist} AS dist FROM ev, qv)
    SELECT url, chunk_id, chunk_index,
           {sql_round('dist', 6)} AS distance
    FROM scored ORDER BY dist, chunk_id LIMIT {k}
    """


@_register(
    "doc_knn_query_documentation",
    _doc_knn_oracle(),
    "Full query plane: chunk -> deterministic embed -> metadata filter -> "
    "exact cosine top-k (the reference's query_documentation, "
    "mcp/src/server.ts:117-151). Self-query: top-1 must be the planted doc "
    "at distance 0 (asserted in tests/test_query_api.py). The digest-"
    "arithmetic embedding (embedding.py) is SQL-expressible, so the whole "
    "chunk -> pandas-UDF embed -> KNN plane is value-hash-checked against "
    "DuckDB recomputing identical float32 vectors.",
)
def doc_knn_query_documentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doc2vec_spark.chunking import chunk_documents
    from doc2vec_spark.embedding import with_embeddings
    from doc2vec_spark.query import query_documentation

    corpus = _doc_corpus(spark, sf_dir)
    query_text = corpus.filter(F.col("doc_id") == 7).select("text").first()["text"]
    chunks = with_embeddings(chunk_documents(corpus))
    out = query_documentation(chunks, query_text, k=4)
    return out.select(
        "url", "chunk_id", "chunk_index",
        (F.floor(F.col("distance") * 1e6 + 0.5) / 1e6).alias("distance"),
    )
