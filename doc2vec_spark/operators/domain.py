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


# ---------------------------------------------------------------------------
# hybrid keyword + vector search (reciprocal-rank fusion)
# ---------------------------------------------------------------------------
# The reference exposes keyword search (F16, database.ts LIKE path) and
# vector search (T1) as SEPARATE tools; production retrieval fuses them.
# RRF (Cormack et al., SIGIR'09): score = sum over modalities of
# 1/(K + rank). Everything is cross-engine exact: ranks are integers, each
# contribution is one IEEE division, the fusion is one two-term add.
# Plan shape: each modality's candidate set comes from orderBy().limit()
# (TakeOrderedAndProject — distributed partial top-k, no global sort, no
# single-partition exchange); ranks are then assigned on the tiny candidate
# sets only, the same pattern as ann_srp_search.

RRF_K = 60
HYBRID_CAND = 20  # per-modality candidate pool
HYBRID_TOP = 5


def _hybrid_oracle() -> str:
    from doc2vec_spark.embedding import components_sql, vector_sql

    qtoks = (
        "(SELECT regexp_split_to_array(trim(text), '\\s+')[1:8] "
        "FROM documents WHERE doc_id = 7)"
    )
    dist = (
        "1.0 - list_sum(list_transform(range(0, 64), i -> "
        "CAST(e[i+1] AS DOUBLE) * CAST(v[i+1] AS DOUBLE))) / "
        "(sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
        "sqrt(list_sum(list_transform(v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
    )
    return f"""
    WITH q AS (SELECT array_to_string({qtoks}, ' ') AS qtext, {qtoks} AS qtoks),
    qc AS (SELECT {components_sql('qtext')} AS comps FROM q),
    qv AS (SELECT {vector_sql('comps')} AS v FROM qc),
    base AS (SELECT doc_id, trim(text) AS content,
                    list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks
             FROM documents WHERE trim(text) <> ''),
    kw AS (SELECT doc_id,
                  len(list_filter(toks, x -> list_contains(qtoks, x))) AS kw_score
           FROM base, q),
    kw_top AS (SELECT doc_id, kw_score,
                      ROW_NUMBER() OVER (ORDER BY kw_score DESC, doc_id) AS rank_kw
               FROM kw ORDER BY kw_score DESC, doc_id LIMIT {HYBRID_CAND}),
    ec AS (SELECT doc_id, {components_sql('content')} AS comps FROM base),
    ev AS (SELECT doc_id, {vector_sql('comps')} AS e FROM ec),
    vs AS (SELECT doc_id, {dist} AS dist FROM ev, qv),
    vec_top AS (SELECT doc_id, dist,
                       ROW_NUMBER() OVER (ORDER BY dist, doc_id) AS rank_vec
                FROM vs ORDER BY dist, doc_id LIMIT {HYBRID_CAND}),
    fused AS (
      SELECT COALESCE(k.doc_id, t.doc_id) AS doc_id,
             k.rank_kw AS rank_kw, t.rank_vec AS rank_vec,
             COALESCE(1.0 / ({RRF_K} + k.rank_kw), 0.0)
           + COALESCE(1.0 / ({RRF_K} + t.rank_vec), 0.0) AS rrf
      FROM kw_top k FULL OUTER JOIN vec_top t ON k.doc_id = t.doc_id)
    SELECT doc_id, rank_kw, rank_vec,
           floor(rrf * 1000000.0 + 0.5) / 1000000.0 AS rrf_score
    FROM fused ORDER BY rrf DESC, doc_id LIMIT {HYBRID_TOP}
    """


@_register(
    "doc_hybrid_search_rrf",
    _hybrid_oracle(),
    "Hybrid retrieval: keyword-overlap top-{c} and embedding-cosine top-{c} "
    "candidate pools fused by reciprocal-rank fusion (1/({k}+rank) summed "
    "over modalities). Each pool is a TakeOrderedAndProject partial top-k "
    "(no global sort); ranks attach to the tiny pools only; the fusion is "
    "a {c}x{c}-row full-outer join. Integer ranks + single IEEE divisions "
    "keep the fused score bit-identical across engines.".format(
        c=HYBRID_CAND, k=RRF_K
    ),
)
def doc_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from doc2vec_spark.embedding import embed_text, with_embeddings
    from doc2vec_spark.functions.rounding import pround
    from doc2vec_spark.functions.vectors import as_double_array, cosine_distance, lit_vector

    docs = load(spark, sf_dir, "documents")
    # query tokens derived through the ENGINE's split (Java regex \s is
    # ASCII-only, matching DuckDB's RE2 \s) — a Python re.split here would
    # disagree on unicode whitespace (NBSP etc.) and embed a different query
    # string than the oracle
    q_tokens = (
        docs.filter(F.col("doc_id") == 7)
        .select(F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 8).alias("t"))
        .first()["t"]
    )
    q_text = " ".join(q_tokens)

    base = docs.filter(F.trim(F.col("text")) != "").select(
        "doc_id",
        F.trim(F.col("text")).alias("content"),
        F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")).alias("toks"),
    )

    kw_score = F.size(
        F.array_intersect(F.col("toks"), F.array(*[F.lit(t) for t in q_tokens]))
    )
    kw_top = (
        base.select("doc_id", kw_score.alias("kw_score"))
        .orderBy(F.desc("kw_score"), "doc_id")
        .limit(HYBRID_CAND)
        .withColumn(
            "rank_kw",
            F.row_number().over(Window.orderBy(F.desc("kw_score"), "doc_id")),
        )
    )

    qvec = [float(x) for x in embed_text(q_text)]
    scored = with_embeddings(base, text_col="content").select(
        "doc_id",
        cosine_distance(as_double_array(F.col("embedding")), lit_vector(qvec)).alias("dist"),
    )
    vec_top = (
        scored.orderBy(F.asc("dist"), "doc_id")
        .limit(HYBRID_CAND)
        .withColumn("rank_vec", F.row_number().over(Window.orderBy(F.asc("dist"), "doc_id")))
    )

    fused = kw_top.select("doc_id", "rank_kw").join(
        vec_top.select("doc_id", "rank_vec"), "doc_id", "full_outer"
    )
    rrf = F.coalesce(1.0 / (RRF_K + F.col("rank_kw")), F.lit(0.0)) + F.coalesce(
        1.0 / (RRF_K + F.col("rank_vec")), F.lit(0.0)
    )
    return (
        fused.withColumn("rrf", rrf)
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(HYBRID_TOP)
        .select("doc_id", "rank_kw", "rank_vec", pround("rrf", 6).alias("rrf_score"))
    )
