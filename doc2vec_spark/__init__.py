"""doc2vec-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of kagent-dev/doc2vec, re-designed Spark-first.

The reference system (TypeScript, /root/reference) is a RAG ingestion +
vector-search pipeline: crawl/fetch -> markdown -> chunk -> embed -> vector
store, plus a KNN query plane and controller OLAP analytics.  This package
re-expresses every operator in that system as declarative DataFrame / SQL
plans so Catalyst + Tungsten pick the physical strategy, and adds the
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) required for 100 TB training-data workloads.

Layout:
    session.py     SparkSession factory tuned for the workload
    tables.py      testdata table loaders
    registry.py    query registry: name -> (spark_fn, duckdb oracle SQL)
    chunking.py    markdown chunker (reference content-processor.ts:2151-2336)
    embedding.py   deterministic hash embedding UDF (reference doc2vec.ts:2010-2041)
    store.py       chunk store with merge/delete semantics (reference database.ts)
    query.py       query_documentation / get_chunks API (reference mcp/src/server.ts)
    sync.py        incremental change detection (reference doc2vec.ts:1927-2000)
    operators/     relational operator library (SURVEY.md section 2)
    sources/       source connectors (local dir, code, rest, s3, sitemap, crawler)
    streaming/     Structured Streaming surface (windows, watermarks, state)
"""

__version__ = "0.1.0"
