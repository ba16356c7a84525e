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

# DuckDB's one-arg trim() strips ONLY spaces; the chunker strips Python
# str.strip() whitespace (content-processor.ts buffer.strip()). The charset
# form pins the oracle to ASCII whitespace — exactly str.strip() on the
# ASCII driver corpus — so a '\n\t'-padded doc reads as blank on BOTH sides
# (blanktext sweep divergence, fixed r17).
_WS_SQL = r"e' \t\n\r\x0b\x0c'"
_STRIP_TEXT_SQL = f"trim(text, {_WS_SQL})"


@_register(
    "doc_chunk_pipeline",
    f"""
    SELECT {_URL_SQL} AS url,
           sha256({_STRIP_TEXT_SQL}) AS chunk_id,
           {_STRIP_TEXT_SQL} AS content,
           'Introduction' AS section,
           0 AS chunk_index,
           1 AS total_chunks
    FROM documents
    WHERE {_STRIP_TEXT_SQL} <> ''
    """,
    "F9 chunker via mapInPandas over the driver corpus; headingless short "
    "docs have a closed-form expected output, pinning the UDF plumbing to SQL. "
    "Whitespace-only docs are excluded on BOTH sides: the chunker (matching "
    "content-processor.ts:2151-2336 — empty content is never indexed) emits "
    "no chunk for them, and the oracle's trim-guard mirrors that (blanktext "
    "sweep divergence, fixed r17).",
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
    f"SELECT {_URL_SQL} AS url, {_STRIP_TEXT_SQL} AS page FROM documents "
    f"WHERE {_STRIP_TEXT_SQL} <> ''",
    "T4 page reconstruction through the chunk pipeline (chunk -> ordered "
    "concat). A whitespace-only doc yields no chunks (empty content is never "
    "indexed), hence no page row — the oracle's trim-guard mirrors that "
    "(blanktext sweep divergence, fixed r17).",
)
def doc_reconstruct_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doc2vec_spark.chunking import chunk_documents
    from doc2vec_spark.query import reconstruct_page

    return reconstruct_page(chunk_documents(_doc_corpus(spark, sf_dir)))


# Section text normal form shared by the Spark corpus construction and the
# oracle's state-machine replay: printable-ASCII only (so UTF-16 length ==
# char length), truncated to 200 chars, leading '#'s stripped (so a section
# body line can never be parsed as a heading), trimmed (so the chunker's
# buffer.strip() at flush time removes exactly the constructed separators).
# Under this normal form no section exceeds MIN_CHARS, so the chunker can
# never hit the oversize-split or mid-buffer-flush paths, and the chunk
# count per page has a closed form: greedy grouping of sections flushed at
# the first heading where the trimmed buffer reaches MIN_CHARS (verified
# equal to chunk_markdown() on every sf0.001/sf0.01 page).
_CORPUS_SECT_SQL = (
    "trim(regexp_replace(trim(left(trim(regexp_replace(text, '[^ -~]', '', "
    "'g')), 200)), '^#+ *', ''))"
)


@_register(
    "doc_chunk_markdown_corpus",
    f"""
    WITH RECURSIVE sect0 AS (
      SELECT lang, source, doc_id, {_CORPUS_SECT_SQL} AS t FROM documents),
    sect AS (
      SELECT lang, source, doc_id, t,
             ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn,
             7 + length(CAST(doc_id AS VARCHAR)) + 2 + length(t) AS piece
      FROM sect0 WHERE t <> ''),
    npage AS (SELECT lang, source, MAX(rn) AS n FROM sect GROUP BY 1, 2),
    walk AS (
      SELECT s.lang, s.source, s.rn,
             (2 + length(s.source)) + 2 + s.piece AS acc, 0 AS flushed
      FROM sect s WHERE s.rn = 1
      UNION ALL
      SELECT s.lang, s.source, s.rn,
             CASE WHEN w.acc >= 600 THEN s.piece ELSE w.acc + 2 + s.piece END,
             w.flushed + CASE WHEN w.acc >= 600 THEN 1 ELSE 0 END
      FROM walk w JOIN sect s
        ON s.lang = w.lang AND s.source = w.source AND s.rn = w.rn + 1),
    page AS (
      SELECT w.lang, w.source, w.flushed + 1 AS n
      FROM walk w JOIN npage np ON np.lang = w.lang AND np.source = w.source
       AND w.rn = np.n)
    SELECT 'https://corpus/' || lang || '/' || source AS url,
           CAST(n AS BIGINT) AS n_chunks,
           CAST(n AS INTEGER) AS total_chunks,
           CAST(n AS BIGINT) AS distinct_ids
    FROM page
    """,
    "F9 chunker over a REAL markdown corpus: documents are grouped per "
    "(lang, source) into heading-structured pages (## section per doc), so "
    "the sibling-merge, flush-threshold and force-flush machinery runs at "
    "corpus scale. Sections are normalized (ASCII, <= 200 chars, single "
    "line) so the greedy merge has a closed form the oracle replays as a "
    "recursive-CTE state machine — the chunk counts are hash-verified, not "
    "just row-counted (VERDICT r03 #4a).",
)
def doc_chunk_markdown_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doc2vec_spark.chunking import chunk_documents

    docs = load(spark, sf_dir, "documents")
    sect_text = F.trim(
        F.regexp_replace(
            F.trim(
                F.substring(
                    F.trim(F.regexp_replace(F.col("text"), "[^ -~]", "")), 1, 200
                )
            ),
            "^#+ *",
            "",
        )
    )
    sections = docs.select(
        "lang", "source", F.struct("doc_id", sect_text.alias("t")).alias("s")
    ).filter(F.col("s.t") != "")
    pages = (
        sections.groupBy("lang", "source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")),
                    lambda s: F.concat(
                        F.lit("## Doc "), s.doc_id.cast("string"), F.lit("\n\n"), s.t
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
    WITH base AS (SELECT {_URL_SQL} AS url, sha256({_STRIP_TEXT_SQL}) AS chunk_id,
                         {_STRIP_TEXT_SQL} AS content, 0 AS chunk_index, doc_id
                  FROM documents),
    qc AS (SELECT {components_sql('text')} AS comps FROM documents WHERE doc_id = 7
           ORDER BY doc_id LIMIT 1),
    qv AS (SELECT {vector_sql('comps')} AS v FROM qc),
    ec AS (SELECT url, chunk_id, chunk_index, {components_sql('content')} AS comps
           FROM base WHERE trim(content) <> ''),
    ev AS (SELECT url, chunk_id, chunk_index, {vector_sql('comps')} AS e FROM ec),
    scored AS (SELECT url, chunk_id, chunk_index, {dist} AS dist FROM ev, qv)
    SELECT url, chunk_id, chunk_index,
           {sql_round('dist', 6)} AS distance
    FROM scored ORDER BY dist, chunk_id, url, chunk_index LIMIT {k}
    """


@_register(
    "doc_knn_query_documentation",
    _doc_knn_oracle(),
    "Full query plane: chunk -> deterministic embed -> metadata filter -> "
    "exact cosine top-k (the reference's query_documentation, "
    "mcp/src/server.ts:117-151). Self-query: top-1 must be the planted doc "
    "at distance 0 (asserted in tests/test_query_api.py). Round 11: the "
    "embed stage defaults to the JVM-native column-expression path "
    "(embedding_native.py) — no Python boundary beyond the chunker's "
    "mapInPandas; the digest arithmetic is SQL-expressible, so the whole "
    "chunk -> native embed -> KNN plane is value-hash-checked against "
    "DuckDB recomputing identical float32 vectors.",
)
def doc_knn_query_documentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doc2vec_spark.chunking import chunk_documents
    from doc2vec_spark.embedding_native import with_embeddings_native
    from doc2vec_spark.query import query_documentation

    corpus = _doc_corpus(spark, sf_dir)
    qrow = corpus.filter(F.col("doc_id") == 7).select("text").first()
    if qrow is None:  # no probe doc: oracle's qc CTE is empty -> 0 rows
        return spark.createDataFrame(
            [], "url string, chunk_id string, chunk_index int, distance double"
        )
    query_text = qrow["text"]
    chunks = with_embeddings_native(chunk_documents(corpus))
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

    # q is a 0-or-1-row CTE (not a scalar subquery): a missing probe doc
    # empties every downstream CTE through the cross joins, so the oracle
    # emits 0 rows — the engine's empty-guard contract (empty results are
    # first-class, mcp/src/server.ts:100-107) instead of NULL-token fusion.
    # LIMIT 1 (r17, ADVICE r15 #3): on a malformed corpus with a duplicated
    # probe doc_id the unlimited CTE fanned out through every cross join and
    # the fusion diverged SILENTLY (same row count, different values); the
    # engine side takes .first(), so the oracle must be single-row too.
    # doc_id uniqueness remains the data contract — this only pins the
    # oracle's degenerate-input shape to the engine's.
    qtoks = "regexp_split_to_array(trim(text), '\\s+')[1:8]"
    dist = (
        "1.0 - list_sum(list_transform(range(0, 64), i -> "
        "CAST(e[i+1] AS DOUBLE) * CAST(v[i+1] AS DOUBLE))) / "
        "(sqrt(list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
        "sqrt(list_sum(list_transform(v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
    )
    return f"""
    WITH q AS (SELECT array_to_string(qt, ' ') AS qtext, qt AS qtoks
               FROM (SELECT {qtoks} AS qt FROM documents WHERE doc_id = 7
                     ORDER BY doc_id LIMIT 1)),
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


def _ranked_pool(df: DataFrame, order_cols: list, rank_name: str) -> DataFrame:
    """Bounded candidate pool + 1..HYBRID_CAND rank, fused in one helper.

    The pre-limit sort compiles to TakeOrderedAndProject (a per-partition
    partial top-k, no global sort), and the rank window's unpartitioned sort
    is applied strictly AFTER ``.limit(HYBRID_CAND)`` so it can only ever see
    <= HYBRID_CAND rows. Keeping pool construction and ranking inside this
    single helper ties the window to the bound structurally — an edit that
    raises the pool size changes both together, and one that reorders them
    has to rewrite the helper (guarded by test_hybrid_pools_are_take_ordered).
    """
    from pyspark.sql import Window

    pool = df.orderBy(*order_cols).limit(HYBRID_CAND)
    return pool.withColumn(
        rank_name, F.row_number().over(Window.orderBy(*order_cols))
    )


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
    from doc2vec_spark.embedding import embed_text
    from doc2vec_spark.embedding_native import with_embeddings_native
    from doc2vec_spark.functions.rounding import pround
    from doc2vec_spark.functions.vectors import as_double_array, cosine_distance_lit

    docs = load(spark, sf_dir, "documents")
    # query tokens derived through the ENGINE's split (Java regex \s is
    # ASCII-only, matching DuckDB's RE2 \s) — a Python re.split here would
    # disagree on unicode whitespace (NBSP etc.) and embed a different query
    # string than the oracle
    qrow = (
        docs.filter(F.col("doc_id") == 7)
        .select(F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 8).alias("t"))
        .first()
    )
    if qrow is None:  # no probe doc: oracle's q CTE is empty -> 0 rows
        return spark.createDataFrame(
            [], "doc_id long, rank_kw int, rank_vec int, rrf_score double"
        )
    q_tokens = qrow["t"]
    q_text = " ".join(q_tokens)

    from doc2vec_spark.caching import scoped_cache

    # r21: cached — the keyword leg and the embedding leg each scan base;
    # uncached, the trim/split/array_distinct projection ran twice
    base = scoped_cache(
        docs.filter(F.trim(F.col("text")) != "").select(
            "doc_id",
            F.trim(F.col("text")).alias("content"),
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")).alias("toks"),
        )
    )

    kw_score = F.size(
        F.array_intersect(F.col("toks"), F.array(*[F.lit(t) for t in q_tokens]))
    )
    kw_top = _ranked_pool(
        base.select("doc_id", kw_score.alias("kw_score")),
        [F.desc("kw_score"), "doc_id"],
        "rank_kw",
    )

    qvec = [float(x) for x in embed_text(q_text)]
    scored = with_embeddings_native(base, text_col="content").select(
        "doc_id",
        cosine_distance_lit(as_double_array(F.col("embedding")), qvec).alias("dist"),
    )
    vec_top = _ranked_pool(scored, [F.asc("dist"), "doc_id"], "rank_vec")

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


# ---------------------------------------------------------------------------
# BM25 keyword ranking (round 4)
# ---------------------------------------------------------------------------
# Full-text relevance ranking over the documents table. The reference's
# keyword search is a LIKE-contains filter (F16); production retrieval (and
# the keyword leg every hybrid stack wants) ranks by BM25. Cross-engine
# determinism rule: Robertson's idf is ln((N-df+0.5)/(df+0.5)) — ln is
# libm-dependent, so we rank by the *rational* idf (N-df+0.5)/(df+0.5)
# (the exp-transform of Robertson's, strictly monotone in df: every
# threshold/ordering decision is preserved) — the same log-free rule as
# ta_distinctive_tokens. All remaining arithmetic is IEEE +,*,/ on exact
# integers and identical decimal literals, evaluated in the same order in
# both engines, so raw scores are bit-identical and the top-k needs no
# rounding tolerance.
#
# Plan shape: per-term tf via size(filter(tokens)) — a pure projection, no
# explode, no shuffle; corpus stats (N, Σlen, per-term df) are ONE aggregate
# row fetched by a bounded .first(); scoring is map-only and the top-k
# compiles to TakeOrderedAndProject. At 100 TB this is one scan + one
# O(k)-row result — the cheapest possible BM25 without a prebuilt index.

BM25_TERMS = ("query", "join", "dup", "spark")
BM25_K1 = "1.2"  # decimal literals, parsed identically by both engines —
BM25_B_1M = "0.25"  # (1 - b) with b = 0.75
BM25_B = "0.75"
BM25_K1P1 = "2.2"  # k1 + 1, written as a literal (1.2+1.0 rounds differently)
BM25_TOP = 10


def _bm25_oracle() -> str:
    tfs = ",\n             ".join(
        f"len(list_filter(toks, x -> x = '{t}'))::BIGINT AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    dfs = ",\n             ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    score = " + ".join(
        f"(((n - df{i} + 0.5) / (df{i} + 0.5)) * (tf{i} * {BM25_K1P1}))"
        f" / (tf{i} + {BM25_K1} * ({BM25_B_1M} + {BM25_B} * (dl / (sl / n))))"
        for i in range(len(BM25_TERMS))
    )
    out_tfs = ", ".join(f"tf{i} AS tf_{t}" for i, t in enumerate(BM25_TERMS))
    return f"""
    WITH d AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
    ),
    b AS (SELECT doc_id, len(toks)::BIGINT AS dl,
             {tfs}
          FROM d),
    s AS (SELECT COUNT(*)::BIGINT AS n, CAST(SUM(dl) AS DOUBLE) AS sl,
             {dfs}
          FROM b)
    SELECT doc_id, {out_tfs},
           floor(score * 1000000.0 + 0.5) / 1000000.0 AS bm25
    FROM (SELECT doc_id, {', '.join(f'tf{i}' for i in range(len(BM25_TERMS)))},
                 {score} AS score
          FROM b, s)
    ORDER BY score DESC, doc_id LIMIT {BM25_TOP}
    """


@_register(
    "doc_bm25_topk",
    _bm25_oracle(),
    "BM25 top-{k} over documents for terms {ts} (k1=1.2, b=0.75, rational "
    "idf — the log-free monotone form). Map-only scoring (per-term tf via "
    "array filter, no explode), one bounded stats row, TakeOrderedAndProject "
    "top-k; raw scores bit-identical across engines.".format(
        k=BM25_TOP, ts="/".join(BM25_TERMS)
    ),
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doc2vec_spark.functions.rounding import pround

    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")

    def tf(term: str):
        # single-arg lambda: a second parameter would make F.filter pass the
        # element INDEX into it, silently comparing tokens against positions
        return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("long")

    from doc2vec_spark.caching import scoped_cache

    # r21: cached — the bounded stats row and the final top-k both read
    # base; uncached, the tokenize + per-term tf array filters ran twice
    # over the corpus. Narrow (doc_id, dl, tf*) numeric rows only.
    base = scoped_cache(
        docs.select(
            "doc_id",
            F.size(toks).cast("long").alias("dl"),
            *[tf(t).alias(f"tf{i}") for i, t in enumerate(BM25_TERMS)],
        )
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    ).first()  # bounded: exactly one row of corpus constants
    if not stats["n"]:  # empty corpus: oracle's b CTE is empty -> 0 rows
        return spark.createDataFrame(
            [],
            "doc_id long, "
            + ", ".join(f"tf_{t} long" for t in BM25_TERMS)
            + ", bm25 double",
        )
    n, avgdl = stats["n"], stats["sl"] / stats["n"]
    k1, b1m, b, k1p1 = (float(BM25_K1), float(BM25_B_1M), float(BM25_B), float(BM25_K1P1))

    def term_score(i: int):
        df = stats[f"df{i}"]
        idf = (n - df + 0.5) / (df + 0.5)  # same int/0.5 ops as the SQL
        tf = F.col(f"tf{i}")
        return (F.lit(idf) * (tf * F.lit(k1p1))) / (
            tf + F.lit(k1) * (F.lit(b1m) + F.lit(b) * (F.col("dl") / F.lit(avgdl)))
        )

    score = term_score(0)
    for i in range(1, len(BM25_TERMS)):
        score = score + term_score(i)
    return (
        base.withColumn("score", score)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOP)
        .select(
            "doc_id",
            *[F.col(f"tf{i}").alias(f"tf_{t}") for i, t in enumerate(BM25_TERMS)],
            pround(F.col("score"), 6).alias("bm25"),
        )
    )
