"""Incremental change detection + sync (SURVEY J5/W3/A3; the heart of the
reference: processChunksForUrl, doc2vec.ts:1927-2000).

The reference diffs each URL's new chunk-hash multiset against the stored
one (getChunkHashesByUrl, database.ts:726-770), then: unchanged -> skip
(no embed, no write); changed -> delete url + embed + insert; absent ->
insert. Spark-first this is ONE grouped set-equality full-outer join for the
whole corpus (not a per-url loop), and the embedding stage — the expensive
operator, exactly as the reference treats it (W3) — runs only over chunks of
new/updated urls.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc2vec_spark.chunking import chunk_documents
from doc2vec_spark.embedding import DEFAULT_DIM
from doc2vec_spark.embedding_native import with_embeddings_native
from doc2vec_spark.store import ChunkStore


def diff_status(new_chunks: DataFrame, stored_chunks: DataFrame) -> DataFrame:
    """(url, status in {new, updated, unchanged, deleted}) via the J5 grouped
    hash-multiset comparison (doc2vec.ts:1936-1955).

    Count-equality shape (r22, guide §2.3/§2.4): equality of the two sorted
    hash lists is exactly multiset equality, i.e. per-(url, hash) count
    equality. Tag each side, union, ONE hash-partition exchange on url, then
    the per-(url,hash) count aggregation and the per-url status aggregation
    both reuse that partitioning — no collect_list buffers, no full-outer
    SortMergeJoin, no sorts, and the output arrives hash-partitioned by url
    (which downstream url joins in sync_documents can reuse). Semantics are
    identical to the r21 list shape including NULL hashes: collect_list
    drops NULLs, so a NULL-hash row asserts side PRESENCE (its url grouped
    to an empty — not NULL — list) but never counts toward the multiset;
    here the NULL-hash group is excluded from the mismatch flag the same
    way while still driving the presence flags."""
    tagged = new_chunks.select(
        "url", "hash", F.lit(1).alias("nn"), F.lit(0).alias("no")
    ).unionByName(
        stored_chunks.select("url", "hash", F.lit(0).alias("nn"), F.lit(1).alias("no"))
    )
    per_h = (
        tagged.repartition("url")
        .groupBy("url", "hash")
        .agg(F.sum("nn").alias("nn"), F.sum("no").alias("no"))
    )
    per_url = per_h.groupBy("url").agg(
        F.max("nn").alias("max_nn"),
        F.max("no").alias("max_no"),
        F.max(
            ((F.col("nn") != F.col("no")) & F.col("hash").isNotNull()).cast("int")
        ).alias("mm"),
    )
    status = (
        F.when(F.col("max_no") == 0, "new")  # url absent from the store
        .when(F.col("max_nn") == 0, "deleted")  # url absent from the listing
        .when(F.col("mm") == 0, "unchanged")  # every hash count-matches
        .otherwise("updated")
    )
    return per_url.select("url", status.alias("status"))


@dataclass
class SyncCounters:
    """SourceRunCounters (types.ts:158-178) derived declaratively (A3)."""

    items_new: int = 0
    items_updated: int = 0
    items_unchanged: int = 0
    items_deleted: int = 0
    chunks_added: int = 0
    chunks_deleted: int = 0


def sync_documents(
    spark: SparkSession,
    store: ChunkStore,
    docs: DataFrame,
    dim: int = DEFAULT_DIM,
    cleanup_prefix: str | None = None,
    full_listing: bool = True,
    embed_fn=None,
) -> SyncCounters:
    """One ingestion run: chunk -> diff -> embed only changed -> commit.

    ``embed_fn(df, text_col=, dim=)`` is the pluggable embedding provider.
    Default: the JVM-native column-expression path
    (``embedding_native.with_embeddings_native`` — bit-identical to the
    stub Arrow UDF, proven by the doc_knn_query_native oracle hashes, with
    no Python boundary in the ingest plan). A real provider (OpenAI/Azure:
    an API call per Arrow batch) plugs in ``embedding.with_embeddings``
    with its ``embed_texts`` swapped — that seam is WHY the UDF path stays.

    ``docs`` carries (url, markdown, product_name, version). The diff (and
    therefore every deletion and counter) is SCOPED to the store rows whose
    product_name appears in ``docs`` — the reference's per-product-database
    granularity (mcp/src/server.ts:417-430). Without that scope, syncing one
    source of a shared store would see every other product's urls as
    "absent from docs" and purge them.

    ``full_listing=True`` (the default; engine sources list their complete
    current set) deletes scoped urls absent from ``docs``. Pass False for a
    PARTIAL batch (e.g. a git-diff changed-file set): absences then mean
    "not in this batch", not "gone", so nothing is deleted implicitly —
    deletions must arrive explicitly (store.delete_by_urls / cleanup).
    ``cleanup_prefix`` additionally purges stored urls under the prefix that
    were not visited (K4 anti-join; gated on success like W9 — any failure
    raises before the commit, so watermarks/state never advance past one).
    """
    new_chunks = chunk_documents(docs).cache()
    products = docs.select("product_name").distinct()
    stored = store.read().join(F.broadcast(products), "product_name", "left_semi").cache()
    statuses = diff_status(new_chunks, stored.select("url", "hash")).cache()
    embedded = None
    try:
        by_status = {
            r["status"]: r["n"]
            for r in statuses.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
        }

        changed_urls = statuses.filter(F.col("status").isin("new", "updated")).select("url")
        # url sets scale with the corpus (a first sync routes EVERY url through
        # them) — no broadcast hints; AQE broadcasts when actually small
        to_embed = new_chunks.join(changed_urls, "url", "left_semi")
        # persist BEFORE counting: the count materializes every embedding, and
        # without the persist the store write below would recompute them all —
        # 2x provider cost on the most expensive stage, the exact thing W3
        # (embed-only-changed) exists to avoid
        embed = embed_fn if embed_fn is not None else with_embeddings_native
        embedded = embed(to_embed, text_col="content", dim=dim).persist()

        chunks_added = embedded.count()

        # ONE commit for the whole sync: upserts + deletions flip together,
        # so a reader never sees the half-applied intermediate state and the
        # store rewrites each affected url-bucket at most once per run.
        # Deletion territory (everything already product-scoped):
        #  - cleanup_prefix given: the caller declared its url territory —
        #    delete unvisited urls UNDER THE PREFIX plus docs whose new
        #    content chunked to zero rows (their stale chunks must go);
        #    never product-wide, or two same-product sources would purge
        #    each other.
        #  - no prefix + full listing: docs is the product's complete set,
        #    so every scoped url with status 'deleted' goes (that set also
        #    contains the zero-chunk docs).
        #  - no prefix + partial batch: absence just means "not in this
        #    batch" — only zero-chunk docs are deleted.
        deleted_status = statuses.filter(F.col("status") == "deleted").select("url")
        docs_urls = docs.select("url").distinct()
        zero_chunk = deleted_status.join(docs_urls, "url", "left_semi")
        if cleanup_prefix is not None:
            in_scope = stored.filter(F.col("url").startswith(cleanup_prefix))
            prefix_deletes = (
                in_scope.select("url")
                .distinct()
                .join(docs_urls, "url", "left_anti")
            )
            delete_urls = zero_chunk.unionByName(prefix_deletes).distinct()
        elif full_listing:
            delete_urls = deleted_status
        else:
            delete_urls = zero_chunk

        # counters must describe what the COMMIT removes, not the raw diff:
        # under full_listing=False or cleanup_prefix scoping, many
        # 'deleted'-status urls are intentionally kept, so counting statuses
        # would overstate deletions. Stored chunks disappear for exactly
        # (a) urls in delete_urls and (b) 'updated' urls (their old chunks
        # are replaced by the upsert).
        delete_urls = delete_urls.distinct().cache()
        items_deleted = delete_urls.count()
        removed_urls = delete_urls.unionByName(
            statuses.filter(F.col("status") == "updated").select("url")
        ).distinct()
        chunks_deleted = stored.join(removed_urls, "url", "left_semi").count()

        if chunks_added or items_deleted:
            store.apply(
                embedded if chunks_added else None,
                delete_urls if items_deleted else None,
            )
        delete_urls.unpersist()

        return SyncCounters(
            items_new=by_status.get("new", 0),
            items_updated=by_status.get("updated", 0),
            items_unchanged=by_status.get("unchanged", 0),
            items_deleted=items_deleted,
            chunks_added=chunks_added,
            chunks_deleted=chunks_deleted,
        )
    finally:
        # MUST unpersist: Spark's CacheManager matches cached data by logical
        # plan, so a later sync over the same source path would silently read
        # this run's (stale) cached chunks instead of the files on disk
        if embedded is not None:
            embedded.unpersist()
        statuses.unpersist()
        new_chunks.unpersist()
        stored.unpersist()
