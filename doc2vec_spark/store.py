"""Chunk store with merge/delete semantics (SURVEY K1-K6, J1).

The reference maintains a SQLite vec0 table / Qdrant collection with
per-chunk upserts, delete-by-url before reinsert, and paginated anti-join
cleanup loops (database.ts:339-678). Spark-first, those collapse into set
operations on a parquet-backed table:

- upsert            = anti-join out the replaced urls, union the new chunks
- delete_by_url     = left-anti filter (K3)
- cleanup_obsolete  = left-anti join against the visited-url set (K4/K5) —
                      the reference's Qdrant scroll pagination loop
                      (database.ts:576-601) disappears entirely

Writes go to a fresh directory version and the `current` pointer flips last
(write-ahead versioning), giving the all-or-nothing visibility the reference
approximates with its `sync_complete` flag (W8) — on a real deployment this
file-swap is exactly a Delta/Iceberg transactional commit, and upsert is
`MERGE INTO`. The layout partitions by product_name (the reference's
per-product databases, mcp/src/server.ts:417-430) so metadata-filtered KNN
prunes partitions at the scan.

A small KV `sync_state` table mirrors vec_metadata (database.ts:121-126)
for watermarks.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc2vec_spark.chunking import CHUNK_SCHEMA

EMBED_FIELD = "embedding"


class ChunkStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        os.makedirs(self.path, exist_ok=True)

    # -- versioned current-pointer machinery ---------------------------------

    def _pointer(self) -> str:
        return os.path.join(self.path, "CURRENT")

    def _current_dir(self) -> str | None:
        try:
            with open(self._pointer()) as f:
                name = json.load(f)["dir"]
            d = os.path.join(self.path, name)
            return d if os.path.exists(d) else None
        except (OSError, ValueError, KeyError):
            return None

    def _commit(self, df: DataFrame) -> None:
        name = f"v{int(time.time() * 1000)}"
        out = os.path.join(self.path, name)
        (
            df.repartition(F.col("product_name"), F.col("url"))
            .write.partitionBy("product_name")
            .mode("overwrite")
            .parquet(out)
        )
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"dir": name}, f)
        os.replace(tmp, self._pointer())  # atomic flip = the "transaction"

    # -- reads ---------------------------------------------------------------

    def read(self) -> DataFrame:
        d = self._current_dir()
        if d is None:
            from pyspark.sql import types as T

            schema = T.StructType(
                CHUNK_SCHEMA.fields
                + [T.StructField(EMBED_FIELD, T.ArrayType(T.FloatType()))]
            )
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(d)

    def count(self) -> int:
        return self.read().count()

    # -- writes (K1-K5) ------------------------------------------------------

    def upsert_documents(self, chunks: DataFrame) -> None:
        """Replace all chunks of every url present in ``chunks`` (the
        reference's delete-by-url-then-insert, database.ts:630-678 +
        doc2vec.ts:1957-1969), keep everything else."""
        stored = self.read()
        urls = chunks.select("url").distinct()
        kept = stored.join(F.broadcast(urls), "url", "left_anti")
        self._commit(kept.unionByName(chunks))

    def delete_by_urls(self, urls: DataFrame) -> None:
        stored = self.read()
        self._commit(stored.join(F.broadcast(urls.select("url")), "url", "left_anti"))

    def cleanup_obsolete(self, url_prefix: str, visited_urls: DataFrame) -> int:
        """K4: delete chunks under ``url_prefix`` whose url was not visited —
        one left-anti join (database.ts:522-619)."""
        stored = self.read()
        in_scope = stored.filter(F.col("url").startswith(url_prefix))
        obsolete = in_scope.join(
            F.broadcast(visited_urls.select("url").distinct()), "url", "left_anti"
        )
        n = obsolete.count()
        if n:
            keep = stored.join(
                obsolete.select("url").distinct(), "url", "left_anti"
            )
            self._commit(keep)
        return n


class SyncStateStore:
    """KV watermark store (vec_metadata, database.ts:121-126; the reference
    stores etag:<url>, lastmod:<url>, last_run_<src>... keys). Tiny by
    construction, so a single JSON file with atomic replace is the right
    local implementation; the API is what matters (get/put/delete by key)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _load(self) -> dict[str, str]:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def get(self, key: str, default: str | None = None) -> str | None:
        return self._load().get(key, default)

    def put(self, key: str, value: str) -> None:
        state = self._load()
        state[key] = value
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    def put_many(self, items: dict[str, str]) -> None:
        state = self._load()
        state.update(items)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    def delete(self, key: str) -> None:
        state = self._load()
        state.pop(key, None)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)
