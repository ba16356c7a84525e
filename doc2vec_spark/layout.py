"""Physical table layout strategies for the chunk store at scale.

The parquet chunk store (store.py) partitions by ``product_name`` so
metadata filters prune whole directories. This module adds the second
lever: **bucketing** by ``url``. Chunk-table joins are almost always
url-keyed (J5 diff, K3/K4 delete sets, page reconstruction) — bucketing
both sides by url makes those joins shuffle-free: each task reads matching
bucket files, SortMergeJoin runs with no Exchange. On a 100 TB chunk table
that removes the dominant cost of every incremental sync.

Local demo uses the session warehouse (saveAsTable — bucketing metadata
lives in the catalog); on a deployment the same code targets the production
metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "url",
    num_buckets: int = 16,
    sort_col: str | None = "chunk_index",
) -> None:
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two co-bucketed tables — Catalyst sees the matching bucket specs
    and plans the join without an Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)
