"""SparkSession factory.

Tuned for the driver environment (local[32], 128 GiB) but every setting is
chosen to also be the right default on a large cluster:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast conversion are exactly what keeps 100 TB plans healthy.
- UTC session timezone: deterministic timestamp semantics (and parity with
  the DuckDB oracle, which uses naive UTC timestamps).
- Arrow on: every pandas UDF / toPandas crosses the JVM<->Python boundary in
  columnar batches instead of pickled rows.
- shuffle.partitions sized to the local core count; on a real cluster this
  would be ~2-3x total cores and AQE coalesces the tail.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "doc2vec-spark") -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # dims (region/nation/part/supplier/customer at test SF) should
        # broadcast; 64 MiB is a sane executor-memory-relative ceiling.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    return builder.getOrCreate()
