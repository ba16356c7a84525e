"""Loaders for the driver-provided parquet tables (TESTDATA.md).

All reads go through ``load`` so filter pushdown / column pruning reach the
parquet scan uniformly, and so a future move to a real catalog (Delta /
Iceberg at 100 TB) is a one-file change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
        # default; read nanos as long and truncate to microseconds (matching
        # DuckDB's micro-precision read of the same file). Integer division —
        # double division would lose precision on int64 nanos.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
