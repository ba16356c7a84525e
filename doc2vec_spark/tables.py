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


def ensure_shipped(spark: SparkSession) -> None:
    """Ship this package to executors (addPyFile) so pandas-UDF closures that
    reference doc2vec_spark deserialize on workers regardless of the driver's
    cwd/PYTHONPATH. Idempotent per SparkContext; on a real cluster this is
    the standard --py-files deployment."""
    sc = spark.sparkContext
    if getattr(sc, "_doc2vec_spark_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "doc2vec_spark_pkg.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._doc2vec_spark_shipped = True


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_shipped(spark)
    if name == "events":
        # events.parquet has carried TIMESTAMP(NANOS) in some testdata
        # generations (Spark rejects nanos by default; nanosAsLong surfaces
        # them as int64) and plain TIMESTAMP(MICROS) in others. Convert only
        # when the column actually reads back as long — integer division,
        # double division would lose precision on int64 nanos.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # normalize to TIMESTAMP (ltz): unix_micros/watermarks reject NTZ,
            # and the session tz is pinned UTC so the cast is value-faithful
            # (and identical to what the nanos path above produces)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
