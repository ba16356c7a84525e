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


# Schema memo (r21, guide §6): spark.read.parquet infers the schema on
# EVERY call — on this Spark version the footer merge runs as a small Spark
# job, so each load() paid one extra job of pure latency (measured: ~0.1-0.3 s
# per query at sf0.1; 110 of 200 registry queries carried exactly this one
# build-time job). The memo holds METADATA only (a StructType per path —
# never rows, never results): the first load of a path infers once, later
# loads pass the explicit schema and skip inference entirely. At 100 TB an
# explicit schema is the standard discipline anyway — inference over a
# multi-million-file corpus is a full footer sweep. The key carries the
# path's (mtime_ns, size) stat signature, so a table rewritten at the same
# path (tests do this) re-infers instead of serving a stale schema; an
# unstattable path falls through to plain inference.
_SCHEMA_CACHE: dict[tuple, object] = {}


def _path_sig(path: str) -> tuple | None:
    # ADVICE r21 #2: a rewrite that only replaces files inside partition
    # subdirectories (dynamic-partition-overwrite shape) can leave the
    # top-level dir's mtime/size unchanged, so for directory layouts the
    # newest direct-child mtime is folded into the signature. One level is
    # enough to catch Spark's overwrite shapes (they replace or add the
    # child dir/file, bumping its mtime); deeper in-place surgery is out of
    # any supported writer's shape, and an unlistable dir reads as
    # unstattable (no memo, plain inference — never stale).
    try:
        st = os.stat(path)
        sig = (st.st_mtime_ns, st.st_size)
        if os.path.isdir(path):
            kids = [os.path.join(path, f) for f in os.listdir(path)]
            sig += (len(kids), max((os.stat(k).st_mtime_ns for k in kids), default=0))
        return sig
    except OSError:
        return None


def _read_parquet(spark: SparkSession, path: str):
    sig = _path_sig(path)
    if sig is None:
        return spark.read.parquet(path)
    key = (path, sig)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        # drop stale signatures for the same path before memoizing the new one
        for k in [k for k in _SCHEMA_CACHE if k[0] == path]:
            del _SCHEMA_CACHE[k]
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


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

        df = _read_parquet(spark, f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # normalize to TIMESTAMP (ltz): unix_micros/watermarks reject NTZ,
            # and the session tz is pinned UTC so the cast is value-faithful
            # (and identical to what the nanos path above produces)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return _read_parquet(spark, f"{sf_dir}/{name}.parquet")
