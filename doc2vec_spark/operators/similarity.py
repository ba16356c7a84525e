"""Similarity search over the embeddings table (BASELINE.json north star).

- brute-force exact cosine top-k: analytics.py t1_* (baseline path)
- SRP-LSH (signed random projection) bucketing: the scale path — assign each
  vector to a bucket by the sign pattern of dot products with fixed
  hyperplanes; search only the query's bucket. At 100 TB the bucket id
  becomes the partition key so a query touches one partition.
- IVF-style coarse quantization: assign to nearest of K fixed centroids;
  probe the query's cell.

Hyperplanes / centroids are deterministic (seeded numpy, inlined as literals
into BOTH the Spark plan and the DuckDB oracle), so correctness is
hash-checkable without any stored model state.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from doc2vec_spark.functions.vectors import (
    as_double_array,
    cosine_distance,
    dot,
    l2_norm,
    lit_vector,
)
from doc2vec_spark.functions.rounding import pround
from doc2vec_spark.spec import QuerySpec
from doc2vec_spark.tables import load

QUERIES: dict[str, QuerySpec] = {}

DIM = 64
NUM_PLANES = 8
NUM_CENTROIDS = 8

_rng = np.random.RandomState(42)
PLANES: list[list[float]] = [[float(x) for x in _rng.randn(DIM)] for _ in range(NUM_PLANES)]
CENTROIDS: list[list[float]] = [
    [float(x) for x in _rng.randn(DIM)] for _ in range(NUM_CENTROIDS)
]


def _register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _sql_vec(vals: list[float]) -> str:
    return "[" + ", ".join(repr(v) for v in vals) + "]::DOUBLE[]"


def srp_bucket_expr(vcol) -> F.Column:
    """Bucket id = bit i set iff dot(v, plane_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(PLANES):
        bit = F.when(dot(vcol, lit_vector(plane)) > 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket + F.shiftleft(bit.cast("long"), i)
    return bucket


_SRP_BUCKET_SQL = (
    "("
    + " + ".join(
        f"((CASE WHEN list_dot_product(v, {_sql_vec(p)}) > 0 THEN 1 ELSE 0 END)::BIGINT << {i})"
        for i, p in enumerate(PLANES)
    )
    + ")"
)


@_register(
    "ann_srp_buckets",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT bucket, COUNT(*) AS n, MIN(vec_id) AS min_vec_id
    FROM (SELECT vec_id, {_SRP_BUCKET_SQL} AS bucket FROM e)
    GROUP BY bucket
    """,
    "SRP-LSH bucket assignment ({} hyperplanes -> {} buckets): the ANN "
    "partitioning key at scale".format(NUM_PLANES, 2**NUM_PLANES),
)
def ann_srp_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    return (
        e.select("vec_id", srp_bucket_expr(F.col("v")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("min_vec_id"))
    )


@_register(
    "ann_srp_search",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_SRP_BUCKET_SQL} AS bucket FROM e),
    q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = 0),
    cand AS (
      SELECT vec_id,
             1 - list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS dist
      FROM b, q WHERE b.bucket = q.qbucket
    )
    SELECT vec_id, rnk, floor((dist) * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS distance FROM (
      SELECT vec_id, dist, ROW_NUMBER() OVER (ORDER BY dist, vec_id) AS rnk FROM cand
    ) WHERE rnk <= 5
    """,
    "SRP-LSH approximate KNN: score only the query's bucket — the candidate "
    "set shrinks ~{}x, the plan shape is identical to exact KNN".format(2**NUM_PLANES),
)
def ann_srp_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    b = e.select("vec_id", "v", srp_bucket_expr(F.col("v")).alias("bucket"))
    qrow = b.filter(F.col("vec_id") == 0).select("v", "bucket").first()
    qv, qbucket = qrow["v"], qrow["bucket"]
    cand = b.filter(F.col("bucket") == qbucket).select(
        "vec_id", cosine_distance(F.col("v"), lit_vector(qv)).alias("dist")
    )
    topk = cand.orderBy(F.asc("dist"), F.asc("vec_id")).limit(5)
    w = Window.orderBy(F.asc("dist"), F.asc("vec_id"))
    return topk.withColumn("rnk", F.row_number().over(w)).select(
        "vec_id", "rnk", (pround(F.col("dist"), 6) + 0.0).alias("distance")
    )


# ---------------------------------------------------------------------------
# IVF-style coarse quantization
# ---------------------------------------------------------------------------


def _nearest_centroid_expr(vcol) -> F.Column:
    """argmin over fixed centroids of cosine distance, ties to lower id.

    Computed as array_position(dists, array_min(dists)) over one dists array:
    each distance is evaluated once (a CASE-chain fold duplicates subtrees
    exponentially), centroid norms are compile-time Python constants, and the
    vector's own norm is factored out of all 8 distances.
    """
    import math

    vnorm = l2_norm(vcol)
    dists = F.array(
        *[
            F.lit(1.0)
            - dot(vcol, lit_vector(c))
            / (vnorm * F.lit(math.sqrt(sum(x * x for x in c))))
            for c in CENTROIDS
        ]
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _centroid_dist_sql(i: int) -> str:
    c = _sql_vec(CENTROIDS[i])
    return (
        f"1 - list_dot_product(v, {c}) / "
        f"(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product({c}, {c})))"
    )


# argmin unrolled as nested CASE to mirror the Spark fold exactly (strict <)
def _nearest_centroid_sql() -> str:
    expr_id = "0"
    expr_dist = _centroid_dist_sql(0)
    for i in range(1, NUM_CENTROIDS):
        d = _centroid_dist_sql(i)
        expr_id = f"CASE WHEN ({d}) < ({expr_dist}) THEN {i} ELSE ({expr_id}) END"
        expr_dist = f"CASE WHEN ({d}) < ({expr_dist}) THEN ({d}) ELSE ({expr_dist}) END"
    return expr_id


@_register(
    "ann_ivf_cells",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT cell, COUNT(*) AS n, MIN(vec_id) AS min_vec_id
    FROM (SELECT vec_id, ({_nearest_centroid_sql()}) AS cell FROM e)
    GROUP BY cell
    """,
    "IVF coarse assignment: nearest of {} fixed centroids; at scale the cell "
    "id is the partition/cluster key and queries probe nprobe cells".format(NUM_CENTROIDS),
)
def ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    return (
        e.select("vec_id", _nearest_centroid_expr(F.col("v")).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("min_vec_id"))
    )


@_register(
    "ann_ivf_search",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, ({_nearest_centroid_sql()}) AS cell FROM e),
    q AS (SELECT v AS qv, cell AS qcell FROM b WHERE vec_id = 0),
    cand AS (
      SELECT vec_id,
             1 - list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS dist
      FROM b, q WHERE b.cell = q.qcell
    )
    SELECT vec_id, rnk, floor((dist) * 1000000.0 + 0.5) / 1000000.0 + 0.0 AS distance FROM (
      SELECT vec_id, dist, ROW_NUMBER() OVER (ORDER BY dist, vec_id) AS rnk FROM cand
    ) WHERE rnk <= 5
    """,
    "IVF probe search: exact cosine top-5 inside the query's cell only — at "
    "scale the cell is a partition key, so nprobe=1 touches one partition; "
    "same TakeOrderedAndProject plan shape as exact KNN",
)
def ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    b = e.select("vec_id", "v", _nearest_centroid_expr(F.col("v")).alias("cell"))
    qrow = b.filter(F.col("vec_id") == 0).select("v", "cell").first()
    qv, qcell = qrow["v"], qrow["cell"]
    cand = b.filter(F.col("cell") == qcell).select(
        "vec_id", cosine_distance(F.col("v"), lit_vector(qv)).alias("dist")
    )
    topk = cand.orderBy(F.asc("dist"), F.asc("vec_id")).limit(5)
    w = Window.orderBy(F.asc("dist"), F.asc("vec_id"))
    return topk.withColumn("rnk", F.row_number().over(w)).select(
        "vec_id", "rnk", (pround(F.col("dist"), 6) + 0.0).alias("distance")
    )
