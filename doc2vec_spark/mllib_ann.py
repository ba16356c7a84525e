"""MLlib tier for similarity search (BASELINE.json: "DataFrame batch
processing + MLlib").

The expression-level SRP/IVF operators (operators/similarity.py) are
oracle-checkable; this module is the production-scale complement using
MLlib's fitted models:

- BucketedRandomProjectionLSH: approx nearest neighbors + similarity
  self-join on the embeddings table (the Spark-native ANN index)
- KMeans: learned IVF centroids (replacing similarity.py's fixed ones),
  cluster assignment as the partition key for cell-probed search

All models use fixed seeds; vectors come from ``array_to_vector`` (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_vectors(embeddings: DataFrame) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return embeddings.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )


def lsh_model(embeddings: DataFrame, bucket_length: float = 2.0, num_tables: int = 3):
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    df = _with_vectors(embeddings)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_tables,
        seed=42,
    )
    return lsh.fit(df), df


def approx_neighbors(embeddings: DataFrame, query_vec_id: int, k: int = 5) -> DataFrame:
    """ANN via the fitted LSH model: probe only matching hash buckets."""
    model, df = lsh_model(embeddings)
    key = df.filter(F.col("vec_id") == query_vec_id).select("features").first()["features"]
    return (
        model.approxNearestNeighbors(df, key, k)
        .select("vec_id", "label", F.col("distCol").alias("distance"))
    )


def similarity_self_join(embeddings: DataFrame, threshold: float) -> DataFrame:
    """All pairs within euclidean distance ``threshold`` — LSH-bucketed, so
    candidate generation is a bucket join, not a cross join."""
    model, df = lsh_model(embeddings)
    joined = model.approxSimilarityJoin(df, df, threshold, distCol="dist")
    return (
        joined.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.col("dist"),
        )
    )


def ivf_kmeans_cells(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """Learned IVF coarse quantizer: KMeans cells + sizes."""
    from pyspark.ml.clustering import KMeans

    df = _with_vectors(embeddings)
    model = KMeans(k=k, seed=42, featuresCol="features", predictionCol="cell").fit(df)
    return (
        model.transform(df)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("min_vec_id"))
    )
