"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query (top-k cosine KNN, the reference's core
                  query operator) on /root/testdata/sf0.001.
queries()      -> every implemented operator from SURVEY.md section 2, as
                  (spark, sf_dir) -> DataFrame callables.
oracle_sql()   -> DuckDB-runnable ANSI SQL for each query (omitted only for
                  genuinely non-SQL-expressible ops -> rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: metadata-filtered top-k cosine KNN over the embeddings table."""
    from doc2vec_spark.registry import all_queries

    return all_queries()["t1_knn_cosine_topk"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from doc2vec_spark.registry import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from doc2vec_spark.registry import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
