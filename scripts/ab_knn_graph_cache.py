"""Interleaved A/B (r21 warm-order-bias protocol): ann_knn_graph wide-route
self-join with vs without the scoped-cached bucket frame, at the .scale10
replica (20k vecs -> 12-plane Arrow-matmul route). Also collect-compares the
two variants' outputs once for parity."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = f"{_REPO}/.scale10"
REPS = 6


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from doc2vec_spark.functions.rounding import pround
    from doc2vec_spark.functions.vectors import as_double_array, dot, l2_norm
    from doc2vec_spark.operators.curation import (
        KNN_GRAPH_K,
        _wide_bucket_expr,
        ann_knn_graph,
    )
    from doc2vec_spark.session import get_spark
    from doc2vec_spark.tables import load

    spark = get_spark("ab-knn-cache")
    spark.sparkContext.setLogLevel("ERROR")

    def uncached_plan():
        e = load(spark, SF_DIR, "embeddings").select(
            "vec_id", as_double_array(F.col("embedding")).alias("v")
        )
        bucket = _wide_bucket_expr(F.col("v"))
        b = e.select(
            "vec_id", "v", l2_norm(F.col("v")).alias("nv"), bucket.alias("bucket")
        )
        a, n = b.alias("a"), b.alias("n")
        sim = dot(F.col("a.v"), F.col("n.v")) / (F.col("a.nv") * F.col("n.nv"))
        pairs = a.join(
            n,
            (F.col("a.bucket") == F.col("n.bucket"))
            & (F.col("a.vec_id") != F.col("n.vec_id")),
        ).select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("n.vec_id").alias("neighbor_id"),
            pround(sim, 6).alias("cosine_sim"),
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("cosine_sim"), F.asc("neighbor_id")
        )
        return pairs.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= KNN_GRAPH_K
        )

    def cached_plan():
        return ann_knn_graph(spark, SF_DIR)

    # parity: collect both once, order-insensitively compare
    ru = sorted(map(tuple, uncached_plan().collect()))
    rc = sorted(map(tuple, cached_plan().collect()))
    print(f"parity rows uncached={len(ru)} cached={len(rc)} equal={ru == rc}")
    assert ru == rc, "MISMATCH between cached and uncached variants"

    def run(mk):
        df = mk()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    times = {"uncached": [], "cached": []}
    order = ["uncached", "cached"]
    for rep in range(REPS):
        order = order[::-1]  # alternate which goes first
        for variant in order:
            dt = run(uncached_plan if variant == "uncached" else cached_plan)
            times[variant].append(round(dt, 3))

    med = {
        k: sorted(v)[len(v) // 2] for k, v in times.items()
    }
    out = {"sf_dir": SF_DIR, "reps": REPS, "times": times, "medians": med}
    print(json.dumps(out))
    Path(f"{_REPO}/bench_runs/ab_knn_cache_scale10.json").write_text(
        json.dumps(out, indent=1)
    )


if __name__ == "__main__":
    main()
