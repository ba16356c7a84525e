"""Trained-ANN recall floor at scale (VERDICT r16 #2).

The serving plane's scale story (BENCH_SCALING.md) times the trained
quantizer queries at 10x-32x; this tool re-asserts the QUALITY floor at
the same decades: for each probe query vector, recall@K of the
multiprobe (nprobe=2) candidate rule — exact cosine inside the 2
nearest trained-centroid cells, serving.ann_ivf_search_multiprobe's
rule — against exact brute-force top-K over the whole corpus.

Usage: python scripts/serving_scale_recall.py [sf_dir ...]
       (default: /root/testdata/sf0.1 and .scale32 if present)

Output: one line per (sf_dir, qid) + a summary line per sf_dir with the
mean recall — paste into BENCH_SCALING.md. Pure correctness (no timing),
so it may run in any window.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

K = 10
NUM_Q = 8


def recall_for(spark, sf_dir: str) -> float:
    from pyspark.sql import functions as F

    from doc2vec_spark.functions.vectors import cosine_distance, lit_vector
    from doc2vec_spark.operators.kmeans import _FP, train_kmeans
    from doc2vec_spark.operators.serving import (
        NPROBE,
        _d6_int,
        _py_d6,
        embeddings_with_norms,
    )

    cents = train_kmeans(spark, sf_dir)
    cvf = {c: [fp / _FP for fp in v] for c, v in cents.items()}
    e = embeddings_with_norms(spark, sf_dir)
    o = F.least(
        *[
            _d6_int(F.col("v"), F.col("nv"), cvf[c]) * F.lit(100) + F.lit(c)
            for c in sorted(cvf)
        ]
    )
    b = e.select("vec_id", "v", (o % 100).alias("cell")).cache()
    qrows = sorted(
        b.filter(F.col("vec_id") < NUM_Q).collect(), key=lambda r: r["vec_id"]
    )
    total = 0.0
    for q in qrows:
        qv = list(q["v"])
        probed = sorted(sorted(cvf), key=lambda c: (_py_d6(qv, cvf[c]), c))[:NPROBE]
        scored = b.filter(F.col("vec_id") != q["vec_id"]).select(
            "vec_id", "cell", cosine_distance(F.col("v"), lit_vector(qv)).alias("d")
        )
        exact = {
            r["vec_id"]
            for r in scored.orderBy(F.asc("d"), F.asc("vec_id")).limit(K).collect()
        }
        ann = {
            r["vec_id"]
            for r in scored.filter(F.col("cell").isin([int(c) for c in probed]))
            .orderBy(F.asc("d"), F.asc("vec_id"))
            .limit(K)
            .collect()
        }
        rec = len(exact & ann) / K
        total += rec
        print(f"{sf_dir} qid={q['vec_id']} recall@{K}={rec:.2f}")
    b.unpersist()
    return total / max(len(qrows), 1)


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        *(str(p) for p in [REPO / ".scale32"] if p.is_dir()),
    ]
    from doc2vec_spark.session import get_spark

    spark = get_spark("serving-scale-recall")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        n = spark.read.parquet(f"{d}/embeddings.parquet").count()
        mean = recall_for(spark, d)
        print(f"SUMMARY sf_dir={d} vectors={n} nprobe=2 mean_recall@{K}={mean:.3f}")


if __name__ == "__main__":
    main()
