"""Index-quality metrics (round 9): ANN recall@k against exact ground truth.

Every ann_* operator (SRP buckets, IVF cells, PQ codes, truncate-rerank)
trades recall for candidate-set size; a production retrieval stack monitors
that trade with a recall@k job — exact brute-force top-k for a bounded
query sample vs the index's answer, per query. The reference has no such
surface (its search is a single sqlite-vec MATCH, mcp/src/server.ts:448);
this is the operator a user needs before trusting the engine's ANN paths
at 100 TB.

Design (engine-exact): the NUM_Q sample queries' vectors and buckets are
collected once (bounded literal LUT, the ann_* discipline); every corpus
vector then scores against all NUM_Q literal queries MAP-SIDE (one explode
of a NUM_Q-element struct array — no join, no cross product), and two
ROW_NUMBER windows rank the same scored rows — globally per query (exact)
and within the query's SRP bucket (the ANN candidate rule of
ann_srp_search). recall@k = |ANN top-k ∩ exact top-k| / k, reported as
exact integer ppm. Distances are the established left-fold cosine,
tie-broken (dist, vec_id) — both engines walk identical doubles, so the
counts hash-match.

100 TB shape: corpus-sized work is ONE map-side scoring pass producing
NUM_Q * n rows and a window shuffle keyed (qid[, in_bucket]) — NUM_Q is a
bounded eval-sample constant, and at real scale the per-query groups are
the unit of parallelism (raise NUM_Q, not the per-group width). This is an
EVAL job run on a sample, not a serving path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from doc2vec_spark.functions.vectors import (
    as_double_array,
    cosine_distance,
    lit_vector,
)
from doc2vec_spark.operators.similarity import _SRP_BUCKET_SQL, srp_bucket_expr
from doc2vec_spark.spec import QuerySpec
from doc2vec_spark.tables import load

QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


NUM_Q = 10  # evaluation query sample: vec_id 0..9
RECALL_K = 10


@_register(
    "ann_recall_at_k",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_SRP_BUCKET_SQL} AS bucket FROM e),
    q AS (SELECT vec_id AS qid, v AS qv, bucket AS qbucket
          FROM b WHERE vec_id < {NUM_Q}),
    scored AS (
      SELECT q.qid, b.vec_id, b.bucket = q.qbucket AS in_bucket,
             1 - list_dot_product(b.v, q.qv)
               / (sqrt(list_dot_product(b.v, b.v))
                  * sqrt(list_dot_product(q.qv, q.qv))) AS dist
      FROM b, q WHERE b.vec_id <> q.qid),
    ranked AS (
      SELECT qid, in_bucket,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist, vec_id)
               AS exact_rnk,
             ROW_NUMBER() OVER (PARTITION BY qid, in_bucket
                                ORDER BY dist, vec_id) AS ann_rnk
      FROM scored)
    SELECT qid AS q_vec_id,
           CAST(COUNT(*) FILTER (WHERE in_bucket AND ann_rnk <= {RECALL_K})
                AS BIGINT) AS n_ann,
           CAST(COUNT(*) FILTER (WHERE in_bucket AND ann_rnk <= {RECALL_K}
                                   AND exact_rnk <= {RECALL_K})
                AS BIGINT) AS n_hits,
           CAST(COUNT(*) FILTER (WHERE in_bucket AND ann_rnk <= {RECALL_K}
                                   AND exact_rnk <= {RECALL_K})
                * 1000000 // {RECALL_K} AS BIGINT) AS recall_ppm
    FROM ranked GROUP BY qid ORDER BY q_vec_id
    """,
    f"ANN index-quality monitor: recall@{RECALL_K} of the SRP-bucket "
    f"search rule against exact brute-force top-{RECALL_K}, per query over "
    f"a {NUM_Q}-query sample. Map-side scoring against literal query "
    "vectors (no join), two ROW_NUMBER windows over the same scored rows, "
    "integer-ppm recall — the eval job a 100 TB retrieval stack runs "
    "before trusting its index.",
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    b = e.select("vec_id", "v", srp_bucket_expr(F.col("v")).alias("bucket"))
    # bounded literal LUT: the NUM_Q sample queries' vectors and buckets
    qrows = sorted(
        b.filter(F.col("vec_id") < NUM_Q).collect(), key=lambda r: r["vec_id"]
    )
    scored = b.select(
        "vec_id",
        "bucket",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(r["vec_id"])).alias("qid"),
                        (F.col("bucket") == F.lit(int(r["bucket"]))).alias(
                            "in_bucket"
                        ),
                        cosine_distance(F.col("v"), lit_vector(r["v"])).alias(
                            "dist"
                        ),
                    )
                    for r in qrows
                ]
            ).alias("qs")
        ).alias("s"),
    ).filter(F.col("vec_id") != F.col("s.qid")).select(
        "vec_id", "s.qid", "s.in_bucket", "s.dist"
    )
    w_exact = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))
    w_ann = Window.partitionBy("qid", "in_bucket").orderBy(
        F.asc("dist"), F.asc("vec_id")
    )
    ranked = scored.select(
        "qid",
        "in_bucket",
        F.row_number().over(w_exact).alias("exact_rnk"),
        F.row_number().over(w_ann).alias("ann_rnk"),
    )
    ann_hit = F.col("in_bucket") & (F.col("ann_rnk") <= RECALL_K)
    true_hit = ann_hit & (F.col("exact_rnk") <= RECALL_K)
    return (
        ranked.groupBy(F.col("qid").alias("q_vec_id"))
        .agg(
            F.count_if(ann_hit).cast("long").alias("n_ann"),
            F.count_if(true_hit).cast("long").alias("n_hits"),
            F.floor(F.count_if(true_hit) * 1000000 / RECALL_K)
            .cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("q_vec_id")
    )
