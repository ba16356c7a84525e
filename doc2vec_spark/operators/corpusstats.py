"""Corpus distribution statistics (round 13): Zipf rank-frequency fit.

The unigram rank-frequency law (Zipf 1949: freq ~ C / rank^s, s ~ 1 for
natural language) is the standard one-number health check on a training
corpus: heavy boilerplate/template contamination flattens the curve
(s << 1), bot spam or aggressive dedup of the head steepens it, and a
drifting s between crawl snapshots is an early mixture-shift alarm
(documented across corpus-quality literature from CCNet to Gopher's
corpus analyses). This operator fits s by ordinary least squares in
log-log space over the top-RANKS vocabulary and emits the fit plus its
sufficient statistics.

Integer-exact OLS, the established LUT discipline:
- x_r = floor(ln(rank) * 1000 + 0.5) milli-nats — rank domain is the
  STATIC 1..RANKS, so the x values are one literal array baked
  identically into the Spark plan and the oracle text;
- y_r = floor(ln(freq) * 1000 + 0.5) — realized freqs are unknown at
  registration: the oracle evaluates the expression in SQL, the engine
  evaluates it ONCE per distinct realized freq in a driver-built LUT
  broadcast back (the ta_nb_classify_log pattern; CPython and DuckDB
  share the platform libm);
- slope: with Zipf's negative slope, naive integer division of a
  negative numerator would expose the one engine-semantics edge this
  repo documents (trunc-vs-floor). We therefore emit the EXPONENT
  s = -b directly from the sign-arranged form
  s_milli = (Sx*Sy - n*Sxy) * 1000 div max(D, 1), D = n*Sxx - Sx^2 —
  every operand non-negative on real input, so both engines' integer
  division agree unconditionally. intercept_milli likewise.

Scale shape: one tokenize+wordcount shuffle (behind the repartition
barrier), TakeOrderedAndProject top-RANKS, a <=RANKS-row window + LUT
join, one single-row aggregate. The corpus-sized work is exactly the
wordcount every ta_* query already pays.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from doc2vec_spark.spec import QuerySpec
from doc2vec_spark.tables import load

QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


RANKS = 256  # fit over the top-RANKS vocabulary (head of the distribution)

# static ln(rank) milli-nat LUT — identical literals on both sides
_X_MILLI: list[int] = [
    int(math.floor(math.log(r) * 1000.0 + 0.5)) for r in range(1, RANKS + 1)
]
_X_SQL = "[" + ", ".join(str(x) for x in _X_MILLI) + "]"

_Y_SQL = "CAST(floor(ln(cnt) * 1000.0 + 0.5) AS BIGINT)"


@_register(
    "ta_zipf_fit",
    f"""
    WITH vocab AS (
      SELECT tok, cnt FROM (
        SELECT tok, COUNT(*) AS cnt
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
              FROM documents)
        GROUP BY tok)
      ORDER BY cnt DESC, tok LIMIT {RANKS}),
    pts AS (
      SELECT ({_X_SQL})[rank] AS x, {_Y_SQL} AS y
      FROM (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank
            FROM vocab)),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts)
    SELECT n, sx, sy, sxy, sxx,
           CAST((sx * sy - n * sxy) * 1000
                // greatest(n * sxx - sx * sx, 1) AS BIGINT) AS zipf_s_milli,
           CAST((sy * 1000 + ((sx * sy - n * sxy) * 1000
                              // greatest(n * sxx - sx * sx, 1)) * sx)
                // greatest(n * 1000, 1) AS BIGINT) AS intercept_milli
    FROM s
    """,
    f"Zipf rank-frequency fit over the top-{RANKS} vocabulary: OLS in "
    "log-log space, integer-exact (static ln(rank) milli-nat LUT baked "
    "into both engines; realized ln(freq) via the driver-LUT broadcast "
    "join). Emits the exponent s (milli), intercept, and the sufficient "
    "statistics — the corpus-health number that flags boilerplate "
    "flattening or head-dedup steepening. One wordcount shuffle + "
    "TakeOrderedAndProject + a bounded-frame window.",
)
def ta_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doc2vec_spark.session import default_parallelism

    from doc2vec_spark.caching import scoped_cache

    docs = load(spark, sf_dir, "documents").repartition(default_parallelism())
    # scoped_cache: the bounded top-RANKS frame feeds TWO jobs (the y-LUT
    # collect and the final aggregation) — uncached, each re-runs the
    # corpus-wide tokenize+wordcount (round-13 review finding)
    vocab = scoped_cache(
        docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(RANKS)
    )
    # realized-freq ln LUT (bounded <= RANKS distinct values)
    cnts = sorted({int(r["cnt"]) for r in vocab.select("cnt").distinct().collect()})
    if not cnts:
        empty = "n long, sx long, sy long, sxy long, sxx long, " \
                "zipf_s_milli long, intercept_milli long"
        # match the oracle's aggregate-over-empty row: n=0, sums NULL
        return spark.createDataFrame(
            [(0, None, None, None, None, None, None)], empty
        )
    y_lut = spark.createDataFrame(
        [(c, int(math.floor(math.log(c) * 1000.0 + 0.5))) for c in cnts],
        "cnt long, y long",
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))  # <= RANKS rows
    pts = (
        vocab.withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(y_lut), "cnt")
        .select(
            F.element_at(
                F.array(*[F.lit(x) for x in _X_MILLI]), F.col("rank")
            ).alias("x"),
            "y",
        )
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    slope = "(sx * sy - n * sxy) * 1000 div greatest(n * sxx - sx * sx, 1)"
    return s.select(
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        F.expr(f"CAST({slope} AS BIGINT)").alias("zipf_s_milli"),
        F.expr(
            f"CAST((sy * 1000 + ({slope}) * sx) div greatest(n * 1000, 1) AS BIGINT)"
        ).alias("intercept_milli"),
    )
