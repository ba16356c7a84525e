"""Windowed event-rate anomaly detection (round 8).

The monitoring-plane operator over the event firehose: per event type,
flag tumbling windows whose event count deviates from that type's mean
rate by >= 2 standard deviations — the z-score rate alarm every ingestion
controller runs over its run/log stream (the reference's controller keeps
per-run warn/error counters, controller/job-runner.ts:194-196; this is the
corpus-statistics generalization).

Cross-engine determinism: counts, sums and squared sums are exact 64-bit
integers; z = (n*cnt - S) / sqrt(cnt*SS - S^2) touches floating point only
in ONE correctly-rounded IEEE sqrt and ONE division of exact integers —
bit-identical everywhere — then a pround(4) snap. The anomaly flag
compares the SNAPPED z, so both engines flag identically even at the
threshold boundary.

100 TB story: ONE shuffle on (type, window) with map-side partial counts,
then ONE type-keyed aggregation of three integers (cnt, S, SS) broadcast
back over the window rows — the classic two-pass mean/variance, no window
function over the full event stream, no per-event state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc2vec_spark.functions.rounding import pround, sql_round
from doc2vec_spark.spec import QuerySpec
from doc2vec_spark.tables import load

QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


_TUMBLE_US = 6 * 3600 * 1_000_000  # 6h windows, matching the stream family
Z_THRESHOLD = 2.0


_Z_SQL = "(c.n * t.cnt - t.s) / sqrt(CAST(t.cnt * t.ss - t.s * t.s AS DOUBLE))"

_ANOMALY_ORACLE = f"""
WITH counted AS (
  SELECT make_timestamp((epoch_us(ts) // {_TUMBLE_US}) * {_TUMBLE_US})
           AS wstart,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(n) AS BIGINT) AS s,
         CAST(SUM(n * n) AS BIGINT) AS ss
  FROM counted GROUP BY event_type
),
scored AS (
  SELECT c.wstart, c.event_type, c.n,
         CASE WHEN t.cnt * t.ss - t.s * t.s = 0 THEN 0.0
              ELSE {sql_round(_Z_SQL, 4)}
         END + 0.0 AS z
  FROM counted c JOIN stats t USING (event_type)
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, n, z,
       (z >= {Z_THRESHOLD} OR z <= -{Z_THRESHOLD}) AS is_anomaly
FROM scored
ORDER BY window_start, event_type
"""


@_register(
    "ev_rate_anomaly",
    _ANOMALY_ORACLE,
    "Windowed event-rate z-score anomaly flags: per (type, 6h window) "
    "counts, per-type integer moment aggregation (cnt, sum, sum-of-"
    "squares), z = (n*cnt - S)/sqrt(cnt*SS - S^2) — one IEEE sqrt + one "
    "division over exact integers, pround(4)-snapped, flag compared on the "
    "snapped value so both engines alarm identically at the boundary. "
    "Constant-rate types (zero variance) score 0. Two shuffles total; the "
    "per-type stats table is broadcast-sized.",
)
def ev_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    counted = ev.groupBy(F.window("ts", "6 hours"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = counted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    var_num = F.col("cnt") * F.col("ss") - F.col("s") * F.col("s")
    z_raw = (F.col("n") * F.col("cnt") - F.col("s")) / F.sqrt(
        var_num.cast("double")
    )
    z = (
        F.when(var_num == 0, F.lit(0.0)).otherwise(pround(z_raw, 4)) + F.lit(0.0)
    ).alias("z")
    return (
        counted.join(F.broadcast(stats), "event_type")
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            z,
        )
        .withColumn(
            "is_anomaly",
            (F.col("z") >= Z_THRESHOLD) | (F.col("z") <= -Z_THRESHOLD),
        )
        .orderBy("window_start", "event_type")
    )
