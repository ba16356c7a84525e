"""Windowed top-k ("trending") analytics over the events stream (round 8).

The streaming tier (operators/windows.py + streaming/windows.py) covers
tumbling/sliding/session windows, watermark dedup and the interval join;
this module adds the remaining classic streaming-analytics composite:
per-window top-k ranking — "what's trending right now" — the shape every
monitoring/curation dashboard runs over an event firehose (top event types,
top domains being crawled, top error modules per window).

Batch-expressible exactly like the rest of the stream_* family: F.window
groupBy + a rank window function, which is also what makes it DuckDB
oracle-checkable. In Structured Streaming the same plan runs as a windowed
aggregation in update mode with the rank applied by the sink (per-window
rank needs the window closed — a watermark-delayed emission), which is why
the batch twin is the semantics oracle.

100 TB story: ONE shuffle on (window, event_type) with map-side partial
counts, then a per-window rank whose partitions are window-sized (bounded
by the type cardinality, not the event count). No global sort; the final
orderBy exists only for deterministic driver hashing of top-k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from doc2vec_spark.spec import QuerySpec
from doc2vec_spark.tables import load

QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


_TUMBLE_US = 6 * 3600 * 1_000_000  # 6 hours, matching stream_tumbling_window
TOP_K_PER_WINDOW = 3


@_register(
    "stream_windowed_topk",
    f"""
    WITH counted AS (
      SELECT make_timestamp((epoch_us(ts) // {_TUMBLE_US}) * {_TUMBLE_US})
               AS wstart,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT wstart, event_type, n,
             CAST(row_number() OVER (
               PARTITION BY wstart ORDER BY n DESC, event_type) AS BIGINT)
               AS rnk
      FROM counted
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, n, rnk
    FROM ranked WHERE rnk <= {TOP_K_PER_WINDOW}
    ORDER BY window_start, rnk
    """,
    "Per-window top-k 'trending' ranking: 6h tumbling windows, top-"
    f"{TOP_K_PER_WINDOW} event types per window by count (ties broken by "
    "type for engine-exact order). One (window, type) shuffle with "
    "map-side partial counts, then a per-window rank over type-cardinality-"
    "bounded partitions — the batch twin of a watermark-delayed streaming "
    "top-k emission.",
)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    counted = ev.groupBy(F.window("ts", "6 hours"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    rnk = F.row_number().over(
        Window.partitionBy("window").orderBy(F.desc("n"), F.asc("event_type"))
    )
    return (
        counted.withColumn("rnk", rnk.cast("long"))
        .filter(F.col("rnk") <= TOP_K_PER_WINDOW)
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "rnk",
        )
        .orderBy("window_start", "rnk")
    )
