"""Controller observability analytics (SURVEY 3.3, A4/A5/J7/T5-T7; reference
controller/store.ts:170-324) as reusable DataFrame functions over generic
runs/logs tables. The oracle-checked forms of these live in
operators/relational.py; these are the engine-API entry points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def log_level_counts(logs: DataFrame, run_id_col: str = "run_id") -> DataFrame:
    """A4 (store.ts:262-271)."""
    return logs.groupBy(run_id_col, "level").agg(F.count(F.lit(1)).alias("n"))


def daily_run_stats(runs: DataFrame, ts_col: str = "queued_at") -> DataFrame:
    """A5 (store.ts:286-324): per-(day, status) counts + avg duration, with
    FILTER-style conditional totals."""
    dur = F.col("finished_at").cast("double") - F.col("started_at").cast("double")
    return runs.groupBy(
        F.date_trunc("day", ts_col).alias("day"), "status"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(dur).alias("avg_duration_sec"),
        F.count(F.when(F.col("error_count") > 0, 1)).alias("runs_with_errors"),
    )


def last_run_per_config(runs: DataFrame) -> DataFrame:
    """J7 DISTINCT ON (store.ts:195-200)."""
    w = Window.partitionBy("config_id").orderBy(F.desc("run_id"))
    return runs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def page_runs(runs: DataFrame, before_id: int | None = None, limit: int = 100) -> DataFrame:
    """T5 keyset pagination (store.ts:170-192; cap 500)."""
    limit = min(limit, 500)
    df = runs if before_id is None else runs.filter(F.col("run_id") < before_id)
    return df.orderBy(F.desc("run_id")).limit(limit)


def page_logs(
    logs: DataFrame,
    run_id: int,
    after_seq: int | None = None,
    keyword: str | None = None,
    levels: list[str] | None = None,
    limit: int = 5000,
) -> DataFrame:
    """T6 + F16 (store.ts:224-247): seq-keyset paging with ILIKE keyword and
    level filters."""
    df = logs.filter(F.col("run_id") == run_id)
    if after_seq is not None:
        df = df.filter(F.col("seq") > after_seq)
    if levels:
        df = df.filter(F.col("level").isin(levels))
    if keyword:
        df = df.filter(F.lower(F.col("message")).contains(keyword.lower()))
    return df.orderBy("seq").limit(min(limit, 5000))


def tail_start_seq(logs: DataFrame, run_id: int, n: int) -> int | None:
    """T7 (store.ts:253-259): seq of the n-th log line from the end."""
    rows = (
        logs.filter(F.col("run_id") == run_id)
        .select("seq")
        .orderBy(F.desc("seq"))
        .limit(n)
        .agg(F.min("seq").alias("s"))
        .collect()
    )
    return rows[0]["s"] if rows else None
