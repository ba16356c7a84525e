"""Structured Streaming path: AvailableNow drain of the events parquet must
agree with the batch (oracle-checked) forms of the same aggregations."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"


def test_tumbling_counts_match_batch(spark, tmp_path):
    from doc2vec_spark.streaming.windows import tumbling_counts
    from doc2vec_spark.tables import load

    got = tumbling_counts(spark, EVENTS, str(tmp_path / "ck1"), name="t_tumbling")
    batch = (
        load(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_dedup_keys_unique(spark, tmp_path):
    from doc2vec_spark.streaming.windows import streaming_dedup
    from doc2vec_spark.tables import load

    got = streaming_dedup(spark, EVENTS, str(tmp_path / "ck2"), name="t_dedup")
    dup = got.groupBy("user_id", "event_type").count().filter(F.col("count") > 1).count()
    assert dup == 0
    n_keys = load(spark, SF_DIR, "events").select("user_id", "event_type").distinct().count()
    assert got.count() == n_keys


def test_stateful_running_totals(spark, tmp_path):
    from doc2vec_spark.streaming.windows import running_user_totals
    from doc2vec_spark.tables import load

    got = running_user_totals(spark, EVENTS, str(tmp_path / "ck3"), name="t_running")
    # final state per user == batch aggregate
    final = got.groupBy("user_id").agg(F.max("events_seen").alias("events_seen"))
    batch = (
        load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    j = final.join(batch, "user_id")
    assert j.filter(F.col("events_seen") != F.col("n")).count() == 0
