"""Focused tests for the r21 optimization-round internals.

Each optimization that changed an operator's internals gets a pin here:
the schema memo's invalidation contract, bitwise equality of the fast
literal-vector / baked-norm paths against the original expressions, the
fused single-window ranking, textrank's conf-scope hygiene, and the
measurement-module re-exports.
"""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from doc2vec_spark.session import get_spark

    return get_spark("test-r21-opt")


def _bits(x: float) -> bytes:
    return struct.pack(">d", x)


def test_schema_memo_invalidates_on_rewrite(spark, tmp_path):
    """A table rewritten AT THE SAME PATH with a different schema must
    re-infer — the memo key carries the path's (mtime_ns, size) stat
    signature, so a stale schema is never served."""
    import shutil

    from doc2vec_spark import tables

    root = tmp_path / "sf"
    root.mkdir()
    p = root / "documents.parquet"
    spark.range(3).select(F.col("id").alias("doc_id")).toPandas().to_parquet(p)
    df1 = tables.load(spark, str(root), "documents")
    assert df1.columns == ["doc_id"]
    # rewrite with a different schema at the same path
    p.unlink()
    spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("extra")
    ).toPandas().to_parquet(p)
    df2 = tables.load(spark, str(root), "documents")
    assert sorted(df2.columns) == ["doc_id", "extra"], (
        "schema memo served a stale schema after an in-place rewrite"
    )
    shutil.rmtree(root)


def test_schema_memo_consistent_repeat_loads(spark):
    from doc2vec_spark import tables

    a = tables.load(spark, SF_DIR, "lineitem").schema
    b = tables.load(spark, SF_DIR, "lineitem").schema
    assert a == b


def test_lit_vector_bitwise_equals_lit_path(spark):
    """The single-parse SQL literal array must be bit-identical to the
    per-element F.lit construction, including negatives, subnormals and
    large exponents; inf/nan take the exact fallback path."""
    from doc2vec_spark.functions.vectors import lit_vector

    vals = [0.1, -1.5, 1e-300, 5e-324, 2.5e300, -3.141592653589793, 0.0, -0.0]
    row = (
        spark.range(1)
        .select(
            lit_vector(vals).alias("fast"),
            F.array(*[F.lit(float(v)) for v in vals]).alias("slow"),
        )
        .first()
    )
    assert [_bits(x) for x in row["fast"]] == [_bits(x) for x in row["slow"]]
    # non-finite fallback still yields the right values
    from math import inf, isnan

    row2 = spark.range(1).select(lit_vector([1.0, inf, float("nan")]).alias("v")).first()
    assert row2["v"][0] == 1.0 and row2["v"][1] == inf and isnan(row2["v"][2])


def test_cosine_distance_lit_bitwise_equals_inline_form(spark):
    """Baking the literal query's norm as a Python constant must reproduce
    the inline expression bit-for-bit (same left fold, IEEE sqrt, same
    term order)."""
    from doc2vec_spark.functions.vectors import (
        as_double_array,
        cosine_distance,
        cosine_distance_lit,
        lit_vector,
    )
    from doc2vec_spark.tables import load

    e = load(spark, SF_DIR, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    qv = [float(x) for x in e.orderBy("vec_id").first()["v"]]
    rows = (
        e.select(
            cosine_distance(F.col("v"), lit_vector(qv)).alias("slow"),
            cosine_distance_lit(F.col("v"), qv).alias("fast"),
        )
        .collect()
    )
    assert rows and all(_bits(r["slow"]) == _bits(r["fast"]) for r in rows)


def test_ranked_single_window_equals_two_windows(spark):
    """The fused row_number + conditional-running-count window must agree
    with the original two-window form on every flag-TRUE row (the only rows
    any consumer reads)."""
    from pyspark.sql.window import Window

    from doc2vec_spark.operators.evalmetrics import _ranked_single_window

    data = [
        (qid, vid, (vid * 7 + qid) % 3 == 0, float((vid * 13 + qid * 5) % 17))
        for qid in range(3)
        for vid in range(40)
    ]
    scored = spark.createDataFrame(
        data, "qid int, vec_id int, in_bucket boolean, dist double"
    )
    fused = _ranked_single_window(scored, "in_bucket")
    w_exact = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("vec_id"))
    w_ann = Window.partitionBy("qid", "in_bucket").orderBy(
        F.asc("dist"), F.asc("vec_id")
    )
    ref = scored.select(
        "qid",
        "in_bucket",
        F.row_number().over(w_exact).alias("exact_rnk"),
        F.row_number().over(w_ann).alias("ann_rnk"),
    )
    key = lambda r: (r["qid"], r["exact_rnk"])  # noqa: E731
    fused_rows = {key(r): r["ann_rnk"] for r in fused.collect() if r["in_bucket"]}
    ref_rows = {key(r): r["ann_rnk"] for r in ref.collect() if r["in_bucket"]}
    assert fused_rows == ref_rows and fused_rows


def test_textrank_restores_session_confs(spark):
    """The static-loop scope must restore adaptive/shuffle-partition/
    broadcast-threshold conf state even though it materializes inside the
    invocation (the ADVICE r9 scoping rule)."""
    from doc2vec_spark.operators.textrank import ta_textrank

    before = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    assert ta_textrank(spark, SF_DIR).count() > 0
    after = {k: spark.conf.get(k, None) for k in before}
    assert after == before


def test_measurement_reexports_single_sourced():
    """dedup.py / pipeline.py must serve the SAME objects measurement.py
    defines (the VERDICT r20 #6 extraction keeps one definition)."""
    from doc2vec_spark import measurement
    from doc2vec_spark.operators import dedup, pipeline

    assert dedup.corpus_parquet_bytes is measurement.corpus_parquet_bytes
    assert dedup.corpus_agg_partitions is measurement.corpus_agg_partitions
    assert (
        dedup.POSTING_BYTES_PER_PARTITION
        is measurement.POSTING_BYTES_PER_PARTITION
    )
    assert pipeline._small_corpus(SF_DIR) == measurement.small_corpus(SF_DIR)


def test_q_structs_distance_matches_cosine(spark):
    """The factored eval-scoring struct distance (row norm bound once,
    query norm baked) is bit-identical to cosine_distance against the same
    literal vector."""
    from doc2vec_spark.functions.vectors import (
        as_double_array,
        cosine_distance,
        l2_norm,
        lit_vector,
    )
    from doc2vec_spark.operators.evalmetrics import _q_structs
    from doc2vec_spark.tables import load

    e = load(spark, SF_DIR, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    b = e.select("vec_id", "v", l2_norm(F.col("v")).alias("nv"), F.lit(0).alias("bucket"))
    qrows = sorted(
        b.filter(F.col("vec_id") < 2).collect(), key=lambda r: r["vec_id"]
    )
    arr = _q_structs(qrows, "bucket", "in_bucket")
    rows = (
        b.select("vec_id", "v", F.explode(arr).alias("s"))
        .select("vec_id", "s.qid", "s.dist", "v")
        .collect()
    )
    by_q = {r["vec_id"]: [float(x) for x in r["v"]] for r in qrows}
    ref = {
        (r["vec_id"], r["qid"]): r["d"]
        for qid, qv in by_q.items()
        for r in b.select(
            "vec_id", F.lit(qid).alias("qid"), cosine_distance(F.col("v"), lit_vector(qv)).alias("d")
        ).collect()
    }
    assert rows and all(
        _bits(r["dist"]) == _bits(ref[(r["vec_id"], r["qid"])]) for r in rows
    )
