"""Sketch-operator invariants beyond the driver's top-k hash check."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_cms_never_underestimates_any_token(spark):
    """The one-sided CMS error bound must hold for EVERY token, not just
    the top-20 the registered query reports (the sketch is deterministic,
    so a violation would be a hash-construction bug, not noise)."""
    from pyspark.sql import functions as F

    from doc2vec_spark.operators.sketches import (
        CMS_DEPTH,
        _cms_pos_expr,
    )
    from doc2vec_spark.tables import load

    docs = load(spark, SF_DIR, "documents")
    toks = docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    depth = F.explode(F.array(*[F.lit(d) for d in range(CMS_DEPTH)])).alias("d")
    pos = F.when(F.col("d") == 0, _cms_pos_expr(0))
    for d in range(1, CMS_DEPTH):
        pos = pos.when(F.col("d") == d, _cms_pos_expr(d))
    keyed = exact.select("tok", "exact_cnt", depth).withColumn("pos", pos)
    cells = keyed.groupBy("d", "pos").agg(F.sum("exact_cnt").alias("cell"))
    est = (
        keyed.join(cells, ["d", "pos"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cell").alias("cms_est"))
    )
    bad = est.filter(F.col("cms_est") < F.col("exact_cnt")).count()
    assert bad == 0
    # and with width 16 over a 31-token vocabulary, collisions must exist
    over = est.filter(F.col("cms_est") > F.col("exact_cnt")).count()
    assert over > 0


def test_ingest_admission_reasons_partition_the_batch(spark):
    """Every batch document gets exactly one verdict, reasons are
    consistent with the flags, and the precedence is
    exact_dup > near_dup > low_quality > admitted."""
    from doc2vec_spark.registry import all_queries

    rows = all_queries()["pipe_ingest_admission"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r.exact_dup:
            assert r.reason == "exact_dup" and not r.admitted
        elif r.near_dup:
            assert r.reason == "near_dup" and not r.admitted
        elif not r.quality_keep:
            assert r.reason == "low_quality" and not r.admitted
        else:
            assert r.reason == "admitted" and r.admitted
