"""Extension-operator tests: approx-distinct accuracy, MLlib ANN recall."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_approx_count_distinct_accuracy(spark):
    from doc2vec_spark.registry import all_queries
    from doc2vec_spark.tables import load

    rows = {
        r["event_type"]: r
        for r in all_queries()["ext_approx_count_distinct"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for k in exact:
        assert rows[k]["n_users_exact"] == exact[k]
        assert rows[k]["approx_within_5pct"]  # the hash-checked contract


def test_approx_quantile_rank_bound(spark):
    from doc2vec_spark.registry import all_queries

    for r in all_queries()["ext_approx_quantile"].fn(spark, SF_DIR).collect():
        assert r["ap50_within_rank_2pct"] and r["ap95_within_rank_2pct"], r


def test_mllib_lsh_neighbors_contain_exact_top1(spark):
    from doc2vec_spark.mllib_ann import approx_neighbors
    from doc2vec_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings")
    got = approx_neighbors(emb, query_vec_id=0, k=5).collect()
    assert len(got) == 5
    # the query vector itself is its own nearest neighbor at distance 0
    assert got[0]["vec_id"] == 0 and got[0]["distance"] == pytest.approx(0.0)


def test_mllib_similarity_join_no_cross(spark):
    from doc2vec_spark.mllib_ann import similarity_self_join
    from doc2vec_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings")
    pairs = similarity_self_join(emb, threshold=8.0)
    rows = pairs.collect()
    assert all(r["vec_a"] < r["vec_b"] for r in rows)
    assert all(r["dist"] <= 8.0 for r in rows)


def test_mllib_kmeans_cells(spark):
    from doc2vec_spark.mllib_ann import ivf_kmeans_cells
    from doc2vec_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings")
    cells = ivf_kmeans_cells(emb, k=8).collect()
    assert 1 <= len(cells) <= 8
    assert sum(r["n"] for r in cells) == emb.count()


def test_scrub_pii_redacts_and_counts(spark):
    from doc2vec_spark.operators.textanalysis import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d+x@e.io, call +1 (555) 123-4567"),
            (2, "server at 10.0.0.1 and 192.168.1.254 ok"),
            (3, "clean text only"),
        ],
        "id long, text string",
    )
    rows = {r.id: r for r in scrub_pii(df).collect()}
    assert rows[1].n_email == 2 and rows[1].n_phone == 1
    assert "<EMAIL>" in rows[1].scrubbed and "<PHONE>" in rows[1].scrubbed
    assert "a@b.co" not in rows[1].scrubbed
    assert rows[2].n_ipv4 == 2 and rows[2].scrubbed.count("<IPV4>") == 2
    assert rows[3].scrubbed == "clean text only"
    assert rows[3].n_email == rows[3].n_ipv4 == rows[3].n_phone == 0
