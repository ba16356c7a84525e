"""Curation-operator behavior + plan-shape tests (round 7).

Value parity with DuckDB is covered by tests/test_parity.py; these pin the
semantics the oracle can't see (bloom false positives vs ground truth, the
permutation property of the shuffle) and the plan shapes that carry the
100 TB design claims.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(name, spark):
    from doc2vec_spark.registry import all_queries

    return all_queries()[name].fn(spark, SF_DIR)


def test_bloom_gate_never_misses_a_true_dup(spark):
    """A Bloom filter has false positives but NEVER false negatives: every
    exact duplicate must be flagged maybe_dup."""
    rows = _q("dedup_bloom_gate", spark).collect()
    assert rows, "batch source missing from fixture"
    for r in rows:
        if r.exact_dup:
            assert r.maybe_dup, f"false negative for doc {r.doc_id}"
        assert 0 <= r.n_hit <= 3


def test_bloom_gate_probe_side_broadcasts(spark):
    """The corpus position set is the broadcast side (at scale: an m-bit
    bitmap); the probe must not shuffle the batch on the position key."""
    from doc2vec_spark.plans.checks import formatted_plan

    plan = formatted_plan(_q("dedup_bloom_gate", spark))
    assert "BroadcastHashJoin" in plan


def test_quality_classifier_logit_is_integer_and_consistent(spark):
    df = _q("pipe_quality_classifier", spark)
    assert dict(df.dtypes)["logit"] == "bigint"
    for r in df.collect():
        assert r.keep == (r.logit > 0)
        assert r.uniq_toks <= r.n_words


def test_knn_graph_ranks_within_bucket(spark):
    from collections import Counter

    from doc2vec_spark.operators.curation import KNN_GRAPH_K

    rows = _q("ann_knn_graph", spark).collect()
    per_vec = Counter(r.vec_id for r in rows)
    assert max(per_vec.values()) <= KNN_GRAPH_K
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r)
    for vid, rs in by_vec.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.cosine_sim for r in rs]
        assert sims == sorted(sims, reverse=True), f"vec {vid} not ranked"
        assert all(r.neighbor_id != vid for r in rs)


def test_knn_graph_corpus_size_routing(spark, monkeypatch):
    """The k-NN graph routes bucket width by corpus size (the simhash-band
    lesson applied to SRP: fixed 256 buckets made pair work n^2/256 — 24x
    wall at the 10x rehearsal). At test SF it plans the 8-plane JVM
    signature; above the cutoff the 12-plane Arrow-batched signature
    (a pythonUDF stage) takes over."""
    from doc2vec_spark.operators import curation

    narrow_plan = (
        _q("ann_knn_graph", spark)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "srp12" not in narrow_plan
    monkeypatch.setattr(curation, "KNN_ROUTE_MAX_VECS", 10)
    wide_plan = (
        curation.QUERIES["ann_knn_graph"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "srp12" in wide_plan


def test_knn_graph_wide_route_value_parity(spark, duck, monkeypatch):
    """The wide (12-plane) branch is VALUE-checked, not just plan-checked:
    every fixture corpus sits below the 5k cutoff, so without forcing the
    route the committed suite would never execute the wide signature or its
    oracle branch — a drift between _wide plane constants in the Spark UDF
    and the SQL literals would surface only at driver scale. Forcing
    cutoff=10 on BOTH sides runs the wide path end-to-end at test SF."""
    from doc2vec_spark.operators import curation

    monkeypatch.setattr(curation, "KNN_ROUTE_MAX_VECS", 10)
    sp = curation.QUERIES["ann_knn_graph"].fn(spark, SF_DIR).toPandas()
    ora = duck.sql(curation._knn_graph_oracle(cutoff=10)).df()
    assert _norm(sp) == _norm(ora)
    assert len(sp) > 0


def test_embedding_lsh_wide_route_value_parity(spark, duck, monkeypatch):
    """Same closure for dedup_embedding_lsh's 8x8-bit wide bands: force the
    route on both sides and compare values."""
    from doc2vec_spark.operators import dedup

    monkeypatch.setattr(dedup, "EMB_LSH_ROUTE_MAX_VECS", 10)
    sp = dedup.QUERIES["dedup_embedding_lsh"].fn(spark, SF_DIR).toPandas()
    ora = duck.sql(dedup._emb_lsh_oracle(cutoff=10)).df()
    assert _norm(sp) == _norm(ora)
    assert len(sp) > 0  # planted clones guarantee pairs


def _norm(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return sorted(
        tuple(repr(v.item() if hasattr(v, "item") else v) for v in r)
        for r in pdf.itertuples(index=False, name=None)
    )


def test_global_shuffle_is_a_permutation(spark):
    """Every doc appears exactly once, and (shard_id, shard_pos) is dense
    per shard — reading shards in order replays a full permutation."""
    rows = _q("pipe_global_shuffle", spark).collect()
    doc_ids = [r.doc_id for r in rows]
    assert len(doc_ids) == len(set(doc_ids))
    shards = {}
    for r in rows:
        shards.setdefault(r.shard_id, []).append(r.shard_pos)
    for sid, ps in shards.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), f"shard {sid} sparse"


def test_global_shuffle_has_no_global_sort(spark):
    """The permutation must rank inside per-shard window partitions — a
    single-partition global sort would serialize at 100 TB (the blanket
    registry test also bans Exchange SinglePartition; this pins the window
    partitioning explicitly)."""
    from doc2vec_spark.plans.checks import formatted_plan

    plan = formatted_plan(_q("pipe_global_shuffle", spark))
    assert "Exchange SinglePartition" not in plan
    assert "hashpartitioning(shard_id" in plan
