"""Round-12 operators: batched BPE training (the 32k-merge job-count
story, VERDICT r11 #5) and its equivalence/derivability contracts."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_batched_cap1_reduces_to_sequential_sennrich(spark):
    """With a batch cap of 1 the disjointness constraint is vacuous, so the
    batched trainer IS sequential Sennrich: identical merge list, same
    order. This pins that the relaxation is only the within-round
    deferral, not a different algorithm."""
    from doc2vec_spark.operators.bpe import train_merges, train_merges_batched

    seq = train_merges(spark, SF_DIR)
    bat1 = train_merges_batched(spark, SF_DIR, cap=1)
    assert bat1 == seq and len(seq) > 0


def test_batched_bpe_merges_disjoint_and_bounded(spark):
    """Batched training contracts: (a) first merge equals sequential's
    (round 1's top candidate is always accepted first); (b) merges are
    unique and bounded by NUM_MERGES; (c) every learned pair's symbols are
    derivable — each side is a single char or the concatenation of an
    EARLIER merge (multi-level property, same as sequential)."""
    from doc2vec_spark.operators.bpe import (
        NUM_MERGES,
        train_merges,
        train_merges_batched,
    )

    seq = train_merges(spark, SF_DIR)
    bat = train_merges_batched(spark, SF_DIR)
    assert bat[0] == seq[0]
    assert len(bat) == len(set(bat)) <= NUM_MERGES
    derivable = set()
    for a, b in bat:
        assert (len(a) == 1 or a in derivable) and (len(b) == 1 or b in derivable)
        derivable.add(a + b)


def test_batched_bpe_apply_pieces_derivable(spark):
    """Segmentation under the batched merge list: every multi-char cell is
    exactly a||b of a learned merge (the anchored-replace derivability
    guarantee carries over unchanged)."""
    from doc2vec_spark.operators.bpe import (
        SEP,
        _cand_words,
        _seg_col,
        train_merges_batched,
    )

    merges = train_merges_batched(spark, SF_DIR)
    pieces = {p for (a, b) in merges for p in (a + b,)}
    rows = (
        _cand_words(spark, SF_DIR)
        .select(F.split(_seg_col(F.col("word"), merges), SEP).alias("cells"))
        .collect()
    )
    assert rows
    for r in rows:
        for c in r["cells"]:
            assert len(c) == 1 or c in pieces, c


def test_quality_surrogate_exactly_monotone_with_q(spark):
    """The canonical-select fusion rests on one claim: the integer surrogate
    s = 4a+3b+3c orders EXACTLY like the double q = 0.4a+0.3b+0.3c — equal
    s <=> equal double q, and s < s' <=> q < q' — so max_by over the packed
    long key picks the same survivor the oracle's ORDER BY q DESC does.
    Exhaustive over all 8 indicator combinations, evaluated through Spark's
    own double arithmetic (the engine that produces both columns)."""
    from itertools import product

    rows = []
    for i, (a, b, c) in enumerate(product([0, 1], repeat=3)):
        rows.append((i, a, b, c))
    df = spark.createDataFrame(rows, "id long, a int, b int, c int")
    got = df.select(
        "id",
        (
            F.when(F.col("a") == 1, 0.4).otherwise(0.0)
            + F.when(F.col("b") == 1, 0.3).otherwise(0.0)
            + F.when(F.col("c") == 1, 0.3).otherwise(0.0)
        ).alias("q"),
        (
            F.when(F.col("a") == 1, 4).otherwise(0)
            + F.when(F.col("b") == 1, 3).otherwise(0)
            + F.when(F.col("c") == 1, 3).otherwise(0)
        ).alias("s"),
    ).collect()
    pairs = [(r["q"], r["s"]) for r in got]
    for q1, s1 in pairs:
        for q2, s2 in pairs:
            assert (q1 == q2) == (s1 == s2), (q1, s1, q2, s2)
            assert (q1 < q2) == (s1 < s2), (q1, s1, q2, s2)


def test_batched_bpe_job_count_cut(spark, monkeypatch):
    """THE point of the variant: scheduler jobs scale with RECOUNT ROUNDS,
    not merges — on the DISTRIBUTED (unbounded-vocabulary) path, which is
    forced here through the _bounded_vocab gate: since r19, measured-small
    corpora train driver-side and both variants cost O(1) jobs, so the
    cut only manifests at production vocabulary scale. Measured on this
    env at NUM_MERGES=8/cap=3: sequential 19 jobs, batched 9 (3 rounds of
    3+3+2). Bars allow scheduling variance while pinning the cut; at a
    32k-merge production train the same ratio is the difference between
    32k jobs and ~1k."""
    import doc2vec_spark.operators.bpe as bpe

    monkeypatch.setattr(bpe, "_collectable_vocab", lambda sf_dir, cand: False)
    sc = spark.sparkContext
    sc.setJobGroup("bpe_seq_probe", "p", False)
    try:
        seq = bpe.train_merges(spark, SF_DIR)
    finally:
        sc.setJobGroup(None, None, False)
    sc.setJobGroup("bpe_bat_probe", "p", False)
    try:
        bat = bpe.train_merges_batched(spark, SF_DIR)
    finally:
        sc.setJobGroup(None, None, False)
    assert len(seq) == len(bat) > 0
    n_seq = len(sc.statusTracker().getJobIdsForGroup("bpe_seq_probe"))
    n_bat = len(sc.statusTracker().getJobIdsForGroup("bpe_bat_probe"))
    assert n_bat <= 12, f"batched job count regressed: {n_bat} (measured 9)"
    assert n_bat <= n_seq - 4, f"batched {n_bat} vs sequential {n_seq}: cut lost"
    # and the r19 bounded-vocabulary path is O(1) jobs for BOTH variants
    monkeypatch.setattr(bpe, "_collectable_vocab", lambda sf_dir, cand: True)
    sc.setJobGroup("bpe_local_probe", "p", False)
    try:
        loc = bpe.train_merges(spark, SF_DIR)
    finally:
        sc.setJobGroup(None, None, False)
    assert loc == seq
    n_loc = len(sc.statusTracker().getJobIdsForGroup("bpe_local_probe"))
    # the corpus word aggregation under AQE is 3-4 materialization jobs;
    # the loop itself adds ZERO — the count must not scale with NUM_MERGES
    assert n_loc <= 5, f"bounded-vocab path should be O(1) jobs, got {n_loc}"


def test_coreset_fps_invariants(spark):
    """k-center contracts: (a) selected ids distinct, ranks 1..K; (b) the
    coverage radius is monotone NON-INCREASING over ranks (each added
    center can only shrink the farthest gap); (c) coverage populations sum
    to the full table and every center sits at distance 0 in its own cell;
    (d) the max assigned distance is bounded by the LAST selection radius
    (the Gonzalez guarantee: after k centers, no point is farther than the
    k-th pick's max-min distance)."""
    from doc2vec_spark.operators.coreset import (
        CORESET_K,
        pipe_coreset_coverage,
        pipe_coreset_fps,
    )
    from doc2vec_spark.tables import load

    sel = pipe_coreset_fps(spark, SF_DIR).collect()
    assert [r["rank"] for r in sel] == list(range(1, CORESET_K + 1))
    ids = [r["vec_id"] for r in sel]
    assert len(set(ids)) == CORESET_K
    radii = [r["radius"] for r in sel]
    assert radii[0] is None and all(r is not None for r in radii[1:])
    assert all(a >= b for a, b in zip(radii[1:], radii[2:]))

    cov = pipe_coreset_coverage(spark, SF_DIR).collect()
    n_total = load(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_assigned"] for r in cov) == n_total
    assert {r["center_vec_id"] for r in cov} <= set(ids)
    # the Gonzalez bound, in integer micro-units
    last_radius_d6 = round(radii[-1] * 1_000_000)
    assert all(r["mean_dist_ppm"] <= last_radius_d6 for r in cov)


def test_coreset_fps_is_map_only_per_round(spark):
    """Plan shape: one job per selection round (seed + K-1 picks + cache
    fill), each a map-only scan + TakeOrderedAndProject — no shuffle
    inside a round. Bar allows scheduling variance over the measured
    count."""
    from doc2vec_spark.operators.coreset import CORESET_K, fps_select

    sc = spark.sparkContext
    group = "coreset_probe"
    sc.setJobGroup(group, "p", False)
    try:
        sel = fps_select(spark, SF_DIR)
    finally:
        sc.setJobGroup(None, None, False)
    assert len(sel) == CORESET_K
    n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    assert n_jobs <= CORESET_K + 3, f"FPS fanned out: {n_jobs} jobs"


def test_kmeans_train_improves_inertia_and_partitions(spark):
    """Lloyd contracts: (a) the trained centroid table is exactly K x dim
    all-integer rows; (b) assignment partitions the table (every vector in
    exactly one cell); (c) total inertia (sum of assignment d6) under the
    TRAINED centroids is <= inertia under the FPS INIT centroids — each
    Lloyd step cannot increase the k-means objective, and the integer
    micro-unit rounding preserves the comparison at this separation."""
    from doc2vec_spark.operators.coreset import fps_select
    from doc2vec_spark.operators.kmeans import (
        KM_K,
        _FP,
        _d6_int,
        ann_kmeans_assign,
        ann_kmeans_train,
    )
    from doc2vec_spark.tables import load

    cent_rows = ann_kmeans_train(spark, SF_DIR).collect()
    dims = {r["dim"] for r in cent_rows}
    assert {r["cell"] for r in cent_rows} == set(range(KM_K))
    assert len(cent_rows) == KM_K * len(dims)

    assign = ann_kmeans_assign(spark, SF_DIR).collect()
    n_total = load(spark, SF_DIR, "embeddings").count()
    assert len(assign) == n_total
    assert {r["cell"] for r in assign} <= set(range(KM_K))
    trained_inertia = sum(r["dist_d6"] for r in assign)

    from doc2vec_spark.operators.coreset import embeddings_with_norms

    init = fps_select(spark, SF_DIR, k=KM_K)
    e = embeddings_with_norms(spark, SF_DIR)
    o = F.least(
        *[_d6_int(F.col("v"), F.col("nv"), vec) for _rank, _vid, _d6, vec in init]
    )
    init_inertia = e.select(F.sum(o).alias("s")).collect()[0]["s"]
    assert trained_inertia <= init_inertia, (trained_inertia, init_inertia)


# ---------------------------------------------------------------------------
# NB classifier / novelty / PPS sampling (round 12, second wave)
# ---------------------------------------------------------------------------


def test_nb_classifier_one_prediction_per_heldout_doc(spark):
    """Exactly one argmax row per held-out doc; confusion marginals equal the
    per-doc predictions; correctness flag is consistent with the labels."""
    from doc2vec_spark.operators.classifier import (
        TRAIN_BUCKETS,
        _bucket,
        ta_nb_classify,
        ta_nb_confusion,
    )
    from doc2vec_spark.tables import load

    preds = ta_nb_classify(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents")
    heldout = docs.filter(_bucket() >= TRAIN_BUCKETS).count()
    # every held-out doc whose tokens intersect the training vocabulary gets
    # exactly one prediction (shared synthetic vocab -> that is all of them)
    assert len(preds) == heldout > 0
    assert len({r["doc_id"] for r in preds}) == len(preds)
    for r in preds:
        assert r["correct"] == int(r["predicted"] == r["lang"])

    conf = ta_nb_confusion(spark, SF_DIR).collect()
    assert sum(r["n"] for r in conf) == len(preds)
    langs = {r["lang"] for r in preds}
    assert {r["predicted"] for r in conf} <= langs


def test_nb_grid_fanout_is_map_only(spark):
    """The vocab x class grid must never plan a CartesianProduct or
    BroadcastNestedLoopJoin (the blanket scale contract): the bounded
    class table fans out as a literal struct-array explode, and no stage
    serializes to a single partition."""
    from doc2vec_spark.operators.classifier import ta_nb_classify

    plan = ta_nb_classify(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_ngram_novelty_bounds_and_uniqueness_definition(spark):
    """novelty_bp in [0, 10000]; n_unique <= n_shingles; a doc made of
    globally-unique shingles scores 10000."""
    from doc2vec_spark.operators.classifier import ta_ngram_novelty

    rows = ta_ngram_novelty(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_unique"] <= r["n_shingles"]
        assert 0 <= r["novelty_bp"] <= 10000
        assert r["novelty_bp"] == (10000 * r["n_unique"]) // r["n_shingles"]


def test_pps_sample_exact_proportionality(spark):
    """Systematic PPS invariants: total draws == floor(T/step) grid points,
    and every doc's draw count is floor or ceil of w/step (zero-variance
    proportionality — the property that distinguishes systematic PPS from
    Poisson/bernoulli sampling)."""
    from doc2vec_spark.operators.sampling import SAMPLE_K, pipe_pps_systematic_sample
    from doc2vec_spark.tables import load

    docs = load(spark, SF_DIR, "documents")
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    step = total // SAMPLE_K
    rows = pipe_pps_systematic_sample(spark, SF_DIR).collect()
    assert sum(r["times_drawn"] for r in rows) == total // step
    for r in rows:
        assert r["times_drawn"] in (r["w"] // step, r["w"] // step + 1)


def test_pps_prefix_sum_has_no_global_window(spark):
    """The scale property: the cumsum window is PARTITIONED (by the md5
    bucket) — a single global-order window would serialize the corpus
    through one partition."""
    from doc2vec_spark.operators.sampling import pipe_pps_systematic_sample

    plan = (
        pipe_pps_systematic_sample(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    # every windowspecdefinition must carry the bucket partition key
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "bucket" in spec, plan


def test_kmeans_separation_monitor_invariants(spark):
    """Population conservation across cells; nearest <= second-nearest by
    construction so the ratio is <= 10000 bp; cells match the trained k."""
    from doc2vec_spark.operators.kmeans import KM_K, ann_kmeans_separation
    from doc2vec_spark.tables import load

    rows = ann_kmeans_separation(spark, SF_DIR).collect()
    n_total = load(spark, SF_DIR, "embeddings").count()
    assert sum(r["n"] for r in rows) == n_total
    assert {r["cell"] for r in rows} <= set(range(KM_K))
    for r in rows:
        assert 0 <= r["sum_d1"] <= r["sum_d2"]
        assert 0 <= r["separation_bp"] <= 10000


def test_shard_skew_audit_conserves_and_flags(spark):
    """load_bp averages to ~10000 by construction (sum of loads == 10000 *
    n_shards within integer-floor dust); straggler flag is exactly the
    >SKEW_FLAG_BP predicate; token totals conserve vs the packing."""
    from doc2vec_spark.operators.pipeline import (
        SKEW_FLAG_BP,
        pipe_shard_pack,
        pipe_shard_skew,
    )

    shards = pipe_shard_skew(spark, SF_DIR).collect()
    packed_tokens = (
        pipe_shard_pack(spark, SF_DIR).agg(F.sum("n_tokens")).collect()[0][0]
    )
    assert sum(r["shard_tokens"] for r in shards) == packed_tokens
    n = len(shards)
    total_bp = sum(r["load_bp"] for r in shards)
    # each load_bp floors: sum in (10000*n - n, 10000*n]
    assert 10000 * n - n < total_bp <= 10000 * n
    for r in shards:
        assert r["straggler"] == int(r["load_bp"] > SKEW_FLAG_BP)


def test_mixture_drift_shares_sum_and_sign(spark):
    """Achieved shares sum to ~10000 bp (floor dust), drift = achieved -
    target exactly, and the sampled token totals agree with the sampler."""
    from doc2vec_spark.operators.pipeline import (
        pipe_mixture_drift,
        pipe_mixture_sample,
    )

    rows = pipe_mixture_drift(spark, SF_DIR).collect()
    n = len(rows)
    assert n > 0
    s = sum(r["achieved_bp"] for r in rows)
    assert 10000 - n < s <= 10000
    for r in rows:
        assert r["drift_bp"] == r["achieved_bp"] - r["target_bp"]
    sampled = (
        pipe_mixture_sample(spark, SF_DIR)
        .groupBy("lang")
        .agg(F.sum("n_tok").alias("t"))
        .collect()
    )
    by_lang = {r["lang"]: r["t"] for r in sampled}
    for r in rows:
        assert r["got_tokens"] == by_lang[r["lang"]]


def test_trained_ivf_search_self_retrieval_and_cell_consistency(spark):
    """The query vector itself is rank 1 at distance 0, every hit shares the
    query's trained cell, and ranks are the dense 1..5."""
    from doc2vec_spark.operators.kmeans import (
        ann_kmeans_assign,
        ann_ivf_search_trained,
    )

    hits = ann_ivf_search_trained(spark, SF_DIR).collect()
    assert [r["rnk"] for r in hits] == list(range(1, len(hits) + 1))
    assert hits[0]["vec_id"] == 0 and hits[0]["distance"] == 0.0
    cells = {r["vec_id"]: r["cell"] for r in ann_kmeans_assign(spark, SF_DIR).collect()}
    qcell = cells[0]
    for r in hits:
        assert cells[r["vec_id"]] == qcell


def test_prototype_prune_flags_exact_decile_per_cell(spark):
    """Within every cell: exactly floor(n_cell/10) flagged, and every flagged
    vector is at least as far from the prototype as every kept one."""
    from collections import defaultdict

    from doc2vec_spark.operators.kmeans import PRUNE_DECILE, pipe_prototype_prune
    from doc2vec_spark.tables import load

    rows = pipe_prototype_prune(spark, SF_DIR).collect()
    assert len(rows) == load(spark, SF_DIR, "embeddings").count()
    cells = defaultdict(list)
    for r in rows:
        cells[r["cell"]].append(r)
    for cell, rs in cells.items():
        flagged = [r for r in rs if r["prune"]]
        assert len(flagged) == len(rs) // PRUNE_DECILE
        if flagged:
            min_flagged = min(r["dist_d6"] for r in flagged)
            kept_max = max((r["dist_d6"] for r in rs if not r["prune"]), default=0)
            assert min_flagged >= kept_max or any(
                r["dist_d6"] == min_flagged for r in rs if not r["prune"]
            )  # ties broken by vec_id can straddle the boundary at equal d6


def test_hll_merge_property_holds_on_every_register(spark):
    """Register-wise MAX of the two half sketches equals the whole-table
    sketch on every register — the mergeability that makes HLL a valid
    distributed aggregate. Also: both halves are non-trivial (each owns at
    least one register's max on this corpus)."""
    from doc2vec_spark.operators.sketchmerge import sk_hll_merge
    from doc2vec_spark.operators.sketches import HLL_M

    rows = sk_hll_merge(spark, SF_DIR).collect()
    assert len(rows) == HLL_M
    assert all(r["consistent"] == 1 for r in rows)
    for r in rows:
        assert r["r_merged"] == max(r["r_half0"], r["r_half1"]) == r["r_whole"]


def test_normalized_dedup_is_coarser_than_exact(spark):
    """Normalization only merges: the normalized grouping has at most as
    many groups as byte-exact dedup, covers every document, and every
    group's representative is its min doc_id."""
    from doc2vec_spark.operators.dedup import dedup_exact
    from doc2vec_spark.operators.normdedup import dedup_exact_normalized
    from doc2vec_spark.tables import load

    norm = dedup_exact_normalized(spark, SF_DIR).collect()
    exact = dedup_exact(spark, SF_DIR).count()
    n_docs = load(spark, SF_DIR, "documents").count()
    assert sum(r["group_size"] for r in norm) == n_docs
    assert len(norm) <= exact
    assert all(r["group_size"] >= 1 and r["norm_len"] >= 0 for r in norm)


def test_pps_multi_draw_when_weight_exceeds_step(spark):
    """A weight larger than the sampling step must be drawn multiple times
    (floor/ceil(k*w/T)) — the PPS branch the driver corpus never exercises
    (its max n_chars is far below the step). One whale at ~half the total
    mass with k=10 must be drawn ~5 times, and total draws == floor(T/step)."""
    from doc2vec_spark.operators.sampling import systematic_pps

    rows = [(i, "src", 10) for i in range(100)] + [(1000, "whale", 1000)]
    line = spark.createDataFrame(rows, "doc_id long, source string, w long")
    k = 10
    total = 100 * 10 + 1000
    step = total // k
    out = {r["doc_id"]: r for r in systematic_pps(spark, line, k).collect()}
    whale = out[1000]
    assert whale["times_drawn"] in (1000 // step, 1000 // step + 1)
    assert whale["times_drawn"] >= 5
    assert sum(r["times_drawn"] for r in out.values()) == total // step


def test_pps_degenerate_total_below_k_samples_everything(spark):
    """Total mass < k clamps the step to 1 (the correct PPS limit: one grid
    point per unit of mass -> every doc drawn exactly w times) instead of
    diverging between a NULL-division empty sample and an oracle error."""
    from doc2vec_spark.operators.sampling import systematic_pps

    line = spark.createDataFrame(
        [(i, "s", 1) for i in range(5)], "doc_id long, source string, w long"
    )
    out = systematic_pps(spark, line, k=100).collect()
    assert len(out) == 5
    assert all(r["times_drawn"] == 1 for r in out)


def test_value_histogram_partitions_all_events_into_valid_buckets(spark):
    """Every event lands in exactly one bucket in [0, B-1]; counts conserve;
    bucket edges are the exact integer formula."""
    from doc2vec_spark.operators.histogram import HIST_BUCKETS, ev_value_histogram
    from doc2vec_spark.tables import load

    rows = ev_value_histogram(spark, SF_DIR).collect()
    n_events = load(spark, SF_DIR, "events").count()
    assert sum(r["n"] for r in rows) == n_events
    assert all(0 <= r["bucket"] < HIST_BUCKETS for r in rows)
