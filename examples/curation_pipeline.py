"""Curation-pipeline tour: the LLM-training-data plane on the test corpus.

Chains the operators a 100 TB curation run would schedule, each one a
registry entry with a DuckDB oracle (see COVERAGE.md): near-dup detection,
line-level cleaning, quality gating, token-budget allocation, split
assignment, tokenizer training/fit, retrieval-quality readouts, and a
windowed-HLL traffic readout — printed as a one-screen
corpus report.

Run:  python examples/curation_pipeline.py [sf_dir]
Defaults to /root/testdata/sf0.001; tests/test_examples.py executes it.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from pyspark.sql import functions as F

    from doc2vec_spark.registry import all_queries
    from doc2vec_spark.session import get_spark

    spark = get_spark("doc2vec-spark-curation")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    print(f"== corpus report: {sf_dir} ==")

    dups = q["dedup_minhash_lsh"].fn(spark, sf_dir).count()
    print(f"near-duplicate pairs (MinHash LSH): {dups}")

    cleaned = q["dedup_line_level"].fn(spark, sf_dir)
    removed = cleaned.agg(F.sum("removed_lines")).first()[0]
    print(f"line-level dedup: {removed} duplicated lines removed corpus-wide")

    quality = q["pipe_quality_classifier"].fn(spark, sf_dir)
    kept = quality.filter(F.col("keep")).count()
    print(f"quality gate: {kept}/{quality.count()} documents kept")

    print("token-budget allocation (repeat-capped waterfill):")
    for r in q["pipe_data_budget"].fn(spark, sf_dir).collect():
        print(
            f"  {r.source}: {r.alloc_tokens} of budget "
            f"({r.epochs_ppm / 1e6:.2f} epochs of its {r.tokens} tokens)"
        )

    splits = (
        q["pipe_split_assign"]
        .fn(spark, sf_dir)
        .groupBy("split")
        .count()
        .orderBy("split")
        .collect()
    )
    print("split assignment:", {r["split"]: r["count"] for r in splits})

    # round-9 additions: the tokenizer plane and retrieval-quality readouts
    merges = q["ta_bpe_train_merges"].fn(spark, sf_dir).collect()
    print(
        "BPE merges learned:",
        " ".join(f"{r.pair_a}+{r.pair_b}" for r in merges) or "(none)",
    )
    fert = q["ta_tokenizer_fertility"].fn(spark, sf_dir).limit(3).collect()
    print("tokenizer fit (first 3 sources):")
    for r in fert:
        print(
            f"  {r.source}: fertility {r.fertility_ppm / 1e6:.2f} "
            f"pieces/word, unk {r.unk_ppm / 1e6:.1%}"
        )
    rec = q["ann_recall_at_k"].fn(spark, sf_dir).collect()
    mean_ppm = sum(r.recall_ppm for r in rec) // max(len(rec), 1)
    print(f"ANN index quality: mean recall@10 = {mean_ppm / 1e6:.0%} over {len(rec)} sample queries")
    mmr = q["ann_mmr_rerank"].fn(spark, sf_dir).limit(3).collect()
    print("MMR-diversified top picks:", [int(r.vec_id) for r in mmr])

    hll = q["stream_hll_users"].fn(spark, sf_dir).limit(3).collect()
    print("windowed distinct-user HLL (first 3 windows):")
    for r in hll:
        print(f"  {r.window_start}: ~{r.hll_users} users (exact {r.exact_users})")

    # round-12 additions: trained classifier gate, weighted sampling,
    # clustering-quality and shard-skew readouts
    conf = q["ta_nb_confusion"].fn(spark, sf_dir).collect()
    total = sum(r.n for r in conf)
    hits = sum(r.n for r in conf if r.lang == r.predicted)
    print(f"NB lang classifier (held-out): {hits}/{total} correct")
    pps = q["pipe_pps_systematic_sample"].fn(spark, sf_dir)
    print(f"systematic PPS sample: {pps.count()} docs drawn (length-weighted)")
    sep = q["ann_kmeans_separation"].fn(spark, sf_dir).collect()
    worst = max(sep, key=lambda r: r.separation_bp)
    print(
        f"kmeans cell separation: worst cell {worst.cell} at "
        f"{worst.separation_bp / 100:.0f}% of second-nearest distance"
    )
    skew = q["pipe_shard_skew"].fn(spark, sf_dir).collect()
    stragglers = [r for r in skew if r.straggler]
    print(
        f"shard skew: {len(skew)} shards, max load {max(r.load_bp for r in skew) / 100:.0f}% "
        f"of mean, {len(stragglers)} straggler(s) flagged"
    )


if __name__ == "__main__":
    main(*sys.argv[1:2])
