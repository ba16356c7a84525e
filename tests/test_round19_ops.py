"""Round-19 behavioral tests.

Covers the r19 edits:
- the PLAN LINT for the r18 18x class (VERDICT r18 #4): no registry query's
  plan may evaluate a regexp split inside a higher-order-function lambda
  body — the interpreted per-element re-split pathology fixed across dedup
  (r18), textanalysis, bpe and reference_parity (r19). Enforced on BOTH the
  analyzed and the optimized plan (the optimizer must not re-inline a bound
  column into the lambda), and proven able to catch a deliberately-unbound
  fixture.
- directory-aware corpus size measurement + the _small_corpus fail-safe
  (ADVICE r18 #1/#2): dir layouts fold per part file; unmeasurable corpora
  are NOT small (AQE stays on — the 100 TB invariant).
- the BPE loop's static-plan scope: conf restored on success and mid-loop
  failure; large vocabularies are a no-op.
- ta_bpe_apply single-corpus-aggregation: the returned plan reads the
  cached candidate table instead of re-aggregating the corpus.
"""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_DIR

# ---------------------------------------------------------------------------
# plan lint: no regexp split inside a HOF lambda body (the r18 PERF CONTRACT)
# ---------------------------------------------------------------------------

_SPLIT_IN_LAMBDA = re.compile(r"(?<![\w.])(split|regexp_split)\(")


def _lambda_bodies(plan: str) -> list[str]:
    """Balanced-paren spans of every lambdafunction(...) in a plan string —
    the HOF lambda bodies (transform/filter/exists/aggregate/zip_with all
    print as lambdafunction in Catalyst plans). The HOF's own arguments
    (e.g. the array being transformed) sit OUTSIDE these spans and are
    legitimately allowed to contain a split: they evaluate once per row."""
    out = []
    for m in re.finditer(r"lambdafunction\(", plan):
        i = m.end()
        depth = 1
        start = i
        while i < len(plan) and depth:
            c = plan[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        out.append(plan[start : i - 1])
    return out


def _split_in_lambda_offenders(df) -> list[tuple[str, str]]:
    """(plan-stage, offending-lambda-body) pairs for both the analyzed and
    the OPTIMIZED plan — the optimized one is what executes, and guards
    against CollapseProject ever re-inlining a bound split column."""
    qe = df._jdf.queryExecution()
    hits = []
    for label, plan in [
        ("analyzed", qe.analyzed().toString()),
        ("optimized", qe.optimizedPlan().toString()),
    ]:
        for body in _lambda_bodies(plan):
            if _SPLIT_IN_LAMBDA.search(body):
                hits.append((label, body[:200]))
    return hits


def _registry_items():
    from doc2vec_spark.registry import merged_queries

    return sorted(merged_queries().items())


@pytest.mark.parametrize(
    "name,spec", _registry_items(), ids=lambda p: p if isinstance(p, str) else ""
)
def test_no_split_inside_hof_lambda(spark, name, spec):
    """Every registry query's plan keeps regexp splits OUT of HOF lambda
    bodies. An inlined split re-evaluates per array element, interpreted —
    measured 18-33x on shingle map stages (r18/r19). A failure here means a
    Column was referenced inside a transform/filter lambda before being
    bound to a real column (see dedup.word_shingles' contract note)."""
    df = spec.fn(spark, str(SF_DIR))
    offenders = _split_in_lambda_offenders(df)
    assert not offenders, f"split inside HOF lambda in {name}: {offenders}"


def test_lint_catches_deliberately_unbound_fixture(spark):
    """The lint must actually detect the pathology it guards against: the
    pre-r18 ta_fingerprint shape (split Column inlined into the transform
    lambda) is flagged in both the analyzed and the optimized plan."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    bad = docs.select(
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1), lambda i: F.element_at(ws, i)
        ).alias("x")
    )
    offenders = _split_in_lambda_offenders(bad)
    assert {label for label, _ in offenders} == {"analyzed", "optimized"}
    # and the bound form of the same expression is clean
    good = docs.select("doc_id", ws.alias("ws")).select(
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("ws")) - 1),
            lambda i: F.element_at(F.col("ws"), i),
        ).alias("x")
    )
    assert not _split_in_lambda_offenders(good)


# ---------------------------------------------------------------------------
# directory-aware corpus measurement + _small_corpus fail-safe (ADVICE r18)
# ---------------------------------------------------------------------------


def test_corpus_parquet_bytes_folds_directory_layouts(tmp_path):
    from doc2vec_spark.operators.pipeline import _corpus_parquet_bytes

    # single-file layout (the driver testdata): plain stat
    single = tmp_path / "single"
    single.mkdir()
    (single / "documents.parquet").write_bytes(b"x" * 1234)
    assert _corpus_parquet_bytes(str(single)) == 1234
    # directory layout (store.py's write shape): per-part fold, metadata
    # and hidden files excluded — a bare getsize would see ~4096 here
    d = tmp_path / "dir"
    (d / "documents.parquet").mkdir(parents=True)
    p = d / "documents.parquet"
    (p / "part-00000.snappy.parquet").write_bytes(b"a" * 1000)
    (p / "part-00001.snappy.parquet").write_bytes(b"b" * 2000)
    (p / "_SUCCESS").write_bytes(b"")
    (p / ".part-00002.crc").write_bytes(b"c" * 999)
    assert _corpus_parquet_bytes(str(d)) == 3000
    # unmeasurable: missing table, non-local scheme
    assert _corpus_parquet_bytes(str(tmp_path / "nope")) is None
    assert _corpus_parquet_bytes("s3a://bucket/prefix") is None


def test_small_corpus_fail_safe_and_directory_aware(tmp_path):
    """'Measured small' != 'unmeasurable': only the former may disable AQE
    over the CC edge build. A directory-layout corpus is judged by its real
    part-file bytes (the old getsize saw the dir inode and called every
    store.py corpus small)."""
    from doc2vec_spark.operators.pipeline import (
        _POSTING_BYTES_PER_PARTITION,
        _small_corpus,
    )
    from doc2vec_spark.session import default_parallelism

    n = default_parallelism()
    # unmeasurable -> NOT small (fail-safe: keep AQE / the 100 TB path)
    assert _small_corpus(str(tmp_path / "missing")) is False
    assert _small_corpus("s3a://bucket/prefix") is False
    # measured-small single file -> small
    small = tmp_path / "small"
    small.mkdir()
    (small / "documents.parquet").write_bytes(b"x" * 1000)
    assert _small_corpus(str(small)) is True
    # directory layout whose part files sum LARGE -> not small, even though
    # the directory inode itself is tiny
    big = tmp_path / "big"
    pq = big / "documents.parquet"
    pq.mkdir(parents=True)
    per_part = 2 * n * _POSTING_BYTES_PER_PARTITION // 4
    for i in range(4):
        with (pq / f"part-{i:05d}.snappy.parquet").open("wb") as f:
            f.seek(per_part - 1)
            f.write(b"\0")
    assert _small_corpus(str(big)) is False
    # the driver testdata single-file corpus stays small (regression: the
    # sf0.1 static-plan scope must keep engaging)
    assert _small_corpus("/root/testdata/sf0.1") is True


def test_measured_agg_partitions_engage_on_directory_corpora(tmp_path):
    """The size-scaled posting partition count must engage for
    directory-layout corpora — the exact case ADVICE r18 #1 found silently
    disabled (dir inode ~4096 bytes -> always the session default)."""
    from doc2vec_spark.operators.pipeline import _corpus_agg_partitions_measured
    from doc2vec_spark.session import default_parallelism

    n = default_parallelism()
    d = tmp_path / "dircorpus"
    pq = d / "documents.parquet"
    pq.mkdir(parents=True)
    for i in range(2):
        (pq / f"part-{i:05d}.snappy.parquet").write_bytes(b"x" * (10 << 20))
    mid = _corpus_agg_partitions_measured(str(d))
    assert n < mid <= 32 * n
    # unmeasurable -> session default (callers then skip the repartition)
    assert _corpus_agg_partitions_measured("s3a://bucket/prefix") == n


# ---------------------------------------------------------------------------
# BPE bounded-vocabulary driver-side training: byte-identity to the
# distributed loop (the r19 job-floor cut)
# ---------------------------------------------------------------------------


def test_bpe_local_train_matches_distributed(spark):
    """The driver-side replica (measured-small corpora) must learn exactly
    the merge table of the distributed per-round loop — same pair counts,
    same (count DESC, a, b) tie order, same two-pass anchored replace."""
    from doc2vec_spark.operators.bpe import _cand_words, train_merges_from

    cand = _cand_words(spark, str(SF_DIR)).cache()
    try:
        local = train_merges_from(spark, cand, small_input=True)
        dist = train_merges_from(spark, cand, small_input=False)
    finally:
        cand.unpersist(False)
    assert local == dist and len(local) > 0


def test_bpe_local_train_matches_distributed_adversarial(spark):
    """Same identity on a hand-built vocabulary hitting the contract's
    edges: >=6-char identical-symbol runs (the two-pass under-merge case),
    adjacent merge sites sharing their boundary SEP, count ties broken
    lexicographically, and multi-level merges of merged symbols."""
    from doc2vec_spark.operators.bpe import train_merges_from

    words = [
        ("aaaaaa", 50),  # even run >= 6: two-pass under-merge vs greedy
        ("aaaaaaaaa", 40),  # odd run >= 9
        ("ababab", 30),  # alternating shared-boundary sites
        ("abcabc", 30),  # multi-level: ab+c after a+b
        ("zzz", 25),
        ("yzyz", 25),  # tie pressure against zz
        ("xy", 60),
        ("yx", 60),  # exact count tie -> lexicographic (x,y) first
    ]
    cand = spark.createDataFrame(words, "word string, freq bigint").cache()
    try:
        local = train_merges_from(spark, cand, small_input=True)
        dist = train_merges_from(spark, cand, small_input=False)
    finally:
        cand.unpersist(False)
    assert local == dist and len(local) > 0


def test_bpe_batched_local_matches_distributed(spark, monkeypatch):
    """The batched disjoint-scan replica must match the distributed batched
    loop merge-for-merge (forcing each path via the _bounded_vocab gate)."""
    import doc2vec_spark.operators.bpe as bpe

    monkeypatch.setattr(bpe, "_collectable_vocab", lambda sf_dir, cand: True)
    local = bpe.train_merges_batched(spark, str(SF_DIR))
    monkeypatch.setattr(bpe, "_collectable_vocab", lambda sf_dir, cand: False)
    dist = bpe.train_merges_batched(spark, str(SF_DIR))
    assert local == dist and len(local) > 0


def test_bpe_train_values_stable_and_conf_untouched(spark):
    """train_merges is deterministic across calls and leaves the session
    conf exactly as it found it."""
    from doc2vec_spark.operators.bpe import train_merges

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", None)
    m1 = train_merges(spark, str(SF_DIR))
    m2 = train_merges(spark, str(SF_DIR))
    assert m1 == m2 and len(m1) > 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_parts
    assert spark.conf.get("spark.sql.adaptive.enabled", None) == prev_aqe


def test_bpe_local_seg_cells_matches_sql_replace_semantics():
    """Spot-pin the driver replica's segmentation against the documented
    two-pass anchored-replace contract (module docstring examples)."""
    from doc2vec_spark.operators.bpe import _local_seg_cells

    assert _local_seg_cells("abc", []) == ["a", "b", "c"]
    # 'aaaaa' under self-merge (a,a): pass one takes alternating sites,
    # pass two pairs the rest -> aa|a|aa (the documented order)
    assert _local_seg_cells("aaaaa", [("a", "a")]) == ["aa", "a", "aa"]
    # 'aaaaaa' -> aa|a|aa|a (the documented even-run under-merge)
    assert _local_seg_cells("aaaaaa", [("a", "a")]) == ["aa", "a", "aa", "a"]
    # multi-level: (a,b) then (ab,c)
    assert _local_seg_cells("abcabc", [("a", "b"), ("ab", "c")]) == ["abc", "abc"]


def test_bpe_apply_reads_cached_candidates(spark):
    """ta_bpe_apply's returned plan must scan the cached candidate table
    (InMemoryTableScan), not re-run the corpus-sized word aggregation a
    second time — the r19 single-corpus-aggregation contract."""
    from doc2vec_spark.operators.bpe import QUERIES

    df = QUERIES["ta_bpe_apply"].fn(spark, str(SF_DIR))
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in physical
    # and it still computes the right thing end-to-end
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_pieces"] == len(r["pieces"].split("|"))


# ---------------------------------------------------------------------------
# KNOWN GAP pin (ADVICE r18 #1, dedup side — scheduled r20)
# ---------------------------------------------------------------------------


@pytest.mark.xfail(
    reason="ADVICE r18 #1 dedup side: corpus_agg_partitions getsize reads the "
    "dir inode for directory-layout corpora; fix scheduled r20 (stamp window "
    "— dedup.py = 49 dependents). Flip this to a plain assert when it lands.",
    strict=True,
)
def test_dedup_agg_partitions_engage_on_directory_corpora(tmp_path):
    """Directory-layout corpora must engage dedup's size-scaled posting
    partitioning exactly as single-file ones do (pipeline's measured
    helper already does — this pins the dedup-side parity gap)."""
    from doc2vec_spark.operators.dedup import corpus_agg_partitions
    from doc2vec_spark.session import default_parallelism

    n = default_parallelism()
    d = tmp_path / "dircorpus"
    pq = d / "documents.parquet"
    pq.mkdir(parents=True)
    for i in range(2):
        (pq / f"part-{i:05d}.snappy.parquet").write_bytes(b"x" * (10 << 20))
    assert corpus_agg_partitions(str(d)) > n
