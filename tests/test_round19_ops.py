"""Round-19/20 behavioral tests.

Covers the r19 edits plus the r20 lint extensions:
- the PLAN LINT, three classes (VERDICT r18 #4 + VERDICT r19 #3): no
  registry query's plan may (a) evaluate a regexp split inside a
  higher-order-function lambda body — the interpreted per-element re-split
  pathology fixed across dedup (r18), textanalysis, bpe and
  reference_parity (r19); (b) evaluate a LOOP-INVARIANT
  regexp_replace/regexp_extract/sha2/md5/xxhash64/crc32 inside a lambda
  body (per-element uses of the lambda variable, e.g. minhash, are
  legitimate); (c) duplicate one expensive subtree more than 40 times in a
  single plan — the ta_langid when-chain argmax class, which doubles an
  unbound score per chain step (2^(n-1) copies). Enforced on BOTH the
  analyzed and the optimized plan (the optimizer must not re-inline a bound
  column into the lambda), each class proven able to catch a
  deliberately-pathological fixture, 200/200 green with zero allowlists.
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
# the r20 sibling class (VERDICT r19 #3a): other expensive expressions that
# the r18/r19 audits found duplicated into lambda bodies elsewhere in the
# wild — flagged only when LOOP-INVARIANT (their argument subtree never
# touches a lambda variable), because e.g. minhash legitimately computes
# md5(seed || element) per element
_EXPENSIVE_IN_LAMBDA = re.compile(
    r"(?<![\w.])(regexp_replace|regexp_extract|sha2|md5|xxhash64|crc32)\("
)
# the r20 when-chain class (VERDICT r19 #3b): the ta_langid argmax shape
# duplicated an unbound score expression ~2^(n-1) times across a when-chain
# (textanalysis.py:89 — each step embeds best_score twice: condition +
# otherwise, so the copy count DOUBLES per chain step). Detector: an
# IDENTICAL expensive subtree string — expression ids and lambda-variable
# ids normalized away, since the analyzer mints fresh ids per copy —
# repeated many times in ONE plan. Calibration over all 200 registry
# queries (r20): clean maximum is 26 (ann_ivf_recall's per-query-struct
# cosine distances, a deliberate bounded-NUM_Q evaluation per the r19
# VERDICT plan audit); the pathological 7-label fixture below produces
# 2^6 = 64+. Threshold 40 sits between with ~1.5x margin each way, and the
# exponential growth of the target class means real instances blow far
# past it while linear legitimate shapes stay far below.
_REPEAT_SUBTREE_FNS = re.compile(
    r"(?<![\w.])(aggregate|transform|filter|zip_with|exists"
    r"|regexp_replace|regexp_extract|regexp_split|split|sha2|md5|xxhash64|crc32)\("
)
_REPEAT_SUBTREE_MAX = 40
_REPEAT_SUBTREE_MIN_LEN = 60  # ignore tiny spans (cheap to re-evaluate)
_EXPR_IDS = re.compile(r"#\d+|\b[a-z]+_\d+\b")  # attribute + lambda-var ids


def _balanced_span(plan: str, start: int) -> str:
    """plan[start:] up to (and excluding) the paren that closes the one
    already open at ``start``."""
    i = start
    depth = 1
    while i < len(plan) and depth:
        c = plan[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        i += 1
    return plan[start : i - 1]


def _lambda_bodies(plan: str) -> list[str]:
    """Balanced-paren spans of every lambdafunction(...) in a plan string —
    the HOF lambda bodies (transform/filter/exists/aggregate/zip_with all
    print as lambdafunction in Catalyst plans). The HOF's own arguments
    (e.g. the array being transformed) sit OUTSIDE these spans and are
    legitimately allowed to contain a split: they evaluate once per row."""
    return [_balanced_span(plan, m.end()) for m in re.finditer(r"lambdafunction\(", plan)]


def _plan_lint_offenders(df) -> list[tuple[str, str, str]]:
    """(lint-class, plan-stage, evidence) triples for both the analyzed and
    the OPTIMIZED plan — the optimized one is what executes, and guards
    against CollapseProject ever re-inlining a bound column. Three classes:

    split-in-lambda      any (regexp_)split inside a HOF lambda body (the
                         r18 18-33x shingle class — strict: even a
                         var-dependent split re-splits per element).
    invariant-in-lambda  regexp_replace/regexp_extract/sha2/md5/xxhash64/
                         crc32 inside a lambda body whose own argument span
                         references NO lambda variable: loop-invariant work
                         re-evaluated per element, interpreted (VERDICT r19
                         #3a). Var-dependent uses (minhash's md5(seed ||
                         elem)) are legitimate per-element work and pass.
    repeated-subtree     one expensive subtree string duplicated more than
                         _REPEAT_SUBTREE_MAX times in a single plan — the
                         ta_langid when-chain argmax class, where an unbound
                         score Column was copied ~2^(n-1) times (VERDICT
                         r19 #3b). Expression ids (#123) make subtree
                         strings identical only for same-input copies."""
    qe = df._jdf.queryExecution()
    hits: list[tuple[str, str, str]] = []
    for label, plan in [
        ("analyzed", qe.analyzed().toString()),
        ("optimized", qe.optimizedPlan().toString()),
    ]:
        for body in _lambda_bodies(plan):
            if _SPLIT_IN_LAMBDA.search(body):
                hits.append(("split-in-lambda", label, body[:200]))
            for m in _EXPENSIVE_IN_LAMBDA.finditer(body):
                span = _balanced_span(body, m.end())
                if "lambda" not in span:  # no lambda var anywhere in args
                    hits.append(
                        ("invariant-in-lambda", label, (m.group(1) + "(" + span)[:200])
                    )
        counts: dict[str, int] = {}
        for m in _REPEAT_SUBTREE_FNS.finditer(plan):
            span = m.group(1) + "(" + _balanced_span(plan, m.end()) + ")"
            if len(span) >= _REPEAT_SUBTREE_MIN_LEN:
                key = _EXPR_IDS.sub("", span)
                counts[key] = counts.get(key, 0) + 1
        for span, n in counts.items():
            if n > _REPEAT_SUBTREE_MAX:
                hits.append(("repeated-subtree", label, f"x{n}: {span[:200]}"))
    return hits


def _split_in_lambda_offenders(df) -> list[tuple[str, str]]:
    """Back-compat view of the strict split class only (fixture proofs)."""
    return [
        (label, ev)
        for cls, label, ev in _plan_lint_offenders(df)
        if cls == "split-in-lambda"
    ]


def _registry_items():
    from doc2vec_spark.registry import merged_queries

    return sorted(merged_queries().items())


@pytest.mark.parametrize(
    "name,spec", _registry_items(), ids=lambda p: p if isinstance(p, str) else ""
)
def test_no_split_inside_hof_lambda(spark, name, spec):
    """Every registry query's plan passes all three lint classes (one plan
    build per query; see _plan_lint_offenders). A failure here means a
    Column was referenced inside a transform/filter lambda before being
    bound to a real column (see dedup.word_shingles' contract note), or a
    when-chain duplicated an unbound expensive expression."""
    df = spec.fn(spark, str(SF_DIR))
    offenders = _plan_lint_offenders(df)
    assert not offenders, f"plan lint offenders in {name}: {offenders}"


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


def test_lint_catches_invariant_expensive_expr_in_lambda(spark):
    """Class (a), VERDICT r19 #3: a loop-invariant regexp_replace inlined
    into a transform lambda (re-evaluated per element, interpreted) is
    flagged in both plans; the same call bound to a column first — and a
    genuinely per-element md5 of the lambda variable (the minhash shape) —
    both pass."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cleaned = F.regexp_replace(F.col("text"), r"[0-9]+", "#")  # unbound Column
    bad = docs.select(
        F.transform(
            F.sequence(F.lit(1), F.lit(4)),
            lambda i: F.substring(cleaned, i, 10),
        ).alias("x")
    )
    classes = {cls for cls, _, _ in _plan_lint_offenders(bad)}
    assert "invariant-in-lambda" in classes

    # The bound form references the column TWICE: CollapseProject inlines a
    # non-trivial projected expression back into its single consumer — even
    # into a lambda body — so a once-referenced binding is undone in the
    # optimized plan (exactly what this lint exists to catch). Real hot
    # paths bind columns they use repeatedly, which is what keeps the
    # projection boundary intact.
    bound = docs.select("doc_id", cleaned.alias("cleaned")).select(
        F.length(F.col("cleaned")).alias("n"),
        F.transform(
            F.sequence(F.lit(1), F.lit(4)),
            lambda i: F.substring(F.col("cleaned"), i, 10),
        ).alias("x"),
    )
    assert not _plan_lint_offenders(bound)

    minhash_like = docs.select(
        F.transform(
            F.split(F.col("text"), r"\s+"),  # split OUTSIDE the lambda: fine
            lambda w: F.md5(F.concat(F.lit("seed:"), w)),  # md5 OF the element
        ).alias("sig")
    )
    assert not _plan_lint_offenders(minhash_like)


def test_lint_catches_when_chain_expression_blowup(spark):
    """Class (b), VERDICT r19 #3: the pre-r19 ta_langid argmax shape — a
    running when-chain where each step embeds the carried best_score TWICE
    (condition + otherwise), so an UNBOUND score expression doubles per
    step: 2^(n-1) copies of the first score's filter-HOF at n labels. The
    7-label fixture yields 64 copies (lint threshold 40); the bound form of
    the identical argmax — the r19 ta_langid fix — passes."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select("doc_id", ws.alias("ws"))
    labels = ["en", "de", "fr", "es", "it", "pt", "nl"]

    def score(src, markers):
        # the ta_langid score shape: marker-token count via a filter HOF
        return F.size(F.filter(src, lambda w: w.isin(*markers, "zz" * 20)))

    def argmax_chain(scores: dict):
        best_lang, best_score = F.lit(labels[0]), scores[labels[0]]
        for lab in labels[1:]:
            better = scores[lab] > best_score
            best_lang = F.when(better, F.lit(lab)).otherwise(best_lang)
            best_score = F.when(better, scores[lab]).otherwise(best_score)
        return best_lang

    unbound = {lab: score(ws, [lab]) for lab in labels}  # ws UNBOUND: 2^(n-1)
    bad = docs.select("doc_id", argmax_chain(unbound).alias("lang"))
    offenders = _plan_lint_offenders(bad)
    assert any(cls == "repeated-subtree" for cls, _, _ in offenders), offenders

    # r19 fix shape: scores bound to columns, chain carries cheap attributes
    scored = base.select(
        "doc_id",
        *[score(F.col("ws"), [lab]).alias(f"s_{lab}") for lab in labels],
    )
    bound = {lab: F.col(f"s_{lab}") for lab in labels}
    good = scored.select("doc_id", argmax_chain(bound).alias("lang"))
    assert not _plan_lint_offenders(good)


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
# Directory-layout size measurement (ADVICE r18 #1 dedup side, fixed r20;
# xfail pin flipped to plain asserts per the r19 VERDICT done-bar)
# ---------------------------------------------------------------------------


def test_dedup_agg_partitions_engage_on_directory_corpora(tmp_path):
    """Directory-layout corpora must engage dedup's size-scaled posting
    partitioning exactly as single-file ones do (the r18 KNOWN GAP:
    getsize on the directory read the ~4096-byte inode, silently
    disabling size scaling on store.py-layout corpora)."""
    from doc2vec_spark.operators.dedup import corpus_agg_partitions
    from doc2vec_spark.session import default_parallelism

    n = default_parallelism()
    d = tmp_path / "dircorpus"
    pq = d / "documents.parquet"
    pq.mkdir(parents=True)
    for i in range(2):
        (pq / f"part-{i:05d}.snappy.parquet").write_bytes(b"x" * (10 << 20))
    assert corpus_agg_partitions(str(d)) > n


def test_corpus_parquet_bytes_nested_partitionby_layout(tmp_path):
    """NESTED directory layouts — store.py's partitionBy('bucket',
    'product_name') shape, bucket=K/product_name=X/part-*.parquet — must
    fold the leaf part files, not the ~4096-byte subdirectory inodes
    (ADVICE r19 #1: the one-level listdir fold mis-measured every nested
    corpus as tiny, re-disabling AQE over the CC edge build and routing
    unbounded BPE vocabularies driver-side). Dot/underscore entries are
    pruned at every level."""
    from doc2vec_spark.operators.dedup import (
        POSTING_BYTES_PER_PARTITION,
        corpus_parquet_bytes,
    )
    from doc2vec_spark.operators.pipeline import (
        _corpus_parquet_bytes,
        _small_corpus,
    )
    from doc2vec_spark.session import default_parallelism

    # size each leaf relative to the session default so the not-small
    # assertion holds on ANY host (review r20: a fixed 20 MB fixture flips
    # to "small" once default_parallelism >= 140) — 4 leaves at n
    # partitions' worth each project to 4n+1 > n for every n
    per_leaf = default_parallelism() * POSTING_BYTES_PER_PARTITION
    d = tmp_path / "nested"
    pq = d / "documents.parquet"
    for b in range(2):
        for p in ("alpha", "beta"):
            leaf = pq / f"bucket={b}" / f"product_name={p}"
            leaf.mkdir(parents=True)
            (leaf / "part-00000.snappy.parquet").write_bytes(b"x" * per_leaf)
            (leaf / ".part-00000.snappy.parquet.crc").write_bytes(b"c" * 64)
    (pq / "_SUCCESS").write_bytes(b"")
    (pq / "_delta_log").mkdir()
    (pq / "_delta_log" / "0.json").write_bytes(b"j" * 4096)

    expect = 4 * per_leaf
    assert corpus_parquet_bytes(str(d)) == expect
    # pipeline's delegates are the SAME function (single-sourced in r20)
    assert _corpus_parquet_bytes(str(d)) == expect
    assert _small_corpus(str(d)) is False  # 4n+1 projected parts > n


def test_batched_probe_reuses_the_cached_aggregation(spark, monkeypatch):
    """ADVICE r19 #2 pin: on the unbounded-vocabulary path the REAL
    ``_collectable_vocab`` probe must MATERIALIZE the candidate cache, not
    discard a corpus-sized aggregation — train_merges_batched caches cand
    BEFORE probing, so the probe costs only itself (~2 AQE jobs here) and
    the training rounds reuse the cache. Pre-fix, the probe ran against an
    uncached plan and round 1 re-ran the identical aggregation. Measured
    on this env: mocked-probe loop 9 jobs, real-probe loop 11; the bar
    allows AQE variance while failing the pre-fix +re-aggregation shape.
    Values must be identical either way."""
    import doc2vec_spark.operators.bpe as bpe

    sc = spark.sparkContext
    bpe.train_merges_batched(spark, str(SF_DIR))  # warm the scan/catalog

    monkeypatch.setattr(bpe, "_collectable_vocab", lambda sf_dir, cand: False)
    sc.setJobGroup("bpe_mock_probe", "p", False)
    try:
        mocked = bpe.train_merges_batched(spark, str(SF_DIR))
    finally:
        sc.setJobGroup(None, None, False)
    monkeypatch.undo()

    # force the REAL probe down the unbounded branch: corpus not measured
    # small, collect bound 0 -> limit(1).count() > 0 -> distributed loop
    monkeypatch.setattr(bpe, "_bounded_vocab", lambda sf_dir: False)
    monkeypatch.setattr(bpe, "VOCAB_COLLECT_BOUND", 0)
    sc.setJobGroup("bpe_real_probe", "p", False)
    try:
        real = bpe.train_merges_batched(spark, str(SF_DIR))
    finally:
        sc.setJobGroup(None, None, False)

    assert real == mocked and len(real) > 0
    n_mock = len(sc.statusTracker().getJobIdsForGroup("bpe_mock_probe"))
    n_real = len(sc.statusTracker().getJobIdsForGroup("bpe_real_probe"))
    assert n_real <= n_mock + 3, (
        f"real-probe path {n_real} jobs vs mocked {n_mock}: the probe is "
        "re-running the corpus aggregation instead of materializing the cache"
    )


def test_corpus_parquet_bytes_unmeasurable_is_none(tmp_path):
    """Unreadable/absent paths are UNMEASURABLE (None), never small — the
    fail-safe contract callers rely on to keep the 100 TB path."""
    from doc2vec_spark.operators.dedup import (
        corpus_agg_partitions,
        corpus_parquet_bytes,
    )
    from doc2vec_spark.session import default_parallelism

    assert corpus_parquet_bytes(str(tmp_path / "missing")) is None
    assert corpus_agg_partitions(str(tmp_path / "missing")) == default_parallelism()


def test_corpus_parquet_bytes_traversal_error_is_none(tmp_path, monkeypatch):
    """A directory that EXISTS but cannot be traversed is UNMEASURABLE
    (None), not zero bytes (review r20): os.walk swallows scandir errors by
    default — yielding nothing and summing to 0, i.e. 'measured tiny',
    which would collect an unbounded BPE vocabulary driver-side and widen
    the AQE-off CC scope on exactly the corpora we cannot see into. The
    helper passes onerror to route traversal failures to its except. The
    error is injected via os.walk (the process runs with privileges that
    ignore permission bits, so a chmod-based fixture cannot fail)."""
    import os

    from doc2vec_spark.operators import dedup

    pq = tmp_path / "documents.parquet"
    (pq / "bucket=0").mkdir(parents=True)
    (pq / "bucket=0" / "part-00000.snappy.parquet").write_bytes(b"x" * 1024)

    real_walk = os.walk

    def failing_walk(top, *args, **kwargs):
        onerror = kwargs.get("onerror")
        err = OSError(13, "Permission denied", str(top))
        if onerror is not None:
            onerror(err)  # the helper must re-raise into its except
        # onerror swallowed it (the pre-fix shape): emulate os.walk's
        # default silence — no entries at all
        return iter(())

    monkeypatch.setattr(os, "walk", failing_walk)
    assert dedup.corpus_parquet_bytes(str(tmp_path)) is None
    monkeypatch.setattr(os, "walk", real_walk)
    assert dedup.corpus_parquet_bytes(str(tmp_path)) == 1024
