"""Round-9 operator tests: shard-manifest empty-corpus guard (ADVICE r8),
wordpiece tokenizer APPLY, MMR diversified rerank, and the batched-round
connected-components job cut."""

from __future__ import annotations

import duckdb
import pytest


def _write_docs(d, rows):
    """rows: (doc_id, text, lang, source, n_chars)"""
    d.mkdir(parents=True, exist_ok=True)
    if rows:
        vals = ", ".join("(%d, '%s', '%s', '%s', %d)" % r for r in rows)
        duckdb.sql(
            "COPY (SELECT * FROM (VALUES %s) "
            "t(doc_id, text, lang, source, n_chars)) TO '%s' (FORMAT PARQUET)"
            % (vals, d / "documents.parquet")
        )
    else:
        duckdb.sql(
            "COPY (SELECT * FROM (SELECT 0 AS doc_id, 'x' AS \"text\", "
            "'en' AS lang, 's' AS source, 1 AS n_chars) WHERE 1=0) "
            "TO '%s' (FORMAT PARQUET)" % (d / "documents.parquet")
        )


def test_shard_manifest_empty_corpus_yields_empty_manifest(spark, tmp_path):
    """ADVICE r8: bit_xor over zero shard rows is NULL; the operator must
    return the empty manifest the oracle returns, not crash on int(None)."""
    from doc2vec_spark.operators.manifest import QUERIES

    d = tmp_path / "empty"
    _write_docs(d, [])
    spec = QUERIES["pipe_shard_manifest"]
    got = spec.fn(spark, str(d))
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == [
        "shard", "n_docs", "n_tokens", "fp_xor", "corpus_fp",
    ]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    assert con.sql(spec.oracle).fetchall() == []


# ---------------------------------------------------------------------------
# wordpiece tokenizer APPLY
# ---------------------------------------------------------------------------


def _py_wordpiece(word, pair_vocab, word_vocab, max_chars=16, unk="[UNK]"):
    """Pure-Python replay of the greedy longest-match walk — the reference
    implementation the Spark fold and the recursive-CTE oracle must both
    agree with."""
    if len(word) > max_chars:
        return [unk]
    if word in word_vocab:
        return [word]
    pieces, pos = [], 0  # 0-based here; engine walks are 1-based
    while pos < len(word):
        if pos + 2 <= len(word) and word[pos : pos + 2] in pair_vocab:
            pieces.append(word[pos : pos + 2])
            pos += 2
        else:
            pieces.append(word[pos])
            pos += 1
    return pieces


def test_wordpiece_encode_matches_pure_python_replay(spark):
    """Every distinct corpus word's (pieces, n_pieces) equals the greedy
    walk replayed in plain Python over the SAME collected vocab."""
    from doc2vec_spark.operators.wordpiece import (
        _collect_vocab,
        _corpus_words,
        encode_words,
    )

    sf = "/root/testdata/sf0.001"
    words = _corpus_words(spark, sf)
    pair_vocab, word_vocab = _collect_vocab(words)
    got = {r.word: (r.pieces, r.n_pieces) for r in encode_words(spark, sf).collect()}
    assert len(got) > 10
    for word, (pieces, n) in got.items():
        want = _py_wordpiece(word, set(pair_vocab), set(word_vocab))
        assert pieces == "|".join(want), (word, pieces, want)
        assert n == len(want)


def test_wordpiece_unk_and_whole_word_paths(spark, tmp_path):
    """Words over MAX_WORD_CHARS become a single [UNK]; the most frequent
    words encode as one whole-word piece; everything else genuinely mixes
    2-char and 1-char pieces."""
    from doc2vec_spark.operators.wordpiece import (
        MAX_WORD_CHARS,
        QUERIES,
        UNK,
    )

    long_word = "x" * (MAX_WORD_CHARS + 4)
    rows = [
        (0, f"hello hello hello {long_word}", "en", "s", 40),
        (1, "hello world world abab abab cdcd", "en", "s", 30),
    ]
    d = tmp_path / "wp"
    _write_docs(d, rows)
    spec = QUERIES["ta_wordpiece_encode"]
    got = {r.word: r for r in spec.fn(spark, str(d)).collect()}
    assert got[long_word].pieces == UNK and got[long_word].n_pieces == 1
    assert got["hello"].pieces == "hello"  # top-freq word -> whole piece
    # a walked word: pieces reassemble the word exactly
    for w, r in got.items():
        if r.pieces not in (UNK, w):
            assert "".join(r.pieces.split("|")) == w
            assert r.n_pieces == len(r.pieces.split("|"))
    # oracle agreement on this synthetic corpus too
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = {r[0]: r for r in con.sql(spec.oracle).fetchall()}
    assert {w: (r.pieces, r.n_pieces) for w, r in got.items()} == {
        w: (r[2], r[3]) for w, r in want.items()
    }


def test_subword_counts_are_at_least_word_counts(spark):
    """Subword tokenization never produces fewer tokens than words (each
    word maps to >= 1 piece) — the invariant that makes the subword budget
    and packing variants conservative upgrades."""
    from doc2vec_spark.operators.wordpiece import QUERIES

    rows = QUERIES["ta_subword_doc_counts"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.n_subword_tokens >= r.n_words > 0


def test_sequence_pack_subword_tiles_every_token_exactly_once(spark):
    """Per-doc segment lengths sum to the doc's subword count; offsets stay
    inside [0, SEQ_LEN); every segment is nonempty (the dataloader
    invariants, mirrored from the whitespace variant's test)."""
    from doc2vec_spark.operators.wordpiece import SW_SEQ_LEN, QUERIES

    sf = "/root/testdata/sf0.001"
    segs = QUERIES["pipe_sequence_pack_subword"].fn(spark, sf).collect()
    counts = {
        r.doc_id: r.n_subword_tokens
        for r in QUERIES["ta_subword_doc_counts"].fn(spark, sf).collect()
    }
    per_doc = {}
    for s in segs:
        assert 0 <= s.tok_offset < SW_SEQ_LEN
        assert s.n_tok_in_seq > 0
        per_doc[s.doc_id] = per_doc.get(s.doc_id, 0) + s.n_tok_in_seq
    assert per_doc == counts


# ---------------------------------------------------------------------------
# MMR diversified rerank
# ---------------------------------------------------------------------------


def _write_embeddings(d, vecs):
    """vecs: {vec_id: 64-dim list of doubles}"""
    d.mkdir(parents=True, exist_ok=True)
    vals = ", ".join(
        "(%d, %s::DOUBLE[])" % (vid, "[" + ", ".join(repr(x) for x in v) + "]")
        for vid, v in sorted(vecs.items())
    )
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES %s) t(vec_id, embedding)) TO '%s' "
        "(FORMAT PARQUET)" % (vals, d / "embeddings.parquet")
    )


def _axis(i, scale=1.0):
    v = [0.0] * 64
    v[i] = scale
    return v


def test_mmr_prefers_diverse_pick_over_near_duplicate(spark, tmp_path):
    """A near-duplicate of the first pick is deferred behind a less relevant
    but diverse candidate — the defining MMR behavior a pure top-k lacks —
    and both engines agree on the exact selection order."""
    import math

    a = [0.9, math.sqrt(1 - 0.81), 0.0] + [0.0] * 61
    b = [0.85, -math.sqrt(1 - 0.7225), 0.0] + [0.0] * 61
    d = tmp_path / "mmr"
    _write_embeddings(d, {0: _axis(0), 1: a, 2: list(a), 3: b})
    from doc2vec_spark.operators.mmr import QUERIES

    spec = QUERIES["ann_mmr_rerank"]
    got = spec.fn(spark, str(d)).collect()
    # pure top-k order would be [1, 2, 3] (rel 0.9, 0.9, 0.85); MMR demotes
    # the exact duplicate vec 2 behind the diverse vec 3
    assert [r.vec_id for r in got] == [1, 3, 2]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")
    want = con.sql(spec.oracle).fetchall()
    assert [(r.step, r.vec_id, r.relevance, r.mmr_score) for r in got] == want


def test_mmr_scores_replay_from_raw_vectors(spark):
    """Independent replay on real data: re-derive every pick's score from
    the raw embeddings with the left-fold cosine and the literal 0.7/0.3
    weights; selection must be the true greedy argmax at every step."""
    from doc2vec_spark.operators.mmr import (
        LAMBDA,
        MMR_POOL,
        ONE_MINUS_LAMBDA,
        QUERIES,
        _cos_sim,
        _p6,
    )

    sf = "/root/testdata/sf0.001"
    got = QUERIES["ann_mmr_rerank"].fn(spark, sf).collect()
    assert len(got) == 10 and len({r.vec_id for r in got}) == 10
    vecs = {
        r[0]: [float(x) for x in r[1]]
        for r in duckdb.sql(
            f"SELECT vec_id, embedding::DOUBLE[] FROM '{sf}/embeddings.parquet'"
        ).fetchall()
    }
    q = vecs[0]
    rel = {vid: _cos_sim(v, q) for vid, v in vecs.items() if vid != 0}
    pool = dict(sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:MMR_POOL])
    picked = []
    for row in got:
        scores = {}
        for vid in pool:
            if vid in picked:
                continue
            pen = max(_cos_sim(vecs[vid], vecs[p]) for p in picked) if picked else 0.0
            scores[vid] = (
                LAMBDA * rel[vid] - ONE_MINUS_LAMBDA * pen
                if picked
                else LAMBDA * rel[vid]
            )
        best = max(scores.items(), key=lambda kv: (kv[1], -kv[0]))
        assert row.vec_id == best[0], (row.step, row.vec_id, best)
        assert row.mmr_score == _p6(best[1])
        assert row.relevance == _p6(rel[best[0]])
        picked.append(best[0])


# ---------------------------------------------------------------------------
# embedding-LSH wide2 tier (30x rehearsal finding)
# ---------------------------------------------------------------------------


def test_embedding_lsh_wide2_plan_routing(spark, monkeypatch):
    """Third band-width tier (r9: the 30x rehearsal measured the 8x8-bit
    tier at 72.7M candidates for ~3k true pairs): above
    EMB_LSH_WIDE2_MIN_VECS the plan must carry the 192-plane w2_bands
    signature, same (label, band_id, band_val)-keyed join shape."""
    from doc2vec_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(dedup, "EMB_LSH_ROUTE_MAX_VECS", 5)
    monkeypatch.setattr(dedup, "EMB_LSH_WIDE2_MIN_VECS", 10)
    plan = (
        dedup.QUERIES["dedup_embedding_lsh"]
        .fn(spark, sf)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "w2_bands" in plan and "wide_bands" not in plan
    joins = [l for l in plan.splitlines() if "Join Inner" in l]
    assert any("band_val" in c and "band_id" in c for c in joins), joins


def test_embedding_lsh_wide2_matches_oracle(spark):
    """Engine parity of the wide2 path itself (dormant at driver SFs, like
    the wide tier): Spark's 16x12-bit banded join + exact confirm equals
    the w2 oracle branch with the route cutoffs lowered so DuckDB takes
    the same tier."""
    from doc2vec_spark.operators.dedup import (
        SRP_ROUTE_THRESHOLD,
        _emb_lsh_oracle,
        _lsh_corpus,
        embedding_near_dup_pairs,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.vec_a, r.vec_b, r.cosine_sim)
        for r in embedding_near_dup_pairs(
            spark, _lsh_corpus(spark, sf), SRP_ROUTE_THRESHOLD, wide_bands="wide2"
        ).collect()
    )
    assert got, "planted clones must collide in some 12-bit band"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    want = sorted(
        (r[0], r[1], r[2])
        for r in con.sql(_emb_lsh_oracle(cutoff=1, w2_cutoff=2)).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# JVM-native stub-embedding path
# ---------------------------------------------------------------------------


def test_native_embedding_bit_exact_with_udf_path(spark):
    """The native column-expression embedding equals embed_text float32
    bit-for-bit (integer components, exact-integer norm, correctly-rounded
    divide/cast — the equivalence embedding.py's design promises)."""
    from doc2vec_spark.embedding import embed_text
    from doc2vec_spark.embedding_native import with_embeddings_native

    texts = ["hello world", "", "x" * 40000, "Unicode Ünï test", "a b c"]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    for r in with_embeddings_native(df).collect():
        assert [float(x) for x in r["embedding"]] == [
            float(x) for x in embed_text(r["content"])
        ], repr(r["content"][:30])


def test_native_embedding_plan_has_no_python_stage(spark):
    """with_embeddings_native is one whole-stage-codegen projection: no
    ArrowEval/BatchEval/Python node anywhere; and the DEFAULT ingest plane
    (doc_knn_query_documentation — native since the round-11 flip) carries
    ONLY the chunker's mapInPandas (the _embed UDF is gone), while
    doc_knn_query_native — the provider-seam entry since the same flip —
    still carries the Arrow UDF stage it exists to pin."""
    from doc2vec_spark.embedding_native import QUERIES, with_embeddings_native
    from doc2vec_spark.operators.domain import QUERIES as DQ

    df = spark.createDataFrame([("t",)], "content string")
    plan = with_embeddings_native(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan and "_embed" not in plan
    knn_plan = (
        DQ["doc_knn_query_documentation"]
        .fn(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_embed" not in knn_plan  # the default embed stage is native...
    assert "MapInPandas" in knn_plan  # ...the chunker legitimately is not
    seam_plan = (
        QUERIES["doc_knn_query_native"]
        .fn(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_embed" in seam_plan  # the seam entry still exercises the UDF


def test_native_knn_oracle_is_verbatim_udf_oracle(spark):
    """doc_knn_query_native registers the IDENTICAL oracle SQL string as
    doc_knn_query_documentation — both paths hash-check against the same
    DuckDB ground truth, so the driver proves same-hashes equivalence."""
    from doc2vec_spark.embedding_native import QUERIES as NQ
    from doc2vec_spark.operators.domain import QUERIES as DQ

    assert NQ["doc_knn_query_native"].oracle == DQ["doc_knn_query_documentation"].oracle


# ---------------------------------------------------------------------------
# true BPE train -> apply
# ---------------------------------------------------------------------------


def _py_bpe_train(word_freqs, num_merges=8, max_chars=16):
    """Pure-Python replay of the documented training contract (ADVICE r9:
    the contract is TWO SEP-anchored all-occurrence replace passes per
    merge in rank order over the SEP-wrapped segmentation — merges join
    complete cells only, never across a cell boundary; this replay uses
    the same str.replace primitive as both engines): re-segment under
    merges-so-far, count adjacent cell pairs weighted by freq, append the
    best new pair (count DESC, then (a, b) lexicographic)."""
    SEP = "\x01"

    def seg(word, merges):
        s = SEP + SEP.join(word) + SEP
        for a, b in merges:
            pat, rep = SEP + a + SEP + b + SEP, SEP + a + b + SEP
            s = s.replace(pat, rep).replace(pat, rep)
        return s.strip(SEP).split(SEP)

    merges = []
    for _ in range(num_merges):
        counts = {}
        for w, f in word_freqs.items():
            if len(w) > max_chars:
                continue
            cells = seg(w, merges)
            for a, b in zip(cells, cells[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        cand = [(p, n) for p, n in counts.items() if p not in merges]
        if not cand:
            break
        best = min(cand, key=lambda kv: (-kv[1], kv[0]))
        merges.append(best[0])
    return merges, seg


def test_bpe_learns_multilevel_merges(spark, tmp_path):
    """The defining property ta_bpe_pairs cannot express: a later merge
    combines an ALREADY-MERGED symbol with another cell. A corpus dominated
    by 'abc' must learn ('a','b') then ('ab','c'), and apply must segment
    'abc' as one piece."""
    rows = [
        (0, "abc abc abc abc abc abc", "en", "s", 23),
        (1, "abc abc abc xy xy", "en", "s", 17),
    ]
    d = tmp_path / "bpe"
    _write_docs(d, rows)
    from doc2vec_spark.operators.bpe import QUERIES

    merges = [
        (r.pair_a, r.pair_b)
        for r in QUERIES["ta_bpe_train_merges"].fn(spark, str(d)).collect()
    ]
    assert merges[0] == ("a", "b") and merges[1] == ("ab", "c"), merges
    applied = {r.word: r for r in QUERIES["ta_bpe_apply"].fn(spark, str(d)).collect()}
    assert applied["abc"].pieces == "abc" and applied["abc"].n_pieces == 1
    # oracle agreement on the synthetic corpus
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    for name in ["ta_bpe_train_merges", "ta_bpe_apply"]:
        spec = QUERIES[name]
        got = sorted(tuple(r) for r in spec.fn(spark, str(d)).collect())
        want = sorted(tuple(r) for r in con.sql(spec.oracle).fetchall())
        assert got == want, name


def test_bpe_merges_never_cross_cell_boundaries(spark, tmp_path):
    """ADVICE r9 regression: with learned merges ('x','a') then ('a','b'),
    the word 'xab' segments 'x|a|b' -> 'xa|b' and must STAY 'xa|b' — an
    unanchored replace would match 'a<SEP>b' inside the suffix of cell
    'xa' and emit the single piece 'xab' though no ('xa','b') merge was
    learned. Spark and the DuckDB oracle must both produce the anchored
    segmentation. Checked at the segmentation-primitive level with a FIXED
    two-merge list (a trained corpus can't isolate the property: training
    would just learn ('xa','b') as a later merge and legitimately fuse the
    word), in both engines, plus the adjacent-site pass-structure cases."""
    from pyspark.sql import functions as F

    from doc2vec_spark.operators.bpe import MSEP, PSEP, SEP, _seg_col, _seg_sql

    merges = [("x", "a"), ("a", "b")]
    mstr = MSEP.join(a + PSEP + b for a, b in merges)
    cases = {
        "xab": "xa|b",  # the ADVICE r9 boundary-crossing word
        "ab": "ab",
        "xaab": "xa|ab",  # both merges fire on disjoint cells
        "abab": "ab|ab",  # adjacent sites sharing a boundary SEP: 2 passes
        "ababab": "ab|ab|ab",
    }
    words = list(cases)
    got = {
        r["w"]: r["s"]
        for r in spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", F.replace(_seg_col(F.col("w"), merges), F.lit(SEP), F.lit("|")).alias("s"))
        .collect()
    }
    assert got == cases, got
    con = duckdb.connect()
    for w, want in cases.items():
        seg = _seg_sql(f"'{w}'", f"'{mstr}'".replace(PSEP, "' || chr(2) || '").replace(MSEP, "' || chr(3) || '"))
        (o,) = con.sql(f"SELECT replace({seg}, chr(1), '|')").fetchone()
        assert o == want, (w, o, want)

    # ADVICE r10 regression: identical-symbol runs >= 6 under a self-merge
    # UNDER-MERGE relative to cell-greedy (different piece MULTISET, not
    # just order): 'aaaaaa' -> aa|a|aa|a where greedy would give aa|aa|aa.
    # Pins the two-pass contract result in both engines so a future
    # "optimization" to greedy semantics trips this instead of silently
    # changing training pair counts.
    self_cases = {"aaaaa": "aa|a|aa", "aaaaaa": "aa|a|aa|a"}
    got2 = {
        r["w"]: r["s"]
        for r in spark.createDataFrame([(w,) for w in self_cases], "w string")
        .select(
            "w",
            F.replace(
                _seg_col(F.col("w"), [("a", "a")]), F.lit(SEP), F.lit("|")
            ).alias("s"),
        )
        .collect()
    }
    assert got2 == self_cases, got2
    for w, want in self_cases.items():
        seg = _seg_sql(f"'{w}'", "'a' || chr(2) || 'a'")
        (o,) = con.sql(f"SELECT replace({seg}, chr(1), '|')").fetchone()
        assert o == want, (w, o, want)


def test_bpe_matches_pure_python_replay(spark):
    """Merges and every segmentation on the corpus equal the pure-Python
    replay of the documented contract; pieces always reassemble the word."""
    from doc2vec_spark.operators.bpe import NUM_MERGES, QUERIES
    from doc2vec_spark.operators.wordpiece import _corpus_words

    sf = "/root/testdata/sf0.001"
    wf = {
        r["word"]: r["freq"] for r in _corpus_words(spark, sf).collect()
    }
    merges, seg = _py_bpe_train(wf, NUM_MERGES)
    got_merges = [
        (r.pair_a, r.pair_b)
        for r in QUERIES["ta_bpe_train_merges"].fn(spark, sf).collect()
    ]
    assert got_merges == merges
    derivable = {a + b for a, b in merges}
    for r in QUERIES["ta_bpe_apply"].fn(spark, sf).collect():
        want = seg(r.word, merges)
        assert r.pieces.split("|") == want and r.n_pieces == len(want), r.word
        assert "".join(r.pieces.split("|")) == r.word
        # the invariant SEP-anchoring buys (ADVICE r9): every multi-char
        # piece is exactly a||b of a learned merge — a boundary-crossing
        # replace could emit pieces underivable from the merge table
        for piece in r.pieces.split("|"):
            assert len(piece) == 1 or piece in derivable, (r.word, piece)


# ---------------------------------------------------------------------------
# ANN recall@k
# ---------------------------------------------------------------------------


def test_ann_recall_invariants_and_perfect_bucket_case(spark, tmp_path):
    """recall accounting invariants on the real corpus (0 <= n_hits <=
    n_ann <= k, ppm = hits * 1e6 // k), and a constructed corpus where all
    vectors share one SRP bucket so the bucket search IS exact: recall must
    be 1.0 for every query."""
    from doc2vec_spark.operators.evalmetrics import NUM_Q, RECALL_K, QUERIES

    rows = QUERIES["ann_recall_at_k"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == NUM_Q
    for r in rows:
        assert 0 <= r.n_hits <= r.n_ann <= RECALL_K
        assert r.recall_ppm == r.n_hits * 1000000 // RECALL_K
    # same-direction vectors (positive multiples of one base) -> same sign
    # pattern -> one bucket -> ANN candidates == full corpus -> recall 1.0
    base = [(i % 7) - 3.0 + 0.1 for i in range(64)]
    vecs = {
        vid: [x * (1.0 + 0.01 * vid) for x in base] for vid in range(NUM_Q + 5)
    }
    d = tmp_path / "recall"
    _write_embeddings(d, vecs)
    for r in QUERIES["ann_recall_at_k"].fn(spark, str(d)).collect():
        assert r.recall_ppm == 1000000, r
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'")
    spec = QUERIES["ann_recall_at_k"]
    got = sorted(tuple(r) for r in spec.fn(spark, str(d)).collect())
    want = sorted(tuple(r) for r in con.sql(spec.oracle).fetchall())
    assert got == want


def test_tokenizer_fertility_consistency(spark):
    """Fertility is >= 1.0 by construction (every word maps to >= 1 piece),
    and per-source word/piece totals reconcile with the per-doc subword
    counts."""
    from doc2vec_spark.operators.wordpiece import QUERIES

    sf = "/root/testdata/sf0.001"
    fert = QUERIES["ta_tokenizer_fertility"].fn(spark, sf).collect()
    assert fert
    for r in fert:
        assert r.fertility_ppm >= 1000000
        assert 0 <= r.n_unk_words <= r.n_words
        assert r.fertility_ppm == r.n_pieces * 1000000 // r.n_words
        assert r.unk_ppm == r.n_unk_words * 1000000 // r.n_words
    per_doc = QUERIES["ta_subword_doc_counts"].fn(spark, sf).collect()
    assert sum(r.n_pieces for r in fert) == sum(r.n_subword_tokens for r in per_doc)
    assert sum(r.n_words for r in fert) == sum(r.n_words for r in per_doc)


def test_ann_ivf_recall_invariants(spark):
    """IVF-cell recall: same accounting invariants as the SRP variant; and
    with nprobe=1 over 8 cells the candidate pool is bounded by the cell
    population, so n_ann <= k always and hits never exceed candidates."""
    from doc2vec_spark.operators.evalmetrics import NUM_Q, RECALL_K, QUERIES

    rows = QUERIES["ann_ivf_recall"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == NUM_Q
    for r in rows:
        assert 0 <= r.n_hits <= r.n_ann <= RECALL_K
        assert r.recall_ppm == r.n_hits * 1000000 // RECALL_K


def test_minhash_quality_exact_duplicates_have_zero_error(spark, tmp_path):
    """For byte-identical documents the signature estimate AND the true
    shingle Jaccard are both exactly 1.0 — err_ppm must be 0; and on the
    real corpus est/true/err stay in [0, 1e6] with err = |est - true|."""
    from doc2vec_spark.operators.evalmetrics import QUERIES

    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(0, text, "en", "s", len(text)), (1, text, "en", "s", len(text)),
            (2, "totally different words here now", "en", "s", 32)]
    d = tmp_path / "mq"
    _write_docs(d, rows)
    got = QUERIES["dedup_minhash_quality"].fn(spark, str(d)).collect()
    assert [(r.doc_a, r.doc_b) for r in got] == [(0, 1)]
    assert got[0].est_ppm == got[0].true_ppm == 1000000 and got[0].err_ppm == 0
    for r in QUERIES["dedup_minhash_quality"].fn(spark, "/root/testdata/sf0.001").collect():
        assert 0 <= r.est_ppm <= 1000000 and 0 <= r.true_ppm <= 1000000
        assert r.err_ppm == abs(r.est_ppm - r.true_ppm)
