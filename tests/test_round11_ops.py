"""Round-11 tests: vocabulary-scale tokenizer encode (VERDICT r9 #3) and
the ann_knn_graph 16384-bucket tier (VERDICT r9 #5).

The vocab-TABLE encoder's registry oracle necessarily runs at toy scale
(the synthetic corpus holds ~31 distinct words), so the property test here
is what carries the scale claim: the IDENTICAL ``encode_against_vocab``
plan drives a 5,000-piece synthetic vocabulary over 300 synthetic words
and must agree word-for-word with a pure-Python greedy longest-match
replay. The knn-graph wide2 tier cannot be rehearsed locally at its 130k
activation threshold (make_scale10 caps the replica factor at 32), so —
like dedup_embedding_lsh's wide2 — it is pinned by a monkeypatched
routing test plus a forced-route value-parity run against the oracle's
wide2 branch.
"""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR


def _norm(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return sorted(
        tuple(repr(v.item() if hasattr(v, "item") else v) for v in r)
        for r in pdf.itertuples(index=False, name=None)
    )


# ---------------------------------------------------------------------------
# vocab-table encode: 5k-piece property test vs pure-Python greedy replay
# ---------------------------------------------------------------------------


def _py_greedy(word: str, vocab: set[str], max_piece: int, max_word: int):
    """Reference greedy longest-match walk (the semantics the module
    documents): at each position take the longest vocab piece of length
    2..max_piece starting there, else one character; words longer than
    max_word collapse to [UNK]."""
    from doc2vec_spark.operators.vocab_encode import UNK

    if len(word) > max_word:
        return UNK, 1
    pieces = []
    pos = 0
    while pos < len(word):
        step = 1
        for l in range(min(max_piece, len(word) - pos), 1, -1):
            if word[pos : pos + l] in vocab:
                step = l
                break
        pieces.append(word[pos : pos + step])
        pos += step
    return "|".join(pieces), len(pieces)


def test_encode_against_vocab_5k_piece_property(spark):
    """The SHAPE claim behind ta_vocab_table_encode: the same broadcast
    length-sliced-join + steps-fold + aggregate-walk plan that the driver
    hash-checks at a 40-piece vocab is exact at 5,000 pieces. 300 words
    over a 4-letter alphabet, lengths 1-20 (so the [UNK] branch fires),
    vocab = 5,000 distinct pieces of length 2-8."""
    from doc2vec_spark.operators.vocab_encode import (
        MAX_PIECE_CHARS,
        MAX_WORD_CHARS,
        encode_against_vocab,
    )

    rng = np.random.RandomState(11)
    alpha = np.array(list("abcd"))

    def rand_str(n):
        return "".join(rng.choice(alpha, size=n))

    words = sorted({rand_str(rng.randint(1, 21)) for _ in range(300)})
    pieces = set()
    while len(pieces) < 5000:
        pieces.add(rand_str(rng.randint(2, MAX_PIECE_CHARS + 1)))
    pieces = sorted(pieces)

    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    vdf = spark.createDataFrame([(p,) for p in pieces], "piece string")
    got = {
        r["word"]: (r["pieces"], r["n_pieces"])
        for r in encode_against_vocab(wdf, vdf).collect()
    }

    vocab = set(pieces)
    assert set(got) == set(words)
    multi = 0
    for w in words:
        exp = _py_greedy(w, vocab, MAX_PIECE_CHARS, MAX_WORD_CHARS)
        assert got[w] == exp, f"word {w!r}: {got[w]} != {exp}"
        if exp[1] < len(w):
            multi += 1
    # the corpus must actually exercise multi-char matches, or the test
    # would pass with a vocab that never matches anything
    assert multi >= 50, f"only {multi} words took a multi-char piece"
    assert any(len(w) > MAX_WORD_CHARS for w in words), "no [UNK] case ran"


def test_encode_against_vocab_joins_broadcast_and_stay_jvm_side(spark):
    """100 TB plan shape: every per-length vocab slice joins BROADCAST (a
    64k-piece vocab is dimension-table-sized), and the encode path itself
    contains no Python stage — the walk is a native aggregate fold."""
    from doc2vec_spark.operators.vocab_encode import QUERIES
    from doc2vec_spark.plans.checks import formatted_plan

    plan = formatted_plan(QUERIES["ta_vocab_table_encode"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "pythonUDF"):
        assert marker not in plan, f"Python stage in encode plan: {marker}"


def test_registry_vocab_forces_multi_piece_walks(spark):
    """Guard on REGISTRY_VOCAB_K: the hash-checked registry query must
    contain real multi-char matches (n_pieces < len(word)) — otherwise the
    driver row would only ever check the single-char fallback."""
    from doc2vec_spark.operators.vocab_encode import QUERIES

    rows = QUERIES["ta_vocab_table_encode"].fn(spark, SF_DIR).collect()
    assert rows
    assert any(r.n_pieces < len(r.word) for r in rows)
    for r in rows:
        assert r.pieces.replace("|", "") == r.word  # lossless segmentation


# ---------------------------------------------------------------------------
# ann_knn_graph 16384-bucket tier (wide2)
# ---------------------------------------------------------------------------


def test_knn_graph_wide2_occupancy_invariant():
    """The routing threshold must respect occupancy >= k+1: a bucket with
    fewer than k+1 expected members cannot fill a vector's top-k. Pin the
    derivation: 2^14 buckets, activation at 130k vectors -> expected
    occupancy ~8 = 2(k+1)."""
    from doc2vec_spark.operators.curation import (
        KNN_GRAPH_K,
        KNN_ROUTE_MAX_VECS,
        KNN_ROUTE_WIDE2_VECS,
        KNN_W2_PLANES,
        KNN_W2_PLANES_N,
        KNN_WIDE_PLANES,
    )

    buckets = 2**KNN_W2_PLANES_N
    assert len(KNN_W2_PLANES) == KNN_W2_PLANES_N == 14
    assert KNN_ROUTE_WIDE2_VECS / buckets >= KNN_GRAPH_K + 1
    assert KNN_ROUTE_WIDE2_VECS > KNN_ROUTE_MAX_VECS
    # the two tiers draw from one RandomState stream: wide2's planes must
    # not simply repeat the wide tier's (that would correlate the bits)
    assert KNN_W2_PLANES[0] != KNN_WIDE_PLANES[0]


def test_knn_graph_wide2_routing(spark, monkeypatch):
    """Three-tier dispatch: default fixture (~600 vecs) plans neither
    Arrow signature; forcing past the first cutoff plans srp12 but not
    srp14; forcing past the wide2 cutoff plans srp14."""
    from doc2vec_spark.operators import curation

    def plan_of():
        return (
            curation.QUERIES["ann_knn_graph"]
            .fn(spark, SF_DIR)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )

    base = plan_of()
    assert "srp12" not in base and "srp14" not in base
    monkeypatch.setattr(curation, "KNN_ROUTE_MAX_VECS", 10)
    mid = plan_of()
    assert "srp12" in mid and "srp14" not in mid
    monkeypatch.setattr(curation, "KNN_ROUTE_WIDE2_VECS", 10)
    top = plan_of()
    assert "srp14" in top and "srp12" not in top


def test_knn_graph_wide2_value_parity(spark, duck, monkeypatch):
    """Force the wide2 route on BOTH engines at test SF and compare values
    — the only executable check of the 14-plane constants' Spark-vs-SQL
    agreement below the 130k activation scale."""
    from doc2vec_spark.operators import curation

    monkeypatch.setattr(curation, "KNN_ROUTE_MAX_VECS", 5)
    monkeypatch.setattr(curation, "KNN_ROUTE_WIDE2_VECS", 10)
    sp = curation.QUERIES["ann_knn_graph"].fn(spark, SF_DIR).toPandas()
    ora = duck.sql(curation._knn_graph_oracle(cutoff=5, w2_cutoff=10)).df()
    assert _norm(sp) == _norm(ora)
    assert len(sp) > 0
