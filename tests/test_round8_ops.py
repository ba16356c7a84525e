"""Behavioral properties of the round-8 operators, beyond oracle parity:
planted-duplicate removal for line-level dedup, independent pure-Python
replays of the TextRank fixed-point iteration and the HLL register build,
and the HLL empty-register arithmetic path."""

from __future__ import annotations

import hashlib

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def line_dir(tmp_path_factory):
    """doc 0 owns a 10-token line; doc 1 repeats it verbatim between its own
    unique lines; doc 2 is untouched — planted ground truth for
    dedup_line_level."""
    import duckdb

    shared = " ".join(f"s{i}" for i in range(10))
    a = shared + " " + " ".join(f"a{i}" for i in range(10))
    b = (
        " ".join(f"b{i}" for i in range(10))
        + " "
        + shared
        + " "
        + " ".join(f"c{i}" for i in range(10))
    )
    c = " ".join(f"u{i}" for i in range(7))  # short doc: one partial line
    d = tmp_path_factory.mktemp("linedup")
    duckdb.sql(
        """
        COPY (SELECT * FROM (VALUES
          (0, '%s', 'en', 'w', %d),
          (1, '%s', 'en', 'w', %d),
          (2, '%s', 'en', 'w', %d)
        ) t(doc_id, text, lang, source, n_chars)) TO '%s' (FORMAT PARQUET)
        """
        % (a, len(a), b, len(b), c, len(c), d / "documents.parquet")
    )
    return str(d), shared, a, b, c


def test_line_level_removes_planted_duplicate_only(spark, line_dir):
    from doc2vec_spark.operators.linedup import QUERIES

    d, shared, a, b, c = line_dir
    rows = {r.doc_id: r for r in QUERIES["dedup_line_level"].fn(spark, d).collect()}
    # doc 0: first owner of the shared line — nothing removed
    assert rows[0].removed_lines == 0 and rows[0].cleaned_text == a
    # doc 1: exactly the shared line removed, its own lines stitched back
    assert rows[1].n_lines == 3 and rows[1].removed_lines == 1
    assert shared not in rows[1].cleaned_text
    assert rows[1].cleaned_text == b.replace(" " + shared, "")
    # doc 2: short partial line untouched
    assert rows[2].n_lines == 1 and rows[2].removed_lines == 0
    assert rows[2].cleaned_text == c


def test_line_level_kept_lines_globally_unique(spark):
    """After the keep decision, every distinct line survives exactly once
    corpus-wide: total kept == number of distinct lines in the corpus."""
    from pyspark.sql import functions as F

    from doc2vec_spark.operators.linedup import LINE_W, QUERIES
    from doc2vec_spark.tables import load

    out = QUERIES["dedup_line_level"].fn(spark, SF_DIR)
    kept_total = out.agg(F.sum("kept_lines")).first()[0]

    docs = (
        load(spark, SF_DIR, "documents")
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("toks"))
        .filter(F.size("toks") > 0)
    )
    distinct_lines = (
        docs.select(
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.ceil(F.size("toks") / float(LINE_W)).cast("long") - 1,
                )
            ).alias("i"),
            "toks",
        )
        .select(
            F.array_join(
                F.slice(F.col("toks"), (F.col("i") * LINE_W + 1).cast("int"), LINE_W),
                " ",
            ).alias("line")
        )
        .distinct()
        .count()
    )
    assert kept_total == distinct_lines


def _python_textrank(texts: list[str]):
    """Independent dict-based replay of the fixed-point TextRank math."""
    from collections import Counter, defaultdict

    from doc2vec_spark.operators.textrank import PR_ITERS, PR_SCALE, PR_TOP_K

    edges: Counter = Counter()
    for t in texts:
        toks = t.split()
        for x, y in zip(toks, toks[1:]):
            if x != y:
                edges[(x, y)] += 1
                edges[(y, x)] += 1
    out_w: Counter = Counter()
    for (s, _), w in edges.items():
        out_w[s] += w
    ranks = {n: PR_SCALE for n in out_w}
    for _ in range(PR_ITERS):
        incoming: defaultdict = defaultdict(int)
        for (s, t), w in edges.items():
            incoming[t] += (ranks[s] * w) // out_w[s]
        ranks = {n: 150000 + (85 * c) // 100 for n, c in incoming.items()}
    ordered = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))
    return ordered[:PR_TOP_K]


def test_textrank_matches_pure_python_replay(spark):
    import duckdb

    from doc2vec_spark.operators.textrank import QUERIES

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT trim(text) FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    expected = _python_textrank(texts)
    got = [(r.tok, r["rank"]) for r in QUERIES["ta_textrank"].fn(spark, SF_DIR).collect()]
    assert got == expected


def test_textrank_damping_floor_holds(spark):
    """Every emitted rank is >= the damping base 150000 (a node always
    keeps the (1-d) teleport mass)."""
    from doc2vec_spark.operators.textrank import QUERIES

    rows = QUERIES["ta_textrank"].fn(spark, SF_DIR).collect()
    assert rows and all(r["rank"] >= 150000 for r in rows)


def _python_hll(keys: list[str]):
    """Independent replay of the 40-bit md5 HLL register build."""
    from doc2vec_spark.operators.sketches import (
        _HLL_HASH_BITS,
        _HLL_W_BITS,
        HLL_M,
    )

    regs: dict[int, int] = {}
    for k in set(keys):
        h = int(hashlib.md5(k.encode()).hexdigest()[:10], 16)
        reg, w = h % HLL_M, h >> 4
        if w == 0:
            rho = _HLL_W_BITS + 1
        else:
            rho = _HLL_W_BITS - w.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    z40 = sum(1 << (_HLL_HASH_BITS - r) for r in regs.values())
    z40 += (HLL_M - len(regs)) * (1 << _HLL_HASH_BITS)
    est = (673 * HLL_M * HLL_M * (1 << _HLL_HASH_BITS)) // (1000 * z40)
    return regs, est


def test_hll_matches_pure_python_replay(spark):
    import duckdb

    from doc2vec_spark.operators.sketches import QUERIES

    keys = [
        str(r[0])
        for r in duckdb.sql(
            f"SELECT o_custkey FROM '{SF_DIR}/orders.parquet'"
        ).fetchall()
    ]
    regs, est = _python_hll(keys)
    rows = QUERIES["sk_hll_distinct"].fn(spark, SF_DIR).collect()
    assert {r.reg: r.r_max for r in rows} == regs
    assert rows and all(r.hll_est == est for r in rows)
    assert all(r.n_exact == len(set(keys)) for r in rows)


def test_hll_zero_register_arithmetic(spark, tmp_path):
    """A near-empty key set leaves most registers absent: the missing-
    register term ((m - present) * 2^40) must enter Z, and the estimate
    must stay a small positive integer (raw regime, no crash)."""
    import duckdb

    from doc2vec_spark.operators.sketches import HLL_M, QUERIES

    d = tmp_path / "tiny"
    d.mkdir()
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES (7), (7), (9)) t(o_custkey)) TO '%s' "
        "(FORMAT PARQUET)" % (d / "orders.parquet")
    )
    rows = QUERIES["sk_hll_distinct"].fn(spark, str(d)).collect()
    regs, est = _python_hll(["7", "9"])
    assert {r.reg: r.r_max for r in rows} == regs
    assert len(rows) == len(regs) < HLL_M
    assert rows[0].zero_registers == HLL_M - len(regs)
    assert all(r.hll_est == est for r in rows) and est > 0


def test_windowed_topk_ranks_contiguous_and_sorted(spark):
    """Per window: ranks are 1..k contiguous, counts non-increasing, and
    rank 1 equals that window's true max count."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from doc2vec_spark.operators.trending import QUERIES, TOP_K_PER_WINDOW
    from doc2vec_spark.tables import load

    rows = QUERIES["stream_windowed_topk"].fn(spark, SF_DIR).collect()
    by_w = defaultdict(list)
    for r in rows:
        by_w[r.window_start].append(r)
    true_max = {
        r["window_start"]: r["m"]
        for r in (
            load(spark, SF_DIR, "events")
            .groupBy(F.window("ts", "6 hours"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy(
                F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                )
            )
            .agg(F.max("n").alias("m"))
            .collect()
        )
    }
    assert by_w and set(by_w) == set(true_max)
    for w, rs in by_w.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K_PER_WINDOW
        assert all(a.n >= b.n for a, b in zip(rs, rs[1:]))
        assert rs[0].n == true_max[w]


def test_bpe_pairs_matches_pure_python_replay(spark):
    import duckdb
    from collections import Counter

    from doc2vec_spark.operators.tokenizer import BPE_TOP_K, QUERIES

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT trim(text) FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    words: Counter = Counter()
    for t in texts:
        words.update(t.split())
    pairs: Counter = Counter()
    for w, freq in words.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += freq  # overlapping occurrences count
    expected = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_K]
    got = [(r.pair, r.n) for r in QUERIES["ta_bpe_pairs"].fn(spark, SF_DIR).collect()]
    assert got == expected


def test_truncate_rerank_matches_numpy_replay(spark):
    """The two-stage result must equal an independent numpy replay of
    prefix-pool-then-exact-rerank, and the query vector itself must come
    back first at distance 0."""
    import duckdb
    import numpy as np

    from doc2vec_spark.operators.similarity import (
        PREFIX_DIM,
        QUERIES,
        RERANK_K,
        RERANK_POOL,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    q = V[ids.tolist().index(0)]

    def cdist(M, qq):
        return 1 - (M @ qq) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qq))

    coarse = cdist(V[:, :PREFIX_DIM], q[:PREFIX_DIM])
    pool_order = sorted(range(len(ids)), key=lambda i: (coarse[i], ids[i]))
    pool = pool_order[:RERANK_POOL]
    exact = cdist(V[pool], q)
    rerank = sorted(range(len(pool)), key=lambda j: (exact[j], ids[pool[j]]))
    expected_ids = [int(ids[pool[j]]) for j in rerank[:RERANK_K]]

    got = QUERIES["ann_truncate_rerank"].fn(spark, SF_DIR).collect()
    assert [r.vec_id for r in got] == expected_ids
    assert got[0].vec_id == 0 and got[0].distance == 0.0
    assert [r.rnk for r in got] == list(range(1, len(got) + 1))


def test_data_budget_matches_pure_python_waterfill(spark):
    import duckdb

    from doc2vec_spark.operators.budget import (
        BUDGET_X2,
        CAP_DEN,
        CAP_NUM,
        QUALITY_MIN_TOKENS,
        QUERIES,
    )

    rows = duckdb.sql(
        f"SELECT source, len(regexp_split_to_array(trim(text), '\\s+')) "
        f"FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    per = {}
    for src, tk in rows:
        t, w = per.get(src, (0, 0))
        per[src] = (t + tk, w + (tk if tk >= QUALITY_MIN_TOKENS else 0))
    t_tot = sum(v[0] for v in per.values())
    w_tot = sum(v[1] for v in per.values())
    b = BUDGET_X2 * t_tot
    alloc = {}
    for src, (t_s, w_s) in per.items():
        cap = (t_s * CAP_NUM) // CAP_DEN
        alloc[src] = [cap, min(cap, (b * w_s) // w_tot)]
    leftover = b - sum(a[1] for a in alloc.values())
    u = sum(per[s][1] for s, a in alloc.items() if a[1] < a[0])
    for src, a in alloc.items():
        if a[1] < a[0] and u > 0:
            a[1] = min(a[0], a[1] + (leftover * per[src][1]) // u)

    got = QUERIES["pipe_data_budget"].fn(spark, SF_DIR).collect()
    assert {r.source for r in got} == set(per)
    for r in got:
        cap, a = alloc[r.source]
        assert (r.tokens, r.quality_tokens) == per[r.source]
        assert r.cap_tokens == cap and r.alloc_tokens == a
        assert r.alloc_tokens <= r.cap_tokens
        assert r.epochs_ppm == a * 1_000_000 // r.tokens
        assert r.epochs_ppm <= (CAP_NUM * 1_000_000) // CAP_DEN
    assert sum(r.alloc_tokens for r in got) <= b  # never over-allocates


def test_rate_anomaly_flags_consistent_with_snapped_z(spark):
    from doc2vec_spark.operators.anomaly import QUERIES, Z_THRESHOLD

    rows = QUERIES["ev_rate_anomaly"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.is_anomaly == (r.z >= Z_THRESHOLD or r.z <= -Z_THRESHOLD)
        assert round(r.z, 4) == r.z  # snapped to 4 decimals


def test_rate_anomaly_zero_variance_guard(spark, tmp_path):
    """Types whose windows all have identical counts (here: one window per
    type) must score z = 0 and never alarm."""
    import duckdb

    from doc2vec_spark.operators.anomaly import QUERIES

    d = tmp_path / "flat"
    d.mkdir()
    duckdb.sql(
        """
        COPY (SELECT * FROM (VALUES
          (1, TIMESTAMP '2024-01-01 01:00:00', 10, 'click', 1.0, 'p'),
          (2, TIMESTAMP '2024-01-01 02:00:00', 11, 'click', 1.0, 'p'),
          (3, TIMESTAMP '2024-01-01 03:00:00', 12, 'view',  1.0, 'p')
        ) t(event_id, ts, user_id, event_type, value, props))
        TO '%s' (FORMAT PARQUET)
        """
        % (d / "events.parquet")
    )
    rows = QUERIES["ev_rate_anomaly"].fn(spark, str(d)).collect()
    assert len(rows) == 2
    assert all(r.z == 0.0 and not r.is_anomaly for r in rows)


def test_line_level_self_duplicate_within_one_doc(spark, tmp_path):
    """A line repeated INSIDE one document: the first occurrence survives,
    the later one is removed, reconstruction keeps document order."""
    import duckdb

    from doc2vec_spark.operators.linedup import QUERIES

    shared = " ".join(f"x{i}" for i in range(10))
    mid = " ".join(f"m{i}" for i in range(10))
    text = f"{shared} {mid} {shared}"
    d = tmp_path / "selfdup"
    d.mkdir()
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES (0, '%s', 'en', 'w', %d)) "
        "t(doc_id, text, lang, source, n_chars)) TO '%s' (FORMAT PARQUET)"
        % (text, len(text), d / "documents.parquet")
    )
    rows = QUERIES["dedup_line_level"].fn(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_lines == 3 and r.removed_lines == 1
    assert r.cleaned_text == f"{shared} {mid}"


def test_bpe_pairs_single_char_tokens_yield_no_pairs(spark, tmp_path):
    """A corpus of only 1-char tokens has no adjacent symbol pairs — the
    length guard must yield an empty result, not an explode error."""
    import duckdb

    from doc2vec_spark.operators.tokenizer import QUERIES

    d = tmp_path / "onechar"
    d.mkdir()
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES (0, 'a b c a b', 'en', 'w', 9)) "
        "t(doc_id, text, lang, source, n_chars)) TO '%s' (FORMAT PARQUET)"
        % (d / "documents.parquet")
    )
    assert QUERIES["ta_bpe_pairs"].fn(spark, str(d)).count() == 0


def test_data_budget_quality_gate_fallback_and_empty_corpus(spark, tmp_path):
    """w = 0 (no doc passes the gate) falls back to raw-token proportional
    shares in BOTH engines; an empty corpus yields an empty allocation."""
    import duckdb

    from doc2vec_spark.operators.budget import QUERIES

    d = tmp_path / "lowq"
    d.mkdir()
    # 3-token docs: all far below QUALITY_MIN_TOKENS
    duckdb.sql(
        "COPY (SELECT * FROM (VALUES "
        "(0, 'a b c', 'en', 'sA', 5), (1, 'd e f', 'en', 'sB', 5)) "
        "t(doc_id, text, lang, source, n_chars)) TO '%s' (FORMAT PARQUET)"
        % (d / "documents.parquet")
    )
    spec = QUERIES["pipe_data_budget"]
    got = {r.source: r for r in spec.fn(spark, str(d)).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = {r[0]: r for r in con.sql(spec.oracle).fetchall()}
    assert set(got) == set(want) == {"sA", "sB"}
    for s in got:
        assert (
            got[s].tokens,
            got[s].quality_tokens,
            got[s].cap_tokens,
            got[s].alloc_tokens,
            got[s].epochs_ppm,
        ) == tuple(want[s][1:])
        assert got[s].quality_tokens == 0 and got[s].alloc_tokens > 0

    e = tmp_path / "empty"
    e.mkdir()
    duckdb.sql(
        "COPY (SELECT * FROM (SELECT 0 AS doc_id, 'x' AS \"text\", "
        "'en' AS lang, 's' AS source, 1 AS n_chars) WHERE 1=0) "
        "TO '%s' (FORMAT PARQUET)" % (e / "documents.parquet")
    )
    assert spec.fn(spark, str(e)).count() == 0


def test_hll_empty_table_all_registers_absent(spark, tmp_path):
    """An empty key set: no register rows come back (there is nothing to
    group), and the Spark path must not crash on the null moment sum —
    matching the oracle's empty result."""
    import duckdb

    from doc2vec_spark.operators.sketches import QUERIES

    d = tmp_path / "noorders"
    d.mkdir()
    duckdb.sql(
        "COPY (SELECT * FROM (SELECT 1 o_custkey) WHERE 1=0) TO '%s' "
        "(FORMAT PARQUET)" % (d / "orders.parquet")
    )
    assert QUERIES["sk_hll_distinct"].fn(spark, str(d)).count() == 0


def _python_kn(texts: list[str]):
    """Independent dict replay of the rational Kneser-Ney bigram math."""
    from collections import Counter, defaultdict

    from doc2vec_spark.operators.lm import KN_PPM

    bg_by_doc = []
    c12: Counter = Counter()
    for t in texts:
        w = t.split()
        pairs = list(zip(w, w[1:]))
        bg_by_doc.append(pairs)
        c12.update(pairs)
    c1: Counter = Counter()
    n1fwd: Counter = Counter()
    n1back: Counter = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1fwd[w1] += 1
        n1back[w2] += 1
    b = len(c12)

    def p_ppm(w1, w2):
        t1 = ((4 * c12[(w1, w2)] - 3) * KN_PPM) // (4 * c1[w1])
        t2 = (3 * n1fwd[w1] * ((n1back[w2] * KN_PPM) // b)) // (4 * c1[w1])
        return t1 + t2

    scores = {}
    for i, pairs in enumerate(bg_by_doc):
        if pairs:
            scores[i] = (len(pairs), sum(p_ppm(*p) for p in pairs) // len(pairs))
    return scores, p_ppm, c12, c1


def test_kn_bigram_matches_pure_python_replay(spark):
    import duckdb

    from doc2vec_spark.operators.lm import QUERIES

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT trim(text) FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    expected, _, _, _ = _python_kn(texts)
    got = {
        r.doc_id: (r.n_bigrams, r.kn_score_ppm)
        for r in QUERIES["ta_kn_bigram_score"].fn(spark, SF_DIR).collect()
    }
    assert got == expected


def test_kn_bigram_probability_mass_bounded(spark):
    """KN model validity: for every context w1, the probability mass over
    its OBSERVED continuations stays <= 1 (ppm sum <= 1e6, up to flooring
    dust) and every individual probability is positive — the smoothing
    never over-allocates or zeroes an observed bigram."""
    import duckdb

    from doc2vec_spark.operators.lm import KN_PPM

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT trim(text) FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    _, p_ppm, c12, c1 = _python_kn(texts)
    mass: dict = {}
    for (w1, w2) in c12:
        p = p_ppm(w1, w2)
        assert p > 0
        mass[w1] = mass.get(w1, 0) + p
    assert mass and all(m <= KN_PPM for m in mass.values())


# --------------------------------------------------------------------------
# Property-based coverage of the round-8 math (hypothesis)
# --------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**9),  # t_s
            st.integers(min_value=0, max_value=10**9),  # w_s raw
        ),
        min_size=1,
        max_size=12,
    )
)
def test_waterfill_invariants_hold_for_any_distribution(rows):
    """For ANY per-source token distribution: allocations respect the
    per-source cap, never exceed the budget in total, are non-negative,
    and epochs_ppm never exceeds the repeat cap."""
    from doc2vec_spark.operators.budget import (
        BUDGET_X2,
        CAP_DEN,
        CAP_NUM,
        waterfill,
    )

    per = [
        (f"s{i}", t, min(w, t))  # quality tokens can never exceed tokens
        for i, (t, w) in enumerate(rows)
    ]
    out = waterfill(per)
    b = BUDGET_X2 * sum(t for _, t, _ in per)
    assert len(out) == len(per)
    total = 0
    for (_, t_s, w_s, cap, alloc, ppm) in out:
        assert cap == (t_s * CAP_NUM) // CAP_DEN
        assert 0 <= alloc <= cap
        assert ppm == alloc * 1_000_000 // t_s
        assert ppm <= (CAP_NUM * 1_000_000) // CAP_DEN
        total += alloc
    assert total <= b


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=2, max_size=30),
        min_size=1,
        max_size=20,
    )
)
def test_kn_probability_mass_bounded_for_any_corpus(docs):
    """KN model validity on ANY corpus over a small alphabet: per-context
    observed-continuation mass stays <= 1 and every probability > 0."""
    from doc2vec_spark.operators.lm import KN_PPM

    texts = [" ".join(d) for d in docs]
    _, p_ppm, c12, _ = _python_kn(texts)
    mass: dict = {}
    for (w1, w2) in c12:
        p = p_ppm(w1, w2)
        assert p > 0
        mass[w1] = mass.get(w1, 0) + p
    assert all(m <= KN_PPM for m in mass.values())


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12), max_size=300))
def test_hll_replay_estimate_always_positive_and_exact_under_k(keys):
    """HLL replay sanity on ANY key set: estimate is a positive integer,
    and register values stay within the 37-position range."""
    from doc2vec_spark.operators.sketches import _HLL_W_BITS

    regs, est = _python_hll([str(k) for k in keys])
    assert est > 0
    assert all(1 <= r <= _HLL_W_BITS + 1 for r in regs.values())


def test_shard_manifest_partition_invariance(spark, tmp_path):
    """The manifest's whole point: identical content in any row order /
    partitioning produces identical fingerprints, and a single changed
    document flips exactly its shard's fingerprint and the corpus one."""
    import duckdb

    from doc2vec_spark.operators.manifest import QUERIES

    base = [(i, f"doc {i} body tokens here", "en", "s", 20) for i in range(40)]

    def write(d, rows):
        d.mkdir()
        vals = ", ".join(
            "(%d, '%s', '%s', '%s', %d)" % r for r in rows
        )
        duckdb.sql(
            "COPY (SELECT * FROM (VALUES %s) "
            "t(doc_id, text, lang, source, n_chars)) TO '%s' (FORMAT PARQUET)"
            % (vals, d / "documents.parquet")
        )

    a, b, c = tmp_path / "a", tmp_path / "b", tmp_path / "c"
    write(a, base)
    write(b, list(reversed(base)))  # same content, reversed order
    changed = [
        (i, t if i != 7 else t + " CHANGED", l, s, n) for i, t, l, s, n in base
    ]
    write(c, changed)

    fn = QUERIES["pipe_shard_manifest"].fn
    ma = {r.shard: r for r in fn(spark, str(a)).collect()}
    mb = {r.shard: r for r in fn(spark, str(b)).collect()}
    mc = {r.shard: r for r in fn(spark, str(c)).collect()}

    assert {s: (r.n_docs, r.n_tokens, r.fp_xor, r.corpus_fp) for s, r in ma.items()} == {
        s: (r.n_docs, r.n_tokens, r.fp_xor, r.corpus_fp) for s, r in mb.items()
    }
    diff = [s for s in ma if ma[s].fp_xor != mc[s].fp_xor]
    assert len(diff) == 1  # exactly doc 7's shard diverged
    assert ma[diff[0]].n_docs == mc[diff[0]].n_docs  # same membership
    assert ma[0].corpus_fp != mc[0].corpus_fp
