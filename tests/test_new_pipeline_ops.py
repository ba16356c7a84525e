"""Behavioral properties of the round-3 pipeline operators, beyond oracle
parity: planted-span detection for common-span dedup, and budget/maximality
invariants for the language-mixture sampler."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def span_dir(tmp_path_factory):
    """Two docs sharing one exact 15-word run (plus unrelated text), one doc
    with no overlap — planted ground truth for dedup_common_spans."""
    import duckdb

    shared = " ".join(f"shared{i}" for i in range(15))
    a = "alpha opening words here " + shared + " alpha closing tail words"
    b = "beta starts differently with other words " + shared + " beta distinct ending"
    c = " ".join(f"unrelated{i}" for i in range(40))
    d = tmp_path_factory.mktemp("spans")
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
    return str(d)


def test_common_spans_finds_planted_run_exactly(spark, span_dir):
    from doc2vec_spark.operators.dedup import QUERIES

    rows = QUERIES["dedup_common_spans"].fn(spark, span_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    # a 15-word shared run = 11 consecutive 5-gram shingles
    assert r["max_run"] == 11 and r["span_words"] == 15


def test_mixture_sample_budget_and_maximality(spark):
    """Per language: selected tokens never exceed the budget, and the fill
    is maximal — the FIRST unselected doc in md5 order would overflow it."""
    import math

    from doc2vec_spark.operators.pipeline import (
        MIXTURE_BUDGET_FRAC,
        QUERIES,
    )
    from doc2vec_spark.tables import load
    from tests.conftest import SF_DIR

    sel = QUERIES["pipe_mixture_sample"].fn(spark, SF_DIR)
    tok = load(spark, SF_DIR, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tok"),
    )
    lt = {r["lang"]: r["t"] for r in tok.groupBy("lang").agg(F.sum("n_tok").alias("t")).collect()}
    weights = {lang: int(math.floor(math.sqrt(t))) for lang, t in lt.items()}
    sw = sum(weights.values())
    b = int(math.floor(MIXTURE_BUDGET_FRAC * sum(lt.values())))
    budgets = {lang: (b * w) // sw for lang, w in weights.items()}

    got = {
        r["lang"]: (r["n"], r["tokens"])
        for r in sel.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("tokens"))
        .collect()
    }
    order = (
        tok.withColumn("key", F.md5(F.col("doc_id").cast("string")))
        .orderBy("lang", "key", "doc_id")
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in order:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, budget in budgets.items():
        n_sel, tok_sel = got.get(lang, (0, 0))
        assert tok_sel <= budget, (lang, tok_sel, budget)
        # maximality: the next doc in fill order would exceed the budget
        docs = by_lang[lang]
        if n_sel < len(docs):
            assert tok_sel + docs[n_sel]["n_tok"] > budget, (lang, n_sel)


def test_mixture_sample_is_deterministic(spark):
    from doc2vec_spark.operators.pipeline import QUERIES
    from tests.conftest import SF_DIR

    a = sorted(map(tuple, QUERIES["pipe_mixture_sample"].fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, QUERIES["pipe_mixture_sample"].fn(spark, SF_DIR).collect()))
    assert a == b and len(a) > 0
