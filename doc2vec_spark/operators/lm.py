"""Unigram language-model quality scoring (round 4).

CCNet/Gopher-style pipelines gate documents on a language-model score: a
document whose tokens are improbable under a corpus LM is likely junk
(boilerplate soup, encoding damage, keyword stuffing). The classic filter
trains a 5-gram KenLM and thresholds perplexity; the Spark-native,
cross-engine-deterministic core of that signal is a *unigram* corpus LM —
token frequencies over the corpus itself — scored per document with pure
integer/rational arithmetic (the repo-wide log-free rule, see
ta_distinctive_tokens: ln() is libm-dependent, an integer ratio is
bit-identical everywhere; the monotone transform does not change which
documents a threshold keeps).

Pipeline shape (all keyed, 100 TB-safe):
  1. token counts: one explode + groupBy(token) — the same shuffle budget as
     ta_vocab_topk;
  2. vocabulary: top-VOCAB_K tokens by count — TakeOrderedAndProject, then
     the K-row vocab broadcasts to the scoring join (at real scale K is the
     tokenizer vocab, 10^4..10^6 rows — still broadcast territory);
  3. per-doc score: tokens LEFT JOIN vocab (broadcast), one groupBy(doc_id):
     - lm_score_ppm: floor(1e6 * sum(count(tok)) / (len * total_tokens)) —
       the mean corpus frequency of the document's tokens in ppm, i.e. the
       document's average unigram probability scaled to an exact integer;
     - oov_bp: floor(1e4 * oov / len) — out-of-vocabulary rate in basis
       points (KenLM pipelines likewise track OOV rate alongside ppl).
  The corpus total enters as a bounded one-row `.first()` scalar (same
  precedent as ann_ivf_search's query fetch), keeping the returned plan free
  of single-partition exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc2vec_spark.caching import scoped_cache
from doc2vec_spark.spec import QuerySpec
from doc2vec_spark.tables import load

QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


VOCAB_K = 20  # top-K tokens form the LM vocabulary; the rest are OOV


@_register(
    "ta_unigram_lm_score",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    cnts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS total FROM cnts),
    vocab AS (SELECT tok, cnt FROM cnts ORDER BY cnt DESC, tok LIMIT {VOCAB_K})
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           COUNT(v.cnt) AS known_tokens,
           floor(10000.0 * (COUNT(*) - COUNT(v.cnt)) / COUNT(*))::BIGINT AS oov_bp,
           floor(1000000.0 * SUM(COALESCE(v.cnt, 0))
                 / (COUNT(*) * (SELECT total FROM tot)))::BIGINT AS lm_score_ppm
    FROM toks LEFT JOIN vocab v USING (tok)
    GROUP BY doc_id
    """,
    "Unigram-LM quality score per document: mean in-vocabulary corpus "
    "frequency (ppm) + OOV rate (bp), integer-exact on both engines. The "
    "log-free stand-in for a KenLM perplexity gate — same shuffle budget as "
    "the vocab top-k plus one broadcast-join scoring pass.",
)
def ta_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    # corpus unigram table: one keyed shuffle, reused by vocab AND the total
    cnts = scoped_cache(toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")))
    total = cnts.agg(F.sum("cnt").alias("t")).first()["t"]  # bounded 1-row scalar
    vocab = cnts.orderBy(F.desc("cnt"), F.asc("tok")).limit(VOCAB_K)
    scored = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count("cnt").alias("known_tokens"),
            F.sum(F.coalesce(F.col("cnt"), F.lit(0))).alias("sum_cnt"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "known_tokens",
        F.floor(
            F.lit(10000.0) * (F.col("n_tokens") - F.col("known_tokens")) / F.col("n_tokens")
        ).alias("oov_bp"),
        F.floor(
            F.lit(1000000.0) * F.col("sum_cnt") / (F.col("n_tokens") * F.lit(total))
        ).alias("lm_score_ppm"),
    )


# ---------------------------------------------------------------------------
# DSIR-style importance scoring (round 5)
# ---------------------------------------------------------------------------
# Xie et al., "Data Selection for Language Models via Importance Resampling"
# (DSIR, arXiv:2302.03169): score raw-pool documents by how much more likely
# their content is under a target-domain LM than under the raw-pool LM, then
# resample by the importance weight. The published estimator factorizes over
# hashed n-grams with log-probabilities; the cross-engine-deterministic core
# here is the same two-LM contrast with the repo's log-free discipline:
# per-document INTEGER sums of target / raw unigram counts (exact,
# order-free), one double division at the end (identical operation order in
# both engines), Laplace +1 on both sums. The monotone per-doc ratio keeps
# the same resampling order a log-space score would produce for fixed
# document length, and a threshold keeps the same documents.
#
# Shape (all keyed): two token-keyed count shuffles (target, raw), a
# token-keyed join of the doc tokens against each (vocab-sized at scale —
# keyed, AQE may broadcast small ones), one doc-keyed aggregation. Totals
# enter as bounded 1-row scalars.

DSIR_TARGET_SOURCE = "src0"  # the in-domain exemplar slice


@_register(
    "ta_dsir_importance",
    f"""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    tgt AS (
      SELECT tok, COUNT(*) AS c FROM toks
      WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY tok
    ),
    raw AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tt AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM tgt),
    tr AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM raw),
    per_doc AS (
      SELECT toks.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(COALESCE(tgt.c, 0)) AS BIGINT) AS s_target,
             CAST(SUM(raw.c) AS BIGINT) AS s_raw
      FROM toks
      LEFT JOIN tgt USING (tok)
      JOIN raw USING (tok)
      GROUP BY toks.doc_id
    )
    SELECT doc_id, n_tokens, s_target, s_raw,
           CAST(floor(1000000.0 * ((s_target + 1) * 1.0 * (SELECT t FROM tr))
                      / ((s_raw + 1) * 1.0 * (SELECT t FROM tt))) AS BIGINT)
             AS importance_ppm
    FROM per_doc
    """,
    "DSIR-style importance score: per-doc target-LM vs raw-LM unigram mass "
    "ratio in ppm (Laplace +1, integer-exact sums, one double division — "
    "the log-free deterministic core of arXiv:2302.03169). Two token-keyed "
    "count shuffles + keyed scoring joins + one doc-keyed aggregation.",
)
def ta_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    )
    tgt = (
        toks.filter(F.col("source") == DSIR_TARGET_SOURCE)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    raw = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("rc"))
    raw = scoped_cache(raw)  # read by the total AND the scoring join
    t_target = tgt.agg(F.sum("tc")).first()[0]  # bounded 1-row scalars
    t_raw = raw.agg(F.sum("rc")).first()[0]
    per_doc = (
        toks.join(tgt, "tok", "left")
        .join(raw, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("tc"), F.lit(0))).alias("s_target"),
            F.sum("rc").alias("s_raw"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "s_target",
        "s_raw",
        F.floor(
            F.lit(1000000.0)
            * ((F.col("s_target") + 1) * F.lit(1.0) * F.lit(int(t_raw)))
            / ((F.col("s_raw") + 1) * F.lit(1.0) * F.lit(int(t_target)))
        )
        .cast("long")
        .alias("importance_ppm"),
    )
