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
