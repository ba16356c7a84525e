"""Vocabulary-scale tokenizer encode: greedy longest-match against a piece
TABLE (round 11, VERDICT r9 #3).

``wordpiece.py`` proved the tokenizer-APPLY plan shape (native fold over the
distinct-word table, broadcast rejoin) but its vocabulary is a 28-entry toy
expressed as literal ``isin`` lists — a shape that dies at the 32k-64k
pieces a real subword tokenizer carries (a 32k-literal expression tree is
megabytes of plan; every executor re-parses it per stage). This module
re-expresses the encode against a vocabulary **DataFrame**, so the vocab
rides the broadcast-join machinery like any other dimension table and the
same plan runs a 28-piece toy or a 64k-piece production vocab:

1. ``grid``: the distinct-word table exploded to one row per (word, pos),
   pos = 1..len(word) — at most ``MAX_WORD_CHARS`` rows per word;
2. longest-match resolution: for each piece length L = MAX_PIECE_CHARS..2,
   one BROADCAST left join of the grid against the length-L slice of the
   vocab on ``substring(word, pos, L) = piece`` (equi-join on an
   expression key; a length-L substring can never equal a piece of a
   different length, so the slices are disjoint and each join matches at
   most once). ``step(word, pos)`` = the largest matched L, else 1 — the
   implicit single-character alphabet, the same fallback wordpiece.py
   documents;
3. ``steps``: ONE word-keyed shuffle folds the grid back to a per-word
   int array ``steps[pos]``;
4. the greedy walk is ONE native ``F.aggregate`` fold over the position
   sequence reading ``element_at(steps, pos)`` — pos advances by the
   precomputed longest match, pieces concatenate '|'-separated. The fold
   is LINEAR (the round-9 plan-linearity rule: higher-order folds
   reference the materialized accumulator, never re-inline subtrees);
5. words longer than ``MAX_WORD_CHARS`` take the ``[UNK]`` branch
   (wordpiece max_input_chars_per_word), as in wordpiece.py.

No literal lists, no UDF, no driver-side vocab collect — the vocabulary
never leaves the cluster.

Engine-exactness: the walk is pure integer/string logic; both engines
compute identical steps (MAX(len(piece)) over the same join) and identical
pieces, so results hash-match without tolerance. The oracle mirrors the
grid/steps/walk construction with a recursive CTE.

Registry-entry vocabulary: derived from the corpus itself by the weighted
substring statistic (``derive_vocab``: all substrings of length
2..MAX_PIECE_CHARS of eligible words, scored SUM(word freq) over
overlapping occurrences, top-K by score DESC, piece ASC). The synthetic
corpus holds only ~31 distinct words, so the registered query pins
K = REGISTRY_VOCAB_K (40) — small enough that multi-piece walks actually
occur in the hash-checked output. Scale is carried by the SHAPE, not the
constant: tests/test_round11_ops.py drives the identical
``encode_against_vocab`` plan with a 5000-piece synthetic vocabulary
against a pure-Python greedy replay, and BENCH_SCALING.md records the
vocab-size scaling row (DEFAULT_VOCAB_K vs 10x).

100 TB story: the corpus collapses to the distinct-word table first (one
token shuffle, the table every ta_* operator reuses); the grid is
word-table-sized x <=16; the 7 longest-match joins are broadcast
(a 64k-piece vocab is ~1 MB — dimension-table territory); the only
shuffles after the word table are the vocab substring statistic and the
one word-keyed steps fold. Corpus size enters occurrence rejoins only.
The reference has no tokenizer at all (token arithmetic is 4 chars/token,
doc2vec.ts:2006-2008) — this tier is the LLM-pipeline capability the
Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc2vec_spark.spec import QuerySpec
from doc2vec_spark.tables import load

QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


MAX_WORD_CHARS = 16  # longer words -> [UNK] (wordpiece max_input_chars rule)
MAX_PIECE_CHARS = 8  # longest vocabulary piece the matcher considers
DEFAULT_VOCAB_K = 4096  # engine default for derive_vocab
REGISTRY_VOCAB_K = 40  # registered query: forces multi-piece walks at ~31 words
UNK = "[UNK]"


def corpus_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT-word frequency table — the one corpus-sized shuffle.
    (Restated rather than imported from wordpiece.py so this module's spec
    closure stays self-contained.)"""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


# ---------------------------------------------------------------------------
# r22 batch 5: single-parse SQL forms of this module's higher-order
# expressions (guide §1.2 driver-side cost; the r21 _MINS_STRUCT_SQL /
# lit_vector precedent). Each template is ONE spark.expr parse instead of a
# Python-lambda tree assembled via dozens of py4j calls, and parses to the
# semantically identical expression (same CASE/filter/transform/aggregate
# shape, same field names, same operation order — bit-identical results;
# pinned by test_round11_ops' pure-Python greedy replay and the oracle
# parity suite). This construction cost was measured at ~0.5 s per
# consumer with SIX subword-family consumers paying it per bench rep.
# ---------------------------------------------------------------------------

# every in-bounds substring of word at start i, lengths 2..{mp}
_VOCAB_SUBS_SQL = (
    "filter(transform(sequence(2, {mp}), l -> "
    "CASE WHEN i + l - 1 <= length(word) THEN substring(word, i, l) END), "
    "p -> p IS NOT NULL)"
)

# per-word candidate (pos, l, sub) probe structs, all positions x lengths
_PROBES_SQL = (
    "flatten(transform(sequence(1, length(word)), p -> "
    "filter(transform(sequence(2, {mp}), l -> "
    "CASE WHEN p + l - 1 <= length(word) THEN "
    "named_struct('pos', p, 'l', l, 'sub', substring(word, p, l)) END), "
    "s -> s IS NOT NULL)))"
)

# steps[pos] = longest matched piece length at pos, else 1
_STEPS_SQL = (
    "transform(sequence(1, length(word)), p -> "
    "coalesce(aggregate(filter(ms, m -> m.pos = p), 1, "
    "(acc, m) -> greatest(acc, m.l)), 1))"
)

# the greedy longest-match walk: ONE linear fold over char positions
_WALK_SQL = (
    "aggregate(sequence(1, length(word)), "
    "named_struct('pos', 1, 'pieces', '', 'n', 0), "
    "(acc, i) -> CASE WHEN acc.pos > length(word) THEN acc ELSE "
    "named_struct('pos', acc.pos + element_at(steps, acc.pos), "
    "'pieces', concat(acc.pieces, '|', substring(word, acc.pos, "
    "element_at(steps, acc.pos))), "
    "'n', acc.n + 1) END, "
    "acc -> named_struct('pieces', substring(acc.pieces, 2, "
    "length(acc.pieces)), 'n', CAST(acc.n AS BIGINT)))"
)


def derive_vocab(words: DataFrame, k: int = DEFAULT_VOCAB_K) -> DataFrame:
    """Corpus-derived piece table: every substring of length
    2..MAX_PIECE_CHARS of eligible (<= MAX_WORD_CHARS) words, scored by
    SUM(freq) over overlapping occurrences, top-k (score DESC, piece ASC).
    Returns a single-column ``piece`` DataFrame. The top-k is a
    TakeOrderedAndProject — no global sort."""
    subs = (
        words.filter(F.length("word") <= MAX_WORD_CHARS)
        .select(
            "word",
            "freq",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
        )
        .select(
            "freq",
            # r22 batch 5 (guide §1.2 driver cost, the _MINS_STRUCT_SQL
            # precedent): parsed once instead of a Python-lambda HOF tree
            # built through dozens of py4j round trips per consumer; the
            # parsed expression is the identical filter/transform/CASE tree
            F.explode(
                F.expr(_VOCAB_SUBS_SQL.format(mp=MAX_PIECE_CHARS))
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.desc("n"), F.asc("piece"))
        .limit(k)
    )
    return subs.select("piece")


def encode_against_vocab(
    df: DataFrame,
    vocab: DataFrame,
    word_col: str = "word",
    max_piece_chars: int = MAX_PIECE_CHARS,
    max_word_chars: int = MAX_WORD_CHARS,
) -> DataFrame:
    """``df`` + (pieces, n_pieces): greedy longest-match encoding of
    ``df[word_col]`` against the ``piece`` column of ``vocab`` — the
    vocab-TABLE path (any vocabulary size; nothing is collected).

    ``df`` should be word-distinct (the word-frequency table); duplicate
    words would just redo identical walks. ``vocab`` pieces longer than
    ``max_piece_chars`` can never match (the grid only probes lengths
    2..max_piece_chars) and are dropped up front."""
    words = df.select(F.col(word_col).alias("word")).filter(
        F.length("word").between(1, max_word_chars)
    )
    # r21 (guide §2.4 / §1.2): the longest-match probe used to be SEVEN
    # chained broadcast hash joins — one per piece length, each with its own
    # broadcast-build job (measured: the dominant share of the 6-query
    # subword family's build jobs at sf0.1). A substring of length L can
    # only ever equal a piece of length L, so every length probes the SAME
    # vocabulary safely in ONE join: explode each word map-side to its
    # full-length candidate substrings (pos, l, sub) for l = 2..max — at
    # most max_word_chars * (max_piece_chars - 1) rows per DISTINCT word —
    # and inner-join once against the whole (deduped, length-capped) piece
    # table. step(word, pos) = max matched l else 1, exactly the oracle's
    # COALESCE(MAX(len(piece)), 1); words with no match anywhere (or too
    # short to probe) re-enter via the left join against the word table,
    # which both sides reach already hash-partitioned by word.
    vl = (
        vocab.filter(F.length("piece").between(2, max_piece_chars))
        .select("piece")
        .distinct()
    )
    probes = words.select(
        "word",
        F.explode(F.expr(_PROBES_SQL.format(mp=max_piece_chars))).alias("m"),
    ).select("word", "m.pos", "m.l", "m.sub")
    matches = probes.join(
        F.broadcast(vl), probes["sub"] == vl["piece"]
    ).select("word", "pos", "l")
    msteps = matches.groupBy("word").agg(
        F.collect_list(F.struct("pos", "l")).alias("ms")
    )
    steps = words.join(msteps, "word", "left").select(
        "word",
        F.expr(_STEPS_SQL).alias("steps"),
    )

    # ADVICE r11: the fold must be referenced ONCE — a select that reads
    # walked['pieces'] / walked['n'] directly re-inlines the whole greedy
    # walk per reference (the plan-linearity anti-pattern
    # embedding_native.py documents as 6x slower). The finish lambda does
    # the strip/cast over the accumulator VALUE (variable reads, not
    # re-evaluations), the fold lands as ONE aliased struct column, and a
    # second select projects its fields — GetStructField on an attribute
    # is cheap, so CollapseProject keeps the two projections separate and
    # the walk evaluates exactly once per word. (r22 batch 5: the fold and
    # the steps transform now arrive via module-level single-parse SQL —
    # identical trees, one parser call each instead of the lambda builders.)
    walked = F.expr(_WALK_SQL)
    enc = steps.select("word", walked.alias("_w")).select(
        "word",
        F.col("_w")["pieces"].alias("_pieces"),
        F.col("_w")["n"].alias("_n_pieces"),
    )
    joined = df.join(enc, df[word_col] == enc["word"], "left")
    too_long = F.length(df[word_col]) > max_word_chars
    return joined.select(
        *[df[c] for c in df.columns],
        F.when(too_long, F.lit(UNK)).otherwise(F.col("_pieces")).alias("pieces"),
        F.when(too_long, F.lit(1).cast("long"))
        .otherwise(F.col("_n_pieces"))
        .alias("n_pieces"),
    )


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

_WORDS_SQL = r"""
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents)
  WHERE tok <> '' GROUP BY tok
"""


def _enc_ctes(k: int) -> str:
    """words/vocab/grid/steps/walk/enc CTE chain mirroring the engine."""
    return f"""WITH RECURSIVE
words AS ({_WORDS_SQL}),
vocab AS (
  SELECT piece FROM (
    SELECT substr(word, i, l) AS piece, SUM(freq) AS n
    FROM words,
         unnest(generate_series(1, {MAX_WORD_CHARS})) t(i),
         unnest(generate_series(2, {MAX_PIECE_CHARS})) u(l)
    WHERE len(word) <= {MAX_WORD_CHARS} AND i + l - 1 <= len(word)
    GROUP BY piece)
  ORDER BY n DESC, piece LIMIT {k}),
grid AS (
  SELECT word, i AS pos
  FROM (SELECT word FROM words WHERE len(word) <= {MAX_WORD_CHARS}),
       unnest(generate_series(1, {MAX_WORD_CHARS})) t(i)
  WHERE i <= len(word)),
steps AS (
  SELECT g.word, g.pos, CAST(COALESCE(MAX(len(v.piece)), 1) AS INTEGER) AS step
  FROM grid g LEFT JOIN vocab v
    ON v.piece = substr(g.word, g.pos, len(v.piece))
  GROUP BY g.word, g.pos),
walk(word, pos, pieces, n) AS (
  SELECT word, 1, '', 0 FROM words WHERE len(word) <= {MAX_WORD_CHARS}
  UNION ALL
  SELECT w.word, w.pos + s.step,
         w.pieces || '|' || substr(w.word, w.pos, s.step), w.n + 1
  FROM walk w JOIN steps s ON s.word = w.word AND s.pos = w.pos
  WHERE w.pos <= len(w.word)),
enc AS (
  SELECT word, substr(pieces, 2) AS pieces, CAST(n AS BIGINT) AS n_pieces
  FROM walk WHERE pos > len(word)
  UNION ALL
  SELECT word, '{UNK}', CAST(1 AS BIGINT)
  FROM words WHERE len(word) > {MAX_WORD_CHARS})"""


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


@_register(
    "ta_vocab_table_encode",
    _enc_ctes(REGISTRY_VOCAB_K)
    + """
SELECT w.word, w.freq, e.pieces, e.n_pieces
FROM words w JOIN enc e USING (word)""",
    "Greedy longest-match subword encode of every distinct corpus word "
    "against a corpus-derived piece TABLE (top-40 weighted substrings, "
    "lengths 2-8) — the vocabulary-scale generalization of "
    "ta_wordpiece_encode: broadcast length-sliced joins resolve the "
    "longest match per (word, pos), one word-keyed fold builds the steps "
    "array, one native F.aggregate walk emits the pieces. No literal "
    "lists, no UDF, no driver vocab collect; the identical plan carries a "
    "64k-piece production vocabulary (5k-piece property test in "
    "tests/test_round11_ops.py).",
)
def ta_vocab_table_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = corpus_words(spark, sf_dir)
    vocab = derive_vocab(words, REGISTRY_VOCAB_K)
    return encode_against_vocab(words, vocab).select(
        "word", "freq", "pieces", "n_pieces"
    )


@_register(
    "ta_vocab_table_stats",
    _enc_ctes(REGISTRY_VOCAB_K)
    + f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(w.freq) AS BIGINT) AS total_occurrences,
       CAST(SUM(w.freq * e.n_pieces) AS BIGINT) AS total_subword_tokens,
       CAST(MAX(e.n_pieces) AS BIGINT) AS max_pieces_per_word,
       CAST(SUM(CASE WHEN len(w.word) > {MAX_WORD_CHARS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unk_words
FROM words w JOIN enc e USING (word)""",
    "Corpus-level subword accounting under the vocab-TABLE encoder: one "
    "integer-exact aggregate over the per-word encoding (occurrence "
    "totals weight by word frequency — the number a sequence-packing or "
    "data-budget pass would actually consume). All-integer output, "
    "hash-exact across engines.",
)
def ta_vocab_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = corpus_words(spark, sf_dir)
    vocab = derive_vocab(words, REGISTRY_VOCAB_K)
    enc = encode_against_vocab(words, vocab)
    return enc.agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("freq").cast("long").alias("total_occurrences"),
        F.sum(F.col("freq") * F.col("n_pieces")).cast("long").alias(
            "total_subword_tokens"
        ),
        F.max("n_pieces").cast("long").alias("max_pieces_per_word"),
        F.sum(
            F.when(F.length("word") > MAX_WORD_CHARS, 1).otherwise(0)
        ).cast("long").alias("n_unk_words"),
    )
