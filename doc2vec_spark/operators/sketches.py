"""Deterministic frequency sketches (round 7, session 2).

`ext_approx_count_distinct` / `ext_approx_quantile` (extensions.py) cover
cardinality and quantile sketching; this module adds the third classic
streaming sketch: Count-Min frequency estimation (Cormode & Muthukrishnan
2005). A CMS is deterministic given its hash functions, so — unlike most
"approximate" operators — the whole sketch, every estimate, and the
one-sided error invariant are exactly replayable in SQL and value-hash
checkable by the driver.

100 TB story: the sketch is a fixed d x w integer grid built by ONE
token-keyed aggregation (map-side combinable — per-partition grids merge
by cell-wise addition, which is exactly what Spark's partial aggregation
does to the SUMs here), and the estimate join is against a d*w-row (3 KiB)
broadcast table. Exact per-token counts need a full token shuffle; the
sketch never does — that is the point of carrying it at scale.
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


CMS_DEPTH = 3  # independent hash rows
CMS_WIDTH = 16  # counters per row — sized to the fixture vocabulary (31 tokens)
# so hash collisions actually occur and the overestimate column is exercised;
# production sizing is w = ceil(e / eps) (e.g. 2720 for 0.1% error)
CMS_TOP_K = 20  # heavy hitters reported


def _cms_pos_sql(d: int) -> str:
    """Row-d hash position: disjoint 8-hex md5 windows, like the Bloom
    gate's position family."""
    return f"('0x' || substr(md5(tok), {8 * d + 1}, 8))::BIGINT % {CMS_WIDTH}"


def _cms_pos_expr(d: int):
    return (
        F.conv(F.substring(F.md5(F.col("tok")), 8 * d + 1, 8), 16, 10).cast("long")
        % CMS_WIDTH
    )


@_register(
    "sk_count_min_tokens",
    f"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    exact AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM toks GROUP BY tok
    ),
    cells AS (
      -- the sketch: d x w cell sums (built from the exact table only to
      -- keep the SQL compact; cell values are identical to summing raw
      -- occurrences)
      SELECT d, CASE d {" ".join(f"WHEN {d} THEN {_cms_pos_sql(d)}" for d in range(CMS_DEPTH))} END AS pos,
             CAST(SUM(exact_cnt) AS BIGINT) AS cell
      FROM exact, unnest([{", ".join(map(str, range(CMS_DEPTH)))}]) t(d)
      GROUP BY 1, 2
    ),
    est AS (
      SELECT e.tok, e.exact_cnt, MIN(c.cell) AS cms_est
      FROM exact e,
           unnest([{", ".join(map(str, range(CMS_DEPTH)))}]) t(d)
      JOIN cells c
        ON c.d = t.d
       AND c.pos = CASE t.d {" ".join(f"WHEN {d} THEN {_cms_pos_sql(d).replace('tok', 'e.tok')}" for d in range(CMS_DEPTH))} END
      GROUP BY e.tok, e.exact_cnt
    )
    SELECT tok, exact_cnt, cms_est,
           cms_est > exact_cnt AS overestimated,
           cms_est >= exact_cnt AS never_underestimates
    FROM est
    ORDER BY exact_cnt DESC, tok
    LIMIT {CMS_TOP_K}
    """,
    "Count-Min-Sketch heavy hitters: a {d} x {w} deterministic CMS over "
    "the token stream (md5-window hash rows), reporting the top-{k} exact "
    "tokens with their sketch estimates and the one-sided-error invariant "
    "(CMS never underestimates — hash-checked as a column). The sketch is "
    "ONE map-side-combinable aggregation into {d}*{w} cells (3 KiB, "
    "mergeable across partitions/streams by cellwise addition); estimates "
    "join against the broadcast-size cell table. The exact counts exist "
    "here only as ground truth for the oracle.".format(
        d=CMS_DEPTH, w=CMS_WIDTH, k=CMS_TOP_K
    ),
)
def sk_count_min_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    depth = F.explode(F.array(*[F.lit(d) for d in range(CMS_DEPTH)])).alias("d")
    pos = F.when(F.col("d") == 0, _cms_pos_expr(0))
    for d in range(1, CMS_DEPTH):
        pos = pos.when(F.col("d") == d, _cms_pos_expr(d))
    keyed = exact.select("tok", "exact_cnt", depth).withColumn("pos", pos)
    cells = keyed.groupBy("d", "pos").agg(F.sum("exact_cnt").alias("cell"))
    est = (
        keyed.join(F.broadcast(cells), ["d", "pos"])
        .groupBy("tok", "exact_cnt")
        .agg(F.min("cell").alias("cms_est"))
    )
    return (
        est.select(
            "tok",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") > F.col("exact_cnt")).alias("overestimated"),
            (F.col("cms_est") >= F.col("exact_cnt")).alias("never_underestimates"),
        )
        .orderBy(F.desc("exact_cnt"), "tok")
        .limit(CMS_TOP_K)
    )
