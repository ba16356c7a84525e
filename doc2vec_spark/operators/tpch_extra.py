"""Additional TPC-H-shape relational queries (round 4).

The round-1 headline set (analytics.py) covers Q1/Q3/Q5/Q6/Q18; this module
adds the remaining *distinct optimizer shapes* the benchmark exercises —
left-outer count distribution, conditional-aggregate ratio, filter-by-
global-max, correlated per-group average, OR-of-ANDs pushdown, NOT-EXISTS
with a global scalar guard, and a returned-items top-k — adapted to the
driver's simplified schema (no partsupp / commitdate / shipmode / phone
columns; each docstring notes the substitution).

Scale discipline shared by every query here:
- dims (part, customer, supplier, nation) broadcast; the lineitem/orders
  facts shuffle at most once on their join key;
- no global single-row aggregates in a returned plan — each query groups on
  a real key (brand, month, nation, count-bucket) so the final aggregate
  stays distributed at 100 TB;
- global scalars (Q15's max, Q22's avg) come from a separate bounded
  `.first()` job (1 row collected — same precedent as ann_ivf_search's
  query-vector fetch), then re-enter the plan as literals, which keeps the
  returned plan free of BroadcastNestedLoopJoin / SinglePartition exchanges;
- every float that crosses the hash gate goes through pround/det_avg
  (functions/rounding.py) so DuckDB and Spark agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doc2vec_spark.functions.rounding import det_avg, pround, sql_det_avg, sql_round
from doc2vec_spark.spec import QuerySpec
from doc2vec_spark.tables import load

QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


_REV = "l_extendedprice * (1 - l_discount)"


@_register(
    "tpch_q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name,
           floor((c_acctbal) * 100.0 + 0.5) / 100.0 AS acctbal,
           revenue
    FROM (
      SELECT c_custkey, c_name, c_acctbal, n_name,
             {sql_round(f"SUM({_REV})", 2)} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
    ) ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "TPC-H Q10 returned-item reporting: fact-fact join shuffles once on the "
    "orderkey, customer+nation broadcast, grouped revenue, top-20 via "
    "TakeOrderedAndProject (no global sort).",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(pround(F.sum(rev), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            pround(F.col("c_acctbal"), 2).alias("acctbal"),
            "revenue",
        )
    )


@_register(
    "tpch_q13_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN (
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      ) ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
    "TPC-H Q13 customer order-count distribution (priority filter stands in "
    "for the comment LIKE — the schema carries no o_comment). LEFT OUTER "
    "join so zero-order customers survive into the c_count=0 bucket; two "
    "keyed aggregations, no global order.",
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_custkey")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@_register(
    "tpch_q14_promo_effect",
    f"""
    SELECT month,
           floor((SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0 END)) * 100.0 + 0.5) / 100.0
             AS promo_revenue,
           floor((SUM({_REV})) * 100.0 + 0.5) / 100.0 AS total_revenue,
           100.0 * (floor((SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0 END)) * 100.0 + 0.5))
                 / (floor((SUM({_REV})) * 100.0 + 0.5)) AS promo_pct
    FROM (
      SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
             l_extendedprice, l_discount, p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-07-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    ) GROUP BY month
    """,
    "TPC-H Q14 promotion effect, per month instead of a single global row so "
    "the final aggregate keeps a distribution key at scale. The ratio "
    "divides the two cent-snapped sums (exact integers), so one IEEE "
    "division — bit-identical across engines; part broadcasts.",
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-07-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    promo_cents = F.floor(F.sum(promo) * 100.0 + F.lit(0.5))
    total_cents = F.floor(F.sum(rev) * 100.0 + F.lit(0.5))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("month"))
        .agg(
            (promo_cents / F.lit(100.0)).alias("promo_revenue"),
            (total_cents / F.lit(100.0)).alias("total_revenue"),
            (F.lit(100.0) * promo_cents / total_cents).alias("promo_pct"),
        )
    )


@_register(
    "tpch_q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey, {sql_round(f"SUM({_REV})", 2)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON suppkey = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    "TPC-H Q15 top supplier: per-supplier revenue (one keyed shuffle), the "
    "global max fetched by a separate bounded .first() job (per-supplier "
    "partials only) and re-entered as a literal — the returned plan carries "
    "no single-partition exchange. Equality on the cent-snapped revenue is "
    "exact, so ties surface identically on both engines.",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supplier = load(spark, sf_dir, "supplier")
    from doc2vec_spark.caching import scoped_cache

    # r22 batch 6 (guide §1.2/§2.4): the `.first()` max probe paid the full
    # per-supplier revenue aggregation, then the returned plan re-ran the
    # same fact scan + suppkey shuffle — TWO lineitem passes. The bounded
    # per-supplier table is now scoped-cached and the global max re-enters
    # as a 1-row broadcast frame equi-joined on the cent-snapped revenue
    # itself (exact-double equality, the same comparison the filter made;
    # a NULL max from an empty window joins nothing, matching the old
    # `== lit(None)` filter). One fact pass, one action.
    rev = scoped_cache(
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(supplier), F.col("suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@_register(
    "tpch_q17_small_quantity",
    f"""
    WITH pa AS (
      SELECT l_partkey AS pk, {sql_det_avg('SUM(l_quantity)', 'COUNT(*)', 0)} AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           floor((SUM(l_extendedprice)) * 100.0 + 0.5) / 100.0 / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pa ON l_partkey = pk
    WHERE p_type = 'SMALL' AND l_quantity < 0.2 * avg_qty
    GROUP BY p_brand
    """,
    "TPC-H Q17 small-quantity revenue, grouped per brand (the driver schema "
    "has no container column; a global single row would also serialize the "
    "final agg). The correlated per-part average is a self-aggregation "
    "joined back on the part key — det_avg snaps the integral quantity sum "
    "so the 0.2x threshold compares bit-identical doubles on both engines.",
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL").select(
        "p_partkey", "p_brand"
    )
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        det_avg(F.sum("l_quantity"), F.count(F.lit(1)), 0).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .groupBy("p_brand")
        .agg(
            (pround(F.sum("l_extendedprice"), 2) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_register(
    "tpch_q19_disjunctive_revenue",
    f"""
    SELECT p_brand, {sql_round(f"SUM({_REV})", 2)} AS revenue, COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#17' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    GROUP BY p_brand
    """,
    "TPC-H Q19 OR-of-ANDs predicate, per matched brand. The disjunction "
    "references both sides, so it evaluates as a post-join filter on the "
    "broadcast hash join; the partkey equi-key keeps the join bounded and "
    "Catalyst pushes the derivable per-side conjuncts (brand/size on part, "
    "quantity range on lineitem) below the join.",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    c2 = (
        (F.col("p_brand") == "Brand#14")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    c3 = (
        (F.col("p_brand") == "Brand#17")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        joined.filter(c1 | c2 | c3)
        .groupBy("p_brand")
        .agg(
            pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "tpch_q22_global_sales_opportunity",
    f"""
    WITH avg_bal AS (
      SELECT {sql_det_avg('SUM(c_acctbal)', 'COUNT(*)')} AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name, COUNT(*) AS numcust,
           floor((SUM(c_acctbal)) * 100.0 + 0.5) / 100.0 AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    """,
    "TPC-H Q22 sales opportunity, grouped by nation (schema has no phone "
    "prefix). NOT EXISTS is a left-anti join on the custkey; the global "
    "positive-balance average is a bounded .first() scalar re-entered as a "
    "literal, det_avg-snapped (acctbal carries 2 decimals) so the strict "
    "comparison agrees bitwise with DuckDB's scalar subquery.",
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    nation = load(spark, sf_dir, "nation")
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(det_avg(F.sum("c_acctbal"), F.count(F.lit(1))).alias("a"))
        .first()["a"]
    )
    return (
        customer.filter(F.col("c_acctbal") > F.lit(avg_bal))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            pround(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Round-7 session 2: the remaining distinct TPC-H optimizer shapes.
# Schema adaptations (driver tables lack partsupp / l_commitdate /
# l_receiptdate / l_shipmode): Q4/Q21's "late delivery" predicate becomes
# l_returnflag = 'R' (same correlated-exists shape against the same fact);
# Q12's shipmode becomes l_linestatus; Q16's "customer complaints"
# exclusion becomes negative-balance suppliers. Each docstring notes the
# substitution; the plan shapes are the originals'.
# ---------------------------------------------------------------------------


@_register(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4 order-priority checking (EXISTS shape; late-delivery "
    "predicate adapted to l_returnflag = 'R' — no commit/receipt dates in "
    "the driver schema): the correlated EXISTS compiles to a LEFT SEMI "
    "join on the orderkey — one fact-fact semi shuffle, then a grouped "
    "count on the 5-value priority key. No decorrelation machinery needed: "
    "the semi join IS the idiomatic Spark plan.",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    returned = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_round(f"SUM({_REV})", 2)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year, l_extendedprice, l_discount
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    "TPC-H Q7 volume shipping: the nation-PAIR disjunction. supplier, "
    "customer and both nation copies broadcast; lineitem⋈orders is the one "
    "fact shuffle (orderkey-keyed). The pair filter is a pushable "
    "disjunction over two broadcast-joined dims — no cross join, no "
    "OR-expansion into a union.",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    customer = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(pround(F.sum(rev), 2).alias("revenue"))
    )


@_register(
    "tpch_q8_market_share",
    f"""
    SELECT l_year,
           {sql_round(
               f"floor(SUM(CASE WHEN supp_nation = 'NATION_3' THEN {_REV} ELSE 0 END) * 100.0 + 0.5) / 100.0"
               f" / (floor(SUM({_REV}) * 100.0 + 0.5) / 100.0)", 6)} AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS l_year, l_extendedprice, l_discount,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY l_year
    """,
    "TPC-H Q8 national market share: 7 dims broadcast around the one "
    "lineitem⋈orders fact shuffle; share = NATION_3's revenue over total "
    "per order-year. Both sums are snapped to their exact cent value "
    "before the single IEEE division (same bit-determinism argument as "
    "det_avg), then pround(6).",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    snap = lambda c: F.floor(c * 100.0 + F.lit(0.5)) / 100.0  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("l_year"))
        .agg(
            pround(snap(F.sum(nat_rev)) / snap(F.sum(rev)), 6).alias("mkt_share")
        )
    )


@_register(
    "tpch_q12_line_priority",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    "TPC-H Q12 shipping modes & priority (l_linestatus stands in for the "
    "absent l_shipmode): one fact-fact shuffle on the orderkey with the "
    "shipdate filter pushed to the lineitem scan, then conditional counts "
    "on the 2-value status key — the map-side-combine-friendly shape.",
)
def tpch_q12_line_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


@_register(
    "tpch_q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size <= 20
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    "TPC-H Q16 supplier relationship counting (lineitem supplies the "
    "part-supplier pairs — no partsupp in the driver schema; the "
    "customer-complaints exclusion becomes negative-balance suppliers): "
    "broadcast LEFT ANTI join for the NOT IN (no null traps — keys are "
    "non-null), part broadcast, then COUNT(DISTINCT supplier) grouped on "
    "the (brand, type, size) key — the distinct expands map-side to "
    "(group, suppkey) and aggregates in one shuffle.",
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 20)
    )
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "tpch_q21_suppliers_kept_waiting",
    """
    SELECT s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE n_name = 'NATION_5' AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    "TPC-H Q21 suppliers kept waiting (late-delivery predicate adapted to "
    "l_returnflag = 'R'): the EXISTS + NOT-EXISTS pair over the same fact "
    "is rewritten as ONE per-order aggregate — n_suppliers and "
    "n_suppliers_with_R per orderkey in a single shuffle — joined back to "
    "the candidate lines (multi-supplier order AND exactly one offending "
    "supplier <=> n_supp >= 2 AND n_r_supp = 1). Two correlated scans "
    "collapse into one aggregation; top-10 via TakeOrderedAndProject.",
)
def tpch_q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from doc2vec_spark.caching import scoped_cache

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    # r21 (guide §2.3 "aggregate before you shuffle"): the two COUNT
    # DISTINCTs used to plan an Expand(x2) over the full fact table, and the
    # candidate branch re-scanned it. Both are functions of the DISTINCT
    # (orderkey, suppkey) pairs: aggregate the fact ONCE to pairs with a
    # has-R flag (max over the pair's lines), cache that, and derive
    #   n_supp   = COUNT(*)      per order   (= COUNT DISTINCT suppkey)
    #   n_r_supp = SUM(has_r)    per order   (= COUNT DISTINCT suppkey w/ R)
    #   cand     = pairs with has_r          (dedup is free: the final
    #              numwait is COUNT DISTINCT orderkey, so pair-level rows
    #              are exactly enough)
    # One scan + one pair-keyed exchange replaces two scans + the distinct
    # Expand; pair dedup also shrinks everything downstream.
    pairs = scoped_cache(
        li.groupBy("l_orderkey", "l_suppkey").agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("has_r")
        )
    )
    order_stats = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_r_supp"),
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    cand = pairs.filter(F.col("has_r") == 1).select("l_orderkey", "l_suppkey")
    return (
        cand.join(orders, cand.l_orderkey == orders.o_orderkey)
        .join(order_stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("s_name")
        # r22: COUNT(*) == COUNT(DISTINCT l_orderkey) here — pairs is
        # distinct on (orderkey, suppkey) by construction, the n_r_supp == 1
        # filter admits exactly ONE has_r pair per orderkey, and the
        # orders/supplier/nation joins are on their primary keys (unique in
        # the TPC-H schema), so every orderkey reaches this aggregate at
        # most once and the distinct pre-aggregation pass (one extra
        # exchange + double HashAggregate) bought nothing. The classic
        # key-constraint DISTINCT elimination, done by hand.
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@_register(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
      SELECT u.l_partkey, u.l_suppkey, u.unit_price
      FROM unit u
      JOIN supplier ON s_suppkey = u.l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    best AS (
      SELECT l_partkey, MIN(unit_price) AS best_price
      FROM eligible GROUP BY l_partkey
    )
    SELECT {sql_round("s_acctbal", 2)} AS s_acctbal, s_name, n_name,
           p_partkey, {sql_round("e.unit_price", 6)} AS unit_price
    FROM eligible e
    JOIN best ON e.l_partkey = best.l_partkey AND e.unit_price = best.best_price
    JOIN part ON p_partkey = e.l_partkey
    JOIN supplier ON s_suppkey = e.l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size = 15
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
    "TPC-H Q2 minimum-cost supplier (supply cost adapted to the minimum "
    "observed unit price l_extendedprice/l_quantity — no partsupp in the "
    "driver schema): the correlated MIN subquery becomes a grouped-min "
    "join-back on (partkey, price) equality — safe on doubles because both "
    "sides compute the SAME division of identical inputs and MIN is "
    "order-free. Region-filtered suppliers broadcast; top-20 via "
    "TakeOrderedAndProject.",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    euro_supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    eligible = unit.join(
        F.broadcast(euro_supp), unit.l_suppkey == euro_supp.s_suppkey
    )
    # r21 (guide §1.2): `eligible` used to be referenced twice — once to
    # compute the per-part minimum and once as the join-back probe side —
    # so the whole unit aggregation ran twice. The grouped-min join-back on
    # price equality is exactly a min-over-partition window filter (MIN is
    # order-free; both compare the SAME doubles), which evaluates eligible
    # once with a single partkey exchange.
    from pyspark.sql.window import Window as _W

    best = F.min("unit_price").over(_W.partitionBy("l_partkey"))
    return (
        eligible.withColumn("best_price", best)
        .filter(F.col("unit_price") == F.col("best_price"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            pround("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            pround("unit_price", 6).alias("unit_price"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@_register(
    "tpch_q9_product_profit",
    f"""
    SELECT nation, o_year, {sql_round("SUM(amount)", 2)} AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.5 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    """,
    "TPC-H Q9 product-type profit (supply cost adapted to half the part's "
    "retail price — no partsupp; every term stays fixed-point: 2-decimal "
    "prices, integral quantities, so the rounded sums are cross-engine "
    "deterministic): part-name LIKE filter pushed to the part scan, part + "
    "supplier + nation broadcast, lineitem⋈orders the one fact shuffle, "
    "grouped on (nation, order-year).",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.5) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(pround(F.sum(amount), 2).alias("sum_profit"))
    )


@_register(
    "tpch_q11_important_stock",
    f"""
    WITH vals AS (
      SELECT l_partkey, {sql_round("SUM(l_extendedprice * l_quantity)", 2)} AS value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
    )
    SELECT l_partkey, value FROM vals
    WHERE value > (SELECT {sql_round("SUM(l_extendedprice * l_quantity) * 0.001", 2)}
                   FROM lineitem
                   JOIN supplier ON s_suppkey = l_suppkey
                   JOIN nation ON s_nationkey = n_nationkey
                   WHERE n_name = 'NATION_7')
    """,
    "TPC-H Q11 important stock identification (inventory value adapted to "
    "shipped value l_extendedprice * l_quantity — no partsupp): per-part "
    "grouped value vs a global-fraction threshold. The global scalar comes "
    "from a separate bounded .first() job (the Q15/Q22 precedent) and "
    "re-enters the plan as a literal, so the returned plan has no "
    "single-row aggregate or nested-loop guard; one partkey shuffle.",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat_li = li.join(
        F.broadcast(
            supplier.join(
                F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
            ).select("s_suppkey")
        ),
        li.l_suppkey == F.col("s_suppkey"),
    )
    val = F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
    threshold = (
        nat_li.agg(pround(val * 0.001, 2).alias("t")).first()["t"]
    )
    return (
        nat_li.groupBy("l_partkey")
        .agg(pround(val, 2).alias("value"))
        .filter(F.col("value") > F.lit(threshold))
    )


@_register(
    "tpch_q20_potential_promotion",
    """
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100
      )
    ORDER BY s_name
    """,
    "TPC-H Q20 potential part promotion (availability adapted to shipped "
    "volume — no partsupp availqty): the nested IN becomes a grouped "
    "HAVING aggregate LEFT SEMI-joined into the broadcast supplier dim — "
    "part-name prefix and shipdate filters pushed to the scans, one "
    "suppkey-grouped shuffle, nation broadcast. ORDER BY on the final "
    "small row set only.",
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(heavy, supplier.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
