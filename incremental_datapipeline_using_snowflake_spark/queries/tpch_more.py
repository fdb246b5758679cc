"""TPC-H-shape analogues, round 5: the classic plan shapes not yet covered.

Each query exercises a distinct optimizer/execution pattern over the driver
tables (adapted where the synthetic schema lacks TPC-H columns — no
partsupp/shipmode/commitdate — constants tuned to be non-empty at sf0.001):

- q4:  correlated EXISTS decorrelated to a conditioned LEFT SEMI join
- q7:  disjunctive two-nation pair join (nation dim broadcast twice)
- q14: conditional-aggregation ratio (promo revenue share)
- q15: view + window max (top supplier by period revenue)
- q16: NOT IN anti-set + COUNT(DISTINCT) variety report
- q17: correlated scalar AVG subquery decorrelated to groupBy + broadcast join
- q18: HAVING-filtered groupBy joined back to detail (large orders)
- q19: disjunctive multi-predicate join (OR-of-ANDs pushdown)
- q22: scalar subquery threshold + anti join (customers without big orders)

Determinism discipline as in relational.py: decimal-routed double sums,
identical aliases on both engines, total ORDER BY with explicit
tiebreakers. Reference parity: the reference's query surface is relational
SQL over Snowflake (SURVEY.md §1-2); these complete the join/subquery
shapes its users rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .util import dsum, load


# ---------------------------------------------------------------------------
# q4_order_priority — TPC-H Q4: orders (one quarter-ish window) that had at
# least one line shipped AFTER the order date, counted by priority. The
# correlated EXISTS becomes a LEFT SEMI join with the correlation predicate
# in the join condition — Spark plans one semi shuffle, no subquery re-scan.
# ---------------------------------------------------------------------------
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q7_volume_shipping — TPC-H Q7: revenue flowing between two trading-partner
# nation sets, by direction and ship year. The disjunctive pair condition
# can't become a simple equi-key, so it rides the two broadcast nation dims
# as a post-join filter; the fact side still never shuffles for the dims.
# (Nation sets chosen so the first branch is populated at sf0.001, where
# suppliers cover only 10 of 25 nations.)
# ---------------------------------------------------------------------------
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (supp.s_nationkey.isin(3, 8) & cust.c_nationkey.isin(1, 2))
        | (supp.s_nationkey.isin(1, 2) & cust.c_nationkey.isin(3, 8))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(pair)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (s_nationkey IN (3, 8) AND c_nationkey IN (1, 2))
   OR (s_nationkey IN (1, 2) AND c_nationkey IN (3, 8))
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


# ---------------------------------------------------------------------------
# q14_promo_revenue — TPC-H Q14: PROMO parts' share of one month's revenue.
# Conditional aggregation (SUM(CASE ...)) over a broadcast part join; one
# output row. Both sums are decimal-exact before the single rounded ratio.
# ---------------------------------------------------------------------------
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * dsum(promo) / dsum(rev), 4).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q14_SQL = """
SELECT round(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0.0 END AS DECIMAL(30,8))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE),
             4) AS promo_pct,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


# ---------------------------------------------------------------------------
# q15_top_supplier — TPC-H Q15: the supplier(s) with maximum revenue over a
# quarter. The CREATE VIEW + scalar MAX of the original becomes a window
# rank over the aggregated view — one extra (tiny) shuffle over the
# 100-row supplier aggregate instead of a second scan of lineitem.
# Revenue is decimal-exact, so the rank is engine-stable; ties all surface
# (rank, not row_number) with a deterministic final order.
# ---------------------------------------------------------------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    ranked = rev.withColumn(
        "rnk", F.rank().over(Window.orderBy(F.desc("total_revenue")))
    ).filter(F.col("rnk") == 1)
    return (
        ranked.join(F.broadcast(supp), ranked.l_suppkey == supp.s_suppkey)
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.round("total_revenue", 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
),
ranked AS (
  SELECT *, rank() OVER (ORDER BY total_revenue DESC) AS rnk FROM revenue
)
SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
FROM ranked JOIN supplier ON l_suppkey = s_suppkey
WHERE rnk = 1
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q16_supplier_variety — TPC-H Q16 shape (partsupp replaced by the lineitem
# part-supplier linkage): how many distinct suppliers serve each
# (brand, type, size) bucket, excluding one brand and suppliers from a
# NOT IN set (low account balance). COUNT(DISTINCT) forces the expand-agg
# path; the NOT IN set is a broadcast anti join.
# ---------------------------------------------------------------------------
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (F.col("p_size") <= 25)
    )
    bad_supp = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1500).select(
        F.col("s_suppkey").alias("bad_key")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.bad_key, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(30)
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 30
"""


# ---------------------------------------------------------------------------
# q17_small_quantity — TPC-H Q17: revenue locked in small-quantity lines of
# one brand (quantity below half the part's average). The correlated scalar
# AVG decorrelates to a per-part aggregate broadcast back onto the fact —
# one pass to build 2k per-part averages, zero correlated re-scans. The
# average is exact (integral quantities summed in doubles < 2^53), so the
# threshold compare is engine-identical.
# ---------------------------------------------------------------------------
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(dsum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


Q17_SQL = """
SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_small_lines
FROM lineitem l
JOIN part ON l.l_partkey = p_partkey
JOIN (SELECT l_partkey AS ap_key, sum(l_quantity) / count(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey) a
  ON l.l_partkey = a.ap_key
WHERE p_brand = 'Brand#13'
  AND l.l_quantity < 0.5 * a.avg_qty
"""


# ---------------------------------------------------------------------------
# q18_large_orders — TPC-H Q18: orders whose total quantity exceeds a
# threshold, with their customers. groupBy-HAVING produces the (small) hot
# order set; joining it back to orders/customer broadcasts that set, so
# the big tables are scanned once and never shuffled against each other.
# ---------------------------------------------------------------------------
Q18_QTY_THRESHOLD = 250


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("big_key"))
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == F.col("big_key"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(50)
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_date,
       o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey AS big_key, CAST(sum(l_quantity) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(sum(l_quantity) AS DOUBLE) > {Q18_QTY_THRESHOLD}) b
  ON o_orderkey = big_key
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 50
"""


# ---------------------------------------------------------------------------
# q19_disjunctive — TPC-H Q19: revenue under an OR-of-ANDs predicate mixing
# part attributes and line attributes. Exercises disjunctive predicate
# handling: the per-branch part filters can't collapse to one conjunct, but
# the common join key still broadcasts and the residual OR evaluates post-
# join inside codegen (no fallback to nested-loop).
# ---------------------------------------------------------------------------
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(branch).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#25' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
   OR (p_type = 'PROMO' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


# ---------------------------------------------------------------------------
# q22_sales_opportunity — TPC-H Q22 shape: well-funded customers who never
# placed a big order, bucketed by a derived code. The scalar AVG threshold
# rides a broadcast 1-row cross join (no collect — the plan stays lazy);
# the "never" is a broadcast LEFT ANTI against the filtered orders. The
# threshold average is decimal-exact so boundary customers can't flip
# between engines.
# ---------------------------------------------------------------------------
Q22_BIG_ORDER = 450_000


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (dsum("c_acctbal") / F.count("c_acctbal")).alias("avg_bal")
    )
    big = orders.filter(F.col("o_totalprice") > Q22_BIG_ORDER).select(
        F.col("o_custkey").alias("big_cust")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(big), cust.c_custkey == F.col("big_cust"), "left_anti")
        .groupBy((F.col("c_custkey") % 7).cast("int").alias("cust_code"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(dsum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("cust_code")
    )


Q22_SQL = f"""
SELECT CAST(c_custkey % 7 AS INTEGER) AS cust_code,
       COUNT(*) AS n_cust,
       round(CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE), 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE) / COUNT(c_acctbal)
                   FROM customer WHERE c_acctbal > 0)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > {Q22_BIG_ORDER})
GROUP BY cust_code
ORDER BY cust_code
"""


QUERIES = {
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q14_promo_revenue": (q14_promo_revenue, Q14_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_supplier_variety": (q16_supplier_variety, Q16_SQL),
    "q17_small_quantity": (q17_small_quantity, Q17_SQL),
    "q18_large_orders": (q18_large_orders, Q18_SQL),
    "q19_disjunctive": (q19_disjunctive, Q19_SQL),
    "q22_sales_opportunity": (q22_sales_opportunity, Q22_SQL),
}
