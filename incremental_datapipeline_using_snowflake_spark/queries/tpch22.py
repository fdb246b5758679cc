"""TPC-H completion, round 6: the eight plan shapes left after r05's nine —
with these the full 22-query TPC-H pattern set has an analogue over the
driver tables (adapted where the synthetic schema lacks TPC-H columns: no
partsupp — lineitem's (l_partkey, l_suppkey) stands in as the part/supplier
link; no shipmode/commitdate — l_returnflag and an order-date+30d lateness
rule substitute; cost columns proxy through p_retailprice).

- q2:  correlated MIN subquery decorrelated to groupBy + join-back
       (min-price supplier per part within a region)
- q8:  market-share ratio (two-level conditional aggregation by year)
- q9:  product-type profit by (nation, year) — expression over a 4-way join
- q11: grouped value with a scalar-subquery HAVING threshold
- q12: conditional priority counts by a dimension column (CASE aggregation)
- q13: customer order-count distribution (LEFT OUTER + double groupBy —
       zero-order customers must survive into the 0 bucket)
- q20: nested IN with a grouped HAVING (semi join on an aggregate)
- q21: multi-correlation EXISTS + NOT EXISTS on the same fact table
       (suppliers solely responsible for late multi-supplier orders)

Determinism discipline as in tpch_more.py: decimal-routed double sums,
identical aliases both engines, total ORDER BY with explicit tiebreakers,
constants tuned non-empty at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import dsum, load


# ---------------------------------------------------------------------------
# q2_min_cost_supplier — TPC-H Q2: for each STANDARD part under size 15, the
# EUROPE supplier(s) selling it at the region-minimum line price. The
# correlated `price = (SELECT min(...) WHERE same part)` decorrelates into
# one groupBy(min) over the region-filtered join plus an equi-join back on
# (part, price) — one aggregation, no per-part re-scan; nation/region dims
# broadcast.
# ---------------------------------------------------------------------------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3)  # EUROPE
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 15)
    )
    li = load(spark, sf_dir, "lineitem")
    offers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "l_extendedprice")
    )
    best = offers.groupBy(F.col("p_partkey").alias("_bp")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        offers.join(
            F.broadcast(best),
            (offers.p_partkey == F.col("_bp"))
            & (offers.l_extendedprice == F.col("min_price")),
        )
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "min_price")
        .distinct()
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH offers AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, l_extendedprice
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_regionkey = 3 AND p_type = 'STANDARD' AND p_size < 15
)
SELECT DISTINCT p_partkey, p_name, s_name, s_acctbal, n_name, l_extendedprice AS min_price
FROM offers o
WHERE l_extendedprice = (SELECT min(l_extendedprice) FROM offers i
                         WHERE i.p_partkey = o.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q8_market_share — TPC-H Q8: the share of ASIA-customer revenue supplied by
# NATION_12, per order year. Two-level conditional aggregation over a 5-way
# join; all dims broadcast, the fact tables shuffle once on the order key.
# ---------------------------------------------------------------------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(nation.filter(F.col("n_regionkey") == 2)),  # ASIA customers
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("_snk"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("_snk"),
    ).select("s_suppkey", "supp_nation")
    li = load(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    tagged = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            (F.col("supp_nation") == "NATION_12").alias("is_target"),
        )
    )
    share_num = dsum(F.when(F.col("is_target"), F.col("vol")).otherwise(F.lit(0.0)))
    return (
        tagged.groupBy("o_year")
        .agg(F.round(share_num / dsum("vol"), 6).alias("mkt_share"),
             F.count(F.lit(1)).alias("n_lines"))
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
       round(CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_12'
                                THEN l_extendedprice * (1 - l_discount)
                                ELSE 0.0 END AS DECIMAL(30,8))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE),
             6) AS mkt_share,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders    ON l_orderkey = o_orderkey
JOIN supplier  ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM customer JOIN nation cn ON c_nationkey = cn.n_nationkey
              WHERE c_custkey = o_custkey AND cn.n_regionkey = 2)
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# q9_product_profit — TPC-H Q9: profit on 'widget' parts by supplier nation
# and order year. The schema has no ps_supplycost; cost proxies as 10% of
# p_retailprice per unit — the plan shape (4-way join, expression combining
# columns of three tables, two-key rollup) is what the query exercises.
# ---------------------------------------------------------------------------
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    nation = load(spark, sf_dir, "nation")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    # p_retailprice is not grid-aligned, so a double->DECIMAL cast rounds
    # ambiguously at the cast scale (Spark half-ups the shortest decimal
    # repr, DuckDB rounds the binary value — observed 1-cent sum flips).
    # floor(x*1e4 + 0.5) is pure double arithmetic on the SAME IEEE value
    # in both engines: per-row int64 on the 1e-4 grid, exact integer sum,
    # one exact division at the end — the LSH-quantization trick.
    pm = F.floor(profit * 10000 + F.lit(0.5)).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("n_name").alias("nation"),
                F.year("o_orderdate").alias("o_year"),
                pm.alias("pm"))
        .groupBy("nation", "o_year")
        .agg((F.sum("pm") / F.lit(10000.0)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       SUM(CAST(floor((l_extendedprice * (1 - l_discount)
                       - 0.1 * p_retailprice * l_quantity) * 10000 + 0.5)
                AS BIGINT)) / 10000.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


# ---------------------------------------------------------------------------
# q11_important_parts — TPC-H Q11: per-part sales value for NATION_3's
# suppliers, kept only where the value exceeds a fraction of the nation's
# total — the scalar-subquery HAVING. Spark computes the threshold as a
# 1-row aggregate cross-joined (broadcast) onto the grouped values: the
# grouped table is scanned once, the threshold never re-computed per group.
# ---------------------------------------------------------------------------
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    li = load(spark, sf_dir, "lineitem")
    nation_lines = li.join(
        F.broadcast(supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"), "left_semi"
    )
    value = nation_lines.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(30,8)")).alias("_vdec")
    )
    # scale-free threshold (TPC-H's 0.0001/SF analogue): 2x the mean
    # per-part value — non-empty and selective at every SF
    threshold = value.agg(
        (F.sum("_vdec").cast("double") * 2.0 / F.count(F.lit(1))).alias("_cut")
    )
    return (
        value.join(F.broadcast(threshold))
        .filter(F.col("_vdec").cast("double") > F.col("_cut"))
        # decimal-space rounding (see q9 note)
        .select(
            "l_partkey",
            F.col("_vdec").cast("decimal(30,2)").cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "l_partkey")
    )


Q11_SQL = """
WITH v AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS vdec
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey = 3)
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(CAST(vdec AS DECIMAL(30,2)) AS DOUBLE) AS value
FROM v
WHERE CAST(vdec AS DOUBLE) > (SELECT CAST(SUM(vdec) AS DOUBLE) * 2.0 / COUNT(*) FROM v)
ORDER BY value DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# q12_ship_priority — TPC-H Q12 with l_returnflag standing in for the absent
# l_shipmode: per flag, how many 1996-shipped lines belong to URGENT/HIGH
# orders vs the rest. Fact-fact join + CASE aggregation.
# ---------------------------------------------------------------------------
def q12_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q13_customer_distribution — TPC-H Q13: distribution of per-customer order
# counts, INCLUDING customers with zero qualifying orders (the reason the
# join must be LEFT OUTER, not inner — an inner join silently drops the 0
# bucket). The o_comment NOT LIKE filter substitutes an order-priority
# exclusion; it must sit in the JOIN CONDITION, not a WHERE, to preserve
# outer-join semantics.
# ---------------------------------------------------------------------------
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "4-NOT SPECIFIED"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count skips NULLs
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# q20_promo_suppliers — TPC-H Q20: suppliers (here: any nation) whose total
# quantity sold of PROMO-type parts clears a threshold — the nested-IN with
# a grouped HAVING. The inner aggregate becomes a standalone grouped table
# and the outer IN a semi join against it; the part filter is itself a semi
# join inside the aggregate's input.
# ---------------------------------------------------------------------------
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    promo_qty = (
        li.join(F.broadcast(part.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        # decimal-space rounding (see q9 note)
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(30,8)"))
            .cast("decimal(30,2)")
            .cast("double")
            .alias("promo_qty")
        )
        .filter(F.col("promo_qty") > 300.0)
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(promo_qty, supp.s_suppkey == promo_qty.l_suppkey)
        .select("s_name", "s_acctbal", "promo_qty")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, s_acctbal, promo_qty
FROM supplier
JOIN (
  SELECT l_suppkey,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DECIMAL(30,2)) AS DOUBLE) AS promo_qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  GROUP BY l_suppkey
  HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DECIMAL(30,2)) AS DOUBLE) > 300.0
) q ON s_suppkey = q.l_suppkey
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# q21_waiting_suppliers — TPC-H Q21 (the hardest shape): suppliers who were
# the SOLE late supplier on a finished multi-supplier order. "Late" adapts
# to shipdate > orderdate + 30 days (no commitdate/receiptdate). The
# correlated EXISTS (another supplier participated) and NOT EXISTS (no other
# supplier was late) become one LEFT SEMI and one LEFT ANTI join against the
# same fact table with inequality correlation predicates — Spark plans two
# shuffles on the order key, no nested re-scan.
# ---------------------------------------------------------------------------
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    lines = li.join(
        orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey")
    ).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("late"),
    )
    l1 = lines.filter(F.col("late")).select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    )
    l2 = lines.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l3 = lines.filter(F.col("late")).select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        l1.join(l2, (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")), "left_semi")
        .join(l3, (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")), "left_anti")
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        waiting.join(F.broadcast(supp), waiting.sk == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 30 DAY AS late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM lines l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM lines l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lines l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


QUERIES: dict = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q11_important_parts": (q11_important_parts, Q11_SQL),
    "q12_ship_priority": (q12_ship_priority, Q12_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q20_promo_suppliers": (q20_promo_suppliers, Q20_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
}
