"""Extended relational coverage: pivot, cube/grouping sets, the subquery
family (scalar / IN / correlated-EXISTS via the ``spark.sql`` entry point),
exact percentiles, and distinct aggregation.

The reference's SQL entry point (``session.sql`` — SURVEY.md §3.3) maps to
``spark.sql`` over registered views; ``subquery_family`` exercises that path
end-to-end so Catalyst's subquery decorrelation is part of the tested
surface. Everything else stays in the DataFrame API.

Determinism: every output is totally ordered, every computed column aliased
identically in both engines, double sums routed through DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import dsum, load

_DEC = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# grouping_sets_agg — explicit GROUPING SETS (the general form cube/rollup
# specialize): three chosen grouping combinations in one pass with a
# grouping_id disambiguator. Same SQL text runs on both engines.
# ---------------------------------------------------------------------------
_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT) AS gid,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM {lineitem}
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(_GROUPING_SETS_SQL.format(lineitem="gs_lineitem"))


# ---------------------------------------------------------------------------
# skew_salted_join / skew_two_phase_agg — the explicit skew utilities
# (operators/skew.py) are semantics-preserving: the salt only re-keys the
# shuffle, never the result. These queries prove that THROUGH the value-hash
# gate — the oracle is the plain (unsalted) form.
# ---------------------------------------------------------------------------
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_join(li, supp.withColumnRenamed("s_suppkey", "l_suppkey"), "l_suppkey")
    return (
        joined.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("sum_price"),
        )
        .orderBy("s_nationkey")
    )


SKEW_JOIN_SQL = """
SELECT s_nationkey, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sum_price
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1 ORDER BY s_nationkey
"""


def skew_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import two_phase_agg

    li = load(spark, sf_dir, "lineitem")
    out = two_phase_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty_dec": F.sum(F.col("l_quantity").cast("decimal(30,8)")),
            "n_rows": F.count(F.lit(1)),
        },
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        F.col("n_rows").cast("long").alias("n_rows"),
    ).orderBy("l_returnflag")


SKEW_AGG_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY 1 ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# unpivot_agg — DataFrame.unpivot (melt): wide per-flag measure columns back
# to long (flag, measure, value) rows. The inverse of pivot; Spark evaluates
# it as a narrow Expand (each input row emits one row per value column), so
# the only shuffle is the upstream aggregate's.
# ---------------------------------------------------------------------------
def unpivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("qty"),
        dsum("l_extendedprice").alias("price"),
        dsum("l_discount").alias("disc"),
    )
    return (
        wide.unpivot(["l_returnflag"], ["qty", "price", "disc"], "measure", "value")
        .orderBy("l_returnflag", "measure")
    )


UNPIVOT_AGG_SQL = """
WITH a AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS price,
         CAST(SUM(CAST(l_discount AS DECIMAL(30,8))) AS DOUBLE) AS disc
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, measure, value FROM (
  SELECT l_returnflag, 'qty' AS measure, qty AS value FROM a
  UNION ALL
  SELECT l_returnflag, 'price' AS measure, price AS value FROM a
  UNION ALL
  SELECT l_returnflag, 'disc' AS measure, disc AS value FROM a
)
ORDER BY l_returnflag, measure
"""


# ---------------------------------------------------------------------------
# pivot_agg — groupBy().pivot(): order-status revenue per year, statuses as
# columns. Spark evaluates the pivot as a single hash-agg over (year, status)
# then transposes; the explicit value list avoids the extra distinct scan.
# ---------------------------------------------------------------------------
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    year = F.year(F.col("o_orderdate").cast("date")).alias("order_year")
    return (
        orders.select(year, "o_orderstatus", "o_totalprice")
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,8)")).cast("double"))
        .withColumnsRenamed({"F": "sum_f", "O": "sum_o", "P": "sum_p"})
        .orderBy("order_year")
    )


PIVOT_AGG_SQL = """
SELECT year(CAST(o_orderdate AS DATE)) AS order_year,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS sum_f,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS sum_o,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) FILTER (o_orderstatus = 'P') AS DOUBLE) AS sum_p
FROM orders
GROUP BY order_year
ORDER BY order_year
"""


# ---------------------------------------------------------------------------
# cube_agg — full CUBE over (returnflag, linestatus): all 4 grouping
# combinations in one pass (partial-agg friendly; Spark expands grouping
# sets map-side, so the shuffle carries one record per (set, key)).
# ---------------------------------------------------------------------------
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id("l_returnflag", "l_linestatus").alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


CUBE_AGG_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows,
       GROUPING(l_returnflag, l_linestatus) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# subquery_family — scalar subquery + IN-subquery + correlated EXISTS through
# spark.sql (entry point C): customers with above-average balance, in a
# nation that has suppliers, who placed at least one urgent order.
# Catalyst decorrelates the EXISTS into a left-semi join.
# ---------------------------------------------------------------------------
_SUBQUERY_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM {customer} c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM {customer})
  AND c_nationkey IN (SELECT s_nationkey FROM {supplier})
  AND EXISTS (
        SELECT 1 FROM {orders} o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
ORDER BY c_custkey
"""


def subquery_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "supplier", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"sq_{t}")
    return spark.sql(
        _SUBQUERY_SQL.format(
            customer="sq_customer", supplier="sq_supplier", orders="sq_orders"
        )
    )


SUBQUERY_FAMILY_SQL = _SUBQUERY_SQL.format(
    customer="customer", supplier="supplier", orders="orders"
)


# ---------------------------------------------------------------------------
# percentile_stats — exact percentiles (linear interpolation): Spark
# percentile() and DuckDB quantile_cont share the definition; outputs
# rounded to 4 dp to absorb last-ULP float noise.
# ---------------------------------------------------------------------------
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)"), 4).alias("p50_qty"),
            F.round(F.expr("percentile(CAST(l_quantity AS DOUBLE), 0.9)"), 4).alias("p90_qty"),
            F.round(F.expr("percentile(CAST(l_quantity AS DOUBLE), 0.99)"), 4).alias("p99_qty"),
            F.round(F.min(qty), 4).alias("min_qty"),
            F.round(F.max(qty), 4).alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


PERCENTILE_STATS_SQL = """
SELECT l_returnflag,
       round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 4) AS p50_qty,
       round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.9), 4) AS p90_qty,
       round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.99), 4) AS p99_qty,
       round(min(CAST(l_quantity AS DOUBLE)), 4) AS min_qty,
       round(max(CAST(l_quantity AS DOUBLE)), 4) AS max_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# distinct_agg — COUNT(DISTINCT), SUM(DISTINCT), and a sorted distinct list.
# Spark plans two-phase distinct aggregation (expand + partial) — no
# driver-side distinct.
# ---------------------------------------------------------------------------
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.sum_distinct(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("sum_dist_price"),
            # joined to a scalar string: the harness canonicalizer hashes
            # cell values and can't hash array cells.
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias(
                "priorities"
            ),
        )
        .orderBy("o_orderstatus")
    )


DISTINCT_AGG_SQL = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT o_orderpriority) AS n_priorities,
       CAST(sum(DISTINCT CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS sum_dist_price,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# q6_forecast_revenue — TPC-H Q6 shape: tight multi-predicate filter + global
# sum. Every predicate must push to the parquet scan (PushedFilters); the
# aggregate is a single map-side-combined global sum.
# ---------------------------------------------------------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    return (
        li.filter(
            (d >= F.lit("1995-01-01"))
            & (d < F.lit("1996-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,8))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1996-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# zorder_layout — measure multi-dimensional scan pruning under a Z-order
# (Morton) layout vs a single-column sort. Rows are bucketed into 64
# equal "files" per layout (ntile over the layout's sort order); each
# bucket's (partkey, suppkey) bounding box is then tested against a box
# predicate derived from the observed domain. The hash gate pins BOTH the
# layout arithmetic (bit-interleave) and the pruning counts: Z-order must
# scan far fewer buckets for a 2-D box than the partkey sort, and both
# engines must agree exactly. The production write path is
# ops.layout.zorder_by (range shuffle + sortWithinPartitions); the file
# assignment here is ops.layout.distributed_ntile — bit-equal to a global
# ntile window (pinned by test) but with no single-partition stage, so
# the fact table never funnels through one task.
# ---------------------------------------------------------------------------
N_LAYOUT_BUCKETS = 64


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.layout import distributed_ntile, morton_key

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    dom = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    # Z-order locality needs both dims on the SAME bit scale — interleaving
    # raw values lets the wider domain's high bits dominate the curve and
    # the narrow dim degenerates to a tiebreak. Normalize each dim to
    # 8 bits over its observed [min, max] (exact integer scaling).
    mk = morton_key(
        F.expr("((l_partkey - pmin) * 256) div (pmax - pmin + 1)"),
        F.expr("((l_suppkey - smin) * 256) div (smax - smin + 1)"),
        bits=8,
    )
    # Keep the global-sort payload minimal: the zorder branch folds the
    # morton expression into a projection and drops the dom columns before
    # the window; the partkey branch never joins dom at all.
    keyed = (
        li.crossJoin(F.broadcast(dom))
        .withColumn("_zkey", mk)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "_zkey")
    )
    layouts = [
        ("partkey_sorted", li, "l_partkey"),
        ("zorder", keyed, "_zkey"),
    ]
    parts = []
    for name, src, key in layouts:
        # distributed_ntile = range-shuffle + per-partition row_number +
        # broadcast offsets: same bucket assignment as a global ntile window
        # (pinned bit-equal by tests/test_ops.py) with NO single-partition
        # stage — the form that survives a 100x fact table.
        stats = (
            distributed_ntile(
                src, N_LAYOUT_BUCKETS, [key, "l_orderkey", "l_linenumber"]
            )
            .groupBy("bucket")
            .agg(
                F.min("l_partkey").alias("min_p"),
                F.max("l_partkey").alias("max_p"),
                F.min("l_suppkey").alias("min_s"),
                F.max("l_suppkey").alias("max_s"),
            )
        )
        hit_p = (
            F.col("max_p") >= F.col("pmin") + F.expr("(pmax - pmin) div 4")
        ) & (F.col("min_p") <= F.col("pmin") + F.expr("(2 * (pmax - pmin)) div 5"))
        hit_s = (
            F.col("max_s") >= F.col("smin") + F.expr("(smax - smin) div 4")
        ) & (F.col("min_s") <= F.col("smin") + F.expr("(2 * (smax - smin)) div 5"))
        parts.append(
            stats.crossJoin(F.broadcast(dom)).agg(
                F.lit(name).alias("layout"),
                F.count(F.lit(1)).alias("n_buckets"),
                F.sum(hit_p.cast("long")).alias("n_hit_pbox"),
                F.sum(hit_s.cast("long")).alias("n_hit_sbox"),
                F.sum((hit_p & hit_s).cast("long")).alias("n_hit_2dbox"),
                F.sum(F.col("max_p") - F.col("min_p")).alias("sum_p_span"),
                F.sum(F.col("max_s") - F.col("min_s")).alias("sum_s_span"),
            )
        )
    return parts[0].unionAll(parts[1]).orderBy("layout")


def _zorder_layout_sql() -> str:
    from ..ops.layout import morton_key_sql

    mk = morton_key_sql(
        "(((l_partkey - pmin) * 256) // (pmax - pmin + 1))",
        "(((l_suppkey - smin) * 256) // (smax - smin + 1))",
        bits=8,
    )
    return f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem
),
dom AS (
  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         min(l_suppkey) AS smin, max(l_suppkey) AS smax
  FROM li
),
ub AS (
  SELECT 'partkey_sorted' AS layout,
         ntile({N_LAYOUT_BUCKETS}) OVER (ORDER BY l_partkey, l_orderkey, l_linenumber) AS bucket,
         l_partkey, l_suppkey
  FROM li
  UNION ALL
  SELECT 'zorder' AS layout,
         ntile({N_LAYOUT_BUCKETS}) OVER (ORDER BY {mk}, l_orderkey, l_linenumber) AS bucket,
         l_partkey, l_suppkey
  FROM li, dom
),
stats AS (
  SELECT layout, bucket,
         min(l_partkey) AS min_p, max(l_partkey) AS max_p,
         min(l_suppkey) AS min_s, max(l_suppkey) AS max_s
  FROM ub GROUP BY 1, 2
),
hits AS (
  SELECT layout,
         (max_p >= pmin + (pmax - pmin) // 4
          AND min_p <= pmin + (2 * (pmax - pmin)) // 5) AS hit_p,
         (max_s >= smin + (smax - smin) // 4
          AND min_s <= smin + (2 * (smax - smin)) // 5) AS hit_s,
         max_p - min_p AS p_span, max_s - min_s AS s_span
  FROM stats, dom
)
SELECT layout,
       count(*) AS n_buckets,
       CAST(sum(CASE WHEN hit_p THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_pbox,
       CAST(sum(CASE WHEN hit_s THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_sbox,
       CAST(sum(CASE WHEN hit_p AND hit_s THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_2dbox,
       CAST(sum(p_span) AS BIGINT) AS sum_p_span,
       CAST(sum(s_span) AS BIGINT) AS sum_s_span
FROM hits
GROUP BY layout
ORDER BY layout
"""


# ---------------------------------------------------------------------------
# array_functions — the higher-order-function surface (transform/aggregate/
# exists/slice/array_min/max) pinned explicitly as a query, on the 1e-6
# integer grid so folds are exact in both engines.
# ---------------------------------------------------------------------------
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1_000_000 + F.lit(0.5)).cast("long"),
    )
    acc0 = F.lit(0).cast("long")
    return (
        emb.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.aggregate(q, acc0, lambda a, x: a + F.abs(x)).alias("l1_q"),
            F.array_max(q).alias("max_q"),
            F.array_min(q).alias("min_q"),
            F.aggregate(F.slice(q, 1, 8), acc0, lambda a, x: a + x).alias("head8_sum"),
            F.exists(q, lambda x: x > F.lit(900_000)).alias("has_hot"),
        )
        .orderBy("vec_id")
    )


ARRAY_FUNCS_SQL = """
WITH q AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS iq
  FROM embeddings
)
SELECT vec_id,
       len(v) AS dim,
       CAST(list_aggregate(list_transform(iq, x -> abs(x)), 'sum') AS BIGINT) AS l1_q,
       list_max(iq) AS max_q,
       list_min(iq) AS min_q,
       CAST(list_aggregate(list_slice(iq, 1, 8), 'sum') AS BIGINT) AS head8_sum,
       len(list_filter(iq, x -> x > 900000)) > 0 AS has_hot
FROM q
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# stats_moments — the statistical aggregate family (corr / covariance /
# stddev / variance / linear-regression aggregates, plus skewness /
# kurtosis). Both engines share the textbook single-pass definitions;
# results are rounded at 4dp, far above the last-ULP parallel-summation
# divergence. skewness/kurtosis can't use the built-ins (Spark computes the
# population form, DuckDB the sample form — a definitional mismatch), so
# BOTH engines compute the population/excess forms from raw power sums of
# l_quantity on its exact integer grid: qi ∈ [1,50] keeps qi^4 sums within
# exact BIGINT range, the shared moment polynomial runs on
# identically-derived doubles, and the definitional gap disappears.
# ---------------------------------------------------------------------------
# identical expression text evaluated by BOTH engines over (n, s1..s4)
_MOMENT_EXPRS = {
    "skew_q": (
        "round((CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE)"
        " - 3*(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE))"
        " + 2*power(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE), 3))"
        " / power(CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE)"
        "         - power(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE), 2), 1.5), 4)"
    ),
    "kurt_q": (
        "round((CAST(s4 AS DOUBLE)/CAST(n AS DOUBLE)"
        " - 4*(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(s3 AS DOUBLE)/CAST(n AS DOUBLE))"
        " + 6*power(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE), 2)*(CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE))"
        " - 3*power(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE), 4))"
        " / power(CAST(s2 AS DOUBLE)/CAST(n AS DOUBLE)"
        "         - power(CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE), 2), 2) - 3, 4)"
    ),
}


def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").withColumn(
        "qi", F.col("l_quantity").cast("bigint")
    )
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    sums = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr(q, p), 4).alias("corr_qp"),
            F.round(F.covar_samp(q, p), 4).alias("covar_s"),
            F.round(F.covar_pop(q, p), 4).alias("covar_p"),
            F.round(F.stddev_samp(p), 4).alias("std_s"),
            F.round(F.var_pop(p), 4).alias("var_p"),
            F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 4).alias("slope"),
            F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 4).alias(
                "intercept"
            ),
            F.sum("qi").alias("s1"),
            F.sum(F.expr("qi*qi")).alias("s2"),
            F.sum(F.expr("qi*qi*qi")).alias("s3"),
            F.sum(F.expr("qi*qi*qi*qi")).alias("s4"),
        )
    )
    return (
        sums.select(
            "l_returnflag", "n", "corr_qp", "covar_s", "covar_p", "std_s",
            "var_p", "slope", "intercept",
            F.expr(_MOMENT_EXPRS["skew_q"]).alias("skew_q"),
            F.expr(_MOMENT_EXPRS["kurt_q"]).alias("kurt_q"),
        )
        .orderBy("l_returnflag")
    )


STATS_MOMENTS_SQL = f"""
SELECT l_returnflag, n, corr_qp, covar_s, covar_p, std_s, var_p, slope,
       intercept,
       {_MOMENT_EXPRS["skew_q"]} AS skew_q,
       {_MOMENT_EXPRS["kurt_q"]} AS kurt_q
FROM (
  SELECT l_returnflag,
         count(*) AS n,
         round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
         round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_s,
         round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_p,
         round(stddev_samp(l_extendedprice), 4) AS std_s,
         round(var_pop(l_extendedprice), 4) AS var_p,
         round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
         round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
         CAST(sum(qi) AS BIGINT) AS s1,
         CAST(sum(qi*qi) AS BIGINT) AS s2,
         CAST(sum(qi*qi*qi) AS BIGINT) AS s3,
         CAST(sum(qi*qi*qi*qi) AS BIGINT) AS s4
  FROM (SELECT *, CAST(l_quantity AS BIGINT) AS qi FROM lineitem)
  GROUP BY l_returnflag
)
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# date_functions — the datetime scalar family (datediff / add_months with
# end-of-month clamping / last_day / date_trunc / dayofweek) on orders.
# ---------------------------------------------------------------------------
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return (
        o.select(
            "o_orderkey",
            F.col("o_orderdate").alias("d"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
                "days_since_95"
            ),
            F.add_months("o_orderdate", 3).alias("plus_3m"),
            F.last_day("o_orderdate").alias("month_end"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
            # Spark dayofweek: 1 = Sunday; DuckDB dayofweek: 0 = Sunday
            F.dayofweek("o_orderdate").alias("dow1"),
        )
        .orderBy("o_orderkey")
    )


DATE_FUNCS_SQL = """
SELECT o_orderkey,
       o_orderdate AS d,
       datediff('day', DATE '1995-01-01', o_orderdate) AS days_since_95,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       last_day(o_orderdate) AS month_end,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       dayofweek(o_orderdate) + 1 AS dow1
FROM orders
WHERE o_orderkey < 1000
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# data_quality_report — the dbt-tests / DLT-expectations surface
# (ops/quality.py): NOT NULL + accepted_values + range + custom check fold
# into ONE aggregation pass over orders; unique is its own keyed groupBy;
# referential integrity is an anti join against the customer dim. Rules are
# chosen so violations are genuinely nonzero (an all-pass report would make
# the hash gate vacuous). The sample column is dropped from the compared
# output (collect order is partition-dependent); counts are exact.
# ---------------------------------------------------------------------------
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.quality import Rules, validate_constraints

    orders = load(spark, sf_dir, "orders")
    rich_cust = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 4500)
    rules = Rules(
        not_null=["o_orderpriority"],
        unique=[["o_orderkey"], ["o_custkey"]],
        accepted_values={"o_orderstatus": ["F", "O"]},
        ranges={"o_totalprice": (0.0, 450000.0)},
        checks={"priority_known": F.col("o_orderpriority").rlike("^[1-5]-")},
        references={"o_custkey": (rich_cust, "c_custkey")},
    )
    return (
        validate_constraints(orders, rules, id_col="o_orderkey")
        .select("rule", "column", "n_violations")
        .orderBy("rule", "column")
    )


DATA_QUALITY_SQL = """
SELECT rule, "column", n_violations FROM (
  SELECT 'not_null' AS rule, 'o_orderpriority' AS "column",
         CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
  FROM orders
  UNION ALL
  SELECT 'accepted_values', 'o_orderstatus',
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O') OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'range', 'o_totalprice',
         CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.0 OR o_totalprice > 450000.0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'check:priority_known', '',
         CAST(sum(CASE WHEN NOT coalesce(regexp_matches(o_orderpriority, '^[1-5]-'), FALSE) THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'unique', 'o_orderkey',
         CAST(coalesce(sum(n - 1), 0) AS BIGINT)
  FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
  UNION ALL
  SELECT 'unique', 'o_custkey',
         CAST(coalesce(sum(n - 1), 0) AS BIGINT)
  FROM (SELECT count(*) AS n FROM orders GROUP BY o_custkey HAVING count(*) > 1)
  UNION ALL
  SELECT 'references', 'o_custkey', CAST(count(*) AS BIGINT)
  FROM orders o
  WHERE o_custkey IS NOT NULL
    AND NOT EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_acctbal > 4500 AND c.c_custkey = o.o_custkey)
)
ORDER BY rule, "column"
"""


QUERIES: dict = {
    "pivot_agg": (pivot_agg, PIVOT_AGG_SQL),
    "unpivot_agg": (unpivot_agg, UNPIVOT_AGG_SQL),
    "grouping_sets_agg": (grouping_sets_agg, _GROUPING_SETS_SQL.format(lineitem="lineitem")),
    "skew_salted_join": (skew_salted_join, SKEW_JOIN_SQL),
    "skew_two_phase_agg": (skew_two_phase_agg, SKEW_AGG_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "cube_agg": (cube_agg, CUBE_AGG_SQL),
    "subquery_family": (subquery_family, SUBQUERY_FAMILY_SQL),
    "percentile_stats": (percentile_stats, PERCENTILE_STATS_SQL),
    "distinct_agg": (distinct_agg, DISTINCT_AGG_SQL),
    "zorder_layout": (zorder_layout, _zorder_layout_sql()),
    "array_functions": (array_functions, ARRAY_FUNCS_SQL),
    "stats_moments": (stats_moments, STATS_MOMENTS_SQL),
    "data_quality_report": (data_quality_report, DATA_QUALITY_SQL),
    "date_functions": (date_functions, DATE_FUNCS_SQL),
}
